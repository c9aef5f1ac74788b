"""Training-data curation pipeline — the 100 TB story end-to-end:

    documents ──► quality filter (C4-style heuristics)
              ──► Gopher rule gate (word count / word length / symbol
                  ratio / alpha fraction / stopword plausibility)
              ──► repetition filter (Gopher-style boilerplate rules)
              ──► LM-proxy outlier filter (corpus unigram log-prob)
              ──► PII scrub (email / digit-run redaction)
              ──► exact dedup (content fingerprint)
              ──► MinHash-LSH near-dup removal (keep lowest doc_id)
              ──► SemDeDup semantic near-dup removal (embedding space)
              ──► decontamination vs a held-out eval split
              ──► language ID + token counting
              ──► stratified per-language cap
              ──► curated parquet + per-language stats + temperature
                  mixing weights + CDC chunk-dup report + passage-level
                  dedup REWRITE (chunk_dedup_rewrite) + DSIR importance
                  weights vs the 'en' target slice

Every stage is native DataFrame ops from cherry_spark.ext; the near-dup
stage's candidate generation is the banded-LSH equi-join (no n²), and
the decontamination stage is an inverted-index probe of the eval split
(broadcast at scale), so the same pipeline shape runs on a
1000-executor cluster unchanged.

Run: python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def curate(
    spark,
    sf_dir: str,
    quality_threshold: float = 0.5,
    max_dup_2gram_frac: float = 0.5,
    per_lang_cap: int = 10_000,
    token_budget: int = 100_000,
) -> dict[str, DataFrame]:
    from cherry_spark.ext.dedup import (
        cdc_chunk_dedup_stats,
        connected_components,
        contamination_overlap,
        exact_dedup,
        minhash_lsh_pairs,
    )
    from cherry_spark.ext.quality import (
        gopher_rules,
        repetition_stats,
        unigram_logprob,
    )
    from cherry_spark.ext.sampling import hash_split, stratified_sample
    from cherry_spark.ext.text import (
        doc_fingerprint,
        language_id,
        pii_scrub,
        quality_score,
        token_count,
    )
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")

    # 0. carve a held-out eval split up front (deterministic hash split)
    # — the decontamination target. At scale this is a separate table.
    split = hash_split(docs, "doc_id", {"train": 0.98, "eval": 0.02}, salt="curate")
    train = split.filter(F.col("split") == "train").drop("split")
    heldout = split.filter(F.col("split") == "eval").drop("split")

    # 1. quality gate (C4-family heuristics)
    scored = train.withColumn("quality", quality_score(F.col("text")))
    kept = scored.filter(F.col("quality") >= quality_threshold)

    # 1b. Gopher rule gate (Rae et al. §A1.1 conjunction; min_words
    # downscaled for the short synthetic docs)
    gate = gopher_rules(
        kept.select("doc_id", "text"),
        min_words=20,
        # corpus-appropriate function words (synthetic fixture text)
        stopwords=("the", "a", "and", "of", "to", "data"),
    )
    kept = kept.join(
        gate.filter(F.col("keep") == 1).select("doc_id"), "doc_id", "left_semi"
    )

    # 1c. LM-proxy outlier filter: drop the docs whose mean unigram
    # log-prob sits below the corpus 5th percentile (rare-token noise)
    lp = unigram_logprob(kept.select("doc_id", "text"))
    lp5 = lp.agg(F.expr("percentile_approx(mean_logprob, 0.05)").alias("q"))
    lp_ok = lp.crossJoin(F.broadcast(lp5)).filter(
        F.col("mean_logprob") >= F.col("q")
    ).select("doc_id")
    kept = kept.join(lp_ok, "doc_id", "left_semi")

    # 2. repetition gate (Gopher-family: drop boilerplate-heavy docs)
    rep = repetition_stats(kept.select(F.col("doc_id"), F.col("text")))
    rep_ok = rep.filter(F.col("dup_2gram_frac") <= max_dup_2gram_frac).select(
        "doc_id"
    )
    kept = kept.join(rep_ok, "doc_id", "left_semi")

    # 3. PII scrub — redact before anything downstream sees the text
    scrub = pii_scrub(F.col("text"))
    kept = kept.withColumn("text", scrub["scrubbed"]).withColumn(
        "n_pii_redactions", scrub["n_emails"] + scrub["n_numbers"]
    )

    # 4. exact dedup on content fingerprint (keep lowest doc_id)
    fingerprinted = kept.withColumn("fp", doc_fingerprint(F.col("text")))
    deduped = exact_dedup(fingerprinted, ["fp"], order_by=[F.col("doc_id")])

    # 5. near-dup removal: LSH pairs -> duplicate clusters (large-star/
    # small-star connected components — skew-safe on celebrity docs) ->
    # keep the highest-quality member per cluster (quality tiebreak by
    # doc_id; pairwise greedy drops would discard good docs whenever a
    # low-quality doc happens to have the lower id)
    from pyspark.sql.window import Window

    pairs = minhash_lsh_pairs(deduped, jaccard_threshold=0.85)
    clusters = connected_components(pairs, algorithm="star")
    members = clusters.join(
        deduped.select(F.col("doc_id").alias("id"), "quality"), "id"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("id")
    )
    losers = (
        members.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select(F.col("id").alias("doc_id"))
    )
    survivors = deduped.join(losers, on="doc_id", how="left_anti")

    # 5b. semantic near-dup removal (SemDeDup): embedding-space
    # duplicates that lexical shingles miss (paraphrases). The
    # embeddings table shares the doc id space; at scale the
    # assignment comes from a persisted ivf_build_index.
    from cherry_spark.ext.semdedup import semantic_dedup

    # localCheckpoint: semantic_dedup references its input several
    # times (seeds/assign/self-join); without the lineage cut each
    # reference would re-execute the ENTIRE upstream pipeline
    # (quality gates + LSH + CC) — the projection-reuse trap
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .join(
            survivors.select(F.col("doc_id").alias("vec_id")),
            "vec_id",
            "left_semi",
        )
        .localCheckpoint(eager=True)
    )
    sem_dups = (
        semantic_dedup(emb, threshold=0.35, n_centroids=16)
        .filter(F.col("is_dup") == 1)
        .select(F.col("vec_id").alias("doc_id"))
    )
    survivors = survivors.join(sem_dups, on="doc_id", how="left_anti")

    # 6. decontamination: drop training docs overlapping the eval split
    contaminated = contamination_overlap(
        survivors, heldout, shingle_k=5, min_shared=3
    ).select("doc_id")
    clean = survivors.join(contaminated, on="doc_id", how="left_anti")

    # 7. enrich: language + token counts
    enriched = clean.select(
        "doc_id",
        "text",
        "lang",
        "source",
        "quality",
        "n_pii_redactions",
        language_id(F.col("text")).alias("predicted_lang"),
        token_count(F.col("text")).alias("n_tokens"),
    )

    # 8. per-language cap (deterministic smallest-hash-first quota)
    curated = stratified_sample(
        enriched, "predicted_lang", "doc_id", per_lang_cap, salt="cap"
    )

    # materialization point for the FOUR downstream consumers (stats,
    # mixing, chunk_report, and the caller's write): without it each
    # consumer re-executes the whole 12-stage chain per reference —
    # the 10x probe measured reports at 159.6s and the write at
    # 108.8s, i.e. ~2.5 chain re-runs, vs seconds once checkpointed
    # (lazy: the first consumer pays the chain exactly once). On a
    # real cluster this is reliable checkpoint()/a staging table.
    curated = curated.localCheckpoint(eager=False)

    stats = curated.groupBy("predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        F.sum("n_pii_redactions").alias("total_pii_redactions"),
    )

    # chunk-level duplication report on the final corpus (what
    # document-level dedup missed — boilerplate passages). CDC
    # boundaries realign across insertions, so shifted copies of a
    # passage still collapse (ext/dedup.py:cdc_chunk_dedup_stats).
    chunk_report = cdc_chunk_dedup_stats(curated, window=3, divisor=8)

    # passage-level REWRITE: the text the training job actually
    # consumes — every duplicated 8-token chunk keeps only its first
    # corpus occurrence and documents are reassembled from surviving
    # chunks (Lee et al. 2022; ext/dedup.py:chunk_dedup_rewrite).
    # Emitted alongside `curated` (not in place of it) so consumers
    # choose doc-level or passage-level text.
    from cherry_spark.ext.dedup import chunk_dedup_rewrite

    passage_rewrite = chunk_dedup_rewrite(curated, chunk_tokens=8)

    # epoch mixing: temperature-scaled source weights for the sampler
    from cherry_spark.ext.sampling import mixing_temperature

    mixing = mixing_temperature(curated, source_col="source", tau=0.7)

    # DSIR importance weights against the corpus' own 'en' slice (a
    # stand-in target domain): the per-doc log importance ratio a
    # resampler uses to tilt the mix toward target-like documents
    # (ext/quality.py:dsir_logratio).
    from cherry_spark.ext.quality import dsir_logratio

    dsir = dsir_logratio(
        curated.select("doc_id", "text"),
        curated.filter(F.col("predicted_lang") == "en").select("doc_id", "text"),
    )

    # final token-budget cut: the 'spend at most B tokens' step — rank
    # the curated pool by quality and admit the cumulative-token prefix
    # under the epoch budget (ext/budget.py:budget_select; two-phase
    # prefix sum in quality order, budget-frontier pruned)
    from cherry_spark.ext.budget import budget_select

    budgeted = budget_select(
        curated.select(
            "doc_id", "quality", F.col("n_tokens").cast("long").alias("n_tokens")
        ),
        budget=token_budget,
    )

    return {
        "curated": curated,
        "budgeted": budgeted,
        "stats": stats,
        "mixing": mixing,
        "chunk_report": chunk_report,
        "passage_rewrite": passage_rewrite,
        "dsir": dsir,
        "n_input": docs,
    }


def run(spark, sf_dir: str, out_dir: str) -> dict[str, int]:
    from cherry_spark.writers import ParquetWriterConfig, create_writer

    result = curate(spark, sf_dir)
    writer = create_writer(
        ParquetWriterConfig(
            path=out_dir,
            partition_by={"curated": ["predicted_lang"]},
            sort_by={"curated": ["doc_id"]},
            anchor_table="stats",
        )
    )
    writer.push_data(
        {
            "curated": result["curated"],
            "budgeted": result["budgeted"],
            "chunk_report": result["chunk_report"],
            "passage_rewrite": result["passage_rewrite"],
            "dsir": result["dsir"],
            "stats": result["stats"],
            "mixing": result["mixing"],
        }
    )
    return {
        "input": result["n_input"].count(),
        "curated": result["curated"].count(),
    }


if __name__ == "__main__":
    from cherry_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("curation_example")
    counts = run(spark, sf_dir, "/tmp/curated_out")
    print(f"input={counts['input']} curated={counts['curated']}")
    spark.read.parquet("/tmp/curated_out/stats").show()
