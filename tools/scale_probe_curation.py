"""10x end-to-end scale probe for examples/curation_pipeline.py
(round-5 verdict item #6).

Rounds 4-5 probed the dedup/similarity operators in ISOLATION; this
drives the full 13-stage curation chain on an adversarial 10x corpus,
because the lineage/checkpoint interactions (projection-reuse,
localCheckpoint barriers — the CLAUDE.md invariants) only bite when the
stages are chained.

Corpus: 10 replicas of sf0.1 documents/embeddings with shifted ids and
a per-replica token appended to the text — so replicas are NEAR-dups
(never exact dups: the exact-dedup stage must NOT be allowed to
collapse the clone classes before LSH/CC/SemDeDup see them). Every
document sits in a 10-clone near-dup class and every embedding in a
10-clone semantic class: the worst shape for candidate generation,
cluster formation, and within-cluster self-joins at once.

Timed segments (natural barriers in the chain):

- build:     one-time 10x corpus materialization (excluded from chain)
- upstream:  curate() call — eager up to the localCheckpoint before
             SemDeDup, i.e. quality gates + LM filter + PII + exact
             dedup + LSH pairs + star CC + keep-best (stages 0-5)
- downstream: curated.count() — SemDeDup + decontamination + enrich +
             per-language cap (stages 5b-8)
- reports:   stats/mixing/chunk_report materialization (stages 9-11)
- write:     partitioned parquet sink (stage 12)

No-hot-task evidence: per-partition row counts of the curated output
and of the final enriched exchange (max/median — a hot key would show
up as one partition holding a clone class's whole volume).

Run: python tools/scale_probe_curation.py [sf_dir] [n_replicas]
Prints one human-readable block; paste the numbers into COVERAGE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_corpus(spark, sf_dir: str, out_dir: str, n_replicas: int) -> None:
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    offset = 1_000_000
    docs_n = [
        docs.select(
            (F.col("doc_id") + F.lit(i * offset)).alias("doc_id"),
            # per-replica suffix: near-dup (J ~ (n-3)/n on 3-shingles),
            # never byte-identical — exact dedup must not collapse it
            F.concat(F.col("text"), F.lit(f" replica{i}")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for i in range(n_replicas)
    ]
    emb_n = [
        emb.select(
            (F.col("vec_id") + F.lit(i * offset)).alias("vec_id"),
            "embedding",
            "label",
        )
        for i in range(n_replicas)
    ]
    d = docs_n[0]
    for x in docs_n[1:]:
        d = d.unionByName(x)
    e = emb_n[0]
    for x in emb_n[1:]:
        e = e.unionByName(x)
    d.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    e.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def partition_skew(df) -> str:
    rows = (
        df.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .select("count")
        .collect()
    )
    counts = sorted(r["count"] for r in rows)
    mx = counts[-1]
    med = counts[len(counts) // 2]
    return (
        f"{len(counts)} populated partitions, max {mx} / median {med} rows"
        f" = {mx / med if med else float('inf'):.2f}x"
    )


def main() -> None:
    from cherry_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    probe_dir = f"/tmp/cherry_probe_curation_{n_replicas}x"
    out_dir = f"{probe_dir}_out"
    spark = get_spark("curation_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    build_corpus(spark, sf_dir, probe_dir, n_replicas)
    t_build = time.perf_counter() - t0

    from examples.curation_pipeline import curate

    t0 = time.perf_counter()
    result = curate(spark, probe_dir)
    t_upstream = time.perf_counter() - t0  # eager to the semdedup checkpoint

    t0 = time.perf_counter()
    curated = result["curated"]  # lazy-checkpointed inside curate()
    n_curated = curated.count()
    t_downstream = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_stats = result["stats"].count()
    n_mix = result["mixing"].count()
    n_chunk = result["chunk_report"].count()
    t_reports = time.perf_counter() - t0

    # r7 stage: token-budget selection over the curated pool (its own
    # segment so the earlier segments stay comparable with the r6 run)
    t0 = time.perf_counter()
    n_budgeted = result["budgeted"].count()
    t_budget = time.perf_counter() - t0

    from cherry_spark.writers import ParquetWriterConfig, create_writer

    shutil.rmtree(out_dir, ignore_errors=True)
    writer = create_writer(
        ParquetWriterConfig(
            path=out_dir,
            partition_by={"curated": ["predicted_lang"]},
            sort_by={"curated": ["doc_id"]},
            anchor_table="stats",
        )
    )
    t0 = time.perf_counter()
    writer.push_data(
        {
            "curated": curated,
            "chunk_report": result["chunk_report"],
            "stats": result["stats"],
            "mixing": result["mixing"],
        }
    )
    t_write = time.perf_counter() - t0

    n_input = result["n_input"].count()
    # hot-task evidence on a HEAVY intermediate, not just the small
    # output: the minhash candidate-pair stage over the full 10x
    # clone-class corpus (the worst shuffle in the chain)
    from cherry_spark.ext.dedup import minhash_lsh_pairs
    from cherry_spark.sources.tables import load_table

    docs10 = load_table(spark, probe_dir, "documents")
    pairs_skew = partition_skew(minhash_lsh_pairs(docs10, jaccard_threshold=0.85))
    chain = t_upstream + t_downstream + t_reports + t_budget + t_write
    print(
        f"corpus: {n_replicas}x {sf_dir} -> {n_input} docs "
        f"(build {t_build:.1f}s, excluded)\n"
        f"upstream  (gates+PII+exact+LSH+CC+keep-best): {t_upstream:.1f}s\n"
        f"downstream (SemDeDup+decontam+enrich+cap):    {t_downstream:.1f}s\n"
        f"reports   (stats+mixing+chunk_report):        {t_reports:.1f}s\n"
        f"selection (token budget, {n_budgeted} docs):   {t_budget:.1f}s\n"
        f"write     (partitioned parquet):              {t_write:.1f}s\n"
        f"chain total: {chain:.1f}s | curated {n_curated} "
        f"({n_curated / n_input:.1%} of input), stats {n_stats}, "
        f"mixing {n_mix}, chunk dups {n_chunk}\n"
        f"curated output: {partition_skew(curated)}\n"
        f"full-corpus LSH pair stage: {pairs_skew}"
    )


if __name__ == "__main__":
    main()
