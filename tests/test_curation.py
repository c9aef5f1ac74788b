"""Curation pipeline integration test: stage invariants + end output."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_curation_pipeline(spark, sf_dir, tmp_path):
    import examples.curation_pipeline as ex

    out = str(tmp_path / "curated")
    counts = ex.run(spark, sf_dir, out)
    assert 0 < counts["curated"] <= counts["input"]

    curated = spark.read.parquet(os.path.join(out, "curated"))
    # partitioned by predicted language
    assert any(
        d.startswith("predicted_lang=") for d in os.listdir(os.path.join(out, "curated"))
    )
    # quality gate honored
    assert curated.filter(F.col("quality") < 0.5).count() == 0
    # exact dedup: no two docs share a fingerprint -> all texts distinct
    assert (
        curated.select("text").distinct().count() == curated.count()
    )
    # near-dup removal: no surviving pair with jaccard >= 0.85
    from cherry_spark.ext.dedup import minhash_lsh_pairs

    remaining_pairs = minhash_lsh_pairs(
        curated, jaccard_threshold=0.85
    ).count()
    assert remaining_pairs == 0
    # stats written last (anchor) and consistent
    stats = spark.read.parquet(os.path.join(out, "stats"))
    assert stats.agg(F.sum("n_docs")).first()[0] == counts["curated"]
    # temperature mixing weights cover the epoch (~1.0 after rounding)
    mixing = spark.read.parquet(os.path.join(out, "mixing"))
    assert abs(mixing.agg(F.sum("weight")).first()[0] - 1.0) <= 0.01
    assert mixing.filter(F.col("expected_samples") < 0).count() == 0
    # passage rewrite: one row per curated doc, kept <= total chunks,
    # and no chunk text survives twice corpus-wide
    rw = spark.read.parquet(os.path.join(out, "passage_rewrite"))
    assert rw.count() == counts["curated"]
    assert rw.filter(F.col("n_kept") > F.col("n_chunks")).count() == 0
    from cherry_spark.ext.dedup import chunk_dedup_stats

    assert (
        chunk_dedup_stats(
            rw.filter(F.col("kept_text") != "").select(
                "doc_id", F.col("kept_text").alias("text")
            ),
            chunk_tokens=8,
        ).count()
        == 0
    )
    # token-budget cut: a subset of curated, never exceeding the budget,
    # and its worst admitted quality >= the best rejected quality
    # (prefix property of the greedy fill)
    budgeted = spark.read.parquet(os.path.join(out, "budgeted"))
    assert 0 < budgeted.count() <= counts["curated"]
    assert budgeted.agg(F.max("cum_tokens")).first()[0] <= 100_000
    rejected = curated.join(budgeted.select("doc_id"), "doc_id", "left_anti")
    if rejected.count() > 0:
        worst_in = budgeted.agg(F.min("quality")).first()[0]
        best_out = rejected.agg(F.max("quality")).first()[0]
        assert worst_in >= best_out
    # DSIR weights: one row per curated doc; the en-slice target makes
    # en docs average a higher log-ratio than the rest
    dsir = spark.read.parquet(os.path.join(out, "dsir"))
    assert dsir.count() == counts["curated"]
    j = dsir.join(curated.select("doc_id", "predicted_lang"), "doc_id")
    means = {
        r["is_en"]: r["m"]
        for r in j.groupBy((F.col("predicted_lang") == "en").alias("is_en"))
        .agg(F.avg("logratio").alias("m"))
        .collect()
    }
    if True in means and False in means:
        assert means[True] > means[False]


def test_streaming_ingestion_example(spark, sf_dir, tmp_path):
    import examples.streaming_ingestion_pipeline as ex

    res = ex.run(spark, sf_dir, str(tmp_path / "stream"), budget=5_000)
    counts = res["counts"]
    assert sum(counts.values()) > 0
    assert res["spent"] <= res["budget"]
    assert counts.get("admitted", 0) > 0
    # the eval set is drawn from the corpus, so contamination MUST fire
    assert counts.get("contaminated", 0) > 0
