"""Unit tests for ext/similarity.py:hard_negatives_topk — exclusion
semantics on a hand-built geometry."""

from __future__ import annotations


def _vecs(spark):
    # 2-D unit-ish vectors with known cosines to the anchor (1, 0):
    rows = [
        (0, [1.0, 0.0]),  # the anchor itself
        (1, [1.0, 0.001]),  # near-dup (sim ~ 1.0) -> above ceiling
        (2, [0.9, 0.5]),  # sim ~ 0.874 -> hardest legal negative
        (3, [0.5, 0.9]),  # sim ~ 0.486
        (4, [0.0, 1.0]),  # sim 0
        (5, [0.8, 0.6]),  # sim 0.8 but labeled positive -> excluded
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_hard_negatives_exclusions(spark):
    from pyspark.sql import functions as F

    from cherry_spark.ext.similarity import hard_negatives_topk

    emb = _vecs(spark)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pos = spark.createDataFrame([(0, 5)], "query_id long, vec_id long")
    out = hard_negatives_topk(
        emb, q, k=10, neardup_ceiling=0.9, positives=pos
    ).collect()
    ids = [r.vec_id for r in out]
    # self (0), near-dup (1, sim>=0.9), labeled positive (5) all gone;
    # survivors ranked hardest-first
    assert ids == [2, 3, 4]
    sims = [r.sim for r in out]
    assert sims == sorted(sims, reverse=True)
    assert all(s < 0.9 for s in sims)


def test_hard_negatives_k_cap_and_no_positives(spark):
    from pyspark.sql import functions as F

    from cherry_spark.ext.similarity import hard_negatives_topk

    emb = _vecs(spark)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = hard_negatives_topk(emb, q, k=2, neardup_ceiling=0.9).collect()
    # without labels, 5 (sim 0.8) is the 2nd hardest negative
    assert [r.vec_id for r in out] == [2, 5]
