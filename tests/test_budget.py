"""Token-budget selection (ext/budget.py): prefix semantics, tie-breaks,
two-phase == naive single-window, bucket-count invariance, grouped
budgets."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cherry_spark.ext.budget import budget_select, budget_select_grouped


def _pool(spark):
    # (doc_id, quality, n_tokens); quality desc, id asc order:
    # 5(0.9,40) -> 1(0.8,30) -> 4(0.8,30) -> 2(0.5,100) -> 3(0.2,10)
    rows = [
        (1, 0.8, 30),
        (2, 0.5, 100),
        (3, 0.2, 10),
        (4, 0.8, 30),
        (5, 0.9, 40),
    ]
    return spark.createDataFrame(rows, "doc_id long, quality double, n_tokens long")


def test_prefix_rule_no_backfill(spark):
    # budget 110: 40 + 30 + 30 = 100 fits; doc 2 overflows (200) and is
    # dropped — and doc 3 (10 tokens, would fit) is NOT backfilled:
    # the contract is a prefix, not a knapsack
    out = budget_select(_pool(spark), budget=110).collect()
    got = {r["doc_id"]: r["cum_tokens"] for r in out}
    assert got == {5: 40, 1: 70, 4: 100}


def test_tiebreak_by_id(spark):
    # docs 1 and 4 share quality 0.8; budget 75 admits only doc 1
    out = budget_select(_pool(spark), budget=75).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 5]


def test_exact_budget_hit_included(spark):
    out = budget_select(_pool(spark), budget=100).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 4, 5]


def test_two_phase_equals_naive_window(spark):
    # 200 docs with heavily tied qualities; compare against the naive
    # unpartitioned-window formulation
    pool = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.round((F.col("id") % 7).cast("double") / 7.0, 6).alias("quality"),
        (F.col("id") % 13 + 1).cast("long").alias("n_tokens"),
    )
    w = Window.orderBy(F.col("quality").desc(), "doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    naive = (
        pool.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= 500)
        .collect()
    )
    for n_buckets in (1, 64):
        got = budget_select(pool, budget=500, n_buckets=n_buckets).collect()
        assert sorted((r["doc_id"], r["cum_tokens"]) for r in got) == sorted(
            (r["doc_id"], r["cum_tokens"]) for r in naive
        ), f"n_buckets={n_buckets}"


def test_explicit_boundaries_same_result(spark):
    pool = _pool(spark)
    default = budget_select(pool, budget=110).collect()
    custom = budget_select(pool, budget=110, boundaries=[0.3, 0.6, 0.85]).collect()
    assert sorted((r["doc_id"], r["cum_tokens"]) for r in custom) == sorted(
        (r["doc_id"], r["cum_tokens"]) for r in default
    )


def test_grouped_dict_budgets_and_default(spark):
    rows = [
        ("en", 1, 0.9, 50),
        ("en", 2, 0.8, 50),
        ("en", 3, 0.7, 50),
        ("de", 4, 0.9, 50),
        ("de", 5, 0.1, 50),
    ]
    pool = spark.createDataFrame(
        rows, "lang string, doc_id long, quality double, n_tokens long"
    )
    out = budget_select_grouped(
        pool, {"en": 100}, "lang", default_budget=50
    ).collect()
    got = {(r["lang"], r["doc_id"]) for r in out}
    # en budget 100 -> top-2 by quality; de default 50 -> top-1
    assert got == {("en", 1), ("en", 2), ("de", 4)}


def test_grouped_scalar_budget(spark):
    rows = [
        ("en", 1, 0.9, 50),
        ("en", 2, 0.8, 50),
        ("de", 4, 0.9, 50),
    ]
    pool = spark.createDataFrame(
        rows, "lang string, doc_id long, quality double, n_tokens long"
    )
    out = budget_select_grouped(pool, 50, "lang").collect()
    assert {(r["lang"], r["doc_id"]) for r in out} == {("en", 1), ("de", 4)}
