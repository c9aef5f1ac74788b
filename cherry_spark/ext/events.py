"""Event-stream product analytics: ordered-funnel conversion and
cohort retention.

The behavioral-analytics pair every event pipeline ships next to the
time-series grid (ext/timeseries.py): "how many users progressed
view → click → purchase IN ORDER" and "of the users who first
appeared in week W, how many were active W+k".

Spark-first shapes:

- The funnel is a chain of per-user conditional MIN aggregates — one
  grouped agg per stage, each joined on user_id to the previous
  stage's timestamp and filtered to events strictly AFTER it. No
  per-user event sort, no window over a user's whole history, no
  pattern-matching UDF: stage k's aggregate sees only stage-k events
  (map-side filtered), so cost is Σ_k |events of stage k|, and a
  power user's million events never sit in one task's sort buffer.
- Retention is two grouped aggregates: first-activity bucket per
  user, then COUNT(DISTINCT user) per (cohort, offset) — the
  distinct distributes across the (cohort, offset) groups.

Both lanes are pure integers (epoch-second buckets via the
ext/timeseries.py pmod arithmetic, counts) until the final per-row
ratio divisions (ROUND 6 — cross-engine exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cherry_spark.ext.timeseries import time_bucket_s


def funnel_conversion(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel report: one row per stage with the number of
    users whose FIRST qualifying stage-k event happens strictly after
    their stage-(k-1) time, plus conversion ratios.

    Returns ``(stage_idx, stage_name, n_users, conv_from_prev,
    conv_from_first)`` — ratios ROUND(·, 6) per-row doubles.
    """
    if len(stages) < 2:
        raise ValueError("a funnel needs at least 2 stages")
    us = F.col(user_col).alias("u")
    ts_us = F.unix_micros(F.col(ts_col)).alias("t")
    base = events.select(us, ts_us, F.col(type_col).alias("et"))

    # stage 0: first qualifying event per user; stage k: first
    # stage-k event strictly after the user's stage-(k-1) time
    stage_dfs = []
    cur = (
        base.where(F.col("et") == stages[0])
        .groupBy("u")
        .agg(F.min("t").alias("t_prev"))
    )
    stage_dfs.append(cur)
    for name in stages[1:]:
        cur = (
            base.where(F.col("et") == name)
            .join(cur, "u")
            .where(F.col("t") > F.col("t_prev"))
            .groupBy("u")
            .agg(F.min("t").alias("t_prev"))
        )
        stage_dfs.append(cur)

    # fully lazy report: one 1-row count per stage, unioned. The
    # chained per-user aggregates each end in an EXCHANGE, which
    # Spark reuses across the union's branches — every stage computes
    # once, not once per downstream stage (the driver-side .count()
    # form would re-execute the chain per stage).
    rpt = None
    for i, (name, s) in enumerate(zip(stages, stage_dfs)):
        row = s.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(i).cast("int").alias("stage_idx"),
            F.lit(name).alias("stage_name"),
            "n_users",
        )
        rpt = row if rpt is None else rpt.unionByName(row)
    prev = rpt.select(
        (F.col("stage_idx") + 1).alias("stage_idx"),
        F.col("n_users").alias("__n_prev"),
    )
    first = F.broadcast(
        rpt.where(F.col("stage_idx") == 0).select(
            F.col("n_users").alias("__n_first")
        )
    )
    safe_div = lambda a, b: F.when(b > 0, F.round(a / b, 6))
    return (
        rpt.join(F.broadcast(prev), "stage_idx", "left")
        .crossJoin(first)
        .select(
            "stage_idx",
            "stage_name",
            "n_users",
            safe_div(F.col("n_users"), F.col("__n_prev")).alias(
                "conv_from_prev"
            ),
            safe_div(F.col("n_users"), F.col("__n_first")).alias(
                "conv_from_first"
            ),
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    width_s: int = 7 * 86400,
) -> DataFrame:
    """Cohort-retention matrix: users cohorted by their first-activity
    ``width_s`` bucket; one row per (cohort, offset) with the distinct
    active users and the retention rate vs the cohort's size.

    Returns ``(cohort_s, week_offset, n_active, retention_6)``.
    """
    b = time_bucket_s(F.col(ts_col), width_s)
    act = events.select(F.col(user_col).alias("u"), b.alias("bucket_s")).distinct()
    first = act.groupBy("u").agg(F.min("bucket_s").alias("cohort_s"))
    sizes = first.groupBy("cohort_s").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    matrix = (
        act.join(first, "u")
        .select(
            "cohort_s",
            ((F.col("bucket_s") - F.col("cohort_s")) / F.lit(width_s))
            .cast("long")
            .alias("week_offset"),
            "u",
        )
        .groupBy("cohort_s", "week_offset")
        .agg(F.countDistinct("u").cast("long").alias("n_active"))
    )
    return matrix.join(F.broadcast(sizes), "cohort_s").select(
        "cohort_s",
        "week_offset",
        "n_active",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention_6"),
    )
