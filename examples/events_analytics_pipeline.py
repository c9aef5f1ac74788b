"""Event-stream analytics pipeline — the ops/product dashboard lane
over the events table:

    events ──► profile (single-scan column trust check)
           ──► dense 15-min grid per event type, gap-filled
           ──► trailing 4-hour rolling load per type
           ──► ordered funnel view → click → purchase
           ──► weekly cohort retention matrix
           ──► hourly spike flags (integer-exact z>3 per event type)

Every stage is a registered certified operator (profile_table,
resample_gapfill, rolling_resampled_stats, funnel_conversion,
cohort_retention, spike_report) composed as plain DataFrames — one events scan
feeds the grid pair (lazy localCheckpoint at the fan-out point, the
CLAUDE.md multi-consumer invariant), the funnel and cohort read the
scan directly (their per-stage filters push down).

Run: python examples/events_analytics_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def analyze(spark, sf_dir: str) -> dict[str, DataFrame]:
    from cherry_spark.ext.events import cohort_retention, funnel_conversion
    from cherry_spark.ext.profile import profile_table
    from cherry_spark.ext.timeseries import (
        resample_gapfill,
        rolling_resampled_stats,
        spike_report,
    )
    from cherry_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")

    profile = profile_table(
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.unix_micros(F.col("ts")).alias("ts_us"),
        )
    )

    # the grid pair consumes the same bucketed aggregate shape twice —
    # checkpoint the shared scan lazily so neither consumer re-reads
    evc = ev.select("event_type", "ts", "value").localCheckpoint(eager=False)
    grid = resample_gapfill(evc, "event_type", "ts", "value", 900)
    rolling = rolling_resampled_stats(evc, "event_type", "ts", "value", 3600, 4)

    funnel = funnel_conversion(ev, ["view", "click", "purchase"])
    cohorts = cohort_retention(ev)
    spikes = spike_report(evc, "event_type", "ts", 3600)
    return {
        "profile": profile,
        "grid": grid,
        "rolling": rolling,
        "funnel": funnel,
        "cohorts": cohorts,
        "spikes": spikes,
    }


def main() -> None:
    from cherry_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("events_analytics")
    spark.sparkContext.setLogLevel("ERROR")
    out = analyze(spark, sf_dir)
    print("column profile:")
    for r in out["profile"].orderBy("col_name").collect():
        print(f"  {r.col_name}: {r.n_rows} rows, {r.n_null} null, {r.n_distinct} distinct")
    n_grid = out["grid"].count()
    n_gaps = out["grid"].agg(F.sum("is_gap")).collect()[0][0]
    print(f"dense grid: {n_grid} buckets, {n_gaps} gap-filled")
    print("funnel:")
    for r in out["funnel"].orderBy("stage_idx").collect():
        print(f"  {r.stage_name}: {r.n_users} users (from first: {r.conv_from_first})")
    print(f"cohort matrix: {out['cohorts'].count()} cells")
    sp = out["spikes"]
    n_buckets = sp.count()
    n_spikes = sp.agg(F.sum("is_spike")).collect()[0][0]
    print(f"spike monitor: {n_buckets} hourly buckets, {n_spikes} flagged")


if __name__ == "__main__":
    main()
