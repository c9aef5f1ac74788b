"""Unit tests for ext/timeseries.py — hand-computed grid, fill, and
rolling values on a tiny synthetic series with known gaps."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _events(spark):
    # Key "a": buckets 0, 900 (two events), 3600 — gaps at 1800, 2700.
    # Key "b": single bucket — a 1-row grid, no gaps.
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        ("a", base + dt.timedelta(seconds=10), 1.0),
        ("a", base + dt.timedelta(seconds=905), 2.0),
        ("a", base + dt.timedelta(seconds=1795), 3.5),
        ("a", base + dt.timedelta(seconds=3601), 10.0),
        ("b", base + dt.timedelta(seconds=2000), 7.25),
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def test_resample_gapfill_grid_and_fill(spark):
    from cherry_spark.ext.timeseries import resample_gapfill

    out = resample_gapfill(_events(spark), "key", "ts", "value", 900)
    got = {(r.key, r.bucket_s): r for r in out.collect()}

    base_s = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    # Key a spans buckets 0..3600 → 5 grid rows; key b → 1 row.
    assert len(got) == 6
    a0 = got[("a", base_s)]
    assert (a0.n_events, a0.bucket_value, a0.filled_value, a0.is_gap) == (
        1,
        1.0,
        1.0,
        0,
    )
    a1 = got[("a", base_s + 900)]
    assert (a1.n_events, a1.bucket_value, a1.is_gap) == (2, 5.5, 0)
    a2 = got[("a", base_s + 1800)]  # gap: carries bucket-1's 5.5 forward
    assert (a2.n_events, a2.bucket_value, a2.filled_value, a2.is_gap) == (
        0,
        None,
        5.5,
        1,
    )
    a3 = got[("a", base_s + 2700)]
    assert (a3.filled_value, a3.is_gap) == (5.5, 1)
    a4 = got[("a", base_s + 3600)]
    assert (a4.bucket_value, a4.filled_value, a4.is_gap) == (10.0, 10.0, 0)
    b = got[("b", base_s + 1800)]
    assert (b.n_events, b.bucket_value, b.filled_value, b.is_gap) == (
        1,
        7.25,
        7.25,
        0,
    )


def test_rolling_resampled_stats_true_time_frame(spark):
    from cherry_spark.ext.timeseries import rolling_resampled_stats

    # width 900, trailing 2 buckets: the gap rows participate as zeros,
    # so the frame is a true 1800-second window.
    out = rolling_resampled_stats(_events(spark), "key", "ts", "value", 900, 2)
    got = {(r.key, r.bucket_s): r for r in out.collect()}
    base_s = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    assert got[("a", base_s + 900)].rolling_sum == 6.5  # 1.0 + 5.5
    assert got[("a", base_s + 1800)].rolling_sum == 5.5  # 5.5 + gap 0
    assert got[("a", base_s + 2700)].rolling_sum == 0.0  # gap + gap
    assert got[("a", base_s + 3600)].rolling_sum == 10.0
    assert got[("a", base_s + 3600)].rolling_n_events == 1
    assert got[("b", base_s + 1800)].rolling_sum == 7.25


def test_bucket_arithmetic_is_integer_exact(spark):
    from cherry_spark.ext.timeseries import time_bucket_s

    # Exact boundary timestamps land in their OWN bucket (the double-
    # division trap this helper avoids would put a boundary one ulp
    # off); far-future epochs stay exact too.
    rows = [
        (dt.datetime(2024, 1, 1, 0, 15, 0, 0, tzinfo=dt.timezone.utc),),
        (dt.datetime(2024, 1, 1, 0, 14, 59, 999999, tzinfo=dt.timezone.utc),),
        (dt.datetime(2200, 6, 1, 0, 45, 0, 0, tzinfo=dt.timezone.utc),),
    ]
    df = spark.createDataFrame(rows, "ts timestamp")
    vals = [
        r.b for r in df.select(time_bucket_s(F.col("ts"), 900).alias("b")).collect()
    ]
    b24 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    b2200 = int(
        dt.datetime(2200, 6, 1, 0, 45, tzinfo=dt.timezone.utc).timestamp()
    )
    assert vals == [b24 + 900, b24, b2200]
