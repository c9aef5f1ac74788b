"""Time-series resample / gap-fill / rolling operators over event
streams.

The reference's query model stops at tumbling/session windows
(mirrored in queries/relational.py and streaming/stateful.py); a
training-data or metrics pipeline additionally needs DENSE per-key
time grids — "one row per key per bucket, observed or not" — for
rate computation, anomaly detection, and join-ready feature tables.
These operators build that grid Spark-first:

- bucketing is integer arithmetic on epoch micros (no timestamp
  rounding hazards, cross-engine exact);
- the dense grid is ``sequence() + explode`` driven by a per-key
  min/max aggregate — grid size is bounded by the key's observed
  span / bucket width, never by a global calendar;
- forward-fill is ``last(value, ignorenulls=True)`` over a per-key
  ordered window — the standard distributed time-series shape: one
  shuffle on key, per-partition sort, single pass.

Scale: at 100 TB the grid explode multiplies each KEY by its own
span/width — total output is Σ_key span_k/width, which the caller
controls via the bucket width; there is no cross-key product and no
global window. The per-key window sort is bounded by the longest
single series, the same bound any time-series system carries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(18,2)"

_US = 1_000_000


def time_bucket_s(ts: Column, width_s: int) -> Column:
    """Epoch-second bucket start for a timestamp column: integer
    arithmetic on ``unix_micros``. ``pmod`` keeps the whole path in
    LONGs (Column ``/`` is DOUBLE division — epoch-µs values sit near
    2^50, where a quotient one ulp above an exact integer would
    truncate to the wrong bucket); the final ``/ 1e6`` is exact
    because ``bucket_us`` is a multiple of 1e6 with a representable
    quotient. Event timestamps are post-epoch (positive), so
    ``pmod`` == mathematical mod here."""
    w_us = int(width_s) * _US
    us = F.unix_micros(ts).cast("long")
    bucket_us = us - F.pmod(us, F.lit(w_us))
    return (bucket_us / F.lit(_US)).cast("long")


def _resample_grid(
    df: DataFrame, key_col: str, ts_col: str, value_col: str, width_s: int
) -> DataFrame:
    """Dense (key, bucket_s) grid left-joined with per-bucket partial
    aggregates; ``_sum_dec`` stays DECIMAL here so composing operators
    (rolling) aggregate exactly — only public outputs cast to DOUBLE."""
    bucket = time_bucket_s(F.col(ts_col), width_s).alias("bucket_s")
    agg = (
        df.select(F.col(key_col).alias("key"), bucket, F.col(value_col))
        .groupBy("key", "bucket_s")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast(_DEC)).alias("_sum_dec"),
        )
    )
    rng = agg.groupBy("key").agg(
        F.min("bucket_s").alias("_lo"), F.max("bucket_s").alias("_hi")
    )
    # hi ≥ lo by construction (same group's min/max), so the sequence
    # is ascending — the F.sequence descending trap cannot fire.
    grid = rng.select(
        "key",
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(int(width_s)).cast("long"))
        ).alias("bucket_s"),
    )
    return grid.join(agg, ["key", "bucket_s"], "left")


def resample_gapfill(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    width_s: int = 900,
) -> DataFrame:
    """Resample events into fixed ``width_s`` buckets per key and
    gap-fill the missing buckets of each key's observed span.

    Output one row per (key, bucket): ``n_events`` (0 on gaps),
    ``bucket_value`` (the bucket's exact DECIMAL sum cast to DOUBLE;
    NULL on gaps), ``filled_value`` (forward-fill of the last observed
    bucket_value — never NULL because each key's grid starts at its
    own MIN observed bucket, which has data by construction), and
    ``is_gap`` (0/1 INTEGER).

    Shape: grouped agg (one shuffle on (key, bucket)) → tiny per-key
    min/max agg → sequence+explode dense grid → left join grid⋈agg →
    per-key ordered window for the forward fill.
    """
    joined = _resample_grid(df, key_col, ts_col, value_col, width_s)
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "key",
        "bucket_s",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        F.col("_sum_dec").cast("double").alias("bucket_value"),
        F.last(F.col("_sum_dec"), ignorenulls=True)
        .over(w)
        .cast("double")
        .alias("filled_value"),
        F.when(F.col("n_events").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_gap"),
    )


def rolling_resampled_stats(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    width_s: int = 3600,
    trailing_buckets: int = 4,
) -> DataFrame:
    """Trailing-window rolling stats over the DENSE resampled grid.

    Composes the gap-filled grid with a per-key ROWS frame of the last
    ``trailing_buckets`` buckets. Because the grid is dense, a ROWS
    frame IS a time frame (``trailing_buckets × width_s`` seconds) —
    rolling over raw observed buckets would silently stretch the
    window across gaps. Rolling sums aggregate the bucket DECIMAL
    sums directly (exact, associative — cross-engine safe); only the
    final value is cast to DOUBLE.
    """
    joined = _resample_grid(df, key_col, ts_col, value_col, width_s)
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_s")
        .rowsBetween(-(trailing_buckets - 1), Window.currentRow)
    )
    dec_zero = F.lit(0).cast(_DEC)
    return joined.select(
        "key",
        "bucket_s",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        F.sum(F.coalesce(F.col("_sum_dec"), dec_zero))
        .over(w)
        .cast("double")
        .alias("rolling_sum"),
        F.sum(F.coalesce(F.col("n_events"), F.lit(0)))
        .over(w)
        .cast("long")
        .alias("rolling_n_events"),
    )


def spike_report(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    width_s: int = 3600,
    z_threshold: int = 3,
) -> DataFrame:
    """Per-key bucket-count anomaly flags with INTEGER-EXACT z-test.

    The monitoring primitive next to the resample family: bucket the
    stream per key, then flag every bucket whose count sits more than
    ``z_threshold`` population standard deviations ABOVE its key's
    mean. The naive form compares doubles (mean/stddev) — engine
    sqrt/stddev implementations differ in the last ulp, so a verdict
    column built on them is not certifiable. Clearing denominators
    makes the whole test integer algebra::

        z > t  ⇔  (c·N − S) > 0  and  (c·N − S)² > t²·(N·Q − S²)

    with S = Σc, Q = Σc², N = #buckets per key — every term a BIGINT
    (bound: (c·N)² ≤ (S·N)²; at 10⁵ events × 10⁴ buckets per key the
    headroom to 2^63 is ~10⁴; beyond that swap the two squares to
    DECIMAL(38,0), formula unchanged).

    Scale shape: one grouped count (map-side partial) to the bucket
    table, then the per-key moment window runs over BUCKETS, never raw
    events — a key's window is span/width rows regardless of event
    volume, and keys distribute across tasks. No counterpart in the
    reference (its aggregation surface stops at MIN/MAX — see
    src/cherry_etl/steps, queries/relational.py:agg_min_max).
    """
    b = df.groupBy(
        F.col(key_col).alias("key"),
        time_bucket_s(F.col(ts_col), width_s).alias("bucket_s"),
    ).agg(F.count("*").cast("long").alias("n_events"))
    return spike_flags_from_buckets(b, z_threshold)


def spike_flags_from_buckets(
    buckets: DataFrame, z_threshold: int = 3
) -> DataFrame:
    """The verdict stage of :func:`spike_report`, split out so the
    streaming monitor (streaming/continuous.py:
    run_streaming_spike_monitor) can run the identical integer
    algebra over its folded bucket-count store. Input schema:
    (key, bucket_s, n_events LONG)."""
    w = Window.partitionBy("key")
    t2 = int(z_threshold) * int(z_threshold)
    s = F.sum("n_events").over(w)
    q = F.sum(F.col("n_events") * F.col("n_events")).over(w)
    n = F.count("*").over(w)
    dev = F.col("n_events") * n - s
    num = (dev * dev).cast("long")
    den = (F.lit(t2) * (n * q - s * s)).cast("long")
    return buckets.select(
        "key",
        "bucket_s",
        "n_events",
        num.alias("zsq_num"),
        den.alias("zsq_den"),
        F.when((dev > 0) & (num > den), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_spike"),
    )
