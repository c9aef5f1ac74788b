"""Skew handling for 100 TB workloads.

Two standard techniques, both plain DataFrame compositions:

- :func:`salted_agg` — two-stage aggregation for skewed group keys: a
  hot key's rows spread over ``n_salts`` partial groups (map-side
  combine still applies), then the partials merge in a second, tiny
  aggregation. Correct for any algebraic aggregate expressed as
  (partial, merge) pairs.
- :func:`salted_join` — replicate the small side per salt so a skewed
  join key's rows land in different partitions. AQE's skew-join split
  covers most cases automatically (enabled in session.py); this is the
  explicit form for when the optimizer can't see the skew (e.g. a
  custom partitioner downstream).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``partial_aggs``: name -> aggregate over the raw rows (stage 1,
    grouped by keys + salt). ``merge_aggs``: name -> aggregate over the
    stage-1 partials (grouped by keys only), referencing stage-1 output
    columns by name. Example::

        salted_agg(df, ["k"],
                   {"s": F.sum("v"), "c": F.count(F.lit(1))},
                   {"s": F.sum("s"), "c": F.sum("c")})
    """
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)))
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(n) for n, c in partial_aggs.items()]
    )
    return stage1.groupBy(*keys).agg(*[c.alias(n) for n, c in merge_aggs.items()])


def salted_join(
    left: DataFrame,
    right_small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed large-left ⋈ small-right: left rows get a random-ish salt,
    the small side is replicated once per salt value, and the join key
    becomes (key, salt) — a hot key now spreads over n_salts tasks."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    right_rep = right_small.select("*", salts)
    left_salted = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int"),
    )
    return left_salted.join(right_rep, on=[on, "__salt"], how=how).drop("__salt")
