"""As-of join — match each left row to the latest right row with
right_ts <= left_ts per key (backward direction).

Absent from the reference (SURVEY §2.3 notes no theta/range/as-of
joins anywhere); built here because time-series enrichment is a core
analytics need. Implementation is the scalable union trick:

    union(left, right) -> one shuffle, sort within (key, ts) ->
    last_value(right cols, ignoreNulls) over rows-unbounded-preceding

No range-join explosion, no per-row subquery: cost is a single
repartition+sort of |L|+|R| — the plan you want at 100 TB (and AQE
handles skewed keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward (inclusive) as-of join.

    Returns every left row plus ``value_cols`` from the matched right
    row (null when no right row precedes). ``tiebreak`` orders equal
    timestamps — the greatest tiebreak value wins, making the result
    deterministic when a key has several right rows at one timestamp.
    """
    from pyspark.sql import types as T

    # a SINGLE struct of the value columns is filled forward, so every
    # output value comes from the same matched right row — filling each
    # column independently would backfill a genuine NULL in one column
    # from an OLDER right row, mixing columns across rows
    vals_type = T.StructType([right.schema[c] for c in value_cols])
    l_tagged = left.select(
        F.col(left_key).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__tie"),
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(vals_type).alias("__vals"),
    )
    r_tagged = right.select(
        F.col(right_key).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        (F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")).alias(
            "__tie"
        ),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        F.struct(*[F.col(c) for c in value_cols]).alias("__vals"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # right rows sort before left rows at equal ts (inclusive semantics);
    # among equal-ts right rows the greatest tiebreak sorts last => wins
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__vals", ignorenulls=True).over(w)
    filled = unioned.select(
        "__is_left",
        *[F.col(c) for c in left.columns],
        *[matched[c].alias(c) for c in value_cols],
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left")
