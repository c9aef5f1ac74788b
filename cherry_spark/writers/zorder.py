"""Z-order (Morton-curve) data layout — multi-dimensional file
pruning for the write path.

The 100 TB problem: parquet min/max stats prune files for range
predicates on the SORT column only; a second filter column reads
everything.  Interleaving the bits of two or three columns into one
Morton key and range-partitioning + sorting the write by that key
gives every file a small bounding BOX in the multi-dim space, so a box
predicate (user AND time, block AND address bucket) prunes on every
dimension at once — the same layout trick Delta/Iceberg expose as
``OPTIMIZE ZORDER BY``, built here from plain Spark primitives.

``z_value`` is a flat unrolled expression (``shiftright``/``&``/
``shiftleft``/``|`` with int literals — whole-stage-codegen'd, no UDF)
and has a bit-exact DuckDB twin, so the key computation itself is
oracle-certifiable like every other scalar op in the repo.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cols: list[Column], bits: int = 16) -> Column:
    """Morton key interleaving the low ``bits`` bits of each column
    (values are masked into range first — callers bucket/scale their
    dimensions into [0, 2^bits)).  ``len(cols) * bits`` must stay
    under 63 so the key fits a BIGINT in both engines."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed int64")
    mask = (1 << bits) - 1
    terms = []
    for i, c in enumerate(cols):
        cc = c.cast("long").bitwiseAND(F.lit(mask))
        for b in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(cc, b).bitwiseAND(F.lit(1)), b * n + i
                )
            )
    return reduce(lambda a, t: a.bitwiseOR(t), terms).alias("z")


def z_value_sql(col_exprs: list[str], bits: int = 16) -> str:
    """DuckDB twin of :func:`z_value` — same unrolled arithmetic."""
    n = len(col_exprs)
    mask = (1 << bits) - 1
    terms = []
    for i, e in enumerate(col_exprs):
        cc = f"(CAST({e} AS BIGINT) & {mask})"
        for b in range(bits):
            terms.append(f"((({cc} >> {b}) & 1) << {b * n + i})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` laid out along the Morton curve of ``cols``:
    range-partition by the z key (each output file owns a contiguous
    curve segment = a small bounding box in every dimension), sort
    within partitions so row-group stats are tight too.  The helper
    key column is dropped from the files."""
    z = z_value([F.col(c) for c in cols], bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def file_bounds(spark, path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max of ``cols`` — the pruning instrument: a file
    is read by a box query only if its bounds intersect the box."""
    import glob
    import os

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        row = spark.read.parquet(f).agg(*aggs).collect()[0]
        out.append({"file": os.path.basename(f), **row.asDict()})
    return out


def files_hit_by_box(
    bounds: list[dict], box: dict[str, tuple[int, int]]
) -> int:
    """How many files a box predicate must read given their bounds."""
    hit = 0
    for b in bounds:
        ok = True
        for c, (lo, hi) in box.items():
            if b[f"max_{c}"] < lo or b[f"min_{c}"] > hi:
                ok = False
                break
        hit += ok
    return hit
