"""Column-profiler query (ext/profile.py) over a derived lineitem
view: the raw table plus a planted-NULL bucket column (lineitem ships
NULL-free, so the null lane needs planting) and the ship timestamp
pre-converted to epoch micros (the no-raw-timestamps invariant —
profiling a timestamp means profiling its epoch integer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_spark.catalog import query
from cherry_spark.sources.tables import load_table

_COLS: list[tuple[str, str]] = [
    ("l_orderkey", "num"),
    ("l_linenumber", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("ship_us", "num"),
    ("qty_bucket", "num"),
]


def _profile_oracle() -> str:
    from cherry_spark.ext.profile import profile_table_oracle_sql

    table_sql = """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
               l_returnflag, l_linestatus,
               CAST(epoch_us(l_shipdate) AS BIGINT) AS ship_us,
               CASE WHEN l_quantity < 10 THEN NULL
                    ELSE CAST(l_quantity AS BIGINT) // 10 END AS qty_bucket
        FROM lineitem
    """
    return profile_table_oracle_sql(_COLS, table_sql)


@query(
    "profile_table_report",
    oracle=_profile_oracle(),
    doc="Single-scan column profiler (ext/profile.py:profile_table): "
    "per-column row/null/distinct counts + min/max over lineitem in "
    "ONE scan — every column becomes a struct in an in-row array, one "
    "explode turns the table long, one GROUPED agg computes all stats "
    "(the per-column-group distinct distributes; a global "
    "multi-distinct Expand plan never forms). Distinct counts run on "
    "string renderings (injective per engine, so counts agree); "
    "min/max as DOUBLE for numeric, raw string for varchar. The "
    "oracle pays 8 scans where Spark pays 1 — the single-scan plan "
    "is the thing certified.",
)
def profile_table_report(spark, sf_dir):
    from cherry_spark.ext.profile import profile_table

    li = load_table(spark, sf_dir, "lineitem")
    qty_long = F.col("l_quantity").cast("long")
    derived = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
        "l_linestatus",
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("ship_us"),
        F.when(F.col("l_quantity") < 10, F.lit(None).cast("long"))
        .otherwise((qty_long / F.lit(10)).cast("long"))
        .alias("qty_bucket"),
    )
    return profile_table(derived)
