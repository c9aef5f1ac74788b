"""Single-scan column profiler — the data-quality instrument a
pipeline runs before trusting a new table drop: per-column row/null/
distinct counts and min/max.

Spark-first shape: ONE scan. Every profiled column becomes a struct
in an in-row array, one explode turns the table long —
(col_name, val_str, val_num) — and a single GROUPED aggregation
computes all stats. Grouping by col_name distributes the distinct
aggregation across column groups (the Expand plan a global
multi-distinct agg would hit lands harmlessly here — the CLAUDE.md
approx_distinct note), and the explode is narrow (no shuffle before
the agg's own exchange). A naive per-column loop would scan the
table N_cols times.

Cross-engine notes (the oracle story): distinct counts run over the
STRING rendering of each value — renderings differ across engines
for doubles, but both are injective (shortest-roundtrip), so the
COUNTS agree; min/max are reported as DOUBLE for numeric columns
(selection of an input value — exact, no aggregation-order hazard)
and as the raw string for string columns only (cross-engine string
min/max is only meaningful where the renderings are byte-identical).
Timestamps are NOT profiled — convert to epoch micros first (the
repo's no-raw-timestamps invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def profiled_columns(df: DataFrame) -> list[str]:
    """The columns :func:`profile_table` will report on: numeric,
    string, and boolean fields, in schema order."""
    out = []
    for f in df.schema.fields:
        if isinstance(f.dataType, _NUMERIC + (T.StringType, T.BooleanType)):
            out.append(f.name)
    return out


def profile_table(df: DataFrame) -> DataFrame:
    """One row per supported column: ``(col_name, n_rows, n_null,
    n_distinct, min_num, max_num, min_str, max_str)``. min/max_num are
    NULL for string/boolean columns; min/max_str NULL for numeric."""
    entries = []
    for f in df.schema.fields:
        is_num = isinstance(f.dataType, _NUMERIC)
        is_str = isinstance(f.dataType, T.StringType)
        if not (is_num or is_str or isinstance(f.dataType, T.BooleanType)):
            continue
        c = F.col(f.name)
        entries.append(
            F.struct(
                F.lit(f.name).alias("col_name"),
                c.cast("string").alias("val_str"),
                (c.cast("double") if is_num else F.lit(None).cast("double")).alias(
                    "val_num"
                ),
                F.lit(is_str).alias("is_str"),
            )
        )
    if not entries:
        raise ValueError("no profilable columns (numeric/string/boolean)")
    long = df.select(F.explode(F.array(*entries)).alias("e")).select("e.*")
    return long.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("val_str").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null"),
        F.countDistinct("val_str").cast("long").alias("n_distinct"),
        F.min("val_num").alias("min_num"),
        F.max("val_num").alias("max_num"),
        F.min(F.when(F.col("is_str"), F.col("val_str"))).alias("min_str"),
        F.max(F.when(F.col("is_str"), F.col("val_str"))).alias("max_str"),
    )


def profile_table_oracle_sql(
    columns: list[tuple[str, str]], table_sql: str
) -> str:
    """DuckDB twin: one UNION ALL branch per column over the same
    derived table. ``columns``: (name, kind) with kind ∈
    {"num", "str"}. The oracle pays N scans where Spark pays one —
    the single-scan long-format plan is the thing being certified."""
    branches = []
    for name, kind in columns:
        if kind == "num":
            mn = f"CAST(MIN(CAST({name} AS DOUBLE)) AS DOUBLE)"
            mx = f"CAST(MAX(CAST({name} AS DOUBLE)) AS DOUBLE)"
            ms = "CAST(NULL AS VARCHAR)"
            xs = "CAST(NULL AS VARCHAR)"
        else:
            mn = "CAST(NULL AS DOUBLE)"
            mx = "CAST(NULL AS DOUBLE)"
            ms = f"MIN({name})"
            xs = f"MAX({name})"
        branches.append(
            f"""
    SELECT '{name}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           CAST(COUNT(DISTINCT CAST({name} AS VARCHAR)) AS BIGINT)
             AS n_distinct,
           {mn} AS min_num, {mx} AS max_num,
           {ms} AS min_str, {xs} AS max_str
    FROM t"""
        )
    body = "\n    UNION ALL".join(branches)
    return f"WITH t AS ({table_sql}){body}"
