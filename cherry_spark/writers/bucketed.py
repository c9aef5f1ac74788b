"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the dominant cost of fact-fact joins is the exchange of both
sides. Writing both tables bucketed by the join key (same bucket count)
lets Spark sort-merge-join them with ZERO exchanges — the shuffle is
paid once at write time, amortized over every subsequent join.

``write_bucketed`` persists a DataFrame as a bucketed managed table;
``verify_colocated_join`` returns True when a join between two bucketed
tables plans without an Exchange (used by tests and the plan audit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def join_has_no_exchange(df: DataFrame) -> bool:
    """True when the physical plan contains no shuffle exchange —
    the bucketed co-location worked."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
