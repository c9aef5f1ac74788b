"""Fixture/Parquet table readers.

The reference's source is a provider stream yielding a multi-table Arrow
batch per iteration (reference src/cherry_etl/pipeline.py:111-120); here
the batch abstraction is ``Dict[str, DataFrame]`` over Parquet scans, so
Catalyst gets full predicate/projection pushdown on every table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cherry_spark.session import ensure_runtime_confs

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallelize: bool = False
) -> DataFrame:
    """Read one fixture table; normalizes the events timestamp column.

    ``events.ts`` has shipped in two physical forms across fixture
    generations: TIMESTAMP(NANOS) — Spark reads it as long via
    nanosAsLong and we convert with *integer* division (float division
    on epoch-ns values loses precision past 2^53) — and TIMESTAMP(MICROS),
    which Spark 4 reads as TIMESTAMP_NTZ. Both normalize to a session-TZ
    TimestampType here (tz pinned UTC by ensure_runtime_confs), so every
    downstream ``unix_micros`` sees identical values either way.

    ``parallelize=True`` round-robin-repartitions the scan to the
    session's core count. The local fixtures are single-row-group
    parquet files, so a scan yields ONE populated split and a map-heavy
    stage (ABI decode: ~30 expression-decoded columns per row) runs on
    one core of 32 — measured 19s -> 2s at sf0.1 once spread. Use it
    ONLY for pipelines whose pre-shuffle per-row work dominates: a
    blanket repartition of every table measured a net bench LOSS (the
    extra exchange + 32-task scheduling overhead outweighs parallelism
    for sub-second stages, e.g. minhash 3.0s -> 4.0s). A 100 TB table
    arrives as tens of thousands of splits and needs neither.
    """
    ensure_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if parallelize:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def read_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load a multi-table batch: ``{name: DataFrame}``."""
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register every table as a temp view so ``spark.sql`` steps see the
    same namespace the reference's DataFusion step sees
    (reference src/cherry_etl/steps/datafusion_step.py:15-20)."""
    for name, df in read_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
