"""Writer factory (reference writers/writer.py:18-36)."""

from __future__ import annotations

from enum import Enum

from cherry_spark.writers.base import DataWriter
from cherry_spark.writers.clickhouse_writer import ClickHouseWriter, ClickHouseWriterConfig
from cherry_spark.writers.duckdb_writer import DuckDbWriter, DuckDbWriterConfig
from cherry_spark.writers.lakehouse import (
    DeltaWriter,
    DeltaWriterConfig,
    IcebergWriter,
    IcebergWriterConfig,
)
from cherry_spark.writers.parquet_writer import ParquetWriter, ParquetWriterConfig


class WriterKind(str, Enum):
    CLICKHOUSE = "clickhouse"
    ICEBERG = "iceberg"
    DELTA_LAKE = "delta_lake"
    PYARROW_DATASET = "pyarrow_dataset"  # reference name; Parquet dataset here
    DUCKDB = "duckdb"


_FACTORY = {
    ParquetWriterConfig: ParquetWriter,
    DuckDbWriterConfig: DuckDbWriter,
    ClickHouseWriterConfig: ClickHouseWriter,
    DeltaWriterConfig: DeltaWriter,
    IcebergWriterConfig: IcebergWriter,
}


def create_writer(config) -> DataWriter:
    for cfg_type, writer_cls in _FACTORY.items():
        if isinstance(config, cfg_type):
            return writer_cls(config)
    raise ValueError(f"no writer for config type {type(config)}")
