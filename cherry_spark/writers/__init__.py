from cherry_spark.writers.base import DataWriter  # noqa: F401
from cherry_spark.writers.writer import (  # noqa: F401
    ClickHouseWriterConfig,
    DeltaWriterConfig,
    DuckDbWriterConfig,
    IcebergWriterConfig,
    ParquetWriterConfig,
    WriterKind,
    create_writer,
)
