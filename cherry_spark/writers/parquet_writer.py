"""Partitioned Parquet dataset sink (reference writers/pyarrow_dataset.py:13-56).

Append mode with per-table subdirectories; supports partition columns
and a max-records-per-file cap (the reference's max_rows_per_file /
row-group knobs map to Spark's maxRecordsPerFile). Anchor-last ordering
per the protocol in base.py.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from cherry_spark.writers.base import Batch, DataWriter


@dataclass
class ParquetWriterConfig:
    path: str
    partition_by: dict[str, list[str]] = field(default_factory=dict)  # table -> cols
    # physical sort key per table: sortWithinPartitions before write —
    # the analog of the reference's ClickHouse ORDER BY clause
    # (reference config.py:76, clickhouse.py:127-137); gives clustered
    # row groups => better min/max pruning on the cursor column
    sort_by: dict[str, list[str]] = field(default_factory=dict)
    anchor_table: str | None = None
    max_records_per_file: int | None = None
    compression: str = "zstd"


class ParquetWriter(DataWriter):
    def __init__(self, cfg: ParquetWriterConfig):
        self.cfg = cfg
        self.anchor_table = cfg.anchor_table

    def push_data(self, batch: Batch) -> None:
        for name in self.anchor_last_order(batch):
            df = batch[name]
            sort_cols = self.cfg.sort_by.get(name)
            if sort_cols:
                df = df.sortWithinPartitions(*sort_cols)
            writer = df.write.mode("append").option("compression", self.cfg.compression)
            if self.cfg.max_records_per_file:
                writer = writer.option(
                    "maxRecordsPerFile", str(self.cfg.max_records_per_file)
                )
            part_cols = self.cfg.partition_by.get(name)
            if part_cols:
                writer = writer.partitionBy(*part_cols)
            writer.parquet(os.path.join(self.cfg.path, name))
