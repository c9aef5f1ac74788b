"""Delta Lake and Iceberg sinks — native Spark writers, gated because
this container ships neither connector. The code paths are the real
ones a cluster with the jars would execute.

Delta (reference writers/delta_lake.py:15-54): append with schema
merge, optional partitioning, skip empty tables, anchor-last; plus
idempotent-write options (txnAppId/txnVersion) which supersede the
anchor protocol when available.

Iceberg (reference writers/iceberg.py:10-49): namespace + table
creation on first write, then appends.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from cherry_spark.writers.base import Batch, DataWriter


def _delta_available(spark) -> bool:
    try:
        spark._jvm.io.delta.tables.DeltaTable  # noqa: B018
        return True
    except Exception:
        return False


@dataclass
class DeltaWriterConfig:
    path: str  # table root; per-table subdirs
    partition_by: dict[str, list[str]] = field(default_factory=dict)
    anchor_table: str | None = None
    txn_app_id: str | None = None  # idempotent writes (exactly-once)


class DeltaWriter(DataWriter):
    def __init__(self, cfg: DeltaWriterConfig):
        self.cfg = cfg
        self.anchor_table = cfg.anchor_table
        self._txn_version = 0

    def push_data(self, batch: Batch) -> None:
        import os

        first_df = next(iter(batch.values()))
        if not _delta_available(first_df.sparkSession):
            raise RuntimeError(
                "Delta Lake connector not on the classpath; add the "
                "delta-spark package or use WriterKind.PYARROW_DATASET"
            )
        self._txn_version += 1
        for name in self.anchor_last_order(batch):
            df = batch[name]
            if not df.take(1):  # skip empty tables (reference delta_lake.py:21-22)
                continue
            writer = (
                df.write.format("delta")
                .mode("append")
                .option("mergeSchema", "true")
            )
            if self.cfg.txn_app_id:
                writer = writer.option("txnAppId", self.cfg.txn_app_id).option(
                    "txnVersion", str(self._txn_version)
                )
            part = self.cfg.partition_by.get(name)
            if part:
                writer = writer.partitionBy(*part)
            writer.save(os.path.join(self.cfg.path, name))


@dataclass
class IcebergWriterConfig:
    catalog: str
    namespace: str
    anchor_table: str | None = None


class IcebergWriter(DataWriter):
    def __init__(self, cfg: IcebergWriterConfig):
        self.cfg = cfg
        self.anchor_table = cfg.anchor_table
        self._created: set[str] = set()

    def push_data(self, batch: Batch) -> None:
        for name in self.anchor_last_order(batch):
            df = batch[name]
            ident = f"{self.cfg.catalog}.{self.cfg.namespace}.{name}"
            # create-if-not-exists on first write (reference iceberg.py:40-44)
            if name not in self._created and not df.sparkSession.catalog.tableExists(ident):
                df.writeTo(ident).create()
            else:
                df.writeTo(ident).append()
            self._created.add(name)
