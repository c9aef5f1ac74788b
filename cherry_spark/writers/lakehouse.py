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
        # Idempotence contract: the version for THIS batch is fixed at
        # entry and the stored counter advances only after every table
        # committed.  A crash mid-batch therefore leaves the counter
        # unchanged, and the caller's retry of the SAME batch re-writes
        # with the SAME (txnAppId, txnVersion) — Delta's idempotent-
        # write dedupe skips the tables that already committed instead
        # of double-appending them.  (Before round 8 the counter
        # incremented at entry, so a retry minted a fresh version and
        # silently duplicated the already-written tables.)
        version = self._txn_version + 1
        for name in self.anchor_last_order(batch):
            df = batch[name]
            if not df.take(1):  # skip empty tables (reference delta_lake.py:21-22)
                continue
            options = {"mergeSchema": "true"}
            if self.cfg.txn_app_id:
                options["txnAppId"] = self.cfg.txn_app_id
                options["txnVersion"] = str(version)
            self._write_table(
                df, name, options, self.cfg.partition_by.get(name)
            )
        self._txn_version = version

    def _write_table(
        self,
        df,
        name: str,
        options: dict[str, str],
        partition_by: list[str] | None,
    ) -> None:
        """The one real side effect — overridable seam so the push_data
        orchestration (anchor-last, skip-empty, crash-retry version
        reuse) is testable without the Delta jars on the classpath."""
        import os

        if not _delta_available(df.sparkSession):
            raise RuntimeError(
                "Delta Lake connector not on the classpath; add the "
                "delta-spark package or use WriterKind.PYARROW_DATASET"
            )
        writer = df.write.format("delta").mode("append")
        for k, v in options.items():
            writer = writer.option(k, v)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
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
            # create-if-not-exists on first write (reference iceberg.py:40-44).
            # _created is a session-local fast path; the catalog probe is
            # the authority, so a crash between create and the _created
            # update still resolves to append on retry.
            if name not in self._created and not self._table_exists(df, ident):
                self._create(df, ident)
            else:
                self._append(df, ident)
            self._created.add(name)

    # -- side-effect seams (overridable for connector-less contract tests)
    def _table_exists(self, df, ident: str) -> bool:
        return df.sparkSession.catalog.tableExists(ident)

    def _create(self, df, ident: str) -> None:
        df.writeTo(ident).create()

    def _append(self, df, ident: str) -> None:
        df.writeTo(ident).append()
