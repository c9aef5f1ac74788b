"""Connector-less contract tests for the three gated sinks (round-7
verdict item #8): the ``push_data`` ORCHESTRATION — anchor-last write
order, skip-empty, create-vs-append resolution, DDL-before-insert, and
txnAppId idempotence-key reuse across a simulated crash-retry — is all
repo logic and must hold regardless of which connector jar is on the
classpath.  Each writer exposes its single real side effect as an
overridable seam; these tests replace the seam with a spy and drive the
real ``push_data`` code path.
"""

from __future__ import annotations

import pytest

from cherry_spark.writers.clickhouse_writer import (
    ClickHouseWriter,
    ClickHouseWriterConfig,
)
from cherry_spark.writers.lakehouse import (
    DeltaWriter,
    DeltaWriterConfig,
    IcebergWriter,
    IcebergWriterConfig,
)


@pytest.fixture()
def batch(spark):
    return {
        "logs": spark.createDataFrame([(1, "a"), (2, "b")], "n long, v string"),
        "transfers": spark.createDataFrame([(1, 10)], "n long, amt long"),
        "blocks": spark.createDataFrame([(1,), (2,)], "number long"),
    }


class _SpyDeltaWriter(DeltaWriter):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.calls: list[tuple[str, str | None, str | None]] = []
        self.fail_on: str | None = None

    def _write_table(self, df, name, options, partition_by):
        if name == self.fail_on:
            self.fail_on = None  # fail once, then heal
            raise ConnectionError(f"simulated crash writing {name}")
        self.calls.append(
            (name, options.get("txnVersion"), options.get("txnAppId"))
        )


def test_delta_crash_retry_reuses_txn_version(batch):
    """A crash mid-batch must NOT advance the txnVersion: the retry of
    the same batch re-writes with the same (txnAppId, txnVersion) so
    Delta's idempotent-write dedupe skips the tables that already
    committed instead of double-appending them."""
    w = _SpyDeltaWriter(
        DeltaWriterConfig(path="/tmp/x", anchor_table="blocks", txn_app_id="app")
    )
    w.fail_on = "transfers"
    with pytest.raises(ConnectionError):
        w.push_data(batch)
    # logs committed with version 1 before the crash; anchor never reached
    assert w.calls == [("logs", "1", "app")]

    w.push_data(batch)  # caller retries the SAME batch
    assert w.calls[1:] == [
        ("logs", "1", "app"),        # same key -> engine-side dedupe
        ("transfers", "1", "app"),
        ("blocks", "1", "app"),      # anchor strictly last
    ]

    # the NEXT batch gets a fresh version
    w.push_data(batch)
    assert {c[1] for c in w.calls[4:]} == {"2"}


def test_delta_skip_empty_and_anchor_last(spark, batch):
    empty = spark.createDataFrame([], "n long, v string")
    w = _SpyDeltaWriter(
        DeltaWriterConfig(path="/tmp/x", anchor_table="blocks", txn_app_id="app")
    )
    w.push_data({**batch, "empty_side": empty})
    names = [c[0] for c in w.calls]
    assert "empty_side" not in names  # reference delta_lake.py:21-22
    assert names[-1] == "blocks"
    assert set(names) == {"logs", "transfers", "blocks"}


def test_delta_no_txn_app_id_omits_idempotence_keys(batch):
    w = _SpyDeltaWriter(DeltaWriterConfig(path="/tmp/x", anchor_table="blocks"))
    w.push_data(batch)
    assert all(v is None and a is None for _, v, a in w.calls)


class _SpyIcebergWriter(IcebergWriter):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.existing: set[str] = set()
        self.ops: list[tuple[str, str]] = []
        self.crash_after_create: str | None = None

    def _table_exists(self, df, ident):
        return ident in self.existing

    def _create(self, df, ident):
        self.ops.append(("create", ident))
        self.existing.add(ident)  # the create itself committed...
        if self.crash_after_create and ident.endswith(self.crash_after_create):
            self.crash_after_create = None
            raise ConnectionError("simulated crash after create committed")

    def _append(self, df, ident):
        self.ops.append(("append", ident))


def test_iceberg_create_once_then_append_anchor_last(batch):
    w = _SpyIcebergWriter(
        IcebergWriterConfig(catalog="c", namespace="ns", anchor_table="blocks")
    )
    w.push_data(batch)
    assert [op for op, _ in w.ops] == ["create"] * 3
    assert w.ops[-1][1] == "c.ns.blocks"  # anchor last
    w.push_data(batch)
    assert [op for op, _ in w.ops[3:]] == ["append"] * 3
    assert w.ops[-1][1] == "c.ns.blocks"


def test_iceberg_crash_between_create_and_bookkeeping_resolves_to_append(batch):
    """If the create COMMITS but the writer crashes before updating its
    session-local cache, the retry must consult the catalog (the
    authority) and append — never create twice."""
    w = _SpyIcebergWriter(
        IcebergWriterConfig(catalog="c", namespace="ns", anchor_table="blocks")
    )
    w.crash_after_create = "logs"
    with pytest.raises(ConnectionError):
        w.push_data(batch)
    assert w.ops == [("create", "c.ns.logs")]

    w.push_data(batch)  # retry of the same batch
    assert ("append", "c.ns.logs") in w.ops[1:]
    assert w.ops.count(("create", "c.ns.logs")) == 1  # no double-create


class _SpyClickHouseWriter(ClickHouseWriter):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.ops: list[tuple[str, str]] = []

    def _execute_ddl(self, spark, ddl):
        self.ops.append(("ddl", ddl))

    def _insert(self, df, name):
        self.ops.append(("insert", name))


def test_clickhouse_ddl_precedes_each_insert_anchor_last(batch):
    w = _SpyClickHouseWriter(
        ClickHouseWriterConfig(
            url="jdbc:clickhouse://example.invalid:8123/db",
            order_by={"logs": ["n"]},
            anchor_table="blocks",
        )
    )
    w.push_data(batch)
    kinds = [k for k, _ in w.ops]
    assert kinds == ["ddl", "insert"] * 3  # per-table DDL-then-insert
    inserts = [v for k, v in w.ops if k == "insert"]
    assert inserts[-1] == "blocks"  # anchor last
    logs_ddl = next(v for k, v in w.ops if k == "ddl" and "`logs`" in v)
    assert "ORDER BY (n)" in logs_ddl  # cfg.order_by reaches the DDL
