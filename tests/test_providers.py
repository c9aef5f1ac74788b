"""Provider adapter contract: query in, cursor-windowed batches out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cherry_spark.model import EvmQuery, LogRequest
from cherry_spark.sources.providers import (
    LocalReplayProvider,
    ProviderConfig,
    ProviderKind,
    start_stream,
)
from tests.blockchain_fixtures import (
    EVM_BLOCKS_SCHEMA,
    EVM_LOGS_SCHEMA,
    TRANSFER_TOPIC0,
    evm_rows,
)


@pytest.fixture(scope="module")
def evm_tables(spark):
    blocks, logs, _ = evm_rows(40)
    return {
        "blocks": spark.createDataFrame(blocks, EVM_BLOCKS_SCHEMA),
        "logs": spark.createDataFrame(logs, EVM_LOGS_SCHEMA),
    }, logs


def test_local_replay_windows_and_query_model(spark, evm_tables):
    tables, logs = evm_tables
    q = EvmQuery(
        from_block=1000,
        to_block=1019,
        logs=[LogRequest(topic0=[TRANSFER_TOPIC0])],
        include_all_blocks=True,
    )
    batches = list(LocalReplayProvider(tables).start_stream(spark, q, batch_size=7))
    assert len(batches) == 3  # ceil(20 / 7)
    seen = set()
    for b in batches:
        assert set(b) >= {"blocks", "logs"}
        for r in b["logs"].collect():
            assert bytes(r["topic0"]) == TRANSFER_TOPIC0  # query model applied
            seen.add((r["block_number"], r["log_index"]))
    expected = {
        (r[0], r[2])
        for r in logs
        if 1000 <= r[0] <= 1019 and bytes(r[4]) == TRANSFER_TOPIC0
    }
    assert seen == expected
    # windows are disjoint: total blocks across batches == range size
    n_blocks = sum(b["blocks"].count() for b in batches)
    assert n_blocks == 20


def test_dispatch_and_network_gating(spark, evm_tables):
    tables, _ = evm_tables
    q = EvmQuery(from_block=1000, to_block=1004, include_all_blocks=True)
    cfg = ProviderConfig(kind=ProviderKind.LOCAL_REPLAY)
    assert len(list(start_stream(cfg, spark, q, batch_size=2, tables=tables))) == 3

    live = ProviderConfig(kind=ProviderKind.HYPERSYNC, url="https://example.invalid")
    with pytest.raises(RuntimeError, match="no transport"):
        next(start_stream(live, spark, q))


def test_injected_transport_is_windowed(spark):
    """A fetch_fn transport is called once per cursor window with the
    right bounds — the live-adapter contract without any network."""
    calls = []

    def fake_fetch(url, query, lo, hi):
        calls.append((lo, hi))
        return {"blocks": spark.range(lo, hi + 1).withColumnRenamed("id", "number")}

    cfg = ProviderConfig(
        kind=ProviderKind.SQD, url="https://example.invalid", fetch_fn=fake_fetch
    )
    q = EvmQuery(from_block=10, to_block=25)
    batches = list(start_stream(cfg, spark, q, batch_size=8))
    assert calls == [(10, 17), (18, 25)]
    assert sum(b["blocks"].count() for b in batches) == 16
