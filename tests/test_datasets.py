"""High-level datasets API (cherry_spark/datasets.py): canned dataset
builders over the certified operator surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cherry_spark import datasets
from tests.blockchain_fixtures import (
    EVM_BLOCKS_SCHEMA,
    EVM_LOGS_SCHEMA,
    TRANSFER_TOPIC0,
    evm_rows,
)


@pytest.fixture(scope="module")
def tables(spark):
    blocks, logs, _ = evm_rows(40)
    return {
        "blocks": spark.createDataFrame(blocks, EVM_BLOCKS_SCHEMA),
        "logs": spark.createDataFrame(logs, EVM_LOGS_SCHEMA),
    }


def test_blocks_dataset_range_and_projection(tables):
    out = datasets.blocks(tables, 1005, 1014, fields=["number", "timestamp"])
    assert out.columns == ["number", "timestamp"]
    nums = sorted(r["number"] for r in out.collect())
    assert nums == list(range(1005, 1015))


def test_erc20_transfers_dataset_composes_decode_and_enrich(tables):
    out = datasets.erc20_transfers(tables, 1000, 1019)
    rows = out.collect()
    assert rows, "fixture carries Transfer logs in range"
    cols = set(out.columns)
    assert {"from", "to", "amount"} <= cols  # decoded
    assert any(c.startswith("block_") for c in cols)  # enriched
    # only Transfer-topic0 logs pass the query-model filter
    assert all(bytes(r["topic0"]) == TRANSFER_TOPIC0 for r in rows)
    # without enrich: no blocks needed, no block_ cols appended
    bare = datasets.erc20_transfers(
        {"logs": tables["logs"]}, 1000, 1019, with_block_timestamp=False
    )
    assert {"from", "to", "amount"} <= set(bare.columns)


def test_address_appearances_counts_and_relationships(spark):
    a, b, c = b"\xaa" * 20, b"\xbb" * 20, b"\xcc" * 20
    tx = spark.createDataFrame(
        [(10, a, b), (11, a, c), (12, b, None)],
        "block_number long, from binary, to binary",
    )
    logs = spark.createDataFrame(
        [(10, c), (11, c), (99, a)],  # 99 outside the range
        "block_number long, address binary",
    )
    out = datasets.address_appearances(
        {"transactions": tx, "logs": logs}, 0, 50
    ).collect()
    got = {
        (bytes(r["address"]), r["relationship"]): (
            r["n_appearances"],
            r["first_block"],
            r["last_block"],
        )
        for r in out
    }
    assert got[(a, "tx_from")] == (2, 10, 11)
    assert got[(b, "tx_from")] == (1, 12, 12)
    assert got[(b, "tx_to")] == (1, 10, 10)
    assert got[(c, "tx_to")] == (1, 11, 11)
    assert got[(c, "log_emitter")] == (2, 10, 11)
    # null to-address and out-of-range log row contribute nothing
    assert (a, "log_emitter") not in got
    assert len(got) == 5


def test_address_appearances_requires_a_source(spark):
    with pytest.raises(ValueError, match="at least one"):
        datasets.address_appearances({"blocks": spark.range(1)}, 0, 10)
