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


def test_svm_swaps_dataset_end_to_end(spark):
    """The jup_swap example shape as one call: synthesize Anchor swap
    instructions (disc + u64 amount_in + u64 min_amount_out LE +
    3 account pubkeys), plus decoys (wrong program, wrong
    discriminator, out of range), and check filter -> Borsh decode ->
    block + transaction enrich."""
    import struct

    from cherry_spark.functions.crypto import svm_anchor_discriminator

    prog = b"\x01" * 32
    other_prog = b"\x02" * 32
    disc = svm_anchor_discriminator("swap")
    bad_disc = svm_anchor_discriminator("not_swap")

    def payload(d, a_in, a_out):
        return d + struct.pack("<QQ", a_in, a_out)

    rows = []
    for i in range(6):
        rows.append(
            (
                100 + i,           # block_slot
                0,                 # transaction_index
                0,                 # instruction_index
                prog,
                payload(disc, 1000 + i, 900 + i),
                b"\x0a" * 32, b"\x0b" * 32, b"\x0c" * 32,
                *[None] * 7,
            )
        )
    rows.append((102, 1, 0, other_prog, payload(disc, 5, 5),
                 b"\x0a" * 32, None, None, *[None] * 7))   # wrong program
    rows.append((103, 1, 0, prog, payload(bad_disc, 6, 6),
                 b"\x0a" * 32, None, None, *[None] * 7))   # wrong disc
    rows.append((999, 0, 0, prog, payload(disc, 7, 7),
                 b"\x0a" * 32, None, None, *[None] * 7))   # out of range
    schema = (
        "block_slot long, transaction_index long, instruction_index long,"
        " program_id binary, data binary,"
        + ",".join(f" a{i} binary" for i in range(10))
    )
    instructions = spark.createDataFrame(rows, schema)
    blocks = spark.createDataFrame(
        [(100 + i, 1_700_000_000 + i) for i in range(10)] + [(999, 2_000_000_000)],
        "slot long, timestamp long",
    )
    txs = spark.createDataFrame(
        [(100 + i, 0, f"sig{i}") for i in range(10)],
        "block_slot long, transaction_index long, signature string",
    )
    out = datasets.svm_swaps(
        {"instructions": instructions, "blocks": blocks, "transactions": txs},
        from_slot=100,
        to_slot=110,
        program_id=prog,
    ).collect()
    got = {r["block_slot"]: r for r in out}
    assert sorted(got) == [100, 101, 102, 103, 104, 105]
    for i in range(6):
        r = got[100 + i]
        assert r["amount_in"] == 1000 + i
        assert r["min_amount_out"] == 900 + i
        assert bytes(r["user"]) == b"\x0a" * 32
        assert r["block_timestamp"] == 1_700_000_000 + i
        assert r["signature"] == f"sig{i}"
