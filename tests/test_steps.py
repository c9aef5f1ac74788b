"""Unit tests for the step library — the reference's test strategy
(SURVEY §5): tiny in-memory tables, exact equality, independent-library
oracles (binascii for hex, known keccak/sha256/base58 vectors)."""

from __future__ import annotations

import binascii
import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from cherry_spark.functions.binary import b58decode_str, b58encode_bytes
from cherry_spark.functions.crypto import (
    evm_signature_to_topic0,
    keccak256,
    svm_anchor_discriminator,
)
from cherry_spark.plans import (
    Base58EncodeConfig,
    CastByTypeConfig,
    CastConfig,
    HexEncodeConfig,
    SetChainIdConfig,
    SqlStepConfig,
    Step,
    StepKind,
    TransformStepConfig,
    merge_data,
    process_steps,
)
from cherry_spark.plans.config import JoinBlockDataConfig


@pytest.fixture()
def tiny_batch(spark):
    t = spark.createDataFrame(
        [(1, b"\x00\x01\xff", 10.5), (2, b"base58!", 20.25), (3, None, None)],
        "id long, payload binary, amount double",
    )
    return {"t": t}


def test_cast_by_name(spark, tiny_batch):
    out = process_steps(
        tiny_batch,
        [Step(StepKind.CAST, CastConfig("t", {"id": "string", "amount": "decimal(10,2)"}))],
    )
    row = out["t"].orderBy("id").first()
    assert row["id"] == "1" and row["amount"] == Decimal("10.50")


def test_cast_fail_modes(spark):
    batch = {"t": spark.createDataFrame([("abc",), ("42",)], "v string")}
    ok = process_steps(
        batch, [Step(StepKind.CAST, CastConfig("t", {"v": "int"}, allow_cast_fail=True))]
    )
    vals = [r["v"] for r in ok["t"].collect()]
    assert sorted(v for v in vals if v is not None) == [42] and None in vals


def test_cast_by_type(spark, tiny_batch):
    out = process_steps(
        tiny_batch,
        [Step(StepKind.CAST_BY_TYPE, CastByTypeConfig("double", "decimal(12,2)"))],
    )
    schema = dict((f.name, f.dataType.simpleString()) for f in out["t"].schema.fields)
    assert schema["amount"] == "decimal(12,2)"
    assert schema["id"] == "bigint"  # untouched column stays


def test_hex_encode_vs_binascii(spark, tiny_batch):
    out = process_steps(tiny_batch, [Step(StepKind.HEX_ENCODE, HexEncodeConfig())])
    rows = {r["id"]: r["payload"] for r in out["t"].collect()}
    assert rows[1] == "0x" + binascii.hexlify(b"\x00\x01\xff").decode()
    assert rows[3] is None
    out2 = process_steps(
        tiny_batch, [Step(StepKind.HEX_ENCODE, HexEncodeConfig(prefixed=False))]
    )
    assert out2["t"].orderBy("id").first()["payload"] == "0001ff"


def test_base58_known_vectors():
    # public test vectors (Bitcoin base58)
    assert b58encode_bytes(b"hello world") == "StV1DL6CwTryKyV"
    assert b58encode_bytes(b"\x00\x00abc") == "11ZiCa"
    assert b58decode_str("StV1DL6CwTryKyV") == b"hello world"
    assert b58decode_str("11ZiCa") == b"\x00\x00abc"


def test_base58_step(spark, tiny_batch):
    out = process_steps(tiny_batch, [Step(StepKind.BASE58_ENCODE, Base58EncodeConfig())])
    rows = {r["id"]: r["payload"] for r in out["t"].collect()}
    assert rows[2] == b58encode_bytes(b"base58!")
    assert rows[3] is None


def test_set_chain_id_replaces_existing(spark):
    t = spark.createDataFrame([(1, 999)], "id long, chain_id long")
    out = process_steps({"t": t}, [Step(StepKind.SET_CHAIN_ID, SetChainIdConfig(8453))])
    assert out["t"].first()["chain_id"] == 8453
    assert out["t"].columns.count("chain_id") == 1


def test_u256_roundtrip(spark):
    from cherry_spark.functions.binary import (
        decimal_to_u256_binary,
        u256_binary_to_decimal38,
    )

    # 2^64-1 and 2^63 regress the decimal-division rounding bug (lo limb
    # >= 2^63 used to bump hi by one); 2^126-1 regresses the fits check.
    vals = [0, 1, 10**18, 2**63, 2**64 - 1, 2**64 + 12345, 2**100, 2**126 - 1]
    df = spark.createDataFrame([(Decimal(v),) for v in vals], "v decimal(38,0)")
    rt = df.select(
        F.col("v"),
        u256_binary_to_decimal38(decimal_to_u256_binary(F.col("v"))).alias("rt"),
        decimal_to_u256_binary(F.col("v")).alias("bin"),
    ).collect()
    for r in rt:
        assert int(r["rt"]) == int(r["v"])
        assert bytes(r["bin"]) == int(r["v"]).to_bytes(32, "big")


def test_crypto_constants():
    assert (
        evm_signature_to_topic0(
            "Transfer(address indexed from, address indexed to, uint256 amount)"
        ).hex()
        == "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
    )
    # sha256-derived, independently computable (reference tests/test_steps.py:161-163)
    import hashlib

    assert svm_anchor_discriminator("initialize") == hashlib.sha256(
        b"global:initialize"
    ).digest()[:8]
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )


def test_sql_step(spark):
    t = spark.createDataFrame([(1, 5.0), (2, 7.0)], "k long, v double")
    out = process_steps(
        {"numbers": t},
        [
            Step(
                StepKind.SQL,
                SqlStepConfig(
                    "SELECT k, v * 2 AS v2 FROM numbers WHERE k > 1", "doubled"
                ),
            )
        ],
    )
    assert set(out) == {"numbers", "doubled"}
    assert out["doubled"].first()["v2"] == 14.0


def test_transform_step_replaces_batch(spark):
    t = spark.createDataFrame([(1,)], "k long")

    def runner(batch, ctx):
        return {"renamed": batch["t"].withColumn("c", F.lit(ctx))}

    out = process_steps(
        {"t": t}, [Step(StepKind.TRANSFORM, TransformStepConfig(runner, context=9))]
    )
    assert set(out) == {"renamed"}
    assert out["renamed"].first()["c"] == 9


def test_merge_data(spark):
    b1 = {"t": spark.createDataFrame([(1,)], "k long")}
    b2 = {"t": spark.createDataFrame([(2,)], "k long")}
    merged = merge_data([b1, b2])
    assert sorted(r["k"] for r in merged["t"].collect()) == [1, 2]
    with pytest.raises(ValueError):
        merge_data([b1, {"other": b1["t"]}])


def test_join_block_data(spark):
    blocks = spark.createDataFrame(
        [(100, datetime.datetime(2024, 1, 1)), (101, datetime.datetime(2024, 1, 2))],
        "number long, timestamp timestamp",
    )
    logs = spark.createDataFrame([(100, 0), (101, 1), (102, 2)], "block_number long, log_index long")
    out = process_steps(
        {"blocks": blocks, "logs": logs},
        [
            Step(
                StepKind.JOIN_BLOCK_DATA,
                JoinBlockDataConfig(tables=["logs"], join_key="block_number"),
            )
        ],
    )
    rows = {r["block_number"]: r["block_timestamp"] for r in out["logs"].collect()}
    assert rows[100] == datetime.datetime(2024, 1, 1)
    assert rows[102] is None  # left join keeps orphans


def test_u256_sum_exact_past_decimal38(spark):
    """Planted full-range uint256 values whose exact total exceeds
    2^256 (top carry) and wraps every limb boundary — checked against
    Python bignum arithmetic."""
    from cherry_spark.functions.binary import u256_sum_agg, u256_sum_hex

    vals = [
        2**256 - 2**13,          # near-max: carries through all limbs
        2**192 + 5,              # isolated high limb
        (1 << 64) - 1,           # max low limb (forces l0 carry)
        (1 << 128) - 1,          # max low two limbs
        12345,
        0,
    ]
    rows = [(i, v.to_bytes(32, "big")) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, amount binary")
    out = (
        df.agg(u256_sum_agg(F.col("amount")).alias("s"))
        .select(u256_sum_hex(F.col("s")).alias("h"))
        .collect()
    )
    assert out[0]["h"] == "0x" + format(sum(vals), "080x")


def test_u256_sum_grouped(spark):
    """Grouped exact totals, each group independently carried."""
    from cherry_spark.functions.binary import u256_sum_agg, u256_sum_hex

    vals = {"a": [2**255, 2**255 - 1, 77], "b": [(1 << 64) - 1, 1]}
    rows = [
        (g, v.to_bytes(32, "big")) for g, vs in vals.items() for v in vs
    ]
    df = spark.createDataFrame(rows, "g string, amount binary")
    out = {
        r["g"]: r["h"]
        for r in df.groupBy("g")
        .agg(u256_sum_agg(F.col("amount")).alias("s"))
        .select("g", u256_sum_hex(F.col("s")).alias("h"))
        .collect()
    }
    for g, vs in vals.items():
        assert out[g] == "0x" + format(sum(vs), "080x"), g
