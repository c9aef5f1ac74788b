"""Decode compiler tests: differential against pure-Python expected
values computed independently in the test (int.from_bytes etc.)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cherry_spark.operators.decode_svm import (
    FixedArray,
    InstructionSignature,
    ParamInput,
    instruction_signature_to_schema,
)
from cherry_spark.plans import Step, StepKind, process_steps
from cherry_spark.plans.config import (
    EvmDecodeEventsConfig,
    EvmValidateBlockDataConfig,
    GlaciersEventsConfig,
    SvmDecodeInstructionsConfig,
)
from tests.blockchain_fixtures import (
    EVM_BLOCKS_SCHEMA,
    EVM_LOGS_SCHEMA,
    JUP_DISCRIMINATOR,
    SVM_INSTRUCTIONS_SCHEMA,
    TRANSFER_SIG,
    TRANSFER_TOPIC0,
    evm_rows,
    svm_rows,
)


@pytest.fixture(scope="module")
def evm_batch(spark):
    blocks, logs, expected = evm_rows(100)
    return {
        "blocks": spark.createDataFrame(blocks, EVM_BLOCKS_SCHEMA),
        "logs": spark.createDataFrame(logs, EVM_LOGS_SCHEMA),
    }, logs, expected


def test_evm_decode_transfer(spark, evm_batch):
    batch, logs, expected = evm_batch
    out = process_steps(
        batch,
        [
            Step(
                StepKind.EVM_DECODE_EVENTS,
                EvmDecodeEventsConfig(TRANSFER_SIG, allow_decode_fail=True),
            )
        ],
    )
    decoded = out["decoded_logs"].orderBy("log_index").collect()
    assert len(decoded) == len(logs)  # 1-row-in/1-row-out
    for i, row in enumerate(decoded):
        from_a, to_a, amount = expected[i]
        is_transfer = bytes(logs[i][4]) == TRANSFER_TOPIC0
        # decode is unconditional on payload shape; fail-path rows (non-
        # transfer topic0) still decode since layout matches — semantics
        # match the reference kernel, which decodes what it can.
        assert bytes(row["from"]) == from_a
        assert bytes(row["to"]) == to_a
        assert int(row["amount"]) == amount
        # hstack keeps originals
        assert row["block_number"] == logs[i][0]
        assert is_transfer == (bytes(row["topic0"]) == TRANSFER_TOPIC0)


def test_evm_decode_null_on_missing_topic(spark):
    rows = [(1, None, 0, b"\x00" * 20, TRANSFER_TOPIC0, None, None, None, b"\x00" * 32)]
    batch = {"logs": spark.createDataFrame(rows, EVM_LOGS_SCHEMA)}
    out = process_steps(
        batch,
        [
            Step(
                StepKind.EVM_DECODE_EVENTS,
                EvmDecodeEventsConfig(TRANSFER_SIG, allow_decode_fail=True),
            )
        ],
    )
    row = out["decoded_logs"].first()
    assert row["from"] is None and row["to"] is None and row["amount"] is None


def test_evm_decode_raises_without_allow_fail(spark):
    rows = [(1, None, 0, b"\x00" * 20, TRANSFER_TOPIC0, None, None, None, b"bad")]
    batch = {"logs": spark.createDataFrame(rows, EVM_LOGS_SCHEMA)}
    out = process_steps(
        batch,
        [
            Step(
                StepKind.EVM_DECODE_EVENTS,
                EvmDecodeEventsConfig(TRANSFER_SIG, allow_decode_fail=False),
            )
        ],
    )
    with pytest.raises(Exception, match="undecodable|USER_RAISED"):
        out["decoded_logs"].collect()


def test_evm_decode_dynamic_string(spark):
    # event Named(string name, uint256 id) — dynamic head/tail layout
    name = b"cherry-spark"
    head = (64).to_bytes(32, "big") + (7).to_bytes(32, "big")
    tail = len(name).to_bytes(32, "big") + name + b"\x00" * (32 - len(name))
    rows = [(1, None, 0, b"\x00" * 20, b"\x00" * 32, None, None, None, head + tail)]
    batch = {"logs": spark.createDataFrame(rows, EVM_LOGS_SCHEMA)}
    out = process_steps(
        batch,
        [
            Step(
                StepKind.EVM_DECODE_EVENTS,
                EvmDecodeEventsConfig(
                    "Named(string name, uint256 id)", allow_decode_fail=True
                ),
            )
        ],
    )
    row = out["decoded_logs"].first()
    assert row["name"] == "cherry-spark"
    assert int(row["id"]) == 7


JUP_SIG = InstructionSignature(
    discriminator=JUP_DISCRIMINATOR,
    params=[
        ParamInput("amm", "pubkey"),
        ParamInput("input_mint", "pubkey"),
        ParamInput("input_amount", "u64"),
        ParamInput("output_mint", "pubkey"),
        ParamInput("output_amount", "u64"),
    ],
    accounts_names=["payer", "authority"],
)


def test_svm_decode_instructions(spark):
    rows, expected = svm_rows(60)
    batch = {"instructions": spark.createDataFrame(rows, SVM_INSTRUCTIONS_SCHEMA)}
    out = process_steps(
        batch,
        [
            Step(
                StepKind.SVM_DECODE_INSTRUCTIONS,
                SvmDecodeInstructionsConfig(JUP_SIG, allow_decode_fail=True),
            )
        ],
    )
    got = out["decoded_instructions"].orderBy("block_slot", "transaction_index").collect()
    assert len(got) == len(rows)
    for i, row in enumerate(got):
        if expected[i] is None:
            assert row["amm"] is None and row["input_amount"] is None
        else:
            amm, in_mint, in_amt, out_mint, out_amt = expected[i]
            assert bytes(row["amm"]) == amm
            assert bytes(row["input_mint"]) == in_mint
            assert int(row["input_amount"]) == in_amt
            assert bytes(row["output_mint"]) == out_mint
            assert int(row["output_amount"]) == out_amt
        # account renaming
        assert bytes(row["payer"]) == bytes(rows[i][4])
        assert bytes(row["authority"]) == bytes(rows[i][5])


def test_svm_schema_compiler():
    schema = instruction_signature_to_schema(JUP_SIG)
    assert [f.name for f in schema.fields] == [
        "amm", "input_mint", "input_amount", "output_mint", "output_amount",
        "payer", "authority",
    ]
    assert schema["input_amount"].dataType.simpleString() == "decimal(20,0)"


def test_svm_decode_variable_string(spark):
    sig = InstructionSignature(
        discriminator=b"\x01\x02",
        params=[
            ParamInput("tag", "u16"),
            ParamInput("memo", "string"),
            ParamInput("after", "u32"),
        ],
    )
    memo = "hello solana"
    payload = (
        b"\x01\x02"
        + (513).to_bytes(2, "little")
        + len(memo).to_bytes(4, "little")
        + memo.encode()
        + (77).to_bytes(4, "little")
    )
    rows = [(1, 0, b"\x00" * 32, payload, *[None] * 10)]
    batch = {"instructions": spark.createDataFrame(rows, SVM_INSTRUCTIONS_SCHEMA)}
    out = process_steps(
        batch,
        [
            Step(
                StepKind.SVM_DECODE_INSTRUCTIONS,
                SvmDecodeInstructionsConfig(sig, allow_decode_fail=True),
            )
        ],
    )
    row = out["decoded_instructions"].first()
    assert row["tag"] == 513
    assert row["memo"] == memo
    assert row["after"] == 77


def test_validate_block_data(spark, evm_batch):
    batch, _, _ = evm_batch
    out = process_steps(
        batch,
        [Step(StepKind.EVM_VALIDATE_BLOCK_DATA, EvmValidateBlockDataConfig())],
    )
    assert out is not None  # consistent batch passes

    from cherry_spark.operators.validate import BlockValidationError

    bad_logs = batch["logs"].withColumn(
        "block_number", F.col("block_number") + F.lit(10**6)
    )
    with pytest.raises(BlockValidationError):
        process_steps(
            {"blocks": batch["blocks"], "logs": bad_logs},
            [Step(StepKind.EVM_VALIDATE_BLOCK_DATA, EvmValidateBlockDataConfig())],
        )


def test_validate_parent_hash_chain(spark):
    """Chain continuity via the predecessor equi-join: a tampered
    parent_hash on a consecutive pair raises; a number GAP is not a
    chain break (matches the old lag + prev_number==number-1 filter)."""
    from cherry_spark.operators.validate import (
        BlockValidationError,
        evm_validate_block_data,
    )

    def blocks(rows):
        return spark.createDataFrame(
            rows, "number long, hash string, parent_hash string"
        )

    good = blocks(
        [(1, "h1", "h0"), (2, "h2", "h1"), (5, "h5", "hX"), (6, "h6", "h5")]
    )
    evm_validate_block_data({"blocks": good}, EvmValidateBlockDataConfig())

    bad = blocks([(1, "h1", "h0"), (2, "h2", "h1"), (3, "h3", "WRONG")])
    with pytest.raises(BlockValidationError) as ei:
        evm_validate_block_data({"blocks": bad}, EvmValidateBlockDataConfig())
    assert ei.value.violations == {"broken_parent_hash_chain": 1}


def test_evm_decode_no_hstack(spark, evm_batch):
    batch, logs, _ = evm_batch
    out = process_steps(
        batch,
        [
            Step(
                StepKind.EVM_DECODE_EVENTS,
                EvmDecodeEventsConfig(
                    TRANSFER_SIG, allow_decode_fail=True, hstack=False,
                    output_table="bare",
                ),
            )
        ],
    )
    assert out["bare"].columns == ["from", "to", "amount"]
    assert out["bare"].count() == len(logs)


def test_glaciers_multi_signature_decode(spark, evm_batch):
    batch, logs, _ = evm_batch
    abi_db = spark.createDataFrame(
        [
            (bytes(logs[0][3]), TRANSFER_TOPIC0, TRANSFER_SIG),
            (bytes(logs[1][3]), TRANSFER_TOPIC0, TRANSFER_SIG),
            (bytes(logs[2][3]), TRANSFER_TOPIC0, TRANSFER_SIG),
        ],
        "address binary, topic0 binary, event_signature string",
    )
    b = dict(batch)
    b["abi_db"] = abi_db
    out = process_steps(
        b, [Step(StepKind.GLACIERS_EVENTS, GlaciersEventsConfig())]
    )
    decoded = out["decoded_logs"].collect()
    assert len(decoded) > 0
    assert all(r["event_signature"] == TRANSFER_SIG for r in decoded)
    # generic Glaciers contract: param names + stringified values
    assert all(list(r["event_keys"]) == ["from", "to", "amount"] for r in decoded)
    assert all(r["event_values"][2] is not None for r in decoded)


def test_glaciers_branch_count_independent_of_signatures(spark, evm_batch):
    """N same-layout signatures must produce ONE decode branch (no
    per-signature union fan-out) and still label rows correctly."""
    batch, logs, _ = evm_batch
    from cherry_spark.functions.crypto import evm_signature_to_topic0

    sigs = [
        f"Evt{i}(address indexed a{i}, address indexed b{i}, uint256 v{i})"
        for i in range(12)
    ]
    rows = [
        (bytes(logs[i % 3][3]), evm_signature_to_topic0(s), s)
        for i, s in enumerate(sigs)
    ] + [(bytes(logs[0][3]), TRANSFER_TOPIC0, TRANSFER_SIG)]
    abi_db = spark.createDataFrame(
        rows, "address binary, topic0 binary, event_signature string"
    )
    b = dict(batch)
    b["abi_db"] = abi_db
    out = process_steps(b, [Step(StepKind.GLACIERS_EVENTS, GlaciersEventsConfig())])
    df = out["decoded_logs"]
    # all 13 signatures share one layout -> exactly one branch, no Union
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan
    decoded = df.collect()
    assert decoded and all(
        r["event_keys"][2].startswith("v") or r["event_keys"][2] == "amount"
        for r in decoded
    )


def test_glaciers_abi_db_from_file(spark, evm_batch, tmp_path):
    """The reference's abi_db_path contract (config.py:137-142): a
    multi-layout JSON db file — one row with explicit topic0, one
    deriving it from the signature — decodes identically to the
    in-memory DataFrame path."""
    import json

    from cherry_spark.functions.crypto import evm_signature_to_topic0

    batch, logs, _ = evm_batch
    approval_sig = (
        "Approval(address indexed owner, address indexed spender, bool ok)"
    )
    db_rows = [
        {
            "address": "0x" + bytes(logs[0][3]).hex(),
            "topic0": "0x" + TRANSFER_TOPIC0.hex(),
            "event_signature": TRANSFER_SIG,
        },
        {
            "address": "0x" + bytes(logs[1][3]).hex(),
            "event_signature": TRANSFER_SIG,  # topic0 derived
        },
        {
            "address": "0x" + bytes(logs[2][3]).hex(),
            "event_signature": approval_sig,  # second layout, derived
        },
    ]
    db_file = tmp_path / "abi_db.json"
    db_file.write_text(json.dumps(db_rows))

    out_file = process_steps(
        dict(batch),
        [
            Step(
                StepKind.GLACIERS_EVENTS,
                GlaciersEventsConfig(abi_db_path=str(db_file)),
            )
        ],
    )["decoded_logs"]

    mem_db = spark.createDataFrame(
        [
            (bytes(logs[0][3]), TRANSFER_TOPIC0, TRANSFER_SIG),
            (bytes(logs[1][3]), TRANSFER_TOPIC0, TRANSFER_SIG),
            (
                bytes(logs[2][3]),
                evm_signature_to_topic0(approval_sig),
                approval_sig,
            ),
        ],
        "address binary, topic0 binary, event_signature string",
    )
    b = dict(batch)
    b["abi_db"] = mem_db
    out_mem = process_steps(
        b, [Step(StepKind.GLACIERS_EVENTS, GlaciersEventsConfig())]
    )["decoded_logs"]

    key_cols = ["address", "topic0", "event_signature", "event_values"]
    file_rows = {tuple(map(str, r)) for r in out_file.select(key_cols).collect()}
    mem_rows = {tuple(map(str, r)) for r in out_mem.select(key_cols).collect()}
    assert file_rows == mem_rows and len(file_rows) > 0
