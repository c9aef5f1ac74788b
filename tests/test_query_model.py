"""Query-model semantics (SURVEY §2.2) vs pure-Python expected results
computed directly from the fixture row lists."""

from __future__ import annotations

import pytest

from cherry_spark.model import (
    EvmQuery,
    InstructionRequest,
    LogRequest,
    SvmQuery,
    apply_evm_query,
    apply_svm_query,
)
from tests.blockchain_fixtures import (
    EVM_BLOCKS_SCHEMA,
    EVM_LOGS_SCHEMA,
    JUP_DISCRIMINATOR,
    JUP_PROGRAM_ID,
    SVM_INSTRUCTIONS_SCHEMA,
    TRANSFER_TOPIC0,
    evm_rows,
    svm_rows,
)


@pytest.fixture(scope="module")
def evm(spark):
    blocks, logs, _ = evm_rows(120)
    return (
        {
            "blocks": spark.createDataFrame(blocks, EVM_BLOCKS_SCHEMA),
            "logs": spark.createDataFrame(logs, EVM_LOGS_SCHEMA),
        },
        blocks,
        logs,
    )


def test_block_range_inclusive(spark, evm):
    tables, blocks, logs = evm
    q = EvmQuery(from_block=1002, to_block=1005, include_all_blocks=True)
    out = apply_evm_query(tables, q)
    got_blocks = sorted(r["number"] for r in out["blocks"].collect())
    assert got_blocks == [1002, 1003, 1004, 1005]  # both ends inclusive
    expected_logs = [r for r in logs if 1002 <= r[0] <= 1005]
    assert out["logs"].count() == len(expected_logs)


def test_or_of_requests_and_fields(spark, evm):
    tables, _, logs = evm
    addr_a = bytes(logs[0][3])
    q = EvmQuery(
        from_block=1000,
        to_block=1019,
        logs=[
            LogRequest(topic0=[TRANSFER_TOPIC0], address=[addr_a]),  # AND within
            LogRequest(address=[bytes(logs[1][3])]),  # OR across requests
        ],
    )
    out = apply_evm_query(tables, q)
    got = {(r["block_number"], r["log_index"]) for r in out["logs"].collect()}
    expected = {
        (r[0], r[2])
        for r in logs
        if (bytes(r[4]) == TRANSFER_TOPIC0 and bytes(r[3]) == addr_a)
        or bytes(r[3]) == bytes(logs[1][3])
    }
    assert got == expected and got


def test_include_blocks_semi_join(spark, evm):
    tables, blocks, logs = evm
    rare_addr = bytes(logs[7][3])
    q = EvmQuery(
        from_block=1000,
        to_block=1019,
        logs=[LogRequest(address=[rare_addr], include_blocks=True)],
    )
    out = apply_evm_query(tables, q)
    matched_blocks = {r[0] for r in logs if bytes(r[3]) == rare_addr}
    got = {r["number"] for r in out["blocks"].collect()}
    assert got == matched_blocks  # only parents of matches survive


def test_field_projection(spark, evm):
    tables, _, _ = evm
    q = EvmQuery(
        from_block=1000,
        include_all_blocks=True,
        fields={"logs": ["block_number", "topic0"], "blocks": ["number"]},
    )
    out = apply_evm_query(tables, q)
    assert out["logs"].columns == ["block_number", "topic0"]
    assert out["blocks"].columns == ["number"]


def test_svm_program_and_discriminator(spark):
    rows, expected = svm_rows(80)
    tables = {
        "blocks": None,
        "instructions": None,
    }
    import pyspark.sql.types as T

    blocks_schema = T.StructType(
        [T.StructField("slot", T.LongType()), T.StructField("hash", T.BinaryType())]
    )
    blocks = [(1000 + i, bytes([i % 250] * 32)) for i in range(10)]
    spark_tables = {
        "blocks": spark.createDataFrame(blocks, blocks_schema),
        "instructions": spark.createDataFrame(rows, SVM_INSTRUCTIONS_SCHEMA),
    }
    q = SvmQuery(
        from_slot=1000,
        to_slot=1007,
        instructions=[
            InstructionRequest(
                program_id=[JUP_PROGRAM_ID], discriminator=[JUP_DISCRIMINATOR]
            )
        ],
    )
    out = apply_svm_query(spark_tables, q)
    got = {(r["block_slot"], r["transaction_index"]) for r in out["instructions"].collect()}
    exp = {
        (r[0], r[1])
        for i, r in enumerate(rows)
        if 1000 <= r[0] <= 1007 and expected[i] is not None
    }
    assert got == exp and got


def test_pushdown_reaches_scan(spark, tmp_path):
    """The range/in-set predicates must appear as PushedFilters in the
    parquet scan — the §2.2 'server-side evaluation' equivalence."""
    blocks, logs, _ = evm_rows(50)
    path = str(tmp_path / "logs")
    spark.createDataFrame(logs, EVM_LOGS_SCHEMA).write.parquet(path)
    scan = spark.read.parquet(path)
    q = EvmQuery(from_block=1001, to_block=1010, logs=[LogRequest(topic0=[TRANSFER_TOPIC0])])
    out = apply_evm_query(
        {"blocks": spark.createDataFrame(blocks, EVM_BLOCKS_SCHEMA), "logs": scan}, q
    )
    plan = out["logs"]._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "block_number" in plan.split("PushedFilters")[1][:400]


def test_evm_traces_filter_and_tx_semi_join(spark):
    """TraceRequest: sighash/call_type in-set filter, include_transactions
    semi-join against the matched trace set."""
    import pyspark.sql.types as T

    from cherry_spark.model import TraceRequest

    traces_schema = T.StructType(
        [
            T.StructField("block_number", T.LongType()),
            T.StructField("transaction_index", T.LongType()),
            T.StructField("from", T.BinaryType()),
            T.StructField("to", T.BinaryType()),
            T.StructField("call_type", T.StringType()),
            T.StructField("sighash", T.BinaryType()),
        ]
    )
    tx_schema = T.StructType(
        [
            T.StructField("block_number", T.LongType()),
            T.StructField("transaction_index", T.LongType()),
            T.StructField("value", T.LongType()),
        ]
    )
    blocks_schema = T.StructType([T.StructField("number", T.LongType())])
    sig_a, sig_b = bytes([1, 2, 3, 4]), bytes([9, 9, 9, 9])
    traces = [
        (1000 + i, i % 3, bytes([i] * 20), bytes([i + 1] * 20),
         "call" if i % 2 == 0 else "delegatecall",
         sig_a if i % 4 == 0 else sig_b)
        for i in range(20)
    ]
    txs = [(1000 + i, j, 100 * i + j) for i in range(20) for j in range(3)]
    tables = {
        "blocks": spark.createDataFrame([(1000 + i,) for i in range(20)], blocks_schema),
        "transactions": spark.createDataFrame(txs, tx_schema),
        "traces": spark.createDataFrame(traces, traces_schema),
    }
    q = EvmQuery(
        from_block=1000,
        to_block=1015,
        traces=[
            TraceRequest(
                sighash=[sig_a], call_type=["call"],
                include_blocks=True, include_transactions=True,
            )
        ],
    )
    out = apply_evm_query(tables, q)
    matched = [
        t for t in traces
        if 1000 <= t[0] <= 1015 and t[5] == sig_a and t[4] == "call"
    ]
    got_traces = {(r["block_number"], r["transaction_index"]) for r in out["traces"].collect()}
    assert got_traces == {(t[0], t[1]) for t in matched} and got_traces
    got_blocks = {r["number"] for r in out["blocks"].collect()}
    assert got_blocks == {t[0] for t in matched}
    got_tx = {(r["block_number"], r["transaction_index"]) for r in out["transactions"].collect()}
    assert got_tx == {(t[0], t[1]) for t in matched}


def test_svm_logs_filter_and_block_semi_join(spark):
    """SvmLogRequest: program_id/kind filter + include_blocks semi-join,
    OR-combined with an instruction request's parents."""
    import pyspark.sql.types as T

    from cherry_spark.model import SvmLogRequest

    logs_schema = T.StructType(
        [
            T.StructField("block_slot", T.LongType()),
            T.StructField("transaction_index", T.LongType()),
            T.StructField("program_id", T.BinaryType()),
            T.StructField("kind", T.StringType()),
            T.StructField("message", T.StringType()),
        ]
    )
    blocks_schema = T.StructType([T.StructField("slot", T.LongType())])
    prog = bytes([7] * 32)
    logs = [
        (2000 + i, i % 2, prog if i % 3 == 0 else bytes([i] * 32),
         "error" if i % 5 == 0 else "info", f"m{i}")
        for i in range(30)
    ]
    tables = {
        "blocks": spark.createDataFrame([(2000 + i,) for i in range(30)], blocks_schema),
        "logs": spark.createDataFrame(logs, logs_schema),
    }
    q = SvmQuery(
        from_slot=2000,
        to_slot=2025,
        logs=[SvmLogRequest(program_id=[prog], kind=["error"], include_blocks=True)],
    )
    out = apply_svm_query(tables, q)
    matched = [
        r for r in logs
        if 2000 <= r[0] <= 2025 and r[2] == prog and r[3] == "error"
    ]
    got = {(r["block_slot"], r["transaction_index"]) for r in out["logs"].collect()}
    assert got == {(r[0], r[1]) for r in matched} and got
    got_blocks = {r["slot"] for r in out["blocks"].collect()}
    assert got_blocks == {r[0] for r in matched}
