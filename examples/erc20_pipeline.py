"""End-to-end EVM pipeline — the reference's erc20_custom example shape
(reference examples/erc20_custom.py): query with topic0 filter →
ABI-decode Transfer events → SQL join with blocks for timestamps →
hex-encode → DuckDB sink, with MAX(block_number) resume.

Run: python examples/erc20_pipeline.py  (uses synthesized fixtures)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

TRANSFER_SIG = "Transfer(address indexed from, address indexed to, uint256 amount)"


def build_pipeline(writer):
    """The full declarative pipeline (steps only; source supplied at run)."""
    from cherry_spark.functions.crypto import evm_signature_to_topic0
    from cherry_spark.plans import (
        CastByTypeConfig,
        EvmDecodeEventsConfig,
        HexEncodeConfig,
        Pipeline,
        SetChainIdConfig,
        SqlStepConfig,
        Step,
        StepKind,
        TransformStepConfig,
    )

    _ = evm_signature_to_topic0(TRANSFER_SIG)  # the filter constant (used in the query)
    return Pipeline(
        source=None,
        steps=[
            Step(
                StepKind.EVM_DECODE_EVENTS,
                EvmDecodeEventsConfig(
                    TRANSFER_SIG, input_table="logs", output_table="transfers",
                    allow_decode_fail=True, hstack=True,
                ),
            ),
            # enrich with block timestamps — the reference does this in a
            # DataFusion SQL step (erc20_custom.py:67-70)
            Step(
                StepKind.SQL,
                SqlStepConfig(
                    """
                    SELECT t.`from`, t.`to`, t.amount, t.block_number,
                           t.log_index, b.timestamp AS block_timestamp
                    FROM transfers t JOIN blocks b ON b.number = t.block_number
                    """,
                    output_table="transfers_enriched",
                    replace_batch=False,
                ),
            ),
            Step(
                StepKind.TRANSFORM,
                TransformStepConfig(
                    lambda batch, _: {
                        "transfers": batch["transfers_enriched"],
                        "blocks": batch["blocks"],
                    }
                ),
            ),
            Step(StepKind.SET_CHAIN_ID, SetChainIdConfig(1)),
            Step(StepKind.CAST_BY_TYPE, CastByTypeConfig("decimal(38,0)", "decimal(38,0)")),
            Step(StepKind.HEX_ENCODE, HexEncodeConfig(prefixed=True)),
        ],
        writer=writer,
    )


def run(spark, db_path: str, batch_size: int = 5) -> int:
    """Returns number of micro-batches processed."""
    from blockchain_fixtures import EVM_BLOCKS_SCHEMA, EVM_LOGS_SCHEMA, evm_rows

    from cherry_spark.model import EvmQuery, LogRequest, apply_evm_query
    from cherry_spark.functions.crypto import evm_signature_to_topic0
    from cherry_spark.streaming import range_batches, run_continuous
    from cherry_spark.writers import DuckDbWriterConfig, create_writer

    blocks_rows, logs_rows, _ = evm_rows(200)
    tables = {
        "blocks": spark.createDataFrame(blocks_rows, EVM_BLOCKS_SCHEMA),
        "logs": spark.createDataFrame(logs_rows, EVM_LOGS_SCHEMA),
    }
    # provider-side query semantics: topic0 filter + parent blocks
    query = EvmQuery(
        from_block=1000,
        to_block=1019,
        logs=[LogRequest(topic0=[evm_signature_to_topic0(TRANSFER_SIG)], include_blocks=True)],
    )
    filtered = apply_evm_query(tables, query)

    writer = create_writer(DuckDbWriterConfig(db_path=db_path))
    pipeline = build_pipeline(writer)
    batches = range_batches(
        spark,
        filtered,
        {"blocks": "number", "logs": "block_number"},
        lo=1000,
        hi=1019,
        batch_size=batch_size,
    )
    return run_continuous(spark, pipeline, batches)


if __name__ == "__main__":
    from cherry_spark.session import get_spark

    spark = get_spark("erc20_example", cpus=8)
    n = run(spark, "/tmp/erc20_example.duckdb")
    import duckdb

    con = duckdb.connect("/tmp/erc20_example.duckdb")
    print(f"batches: {n}")
    print(con.execute("SELECT COUNT(*), MAX(block_number) FROM transfers").fetchall())
    print(con.execute("SELECT * FROM transfers LIMIT 3").fetchall())
