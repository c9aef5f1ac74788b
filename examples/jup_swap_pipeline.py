"""End-to-end SVM pipeline — the reference's jup_swap example shape
(reference examples/jup_swap.py): instruction query (program_id +
discriminator) → Borsh-decode swaps → transform-step joins to blocks
and transactions → base58-encode → left-join dims in SQL → Parquet sink.

Run: python examples/jup_swap_pipeline.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)


def run(spark, out_dir: str) -> int:
    from blockchain_fixtures import (
        JUP_DISCRIMINATOR,
        JUP_PROGRAM_ID,
        SVM_INSTRUCTIONS_SCHEMA,
        svm_rows,
    )

    from cherry_spark.model import InstructionRequest, SvmQuery, apply_svm_query
    from cherry_spark.operators.decode_svm import InstructionSignature, ParamInput
    from cherry_spark.plans import (
        Base58EncodeConfig,
        Pipeline,
        SqlStepConfig,
        Step,
        StepKind,
        SvmDecodeInstructionsConfig,
        TransformStepConfig,
    )
    from cherry_spark.streaming import range_batches, run_continuous
    from cherry_spark.writers import ParquetWriterConfig, create_writer
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    rows, _ = svm_rows(120)
    blocks = spark.createDataFrame(
        [(1000 + i, bytes([i % 250] * 32)) for i in range(12)],
        T.StructType(
            [T.StructField("slot", T.LongType()), T.StructField("hash", T.BinaryType())]
        ),
    )
    transactions = spark.createDataFrame(
        [(r[0], r[1], bytes([7] * 64)) for r in rows],
        T.StructType(
            [
                T.StructField("block_slot", T.LongType()),
                T.StructField("transaction_index", T.LongType()),
                T.StructField("signature", T.BinaryType()),
            ]
        ),
    )
    tables = {
        "blocks": blocks,
        "transactions": transactions,
        "instructions": spark.createDataFrame(rows, SVM_INSTRUCTIONS_SCHEMA),
    }
    query = SvmQuery(
        from_slot=1000,
        to_slot=1011,
        instructions=[
            InstructionRequest(
                program_id=[JUP_PROGRAM_ID],
                discriminator=[JUP_DISCRIMINATOR],
                include_transactions=True,
            )
        ],
        include_all_blocks=True,
    )
    filtered = apply_svm_query(tables, query)

    sig = InstructionSignature(
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

    def join_parents(batch, _ctx):
        # the reference does these joins in its Polars step (jup_swap.py:47-57)
        swaps = (
            batch["decoded_swaps"]
            .join(F.broadcast(batch["blocks"]), on=batch["decoded_swaps"].block_slot == batch["blocks"].slot)
            .drop("slot", "hash")
            .join(
                batch["transactions"],
                on=["block_slot", "transaction_index"],
                how="inner",
            )
        )
        return {"swaps": swaps, "blocks": batch["blocks"], "amm_dim": batch["amm_dim"]}

    # dim keyed by the base58 form of the actual AMM pubkeys (the
    # reference loads amm/token dims from CSVs, jup_swap.py:196-197)
    from blockchain_fixtures import _b
    from cherry_spark.functions.binary import b58encode_bytes

    amm_dim = spark.createDataFrame(
        [
            (b58encode_bytes(_b("amm0", 32)), "Orca"),
            (b58encode_bytes(_b("amm1", 32)), "Raydium"),
        ],
        "amm_address string, amm_name string",
    )

    pipeline = Pipeline(
        source=None,
        steps=[
            Step(
                StepKind.SVM_DECODE_INSTRUCTIONS,
                SvmDecodeInstructionsConfig(
                    sig, input_table="instructions", output_table="decoded_swaps",
                    allow_decode_fail=True,
                ),
            ),
            Step(StepKind.TRANSFORM, TransformStepConfig(join_parents)),
            Step(StepKind.BASE58_ENCODE, Base58EncodeConfig(tables=["swaps"])),
            Step(
                StepKind.SQL,
                SqlStepConfig(
                    """
                    SELECT s.*, d.amm_name
                    FROM swaps s LEFT JOIN amm_dim d
                      ON s.amm = d.amm_address
                    """,
                    output_table="swaps_named",
                    replace_batch=True,
                ),
            ),
        ],
        writer=create_writer(ParquetWriterConfig(path=out_dir, anchor_table="swaps_named")),
    )

    def with_dim(b):
        out = dict(b)
        out["amm_dim"] = amm_dim
        return out

    batches = (
        with_dim(b)
        for b in range_batches(
            spark,
            filtered,
            {"blocks": "slot", "instructions": "block_slot", "transactions": "block_slot"},
            lo=1000,
            hi=1011,
            batch_size=6,
        )
    )
    return run_continuous(spark, pipeline, batches)


if __name__ == "__main__":
    from cherry_spark.session import get_spark

    spark = get_spark("jup_swap_example", cpus=8)
    n = run(spark, "/tmp/jup_swap_out")
    df = spark.read.parquet("/tmp/jup_swap_out/swaps_named")
    print(f"batches: {n}, swaps: {df.count()}")
    df.show(3, truncate=60)
