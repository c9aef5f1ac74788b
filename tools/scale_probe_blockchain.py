"""Blockchain-lane END-TO-END 10x scale probe (round-7 verdict item
#6): the cherry-parity side had only per-operator numbers
(tools/scale_probe_decode.py); this composes the full
``examples/erc20_pipeline.py``-shaped flow at decode-probe scale:

  query model (topic0 filter + include_blocks)
  -> EVM_DECODE_EVENTS (full-ABI Transfer, hstack)
  -> EVM_VALIDATE_BLOCK_DATA (report form, with a PLANTED broken
     parent-hash link the run must count)
  -> JOIN_BLOCK_DATA (broadcast timestamp enrich)
  -> anchor-last parquet write + MAX(number) resume cursor

Corpus: 10 replicas of sf0.1 lineitem shaped into ~6M Transfer logs
across 60k hash-chained blocks (hash = sha256(number), parent_hash =
sha256(number-1); ONE block's parent_hash is corrupted). Logs carry
real 32-byte topics and a uint256 data word, so the decode stage is
the certified native-expression ABI lane, not a toy.

The stream runs as 4 cursor windows through run_continuous — the
micro-batch loop, writer ordering, and resume-cursor protocol are part
of what is being timed.

Run: python tools/scale_probe_blockchain.py [sf_dir] [n_replicas]
Prints per-stage + chain totals; paste into COVERAGE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

TRANSFER_SIG = "Transfer(address indexed from, address indexed to, uint256 amount)"
TRANSFER_TOPIC0 = "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"


def build_corpus(spark, sf_dir: str, out: str, n_replicas: int) -> tuple[int, int]:
    from cherry_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    reps = spark.range(n_replicas).select(F.col("id").alias("rep"))
    rows = li.crossJoin(F.broadcast(reps)).select(
        (F.col("l_orderkey") * n_replicas + F.col("rep")).alias("k"),
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
    )
    n_blocks = 60_000
    amount = (
        F.col("l_quantity").cast("long") * 1_000_000 + F.col("l_linenumber")
    ).cast("long")
    logs = rows.select(
        (F.col("k") % n_blocks).alias("block_number"),
        # deterministic within-block index without a 6M-row shuffle
        ((F.col("k") / n_blocks).cast("long") * 10 + F.col("l_linenumber"))
        .alias("log_index"),
        F.unhex(F.lit(TRANSFER_TOPIC0)).alias("topic0"),
        F.unhex(F.sha2(F.col("l_suppkey").cast("string"), 256)).alias("topic1"),
        F.unhex(F.sha2(F.col("l_partkey").cast("string"), 256)).alias("topic2"),
        F.lit(None).cast("binary").alias("topic3"),
        F.unhex(F.lpad(F.hex(amount), 64, "0")).alias("data"),
        F.unhex(F.sha2(F.col("k").cast("string"), 256)).alias("address"),
    )
    # hash-chained blocks; block 41_337's parent link is corrupted —
    # the validation report must count exactly 1 broken link
    blocks = spark.range(n_blocks).select(
        F.col("id").alias("number"),
        F.unhex(F.sha2(F.col("id").cast("string"), 256)).alias("hash"),
        F.when(
            F.col("id") == 41_337, F.unhex(F.lit("deadbeef" * 8))
        )
        .otherwise(F.unhex(F.sha2((F.col("id") - 1).cast("string"), 256)))
        .alias("parent_hash"),
        (F.lit(1_700_000_000) + F.col("id") * 12).alias("timestamp"),
    )
    shutil.rmtree(out, ignore_errors=True)
    logs.repartition(32).write.parquet(f"{out}/logs.parquet")
    blocks.repartition(8).write.parquet(f"{out}/blocks.parquet")
    return (
        spark.read.parquet(f"{out}/logs.parquet").count(),
        n_blocks,
    )


def main() -> None:
    from cherry_spark.model import EvmQuery, LogRequest, apply_evm_query
    from cherry_spark.plans import (
        EvmDecodeEventsConfig,
        EvmValidateBlockDataConfig,
        JoinBlockDataConfig,
        Pipeline,
        Step,
        StepKind,
    )
    from cherry_spark.operators.validate import evm_validation_report
    from cherry_spark.session import get_spark
    from cherry_spark.streaming import range_batches, run_continuous
    from cherry_spark.writers import ParquetWriterConfig, create_writer

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    probe = f"/tmp/cherry_probe_chain_{n_replicas}x"
    sink = f"{probe}_out"
    spark = get_spark("blockchain_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    n_logs, n_blocks = build_corpus(spark, sf_dir, probe, n_replicas)
    t_build = time.perf_counter() - t0

    tables = {
        "logs": spark.read.parquet(f"{probe}/logs.parquet"),
        "blocks": spark.read.parquet(f"{probe}/blocks.parquet"),
    }

    # stage 1 (standalone timing): the monitoring-form validation
    # report over the FULL corpus — must count the planted violation
    t0 = time.perf_counter()
    report = evm_validation_report(
        tables, EvmValidateBlockDataConfig()
    ).collect()[0]
    t_validate = time.perf_counter() - t0
    assert report["broken_parent_chain"] == 1, report
    assert report["dup_block_numbers"] == 0 and report["orphan_logs"] == 0

    # stages 2..n: the continuous pipeline over 4 cursor windows
    query = EvmQuery(
        from_block=0,
        to_block=n_blocks - 1,
        logs=[LogRequest(topic0=[bytes.fromhex(TRANSFER_TOPIC0)])],
        include_all_blocks=True,
    )
    filtered = apply_evm_query(tables, query)

    shutil.rmtree(sink, ignore_errors=True)
    writer = create_writer(
        ParquetWriterConfig(path=sink, anchor_table="blocks")
    )
    pipeline = Pipeline(
        source=None,
        steps=[
            Step(
                StepKind.EVM_DECODE_EVENTS,
                EvmDecodeEventsConfig(
                    TRANSFER_SIG,
                    input_table="logs",
                    output_table="transfers",
                    allow_decode_fail=True,
                    hstack=True,
                ),
            ),
            Step(
                StepKind.JOIN_BLOCK_DATA,
                JoinBlockDataConfig(tables=["transfers"]),
            ),
        ],
        writer=writer,
    )
    batches = range_batches(
        spark,
        filtered,
        {"blocks": "number", "logs": "block_number"},
        lo=0,
        hi=n_blocks - 1,
        batch_size=n_blocks // 4,
    )
    t0 = time.perf_counter()
    n_batches = run_continuous(spark, pipeline, batches)
    t_chain = time.perf_counter() - t0

    out_transfers = spark.read.parquet(f"{sink}/transfers")
    n_out = out_transfers.count()
    resume = (
        spark.read.parquet(f"{sink}/blocks").agg(F.max("number")).collect()[0][0]
    )
    ok_cols = {"from", "to", "amount", "block_timestamp"} <= set(
        out_transfers.columns
    )
    print(
        f"corpus: {n_logs} Transfer logs / {n_blocks} chained blocks "
        f"({n_replicas}x, build {t_build:.1f}s excluded)\n"
        f"validate report (full corpus, planted violation caught): "
        f"{t_validate:.1f}s\n"
        f"continuous chain (query model -> ABI decode -> block join -> "
        f"anchor write, {n_batches} windows): {t_chain:.1f}s "
        f"= {n_logs / t_chain / 1e6:.2f}M logs/s\n"
        f"sink: {n_out} decoded transfers, decode+join cols present: "
        f"{ok_cols}, resume cursor MAX(number) = {resume} "
        f"(expected {n_blocks - 1})"
    )


if __name__ == "__main__":
    main()
