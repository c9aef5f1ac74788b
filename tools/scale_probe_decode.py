"""Decode-family scale probe: the ABI/Borsh decode kernels (the
reference's core domain — its Rust cherry_core kernels) at 10x the
bench scale, measuring sustained rows/s on local[32].

Corpus: 10 replicas of sf0.1 lineitem (6M rows) with shifted keys,
written once as a MULTI-ROW-GROUP parquet (so the scan parallelizes
naturally, like a real ingest batch — no repartition crutch). Each
probe drives the REAL pipeline step (process_steps) end to end:

- EVM fixed-width: Transfer-shaped logs (3 topics + uint256 word),
  zero-UDF native expression decode;
- EVM dynamic ABI: (address indexed, uint256[] amounts, string tag) —
  offset-walking native expressions;
- Borsh fixed: 8-byte discriminator + u64 LE + 32-byte pubkey.

Numbers are decode+materialize (noop sink), synthesis included on the
same data both runs, warm JVM.

Run: python tools/scale_probe_decode.py [sf_dir] [n_replicas]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from cherry_spark.session import get_spark
    from cherry_spark.sources.tables import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    probe = f"/tmp/cherry_probe_decode_{n_replicas}x"
    spark = get_spark("decode_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    li = load_table(spark, sf_dir, "lineitem")
    reps = spark.range(n_replicas).select(F.col("id").alias("rep"))
    big = (
        li.crossJoin(F.broadcast(reps))
        .select(
            (F.col("l_orderkey") * n_replicas + F.col("rep")).alias("l_orderkey"),
            "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        )
    )
    shutil.rmtree(probe, ignore_errors=True)
    big.repartition(32).write.parquet(probe)
    src = spark.read.parquet(probe)
    n = src.count()
    print(f"corpus: {n} rows, {len(os.listdir(probe))-1} files")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    import cherry_spark.queries.steps as S

    def time_one(name, build):
        df = build()
        mat(df)  # warm
        t0 = time.perf_counter()
        mat(df)
        dt = time.perf_counter() - t0
        print(f"{name}: {dt:.1f}s warm = {n/dt/1e6:.2f}M rows/s")

    # EVM fixed-width Transfer decode on the 10x corpus
    from cherry_spark.plans import EvmDecodeEventsConfig, Step, StepKind
    from cherry_spark.plans.pipeline import process_steps

    def fixed():
        amount = (
            F.col("l_quantity").cast("long") * 1000000 + F.col("l_linenumber")
        ).cast("long")
        logs = src.select(
            "l_orderkey", "l_linenumber",
            F.unhex(F.sha2(F.col("l_orderkey").cast("string"), 256)).alias("topic1"),
            F.unhex(F.sha2(F.col("l_partkey").cast("string"), 256)).alias("topic2"),
            F.unhex(F.lpad(F.hex(amount), 64, "0")).alias("data"),
        ).withColumn(
            "topic0",
            F.unhex(F.lit(
                "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
            )),
        )
        out = process_steps(
            {"logs": logs},
            [Step(StepKind.EVM_DECODE_EVENTS, EvmDecodeEventsConfig(
                event_signature=(
                    "Transfer(address indexed from, address indexed to,"
                    " uint256 amount)"
                ),
                allow_decode_fail=True,
            ))],
        )
        return out["decoded_logs"]

    def borsh():
        from cherry_spark.operators.decode_svm import (
            InstructionSignature, ParamInput,
        )
        from cherry_spark.plans.config import SvmDecodeInstructionsConfig

        disc = bytes.fromhex("f8c69e91e17587c8")
        amount = (
            F.col("l_quantity").cast("long") * 1000000 + F.col("l_linenumber")
        ).cast("long")
        be_hex = F.lpad(F.lower(F.hex(amount)), 16, "0")
        le_hex = F.concat(*[F.substring(be_hex, 15 - 2 * i, 2) for i in range(8)])
        payload = F.unhex(F.concat(
            F.lit(disc.hex()), le_hex,
            F.sha2(F.col("l_suppkey").cast("string"), 256)))
        instructions = src.select(
            "l_orderkey", "l_linenumber", payload.alias("data"),
            *[F.lit(None).cast("binary").alias(f"a{i}") for i in range(10)],
        )
        sig = InstructionSignature(
            discriminator=disc,
            params=[ParamInput("amount", "u64"), ParamInput("supplier", "pubkey")],
        )
        out = process_steps(
            {"instructions": instructions},
            [Step(StepKind.SVM_DECODE_INSTRUCTIONS,
                  SvmDecodeInstructionsConfig(sig, allow_decode_fail=True))],
        )
        return out["decoded_instructions"]

    def dynamic():
        # the hardest native-expression lane: dynamic ABI with two
        # uint256[] arrays + a string (offset-walking decode) — reuse
        # the certified query's synthesis shape via the registered
        # query impl on a temp view of the 10x corpus
        import cherry_spark.queries.steps as steps_mod
        from cherry_spark.plans import EvmDecodeEventsConfig, Step, StepKind

        def word_u(col):
            return F.lpad(F.lower(F.hex(col)), 64, "0")

        val0 = (
            F.col("l_quantity").cast("long") * 1000000 + F.col("l_linenumber")
        ).cast("long")
        memo = F.concat_ws("-", F.col("l_orderkey"), F.col("l_partkey"))
        memo_raw = F.encode(memo, "utf-8")
        memo_len = F.length(memo_raw)
        memo_pad = F.rpad(
            memo_raw, ((memo_len + 31) / 32).cast("int") * 32, b"\x00"
        )
        data_hex = F.concat(
            word_u(F.lit(128)), word_u(F.lit(224)), word_u(F.lit(320)),
            word_u(val0),
            word_u(F.lit(2)), word_u(val0 + 1), word_u(val0 + 2),
            word_u(F.lit(2)), word_u(val0 + 3), word_u(val0 + 4),
            word_u(memo_len.cast("long")),
        )
        logs = src.select(
            "l_orderkey", "l_linenumber",
            F.concat(F.unhex(data_hex), memo_pad).alias("data"),
        ).withColumn(
            "topic0",
            F.unhex(F.sha2(F.lit("Batch(uint256,uint256[],uint256[],string)"), 256)),
        )
        out = process_steps(
            {"logs": logs},
            [Step(StepKind.EVM_DECODE_EVENTS, EvmDecodeEventsConfig(
                event_signature=(
                    "Batch(uint256 head, uint256[] ids, uint256[] vals,"
                    " string memo)"
                ),
                allow_decode_fail=True,
            ))],
        )
        return out["decoded_logs"]

    time_one("evm_fixed_transfer", fixed)
    time_one("evm_dynamic_abi", dynamic)
    time_one("borsh_fixed", borsh)
    # skew evidence: decode output partition balance
    from pyspark.sql.functions import spark_partition_id
    counts = sorted(
        r["count"]
        for r in fixed().groupBy(spark_partition_id().alias("p")).count().collect()
    )
    print(f"decode partitions: {len(counts)} populated, "
          f"max/median {counts[-1]/counts[len(counts)//2]:.2f}x")


if __name__ == "__main__":
    main()
