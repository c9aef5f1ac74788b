"""Streaming ingestion with the full admission gate — the unbounded
twin of examples/curation_pipeline.py: documents arrive over time, and
every micro-batch runs eval-set decontamination → lexical dedup →
semantic dedup → global token budget BEFORE anything reaches the
corpus, with all state in parquet-backed stores (restart-safe,
nothing executor-memory-bound).

The reference's pipeline loop is batch-pull → steps → writer
(reference src/cherry_etl/pipeline.py:110-126); this is the same loop
expressed as Structured Streaming foreachBatch, with the gate as the
step chain (streaming/continuous.py:run_streaming_curation_gate).

Run: python examples/streaming_ingestion_pipeline.py [sf_dir] [budget]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, sf_dir: str, work_dir: str, budget: int = 20_000) -> dict:
    from pyspark.sql import functions as F

    from cherry_spark.ext.text import quality_score, token_count
    from cherry_spark.sources.tables import load_table
    from cherry_spark.streaming.continuous import run_streaming_curation_gate

    shutil.rmtree(work_dir, ignore_errors=True)
    os.makedirs(work_dir)
    src_dir = f"{work_dir}/incoming"
    out_dir = f"{work_dir}/verdicts"

    # stage the corpus as three timed arrivals (any readStream source
    # works; files keep the example self-contained). Embeddings ride
    # along joined by id so the semantic stage has vectors.
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    staged = (
        docs.join(emb, "doc_id", "inner")
        .select(
            "doc_id",
            "text",
            F.col("embedding").cast("array<double>").alias("embedding"),
            quality_score(F.col("text")).alias("quality"),
            token_count(F.col("text")).cast("long").alias("n_tokens"),
        )
        .localCheckpoint(eager=True)
    )
    # a small held-out eval set, drawn from the corpus so the stream
    # genuinely contains contaminated docs (every 25th doc's text)
    evals = staged.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    ).localCheckpoint(eager=True)

    for i in range(3):
        staged.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        time.sleep(1.1)  # distinct mtimes -> stable file->batch order

    schema = (
        "doc_id long, text string, embedding array<double>, "
        "quality double, n_tokens long"
    )
    stream_df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )

    def sink(verdicts, batch_id):
        verdicts.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    q = run_streaming_curation_gate(
        spark,
        stream_df,
        f"{work_dir}/state",
        sink,
        f"{work_dir}/ckpt",
        budget=budget,
        jaccard_threshold=0.5,
        semantic_threshold=0.95,
        test_df=evals,
    )
    q.awaitTermination(300)

    verdicts = spark.read.parquet(out_dir)
    counts = {
        r["verdict"]: r["n"]
        for r in verdicts.groupBy("verdict")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    spent = verdicts.agg(F.max("cum_tokens")).first()[0] or 0
    return {"counts": counts, "spent": spent, "budget": budget}


if __name__ == "__main__":
    from cherry_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark("streaming_ingestion_example")
    res = run(spark, sf_dir, "/tmp/streaming_ingestion_out", budget)
    print(
        f"verdicts: {res['counts']} | tokens spent {res['spent']}"
        f" / budget {res['budget']}"
    )
