"""Streaming-gate scale probe: drive run_streaming_growing_dedup over
10 arrivals of 5,000 docs each (the 10x near-dup clone corpus from
scale_probe_curation, one replica per arrival) and record per-batch
wall time as the accumulated corpus grows 0 -> 45k docs.

What it demonstrates (the 100 TB ingestion shape):

- per-batch cost must grow SUBLINEARLY in the corpus: the batch
  classifies against stored corpus SIGNATURES (never re-shingles the
  corpus) through capped band buckets, so the per-batch join touches
  candidate buckets only;
- every arrival after the first is a full near-dup clone class of
  arrival 1's admissions — the adversarial case where every doc finds
  candidates and the verify join does maximal work;
- admission policy is "all" (the dedup-as-annotation mode): the corpus
  grows by the FULL batch every arrival, so by the last arrival each
  batch doc collides with every prior replica of its clone class —
  growing corpus AND maximal candidate fan-out at once (the capped
  band buckets are what keep this bounded).

Run: python tools/scale_probe_streaming.py [sf_dir] [n_arrivals]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from cherry_spark.ext.dedup import delta_dedup, minhash_signatures
    from cherry_spark.sources.tables import load_table
    from cherry_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_arrivals = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    work = "/tmp/cherry_probe_streaming"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    corpus_dir = f"{work}/corpus"
    sig_dir = f"{work}/corpus_sigs"

    spark = get_spark("streaming_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    offset = 1_000_000

    # serial foreachBatch-equivalent loop (the gate's handle_batch body,
    # timed per batch; the Structured Streaming harness adds only
    # trigger scheduling around this)
    schema = "doc_id long, text string"
    times = []
    for i in range(n_arrivals):
        batch = docs.select(
            (F.col("doc_id") + F.lit(i * offset)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" replica{i}")).alias("text"),
        ).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        corpus = (
            spark.read.schema(schema).parquet(corpus_dir)
            if os.path.isdir(corpus_dir)
            else spark.createDataFrame([], schema)
        )
        sigs = (
            spark.read.parquet(sig_dir) if os.path.isdir(sig_dir) else None
        )
        # sign the batch once; classification AND the store fold reuse
        # the same table (the r8 batch_signatures seam)
        batch_sigs = minhash_signatures(
            batch, "doc_id", "text", 128, 3, "xxhash"
        ).localCheckpoint(eager=True)
        verdicts = delta_dedup(
            corpus,
            batch,
            corpus_signatures=sigs,
            batch_signatures=batch_sigs,
            jaccard_threshold=0.5,
        ).localCheckpoint(eager=True)
        counts = {
            r["verdict"]: r["n"]
            for r in verdicts.groupBy("verdict")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # admit="all": grow the corpus every arrival
        batch_sigs.write.mode("append").parquet(sig_dir)
        admitted = batch
        admitted.write.mode("append").parquet(corpus_dir)
        dt = time.perf_counter() - t0
        times.append(dt)
        corpus_n = spark.read.parquet(corpus_dir).count()
        print(f"arrival {i}: corpus now {corpus_n} -> {counts} in {dt:.1f}s")
    print(
        f"per-batch seconds: {[round(t, 1) for t in times]}\n"
        f"first {times[0]:.1f}s -> last {times[-1]:.1f}s with corpus 0 -> "
        f"{(n_arrivals - 1) * 5000} docs and per-doc candidate classes 0 -> "
        f"{n_arrivals - 1} (x{times[-1] / times[0]:.2f})"
    )


if __name__ == "__main__":
    main()
