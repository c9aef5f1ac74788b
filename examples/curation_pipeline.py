"""Training-data curation pipeline — the 100 TB story end-to-end:

    documents ──► quality filter (C4-style heuristics)
              ──► exact dedup (content fingerprint)
              ──► MinHash-LSH near-dup removal (keep lowest doc_id)
              ──► language ID + token counting
              ──► curated parquet + per-language stats

Every stage is native DataFrame ops from cherry_spark.ext; the near-dup
stage's candidate generation is the banded-LSH equi-join (no n²), so
the same pipeline shape runs on a 1000-executor cluster unchanged.

Run: python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def curate(spark, sf_dir: str, quality_threshold: float = 0.5) -> dict[str, DataFrame]:
    from cherry_spark.ext.dedup import exact_dedup, minhash_lsh_pairs
    from cherry_spark.ext.text import (
        doc_fingerprint,
        language_id,
        quality_score,
        token_count,
    )
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")

    # 1. quality gate
    scored = docs.withColumn("quality", quality_score(F.col("text")))
    kept = scored.filter(F.col("quality") >= quality_threshold)

    # 2. exact dedup on content fingerprint (keep lowest doc_id)
    fingerprinted = kept.withColumn("fp", doc_fingerprint(F.col("text")))
    deduped = exact_dedup(fingerprinted, ["fp"], order_by=[F.col("doc_id")])

    # 3. near-dup removal: LSH pairs -> drop the higher doc_id of each
    # verified pair (union-find-free greedy: a doc survives unless it is
    # the higher id in ANY pair — deterministic and one extra join)
    pairs = minhash_lsh_pairs(deduped, jaccard_threshold=0.85)
    losers = pairs.select(F.col("id2").alias("doc_id")).distinct()
    survivors = deduped.join(losers, on="doc_id", how="left_anti")

    # 4. enrich: language + token counts
    curated = survivors.select(
        "doc_id",
        "text",
        "lang",
        "source",
        "quality",
        language_id(F.col("text")).alias("predicted_lang"),
        token_count(F.col("text")).alias("n_tokens"),
    )

    stats = curated.groupBy("predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    )
    return {"curated": curated, "stats": stats, "n_input": docs}


def run(spark, sf_dir: str, out_dir: str) -> dict[str, int]:
    from cherry_spark.writers import ParquetWriterConfig, create_writer

    result = curate(spark, sf_dir)
    writer = create_writer(
        ParquetWriterConfig(
            path=out_dir,
            partition_by={"curated": ["predicted_lang"]},
            sort_by={"curated": ["doc_id"]},
            anchor_table="stats",
        )
    )
    writer.push_data({"curated": result["curated"], "stats": result["stats"]})
    return {
        "input": result["n_input"].count(),
        "curated": result["curated"].count(),
    }


if __name__ == "__main__":
    from cherry_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("curation_example")
    counts = run(spark, sf_dir, "/tmp/curated_out")
    print(f"input={counts['input']} curated={counts['curated']}")
    spark.read.parquet("/tmp/curated_out/stats").show()
