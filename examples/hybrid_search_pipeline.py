"""Hybrid search example: the retrieval stack composed end-to-end the
way a RAG/data-curation service runs it —

  documents + embeddings (shared fixture id space)
    -> lexical BM25 top-10 per query    (ext/bm25.py — inverted-index
       candidates, fixed-point score lane)
    -> dense cosine top-10 per query    (ext/similarity.py brute force
       here; the indexed IVF/LSH paths are drop-in at scale)
    -> reciprocal-rank fusion           (ext/hybrid.py — exact integer
       division lane, no score calibration)
    -> agreement report                 (how often the two views concur
       inside the fused top-k — the instrument for tuning k and c)

The fusion only ever sees the 2k retrieved rows per query; every
corpus-sized pass lives inside a retriever with its own scale
contract (postings equi-join, salted two-phase top-k, broadcast query
side).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def run(spark, sf_dir: str, query_ids=(0, 1, 2), k: int = 5) -> dict:
    from cherry_spark.ext.bm25 import bm25_topk
    from cherry_spark.ext.hybrid import rrf_fuse
    from cherry_spark.ext.similarity import brute_force_topk
    from cherry_spark.sources.tables import load_table

    qids = list(query_ids)
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    qdocs = docs.filter(F.col("doc_id").isin(qids)).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    lex = bm25_topk(docs, qdocs, k=2 * k)
    wl = Window.partitionBy("query_id").orderBy(
        F.col("score_fp").desc(), F.col("doc_id")
    )
    lexr = lex.select(
        "query_id", "doc_id", F.row_number().over(wl).cast("int").alias("rank")
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qemb = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    den = brute_force_topk(emb, qemb, k=2 * k)
    wd = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id")
    )
    denr = den.select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(wd).cast("int").alias("rank"),
    )

    fused = rrf_fuse(lexr, denr, k=k).localCheckpoint(eager=True)
    agreement = fused.agg(
        F.count(F.lit(1)).cast("long").alias("n_results"),
        F.sum(
            (
                F.col("rank_lex").isNotNull() & F.col("rank_dense").isNotNull()
            ).cast("int")
        )
        .cast("long")
        .alias("n_in_both_views"),
    ).collect()[0]
    return {
        "fused": fused,
        "n_results": agreement["n_results"],
        "n_in_both_views": agreement["n_in_both_views"],
    }


if __name__ == "__main__":
    from cherry_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("hybrid_search_example")
    out = run(spark, sf_dir)
    print(
        f"{out['n_results']} fused results, "
        f"{out['n_in_both_views']} agreed by both views"
    )
    out["fused"].show(truncate=False)
