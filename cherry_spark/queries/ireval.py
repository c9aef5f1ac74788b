"""Retrieval-evaluation query (ext/ireval.py) scoring the dense
cosine retriever against the embeddings table's label column as
relevance ground truth — retrieval eval needs no synthetic fixture:
"same label as the anchor" IS the standard labeled-relevance setup."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cherry_spark.catalog import query
from cherry_spark.sources.tables import load_table

_K = 10
_ANCHORS = (0, 1, 2)

_COS = """
        round(
          (SELECT SUM(e.embedding[i+1]::DOUBLE * q.qvec[i+1]::DOUBLE)
           FROM UNNEST(range(64)) AS r(i))
          / (sqrt((SELECT SUM(e.embedding[i+1]::DOUBLE * e.embedding[i+1]::DOUBLE)
                   FROM UNNEST(range(64)) AS r(i)))
           * sqrt((SELECT SUM(q.qvec[i+1]::DOUBLE * q.qvec[i+1]::DOUBLE)
                   FROM UNNEST(range(64)) AS r(i))))
        , 6)
"""


def _oracle() -> str:
    from cherry_spark.ext.ireval import retrieval_eval_oracle_sql

    ids = ", ".join(str(a) for a in _ANCHORS)
    retrieved_sql = f"""
        SELECT query_id, doc_id, rank FROM (
            SELECT s.query_id, s.vec_id AS doc_id,
                   ROW_NUMBER() OVER (PARTITION BY s.query_id
                                      ORDER BY s.sim DESC, s.vec_id) AS rank
            FROM (
                SELECT q.query_id, e.vec_id, {_COS} AS sim
                FROM embeddings e,
                     (SELECT vec_id AS query_id, embedding AS qvec
                      FROM embeddings WHERE vec_id IN ({ids})) q
                WHERE e.vec_id <> q.query_id
            ) s
        ) WHERE rank <= {_K}
    """
    relevant_sql = f"""
        SELECT q.vec_id AS query_id, e.vec_id AS doc_id
        FROM embeddings e
        JOIN (SELECT vec_id, label FROM embeddings WHERE vec_id IN ({ids})) q
          ON e.label = q.label AND e.vec_id <> q.vec_id
    """
    return retrieval_eval_oracle_sql(retrieved_sql, relevant_sql, _K)


@query(
    "retrieval_eval_report",
    oracle=_oracle(),
    doc="IR scoreboard (ext/ireval.py:retrieval_eval): recall@10, "
    "MRR, nDCG@10 of the dense cosine retriever against label-match "
    "relevance, per anchor query. Eval is a bounded join problem — "
    "retrieved top-k ⋈ labels, one per-query agg. Ratio metrics are "
    "single per-row divisions (IEEE-exact); the DCG lane is "
    "FIXED-POINT (floor(1e6/log2(rank+1)) summed as BIGINT — the "
    "bm25/pagerank trick), ideal-DCG from a guarded in-row sequence "
    "(the F.sequence(1,0) trap). log2 TRIAGE NOTE as bm25.",
)
def retrieval_eval_report(spark, sf_dir):
    from cherry_spark.ext.ireval import retrieval_eval
    from cherry_spark.ext.similarity import score_query_pairs, topk_per_query

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(*_ANCHORS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    scored = score_query_pairs(emb, q).where(
        F.col("vec_id") != F.col("query_id")
    )
    topk = topk_per_query(scored, _K, "query_id", "vec_id", "sim")
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id")
    )
    retrieved = topk.withColumn("rank", F.row_number().over(w)).select(
        "query_id", F.col("vec_id").alias("doc_id"), "rank"
    )
    anchors = emb.filter(F.col("vec_id").isin(*_ANCHORS)).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("__albl")
    )
    relevant = emb.join(F.broadcast(anchors), emb.label == F.col("__albl")).where(
        F.col("vec_id") != F.col("query_id")
    ).select("query_id", F.col("vec_id").alias("doc_id"))
    return retrieval_eval(retrieved, relevant, _K)
