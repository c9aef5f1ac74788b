"""Hybrid retrieval: reciprocal-rank fusion (RRF) of ranked lists.

The fusion step of a modern retrieval stack — lexical BM25
(ext/bm25.py) and dense cosine (ext/similarity.py) each return a
top-k list per query, and RRF (Cormack/Clarke/Buettcher) combines
them without score calibration: ``score(d) = sum over lists of
1 / (c + rank_d)``.  Rank-based fusion is what makes this portable:
ranks are small exact integers, so the fused score rides an exact
BIGINT lane (``SCALE // (c + rank)``, integer division in both
engines) — no float aggregation ever reaches a hash compare.

Scale shape: the inputs are already per-query top-k lists (k rows per
query, bounded by construction), so the fusion is a full-outer
equi-join on (query, doc) plus a window over <= 2k rows per query —
nothing corpus-sized flows through this operator; the heavy lifting
happened inside the retrievers, which carry their own scale contracts
(postings equi-join / salted two-phase top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RRF_SCALE = 1_000_000_000


def rrf_fuse(
    ranked_lex: DataFrame,
    ranked_dense: DataFrame,
    k: int = 5,
    c: int = 60,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fuse two ranked lists ``(query_id, doc_id, rank)`` into the
    top-k per query by RRF.  Returns ``(query_id, doc_id, rank_lex,
    rank_dense, rrf_fp)`` — ``rrf_fp`` is the exact integer
    ``SCALE//(c+r_lex) + SCALE//(c+r_dense)`` (0 for a missing list),
    NULL ranks mean the doc appeared in only one list."""
    lex = ranked_lex.select(
        query_id_col, id_col, F.col("rank").alias("rank_lex")
    )
    den = ranked_dense.select(
        query_id_col, id_col, F.col("rank").alias("rank_dense")
    )
    fused = lex.join(den, [query_id_col, id_col], "full")
    contrib = lambda r: F.coalesce(  # noqa: E731
        F.expr(f"{_RRF_SCALE} div ({c} + {r})").cast("long"), F.lit(0).cast("long")
    )
    fused = fused.withColumn(
        "rrf_fp", contrib("rank_lex") + contrib("rank_dense")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("rrf_fp").desc(), F.col(id_col)
    )
    return (
        fused.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(query_id_col, id_col, "rank_lex", "rank_dense", "rrf_fp")
    )


def rrf_fuse_sql(
    lex_cte: str,
    dense_cte: str,
    k: int = 5,
    c: int = 60,
) -> str:
    """DuckDB twin over two CTEs with columns (query_id, doc_id,
    rank) — replays the integer-division fusion identically."""
    return f"""
    SELECT query_id, doc_id, rank_lex, rank_dense, rrf_fp FROM (
        SELECT query_id, doc_id, rank_lex, rank_dense, rrf_fp,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY rrf_fp DESC, doc_id
               ) AS rn
        FROM (
            SELECT COALESCE(l.query_id, d.query_id) AS query_id,
                   COALESCE(l.doc_id, d.doc_id) AS doc_id,
                   l.rank AS rank_lex, d.rank AS rank_dense,
                   COALESCE({_RRF_SCALE} // ({c} + l.rank), 0)
                   + COALESCE({_RRF_SCALE} // ({c} + d.rank), 0) AS rrf_fp
            FROM {lex_cte} l
            FULL OUTER JOIN {dense_cte} d
              ON l.query_id = d.query_id AND l.doc_id = d.doc_id
        )
    ) WHERE rn <= {k}
    """
