"""Retrieval-quality evaluation: per-query recall@k, MRR, nDCG@k
against a labeled relevance set.

Every retrieval lane in the repo (bm25, cosine/ANN, jaccard, hybrid
RRF) needs a scoreboard; this is it. The eval itself is a join
problem and stays one: retrieved top-k ⋈ relevance labels (both
bounded per query), then ONE per-query aggregate — no corpus scan
beyond what the retriever already did.

Determinism (the oracle story): metrics that are per-query ratios of
integers (recall, RR) are computed as a single double division per
ROW — IEEE-deterministic. DCG is a SUM of per-hit doubles, which the
repo invariant forbids hash-comparing — so the DCG lane is
FIXED-POINT (the bm25/pagerank trick): each hit contributes
``floor(1e6 / log2(rank+1))`` as BIGINT and the sum is order-free
integer arithmetic. The ideal DCG is the same series over ranks
1..min(n_rel, k), built in-row from a guarded sequence (the
``F.sequence(1, 0)`` descending trap — m=0 short-circuits to 0).
TRIAGE NOTE (as tfidf/bm25): a 1-ulp log2() divergence between libm
builds could flip one floor() at an exact boundary; bit-exact on the
shipped fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000


def _dcg_term(rank_col):
    # identical expression order in the DuckDB twin
    return F.floor(
        F.lit(float(_SCALE)) / F.log2(rank_col.cast("double") + F.lit(1.0))
    ).cast("long")


def retrieval_eval(
    retrieved: DataFrame,
    relevant: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query IR metrics.

    ``retrieved``: (query_id, id, rank) with rank 1..k — the
    retriever's output order. ``relevant``: (query_id, id) ground
    truth. Returns one row per query: ``n_rel_total``, ``n_rel_at_k``,
    ``first_rel_rank`` (NULL if no hit), ``recall_at_k`` (double,
    single per-row division), ``rr_fp``/``dcg_fp``/``idcg_fp``
    (fixed-point BIGINTs) and ``ndcg_6`` (dcg/idcg rounded to 6,
    NULL when the query has no relevant docs at all).
    """
    rel = relevant.select(
        F.col(query_id_col).alias("__qid"), F.col(id_col).alias("__rid")
    )
    n_rel = rel.groupBy("__qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel_total")
    )
    r = retrieved.select(
        F.col(query_id_col).alias("__qid"),
        F.col(id_col).alias("__rid"),
        F.col(rank_col).alias("__rank"),
    )
    marked = r.join(
        rel.withColumn("__is_rel", F.lit(1)), ["__qid", "__rid"], "left"
    ).withColumn("__is_rel", F.coalesce(F.col("__is_rel"), F.lit(0)))
    hits = marked.groupBy("__qid").agg(
        F.sum("__is_rel").cast("long").alias("n_rel_at_k"),
        F.min(F.when(F.col("__is_rel") == 1, F.col("__rank")))
        .cast("long")
        .alias("first_rel_rank"),
        F.sum(
            F.when(F.col("__is_rel") == 1, _dcg_term(F.col("__rank"))).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("dcg_fp"),
    )
    out = hits.join(n_rel, "__qid", "left").withColumn(
        "n_rel_total", F.coalesce(F.col("n_rel_total"), F.lit(0))
    )
    m = F.least(F.col("n_rel_total"), F.lit(k))
    idcg = F.when(
        m >= 1,
        F.aggregate(
            F.transform(F.sequence(F.lit(1), m.cast("int")), _dcg_term),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    ).otherwise(F.lit(0).cast("long"))
    return out.select(
        F.col("__qid").alias(query_id_col),
        "n_rel_total",
        "n_rel_at_k",
        "first_rel_rank",
        F.when(
            F.col("n_rel_total") > 0,
            F.col("n_rel_at_k").cast("double") / F.col("n_rel_total"),
        ).alias("recall_at_k"),
        F.coalesce(
            F.floor(F.lit(_SCALE) / F.col("first_rel_rank")).cast("long"),
            F.lit(0),
        ).alias("rr_fp"),
        "dcg_fp",
        idcg.alias("idcg_fp"),
        F.when(
            idcg > 0,
            F.round(F.col("dcg_fp").cast("double") / idcg.cast("double"), 6),
        ).alias("ndcg_6"),
    )


def retrieval_eval_oracle_sql(
    retrieved_sql: str, relevant_sql: str, k: int
) -> str:
    """DuckDB twin of :func:`retrieval_eval` over two caller-supplied
    CTE bodies producing (query_id, doc_id, rank) and
    (query_id, doc_id)."""
    s = _SCALE
    return f"""
    WITH retrieved AS ({retrieved_sql}),
    relevant AS ({relevant_sql}),
    n_rel AS (
        SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel_total
        FROM relevant GROUP BY 1
    ),
    marked AS (
        SELECT r.query_id, r.rank,
               CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_rel
        FROM retrieved r
        LEFT JOIN relevant rel
          ON rel.query_id = r.query_id AND rel.doc_id = r.doc_id
    ),
    hits AS (
        SELECT query_id,
               CAST(SUM(is_rel) AS BIGINT) AS n_rel_at_k,
               CAST(MIN(CASE WHEN is_rel = 1 THEN rank END) AS BIGINT)
                 AS first_rel_rank,
               CAST(SUM(CASE WHEN is_rel = 1 THEN
                    CAST(FLOOR({s}.0 / log2(CAST(rank AS DOUBLE) + 1.0))
                         AS BIGINT) ELSE 0 END) AS BIGINT) AS dcg_fp
        FROM marked GROUP BY 1
    ),
    base AS (
        SELECT h.query_id, h.n_rel_at_k, h.first_rel_rank, h.dcg_fp,
               COALESCE(n.n_rel_total, 0) AS n_rel_total,
               LEAST(COALESCE(n.n_rel_total, 0), {k}) AS m
        FROM hits h LEFT JOIN n_rel n USING (query_id)
    ),
    with_idcg AS (
        SELECT *,
               CASE WHEN m >= 1 THEN
                   (SELECT CAST(SUM(CAST(FLOOR({s}.0 /
                        log2(CAST(u.i AS DOUBLE) + 1.0)) AS BIGINT))
                        AS BIGINT)
                    FROM UNNEST(generate_series(1, m)) AS u(i))
               ELSE 0 END AS idcg_fp
        FROM base
    )
    SELECT query_id, n_rel_total, n_rel_at_k, first_rel_rank,
           CASE WHEN n_rel_total > 0
                THEN CAST(n_rel_at_k AS DOUBLE) / n_rel_total END
             AS recall_at_k,
           COALESCE(CAST(FLOOR({s}.0 / first_rel_rank) AS BIGINT), 0)
             AS rr_fp,
           dcg_fp, idcg_fp,
           CASE WHEN idcg_fp > 0
                THEN round(CAST(dcg_fp AS DOUBLE) / CAST(idcg_fp AS DOUBLE), 6)
           END AS ndcg_6
    FROM with_idcg
    """
