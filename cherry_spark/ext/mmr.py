"""Maximal-Marginal-Relevance diversified top-k (Carbonell &
Goldstein 1998): after retrieving the top-``n_candidates`` neighbors
per query, greedily re-rank them so each pick maximizes
``λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s)`` — relevance minus
redundancy, the standard de-duplicated retrieval head for RAG /
eval-set selection over a near-duplicate-heavy corpus.

Scale design: the corpus-sized work is the existing two-phase
``brute_force_topk`` (one scan, salted partial top-k, no single-task
sort); everything after operates on ≤ n_candidates rows per query —
the candidate pair-sim self-join is an equi-join on query_id with
N² bounded fan-out, and the greedy loop runs per query group inside
``applyInPandas`` cogroup (a genuinely iterative per-group algorithm,
the documented Pandas-UDF escape hatch) with O(k·N) work and O(N²)
state per group.

Cross-engine determinism: every similarity is the ROUND(·, 6) fold
(identical in both engines by the ann_lsh_topk certification); the
MMR score is pure double arithmetic on those rounded sims with the
λ / (1−λ) literals generated from the same Python floats, and every
argmax tie-breaks on the lowest id — so the greedy trajectory is
bit-reproducible by the recursive-CTE oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cherry_spark.ext.similarity import brute_force_topk, dot, norm


def mmr_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 5,
    n_candidates: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, rank, id, mmr_score): rank-ordered MMR selection of
    k of the top-``n_candidates`` exact-cosine neighbors."""
    oneminus = 1.0 - lam
    cands = brute_force_topk(
        vectors,
        query,
        k=n_candidates,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
    ).filter(F.col("sim").isNotNull())
    cv = cands.join(
        vectors.select(F.col(id_col), F.col(vec_col)), on=id_col
    ).withColumn("__n", norm(F.col(vec_col)))
    ca, cb = cv.alias("__ca"), cv.alias("__cb")
    qa, qb = F.col(f"__ca.{query_id_col}"), F.col(f"__cb.{query_id_col}")
    an, bn = F.col("__ca.__n"), F.col("__cb.__n")
    psim = F.when(
        (an > 0) & (bn > 0),
        dot(F.col(f"__ca.{vec_col}"), F.col(f"__cb.{vec_col}")) / (an * bn),
    )
    pairs = (
        ca.join(
            cb,
            (qa == qb) & (F.col(f"__ca.{id_col}") != F.col(f"__cb.{id_col}")),
        )
        .select(
            qa.alias(query_id_col),
            F.col(f"__ca.{id_col}").alias("i"),
            F.col(f"__cb.{id_col}").alias("j"),
            F.coalesce(F.round(psim, 6), F.lit(0.0)).alias("s"),
        )
    )

    out_schema = (
        f"{query_id_col} long, rank int, {id_col} long, mmr_score double"
    )

    def greedy(cand_pdf, pair_pdf):
        import pandas as pd

        if cand_pdf.empty:
            return pd.DataFrame(
                columns=[query_id_col, "rank", id_col, "mmr_score"]
            )
        qid = cand_pdf[query_id_col].iloc[0]
        # ascending-id iteration + strict > keeps the FIRST (lowest-id)
        # max — identical to the oracle's ORDER BY score DESC, id
        cand_pdf = cand_pdf.sort_values(id_col)
        sims = dict(zip(cand_pdf[id_col], cand_pdf["sim"]))
        ps = {
            (i, j): s
            for i, j, s in zip(pair_pdf["i"], pair_pdf["j"], pair_pdf["s"])
        }
        selected: list[int] = []
        rows = []
        for rank in range(1, k + 1):
            best_id, best_score = None, None
            for cid, simq in sims.items():
                if cid in selected:
                    continue
                pen = max(
                    (ps.get((cid, j), 0.0) for j in selected), default=0.0
                )
                score = lam * simq - oneminus * pen
                if best_score is None or score > best_score:
                    best_id, best_score = cid, score
            if best_id is None:
                break
            selected.append(best_id)
            # UNROUNDED score out of the UDF: Python round() is
            # half-to-even while the oracle's round(·, 6) (and Spark
            # F.round) is half-away-from-zero — the trailing F.round
            # below keeps both engines in the same rounding mode
            rows.append((qid, rank, best_id, best_score))
        return pd.DataFrame(
            rows, columns=[query_id_col, "rank", id_col, "mmr_score"]
        )

    return (
        cands.groupBy(query_id_col)
        .cogroup(pairs.groupBy(query_id_col))
        .applyInPandas(greedy, schema=out_schema)
        .withColumn("mmr_score", F.round("mmr_score", 6))
    )


def mmr_topk_oracle_sql(
    dim: int,
    k: int,
    n_candidates: int,
    lam: float,
    query_ids: list[int],
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Recursive-CTE DuckDB twin: the greedy MMR trajectory replayed
    step by step — each recursion level LATERAL-picks the argmax of
    ``λ·sim − (1−λ)·max_sel_pairsim`` among unselected candidates with
    the same lowest-id tie-break. λ and 1−λ are embedded via ``repr``
    of the SAME Python floats the Spark side multiplies with, so the
    score doubles are identical."""

    def dot_ab(a: str, b: str) -> str:
        terms = " + ".join(
            f"{a}[{i + 1}]::DOUBLE * {b}[{i + 1}]::DOUBLE" for i in range(dim)
        )
        return f"(0.0 + {terms})"

    lam_s = repr(lam)
    oneminus_s = repr(1.0 - lam)
    ids = ", ".join(str(i) for i in query_ids)
    e = vec_col
    return f"""
    WITH RECURSIVE v AS (
        SELECT {id_col}, {e}, {dot_ab(e, e)} AS dn FROM {table}
    ),
    q AS (
        SELECT {id_col} AS query_id, {e}, dn FROM v
        WHERE {id_col} IN ({ids})
    ),
    scored AS (
        SELECT q.query_id, v.{id_col},
               round(CASE WHEN sqrt(v.dn) > 0 AND sqrt(q.dn) > 0
                          THEN {dot_ab(f"v.{e}", f"q.{e}")}
                               / (sqrt(v.dn) * sqrt(q.dn)) END, 6) AS sim
        FROM v CROSS JOIN q
    ),
    cands AS (
        SELECT query_id, {id_col}, sim FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY sim DESC, {id_col}
            ) AS rn
            FROM scored
            WHERE sim IS NOT NULL AND NOT isnan(sim)
        ) WHERE rn <= {n_candidates}
    ),
    pair AS (
        SELECT a.query_id, a.{id_col} AS i, b.{id_col} AS j,
               coalesce(round(
                   CASE WHEN sqrt(av.dn) > 0 AND sqrt(bv.dn) > 0
                        THEN {dot_ab(f"av.{e}", f"bv.{e}")}
                             / (sqrt(av.dn) * sqrt(bv.dn)) END, 6), 0.0) AS s
        FROM cands a
        JOIN cands b ON a.query_id = b.query_id AND a.{id_col} != b.{id_col}
        JOIN v av ON av.{id_col} = a.{id_col}
        JOIN v bv ON bv.{id_col} = b.{id_col}
    ),
    sel AS (
        SELECT query_id, 1 AS rank, {id_col}, {lam_s} * sim AS mmr_score,
               [{id_col}] AS selected
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY {lam_s} * sim DESC, {id_col}
            ) AS rn FROM cands
        ) WHERE rn = 1
        UNION ALL
        SELECT s.query_id, s.rank + 1, pick.{id_col}, pick.score,
               list_append(s.selected, pick.{id_col})
        FROM sel s, LATERAL (
            SELECT c.{id_col},
                   {lam_s} * c.sim - {oneminus_s} * coalesce(
                       (SELECT MAX(p.s) FROM pair p
                        WHERE p.query_id = s.query_id
                          AND p.i = c.{id_col}
                          AND list_contains(s.selected, p.j)), 0.0) AS score
            FROM cands c
            WHERE c.query_id = s.query_id
              AND NOT list_contains(s.selected, c.{id_col})
            ORDER BY score DESC, c.{id_col}
            LIMIT 1
        ) pick
        WHERE s.rank < {k}
    )
    SELECT query_id, rank, {id_col}, round(mmr_score, 6) AS mmr_score
    FROM sel
    """
