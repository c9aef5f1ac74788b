"""Embedding compression: int8 scalar quantization + reconstruction
audit.

The vector-compression step an ANN serving path runs before indexing
100 TB of embeddings: per-dimension global [min, max] -> 8-bit codes
(4x smaller than float32, dot products stay SIMD-friendly). The audit
reports per-vector reconstruction error so a curator can decide whether
scalar quantization suffices or product quantization is needed.

Distributed shape: per-dimension stats are a dim-row aggregate
(map-side partial min/max -> one tiny shuffle), broadcast back onto the
exploded values; the per-vector audit is one hash aggregate. Nothing is
ever corpus-bounded on a single task.

Cross-engine determinism (for the DuckDB oracle twin): min/max involve
no summation, quantize/dequantize are identical IEEE double expression
trees in both engines, and the error MEAN is aggregated as integer
nano-units (round(err*1e9) -> BIGINT sum) because a double sum's fold
order differs between engines. round(·, 0) is half-away-from-zero in
both engines for the non-negative values used here.

No reference counterpart (the reference has no vector ops); this
extends the ANN family (ext/similarity.py, ext/ivf.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dim_stats(pe: DataFrame) -> DataFrame:
    return pe.groupBy("i").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))


def _explode(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"), F.posexplode(vec_col).alias("i", "vf")
    ).select("id", "i", F.col("vf").cast("double").alias("v"))


def _qv(v, mn, mx):
    return (
        F.when(mx > mn, F.round((v - mn) / (mx - mn) * 255, 0).cast("int"))
        .otherwise(F.lit(0))
    )


def _codes(df: DataFrame, id_col: str, vec_col: str, stats: DataFrame) -> DataFrame:
    """(id, qvec) for one side, quantized against the given per-dim
    stats — the single code builder shared by the storage form and the
    search path (so the two encoders cannot drift)."""
    e = _explode(df, id_col, vec_col).join(F.broadcast(stats), "i")
    coded = e.select("id", "i", _qv(F.col("v"), F.col("mn"), F.col("mx")).alias("qv"))
    return coded.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "qv"))),
            lambda s: s.getField("qv"),
        ).alias("qvec")
    )


def quantize_vectors(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, qvec array<int> of 0..255 codes, per-dim codes in position
    order) — the storage form. Codes are rebuilt into an array with
    array_agg over (i, qv) sorted by dimension."""
    pe = _explode(df, id_col, vec_col)
    return _codes(df, id_col, vec_col, _dim_stats(pe)).select(
        F.col("id").alias(id_col), "qvec"
    )


def dim_stats_table(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(i, mn, mx) per-dimension corpus stats — the ingest-time build
    for the stats store :func:`quantized_rerank_topk` serves from."""
    return _dim_stats(_explode(df, id_col, vec_col))


def codes_against(
    df: DataFrame,
    stats: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, qvec) quantized against a GIVEN (i, mn, mx) stats table
    — the ingest-time build for the code-table store.  Same `_codes`
    expression tree as the live search path, so stored codes cannot
    drift from live-quantized ones."""
    return _codes(df, id_col, vec_col, stats).select(
        F.col("id").alias(id_col), "qvec"
    )


def quantized_rerank_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    rerank: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    method: str = "fold",
    buffer: int = 16,
    corpus_codes: DataFrame | None = None,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Two-stage ANN: score CANDIDATES on int8 codes, rerank exactly.

    Stage 1 scans only the quantized code table (4x smaller than
    float32 — at scale that is 4x less IO/memory bandwidth for the
    full-corpus pass) and keeps the top ``rerank`` candidates per
    query by integer code dot product. Stage 2 joins those candidates
    back to the float vectors and ranks the final top-k by EXACT
    cosine — so quantization error can only cost recall (a true
    neighbor missing from the candidate buffer), never corrupt a
    reported similarity. Queries are quantized with the CORPUS's
    per-dimension stats so both sides live in the same code space.

    Candidates are ranked by cosine over the DEQUANTIZED codes: the
    per-dimension (mn, scale) table is dim-bounded (64 rows), so it is
    collected driver-side and constant-folded into the dequantize
    expression — the same dim-table-collect justification as the
    glaciers ABI enumeration; data volume never flows to the driver.
    ``rerank`` (default 10x k) buffers the residual quantization error;
    recall is asserted against brute force in tests.

    ``method="numpy"`` (r9, NON-default — the knn_graph lane applied
    to the code-space pass): the full-corpus proxy scoring runs as one
    ``mapInPandas`` matmul over the raw vectors (quantize half-up ==
    Spark HALF_UP via floor(x+0.5), dequantize with the IDENTICAL
    driver-computed (mn, scale) doubles); the numpy proxy top
    ``rerank + buffer`` per query (salted two-phase) is a superset of
    the certified fold-proxy top-``rerank`` (proxies differ only in
    matmul-vs-fold summation order, ≲1e-13; duplicate-code ties rank
    identically by id in both), and the exact rerank-boundary CUT is
    re-established by fold-scoring ONLY those ≤ (rerank+buffer)·nq
    candidates with the certified expression.  Output bit-identical
    to ``method="fold"`` (differential tests + oracle hash-match).
    MEASURED NEGATIVE at the registered config (r9, same-session A/B
    at sf0.1, nq=3): fold 1.84 s vs numpy 2.51 s median — with 3
    queries the corpus×nq fold volume (~18k folds) is cheaper than
    the Arrow corpus pass + extra joins the numpy lane adds; the
    matmul lane only wins when the QUERY SET is large (corpus×nq
    fold volume grows linearly in nq, the numpy pass doesn't — the
    knn_graph case is exactly nq = corpus): at nq=200 the same A/B
    reads numpy 4.9 s vs fold 5.9 s and diverging.  Default stays
    "fold"; switch per call for batch-query workloads.

    ``corpus_codes`` / ``stats`` (r15): the ingest-served form of the
    operator's own 100 TB contract — "stage 1 scans only the quantized
    code table".  ``stats`` is a prebuilt (i, mn, mx) per-dimension
    table (:func:`dim_stats_table`) and ``corpus_codes`` a prebuilt
    (id_col, qvec) table quantized against those stats
    (:func:`codes_against`); both are corpus state computed once per
    corpus version (the `_ensure_minhash_signatures` pattern), so the
    per-run cost drops the live stats pass (scan+explode+agg+collect)
    and the live corpus code build (explode + broadcast-stats join +
    groupBy(id) array rebuild — one full exchange of N×dim rows).
    Stored codes are built by the SAME ``_codes`` expression the live
    lane runs, so results are bit-identical (pinned by test).  The
    query side is always quantized live (it is not corpus state).
    """
    if stats is not None:
        # 64-row dim table: collecting it is the same driver-side
        # constant-fold as the live lane, minus the corpus pass
        stat_rows = sorted(stats.collect(), key=lambda r: r["i"])
    else:
        # ONE stats aggregation: collect the dim-bounded rows, then
        # rebuild the broadcast side from them — the corpus is scanned
        # once for stats, not once per consumer
        pe = _explode(vectors, id_col, vec_col)
        stat_rows = sorted(_dim_stats(pe).collect(), key=lambda r: r["i"])
    stats = vectors.sparkSession.createDataFrame(
        [(r["i"], float(r["mn"]), float(r["mx"])) for r in stat_rows],
        "i int, mn double, mx double",
    )

    def codes(df: DataFrame, src_id: str) -> DataFrame:
        return _codes(df, src_id, vec_col, stats)
    mn_lit = F.array(*[F.lit(float(r["mn"])) for r in stat_rows])
    scale_lit = F.array(
        *[F.lit((float(r["mx"]) - float(r["mn"])) / 255.0) for r in stat_rows]
    )

    def deq(col_name: str):
        return F.zip_with(
            F.col(col_name).cast("array<double>"),
            F.sequence(F.lit(1), F.lit(len(stat_rows))),
            lambda c, i: c * F.element_at(scale_lit, i.cast("int"))
            + F.element_at(mn_lit, i.cast("int")),
        )

    from cherry_spark.ext.similarity import (
        cosine_similarity,
        dot,
        norm,
        topk_per_query,
    )

    if method == "numpy":
        try:
            import numpy  # noqa: F401
            import pandas  # noqa: F401
        except ImportError:  # pragma: no cover - both baked into the env
            method = "fold"
    if method == "numpy":
        pre = _quantized_candidates_numpy(
            vectors,
            query,
            stat_rows,
            rerank + buffer,
            id_col,
            vec_col,
            query_id_col,
        )
        # fold-proxy re-score of the buffered superset re-establishes
        # the certified rerank-boundary cut exactly: candidate volume
        # is ≤ (rerank+buffer)·nq rows, so the interpreted folds run
        # on hundreds of rows, not the corpus
        sub = vectors.join(
            pre.select(F.col(id_col)).distinct(), id_col
        )
        cor = codes(sub, id_col).select(
            "id", deq("qvec").alias("__d")
        ).withColumn("__dn", norm(F.col("__d")))
    else:
        # dequantized code arrays + norms ONCE per row, not once per
        # (row × query) pair — the HOF folds are interpreted, so
        # per-pair norms triple the hot loop (as brute_force_topk)
        base = (
            corpus_codes.select(F.col(id_col).alias("id"), "qvec")
            if corpus_codes is not None
            else codes(vectors, id_col)
        )
        cor = base.select(
            "id", deq("qvec").alias("__d")
        ).withColumn("__dn", norm(F.col("__d")))
    qc = F.broadcast(
        codes(query, query_id_col)
        .select(F.col("id").alias("__qid"), deq("qvec").alias("__qdeq"))
        .withColumn("__qn", norm(F.col("__qdeq")))
    )
    proxy = F.when(
        (F.col("__dn") > 0) & (F.col("__qn") > 0),
        dot(F.col("__d"), F.col("__qdeq")) / (F.col("__dn") * F.col("__qn")),
    )
    if method == "numpy":
        scored = (
            pre.join(cor.withColumnRenamed("id", id_col), id_col)
            .join(
                qc.select(
                    F.col("__qid").alias(query_id_col), "__qdeq", "__qn"
                ),
                query_id_col,
            )
            .select(query_id_col, F.col(id_col), proxy.alias("__proxy"))
        )
    else:
        scored = cor.crossJoin(qc).select(
            F.col("__qid").alias(query_id_col),
            F.col("id").alias(id_col),
            proxy.alias("__proxy"),
        )
    # salted two-phase selection: no single task ever sorts a whole
    # query's scored corpus (the pre-r7 form was one corpus-bounded
    # window per query — a single-task sort at scale)
    candidates = topk_per_query(
        scored, rerank, query_id_col, id_col, "__proxy"
    ).select(query_id_col, id_col)
    # exact rerank on the float vectors (candidates only)
    qv = F.broadcast(
        query.select(
            F.col(query_id_col), F.col(vec_col).alias("__qvec")
        )
    )
    exact = (
        candidates.join(vectors.select(id_col, vec_col), id_col)
        .join(qv, query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(
                cosine_similarity(F.col(vec_col), F.col("__qvec")), 6
            ).alias("sim"),
        )
    )
    return topk_per_query(exact, k, query_id_col, id_col, "sim")


def _quantized_candidates_numpy(
    vectors: DataFrame,
    query: DataFrame,
    stat_rows,
    k_buf: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """(query_id, id) numpy-proxy top-``k_buf`` per query: quantize +
    dequantize + matmul proxy in one ``mapInPandas`` corpus pass, then
    the salted two-phase selection on the emitted (corpus × nq) proxy
    rows.  Quantization replicates Spark's expression exactly on real
    data: same (v-mn)/(mx-mn)*255 IEEE order, HALF_UP == floor(x+0.5)
    for these non-negative sub-255 operands (a divergence needs x
    within ~3e-14 of an exact .5 — and any such flip is absorbed by
    the caller's buffer anyway).  The query side is collected
    driver-side (small by the operator's broadcast contract)."""
    import numpy as np
    import pandas as pd

    from cherry_spark.ext.similarity import topk_per_query

    mn = np.array([float(r["mn"]) for r in stat_rows])
    mx = np.array([float(r["mx"]) for r in stat_rows])
    rng = mx - mn
    scale = rng / 255.0
    ok = rng > 0

    def quant_deq(V: "np.ndarray") -> "np.ndarray":
        X = (V - mn) / np.where(ok, rng, 1.0) * 255.0
        C = np.where(ok, np.floor(X + 0.5), 0.0)
        return C * scale + mn

    q_rows = query.select(F.col(query_id_col), F.col(vec_col)).collect()
    qids = np.array([r[query_id_col] for r in q_rows])
    Qd = quant_deq(np.asarray([list(r[vec_col]) for r in q_rows], dtype=np.float64))
    qn = np.sqrt((Qd * Qd).sum(axis=1))

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            D = quant_deq(V)
            dn = np.sqrt((D * D).sum(axis=1))
            denom = np.outer(dn, qn)
            with np.errstate(divide="ignore", invalid="ignore"):
                P = np.where(
                    denom > 0,
                    (D @ Qd.T) / np.where(denom > 0, denom, 1.0),
                    -np.inf,
                )
            n = len(pdf)
            yield pd.DataFrame(
                {
                    query_id_col: np.tile(qids, n),
                    id_col: np.repeat(pdf[id_col].to_numpy(), len(qids)),
                    "__np": P.ravel(),
                }
            )

    # derive id types from the inputs (the knn numpy lane's contract)
    # instead of hardcoding long — string/int ids must behave the same
    # through both method lanes
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        [
            StructField(query_id_col, query.schema[query_id_col].dataType),
            StructField(id_col, vectors.schema[id_col].dataType),
            StructField("__np", DoubleType()),
        ]
    )
    scored = vectors.select(id_col, vec_col).mapInPandas(score, schema=out_schema)
    return topk_per_query(scored, k_buf, query_id_col, id_col, "__np").select(
        query_id_col, id_col
    )


def quantized_rerank_oracle_sql(
    dim: int,
    k: int,
    rerank: int,
    query_ids: list[int],
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB SQL recomputing ``quantized_rerank_topk`` EXACTLY —
    generated beside the implementation so the code space cannot drift
    (the ann_ivf_topk / ann_lsh_topk technique).

    Bit-exactness argument:

    - per-dimension [mn, mx] involve no summation — identical doubles;
    - quantize is the audit-certified expression
      ``round((v-mn)/(mx-mn)*255, 0)`` (round half-away-from-zero in
      both engines for these non-negative operands), dequantize is
      ``code*( (mx-mn)/255.0 ) + mn`` — single-element IEEE expressions;
    - every dot/norm is an unrolled left-associated sum, the identical
      IEEE sequence to Spark's ``F.aggregate`` fold
      (``ivf._dot_ab_sql``);
    - the candidate cut ranks the UNROUNDED proxy with (proxy DESC
      NULLS LAST, id ASC) — bit-equal doubles on both sides make the
      rerank-boundary cut deterministic;
    - the final top-k ranks the ROUNDED exact cosine with the same
      tie-break.
    """
    from cherry_spark.ext.ivf import _dot_ab_sql

    def dot_ab(a: str, b: str, cast_b: bool = False) -> str:
        return _dot_ab_sql(a, b, dim, cast_b)

    ids = ", ".join(str(i) for i in query_ids)
    return f"""
    WITH pe AS (
        SELECT {id_col} AS id, g.i, {vec_col}[g.i]::DOUBLE AS v
        FROM {table}, UNNEST(range(1, {dim} + 1)) AS g(i)
        WHERE {vec_col} IS NOT NULL
    ),
    stats AS (SELECT i, min(v) AS mn, max(v) AS mx FROM pe GROUP BY i),
    dv AS (
        SELECT pe.id,
               list(
                 (CASE WHEN s.mx > s.mn
                       THEN CAST(round((pe.v - s.mn)/(s.mx - s.mn)*255, 0)
                                 AS INT)
                       ELSE 0 END)::DOUBLE
                 * ((s.mx - s.mn)/255.0) + s.mn
                 ORDER BY pe.i) AS d
        FROM pe JOIN stats s USING (i)
        GROUP BY pe.id
    ),
    dn AS (SELECT id, d, {dot_ab("d", "d")} AS n2 FROM dv),
    scored AS (
        SELECT q.id AS query_id, c.id,
               CASE WHEN sqrt(c.n2) > 0 AND sqrt(q.n2) > 0
                    THEN {dot_ab("c.d", "q.d")} / (sqrt(c.n2) * sqrt(q.n2))
               END AS proxy
        FROM dn c CROSS JOIN dn q WHERE q.id IN ({ids})
    ),
    cand AS (
        SELECT query_id, id FROM (
            SELECT query_id, id,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY proxy DESC NULLS LAST, id) AS rn
            FROM scored) WHERE rn <= {rerank}
    ),
    v AS (
        SELECT {id_col} AS id, {vec_col} AS e,
               {dot_ab(vec_col, vec_col, True)} AS n2
        FROM {table}
    ),
    exact AS (
        SELECT cand.query_id, cand.id,
               round(CASE WHEN sqrt(ve.n2) > 0 AND sqrt(q.n2) > 0
                          THEN {dot_ab("ve.e", "q.e", True)}
                               / (sqrt(ve.n2) * sqrt(q.n2)) END, 6) AS sim
        FROM cand
        JOIN v ve ON ve.id = cand.id
        JOIN v q ON q.id = cand.query_id
    )
    SELECT query_id, id AS {id_col}, sim FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY sim DESC NULLS LAST, id) AS rn
        FROM exact) WHERE rn <= {k}
    """


def quantize_audit(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector reconstruction audit of int8 scalar quantization:
    (id, qsum, mean_abs_err, max_abs_err). qsum is an exact integer
    checksum of the codes; errors are |v - dequant(quant(v))| with the
    mean summed in integer nano-units for engine-exact comparison.
    The mean divides by the PER-VECTOR element count (round-4 ADVICE:
    a constant ``dim`` divisor silently produced a wrong mean for any
    vector whose length differed from it)."""
    pe = _explode(df, id_col, vec_col)
    j = pe.join(F.broadcast(_dim_stats(pe)), "i")
    qv = _qv(F.col("v"), F.col("mn"), F.col("mx"))
    deq = (qv.cast("double") / 255) * (F.col("mx") - F.col("mn")) + F.col("mn")
    e = j.select(
        "id",
        qv.alias("qv"),
        F.abs(F.col("v") - deq).alias("err"),
    )
    return e.groupBy("id").agg(
        F.sum("qv").cast("long").alias("qsum"),
        F.round(
            F.sum(F.round(F.col("err") * 1e9, 0).cast("long")).cast("double")
            / F.count(F.lit(1))
            / 1e9,
            6,
        ).alias("mean_abs_err"),
        F.round(F.max("err"), 6).alias("max_abs_err"),
    ).select(F.col("id").alias(id_col), "qsum", "mean_abs_err", "max_abs_err")
