"""SemDeDup-style semantic deduplication: cluster the embedding space
with the deterministic IVF coarse quantizer (ext/ivf.py), then compare
vectors pairwise ONLY within their cluster and drop every vector whose
cosine similarity to a lower-id cluster-mate reaches the threshold
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication").

Scale design (the whole point of the clustering step): pairwise cost
is Σ|cluster|², never N² — pick ``n_centroids ≈ N / target_cluster_size``
so each cluster stays a few thousand vectors and the self-join is an
equi-join on ``centroid_id`` with bounded per-key fan-out. The corpus
is materialized ONCE behind a ``repartition(centroid_id)`` barrier so
the index computation (assign's crossJoin + argmax agg) is not
re-executed for each side of the self-join (exchange reuse — see
CLAUDE.md invariant).

The keep rule is deterministic: within a cluster the lowest-id member
of every similarity chain survives; a vector is a duplicate iff SOME
lower-id cluster-mate is ≥ threshold similar on the ROUND(·, 6) value
(both engines compare the rounded similarity, so a last-ulp fold
divergence cannot flip a verdict).

Reference parity note: the reference engine has no semantic-dedup
operator (its curation surface stops at exact hashing delegated to
cherry_core); this extends the training-data toolkit the same way
ext/dedup.py extends fuzzy dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cherry_spark.ext.ivf import index_ctes_sql, ivf_assign, ivf_centroids, _dot_ab_sql
from cherry_spark.ext.similarity import dot, norm


def semantic_dedup(
    vectors: DataFrame,
    threshold: float = 0.3,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned: DataFrame | None = None,
    max_cluster_size: int | None = None,
    method: str = "numpy",
) -> DataFrame:
    """(id, centroid_id, is_dup): is_dup = 1 iff a lower-id vector in
    the same IVF cluster has round(cosine, 6) >= threshold.

    Zero-norm vectors never match anything (NULL sim, dropped by the
    >= comparison) — same policy as similarity.blocked_pairs_exact.

    ``assigned``: optionally pass a precomputed (id, centroid_id)
    assignment — e.g. the corpus of a persisted ``ivf_build_index``
    directory — and the in-line index build (several corpus scans for
    seeds/Lloyd/assign) is skipped entirely. That is the 100 TB path:
    build the index once, run dedup (and search) against it.

    ``max_cluster_size``: degenerate-cluster guard. The pairwise cost
    is Σ|cluster|² BY DESIGN, and the ``n_centroids ≈ N /
    target_cluster_size`` sizing rule keeps every key bounded on a
    healthy corpus — but an adversarial corpus (every embedding
    near-identical) collapses into ONE centroid and the equi-join
    becomes a quadratic single-key join in one task. With the cap set,
    clusters larger than it are excluded from the self-join via a
    count filter (their id lists are never collected, the degenerate
    key never enters the join) and their members are returned with
    ``is_dup = 0`` — kept, not silently dropped. A capped cluster IS
    a finding: its members are near-identical en masse, so route them
    through ``similarity.blocked_pairs_exact`` or exact dedup, and
    monitor the volume with ``semdedup_cluster_stats`` (the dropped-
    pair accounting twin, same cap). Default ``None`` preserves the
    exact SemDeDup semantics the certified oracle models.

    ``method`` (r9 — the knn_graph matmul lane applied to the
    within-cluster self-compare):

    - ``"numpy"`` (default, requires ``threshold > 0``; automatic
      fallback otherwise): each cluster scores its pair block with one
      float64 matmul inside ``applyInPandas`` (column-chunked so task
      memory is |cluster| × chunk doubles, never |cluster|²-unbounded).
      The certified decision ``round(fold_cos, 6) >= threshold`` is
      monotone in the raw cosine with a single boundary at
      ``threshold - 0.5e-6``; matmul and fold cosine differ only by
      IEEE summation order (≲1e-13), so any pair whose matmul cosine
      sits outside a ±1e-9 band around the boundary is decided
      outright, and ONLY the band pairs (empty on real data) are
      re-checked with the certified JVM fold expression.  Output is
      bit-identical to the fold lane by construction; differential
      tests cover exact-duplicate, orthogonal, zero-norm, and
      planted exactly-at-boundary cosines.
    - ``"fold"``: the original all-pairs JVM expression lane.
    """
    if assigned is None:
        centroids = ivf_centroids(vectors, n_centroids, id_col, vec_col)
        assigned = ivf_assign(vectors, centroids, id_col, vec_col)
    corpus = (
        vectors.join(assigned, on=id_col)
        .select(id_col, "centroid_id", vec_col)
        .withColumn("__n", norm(F.col(vec_col)))
        # shared materialization point: both self-join sides AND the
        # final verdict projection reuse this one exchange instead of
        # re-running scan + crossJoin-assign + argmax per reference
        .repartition("centroid_id")
    )
    if max_cluster_size is not None:
        # count-filter guard: the oversized centroid key is dropped
        # BEFORE either self-join side, so no task ever receives the
        # quadratic key (same pattern as the minhash/ngram bucket
        # caps — a count rollup is immune to the skew it measures)
        small = (
            corpus.groupBy("centroid_id")
            .agg(F.count(F.lit(1)).alias("__cn"))
            .filter(F.col("__cn") <= max_cluster_size)
            .select("centroid_id")
        )
        joinable = corpus.join(F.broadcast(small), "centroid_id")
    else:
        joinable = corpus
    if method == "numpy" and threshold > 0:
        try:
            import numpy  # noqa: F401
            import pandas  # noqa: F401
        except ImportError:  # pragma: no cover - both baked into the env
            method = "fold"
    else:
        method = "fold"
    if method == "numpy":
        dup_ids = _semdedup_dup_ids_numpy(
            joinable, threshold, id_col, vec_col
        ).withColumn("__dup", F.lit(1))
    else:
        a = joinable.select(
            "centroid_id",
            F.col(id_col).alias("__aid"),
            F.col(vec_col).alias("__av"),
            F.col("__n").alias("__an"),
        )
        b = joinable.select(
            "centroid_id",
            F.col(id_col).alias("__bid"),
            F.col(vec_col).alias("__bv"),
            F.col("__n").alias("__bn"),
        )
        sim = F.when(
            (F.col("__an") > 0) & (F.col("__bn") > 0),
            dot(F.col("__av"), F.col("__bv")) / (F.col("__an") * F.col("__bn")),
        )
        dup_ids = (
            a.join(b, on="centroid_id")
            .filter(F.col("__aid") < F.col("__bid"))
            .filter(F.round(sim, 6) >= F.lit(threshold))
            .select(F.col("__bid").alias(id_col))
            .distinct()
            .withColumn("__dup", F.lit(1))
        )
    return (
        corpus.join(dup_ids, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.col("centroid_id").cast("long").alias("centroid_id"),
            F.coalesce(F.col("__dup"), F.lit(0)).alias("is_dup"),
        )
    )


def _semdedup_dup_ids_numpy(
    joinable: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    band: float = 1e-9,
    chunk: int = 1024,
) -> DataFrame:
    """Distinct duplicate ids via the per-cluster matmul block with a
    certified-boundary band (see semantic_dedup docstring).  Emits
    per cluster: kind=1 rows (member decisively duplicated) and kind=2
    rows (boundary pair needing the exact fold re-check); the handful
    of kind=2 pairs rejoin the float vectors and rerun the CERTIFIED
    rounded-fold comparison."""
    import pandas as pd

    from pyspark.sql.types import IntegerType, StructField, StructType

    id_type = joinable.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("__bid", id_type),
            StructField("__aid", id_type),
            StructField("__kind", IntegerType()),
        ]
    )
    # decision boundary of round(x, 6) >= threshold (half-up, x > 0):
    # the rounded value is a multiple of 1e-6, so the condition is
    # round(x, 6) >= g where g is the SMALLEST grid multiple >=
    # threshold — i.e. x >= g - 0.5e-6. For an off-grid threshold,
    # `threshold - 0.5e-6` is NOT that boundary (review r9: cosines
    # between the two were decided dup without the certified re-check);
    # the 1e-9 slack absorbs float repr error of on-grid thresholds.
    import math

    g = math.ceil(float(threshold) * 1e6 - 1e-9) / 1e6
    cutoff = g - 0.5e-6
    lo, hi = cutoff - band, cutoff + band
    src = joinable.select(
        "centroid_id", F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    )

    def score_cluster(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        # id dtypes derived from the (schema-typed) group frame — a
        # hardcoded int64 empty frame fails the Arrow conversion for
        # string ids on singleton clusters (review r9)
        empty = pd.DataFrame(
            {
                "__bid": pd.Series([], dtype=pdf["__id"].dtype),
                "__aid": pd.Series([], dtype=pdf["__id"].dtype),
                "__kind": pd.Series([], dtype="int32"),
            }
        )
        n = len(pdf)
        if n < 2:
            return empty
        pdf = pdf.sort_values("__id", kind="mergesort")
        ids = pdf["__id"].to_numpy()
        A = np.asarray(pdf["__v"].tolist(), dtype=np.float64)
        norms = np.sqrt((A * A).sum(axis=1))
        rows = np.arange(n)
        out = []
        for j0 in range(1, n, chunk):
            j1 = min(j0 + chunk, n)
            jidx = np.arange(j0, j1)
            S = A @ A[j0:j1].T
            denom = np.outer(norms, norms[j0:j1])
            with np.errstate(divide="ignore", invalid="ignore"):
                P = np.where(
                    denom > 0, S / np.where(denom > 0, denom, 1.0), -np.inf
                )
            valid = rows[:, None] < jidx[None, :]
            decided = ((P >= hi) & valid).any(axis=0)
            if decided.any():
                out.append(
                    pd.DataFrame(
                        {
                            "__bid": ids[jidx[decided]],
                            "__aid": ids[jidx[decided]],
                            "__kind": np.int32(1),
                        }
                    )
                )
            bmask = (P > lo) & (P < hi) & valid & ~decided[None, :]
            bi, bj = np.nonzero(bmask)
            if len(bi):
                out.append(
                    pd.DataFrame(
                        {
                            "__bid": ids[jidx[bj]],
                            "__aid": ids[bi],
                            "__kind": np.int32(2),
                        }
                    )
                )
        return pd.concat(out, ignore_index=True) if out else empty

    # res is consumed twice (decided + checks); the Python stage runs
    # AFTER the groupBy exchange, so exchange reuse cannot dedupe it —
    # without an anchor the whole per-cluster matmul executes once per
    # consumer (the r15 executed plan carried two FlatMapGroupsInPandas
    # of score_cluster). The output is tiny (dup ids + the empty-on-
    # real-data boundary pairs); a lazy localCheckpoint materializes it
    # once and lets AQE collapse the checks branch (and its two corpus
    # re-joins) to an empty relation when no boundary pair exists.
    res = (
        src.groupBy("centroid_id")
        .applyInPandas(score_cluster, out_schema)
        .localCheckpoint(eager=False)
    )
    decided = res.filter(F.col("__kind") == 1).select(
        F.col("__bid").alias(id_col)
    )
    checks = res.filter(F.col("__kind") == 2).select("__aid", "__bid")
    av = joinable.select(
        F.col(id_col).alias("__aid"),
        F.col(vec_col).alias("__av"),
        F.col("__n").alias("__an"),
    )
    bv = joinable.select(
        F.col(id_col).alias("__bid"),
        F.col(vec_col).alias("__bv"),
        F.col("__n").alias("__bn"),
    )
    sim = F.when(
        (F.col("__an") > 0) & (F.col("__bn") > 0),
        dot(F.col("__av"), F.col("__bv")) / (F.col("__an") * F.col("__bn")),
    )
    confirmed = (
        checks.join(av, "__aid")
        .join(bv, "__bid")
        .filter(F.round(sim, 6) >= F.lit(threshold))
        .select(F.col("__bid").alias(id_col))
    )
    return decided.unionByName(confirmed).distinct()


def semantic_delta_dedup(
    corpus_assigned: DataFrame,
    batch: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch-vs-corpus SEMANTIC dedup — the embedding-space twin of
    ``dedup.delta_dedup`` (and the per-batch classifier of the
    growing-corpus streaming gate): a batch vector is a
    ``semantic_dup`` iff some CORPUS vector inside the batch row's
    ``nprobe`` nearest centroids has round(cosine, 6) >= threshold.

    Returns ``(id_col, verdict, best_sim, n_matches)`` for every batch
    row — ``best_sim`` is the max rounded cosine over probed corpus
    candidates (NULL when no candidate), the monitor for threshold
    tuning.

    Scale shape (the delta_dedup design point — the corpus is the
    100 TB side, the batch a micro-batch): the batch probes the tiny
    broadcast centroid table for its nprobe clusters, then ONE
    broadcast equi-join on centroid_id against the assigned corpus
    store — with a centroid-partitioned store only nprobe/n_centroids
    of the corpus files are scanned (the ivf_search pruning). Nothing
    batch×corpus, nothing corpus×corpus; corpus vectors are assigned
    ONCE at admission, never re-embedded or re-assigned per batch.
    ``nprobe > 1`` buffers boundary recall the same way ivf_search
    does (a near-dup pair split across a centroid boundary is missed
    at nprobe=1 — same candidate-recall tradeoff as LSH banding).
    """
    from cherry_spark.ext.ivf import _probe_centroids

    probe = _probe_centroids(
        batch.select(F.col(id_col), F.col(vec_col)),
        centroids,
        nprobe,
        vec_col,
        id_col,
    ).withColumn("__qn", norm(F.col("__qvec")))
    cor = corpus_assigned.select(
        "centroid_id", F.col(vec_col).alias("__cv")
    ).withColumn("__cn", norm(F.col("__cv")))
    sim = F.when(
        (F.col("__cn") > 0) & (F.col("__qn") > 0),
        dot(F.col("__cv"), F.col("__qvec")) / (F.col("__cn") * F.col("__qn")),
    )
    hits = (
        cor.join(F.broadcast(probe), on="centroid_id")
        .select(F.col(id_col), F.round(sim, 6).alias("__s"))
        .groupBy(id_col)
        .agg(
            F.max("__s").alias("best_sim"),
            F.sum(
                F.when(F.col("__s") >= F.lit(threshold), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_matches"),
        )
    )
    return (
        batch.select(F.col(id_col))
        .join(hits, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.when(
                F.coalesce(F.col("n_matches"), F.lit(0)) > 0,
                F.lit("semantic_dup"),
            )
            .otherwise(F.lit("unique"))
            .alias("verdict"),
            F.col("best_sim"),
            F.coalesce(F.col("n_matches"), F.lit(0)).cast("long").alias(
                "n_matches"
            ),
        )
    )


def semantic_dedup_oracle_sql(
    dim: int,
    threshold: float,
    n_centroids: int = 16,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Generated DuckDB twin: the shared deterministic-index CTEs
    (ext/ivf.py:index_ctes_sql — bit-exact by the ann_ivf_topk
    certification) + an EXISTS probe for a lower-id cluster-mate over
    the same ROUND(·, 6) unrolled-fold cosine."""
    pair_sim = (
        f"CASE WHEN sqrt(o.dn) > 0 AND sqrt(c.dn) > 0 THEN "
        f"{_dot_ab_sql(f'o.{vec_col}', f'c.{vec_col}', dim, True)}"
        f" / (sqrt(o.dn) * sqrt(c.dn)) END"
    )
    return f"""
    WITH {index_ctes_sql(dim, n_centroids, table, id_col, vec_col)},
    corpus AS (
        SELECT a.centroid_id, v.{id_col}, v.{vec_col}, v.dn
        FROM assign1 a JOIN v USING ({id_col})
    )
    SELECT c.{id_col},
           CAST(c.centroid_id AS BIGINT) AS centroid_id,
           CASE WHEN EXISTS (
               SELECT 1 FROM corpus o
               WHERE o.centroid_id = c.centroid_id
                 AND o.{id_col} < c.{id_col}
                 AND round({pair_sim}, 6) >= {threshold}
           ) THEN 1 ELSE 0 END AS is_dup
    FROM corpus c
    """


def semdedup_cluster_stats(
    vectors: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int = 500,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Degenerate-cluster monitor for ``semantic_dedup`` — the
    ``posting_skew_stats`` pattern applied to IVF cluster sizes: one
    row of (n_buckets, max_bucket, n_capped, docs_in_capped,
    pairs_dropped, pairs_kept) where a "bucket" is a cluster and
    pairs are the within-cluster comparisons ``semantic_dedup`` with
    the same ``max_cluster_size`` would run vs skip. Aggregate-only —
    cluster SIZES, never members — so the monitor is immune to the
    degenerate clusters it measures. Run it before (or alongside) a
    dedup job: a rising pairs_dropped means the corpus is collapsing
    into few centroids — raise n_centroids, pre-strip exact dups, or
    accept the cap's keep-all verdict for those clusters."""
    from cherry_spark.ext.dedup import _bucket_size_rollup

    if assigned is None:
        centroids = ivf_centroids(vectors, n_centroids, id_col, vec_col)
        assigned = ivf_assign(vectors, centroids, id_col, vec_col)
    sizes = assigned.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("n"))
    return _bucket_size_rollup(sizes.groupBy(), max_cluster_size)


def semdedup_cluster_stats_oracle_sql(
    dim: int,
    n_centroids: int = 16,
    max_cluster_size: int = 500,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Generated DuckDB twin of ``semdedup_cluster_stats``: the shared
    deterministic-index CTEs, cluster sizes from assign1, and the same
    cap rollup the posting_skew_stats oracle uses."""
    return f"""
    WITH {index_ctes_sql(dim, n_centroids, table, id_col, vec_col)},
    sizes AS (
        SELECT centroid_id, COUNT(*) AS n FROM assign1 GROUP BY centroid_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(MAX(n) AS BIGINT) AS max_bucket,
           CAST(COALESCE(SUM(CASE WHEN n > {max_cluster_size} THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_capped,
           CAST(COALESCE(SUM(CASE WHEN n > {max_cluster_size} THEN n ELSE 0 END), 0)
                AS BIGINT) AS docs_in_capped,
           CAST(COALESCE(SUM(CASE WHEN n > {max_cluster_size} THEN n*(n-1)//2
                             ELSE 0 END), 0) AS BIGINT) AS pairs_dropped,
           CAST(COALESCE(SUM(CASE WHEN n <= {max_cluster_size} THEN n*(n-1)//2
                             ELSE 0 END), 0) AS BIGINT) AS pairs_kept
    FROM sizes
    """
