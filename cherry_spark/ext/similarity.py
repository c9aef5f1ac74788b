"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single pass over the vectors
with native array expressions (zip_with/aggregate fold inside codegen,
no UDF, no collect). Scale path: random-hyperplane LSH bucketing — the
candidate set for a query is one bucket instead of the full corpus;
buckets are plain columns so the bucket join is an equi-join Catalyst
shuffles on the bucket key.

Determinism: hyperplane components derive from xxhash64(plane, dim) —
no RNG state, same planes on every executor and every run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as double (left fold, element-wise cast)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b); null when either norm is zero."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def score_query_pairs(
    vectors: DataFrame,
    query: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_digits: int | None = 6,
) -> DataFrame:
    """(query_id, id, sim) cosine for every (query × corpus) pair —
    the shared scoring stage under brute_force_topk and
    hard_negatives_topk. The query side is broadcast (small by
    contract), so the corpus scan is one pass with no shuffle; the
    corpus norm is computed once per ROW, not once per pair (the HOF
    folds are interpreted — per-pair norms triple the hot loop), and
    scalars/division order match cosine_similarity bit-for-bit.
    NaN sims (a corpus vector with a NaN component) normalize to NULL
    so they sort LAST, like the zero-norm case."""
    q = F.broadcast(
        query.select(
            F.col(query_id_col).alias("__qid"),
            F.col(vec_col).alias("__qvec"),
            norm(F.col(vec_col)).alias("__qn"),
        )
    )
    corpus = vectors.withColumn("__vn", norm(F.col(vec_col)))
    na, nb = F.col("__vn"), F.col("__qn")
    sim = F.when(
        (na > 0) & (nb > 0), dot(F.col(vec_col), F.col("__qvec")) / (na * nb)
    )
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    sim = F.when(F.isnan(sim), F.lit(None).cast("double")).otherwise(sim)
    return corpus.crossJoin(q).select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col),
        sim.alias("sim"),
    )


def hard_negatives_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 5,
    neardup_ceiling: float = 0.9,
    positives: DataFrame | None = None,
    exclude_self: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_digits: int | None = 6,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query
    anchor, the k MOST similar corpus vectors that are still allowed
    to be negatives — similarity strictly below ``neardup_ceiling``
    (anything at/above it is an unlabeled near-duplicate whose use as
    a negative would push apart true positives — the classic
    false-negative trap), not the anchor itself, and not in the
    caller's ``positives`` (query_id, id) label set.

    Shape: the brute-force scoring pass (broadcast query side, one
    corpus scan) with the ceiling applied BEFORE the top-k shuffle —
    a map-side filter — then the positives anti-join (broadcast:
    label sets are small by contract) and the salted two-phase top-k.
    For large anchor sets, run the same filters over
    ``ext/ivf.knn_graph`` candidates instead; this operator is the
    exact lane.
    """
    scored = score_query_pairs(
        vectors, query, id_col, vec_col, query_id_col, round_digits
    )
    scored = scored.where(
        F.col("sim").isNull() | (F.col("sim") < F.lit(float(neardup_ceiling)))
    )
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.col(query_id_col))
    if positives is not None:
        pos = positives.select(
            F.col(query_id_col), F.col(id_col)
        )
        scored = scored.join(
            F.broadcast(pos), [query_id_col, id_col], "left_anti"
        )
    return topk_per_query(scored, k, query_id_col, id_col, "sim")


def brute_force_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_digits: int | None = 6,
    two_phase: bool = True,
) -> DataFrame:
    """Exact top-k neighbors for each query row, two-phase.

    ``query`` is a (small) DataFrame of (query_id, embedding) —
    broadcast, so the corpus scan is one pass with no shuffle before
    the top-k selection.

    Phase 1 (JVM-only, round-4 verdict #4): group the scored
    (query_id, id, sim) rows by (query_id, salt) — a deterministic
    64-way hash salt on the corpus id — and keep each group's k best
    via ``slice(array_sort(collect_list(struct(...))), 1, k)``. All of
    it is JVM expression code: no Python worker spin-up (the previous
    ``mapInPandas`` selector paid ~1.3 s of Arrow/pandas cold start),
    and no single task ever sorts a whole query's corpus — each of the
    salt groups holds ~1/64 of it. Phase 2: the exact ranking window
    runs over ≤ k × 64 rows per query. The old single-window form
    (``two_phase=False``) put each query's ENTIRE scored corpus into
    one task: a single-task sort at scale. Results are identical —
    phase 1 orders by the same (sim DESC NULLS LAST, id) total order
    the final window uses, and a global top-k is always a subset of
    the union of per-group top-ks.

    Scale note: the groupBy shuffles the full scored set once (compact
    (qid, salt, negsim, id, sim) rows), where the pandas selector
    pruned map-side and shuffled only k rows per input partition. The
    trade is deliberate: the shuffle is evenly spread over
    queries × 64 groups (no hot key, AQE-splittable) and the per-group
    agg buffer is corpus/64 ids+doubles, while the Python lane cost
    hit EVERY run's latency. At 100 TB you raise ``n_salt`` with the
    cluster's core count.

    NaN policy (both paths): a sim that comes out NaN — a corpus
    vector with a NaN component — is normalized to NULL up front, so
    it sorts LAST like the zero-norm case instead of FIRST (Spark
    orders NaN above every real double; the phase-1 sort key maps
    NULL to +inf under the negated ascending order for the same
    reason).
    """
    scored = score_query_pairs(
        vectors, query, id_col, vec_col, query_id_col, round_digits
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col))
    if not two_phase:
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )

    return topk_per_query(scored, k, query_id_col, id_col, "sim")


def topk_per_query(
    scored: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    val_col: str = "sim",
    n_salt: int = 64,
) -> DataFrame:
    """Salted two-phase top-k over scored (query_id, id, val) rows by
    (val DESC NULLS LAST, id ASC) — the JVM-only selection extracted
    from ``brute_force_topk`` so every scored-candidate ranking
    (cosine, proxy int8 codes, lexical Jaccard) shares one plan shape:
    no single task ever sorts a whole query's corpus.

    Phase 1: group by (query_id, 64-way deterministic id salt) and keep
    each group's k best via ``slice(array_sort(collect_list(struct)))``.
    Phase 2: the exact ranking window runs over ≤ k × n_salt rows per
    query. Identical results to a single corpus-bounded window — a
    global top-k is a subset of the union of per-group top-ks under the
    same total order."""
    from pyspark.sql.window import Window

    # Ascending struct sort == (val DESC NULLS LAST, id ASC): negate
    # the value and send NULL (zero-norm / NaN-normalized) to +inf.
    sort_key = F.struct(
        F.when(F.col(val_col).isNull(), F.lit(float("inf")))
        .otherwise(-F.col(val_col))
        .alias("__neg"),
        F.col(id_col).alias("__i"),
        F.col(val_col).alias("__s"),
    )
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt))
    partial = (
        scored.groupBy(F.col(query_id_col), salt.alias("__salt"))
        .agg(F.slice(F.array_sort(F.collect_list(sort_key)), 1, k).alias("__top"))
        .select(query_id_col, F.explode("__top").alias("__t"))
        .select(
            F.col(query_id_col),
            F.col("__t.__i").alias(id_col),
            F.col("__t.__s").alias(val_col),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col(val_col).desc(), F.col(id_col)
    )
    return (
        partial.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def blocked_pairs_exact(
    vectors: DataFrame,
    threshold: float,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """EXACT cosine-threshold pair join via block-grid decomposition
    (the 1-Bucket-Theta scheme of Okcan & Riedewald, "Processing
    Theta-Joins using MapReduce", SIGMOD 2011).

    An exact all-pairs similarity join is inherently O(n²) compares,
    but a raw ``id1 < id2`` theta join executes as ONE
    BroadcastNestedLoopJoin — a single-node scale-killer. Instead each
    row is replicated to n_blocks grid cells with a narrow explode (no
    join), and the n² work arrives through a composite-key EQUI-join on
    (b1, b2): n_blocks² evenly-sized cells that Catalyst shuffles
    across the cluster like any other join. Replication factor is
    n_blocks per side (= sqrt(cells), the grid-optimal bound); at 100 TB
    you size n_blocks ~ sqrt(total cores) and layer an LSH/IVF
    prefilter on top when approximate recall is acceptable.

    Pair (x, y) lands in exactly one cell — (block(x), block(y)) — so
    no distinct is needed; ``id1 < id2`` keeps one orientation.
    """
    block = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    fan = F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1)))
    # Norms are computed ONCE per row before the fan-out: the lambda
    # folds behind dot()/norm() are interpreted (no codegen for HOFs),
    # so folding them per PAIR inside the join tripled the hot loop.
    # Same dot, same norm scalars, same division — bit-identical to
    # cosine_similarity, so round(·, 6) oracles cannot drift.
    left = vectors.select(
        F.col(id_col).alias("id1"),
        F.col(vec_col).alias("__va"),
        norm(F.col(vec_col)).alias("__na"),
        block.alias("b1"),
    ).withColumn("b2", fan)
    right = vectors.select(
        F.col(id_col).alias("id2"),
        F.col(vec_col).alias("__vb"),
        norm(F.col(vec_col)).alias("__nb"),
        block.alias("b2"),
    ).withColumn("b1", fan)
    na, nb = F.col("__na"), F.col("__nb")
    sim = F.round(
        F.when((na > 0) & (nb > 0), dot(F.col("__va"), F.col("__vb")) / (na * nb)),
        round_digits,
    )
    return (
        left.join(right, ["b1", "b2"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def _hyperplane(plane_idx: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane baked in as a constant
    array literal (sha256-derived components in [-0.5, 0.5)) — computed
    once on the driver, constant-folded in the plan; per-row work is
    only the dot product."""
    import hashlib

    comps = []
    for d in range(dim):
        h = hashlib.sha256(f"cherry_plane:{plane_idx}:{d}".encode()).digest()
        comps.append(int.from_bytes(h[:8], "big") % 10**6 / 1e6 - 0.5)
    return F.array(*[F.lit(c) for c in comps])


def _plane_components(plane_idx: int, dim: int) -> list[float]:
    import hashlib

    comps = []
    for d in range(dim):
        h = hashlib.sha256(f"cherry_plane:{plane_idx}:{d}".encode()).digest()
        comps.append(int.from_bytes(h[:8], "big") % 10**6 / 1e6 - 0.5)
    return comps


def lsh_bucket(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Random-hyperplane signature packed into a long — the ANN bucket
    key. The plane matrix is ONE constant 2-D array literal and the
    signature is a fold ``acc*2 + sign_bit`` over planes: the expression
    tree stays small (a 512-term unrolled form costs seconds of JVM
    codegen per stage it appears in), and plane data is constant-folded.
    """
    planes = F.array(
        *[
            F.array(*[F.lit(c) for c in _plane_components(p, dim)])
            for p in range(n_planes)
        ]
    )
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(n_planes)),
        F.lit(0).cast("long"),
        lambda acc, p: acc * 2
        + F.when(dot(vec, F.element_at(planes, p.cast("int"))) > 0, 1).otherwise(0),
    )


def lsh_topk_oracle_sql(
    dim: int,
    n_planes: int,
    k: int,
    query_ids: list[int],
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB SQL recomputing ``lsh_bucket_topk`` exactly — generated
    from the SAME plane constants (_plane_components), so engines
    cannot drift.

    Why this is bit-exact: Spark's dot() is a sequential left fold
    ``(((0.0 + v1) + v2) + ...)``; SQL ``+`` is left-associative, so an
    unrolled ``0.0 + e[1]*c1 + e[2]*c2 + ...`` performs the identical
    IEEE operation sequence — float->double casts and literal parsing
    are exact, so the UNROUNDED plane-side signs (the bucket bits)
    match bit-for-bit, and cosine values agree under round(·, 6)."""

    def dot_plane(arr: str, comps: list[float]) -> str:
        terms = " + ".join(
            f"{arr}[{i + 1}]::DOUBLE * ({comps[i]!r})" for i in range(dim)
        )
        return f"(0.0 + {terms})"

    def dot_arrs(a: str, b: str) -> str:
        terms = " + ".join(
            f"{a}[{i + 1}]::DOUBLE * {b}[{i + 1}]::DOUBLE" for i in range(dim)
        )
        return f"(0.0 + {terms})"

    bucket = " + ".join(
        f"(CASE WHEN {dot_plane(vec_col, _plane_components(p, dim))} > 0 "
        f"THEN 1 ELSE 0 END) * {2 ** (n_planes - 1 - p)}"
        for p in range(n_planes)
    )
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
    WITH b AS (
        SELECT {id_col}, {vec_col},
               CAST({bucket} AS BIGINT) AS bucket,
               {dot_arrs(vec_col, vec_col)} AS dn
        FROM {table}
    ),
    q AS (
        SELECT {id_col} AS query_id, {vec_col} AS qvec, bucket AS qbucket,
               dn AS qdn
        FROM b WHERE {id_col} IN ({ids})
    ),
    scored AS (
        SELECT q.query_id, c.{id_col},
               CASE WHEN sqrt(c.dn) > 0 AND sqrt(q.qdn) > 0
                    THEN round({dot_arrs(f"c.{vec_col}", "q.qvec")}
                               / (sqrt(c.dn) * sqrt(q.qdn)), 6)
               END AS sim
        FROM b c JOIN q ON c.bucket = q.qbucket
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY sim DESC, {id_col}
        ) AS rn FROM scored
    )
    SELECT query_id, {id_col}, sim FROM ranked WHERE rn <= {k}
    """


def lsh_bucket_topk(
    vectors: DataFrame | None,
    query: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    bucketed: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: compare only vectors whose bucket matches the
    query's bucket. Recall is tunable via n_planes (fewer planes →
    bigger buckets → higher recall, more compute).

    ``bucketed``: a stored ``(id_col, vec_col, __bucket)`` table (the
    dedup-family ``signatures=`` seam) — corpus bucket signatures are
    corpus-static state, so serving from a prebuilt store skips the
    per-run n_planes × dim fold over every corpus row; the query side
    (tiny, broadcast) is always bucketed in-flight.  Bucketing is
    deterministic given (dim, n_planes), so stored ≡ inline."""
    if bucketed is None:
        if vectors is None:
            raise ValueError(
                "lsh_bucket_topk needs either `vectors` (inline "
                "bucketing) or `bucketed` (a prebuilt bucket store)"
            )
        bucketed = vectors.withColumn(
            "__bucket", lsh_bucket(F.col(vec_col), dim, n_planes)
        )
    q = F.broadcast(
        query.select(
            F.col(query_id_col).alias("__qid"),
            F.col(vec_col).alias("__qvec"),
            lsh_bucket(F.col(vec_col), dim, n_planes).alias("__qbucket"),
        )
    )
    scored = bucketed.join(q, F.col("__bucket") == F.col("__qbucket")).select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), F.col("__qvec")), 6).alias("sim"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
