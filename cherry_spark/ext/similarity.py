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


def brute_force_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact top-k neighbors for each query row.

    ``query`` is a (small) DataFrame of (query_id, embedding) —
    broadcast, so the corpus scan is one pass with no shuffle before
    the per-query top-k (window over query partition).
    """
    q = F.broadcast(
        query.select(
            F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
        )
    )
    sim = cosine_similarity(F.col(vec_col), F.col("__qvec"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = vectors.crossJoin(q).select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col),
        sim.alias("sim"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _hyperplane(plane_idx: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane: component d in [-0.5, 0.5)
    from xxhash64(plane_idx, d)."""
    return F.array(
        *[
            (F.pmod(F.xxhash64(F.lit(plane_idx), F.lit(d)), F.lit(10**6)) / 1e6 - 0.5)
            for d in range(dim)
        ]
    )


def lsh_bucket(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Random-hyperplane signature: bit p = sign(v · plane_p) packed
    into a long — the ANN bucket key."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        bit = F.when(dot(vec, _hyperplane(p, dim)) > 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket.bitwiseOR(F.shiftleft(bit.cast("long"), p))
    return bucket


def lsh_bucket_topk(
    vectors: DataFrame,
    query: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: compare only vectors whose bucket matches the
    query's bucket. Recall is tunable via n_planes (fewer planes →
    bigger buckets → higher recall, more compute)."""
    bucketed = vectors.withColumn("__bucket", lsh_bucket(F.col(vec_col), dim, n_planes))
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
