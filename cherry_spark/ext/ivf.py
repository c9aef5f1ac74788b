"""IVF (inverted-file) approximate nearest neighbor: coarse k-means
quantizer + probe-limited search — the other classic ANN scale path
next to hyperplane LSH (ext/similarity.py).

Fully deterministic (seed centroids are the lowest-id vectors, one
Lloyd refinement pass) and fully DataFrame-native:

- index: assign every vector to its nearest centroid — ONE column of
  cluster ids; at 100 TB you'd write the corpus partitioned by it;
- search: a query only scans the ``nprobe`` nearest clusters, i.e.
  nprobe/n_centroids of the corpus, via an equi-join on cluster id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cherry_spark.ext.similarity import cosine_similarity, dot, norm


def _avg_vector(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    out_col: str,
    order_col: str | None = None,
) -> DataFrame:
    """Element-wise mean of array vectors per group (posexplode ->
    per-dimension mean -> reassemble sorted).

    With ``order_col`` the per-dimension sum is an ``order_col``-sorted
    left fold instead of ``F.avg`` — bit-deterministic across runs,
    partitionings, AND engines (DuckDB's list_sum over an ORDER BY list
    performs the identical IEEE sequence), which is what lets
    ``ivf_topk_oracle_sql`` reproduce the centroids exactly. The fold
    collects one value per assigned vector per dimension into an agg
    buffer — fine for certification-scale corpora; at 100 TB pass
    ``order_col=None`` to keep the order-free streaming ``F.avg``
    (results differ only in double rounding order)."""
    if order_col is None:
        exploded = df.select(group_col, F.posexplode(vec_col).alias("pos", "v"))
        per_dim = exploded.groupBy(group_col, "pos").agg(F.avg("v").alias("v"))
    else:
        exploded = df.select(
            group_col, F.col(order_col).alias("__o"), F.posexplode(vec_col).alias("pos", "v")
        )
        ordered_vals = F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("__o").alias("o"), F.col("v").alias("v")))
            ),
            lambda s: s["v"].cast("double"),
        )
        per_dim = exploded.groupBy(group_col, "pos").agg(
            (
                F.aggregate(ordered_vals, F.lit(0.0), lambda acc, x: acc + x)
                / F.count(F.lit(1))
            ).alias("v")
        )
    return (
        per_dim.groupBy(group_col)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "v"))), lambda s: s["v"]
            ).alias(out_col)
        )
    )


def ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(centroid_id, centroid) — lowest-id seeds + one Lloyd pass."""
    w = Window.orderBy(id_col)
    seeds = (
        vectors.orderBy(id_col)
        .limit(n_centroids)
        .withColumn("centroid_id", F.row_number().over(w) - 1)
        .select("centroid_id", F.col(vec_col).alias("centroid"))
    )
    assigned = ivf_assign(vectors, seeds, id_col=id_col, vec_col=vec_col)
    joined = assigned.join(vectors, on=id_col).select("centroid_id", id_col, vec_col)
    # id-ordered fold -> centroids reproducible bit-for-bit by the
    # generated DuckDB oracle (ivf_topk_oracle_sql)
    return _avg_vector(joined, "centroid_id", vec_col, "centroid", order_col=id_col)


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid_id): nearest centroid by cosine — broadcast the
    (tiny) centroid table, per-row argmax via max_by."""
    # vector norm once per row instead of once per (row × centroid):
    # the dot/norm lambda folds are interpreted, so per-pair norms
    # triple the hot loop (same scalars — assignment is unchanged)
    cents = F.broadcast(centroids.withColumn("__cn", norm(F.col("centroid"))))
    na, nb = F.col("__vn"), F.col("__cn")
    sim = F.when(
        (na > 0) & (nb > 0), dot(F.col(vec_col), F.col("centroid")) / (na * nb)
    )
    scored = (
        vectors.withColumn("__vn", norm(F.col(vec_col)))
        .crossJoin(cents)
        .select(
            F.col(id_col),
            F.col("centroid_id"),
            F.coalesce(sim, F.lit(-2.0)).alias("__sim"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.max_by("centroid_id", F.struct(F.col("__sim"), -F.col("centroid_id"))).alias(
            "centroid_id"
        )
    )


def suggest_n_centroids(n_vectors: int) -> int:
    """The scale default for the coarse quantizer: ~sqrt(N), floored
    at 16 (r13 verdict item #3 codified).  sqrt(N) balances the two
    costs a probe-limited search pays — candidate volume per query is
    Σ of nprobe cluster sizes ≈ nprobe·N/C, and the quantizer argmax
    is C per query — so C ≈ sqrt(N·nprobe) minimizes their sum; at
    fixed small C the candidate term grows ~quadratically in N
    (N queries × N/C candidates), which is exactly the fixed-C
    100 TB failure mode the scale probes document."""
    import math

    return max(16, int(math.isqrt(max(0, int(n_vectors)))))


def ivf_build_index(
    vectors: DataFrame,
    index_dir: str,
    n_centroids: int | None = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    store_probes: int = 8,
) -> None:
    """Build the IVF index ONCE and persist it: the corpus is written
    partitioned by ``centroid_id`` (probing nprobe clusters then reads
    only those directories — partition pruning, the on-disk analogue of
    an inverted file) plus a tiny centroid table.

    ``n_centroids=None`` applies the ~sqrt(N) scale policy
    (:func:`suggest_n_centroids`, one count job); the literal default
    stays 16 because certified queries and their DuckDB oracles embed
    the centroid count in the oracle SQL — changing it re-derives the
    whole graph.

    ``store_probes`` (r14): persist each corpus vector's top-ranked
    probe centroids (ranks 1..store_probes) alongside the index,
    partitioned by rank.  The corpus-as-queries probe stage is the
    N×C term of the quantizer tradeoff — at the ~sqrt(N) scaled
    quantizer it is N^1.5 interpreted 64-dim folds PER RUN, which is
    exactly what kept the scaled quantizer slower than fixed-16 at
    10x; precomputing it once per corpus version moves that term into
    the build, where it belongs.  ``knn_graph(index_dir=...)`` serves
    probes from the table when it covers the requested nprobe, falls
    back to live scoring otherwise, and live-scores only the UNION
    GAP for vectors appended after the build; a ``_centroids_v``
    marker (the centroids version the table was ranked against)
    invalidates the whole table when a reseed supersedes the
    centroids.  Same expression both ways — stored ≡ live.

    Index build is a full corpus pass + write; search must NOT repeat
    it (the round-1 shape rebuilt centroids + assignment per query —
    a full corpus rewrite per lookup at scale).
    """
    import os

    from cherry_spark.writers import store

    if n_centroids is None:
        n_centroids = suggest_n_centroids(vectors.count())
    # centroids is referenced by the corpus assignment, the publish,
    # AND the probe table below — without materialization each
    # reference re-executes the full Lloyd build (the CLAUDE.md
    # index-op invariant)
    centroids = ivf_centroids(vectors, n_centroids, id_col, vec_col).localCheckpoint(
        eager=True
    )
    corpus = vectors.join(ivf_assign(vectors, centroids, id_col, vec_col), on=id_col)
    # co-locate each cluster into one write task -> one file per
    # partition dir instead of (tasks x clusters) small files; all
    # tables commit as pointer versions (writers/store.py, r13 —
    # crash-safe under object-store semantics), corpus first so a
    # half-built index can never look ready; probes last (optional
    # acceleration — a crash before its commit leaves a fully-usable
    # index that live-scores probes)
    vdir = store.stage_version_dir(f"{index_dir}/corpus")
    corpus.repartition("centroid_id").write.partitionBy("centroid_id").mode(
        "overwrite"
    ).parquet(vdir)
    try:
        store.commit_version(f"{index_dir}/corpus", vdir)
    except ValueError:
        # a concurrent builder of the same fingerprinted index won and
        # its sweep removed our staging — identical content, serve the
        # winner (the store.publish race-tolerance contract)
        if store.live_version(f"{index_dir}/corpus") is None:
            raise
    store.publish(centroids, f"{index_dir}/centroids")
    if store_probes and store_probes > 0:
        queries = vectors.select(
            F.col(id_col).alias("query_id"), F.col(vec_col)
        )
        ranks = _probe_rank_table(
            queries,
            centroids,
            min(int(store_probes), int(n_centroids)),
            vec_col,
            "query_id",
        ).select("query_id", "centroid_id", "proberank")
        pvdir = store.stage_version_dir(f"{index_dir}/probes")
        ranks.repartition("proberank").write.partitionBy("proberank").mode(
            "overwrite"
        ).parquet(pvdir)
        cv = store.live_version(f"{index_dir}/centroids") or ""
        with open(os.path.join(pvdir, "_centroids_v"), "w") as fh:
            fh.write(cv)
        try:
            store.commit_version(f"{index_dir}/probes", pvdir)
        except ValueError:
            if store.live_version(f"{index_dir}/probes") is None:
                raise


def ivf_index_exists(index_dir: str) -> bool:
    from cherry_spark.writers import store

    return store.ready(f"{index_dir}/centroids") and store.ready(
        f"{index_dir}/corpus"
    )


def ivf_search(
    spark,
    index_dir: str,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Probe-limited search against a PREBUILT index: rank centroids
    per query (broadcast of the tiny centroid table), then equi-join
    the partitioned corpus on centroid_id — the broadcast side drives
    dynamic partition pruning, so only nprobe/n_centroids of the
    corpus files are scanned."""
    from cherry_spark.writers import store

    centroids = spark.read.parquet(store.data_dir(f"{index_dir}/centroids"))
    corpus = spark.read.parquet(store.data_dir(f"{index_dir}/corpus"))
    q_probe = _probe_centroids(query, centroids, nprobe, vec_col, query_id_col)
    return _probe_scan_topk(corpus, q_probe, k, id_col, vec_col, query_id_col)


def _probe_centroids(
    query: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """nprobe nearest centroids per query row."""
    return _probe_rank_table(
        query, centroids, nprobe, vec_col, query_id_col
    ).select(query_id_col, "__qvec", "centroid_id")


def _probe_rank_table(
    query: DataFrame,
    centroids: DataFrame,
    max_rank: int,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """(query_id, __qvec, centroid_id, proberank ≤ max_rank): the
    ranked-probe relation both the per-run probe stage and the
    PERSISTED probes table (``ivf_build_index(store_probes=...)``)
    compute — one expression, so stored ≡ live bit-for-bit."""
    qsim = cosine_similarity(F.col(vec_col), F.col("centroid"))
    return (
        query.crossJoin(F.broadcast(centroids))
        .select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qvec"),
            "centroid_id",
            F.coalesce(qsim, F.lit(-2.0)).alias("__csim"),
        )
        .withColumn(
            "proberank",
            F.row_number().over(
                Window.partitionBy(query_id_col).orderBy(
                    F.col("__csim").desc(), F.col("centroid_id")
                )
            ),
        )
        .filter(F.col("proberank") <= max_rank)
        .select(query_id_col, "__qvec", "centroid_id", "proberank")
    )


def _probe_scan_topk(
    corpus: DataFrame,
    q_probe: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    probe = F.broadcast(q_probe.withColumn("__qn", norm(F.col("__qvec"))))
    na, nb = F.col("__vn"), F.col("__qn")
    sim = F.when(
        (na > 0) & (nb > 0), dot(F.col(vec_col), F.col("__qvec")) / (na * nb)
    )
    scored = (
        corpus.withColumn("__vn", norm(F.col(vec_col)))
        .join(probe, on="centroid_id")
        .select(F.col(query_id_col), F.col(id_col), F.round(sim, 6).alias("sim"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivf_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """One-shot build + probe-limited search (ad-hoc/testing path; any
    repeated-query workload should ivf_build_index once and ivf_search
    the prebuilt index instead)."""
    # two references below (corpus assign + query probe) — without
    # materialization each re-executes the full Lloyd build (the
    # CLAUDE.md index-op invariant)
    centroids = ivf_centroids(vectors, n_centroids, id_col, vec_col).localCheckpoint(
        eager=True
    )
    corpus = vectors.join(
        ivf_assign(vectors, centroids, id_col, vec_col), on=id_col
    )
    q_probe = _probe_centroids(query, centroids, nprobe, vec_col, query_id_col)
    return _probe_scan_topk(corpus, q_probe, k, id_col, vec_col, query_id_col)


def ivf_topk_oracle_sql(
    dim: int,
    n_centroids: int,
    nprobe: int,
    k: int,
    query_ids: list[int],
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB SQL recomputing ``ivf_topk``/``ivf_search`` EXACTLY —
    the same generated-oracle technique as
    ``similarity.lsh_topk_oracle_sql``.

    Why this is bit-exact even though the index is data-derived:

    - every dot/norm is an unrolled left-associated sum
      ``0.0 + a[1]*b[1] + ...`` — the identical IEEE sequence to
      Spark's ``F.aggregate`` fold (proven by the ann_lsh_topk
      certification);
    - the one aggregation of doubles — the Lloyd per-dimension mean —
      is an id-ordered left fold on BOTH sides (``_avg_vector`` with
      ``order_col``; ``list_sum(list(v ORDER BY id))`` here, verified
      equal to a Python left fold), then one double division by the
      count;
    - seed selection (lowest-id rank), both argmax assignments
      (max sim, tie -> lowest centroid_id, zero-norm -> -2.0 sentinel)
      and the probe/top-k windows are order-deterministic integer/
      double comparisons with identical tie-breaks.
    """

    def dot_ab(a: str, b: str, cast_b: bool) -> str:
        return _dot_ab_sql(a, b, dim, cast_b)

    ids = ", ".join(str(i) for i in query_ids)
    e = vec_col
    return f"""
    WITH {index_ctes_sql(dim, n_centroids, table, id_col, vec_col)},
    probe AS (
        SELECT query_id, centroid_id FROM (
            SELECT q.{id_col} AS query_id, c.centroid_id,
                   row_number() OVER (PARTITION BY q.{id_col} ORDER BY
                       (CASE WHEN sqrt(q.dn) > 0 AND sqrt(c.cdn) > 0
                             THEN {dot_ab(f"q.{e}", "c.centroid", False)}
                                  / (sqrt(q.dn) * sqrt(c.cdn))
                             ELSE -2.0 END) DESC, c.centroid_id) AS rn
            FROM v q CROSS JOIN cn c
            WHERE q.{id_col} IN ({ids})) WHERE rn <= {nprobe}
    ),
    scored AS (
        SELECT p.query_id, ve.{id_col},
               round(CASE WHEN sqrt(ve.dn) > 0 AND sqrt(q.dn) > 0
                          THEN {dot_ab(f"ve.{e}", f"q.{e}", True)}
                               / (sqrt(ve.dn) * sqrt(q.dn)) END, 6) AS sim
        FROM probe p
        JOIN assign1 a ON a.centroid_id = p.centroid_id
        JOIN v ve ON ve.{id_col} = a.{id_col}
        JOIN v q ON q.{id_col} = p.query_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY sim DESC, {id_col}
        ) AS rn FROM scored
    )
    SELECT query_id, {id_col}, sim FROM ranked WHERE rn <= {k}
    """


def _dot_ab_sql(a: str, b: str, dim: int, cast_b: bool) -> str:
    """Unrolled left-associated IEEE dot product — the identical fold
    sequence to Spark's ``F.aggregate``-based ``similarity.dot``."""
    bc = "::DOUBLE" if cast_b else ""
    terms = " + ".join(
        f"{a}[{i + 1}]::DOUBLE * {b}[{i + 1}]{bc}" for i in range(dim)
    )
    return f"(0.0 + {terms})"


def index_ctes_sql(
    dim: int,
    n_centroids: int,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """The WITH-clause body reproducing the deterministic IVF index in
    DuckDB: ``v`` (vectors + self-dot), ``seeds``/``a0``/``assign0``
    (seed assignment), ``lloyd``/``cent``/``cn`` (one id-ordered Lloyd
    pass), ``assign1`` (final nearest-centroid assignment). Shared by
    ``ivf_topk_oracle_sql`` and ``semdedup.semantic_dedup_oracle_sql``
    so every index-derived oracle certifies the same arithmetic."""

    def dot_ab(a: str, b: str, cast_b: bool) -> str:
        return _dot_ab_sql(a, b, dim, cast_b)

    e = vec_col
    return f"""v AS (
        SELECT {id_col}, {e}, {dot_ab(e, e, True)} AS dn FROM {table}
    ),
    seeds AS (
        SELECT row_number() OVER (ORDER BY {id_col}) - 1 AS centroid_id,
               {e} AS seed, dn AS sn
        FROM (SELECT * FROM v ORDER BY {id_col} LIMIT {n_centroids})
    ),
    a0 AS (
        SELECT v.{id_col}, s.centroid_id,
               CASE WHEN sqrt(v.dn) > 0 AND sqrt(s.sn) > 0
                    THEN {dot_ab(f"v.{e}", "s.seed", True)}
                         / (sqrt(v.dn) * sqrt(s.sn))
                    ELSE -2.0 END AS sim
        FROM v CROSS JOIN seeds s
    ),
    assign0 AS (
        SELECT {id_col}, centroid_id FROM (
            SELECT {id_col}, centroid_id,
                   row_number() OVER (PARTITION BY {id_col}
                                      ORDER BY sim DESC, centroid_id) AS rn
            FROM a0) WHERE rn = 1
    ),
    lloyd AS (
        SELECT a.centroid_id, r.i AS pos,
               list_sum(list(ve.{e}[r.i + 1]::DOUBLE ORDER BY ve.{id_col}))
                 / COUNT(*) AS c
        FROM assign0 a JOIN v ve USING ({id_col}),
             UNNEST(range({dim})) AS r(i)
        GROUP BY a.centroid_id, r.i
    ),
    cent AS (
        SELECT centroid_id, list(c ORDER BY pos) AS centroid
        FROM lloyd GROUP BY centroid_id
    ),
    cn AS (
        SELECT centroid_id, centroid,
               {dot_ab("centroid", "centroid", False)} AS cdn
        FROM cent
    ),
    a1 AS (
        SELECT v.{id_col}, c.centroid_id,
               CASE WHEN sqrt(v.dn) > 0 AND sqrt(c.cdn) > 0
                    THEN {dot_ab(f"v.{e}", "c.centroid", False)}
                         / (sqrt(v.dn) * sqrt(c.cdn))
                    ELSE -2.0 END AS sim
        FROM v CROSS JOIN cn c
    ),
    assign1 AS (
        SELECT {id_col}, centroid_id FROM (
            SELECT {id_col}, centroid_id,
                   row_number() OVER (PARTITION BY {id_col}
                                      ORDER BY sim DESC, centroid_id) AS rn
            FROM a1) WHERE rn = 1
    )"""


def knn_graph(
    vectors: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_dir: str | None = None,
    method: str = "numpy",
    pad: int | None = None,
    probe_salt: int = 1,
    centroid_blocks: int | None = None,
) -> DataFrame:
    """Corpus-wide approximate k-NN GRAPH: every vector's k nearest
    neighbors (self excluded) through the IVF index — the artifact
    semantic-clustering, graph-based dedup diagnostics, and
    hubness/quality audits consume.

    Scale shape: the query side IS the corpus, so unlike ivf_search
    (tiny broadcast query set) the candidate join is a plain SHUFFLE
    equi-join on centroid_id — both sides corpus-scale, cost
    Σ |cluster|·nprobe-degree, never N². The per-query top-k window is
    bounded by the probed cluster sizes; on a skewed embedding space
    apply the SemDeDup max_cluster_size guard upstream first.
    ``index_dir`` serves centroids + assigned corpus from a prebuilt
    ivf_build_index store (the repeated-run path — identical output,
    the index is deterministic); inline build otherwise.  In EVERY
    lane the query set is ``vectors`` (r15, advice item: the stored-
    probes lane used to run corpus-as-queries, silently changing the
    query set when a caller passed a filtered ``vectors`` with
    index_dir): stored centroid ranks are served BY ID via a semi-join
    to ``vectors``' ids, and ids absent from the stored table (rows
    appended after the build, or not in the index at all) are
    live-scored against the index centroids.  Candidates always come
    from the index corpus when index_dir is given.  CONTRACT: an id
    is the identity of an IMMUTABLE vector — the whole index layout
    assumes it (the corpus table stores the vector values an id had
    at build/append time, so re-embedding under the same ids makes
    the stored CANDIDATES stale in every lane, not just the probe
    ranks); to re-embed, rebuild the index (the reseed path — the
    ``_centroids_v`` marker then invalidates the probes table too).
    Returns (query_id, id_col, sim) — round(cosine, 6).

    ``method`` picks the candidate-scoring lane (r9, verdict item #4):

    - ``"numpy"`` (default): the Σ|cluster|·nprobe pair scoring runs as
      a cogrouped ``applyInPandas`` per CENTROID BLOCK (centroids hash
      into ≤ ``centroid_blocks`` groups, r14 — per-group Arrow/pandas
      overhead no longer scales with n_centroids, so the ~sqrt(N)
      scaled quantizer pays the same fixed cost as the 16-centroid
      fixture).  ``centroid_blocks=None`` (default) applies the
      measured policy ``min(64, max(32, n_centroids // 8))`` —
      identical to the r14 fixed 32 for every C ≤ 256 (all certified
      paths), widening to 64 for large quantizers where block WIDTH
      (C/blocks packed centroids per block, masked-BLAS waste ∝
      width) starts to cost more than the extra per-group overhead.
      Basis: the r15 large-C grid on the 10x corpus run in BOTH
      within-C cell orders (SCALE10_probe.json ``knn_graph_largeC``
      forward + ``_reversed`` — a single order measures its own JVM
      warmth; the forward-only read picked b64 at C=160 purely from
      ordering bias): b64 wins at C=512 in both orders (2.65/2.56 s
      vs b32's 2.99/3.45) and on average at C=1024 (≈3.5 vs ≈3.7),
      b128 never wins, b32 ≈ b64 within noise at C=160, and there is
      no adverse blowup anywhere (best-block warm grows ≈2.3→3.5 s
      for 6.4× C) — one Arrow batch per block, one BLAS matmul for the
      probed-masked block×probe similarity, per-query top-(k+pad)
      selection inside the batch. The selected ≤ nprobe·(k+pad)
      candidates per query leave the batch WITH their exact similarity
      (r16, §4): a strictly-sequential per-dimension accumulation
      (``_seq_dot``) reproduces the CERTIFIED fold's IEEE operation
      sequence bit-for-bit, so the JVM side is only round(·,6) and the
      (round(sim,6) DESC, id) rank — the former rerank joins
      (cand⋈corpus⋈queries) and the interpreted per-pair 64-dim HOF
      fold are gone from this lane (bit-identity pinned by
      test_ivf.py::test_seq_dot_bit_identical_to_jvm_fold and the
      numpy≡fold graph tests). Output identity argument: global top-k
      under a total order is contained in the per-cluster top-k, so
      equality holds whenever each per-cluster numpy top-(k+pad) by
      ROUNDED proxy — round(matmul cosine, 6), ties broken by id via a
      stable sort over id-sorted rows, i.e. the SAME (round(sim,6)
      DESC, id ASC) basis the certified rank uses — covers the
      per-cluster top-k by rounded fold cosine; the two roundings
      differ only when IEEE summation order (≲1e-13) straddles a
      0.5e-6 bucket edge, so a miss needs ``pad`` such edge pairs in
      one cluster — the bound is probabilistic, not structural, so
      ``pad`` defaults to ``max(8, k)`` (r10, per the r9 advice): a
      caller raising k keeps the absorption margin proportional to
      the number of same-bucket edge ties that must pile up in ONE
      cluster before a true neighbor could drop. (Selecting on the RAW proxy would be wrong, not
      just riskier: sub-1e-6 spreads inside one rounding bucket can
      reorder against the id tie-break — caught by review r9, fixed,
      regression-tested on a same-bucket anticorrelated-id fixture.)
      Differentially asserted equal to the fold lane in tests at
      multiple SFs and on an adversarial duplicate-heavy fixture.  The interpreted 64-dim fold was the
      dominant cost of the fold lane (sf0.1: 5.9 s warm — candidate
      volume × HOF fold); the matmul lane removes it from the
      per-pair path entirely.
    - ``"fold"``: the original all-pairs JVM expression lane (also the
      automatic fallback when numpy/pandas are unavailable).
    """
    if centroid_blocks is None:
        # measured large-C policy (r15; SCALE10_probe knn_graph_largeC,
        # both cell orders): == the r14 fixed 32 for every C <= 256,
        # 64 past that (b128 never won a cell) — resolved from the
        # n_centroids ARGUMENT (callers serving an index built with a
        # different C should pass blocks explicitly)
        centroid_blocks = min(64, max(32, n_centroids // 8))
    if index_dir is not None:
        from cherry_spark.writers import store

        spark = vectors.sparkSession
        centroids = spark.read.parquet(store.data_dir(f"{index_dir}/centroids"))
        corpus = spark.read.parquet(store.data_dir(f"{index_dir}/corpus")).select(
            id_col, vec_col, "centroid_id"
        )
        stored_probe = _stored_probes(
            spark, index_dir, vectors, nprobe, id_col, vec_col
        )
        if stored_probe is not None:
            q_probe, uncovered = stored_probe
            if uncovered is not None:
                q_probe = q_probe.unionByName(
                    _probe_centroids(
                        uncovered, centroids, nprobe, vec_col, "query_id"
                    )
                )
            return _knn_from_probe(
                corpus,
                q_probe,
                k,
                id_col,
                vec_col,
                method,
                pad,
                probe_salt,
                centroid_blocks,
            )
    else:
        # centroids (n_centroids rows) is referenced by BOTH the corpus
        # assignment and the query probe below; without materialization
        # each reference re-executes the full Lloyd build — including
        # its own corpus-wide assign crossJoin (the CLAUDE.md index-op
        # invariant).
        centroids = ivf_centroids(
            vectors, n_centroids, id_col, vec_col
        ).localCheckpoint(eager=True)
        assigned = ivf_assign(vectors, centroids, id_col, vec_col)
        corpus = vectors.join(assigned, on=id_col).select(
            id_col, vec_col, "centroid_id"
        )
    queries = vectors.select(F.col(id_col).alias("query_id"), F.col(vec_col))
    # q_probe: (query_id, __qvec, centroid_id) — corpus-sized x nprobe;
    # deliberately NOT broadcast below
    q_probe = _probe_centroids(queries, centroids, nprobe, vec_col, "query_id")
    return _knn_from_probe(
        corpus, q_probe, k, id_col, vec_col, method, pad,
        probe_salt, centroid_blocks,
    )


def probes_meta(index_dir: str) -> tuple[str, int] | None:
    """(live probes data dir, max stored rank) when the persisted
    ``probes`` table is USABLE — committed, and ranked against the
    LIVE centroids version (the ``_centroids_v`` marker: a reseed
    supersedes the centroids and silently invalidates the table) —
    else None.  Rank partitions are listed, never read."""
    import os

    from cherry_spark.writers import fs, store

    root = f"{index_dir}/probes"
    if not store.ready(root):
        return None
    pdir = store.data_dir(root)
    try:
        with open(os.path.join(pdir, "_centroids_v")) as fh:
            built_against = fh.read().strip()
    except OSError:
        return None
    if built_against != (store.live_version(f"{index_dir}/centroids") or ""):
        return None
    ranks = [
        int(d.split("=", 1)[1])
        for d in fs.list_dir(pdir)
        if d.startswith("proberank=")
    ]
    if not ranks:
        return None
    return pdir, max(ranks)


def _stored_probes(
    spark,
    index_dir: str,
    queries: DataFrame,
    nprobe: int,
    id_col: str,
    vec_col: str,
):
    """Serve the probe relation for ``queries`` (the caller's
    ``vectors``, NOT corpus-as-queries; r15 advice item) from the
    persisted ``probes`` table when :func:`probes_meta` deems it
    usable and it covers the requested ``nprobe``.  Stored centroid
    ranks are keyed by id: the inner join below restricts the stored
    table to the query ids AND takes the query vector values from
    ``queries`` itself, so a filtered query set gets exactly its own
    rows.  Assumes the knn_graph id-immutability contract: an id
    present in the stored table is served the ranks computed at
    build time (a caller passing CHANGED vectors under existing ids
    is out of contract in every index lane — the stored corpus
    candidates would be stale too; rebuild instead).
    Returns ``(covered_q_probe, uncovered_queries)`` — the
    caller live-scores only the uncovered gap (ids absent from the
    stored table: appended after the build or foreign to the index) —
    or None for a full live fallback."""
    import os

    meta = probes_meta(index_dir)
    if meta is None:
        return None
    pdir, max_rank = meta
    if max_rank < nprobe:
        return None
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col))
    stored = spark.read.parquet(pdir).filter(F.col("proberank") <= nprobe)
    qvecs = q.select("query_id", F.col(vec_col).alias("__qvec"))
    covered = stored.join(qvecs, on="query_id").select(
        "query_id", "__qvec", "centroid_id"
    )
    # coverage key set = the rank-1 rows (exactly one per covered id)
    uncovered = q.join(
        spark.read.parquet(os.path.join(pdir, "proberank=1")).select(
            "query_id"
        ),
        on="query_id",
        how="left_anti",
    )
    return covered, uncovered


def _knn_from_probe(
    corpus: DataFrame,
    q_probe: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    method: str,
    pad: int | None,
    probe_salt: int,
    centroid_blocks: int,
) -> DataFrame:
    """The knn_graph tail shared by the live-probe and stored-probe
    paths: candidate generation + exact ranking.  Query vectors ride
    ``q_probe.__qvec``, which every probe builder takes from the
    CALLER's query set, never the corpus (r15: refetching from the
    corpus silently dropped foreign query ids in the numpy lane while
    the fold lane kept them — _stored_probes joins the caller's
    vectors by id for exactly this reason)."""
    if method == "numpy":
        try:
            import numpy  # noqa: F401
            import pandas  # noqa: F401
        except ImportError:  # pragma: no cover - both baked into the env
            method = "fold"
    if method == "numpy":
        eff_pad = max(8, k) if pad is None else pad
        cand = _knn_candidates_numpy(
            corpus,
            q_probe,
            k + eff_pad,
            id_col,
            vec_col,
            probe_salt,
            centroid_blocks,
        )
        # r16 (§4): the exact fold cosine now rides OUT of the numpy
        # block (bit-identical sequential fold — see _seq_dot), so the
        # rerank is round(·,6) + the certified (sim DESC, id) window
        # over ≤ nprobe·(k+pad) rows per query — the cand⋈corpus⋈
        # queries joins and the interpreted per-pair 64-dim HOF fold
        # of _exact_rerank are gone from this lane.
        scored = cand.select(
            "query_id",
            F.col("__cand").alias(id_col),
            F.when(F.col("__simtier") == 0, F.round(F.col("__sim"), 6))
            .when(F.col("__simtier") == 2, F.lit(float("nan")))
            .alias("sim"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col(id_col)
        )
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
    corpus = corpus.withColumn("__vn", norm(F.col(vec_col)))
    q_probe = q_probe.withColumn("__qn", norm(F.col("__qvec")))
    # Repartition BOTH join inputs on the join key: the sortless
    # exchange is the materialization point for the __vn/__qn norm
    # projections — left lazy, Catalyst collapses them into the join
    # output and the 64-dim norm folds re-evaluate per candidate PAIR
    # instead of per row (the CLAUDE.md exchanges-not-projections
    # invariant). It also pre-co-partitions the Σ|cluster|·nprobe join.
    # Measured on the 10x clone probe (20k vectors, 64 centroids):
    # 128 s bare -> 34 s localCheckpoint -> 12 s with this barrier.
    corpus = corpus.repartition("centroid_id")
    q_probe = q_probe.repartition("centroid_id")
    na, nb = F.col("__vn"), F.col("__qn")
    sim = F.when(
        (na > 0) & (nb > 0), dot(F.col(vec_col), F.col("__qvec")) / (na * nb)
    )
    scored = (
        corpus.join(q_probe, on="centroid_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(F.col("query_id"), F.col(id_col), F.round(sim, 6).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _seq_dot(a, b):
    """Σ aᵢ·bᵢ accumulated STRICTLY left-to-right per row — the exact
    IEEE operation sequence of the JVM ``similarity.dot`` fold
    ``(((0.0 + a₁·b₁) + a₂·b₂) + …)``.  numpy's ``(a*b).sum(axis=-1)``
    and BLAS matmuls use pairwise/blocked summation, which differs in
    the last ulps; this loop multiplies then adds dimension by
    dimension (separate IEEE ops, no FMA), so the result is
    bit-identical to the certified fold and the unrolled DuckDB
    oracles.  Vectorized ACROSS rows, sequential across dims: 64
    adds for the whole batch, not per pair.  Inputs float64 2-D."""
    import numpy as np

    acc = np.zeros(a.shape[:-1], dtype=np.float64)
    for j in range(a.shape[-1]):
        acc += a[..., j] * b[..., j]
    return acc


def _knn_candidates_numpy(
    corpus: DataFrame,
    q_probe: DataFrame,
    k_buf: int,
    id_col: str,
    vec_col: str,
    probe_salt: int = 1,
    centroid_blocks: int = 32,
) -> DataFrame:
    """Per-query top-``k_buf`` candidate pairs via one float64 matmul
    per CENTROID-BLOCK Arrow batch.

    Blocking (r13 verdict item #3): cogrouping per centroid_id makes
    the group count — and its fixed Arrow/pandas per-group overhead —
    scale with ``n_centroids``, which made the scaled-C quantizer (the
    bounded-candidate 100 TB contract) slower than fixed-C at every
    measurable scale.  Centroids now hash into at most
    ``centroid_blocks`` groups, so a 160- or 1600-centroid quantizer
    pays the same per-group overhead as a 16-centroid one; inside a
    block, ONE matmul scores all (member × probing query) pairs and a
    boolean mask confines scoring to pairs whose cluster the query
    actually probed (an unmasked block matmul would smuggle in
    non-probed pairs the DuckDB oracle excludes).

    Selection basis unchanged, lifted from per-cluster to per-(query,
    block): the proxy is rounded to the 1e-6 grid (the certified
    rank's basis), rows pre-sorted by corpus id, then a STABLE argsort
    on the descending rounded proxy — same bucket, same tie-break as
    the certified (round(sim,6) DESC, id ASC) rank.  Coverage argument
    strengthens: any global-top-k pair in block b outranks < k pairs
    within b's pool (a subset of the query's probed pool), so the
    per-block top-(k_buf) take contains the global top-k whenever the
    per-cluster take did.  Zero-norm rows score -inf within their
    probed mask (ranked last, mirroring the fold lane's NULLS LAST);
    self-pairs are dropped after selection exactly like the fold
    lane's pre-rank filter.

    Memory per task: a block holds Σ|cluster in block| members × the
    queries probing it.  ``probe_salt > 1`` splits each block's probes
    into that many groups (queries are partitioned by salt, so
    per-query selection is unchanged) at the cost of replicating the
    block members per salt.  Size both so the float64 block fits an
    executor."""
    import pandas as pd

    from pyspark.sql.types import StructField, StructType

    from pyspark.sql.types import ByteType, DoubleType

    id_type = corpus.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("query_id", id_type),
            StructField("__cand", id_type),
            # exact fold cosine for the selected pair (r16): computed
            # here with the bit-identical sequential fold (_seq_dot) so
            # the JVM tail is round+rank only — no per-pair interpreted
            # 64-dim HOF fold, no cand⋈corpus⋈queries rerank joins.
            # __simtier disambiguates what the float column cannot
            # carry across Arrow (from_pandas masks NaN to null):
            # 0 = real value in __sim, 1 = zero-norm NULL (fold lane
            # ranks it LAST), 2 = NaN sim (fold lane ranks it FIRST —
            # Spark's double order puts NaN above every value).
            StructField("__sim", DoubleType()),
            StructField("__simtier", ByteType()),
        ]
    )

    blocks = max(1, int(centroid_blocks))
    # centroid ids are DENSE 0..C-1 (row_number seeds), so modulo is
    # collision-free while C <= blocks (each block = one centroid —
    # bit-identical grouping to the pre-blocking lane for the fixture
    # shapes) and perfectly balanced beyond it; a hash here would
    # collide big clusters into one block even at C=16, paying masked
    # matmul FLOPs for nothing
    cblock = F.pmod(F.col("centroid_id").cast("long"), F.lit(blocks)).cast(
        "int"
    )
    left = corpus.select(
        "centroid_id",
        F.col(id_col).alias("__cid"),
        F.col(vec_col).alias("__cvec"),
        cblock.alias("__cblock"),
    )
    right = q_probe.select(
        "centroid_id", "query_id", "__qvec", cblock.alias("__cblock")
    )
    group_keys = ["__cblock"]
    if probe_salt > 1:
        group_keys = ["__cblock", "__psalt"]
        right = right.withColumn(
            "__psalt",
            F.pmod(F.xxhash64("query_id"), F.lit(int(probe_salt))).cast("int"),
        )
        left = left.select(
            "*",
            F.explode(
                F.sequence(F.lit(0), F.lit(int(probe_salt) - 1))
            ).alias("__psalt"),
        )

    def score_block(lpdf: "pd.DataFrame", rpdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        if lpdf.empty or rpdf.empty:
            # dtypes derived from the (schema-typed, possibly empty)
            # cogroup frames — a hardcoded int64 empty frame fails the
            # Arrow conversion for string ids (review r9), and empty
            # right sides are ROUTINE under probe_salt (every salt
            # exists on the replicated left)
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=rpdf["query_id"].dtype),
                    "__cand": pd.Series([], dtype=lpdf["__cid"].dtype),
                    "__sim": pd.Series([], dtype="float64"),
                    "__simtier": pd.Series([], dtype="int8"),
                }
            )
        lpdf = lpdf.sort_values("__cid", kind="mergesort")
        # one column per UNIQUE probing query; the probed-pair mask
        # comes from the (query, centroid) probe rows
        qcodes, quniq = pd.factorize(rpdf["query_id"])
        first_idx = np.unique(qcodes, return_index=True)[1]
        A = np.asarray(lpdf["__cvec"].tolist(), dtype=np.float64)
        B = np.asarray(
            rpdf["__qvec"].iloc[first_idx].tolist(), dtype=np.float64
        )
        uc, member_c = np.unique(
            lpdf["centroid_id"].to_numpy(), return_inverse=True
        )
        probe_c = np.searchsorted(uc, rpdf["centroid_id"].to_numpy())
        probe_c_safe = np.minimum(probe_c, len(uc) - 1)
        valid = uc[probe_c_safe] == rpdf["centroid_id"].to_numpy()
        probed = np.zeros((len(uc), len(quniq)), dtype=bool)
        probed[probe_c_safe[valid], qcodes[valid]] = True
        mask = probed[member_c, :]  # n × m: query probed member's cluster
        an = np.sqrt((A * A).sum(axis=1))
        bn = np.sqrt((B * B).sum(axis=1))
        denom = np.outer(an, bn)
        with np.errstate(divide="ignore", invalid="ignore"):
            # probed zero-norm pairs score -2.0 (below any cosine,
            # ABOVE the masked tier): they are legitimate candidates
            # the fold lane ranks NULLS-LAST, so masked -inf rows must
            # never displace them out of the take
            P = np.where(
                mask & (denom > 0),
                (A @ B.T) / np.where(denom > 0, denom, 1.0),
                np.where(mask, -2.0, -np.inf),
            )
        # select on the SAME basis the certified rank orders by —
        # round(sim, 6) DESC, id ASC. Ranking the raw proxy instead
        # would let near-but-not-equal sims inside one rounding bucket
        # (up to 1e-6 apart) reorder against the id tie-break and push
        # the true top-k out of the top-k_buf selection; rounding
        # first shrinks the numpy-vs-JVM divergence window to float
        # noise at bucket edges (~1e-13), which the pad absorbs.
        # HALF-UP like Spark's F.round — np.round is half-to-EVEN and
        # buckets exact midpoints one grid step lower (review r9:
        # np.round(0.8500005, 6) == 0.850000, JVM -> 0.850001). All
        # in-place: the block is the lane's dominant allocation.
        # (-inf survives: sign -1, |.|*1e6+0.5 = inf, floor inf.)
        S = np.sign(P)
        np.abs(P, out=P)
        np.multiply(P, 1e6, out=P)
        np.add(P, 0.5, out=P)
        np.floor(P, out=P)
        np.multiply(P, 1e-6, out=P)
        np.multiply(P, S, out=P)
        cids = lpdf["__cid"].to_numpy()
        qids = quniq.to_numpy() if hasattr(quniq, "to_numpy") else np.asarray(quniq)
        # stable sort over id-sorted rows: descending proxy, id tiebreak
        order = np.argsort(-P, axis=0, kind="stable")
        take = min(k_buf + 1, len(cids))  # +1 absorbs the self row
        sel = order[:take, :]  # take × m candidate row indices
        m_idx = np.broadcast_to(np.arange(P.shape[1]), sel.shape)
        q_rep = np.broadcast_to(qids, sel.shape)
        c_sel = cids[sel]
        # masked (non-probed) pairs must never surface as candidates —
        # the exact rerank would score them for real and admit pairs
        # the probe semantics (and the oracle) exclude
        keep = (c_sel != q_rep) & mask[sel, m_idx]
        # exact fold cosine for the kept pairs (r16): sequential
        # accumulation (_seq_dot) is bit-identical to the certified
        # JVM fold, so round(·,6)+rank downstream produce the same
        # rows the _exact_rerank join lane did.  Norms are per-ROW
        # sequential folds (n+m of them), the pair dots are one
        # 64-step vectorized loop over the ≤ take·m kept pairs.
        pr = sel[keep]
        pq = m_idx[keep]
        an_x = np.sqrt(_seq_dot(A, A))
        bn_x = np.sqrt(_seq_dot(B, B))
        d_x = _seq_dot(A[pr], B[pq])
        na, nb2 = an_x[pr], bn_x[pq]
        # Spark's `norm > 0` uses the SQL double order where NaN sorts
        # ABOVE every value, so a NaN norm passes the guard and the
        # sim propagates NaN (ranked FIRST); only a true zero norm
        # yields NULL (ranked LAST).  Replicate both tiers.
        ok = (np.isnan(na) | (na > 0)) & (np.isnan(nb2) | (nb2 > 0))
        with np.errstate(divide="ignore", invalid="ignore"):
            sim_x = np.where(ok, d_x / np.where(ok, na * nb2, 1.0), np.nan)
        tier = np.where(~ok, 1, np.where(np.isnan(sim_x), 2, 0)).astype(
            "int8"
        )
        return pd.DataFrame(
            {
                "query_id": q_rep[keep],
                "__cand": c_sel[keep],
                "__sim": np.where(tier == 0, sim_x, 0.0),
                "__simtier": tier,
            }
        )

    return (
        left.groupBy(*group_keys)
        .cogroup(right.groupBy(*group_keys))
        .applyInPandas(score_block, schema=out_schema)
    )


def knn_graph_oracle_sql(
    dim: int,
    n_centroids: int,
    nprobe: int,
    k: int,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`knn_graph` — ``ivf_topk_oracle_sql`` with
    the corpus as the query set and self-matches excluded before the
    rank (same bit-exactness argument)."""

    def dot_ab(a: str, b: str, cast_b: bool) -> str:
        return _dot_ab_sql(a, b, dim, cast_b)

    e = vec_col
    return f"""
    WITH {index_ctes_sql(dim, n_centroids, table, id_col, vec_col)},
    probe AS (
        SELECT query_id, centroid_id FROM (
            SELECT q.{id_col} AS query_id, c.centroid_id,
                   row_number() OVER (PARTITION BY q.{id_col} ORDER BY
                       (CASE WHEN sqrt(q.dn) > 0 AND sqrt(c.cdn) > 0
                             THEN {dot_ab(f"q.{e}", "c.centroid", False)}
                                  / (sqrt(q.dn) * sqrt(c.cdn))
                             ELSE -2.0 END) DESC, c.centroid_id) AS rn
            FROM v q CROSS JOIN cn c) WHERE rn <= {nprobe}
    ),
    scored AS (
        SELECT p.query_id, ve.{id_col},
               round(CASE WHEN sqrt(ve.dn) > 0 AND sqrt(q.dn) > 0
                          THEN {dot_ab(f"ve.{e}", f"q.{e}", True)}
                               / (sqrt(ve.dn) * sqrt(q.dn)) END, 6) AS sim
        FROM probe p
        JOIN assign1 a ON a.centroid_id = p.centroid_id
        JOIN v ve ON ve.{id_col} = a.{id_col}
        JOIN v q ON q.{id_col} = p.query_id
        WHERE ve.{id_col} <> p.query_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY sim DESC, {id_col}
        ) AS rn FROM scored
    )
    SELECT query_id, {id_col}, sim FROM ranked WHERE rn <= {k}
    """
