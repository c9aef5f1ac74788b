"""IVF ANN: determinism, self-retrieval, recall vs brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_spark.writers.store import data_dir as dd

from cherry_spark.ext.ivf import ivf_assign, ivf_centroids, ivf_topk
from cherry_spark.ext.similarity import brute_force_topk


def test_ivf_centroids_deterministic(spark, sf_dir):
    from cherry_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    c1 = {r["centroid_id"]: r["centroid"] for r in ivf_centroids(emb, 8).collect()}
    c2 = {r["centroid_id"]: r["centroid"] for r in ivf_centroids(emb, 8).collect()}
    assert c1.keys() == c2.keys() and len(c1) == 8
    for cid in c1:
        assert c1[cid] == c2[cid]


def test_ivf_assign_covers_all(spark, sf_dir):
    from cherry_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_centroids(emb, 8)
    assigned = ivf_assign(emb, cents)
    assert assigned.count() == emb.count()
    assert assigned.select("centroid_id").distinct().count() > 1


def test_ivf_prebuilt_index_reuse(spark, sf_dir, tmp_path):
    """ivf_search against a prebuilt on-disk index returns the same
    result as the one-shot path and does NOT rewrite the index."""
    import os

    from cherry_spark.ext.ivf import ivf_build_index, ivf_index_exists, ivf_search
    from cherry_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf")
    assert not ivf_index_exists(idx)
    ivf_build_index(emb, idx, n_centroids=8)
    assert ivf_index_exists(idx)

    q = emb.filter(F.col("vec_id").isin(0, 7)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    one_shot = {
        (r["query_id"], r["vec_id"], r["sim"])
        for r in ivf_topk(emb, q, k=5, n_centroids=8, nprobe=4).collect()
    }
    marker = os.path.getmtime(os.path.join(dd(f"{idx}/corpus"), "_SUCCESS"))
    for _ in range(2):  # search twice — index must not be rebuilt
        searched = {
            (r["query_id"], r["vec_id"], r["sim"])
            for r in ivf_search(spark, idx, q, k=5, nprobe=4).collect()
        }
        assert searched == one_shot
    assert os.path.getmtime(os.path.join(dd(f"{idx}/corpus"), "_SUCCESS")) == marker


def test_ivf_topk_recall(spark, sf_dir):
    from cherry_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 7, 42]
    q = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    exact = brute_force_topk(emb, q, k=5)
    approx = ivf_topk(emb, q, k=5, n_centroids=8, nprobe=4)

    for qid in qids:
        a_ids = {r["vec_id"] for r in approx.filter(F.col("query_id") == qid).collect()}
        e_ids = {r["vec_id"] for r in exact.filter(F.col("query_id") == qid).collect()}
        # probing half the clusters: the query's own vector must be found
        # and recall should be substantial
        assert qid in a_ids
        assert len(a_ids & e_ids) >= 2, f"recall too low for query {qid}"


def test_semantic_dedup_flags_planted_clone(spark):
    """SemDeDup verdicts: an exact clone of a lower-id vector is a
    duplicate, distinct directions survive, zero-norm vectors never
    match anything, and every input row comes back exactly once."""
    from cherry_spark.ext.semdedup import semantic_dedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),  # exact clone of 0 -> dup
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.97, 0.243, 0.0, 0.0]),  # cos to v0 = 0.97 -> dup at 0.9
        (4, [0.0, 0.0, 0.0, 0.0]),  # zero norm: NULL sim, never dup
        (5, [-1.0, 0.0, 0.0, 0.0]),  # opposite direction, never dup
    ]
    vec = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        r["vec_id"]: (r["centroid_id"], r["is_dup"])
        for r in semantic_dedup(vec, threshold=0.9, n_centroids=2).collect()
    }
    assert set(out) == {0, 1, 2, 3, 4, 5}
    assert out[1][1] == 1
    assert out[3][1] == 1
    assert out[0][1] == 0
    assert out[4][1] == 0
    assert out[5][1] == 0
    # clone must share its original's cluster (identical assignment)
    assert out[1][0] == out[0][0]


def test_mmr_diversifies_redundant_candidates(spark):
    """Pure top-2 would pick the two near-identical vectors; MMR's
    redundancy penalty must pick the diverse one second."""
    from cherry_spark.ext.mmr import mmr_topk

    # rank-1 pick is OFF the query axis, so the redundant twin's
    # penalty (~1.0) far exceeds its relevance while the mirrored
    # candidate's penalty (~0.61) stays well below its relevance
    rows = [
        (10, [0.9, 0.436]),    # relevance ~0.900 -> rank 1
        (11, [0.9, 0.44]),     # relevance ~0.898, sim to 10 ~1.0
        (12, [0.89, -0.44]),   # relevance ~0.896, sim to 10 ~0.61
    ]
    vec = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = spark.createDataFrame([(0, [1.0, 0.0])], ["query_id", "embedding"])
    out = {
        r["rank"]: r["vec_id"]
        for r in mmr_topk(vec, q, k=3, n_candidates=3, lam=0.5).collect()
    }
    assert out[1] == 10          # most relevant first
    assert out[2] == 12          # diverse beats the redundant twin
    assert out[3] == 11


def test_semantic_dedup_prebuilt_assignment(spark, sf_dir, tmp_path):
    """The 100 TB path: verdicts from a persisted ivf_build_index
    assignment must equal the inline-build verdicts."""
    from cherry_spark.ext.ivf import ivf_build_index
    from cherry_spark.ext.semdedup import semantic_dedup
    from cherry_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf")
    ivf_build_index(emb, idx, n_centroids=8)
    prebuilt = spark.read.parquet(dd(f"{idx}/corpus")).select("vec_id", "centroid_id")

    inline = {
        (r["vec_id"], r["centroid_id"], r["is_dup"])
        for r in semantic_dedup(emb, threshold=0.3, n_centroids=8).collect()
    }
    reused = {
        (r["vec_id"], r["centroid_id"], r["is_dup"])
        for r in semantic_dedup(
            emb, threshold=0.3, n_centroids=8, assigned=prebuilt
        ).collect()
    }
    assert inline == reused


def test_semantic_dedup_degenerate_cluster_cap(spark):
    """An all-identical-embedding corpus collapses into ONE centroid;
    with max_cluster_size set the quadratic key is count-filtered out
    before either self-join side, every member comes back with
    is_dup=0 (kept, not dropped), and the monitor accounts for the
    skipped pair volume. A small healthy cluster alongside still
    dedups normally."""
    from cherry_spark.ext.semdedup import semantic_dedup, semdedup_cluster_stats

    # ids 0 and 1 are the deterministic seeds — keep them DISTINCT so
    # the two centroids differ; the clone class fills cluster B
    n_clone = 400
    rows = [(0, [0.0, 1.0, 0.0, 0.0])]          # cluster A seed
    rows += [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(1, n_clone + 1)]
    rows.append((1000, [0.0, 1.0, 0.0, 0.0]))   # clone of 0 in cluster A
    vec = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        r["vec_id"]: r["is_dup"]
        for r in semantic_dedup(
            vec, threshold=0.9, n_centroids=2, max_cluster_size=100
        ).collect()
    }
    assert len(out) == n_clone + 2  # every row returned exactly once
    assert all(out[i] == 0 for i in range(1, n_clone + 1))  # capped: kept
    assert out[0] == 0 and out[1000] == 1  # healthy cluster dedups

    stats = semdedup_cluster_stats(
        vec, n_centroids=2, max_cluster_size=100
    ).collect()[0]
    assert stats["n_capped"] == 1
    assert stats["docs_in_capped"] == n_clone
    assert stats["pairs_dropped"] == n_clone * (n_clone - 1) // 2
    assert stats["pairs_kept"] == 1


def test_knn_graph_planted_neighbors(spark):
    from cherry_spark.ext.ivf import knn_graph

    # 3 tight clusters of 3 + an orthogonal loner; within-cluster
    # vectors are each other's nearest neighbors
    rows = []
    base = {0: [1.0, 0.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0, 0.0], 2: [0.0, 0.0, 1.0, 0.0]}
    for c, v in base.items():
        for j in range(3):
            vec = [x + (0.01 * (j + 1) if i == 3 else 0.0) for i, x in enumerate(v)]
            rows.append((c * 10 + j, vec))
    rows.append((99, [0.0, 0.0, 0.0, 1.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = knn_graph(df, k=2, n_centroids=4, nprobe=2).collect()
    nbrs = {}
    for r in out:
        nbrs.setdefault(r["query_id"], set()).add(r["vec_id"])
        assert r["vec_id"] != r["query_id"]  # self excluded
    for c in base:
        members = {c * 10 + j for j in range(3)}
        for m in members:
            assert nbrs[m] == members - {m}, (m, nbrs[m])


def test_knn_graph_stored_index_equals_inline(spark, tmp_path):
    from cherry_spark.ext.ivf import ivf_build_index, knn_graph

    rows = [(i, [float((i * 7 + d * 3) % 11) for d in range(4)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    inline = knn_graph(df, k=2, n_centroids=4, nprobe=2).collect()
    idx = str(tmp_path / "ivf")
    ivf_build_index(df, idx, n_centroids=4)
    stored = knn_graph(df, k=2, n_centroids=4, nprobe=2, index_dir=idx).collect()
    assert sorted((r["query_id"], r["vec_id"], r["sim"]) for r in stored) == sorted(
        (r["query_id"], r["vec_id"], r["sim"]) for r in inline
    )


def _graph_rows(df):
    return sorted((r["query_id"], r["vec_id"], r["sim"]) for r in df.collect())


def test_knn_graph_numpy_equals_fold_fixture(spark, sf_dir):
    """The matmul candidate lane must reproduce the fold lane's graph
    EXACTLY on the certification fixture (the registered query's
    config: k=3, 16 centroids, nprobe=2)."""
    from cherry_spark.ext.ivf import knn_graph
    from cherry_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    fold = _graph_rows(knn_graph(emb, k=3, n_centroids=16, nprobe=2, method="fold"))
    fast = _graph_rows(knn_graph(emb, k=3, n_centroids=16, nprobe=2, method="numpy"))
    assert fast == fold and len(fast) > 0


def test_knn_graph_numpy_equals_fold_adversarial_ties(spark):
    """Duplicate-heavy corpus: 20 identical vectors share sim 1.0 with
    each other, so the k-th boundary is a pure id tie-break — the
    candidate stage must select the LOWEST ids (stable sort over
    id-sorted rows), or the graph diverges.  Also plants zero-norm
    vectors (NULL sim in the fold lane, -inf proxy in the numpy lane:
    both rank last) and forces tiny k_buf coverage via k=2, pad=0."""
    from cherry_spark.ext.ivf import knn_graph

    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(20)]
    rows += [(100 + i, [0.0, 1.0, 0.0, 0.0]) for i in range(5)]
    rows += [(200, [0.0, 0.0, 0.0, 0.0]), (201, [0.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for pad in (0, 8):
        fold = _graph_rows(
            knn_graph(df, k=2, n_centroids=3, nprobe=2, method="fold")
        )
        fast = _graph_rows(
            knn_graph(df, k=2, n_centroids=3, nprobe=2, method="numpy", pad=pad)
        )
        assert fast == fold, f"pad={pad}"
    # the duplicate block's neighbors are the lowest-id duplicates
    got = {q: [] for q, _, _ in fast}
    for q, v, s in fast:
        got[q].append((v, s))
    assert sorted(v for v, _ in got[19]) == [0, 1]


def test_seq_dot_bit_identical_to_jvm_fold(spark):
    """_seq_dot must reproduce the JVM ``similarity.dot`` fold's raw
    double BIT-FOR-BIT (r16: the numpy knn lane now emits the exact
    sim itself, so the fold's IEEE summation order is the contract —
    pairwise/BLAS summation differs in the last ulps and would flip
    round(·,6) at bucket edges).  Adversarial magnitudes spanning
    1e-8..1e8 with sign flips make any reordering visible."""
    import hashlib
    import struct

    import numpy as np

    from cherry_spark.ext.ivf import _seq_dot
    from cherry_spark.ext.similarity import dot

    def comp(i, j, salt):
        h = hashlib.sha256(f"seqdot:{salt}:{i}:{j}".encode()).digest()
        mag = 10.0 ** (int.from_bytes(h[:2], "big") % 17 - 8)
        frac = int.from_bytes(h[2:8], "big") / 2**48
        sign = -1.0 if h[8] % 2 else 1.0
        return sign * frac * mag

    n, dim = 50, 64
    a = [[comp(i, j, "a") for j in range(dim)] for i in range(n)]
    b = [[comp(i, j, "b") for j in range(dim)] for i in range(n)]
    df = spark.createDataFrame(
        [(i, a[i], b[i]) for i in range(n)],
        "i long, a array<double>, b array<double>",
    )
    jvm = {
        r["i"]: r["d"]
        for r in df.select("i", dot(F.col("a"), F.col("b")).alias("d")).collect()
    }
    got = _seq_dot(np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64))
    for i in range(n):
        assert struct.pack("<d", jvm[i]) == struct.pack("<d", float(got[i])), i
    # and the naive pairwise sum would NOT have matched everywhere —
    # prove the test has teeth on at least one row
    naive = (np.asarray(a) * np.asarray(b)).sum(axis=1)
    assert any(
        struct.pack("<d", float(naive[i])) != struct.pack("<d", jvm[i])
        for i in range(n)
    )


def test_knn_graph_numpy_stored_index(spark, tmp_path):
    from cherry_spark.ext.ivf import ivf_build_index, knn_graph

    rows = [(i, [float((i * 7 + d * 3) % 11) for d in range(4)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = str(tmp_path / "ivf")
    ivf_build_index(df, idx, n_centroids=4)
    fold = _graph_rows(knn_graph(df, k=2, n_centroids=4, nprobe=2, method="fold"))
    fast = _graph_rows(
        knn_graph(df, k=2, n_centroids=4, nprobe=2, index_dir=idx, method="numpy")
    )
    assert fast == fold


def _sd_rows(df):
    return sorted((r["vec_id"], r["centroid_id"], r["is_dup"]) for r in df.collect())


def test_semantic_dedup_numpy_equals_fold_fixture(spark, sf_dir):
    from cherry_spark.ext.semdedup import semantic_dedup
    from cherry_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    fold = _sd_rows(semantic_dedup(emb, threshold=0.3, n_centroids=16, method="fold"))
    fast = _sd_rows(semantic_dedup(emb, threshold=0.3, n_centroids=16, method="numpy"))
    assert fast == fold and len(fast) > 0
    assert any(d for _, _, d in fast)  # the fixture contains real dups


def test_semantic_dedup_numpy_boundary_band(spark):
    """Cosines planted exactly AT the round-half-up decision boundary
    (0.2999995 for threshold 0.3) fall inside the matmul band and must
    be resolved by the certified fold re-check — plus exact clones,
    a just-below pair, orthogonal, and zero-norm vectors."""
    import math

    from cherry_spark.ext.semdedup import semantic_dedup

    def unit(c):
        return [c, math.sqrt(1.0 - c * c), 0.0, 0.0]

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),   # exact clone of 0 -> dup
        (2, unit(0.2999995)),        # cos to v0 at the boundary -> band
        (3, unit(0.3)),              # just above -> decided dup
        (4, unit(0.29999)),          # below -> decided not-dup vs v0
        (5, [0.0, 0.0, 0.0, 0.0]),   # zero norm: never dup
        (6, [0.0, 0.0, 1.0, 0.0]),   # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # single cluster so every pair is compared
    fold = _sd_rows(semantic_dedup(df, threshold=0.3, n_centroids=1, method="fold"))
    fast = _sd_rows(semantic_dedup(df, threshold=0.3, n_centroids=1, method="numpy"))
    assert fast == fold
    verdicts = {v: d for v, _, d in fast}
    assert verdicts[1] == 1 and verdicts[3] == 1
    assert verdicts[5] == 0 and verdicts[0] == 0


def test_semantic_dedup_numpy_respects_cluster_cap(spark):
    from cherry_spark.ext.semdedup import semantic_dedup

    # seeds (ids 0, 1) are DISTINCT directions so the 2-centroid split
    # is real; 10 extra clones blow cluster A past the cap while
    # cluster B stays a dedupable pair
    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
    rows += [(10 + i, [1.0, 0.0, 0.0, 0.0]) for i in range(10)]
    rows += [(30, [0.0, 1.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for m in ("fold", "numpy"):
        out = {r["vec_id"]: r["is_dup"] for r in semantic_dedup(
            df, threshold=0.9, n_centroids=2, max_cluster_size=5, method=m
        ).collect()}
        # capped cluster members all kept; small cluster deduped
        assert out[0] == 0 and all(out[10 + i] == 0 for i in range(10)), m
        assert out[1] == 0 and out[30] == 1, m


def test_knn_graph_numpy_same_bucket_subresolution_spread(spark):
    """Review-r9 regression: a cluster of near-clones whose raw cosines
    differ by ~1e-8 (all inside ONE 1e-6 rounding bucket) with raw sim
    INCREASING in id. The certified order (round(sim,6) DESC, id ASC)
    ranks the LOWEST ids first; a candidate stage selecting on the raw
    proxy would keep the highest ids instead and the graph would
    diverge from the fold lane. The numpy lane must round the proxy to
    the same grid before selection."""
    import math

    from cherry_spark.ext.ivf import knn_graph

    rows = []
    for i in range(20):
        # cos to e1 = 1 - (1.0e-6 - i*1e-8): increasing with id, all
        # rounding to the same 0.999999 bucket
        d = math.sqrt(2.0 * (1.0e-6 - i * 1e-8))
        rows.append((i, [1.0, d, 0.0, 0.0]))
    rows += [(100 + i, [0.0, 1.0, 0.0, 0.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for pad in (0, 8):
        fold = _graph_rows(
            knn_graph(df, k=2, n_centroids=2, nprobe=1, method="fold")
        )
        fast = _graph_rows(
            knn_graph(
                df, k=2, n_centroids=2, nprobe=1, method="numpy", pad=pad
            )
        )
        assert fast == fold, f"pad={pad}"
    # the highest-id clone's neighbors are the LOWEST ids in the bucket
    nb = sorted(v for q, v, _ in fast if q == 19)
    assert nb == [0, 1]


def test_knn_graph_numpy_probe_salt_equality(spark):
    """probe_salt partitions QUERIES per centroid (bounding the Arrow
    probe block on hot centroids) — per-query selection is unchanged,
    so any salt must produce the identical graph."""
    from cherry_spark.ext.ivf import knn_graph

    rows = [
        (i, [float((i * 7 + d * 3) % 11) for d in range(4)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = _graph_rows(knn_graph(df, k=2, n_centroids=4, nprobe=2, method="fold"))
    for salt in (1, 4):
        fast = _graph_rows(
            knn_graph(
                df, k=2, n_centroids=4, nprobe=2, method="numpy",
                probe_salt=salt,
            )
        )
        assert fast == base, f"salt={salt}"


def test_semantic_dedup_numpy_off_grid_threshold(spark):
    """Review-r9 regression: with a threshold NOT on the 1e-6 grid,
    the true decision boundary of round(sim,6) >= threshold is the
    NEXT grid point — a cosine between the threshold and that point
    must NOT be a duplicate. The unfixed numpy cutoff
    (threshold - 0.5e-6) decided such pairs dup outright."""
    import math

    from cherry_spark.ext.semdedup import semantic_dedup

    def on_circle(c):
        return [c, math.sqrt(1.0 - c * c), 0.0, 0.0]

    # cos(v, e1) == c exactly-ish; all vectors share one cluster
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, on_circle(0.8500001)),   # round -> 0.850000 < thr: unique
        (2, on_circle(0.8500012)),   # round -> 0.850001 >= thr: dup of 0? 
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    thr = 0.8500003
    fold = _sd_rows(semantic_dedup(df, threshold=thr, n_centroids=1, method="fold"))
    fast = _sd_rows(semantic_dedup(df, threshold=thr, n_centroids=1, method="numpy"))
    assert fast == fold
    dup = {v: d for v, _, d in fast}
    assert dup[1] == 0 and dup[0] == 0


def test_numpy_lanes_accept_string_ids(spark):
    """Review-r9 regression: the numpy lanes' empty Arrow frames
    hardcoded int64 ids, crashing string-id corpora on routine empty
    groups (singleton clusters; probe_salt buckets with no queries).
    All three lanes must match their fold twins on string ids."""
    from cherry_spark.ext.ivf import knn_graph
    from cherry_spark.ext.quantize import quantized_rerank_topk
    from cherry_spark.ext.semdedup import semantic_dedup

    rows = [
        (f"d{i:02d}", [float((i * 7 + d * 3) % 11) for d in range(4)])
        for i in range(40)
    ]
    # an outlier far from the rest: a near-certain singleton cluster
    rows.append(("zz_lone", [1000.0, -1000.0, 1000.0, -1000.0]))
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")

    canon_g = lambda d: sorted(tuple(r) for r in d.collect())  # noqa: E731
    fold = canon_g(knn_graph(df, k=2, n_centroids=4, nprobe=2, method="fold"))
    for salt in (1, 4):
        fast = canon_g(
            knn_graph(
                df, k=2, n_centroids=4, nprobe=2, method="numpy",
                probe_salt=salt,
            )
        )
        assert fast == fold, f"salt={salt}"

    sd_fold = _sd_rows(semantic_dedup(df, threshold=0.95, n_centroids=8, method="fold"))
    sd_fast = _sd_rows(semantic_dedup(df, threshold=0.95, n_centroids=8, method="numpy"))
    assert sd_fast == sd_fold and len(sd_fast) == 41

    q = df.filter(F.col("vec_id").isin("d00", "d07")).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    qr_fold = canon_g(quantized_rerank_topk(df, q, k=3, method="fold"))
    qr_fast = canon_g(quantized_rerank_topk(df, q, k=3, method="numpy"))
    assert qr_fast == qr_fold and len(qr_fast) > 0


def test_knn_graph_stored_probes_paths(spark, tmp_path):
    """The persisted probes table (r14): served when it covers nprobe
    and matches the live centroids version; falls back to live scoring
    when nprobe exceeds the stored ranks or a reseed superseded the
    centroids; live-scores only the union gap for vectors missing from
    the table (corpus appended after the build).  Every path must be
    row-identical to the inline graph."""
    import os

    from cherry_spark.ext.ivf import (
        _stored_probes,
        ivf_build_index,
        knn_graph,
    )
    from cherry_spark.writers import store

    rows = [(i, [float((i * 7 + d * 3) % 11) for d in range(4)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    inline = sorted(
        (r["query_id"], r["vec_id"], r["sim"])
        for r in knn_graph(df, k=2, n_centroids=4, nprobe=2).collect()
    )

    # stored ranks < nprobe: full live fallback, same rows
    idx1 = str(tmp_path / "ivf1")
    ivf_build_index(df, idx1, n_centroids=4, store_probes=1)
    assert (
        _stored_probes(spark, idx1, None, 2, "vec_id", "embedding") is None
    )
    got = sorted(
        (r["query_id"], r["vec_id"], r["sim"])
        for r in knn_graph(
            df, k=2, n_centroids=4, nprobe=2, index_dir=idx1
        ).collect()
    )
    assert got == inline

    # covered: stored table serves (marker matches, ranks cover)
    idx2 = str(tmp_path / "ivf2")
    ivf_build_index(df, idx2, n_centroids=4, store_probes=4)
    assert (
        _stored_probes(spark, idx2, df, 2, "vec_id", "embedding") is not None
    )
    got = sorted(
        (r["query_id"], r["vec_id"], r["sim"])
        for r in knn_graph(
            df, k=2, n_centroids=4, nprobe=2, index_dir=idx2
        ).collect()
    )
    assert got == inline

    # union gap: shrink the stored table to half the ids (marker kept)
    pdir = store.data_dir(f"{idx2}/probes")
    stored = spark.read.parquet(pdir)
    half = stored.filter((stored["query_id"] % 2) == 0)
    vdir = store.stage_version_dir(f"{idx2}/probes")
    half.repartition("proberank").write.partitionBy("proberank").mode(
        "overwrite"
    ).parquet(vdir)
    with open(os.path.join(pdir, "_centroids_v")) as fh:
        marker = fh.read()
    with open(os.path.join(vdir, "_centroids_v"), "w") as fh:
        fh.write(marker)
    store.commit_version(f"{idx2}/probes", vdir)
    covered, uncovered = _stored_probes(
        spark, idx2, spark.read.parquet(store.data_dir(f"{idx2}/corpus")),
        2, "vec_id", "embedding",
    )
    assert uncovered.count() == 20  # the odd ids live-score
    got = sorted(
        (r["query_id"], r["vec_id"], r["sim"])
        for r in knn_graph(
            df, k=2, n_centroids=4, nprobe=2, index_dir=idx2
        ).collect()
    )
    assert got == inline

    # reseed invalidation: a superseding centroids publish flips the
    # marker mismatch -> full live fallback (still the same graph,
    # since the republished centroids are identical)
    cents = spark.read.parquet(store.data_dir(f"{idx2}/centroids"))
    store.publish(cents, f"{idx2}/centroids")
    assert (
        _stored_probes(spark, idx2, df, 2, "vec_id", "embedding") is None
    )
    got = sorted(
        (r["query_id"], r["vec_id"], r["sim"])
        for r in knn_graph(
            df, k=2, n_centroids=4, nprobe=2, index_dir=idx2
        ).collect()
    )
    assert got == inline


def test_knn_graph_stored_lane_uses_vectors_as_queries(spark, tmp_path):
    """r15 advice item: with index_dir, the query set is ``vectors``
    in EVERY lane.  A filtered ``vectors`` must yield exactly its own
    query rows from the stored-probes lane (semi-join by id), a
    foreign id must be live-scored through the union gap, and the
    stored lane must be row-identical to the live-fallback lane on the
    same filtered query set."""
    from cherry_spark.ext.ivf import ivf_build_index, knn_graph

    rows = [
        (i, [float((i * 7 + d * 3) % 11) for d in range(4)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # idx_hot: stored probes usable; idx_cold: ranks < nprobe, so the
    # same calls run the live-fallback index lane (same corpus)
    idx_hot = str(tmp_path / "hot")
    idx_cold = str(tmp_path / "cold")
    ivf_build_index(df, idx_hot, n_centroids=4, store_probes=4)
    ivf_build_index(df, idx_cold, n_centroids=4, store_probes=1)

    graph = lambda d: sorted(  # noqa: E731
        (r["query_id"], r["vec_id"], r["sim"]) for r in d.collect()
    )
    filtered = df.filter(df["vec_id"] < 10)
    got_hot = graph(
        knn_graph(filtered, k=2, n_centroids=4, nprobe=2, index_dir=idx_hot)
    )
    got_cold = graph(
        knn_graph(filtered, k=2, n_centroids=4, nprobe=2, index_dir=idx_cold)
    )
    assert got_hot == got_cold
    assert {q for q, _, _ in got_hot} == set(range(10))
    # candidates still come from the FULL index corpus
    assert any(v >= 10 for _, v, _ in got_hot)

    # a foreign id (absent from the index) is live-scored via the gap
    foreign = filtered.unionByName(
        spark.createDataFrame(
            [(100, [1.0, 2.0, 3.0, 4.0])],
            "vec_id long, embedding array<double>",
        )
    )
    got_hot = graph(
        knn_graph(foreign, k=2, n_centroids=4, nprobe=2, index_dir=idx_hot)
    )
    got_cold = graph(
        knn_graph(foreign, k=2, n_centroids=4, nprobe=2, index_dir=idx_cold)
    )
    assert got_hot == got_cold
    assert {q for q, _, _ in got_hot} == set(range(10)) | {100}
