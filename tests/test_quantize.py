import pytest
from pyspark.sql import functions as F

from cherry_spark.ext.quantize import quantize_audit, quantize_vectors
from cherry_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_quantize_vectors_shape_and_range(spark, emb):
    out = quantize_vectors(emb).collect()
    src = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    assert len(out) == len(src)
    for r in out:
        assert len(r["qvec"]) == len(src[r["vec_id"]])
        assert all(0 <= c <= 255 for c in r["qvec"])


def test_quantize_audit_error_bound(spark, emb):
    """Scalar quantization error is bounded by half a step per dim:
    max_abs_err <= (mx-mn)/255/2 (+rounding slack) for every vector."""
    pe = emb.select(F.posexplode("embedding").alias("i", "v"))
    widest = (
        pe.groupBy("i")
        .agg((F.max("v") - F.min("v")).alias("w"))
        .agg(F.max("w"))
        .first()[0]
    )
    bound = widest / 255 / 2 + 1e-9
    audit = quantize_audit(emb).collect()
    assert len(audit) == emb.count()
    for r in audit:
        assert 0 <= r["mean_abs_err"] <= r["max_abs_err"] <= bound


def test_quantized_rerank_recall(spark, emb):
    """Quantized-candidate search with exact rerank: recall@10 vs brute
    force, and every reported sim is the exact rounded cosine (rerank
    guarantees values can't be corrupted, only candidates missed)."""
    from cherry_spark.ext.quantize import quantized_rerank_topk
    from cherry_spark.ext.similarity import brute_force_topk

    q = emb.filter(F.col("vec_id").isin(3, 47, 111)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = quantized_rerank_topk(emb, q, k=10, rerank=100).collect()
    exact = brute_force_topk(emb, q, k=10).collect()
    ex = {(r["query_id"], r["vec_id"]): r["sim"] for r in exact}
    ap = {(r["query_id"], r["vec_id"]): r["sim"] for r in approx}
    # reported sims are exact cosines wherever the pair appears in both
    for key in set(ex) & set(ap):
        assert ex[key] == ap[key]
    recall = len(set(ex) & set(ap)) / len(ex)
    assert recall >= 0.9
    # self is always its own nearest neighbor
    for qid in (3, 47, 111):
        assert (qid, qid) in ap


def test_quantize_roundtrip_orders_dims(spark):
    """Codes come back in dimension order: a vector whose values
    increase monotonically quantizes to monotonically increasing codes
    (per-dim ranges here are identical by construction)."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 2.0]), (3, [2.0, 4.0]), (4, [4.0, 8.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["qvec"] for r in quantize_vectors(df).collect()}
    assert got[1] == [0, 0] and got[4] == [255, 255]
    # vec 2 sits at 1/4 of both ranges -> same code both dims
    assert got[2][0] == got[2][1] == 64


def test_quantize_audit_mixed_length_vectors(spark):
    """mean_abs_err divides by each vector's own element count, not a
    constant dim (round-4 ADVICE): a 2-dim and a 4-dim vector in one
    corpus both get exact means."""
    df = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [0.0, 0.25, 0.5, 1.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_audit(df).collect()}
    # per-dim ranges are exact powers of two -> reconstruction exact
    # for endpoints; middle values quantize with tiny error, but the
    # KEY property is the divisor: an all-exact vector must have mean 0
    assert rows[1]["mean_abs_err"] == 0.0
    assert rows[2]["max_abs_err"] < 0.01
    assert 0.0 <= rows[2]["mean_abs_err"] <= rows[2]["max_abs_err"]


def test_quantized_rerank_numpy_equals_fold(spark, emb):
    """The mapInPandas matmul candidate lane must reproduce the fold
    lane's output EXACTLY (the registered query's config), including
    on an adversarial duplicate-heavy corpus where the rerank boundary
    is a pure id tie-break."""
    from cherry_spark.ext.quantize import quantized_rerank_topk

    q = emb.filter(F.col("vec_id").isin(3, 47, 111)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    fold = sorted(
        tuple(r)
        for r in quantized_rerank_topk(
            emb, q, k=10, rerank=100, method="fold"
        ).collect()
    )
    fast = sorted(
        tuple(r)
        for r in quantized_rerank_topk(
            emb, q, k=10, rerank=100, method="numpy"
        ).collect()
    )
    assert fast == fold and len(fast) == 30


def test_quantized_rerank_null_and_ragged_vectors(spark):
    """The r15 in-row stats/codes rewrite must keep the explode form's
    edge semantics: NULL-vector rows are dropped (posexplode emitted no
    rows for them), and a ragged corpus neither throws under ANSI
    (try_element_at in the stats pass) nor quantizes short vectors
    against missing dims."""
    from cherry_spark.ext.quantize import quantized_rerank_topk

    rows = [
        (1, [1.0, 2.0, 3.0, 4.0]),
        (2, [4.0, 3.0, 2.0, 1.0]),
        (3, None),  # must not appear anywhere in the output
        (4, [2.0, 2.0]),  # shorter than the corpus max dim
        (5, [0.5, 1.5, 2.5, 3.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = quantized_rerank_topk(df, q, k=5, rerank=5).collect()
    ids = {r["vec_id"] for r in out}
    assert 3 not in ids
    assert (1 in ids) and (5 in ids)
    sims = {r["vec_id"]: r["sim"] for r in out}
    assert sims[1] == 1.0  # self-similarity survives the rewrite


def test_quantized_rerank_stored_codes_equal_inline(spark, emb, tmp_path):
    """The r15 store lane (prebuilt stats + code table) must reproduce
    the inline lane bit-for-bit — stage 1 reads the stored codes, the
    exact rerank is unchanged; same contract as the minhash-signature
    and LSH-bucket stores."""
    from cherry_spark.ext.quantize import (
        codes_against,
        dim_stats_table,
        quantized_rerank_topk,
    )
    from cherry_spark.writers import store

    stats_dir = str(tmp_path / "qstats")
    codes_dir = str(tmp_path / "qcodes")
    store.publish(dim_stats_table(emb), stats_dir)
    stats = spark.read.parquet(store.data_dir(stats_dir))
    store.publish(codes_against(emb, stats), codes_dir)
    qcodes = spark.read.parquet(store.data_dir(codes_dir))

    q = emb.filter(F.col("vec_id").isin(3, 47, 111)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    inline = sorted(
        tuple(r)
        for r in quantized_rerank_topk(emb, q, k=10, rerank=100).collect()
    )
    stored = sorted(
        tuple(r)
        for r in quantized_rerank_topk(
            emb, q, k=10, rerank=100, corpus_codes=qcodes, stats=stats
        ).collect()
    )
    assert stored == inline and len(stored) == 30


def test_quantized_rerank_numpy_duplicate_ties_and_zero_norm(spark):
    from cherry_spark.ext.quantize import quantized_rerank_topk

    # 30 identical vectors: rerank=8 cut is entirely an id tie-break;
    # zero-norm rows exercise the NULL/-inf lanes
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(30)]
    rows += [(100, [0.0, 0.0, 0.0, 0.0]), (101, [4.0, 3.0, 2.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id").isin(0, 100)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for buf in (0, 16):
        fold = sorted(
            tuple(r)
            for r in quantized_rerank_topk(
                df, q, k=5, rerank=8, method="fold"
            ).collect()
        )
        fast = sorted(
            tuple(r)
            for r in quantized_rerank_topk(
                df, q, k=5, rerank=8, method="numpy", buffer=buf
            ).collect()
        )
        assert fast == fold, f"buffer={buf}"
