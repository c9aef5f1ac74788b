"""Portable Bloom filter (ext/bloom.py): membership properties and
the shuffle-join probe path."""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_spark.ext.bloom import bloom_build, bloom_probe


def _keys(spark, keys):
    return spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], "doc_id long, key string"
    )


def test_no_false_negatives_even_when_saturated(spark):
    """The defining property: an inserted key ALWAYS probes maybe=1 —
    even in a deliberately tiny, saturated filter."""
    corpus = _keys(spark, [f"doc number {i}" for i in range(200)])
    bloom = bloom_build(corpus, m_bits=64, k_hashes=3)  # saturated
    out = bloom_probe(corpus, bloom, m_bits=64, k_hashes=3).collect()
    assert all(r["maybe_in_set"] == 1 for r in out)


def test_definitely_new_with_roomy_filter(spark):
    corpus = _keys(spark, [f"doc number {i}" for i in range(100)])
    bloom = bloom_build(corpus, m_bits=1 << 16, k_hashes=5)
    novel = _keys(spark, [f"unseen text {i}" for i in range(100)])
    out = bloom_probe(novel, bloom, m_bits=1 << 16, k_hashes=5).collect()
    # at 100 keys in 65536 bits the FP probability is ~1e-8 per key —
    # every novel key must read definitely-new
    assert all(r["maybe_in_set"] == 0 for r in out)
    # and the state is tiny: at most k*n populated words
    assert bloom.count() <= 500


def test_mixed_batch_flags_exactly_the_members(spark):
    corpus = _keys(spark, [f"corpus {i}" for i in range(50)])
    bloom = bloom_build(corpus, m_bits=1 << 16, k_hashes=5)
    batch = _keys(
        spark, [f"corpus {i}" if i % 2 == 0 else f"new {i}" for i in range(50)]
    )
    out = {r["doc_id"]: r["maybe_in_set"] for r in
           bloom_probe(batch, bloom, m_bits=1 << 16, k_hashes=5).collect()}
    assert all(v == 1 for k, v in out.items() if k % 2 == 0)
    assert all(v == 0 for k, v in out.items() if k % 2 == 1)


def test_shuffle_join_probe_matches_broadcast(spark):
    corpus = _keys(spark, [f"doc {i}" for i in range(80)])
    bloom = bloom_build(corpus, m_bits=1 << 10, k_hashes=4)
    batch = _keys(spark, [f"doc {i}" if i < 40 else f"x {i}" for i in range(80)])
    kw = dict(m_bits=1 << 10, k_hashes=4)
    a = bloom_probe(batch, bloom, broadcast_filter=True, **kw)
    b = bloom_probe(batch, bloom, broadcast_filter=False, **kw)
    rows_a = sorted((r["doc_id"], r["maybe_in_set"]) for r in a.collect())
    rows_b = sorted((r["doc_id"], r["maybe_in_set"]) for r in b.collect())
    assert rows_a == rows_b
