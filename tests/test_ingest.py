"""One-call corpus-store ingest (cherry_spark/ingest.py): every
fingerprinted store builds through the SAME ``_ensure_*`` seam the
serving queries read, ingest is idempotent (re-runs touch nothing),
and store-backed queries serve afterwards without rebuilding."""

from __future__ import annotations

import pytest

from cherry_spark.ingest import (
    ingest_corpus_stores,
    store_names,
    store_success_markers as _markers,
)


def test_ingest_builds_all_stores_idempotently(spark, sf_dir):
    m1 = ingest_corpus_stores(spark, sf_dir)
    assert set(m1) == set(store_names()) and len(m1) >= 10
    marks = _markers(m1)
    # second ingest: same dirs, zero rebuilds
    m2 = ingest_corpus_stores(spark, sf_dir)
    assert m2 == m1
    assert _markers(m2) == marks


def test_ingest_subset_and_unknown_store(spark, sf_dir):
    m = ingest_corpus_stores(spark, sf_dir, include=["shingle_postings"])
    assert list(m) == ["shingle_postings"]
    with pytest.raises(ValueError, match="unknown stores"):
        ingest_corpus_stores(spark, sf_dir, include=["nope"])


def test_store_backed_queries_serve_without_rebuild(spark, sf_dir):
    """After ingest every store is warm: running the store-backed
    queries must not rewrite any store (the serve path and the ingest
    path are the same fingerprinted directory)."""
    from cherry_spark.catalog import REGISTRY

    manifest = ingest_corpus_stores(spark, sf_dir)
    marks = _markers(manifest)
    for qname in (
        "bm25_topk",
        "minhash_lsh_dedup",
        "phrase_search_topk",
        "bigram_logprob",
        "trained_quality_gate",
        "ann_ivf_topk",
    ):
        assert REGISTRY[qname].fn(spark, sf_dir).count() > 0, qname
    assert _markers(manifest) == marks
