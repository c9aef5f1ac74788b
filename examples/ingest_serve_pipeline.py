"""Ingest-then-serve example: the store architecture composed the way
a production deployment runs it —

  corpus version lands (sf_dir parquet)
    -> cherry_spark.ingest.ingest_corpus_stores   (the scheduled
       post-crawl indexing job: all 10 fingerprinted stores — dedup
       signatures, shingle/positional postings, pair graph, bm25
       index, bigram LM, trained classifier weights, ivf index)
    -> re-ingest is a NO-OP                        (fingerprint +
       pointer-commit contract: an interrupted build is an invisible
       orphan version, so a re-run after partial failure pays only
       for what's missing)
    -> queries serve warm                          (bm25 / phrase /
       near-dup / trained gate read the same directories — nothing
       rebuilds at query time)

Streaming ingestion keeps stores fresh between versions instead of
re-running this job: run_streaming_bm25_index (bm25 tables),
run_streaming_positional_index (phrase postings),
run_streaming_pair_graph (near-dup edges) — see
streaming/continuous.py and the streaming_ingestion_pipeline example.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, sf_dir: str) -> dict:
    import cherry_spark.queries  # noqa: F401 — populate the registry
    from cherry_spark.catalog import REGISTRY
    from cherry_spark.ingest import (
        ingest_corpus_stores,
        store_success_markers as _markers,
    )

    t0 = time.time()
    manifest = ingest_corpus_stores(spark, sf_dir)
    ingest_s = round(time.time() - t0, 2)
    marks = _markers(manifest)

    t0 = time.time()
    again = ingest_corpus_stores(spark, sf_dir)
    reingest_s = round(time.time() - t0, 2)
    assert again == manifest and _markers(again) == marks  # no-op re-run

    served = {}
    for q in (
        "bm25_topk",
        "phrase_search_topk",
        "minhash_lsh_dedup",
        "trained_quality_gate",
    ):
        t0 = time.time()
        n = REGISTRY[q].fn(spark, sf_dir).count()
        served[q] = {"rows": n, "seconds": round(time.time() - t0, 2)}
    rebuilt = _markers(manifest) != marks

    return {
        "stores": manifest,
        "ingest_s": ingest_s,
        "reingest_s": reingest_s,
        "served": served,
        "rebuilt_during_serve": rebuilt,
    }


if __name__ == "__main__":
    from cherry_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = run(get_spark("ingest_serve_example"), sf)
    print(f"ingest {out['ingest_s']}s; re-ingest (no-op) {out['reingest_s']}s")
    for q, st in out["served"].items():
        print(f"  serve {q}: {st['rows']} rows in {st['seconds']}s")
    print(f"rebuilt during serve: {out['rebuilt_during_serve']}")
