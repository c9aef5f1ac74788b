"""One-call corpus-store ingest: prebuild every fingerprinted derived
table the serving queries read.

The serving architecture (adopted incrementally through rounds 7–9)
treats corpus-derived state — MinHash signatures, shingle and
positional postings, the exact-Jaccard pair graph, SimHash
fingerprints, the IVF index, the BM25 index, the bigram LM counts —
as something you compute ONCE per corpus version at ingest and serve
many times, exactly like a search engine builds its index at crawl
time, not per query.  Each store is individually lazy (its
``_ensure_*`` helper builds on first use, keyed by a
path+size+mtime fingerprint of the source parquet, and committed as
an immutable version dir behind a put-if-absent pointer —
writers/store.py, r13 — so an interrupted build is an invisible
orphan that never serves), which is right for ad-hoc use but leaves
the first query of each family paying the build.

``ingest_corpus_stores`` is the production entry point: run it when a
corpus version lands and every store is warm before the first query
arrives.  On a real cluster this is the post-crawl indexing job — one
scheduled run per corpus version; at 100 TB each build is a bounded
number of scans/aggregations over the new version (the per-store
scale arguments live with their builders), and the fingerprint
contract means concurrent runs over different versions never race on
a directory while re-runs over the same version are free no-ops.

Streaming ingestion keeps a subset of these fresh incrementally
instead of rebuilding: ``run_streaming_bm25_index`` (BM25 tables),
``run_streaming_positional_index`` (positional postings),
``run_streaming_span_gate`` / ``run_streaming_delta_dedup`` (admitted
posting / signature state) — see ``streaming/continuous.py``.

Reference parity note: the reference engine has no derived-store
layer (it streams batches straight to sinks); this module exists for
the LLM-curation scope where corpus-static indexes are the difference
between per-query O(corpus) and per-query O(result).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession

# name -> (source table, builder(spark, sf_dir) -> store path).
# Late imports inside the lambdas keep module import light; each
# builder is the SAME ``_ensure_*`` the serving query calls, so a
# prebuilt store is served verbatim (no second code path to drift).


def _builders() -> dict[str, tuple[str, Callable[[SparkSession, str], str]]]:
    from cherry_spark.queries import extensions as ext

    def bigram_store(spark: SparkSession, sf_dir: str) -> str:
        from cherry_spark.queries.curation import _ensure_bigram_model

        return _ensure_bigram_model(spark, sf_dir)

    def _trained_weights_store(spark: SparkSession, sf_dir: str) -> str:
        from cherry_spark.queries.curation import _ensure_trained_weights

        return _ensure_trained_weights(spark, sf_dir)

    return {
        "minhash_signatures": ("documents", ext._ensure_minhash_signatures),
        "shingle_postings": ("documents", ext._ensure_shingle_postings),
        "positional_postings": ("documents", ext._ensure_positional_postings),
        "jaccard_pairs_60": ("documents", ext._ensure_jaccard_pairs),
        "simhash_fingerprints": ("documents", ext._ensure_simhash_fingerprints),
        "delta_corpus_sigs": ("documents", ext._ensure_delta_corpus_sigs),
        "bm25_index": ("documents", ext._ensure_bm25_index),
        "bigram_model": ("documents", bigram_store),
        "trained_weights": ("documents", _trained_weights_store),
        "ivf_index": ("embeddings", ext._ensure_ivf_index),
        "lsh_buckets": ("embeddings", ext._ensure_lsh_buckets),
        "quant_stats": ("embeddings", ext._ensure_quant_stats),
        "quant_codes": ("embeddings", ext._ensure_quant_codes),
    }


def store_names() -> list[str]:
    """The stores :func:`ingest_corpus_stores` knows how to build."""
    return list(_builders())


def ingest_corpus_stores(
    spark: SparkSession, sf_dir: str, include: list[str] | None = None
) -> dict[str, str]:
    """Build (or confirm) every fingerprinted store for ``sf_dir``.

    Returns ``{store_name: store_path}``.  Idempotent: a store whose
    fingerprint already exists with its ``_SUCCESS`` marker is
    returned untouched (same directory, no rebuild), so re-running
    ingest after a partial failure only pays for the missing stores.
    ``include`` restricts to a subset of :func:`store_names`.
    """
    import os

    builders = _builders()
    if include is not None:
        unknown = sorted(set(include) - set(builders))
        if unknown:
            raise ValueError(f"unknown stores: {unknown}; know {sorted(builders)}")
        builders = {k: v for k, v in builders.items() if k in include}
    for name, (source, _build) in builders.items():
        src = os.path.join(sf_dir, f"{source}.parquet")
        if not os.path.exists(src):
            raise FileNotFoundError(f"store {name!r} needs {src}")
    return {name: build(spark, sf_dir) for name, (_, build) in builders.items()}


def store_success_markers(manifest: dict[str, str]) -> dict[str, float]:
    """name -> mtime of the first ``_SUCCESS`` marker under each store
    dir (bm25/ivf are multi-table trees; single-table stores carry it
    at the root) — the public way to observe the build-once contract
    (a re-ingest or a serve run must leave these unchanged). Raises
    if a store has no marker (an interrupted build: it would be
    rebuilt, never served)."""
    import os

    out = {}
    for name, path in manifest.items():
        for root, _dirs, files in sorted(os.walk(path)):
            if "_SUCCESS" in files:
                out[name] = os.path.getmtime(os.path.join(root, "_SUCCESS"))
                break
        else:
            raise AssertionError(f"no _SUCCESS under {path} ({name})")
    return out


def main(argv: list[str] | None = None) -> int:
    """CLI: ``python -m cherry_spark.ingest SF_DIR [store ...]``."""
    import json
    import sys

    args = list(sys.argv[1:] if argv is None else argv)
    if not args:
        print("usage: python -m cherry_spark.ingest SF_DIR [store ...]")
        return 2
    sf_dir, include = args[0], (args[1:] or None)
    from cherry_spark.session import get_spark

    manifest = ingest_corpus_stores(get_spark(), sf_dir, include)
    print(json.dumps({"sf_dir": sf_dir, "stores": manifest}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
