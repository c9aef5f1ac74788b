"""Empirical 10x scale probe for the most expensive warm queries
(r12 verdict item #5): the plan audits argue these are ~linear at
100x; this measures the exponent at 10x.

Synthesizes a 10x corpus under /tmp by unioning ten id-remapped
copies of the sf0.1 documents/embeddings:

- document text is deterministically word-SHUFFLED per copy (each
  word keyed by md5(word|copy)), so copies share essentially no
  3-gram shingles and the duplicate-class structure of the corpus is
  preserved rather than multiplied (a naive 10x clone union would
  measure clone-class blowup, not scan scaling);
- embeddings are rotated by the copy index (norms preserved,
  cross-copy similarity scrambled).

For each probed query: one cold run (includes any fingerprinted
store/index build for the new corpus) and one warm run at 1x and at
10x; the table reports wall seconds and the warm 10x/1x ratio (a
~linear operator lands near 10, sublinear below).

``knn_graph`` is probed twice at 10x: the registered fixed-parameter
form (n_centroids=16 — per-cluster size grows 10x, so candidate
volume grows ~100x: the documented wrong way to scale an IVF) and
the scale path with n_centroids scaled 10x (per-cluster size
constant; candidate volume ~10x) — the production contract is that
the quantizer grows with the corpus version.

Usage: python tools/scale_probe_10x.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBES = [
    "repeated_substring_spans",
    "delta_dedup_minhash_verdicts",
    "domain_pagerank",
    "cdc_chunk_rewrite",
    "knn_graph",
]

N_COPIES = 10
ID_STRIDE = 100_000_000


def build_10x(spark, sf_dir: str, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from cherry_spark.sources.tables import load_table

    os.makedirs(out_dir, exist_ok=True)
    if not os.path.exists(os.path.join(out_dir, "_BUILT")):
        docs = load_table(spark, sf_dir, "documents")
        words = F.split(F.col("text"), " ")
        copies = []
        for k in range(N_COPIES):
            if k == 0:
                text = F.col("text")
            else:
                # per-copy deterministic word shuffle: key each word by
                # md5(word|k|position-salt) and re-join in that order —
                # same word multiset (length/quality stats preserved),
                # disjoint shingle sets across copies
                keyed = F.transform(
                    words,
                    lambda w, i: F.struct(
                        F.md5(F.concat_ws("|", w, F.lit(str(k)), i.cast("string"))).alias("h"),
                        w.alias("w"),
                    ),
                )
                text = F.array_join(
                    F.transform(F.array_sort(keyed), lambda s: s["w"]), " "
                )
            copies.append(
                docs.select(
                    (F.col("doc_id") + F.lit(k * ID_STRIDE)).alias("doc_id"),
                    text.alias("text"),
                    "lang",
                    "source",
                    F.length(text).cast("long").alias("n_chars"),
                )
            )
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        big.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, "documents.parquet")
        )

        emb = load_table(spark, sf_dir, "embeddings")
        ecopies = []
        for k in range(N_COPIES):
            vec = F.col("embedding")
            if k:
                n = F.size(vec)
                vec = F.concat(
                    F.slice(vec, k + 1, 64), F.slice(vec, 1, k)
                )
            ecopies.append(
                emb.select(
                    (F.col("vec_id") + F.lit(k * ID_STRIDE)).alias("vec_id"),
                    vec.alias("embedding"),
                    *[c for c in emb.columns if c not in ("vec_id", "embedding")],
                )
            )
        ebig = ecopies[0]
        for c in ecopies[1:]:
            ebig = ebig.unionByName(c)
        ebig.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, "embeddings.parquet")
        )
        open(os.path.join(out_dir, "_BUILT"), "w").close()
    if not os.path.exists(os.path.join(out_dir, "_BUILT_ORDERS")):
        # domain_pagerank derives its edge list from orders; the
        # ID_STRIDE is divisible by both edge moduli (80, 100), so ten
        # remapped copies give 10x edges over the SAME node space —
        # the realistic growth shape (domains fixed, links grow)
        from pyspark.sql import functions as F

        from cherry_spark.sources.tables import load_table

        orders = load_table(spark, sf_dir, "orders")
        ocopies = [
            orders.select(
                (F.col("o_orderkey") + F.lit(k * ID_STRIDE)).alias("o_orderkey"),
                (F.col("o_custkey") + F.lit(k * ID_STRIDE)).alias("o_custkey"),
                *[
                    c
                    for c in orders.columns
                    if c not in ("o_orderkey", "o_custkey")
                ],
            )
            for k in range(N_COPIES)
        ]
        obig = ocopies[0]
        for c in ocopies[1:]:
            obig = obig.unionByName(c)
        obig.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, "orders.parquet")
        )
        open(os.path.join(out_dir, "_BUILT_ORDERS"), "w").close()


def _time(fn) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 2), n


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "SCALE10_probe.json"
    big_dir = "/tmp/cherry_scale10x"
    probes = sys.argv[3].split(",") if len(sys.argv) > 3 else PROBES

    import cherry_spark.queries  # noqa: F401 - registration
    from cherry_spark.catalog import REGISTRY
    from cherry_spark.session import get_spark

    spark = get_spark()
    build_10x(spark, sf_dir, big_dir)

    results: dict[str, dict] = {}
    if os.path.exists(out_json):
        with open(out_json) as fh:
            results = json.load(fh)
    for name in probes:
        fn = REGISTRY[name].fn
        row: dict = {}
        for label, d in (("1x", sf_dir), ("10x", big_dir)):
            cold, n = _time(lambda: fn(spark, d).count())
            warm, _ = _time(lambda: fn(spark, d).count())
            row[label] = {"cold_s": cold, "warm_s": warm, "rows": n}
        row["warm_ratio"] = round(row["10x"]["warm_s"] / row["1x"]["warm_s"], 1)
        results[name] = row
        print(name, json.dumps(row), flush=True)
        with open(out_json, "w") as fh:
            json.dump(results, fh, indent=2)

    # knn_graph scale path: quantizer grows with the corpus
    from pyspark.sql import functions as F

    from cherry_spark.ext.ivf import knn_graph
    from cherry_spark.sources.tables import load_table

    emb = load_table(spark, big_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cold, n = _time(lambda: knn_graph(emb, k=3, n_centroids=160, nprobe=2).count())
    warm, _ = _time(lambda: knn_graph(emb, k=3, n_centroids=160, nprobe=2).count())
    results["knn_graph_scaled_quantizer"] = {
        "10x": {"cold_s": cold, "warm_s": warm, "rows": n},
        "warm_ratio_vs_1x_fixed": round(
            warm / results["knn_graph"]["1x"]["warm_s"], 1
        ),
    }
    print("knn_graph_scaled_quantizer", json.dumps(results["knn_graph_scaled_quantizer"]), flush=True)

    # prebuilt A/B (r13 verdict item #3): with the quantizer built
    # once per corpus version (the production shape), the scaled-C
    # per-run cost must not exceed fixed-C's — the r13 capture had
    # scaled-C at 2.7x fixed because cogrouping per centroid_id paid
    # Arrow/pandas overhead per GROUP; the r14 centroid-block batching
    # caps the group count regardless of n_centroids.
    import shutil as _sh

    from cherry_spark.ext.ivf import ivf_build_index

    ab: dict = {}
    for label, n_c in (("fixed16", 16), ("scaled160", 160)):
        idx = os.path.join(big_dir, f"ivf_{label}")
        _sh.rmtree(idx, ignore_errors=True)
        build_s, _ = _time(lambda: ivf_build_index(emb, idx, n_centroids=n_c) or 0)
        cold, n = _time(
            lambda: knn_graph(emb, k=3, n_centroids=n_c, nprobe=2, index_dir=idx).count()
        )
        warm, _ = _time(
            lambda: knn_graph(emb, k=3, n_centroids=n_c, nprobe=2, index_dir=idx).count()
        )
        ab[label] = {
            "build_s": build_s,
            "cold_s": cold,
            "warm_s": warm,
            "rows": n,
        }
    ab["scaled_over_fixed_warm"] = round(
        ab["scaled160"]["warm_s"] / ab["fixed16"]["warm_s"], 2
    )
    results["knn_graph_prebuilt_fixed_vs_scaled"] = ab
    print(
        "knn_graph_prebuilt_fixed_vs_scaled",
        json.dumps(ab),
        flush=True,
    )

    with open(out_json, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps({"probe": "scale10x", "out": out_json}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
