"""Empirical 100x scale probe (r15): two decades of measured scaling
for the scale-critical operator families, extending the r12 10x probe
(tools/scale_probe_10x.py) one decade further so the 1x -> 10x ->
100x curve — not a single ratio — is the evidence that the plan
shapes hold toward cluster scale.

Corpus synthesis mirrors the 10x builder (id-remapped copies, per-copy
deterministic word shuffle so copies share essentially no shingles and
the duplicate-class structure is preserved rather than multiplied):

- documents: 100 copies, text word-shuffled per copy (same md5-keyed
  scheme as build_10x);
- embeddings: per-copy rotation by (k mod 64) PLUS a per-copy sign
  pattern (rotation alone degenerates to identity at k >= 64 with
  64-dim vectors, which would union exact-duplicate vector copies and
  measure clone blowup instead of scan scaling; sign flips preserve
  norms and scramble cross-copy cosine);
- orders: 100 id-remapped copies over the SAME node space (ID_STRIDE
  divisible by the edge moduli — domains fixed, links grow, the
  realistic pagerank growth shape).

For each probe: one cold run (includes any fingerprinted store/index
build for the new corpus) and one warm run at 100x; ratios are
computed against the 1x and 10x warm numbers recorded in
SCALE10_probe.json by the 10x probe (same machine class, same
queries).  The knn scale path builds the ~sqrt(N) quantizer
(suggest_n_centroids(200k) ~= 447) with stored probes and serves
through the prebuilt index — the production shape.

Usage: python tools/scale_probe_100x.py [sf_dir] [out_json]
(defaults /root/testdata/sf0.1, SCALE100_probe.json; corpus cached at
/tmp/cherry_scale100x).
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
    "minhash_lsh_dedup",
    "exact_dedup_docs",
    "bm25_topk",
]

N_COPIES = 100
ID_STRIDE = 100_000_000


def build_100x(spark, sf_dir: str, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from cherry_spark.sources.tables import load_table

    os.makedirs(out_dir, exist_ok=True)
    if not os.path.exists(os.path.join(out_dir, "_BUILT")):
        docs = load_table(spark, sf_dir, "documents")
        words = F.split(F.col("text"), " ")
        parts = []
        for k in range(N_COPIES):
            if k == 0:
                text = F.col("text")
            else:
                keyed = F.transform(
                    words,
                    lambda w, i: F.struct(
                        F.md5(
                            F.concat_ws("|", w, F.lit(str(k)), i.cast("string"))
                        ).alias("h"),
                        w.alias("w"),
                    ),
                )
                text = F.array_join(
                    F.transform(F.array_sort(keyed), lambda s: s["w"]), " "
                )
            parts.append(
                docs.select(
                    (F.col("doc_id") + F.lit(k * ID_STRIDE)).alias("doc_id"),
                    text.alias("text"),
                    "lang",
                    "source",
                    F.length(text).cast("long").alias("n_chars"),
                )
            )
        big = parts[0]
        for c in parts[1:]:
            big = big.unionByName(c)
        big.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, "documents.parquet")
        )

        emb = load_table(spark, sf_dir, "embeddings")
        eparts = []
        for k in range(N_COPIES):
            vec = F.col("embedding")
            if k:
                r = k % 64
                if r:
                    vec = F.concat(
                        F.slice(vec, r + 1, 64 - r), F.slice(vec, 1, r)
                    )
                # per-copy sign pattern: rotation alone is identity at
                # k % 64 == 0; signs keep norms, scramble cosine
                # NOTE: pyspark HOF lambdas are invoked EAGERLY at
                # expression build time, so closing over the loop k is
                # safe; a k=k default makes pyspark see a 3-arg lambda
                vec = F.transform(
                    vec,
                    lambda x, i: F.when(
                        ((i * (2 * k + 1) + k) % 3) == 0, -x
                    ).otherwise(x),
                )
            eparts.append(
                emb.select(
                    (F.col("vec_id") + F.lit(k * ID_STRIDE)).alias("vec_id"),
                    vec.alias("embedding"),
                    *[
                        c
                        for c in emb.columns
                        if c not in ("vec_id", "embedding")
                    ],
                )
            )
        ebig = eparts[0]
        for c in eparts[1:]:
            ebig = ebig.unionByName(c)
        ebig.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, "embeddings.parquet")
        )
        open(os.path.join(out_dir, "_BUILT"), "w").close()

    if not os.path.exists(os.path.join(out_dir, "_BUILT_ORDERS")):
        from pyspark.sql import functions as F

        from cherry_spark.sources.tables import load_table

        orders = load_table(spark, sf_dir, "orders")
        oparts = [
            orders.select(
                (F.col("o_orderkey") + F.lit(k * ID_STRIDE)).alias(
                    "o_orderkey"
                ),
                (F.col("o_custkey") + F.lit(k * ID_STRIDE)).alias(
                    "o_custkey"
                ),
                *[
                    c
                    for c in orders.columns
                    if c not in ("o_orderkey", "o_custkey")
                ],
            )
            for k in range(N_COPIES)
        ]
        obig = oparts[0]
        for c in oparts[1:]:
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
    out_json = sys.argv[2] if len(sys.argv) > 2 else "SCALE100_probe.json"
    big_dir = "/tmp/cherry_scale100x"

    # One long session of 100x-scale queries OOM'd an AQE broadcast
    # build at the default 8g heap (local mode: spark.driver.memory IS
    # the whole JVM heap for all 32 threads) — the broadcasts
    # themselves are fine (AQE picks them from MEASURED sizes, so they
    # shrink back to shuffle joins as sides grow past 64MB), but a
    # probe session accumulates broadcast refs faster than the
    # ContextCleaner drops them.  A bench A/B showed NO sf0.1 win from
    # 32g, so the certified/bench default stays 8g; only this probe
    # raises its own session.
    os.environ.setdefault("CHERRY_SPARK_DRIVER_MEM", "32g")

    import cherry_spark.queries  # noqa: F401 - registration
    from cherry_spark.catalog import REGISTRY
    from cherry_spark.session import get_spark

    spark = get_spark("scale100_probe")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    build_100x(spark, sf_dir, big_dir)
    build_s = round(time.perf_counter() - t0, 1)

    ten: dict = {}
    ten_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE10_probe.json",
    )
    if os.path.exists(ten_path):
        with open(ten_path) as fh:
            ten = json.load(fh)

    results: dict = {"corpus_build_s": build_s, "n_copies": N_COPIES}
    if os.path.exists(out_json):
        with open(out_json) as fh:
            prior = json.load(fh)
        prior.update(results)
        results = prior
    for name in PROBES:
        fn = REGISTRY[name].fn
        cold, n = _time(lambda: fn(spark, big_dir).count())
        warm, _ = _time(lambda: fn(spark, big_dir).count())
        row = {"cold_s": cold, "warm_s": warm, "rows": n}
        prev = ten.get(name, {})
        if prev.get("10x", {}).get("warm_s"):
            row["warm_ratio_vs_10x"] = round(warm / prev["10x"]["warm_s"], 1)
        one = prev.get("1x", {}).get("warm_s")
        if one is None:
            # not covered by the 10x artifact: measure 1x here so the
            # probe still records a curve, not a lone number
            c1, _ = _time(lambda: fn(spark, sf_dir).count())
            one, _ = _time(lambda: fn(spark, sf_dir).count())
            row["warm_1x_s"] = one
        if one:
            row["warm_ratio_vs_1x"] = round(warm / one, 1)
        results[name] = row
        print(name, json.dumps(row), flush=True)
        with open(out_json, "w") as fh:
            json.dump(results, fh, indent=2)

    # knn scale path: ~sqrt(N) quantizer, prebuilt with stored probes,
    # served through the index — the production 100 TB contract
    from pyspark.sql import functions as F

    from cherry_spark.ext.ivf import (
        ivf_build_index,
        knn_graph,
        suggest_n_centroids,
    )
    from cherry_spark.sources.tables import load_table
    from cherry_spark.writers import store

    emb = load_table(spark, big_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n_vec = emb.count()
    n_c = suggest_n_centroids(n_vec)
    idx = os.path.join(big_dir, f"ivf_c{n_c}")
    if not store.ready(os.path.join(idx, "centroids")):
        import shutil

        shutil.rmtree(idx, ignore_errors=True)
        ib_s, _ = _time(
            lambda: ivf_build_index(emb, idx, n_centroids=n_c, store_probes=4)
            or 0
        )
    else:
        ib_s = None
    run = lambda: knn_graph(  # noqa: E731
        emb, k=3, n_centroids=n_c, nprobe=2, index_dir=idx
    ).count()
    cold, n = _time(run)
    warm, _ = _time(run)
    row = {
        "n_vectors": n_vec,
        "n_centroids": n_c,
        "cold_s": cold,
        "warm_s": warm,
        "rows": n,
    }
    if ib_s is not None:
        row["index_build_s"] = ib_s
    prev = ten.get("knn_graph_prebuilt_fixed_vs_scaled", {}).get(
        "scaled160", {}
    )
    if prev.get("warm_s"):
        row["warm_ratio_vs_10x_scaled"] = round(warm / prev["warm_s"], 1)
    results["knn_graph_scaled_prebuilt"] = row
    print("knn_graph_scaled_prebuilt", json.dumps(row), flush=True)
    with open(out_json, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps({"probe": "scale100", "out": out_json}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
