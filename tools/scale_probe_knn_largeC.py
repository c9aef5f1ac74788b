"""Large-C probe for knn_graph's centroid-block candidate lane (r14
verdict item #7 — the one untested corner of the r14 block cogroup).

The ≤32-block dense-id modulo caps per-group Arrow/pandas overhead,
but at C >> 32 each block packs C/32 centroids and the masked-BLAS
matmul scores every (member-of-block x probing-query) pair — wasted
FLOPs grow with block WIDTH.  This probe measures the prebuilt serve
path at C in {160, 512, 1024} x centroid_blocks in {32, 64, 128} on
the 10x corpus and records the grid in SCALE10_probe.json
("knn_graph_largeC") so the centroid_blocks policy is data, not
guesswork.

Usage: python tools/scale_probe_knn_largeC.py [big_dir] [out_json]
[blocks_csv] (defaults: /tmp/cherry_scale10x — build it with
scale_probe_10x.py first — SCALE10_probe.json, and "32,64,128"; pass
a reversed blocks_csv to de-bias within-C run-order effects).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 2), n


def main() -> int:
    big_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cherry_scale10x"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "SCALE10_probe.json"
    blocks_list = (
        [int(b) for b in sys.argv[3].split(",")]
        if len(sys.argv) > 3
        else [32, 64, 128]
    )

    from pyspark.sql import functions as F

    from cherry_spark.ext.ivf import ivf_build_index, knn_graph
    from cherry_spark.session import get_spark
    from cherry_spark.sources.tables import load_table
    from cherry_spark.writers import store

    spark = get_spark("knn_largeC_probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, big_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )

    grid: dict[str, dict] = {}
    expect_rows = None
    for n_c in (160, 512, 1024):
        idx = os.path.join(big_dir, f"ivf_c{n_c}")
        # ready(), not bare existence: a crashed prior build leaves
        # the dir without a committed pointer (r15 review)
        if not store.ready(os.path.join(idx, "centroids")):
            shutil.rmtree(idx, ignore_errors=True)
            build_s, _ = _time(
                lambda: ivf_build_index(
                    emb, idx, n_centroids=n_c, store_probes=4
                )
                or 0
            )
        else:
            build_s = None  # reused from a prior run
        for blocks in blocks_list:
            run = lambda: knn_graph(  # noqa: E731
                emb,
                k=3,
                n_centroids=n_c,
                nprobe=2,
                index_dir=idx,
                centroid_blocks=blocks,
            ).count()
            cold, n = _time(run)
            warm, _ = _time(run)
            if expect_rows is None:
                expect_rows = n
            # the blocking lane must never change the output SIZE
            assert n == expect_rows, (n_c, blocks, n, expect_rows)
            row = {"cold_s": cold, "warm_s": warm, "rows": n}
            if build_s is not None:
                row["build_s"] = build_s
                build_s = None
            grid[f"c{n_c}_b{blocks}"] = row
            print(f"c{n_c}_b{blocks}", json.dumps(row), flush=True)

    results: dict = {}
    if os.path.exists(out_json):
        with open(out_json) as fh:
            results = json.load(fh)
    results["knn_graph_largeC"] = grid
    with open(out_json, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps({"probe": "knn_largeC", "out": out_json}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
