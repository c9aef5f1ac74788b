"""Hot-path flatness probe for the pointer-versioned store protocol
(r13): the bus got a 120-append flatness number in r11/r12; this is
the same instrument for writers/store.py after the swap→pointer port.

Each fold of a merge-table maintainer now costs, on top of the Spark
work: one staged version write, one put-if-absent pointer commit, one
sweep (delete superseded version + old pointer), and one pointer
listing per read.  All of those must stay O(1) per fold — the sweep
keeps exactly one pointer and one version alive, so the listing can
never grow with fold count.  This probe runs N count_store_fold
cycles against one store and reports per-fold wall times (first-10 vs
last-10 median — flat ≈ ratio 1.0), plus the end-state invariants
(one pointer, one version dir, store == from-scratch aggregate).

Usage: python tools/scale_probe_store.py [n_folds] [out_json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_folds = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    out_json = sys.argv[2] if len(sys.argv) > 2 else "STORE_probe.json"

    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cherry_spark.session import get_spark
    from cherry_spark.streaming.continuous import count_store_fold
    from cherry_spark.writers import store

    spark = get_spark()
    work = tempfile.mkdtemp(prefix="cherry_store_probe_")
    state = os.path.join(work, "counts")

    def transform(df):
        return df.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n"))

    times: list[float] = []
    for b in range(n_folds):
        batch = spark.createDataFrame(
            [(b * 50 + i, f"k{i % 7}") for i in range(50)],
            "doc_id long, k string",
        )
        t0 = time.perf_counter()
        count_store_fold(
            spark, batch, state, transform, ["k"], batch_key=f"probe-b{b}"
        )
        times.append(time.perf_counter() - t0)

    first10 = statistics.median(times[:10])
    last10 = statistics.median(times[-10:])
    ptrs = [p for p in os.listdir(os.path.join(state, "_v"))]
    vdirs = [d for d in os.listdir(state) if d.startswith("v-")]
    got = {
        (r["k"], r["n"])
        for r in spark.read.parquet(store.data_dir(state)).collect()
    }
    want = {(f"k{i}", n_folds * (8 if i == 0 else 7)) for i in range(7)}
    result = {
        "n_folds": n_folds,
        "per_fold_median_s": round(statistics.median(times), 3),
        "first10_median_s": round(first10, 3),
        "last10_median_s": round(last10, 3),
        "last_over_first": round(last10 / first10, 2),
        "pointers_alive": len(ptrs),
        "versions_alive": len(vdirs),
        "content_exact": got == want,
    }
    shutil.rmtree(work, ignore_errors=True)
    with open(out_json, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
