"""Like-for-like quiet A/B of individual bench queries (round-8
verdict item #3: confirm or refute the r08 drifts on `semantic_dedup`
1.78→2.45 s and `unigram_logprob` 0.97→1.36 s).

Usage (run once per tree, back-to-back in one quiet session):

    cd <tree> && python /root/repo/tools/ab_drift.py q1 q2 ...

The tree is whatever working copy the cwd points at (HEAD, or a
`git worktree add .ab_r07 e63e5f7` checkout of the round-7 close), so
the SAME harness times BOTH code versions: one cold pass per query to
build any stores/indexes outside the timed region, then 5 warm passes,
reporting median and [min,max].  Single-sample warm numbers from the
full bench suite carry up-to-±25% machine-state spread
(COVERAGE.md r8 note); medians of 5 in a dedicated quiet JVM are the
instrument the drift question actually needs.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: ab_drift.py QUERY [QUERY...]", file=sys.stderr)
        sys.exit(2)
    tree = os.getcwd()
    sys.path.insert(0, tree)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from cherry_spark.catalog import REGISTRY
    from cherry_spark.session import get_spark

    import cherry_spark.queries  # noqa: F401  (registration)

    spark = get_spark("cherry_spark_ab")
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    # JVM warmup identical to bench.py's
    materialize(REGISTRY["flagship_revenue_by_nation"].fn(spark, sf_dir))

    out = {"tree": tree, "sf_dir": sf_dir, "queries": {}}
    for name in names:
        fn = REGISTRY[name].fn
        # THREE untimed passes, not one (r11): a fresh dedicated JVM
        # under-JITs paths the 62-query suite JVM has long compiled —
        # training_shards read 0.63 here vs 0.29 in the suite until
        # the C2 tier caught up. Cross-JVM comparisons (this tool vs a
        # bench artifact) stay apples-to-oranges; compare ab_drift
        # runs only against ab_drift runs in the same session.
        for _ in range(3):
            materialize(fn(spark, sf_dir))
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
        runs.sort()
        out["queries"][name] = {
            "median": runs[2],
            "min": runs[0],
            "max": runs[-1],
            "runs": runs,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
