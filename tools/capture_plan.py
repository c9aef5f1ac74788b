"""Capture the EXECUTED plan (AQE final, isFinalPlan=true) of registered
queries into plans/<round>/<query>_<tag>.txt.

Usage:

    cd <tree> && python /root/repo/tools/capture_plan.py r15 after q1 q2 ...

Runs each query once through the noop sink (so AQE finalizes every
stage), then writes the post-run simple-tree explain string — the same
form the existing plans/r15/*.txt evidence uses. The tree is the cwd
(HEAD worktree or the working tree), so before/after pairs come from
the same harness.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    if len(sys.argv) < 4:
        print("usage: capture_plan.py ROUND TAG QUERY [QUERY...]", file=sys.stderr)
        sys.exit(2)
    rnd, tag, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    tree = os.getcwd()
    sys.path.insert(0, tree)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join("/root/repo", "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)

    from cherry_spark.catalog import REGISTRY
    from cherry_spark.session import get_spark

    import cherry_spark.queries  # noqa: F401  (registration)

    spark = get_spark("cherry_spark_plan_capture")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        spark.sparkContext.setJobDescription(f"plan capture: {name}")
        df = REGISTRY[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        jqe = df._jdf.queryExecution()
        text = jqe.executedPlan().toString()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
