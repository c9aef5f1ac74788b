"""Incremental corpus-refresh pipeline — the O(churn) story:

    v1 corpus + v2 snapshot
        ──► corpus_diff (full-outer hash join, 40-byte rows)
        ──► audit report (added/removed/changed/unchanged)
        ──► reprocess_manifest (added+changed = the churn set)
        ──► delta_dedup of the CHURN ONLY against the surviving
            corpus (stored-signature seam: the corpus side never
            re-tokenizes)
        ──► next corpus = survivors + admitted churn

A naive refresh reruns the whole dedup stack over v2 — O(corpus).
This pipeline touches each unchanged document exactly zero times
past the hash join: diff moves (id, md5, len) rows, the delta-dedup
batch is the churn set, and the corpus side of the band join comes
from stored signatures. That is the only shape that survives a
100 TB corpus refreshing 1% a day.

Run: python examples/refresh_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def synthesize_v2(v1: DataFrame) -> DataFrame:
    """The deterministic churned snapshot (the queries/versioning.py
    rules): drop every 7th doc, edit every remaining 5th, append a
    shifted-id clone of every 13th."""
    d = F.col("doc_id")
    kept = v1.filter(d % 7 != 0).select(
        "doc_id",
        F.when(d % 5 == 0, F.concat(F.col("text"), F.lit(" [v2 edit]")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = v1.filter(d % 13 == 0).select(
        (d + F.lit(1_000_000)).alias("doc_id"),
        F.concat(F.lit("new in v2: "), F.col("text")).alias("text"),
    )
    return kept.unionByName(added)


def refresh(spark, sf_dir: str) -> dict[str, DataFrame]:
    from cherry_spark.ext.dedup import delta_dedup, minhash_signatures
    from cherry_spark.ext.versioning import (
        corpus_diff,
        corpus_diff_report,
        reprocess_manifest,
    )
    from cherry_spark.sources.tables import load_table

    v1 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    v2 = synthesize_v2(v1)

    # 1. classify the snapshot pair (hash join — never moves text)
    diff = corpus_diff(v1, v2).localCheckpoint(eager=False)
    report = corpus_diff_report(v1, v2)

    # 2. the churn set: only these docs re-enter processing
    manifest = reprocess_manifest(v1, v2)
    churn = manifest.join(v2, "doc_id").select("doc_id", "text")

    # 3. the surviving corpus (v1 minus removed minus stale-changed)
    survivors = v1.join(
        diff.filter(F.col("change_class") == "unchanged").select("doc_id"),
        "doc_id",
    )

    # 4. delta-dedup the churn against the survivors — the corpus
    #    side rides its stored signatures (computed once per corpus
    #    version; inline here for the example, parquet-backed in the
    #    streaming gates), so refresh cost is O(churn x bands).
    surv_sigs = minhash_signatures(survivors)
    verdicts = delta_dedup(
        survivors, churn, corpus_signatures=surv_sigs
    ).localCheckpoint(eager=False)
    admitted = churn.join(
        verdicts.filter(F.col("verdict") == "unique").select(
            F.col("id").alias("doc_id")
        ),
        "doc_id",
    )

    # 5. next corpus version
    v_next = survivors.unionByName(admitted)
    return {
        "report": report,
        "manifest": manifest,
        "verdicts": verdicts,
        "admitted": admitted,
        "v_next": v_next,
    }


def main() -> None:
    from cherry_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("refresh_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    out = refresh(spark, sf_dir)
    print("diff report:")
    for r in out["report"].orderBy("change_class").collect():
        print(f"  {r.change_class}: {r.n_docs} docs")
    n_churn = out["manifest"].count()
    n_admit = out["admitted"].count()
    n_next = out["v_next"].count()
    print(
        f"churn {n_churn} docs -> admitted {n_admit} "
        f"(delta-dedup dropped {n_churn - n_admit}); next corpus {n_next}"
    )


if __name__ == "__main__":
    main()
