"""Curate-then-index: the full production ingestion loop composed —

  incoming docs (+ embeddings)
    -> TRAINED QUALITY GATE           (run_streaming_trained_gate —
       the fixed-point BIGINT classifier of ext/train.py scores every
       batch with the CURRENT stored model, REFITS from the freshly
       labeled arrivals at corpus-version boundaries, and hot-swaps
       the weights store crash-safely; model-rejected docs stop here,
       survivors carry their score_micro forward as the curation
       quality column — r10, the train-then-curate composition)
    -> COMPOSED ADMISSION GATE        (decontaminate -> lexical dedup
       -> semantic dedup -> token budget; streaming/continuous.py:
       run_streaming_curation_gate — only admitted docs reach storage)
    -> admitted-text BUS              (the gate's MANIFEST-LOG mirror,
       `text_bus_dir=` — consumers track manifest versions, so the
       bus compacts under live checkpoints; the raw `state/text` dir
       is now a plain store with no streaming consumer, compactable
       like every other one — r12, the last raw-lane consumer moved)
    -> INDEX MAINTAINERS              (run_streaming_bm25_index AND
       run_streaming_pair_graph both fold the manifest bus through
       the cherry_bus DataSource — both see ONLY admitted docs, so
       search and the near-dup cluster graph are fresh the moment
       admission lands and rejected docs never enter an index; the
       bus is then COMPACTED and the served snapshot re-verified)
    -> serve                          (bm25_topk from the maintained
       index — verified identical to an inline build over exactly the
       admitted set; pair-graph edge count reported)

Each stage keeps its own checkpoint, so admission and indexing
restart independently; the maintainers' exactness contracts
(store == from-scratch over everything folded) are what make the
composition verifiable end-to-end.

Bus caveat: a raw-parquet bus must stay APPEND-ONLY — never
``compact_state_dir`` a dir a downstream file-source stream reads
(compaction renames files; file-source checkpoints track names, so
compacted rows re-deliver). Compact the maintainers' own state, or
give the bus a log: ``run_streaming_curation_gate(...,
text_bus_dir=...)`` mirrors admissions onto a MANIFEST-LOG BUS
(writers/manifest_bus.py) whose downstream consumers (the
``cherry_bus`` DataSource) track manifest VERSIONS instead of file
names — that bus compacts freely (``bus_compact``) under running and
restarted streams.  Delta/Iceberg are the connector-world equivalent.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, sf_dir: str, work_dir: str, budget: int = 50_000) -> dict:
    from pyspark.sql import functions as F

    from cherry_spark.ext.bm25 import bm25_topk
    from cherry_spark.ext.text import token_count
    from cherry_spark.queries.curation import _density_label_col
    from cherry_spark.sources.tables import load_table
    from cherry_spark.streaming.continuous import (
        run_streaming_bm25_index,
        run_streaming_curation_gate,
        run_streaming_pair_graph,
        run_streaming_trained_gate,
    )

    shutil.rmtree(work_dir, ignore_errors=True)
    os.makedirs(work_dir)
    src_dir = f"{work_dir}/incoming"
    scored_dir = f"{work_dir}/scored"  # trained-gate -> curation bus
    out_dir = f"{work_dir}/verdicts"

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    staged = (
        docs.join(emb, "doc_id", "inner")
        .select(
            "doc_id",
            "text",
            F.col("embedding").cast("array<double>").alias("embedding"),
            token_count(F.col("text")).cast("long").alias("n_tokens"),
        )
        .localCheckpoint(eager=True)
    )
    for i in range(3):
        staged.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        time.sleep(1.1)

    def file_stream(path, sch):
        return (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )

    # stage 0: trained quality gate — score with the current model,
    # refit + hot-swap at the batch-2 corpus-version boundary (the
    # same labeling recipe the trained_quality_gate query certifies);
    # survivors carry score_micro forward as the curation quality
    model_versions: list[int] = []
    n_model_rejected: list[int] = []

    def scored_sink(verdicts, batch_id):
        model_versions.append(
            int(verdicts.agg(F.max("model_version")).first()[0])
        )
        n_model_rejected.append(verdicts.filter(F.col("keep") == 0).count())
        verdicts.filter(F.col("keep") == 1).drop("n_tokens").join(
            staged, "doc_id"
        ).select(
            "doc_id",
            "text",
            "embedding",
            (F.col("score_micro") / 1e6).alias("quality"),
            F.col("n_tokens"),
        ).write.mode("append").parquet(scored_dir)

    qt = run_streaming_trained_gate(
        spark,
        file_stream(src_dir, staged.schema),
        f"{work_dir}/model_state",
        scored_sink,
        f"{work_dir}/ckpt_trained",
        label_expr=_density_label_col(),
        refit_every=2,
    )
    qt.awaitTermination(300)

    schema = (
        "doc_id long, text string, embedding array<double>, "
        "quality double, n_tokens long"
    )

    # stage 1: admission over the model-admitted bus
    def verdict_sink(verdicts, batch_id):
        verdicts.write.mode("append").parquet(out_dir)

    text_bus = f"{work_dir}/text_bus"
    q = run_streaming_curation_gate(
        spark,
        file_stream(scored_dir, schema),
        f"{work_dir}/state",
        verdict_sink,
        f"{work_dir}/ckpt_gate",
        budget=budget,
        jaccard_threshold=0.5,
        semantic_threshold=0.95,
        text_bus_dir=text_bus,  # r11: the compactable manifest mirror
    )
    q.awaitTermination(300)

    # stage 2: the admitted-text manifest bus is the ONLY indexing
    # source (r12) — both maintainers consume it through the
    # cherry_bus DataSource, leaving the raw state/text dir a plain
    # store with no streaming consumer
    from cherry_spark.sources.manifest_bus_datasource import (
        ManifestBusDataSource,
    )

    spark.dataSource.register(ManifestBusDataSource)
    admitted_src = f"{work_dir}/state/text"

    def bus_stream():
        return (
            spark.readStream.format("cherry_bus")
            .option("path", text_bus)
            .load()
        )

    # drain_bus (r13): loop availableNow runs until each maintainer's
    # checkpoint has committed through the bus head — a single run can
    # legitimately stop early (pending-batch restart, rate cap)
    from cherry_spark.writers.manifest_bus import drain_bus
    from cherry_spark.writers.store import data_dir as dd

    drain_bus(
        lambda: run_streaming_bm25_index(
            spark,
            bus_stream(),
            f"{work_dir}/bm25",
            lambda s, b: None,
            f"{work_dir}/ckpt_bm25",
        ),
        text_bus,
        f"{work_dir}/ckpt_bm25",
        timeout_secs=300,
    )
    drain_bus(
        lambda: run_streaming_pair_graph(
            spark,
            bus_stream(),
            f"{work_dir}/graph",
            lambda s, b: None,
            f"{work_dir}/ckpt_graph",
            threshold=0.5,
        ),
        text_bus,
        f"{work_dir}/ckpt_graph",
        timeout_secs=300,
    )

    # serve + verify: maintained index == inline build over EXACTLY
    # the admitted set
    admitted = spark.read.parquet(admitted_src)
    qdf = admitted.orderBy("doc_id").limit(2).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    canon = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    served = canon(bm25_topk(None, qdf, k=5, index_dir=f"{work_dir}/bm25"))
    inline = canon(bm25_topk(admitted, qdf, k=5))

    # the manifest lane's payoff: compact the drained bus under BOTH
    # maintainers' live checkpoints — the snapshot stays complete and
    # restarted maintainers re-deliver nothing (offsets are manifest
    # versions; a raw file-source lane can never do this).  The
    # mechanical lag guard makes this safe even if a maintainer were
    # still behind.
    from cherry_spark.writers.manifest_bus import (
        bus_compact,
        bus_consumer_version,
        bus_snapshot,
        live_files,
    )

    bus_files_before = len(live_files(text_bus))
    bus_compact(
        spark,
        text_bus,
        keep_after_version=min(
            bus_consumer_version(f"{work_dir}/ckpt_bm25"),
            bus_consumer_version(f"{work_dir}/ckpt_graph"),
        ),
    )
    bus_files_after = len(live_files(text_bus))
    bus_rows = bus_snapshot(spark, text_bus).count()

    verdicts = spark.read.parquet(out_dir)
    counts = {
        r["verdict"]: r["n"]
        for r in verdicts.groupBy("verdict")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_admitted = admitted.count()
    return {
        "counts": counts,
        "model_versions": model_versions,
        "n_model_rejected": sum(n_model_rejected),
        "n_admitted": n_admitted,
        "search_matches_inline": served == inline,
        "n_search_rows": len(served),
        "n_neardup_edges": spark.read.parquet(
            dd(f"{work_dir}/graph/pairs")
        ).count(),
        "bus_files": (bus_files_before, bus_files_after),
        "bus_snapshot_complete": bus_rows == n_admitted,
    }


if __name__ == "__main__":
    from cherry_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = run(get_spark("curate_index_example"), sf, "/tmp/curate_index_out")
    print(
        f"model versions per batch {out['model_versions']} "
        f"({out['n_model_rejected']} model-rejected) | "
        f"verdicts {out['counts']} | {out['n_admitted']} admitted | "
        f"search matches inline: {out['search_matches_inline']} "
        f"({out['n_search_rows']} rows) | "
        f"{out['n_neardup_edges']} near-dup edges | "
        f"bus {out['bus_files'][0]}->{out['bus_files'][1]} files, "
        f"snapshot complete: {out['bus_snapshot_complete']}"
    )
