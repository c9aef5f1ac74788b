"""Composed curate->train->index pipeline probe at bench scale (r11,
r10 verdict item #5): the flagship composition of
examples/curate_index_pipeline.py — trained quality gate -> composed
admission gate (decontam/lexical/semantic/budget) -> store-as-bus ->
bm25 + pair-graph maintainers — run as ONE streaming session over 10
arrivals of the full sf0.1 documents+embeddings join, with per-fold
wall times recorded at every stage and the maintained stores verified
against batch-built equivalents over exactly the admitted set.

What "pass" means here:

- per-fold times at every stage stay FLAT across the 10 arrivals
  (modulo the trained gate's refit folds, which are bounded by
  ``retain_docs`` — r11 — and so must also be flat among themselves);
- the maintained bm25 index serves IDENTICAL top-k to an inline build
  over the admitted store, and the pair graph's edges equal a
  from-scratch jaccard_pairs over the same corpus;
- admission counts are internally consistent (admitted + rejected
  classes == model-survivor count);
- (r12, verdict item #5) BOTH maintainers — bm25 AND the pair graph —
  consume the gate's MANIFEST-LOG bus mirror (text_bus_dir ->
  cherry_bus DataSource): with both lanes drained the bus compacts to
  few files under their live checkpoints (keep_after_version = the
  minimum consumer version, the mechanical guard) and BOTH restarts
  after the compaction re-deliver ZERO rows.  No raw file-source
  consumer remains, so the admitted ``text/`` dir is a plain store
  again — compactable like every other one.

Usage: python tools/scale_probe_pipeline.py [sf_dir] [n_arrivals]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from cherry_spark.ext.bm25 import bm25_topk
    from cherry_spark.ext.text import token_count
    from cherry_spark.queries.curation import _density_label_col
    from cherry_spark.session import get_spark
    from cherry_spark.sources.tables import load_table
    from cherry_spark.streaming.continuous import (
        run_streaming_bm25_index,
        run_streaming_curation_gate,
        run_streaming_pair_graph,
        run_streaming_trained_gate,
    )

    sf_dir = next(
        (a for a in sys.argv[1:] if not a.isdigit()), "/root/testdata/sf0.1"
    )
    n_arrivals = int(
        next((a for a in sys.argv[1:] if a.isdigit()), "10")
    )
    work = "/tmp/cherry_probe_pipeline"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    src_dir = f"{work}/incoming"
    scored_dir = f"{work}/scored"
    out_dir = f"{work}/verdicts"

    spark = get_spark("pipeline_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

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
    n_staged = staged.count()
    for i in range(n_arrivals):
        staged.filter(F.col("doc_id") % n_arrivals == i).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        time.sleep(1.1)

    def file_stream(path, sch):
        return (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )

    def timed_sink(marks: list, inner=None):
        def sink(df, batch_id):
            if inner is not None:
                inner(df, batch_id)
            else:
                df.write.format("noop").mode("overwrite").save()
            marks.append(time.perf_counter())
        return sink

    def fold_times(marks: list, t0: float) -> list:
        prev, out = t0, []
        for m in marks:
            out.append(round(m - prev, 1))
            prev = m
        return out

    # stage 0: trained quality gate (bounded refit, r11 default)
    tg_marks: list = []
    n_model_rejected: list = []

    def scored_sink(verdicts, batch_id):
        n_model_rejected.append(verdicts.filter(F.col("keep") == 0).count())
        # ONE file per fold: the downstream curation gate reads this
        # dir with maxFilesPerTrigger=1, so the file count IS its fold
        # count — an uncoalesced write turned the r14 10x probe into
        # ~100 small folds and measured fold COUNT instead of batch
        # size (r14 verdict item #2)
        verdicts.filter(F.col("keep") == 1).drop("n_tokens").join(
            staged, "doc_id"
        ).select(
            "doc_id",
            "text",
            "embedding",
            (F.col("score_micro") / 1e6).alias("quality"),
            F.col("n_tokens"),
        ).coalesce(1).write.mode("append").parquet(scored_dir)

    t0 = time.perf_counter()
    qt = run_streaming_trained_gate(
        spark,
        file_stream(src_dir, staged.schema),
        f"{work}/model_state",
        timed_sink(tg_marks, scored_sink),
        f"{work}/ckpt_trained",
        label_expr=_density_label_col(),
        refit_every=4,
    )
    qt.awaitTermination(1200)
    tg_times = fold_times(tg_marks, t0)

    schema = (
        "doc_id long, text string, embedding array<double>, "
        "quality double, n_tokens long"
    )

    # stage 1: composed admission gate over the model-survivor bus
    cg_marks: list = []

    def verdict_sink(verdicts, batch_id):
        verdicts.write.mode("append").parquet(out_dir)

    text_bus = f"{work}/text_bus"
    t0 = time.perf_counter()
    q = run_streaming_curation_gate(
        spark,
        file_stream(scored_dir, schema),
        f"{work}/state",
        timed_sink(cg_marks, verdict_sink),
        f"{work}/ckpt_gate",
        budget=10_000_000,
        jaccard_threshold=0.5,
        semantic_threshold=0.95,
        text_bus_dir=text_bus,  # r11: manifest-log mirror of text/
    )
    q.awaitTermination(1800)
    cg_times = fold_times(cg_marks, t0)

    # stage 2: BOTH maintainers over the MANIFEST BUS (r12) — no raw
    # file-source consumer remains on the admitted text/ store
    from cherry_spark.sources.manifest_bus_datasource import (
        ManifestBusDataSource,
    )
    from cherry_spark.writers.manifest_bus import (
        bus_compact,
        bus_consumer_version,
        live_files,
    )

    spark.dataSource.register(ManifestBusDataSource)
    admitted_src = f"{work}/state/text"
    bm_marks: list = []
    pg_marks: list = []

    def bus_stream():
        return (
            spark.readStream.format("cherry_bus")
            .option("path", text_bus)
            .load()
        )

    from cherry_spark.writers.manifest_bus import drain_bus

    t0 = time.perf_counter()
    drain_bus(
        lambda: run_streaming_bm25_index(
            spark,
            bus_stream(),
            f"{work}/bm25",
            timed_sink(bm_marks),
            f"{work}/ckpt_bm25",
        ),
        text_bus,
        f"{work}/ckpt_bm25",
        timeout_secs=1200,
    )
    bm_times = fold_times(bm_marks, t0)

    t0 = time.perf_counter()
    drain_bus(
        lambda: run_streaming_pair_graph(
            spark,
            bus_stream(),
            f"{work}/graph",
            timed_sink(pg_marks),
            f"{work}/ckpt_graph",
            threshold=0.5,
        ),
        text_bus,
        f"{work}/ckpt_graph",
        timeout_secs=1200,
    )
    pg_times = fold_times(pg_marks, t0)

    # compact under BOTH live checkpoints with the mechanical lag
    # guard, then restart BOTH maintainers: zero re-delivery (offsets
    # are manifest versions, not file names)
    keep_after = min(
        bus_consumer_version(f"{work}/ckpt_bm25"),
        bus_consumer_version(f"{work}/ckpt_graph"),
    )
    bus_files_before = len(live_files(text_bus))
    bus_compact(
        spark,
        text_bus,
        target_file_bytes=128 * 1024 * 1024,
        keep_after_version=keep_after,
    )
    bus_files_after = len(live_files(text_bus))
    bm_replay_marks: list = []
    qb2 = run_streaming_bm25_index(
        spark,
        bus_stream(),
        f"{work}/bm25",
        timed_sink(bm_replay_marks),
        f"{work}/ckpt_bm25",
    )
    qb2.awaitTermination(1200)
    qg2 = run_streaming_pair_graph(
        spark,
        bus_stream(),
        f"{work}/graph",
        timed_sink([]),
        f"{work}/ckpt_graph",
        threshold=0.5,
    )
    qg2.awaitTermination(1200)
    # dl holds one row per doc ever folded: > n_admitted would mean
    # the compaction re-delivered rows into the bm25 maintainer; the
    # sizes table is the pair graph's per-doc twin
    n_dl = spark.read.parquet(f"{work}/bm25/dl").count()
    n_sizes = spark.read.parquet(f"{work}/graph/sizes").count()

    # verification: maintained stores == batch equivalents over
    # exactly the admitted corpus
    admitted = spark.read.parquet(admitted_src)
    n_admitted = admitted.count()
    qdf = admitted.orderBy("doc_id").limit(3).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    canon = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    served = canon(bm25_topk(None, qdf, k=5, index_dir=f"{work}/bm25"))
    inline = canon(bm25_topk(admitted, qdf, k=5))

    from cherry_spark.ext.dedup import ngram_jaccard_pairs

    maintained_edges = canon(spark.read.parquet(f"{work}/graph/pairs"))
    scratch_edges = canon(ngram_jaccard_pairs(admitted, threshold=0.5))

    verdicts = spark.read.parquet(out_dir)
    counts = {
        r["verdict"]: r["n"]
        for r in verdicts.groupBy("verdict")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_survivors = n_staged - sum(n_model_rejected)
    print(
        f"[pipeline sf={sf_dir} arrivals={n_arrivals}] staged {n_staged} "
        f"docs, {sum(n_model_rejected)} model-rejected, "
        f"verdict counts {counts} (sum "
        f"{sum(counts.values())} == survivors {n_survivors}: "
        f"{'OK' if sum(counts.values()) == n_survivors else 'MISMATCH'})"
    )
    print(f"[trained gate] per-fold s: {tg_times}")
    print(f"[curation gate] per-fold s: {cg_times}")
    print(f"[bm25 maintainer over cherry_bus] per-fold s: {bm_times}")
    print(f"[pair graph over cherry_bus] per-fold s: {pg_times}")
    print(
        f"[bus] live files {bus_files_before} -> {bus_files_after} after "
        f"guarded bus_compact (keep_after_version={keep_after}); restarts "
        f"after compaction re-delivered {n_dl - n_admitted} rows to bm25 "
        f"and {n_sizes - n_admitted} to the pair graph "
        f"({'OK' if n_dl == n_admitted and n_sizes == n_admitted else 'MISMATCH'})"
    )

    # artifact for cross-run comparison (the r13 verdict item #6 10x
    # streaming-substrate probe reads two of these side by side)
    import json

    art_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STREAM_probe.json",
    )
    art: dict = {}
    if os.path.exists(art_path):
        with open(art_path) as fh:
            art = json.load(fh)
    art[f"{os.path.basename(sf_dir.rstrip('/'))}_x{n_arrivals}"] = {
        "staged": n_staged,
        "model_rejected": sum(n_model_rejected),
        "verdicts": counts,
        "counts_consistent": sum(counts.values()) == n_survivors,
        "trained_gate_folds_s": tg_times,
        "curation_gate_folds_s": cg_times,
        "bm25_folds_s": bm_times,
        "pair_graph_folds_s": pg_times,
        "bus_files": [bus_files_before, bus_files_after],
        "redelivered": [n_dl - n_admitted, n_sizes - n_admitted],
        "bm25_serve_matches_inline": served == inline,
        "pair_graph_matches_scratch": maintained_edges == scratch_edges,
    }
    with open(art_path, "w") as fh:
        json.dump(art, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"[verify] admitted {n_admitted}; bm25 maintained (via bus) == "
        f"inline: {'OK' if served == inline else 'MISMATCH'} "
        f"({len(served)} rows); pair graph == from-scratch: "
        f"{'OK' if maintained_edges == scratch_edges else 'MISMATCH'} "
        f"({len(maintained_edges)} edges)"
    )


if __name__ == "__main__":
    main()
