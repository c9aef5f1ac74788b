"""Writers + continuous/streaming tests: anchor-last ordering, DuckDB
transactional batch, parquet round-trip, replay-driven pipeline with
cursor resume, structured streaming drain."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from cherry_spark.plans import Pipeline, SetChainIdConfig, Step, StepKind
from cherry_spark.streaming import range_batches, read_resume_cursor, run_continuous
from cherry_spark.writers import (
    DuckDbWriterConfig,
    ParquetWriterConfig,
    create_writer,
)
from cherry_spark.writers.clickhouse_writer import create_table_ddl, spark_type_to_clickhouse
from cherry_spark.writers.store import data_dir as dd


def test_parquet_writer_anchor_order(spark, tmp_path):
    cfg = ParquetWriterConfig(path=str(tmp_path), anchor_table="blocks")
    w = create_writer(cfg)
    batch = {
        "blocks": spark.createDataFrame([(1,)], "number long"),
        "logs": spark.createDataFrame([(1, "x")], "block_number long, v string"),
    }
    assert w.anchor_last_order(batch) == ["logs", "blocks"]
    w.push_data(batch)
    assert spark.read.parquet(str(tmp_path / "logs")).count() == 1
    assert spark.read.parquet(str(tmp_path / "blocks")).count() == 1
    # append semantics
    w.push_data(batch)
    assert spark.read.parquet(str(tmp_path / "blocks")).count() == 2


def test_duckdb_writer_transactional(spark, tmp_path):
    db = str(tmp_path / "out.duckdb")
    w = create_writer(DuckDbWriterConfig(db_path=db, staging_dir=str(tmp_path / "stage")))
    batch = {
        "a": spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string"),
        "b": spark.createDataFrame([(9.5,)], "val double"),
    }
    w.push_data(batch)
    w.push_data(batch)  # second push must INSERT, not recreate
    con = duckdb.connect(db)
    assert con.execute("SELECT count(*) FROM a").fetchone()[0] == 4
    assert con.execute("SELECT count(*) FROM b").fetchone()[0] == 2
    con.close()


def test_clickhouse_ddl_compiler(spark):
    df = spark.createDataFrame(
        [(1, "x", b"\x00", 1.5)], "id long, name string, raw binary, score double"
    )
    ddl = create_table_ddl(
        "t", df.schema, order_by=["id"], codecs={"raw": "ZSTD(3)"}
    )
    assert "`id` Nullable(Int64)" in ddl
    assert "`raw` Nullable(String) CODEC(ZSTD(3))" in ddl
    assert ddl.endswith("ENGINE = MergeTree() ORDER BY (id)")
    from pyspark.sql import types as T

    assert spark_type_to_clickhouse(T.DecimalType(38, 0)) == "Decimal(38, 0)"
    assert (
        spark_type_to_clickhouse(T.ArrayType(T.FloatType())) == "Array(Float32)"
    )
    assert (
        spark_type_to_clickhouse(T.MapType(T.StringType(), T.LongType()))
        == "Map(String, Int64)"
    )


def test_replay_pipeline_with_cursor_resume(spark, sf_dir, tmp_path):
    """End-to-end continuous run: replay events in cursor windows through
    a step chain into parquet, then resume from the written cursor."""
    from cherry_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").withColumn(
        "batch_key", (F.col("event_id") / 100).cast("long")
    )
    out = str(tmp_path / "sink")
    pipeline = Pipeline(
        source=None,
        steps=[Step(StepKind.SET_CHAIN_ID, SetChainIdConfig(1))],
        writer=create_writer(ParquetWriterConfig(path=out, anchor_table="events")),
    )
    batches = range_batches(
        spark, {"events": events}, {"events": "event_id"}, lo=0, hi=499, batch_size=250
    )
    n = run_continuous(spark, pipeline, batches)
    assert n == 2
    written = spark.read.parquet(os.path.join(out, "events"))
    assert written.count() == 500
    assert written.select(F.max("chain_id")).first()[0] == 1

    cursor = read_resume_cursor(spark, os.path.join(out, "events"), "event_id")
    assert cursor == 499
    # resume: next window starts after the cursor
    more = range_batches(
        spark, {"events": events}, {"events": "event_id"}, lo=cursor + 1, hi=599, batch_size=100
    )
    assert run_continuous(spark, pipeline, more) == 1
    assert spark.read.parquet(os.path.join(out, "events")).count() == 600
    # fresh-start path
    assert read_resume_cursor(spark, str(tmp_path / "missing"), "event_id") is None


def test_streaming_delta_dedup_matches_batch(spark, sf_dir, tmp_path):
    """Streaming ingestion gate: documents arrive as a file stream and
    each micro-batch is classified against the static corpus; the union
    of streamed verdicts equals the batch delta_dedup output."""
    from cherry_spark.ext.dedup import delta_dedup
    from cherry_spark.sources.tables import load_table
    from cherry_spark.streaming import run_streaming_delta_dedup

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch_docs = docs.filter(F.col("doc_id") % 5 == 0)

    src_dir = str(tmp_path / "incoming")
    # two "arrivals" -> at least two files for the stream to pick up
    batch_docs.filter(F.col("doc_id") % 10 == 0).write.mode("append").parquet(src_dir)
    batch_docs.filter(F.col("doc_id") % 10 != 0).write.mode("append").parquet(src_dir)

    stream_df = spark.readStream.schema(batch_docs.schema).parquet(src_dir)
    out = str(tmp_path / "verdicts")

    def sink(verdicts, batch_id):
        verdicts.write.mode("append").parquet(out)

    q = run_streaming_delta_dedup(
        spark, stream_df, corpus, sink, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)

    streamed = {
        (r["id"], r["verdict"]) for r in spark.read.parquet(out).collect()
    }
    expected = {
        (r["id"], r["verdict"]) for r in delta_dedup(corpus, batch_docs).collect()
    }
    assert streamed == expected and len(streamed) == batch_docs.count()


def test_structured_stream_drain(spark, sf_dir, tmp_path):
    """Native Structured Streaming path: file source -> foreachBatch
    running the step chain -> parquet sink, availableNow drain."""
    from cherry_spark.sources.tables import load_table
    from cherry_spark.streaming import run_structured_stream

    src_dir = str(tmp_path / "src")
    load_table(spark, sf_dir, "events").drop("ts").write.parquet(src_dir)
    stream_df = spark.readStream.schema(
        spark.read.parquet(src_dir).schema
    ).parquet(src_dir)

    out = str(tmp_path / "sink")
    pipeline = Pipeline(
        source=None,
        steps=[Step(StepKind.SET_CHAIN_ID, SetChainIdConfig(42))],
        writer=create_writer(ParquetWriterConfig(path=out)),
    )
    q = run_structured_stream(
        spark, stream_df, pipeline, "events", str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    written = spark.read.parquet(os.path.join(out, "events"))
    assert written.count() == load_table(spark, sf_dir, "events").count()
    assert written.select(F.min("chain_id")).first()[0] == 42


def test_streaming_growing_dedup_catches_cross_batch_dups(spark, tmp_path):
    """Growing-corpus gate over 3 arrivals: arrival 2 near-dups an
    arrival-1 admission, arrival 3 exact-dups an arrival-2 admission —
    verdicts the static-corpus gate can never produce. Streamed
    verdicts must equal a serial batch replay of delta_dedup with the
    same admission folding (round-4 verdict item #8)."""
    import time

    from cherry_spark.ext.dedup import delta_dedup
    from cherry_spark.streaming import run_streaming_growing_dedup

    a1 = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "spark catalyst optimizer rewrites logical plans into physical plans"),
    ]
    a2 = [
        (3, "the quick brown fox jumps over the lazy dog today"),  # near-dup of 1
        (4, "completely fresh text about streaming state stores"),
    ]
    a3 = [
        (5, "completely fresh text about streaming state stores"),  # exact dup of 4
        (6, "another entirely novel document closing the third arrival"),
    ]
    schema = "doc_id long, text string"
    src_dir = str(tmp_path / "incoming")
    for arrival in (a1, a2, a3):
        spark.createDataFrame(arrival, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        time.sleep(1.1)  # distinct mtimes -> stable file->batch order

    stream_df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = str(tmp_path / "verdicts")

    def sink(verdicts, batch_id):
        verdicts.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    corpus_dir = str(tmp_path / "corpus")
    q = run_streaming_growing_dedup(
        spark,
        stream_df,
        corpus_dir,
        sink,
        str(tmp_path / "ckpt"),
        jaccard_threshold=0.5,
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out).collect()
    streamed = {(r["id"], r["verdict"]) for r in got}
    assert len(streamed) == 6

    # serial batch replay with identical folding, in the order the
    # stream actually processed (recovered from recorded batch_ids)
    by_batch: dict[int, set[int]] = {}
    for r in got:
        by_batch.setdefault(r["batch_id"], set()).add(r["id"])
    all_docs = {i: t for i, t in a1 + a2 + a3}
    corpus_rows: list[tuple[int, str]] = []
    expected = set()
    for bid in sorted(by_batch):
        batch_rows = [(i, all_docs[i]) for i in sorted(by_batch[bid])]
        corpus_df = spark.createDataFrame(corpus_rows, schema) if corpus_rows else spark.createDataFrame([], schema)
        batch_df = spark.createDataFrame(batch_rows, schema)
        verdicts = delta_dedup(corpus_df, batch_df, jaccard_threshold=0.5).collect()
        for r in verdicts:
            expected.add((r["id"], r["verdict"]))
            if r["verdict"] == "unique":
                corpus_rows.append((r["id"], all_docs[r["id"]]))
    assert streamed == expected
    # the cross-batch dups were actually caught
    verdict_of = dict(streamed)
    assert verdict_of[3] == "near_dup" and verdict_of[5] == "exact_dup"


def test_streaming_growing_semdedup_catches_paraphrase_clones(spark, tmp_path):
    """Embedding-side growing gate (round-6 verdict item #7): arrival-2
    vector paraphrases an arrival-1 admission, arrival-3 exactly clones
    an arrival-2 admission — both flagged semantic_dup. Streamed
    verdicts must equal a serial replay of semantic_delta_dedup with
    the same admission folding AND the same centroid re-seed rule
    (reseed_factor=1.5 forces one mid-stream re-seed)."""
    import time

    from cherry_spark.ext.ivf import ivf_assign, ivf_centroids
    from cherry_spark.ext.semdedup import semantic_delta_dedup
    from cherry_spark.streaming import run_streaming_growing_semdedup

    initial = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
    a1 = [(10, [0.75, 0.65, 0.1, 0.0]), (11, [0.0, 0.0, 1.0, 0.0])]
    a2 = [(20, [0.74, 0.66, 0.1, 0.0]),  # paraphrase of 10 (cos ~ 0.9995)
          (21, [0.0, 0.9, 0.4, 0.0])]
    a3 = [(30, [0.0, 0.9, 0.4, 0.0]),    # exact clone of 21
          (31, [0.1, 0.1, 0.1, 0.9])]
    schema = "vec_id long, embedding array<double>"
    src_dir = str(tmp_path / "incoming")
    for arrival in (a1, a2, a3):
        spark.createDataFrame(arrival, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        time.sleep(1.1)

    stream_df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = str(tmp_path / "verdicts")

    def sink(verdicts, batch_id):
        verdicts.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    corpus_dir = str(tmp_path / "corpus")
    q = run_streaming_growing_semdedup(
        spark,
        stream_df,
        corpus_dir,
        sink,
        str(tmp_path / "ckpt"),
        threshold=0.95,
        n_centroids=2,
        nprobe=1,
        initial_corpus=spark.createDataFrame(initial, schema),
        reseed_factor=1.5,
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out).collect()
    streamed = {(r["vec_id"], r["verdict"]) for r in got}
    assert len(streamed) == 6
    verdict_of = dict(streamed)
    # the cross-batch semantic dups were actually caught
    assert verdict_of[20] == "semantic_dup" and verdict_of[30] == "semantic_dup"

    # one re-seed actually happened (corpus outgrew 1.5 x built_n=2)
    built_n = (
        spark.read.parquet(dd(f"{corpus_dir}_centroids"))
        .agg(F.max("built_n"))
        .collect()[0][0]
    )
    assert built_n == 4
    assert spark.read.parquet(dd(corpus_dir)).count() == 6

    # serial replay with identical folding + re-seed rule, in recorded
    # batch order (all library calls are deterministic)
    by_batch: dict[int, list[int]] = {}
    for r in got:
        by_batch.setdefault(r["batch_id"], []).append(r["vec_id"])
    all_vecs = {i: v for i, v in initial + a1 + a2 + a3}

    def df_of(ids):
        return spark.createDataFrame([(i, all_vecs[i]) for i in sorted(ids)], schema)

    corpus_ids = [0, 1]
    cents = ivf_centroids(df_of(corpus_ids), 2)
    built = 2

    def assigned_df(ids, cents):
        v = df_of(ids)
        return ivf_assign(v, cents).join(v, on="vec_id").select(
            "vec_id", "embedding", "centroid_id"
        )

    expected = set()
    for bid in sorted(by_batch):
        batch_ids = sorted(by_batch[bid])
        verdicts = semantic_delta_dedup(
            assigned_df(corpus_ids, cents), df_of(batch_ids), cents,
            threshold=0.95, nprobe=1,
        ).collect()
        for r in verdicts:
            expected.add((r["vec_id"], r["verdict"]))
            if r["verdict"] == "unique":
                corpus_ids.append(r["vec_id"])
        if built and len(corpus_ids) > 1.5 * built and len(corpus_ids) >= 2:
            cents = ivf_centroids(df_of(corpus_ids), 2)
            built = len(corpus_ids)
    assert streamed == expected


def test_growing_semdedup_torn_reseed_self_repairs(spark, tmp_path):
    """r10 review: the reseed swaps centroids and the reassigned
    corpus as adjacent renames, but a crash between them leaves NEW
    centroids over OLD-assigned vectors — mismatched spaces that
    silently degrade candidate recall forever. The centroid table's
    reseed_key names the reseeding batch; a replay that finds it
    without the corpus's paired merge key must finish the
    reassignment BEFORE judging. This test runs a reseeding stream,
    fabricates the torn state (deranged centroid ids, no merge
    marker), replays the reseeding batch from a copied checkpoint,
    and asserts the final corpus assignment matches a fresh
    assignment against the stored centroids exactly."""
    import os
    import shutil
    import time

    from cherry_spark.ext.ivf import ivf_assign
    from cherry_spark.streaming.continuous import (
        run_streaming_growing_semdedup,
    )

    schema = "vec_id long, embedding array<double>"
    a0 = [(i, [1.0 * (i == j) for j in range(4)]) for i in range(4)]
    a1 = [
        (10 + i, [0.5 + 0.1 * i, 1.0, 0.2 * i, 1.0 - 0.1 * i])
        for i in range(8)
    ]
    src = str(tmp_path / "in")
    for a in (a0, a1):
        spark.createDataFrame(a, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    corpus_dir = str(tmp_path / "corpus")
    cent_dir = f"{corpus_dir}_centroids"
    q = run_streaming_growing_semdedup(
        spark, stream(), corpus_dir, lambda v, b: v.collect(),
        str(tmp_path / "ckpt1"), threshold=0.999, n_centroids=2,
        nprobe=1, reseed_factor=1.5,
    )
    q.awaitTermination(240)
    # batch 1 (12 > 1.5 * 4) reseeded: the centroid table records it
    cent_rows = spark.read.parquet(dd(cent_dir))
    (rk,) = cent_rows.agg(F.max("reseed_key")).first()
    assert rk.endswith("-b1")

    # fabricate the torn state: corpus content present but assigned in
    # the WRONG space (deranged ids) and the paired merge marker gone
    stored = spark.read.parquet(dd(corpus_dir)).localCheckpoint(eager=True)
    n_ids = 2
    deranged = stored.withColumn(
        "centroid_id",
        ((F.col("centroid_id").cast("long") + 1) % n_ids).cast(
            stored.schema["centroid_id"].dataType
        ),
    ).localCheckpoint(eager=True)
    shutil.rmtree(corpus_dir)
    deranged.write.mode("overwrite").parquet(corpus_dir)
    assert not os.path.exists(f"{corpus_dir}/_merge_key")

    # replay batch 1: copied checkpoint (same query id -> same epoch)
    # minus its commit marker
    ck2 = str(tmp_path / "ckpt_replay")
    shutil.copytree(str(tmp_path / "ckpt1"), ck2)
    os.remove(os.path.join(ck2, "commits", "1"))
    crc = os.path.join(ck2, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    q2 = run_streaming_growing_semdedup(
        spark, stream(), corpus_dir, lambda v, b: v.collect(),
        ck2, threshold=0.999, n_centroids=2, nprobe=1, reseed_factor=1.5,
    )
    q2.awaitTermination(240)

    # the corpus assignment space matches the stored centroids exactly
    final = spark.read.parquet(dd(corpus_dir))
    cents = spark.read.parquet(dd(cent_dir)).select("centroid_id", "centroid")
    expect = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assign(
            final.select("vec_id", "embedding"), cents
        ).collect()
    }
    got = {r["vec_id"]: int(r["centroid_id"]) for r in final.collect()}
    assert got == {k: int(v) for k, v in expect.items()}
    # and no duplicate / missing ids
    assert sorted(got) == [0, 1, 2, 3] + [10 + i for i in range(8)]


def test_streaming_budget_gate_spends_across_batches(spark, tmp_path):
    """Global token budget over 3 arrivals: the gate admits the
    quality-ordered prefix of each batch against the REMAINING budget,
    and once the budget is spent later arrivals are rejected. Streamed
    verdicts must equal a serial replay of budget_select with the
    budget decremented batch by batch."""
    import time

    from cherry_spark.ext.budget import budget_select
    from cherry_spark.streaming.continuous import run_streaming_budget_gate

    # (doc_id, quality, n_tokens); budget 100
    a1 = [(1, 0.9, 40), (2, 0.1, 40)]       # both admitted (80 spent)
    a2 = [(3, 0.8, 15), (4, 0.7, 50)]       # 3 admitted (95), 4 overflows
    a3 = [(5, 1.0, 10)]                     # rejected: only 5 tokens left
    schema = "doc_id long, quality double, n_tokens long"
    src_dir = str(tmp_path / "incoming")
    for arrival in (a1, a2, a3):
        spark.createDataFrame(arrival, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        time.sleep(1.1)

    stream_df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = str(tmp_path / "verdicts")

    def sink(verdicts, batch_id):
        verdicts.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    q = run_streaming_budget_gate(
        spark,
        stream_df,
        str(tmp_path / "state"),
        sink,
        str(tmp_path / "ckpt"),
        budget=100,
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out).collect()
    assert len(got) == 5
    streamed = {(r["doc_id"], r["admitted"], r["cum_tokens"]) for r in got}

    # serial replay in the order the stream actually processed
    by_batch: dict[int, list] = {}
    rows_by_id = {r[0]: r for r in a1 + a2 + a3}
    for r in got:
        by_batch.setdefault(r["batch_id"], []).append(r["doc_id"])
    expected = set()
    spent = 0
    for bid in sorted(by_batch):
        batch_df = spark.createDataFrame(
            [rows_by_id[i] for i in sorted(by_batch[bid])], schema
        )
        adm = budget_select(batch_df, budget=100 - spent).collect()
        cum_of = {r["doc_id"]: r["cum_tokens"] + spent for r in adm}
        for i in sorted(by_batch[bid]):
            if i in cum_of:
                expected.add((i, 1, cum_of[i]))
            else:
                expected.add((i, 0, None))
        spent = max(cum_of.values()) if cum_of else spent
    assert streamed == expected
    # the cross-batch exhaustion was exercised: doc 4 overflowed mid-
    # batch, doc 5 (highest quality of all!) arrived after the frontier
    verdict_of = {r["doc_id"]: r["admitted"] for r in got}
    assert verdict_of == {1: 1, 2: 1, 3: 1, 4: 0, 5: 0}


def test_curation_gate_replay_is_store_idempotent(spark, tmp_path):
    """r10: a crash between the composed gate's store folds and the
    checkpoint commit replays the batch. The stores must be
    exactly-once — keyed appends replace the crashed attempt's rows,
    the judging side drops/anti-joins the batch's own rows (so the
    replay is not misclassified as a duplicate of itself), and the
    spent counter re-judges from the PRE-batch budget instead of
    double-counting the attempt's tokens (which would flip this
    replay's admissions to over_budget and permanently steal
    budget)."""
    import os
    import shutil

    from cherry_spark.streaming.continuous import run_streaming_curation_gate

    rows = [
        (1, "alpha bravo charlie delta echo words", [1.0, 0.0, 0.0, 0.0], 0.9, 4),
        (2, "foxtrot golf hotel india juliet words", [0.0, 1.0, 0.0, 0.0], 0.8, 4),
        (3, "kilo lima mike november oscar words", [0.0, 0.0, 1.0, 0.0], 0.7, 4),
    ]
    schema = (
        "doc_id long, text string, embedding array<double>, "
        "quality double, n_tokens long"
    )
    src = str(tmp_path / "in")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def stream():
        return spark.readStream.schema(schema).parquet(src)

    def collect_sink(acc):
        def sink(verdicts, batch_id):
            acc.append({r["doc_id"]: r["verdict"] for r in verdicts.collect()})
        return sink

    state = str(tmp_path / "state")
    first: list = []
    # budget 8 admits the two highest-quality docs; doc 3 over_budget
    q = run_streaming_curation_gate(
        spark, stream(), state, collect_sink(first),
        str(tmp_path / "ckpt1"), budget=8, jaccard_threshold=0.5,
        semantic_threshold=0.95,
    )
    q.awaitTermination(240)
    assert first == [{1: "admitted", 2: "admitted", 3: "over_budget"}]

    def snapshot():
        out = {}
        for t in ("text", "text_sigs", "vecs", "spent"):
            out[t] = sorted(
                tuple(r) for r in spark.read.parquet(dd(f"{state}/{t}")).collect()
            )
        return out

    before = snapshot()
    assert len(before["text"]) == 2 and len(before["vecs"]) == 2

    # crash-replay: copied checkpoint minus the batch-0 commit marker
    # (same query id -> same run epoch and batch keys)
    ck2 = str(tmp_path / "ckpt_replay")
    shutil.copytree(str(tmp_path / "ckpt1"), ck2)
    os.remove(os.path.join(ck2, "commits", "0"))
    crc = os.path.join(ck2, "commits", ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    replay: list = []
    q2 = run_streaming_curation_gate(
        spark, stream(), state, collect_sink(replay),
        ck2, budget=8, jaccard_threshold=0.5, semantic_threshold=0.95,
    )
    q2.awaitTermination(240)
    # same verdicts re-delivered (not self-dup / over_budget), and the
    # stores are row-identical — no duplicate admissions, spent == 8
    assert replay == first
    assert snapshot() == before


def test_curation_gate_torn_reseed_self_repairs(spark, tmp_path):
    """r10 review: the composed gate's twin of the semdedup
    torn-reseed repair — NEW centroids over OLD-assigned vectors
    after a crash between the adjacent reseed renames must be
    finished by the replay before anything is judged."""
    import os
    import shutil
    import time

    from cherry_spark.ext.ivf import ivf_assign
    from cherry_spark.streaming.continuous import run_streaming_curation_gate

    words = [
        "alpha bravo", "charlie delta", "echo foxtrot", "golf hotel",
        "india juliet", "kilo lima", "mike november", "oscar papa",
        "quebec romeo", "sierra tango", "uniform victor", "whiskey xray",
    ]
    a0 = [
        (i, words[i], [1.0 * (i == j) for j in range(4)], 0.9, 2)
        for i in range(4)
    ]
    a1 = [
        (10 + i, words[4 + i],
         [0.5 + 0.1 * i, 1.0, 0.2 * i, 1.0 - 0.1 * i], 0.8, 2)
        for i in range(8)
    ]
    schema = (
        "doc_id long, text string, embedding array<double>, "
        "quality double, n_tokens long"
    )
    src = str(tmp_path / "in")
    for a in (a0, a1):
        spark.createDataFrame(a, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    state = str(tmp_path / "state")
    q = run_streaming_curation_gate(
        spark, stream(), state, lambda v, b: v.collect(),
        str(tmp_path / "ckpt1"), budget=10_000, jaccard_threshold=0.5,
        semantic_threshold=0.999, n_centroids=2, nprobe=1,
        reseed_factor=1.5,
    )
    q.awaitTermination(240)
    cent_rows = spark.read.parquet(dd(f"{state}/centroids"))
    (rk,) = cent_rows.agg(F.max("reseed_key")).first()
    assert rk.endswith("-b1")  # batch 1 reseeded (12 > 1.5 * 4)

    # fabricate the torn state: deranged assignments, no merge marker
    vec_dir = f"{state}/vecs"
    stored = spark.read.parquet(dd(vec_dir)).localCheckpoint(eager=True)
    deranged = stored.withColumn(
        "centroid_id",
        ((F.col("centroid_id").cast("long") + 1) % 2).cast(
            stored.schema["centroid_id"].dataType
        ),
    ).localCheckpoint(eager=True)
    shutil.rmtree(vec_dir)
    deranged.write.mode("overwrite").parquet(vec_dir)

    ck2 = str(tmp_path / "ckpt_replay")
    shutil.copytree(str(tmp_path / "ckpt1"), ck2)
    os.remove(os.path.join(ck2, "commits", "1"))
    crc = os.path.join(ck2, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    q2 = run_streaming_curation_gate(
        spark, stream(), state, lambda v, b: v.collect(),
        ck2, budget=10_000, jaccard_threshold=0.5,
        semantic_threshold=0.999, n_centroids=2, nprobe=1,
        reseed_factor=1.5,
    )
    q2.awaitTermination(240)

    final = spark.read.parquet(dd(vec_dir))
    cents = spark.read.parquet(dd(f"{state}/centroids")).select(
        "centroid_id", "centroid"
    )
    expect = {
        r["vec_id"]: int(r["centroid_id"])
        for r in ivf_assign(
            final.select("vec_id", "embedding"), cents
        ).collect()
    }
    got = {r["vec_id"]: int(r["centroid_id"]) for r in final.collect()}
    assert got == expect
    assert sorted(got) == [0, 1, 2, 3] + [10 + i for i in range(8)]


def test_streaming_curation_gate_composes_all_three_gates(spark, tmp_path):
    """Composed ingestion gate over 3 arrivals: arrival 2 carries an
    exact clone of an arrival-1 admission (lexical), a paraphrase clone
    of another (same embedding direction, different words — only the
    semantic stage can reject it), and one novel doc; arrival 3's novel
    high-quality doc finds the budget exhausted. Duplicates must never
    spend budget."""
    import os
    import time

    from cherry_spark.streaming.continuous import run_streaming_curation_gate

    text_a = "the quick brown fox jumps over the lazy dog tonight"
    text_b = "spark catalyst optimizer rewrites logical plans into physical plans"
    text_c = "a sly crimson vixen leaps across the sleepy hound after dusk"
    text_d = "parquet row groups store columnar chunks with statistics footers"
    text_e = "duckdb executes vectorized pipelines over morsel driven parallelism"
    a1 = [
        (1, text_a, [1.0, 0.0, 0.0, 0.0], 0.9, 30),
        (2, text_b, [0.0, 1.0, 0.0, 0.0], 0.5, 30),
    ]
    a2 = [
        (3, text_a, [0.0, 0.0, 0.5, 0.5], 0.9, 10),      # exact dup of 1
        (4, text_c, [0.1, 0.99, 0.0, 0.0], 0.9, 10),     # paraphrase of 2
        (5, text_d, [0.0, 0.0, 1.0, 0.0], 0.8, 30),      # novel -> admitted
    ]
    a3 = [
        (6, text_e, [0.0, 0.0, 0.0, 1.0], 1.0, 20),      # budget left: 10
    ]
    schema = (
        "doc_id long, text string, embedding array<double>, "
        "quality double, n_tokens long"
    )
    src_dir = str(tmp_path / "incoming")
    for arrival in (a1, a2, a3):
        spark.createDataFrame(arrival, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        time.sleep(1.1)

    stream_df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = str(tmp_path / "verdicts")

    def sink(verdicts, batch_id):
        verdicts.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    state = str(tmp_path / "state")
    q = run_streaming_curation_gate(
        spark,
        stream_df,
        state,
        sink,
        str(tmp_path / "ckpt"),
        budget=100,
        semantic_threshold=0.9,
        n_centroids=2,
        nprobe=2,
        jaccard_threshold=0.5,
    )
    q.awaitTermination(240)

    got = spark.read.parquet(out).collect()
    assert len(got) == 6
    verdict_of = {r["doc_id"]: r["verdict"] for r in got}
    assert verdict_of == {
        1: "admitted",
        2: "admitted",
        3: "exact_dup",
        4: "semantic_dup",
        5: "admitted",
        6: "over_budget",
    }
    cum_of = {r["doc_id"]: r["cum_tokens"] for r in got if r["cum_tokens"] is not None}
    assert cum_of == {1: 30, 2: 60, 5: 90}
    # every store folded exactly the admissions
    assert spark.read.parquet(dd(os.path.join(state, "text"))).count() == 3
    assert spark.read.parquet(dd(os.path.join(state, "text_sigs"))).count() == 3
    assert spark.read.parquet(dd(os.path.join(state, "vecs"))).count() == 3
    assert spark.read.parquet(dd(os.path.join(state, "spent"))).first()["spent"] == 90


def test_compact_dataset_reduces_files_preserves_rows(spark, tmp_path):
    from cherry_spark.writers.compact import compact_dataset

    path = str(tmp_path / "ds")
    # simulate 30 micro-batch appends -> 30+ tiny files, partitioned
    for b in range(30):
        spark.range(b * 100, b * 100 + 100).selectExpr(
            "id", "CAST(id % 3 AS STRING) AS part"
        ).coalesce(1).write.partitionBy("part").mode("append").parquet(path)
    before = spark.read.parquet(path)
    rows_before = sorted(r["id"] for r in before.collect())

    stats = compact_dataset(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_before"] >= 90  # 30 appends x 3 partitions
    assert stats["files_after"] == 3  # one file per partition
    after = spark.read.parquet(path)
    assert sorted(r["id"] for r in after.collect()) == rows_before
    # second run is a no-op (already compact)
    stats2 = compact_dataset(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert stats2["files_after"] == stats2["files_before"] == 3


def test_compact_dataset_mixed_lanes(spark, tmp_path):
    """r10: partitions compacting to ONE file run through the batched
    single-job lane while a partition whose bytes exceed the target
    takes the per-dir sizing lane — both in one call, rows preserved,
    per-partition file counts correct."""
    import os

    from cherry_spark.writers.compact import (
        _dir_bytes,
        _n_parquet_files,
        compact_dataset,
    )

    path = str(tmp_path / "mixed")
    # partition big=1 gets ~40x the data of small=0/2
    for b in range(6):
        spark.range(b * 40_000, (b + 1) * 40_000).selectExpr(
            "id",
            "repeat(CAST(id AS STRING), 8) AS payload",
            "CASE WHEN id % 40 = 0 THEN id % 3 ELSE 1 END AS part",
        ).coalesce(1).write.partitionBy("part").mode("append").parquet(path)
    rows_before = sorted(
        (r["id"], r["part"]) for r in spark.read.parquet(path).collect()
    )
    big = f"{path}/part=1"
    target = max(64 * 1024, _dir_bytes(big) // 3)  # big -> >=2 files

    compact_dataset(spark, path, target_file_bytes=target)
    assert sorted(
        (r["id"], r["part"]) for r in spark.read.parquet(path).collect()
    ) == rows_before
    assert _n_parquet_files(f"{path}/part=0") == 1  # batched lane
    assert _n_parquet_files(f"{path}/part=2") == 1
    assert 2 <= _n_parquet_files(big) < 6  # serial sizing lane
    assert not any(
        "__compact_" in d or "__old_" in d for d in os.listdir(path)
    )


def test_compact_dataset_unpartitioned(spark, tmp_path):
    import os

    from cherry_spark.writers.compact import compact_dataset

    path = str(tmp_path / "flat")
    for b in range(10):
        spark.range(b * 50, b * 50 + 50).coalesce(1).write.mode("append").parquet(path)
    # a merge table's replay marker must survive the rewrite (r10)
    with open(os.path.join(path, "_merge_key"), "w") as fh:
        fh.write("e1-b7")
    rows = spark.read.parquet(path).count()
    stats = compact_dataset(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_after"] == 1
    assert spark.read.parquet(path).count() == rows
    with open(os.path.join(path, "_merge_key")) as fh:
        assert fh.read() == "e1-b7"


def test_streaming_rollup_matches_batch_groupby(spark, tmp_path):
    """Incrementally maintained rollup (r8): after every fold the
    store equals a from-scratch groupBy over everything seen so far —
    the mergeable-partials contract (counts/sums by sum, mins by min,
    maxes by max)."""
    import time

    from cherry_spark.streaming.continuous import run_streaming_rollup

    arrivals = [
        [(1, "en", 10), (2, "en", 30), (3, "de", 7)],
        [(4, "en", 5), (5, "fr", 50)],
        [(6, "de", 1), (7, "de", 99), (8, "fr", 2)],
    ]
    schema = "doc_id long, lang string, n_tokens long"
    src = str(tmp_path / "in")
    for a in arrivals:
        spark.createDataFrame(a, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    stream_df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    seen: list[tuple[int, dict]] = []

    def sink(rollup, batch_id):
        seen.append(
            (batch_id, {r["lang"]: r.asDict() for r in rollup.collect()})
        )

    state = str(tmp_path / "state")
    q = run_streaming_rollup(
        spark,
        stream_df,
        state,
        sink,
        str(tmp_path / "ckpt"),
        keys=["lang"],
        metrics=["n_tokens"],
    )
    q.awaitTermination(240)

    assert len(seen) == 3
    rows: list[tuple] = []
    for i, (_, got) in enumerate(sorted(seen)):
        rows += arrivals[i]
        expect = {}
        for _, lang, t in rows:
            e = expect.setdefault(
                lang,
                {"n_rows": 0, "sum_n_tokens": 0,
                 "min_n_tokens": t, "max_n_tokens": t},
            )
            e["n_rows"] += 1
            e["sum_n_tokens"] += t
            e["min_n_tokens"] = min(e["min_n_tokens"], t)
            e["max_n_tokens"] = max(e["max_n_tokens"], t)
        assert set(got) == set(expect)
        for lang, e in expect.items():
            assert {m: got[lang][m] for m in e} == e
    # the store holds the final rollup (restart-ready)
    final = {r["lang"]: r["sum_n_tokens"] for r in spark.read.parquet(dd(state)).collect()}
    assert final == {"en": 45, "de": 107, "fr": 52}


def test_streaming_spike_monitor_matches_batch(spark, tmp_path):
    """Streamed flag report after batch k == batch spike_report over
    batches 1..k — counts merge exactly, the verdict is integer
    algebra, so equality is exact (incl. a spike that only EMERGES
    once enough batches accumulate the burst bucket)."""
    import datetime as dt
    import time

    from cherry_spark.ext.timeseries import spike_report
    from cherry_spark.streaming.continuous import run_streaming_spike_monitor

    base = dt.datetime(2024, 7, 1, tzinfo=dt.timezone.utc)

    def at(sec):
        return base + dt.timedelta(seconds=sec)

    width = 600
    # background: 1 event per bucket on k1 across 12 buckets; the
    # burst bucket (index 3) receives 20 extra events SPREAD ACROSS
    # the three arrivals — no single batch contains the whole spike
    background = [("k1", at(i * width + 5)) for i in range(12)]
    burst = [("k1", at(3 * width + 30 + i)) for i in range(20)]
    arrivals = [
        background[:4] + burst[:5],
        background[4:8] + burst[5:12],
        background[8:] + burst[12:],
    ]
    schema = "event_type string, ts timestamp"
    src = str(tmp_path / "in")
    for a in arrivals:
        spark.createDataFrame(a, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    stream_df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    seen: list[tuple[int, dict]] = []

    def sink(report, batch_id):
        seen.append(
            (
                batch_id,
                {
                    (r.key, r.bucket_s): (r.n_events, r.is_spike)
                    for r in report.collect()
                },
            )
        )

    q = run_streaming_spike_monitor(
        spark,
        stream_df,
        str(tmp_path / "state"),
        sink,
        str(tmp_path / "ckpt"),
        key_col="event_type",
        ts_col="ts",
        width_s=width,
    )
    q.awaitTermination(240)

    assert len(seen) == 3
    prefix: list = []
    for i, (_, got) in enumerate(sorted(seen)):
        prefix += arrivals[i]
        ref = spark.createDataFrame(prefix, schema)
        expect = {
            (r.key, r.bucket_s): (r.n_events, r.is_spike)
            for r in spike_report(ref, "event_type", "ts", width).collect()
        }
        assert got == expect
    # the burst bucket IS flagged in the final report
    final = dict(sorted(seen)[-1][1])
    burst_bucket = int(at(3 * width).timestamp()) // width * width
    assert final[("k1", burst_bucket)] == (1 + 20, 1)


def test_streaming_spike_monitor_restart_resumes_exactly(spark, tmp_path):
    """Kill-and-restart: a NEW query resuming from the same checkpoint
    + state store processes only the files that arrived while down,
    and the post-restart report equals the batch operator over
    EVERYTHING ever streamed — the state store is the restart
    contract, not executor memory."""
    import datetime as dt

    from cherry_spark.ext.timeseries import spike_report
    from cherry_spark.streaming.continuous import run_streaming_spike_monitor

    base = dt.datetime(2024, 8, 1, tzinfo=dt.timezone.utc)
    width = 600
    # 12 background buckets: with N buckets a single outlier's z² is
    # bounded by N-1, so N must exceed 10 for a lone burst to clear
    # z>3 at all (N=12: num=121B² > den=99B² for any burst size B)
    first = [("k1", base + dt.timedelta(seconds=i * width + 7)) for i in range(12)]
    burst = [("k1", base + dt.timedelta(seconds=2 * width + 40 + i)) for i in range(15)]
    schema = "event_type string, ts timestamp"
    src = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(first, schema).coalesce(1).write.mode("append").parquet(src)

    reports: list[dict] = []

    def sink(report, batch_id):
        reports.append(
            {
                (r.key, r.bucket_s): (r.n_events, r.is_spike)
                for r in report.collect()
            }
        )

    def start():
        stream_df = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return run_streaming_spike_monitor(
            spark, stream_df, state, sink, ckpt,
            key_col="event_type", ts_col="ts", width_s=width,
        )

    q = start()
    q.awaitTermination(180)
    assert len(reports) == 1

    # monitor is DOWN while the burst arrives
    spark.createDataFrame(burst, schema).coalesce(1).write.mode("append").parquet(src)
    q2 = start()
    q2.awaitTermination(180)
    assert len(reports) == 2  # exactly one new fold — no reprocessing

    ref = spark.createDataFrame(first + burst, schema)
    expected = {
        (r.key, r.bucket_s): (r.n_events, r.is_spike)
        for r in spike_report(ref, "event_type", "ts", width).collect()
    }
    assert reports[-1] == expected
    # the emerged burst bucket is flagged post-restart
    bb = int((base + dt.timedelta(seconds=2 * width)).timestamp()) // width * width
    assert reports[-1][("k1", bb)] == (1 + 15, 1)


def test_streaming_weighted_sample_matches_batch(spark, tmp_path):
    """The maintained sample after batch k == the batch operator over
    batches 1..k (pure function of the (id, weight) set — arrival
    order CANNOT matter), with exactly m total picks at every fold."""
    import time

    from cherry_spark.ext.sampling import weighted_systematic_sample
    from cherry_spark.streaming.continuous import run_streaming_weighted_sample

    arrivals = [
        [(i, 1 + (i * 37) % 400) for i in range(0, 60)],
        [(i, 1 + (i * 37) % 400) for i in range(60, 140)],
        # arrival 3 replays id 10 (same weight — idempotent fold)
        [(10, 1 + (10 * 37) % 400)] + [(i, 1 + (i * 37) % 400) for i in range(140, 200)],
    ]
    schema = "doc_id long, w long"
    src = str(tmp_path / "in")
    for a in arrivals:
        spark.createDataFrame(a, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    stream_df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    seen: list[tuple[int, dict]] = []

    def sink(sample, batch_id):
        seen.append(
            (batch_id, {r["doc_id"]: r["n_picks"] for r in sample.collect()})
        )

    m = 20
    q = run_streaming_weighted_sample(
        spark,
        stream_df,
        str(tmp_path / "state"),
        sink,
        str(tmp_path / "ckpt"),
        id_col="doc_id",
        weight_col="w",
        m=m,
        salt="sw",
    )
    q.awaitTermination(240)

    assert len(seen) == 3
    prefix: list = []
    for i, (_, got) in enumerate(sorted(seen)):
        prefix += arrivals[i]
        ref = spark.createDataFrame(sorted(set(prefix)), schema)
        expect = {
            r["doc_id"]: r["n_picks"]
            for r in weighted_systematic_sample(
                ref, "doc_id", "w", m=m, salt="sw"
            ).collect()
        }
        assert got == expect
        assert sum(got.values()) == m


def test_streaming_decontamination_gate_matches_batch(spark, tmp_path):
    """Streamed contamination verdicts across 2 arrivals == the batch
    contamination_overlap replay over everything streamed, with the
    eval-posting store built ONCE (a contaminated doc arriving in
    arrival 2 is caught by the same store arrival 1 used)."""
    import time

    from cherry_spark.ext.dedup import contamination_overlap
    from cherry_spark.streaming.continuous import (
        run_streaming_decontamination_gate,
    )

    evals = spark.createDataFrame(
        [
            (900, "what is the capital of france paris is the answer"),
            (901, "solve the integral of x squared dx equals x cubed over three"),
        ],
        "doc_id long, text string",
    )
    arrivals = [
        [
            # shares a 5-gram with eval 900 -> contaminated
            (1, "trivia night asked what is the capital of france paris"),
            (2, "completely clean training document about spark physical plans"),
        ],
        [
            # shares a 5-gram with eval 901 -> contaminated (store reused)
            (3, "homework help the integral of x squared dx equals easy"),
            (4, "another clean document on parquet row group statistics"),
        ],
    ]
    schema = "doc_id long, text string"
    src = str(tmp_path / "in")
    for a in arrivals:
        spark.createDataFrame(a, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    stream_df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    seen: list[tuple[int, dict]] = []

    def sink(verdicts, batch_id):
        seen.append(
            (batch_id, {r["doc_id"]: r["verdict"] for r in verdicts.collect()})
        )

    store = str(tmp_path / "eval_postings")
    q = run_streaming_decontamination_gate(
        spark,
        stream_df,
        evals,
        store,
        sink,
        str(tmp_path / "ckpt"),
        shingle_k=5,
    )
    q.awaitTermination(240)

    assert len(seen) == 2
    streamed = {}
    for _, got in seen:
        streamed.update(got)
    all_docs = spark.createDataFrame(
        [d for a in arrivals for d in a], schema
    )
    flagged = {
        r["doc_id"]
        for r in contamination_overlap(all_docs, evals, shingle_k=5).collect()
    }
    assert flagged == {1, 3}
    assert streamed == {
        d: ("contaminated" if d in flagged else "clean") for d in (1, 2, 3, 4)
    }
    # the store was built once and persists for restarts
    import os

    assert any(f.endswith(".parquet") for f in os.listdir(dd(store)))


def test_streaming_curation_gate_with_decontamination_stage(spark, tmp_path):
    """Four-gate composition: a doc sharing a 5-gram with the eval set
    is 'contaminated' with TOP precedence — it never spends budget,
    never enters any store, and an exact clone of it in a later
    arrival is NOT an exact_dup (the contaminated original was never
    admitted) but is itself caught by the eval store."""
    import os
    import time

    from cherry_spark.streaming.continuous import run_streaming_curation_gate

    eval_text = "what is the boiling point of water at sea level exactly"
    text_b = "spark catalyst optimizer rewrites logical plans into physical plans"
    text_c = "parquet row groups store columnar chunks with statistics footers"
    evals = spark.createDataFrame(
        [(900, eval_text)], "doc_id long, text string"
    )
    a1 = [
        # contaminated: shares "what is the boiling point" with eval
        (1, "quiz what is the boiling point of water answer below",
         [1.0, 0.0, 0.0, 0.0], 0.99, 30),
        (2, text_b, [0.0, 1.0, 0.0, 0.0], 0.5, 30),
    ]
    a2 = [
        # exact clone of the CONTAMINATED doc — still contaminated,
        # not exact_dup (doc 1 never entered the corpus store)
        (3, "quiz what is the boiling point of water answer below",
         [1.0, 0.0, 0.0, 0.0], 0.99, 30),
        (4, text_c, [0.0, 0.0, 1.0, 0.0], 0.8, 30),
    ]
    schema = (
        "doc_id long, text string, embedding array<double>, "
        "quality double, n_tokens long"
    )
    src_dir = str(tmp_path / "incoming")
    for arrival in (a1, a2):
        spark.createDataFrame(arrival, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        time.sleep(1.1)

    stream_df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = str(tmp_path / "verdicts")

    def sink(verdicts, batch_id):
        verdicts.write.mode("append").parquet(out)

    state = str(tmp_path / "state")
    q = run_streaming_curation_gate(
        spark,
        stream_df,
        state,
        sink,
        str(tmp_path / "ckpt"),
        budget=100,
        semantic_threshold=0.9,
        n_centroids=2,
        nprobe=2,
        jaccard_threshold=0.5,
        test_df=evals,
        decon_shingle_k=5,
    )
    q.awaitTermination(240)

    verdict_of = {
        r["doc_id"]: r["verdict"] for r in spark.read.parquet(out).collect()
    }
    assert verdict_of == {
        1: "contaminated",
        2: "admitted",
        3: "contaminated",
        4: "admitted",
    }
    # contaminated docs never touched a store or the budget
    assert spark.read.parquet(dd(os.path.join(state, "text"))).count() == 2
    assert spark.read.parquet(dd(os.path.join(state, "spent"))).first()["spent"] == 60
    # the eval-posting store was built once and persists
    assert any(
        f.endswith(".parquet")
        for f in os.listdir(dd(os.path.join(state, "eval_postings")))
    )


def test_streaming_curation_gate_restart_uses_persisted_stores(spark, tmp_path):
    """Stop the gate, let an arrival land while it is down, restart
    with the SAME state/checkpoint dirs: the new arrival must be
    classified against the persisted stores (an exact clone of a
    pre-restart admission is exact_dup; the global budget keeps
    counting from the persisted spent row) and pre-restart batches
    are not reprocessed."""
    import os
    import time

    from cherry_spark.streaming.continuous import run_streaming_curation_gate

    text_a = "the quick brown fox jumps over the lazy dog tonight"
    text_b = "spark catalyst optimizer rewrites logical plans into physical plans"
    a1 = [
        (1, text_a, [1.0, 0.0, 0.0, 0.0], 0.9, 30),
        (2, text_b, [0.0, 1.0, 0.0, 0.0], 0.5, 30),
    ]
    # lands while the gate is DOWN: a clone of doc 1 + a novel doc
    a2 = [
        (3, text_a, [0.0, 0.0, 1.0, 0.0], 0.9, 10),
        (4, "parquet row groups store columnar chunks with statistics",
         [0.0, 0.0, 0.0, 1.0], 0.8, 25),
    ]
    schema = (
        "doc_id long, text string, embedding array<double>, "
        "quality double, n_tokens long"
    )
    src_dir = str(tmp_path / "incoming")
    out = str(tmp_path / "verdicts")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def sink(verdicts, batch_id):
        verdicts.write.mode("append").parquet(out)

    def start():
        stream_df = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        return run_streaming_curation_gate(
            spark, stream_df, state, sink, ckpt,
            budget=100, semantic_threshold=0.9, n_centroids=2,
            nprobe=2, jaccard_threshold=0.5,
        )

    spark.createDataFrame(a1, schema).coalesce(1).write.mode("append").parquet(src_dir)
    q = start()
    q.awaitTermination(240)
    assert spark.read.parquet(out).count() == 2

    time.sleep(1.1)
    spark.createDataFrame(a2, schema).coalesce(1).write.mode("append").parquet(src_dir)
    q2 = start()
    q2.awaitTermination(240)

    got = {r["doc_id"]: r["verdict"] for r in spark.read.parquet(out).collect()}
    assert got == {
        1: "admitted",
        2: "admitted",
        3: "exact_dup",       # caught by the PERSISTED signature store
        4: "admitted",
    }
    assert len(got) == 4  # docs 1/2 classified exactly once
    # budget resumed from the persisted spent row: 30 + 30 + 25
    assert spark.read.parquet(dd(os.path.join(state, "spent"))).first()["spent"] == 85
    assert spark.read.parquet(dd(os.path.join(state, "text"))).count() == 3


def test_streaming_span_gate_rejects_and_restarts(spark, tmp_path):
    """Streaming ExactSubstr gate (r9): batch docs are span-matched
    against the admitted-postings store; span_dup docs never fold
    their grams (a later clone is judged against the ORIGINAL admitted
    content), and a restarted query serves verdicts from the persisted
    store, processing only the downtime arrivals."""
    import time

    from cherry_spark.streaming.continuous import run_streaming_span_gate

    R = "r1 r2 r3 r4 r5 r6"
    arrivals = [
        [(1, f"{R} tail1 tail2"), (2, "novel n2 n3 n4 n5")],
        # 3: 6/7 overlap -> span_dup (rejected, grams NOT stored)
        # 4: 6/12 overlap == frac 0.5, not > 0.5 -> unique (stored)
        [(3, f"{R} x"), (4, f"{R} a b c d e f")],
        # 5 overlaps R -> must be span_dup via docs 1/4's stored grams
        [(5, f"y {R}"), (6, "fresh f2 f3 f4 f5 f6")],
    ]
    schema = "doc_id long, text string"
    src = str(tmp_path / "in")
    for a in arrivals:
        spark.createDataFrame(a, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    seen: list[tuple[int, dict]] = []

    def sink(verdicts, batch_id):
        seen.append(
            (batch_id, {r["doc_id"]: r.asDict() for r in verdicts.collect()})
        )

    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    q = run_streaming_span_gate(
        spark, stream(), state, sink, ckpt, min_len=4, overlap_frac=0.5
    )
    q.awaitTermination(240)

    assert len(seen) == 3
    got = {d: r for _, batch in seen for d, r in batch.items()}
    assert {d: r["verdict"] for d, r in got.items()} == {
        1: "unique", 2: "unique",
        3: "span_dup", 4: "unique",
        5: "span_dup", 6: "unique",
    }
    assert got[3]["n_overlap_tokens"] == 6 and got[3]["n_tokens"] == 7
    assert got[4]["n_overlap_tokens"] == 6 and got[4]["n_tokens"] == 12
    # the store holds postings ONLY for admitted docs
    stored_docs = {
        r["__doc"] for r in spark.read.parquet(dd(state)).select("__doc").distinct().collect()
    }
    assert stored_docs == {1, 2, 4, 6}

    # downtime arrival: an exact clone of R must be span_dup on restart
    spark.createDataFrame([(7, R)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    seen2: list[tuple[int, dict]] = []

    def sink2(verdicts, batch_id):
        seen2.append(
            (batch_id, {r["doc_id"]: r.asDict() for r in verdicts.collect()})
        )

    q2 = run_streaming_span_gate(
        spark, stream(), state, sink2, ckpt, min_len=4, overlap_frac=0.5
    )
    q2.awaitTermination(240)
    assert len(seen2) == 1  # only the downtime arrival replays
    (_, batch) = seen2[0]
    assert batch[7]["verdict"] == "span_dup"
    assert batch[7]["n_overlap_tokens"] == 6
    stored_docs = {
        r["__doc"] for r in spark.read.parquet(dd(state)).select("__doc").distinct().collect()
    }
    assert stored_docs == {1, 2, 4, 6}  # the rejected clone stored nothing



def test_streaming_span_gate_replay_is_idempotent(spark, tmp_path):
    """r10 (r9 advice, medium): the store append runs BEFORE sink, so a
    crash in between replays a batch whose own grams are already
    stored.  The self-anti-join must make the replayed verdicts
    identical to the first delivery (no diag-0 self-match span_dups),
    and the batch=<id> partition overwrite must leave the store
    row-identical (duplicate postings would corrupt the
    gaps-and-islands run reconstruction for later batches)."""
    import time

    from cherry_spark.streaming.continuous import run_streaming_span_gate

    schema = "doc_id long, text string"
    src = str(tmp_path / "in")
    R = "r1 r2 r3 r4 r5 r6"
    spark.createDataFrame(
        [(1, f"{R} tail1 tail2"), (2, "novel n2 n3 n4 n5")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    def collect_sink(acc):
        def sink(verdicts, batch_id):
            acc.append(
                (batch_id,
                 {r["doc_id"]: r.asDict() for r in verdicts.collect()})
            )
        return sink

    state = str(tmp_path / "state")
    first: list = []
    q = run_streaming_span_gate(
        spark, stream(), state, collect_sink(first),
        str(tmp_path / "ckpt1"), min_len=4, overlap_frac=0.5,
    )
    q.awaitTermination(240)
    assert {d: r["verdict"] for _, b in first for d, r in b.items()} == {
        1: "unique", 2: "unique"
    }
    stored_before = sorted(
        tuple(r) for r in spark.read.parquet(dd(state)).collect()
    )

    # simulate a crash between the store append and the checkpoint
    # commit: restart from a checkpoint whose commit marker for batch
    # 0 never landed — the SAME query id (the copy preserves the
    # metadata file, hence the same r10 run epoch and batch keys)
    # re-delivers batch 0 against a store that already holds the
    # batch's own grams. The copy-to-a-new-path matches reality (a
    # crash restarts in a fresh JVM) and sidesteps the live JVM's
    # per-path commit-log cache; a FRESH checkpoint would instead be
    # a NEW RUN, which since the epoch-namespaced keys ADDS to kept
    # history — that behavior has its own test.
    import os
    import shutil

    ck_replay = str(tmp_path / "ckpt1_replay")
    shutil.copytree(str(tmp_path / "ckpt1"), ck_replay)
    os.remove(os.path.join(ck_replay, "commits", "0"))
    crc = os.path.join(ck_replay, "commits", ".0.crc")
    if os.path.exists(crc):  # an orphaned checksum reads as a
        os.remove(crc)  # concurrent modification to Spark's log
    replay: list = []
    q2 = run_streaming_span_gate(
        spark, stream(), state, collect_sink(replay),
        ck_replay, min_len=4, overlap_frac=0.5,
    )
    q2.awaitTermination(240)
    assert {d: r["verdict"] for _, b in replay for d, r in b.items()} == {
        1: "unique", 2: "unique"  # NOT span_dup: no diag-0 self-match
    }
    stored_after = sorted(
        tuple(r) for r in spark.read.parquet(dd(state)).collect()
    )
    assert stored_after == stored_before  # overwrite, never duplicate

    # later batch still judged correctly against the replayed store:
    # a clone of R must be span_dup with exactly ONE maximal span
    # (duplicated postings would have shattered the island into three)
    spark.createDataFrame([(9, R)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(0.2)
    third: list = []
    q3 = run_streaming_span_gate(
        spark, stream(), state, collect_sink(third),
        ck_replay, min_len=4, overlap_frac=0.5,
    )
    q3.awaitTermination(240)
    got9 = {d: r for _, b in third for d, r in b.items()}[9]
    assert got9["verdict"] == "span_dup"
    assert got9["n_overlap_tokens"] == 6
    assert got9["n_spans"] == 1


def test_streaming_bm25_index_equals_from_scratch(spark, tmp_path):
    """Streaming BM25 index maintainer (r9): after every fold the
    store serves search results BIT-identical to an inline build over
    everything streamed so far; restart processes only downtime
    arrivals and the store stays exact."""
    import time

    from cherry_spark.ext.bm25 import bm25_topk
    from cherry_spark.streaming.continuous import run_streaming_bm25_index

    arrivals = [
        [(0, "spark query engine fast query"), (1, "query planner spark")],
        [(2, "slow table scan"), (3, "fast vector engine spark")],
        [(4, "unrelated words entirely"), (5, "query engine query")],
    ]
    schema = "doc_id long, text string"
    src = str(tmp_path / "in")
    for a in arrivals:
        spark.createDataFrame(a, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    folds: list[tuple[int, tuple]] = []

    def sink(stats, batch_id):
        (r,) = stats.collect()
        folds.append((batch_id, (r["n_docs"], r["total_len"])))

    state = str(tmp_path / "bm25")
    ckpt = str(tmp_path / "ckpt")
    q = run_streaming_bm25_index(spark, stream(), state, sink, ckpt)
    q.awaitTermination(240)
    assert len(folds) == 3
    assert sorted(folds)[-1][1] == (6, 21)  # all docs, total token count

    # served search == inline build over everything streamed
    all_docs = spark.createDataFrame(
        [d for a in arrivals for d in a], schema
    )
    qdf = all_docs.filter(F.col("doc_id").isin(0, 2)).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    inline = sorted(
        tuple(r) for r in bm25_topk(all_docs, qdf, k=3).collect()
    )
    served = sorted(
        tuple(r)
        for r in bm25_topk(None, qdf, k=3, index_dir=state).collect()
    )
    assert served == inline

    # downtime arrival, then restart with the same checkpoint
    spark.createDataFrame(
        [(6, "fresh spark doc arrives late")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    folds2: list[tuple[int, tuple]] = []

    def sink2(stats, batch_id):
        (r,) = stats.collect()
        folds2.append((batch_id, (r["n_docs"], r["total_len"])))

    q2 = run_streaming_bm25_index(spark, stream(), state, sink2, ckpt)
    q2.awaitTermination(240)
    assert len(folds2) == 1 and folds2[0][1] == (7, 26)
    all7 = all_docs.unionByName(
        spark.createDataFrame([(6, "fresh spark doc arrives late")], schema)
    )
    inline7 = sorted(tuple(r) for r in bm25_topk(all7, qdf, k=3).collect())
    served7 = sorted(
        tuple(r)
        for r in bm25_topk(None, qdf, k=3, index_dir=state).collect()
    )
    assert served7 == inline7



def test_bm25_fold_replay_never_duplicates_tf_dl(spark, tmp_path):
    """r10 (r9 advice): a crash between the tf/dl appends and the
    dfreq/stats commit, followed by replay, used to duplicate tf/dl
    rows permanently (doubling the scoring join and tf).  With the
    appends staged into the same _commit_stores transaction under
    per-batch file names, a replayed fold must leave the WHOLE store
    identical to one clean execution of the fold sequence."""
    from cherry_spark.ext.bm25 import _index_tables
    from cherry_spark.streaming.continuous import (
        _commit_stores,
        _stage_append,
        bm25_index_fold,
    )

    schema = "doc_id long, text string"
    b0 = spark.createDataFrame(
        [(0, "spark query engine fast query"), (1, "query planner spark")],
        schema,
    )
    b1 = spark.createDataFrame(
        [(2, "slow table scan"), (3, "fast vector engine spark")], schema
    )

    def canon(path):
        import os

        out = {}
        for t in ("tf", "dl", "dfreq", "stats"):
            out[t] = sorted(
                tuple(r) for r in spark.read.parquet(dd(f"{path}/{t}")).collect()
            )
        return out

    # reference: the clean two-fold sequence
    ref_state = str(tmp_path / "ref")
    bm25_index_fold(spark, b0, ref_state, batch_key="b0")
    bm25_index_fold(spark, b1, ref_state, batch_key="b1")
    ref = canon(ref_state)

    # crashed run: fold b0 cleanly, then simulate a crash DURING fold
    # b1 after the tf/dl appends committed but before the merge swaps
    state = str(tmp_path / "crashed")
    bm25_index_fold(spark, b0, state, batch_key="b0")
    tf, dl, _dfreq, _stats = _index_tables(b1, "doc_id", "text")
    _commit_stores(
        [
            _stage_append(tf, f"{state}/tf", "b1"),
            _stage_append(dl, f"{state}/dl", "b1"),
        ]
    )
    # replay of batch 1 (foreachBatch re-delivers with the same id)
    bm25_index_fold(spark, b1, state, batch_key="b1")
    assert canon(state) == ref

    # full-commit replay (crash AFTER the whole commit, before the
    # checkpoint): the merge tables' _merge_key markers stop the
    # dfreq/stats double-merge — the r9 'one batch in one merge
    # table' residual is gone (r10 review)
    bm25_index_fold(spark, b1, state, batch_key="b1")
    assert canon(state) == ref


def test_self_compact_preserves_merge_marker_for_replay(spark, tmp_path):
    """r10: the worst-case interaction — a boundary fold commits
    fully, crashes before its checkpoint, and the REPLAY's fold-start
    self-compaction rewrites the merge tables. The _merge_key sidecar
    must survive the compaction rewrite so the replayed fold still
    skips the double-merge; the whole four-table store must equal a
    clean fold sequence."""
    from cherry_spark.streaming.continuous import (
        _self_compact,
        bm25_index_fold,
    )

    schema = "doc_id long, text string"
    batches = [
        spark.createDataFrame([(10 * i, f"spark engine doc {i}")], schema)
        for i in range(3)
    ]

    def canon(path):
        return {
            t: sorted(
                tuple(r) for r in spark.read.parquet(dd(f"{path}/{t}")).collect()
            )
            for t in ("tf", "dl", "dfreq", "stats")
        }

    ref = str(tmp_path / "ref")
    for i, b in enumerate(batches):
        bm25_index_fold(spark, b, ref, batch_key=f"b{i}")

    state = str(tmp_path / "crashed")
    for i, b in enumerate(batches):
        bm25_index_fold(spark, b, state, batch_key=f"b{i}")
    # crash after b2's full commit; the replay is a compaction
    # boundary, so its hook runs FIRST (dropping b2's appends,
    # compacting the merge tables — the marker must survive), then
    # the fold replays
    _self_compact(spark, state, "b2")
    bm25_index_fold(spark, batches[2], state, batch_key="b2")
    assert canon(state) == canon(ref)


def test_count_store_fold_replay_never_double_merges(spark, tmp_path):
    """r10 review: the additive count store is a single merge swap —
    with a batch key, a replayed fold finds its own _merge_key in the
    committed store and serves it as-is instead of re-adding the
    batch's counts."""
    from cherry_spark.ext.quality import bigram_counts
    from cherry_spark.streaming.continuous import count_store_fold

    schema = "doc_id long, text string"
    b0 = spark.createDataFrame([(0, "a b a b c")], schema)
    b1 = spark.createDataFrame([(1, "a b x y")], schema)
    canon = lambda p: sorted(  # noqa: E731
        tuple(r) for r in spark.read.parquet(dd(p)).collect()
    )

    ref = str(tmp_path / "ref")
    count_store_fold(
        spark, b0, ref, bigram_counts, ["prev", "cur"], batch_key="b0"
    ).collect()
    count_store_fold(
        spark, b1, ref, bigram_counts, ["prev", "cur"], batch_key="b1"
    ).collect()

    state = str(tmp_path / "crashed")
    count_store_fold(
        spark, b0, state, bigram_counts, ["prev", "cur"], batch_key="b0"
    ).collect()
    count_store_fold(
        spark, b1, state, bigram_counts, ["prev", "cur"], batch_key="b1"
    ).collect()
    # crash after commit, before checkpoint -> replay of batch 1
    (r,) = count_store_fold(
        spark, b1, state, bigram_counts, ["prev", "cur"], batch_key="b1"
    ).collect()
    assert canon(state) == canon(ref)
    assert r["n_keys"] == len(canon(ref))  # summary still correct


def test_streaming_positional_index_equals_from_scratch(spark, tmp_path):
    """Streaming positional-index maintainer (r9): after every fold
    the store serves exact-phrase search identical to an inline
    positional_postings build over everything streamed; restart
    processes only downtime arrivals and stays exact."""
    import time

    from cherry_spark.ext.phrase import phrase_search_topk, positional_postings
    from cherry_spark.streaming.continuous import run_streaming_positional_index

    arrivals = [
        [(0, "spark query engine fast query engine"), (1, "query engine spark")],
        [(2, "slow table scan"), (3, "query engine query engine query engine")],
        [(4, "unrelated words entirely"), (5, "engine query engine")],
    ]
    schema = "doc_id long, text string"
    src = str(tmp_path / "in")
    for a in arrivals:
        spark.createDataFrame(a, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    folds: list[tuple[int, tuple]] = []

    def sink(summary, batch_id):
        (r,) = summary.collect()
        folds.append((batch_id, (r["n_docs"], r["n_postings"])))

    state = str(tmp_path / "pos")
    ckpt = str(tmp_path / "ckpt")
    q = run_streaming_positional_index(spark, stream(), state, sink, ckpt)
    q.awaitTermination(240)
    assert len(folds) == 3
    assert sum(n for _, (n, _) in folds) == 6  # every doc folded once

    phrases = spark.createDataFrame(
        [(0, "query engine"), (1, "engine query engine")],
        "phrase_id long, phrase string",
    )
    all_docs = spark.createDataFrame([d for a in arrivals for d in a], schema)
    canon = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    inline = canon(phrase_search_topk(all_docs, phrases, k=3))
    served = canon(
        phrase_search_topk(
            None, phrases, k=3, postings=spark.read.parquet(dd(state))
        )
    )
    assert served == inline
    # overlapping-occurrence semantics survive the store round-trip:
    # "query engine" occurs twice in doc 0 and thrice in doc 3
    got = {(r[0], r[1]): r[2] for r in served}
    assert got[(0, 0)] == 2 and got[(0, 3)] == 3

    # store is row-identical to a from-scratch build (not just same ranks)
    assert canon(spark.read.parquet(dd(state))) == canon(
        positional_postings(all_docs)
    )

    # downtime arrival, then restart with the same checkpoint
    late = [(6, "query engine arrives late")]
    spark.createDataFrame(late, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    folds2: list[tuple[int, tuple]] = []

    def sink2(summary, batch_id):
        (r,) = summary.collect()
        folds2.append((batch_id, (r["n_docs"], r["n_postings"])))

    q2 = run_streaming_positional_index(spark, stream(), state, sink2, ckpt)
    q2.awaitTermination(240)
    assert len(folds2) == 1 and folds2[0][1] == (1, 4)
    all7 = all_docs.unionByName(spark.createDataFrame(late, schema))
    inline7 = canon(phrase_search_topk(all7, phrases, k=3))
    served7 = canon(
        phrase_search_topk(
            None, phrases, k=3, postings=spark.read.parquet(dd(state))
        )
    )
    assert served7 == inline7


def _pair_graph_stream(spark, tmp_path, arrivals, schema, src):
    import time

    for a in arrivals:
        spark.createDataFrame(a, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_streaming_pair_graph_equals_from_scratch(spark, tmp_path):
    """Streaming pair-graph maintainer (r9): on a corpus whose shingle
    frequencies stay under the cap, the appended edge table is
    row-identical to ngram_jaccard_pairs over everything streamed,
    after every fold and across a kill-and-restart."""
    from cherry_spark.ext.dedup import ngram_jaccard_pairs
    from cherry_spark.streaming.continuous import run_streaming_pair_graph

    arrivals = [
        [(0, "the quick brown fox jumps"), (1, "the quick brown fox leaps")],
        [(2, "a completely different doc here"),
         (3, "the quick brown fox jumps high")],
        [(4, "quick brown fox jumps over"),
         (5, "a completely different doc here too")],
    ]
    schema = "doc_id long, text string"
    src = str(tmp_path / "in")
    stream = _pair_graph_stream(spark, tmp_path, arrivals, schema, src)

    folds: list[tuple[int, tuple]] = []

    def sink(summary, batch_id):
        (r,) = summary.collect()
        folds.append((batch_id, (r["n_docs"], r["n_new_pairs"])))

    state = str(tmp_path / "graph")
    ckpt = str(tmp_path / "ckpt")
    q = run_streaming_pair_graph(
        spark, stream, state, sink, ckpt, threshold=0.3
    )
    q.awaitTermination(240)
    assert len(folds) == 3
    assert sum(n for _, (n, _) in folds) == 6

    all_docs = spark.createDataFrame([d for a in arrivals for d in a], schema)
    canon = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    inline = canon(ngram_jaccard_pairs(all_docs, threshold=0.3))
    served = canon(spark.read.parquet(dd(f"{state}/pairs")))
    assert served == inline and len(inline) >= 3

    # downtime arrival, then restart from the same checkpoint: only
    # the new doc folds, and the graph stays exact
    late = [(6, "the quick brown fox jumps")]
    spark.createDataFrame(late, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    folds2: list[tuple[int, tuple]] = []

    def sink2(summary, batch_id):
        (r,) = summary.collect()
        folds2.append((batch_id, (r["n_docs"], r["n_new_pairs"])))

    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = run_streaming_pair_graph(
        spark, stream2, state, sink2, ckpt, threshold=0.3
    )
    q2.awaitTermination(240)
    assert len(folds2) == 1 and folds2[0][1][0] == 1
    all7 = all_docs.unionByName(spark.createDataFrame(late, schema))
    inline7 = canon(ngram_jaccard_pairs(all7, threshold=0.3))
    served7 = canon(spark.read.parquet(dd(f"{state}/pairs")))
    assert served7 == inline7


def test_streaming_pair_graph_fold_time_cap_semantics(spark, tmp_path):
    """A shingle crossing the cap mid-stream stops contributing to NEW
    pairs but never retro-edits edges already emitted (the span-gate
    fold-time contract) — where a from-scratch rebuild would drop the
    old edge too."""
    from cherry_spark.ext.dedup import ngram_jaccard_pairs
    from cherry_spark.streaming.continuous import run_streaming_pair_graph

    arrivals = [
        [(0, "x y z w"), (1, "x y z q")],  # df("x y z") = 2 == cap
        [(2, "x y z r")],  # pushes "x y z" over cap=2 -> hot
    ]
    schema = "doc_id long, text string"
    src = str(tmp_path / "in")
    stream = _pair_graph_stream(spark, tmp_path, arrivals, schema, src)

    folds = []
    state = str(tmp_path / "graph")
    q = run_streaming_pair_graph(
        spark,
        stream,
        state,
        lambda s, b: folds.append(s.collect()[0]["n_new_pairs"]),
        str(tmp_path / "ckpt"),
        threshold=0.3,
        max_bucket_size=2,
    )
    q.awaitTermination(240)
    # fold 1: pair (0,1) via shared "x y z" (J = 1/3); fold 2: "x y z"
    # now hot -> doc 2 shares nothing capped with anyone, no new edges
    assert folds == [1, 0]
    rows = sorted(tuple(r) for r in spark.read.parquet(dd(f"{state}/pairs")).collect())
    assert rows == [(0, 1, 1.0 / 3.0)]
    # the from-scratch twin under the SAME cap drops the old edge too —
    # the fold-time graph is the more-history-preserving of the two
    all_docs = spark.createDataFrame(
        [d for a in arrivals for d in a], schema
    )
    assert (
        ngram_jaccard_pairs(all_docs, threshold=0.3, max_bucket_size=2).count()
        == 0
    )


def test_compact_state_dir_preserves_maintainer_serving(spark, tmp_path):
    """Maintainer state compaction (r9): after folds fragment the
    append-only tables, compact_state_dir shrinks the file counts
    without changing a row — stored pairs identical, and the NEXT fold
    over the compacted state stays exact vs the from-scratch twin."""
    from cherry_spark.ext.dedup import ngram_jaccard_pairs
    from cherry_spark.streaming.continuous import pair_graph_fold
    from cherry_spark.writers.compact import (
        _n_parquet_files,
        compact_state_dir,
    )

    schema = "doc_id long, text string"
    arrivals = [
        [(0, "the quick brown fox jumps"), (1, "the quick brown fox leaps")],
        [(2, "a completely different doc here"),
         (3, "the quick brown fox jumps high")],
        [(4, "quick brown fox jumps over")],
    ]
    state = str(tmp_path / "graph")
    for a in arrivals:
        # many tiny appends: one fold per arrival, 2 shuffle partitions
        pair_graph_fold(
            spark, spark.createDataFrame(a, schema), state, threshold=0.3
        ).collect()

    canon = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    before = canon(spark.read.parquet(dd(f"{state}/pairs")))
    files_before = _n_parquet_files(f"{state}/postings")

    stats = compact_state_dir(spark, state)
    assert set(stats) >= {"postings", "sizes", "pairs", "dfreq"}
    assert _n_parquet_files(f"{state}/postings") < files_before
    assert canon(spark.read.parquet(dd(f"{state}/pairs"))) == before

    # the maintainer keeps folding correctly over the compacted state
    late = [(5, "the quick brown fox jumps")]
    pair_graph_fold(
        spark, spark.createDataFrame(late, schema), state, threshold=0.3
    ).collect()
    all_docs = spark.createDataFrame(
        [d for a in arrivals for d in a] + late, schema
    )
    assert canon(spark.read.parquet(dd(f"{state}/pairs"))) == canon(
        ngram_jaccard_pairs(all_docs, threshold=0.3)
    )


def test_maintainer_self_compacts_on_cadence(spark, tmp_path):
    """r10 (r9 verdict item #6): the maintainers self-compact every
    ``compact_every`` folds from inside their foreachBatch bodies —
    file counts stay bounded under many arrivals with NO manual
    compact_state_dir call, and the served store stays row-identical
    to a from-scratch build."""
    import time

    from cherry_spark.ext.phrase import positional_postings
    from cherry_spark.streaming.continuous import (
        run_streaming_positional_index,
    )
    from cherry_spark.writers.compact import _n_parquet_files

    schema = "doc_id long, text string"
    arrivals = [
        [(i, f"token{i} shared words appear here plus token{i}")]
        for i in range(5)
    ]
    src = str(tmp_path / "in")
    for a in arrivals:
        spark.createDataFrame(a, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    def sink(summary, batch_id):
        summary.collect()

    state = str(tmp_path / "pos")
    q = run_streaming_positional_index(
        spark,
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        state,
        sink,
        str(tmp_path / "ckpt"),
        compact_every=2,
    )
    q.awaitTermination(240)

    # folds 0..4 each commit >=1 file; compactions at folds 2 and 4
    # keep the running count bounded: after the fold-4 compaction the
    # store holds 1 compacted file + fold 4's own commit
    assert _n_parquet_files(state) < len(arrivals)
    canon = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    all_docs = spark.createDataFrame([d for a in arrivals for d in a], schema)
    assert canon(spark.read.parquet(dd(state))) == canon(
        positional_postings(all_docs)
    )


def test_self_compact_crash_windows_never_lose_state(spark, tmp_path):
    """r10: a crash at ANY point inside a self-compaction leaves the
    store recoverable by the next scheduled hook — (a) torn swap of an
    unpartitioned table (old parked, canonical missing), (b) staged
    ``__compact`` temp never swapped, (c) torn swap of a single HIVE
    PARTITION dir (the depth the fold's own _recover_store never
    looks at)."""
    import os
    import shutil

    from pyspark.sql import functions as F
    from cherry_spark.streaming.continuous import (
        _self_compact,
        doc_store_fold,
    )
    from cherry_spark.writers.compact import _n_parquet_files

    schema = "doc_id long, text string"
    transform = lambda df: df.select(  # noqa: E731
        "doc_id", F.length("text").alias("n")
    )
    state = str(tmp_path / "store")
    for i in range(3):
        doc_store_fold(
            spark,
            spark.createDataFrame([(i, f"text number {i}")], schema),
            state,
            transform,
            batch_key=f"b{i}",
        ).collect()
    canon = lambda p: sorted(  # noqa: E731
        tuple(r) for r in spark.read.parquet(dd(p)).collect()
    )
    ref = canon(state)

    # (a) crash between compact_dataset's two renames: old parked,
    # canonical gone
    os.rename(state, f"{state}__old_deadbeef")
    _self_compact(spark, state, "b3")
    assert canon(state) == ref
    assert not os.path.exists(f"{state}__old_deadbeef")

    # (b) crash after staging the compacted rewrite, before the swap
    shutil.copytree(state, f"{state}__compact_deadbeef")
    _self_compact(spark, state, "b4")
    assert canon(state) == ref
    assert not os.path.exists(f"{state}__compact_deadbeef")

    # (c) torn swap one level down, on a hive PARTITION dir
    state2 = str(tmp_path / "part_store")
    tbl = f"{state2}/tbl"
    for i in range(3):
        spark.createDataFrame(
            [(i, i % 2, f"row{i}")], "doc_id long, p long, text string"
        ).write.partitionBy("p").mode("append").parquet(tbl)
    ref2 = canon(tbl)
    files_before = _n_parquet_files(tbl)
    os.rename(f"{tbl}/p=1", f"{tbl}/p=1__old_deadbeef")
    _self_compact(spark, state2, "b9")
    assert canon(tbl) == ref2
    assert not os.path.exists(f"{tbl}/p=1__old_deadbeef")
    assert _n_parquet_files(tbl) < files_before  # and it compacted


def test_pair_graph_fold_replay_after_commit_is_idempotent(spark, tmp_path):
    """r10 review: pair_graph_fold READS its own postings/sizes
    stores, so a crash AFTER the commit but BEFORE the checkpoint
    (sink) used to replay against a store already containing the
    batch — doubled stored shingles inflated hot hits, duplicated
    size rows multiplied pair rows, and the wrong pairs REPLACED the
    correct ones under the deterministic key. The fold now deletes
    its own key's files first; the replayed append tables must equal
    a clean two-fold sequence exactly."""
    from cherry_spark.streaming.continuous import pair_graph_fold

    schema = "doc_id long, text string"
    b0 = spark.createDataFrame(
        [(0, "the quick brown fox jumps high"), (1, "a different doc here")],
        schema,
    )
    b1 = spark.createDataFrame(
        [(2, "the quick brown fox jumps low"), (3, "unrelated words only")],
        schema,
    )

    def canon(path, tables=("postings", "sizes", "pairs", "dfreq")):
        return {
            t: sorted(
                tuple(r) for r in spark.read.parquet(dd(f"{path}/{t}")).collect()
            )
            for t in tables
        }

    ref = str(tmp_path / "ref")
    pair_graph_fold(spark, b0, ref, threshold=0.3, batch_key="b0").collect()
    pair_graph_fold(spark, b1, ref, threshold=0.3, batch_key="b1").collect()

    state = str(tmp_path / "crashed")
    pair_graph_fold(spark, b0, state, threshold=0.3, batch_key="b0").collect()
    # fold b1 commits fully, then the process "crashes" before the
    # checkpoint — foreachBatch re-delivers batch 1
    pair_graph_fold(spark, b1, state, threshold=0.3, batch_key="b1").collect()
    pair_graph_fold(spark, b1, state, threshold=0.3, batch_key="b1").collect()
    # ALL four tables exact — the appends replace their own attempt,
    # and the dfreq merge swap's _merge_key marker stops the replay
    # from double-merging (no residual left in this maintainer)
    assert canon(state) == canon(ref)
    assert len(canon(state)["pairs"]) > 0  # the scenario exercised pairs


def test_fresh_checkpoint_run_preserves_prior_state(spark, tmp_path):
    """r10 review: batch ids restart at 0 under a FRESH checkpoint
    dir, and the delete-same-key commit would silently destroy the
    old run's b0 history in a kept state dir. Keys are now namespaced
    by the checkpoint's persisted query id, so a second run over the
    same store ADDS to it."""
    from pyspark.sql import functions as F
    from cherry_spark.streaming.continuous import run_streaming_doc_store

    schema = "doc_id long, text string"
    transform = lambda df: df.select(  # noqa: E731
        "doc_id", F.length("text").alias("n")
    )
    state = str(tmp_path / "store")

    def run_once(tag, rows):
        src = str(tmp_path / f"in_{tag}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = run_streaming_doc_store(
            spark,
            spark.readStream.schema(schema).parquet(src),
            state,
            transform,
            lambda s, b: s.collect(),
            str(tmp_path / f"ckpt_{tag}"),  # fresh checkpoint each run
        )
        q.awaitTermination(120)

    run_once("one", [(0, "first run doc"), (1, "another first run doc")])
    run_once("two", [(2, "second run doc")])
    got = sorted(r["doc_id"] for r in spark.read.parquet(dd(state)).collect())
    assert got == [0, 1, 2]  # run two added; run one's history intact


def test_self_compact_preserves_replay_of_crashed_attempt(spark, tmp_path):
    """r10: the hook must DELETE the current batch's crashed-attempt
    files before compacting — folding them into anonymous part files
    would hide them from the replay's delete-same-key pass and
    duplicate the batch permanently. Sequence: fold b0, crash after
    b1's append committed but before its checkpoint, self-compaction
    fires at the start of b1's REPLAY, then the replayed fold runs —
    the store must equal the clean two-fold sequence."""
    from pyspark.sql import functions as F
    from cherry_spark.streaming.continuous import _self_compact, doc_store_fold

    schema = "doc_id long, text string"
    transform = lambda df: df.select(  # noqa: E731
        "doc_id", F.length("text").alias("n")
    )
    b0 = spark.createDataFrame([(0, "first doc"), (1, "second doc")], schema)
    b1 = spark.createDataFrame([(2, "third doc"), (3, "fourth doc")], schema)
    canon = lambda p: sorted(  # noqa: E731
        tuple(r) for r in spark.read.parquet(dd(p)).collect()
    )

    ref = str(tmp_path / "ref")
    doc_store_fold(spark, b0, ref, transform, batch_key="b0").collect()
    doc_store_fold(spark, b1, ref, transform, batch_key="b1").collect()

    state = str(tmp_path / "crashed")
    doc_store_fold(spark, b0, state, transform, batch_key="b0").collect()
    # crashed attempt: b1's store append landed, checkpoint did not
    doc_store_fold(spark, b1, state, transform, batch_key="b1").collect()
    # replay of batch 1 begins with the scheduled self-compaction
    _self_compact(spark, state, "b1")
    doc_store_fold(spark, b1, state, transform, batch_key="b1").collect()
    assert canon(state) == canon(ref)


def test_streaming_ivf_index_equals_batch_assignment(spark, tmp_path):
    """Streaming IVF maintainer (r9): new embeddings assigned to the
    FIXED stored centroids fold into the partitioned corpus; the
    maintained index is row-identical to assigning everything seen in
    one batch against the same centroids, searches match, and restart
    processes only the downtime arrival."""
    import time

    from cherry_spark.ext.ivf import ivf_assign, ivf_build_index, ivf_search
    from cherry_spark.streaming.continuous import run_streaming_ivf_index

    def vec(i):
        return [float((i * 7) % 11), float((i * 3) % 5), float(i % 4)]

    schema = "vec_id long, embedding array<double>"
    base = [(i, vec(i)) for i in range(20)]
    arrivals = [
        [(100 + i, vec(100 + i)) for i in range(10)],
        [(200 + i, vec(200 + i)) for i in range(10)],
    ]
    index = str(tmp_path / "ivf")
    ivf_build_index(
        spark.createDataFrame(base, schema), index, n_centroids=4
    )

    src = str(tmp_path / "in")
    for a in arrivals:
        spark.createDataFrame(a, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    folds = []
    q = run_streaming_ivf_index(
        spark,
        stream,
        index,
        lambda s, b: folds.append(tuple(s.collect()[0])),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(240)
    assert len(folds) == 2 and all(n == 10 for n, _ in folds)

    # maintained corpus == one-shot assignment against the SAME centroids
    all_rows = base + [r for a in arrivals for r in a]
    all_df = spark.createDataFrame(all_rows, schema)
    centroids = spark.read.parquet(dd(f"{index}/centroids"))
    ref = all_df.join(ivf_assign(all_df, centroids), on="vec_id")
    canon = lambda df: sorted(  # noqa: E731
        (r["vec_id"], tuple(r["embedding"]), r["centroid_id"])
        for r in df.collect()
    )
    assert canon(spark.read.parquet(dd(f"{index}/corpus"))) == canon(ref)

    # the probes table is co-maintained (r14): every streamed vector's
    # probe ranks are stored, so knn_graph serves stored probes with
    # NO union gap and equals an inline build over everything seen
    from cherry_spark.ext.ivf import _stored_probes, knn_graph

    stored = _stored_probes(
        spark,
        index,
        spark.read.parquet(dd(f"{index}/corpus")),
        2,
        "vec_id",
        "embedding",
    )
    assert stored is not None
    _covered, uncovered = stored
    assert uncovered.count() == 0
    graph = lambda df: sorted(  # noqa: E731
        (r["query_id"], r["vec_id"], r["sim"]) for r in df.collect()
    )
    served_graph = graph(
        knn_graph(all_df, k=2, n_centroids=4, nprobe=2, index_dir=index)
    )
    assert served_graph == graph(knn_graph(all_df, k=2, n_centroids=4, nprobe=2))

    # the _centroids_v marker survives a versioned self-compaction of
    # the probes table (sidecars ride the rewrite)
    from cherry_spark.streaming.continuous import _self_compact

    _self_compact(spark, index, "bC")
    assert (
        _stored_probes(
            spark,
            index,
            spark.read.parquet(dd(f"{index}/corpus")),
            2,
            "vec_id",
            "embedding",
        )
        is not None
    )

    # served search == search over a reference index built in one shot
    ref_index = str(tmp_path / "ivf_ref")
    ref.repartition("centroid_id").write.partitionBy("centroid_id").parquet(
        f"{ref_index}/corpus"
    )
    centroids.write.parquet(f"{ref_index}/centroids")
    qdf = all_df.filter(F.col("vec_id").isin(0, 105, 203)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = lambda d: sorted(  # noqa: E731
        tuple(r) for r in ivf_search(spark, d, qdf, k=3, nprobe=2).collect()
    )
    assert res(index) == res(ref_index)

    # downtime arrival + restart: only the new batch folds, still exact
    late = [(300, vec(300)), (301, vec(301))]
    spark.createDataFrame(late, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    folds2 = []
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = run_streaming_ivf_index(
        spark,
        stream2,
        index,
        lambda s, b: folds2.append(tuple(s.collect()[0])),
        str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(240)
    assert len(folds2) == 1 and folds2[0][0] == 2 and folds2[0][1] >= 1
    all7 = all_df.unionByName(spark.createDataFrame(late, schema))
    ref7 = all7.join(ivf_assign(all7, centroids), on="vec_id")
    assert canon(spark.read.parquet(dd(f"{index}/corpus"))) == canon(ref7)


def test_streaming_doc_store_serves_all_three_transforms(spark, tmp_path):
    """Generic per-doc store maintainer (r9): minhash signatures,
    simhash fingerprints and shingle postings all maintain through the
    same fold; each store is row-identical to a from-scratch build
    over everything streamed, and a batch consumer (minhash LSH dedup)
    serves from the maintained signature store with results identical
    to the inline path."""
    import time

    from cherry_spark.ext.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
        shingle_postings,
        simhash64,
    )
    from cherry_spark.streaming.continuous import run_streaming_doc_store

    arrivals = [
        [(0, "the quick brown fox jumps over the lazy dog today"),
         (1, "the quick brown fox jumps over the lazy dog tonight")],
        [(2, "a completely different document about spark clusters")],
    ]
    schema = "doc_id long, text string"
    src = str(tmp_path / "in")
    for a in arrivals:
        spark.createDataFrame(a, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    transforms = {
        "minhash": minhash_signatures,
        "simhash": simhash64,
        "postings": shingle_postings,
    }
    canon = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    all_docs = spark.createDataFrame([d for a in arrivals for d in a], schema)
    stores = {}
    for name, tf in transforms.items():
        folds = []
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = str(tmp_path / name)
        q = run_streaming_doc_store(
            spark,
            stream,
            state,
            tf,
            lambda s, b: folds.append(s.collect()[0]["n_rows"]),
            str(tmp_path / f"ckpt_{name}"),
        )
        q.awaitTermination(240)
        assert len(folds) == 2 and all(n > 0 for n in folds), name
        assert canon(spark.read.parquet(dd(state))) == canon(tf(all_docs)), name
        stores[name] = state

    # a batch consumer serves from the maintained store: identical
    # near-dup pairs to the inline signature path
    sigs = spark.read.parquet(stores["minhash"])
    served = canon(
        minhash_lsh_pairs(all_docs, jaccard_threshold=0.5, signatures=sigs)
    )
    inline = canon(minhash_lsh_pairs(all_docs, jaccard_threshold=0.5))
    assert served == inline and len(served) >= 1


def test_streaming_count_store_maintains_bigram_lm(spark, tmp_path):
    """Additive count-store maintainer (r9): the bigram LM counts
    merged fold-by-fold equal the from-scratch aggregate bit-for-bit,
    and bigram_logprob served from the maintained model matches the
    inline path."""
    import time

    from cherry_spark.ext.quality import bigram_counts, bigram_logprob
    from cherry_spark.streaming.continuous import run_streaming_count_store

    arrivals = [
        [(0, "the quick brown fox"), (1, "the quick red fox")],
        [(2, "the quick brown fox runs"), (3, "lazy dog sleeps")],
    ]
    schema = "doc_id long, text string"
    src = str(tmp_path / "in")
    for a in arrivals:
        spark.createDataFrame(a, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    folds = []
    state = str(tmp_path / "bigrams")
    q = run_streaming_count_store(
        spark,
        stream,
        state,
        bigram_counts,
        ["prev", "cur"],
        lambda s, b: folds.append(s.collect()[0]["n_keys"]),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(240)
    assert len(folds) == 2 and folds[-1] >= folds[0]

    all_docs = spark.createDataFrame([d for a in arrivals for d in a], schema)
    canon = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert canon(spark.read.parquet(dd(state))) == canon(bigram_counts(all_docs))
    served = canon(
        bigram_logprob(all_docs, counts=spark.read.parquet(dd(state)))
    )
    assert served == canon(bigram_logprob(all_docs))


def test_fold_overwrite_survives_torn_swap(spark, tmp_path):
    """Crash-safety of the merge-table overwrite (review r9): a plain
    overwrite deletes the only copy before rewriting, so a mid-write
    crash silently reset the store. With the swap + recovery scheme, a
    crash between the two renames (canonical dir parked under __old)
    restores the PRE-FOLD state at the next fold and the replayed
    batch merges into it correctly."""
    import os

    from cherry_spark.ext.quality import bigram_counts
    from cherry_spark.streaming.continuous import count_store_fold

    schema = "doc_id long, text string"
    state = str(tmp_path / "bigrams")
    b1 = spark.createDataFrame([(0, "a b a b")], schema)
    b2 = spark.createDataFrame([(1, "a b c")], schema)
    count_store_fold(spark, b1, state, bigram_counts, ["prev", "cur"]).collect()

    # simulate the torn swap: canonical dir parked, replacement lost
    os.rename(state, f"{state}__old_deadbeef")
    count_store_fold(spark, b2, state, bigram_counts, ["prev", "cur"]).collect()

    got = {
        (r["prev"], r["cur"]): r["c2"]
        for r in spark.read.parquet(dd(state)).collect()
    }
    # full history: both folds' counts, not a silent reset to batch 2
    assert got == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    assert not os.path.exists(f"{state}__old_deadbeef")


def test_streaming_growing_semdedup_bootstraps_without_initial_corpus(
    spark, tmp_path
):
    """Review-r9 regression: the bootstrap branch (no initial_corpus —
    centroids seeded from the FIRST batch) referenced an undefined
    variable and crashed the stream; it was never exercised because
    every test passed initial_corpus. Drive it end-to-end: batch 1
    seeds the quantizer, a batch-2 clone of a batch-1 admission is
    caught."""
    import time

    from cherry_spark.streaming import run_streaming_growing_semdedup

    a1 = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
    a2 = [(10, [1.0, 0.0, 0.0, 0.0]),  # exact clone of 0
          (11, [0.0, 0.0, 0.0, 1.0])]
    schema = "vec_id long, embedding array<double>"
    src = str(tmp_path / "in")
    for a in (a1, a2):
        spark.createDataFrame(a, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    out: list[tuple[int, str]] = []
    q = run_streaming_growing_semdedup(
        spark,
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        str(tmp_path / "corpus"),
        lambda v, b: out.extend((r["vec_id"], r["verdict"]) for r in v.collect()),
        str(tmp_path / "ckpt"),
        threshold=0.95,
        n_centroids=2,
        nprobe=2,
    )
    q.awaitTermination(180)
    verdicts = dict(out)
    assert len(verdicts) == 4
    assert verdicts[10] == "semantic_dup"
    assert verdicts[0] == "unique" and verdicts[11] == "unique"


def test_compact_batched_lane_preserves_partition_merge_marker(spark, tmp_path):
    """r11 (advice): the batched one-file-per-dir lane must copy a
    partition dir's _merge_key sidecar into the rewritten dir like the
    serial lane does — losing it would let an in-flight batch's replay
    double-merge a future hive-partitioned merge table."""
    import os

    from cherry_spark.writers.compact import _n_parquet_files, compact_dataset

    path = str(tmp_path / "pm")
    for b in range(8):
        spark.range(b * 50, b * 50 + 50).selectExpr(
            "id", "CAST(id % 2 AS STRING) AS part"
        ).coalesce(1).write.partitionBy("part").mode("append").parquet(path)
    with open(os.path.join(path, "part=1", "_merge_key"), "w") as fh:
        fh.write("e9-b3")
    rows = spark.read.parquet(path).count()

    compact_dataset(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert _n_parquet_files(f"{path}/part=1") == 1  # batched lane ran
    assert spark.read.parquet(path).count() == rows
    with open(os.path.join(path, "part=1", "_merge_key")) as fh:
        assert fh.read() == "e9-b3"


def test_curation_gate_zero_admission_replay_rewrites_spent(spark, tmp_path):
    """r11 (advice): a replayed batch whose verdicts diverge to ZERO
    admissions after a crashed attempt committed its spent row must
    REWRITE the spent store to the pre-batch basis — leaving the
    crashed attempt's inflated (spent, prev) in place permanently
    steals budget.  The divergence is forced here by replaying under
    budget=0 (a real one needs a reseed-moved centroid; the contract
    under test — the store follows the DELIVERED verdicts — is the
    same)."""
    import os
    import shutil

    from cherry_spark.streaming.continuous import run_streaming_curation_gate

    rows = [
        (1, "alpha bravo charlie delta echo words", [1.0, 0.0, 0.0, 0.0], 0.9, 4),
        (2, "foxtrot golf hotel india juliet words", [0.0, 1.0, 0.0, 0.0], 0.8, 4),
    ]
    schema = (
        "doc_id long, text string, embedding array<double>, "
        "quality double, n_tokens long"
    )
    src = str(tmp_path / "in")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def stream():
        return spark.readStream.schema(schema).parquet(src)

    def collect_sink(acc):
        def sink(verdicts, batch_id):
            acc.append({r["doc_id"]: r["verdict"] for r in verdicts.collect()})
        return sink

    state = str(tmp_path / "state")
    first: list = []
    q = run_streaming_curation_gate(
        spark, stream(), state, collect_sink(first),
        str(tmp_path / "ckpt1"), budget=8, jaccard_threshold=0.5,
        semantic_threshold=0.95,
    )
    q.awaitTermination(240)
    assert first == [{1: "admitted", 2: "admitted"}]
    spent0 = spark.read.parquet(dd(f"{state}/spent")).first()
    assert (spent0["spent"], spent0["prev"]) == (8, 0)

    # crash-replay the batch, forcing zero admissions
    ck2 = str(tmp_path / "ckpt_replay")
    shutil.copytree(str(tmp_path / "ckpt1"), ck2)
    os.remove(os.path.join(ck2, "commits", "0"))
    crc = os.path.join(ck2, "commits", ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    replay: list = []
    q2 = run_streaming_curation_gate(
        spark, stream(), state, collect_sink(replay),
        ck2, budget=0, jaccard_threshold=0.5, semantic_threshold=0.95,
    )
    q2.awaitTermination(240)
    assert replay == [{1: "over_budget", 2: "over_budget"}]
    # the spent store follows the delivered verdicts: nothing admitted
    # => spent back at the pre-batch basis, not the crashed attempt's 8
    spent1 = spark.read.parquet(dd(f"{state}/spent")).first()
    assert (spent1["spent"], spent1["prev"]) == (0, 0)


def test_run_epoch_path_hash_fallback_warns(spark, tmp_path):
    """r11 (advice): the last-resort checkpoint-PATH-hash epoch reuses
    its namespace when a checkpoint is deleted and recreated at the
    same path — reaching it must be LOUD, not silent."""
    import warnings

    from cherry_spark.streaming.continuous import _run_epoch

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        tok = _run_epoch(str(tmp_path / "no_such_checkpoint"))
    assert len(tok) == 8
    assert any(
        "PATH hash" in str(w.message) and w.category is RuntimeWarning
        for w in caught
    )


def test_curation_gate_bus_mirror_follows_diverged_replay(spark, tmp_path):
    """r12 (r11 advice): a crash between the gate's bus_append and the
    checkpoint commit replays the batch; when the replayed verdicts
    diverge, the bus mirror must follow them like the keyed stores do
    — on_replay='replace_if_last' retracts the crashed attempt's
    manifest entry and re-appends the replay's rows.  Divergence is
    forced by replaying under budget=0 (the spent-store test's
    pattern): the bus must end up holding ZERO admitted rows for the
    batch, not the crashed attempt's two."""
    import os
    import shutil

    from cherry_spark.streaming.continuous import run_streaming_curation_gate
    from cherry_spark.writers.manifest_bus import live_files, read_manifest

    rows = [
        (1, "alpha bravo charlie delta echo words", [1.0, 0.0, 0.0, 0.0], 0.9, 4),
        (2, "foxtrot golf hotel india juliet words", [0.0, 1.0, 0.0, 0.0], 0.8, 4),
    ]
    schema = (
        "doc_id long, text string, embedding array<double>, "
        "quality double, n_tokens long"
    )
    src = str(tmp_path / "in")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def stream():
        return spark.readStream.schema(schema).parquet(src)

    state = str(tmp_path / "state")
    bus = str(tmp_path / "text_bus")
    q = run_streaming_curation_gate(
        spark, stream(), state, lambda v, b: None,
        str(tmp_path / "ckpt1"), budget=8, jaccard_threshold=0.5,
        semantic_threshold=0.95, text_bus_dir=bus,
    )
    q.awaitTermination(240)
    entries = read_manifest(bus)
    assert len(entries) == 1 and entries[0]["kind"] == "append"
    assert spark.read.parquet(*live_files(bus)).count() == 2

    # crash-replay the batch (checkpoint commit removed), forcing the
    # verdicts to diverge to zero admissions
    ck2 = str(tmp_path / "ckpt_replay")
    shutil.copytree(str(tmp_path / "ckpt1"), ck2)
    os.remove(os.path.join(ck2, "commits", "0"))
    crc = os.path.join(ck2, "commits", ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    q2 = run_streaming_curation_gate(
        spark, stream(), state, lambda v, b: None,
        ck2, budget=0, jaccard_threshold=0.5, semantic_threshold=0.95,
        text_bus_dir=bus,
    )
    q2.awaitTermination(240)
    # same single version slot, but now carrying the replay's (empty)
    # admissions — the crashed attempt's two rows are gone, so the bus
    # agrees with the text store (which holds nothing either)
    entries = read_manifest(bus)
    assert len(entries) == 1 and entries[0]["version"] == 1
    assert sum(
        spark.read.parquet(f).count() for f in live_files(bus)
    ) == 0
    text_dir = f"{state}/text"
    n_text = (
        spark.read.parquet(text_dir).count()
        if os.path.isdir(text_dir) and any(
            f.endswith(".parquet") for f in os.listdir(text_dir)
        )
        else 0
    )
    assert n_text == 0


def test_drop_batch_files_spares_hyphenated_sibling_keys(tmp_path):
    """r12 (the bus_append prefix fix applied one layer down): the
    store layer's delete-same-key pass must sweep only the exact
    '{key}-NNNNN.parquet' shape — a caller-supplied key that is a
    proper prefix of a hyphenated sibling ('run' vs 'run-1') must
    never delete the sibling's committed history, at any depth."""
    import os

    from cherry_spark.streaming.continuous import _drop_batch_files

    state = str(tmp_path / "table")
    sub = os.path.join(state, "part=a")
    os.makedirs(sub)
    own = os.path.join(state, "run-00000.parquet")
    own_deep = os.path.join(sub, "run-00001.parquet")
    own_wide = os.path.join(sub, "run-100000.parquet")  # >5-digit index
    sibling = os.path.join(state, "run-1-00000.parquet")
    sibling_deep = os.path.join(sub, "run-12345-00000.parquet")
    for p in (own, own_deep, own_wide, sibling, sibling_deep):
        open(p, "w").close()
    _drop_batch_files(state, "run")
    assert not os.path.exists(own)
    assert not os.path.exists(own_deep)
    assert not os.path.exists(own_wide)
    assert os.path.exists(sibling)
    assert os.path.exists(sibling_deep)
