"""Manifest-log bus (writers/manifest_bus.py + the cherry_bus
DataSource): the compactable streaming hand-off the raw-parquet
store-as-bus pattern cannot be — offsets are manifest versions, so a
compaction's renamed files never re-deliver (the documented caveat in
examples/curate_index_pipeline.py that this module retires)."""

from __future__ import annotations

import os

from cherry_spark.writers.manifest_bus import (
    bus_append,
    bus_compact,
    bus_snapshot,
    live_files,
    read_manifest,
)

SCHEMA = "doc_id long, text string"


def _batch(spark, lo, n):
    return spark.createDataFrame(
        [(i, f"doc {i}") for i in range(lo, lo + n)], SCHEMA
    ).coalesce(1)


def _rows(df):
    return sorted((r["doc_id"], r["text"]) for r in df.collect())


def _drain(spark, bus, ckpt, sink_rows, starting=None):
    from cherry_spark.sources.manifest_bus_datasource import (
        ManifestBusDataSource,
    )

    spark.dataSource.register(ManifestBusDataSource)
    reader = spark.readStream.format("cherry_bus").option("path", bus)
    if starting is not None:
        reader = reader.option("starting_version", starting)
    q = (
        reader.load()
        .writeStream.foreachBatch(
            lambda df, bid: sink_rows.extend(_rows(df))
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)


def test_append_snapshot_and_stream_roundtrip(spark, tmp_path):
    bus = str(tmp_path / "bus")
    for b in range(3):
        v = bus_append(_batch(spark, b * 10, 5), bus, f"e1-b{b}")
        assert v == b + 1
    expect = _rows(_batch(spark, 0, 5)) + _rows(_batch(spark, 10, 5)) + _rows(
        _batch(spark, 20, 5)
    )
    assert _rows(bus_snapshot(spark, bus)) == sorted(expect)

    got: list = []
    _drain(spark, bus, str(tmp_path / "ck"), got)
    assert sorted(got) == sorted(expect)


def test_stream_survives_compaction_without_redelivery(spark, tmp_path):
    bus = str(tmp_path / "bus")
    ckpt = str(tmp_path / "ck")
    bus_append(_batch(spark, 0, 5), bus, "e1-b0")
    bus_append(_batch(spark, 10, 5), bus, "e1-b1")
    got: list = []
    _drain(spark, bus, ckpt, got)
    assert len(got) == 10

    # consumers drained -> compact everything, then append more
    before = len(live_files(bus))
    stats = bus_compact(spark, bus, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_after"] == 1 and before == 2
    assert len(live_files(bus)) == 1
    bus_append(_batch(spark, 20, 5), bus, "e1-b2")

    # the restarted stream sees ONLY the new append — the rewrite
    # version delivers nothing and nothing tracks file names
    got2: list = []
    _drain(spark, bus, ckpt, got2)
    assert sorted(got2) == _rows(_batch(spark, 20, 5))
    # batch view stays complete across the rewrite
    assert len(_rows(bus_snapshot(spark, bus))) == 15


def test_append_replay_is_exactly_once(spark, tmp_path):
    bus = str(tmp_path / "bus")
    v1 = bus_append(_batch(spark, 0, 5), bus, "e1-b0")
    # replay of a fully-committed append: skipped, same version back
    v1b = bus_append(_batch(spark, 0, 5), bus, "e1-b0")
    assert v1 == v1b
    assert len(read_manifest(bus)) == 1
    assert len(_rows(bus_snapshot(spark, bus))) == 5

    # crash between file move and manifest commit: orphan same-key
    # files exist but no manifest entry — the replay replaces them
    orphan = os.path.join(bus, "data", "e1-b1-99999.parquet")
    import shutil

    shutil.copy(live_files(bus)[0], orphan)
    bus_append(_batch(spark, 10, 5), bus, "e1-b1")
    assert not os.path.exists(orphan)
    assert len(_rows(bus_snapshot(spark, bus))) == 10


def test_compact_lag_guard_protects_unconsumed_versions(spark, tmp_path):
    bus = str(tmp_path / "bus")
    for b in range(4):
        bus_append(_batch(spark, b * 10, 5), bus, f"e1-b{b}")
    # a consumer is checkpointed at version 2: protect 3 and 4
    stats = bus_compact(
        spark, bus, target_file_bytes=64 * 1024 * 1024,
        keep_after_version=2,
    )
    assert stats["files_before"] == 2 and stats["files_after"] == 1
    names = {os.path.basename(f) for f in live_files(bus)}
    assert any(n.startswith("e1-b2-") for n in names)  # v3 intact
    assert any(n.startswith("e1-b3-") for n in names)  # v4 intact
    assert len(_rows(bus_snapshot(spark, bus))) == 20

    # the lagging consumer resumes from v2 and gets exactly v3+v4
    got: list = []
    _drain(spark, bus, str(tmp_path / "ck"), got, starting="2")
    assert sorted(got) == sorted(
        _rows(_batch(spark, 20, 5)) + _rows(_batch(spark, 30, 5))
    )


def test_new_consumer_bootstraps_from_snapshot_after_compaction(
    spark, tmp_path
):
    bus = str(tmp_path / "bus")
    bus_append(_batch(spark, 0, 5), bus, "e1-b0")
    bus_append(_batch(spark, 10, 5), bus, "e1-b1")
    bus_compact(spark, bus, target_file_bytes=64 * 1024 * 1024)

    # bootstrap: batch-read the snapshot, then stream from latest
    boot = _rows(bus_snapshot(spark, bus))
    assert len(boot) == 10
    got: list = []
    _drain(spark, bus, str(tmp_path / "ck"), got, starting="latest")
    assert got == []  # nothing after the bootstrap version yet
    bus_append(_batch(spark, 20, 5), bus, "e1-b2")
    _drain(spark, bus, str(tmp_path / "ck"), got)
    assert sorted(boot + got) == _rows(
        _batch(spark, 0, 5).unionByName(_batch(spark, 10, 5)).unionByName(
            _batch(spark, 20, 5)
        )
    )


def test_crashed_compaction_sweeps_on_next_call(spark, tmp_path):
    """A crash AFTER the rewrite's manifest commit but BEFORE the
    retired files were deleted leaves them dead-but-present; the next
    compaction sweeps them and the snapshot never double-counts."""
    bus = str(tmp_path / "bus")
    bus_append(_batch(spark, 0, 5), bus, "e1-b0")
    bus_append(_batch(spark, 10, 5), bus, "e1-b1")
    import shutil

    keep = {}
    for f in live_files(bus):
        keep[f] = f + ".bak"
        shutil.copy(f, keep[f])
    bus_compact(spark, bus, target_file_bytes=64 * 1024 * 1024)
    # resurrect the retired files = the crash-before-delete state
    for f, bak in keep.items():
        shutil.copy(bak, f)
        os.remove(bak)
    assert len(_rows(bus_snapshot(spark, bus))) == 10  # manifest wins
    bus_compact(spark, bus, target_file_bytes=64 * 1024 * 1024)
    assert all(not os.path.exists(f) for f in keep)  # swept
    assert len(_rows(bus_snapshot(spark, bus))) == 10


def test_curation_gate_mirrors_admissions_to_bus(spark, tmp_path):
    """r11: with text_bus_dir set, the composed gate mirrors each
    batch's admitted (id, text) rows onto the manifest bus — snapshot
    == the raw text store, and compacting the BUS leaves both the
    snapshot and a downstream bus stream intact (the thing the raw
    text/ dir can never offer a file-source consumer)."""
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

    state = str(tmp_path / "state")
    bus = str(tmp_path / "bus")
    q = run_streaming_curation_gate(
        spark,
        spark.readStream.schema(schema).parquet(src),
        state,
        lambda df, bid: None,
        str(tmp_path / "ck"),
        budget=100,
        jaccard_threshold=0.5,
        semantic_threshold=0.95,
        text_bus_dir=bus,
    )
    q.awaitTermination(240)

    store_rows = _rows(spark.read.parquet(f"{state}/text"))
    assert len(store_rows) == 3
    assert _rows(bus_snapshot(spark, bus)) == store_rows
    bus_compact(spark, bus, target_file_bytes=64 * 1024 * 1024)
    assert _rows(bus_snapshot(spark, bus)) == store_rows


def test_bm25_maintainer_over_bus_survives_compaction(spark, tmp_path):
    """End-to-end: an index maintainer consuming the BUS through the
    cherry_bus DataSource keeps its unseen-ids contract across a bus
    compaction — no re-delivery, and the final index is bit-identical
    to an inline build over everything appended.  (The raw file-source
    bus re-delivers every compacted row here and the maintainer's
    exactness would break.)"""
    from pyspark.sql import functions as F

    from cherry_spark.ext.bm25 import bm25_topk
    from cherry_spark.sources.manifest_bus_datasource import (
        ManifestBusDataSource,
    )
    from cherry_spark.streaming.continuous import run_streaming_bm25_index

    spark.dataSource.register(ManifestBusDataSource)
    bus = str(tmp_path / "bus")
    ckpt = str(tmp_path / "ck_bm25")
    state = str(tmp_path / "bm25")
    arrivals = [
        [(0, "spark query engine fast query"), (1, "query planner spark")],
        [(2, "slow table scan"), (3, "fast vector engine spark")],
        [(4, "unrelated words entirely"), (5, "query engine query")],
    ]

    def drain():
        q = run_streaming_bm25_index(
            spark,
            spark.readStream.format("cherry_bus").option("path", bus).load(),
            state,
            lambda s, b: None,
            ckpt,
        )
        q.awaitTermination(240)

    bus_append(spark.createDataFrame(arrivals[0], SCHEMA), bus, "e1-b0")
    bus_append(spark.createDataFrame(arrivals[1], SCHEMA), bus, "e1-b1")
    drain()
    bus_compact(spark, bus, target_file_bytes=64 * 1024 * 1024)
    bus_append(spark.createDataFrame(arrivals[2], SCHEMA), bus, "e1-b2")
    drain()  # must fold ONLY batch 2 — compacted rows never re-deliver

    all_docs = spark.createDataFrame([d for a in arrivals for d in a], SCHEMA)
    qdf = all_docs.filter(F.col("doc_id").isin(0, 2)).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    inline = sorted(tuple(r) for r in bm25_topk(all_docs, qdf, k=3).collect())
    served = sorted(
        tuple(r) for r in bm25_topk(None, qdf, k=3, index_dir=state).collect()
    )
    assert served == inline


def test_bus_append_rejects_filename_unsafe_keys(spark, tmp_path):
    """Keys ride data and manifest FILENAMES (the O(listing) replay
    check); anything outside [A-Za-z0-9.-] must be rejected loudly."""
    import pytest

    bus = str(tmp_path / "bus")
    for bad in ("a_b", "a/b", "a b", "k*"):
        with pytest.raises(ValueError, match="must match"):
            bus_append(_batch(spark, 0, 1), bus, bad)
    # the epoch keyer's shape is accepted
    bus_append(_batch(spark, 0, 1), bus, "deadbeef-b0")


def test_hot_path_helpers_avoid_full_manifest_reads(spark, tmp_path):
    """last_version / entries_between parse versions from filenames
    and read only the JSONs in range."""
    from cherry_spark.writers.manifest_bus import (
        entries_between,
        last_version,
    )

    bus = str(tmp_path / "bus")
    assert last_version(bus) == 0
    for b in range(4):
        bus_append(_batch(spark, b * 10, 2), bus, f"e1-b{b}")
    assert last_version(bus) == 4
    mid = entries_between(bus, 1, 3)
    assert [e["version"] for e in mid] == [2, 3]
    assert all(e["kind"] == "append" for e in mid)


def test_streaming_bus_writer_roundtrip_and_replay(spark, tmp_path):
    """Producer adapter: a stream's micro-batches land on the bus
    exactly-once (epoch-namespaced keys), a downstream cherry_bus
    stream consumes them, and a restart of the producer after new
    arrivals appends only the new batch."""
    import time

    from cherry_spark.writers.manifest_bus import run_streaming_bus_writer

    src = str(tmp_path / "in")
    bus = str(tmp_path / "bus")
    ckpt = str(tmp_path / "ck_producer")
    for b in range(2):
        _batch(spark, b * 10, 4).write.mode("append").parquet(src)
        time.sleep(1.1)

    def produce():
        q = run_streaming_bus_writer(
            spark,
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            bus,
            ckpt,
        )
        q.awaitTermination(240)

    produce()
    assert len(read_manifest(bus)) == 2
    got: list = []
    _drain(spark, bus, str(tmp_path / "ck_consumer"), got)
    assert sorted(got) == _rows(
        _batch(spark, 0, 4).unionByName(_batch(spark, 10, 4))
    )

    # downtime arrival + producer restart: exactly one new version
    _batch(spark, 20, 4).write.mode("append").parquet(src)
    produce()
    assert len(read_manifest(bus)) == 3
    assert len(_rows(bus_snapshot(spark, bus))) == 12


def test_bus_compact_reclusters_on_sort_cols(spark, tmp_path):
    """sort_cols re-clusters the rewrite: rows preserved, and each
    output file holds a disjoint doc_id range (min/max pruning works
    downstream)."""
    import pyarrow.parquet as pq

    bus = str(tmp_path / "bus")
    # interleaved ranges so the pre-compaction files overlap badly
    bus_append(_batch(spark, 0, 50).filter("doc_id % 2 = 0"), bus, "e1-b0")
    bus_append(_batch(spark, 0, 50).filter("doc_id % 2 = 1"), bus, "e1-b1")
    rows = _rows(bus_snapshot(spark, bus))

    target = max(1024, sum(
        os.path.getsize(f) for f in live_files(bus)
    ) // 2)
    bus_compact(spark, bus, target_file_bytes=target, sort_cols=["doc_id"])
    assert _rows(bus_snapshot(spark, bus)) == rows
    ranges = []
    for f in live_files(bus):
        col = pq.read_table(f, columns=["doc_id"]).column("doc_id")
        if len(col):
            ranges.append((min(col.to_pylist()), max(col.to_pylist())))
    ranges.sort()
    assert len(ranges) >= 2
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi < b_lo  # disjoint ranges -> real min/max pruning


def test_key_named_compact_cannot_sweep_rewrite_files(spark, tmp_path):
    """A batch key literally named 'compact' must not collide with
    compaction outputs: rewrite files carry an underscore (impossible
    in keys), so the key's orphan-cleanup prefix never matches them."""
    bus = str(tmp_path / "bus")
    bus_append(_batch(spark, 0, 5), bus, "e1-b0")
    bus_append(_batch(spark, 10, 5), bus, "e1-b1")
    bus_compact(spark, bus, target_file_bytes=64 * 1024 * 1024)
    assert len(live_files(bus)) == 1
    # an append under the pathological key: the rewrite file survives
    bus_append(_batch(spark, 20, 5), bus, "compact")
    assert len(_rows(bus_snapshot(spark, bus))) == 15


def test_bus_consumer_version_reads_the_checkpoint(spark, tmp_path):
    """bus_consumer_version returns the consumer's last COMMITTED
    manifest version — the mechanical keep_after_version for safe
    compaction under lag — and 0 before any commit."""
    from cherry_spark.writers.manifest_bus import bus_consumer_version

    bus = str(tmp_path / "bus")
    ckpt = str(tmp_path / "ck")
    assert bus_consumer_version(ckpt) == 0
    bus_append(_batch(spark, 0, 4), bus, "e1-b0")
    bus_append(_batch(spark, 10, 4), bus, "e1-b1")
    got: list = []
    _drain(spark, bus, ckpt, got)
    assert bus_consumer_version(ckpt) == 2  # drained through v2

    # new appends the consumer has NOT committed do not move it
    bus_append(_batch(spark, 20, 4), bus, "e1-b2")
    assert bus_consumer_version(ckpt) == 2
    # the guarded compaction protects v3's files; the lagging
    # consumer then drains v3 intact
    bus_compact(
        spark, bus, target_file_bytes=64 * 1024 * 1024,
        keep_after_version=bus_consumer_version(ckpt),
    )
    _drain(spark, bus, ckpt, got)
    assert sorted(got) == _rows(
        _batch(spark, 0, 4)
        .unionByName(_batch(spark, 10, 4))
        .unionByName(_batch(spark, 20, 4))
    )
    assert bus_consumer_version(ckpt) >= 3


def test_second_writer_version_collision_is_loud(spark, tmp_path):
    """Single-writer enforcement (r11 verdict finding #1): two writers
    racing the same bus both compute last_version()+1; the commit must
    RAISE for the loser instead of silently clobbering (POSIX rename
    replaces) or silently double-committing one version (different-key
    filenames dodge put-if-absent).  Simulated by pinning the stale
    version read a racing writer would have made."""
    import pytest

    from cherry_spark.writers import manifest_bus as mb

    bus = str(tmp_path / "bus")
    bus_append(_batch(spark, 0, 4), bus, "e1-b0")
    bus_append(_batch(spark, 10, 4), bus, "e1-b1")  # commits v2

    # different-key race: writer B read last_version=1 before A's v2
    # landed — its filename differs, so only the twin-version re-list
    # can catch it
    orig = mb.last_version
    mb.last_version = lambda d: 1
    try:
        with pytest.raises(RuntimeError, match="single-writer"):
            mb._commit_entry(bus, {"kind": "append", "key": "zz", "files": []})
    finally:
        mb.last_version = orig
    # the loser retracted its entry; the winner's v2 is intact
    assert [e["key"] for e in read_manifest(bus)] == ["e1-b0", "e1-b1"]
    assert len(_rows(bus_snapshot(spark, bus))) == 8

    # same-filename race (two compactions: no key suffix): the
    # put-if-absent primitive itself raises
    mb._commit_entry(bus, {"kind": "rewrite", "files": [], "replaces": []})
    mb.last_version = lambda d: 2
    try:
        with pytest.raises(RuntimeError, match="single-writer"):
            mb._commit_entry(bus, {"kind": "rewrite", "files": [], "replaces": []})
    finally:
        mb.last_version = orig
    assert len(read_manifest(bus)) == 3
    # no staged strays left behind by either loser
    assert not [
        n for n in os.listdir(os.path.join(bus, "manifest"))
        if n.startswith("__tmp_")
    ]


def test_second_writer_collision_recovery(spark, tmp_path):
    """The runbook drill (r14 verdict item #4): after a second-writer
    collision raise, the operator stops the duplicate writer and
    re-runs the batch on the one remaining writer — bus_append's
    replay discipline sweeps the loser's unmanifested data files and
    lands the rows at the next version, never corrupting the winner's
    entries.  The raise's message points at the runbook."""
    import pytest

    from cherry_spark.writers import manifest_bus as mb

    bus = str(tmp_path / "bus")
    bus_append(_batch(spark, 0, 4), bus, "a-b0")
    bus_append(_batch(spark, 10, 4), bus, "a-b1")  # winner's v2

    # writer B raced: it read last_version=1, wrote + moved its data
    # files, then lost the twin-version re-list and crashed
    orig = mb.last_version
    mb.last_version = lambda d: 1
    try:
        with pytest.raises(RuntimeError, match="Recovery"):
            bus_append(_batch(spark, 20, 4), bus, "b-b0")
    finally:
        mb.last_version = orig
    # the loser's data files are on disk but unmanifested: invisible
    ddir = os.path.join(bus, "data")
    assert [n for n in os.listdir(ddir) if n.startswith("b-b0-")]
    assert [e["key"] for e in read_manifest(bus)] == ["a-b0", "a-b1"]
    assert len(_rows(bus_snapshot(spark, bus))) == 8  # winner intact

    # RECOVERY: duplicate writer stopped; re-run the batch on the one
    # remaining writer — the replay path sweeps the orphans and lands
    # the rows at the next version
    assert bus_append(_batch(spark, 20, 4), bus, "b-b0") == 3
    assert [e["key"] for e in read_manifest(bus)] == [
        "a-b0", "a-b1", "b-b0",
    ]
    expect = (
        _rows(_batch(spark, 0, 4))
        + _rows(_batch(spark, 10, 4))
        + _rows(_batch(spark, 20, 4))
    )
    assert _rows(bus_snapshot(spark, bus)) == sorted(expect)
    # exactly one committed file set for the recovered key — the
    # loser's orphans were swept, not double-served
    files = sorted(n for n in os.listdir(ddir) if n.startswith("b-b0-"))
    manifested = sorted(
        f
        for e in read_manifest(bus)
        if e.get("key") == "b-b0"
        for f in e["files"]
    )
    assert files == manifested


def test_hyphen_prefix_key_cleanup_spares_sibling_committed_files(
    spark, tmp_path
):
    """r11 advice (medium): '-' is legal inside keys, so key 'run'
    replaying must sweep only its own 'run-NNNNN.parquet' shape —
    never committed files of the hyphenated sibling key 'run-1'."""
    bus = str(tmp_path / "bus")
    bus_append(_batch(spark, 0, 5), bus, "run-1")
    # plant a crashed-attempt orphan of key 'run' (exact own shape)
    ddir = os.path.join(bus, "data")
    orphan = os.path.join(ddir, "run-00099.parquet")
    import shutil

    shutil.copy(live_files(bus)[0], orphan)
    bus_append(_batch(spark, 10, 5), bus, "run")
    # own orphan swept, sibling's committed file intact, both live
    assert not os.path.exists(orphan)
    assert any(
        os.path.basename(f).startswith("run-1-") for f in live_files(bus)
    )
    assert len(_rows(bus_snapshot(spark, bus))) == 10


def test_bus_append_replace_if_last_repairs_diverged_replay(spark, tmp_path):
    """r11 advice (low, continuous.py:943): a crash between bus_append
    and the checkpoint commit replays the batch, whose verdicts may
    legitimately differ — on_replay='replace_if_last' retracts the
    crashed attempt's entry (necessarily the newest: single writer,
    unCommitted checkpoint) and re-appends the replay's rows, keeping
    bus == keyed stores.  A key that is NOT the latest version means
    the checkpoint committed — replay semantics stay 'skip'."""
    bus = str(tmp_path / "bus")
    bus_append(_batch(spark, 0, 5), bus, "e1-b0")
    bus_append(_batch(spark, 10, 5), bus, "e1-b1")  # crashed attempt's rows

    # replayed fold derives DIFFERENT rows for b1
    v = bus_append(
        _batch(spark, 50, 3), bus, "e1-b1", on_replay="replace_if_last"
    )
    assert v == 2  # same version slot, corrected rows
    assert [e["key"] for e in read_manifest(bus)] == ["e1-b0", "e1-b1"]
    assert _rows(bus_snapshot(spark, bus)) == sorted(
        _rows(_batch(spark, 0, 5)) + _rows(_batch(spark, 50, 3))
    )

    # non-latest key: untouched skip (returns the existing version)
    bus_append(_batch(spark, 20, 5), bus, "e1-b2")
    v0 = bus_append(
        _batch(spark, 99, 1), bus, "e1-b0", on_replay="replace_if_last"
    )
    assert v0 == 1
    assert len(_rows(bus_snapshot(spark, bus))) == 13


def test_bus_consumer_version_source_index_disambiguates(tmp_path):
    """r11 advice (low): in a multi-source query another source's
    offset dict can also carry 'version' and win the default scan —
    source_index selects the cherry_bus offset positionally."""
    import json

    from cherry_spark.writers.manifest_bus import bus_consumer_version

    ckpt = str(tmp_path / "ck")
    os.makedirs(os.path.join(ckpt, "commits"))
    os.makedirs(os.path.join(ckpt, "offsets"))
    open(os.path.join(ckpt, "commits", "0"), "w").close()
    with open(os.path.join(ckpt, "offsets", "0"), "w") as fh:
        fh.write("v1\n")
        fh.write(json.dumps({"batchWatermarkMs": 0}) + "\n")
        # source 0 = cherry_bus at v3; source 1 = some other source
        # whose offset ALSO has a 'version' field
        fh.write(json.dumps(json.dumps({"version": 3})) + "\n")
        fh.write(json.dumps({"version": 7, "topic": "other"}) + "\n")
    assert bus_consumer_version(ckpt) == 7  # documented last-wins scan
    assert bus_consumer_version(ckpt, source_index=0) == 3
    assert bus_consumer_version(ckpt, source_index=1) == 7
    assert bus_consumer_version(ckpt, source_index=5) == 0


def test_producer_and_consumer_crash_composite_through_compaction(
    spark, tmp_path
):
    """r11 verdict item #6: kill the producer mid-bus_append (data
    files moved, manifest NOT committed) AND the consumer mid-batch in
    the same scenario, restart both, and assert exactly-once
    end-to-end through a compaction."""
    from cherry_spark.sources.manifest_bus_datasource import (
        ManifestBusDataSource,
    )
    from cherry_spark.writers import manifest_bus as mb

    bus = str(tmp_path / "bus")
    ckpt = str(tmp_path / "ck")
    bus_append(_batch(spark, 0, 5), bus, "e1-b0")

    # --- producer crash: file moves done, manifest commit dies
    orig_commit = mb._commit_entry
    mb._commit_entry = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("producer crash")
    )
    try:
        import pytest

        with pytest.raises(RuntimeError, match="producer crash"):
            bus_append(_batch(spark, 10, 5), bus, "e1-b1")
    finally:
        mb._commit_entry = orig_commit
    # orphan files exist, manifest doesn't know them
    assert len(read_manifest(bus)) == 1
    assert any(
        f.startswith("e1-b1-") for f in os.listdir(os.path.join(bus, "data"))
    )

    # --- consumer crash: first batch dies mid-sink before any commit
    spark.dataSource.register(ManifestBusDataSource)
    committed: dict[int, list] = {}
    crash_once = {"armed": True}

    def sink(df, bid):
        rows = _rows(df)
        if crash_once["armed"]:
            crash_once["armed"] = False
            raise RuntimeError("consumer crash")
        committed[bid] = rows

    def drain():
        q = (
            spark.readStream.format("cherry_bus").option("path", bus)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(240)
        except Exception:
            pass

    drain()  # dies on the crash-armed batch; nothing committed
    assert committed == {}

    # --- both restart: producer replay replaces its orphans and
    # commits v2; consumer re-delivers from v0.  An availableNow
    # restart with a PENDING planned batch terminates at that batch's
    # planned offset (documented in the DataSource docstring) — this
    # is exactly the case drain_bus (r13) exists for: its first run
    # replays the pending batch and stops at v1, the loop detects the
    # checkpoint still behind the head and runs again for v2.
    v = bus_append(_batch(spark, 10, 5), bus, "e1-b1")
    assert v == 2
    from cherry_spark.writers.manifest_bus import drain_bus

    def start_run():
        return (
            spark.readStream.format("cherry_bus").option("path", bus)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    runs = drain_bus(start_run, bus, ckpt, timeout_secs=240)
    assert runs == 2  # pending-batch replay run + the catch-up run
    delivered = sorted(r for rows in committed.values() for r in rows)
    expect = sorted(_rows(_batch(spark, 0, 5)) + _rows(_batch(spark, 10, 5)))
    assert delivered == expect

    # --- compaction with the consumer drained, then one more append:
    # restart delivers exactly the new rows, never the compacted ones
    stats = bus_compact(spark, bus, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_after"] == 1
    bus_append(_batch(spark, 20, 5), bus, "e1-b2")
    committed.clear()
    drain()
    assert sorted(
        r for rows in committed.values() for r in rows
    ) == _rows(_batch(spark, 20, 5))


def test_pair_graph_maintainer_over_bus_survives_compaction(spark, tmp_path):
    """r11 verdict item #5 (the last raw-parquet bus consumer): the
    pair-graph maintainer consuming the BUS keeps its unseen-ids
    contract across a bus compaction — no re-delivery — and the final
    edge table equals a from-scratch ngram_jaccard_pairs over
    everything appended."""
    from cherry_spark.ext.dedup import ngram_jaccard_pairs
    from cherry_spark.sources.manifest_bus_datasource import (
        ManifestBusDataSource,
    )
    from cherry_spark.streaming.continuous import run_streaming_pair_graph

    spark.dataSource.register(ManifestBusDataSource)
    bus = str(tmp_path / "bus")
    ckpt = str(tmp_path / "ck_graph")
    state = str(tmp_path / "graph")
    arrivals = [
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "the quick brown fox jumps over the lazy cat")],
        [(2, "completely different words live here today"),
         (3, "the quick brown fox jumps over the lazy dog")],
        [(4, "completely different words live here tomorrow"),
         (5, "nothing shared with anything else at all")],
    ]

    def drain():
        q = run_streaming_pair_graph(
            spark,
            spark.readStream.format("cherry_bus").option("path", bus).load(),
            state,
            lambda s, b: None,
            ckpt,
            threshold=0.5,
        )
        q.awaitTermination(240)

    bus_append(spark.createDataFrame(arrivals[0], SCHEMA), bus, "e1-b0")
    bus_append(spark.createDataFrame(arrivals[1], SCHEMA), bus, "e1-b1")
    drain()
    bus_compact(spark, bus, target_file_bytes=64 * 1024 * 1024)
    bus_append(spark.createDataFrame(arrivals[2], SCHEMA), bus, "e1-b2")
    drain()  # must fold ONLY batch 2 — compacted rows never re-deliver

    all_docs = spark.createDataFrame([d for a in arrivals for d in a], SCHEMA)
    # one sizes row per doc: re-delivery would duplicate them
    assert spark.read.parquet(f"{state}/sizes").count() == 6
    maintained = sorted(
        tuple(r) for r in spark.read.parquet(f"{state}/pairs").collect()
    )
    scratch = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(all_docs, threshold=0.5).collect()
    )
    assert maintained == scratch and len(maintained) >= 1


def test_max_versions_per_batch_bounds_backlog_batches(spark, tmp_path):
    """r12: the rate limit (Kafka maxOffsetsPerTrigger analogue) —
    a consumer facing a 5-version backlog with max_versions_per_batch=2
    and its own checkpoint passed as the base hint must take bounded
    bites (a capped COLD START over deep history), never one batch
    holding the whole history, and still deliver everything exactly
    once.  Without the hint the first batch of a run is uncapped (the
    only offset provably safe for a restart is the disk head)."""
    import time

    from cherry_spark.sources.manifest_bus_datasource import (
        ManifestBusDataSource,
    )
    from cherry_spark.writers.manifest_bus import (
        bus_consumer_version,
        last_version,
    )

    spark.dataSource.register(ManifestBusDataSource)
    bus = str(tmp_path / "bus")
    for b in range(5):
        bus_append(_batch(spark, b * 10, 4), bus, f"e1-b{b}")

    # continuous (processingTime) lane, checkpoint hint: the cap
    # engages from batch 0 of the cold start
    ckpt = str(tmp_path / "ck_cont")
    batch_rows: list[int] = []
    q = (
        spark.readStream.format("cherry_bus")
        .option("path", bus)
        .option("max_versions_per_batch", "2")
        .option("checkpoint", ckpt)
        .load()
        .writeStream.foreachBatch(
            lambda df, bid: batch_rows.append(df.count())
        )
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 seconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if bus_consumer_version(ckpt) >= last_version(bus):
            break
        time.sleep(0.5)
    q.stop()
    delivered = [n for n in batch_rows if n]
    # 5 versions x 4 rows at <=2 versions (8 rows) per batch
    assert sum(delivered) == 20
    assert max(delivered) <= 8 and len(delivered) >= 3

    # availableNow lane: each run processes ONE capped batch and
    # terminates; the documented drain loop absorbs the backlog
    ckpt2 = str(tmp_path / "ck_an")
    got: list = []
    runs = 0
    while bus_consumer_version(ckpt2) < last_version(bus) and runs < 10:
        q = (
            spark.readStream.format("cherry_bus")
            .option("path", bus)
            .option("max_versions_per_batch", "2")
            .option("checkpoint", ckpt2)
            .load()
            .writeStream.foreachBatch(
                lambda df, bid: got.extend(_rows(df))
            )
            .option("checkpointLocation", ckpt2)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)
        runs += 1
    assert runs >= 3  # bounded bites, not one run
    assert sorted(got) == sorted(
        r for b in range(5) for r in _rows(_batch(spark, b * 10, 4))
    )

    # no hint: the whole backlog lands in one (documented) first batch
    ckpt3 = str(tmp_path / "ck_nohint")
    sizes: list[int] = []
    q = (
        spark.readStream.format("cherry_bus")
        .option("path", bus)
        .option("max_versions_per_batch", "2")
        .load()
        .writeStream.foreachBatch(lambda df, bid: sizes.append(df.count()))
        .option("checkpointLocation", ckpt3)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    assert sizes == [20]


def test_replace_if_last_crash_mid_swap_self_heals(spark, tmp_path):
    """r13 verdict item #2: the entry swap is ONE put-if-absent
    generation commit.  A crash on either side of it leaves version N
    serving a COMPLETE entry — the pre-r14 'key unmanifested, version
    regressed' window no longer exists — and the replay re-enters the
    replace path and corrects."""
    import pytest as _pytest

    from cherry_spark.writers import fs, manifest_bus as mb

    bus = str(tmp_path / "bus")
    bus_append(_batch(spark, 0, 5), bus, "e1-b0")
    bus_append(_batch(spark, 10, 5), bus, "e1-b1")  # crashed attempt

    # crash BEFORE the generation commit: files staged, entry untouched
    real_commit = fs.commit_file

    def crash_before(src, dst):
        if "g2_" in os.path.basename(dst):
            raise RuntimeError("crash inside the swap")
        real_commit(src, dst)

    fs.commit_file = crash_before
    try:
        with _pytest.raises(RuntimeError, match="crash inside"):
            bus_append(
                _batch(spark, 50, 3), bus, "e1-b1", on_replay="replace_if_last"
            )
    finally:
        fs.commit_file = real_commit
    # the key is STILL manifested and version 2 serves the old rows —
    # at no instant is the version missing or empty
    assert [e["key"] for e in read_manifest(bus)] == ["e1-b0", "e1-b1"]
    assert _rows(bus_snapshot(spark, bus)) == sorted(
        _rows(_batch(spark, 0, 5)) + _rows(_batch(spark, 10, 5))
    )

    # crash AFTER the generation commit, before the sweeps: the new
    # generation already serves
    def crash_after(src, dst):
        real_commit(src, dst)
        if "g2_" in os.path.basename(dst):
            raise RuntimeError("crash after commit")

    fs.commit_file = crash_after
    try:
        with _pytest.raises(RuntimeError, match="crash after"):
            bus_append(
                _batch(spark, 50, 3), bus, "e1-b1", on_replay="replace_if_last"
            )
    finally:
        fs.commit_file = real_commit
    assert _rows(bus_snapshot(spark, bus)) == sorted(
        _rows(_batch(spark, 0, 5)) + _rows(_batch(spark, 50, 3))
    )

    # the replay replaces its own previous attempt (next generation)
    v = bus_append(
        _batch(spark, 60, 3), bus, "e1-b1", on_replay="replace_if_last"
    )
    assert v == 2
    assert _rows(bus_snapshot(spark, bus)) == sorted(
        _rows(_batch(spark, 0, 5)) + _rows(_batch(spark, 60, 3))
    )
    # one generation file per version; no stray data files
    names = sorted(os.listdir(os.path.join(bus, "manifest")))
    versions = [mb._parse_name(n)[0] for n in names]
    assert len(versions) == len(set(versions)) == 2
    data = set(os.listdir(os.path.join(bus, "data")))
    manifested = {f for e in read_manifest(bus) for f in e["files"]}
    assert data == manifested


def test_replace_if_last_success_retires_old_files(spark, tmp_path):
    """After a successful staged-first replace: the corrected entry
    names the replacement files, records the old generation as
    ``replaces``, and the old data files are gone from disk."""
    bus = str(tmp_path / "bus")
    bus_append(_batch(spark, 0, 2), bus, "e1-b0")
    bus_append(_batch(spark, 10, 2), bus, "e1-b1")
    old_files = read_manifest(bus)[-1]["files"]
    v = bus_append(
        _batch(spark, 50, 2), bus, "e1-b1", on_replay="replace_if_last"
    )
    assert v == 2
    entry = read_manifest(bus)[-1]
    assert entry["key"] == "e1-b1"
    assert all(f.startswith("replace_") for f in entry["files"])
    assert set(entry["replaces"]) == set(old_files)
    data = set(os.listdir(os.path.join(bus, "data")))
    assert not (data & set(old_files))
    # a SECOND diverged replay replaces its own replacement in place
    v = bus_append(
        _batch(spark, 70, 2), bus, "e1-b1", on_replay="replace_if_last"
    )
    assert v == 2
    assert _rows(bus_snapshot(spark, bus)) == sorted(
        _rows(_batch(spark, 0, 2)) + _rows(_batch(spark, 70, 2))
    )


def test_replace_after_compaction_absorption_warns(spark, tmp_path):
    """r12 advice (low): a bus_compact rewrite between the producer
    crash and its replay absorbs the crashed files — replace_if_last
    can no longer repair the divergence and must say so loudly
    instead of silently degrading to skip."""
    import pytest as _pytest

    bus = str(tmp_path / "bus")
    bus_append(_batch(spark, 0, 2), bus, "e1-b0")
    bus_append(_batch(spark, 10, 2), bus, "e1-b1")
    bus_compact(spark, bus, target_file_bytes=64 * 1024 * 1024)
    with _pytest.warns(RuntimeWarning, match="absorbed by a later"):
        v = bus_append(
            _batch(spark, 50, 2), bus, "e1-b1", on_replay="replace_if_last"
        )
    assert v == 2  # skip: the existing version stands
    assert len(_rows(bus_snapshot(spark, bus))) == 4


def test_bus_compact_producer_guard_refuses_pending_batch(spark, tmp_path):
    """r12 advice (low): compacting while a bus producer has a planned
    batch its commits log has not confirmed risks absorbing a
    mid-crash batch beyond replace_if_last's repair — the
    producer_checkpoints guard refuses."""
    import pytest as _pytest

    bus = str(tmp_path / "bus")
    bus_append(_batch(spark, 0, 2), bus, "e1-b0")
    ck = str(tmp_path / "producer_ck")
    os.makedirs(os.path.join(ck, "offsets"))
    os.makedirs(os.path.join(ck, "commits"))
    open(os.path.join(ck, "offsets", "0"), "w").close()
    with _pytest.raises(RuntimeError, match="planned batch with no commit"):
        bus_compact(spark, bus, producer_checkpoints=[ck])
    open(os.path.join(ck, "commits", "0"), "w").close()
    bus_compact(spark, bus, producer_checkpoints=[ck])  # drained: fine


def test_drain_bus_loops_until_caught_up(spark, tmp_path):
    """r12 verdict item: the availableNow drain discipline as code.  A
    rate-limited consumer needs one run per backlog bite; drain_bus
    loops runs until the checkpoint has committed through the bus
    head, and returns 0 runs when already caught up."""
    from cherry_spark.sources.manifest_bus_datasource import (
        ManifestBusDataSource,
    )
    from cherry_spark.writers.manifest_bus import (
        bus_consumer_version,
        drain_bus,
        last_version,
    )

    spark.dataSource.register(ManifestBusDataSource)
    bus = str(tmp_path / "bus")
    for b in range(4):
        bus_append(_batch(spark, 10 * b, 2), bus, f"e1-b{b}")
    ck = str(tmp_path / "ck")
    got: list = []

    def start_run():
        return (
            spark.readStream.format("cherry_bus")
            .option("path", bus)
            .option("max_versions_per_batch", "1")
            .option("checkpoint", ck)
            .load()
            .writeStream.foreachBatch(lambda d, b: got.extend(_rows(d)))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )

    runs = drain_bus(start_run, bus, ck, timeout_secs=240)
    assert runs >= 2  # the cap forced more than one availableNow run
    assert bus_consumer_version(ck) == last_version(bus) == 4
    assert sorted(set(got)) == sorted(
        r for b in range(4) for r in _rows(_batch(spark, 10 * b, 2))
    )
    assert drain_bus(start_run, bus, ck, timeout_secs=240) == 0


def test_hintless_cold_start_warns_over_deep_backlog(spark, tmp_path):
    """r12 verdict ("what's wrong" #1): a rate-limited consumer
    started WITHOUT the checkpoint hint over a backlog deeper than the
    cap plans its whole history as batch one — that first batch is now
    LOUD (with the two bounded recipes), never a silent unbounded
    plan; subsequent calls cap from the first return."""
    import pytest as _pytest

    from cherry_spark.sources.manifest_bus_datasource import (
        ManifestBusStreamReader,
    )

    bus = str(tmp_path / "bus")
    for b in range(5):
        bus_append(_batch(spark, 10 * b, 1), bus, f"e1-b{b}")
    reader = ManifestBusStreamReader(
        None, {"path": bus, "max_versions_per_batch": "2"}
    )
    with _pytest.warns(RuntimeWarning, match="unbounded"):
        off = reader.latestOffset()
    assert off == {"version": 5}  # safe (uncapped) head
    bus_append(_batch(spark, 90, 1), bus, "e1-b5")
    assert reader.latestOffset() == {"version": 6}  # capped from base

    # with the checkpoint hint the cold start is capped and silent
    import warnings as _warnings

    ck = str(tmp_path / "nonexistent_ck")
    hinted = ManifestBusStreamReader(
        None,
        {"path": bus, "max_versions_per_batch": "2", "checkpoint": ck},
    )
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        assert hinted.latestOffset() == {"version": 2}


def test_rate_limit_checkpoint_hint_respects_source_index(spark, tmp_path):
    """r12 advice (low): the rate-limit base must read the cherry_bus
    source's OWN offset line in a multi-source checkpoint — forwarded
    via the source_index reader option."""
    import json

    from cherry_spark.sources.manifest_bus_datasource import (
        ManifestBusStreamReader,
    )

    bus = str(tmp_path / "bus")
    for b in range(9):
        bus_append(_batch(spark, 10 * b, 1), bus, f"e1-b{b}")
    ck = str(tmp_path / "ck")
    os.makedirs(os.path.join(ck, "offsets"))
    with open(os.path.join(ck, "offsets", "0"), "w") as fh:
        fh.write("v1\n")
        fh.write(json.dumps({"batchWatermarkMs": 0}) + "\n")
        fh.write(json.dumps(json.dumps({"version": 3})) + "\n")  # bus
        fh.write(json.dumps({"version": 7, "topic": "other"}) + "\n")
    base_opts = {"path": bus, "max_versions_per_batch": "2", "checkpoint": ck}
    # default last-wins scan reads the WRONG source's 7
    assert ManifestBusStreamReader(None, dict(base_opts)).latestOffset() == {
        "version": 9
    }
    # source_index selects the bus's own line: base 3, cap 3+2
    assert ManifestBusStreamReader(
        None, dict(base_opts, source_index="0")
    ).latestOffset() == {"version": 5}


def test_bus_replace_protocol_random_interleavings(spark, tmp_path):
    """Property test (r13 verdict item #2, the bus twin of the store
    pointer property test): under ANY interleaving of {new-key append,
    diverged-replay replace, replace crashed BEFORE its generation
    commit, replace crashed AFTER it}, the bus's live rows always
    equal the model (last batch whose generation commit landed, per
    key), every version always resolves to exactly one complete entry
    (never missing, never empty), and after replay + compaction no
    stray data file or duplicate generation survives."""
    import re as _re

    import pyarrow.parquet as pq
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cherry_spark.writers import fs, manifest_bus as mb

    real_commit = fs.commit_file
    mode = {"crash": None}
    _REPLACE = _re.compile(r"v\d{8}g\d+_")

    def inject(src, dst):
        is_replace = _REPLACE.match(os.path.basename(dst))
        if is_replace and mode["crash"] == "before":
            mode["crash"] = None
            raise RuntimeError("injected crash before commit")
        real_commit(src, dst)
        if is_replace and mode["crash"] == "after":
            mode["crash"] = None
            raise RuntimeError("injected crash after commit")

    def rows_of(tag):
        return [(tag * 100 + i, f"r{tag}.{i}") for i in range(2)]

    def batch(tag):
        return spark.createDataFrame(rows_of(tag), SCHEMA).coalesce(1)

    def live_rows(bus):
        out = []
        for f in mb.live_files(bus):
            out += [
                (r["doc_id"], r["text"])
                for r in pq.read_table(f).to_pylist()
            ]
        return sorted(out)

    counter = [0]

    @settings(max_examples=8, deadline=None)
    @given(
        ops=st.lists(
            st.sampled_from(
                ["append", "replace_ok", "crash_before", "crash_after"]
            ),
            min_size=1,
            max_size=5,
        )
    )
    def run(ops):
        counter[0] += 1
        bus = str(tmp_path / f"pb{counter[0]}")
        model: dict[str, int] = {}  # key -> tag of the committed rows
        tag = [0]
        last_key = None
        fs.commit_file = inject
        try:
            for op in ops:
                tag[0] += 1
                if op == "append" or last_key is None:
                    key = f"k{len(model)}"
                    mb.bus_append(batch(tag[0]), bus, key)
                    model[key] = tag[0]
                    last_key = key
                elif op == "replace_ok":
                    mb.bus_append(
                        batch(tag[0]), bus, last_key,
                        on_replay="replace_if_last",
                    )
                    model[last_key] = tag[0]
                else:
                    mode["crash"] = (
                        "before" if op == "crash_before" else "after"
                    )
                    try:
                        mb.bus_append(
                            batch(tag[0]), bus, last_key,
                            on_replay="replace_if_last",
                        )
                    except RuntimeError:
                        pass
                    assert mode["crash"] is None  # injection fired
                    if op == "crash_after":
                        # the generation commit landed: rows corrected
                        model[last_key] = tag[0]
                    # mid-crash invariants BEFORE the replay: version N
                    # still serves a complete entry, old or new
                    expect = sorted(
                        r for t in model.values() for r in rows_of(t)
                    )
                    assert live_rows(bus) == expect
                    # replay discipline: foreachBatch re-runs the failed
                    # batch before any later batch can commit (the same
                    # invariant bus_compact's producer guard enforces)
                    tag[0] += 1
                    mb.bus_append(
                        batch(tag[0]), bus, last_key,
                        on_replay="replace_if_last",
                    )
                    model[last_key] = tag[0]
                # invariants after EVERY op, crashed or not
                expect = sorted(
                    r for t in model.values() for r in rows_of(t)
                )
                assert live_rows(bus) == expect
                versions = [v for v, _n in mb._version_names(bus)]
                assert versions == list(range(1, len(model) + 1))
            mb.bus_compact(spark, bus)
            expect = sorted(r for t in model.values() for r in rows_of(t))
            assert live_rows(bus) == expect
            # no duplicate generation and no unmanifested data file
            names = os.listdir(os.path.join(bus, "manifest"))
            parsed = [mb._parse_name(n) for n in names]
            assert all(p is not None for p in parsed)
            vs = [v for v, _g in parsed]
            assert len(vs) == len(set(vs))
            data = set(os.listdir(os.path.join(bus, "data")))
            manifested = {
                f for e in mb.read_manifest(bus) for f in e["files"]
            }
            dead = {
                f
                for e in mb.read_manifest(bus)
                for f in e.get("replaces", [])
            }
            assert manifested - dead <= data
            assert not (data - manifested)  # nothing stray survives
        finally:
            fs.commit_file = real_commit

    run()


def test_masked_generation_swept_at_next_commit(spark, tmp_path):
    """A replacement that crashed after its generation commit but
    before the superseded-generation sweep leaves the old entry file
    masked (readers resolve to the highest generation).  The next
    _commit_entry — any later append — retires it lazily."""
    from cherry_spark.writers import manifest_bus as mb

    bus = str(tmp_path / "bus")
    bus_append(_batch(spark, 0, 2), bus, "e1-b0")
    mdir = os.path.join(bus, "manifest")
    # simulate the masked leftover: a lower-generation twin of v1
    import json as _json

    with open(os.path.join(mdir, "v00000001_e1-b0.json")) as fh:
        entry = _json.load(fh)
    with open(os.path.join(mdir, "v00000001g2_e1-b0.json"), "w") as fh:
        _json.dump(entry, fh)
    # the original gen-1 file is now the masked one
    assert len(os.listdir(mdir)) == 2
    assert mb.last_version(bus) == 1
    bus_append(_batch(spark, 10, 2), bus, "e1-b1")
    names = sorted(os.listdir(mdir))
    assert names == ["v00000001g2_e1-b0.json", "v00000002_e1-b1.json"]


def test_replace_generation_collision_raises_loudly(spark, tmp_path):
    """A second writer committing the replace's target generation
    inside the listing->commit window is a single-writer violation:
    it must raise (like _commit_entry's twin check), never silently
    bump the generation — the racer overwrote this replace's staged
    per-generation files in place, so absorbing the collision would
    commit foreign bytes."""
    import pytest as _pytest

    from cherry_spark.writers import fs, manifest_bus as mb

    bus = str(tmp_path / "bus")
    bus_append(_batch(spark, 0, 2), bus, "e1-b0")
    bus_append(_batch(spark, 10, 2), bus, "e1-b1")

    real_commit = fs.commit_file

    def racer_lands_first(src, dst):
        if "g2_" in os.path.basename(dst) and not os.path.exists(dst):
            with open(dst, "w") as fh:
                fh.write("{}")  # the second writer's commit
        real_commit(src, dst)

    fs.commit_file = racer_lands_first
    try:
        with _pytest.raises(RuntimeError, match="single-writer"):
            bus_append(
                _batch(spark, 50, 2), bus, "e1-b1", on_replay="replace_if_last"
            )
    finally:
        fs.commit_file = real_commit


def test_stream_consumer_reads_replaced_generation(spark, tmp_path):
    """Consumer-facing semantics of the r14 generation protocol: a
    stream that has NOT yet consumed a version delivers the
    REPLACEMENT rows for it (the corrected replay is the truth), and
    a version's delivery is never empty mid-protocol."""
    from cherry_spark.writers import manifest_bus as mb

    bus = str(tmp_path / "bus")
    bus_append(_batch(spark, 0, 3), bus, "e1-b0")
    bus_append(_batch(spark, 10, 3), bus, "e1-b1")  # diverged attempt
    # the producer's replay corrects version 2 before any consumer
    mb.bus_append(_batch(spark, 50, 3), bus, "e1-b1", on_replay="replace_if_last")

    got: list = []
    _drain(spark, bus, str(tmp_path / "ck"), got)
    assert sorted(got) == sorted(
        _rows(_batch(spark, 0, 3)) + _rows(_batch(spark, 50, 3))
    )

    # a consumer checkpointed BEFORE the replaced version likewise
    # sees the corrected rows when it catches up
    got2: list = []
    _drain(spark, bus, str(tmp_path / "ck2"), got2, starting="1")
    assert sorted(got2) == _rows(_batch(spark, 50, 3))


def test_bus_compact_retires_masked_generations(spark, tmp_path):
    """A bus whose last producer op crashed after its generation
    commit (old gen file masked, never swept) and then only ever
    compacts: bus_compact retires the masked generation file."""
    import json as _json

    from cherry_spark.writers import manifest_bus as mb

    bus = str(tmp_path / "bus")
    bus_append(_batch(spark, 0, 2), bus, "e1-b0")
    mdir = os.path.join(bus, "manifest")
    with open(os.path.join(mdir, "v00000001_e1-b0.json")) as fh:
        entry = _json.load(fh)
    with open(os.path.join(mdir, "v00000001g2_e1-b0.json"), "w") as fh:
        _json.dump(entry, fh)  # the crashed replacement's commit
    assert len(os.listdir(mdir)) == 2
    bus_compact(spark, bus, target_file_bytes=1)
    names = [n for n in os.listdir(mdir) if mb._parse_name(n)]
    vs = [mb._parse_name(n)[0] for n in names]
    assert len(vs) == len(set(vs))  # one generation file per version
    assert len(_rows(bus_snapshot(spark, bus))) == 2
