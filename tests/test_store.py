"""Pointer-versioned store primitives (writers/store.py, r13 — the
r12 verdict item #2: the manifest-bus commit shape applied to the
store layer, retiring the local-fs-only directory swap).

The protocol under test: version dirs are immutable and invisible
until a put-if-absent pointer names them; a crash at any point leaves
either the old or the new version fully live; sweeps delete only what
the live pointer does not reference."""

from __future__ import annotations

import os

import pytest

from cherry_spark.writers import fs, store


def _mkfile(path, content="x"):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        fh.write(content)


def _stage(root, content):
    vdir = store.stage_version_dir(root)
    _mkfile(os.path.join(vdir, "part-0.parquet"), content)
    _mkfile(os.path.join(vdir, "_SUCCESS"), "")
    return vdir


def test_flat_store_resolves_to_itself(tmp_path):
    root = str(tmp_path / "t")
    assert store.live_version(root) is None
    assert store.data_dir(root) == root
    assert not store.ready(root)
    assert not store.has_parquet(root)
    _mkfile(os.path.join(root, "k-00000.parquet"))
    _mkfile(os.path.join(root, "_SUCCESS"), "")
    assert store.ready(root) and store.has_parquet(root)
    assert store.data_dir(root) == root


def test_commit_version_publishes_and_supersedes(tmp_path):
    root = str(tmp_path / "t")
    v1 = _stage(root, "one")
    assert store.data_dir(root) == root  # staged != visible
    name1 = store.commit_version(root, v1)
    assert store.live_version(root) == name1
    assert store.data_dir(root) == os.path.join(root, name1)
    assert store.ready(root) and store.has_parquet(root)

    v2 = _stage(root, "two")
    name2 = store.commit_version(root, v2)
    assert store.live_version(root) == name2
    # superseded version swept, exactly one pointer kept
    assert not os.path.exists(os.path.join(root, name1))
    ptrs = [p for p in os.listdir(os.path.join(root, "_v"))]
    assert len(ptrs) == 1 and ptrs[0].endswith(name2[2:])


def test_orphan_version_invisible_and_swept(tmp_path):
    root = str(tmp_path / "t")
    v1 = _stage(root, "live")
    store.commit_version(root, v1)
    orphan = _stage(root, "crashed")  # staged, never committed
    assert store.data_dir(root) == os.path.join(
        root, store.live_version(root)
    )
    store.sweep(root)
    assert not os.path.exists(orphan)
    assert store.has_parquet(root)  # live untouched


def test_conversion_sweeps_flat_legacy_files(tmp_path):
    """A flat store converted by its first version commit: the
    pointer wins immediately; stale top-level files (data, markers,
    hive partition dirs) are swept — crash-tolerant because they are
    invisible to resolvers the moment the pointer lands."""
    root = str(tmp_path / "t")
    _mkfile(os.path.join(root, "k-00000.parquet"), "old")
    _mkfile(os.path.join(root, "_SUCCESS"), "")
    _mkfile(os.path.join(root, "_merge_key"), "b0")
    _mkfile(os.path.join(root, "centroid_id=3", "p.parquet"), "old")
    v1 = _stage(root, "new")
    store.commit_version(root, v1)
    left = set(os.listdir(root))
    assert left == {"_v", os.path.basename(v1)}
    assert store.has_parquet(root)


def test_pointer_collision_retries_to_higher_seq(tmp_path):
    """Two racing committers (the legitimate _ensure_* cross-session
    race) both land, in a total order — put-if-absent makes the
    collision visible and the retry resolves it."""
    root = str(tmp_path / "t")
    v1 = _stage(root, "a")
    v2 = _stage(root, "b")
    # simulate the race: hand-commit a pointer at seq 1 for v1, then
    # ask commit_version to publish v2 — it must land at seq 2
    fs.ensure_dir(os.path.join(root, "_v"))
    _mkfile(os.path.join(root, "_v", f"p{1:010d}-{os.path.basename(v1)[2:]}"))
    store.commit_version(root, v2)
    assert store.live_version(root) == os.path.basename(v2)


def test_commit_version_rejects_garbage(tmp_path):
    root = str(tmp_path / "t")
    with pytest.raises(ValueError):
        store.commit_version(root, str(tmp_path / "not-a-version"))


def test_publish_roundtrip_spark(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    ddir = store.publish(df, root)
    assert ddir == store.data_dir(root) and ddir != root
    assert sorted(
        (r["id"], r["s"]) for r in spark.read.parquet(ddir).collect()
    ) == [(1, "a"), (2, "b")]
    # second publish supersedes atomically
    store.publish(df.withColumn("s", df.s), root)
    assert store.has_parquet(root)


def test_is_version_name_reserved_children():
    assert store.is_version_name("_v")
    assert store.is_version_name("v-0123abc")
    assert not store.is_version_name("tf")
    assert not store.is_version_name("centroid_id=3")
    assert not store.is_version_name("v-XYZ")


def test_versioned_compaction_sizes_partitions_by_bytes(spark, tmp_path):
    """The versioned compaction lane keeps the swap lane's byte
    heuristic at partition granularity: an oversized partition value
    splits across ~ceil(bytes/target) files (salted write tasks), a
    small one compacts to a single file — inside one immutable
    committed version."""
    from pyspark.sql import functions as F

    from cherry_spark.writers.compact import compact_dataset

    path = str(tmp_path / "t")
    big = spark.range(40_000).select(
        F.lit(0).alias("p"),
        F.col("id"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    small = spark.range(10).select(
        F.lit(1).alias("p"), F.col("id"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    big.unionByName(small).repartition(8).write.partitionBy("p").parquet(path)

    stats = compact_dataset(
        spark, path, target_file_bytes=256 * 1024, versioned=True
    )
    live = store.data_dir(path)
    assert live != path  # converted to the versioned layout
    per_part = {
        d: sum(
            1
            for f in os.listdir(os.path.join(live, d))
            if f.endswith(".parquet")
        )
        for d in os.listdir(live)
        if "=" in d
    }
    assert per_part["p=1"] == 1
    assert per_part["p=0"] >= 2  # oversized partition actually split
    assert stats["files_after"] == sum(per_part.values())
    got = spark.read.parquet(live)
    assert got.count() == 40_010
    assert got.filter("p = 1").count() == 10


def _backdate_tree(vdir, seconds_ago=48 * 3600):
    """Backdate EVERY entry in a staged tree — a crash that long ago."""
    import time

    old = time.time() - seconds_ago
    for r, dirs, files in os.walk(vdir, topdown=False):
        for n in dirs + files:
            os.utime(os.path.join(r, n), (old, old))
    os.utime(vdir, (old, old))


def _tree_newest_mtime(vdir):
    newest = os.path.getmtime(vdir)
    for r, dirs, files in os.walk(vdir):
        for n in dirs + files:
            newest = max(newest, os.path.getmtime(os.path.join(r, n)))
    return newest


def test_store_protocol_invariants_random_interleaving(tmp_path):
    """Property test (hypothesis): under ANY interleaving of
    {successful commit, crashed fresh staging (orphan), crashed STALE
    staging (whole tree past the reclamation grace), LIVE staging with
    a frozen root mtime (the hive-partition freeze — only inner writes
    are fresh), sweep}, the store always resolves to the LAST
    successfully committed version, its content is never lost or
    mixed, a full sweep leaves at most one version dir and one pointer
    alive, and a commit's superseded-only sweep reclaims stale orphans
    while never touching LIVE ones (fresh stagings AND frozen-root
    stagings with fresh inner writes — r15, verdict item #3)."""
    import time

    from hypothesis import given, settings, strategies as st

    counter = [0]

    @settings(max_examples=30, deadline=None)
    @given(
        ops=st.lists(
            st.sampled_from(
                ["commit", "orphan", "stale_orphan", "frozen_live", "sweep"]
            ),
            min_size=1,
            max_size=12,
        )
    )
    def run(ops):
        counter[0] += 1
        root = str(tmp_path / f"s{counter[0]}")
        committed = None  # content of the last committed version
        live_stagings: set[str] = set()
        n_commits = 0
        for op in ops:
            if op == "commit":
                n_commits += 1
                content = f"gen-{n_commits}"
                store.commit_version(root, _stage(root, content))
                committed = content
                # the post-commit sweep is superseded-only + stale
                # reclamation: LIVE stagings must all survive it
                assert all(os.path.isdir(v) for v in live_stagings)
            elif op == "orphan":
                live_stagings.add(_stage(root, "crashed"))
            elif op == "stale_orphan":
                stale = _stage(root, "crashed-long-ago")
                _backdate_tree(stale)
            elif op == "frozen_live":
                # a long hive-partitioned build: ROOT mtime frozen
                # 48h ago, the builder's fresh write lands only in a
                # partition SUBDIR (the freeze scenario that motivated
                # the tree walk) — must survive every superseded-only
                # sweep.  Re-backdate the root AFTER the subdir write:
                # creating the entry refreshes the parent mtime, which
                # would otherwise satisfy the cheap root stat and skip
                # the walk branch entirely (r15 review).
                vdir = _stage(root, "long-build")
                _mkfile(os.path.join(vdir, "p=1", "part-1.parquet"), "live")
                _backdate_tree(vdir)
                now = time.time()
                os.utime(
                    os.path.join(vdir, "p=1", "part-1.parquet"), (now, now)
                )
                live_stagings.add(vdir)
            else:
                store.sweep(root)
                live_stagings.clear()
                vdirs = [
                    d for d in os.listdir(root) if d.startswith("v-")
                ] if os.path.isdir(root) else []
                ptr_dir = os.path.join(root, "_v")
                ptrs = (
                    os.listdir(ptr_dir) if os.path.isdir(ptr_dir) else []
                )
                assert len(vdirs) <= 1 and len(ptrs) <= 1
            if op == "commit" or op == "sweep":
                # no stale orphan (tree-newest mtime past the grace)
                # survives any sweep-carrying op
                assert not any(
                    d.startswith("v-")
                    and time.time()
                    - _tree_newest_mtime(os.path.join(root, d))
                    > 24 * 3600
                    for d in (
                        os.listdir(root) if os.path.isdir(root) else []
                    )
                )
            # resolution invariant after EVERY op
            if committed is None:
                assert store.live_version(root) is None
            else:
                ddir = store.data_dir(root)
                assert ddir != root
                with open(os.path.join(ddir, "part-0.parquet")) as fh:
                    assert fh.read() == committed

    run()


def test_heartbeat_keeps_long_staging_alive_past_the_grace(tmp_path):
    """r15, verdict item #3: a slow builder whose whole staged tree
    has gone idle past the 24h grace survives a concurrent commit's
    sweep as long as it heartbeats (or writes anything); once truly
    dead — heartbeat included — the staging is reclaimed.  Callers
    can also disable reclamation per-commit with
    ``stale_orphans_after_s=None``."""
    import time

    root = str(tmp_path / "t")
    # heartbeat is safe BEFORE the first write materializes the
    # staging (stage_version_dir only names the dir — r15 review)
    early = store.stage_version_dir(root)
    store.heartbeat(early)
    assert os.path.exists(os.path.join(early, "_heartbeat"))
    fs.remove_tree(early)

    slow = _stage(root, "slow-build")
    _backdate_tree(slow)

    # heartbeat refreshes liveness: the staging survives the sweep.
    # Re-backdate the ROOT after the touch (creating _heartbeat
    # refreshes the parent dir's mtime) so ONLY the walk branch can
    # see the fresh marker — the r15 review caught the original test
    # passing via the cheap root stat without exercising the walk.
    store.heartbeat(slow)
    old = time.time() - 48 * 3600
    os.utime(slow, (old, old))
    store.commit_version(root, _stage(root, "gen-1"))
    assert os.path.isdir(slow)

    # builder dies: everything (heartbeat included) ages past the
    # grace -> the next commit reclaims the orphan
    _backdate_tree(slow)
    store.commit_version(root, _stage(root, "gen-2"))
    assert not os.path.exists(slow)

    # opt-out lane: a stale orphan survives when the committing
    # writer passes None (plumbed through commit_version, r15 advice)
    dead = _stage(root, "opted-out")
    _backdate_tree(dead)
    store.commit_version(
        root, _stage(root, "gen-3"), stale_orphans_after_s=None
    )
    assert os.path.isdir(dead)
    # ...and is reclaimed by the next default-grace commit
    store.commit_version(root, _stage(root, "gen-4"))
    assert not os.path.exists(dead)
    with open(os.path.join(store.data_dir(root), "part-0.parquet")) as fh:
        assert fh.read() == "gen-4"


def test_concurrent_ensure_race_is_structurally_safe(spark, tmp_path):
    """Two sessions build the same fingerprinted store concurrently.
    Since r14 the winner's post-commit sweep is superseded-ONLY, so
    the loser's in-flight staging SURVIVES the winner's commit and
    lands at the next sequence — both identical versions committed in
    a total order, the later one serving.  No deletion race exists in
    protocol anymore (r13 advice: the old full post-commit sweep could
    strand a live pointer on a deleted dir)."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id long, s string")

    orig = store.commit_version

    def winner_races_then_commit(path, vdir, *a):
        # the concurrent winner lands just before our commit runs
        store.commit_version = orig
        w = store.stage_version_dir(path)
        df.write.mode("overwrite").parquet(w)
        orig(path, w)  # winner's commit: superseded-only sweep
        assert os.path.isdir(vdir)  # our staging survived the winner
        return orig(path, vdir)  # we land at the next sequence

    store.commit_version = winner_races_then_commit
    try:
        ddir = store.publish(df, root)
    finally:
        store.commit_version = orig
    assert ddir == store.data_dir(root)
    assert spark.read.parquet(ddir).count() == 1


def test_publish_tolerates_out_of_protocol_staging_deletion(spark, tmp_path):
    """Defense-in-depth: if something OUTSIDE the protocol (e.g. a
    misplaced full sweep) deletes the staging before our commit, the
    pre-attempt recheck raises ValueError and publish serves the
    winner's identical version instead of raising (streaming commits
    stay strict — only publish carries the tolerance)."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id long, s string")

    orig = store.commit_version

    def full_sweep_then_commit(path, vdir, *a):
        store.commit_version = orig
        w = store.stage_version_dir(path)
        df.write.mode("overwrite").parquet(w)
        orig(path, w)
        store.sweep(path)  # FULL sweep (fold-start style) kills vdir
        assert not os.path.isdir(vdir)
        return orig(path, vdir)  # doomed: pre-attempt recheck raises

    store.commit_version = full_sweep_then_commit
    try:
        ddir = store.publish(df, root)
    finally:
        store.commit_version = orig
    assert ddir == store.data_dir(root)
    assert spark.read.parquet(ddir).count() == 1
    # strict path: with NO live version a vanished staging still raises
    with pytest.raises(ValueError):
        store.commit_version(
            str(tmp_path / "empty"), str(tmp_path / "empty" / "v-aaaa")
        )


def test_lose_seq_race_then_swept_never_commits_dangling_pointer(
    tmp_path, monkeypatch
):
    """The r13-advice interleaving: writer B loses the put-if-absent
    seq race, and before its retry the staging vanishes (an
    out-of-protocol sweep).  B must raise — never commit a pointer to
    the deleted dir (which would mask permanent data loss as a
    committed store) — and the winner's version must keep serving."""
    root = str(tmp_path / "t")
    v_live = _stage(root, "winner")
    store.commit_version(root, v_live)
    v_b = _stage(root, "loser")

    real_commit = fs.commit_file
    calls = []

    def lose_then_swept(src, dst):
        calls.append(dst)
        if len(calls) == 1:
            # simulate losing the seq race + the racer sweeping v_b
            fs.remove_tree(v_b)
            raise FileExistsError(dst)
        real_commit(src, dst)  # pragma: no cover - must not be reached

    monkeypatch.setattr(fs, "commit_file", lose_then_swept)
    with pytest.raises(ValueError):
        store.commit_version(root, v_b)
    monkeypatch.undo()
    # the winner still serves; no pointer references the deleted dir
    assert store.live_version(root) == os.path.basename(v_live)
    with open(os.path.join(store.data_dir(root), "part-0.parquet")) as fh:
        assert fh.read() == "winner"


def test_staging_swept_after_commit_retracts_the_pointer(
    tmp_path, monkeypatch
):
    """The post-commit recheck: if the staging vanishes in the exact
    window between a successful pointer commit and the recheck, the
    pointer is RETRACTED and ValueError raised — ready() must never
    report a store whose live pointer names a deleted dir."""
    root = str(tmp_path / "t")
    v_live = _stage(root, "winner")
    store.commit_version(root, v_live)
    v_b = _stage(root, "doomed")

    real_commit = fs.commit_file

    def commit_then_swept(src, dst):
        real_commit(src, dst)
        fs.remove_tree(v_b)  # the racer's sweep lands mid-window

    monkeypatch.setattr(fs, "commit_file", commit_then_swept)
    with pytest.raises(ValueError):
        store.commit_version(root, v_b)
    monkeypatch.undo()
    assert store.live_version(root) == os.path.basename(v_live)
    assert store.ready(root) and store.has_parquet(root)


def test_commit_retries_past_deleted_pointer_staging(tmp_path, monkeypatch):
    """An out-of-protocol full sweep deleting the `.stage-*` pointer
    staging between creation and commit surfaces as FileNotFoundError
    from commit_file; the retry loop must recreate and land (r13
    advice low #2: previously crashed the build)."""
    root = str(tmp_path / "t")
    v1 = _stage(root, "one")

    real_commit = fs.commit_file
    calls = []

    def flaky(src, dst):
        calls.append(dst)
        if len(calls) == 1:
            raise FileNotFoundError(src)
        real_commit(src, dst)

    monkeypatch.setattr(fs, "commit_file", flaky)
    name = store.commit_version(root, v1)
    assert store.live_version(root) == name
    assert len(calls) == 2


def test_has_parquet_recurses_into_partitioned_versions(tmp_path):
    """r13 advice low #3: a versioned store whose live version is
    hive-partitioned must report has_parquet=True by default (the
    flat listing saw only partition SUBDIRS and inverted the
    readiness signal)."""
    root = str(tmp_path / "t")
    vdir = store.stage_version_dir(root)
    _mkfile(os.path.join(vdir, "centroid_id=3", "part-0.parquet"))
    _mkfile(os.path.join(vdir, "_SUCCESS"), "")
    store.commit_version(root, vdir)
    assert store.has_parquet(root)
    assert not store.has_parquet(root, recursive=False)  # opt-out kept
    # flat stores keep the non-recursive default (roots hold siblings)
    flat = str(tmp_path / "flat")
    _mkfile(os.path.join(flat, "sub", "x.parquet"))
    assert not store.has_parquet(flat)


def test_stale_orphan_reclaimed_by_superseded_only_sweep(tmp_path):
    """A crashed _ensure_* build's staging has no fold-start full
    sweep to collect it; the post-commit superseded-only sweep
    reclaims never-pointed version dirs past the staleness grace and
    leaves fresh ones (a concurrent builder's in-flight staging)
    alone."""
    import time

    root = str(tmp_path / "t")
    stale = _stage(root, "crashed-long-ago")
    _backdate_tree(stale)  # whole tree idle past the grace (r15)
    fresh = _stage(root, "in-flight")
    v1 = _stage(root, "live")
    store.commit_version(root, v1)  # post-commit sweep: superseded-only
    assert not os.path.exists(stale)  # reclaimed past the grace
    assert os.path.exists(fresh)  # in-flight staging untouched
    assert store.live_version(root) == os.path.basename(v1)
