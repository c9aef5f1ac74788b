"""Filesystem seam (writers/fs.py — r11 verdict "what's missing" #4):
the store/bus commit protocol's directory primitives, isolated so an
object-store port is a second implementation of ONE module.  The
local semantics under test here are the contract the protocol relies
on: put-if-absent commits fail loudly on an existing target, moves
are atomic replaces, sweeps are idempotent."""

from __future__ import annotations

import os

import pytest

from cherry_spark.writers import fs


def test_commit_file_put_if_absent(tmp_path):
    src = str(tmp_path / "staged")
    dst = str(tmp_path / "committed")
    with open(src, "w") as fh:
        fh.write("v1")
    fs.commit_file(src, dst)
    assert not os.path.exists(src)  # staged source consumed
    with open(dst) as fh:
        assert fh.read() == "v1"

    # an existing target is NEVER replaced — the primitive raises
    src2 = str(tmp_path / "staged2")
    with open(src2, "w") as fh:
        fh.write("v2")
    with pytest.raises(FileExistsError):
        fs.commit_file(src2, dst)
    with open(dst) as fh:
        assert fh.read() == "v1"  # first committer won
    assert os.path.exists(src2)  # loser's staging intact for cleanup


def test_move_file_replaces_and_move_dir_commits(tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    for p, content in ((a, "old"), (b, "new")):
        with open(p, "w") as fh:
            fh.write(content)
    # deterministic-name append commit: a replayed fold REPLACES its
    # own previous attempt
    fs.move_file(b, a)
    with open(a) as fh:
        assert fh.read() == "new"

    d = str(tmp_path / "staged_dir")
    os.makedirs(d)
    open(os.path.join(d, "x.parquet"), "w").close()
    dst = str(tmp_path / "table")
    fs.move_dir(d, dst)
    assert os.path.isdir(dst) and not os.path.exists(d)


def test_sweep_primitives_are_idempotent(tmp_path):
    p = str(tmp_path / "gone")
    fs.remove(p)  # missing file: no error
    t = str(tmp_path / "tree")
    fs.remove_tree(t)  # missing tree: no error
    os.makedirs(os.path.join(t, "sub"))
    fs.remove_tree(t)
    assert not os.path.exists(t)


def test_list_dir_missing_is_empty(tmp_path):
    assert fs.list_dir(str(tmp_path / "nope")) == []
    open(str(tmp_path / "f"), "w").close()
    assert fs.list_dir(str(tmp_path)) == ["f"]


def test_bus_exactly_once_under_object_store_semantics(spark, tmp_path):
    """The 100 TB portability claim behind the seam (fs.py docstring):
    on an object store there is NO atomic rename — a move is
    copy-then-delete, observable half-done — and only the
    put-if-absent commit is atomic (S3 conditional PUT).  The manifest
    bus must stay correct under exactly those semantics, because data
    files only become visible when a manifest entry NAMES them: shim
    the seam's moves to non-atomic copy+delete and drive the full
    append / crash-replay / stream / compact cycle."""
    import os
    import shutil

    from cherry_spark.writers import fs, manifest_bus as mb

    moves = {"n": 0}
    orig_move_file, orig_move_dir = fs.move_file, fs.move_dir

    def slow_move_file(src, dst):
        moves["n"] += 1
        shutil.copyfile(src, dst)  # visible before the delete — no rename
        os.remove(src)

    def slow_move_dir(src, dst):
        moves["n"] += 1
        shutil.copytree(src, dst)
        shutil.rmtree(src)

    fs.move_file, fs.move_dir = slow_move_file, slow_move_dir
    try:
        bus = str(tmp_path / "bus")
        df = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
        ).coalesce(1)
        assert mb.bus_append(df, bus, "e1-b0") == 1

        # crash mid-append: files copied into data/, manifest never
        # committed — invisible to snapshot, replaced on replay
        orig_commit = mb._commit_entry
        mb._commit_entry = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("crash")
        )
        df2 = spark.createDataFrame(
            [(10 + i, f"doc {10 + i}") for i in range(6)],
            "doc_id long, text string",
        ).coalesce(1)
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="crash"):
            mb.bus_append(df2, bus, "e1-b1")
        mb._commit_entry = orig_commit
        assert mb.bus_snapshot(spark, bus).count() == 6  # orphan invisible
        assert mb.bus_append(df2, bus, "e1-b1") == 2  # replay replaces

        # stream, compact, stream: exactly-once across the rewrite
        from cherry_spark.sources.manifest_bus_datasource import (
            ManifestBusDataSource,
        )

        spark.dataSource.register(ManifestBusDataSource)
        got: list = []

        def drain():
            q = (
                spark.readStream.format("cherry_bus").option("path", bus)
                .load()
                .writeStream.foreachBatch(
                    lambda d, b: got.extend(
                        (r["doc_id"], r["text"]) for r in d.collect()
                    )
                )
                .option("checkpointLocation", str(tmp_path / "ck"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(240)

        drain()
        assert len(got) == 12
        mb.bus_compact(spark, bus, target_file_bytes=64 * 1024 * 1024)
        assert mb.bus_snapshot(spark, bus).count() == 12
        drain()
        assert len(got) == 12  # compaction re-delivered nothing
        assert moves["n"] >= 3  # the shim actually carried the commits
    finally:
        fs.move_file, fs.move_dir = orig_move_file, orig_move_dir
