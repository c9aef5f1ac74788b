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
