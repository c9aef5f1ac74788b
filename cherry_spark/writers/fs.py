"""Filesystem seam for the store/bus commit protocol.

Every fingerprinted store (`_ensure_*` / `_overwrite_store` /
`_commit_append`) and the manifest bus commit state through a handful
of directory primitives.  On the local[32] sandbox those are POSIX
calls and `os.rename` is the correct atomic commit; on a 100 TB
cluster the state dirs live on an object store (S3/GCS), where rename
is neither atomic nor cheap — it is a copy+delete, and two writers
can interleave.  This module is the ONE place that knows which world
it is in: the store/bus layer calls these functions, never `os.*`
directly, so porting to an object store is a second implementation of
this module, not a sweep of the commit protocol.

Object-store contract (what a non-local implementation must provide):

- ``commit_file(src, dst)``: PUT-IF-ABSENT — publish ``src`` at
  ``dst``, raising ``FileExistsError`` if ``dst`` already exists, and
  never leaving a partially-visible ``dst``.  S3: conditional PUT
  (``If-None-Match: *``, supported since 2024); GCS: precondition
  ``ifGenerationMatch=0``.  This is the manifest bus's version-commit
  primitive — uniqueness of the committed name is what makes a
  single-writer violation loud instead of silently clobbering.
- ``move_file(src, dst)``: publish one fully-written object at a
  deterministic name, replacing any previous object there — an
  object store's unconditional single-object PUT (atomic per object;
  readers see the old bytes or the new bytes, never a mixture).
  This carries the keyed append commits (``_commit_append``, the
  bus's data-file moves): every committed file is immutable and
  deterministically named, so replacement-on-replay is the
  exactly-once mechanism, not rename atomicity.
- ``move_dir(src, dst)``: atomic only locally, and — since the r13
  store port — NOT part of any store/bus commit protocol.  The
  stores commit through immutable version dirs + put-if-absent
  pointers (writers/store.py), the bus through its manifest; both
  are proven under non-atomic-move semantics by the shim tests in
  tests/test_fs.py.  SCOPED EXEMPTION LIST (r13 verdict item #4 —
  pinned mechanically by tests/test_fs.py's call-site audit; adding
  a ``move_dir`` call anywhere else fails that test):

  1. ``writers/compact.py`` — ``compact_dataset``'s IN-PLACE swap
     lane only, which exists for plain LOCAL datasets whose readers
     address the directory path directly (no pointer to follow) and
     whose partition dirs must compact independently.  Every store
     the engine owns takes the versioned lane instead
     (``compact_state_dir`` defaults to it; a flat store converts on
     first compaction), and an already-versioned path auto-routes
     versioned — the in-place lane is reachable only by explicit
     user choice on a non-store dataset.
  2. ``streaming/continuous.py::_recover_store`` — one-time repair
     of PRE-r13 swap-protocol state (a canonical dir parked under
     ``__old`` by the retired two-rename swap).  Runs only when such
     legacy strays exist on disk; a store born under the pointer
     protocol never creates them.

  An object-store port may implement ``move_dir`` as
  ``NotImplementedError``: neither exempt lane is meaningful there
  (1 is local-by-contract, 2 repairs a protocol that never ran on an
  object store).
- ``list_dir(path)``: a flat listing (no recursion), empty for a
  missing dir — object stores list by prefix; callers never assume
  inode semantics.
- ``remove`` / ``remove_tree``: idempotent deletes for sweeps
  (missing targets are fine).

All local implementations below are deliberately thin wrappers — the
value is the seam, not the code.
"""

from __future__ import annotations

import os
import shutil


def commit_file(src: str, dst: str) -> None:
    """Publish ``src`` at ``dst`` with PUT-IF-ABSENT semantics: raises
    ``FileExistsError`` if ``dst`` exists (even as a leftover), and the
    committed file appears atomically.

    Locally: ``os.link`` (hard link) fails with EEXIST on an existing
    target — unlike ``os.rename``, which silently REPLACES it — then
    the staged source is unlinked.  The link is the commit point."""
    os.link(src, dst)
    os.unlink(src)


def move_file(src: str, dst: str) -> None:
    """Atomically move a staged file to its committed name, replacing
    any existing target (the deterministic-name append commit: a
    replayed fold REPLACES its own previous attempt)."""
    os.rename(src, dst)


def move_dir(src: str, dst: str) -> None:
    """Atomically move a staged directory to its committed name.
    ``dst`` must not exist (the swap protocol parks it first)."""
    os.rename(src, dst)


def copy_file(src: str, dst: str) -> None:
    """Duplicate one committed immutable file at a new name (the
    ``_merge_key`` sidecar riding a compaction rewrite into the staged
    version dir).  Object store: a server-side copy (S3 CopyObject /
    GCS rewrite) — both names address immutable bytes, so no atomicity
    beyond single-object PUT is needed."""
    shutil.copyfile(src, dst)


def list_dir(path: str) -> list[str]:
    """Flat listing of ``path``; empty list if it doesn't exist."""
    try:
        return os.listdir(path)
    except OSError:
        return []


def remove(path: str) -> None:
    """Delete one file; missing is fine (sweeps are idempotent)."""
    try:
        os.remove(path)
    except FileNotFoundError:
        pass


def remove_tree(path: str) -> None:
    """Delete a directory tree; missing is fine."""
    shutil.rmtree(path, ignore_errors=True)


def ensure_dir(path: str) -> None:
    os.makedirs(path, exist_ok=True)
