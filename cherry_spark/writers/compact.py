"""Small-files compaction for parquet datasets.

A continuously-ingesting pipeline (the reference's micro-batch loop,
our streaming gates) appends one file set per batch; after thousands
of batches a 100 TB dataset degrades into millions of KB-sized files
— scan planning, footer reads, and the driver's file index dominate
query time long before data volume does. The standard remedy is
periodic compaction: rewrite each partition's many small files into
few target-sized ones, atomically.

Design:

- sizing by BYTES, not row counts: files-per-partition =
  ceil(partition_bytes / target_file_bytes) from the actual file
  sizes on disk (cheap driver-side listing — the same listing the
  scan would do), then a hash repartition to exactly that many files
  per partition via ``repartition(col, ...)`` per-partition write;
- partitioned datasets compact partition-by-partition INDEPENDENTLY
  (each is a separate directory), so a crash mid-compaction leaves
  untouched partitions valid; unpartitioned datasets rewrite to a
  temp dir then atomically swap;
- the rewrite is a plain read->write of the same data: no schema or
  row changes, verified by row counts before the swap.

The reference delegates file layout to its sink engines
(writers/delta_lake.py OPTIMIZE-style maintenance lives outside it);
Spark-side datasets need it done here.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession

from cherry_spark.writers import fs as _fs


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _n_parquet_files(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_dataset(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    versioned: bool | None = None,
) -> dict:
    """Compact the parquet dataset at ``path`` (optionally
    hive-partitioned one level, ``key=value`` subdirs) so each
    partition holds ~``target_file_bytes`` files. Returns
    {files_before, files_after, bytes} stats.

    Two commit lanes:

    - **versioned** (``versioned=True``, or auto when ``path`` is
      already a pointer-versioned store — writers/store.py): the
      compacted table is written as a fresh immutable version dir and
      published with one put-if-absent pointer commit.  No rename is
      ever observed half-done, so this lane is object-store-safe end
      to end; the cost is that a partitioned table rewrites WHOLLY
      (every partition, compact or not) instead of per-dir.  This is
      the lane the streaming maintainers' state tables take
      (:func:`compact_state_dir` defaults to it) — a flat store is
      CONVERTED to the versioned layout by its first compaction, and
      subsequent keyed appends land inside the live version.
    - **in-place swap** (default for plain datasets): partition dirs
      compact independently via atomic local renames — the right
      trade on a local filesystem where readers address ``path``
      directly and untouched partitions must not be rewritten.
    """
    from cherry_spark.writers import store as _store

    if versioned is None:
        versioned = _store.live_version(path) is not None
    if versioned:
        return _compact_versioned(spark, path, target_file_bytes)
    part_dirs = [
        os.path.join(path, d)
        for d in sorted(os.listdir(path))
        if os.path.isdir(os.path.join(path, d)) and "=" in d
    ]
    targets = part_dirs if part_dirs else [path]
    files_before = _n_parquet_files(path)
    total_bytes = 0
    single: list[str] = []  # partition dirs compacting to ONE file
    serial: list[tuple[str, int]] = []  # (dir, n_files) for the rest
    for tdir in targets:
        nbytes = _dir_bytes(tdir)
        if nbytes == 0:
            continue
        total_bytes += nbytes
        n_files = max(1, math.ceil(nbytes / target_file_bytes))
        if n_files >= _n_parquet_files(tdir):
            continue  # already compact enough
        if part_dirs and n_files == 1:
            single.append(tdir)
        else:
            serial.append((tdir, n_files))

    # Batched lane (r10): the overwhelmingly common case — many small
    # partition dirs each compacting to one file — runs as ONE Spark
    # job for the rewrite and one aggregate for the verification,
    # instead of a (read + count + write + count) job quartet PER
    # PARTITION DIR (serial driver-side jobs; at a production
    # partition count that loop IS the compaction time — measured 16
    # dirs = 8.2 s vs one job at the IVF maintainer's fold-8 hook).
    # repartition(part_col) sends every row of a partition value to
    # one task, so the partitionBy write emits exactly one file per
    # dir; the SWAPS stay per-dir (old aside, new in), preserving the
    # crash contract — untouched partitions stay valid, the in-flight
    # dir is either pre-swap or torn-and-recoverable.
    if single:
        from pyspark.sql import functions as F

        pcol = os.path.basename(single[0]).split("=", 1)[0]
        df = spark.read.option("basePath", path).parquet(*single)
        orig = {
            r[pcol]: r["n"]
            for r in df.groupBy(pcol).agg(F.count(F.lit(1)).alias("n")).collect()
        }
        tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
        df.repartition(F.col(pcol)).write.partitionBy(pcol).mode(
            "overwrite"
        ).parquet(tmp)
        got = {
            r[pcol]: r["n"]
            for r in spark.read.parquet(tmp)
            .groupBy(pcol)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if got != orig:  # pragma: no cover - safety net
            shutil.rmtree(tmp, ignore_errors=True)
            raise RuntimeError(f"compaction row-count mismatch under {path}")
        for tdir in single:
            src = os.path.join(tmp, os.path.basename(tdir))
            if not os.path.isdir(src):  # pragma: no cover - safety net
                continue
            # a merge table's replay marker must survive this lane too
            # (mirrors the serial lane below): no current partitioned
            # table carries one, but losing it on a future one would
            # re-enable replay double-merges
            mk = os.path.join(tdir, "_merge_key")
            if os.path.exists(mk):
                shutil.copy(mk, os.path.join(src, "_merge_key"))
            old = f"{tdir}__old_{uuid.uuid4().hex[:8]}"
            _fs.move_dir(tdir, old)
            _fs.move_dir(src, tdir)
            _fs.remove_tree(old)
        shutil.rmtree(tmp, ignore_errors=True)

    for tdir, n_files in serial:
        df = spark.read.parquet(tdir)
        n_rows = df.count()
        tmp = f"{tdir}__compact_{uuid.uuid4().hex[:8]}"
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)
        # a merge table's replay marker (streaming/continuous.py
        # _merge_key sidecar) must survive the rewrite: losing it
        # would let an in-flight batch's replay double-merge
        mk = os.path.join(tdir, "_merge_key")
        if os.path.exists(mk):
            shutil.copy(mk, os.path.join(tmp, "_merge_key"))
        check = spark.read.parquet(tmp)
        if check.count() != n_rows:  # pragma: no cover - safety net
            shutil.rmtree(tmp, ignore_errors=True)
            raise RuntimeError(f"compaction row-count mismatch in {tdir}")
        # atomic-enough swap: move old aside, move new in, drop old
        old = f"{tdir}__old_{uuid.uuid4().hex[:8]}"
        _fs.move_dir(tdir, old)
        _fs.move_dir(tmp, tdir)
        _fs.remove_tree(old)
    return {
        "files_before": files_before,
        "files_after": _n_parquet_files(path),
        "bytes": total_bytes,
    }


def _compact_versioned(
    spark: SparkSession,
    path: str,
    target_file_bytes: int,
) -> dict:
    """The pointer-commit compaction lane: read the live data dir,
    rewrite at target file sizes into a staged version dir, verify
    row counts, copy the ``_merge_key`` replay marker, commit the
    pointer (writers/store.py — sweeps the superseded version).  A
    crash before the commit leaves an invisible orphan version; after
    it, the new version is fully live — no torn state at any point,
    under object-store semantics included."""
    from pyspark.sql import functions as F

    from cherry_spark.writers import store as _store

    # runs between folds (a protocol-safe point): clear any orphan
    # version a crashed earlier compaction staged, so the flat lane's
    # listing below never mixes layouts
    _store.sweep(path)
    ddir = _store.data_dir(path)
    files_before = _n_parquet_files(ddir)
    total_bytes = _dir_bytes(ddir)
    stats = {
        "files_before": files_before,
        "files_after": files_before,
        "bytes": total_bytes,
    }
    if total_bytes == 0:
        return stats
    part_dirs = [
        os.path.join(ddir, d)
        for d in sorted(_fs.list_dir(ddir))
        if os.path.isdir(os.path.join(ddir, d)) and "=" in d
    ]
    needed = sum(
        max(1, math.ceil(_dir_bytes(t) / target_file_bytes))
        for t in (part_dirs or [ddir])
        if _dir_bytes(t) > 0
    )
    if files_before <= needed:
        return stats
    vdir = _store.stage_version_dir(path)
    if part_dirs:
        pcol = os.path.basename(part_dirs[0]).split("=", 1)[0]
        df = spark.read.parquet(ddir)
        orig = {
            r[pcol]: r["n"]
            for r in df.groupBy(pcol).agg(F.count(F.lit(1)).alias("n")).collect()
        }
        # per-partition file sizing (the swap lane's byte heuristic,
        # kept through the whole-table rewrite): an oversized
        # partition value splits across ~n_v write tasks via a salt,
        # a small one stays a single file
        n_per_value = {
            os.path.basename(t).split("=", 1)[1]: max(
                1, math.ceil(_dir_bytes(t) / target_file_bytes)
            )
            for t in part_dirs
            if _dir_bytes(t) > 0
        }
        salt_expr = F.lit(0)
        if any(n > 1 for n in n_per_value.values()):
            split_map = F.create_map(
                *[
                    x
                    for v, n in n_per_value.items()
                    for x in (F.lit(v), F.lit(n))
                ]
            )
            salt_expr = F.pmod(
                F.abs(F.hash(*[F.col(c) for c in df.columns])),
                F.coalesce(
                    split_map[F.col(pcol).cast("string")], F.lit(1)
                ),
            )
        df.withColumn("__salt", salt_expr).repartition(
            F.col(pcol), F.col("__salt")
        ).drop("__salt").write.partitionBy(pcol).mode(
            "overwrite"
        ).parquet(vdir)
        got = {
            r[pcol]: r["n"]
            for r in spark.read.parquet(vdir)
            .groupBy(pcol)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        ok = got == orig
    else:
        df = spark.read.parquet(ddir)
        n_rows = df.count()
        df.repartition(needed).write.mode("overwrite").parquet(vdir)
        ok = spark.read.parquet(vdir).count() == n_rows
    if not ok:  # pragma: no cover - safety net
        _fs.remove_tree(vdir)
        raise RuntimeError(f"compaction row-count mismatch under {path}")
    # underscore sidecars ride the rewrite into the new version: the
    # ``_merge_key`` replay marker, the ivf probes table's
    # ``_centroids_v`` validity marker, any future sibling.  Spark
    # already wrote the new version's own _SUCCESS.
    for side in _fs.list_dir(ddir):
        full = os.path.join(ddir, side)
        if (
            side.startswith("_")
            and side != "_SUCCESS"
            and os.path.isfile(full)
        ):
            _fs.copy_file(full, os.path.join(vdir, side))
    _store.commit_version(path, vdir)
    stats["files_after"] = _n_parquet_files(_store.data_dir(path))
    return stats


def compact_state_dir(
    spark: SparkSession,
    state_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    versioned: bool = True,
) -> dict:
    """Compact a streaming maintainer's state tables (the append-only
    ones are what fragment: tf/dl/postings/sizes/pairs gain one file
    set PER FOLD, so a year of micro-batches is ~100k file sets per
    table; the overwrite tables — dfreq/stats — are single-write and
    skipped by the size heuristic). Each table dir under ``state_dir``
    (or the dir itself when it IS the table, e.g. the positional
    index) compacts independently via :func:`compact_dataset`, so the
    maintainer's serving contract is untouched — same rows, fewer
    files.

    Run BETWEEN folds: foreachBatch executes serially, so schedule
    this in the availableNow gap or while the stream is quiesced —
    the commit is not safe against a concurrent append to the same
    table.  ``versioned=True`` (default) commits each table through
    the pointer-version lane (object-store-safe; a flat table is
    converted by its first compaction); pass ``versioned=False`` only
    for local plain-dataset layouts whose readers address the dir
    directly.

    NEVER compact a table that a DOWNSTREAM stream consumes as a file
    source (the store-as-bus pattern, e.g. the curation gate's
    ``text/`` dir feeding index maintainers): compaction rewrites the
    data into NEW file names and a file-source checkpoint tracks
    processed file NAMES, so every already-consumed row would be
    re-delivered as fresh input downstream — violating the
    maintainers' unseen-ids contract. Compact only tables whose
    consumers are batch readers (serving queries, the maintainers'
    own folds); a bus that must survive rewrites needs a log —
    either the in-repo manifest-log bus (writers/manifest_bus.py,
    whose ``cherry_bus`` consumers track manifest versions and whose
    ``bus_compact`` is stream-safe) or a log-structured table format
    (Delta/Iceberg), not raw parquet.
    Returns {table: compact_dataset stats}.
    """
    from cherry_spark.writers import store as _store

    tables = [
        os.path.join(state_dir, d)
        for d in sorted(os.listdir(state_dir))
        if os.path.isdir(os.path.join(state_dir, d))
        # a version dir / pointer dir / hive partition dir is part of
        # its table, never a table of its own
        and not _store.is_version_name(d)
        and "=" not in d
        and any(
            f.endswith(".parquet")
            for _r, _d, fs in os.walk(os.path.join(state_dir, d))
            for f in fs
        )
    ]
    if not tables:
        tables = [state_dir]
    return {
        os.path.basename(t): compact_dataset(
            spark, t, target_file_bytes, versioned=versioned
        )
        for t in tables
    }
