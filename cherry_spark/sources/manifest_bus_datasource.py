"""Custom Spark 4 Python DataSource over a manifest-log bus.

Streams the ``append`` versions of a ``writers/manifest_bus.py`` bus.
Offsets are MANIFEST VERSIONS, not file names — so compacting the bus
(``bus_compact``'s ``rewrite`` versions) is invisible to a running or
restarted stream: a rewrite version contributes zero rows, and the
files it retires were already consumed by version number.  This is
the piece a raw-parquet file-source bus cannot have (its checkpoint
tracks processed file NAMES; compaction re-delivers everything — the
documented caveat in examples/curate_index_pipeline.py).

Register + use:

    from cherry_spark.sources.manifest_bus_datasource import (
        ManifestBusDataSource,
    )
    spark.dataSource.register(ManifestBusDataSource)
    df = (spark.readStream.format("cherry_bus")
          .option("path", "/bus/dir").load())

The bus must hold at least one committed ``append`` version before a
stream starts (the schema comes from its first data file).  Offsets
resume from the checkpoint like any Structured Streaming source.

availableNow + crash replay: when a run restarts with a PENDING
planned batch (the previous run crashed mid-batch), Spark re-executes
that batch and the run terminates at its planned end offset —
versions appended after the crash are NOT picked up by that run.
Nothing is lost (the offsets log governs); the next availableNow run
delivers them.  Schedulers should loop runs until
``bus_consumer_version(ckpt) >= last_version(bus)`` — the drain loop
the repo's tests and probes use.

Scale note: one input partition per data file of each consumed
version — reads parallelize across executors; the driver tracks only
the integer version.  ``max_versions_per_batch`` (the Kafka
``maxOffsetsPerTrigger`` analogue) bounds how many manifest versions
one micro-batch may cover, so a consumer starting or restarting into
a deep backlog takes bounded bites instead of planning the whole
history as one batch; pass the consumer's own checkpoint path as the
``checkpoint`` option to make the FIRST batch of a run capped too
(the reader's rate-limit notes explain why that hint is the only
safe base the Python API allows).  Same DataSource pattern as
sources/replay_datasource.py (the provider replay stream).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


@dataclass
class _FilePartition(InputPartition):
    path: str


class ManifestBusStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        self.bus_dir = options.get("path")
        # "earliest" (default 0) replays every append version still on
        # disk; "latest" starts AFTER the current max version (new
        # consumers bootstrap state from bus_snapshot, then stream only
        # what arrives next — the pattern that survives compactions of
        # history they never needed); an integer starts after that
        # version.  Only consulted at the FIRST start — afterwards the
        # checkpoint's offset governs, like any streaming source.
        self.starting = options.get("starting_version", "earliest")
        # Rate limit (the Kafka maxOffsetsPerTrigger analogue): cap
        # each planned micro-batch at this many manifest VERSIONS, so
        # a consumer working through a backlog takes bounded bites
        # instead of one batch holding the entire history.  The cap
        # needs a safe BASE — latestOffset must never return less than
        # the engine's current planned offset, or the offset log would
        # step backwards and re-deliver rows.  The Python API gives
        # latestOffset no view of that offset (and the engine calls it
        # BEFORE initialOffset; partitions() runs on a different
        # worker instance — measured, not assumed), so the base is:
        #   1. the previous value THIS instance returned (monotone,
        #      the long-lived offset-runner instance), else
        #   2. the consumer's own checkpoint, when the caller passes
        #      its path as the ``checkpoint`` option: the max PLANNED
        #      offset in its offsets log (>= anything the engine will
        #      replay; bus_planned_version), else the starting_version
        #      when that log is empty (a genuinely fresh consumer —
        #      this is what makes a capped COLD START over deep
        #      history possible), else
        #   3. unknown: return the uncapped disk head (safe for any
        #      restart) and cap from the next call on.
        # Under availableNow (one end offset captured per run) a
        # capped run processes ONE bounded batch and terminates — the
        # documented drain loop absorbs the rest run by run.  The
        # ``checkpoint`` hint must be readable from the driver-side
        # python worker (local paths in this sandbox; on a cluster
        # pass it only if the checkpoint fs is mounted/readable).
        # ``source_index`` (r12 advice): in a MULTI-source query the
        # checkpoint's offsets file holds one line per source, and
        # another source's payload may also carry a "version" field —
        # the default last-wins scan would read the wrong base.  Pass
        # the cherry_bus source's 0-based position in the query plan
        # to select its offset line positionally (the
        # bus_consumer_version contract).
        mvpb = options.get("max_versions_per_batch")
        self.max_versions = int(mvpb) if mvpb is not None else None
        self.checkpoint_hint = options.get("checkpoint")
        src_idx = options.get("source_index")
        self.source_index = int(src_idx) if src_idx is not None else None
        self._last_ret: int | None = None
        self._schema = schema

    def _starting_version(self) -> int:
        if self.starting == "earliest":
            return 0
        if self.starting == "latest":
            from cherry_spark.writers.manifest_bus import last_version

            return last_version(self.bus_dir)
        return int(self.starting)

    def initialOffset(self) -> dict:
        return {"version": self._starting_version()}

    def latestOffset(self) -> dict:
        # one directory listing, no JSON reads — this runs per
        # micro-batch for the life of the stream
        from cherry_spark.writers.manifest_bus import last_version

        latest = last_version(self.bus_dir)
        if self.max_versions is None:
            return {"version": latest}
        base = self._last_ret
        if base is None and self.checkpoint_hint:
            from cherry_spark.writers.manifest_bus import bus_planned_version

            base = bus_planned_version(
                self.checkpoint_hint, source_index=self.source_index
            )
            if base is None:  # empty offsets log: genuinely fresh
                base = self._starting_version()
        if base is None:
            # no checkpoint hint: the only safe offset is the disk
            # head, which over a deep backlog plans the WHOLE history
            # as batch one — at scale that unbounded first batch is
            # exactly the one that dies (r12 verdict).  Loud, not
            # silent: tell the caller the two bounded recipes.
            start = self._starting_version()
            if latest - start > self.max_versions:
                import warnings

                warnings.warn(
                    f"cherry_bus at {self.bus_dir}: max_versions_per_batch="
                    f"{self.max_versions} is set but no 'checkpoint' "
                    f"option was given, and the backlog ({latest - start} "
                    "versions) exceeds the cap — the FIRST batch of this "
                    "run is unbounded (later batches are capped). Pass "
                    "the consumer's own checkpoint path as the "
                    "'checkpoint' option for a capped cold start, or "
                    "bootstrap with bus_snapshot + "
                    "starting_version=latest.",
                    RuntimeWarning,
                    stacklevel=2,
                )
        else:
            # never below the base (disk can sit below a 'latest'
            # start), never more than max_versions above it
            latest = max(base, min(latest, base + self.max_versions))
        self._last_ret = max(latest, self._last_ret or 0)
        return {"version": latest}

    def partitions(self, start: dict, end: dict):
        import os

        from cherry_spark.writers.manifest_bus import entries_between

        lo, hi = start["version"], end["version"]
        out = []
        # reads only the manifest JSONs in (lo, hi] — never the
        # whole history
        for e in entries_between(self.bus_dir, lo, hi):
            if e["kind"] == "append":
                for f in e["files"]:
                    out.append(
                        _FilePartition(
                            os.path.join(self.bus_dir, "data", f)
                        )
                    )
        # Spark requires at least one partition per micro-batch
        return out or [_FilePartition("")]

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint log

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        import os

        import pyarrow.parquet as pq

        if not os.path.exists(partition.path):
            raise RuntimeError(
                f"manifest-bus data file {partition.path} is gone: a "
                "compaction retired it while this consumer's checkpoint "
                "still needed its version. Compact with consumers "
                "drained or pass keep_after_version (bus_compact); new "
                "consumers bootstrap with bus_snapshot + "
                "starting_version=latest."
            )
        for batch in pq.read_table(partition.path).to_batches():
            for row in batch.to_pylist():
                yield tuple(row[f.name] for f in self._schema.fields)


class ManifestBusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cherry_bus"

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        from cherry_spark.writers.manifest_bus import live_files

        # any LIVE file carries the bus schema (the first appended file
        # may have been retired by a compaction and deleted)
        for f in live_files(self.options["path"]):
            return from_arrow_schema(pq.read_schema(f))
        raise ValueError(
            "manifest bus at "
            f"{self.options['path']} has no committed data — "
            "bus_append at least one batch before starting a stream"
        )

    def streamReader(self, schema) -> ManifestBusStreamReader:
        return ManifestBusStreamReader(schema, self.options)
