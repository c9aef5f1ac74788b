"""Fixture-replay source: slice a keyed table into contiguous key-range
micro-batches — the stand-in for a live provider stream (the reference
pulls block ranges from HyperSync/SQD; a range of the cursor column is
the same contract, reference pipeline.py:111-120).

Each yielded batch is a Dict[str, DataFrame] where every member table
is filtered to the same cursor range — mirroring the provider returning
blocks + transactions + logs for one block window.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Batch = dict[str, DataFrame]


def range_batches(
    spark: SparkSession,
    tables: Batch,
    cursor_cols: dict[str, str],
    lo: int,
    hi: int,
    batch_size: int,
) -> Iterator[Batch]:
    """Yield batches covering [lo, hi] in ``batch_size`` cursor windows.

    ``cursor_cols`` maps table name -> its cursor column (e.g.
    {"blocks": "number", "logs": "block_number"}). Tables not in the map
    pass through whole (dimension tables).

    Filters are plain range predicates on the scan — at scale, with the
    dataset partitioned by cursor buckets, each batch prunes to its own
    partitions.
    """
    start = lo
    while start <= hi:
        end = min(start + batch_size - 1, hi)
        batch: Batch = {}
        for name, df in tables.items():
            col = cursor_cols.get(name)
            if col is None:
                batch[name] = df
            else:
                batch[name] = df.filter(
                    (F.col(col) >= F.lit(start)) & (F.col(col) <= F.lit(end))
                )
        yield batch
        start = end + 1
