"""Writer ABC + the anchor-table crash-resistance protocol.

The reference's exactly-once story (reference README.md:27, writers at
src/cherry_etl/writers/): write every non-anchor table first, write the
anchor table LAST; on restart the resume cursor is MAX(cursor_col) of
the anchor table, so partially-written non-anchor data past the cursor
is simply re-written by idempotent re-ingestion
(reference writers/clickhouse.py:183-186, delta_lake.py:51-54,
examples/erc20_custom.py:41-50).

Spark has no cross-table transaction either, so the same protocol is
the right answer here; ``anchor_last_order`` is shared by every sink.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame

Batch = dict[str, DataFrame]


class DataWriter(ABC):
    """push_data(batch) persists one multi-table micro-batch
    (reference writers/base.py:9-15)."""

    anchor_table: str | None = None

    @abstractmethod
    def push_data(self, batch: Batch) -> None: ...

    def anchor_last_order(self, batch: Batch) -> list[str]:
        """Table write order: non-anchor tables first, anchor last."""
        names = [n for n in batch if n != self.anchor_table]
        if self.anchor_table is not None and self.anchor_table in batch:
            names.append(self.anchor_table)
        return names
