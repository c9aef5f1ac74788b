"""Canned enrichment joins — the reference declares these StepKinds but
never wired them (reference src/cherry_etl/config.py:39-41 with no
dispatch arm in pipeline.py); in Spark they are one-liners so they are
first-class here.

Scale note: the blocks/transactions side of these joins is small
relative to the fact tables (one row per block vs many events per
block), so the default broadcasts it — no shuffle of the fact table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_spark.plans.config import Batch, JoinBlockDataConfig, JoinTransactionDataConfig


def join_block_data(batch: Batch, cfg: JoinBlockDataConfig) -> Batch:
    blocks = batch[cfg.blocks_table]
    # avoid column collisions: prefix non-key block columns
    renamed = blocks
    for c in blocks.columns:
        if c != cfg.blocks_key:
            renamed = renamed.withColumnRenamed(c, f"block_{c}" if not c.startswith("block_") else c)
    right = F.broadcast(renamed) if cfg.broadcast_blocks else renamed
    out = dict(batch)
    for name in cfg.tables:
        df = batch[name]
        joined = df.join(
            right, df[cfg.join_key] == renamed[cfg.blocks_key], cfg.how
        ).drop(renamed[cfg.blocks_key])
        out[name] = joined
    return out


def join_transaction_data(batch: Batch, cfg: JoinTransactionDataConfig) -> Batch:
    """Composite-key join to transactions on (block, tx index) — the
    reference's Polars example shape (examples/jup_swap.py:55)."""
    tx = batch[cfg.transactions_table]
    out = dict(batch)
    for name in cfg.tables:
        df = batch[name]
        overlapping = (set(df.columns) & set(tx.columns)) - set(cfg.on)
        tx_clean = tx
        for c in overlapping:
            tx_clean = tx_clean.withColumnRenamed(c, f"tx_{c}")
        out[name] = df.join(tx_clean, on=list(cfg.on), how=cfg.how)
    return out
