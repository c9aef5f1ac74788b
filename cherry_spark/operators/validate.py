"""Block-data consistency validation.

The reference declares EVM_VALIDATE_BLOCK_DATA but never dispatches it
(reference src/cherry_etl/config.py:30,121-125, absent from
pipeline.py:41-75; the kernel lives in its Rust core). Implemented here
as distributed assertion queries:

- block numbers unique;
- parent-hash chain continuity (when hash/parent_hash columns exist):
  each block joins its predecessor by number equality (number = prev+1)
  — a plain shuffle equi-join, fully parallel, instead of a global
  single-partition lag window. Given unique numbers (the first check),
  this examines exactly the consecutive pairs the lag form examined;
  number gaps are not chain breaks, matching lag + prev_number filter.
- referential integrity: every logs/transactions row points at a block
  present in the batch.

A violation raises ``BlockValidationError`` with per-check counts —
mirroring the reference's validate-or-raise contract (README.md:21).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_spark.plans.config import Batch, EvmValidateBlockDataConfig


class BlockValidationError(ValueError):
    def __init__(self, violations: dict[str, int]):
        self.violations = violations
        super().__init__(f"block data validation failed: {violations}")


def evm_validate_block_data(batch: Batch, cfg: EvmValidateBlockDataConfig) -> Batch:
    violations: dict[str, int] = {}

    blocks = batch.get(cfg.blocks)
    if blocks is not None:
        dup = (
            blocks.groupBy("number").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)
        )
        n_dup = dup.count()
        if n_dup:
            violations["duplicate_block_numbers"] = n_dup

        if "hash" in blocks.columns and "parent_hash" in blocks.columns:
            cur = blocks.select("number", "parent_hash")
            prev = blocks.select(
                (F.col("number") + 1).alias("number"),
                F.col("hash").alias("prev_hash"),
            )
            chain = cur.join(prev, "number").filter(
                F.col("parent_hash") != F.col("prev_hash")
            )
            n_broken = chain.count()
            if n_broken:
                violations["broken_parent_hash_chain"] = n_broken

    for child_name, key in ((cfg.transactions, "block_number"), (cfg.logs, "block_number"), (cfg.traces, "block_number")):
        child = batch.get(child_name)
        if child is None or blocks is None or key not in child.columns:
            continue
        orphans = child.join(
            blocks.select(F.col("number").alias(key)), on=key, how="left_anti"
        )
        n_orphans = orphans.count()
        if n_orphans:
            violations[f"orphan_rows_{child_name}"] = n_orphans

    if violations:
        raise BlockValidationError(violations)
    return batch


def evm_validation_report(batch: Batch, cfg: EvmValidateBlockDataConfig):
    """Non-raising twin of :func:`evm_validate_block_data`: ONE lazy
    1-row DataFrame of violation counts (dup_block_numbers,
    broken_parent_chain, orphan_<child> per configured child). The
    monitoring shape for 100 TB streams — the raise-or-pass form above
    runs one eager count per check, the report folds every check into
    one job of 1-row aggregates cross-joined by broadcast (the
    repo-wide tiny-normalizer pattern)."""
    blocks = batch[cfg.blocks]
    dup = (
        blocks.groupBy("number")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("dup_block_numbers"))
    )
    report = dup
    if "hash" in blocks.columns and "parent_hash" in blocks.columns:
        cur = blocks.select("number", "parent_hash")
        prev = blocks.select(
            (F.col("number") + 1).alias("number"), F.col("hash").alias("prev_hash")
        )
        broken = (
            cur.join(prev, "number")
            .filter(F.col("parent_hash") != F.col("prev_hash"))
            .agg(F.count(F.lit(1)).cast("long").alias("broken_parent_chain"))
        )
        report = report.crossJoin(F.broadcast(broken))
    for child_name in (cfg.transactions, cfg.logs, cfg.traces):
        child = batch.get(child_name)
        if child is None or "block_number" not in child.columns:
            continue
        orphans = (
            child.join(
                blocks.select(F.col("number").alias("block_number")),
                on="block_number",
                how="left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias(f"orphan_{child_name}"))
        )
        report = report.crossJoin(F.broadcast(orphans))
    return report
