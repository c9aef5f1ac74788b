"""The engine: step dispatch + pipeline execution.

Counterpart of the reference's run_pipeline/process_steps
(reference src/cherry_etl/pipeline.py:21-126) with one structural
difference: the reference executes each step eagerly on in-memory Arrow
per micro-batch, while here every step only *extends a lazy DataFrame
DAG* — a full pipeline is a single Catalyst plan, so filter/projection
pushdown, join reordering and whole-stage codegen span step boundaries.

merge_data is the reference's multi-batch union helper
(pipeline.py:80-99): assert identical table-name sets, union per table.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from cherry_spark.plans.config import Batch, Pipeline, Step, StepKind


def _dispatch(step: Step):
    from cherry_spark import operators as ops

    table = {
        StepKind.EVM_DECODE_EVENTS: ops.evm_decode_events,
        StepKind.SVM_DECODE_INSTRUCTIONS: ops.svm_decode_instructions,
        StepKind.SVM_DECODE_LOGS: ops.svm_decode_logs,
        StepKind.CAST: ops.cast,
        StepKind.CAST_BY_TYPE: ops.cast_by_type,
        StepKind.HEX_ENCODE: ops.hex_encode_step,
        StepKind.BASE58_ENCODE: ops.base58_encode,
        StepKind.U256_TO_BINARY: ops.u256_to_binary,
        StepKind.SET_CHAIN_ID: ops.set_chain_id,
        StepKind.JOIN_BLOCK_DATA: ops.join_block_data,
        StepKind.JOIN_EVM_TRANSACTION_DATA: ops.join_transaction_data,
        StepKind.JOIN_SVM_TRANSACTION_DATA: ops.join_transaction_data,
        StepKind.EVM_VALIDATE_BLOCK_DATA: ops.evm_validate_block_data,
        StepKind.GLACIERS_EVENTS: ops.glaciers_events,
        StepKind.SQL: ops.sql_step,
        StepKind.TRANSFORM: ops.transform_step,
    }
    if step.kind == StepKind.CUSTOM:
        return step.config  # a bare Batch -> Batch callable
    fn = table.get(step.kind)
    if fn is None:
        raise ValueError(f"Unknown step kind: {step.kind}")
    return lambda batch: fn(batch, step.config)


def process_steps(batch: Batch, steps: list[Step]) -> Batch:
    """Apply the step chain. Pure: input dict is never mutated
    (the reference deep-copies for the same guarantee, pipeline.py:36;
    DataFrames are immutable so a dict copy suffices)."""
    current = dict(batch)
    for step in steps:
        current = _dispatch(step)(current)
    return current


def merge_data(batches: list[Batch]) -> Batch:
    """Union a list of multi-table batches per table name
    (reference pipeline.py:80-99)."""
    if not batches:
        raise ValueError("merge_data: empty batch list")
    keys = set(batches[0])
    for b in batches[1:]:
        if set(b) != keys:
            raise ValueError(f"merge_data: mismatched table sets {set(b)} vs {keys}")
    return {
        k: reduce(DataFrame.unionByName, [b[k] for b in batches]) for k in keys
    }


def run_pipeline(
    spark: SparkSession, pipeline: Pipeline, name: str | None = None
) -> Iterator[Batch]:
    """Execute: for each source batch, apply steps, push to the writer.

    The source is either a single Batch (bounded run — the reference's
    ``to_block`` case) or an iterable/callable yielding Batches (the
    continuous-ingestion loop, reference pipeline.py:110-126; for true
    streaming use cherry_spark.streaming). Yields each processed batch
    after it is written, so callers can track progress/cursors.
    """
    source = pipeline.source
    if callable(source):
        source = source(spark)
    if isinstance(source, dict):
        source = [source]
    assert isinstance(source, Iterable)

    for raw_batch in source:
        if raw_batch is None:
            break  # end-of-stream sentinel, reference pipeline.py:112-113
        processed = process_steps(raw_batch, pipeline.steps)
        if pipeline.writer is not None:
            pipeline.writer.push_data(processed)
        yield processed
