"""Escape-hatch steps: arbitrary SQL / user callbacks over the batch.

``sql_step`` replaces the reference's DataFusion step — every table in
the batch is registered as a temp view so user SQL sees the same
namespace (reference steps/datafusion_step.py:15-20). ``transform_step``
replaces the Polars step — the user callback's returned dict REPLACES
the batch, so tables can be added/dropped/renamed
(reference steps/polars_step.py:14-21).

Both stay lazy: the SQL/callback builds DataFrame DAGs; Catalyst sees
through the whole pipeline.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from cherry_spark.plans.config import Batch, SqlStepConfig, TransformStepConfig


def _session_of(batch: Batch) -> SparkSession:
    any_df = next(iter(batch.values()))
    return any_df.sparkSession


def sql_step(batch: Batch, cfg: SqlStepConfig) -> Batch:
    spark = _session_of(batch)
    for name, df in batch.items():
        df.createOrReplaceTempView(name)
    result = spark.sql(cfg.sql)
    if cfg.replace_batch:
        return {cfg.output_table: result}
    out = dict(batch)
    out[cfg.output_table] = result
    return out


def transform_step(batch: Batch, cfg: TransformStepConfig) -> Batch:
    result = cfg.runner(dict(batch), cfg.context)
    if not isinstance(result, dict):
        raise TypeError(
            f"transform step runner must return Dict[str, DataFrame], got {type(result)}"
        )
    return result
