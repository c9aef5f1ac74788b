"""Scalar transform steps (reference SURVEY §2.6).

All native column expressions (whole-stage codegen) except base58,
which has no JVM builtin and uses an Arrow-vectorized pandas UDF.
Steps never mutate inputs: they return a new Batch dict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cherry_spark.functions.binary import (
    base58_encode_udf,
    decimal_to_u256_binary,
    hex_encode as hex_encode_col,
)
from cherry_spark.plans.config import (
    Base58EncodeConfig,
    Batch,
    CastByTypeConfig,
    CastConfig,
    HexEncodeConfig,
    SetChainIdConfig,
    U256ToBinaryConfig,
)


def cast(batch: Batch, cfg: CastConfig) -> Batch:
    """Cast named columns of one table (reference steps/cast.py:9-28).
    ``allow_cast_fail`` -> try_cast (null on failure), mirroring the
    reference's null-on-error semantics."""
    df = batch[cfg.table_name]
    for col_name, target in cfg.mappings.items():
        c = F.col(col_name)
        casted = c.try_cast(target) if cfg.allow_cast_fail else c.cast(target)
        df = df.withColumn(col_name, casted)
    out = dict(batch)
    out[cfg.table_name] = df
    return out


def _parse_type(type_str: str) -> T.DataType:
    # reuse Spark's DDL parser so "decimal(18,2)" etc. work
    return T._parse_datatype_string(type_str)


def cast_by_type(batch: Batch, cfg: CastByTypeConfig) -> Batch:
    """Cast every column whose type equals from_type, across tables
    (reference steps/cast_by_type.py:9-28)."""
    from_dt = _parse_type(cfg.from_type)
    out = dict(batch)
    for name, df in batch.items():
        if cfg.tables is not None and name not in cfg.tables:
            continue
        cols = []
        for field in df.schema.fields:
            if field.dataType == from_dt:
                c = F.col(field.name)
                casted = (
                    c.try_cast(cfg.to_type) if cfg.allow_cast_fail else c.cast(cfg.to_type)
                )
                cols.append(casted.alias(field.name))
            else:
                cols.append(F.col(field.name))
        out[name] = df.select(*cols)
    return out


def _map_binary_columns(df: DataFrame, fn) -> DataFrame:
    cols = [
        fn(F.col(f.name)).alias(f.name)
        if isinstance(f.dataType, T.BinaryType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


def hex_encode_step(batch: Batch, cfg: HexEncodeConfig) -> Batch:
    """Hex-encode every binary column of the listed tables (default all),
    binary->string schema change included (reference steps/hex_encode.py
    + steps/util.py:19-24)."""
    out = dict(batch)
    for name, df in batch.items():
        if cfg.tables is not None and name not in cfg.tables:
            continue
        out[name] = _map_binary_columns(df, lambda c: hex_encode_col(c, cfg.prefixed))
    return out


def base58_encode(batch: Batch, cfg: Base58EncodeConfig) -> Batch:
    """Base58-encode every binary column (reference steps/base58_encode.py)."""
    out = dict(batch)
    for name, df in batch.items():
        if cfg.tables is not None and name not in cfg.tables:
            continue
        out[name] = _map_binary_columns(df, base58_encode_udf)
    return out


def u256_to_binary(batch: Batch, cfg: U256ToBinaryConfig) -> Batch:
    """Convert decimal(38,0) amount columns to 32-byte big-endian binary
    (reference steps/u256_to_binary.py:11-31; our decimal ceiling is 38
    per the uint256 policy, SURVEY §1.3)."""
    out = dict(batch)
    for name, df in batch.items():
        if cfg.tables is not None and name not in cfg.tables:
            continue
        cols = []
        for f in df.schema.fields:
            is_target = (
                f.name in cfg.columns
                if cfg.columns is not None
                else f.dataType == T.DecimalType(38, 0)
            )
            if is_target:
                cols.append(decimal_to_u256_binary(F.col(f.name)).alias(f.name))
            else:
                cols.append(F.col(f.name))
        out[name] = df.select(*cols)
    return out


def set_chain_id(batch: Batch, cfg: SetChainIdConfig) -> Batch:
    """Drop any existing chain_id, append constant chain_id to EVERY table
    (reference steps/set_chain_id.py:7-23). uint64 in the reference;
    LongType here per the unsigned-widening policy (SURVEY §1.3)."""
    out = {}
    for name, df in batch.items():
        if "chain_id" in df.columns:
            df = df.drop("chain_id")
        out[name] = df.withColumn("chain_id", F.lit(cfg.chain_id).cast("long"))
    return out
