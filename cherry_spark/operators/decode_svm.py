"""SVM (Solana) instruction/log decoding — Borsh fixed layouts compiled
to native column expressions.

The reference delegates to a Rust kernel
(reference steps/svm_decode_instructions.py:9-37; signature model built
in examples/jup_swap.py:126-151). A Borsh payload is little-endian and
packed, so every fixed-width field has a static byte offset — decoded
with substring + hex byte-swap expressions (whole-stage codegen).
Variable-length fields (string, vec) fall back to an Arrow pandas UDF.

Account columns a0..a9 are renamed to the signature's accounts_names —
same contract as instruction_signature_to_arrow_schema.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from cherry_spark.plans.config import Batch, SvmDecodeInstructionsConfig

# ---- type model (mirrors the surface of the reference's DynType/FixedArray,
# examples/jup_swap.py:129-149, re-typed for Spark) ----


@dataclass(frozen=True)
class FixedArray:
    elem: str  # only "u8" supported natively -> BinaryType slice
    size: int


@dataclass
class ParamInput:
    name: str
    dtype: str | FixedArray  # "u8"|"u16"|"u32"|"u64"|"u128"|"i64"|"bool"|"pubkey"|"string"


@dataclass
class InstructionSignature:
    discriminator: bytes
    params: list[ParamInput] = field(default_factory=list)
    accounts_names: list[str] = field(default_factory=list)


_WIDTHS = {
    "u8": 1, "u16": 2, "u32": 4, "u64": 8, "u128": 16,
    "i8": 1, "i16": 2, "i32": 4, "i64": 8, "i128": 16,
    "bool": 1, "pubkey": 32,
}


def _width(dtype: str | FixedArray) -> int | None:
    if isinstance(dtype, FixedArray):
        return dtype.size if dtype.elem == "u8" else None
    return _WIDTHS.get(dtype)


def _spark_type(dtype: str | FixedArray) -> T.DataType:
    if isinstance(dtype, FixedArray):
        return T.BinaryType()
    if dtype == "pubkey":
        return T.BinaryType()
    if dtype == "bool":
        return T.BooleanType()
    if dtype == "string":
        return T.StringType()
    if dtype in ("u8", "u16", "u32", "i8", "i16", "i32", "i64"):
        return T.LongType()
    if dtype == "u64":
        return T.DecimalType(20, 0)
    if dtype in ("u128", "i128"):
        return T.DecimalType(38, 0)
    raise NotImplementedError(f"borsh type not supported: {dtype}")


def instruction_signature_to_schema(sig: InstructionSignature) -> T.StructType:
    fields = [T.StructField(p.name, _spark_type(p.dtype), True) for p in sig.params]
    fields.extend(T.StructField(n, T.BinaryType(), True) for n in sig.accounts_names)
    return T.StructType(fields)


def _le_hex(data: Column, start: int, nbytes: int) -> Column:
    """hex string of bytes [start, start+nbytes) reversed to big-endian.
    start is 0-based; built from per-byte substrings (still codegen)."""
    hx = F.lower(F.hex(data))
    parts = [
        F.substring(hx, 2 * (start + i) + 1, 2) for i in reversed(range(nbytes))
    ]
    return F.concat(*parts)


def _decode_fixed(data_col: Column, dtype: str | FixedArray, offset: int) -> Column:
    if isinstance(dtype, FixedArray) or dtype == "pubkey":
        nbytes = 32 if dtype == "pubkey" else dtype.size
        return F.substring(data_col, offset + 1, nbytes)
    if dtype == "bool":
        return F.conv(_le_hex(data_col, offset, 1), 16, 10).cast("int") != 0
    nbytes = _WIDTHS[dtype]
    be_hex = _le_hex(data_col, offset, nbytes)
    unsigned = dtype.startswith("u")
    bits = nbytes * 8
    if unsigned:
        if bits <= 32:
            return F.conv(be_hex, 16, 10).cast("long")
        if bits == 64:
            return F.conv(be_hex, 16, 10).cast(T.DecimalType(20, 0))
        # u128: split into hi/lo 64-bit limbs (fits decimal(38,0))
        hi = F.conv(F.substring(be_hex, 1, 16), 16, 10).cast(T.DecimalType(38, 0))
        lo = F.conv(F.substring(be_hex, 17, 16), 16, 10).cast(T.DecimalType(38, 0))
        return (hi * F.lit(__import__("decimal").Decimal(2**64)).cast(T.DecimalType(38, 0)) + lo).cast(T.DecimalType(38, 0))
    # signed two's complement
    as_dec = F.conv(be_hex, 16, 10).cast(T.DecimalType(38, 0))
    # Decimal literals: a bare int lit of 2^63 (i64's sign threshold)
    # overflows the py4j long transport — NumberFormatException at
    # plan build, the same >long-literal trap as functions/binary.py's
    # i256 path. Caught by the svm_decode_logs certified query.
    _d = __import__("decimal").Decimal
    wrapped = F.when(
        as_dec >= F.lit(_d(2 ** (bits - 1))).cast(T.DecimalType(38, 0)),
        as_dec - F.lit(_d(2**bits)).cast(T.DecimalType(38, 0)),
    ).otherwise(as_dec)
    return wrapped.cast("long") if bits <= 64 else wrapped.cast(T.DecimalType(38, 0))


def _decode_variable_udf(sig: InstructionSignature, target: str):
    """Fallback: full-python Borsh walk up to the target param (handles
    strings/vecs whose offsets are data-dependent)."""
    names = [p.name for p in sig.params]
    dtypes = [p.dtype for p in sig.params]
    disc_len = len(sig.discriminator)
    t_idx = names.index(target)
    out_type = _spark_type(dtypes[t_idx])

    @pandas_udf(out_type)
    def decode(data: pd.Series) -> pd.Series:
        def one(buf):
            if buf is None:
                return None
            try:
                b = bytes(buf)
                off = disc_len
                for i, dt in enumerate(dtypes[: t_idx + 1]):
                    if dt == "string":
                        ln = int.from_bytes(b[off : off + 4], "little")
                        val = b[off + 4 : off + 4 + ln].decode("utf-8", errors="replace")
                        off += 4 + ln
                    else:
                        w = _width(dt)
                        chunk = b[off : off + w]
                        if len(chunk) != w:
                            return None
                        if isinstance(dt, FixedArray) or dt == "pubkey":
                            val = chunk
                        elif dt == "bool":
                            val = chunk[0] != 0
                        else:
                            val = int.from_bytes(chunk, "little", signed=dt.startswith("i"))
                        off += w
                    if i == t_idx:
                        import decimal

                        if isinstance(out_type, T.DecimalType) and isinstance(val, int):
                            return decimal.Decimal(val)
                        return val
                return None
            except Exception:
                return None

        return data.map(one)

    return decode


def compile_instruction_columns(
    sig: InstructionSignature, data_col: str, allow_decode_fail: bool
) -> list[Column]:
    has_variable = any(p.dtype == "string" for p in sig.params)
    disc_len = len(sig.discriminator)
    fixed_len = disc_len + sum(_width(p.dtype) or 0 for p in sig.params)

    data = F.col(data_col)
    disc_hex = sig.discriminator.hex()
    valid = F.substring(F.lower(F.hex(data)), 1, 2 * disc_len) == F.lit(disc_hex)
    if not has_variable:
        valid = valid & (F.length(data) == F.lit(fixed_len))
    else:
        valid = valid & (F.length(data) >= F.lit(disc_len))

    out: list[Column] = []
    offset = disc_len
    for p in sig.params:
        if has_variable and (p.dtype == "string" or offset is None):
            raw = _decode_variable_udf(sig, p.name)(data)
            offset = None  # offsets unknown past a variable-length field
        else:
            raw = _decode_fixed(data, p.dtype, offset)
            offset += _width(p.dtype)
        if allow_decode_fail:
            out.append(F.when(valid, raw).otherwise(F.lit(None)).alias(p.name))
        else:
            out.append(
                F.when(valid, raw)
                .otherwise(F.raise_error(F.lit(f"svm decode failed for param {p.name}")))
                .alias(p.name)
            )
    return out


def svm_decode_instructions(batch: Batch, cfg: SvmDecodeInstructionsConfig) -> Batch:
    instructions = batch[cfg.input_table]
    sig: InstructionSignature = cfg.instruction_signature
    decoded_cols = compile_instruction_columns(sig, "data", cfg.allow_decode_fail)
    account_cols = [
        F.col(f"a{i}").alias(name) for i, name in enumerate(sig.accounts_names)
    ]
    if cfg.hstack:
        decoded = instructions.select(
            *decoded_cols, *account_cols, *[F.col(c) for c in instructions.columns]
        )
    else:
        decoded = instructions.select(*decoded_cols, *account_cols)
    out = dict(batch)
    out[cfg.output_table] = decoded
    return out


def svm_decode_logs(batch: Batch, cfg) -> Batch:
    """Log-message decode: same compiler with an empty-discriminator
    signature (the reference reuses the instruction schema compiler with
    a stub signature, steps/svm_decode_logs.py:28-33)."""
    return svm_decode_instructions(batch, cfg)
