"""EVM event (ABI) decoding compiled to native column expressions.

The reference delegates this to a Rust kernel
(reference steps/evm_decode_events.py:19-22, schema from
evm_event_signature_to_arrow_schema at :26). Here the event signature
compiles to a Spark StructType + a set of column expressions:

- indexed params come from topic1..topic3 (one 32-byte word each);
- non-indexed *static* params are consecutive 32-byte words of `data`
  — pure substring/conv expressions, whole-stage codegen, no UDF;
- dynamic params (string/bytes) go through an Arrow-vectorized pandas
  UDF reading the ABI head/tail layout (the only non-native path).

Layout rules are the public Solidity ABI spec. Type policy per
SURVEY §1.3: address -> 20-byte binary, uint<=32 -> long,
uint64 -> decimal(20,0), uint128/256 -> decimal(38,0) (null when the
value exceeds 38 digits — the reference's own precedent is a lossy
downcast with allow_cast_fail, examples/erc20_custom.py:175-184).

``hstack=True`` appends every input column to the decoded output —
1-row-in/1-row-out with nulls on failure, so it is a plain select, not
a join (reference steps/evm_decode_events.py:29-31).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from cherry_spark.functions.binary import u256_binary_to_decimal38
from cherry_spark.plans.config import Batch, EvmDecodeEventsConfig, GlaciersEventsConfig

_PARAM_RE = re.compile(
    r"^\s*(?P<type>[a-z]+[0-9]*(?:\[\d*\])?)\s*(?P<indexed>indexed\s+)?(?P<name>\w+)?\s*$"
)


@dataclass
class EventParam:
    name: str
    abi_type: str
    indexed: bool


@dataclass
class EventSignature:
    name: str
    params: list[EventParam]

    @property
    def indexed_params(self) -> list[EventParam]:
        return [p for p in self.params if p.indexed]

    @property
    def data_params(self) -> list[EventParam]:
        return [p for p in self.params if not p.indexed]


def parse_event_signature(signature: str) -> EventSignature:
    name, _, rest = signature.partition("(")
    body = rest.rstrip(")").strip()
    params: list[EventParam] = []
    if body:
        for i, raw in enumerate(body.split(",")):
            m = _PARAM_RE.match(raw.strip())
            if not m:
                raise ValueError(f"cannot parse event param {raw!r}")
            params.append(
                EventParam(
                    name=m.group("name") or f"param{i}",
                    abi_type=m.group("type"),
                    indexed=bool(m.group("indexed")),
                )
            )
    return EventSignature(name=name.strip(), params=params)


_INT_RE = re.compile(r"^(u?)int(\d+)?$")


def _is_dynamic(abi_type: str) -> bool:
    return abi_type in ("string", "bytes") or abi_type.endswith("[]")


def abi_type_to_spark(abi_type: str) -> T.DataType:
    """ABI type -> Spark type under the SURVEY §1.3 widening policy."""
    if abi_type == "address":
        return T.BinaryType()
    if abi_type == "bool":
        return T.BooleanType()
    if abi_type == "string":
        return T.StringType()
    if abi_type == "bytes" or re.match(r"^bytes\d+$", abi_type):
        return T.BinaryType()
    m = _INT_RE.match(abi_type)
    if m:
        unsigned, bits_s = m.group(1) == "u", int(m.group(2) or 256)
        if bits_s <= 32:
            return T.LongType()
        if bits_s <= 63 or (bits_s == 64 and not unsigned):
            return T.LongType()
        if bits_s == 64:
            return T.DecimalType(20, 0)
        return T.DecimalType(38, 0)
    raise NotImplementedError(f"ABI type not supported: {abi_type}")


def event_signature_to_schema(signature: str, hstack_schema: T.StructType | None = None) -> T.StructType:
    """Signature -> output StructType (decoded params first, then the
    hstacked input columns) — the analog of the reference's
    evm_event_signature_to_arrow_schema."""
    sig = parse_event_signature(signature)
    fields = [T.StructField(p.name, abi_type_to_spark(p.abi_type), True) for p in sig.params]
    if hstack_schema is not None:
        fields.extend(hstack_schema.fields)
    return T.StructType(fields)


def _word_to_column(word: Column, abi_type: str) -> Column:
    """Decode one 32-byte word into its Spark value (static types only)."""
    hx = F.lower(F.hex(word))  # 64 hex chars
    if abi_type == "address":
        return F.substring(word, 13, 20)
    if abi_type == "bool":
        return (F.conv(F.substring(hx, 63, 2), 16, 10).cast("int") != 0)
    m = re.match(r"^bytes(\d+)$", abi_type)
    if m:
        return F.substring(word, 1, int(m.group(1)))
    m = _INT_RE.match(abi_type)
    if m:
        unsigned, bits = m.group(1) == "u", int(m.group(2) or 256)
        if unsigned:
            if bits <= 32:
                return F.conv(F.substring(hx, 65 - bits // 4, bits // 4), 16, 10).cast("long")
            if bits <= 63:
                return F.conv(F.substring(hx, 65 - 16, 16), 16, 10).cast("long")
            if bits == 64:
                return F.conv(F.substring(hx, 49, 16), 16, 10).cast(T.DecimalType(20, 0))
            return u256_binary_to_decimal38(word)
        # signed: two's complement on the last 64-bit limb (bits<=64)
        if bits <= 64:
            as_dec = F.conv(F.substring(hx, 49, 16), 16, 10).cast(T.DecimalType(20, 0))
            wrapped = F.when(
                as_dec >= F.lit(2 ** (bits - 1)).cast(T.DecimalType(20, 0)),
                as_dec - F.lit(2**bits).cast(T.DecimalType(20, 0)),
            ).otherwise(as_dec)
            return wrapped.cast("long")
        return u256_binary_to_decimal38(word)  # int128/256: positive range only
    raise NotImplementedError(f"static decode not supported for {abi_type}")


def _dynamic_param_udf(abi_type: str, param_index: int):
    """Arrow-vectorized decoder for one dynamic param in the data section.

    param_index is the position among *non-indexed* params (head slot)."""
    want_str = abi_type == "string"

    @pandas_udf(T.StringType() if want_str else T.BinaryType())
    def decode(data: pd.Series) -> pd.Series:
        def one(buf):
            if buf is None:
                return None
            try:
                b = bytes(buf)
                head_off = 32 * param_index
                offset = int.from_bytes(b[head_off : head_off + 32], "big")
                length = int.from_bytes(b[offset : offset + 32], "big")
                payload = b[offset + 32 : offset + 32 + length]
                if len(payload) != length:
                    return None
                return payload.decode("utf-8", errors="replace") if want_str else payload
            except Exception:
                return None

        return data.map(one)

    return decode


def compile_decode_columns(
    sig: EventSignature,
    topic_cols: list[str],
    data_col: str,
    allow_decode_fail: bool,
) -> list[Column]:
    """Build one output Column per event param."""
    n_static_words = sum(1 for p in sig.data_params)  # head words (incl. offsets)
    has_dynamic = any(_is_dynamic(p.abi_type) for p in sig.data_params)

    # validity: enough topics present; data section holds all head words
    valid = F.lit(True)
    for i, _ in enumerate(sig.indexed_params):
        valid = valid & F.col(topic_cols[i + 1]).isNotNull()
    if n_static_words:
        valid = valid & (F.length(F.col(data_col)) >= F.lit(32 * n_static_words))
    if not has_dynamic:
        valid = valid & (
            F.length(F.coalesce(F.col(data_col), F.lit(b"")))
            == F.lit(32 * n_static_words)
        )

    out: list[Column] = []
    topic_i = 1
    data_i = 0
    for p in sig.params:
        if p.indexed:
            word = F.col(topic_cols[topic_i])
            topic_i += 1
            if _is_dynamic(p.abi_type):
                # indexed dynamic params are keccak hashes: keep the word
                raw = word
            else:
                raw = _word_to_column(word, p.abi_type)
        else:
            if _is_dynamic(p.abi_type):
                raw = _dynamic_param_udf(p.abi_type, data_i)(F.col(data_col))
            else:
                word = F.substring(F.col(data_col), 1 + 32 * data_i, 32)
                raw = _word_to_column(word, p.abi_type)
            data_i += 1
        if allow_decode_fail:
            col = F.when(valid, raw).otherwise(F.lit(None))
        else:
            col = F.when(valid, raw).otherwise(
                F.raise_error(F.lit(f"evm_decode_events: undecodable row for param {p.name}"))
            )
        out.append(col.alias(p.name))
    return out


def evm_decode_events(batch: Batch, cfg: EvmDecodeEventsConfig) -> Batch:
    logs = batch[cfg.input_table]
    sig = parse_event_signature(cfg.event_signature)
    topic_cols = ["topic0", "topic1", "topic2", "topic3"]
    decoded_cols = compile_decode_columns(sig, topic_cols, "data", cfg.allow_decode_fail)
    if cfg.hstack:
        decoded = logs.select(*decoded_cols, *[F.col(c) for c in logs.columns])
    else:
        decoded = logs.select(*decoded_cols)
    out = dict(batch)
    out[cfg.output_table] = decoded
    return out


def glaciers_events(batch: Batch, cfg: GlaciersEventsConfig) -> Batch:
    """Bulk multi-contract decode: broadcast-join logs to an ABI lookup
    table on (address, topic0), then decode each signature's slice and
    union the results (reference GLACIERS_EVENTS, config.py:137-142 —
    declared, unwired).

    The ABI db is a small dim (address: binary, topic0: binary,
    event_signature: string) — collected driver-side to enumerate the
    distinct signatures; each slice decodes natively.
    """
    logs = batch[cfg.input_table]
    abi_db = batch[cfg.abi_db_table]
    sig_rows = abi_db.select("event_signature").distinct().collect()
    slices: list[DataFrame] = []
    for row in sig_rows:
        signature = row["event_signature"]
        keys = abi_db.filter(F.col("event_signature") == signature).select(
            "address", "topic0"
        )
        matched = logs.join(F.broadcast(keys), on=["address", "topic0"], how="left_semi")
        sub_batch = {cfg.input_table: matched}
        sub_cfg = EvmDecodeEventsConfig(
            event_signature=signature,
            input_table=cfg.input_table,
            output_table="out",
            allow_decode_fail=True,
            hstack=True,
        )
        decoded = evm_decode_events(sub_batch, sub_cfg)["out"]
        slices.append(decoded.withColumn("event_signature", F.lit(signature)))
    if not slices:
        raise ValueError("glaciers_events: empty ABI db")
    result = slices[0]
    for s in slices[1:]:
        result = result.unionByName(s, allowMissingColumns=True)
    out = dict(batch)
    out[cfg.output_table] = result
    return out
