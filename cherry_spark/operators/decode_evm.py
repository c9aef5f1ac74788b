"""EVM event (ABI) decoding compiled to native column expressions.

The reference delegates this to a Rust kernel
(reference steps/evm_decode_events.py:19-22, schema from
evm_event_signature_to_arrow_schema at :26). Here the event signature
compiles to a Spark StructType + a set of column expressions covering
the FULL public Solidity ABI head/tail layout — no UDF anywhere:

- indexed params come from topic1..topic3 (one 32-byte word each;
  indexed dynamic/composite params are keccak hashes, kept as the raw
  32-byte word per the ABI spec);
- static params are consecutive 32-byte words of `data` — pure
  substring/conv expressions, whole-stage codegen; static tuples and
  fixed arrays inline recursively (head_words);
- dynamic params (string/bytes/T[]/dynamic tuples, arbitrarily
  nested) follow their head offsets with dynamic-position
  ``Column.substr`` + ``transform(sequence(...))`` — still native
  expressions, still codegen; malformed offsets/lengths null out.

Type policy per SURVEY §1.3: address -> 20-byte binary, int/uint<=63
bits -> long, uint64 -> decimal(20,0), wider ints -> decimal(38,0)
(null when |v| >= 2^126 — the reference's own precedent is a lossy
downcast with allow_cast_fail, examples/erc20_custom.py:175-184);
signed ints two's-complement-wrap at every width (functions/binary.py:
i256_binary_to_decimal38 for >64-bit). Tuples surface as structs with
fields f0..fn (canonical ABI tuples are positional).

``hstack=True`` appends every input column to the decoded output —
1-row-in/1-row-out with nulls on failure, so it is a plain select, not
a join (reference steps/evm_decode_events.py:29-31).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cherry_spark.functions.abi_types import (
    head_words,
    is_dynamic,
    parse_type,
    split_top_level,
    type_structure,
)
from cherry_spark.functions.binary import (
    i256_binary_to_decimal38,
    u256_binary_to_decimal38,
)
from cherry_spark.plans.config import Batch, EvmDecodeEventsConfig, GlaciersEventsConfig


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
    body = rest.strip()
    if body.endswith(")"):
        body = body[:-1]
    params: list[EventParam] = []
    for i, raw in enumerate(split_top_level(body)):
        abi_type, remainder = parse_type(raw)
        tokens = remainder.split()
        indexed = bool(tokens) and tokens[0] == "indexed"
        if indexed:
            tokens = tokens[1:]
        params.append(
            EventParam(
                name=tokens[0] if tokens else f"param{i}",
                abi_type=abi_type,
                indexed=indexed,
            )
        )
    return EventSignature(name=name.strip(), params=params)


_INT_RE = re.compile(r"^(u?)int(\d+)?$")

_is_dynamic = is_dynamic  # retained name for callers/tests


def abi_type_to_spark(abi_type: str) -> T.DataType:
    """ABI type -> Spark type under the SURVEY §1.3 widening policy
    (recursive for arrays and tuples)."""
    kind, inner, _size = type_structure(abi_type)
    if kind == "array":
        return T.ArrayType(abi_type_to_spark(inner), True)
    if kind == "tuple":
        return T.StructType(
            [T.StructField(f"f{i}", abi_type_to_spark(m), True) for i, m in enumerate(inner)]
        )
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
    fields = []
    for p in sig.params:
        if p.indexed and (is_dynamic(p.abi_type) or type_structure(p.abi_type)[0] != "base"):
            # indexed dynamic/composite values are keccak hashes on-chain
            fields.append(T.StructField(p.name, T.BinaryType(), True))
        else:
            fields.append(T.StructField(p.name, abi_type_to_spark(p.abi_type), True))
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
                # try_cast: malformed low limb >= 2^63 nulls, not throws
                return F.conv(F.substring(hx, 65 - 16, 16), 16, 10).try_cast("long")
            if bits == 64:
                return F.conv(F.substring(hx, 49, 16), 16, 10).cast(T.DecimalType(20, 0))
            return u256_binary_to_decimal38(word)
        # signed: the encoding is sign-extended over the whole word, so
        # the low 64-bit limb read as an int64 IS the value for any
        # intN<=64 (wrapping by 2^bits on a 64-bit read mis-decodes
        # negatives of intN<64 — fixed r3). Result always fits long;
        # try_cast is defense-in-depth against ANSI throws.
        if bits <= 64:
            from decimal import Decimal as _D

            # 2^63 / 2^64 exceed Java long: must ship as Decimal literals
            as_dec = F.conv(F.substring(hx, 49, 16), 16, 10).cast(T.DecimalType(20, 0))
            wrapped = F.when(
                as_dec >= F.lit(_D(2**63)).cast(T.DecimalType(20, 0)),
                as_dec - F.lit(_D(2**64)).cast(T.DecimalType(21, 0)),
            ).otherwise(as_dec)
            return wrapped.try_cast("long")
        # signed int65..256: limb-wise two's complement (sign-extended word)
        return i256_binary_to_decimal38(word)
    raise NotImplementedError(f"static decode not supported for {abi_type}")


_LONG = "long"


def _safe_pos(data: Column, pos: Column) -> Column:
    """``substr`` compiles to int positions: clamp a 63-bit position to
    just past the data so garbage offset words extract nothing instead
    of throwing CAST_OVERFLOW under ANSI (the allow_decode_fail
    contract). Validity guards keep comparing the UNclamped value."""
    return F.least(pos, (F.length(data) + F.lit(1)).cast(_LONG))


def _safe_len(data: Column, n: Column) -> Column:
    """Clamp an extraction length the same way (see _safe_pos)."""
    return F.least(n, F.length(data).cast(_LONG))


def _word_at(data: Column, pos: Column) -> Column:
    """32-byte word at 1-based dynamic byte position ``pos``."""
    return data.substr(_safe_pos(data, pos.cast(_LONG)), F.lit(32).cast(_LONG))


def _u63_word(word: Column) -> Column:
    """Offset/length word -> long (low 8 bytes). Garbage >= 2^63
    try_casts to NULL, which propagates through position arithmetic and
    the bounds guards so malformed rows null out instead of throwing
    under ANSI mode."""
    return F.conv(F.substring(F.hex(word), 49, 16), 16, 10).try_cast(_LONG)


class _Prelude:
    """Layered helper projections for per-row dynamic positions.

    Tail offsets / lengths / element-chunk arrays are referenced many
    times by the final decode expressions (and by lambda bodies, where
    any embedded subtree is re-evaluated PER ELEMENT in interpreted
    mode). Registering them as aliased columns in intermediate selects
    makes each one evaluate exactly once per row: CollapseProject keeps
    multi-referenced non-cheap aliases as separate projections (checked
    empirically on 4.1 — measured 3-10x on dynamic params at sf0.1).
    An entry at layer L may reference entries of layers < L.
    """

    def __init__(self):
        self.layers: list[dict[str, Column]] = []
        self._n = 0

    def add(self, layer: int, col: Column) -> Column:
        while len(self.layers) <= layer:
            self.layers.append({})
        name = f"__cherry_pre{self._n}"
        self._n += 1
        self.layers[layer][name] = col
        return F.col(name)

    def apply(self, df: DataFrame) -> DataFrame:
        for layer in self.layers:
            if layer:
                df = df.select("*", *[c.alias(n) for n, c in layer.items()])
        return df


def _hex_value(region: Column, off: Column, abi_type: str) -> Column:
    """Decode one STATIC ABI value from lowercase hex text at 0-based
    char offset ``off``. Used for array elements: the region is a bound
    prelude column (hex of the whole element area, computed once per
    row), so per-element interpreted eval only substrings an in-hand
    string — no re-hexing, no unhex round trips. Mirrors the
    word/limb logic of functions/binary.py on the hex form.
    """
    from decimal import Decimal as _D

    kind, inner, size = type_structure(abi_type)
    if kind == "tuple":
        members, cum = [], 0
        for i, mt in enumerate(inner):
            members.append(
                _hex_value(region, (off + F.lit(64 * cum)).cast(_LONG), mt).alias(f"f{i}")
            )
            cum += head_words(mt)
        return F.struct(*members)
    if kind == "array":
        hw = head_words(inner)
        return F.array(
            *[
                _hex_value(region, (off + F.lit(64 * hw * i)).cast(_LONG), inner)
                for i in range(size)
            ]
        )

    def sub(s: int, length: int) -> Column:
        return region.substr((off + F.lit(s + 1)).cast(_LONG), F.lit(length).cast(_LONG))

    if abi_type == "address":
        return F.unhex(sub(24, 40))
    if abi_type == "bool":
        return F.conv(sub(62, 2), 16, 10).cast("int") != 0
    m = re.match(r"^bytes(\d+)$", abi_type)
    if m:
        return F.unhex(sub(0, 2 * int(m.group(1))))
    m = _INT_RE.match(abi_type)
    if not m:
        raise NotImplementedError(f"hex element decode not supported for {abi_type}")
    unsigned, bits = m.group(1) == "u", int(m.group(2) or 256)
    d38 = T.DecimalType(38, 0)
    if unsigned:
        if bits <= 32:
            return F.conv(sub(64 - bits // 4, bits // 4), 16, 10).cast(_LONG)
        if bits <= 63:
            # malformed payloads can put >= 2^63 in the low limb; under
            # ANSI a plain cast throws mid-job — null out instead
            # (allow_decode_fail contract, same as _u63_word)
            return F.conv(sub(48, 16), 16, 10).try_cast(_LONG)
        if bits == 64:
            return F.conv(sub(48, 16), 16, 10).cast(T.DecimalType(20, 0))
        hi = F.conv(sub(32, 16), 16, 10).cast(d38)
        lo = F.conv(sub(48, 16), 16, 10).cast(d38)
        two64 = F.lit(_D(2**64)).cast(d38)
        fits = (sub(0, 32) == F.lit("0" * 32)) & (hi < F.lit(2**62))
        return F.when(fits, (hi * two64 + lo).cast(d38))
    if bits <= 64:
        # sign-extended encoding: low 64-bit limb as int64 IS the value
        # for any intN<=64 (see _word_to_column); always fits long
        as_dec = F.conv(sub(48, 16), 16, 10).cast(T.DecimalType(20, 0))
        wrapped = F.when(
            as_dec >= F.lit(_D(2**63)).cast(T.DecimalType(20, 0)),
            as_dec - F.lit(_D(2**64)).cast(T.DecimalType(21, 0)),
        ).otherwise(as_dec)
        return wrapped.try_cast(_LONG)
    # signed >64-bit: limb two's complement (see i256_binary_to_decimal38)
    hi = F.conv(sub(32, 16), 16, 10).cast(d38)
    lo = F.conv(sub(48, 16), 16, 10).cast(d38)
    two64 = F.lit(_D(2**64)).cast(d38)
    max64 = F.lit(_D(2**64 - 1)).cast(d38)
    pos_fits = (sub(0, 32) == F.lit("0" * 32)) & (hi < F.lit(2**62))
    a = F.when(lo > 0, max64 - hi).otherwise(two64 - hi)
    b = F.when(lo > 0, two64 - lo).otherwise(F.lit(_D(0)).cast(d38))
    neg_fits = (sub(0, 32) == F.lit("f" * 32)) & (a < F.lit(2**62))
    neg_val = (F.lit(_D(0)).cast(d38) - (a * two64 + b)).cast(d38)
    return (
        F.when(pos_fits, (hi * two64 + lo).cast(d38))
        .when(neg_fits, neg_val)
        .otherwise(F.lit(None).cast(d38))
    )


def _decode_at(
    data: Column,
    base: Column,
    head: Column,
    abi_type: str,
    pre: _Prelude | None = None,
    layer: int = 0,
) -> Column:
    """Decode one ABI value. ``base`` is the 1-based byte position of the
    enclosing dynamic context (offsets are relative to it); ``head`` is
    the 1-based position of this value's head word(s). Recursive over
    the public ABI head/tail grammar; every path is a native expression.
    With ``pre`` set, dynamic positions become prelude columns evaluated
    once per row; pass ``pre=None`` inside lambda bodies (per-element
    contexts can't project columns).
    """

    def _bind(col: Column, lyr: int) -> Column:
        return pre.add(lyr, col) if pre is not None else col

    kind, inner, size = type_structure(abi_type)
    if kind == "base":
        if abi_type in ("string", "bytes"):
            tail = _bind((base + _u63_word(_word_at(data, head))).cast(_LONG), layer)
            n = _bind(_u63_word(_word_at(data, tail)), layer + 1)
            payload = data.substr(
                _safe_pos(data, (tail + 32).cast(_LONG)), _safe_len(data, n)
            )
            ok = (F.length(data) >= tail + 31) & (F.length(payload) == n)
            val = payload.cast("string") if abi_type == "string" else payload
            return F.when(ok, val)
        return _word_to_column(_word_at(data, head), abi_type)
    if kind == "tuple":
        if is_dynamic(abi_type):
            tail = _bind((base + _u63_word(_word_at(data, head))).cast(_LONG), layer)
            mbase, mhead0, mlayer = tail, tail, layer + 1
        else:
            mbase, mhead0, mlayer = base, head, layer
        members = []
        cum = 0
        for i, mt in enumerate(inner):
            mhead = (mhead0 + F.lit(32 * cum).cast(_LONG)).cast(_LONG)
            members.append(
                _decode_at(data, mbase, mhead, mt, pre, mlayer).alias(f"f{i}")
            )
            cum += head_words(mt)
        return F.struct(*members)
    # arrays
    if size is not None and not is_dynamic(abi_type):
        hw = head_words(inner)
        return F.array(
            *[
                _decode_at(
                    data,
                    base,
                    (head + F.lit(32 * hw * i).cast(_LONG)).cast(_LONG),
                    inner,
                    pre,
                    layer,
                )
                for i in range(size)
            ]
        )
    if size is not None:
        # fixed-size array of dynamic elements: one offset to a block of
        # k element offsets relative to the block start
        tail = _bind((base + _u63_word(_word_at(data, head))).cast(_LONG), layer)
        return F.array(
            *[
                _decode_at(
                    data,
                    tail,
                    (tail + F.lit(32 * i).cast(_LONG)).cast(_LONG),
                    inner,
                    pre,
                    layer + 1,
                )
                for i in range(size)
            ]
        )
    # dynamically-sized array: offset -> length word -> elements
    tail = _bind((base + _u63_word(_word_at(data, head))).cast(_LONG), layer)
    n = _bind(_u63_word(_word_at(data, tail)), layer + 1)
    elem_base = (tail + 32).cast(_LONG)
    empty = F.array().cast(abi_type_to_spark(abi_type))
    if not is_dynamic(inner):
        # static elements: hex the whole element region ONCE into a
        # bound prelude column; per-element decode only substrings that
        # in-hand string — nothing from `data` re-evaluates per element
        hw = head_words(inner)
        stride = 32 * hw
        region = _bind(
            F.lower(
                F.hex(
                    data.substr(
                        _safe_pos(data, elem_base),
                        _safe_len(data, F.try_multiply(F.lit(stride).cast(_LONG), n)),
                    )
                )
            ),
            layer + 2,
        )
        ok = F.length(data) >= tail + 31 + F.try_multiply(F.lit(stride).cast(_LONG), n)
        arr = F.transform(
            F.sequence(F.lit(0).cast(_LONG), (n - 1).cast(_LONG)),
            lambda i: _hex_value(region, (i * F.lit(2 * stride)).cast(_LONG), inner),
        )
        return F.when(ok & (n > 0), arr).when(ok & (n == 0), empty)
    # dynamic elements (string[], tuple-with-dynamic[]): per-element
    # offset math must stay in the lambda (pre=None) — rarer and slower.
    # The 32*n term is load-bearing: a valid array needs n offset words
    # in the tail, and without it a garbage length word would size a
    # 2^40-element array before any per-element guard runs
    # try_multiply: a garbage 62-bit length word would overflow the
    # multiply itself under ANSI; NULL propagates to ok -> row nulls
    ok = F.length(data) >= tail + 31 + F.try_multiply(F.lit(32).cast(_LONG), n)
    arr = F.transform(
        F.sequence(F.lit(0).cast(_LONG), (n - 1).cast(_LONG)),
        lambda i: _decode_at(
            data,
            elem_base,
            (elem_base + i * F.lit(32).cast(_LONG)).cast(_LONG),
            inner,
            None,
        ),
    )
    return F.when(ok & (n > 0), arr).when(ok & (n == 0), empty)


def compile_decode_columns(
    sig: EventSignature,
    topic_cols: list[str],
    data_col: str,
    allow_decode_fail: bool,
    pre: _Prelude | None = None,
) -> list[Column]:
    """Build one output Column per event param. Pass a ``_Prelude`` to
    hoist dynamic positions into once-per-row helper columns (callers
    must then route the DataFrame through ``pre.apply``)."""
    total_head_words = sum(head_words(p.abi_type) for p in sig.data_params)
    has_dynamic = any(_is_dynamic(p.abi_type) for p in sig.data_params)

    # validity: enough topics present; data section holds all head words
    valid = F.lit(True)
    for i, _ in enumerate(sig.indexed_params):
        valid = valid & F.col(topic_cols[i + 1]).isNotNull()
    if total_head_words:
        valid = valid & (F.length(F.col(data_col)) >= F.lit(32 * total_head_words))
    if not has_dynamic:
        valid = valid & (
            F.length(F.coalesce(F.col(data_col), F.lit(b"")))
            == F.lit(32 * total_head_words)
        )

    data = F.col(data_col)
    base = F.lit(1).cast(_LONG)  # offsets are relative to the data section
    out: list[Column] = []
    topic_i = 1
    head_cum = 0
    for p in sig.params:
        if p.indexed:
            word = F.col(topic_cols[topic_i])
            topic_i += 1
            if _is_dynamic(p.abi_type) or type_structure(p.abi_type)[0] != "base":
                # indexed dynamic/composite params are keccak hashes:
                # keep the raw 32-byte word (ABI spec)
                raw = word
            else:
                raw = _word_to_column(word, p.abi_type)
        else:
            head = F.lit(1 + 32 * head_cum).cast(_LONG)
            raw = _decode_at(data, base, head, p.abi_type, pre)
            head_cum += head_words(p.abi_type)
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
    if getattr(cfg, "engine", "native") == "arrow":
        from cherry_spark.operators.decode_evm_arrow import decode_events_arrow

        decoded_cols = decode_events_arrow(
            logs, sig, topic_cols, "data", cfg.allow_decode_fail
        )
        staged = logs
    else:
        pre = _Prelude()
        decoded_cols = compile_decode_columns(
            sig, topic_cols, "data", cfg.allow_decode_fail, pre
        )
        staged = pre.apply(logs)
    if cfg.hstack:
        decoded = staged.select(*decoded_cols, *[F.col(c) for c in logs.columns])
    else:
        decoded = staged.select(*decoded_cols)
    out = dict(batch)
    out[cfg.output_table] = decoded
    return out


def _stringify_decoded(col: Column, abi_type: str, indexed: bool) -> Column:
    """Decoded value -> string for the generic event_values array
    (binary -> 0x-hex, composites -> JSON, scalars -> cast)."""
    spark_t = (
        T.BinaryType()
        if indexed and (is_dynamic(abi_type) or type_structure(abi_type)[0] != "base")
        else abi_type_to_spark(abi_type)
    )
    if isinstance(spark_t, T.BinaryType):
        return F.concat(F.lit("0x"), F.lower(F.hex(col)))
    if isinstance(spark_t, (T.ArrayType, T.StructType)):
        return F.to_json(col)
    return col.cast("string")


def load_abi_db(spark, path: str) -> DataFrame:
    """Load a Glaciers-style ABI db FILE into the (address, topic0,
    event_signature) lookup DataFrame that ``glaciers_events``
    broadcasts — the reference's ``abi_db_path`` contract
    (reference config.py:137-142: the config takes a path, not a
    table).

    Formats by extension:

    - ``.parquet`` — columns address / event_signature (+ optional
      topic0); string address/topic0 columns may be 0x-hex and are
      converted to binary;
    - ``.json`` / ``.jsonl`` — a JSON array of objects, or one object
      per line, with keys ``address`` (0x-hex), ``event_signature``
      and optional ``topic0`` (0x-hex).

    A missing topic0 is derived driver-side from the canonical
    signature (keccak-256, ``evm_signature_to_topic0``) — the same
    convention Glaciers uses to key its db. The db is a dim table
    bounded by contract count, so driver-side parsing is not a data
    path.
    """
    import json
    import os

    from cherry_spark.functions.crypto import evm_signature_to_topic0

    def unhex_bytes(v):
        if v is None or isinstance(v, (bytes, bytearray)):
            return v
        return bytes.fromhex(v[2:] if v.startswith("0x") else v)

    ext = os.path.splitext(path)[1].lower()
    if ext == ".parquet":
        df = spark.read.parquet(path)
        for c in ("address", "topic0"):
            if c in df.columns and not isinstance(
                df.schema[c].dataType, T.BinaryType
            ):
                df = df.withColumn(
                    c, F.unhex(F.regexp_replace(F.col(c), "^0x", ""))
                )
        if "topic0" in df.columns:
            return df.select("address", "topic0", "event_signature")
        rows = [
            (r["address"], r["event_signature"])
            for r in df.select("address", "event_signature").collect()
        ]
        rows = [(a, evm_signature_to_topic0(s), s) for a, s in rows]
    elif ext in (".json", ".jsonl"):
        with open(path) as f:
            text = f.read().strip()
        objs = (
            json.loads(text)
            if text.startswith("[")
            else [json.loads(ln) for ln in text.splitlines() if ln.strip()]
        )
        rows = [
            (
                unhex_bytes(o["address"]),
                unhex_bytes(o["topic0"])
                if o.get("topic0") is not None
                else evm_signature_to_topic0(o["event_signature"]),
                o["event_signature"],
            )
            for o in objs
        ]
    else:
        raise ValueError(
            f"load_abi_db: unsupported ABI db format {ext!r} "
            f"(expected .parquet, .json or .jsonl)"
        )
    return spark.createDataFrame(
        rows, "address binary, topic0 binary, event_signature string"
    )


def glaciers_events(batch: Batch, cfg: GlaciersEventsConfig) -> Batch:
    """Bulk multi-contract decode: ONE broadcast join of logs to the ABI
    lookup table on (address, topic0), then one decode branch per
    distinct *layout* (canonical type+indexed pattern), not per
    signature — a real Glaciers ABI db has thousands of signatures but
    only dozens of layouts (Transfer and Approval share one), so the
    union fan-out and plan size are independent of ABI-db size.
    (Reference GLACIERS_EVENTS, config.py:137-142 — declared, unwired.)

    Output follows the public Glaciers contract of a FIXED generic
    schema — event_signature, event_keys (param names), event_values
    (stringified values) — plus the hstacked input columns, so every
    branch unions cleanly. The only driver-side enumeration is the ABI
    db's distinct signatures (a dim table, bounded by contract count,
    never by data volume); per-signature param names become a small
    broadcast map literal, not extra branches.
    """
    logs = batch[cfg.input_table]
    if cfg.abi_db_path is not None:
        abi_db = load_abi_db(logs.sparkSession, cfg.abi_db_path)
    else:
        abi_db = batch[cfg.abi_db_table]
    sig_rows = abi_db.select("event_signature").distinct().collect()
    by_layout: dict[tuple, list[EventSignature]] = {}
    sig_text: dict[str, str] = {}
    for row in sig_rows:
        parsed = parse_event_signature(row["event_signature"])
        key = tuple((p.abi_type, p.indexed) for p in parsed.params)
        by_layout.setdefault(key, []).append(parsed)
        sig_text[id(parsed)] = row["event_signature"]
    if not by_layout:
        raise ValueError("glaciers_events: empty ABI db")

    joined = logs.join(F.broadcast(abi_db), on=["address", "topic0"], how="inner")
    topic_cols = ["topic0", "topic1", "topic2", "topic3"]
    slices: list[DataFrame] = []
    for layout, sigs in by_layout.items():
        strs = [sig_text[id(s)] for s in sigs]
        sl = joined.filter(F.col("event_signature").isin(strs))
        positional = EventSignature(
            name="",
            params=[
                EventParam(f"__p{i}", t, idx) for i, (t, idx) in enumerate(layout)
            ],
        )
        pre = _Prelude()
        decoded_cols = compile_decode_columns(
            positional, topic_cols, "data", allow_decode_fail=True, pre=pre
        )
        sl = pre.apply(sl)
        values = F.array(
            *[
                _stringify_decoded(c, t, idx)
                for c, (t, idx) in zip(decoded_cols, layout)
            ]
        )
        keys_map = F.create_map(
            *[
                x
                for s in sigs
                for x in (
                    F.lit(sig_text[id(s)]),
                    F.array(*[F.lit(p.name) for p in s.params]),
                )
            ]
        )
        slices.append(
            sl.select(
                *[F.col(c) for c in joined.columns],
                F.element_at(keys_map, F.col("event_signature")).alias("event_keys"),
                values.alias("event_values"),
            )
        )
    result = slices[0]
    for s in slices[1:]:
        result = result.unionByName(s)
    out = dict(batch)
    out[cfg.output_table] = result
    return out
