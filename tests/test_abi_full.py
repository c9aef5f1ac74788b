"""Full-ABI decode tests: dynamic arrays, tuples, nested types, signed
wide ints — differential against a pure-Python ABI *encoder* written in
this test from the public Solidity ABI spec (head/tail layout), so the
decode is checked as an encode->decode inversion with independently
constructed payloads."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from cherry_spark.functions.abi_types import head_words, is_dynamic, parse_type
from cherry_spark.operators.decode_evm import (
    event_signature_to_schema,
    evm_decode_events,
    parse_event_signature,
)
from cherry_spark.plans.config import EvmDecodeEventsConfig


# --- minimal reference encoder (public ABI spec), test-side only ---

def _enc_word(v: int) -> bytes:
    return (v % 2**256).to_bytes(32, "big")


def _enc_value(abi_type: str, v) -> tuple[bytes, bytes]:
    """Returns (head, tail) for one value; offsets patched by caller."""
    if abi_type.endswith("]"):
        i = abi_type.rindex("[")
        elem, size = abi_type[:i], abi_type[i + 1 : -1]
        items = list(v)
        if size == "":
            body = _enc_word(len(items)) + _enc_sequence([elem] * len(items), items)
            return b"\x00" * 32, body  # head slot is an offset placeholder
        assert len(items) == int(size)
        body = _enc_sequence([elem] * len(items), items)
        if is_dynamic(abi_type):
            return b"\x00" * 32, body
        return body, b""
    if abi_type.startswith("("):
        from cherry_spark.functions.abi_types import split_top_level

        members = split_top_level(abi_type[1:-1])
        body = _enc_sequence(members, list(v))
        if is_dynamic(abi_type):
            return b"\x00" * 32, body
        return body, b""
    if abi_type == "string":
        raw = v.encode()
        return b"\x00" * 32, _enc_word(len(raw)) + raw + b"\x00" * (-len(raw) % 32)
    if abi_type == "bytes":
        return b"\x00" * 32, _enc_word(len(v)) + v + b"\x00" * (-len(v) % 32)
    if abi_type == "address":
        return b"\x00" * 12 + v, b""
    if abi_type == "bool":
        return _enc_word(int(v)), b""
    if abi_type.startswith("bytes"):  # bytesN
        return v + b"\x00" * (32 - len(v)), b""
    return _enc_word(v), b""  # intN/uintN (two's complement via mod)


def _enc_sequence(types: list[str], values: list) -> bytes:
    heads, tails = [], []
    for t, v in zip(types, values):
        h, tl = _enc_value(t, v)
        heads.append((t, h))
        tails.append(tl)
    head_len = sum(len(h) for _, h in heads)
    out_head, out_tail = b"", b""
    for (t, h), tl in zip(heads, tails):
        if is_dynamic(t):
            out_head += _enc_word(head_len + len(out_tail))
            out_tail += tl
        else:
            out_head += h
    return out_head + out_tail


def abi_encode_data(types: list[str], values: list) -> bytes:
    return _enc_sequence(types, values)


def _decode_one(spark, signature: str, data: bytes, topics=()):
    row = {"data": data}
    for i, t in enumerate(topics):
        row[f"topic{i}"] = t
    schema = "data binary" + "".join(f", topic{i} binary" for i in range(len(topics)))
    df = spark.createDataFrame([tuple([data, *topics])], schema)
    out = evm_decode_events(
        {"logs": df},
        EvmDecodeEventsConfig(signature, allow_decode_fail=True, hstack=False),
    )["decoded_logs"]
    return out.collect()[0]


def test_grammar_helpers():
    assert parse_type("(address to, uint256 amt)[] xs")[0] == "(address,uint256)[]"
    assert head_words("(address,uint64)") == 2
    assert head_words("uint256[3]") == 3
    assert head_words("(address,uint256)[2]") == 4
    assert head_words("uint256[]") == 1 and is_dynamic("uint256[]")
    assert not is_dynamic("(address,uint256)[2]")
    assert is_dynamic("(address,string)")
    sig = parse_event_signature(
        "TransferBatch(address indexed operator, address indexed from, "
        "address indexed to, uint256[] ids, uint256[] values)"
    )
    assert [p.abi_type for p in sig.params] == [
        "address", "address", "address", "uint256[]", "uint256[]",
    ]
    assert [p.indexed for p in sig.params] == [True, True, True, False, False]


def test_transfer_batch_decode(spark):
    """ERC-1155 TransferBatch: two dynamic uint256[] params."""
    ids = [1, 5, 2**80]
    values = [10, 0, 2**126 - 1]
    data = abi_encode_data(["uint256[]", "uint256[]"], [ids, values])
    op, frm, to = b"\x0a" * 20, b"\x0b" * 20, b"\x0c" * 20
    row = _decode_one(
        spark,
        "TransferBatch(address indexed operator, address indexed from, "
        "address indexed to, uint256[] ids, uint256[] values)",
        data,
        topics=(b"\x00" * 32, b"\x00" * 12 + op, b"\x00" * 12 + frm, b"\x00" * 12 + to),
    )
    assert bytes(row["operator"]) == op
    assert [int(x) for x in row["ids"]] == ids
    assert [int(x) for x in row["values"]] == values


def test_signed_wide_ints(spark):
    """int256/int128 negatives two's-complement-decode correctly."""
    cases = [-1, -(2**64) - 5, -(2**100), 2**100, 0, -123, 2**126 - 1, -(2**126) + 1]
    data = abi_encode_data(["int256"] * len(cases), cases)
    sig = "E(" + ", ".join(f"int256 v{i}" for i in range(len(cases))) + ")"
    row = _decode_one(spark, sig, data)
    for i, want in enumerate(cases):
        assert int(row[f"v{i}"]) == want, f"v{i}"
    # int128 sign-extends into the word identically
    data = abi_encode_data(["int128", "int128"], [-42, 2**100])
    row = _decode_one(spark, "E(int128 a, int128 b)", data)
    assert int(row["a"]) == -42 and int(row["b"]) == 2**100


def test_signed_small_int_negatives(spark):
    """intN<=64 negatives: the encoding sign-extends over the whole
    word, so the low limb read as int64 is the value — wrapping by
    2^bits on a 64-bit read mis-decoded these before r3."""
    cases = [("int8", -5), ("int16", -300), ("int32", -1), ("int48", -(2**40)),
             ("int64", -(2**63)), ("int8", 127), ("int32", 0)]
    data = abi_encode_data([t for t, _ in cases], [v for _, v in cases])
    sig = "E(" + ", ".join(f"{t} v{i}" for i, (t, _) in enumerate(cases)) + ")"
    row = _decode_one(spark, sig, data)
    for i, (_, want) in enumerate(cases):
        assert row[f"v{i}"] == want, f"v{i}"
    # same paths inside a static array (hex-region element decode)
    data = abi_encode_data(["int32[3]", "uint8"], [[-7, 0, -(2**31)], 9])
    row = _decode_one(spark, "E(int32[3] xs, uint8 k)", data)
    assert list(row["xs"]) == [-7, 0, -(2**31)] and row["k"] == 9


def test_malformed_value_words_null_not_crash(spark):
    """Garbage VALUE words (not just offsets) must null or decode, never
    ANSI-throw: uint<=63 paths try_cast (ADVICE r2). A full-ff word IS
    sign-extended -1 for signed types, so those decode."""
    garbage = b"\xff" * 32 * 7
    row = _decode_one(
        spark, "E(uint48 a, int32 b, uint48[2] c, uint32 d, int16 e, bool f)", garbage
    )
    assert row["a"] is None            # low limb 2^64-1 >= 2^63 -> null
    assert row["b"] == -1              # valid sign-extended int32
    assert row["c"] is None or list(row["c"]) == [None, None]
    assert row["d"] == 2**32 - 1       # uint32 reads only its own chars
    assert row["e"] == -1
    assert row["f"] is True


def test_signed_overflow_nulls(spark):
    """|v| >= 2^126 nulls out (decimal38 ceiling policy), never wraps."""
    data = abi_encode_data(["int256", "int256"], [2**127 - 1, -(2**127)])
    row = _decode_one(spark, "E(int256 a, int256 b)", data)
    assert row["a"] is None and row["b"] is None


def test_static_tuple_and_fixed_array(spark):
    data = abi_encode_data(
        ["(address,uint64)", "uint256[3]", "uint32"],
        [(b"\x01" * 20, 77), [3, 2**90, 1], 9],
    )
    row = _decode_one(
        spark, "E((address,uint64) who, uint256[3] xs, uint32 n)", data
    )
    assert bytes(row["who"]["f0"]) == b"\x01" * 20
    assert int(row["who"]["f1"]) == 77
    assert [int(x) for x in row["xs"]] == [3, 2**90, 1]
    assert row["n"] == 9


def test_dynamic_tuple_with_string(spark):
    data = abi_encode_data(
        ["(string,uint256)", "uint64"], [("hello tuple", 42), 7]
    )
    row = _decode_one(spark, "E((string,uint256) t, uint64 tail)", data)
    assert row["t"]["f0"] == "hello tuple"
    assert int(row["t"]["f1"]) == 42
    assert int(row["tail"]) == 7


def test_array_of_strings_and_empty_array(spark):
    data = abi_encode_data(
        ["string[]", "uint256[]", "uint8"], [["ab", "longer than thirty-two bytes payload", ""], [], 5]
    )
    row = _decode_one(spark, "E(string[] ss, uint256[] none, uint8 k)", data)
    assert list(row["ss"]) == ["ab", "longer than thirty-two bytes payload", ""]
    assert list(row["none"]) == []
    assert row["k"] == 5


def test_array_of_static_tuples(spark):
    vals = [(b"\x11" * 20, 1), (b"\x22" * 20, 2**70)]
    data = abi_encode_data(["(address,uint256)[]", "bool"], [vals, True])
    row = _decode_one(spark, "E((address,uint256)[] trades, bool ok)", data)
    got = [(bytes(s["f0"]), int(s["f1"])) for s in row["trades"]]
    assert got == vals and row["ok"] is True


def test_schema_compiler_full():
    from pyspark.sql import types as T

    sch = event_signature_to_schema(
        "E(uint256[] a, (address,uint64) b, string indexed c, int256 d)"
    )
    assert sch["a"].dataType == T.ArrayType(T.DecimalType(38, 0), True)
    assert sch["b"].dataType == T.StructType(
        [T.StructField("f0", T.BinaryType(), True), T.StructField("f1", T.DecimalType(20, 0), True)]
    )
    # indexed dynamic param is a keccak hash -> binary
    assert sch["c"].dataType == T.BinaryType()
    assert sch["d"].dataType == T.DecimalType(38, 0)


def test_malformed_offsets_null_not_crash(spark):
    """Garbage offsets/lengths must yield nulls, not exceptions."""
    garbage = b"\xff" * 64
    row = _decode_one(spark, "E(uint256[] xs, string s)", garbage)
    assert row["xs"] is None and row["s"] is None


def test_canonical_signature_tuple_aware():
    from cherry_spark.functions.crypto import canonical_event_signature

    assert (
        canonical_event_signature(
            "Swap((address base, uint256 amt)[] legs, string indexed memo, int128 delta)"
        )
        == "Swap((address,uint256)[],string,int128)"
    )
