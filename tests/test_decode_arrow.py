"""Differential test: the Arrow (pandas-UDF) decode engine must agree
with the native expression compiler value-for-value — well-formed and
malformed payloads alike. The encoder comes from test_abi_full (an
independent test-side implementation of the public ABI spec)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from test_abi_full import abi_encode_data

from cherry_spark.operators.decode_evm import evm_decode_events
from cherry_spark.plans.config import EvmDecodeEventsConfig


def _decode_both(spark, signature: str, payloads: list[bytes], topics_rows=None):
    """Returns (native_rows, arrow_rows) for the same logs table."""
    n_topics = 4
    if topics_rows is None:
        topics_rows = [[None] * n_topics for _ in payloads]
    data = [tuple([d, *t]) for d, t in zip(payloads, topics_rows)]
    schema = "data binary" + "".join(f", topic{i} binary" for i in range(n_topics))
    df = spark.createDataFrame(data, schema)
    out = []
    for engine in ("native", "arrow"):
        res = evm_decode_events(
            {"logs": df},
            EvmDecodeEventsConfig(
                signature, allow_decode_fail=True, hstack=False, engine=engine
            ),
        )["decoded_logs"]
        out.append([r.asDict(recursive=True) for r in res.collect()])
    return out


def _assert_engines_agree(spark, signature, payloads, topics_rows=None):
    native, arrow = _decode_both(spark, signature, payloads, topics_rows)
    assert len(native) == len(arrow)
    for i, (n_row, a_row) in enumerate(zip(native, arrow)):
        assert n_row == a_row, f"row {i}: native={n_row} arrow={a_row}"


SIG_BATCH = (
    "Batch(address indexed operator, uint256[] ids, uint256[] vals, "
    "string memo, int256 delta)"
)


def test_dynamic_arrays_and_scalars_agree(spark):
    types = ["uint256[]", "uint256[]", "string", "int256"]
    rows = [
        ([1, 2, 3], [10**18, 0], "hello world", -42),
        ([], [2**125], "", 2**125),
        ([2**126, 5], [7], "uné ünïcode", -(2**125)),  # first id over ceiling -> null
        ([2**64 - 1], [2**64], "x" * 100, 0),
    ]
    payloads = [abi_encode_data(types, list(v)) for v in rows]
    topics = [[b"\x00" * 32, b"\x11" * 32, None, None] for _ in rows]
    _assert_engines_agree(spark, SIG_BATCH, payloads, topics)


def test_nested_and_static_types_agree(spark):
    sig = (
        "Mix(uint32 a, int32 b, bool c, bytes8 d, address e, uint64[3] f, "
        "(address,uint256)[] g, string[] h, bytes i, int64 j, uint48 k)"
    )
    types = [
        "uint32",
        "int32",
        "bool",
        "bytes8",
        "address",
        "uint64[3]",
        "(address,uint256)[]",
        "string[]",
        "bytes",
        "int64",
        "uint48",
    ]
    rows = [
        (
            4000000000,
            -7,
            True,
            b"\x01\x02\x03\x04\x05\x06\x07\x08",
            b"\xaa" * 20,
            [1, 2**63, 2**64 - 1],
            [(b"\xbb" * 20, 123), (b"\xcc" * 20, 2**100)],
            ["alpha", "", "βγδ"],
            b"\xde\xad\xbe\xef" * 10,
            -(2**62),
            2**47,
        ),
        (
            0,
            2**31 - 1,
            False,
            b"\x00" * 8,
            b"\x00" * 20,
            [0, 0, 0],
            [],
            [],
            b"",
            2**62,
            0,
        ),
    ]
    payloads = [abi_encode_data(types, list(v)) for v in rows]
    _assert_engines_agree(spark, sig, payloads)


def test_signed_wide_ints_agree(spark):
    sig = "S(int256 a, int128 b, int96 c)"
    types = ["int256", "int128", "int96"]
    rows = [
        (-1, -1, -1),
        (2**125, -(2**125), 2**95 - 1),
        (2**126, -(2**126) - 1, -(2**95)),  # a,b over ceiling -> null both
        (0, 0, 0),
    ]
    payloads = [abi_encode_data(types, list(v)) for v in rows]
    _assert_engines_agree(spark, sig, payloads)


def test_malformed_payloads_agree(spark):
    """Truncated data, garbage offsets, giant length words: both
    engines must produce the same NULL pattern, never crash."""
    types = ["uint256[]", "string", "int256"]
    good = abi_encode_data(types, [[1, 2], "ok", -5])
    payloads = [
        good,
        good[:40],  # truncated mid-head
        good[:97],  # truncated mid-tail
        b"",
        None,
        # offset word >= 2^63 (low limb)
        (2**63).to_bytes(32, "big") + good[32:],
        # array length word gigantic
        good[:96] + (2**40).to_bytes(32, "big") + good[128:],
        # offset pointing past the end
        (10**6).to_bytes(32, "big") + good[32:],
    ]
    _assert_engines_agree(spark, "M(uint256[] xs, string s, int256 d)", payloads)


def test_fixed_dynamic_combinations_agree(spark):
    sig = "F(string[2] a, (uint256,string) b, uint8[2][2] c)"
    types = ["string[2]", "(uint256,string)", "uint8[2][2]"]
    rows = [
        (["ab", "cdef"], (99, "tail"), [[1, 2], [3, 4]]),
        (["", ""], (0, ""), [[0, 0], [255, 255]]),
    ]
    payloads = [abi_encode_data(types, list(v)) for v in rows]
    _assert_engines_agree(spark, sig, payloads)


def test_malformed_dynamic_element_array_agree(spark):
    types = ["string[]"]
    good = abi_encode_data(types, [["aa", "bb"]])
    payloads = [
        good,
        # giant element-count word: must null, not materialize 2^40 slots
        good[:32] + (2**40).to_bytes(32, "big") + good[64:],
        # count word then truncated tail
        good[:32] + (2**62).to_bytes(32, "big"),
    ]
    _assert_engines_agree(spark, "D(string[] xs)", payloads)
