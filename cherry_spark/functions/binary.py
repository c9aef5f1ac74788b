"""Column-level binary encodings + the uint256 policy.

Hex encoding is native (`F.hex`, JVM-side, codegen). Base58 has no
Spark builtin → vectorized pandas UDF over Arrow batches (the slow
path, used only on address/signature columns, mirroring reference
steps/base58_encode.py). uint256: Spark's DecimalType ceiling is 38
digits vs the reference's decimal256(76,0) — policy per SURVEY §1.3:

- canonical wire form: 32-byte big-endian BinaryType;
- fast native converter covers values < 2^126 (fits decimal(38,0));
  wider values -> null (caller opts into the pandas fallback if the
  full range matters). The reference itself downcasts 256->128 with
  allow_cast_fail for DuckDB (examples/erc20_custom.py:175-184).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType, StringType
from pyspark.sql.pandas.functions import pandas_udf

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def b58encode_bytes(raw: bytes) -> str:
    """Pure-Python base58 (Bitcoin alphabet), driver- or executor-side."""
    n = int.from_bytes(raw, "big")
    out = []
    while n > 0:
        n, r = divmod(n, 58)
        out.append(_B58_ALPHABET[r])
    # leading zero bytes encode as '1'
    pad = 0
    for b in raw:
        if b == 0:
            pad += 1
        else:
            break
    return "1" * pad + "".join(reversed(out))


def b58decode_str(s: str) -> bytes:
    n = 0
    for ch in s:
        n = n * 58 + _B58_ALPHABET.index(ch)
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big") if n else b""
    pad = 0
    for ch in s:
        if ch == "1":
            pad += 1
        else:
            break
    return b"\x00" * pad + raw


@pandas_udf(StringType())
def base58_encode_udf(col: pd.Series) -> pd.Series:
    return col.map(lambda v: None if v is None else b58encode_bytes(bytes(v)))


def hex_encode(col: Column, prefixed: bool = True) -> Column:
    """Binary -> lowercase hex string, optionally 0x-prefixed
    (reference steps/hex_encode.py kernels hex_encode/prefix_hex_encode)."""
    h = F.lower(F.hex(col))
    return F.concat(F.lit("0x"), h) if prefixed else h


def hex_decode(col: Column) -> Column:
    """Hex string (with or without 0x) -> binary."""
    return F.unhex(F.regexp_replace(col, "^0x", ""))


def u256_binary_to_decimal38(col: Column) -> Column:
    """32-byte big-endian uint256 -> decimal(38,0); null when >= 2^126.

    Native path (stays in whole-stage codegen): the top 16 bytes must be
    zero, then value = hi64 * 2^64 + lo64 where hi64 < 2^62 keeps the
    product inside decimal(38,0). `conv(hex, 16, 10)` is exact for
    64-bit unsigned chunks.
    """
    # binary-slice compare for the zero check and 8-byte hex slices for
    # the limbs — avoids materializing a 64-char hex string per row
    top_zero = F.substring(col, 1, 16) == F.lit(b"\x00" * 16)
    hi = F.conv(F.hex(F.substring(col, 17, 8)), 16, 10).cast(DecimalType(38, 0))
    lo = F.conv(F.hex(F.substring(col, 25, 8)), 16, 10).cast(DecimalType(38, 0))
    value = (hi * F.lit(__import__("decimal").Decimal(2**64)).cast(DecimalType(38, 0)) + lo).cast(DecimalType(38, 0))
    # hi < 2^62 keeps value < 2^126 ≈ 8.5e37 < 10^38-1, inside decimal(38,0)
    fits = top_zero & (hi < F.lit(2**62))
    return F.when(fits, value).otherwise(F.lit(None).cast(DecimalType(38, 0)))


def i256_binary_to_decimal38(col: Column) -> Column:
    """Sign-extended 32-byte big-endian two's-complement int -> decimal(38,0).

    Covers |v| < 2^126 (null outside — same ceiling policy as the
    unsigned converter). Works for any intN with 64 < N <= 256 because
    the ABI sign-extends into the full word: positives have the top 16
    bytes all 0x00, negatives all 0xFF. Negative magnitude is computed
    limb-wise — m = 2^128 - u_low — without ever materializing 2^128
    (39 digits, over the decimal ceiling): the borrow propagates as
    A = (2^64-1) - hi and B = 2^64 - lo when lo > 0, else A = 2^64 - hi
    and B = 0. All native expressions, whole-stage codegen.
    """
    from decimal import Decimal as _D

    d38 = DecimalType(38, 0)
    two64 = F.lit(_D(2**64)).cast(d38)
    max64 = F.lit(_D(2**64 - 1)).cast(d38)
    top = F.substring(col, 1, 16)
    hi = F.conv(F.hex(F.substring(col, 17, 8)), 16, 10).cast(d38)
    lo = F.conv(F.hex(F.substring(col, 25, 8)), 16, 10).cast(d38)
    pos_val = (hi * two64 + lo).cast(d38)
    pos_fits = (top == F.lit(b"\x00" * 16)) & (hi < F.lit(2**62))
    a = F.when(lo > 0, max64 - hi).otherwise(two64 - hi)
    b = F.when(lo > 0, two64 - lo).otherwise(F.lit(_D(0)).cast(d38))
    # 0 - m, NOT unary minus: PySpark's Column.__neg__ loses decimal
    # precision beyond ~34 digits (observed on 4.1); subtraction is exact
    neg_val = (F.lit(_D(0)).cast(d38) - (a * two64 + b)).cast(d38)
    neg_fits = (top == F.lit(b"\xff" * 16)) & (a < F.lit(2**62))
    return (
        F.when(pos_fits, pos_val)
        .when(neg_fits, neg_val)
        .otherwise(F.lit(None).cast(d38))
    )


def u256_limbs(col: Column) -> list[Column]:
    """32-byte big-endian uint256 -> four uint64 limbs [l3, l2, l1, l0]
    (l3 most significant) as exact decimal(38,0) columns.

    Each limb is an 8-byte slice converted via ``conv(hex, 16, 10)`` —
    exact for unsigned 64-bit chunks, native, whole-stage codegen.
    This is the decomposition that makes EXACT aggregation of full-range
    uint256 possible despite Spark's 38-digit DecimalType ceiling
    (the reference carries decimal256(76,0),
    steps/u256_to_binary.py:27): limb sums stay inside decimal(38,0)
    for up to ~5e18 rows, and the carry recombination
    (``u256_sum_hex``) is exact integer decimal arithmetic.
    """
    return [
        F.conv(F.hex(F.substring(col, 1 + 8 * i, 8)), 16, 10).cast(
            DecimalType(38, 0)
        )
        for i in range(4)
    ]


def u256_sum_agg(col: Column) -> Column:
    """Aggregate expression: exact u256 SUM as a struct of per-limb
    decimal(38,0) sums ``struct<s3, s2, s1, s0>`` (s3 most
    significant). Use inside ``.agg(...)``; feed the result to
    ``u256_sum_hex`` to fold the carries into the canonical hex total.

    Why not one decimal sum: the true total of full-range uint256
    amounts (e.g. ERC-20 transfer values) needs up to 78+ digits —
    past DecimalType(38). Summing each 64-bit limb separately is
    exact and associative (map-side partial sums work normally), and
    the carries are propagated once per GROUP, not per row.
    Capacity: each limb sum ≤ n_rows · (2^64-1) must stay below
    10^38-1, i.e. exact for up to ~5.4e18 input rows per group.
    """
    l3, l2, l1, l0 = u256_limbs(col)
    return F.struct(
        F.sum(l3).alias("s3"),
        F.sum(l2).alias("s2"),
        F.sum(l1).alias("s1"),
        F.sum(l0).alias("s0"),
    )


def u256_sum_hex(sums: Column) -> Column:
    """Fold a ``u256_sum_agg`` struct into the exact total as a
    0x-prefixed, fixed-width 80-hex-char string (16 carry digits +
    4 × 16 limb digits — covers totals up to 2^320).

    Carry propagation is exact decimal(38,0) integer arithmetic:
    ``pmod`` splits each running sum into a 64-bit residue and a
    carry; the division is lossless because the fractional part is
    identically zero (same argument as decimal_to_u256_binary).
    ``conv(·, 10, 16)`` is exact below 2^64, which every residue is
    by construction and the final carry is for any corpus below
    ~9.2e18 rows.
    """
    from decimal import Decimal as _D

    d38 = DecimalType(38, 0)
    two64 = F.lit(_D(2**64)).cast(d38)

    def split(v: Column) -> tuple[Column, Column]:
        r = F.pmod(v, two64).cast(d38)
        c = ((v - r) / two64).cast(d38)
        return r, c

    r0, c0 = split(sums["s0"])
    r1, c1 = split(sums["s1"] + c0)
    r2, c2 = split(sums["s2"] + c1)
    r3, c3 = split(sums["s3"] + c2)

    def hex16(v: Column) -> Column:
        return F.lpad(F.lower(F.conv(v.cast("string"), 10, 16)), 16, "0")

    return F.concat(
        F.lit("0x"), hex16(c3), hex16(r3), hex16(r2), hex16(r1), hex16(r0)
    )


def decimal_to_u256_binary(col: Column) -> Column:
    """decimal(38,0) -> 32-byte big-endian binary (reference
    steps/u256_to_binary.py inverse direction).

    Split into hi/lo 64-bit limbs with exact decimal arithmetic, then
    hex-pad each limb. Covers the decimal(38,0) range (< 2^127).

    The modulo comes FIRST: Spark decimal division yields scale-6
    HALF_UP rounding, so floor(v / 2^64) is off by one whenever
    v mod 2^64 >= 2^63 (e.g. 2^64-1 used to encode as hi=1, lo
    wrapped). pmod is exact, and (v - lo) / 2^64 then has no
    fractional part, so the scale-6 rounding is lossless.
    """
    two64 = F.lit(__import__("decimal").Decimal(2**64)).cast(DecimalType(38, 0))
    v = col.cast(DecimalType(38, 0))
    lo = F.pmod(v, two64).cast("decimal(38,0)")
    hi = ((v - lo) / two64).cast("decimal(38,0)")
    # conv(·,10,16) treats the input as unsigned 64-bit — limbs in
    # [2^63, 2^64) would overflow a signed-long cast + F.hex
    hi_hex = F.lpad(F.lower(F.conv(hi.cast("string"), 10, 16)), 16, "0")
    lo_hex = F.lpad(F.lower(F.conv(lo.cast("string"), 10, 16)), 16, "0")
    return F.unhex(F.concat(F.lit("0" * 32), hi_hex, lo_hex))
