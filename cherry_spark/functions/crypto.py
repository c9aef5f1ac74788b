"""Driver-side crypto helpers producing query constants.

The reference gets these from its Rust core at query-build time:
``evm_signature_to_topic0`` (reference examples/erc20_custom.py:16,115)
and ``svm_anchor_discriminator`` (reference src/cherry_etl/utils.py:5-9).
They produce filter literals, not columns, so pure Python is the right
altitude — no UDF needed.

Keccak-256 is implemented from the public Keccak specification
(FIPS-202 / keccak.team) because the container has no keccak library;
it runs on a handful of signature strings per pipeline, never on data.
"""

from __future__ import annotations

import hashlib

_M64 = (1 << 64) - 1

_ROUND_CONSTANTS = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# rotation offsets r[x][y] from the Keccak reference
_ROTATIONS = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


def _rotl64(x: int, n: int) -> int:
    n %= 64
    return ((x << n) | (x >> (64 - n))) & _M64


def _keccak_f1600(state: list[int]) -> None:
    """In-place permutation over 25 lanes (state[x + 5*y])."""
    for rc in _ROUND_CONSTANTS:
        # theta
        c = [state[x] ^ state[x + 5] ^ state[x + 10] ^ state[x + 15] ^ state[x + 20] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl64(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                state[x + 5 * y] ^= d[x]
        # rho + pi
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl64(state[x + 5 * y], _ROTATIONS[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                state[x + 5 * y] = b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y])
        # iota
        state[0] ^= rc


def keccak256(data: bytes) -> bytes:
    """Keccak-256 (the pre-FIPS padding Ethereum uses: 0x01 domain)."""
    rate = 136  # bytes, for capacity 512
    state = [0] * 25
    # pad10*1 with Keccak domain byte 0x01
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 else b"\x81"
    for block_start in range(0, len(padded), rate):
        block = padded[block_start : block_start + rate]
        for i in range(rate // 8):
            state[i] ^= int.from_bytes(block[8 * i : 8 * i + 8], "little")
        _keccak_f1600(state)
    out = b"".join(state[i].to_bytes(8, "little") for i in range(4))
    return out


def canonical_event_signature(signature: str) -> str:
    """'Transfer(address indexed from, address indexed to, uint256 amount)'
    -> 'Transfer(address,address,uint256)' (types only, no names; tuple-
    aware via the shared ABI type grammar in functions/abi_types.py)."""
    from cherry_spark.functions.abi_types import parse_type, split_top_level

    name, _, rest = signature.partition("(")
    body = rest.strip()
    if body.endswith(")"):
        body = body[:-1]
    types = [parse_type(p)[0] for p in split_top_level(body)]
    return f"{name.strip()}({','.join(types)})"


def evm_signature_to_topic0(signature: str) -> bytes:
    """keccak256 of the canonical signature — the topic0 filter constant
    (reference call site examples/erc20_custom.py:115)."""
    return keccak256(canonical_event_signature(signature).encode())


def svm_anchor_discriminator(name: str, namespace: str = "global") -> bytes:
    """First 8 bytes of sha256('{namespace}:{name}') — Anchor instruction
    discriminator (reference src/cherry_etl/utils.py:5-9)."""
    return hashlib.sha256(f"{namespace}:{name}".encode()).digest()[:8]
