"""Deterministic blockchain-shaped fixtures (FIXTURES.md §B).

Pure-Python generation (sha256-derived pseudo-random bytes, fixed seed
strings) so expected decode outputs are computable in the test itself —
the same differential style the reference's unit tests use
(reference tests/test_steps.py:27,108).
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timezone

from pyspark.sql import types as T

from cherry_spark.functions.crypto import evm_signature_to_topic0

TRANSFER_SIG = "Transfer(address indexed from, address indexed to, uint256 amount)"
TRANSFER_TOPIC0 = evm_signature_to_topic0(TRANSFER_SIG)

JUP_DISCRIMINATOR = hashlib.sha256(b"global:route").digest()[:8]
JUP_PROGRAM_ID = hashlib.sha256(b"jup_program").digest()


def _b(seed: str, n: int) -> bytes:
    out = b""
    i = 0
    while len(out) < n:
        out += hashlib.sha256(f"{seed}:{i}".encode()).digest()
        i += 1
    return out[:n]


def _addr(seed: str) -> bytes:
    return _b(seed, 20)


def _topic_addr(addr: bytes) -> bytes:
    return b"\x00" * 12 + addr


def evm_rows(n_logs: int = 200):
    """Returns (blocks_rows, logs_rows, expected_decoded) lists."""
    blocks = []
    for num in range(1000, 1020):
        ts = datetime(2024, 3, 1, tzinfo=timezone.utc).timestamp() + num * 12
        blocks.append((num, datetime.fromtimestamp(ts, tz=timezone.utc).replace(tzinfo=None)))

    logs, expected = [], []
    for i in range(n_logs):
        block_number = 1000 + (i % 20)
        is_transfer = i % 5 != 4  # 80%
        from_a, to_a = _addr(f"from{i}"), _addr(f"to{i}")
        amount = (i + 1) * 10**12 + i
        data = amount.to_bytes(32, "big")
        logs.append(
            (
                block_number,
                _b(f"txh{i}", 32),
                i,
                _addr(f"contract{i % 3}"),
                TRANSFER_TOPIC0 if is_transfer else _b(f"othertopic{i}", 32),
                _topic_addr(from_a),
                _topic_addr(to_a),
                None,
                data,
            )
        )
        expected.append(
            (from_a, to_a, amount) if is_transfer else (from_a, to_a, amount)
        )
    return blocks, logs, expected


EVM_BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("number", T.LongType()),
        T.StructField("timestamp", T.TimestampNTZType()),
    ]
)

EVM_LOGS_SCHEMA = T.StructType(
    [
        T.StructField("block_number", T.LongType()),
        T.StructField("transaction_hash", T.BinaryType()),
        T.StructField("log_index", T.LongType()),
        T.StructField("address", T.BinaryType()),
        T.StructField("topic0", T.BinaryType()),
        T.StructField("topic1", T.BinaryType()),
        T.StructField("topic2", T.BinaryType()),
        T.StructField("topic3", T.BinaryType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def svm_rows(n: int = 100):
    """Instruction rows + expected decode tuples for the Jupiter-swap
    shape (discriminator + amm + input_mint + u64 + output_mint + u64,
    reference examples/jup_swap.py:126-151)."""
    rows, expected = [], []
    for i in range(n):
        ok = i % 4 != 3  # 75% decodable
        amm = _b(f"amm{i % 5}", 32)
        in_mint, out_mint = _b(f"mint{i % 7}", 32), _b(f"mint{(i + 1) % 7}", 32)
        in_amt, out_amt = (i + 1) * 1_000_003, (i + 1) * 999_983
        payload = (
            (JUP_DISCRIMINATOR if ok else b"\xff" * 8)
            + amm
            + in_mint
            + in_amt.to_bytes(8, "little")
            + out_mint
            + out_amt.to_bytes(8, "little")
        )
        accounts = [_b(f"acct{i}:{j}", 32) for j in range(10)]
        rows.append(
            (1000 + i // 10, i % 10, JUP_PROGRAM_ID, payload, *accounts)
        )
        expected.append((amm, in_mint, in_amt, out_mint, out_amt) if ok else None)
    return rows, expected


SVM_INSTRUCTIONS_SCHEMA = T.StructType(
    [
        T.StructField("block_slot", T.LongType()),
        T.StructField("transaction_index", T.LongType()),
        T.StructField("program_id", T.BinaryType()),
        T.StructField("data", T.BinaryType()),
        *[T.StructField(f"a{j}", T.BinaryType()) for j in range(10)],
    ]
)
