"""Pipeline IR: declarative step/pipeline dataclasses.

Semantics mirror the reference's config surface
(reference src/cherry_etl/config.py) re-typed for Spark: a `Pipeline`
is (source, steps, writer); each `Step` is (kind, config). Unlike the
reference — which executes the step list eagerly, batch-at-a-time
(src/cherry_etl/pipeline.py:38-75) — our steps compose *lazily* over
DataFrames, so Catalyst optimizes across the entire chain.

The reference declares three join StepKinds with no dispatch arm
(config.py:39-41 vs pipeline.py:74-75); here they are first-class.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from enum import Enum
from typing import Any

from pyspark.sql import DataFrame, SparkSession

Batch = dict[str, DataFrame]


class StepKind(str, Enum):
    EVM_DECODE_EVENTS = "evm_decode_events"
    SVM_DECODE_INSTRUCTIONS = "svm_decode_instructions"
    SVM_DECODE_LOGS = "svm_decode_logs"
    CAST = "cast"
    CAST_BY_TYPE = "cast_by_type"
    HEX_ENCODE = "hex_encode"
    BASE58_ENCODE = "base58_encode"
    U256_TO_BINARY = "u256_to_binary"
    SET_CHAIN_ID = "set_chain_id"
    JOIN_BLOCK_DATA = "join_block_data"
    JOIN_EVM_TRANSACTION_DATA = "join_evm_transaction_data"
    JOIN_SVM_TRANSACTION_DATA = "join_svm_transaction_data"
    EVM_VALIDATE_BLOCK_DATA = "evm_validate_block_data"
    GLACIERS_EVENTS = "glaciers_events"
    # escape hatches: SQL replaces the reference's DataFusion step,
    # TRANSFORM replaces its Polars step (SURVEY §2.8)
    SQL = "sql"
    TRANSFORM = "transform"
    CUSTOM = "custom"


@dataclass
class EvmDecodeEventsConfig:
    """ABI-decode a logs table (reference steps/evm_decode_events.py:9-35)."""

    event_signature: str
    input_table: str = "logs"
    output_table: str = "decoded_logs"
    allow_decode_fail: bool = False
    hstack: bool = True  # append input columns onto decoded output
    # "native": pure JVM expressions (fastest for flat/static
    # signatures); "arrow": vectorized pandas-UDF byte decode (fastest
    # when the signature has dynamic arrays — HOF lambda decode is
    # interpreted, measured ~10x slower there). Equal results by
    # differential test either way.
    engine: str = "native"


@dataclass
class SvmDecodeInstructionsConfig:
    """Borsh-decode instructions (reference steps/svm_decode_instructions.py)."""

    instruction_signature: Any  # functions.svm.InstructionSignature
    input_table: str = "instructions"
    output_table: str = "decoded_instructions"
    allow_decode_fail: bool = False
    hstack: bool = True


@dataclass
class CastConfig:
    """Cast named columns of one table (reference steps/cast.py)."""

    table_name: str
    mappings: dict[str, str]  # column -> Spark SQL type string
    allow_cast_fail: bool = False  # True -> try_cast (null on failure)


@dataclass
class CastByTypeConfig:
    """Cast every column of from_type across all tables
    (reference steps/cast_by_type.py)."""

    from_type: str
    to_type: str
    allow_cast_fail: bool = False
    tables: list[str] | None = None  # None = all


@dataclass
class HexEncodeConfig:
    """Hex-encode every binary column (reference steps/hex_encode.py)."""

    tables: list[str] | None = None
    prefixed: bool = True  # "0x…"


@dataclass
class Base58EncodeConfig:
    """Base58-encode every binary column (reference steps/base58_encode.py)."""

    tables: list[str] | None = None


@dataclass
class U256ToBinaryConfig:
    """Convert decimal amount columns to 32-byte big-endian binary
    (reference steps/u256_to_binary.py)."""

    tables: list[str] | None = None
    columns: list[str] | None = None  # None = every decimal(38,0) column


@dataclass
class SetChainIdConfig:
    """Tag every table with a constant chain_id
    (reference steps/set_chain_id.py)."""

    chain_id: int


@dataclass
class JoinBlockDataConfig:
    """Join tables to blocks on block number/slot (+ chain_id when present).
    Declared-but-unwired in the reference (config.py:39)."""

    tables: list[str]
    blocks_table: str = "blocks"
    join_key: str = "block_number"  # column in the fact tables
    blocks_key: str = "number"  # column in blocks
    how: str = "left"
    broadcast_blocks: bool = True


@dataclass
class JoinTransactionDataConfig:
    """Join tables to transactions on (block, tx index)."""

    tables: list[str]
    transactions_table: str = "transactions"
    on: tuple[str, str] = ("block_number", "transaction_index")
    how: str = "left"


@dataclass
class EvmValidateBlockDataConfig:
    """Consistency checks over blocks/transactions/logs/traces.
    Declared-but-unwired in the reference (config.py:30,121-125)."""

    blocks: str = "blocks"
    transactions: str = "transactions"
    logs: str = "logs"
    traces: str = "traces"


@dataclass
class GlaciersEventsConfig:
    """Bulk multi-signature decode via an ABI lookup table
    (reference config.py:137-142, unwired). The db is a small table of
    (address, topic0, event_signature) broadcast-joined to logs — either
    an in-batch DataFrame (``abi_db_table``) or, matching the
    reference's ``abi_db_path`` contract, a JSON/parquet file loaded
    from disk (path wins when both are set)."""

    abi_db_table: str = "abi_db"
    abi_db_path: str | None = None
    input_table: str = "logs"
    output_table: str = "decoded_logs"


@dataclass
class SqlStepConfig:
    """Run SQL over the batch; every table is a temp view — replaces the
    reference's DataFusion step (steps/datafusion_step.py:15-20)."""

    sql: str
    output_table: str = "sql_output"
    replace_batch: bool = False  # True: batch becomes {output_table: result}


@dataclass
class TransformStepConfig:
    """User callback Batch -> Batch — replaces the reference's Polars step
    (steps/polars_step.py:8-21); the returned dict REPLACES the batch."""

    runner: Callable[[Batch, Any], Batch]
    context: Any = None


@dataclass
class Step:
    kind: StepKind
    config: Any
    name: str | None = None


@dataclass
class Pipeline:
    """Declarative pipeline: source -> steps -> writer (reference
    config.py:234-239). ``source`` yields one Batch per micro-batch;
    ``writer`` is any cherry_spark.writers.DataWriter."""

    source: Any  # Callable[[SparkSession], Iterator[Batch]] | Batch
    steps: list[Step] = field(default_factory=list)
    writer: Any = None


SessionBatchFn = Callable[[SparkSession, Batch], Batch]
