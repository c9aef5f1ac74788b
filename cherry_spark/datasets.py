"""High-level datasets API — the reference README's ``datasets``
promise (reference README.md:19 names a ``datasets`` module giving
"ready-made pipelines for common tables", but the snapshot ships no
code under src/ for it), realized as canned compositions of the query
model + pipeline steps.  Dataset names follow the public cryo/cherry
dataset vocabulary: ``blocks``, ``erc20_transfers``,
``address_appearances``.

Each builder takes the same ``tables: dict[str, DataFrame]`` batch the
providers stream and a block range, and returns ONE DataFrame with the
dataset's canonical schema — so a user writes::

    from cherry_spark import datasets
    df = datasets.erc20_transfers(tables, 0, 10_000)

instead of hand-assembling query + decode + join steps.  Everything
underneath is the certified operator surface (``apply_evm_query``,
``EVM_DECODE_EVENTS``, ``JOIN_BLOCK_DATA``), so plans keep the same
pushdown/broadcast shapes the per-operator plan audits verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cherry_spark.model import (
    EvmQuery,
    LogRequest,
    apply_evm_query,
)
from cherry_spark.plans.config import (
    Batch,
    EvmDecodeEventsConfig,
    JoinBlockDataConfig,
    Step,
    StepKind,
)
from cherry_spark.plans.pipeline import process_steps

TRANSFER_SIG = (
    "Transfer(address indexed from, address indexed to, uint256 amount)"
)
TRANSFER_TOPIC0 = bytes.fromhex(
    "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
)


def blocks(
    tables: Batch,
    from_block: int,
    to_block: int,
    fields: list[str] | None = None,
) -> DataFrame:
    """The blocks dataset: range-filtered (and optionally projected)
    block headers through the query model, so the range predicate and
    column pruning reach the scan."""
    q = EvmQuery(
        from_block=from_block,
        to_block=to_block,
        include_all_blocks=True,
        fields={"blocks": fields} if fields else {},
    )
    return apply_evm_query({"blocks": tables["blocks"]}, q)["blocks"]


def erc20_transfers(
    tables: Batch,
    from_block: int,
    to_block: int,
    with_block_timestamp: bool = True,
) -> DataFrame:
    """The erc20_transfers dataset: Transfer-topic0 filter through the
    query model, full-ABI decode, optional broadcast block-timestamp
    enrich.  Canonical columns: the decoded ``from``/``to``/``amount``
    hstacked onto the raw log columns (+ ``block_timestamp``)."""
    q = EvmQuery(
        from_block=from_block,
        to_block=to_block,
        logs=[LogRequest(topic0=[TRANSFER_TOPIC0])],
        include_all_blocks=with_block_timestamp,
    )
    filtered = apply_evm_query(tables, q)
    steps = [
        Step(
            StepKind.EVM_DECODE_EVENTS,
            EvmDecodeEventsConfig(
                TRANSFER_SIG,
                input_table="logs",
                output_table="erc20_transfers",
                allow_decode_fail=True,
                hstack=True,
            ),
        )
    ]
    if with_block_timestamp and "blocks" in filtered:
        steps.append(
            Step(
                StepKind.JOIN_BLOCK_DATA,
                JoinBlockDataConfig(tables=["erc20_transfers"]),
            )
        )
    return process_steps(filtered, steps)["erc20_transfers"]


def address_appearances(
    tables: Batch,
    from_block: int,
    to_block: int,
) -> DataFrame:
    """The address_appearances dataset: every (address, relationship)
    appearance count in the range, unioned across whatever tables the
    batch carries — ``transactions.from``/``.to``, ``logs.address``,
    ``traces.from``/``.to``.  One aggregated row per (address,
    relationship): ``(address, relationship, n_appearances,
    first_block, last_block)``.

    Scale shape: ONE pass per source table — a table contributing
    several address roles (transactions/traces: from AND to) emits
    them through a single explode over (relationship, address) structs
    instead of one union branch per role (r15: each branch was a
    projection-only pipeline, so Spark re-executed the scan per role —
    two full reads of the transactions table for from+to; now the
    table is read once, plan 3 Scan/4 Exchange → 2 Scan/2 Exchange at
    the registered query). The branches then union into ONE map-side-
    combinable groupBy — no joins, no windows; the block-range
    predicate lands in each scan via the shared range filter. The
    explode emits exactly the rows the per-role branches did (per-role
    null addresses are dropped by the same isNotNull, applied inside
    the array filter), so the aggregate is unchanged."""
    sources: list[DataFrame] = []

    def appearances(df, roles: list[tuple[str, str]], block_col: str):
        """One scan of ``df`` emitting (address, block_number,
        relationship) for every non-null role column; ``roles`` =
        [(addr_col, relationship), ...]."""
        in_range = df.filter(F.col(block_col).between(from_block, to_block))
        if len(roles) == 1:
            addr_col, rel = roles[0]
            return in_range.filter(F.col(addr_col).isNotNull()).select(
                F.col(addr_col).alias("address"),
                F.col(block_col).alias("block_number"),
                F.lit(rel).alias("relationship"),
            )
        pairs = F.filter(
            F.array(
                *[
                    F.struct(
                        F.lit(rel).alias("relationship"),
                        F.col(addr_col).alias("address"),
                    )
                    for addr_col, rel in roles
                ]
            ),
            lambda s: s["address"].isNotNull(),
        )
        return in_range.select(
            F.col(block_col).alias("block_number"),
            F.explode(pairs).alias("__p"),
        ).select(
            F.col("__p.address").alias("address"),
            "block_number",
            F.col("__p.relationship").alias("relationship"),
        )

    tx = tables.get("transactions")
    if tx is not None:
        roles = [(c, f"tx_{c}") for c in ("from", "to") if c in tx.columns]
        if roles:
            sources.append(appearances(tx, roles, "block_number"))
    logs = tables.get("logs")
    if logs is not None and "address" in logs.columns:
        sources.append(
            appearances(logs, [("address", "log_emitter")], "block_number")
        )
    traces = tables.get("traces")
    if traces is not None:
        roles = [(c, f"trace_{c}") for c in ("from", "to") if c in traces.columns]
        if roles:
            sources.append(appearances(traces, roles, "block_number"))
    if not sources:
        raise ValueError(
            "address_appearances needs at least one of "
            "transactions/logs/traces in the batch"
        )
    union = sources[0]
    for s in sources[1:]:
        union = union.unionByName(s)
    return union.groupBy("address", "relationship").agg(
        F.count(F.lit(1)).cast("long").alias("n_appearances"),
        F.min("block_number").cast("long").alias("first_block"),
        F.max("block_number").cast("long").alias("last_block"),
    )


def svm_swaps(
    tables: Batch,
    from_slot: int,
    to_slot: int,
    program_id: bytes,
    instruction_name: str = "swap",
    params: list | None = None,
    accounts_names: list[str] | None = None,
) -> DataFrame:
    """The SVM swaps dataset — the reference's second end-to-end
    example as one call (reference examples/jup_swap.py: instruction
    program/discriminator filter -> Borsh decode -> join blocks on
    block_slot -> join transactions on (block_slot,
    transaction_index)).

    ``program_id`` narrows the instruction scan; the Anchor
    discriminator is derived from ``instruction_name``
    (sha256('global:<name>')[:8], functions/crypto.py) exactly like
    the reference's InstructionSignature setup.  ``params`` /
    ``accounts_names`` default to a minimal swap shape
    (amount_in/min_amount_out u64; user + source/dest token
    accounts); pass the real program's layout for production.

    Plan shape: the filters land in the instructions scan (query
    model), decode is the zero-UDF Borsh expression compiler, both
    enrich joins broadcast the parent side (one row per block/tx vs
    many instructions)."""
    from cherry_spark.functions.crypto import svm_anchor_discriminator
    from cherry_spark.model import (
        InstructionRequest,
        SvmQuery,
        apply_svm_query,
    )
    from cherry_spark.operators.decode_svm import (
        InstructionSignature,
        ParamInput,
    )
    from cherry_spark.plans.config import (
        JoinTransactionDataConfig,
        SvmDecodeInstructionsConfig,
    )

    disc = svm_anchor_discriminator(instruction_name)
    q = SvmQuery(
        from_slot=from_slot,
        to_slot=to_slot,
        instructions=[
            InstructionRequest(
                program_id=[program_id],
                discriminator=[disc],
                include_blocks=True,
                include_transactions=True,
            )
        ],
    )
    filtered = apply_svm_query(tables, q)
    sig = InstructionSignature(
        discriminator=disc,
        params=params
        or [
            ParamInput("amount_in", "u64"),
            ParamInput("min_amount_out", "u64"),
        ],
        accounts_names=accounts_names
        or ["user", "source_mint", "dest_mint"],
    )
    steps = [
        Step(
            StepKind.SVM_DECODE_INSTRUCTIONS,
            SvmDecodeInstructionsConfig(
                sig,
                input_table="instructions",
                output_table="svm_swaps",
                allow_decode_fail=True,
                hstack=True,
            ),
        ),
        Step(
            StepKind.JOIN_BLOCK_DATA,
            JoinBlockDataConfig(
                tables=["svm_swaps"], join_key="block_slot", blocks_key="slot"
            ),
        ),
    ]
    if "transactions" in filtered:
        steps.append(
            Step(
                StepKind.JOIN_SVM_TRANSACTION_DATA,
                JoinTransactionDataConfig(
                    tables=["svm_swaps"],
                    on=("block_slot", "transaction_index"),
                ),
            )
        )
    return process_steps(filtered, steps)["svm_swaps"]
