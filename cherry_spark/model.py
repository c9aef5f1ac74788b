"""The query model: cherry's provider-side query semantics re-expressed
as scan-level DataFrame operations.

In the reference, filters/projections live in the query object and are
evaluated server-side before data crosses the network (reference
examples/erc20_custom.py:98-137, jup_swap.py:78-123). Here the same
declarative object compiles onto Parquet scans, where Catalyst pushes
the predicates into the reader — the identical data-movement win, with
no custom optimizer rule.

Semantics (reference §2.2):
- field selection: unselected columns never leave the scan (pruning);
- from_block/to_block: inclusive range on the cursor column;
- request filters: list = OR within a field, AND across fields,
  OR across requests;
- include_blocks / include_transactions: semi-join parents to matches;
- include_all_blocks: disable that semi-join for blocks.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Batch = dict[str, DataFrame]


@dataclass
class LogRequest:
    """EVM log filter (reference LogRequest, erc20_custom.py:104-120)."""

    address: list[bytes] = field(default_factory=list)
    topic0: list[bytes] = field(default_factory=list)
    topic1: list[bytes] = field(default_factory=list)
    topic2: list[bytes] = field(default_factory=list)
    topic3: list[bytes] = field(default_factory=list)
    include_blocks: bool = False
    include_transactions: bool = False


@dataclass
class InstructionRequest:
    """SVM instruction filter (reference jup_swap.py:115-122)."""

    program_id: list[bytes] = field(default_factory=list)
    discriminator: list[bytes] = field(default_factory=list)  # data prefix
    include_blocks: bool = False
    include_transactions: bool = False


@dataclass
class EvmQuery:
    from_block: int
    to_block: int | None = None  # inclusive (reference jup_swap.py:6,69)
    logs: list[LogRequest] = field(default_factory=list)
    include_all_blocks: bool = False
    fields: dict[str, list[str]] = field(default_factory=dict)  # table -> cols


@dataclass
class SvmQuery:
    from_slot: int
    to_slot: int | None = None
    instructions: list[InstructionRequest] = field(default_factory=list)
    include_all_blocks: bool = False
    fields: dict[str, list[str]] = field(default_factory=dict)


def _range_pred(col: Column, lo: int, hi: int | None) -> Column:
    pred = col >= F.lit(lo)
    if hi is not None:
        pred = pred & (col <= F.lit(hi))
    return pred


def _in_set(col: Column, values: list) -> Column | None:
    if not values:
        return None
    return col.isin(*values)


def _log_request_pred(req: LogRequest) -> Column:
    """AND across fields, OR within a field's value list."""
    conjuncts = []
    for fname in ("address", "topic0", "topic1", "topic2", "topic3"):
        c = _in_set(F.col(fname), getattr(req, fname))
        if c is not None:
            conjuncts.append(c)
    if not conjuncts:
        return F.lit(True)
    pred = conjuncts[0]
    for c in conjuncts[1:]:
        pred = pred & c
    return pred


def _instruction_request_pred(req: InstructionRequest) -> Column:
    conjuncts = []
    c = _in_set(F.col("program_id"), req.program_id)
    if c is not None:
        conjuncts.append(c)
    if req.discriminator:
        disc = None
        for d in req.discriminator:
            p = F.substring(F.col("data"), 1, len(d)) == F.lit(d)
            disc = p if disc is None else (disc | p)
        conjuncts.append(disc)
    if not conjuncts:
        return F.lit(True)
    pred = conjuncts[0]
    for c in conjuncts[1:]:
        pred = pred & c
    return pred


def _project(df: DataFrame, cols: list[str] | None) -> DataFrame:
    return df.select(*cols) if cols else df


def apply_evm_query(tables: Batch, query: EvmQuery) -> Batch:
    """Compile the query onto the batch: range + request filters +
    parent semi-joins + field projection. Everything lazy — the range
    and in-set predicates land in the Parquet scan (PushedFilters)."""
    out: Batch = {}
    blocks = tables["blocks"]
    logs = tables.get("logs")
    transactions = tables.get("transactions")

    blocks = blocks.filter(_range_pred(F.col("number"), query.from_block, query.to_block))

    matched_logs = None
    if logs is not None:
        logs = logs.filter(
            _range_pred(F.col("block_number"), query.from_block, query.to_block)
        )
        if query.logs:
            pred = _log_request_pred(query.logs[0])
            for req in query.logs[1:]:
                pred = pred | _log_request_pred(req)  # OR across requests
            matched_logs = logs.filter(pred)
        else:
            matched_logs = logs
        out["logs"] = _project(matched_logs, query.fields.get("logs"))

    want_parent_blocks = any(r.include_blocks for r in query.logs)
    if query.include_all_blocks or not want_parent_blocks or matched_logs is None:
        out["blocks"] = _project(blocks, query.fields.get("blocks"))
    else:
        out["blocks"] = _project(
            blocks.join(
                matched_logs.select(F.col("block_number").alias("number")),
                on="number",
                how="left_semi",
            ),
            query.fields.get("blocks"),
        )

    if transactions is not None:
        tx = transactions.filter(
            _range_pred(F.col("block_number"), query.from_block, query.to_block)
        )
        want_parent_tx = any(r.include_transactions for r in query.logs)
        if (
            want_parent_tx
            and matched_logs is not None
            and "transaction_index" in matched_logs.columns
        ):
            tx = tx.join(
                matched_logs.select("block_number", "transaction_index"),
                on=["block_number", "transaction_index"],
                how="left_semi",
            )
        out["transactions"] = _project(tx, query.fields.get("transactions"))

    return out


def apply_svm_query(tables: Batch, query: SvmQuery) -> Batch:
    out: Batch = {}
    blocks = tables["blocks"].filter(
        _range_pred(F.col("slot"), query.from_slot, query.to_slot)
    )
    instructions = tables.get("instructions")
    matched = None
    if instructions is not None:
        instructions = instructions.filter(
            _range_pred(F.col("block_slot"), query.from_slot, query.to_slot)
        )
        if query.instructions:
            pred = _instruction_request_pred(query.instructions[0])
            for req in query.instructions[1:]:
                pred = pred | _instruction_request_pred(req)
            matched = instructions.filter(pred)
        else:
            matched = instructions
        out["instructions"] = _project(matched, query.fields.get("instructions"))

    want_parent = any(r.include_blocks for r in query.instructions)
    if query.include_all_blocks or not want_parent or matched is None:
        out["blocks"] = _project(blocks, query.fields.get("blocks"))
    else:
        out["blocks"] = _project(
            blocks.join(
                matched.select(F.col("block_slot").alias("slot")),
                on="slot",
                how="left_semi",
            ),
            query.fields.get("blocks"),
        )

    transactions = tables.get("transactions")
    if transactions is not None:
        tx = transactions.filter(
            _range_pred(F.col("block_slot"), query.from_slot, query.to_slot)
        )
        if any(r.include_transactions for r in query.instructions) and matched is not None:
            tx = tx.join(
                matched.select("block_slot", "transaction_index"),
                on=["block_slot", "transaction_index"],
                how="left_semi",
            )
        out["transactions"] = _project(tx, query.fields.get("transactions"))
    return out
