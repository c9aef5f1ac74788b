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
class TraceRequest:
    """EVM call-trace filter (the public HyperSync trace query surface;
    the reference declares the traces table in
    EvmValidateBlockDataConfig, config.py:121-125)."""

    from_address: list[bytes] = field(default_factory=list)
    to_address: list[bytes] = field(default_factory=list)
    call_type: list[str] = field(default_factory=list)
    sighash: list[bytes] = field(default_factory=list)
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
class SvmLogRequest:
    """SVM log filter (program + log kind; the reference's SVM log
    family — SvmDecodeLogsConfig input table, config.py:155-160)."""

    program_id: list[bytes] = field(default_factory=list)
    kind: list[str] = field(default_factory=list)
    include_blocks: bool = False
    include_transactions: bool = False


@dataclass
class EvmQuery:
    from_block: int
    to_block: int | None = None  # inclusive (reference jup_swap.py:6,69)
    logs: list[LogRequest] = field(default_factory=list)
    traces: list[TraceRequest] = field(default_factory=list)
    include_all_blocks: bool = False
    fields: dict[str, list[str]] = field(default_factory=dict)  # table -> cols


@dataclass
class SvmQuery:
    from_slot: int
    to_slot: int | None = None
    instructions: list[InstructionRequest] = field(default_factory=list)
    logs: list[SvmLogRequest] = field(default_factory=list)
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


def _trace_request_pred(req: TraceRequest) -> Column:
    """AND across fields, OR within a field's value list."""
    conjuncts = []
    for fname, col in (
        ("from_address", "from"),
        ("to_address", "to"),
        ("call_type", "call_type"),
        ("sighash", "sighash"),
    ):
        c = _in_set(F.col(col), getattr(req, fname))
        if c is not None:
            conjuncts.append(c)
    if not conjuncts:
        return F.lit(True)
    pred = conjuncts[0]
    for c in conjuncts[1:]:
        pred = pred & c
    return pred


def _svm_log_request_pred(req: SvmLogRequest) -> Column:
    conjuncts = []
    for fname, col in (("program_id", "program_id"), ("kind", "kind")):
        c = _in_set(F.col(col), getattr(req, fname))
        if c is not None:
            conjuncts.append(c)
    if not conjuncts:
        return F.lit(True)
    pred = conjuncts[0]
    for c in conjuncts[1:]:
        pred = pred & c
    return pred


def _or_requests(df: DataFrame, requests: list, pred_fn) -> DataFrame:
    """OR across requests; no requests = match all."""
    if not requests:
        return df
    pred = pred_fn(requests[0])
    for req in requests[1:]:
        pred = pred | pred_fn(req)
    return df.filter(pred)


def _project(df: DataFrame, cols: list[str] | None) -> DataFrame:
    return df.select(*cols) if cols else df


def _semi_join_union(
    parent: DataFrame, keys: list[str], children: list[DataFrame]
) -> DataFrame:
    """Semi-join ``parent`` against the union of child key sets."""
    child_keys = children[0].select(*keys)
    for c in children[1:]:
        child_keys = child_keys.unionByName(c.select(*keys))
    return parent.join(child_keys, on=keys, how="left_semi")


def apply_evm_query(tables: Batch, query: EvmQuery) -> Batch:
    """Compile the query onto the batch: range + request filters +
    parent semi-joins + field projection. Everything lazy — the range
    and in-set predicates land in the Parquet scan (PushedFilters).
    Child families: logs (LogRequest) and traces (TraceRequest —
    reference declares the traces table in config.py:121-125)."""
    out: Batch = {}
    blocks = tables.get("blocks")  # a child-only batch is legitimate
    transactions = tables.get("transactions")

    if blocks is not None:
        blocks = blocks.filter(
            _range_pred(F.col("number"), query.from_block, query.to_block)
        )

    block_parents: list[DataFrame] = []  # matched children wanting blocks
    tx_parents: list[DataFrame] = []  # matched children wanting transactions

    for table, requests, pred_fn in (
        ("logs", query.logs, _log_request_pred),
        ("traces", query.traces, _trace_request_pred),
    ):
        child = tables.get(table)
        if child is None:
            continue
        child = child.filter(
            _range_pred(F.col("block_number"), query.from_block, query.to_block)
        )
        matched = _or_requests(child, requests, pred_fn)
        out[table] = _project(matched, query.fields.get(table))
        if any(r.include_blocks for r in requests):
            block_parents.append(matched.select(F.col("block_number").alias("number")))
        if any(r.include_transactions for r in requests) and (
            "transaction_index" in matched.columns
        ):
            tx_parents.append(matched)

    if blocks is not None:
        if query.include_all_blocks or not block_parents:
            out["blocks"] = _project(blocks, query.fields.get("blocks"))
        else:
            out["blocks"] = _project(
                _semi_join_union(blocks, ["number"], block_parents),
                query.fields.get("blocks"),
            )

    if transactions is not None:
        tx = transactions.filter(
            _range_pred(F.col("block_number"), query.from_block, query.to_block)
        )
        if tx_parents:
            tx = _semi_join_union(tx, ["block_number", "transaction_index"], tx_parents)
        out["transactions"] = _project(tx, query.fields.get("transactions"))

    return out


def apply_svm_query(tables: Batch, query: SvmQuery) -> Batch:
    """SVM analogue; child families: instructions (InstructionRequest)
    and logs (SvmLogRequest — the reference's SVM log family,
    config.py:155-160)."""
    out: Batch = {}
    blocks = tables["blocks"].filter(
        _range_pred(F.col("slot"), query.from_slot, query.to_slot)
    )

    block_parents: list[DataFrame] = []
    tx_parents: list[DataFrame] = []

    for table, requests, pred_fn in (
        ("instructions", query.instructions, _instruction_request_pred),
        ("logs", query.logs, _svm_log_request_pred),
    ):
        child = tables.get(table)
        if child is None:
            continue
        child = child.filter(
            _range_pred(F.col("block_slot"), query.from_slot, query.to_slot)
        )
        matched = _or_requests(child, requests, pred_fn)
        out[table] = _project(matched, query.fields.get(table))
        if any(r.include_blocks for r in requests):
            block_parents.append(matched.select(F.col("block_slot").alias("slot")))
        if any(r.include_transactions for r in requests) and (
            "transaction_index" in matched.columns
        ):
            tx_parents.append(matched)

    if query.include_all_blocks or not block_parents:
        out["blocks"] = _project(blocks, query.fields.get("blocks"))
    else:
        out["blocks"] = _project(
            _semi_join_union(blocks, ["slot"], block_parents),
            query.fields.get("blocks"),
        )

    transactions = tables.get("transactions")
    if transactions is not None:
        tx = transactions.filter(
            _range_pred(F.col("block_slot"), query.from_slot, query.to_slot)
        )
        if tx_parents:
            tx = _semi_join_union(tx, ["block_slot", "transaction_index"], tx_parents)
        out["transactions"] = _project(tx, query.fields.get("transactions"))
    return out
