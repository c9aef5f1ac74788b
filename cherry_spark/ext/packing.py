"""Sequence packing for LLM pretraining: concat-and-chunk assignment
of documents to fixed-length training sequences.

GPT-family pretraining concatenates the tokenized corpus in a fixed
deterministic order and slices it into ``seq_len``-token chunks; a
document therefore occupies the half-open token interval
``[start, start + n_tokens)`` of the global stream and spans chunks
``start // seq_len .. (start + n_tokens - 1) // seq_len``. The whole
operator reduces to one global exclusive prefix sum over token counts
in a deterministic order — which is exactly the part that is easy to
get wrong at scale: the naive ``SUM() OVER (ORDER BY ...)`` with no
PARTITION BY collapses 100 TB into a single window task.

Scale shape — two-phase prefix sum (the classic distributed scan):

1. order key = full md5 hex of (id || salt) — deterministic, engine-
   portable (same string in DuckDB), uniformly distributed;
2. bucket = first 2 hex chars (256 buckets). Because the bucket is a
   PREFIX of the order key, ordering by the key alone is globally
   consistent with bucket grouping — no separate range partitioner;
3. phase 1: per-bucket exclusive cumsum (window PARTITION BY bucket —
   256-way parallel, each task scans corpus/256);
4. phase 2: 256-row bucket-total table, tiny single-task window for
   bucket offsets, broadcast-joined back.

The result is bit-identical to the single-window formulation (the
oracle uses that formulation — at oracle scale it is fine), with the
widest stage parallel in the number of buckets.

No counterpart in the reference (training-pipeline extension surface);
the reference's closest concern is physical sort keys on write
(steelcake/cherry src/cherry_etl/writers, sort_by options).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_BUCKETS_HEX_CHARS = 2  # 16^2 = 256 buckets


def order_key(key: Column, salt: str = "") -> Column:
    """Deterministic global-order coordinate: full md5 hex of
    (key || salt). DuckDB twin: ``md5(CAST(key AS VARCHAR) || salt)``."""
    return F.md5(F.concat(key.cast("string"), F.lit(salt)))


def global_prefix_sum(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    salt: str = "",
    out_col: str = "start",
) -> DataFrame:
    """Adds ``out_col`` = exclusive prefix sum of ``weight_col`` in the
    deterministic global order (order_key asc, id asc) — two-phase, no
    global single-task window over the data."""
    hkey = order_key(F.col(id_col), salt)
    with_key = df.withColumn("_hkey", hkey).withColumn(
        "_bucket", F.substring(F.col("_hkey"), 1, N_BUCKETS_HEX_CHARS)
    )
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy("_hkey", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    phase1 = with_key.withColumn(
        "_prefix_in", F.coalesce(F.sum(weight_col).over(w_in), F.lit(0).cast("long"))
    )
    totals = with_key.groupBy("_bucket").agg(
        F.sum(weight_col).cast("long").alias("_tot")
    )
    # 256 rows: the single-task window runs over bucket TOTALS, never
    # over data — constant size regardless of corpus size
    w_b = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_bucket",
        F.coalesce(F.sum("_tot").over(w_b), F.lit(0).cast("long")).alias("_off"),
    )
    return (
        phase1.join(F.broadcast(offsets), "_bucket")
        .withColumn(out_col, (F.col("_off") + F.col("_prefix_in")).cast("long"))
        .drop("_hkey", "_bucket", "_prefix_in", "_off")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    seq_len: int = 512,
    salt: str = "pack",
) -> DataFrame:
    """(id, n_tokens, start_tok, first_chunk, last_chunk, n_chunks):
    concat-and-chunk packing assignment. ``div`` keeps the chunk math
    in exact long integer division (no double rounding); zero-token
    docs are pinned to the chunk at their start offset."""
    started = global_prefix_sum(df, id_col, token_col, salt=salt, out_col="start_tok")
    return started.select(
        id_col,
        F.col(token_col).cast("long").alias(token_col),
        "start_tok",
        F.expr(f"start_tok div {seq_len}").alias("first_chunk"),
        F.expr(
            f"(start_tok + greatest(cast({token_col} as bigint), 1) - 1) div {seq_len}"
        ).alias("last_chunk"),
    ).withColumn(
        "n_chunks", (F.col("last_chunk") - F.col("first_chunk") + F.lit(1)).cast("long")
    )


def shard_assignments(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "shard",
) -> DataFrame:
    """Deterministic training-order shard/position assignment: every
    data-parallel pretraining job needs (shard, position) per document
    such that workers read disjoint, stable, shuffled streams. Order =
    the same md5 global order packing uses (deterministic, engine-
    portable, uniformly shuffled); rank = the two-phase prefix sum
    with weight 1 (an exclusive count IS a 0-based rank); shard =
    rank % n_shards (round-robin — balanced to ±1 without knowing the
    corpus size), position = rank div n_shards."""
    ranked = global_prefix_sum(
        df.select(id_col).withColumn("_one", F.lit(1).cast("long")),
        id_col,
        "_one",
        salt=salt,
        out_col="rank",
    )
    return ranked.select(
        id_col,
        F.pmod(F.col("rank"), F.lit(n_shards)).cast("long").alias("shard"),
        F.expr(f"rank div {n_shards}").alias("position"),
    )


def chunk_doc_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    seq_len: int = 512,
    salt: str = "pack",
) -> DataFrame:
    """Per-(chunk, doc) token spans of the concat-and-chunk packing:
    which documents occupy which token interval of every training
    sequence — the index a loader needs to build block-diagonal
    attention masks / per-doc loss masks over packed sequences.

    One row per (chunk_id, doc) overlap: ``start_in_chunk`` inclusive,
    ``end_in_chunk`` exclusive, both in [0, seq_len]. Derived from
    :func:`pack_sequences` by exploding each doc's chunk range — a doc
    spanning c chunks yields c rows, so total rows = corpus_tokens /
    seq_len + n_docs (each boundary adds one) — linear, no joins
    beyond the prefix sum it inherits. Zero-token docs are dropped
    (they occupy no tokens; pack_sequences pins them to a chunk for
    bookkeeping, but a mask index must not emit empty spans).
    """
    packed = pack_sequences(df, id_col, token_col, seq_len, salt)
    exploded = packed.filter(F.col(token_col) > 0).select(
        id_col,
        "start_tok",
        token_col,
        F.explode(F.sequence("first_chunk", "last_chunk")).alias("chunk_id"),
    )
    chunk_start = F.col("chunk_id") * F.lit(seq_len)
    doc_end = F.col("start_tok") + F.col(token_col)
    return exploded.select(
        "chunk_id",
        id_col,
        (F.greatest(F.col("start_tok"), chunk_start) - chunk_start)
        .cast("long")
        .alias("start_in_chunk"),
        (F.least(doc_end, chunk_start + F.lit(seq_len)) - chunk_start)
        .cast("long")
        .alias("end_in_chunk"),
    )
