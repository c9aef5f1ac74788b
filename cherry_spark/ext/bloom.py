"""Portable distributed Bloom filter — MB-scale membership state that
stands in for a corpus-sized join.

The 100 TB story: delta/streaming dedup probes "is this key already in
the corpus?" against state that must be (a) far smaller than the
corpus and (b) shippable to every probe task.  A Bloom filter over the
corpus keys is ~1.2 GB for 10^9 keys at 1% FP — the classic trade: NO
false negatives (a "new" verdict is definite), a bounded false-positive
rate (a "maybe" verdict falls through to the exact path, e.g.
``delta_dedup``'s signature join).

Representation: ``(word_idx BIGINT, word BIGINT)`` — a bitmap packed
into 32-bit words (32, not 64: DuckDB raises on ``1 << 63``, and the
32-bit packing keeps every value positive in both engines).  Build is
one ``bit_or`` groupBy (map-side combinable); probe is an equi-join of
``k`` word lookups per key against the word table — broadcast when the
filter is small, plain shuffle join when it is not.  Persist the word
table per corpus version next to the signature stores and the build
amortizes to zero.

Hashing reuses the repo's PORTABLE md5 family
(``ext/dedup.py:_portable_hash_constants``): one md5 per key for the
60-bit base, then ``pos_i = ((a_i * (base % p) + b_i) % p) % m_bits``
— pure BIGINT arithmetic both engines execute identically, so the
entire filter (every word, every probe verdict) is replayed bit-for-bit
by the DuckDB oracles.  No tolerance verdicts needed: the "approximate"
structure is deterministic given the constants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cherry_spark.ext.dedup import _PORTABLE_P, _portable_hash_constants


def _base(key: Column) -> Column:
    return F.pmod(
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long"),
        F.lit(_PORTABLE_P),
    )


def _base_sql(expr: str) -> str:
    return (
        f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT % {_PORTABLE_P})"
    )


def _positions(base: Column, m_bits: int, k_hashes: int) -> list[Column]:
    consts = _portable_hash_constants(k_hashes)
    return [
        F.pmod(
            F.pmod(F.lit(a) * base + F.lit(b), F.lit(_PORTABLE_P)),
            F.lit(m_bits),
        )
        for (a, b) in consts
    ]


def _positions_sql(base_expr: str, m_bits: int, k_hashes: int) -> list[str]:
    consts = _portable_hash_constants(k_hashes)
    return [
        f"((({a} * {base_expr} + {b}) % {_PORTABLE_P}) % {m_bits})"
        for (a, b) in consts
    ]


def bloom_build(
    df: DataFrame,
    key_col: str = "key",
    m_bits: int = 1 << 20,
    k_hashes: int = 5,
) -> DataFrame:
    """(word_idx, word): the populated 32-bit words of the bitmap.
    ONE explode + ONE map-side-combinable bit_or groupBy; absent
    word_idx means an all-zero word."""
    pos = F.explode(
        F.array(*_positions(_base(F.col(key_col)), m_bits, k_hashes))
    ).alias("pos")
    bits = df.select(pos).select(
        (F.col("pos") / 32).cast("long").alias("word_idx"),
        # SQL shiftleft accepts a COLUMN bit count; the Python helper
        # only takes an int literal
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"
        ).alias("bit"),
    )
    return bits.groupBy("word_idx").agg(
        F.bit_or("bit").cast("long").alias("word")
    )


def bloom_build_sql(
    key_expr: str,
    table: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 5,
) -> str:
    """DuckDB CTE body replaying :func:`bloom_build` bit-for-bit —
    embed as ``bloom AS ({this})``."""
    poss = _positions_sql(_base_sql(key_expr), m_bits, k_hashes)
    arr = ", ".join(poss)
    return f"""
        SELECT CAST(pos // 32 AS BIGINT) AS word_idx,
               CAST(bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER))
                    AS BIGINT) AS word
        FROM (SELECT unnest([{arr}]) AS pos FROM {table})
        GROUP BY 1
    """


def bloom_probe(
    batch: DataFrame,
    bloom: DataFrame,
    key_col: str = "key",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k_hashes: int = 5,
    out_col: str = "maybe_in_set",
    broadcast_filter: bool = True,
) -> DataFrame:
    """``batch`` + ``out_col`` (1 = every probed bit set — key is
    possibly in the set; 0 = DEFINITELY new).  k word lookups per key
    via an equi-join on word_idx; a missing word row reads as zero."""
    pos = F.explode(
        F.array(*_positions(_base(F.col(key_col)), m_bits, k_hashes))
    ).alias("pos")
    probes = batch.select(F.col(id_col), pos).select(
        id_col,
        (F.col("pos") / 32).cast("long").alias("word_idx"),
        F.pmod(F.col("pos"), F.lit(32)).cast("int").alias("bit"),
    )
    words = F.broadcast(bloom) if broadcast_filter else bloom
    hit = F.expr(
        "CAST(shiftright(COALESCE(word, CAST(0 AS BIGINT)), bit) & 1 AS INT)"
    )
    verdict = (
        probes.join(words, "word_idx", "left")
        .select(id_col, hit.alias("__hit"))
        .groupBy(id_col)
        .agg(F.min("__hit").alias(out_col))
    )
    return batch.join(verdict, id_col)


def bloom_probe_sql(
    key_expr: str,
    batch_table: str,
    bloom_cte: str,
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k_hashes: int = 5,
    out_col: str = "maybe_in_set",
) -> str:
    """DuckDB verdict CTE body: ``({this})`` yields (id_col, out_col)
    per batch row; join back to the batch for payload columns."""
    poss = _positions_sql(_base_sql(key_expr), m_bits, k_hashes)
    arr = ", ".join(poss)
    return f"""
        SELECT {id_col}, CAST(MIN(hit) AS INTEGER) AS {out_col} FROM (
            SELECT p.{id_col},
                   CAST((COALESCE(w.word, 0) >> CAST(p.pos % 32 AS INTEGER))
                        & 1 AS INTEGER) AS hit
            FROM (SELECT {id_col}, unnest([{arr}]) AS pos
                  FROM {batch_table}) p
            LEFT JOIN {bloom_cte} w ON w.word_idx = CAST(p.pos // 32 AS BIGINT)
        ) GROUP BY 1
    """
