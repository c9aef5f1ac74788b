"""Fuzzy record linkage (entity resolution) via blocking + edit
distance.

The structured-data sibling of the text near-dup family
(ext/dedup.py): real ingests carry the SAME entity under slightly
different spellings (OCR drops, typos, feed divergence), and the
standard resolution shape is (1) BLOCK on cheap deterministic keys so
candidate pairs come from within-block self-joins — never record x
record — then (2) score candidate pairs with an edit-distance
predicate, (3) feed surviving matches to connected components for
entity ids (ext/dedup.py:connected_components composes directly on
the (id_a, id_b) output).

Scale shape:

- pair generation is bounded by sum(|block|^2) with a HOT-BLOCK CAP:
  blocks larger than ``max_block`` are dropped from the candidate
  join via one broadcast anti-join (the ``max_shingle_freq``
  contract: the cap DEFINES the measured profile, modeled identically
  in the oracle) — a degenerate blocking key ("UNKNOWN", empty
  string) cannot fan out toward N^2;
- ``levenshtein`` is a JVM codegen scalar (identical semantics in
  DuckDB — insert/delete/substitute cost 1), so the whole score lane
  is exact integers: hash-certified cross-engine, no tolerance
  verdicts;
- the blocking join is a shuffle equi-join on the block key; skewed
  true blocks below the cap are AQE's skew-join territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_linkage_pairs(
    records: DataFrame,
    block_cols: list[str],
    id_col: str = "rec_id",
    name_col: str = "name",
    max_dist: int = 2,
    max_block: int = 1000,
) -> DataFrame:
    """Candidate match pairs: within-block (id_a < id_b) pairs with
    ``levenshtein(name_a, name_b) <= max_dist``.

    Returns ``(id_a, id_b, dist)``.  Records in blocks larger than
    ``max_block`` produce no pairs (capped profile — see module doc).
    """
    base = records.select(
        F.col(id_col).alias("__id"),
        F.col(name_col).alias("__name"),
        *[F.col(c) for c in block_cols],
    )
    hot = (
        base.groupBy(*block_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_block)
        .select(*block_cols)
    )
    capped = base.join(F.broadcast(hot), block_cols, "left_anti")
    a = capped.select(
        *block_cols,
        F.col("__id").alias("id_a"),
        F.col("__name").alias("__name_a"),
    )
    b = capped.select(
        *block_cols,
        F.col("__id").alias("id_b"),
        F.col("__name").alias("__name_b"),
    )
    return (
        a.join(b, block_cols)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("__name_a", "__name_b"))
        .where(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )


def blocked_linkage_pairs_sql(
    records_cte: str,
    block_cols: list[str],
    id_col: str = "rec_id",
    name_col: str = "name",
    max_dist: int = 2,
    max_block: int = 1000,
) -> str:
    """DuckDB twin over a CTE named ``records_cte`` with the same
    columns — replays the hot-block cap (ANTI JOIN), the blocking
    self-join, and the distance predicate identically."""
    bc = ", ".join(block_cols)
    on = " AND ".join(f"a.{c} = b.{c}" for c in block_cols)
    capped = (
        f"SELECT r.* FROM {records_cte} r ANTI JOIN ("
        f"SELECT {bc} FROM {records_cte} GROUP BY {bc} "
        f"HAVING COUNT(*) > {max_block}) h USING ({bc})"
    )
    return f"""
    SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
           CAST(levenshtein(a.{name_col}, b.{name_col}) AS INTEGER) AS dist
    FROM ({capped}) a
    JOIN ({capped}) b ON {on} AND a.{id_col} < b.{id_col}
    WHERE levenshtein(a.{name_col}, b.{name_col}) <= {max_dist}
    """
