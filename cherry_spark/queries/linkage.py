"""Fuzzy record-linkage queries (ext/linkage.py) over deterministic
noisy twins synthesized from the customer table — the structured-data
entity-resolution lane next to the text near-dup family.

Synthesis: every customer gets a variant record (id + 10M) whose name
drops ONE character at position 17 + custkey % 2 — inside the last
two characters, so the variant stays in its base's blocking window
(block key = (nation, first 16 name chars)) and sits at edit distance
exactly 1.  Distinct customers whose keys differ only in the last two
digits land in the same block at distance 1-2 — realistic FALSE-match
candidates the report prices (is_planted = 0 rows), exactly
reproduced by both engines because levenshtein semantics are
identical integers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_spark.catalog import query
from cherry_spark.sources.tables import load_table

_VAR_OFFSET = 10_000_000

_RECORDS_SQL = f"""
        SELECT c_custkey AS rec_id, c_name AS name,
               c_nationkey AS nat, substr(c_name, 1, 16) AS blk
        FROM customer
        UNION ALL
        SELECT c_custkey + {_VAR_OFFSET} AS rec_id,
               substr(c_name, 1, CAST(16 + c_custkey % 2 AS INTEGER))
                 || substr(c_name, CAST(18 + c_custkey % 2 AS INTEGER))
                 AS name,
               c_nationkey AS nat,
               substr(c_name, 1, 16) AS blk
        FROM customer
"""


def _records_spark(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").alias("rec_id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.substring("c_name", 1, 16).alias("blk"),
    )
    variant = cust.select(
        (F.col("c_custkey") + F.lit(_VAR_OFFSET)).alias("rec_id"),
        F.concat(
            F.expr("substring(c_name, 1, CAST(16 + c_custkey % 2 AS INT))"),
            F.expr("substring(c_name, CAST(18 + c_custkey % 2 AS INT))"),
        ).alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.substring("c_name", 1, 16).alias("blk"),
    )
    return base.unionByName(variant)


def _linkage_oracle() -> str:
    from cherry_spark.ext.linkage import blocked_linkage_pairs_sql

    body = blocked_linkage_pairs_sql(
        "records", ["nat", "blk"], "rec_id", "name", max_dist=2, max_block=1000
    )
    return f"""
    WITH records AS ({_RECORDS_SQL})
    SELECT id_a, id_b, dist,
           CAST(CASE WHEN id_b = id_a + {_VAR_OFFSET} THEN 1 ELSE 0 END
                AS INTEGER) AS is_planted
    FROM ({body})
    """


@query(
    "fuzzy_record_linkage",
    oracle=_linkage_oracle(),
    doc="Blocked fuzzy record linkage (ext/linkage.py): candidate "
    "pairs from within-(nation, name-prefix-16) blocks only — "
    "pair generation bounded by sum(block^2) with a broadcast "
    "anti-join hot-block cap (the max_shingle_freq contract), never "
    "record x record — scored with JVM-codegen levenshtein <= 2. "
    "Planted noisy twins (one char dropped in the last two positions, "
    "so they stay in their base's block) sit at distance 1 and must "
    "all appear; is_planted=0 rows are realistic cross-customer "
    "false-match candidates the report prices. All-integer score "
    "lane: identical levenshtein semantics in both engines, "
    "hash-certified.",
)
def fuzzy_record_linkage(spark, sf_dir):
    from cherry_spark.ext.linkage import blocked_linkage_pairs

    records = _records_spark(spark, sf_dir)
    pairs = blocked_linkage_pairs(
        records, ["nat", "blk"], "rec_id", "name", max_dist=2, max_block=1000
    )
    return pairs.select(
        "id_a",
        "id_b",
        "dist",
        (F.col("id_b") == F.col("id_a") + _VAR_OFFSET).cast("int").alias(
            "is_planted"
        ),
    )
