"""Bloom-filter membership gate queries (ext/bloom.py).

The batch is synthesized from the documents table: even doc_ids carry
their own corpus text (true duplicates — the filter may NEVER miss
them), odd doc_ids carry a provably-novel key.  Because the filter
uses the portable md5 hash family, the oracle replays every word and
every probe verdict bit-for-bit — the no-false-negative property and
the exact false-positive count are hash-certified, not asserted."""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_spark.catalog import query
from cherry_spark.sources.tables import load_table

_M_BITS = 1 << 12  # deliberately snug: ~0.3 fill at sf0.01 so the FP lane carries signal
_K = 3

_BATCH_KEY_SQL = (
    "CASE WHEN doc_id % 2 = 0 THEN text "
    "ELSE 'novel:' || CAST(doc_id AS VARCHAR) END"
)


def _batch_key_spark():
    return F.when(
        F.col("doc_id") % 2 == 0, F.col("text")
    ).otherwise(F.concat(F.lit("novel:"), F.col("doc_id").cast("string")))


def _gate_oracle() -> str:
    from cherry_spark.ext.bloom import bloom_build_sql, bloom_probe_sql

    return f"""
    WITH batch AS (
        SELECT doc_id, {_BATCH_KEY_SQL} AS key FROM documents
    ),
    bloom AS ({bloom_build_sql("text", "documents", _M_BITS, _K)}),
    verdict AS ({bloom_probe_sql(
        "key", "batch", "bloom", "doc_id", _M_BITS, _K, "maybe_in_corpus"
    )})
    SELECT b.doc_id, v.maybe_in_corpus,
           CAST(CASE WHEN b.doc_id % 2 = 0 THEN 1 ELSE 0 END AS INTEGER)
               AS is_true_dup,
           CAST(CASE WHEN v.maybe_in_corpus >=
                          CASE WHEN b.doc_id % 2 = 0 THEN 1 ELSE 0 END
                THEN 1 ELSE 0 END AS INTEGER) AS no_false_negative
    FROM batch b JOIN verdict v USING (doc_id)
    """


@query(
    "bloom_membership_gate",
    oracle=_gate_oracle(),
    doc="Portable Bloom membership gate (ext/bloom.py): MB-scale "
    "bitmap state standing in for a corpus join — build is one bit_or "
    "groupBy over the corpus keys, probe is k word lookups per batch "
    "key. Even doc_ids are planted true dups (no_false_negative must "
    "be 1 everywhere — hash-certified, the filter's defining "
    "property); odd ids are novel, where maybe_in_corpus=1 is a "
    "counted false positive that falls through to the exact path.",
)
def bloom_membership_gate(spark, sf_dir):
    from cherry_spark.ext.bloom import bloom_build, bloom_probe

    docs = load_table(spark, sf_dir, "documents")
    bloom = bloom_build(docs.select(F.col("text").alias("key")), m_bits=_M_BITS, k_hashes=_K)
    batch = docs.select("doc_id", _batch_key_spark().alias("key"))
    probed = bloom_probe(
        batch,
        bloom,
        key_col="key",
        id_col="doc_id",
        m_bits=_M_BITS,
        k_hashes=_K,
        out_col="maybe_in_corpus",
    )
    is_true = (F.col("doc_id") % 2 == 0).cast("int")
    return probed.select(
        "doc_id",
        "maybe_in_corpus",
        is_true.alias("is_true_dup"),
        (F.col("maybe_in_corpus") >= is_true).cast("int").alias(
            "no_false_negative"
        ),
    )


def _fp_oracle() -> str:
    from cherry_spark.ext.bloom import bloom_build_sql, bloom_probe_sql

    return f"""
    WITH batch AS (
        SELECT doc_id, {_BATCH_KEY_SQL} AS key FROM documents
    ),
    bloom AS ({bloom_build_sql("text", "documents", _M_BITS, _K)}),
    verdict AS ({bloom_probe_sql(
        "key", "batch", "bloom", "doc_id", _M_BITS, _K, "maybe_in_corpus"
    )})
    SELECT CAST(COUNT(*) AS BIGINT) AS n_batch,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true_dups,
           CAST(SUM(maybe_in_corpus) AS BIGINT) AS n_flagged,
           CAST(SUM(CASE WHEN doc_id % 2 <> 0 AND maybe_in_corpus = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 AND maybe_in_corpus = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg
    FROM verdict
    """


@query(
    "bloom_fp_report",
    oracle=_fp_oracle(),
    doc="Bloom gate quality report: one row of exact counts — planted "
    "dups, flagged rows, false positives (the fall-through-to-exact "
    "volume the FP rate prices), and false negatives (must be 0 by "
    "construction). Deterministic given the portable hash constants, "
    "so both engines agree bit-for-bit (ext/bloom.py).",
)
def bloom_fp_report(spark, sf_dir):
    from cherry_spark.ext.bloom import bloom_build, bloom_probe

    docs = load_table(spark, sf_dir, "documents")
    bloom = bloom_build(docs.select(F.col("text").alias("key")), m_bits=_M_BITS, k_hashes=_K)
    batch = docs.select("doc_id", _batch_key_spark().alias("key"))
    probed = bloom_probe(
        batch, bloom, key_col="key", id_col="doc_id",
        m_bits=_M_BITS, k_hashes=_K, out_col="maybe_in_corpus",
    )
    is_true = (F.col("doc_id") % 2 == 0).cast("int")
    return probed.select("doc_id", "maybe_in_corpus", is_true.alias("t")).agg(
        F.count(F.lit(1)).cast("long").alias("n_batch"),
        F.sum("t").cast("long").alias("n_true_dups"),
        F.sum("maybe_in_corpus").cast("long").alias("n_flagged"),
        F.sum(
            ((F.col("t") == 0) & (F.col("maybe_in_corpus") == 1)).cast("int")
        ).cast("long").alias("n_false_pos"),
        F.sum(
            ((F.col("t") == 1) & (F.col("maybe_in_corpus") == 0)).cast("int")
        ).cast("long").alias("n_false_neg"),
    )
