"""Corpus snapshot diff — dataset-versioning support.

Training corpora ship as versioned snapshots; every refresh needs the
answer to "what changed since v1?" both as an audit report (counts and
size deltas per change class) and as a re-processing manifest (which
docs must re-enter the pipeline: tokenize/dedup/embed only the
added+changed set, not the whole corpus). This module computes both
from two snapshots keyed by doc id.

Spark-first shape: each side reduces to (id, content_hash, length)
map-side — the full-outer join that classifies rows shuffles 40-byte
records, never document bodies, so the diff of two 100 TB snapshots
moves hashes, not text. One join + one hash agg; no windows, no
driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Row-level diff of two corpus snapshots: one row per doc id in
    either snapshot with ``change_class`` ∈ {added, removed, changed,
    unchanged} plus per-side lengths (NULL on the absent side).

    Classification compares md5 content hashes, computed map-side
    before the join so the shuffle carries fixed-width rows.
    """
    o = old_df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("_old_h"),
        F.length(text_col).cast("long").alias("old_len"),
    )
    n = new_df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("_new_h"),
        F.length(text_col).cast("long").alias("new_len"),
    )
    j = o.join(n, "doc_id", "full_outer")
    cls = (
        F.when(F.col("_old_h").isNull(), F.lit("added"))
        .when(F.col("_new_h").isNull(), F.lit("removed"))
        .when(F.col("_old_h") != F.col("_new_h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select("doc_id", cls.alias("change_class"), "old_len", "new_len")


def corpus_diff_report(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Audit rollup of :func:`corpus_diff`: per change class, doc
    count and total chars on each side (0 where the side is absent)."""
    d = corpus_diff(old_df, new_df, id_col, text_col)
    return d.groupBy("change_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.coalesce(F.col("old_len"), F.lit(0))).cast("long").alias("old_chars"),
        F.sum(F.coalesce(F.col("new_len"), F.lit(0))).cast("long").alias("new_chars"),
    )


def reprocess_manifest(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The incremental-pipeline work list: ids whose content must
    re-enter processing (added or changed docs) with their new length.
    Feeding this to the delta-dedup / embedding stages instead of the
    full snapshot is what makes a corpus refresh O(churn), not
    O(corpus)."""
    d = corpus_diff(old_df, new_df, id_col, text_col)
    return d.filter(F.col("change_class").isin("added", "changed")).select(
        "doc_id", "change_class", "new_len"
    )
