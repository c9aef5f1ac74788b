"""Corpus snapshot-diff queries (ext/versioning.py) over a
deterministic "v2" snapshot derived from the documents table — the
same fixture-synthesis pattern as queries/web.py's URLs: v2 drops
every 7th doc (removed), rewrites every remaining 5th (changed),
and appends a shifted-id clone of every 13th (added), so all four
change classes are populated at every scale factor and both engines
derive byte-identical snapshots."""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_spark.catalog import query
from cherry_spark.sources.tables import load_table

_ADD_OFFSET = 1_000_000


def _v2_spark(docs):
    d = F.col("doc_id")
    kept = docs.filter(d % 7 != 0).select(
        "doc_id",
        F.when(d % 5 == 0, F.concat(F.col("text"), F.lit(" [v2 edit]")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = docs.filter(d % 13 == 0).select(
        (d + _ADD_OFFSET).alias("doc_id"),
        F.concat(F.lit("new in v2: "), F.col("text")).alias("text"),
    )
    return kept.unionByName(added)


_V2_SQL = f"""
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0 THEN text || ' [v2 edit]' ELSE text END AS text
    FROM documents WHERE doc_id % 7 <> 0
    UNION ALL
    SELECT doc_id + {_ADD_OFFSET} AS doc_id, 'new in v2: ' || text AS text
    FROM documents WHERE doc_id % 13 = 0
"""

_DIFF_CTE = f"""
    v2 AS ({_V2_SQL}),
    o AS (SELECT doc_id, md5(text) AS old_h, LENGTH(text) AS old_len
          FROM documents),
    n AS (SELECT doc_id, md5(text) AS new_h, LENGTH(text) AS new_len FROM v2),
    d AS (
        SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.old_h IS NULL THEN 'added'
                    WHEN n.new_h IS NULL THEN 'removed'
                    WHEN o.old_h <> n.new_h THEN 'changed'
                    ELSE 'unchanged' END AS change_class,
               o.old_len, n.new_len
        FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
    )
"""


@query(
    "corpus_diff_report",
    oracle=f"""
    WITH {_DIFF_CTE}
    SELECT change_class,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(COALESCE(old_len, 0)) AS BIGINT) AS old_chars,
           CAST(SUM(COALESCE(new_len, 0)) AS BIGINT) AS new_chars
    FROM d GROUP BY 1
    """,
    doc="Snapshot-version audit (ext/versioning.py:corpus_diff_report): "
    "added/removed/changed/unchanged counts + char deltas between the "
    "corpus and its synthesized v2. Sides reduce to (id, md5, len) "
    "map-side, so the full-outer classify join shuffles 40-byte rows, "
    "never text — the property that makes a 100 TB snapshot diff move "
    "hashes, not documents.",
)
def corpus_diff_report(spark, sf_dir):
    from cherry_spark.ext.versioning import corpus_diff_report as rpt

    docs = load_table(spark, sf_dir, "documents")
    return rpt(docs, _v2_spark(docs))


@query(
    "corpus_reprocess_manifest",
    oracle=f"""
    WITH {_DIFF_CTE}
    SELECT doc_id, change_class, new_len
    FROM d WHERE change_class IN ('added', 'changed')
    """,
    doc="Incremental-refresh work list "
    "(ext/versioning.py:reprocess_manifest): the added+changed ids "
    "that must re-enter tokenize/dedup/embed stages — what makes a "
    "corpus refresh O(churn) instead of O(corpus) when fed to the "
    "delta-dedup lane.",
)
def corpus_reprocess_manifest(spark, sf_dir):
    from cherry_spark.ext.versioning import reprocess_manifest

    docs = load_table(spark, sf_dir, "documents")
    return reprocess_manifest(docs, _v2_spark(docs))
