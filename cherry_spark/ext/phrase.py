"""Exact-phrase search over a positional inverted index.

The retrieval family's third lane next to BM25 (bag-of-words
relevance) and jaccard_topk (set overlap): "which docs contain this
exact token sequence, and how often" — the primitive behind quoted
queries, boilerplate hunting, and contamination checks for specific
strings.

Spark-first shape, and why it scales:

- the positional index is ONE posexplode (doc_id, pos, term) — the
  standard search-engine posting list with positions;
- a phrase of ANY length m needs ONE broadcast join + ONE aggregate,
  not m-1 self-joins: each phrase term i matching a posting at
  position p votes for candidate start p−i, and a start with exactly
  m distinct votes is a complete occurrence (positions are unique per
  doc, so COUNT(*) == m suffices). Overlapping occurrences are
  counted — "table table" occurs twice in "table table table" — the
  semantics a positional index gives and a replace()-count would
  miss;
- per-doc occurrence counts aggregate by (phrase, doc); the final
  per-phrase ranking is the salted two-phase top-k (the bm25
  pattern): per (phrase, salt) k-best via slice(array_sort(
  collect_list)), then an exact window over ≤ k·n_salt survivors —
  no task sorts a phrase's full match set.

A stop-word-only phrase fans out like a hot shingle; the postings it
probes are bounded by the corpus's term frequency, same as any search
engine — cap via the caller's phrase hygiene, not silently here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def positional_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos, term) positional posting rows, pos 0-based."""
    from cherry_spark.ext.dedup import tokens_col

    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "term"),
    )


def phrase_search_topk(
    corpus: DataFrame | None,
    phrases: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    phrase_id_col: str = "phrase_id",
    phrase_col: str = "phrase",
    n_salt: int = 64,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Top-k docs per phrase by exact-occurrence count.

    Returns ``(phrase_id, doc_id, n_occurrences)`` with ties broken
    on doc_id ascending — a total order, so results are deterministic
    and oracle-comparable.

    ``postings``: a stored ``positional_postings`` table (computed
    once at ingest; exact integers/strings, lossless through parquet)
    — the per-search corpus tokenize/posexplode disappears and
    ``corpus`` may be None.
    """
    from cherry_spark.ext.dedup import tokens_col

    if postings is None:
        postings = positional_postings(corpus, id_col, text_col)
    pterms = phrases.select(
        F.col(phrase_id_col).alias("phrase_id"),
        F.size(tokens_col(F.col(phrase_col))).alias("m"),
        F.posexplode(tokens_col(F.col(phrase_col))).alias("i", "term"),
    )
    votes = (
        postings.join(F.broadcast(pterms), "term")
        .where(F.col("pos") >= F.col("i"))
        .select(
            "phrase_id",
            "doc_id",
            (F.col("pos") - F.col("i")).alias("start"),
            "m",
        )
    )
    occurrences = (
        votes.groupBy("phrase_id", "doc_id", "start", "m")
        .agg(F.count(F.lit(1)).alias("n_votes"))
        .where(F.col("n_votes") == F.col("m"))
    )
    per_doc = occurrences.groupBy("phrase_id", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    # salted two-phase top-k (bm25 pattern): ascending struct sort ==
    # (n_occurrences DESC, doc_id ASC)
    salt = F.pmod(F.col("doc_id"), F.lit(n_salt))
    phase1 = (
        per_doc.groupBy("phrase_id", salt.alias("__salt"))
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("n_occurrences")).alias("negn"),
                            F.col("doc_id").alias("id"),
                        )
                    )
                ),
                1,
                k,
            ).alias("best")
        )
        .select("phrase_id", F.explode("best").alias("b"))
        .select(
            "phrase_id",
            F.col("b.id").alias("doc_id"),
            (-F.col("b.negn")).alias("n_occurrences"),
        )
    )
    w = Window.partitionBy("phrase_id").orderBy(
        F.col("n_occurrences").desc(), F.col("doc_id")
    )
    return (
        phase1.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("phrase_id", "doc_id", "n_occurrences")
    )


def phrase_search_topk_oracle_sql(
    phrases: list[tuple[int, str]], k: int = 10, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`phrase_search_topk` — the identical
    vote/threshold/rank pipeline over a lateral positional unnest
    (integer counts only, so the hash compare is exact)."""
    values = ", ".join(
        f"(CAST({pid} AS BIGINT), '{p}')" for pid, p in phrases
    )
    return f"""
    WITH base AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x != '') AS toks
        FROM {table}
    ),
    postings AS (
        SELECT doc_id, CAST(u.i AS BIGINT) - 1 AS pos, toks[u.i] AS term
        FROM base, UNNEST(generate_series(1, len(toks))) AS u(i)
    ),
    phrases(phrase_id, phrase) AS (VALUES {values}),
    ptok AS (
        SELECT phrase_id,
               list_filter(string_split(phrase, ' '), x -> x != '') AS ptoks
        FROM phrases
    ),
    pterms AS (
        SELECT phrase_id, CAST(len(ptoks) AS BIGINT) AS m,
               CAST(u.i AS BIGINT) - 1 AS i, ptoks[u.i] AS term
        FROM ptok, UNNEST(generate_series(1, len(ptoks))) AS u(i)
    ),
    votes AS (
        SELECT pt.phrase_id, p.doc_id, p.pos - pt.i AS st, pt.m
        FROM postings p JOIN pterms pt USING (term)
        WHERE p.pos >= pt.i
    ),
    occ AS (
        SELECT phrase_id, doc_id, st, m, COUNT(*) AS n_votes
        FROM votes GROUP BY 1, 2, 3, 4
    ),
    per_doc AS (
        SELECT phrase_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM occ WHERE n_votes = m GROUP BY 1, 2
    ),
    ranked AS (
        SELECT phrase_id, doc_id, n_occurrences,
               ROW_NUMBER() OVER (
                   PARTITION BY phrase_id
                   ORDER BY n_occurrences DESC, doc_id) AS rn
        FROM per_doc
    )
    SELECT phrase_id, doc_id, n_occurrences FROM ranked WHERE rn <= {k}
    """
