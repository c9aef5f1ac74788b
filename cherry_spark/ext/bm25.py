"""BM25 ranked retrieval over an inverted token index.

The search-side sibling of ``ext/dedup.py:jaccard_topk`` (set overlap)
and ``ext/similarity.py:brute_force_topk`` (dense cosine): the
standard lexical relevance ranking (Robertson/Sparck Jones; the
Lucene-default ``ln(1 + (N-df+0.5)/(df+0.5))`` idf form, which is
always positive) — the retrieval step of a RAG/data-curation stack.

Scale shape (nothing corpus x corpus):

- term frequencies / doc lengths / doc frequencies are one explode +
  hash aggregates (map-side combinable);
- candidates come from the inverted index equi-join — a query only
  meets corpus docs SHARING a term, never the full corpus;
- corpus stats (N, total length) ride a broadcast 1-row aggregate;
- the final per-query ranking is the salted two-phase top-k (per
  (query, salt) k-best via ``slice(array_sort(collect_list))``, then
  an exact window over <= k * n_salt survivors) — no task ever sorts
  a query's full candidate set.

Determinism (the oracle story): BM25 scores are sums of per-term
float contributions, and engine SUM order over doubles is not
deterministic — the repo invariant forbids hash-comparing it.  So the
score lane is FIXED-POINT: each per-term contribution (a pure scalar
double expression, identical in both engines) is floored to integer
micro-units BEFORE the aggregation, and the (query, doc) score is an
order-free BIGINT sum that both engines produce bit-for-bit — the
``domain_pagerank`` trick applied to retrieval.  Ranking ties break
on doc id, a total order.  TRIAGE NOTE (the ``tfidf_top_terms``
caveat): a 1-ulp ``ln()`` divergence between libm builds could in
principle flip one floor() at an exact micro-unit boundary; bit-exact
on the shipped fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TOKS = "list_filter(string_split(text, ' '), t -> t != '')"
_SCALE = 1_000_000


def _consts(k1: float, b: float) -> tuple[str, str, str]:
    """SQL-side constants, explicitly DOUBLE (DuckDB parses a bare
    ``1.2`` as DECIMAL(2,1)) so both engines run the identical float
    arithmetic."""
    return (
        f"CAST({float(k1)!r} AS DOUBLE)",
        f"CAST({float(k1) + 1.0!r} AS DOUBLE)",
        f"CAST({float(b)!r} AS DOUBLE)",
    )


def _index_tables(
    corpus: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(tf, dl, dfreq, stats) — the BM25 inverted index, all exact
    BIGINT aggregates (so a parquet round-trip is lossless and a
    store-served search is bit-identical to inline)."""
    from cherry_spark.ext.dedup import tokens_col

    tf = (
        corpus.select(
            F.col(id_col).alias("__cid"),
            F.explode(tokens_col(F.col(text_col))).alias("term"),
        )
        .groupBy("__cid", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dl = tf.groupBy("__cid").agg(F.sum("tf").cast("long").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    return tf, dl, dfreq, stats


def bm25_build_index(
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the BM25 inverted index ONCE (tf partition-pruned by a
    term hash would be the 100 TB layout; here one parquet dir per
    table): tf (posting list), dl (doc lengths), dfreq (document
    frequencies), stats (1 row).  Searches against the store skip the
    corpus tokenize + three aggregations per run — the ivf_build_index
    'index once, query many' contract applied to lexical retrieval."""
    from cherry_spark.writers import store

    tf, dl, dfreq, stats = _index_tables(corpus, id_col, text_col)
    # pointer-version commits (writers/store.py, r13): stats last so a
    # half-built index can never look ready to bm25_index_exists
    store.publish(tf, f"{index_dir}/tf")
    store.publish(dl, f"{index_dir}/dl")
    store.publish(dfreq, f"{index_dir}/dfreq")
    store.publish(stats, f"{index_dir}/stats")


def bm25_index_exists(index_dir: str) -> bool:
    from cherry_spark.writers import store

    return all(
        store.ready(f"{index_dir}/{t}") for t in ("tf", "dl", "dfreq", "stats")
    )


def bm25_topk(
    corpus: DataFrame | None,
    query: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    n_salt: int = 64,
    index_dir: str | None = None,
) -> DataFrame:
    """Top-k BM25-ranked corpus docs per query doc.

    Returns ``(query_id, doc_id, score_fp, score)`` — ``score_fp`` is
    the exact micro-unit BIGINT the ranking is defined over,
    ``score`` its double rendering (score_fp / 1e6).

    ``index_dir``: serve tf/dl/dfreq/stats from a prebuilt
    ``bm25_build_index`` store (``corpus`` may be None) — identical
    results (the index is exact integers, lossless through parquet),
    no corpus pass per query run.
    """
    from cherry_spark.ext.dedup import tokens_col

    # doubles, never F.expr over a decimal literal (Spark SQL parses
    # "1.2" as DECIMAL(2,1), which silently changes the arithmetic)
    c_k1 = F.lit(float(k1))
    c_k1p1 = F.lit(float(k1) + 1.0)
    c_b = F.lit(float(b))

    if index_dir is not None:
        from cherry_spark.writers import store

        spark = query.sparkSession
        tf = spark.read.parquet(store.data_dir(f"{index_dir}/tf"))
        dl = spark.read.parquet(store.data_dir(f"{index_dir}/dl"))
        dfreq = spark.read.parquet(store.data_dir(f"{index_dir}/dfreq"))
        stats = spark.read.parquet(store.data_dir(f"{index_dir}/stats"))
    else:
        tf, dl, dfreq, stats = _index_tables(corpus, id_col, text_col)
    qterms = query.select(
        F.col(query_id_col).alias("__qid"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    ).distinct()

    # per-(query, candidate, term) contribution — every float op in
    # the same order as the generated oracle SQL
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + c_k1 * (
        F.lit(1.0) - c_b + c_b * (F.col("dl") / avgdl)
    )
    contrib = idf * F.col("tf") * c_k1p1 / denom
    contrib_fp = F.floor(contrib * F.lit(float(_SCALE))).cast("long")

    scored = (
        qterms.join(tf, "term")
        .join(dfreq, "term")
        .join(dl, "__cid")
        .crossJoin(F.broadcast(stats))
        .select("__qid", "__cid", contrib_fp.alias("c"))
        .groupBy("__qid", "__cid")
        .agg(F.sum("c").cast("long").alias("score_fp"))
    )

    # salted two-phase top-k: ascending struct sort == (score DESC, id)
    salt = F.pmod(F.col("__cid"), F.lit(n_salt))
    phase1 = (
        scored.groupBy(F.col("__qid"), salt.alias("__salt"))
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("score_fp")).alias("negs"),
                            F.col("__cid").alias("id"),
                        )
                    )
                ),
                1,
                k,
            ).alias("best")
        )
        .select("__qid", F.explode("best").alias("b"))
        .select(
            "__qid",
            F.col("b.id").alias("__cid"),
            (-F.col("b.negs")).alias("score_fp"),
        )
    )
    w = Window.partitionBy("__qid").orderBy(
        F.col("score_fp").desc(), F.col("__cid")
    )
    return (
        phase1.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col("__cid").alias(id_col),
            "score_fp",
            (F.col("score_fp") / F.lit(float(_SCALE))).alias("score"),
        )
    )


def bm25_topk_oracle_sql(
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    query_ids: list[int] | None = None,
) -> str:
    """DuckDB twin of :func:`bm25_topk` over the ``documents`` view,
    with the query set being the corpus docs in ``query_ids`` —
    replays the identical float-expression order and micro-unit floor,
    so the BIGINT score lane matches bit-for-bit."""
    qids = ", ".join(str(i) for i in (query_ids or [0, 1, 2]))
    s_k1, s_k1p1, s_b = _consts(k1, b)
    return f"""
    WITH tf AS (
        SELECT doc_id AS cid, t AS term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM documents, UNNEST({_TOKS}) AS u(t)
        GROUP BY 1, 2
    ),
    len AS (
        SELECT cid, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS total_len
        FROM len
    ),
    dfreq AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ),
    qt AS (
        SELECT DISTINCT doc_id AS qid, t AS term
        FROM documents, UNNEST({_TOKS}) AS u(t)
        WHERE doc_id IN ({qids})
    ),
    contrib AS (
        SELECT q.qid, tf.cid,
               CAST(FLOOR(
                   ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                   * tf.tf * {s_k1p1}
                   / (tf.tf + {s_k1} * (1.0 - {s_b} + {s_b}
                      * (l.dl / (CAST(s.total_len AS DOUBLE) / s.n_docs))))
                   * {float(_SCALE)!r}
               ) AS BIGINT) AS c
        FROM qt q
        JOIN tf ON q.term = tf.term
        JOIN dfreq d ON q.term = d.term
        JOIN len l ON tf.cid = l.cid
        CROSS JOIN stats s
    ),
    scored AS (
        SELECT qid, cid, CAST(SUM(c) AS BIGINT) AS score_fp
        FROM contrib GROUP BY 1, 2
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY qid ORDER BY score_fp DESC, cid
        ) AS rn FROM scored
    )
    SELECT qid AS query_id, cid AS doc_id, score_fp,
           score_fp / {float(_SCALE)!r} AS score
    FROM ranked WHERE rn <= {k}
    """
