"""Cross-document repeated-substring span detection — the ExactSubstr
half of the standard training-data dedup recipe (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better": exact
substring matches ≥ N tokens are memorization fuel even when the DOCS
are not near-duplicates, so they are found and cut at span level).

Suffix arrays (the paper's single-node tool) don't distribute; the
equivalent distributed formulation rides on stride-1 token n-grams:

- any shared token run of length M ≥ ``min_len`` contains exactly
  M - min_len + 1 aligned stride-1 ``min_len``-grams on ONE diagonal
  (pos_a - pos_b constant), so
- gram postings (ONE pass, volume = corpus token count) self-joined on
  the gram hash find every such run, and
- a gaps-and-islands pass per (doc_a, doc_b, diagonal) merges the
  consecutive gram hits back into MAXIMAL spans — the per-window group
  is bounded by the longest shared run, never the corpus.

Scale shape: postings are linear in tokens; join fan-out per gram is
df² (df = docs containing that gram), so ``max_gram_df`` caps
stop-gram diagonals exactly like the minhash/ngram posting caps
(capped grams are dropped from pair generation and accounted in
``repeated_gram_stats``-style monitors; a run is still found if ANY of
its grams is below the cap — long runs span many grams, so only a run
made ENTIRELY of ultra-hot grams can hide).  All arithmetic is
integer/hash — the DuckDB oracle replays it bit-for-bit.

Reference parity: no counterpart (the reference has no text ops);
extends the dedup family (ext/dedup.py) at SPAN granularity — the
chunk_dedup/cdc family detects shared fixed/content-defined chunks,
this finds maximal shared runs at any alignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cherry_spark.ext.dedup import tokens_col

_SEP = "\x00"  # never inside a whitespace token


def _gram_postings(
    df: DataFrame, min_len: int, doc_col: str, text_col: str
) -> DataFrame:
    """(doc, pos, h): md5 of the SEP-joined stride-1 ``min_len``-gram
    at each 1-based token position.  The token array is bound as a
    lambda VARIABLE (flatten-transform-over-singleton) so the
    tokenizer runs once per row — slicing inside the binary transform
    sees the bound array, not a re-evaluated expression (the CLAUDE.md
    per-element-trap escape).  Docs shorter than ``min_len`` yield no
    postings (the F.sequence(1, 0)-descends guard)."""
    toks = tokens_col(F.col(text_col))
    grams = F.flatten(
        F.transform(
            F.array(toks),
            lambda tk: F.transform(
                F.when(
                    F.size(tk) >= min_len,
                    F.sequence(F.lit(1), F.size(tk) - min_len + 1),
                ).otherwise(F.expr("CAST(array() AS array<int>)")),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.md5(
                        F.concat_ws(_SEP, F.slice(tk, i, min_len))
                    ).alias("h"),
                ),
            ),
        )
    )
    return df.select(
        F.col(doc_col).alias("__doc"), F.explode(grams).alias("g")
    ).select("__doc", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))


def repeated_substring_spans(
    df: DataFrame,
    min_len: int = 8,
    doc_col: str = "doc_id",
    text_col: str = "text",
    max_gram_df: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, start_a, start_b, span_len): every MAXIMAL token
    run of length >= ``min_len`` shared by a document pair
    (doc_a < doc_b), at any alignment, overlapping runs per pair
    included (one row per diagonal island).  Positions are 1-based
    token offsets; ``span_len`` counts tokens.

    ``max_gram_df``: drop grams present in more than this many
    DOCUMENTS from pair generation (stop-gram guard — see module
    docstring for what the cap can and cannot hide)."""
    grams = _gram_postings(df, min_len, doc_col, text_col)
    if max_gram_df is not None:
        hot = (
            grams.select("h", "__doc")
            .distinct()
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_gram_df)
            .select("h")
        )
        grams = grams.join(F.broadcast(hot), "h", "left_anti")
    a = grams.select(
        F.col("h"), F.col("__doc").alias("doc_a"), F.col("pos").alias("pa")
    )
    b = grams.select(
        F.col("h"), F.col("__doc").alias("doc_b"), F.col("pos").alias("pb")
    )
    # SHUFFLE_HASH, not the default sort-merge (r15, measured on the
    # 100x corpus): the join key is a 32-char md5 with ~no duplicate
    # runs, so SMJ's two 23.6M-row string sorts dominate the whole
    # query — full query 62-70 s plain vs 10-15 s hinted, identical
    # output.  The per-partition hash build is postings/partitions,
    # which stays bounded at scale because shuffle.partitions grows
    # with the corpus; the hint is advisory (Spark falls back when it
    # cannot apply it).
    hits = (
        a.join(b.hint("SHUFFLE_HASH"), "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pa", "pb", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    # gaps-and-islands per (pair, diagonal): consecutive pa values are
    # one maximal run; pa - row_number() is constant within an island
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    islands = hits.withColumn(
        "__isl", F.col("pa") - F.row_number().over(w)
    )
    return (
        islands.groupBy("doc_a", "doc_b", "diag", "__isl")
        .agg(
            F.min("pa").alias("start_a"),
            F.min("pb").alias("start_b"),
            (F.max("pa") - F.min("pa") + F.lit(min_len)).alias("span_len"),
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("start_a").cast("long").alias("start_a"),
            F.col("start_b").cast("long").alias("start_b"),
            F.col("span_len").cast("long").alias("span_len"),
        )
    )


def repeated_substring_spans_oracle_sql(
    min_len: int = 8,
    source: str = "documents",
    id_sql: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`repeated_substring_spans` (uncapped form):
    identical tokenization, identical SEP-joined md5 gram (string_agg
    over a list slice preserves order, chr(0) == the Spark separator),
    identical diagonal islands — pure hash/integer arithmetic, so the
    compare is exact."""
    toks = "list_filter(string_split(text, ' '), t -> t != '')"
    return f"""
    WITH tk AS (
        SELECT {id_sql} AS doc, {toks} AS t FROM {source}
    ),
    grams AS (
        SELECT doc, g.i AS pos,
               md5(list_aggregate(t[g.i : g.i + {min_len} - 1],
                                  'string_agg', chr(0))) AS h
        FROM tk, UNNEST(range(1, len(t) - {min_len} + 2)) AS g(i)
        WHERE len(t) >= {min_len}
    ),
    hits AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, a.pos AS pa, b.pos AS pb,
               a.pos - b.pos AS diag
        FROM grams a JOIN grams b USING (h)
        WHERE a.doc < b.doc
    ),
    isl AS (
        SELECT *, pa - row_number() OVER (
            PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS grp
        FROM hits
    )
    SELECT doc_a, doc_b,
           CAST(MIN(pa) AS BIGINT) AS start_a,
           CAST(MIN(pb) AS BIGINT) AS start_b,
           CAST(MAX(pa) - MIN(pa) + {min_len} AS BIGINT) AS span_len
    FROM isl
    GROUP BY doc_a, doc_b, diag, grp
    """


def delta_repeated_spans(
    corpus: DataFrame | None,
    batch: DataFrame,
    min_len: int = 8,
    doc_col: str = "doc_id",
    text_col: str = "text",
    max_gram_df: int | None = None,
    corpus_grams: DataFrame | None = None,
    batch_grams: DataFrame | None = None,
) -> DataFrame:
    """Incremental ExactSubstr: every maximal token run >= ``min_len``
    a BATCH document shares with the existing CORPUS — the ingestion-
    time form of :func:`repeated_substring_spans` (the delta_dedup /
    decontaminate pattern at SPAN granularity).  Returns
    (doc_a = corpus doc, doc_b = batch doc, start_a, start_b,
    span_len); feed the result to :func:`span_overlap_verdicts` for a
    per-batch-doc gate decision or to :func:`cut_repeated_spans` to
    strip the duplicated spans from the batch before admission.

    ``corpus_grams``: the stored corpus posting table
    (``_gram_postings`` output columns ``__doc, pos, h``), computed
    once at ingest and appended as docs are admitted — the corpus side
    then contributes only the equi-join per batch and its
    tokenize+hash pipeline never re-executes (the
    ``delta_dedup(corpus_signatures=...)`` seam; with it set,
    ``corpus`` may be None).  ``batch_grams`` is the same seam for a
    gate that also folds admitted postings into the store — one
    tokenize+hash per doc per lifetime (streaming span gate).
    ``max_gram_df`` caps on the CORPUS side's doc-frequency (the
    hot-gram guard — at 100 TB the cap table is computed with the
    store, not per batch)."""
    cg = (
        corpus_grams
        if corpus_grams is not None
        else _gram_postings(corpus, min_len, doc_col, text_col)
    )
    if max_gram_df is not None:
        hot = (
            cg.select("h", "__doc")
            .distinct()
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_gram_df)
            .select("h")
        )
        cg = cg.join(F.broadcast(hot), "h", "left_anti")
    bg = (
        batch_grams
        if batch_grams is not None
        else _gram_postings(batch, min_len, doc_col, text_col)
    )
    # SHUFFLE_HASH with the BATCH side as the build (r15, same basis
    # as repeated_substring_spans): sorting the corpus-scale posting
    # side for a sort-merge join is the dominant cost; hashing the
    # bounded batch side per partition removes it
    hits = (
        cg.select("h", F.col("__doc").alias("doc_a"), F.col("pos").alias("pa"))
        .join(
            bg.select(
                "h", F.col("__doc").alias("doc_b"), F.col("pos").alias("pb")
            ).hint("SHUFFLE_HASH"),
            "h",
        )
        .select(
            "doc_a",
            "doc_b",
            "pa",
            "pb",
            (F.col("pa") - F.col("pb")).alias("diag"),
        )
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    islands = hits.withColumn("__isl", F.col("pa") - F.row_number().over(w))
    return (
        islands.groupBy("doc_a", "doc_b", "diag", "__isl")
        .agg(
            F.min("pa").alias("start_a"),
            F.min("pb").alias("start_b"),
            (F.max("pa") - F.min("pa") + F.lit(min_len)).alias("span_len"),
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("start_a").cast("long").alias("start_a"),
            F.col("start_b").cast("long").alias("start_b"),
            F.col("span_len").cast("long").alias("span_len"),
        )
    )


def _merged_cut_intervals(
    spans: DataFrame, doc_col: str
) -> DataFrame:
    """(doc_col, __cut array<struct<s,e>>): each batch/later doc's
    [start_b, start_b + span_len) intervals, start-sorted and merged
    (overlapping/adjacent intervals union via an in-row fold) — shared
    by the cut and the verdict lanes so overlap accounting can never
    double-count."""
    return (
        spans.select(
            F.col("doc_b").alias(doc_col),
            F.struct(
                F.col("start_b").alias("s"),
                (F.col("start_b") + F.col("span_len")).alias("e"),
            ).alias("iv"),
        )
        .groupBy(doc_col)
        .agg(F.sort_array(F.collect_list("iv")).alias("__ivs"))
        .select(
            doc_col,
            F.aggregate(
                "__ivs",
                F.expr(
                    "CAST(array() AS array<struct<s: bigint, e: bigint>>)"
                ),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (x["s"] <= F.element_at(acc, -1)["e"]),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(
                            F.struct(
                                F.element_at(acc, -1)["s"].alias("s"),
                                F.greatest(
                                    F.element_at(acc, -1)["e"], x["e"]
                                ).alias("e"),
                            )
                        ),
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            ).alias("__cut"),
        )
    )


def span_overlap_verdicts(
    batch: DataFrame,
    spans: DataFrame,
    overlap_frac: float = 0.5,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-batch-doc gate decision over delta spans: (doc_col,
    n_tokens, n_overlap_tokens, n_spans, verdict) — verdict is
    ``span_dup`` when the UNION of corpus-overlapping intervals covers
    more than ``overlap_frac`` of the doc's tokens, else ``unique``
    (docs with partial overlap pass the gate but carry the counts, so
    a caller can cut instead of reject).  Overlap counting rides the
    merged interval union — nested diagonals never double-count."""
    ivals = _merged_cut_intervals(spans, doc_col)
    nsp = spans.groupBy(F.col("doc_b").alias(doc_col)).agg(
        F.count(F.lit(1)).alias("__nsp")
    )
    toks = tokens_col(F.col(text_col))
    base = batch.select(
        F.col(doc_col), F.size(toks).cast("long").alias("n_tokens")
    )
    j = base.join(ivals, doc_col, "left").join(nsp, doc_col, "left")
    cut = F.coalesce(
        F.col("__cut"),
        F.expr("CAST(array() AS array<struct<s: bigint, e: bigint>>)"),
    )
    # clamp to the doc's actual length: a span can reference positions
    # past a shorter doc only if inputs disagree, but clamping keeps
    # the fraction well-defined regardless
    overlap = F.aggregate(
        cut,
        F.lit(0).cast("long"),
        lambda a, iv: a
        + F.greatest(
            F.least(iv["e"], F.col("n_tokens") + 1) - iv["s"], F.lit(0)
        ),
    )
    return j.select(
        F.col(doc_col),
        "n_tokens",
        overlap.alias("n_overlap_tokens"),
        F.coalesce(F.col("__nsp"), F.lit(0)).cast("long").alias("n_spans"),
        # exact integer gate at 1e-6 granularity: int() of the IEEE
        # product truncated (0.57*100 -> 56, a full point off) and
        # silently quantized finer fractions to percent (review r9);
        # round-to-micro keeps the comparison pure BIGINT and exact
        # for any fraction a caller plausibly passes. Products stay
        # < 2^62 for n_tokens up to ~4e12.
        F.when(
            overlap * F.lit(1_000_000)
            > F.col("n_tokens") * F.lit(int(round(overlap_frac * 1_000_000))),
            F.lit("span_dup"),
        )
        .otherwise(F.lit("unique"))
        .alias("verdict"),
    )


def cut_repeated_spans(
    df: DataFrame,
    spans: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The remediation half of ExactSubstr dedup (Lee et al. 2022 cut
    duplicated substrings, keeping ONE occurrence): for every span row
    (doc_a < doc_b), the LATER document loses tokens
    [start_b, start_b + span_len); overlapping cut intervals per doc
    are merged with an in-row sort+fold before the cut, so nested /
    overlapping diagonals never double-cut or corrupt offsets.

    Returns every input doc as ``(doc_col, text_clean, n_tokens_cut)``
    — uncut docs pass through with n_tokens_cut = 0.

    Shape: one groupBy collecting each doc's (tiny) interval list, one
    broadcast-size-agnostic equi-join back to the corpus, and the cut
    itself is an in-row ``F.filter`` over the token array with an
    ``exists`` probe of the merged interval array — no explode of
    token positions, no shuffle beyond the interval agg.  Interval
    lists are bounded by matches per doc, never corpus-sized.
    """
    ivals = _merged_cut_intervals(spans, doc_col)
    toks = tokens_col(F.col(text_col))
    src = df.select(F.col(doc_col), F.array(toks).alias("__tkw"))
    joined = src.join(ivals, on=doc_col, how="left")
    tk = F.element_at(F.col("__tkw"), 1)
    cut = F.coalesce(
        F.col("__cut"),
        F.expr("CAST(array() AS array<struct<s: bigint, e: bigint>>)"),
    )
    # F.sequence(1, 0) DESCENDS (CLAUDE.md trap): guard the empty doc
    positions = F.when(
        F.size(tk) > 0, F.sequence(F.lit(1), F.size(tk))
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    kept = F.zip_with(
        tk,
        positions,
        lambda t, i: F.when(
            ~F.exists(cut, lambda iv: (i >= iv["s"]) & (i < iv["e"])), t
        ),
    )
    return joined.select(
        F.col(doc_col),
        F.concat_ws(" ", F.filter(kept, lambda t: t.isNotNull())).alias(
            "text_clean"
        ),
        F.aggregate(
            cut, F.lit(0).cast("long"), lambda a, iv: a + (iv["e"] - iv["s"])
        ).alias("n_tokens_cut"),
    )
