"""Gopher/C4-style repetition and diversity signals for corpus
filtering: duplicate-n-gram fraction, top-n-gram dominance, distinct
token ratio, token entropy — the standard "remove boilerplate and
degenerate repetition before training" rule family (Rae et al. 2021,
"Scaling Language Models: ... Gopher", §A1.1 repetition filters).

Scale shape: one tokenize pass (posexplode + lead for 2-grams), two
hash aggregations keyed on (doc, term) then (doc) — map-side partial
counts, no self-joins, no arrays held per document. Everything is
native column expressions; a 100 TB corpus streams through.

The reference engine has no equivalent; this extends it the way the
repo's other curation operators do (ext/text.py, ext/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cherry_spark.ext.dedup import tokens_col


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition/diversity signals:

    - ``n_tokens``        total tokens
    - ``distinct_ratio``  distinct tokens / total (1.0 = no repetition)
    - ``dup_2gram_frac``  fraction of 2-gram occurrences that are
                          repeats of an earlier occurrence
    - ``top_2gram_frac``  occurrences of the most frequent 2-gram /
                          total 2-gram occurrences (dominance)
    - ``token_entropy``   Shannon entropy of the token distribution in
                          nats, ln(n) - Σ c·ln(c)/n, rounded to 6

    All ratios ROUND(·, 6): the entropy sum is a float aggregation
    whose order differs between engines in the last ulp.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "t0"),
    )
    tok_counts = toks.groupBy("id", "t0").agg(F.count(F.lit(1)).alias("c"))
    tstats = tok_counts.groupBy("id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("nd"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias(
            "slc"
        ),
    )
    w = Window.partitionBy("id").orderBy("pos")
    grams = (
        toks.select("id", "t0", F.lead("t0", 1).over(w).alias("t1"))
        .filter(F.col("t1").isNotNull())
        .select("id", F.concat_ws(" ", "t0", "t1").alias("g"))
    )
    gram_counts = grams.groupBy("id", "g").agg(F.count(F.lit(1)).alias("c"))
    gstats = gram_counts.groupBy("id").agg(
        F.sum("c").alias("tg"),
        F.count(F.lit(1)).alias("dg"),
        F.max("c").alias("topg"),
    )
    j = tstats.join(gstats, on="id", how="left")
    tg = F.col("tg")
    return j.select(
        F.col("id").alias(id_col),
        F.col("n").alias("n_tokens"),
        F.round(F.col("nd").cast("double") / F.col("n"), 6).alias("distinct_ratio"),
        F.round(
            F.when(tg > 0, F.lit(1.0) - F.col("dg").cast("double") / tg).otherwise(
                0.0
            ),
            6,
        ).alias("dup_2gram_frac"),
        F.round(
            F.when(tg > 0, F.col("topg").cast("double") / tg).otherwise(0.0), 6
        ).alias("top_2gram_frac"),
        F.round(
            F.log(F.col("n").cast("double")) - F.col("slc") / F.col("n"), 6
        ).alias("token_entropy"),
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style language-model-proxy quality score (Wenzek et al.
    2020, "CCNet: Extracting High Quality Monolingual Datasets"): fit
    a unigram MLE over the corpus itself, then score every document by
    its mean token log-probability ``mean(ln(count(tok)/N))``. Low
    scores = rare-token noise; implausibly high = boilerplate.

    Columns: ``(id_col, n_tokens, mean_logprob)`` — docs with no
    tokens return ``n_tokens = 0`` and NULL score.

    Scale shape (r15): tokenize once — the exploded token stream is
    anchored in a per-(id, tok) multiplicity aggregate whose grouping
    keys pin both columns, so the unigram table AND the scoring join
    read the SAME exchange (a bare projection referenced twice
    re-executes scan+tokenize per reference, and a repartition
    barrier is defeated by column pruning narrowing one consumer's
    subtree; grouping keys cannot be pruned). Everything downstream
    then flows at distinct-(doc, token) volume instead of occurrence
    volume: the unigram table is a rollup of the multiplicities, the
    equi-join on the token (AQE broadcasts it when the vocab is
    small) carries each (doc, token) once, and the per-doc score is
    the multiplicity-weighted sum ``Σ lp·c`` — exact DECIMAL·BIGINT
    products, so the sum is bit-identical to summing lp per
    occurrence. Interleaved A/B at sf0.1: 1.79 → 1.50 s median
    (1.54 → 1.42 min); a parallelize-repartition variant measured a
    LOSS both ways (1.93 s).

    Cross-engine determinism: each per-token log-prob is ROUND(·, 6)
    FIRST, then summed as DECIMAL(18,6) — the aggregation is exact and
    order-free, so the engines can only disagree if their ln() libms
    differ in the last ulp exactly at a rounding boundary (same
    accepted triage class as tfidf_top_terms)."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    # shared anchor: one tokenize pass, occurrence multiplicities
    tc = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("__c"))
    freq = tc.groupBy("tok").agg(F.sum("__c").alias("c"))
    total = freq.agg(F.sum("c").alias("nt"))
    lp = F.round(
        F.log(F.col("c").cast("double") / F.col("nt").cast("double")), 6
    ).cast("decimal(18,6)")
    scores = (
        tc.join(freq, on="tok")
        .crossJoin(F.broadcast(total))
        .select("id", lp.alias("lp"), "__c")
        .groupBy("id")
        .agg(
            F.sum("__c").alias("n_tokens"),
            F.sum(F.col("lp") * F.col("__c")).alias("slp"),
        )
    )
    return df.select(F.col(id_col)).join(
        scores, on=F.col(id_col) == F.col("id"), how="left"
    ).select(
        F.col(id_col),
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
        F.round(F.col("slp").cast("double") / F.col("n_tokens"), 6).alias(
            "mean_logprob"
        ),
    )


def unigram_logprob_oracle_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of ``unigram_logprob`` — generated beside the Spark
    implementation so the two cannot drift. Identical round-then-sum
    DECIMAL arithmetic; division and the final round are IEEE-identical
    once the summed decimal matches."""
    toks = f"list_filter(string_split({text_col}, ' '), t -> t != '')"
    return f"""
    WITH toks AS (
        SELECT {id_col} AS id, unnest({toks}) AS tok FROM {table}
    ),
    freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS nt FROM freq),
    per AS (
        SELECT t.id,
               CAST(round(ln(f.c::DOUBLE / n.nt::DOUBLE), 6)
                    AS DECIMAL(18,6)) AS lp
        FROM toks t JOIN freq f USING (tok) CROSS JOIN n
    ),
    sc AS (
        SELECT id, CAST(count(*) AS BIGINT) AS n_tokens, SUM(lp) AS slp
        FROM per GROUP BY 1
    )
    SELECT d.{id_col},
           COALESCE(s.n_tokens, 0) AS n_tokens,
           round(CAST(s.slp AS DOUBLE) / s.n_tokens, 6) AS mean_logprob
    FROM {table} d LEFT JOIN sc s ON s.id = d.{id_col}
    """


def dsir_logratio(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer=None,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every RAW-corpus
    document by its log importance ratio under a target-domain vs
    raw-domain unigram LM,

        log w(x) = Σ_{tokens} [ ln p_target(tok) − ln p_raw(tok) ]

    with add-1 (Laplace) smoothing over the UNION vocabulary so tokens
    unseen in the target sample never yield −inf. High-weight documents
    are the target-like subset to keep; compose with
    ``topk``/``stratified_sample``/``deterministic_sample`` for the
    actual selection (the paper's Gumbel resampling is a sampler choice
    downstream of these weights).

    Columns: ``(id_col, n_tokens, logratio)`` — empty docs return
    ``n_tokens = 0`` and NULL logratio.

    Scale shape (the DSIR design point — the raw corpus is the 100 TB
    side, the target a small domain sample): tokenize each side once;
    two O(vocab) hash aggs; ONE full-outer vocab join (vocab-sized, not
    corpus-sized); per-token ratios via an equi-join on the token (AQE
    broadcasts the vocab table); one hash agg on the doc id. No arrays
    per document, no self-joins, nothing corpus×corpus.

    Cross-engine determinism: per-token log-ratio ROUND(·, 6) FIRST,
    then summed as DECIMAL(18,6) — exact, order-free (the
    unigram_logprob contract; same last-ulp-ln triage class).

    ``tokenizer``: optional ``Column -> Column`` producing the token
    ARRAY for a text column (default: whitespace ``tokens_col``) — the
    seam for budgeting in real BPE/SentencePiece tokens: point it at a
    precomputed token-array column (``lambda _: F.col("bpe_tokens")``)
    or any expression-level tokenizer; both LMs and the per-doc scores
    then live in that token space. Oracles embed the whitespace
    default, so registered queries keep it."""
    tok_fn = tokenizer if tokenizer is not None else tokens_col
    rt = raw.select(
        F.col(id_col).alias("id"), F.explode(tok_fn(F.col(text_col))).alias("tok")
    )
    # shared anchor (r15, the unigram_logprob shape): the RAW side —
    # the 100 TB side — is tokenized ONCE; the per-(id, tok)
    # multiplicity aggregate's grouping keys pin both columns so the
    # raw-LM rollup and the scoring join read the same exchange, and
    # the scoring join carries each (doc, token) once with its count
    # instead of every occurrence. Σ lr·c is exact DECIMAL·BIGINT, so
    # scores are bit-identical to the per-occurrence sum.
    rtc = rt.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("__c"))
    tt = target.select(F.explode(tok_fn(F.col(text_col))).alias("tok"))
    rf = rtc.groupBy("tok").agg(F.sum("__c").alias("cr"))
    tf = tt.groupBy("tok").agg(F.count(F.lit(1)).alias("ct"))
    vocab = rf.join(tf, on="tok", how="full_outer").select(
        "tok",
        F.coalesce("cr", F.lit(0)).alias("cr"),
        F.coalesce("ct", F.lit(0)).alias("ct"),
    )
    totals = vocab.agg(
        F.sum("cr").alias("nr"),
        F.sum("ct").alias("nt"),
        F.count(F.lit(1)).alias("v"),
    )
    lr = F.round(
        F.log(
            (F.col("ct") + 1).cast("double") / (F.col("nt") + F.col("v")).cast("double")
        )
        - F.log(
            (F.col("cr") + 1).cast("double") / (F.col("nr") + F.col("v")).cast("double")
        ),
        6,
    ).cast("decimal(18,6)")
    scores = (
        rtc.join(vocab, on="tok")
        .crossJoin(F.broadcast(totals))
        .select("id", lr.alias("lr"), "__c")
        .groupBy("id")
        .agg(
            F.sum("__c").alias("n_tokens"),
            F.sum(F.col("lr") * F.col("__c")).alias("slr"),
        )
    )
    return (
        raw.select(F.col(id_col))
        .join(scores, on=F.col(id_col) == F.col("id"), how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.col("slr").cast("double").alias("logratio"),
        )
    )


def dsir_logratio_oracle_sql(
    target_pred: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``dsir_logratio`` with the target drawn from the
    same table by ``target_pred`` — generated beside the Spark
    implementation so the smoothing arithmetic cannot drift."""
    toks = f"list_filter(string_split({text_col}, ' '), t -> t != '')"
    return f"""
    WITH rt AS (
        SELECT {id_col} AS id, unnest({toks}) AS tok FROM {table}
    ),
    tt AS (
        SELECT unnest({toks}) AS tok FROM {table} WHERE {target_pred}
    ),
    rf AS (SELECT tok, count(*) AS cr FROM rt GROUP BY 1),
    tf AS (SELECT tok, count(*) AS ct FROM tt GROUP BY 1),
    vocab AS (
        SELECT COALESCE(rf.tok, tf.tok) AS tok,
               COALESCE(rf.cr, 0) AS cr, COALESCE(tf.ct, 0) AS ct
        FROM rf FULL OUTER JOIN tf ON rf.tok = tf.tok
    ),
    n AS (
        SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(ct) AS BIGINT) AS nt,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM vocab
    ),
    per AS (
        SELECT t.id,
               CAST(round(ln((vb.ct + 1)::DOUBLE / (n.nt + n.v)::DOUBLE)
                          - ln((vb.cr + 1)::DOUBLE / (n.nr + n.v)::DOUBLE), 6)
                    AS DECIMAL(18,6)) AS lr
        FROM rt t JOIN vocab vb USING (tok) CROSS JOIN n
    ),
    sc AS (
        SELECT id, CAST(count(*) AS BIGINT) AS n_tokens, SUM(lr) AS slr
        FROM per GROUP BY 1
    )
    SELECT d.{id_col},
           COALESCE(s.n_tokens, 0) AS n_tokens,
           CAST(s.slr AS DOUBLE) AS logratio
    FROM {table} d LEFT JOIN sc s ON s.id = d.{id_col}
    """


def bigram_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(prev, cur, c2) corpus bigram counts — the bigram LM's "model"
    table, corpus-static: build once per corpus version and serve
    every ``bigram_logprob`` scoring run from the store (exact BIGINT
    counts, lossless through parquet)."""
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    bigrams_arr = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    bg = df.select(
        F.col(id_col).alias("id"), F.explode(bigrams_arr).alias("b")
    ).select("id", F.col("b.prev").alias("prev"), F.col("b.cur").alias("cur"))
    return bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2"))


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Bigram-LM-proxy quality score: corpus bigram MLE
    ``P(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1} as context)``,
    each document scored by its mean conditional token
    log-probability — the next step up from ``unigram_logprob`` on
    the CCNet "score with a cheap LM" axis; repeated boilerplate
    transitions score implausibly high, shuffled-word noise low.

    Columns: ``(id_col, n_bigrams, mean_logprob)`` — docs with < 2
    tokens return ``n_bigrams = 0`` and NULL score.

    Scale shape: bigrams assembled array-natively from the in-hand
    token array (two shifted slices zipped — no window function, no
    per-doc shuffle), one O(distinct-bigram) count aggregate, a
    context-count aggregate derived FROM it (no second corpus pass),
    one equi-join back. Same round-then-DECIMAL-sum determinism as
    ``unigram_logprob``.

    ``counts``: a stored :func:`bigram_counts` model table — the
    "train the cheap LM once, score many corpora" seam (r9).  Model
    prep (c1 context totals + the c2⋈c1 pre-join) happens at MODEL
    size (distinct bigrams), so the corpus-scale bigram stream
    shuffles through exactly ONE join — the pre-r9 form joined it
    twice (once on (prev, cur), again on prev)."""
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    bigrams_arr = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    bg = df.select(
        F.col(id_col).alias("id"), F.explode(bigrams_arr).alias("b")
    ).select("id", F.col("b.prev").alias("prev"), F.col("b.cur").alias("cur"))
    c2 = counts if counts is not None else bigram_counts(df, id_col, text_col)
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    lp = F.round(
        F.log(F.col("c2").cast("double") / F.col("c1").cast("double")), 6
    ).cast("decimal(18,6)")
    # model-size pre-join: the corpus bigram stream meets ONE table
    model = c2.join(c1, on="prev")
    scores = (
        bg.join(model, on=["prev", "cur"])
        .select("id", lp.alias("lp"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("lp").alias("slp"))
    )
    return df.select(F.col(id_col)).join(
        scores, on=F.col(id_col) == F.col("id"), how="left"
    ).select(
        F.col(id_col),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.round(F.col("slp").cast("double") / F.col("n_bigrams"), 6).alias(
            "mean_logprob"
        ),
    )


def bigram_logprob_oracle_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of ``bigram_logprob`` — generated beside the Spark
    implementation so the two cannot drift."""
    toks = f"list_filter(string_split({text_col}, ' '), t -> t != '')"
    return f"""
    WITH bg AS (
        SELECT {id_col} AS id,
               unnest(list_transform(range(len({toks}) - 1),
                      i -> struct_pack(prev := {toks}[i + 1],
                                       cur := {toks}[i + 2]))) AS b
        FROM {table} WHERE len({toks}) >= 2
    ),
    flat AS (SELECT id, b.prev AS prev, b.cur AS cur FROM bg),
    c2 AS (SELECT prev, cur, count(*) AS c2 FROM flat GROUP BY 1, 2),
    c1 AS (SELECT prev, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
    per AS (
        SELECT f.id,
               CAST(round(ln(c2.c2::DOUBLE / c1.c1::DOUBLE), 6)
                    AS DECIMAL(18,6)) AS lp
        FROM flat f JOIN c2 USING (prev, cur) JOIN c1 USING (prev)
    ),
    sc AS (
        SELECT id, CAST(count(*) AS BIGINT) AS n_bigrams, SUM(lp) AS slp
        FROM per GROUP BY 1
    )
    SELECT d.{id_col},
           COALESCE(s.n_bigrams, 0) AS n_bigrams,
           round(CAST(s.slp AS DOUBLE) / s.n_bigrams, 6) AS mean_logprob
    FROM {table} d LEFT JOIN sc s ON s.id = d.{id_col}
    """


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    stopwords: tuple[str, ...] = ("the", "be", "to", "of", "and", "that", "have", "with"),
) -> DataFrame:
    """Gopher quality-rule document gate (Rae et al. 2021, §A1.1):
    per-document boolean verdicts for the canonical pre-training
    filters — word-count bounds, mean-word-length band, symbol-to-word
    ratio (# and ellipsis), alphabetic-word fraction, and the ≥N
    distinct-stopword plausibility check — plus the conjunction
    ``keep``.

    Columns: ``(id_col, n_words, ok_word_count, ok_mean_word_len,
    ok_symbol_ratio, ok_alpha_words, ok_stopwords, keep)`` — all
    BIGINT/int flags, so the cross-engine comparison is exact (every
    ratio is a quotient of integers, IEEE-identical in both engines;
    no libm, no rounding needed).

    Scale shape: single scan, pure native array/string expressions,
    no shuffle at all — the filter is embarrassingly parallel and
    whole-stage-codegen'd end to end."""
    words = tokens_col(F.col(text_col))
    n_words = F.size(words)
    nw = n_words.cast("double")
    mean_len = F.aggregate(
        F.transform(words, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    ).cast("double") / nw
    hash_count = F.length(F.col(text_col)) - F.length(
        F.replace(F.col(text_col), F.lit("#"), F.lit(""))
    )
    ellipsis_count = (
        F.length(F.col(text_col))
        - F.length(F.replace(F.col(text_col), F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = (hash_count + ellipsis_count).cast("double") / nw
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("double") / nw
    )
    stop_hits = F.size(
        F.array_intersect(
            F.transform(words, F.lower), F.array(*[F.lit(s) for s in stopwords])
        )
    )
    flags = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_word_len": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "ok_symbol_ratio": symbol_ratio < max_symbol_ratio,
        "ok_alpha_words": alpha_frac >= min_alpha_word_frac,
        "ok_stopwords": stop_hits >= min_stopword_hits,
    }
    guarded = {
        k: F.when(n_words > 0, v).otherwise(F.lit(False)) for k, v in flags.items()
    }
    keep = None
    for v in guarded.values():
        keep = v if keep is None else (keep & v)
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        *[v.cast("int").alias(k) for k, v in guarded.items()],
        keep.cast("int").alias("keep"),
    )


def gopher_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    stopwords: tuple[str, ...] = ("the", "be", "to", "of", "and", "that", "have", "with"),
) -> str:
    """DuckDB twin of ``gopher_rules`` — generated beside the Spark
    implementation from the same thresholds so the two cannot drift."""
    toks = f"list_filter(string_split({text_col}, ' '), t -> t != '')"
    stoplist = ", ".join(f"'{s}'" for s in stopwords)
    return f"""
    WITH base AS (
        SELECT {id_col},
               len({toks}) AS n_words,
               list_sum(list_transform({toks}, t -> length(t)))::DOUBLE
                   / len({toks}) AS mean_len,
               ((length({text_col})
                 - length(replace({text_col}, '#', '')))
                + (length({text_col})
                   - length(replace({text_col}, '...', ''))) / 3)::DOUBLE
                   / len({toks}) AS symbol_ratio,
               len(list_filter({toks}, t -> regexp_matches(t, '[A-Za-z]')))::DOUBLE
                   / len({toks}) AS alpha_frac,
               len(list_intersect(list_transform({toks}, t -> lower(t)),
                                  [{stoplist}])) AS stop_hits
        FROM {table}
    )
    SELECT {id_col},
           CAST(n_words AS BIGINT) AS n_words,
           CASE WHEN n_words > 0 AND n_words >= {min_words}
                     AND n_words <= {max_words}
                THEN 1 ELSE 0 END AS ok_word_count,
           CASE WHEN n_words > 0 AND mean_len >= {min_mean_word_len}
                     AND mean_len <= {max_mean_word_len}
                THEN 1 ELSE 0 END AS ok_mean_word_len,
           CASE WHEN n_words > 0 AND symbol_ratio < {max_symbol_ratio}
                THEN 1 ELSE 0 END AS ok_symbol_ratio,
           CASE WHEN n_words > 0 AND alpha_frac >= {min_alpha_word_frac}
                THEN 1 ELSE 0 END AS ok_alpha_words,
           CASE WHEN n_words > 0 AND stop_hits >= {min_stopword_hits}
                THEN 1 ELSE 0 END AS ok_stopwords,
           CASE WHEN n_words > 0 AND n_words >= {min_words}
                     AND n_words <= {max_words}
                     AND mean_len >= {min_mean_word_len}
                     AND mean_len <= {max_mean_word_len}
                     AND symbol_ratio < {max_symbol_ratio}
                     AND alpha_frac >= {min_alpha_word_frac}
                     AND stop_hits >= {min_stopword_hits}
                THEN 1 ELSE 0 END AS keep
    FROM base
    """


def repetition_oracle_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of ``repetition_stats`` — generated beside the Spark
    implementation so the two cannot drift. Identical count arithmetic;
    the only float aggregate (entropy) is rounded to 6 on both sides."""
    toks = f"list_filter(string_split({text_col}, ' '), t -> t != '')"
    return f"""
    WITH toks AS (
        SELECT {id_col} AS id, unnest({toks}) AS tok FROM {table}
    ),
    tc AS (SELECT id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
    tstats AS (
        SELECT id, CAST(SUM(c) AS BIGINT) AS n, count(*) AS nd,
               SUM(c::DOUBLE * ln(c::DOUBLE)) AS slc
        FROM tc GROUP BY 1
    ),
    grams AS (
        SELECT {id_col} AS id,
               unnest(list_transform(
                   range(greatest(len({toks}) - 1, 0)),
                   i -> concat_ws(' ', {toks}[i+1], {toks}[i+2])
               )) AS g
        FROM {table}
    ),
    gc AS (SELECT id, g, count(*) AS c FROM grams GROUP BY 1, 2),
    gstats AS (
        SELECT id, CAST(SUM(c) AS BIGINT) AS tg, count(*) AS dg,
               CAST(MAX(c) AS BIGINT) AS topg
        FROM gc GROUP BY 1
    )
    SELECT t.id AS {id_col},
           t.n AS n_tokens,
           round(t.nd::DOUBLE / t.n, 6) AS distinct_ratio,
           round(CASE WHEN g.tg > 0 THEN 1.0 - g.dg::DOUBLE / g.tg
                      ELSE 0.0 END, 6) AS dup_2gram_frac,
           round(CASE WHEN g.tg > 0 THEN g.topg::DOUBLE / g.tg
                      ELSE 0.0 END, 6) AS top_2gram_frac,
           round(ln(t.n::DOUBLE) - t.slc / t.n, 6) AS token_entropy
    FROM tstats t LEFT JOIN gstats g USING (id)
    """


# hashing-trick linear classifier constants: ONE portable linear hash
# (the certified dedup family pattern) maps tokens -> weight buckets,
# and the bucket's weight is itself derived by a second linear map —
# both pure BIGINT, generated identically in the SQL twin.
_CLF_MOD = 2_147_483_647  # 2^31 - 1
_CLF_A, _CLF_B = 1_103_515_245, 12_345


def hashed_classifier_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 16,
    threshold: float = 0.0,
) -> DataFrame:
    """fastText-style MODEL-BASED quality gate: score = mean over
    tokens of a hashed-bucket weight (a linear text classifier's
    inference pass with the hashing trick), keep iff score > threshold.

    This is the inference shape of CCNet/RedPajama-style quality
    classifiers: the 100 TB side only ever does tokenize -> hash ->
    weight lookup -> per-doc mean. Here the weight table is a
    DETERMINISTIC function of the bucket (a linear map into [-1, 1)),
    so the full path — including the exact integer logit sum — is
    engine-portable and driver-certified; swapping in real trained
    weights replaces one expression with a broadcast join against a
    (n_buckets)-row weight table and changes nothing else in the plan.

    Integer-exact aggregation: the per-token weight is kept as a
    BIGINT in [0, 2^31-1) and summed exactly; only the final
    normalization divides into a double (IEEE division is exactly
    rounded, so cross-engine hash-compare is safe — no transcendental
    sigmoid in the certified columns).

    Returns (id, n_tokens, score, keep).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(F.col(text_col))).alias("tok"),
    )
    base = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    bucket = F.pmod(base, F.lit(int(n_buckets)))
    w_int = F.pmod(
        F.lit(_CLF_A) * bucket + F.lit(_CLF_B), F.lit(_CLF_MOD)
    )  # BIGINT in [0, MOD); products < 2^48 — ANSI-safe
    agg = toks.select("id", w_int.alias("w")).groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("w").cast("long").alias("wsum"),
    )
    # mean weight mapped to [-1, 1): exact integer sum, ONE division
    score = (
        F.col("wsum").cast("double") / F.col("n_tokens") / (_CLF_MOD / 2.0) - 1.0
    )
    return agg.select(
        F.col("id"),
        "n_tokens",
        F.round(score, 6).alias("score"),
        (F.round(score, 6) > F.lit(threshold)).cast("int").alias("keep"),
    )


def hashed_classifier_oracle_sql(
    n_buckets: int = 1 << 16,
    threshold: float = 0.0,
    source: str = "documents",
    id_sql: str = "doc_id",
) -> str:
    """DuckDB twin generated from the SAME constants."""
    toks = "list_filter(string_split(text, ' '), t -> t != '')"
    return f"""
    WITH toks AS (
        SELECT {id_sql} AS id, u.tok
        FROM {source}, UNNEST({toks}) AS u(tok)
    ),
    w AS (
        SELECT id,
               ({_CLF_A} * (('0x' || substr(md5(tok), 1, 15))::BIGINT
                            % {int(n_buckets)}) + {_CLF_B}) % {_CLF_MOD} AS wv
        FROM toks
    ),
    agg AS (
        SELECT id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(wv) AS BIGINT) AS wsum
        FROM w GROUP BY id
    )
    SELECT id, n_tokens,
           round(CAST(wsum AS DOUBLE) / n_tokens / {_CLF_MOD / 2.0!r} - 1.0, 6)
               AS score,
           CAST(round(CAST(wsum AS DOUBLE) / n_tokens / {_CLF_MOD / 2.0!r} - 1.0, 6)
                > {threshold!r} AS INTEGER) AS keep
    FROM agg
    """
