"""Text analysis for training-data curation: stats, quality scoring,
language ID, token counting, fingerprinting — all native column
expressions (no UDFs; every operator is one scan + optional group-by)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cherry_spark.ext.dedup import tokens_col

# tiny per-language stopword lists for the n-gram/stopword heuristic —
# deterministic and SQL-expressible (real pipelines would broadcast a
# bigger lexicon; the operator shape is identical)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "data"],
    "de": ["der", "die", "und", "von", "daten"],
    "es": ["el", "la", "de", "los", "datos"],
    "fr": ["le", "la", "et", "de", "données"],
    "zh": ["的", "和", "是", "数据", "值"],
}


def text_stats_columns(text: Column) -> dict[str, Column]:
    """Length / word / punctuation / whitespace stats."""
    toks = tokens_col(text)
    n_chars = F.length(text)
    n_words = F.size(toks)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "alpha_ratio": F.round(n_alpha.cast("double") / n_chars, 6),
        "digit_ratio": F.round(n_digit.cast("double") / n_chars, 6),
        "punct_ratio": F.round(n_punct.cast("double") / n_chars, 6),
        "avg_word_len": F.round(
            F.aggregate(
                F.transform(toks, F.length), F.lit(0).cast("long"), lambda a, v: a + v
            ).cast("double")
            / F.greatest(n_words, F.lit(1)),
            6,
        ),
    }


def token_count(text: Column, pattern: str = r"[A-Za-z0-9]+") -> Column:
    """BPE-ish token proxy: count of alnum runs (regexp, JVM-side)."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def stopword_hits(text: Column, stopwords: list[str]) -> Column:
    toks = tokens_col(text)
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def quality_score(text: Column, stopwords: list[str] | None = None) -> Column:
    """Heuristic quality in [0,1]: penalize very short docs, low alpha
    ratio, and zero stopword presence (boilerplate/noise signals —
    the C4/Gopher-style rule family, expressed as one column)."""
    stats = text_stats_columns(text)
    sw = stopwords or LANG_STOPWORDS["en"]
    sw_ratio = stopword_hits(text, sw).cast("double") / F.greatest(
        stats["n_words"], F.lit(1)
    )
    length_term = F.least(stats["n_words"].cast("double") / 64.0, F.lit(1.0))
    score = (
        0.4 * length_term
        + 0.4 * stats["alpha_ratio"]
        + 0.2 * F.least(sw_ratio * 5.0, F.lit(1.0))
    )
    return F.round(score, 6)


def language_id(text: Column) -> Column:
    """Stopword-hit argmax over the language lexicons; deterministic
    alphabetical tiebreak; 'und' (undetermined) when no hits at all."""
    langs = sorted(LANG_STOPWORDS)
    hit_cols = {lang: stopword_hits(text, LANG_STOPWORDS[lang]) for lang in langs}
    best = F.greatest(*[hit_cols[lang] for lang in langs])
    expr = F.lit("und")
    # reversed: earlier alphabetical languages win ties (last when wins)
    for lang in reversed(langs):
        expr = F.when((best > 0) & (hit_cols[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


# PII patterns chosen for Java-regex / RE2 semantic parity: plain
# character classes and bounded repetition only — no backreferences,
# no lookaround (RE2 has neither), so both engines match identically.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_NUMBER = r"[0-9]{3,}"


def pii_scrub(text: Column) -> dict[str, Column]:
    """Redact PII-shaped spans before training: emails -> ``<EMAIL>``
    first (their local parts contain digits), then standalone digit
    runs of 3+ -> ``<NUM>``. Returns the scrubbed text plus per-doc
    redaction counts — one scan, JVM regex, no UDFs. Patterns are
    RE2-compatible so a SQL twin (DuckDB ``regexp_replace(..., 'g')``)
    produces byte-identical output."""
    n_emails = F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), 0))
    after_email = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    n_numbers = F.size(F.regexp_extract_all(after_email, F.lit(PII_NUMBER), 0))
    scrubbed = F.regexp_replace(after_email, PII_NUMBER, "<NUM>")
    return {
        "scrubbed": scrubbed,
        "n_emails": n_emails.cast("long"),
        "n_numbers": n_numbers.cast("long"),
    }


def doc_fingerprint(text: Column, modulus: int = 1_000_000_007) -> Column:
    """Order-sensitive document fingerprint: position-weighted word-hash
    sum mod p (a rolling-hash family where the per-word hash is cheap
    and SQL-portable: 31·len(w) + first-char code)."""
    toks = tokens_col(text)
    # index-aware transform: the element is PASSED to the lambda, so
    # ``toks`` is referenced exactly once — the sequence+element_at form
    # re-evaluated the tokenizer per element reference (the CLAUDE.md
    # per-ELEMENT trap: O(n_tokens * tokenize) per doc; measured
    # 6.8 s -> sub-second warm at sf0.1). Empty docs need no guard:
    # aggregate over [] is 0 and pmod(0, p) = 0.
    weighted = F.transform(
        toks,
        lambda t, i: (i + 1).cast("long")
        * (F.lit(31).cast("long") * F.length(t) + F.ascii(t)),
    )
    total = F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, v: acc + v)
    return F.pmod(total, F.lit(modulus))


def split_to_chunks(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 32,
    overlap_tokens: int = 0,
):
    """Document splitting for context-window-bounded consumers (RAG
    indexing, fixed-window training ingestion): one row per (doc,
    chunk_idx) with the chunk TEXT and its token count; optional
    token overlap gives the standard sliding window (stride =
    chunk_tokens - overlap_tokens, start positions 0, stride, 2·stride
    … < n_tokens, so the final chunk may be short but nothing is
    dropped and every token belongs to ≥1 chunk).

    Scale shape: chunks are sliced from the in-hand token array — no
    self-join, no window, no shuffle; the tokenizer result is bound
    as a lambda variable (the _stride_chunks trick) so it runs once
    per ROW, not once per chunk. Output rows ≈ corpus_tokens / stride.
    """
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    stride = chunk_tokens - overlap_tokens

    def per_doc(tk):
        n = F.size(tk)
        n_windows = F.ceil(n / F.lit(stride)).cast("int")
        return F.when(
            n > 0,
            F.transform(
                F.sequence(F.lit(0), n_windows - 1),
                lambda i: F.struct(
                    i.cast("long").alias("chunk_idx"),
                    F.concat_ws(
                        " ", F.slice(tk, i * stride + 1, chunk_tokens)
                    ).alias("chunk_text"),
                    F.least(F.lit(chunk_tokens), n - i * stride)
                    .cast("long")
                    .alias("n_chunk_tokens"),
                ),
            ),
        ).otherwise(
            F.array().cast(
                "array<struct<chunk_idx:bigint,chunk_text:string,"
                "n_chunk_tokens:bigint>>"
            )
        )

    chunks = F.flatten(F.transform(F.array(tokens_col(F.col(text_col))), per_doc))
    return (
        df.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
        )
    )


def vocab_coverage(df, ks=(10, 100, 1000), id_col: str = "doc_id",
                   text_col: str = "text"):
    """Tokenizer-design instrument: token-frequency head coverage — for
    each candidate vocab size k, the fraction of ALL token occurrences
    the k most frequent token types cover (the number that sets vocab
    size vs OOV/byte-fallback rate before training a tokenizer).

    Returns one row per k: (k, covered_tokens, total_tokens,
    n_types, coverage) with coverage = covered/total rounded 6.

    Scale shape: one tokenize+count aggregation to the vocab-sized
    type table (map-side partials absorb hot tokens), a 1-row
    total/type-count broadcast, and ONE bounded top-max(k) selection
    (TakeOrderedAndProject, deterministic (count desc, token) order)
    whose cumulative sum runs over max(ks) rows — never over the
    corpus or the full vocab.
    """
    from pyspark.sql.window import Window

    ks = sorted(set(int(k) for k in ks))
    kmax = ks[-1]
    counts = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = counts.agg(
        F.sum("n").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    top = counts.orderBy(F.col("n").desc(), F.col("tok")).limit(kmax)
    # bounded window: <= kmax rows by construction
    w = Window.orderBy(F.col("n").desc(), F.col("tok")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = top.withColumn("cum", F.sum("n").over(w)).withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("tok")))
    )
    kdf = df.sparkSession.createDataFrame([(k,) for k in ks], "k long")
    # clamp k at the actual type count: a vocab smaller than k covers
    # everything at rank n_types (the fixture corpus has a small
    # vocabulary, so this branch is exercised, not theoretical)
    kt = kdf.crossJoin(F.broadcast(totals))
    at_k = kt.join(
        ranked,
        F.col("rn") == F.least(F.col("k"), F.col("n_types"), F.lit(kmax)),
    )
    return at_k.select(
        "k",
        F.least(F.col("cum"), F.col("total_tokens"))
        .cast("long")
        .alias("covered_tokens"),
        "total_tokens",
        "n_types",
        F.round(F.col("cum").cast("double") / F.col("total_tokens"), 6).alias(
            "coverage"
        ),
    )
