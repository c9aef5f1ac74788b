"""Repetition stats (ext/quality.py), stratified sampling, PII scrub,
chunk-level dedup — planted-case unit tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cherry_spark.ext.dedup import chunk_dedup_stats
from cherry_spark.ext.quality import repetition_stats
from cherry_spark.ext.sampling import stratified_sample
from cherry_spark.ext.text import pii_scrub


def test_repetition_stats_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # degenerate repetition
            (2, "w x y z"),          # fully diverse
            (3, "p q p q p q"),      # alternating: every 2-gram repeated
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    r1 = got[1]
    assert r1["n_tokens"] == 4 and r1["distinct_ratio"] == 0.25
    # 3 occurrences of one 2-gram "a a": dup frac 1 - 1/3, dominance 1
    assert r1["dup_2gram_frac"] == round(1 - 1 / 3, 6)
    assert r1["top_2gram_frac"] == 1.0
    assert r1["token_entropy"] == 0.0
    r2 = got[2]
    assert r2["distinct_ratio"] == 1.0 and r2["dup_2gram_frac"] == 0.0
    assert r2["token_entropy"] == round(math.log(4), 6)
    r3 = got[3]
    # 5 2-grams, 2 distinct ("p q" x3, "q p" x2)
    assert r3["dup_2gram_frac"] == round(1 - 2 / 5, 6)
    assert r3["top_2gram_frac"] == round(3 / 5, 6)


def test_stratified_sample_quota_and_stability(spark):
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g")
    )
    s = stratified_sample(df, "g", "k", 10, salt="t")
    counts = {r["g"]: r["n"] for r in
              s.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n == 10 for n in counts.values()) and len(counts) == 7
    # pure function of the key: identical under repartition
    a = {(r["g"], r["k"]) for r in s.collect()}
    b = {(r["g"], r["k"])
         for r in stratified_sample(df.repartition(13, "k"), "g", "k", 10,
                                    salt="t").collect()}
    assert a == b
    # smaller quotas are prefixes of larger ones
    small = {(r["g"], r["k"])
             for r in stratified_sample(df, "g", "k", 5, salt="t").collect()}
    assert small <= a


def test_pii_scrub_planted(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@foo-bar.org or 4155551234 ext 42 pin 007")],
        "doc_id long, text string",
    )
    cols = pii_scrub(F.col("text"))
    row = df.select(
        cols["scrubbed"].alias("s"), cols["n_emails"].alias("e"),
        cols["n_numbers"].alias("n"),
    ).collect()[0]
    assert row["e"] == 1 and row["n"] == 2  # 4155551234 and 007; 42 kept
    assert row["s"] == "mail <EMAIL> or <NUM> ext 42 pin <NUM>"


def test_chunk_dedup_planted(spark):
    shared = "one two three four five six seven eight"  # exactly one chunk
    df = spark.createDataFrame(
        [
            (1, shared + " tail a b c"),
            (2, shared + " other words here now"),
            (3, "totally different text with no repeats at all"),
        ],
        "doc_id long, text string",
    )
    rows = chunk_dedup_stats(df, chunk_tokens=8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_docs"] == 2 and r["n_occurrences"] == 2 and r["first_doc_id"] == 1


def test_unigram_logprob_planted(spark):
    """Hand-computed corpus: freq(a)=2, freq(b)=1, freq(c)=1, N=4.
    doc1 'a a b' -> mean(2*ln(1/2) + ln(1/4))/3 on round-6 terms;
    doc2 'c' -> ln(1/4); doc3 empty -> 0 tokens, NULL score."""
    import math

    from cherry_spark.ext.quality import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "c"), (3, "")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert set(out) == {1, 2, 3}
    lp_half = round(math.log(2 / 4), 6)
    lp_quarter = round(math.log(1 / 4), 6)
    assert out[1]["n_tokens"] == 3
    assert out[1]["mean_logprob"] == round((2 * lp_half + lp_quarter) / 3, 6)
    assert out[2]["n_tokens"] == 1
    assert out[2]["mean_logprob"] == round(lp_quarter, 6)
    assert out[3]["n_tokens"] == 0
    assert out[3]["mean_logprob"] is None


def test_chunk_dedup_rewrite_planted(spark):
    """First-occurrence-wins rewrite with 2-token chunks:
    d1 'a b c d a b' -> chunks [ab, cd, ab]: keeps [ab, cd] (its own
    in-doc repeat dropped); d2 'c d x y' -> [cd, xy]: cd already owned
    by d1 -> keeps [xy]; d3 'a b' -> []; d4 '' -> no chunks."""
    from cherry_spark.ext.dedup import chunk_dedup_rewrite

    df = spark.createDataFrame(
        [(1, "a b c d a b"), (2, "c d x y"), (3, "a b"), (4, "")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["kept_text"], r["n_chunks"], r["n_kept"])
        for r in chunk_dedup_rewrite(df, chunk_tokens=2).collect()
    }
    assert out[1] == ("a b c d", 3, 2)
    assert out[2] == ("x y", 2, 1)
    assert out[3] == ("", 1, 0)
    assert out[4] == ("", 0, 0)


def test_chunk_dedup_rewrite_idempotent(spark):
    """Invariant: rewriting an already-rewritten corpus is the
    identity — after the first pass every surviving chunk text is
    unique corpus-wide, so a second pass keeps everything (the
    re-chunking of kept_text reproduces the kept chunk sequence
    exactly: only doc-final chunks are short, so concatenation stays
    8-token aligned)."""
    from cherry_spark.ext.dedup import chunk_dedup_rewrite
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    first = chunk_dedup_rewrite(docs, chunk_tokens=8).filter(
        F.col("kept_text") != ""
    )
    second = chunk_dedup_rewrite(
        first.select("doc_id", F.col("kept_text").alias("text")), chunk_tokens=8
    )
    assert second.filter(F.col("n_kept") != F.col("n_chunks")).count() == 0
    texts1 = {r["kept_text"] for r in first.collect()}
    texts2 = {r["kept_text"] for r in second.collect()}
    assert texts1 == texts2


def test_cdc_chunk_rewrite_collapses_shifted_passage(spark):
    """The round-7 operator's reason to exist: a one-token prepend
    defeats the fixed-stride REWRITE (every 8-token chunk shifts, so
    the whole duplicated passage survives in doc 2), while the
    CDC-boundary rewrite realigns after the insertion point and
    collapses it."""
    from cherry_spark.ext.dedup import cdc_chunk_rewrite, chunk_dedup_rewrite

    passage = " ".join(f"tok{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, passage), (2, "shifted " + passage)], ["doc_id", "text"]
    )
    fixed = {
        r["doc_id"]: r for r in chunk_dedup_rewrite(df, chunk_tokens=8).collect()
    }
    cdc = {
        r["doc_id"]: r
        for r in cdc_chunk_rewrite(df, window=3, divisor=8).collect()
    }
    # fixed stride: doc 2's shifted chunks are all textually new -> the
    # duplicated passage survives the rewrite in full
    assert fixed[2]["n_kept"] == fixed[2]["n_chunks"]
    # CDC: doc 1 (first occurrence) keeps everything; doc 2 loses every
    # chunk after boundary realignment — most of the passage collapses
    assert cdc[1]["n_kept"] == cdc[1]["n_chunks"]
    assert cdc[2]["n_kept"] < cdc[2]["n_chunks"]
    kept_tokens = [t for t in cdc[2]["kept_text"].split(" ") if t]
    assert len(kept_tokens) < 41 / 2  # more than half the copy removed
    # and the survivors are only the prefix region around the insertion
    assert "shifted" in kept_tokens


def test_cdc_chunk_rewrite_unique_corpus_is_identity(spark):
    """Invariant: with no duplicated chunk anywhere, the rewrite is
    the identity (kept_text reassembles to the original tokenized
    text, n_kept == n_chunks)."""
    from cherry_spark.ext.dedup import cdc_chunk_rewrite

    df = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(17))) for i in range(6)]
        + [(99, "")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in cdc_chunk_rewrite(df).collect()}
    for i in range(6):
        assert out[i]["kept_text"] == " ".join(f"w{i}_{j}" for j in range(17))
        assert out[i]["n_kept"] == out[i]["n_chunks"] > 0
    assert out[99]["kept_text"] == "" and out[99]["n_chunks"] == 0


def test_dsir_self_target_is_zero(spark):
    """Invariant: with target == raw the two smoothed LMs coincide, so
    every per-token log-ratio rounds to exactly 0 and every non-empty
    document scores 0.0."""
    from cherry_spark.ext.quality import dsir_logratio
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = dsir_logratio(docs, docs)
    assert out.filter(F.col("n_tokens") > 0).filter(
        F.col("logratio") != 0.0
    ).count() == 0


def test_dsir_logratio_planted(spark):
    """Hand-computed DSIR weights. Raw: d1 'a a b', d2 'c', d3 ''.
    Target: 'a'. Union vocab {a,b,c}, V=3; cr(a)=2,cr(b)=cr(c)=1,
    NR=4; ct(a)=1, ct(b)=ct(c)=0, NT=1. Smoothed:
    lr(a)=ln(2/4)−ln(3/7)=ln(7/6); lr(b)=lr(c)=ln(1/4)−ln(2/7)=ln(7/8).
    An a-heavy doc scores positive (target-like), others negative."""
    import math

    from cherry_spark.ext.quality import dsir_logratio

    raw = spark.createDataFrame(
        [(1, "a a b"), (2, "c"), (3, "")], ["doc_id", "text"]
    )
    target = spark.createDataFrame([(100, "a")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dsir_logratio(raw, target).collect()}
    lr_a = round(math.log(2 / 4) - math.log(3 / 7), 6)
    lr_bc = round(math.log(1 / 4) - math.log(2 / 7), 6)
    assert set(out) == {1, 2, 3}
    assert out[1]["n_tokens"] == 3
    assert out[1]["logratio"] == round(2 * lr_a + lr_bc, 6)
    assert out[1]["logratio"] > 0  # target-like
    assert out[2]["logratio"] == lr_bc and out[2]["logratio"] < 0
    assert out[3]["n_tokens"] == 0 and out[3]["logratio"] is None


def test_gopher_rules_planted(spark):
    """Each rule is exercised by a doc failing exactly that rule."""
    from cherry_spark.ext.quality import gopher_rules

    good = "the quick brown fox jumps over that lazy dog with style and have grace of motion"
    docs = [
        (1, good),                                    # passes all (16 words >= 5)
        (2, "the of and"),                            # too few words at min_words=5
        (3, "## ## ## the cat sat of it and"),        # symbol ratio
        (4, "12 34 56 78 the 90 11 of 22 and 33"),    # alpha fraction
        (5, "zebra quartz viper echoes nimbly"),      # no stopwords
        (6, ""),                                      # empty -> all fail
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in gopher_rules(df, min_words=5).collect()}
    assert out[1]["keep"] == 1
    assert out[2]["ok_word_count"] == 0 and out[2]["keep"] == 0
    assert out[3]["ok_symbol_ratio"] == 0 and out[3]["keep"] == 0
    assert out[4]["ok_alpha_words"] == 0 and out[4]["keep"] == 0
    assert out[5]["ok_stopwords"] == 0 and out[5]["keep"] == 0
    assert out[6]["n_words"] == 0 and out[6]["keep"] == 0


def test_cdc_chunks_realign_after_insertion(spark):
    """The CDC selling point: prepending tokens to a shared passage
    must still dedup the passage's chunks (boundaries are local),
    where the fixed-stride chunker shifts every chunk."""
    from cherry_spark.ext.dedup import cdc_chunk_dedup_stats, chunk_dedup_stats

    passage = " ".join(f"tok{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, passage), (2, "shifted " + passage)], ["doc_id", "text"]
    )
    cdc = cdc_chunk_dedup_stats(df, window=3, divisor=8).collect()
    fixed = chunk_dedup_stats(df, chunk_tokens=8).collect()
    # fixed chunker: the 1-token shift misaligns every 8-token chunk
    assert len(fixed) == 0
    # CDC: chunks after the first boundary realign -> shared chunks dedup
    assert len(cdc) >= 2
    assert all(r["n_docs"] == 2 for r in cdc)


def test_bigram_logprob_planted(spark):
    """Hand-computed corpus: bigrams 'a b' x2, 'b a' x1, 'b c' x1.
    c(a ·)=2, c(b ·)=2. doc1 'a b a b' -> mean(ln(2/2), ln(1/2),
    ln(2/2)); doc2 'b c' -> ln(1/2); doc3 'x' -> 0 bigrams, NULL."""
    import math

    from cherry_spark.ext.quality import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b c"), (3, "x")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    lp_ab = round(math.log(2 / 2), 6)   # c('a b')=2 / c(a .)=2
    lp_ba = round(math.log(1 / 2), 6)   # c('b a')=1 / c(b .)=2
    lp_bc = round(math.log(1 / 2), 6)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["mean_logprob"] == round((lp_ab + lp_ba + lp_ab) / 3, 6)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["mean_logprob"] == round(lp_bc, 6)
    assert out[3]["n_bigrams"] == 0 and out[3]["mean_logprob"] is None


def test_dsir_custom_tokenizer_column(spark):
    """The tokenizer seam on DSIR: a precomputed token-array column
    (here case-folded) replaces the whitespace default, and the
    whole score moves into that token space — 'The' and 'the' merge,
    so a case-variant of the target scores exactly like the target
    itself."""
    from cherry_spark.ext.dedup import tokens_col
    from cherry_spark.ext.quality import dsir_logratio

    raw = spark.createDataFrame(
        [(1, "The Cat sat"), (2, "the cat sat"), (3, "dogs bark loud")],
        ["doc_id", "text"],
    )
    target = spark.createDataFrame([(10, "the cat sat")], ["doc_id", "text"])
    folded = lambda c: tokens_col(F.lower(c))  # noqa: E731
    out = {
        r["doc_id"]: r["logratio"]
        for r in dsir_logratio(raw, target, tokenizer=folded).collect()
    }
    assert out[1] == out[2]  # case variants identical under the seam
    assert out[1] > out[3]  # target-like beats off-domain
    # whitespace default still distinguishes the case variants
    ws = {
        r["doc_id"]: r["logratio"]
        for r in dsir_logratio(raw, target).collect()
    }
    assert ws[1] != ws[2]


def test_hashed_classifier_score_properties(spark):
    from cherry_spark.ext.quality import hashed_classifier_score

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),  # identical text -> identical score
        (3, "zeta eta theta iota kappa"),
        (4, ""),  # tokenless doc: excluded (no logit)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in hashed_classifier_score(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["score"] == out[2]["score"]
    for r in out.values():
        assert -1.0 <= r["score"] < 1.0
        assert r["keep"] == int(r["score"] > 0.0)
    # deterministic under repartition
    again = {
        r["id"]: r["score"]
        for r in hashed_classifier_score(df.repartition(7)).collect()
    }
    assert again == {k: v["score"] for k, v in out.items()}


def test_split_to_chunks_coverage_and_overlap(spark):
    from cherry_spark.ext.text import split_to_chunks

    words = " ".join(f"w{i}" for i in range(50))
    df = spark.createDataFrame([(1, words), (2, "a b"), (3, "")],
                               "doc_id long, text string")
    out = split_to_chunks(df, chunk_tokens=16, overlap_tokens=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 3 not in by_doc  # empty doc yields no chunks
    # doc 2: one short chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_chunk_tokens"] == 2
    # doc 1: stride 12, starts 0,12,24,36,48 -> 5 chunks
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert len(c1) == 5
    # every token appears in >= 1 chunk; overlap tokens in exactly 2
    seen = []
    for r in c1:
        seen.extend(r["chunk_text"].split(" "))
    assert set(seen) == {f"w{i}" for i in range(50)}
    from collections import Counter

    counts = Counter(seen)
    # starts 0,12,24,36: tokens 12..15, 24..27, 36..39, 48..49(+?) overlap
    assert counts["w12"] == 2 and counts["w0"] == 1
    # reconstruct: chunk i starts at i*12 and has the right tokens
    for r in c1:
        start = r["chunk_idx"] * 12
        expect = [f"w{i}" for i in range(start, min(start + 16, 50))]
        assert r["chunk_text"].split(" ") == expect


def test_vocab_coverage_known_distribution(spark):
    from cherry_spark.ext.text import vocab_coverage

    # 10x 'a', 5x 'b', 1x 'c' -> total 16, 3 types
    text = " ".join(["a"] * 10 + ["b"] * 5 + ["c"])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = {r["k"]: r for r in vocab_coverage(df, ks=(1, 2, 10)).collect()}
    assert out[1]["covered_tokens"] == 10 and out[1]["coverage"] == 0.625
    assert out[2]["covered_tokens"] == 15
    # k beyond vocab clamps to full coverage
    assert out[10]["covered_tokens"] == 16 and out[10]["coverage"] == 1.0
    assert all(r["n_types"] == 3 and r["total_tokens"] == 16 for r in out.values())
