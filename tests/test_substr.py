"""ExactSubstr-style repeated-span detection (ext/substr.py):
maximal-span merging, alignment, short-doc guard, hot-gram cap."""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_spark.ext.substr import repeated_substring_spans


def _spans(df):
    return sorted(
        (r["doc_a"], r["doc_b"], r["start_a"], r["start_b"], r["span_len"])
        for r in df.collect()
    )


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_run_is_one_maximal_span(spark):
    """A 6-token run shared at different offsets -> exactly ONE span of
    length 6 (stride-1 3-grams merged across the diagonal), with
    1-based starts on both sides."""
    shared = "q w e r t y"
    docs = _mk(
        spark,
        [(1, f"a b {shared} c"), (2, f"x {shared} z z")],
    )
    got = _spans(repeated_substring_spans(docs, min_len=3))
    assert got == [(1, 2, 3, 2, 6)]


def test_two_disjoint_runs_two_spans(spark):
    docs = _mk(
        spark,
        [(1, "p q r GAP1 s t u"), (2, "p q r GAP2 s t u")],
    )
    got = _spans(repeated_substring_spans(docs, min_len=3))
    assert got == [(1, 2, 1, 1, 3), (1, 2, 5, 5, 3)]


def test_run_shorter_than_min_len_ignored(spark):
    docs = _mk(spark, [(1, "a b c d"), (2, "a b x y")])
    assert _spans(repeated_substring_spans(docs, min_len=3)) == []


def test_short_docs_yield_no_postings(spark):
    docs = _mk(spark, [(1, "a b"), (2, "a b"), (3, "")])
    assert _spans(repeated_substring_spans(docs, min_len=3)) == []


def test_repeated_gram_multiple_alignments(spark):
    """doc 2 contains the shared run TWICE -> two spans on two
    diagonals (overlapping occurrences are positional, both found)."""
    docs = _mk(spark, [(1, "m n o"), (2, "m n o z m n o")])
    got = _spans(repeated_substring_spans(docs, min_len=3))
    assert got == [(1, 2, 1, 1, 3), (1, 2, 1, 5, 3)]


def test_hot_gram_cap_drops_stopgram_pairs(spark):
    """A gram present in every doc is dropped by max_gram_df; a longer
    run containing a sub-cap gram is still found."""
    docs = _mk(
        spark,
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on a hat"),
            (3, "the cat sat"),
            (4, "the cat sat"),
            (5, "the cat sat"),
        ],
    )
    uncapped = _spans(repeated_substring_spans(docs, min_len=3))
    assert (1, 2, 1, 1, 4) in uncapped  # "the cat sat on"
    capped = repeated_substring_spans(docs, min_len=3, max_gram_df=4)
    got = _spans(capped)
    # "the cat sat" (df=5) gram is dropped; the run (1,2) survives via
    # its "cat sat on" gram, shortened to the sub-cap diagonal island
    assert all(not (a == 3 and b == 4) for a, b, *_ in got)
    assert any(a == 1 and b == 2 and ln >= 3 for a, b, _, _, ln in got)


def test_fixture_matches_oracle_shape(spark, sf_dir):
    """Smoke vs expectations derived independently in DuckDB at the
    same min_len (full hash-compare runs in verify_local)."""
    import duckdb

    from cherry_spark.ext.substr import repeated_substring_spans_oracle_sql
    from cherry_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = _spans(repeated_substring_spans(docs, min_len=8))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    exp = sorted(
        tuple(r) for r in con.execute(
            repeated_substring_spans_oracle_sql(min_len=8)
        ).fetchall()
    )
    assert got == exp and len(got) > 0


def test_cut_repeated_spans_keeps_first_occurrence(spark):
    from cherry_spark.ext.substr import cut_repeated_spans

    shared = "q w e r t y"
    docs = _mk(spark, [(1, f"a b {shared} c"), (2, f"x {shared} z z")])
    spans = repeated_substring_spans(docs, min_len=3)
    out = {r["doc_id"]: (r["text_clean"], r["n_tokens_cut"])
           for r in cut_repeated_spans(docs, spans).collect()}
    # earlier doc untouched; later doc loses exactly the shared run
    assert out[1] == (f"a b {shared} c", 0)
    assert out[2] == ("x z z", 6)


def test_cut_merges_overlapping_intervals(spark):
    """Two span rows with overlapping [s, e) on the same doc must cut
    the union once — tokens in the overlap are not double-counted."""
    from cherry_spark.ext.substr import cut_repeated_spans

    docs = _mk(spark, [(5, "t0 t1 t2 t3 t4 t5 t6 t7")])
    spans = spark.createDataFrame(
        [(1, 5, 1, 2, 4), (1, 5, 1, 4, 3)],  # cut [2,6) and [4,7)
        "doc_a long, doc_b long, start_a long, start_b long, span_len long",
    )
    (row,) = cut_repeated_spans(docs, spans).collect()
    assert row["text_clean"] == "t0 t6 t7"
    assert row["n_tokens_cut"] == 5  # union [2,7), never 4+3


def test_cut_passthrough_and_empty_docs(spark):
    from cherry_spark.ext.substr import cut_repeated_spans

    docs = _mk(spark, [(1, "a b c"), (2, "")])
    spans = spark.createDataFrame(
        [],
        "doc_a long, doc_b long, start_a long, start_b long, span_len long",
    )
    out = {r["doc_id"]: (r["text_clean"], r["n_tokens_cut"])
           for r in cut_repeated_spans(docs, spans).collect()}
    assert out == {1: ("a b c", 0), 2: ("", 0)}


def test_detect_then_cut_round_trip_removes_repeats(spark):
    """After cutting, re-detection finds NO cross-doc span at the same
    min_len (the fixed point the paper's pipeline converges to in one
    step for pairwise-disjoint spans)."""
    from cherry_spark.ext.substr import cut_repeated_spans

    shared = "s1 s2 s3 s4 s5"
    docs = _mk(
        spark,
        [(1, f"a a a {shared}"), (2, f"b {shared} b b"), (3, f"{shared} c")],
    )
    spans = repeated_substring_spans(docs, min_len=5)
    cut = cut_repeated_spans(docs, spans).select(
        F.col("doc_id"), F.col("text_clean").alias("text")
    )
    again = repeated_substring_spans(cut, min_len=5)
    assert again.count() == 0


def test_delta_spans_batch_vs_corpus(spark):
    from cherry_spark.ext.substr import delta_repeated_spans

    shared = "d1 d2 d3 d4"
    corpus = _mk(spark, [(1, f"a {shared} b"), (2, "unrelated words here zz")])
    batch = _mk(spark, [(100, f"x y {shared}"), (101, "novel text only ok")])
    got = sorted(
        (r["doc_a"], r["doc_b"], r["start_a"], r["start_b"], r["span_len"])
        for r in delta_repeated_spans(corpus, batch, min_len=4).collect()
    )
    assert got == [(1, 100, 2, 3, 4)]


def test_delta_spans_stored_grams_equal_inline(spark):
    from cherry_spark.ext.substr import _gram_postings, delta_repeated_spans

    shared = "d1 d2 d3 d4 d5"
    corpus = _mk(spark, [(1, f"{shared} t u"), (2, f"v {shared}")])
    batch = _mk(spark, [(100, f"w {shared} w2")])
    inline = sorted(
        tuple(r)
        for r in delta_repeated_spans(corpus, batch, min_len=4).collect()
    )
    stored = _gram_postings(corpus, 4, "doc_id", "text")
    via_store = sorted(
        tuple(r)
        for r in delta_repeated_spans(
            corpus, batch, min_len=4, corpus_grams=stored
        ).collect()
    )
    assert via_store == inline and len(inline) == 2


def test_span_overlap_verdicts_gate(spark):
    from cherry_spark.ext.substr import (
        delta_repeated_spans,
        span_overlap_verdicts,
    )

    shared = "s1 s2 s3 s4 s5 s6"
    corpus = _mk(spark, [(1, f"pre {shared} post")])
    batch = _mk(
        spark,
        [
            (100, f"{shared} x y"),          # 6/8 overlap -> span_dup
            (101, f"{shared} a b c d e f"),  # 6/12 overlap -> unique at 0.5
            (102, "completely novel doc right here"),
        ],
    )
    spans = delta_repeated_spans(corpus, batch, min_len=4)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_overlap_tokens"],
            r["n_spans"],
            r["verdict"],
        )
        for r in span_overlap_verdicts(batch, spans, overlap_frac=0.5).collect()
    }
    assert got[100] == (8, 6, 1, "span_dup")
    assert got[101] == (12, 6, 1, "unique")
    assert got[102] == (5, 0, 0, "unique")


def test_delta_then_cut_admission_flow(spark):
    """The ingestion composition: detect batch-vs-corpus spans, cut
    them from the batch, and the cleaned batch shares nothing >= L
    with the corpus anymore."""
    from cherry_spark.ext.substr import (
        cut_repeated_spans,
        delta_repeated_spans,
    )

    shared = "c1 c2 c3 c4 c5"
    corpus = _mk(spark, [(1, f"{shared} tail")])
    batch = _mk(spark, [(100, f"head {shared} mid {shared}")])
    spans = delta_repeated_spans(corpus, batch, min_len=5)
    cleaned = cut_repeated_spans(batch, spans).select(
        F.col("doc_id"), F.col("text_clean").alias("text")
    )
    again = delta_repeated_spans(corpus, cleaned, min_len=5)
    assert again.count() == 0
    (row,) = cleaned.collect()
    assert row["text"] == "head mid"


def test_span_overlap_verdicts_fraction_is_exact(spark):
    """Review-r9 regression: int(0.57*100) truncates to 56, shifting
    the gate a full point; the micro-unit comparison must hold the
    boundary exactly — overlap == frac stays unique (strict >), one
    token more flips."""
    from cherry_spark.ext.substr import (
        delta_repeated_spans,
        span_overlap_verdicts,
    )

    # batch doc of 100 tokens; corpus shares exactly the first 57
    toks = [f"w{i}" for i in range(100)]
    corpus = _mk(spark, [(1, " ".join(toks[:57]) + " tailA tailB")])
    batch = _mk(spark, [(200, " ".join(toks))])
    spans = delta_repeated_spans(corpus, batch, min_len=4)
    for frac, want in ((0.57, "unique"), (0.56, "span_dup"), (0.125, "span_dup")):
        (r,) = span_overlap_verdicts(batch, spans, overlap_frac=frac).collect()
        assert (r["n_overlap_tokens"], r["verdict"]) == (57, want), frac
