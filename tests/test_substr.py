"""ExactSubstr-style repeated-span detection (ext/substr.py):
maximal-span merging, alignment, short-doc guard, hot-gram cap."""

from __future__ import annotations

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
