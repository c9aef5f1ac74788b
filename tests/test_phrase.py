"""Unit tests for ext/phrase.py — hand corpus with overlapping and
repeated-token phrases."""

from __future__ import annotations


def _corpus(spark):
    rows = [
        (1, "table table table scan"),  # "table table" overlaps: 2 occ
        (2, "a table table b table table"),  # 2 separate occ
        (3, "table scan table"),  # 0 occ of "table table"
        (4, "fast scan query big end"),
        (5, "scan query big scan query big"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _phrases(spark):
    return spark.createDataFrame(
        [(0, "table table"), (1, "scan query big"), (2, "missing phrase")],
        "phrase_id long, phrase string",
    )


def test_phrase_overlap_and_counts(spark):
    from cherry_spark.ext.phrase import phrase_search_topk

    out = phrase_search_topk(_corpus(spark), _phrases(spark), k=10)
    got = {(r.phrase_id, r.doc_id): r.n_occurrences for r in out.collect()}
    # overlapping occurrences both count (positional semantics)
    assert got[(0, 1)] == 2
    assert got[(0, 2)] == 2
    assert (0, 3) not in got  # non-adjacent repeats don't match
    assert got[(1, 4)] == 1
    assert got[(1, 5)] == 2
    # a phrase with no match yields no rows, not zero rows
    assert not [k for k in got if k[0] == 2]


def test_phrase_topk_rank_and_ties(spark):
    from cherry_spark.ext.phrase import phrase_search_topk

    out = phrase_search_topk(_corpus(spark), _phrases(spark), k=1)
    got = {r.phrase_id: (r.doc_id, r.n_occurrences) for r in out.collect()}
    # k=1: count DESC then doc_id ASC — doc 1 ties doc 2 at 2, wins on id
    assert got[0] == (1, 2)
    assert got[1] == (5, 2)


def test_positional_postings_positions(spark):
    from cherry_spark.ext.phrase import positional_postings

    df = spark.createDataFrame([(7, "x  y   z")], "doc_id long, text string")
    got = sorted(
        (r.pos, r.term) for r in positional_postings(df).collect()
    )
    # multi-space runs collapse (tokens_col filters empties)
    assert got == [(0, "x"), (1, "y"), (2, "z")]
