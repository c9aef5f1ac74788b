"""RRF fusion semantics (ext/hybrid.py): exact integer contributions,
single-list docs, and the deterministic tie-break."""

from __future__ import annotations


def _ranked(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rank int"
    )


def test_rrf_exact_contributions_and_single_list_docs(spark):
    from cherry_spark.ext.hybrid import rrf_fuse

    lex = _ranked(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    den = _ranked(spark, [(1, 11, 1), (1, 13, 2)])
    got = {
        r["doc_id"]: (r["rank_lex"], r["rank_dense"], r["rrf_fp"])
        for r in rrf_fuse(lex, den, k=5, c=60).collect()
    }
    s = 1_000_000_000
    # doc 11 in both lists wins
    assert got[11] == (2, 1, s // 62 + s // 61)
    assert got[10] == (1, None, s // 61)
    assert got[13] == (None, 2, s // 62)
    assert got[12] == (3, None, s // 63)
    assert len(got) == 4


def test_rrf_tie_breaks_on_doc_id_and_caps_k(spark):
    from cherry_spark.ext.hybrid import rrf_fuse

    # four docs all at lex rank r in DIFFERENT queries is boring; plant
    # a same-query tie instead: two docs with identical (rank_lex only)
    # contributions -> lower doc_id first, and k=1 keeps only it
    lex = _ranked(spark, [(7, 100, 1), (7, 99, 1)])
    den = _ranked(spark, [])
    rows = rrf_fuse(lex, den, k=1, c=60).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 99
