"""Unit tests for ext/versioning.py on a hand-built snapshot pair."""

from __future__ import annotations


def _snapshots(spark):
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "beta EDITED"), (4, "delta"), (9, "epsilon")],
        "doc_id long, text string",
    )
    return old, new


def test_corpus_diff_classes(spark):
    from cherry_spark.ext.versioning import corpus_diff

    old, new = _snapshots(spark)
    got = {r.doc_id: r for r in corpus_diff(old, new).collect()}
    assert got[1].change_class == "unchanged"
    assert got[2].change_class == "changed"
    assert (got[2].old_len, got[2].new_len) == (4, 11)
    assert got[3].change_class == "removed"
    assert got[3].new_len is None
    assert got[9].change_class == "added"
    assert got[9].old_len is None


def test_corpus_diff_report_totals(spark):
    from cherry_spark.ext.versioning import corpus_diff_report

    old, new = _snapshots(spark)
    got = {r.change_class: r for r in corpus_diff_report(old, new).collect()}
    assert got["unchanged"].n_docs == 2
    assert got["changed"].n_docs == 1
    assert got["removed"].new_chars == 0
    assert got["added"].old_chars == 0
    assert got["added"].new_chars == 7


def test_reprocess_manifest_is_added_plus_changed(spark):
    from cherry_spark.ext.versioning import reprocess_manifest

    old, new = _snapshots(spark)
    got = sorted(
        (r.doc_id, r.change_class) for r in reprocess_manifest(old, new).collect()
    )
    assert got == [(2, "changed"), (9, "added")]
