"""Sequence packing: two-phase distributed prefix sum vs the naive
single global window, plus chunk-interval invariants."""

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cherry_spark.ext.packing import global_prefix_sum, pack_sequences


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, (i * 37) % 97 + (3 if i % 5 else 0)) for i in range(200)]
    # include zero-token docs — they must still pin to a chunk
    rows += [(1000, 0), (1001, 0)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_two_phase_matches_single_window(spark, docs):
    got = global_prefix_sum(docs, "doc_id", "n_tokens", salt="pack").collect()
    w = (
        Window.orderBy(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("pack"))), "doc_id"
        ).rowsBetween(Window.unboundedPreceding, -1)
    )
    want = docs.withColumn(
        "start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    ).collect()
    assert {r["doc_id"]: r["start"] for r in got} == {
        r["doc_id"]: r["start"] for r in want
    }


def test_prefix_sum_matches_python(spark, docs):
    rows = docs.collect()
    order = sorted(
        rows,
        key=lambda r: (
            hashlib.md5(f"{r['doc_id']}pack".encode()).hexdigest(),
            r["doc_id"],
        ),
    )
    acc, want = 0, {}
    for r in order:
        want[r["doc_id"]] = acc
        acc += r["n_tokens"]
    got = {
        r["doc_id"]: r["start"]
        for r in global_prefix_sum(docs, "doc_id", "n_tokens", salt="pack").collect()
    }
    assert got == want


def test_pack_intervals_tile_the_stream(spark, docs):
    seq_len = 64
    packed = pack_sequences(docs, seq_len=seq_len, salt="pack").collect()
    total = sum(r["n_tokens"] for r in packed)
    # starts + lengths tile [0, total) with no gaps or overlaps
    ivals = sorted((r["start_tok"], r["n_tokens"]) for r in packed)
    pos = 0
    for start, n in ivals:
        assert start == pos
        pos += n
    assert pos == total
    for r in packed:
        assert r["first_chunk"] == r["start_tok"] // seq_len
        last = r["start_tok"] + max(r["n_tokens"], 1) - 1
        assert r["last_chunk"] == last // seq_len
        assert r["n_chunks"] == r["last_chunk"] - r["first_chunk"] + 1
        assert r["n_chunks"] >= 1
    assert max(r["last_chunk"] for r in packed) == (total - 1) // seq_len


def test_two_phase_plan_has_no_global_data_window(spark, docs):
    """The window over the DATA must be partitioned (per-bucket); only
    the 256-row bucket-offset window may be unpartitioned."""
    plan = global_prefix_sum(docs, "doc_id", "n_tokens")._jdf.queryExecution().executedPlan().toString()
    import re

    windows = [ln for ln in plan.splitlines() if "Window " in ln or "Window(" in ln]
    assert windows, plan
    # every Window node that scans the data (orders by _hkey) must be
    # partitioned by _bucket; the offsets window orders by _bucket only
    for w in windows:
        if "n_tokens" in w and "_hkey" in w:
            assert "[_bucket" in w, w
