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


def test_pack_with_custom_tokenizer_column(spark):
    """The tokenizer seam: pack_sequences budgets in whatever token
    unit the caller's token column carries — here a BPE-ish regex
    tokenizer (letter runs / digits / single punctuation) instead of
    whitespace. Differential check: the packing replayed in Python
    over the custom counts matches exactly."""
    texts = [
        (0, "Hello, world! 42 tokens?"),
        (1, "a b c"),
        (2, "import numpy as np; x=3"),
        (3, ""),
        (4, "one-two three_four 5678"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    bpe_ish = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]"), 0)
    ).cast("long")
    with_tok = df.select("doc_id", bpe_ish.alias("n_tokens"))
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_tok"], r["first_chunk"], r["last_chunk"])
        for r in pack_sequences(with_tok, seq_len=7).collect()
    }
    rows = with_tok.collect()
    order = sorted(
        rows,
        key=lambda r: (
            hashlib.md5(f"{r['doc_id']}pack".encode()).hexdigest(),
            r["doc_id"],
        ),
    )
    acc = 0
    want = {}
    for r in order:
        n = r["n_tokens"]
        want[r["doc_id"]] = (n, acc, acc // 7, (acc + max(n, 1) - 1) // 7)
        acc += n
    assert got == want
    # sanity: the custom unit differs from whitespace for these texts
    ws = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("n")
    ).collect()}
    assert any(want[i][0] != ws[i] for i in want)


def test_shard_assignments_balanced_and_disjoint(spark):
    from cherry_spark.ext.packing import shard_assignments

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    out = shard_assignments(df, n_shards=8).collect()
    assert len(out) == 1000
    # (shard, position) unique and positions dense per shard
    cells = {(r["shard"], r["position"]) for r in out}
    assert len(cells) == 1000
    from collections import Counter

    sizes = Counter(r["shard"] for r in out)
    assert set(sizes) == set(range(8))
    assert max(sizes.values()) - min(sizes.values()) <= 1  # round-robin ±1
    for s in range(8):
        pos = sorted(p for sh, p in cells if sh == s)
        assert pos == list(range(len(pos)))
    # deterministic under repartition
    again = shard_assignments(df.repartition(13), n_shards=8).collect()
    assert {(r["doc_id"], r["shard"], r["position"]) for r in again} == {
        (r["doc_id"], r["shard"], r["position"]) for r in out
    }


def test_chunk_doc_spans_tile_exactly(spark):
    from cherry_spark.ext.packing import chunk_doc_spans, pack_sequences

    df = spark.range(50).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37 + 1).cast("long").alias("n_tokens")
    )
    seq_len = 16
    spans = chunk_doc_spans(df, seq_len=seq_len).collect()
    total = df.agg(F.sum("n_tokens")).first()[0]
    # spans tile the token stream exactly: per chunk, spans are disjoint,
    # contiguous from 0 (or the chunk is the tail), and sum to coverage
    by_chunk = {}
    for r in spans:
        assert 0 <= r["start_in_chunk"] < r["end_in_chunk"] <= seq_len
        by_chunk.setdefault(r["chunk_id"], []).append(
            (r["start_in_chunk"], r["end_in_chunk"])
        )
    n_chunks = max(by_chunk) + 1
    assert n_chunks == (total + seq_len - 1) // seq_len
    covered = 0
    for cid, ivs in by_chunk.items():
        ivs.sort()
        assert ivs[0][0] == 0
        for (a1, b1), (a2, b2) in zip(ivs, ivs[1:]):
            assert b1 == a2  # contiguous, disjoint
        covered += sum(b - a for a, b in ivs)
        if cid < n_chunks - 1:
            assert ivs[-1][1] == seq_len  # full chunks fully covered
    assert covered == total
    # agreement with pack_sequences chunk ranges
    packed = {r["doc_id"]: r for r in pack_sequences(df, seq_len=seq_len).collect()}
    for r in spans:
        p = packed[r["doc_id"]]
        assert p["first_chunk"] <= r["chunk_id"] <= p["last_chunk"]
