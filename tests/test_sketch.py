"""Count-Min sketch properties (ext/sketch.py): the never-underestimate
guarantee over EVERY key, exact additivity of the merge, cross-engine
hash portability, and the streaming fold (streamed == from-scratch)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from cherry_spark.writers.store import data_dir as dd


def _cells(df):
    return {(r["depth"], r["bucket"]): r["cnt"] for r in df.collect()}


def test_cms_never_underestimates_any_key(spark, sf_dir):
    from cherry_spark.ext.dedup import tokens_col
    from cherry_spark.ext.sketch import cms_build, cms_probe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(tokens_col(F.col("text"))).alias("token"))
    cms = cms_build(toks, "token", depth=4, width=16)
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    probed = cms_probe(counts, cms, "token", depth=4, width=16).collect()
    assert probed
    for r in probed:
        assert r["est_n"] >= r["exact_n"], r


def test_cms_probe_of_absent_key_can_reach_zero(spark):
    from cherry_spark.ext.sketch import cms_build, cms_probe

    # stream with 3 keys; with width 1024 and depth 4 a novel key's
    # cells are almost surely untouched -> estimate 0 via the
    # missing-cell coalesce (left join)
    stream = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("a",)], "token string"
    )
    cms = cms_build(stream, "token", depth=4, width=1024)
    probe = spark.createDataFrame([("zzz-novel",)], "token string")
    [row] = cms_probe(probe, cms, "token", depth=4, width=1024).collect()
    assert row["est_n"] == 0


def test_cms_merge_equals_whole_build(spark, sf_dir):
    from cherry_spark.ext.dedup import tokens_col
    from cherry_spark.ext.sketch import cms_build, cms_merge

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("token")
    )
    slices = [
        cms_build(toks.where(F.col("doc_id") % 3 == i), "token", 4, 32)
        for i in range(3)
    ]
    merged = _cells(cms_merge(*slices))
    whole = _cells(cms_build(toks, "token", 4, 32))
    assert merged == whole


def test_cms_matches_duckdb_cells_bit_for_bit(spark, sf_dir, oracle_con):
    from cherry_spark.ext.dedup import tokens_col
    from cherry_spark.ext.sketch import cms_build, cms_build_sql

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(tokens_col(F.col("text"))).alias("token"))
    got = _cells(cms_build(toks, "token", 4, 16))
    sql = cms_build_sql("token", "toks", 4, 16)
    want = {
        (d, b): c
        for d, b, c in oracle_con.execute(
            "WITH toks AS (SELECT t AS token FROM documents, "
            "UNNEST(list_filter(string_split(text,' '), t -> t != '')) AS u(t)) "
            + sql
        ).fetchall()
    }
    assert got == want


def test_streaming_cms_fold_equals_batch_build(spark, tmp_path):
    from cherry_spark.ext.sketch import cms_build
    from cherry_spark.streaming.continuous import run_streaming_cms

    arrivals = [
        [("a",), ("b",), ("a",)],
        [("c",), ("a",)],
        [("d",), ("b",), ("e",), ("a",)],
    ]
    src = str(tmp_path / "in")
    for a in arrivals:
        spark.createDataFrame(a, "token string").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    stream_df = (
        spark.readStream.schema("token string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    seen: list[int] = []

    def sink(cms, batch_id):
        seen.append(batch_id)

    state = str(tmp_path / "state")
    q = run_streaming_cms(
        spark,
        stream_df,
        state,
        sink,
        str(tmp_path / "ckpt"),
        key_col="token",
        depth=4,
        width=8,
    )
    q.awaitTermination(240)

    assert len(seen) == 3
    everything = spark.createDataFrame(
        [t for a in arrivals for t in a], "token string"
    )
    assert _cells(spark.read.parquet(dd(state))) == _cells(
        cms_build(everything, "token", 4, 8)
    )


def test_mg_exact_when_counters_never_overflow(spark):
    from cherry_spark.ext.sketch import mg_summary

    rows = [("a",)] * 7 + [("b",)] * 5 + [("c",)] * 3 + [("d",)] * 1
    df = spark.createDataFrame(rows, "token string").repartition(4)
    got = {r["token"]: r["w"] for r in mg_summary(df, "token", k=10).collect()}
    # k exceeds the distinct-key count on every partition, so MG is
    # exact and the merge threshold is 0
    assert got == {"a": 7, "b": 5, "c": 3, "d": 1}


def test_mg_bound_holds_under_pressure(spark):
    from pyspark.sql import functions as F
    from cherry_spark.ext.sketch import mg_summary

    # skewed stream: key k appears 2k+1 times, keys 0..29, N=900
    rows = [(f"k{k:02d}",) for k in range(30) for _ in range(2 * k + 1)]
    df = spark.createDataFrame(rows, "token string").repartition(8)
    k = 5
    summ = mg_summary(df, "token", k=k)
    got = {r["token"]: r["w"] for r in summ.collect()}
    assert len(got) <= k
    n = len(rows)
    exact = {f"k{kk:02d}": 2 * kk + 1 for kk in range(30)}
    for tok, w in got.items():
        assert w <= exact[tok]  # never overestimates
        assert (exact[tok] - w) * (k + 1) <= n  # error bound
    # provably-heavy keys (count*(k+1) > N) must survive
    for tok, c in exact.items():
        if c * (k + 1) > n:
            assert tok in got


def test_streaming_mg_fold_keeps_guarantee(spark, tmp_path):
    from cherry_spark.streaming.continuous import run_streaming_mg

    # 3 arrivals; key 'hh' is 1/3 of every batch -> provably heavy
    # at k=4 (1/3 > 1/5) no matter how the fold splits the stream
    arrivals = [
        [("hh",), ("a",), ("hh",), ("b",), ("hh",), ("c",)],
        [("hh",), ("d",), ("hh",), ("e",), ("hh",), ("f",)],
        [("hh",), ("g",), ("hh",), ("h",), ("hh",), ("i",)],
    ]
    src = str(tmp_path / "in")
    for a in arrivals:
        spark.createDataFrame(a, "token string").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    stream_df = (
        spark.readStream.schema("token string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    seen = []
    q = run_streaming_mg(
        spark,
        stream_df,
        str(tmp_path / "state"),
        lambda s, b: seen.append(b),
        str(tmp_path / "ckpt"),
        key_col="token",
        k=4,
    )
    q.awaitTermination(240)
    assert len(seen) == 3
    got = {
        r["token"]: r["w"]
        for r in spark.read.parquet(dd(str(tmp_path / "state"))).collect()
    }
    n, exact_hh, kk = 18, 9, 4
    assert len(got) <= kk
    assert "hh" in got  # 9*(4+1) > 18: must survive the folds
    assert got["hh"] <= exact_hh
    assert (exact_hh - got["hh"]) * (kk + 1) <= n  # additive bound
