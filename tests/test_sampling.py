"""Deterministic hash-split sampling (ext/sampling.py) and the
train/eval decontamination operator (ext/dedup.py:contamination_overlap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_spark.ext.dedup import contamination_overlap
from cherry_spark.ext.sampling import (
    deterministic_sample,
    hash_split,
    split_case_sql,
    split_hash,
)


def _ids(spark, n=2000):
    return spark.range(n).withColumnRenamed("id", "k")


def test_split_fractions_and_total(spark):
    df = hash_split(_ids(spark), "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert set(counts) == {"train", "val", "test"}
    # 16-bit hash on 2000 keys: allow generous sampling noise
    assert 1450 <= counts["train"] <= 1750
    assert 100 <= counts["val"] <= 320
    assert 100 <= counts["test"] <= 320


def test_split_stable_under_repartition(spark):
    """The core property df.sample() lacks: assignment is a pure
    function of the key, so any physical layout gives identical splits."""
    base = _ids(spark)
    splits = {"train": 0.7, "test": 0.3}
    a = {r["k"]: r["split"] for r in hash_split(base, "k", splits).collect()}
    b = {
        r["k"]: r["split"]
        for r in hash_split(base.repartition(17, "k"), "k", splits).collect()
    }
    c = {r["k"]: r["split"] for r in hash_split(base.coalesce(1), "k", splits).collect()}
    assert a == b == c


def test_nested_samples_are_supersets(spark):
    df = _ids(spark)
    s10 = {r["k"] for r in deterministic_sample(df, "k", 0.10).collect()}
    s25 = {r["k"] for r in deterministic_sample(df, "k", 0.25).collect()}
    assert s10 <= s25
    assert 120 <= len(s10) <= 280
    assert 380 <= len(s25) <= 620


def test_fraction_one_keeps_all_rows(spark):
    """A cumulative cut reaching the full hash space must dominate every
    hash: the pre-r3 '10000' 5-char cut lexicographically LOST to most
    4-char hashes and silently kept ~6% (ADVICE r2)."""
    df = _ids(spark, 300)
    assert deterministic_sample(df, "k", 1.0).count() == 300


def test_zero_weight_splits(spark):
    """Zero-weight tail splits must receive nothing, in Spark AND in the
    generated SQL twin (the cut saturates mid-list)."""
    import duckdb

    splits = {"a": 1.0, "b": 0.0}
    df = hash_split(_ids(spark, 500), "k", splits)
    counts = {r["split"]: r["n"] for r in
              df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 500}
    case = split_case_sql("k", splits)
    duck = duckdb.sql(
        f"SELECT {case} AS s, count(*) FROM range(500) t(k) GROUP BY 1"
    ).fetchall()
    assert duck == [("a", 500)]


def test_salt_decorrelates(spark):
    df = _ids(spark)
    a = {r["k"] for r in deterministic_sample(df, "k", 0.5, salt="a").collect()}
    b = {r["k"] for r in deterministic_sample(df, "k", 0.5, salt="b").collect()}
    assert a != b
    # Independent halves should overlap ~25% of the universe, not ~50%
    assert len(a & b) < 0.4 * 2000


def test_split_case_sql_matches_spark(spark):
    """The generated DuckDB CASE expression must agree with hash_split
    row-for-row — this is what keeps oracles in lockstep."""
    import duckdb

    splits = {"train": 0.6, "val": 0.2, "test": 0.2}
    spark_rows = {
        r["k"]: r["split"]
        for r in hash_split(_ids(spark, 500), "k", splits, salt="s").collect()
    }
    case = split_case_sql("k", splits, salt="s")
    duck_rows = dict(
        duckdb.sql(
            f"SELECT k, {case} AS split FROM range(500) t(k)"
        ).fetchall()
    )
    assert spark_rows == duck_rows


def test_split_hash_is_hex_prefix(spark):
    rows = spark.createDataFrame([("abc",)], "k string").select(
        split_hash(F.col("k"), salt="x").alias("h")
    ).collect()
    import hashlib

    assert rows[0]["h"] == hashlib.md5(b"abcx").hexdigest()[:4]


def test_contamination_overlap_flags_only_real_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),   # shares 4-shingle with test
            (2, "totally unrelated words in this training document here"),
            (3, "alpha beta gamma delta something else entirely"),  # shares one
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, "prefix alpha beta gamma delta epsilon suffix")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_shared_shingles"], r["n_test_docs"])
        for r in contamination_overlap(train, test, shingle_k=4).collect()
    }
    assert set(got) == {1, 3}
    assert got[1] == (2, 1)  # "alpha beta gamma delta", "beta gamma delta epsilon"
    assert got[3] == (1, 1)  # "alpha beta gamma delta"


def test_weighted_mix_key_interleaves_proportionally(spark):
    from cherry_spark.ext.sampling import weighted_mix_key
    from pyspark.sql import functions as F

    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    weight = F.when(F.col("source") == "s0", 1).when(
        F.col("source") == "s1", 2
    ).otherwise(3)
    out = weighted_mix_key(
        df.withColumn("w", weight), "source", "doc_id", F.col("w"), stride_unit=6
    ).collect()
    # stride property: within any horizon T (before any source runs
    # out of items — s2 exhausts at key ~398), counts track weights
    for T in (60, 120, 240):
        counts = {}
        for r in out:
            if r["mix_key"] <= T:
                counts[r["source"]] = counts.get(r["source"], 0) + 1
        # expected ~ T*w/(2*unit): w=1 -> T/12, w=2 -> T/6, w=3 -> T/4
        for src, w in (("s0", 1), ("s1", 2), ("s2", 3)):
            exp = T * w / 12
            assert abs(counts.get(src, 0) - exp) <= 1, (T, src, counts)
    # deterministic across recomputation
    again = weighted_mix_key(
        df.withColumn("w", weight), "source", "doc_id", F.col("w"), stride_unit=6
    ).collect()
    assert {(r["doc_id"], r["mix_key"]) for r in out} == {
        (r["doc_id"], r["mix_key"]) for r in again
    }


def test_mixing_temperature_upweights_small_sources(spark):
    """τ=0.5 on a 100:1 skew: the small source's weight must exceed
    its proportional share and the weights must sum to ~1."""
    from cherry_spark.ext.sampling import mixing_temperature

    rows = [(i, "big") for i in range(100)] + [(1000, "small")]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = {r["source"]: r for r in mixing_temperature(df, tau=0.5, budget=1000).collect()}
    assert out["big"]["n_docs"] == 100 and out["small"]["n_docs"] == 1
    # proportional share of small = 1/101 ~ 0.0099; sqrt-scaled = 1/11
    assert abs(out["small"]["weight"] - 1 / 11) < 1e-4
    assert abs(out["big"]["weight"] + out["small"]["weight"] - 1.0) < 1e-5
    assert out["big"]["expected_samples"] + out["small"]["expected_samples"] <= 1000


def test_mixing_temperature_token_budget(spark):
    """The tokenizer seam on temperature mixing: size_col sums a
    precomputed token-count column so the n^tau balancing runs over
    token mass, not document rows. Hand-computed differential."""
    import math

    from cherry_spark.ext.sampling import mixing_temperature

    rows = [("a", 10), ("a", 30), ("b", 5), ("b", 5), ("b", 10), ("c", 400)]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    got = {
        r["source"]: (r["n_docs"], r["weight"], r["expected_samples"])
        for r in mixing_temperature(
            df, tau=0.5, budget=1000, size_col="n_tokens"
        ).collect()
    }
    sums = {"a": 40, "b": 20, "c": 400}
    pw = {s: round(math.pow(n, 0.5), 6) for s, n in sums.items()}
    tot = sum(pw.values())
    for s, n in sums.items():
        w = round(pw[s] / tot, 6)
        assert got[s][0] == n
        assert got[s][1] == w
        assert got[s][2] == math.floor(1000 * (pw[s] / tot))
    # row-count default unchanged: weights differ from the token basis
    by_rows = {
        r["source"]: r["n_docs"] for r in mixing_temperature(df, tau=0.5).collect()
    }
    assert by_rows == {"a": 2, "b": 3, "c": 1}


def test_mixing_apply_fills_quotas(spark):
    from cherry_spark.ext.sampling import mixing_apply, mixing_temperature

    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixing_apply(df, tau=0.5, budget=40).collect()
    quotas = {
        r["source"]: r["expected_samples"]
        for r in mixing_temperature(df, tau=0.5, budget=40).collect()
    }
    from collections import Counter

    got = Counter(r["source"] for r in out)
    assert dict(got) == {s: q for s, q in quotas.items() if q > 0}
    # sample_rank dense 1..quota per source
    for s, q in quotas.items():
        ranks = sorted(r["sample_rank"] for r in out if r["source"] == s)
        assert ranks == list(range(1, q + 1))
    # deterministic under repartition
    again = mixing_apply(df.repartition(7), tau=0.5, budget=40).collect()
    assert {(r["doc_id"], r["sample_rank"]) for r in again} == {
        (r["doc_id"], r["sample_rank"]) for r in out
    }


def test_leakage_safe_split_keeps_clusters_together(spark, sf_dir):
    from cherry_spark.catalog import REGISTRY
    import cherry_spark.queries  # noqa: F401  (registration)

    rows = REGISTRY["leakage_safe_split"].fn(spark, sf_dir).collect()
    assert rows and {r["split"] for r in rows} <= {"train", "heldout"}
    by_group: dict = {}
    for r in rows:
        by_group.setdefault(r["group_id"], set()).add(r["split"])
    # THE property: no group straddles the boundary
    assert all(len(s) == 1 for s in by_group.values())
    # clustered groups exist at fixture scale (planted near-dups)
    assert any(r["is_clustered"] == 1 for r in rows)


def test_weighted_systematic_sample_exact_properties(spark):
    import math

    from cherry_spark.ext.sampling import weighted_systematic_sample

    rows = [(i, 1 + (i * 37) % 500) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    W = sum(w for _, w in rows)
    m = 25
    out = weighted_systematic_sample(df, "doc_id", "w", m=m, salt="t").collect()
    # exactly m total picks, always
    assert sum(r["n_picks"] for r in out) == m
    picks = {r["doc_id"]: r["n_picks"] for r in out}
    weights = dict(rows)
    # every multiplicity within floor/ceil of its proportional share
    for i, w in rows:
        p = picks.get(i, 0)
        assert math.floor(w * m / W) <= p <= math.ceil(w * m / W)
    # an item heavier than the step is ALWAYS picked
    heavy = [i for i, w in rows if w * m >= W]
    assert all(i in picks for i in heavy)
    # deterministic under repartition
    again = weighted_systematic_sample(
        df.repartition(7), "doc_id", "w", m=m, salt="t"
    ).collect()
    assert {(r["doc_id"], r["n_picks"]) for r in again} == {
        (r["doc_id"], r["n_picks"]) for r in out
    }


def test_weighted_systematic_sample_adversarial_skew(spark):
    """One item holding ~99% of the total weight (the celebrity-key
    shape): it must take ~m picks (floor/ceil of its share) and the
    total must still be exactly m — the systematic formulation cannot
    over- or under-sample under any skew."""
    import math

    rows = [(0, 990_000)] + [(i, 100) for i in range(1, 101)]
    W = sum(w for _, w in rows)
    m = 50
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    from cherry_spark.ext.sampling import weighted_systematic_sample

    out = weighted_systematic_sample(df, "doc_id", "w", m=m, salt="sk").collect()
    picks = {r["doc_id"]: r["n_picks"] for r in out}
    assert sum(picks.values()) == m
    share = 990_000 * m / W
    assert math.floor(share) <= picks[0] <= math.ceil(share)
