"""as-of join semantics: backward inclusive, tiebreaks, no-match nulls."""

from __future__ import annotations

from cherry_spark.ext.asof import asof_join


def test_asof_backward_inclusive_and_nulls(spark):
    left = spark.createDataFrame(
        [(1, "k", 100), (2, "k", 250), (3, "k", 50), (4, "z", 999)],
        "lid long, key string, lts long",
    )
    right = spark.createDataFrame(
        [("k", 100, 10), ("k", 200, 20), ("q", 1, 99)],
        "key string, rts long, val long",
    )
    out = asof_join(
        left, right,
        left_key="key", right_key="key",
        left_ts="lts", right_ts="rts",
        value_cols=["val"],
    ).collect()
    got = {r["lid"]: r["val"] for r in out}
    assert got[1] == 10  # equal ts matches (inclusive)
    assert got[2] == 20  # latest earlier right row
    assert got[3] is None  # no right row at/before 50
    assert got[4] is None  # key with no right rows at all
    assert len(out) == 4  # every left row survives


def test_asof_tiebreak_greatest_wins(spark):
    left = spark.createDataFrame([(1, "k", 500)], "lid long, key string, lts long")
    right = spark.createDataFrame(
        [("k", 500, 7), ("k", 500, 9), ("k", 400, 1)],
        "key string, rts long, val long",
    )
    out = asof_join(
        left, right,
        left_key="key", right_key="key",
        left_ts="lts", right_ts="rts",
        value_cols=["val"], tiebreak="val",
    ).collect()
    assert out[0]["val"] == 9


def test_asof_null_value_not_backfilled(spark):
    """A genuine NULL in one value column of the matched right row must
    stay NULL — not be backfilled from an older right row (all output
    values must come from the SAME matched row)."""
    from cherry_spark.ext.asof import asof_join

    left = spark.createDataFrame([(1, 100)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 111, 500), (1, 90, None, 900)],
        "k long, ts long, price int, size long",
    )
    out = asof_join(
        left, right, "k", "k", "ts", "ts", value_cols=["price", "size"]
    ).collect()[0]
    # matched row is ts=90: price genuinely NULL, size 900
    assert out["price"] is None and out["size"] == 900
