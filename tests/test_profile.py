"""Unit tests for ext/profile.py on a hand-built frame with NULLs,
mixed types, and an unsupported column that must be skipped."""

from __future__ import annotations

import pytest


def _df(spark):
    rows = [
        (1, 2.5, "b", True, [1]),
        (2, None, "a", False, [2]),
        (3, 2.5, None, None, [3]),
    ]
    return spark.createDataFrame(
        rows, "k long, x double, s string, f boolean, arr array<int>"
    )


def test_profile_stats(spark):
    from cherry_spark.ext.profile import profile_table, profiled_columns

    df = _df(spark)
    assert profiled_columns(df) == ["k", "x", "s", "f"]  # arr skipped
    got = {r.col_name: r for r in profile_table(df).collect()}
    assert set(got) == {"k", "x", "s", "f"}
    k = got["k"]
    assert (k.n_rows, k.n_null, k.n_distinct) == (3, 0, 3)
    assert (k.min_num, k.max_num) == (1.0, 3.0)
    assert k.min_str is None and k.max_str is None
    x = got["x"]
    assert (x.n_null, x.n_distinct) == (1, 1)
    s = got["s"]
    assert (s.n_null, s.n_distinct) == (1, 2)
    assert (s.min_str, s.max_str) == ("a", "b")
    assert s.min_num is None
    f = got["f"]
    assert (f.n_null, f.n_distinct) == (1, 2)


def test_profile_no_supported_columns_raises(spark):
    from cherry_spark.ext.profile import profile_table

    df = spark.createDataFrame([([1],)], "arr array<int>")
    with pytest.raises(ValueError):
        profile_table(df)
