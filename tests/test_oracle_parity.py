"""Differential tests: every registered query vs its DuckDB oracle.

This is the same comparison the driver's correctness gate runs
(row-count + column names + order-insensitive canonical value multiset),
at sf0.001 for speed; run ``python tools/verify_local.py`` for sf0.01.
"""

from __future__ import annotations

import pytest

import cherry_spark.queries  # noqa: F401  (registration)
from cherry_spark.catalog import REGISTRY
from tools.verify_local import compare_query

ALL_NAMES = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL_NAMES)
def test_query_matches_oracle(spark, oracle_con, sf_dir, name):
    ok, msg = compare_query(spark, oracle_con, name, sf_dir)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"nation_name", "revenue", "n_items"}


def test_contract_shape():
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert q, "queries() must not be empty"
    # every oracle key must have a query
    assert set(o) <= set(q)
