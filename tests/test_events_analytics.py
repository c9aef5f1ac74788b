"""Unit tests for ext/events.py — hand-built user journeys where
order matters and the naive 'did all stages' answer is wrong."""

from __future__ import annotations

import datetime as dt


def _ev(spark):
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    t = lambda s: base + dt.timedelta(seconds=s)
    rows = [
        # u1: full ordered funnel
        (1, t(0), "view"), (1, t(10), "click"), (1, t(20), "purchase"),
        # u2: clicks BEFORE viewing — not a conversion past stage 0
        (2, t(0), "click"), (2, t(10), "view"),
        # u3: view then purchase without click — stops at stage 0
        (3, t(0), "view"), (3, t(5), "purchase"),
        # u4: never views — not even in the funnel
        (4, t(0), "click"), (4, t(5), "purchase"),
        # u5: view, click, but purchase PRECEDES the click
        (5, t(0), "view"), (5, t(2), "purchase"), (5, t(4), "click"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_funnel_order_matters(spark):
    from cherry_spark.ext.events import funnel_conversion

    out = funnel_conversion(_ev(spark), ["view", "click", "purchase"])
    got = {r.stage_idx: r for r in out.collect()}
    assert [got[i].n_users for i in range(3)] == [4, 2, 1]  # u1..u3,u5 / u1,u5 / u1
    assert got[0].conv_from_prev is None
    assert got[0].conv_from_first == 1.0
    assert got[1].conv_from_prev == 0.5
    assert got[2].conv_from_prev == 0.5
    assert got[2].conv_from_first == 0.25


def test_funnel_requires_two_stages(spark):
    import pytest

    from cherry_spark.ext.events import funnel_conversion

    with pytest.raises(ValueError):
        funnel_conversion(_ev(spark), ["view"])


def test_cohort_retention_matrix(spark):
    from cherry_spark.ext.events import cohort_retention

    base = dt.datetime(2024, 1, 4, tzinfo=dt.timezone.utc)  # within week W0
    t = lambda days: base + dt.timedelta(days=days)
    rows = [
        (1, t(0), "view"), (1, t(7), "view"), (1, t(14), "view"),
        (2, t(0), "view"),                      # W0 cohort, week 0 only
        (3, t(7), "view"), (3, t(14), "view"),  # W1 cohort
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = cohort_retention(ev, width_s=7 * 86400)
    got = {(r.cohort_s, r.week_offset): r for r in out.collect()}
    cohorts = sorted({c for c, _ in got})
    w0, w1 = cohorts
    assert w1 - w0 == 7 * 86400
    assert got[(w0, 0)].n_active == 2
    assert got[(w0, 1)].n_active == 1  # only u1 returns
    assert got[(w0, 1)].retention_6 == 0.5
    assert got[(w0, 2)].n_active == 1
    assert got[(w1, 0)].n_active == 1  # u3's own cohort
    assert got[(w1, 1)].n_active == 1
    assert got[(w1, 1)].retention_6 == 1.0
