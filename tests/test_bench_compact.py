"""The driver's bench recorder keeps only the LAST 2000 characters of
bench.py's stdout and parses that tail as JSON — rounds 5 through 10
all recorded ``"parsed": null`` because the printed line outgrew the
cap (round-10 verdict "what's wrong" #1).  These tests bound the
printed line at the LIVE registry size with worst-case inputs so the
regression cannot recur silently as the suite grows."""

from __future__ import annotations

import json

import bench
import cherry_spark.queries  # noqa: F401 — populates the registry
from cherry_spark.catalog import REGISTRY

_DRIVER_TAIL_CAP = 2000


def _worst_case_detail() -> dict:
    """Every registered query warm-timed at a 5-digit value, the full
    pinned series present — the largest line compact_line can emit at
    the current registry."""
    warm = {name: 99999.999 for name in REGISTRY}
    pinned_warm = {name: 99999.999 for name in bench.PINNED}
    return {
        "metric": "headline_total",
        "value": 99999.999,
        "unit": "sec",
        "sf": 0.1,
        "queries": {name: 99999.999 for name in bench.HEADLINE},
        "queries_warm": warm,
        "warm_total": 99999.999,
        "pinned_total": 99999.999,
        "pinned_warm_total": 99999.999,
        "pinned_warm": pinned_warm,
        "pinned_warm_spread": {
            name: [99999.999, 99999.999] for name in bench.PINNED
        },
        "pinned_warm_basis": "median3_consecutive+band_sweep",
        "pinned_n": len(bench.PINNED),
        "rotation_group": 9,
        "rotation_warm": {},
        "rotation_total": 99999.999,
    }


def test_compact_line_fits_driver_tail_with_margin():
    line = bench.compact_line(_worst_case_detail())
    # 10% headroom under the cap so a few added scalar fields or a
    # longer query name don't silently tip it over next round
    assert len(line) < _DRIVER_TAIL_CAP * 0.9, len(line)
    assert "\n" not in line


def test_compact_line_parses_and_carries_the_instruments():
    detail = _worst_case_detail()
    parsed = json.loads(bench.compact_line(detail))
    # driver contract shape
    assert parsed["metric"] == "headline_total"
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    # the frozen pinned series rides in the parsed line
    assert set(parsed["queries"]) == set(bench.PINNED)
    assert parsed["pinned_warm_total"] == 99999.999
    assert len(parsed["slowest5_warm"]) == 5
    assert parsed["detail_file"] == "BENCH_full.json"
    # the noise band (sum of per-query min/max warm samples) rides in
    # the line — drift adjudication without a worktree A/B
    assert parsed["basis"] == "c3+band"
    lo, hi = parsed["pinned_warm_band"]
    assert lo <= hi
    # band = sums of per-query min/max samples over the pinned set
    assert lo == round(99999.999 * len(bench.PINNED), 2)


def test_slowest5_are_the_actual_slowest():
    detail = _worst_case_detail()
    names = sorted(REGISTRY)[:8]
    detail["queries_warm"] = {
        n: float(i) for i, n in enumerate(names)
    }
    parsed = json.loads(bench.compact_line(detail))
    assert parsed["slowest5_warm"] == {
        n: float(i) for i, n in enumerate(names) if i >= 3
    }


def test_empty_spread_emits_null_band_not_zero():
    """r15 advice: under a subset filter no pinned query gets a
    spread — the band must be null, not [0, 0] (which would read as a
    zero noise floor in drift adjudication)."""
    detail = _worst_case_detail()
    detail["pinned_warm_spread"] = {}
    parsed = json.loads(bench.compact_line(detail))
    assert parsed["pinned_warm_band"] is None
