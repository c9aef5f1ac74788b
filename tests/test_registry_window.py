"""Certification-window invariants (round-7 verdict items #1/#2,
rotated to the ROUND-9 window per the round-8 verdict item #1).

The driver certifies exactly the first 50 registered queries, so the
window composition is load-bearing: these tests pin the round-9
contract against the archived driver artifacts — a reorder mistake
fails HERE, not in the next driver round."""

from __future__ import annotations

import json
import os

import cherry_spark.queries as Q
from cherry_spark.catalog import REGISTRY

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _round_keys(n: int) -> set[str]:
    with open(os.path.join(_REPO, f"CORRECTNESS_r0{n}.json")) as f:
        return set(json.load(f))


def _round_order(n: int) -> list[str]:
    with open(os.path.join(_REPO, f"CORRECTNESS_r0{n}.json")) as f:
        return list(json.load(f))


def test_r09_window_is_added_r08_plus_r06_stale_plus_r07_head():
    window = list(REGISTRY)[:50]
    r07, r08 = _round_keys(7), _round_keys(8)
    # no slot wasted on a row certified last round
    assert not set(window) & r08
    # the 33 never-driver-certified round-8 additions lead the window
    assert window[: len(Q._ADDED_R08)] == Q._ADDED_R08
    # then the 14 remaining r06-stale rows
    assert window[33:47] == Q._R06_STALE_R09
    # then the first 3 rows of the archived r07 window, in artifact order
    assert window[47:] == Q._R07_FIRST3
    assert Q._R07_FIRST3 == _round_order(7)[:3]
    assert set(Q._R07_FIRST3) <= r07


def test_r08_window_groups_still_partition_r06():
    """The archived group data the r10/r11 plans derive from."""
    r06 = _round_keys(6)
    assert set(Q._R06_STALE_R08) | set(Q._R06_STALE_R09) == r06
    assert not set(Q._R06_STALE_R08) & set(Q._R06_STALE_R09)
    # r08's window was exactly the never-certified 14 + 36 stale rows
    assert set(Q._NEVER_CERTIFIED) | set(Q._R06_STALE_R08) == _round_keys(8)


def test_window_groups_contain_only_registered_names():
    for group in (
        Q._ADDED_R08,
        Q._R06_STALE_R09,
        Q._R07_FIRST3,
        Q._NEVER_CERTIFIED,
        Q._R06_STALE_R08,
    ):
        missing = [n for n in group if n not in REGISTRY]
        assert not missing, f"window group names not registered: {missing}"


def test_added_r08_is_exactly_the_post_r07_registrations():
    """_ADDED_R08 must be EXACTLY the registered queries outside every
    r07-era set: the r07 driver window, the r07-frozen never-certified
    group, both r06-stale groups, and the policy past-window twin.
    Derived from the archived artifacts so a hand-edit of the pinned
    list (or a new registration that forgets to join a window plan)
    fails here, not in a driver round."""
    r07 = _round_keys(7)
    r07_era = (
        r07
        | set(Q._NEVER_CERTIFIED)
        | set(Q._R06_STALE_R08)
        | set(Q._R06_STALE_R09)
        | set(Q._PAST_WINDOW_FIRST)
        | set(Q._ADDED_R09)
    )
    derived = [n for n in REGISTRY if n not in r07_era]
    assert sorted(Q._ADDED_R08) == sorted(derived)
    # r09 window arithmetic stays exact
    assert len(Q._ADDED_R08) + len(Q._R06_STALE_R09) + len(Q._R07_FIRST3) == 50


def test_r10_plan_complement_is_well_defined():
    """r10 sweeps the 47 r07 rows not already in the r09 window, plus
    the 3 oldest r08-window rows; r11 takes the remaining 45.  Check
    the arithmetic holds against the artifacts so the plan note in
    queries/__init__.py cannot rot silently."""
    r07, r08 = _round_order(7), _round_order(8)
    r07_remaining = [n for n in r07 if n not in set(Q._R07_FIRST3)]
    assert len(r07_remaining) == 47
    assert len(r08) == 50
    # 47 + 3 oldest r08 rows = 50; r11 = remaining 45 r08 rows (+ head
    # of the r09 window as it goes stale) — fits the 150-row ceiling
    assert len(REGISTRY) <= 150


def test_registry_ceiling_leaves_headroom_or_policy_applies():
    """148 registered, ceiling 150: at most 2 net additions without a
    displacement.  The policy in queries/__init__.py names the twins."""
    assert len(REGISTRY) <= 150


def test_r10_prestaged_window_matches_artifacts():
    """The pre-staged r10 groups must be derivable from the archived
    artifacts: _R07_REMAINING_R10 == r07 order minus _R07_FIRST3, and
    _R08_FIRST3_R10 == the first 3 rows of the r08 artifact."""
    r07 = _round_order(7)
    assert Q._R07_REMAINING_R10 == [
        n for n in r07 if n not in set(Q._R07_FIRST3)
    ]
    assert Q._R08_FIRST3_R10 == _round_order(8)[:3]
    # r11 closes the books: 47 remaining r08 + 2 r09 adds + 1 = 50
    r08_remaining = [n for n in _round_order(8) if n not in set(Q._R08_FIRST3_R10)]
    assert len(r08_remaining) + len(Q._ADDED_R09) + 1 == 50
