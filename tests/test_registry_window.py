"""Certification-window invariants (round-7 verdict items #1/#2).

The driver certifies exactly the first 50 registered queries, so the
window composition is load-bearing: these tests pin the round-8
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


def test_window_is_never_certified_plus_r06_stale():
    window = list(REGISTRY)[:50]
    r06, r07 = _round_keys(6), _round_keys(7)
    # no slot wasted on a row certified last round
    assert not set(window) & r07
    # the 14 never-driver-certified queries lead the window
    assert set(Q._NEVER_CERTIFIED) <= set(window)
    assert window[: len(Q._NEVER_CERTIFIED)] == Q._NEVER_CERTIFIED
    # the rest are exactly r06-stale rows
    assert set(window) - set(Q._NEVER_CERTIFIED) <= r06
    # group arithmetic partitions r06 exactly
    assert set(Q._R06_STALE_R08) | set(Q._R06_STALE_R09) == r06
    assert not set(Q._R06_STALE_R08) & set(Q._R06_STALE_R09)


def test_window_groups_contain_only_registered_names():
    for group in (Q._NEVER_CERTIFIED, Q._R06_STALE_R08, Q._R06_STALE_R09):
        missing = [n for n in group if n not in REGISTRY]
        assert not missing, f"window group names not registered: {missing}"


def test_added_r08_is_exactly_the_post_r07_registrations():
    """_ADDED_R08 (the r09 window's leading group) must be EXACTLY the
    registered queries outside every r07-era set: the r07 driver
    window, the r07-frozen never-certified group, both r06-stale
    groups, and the policy past-window twin. Derived from the archived
    artifacts so a hand-edit of the pinned list (or a new registration
    that forgets to join it) fails here, not in round 9."""
    r07 = _round_keys(7)
    r07_era = (
        r07
        | set(Q._NEVER_CERTIFIED)
        | set(Q._R06_STALE_R08)
        | set(Q._R06_STALE_R09)
        | set(Q._PAST_WINDOW_FIRST)
    )
    derived = [n for n in REGISTRY if n not in r07_era]
    assert sorted(Q._ADDED_R08) == sorted(derived)
    # r09 window arithmetic stays exact
    assert len(Q._ADDED_R08) + len(Q._R06_STALE_R09) + 3 == 50
