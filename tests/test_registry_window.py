"""Certification-window invariants (round-7 verdict items #1/#2,
rotated to the ROUND-16 window per the round-15 verdict item #2).

The driver certifies exactly the first 50 registered queries, so the
window composition is load-bearing: these tests pin the round-16
contract against the archived driver artifacts — a reorder mistake
fails HERE, not in the next driver round."""

from __future__ import annotations

import json
import os

import cherry_spark.queries as Q
from cherry_spark.catalog import REGISTRY

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _round_keys(n: int) -> set[str]:
    with open(os.path.join(_REPO, f"CORRECTNESS_r{n:02d}.json")) as f:
        return set(json.load(f))


def _round_order(n: int) -> list[str]:
    with open(os.path.join(_REPO, f"CORRECTNESS_r{n:02d}.json")) as f:
        return list(json.load(f))


def test_r16_window_is_r13_remaining_plus_r14_head():
    window = list(REGISTRY)[:50]
    r15 = _round_keys(15)
    # no slot wasted on a row certified last round
    assert not set(window) & r15
    # the 49 r13-window rows not swept in r15 lead the window
    assert window[: len(Q._R13_REMAINING_R16)] == Q._R13_REMAINING_R16
    assert Q._R13_REMAINING_R16 == [
        n for n in _round_order(13) if n not in set(Q._R13_FIRST1_R15)
    ]
    # then the oldest row of the archived r14 artifact
    assert window[49:] == Q._R14_FIRST1_R16
    assert Q._R14_FIRST1_R16 == _round_order(14)[:1]
    # this sweep re-certifies the r13 cohort — the decode/dataset
    # lanes, the dedup-cluster family and the curation rows — whose
    # last driver rows predate the r14 bus/IVF + r15 store work
    assert {
        "u256_sum",
        "funnel_conversion",
        "decode_dynamic_abi",
        "budget_select_topq",
        "decode_fixedwidth",
        "include_all_blocks_scan",
    } <= set(window)


def test_r15_window_archived_matches_artifact():
    """The archived r15 window (the r17 plan derives from it) must be
    exactly the two derived groups, in artifact order."""
    assert (
        _round_order(15)
        == Q._R12_REMAINING_R15 + Q._R13_FIRST1_R15
    )
    assert Q._R13_FIRST1_R15 == _round_order(13)[:1]


def test_r17_prestaged_window_matches_artifacts():
    """The pre-staged r17 groups: the 49 r14-window rows not swept in
    r16 (artifact order) + the oldest r15-window row."""
    r14 = _round_order(14)
    assert Q._R14_REMAINING_R17 == [
        n for n in r14 if n not in set(Q._R14_FIRST1_R16)
    ]
    assert Q._R15_FIRST1_R17 == _round_order(15)[:1]
    assert len(Q._R14_REMAINING_R17) + len(Q._R15_FIRST1_R17) == 50


def test_r14_window_archived_matches_artifact():
    """The archived r14 window (the r16 plan derives from it) must be
    exactly the two derived groups, in artifact order."""
    assert (
        _round_order(14)
        == Q._R11_REMAINING_R14 + Q._R12_FIRST1_R14
    )
    assert Q._R12_FIRST1_R14 == _round_order(12)[:1]


def test_r13_window_archived_matches_artifact():
    """The archived r13 window (the r15 window derives from it) must be
    exactly the two derived groups, in artifact order."""
    assert (
        _round_order(13)
        == Q._R10_REMAINING_R13 + Q._R11_FIRST1_R13
    )
    assert Q._R11_FIRST1_R13 == _round_order(11)[:1]


def test_r16_prestaged_window_matches_artifacts():
    """The pre-staged r16 groups: the 49 r13-window rows not swept in
    r15 (artifact order) + the oldest r14-window row."""
    r13 = _round_order(13)
    assert Q._R13_REMAINING_R16 == [
        n for n in r13 if n not in set(Q._R13_FIRST1_R15)
    ]
    assert Q._R14_FIRST1_R16 == _round_order(14)[:1]
    assert len(Q._R13_REMAINING_R16) + len(Q._R14_FIRST1_R16) == 50


def test_r12_window_archived_matches_artifact():
    """The archived r12 window (the r14 plan derives from it) must be
    exactly the two derived groups, in artifact order."""
    assert (
        _round_order(12)
        == Q._R09_REMAINING_R12 + Q._R10_FIRST1_R12
    )
    assert Q._R10_FIRST1_R12 == _round_order(10)[:1]


def test_r14_prestaged_window_matches_artifacts():
    """The pre-staged r14 groups: the 49 r11-window rows not swept in
    r13 (artifact order) + the oldest r12-window row."""
    r11 = _round_order(11)
    assert Q._R11_REMAINING_R14 == [
        n for n in r11 if n not in set(Q._R11_FIRST1_R13)
    ]
    assert Q._R12_FIRST1_R14 == _round_order(12)[:1]
    assert len(Q._R11_REMAINING_R14) + len(Q._R12_FIRST1_R14) == 50


def test_r11_window_archived_matches_artifact():
    """The archived r11 window (the r13 plan derives from it) must be
    exactly the three pinned groups, in artifact order."""
    assert (
        _round_order(11)
        == Q._R08_REMAINING_R11 + Q._ADDED_R09 + Q._R09_FIRST1_R11
    )
    assert Q._R09_FIRST1_R11 == _round_order(9)[:1]


def test_r11_window_r08_group_matches_artifact():
    """_R08_REMAINING_R11 must be the r08 artifact order minus the 3
    rows the r10 window already refreshed."""
    r08 = _round_order(8)
    assert Q._R08_FIRST3_R10 == r08[:3]
    assert Q._R08_REMAINING_R11 == [
        n for n in r08 if n not in set(Q._R08_FIRST3_R10)
    ]
    assert len(Q._R08_REMAINING_R11) == 47


def test_r12_window_groups_match_artifacts():
    """The live r12 groups: the 49 r09-window rows not swept in r11
    (artifact order) + the oldest r10-window row."""
    r09 = _round_order(9)
    assert Q._R09_REMAINING_R12 == [
        n for n in r09 if n not in set(Q._R09_FIRST1_R11)
    ]
    assert Q._R10_FIRST1_R12 == _round_order(10)[:1]
    assert len(Q._R09_REMAINING_R12) + len(Q._R10_FIRST1_R12) == 50


def test_r13_prestaged_window_matches_artifacts():
    """The pre-staged r13 groups: the 49 r10-window rows not swept in
    r12 (artifact order) + the oldest r11-window row."""
    r10 = _round_order(10)
    assert Q._R10_REMAINING_R13 == [
        n for n in r10 if n not in set(Q._R10_FIRST1_R12)
    ]
    assert Q._R11_FIRST1_R13 == _round_order(11)[:1]
    assert len(Q._R10_REMAINING_R13) + len(Q._R11_FIRST1_R13) == 50


def test_r10_window_groups_match_artifacts():
    """The live r10 groups must be derivable from the archived
    artifacts: _R07_REMAINING_R10 == r07 order minus _R07_FIRST3 (the
    3 rows the r09 window already refreshed)."""
    r07 = _round_order(7)
    assert Q._R07_FIRST3 == r07[:3]
    assert Q._R07_REMAINING_R10 == [
        n for n in r07 if n not in set(Q._R07_FIRST3)
    ]
    assert len(Q._R07_REMAINING_R10) == 47


def test_r09_window_was_added_r08_plus_r06_stale_plus_r07_head():
    """The archived r09 window composition the r11/r12 plans derive
    from — pinned against the r09 artifact itself."""
    r09 = _round_order(9)
    assert r09 == Q._ADDED_R08 + Q._R06_STALE_R09 + Q._R07_FIRST3
    assert len(r09) == 50


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
        Q._R07_REMAINING_R10,
        Q._R08_FIRST3_R10,
        Q._R08_REMAINING_R11,
        Q._R09_FIRST1_R11,
        Q._ADDED_R09,
        Q._R09_REMAINING_R12,
        Q._R10_FIRST1_R12,
        Q._R10_REMAINING_R13,
        Q._R11_FIRST1_R13,
        Q._R11_REMAINING_R14,
        Q._R12_FIRST1_R14,
        Q._R12_REMAINING_R15,
        Q._R13_FIRST1_R15,
        Q._R13_REMAINING_R16,
        Q._R14_FIRST1_R16,
        Q._R14_REMAINING_R17,
        Q._R15_FIRST1_R17,
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


def test_r11_prestaged_window_matches_artifacts():
    """The pre-staged r11 groups must be derivable from the archived
    artifacts: _R08_REMAINING_R11 == r08 order minus _R08_FIRST3_R10,
    and _R09_FIRST1_R11 == the first row of the r09 artifact (the
    oldest r09-window row)."""
    r08 = _round_order(8)
    assert Q._R08_REMAINING_R11 == [
        n for n in r08 if n not in set(Q._R08_FIRST3_R10)
    ]
    assert Q._R09_FIRST1_R11 == _round_order(9)[:1]
    assert (
        len(Q._R08_REMAINING_R11)
        + len(Q._ADDED_R09)
        + len(Q._R09_FIRST1_R11)
        == 50
    )
    # r12 closes the cycle: 49 remaining r09-window rows + 1 r10 row
    r09_remaining = [
        n for n in _round_order(9) if n not in set(Q._R09_FIRST1_R11)
    ]
    assert len(r09_remaining) == 49


def test_registry_ceiling_policy_applies():
    """Ceiling 150 = 3 rounds x 50: any net addition past the ceiling
    requires a displacement.  The policy in queries/__init__.py names
    the twins."""
    assert len(REGISTRY) <= 150


def test_claude_md_rotation_section_has_no_literal_registry_count():
    """r9 verdict item #4: the fourth consecutive round shipped a stale
    registry headcount in prose.  Counts now live only in the
    import-time asserts; the live rotation docs must not state one."""
    import re

    with open(os.path.join(_REPO, "CLAUDE.md")) as f:
        text = f.read()
    section = text[text.index("## Certification-window rotation"):]
    bad = re.findall(r"registry \((\d+) rows", section)
    bad += re.findall(r"FULL registry \(\d+", section)
    bad += re.findall(r"registry holds \d+", section)
    assert not bad, f"literal registry counts in CLAUDE.md prose: {bad}"
