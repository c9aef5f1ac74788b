"""Property-based tests (hypothesis) for the pure kernels: base58
round-trip, keccak padding boundaries, signature parsing, u256 limb
math — fast, no Spark session needed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cherry_spark.functions.binary import b58decode_str, b58encode_bytes
from cherry_spark.functions.crypto import (
    canonical_event_signature,
    keccak256,
)
from cherry_spark.operators.decode_evm import (
    abi_type_to_spark,
    parse_event_signature,
)


@given(st.binary(min_size=0, max_size=128))
def test_base58_roundtrip(raw):
    assert b58decode_str(b58encode_bytes(raw)) == raw


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=30)  # pure-python keccak is slow; boundary coverage only
def test_keccak_deterministic_and_32_bytes(raw):
    h1, h2 = keccak256(raw), keccak256(raw)
    assert h1 == h2 and len(h1) == 32
    # rate-boundary paddings must not collide with the ±1-byte inputs
    assert keccak256(raw) != keccak256(raw + b"\x00")


@given(
    st.lists(
        st.sampled_from(["address", "uint256", "uint64", "bool", "bytes32", "string"]),
        min_size=1,
        max_size=6,
    )
)
def test_signature_parse_roundtrip(types):
    sig = "Evt(" + ", ".join(f"{t} p{i}" for i, t in enumerate(types)) + ")"
    parsed = parse_event_signature(sig)
    assert [p.abi_type for p in parsed.params] == types
    assert canonical_event_signature(sig) == f"Evt({','.join(types)})"
    for t in types:
        abi_type_to_spark(t)  # every parsed type maps to a Spark type


@given(st.integers(min_value=0, max_value=2**126 - 1))
def test_u256_limb_math(v):
    """The hi/lo limb decomposition used by the native converters."""
    hi, lo = divmod(v, 2**64)
    assert hi * 2**64 + lo == v
    b = v.to_bytes(32, "big")
    assert int.from_bytes(b[16:24], "big") == hi % 2**64 or hi < 2**64
    assert int.from_bytes(b[24:32], "big") == lo


@given(
    st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=500),
    st.integers(min_value=0, max_value=10**18),
)
def test_weighted_systematic_formula_exact(weights, m, o_seed):
    """The integer formula both engines execute for
    ext/sampling.py:weighted_systematic_sample, checked over random
    weights, sample sizes, and offsets: Σ multiplicities == m EXACTLY
    and every item's multiplicity is within floor/ceil of its
    proportional share — for ANY offset, not just the md5-derived one
    (the +W shift makes truncating division equal floor division on
    every numerator the formula can produce)."""
    W = sum(weights)
    o = o_seed % W
    start = 0
    total = 0
    for w in weights:
        end = start + w
        # the exact expression from the Spark plan / DuckDB oracle:
        # truncating int division after the +W shift
        picks = (end * m - o - 1 + W) // W - (start * m - o - 1 + W) // W
        # count of W-spaced lattice points in a length-(w*m) interval:
        # floor or ceil of w*m/W, exactly w*m/W when W divides it
        assert (w * m) // W <= picks <= -((-w * m) // W)
        total += picks
        start = end
    assert total == m


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10_000), max_size=12),
        max_size=10,
    ),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=200)
def test_incremental_topn_with_skip_equals_global(batches, n):
    """The lemma the bounded trained-gate refit rests on
    (streaming/continuous.py:trained_gate_fold): maintaining the N
    smallest (md5(id), id) rows incrementally — merging each batch,
    and SKIPPING any batch whose every row ranks strictly above the
    boundary of a full sample — equals the global top-N over all
    arrivals.  Eviction is monotone: once out, no later arrival can
    re-admit a row."""
    import hashlib

    def rank(i):
        return (hashlib.md5(str(i).encode()).hexdigest(), i)

    sample: list = []
    seen: set = set()
    for batch in batches:
        fresh = [i for i in dict.fromkeys(batch) if i not in seen]
        seen.update(fresh)
        if len(sample) >= n and fresh:
            boundary = max(rank(i) for i in sample)
            if all(rank(i)[0] > boundary[0] for i in fresh):
                continue  # the fold's skip fast path
        sample = sorted(sample + fresh, key=rank)[:n]
    expect = sorted(seen, key=rank)[:n]
    assert sorted(sample, key=rank) == expect


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=30),  # version
            st.integers(min_value=1, max_value=5),  # generation
        ),
        min_size=0,
        max_size=40,
    )
)
def test_manifest_name_roundtrip_and_resolution(entries):
    """The bus filename kernel (writers/manifest_bus.py): every
    (version, generation, key) the protocol can emit parses back
    exactly, and the per-version resolution picks the HIGHEST
    generation regardless of listing order."""
    from cherry_spark.writers.manifest_bus import _parse_name

    names = []
    for v, g in entries:
        n = (
            f"v{v:08d}_e1-b{v}.json"
            if g == 1
            else f"v{v:08d}g{g}_e1-b{v}.json"
        )
        assert _parse_name(n) == (v, g), n
        names.append((v, g, n))
    # strays the listing may contain are never parsed as entries
    for stray in ("__tmp_abc", "v0000000x.json", "vnope", "v1.json"):
        assert _parse_name(stray) is None
    # resolution model: max generation per version
    expect: dict[int, int] = {}
    for v, g in entries:
        expect[v] = max(g, expect.get(v, 0))
    latest: dict[int, int] = {}
    for v, g, _n in sorted(names):
        latest[v] = max(g, latest.get(v, 0))
    assert latest == expect
