"""Pure-Python reference differentials for the second-continuation
operators (the test_bpe precedent): seeded random inputs chosen to be
adversarial for each operator — tiny vocabulary (maximal phrase
overlap), shuffled event orders (funnel order sensitivity), sparse
series (gap-heavy grids) — each checked against a straightforward
Python replay."""

from __future__ import annotations

import datetime as dt
import math
import random


def test_phrase_search_matches_python_reference(spark):
    from cherry_spark.ext.phrase import phrase_search_topk

    rng = random.Random(0x9A5E)
    vocab = ["a", "b", "c", "d", "e"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
        for i in range(120)
    ]
    phrases = [(0, "a a"), (1, "b c b"), (2, "e e e"), (3, "c d")]

    # python reference: overlapping occurrence count by position scan
    def occ(text, phrase):
        toks, p = text.split(), phrase.split()
        if not toks or len(toks) < len(p):
            return 0
        return sum(
            1
            for s in range(len(toks) - len(p) + 1)
            if toks[s : s + len(p)] == p
        )

    expected = {}
    for pid, ph in phrases:
        counts = [(occ(t, ph), i) for i, t in docs]
        ranked = sorted(((c, i) for c, i in counts if c > 0), key=lambda x: (-x[0], x[1]))
        for c, i in ranked[:10]:
            expected[(pid, i)] = c

    corpus = spark.createDataFrame(docs, "doc_id long, text string")
    pdf = spark.createDataFrame(phrases, "phrase_id long, phrase string")
    got = {
        (r.phrase_id, r.doc_id): r.n_occurrences
        for r in phrase_search_topk(corpus, pdf, k=10).collect()
    }
    assert got == expected


def test_funnel_matches_python_replay(spark):
    from cherry_spark.ext.events import funnel_conversion

    rng = random.Random(0xF0B1)
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    stages = ["s0", "s1", "s2", "s3"]
    rows = []
    journeys = {}
    for u in range(60):
        n = rng.randint(0, 12)
        evs = sorted(
            (rng.randint(0, 10_000), rng.choice(stages + ["noise"]))
            for _ in range(n)
        )
        journeys[u] = evs
        rows += [(u, base + dt.timedelta(seconds=s), t) for s, t in evs]
    if not rows:
        rows = [(0, base, "s0")]

    # python replay: strictly-increasing first-qualifying chain
    def reach(evs):
        t_prev, depth = None, 0
        for k, stage in enumerate(stages):
            cand = [
                s
                for s, t in evs
                if t == stage and (t_prev is None or s > t_prev)
            ]
            if not cand:
                break
            t_prev = min(cand)
            depth = k + 1
        return depth

    depths = [reach(e) for e in journeys.values()]
    expected = [sum(1 for d in depths if d > k) for k in range(len(stages))]

    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r.stage_idx: r.n_users for r in funnel_conversion(ev, stages).collect()
    }
    assert [got[i] for i in range(len(stages))] == expected


def test_resample_gapfill_matches_python_replay(spark):
    from cherry_spark.ext.timeseries import resample_gapfill

    rng = random.Random(0x6A9F)
    base = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)
    width = 600
    rows = []
    for key in ["k1", "k2", "k3"]:
        for _ in range(rng.randint(1, 25)):
            rows.append(
                (
                    key,
                    base + dt.timedelta(seconds=rng.randint(0, 50_000)),
                    round(rng.uniform(-5, 5), 2),
                )
            )
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")

    # python replay with exact decimal-cent sums
    from collections import defaultdict

    buckets = defaultdict(lambda: [0, 0])  # (key,b) -> [n, cents]
    for key, ts, v in rows:
        b = (int(ts.timestamp()) // width) * width
        cell = buckets[(key, b)]
        cell[0] += 1
        cell[1] += round(v * 100)
    expected = {}
    for key in {k for k, _ in buckets}:
        bs = sorted(b for kk, b in buckets if kk == key)
        lo, hi = bs[0], bs[-1]
        last = None
        for b in range(lo, hi + width, width):
            if (key, b) in buckets:
                n, cents = buckets[(key, b)]
                last = cents / 100.0
                expected[(key, b)] = (n, cents / 100.0, last, 0)
            else:
                expected[(key, b)] = (0, None, last, 1)

    got = {
        (r.key, r.bucket_s): (r.n_events, r.bucket_value, r.filled_value, r.is_gap)
        for r in resample_gapfill(df, "key", "ts", "value", width).collect()
    }
    assert set(got) == set(expected)
    for cell in expected:
        g, e = got[cell], expected[cell]
        assert g[0] == e[0] and g[3] == e[3], cell
        for gv, ev in ((g[1], e[1]), (g[2], e[2])):
            if ev is None:
                assert gv is None
            else:
                assert gv is not None and math.isclose(gv, ev, abs_tol=1e-9)


def test_spike_report_matches_python_replay(spark):
    from cherry_spark.ext.timeseries import spike_report

    rng = random.Random(0x5B1E)
    base = dt.datetime(2024, 5, 1, tzinfo=dt.timezone.utc)
    width = 600
    rows = []
    # background noise on two keys + one planted burst bucket on k1
    for key, n in [("k1", 120), ("k2", 80)]:
        for _ in range(n):
            rows.append((key, base + dt.timedelta(seconds=rng.randint(0, 40_000))))
    burst = base + dt.timedelta(seconds=12_345)
    rows += [("k1", burst)] * 60
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")

    from collections import Counter

    counts = Counter(
        (k, (int(t.timestamp()) // width) * width) for k, t in rows
    )
    expected = {}
    for key in ("k1", "k2"):
        cs = {b: c for (k, b), c in counts.items() if k == key}
        S, Q, N = sum(cs.values()), sum(c * c for c in cs.values()), len(cs)
        for b, c in cs.items():
            dev = c * N - S
            expected[(key, b)] = (
                c, dev * dev, 9 * (N * Q - S * S),
                1 if dev > 0 and dev * dev > 9 * (N * Q - S * S) else 0,
            )

    got = {
        (r.key, r.bucket_s): (r.n_events, r.zsq_num, r.zsq_den, r.is_spike)
        for r in spike_report(ev, "event_type", "ts", width).collect()
    }
    assert got == expected
    # the planted burst IS flagged
    bb = (int(burst.timestamp()) // width) * width
    assert got[("k1", bb)][3] == 1
