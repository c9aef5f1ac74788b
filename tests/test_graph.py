"""Integer-lane PageRank (ext/graph.py): reference differential, mass
accounting, and dangling-node behavior."""

from __future__ import annotations

from cherry_spark.ext.graph import SCALE, pagerank


def _reference_pagerank(edges, n_iters=5, dn=85, dd=100):
    """Pure-Python integer replay of the documented contract."""
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    n = len(nodes)
    outdeg = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (SCALE * (dd - dn) // dd) // n
    rank = {v: SCALE // n for v in nodes}
    for _ in range(n_iters):
        in_mass = {v: 0 for v in nodes}
        for s, d in e:
            in_mass[d] += rank[s] // outdeg[s]
        dm = sum(rank[v] for v in nodes if v not in outdeg)
        dshare = dm // n
        rank = {v: base + (dn * (in_mass[v] + dshare)) // dd for v in nodes}
    return rank


EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 0), (4, 3),
    (5, 5),          # self-link
    (6, 2),          # 7, 8 appear only as dst -> dangling
    (6, 7), (3, 8),
]


def test_pagerank_matches_integer_reference(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: r["rank_fp"] for r in pagerank(df, n_iters=5).collect()}
    assert got == _reference_pagerank(EDGES, 5)


def test_pagerank_mass_and_ordering(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: r["rank_fp"] for r in pagerank(df, n_iters=5).collect()}
    n = len(got)
    # bounded truncation loss only: total mass within n+1 units per
    # iteration of SCALE
    assert SCALE - 6 * (n + 1) <= sum(got.values()) <= SCALE
    # the cycle hubs dominate: node 2 collects the most in-links and
    # node 0 receives ALL of node 2's mass (outdeg 1), so the top two
    # ranks are exactly {0, 2}
    top2 = sorted(got, key=got.get, reverse=True)[:2]
    assert set(top2) == {0, 2}
    # dangling nodes exist and still hold base + redistributed mass > 0
    assert got[8] > 0 and got[7] > 0


def test_pagerank_duplicate_edges_collapse(spark):
    df = spark.createDataFrame(EDGES + EDGES, "src long, dst long")
    a = {r["node"]: r["rank_fp"] for r in pagerank(df, n_iters=3).collect()}
    b = _reference_pagerank(EDGES, 3)
    assert a == b
