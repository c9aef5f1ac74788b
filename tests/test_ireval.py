"""Unit tests for ext/ireval.py against hand-computed IR metrics."""

from __future__ import annotations

import math


def test_retrieval_eval_hand_values(spark):
    from cherry_spark.ext.ireval import retrieval_eval

    # q1: rel docs {10, 11, 12}; retrieved ranks: 10@1, 99@2, 11@3
    # q2: rel docs {20};          retrieved misses entirely
    # q3: no relevant docs at all
    retrieved = spark.createDataFrame(
        [
            (1, 10, 1), (1, 99, 2), (1, 11, 3),
            (2, 98, 1), (2, 97, 2), (2, 96, 3),
            (3, 95, 1),
        ],
        "query_id long, doc_id long, rank long",
    )
    relevant = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20)],
        "query_id long, doc_id long",
    )
    got = {r.query_id: r for r in retrieval_eval(retrieved, relevant, k=3).collect()}

    q1 = got[1]
    assert (q1.n_rel_total, q1.n_rel_at_k, q1.first_rel_rank) == (3, 2, 1)
    assert abs(q1.recall_at_k - 2 / 3) < 1e-12
    assert q1.rr_fp == 1_000_000
    fp = lambda r: math.floor(1e6 / math.log2(r + 1))
    assert q1.dcg_fp == fp(1) + fp(3)
    assert q1.idcg_fp == fp(1) + fp(2) + fp(3)  # m = min(3, k=3)
    assert abs(q1.ndcg_6 - round(q1.dcg_fp / q1.idcg_fp, 6)) < 1e-12

    q2 = got[2]
    assert (q2.n_rel_at_k, q2.first_rel_rank, q2.rr_fp) == (0, None, 0)
    assert q2.recall_at_k == 0.0
    assert q2.idcg_fp == fp(1)  # m = min(1, 3) = 1
    assert q2.ndcg_6 == 0.0

    q3 = got[3]
    assert (q3.n_rel_total, q3.idcg_fp) == (0, 0)
    assert q3.recall_at_k is None and q3.ndcg_6 is None


def test_retrieval_eval_m_caps_at_k(spark):
    from cherry_spark.ext.ireval import retrieval_eval

    # 5 relevant docs but k=2: ideal DCG uses only ranks 1..2
    retrieved = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, doc_id long, rank long"
    )
    relevant = spark.createDataFrame(
        [(1, d) for d in (10, 11, 12, 13, 14)], "query_id long, doc_id long"
    )
    import math

    fp = lambda r: math.floor(1e6 / math.log2(r + 1))
    row = retrieval_eval(retrieved, relevant, k=2).collect()[0]
    assert row.idcg_fp == fp(1) + fp(2)
    assert row.dcg_fp == row.idcg_fp  # perfect ranking
    assert row.ndcg_6 == 1.0
