"""BM25 semantics (ext/bm25.py): pure-Python reference differential on
a hand-built corpus (certifies the FORMULA, not just cross-engine
parity) and the rare-term ranking property."""

from __future__ import annotations

import math


def _py_bm25(corpus: dict[int, str], query: str, k1=1.2, b=0.75):
    tf = {d: {} for d in corpus}
    for d, text in corpus.items():
        for t in text.split():
            tf[d][t] = tf[d].get(t, 0) + 1
    dl = {d: sum(c.values()) for d, c in tf.items()}
    n = len(corpus)
    avgdl = sum(dl.values()) / n
    df = {}
    for c in tf.values():
        for t in c:
            df[t] = df.get(t, 0) + 1
    scores = {}
    for d in corpus:
        fp = 0
        for t in set(query.split()):
            if t not in tf[d]:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            contrib = (
                idf * tf[d][t] * (k1 + 1.0)
                / (tf[d][t] + k1 * (1.0 - b + b * (dl[d] / avgdl)))
            )
            fp += math.floor(contrib * 1_000_000)
        if fp:
            scores[d] = fp
    return scores


def test_bm25_matches_pure_python_reference(spark):
    from cherry_spark.ext.bm25 import bm25_topk

    corpus = {
        0: "the cat sat on the mat",
        1: "the dog chased the cat",
        2: "quantum flux capacitor theory",
        3: "the the the the filler filler",
        4: "cat cat cat dog",
    }
    cdf = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    qdf = spark.createDataFrame(
        [(100, "cat dog"), (101, "quantum theory")],
        "query_id long, text string",
    )
    got = {
        (r["query_id"], r["doc_id"]): r["score_fp"]
        for r in bm25_topk(cdf, qdf, k=5).collect()
    }
    for qid, qtext in [(100, "cat dog"), (101, "quantum theory")]:
        want = _py_bm25(corpus, qtext)
        mine = {d: s for (q, d), s in got.items() if q == qid}
        assert mine == want, (qid, mine, want)


def test_bm25_rare_term_outranks_common(spark):
    from cherry_spark.ext.bm25 import bm25_topk

    # doc 2 holds the corpus-rare query terms; docs stuffed with the
    # ubiquitous 'the' must not beat it
    corpus = [
        (0, "the the the the the"),
        (1, "the common words here the"),
        (2, "zygote xenon the"),
        (3, "the the common common"),
    ]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    qdf = spark.createDataFrame(
        [(0, "zygote xenon")], "query_id long, text string"
    )
    rows = bm25_topk(cdf, qdf, k=2).collect()
    assert rows[0]["doc_id"] == 2
    assert len(rows) == 1  # no other doc shares a query term


def test_bm25_prebuilt_index_equals_inline_and_no_rebuild(spark, tmp_path):
    """Store-served search must be BIT-identical to inline (the index
    is exact BIGINTs through parquet) and must not rewrite the store."""
    import os

    from pyspark.sql import functions as F

    from cherry_spark.writers.store import data_dir as dd
    from cherry_spark.ext.bm25 import (
        bm25_build_index,
        bm25_index_exists,
        bm25_topk,
    )

    docs = spark.createDataFrame(
        [
            (0, "spark query engine fast query"),
            (1, "query planner spark catalyst"),
            (2, "slow table scan"),
            (3, "fast vector engine"),
            (4, "unrelated words entirely"),
        ],
        "doc_id long, text string",
    )
    q = docs.filter(F.col("doc_id").isin(0, 2)).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    inline = sorted(tuple(r) for r in bm25_topk(docs, q, k=3).collect())
    idx = str(tmp_path / "bm25")
    assert not bm25_index_exists(idx)
    bm25_build_index(docs, idx)
    assert bm25_index_exists(idx)
    marker = os.path.getmtime(os.path.join(dd(f"{idx}/tf"), "_SUCCESS"))
    for _ in range(2):
        served = sorted(
            tuple(r)
            for r in bm25_topk(None, q, k=3, index_dir=idx).collect()
        )
        assert served == inline
    assert os.path.getmtime(os.path.join(dd(f"{idx}/tf"), "_SUCCESS")) == marker
