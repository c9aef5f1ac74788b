"""BPE vocabulary-induction queries (ext/bpe.py).

No SQL oracle BY NATURE: the learn loop is iterative with a driver-side
argmax per round (the explicitly-permitted rows-only category — like
the streaming gates); correctness is certified instead by the
pure-Python reference differential in tests/test_bpe.py, and the
apply lane is pinned to the learn lane by construction (rank-order
replay of the same fold)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_spark.catalog import query
from cherry_spark.sources.tables import load_table

_N_MERGES = 10


@query(
    "bpe_learn_merges",
    doc="BPE vocabulary induction (ext/bpe.py:bpe_learn — Sennrich "
    "2016): learn the first merges from the documents corpus. After "
    "one tokenize+count pass the working set is the WORD-TYPE table "
    "(vocabulary-shaped, corpus-size independent — the property that "
    "makes tokenizer training feasible at 100 TB); each round is one "
    "pair-count agg + a 1-row driver argmax + a localCheckpointed "
    "merge fold. Rows-only: iterative driver-side argmax is not "
    "SQL-expressible; differential-tested against a pure-Python "
    "reference (tests/test_bpe.py).",
)
def bpe_learn_merges(spark, sf_dir):
    from cherry_spark.ext.bpe import bpe_learn

    docs = load_table(spark, sf_dir, "documents")
    return bpe_learn(docs, n_merges=_N_MERGES).select(
        "rank", "left", "right", "pair_count"
    )


@query(
    "bpe_tokenize_stats",
    doc="Apply the learned BPE merges (ext/bpe.py:bpe_apply — "
    "mapInPandas, segmentation memoized per word TYPE so Python cost "
    "is O(distinct words)) and report per-language subword stats: "
    "docs, total subword tokens, chars per subword (the compression "
    "the vocabulary buys). Rows-only for the same reason as the learn "
    "query it composes.",
)
def bpe_tokenize_stats(spark, sf_dir):
    from cherry_spark.ext.bpe import bpe_apply, bpe_learn

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_learn(docs, n_merges=_N_MERGES)
    toks = bpe_apply(docs, merges)
    joined = docs.select("doc_id", "lang", "n_chars").join(toks, "doc_id")
    return (
        joined.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bpe_tokens").cast("long").alias("total_subwords"),
            F.round(
                F.sum("n_chars").cast("double") / F.sum("n_bpe_tokens"),
                6,
            ).alias("chars_per_subword"),
        )
    )
