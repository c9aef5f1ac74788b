"""BPE (byte-pair-encoding) vocabulary induction + application —
tokenizer LEARNING for a training-data engine (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"; public
algorithm).

The scale property that makes BPE learnable on Spark: after the first
aggregation the working set is the WORD-TYPE table (word, count) —
its size is vocabulary-shaped (10^5–10^6 rows for any natural-language
corpus), independent of corpus size.  100 TB of text costs one
tokenize+count pass; every merge iteration after that runs on the
word-type table only.

Learn loop shape per iteration (all DataFrame-native):

- adjacent-pair counts: one explode + one map-side-combinable sum over
  word types, weighted by word count;
- best pair: two 1-row aggregates (max count, then lexicographically
  smallest pair at that count — the deterministic tie-break) collected
  to the driver: the merge RULE is a driver-side constant by nature,
  same bounded-collect class as the decode ABI constants;
- apply the merge to every word type: a single left-fold
  (``F.aggregate``) that rebuilds each symbol array with non-
  overlapping left-to-right replacement — exactly the reference
  implementation's ``re.sub('l r', 'lr')`` semantics;
- ``localCheckpoint(eager=True)`` per round: the symbol column is
  rewritten every iteration, and an un-checkpointed loop grows the
  plan linearly until the driver chokes (the CLAUDE.md iterative-
  algorithm invariant, same as connected_components).

``bpe_apply`` segments new text with the learned merge ranks inside a
``mapInPandas`` lane that caches segmentations per word TYPE within
each Arrow batch — Python cost scales with distinct words, not tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def _word_types(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt): lowercased whitespace tokenization, one pass."""
    return (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), "\\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _merge_expr(syms, left: str, right: str):
    """Non-overlapping left-to-right replacement of the adjacent pair
    (left, right) with the concatenated symbol, as one array fold."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


_SEP = "\x00"  # never appears in a symbol: words are whitespace-split


def _merge_batch_expr(syms, rules: list[tuple[str, str]]):
    """Apply a SYMBOL-DISJOINT batch of merge rules in one left-to-right
    fold pass.  Disjointness (no symbol — including each rule's merged
    output — appears in any other rule, enforced by the greedy selector)
    means at most one rule can match at any boundary and no rule can
    consume or produce another rule's symbols, so one combined pass
    equals applying the rules' individual folds sequentially in rank
    order.  The rule set rides in a map literal keyed by
    ``left SEP right`` — per-element cost is one O(1) lookup however
    large the batch (a when-chain would cost O(batch) per element,
    erasing the batching win).  ``try_element_at``: ANSI mode makes
    plain map ``element_at`` throw on missing keys."""
    m = F.create_map(
        *[
            lit
            for left, right in rules
            for lit in (F.lit(left + _SEP + right), F.lit(left + right))
        ]
    )
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & F.try_element_at(
                m, F.concat(F.element_at(acc, -1), F.lit(_SEP), x)
            ).isNotNull(),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.try_element_at(
                        m, F.concat(F.element_at(acc, -1), F.lit(_SEP), x)
                    )
                ),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def select_disjoint_batch(
    ranked_pairs: list[tuple[str, str, int]], batch: int
) -> list[tuple[str, str, int]]:
    """Greedy prefix of (count DESC, pair lex ASC)-ranked pairs such
    that no symbol is shared BETWEEN selected rules and no rule's
    merged output collides with another rule's symbol — the standard
    batched-BPE compatibility condition.  Driver-side over a bounded
    candidate list (pure function, unit-tested directly)."""
    used: set[str] = set()
    out: list[tuple[str, str, int]] = []
    for left, right, n in ranked_pairs:
        merged = left + right
        if left in used or right in used or merged in used:
            continue
        out.append((left, right, n))
        used |= {left, right, merged}
        if len(out) >= batch:
            break
    return out


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    min_pair_count: int = 2,
    return_segmentations: bool = False,
    batch: int = 1,
):
    """Learn up to ``n_merges`` BPE merges from a corpus.

    Returns a DataFrame ``(rank, left, right, pair_count)`` — or, with
    ``return_segmentations``, a tuple of (merges, word-type DataFrame
    ``(word, cnt, syms)`` holding each word's final segmentation).
    Stops early when the best remaining pair occurs fewer than
    ``min_pair_count`` times (weighted).

    ``batch`` (r9, verdict item #6 — production merge counts): with
    ``batch=1`` each round learns exactly one merge (classic sequential
    BPE: one count job + one fold job per merge — fine at 100 merges,
    32k jobs at a 32k-merge production vocabulary).  With ``batch=N``
    each round counts pairs ONCE, greedily selects the top-N
    SYMBOL-DISJOINT pairs from a bounded driver-side candidate list
    (count DESC, pair lex ASC — ``select_disjoint_batch``), and applies
    them in one combined fold — O(n_merges / batch) Spark jobs.
    Batched selection is a deliberate, deterministic approximation of
    sequential BPE (a merge CREATED by an earlier rule in the same
    round cannot be selected until the next round; counts are
    round-start counts); rules within a round can never interact
    because their symbol sets are disjoint.  The pure-Python
    differential twin in tests replays the identical batched algorithm
    exactly."""
    spark = df.sparkSession
    words = _word_types(df, text_col).withColumn(
        "syms",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))),
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        pairs = words.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        ).groupBy("p").agg(F.sum("cnt").alias("n"))
        take = min(batch, n_merges - len(merges))
        if take <= 1:
            # ONE 1-row argmax: min(struct(-n, pair)) picks the highest
            # count, then the lexicographically smallest pair at that
            # count — the deterministic tie-break in a single job
            # (bounded driver collect; was a max + join + agg = 2 jobs,
            # measured 11.1 -> 10.1 s for 10 merges at sf0.1 — the
            # remaining cost is per-round fixed job latency + the
            # checkpointed merge fold, not this argmax)
            best = pairs.agg(
                F.min(
                    F.struct((-F.col("n")).alias("nn"), F.col("p").alias("p"))
                ).alias("b")
            ).collect()
            if not best or best[0]["b"] is None:
                break
            p, n = best[0]["b"]["p"], -best[0]["b"]["nn"]
            if n < min_pair_count:
                break
            selected = [(p["l"], p["r"], int(n))]
        else:
            # bounded candidate collect: 3x the batch + slack absorbs
            # greedy conflicts; a TakeOrderedAndProject, never a full
            # pair-table sort on one task
            cands = [
                (r["p"]["l"], r["p"]["r"], int(r["n"]))
                for r in pairs.filter(F.col("n") >= min_pair_count)
                .orderBy(F.desc("n"), F.col("p"))
                .limit(take * 3 + 10)
                .collect()
            ]
            selected = select_disjoint_batch(cands, take)
            if not selected:
                break
        for left, right, n in selected:
            merges.append((len(merges), left, right, n))
        rules = [(left, right) for left, right, _ in selected]
        if len(rules) == 1:
            new_syms = _merge_expr(F.col("syms"), *rules[0])
        else:
            new_syms = _merge_batch_expr(F.col("syms"), rules)
        words = words.withColumn("syms", new_syms).localCheckpoint(eager=True)

    merges_df = spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count long"
    )
    if return_segmentations:
        return merges_df, words
    return merges_df


def _sql_word_types(source: str, text_col: str) -> str:
    """DuckDB twin of :func:`_word_types` (lowercased ``\\s+`` split,
    empties dropped) as a CTE body."""
    return f"""(
        SELECT u.w AS word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM {source},
             UNNEST(string_split_regex(lower({text_col}), '\\s+')) AS u(w)
        WHERE u.w <> ''
        GROUP BY u.w
    )"""


# Symbol-string encoding for the SQL replay: every symbol boundary
# (including the string's two ends) carries exactly TWO spaces, e.g.
# ['h','i','</w>'] -> '  h  i  </w>  '.  Merging the pair (l, r) is
# then a plain left-to-right non-overlapping
#     replace(s, ' l  r ', ' lr ')
# and this EXACTLY reproduces the learn fold's semantics: the pattern
# consumes one space from each flanking boundary and the whole middle
# boundary; the replacement restores the flanking spaces, so the
# two-space invariant is preserved, adjacent occurrences (l r l r)
# still both match (each boundary donates one space to each side), and
# an overlapping run (a a a) cannot double-merge because the middle
# symbol's boundary was fully consumed — byte-for-byte the
# non-overlapping left-to-right scan `_merge_expr` implements.
# Symbols never contain spaces (words are whitespace-split), so no
# false substring match is possible: a pattern space can only align
# with a boundary.
_ENC = (
    "'  ' || regexp_replace({col}, '(.)', '\\1  ', 'g') || '</w>  '"
)


def bpe_oracle_ctes(
    n_merges: int,
    min_pair_count: int = 2,
    source: str = "documents",
    text_col: str = "text",
) -> tuple[str, str]:
    """Shared CTE chain replaying :func:`bpe_learn` (``batch=1``) in
    DuckDB: ``words`` -> ``w0`` -> per-round (``p{k}`` pair counts,
    ``b{k}`` best pair, ``w{k+1}`` merged strings).  Returns
    ``(cte_sql, final_words_cte_name)``.  Generated-SQL oracle in the
    trained-gate unrolled-CTE style (ext/train.py:trained_gate_oracle_sql);
    every count is BIGINT and the argmax tie-break (n DESC, l, r —
    byte-order string compare in both engines) matches the Spark
    ``min(struct(-n, p))`` argmax exactly.  Early stop is structural:
    ``b{k}`` filters ``n >= min_pair_count``; when it is empty the
    scalar subqueries go NULL and ``coalesce(replace(..), s)`` makes
    every later round a no-op, so the final UNION simply yields fewer
    rows — the same prefix ``bpe_learn`` returns."""
    ctes = [
        f"words AS MATERIALIZED {_sql_word_types(source, text_col)}",
        "w0 AS MATERIALIZED (SELECT cnt, "
        + _ENC.format(col="word")
        + " AS s FROM words)",
    ]
    for k in range(n_merges):
        ctes.append(
            f"""p{k} AS MATERIALIZED (
        SELECT sy[i] AS l, sy[i + 1] AS r, CAST(SUM(cnt) AS BIGINT) AS n
        FROM (SELECT cnt, string_split(trim(s), '  ') AS sy FROM w{k}),
             UNNEST(generate_series(1, len(sy) - 1)) AS g(i)
        GROUP BY 1, 2
    )"""
        )
        ctes.append(
            f"""b{k} AS MATERIALIZED (
        SELECT l, r, n FROM p{k}
        WHERE n >= {int(min_pair_count)}
        ORDER BY n DESC, l, r LIMIT 1
    )"""
        )
        ctes.append(
            f"""w{k + 1} AS MATERIALIZED (
        SELECT cnt,
               coalesce(replace(s,
                   (SELECT ' ' || l || '  ' || r || ' ' FROM b{k}),
                   (SELECT ' ' || l || r || ' ' FROM b{k})), s) AS s
        FROM w{k}
    )"""
        )
    return ",\n    ".join(ctes), f"w{n_merges}"


def bpe_learn_oracle_sql(
    n_merges: int,
    min_pair_count: int = 2,
    source: str = "documents",
    text_col: str = "text",
) -> str:
    """DuckDB twin of the ``bpe_learn(...).select(rank, left, right,
    pair_count)`` query (``batch=1``)."""
    ctes, _ = bpe_oracle_ctes(n_merges, min_pair_count, source, text_col)
    rounds = "\nUNION ALL\n".join(
        f'SELECT CAST({k} AS INTEGER) AS rank, l AS "left",'
        f' r AS "right", n AS pair_count FROM b{k}'
        for k in range(n_merges)
    )
    return f"WITH\n    {ctes}\n{rounds}"


def bpe_tokenize_stats_oracle_sql(
    n_merges: int,
    min_pair_count: int = 2,
    source: str = "documents",
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``bpe_apply`` + the per-language subword stats
    in queries/vocab.py:bpe_tokenize_stats.  Segmentation replays the
    learned merges per word TYPE (the same memoize-per-type shape the
    mapInPandas lane uses), then per-doc token counts come from the
    occurrence table; docs with zero words keep n_bpe_tokens = 0 via
    the LEFT JOIN, matching the mapInPandas row-per-doc contract."""
    ctes, final_w = bpe_oracle_ctes(
        n_merges, min_pair_count, source, text_col
    )
    seg = [
        "types AS MATERIALIZED (SELECT word, "
        + _ENC.format(col="word")
        + " AS s FROM words)"
    ]
    prev = "types"
    for k in range(n_merges):
        seg.append(
            f"""seg{k} AS MATERIALIZED (
        SELECT word,
               coalesce(replace(s,
                   (SELECT ' ' || l || '  ' || r || ' ' FROM b{k}),
                   (SELECT ' ' || l || r || ' ' FROM b{k})), s) AS s
        FROM {prev}
    )"""
        )
        prev = f"seg{k}"
    seg.append(
        f"""segn AS (
        SELECT word,
               CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_sub
        FROM {prev}
    )"""
    )
    seg.append(
        f"""doc_words AS (
        SELECT d.doc_id, u.w AS word
        FROM {source} d,
             UNNEST(string_split_regex(lower(d.{text_col}), '\\s+')) AS u(w)
        WHERE u.w <> ''
    )"""
    )
    seg.append(
        """per_doc AS (
        SELECT doc_id, CAST(SUM(n_sub) AS BIGINT) AS n_bpe_tokens
        FROM doc_words JOIN segn USING (word) GROUP BY doc_id
    )"""
    )
    body = ctes + ",\n    " + ",\n    ".join(seg)
    return f"""WITH
    {body}
SELECT d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(COALESCE(p.n_bpe_tokens, 0)) AS BIGINT) AS total_subwords,
       ROUND(CAST(CAST(SUM(d.n_chars) AS BIGINT) AS DOUBLE)
             / CAST(SUM(COALESCE(p.n_bpe_tokens, 0)) AS BIGINT),
             6) AS chars_per_subword
FROM {source} d LEFT JOIN per_doc p USING (doc_id)
GROUP BY d.lang"""


def _segment(word: str, rules: list[tuple[str, str]]) -> list[str]:
    """Segmentation of one word by replaying the merges IN RANK ORDER
    with the same non-overlapping left-to-right replacement the learn
    fold uses — so applying to the training corpus reproduces the
    learn loop's final segmentation exactly.  Runs inside the Arrow
    batch lane, memoized per word type."""
    syms = list(word) + [END_OF_WORD]
    for left, right in rules:
        if len(syms) < 2:
            break
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_apply(
    df: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """``(id_col, out_col array<string>, n_bpe_tokens)`` — segment each
    doc with the learned merges.  The merge table is a driver-side
    constant (vocabulary-sized) shipped into a ``mapInPandas`` lane;
    segmentations are memoized per word TYPE within each batch, so the
    Python cost is O(distinct words), not O(tokens)."""
    import pandas as pd

    if isinstance(merges, DataFrame):
        rules = [
            (r["left"], r["right"])
            for r in merges.orderBy("rank").collect()
        ]
    else:
        rules = list(merges)

    src = df.select(
        F.col(id_col),
        F.split(F.lower(F.col(text_col)), "\\s+").alias("__words"),
    )

    def run(batches):
        cache: dict[str, list[str]] = {}

        def seg(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                got = cache[w] = _segment(w, rules)
            return got

        for pdf in batches:
            toks = [
                [t for w in words if w for t in seg(w)]
                for words in pdf["__words"]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    out_col: toks,
                    "n_bpe_tokens": [len(t) for t in toks],
                }
            )

    schema = (
        f"{id_col} long, {out_col} array<string>, n_bpe_tokens long"
    )
    return src.mapInPandas(run, schema)
