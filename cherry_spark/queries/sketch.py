"""Count-Min sketch queries (ext/sketch.py).

Two fixtures, both hash-certified end to end (the oracle replays the
sketch itself, not a tolerance band):

- ``cms_freq_report`` runs the sketch over the documents token stream
  with a deliberately snug width (16 cells per row for ~31 distinct
  tokens) so collisions are guaranteed and the report's overcount
  column carries real signal — and the min-over-depth reduction is
  visibly doing work.
- ``cms_heavy_hitters`` needs a SKEWED stream (every shipped fixture
  is near-uniform), so it synthesizes one deterministically from
  events — ``key = 'u' || floor(sqrt(event_id))`` gives key k a count
  of ~2k+1 (a clean linear-skew tail, 100 distinct keys over 10k
  events) — the same fixture-synthesis pattern the URL/HTML queries
  use (queries/web.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_spark.catalog import query
from cherry_spark.sources.tables import load_table

_TOKS = "list_filter(string_split(text, ' '), t -> t != '')"

_FREQ_DEPTH, _FREQ_WIDTH = 4, 16
_HH_DEPTH, _HH_WIDTH = 4, 64
# heavy-hitter threshold: keys estimated above stream_total/100
_HH_DIV = 100

_SKEW_KEY_SQL = "('u' || CAST(CAST(FLOOR(SQRT(event_id)) AS BIGINT) AS VARCHAR))"


def _skew_key_spark():
    return F.concat(
        F.lit("u"),
        F.floor(F.sqrt(F.col("event_id"))).cast("long").cast("string"),
    )


def _freq_oracle() -> str:
    from cherry_spark.ext.sketch import cms_build_sql, cms_probe_sql

    build = cms_build_sql("token", "toks", _FREQ_DEPTH, _FREQ_WIDTH)
    probe = cms_probe_sql(
        "token", "token", "top", "cms", _FREQ_DEPTH, _FREQ_WIDTH, "est_n"
    )
    return f"""
    WITH toks AS (
        SELECT t AS token FROM documents, UNNEST({_TOKS}) AS u(t)
    ),
    cms AS ({build}),
    top AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_n
        FROM toks GROUP BY 1
        ORDER BY exact_n DESC, token LIMIT 20
    ),
    est AS ({probe})
    SELECT t.token, t.exact_n, e.est_n,
           e.est_n - t.exact_n AS overcount
    FROM top t JOIN est e USING (token)
    """


@query(
    "cms_freq_report",
    oracle=_freq_oracle(),
    doc="Count-Min frequency estimates vs exact counts for the top-20 "
    "corpus tokens (ext/sketch.py): the sketch state is a 4x16 BIGINT "
    "cell table built with one bounded-cardinality groupBy (shuffle "
    "O(depth*width), never O(corpus)); probe is a broadcast join + "
    "min-over-depth. Width is deliberately snug so the overcount "
    "column exercises collisions; est_n >= exact_n everywhere by "
    "construction. Portable md5+linear hash family makes the DuckDB "
    "oracle replay the sketch bit-for-bit.",
)
def cms_freq_report(spark, sf_dir):
    from cherry_spark.ext.dedup import tokens_col
    from cherry_spark.ext.sketch import cms_build, cms_probe

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens_col(F.col("text"))).alias("token"))
    # ONE tokenize pass (r15): the sketch is built from the per-token
    # exact counts the report needs anyway — sum(count) per cell is
    # integer-identical to counting occurrences, the corpus is
    # tokenized/exchanged once (both consumers share the aggregate's
    # exchange), and md5 runs once per DISTINCT token
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    cms = cms_build(
        counts, "token", _FREQ_DEPTH, _FREQ_WIDTH, weight_col="exact_n"
    )
    top = counts.orderBy(F.col("exact_n").desc(), "token").limit(20)
    probed = cms_probe(top, cms, "token", _FREQ_DEPTH, _FREQ_WIDTH, "est_n")
    return probed.select(
        "token",
        "exact_n",
        "est_n",
        (F.col("est_n") - F.col("exact_n")).alias("overcount"),
    )


def _hh_oracle() -> str:
    from cherry_spark.ext.sketch import cms_build_sql, cms_probe_sql

    build = cms_build_sql("token", "keys", _HH_DEPTH, _HH_WIDTH)
    probe = cms_probe_sql(
        "token", "token", "counts", "cms", _HH_DEPTH, _HH_WIDTH, "est_n"
    )
    return f"""
    WITH keys AS (
        SELECT {_SKEW_KEY_SQL} AS token FROM events
    ),
    cms AS ({build}),
    counts AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_n
        FROM keys GROUP BY 1
    ),
    est AS ({probe}),
    total AS (SELECT CAST(SUM(exact_n) AS BIGINT) AS n FROM counts)
    SELECT c.token, c.exact_n, e.est_n,
           CAST(CASE WHEN c.exact_n >= t.n // {_HH_DIV}
                THEN 1 ELSE 0 END AS INTEGER) AS is_true_heavy
    FROM counts c JOIN est e USING (token) CROSS JOIN total t
    WHERE e.est_n >= t.n // {_HH_DIV}
    """


@query(
    "cms_heavy_hitters",
    oracle=_hh_oracle(),
    doc="Sketch-gated heavy-hitter detection over a synthesized "
    "skewed key stream (ext/sketch.py): candidates = keys whose CMS "
    "estimate clears total/100. Because estimates never underestimate, "
    "the candidate set provably contains EVERY true heavy hitter (no "
    "false negatives — the defining guarantee); is_true_heavy=0 rows "
    "are the priced false positives that fall through to an exact "
    "count. The threshold total is a broadcast 1-row aggregate; the "
    "sketch is the only corpus-sized pass.",
)
def cms_heavy_hitters(spark, sf_dir):
    from cherry_spark.ext.sketch import cms_build, cms_probe

    events = load_table(spark, sf_dir, "events")
    keys = events.select(_skew_key_spark().alias("token"))
    counts = keys.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    # sketch built from the exact counts already in hand (r15): one
    # key-synthesis pass, md5 per distinct key — integer-identical
    cms = cms_build(
        counts, "token", _HH_DEPTH, _HH_WIDTH, weight_col="exact_n"
    )
    total = counts.agg(F.sum("exact_n").cast("long").alias("n"))
    probed = cms_probe(counts, cms, "token", _HH_DEPTH, _HH_WIDTH, "est_n")
    thr = F.expr(f"n div {_HH_DIV}")
    return (
        probed.crossJoin(F.broadcast(total))
        .where(F.col("est_n") >= thr)
        .select(
            "token",
            "exact_n",
            "est_n",
            (F.col("exact_n") >= thr).cast("int").alias("is_true_heavy"),
        )
    )


_MG_K = 64

# MG stream = the sqrt-skew tail plus a planted ultra-hot key (10% of
# the stream), so the provably-heavy set is non-empty at EVERY scale
# factor: the sqrt tail's max relative frequency decays as sf grows
# (at sf0.1 no bare sqrt key clears N/(k+1)), while 10% always does.
_MG_KEY_SQL = (
    "(CASE WHEN event_id % 10 = 0 THEN 'hot' ELSE "
    + _SKEW_KEY_SQL
    + " END)"
)


def _mg_key_spark():
    return F.when(F.col("event_id") % 10 == 0, F.lit("hot")).otherwise(
        _skew_key_spark()
    )


def _mg_oracle() -> str:
    return f"""
    WITH keys AS (
        SELECT {_MG_KEY_SQL} AS token FROM events
    ),
    counts AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_n
        FROM keys GROUP BY 1
    ),
    total AS (SELECT CAST(SUM(exact_n) AS BIGINT) AS n FROM counts)
    SELECT c.token, c.exact_n,
           CAST(1 AS INTEGER) AS captured,
           CAST(1 AS INTEGER) AS weight_in_bounds
    FROM counts c CROSS JOIN total t
    WHERE c.exact_n * {_MG_K + 1} > t.n
    """


@query(
    "mg_heavy_verdict",
    oracle=_mg_oracle(),
    doc="Misra-Gries guarantee verdict (ext/sketch.py:mg_summary): "
    "per-partition MG in one bounded-memory mapInPandas pass (64 "
    "counters), partition summaries merged by the mergeable-summaries "
    "rule (sum, subtract the 65th-largest, clamp) — the summary "
    "CONTENT is partition-order dependent, so the query certifies the "
    "deterministic BOUND instead: every key with count*(k+1) > N must "
    "be captured with exact_n - N/(k+1) <= w <= exact_n (integer "
    "cross-multiplied, no division). The oracle emits the provably-"
    "heavy set with both verdicts true; any MG bug shows as a 0.",
)
def mg_heavy_verdict(spark, sf_dir):
    from cherry_spark.ext.sketch import mg_summary

    events = load_table(spark, sf_dir, "events")
    keys = events.select(_mg_key_spark().alias("token"))
    mg = mg_summary(keys, "token", k=_MG_K)
    counts = keys.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    total = counts.agg(F.sum("exact_n").cast("long").alias("n"))
    heavy = counts.crossJoin(F.broadcast(total)).where(
        F.col("exact_n") * (_MG_K + 1) > F.col("n")
    )
    joined = heavy.join(mg, "token", "left")
    in_bounds = (
        F.col("w").isNotNull()
        & (F.col("w") <= F.col("exact_n"))
        & ((F.col("exact_n") - F.col("w")) * (_MG_K + 1) <= F.col("n"))
    )
    return joined.select(
        "token",
        "exact_n",
        F.col("w").isNotNull().cast("int").alias("captured"),
        in_bounds.cast("int").alias("weight_in_bounds"),
    )
