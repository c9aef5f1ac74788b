"""Gopher/C4-style repetition and diversity signals for corpus
filtering: duplicate-n-gram fraction, top-n-gram dominance, distinct
token ratio, token entropy — the standard "remove boilerplate and
degenerate repetition before training" rule family (Rae et al. 2021,
"Scaling Language Models: ... Gopher", §A1.1 repetition filters).

Scale shape: one tokenize pass (posexplode + lead for 2-grams), two
hash aggregations keyed on (doc, term) then (doc) — map-side partial
counts, no self-joins, no arrays held per document. Everything is
native column expressions; a 100 TB corpus streams through.

The reference engine has no equivalent; this extends it the way the
repo's other curation operators do (ext/text.py, ext/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cherry_spark.ext.dedup import tokens_col


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition/diversity signals:

    - ``n_tokens``        total tokens
    - ``distinct_ratio``  distinct tokens / total (1.0 = no repetition)
    - ``dup_2gram_frac``  fraction of 2-gram occurrences that are
                          repeats of an earlier occurrence
    - ``top_2gram_frac``  occurrences of the most frequent 2-gram /
                          total 2-gram occurrences (dominance)
    - ``token_entropy``   Shannon entropy of the token distribution in
                          nats, ln(n) - Σ c·ln(c)/n, rounded to 6

    All ratios ROUND(·, 6): the entropy sum is a float aggregation
    whose order differs between engines in the last ulp.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "t0"),
    )
    tok_counts = toks.groupBy("id", "t0").agg(F.count(F.lit(1)).alias("c"))
    tstats = tok_counts.groupBy("id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("nd"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias(
            "slc"
        ),
    )
    w = Window.partitionBy("id").orderBy("pos")
    grams = (
        toks.select("id", "t0", F.lead("t0", 1).over(w).alias("t1"))
        .filter(F.col("t1").isNotNull())
        .select("id", F.concat_ws(" ", "t0", "t1").alias("g"))
    )
    gram_counts = grams.groupBy("id", "g").agg(F.count(F.lit(1)).alias("c"))
    gstats = gram_counts.groupBy("id").agg(
        F.sum("c").alias("tg"),
        F.count(F.lit(1)).alias("dg"),
        F.max("c").alias("topg"),
    )
    j = tstats.join(gstats, on="id", how="left")
    tg = F.col("tg")
    return j.select(
        F.col("id").alias(id_col),
        F.col("n").alias("n_tokens"),
        F.round(F.col("nd").cast("double") / F.col("n"), 6).alias("distinct_ratio"),
        F.round(
            F.when(tg > 0, F.lit(1.0) - F.col("dg").cast("double") / tg).otherwise(
                0.0
            ),
            6,
        ).alias("dup_2gram_frac"),
        F.round(
            F.when(tg > 0, F.col("topg").cast("double") / tg).otherwise(0.0), 6
        ).alias("top_2gram_frac"),
        F.round(
            F.log(F.col("n").cast("double")) - F.col("slc") / F.col("n"), 6
        ).alias("token_entropy"),
    )


def repetition_oracle_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of ``repetition_stats`` — generated beside the Spark
    implementation so the two cannot drift. Identical count arithmetic;
    the only float aggregate (entropy) is rounded to 6 on both sides."""
    toks = f"list_filter(string_split({text_col}, ' '), t -> t != '')"
    return f"""
    WITH toks AS (
        SELECT {id_col} AS id, unnest({toks}) AS tok FROM {table}
    ),
    tc AS (SELECT id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
    tstats AS (
        SELECT id, CAST(SUM(c) AS BIGINT) AS n, count(*) AS nd,
               SUM(c::DOUBLE * ln(c::DOUBLE)) AS slc
        FROM tc GROUP BY 1
    ),
    grams AS (
        SELECT {id_col} AS id,
               unnest(list_transform(
                   range(greatest(len({toks}) - 1, 0)),
                   i -> concat_ws(' ', {toks}[i+1], {toks}[i+2])
               )) AS g
        FROM {table}
    ),
    gc AS (SELECT id, g, count(*) AS c FROM grams GROUP BY 1, 2),
    gstats AS (
        SELECT id, CAST(SUM(c) AS BIGINT) AS tg, count(*) AS dg,
               CAST(MAX(c) AS BIGINT) AS topg
        FROM gc GROUP BY 1
    )
    SELECT t.id AS {id_col},
           t.n AS n_tokens,
           round(t.nd::DOUBLE / t.n, 6) AS distinct_ratio,
           round(CASE WHEN g.tg > 0 THEN 1.0 - g.dg::DOUBLE / g.tg
                      ELSE 0.0 END, 6) AS dup_2gram_frac,
           round(CASE WHEN g.tg > 0 THEN g.topg::DOUBLE / g.tg
                      ELSE 0.0 END, 6) AS top_2gram_frac,
           round(ln(t.n::DOUBLE) - t.slc / t.n, 6) AS token_entropy
    FROM tstats t LEFT JOIN gstats g USING (id)
    """
