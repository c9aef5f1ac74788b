"""Token-budget data selection: greedy quality-ordered prefix fill.

Training-data curation routinely ends with "spend at most B tokens":
rank the candidate pool by a quality signal and admit documents in
rank order until the budget is exhausted (the selection step of
quality-filtered pretraining mixes; same shape as DSIR/DoReMi-style
pipelines once per-doc scores exist). The deterministic contract is a
PREFIX rule: take docs in (quality desc, id asc) order while the
inclusive cumulative token count stays <= budget — reproducible under
any partitioning, no knapsack backfill (a doc that overflows the
budget is dropped and nothing after it is reconsidered).

Scale shape — the naive ``SUM() OVER (ORDER BY quality DESC)`` is a
single-task window over the full corpus. Instead:

1. integer micro-quality ``q6 = round(quality * 1e6)`` (engine-portable
   because every quality signal in this repo is already round(.,6));
2. ``width_bucket(q6, 0, 1e6+1, n_buckets)`` — equal-WIDTH value
   buckets. The bucket is a monotone function of the sort key, and
   equal quality values always share a bucket, so
   (bucket desc, q6 desc, id asc) == (q6 desc, id asc): a range
   partitioner with zero sampling pass and no effect on the result
   (bucket boundaries only shape execution);
3. per-bucket token totals (n_buckets rows) -> tiny window for
   exclusive bucket offsets -> broadcast back;
4. budget-frontier pruning: a bucket whose offset already exceeds the
   budget cannot contribute a row — its docs are dropped BEFORE the
   per-bucket sort, so the windowed stage only ever touches the
   frontier prefix of the corpus, not all 100 TB;
5. per-bucket inclusive cumsum + offset, filter <= budget.

Equal-width buckets skew with the quality distribution (a corpus
whose scores all land in one band collapses to one bucket); for a
known-skewed signal pass explicit ``boundaries`` (e.g. from
``approxQuantile`` on a sample) — monotone boundaries preserve the
result for the same reason the default ones do.

No counterpart in the reference (training-pipeline extension surface,
like ext/packing.py's concat-and-chunk assignment, which uses the
same two-phase prefix-sum skeleton in HASH order rather than quality
order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_Q6_MAX = 1_000_001  # quality signals are round(.,6) in [0, 1]


def _with_quality_bucket(
    df: DataFrame, quality_col: str, n_buckets: int, boundaries: list[float] | None
) -> DataFrame:
    q6 = F.round(F.col(quality_col) * 1e6, 0).cast("long")
    if boundaries is None:
        bkt = F.width_bucket(q6, F.lit(0), F.lit(_Q6_MAX), F.lit(n_buckets))
    else:
        # explicit ascending quality boundaries (quantile-style);
        # width_bucket over a 1-element span per when-branch would be
        # noisier than a simple ordered when-chain
        bkt = F.lit(0)
        for i, b in enumerate(sorted(boundaries)):
            bkt = F.when(q6 >= F.lit(int(round(b * 1e6))), F.lit(i + 1)).otherwise(bkt)
    return df.withColumn("_q6", q6).withColumn("_bkt", bkt)


def budget_select(
    docs: DataFrame,
    budget: int,
    quality_col: str = "quality",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    boundaries: list[float] | None = None,
) -> DataFrame:
    """Docs admitted by the global prefix rule, with ``cum_tokens``
    (inclusive cumulative tokens in (quality desc, id asc) order).

    Output columns: the input columns + ``cum_tokens`` (BIGINT).
    """
    df = _with_quality_bucket(docs, quality_col, n_buckets, boundaries)
    # shared materialization point (r15, guide §2.4): df is referenced
    # twice (bucket totals + the live rows), and a projection-only
    # pipeline re-executes its whole upstream — here the quality/token
    # expressions — once per reference. A repartition anchor does NOT
    # work here: column pruning narrows the totals branch to
    # (_bkt, n_tokens), so the two exchanges differ and neither is
    # reused (the unigram/dsir lesson). The lazy localCheckpoint is
    # the fan-out tool that survives pruning — it materializes the
    # narrow post-projection rows once on first use and both consumers
    # read the checkpointed partitions.
    df = df.localCheckpoint(eager=False)
    totals = df.groupBy("_bkt").agg(F.sum(token_col).cast("long").alias("_tot"))
    # n_buckets rows: the only unpartitioned window runs over bucket
    # TOTALS, never over data (same bounded-window argument as
    # ext/packing.py phase 2)
    w_b = Window.orderBy(F.col("_bkt").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_bkt",
        F.coalesce(F.sum("_tot").over(w_b), F.lit(0).cast("long")).alias("_off"),
    )
    live = df.join(F.broadcast(offsets), "_bkt").filter(F.col("_off") <= F.lit(budget))
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(F.col("_q6").desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        live.withColumn(
            "cum_tokens",
            (F.col("_off") + F.sum(token_col).over(w_in)).cast("long"),
        )
        .filter(F.col("cum_tokens") <= F.lit(budget))
        .drop("_q6", "_bkt", "_off")
    )


def budget_select_grouped(
    docs: DataFrame,
    budget: int | dict[str, int],
    group_col: str,
    quality_col: str = "quality",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    default_budget: int = 0,
) -> DataFrame:
    """Per-group prefix rule: within each ``group_col`` value, admit docs
    in (quality desc, id asc) order while the group's inclusive
    cumulative tokens stay <= that group's budget.

    ``budget`` is one int for every group, or a dict {group: budget}
    (unlisted groups get ``default_budget``). Groups are the
    parallelism: one window partition per group, no global ordering
    anywhere — the natural shape for per-domain / per-language caps,
    where group counts are large and no single group is corpus-sized.
    Output columns: input + ``cum_tokens`` (BIGINT).
    """
    w_in = (
        Window.partitionBy(group_col)
        .orderBy(F.col(quality_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = docs.withColumn(
        "cum_tokens", F.sum(token_col).over(w_in).cast("long")
    )
    if isinstance(budget, dict):
        spark = docs.sparkSession
        btab = spark.createDataFrame(
            [(k, int(v)) for k, v in budget.items()], f"{group_col} string, _budget long"
        )
        out = out.join(F.broadcast(btab), group_col, "left").withColumn(
            "_budget", F.coalesce(F.col("_budget"), F.lit(int(default_budget)))
        )
        return out.filter(F.col("cum_tokens") <= F.col("_budget")).drop("_budget")
    return out.filter(F.col("cum_tokens") <= F.lit(int(budget)))


def budget_select_oracle_sql(
    budget: int, quality_sql: str, tokens_sql: str, source: str = "documents"
) -> str:
    """DuckDB twin of :func:`budget_select` — the naive single-window
    formulation, which at oracle scale is exactly the semantics the
    two-phase plan must reproduce bit-for-bit."""
    return f"""
    WITH q AS (
        SELECT doc_id, {quality_sql} AS quality, {tokens_sql} AS n_tokens
        FROM {source}
    ),
    c AS (
        SELECT doc_id, quality, n_tokens,
               SUM(n_tokens) OVER (
                   ORDER BY quality DESC, doc_id
                   ROWS UNBOUNDED PRECEDING
               ) AS cum_tokens
        FROM q
    )
    SELECT doc_id, quality, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= {int(budget)}
    """


def budget_select_grouped_oracle_sql(
    budgets: dict[str, int],
    default_budget: int,
    group_sql: str,
    quality_sql: str,
    tokens_sql: str,
    source: str = "documents",
) -> str:
    """DuckDB twin of :func:`budget_select_grouped`; the per-group budget
    CASE is generated from the SAME dict the Spark side broadcasts."""
    cases = " ".join(
        f"WHEN {group_sql} = '{k}' THEN {int(v)}" for k, v in sorted(budgets.items())
    )
    return f"""
    WITH q AS (
        SELECT doc_id, {group_sql}, {quality_sql} AS quality,
               {tokens_sql} AS n_tokens
        FROM {source}
    ),
    c AS (
        SELECT doc_id, {group_sql}, quality, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY {group_sql}
                   ORDER BY quality DESC, doc_id
                   ROWS UNBOUNDED PRECEDING
               ) AS cum_tokens
        FROM q
    )
    SELECT doc_id, {group_sql}, quality, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= (CASE {cases} ELSE {int(default_budget)} END)
    """
