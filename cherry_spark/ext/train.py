"""Distributed training of the hashed-feature quality classifier —
the LEARNING half of the fastText/CCNet-style gate whose inference
shape is ``ext/quality.py:hashed_classifier_score`` (r8 verdict item
#7: "a real pipeline fits the weights").

Model: linear scorer over hashing-trick bag-of-words features.  A
document's score is the mean weight of its token buckets; training
fits the per-bucket weights from (document, binary label) pairs.

Training algorithm (all DataFrame aggregates, nothing driver-bound):

1. **Closed-form initialization**: ``w0[j] = mean label (micro-units)
   of the tokens hashing to bucket j`` — the centroid/Naive-Bayes-style
   estimator.  One map-combinable groupBy over the token table; on
   linearly separable vocabularies this is already exact.
2. **``n_iters`` full-batch gradient refinement steps** on the squared
   loss with LENGTH-NORMALIZED features (x_dj = count_dj / n_d, so
   prediction == the gate's mean-weight score): per doc
   ``resid = pred - y``; per bucket
   ``grad[j] = Σ_tokens∈j (resid_d div n_d)``;
   ``w[j] -= grad[j] div (N * lr_inv)``.  Each step is one broadcast
   join (the model is bucket-sized) + two map-combinable aggregates +
   one corpus equi-join — the same per-round shape as
   ``ext/graph.py:domain_pagerank``, with a ``localCheckpoint`` per
   round (the iterative-plan invariant).

Fixed-point integer lane end-to-end (the domain_pagerank trick):
labels live in micro-units (SCALE = 1e6), every division is the
truncating integer ``div`` (identical to DuckDB ``//`` — both truncate
toward zero), every sum is exact BIGINT, so the verdicts are
driver-certifiable bit-for-bit by a generated unrolled-CTE oracle
(``trained_gate_oracle_sql``) — no engine-aggregated double ever
reaches the hash compare.

Overflow bounds (BIGINT-safe by wide margins): |w0| ≤ SCALE;
normalized features keep |pred| ≤ max|w| and |resid| ≤ |pred| + SCALE;
per-token gradient contributions are ≤ |resid|, so
|grad_j| ≤ total_tokens × (2·max|w| + SCALE) — at 1e12 tokens and
weights ≤ 2·SCALE that is < 2^63 headroom of ~10^3; per-round updates
shrink |w| drift by lr_inv, keeping max|w| ≈ SCALE.

Scale shape at 100 TB: the corpus is touched by ONE tokenize+hash
pass (checkpointed token table), each refinement round moves only
(corpus-token, bucket) aggregates through map-side combine, and the
model state is a bucket-bounded table (n_buckets rows) that rides in
broadcast joins — never executor-resident Python state.

No reference counterpart (the reference has no ML ops); extends the
quality family (ext/quality.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cherry_spark.ext.dedup import tokens_col

SCALE = 1_000_000  # micro-unit fixed point for labels/weights/scores


def _bucket(tok, n_buckets: int):
    base = F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")
    return F.pmod(base, F.lit(int(n_buckets)))


def _token_table(
    df: DataFrame, label_col, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(id, y, bucket) — one row per TOKEN.  y = SCALE * label, constant
    per document."""
    return df.select(
        F.col(id_col).alias("id"),
        (F.lit(SCALE) * F.col(label_col).cast("long")).alias("y"),
        F.explode(tokens_col(F.col(text_col))).alias("tok"),
    ).select("id", "y", _bucket(F.col("tok"), n_buckets).alias("bucket"))


def train_hashed_classifier(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    n_iters: int = 2,
    lr_inv: int = 2,
) -> DataFrame:
    """Fit (bucket, w) BIGINT micro-unit weights from labeled docs.

    ``label_col`` must be 0/1 (cast to long).  Only buckets observed in
    the corpus get a row — unseen buckets are implicitly 0 (the gate
    coalesces).  Deterministic: every step is exact integer arithmetic
    over unordered sums."""
    tb = _token_table(df, label_col, id_col, text_col, n_buckets)
    # ONE corpus tokenize+hash pass; every round re-reads this table
    tb = tb.localCheckpoint(eager=True)
    n_docs = tb.select("id").distinct().count()  # bounded scalar
    den = int(n_docs * lr_inv)

    # closed-form init: per-bucket mean token label (micro-units)
    w = (
        tb.groupBy("bucket")
        .agg(F.sum("y").alias("ysum"), F.count(F.lit(1)).alias("tcnt"))
        .select("bucket", F.expr("ysum div tcnt").alias("w"))
        .localCheckpoint(eager=True)
    )

    for _ in range(n_iters):
        resid = (
            tb.join(F.broadcast(w), "bucket")
            .groupBy("id")
            .agg(
                F.sum("w").alias("wsum"),
                F.count(F.lit(1)).alias("n"),
                F.min("y").alias("y"),
            )
            .select("id", "n", F.expr("(wsum div n) - y").alias("resid"))
        )
        grad = (
            tb.join(resid, "id")
            .select("bucket", F.expr("resid div n").alias("c"))
            .groupBy("bucket")
            .agg(F.sum("c").alias("g"))
        )
        w = (
            w.join(grad, "bucket", "left")
            .select(
                "bucket",
                F.col("w").alias("w_old"),
                F.coalesce(F.col("g"), F.lit(0)).alias("g"),
            )
            .select("bucket", F.expr(f"w_old - (g div {den})").alias("w"))
            .localCheckpoint(eager=True)
        )
    return w


def trained_classifier_gate(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    threshold_micro: int = SCALE // 2,
) -> DataFrame:
    """Score docs with TRAINED weights: (id, n_tokens, score_micro,
    keep).  score_micro = mean bucket weight in micro-units (integer
    div), keep = score_micro > threshold_micro.  Unseen buckets weigh
    0 via the left join + coalesce — the plan is the broadcast-join
    variant promised in hashed_classifier_score's docstring."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(F.col(text_col))).alias("tok"),
    ).select("id", _bucket(F.col("tok"), n_buckets).alias("bucket"))
    agg = (
        toks.join(F.broadcast(weights), "bucket", "left")
        .select("id", F.coalesce(F.col("w"), F.lit(0)).alias("w"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("w").alias("wsum"),
        )
    )
    return agg.select(
        F.col("id").alias(id_col),
        "n_tokens",
        F.expr("wsum div n_tokens").alias("score_micro"),
        (F.expr("wsum div n_tokens") > F.lit(int(threshold_micro)))
        .cast("int")
        .alias("keep"),
    )


def train_then_gate(
    df: DataFrame,
    label_expr,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    n_iters: int = 2,
    lr_inv: int = 2,
    threshold_micro: int | None = None,
    weights: DataFrame | None = None,
) -> DataFrame:
    """Train on ``df`` labeled by the boolean ``label_expr`` column
    expression, then score the SAME corpus — the round-trip the
    registered query certifies.  Returns
    (id_col, n_tokens, score_micro, keep, y, thr_micro).

    ``threshold_micro=None`` (default) CALIBRATES the keep threshold
    at the integer midpoint of the two class mean scores —
    ``((s1 div n1) + (s0 div n0)) div 2`` — the standard
    post-training threshold calibration, still pure BIGINT (requires
    both classes present).  The 1-row threshold rides a broadcast
    crossJoin.

    ``weights``: a stored :func:`train_hashed_classifier` result
    (bucket, w) for the SAME (corpus version, label recipe,
    hyperparameters) — training is deterministic integer arithmetic
    and the table is BIGINT (lossless through parquet), so serving a
    stored model is bit-identical to retraining; per-run cost drops
    to the gate scoring + calibration passes (the bm25-index "train
    once per corpus version, score many" contract applied to model
    fitting)."""
    labeled = df.withColumn("__lbl", label_expr.cast("long"))
    w = weights
    if w is None:
        w = train_hashed_classifier(
            labeled, "__lbl", id_col, text_col, n_buckets, n_iters, lr_inv
        )
    gated = trained_classifier_gate(labeled, w, id_col, text_col, n_buckets)
    j = gated.drop("keep").join(
        labeled.select(F.col(id_col), F.col("__lbl").cast("int").alias("y")),
        id_col,
    )
    if threshold_micro is not None:
        return j.select(
            id_col,
            "n_tokens",
            "score_micro",
            (F.col("score_micro") > F.lit(int(threshold_micro)))
            .cast("int")
            .alias("keep"),
            "y",
            F.lit(int(threshold_micro)).cast("long").alias("thr_micro"),
        )
    # The calibration branch references j TWICE (the 1-row class-mean
    # aggregate and the verdict rows); j's tail exchanges diverge under
    # column pruning, so without an anchor the whole tokenize+score
    # pipeline (and the label tokenize) executes once per reference —
    # the r15 executed plan carried both Generates and all scans twice.
    # j is narrow (4 numeric cols per doc): a lazy localCheckpoint
    # scores the corpus once (guide §2.4; the budget_select_topq
    # pattern). The fixed-threshold branch above references j once and
    # stays checkpoint-free.
    j = j.localCheckpoint(eager=False)
    cal = j.agg(
        F.sum(F.when(F.col("y") == 1, F.col("score_micro"))).alias("s1"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("y") == 0, F.col("score_micro"))).alias("s0"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).cast("long").alias("n0"),
    ).select(F.expr("((s1 div n1) + (s0 div n0)) div 2").alias("thr_micro"))
    return j.crossJoin(F.broadcast(cal)).select(
        id_col,
        "n_tokens",
        "score_micro",
        (F.col("score_micro") > F.col("thr_micro")).cast("int").alias("keep"),
        "y",
        "thr_micro",
    )


def trained_gate_oracle_sql(
    label_sql: str,
    n_buckets: int = 256,
    n_iters: int = 2,
    lr_inv: int = 2,
    source: str = "documents",
    id_sql: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`train_then_gate` (calibrated-threshold
    form), generated with one CTE pair per refinement round (the
    domain_pagerank unrolled-oracle technique).  Exactness: the md5
    bucket, every sum (BIGINT), and every truncating division
    (`div` == `//`, both toward zero) are engine-identical;
    ``label_sql`` is a boolean SQL expression over ``source`` columns
    (e.g. a keyword-density predicate)."""
    toks = "list_filter(string_split(text, ' '), t -> t != '')"
    ctes = [
        f"""toks AS (
        SELECT {id_sql} AS id,
               CAST({SCALE} AS BIGINT)
                 * (CASE WHEN {label_sql} THEN 1 ELSE 0 END) AS y,
               ('0x' || substr(md5(u.tok), 1, 15))::BIGINT
                 % {int(n_buckets)} AS bucket
        FROM {source}, UNNEST({toks}) AS u(tok)
    )""",
        "nd AS (SELECT COUNT(DISTINCT id) AS n FROM toks)",
        """w0 AS (
        SELECT bucket,
               CAST(SUM(y) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS w
        FROM toks GROUP BY bucket
    )""",
    ]
    for i in range(n_iters):
        prev, cur = f"w{i}", f"w{i + 1}"
        ctes.append(
            f"""p{i + 1} AS (
        SELECT t.id, CAST(COUNT(*) AS BIGINT) AS n,
               (CAST(SUM(w.w) AS BIGINT) // CAST(COUNT(*) AS BIGINT))
                 - MIN(t.y) AS resid
        FROM toks t JOIN {prev} w USING (bucket) GROUP BY t.id
    )"""
        )
        ctes.append(
            f"""g{i + 1} AS (
        SELECT t.bucket, CAST(SUM(p.resid // p.n) AS BIGINT) AS g
        FROM toks t JOIN p{i + 1} p USING (id) GROUP BY t.bucket
    )"""
        )
        ctes.append(
            f"""{cur} AS (
        SELECT w.bucket,
               w.w - (COALESCE(g.g, 0) // (nd.n * {int(lr_inv)})) AS w
        FROM {prev} w LEFT JOIN g{i + 1} g USING (bucket) CROSS JOIN nd
    )"""
        )
    final_w = f"w{n_iters}"
    ctes.append(
        f"""gate AS (
        SELECT t.id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(w.w) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
                 AS score_micro,
               MIN(t.y) AS y
        FROM toks t JOIN {final_w} w USING (bucket) GROUP BY t.id
    )"""
    )
    ctes.append(
        f"""cal AS (
        SELECT ((CAST(SUM(score_micro) FILTER (WHERE y = {SCALE}) AS BIGINT)
                   // CAST(COUNT(*) FILTER (WHERE y = {SCALE}) AS BIGINT))
                + (CAST(SUM(score_micro) FILTER (WHERE y = 0) AS BIGINT)
                   // CAST(COUNT(*) FILTER (WHERE y = 0) AS BIGINT))) // 2
               AS thr_micro
        FROM gate
    )"""
    )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT id AS {id_sql}, n_tokens, score_micro,
           CAST(score_micro > cal.thr_micro AS INTEGER) AS keep,
           CAST(y // {SCALE} AS INTEGER) AS y,
           cal.thr_micro
    FROM gate CROSS JOIN cal
    """
