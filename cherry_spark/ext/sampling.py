"""Deterministic hash-based sampling and train/val/test splitting.

A large-scale training pipeline cannot use ``df.sample()`` for split
assignment: it is seeded per-partition, so any repartition, input
split change, or cluster resize reassigns rows between train and
eval — silent leakage. The industry-standard fix is a pure function
of a stable row key: hash the key, map the hash to [0, 1), and cut
that line by the split weights. Every engine, every run, every scale
assigns each row the same way — the property the reference's
deterministic batch replay relies on for reproducibility (reference
src/cherry_etl/pipeline.py runs the same query twice and expects the
same batches).

Mechanism: the first 4 hex chars of md5(key || salt) are compared
against hex-encoded cumulative thresholds. Lexicographic order on
equal-length lowercase hex IS numeric order, so the predicate is a
pure string comparison available verbatim in any SQL engine (the
DuckDB oracles use the identical expression) — no UDF, no bigint
conv, whole-stage codegen end to end. 16 bits of resolution bounds
split-fraction error at 2^-16 ≈ 0.0015%; raise ``hex_chars`` if a
finer cut is ever needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def split_hash(key: Column, salt: str = "", hex_chars: int = 4) -> Column:
    """Lowercase hex prefix of md5(key || salt) — the stable sampling
    coordinate of a row. Deterministic across runs, partitionings and
    engines (DuckDB: ``substr(md5(key || salt), 1, n)``)."""
    return F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, hex_chars
    )


def _thresholds(weights: list[float], hex_chars: int) -> list[str]:
    space = 16**hex_chars
    total = sum(weights)
    cuts, acc = [], 0.0
    for w in weights:
        acc += w / total
        cut = int(acc * space)
        # A cumulative share that reaches 1.0 needs a cut ABOVE every
        # hash. format(space) would be one char longer ('10000') and
        # lexicographic compare against 4-char hashes breaks ('1fff' <
        # '10000' is False). 'g' sorts after every hex char, so it
        # dominates all equal-length hex strings in any engine.
        cuts.append("g" if cut >= space else format(cut, f"0{hex_chars}x"))
    return cuts


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    salt: str = "",
    out_col: str = "split",
    hex_chars: int = 4,
) -> DataFrame:
    """Assign every row to a named split with probability proportional
    to its weight — deterministically in the row key, so re-running at
    any scale or partitioning never moves a row across splits."""
    names = list(splits)
    cuts = _thresholds([splits[n] for n in names], hex_chars)
    h = split_hash(F.col(key_col), salt, hex_chars)
    col = F.lit(names[-1])
    expr = None
    for name, cut in zip(names[:-1], cuts[:-1]):
        cond = h < F.lit(cut)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    col = expr.otherwise(names[-1]) if expr is not None else col
    return df.withColumn(out_col, col)


def split_case_sql(
    key_sql: str,
    splits: dict[str, float],
    salt: str = "",
    hex_chars: int = 4,
) -> str:
    """The DuckDB/ANSI CASE expression equivalent to ``hash_split`` —
    kept next to the Spark implementation so oracles can never drift."""
    names = list(splits)
    cuts = _thresholds([splits[n] for n in names], hex_chars)
    h = f"substr(md5(CAST({key_sql} AS VARCHAR) || '{salt}'), 1, {hex_chars})"
    arms = "".join(
        f" WHEN {h} < '{cut}' THEN '{name}'"
        for name, cut in zip(names[:-1], cuts[:-1])
    )
    return f"CASE{arms} ELSE '{names[-1]}' END"


def stratified_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    n_per_group: int,
    salt: str = "",
    hex_chars: int = 8,
) -> DataFrame:
    """Deterministic per-group quota sample: the ``n_per_group`` rows of
    each group with the smallest sampling hash (ties broken by key).
    The standard balanced-corpus move — cap each language/domain/source
    at a quota — expressed as one row_number window per group, stable
    under any partitioning or rescale for the same reason hash_split
    is. 8 hex chars (32 bits) keep hash ties negligible; the key
    tiebreak makes the result exactly deterministic regardless.

    SQL twin (same expression, any engine):
    ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY substr(md5(k||salt),
    1, 8), k) <= n``.
    """
    h = split_hash(F.col(key_col), salt, hex_chars)
    w = Window.partitionBy(group_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
    hex_chars: int = 4,
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen purely by the row key hash:
    stable under reshuffles and re-runs, and nested samples with the
    same salt are supersets of each other (fraction 0.1 ⊂ 0.2)."""
    cut = _thresholds([fraction, 1.0 - fraction], hex_chars)[0]
    return df.filter(split_hash(F.col(key_col), salt, hex_chars) < F.lit(cut))


def weighted_mix_key(
    df: DataFrame,
    source_col: str,
    key_col: str,
    weight: Column,
    stride_unit: int,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic weighted source-mixing key (stride scheduling):
    reading the corpus ordered by ``mix_key`` interleaves sources in
    proportion to their weights — the "data mixing" step that turns
    per-source corpora into one training stream (Pile/Dolma-style
    mixture weights).

    Stride scheduling emits item k of a weight-w source at virtual
    time (k + 1/2) / w; scaled by 2*stride_unit that is the exact
    integer ``(2*pos - 1) * (stride_unit / w)`` provided every weight
    divides ``stride_unit`` (caller guarantees; e.g. unit 12 for
    weights 1..4). All-integer math, so the key is engine-portable
    with no float drift.

    Scale shape: ONE window partitioned by source (row_number in
    md5-hash order — parallel across sources, the only shuffle), then
    a pure per-row expression. No global sort is needed to CREATE the
    key; consumers range-partition on it to read the epoch in order —
    exactly how you'd lay out 100 TB (write sorted-within-partitions
    by mix_key).
    """
    h = split_hash(F.col(key_col), salt, hex_chars=8)
    w = Window.partitionBy(source_col).orderBy(h, F.col(key_col))
    pos = F.row_number().over(w)
    # floor-division keeps the key integral and portable: w | unit, so
    # floor((2p-1)*unit / w) == (2p-1)*(unit/w) exactly (< 2^53).
    # DuckDB twin: ((2*pos - 1) * unit) // w
    num = (2 * pos.cast("long") - 1) * F.lit(stride_unit).cast("long")
    return df.withColumn(
        "mix_key", F.floor(num / weight.cast("long")).cast("long")
    )


def mixing_temperature(
    df: DataFrame,
    source_col: str = "source",
    tau: float = 0.7,
    budget: int = 10_000,
    size_col: str | None = None,
) -> DataFrame:
    """Temperature-scaled source mixture (the multilingual-corpus
    balancing rule, XLM-R / mT5 style): sampling weight per source
    ``p_s = n_s^τ / Σ_t n_t^τ`` — τ < 1 up-weights small sources
    relative to proportional sampling; τ = 1 is proportional, τ = 0
    uniform. Returns per source: ``(source, n_docs, weight,
    expected_samples)`` for a ``budget``-example epoch.

    Cross-engine determinism: ``pow`` is libm on both sides, so each
    ``n^τ`` is ROUND(·, 6) FIRST; the normalizing sum runs over those
    rounded DECIMAL(18,6) values (exact, order-free); the final ratio
    and ``floor(budget · p)`` are then identical double ops.

    Scale shape: one count aggregate keyed on the source (map-side
    partials), a 1-row broadcast of the normalizer — nothing else.

    ``size_col``: optional numeric column summed as each source's size
    instead of its row count — the seam for budgeting in TOKENS rather
    than documents (feed a precomputed ``n_tokens`` column from any
    real tokenizer). The output column stays named ``n_docs``; its
    unit is rows by default, Σ size_col when provided. Oracles embed
    the row-count default, so registered queries keep it.
    """
    size = (
        F.count(F.lit(1))
        if size_col is None
        else F.sum(F.col(size_col)).cast("long")
    )
    pw = F.round(F.pow(F.col("n_docs").cast("double"), F.lit(float(tau))), 6).cast(
        "decimal(18,6)"
    )
    counts = df.groupBy(F.col(source_col).alias("source")).agg(
        size.alias("n_docs")
    ).withColumn("pw", pw)
    total = counts.agg(F.sum("pw").alias("tot"))
    weight = F.col("pw").cast("double") / F.col("tot").cast("double")
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            F.round(weight, 6).alias("weight"),
            F.floor(F.lit(int(budget)) * weight).cast("long").alias(
                "expected_samples"
            ),
        )
    )


def mixing_temperature_oracle_sql(
    table: str = "documents",
    source_col: str = "source",
    tau: float = 0.7,
    budget: int = 10_000,
) -> str:
    """DuckDB twin of ``mixing_temperature`` — generated from the same
    τ/budget constants (repr-embedded so the doubles are identical)."""
    tau_s = repr(float(tau))
    return f"""
    WITH counts AS (
        SELECT {source_col} AS source, count(*) AS n_docs,
               CAST(round(pow(count(*)::DOUBLE, {tau_s}), 6)
                    AS DECIMAL(18,6)) AS pw
        FROM {table} GROUP BY 1
    ),
    tot AS (SELECT SUM(pw) AS tot FROM counts)
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           round(pw::DOUBLE / tot::DOUBLE, 6) AS weight,
           CAST(floor({int(budget)} * (pw::DOUBLE / tot::DOUBLE)) AS BIGINT)
               AS expected_samples
    FROM counts CROSS JOIN tot
    """


def mixing_apply(
    df: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    tau: float = 0.7,
    budget: int = 10_000,
    salt: str = "mix",
) -> DataFrame:
    """EXECUTE the temperature mixture: materialize the epoch sample
    the :func:`mixing_temperature` weights describe — each source
    contributes its ``expected_samples`` quota, filled by the
    deterministic smallest-hash-first rule (the stratified_sample
    move, with the per-source quota joined in from the tiny weight
    table instead of a constant). Closes the weights → sample loop:
    (key, source, sample_rank), sample_rank 1..quota within source.

    Scale shape: the weight table is sources-sized (broadcast); the
    data side pays one per-source window — identical cost to
    stratified_sample. When a source's quota exceeds its rows the
    whole source is taken (floor weights can do this only for tiny
    sources).
    """
    quotas = mixing_temperature(df, source_col, tau, budget).select(
        F.col("source").alias(source_col), "expected_samples"
    )
    h = split_hash(F.col(key_col), salt, 8)
    w = Window.partitionBy(source_col).orderBy(h, F.col(key_col))
    return (
        df.select(source_col, key_col)
        .withColumn("sample_rank", F.row_number().over(w))
        .join(F.broadcast(quotas), source_col)
        .filter(F.col("sample_rank") <= F.col("expected_samples"))
        .select(key_col, source_col, F.col("sample_rank").cast("long").alias("sample_rank"))
    )


def mixing_apply_oracle_sql(
    table: str = "documents",
    source_col: str = "source",
    key_col: str = "doc_id",
    tau: float = 0.7,
    budget: int = 10_000,
    salt: str = "mix",
) -> str:
    """DuckDB twin of :func:`mixing_apply` — the mixing_temperature
    CTEs plus the per-source quota-ranked fill."""
    tau_s = repr(float(tau))
    return f"""
    WITH counts AS (
        SELECT {source_col} AS source, count(*) AS n_docs,
               CAST(round(pow(count(*)::DOUBLE, {tau_s}), 6)
                    AS DECIMAL(18,6)) AS pw
        FROM {table} GROUP BY 1
    ),
    tot AS (SELECT SUM(pw) AS tot FROM counts),
    quota AS (
        SELECT source,
               CAST(floor({int(budget)} * (pw::DOUBLE / tot::DOUBLE)) AS BIGINT)
                   AS expected_samples
        FROM counts CROSS JOIN tot
    ),
    ranked AS (
        SELECT {key_col}, {source_col} AS source,
               ROW_NUMBER() OVER (
                   PARTITION BY {source_col}
                   ORDER BY substr(md5(CAST({key_col} AS VARCHAR) || '{salt}'), 1, 8),
                            {key_col}
               ) AS sample_rank
        FROM {table}
    )
    SELECT r.{key_col}, r.source AS {source_col},
           CAST(r.sample_rank AS BIGINT) AS sample_rank
    FROM ranked r JOIN quota q USING (source)
    WHERE r.sample_rank <= q.expected_samples
    """


def weighted_systematic_sample(
    df: "DataFrame",
    id_col: str,
    weight_col: str,
    m: int,
    salt: str = "",
    out_col: str = "n_picks",
) -> "DataFrame":
    """Exact weighted sampling without a global window: systematic
    (fixed-step) selection proportional to an integer weight.

    Lay the corpus on a line in the deterministic md5 order (the
    ext/packing.py coordinate), each item occupying an interval of
    its weight; drop exactly ``m`` equally-spaced points with a
    deterministic offset and pick every item whose interval contains
    a point. Properties (all exact, not in expectation):

    - total multiplicity Σ n_picks == m, always;
    - every item's multiplicity is floor(w*m/W) or ceil(w*m/W) — no
      weighted-reservoir variance, no ln()/pow() float keys whose
      last-ulp could flip a rank across engines (the reason this is
      the cross-engine-certifiable formulation of weighted sampling);
    - pure function of (id, weight, salt): stable under repartition,
      rescale, and engine.

    Scale shape: the only non-map stage is the two-phase prefix sum
    (256-bucket scan, see ext/packing.py:global_prefix_sum) plus one
    broadcast 1-row total — no global single-task window, no
    per-item RNG. The arithmetic lane is LONG: products are bounded
    by (W + w_max)·m, so at fixture scale (W≈5e6 chars, m=100) the
    headroom to 2^63 is ~10^9; a 100 TB corpus with a large m moves
    the same expressions to DECIMAL(38,0) (swap the casts — the
    formula is unchanged).

    The offset constant is md5-derived and EMBEDDED identically in
    the Spark plan and the DuckDB oracle (the portable-constant
    pattern of ext/dedup.py:_portable_hash_constants).

    ``id_col`` values are assumed UNIQUE (a duplicate id would occupy
    two line intervals and double its selection mass); the streaming
    maintainer (streaming/continuous.py:run_streaming_weighted_sample)
    enforces this by folding duplicates with max-weight before
    drawing.

    No counterpart in the reference (training-pipeline extension
    surface); nearest reference concern is deterministic batch
    replay (src/cherry_etl/pipeline.py).
    """
    import hashlib

    from cherry_spark.ext.packing import global_prefix_sum

    o_num = int(
        hashlib.md5(("offset" + salt).encode()).hexdigest()[:15], 16
    )
    clamped = df.select(
        F.col(id_col),
        F.greatest(F.col(weight_col).cast("long"), F.lit(1).cast("long")).alias(
            "_w"
        ),
    )
    pref = global_prefix_sum(clamped, id_col, "_w", salt=salt, out_col="_start")
    tot = clamped.agg(F.sum("_w").cast("long").alias("_tw"))
    off = F.pmod(F.lit(o_num), F.col("_tw"))
    j = (
        pref.crossJoin(F.broadcast(tot))
        .withColumn(
            "_en",
            (F.col("_start") + F.col("_w")) * F.lit(int(m))
            - off
            - F.lit(1)
            + F.col("_tw"),
        )
        .withColumn(
            "_sn",
            F.col("_start") * F.lit(int(m)) - off - F.lit(1) + F.col("_tw"),
        )
        .withColumn(
            out_col,
            (F.expr("_en div _tw") - F.expr("_sn div _tw")).cast("long"),
        )
    )
    return (
        j.filter(F.col(out_col) >= 1)
        .select(F.col(id_col), F.col("_w").alias("weight"), F.col(out_col))
    )


def weighted_systematic_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    weight_sql: str = "n_chars",
    m: int = 100,
    salt: str = "",
) -> str:
    """DuckDB twin of :func:`weighted_systematic_sample` — identical
    md5 order key, single-window prefix sum (fine at oracle scale),
    same embedded offset constant and integer-division formula."""
    import hashlib

    o_num = int(
        hashlib.md5(("offset" + salt).encode()).hexdigest()[:15], 16
    )
    picks = (
        f"((c.s + c.w) * {int(m)} - ({o_num} % t.tw) - 1 + t.tw) // t.tw"
        f" - (c.s * {int(m)} - ({o_num} % t.tw) - 1 + t.tw) // t.tw"
    )
    return f"""
    WITH w AS (
        SELECT {id_col} AS id,
               GREATEST(CAST({weight_sql} AS BIGINT), 1) AS w,
               md5(CAST({id_col} AS VARCHAR) || '{salt}') AS hkey
        FROM {table}
    ),
    c AS (
        SELECT id, w,
               CAST(COALESCE(SUM(w) OVER (ORDER BY hkey, id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS s
        FROM w
    ),
    t AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM w)
    SELECT c.id AS {id_col}, c.w AS weight,
           CAST({picks} AS BIGINT) AS n_picks
    FROM c, t
    WHERE {picks} >= 1
    """
