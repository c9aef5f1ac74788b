"""Relational core: the query-model semantics of SURVEY.md §2.2-§2.5.

Each query mirrors a capability of the reference (file:line cited per
query) re-expressed on the TPC-H-ish fixture tables.  Filters and
projections are plain DataFrame ops so Catalyst pushes them into the
Parquet scan — the Spark-native equivalent of the reference evaluating
its query object server-side (reference examples/erc20_custom.py:98-137).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_spark.catalog import query
from cherry_spark.sources.tables import load_table

# exact, associative intermediate for double aggregation (see catalog.py)
_DEC = "decimal(18,2)"
_DEC_PROD = "decimal(24,6)"


@query(
    "project_select",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
    FROM lineitem
    """,
    doc="Column projection → Parquet column pruning. "
    "Reference: boolean field selectors, examples/erc20_custom.py:122-135.",
)
def project_select(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )


@query(
    "filter_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate <= TIMESTAMP '1996-12-31'
    """,
    doc="Inclusive range predicate → pushed Parquet filter. "
    "Reference: from_block/to_block bounds, examples/jup_swap.py:81-82.",
)
def filter_range(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1996-12-31").cast("timestamp"))
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
    )


@query(
    "filter_in_set",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'O' AND o_orderpriority IN ('1-URGENT', '2-HIGH'))
       OR (o_orderstatus = 'F' AND o_orderpriority = '5-LOW')
    """,
    doc="OR-of-ANDs of in-set predicates. Reference: list = OR within a "
    "field, AND across fields, OR across requests — LogRequest, "
    "examples/erc20_custom.py:104-120.",
)
def filter_in_set(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    cond = (
        (F.col("o_orderstatus") == "O")
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ) | ((F.col("o_orderstatus") == "F") & (F.col("o_orderpriority") == "5-LOW"))
    return o.filter(cond).select("o_orderkey", "o_orderstatus", "o_orderpriority")


@query(
    "filter_prefix",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_name LIKE 'large%' AND p_brand IN ('Brand#11', 'Brand#15', 'Brand#19')
    """,
    doc="Prefix match + in-set — the InstructionRequest "
    "program_id/discriminator shape, examples/jup_swap.py:115-122.",
)
def filter_prefix(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").startswith("large")
        & F.col("p_brand").isin("Brand#11", "Brand#15", "Brand#19")
    ).select("p_partkey", "p_name", "p_brand")


@query(
    "semi_join_related",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49
    )
    """,
    doc="include_blocks/include_transactions = server-side semi-join of "
    "parent rows against matches, examples/erc20_custom.py:118.",
)
def semi_join_related(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "trace_query_model",
    oracle="""
    SELECT o.o_orderkey AS block_number, o.o_custkey AS tx_value
    FROM orders o
    WHERE o.o_orderkey BETWEEN 64 AND 30000
      AND EXISTS (
        SELECT 1 FROM lineitem t
        WHERE t.l_orderkey = o.o_orderkey
          AND t.l_orderkey BETWEEN 64 AND 30000
          AND t.l_partkey % 16 IN (3, 7)
          AND t.l_linenumber % 3 IN (0, 1)
      )
    """,
    doc="EVM traces family through the REAL query-model path "
    "(model.py:apply_evm_query): TraceRequest sighash/call_type in-set "
    "filter on a synthesized traces table, include_transactions "
    "semi-joins the transactions parents. Reference declares the "
    "traces table in EvmValidateBlockDataConfig (config.py:121-125); "
    "the filter surface mirrors the public HyperSync trace query.",
)
def trace_query_model(spark, sf_dir):
    from cherry_spark.model import EvmQuery, TraceRequest, apply_evm_query

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    traces = li.select(
        F.col("l_orderkey").alias("block_number"),
        F.lit(0).cast("long").alias("transaction_index"),
        F.unhex(F.lpad(F.hex(F.col("l_suppkey")), 40, "0")).alias("from"),
        F.unhex(F.lpad(F.hex(F.col("l_partkey")), 40, "0")).alias("to"),
        F.when(F.col("l_linenumber") % 3 == 0, "call")
        .when(F.col("l_linenumber") % 3 == 1, "delegatecall")
        .otherwise("staticcall")
        .alias("call_type"),
        F.unhex(F.lpad(F.hex(F.pmod(F.col("l_partkey"), F.lit(16))), 8, "0")).alias(
            "sighash"
        ),
    )
    transactions = o.select(
        F.col("o_orderkey").alias("block_number"),
        F.lit(0).cast("long").alias("transaction_index"),
        F.col("o_custkey").alias("tx_value"),
    )
    blocks = o.select(F.col("o_orderkey").alias("number"))
    out = apply_evm_query(
        {"blocks": blocks, "transactions": transactions, "traces": traces},
        EvmQuery(
            from_block=64,
            to_block=30000,
            traces=[
                TraceRequest(
                    sighash=[(3).to_bytes(4, "big"), (7).to_bytes(4, "big")],
                    call_type=["call", "delegatecall"],
                    include_transactions=True,
                )
            ],
            fields={"transactions": ["block_number", "tx_value"]},
        ),
    )
    return out["transactions"]


@query(
    "join_inner_eq",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           l.l_extendedprice * (1 - l.l_discount) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    """,
    doc="Inner equi-join enriching facts with parent attrs — the "
    "transfers⋈blocks join, examples/erc20_custom.py:67-70.",
)
def join_inner_eq(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return li.join(o, li.l_orderkey == o.o_orderkey, "inner").select(
        "l_orderkey",
        "l_linenumber",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@query(
    "join_composite_key",
    oracle=f"""
    WITH per_supp AS (
        SELECT l_orderkey, l_suppkey,
               SUM(CAST(l_quantity AS {_DEC})) AS supp_qty_dec
        FROM lineitem GROUP BY l_orderkey, l_suppkey
    )
    SELECT l.l_orderkey, l.l_suppkey, l.l_linenumber,
           CAST(p.supp_qty_dec AS DOUBLE) AS supp_qty
    FROM lineitem l
    JOIN per_supp p ON l.l_orderkey = p.l_orderkey AND l.l_suppkey = p.l_suppkey
    """,
    doc="Composite-key equi-join — reference joins on "
    "[block_slot, transaction_index], examples/jup_swap.py:55.",
)
def join_composite_key(spark, sf_dir):
    # The per-(orderkey, suppkey) sum re-attached to every line is a
    # window over the SAME partitioning the agg+join form needed twice
    # (guide §2.4): one exchange + one sort replace agg + two sorted
    # join sides. Row-identical to the join on the fixtures (keys are
    # never null; exceptAll probe 0/0 at sf0.1) and the DECIMAL window
    # sum is the same fold as the grouped sum. Quiet alternated A/B at
    # sf0.1: 0.931 -> 0.620 s median.
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey", "l_suppkey")
    return li.select(
        "l_orderkey",
        "l_suppkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast(_DEC)).over(w).cast("double").alias("supp_qty"),
    )


@query(
    "join_left_dim",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, n.n_name AS nation_name, r.r_name AS region_name
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    doc="Left-join small-dim enrichment (broadcast both dims) — the "
    "amm/token dim joins, examples/jup_swap.py:222-225.",
)
def join_left_dim(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


@query(
    "agg_min_max",
    oracle="""
    SELECT MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
           strftime(MIN(o_orderdate), '%Y-%m-%d') AS min_date,
           strftime(MAX(o_orderdate), '%Y-%m-%d') AS max_date
    FROM orders
    """,
    doc="MIN/MAX scalar agg (progress reporting), examples/erc20_custom.py:61-63.",
)
def agg_min_max(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("min_date"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("max_date"),
    )


@query(
    "agg_resume_cursor",
    oracle="""
    SELECT CAST(epoch_us(MAX(o_orderdate)) AS BIGINT) AS cursor_us,
           COUNT(*) AS n_rows
    FROM orders
    """,
    doc="MAX(cursor) resume pattern for incremental ingestion, "
    "examples/erc20_custom.py:41-50,90.",
)
def agg_resume_cursor(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    # parquet dates load as TIMESTAMP_NTZ; cast to TIMESTAMP is exact
    # because the session TZ is pinned to UTC (session.py)
    return o.agg(
        F.unix_micros(F.max("o_orderdate").cast("timestamp")).alias("cursor_us"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "groupby_sum",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS {_DEC})) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {_DEC_PROD})) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped hash aggregate with map-side partial agg. "
    "Group-by is product surface via escape hatches (SURVEY §2.4).",
)
def groupby_sum(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-12-01").cast("timestamp")
    )
    sum_qty_dec = F.sum(F.col("l_quantity").cast(_DEC))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        sum_qty_dec.cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("sum_base_price"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC_PROD)
        )
        .cast("double")
        .alias("sum_disc_price"),
        (sum_qty_dec.cast("double") / F.count(F.lit(1))).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "groupby_multi",
    oracle=f"""
    SELECT c.c_mktsegment, o.o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS {_DEC})) AS DOUBLE) AS total_value
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment, o.o_orderstatus
    """,
    doc="Multi-key group-by over a join (SURVEY §2.4).",
)
def groupby_multi(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("total_value"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
    doc="Exact distinct aggregation (SURVEY §2.4; approx_count_distinct "
    "is the scale path but is not oracle-comparable).",
)
def agg_count_distinct(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@query(
    "topk_orderby_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    doc="Top-k: Spark plans TakeOrderedAndProject (no global sort). "
    "Reference monitor query, examples/erc20_custom.py:80. "
    "Tie-broken on the unique key for cross-engine determinism.",
)
def topk_orderby_limit(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


@query(
    "union_all_batches",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity <= 2
    UNION ALL
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity >= 49
    """,
    doc="merge_data = per-table union of multi-table batches, "
    "src/cherry_etl/pipeline.py:80-99 → unionByName.",
)
def union_all_batches(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    lo = li.filter(F.col("l_quantity") <= 2)
    hi = li.filter(F.col("l_quantity") >= 49)
    return lo.unionByName(hi)


@query(
    "window_rownum_dedup",
    oracle="""
    SELECT user_id, event_id, value, CAST(epoch_us(ts) AS BIGINT) AS ts_us
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id
            ORDER BY epoch_us(ts) DESC, event_id DESC
        ) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="Keep-newest exact dedup via row_number window (SURVEY §2.10). "
    "Ordering on epoch_us in both engines: Spark timestamps are µs "
    "while the fixture stores ns.",
)
def window_rownum_dedup(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "value", F.unix_micros("ts").alias("ts_us"))
    )


@query(
    "window_tumbling_agg",
    oracle=f"""
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_s,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS {_DEC})) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling event-time window aggregation — batch-expressible twin "
    "of the streaming path (SURVEY §2.9); F.window ≡ hour-aligned bucket.",
)
def window_tumbling_agg(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    """,
    doc="JSON field extraction from the events.props payload "
    "(SURVEY §2.10): get_json_object → pushed scan + per-row parse.",
)
def json_extract(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_id", k.alias("k")).filter(F.col("k") >= 50)


@query(
    "flagship_revenue_by_nation",
    oracle=f"""
    SELECT n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS {_DEC_PROD}))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('AMERICA', 'ASIA')
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
    doc="Flagship: multi-join star query (fact ⋈ filtered dims, broadcast "
    "small sides) + grouped revenue — the erc20 enrich+aggregate shape "
    "at TPC-H Q5 scale.",
)
def flagship_revenue_by_nation(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("AMERICA", "ASIA")
    )
    dims = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dims, o.o_custkey == dims.c_custkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC_PROD)
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "include_all_blocks_scan",
    oracle="""
    SELECT o_orderkey AS number, CAST(o_custkey AS BIGINT) AS proposer
    FROM orders
    WHERE o_orderkey BETWEEN 100 AND 20000
    """,
    doc="include_all_blocks=True through the REAL query-model path "
    "(model.py:apply_evm_query): a selective LogRequest with "
    "include_blocks=True is present, but the flag DISABLES the "
    "blocks-to-matches semi-join — every in-range block row survives "
    "(the reference's include_all_blocks contract, config.py; a plain "
    "pushed range scan is the whole plan). Oracle is the bare range "
    "scan, with no EXISTS — which is exactly the point.",
)
def include_all_blocks_scan(spark, sf_dir):
    from cherry_spark.model import EvmQuery, LogRequest, apply_evm_query

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    blocks = o.select(
        F.col("o_orderkey").alias("number"),
        F.col("o_custkey").cast("long").alias("proposer"),
    )
    logs = li.select(
        F.col("l_orderkey").alias("block_number"),
        F.unhex(F.lpad(F.hex(F.col("l_suppkey")), 40, "0")).alias("address"),
        F.unhex(F.lpad(F.hex(F.col("l_partkey")), 64, "0")).alias("topic0"),
        F.lit(None).cast("binary").alias("topic1"),
        F.lit(None).cast("binary").alias("topic2"),
        F.lit(None).cast("binary").alias("topic3"),
    )
    q = EvmQuery(
        from_block=100,
        to_block=20_000,
        logs=[
            LogRequest(
                address=[bytes.fromhex("00" * 18 + "0001")],
                include_blocks=True,
            )
        ],
        include_all_blocks=True,
        fields={"blocks": ["number", "proposer"]},
    )
    out = apply_evm_query({"blocks": blocks, "logs": logs}, q)
    return out["blocks"]
