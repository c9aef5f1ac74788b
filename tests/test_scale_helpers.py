"""Scale-technique tests: salted aggregation/join correctness, bucketed
co-located joins planning without exchanges."""

from __future__ import annotations

from pyspark.sql import functions as F

from cherry_spark.ext.skew import salted_agg, salted_join
from cherry_spark.writers.bucketed import (
    colocated_join,
    join_has_no_exchange,
    write_bucketed,
)


def test_load_table_events_ntz_fallback(spark, sf_dir, tmp_path):
    """Fixture generations have shipped events.ts as TIMESTAMP(NANOS)
    (Spark reads long under nanosAsLong) and TIMESTAMP(MICROS) (Spark 4
    reads TIMESTAMP_NTZ). Both forms must normalize to identical
    session-TZ timestamps through load_table."""
    from pyspark.sql import functions as F

    from cherry_spark.sources.tables import load_table

    canonical = load_table(spark, sf_dir, "events")
    # rewrite the same data as TIMESTAMP_NTZ parquet
    ntz_dir = str(tmp_path / "sfntz")
    canonical.withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    ).write.parquet(ntz_dir + "/events.parquet")
    reread = load_table(spark, ntz_dir, "events")
    assert reread.schema["ts"].dataType.typeName() == "timestamp"
    a = canonical.select("event_id", F.unix_micros("ts").alias("us"))
    b = reread.select("event_id", F.unix_micros("ts").alias("us"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_salted_agg_matches_plain(spark, sf_dir):
    from cherry_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r["l_returnflag"], r["l_linestatus"]): (r["s"], r["c"])
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    salted = {
        (r["l_returnflag"], r["l_linestatus"]): (r["s"], r["c"])
        for r in salted_agg(
            li,
            ["l_returnflag", "l_linestatus"],
            {"s": F.sum(F.col("l_quantity").cast("decimal(18,2)")), "c": F.count(F.lit(1))},
            {"s": F.sum("s"), "c": F.sum("c")},
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark):
    left = spark.createDataFrame(
        [(i % 3, i) for i in range(300)], "k int, v long"  # key 0/1/2 hot
    )
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k int, name string")
    plain = sorted((r["v"], r["name"]) for r in left.join(dim, "k").collect())
    salted = sorted((r["v"], r["name"]) for r in salted_join(left, dim, "k").collect())
    assert plain == salted


def test_bucketed_join_no_exchange(spark, sf_dir, tmp_path):
    from cherry_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "okey"), "b_orders", ["okey"], 8
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "okey"), "b_lineitem", ["okey"], 8
    )
    joined = colocated_join(spark, "b_lineitem", "b_orders", on=["okey"])
    # the whole point: both sides pre-bucketed on the key -> no shuffle
    assert join_has_no_exchange(joined)
    # and it is still a correct join
    expected = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    ).count()
    assert joined.count() == expected
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
