"""applyInPandasWithState operator: state accumulates across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_running_cursor_tracker(spark, sf_dir, tmp_path):
    from cherry_spark.sources.tables import load_table
    from cherry_spark.streaming.stateful import running_cursor_tracker

    # stage events as MULTIPLE files so availableNow processes several
    # micro-batches and state actually carries across batches
    src = str(tmp_path / "src")
    events = load_table(spark, sf_dir, "events").drop("ts")
    events.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    tracked = running_cursor_tracker(stream)
    q = (
        tracked.writeStream.format("memory")
        .queryName("cursor_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # last update per user must equal the batch ground truth
    from pyspark.sql.window import Window

    updates = spark.sql("SELECT * FROM cursor_state")
    final = (
        updates.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    truth = events.groupBy("user_id").agg(
        F.max("event_id").alias("max_event_id"),
        F.count(F.lit(1)).alias("n_events"),
    )
    got = {r["user_id"]: (r["max_event_id"], r["n_events"]) for r in final.collect()}
    exp = {r["user_id"]: (r["max_event_id"], r["n_events"]) for r in truth.collect()}
    assert got == exp
    # state genuinely spanned batches: some user saw >1 update row
    multi = updates.groupBy("user_id").count().filter(F.col("count") > 1).count()
    assert multi > 0
