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


def test_streaming_sessionizer(spark, tmp_path):
    """Sessions spanning micro-batches close exactly at the gap; state
    carries the open session across batches."""
    from cherry_spark.streaming.stateful import streaming_sessionizer

    src = str(tmp_path / "sess_src")
    schema = "user_id long, ts_sec long, value double"
    # batch 1: u1 has two close events; u2 one
    b1 = [(1, 0, 1.0), (1, 100, 2.0), (2, 50, 5.0)]
    # batch 2: u1 jumps past the gap (closes [0,100]); u2 stays inside
    b2 = [(1, 5000, 3.0), (2, 1000, 7.0)]
    # batch 3: sentinel far-future events close everything open
    b3 = [(1, 10**9, 0.0), (2, 10**9, 0.0)]
    for rows in (b1, b2, b3):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(src)
    )
    sessions = streaming_sessionizer(stream, gap_seconds=1800)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    assert (1, 0, 100, 2, 3.0) in got
    assert (1, 5000, 5000, 1, 3.0) in got
    assert (2, 50, 1000, 2, 12.0) in got


def test_streaming_funnel_tracker_matches_batch(spark, tmp_path):
    """Journeys split MID-FUNNEL across micro-batches; final streamed
    depths must replay the batch funnel exactly (including the
    order-sensitive cases: click-before-view, purchase-before-click)."""
    import datetime as dt

    from cherry_spark.ext.events import funnel_conversion
    from cherry_spark.streaming.stateful import streaming_funnel_tracker

    stages = ["view", "click", "purchase"]
    # same journeys as test_events_analytics: expected depths
    # u1=3, u2=1 (clicked before viewing), u3=1, u4=0, u5=2
    journeys = [
        (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
        (2, 0, "click"), (2, 10, "view"),
        (3, 0, "view"), (3, 5, "purchase"),
        (4, 0, "click"), (4, 5, "purchase"),
        (5, 0, "view"), (5, 2, "purchase"), (5, 4, "click"),
    ]
    # time-sliced batches (in-order delivery contract): [0,4], [5,10], rest
    slices = [
        [r for r in journeys if r[1] <= 4],
        [r for r in journeys if 5 <= r[1] <= 10],
        [r for r in journeys if r[1] > 10],
    ]
    src = str(tmp_path / "funnel_src")
    schema = "user_id long, ts_sec long, event_type string"
    for rows in slices:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(src)
    )
    out = streaming_funnel_tracker(stream, stages)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    from pyspark.sql.window import Window

    updates = spark.sql("SELECT * FROM funnel_state")
    final = (
        updates.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("funnel_depth").desc(), F.col("t_prev").desc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
    )
    depths = {r["user_id"]: r["funnel_depth"] for r in final.collect()}
    assert depths == {1: 3, 2: 1, 3: 1, 4: 0, 5: 2}

    # streamed stage counts == the batch funnel report
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    ev = spark.createDataFrame(
        [(u, base + dt.timedelta(seconds=s), t) for u, s, t in journeys],
        "user_id long, ts timestamp, event_type string",
    )
    batch = {
        r.stage_idx: r.n_users for r in funnel_conversion(ev, stages).collect()
    }
    streamed = [
        sum(1 for d in depths.values() if d > k) for k in range(len(stages))
    ]
    assert streamed == [batch[i] for i in range(len(stages))]
    # state genuinely crossed batches: u1 completed over 3 slices
    u1_updates = updates.filter(F.col("user_id") == 1).count()
    assert u1_updates >= 2
