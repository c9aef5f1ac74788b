"""Custom Python DataSource stream: full drain equals the batch read."""

from __future__ import annotations

import os


def test_cursor_replay_stream_drains_all_rows(spark, sf_dir, tmp_path):
    from cherry_spark.sources.replay_datasource import CursorReplayDataSource

    spark.dataSource.register(CursorReplayDataSource)
    # ns-timestamp col unsupported by arrow->spark conversion; use a
    # ts-free projection staged to parquet
    src = str(tmp_path / "events_src.parquet")
    from cherry_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").drop("ts")
    events.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "staged"))
    staged_file = [
        f
        for f in os.listdir(tmp_path / "staged")
        if f.endswith(".parquet")
    ][0]
    src = str(tmp_path / "staged" / staged_file)

    stream = (
        spark.readStream.format("cherry_replay")
        .option("path", src)
        .option("cursor_col", "event_id")
        .option("batch_size", "300")
        .load()
    )
    out_dir = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out_dir)
    assert got.count() == events.count()
    assert set(r["event_id"] for r in got.select("event_id").collect()) == set(
        r["event_id"] for r in events.select("event_id").collect()
    )
