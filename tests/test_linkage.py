"""Record-linkage properties (ext/linkage.py): planted-twin recall,
the hot-block cap contract, and composition with connected components
for entity ids."""

from __future__ import annotations

from pyspark.sql import functions as F


def _records(spark, rows):
    return spark.createDataFrame(
        rows, "rec_id long, name string, blk string"
    )


def test_planted_twins_all_found_at_distance_one(spark, sf_dir):
    from cherry_spark.queries.linkage import _records_spark
    from cherry_spark.ext.linkage import blocked_linkage_pairs

    records = _records_spark(spark, sf_dir)
    n_cust = records.count() // 2
    pairs = blocked_linkage_pairs(
        records, ["nat", "blk"], "rec_id", "name", max_dist=2
    )
    planted = pairs.where(
        F.col("id_b") == F.col("id_a") + 10_000_000
    ).select("id_a", "dist")
    rows = planted.collect()
    assert len(rows) == n_cust  # every customer's twin found...
    assert all(r["dist"] == 1 for r in rows)  # ...at exactly 1 edit


def test_hot_block_cap_drops_degenerate_key(spark):
    from cherry_spark.ext.linkage import blocked_linkage_pairs

    rows = [(i, f"name{i:03d}", "UNKNOWN") for i in range(50)]
    rows += [(100, "alice smith", "b1"), (101, "alice smyth", "b1")]
    df = _records(spark, rows)
    got = blocked_linkage_pairs(
        df, ["blk"], "rec_id", "name", max_dist=2, max_block=10
    ).collect()
    # the 50-record UNKNOWN block is over the cap -> zero pairs from it;
    # the honest block still matches
    assert [(r["id_a"], r["id_b"], r["dist"]) for r in got] == [(100, 101, 1)]


def test_pairs_feed_connected_components(spark):
    from cherry_spark.ext.dedup import connected_components
    from cherry_spark.ext.linkage import blocked_linkage_pairs

    rows = [
        (1, "acme corp", "a"),
        (2, "acme corp.", "a"),
        (3, "acme korp", "a"),
        (4, "zenith ltd", "a"),
    ]
    pairs = blocked_linkage_pairs(
        _records(spark, rows), ["blk"], "rec_id", "name", max_dist=2
    )
    comp = connected_components(
        pairs.select(F.col("id_a").alias("id1"), F.col("id_b").alias("id2"))
    )
    got = {r[0]: r[1] for r in comp.collect()}
    # 1-2-3 chain collapses to one entity; 4 is unmatched (absent)
    assert got[1] == got[2] == got[3]
    assert 4 not in got
