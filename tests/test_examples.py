"""The examples double as integration tests (the reference treats its
examples the same way, erc20_custom.py:6-11)."""

from __future__ import annotations

import duckdb

from tests.blockchain_fixtures import TRANSFER_TOPIC0, evm_rows


def test_erc20_pipeline_end_to_end(spark, tmp_path):
    import examples.erc20_pipeline as ex

    db = str(tmp_path / "erc20.duckdb")
    n_batches = ex.run(spark, db, batch_size=5)
    assert n_batches == 4  # 20 blocks / 5

    con = duckdb.connect(db)
    n_transfers = con.execute("SELECT COUNT(*) FROM transfers").fetchone()[0]
    _, logs_rows, _ = evm_rows(200)
    expected = sum(1 for r in logs_rows if bytes(r[4]) == TRANSFER_TOPIC0)
    assert n_transfers == expected  # only topic0-matched logs survive

    cols = {r[0] for r in con.execute("DESCRIBE transfers").fetchall()}
    assert {"from", "to", "amount", "block_timestamp", "chain_id"} <= cols
    # hex encode turned the binary addresses into 0x strings
    sample = con.execute('SELECT "from" FROM transfers LIMIT 1').fetchone()[0]
    assert sample.startswith("0x") and len(sample) == 42
    # resume cursor pattern: MAX over anchor table (block 1019 has no
    # transfer-topic log in the fixture: i%20==19 implies i%5==4)
    assert con.execute("SELECT MAX(block_number) FROM transfers").fetchone()[0] == 1018


def test_jup_swap_pipeline_end_to_end(spark, tmp_path):
    import examples.jup_swap_pipeline as ex

    out = str(tmp_path / "jup")
    n_batches = ex.run(spark, out)
    assert n_batches == 2  # 12 slots / 6

    df = spark.read.parquet(f"{out}/swaps_named")
    from tests.blockchain_fixtures import svm_rows

    rows, expected = svm_rows(120)
    n_expected = sum(
        1 for i, r in enumerate(rows) if 1000 <= r[0] <= 1011 and expected[i] is not None
    )
    assert df.count() == n_expected
    row = df.first()
    # base58-encoded pubkeys are strings now
    assert isinstance(row["amm"], str) and not row["amm"].startswith("0x")
    assert row["input_amount"] is not None
    # dim enrich matched: fixture AMMs cycle amm0..amm4; amm0/amm1 are named
    named = df.filter(df.amm_name.isNotNull()).count()
    assert 0 < named < df.count()


def test_web_ingest_pipeline(spark, sf_dir):
    import examples.web_ingest_pipeline as ex

    out = ex.run(spark, sf_dir, blocked=["src3site.com"])
    assert out["n_raw"] > 0
    # URL dedup collapses the doc_id%200 path space per source
    assert 0 < out["n_canonical"] < out["n_raw"]
    doms = {r["domain"] for r in out["domains"].collect()}
    assert "src3site.com" not in doms  # blocklist enforced
    assert all(d.endswith("site.com") for d in doms)
    # every even doc_id is a re-crawl of an admitted URL IF its URL was
    # canonical+unblocked; bloom must flag a healthy share, and fresh
    # URLs (odd ids) must almost all pass (FP rate ~1e-4 at this size)
    assert out["n_recrawls_skipped"] > 0


def test_hybrid_search_pipeline(spark, sf_dir):
    import examples.hybrid_search_pipeline as ex

    out = ex.run(spark, sf_dir, query_ids=(0, 1, 2), k=5)
    assert out["n_results"] == 15
    rows = out["fused"].collect()
    # each query's own doc tops its FUSED list: cosine(self) = 1.0
    # pins dense rank 1, and BM25 places self high (not necessarily
    # first — a short doc dense in a rare query term can out-score
    # it), so the combined RRF score wins
    top1 = {}
    for r in rows:
        cur = top1.get(r["query_id"])
        if cur is None or r["rrf_fp"] > cur[1]:
            top1[r["query_id"]] = (r["doc_id"], r["rrf_fp"])
    assert {q: d for q, (d, _) in top1.items()} == {0: 0, 1: 1, 2: 2}
    assert 0 < out["n_in_both_views"] <= 15


def test_refresh_pipeline_is_o_churn(spark, sf_dir):
    import examples.refresh_pipeline as ex
    from pyspark.sql import functions as F

    out = ex.refresh(spark, sf_dir)
    classes = {r.change_class: r.n_docs for r in out["report"].collect()}
    assert set(classes) == {"added", "removed", "changed", "unchanged"}
    # the churn set is exactly added+changed
    n_churn = out["manifest"].count()
    assert n_churn == classes["added"] + classes["changed"]
    # admitted docs are a subset of the churn set
    extra = out["admitted"].join(out["manifest"], "doc_id", "left_anti")
    assert extra.count() == 0
    # next corpus = unchanged survivors + admitted churn, disjoint ids
    n_admit = out["admitted"].count()
    assert out["v_next"].count() == classes["unchanged"] + n_admit
    assert (
        out["v_next"].groupBy("doc_id").count().filter(F.col("count") > 1).count()
        == 0
    )
    # every verdict covers every churn doc
    assert out["verdicts"].count() == n_churn


def test_events_analytics_pipeline(spark, sf_dir):
    import examples.events_analytics_pipeline as ex
    from pyspark.sql import functions as F

    out = ex.analyze(spark, sf_dir)
    prof = {r.col_name: r for r in out["profile"].collect()}
    assert set(prof) == {"event_id", "user_id", "event_type", "value", "ts_us"}
    assert prof["event_type"].n_distinct == 5
    grid = out["grid"]
    # the dense grid has no holes: per key, rows == (hi-lo)/width + 1
    spans = grid.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        ((F.max("bucket_s") - F.min("bucket_s")) / 900 + 1).alias("want"),
    )
    assert spans.filter(F.col("n") != F.col("want")).count() == 0
    funnel = {r.stage_idx: r.n_users for r in out["funnel"].collect()}
    assert funnel[0] >= funnel[1] >= funnel[2]  # monotone by construction
    assert out["cohorts"].filter(F.col("week_offset") == 0).count() >= 1
    spikes = out["spikes"]
    assert spikes.count() >= 1
    # flags obey the integer inequality they encode
    bad = spikes.filter(
        (F.col("is_spike") == 1) & (F.col("zsq_num") <= F.col("zsq_den"))
    )
    assert bad.count() == 0


def test_ingest_serve_pipeline(spark, sf_dir):
    import examples.ingest_serve_pipeline as ex

    out = ex.run(spark, sf_dir)
    assert len(out["stores"]) >= 10
    assert not out["rebuilt_during_serve"]
    assert all(st["rows"] > 0 for st in out["served"].values())


def test_curate_index_pipeline(spark, sf_dir, tmp_path):
    import examples.curate_index_pipeline as ex

    out = ex.run(spark, sf_dir, str(tmp_path / "ci"))
    assert out["counts"].get("admitted", 0) > 0
    assert out["search_matches_inline"] and out["n_search_rows"] > 0
    # the train-then-curate composition (r10): the model refit at the
    # batch-2 corpus-version boundary and the gate actually filtered
    assert out["model_versions"] == [0, 0, 2]
    assert out["n_model_rejected"] > 0
    # the manifest bus lane (r11): indexed through cherry_bus, then
    # compacted under the live checkpoint with the snapshot intact
    assert out["bus_files"][0] >= 3  # one+ data file per gate fold
    assert out["bus_files"][1] == 1
    assert out["bus_snapshot_complete"]
