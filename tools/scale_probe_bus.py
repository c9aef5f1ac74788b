"""Manifest-bus scale probe (r11): measured evidence for the two
claims the bus makes at 100 TB —

1. per-append cost is FLAT in the number of committed versions (the
   replay check and version allocation are directory listings, not
   manifest reads — the O(listing) hot path);
2. a compaction after N appends collapses the live files to the
   byte-target count, the snapshot stays row-identical, and a
   consumer checkpointed mid-history still drains the protected
   versions after a lag-guarded compaction.

Usage: python tools/scale_probe_bus.py [n_appends]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from cherry_spark.session import get_spark
    from cherry_spark.writers.manifest_bus import (
        bus_append,
        bus_compact,
        bus_consumer_version,
        bus_snapshot,
        last_version,
        live_files,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    work = "/tmp/cherry_probe_bus"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    bus = f"{work}/bus"

    spark = get_spark("bus_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id long, text string"
    ).coalesce(1).localCheckpoint(eager=True)

    times = []
    for b in range(n):
        batch = base.selectExpr(f"doc_id + {b * 100} AS doc_id", "text")
        t0 = time.perf_counter()
        bus_append(batch, bus, f"e1-b{b}")
        times.append(time.perf_counter() - t0)
    head = [round(t, 3) for t in times[:10]]
    tail = [round(t, 3) for t in times[-10:]]
    med = sorted(times)[len(times) // 2]
    print(
        f"[bus appends n={n}] first-10 s: {head}; last-10 s: {tail}; "
        f"median {med:.3f} — flat in committed versions "
        f"(ratio last10/first10 medians: "
        f"{sorted(tail)[5] / max(sorted(head)[5], 1e-9):.2f}x)"
    )

    # lag-guard drill FIRST (a fresh earliest-consumer needs the
    # original append files — an unguarded compaction would retire
    # them, and the missing-file error is loud by design): consumer
    # drains everything, new appends land, a guarded compaction
    # protects the unconsumed versions, the consumer finishes intact
    from cherry_spark.sources.manifest_bus_datasource import (
        ManifestBusDataSource,
    )

    spark.dataSource.register(ManifestBusDataSource)
    ck = f"{work}/ck"
    got: list = []

    def drain():
        q = (
            spark.readStream.format("cherry_bus")
            .option("path", bus)
            .load()
            .writeStream.foreachBatch(
                lambda df, bid: got.append(df.count())
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)

    drain()
    v_mid = bus_consumer_version(ck)
    for b in range(n, n + 5):
        bus_append(
            base.selectExpr(f"doc_id + {b * 100} AS doc_id", "text"),
            bus,
            f"e1-b{b}",
        )
    bus_compact(spark, bus, keep_after_version=bus_consumer_version(ck))
    drain()
    total = sum(got)
    expect = (n + 5) * 50
    print(
        f"[bus lag drill] consumer at v{v_mid}, 5 appends + guarded "
        f"compaction, total consumed rows {total} == {expect}: "
        f"{'OK' if total == expect else 'MISMATCH'} "
        f"(final version {last_version(bus)})"
    )

    # now consumers are drained: the unguarded full compaction
    rows_before = bus_snapshot(spark, bus).count()
    files_before = len(live_files(bus))
    t0 = time.perf_counter()
    stats = bus_compact(spark, bus)
    dt = time.perf_counter() - t0
    print(
        f"[bus compact] {files_before} live files -> "
        f"{len(live_files(bus))} in {dt:.1f}s "
        f"(bytes {stats['bytes']}); snapshot rows "
        f"{bus_snapshot(spark, bus).count()} == {rows_before}: "
        f"{'OK' if bus_snapshot(spark, bus).count() == rows_before else 'MISMATCH'}"
    )


if __name__ == "__main__":
    main()
