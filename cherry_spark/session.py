"""SparkSession construction + the runtime confs the engine needs.

Two layers:

- :func:`get_spark` builds a tuned local session (tests / bench).
- :func:`ensure_runtime_confs` applies the *runtime-settable* confs to an
  externally-provided session (the driver hands us its own session in
  ``__spark_entry__.py``), so the engine works on any session.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_SHIPPED_APPS: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``cherry_spark`` importable on executor Python workers.

    Worker processes do not inherit the driver's sys.path, so any
    pandas UDF whose closure references this package would fail to
    unpickle (ModuleNotFoundError) when the driver runs from a foreign
    cwd. ``addPyFile`` ships a zip of the package to every executor —
    the same mechanism that deploys it on a real cluster.
    """
    app_id = spark.sparkContext.applicationId
    if app_id in _PKG_SHIPPED_APPS:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"cherry_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(
                        "cherry_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _PKG_SHIPPED_APPS.add(app_id)

# Confs that are safe (and required) to set on a live session.
RUNTIME_CONFS: dict[str, str] = {
    # the fixture `events` table stores timestamp[ns]; Spark's Parquet
    # reader rejects TIMESTAMP(NANOS) unless read as raw long
    # (converted back to TimestampType in sources/tables.py)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # deterministic timestamp<->date/string semantics regardless of host TZ
    "spark.sql.session.timeZone": "UTC",
    # runtime re-planning: coalesce small shuffle partitions, skew-join
    # splitting — essential at 100 TB, harmless locally
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for any pandas_udf / toPandas path
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply RUNTIME_CONFS to an existing session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # a conf may be non-settable on some builds; the engine
            # degrades gracefully (events reader falls back, see tables.py)
            pass
    try:
        _ship_package(spark)
    except Exception:
        pass  # e.g. Connect sessions without a SparkContext
    return spark


def get_spark(
    app_name: str = "cherry_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a local session sized to the host.

    On a real cluster the user supplies their own session; everything in
    the engine only relies on ``ensure_runtime_confs``.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 4)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("CHERRY_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return ensure_runtime_confs(spark)
