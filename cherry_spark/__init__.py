"""cherry_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of steelcake/cherry
(reference surveyed in SURVEY.md) on idiomatic Spark:

- the unit of data is ``Dict[str, DataFrame]`` (a multi-table batch,
  mirroring the reference's ``Dict[str, pa.Table]``,
  reference src/cherry_etl/pipeline.py:31);
- steps are pure functions over that dict, composed lazily so Catalyst
  optimizes across the whole pipeline (unlike the reference's eager
  step-at-a-time loop);
- sources apply the query model (projection / block-range / in-set
  filters / semi-joins) directly onto Parquet scans so Catalyst pushes
  them down;
- writers implement the reference's anchor-table crash-resistance
  protocol (reference src/cherry_etl/writers/clickhouse.py:183-186).
"""

__version__ = "0.1.0"

from cherry_spark.session import get_spark  # noqa: F401
from cherry_spark.sources.tables import TABLE_NAMES, load_table, read_tables  # noqa: F401
