"""Query registry backing the driver contract in ``__spark_entry__.py``.

Each operator from SURVEY.md §2 registers one named query (a callable
``(spark, sf_dir) -> DataFrame``) and, where ANSI-SQL-expressible, a
DuckDB oracle SQL string computing the same result on the same tables.

Cross-engine determinism rules (every query obeys these so the driver's
order-insensitive value-hash matches):

- alias every computed column identically in Spark and SQL;
- never return raw timestamps (session-TZ / ns-vs-µs hazards) — return
  epoch micros/seconds as BIGINT, or DATE as ISO string;
- never hash-compare a float produced by an *aggregation* of doubles
  (summation order differs across engines) — aggregate on
  DECIMAL (exact, associative) and cast the final value to DOUBLE;
  per-row double arithmetic is IEEE-deterministic and safe.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None => rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    import cherry_spark.queries  # noqa: F401  (triggers registration)

    return {n: d.fn for n, d in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    import cherry_spark.queries  # noqa: F401

    return {n: d.oracle for n, d in REGISTRY.items() if d.oracle is not None}
