"""ClickHouse sink: DDL-from-StructType + JDBC writes.

The reference builds CREATE TABLE DDL from the Arrow schema with a full
type map, engine/ORDER BY clauses and per-column codecs, then inserts
all non-anchor tables concurrently and the anchor last
(reference writers/clickhouse.py:11-85,127-186). Here the DDL compiler
is pure (unit-testable without a server); writes go through the
clickhouse JDBC driver when present on the Spark classpath — gated, as
this container has no ClickHouse.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from cherry_spark.writers.base import Batch, DataWriter

_TYPE_MAP: list[tuple[type, str]] = [
    (T.BooleanType, "Bool"),
    (T.ByteType, "Int8"),
    (T.ShortType, "Int16"),
    (T.IntegerType, "Int32"),
    (T.LongType, "Int64"),
    (T.FloatType, "Float32"),
    (T.DoubleType, "Float64"),
    (T.StringType, "String"),
    (T.BinaryType, "String"),  # CH stores raw bytes in String
    (T.DateType, "Date32"),
    (T.TimestampType, "DateTime64(6)"),
    (T.TimestampNTZType, "DateTime64(6)"),
]


def spark_type_to_clickhouse(dt: T.DataType) -> str:
    """Spark type -> ClickHouse type (the §1.3 map; reference
    pyarrow_type_to_clickhouse, writers/clickhouse.py:11-85)."""
    if isinstance(dt, T.DecimalType):
        return f"Decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"Array({spark_type_to_clickhouse(dt.elementType)})"
    if isinstance(dt, T.MapType):
        key = spark_type_to_clickhouse(dt.keyType)
        val = spark_type_to_clickhouse(dt.valueType)
        return f"Map({key}, {val})"
    if isinstance(dt, T.StructType):
        inner = ", ".join(
            f"{f.name} {spark_type_to_clickhouse(f.dataType)}" for f in dt.fields
        )
        return f"Tuple({inner})"
    for spark_t, ch_t in _TYPE_MAP:
        if isinstance(dt, spark_t):
            return ch_t
    raise NotImplementedError(f"no ClickHouse mapping for {dt}")


def create_table_ddl(
    table: str,
    schema: T.StructType,
    engine: str = "MergeTree()",
    order_by: list[str] | None = None,
    codecs: dict[str, str] | None = None,
) -> str:
    """CREATE TABLE IF NOT EXISTS DDL (reference clickhouse.py:150-165);
    nullable columns wrap in Nullable(...) except composite types."""
    cols = []
    for f in schema.fields:
        ch = spark_type_to_clickhouse(f.dataType)
        if f.nullable and not ch.startswith(("Array", "Map", "Tuple")):
            ch = f"Nullable({ch})"
        codec = f" CODEC({codecs[f.name]})" if codecs and f.name in codecs else ""
        cols.append(f"`{f.name}` {ch}{codec}")
    order_clause = f" ORDER BY ({', '.join(order_by)})" if order_by else " ORDER BY tuple()"
    return (
        f"CREATE TABLE IF NOT EXISTS `{table}` ({', '.join(cols)}) "
        f"ENGINE = {engine}{order_clause}"
    )


@dataclass
class ClickHouseWriterConfig:
    url: str  # jdbc:clickhouse://host:port/db
    user: str = "default"
    password: str = ""
    engine: str = "MergeTree()"
    order_by: dict[str, list[str]] = field(default_factory=dict)  # table -> cols
    codecs: dict[str, dict[str, str]] = field(default_factory=dict)
    anchor_table: str | None = None


class ClickHouseWriter(DataWriter):
    def __init__(self, cfg: ClickHouseWriterConfig):
        self.cfg = cfg
        self.anchor_table = cfg.anchor_table

    def _execute_ddl(self, spark, ddl: str) -> None:
        """CREATE TABLE through the JDBC driver on the Spark driver JVM
        (the reference issues DDL on its own client connection the same
        way, clickhouse.py:150-165). No-op failure if the driver jar is
        absent — the jdbc write below raises a clear error then."""
        jvm = spark._jvm
        conn = jvm.java.sql.DriverManager.getConnection(
            self.cfg.url, self.cfg.user, self.cfg.password
        )
        try:
            stmt = conn.createStatement()
            stmt.execute(ddl)
            stmt.close()
        finally:
            conn.close()

    def push_data(self, batch: Batch) -> None:
        for name in self.anchor_last_order(batch):
            df = batch[name]
            ddl = create_table_ddl(
                name,
                df.schema,
                engine=self.cfg.engine,
                order_by=self.cfg.order_by.get(name),
                codecs=self.cfg.codecs.get(name),
            )
            self._execute_ddl(df.sparkSession, ddl)
            self._insert(df, name)

    def _insert(self, df, name: str) -> None:
        """JDBC append — overridable seam so push_data's DDL-then-insert
        anchor-last orchestration is testable without a server."""
        (
            df.write.format("jdbc")
            .mode("append")
            .option("url", self.cfg.url)
            .option("dbtable", name)
            .option("user", self.cfg.user)
            .option("password", self.cfg.password)
            .save()
        )
