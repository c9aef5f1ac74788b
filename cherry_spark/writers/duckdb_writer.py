"""DuckDB sink — the whole multi-table batch lands in ONE transaction
(reference writers/duckdb.py:12-52: BEGIN, CREATE TABLE ... AS / INSERT
per table, COMMIT), giving full cross-table atomicity where the other
sinks rely on the anchor protocol.

Spark side: each table is staged as Parquet (distributed write), then a
single driver-side DuckDB transaction ingests every staged table via
read_parquet — the DB never sees a partial batch.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from dataclasses import dataclass

from cherry_spark.writers.base import Batch, DataWriter


@dataclass
class DuckDbWriterConfig:
    db_path: str
    staging_dir: str | None = None


class DuckDbWriter(DataWriter):
    def __init__(self, cfg: DuckDbWriterConfig):
        self.cfg = cfg
        self._initialized_tables: set[str] = set()

    def push_data(self, batch: Batch) -> None:
        import duckdb

        staging_root = self.cfg.staging_dir or tempfile.mkdtemp(prefix="cherry_duck_")
        stage_id = uuid.uuid4().hex[:8]
        staged: dict[str, str] = {}
        for name, df in batch.items():
            path = os.path.join(staging_root, f"{name}_{stage_id}")
            df.write.mode("overwrite").parquet(path)
            staged[name] = path

        con = duckdb.connect(self.cfg.db_path)
        try:
            con.execute("BEGIN")
            for name, path in staged.items():
                glob = os.path.join(path, "*.parquet")
                if name in self._initialized_tables or self._table_exists(con, name):
                    con.execute(
                        f'INSERT INTO "{name}" SELECT * FROM read_parquet(?)', [glob]
                    )
                else:
                    con.execute(
                        f'CREATE TABLE "{name}" AS SELECT * FROM read_parquet(?)',
                        [glob],
                    )
                self._initialized_tables.add(name)
            con.execute("COMMIT")
        except Exception:
            con.execute("ROLLBACK")
            raise
        finally:
            con.close()
            for path in staged.values():
                shutil.rmtree(path, ignore_errors=True)

    @staticmethod
    def _table_exists(con, name: str) -> bool:
        # the reference probes system tables the same way (clickhouse.py:105-110)
        return bool(
            con.execute(
                "SELECT count(*) > 0 FROM information_schema.tables WHERE table_name = ?",
                [name],
            ).fetchone()[0]
        )
