"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark and its DuckDB oracle twin on the
same parquet tables, compares row-count + column names + an
order-insensitive multiset of canonicalized values.  Run before every
commit:

    python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import math
import os
import sys
from datetime import date, datetime

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

import duckdb  # noqa: E402

from cherry_spark.catalog import REGISTRY  # noqa: E402
from cherry_spark.sources.tables import TABLE_NAMES  # noqa: E402

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def canon(v) -> str:
    """Canonical string for a cell value, stable across engines."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr round-trips float64 exactly; integral floats normalize
        return repr(v)
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return repr(f)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize cells, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def driver_canon_check(tbl) -> None:
    """Mirror the DRIVER's canonicalization path exactly: pandas
    sort_values over all name-sorted columns. The driver does this
    before hashing; cells pandas cannot factorize (ndarray from
    array<> columns, dict from struct<>/map<>) raise TypeError there,
    turning the query into an err row even when values match. Raising
    the same error here makes that a local FAIL instead of a
    driver-only surprise (ADVICE r2: decode_dynamic_abi)."""
    pdf = tbl.to_pandas()
    if len(pdf):
        pdf.sort_values(by=sorted(pdf.columns))


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def compare_query(spark, con, name: str, sf_dir: str) -> tuple[bool, str]:
    qd = REGISTRY[name]
    df = qd.fn(spark, sf_dir)
    tbl = df.toArrow()
    s_cols = list(tbl.column_names)
    s_rows = (
        [tuple(r) for r in zip(*[c.to_pylist() for c in tbl.columns])]
        if tbl.num_rows
        else []
    )
    try:
        driver_canon_check(tbl)
    except Exception as e:  # noqa: BLE001 — any throw here is a driver err row
        return False, f"driver pandas canonicalization would fail: {type(e).__name__}: {e}"
    if qd.oracle is None:
        return True, f"rows-only ({len(s_rows)} rows)"
    o_tbl = con.execute(qd.oracle).arrow()
    try:
        driver_canon_check(o_tbl)
    except Exception as e:  # noqa: BLE001
        return False, f"driver pandas canonicalization (oracle) would fail: {type(e).__name__}: {e}"
    o_cols = list(o_tbl.column_names)
    o_rows = (
        [tuple(r) for r in zip(*[c.to_pylist() for c in o_tbl.columns])]
        if o_tbl.num_rows
        else []
    )
    if sorted(s_cols) != sorted(o_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"row count: spark={len(s_rows)} oracle={len(o_rows)}"
    sc = canon_rows(s_cols, s_rows)
    oc = canon_rows(o_cols, o_rows)
    if sc != oc:
        diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
        return False, f"value mismatch ({len([1 for a, b in zip(sc, oc) if a != b])} rows), e.g. {diffs}"
    return True, f"match ({len(s_rows)} rows)"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF_DIR
    only = set(sys.argv[2:])

    import cherry_spark.queries  # noqa: F401

    from cherry_spark.session import get_spark

    spark = get_spark("verify_local")
    con = duckdb_connect(sf_dir)
    names = [n for n in REGISTRY if not only or n in only]
    failed = []
    for name in names:
        try:
            ok, msg = compare_query(spark, con, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        status = "PASS" if ok else "FAIL"
        print(f"[{status}] {name}: {msg}")
        if not ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} queries pass at {sf_dir}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
