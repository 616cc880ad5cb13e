"""Local replica of the driver's DuckDB-oracle correctness check.

Compares a Spark query result with its DuckDB oracle on the same
parquet tables: row count + column names + order-insensitive value
hash (columns sorted by name, values canonicalized, rows sorted).
Used by tests/test_oracle_parity.py so every registered query is
verified before the driver ever sees it.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import hashlib
import math
import os

import duckdb

from .tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v: object) -> str:
    """Canonical string form — engine-agnostic for the types we emit."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest round-trip repr; same binary => same str
    if isinstance(v, _dec.Decimal):
        t = v.normalize()  # scale-insensitive: 1.50 == 1.5
        if t.as_tuple().exponent > 0:  # avoid 1E+2 for 100
            t = t.quantize(_dec.Decimal(1))
        return str(t)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return str(v)


def fingerprint(rows: list[tuple], colnames: list[str]) -> tuple[int, str]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon_rows = sorted("\x1f".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\x1e".join(canon_rows).encode()).hexdigest()
    return len(rows), h


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    rel = con.sql(sql)
    d_rows = [tuple(r) for r in rel.fetchall()]
    d_cols = list(rel.columns)
    s_n, s_h = fingerprint(s_rows, s_cols)
    d_n, d_h = fingerprint(d_rows, d_cols)
    return {
        "rows_match": s_n == d_n,
        "schema_match": sorted(s_cols) == sorted(d_cols),
        "hash_match": s_h == d_h,
        "spark_rows": s_n,
        "duck_rows": d_n,
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
    }
