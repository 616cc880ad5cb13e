"""Property-based spot checks (SURVEY.md §5.4): scalar cast and
epoch→timestamp semantics vs the DuckDB oracle on generated values —
the determinism conventions hold for arbitrary inputs, not just the
testdata distribution."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# 2-decimal money values within DECIMAL(18,2) bounds
money_2dec = st.integers(min_value=-(10**15), max_value=10**15).map(
    lambda c: Decimal(c) / 100
)
# unix seconds within both engines' comfortable timestamp range
epoch_s = st.integers(min_value=0, max_value=4_000_000_000)


@pytest.fixture(scope="module")
def duck_raw():
    return duckdb.connect()


_SETTINGS = dict(
    max_examples=20,  # each example is a Spark job — keep it tight
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(vals=st.lists(money_2dec, min_size=1, max_size=50))
@settings(**_SETTINGS)
def test_decimal_sum_matches_duckdb(spark, duck_raw, vals):
    """Exact decimal SUM parity for any 2-decimal doubles."""
    doubles = [float(v) for v in vals]
    sdf = spark.createDataFrame([(x,) for x in doubles], "x double")
    from pyspark.sql import functions as F

    s_val = sdf.agg(
        F.sum(F.col("x").cast("decimal(18,2)")).cast("decimal(38,2)").alias("s")
    ).collect()[0].s
    duck_raw.execute("CREATE OR REPLACE TABLE t AS SELECT * FROM (VALUES {}) v(x)".format(
        ", ".join(f"(CAST({x!r} AS DOUBLE))" for x in doubles)
    ))
    d_val = duck_raw.execute(
        "SELECT CAST(sum(CAST(x AS DECIMAL(18,2))) AS DECIMAL(38,2)) FROM t"
    ).fetchone()[0]
    assert s_val == d_val


@given(secs=st.lists(epoch_s, min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_epoch_to_timestamp_matches_duckdb(spark, duck_raw, secs):
    """from_unixtime/to_timestamp (UTC session) == DuckDB to_timestamp."""
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame([(s,) for s in secs], "s long")
    s_rows = [
        r.ts for r in sdf.select(
            F.to_timestamp(F.from_unixtime("s")).alias("ts")
        ).collect()
    ]
    d_rows = [
        duck_raw.execute(f"SELECT to_timestamp({s})").fetchone()[0].replace(tzinfo=None)
        for s in secs
    ]
    assert s_rows == d_rows


@given(v=money_2dec)
@settings(**_SETTINGS)
def test_double_decimal_round_trip_lossless(spark, v):
    """double -> decimal(18,2) -> double round trip is exact for
    2-decimal values (the foundation of the money convention)."""
    from pyspark.sql import functions as F

    x = float(v)
    out = (
        spark.createDataFrame([(x,)], "x double")
        .select(F.col("x").cast("decimal(18,2)").cast("double").alias("y"))
        .collect()[0]
        .y
    )
    assert out == x


def test_timezone_is_utc(spark):
    """§1.4 fix: the engine pins UTC (the reference mixed Moscow wall
    time with naive container-local time)."""
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    row = spark.sql("SELECT to_timestamp(from_unixtime(0)) AS ts").collect()[0]
    assert row.ts == dt.datetime(1970, 1, 1, 0, 0)
