"""Every registered query must hash-match its DuckDB oracle — the
local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from api_weather_kafka_clickhouse_spark import registry
from api_weather_kafka_clickhouse_spark.oracle import compare

SPECS = registry.all_specs()
ORACLE_CHECKED = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_parity(name, spark, duck, sf_dir):
    spec = SPECS[name]
    result = compare(spec.fn(spark, sf_dir), duck, spec.oracle)
    assert result["rows_match"], f"{name}: rows {result['spark_rows']} != {result['duck_rows']}"
    assert result["schema_match"], (
        f"{name}: cols {result['spark_cols']} != {result['duck_cols']}"
    )
    assert result["hash_match"], f"{name}: value hash mismatch ({result})"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, spark, sf_dir):
    df = SPECS[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
