"""embedding_pq_int8: the distributed encode matches a pure-Python
PQ assignment, and the plan is scan-only (no shuffle, no UDF)."""

from __future__ import annotations

from api_weather_kafka_clickhouse_spark import registry
from api_weather_kafka_clickhouse_spark.operators.similarity import (
    _PQ_CB,
    PQ_K,
    PQ_M,
    PQ_SCALE,
    PQ_SUB,
)
from api_weather_kafka_clickhouse_spark.plans import checks
from api_weather_kafka_clickhouse_spark.tables import load

SPECS = registry.all_specs()


def _py_round_half_away(x: float) -> int:
    import math

    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def test_pq_codes_match_pure_python(spark, sf_dir):
    out = {r.vec_id: r for r in SPECS["embedding_pq_int8"].fn(spark, sf_dir).collect()}
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load(spark, "embeddings", sf_dir).collect()
    }
    assert set(out) == set(vecs)
    for vid, v in list(vecs.items())[:50]:
        c = [_py_round_half_away(x * PQ_SCALE) for x in v]
        codes, err = [], 0
        for m in range(PQ_M):
            sub = c[m * PQ_SUB : (m + 1) * PQ_SUB]
            dists = [
                (sum((a - b) * (a - b) for a, b in zip(sub, _PQ_CB[m][k])), k)
                for k in range(PQ_K)
            ]
            d, k = min(dists)
            codes.append(k)
            err += d
        got = out[vid]
        assert got.pq_codes == ",".join(str(k) for k in codes), vid
        assert got.sq_err == err, vid


def test_pq_is_scan_plus_one_arrow_map(spark, sf_dir):
    # Encode is a single Arrow-batched map over the scan: no shuffle,
    # no explode, no per-row Python — the shape that scales to
    # billions of vectors.
    df = SPECS["embedding_pq_int8"].fn(spark, sf_dir)
    plan = checks.simple_plan(df)
    assert checks.shuffle_count(df) == 0, plan
    assert "Generate" not in plan, plan  # no explode
    assert "BatchEvalPython" not in plan, plan  # no row-at-a-time UDF
    assert "MapInPandas" in plan, plan
