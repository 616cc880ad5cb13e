"""Statistical-test operators: semantics vs pure-Python references
(scipy-free, library-exact math) and plan-shape proofs for the
100 TB claims in their docstrings."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark import registry
from api_weather_kafka_clickhouse_spark.operators.stats import (
    KS_C_ALPHA,
    MAD_Z_DEN,
    MAD_Z_NUM,
)
from api_weather_kafka_clickhouse_spark.plans import checks
from api_weather_kafka_clickhouse_spark.tables import load

SPECS = registry.all_specs()


# ----------------------------------------------------- stats_ks_test


def test_ks_statistic_matches_pure_python(spark, sf_dir):
    rows = {r.source: r for r in SPECS["stats_ks_test"].fn(spark, sf_dir).collect()}
    docs = [(r.source, r.n_chars) for r in load(spark, "documents", sf_dir).collect()]
    sources = sorted({s for s, _ in docs})
    for src in sources[:4]:  # spot-check a few strata end to end
        a = sorted(x for s, x in docs if s == src)
        b = sorted(x for s, x in docs if s != src)
        n1, n2 = len(a), len(b)
        grid = sorted({x for _, x in docs})
        d_num = max(
            abs(
                sum(1 for v in a if v <= x) * n2
                - sum(1 for v in b if v <= x) * n1
            )
            for x in grid
        )
        got = rows[src]
        assert (got.n1, got.n2) == (n1, n2)
        assert got.d_stat == round(d_num / (n1 * n2), 12)
        crit = KS_C_ALPHA * math.sqrt((n1 + n2) / (n1 * n2))
        assert got.ks_crit == round(crit, 12)
        assert got.reject_h0 == (d_num / (n1 * n2) > crit)


def test_ks_windows_run_on_histogram_not_corpus(spark, sf_dir):
    # The corpus is touched only by map-side-combined counts; every
    # window runs over the value-domain histogram. If a window ever
    # saw the raw corpus, doc identity columns would appear in the
    # plan — assert column pruning keeps the scans to source+n_chars.
    from api_weather_kafka_clickhouse_spark.plans.stage import lazy_plans

    with lazy_plans():
        df = SPECS["stats_ks_test"].fn(spark, sf_dir)
        plan = checks.formatted_plan(df)
        assert "doc_id" not in plan and " text" not in plan
        for cols in checks.scan_read_schema(df):
            names = {c.split(":")[0] for c in cols.split(",") if c}
            assert names <= {"source", "n_chars"}, cols
        # the corpus-side counts are map-side combined before any exchange
        assert checks.partial_aggregate_count(df) >= 1


# ------------------------------------------------- events_anomaly_mad


def test_mad_outliers_match_pure_python(spark, sf_dir):
    out = {r.event_id: r for r in SPECS["events_anomaly_mad"].fn(spark, sf_dir).collect()}
    ev = [
        (r.event_id, r.event_type, r.value)
        for r in load(spark, "events", sf_dir).collect()
    ]
    by_type: dict[str, list[tuple[int, float]]] = {}
    for eid, et, v in ev:
        by_type.setdefault(et, []).append((eid, v))
    expected = {}
    for et, vals in by_type.items():
        ordered = sorted(vals, key=lambda t: (t[1], t[0]))
        med = ordered[(len(ordered) + 1) // 2 - 1][1]
        devs = sorted(
            ((eid, abs(v - med)) for eid, v in vals), key=lambda t: (t[1], t[0])
        )
        mad = devs[(len(devs) + 1) // 2 - 1][1]
        if mad <= 0:
            continue
        for eid, v in vals:
            score = abs(v - med) / mad
            if score > MAD_Z_NUM / MAD_Z_DEN:
                expected[eid] = (et, round(med, 6), round(mad, 6), round(score, 6))
    assert set(out) == set(expected)
    for eid, (et, med, mad, score) in expected.items():
        got = out[eid]
        assert (got.event_type, got.med, got.mad, got.mad_score) == (et, med, mad, score)


# ------------------------------------------------- stats_ttest_welch


def test_welch_t_matches_pure_python(spark, sf_dir):
    rows = {r.event_type: r for r in SPECS["stats_ttest_welch"].fn(spark, sf_dir).collect()}
    ev = [
        (r.event_type, round(float(r.value) * 100))
        for r in load(spark, "events", sf_dir).collect()
    ]
    types = sorted({t for t, _ in ev})
    for et in types:
        a = [c for t, c in ev if t == et]
        b = [c for t, c in ev if t != et]
        n1, n2 = float(len(a)), float(len(b))
        a1, a2 = float(sum(a)), float(sum(b))
        q1, q2 = float(sum(c * c for c in a)), float(sum(c * c for c in b))
        m1, m2 = a1 / n1, a2 / n2
        w1 = ((q1 - a1 * a1 / n1) / (n1 - 1)) / n1
        w2 = ((q2 - a2 * a2 / n2) / (n2 - 1)) / n2
        t = (m1 - m2) / math.sqrt(w1 + w2)
        df = (w1 + w2) * (w1 + w2) / (w1 * w1 / (n1 - 1) + w2 * w2 / (n2 - 1))
        got = rows[et]
        assert (got.n, got.n_rest) == (len(a), len(b))
        assert abs(got.t_welch - t) < 1e-6
        assert abs(got.df_welch - df) < 1e-3
        # Welch df is bracketed by min(n1,n2)-1 and n1+n2-2
        assert min(n1, n2) - 1 <= got.df_welch <= n1 + n2 - 2


def test_welch_is_one_scan_no_joins(spark, sf_dir):
    # The totals come from a global window over the 5-row reduced
    # aggregate — the plan must have exactly ONE scan of events and
    # no join operator of any kind (a cross-join-totals shape would
    # make Catalyst scan the fact table twice).
    df = SPECS["stats_ttest_welch"].fn(spark, sf_dir)
    plan = checks.simple_plan(df)
    assert plan.count("FileScan") == 1, plan
    assert "Join" not in plan, plan
    assert checks.partial_aggregate_count(df) >= 1


def test_mad_is_one_scan_one_exchange_no_joins(spark, sf_dir):
    # median + MAD attach via max(CASE WHEN rn=k) windows over the
    # same event_type partition: one scan, one hash exchange, no join
    df = SPECS["events_anomaly_mad"].fn(spark, sf_dir)
    plan = checks.simple_plan(df)
    assert plan.count("FileScan") == 1, plan
    assert "Join" not in plan, plan
    assert checks.shuffle_count(df) == 1, plan


# ------------------------------------------------ time_autocorr_lag1


def test_autocorr_matches_pure_python(spark, sf_dir):
    rows = {r.event_type: r for r in SPECS["time_autocorr_lag1"].fn(spark, sf_dir).collect()}
    ev = [
        (r.event_type, r.ts, r.event_id, round(float(r.value) * 100))
        for r in load(spark, "events", sf_dir).collect()
        if r.ts is not None
    ]
    by_type: dict[str, list[tuple]] = {}
    for et, ts, eid, c in ev:
        by_type.setdefault(et, []).append((ts, eid, c))
    for et, series in by_type.items():
        series.sort(key=lambda t: (t[0], t[1]))
        pairs = [(series[i][2], series[i + 1][2]) for i in range(len(series) - 1)]
        n = float(len(pairs))
        sx = float(sum(x for x, _ in pairs))
        sy = float(sum(y for _, y in pairs))
        sxy = float(sum(x * y for x, y in pairs))
        sxx = float(sum(x * x for x, _ in pairs))
        syy = float(sum(y * y for _, y in pairs))
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        if varx * vary <= 0:
            assert et not in rows
            continue
        r1 = (n * sxy - sx * sy) / math.sqrt(varx * vary)
        got = rows[et]
        assert got.n_pairs == len(pairs)
        assert abs(got.r1 - r1) < 1e-7
        assert -1.0 <= got.r1 <= 1.0


def test_autocorr_reads_only_needed_columns(spark, sf_dir):
    cols = ",".join(checks.scan_read_schema(SPECS["time_autocorr_lag1"].fn(spark, sf_dir)))
    assert "props" not in cols and "user_id" not in cols
