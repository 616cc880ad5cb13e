"""Round-12 operators. Each Python reference below is an independent
re-derivation from the operator's spec (pandas / set algebra / pure
Python) — never the operator's own code path — so a shared bug can't
self-pass. Oracle parity at sf0.001 is covered by
test_oracle_parity.py automatically; the sf0.01 driver-scale pin lives
in the verify sweep.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from api_weather_kafka_clickhouse_spark import registry

SPECS = registry.all_specs()


def _events_pdf(sf_dir: str) -> pd.DataFrame:
    import duckdb

    return duckdb.sql(
        f"SELECT * FROM '{sf_dir}/events.parquet' ORDER BY event_id"
    ).fetchdf()


# ------------------------------------------------ agg_bitmap_distinct


def test_bitmap_distinct_matches_pandas_nunique(spark, sf_dir):
    pdf = _events_pdf(sf_dir)
    pdf["day"] = pdf["ts"].dt.floor("D").dt.date
    ref = pdf.groupby("day").agg(
        n_events=("event_id", "size"),
        n_distinct_users=("user_id", "nunique"),
        n_words=("user_id", lambda s: (s // 64).nunique()),
    )
    got = {
        r["day"]: r
        for r in SPECS["agg_bitmap_distinct"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(ref.index)
    for day, row in ref.iterrows():
        g = got[day]
        assert g["n_events"] == row["n_events"]
        assert g["n_distinct_users"] == row["n_distinct_users"]
        assert g["n_words"] == row["n_words"]
    # the bitmap path must agree with nunique even when ids straddle
    # word boundaries (id 63 vs 64) — guaranteed above if any day has
    # users on both sides of a multiple of 64; assert the fixture
    # actually exercises that so the test can't pass vacuously
    assert (pdf["user_id"] % 64).nunique() > 1


# ------------------------------------------------ privacy_t_closeness


def test_t_closeness_matches_python_emd(spark, sf_dir):
    import duckdb
    from fractions import Fraction

    pdf = duckdb.sql(
        f"SELECT c_mktsegment, c_nationkey, "
        f"CAST(floor(c_acctbal/1000) AS BIGINT) AS band "
        f"FROM '{sf_dir}/customer.parquet'"
    ).fetchdf()
    bands = sorted(pdf["band"].unique())
    m, N = len(bands), len(pdf)
    glob_cum = {}
    run = 0
    for b in bands:
        run += int((pdf["band"] == b).sum())
        glob_cum[b] = run
    got = {
        (r["c_mktsegment"], r["c_nationkey"]): r
        for r in SPECS["privacy_t_closeness"].fn(spark, sf_dir).collect()
    }
    grouped = pdf.groupby(["c_mktsegment", "c_nationkey"])
    assert set(got) == set(grouped.groups)
    for key, g in grouped:
        n_g = len(g)
        num = 0
        cum_g = 0
        for b in bands:
            cum_g += int((g["band"] == b).sum())
            num += abs(cum_g * N - glob_cum[b] * n_g)
        emd = Fraction(num, (m - 1) * n_g * N)
        row = got[key]
        assert row["group_size"] == n_g
        assert row["m_bands"] == m
        assert row["emd_num"] == num
        assert row["emd"] == pytest.approx(float(emd), abs=1e-6)
        assert row["violates_t"] == (emd > Fraction(1, 5))
    # fixture must exercise both verdicts or the flag test is vacuous
    verdicts = {r["violates_t"] for r in got.values()}
    assert verdicts == {True, False}


# ------------------------------------------------ er_survivorship_golden


def test_survivorship_matches_python_rules(spark, sf_dir):
    import duckdb
    from collections import Counter

    pdf = duckdb.sql(
        f"SELECT * FROM '{sf_dir}/customer.parquet' ORDER BY c_custkey"
    ).fetchdf()
    got = {
        r["entity_id"]: r
        for r in SPECS["er_survivorship_golden"].fn(spark, sf_dir).collect()
    }
    grouped = pdf.groupby(pdf["c_custkey"] // 3)
    assert set(got) == set(grouped.groups)
    for eid, g in grouped:
        row = got[eid]
        assert row["n_sources"] == len(g)
        assert row["canonical_key"] == g["c_custkey"].min()
        # longest name, ties -> lexicographically smallest
        assert row["golden_name"] == sorted(
            g["c_name"], key=lambda n: (-len(n), n)
        )[0]
        # segment of the highest-key ("latest") record
        assert (
            row["latest_segment"]
            == g.loc[g["c_custkey"].idxmax(), "c_mktsegment"]
        )
        assert row["best_bal_cents"] == int(
            (g["c_acctbal"] * 100).round().max()
        )
        counts = Counter(g["c_nationkey"])
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        assert row["modal_nation"] == best


# ------------------------------------------------ time_alpha_beta_filter


def test_alpha_beta_matches_python_tracker(spark, sf_dir):
    import duckdb

    pdf = duckdb.sql(
        f"""SELECT o_orderpriority AS pri, o_orderdate AS day,
            CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS z
            FROM '{sf_dir}/orders.parquet' GROUP BY 1,2 ORDER BY 1,2"""
    ).fetchdf()
    got = {
        r["o_orderpriority"]: r
        for r in SPECS["time_alpha_beta_filter"].fn(spark, sf_dir).collect()
    }

    def tdiv(r, den):  # truncation toward zero, like r - r % den over / 
        q, rem = divmod(abs(r), den)
        return q if r >= 0 else -q

    for pri, g in pdf.groupby("pri"):
        zs = g.sort_values("day")["z"].tolist()
        x, v, sar, mar = zs[0], 0, 0, 0
        for z in zs[1:]:
            r = z - x - v
            x = x + v + tdiv(r, 4)
            v = v + tdiv(r, 16)
            sar += abs(r)
            mar = max(mar, abs(r))
        row = got[pri]
        assert row["n_days"] == len(zs)
        assert row["level_cents"] == x
        assert row["vel_cents"] == v
        assert row["sum_abs_resid"] == sar
        assert row["max_abs_resid"] == mar
    # the truncation contract matters only if negative residuals occur;
    # make sure the fixture exercises them (revenue series oscillate)
    any_neg = False
    for pri, g in pdf.groupby("pri"):
        zs = g.sort_values("day")["z"].tolist()
        x, v = zs[0], 0
        for z in zs[1:]:
            r = z - x - v
            any_neg = any_neg or r < 0
            x = x + v + tdiv(r, 4)
            v = v + tdiv(r, 16)
    assert any_neg


# ------------------------------------------------ stats_sprt_ab_monitor


def test_sprt_matches_python_walk(spark, sf_dir):
    import hashlib

    from api_weather_kafka_clickhouse_spark.operators.stats import (
        SPRT_A_MU,
        SPRT_B_MU,
        SPRT_F_MU,
        SPRT_S_MU,
    )

    pdf = _events_pdf(sf_dir)
    pdf["arm"] = [
        int(hashlib.md5(f"sprt:{u}".encode()).hexdigest()[:8], 16) % 2
        for u in pdf["user_id"]
    ]
    got = {
        r["arm"]: r
        for r in SPECS["stats_sprt_ab_monitor"].fn(spark, sf_dir).collect()
    }
    decisions = set()
    for armv, g in pdf.groupby("arm"):
        g = g.sort_values(["ts", "event_id"])
        walk, wmin, wmax = 0, 10**18, -(10**18)
        dstep, dval = None, None
        for step, et in enumerate(g["event_type"], start=1):
            walk += SPRT_S_MU if et == "purchase" else SPRT_F_MU
            wmin, wmax = min(wmin, walk), max(wmax, walk)
            if dstep is None and (walk >= SPRT_A_MU or walk <= SPRT_B_MU):
                dstep, dval = step, walk
        row = got[armv]
        assert row["n_events"] == len(g)
        assert row["n_success"] == (g["event_type"] == "purchase").sum()
        assert row["llr_final_mu"] == walk
        assert (row["walk_min_mu"], row["walk_max_mu"]) == (wmin, wmax)
        assert row["decision_step"] == dstep
        expect = (
            "continue"
            if dstep is None
            else ("accept_h1" if dval >= SPRT_A_MU else "accept_h0")
        )
        assert row["decision"] == expect
        decisions.add(row["decision"])
    # the monitor must actually DECIDE somewhere in the fixture
    assert decisions & {"accept_h1", "accept_h0"}
