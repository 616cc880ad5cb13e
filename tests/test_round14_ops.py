"""Round-14 operators. Each Python reference below is an independent
re-derivation from the operator's spec (pure Python / pandas / DuckDB
scalar calls) — never the operator's own code path — so a shared bug
can't self-pass. Oracle parity at sf0.001 is covered by
test_oracle_parity.py automatically; the sf0.01 driver-scale pin lives
in the verify sweep."""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
import pytest

from api_weather_kafka_clickhouse_spark import registry

SPECS = registry.all_specs()


# ------------------------------------------------ er_reconcile


def _customers_pdf(sf_dir: str) -> pd.DataFrame:
    import duckdb

    return duckdb.sql(
        f"""SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
            CAST(round(c_acctbal * 100) AS BIGINT) AS bal
            FROM '{sf_dir}/customer.parquet'"""
    ).fetchdf()


def _reconcile_reference(sf_dir: str) -> dict[str, tuple[int, int]]:
    """All six stages from first principles: dict-bucketed prefix
    blocking, a plain per-segment sorted-neighborhood pass, DuckDB's
    built-in (property-pinned) damerau_levenshtein for the verify, and
    two min-union-finds — no Spark, no recursive CTE, no operator
    helper reuse."""
    import duckdb

    pdf = _customers_pdf(sf_dir)
    con = duckdb.connect()
    dl_memo: dict[tuple[str, str], int] = {}

    def dl(x: str, y: str) -> int:
        k = (x, y) if x <= y else (y, x)
        if k not in dl_memo:
            dl_memo[k] = con.execute(
                "SELECT damerau_levenshtein(?, ?)", list(k)
            ).fetchone()[0]
        return dl_memo[k]

    # streaming blocker: nation | name[:16] equality blocks, all pairs
    # within a block (the ingest path's caps only shave hot blocks)
    blocks: dict[tuple[int, str], list] = defaultdict(list)
    for r in pdf.itertuples():
        blocks[(r.c_nationkey, r.c_name[:16])].append(r)
    stream: set[tuple[int, int]] = set()
    for rows in blocks.values():
        for i, a in enumerate(rows):
            for b in rows[i + 1 :]:
                if abs(a.bal - b.bal) < 50_000 and dl(a.c_name, b.c_name) <= 2:
                    pair = (a.c_custkey, b.c_custkey)
                    stream.add((min(pair), max(pair)))

    # batch funnel: per-segment SNM window (offsets 1..3), same verify
    batch: set[tuple[int, int]] = set()
    for _, g in pdf.groupby("c_mktsegment"):
        rows = sorted(
            g.itertuples(),
            key=lambda r: (f"{r.c_nationkey}|{r.c_name}", r.c_custkey),
        )
        for i, a in enumerate(rows):
            for k in range(1, 4):  # SNM_WINDOW = 4 -> offsets 1..3
                if i + k < len(rows):
                    b = rows[i + k]
                    if (
                        a.c_nationkey == b.c_nationkey
                        and abs(a.bal - b.bal) < 50_000
                        and dl(a.c_name, b.c_name) <= 2
                    ):
                        pair = (a.c_custkey, b.c_custkey)
                        batch.add((min(pair), max(pair)))

    def components(pairs: set[tuple[int, int]]) -> dict[int, int]:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        verts = {int(v) for p in pairs for v in p}
        return {v: find(v) for v in verts}

    union_pairs = stream | batch
    comp_s = components(stream)
    comp_u = components(union_pairs)
    corrected = sum(
        1
        for k in pdf["c_custkey"]
        if comp_s.get(int(k), int(k)) != comp_u.get(int(k), int(k))
    )
    merged_away = sum(1 for v, c in comp_u.items() if v != c)
    return {
        "total_records": (0, len(pdf)),
        "stream_matches": (1, len(stream)),
        "batch_matches": (2, len(batch)),
        "batch_only_matches": (3, len(batch - stream)),
        "corrected_records": (4, corrected),
        "golden_records_after": (5, len(pdf) - merged_away),
    }


def test_er_reconcile_matches_python_pipeline(spark, sf_dir):
    want = _reconcile_reference(sf_dir)
    got = {
        r["stage"]: (r["stage_idx"], r["n_records"])
        for r in SPECS["er_reconcile"].fn(spark, sf_dir).collect()
    }
    assert got == want
    # both candidate generators must actually fire on the fixture
    assert want["stream_matches"][1] > 0
    assert want["golden_records_after"][1] < want["total_records"][1]


@pytest.mark.slow
def test_er_reconcile_full_funnel_at_driver_scale(spark):
    """sf0.01 exercises every stage TRANSITION: links only the batch
    sweep finds (the streaming blocker's prefix-edit recall gap),
    links only the blocker finds (pairs beyond SNM's w-1 adjacency),
    and records whose golden entity changes under the monotone
    repair — without this the reconcile test passes vacuously on the
    small fixture where the two generators agree."""
    sf01 = "/root/testdata/sf0.01"
    want = _reconcile_reference(sf01)
    got = {
        r["stage"]: (r["stage_idx"], r["n_records"])
        for r in SPECS["er_reconcile"].fn(spark, sf01).collect()
    }
    assert got == want
    assert want["batch_only_matches"][1] > 0
    assert want["corrected_records"][1] > 0
    assert want["stream_matches"][1] > want["batch_matches"][1]


# ------------------------------------------------ stats_mann_kendall


def test_mann_kendall_matches_python_textbook(spark, sf_dir):
    """Textbook re-derivation: pandas daily sums, a plain double loop
    for S, tie groups from a Counter, float variance and z from math
    (not the operator's x18-integral lattice or cross-multiplied
    verdict) — so a shared formulation bug can't self-pass."""
    import math
    from collections import Counter

    import duckdb

    pdf = duckdb.sql(
        f"""SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
            CAST(round(value * 100) AS BIGINT) AS c
            FROM '{sf_dir}/events.parquet'"""
    ).fetchdf()
    daily = (
        pdf.groupby(["event_type", "day"])["c"].sum().reset_index(name="x")
    )
    got = {
        r["event_type"]: r
        for r in SPECS["stats_mann_kendall"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(daily["event_type"].unique())
    for et, g in daily.groupby("event_type"):
        xs = [int(x) for _, x in sorted(zip(g["day"], g["x"]))]
        n = len(xs)
        s = sum(
            (0 if xs[j] == xs[i] else (1 if xs[j] > xs[i] else -1))
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = Counter(xs)
        var = (
            n * (n - 1) * (2 * n + 5)
            - sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        ) / 18.0
        if var > 0 and s != 0:
            z = (s - (1 if s > 0 else -1)) / math.sqrt(var)
        else:
            z = 0.0
        sig = s != 0 and z * z > 3.841459
        r = got[et]
        assert r["n_days"] == n
        assert r["s_stat"] == s
        assert r["var18"] == round(18 * var)
        assert abs(r["z_approx"] - z) < 1e-5
        assert r["significant"] == sig
        assert r["trend"] == (
            "no_trend" if not sig else ("increasing" if s > 0 else "decreasing")
        )


# ------------------------------------------------ privacy_k_map


def test_k_map_matches_python_reference(spark, sf_dir):
    """Independent pandas re-derivation of the population attack
    model: population class sizes from the customer dimension, sample
    class sizes from the set of transacting customers, risk flags at
    K=10 — plain dict arithmetic, no SQL."""
    import duckdb

    cust = duckdb.sql(
        f"SELECT c_custkey, c_mktsegment, c_nationkey FROM '{sf_dir}/customer.parquet'"
    ).fetchdf()
    buyers = set(
        duckdb.sql(
            f"""SELECT DISTINCT o_custkey FROM '{sf_dir}/orders.parquet'
            WHERE o_orderstatus = 'F'"""
        ).fetchdf()["o_custkey"]
    )
    pop: dict[tuple, int] = {}
    samp: dict[tuple, int] = {}
    for r in cust.itertuples():
        qi = (r.c_mktsegment, r.c_nationkey)
        pop[qi] = pop.get(qi, 0) + 1
        if r.c_custkey in buyers:
            samp[qi] = samp.get(qi, 0) + 1
    got = {
        (r["c_mktsegment"], r["c_nationkey"]): r
        for r in SPECS["privacy_k_map"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(samp)  # only RELEASED classes are audited
    for qi, row in got.items():
        assert row["n_sample"] == samp[qi]
        assert row["n_population"] == pop[qi]
        assert row["at_risk"] == (pop[qi] < 10)
        assert abs(row["reident_risk"] - round(1.0 / pop[qi], 9)) < 1e-12
    # non-vacuity at the small fixture: the risk flag actually fires
    assert any(r["at_risk"] for r in got.values())


@pytest.mark.slow
def test_k_map_separates_sample_and_population_models():
    """The whole point of k-map vs k-anonymity: at sf0.01 some class
    must be SAMPLE-rare (k-anonymity on the release would flag it)
    yet POPULATION-safe (the k-map attacker cannot single it out) —
    on the tiny sf0.001 fixture every class is rare in both models
    and the distinction is vacuous."""
    import duckdb

    sf01 = "/root/testdata/sf0.01"
    rows = duckdb.sql(
        f"""WITH pop AS (
              SELECT c_mktsegment, c_nationkey, count(*) AS np
              FROM '{sf01}/customer.parquet' GROUP BY 1, 2),
            samp AS (
              SELECT c.c_mktsegment, c.c_nationkey,
                     count(DISTINCT c.c_custkey) AS ns
              FROM '{sf01}/customer.parquet' c
              JOIN '{sf01}/orders.parquet' o ON o.o_custkey = c.c_custkey
              WHERE o.o_orderstatus = 'F'
              GROUP BY 1, 2)
            SELECT ns, np FROM samp JOIN pop USING (c_mktsegment, c_nationkey)
        """
    ).fetchall()
    assert any(ns < 10 <= np for ns, np in rows)
