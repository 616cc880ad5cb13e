"""Round-13 operators. Each Python reference below is an independent
re-derivation from the operator's spec (pandas / set algebra / pure
Python) — never the operator's own code path — so a shared bug can't
self-pass. Oracle parity at sf0.001 is covered by
test_oracle_parity.py automatically; the sf0.01 driver-scale pin lives
in the verify sweep.
"""

from __future__ import annotations

import pandas as pd
import pytest

from api_weather_kafka_clickhouse_spark import registry

SPECS = registry.all_specs()


# ------------------------------------------------ er_funnel


def _customers_pdf(sf_dir: str) -> pd.DataFrame:
    import duckdb

    return duckdb.sql(
        f"""SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
            CAST(round(c_acctbal * 100) AS BIGINT) AS bal
            FROM '{sf_dir}/customer.parquet'"""
    ).fetchdf()


def test_er_funnel_matches_python_pipeline(spark, sf_dir):
    """Re-derive all four funnel stages independently: a plain-Python
    per-segment sorted-neighborhood pass, DuckDB's built-in (already
    property-pinned) damerau_levenshtein for the verify, and a
    min-union-find for the golden-record count — no Spark windows, no
    recursive CTE, no operator helper reuse."""
    import duckdb

    pdf = _customers_pdf(sf_dir)
    cand = []
    for _, g in pdf.groupby("c_mktsegment"):
        rows = sorted(
            g.itertuples(),
            key=lambda r: (f"{r.c_nationkey}|{r.c_name}", r.c_custkey),
        )
        for i, a in enumerate(rows):
            for k in range(1, 4):  # SNM_WINDOW = 4 -> offsets 1..3
                if i + k < len(rows):
                    b = rows[i + k]
                    if a.c_nationkey == b.c_nationkey and abs(a.bal - b.bal) < 50_000:
                        cand.append(
                            (a.c_custkey, b.c_custkey, a.c_name, b.c_name)
                        )
    con = duckdb.connect()
    matched = [
        (a, b)
        for a, b, na, nb in cand
        if con.execute(
            "SELECT damerau_levenshtein(?, ?)", [na, nb]
        ).fetchone()[0]
        <= 2
    ]

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in matched:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    verts = {int(v) for pair in matched for v in pair}
    merged_away = sum(1 for v in verts if find(v) != v)

    got = {
        r["stage"]: (r["stage_idx"], r["n_records"])
        for r in SPECS["er_funnel"].fn(spark, sf_dir).collect()
    }
    assert got == {
        "total_records": (0, len(pdf)),
        "snm_candidates": (1, len(cand)),
        "dl_matches": (2, len(matched)),
        "golden_records": (3, len(pdf) - merged_away),
    }
    # the fixture must actually exercise every stage transition, or the
    # funnel test passes vacuously on an all-unique corpus
    assert len(cand) > len(matched) > 0
    assert merged_away > 0


# ------------------------------------------------ privacy_l_diversity


def test_l_diversity_matches_python_variants(spark, sf_dir):
    """Entropy and recursive-(c,l) flags re-derived with plain
    math.log over pandas value_counts — no windows, no decimal sums."""
    import math

    pdf = _customers_pdf(sf_dir)
    # bal is cents; band = floor(acctbal/1000) = floor(bal/100000)
    pdf["band"] = (pdf["bal"] // 100_000).astype("int64")
    got = {
        (r["c_mktsegment"], r["c_nationkey"]): r
        for r in SPECS["privacy_l_diversity"].fn(spark, sf_dir).collect()
    }
    groups = pdf.groupby(["c_mktsegment", "c_nationkey"])
    assert set(got) == set(groups.groups)
    for key, g in groups:
        counts = sorted(g["band"].value_counts().tolist(), reverse=True)
        n = len(g)
        ent = round(
            math.log(n) - sum(round(c * math.log(c), 6) for c in counts) / n, 4
        )
        tail = sum(counts[4:])  # ranks >= L_DIV=5 (1-indexed)
        r = got[key]
        assert r["group_size"] == n
        assert r["distinct_l"] == len(counts)
        assert r["top_freq"] == counts[0]
        assert r["tail_from_l"] == tail
        assert abs(r["entropy_nats"] - ent) < 1e-9
        assert r["meets_entropy_l"] == (ent >= 1.6094)
        assert r["meets_recursive_cl"] == (counts[0] < 1 * tail)
    # at driver scale (sf0.01+: ~12 members per class) the fixture
    # must exercise the recursive verdict in both directions; sf0.001's
    # 1-2-member classes legitimately fail it everywhere
    if len(pdf) >= 1000:
        flags_r = {r["meets_recursive_cl"] for r in got.values()}
        assert flags_r == {True, False}


# ------------------------------------------------ sim_ivf_pq_int8


def test_ivf_pq_matches_python_ivfadc(spark, sf_dir):
    """Full IVFADC re-derivation in loop-formulated numpy/python (no
    einsum, no Spark helpers): lattice quantize -> 2-update Lloyd ->
    PQ encode -> probes -> ADC -> shortlist -> exact refine. Also pins
    recall@10 of the returned neighbors vs exhaustive integer L2."""
    import random

    import duckdb
    import numpy as np

    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchdf()
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64) * 127.0
    Q = np.trunc(X + np.copysign(0.5, X)).astype(np.int64)
    ids = emb["vec_id"].astype("int64").to_numpy()
    id2idx = {int(v): i for i, v in enumerate(ids)}

    cents = Q[:8].copy()

    def assign(C):
        d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)

    for _ in range(2):  # KMEANS_I8_ITERS - 1 update rounds
        a = assign(cents)
        new = cents.copy()
        for c in range(8):
            members = Q[a == c]
            n = len(members)
            if n:
                s = members.sum(axis=0) + 127 * n
                new[c] = (2 * s + n) // (2 * n) - 127
        cents = new
    a = assign(cents)

    rng = random.Random(1427)  # the codebook's authored-constant spec
    cb = np.array(
        [[[rng.randint(-64, 63) for _ in range(8)] for _ in range(16)] for _ in range(8)],
        dtype=np.int64,
    )

    def pq_table(v):
        t = np.empty((8, 16), dtype=np.int64)
        for m in range(8):
            s = v[m * 8 : (m + 1) * 8]
            for k in range(16):
                t[m, k] = int(((s - cb[m, k]) ** 2).sum())
        return t

    enc = {int(vid): pq_table(Q[i]).argmin(axis=1) for i, vid in enumerate(ids)}

    expected = {}
    truth_hits, total = 0, 0
    got = {
        (r["query_id"], r["nbr_id"]): (r["adc"], r["l2"], r["rank"])
        for r in SPECS["sim_ivf_pq_int8"].fn(spark, sf_dir).collect()
    }
    for qi in range(8):
        i = id2idx[qi]
        dq = ((cents - Q[i]) ** 2).sum(axis=1)
        cells = set(np.argsort(dq, kind="stable")[:3].tolist())
        tab = pq_table(Q[i])
        adc = sorted(
            (
                sum(int(tab[m, enc[int(vid)][m]]) for m in range(8)),
                int(vid),
            )
            for j, vid in enumerate(ids)
            if int(vid) != qi and int(a[j]) in cells
        )
        short = adc[:32]
        rer = sorted(
            (int(((Q[id2idx[v]] - Q[i]) ** 2).sum()), v, s) for s, v in short
        )
        for rank, (l2v, v, s) in enumerate(rer[:10], 1):
            expected[(qi, v)] = (s, l2v, rank)
        # recall@10 vs exhaustive integer L2 over the whole corpus
        brute = sorted(
            (int(((Q[j] - Q[i]) ** 2).sum()), int(v))
            for j, v in enumerate(ids)
            if int(v) != qi
        )
        truth = {v for _, v in brute[:10]}
        returned = {n for (q, n) in got if q == qi}
        truth_hits += len(truth & returned)
        total += len(truth)
    assert got == expected
    recall = truth_hits / total
    assert recall >= 0.4, recall


# ------------------------------------------------ time_matrix_profile


def test_matrix_profile_matches_python_brute_force(spark, sf_dir):
    """Brute-force O(n^2) profile in plain Python over the daily
    revenue series — explicit loops, no arrays-of-leads, no joins."""
    import duckdb

    pdf = duckdb.sql(
        f"""SELECT o_orderdate AS day,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS z
            FROM '{sf_dir}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchdf()
    z = pdf["z"].tolist()
    days = pdf["day"].tolist()
    n = len(z) - 3  # windows of length 4
    wins = [z[i : i + 4] for i in range(n)]
    prof = {}
    for i in range(n):
        best = None
        for j in range(n):
            if abs(i - j) < 4:
                continue
            d = sum((wins[i][k] - wins[j][k]) ** 2 for k in range(4))
            # tiebreak: lowest neighbor index (struct-min rule)
            if best is None or (d, j) < best:
                best = (d, j)
        prof[i + 1] = (best[0], best[1] + 1, days[i])  # 1-based idx
    ranks = sorted(prof, key=lambda i: (-prof[i][0], i))
    discord = {idx: r + 1 for r, idx in enumerate(ranks)}
    got = {
        r["idx"]: r
        for r in SPECS["time_matrix_profile"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(prof)
    for i, (d, j, day) in prof.items():
        assert got[i]["nn_dist"] == d
        assert got[i]["nn_idx"] == j
        assert got[i]["day"] == day
        assert got[i]["discord_rank"] == discord[i]


# ------------------------------------------------ clickhouse_dialect_battery6


def test_battery6_matches_python_sweep(spark, sf_dir):
    """Interval metrics re-derived with a per-day python dict sweep —
    no windows, no event-union construction."""
    import datetime

    import duckdb

    pdf = duckdb.sql(
        f"""SELECT l.l_suppkey AS sk, CAST(o.o_orderdate AS DATE) AS s,
            CAST(l.l_shipdate AS DATE) AS e
            FROM '{sf_dir}/lineitem.parquet' l
            JOIN '{sf_dir}/orders.parquet' o ON o.o_orderkey = l.l_orderkey"""
    ).fetchdf()
    pdf["s"] = pd.to_datetime(pdf["s"]).dt.date
    pdf["e"] = pd.to_datetime(pdf["e"]).dt.date
    # the synthetic fixture has inverted spans (orderdate > shipdate);
    # the operator drops them — mirror that precondition
    pdf = pdf[pdf["s"] <= pdf["e"]]
    import numpy as np

    got = {
        r["l_suppkey"]: r
        for r in SPECS["clickhouse_dialect_battery6"].fn(spark, sf_dir).collect()
    }
    for sk, g in pdf.groupby("sk"):
        ivs = list(zip(g["s"], g["e"]))
        lo, hi = min(s for s, _ in ivs), max(e for _, e in ivs)
        span = (hi - lo).days + 1
        # DENSE day-grid formulation (vs the operator's sparse event
        # sweep): materialize per-day concurrency over the whole span
        grid = np.zeros(span + 1, dtype=np.int64)
        for s, e in ivs:
            grid[(s - lo).days] += 1
            grid[(e - lo).days + 1] -= 1
        conc = grid.cumsum()[:span]
        best = int(conc.max())
        best_day = lo + datetime.timedelta(days=int(conc.argmax()))
        covered = int((conc > 0).sum())
        r = got[sk]
        assert r["n_intervals"] == len(ivs)
        assert r["max_concurrent"] == best
        assert r["peak_day"] == best_day
        assert r["covered_days"] == covered
        assert r["span_days"] == span
        assert abs(r["utilization"] - round(covered / span, 6)) < 1e-9
    assert set(got) == set(pdf["sk"].unique())


# ------------------------------------------------ stats_wilcoxon_signed_rank


def test_wilcoxon_matches_python_textbook(spark, sf_dir):
    """Textbook signed-rank re-derivation: pandas half-sums, average
    ranks from a plain sorted list (float ranks, not the operator's
    2x-integer lattice), exact tie-corrected variance in Python ints."""
    import math

    import duckdb

    pdf = duckdb.sql(
        f"""SELECT user_id, event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
            CAST(round(value * 100) AS BIGINT) AS c
            FROM '{sf_dir}/events.parquet'"""
    ).fetchdf()
    d0 = pdf["day"].min()
    pdf["half"] = [1 if (d - d0).days < 15 else 2 for d in pdf["day"]]
    half = pdf.groupby(["user_id", "event_type", "half"])["c"].sum().unstack("half")
    got = {
        r["event_type"]: r
        for r in SPECS["stats_wilcoxon_signed_rank"].fn(spark, sf_dir).collect()
    }
    for et, g in half.groupby(level="event_type"):
        g = g.dropna()
        diffs = [int(b - a) for a, b in zip(g[1], g[2]) if b != a]
        if not diffs:
            assert et not in got
            continue
        n = len(diffs)
        # average ranks of |d| (floats, textbook style)
        srt = sorted(abs(x) for x in diffs)
        rank = {}
        i = 0
        while i < len(srt):
            j = i
            while j < len(srt) and srt[j] == srt[i]:
                j += 1
            rank[srt[i]] = (i + 1 + j) / 2  # mean of positions i+1..j
            i = j
        w_plus = sum(rank[abs(x)] for x in diffs if x > 0)
        ties = {}
        for x in srt:
            ties[x] = ties.get(x, 0) + 1
        tie_cubes = sum(t**3 - t for t in ties.values())
        var = (n * (n + 1) * (2 * n + 1) - tie_cubes / 2) / 24
        z = (w_plus - n * (n + 1) / 4) / math.sqrt(var)
        r = got[et]
        assert r["n_pairs"] == n
        assert r["w2_plus"] == round(2 * w_plus)
        assert r["d_stat"] == round(4 * (w_plus - n * (n + 1) / 4))
        assert r["var12"] == 2 * n * (n + 1) * (2 * n + 1) - tie_cubes
        assert abs(r["z_approx"] - z) < 1e-5
        assert r["significant"] == (z * z > 3.841459)
    assert set(got) <= set(half.index.get_level_values("event_type"))


def test_wilcoxon_overflow_guard_raises_loudly(spark):
    """Past WSR_N_MAX the 38-cap decimal verdict would silently NULL
    `significant` while the DuckDB oracle's HUGEINT keeps answering —
    the guard must turn that silent engine divergence into a loud
    error, and must stay transparent at and below the bound."""
    from pyspark.sql import functions as F

    from api_weather_kafka_clickhouse_spark.operators.stats import (
        WSR_N_MAX,
        _wsr_guard,
    )

    ok = (
        spark.range(1)
        .select(_wsr_guard(F.lit(WSR_N_MAX).cast("bigint")).alias("n_pairs"))
        .collect()
    )
    assert ok[0]["n_pairs"] == WSR_N_MAX
    with pytest.raises(Exception, match="exceeds the exact decimal"):
        spark.range(1).select(
            _wsr_guard(F.lit(WSR_N_MAX + 1).cast("bigint")).alias("n_pairs")
        ).collect()
