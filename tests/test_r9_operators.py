"""Round-9 operators: the geo grid-join family is pinned against a
brute-force all-pairs recomputation in Spark itself (the oracle-parity
replica already pins it against DuckDB), plus plan-shape and
exactness invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark import registry
from api_weather_kafka_clickhouse_spark.operators.geo import (
    RADIUS2,
    _points,
    _with_cell,
)

SPECS = registry.all_specs()


# ------------------------------------------------------- geo family


def _brute_pairs(spark, sf_dir):
    """All-pairs radius join, no grid: the semantic ground truth."""
    a = _points(spark, sf_dir)
    b = (
        a.select(
            F.col("point_id").alias("point_b"),
            F.col("lat_off").alias("lat_b"),
            F.col("lon_off").alias("lon_b"),
        )
    )
    d2 = (F.col("lat_off") - F.col("lat_b")) * (F.col("lat_off") - F.col("lat_b")) + (
        F.col("lon_off") - F.col("lon_b")
    ) * (F.col("lon_off") - F.col("lon_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("point_id") < F.col("point_b"))
        .select(
            F.col("point_id").alias("point_a"),
            "point_b",
            d2.cast("bigint").alias("dist2"),
        )
        .filter(F.col("dist2") <= RADIUS2)
    )


def test_grid_radius_join_equals_brute_force(spark, sf_dir):
    grid = {tuple(r) for r in SPECS["geo_radius_join"].fn(spark, sf_dir).collect()}
    brute = {tuple(r) for r in _brute_pairs(spark, sf_dir).collect()}
    assert grid == brute and len(grid) > 0


def test_knn_is_argmin_of_radius_candidates(spark, sf_dir):
    knn = {
        r["point_id"]: (r["dist2"], r["nn_id"])
        for r in SPECS["geo_knn_grid"].fn(spark, sf_dir).collect()
    }
    # ground truth: argmin over the symmetrized brute-force pair set,
    # with the operator's (dist2, nn_id) tiebreak
    best: dict[int, tuple[int, int]] = {}
    for r in _brute_pairs(spark, sf_dir).collect():
        for me, other in ((r["point_a"], r["point_b"]), (r["point_b"], r["point_a"])):
            cand = (r["dist2"], other)
            if me not in best or cand < best[me]:
                best[me] = cand
    assert knn == best and len(knn) > 0
    assert all(d2 <= RADIUS2 for d2, _ in knn.values())


def test_radius_join_plan_is_grid_equi_join_not_cartesian(spark, sf_dir):
    plan = (
        SPECS["geo_radius_join"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cell_density_counts_sum_to_population(spark, sf_dir):
    out = SPECS["geo_cell_density"].fn(spark, sf_dir)
    rows = out.collect()
    assert 0 < len(rows) <= 20
    n_pts = _points(spark, sf_dir).count()
    # top-20 cells can't exceed the population; every centroid must
    # fall inside its own cell's degree bounds
    assert sum(r["n_points"] for r in rows) <= n_pts
    for r in rows:
        assert r["cell_x"] * 10 - 180 <= r["centroid_lon"] < (r["cell_x"] + 1) * 10 - 180
        assert r["cell_y"] * 10 - 90 <= r["centroid_lat"] < (r["cell_y"] + 1) * 10 - 90


def test_points_derivation_is_stable_and_in_range(spark, sf_dir):
    pts = _with_cell(_points(spark, sf_dir), 50_000).collect()
    assert len(pts) > 0
    for r in pts:
        assert 0 <= r["lat_off"] < 1_800_000
        assert 0 <= r["lon_off"] < 3_600_000
        assert r["cell_x"] == r["lon_off"] // 50_000
        assert r["cell_y"] == r["lat_off"] // 50_000


# ------------------------------------------------ stats: chi2 / MW


def test_chi_square_matches_pure_python(spark, sf_dir):
    from collections import Counter

    from api_weather_kafka_clickhouse_spark.operators.stats import WH_Z95
    from api_weather_kafka_clickhouse_spark.tables import load

    rows = load(spark, "events", sf_dir).select("event_type", "ts").collect()
    obs = Counter((r["event_type"], r["ts"].isoweekday()) for r in rows)
    rtot = Counter()
    ctot = Counter()
    for (et, dow), o in obs.items():
        rtot[et] += o
        ctot[dow] += o
    n = sum(obs.values())
    chi2 = 0.0
    for (et, dow), o in obs.items():
        e = rtot[et] * ctot[dow] / n
        chi2 += round((o - e) * (o - e) / e, 6)
    out = SPECS["stats_chi_square"].fn(spark, sf_dir).collect()[0]
    assert out["big_n"] == n
    assert out["df"] == (len(rtot) - 1) * (len(ctot) - 1)
    assert abs(float(out["chi2"]) - chi2) < 1e-6
    df = out["df"]
    crit = df * (1 - 2 / (9 * df) + WH_Z95 * (2 / (9 * df)) ** 0.5) ** 3
    assert abs(out["chi2_crit"] - crit) < 1e-5
    assert out["reject_h0"] == (float(out["chi2"]) > crit)


def test_mann_whitney_matches_pure_python_ranks(spark, sf_dir):
    from collections import Counter, defaultdict

    from api_weather_kafka_clickhouse_spark.tables import load

    rows = (
        load(spark, "events", sf_dir)
        .select("event_type", "value")
        .filter("value IS NOT NULL")
        .collect()
    )
    cnt = Counter(r["value"] for r in rows)
    # 2x tie-averaged rank per distinct value
    rank2 = {}
    cum = 0
    for v in sorted(cnt):
        rank2[v] = 2 * cum + cnt[v] + 1
        cum += cnt[v]
    n = len(rows)
    tie_t = sum(c**3 - c for c in cnt.values())
    r2 = defaultdict(int)
    n1 = Counter()
    for r in rows:
        r2[r["event_type"]] += rank2[r["value"]]
        n1[r["event_type"]] += 1
    out = {r["event_type"]: r for r in SPECS["stats_mann_whitney"].fn(spark, sf_dir).collect()}
    assert set(out) == set(n1)
    for et, row in out.items():
        assert row["n1"] == n1[et] and row["n2"] == n - n1[et]
        u2 = r2[et] - n1[et] * (n1[et] + 1)
        assert row["u2"] == u2
        var = n1[et] * (n - n1[et]) / 12 * ((n + 1) - tie_t / (n * (n - 1)))
        z = (u2 - n1[et] * (n - n1[et])) / (2 * var**0.5)
        assert abs(row["z"] - z) < 1e-6


# --------------------------------------------- graph: pagerank/kcore


def test_pagerank_mass_conservation(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.affinity import (
        PR_HOPS,
        PR_MASS,
        _pagerank_masses,
    )

    m, caches = _pagerank_masses(spark, sf_dir)
    try:
        rows = m.collect()
        n = len(rows)
        total = sum(r["mass"] for r in rows)
        # only the teleport pool's mod-n remainder is dropped, once per
        # iteration: total mass decays by < n units per hop, never grows
        assert 0 <= n * PR_MASS - total < PR_HOPS * n
        assert all(r["mass"] >= 0 for r in rows)
    finally:
        for c in caches:
            c.unpersist()


def test_kcore_survivors_have_core_degree_when_converged(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.affinity import KCORE_K

    rows = SPECS["graph_kcore"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    converged = rows[0]["converged"]
    assert all(r["converged"] == converged for r in rows)
    if converged:
        # at the fixpoint every survivor keeps >= k neighbors inside
        # the surviving set — the defining k-core property
        assert all(r["deg_core"] >= KCORE_K for r in rows)


# ------------------------------------------- dedup: prefix filtering


def test_prefix_filter_jaccard_equals_inverted_index(spark, sf_dir):
    a = {tuple(r) for r in SPECS["dedup_jaccard_prefix"].fn(spark, sf_dir).collect()}
    b = {tuple(r) for r in SPECS["dedup_ngram_jaccard"].fn(spark, sf_dir).collect()}
    assert a == b


def test_prefix_filter_shrinks_candidate_set(spark, sf_dir):
    from pyspark.sql import Window

    from api_weather_kafka_clickhouse_spark.operators.dedup import (
        _doc_shingles_exploded,
        _shingle_sizes,
    )

    e = _doc_shingles_exploded(spark, sf_dir).persist()
    try:
        full = (
            e.select(F.col("doc_id").alias("a"), "shingle")
            .join(e.select(F.col("doc_id").alias("b"), "shingle"), "shingle")
            .filter("a < b")
            .select("a", "b")
            .distinct()
            .count()
        )
        dfreq = e.groupBy("shingle").agg(F.count(F.lit(1)).alias("dfreq"))
        w = Window.partitionBy("doc_id").orderBy("dfreq", "shingle")
        pref = (
            e.join(dfreq, "shingle")
            .withColumn("rk", F.row_number().over(w))
            .join(_shingle_sizes(e), "doc_id")
            .filter(F.col("rk") <= F.col("n") - F.expr("(4 * n + 4) div 5") + 1)
            .select("doc_id", "shingle")
        )
        pruned = (
            pref.select(F.col("doc_id").alias("a"), "shingle")
            .join(pref.select(F.col("doc_id").alias("b"), "shingle"), "shingle")
            .filter("a < b")
            .select("a", "b")
            .distinct()
            .count()
        )
        # the filter must prune candidates, not just match them
        assert pruned < full
    finally:
        e.unpersist()


# -------------------------------------------------- sim: MMR rerank


def test_mmr_structure_and_greedy_start(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.similarity import MMR_K

    rows = SPECS["sim_mmr_rerank"].fn(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    top1 = {
        r["query_id"]: r["nbr_id"]
        for r in SPECS["sim_topk_bruteforce"].fn(spark, sf_dir).collect()
        if r["rank"] == 1
    }
    for qid, sel in by_q.items():
        # exactly K selections, steps 1..K, no repeats
        assert sorted(r["step"] for r in sel) == list(range(1, MMR_K + 1))
        assert len({r["nbr_id"] for r in sel}) == MMR_K
        # step 1 is pure relevance: must equal the brute-force top-1
        first = next(r for r in sel if r["step"] == 1)
        assert first["nbr_id"] == top1[qid]
        assert first["pen"] == 0
        # the integer objective is consistent on every row
        assert all(r["mmr10"] == 7 * r["rel_q"] - 3 * r["pen"] for r in sel)


# --------------------------------------- clickhouse vocabulary (r9)


def test_ch_round9_vocabulary_kernels(spark):
    from api_weather_kafka_clickhouse_spark.functions import clickhouse as ch

    df = spark.createDataFrame(
        [([10, 13, 21],), ([5],)], "arr array<bigint>"
    ).select(
        ch.arrayDifference("arr").alias("diffs"),
        ch.arrayMax(ch.arrayDifference("arr")).alias("max_gap"),
        ch.bar(F.size("arr") * 200000, 0.0, 600000.0, 10).alias("b"),
        ch.transform_lookup(
            F.size("arr").cast("string"), {"3": "three"}, "other"
        ).alias("t"),
    )
    rows = df.collect()
    assert rows[0]["diffs"] == [3, 8] and rows[0]["max_gap"] == 8
    assert rows[1]["diffs"] == [] and rows[1]["max_gap"] is None
    assert rows[0]["b"] == "█" * 10  # clamped at width
    assert rows[1]["b"] == "█" * 3
    assert rows[0]["t"] == "three" and rows[1]["t"] == "other"


# ------------------------------------------ privacy DP / bootstrap


def test_dp_noise_matches_pure_python_laplace(spark, sf_dir):
    import hashlib
    import math

    rows = SPECS["privacy_dp_counts"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        seed = f"dp:{r['event_type']}:{r['dow']}".encode()
        h = int(hashlib.md5(seed).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        sign = 1.0 if u >= 0.5 else -1.0
        noise = -1.0 * sign * math.log(1.0 - 2.0 * abs(u - 0.5))
        assert abs(r["noise"] - noise) < 1e-6
        assert abs(r["noisy_count"] - (r["true_count"] + noise)) < 1e-5


def test_bootstrap_ci_brackets_the_mean(spark, sf_dir):
    row = SPECS["stats_bootstrap_ci"].fn(spark, sf_dir).collect()[0]
    assert row["n"] > 0 and row["n_resamples"] == 64
    assert row["ci_lo"] < row["ci_hi"]
    # at these sample sizes the full-sample mean sits inside a 95% CI
    assert row["ci_lo"] <= row["mean_full"] <= row["ci_hi"]


# ------------------------------------- rake / json audit / holt


def test_rake_scores_match_pure_python(spark, sf_dir):
    from collections import Counter

    from api_weather_kafka_clickhouse_spark.functions.text import STOPWORDS
    from api_weather_kafka_clickhouse_spark.operators.text_analysis import (
        RAKE_MAX_WORDS,
        RAKE_TOP,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    docs = load(spark, "documents", sf_dir).select("doc_id", "text").collect()
    sw = set(STOPWORDS)
    phrases: list[tuple[str, ...]] = []
    for d in docs:
        cur: list[str] = []
        for tok in d["text"].split(" "):
            if tok in sw:
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(tok)
        if cur:
            phrases.append(tuple(cur))
    phrases = [p for p in phrases if len(p) <= RAKE_MAX_WORDS]
    freq: Counter = Counter()
    deg: Counter = Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    by_text = Counter(" ".join(p) for p in phrases)
    scores = {
        t: sum(round(deg[w] / freq[w], 9) for w in t.split(" ")) for t in by_text
    }
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:RAKE_TOP]
    out = SPECS["text_keyword_rake"].fn(spark, sf_dir).collect()
    assert len(out) == min(RAKE_TOP, len(scores))
    for r in out:
        assert r["n_occurrences"] == by_text[r["phrase"]]
        assert abs(r["score"] - scores[r["phrase"]]) < 1e-6
    assert {r["phrase"] for r in out} == {t for t, _ in top}


def test_json_audit_counts_are_consistent(spark, sf_dir):
    rows = SPECS["quality_json_audit"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n"] >= r["n_valid_json"] >= r["n_has_k"] >= r["n_k_in_range"]
        if r["n_has_k"]:
            assert r["k_min"] <= r["k_max"]


def test_holt_fold_matches_pure_python(spark, sf_dir):
    from collections import Counter

    from api_weather_kafka_clickhouse_spark.tables import load

    ev = load(spark, "events", sf_dir).select("event_type", "ts").collect()
    daily: Counter = Counter((r["event_type"], r["ts"].date()) for r in ev)
    series: dict[str, list[int]] = {}
    for (et, day), x in sorted(daily.items()):
        series.setdefault(et, []).append(x)
    out = {r["event_type"]: r for r in SPECS["time_holt_linear"].fn(spark, sf_dir).collect()}
    assert set(out) == set(series)
    for et, xs in series.items():
        lvl, trd = float(xs[0]), 0.0
        for x in xs[1:]:
            new_lvl = 0.5 * x + 0.5 * (lvl + trd)
            trd = 0.5 * (new_lvl - lvl) + 0.5 * trd
            lvl = new_lvl
        r = out[et]
        assert r["n_days"] == len(xs)
        assert abs(r["level"] - lvl) < 1e-6
        assert abs(r["trend"] - trd) < 1e-6
        assert abs(r["forecast_h7"] - (lvl + 7 * trd)) < 1e-6


# ------------------------- binary hamming / k-center coreset


def test_binary_hamming_matches_pure_python_packing(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.similarity import (
        BQ_TOP_K,
        N_QUERIES,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    vecs = {
        r["vec_id"]: r["embedding"]
        for r in load(spark, "embeddings", sf_dir).collect()
    }

    def pack(v):
        h1 = sum(1 << i for i in range(32) if v[i] > 0)
        h2 = sum(1 << i for i in range(32) if v[i + 32] > 0)
        return h1, h2

    packed = {k: pack(v) for k, v in vecs.items()}
    out = SPECS["embedding_binary_hamming"].fn(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(N_QUERIES))
    for qid, rows in by_q.items():
        qh1, qh2 = packed[qid]
        truth = sorted(
            (
                (bin(qh1 ^ h1).count("1") + bin(qh2 ^ h2).count("1"), nid)
                for nid, (h1, h2) in packed.items()
                if nid != qid
            )
        )[:BQ_TOP_K]
        got = sorted((r["hamming"], r["nbr_id"]) for r in rows)
        assert got == truth


def test_kcenter_is_monotone_farthest_point(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.similarity import KCENTER_K

    rows = sorted(
        SPECS["sample_kcenter_coreset"].fn(spark, sf_dir).collect(),
        key=lambda r: r["step"],
    )
    assert [r["step"] for r in rows] == list(range(1, KCENTER_K + 1))
    assert rows[0]["vec_id"] == 0 and rows[0]["mind_q"] == 0
    assert len({r["vec_id"] for r in rows}) == KCENTER_K
    # farthest-point traversal: the selected min-distance is
    # non-increasing after the seed
    dists = [r["mind_q"] for r in rows[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:]))
    assert all(d >= 0 for d in dists)


# -------------------------------------------------- survival (KM)


def test_km_matches_pure_python_estimator(spark, sf_dir):
    import math
    from collections import defaultdict

    from api_weather_kafka_clickhouse_spark.operators.stats import KM_CHURN_DAYS
    from api_weather_kafka_clickhouse_spark.tables import load

    orders = load(spark, "orders", sf_dir).select("o_custkey", "o_orderdate").collect()
    cust = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in load(spark, "customer", sf_dir).collect()
    }
    first: dict[int, object] = {}
    last: dict[int, object] = {}
    for r in orders:
        k, d = r["o_custkey"], r["o_orderdate"]
        first[k] = min(first.get(k, d), d)
        last[k] = max(last.get(k, d), d)
    horizon = max(last.values())
    by_seg: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for k in first:
        dur = (last[k].date() - first[k].date()).days
        event = 1 if (horizon.date() - last[k].date()).days > KM_CHURN_DAYS else 0
        by_seg[cust[k]].append((dur, event))
    out = {
        (r["segment"], r["t_days"]): r
        for r in SPECS["stats_survival_km"].fn(spark, sf_dir).collect()
    }
    n_checked = 0
    for seg, obs in by_seg.items():
        obs.sort()
        n = len(obs)
        ln_cum, zero, seen = 0.0, False, 0
        by_dur: dict[int, tuple[int, int]] = {}
        for dur, ev in obs:
            d, m = by_dur.get(dur, (0, 0))
            by_dur[dur] = (d + ev, m + 1)
        for dur in sorted(by_dur):
            d, m = by_dur[dur]
            n_risk = n - seen
            seen += m
            if d == 0:
                continue
            if n_risk == d:
                zero = True
            if not zero:
                ln_cum += round(math.log((n_risk - d) / n_risk), 9)
            r = out[(seg, dur)]
            assert r["n_risk"] == n_risk and r["d_events"] == d
            expect = 0.0 if zero else round(math.exp(ln_cum), 6)
            assert abs(r["survival"] - expect) < 1e-6
            n_checked += 1
    assert n_checked == len(out) and n_checked > 0


# ------------------------------------------------------ theil-sen


def test_theil_sen_matches_pure_python_median_slope(spark, sf_dir):
    from collections import Counter

    from api_weather_kafka_clickhouse_spark.tables import load

    ev = load(spark, "events", sf_dir).select("event_type", "ts").collect()
    daily: Counter = Counter((r["event_type"], r["ts"].date()) for r in ev)
    series: dict[str, list[int]] = {}
    for (et, day), x in sorted(daily.items()):
        series.setdefault(et, []).append(x)
    out = {r["event_type"]: r for r in SPECS["stats_theil_sen"].fn(spark, sf_dir).collect()}
    assert set(out) == set(series)
    for et, xs in series.items():
        slopes = []
        for i in range(len(xs)):
            for j in range(i + 1, len(xs)):
                slopes.append(((xs[j] - xs[i]) / (j - i), i + 1, j + 1))
        slopes.sort()
        lower_median = slopes[(len(slopes) + 1) // 2 - 1][0]
        r = out[et]
        assert r["n_pairs"] == len(slopes)
        assert abs(r["slope_per_day"] - lower_median) < 1e-6


# --------------------------------------- kruskal-wallis / dbscan


def test_kruskal_wallis_matches_pure_python(spark, sf_dir):
    from collections import Counter, defaultdict

    from api_weather_kafka_clickhouse_spark.tables import load

    rows = (
        load(spark, "events", sf_dir)
        .select("event_type", "value")
        .filter("value IS NOT NULL")
        .collect()
    )
    cnt = Counter(r["value"] for r in rows)
    rank2 = {}
    cum = 0
    for v in sorted(cnt):
        rank2[v] = 2 * cum + cnt[v] + 1
        cum += cnt[v]
    n = len(rows)
    tie_t = sum(c**3 - c for c in cnt.values())
    r2 = defaultdict(int)
    n1 = Counter()
    for r in rows:
        r2[r["event_type"]] += rank2[r["value"]]
        n1[r["event_type"]] += 1
    s = sum(round(r2[g] * r2[g] / (4.0 * n1[g]), 6) for g in r2)
    h = (12.0 * s / (n * (n + 1)) - 3.0 * (n + 1)) / (
        1.0 - tie_t / (float(n) * n * n - n)
    )
    out = SPECS["stats_kruskal_wallis"].fn(spark, sf_dir).collect()[0]
    assert out["big_n"] == n and out["k"] == len(r2) and out["df"] == len(r2) - 1
    assert abs(out["h_stat"] - h) < 1e-5


def test_dbscan_roles_match_brute_force(spark, sf_dir):
    from collections import defaultdict

    from api_weather_kafka_clickhouse_spark.operators.geo import (
        DBSCAN_MINPTS,
        RADIUS2,
        _points,
    )

    pts = {r["point_id"]: (r["lat_off"], r["lon_off"]) for r in _points(spark, sf_dir).collect()}
    nbrs = defaultdict(set)
    ids = list(pts)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d2 = (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
            if d2 <= RADIUS2:
                nbrs[a].add(b)
                nbrs[b].add(a)
    core = {p for p in ids if len(nbrs[p]) >= DBSCAN_MINPTS}
    out = {r["point_id"]: r for r in SPECS["geo_dbscan_classify"].fn(spark, sf_dir).collect()}
    assert set(out) == set(ids)
    for p in ids:
        assert out[p]["n_neighbors"] == len(nbrs[p])
        expect = (
            "core"
            if p in core
            else "border"
            if any(q in core for q in nbrs[p])
            else "noise"
        )
        assert out[p]["role"] == expect


# ------------------------------------- runs test / markov entropy


def test_runs_test_matches_pure_python(spark, sf_dir):
    from collections import Counter

    from api_weather_kafka_clickhouse_spark.tables import load

    ev = load(spark, "events", sf_dir).select("ts").collect()
    daily = Counter(r["ts"].date() for r in ev)
    ordered = sorted(daily.items())
    by_val = sorted((x, day) for day, x in ordered)
    m = by_val[(len(by_val) + 1) // 2 - 1][0]
    signs = [1 if x > m else 0 for _, x in ordered if x != m]
    n1, n2 = sum(signs), len(signs) - sum(signs)
    r = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / (
        float(n1 + n2) * (n1 + n2) * (n1 + n2 - 1)
    )
    out = SPECS["stats_runs_test"].fn(spark, sf_dir).collect()[0]
    assert (out["n1"], out["n2"], out["n_runs"]) == (n1, n2, r)
    assert abs(out["z"] - (r - mu) / var**0.5) < 1e-6


def test_markov_entropy_matches_pure_python(spark, sf_dir):
    import math
    from collections import Counter, defaultdict

    from api_weather_kafka_clickhouse_spark.tables import load

    ev = load(spark, "events", sf_dir).select("user_id", "event_type", "ts", "event_id").collect()
    by_user: dict[int, list] = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    tr: Counter = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            tr[(a, b)] += 1
    n_s: Counter = Counter()
    for (a, _), n in tr.items():
        n_s[a] += n
    big_n = sum(tr.values())
    num = defaultdict(float)
    for (a, b), n in tr.items():
        num[a] += round(-math.log(n / n_s[a]), 9) * n
    out = {r["event_type"]: r for r in SPECS["events_markov_entropy"].fn(spark, sf_dir).collect()}
    assert set(out) == set(n_s)
    for a in n_s:
        assert out[a]["n_transitions"] == n_s[a]
        assert abs(out[a]["h_conditional"] - num[a] / n_s[a]) < 1e-6
        assert abs(out[a]["h_contribution"] - num[a] / big_n) < 1e-6
