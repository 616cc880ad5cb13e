"""Round-11 operators: the CDC Rabin kernel (production twin of
text_cdc_chunking, round-10 verdict item 3) and this round's query
additions. Python references here are independent re-derivations —
never the operator's own code path — so a shared bug can't self-pass.
"""

from __future__ import annotations

import pandas as pd
import pytest

from api_weather_kafka_clickhouse_spark.operators.text_analysis import (
    CDC_HASH_MOD,
    CDC_K,
    CDC_MASK,
    CDC_MOD,
    _cdc_rabin_batches,
    cdc_rabin_exact_sql,
    text_cdc_chunking_rabin,
)

# ------------------------------------------------ CDC Rabin kernel


def _rabin_reference(text: str):
    """Independent pure-Python chunker: per-position polynomial hash
    computed with pow() from scratch (no numpy, no prefix sums)."""
    n = len(text)
    if n == 0:
        return []
    bounds = [1]
    for pos in range(2, n - CDC_K + 2):  # 1-based, pos <= n-K+1
        h = 0
        for i in range(CDC_K):
            h = (h + ord(text[pos - 1 + i]) * pow(257, CDC_K - 1 - i, CDC_HASH_MOD)) % CDC_HASH_MOD
        if h % (CDC_MASK + 1) == 0:
            bounds.append(pos)
    out = []
    for cid, s in enumerate(bounds, start=1):
        e = bounds[cid] - 1 if cid < len(bounds) else n
        ch = sum((p - s + 1) * ord(text[p - 1]) for p in range(s, e + 1)) % CDC_MOD
        out.append((cid, s, e - s + 1, ch))
    return out


def _run_kernel(texts: list[str]) -> dict[int, list]:
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got: dict[int, list] = {}
    for out in _cdc_rabin_batches(iter([pdf])):
        for r in out.itertuples(index=False):
            got.setdefault(r.doc_id, []).append(
                (r.chunk_id, r.start_pos, r.n_chars, r.chunk_hash)
            )
    return got


def test_rabin_kernel_matches_python_reference():
    texts = [
        "the quick brown fox jumps over the lazy dog " * 30,
        "key agg row scan slow fast table value part hash " * 12,
        "abcdefgh",  # exactly K chars: one gram at pos 1 only
        "short",  # < K: single chunk, no gram
        "x",
        "a" * 500,  # degenerate repeated content
    ]
    got = _run_kernel(texts)
    for i, t in enumerate(texts):
        assert sorted(got.get(i, [])) == _rabin_reference(t), i


def test_rabin_kernel_drops_empty_and_handles_non_ascii():
    got = _run_kernel(["", "héllo wörld — ünïcode päth " * 20])
    assert 0 not in got  # empty text yields no chunks (matches filter)
    assert sorted(got[1]) == _rabin_reference("héllo wörld — ünïcode päth " * 20)


def test_rabin_boundaries_realign_after_edit():
    """The CDC property: prepend a byte and every chunk after the
    first content boundary keeps its (length, hash) identity."""
    base = "the quick brown fox jumps over the lazy dog " * 40
    a = _rabin_reference(base)
    b = _rabin_reference("X" + base)
    assert sorted((n, h) for _, _, n, h in a[1:]) == sorted(
        (n, h) for _, _, n, h in b[1:]
    )
    assert len(a) > 3  # the fixture actually chunks


def test_rabin_kernel_matches_exact_sql_twin(spark, sf_dir):
    """kernel == SQL dual-surface pin (the fuzzy_match_damerau
    pattern): the mapInPandas production path and the explode/window
    exact-SQL formulation agree row-for-row on the real corpus."""
    a = sorted(map(tuple, text_cdc_chunking_rabin(spark, sf_dir).collect()))
    b = sorted(map(tuple, cdc_rabin_exact_sql(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


@pytest.mark.slow
def test_rabin_kernel_matches_exact_sql_twin_sf001(spark):
    """Same pin at the driver gate scale (sf0.01) — the round-10
    lesson: parity at ONE scale can hide precision/size traps."""
    sf = "/root/testdata/sf0.01"
    a = sorted(map(tuple, text_cdc_chunking_rabin(spark, sf).collect()))
    b = sorted(map(tuple, cdc_rabin_exact_sql(spark, sf).collect()))
    assert a == b and len(a) > 0


# ------------------------------------------------ int8-lattice k-means


def test_kmeans_int8_matches_numpy_reference(spark, sf_dir):
    """Independent exact reference: Python-int Lloyd on the same
    lattice (init, argmin-tie, rounding, empty-cluster rules
    re-derived from the spec, not the operator)."""
    import numpy as np

    from api_weather_kafka_clickhouse_spark.operators.similarity import (
        _DIM,
        _I8_SHIFT,
        KMEANS_I8_ITERS,
        KMEANS_K,
        embedding_kmeans_int8,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    rows = (
        load(spark, "embeddings", sf_dir)
        .select("vec_id", "embedding")
        .collect()
    )
    ids = sorted(r["vec_id"] for r in rows)
    codes = {
        r["vec_id"]: [
            int(np.round(np.float64(x) * _I8_SHIFT)) for x in r["embedding"]
        ]
        for r in rows
    }
    cents = [list(codes[i]) for i in ids[:KMEANS_K]]
    assign: dict[int, int] = {}
    for _ in range(KMEANS_I8_ITERS):
        for vid, q in codes.items():
            d = [
                sum((q[i] - c[i]) ** 2 for i in range(_DIM)) for c in cents
            ]
            assign[vid] = d.index(min(d))
        sums = [[0] * _DIM for _ in range(KMEANS_K)]
        ns = [0] * KMEANS_K
        for vid, cl in assign.items():
            ns[cl] += 1
            for i in range(_DIM):
                sums[cl][i] += codes[vid][i]
        for cl in range(KMEANS_K):
            if ns[cl]:
                n = ns[cl]
                cents[cl] = [
                    (2 * (sums[cl][i] + _I8_SHIFT * n) + n) // (2 * n)
                    - _I8_SHIFT
                    for i in range(_DIM)
                ]
    got = {
        r["vec_id"]: r["cluster"]
        for r in embedding_kmeans_int8(spark, sf_dir).collect()
    }
    assert got == assign
    assert len(set(got.values())) > 1  # the fixture actually clusters


# ------------------------------------------------ dialect battery 4


def test_battery4_funnel_and_retention_reference(spark, sf_dir):
    """Python re-derivation of retention()/windowFunnel()/moving-sum
    semantics from the spec for every user."""
    from api_weather_kafka_clickhouse_spark.operators.relational import (
        WF_WINDOW_US,
        clickhouse_dialect_battery4,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    got = {
        r["user_id"]: r
        for r in clickhouse_dialect_battery4(spark, sf_dir).collect()
    }
    ev = (
        load(spark, "events", sf_dir)
        .selectExpr("user_id", "unix_micros(ts) AS tsu", "event_id",
                    "event_type", "CAST(round(value * 100) AS BIGINT) AS cents")
        .collect()
    )
    users: dict[int, list] = {}
    for r in ev:
        users.setdefault(r["user_id"], []).append(
            (r["tsu"], r["event_id"], r["event_type"], r["cents"])
        )
    for uid, evs in users.items():
        evs.sort()
        vts = [t for t, _, ty, _ in evs if ty == "view"]
        cts = [t for t, _, ty, _ in evs if ty == "click"]
        pts = [t for t, _, ty, _ in evs if ty == "purchase"]
        level = 0
        if vts:
            level = 1
            for v in vts:
                for c in cts:
                    if v < c <= v + WF_WINDOW_US:
                        level = max(level, 2)
                        if any(c < p <= v + WF_WINDOW_US for p in pts):
                            level = 3
        g = got[uid]
        assert g["funnel_24h"] == level, uid
        ret = f"{int(bool(vts))},{int(bool(vts) and bool(cts))},{int(bool(vts) and bool(pts))}"
        assert g["ret_flags"] == ret, uid
        cents = [c for _, _, _, c in evs]
        msum = [sum(cents[max(0, i - 2) : i + 1]) for i in range(len(cents))]
        assert g["msum3"] == ",".join(map(str, msum)), uid
        assert g["last_type"] == evs[-1][2], uid


# ------------------------------------------------ JB / BH / Ljung-Box


def test_jarque_bera_reference(spark, sf_dir):
    import numpy as np

    from api_weather_kafka_clickhouse_spark.operators.stats import (
        stats_jarque_bera,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    got = {r["event_type"]: r for r in stats_jarque_bera(spark, sf_dir).collect()}
    ev = load(spark, "events", sf_dir).select("event_type", "value").collect()
    groups: dict[str, list] = {}
    for r in ev:
        groups.setdefault(r["event_type"], []).append(r["value"])
    for ty, vals in groups.items():
        x = np.array(vals, dtype=np.float64)
        n = len(x)
        m1 = x.mean()
        m2 = ((x - m1) ** 2).mean()
        m3 = ((x - m1) ** 3).mean()
        m4 = ((x - m1) ** 4).mean()
        skew = m3 / m2**1.5
        kexc = m4 / m2**2 - 3
        jb = n / 6 * (skew**2 + kexc**2 / 4)
        g = got[ty]
        assert abs(g["skew"] - skew) < 1e-4, ty
        assert abs(g["kurt_excess"] - kexc) < 1e-4, ty
        assert abs(g["jb_stat"] - jb) / max(jb, 1) < 1e-4, ty
        assert g["n"] == n


def test_fdr_bh_stepup_reference(spark, sf_dir):
    """BH re-derived from the operator's own (p, rank) columns: the
    rejected set must be exactly ranks 1..i* where i* is the largest
    rank with p_i*m <= q*i (and all-or-nothing monotone)."""
    from api_weather_kafka_clickhouse_spark.operators.stats import (
        FDR_Q,
        stats_fdr_bh,
    )

    rows = stats_fdr_bh(spark, sf_dir).collect()
    m = len(rows)
    assert m > 10
    by_rank = sorted(rows, key=lambda r: r["bh_rank"])
    assert [r["bh_rank"] for r in by_rank] == list(range(1, m + 1))
    # p non-decreasing in rank
    ps = [r["p_value"] for r in by_rank]
    assert ps == sorted(ps)
    crossing = [r["bh_rank"] for r in by_rank if r["p_value"] * m <= FDR_Q * r["bh_rank"]]
    cutoff = max(crossing) if crossing else 0
    for r in by_rank:
        assert r["rejected"] == (r["bh_rank"] <= cutoff), r


def test_ljung_box_numpy_reference(spark, sf_dir):
    import numpy as np

    from api_weather_kafka_clickhouse_spark.operators.stats import (
        LB_LAGS,
        time_ljung_box,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    got = {r["event_type"]: r for r in time_ljung_box(spark, sf_dir).collect()}
    ev = (
        load(spark, "events", sf_dir)
        .selectExpr("event_type", "ts", "event_id",
                    "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc")
        .collect()
    )
    series: dict[str, list] = {}
    for r in ev:
        series.setdefault(r["event_type"], []).append((r["ts"], r["event_id"], r["yc"]))
    for ty, rows in series.items():
        rows.sort()
        y = np.array([c for _, _, c in rows], dtype=np.float64)
        n = len(y)
        yd = y - y.mean()
        c0 = (yd * yd).sum()
        q = 0.0
        for k in range(1, LB_LAGS + 1):
            rho = (yd[:-k] * yd[k:]).sum() / c0
            assert abs(got[ty][f"rho{k}"] - rho) < 1e-6, (ty, k)
            q += rho * rho / (n - k)
        q *= n * (n + 2)
        assert abs(got[ty]["q_lb"] - q) / max(q, 1) < 1e-6, ty


# ------------------------------------------------ blob dedup / skew


def test_blob_dedup_finds_every_planted_copy(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.multimodal import (
        PHASH_COPY_BASE,
        PHASH_COPY_MOD,
        mm_blob_dedup,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    rows = mm_blob_dedup(spark, sf_dir).collect()
    planted = {
        r["doc_id"]
        for r in load(spark, "documents", sf_dir).select("doc_id").collect()
        if r["doc_id"] % PHASH_COPY_MOD == 0
    }
    found = {}
    for r in rows:
        assert r["n_copies"] >= 2
        assert r["bytes_saved"] == (r["n_copies"] - 1) * r["n_bytes"]
        found[r["keep_id"]] = [int(x) for x in r["dup_ids"].split(",")]
    assert set(found) == planted  # corpus itself has no exact dups
    for keep, dups in found.items():
        assert dups == [keep + PHASH_COPY_BASE]


def test_partition_skew_shares_sum_to_one(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.relational2 import (
        profile_partition_skew,
    )

    rows = profile_partition_skew(spark, sf_dir).collect()
    assert abs(sum(r["pct_rows"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["skew_ratio"] for r in rows) / len(rows) - 1.0) < 1e-3
    assert sum(r["is_largest"] for r in rows) >= 1
    assert all(r["n_orders"] <= r["n_rows"] for r in rows)


# ------------------------------------------------ IVF on the lattice


def test_ivf_int8_exact_within_probes_and_recall(spark, sf_dir):
    """Two properties, both against an independent Python-int
    re-derivation: (a) the returned list IS the exact top-k by
    integer L2 within the probed cells, (b) recall@10 vs EXHAUSTIVE
    integer L2 clears the bound that makes the index useful."""
    import numpy as np

    from api_weather_kafka_clickhouse_spark.operators.similarity import (
        _DIM,
        _I8_SHIFT,
        IVF8_TOP_K,
        N_QUERIES,
        sim_ivf_int8,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    rows = load(spark, "embeddings", sf_dir).select("vec_id", "embedding").collect()
    codes = {
        r["vec_id"]: np.array(
            [int(np.round(np.float64(x) * _I8_SHIFT)) for x in r["embedding"]],
            dtype=np.int64,
        )
        for r in rows
    }
    got: dict[int, list] = {}
    for r in sim_ivf_int8(spark, sf_dir).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["nbr_id"], r["l2"]))
    assert set(got) == set(range(N_QUERIES))
    hit = tot = 0
    for qid, lst in got.items():
        lst.sort()
        qv = codes[qid]
        # (a) reported l2 values are the true integer distances
        for _, nbr, l2 in lst:
            d = int(((qv - codes[nbr]) ** 2).sum())
            assert d == l2, (qid, nbr)
        # ranks strictly ordered by (l2, nbr_id)
        keys = [(l2, nbr) for _, nbr, l2 in lst]
        assert keys == sorted(keys)
        # (b) recall vs exhaustive
        exact = sorted(
            (int(((qv - c) ** 2).sum()), vid)
            for vid, c in codes.items()
            if vid != qid
        )[:IVF8_TOP_K]
        truth = {vid for _, vid in exact}
        hit += len(truth & {nbr for _, nbr, _ in lst})
        tot += len(truth)
    assert hit / tot >= 0.5, f"recall@{IVF8_TOP_K} = {hit/tot:.2f}"


def test_semdedup_int8_subset_of_exact_and_recall(spark, sf_dir):
    """The SemDeDup guarantees, re-derived for the lattice variant:
    (a) never over-deletes — every dropped vector is dropped by the
    exhaustive O(n^2) integer-threshold pipeline too (cells only
    bound recall, each emitted pair is exact); (b) the multi-probe
    cells keep pair recall useful."""
    import numpy as np

    from api_weather_kafka_clickhouse_spark.operators.dedup import (
        SEMDEDUP_I8_T2,
        dedup_semdedup_int8,
    )
    from api_weather_kafka_clickhouse_spark.operators.similarity import (
        _I8_SHIFT,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    rows = load(spark, "embeddings", sf_dir).select("vec_id", "embedding").collect()
    ids = sorted(r["vec_id"] for r in rows)
    codes = {
        r["vec_id"]: np.array(
            [int(np.round(np.float64(x) * _I8_SHIFT)) for x in r["embedding"]],
            dtype=np.int64,
        )
        for r in rows
    }
    tn, td = SEMDEDUP_I8_T2
    # exhaustive exact-integer pair graph
    adj: dict[int, set] = {i: set() for i in ids}
    n2 = {i: int((c * c).sum()) for i, c in codes.items()}
    for i_pos, a in enumerate(ids):
        for b in ids[i_pos + 1 :]:
            dot = int((codes[a] * codes[b]).sum())
            if dot > 0 and dot * dot * td >= tn * n2[a] * n2[b]:
                adj[a].add(b)
                adj[b].add(a)
    # exact transitive components -> exact dropped set
    canon: dict[int, int] = {}
    for i in ids:
        if i in canon:
            continue
        comp, stack = [], [i]
        seen = {i}
        while stack:
            v = stack.pop()
            comp.append(v)
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        m = min(comp)
        for v in comp:
            canon[v] = m
    dropped_exact = {v for v, c in canon.items() if c != v}
    survivors = {r["vec_id"] for r in dedup_semdedup_int8(spark, sf_dir).collect()}
    dropped_got = set(ids) - survivors
    assert dropped_got <= dropped_exact  # never over-deletes
    assert dropped_exact, "fixture has no near-dups; test proves nothing"
    # recall on the DROPPED set (the decision that matters)
    assert len(dropped_got) / len(dropped_exact) >= 0.6, (
        len(dropped_got),
        len(dropped_exact),
    )


def test_rabin_kernel_property_random_strings():
    """Hypothesis: the numpy kernel equals the pure-Python reference
    on arbitrary text (ASCII fast path AND the ord() fallback),
    including boundary-hostile shapes (len < K, len == K, repeats)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = st.characters(min_codepoint=32, max_codepoint=0x2FF)

    @settings(max_examples=150, deadline=None)
    @given(st.text(alphabet=alphabet, min_size=0, max_size=300))
    def check(text: str) -> None:
        got = _run_kernel([text]).get(0, [])
        assert sorted(got) == _rabin_reference(text)

    check()


# ------------------------------------------------ effect size / CUPED


def test_cohens_d_numpy_reference(spark, sf_dir):
    import numpy as np

    from api_weather_kafka_clickhouse_spark.operators.stats import stats_cohens_d
    from api_weather_kafka_clickhouse_spark.tables import load

    got = {r["event_type"]: r for r in stats_cohens_d(spark, sf_dir).collect()}
    ev = load(spark, "events", sf_dir).selectExpr(
        "event_type", "user_id % 2 = 0 AS ia",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc"
    ).collect()
    groups: dict[str, tuple[list, list]] = {}
    for r in ev:
        groups.setdefault(r["event_type"], ([], []))[0 if r["ia"] else 1].append(r["yc"])
    for ty, (a, b) in groups.items():
        xa, xb = np.array(a, float), np.array(b, float)
        pooled = ((len(xa) - 1) * xa.var(ddof=1) + (len(xb) - 1) * xb.var(ddof=1)) / (
            len(xa) + len(xb) - 2
        )
        d = (xa.mean() - xb.mean()) / np.sqrt(pooled)
        g = got[ty]
        assert g["n_a"] == len(xa) and g["n_b"] == len(xb)
        assert abs(g["cohens_d"] - d) < 1e-6, ty
        corr = 1 - 3 / (4 * (len(xa) + len(xb)) - 9)
        assert abs(g["hedges_g"] - d * corr) < 1e-6, ty


def test_cuped_numpy_reference_and_guarantee(spark, sf_dir):
    """Reference: per-user pre/post re-derived in Python, theta from
    the global sample, adjusted stats per variant — plus the CUPED
    guarantee var_adj <= var_post when theta is near-optimal (checked
    via the operator's own outputs)."""
    import numpy as np

    from api_weather_kafka_clickhouse_spark.operators.stats import (
        CUPED_SPLIT,
        events_cuped_adjustment,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    got = {r["variant"]: r for r in events_cuped_adjustment(spark, sf_dir).collect()}
    ev = load(spark, "events", sf_dir).selectExpr(
        "user_id", f"ts < TIMESTAMP '{CUPED_SPLIT}' AS pre_f",
        "CAST(round(value * 100) AS BIGINT) AS cents"
    ).collect()
    users: dict[int, list] = {}
    for r in ev:
        u = users.setdefault(r["user_id"], [0, 0])
        u[0 if r["pre_f"] else 1] += r["cents"]
    pre = np.array([v[0] for v in users.values()], float)
    post = np.array([v[1] for v in users.values()], float)
    n = len(pre)
    theta = (n * (pre * post).sum() - pre.sum() * post.sum()) / (
        n * (pre * pre).sum() - pre.sum() ** 2
    )
    for variant in (0, 1):
        ids = np.array([uid % 2 == variant for uid in users], bool)
        adj = post[ids] - theta * (pre[ids] - pre.mean())
        g = got[variant]
        assert g["n_users"] == int(ids.sum())
        assert abs(g["theta"] - theta) < 1e-6
        assert abs(g["mean_adjusted"] - adj.mean()) / max(abs(adj.mean()), 1) < 1e-6
        assert abs(g["var_adjusted"] - adj.var(ddof=1)) / adj.var(ddof=1) < 1e-6
        assert g["variance_reduction"] >= -0.05  # theta is global, per-variant
        # var can tick up only by the cross-variant wobble, never much


def test_holt_winters_python_reference(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.relational2 import (
        HW_H,
        HW_M,
        time_holt_winters,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    got = {r["event_type"]: r for r in time_holt_winters(spark, sf_dir).collect()}
    d = (
        load(spark, "events", sf_dir)
        .selectExpr("event_type", "date_trunc('day', ts) AS day")
        .groupBy("event_type", "day")
        .count()
        .collect()
    )
    series: dict[str, list] = {}
    for r in d:
        series.setdefault(r["event_type"], []).append((r["day"], float(r["count"])))
    for ty, rows in series.items():
        rows.sort()
        xs = [x for _, x in rows]
        level, trend, seas = xs[0], 0.0, [0.0] * HW_M
        for t in range(1, len(xs)):
            slot = t % HW_M  # 0-based slot of step t+1 (cnt==t)
            sp = seas[slot]
            lvl = 0.5 * (xs[t] - sp) + 0.5 * (level + trend)
            trend = 0.5 * (lvl - level) + 0.5 * trend
            seas[slot] = 0.5 * (xs[t] - lvl) + 0.5 * sp
            level = lvl
        g = got[ty]
        assert g["n_days"] == len(xs)
        assert abs(g["level"] - level) < 1e-6
        assert abs(g["trend"] - trend) < 1e-6
        fc = level + HW_H * trend + seas[(len(xs) + HW_H - 1) % HW_M]
        assert abs(g[f"forecast_h{HW_H}"] - fc) < 1e-6
        got_seas = [float(v) for v in g["seasonal"].split(",")]
        assert all(abs(a - b) < 1e-5 for a, b in zip(got_seas, seas))
        assert any(abs(v) > 0.5 for v in seas)  # seasonality learned


def test_adamic_adar_python_reference(spark, sf_dir):
    import math

    from api_weather_kafka_clickhouse_spark.operators.affinity import (
        CN_TOP,
        graph_adamic_adar,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    edges = {
        (r["l_suppkey"], r["l_partkey"])
        for r in load(spark, "lineitem", sf_dir)
        .select("l_suppkey", "l_partkey")
        .distinct()
        .collect()
    }
    by_part: dict[int, list] = {}
    for s, p in edges:
        by_part.setdefault(p, []).append(s)
    scores: dict[tuple, list] = {}
    for p, supps in by_part.items():
        if len(supps) < 2:
            continue
        wu = round(1_000_000 / math.log(len(supps)))
        supps.sort()
        for i, a in enumerate(supps):
            for b in supps[i + 1 :]:
                e = scores.setdefault((a, b), [0, 0])
                e[0] += 1
                e[1] += wu
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:CN_TOP]
    got = sorted(
        ((r["rk"], r["supp_a"], r["supp_b"], r["cn"], r["adamic_adar"])
         for r in graph_adamic_adar(spark, sf_dir).collect())
    )
    assert len(got) == min(CN_TOP, len(scores))
    for (rk, sa, sb, cn, aa), ((ea, eb), (ecn, emicro)) in zip(got, ranked):
        assert (sa, sb, cn) == (ea, eb, ecn), rk
        assert abs(aa - emicro / 1e6) < 1e-6, rk


def test_power_analysis_numpy_reference(spark, sf_dir):
    import numpy as np

    from api_weather_kafka_clickhouse_spark.operators.stats import (
        POWER_MDE_PCT,
        POWER_Z_ALPHA,
        POWER_Z_BETA,
        stats_power_analysis,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    got = {r["event_type"]: r for r in stats_power_analysis(spark, sf_dir).collect()}
    ev = load(spark, "events", sf_dir).select("event_type", "value").collect()
    groups: dict[str, list] = {}
    for r in ev:
        groups.setdefault(r["event_type"], []).append(r["value"])
    for ty, vals in groups.items():
        x = np.array(vals, float)
        mde = x.mean() * POWER_MDE_PCT / 100
        n = int(np.ceil(2 * x.var(ddof=1) * (POWER_Z_ALPHA + POWER_Z_BETA) ** 2 / mde**2))
        g = got[ty]
        assert abs(g["n_per_arm"] - n) <= 1, ty  # ceil boundary slack
        assert g["currently_powered"] == (g["n_per_arm"] <= g["n_obs"] / 2)
        assert g["n_per_arm"] > 0
