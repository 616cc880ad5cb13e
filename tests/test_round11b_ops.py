"""Round-11 continuation operators (batch 2): OHLC bars, clustering
coefficient, NDCG eval, permutation test, dialect battery 5. The
Python references below are independent re-derivations from each
operator's spec (pandas / hashlib / set algebra) — never the
operator's own code path — so a shared bug can't self-pass. Oracle
parity at sf0.001 is covered by test_oracle_parity.py automatically;
the sf0.01 driver-scale pin lives in the verify sweep.
"""

from __future__ import annotations

import hashlib
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


# ------------------------------------------------ time_ohlc_bars


def test_ohlc_bars_matches_pandas_reference(spark, sf_dir):
    got = {
        (r["event_type"], str(r["day"])): r
        for r in SPECS["time_ohlc_bars"].fn(spark, sf_dir).collect()
    }
    pdf = _events_pdf(sf_dir)
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
    pdf["day"] = pdf["ts"].dt.date.astype(str)
    for (et, day), g in pdf.groupby(["event_type", "day"]):
        g = g.sort_values(["ts", "event_id"])
        row = got[(et, day)]
        assert row["open_c"] == g["cents"].iloc[0]
        assert row["close_c"] == g["cents"].iloc[-1]
        assert row["high_c"] == g["cents"].max()
        assert row["low_c"] == g["cents"].min()
        assert row["n_ticks"] == len(g)
        assert row["gross_c"] == g["cents"].sum()
        assert row["bar_up"] == (g["cents"].iloc[-1] >= g["cents"].iloc[0])
    assert len(got) == pdf.groupby(["event_type", "day"]).ngroups


# ------------------------------------------------ graph_clustering_coeff


def test_clustering_coeff_matches_set_algebra_reference(spark, sf_dir):
    import duckdb

    # Independent edge list: same support rule, derived in duckdb then
    # closed with pure-Python set algebra (no orientation trick).
    edges = duckdb.sql(
        f"""
        WITH b AS (SELECT DISTINCT l_orderkey, l_partkey
                   FROM '{sf_dir}/lineitem.parquet')
        SELECT a.l_partkey AS u, c.l_partkey AS v
        FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey
                         AND a.l_partkey < c.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
        """
    ).fetchall()
    nbrs: dict[int, set[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    got = {
        r["part"]: r
        for r in SPECS["graph_clustering_coeff"].fn(spark, sf_dir).collect()
    }
    expected_nodes = {n for n, s in nbrs.items() if len(s) >= 2}
    assert set(got) == expected_nodes
    for n in expected_nodes:
        d = len(nbrs[n])
        tri = sum(len(nbrs[n] & nbrs[m]) for m in nbrs[n]) // 2
        row = got[n]
        assert row["degree"] == d
        assert row["n_triangles"] == tri
        assert row["clustering_coeff"] == pytest.approx(
            round(2.0 * tri / (d * (d - 1.0)), 9), abs=1e-12
        )


# ------------------------------------------------ sim_ndcg_eval


def test_ndcg_weights_are_log2_microunits():
    from api_weather_kafka_clickhouse_spark.operators.similarity import (
        NDCG_IW,
        NDCG_K,
        NDCG_W,
    )

    assert len(NDCG_W) == NDCG_K
    for r, w in enumerate(NDCG_W, start=1):
        assert w == round(1_000_000 / math.log2(r + 1))
    assert NDCG_W[0] == 1_000_000  # rank 1: no discount
    assert NDCG_IW == [sum(NDCG_W[: r + 1]) for r in range(NDCG_K)]


def test_ndcg_eval_matches_numpy_reference(spark, sf_dir):
    import numpy as np

    from api_weather_kafka_clickhouse_spark.operators.similarity import (
        N_QUERIES,
        NDCG_K,
        NDCG_W,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    rows = load(spark, "embeddings", sf_dir).collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    labels = {r["vec_id"]: r["label"] for r in rows}
    got = {r["query_id"]: r for r in SPECS["sim_ndcg_eval"].fn(spark, sf_dir).collect()}
    assert set(got) == set(range(N_QUERIES))
    for q in range(N_QUERIES):
        qv = vecs[q]
        scored = []
        for cid, cv in vecs.items():
            if cid == q:
                continue
            cos = float(qv @ cv / (np.linalg.norm(qv) * np.linalg.norm(cv)))
            scored.append((-round(cos, 6), cid))
        scored.sort()
        topk = [cid for _, cid in scored[:NDCG_K]]
        rel = [1 if labels[c] == labels[q] else 0 for c in topk]
        dcg = sum(r * w for r, w in zip(rel, NDCG_W))
        n_rel = sum(1 for c in labels if c != q and labels[c] == labels[q])
        idcg = sum(NDCG_W[: min(NDCG_K, n_rel)])
        row = got[q]
        assert row["dcg_u"] == dcg
        assert row["idcg_u"] == idcg
        assert row["hits_topk"] == sum(rel)
        assert row["n_rel_total"] == n_rel
        expect_ndcg = round(dcg / idcg, 6) if idcg else 0.0
        assert row["ndcg"] == pytest.approx(expect_ndcg, abs=1e-12)
        first = next((i + 1 for i, r in enumerate(rel) if r), None)
        expect_rr = round(1.0 / first, 9) if first else 0.0
        assert row["reciprocal_rank"] == pytest.approx(expect_rr, abs=1e-12)


# ------------------------------------------------ stats_permutation_test


def _md5_parity(user_id: int, rep: int) -> int:
    h = hashlib.md5(f"perm:{user_id}:{rep}".encode()).hexdigest()
    return int(h[:8], 16) % 2


def test_permutation_test_matches_hashlib_reference(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.stats import PERM_B

    pdf = _events_pdf(sf_dir)
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
    got = {
        r["event_type"]: r
        for r in SPECS["stats_permutation_test"].fn(spark, sf_dir).collect()
    }
    for et, g in pdf.groupby("event_type"):
        u = g.groupby("user_id")["cents"].sum()

        def stat(grp_of):
            a = [s for uid, s in u.items() if grp_of(uid) == 0]
            b = [s for uid, s in u.items() if grp_of(uid) == 1]
            return abs(sum(a) / len(a) - sum(b) / len(b))

        obs = stat(lambda uid: uid % 2)
        n_ge = sum(
            1
            for rep in range(1, PERM_B + 1)
            if stat(lambda uid: _md5_parity(uid, rep)) >= obs
        )
        row = got[et]
        assert row["n_users"] == len(u)
        assert row["n_ge"] == n_ge
        assert row["p_value"] == pytest.approx(
            round((1.0 + n_ge) / (PERM_B + 1), 6), abs=1e-12
        )
        assert row["obs_abs_diff_cents"] == pytest.approx(round(obs, 6), abs=1e-9)


def test_permutation_p_value_bounds(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.stats import PERM_B

    for r in SPECS["stats_permutation_test"].fn(spark, sf_dir).collect():
        assert 1.0 / (PERM_B + 1) <= r["p_value"] <= 1.0
        assert 0 <= r["n_ge"] <= PERM_B


# ------------------------------------------------ clickhouse_dialect_battery5


def test_battery5_matches_pandas_reference(spark, sf_dir):
    pdf = _events_pdf(sf_dir)
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
    got = {
        r["user_id"]: r
        for r in SPECS["clickhouse_dialect_battery5"].fn(spark, sf_dir).collect()
    }
    from api_weather_kafka_clickhouse_spark.operators.relational import (
        CORE_TYPES,
        ENUM_UNIQ_CAP,
        FUNNEL_TYPES,
        RARE_TYPES,
    )

    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        cents = g["cents"].tolist()
        types = g["event_type"].tolist()
        row = got[uid]
        assert row["delta_sum_c"] == sum(
            max(0, b - a) for a, b in zip(cents, cents[1:])
        )
        enum = [
            str(types[: i + 1].count(types[i]))
            for i in range(min(len(types), ENUM_UNIQ_CAP))
        ]
        assert row["enum_uniq"] == ",".join(enum)
        dtypes = sorted(set(types))
        assert row["funnel_overlap"] == ",".join(
            t for t in dtypes if t in FUNNEL_TYPES
        )
        assert row["has_all_core"] == all(t in dtypes for t in CORE_TYPES)
        assert row["has_any_rare"] == any(t in dtypes for t in RARE_TYPES)
        spend = g.groupby("event_type")["cents"].sum()
        best = sorted(spend.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert (row["top_spend_type"], row["top_spend_c"]) == best
    assert len(got) == pdf["user_id"].nunique()


# ------------------------------------------------ time_lttb_downsample


def _lttb_reference(ys: list[int], n_out: int):
    """Independent pure-Python LTTB over integer y with exact integer
    area comparisons (fractions cleared by hand, not the operator's
    decimal expressions)."""
    n = len(ys)
    if n <= n_out:
        return list(range(1, n + 1))
    b = n_out - 2
    sel = [1]
    ax, ay = 1, ys[0]
    for k in range(1, b + 1):
        lo = 2 + ((k - 1) * (n - 2)) // b
        hi = 1 + (k * (n - 2)) // b
        if k == b:
            m, sx, sy = 1, n, ys[n - 1]
        else:
            lo2 = 2 + (k * (n - 2)) // b
            hi2 = 1 + ((k + 1) * (n - 2)) // b
            m = hi2 - lo2 + 1
            sx = sum(range(lo2, hi2 + 1))
            sy = sum(ys[lo2 - 1 : hi2])
        best = None
        for x in range(lo, hi + 1):
            y = ys[x - 1]
            area = abs((ax * m - sx) * (y - ay) - (ax - x) * (sy - ay * m))
            key = (area, -x)
            if best is None or key > best[0]:
                best = (key, x, y)
        sel.append(best[1])
        ax, ay = best[1], best[2]
    sel.append(n)
    return sel


def test_lttb_matches_python_reference(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.relational2 import LTTB_OUT

    pdf = _events_pdf(sf_dir)
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
    pdf["day"] = pdf["ts"].dt.floor("D")
    daily = (
        pdf.groupby(["event_type", "day"])["cents"].sum().reset_index()
    ).sort_values(["event_type", "day"])
    got = {
        r["event_type"]: r
        for r in SPECS["time_lttb_downsample"].fn(spark, sf_dir).collect()
    }
    for et, g in daily.groupby("event_type"):
        ys = g["cents"].tolist()
        expect = _lttb_reference(ys, LTTB_OUT)
        row = got[et]
        assert row["n_days"] == len(ys)
        assert row["steps"] == ",".join(map(str, expect))
        assert row["cents"] == ",".join(str(ys[x - 1]) for x in expect)
        assert row["n_kept"] == len(expect)


def test_lttb_passthrough_short_series(spark):
    # A synthetic short series (n <= LTTB_OUT) must pass through: the
    # operator's branch, exercised via the registry fn on sf0.001
    # would always fold (n=30), so pin the reference's branch too.
    assert _lttb_reference([5, 3, 9], 12) == [1, 2, 3]
    sel = _lttb_reference(list(range(100)), 12)
    assert len(sel) == 12 and sel[0] == 1 and sel[-1] == 100
    assert sel == sorted(sel)


# ------------------------------------------------ quality_embedding_outliers


def test_embedding_outliers_matches_python_int_reference(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.similarity import (
        _I8_SHIFT,
        OUT_DEN,
        OUT_NUM,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    rows = load(spark, "embeddings", sf_dir).collect()
    # Python-int re-derivation: banker's-free round, shifted integer
    # mean, lower median by sorting — no numpy, no operator code.
    import decimal

    def pyround(x: float) -> int:
        return int(
            decimal.Decimal(x).quantize(0, rounding=decimal.ROUND_HALF_UP)
            if x >= 0
            else -decimal.Decimal(-x).quantize(0, rounding=decimal.ROUND_HALF_UP)
        )

    codes = {
        r["vec_id"]: [pyround(float(x) * _I8_SHIFT) for x in r["embedding"]]
        for r in rows
    }
    labels = {r["vec_id"]: r["label"] for r in rows}
    by_label: dict[int, list[int]] = {}
    for vid, lab in labels.items():
        by_label.setdefault(lab, []).append(vid)
    got = {
        r["vec_id"]: r
        for r in SPECS["quality_embedding_outliers"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(codes)
    dim = len(next(iter(codes.values())))
    for lab, vids in by_label.items():
        n = len(vids)
        cent = [
            (2 * (sum(codes[v][i] for v in vids) + _I8_SHIFT * n) + n)
            // (2 * n)
            - _I8_SHIFT
            for i in range(dim)
        ]
        d2s = {
            v: sum((codes[v][i] - cent[i]) ** 2 for i in range(dim)) for v in vids
        }
        med = sorted(d2s.values())[(n + 1) // 2 - 1]
        for v in vids:
            row = got[v]
            assert row["label"] == lab
            assert row["d2"] == d2s[v]
            assert row["med_d2"] == med
            assert row["is_outlier"] == (d2s[v] * OUT_DEN > med * OUT_NUM)


# ------------------------------------------------ join_asof_nearest


def test_asof_nearest_matches_pandas_reference(spark, sf_dir):
    pdf = _events_pdf(sf_dir)
    pe = pdf[pdf["event_type"].isin(["purchase", "error"])].copy()
    pe["us"] = pe["ts"].astype("datetime64[ns]").astype("int64") // 1000
    got = {
        r["purchase_id"]: r
        for r in SPECS["join_asof_nearest"].fn(spark, sf_dir).collect()
    }
    purchases = pe[pe["event_type"] == "purchase"]
    assert set(got) == set(purchases["event_id"])
    for uid, g in pe.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        errs = g[g["event_type"] == "error"]
        for p in g[g["event_type"] == "purchase"].itertuples(index=False):
            row = got[p.event_id]
            if errs.empty:
                assert row["nearest_error_id"] is None
                assert row["direction"] is None
                continue
            # backward: last error at-or-before in (ts, event_id) order;
            # forward: first at-or-after. Nearest by |dt|, backward ties.
            key = (p.ts, p.event_id)
            before = errs[
                (errs["ts"] < p.ts)
                | ((errs["ts"] == p.ts) & (errs["event_id"] < p.event_id))
            ]
            after = errs[
                (errs["ts"] > p.ts)
                | ((errs["ts"] == p.ts) & (errs["event_id"] > p.event_id))
            ]
            assert key is not None
            b = before.iloc[-1] if len(before) else None
            f = after.iloc[0] if len(after) else None
            if b is None:
                exp_id, exp_dir, exp_d = f["event_id"], "forward", f["us"] - p.us
            elif f is None:
                exp_id, exp_dir, exp_d = b["event_id"], "backward", p.us - b["us"]
            elif p.us - b["us"] <= f["us"] - p.us:
                exp_id, exp_dir, exp_d = b["event_id"], "backward", p.us - b["us"]
            else:
                exp_id, exp_dir, exp_d = f["event_id"], "forward", f["us"] - p.us
            assert row["nearest_error_id"] == exp_id
            assert row["direction"] == exp_dir
            assert row["abs_delta_us"] == exp_d


# ------------------------------------------------ privacy_pseudonymize_join


def test_pseudonymize_preserves_per_user_aggregates(spark, sf_dir):
    pdf = _events_pdf(sf_dir)
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
    got = SPECS["privacy_pseudonymize_join"].fn(spark, sf_dir).collect()
    from api_weather_kafka_clickhouse_spark.operators.relational3 import (
        PSEUDO_SALT,
    )

    by_pseudo = {r["pseudonym"]: r for r in got}
    # no raw identifier column escapes
    assert "user_id" not in got[0].asDict()
    # referential integrity: every user maps to one pseudonym and the
    # per-user aggregates survive the rename (hashlib re-derivation)
    assert len(by_pseudo) == pdf["user_id"].nunique()
    for uid, g in pdf.groupby("user_id"):
        ps = hashlib.md5(f"{PSEUDO_SALT}:{uid}".encode()).hexdigest()
        row = by_pseudo[ps]
        assert row["n_events"] == len(g)
        assert row["total_cents"] == g["cents"].sum()
        assert row["n_types"] == g["event_type"].nunique()


# ------------------------------------------------ er_phonetic_blocking


def _phonetic_key(word: str) -> str:
    digits = {c: d for c, d in zip("bfpvcgjkqszxdtlmnr", "111122222222334556")}
    tail = "".join(
        digits.get(c, c) for c in word[1:] if c not in set("aeiouyhw")
    )
    return word[0].upper() + (tail[:3] + "000")[:3]


def test_phonetic_blocking_matches_python_reference(spark, sf_dir):
    import duckdb

    words = [
        w[0].split(" ")[0]
        for w in duckdb.sql(
            f"SELECT p_name FROM '{sf_dir}/part.parquet'"
        ).fetchall()
    ]
    got = {r["block_key"]: r for r in SPECS["er_phonetic_blocking"].fn(spark, sf_dir).collect()}
    blocks: dict[str, list[str]] = {}
    for w in words:
        blocks.setdefault(_phonetic_key(w), []).append(w)
    assert set(got) == set(blocks)
    for key, ws in blocks.items():
        row = got[key]
        n = len(ws)
        assert row["n_parts"] == n
        assert row["n_words"] == len(set(ws))
        assert row["candidate_pairs"] == n * (n - 1) // 2
        assert row["words"] == ",".join(sorted(set(ws)))


def test_phonetic_key_groups_misspellings():
    # vowel-confusion misspellings land in the same block (the class
    # the simplified key targets; run-collapse typos like smal/small
    # need classic Soundex and are documented as out of scope)
    assert _phonetic_key("green") == _phonetic_key("grean") == "G650"
    assert _phonetic_key("goldenrod") == "G435"
    # distinct sounds stay apart
    assert _phonetic_key("blue") != _phonetic_key("green")


# ------------------------------------------------ time_dominant_period


def test_dominant_period_matches_python_reference(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.relational2 import (
        DFT_PERIODS,
    )

    pdf = _events_pdf(sf_dir)
    pdf["day"] = pdf["ts"].dt.floor("D")
    daily = (
        pdf.groupby(["event_type", "day"]).size().rename("x").reset_index()
    ).sort_values(["event_type", "day"])
    got = {
        (r["event_type"], r["period"]): r
        for r in SPECS["time_dominant_period"].fn(spark, sf_dir).collect()
    }
    for et, g in daily.groupby("event_type"):
        xs = g["x"].tolist()
        n, sx = len(xs), sum(xs)
        ys = [n * x - sx for x in xs]  # exact mean-centering (scaled)
        powers = {}
        for p in DFT_PERIODS:
            # independent: quantize cos/sin HERE from math, then exact
            # integer sums — same spec, separate derivation
            a = sum(
                round(math.cos(2 * math.pi * (t % p) / p) * 1_000_000) * y
                for t, y in enumerate(ys)
            )
            b = sum(
                round(math.sin(2 * math.pi * (t % p) / p) * 1_000_000) * y
                for t, y in enumerate(ys)
            )
            powers[p] = (a * a + b * b, a, b)
        order = sorted(powers, key=lambda p: (-powers[p][0], p))
        for rank, p in enumerate(order, start=1):
            row = got[(et, p)]
            assert row["a_mu"] == powers[p][1]
            assert row["b_mu"] == powers[p][2]
            assert int(row["power_str"]) == powers[p][0]
            assert row["power_rank"] == rank
            assert row["n_days"] == n


# ------------------------------------------------ mm_magic_sniff


def test_magic_sniff_detects_planted_headers(spark, sf_dir):
    import duckdb

    from api_weather_kafka_clickhouse_spark.operators.multimodal import (
        _RIFF_STUB,
        MAGIC_JPEG,
        MAGIC_PNG,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    expect: dict[str, list[int]] = {}
    for doc_id, text in docs:
        raw = text.encode("utf-8")
        mod = doc_id % 4
        if mod == 0:
            blob, mime = bytes.fromhex(MAGIC_PNG) + raw, "image/png"
        elif mod == 1:
            blob, mime = bytes.fromhex(MAGIC_JPEG) + raw, "image/jpeg"
        elif mod == 2:
            blob, mime = bytes.fromhex(_RIFF_STUB) + raw, "audio/wav"
        else:
            blob, mime = raw, "application/octet-stream"
        # independent sniffer: bytes, not hex strings
        if blob[:8] == bytes.fromhex(MAGIC_PNG):
            det = "image/png"
        elif blob[:3] == bytes.fromhex(MAGIC_JPEG):
            det = "image/jpeg"
        elif blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
            det = "audio/wav"
        else:
            det = "application/octet-stream"
        assert det == mime  # fixture self-consistency
        expect.setdefault(det, []).append(len(blob))
    got = {
        r["detected_mime"]: r for r in SPECS["mm_magic_sniff"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for mime, sizes in expect.items():
        row = got[mime]
        assert row["n_blobs"] == len(sizes)
        assert row["total_bytes"] == sum(sizes)
        assert row["n_mismatch"] == 0


# ------------------------------------------------ time_dtw_distance


def _dtw_2d(a: list[int], b: list[int]) -> int:
    """Textbook two-dimensional DTW DP (not the operators' flattened
    append-only formulation)."""
    n, m = len(a), len(b)
    inf = float("inf")
    dp = [[inf] * (m + 1) for _ in range(n + 1)]
    dp[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = abs(a[i - 1] - b[j - 1])
            dp[i][j] = c + min(dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1])
    return int(dp[n][m])


def test_dtw_matches_textbook_dp(spark, sf_dir):
    pdf = _events_pdf(sf_dir)
    pdf["day"] = pdf["ts"].dt.floor("D")
    daily = (
        pdf.groupby(["event_type", "day"]).size().rename("x").reset_index()
    ).sort_values(["event_type", "day"])
    series = {et: g["x"].tolist() for et, g in daily.groupby("event_type")}
    got = {
        (r["type_a"], r["type_b"]): r
        for r in SPECS["time_dtw_distance"].fn(spark, sf_dir).collect()
    }
    types = sorted(series)
    expected_pairs = {
        (a, b) for i, a in enumerate(types) for b in types[i + 1 :]
    }
    assert set(got) == expected_pairs
    for a, b in expected_pairs:
        row = got[(a, b)]
        d = _dtw_2d(series[a], series[b])
        assert row["dtw"] == d
        assert row["dtw_normalized"] == pytest.approx(
            round(d / (len(series[a]) + len(series[b])), 6), abs=1e-12
        )


def test_dtw_properties():
    # identical series: zero; shift tolerance: cheaper than L1
    assert _dtw_2d([1, 2, 3], [1, 2, 3]) == 0
    l1 = sum(abs(x - y) for x, y in zip([0, 9, 0, 0], [0, 0, 9, 0]))
    assert _dtw_2d([0, 9, 0, 0], [0, 0, 9, 0]) < l1


# ------------------------------------------------ orders_skyline_pareto


def test_skyline_matches_bruteforce_dominance(spark, sf_dir):
    import duckdb
    from datetime import date

    rows = duckdb.sql(
        f"""SELECT o_orderpriority, o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT),
                   CAST(o_orderdate AS DATE)
            FROM '{sf_dir}/orders.parquet'"""
    ).fetchall()
    epoch = date(1970, 1, 1)
    pts: dict[str, list[tuple[int, int, int]]] = {}
    for grp, key, price, d in rows:
        pts.setdefault(grp, []).append((key, price, (d - epoch).days))
    got = {
        (r["grp"], r["o_orderkey"]): r
        for r in SPECS["orders_skyline_pareto"].fn(spark, sf_dir).collect()
    }
    # brute-force O(n^2) dominance — the definition, not the
    # operator's sort-based shortcut
    expect = set()
    for grp, members in pts.items():
        for key, price, day in members:
            dominated = any(
                p2 <= price and d2 >= day and (p2 < price or d2 > day)
                for _, p2, d2 in members
            )
            if not dominated:
                expect.add((grp, key))
    assert set(got) == expect
    for (grp, key), r in got.items():
        orig = next(m for m in pts[grp] if m[0] == key)
        assert (r["price_c"], r["day"]) == (orig[1], orig[2])


# ------------------------------------------------ time_bollinger_breach


def test_bollinger_matches_pandas_rolling(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.relational2 import (
        BOLL_K,
        BOLL_W,
    )

    pdf = _events_pdf(sf_dir)
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
    pdf["day"] = pdf["ts"].dt.floor("D")
    daily = pdf.groupby("day")["cents"].sum().sort_index()
    got = {
        str(r["day"]): r
        for r in SPECS["time_bollinger_breach"].fn(spark, sf_dir).collect()
    }
    sma = daily.rolling(BOLL_W).mean()
    sd = daily.rolling(BOLL_W).std(ddof=1)
    n_expected = 0
    for day, x in daily.items():
        if pd.isna(sma[day]):
            continue
        n_expected += 1
        row = got[str(day.date())]
        assert row["x"] == x
        assert row["sma"] == pytest.approx(sma[day], rel=1e-9)
        assert row["sigma"] == pytest.approx(sd[day], rel=1e-6)
        if x > sma[day] + BOLL_K * sd[day]:
            expect = "upper"
        elif x < sma[day] - BOLL_K * sd[day]:
            expect = "lower"
        else:
            expect = "inside"
        assert row["band_position"] == expect
    assert len(got) == n_expected


# ------------------------------------------------ stats_hmm_viterbi


def _viterbi_backpointer(obs, start_mu, trans_mu, emit_mu):
    """Textbook Viterbi with a backpointer MATRIX and a reverse pass —
    not the operators' carried-candidate-paths fold."""
    from api_weather_kafka_clickhouse_spark.operators.stats import (
        HMM_UNKNOWN_MU,
    )

    n_states = 2
    v = [[None] * n_states for _ in obs]
    bp = [[None] * n_states for _ in obs]
    for s in range(n_states):
        v[0][s] = start_mu[s] + emit_mu[s].get(obs[0], HMM_UNKNOWN_MU)
    for t in range(1, len(obs)):
        for s in range(n_states):
            # tie prefers the LOWER predecessor index
            cands = [v[t - 1][p] + trans_mu[(p, s)] for p in range(n_states)]
            best_p = 0 if cands[0] >= cands[1] else 1
            v[t][s] = cands[best_p] + emit_mu[s].get(obs[t], HMM_UNKNOWN_MU)
            bp[t][s] = best_p
    last = 1 if v[-1][1] > v[-1][0] else 0
    path = [last]
    for t in range(len(obs) - 1, 0, -1):
        path.append(bp[t][path[-1]])
    path.reverse()
    return v[-1][path[-1]], path


def test_viterbi_matches_textbook_backpointer(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.stats import (
        HMM_EMIT_MU,
        HMM_PATH_HEAD,
        HMM_START_MU,
        HMM_TRANS_MU,
    )

    pdf = _events_pdf(sf_dir)
    got = {
        r["user_id"]: r
        for r in SPECS["stats_hmm_viterbi"].fn(spark, sf_dir).collect()
    }
    for uid, g in pdf.groupby("user_id"):
        obs = g.sort_values(["ts", "event_id"])["event_type"].tolist()
        score, path = _viterbi_backpointer(
            obs, HMM_START_MU, HMM_TRANS_MU, HMM_EMIT_MU
        )
        row = got[uid]
        assert row["n_steps"] == len(obs)
        assert row["best_score_mu"] == score
        assert row["best_state"] == path[-1]
        assert row["n_active"] == sum(path)
        assert row["n_switches"] == sum(
            1 for a, b in zip(path, path[1:]) if a != b
        )
        assert row["path_head"] == "".join(
            map(str, path[:HMM_PATH_HEAD])
        )


def test_hmm_unknown_symbol_takes_penalty_not_null(spark):
    """Round-11 ADVICE: an event_type outside the 5-symbol alphabet
    must take the large-negative HMM_UNKNOWN_MU penalty in BOTH
    engines, never silently NULL the user's decoded row."""
    import duckdb

    from api_weather_kafka_clickhouse_spark.operators.stats import (
        HMM_EMIT_MU,
        HMM_UNKNOWN_MU,
        _hmm_emit_case,
        _hmm_emit_col,
    )

    from pyspark.sql import functions as F

    for s in (0, 1):
        # DuckDB CASE fragment
        got = duckdb.sql(
            f"SELECT {_hmm_emit_case(s, chr(39) + 'bogus' + chr(39))}"
        ).fetchone()[0]
        assert got == HMM_UNKNOWN_MU
        # Spark twin
        row = spark.range(1).select(
            _hmm_emit_col(s, F.lit("bogus")).alias("mu"),
            _hmm_emit_col(s, F.lit("view")).alias("known"),
        ).collect()[0]
        assert row["mu"] == HMM_UNKNOWN_MU
        assert row["known"] == HMM_EMIT_MU[s]["view"]
    # the penalty dominates every in-alphabet emission by orders of
    # magnitude, so unknowns debit the score without flipping states
    assert HMM_UNKNOWN_MU < min(
        mu for d in HMM_EMIT_MU.values() for mu in d.values()
    ) * 2


def test_hmm_probabilities_are_normalized():
    from api_weather_kafka_clickhouse_spark.operators.stats import (
        HMM_EMIT,
        HMM_START,
        HMM_TRANS,
    )

    assert sum(HMM_START.values()) == pytest.approx(1.0)
    for s in (0, 1):
        assert sum(HMM_EMIT[s].values()) == pytest.approx(1.0)
        assert HMM_TRANS[(s, 0)] + HMM_TRANS[(s, 1)] == pytest.approx(1.0)


# ------------------------------------------------ profile_dq_rules


def test_dq_rules_matches_duckdb_recount(spark, sf_dir):
    import duckdb

    got = {r["rule"]: r for r in SPECS["profile_dq_rules"].fn(spark, sf_dir).collect()}
    assert len(got) == 8
    # independent recount of three rules straight off the parquet
    orphans = duckdb.sql(
        f"""SELECT count(*) FROM '{sf_dir}/orders.parquet' o
            WHERE o.o_custkey NOT IN
              (SELECT c_custkey FROM '{sf_dir}/customer.parquet')"""
    ).fetchone()[0]
    assert got["orders.custkey_resolves"]["n_violations"] == orphans
    dup = duckdb.sql(
        f"""SELECT count(*) - count(DISTINCT event_id)
            FROM '{sf_dir}/events.parquet'"""
    ).fetchone()[0]
    assert got["events.event_id_unique"]["n_violations"] == dup
    bad_len = duckdb.sql(
        f"""SELECT count(*) FROM '{sf_dir}/documents.parquet'
            WHERE n_chars <> length(text)"""
    ).fetchone()[0]
    assert got["documents.n_chars_matches_text"]["n_violations"] == bad_len
    for r in got.values():
        assert r["passed"] == (r["n_violations"] == 0)
        assert 0.0 <= r["pass_rate"] <= 1.0


# ------------------------------------------------ graph_assortativity


def test_assortativity_matches_python_reference(spark, sf_dir):
    import duckdb

    edges = duckdb.sql(
        f"""
        WITH b AS (SELECT DISTINCT l_orderkey, l_partkey
                   FROM '{sf_dir}/lineitem.parquet')
        SELECT a.l_partkey, c.l_partkey
        FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey
                         AND a.l_partkey < c.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
        """
    ).fetchall()
    deg: dict[int, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs = [deg[u] for u, v in edges] + [deg[v] for u, v in edges]
    ys = [deg[v] for u, v in edges] + [deg[u] for u, v in edges]
    m2 = len(xs)
    sx, sxx = sum(xs), sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    expect = (m2 * sxy - sx * sx) / (m2 * sxx - sx * sx)
    row = SPECS["graph_assortativity"].fn(spark, sf_dir).collect()[0]
    assert row["n_edges"] == len(edges)
    assert row["n_nodes"] == len(deg)
    assert row["assortativity"] == pytest.approx(round(expect, 9), abs=1e-9)


# ------------------------------------------------ stats_mcnemar


def test_mcnemar_matches_pandas_reference(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.stats import (
        MCNEMAR_CHI2_CRIT,
        MCNEMAR_HEAVY,
        MCNEMAR_SPLIT,
    )

    pdf = _events_pdf(sf_dir)
    split = pd.Timestamp(MCNEMAR_SPLIT)
    p = pdf[pdf["event_type"] == "purchase"]
    b, c_ = 0, 0
    both = neither = 0
    for uid in pdf["user_id"].unique():
        g = p[p["user_id"] == uid]
        bf = (g["ts"] < split).sum() >= MCNEMAR_HEAVY
        af = (g["ts"] >= split).sum() >= MCNEMAR_HEAVY
        if bf and af:
            both += 1
        elif bf:
            b += 1
        elif af:
            c_ += 1
        else:
            neither += 1
    row = SPECS["stats_mcnemar"].fn(spark, sf_dir).collect()[0]
    assert (row["n_both"], row["n_lost"], row["n_gained"], row["n_neither"]) == (
        both,
        b,
        c_,
        neither,
    )
    if b + c_:
        chi2 = (b - c_) ** 2 / (b + c_)
        assert row["mcnemar_chi2"] == pytest.approx(round(chi2, 9), abs=1e-12)
        assert row["reject_h0"] == (chi2 > MCNEMAR_CHI2_CRIT)


# ------------------------------------------------ text_bpe_tokenize


def _bpe_reference(word: str) -> int:
    """Python re-derivation of the delimiter-replace formulation via
    str.replace (an independent string engine, same documented
    algorithm)."""
    from api_weather_kafka_clickhouse_spark.operators.text_analysis import (
        BPE_MERGES,
        BPE_PASSES,
        BPE_WORD_CAP,
    )

    w = word[:BPE_WORD_CAP]
    s = "|" + "|".join(w) + "|"
    for x, y in BPE_MERGES:
        for _ in range(BPE_PASSES):
            s = s.replace(f"|{x}|{y}|", f"|{x}{y}|")
    return s.count("|") - 1


def test_bpe_tokenize_matches_python_reference(spark, sf_dir):
    import re

    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    got = {
        r["doc_id"]: r for r in SPECS["text_bpe_tokenize"].fn(spark, sf_dir).collect()
    }
    for doc_id, text in docs:
        words = [w for w in re.split(r"[^a-z]+", text.lower()) if w]
        n_tokens = sum(_bpe_reference(w) for w in words)
        n_chars = sum(min(len(w), 24) for w in words)
        row = got[doc_id]
        assert row["n_words"] == len(words)
        assert row["n_bpe_tokens"] == n_tokens
        assert row["n_chars_az"] == n_chars
        assert row["chars_per_token"] == pytest.approx(
            round(n_chars / n_tokens, 6), abs=1e-12
        )


def test_bpe_merges_actually_compress():
    # the rules must do real work on common English patterns
    assert _bpe_reference("the") == 1  # t+h -> th, th+e -> the
    assert _bpe_reference("and") == 1
    assert _bpe_reference("thorn") < len("thorn")
    # single chars and unknown alphabets pass through 1 token/char
    assert _bpe_reference("x") == 1
    assert _bpe_reference("zzz") == 3


# ------------------------------------------------ mm_scene_cuts


def test_scene_cuts_matches_python_reference(spark, sf_dir):
    import duckdb

    from api_weather_kafka_clickhouse_spark.operators.multimodal import (
        CUT_DELTA,
        CUT_HEAD,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    got = {
        r["doc_id"]: r for r in SPECS["mm_scene_cuts"].fn(spark, sf_dir).collect()
    }
    n_expected = 0
    for doc_id, text in docs:
        nf = len(text) // 100
        if nf < 1:
            assert doc_id not in got
            continue
        n_expected += 1
        sigs = [
            sum(ord(c) for c in text[i * 100 : i * 100 + 100]) for i in range(nf)
        ]
        cuts = [
            i
            for i in range(1, nf)
            if abs(sigs[i] - sigs[i - 1]) > CUT_DELTA
        ]
        row = got[doc_id]
        assert row["n_frames"] == nf
        assert row["n_cuts"] == len(cuts)
        assert row["first_cut_idx"] == (cuts[0] if cuts else None)
        assert row["cuts_head"] == ",".join(map(str, cuts[:CUT_HEAD]))
    assert len(got) == n_expected


def test_scene_cuts_flag_rate_is_meaningful(spark, sf_dir):
    # the threshold must neither fire on every transition nor never
    rows = SPECS["mm_scene_cuts"].fn(spark, sf_dir).collect()
    total_cuts = sum(r["n_cuts"] for r in rows)
    total_transitions = sum(r["n_frames"] - 1 for r in rows)
    assert 0 < total_cuts < total_transitions


def test_dtw_flat_formulation_equals_textbook_on_unequal_lengths():
    """The engines share a flattened row-major recurrence; real data
    only exercises equal-length series (every type spans the same 30
    days), so pin the formulation itself on unequal lengths."""
    import random

    def dtw_flat(a, b):
        n, m = len(a), len(b)
        dp = []
        for k in range(n * m):
            i, j = k // m, k % m
            c = abs(a[i] - b[j])
            if i == 0 and j == 0:
                prev = 0
            elif i == 0:
                prev = dp[k - 1]
            elif j == 0:
                prev = dp[k - m]
            else:
                prev = min(dp[k - 1], dp[k - m], dp[k - m - 1])
            dp.append(c + prev)
        return dp[-1]

    rng = random.Random(7)
    for _ in range(200):
        a = [rng.randint(0, 50) for _ in range(rng.randint(1, 12))]
        b = [rng.randint(0, 50) for _ in range(rng.randint(1, 12))]
        assert dtw_flat(a, b) == _dtw_2d(a, b)


# ------------------------------------------------ orders_near_duplicate_payments


def test_near_duplicate_payments_matches_bruteforce(spark, sf_dir):
    import duckdb
    from datetime import date

    from api_weather_kafka_clickhouse_spark.operators.relational3 import (
        DUP_TOL_PCT,
        DUP_WINDOW_DAYS,
    )

    rows = duckdb.sql(
        f"""SELECT o_orderkey, o_custkey,
                   CAST(round(o_totalprice * 100) AS BIGINT),
                   CAST(o_orderdate AS DATE)
            FROM '{sf_dir}/orders.parquet'"""
    ).fetchall()
    epoch = date(1970, 1, 1)
    by_cust: dict[int, list] = {}
    for key, cust, cents, d in rows:
        by_cust.setdefault(cust, []).append((key, cents, (d - epoch).days))
    expect = set()
    for cust, orders in by_cust.items():
        for i, (ka, ca, da) in enumerate(orders):
            for kb, cb, db in orders[i + 1 :]:
                lo, hi = min(ka, kb), max(ka, kb)
                if (
                    abs(da - db) <= DUP_WINDOW_DAYS
                    and 100 * abs(ca - cb) <= DUP_TOL_PCT * max(ca, cb)
                ):
                    expect.add((cust, lo, hi))
    got = {
        (r["custkey"], r["order_a"], r["order_b"]): r
        for r in SPECS["orders_near_duplicate_payments"].fn(spark, sf_dir).collect()
    }
    assert set(got) == expect
    for r in got.values():
        assert r["cents_diff"] == abs(r["cents_a"] - r["cents_b"])
        assert r["exact_amount"] == (r["cents_a"] == r["cents_b"])
        assert 0 <= r["days_apart"] <= DUP_WINDOW_DAYS


# ------------------------------------------------ supplier_leadtime_profile


def test_leadtime_profile_matches_sorted_reference(spark, sf_dir):
    import duckdb

    rows = duckdb.sql(
        f"""SELECT l.l_suppkey,
                   datediff('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE))
            FROM '{sf_dir}/lineitem.parquet' l
            JOIN '{sf_dir}/orders.parquet' o
              ON o.o_orderkey = l.l_orderkey"""
    ).fetchall()
    by_supp: dict[int, list[int]] = {}
    for s, d in rows:
        by_supp.setdefault(s, []).append(d)
    got = {
        r["suppkey"]: r
        for r in SPECS["supplier_leadtime_profile"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(by_supp)
    for s, days in by_supp.items():
        days.sort()
        n = len(days)
        row = got[s]
        assert row["n_shipments"] == n
        assert row["min_days"] == days[0]
        assert row["max_days"] == days[-1]
        # discrete lower order statistics at ceil(q*n)
        assert row["p25_days"] == days[(n + 3) // 4 - 1]
        assert row["p50_days"] == days[(n + 1) // 2 - 1]
        assert row["p75_days"] == days[(3 * n + 3) // 4 - 1]
        assert row["p25_days"] <= row["p50_days"] <= row["p75_days"]


# ------------------------------------------------ stats_cochran_armitage


def test_cochran_armitage_matches_python_reference(spark, sf_dir):
    pdf = _events_pdf(sf_dir)
    pdf["w"] = pdf["ts"].dt.dayofweek  # pandas: Monday=0 == isodow-1
    g = pdf.groupby("w").agg(
        n=("event_id", "size"),
        x=("event_type", lambda s: (s == "purchase").sum()),
    )
    N, X = int(g["n"].sum()), int(g["x"].sum())
    A = int(sum(w * r.x for w, r in g.iterrows()))
    B = int(sum(w * r.n for w, r in g.iterrows()))
    C = int(sum(w * w * r.n for w, r in g.iterrows()))
    t = N * A - X * B
    chi2 = t * t * N / (X * (N - X) * (N * C - B * B))
    row = SPECS["stats_cochran_armitage"].fn(spark, sf_dir).collect()[0]
    assert (row["n_events"], row["n_success"]) == (N, X)
    assert (row["sum_wx"], row["sum_wn"], row["sum_w2n"]) == (A, B, C)
    assert row["ca_chi2"] == pytest.approx(round(chi2, 9), abs=1e-12)
    # exact-integer form of chi2 > 10322/2687 (the registered rational)
    assert row["reject_h0"] == (
        t * t * N * 2687 > 10322 * X * (N - X) * (N * C - B * B)
    )


# ------------------------------------------------ graph_modularity


def test_modularity_matches_python_reference(spark, sf_dir):
    import duckdb

    edges = duckdb.sql(
        f"""
        WITH ep AS (SELECT DISTINCT l_suppkey, l_partkey
                    FROM '{sf_dir}/lineitem.parquet')
        SELECT DISTINCT a.l_suppkey, b.l_suppkey
        FROM ep a JOIN ep b ON a.l_partkey = b.l_partkey
                           AND a.l_suppkey < b.l_suppkey
        """
    ).fetchall()
    com = dict(
        duckdb.sql(
            f"SELECT s_suppkey, s_nationkey FROM '{sf_dir}/supplier.parquet'"
        ).fetchall()
    )
    m = len(edges)
    deg: dict[int, int] = {}
    intra: dict[int, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
        if com[u] == com[v]:
            intra[com[u]] = intra.get(com[u], 0) + 1
    dsum: dict[int, int] = {}
    nnodes: dict[int, int] = {}
    for node, d in deg.items():
        c = com[node]
        dsum[c] = dsum.get(c, 0) + d
        nnodes[c] = nnodes.get(c, 0) + 1
    got = {
        r["community"]: r
        for r in SPECS["graph_modularity"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(dsum)
    q_total = 0.0
    for c in dsum:
        row = got[c]
        assert row["n_nodes"] == nnodes[c]
        assert row["degree_sum"] == dsum[c]
        assert row["intra_edges"] == intra.get(c, 0)
        contrib = (4 * m * intra.get(c, 0) - dsum[c] ** 2) / (4 * m * m)
        assert row["q_contribution"] == pytest.approx(round(contrib, 9), abs=1e-12)
        q_total += contrib
    # modularity of any partition is bounded
    assert -0.5 <= q_total <= 1.0
