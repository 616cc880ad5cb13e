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


# ------------------------------------------------ mm_audio_vad_segments


def test_vad_segments_match_python_islands(spark, sf_dir):
    import duckdb

    pdf = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        f"WHERE length(text) >= 100 ORDER BY doc_id"
    ).fetchdf()
    got = {
        r["doc_id"]: r
        for r in SPECS["mm_audio_vad_segments"].fn(spark, sf_dir).collect()
    }
    seen_docs = 0
    for _, rec in pdf.iterrows():
        text = rec["text"]
        n = len(text) // 100
        energies = [
            sum(ord(c) for c in text[i * 100 : i * 100 + 100]) for i in range(n)
        ]
        total = sum(energies)
        active = [e * n > total for e in energies]
        # islands of consecutive True
        segs = []
        start = None
        for i, a in enumerate(active):
            if a and start is None:
                start = i
            if not a and start is not None:
                segs.append((start, i - start))
                start = None
        if start is not None:
            segs.append((start, n - start))
        row = got.get(rec["doc_id"])
        if not segs:
            assert row is None  # all-quiet docs emit nothing
            continue
        seen_docs += 1
        assert row["n_frames"] == n
        assert row["n_segments"] == len(segs)
        assert row["n_active"] == sum(l for _, l in segs)
        assert row["longest_segment"] == max(l for _, l in segs)
        assert row["first_active_idx"] == segs[0][0]
    assert seen_docs > 0
    # multi-segment docs must exist or the island merge is untested
    assert any(r["n_segments"] > 1 for r in got.values())


# ------------------------------------------------ text_url_domains


def test_url_domains_match_python_re(spark, sf_dir):
    import re

    import duckdb

    pdf = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchdf()
    pat = re.compile(r"https?://[a-z0-9.-]+(?:/[a-z0-9._/-]*)?")
    agg: dict[str, dict] = {}
    for _, rec in pdf.iterrows():
        did, text = int(rec["doc_id"]), rec["text"]
        if did % 3 == 0:
            text = f"{text} https://host{did % 7}.example.com/p/{did}"
        elif did % 3 == 1:
            text = (
                f"see http://cdn{did % 5}.example.org/a {text}"
                f" and https://host{did % 7}.example.com/"
            )
        for url in pat.findall(text):
            dom = re.sub(r"^https?://", "", url).split("/", 1)[0]
            a = agg.setdefault(
                dom, {"n_urls": 0, "docs": set(), "n_https": 0, "first": url}
            )
            a["n_urls"] += 1
            a["docs"].add(did)
            a["n_https"] += url.startswith("https://")
            a["first"] = min(a["first"], url)
    got = {
        r["domain"]: r
        for r in SPECS["text_url_domains"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for dom, a in agg.items():
        row = got[dom]
        assert row["n_urls"] == a["n_urls"]
        assert row["n_docs"] == len(a["docs"])
        assert row["n_https"] == a["n_https"]
        assert row["first_url"] == a["first"]
    # both schemes and multi-URL docs must appear or the regex/group
    # handling is undertested
    assert any(a["n_https"] == 0 for a in agg.values())
    assert any(a["n_https"] > 0 for a in agg.values())


# ------------------------------------------------ sim_maxsim_late_interaction


def test_maxsim_matches_numpy_reference(spark, sf_dir):
    import duckdb
    import numpy as np

    vecs = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        f"ORDER BY vec_id"
    ).fetchall()
    codes = {
        vid: np.round(np.array(emb, dtype=np.float64) * 127).astype(np.int64)
        for vid, emb in vecs
    }
    got: dict[int, list] = {}
    for r in SPECS["sim_maxsim_late_interaction"].fn(spark, sf_dir).collect():
        got.setdefault(r["query_id"], []).append(r)
    for qid in [v for v in codes if v < 16]:
        qsubs = codes[qid].reshape(8, 8)
        scored = []
        for did, dc in codes.items():
            if did == qid:
                continue
            dsubs = dc.reshape(8, 8)
            # per query sub-vector, max dot against any doc sub-vector
            score = int((qsubs @ dsubs.T).max(axis=1).sum())
            scored.append((score, did))
        scored.sort(key=lambda t: (-t[0], t[1]))
        rows = sorted(got[qid], key=lambda r: r["rank"])
        assert [(r["maxsim"], r["nbr_id"]) for r in rows] == scored[:5]
    # MaxSim must differ from plain full-vector dot somewhere, or the
    # max-over-subvectors structure is untested
    qid = min(v for v in codes if v < 16)
    qsubs = codes[qid].reshape(8, 8)
    full = {
        did: int(codes[qid] @ dc)
        for did, dc in codes.items()
        if did != qid
    }
    maxsim = {
        did: int((qsubs @ dc.reshape(8, 8).T).max(axis=1).sum())
        for did, dc in codes.items()
        if did != qid
    }
    top_full = sorted(full, key=lambda d: (-full[d], d))[:5]
    top_ms = sorted(maxsim, key=lambda d: (-maxsim[d], d))[:5]
    assert top_full != top_ms


# ------------------------------------------------ time_spectral_entropy


def test_spectral_entropy_matches_python_dft(spark, sf_dir):
    from decimal import Decimal

    from api_weather_kafka_clickhouse_spark.operators.relational2 import (
        DFT_COEF,
        DFT_PERIODS,
    )

    pdf = _events_pdf(sf_dir)
    pdf["day"] = pdf["ts"].dt.floor("D")
    got = {
        r["event_type"]: r
        for r in SPECS["time_spectral_entropy"].fn(spark, sf_dir).collect()
    }
    coef = {(p, r): (c, s) for p, r, c, s in DFT_COEF}
    for et, g in pdf.groupby("event_type"):
        days = g.groupby("day").size().sort_index()
        xs = days.tolist()
        n, sx = len(xs), sum(xs)
        ys = [n * x - sx for x in xs]  # exact mean-centering, scaled by n
        powers = {}
        for p in DFT_PERIODS:
            a = sum(coef[(p, t % p)][0] * y for t, y in enumerate(ys))
            b = sum(coef[(p, t % p)][1] * y for t, y in enumerate(ys))
            powers[p] = a * a + b * b
        total = sum(powers.values())
        terms = []
        for p in sorted(powers):
            pw = powers[p]
            if pw == 0:
                terms.append(Decimal(0))
            else:
                frac = pw / total  # one IEEE division, like both engines
                terms.append(
                    Decimal(str(round(-frac * math.log(frac), 9)))
                )
        entropy = float(sum(terms))
        dom = sorted(powers, key=lambda p: (-powers[p], p))[0]
        row = got[et]
        assert row["n_periods"] == len(DFT_PERIODS)
        assert row["total_power_str"] == str(total)
        assert row["max_power_str"] == str(max(powers.values()))
        assert row["dominant_period"] == dom
        assert row["entropy_nats"] == pytest.approx(entropy, abs=1e-9)
        assert row["is_concentrated"] == (max(powers.values()) * 3 > total)
    assert {r["is_concentrated"] for r in got.values()} == {True, False}


# ------------------------------------------------ decontaminate_embedding_near


def _decon_brute_force(sf_dir):
    """Exhaustive int8 contamination ground truth (no cells)."""
    import duckdb
    import numpy as np

    vecs = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        f"ORDER BY vec_id"
    ).fetchall()
    codes = {
        vid: np.round(np.array(e, dtype=np.float64) * 127).astype(np.int64)
        for vid, e in vecs
    }
    evals = {v: c for v, c in codes.items() if v % 20 == 0}
    hits: dict[int, list] = {}
    for tid, tc in codes.items():
        if tid % 20 == 0:
            continue
        nt = int(tc @ tc)
        for eid, ec in evals.items():
            dp = int(tc @ ec)
            ne = int(ec @ ec)
            if dp > 0 and dp * dp * 16 >= nt * ne:
                hits.setdefault(tid, []).append(
                    (int((dp * dp * 1_000_000) // (nt * ne)), eid)
                )
    return hits


def test_decontaminate_embedding_recall_and_exactness(spark, sf_dir):
    truth = _decon_brute_force(sf_dir)
    got = {
        r["vec_id"]: r
        for r in SPECS["decontaminate_embedding_near"].fn(spark, sf_dir).collect()
    }
    # soundness: every reported hit is a TRUE contamination with the
    # exact brute-force similarity and match count <= truth's
    for vid, row in got.items():
        assert vid in truth
        sims = truth[vid]
        assert row["n_eval_matches"] <= len(sims)
        best = sorted(sims, key=lambda t: (-t[0], t[1]))[0]
        # the probed best can be at most the global best
        assert row["best_sim2_micro"] <= best[0]
        assert (row["best_sim2_micro"], row["best_eval_id"]) in [
            (s, e) for s, e in sims
        ]
    # recall: multi-probe cells must find most of the true positives
    recall = len(set(got) & set(truth)) / len(truth)
    assert recall >= 0.6, recall
    assert len(truth) > 20  # fixture actually contains contamination


# ------------------------------------------------ stats_beta_binomial_ranking


def test_beta_binomial_ranking_matches_python(spark, sf_dir):
    pdf = _events_pdf(sf_dir)
    g = pdf.groupby("user_id").agg(
        n=("event_id", "size"),
        x=("event_type", lambda s: int((s == "purchase").sum())),
    )
    T, X = int(g["n"].sum()), int(g["x"].sum())
    rows = []
    for uid, r in g.iterrows():
        num = int(r["x"]) * T + 20 * X
        den = int(r["n"]) + 20
        rows.append((num * 1_000_000 // den, num, uid, int(r["n"]), int(r["x"])))
    rows.sort(key=lambda t: (-t[0], -t[1], t[2]))
    got = sorted(
        SPECS["stats_beta_binomial_ranking"].fn(spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    for rank, (row, ref) in enumerate(zip(got, rows), start=1):
        assert row["rank"] == rank
        assert row["user_id"] == ref[2]
        assert row["n"] == ref[3] and row["x"] == ref[4]
        num, den = ref[1], ref[3] + 20
        assert row["smoothed"] == pytest.approx(
            round(num / (den * T), 9), abs=1e-12
        )
    # shrinkage must actually reorder someone vs the raw-rate ranking
    raw = sorted(g.index, key=lambda u: (-g.loc[u, "x"] / g.loc[u, "n"], u))
    smoothed = [r[2] for r in rows]
    assert raw[: len(got)] != smoothed[: len(got)]


# ------------------------------------------------ events_rfm_migration


def test_rfm_migration_matches_python_ntile(spark, sf_dir):
    pdf = _events_pdf(sf_dir)
    pdf["day"] = pdf["ts"].dt.floor("D")
    d0 = pdf["day"].min()
    pdf["half"] = ((pdf["day"] - d0).dt.days >= 15).astype(int) + 1

    def ntile3(counts):  # balanced buckets over the total order (n, uid)
        order = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
        n = len(order)
        base, rem = divmod(n, 3)
        sizes = [base + (1 if i < rem else 0) for i in range(3)]
        seg = {}
        i = 0
        for b, size in enumerate(sizes):
            for uid, _ in order[i : i + size]:
                seg[uid] = ["low", "mid", "high"][b]
            i += size
        return seg

    seg1 = ntile3(pdf[pdf["half"] == 1].groupby("user_id").size().to_dict())
    seg2 = ntile3(pdf[pdf["half"] == 2].groupby("user_id").size().to_dict())
    users = set(seg1) | set(seg2)
    ref: dict[tuple, list] = {}
    for u in users:
        key = (seg1.get(u, "absent"), seg2.get(u, "absent"))
        ref.setdefault(key, []).append(u)
    got = {
        (r["seg_from"], r["seg_to"]): r
        for r in SPECS["events_rfm_migration"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(ref)
    for key, us in ref.items():
        assert got[key]["n_users"] == len(us)
        assert got[key]["sample_user"] == min(us)


# ------------------------------------------------ graph_jaccard_links


def test_jaccard_links_matches_python_sets(spark, sf_dir):
    import duckdb

    edges = duckdb.sql(
        f"SELECT DISTINCT l_suppkey, l_partkey FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    nbrs: dict[int, set] = {}
    for s, p in edges:
        nbrs.setdefault(s, set()).add(p)
    scored = []
    supps = sorted(nbrs)
    for i, a in enumerate(supps):
        for b in supps[i + 1 :]:
            inter = len(nbrs[a] & nbrs[b])
            if inter == 0:
                continue
            uni = len(nbrs[a] | nbrs[b])
            scored.append((inter * 1_000_000 // uni, inter, a, b, uni))
    scored.sort(key=lambda t: (-t[0], -t[1], t[2], t[3]))
    got = sorted(
        SPECS["graph_jaccard_links"].fn(spark, sf_dir).collect(),
        key=lambda r: r["rk"],
    )
    for row, ref in zip(got, scored):
        assert (row["supp_a"], row["supp_b"]) == (ref[2], ref[3])
        assert row["inter"] == ref[1]
        assert row["uni"] == ref[4]
        assert row["j_micro"] == ref[0]


# ------------------------------------------------ er_sorted_neighborhood


def test_sorted_neighborhood_matches_python_window(spark, sf_dir):
    import duckdb

    pdf = duckdb.sql(
        f"SELECT * FROM '{sf_dir}/customer.parquet'"
    ).fetchdf()
    pdf["bal"] = (pdf["c_acctbal"] * 100).round().astype("int64")
    pdf["sort_key"] = pdf["c_nationkey"].astype(str) + "|" + pdf["c_name"]
    ref = set()
    # blocked SNM: the window never crosses a segment block
    for _, block in pdf.groupby("c_mktsegment"):
        ordered = block.sort_values(["sort_key", "c_custkey"]).reset_index(
            drop=True
        )
        for i in range(len(ordered)):
            for k in (1, 2, 3):
                if i + k >= len(ordered):
                    continue
                a, b = ordered.iloc[i], ordered.iloc[i + k]
                if a["c_nationkey"] == b["c_nationkey"] and abs(
                    int(a["bal"]) - int(b["bal"])
                ) < 50_000:
                    ref.add(
                        (int(a["c_custkey"]), int(b["c_custkey"]), k,
                         abs(int(a["bal"]) - int(b["bal"])))
                    )
    got = {
        (r["cust_a"], r["cust_b"], r["win_offset"], r["bal_diff_cents"])
        for r in SPECS["er_sorted_neighborhood"].fn(spark, sf_dir).collect()
    }
    assert got == ref
    assert len(ref) > 0  # the fixture must produce candidates


# ------------------------------------------------ text_vocab_capture_recapture


def test_capture_recapture_matches_python_sets(spark, sf_dir):
    import duckdb

    pdf = duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchdf()
    got = {
        r["lang"]: r
        for r in SPECS["text_vocab_capture_recapture"].fn(spark, sf_dir).collect()
    }
    for lang, g in pdf.groupby("lang"):
        a: set = set()
        b: set = set()
        for _, rec in g.iterrows():
            words = rec["text"].split(" ")
            (a if rec["doc_id"] % 2 == 0 else b).update(words)
        row = got[lang]
        assert row["n_a"] == len(a)
        assert row["n_b"] == len(b)
        assert row["n_both"] == len(a & b)
        assert row["true_vocab"] == len(a | b)
        est = (len(a) + 1) * (len(b) + 1) / (len(a & b) + 1) - 1
        assert row["chapman_estimate"] == pytest.approx(round(est, 6), abs=1e-9)


# ------------------------------------------------ events_decay_weighted_score


def test_decay_score_matches_python_fold(spark, sf_dir):
    pdf = _events_pdf(sf_dir)
    pdf["day"] = pdf["ts"].dt.floor("D")
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
    d0 = pdf["day"].max()
    weights = {d: round((7 / 8) ** d * 1_000_000) for d in range(64)}
    got = {
        r["user_id"]: r
        for r in SPECS["events_decay_weighted_score"].fn(spark, sf_dir).collect()
    }
    for uid, g in pdf.groupby("user_id"):
        ages = (d0 - g["day"]).dt.days
        score = int(sum(int(c) * weights.get(int(a), 0) for c, a in zip(g["cents"], ages)))
        row = got[uid]
        assert row["n_events"] == len(g)
        assert row["total_cents"] == int(g["cents"].sum())
        assert row["score_micro"] == score
        assert row["decayed_value"] == pytest.approx(
            round(score / 1e6 / 100, 6), abs=1e-9
        )
    # decay must actually matter: someone's decayed value differs from
    # what a flat weight would give (score != total * w0)
    assert any(
        r["score_micro"] != r["total_cents"] * 1_000_000 for r in got.values()
    )


def test_bitmap_bit63_survives_signed_long_in_spark(spark):
    """The Spark half of the sign-bit pin (round-12 review catch: the
    first version asserted only a Python emulation): shiftleft(1L, 63)
    is the negative min-long, and bit_or + bit_count must still count
    that bit exactly once through the real aggregation pipeline."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, 63), (0, 0), (0, 63)], "g int, bitpos int"
    ).select("g", F.expr("shiftleft(1L, bitpos)").alias("bit"))
    row = df.groupBy("g").agg(
        F.expr("bit_or(bit)").alias("word")
    ).select(F.bit_count("word").alias("n"), "word").collect()[0]
    assert row["n"] == 2
    assert row["word"] < 0  # the sign bit really is set


# ------------------------------------------------ time_max_drawdown


def test_max_drawdown_matches_python_scan(spark, sf_dir):
    import duckdb

    pdf = duckdb.sql(
        f"""SELECT o_orderpriority AS pri, o_orderdate AS day,
            CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS z
            FROM '{sf_dir}/orders.parquet' GROUP BY 1,2 ORDER BY 1,2"""
    ).fetchdf()
    got = {
        r["o_orderpriority"]: r
        for r in SPECS["time_max_drawdown"].fn(spark, sf_dir).collect()
    }
    for pri, g in pdf.groupby("pri"):
        g = g.sort_values("day")
        peak, maxdd, trough = -(10**18), -1, None
        for _, rec in g.iterrows():
            z = int(rec["z"])
            peak = max(peak, z)
            dd = peak - z
            if dd > maxdd:
                maxdd, trough = dd, rec["day"]
        row = got[pri]
        assert row["n_days"] == len(g)
        assert row["peak_cents"] == peak
        assert row["max_drawdown_cents"] == maxdd
        assert str(row["trough_day"]) == str(trough)[:10]
        assert maxdd > 0  # the level series must actually draw down


# ------------------------------------------------ time_croston_intermittent


def test_croston_matches_python_fold(spark, sf_dir):
    import duckdb

    pdf = duckdb.sql(
        f"""SELECT l_partkey AS pk, CAST(l_shipdate AS DATE) AS day,
            CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
            FROM '{sf_dir}/lineitem.parquet' GROUP BY 1,2 ORDER BY 1,2"""
    ).fetchdf()
    got = {
        r["l_partkey"]: r
        for r in SPECS["time_croston_intermittent"].fn(spark, sf_dir).collect()
    }

    def tdiv(r, den):
        q, _ = divmod(abs(r), den)
        return q if r >= 0 else -q

    n_checked = 0
    for pk, g in pdf.groupby("pk"):
        g = g.sort_values("day")
        if len(g) < 3:
            assert pk not in got
            continue
        days = list(g["day"])
        qs = [int(x) for x in g["q"]]
        z, p, tq = qs[0], 1_000_000, qs[0]
        for i in range(1, len(qs)):
            gap = (days[i] - days[i - 1]).days
            z = z + tdiv(qs[i] - z, 4)
            p = p + tdiv(gap * 1_000_000 - p, 4)
            tq += qs[i]
        row = got[pk]
        assert row["n_demands"] == len(qs)
        assert row["total_qty"] == tq
        assert row["size_est"] == z
        assert row["interval_est_mu"] == p
        assert row["demand_per_day"] == pytest.approx(
            round(z * 1_000_000 / p, 6), abs=1e-9
        )
        n_checked += 1
    assert n_checked > 50  # the grid is genuinely intermittent & covered


# ------------------------------------------------ sample_pps_systematic


def test_pps_systematic_matches_python_grid(spark, sf_dir):
    import hashlib

    import duckdb

    pdf = duckdb.sql(
        f"""SELECT l_partkey AS pk,
            CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wt
            FROM '{sf_dir}/lineitem.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchdf()
    tot = int(pdf["wt"].sum())
    r0 = int(hashlib.md5(b"pps:427").hexdigest()[:12], 16) % tot + 1
    got = {
        r["l_partkey"]: r
        for r in SPECS["sample_pps_systematic"].fn(spark, sf_dir).collect()
    }
    cum = 0
    expected = {}
    for _, rec in pdf.iterrows():
        prev = cum
        cum += int(rec["wt"])
        s_hi = (cum * 50 - r0) // tot + 1 if cum * 50 >= r0 else 0
        s_lo = (prev * 50 - r0) // tot + 1 if prev * 50 >= r0 else 0
        if s_hi - s_lo > 0:
            expected[int(rec["pk"])] = (s_hi - s_lo, int(rec["wt"]))
    assert set(got) == set(expected)
    for pk, (hits, wt) in expected.items():
        assert got[pk]["n_hits"] == hits
        assert got[pk]["weight"] == wt
    # the systematic design delivers EXACTLY k draws
    assert sum(h for h, _ in expected.values()) == 50


# ------------------------------------------------ privacy_dp_quantiles


def test_dp_quantiles_matches_python_mechanism(spark, sf_dir):
    import hashlib
    import math

    pdf = _events_pdf(sf_dir)
    pdf["b"] = (pdf["value"] // 10).astype("int64")
    got = {
        r["event_type"]: r
        for r in SPECS["privacy_dp_quantiles"].fn(spark, sf_dir).collect()
    }
    any_deviates = False
    for et, g in pdf.groupby("event_type"):
        counts = g.groupby("b").size().to_dict()
        n = len(g)
        best = None
        best_util = None
        for c in range(100):
            below_mid = sum(v for b, v in counts.items() if b < c) + counts.get(
                c, 0
            ) / 2
            util = -abs(2 * below_mid - n)
            u = (
                int(
                    hashlib.md5(f"dpq:{et}:{c}".encode()).hexdigest()[:8], 16
                )
                + 0.5
            ) / 4294967296.0
            gumbel = round(-math.log(-math.log(u)), 9)
            score = 0.1 * 0.5 * util + gumbel
            if best is None or score > best[0] or (score == best[0] and c < best[1]):
                best = (score, c)
            if best_util is None or util > best_util[0]:
                best_util = (util, c)
        row = got[et]
        assert row["n_events"] == n
        assert row["dp_bucket"] == best[1]
        assert row["dp_median_approx"] == best[1] * 10 + 5
        assert row["best_utility_mid"] == best_util[1] * 10 + 5
        any_deviates = any_deviates or best[1] != best_util[1]
    # utility must dominate overall (the release is useful) ...
    assert all(
        abs(r["dp_median_approx"] - r["best_utility_mid"]) <= 20
        for r in got.values()
    )


# ------------------------------------------------ part_xyz_variability


def test_xyz_matches_python_cv_bands(spark, sf_dir):
    import math

    import duckdb

    pdf = duckdb.sql(
        f"""SELECT l_partkey AS pk, CAST(l_shipdate AS DATE) AS day,
            CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
            FROM '{sf_dir}/lineitem.parquet' GROUP BY 1,2"""
    ).fetchdf()
    got = {
        r["l_partkey"]: r
        for r in SPECS["part_xyz_variability"].fn(spark, sf_dir).collect()
    }
    classes = set()
    for pk, g in pdf.groupby("pk"):
        qs = [int(x) for x in g["q"]]
        n, sq, ss = len(qs), sum(qs), sum(x * x for x in qs)
        if n < 3:
            assert pk not in got
            continue
        var_num = n * ss - sq * sq
        if 4 * var_num <= sq * sq:
            cls = "X"
        elif 25 * var_num <= 9 * sq * sq:
            cls = "Y"
        else:
            cls = "Z"
        row = got[pk]
        assert row["n_demands"] == n
        assert row["total_qty"] == sq
        assert row["var_num"] == var_num
        assert row["cv"] == pytest.approx(
            round(math.sqrt(var_num) / sq, 6), abs=1e-9
        )
        assert row["xyz_class"] == cls
        classes.add(cls)
    assert classes == {"X", "Y", "Z"}  # all bands live on the fixture
