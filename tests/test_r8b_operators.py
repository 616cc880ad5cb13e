"""Round-8 batch-2 operators: the Damerau-Levenshtein UDF kernel is
pinned against DuckDB's built-in by property test (transpositions
included), PMI collocations against hand math, winsorize against the
clip invariants."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark import registry
from api_weather_kafka_clickhouse_spark.operators.relational3 import (
    DL_MAX_DIST,
    damerau_levenshtein,
)
from api_weather_kafka_clickhouse_spark.tables import load

SPECS = registry.all_specs()


# ------------------------------------------------ fuzzy_match_damerau


def test_dl_is_true_damerau_not_osa():
    # the hallmark case: transpose CA -> AC, then insert B => 2 edits;
    # the restricted (OSA) variant cannot edit between transposed
    # characters and needs 3
    assert damerau_levenshtein("CA", "ABC") == 2
    assert damerau_levenshtein("abc", "acb") == 1  # adjacent transposition
    assert damerau_levenshtein("", "abc") == 3
    assert damerau_levenshtein("same", "same") == 0


# small alphabet => dense collisions and frequent transpositions
_WORD = st.text(alphabet="abcd", min_size=0, max_size=8)
# non-ASCII: DuckDB computes over UTF-8 BYTES (multi-byte chars cost
# their byte count), which the kernel must reproduce
_UWORD = st.text(alphabet="abé日", min_size=0, max_size=6)


@settings(max_examples=200, deadline=None)
@given(_WORD, _WORD)
def test_dl_matches_duckdb_builtin(a, b):
    con = duckdb.connect()
    expect = con.execute(
        "SELECT damerau_levenshtein(?, ?)", [a, b]
    ).fetchone()[0]
    assert damerau_levenshtein(a, b) == expect


@settings(max_examples=150, deadline=None)
@given(_UWORD, _UWORD)
def test_dl_matches_duckdb_on_unicode_bytes(a, b):
    con = duckdb.connect()
    expect = con.execute(
        "SELECT damerau_levenshtein(?, ?)", [a, b]
    ).fetchone()[0]
    assert damerau_levenshtein(a, b) == expect


def test_dl_is_byte_semantics():
    # DuckDB counts UTF-8 bytes: substituting a 2-byte char costs 2
    assert damerau_levenshtein("héllo", "hello") == 2
    assert damerau_levenshtein("日本語", "本日語") == 4


def test_fuzzy_damerau_blocking_and_threshold(spark, sf_dir):
    rows = SPECS["fuzzy_match_damerau"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # block key: candidate pairs share the final word
        assert r.name_a.split(" ")[-1] == r.name_b.split(" ")[-1]
        assert r.edit_dl <= DL_MAX_DIST
        # DL is a lower bound of plain levenshtein
        assert r.edit_dl <= r.edit_lev
        assert r.name_a < r.name_b


# ---------------------------------------------- text_pmi_collocations


def test_pmi_hand_math(spark, sf_dir):
    import math

    df = SPECS["text_pmi_collocations"].fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    t = load(spark, "documents", sf_dir).select(
        F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    n_uni = t.count()
    n_bi = n_uni - load(spark, "documents", sf_dir).count()  # one bigram less per doc
    for r in rows[:5]:
        expect = math.log(
            (r.n_ab / n_bi) / ((r.n_a / n_uni) * (r.n_b / n_uni))
        )
        assert abs(r.pmi - expect) < 1e-4
    # ordering: PMI non-increasing
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)


# --------------------------------------------------- quality_winsorize


def test_winsorize_clip_invariants(spark, sf_dir):
    rows = SPECS["quality_winsorize"].fn(spark, sf_dir).collect()
    docs = load(spark, "documents", sf_dir).count()
    assert len(rows) == docs
    n_clipped = 0
    for r in rows:
        assert r.lo <= r.hi
        assert r.lo <= r.winsorized <= r.hi
        if r.clipped:
            n_clipped += 1
            assert r.winsorized in (r.lo, r.hi)
        else:
            assert r.winsorized == pytest.approx(float(r.n_chars))
    # tails exist on both sides at test scale
    assert 0 < n_clipped < docs


def test_winsorize_is_broadcast_no_corpus_shuffle(spark, sf_dir):
    plan = (
        SPECS["quality_winsorize"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------- time_seasonal_decompose


def test_seasonal_decompose_reconstructs(spark, sf_dir):
    rows = SPECS["time_seasonal_decompose"].fn(spark, sf_dir).collect()
    assert rows
    grand = sum(r.n for r in rows) / len(rows)
    for r in rows:
        # additive identity: n = trend + (seasonal - grand) + residual
        assert r.n == pytest.approx(
            r.trend + (r.seasonal - grand) + r.residual, abs=2e-5
        )
        assert 0 <= r.hod <= 23


# ------------------------------------------------ events_sequence_match


def test_sequence_match_brute_force(spark, sf_dir):
    from datetime import timedelta

    got = {
        r.user_id: r
        for r in SPECS["events_sequence_match"].fn(spark, sf_dir).collect()
    }
    ev = (
        load(spark, "events", sf_dir)
        .select("user_id", "ts", "event_type")
        .collect()
    )
    by_user: dict[int, list] = {}
    for e in ev:
        by_user.setdefault(e.user_id, []).append(e)
    for uid, es in sorted(by_user.items())[:40]:
        es.sort(key=lambda e: e.ts)
        sig = [e.ts for e in es if e.event_type == "signup"]
        pur = [e.ts for e in es if e.event_type == "purchase"]
        err = [e.ts for e in es if e.event_type == "error"]
        matches = []
        for s in sig:
            cand = [p for p in pur if s < p <= s + timedelta(days=7)]
            if not cand:
                continue
            p = min(cand)
            if not any(s < x < p for x in err):
                matches.append((s, p))
        if matches:
            assert uid in got
            assert got[uid].n_matches == len(matches)
            assert got[uid].first_signup == min(m[0] for m in matches)
            assert got[uid].first_purchase == min(m[1] for m in matches)
        else:
            assert uid not in got


# ------------------------------------------------ graph_walk_diffusion


def test_walk_diffusion_mass_conservation(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.affinity import (
        WALK_MASS,
        WALK_SEED_NATION,
        WALK_TOP,
    )

    rows = SPECS["graph_walk_diffusion"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= WALK_TOP
    n_seeds = (
        load(spark, "supplier", sf_dir)
        .filter(F.col("s_nationkey") == WALK_SEED_NATION)
        .count()
    )
    # floor division only ever loses mass; the top-K received total is
    # bounded by what the seeds pushed out
    assert sum(r.mass for r in rows) <= n_seeds * WALK_MASS
    assert all(r.mass > 0 for r in rows)
    # masses arrive sorted descending with the key tiebreak
    pairs = [(-r.mass, r.suppkey) for r in rows]
    assert pairs == sorted(pairs)


# ------------------------------------------- embedding_truncate_recall


def test_truncate_recall_argmax_matches_numpy(spark, sf_dir):
    import numpy as np

    from api_weather_kafka_clickhouse_spark.operators.similarity import (
        TRUNC_DIM,
        TRUNC_QUERIES,
    )

    rows = {
        r.query_id: r
        for r in SPECS["embedding_truncate_recall"].fn(spark, sf_dir).collect()
    }
    assert len(rows) == TRUNC_QUERIES
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load(spark, "embeddings", sf_dir).collect()
    }

    def top1(qid, dim):
        best = None
        for vid, v in vecs.items():
            if vid == qid:
                continue
            a, b = vecs[qid][:dim], v[:dim]
            cos = round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)
            key = (-cos, vid)
            if best is None or key < best[0]:
                best = (key, vid, cos)
        return best[1], best[2]

    for qid in list(rows)[:5]:
        r = rows[qid]
        nf, cf = top1(qid, 64)
        nt, ct = top1(qid, TRUNC_DIM)
        assert (r.nbr_full, r.cos_full) == (nf, pytest.approx(cf, abs=1e-6))
        assert (r.nbr_trunc, r.cos_trunc) == (nt, pytest.approx(ct, abs=1e-6))
        assert r.agree == (r.nbr_full == r.nbr_trunc)


# ------------------------------------------ text_bpe_merge_candidates


def test_bpe_pair_counts_match_python(spark, sf_dir):
    from collections import Counter

    from api_weather_kafka_clickhouse_spark.operators.text_analysis import (
        BPE_MIN_WORD_LEN,
        BPE_TOP,
    )

    rows = SPECS["text_bpe_merge_candidates"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= BPE_TOP
    wf = Counter()
    for d in load(spark, "documents", sf_dir).select("text").collect():
        for w in d.text.split(" "):
            if len(w) >= BPE_MIN_WORD_LEN:
                wf[w] += 1
    n = Counter()
    n_types = Counter()
    for w, f in wf.items():
        seen = set()
        for i in range(len(w) - 1):
            p = w[i : i + 2]
            n[p] += f
            seen.add(p)
        # n_types counts PAIR OCCURRENCE SLOTS per word, not distinct
        # words: the operator counts one row per (word, position)
        for i in range(len(w) - 1):
            n_types[w[i : i + 2]] += 1
    expect = sorted(((-c, p) for p, c in n.items()))[:BPE_TOP]
    got = [(-r.n, r.pair) for r in rows]
    assert got == expect
    for r in rows:
        assert r.n_types == n_types[r.pair]
        assert r.n >= r.n_types  # every counted type occurs at least once


# ------------------------------------------------ time_period_over_period


def test_period_over_period_growth_identity(spark, sf_dir):
    rows = SPECS["time_period_over_period"].fn(spark, sf_dir).collect()
    assert rows[0].prev_revenue is None and rows[0].mom_growth is None
    for prev, cur in zip(rows, rows[1:]):
        assert cur.prev_revenue == pytest.approx(prev.revenue, abs=1e-6)
        assert cur.mom_growth == pytest.approx(
            (cur.revenue - prev.revenue) / prev.revenue, abs=2e-6
        )
        assert cur.month > prev.month


# -------------------------------------------------------- text_bm25_topk


def test_bm25_python_replica(spark, sf_dir):
    import math

    from api_weather_kafka_clickhouse_spark.operators.text_analysis import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        BM25_TOP,
    )

    rows = SPECS["text_bm25_topk"].fn(spark, sf_dir).collect()
    docs = {
        d.doc_id: d.text.split(" ")
        for d in load(spark, "documents", sf_dir).select("doc_id", "text").collect()
    }
    n_docs = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n_docs
    for term in BM25_TERMS:
        tf = {i: t.count(term) for i, t in docs.items()}
        df = sum(1 for v in tf.values() if v > 0)
        idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

        def score(i):
            return (
                idf
                * (tf[i] * (BM25_K1 + 1))
                / (tf[i] + BM25_K1 * (1 - BM25_B + BM25_B * len(docs[i]) / avgdl))
            )

        expect = sorted(
            ((i, score(i)) for i in docs if tf[i] > 0),
            key=lambda x: (-round(x[1], 6), x[0]),
        )[:BM25_TOP]
        got = sorted(
            ((r.doc_id, r.bm25, r.rank) for r in rows if r.term == term),
            key=lambda x: x[2],
        )
        assert [g[0] for g in got] == [e[0] for e in expect]
        for g, e in zip(got, expect):
            assert g[1] == pytest.approx(e[1], abs=2e-6)


# ------------------------------------------------------ events_top_paths


def test_top_paths_python_replica(spark, sf_dir):
    from collections import Counter

    rows = SPECS["events_top_paths"].fn(spark, sf_dir).collect()
    ev = load(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    sessions: dict = {}
    for e in ev:
        sessions.setdefault((e.user_id, e.ts.date()), []).append(
            (e.ts, e.event_id, e.event_type)
        )
    paths = Counter(
        ">".join(t[2] for t in sorted(v)) for v in sessions.values()
    )
    expect = sorted(((-n, p) for p, n in paths.items()))[: len(rows)]
    assert [(-r.n_sessions, r.path) for r in rows] == expect
    for r in rows:
        assert r.steps == len(r.path.split(">"))


# ----------------------------------------------- join_asof_tolerance


def test_asof_tolerance_gates_stale_matches(spark, sf_dir):
    from datetime import timedelta

    from api_weather_kafka_clickhouse_spark.operators.joins import ASOF_TOLERANCE_MIN

    tol = SPECS["join_asof_tolerance"].fn(spark, sf_dir).collect()
    plain = {
        r.purchase_id: r for r in SPECS["join_asof"].fn(spark, sf_dir).collect()
    }
    assert len(tol) == len(plain)
    saw_fresh = saw_stale = False
    for r in tol:
        p = plain[r.purchase_id]
        if p.last_error_ts is None:
            assert r.error_id is None and not r.match_too_stale
        elif p.last_error_ts >= r.purchase_ts - timedelta(minutes=ASOF_TOLERANCE_MIN):
            # fresh: identical to the plain as-of match
            assert (r.error_id, r.error_ts) == (p.last_error_id, p.last_error_ts)
            assert not r.match_too_stale
            saw_fresh = True
        else:
            assert r.error_id is None and r.error_ts is None
            assert r.match_too_stale
            saw_stale = True
    assert saw_fresh and saw_stale  # tolerance actually bites at test scale


# ----------------------------------------------- events_ab_test_lift


def test_ab_test_lift_identities(spark, sf_dir):
    import math

    [r] = SPECS["events_ab_test_lift"].fn(spark, sf_dir).collect()
    users = load(spark, "events", sf_dir).select("user_id").distinct().count()
    assert r.n_c + r.n_t == users
    assert 0 <= r.conv_c <= r.n_c and 0 <= r.conv_t <= r.n_t
    assert r.p_c == pytest.approx(r.conv_c / r.n_c, abs=1e-6)
    assert r.p_t == pytest.approx(r.conv_t / r.n_t, abs=1e-6)
    assert r.rel_lift == pytest.approx(r.p_t / r.p_c - 1.0, abs=1e-5)
    pool = (r.conv_c + r.conv_t) / (r.n_c + r.n_t)
    z = (r.conv_t / r.n_t - r.conv_c / r.n_c) / math.sqrt(
        pool * (1 - pool) * (1 / r.n_c + 1 / r.n_t)
    )
    assert r.z_stat == pytest.approx(z, abs=1e-5)


# ---------------------------------------------- window_moving_median


def test_moving_median_python_replica(spark, sf_dir):
    import statistics

    from api_weather_kafka_clickhouse_spark.operators.windows import MOVMED_HALF

    rows = SPECS["window_moving_median"].fn(spark, sf_dir).collect()
    ev = sorted(
        load(spark, "events", sf_dir)
        .select("event_id", "event_type", "ts", "value")
        .collect(),
        key=lambda r: (r.ts, r.event_id),
    )
    by_type: dict = {}
    for e in ev:
        by_type.setdefault(e.event_type, []).append(e)
    got = {r.event_id: r.moving_med for r in rows}
    for etype, es in list(by_type.items())[:2]:
        for i in (0, len(es) // 2, len(es) - 1):
            lo, hi = max(0, i - MOVMED_HALF), min(len(es), i + MOVMED_HALF + 1)
            expect = statistics.median(e.value for e in es[lo:hi])
            assert got[es[i].event_id] == pytest.approx(expect, abs=1e-6)


# ----------------------------------------------- text_lang_confusion


def test_lang_confusion_consistent_with_lang_id(spark, sf_dir):
    rows = SPECS["text_lang_confusion"].fn(spark, sf_dir).collect()
    pred = SPECS["text_lang_id"].fn(spark, sf_dir).collect()
    from collections import Counter

    expect = Counter((p.labeled_lang, p.lid_guess) for p in pred)
    assert {(r.labeled_lang, r.lid_guess): r.n for r in rows} == dict(expect)
    # row fractions sum to 1 per label
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r.labeled_lang, []).append(r)
    for rs in by_label.values():
        assert sum(r.row_frac for r in rs) == pytest.approx(1.0, abs=1e-5)
        assert all(r.n_label == sum(x.n for x in rs) for r in rs)


# ------------------------------------------------- orders_cohort_ltv


def test_cohort_ltv_triangle_identities(spark, sf_dir):
    rows = SPECS["orders_cohort_ltv"].fn(spark, sf_dir).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort, []).append(r)
    total_rev = sum(r.revenue for r in rows)
    orders_total = (
        load(spark, "orders", sf_dir)
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
        .collect()[0][0]
    )
    assert total_rev == pytest.approx(float(orders_total), rel=1e-9)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r.month_idx)
        run = 0.0
        for r in rs:
            run += r.revenue
            assert r.cum_revenue == pytest.approx(run, rel=1e-9)
            assert r.ltv_per_customer == pytest.approx(
                r.cum_revenue / r.cohort_size, abs=1e-5
            )
        assert rs[0].month_idx == 0  # the acquisition month is present


# ------------------------------------------ text_hashing_trick_features


def test_hashing_trick_partition_of_tokens(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.text_analysis import (
        HASHTRICK_BUCKETS,
    )

    rows = SPECS["text_hashing_trick_features"].fn(spark, sf_dir).collect()
    docs = {
        d.doc_id: len(d.text.split(" "))
        for d in load(spark, "documents", sf_dir).select("doc_id", "text").collect()
    }
    per_doc: dict = {}
    for r in rows:
        assert 0 <= r.bucket < HASHTRICK_BUCKETS
        assert r.tf > 0
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.tf
    # bucket tfs partition each doc's token count exactly
    assert per_doc == docs
    # same token always lands in the same bucket => deterministic rerun
    again = SPECS["text_hashing_trick_features"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


# -------------------------------------------- graph_label_propagation


def test_label_propagation_majority_vote(spark, sf_dir):
    from collections import Counter

    rows = {r.suppkey: r for r in SPECS["graph_label_propagation"].fn(spark, sf_dir).collect()}
    li = load(spark, "lineitem", sf_dir).select("l_suppkey", "l_partkey").distinct().collect()
    sup = {
        s.s_suppkey: s.s_nationkey
        for s in load(spark, "supplier", sf_dir).collect()
    }
    by_part: dict = {}
    for e in li:
        by_part.setdefault(e.l_partkey, set()).add(e.l_suppkey)
    peers: dict = {}
    for members in by_part.values():
        for m in members:
            peers.setdefault(m, set()).update(members - {m})
    for node, ps in sorted(peers.items())[:30]:
        votes = Counter(sup[p] for p in ps)
        best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
        r = rows[node]
        assert (r.new_label, r.n_votes) == best
        assert r.old_label == sup[node]
        assert r.changed == (r.new_label != r.old_label)


# ------------------------------------------- decontaminate_longest_span


def test_longest_span_python_replica(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.text_analysis import (
        DECONTAM_EVAL_SOURCE,
        DECONTAM_NGRAM,
    )

    rows = {
        r.doc_id: r
        for r in SPECS["decontaminate_longest_span"].fn(spark, sf_dir).collect()
    }
    docs = load(spark, "documents", sf_dir).select("doc_id", "source", "text").collect()
    eval_grams = set()
    for d in docs:
        if d.source == DECONTAM_EVAL_SOURCE:
            t = d.text.split(" ")
            for i in range(len(t) - DECONTAM_NGRAM + 1):
                eval_grams.add(" ".join(t[i : i + DECONTAM_NGRAM]))
    expect = {}
    for d in docs:
        if d.source == DECONTAM_EVAL_SOURCE:
            continue
        t = d.text.split(" ")
        hit = [
            i
            for i in range(len(t) - DECONTAM_NGRAM + 1)
            if " ".join(t[i : i + DECONTAM_NGRAM]) in eval_grams
        ]
        if not hit:
            continue
        runs, cur = [], 1
        for a, b in zip(hit, hit[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        expect[d.doc_id] = (len(hit), max(runs), max(runs) + DECONTAM_NGRAM - 1)
    assert {
        k: (v.n_hit_positions, v.longest_run, v.longest_span_tokens)
        for k, v in rows.items()
    } == expect
    # consistency with the binary-overlap twin: same flagged doc set is
    # NOT guaranteed (overlap counts DISTINCT grams, spans count
    # positions), but every span-flagged doc must be overlap-flagged
    overlap = {
        r.doc_id
        for r in SPECS["decontaminate_ngram_overlap"].fn(spark, sf_dir).collect()
    }
    assert set(rows) <= overlap


# ---------------------------------------------- events_error_rate_wilson


def test_wilson_interval_properties(spark, sf_dir):
    import math

    from api_weather_kafka_clickhouse_spark.operators.stats import WILSON_Z

    rows = SPECS["events_error_rate_wilson"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.wilson_lo <= r.rate <= r.wilson_hi <= 1.0
        assert math.copysign(1.0, r.wilson_lo) == 1.0  # never -0.0
        p = r.errs / r.n
        z2 = WILSON_Z * WILSON_Z
        center = (p + z2 / (2 * r.n)) / (1 + z2 / r.n)
        margin = (
            WILSON_Z
            * math.sqrt((p * (1 - p) + z2 / (4 * r.n)) / r.n)
            / (1 + z2 / r.n)
        )
        assert r.wilson_lo == pytest.approx(max(center - margin, 0.0), abs=2e-6)
        assert r.wilson_hi == pytest.approx(center + margin, abs=2e-6)


# ---------------------------------------------- feature_target_encoding


def test_target_encoding_shrinks_toward_global(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.stats import TARGET_ENC_SMOOTH

    rows = SPECS["feature_target_encoding"].fn(spark, sf_dir).collect()
    assert len(rows) >= 2
    for r in rows:
        expect = (r.n * r.cat_mean + TARGET_ENC_SMOOTH * r.global_mean) / (
            r.n + TARGET_ENC_SMOOTH
        )
        assert r.encoded == pytest.approx(expect, abs=2e-4)
        # the encoding lies strictly between the category and global
        # means (shrinkage), unless they coincide
        lo, hi = sorted((r.cat_mean, r.global_mean))
        assert lo - 1e-6 <= r.encoded <= hi + 1e-6


# ----------------------------------------------------- sim_hybrid_rrf


def test_rrf_fusion_identities(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.similarity import (
        RRF_K,
        RRF_TOP,
    )

    rows = SPECS["sim_hybrid_rrf"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= RRF_TOP
    for r in rows:
        expect = 0.0
        if r.rank_lex is not None:
            expect += 1.0 / (RRF_K + r.rank_lex)
        if r.rank_vec is not None:
            expect += 1.0 / (RRF_K + r.rank_vec)
        assert r.rrf == pytest.approx(expect, abs=1e-9)
        assert r.rank_lex is not None or r.rank_vec is not None
    # fused order is rrf-descending with doc_id tiebreak
    key = [(-r.rrf, r.doc_id) for r in sorted(rows, key=lambda r: r.fused_rank)]
    assert key == sorted(key)
    # a doc ranked top by BOTH systems must beat a doc in only one
    both = [r for r in rows if r.rank_lex is not None and r.rank_vec is not None]
    assert both, "fusion should surface docs present in both rankings"


# ------------------------------------------- events_gini_concentration


def test_gini_matches_numpy_and_bounds(spark, sf_dir):
    [r] = SPECS["events_gini_concentration"].fn(spark, sf_dir).collect()
    counts = sorted(
        c.n
        for c in load(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n = len(counts)
    total = sum(counts)
    expect = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(counts)) / (n * total)
    assert r.n_users == n and r.total == total
    assert r.gini == pytest.approx(expect, abs=1e-6)
    assert 0.0 <= r.gini < 1.0


# ---------------------------------------------- time_changepoint_binary


def test_changepoint_minimizes_sse(spark, sf_dir):
    [r] = SPECS["time_changepoint_binary"].fn(spark, sf_dir).collect()
    counts = [
        b.n
        for b in load(spark, "events", sf_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("h")
        .collect()
    ]
    m = len(counts)

    def sse(xs):
        if not xs:
            return 0.0
        mu = sum(xs) / len(xs)
        return sum((x - mu) ** 2 for x in xs)

    best = min(
        (sse(counts[:i]) + sse(counts[i:]), i) for i in range(1, m)
    )
    assert r.n_l == best[1] and r.n_r == m - best[1]
    assert r.sse == pytest.approx(best[0], rel=1e-9)
    assert r.mean_l == pytest.approx(sum(counts[: r.n_l]) / r.n_l, abs=1e-5)
    assert r.mean_r == pytest.approx(sum(counts[r.n_l :]) / r.n_r, abs=1e-5)


# ------------------------------------------------- stats_anova_weekday


def test_anova_matches_textbook_computation(spark, sf_dir):
    from collections import defaultdict

    [r] = SPECS["stats_anova_weekday"].fn(spark, sf_dir).collect()
    buckets = (
        load(spark, "events", sf_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    groups = defaultdict(list)
    for b in buckets:
        groups[b.h.isoweekday()].append(b.n)
    all_v = [v for g in groups.values() for v in g]
    grand = sum(all_v) / len(all_v)
    ssb = sum(len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups.values())
    ssw = sum((v - sum(g) / len(g)) ** 2 for g in groups.values() for v in g)
    f = (ssb / (len(groups) - 1)) / (ssw / (len(all_v) - len(groups)))
    assert r.big_n == len(all_v) and r.k == 7
    assert r.ssb == pytest.approx(ssb, rel=1e-6)
    assert r.ssw == pytest.approx(ssw, rel=1e-6)
    assert r.f_stat == pytest.approx(f, rel=1e-6)
    assert r.reject_h0 == (f > 2.0986)


# --------------------------------------------------------- text_kwic


def test_kwic_python_replica(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.text_analysis import (
        KWIC_CTX,
        KWIC_TERM,
    )

    rows = {(r.doc_id, r.pos): r for r in SPECS["text_kwic"].fn(spark, sf_dir).collect()}
    expect = {}
    for d in load(spark, "documents", sf_dir).select("doc_id", "text").collect():
        t = d.text.split(" ")
        for i, tok in enumerate(t, start=1):
            if tok == KWIC_TERM:
                lo, hi = max(i - KWIC_CTX, 1), min(i + KWIC_CTX, len(t))
                expect[(d.doc_id, i)] = (
                    " ".join(t[lo - 1 : i - 1]),
                    " ".join(t[i:hi]),
                    " ".join(t[lo - 1 : hi]),
                )
    assert {
        k: (v.left_ctx, v.right_ctx, v.snippet) for k, v in rows.items()
    } == expect
    # boundary occurrences exist and emit short (possibly empty) sides
    assert any(v.left_ctx == "" or v.right_ctx == "" for v in rows.values())


# ---------------------------------------- embedding_cosine_histogram


def test_cosine_histogram_partitions_all_pairs(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.similarity import (
        COS_HIST_BIN,
        COS_HIST_IDS,
    )

    rows = SPECS["embedding_cosine_histogram"].fn(spark, sf_dir).collect()
    k = (
        load(spark, "embeddings", sf_dir)
        .filter(F.col("vec_id") < COS_HIST_IDS)
        .count()
    )
    assert sum(r.n for r in rows) == k * (k - 1) // 2  # all pairs, once
    for r in rows:
        assert r.bin * COS_HIST_BIN - 1e-9 <= r.lo <= r.hi < (r.bin + 1) * COS_HIST_BIN + 1e-9
    # isotropic corpus: the modal bin straddles cosine 0
    modal = max(rows, key=lambda r: r.n)
    assert modal.bin in (-1, 0)


# ------------------------------------------ time_forecast_backtest_naive


def test_forecast_backtest_python_replica(spark, sf_dir):
    import math

    [r] = SPECS["time_forecast_backtest_naive"].fn(spark, sf_dir).collect()
    counts = [
        b.n
        for b in load(spark, "events", sf_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("h")
        .collect()
    ]

    def metrics(lag):
        errs = [counts[i] - counts[i - lag] for i in range(lag, len(counts))]
        n = len(errs)
        return (
            n,
            sum(abs(e) for e in errs) / n,
            math.sqrt(sum(e * e for e in errs) / n),
            sum(errs) / n,
        )

    n1, mae1, rmse1, bias1 = metrics(1)
    n24, mae24, rmse24, bias24 = metrics(24)
    assert (r.n_evals1, r.n_evals24) == (n1, n24)
    assert r.mae_persistence == pytest.approx(mae1, abs=1e-6)
    assert r.rmse_persistence == pytest.approx(rmse1, abs=1e-6)
    assert r.bias_persistence == pytest.approx(bias1, abs=1e-6)
    assert r.mae_seasonal == pytest.approx(mae24, abs=1e-6)
    assert r.rmse_seasonal == pytest.approx(rmse24, abs=1e-6)
    assert r.bias_seasonal == pytest.approx(bias24, abs=1e-6)


# ------------------------------------------------- time_peak_detection


def test_peak_detection_python_replica(spark, sf_dir):
    rows = {r.h: r for r in SPECS["time_peak_detection"].fn(spark, sf_dir).collect()}
    buckets = (
        load(spark, "events", sf_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("h")
        .collect()
    )
    ns = [b.n for b in buckets]
    m, s = len(ns), sum(ns)
    expect = {}
    for i in range(1, m - 1):
        if ns[i] > ns[i - 1] and ns[i] > ns[i + 1] and ns[i] * m * 2 > s * 3:
            expect[buckets[i].h] = (ns[i], ns[i - 1], ns[i + 1])
    assert {h: (r.n, r.n_prev, r.n_next) for h, r in rows.items()} == expect
    for r in rows.values():
        assert r.rel_to_mean == pytest.approx(r.n * m / s, abs=1e-6)
        assert r.rel_to_mean > 1.5


# ------------------------------------- dedup_simhash_band_occupancy


def test_band_occupancy_accounts_for_all_docs_and_prices_join(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.dedup import SIMHASH_BANDS

    rows = SPECS["dedup_simhash_band_occupancy"].fn(spark, sf_dir).collect()
    docs = load(spark, "documents", sf_dir).count()
    by_band: dict = {}
    for r in rows:
        by_band.setdefault(r.band_idx, []).append(r)
        assert r.candidate_pairs == r.n_buckets * r.bucket_size * (r.bucket_size - 1) // 2
    assert sorted(by_band) == list(range(SIMHASH_BANDS))
    for band, rs in by_band.items():
        # every doc lands in exactly one bucket per band
        assert sum(r.bucket_size * r.n_buckets for r in rs) == docs


# ----------------------------------------------------- sim_recall_report


def test_recall_report_consistent_with_rankings(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
    )

    rows = {r.query_id: r for r in SPECS["sim_recall_report"].fn(spark, sf_dir).collect()}
    assert len(rows) == N_QUERIES
    ann = {}
    for r in SPECS["sim_ann_lsh"].fn(spark, sf_dir).collect():
        ann.setdefault(r.query_id, set()).add(r.nbr_id)
    exact = {}
    for r in SPECS["sim_topk_bruteforce"].fn(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.nbr_id)
    for qid, r in rows.items():
        hits = len(exact[qid] & ann.get(qid, set()))
        assert r.n_hit == hits and r.k == TOP_K
        assert r.recall_at_k == pytest.approx(hits / TOP_K, abs=1e-6)
        assert 0.0 <= r.recall_at_k <= 1.0


# ---------------------------------------------------- agg_hll_set_algebra


def test_hll_set_algebra_inclusion_exclusion(spark, sf_dir):
    rows = SPECS["agg_hll_set_algebra"].fn(spark, sf_dir).collect()
    types = {
        r.event_type
        for r in load(spark, "events", sf_dir).select("event_type").distinct().collect()
    }
    assert len(rows) == len(types) * (len(types) - 1) // 2
    members: dict = {}
    for r in (
        load(spark, "events", sf_dir)
        .select("event_type", "user_id")
        .distinct()
        .collect()
    ):
        members.setdefault(r.event_type, set()).add(r.user_id)
    for r in rows:
        a, b = members[r.type_a], members[r.type_b]
        assert (r.n_a, r.n_b) == (len(a), len(b))
        assert r.n_union == len(a | b)
        assert r.n_intersection == len(a & b)
        # inclusion-exclusion closes exactly
        assert r.n_a + r.n_b - r.n_union == r.n_intersection
        assert r.hll_union_within_tol  # the sketch guarantee holds here


# --------------------------------------------- text_autocomplete_index


def test_autocomplete_python_replica(spark, sf_dir):
    from collections import Counter

    from api_weather_kafka_clickhouse_spark.operators.text_analysis import (
        AUTOCOMPLETE_MAX_PREFIX,
        AUTOCOMPLETE_TOP,
    )

    rows = SPECS["text_autocomplete_index"].fn(spark, sf_dir).collect()
    freq = Counter(
        r.p_name for r in load(spark, "part", sf_dir).select("p_name").collect()
    )
    by_prefix: dict = {}
    for name, f in freq.items():
        for i in range(1, min(AUTOCOMPLETE_MAX_PREFIX, len(name)) + 1):
            by_prefix.setdefault(name[:i], []).append((-f, name))
    expect = {}
    for pre, cands in by_prefix.items():
        for rank, (negf, name) in enumerate(sorted(cands)[:AUTOCOMPLETE_TOP], start=1):
            expect[(pre, rank)] = (name, -negf)
    assert {
        (r.prefix, r.rank): (r.completion, r.freq) for r in rows
    } == expect


# ------------------------------------------------------- join_any_left


def test_any_left_join_picks_deterministic_first(spark, sf_dir):
    rows = {r.o_orderkey: r for r in SPECS["join_any_left"].fn(spark, sf_dir).collect()}
    orders = load(spark, "orders", sf_dir).count()
    assert len(rows) == orders  # left-preserving, 1:1 after collapse
    li = load(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_partkey", "l_suppkey",
    ).collect()
    best: dict = {}
    for e in li:
        k = (e.l_linenumber, float(e.l_quantity), float(e.l_extendedprice),
             e.l_partkey, e.l_suppkey)
        if e.l_orderkey not in best or k < best[e.l_orderkey][0]:
            best[e.l_orderkey] = (k, e)
    n_unmatched = 0
    for okey, r in rows.items():
        if r.unmatched:
            n_unmatched += 1
            assert r.first_linenumber is None and r.first_quantity is None
            assert okey not in best
        else:
            _, e = best[okey]
            assert (r.first_linenumber, r.first_quantity) == (
                e.l_linenumber,
                float(e.l_quantity),
            )
    assert n_unmatched == orders - len(best)


def test_clickhouse_uniq_up_to(spark):
    from pyspark.sql import Row

    from api_weather_kafka_clickhouse_spark.functions.clickhouse import uniqUpTo

    df = spark.createDataFrame(
        [Row(k="a", v=i % 3) for i in range(9)] + [Row(k="b", v=i) for i in range(9)]
    )
    got = {
        r.k: r.u
        for r in df.groupBy("k").agg(uniqUpTo(5, "v").alias("u")).collect()
    }
    assert got == {"a": 3, "b": 6}  # exact below N, saturates at N+1


# ----------------------------------------------------- agg_trimmed_mean


def test_trimmed_mean_python_replica(spark, sf_dir):
    rows = {r.event_type: r for r in SPECS["agg_trimmed_mean"].fn(spark, sf_dir).collect()}
    ev = load(spark, "events", sf_dir).select("event_type", "value").collect()
    by_type: dict = {}
    for e in ev:
        by_type.setdefault(e.event_type, []).append(e.value)

    def q(vals, p):
        vals = sorted(vals)
        r = (len(vals) - 1) * p
        lo, hi = int(r), min(int(r) + 1, len(vals) - 1)
        return vals[lo] + (vals[hi] - vals[lo]) * (r - lo)

    for etype, vals in by_type.items():
        lo, hi = q(vals, 0.05), q(vals, 0.95)
        kept = [round(v, 2) for v in vals if lo <= v <= hi]
        r = rows[etype]
        assert r.n_all == len(vals) and r.n_kept == len(kept)
        assert r.trimmed_mean == pytest.approx(sum(kept) / len(kept), abs=1e-5)
        assert r.raw_mean == pytest.approx(
            sum(round(v, 2) for v in vals) / len(vals), abs=1e-5
        )
        # robustness direction: the trim shrinks the spread of means
        assert abs(r.trimmed_mean) <= max(abs(min(vals)), abs(max(vals)))


# ------------------------------------------- sample_balanced_downsample


def test_balanced_downsample_equalizes_strata(spark, sf_dir):
    from collections import Counter

    rows = SPECS["sample_balanced_downsample"].fn(spark, sf_dir).collect()
    sizes = Counter(
        d.lang for d in load(spark, "documents", sf_dir).select("lang").collect()
    )
    k_min = min(sizes.values())
    kept = Counter(r.lang for r in rows)
    # every stratum present and cut to exactly the min class size
    assert kept == {lang: k_min for lang in sizes}
    # deterministic rerun
    again = SPECS["sample_balanced_downsample"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


# ---------------------------------------------------- privacy_k_anonymity


def test_k_anonymity_python_replica(spark, sf_dir):
    from collections import defaultdict

    from api_weather_kafka_clickhouse_spark.operators.relational3 import K_ANON, L_DIV

    rows = {
        (r.c_mktsegment, r.c_nationkey): r
        for r in SPECS["privacy_k_anonymity"].fn(spark, sf_dir).collect()
    }
    groups = defaultdict(list)
    for c in load(spark, "customer", sf_dir).collect():
        groups[(c.c_mktsegment, c.c_nationkey)].append(c.c_acctbal)
    assert set(rows) == set(groups)
    saw_k_violation = False
    for key, bals in groups.items():
        r = rows[key]
        assert r.group_size == len(bals)
        assert r.l_sensitive == len({int(b // 1000) for b in bals})
        assert r.violates_k == (r.group_size < K_ANON)
        assert r.violates_l == (r.l_sensitive < L_DIV)
        saw_k_violation |= r.violates_k
    assert saw_k_violation  # the audit bites at test scale


# --------------------------------------------------- stats_benford_digits


def test_benford_python_replica(spark, sf_dir):
    import math
    from collections import Counter

    rows = {r.digit: r for r in SPECS["stats_benford_digits"].fn(spark, sf_dir).collect()}
    prices = [
        r.o_totalprice
        for r in load(spark, "orders", sf_dir).select("o_totalprice").collect()
    ]
    digits = Counter(int(str(int(p))[0]) for p in prices)
    total = sum(digits.values())
    assert set(rows) <= set(range(1, 10))
    for d, r in rows.items():
        p = math.log10(1 + 1 / d)
        assert r.n == digits[d]
        assert r.benford_p == pytest.approx(p, abs=1e-6)
        assert r.observed_p == pytest.approx(digits[d] / total, abs=1e-6)
        assert r.chi2_term == pytest.approx(
            (digits[d] - total * p) ** 2 / (total * p), rel=1e-6
        )
    assert sum(r.n for r in rows.values()) == total


# ------------------------------------------------ events_dispersion_index


def test_dispersion_python_replica(spark, sf_dir):
    import statistics
    from collections import defaultdict

    rows = {r.event_type: r for r in SPECS["events_dispersion_index"].fn(spark, sf_dir).collect()}
    buckets = defaultdict(list)
    for b in (
        load(spark, "events", sf_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ):
        buckets[b.event_type].append(b.n)
    for etype, ns in buckets.items():
        r = rows[etype]
        assert r.n_buckets == len(ns) and r.total == sum(ns)
        assert r.mean_rate == pytest.approx(statistics.mean(ns), abs=1e-5)
        assert r.dispersion == pytest.approx(
            statistics.variance(ns) / statistics.mean(ns), rel=1e-5
        )
        assert r.dispersion > 0


# ------------------------------------------------- text_lexical_diversity


def test_lexical_diversity_python_replica(spark, sf_dir):
    import math

    rows = {r.doc_id: r for r in SPECS["text_lexical_diversity"].fn(spark, sf_dir).collect()}
    for d in load(spark, "documents", sf_dir).select("doc_id", "text").collect():
        toks = d.text.split(" ")
        r = rows[d.doc_id]
        assert (r.n_tokens, r.n_types) == (len(toks), len(set(toks)))
        assert r.ttr == pytest.approx(len(set(toks)) / len(toks), abs=1e-6)
        assert r.root_ttr == pytest.approx(
            len(set(toks)) / math.sqrt(len(toks)), abs=1e-6
        )
        assert 0 < r.ttr <= 1
