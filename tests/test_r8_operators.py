"""Round-8 operator semantics + plan shapes: quality tiering without
a global sort, per-source dup-rate math, temporal embargo boundaries,
int8 quantization error bounds, and the bucketed co-located join
demonstration (shuffle-free equi-join via bucketing — the 100 TB
pattern SCALE.md documents)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark import registry
from api_weather_kafka_clickhouse_spark.plans import checks
from api_weather_kafka_clickhouse_spark.tables import load

SPECS = registry.all_specs()


# ------------------------------------------------ quality_tiers_decile


def test_quality_tiers_cover_corpus_and_order_by_tokens(spark, sf_dir):
    rows = {r.tier: r for r in SPECS["quality_tiers_decile"].fn(spark, sf_dir).collect()}
    total = load(spark, "documents", sf_dir).count()
    assert sum(r.n_docs for r in rows.values()) == total  # a partition of the corpus
    tiers = sorted(rows)
    assert tiers[0] >= 1 and tiers[-1] <= 10
    # tiers are ordered by the quality signal: each tier's max token
    # count never exceeds the next tier's min
    for lo, hi in zip(tiers, tiers[1:]):
        assert rows[lo].max_tokens <= rows[hi].min_tokens, (lo, hi)


def test_quality_tiers_plan_has_no_global_sort(spark, sf_dir):
    """The whole point vs ntile(): boundaries broadcast, docs bucket
    themselves — no single-partition window, no global sort."""
    df = SPECS["quality_tiers_decile"].fn(spark, sf_dir)
    plan = checks.formatted_plan(df)
    assert "Window" not in plan, "tiering must not plan a window"
    # the 9 boundaries attach as a one-row scalar broadcast (the
    # sanctioned tf-idf pattern), never an unbounded nested loop
    assert not checks.unbounded_nested_loop_count(df)
    assert checks.partial_aggregate_count(df) >= 1


# ------------------------------------------------ dedup_rate_by_source


def test_dup_rate_matches_direct_distinct(spark, sf_dir):
    out = {r.source: r for r in SPECS["dedup_rate_by_source"].fn(spark, sf_dir).collect()}
    d = load(spark, "documents", sf_dir)
    direct = {
        r.source: (r.n, r.u)
        for r in d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("text").alias("u"))
        .collect()
    }
    for src, (n, u) in direct.items():
        assert out[src].n_docs == n and out[src].n_unique == u
        assert out[src].dup_rate == pytest.approx(1 - u / n, abs=1e-6)


# ---------------------------------------------- split_temporal_embargo


def test_temporal_embargo_boundaries(spark, sf_dir):
    df = SPECS["split_temporal_embargo"].fn(spark, sf_dir)
    e = load(spark, "events", sf_dir).select("event_id", "ts")
    joined = df.join(e, "event_id")
    bad = joined.filter(
        ((F.col("split") == "train") & (F.col("ts") >= "2024-01-22"))
        | (
            (F.col("split") == "embargo")
            & ((F.col("ts") < "2024-01-22") | (F.col("ts") >= "2024-01-24"))
        )
        | ((F.col("split") == "test") & (F.col("ts") < "2024-01-24"))
    )
    assert bad.count() == 0
    counts = {r.split: r.n for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "embargo", "test"}  # all three non-empty
    assert sum(counts.values()) == e.count()


def test_temporal_embargo_is_pure_scan(spark, sf_dir):
    df = SPECS["split_temporal_embargo"].fn(spark, sf_dir)
    assert checks.shuffle_count(df) == 0
    assert all("props" not in s for s in checks.scan_read_schema(df))


# --------------------------------------------- embedding_quantize_int8


def test_quantize_int8_reconstruction_error_bound(spark, sf_dir):
    """Dequantized values must sit within half a quantization step of
    the originals (|x - code/scale| <= 0.5/scale), codes within
    [-127, 127]."""
    out = SPECS["embedding_quantize_int8"].fn(spark, sf_dir).limit(50).collect()
    orig = {
        r.vec_id: list(r.embedding)
        for r in load(spark, "embeddings", sf_dir)
        .filter(F.col("vec_id").isin([r.vec_id for r in out]))
        .collect()
    }
    assert out
    for r in out:
        codes = [int(c) for c in r.codes.split(",")]
        assert all(-127 <= c <= 127 for c in codes)
        assert max(abs(c) for c in codes) == 127  # max element saturates
        scale = r.scale_q
        for x, c in zip(orig[r.vec_id], codes):
            assert abs(x - c / scale) <= 0.5 / scale + 1e-9, (r.vec_id, x, c)


def test_quantize_int8_is_shuffle_free(spark, sf_dir):
    df = SPECS["embedding_quantize_int8"].fn(spark, sf_dir)
    assert checks.shuffle_count(df) == 0
    assert all("label" not in s for s in checks.scan_read_schema(df))


# ------------------------------------------- bucketed co-located join


def test_bucketed_join_plans_without_shuffle(spark, sf_dir, tmp_path):
    """The 100 TB co-location pattern: two tables bucketed+sorted on
    the join key equi-join with ZERO exchanges — the physical proof
    behind SCALE.md's bucketing guidance. (The registered query
    battery reads driver parquet, which cannot carry bucket metadata,
    so this lives as a plan test over warehouse tables.)"""
    o = load(spark, "orders", sf_dir).select("o_orderkey", "o_custkey", "o_totalprice")
    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    spark.sql("CREATE DATABASE IF NOT EXISTS r8bucket")
    try:
        (
            o.write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("r8bucket.orders_b")
        )
        (
            li.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("r8bucket.lineitem_b")
        )
        ob = spark.table("r8bucket.orders_b")
        lb = spark.table("r8bucket.lineitem_b")
        # pin the sort-merge path: at test scale AQE would broadcast
        # the tiny side, hiding exactly the shuffle this test proves
        # bucketing removes (at 100 TB neither side broadcasts)
        bcast_key = "spark.sql.autoBroadcastJoinThreshold"
        prev = spark.conf.get(bcast_key)
        spark.conf.set(bcast_key, "-1")
        try:
            joined = ob.join(
                lb, ob["o_orderkey"] == lb["l_orderkey"]
            ).groupBy("o_custkey").agg(F.sum("l_quantity").alias("qty"))
            # bucket join: the join itself introduces no exchange; the
            # only shuffle is the final groupBy on a different key
            n_shuffles = checks.shuffle_count(joined)
            assert n_shuffles <= 1, checks.formatted_plan(joined)
            assert "SortMergeJoin" in checks.formatted_plan(joined)
            # and it still computes the right thing
            expected = (
                o.join(li, o["o_orderkey"] == li["l_orderkey"])
                .groupBy("o_custkey")
                .agg(F.sum("l_quantity").alias("qty"))
            )
            assert joined.count() == expected.count()
        finally:
            spark.conf.set(bcast_key, prev)
    finally:
        spark.sql("DROP DATABASE IF EXISTS r8bucket CASCADE")


# ------------------------------------------------------ join_salted_skew


def test_salted_join_shuffles_on_key_plus_salt(spark, sf_dir):
    """The whole point: the join exchange hash-partitions on BOTH the
    skew key and the salt (spreading the hot key), and the merge hint
    holds the sort-merge path against the tiny replicated dim."""
    df = SPECS["join_salted_skew"].fn(spark, sf_dir)
    plan = checks.formatted_plan(df)
    assert "SortMergeJoin" in plan, plan
    import re

    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("o_orderstatus" in p and "salt" in p for p in parts), parts


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting changes partitioning, never matching: row count equals
    the fact table (every order matches its status row exactly once)."""
    df = SPECS["join_salted_skew"].fn(spark, sf_dir)
    assert df.count() == load(spark, "orders", sf_dir).count()


# -------------------------------- events_rolling_dau / conversion latency


def test_rolling_dau_window_semantics(spark, sf_dir):
    """dau7 must equal the direct 'distinct users in [d-6, d]' count
    for every day, and dau <= dau7 always."""
    rows = {r.day: r for r in SPECS["events_rolling_dau"].fn(spark, sf_dir).collect()}
    e = load(spark, "events", sf_dir)
    d = e.select(F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id").distinct()
    pairs = {(r.day, r.user_id) for r in d.collect()}
    days = sorted({p[0] for p in pairs})
    assert set(rows) == set(days)
    import datetime

    for day in days:
        direct = {
            u for (dd, u) in pairs if day - datetime.timedelta(days=6) <= dd <= day
        }
        assert rows[day].dau7 == len(direct), day
        assert rows[day].dau <= rows[day].dau7


def test_conversion_latency_nonnegative_and_bounded(spark, sf_dir):
    r = SPECS["events_conversion_latency"].fn(spark, sf_dir).collect()[0]
    assert 0 < r.n_converted <= r.n_viewers
    assert 0 < r.conv_rate <= 1
    assert 0 <= r.p50_lat_us <= r.p90_lat_us


def test_rolling_dau_plan_is_linear_not_range_join(spark, sf_dir):
    """The contribution explode must aggregate with partial combine
    and never plan a nested-loop range join."""
    df = SPECS["events_rolling_dau"].fn(spark, sf_dir)
    assert checks.partial_aggregate_count(df) >= 1
    assert not checks.unbounded_nested_loop_count(df)


# ------------------------------------------------- dedup_soft_weights


def test_soft_weights_mass_and_consistency(spark, sf_dir):
    """Weights must satisfy the SoftDeDup invariant: each cluster
    contributes total weight exactly 1.0 (csize * 1/csize), singleton
    docs weigh 1.0, and cluster membership matches the hard-dedup
    labels."""
    out = SPECS["dedup_soft_weights"].fn(spark, sf_dir)
    rows = out.collect()
    labels = {
        r.doc_id: r.canonical_id
        for r in SPECS["dedup_cluster_canonical"].fn(spark, sf_dir).collect()
    }
    import collections

    csize = collections.Counter(labels.values())
    for r in rows:
        if r.doc_id in labels:
            assert r.cluster_size == csize[labels[r.doc_id]], r
        else:
            assert r.cluster_size == 1 and r.weight == 1.0, r
    # expected total mass = number of distinct "information units"
    n_clusters = len(csize)
    n_singletons = sum(1 for r in rows if r.doc_id not in labels)
    total_w = sum(r.weight for r in rows)
    assert total_w == pytest.approx(n_clusters + n_singletons, abs=1e-3)


# ------------------------------------------------ events_user_streaks


def test_user_streaks_vs_python_reference(spark, sf_dir):
    """Island arithmetic checked against a direct python streak scan
    for every user."""
    out = {r.user_id: r for r in SPECS["events_user_streaks"].fn(spark, sf_dir).collect()}
    e = load(spark, "events", sf_dir)
    d = e.select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")).distinct()
    by_user = {}
    for r in d.collect():
        by_user.setdefault(r.user_id, set()).add(r.day)
    import datetime

    one = datetime.timedelta(days=1)
    for uid, days in by_user.items():
        streaks = []
        for day in sorted(days):
            if streaks and day - one in days:
                continue  # not a streak start
            ln, cur = 1, day
            while cur + one in days:
                ln, cur = ln + 1, cur + one
            streaks.append(ln)
        r = out[uid]
        assert r.n_active_days == len(days)
        assert r.n_streaks == len(streaks)
        assert r.max_streak == max(streaks)


# -------------------------------------------- sample_epochs_materialize


def test_epoch_materialization_copy_counts(spark, sf_dir):
    """Copies per doc = floor(w) or floor(w)+1, copy_idx is dense
    1..n, and the realized mean epoch count sits near E[copies] = w
    over the corpus."""
    rows = SPECS["sample_epochs_materialize"].fn(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    total_copies = 0
    for doc, rs in by_doc.items():
        n = rs[0].n_copies
        assert len(rs) == n
        assert sorted(r.copy_idx for r in rs) == list(range(1, n + 1))
        w = rs[0].w
        assert n in (int(w), int(w) + 1), (doc, w, n)
        total_copies += n
    d = load(spark, "documents", sf_dir)
    expected = d.agg(F.sum(F.col("n_chars").cast("double") / 200)).collect()[0][0]
    # deterministic coin, so the realization is fixed; tolerance is
    # the Bernoulli-sum concentration, generous at corpus size
    assert abs(total_copies - expected) / expected < 0.05


def test_epoch_materialization_is_shuffle_free(spark, sf_dir):
    df = SPECS["sample_epochs_materialize"].fn(spark, sf_dir)
    assert checks.shuffle_count(df) == 0
    assert all("text" not in s for s in checks.scan_read_schema(df))


# -------------------------------------------- text_source_divergence


def test_source_divergence_vs_scipy_free_reference(spark, sf_dir):
    """chi2 recomputed directly in python over the full contingency
    table (including absent cells) — validates the analytic
    absent-cell folding."""
    out = {r.source: r for r in SPECS["text_source_divergence"].fn(spark, sf_dir).collect()}
    d = load(spark, "documents", sf_dir).select("source", "text").collect()
    import collections

    obs = collections.Counter()
    for r in d:
        for t in r.text.split(" "):
            obs[(r.source, t)] += 1
    n_s = collections.Counter()
    n_t = collections.Counter()
    for (s, t), o in obs.items():
        n_s[s] += o
        n_t[t] += o
    grand = sum(n_s.values())
    for s in n_s:
        chi2 = 0.0
        for t, nt in n_t.items():
            exp = n_s[s] * nt / grand
            o = obs.get((s, t), 0)
            chi2 += (o - exp) ** 2 / exp
        assert out[s].chi2 == pytest.approx(chi2, rel=1e-3), s
        assert out[s].n_tokens == n_s[s]


# --------------------------------------------- text_inverted_index


def test_inverted_index_rank_limit_plan_and_postings_head(spark, sf_dir):
    """Posting-list skew containment: the head is built through a
    rank-limit window that Spark must execute as WindowGroupLimit
    (<= K rows of state per token), and df/cf stay exact while the
    materialized postings are capped."""
    from api_weather_kafka_clickhouse_spark.operators.text_analysis import (
        IDX_MIN_DF,
        IDX_POSTINGS_CAP,
    )

    df = SPECS["text_inverted_index"].fn(spark, sf_dir)
    plan = checks.formatted_plan(df)
    assert "WindowGroupLimit" in plan, "rank-limit must push into the window"

    out = {r.token: r for r in df.collect()}
    assert out, "df>=MIN_DF tokens must exist at this SF"
    docs = load(spark, "documents", sf_dir).select("doc_id", "text").collect()
    import collections

    postings = collections.defaultdict(set)
    cf = collections.Counter()
    for r in docs:
        for t in r.text.split(" "):
            postings[t].add(r.doc_id)
            cf[t] += 1
    for token, r in out.items():
        assert r.df == len(postings[token]) and r.df >= IDX_MIN_DF
        assert r.cf == cf[token]
        head = [int(x) for x in r.postings_head.split(",")]
        assert head == sorted(postings[token])[:IDX_POSTINGS_CAP]


# -------------------------------------------- copurchase_pairs_lift


def test_copurchase_lift_matches_direct_probability_math(spark, sf_dir):
    out = SPECS["copurchase_pairs_lift"].fn(spark, sf_dir)
    rows = out.collect()
    assert rows, "some pair must clear MIN_SUPPORT"
    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey").distinct()
    baskets = {}
    for r in li.collect():
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    n_baskets = len(baskets)
    import collections

    item = collections.Counter()
    pair = collections.Counter()
    for parts in baskets.values():
        for p in parts:
            item[p] += 1
        for a in parts:
            for b in parts:
                if a < b:
                    pair[(a, b)] += 1
    for r in rows:
        assert r.n_ab == pair[(r.part_a, r.part_b)]
        assert (r.n_a, r.n_b) == (item[r.part_a], item[r.part_b])
        assert r.lift == pytest.approx(
            round(r.n_ab * n_baskets / (r.n_a * r.n_b), 6), abs=1e-9
        )


def test_copurchase_counts_attach_by_broadcast(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.plans.stage import lazy_plans

    with lazy_plans():
        df = SPECS["copurchase_pairs_lift"].fn(spark, sf_dir)
        assert checks.has_broadcast_join(df)
        assert not checks.unbounded_nested_loop_count(df)


# ---------------------------------------- quality_quantile_normalize


def test_quantile_normalize_equals_naive_window_and_avoids_doc_window(spark, sf_dir):
    """Hash-equality vs the flat percent_rank window, and the plan
    must window only over the histogram (broadcast join back)."""
    from pyspark.sql import Window

    out = SPECS["quality_quantile_normalize"].fn(spark, sf_dir)
    d = load(spark, "documents", sf_dir)
    naive = d.select(
        "doc_id",
        F.round(
            F.percent_rank().over(Window.partitionBy("source").orderBy("n_chars")), 6
        ).alias("want"),
    )
    joined = out.join(naive, "doc_id")
    assert joined.filter(F.col("pct_rank") != F.col("want")).count() == 0
    assert checks.has_broadcast_join(out)


# ------------------------------------------------- layout_zorder_key


def test_zorder_key_is_invertible_and_shuffle_free(spark, sf_dir):
    df = SPECS["layout_zorder_key"].fn(spark, sf_dir)
    assert checks.shuffle_count(df) == 0, "layout key must be scan-speed codegen"
    for r in df.limit(200).collect():
        p = s = 0
        for i in range(16):
            p |= ((r.zkey >> (2 * i)) & 1) << i
            s |= ((r.zkey >> (2 * i + 1)) & 1) << i
        assert (p, s) == (r.l_partkey & 0xFFFF, r.l_suppkey & 0xFFFF)


# ------------------------------------------------------ graph_triangles


def test_triangles_match_bruteforce_and_are_normalized(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.affinity import TRI_MIN_SUPPORT

    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey").distinct()
    baskets: dict[int, set[int]] = {}
    for r in li.collect():
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    import collections
    import itertools

    support = collections.Counter()
    for parts in baskets.values():
        for a, b in itertools.combinations(sorted(parts), 2):
            support[(a, b)] += 1
    edges = {e for e, n in support.items() if n >= TRI_MIN_SUPPORT}
    adj: dict[int, set[int]] = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = set()
    for a, b in edges:
        for c in adj[a] & adj[b]:
            want.add(tuple(sorted((a, b, c))))
    got = {(r.part_a, r.part_b, r.part_c) for r in SPECS["graph_triangles"].fn(spark, sf_dir).collect()}
    assert all(a < b < c for a, b, c in got)
    assert got == want


def test_triangles_degree_table_broadcasts(spark, sf_dir):
    # lazy_plans: the operator stage-checkpoints its result (the
    # oriented edge list feeds three join arms), so the composed plan
    # is only inspectable unmaterialized
    from api_weather_kafka_clickhouse_spark.plans.stage import lazy_plans

    with lazy_plans():
        df = SPECS["graph_triangles"].fn(spark, sf_dir)
        assert checks.has_broadcast_join(df)
        assert not checks.unbounded_nested_loop_count(df)


# ------------------------------------------------------ scd2_intervals


def test_scd2_intervals_tile_each_user_history(spark, sf_dir):
    rows = SPECS["scd2_intervals"].fn(spark, sf_dir).collect()
    e = load(spark, "events", sf_dir)
    n_events = e.count()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert sum(r.n_events for r in rows) == n_events
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r.version)
        assert [r.version for r in ivs] == list(range(1, len(ivs) + 1))
        # exactly one open (current) interval, and it is the last
        opens = [r for r in ivs if r.valid_to is None]
        assert opens == [ivs[-1]]
        for cur, nxt in zip(ivs, ivs[1:]):
            assert cur.valid_to == nxt.valid_from  # intervals tile, no gaps
            assert cur.state != nxt.state  # islands are maximal


def test_scd2_plan_shares_one_user_shuffle(spark, sf_dir):
    df = SPECS["scd2_intervals"].fn(spark, sf_dir)
    # windows + island agg all key on user_id: a single exchange
    # (plus AQE reads) must suffice — per-user history never re-shuffles
    assert checks.shuffle_count(df) <= 2


# ------------------------------------- events_attribution_last_touch


def test_attribution_matches_replayed_history(spark, sf_dir):
    e = load(spark, "events", sf_dir).collect()
    e.sort(key=lambda r: (r.user_id, r.ts, r.event_id))
    want = {}
    last_touch: dict[int, tuple] = {}
    for r in e:
        if r.event_type == "purchase":
            tid, ttype = last_touch.get(r.user_id, (None, "none"))
            want[r.event_id] = (tid, ttype)
        if r.event_type in ("click", "view"):
            last_touch[r.user_id] = (r.event_id, r.event_type)
    out = SPECS["events_attribution_last_touch"].fn(spark, sf_dir).collect()
    assert len(out) == len(want)
    for r in out:
        assert (r.touch_event_id, r.touch_type) == want[r.purchase_id], r


# ----------------------------------------------- profile_table_stats


def test_profile_stats_match_per_column_truth(spark, sf_dir):
    out = {r.col_name: r for r in SPECS["profile_table_stats"].fn(spark, sf_dir).collect()}
    o = load(spark, "orders", sf_dir)
    assert set(out) == set(o.columns)
    for col in o.columns:
        truth_ndv = o.select(col).distinct().count()
        truth_nulls = o.filter(F.col(col).isNull()).count()
        assert (out[col].ndv, out[col].n_nulls) == (truth_ndv, truth_nulls), col
    # spot value rendering: status is a plain string min/max
    st = out["o_orderstatus"]
    lo, hi = o.agg(F.min("o_orderstatus"), F.max("o_orderstatus")).first()
    assert (st.min_repr, st.max_repr) == (lo, hi)


def test_profile_stats_is_one_scan(spark, sf_dir):
    plan = checks.formatted_plan(SPECS["profile_table_stats"].fn(spark, sf_dir))
    # formatted mode prints each node twice (tree line + detail
    # block), so ONE scan node == exactly 2 occurrences
    assert plan.count("Scan parquet") == 2, "profiler must read the table once"


# ------------------------------------------------ time_downsample_m4


def test_m4_extremes_are_real_rows_with_deterministic_ties(spark, sf_dir):
    e = load(spark, "events", sf_dir).collect()
    import collections

    buckets = collections.defaultdict(list)
    for r in e:
        buckets[r.ts.replace(minute=0, second=0, microsecond=0)].append(r)
    out = SPECS["time_downsample_m4"].fn(spark, sf_dir).collect()
    assert len(out) == len(buckets)
    for row in out:
        rows = buckets[row.bucket]
        assert row.n == len(rows)
        assert row.ts_first == min(r.ts for r in rows)
        assert row.ts_last == max(r.ts for r in rows)
        vmin = min(r.value for r in rows)
        vmax = max(r.value for r in rows)
        assert (row.v_min, row.v_max) == (vmin, vmax)
        # representative ids: min event_id among value-ties
        assert row.id_vmin == min(r.event_id for r in rows if r.value == vmin)
        assert row.id_vmax == min(r.event_id for r in rows if r.value == vmax)


# ------------------------------------------------ pareto_revenue_share


def test_pareto_shares_are_cumulative_and_stop_at_half(spark, sf_dir):
    rows = sorted(
        SPECS["pareto_revenue_share"].fn(spark, sf_dir).collect(), key=lambda r: r.rk
    )
    assert rows, "top-half set must be non-empty"
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    assert all(a.cum_share <= b.cum_share for a, b in zip(rows, rows[1:]))
    assert all(a.revenue >= b.revenue for a, b in zip(rows, rows[1:]))
    assert rows[-1].cum_share <= 0.5
    # far fewer parts than the dimension carry half the revenue
    n_parts = load(spark, "lineitem", sf_dir).select("l_partkey").distinct().count()
    assert len(rows) < n_parts


def test_pareto_window_runs_on_the_aggregate_not_the_facts(spark, sf_dir):
    plan = checks.formatted_plan(SPECS["pareto_revenue_share"].fn(spark, sf_dir))
    # partial aggregation must collapse facts before the global window
    assert checks.partial_aggregate_count(
        SPECS["pareto_revenue_share"].fn(spark, sf_dir)
    ) >= 1
    assert "Window" in plan


# ------------------------------------------------ customer_order_gaps


def test_order_gaps_match_replayed_per_customer_history(spark, sf_dir):
    o = load(spark, "orders", sf_dir).collect()
    import collections

    hist = collections.defaultdict(list)
    for r in o:
        hist[r.o_custkey].append((r.o_orderdate, r.o_orderkey))
    want = {}
    for cust, orders in hist.items():
        if len(orders) < 2:
            continue
        orders.sort()
        gaps = [
            (b[0].date() - a[0].date()).days for a, b in zip(orders, orders[1:])
        ]
        want[cust] = (len(orders), max(gaps), round(sum(gaps) / len(gaps), 6))
    out = SPECS["customer_order_gaps"].fn(spark, sf_dir).collect()
    assert len(out) == len(want)
    for r in out:
        n, mx, avg = want[r.o_custkey]
        assert (r.n_orders, r.max_gap_days) == (n, mx)
        assert r.avg_gap_days == pytest.approx(avg, abs=1e-9)


def test_zorder_layout_skips_files_on_both_dimensions(spark, tmp_path):
    """The layout proof behind layout_zorder_key: range-partitioning
    on zkey yields files whose parquet footer [min,max] prune point
    probes on BOTH interleaved dimensions, where a single-column sort
    prunes one dimension perfectly and the other not at all. Suppkey
    pruning is the weaker side at this SF (suppkey spans ~7 bits vs
    partkey's ~11, and the z-curve orders by the wider dim's high
    bits first); with comparable cardinalities both prune ~sqrt."""
    import glob

    import pyarrow.parquet as pq

    df = SPECS["layout_zorder_key"].fn(spark, "/root/testdata/sf0.01")
    n_files = 64
    layouts = {"partkey": "l_partkey", "zorder": "zkey"}
    for name, col in layouts.items():
        (
            df.repartitionByRange(n_files, F.col(col))
            .sortWithinPartitions(col)
            .write.mode("overwrite")
            .parquet(str(tmp_path / name))
        )

    def files_hit(name, col, probe):
        hit = total = 0
        for f in glob.glob(str(tmp_path / name / "part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = [md.schema.column(i).name for i in range(md.num_columns)].index(col)
            mn = mx = None
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(idx).statistics
                mn = s.min if mn is None else min(mn, s.min)
                mx = s.max if mx is None else max(mx, s.max)
            total += 1
            hit += mn <= probe <= mx
        return hit, total

    for probe in (100, 500, 1500):
        hit, total = files_hit("partkey", "l_partkey", probe)
        assert hit <= 2, "single sort must prune its own dim"
        hit, total = files_hit("zorder", "l_partkey", probe)
        assert hit <= total // 8, (hit, total)  # z prunes partkey hard
    for probe in (10, 42, 77):
        hit, total = files_hit("partkey", "l_suppkey", probe)
        assert hit == total, "single partkey sort cannot prune suppkey"
        hit, total = files_hit("zorder", "l_suppkey", probe)
        assert hit <= (total * 7) // 8, (hit, total)  # z still prunes suppkey


# ------------------------------------------------- join_point_in_time


def test_pit_join_attributes_each_purchase_to_its_own_era(spark, sf_dir):
    """Every purchase joins exactly one dimension version, the version
    valid at the purchase timestamp (replay the per-user timeline)."""
    out = SPECS["join_point_in_time"].fn(spark, sf_dir).collect()
    e = load(spark, "events", sf_dir).collect()
    e.sort(key=lambda r: (r.user_id, r.ts, r.event_id))
    import collections

    state_at = {}
    cur = collections.defaultdict(lambda: (None, 0))  # user -> (state, version)
    for r in e:
        st, v = cur[r.user_id]
        if st != r.event_type:
            cur[r.user_id] = (r.event_type, v + 1)
        if r.event_type == "purchase":
            state_at[r.event_id] = cur[r.user_id]
    assert len(out) == len(state_at)  # exactly one match per purchase
    for r in out:
        assert (r.state_at_purchase, r.dim_version) == state_at[r.purchase_id]


# --------------------------------------------- window_running_distinct


def test_running_distinct_counts_match_replay(spark, sf_dir):
    out = {r.event_id: r.distinct_types_so_far for r in SPECS["window_running_distinct"].fn(spark, sf_dir).collect()}
    e = load(spark, "events", sf_dir).collect()
    e.sort(key=lambda r: (r.user_id, r.ts, r.event_id))
    import collections

    seen = collections.defaultdict(set)
    for r in e:
        seen[r.user_id].add(r.event_type)
        assert out[r.event_id] == len(seen[r.user_id]), r.event_id


# ---------------------------------------------- intervals_concurrency


def test_concurrency_curve_sweeps_to_zero_and_hits_true_peak(spark, sf_dir):
    rows = sorted(SPECS["intervals_concurrency"].fn(spark, sf_dir).collect(), key=lambda r: r.t)
    # cumulative consistency and the conservation law: the curve ends at 0
    running = 0
    peak = 0
    for r in rows:
        running += r.delta
        assert r.concurrent == running
        peak = max(peak, running)
    assert running == 0
    assert peak >= 1
    # peak equals the true max overlap of the (user, day) spans
    iv = (
        load(spark, "events", sf_dir)
        .groupBy("user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"))
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
        .collect()
    )
    events = sorted([(r.s, 1) for r in iv] + [(r.e, -1) for r in iv])
    want_peak, run = 0, 0
    for _, d in events:
        run += d
        want_peak = max(want_peak, run)
    assert peak == want_peak


# --------------------------------------------- agg_regression_per_group


def test_regression_matches_numpy_least_squares(spark, sf_dir):
    import numpy as np

    out = {r.event_type: r for r in SPECS["agg_regression_per_group"].fn(spark, sf_dir).collect()}
    e = load(spark, "events", sf_dir).filter(F.col("ts").isNotNull()).collect()
    import collections

    from api_weather_kafka_clickhouse_spark.operators.aggregations import REGR_X0

    groups = collections.defaultdict(lambda: ([], []))
    for r in e:
        xs, ys = groups[r.event_type]
        xs.append(int(r.ts.timestamp()) - REGR_X0)
        ys.append(r.value)
    assert set(out) == set(groups)
    for t, (xs, ys) in groups.items():
        slope, intercept = np.polyfit(np.array(xs, dtype=float), np.array(ys, dtype=float), 1)
        assert out[t].n == len(xs)
        assert out[t].slope_per_sec == pytest.approx(slope, rel=1e-6, abs=1e-12)
        assert out[t].intercept_at_x0 == pytest.approx(intercept, rel=1e-6)


# ------------------------------------------- funnel_constrained_window


def test_constrained_funnel_matches_replay_and_bounds(spark, sf_dir):
    import collections
    import datetime

    from api_weather_kafka_clickhouse_spark.operators.aggregations import (
        FUNNEL_WINDOW_HOURS,
    )

    e = load(spark, "events", sf_dir).collect()
    t0 = {}
    for r in sorted(e, key=lambda r: r.ts):
        if r.event_type == "signup" and r.user_id not in t0:
            t0[r.user_id] = r.ts
    converted = set()
    lim = datetime.timedelta(hours=FUNNEL_WINDOW_HOURS)
    for r in e:
        if (
            r.event_type == "purchase"
            and r.user_id in t0
            and t0[r.user_id] < r.ts <= t0[r.user_id] + lim
        ):
            converted.add(r.user_id)
    want = collections.Counter()
    want_conv = collections.Counter()
    for u, t in t0.items():
        day = t.date()
        want[day] += 1
        if u in converted:
            want_conv[day] += 1
    out = SPECS["funnel_constrained_window"].fn(spark, sf_dir).collect()
    assert {r.cohort_day: r.n_signups for r in out} == dict(want)
    for r in out:
        assert r.n_converted == want_conv[r.cohort_day]
        assert 0.0 <= r.conversion_rate <= 1.0


# --------------------------------------------- plan shapes, r8 windows


def test_new_window_operators_plan_minimal_shuffles(spark, sf_dir):
    """Pin the plan shapes the docstrings promise: attribution's two
    IGNORE-NULLS columns share ONE window (one shuffle); scd2's three
    windows + island aggregate reuse ONE user_id exchange; M4 is a
    pure aggregate with a map-side partial."""
    import re

    df = SPECS["events_attribution_last_touch"].fn(spark, sf_dir)
    plan = checks.formatted_plan(df)
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1
    assert checks.shuffle_count(df) == 1

    df = SPECS["scd2_intervals"].fn(spark, sf_dir)
    assert checks.shuffle_count(df) == 1, "all windows must reuse the user_id exchange"

    df = SPECS["time_downsample_m4"].fn(spark, sf_dir)
    assert checks.shuffle_count(df) == 1
    assert checks.partial_aggregate_count(df) >= 1


# ----------------------------------------------- customer_rfm_segments


def test_rfm_segments_partition_customers_and_flags_agree(spark, sf_dir):
    rows = SPECS["customer_rfm_segments"].fn(spark, sf_dir).collect()
    n_cust = load(spark, "orders", sf_dir).select("o_custkey").distinct().count()
    assert len(rows) == n_cust  # every customer, exactly once
    for r in rows:
        want = (
            ("R" if r.recent else "-")
            + ("F" if r.frequent else "-")
            + ("M" if r.high_value else "-")
        )
        assert r.segment == want
    assert len({r.segment for r in rows}) > 1, "thresholds must discriminate"


def test_rfm_is_one_aggregate_no_window(spark, sf_dir):
    df = SPECS["customer_rfm_segments"].fn(spark, sf_dir)
    assert "Window" not in checks.formatted_plan(df)
    assert checks.shuffle_count(df) == 1
    assert checks.partial_aggregate_count(df) >= 1


# --------------------------------------------- graph_common_neighbors


def test_common_neighbors_math_and_order(spark, sf_dir):
    rows = SPECS["graph_common_neighbors"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    for r in rows:
        assert r.supp_a < r.supp_b
        assert 0 < r.cn <= min(r.deg_a, r.deg_b)
        union = r.deg_a + r.deg_b - r.cn
        assert r.jaccard == round(r.cn / union, 6)
    # the cut is the top of a total order on cn
    cns = [r.cn for r in sorted(rows, key=lambda r: (-r.cn, r.supp_a, r.supp_b))]
    assert cns == sorted(cns, reverse=True)


def test_common_neighbors_plan_broadcasts_degrees(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.plans.stage import lazy_plans

    with lazy_plans():
        df = SPECS["graph_common_neighbors"].fn(spark, sf_dir)
        assert checks.has_broadcast_join(df)
        assert not checks.has_cartesian(df)
