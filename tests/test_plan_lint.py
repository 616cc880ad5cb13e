"""Registry-wide physical-plan lint: EVERY registered query's plan is
swept for the two shapes that do not survive 100 TB — unbounded
nested-loop/cartesian joins and row-at-a-time Python UDFs
(BatchEvalPython). test_plans.py proves plan properties for named
operators; this file guarantees no FUTURE registration quietly ships
either anti-pattern (the whitelist below is the complete sanctioned
set, each entry bounded by a dimension, never the corpus)."""

from __future__ import annotations

import pytest

from api_weather_kafka_clickhouse_spark import registry
from api_weather_kafka_clickhouse_spark.plans import checks
from api_weather_kafka_clickhouse_spark.plans.stage import lazy_plans

# Sanctioned nested-loop joins — every one has a broadcast build side
# bounded by a DIMENSION (query set / centroid count / 25-row nation /
# per-group count table), so the "loop" is k*n with small fixed k,
# never n^2. A new query landing here needs the same justification.
NESTED_LOOP_SANCTIONED = {
    # broadcast query vectors x corpus scan (non-equi vec_id <> cond):
    # build side = N_QUERIES rows
    "sim_topk_bruteforce": 1,
    # same query-set broadcast shape over the PACKED sign-bit words
    "embedding_binary_hamming": 1,
    "embedding_truncate_recall": 2,  # full-dim and truncated argmax passes
    # broadcast centroid/cell tables x corpus
    "sim_ivf_label": 1,
    "sim_ivf_kmeans": 1,
    # all-pairs embedding verify on the tiny vector table (the exact
    # baseline the LSH/IVF operators exist to replace at scale)
    "dedup_embedding_cosine": 1,
    # a DELIBERATE cross join (region x orderstatus combination grid)
    "join_cross_small": 1,
    # KS statistic: broadcast build = the per-group count row (2 rows)
    "stats_ks_test": 1,
    # RRF's vector half: the single query embedding (vec_id = const,
    # 1 row by data) broadcasts against the corpus — same shape as
    # sim_topk_bruteforce but the build is a filter, not an aggregate,
    # so the keys=[] exemption cannot see it
    "sim_hybrid_rrf": 1,
    # all pairs among the first 100 ids (deterministic id-bounded
    # sample; vec_id < k filter broadcasts) — the geometry diagnostic
    "embedding_cosine_histogram": 1,
    # composes sim_ann_lsh (its broadcast query set joins bands
    # non-equi on vec_id <>) and sim_topk_bruteforce (query broadcast
    # x corpus) — inherits both sanctioned query-set loops
    "sim_recall_report": 2,
    # the |types|^2 pair grid (25 combos on the type DIMENSION; a < b
    # is inherently non-equi — Catalyst folds synthetic equi-keys).
    # The lazy plan re-derives the grid once per union leg per
    # consumer (4x); at runtime the persisted membership collapses it.
    "agg_hll_set_algebra": 4,
    # all-pairs baseline on the 25-row nation dim — fuzzy_match_blocked
    # is its scale twin and equi-joins on the band key (plan-asserted
    # in test_plans.py)
    "fuzzy_match_levenshtein": 1,
    # the dim side replicates across a 16-value salt-range literal via
    # cross join — the replication factor is the salt CONSTANT
    "join_salted_skew": 1,
    # Poisson bootstrap: the corpus replicates across the B=64
    # resample-id range (the bootstrap's honest constant-factor cost,
    # same shape as join_salted_skew's salt range), and the final
    # 1-row assembly joins the full-mean scalar with ONE combined
    # ci_lo/ci_hi frame (round-15: both order statistics pivot out of
    # a single pass over the ranked means; the CI build is a FILTER
    # rank IN (lo, hi), so the keys=[] aggregate exemption cannot see
    # it — RRF's caveat)
    "stats_bootstrap_ci": 3,
    # the converged flag: two 1-row count aggregates cross-joined,
    # then broadcast onto the survivor rows — the aggregate exemption
    # sees the first join's build but not a build that is itself a
    # join of two scalar aggregates
    "graph_kcore": 1,
    # the median-day reference: a 1-row order-statistic build
    # (rank = (n+1)//2 FILTER, not a keys=[] aggregate — RRF's
    # caveat) broadcast onto the calendar-sized day table
    "stats_runs_test": 1,
    # two-stage cascade: inherits embedding_binary_hamming's
    # broadcast query set x corpus (non-equi vec_id <> cond) — build
    # side = N_QUERIES rows, a query-dimension constant
    "sim_cascade_rerank": 1,
    # NDCG eval ranks the same broadcast-query-set x corpus scan as
    # sim_topk_bruteforce (non-equi vec_id <> cond; build side =
    # N_QUERIES rows)
    "sim_ndcg_eval": 1,
    # the 68-row literal cos/sin coefficient table broadcasts against
    # the day-bucketed series with join key r == t % p (an expression
    # of BOTH sides, so Catalyst cannot extract an equi-key); 68
    # predicate tests per calendar row is constant work — the
    # dimension here is the candidate-period grid, fixed at authoring
    # time
    "time_dominant_period": 1,
    # the type-dimension series table self-pairs with a < b (5 rows
    # by data; inherently non-equi, the fuzzy_match_levenshtein
    # argument on an even smaller dimension)
    "time_dtw_distance": 1,
    # r12: DELIBERATE grid cross join — equivalence classes x the
    # sensitive-band cumulative table; the broadcast build is the
    # band DIMENSION (~12 rows by data, attribute-bounded)
    "privacy_t_closeness": 1,
    # r12: the same 68-row literal coefficient table as
    # time_dominant_period, joined r == t % p (expression of both
    # sides — no extractable equi-key); constant work per day row
    "time_spectral_entropy": 1,
    # r12: DELIBERATE grid cross join — the exponential mechanism's
    # 100-row literal candidate range broadcasts onto the (type,
    # bucket) histogram; the build is a CONSTANT fixed at authoring
    # time, the classic dimension-bounded shape
    "privacy_dp_quantiles": 1,
    # r13: the matrix profile's all-pairs stage — a CALENDAR-bounded
    # (~2,400-row) window-dimension self-join on the non-equi
    # exclusion zone |i-j| >= w; constant work regardless of fact
    # volume (time_dtw_distance's argument, one dimension up)
    "time_matrix_profile": 1,
}

# Queries allowed a BatchEvalPython node: Spark UDTFs execute row-wise
# by design; this entry exists to exercise the UDTF API surface (its
# registration says so), not as a hot-path operator.
BATCH_EVAL_SANCTIONED = {"text_sentence_udtf"}


@pytest.mark.slow
def test_every_registered_plan_is_scale_clean(spark, sf_dir):
    flagged: list[str] = []
    for name, spec in registry.all_specs().items():
        with lazy_plans():
            df = spec.fn(spark, sf_dir)
        plan = checks.simple_plan(df)
        nl = checks.unbounded_nested_loop_count(df)
        # upper bound, not equality: AQE/config shifts can legally plan
        # a sanctioned shape as a hash join instead (fewer loops is
        # always acceptable; more is never)
        allowed = NESTED_LOOP_SANCTIONED.get(name, 0)
        if nl > allowed:
            flagged.append(f"{name}: {nl} unbounded nested-loop joins (allowed {allowed})")
        if "BatchEvalPython" in plan and name not in BATCH_EVAL_SANCTIONED:
            flagged.append(f"{name}: row-at-a-time Python UDF (BatchEvalPython) in plan")
    assert not flagged, "\n".join(flagged)


def test_scalar_broadcast_exemption_sees_through_filter(spark, sf_dir):
    """q11/q22's HAVING-fraction shape: Catalyst inserts
    `Filter isnotnull(thr)` between the BroadcastExchange and the
    keys=[] aggregate; the exemption must look through it (and the
    negative fixtures in test_plans.py pin that real cartesians still
    count)."""
    for name in ("q11_important_stock", "q22_global_sales_opportunity"):
        df = registry.all_specs()[name].fn(spark, sf_dir)
        assert checks.unbounded_nested_loop_count(df) == 0, name
