"""Physical-plan property tests: the 100 TB design rules as
assertions (SURVEY.md §4) — pushdown, pruning, broadcast choice,
map-side partial aggregation, no cartesian products."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark import registry
from api_weather_kafka_clickhouse_spark.plans import checks
from api_weather_kafka_clickhouse_spark.tables import load

SPECS = registry.all_specs()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = SPECS["filter_project"].fn(spark, sf_dir)
    pushed = checks.pushed_filters(df)
    assert "event_type" in pushed and "value" in pushed, pushed


def test_column_pruning_narrow_projection(spark, sf_dir):
    df = SPECS["distinct_projection"].fn(spark, sf_dir)
    schemas = checks.scan_read_schema(df)
    assert schemas, "no parquet scan found"
    # only the two projected columns are read from a 6-column table
    assert all(
        set(s.split(",")[0].split(":")[0:1]) and "o_totalprice" not in s for s in schemas
    ), schemas


def test_dim_joins_are_broadcast(spark, sf_dir):
    for name in ("join_flagship_revenue", "join_broadcast_region", "in_subquery"):
        df = SPECS[name].fn(spark, sf_dir)
        assert checks.has_broadcast_join(df), f"{name} should broadcast its dims"


def test_no_cartesian_in_equi_joins(spark, sf_dir):
    for name in (
        "join_flagship_revenue",
        "join_semi",
        "join_anti",
        "join_interval_pairs",
        "fuzzy_match_blocked",
    ):
        df = SPECS[name].fn(spark, sf_dir)
        assert not checks.has_cartesian(df), f"{name} planned a cartesian product"
        if name == "fuzzy_match_blocked":
            # the whole point of the blocked twin: candidates come from
            # a band-key HASH join, never a nested-loop over all pairs
            assert "NestedLoop" not in checks.simple_plan(df), (
                "blocked fuzzy match must equi-join on the band key"
            )


def test_no_cartesian_in_checkpointing_operators(spark, sf_dir):
    """The dedup/text operators return an eager checkpoint re-read, so
    their registered plan is just a parquet FileScan — asserting on it
    would let a cartesian regression in the candidate/verify joins
    pass silently (round-3 advice). lazy_plans() makes eager_release
    hand back the real pre-checkpoint operator tree instead.

    "No cartesian" means no UNBOUNDED nested loop: the sanctioned
    1-row scalar broadcast (text_tfidf_topk attaches the corpus doc
    count via crossJoin(broadcast(count))) plans as
    BroadcastNestedLoopJoin and is exempt — the check requires the
    build side to be a keys=[] global aggregate."""
    from api_weather_kafka_clickhouse_spark.plans.stage import lazy_plans

    for name in (
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_embedding_lsh",
        "corpus_clean_pipeline",
        "text_tfidf_topk",
    ):
        with lazy_plans():
            df = SPECS[name].fn(spark, sf_dir)
        plan = checks.simple_plan(df)
        assert checks.unbounded_nested_loop_count(df) == 0, (
            f"{name} planned an unbounded cartesian/nested-loop join:\n{plan}"
        )
        # the lazy plan must be the real operator tree, not a scan of
        # an already-written checkpoint (which would re-vacuum the test)
        assert "Join" in plan or "HashAggregate" in plan, plan
        if name == "dedup_minhash_lsh":
            # candidate generation must equi-join on the BAND keys —
            # a bare "some Join exists" would pass on the wrong join
            # (e.g. only the verify join surviving a band regression)
            assert re.search(r"Join [^\n]*band_idx#\d+[^\n]*band_key#\d+", plan), (
                f"minhash candidates must hash-join on (band_idx, band_key):\n{plan}"
            )


def test_unbounded_nested_loop_check_catches_real_cartesians(spark, sf_dir):
    """Negative fixture: the scalar-broadcast exemption must not
    vacuum the check — a genuine all-pairs cross join (broadcast or
    not) is still flagged, while the sanctioned broadcast-of-1-row
    total is not."""
    n = load(spark, "nation", sf_dir)
    r = load(spark, "region", sf_dir)
    assert checks.unbounded_nested_loop_count(n.crossJoin(F.broadcast(r))) > 0, (
        "broadcast cross join of a multi-row table must be flagged"
    )
    assert checks.unbounded_nested_loop_count(n.crossJoin(r)) > 0, (
        "plain cross join must be flagged"
    )
    total = r.agg(F.count(F.lit(1)).alias("n"))
    assert checks.unbounded_nested_loop_count(n.crossJoin(F.broadcast(total))) == 0, (
        "1-row scalar broadcast is the sanctioned shape"
    )


def test_aggregates_have_partial_phase(spark, sf_dir):
    df = SPECS["q1_pricing_summary"].fn(spark, sf_dir)
    assert checks.partial_aggregate_count(df) >= 1


def test_topk_is_take_ordered(spark, sf_dir):
    df = SPECS["sort_limit_topk"].fn(spark, sf_dir)
    assert "TakeOrderedAndProject" in checks.simple_plan(df), (
        "global top-k should be a per-partition heap, not a full sort"
    )


def test_mm_frame_sample_prunes_payload(spark, sf_dir):
    df = SPECS["mm_frame_sample"].fn(spark, sf_dir)
    for s in checks.scan_read_schema(df):
        assert "payload" not in s, "frame sampling must not read payload bytes"


def test_flagship_join_shuffle_budget(spark, sf_dir):
    """The flagship 4-table join must stay within its shuffle budget:
    dims broadcast (no SortMergeJoin against a dimension) and at most
    one real data shuffle beyond broadcasts + the final aggregate."""
    df = SPECS["join_flagship_revenue"].fn(spark, sf_dir)
    plan = checks.simple_plan(df)
    broadcasts = plan.count("BroadcastHashJoin")
    assert broadcasts >= 2, plan
    # Exchange lines include BroadcastExchange; real shuffles are the rest
    real_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert real_shuffles <= 2, f"{real_shuffles} non-broadcast shuffles:\n{plan}"


# Shuffle budgets for headline queries: the number of non-broadcast
# Exchanges each plan is allowed. A regression above budget means a
# dim stopped broadcasting or an extra repartition crept in — the
# kind of change that is invisible at sf0.1 and catastrophic at 100 TB.
SHUFFLE_BUDGET = {
    "q1_pricing_summary": 1,     # one agg exchange
    "q6_forecast_revenue": 1,    # scan + single-row combine
    "q3_shipping_priority": 3,   # fact join + agg + topk
    "join_broadcast_region": 1,  # dims broadcast, one agg
    "window_topk_per_group": 1,  # one window shuffle
    "window_running_sum": 1,
    "sessionize": 2,             # window + final agg
    "dedup_exact_keep_first": 1,
    "text_token_stats": 0,       # pure per-row projection
    "text_lang_id": 0,
    "mm_feature_extract": 0,     # mapInPandas over the scan
    "filter_project": 0,
}


@pytest.mark.parametrize("name", sorted(SHUFFLE_BUDGET))
def test_headline_shuffle_budget(spark, sf_dir, name):
    df = SPECS[name].fn(spark, sf_dir)
    plan = checks.simple_plan(df)
    real = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert real <= SHUFFLE_BUDGET[name], (
        f"{name}: {real} non-broadcast shuffles (budget "
        f"{SHUFFLE_BUDGET[name]}):\n{plan}"
    )


def test_window_distribution_is_two_pass(spark, sf_dir):
    """The distribution query must never sort every raw row in one
    task: its unpartitioned window may only consume the per-value
    aggregate (bounded cardinality), and the join back must be a
    broadcast."""
    df = SPECS["window_distribution"].fn(spark, sf_dir)
    plan = checks.simple_plan(df)
    wpos = plan.index("Window")
    # children print below their parent: the window's input subtree
    # must contain the per-value HashAggregate
    assert "HashAggregate" in plan[wpos:], plan
    assert checks.has_broadcast_join(df), "rank stats should broadcast back to rows"


def test_fact_scan_prunes_unused_columns(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir)
    df = li.filter(F.col("l_shipdate") < "1996-01-01").select("l_orderkey", "l_quantity")
    schemas = checks.scan_read_schema(df)
    joined = ";".join(schemas)
    assert "l_extendedprice" not in joined and "l_comment" not in joined


def test_segment_dedup_plan_shape(spark, sf_dir):
    """Round-6 corpus operators: the keep-first rank must plan as a
    map-side WindowGroupLimit (rank<=1 pushed below the exchange) and
    the operator stays cartesian-free."""
    df = SPECS["text_segment_dedup"].fn(spark, sf_dir)
    plan = checks.formatted_plan(df)
    assert "WindowGroupLimit" in plan, "keep-first rank should push map-side"
    assert not checks.has_cartesian(df)
    # both branches scan only (doc_id, text) of the documents table
    assert all("lang" not in s and "source" not in s for s in checks.scan_read_schema(df)), (
        checks.scan_read_schema(df)
    )


def test_mixture_sampling_broadcasts_weights_no_fact_shuffle(spark, sf_dir):
    """The per-source weight table must broadcast — the documents scan
    is filtered in place, never shuffled for the join."""
    df = SPECS["sample_mixture_sources"].fn(spark, sf_dir)
    assert checks.has_broadcast_join(df), "weight table should broadcast"
    assert checks.shuffle_count(df) == 0, checks.simple_plan(df)


def test_topk_quality_per_source_plan_shape(spark, sf_dir):
    """Session-4: the per-source top-k must plan as a map-side
    WindowGroupLimit (each task keeps k rows per group before the
    exchange) and scan only the columns it uses."""
    df = SPECS["sample_topk_quality_per_source"].fn(spark, sf_dir)
    plan = checks.formatted_plan(df)
    assert "WindowGroupLimit" in plan
    assert not checks.has_cartesian(df)
    assert all("lang" not in s and "n_chars" not in s for s in checks.scan_read_schema(df))


def test_sim_ivf_kmeans_plan_shape(spark, sf_dir):
    """The probed-cells and query sides must broadcast: the corpus is
    filtered by the broadcast cell list, never shuffled corpus-wide
    for the candidate join."""
    df = SPECS["sim_ivf_kmeans"].fn(spark, sf_dir)
    assert checks.has_broadcast_join(df)
    assert not checks.has_cartesian(df)


def test_skew_profile_partial_aggregation(spark, sf_dir):
    """Per-key counts must map-side combine; the window total runs
    over the (small) aggregated table, not the events scan."""
    df = SPECS["skew_key_profile"].fn(spark, sf_dir)
    assert checks.partial_aggregate_count(df) >= 1
    assert all("value" not in s and "props" not in s for s in checks.scan_read_schema(df))


def test_range_keyless_join_is_bucketed_not_nested_loop(spark, sf_dir):
    """The keyless range join must plan as a bucket equi-join (hash or
    sort-merge), never a nested loop over the full sides."""
    df = SPECS["join_range_keyless"].fn(spark, sf_dir)
    assert not checks.has_cartesian(df)
    assert checks.unbounded_nested_loop_count(df) == 0


def test_bloom_prefilter_join_plan_shape(spark, sf_dir):
    """Round-7: the Bloom membership probe must be a scan-side Filter
    (whole-stage codegen, no join/exchange for membership); the only
    joins are the dim build and the exact FP-removal semi-join, both
    broadcast; the fact side never shuffles before the final agg."""
    df = SPECS["join_bloom_prefilter"].fn(spark, sf_dir)
    plan = checks.formatted_plan(df)
    assert checks.has_broadcast_join(df)
    assert not checks.has_cartesian(df)
    assert "getbit" in plan, "membership must be the codegen bitset probe"
    # one partial-agg phase over the prefiltered fact rows
    assert checks.partial_aggregate_count(df) >= 1


def test_split_kfold_is_pure_scan(spark, sf_dir):
    """Fold assignment is a scan expression: zero shuffles, zero
    joins, and the scan reads only the projected columns."""
    df = SPECS["split_kfold"].fn(spark, sf_dir)
    assert checks.shuffle_count(df) == 0, checks.simple_plan(df)
    assert all("text" not in s for s in checks.scan_read_schema(df))


def test_sample_temperature_is_one_count_plus_scalars(spark, sf_dir):
    """One map-side-combined count per source; the total and the
    normalizer are one-row scalar broadcasts (the tf-idf pattern) —
    no corpus-wide shuffle beyond the source aggregate, and the scan
    reads only the source column."""
    df = SPECS["sample_temperature"].fn(spark, sf_dir)
    assert checks.partial_aggregate_count(df) >= 1
    assert not checks.unbounded_nested_loop_count(df)
    assert all("text" not in s for s in checks.scan_read_schema(df))


def test_percentile_exact_partial_phase(spark, sf_dir):
    """Exact percentiles still plan with a partial aggregate phase
    (Spark's percentile is an ImperativeAggregate with map-side
    partials) and prune the events scan to the two used columns."""
    df = SPECS["agg_percentile_exact"].fn(spark, sf_dir)
    assert checks.partial_aggregate_count(df) >= 1
    assert all("props" not in s and "user_id" not in s for s in checks.scan_read_schema(df))


def test_mode_and_latest_are_group_limited(spark, sf_dir):
    """Both round-7 argmax operators must shuffle reduced data: mode
    aggregates (group, value) counts map-side first; latest-state
    plans its row_number as a map-side WindowGroupLimit so each task
    forwards one row per key, and neither reads unused columns."""
    mode = SPECS["agg_mode_per_group"].fn(spark, sf_dir)
    assert checks.partial_aggregate_count(mode) >= 1
    latest = SPECS["events_latest_per_key"].fn(spark, sf_dir)
    assert "WindowGroupLimit" in checks.formatted_plan(latest)
    assert all("props" not in s for s in checks.scan_read_schema(latest))


def test_vocab_coverage_and_transitions_plan_shape(spark, sf_dir):
    """The vocab build must collapse through a TakeOrderedAndProject
    heap (never a global sort) and broadcast the vocab back; the
    transition matrix must aggregate with a partial phase and
    broadcast its row-normalizer."""
    vc = SPECS["text_vocab_coverage"].fn(spark, sf_dir)
    plan = checks.simple_plan(vc)
    assert "TakeOrderedAndProject" in plan, plan
    assert checks.has_broadcast_join(vc)
    tr = SPECS["events_path_transitions"].fn(spark, sf_dir)
    assert checks.partial_aggregate_count(tr) >= 1
    assert checks.has_broadcast_join(tr)
    assert all("props" not in s and "value" not in s for s in checks.scan_read_schema(tr))


def test_bitmap_distinct_has_no_expand(spark, sf_dir):
    """agg_bitmap_distinct's whole point: exact distinct WITHOUT the
    count-distinct Expand node — two plain hash aggregates (each with
    a partial phase) and nothing else."""
    df = SPECS["agg_bitmap_distinct"].fn(spark, sf_dir)
    plan = checks.simple_plan(df)
    assert "Expand" not in plan, plan
    assert checks.partial_aggregate_count(df) >= 2, plan


def test_decay_score_joins_are_broadcast(spark, sf_dir):
    """The 1-row anchor and the 64-row decay table must both attach by
    broadcast — the fact side never shuffles for them."""
    df = SPECS["events_decay_weighted_score"].fn(spark, sf_dir)
    assert checks.has_broadcast_join(df)
    assert checks.unbounded_nested_loop_count(df) <= 1  # 1-row scalar anchor


def test_sorted_neighborhood_is_windows_not_joins(spark, sf_dir):
    """SNM's value claim: candidate generation via lead() windows over
    ONE sort — no self-join anywhere in the plan."""
    df = SPECS["er_sorted_neighborhood"].fn(spark, sf_dir)
    plan = checks.simple_plan(df)
    assert "Join" not in plan, plan
    assert "Window" in plan, plan


def test_maxsim_is_arrow_batched_single_scan(spark, sf_dir):
    """MaxSim scores through ONE Arrow-batched kernel over one corpus
    scan: no nested-loop join, no row-at-a-time BatchEvalPython."""
    df = SPECS["sim_maxsim_late_interaction"].fn(spark, sf_dir)
    plan = checks.simple_plan(df)
    assert "BatchEvalPython" not in plan, plan
    assert checks.unbounded_nested_loop_count(df) == 0, plan
    assert plan.count("Scan parquet") == 1, plan


def test_vad_segments_shuffle_is_doc_keyed_only(spark, sf_dir):
    """VAD fans frames out JVM-side then reduces within doc-keyed
    windows: the plan carries no join and no Python nodes."""
    df = SPECS["mm_audio_vad_segments"].fn(spark, sf_dir)
    plan = checks.simple_plan(df)
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan


def test_er_reconcile_plan_shape(spark, sf_dir):
    """The reconciler's two generators keep their scale shapes inside
    ONE composed plan: the stream leg is an equality hash join on the
    block key (never a cartesian), the batch leg is the single-window
    SNM pass, the DL verify is Arrow-batched (ArrowEvalPython, not
    row-at-a-time BatchEvalPython), and the only nested loops are the
    sanctioned 1-row scalar broadcasts of the count legs.

    lazy_plans: round-15 made er_reconcile eager (pair frames persist
    across the count legs + eager_release), so the registered fn's
    normal return is a checkpoint re-read — the lazy mode hands back
    the real pre-checkpoint operator tree, exactly like the dedup
    family's no-cartesian test above."""
    from api_weather_kafka_clickhouse_spark.plans.stage import lazy_plans

    with lazy_plans():
        df = SPECS["er_reconcile"].fn(spark, sf_dir)
    plan = checks.simple_plan(df)
    assert "Window" in plan, plan  # the SNM leg's one sort window
    assert "ArrowEvalPython" in plan, plan  # the per-candidate DL verify
    assert "BatchEvalPython" not in plan, plan  # never row-at-a-time
    # block join + labels joins are hash equi-joins; the only
    # nested-loop joins are the dimension-bounded 1-row scalar anchors
    assert checks.unbounded_nested_loop_count(df) <= 1, plan
