"""Driver-gate invariants: the first 50 registered queries ARE the
pinned priority list, every gate slot is oracle-checked, and no
registration reshuffle can silently change what the driver evaluates."""

from __future__ import annotations

from api_weather_kafka_clickhouse_spark import registry


def test_first_50_registrations_match_priority_pin():
    specs = registry.all_specs()
    first50 = tuple(list(specs)[:50])
    assert first50 == registry._PRIORITY, (
        "the driver evaluates the FIRST 50 registered queries; a "
        "registration-order change just altered the gate set"
    )


def test_every_gate_slot_is_oracle_checked_or_rows_only_by_design():
    """Round-7 rotation deliberately routes the approximate-by-design
    queries through the gate once (they can only ever earn rows-only
    driver rows, but 'every registered query has >= 1 driver row'
    includes them). Any OTHER query in a gate slot must be
    oracle-checked — landing there without an oracle by accident is
    still an error."""
    specs = registry.all_specs()
    rows_only_by_design = {n for n, s in specs.items() if s.oracle is None}
    missing = [
        n
        for n in registry._PRIORITY
        if specs[n].oracle is None and n not in rows_only_by_design
    ]
    assert not missing, f"gate slots without an oracle: {missing}"
    # and the gate's rows-only slots are exactly the documented set
    # minus the three that did not fit the 50 (they keep local pytest
    # recall/error bounds and rotate in next round if slots free up)
    gate_rows_only = {n for n in registry._PRIORITY if specs[n].oracle is None}
    assert gate_rows_only <= rows_only_by_design


def test_priority_has_no_duplicates_and_exactly_50():
    assert len(registry._PRIORITY) == 50
    assert len(set(registry._PRIORITY)) == 50


def test_registry_totals_are_pinned():
    """One source of truth for the inventory the round documents
    (CHANGES/SURVEY/memory all cite these): a new registration must
    update this pin in the same commit, so prose can never drift from
    code (round-7 verdict item 6)."""
    specs = registry.all_specs()
    total = len(specs)
    oracle = sum(1 for s in specs.values() if s.oracle is not None)
    assert (total, oracle, total - oracle) == (351, 345, 6), (
        total,
        oracle,
        total - oracle,
    )


def test_rows_only_queries_are_documented_choices():
    """Every registered query without an oracle must be one of the
    known approximate/RNG-by-design operators — a new query landing
    without an oracle by accident should fail here, not silently get
    the weaker rows-only driver check."""
    specs = registry.all_specs()
    rows_only = {n for n, s in specs.items() if s.oracle is None}
    expected = {
        # agg_hll_sketch_merge, agg_approx_distinct,
        # agg_approx_percentile: upgraded to hash-checked in round 8
        # (bounds oracles: exact harness columns + a sigma-margin
        # flag any correct sketch satisfies)
        # dedup_simhash: upgraded to hash-checked in round 8 (md5
        # window bit source replaces xxhash64 — DuckDB recomputes
        # every signature bit)
        # dedup_embedding_lsh: upgraded to hash-checked in round 7
        # (literal SRP hyperplanes mirrored in SQL, sim_ann_lsh-style)
        # mm_phash_signatures: upgraded to hash-checked in round 10
        # (exact i*n//64 region bounds + cross-multiplied threshold
        # make every signature bit SQL-recomputable)
        "dedup_semdedup",
        # sim_ann_lsh / sim_ivf_label: upgraded to hash-checked in
        # round 7 (literal hyperplanes / avg centroids mirror in SQL)
        "sim_ivf_kmeans",
        "sample_stratified",
        "embedding_kmeans",
        "quality_classifier_score",
        "sample_quality_weighted",
    }
    assert rows_only == expected, rows_only.symmetric_difference(expected)


def test_queries_pin_utc_on_a_foreign_timezone_session(spark, sf_dir, duck):
    """The query surface declares UTC semantics: a driver-owned
    session inheriting a non-UTC host zone must still produce
    oracle-matching results for time-bucketing queries (round-6
    review: date_trunc binds the session zone at analysis AND
    timestamps render in it at collect — both must be UTC)."""
    from api_weather_kafka_clickhouse_spark.oracle import compare

    tz_key = "spark.sql.session.timeZone"
    spark.conf.set(tz_key, "America/New_York")
    try:
        fn = registry.queries()["time_bucket_hourly"]
        df = fn(spark, sf_dir)
        # the wrapper pinned the session for analysis and collection
        assert spark.conf.get(tz_key) == "UTC"
        r = compare(df, duck, registry.oracle_sql()["time_bucket_hourly"])
        assert r["rows_match"] and r["schema_match"] and r["hash_match"], r
    finally:
        spark.conf.set(tz_key, "UTC")
