"""Semantic tests for the corpus-prep additions: segment-level exact
dedup (RefinedWeb/C4 boilerplate-removal shape) and deterministic
domain-mixture resampling. Oracle parity at the corpus level is
covered by tests/test_oracle_parity.py; these pin the SEMANTICS on
crafted inputs."""

from __future__ import annotations

from api_weather_kafka_clickhouse_spark.operators.text_analysis import (
    MIX_WEIGHTS,
    segment_dedup,
)


def _rows(df):
    return {r.doc_id: r for r in df.collect()}


def test_segment_dedup_exact_duplicate_doc_collapses(spark):
    """A verbatim copy contributes zero kept segments; the first
    occurrence keeps its full text."""
    text = " ".join(f"w{i}" for i in range(12))  # 12 tokens = segs [0:10],[10:12]
    docs = spark.createDataFrame([(1, text), (2, text)], "doc_id bigint, text string")
    got = _rows(segment_dedup(docs, seg_tokens=10))
    assert got[1].n_segs == 2 and got[1].n_kept == 2 and got[1].text_clean == text
    assert got[2].n_segs == 2 and got[2].n_kept == 0 and got[2].text_clean == ""


def test_segment_dedup_boilerplate_block_survives_once(spark):
    """A shared segment-aligned boilerplate block is kept only in the
    lowest doc_id; unique tails always survive."""
    boiler = " ".join(f"b{i}" for i in range(5))
    docs = spark.createDataFrame(
        [(1, boiler + " one unique tail here x"), (2, boiler + " two other tail there y")],
        "doc_id bigint, text string",
    )
    got = _rows(segment_dedup(docs, seg_tokens=5))
    assert got[1].text_clean == boiler + " one unique tail here x"
    assert got[2].text_clean == "two other tail there y"
    assert (got[2].n_segs, got[2].n_kept) == (2, 1)


def test_segment_dedup_within_doc_repetition_is_removed(spark):
    """The same segment repeated INSIDE one doc is also deduped —
    keep-first orders by (doc_id, seg_idx)."""
    seg = "a b c"
    docs = spark.createDataFrame([(7, f"{seg} {seg} {seg}")], "doc_id bigint, text string")
    got = _rows(segment_dedup(docs, seg_tokens=3))
    assert got[7].n_segs == 3 and got[7].n_kept == 1 and got[7].text_clean == seg


def test_segment_dedup_short_doc_single_partial_segment(spark):
    docs = spark.createDataFrame([(1, "only two")], "doc_id bigint, text string")
    got = _rows(segment_dedup(docs, seg_tokens=10))
    assert got[1].n_segs == 1 and got[1].n_kept == 1 and got[1].text_clean == "only two"


def test_mixture_weights_cover_all_sources_and_tiers(spark, sf_dir):
    """The resample keeps ~100% of tier-0 sources, and the kept set is
    a deterministic per-doc decision: rerunning yields identical ids."""
    from api_weather_kafka_clickhouse_spark import registry

    fn = registry.queries()["sample_mixture_sources"]
    first = {r.doc_id for r in fn(spark, sf_dir).collect()}
    second = {r.doc_id for r in fn(spark, sf_dir).collect()}
    assert first == second and len(first) > 0
    # tier-0 threshold 'g0' sorts above every hex prefix => keep all
    tier0 = {s for s, t in MIX_WEIGHTS if t == "g0"}
    from api_weather_kafka_clickhouse_spark.tables import load

    d = load(spark, "documents", sf_dir)
    all_t0 = {r.doc_id for r in d.filter(d.source.isin(tier0)).collect()}
    kept_t0 = {r.doc_id for r in fn(spark, sf_dir).collect() if r.source in tier0}
    assert kept_t0 == all_t0


# -- property checks: segment dedup invariants on random corpora -----

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_WORDS = ["alpha", "beta", "gamma", "delta", "eps"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=14).map(" ".join)


@given(texts=st.lists(_doc, min_size=1, max_size=6))
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_segment_dedup_invariants_on_random_corpora(spark, texts):
    """For ANY corpus: (1) every document appears in the output;
    (2) n_kept <= n_segs; (3) total kept across the corpus equals the
    number of DISTINCT segments (each survives exactly once);
    (4) the lowest doc_id loses nothing except its own internal
    repeats; (5) each text_clean is a subsequence of the original
    segmentation."""
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")
    rows = {r.doc_id: r for r in segment_dedup(docs, seg_tokens=3).collect()}
    assert set(rows) == set(range(len(texts)))

    def seglist(t):
        w = t.split(" ")
        return [" ".join(w[i : i + 3]) for i in range(0, len(w), 3)]

    all_segs = [s for t in texts for s in seglist(t)]
    assert sum(r.n_kept for r in rows.values()) == len(set(all_segs))
    for i, t in enumerate(texts):
        r = rows[i]
        assert r.n_segs == len(seglist(t))
        assert r.n_kept <= r.n_segs
        # kept text is a subsequence of the original segmentation
        kept = r.text_clean.split(" ") if r.text_clean else []
        orig_iter = iter(t.split(" "))
        assert all(w in orig_iter for w in kept) or kept == []
    # doc 0 keeps one copy of each of its distinct segments
    segs0 = seglist(texts[0])
    assert rows[0].n_kept == len(set(segs0))
