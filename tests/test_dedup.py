"""Quality guarantees for the dedup operators beyond oracle parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.operators import dedup


def _pairs(df, cols=("doc_a", "doc_b")):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_minhash_lsh_matches_exact(spark, sf_dir):
    """LSH candidates + exact verify must equal the exact all-pairs
    result (band parameters sized for the corpus's similarity gap)."""
    exact = _pairs(dedup.dedup_ngram_jaccard(spark, sf_dir))
    lsh = _pairs(dedup.dedup_minhash_lsh(spark, sf_dir))
    assert lsh == exact
    assert len(exact) > 0, "corpus should contain planted near-dups"


def test_simhash_banding_is_exact(spark, sf_dir):
    """5-band banding must find EXACTLY the hamming<=SIMHASH_MAX_HAMMING
    pairs (pigeonhole) — compare against an in-Spark brute-force cross
    join over the same two-half signatures."""
    from api_weather_kafka_clickhouse_spark.tables import load

    sigs = dedup.simhash_md5_signatures(load(spark, "documents", sf_dir)).cache()
    a = sigs.select(
        F.col("doc_id").alias("doc_a"), F.col("sim_lo").alias("la"), F.col("sim_hi").alias("ha")
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"), F.col("sim_lo").alias("lb"), F.col("sim_hi").alias("hb")
    )
    brute = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))
            + F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))),
        )
        .filter(F.col("hamming") <= dedup.SIMHASH_MAX_HAMMING)
    )
    assert _pairs(brute) == _pairs(dedup.dedup_simhash(spark, sf_dir))
    # halves stay unsigned 32-bit: no shift ever touches a sign bit
    bad = sigs.filter(
        (F.col("sim_lo") < 0) | (F.col("sim_lo") > 0xFFFFFFFF)
        | (F.col("sim_hi") < 0) | (F.col("sim_hi") > 0xFFFFFFFF)
    )
    assert bad.count() == 0
    sigs.unpersist()


def test_simhash_finds_planted_near_dups(spark, sf_dir):
    """The ~0.99-Jaccard planted pairs should mostly land within the
    hamming radius — simhash must overlap heavily with the exact
    result (radius 4: E[hamming] ~ 2.9 at this similarity, so the
    radius sits ~1 sd above the mean; measured 0.86 on this corpus)."""
    exact = _pairs(dedup.dedup_ngram_jaccard(spark, sf_dir))
    simhash = _pairs(dedup.dedup_simhash(spark, sf_dir))
    assert len(exact) > 0
    recall = len(exact & simhash) / len(exact)
    assert recall >= 0.75, f"simhash recall {recall:.2f} vs exact jaccard pairs"


def test_hot_shingle_cap_is_noop_on_testdata(spark, sf_dir):
    """The DF cap only removes shingles shared by >SHINGLE_DF_CAP
    docs; the testdata corpus has none, so the capped shingle universe
    must equal the uncapped one (keeping the oracle parity test
    honest — its SQL mirrors the cap)."""
    raw = dedup._doc_shingles_exploded(spark, sf_dir, cap=None)
    max_df = (
        raw.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).agg(F.max("df")).first()[0]
    )
    assert max_df < dedup.SHINGLE_DF_CAP, "testdata grew a viral shingle"
    assert dedup._doc_shingles_exploded(spark, sf_dir).count() == raw.count()
    # a tight cap (cap=1) removes every shared shingle
    assert dedup._doc_shingles_exploded(spark, sf_dir, cap=1).count() < raw.count()


def test_restricted_verify_matches_pipelined(spark, sf_dir):
    """The candidate-restricted verify path (the 100 TB flag) must
    produce exactly the pipelined path's pairs."""
    e = dedup._doc_shingles_exploded(spark, sf_dir).cache()
    sig = dedup.minhash_signatures(e).cache()
    cand = dedup._band_candidates(sig)
    base = dedup._verify_pairs(cand, e, sizes=sig.select("doc_id", "n"))
    restricted = dedup._verify_pairs(
        cand, e, restrict_to_candidates=True, sizes=sig.select("doc_id", "n")
    )
    rows = lambda df: {(r.doc_a, r.doc_b, r.jaccard) for r in df.collect()}  # noqa: E731
    assert rows(base) == rows(restricted)
    assert len(rows(base)) > 0
    e.unpersist()
    sig.unpersist()


def test_exact_keep_first_is_unique_and_minimal(spark, sf_dir):
    out = dedup.dedup_exact_keep_first(spark, sf_dir)
    n_keys = out.select("user_id", "event_type").distinct().count()
    assert out.count() == n_keys


def test_dedup_operators_leave_no_cached_rdds(spark, sf_dir):
    """Multi-consumer intermediates persist only WITHIN an operator
    call (eager_release drops every cache before returning): after an
    operator's result is materialized, nothing may linger in the
    block-manager cache (round-2 verdict: operator-scope persist
    leaks accumulate executor memory in long-lived sessions)."""
    from api_weather_kafka_clickhouse_spark.operators.text_analysis import (
        text_tfidf_topk,
    )

    spark.catalog.clearCache()
    for fn in (
        dedup.dedup_minhash_lsh,
        dedup.dedup_simhash,
        dedup.dedup_ngram_jaccard,
        dedup.corpus_clean_pipeline,
        dedup.dedup_embedding_lsh,
        text_tfidf_topk,
    ):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == 0


def test_embedding_lsh_is_exact_subset_with_recall(spark, sf_dir):
    """Every SRP-candidate pair is exactly verified (subset of the
    brute-force result) and recall stays above the banding operating
    point."""
    exact = _pairs(dedup.dedup_embedding_cosine(spark, sf_dir), ("vec_a", "vec_b"))
    approx = _pairs(dedup.dedup_embedding_lsh(spark, sf_dir), ("vec_a", "vec_b"))
    assert approx <= exact
    if exact:
        recall = len(approx) / len(exact)
        assert recall >= 0.4, f"embedding LSH recall {recall:.2f}"


@pytest.mark.parametrize("driver_max", [100_000, 0])
def test_connected_components_transitive_chain(spark, monkeypatch, driver_max):
    """A 4-edge chain needs multiple propagation rounds: every vertex
    must land on the component min even though no direct pair links
    the endpoints; a separate 2-clique must stay its own component.
    Parametrized over both closure tiers (driver union-find fold and,
    threshold forced to 0, the distributed iteration)."""
    monkeypatch.setattr(dedup, "CC_DRIVER_FOLD_MAX", driver_max)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "doc_a bigint, doc_b bigint"
    )
    got = {
        (r.doc_id, r.canonical_id)
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (10, 10), (11, 10)}


@pytest.mark.parametrize("driver_max", [100_000, 0])
def test_connected_components_empty_pairs(spark, monkeypatch, driver_max):
    monkeypatch.setattr(dedup, "CC_DRIVER_FOLD_MAX", driver_max)
    pairs = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    assert dedup.connected_components(pairs).count() == 0


def test_connected_components_releases_scratch(spark, monkeypatch):
    """After a CC call exactly ONE scratch checkpoint may remain — the
    result itself. The O(E) cc_edges stage (the operator's largest
    artifact) and any iteration snapshots must be dropped the moment
    the result materializes, not at process exit (round-5 review:
    one stranded edges dir per call × bench runs adds up)."""
    from api_weather_kafka_clickhouse_spark.plans import stage

    monkeypatch.setattr(dedup, "CC_DRIVER_FOLD_MAX", 0)  # distributed tier
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a bigint, doc_b bigint"
    )
    before = set(stage.live_checkpoint_dirs())
    result = dedup.connected_components(pairs)
    assert result.count() == 6
    created = [d for d in stage.live_checkpoint_dirs() if d not in before]
    assert len(created) == 1 and "cc_labels" in created[0], (
        f"only the result checkpoint may survive the call, got: {created}"
    )
    # the result stays readable after its inputs were dropped
    assert result.count() == 6
    stage.drop_checkpoint_dir(spark, created[0])


def test_connected_components_lazy_mode_result_stays_evaluable(spark, monkeypatch):
    """Under lazy_plans() eager_release returns the UNMATERIALIZED
    plan, whose lineage still scans the cc_edges / iteration-snapshot
    files — the operator must NOT delete them there (round-6 review:
    the eager-mode scratch drop would make the returned frame throw
    FileNotFoundException on first evaluation)."""
    from api_weather_kafka_clickhouse_spark.plans import stage

    monkeypatch.setattr(dedup, "CC_DRIVER_FOLD_MAX", 0)  # distributed tier
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a bigint, doc_b bigint"
    )
    before = set(stage.live_checkpoint_dirs())
    with stage.lazy_plans():
        result = dedup.connected_components(pairs)
    # evaluating the lazy plan must still work: its backing scratch
    # files survive the call (tracked for a later reclaim instead)
    assert result.count() == 6
    for d in [d for d in stage.live_checkpoint_dirs() if d not in before]:
        stage.drop_checkpoint_dir(spark, d)


@pytest.mark.parametrize("driver_max", [100_000, 0])
def test_connected_components_matches_union_find_on_random_graphs(
    spark, monkeypatch, driver_max
):
    """Property check: on seeded random graphs BOTH closure tiers
    equal a reference union-find exactly — star, chain, cycle, and
    forest shapes all arise across seeds."""
    import random

    monkeypatch.setattr(dedup, "CC_DRIVER_FOLD_MAX", driver_max)
    for seed in (7, 23, 91):
        rng = random.Random(seed)
        n_vertices, n_edges = 60, 45
        edges = [
            (a, b)
            for _ in range(n_edges)
            for a in [rng.randrange(n_vertices)]
            for b in [rng.randrange(n_vertices)]
            if a != b
        ]
        parent = list(range(n_vertices))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {v for e in edges for v in e}
        expected = {v: find(v) for v in sorted(touched)}

        pairs = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
        got = {
            r.doc_id: r.canonical_id
            for r in dedup.connected_components(pairs).collect()
        }
        assert got == expected, f"seed {seed}: {got} != {expected}"


@pytest.mark.parametrize("driver_max", [100_000, 0])
def test_merge_components_equals_full_recompute_on_random_splits(
    spark, monkeypatch, driver_max
):
    """Incremental contract: labels = CC(E1), then
    merge_components(labels, E2) == CC(E1 u E2) — for random graphs
    randomly split so E2 carries both edges between already-clustered
    components and brand-new vertices. Parametrized over BOTH closure
    tiers: the default driver union-find fold, and (threshold forced
    to 0) the distributed connected_components fallback."""
    import random

    monkeypatch.setattr(dedup, "MERGE_FOLD_DRIVER_MAX", driver_max)
    for seed in (3, 41):
        rng = random.Random(seed)
        n_vertices, n_edges = 50, 40
        edges = list(
            {
                (a, b)
                for _ in range(n_edges)
                for a in [rng.randrange(n_vertices)]
                for b in [rng.randrange(n_vertices)]
                if a != b
            }
        )
        rng.shuffle(edges)
        cut = len(edges) // 2
        e1, e2 = edges[:cut], edges[cut:]
        df1 = spark.createDataFrame(e1, "doc_a bigint, doc_b bigint")
        df2 = spark.createDataFrame(e2, "doc_a bigint, doc_b bigint")
        dfall = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")

        labels = dedup.connected_components(df1)
        merged = {
            (r.doc_id, r.canonical_id)
            for r in dedup.merge_components(labels, df2).collect()
        }
        full = {
            (r.doc_id, r.canonical_id)
            for r in dedup.connected_components(dfall).collect()
        }
        assert merged == full, f"seed {seed}: {sorted(merged ^ full)}"


def test_merge_components_noop_and_new_vertex_edges(spark):
    """Degenerate shapes: pairs entirely inside one existing component
    change nothing; a pair of two brand-new vertices starts its own
    component."""
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (5, 5), (6, 5)], "doc_id bigint, canonical_id bigint"
    )
    inside = spark.createDataFrame([(1, 2)], "doc_a bigint, doc_b bigint")
    got = {(r.doc_id, r.canonical_id) for r in dedup.merge_components(labels, inside).collect()}
    assert got == {(1, 1), (2, 1), (5, 5), (6, 5)}

    new_pair = spark.createDataFrame([(20, 21)], "doc_a bigint, doc_b bigint")
    got = {(r.doc_id, r.canonical_id) for r in dedup.merge_components(labels, new_pair).collect()}
    assert got == {(1, 1), (2, 1), (5, 5), (6, 5), (20, 20), (21, 20)}

    bridge = spark.createDataFrame([(2, 6)], "doc_a bigint, doc_b bigint")
    got = {(r.doc_id, r.canonical_id) for r in dedup.merge_components(labels, bridge).collect()}
    assert got == {(1, 1), (2, 1), (5, 1), (6, 1)}


def test_connected_components_long_chain_converges_logarithmically(spark, monkeypatch):
    """A 2000-link chain has diameter 2000 — plain neighbor
    propagation needs 2000 rounds and blows the 50-iteration guard;
    the pointer-doubling term must converge it in O(log n) rounds
    with every vertex on the chain minimum."""
    n = 2001
    monkeypatch.setattr(dedup, "CC_DRIVER_FOLD_MAX", 0)  # distributed tier
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a bigint, doc_b bigint"
    )
    got = {
        (r.doc_id, r.canonical_id)
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {(i, 0) for i in range(n)}


def test_containment_catches_embedded_doc_jaccard_misses(spark, tmp_path):
    """A short doc embedded verbatim in a much longer one has high
    containment but low Jaccard — the asymmetric measure must flag it
    while the symmetric one does not; a genuinely unrelated doc stays
    unflagged by both."""
    short = " ".join(f"inner{i}" for i in range(20))
    long_ = short + " " + " ".join(f"outer{i}" for i in range(200))
    other = " ".join(f"alien{i}" for i in range(50))
    docs = spark.createDataFrame(
        [(1, short), (2, long_), (3, other)], "doc_id bigint, text string"
    )
    sf = str(tmp_path / "contain")
    import os

    os.makedirs(sf, exist_ok=True)
    docs.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))

    cont = _pairs(dedup.dedup_containment(spark, sf))
    jac = _pairs(dedup.dedup_ngram_jaccard(spark, sf))
    assert (1, 2) in cont, cont
    assert (1, 2) not in jac, jac
    assert all(3 not in p for p in cont | jac)


def test_split_leakage_free_coassigns_clusters(spark, sf_dir):
    """Every member of a near-dup component gets its component's split,
    and the operator actually moves docs relative to the naive per-doc
    hash (the leakage case it exists to prevent)."""
    from pyspark.sql import functions as F

    from api_weather_kafka_clickhouse_spark.operators.dedup import (
        dedup_cluster_canonical,
        split_leakage_free,
    )

    out = split_leakage_free(spark, sf_dir)
    labels = dedup_cluster_canonical(spark, sf_dir)
    j = out.join(labels, "doc_id").collect()
    assert len(j) > 0
    split_of = {r["doc_id"]: r["split"] for r in out.collect()}
    moved = 0
    for r in j:
        # member split == canonical's split (co-assignment)
        assert r["split"] == split_of[r["canonical_id"]], r
        assert r["group_id"] == r["canonical_id"]
        naive = "train" if __import__("hashlib").md5(
            str(r["doc_id"]).encode()
        ).hexdigest()[:2] < "cd" else "holdout"
        if naive != r["split"]:
            moved += 1
    # at least one clustered doc was re-homed vs the naive hash --
    # i.e. the operator prevents a real leakage case on this corpus
    assert moved > 0


def test_semdedup_never_over_deletes_and_recall(spark, sf_dir):
    """Cell-restricted pairs are exact-verified, so SemDeDup's dropped
    set is a subset of the exact O(n^2) operator's; multi-probe r=2
    cells keep pair recall well above the single-cell point (measured
    0.81 vs 0.33)."""
    from api_weather_kafka_clickhouse_spark.operators.dedup import (
        dedup_embedding_clusters,
        dedup_embedding_cosine,
        dedup_semdedup,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    all_ids = {r.vec_id for r in load(spark, "embeddings", sf_dir).select("vec_id").collect()}
    survivors = {r.vec_id for r in dedup_semdedup(spark, sf_dir).collect()}
    sem_dropped = all_ids - survivors
    labels = dedup_embedding_clusters(spark, sf_dir).collect()
    exact_dropped = {r.doc_id for r in labels if r.doc_id != r.canonical_id}
    assert sem_dropped <= exact_dropped
    assert len(sem_dropped) > 0
    # recall proxy at the dropped-set level: the subset recovers most
    # of the exact drops (pair recall 0.81 measured; dropped-set
    # recall is at least as favorable because clusters overlap)
    assert len(sem_dropped) >= 0.6 * len(exact_dropped)


def test_range_keyless_boundary_semantics(spark):
    """Bucketization recall at the edges: a pair exactly at the 60 s
    boundary is kept, 60 s + 1 us is dropped, and pairs that straddle
    a bucket boundary are found exactly once."""
    import datetime as dt

    from api_weather_kafka_clickhouse_spark.operators import joins as J
    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1, 0, 0, 59, 999999)
    rows = [
        (1, "signup", base),
        # exactly 60 s later (kept), crossing the minute bucket edge
        (2, "purchase", base + dt.timedelta(seconds=60)),
        # 60 s + 1 us (dropped)
        (3, "purchase", base + dt.timedelta(seconds=60, microseconds=1)),
        # same instant (kept; dt 0)
        (4, "purchase", base),
    ]
    e = spark.createDataFrame(rows, "event_id bigint, event_type string, ts timestamp")

    us = F.unix_micros(F.col("ts"))
    a = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("a_id"), us.alias("a_us")
    )
    b = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("b_id"), us.alias("b_us")
    )
    out = J.range_join_keyless(a, b).select("a_id", "b_id").collect()
    pairs = sorted((r.a_id, r.b_id) for r in out)
    assert pairs == [(1, 2), (1, 4)], pairs  # each exactly once
