"""Unit/property tests for the corpus-quality operators
(operators/corpus_quality.py) beyond the oracle-parity rows they
already get in test_oracle_parity.py: rule failure sides on crafted
fixtures, chunk coverage/reassembly invariants, sampling determinism
under repartitioning, entropy closed-form cases, and the zero-shuffle
plan claims."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark.operators.corpus_quality import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    chunk_overlap,
    gopher_quality,
    sample_weighted,
)
from api_weather_kafka_clickhouse_spark.plans import checks


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, n_chars int, source string")


def test_gopher_rule_failure_sides(spark):
    # 60 tokens, stopworded, mean word length comfortably in [3, 10]
    base = " ".join(f"alpha{i % 7} beta gamma the of wordy" for i in range(10))
    rows = [
        (1, base, 0, "s"),  # passes every rule
        (2, "short doc only", 0, "s"),  # fails word-count floor
        (3, " ".join("## ###" for _ in range(30)), 0, "s"),  # fails symbol + alpha + stopword
        (4, " ".join("12345 67890" for _ in range(30)), 0, "s"),  # fails alpha ratio
        (5, " ".join("x y z w" for _ in range(15)), 0, "s"),  # mean word len < 3
        (6, " ".join(f"w{i}" for i in range(60)), 0, "s"),  # no stopwords
    ]
    out = {
        r["doc_id"]: r
        for r in gopher_quality(_docs(spark, rows)).collect()
    }
    assert out[1]["keep"] == 1, out[1]
    assert out[2]["keep"] == 0 and out[2]["n_words"] == 3
    assert out[3]["keep"] == 0 and out[3]["symbol_ratio"] > 0.1
    assert out[3]["alpha_ratio"] == 0.0
    assert out[4]["keep"] == 0 and out[4]["alpha_ratio"] == 0.0
    assert out[5]["keep"] == 0 and out[5]["mean_word_len"] < 3
    assert out[6]["keep"] == 0 and out[6]["n_stop"] == 0


def test_chunk_coverage_and_reassembly(spark):
    # token counts straddling every boundary case: < W, == W, == W+1,
    # multiple strides, exact stride multiple
    sizes = [1, 5, CHUNK_TOKENS - 1, CHUNK_TOKENS, CHUNK_TOKENS + 1, 97, 100, 130]
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(n)), 0, "s") for i, n in enumerate(sizes)]
    out = chunk_overlap(_docs(spark, rows)).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, n in enumerate(sizes):
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        # chunk count formula
        expected_nc = 1 + math.ceil(max(n - CHUNK_TOKENS, 0) / CHUNK_STRIDE)
        assert len(chunks) == expected_nc, (n, len(chunks))
        # every token covered, in order, with the declared overlap
        toks = [f"t{i}_{j}" for j in range(n)]
        for c in chunks:
            s = c["chunk_idx"] * CHUNK_STRIDE
            expect = toks[s : s + CHUNK_TOKENS]
            assert c["chunk_text"].split(" ") == expect
            assert c["n_chunk_tokens"] == len(expect)
        covered = set()
        for c in chunks:
            covered.update(c["chunk_text"].split(" "))
        assert covered == set(toks), (n, len(covered))


def test_sample_weighted_deterministic_under_repartitioning(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.tables import load

    docs = load(spark, "documents", sf_dir)
    a = {r["doc_id"] for r in sample_weighted(docs).collect()}
    b = {r["doc_id"] for r in sample_weighted(docs.repartition(13, "source")).collect()}
    assert a == b and len(a) > 0


def test_sample_weighted_rate_tracks_weight(spark):
    # heavy docs (p=1) are all kept; light docs (p=1/16) are mostly dropped
    rows = [(i, "x", 4000, "s") for i in range(100)] + [
        (i, "x", 25, "s") for i in range(100, 1100)
    ]
    out = sample_weighted(_docs(spark, rows)).collect()
    heavy = [r for r in out if r["weight"] == 4000]
    light = [r for r in out if r["weight"] == 25]
    assert len(heavy) == 100  # p capped at 1 => certainty inclusion
    assert all(r["inv_p"] == 1.0 for r in heavy)
    # E[light kept] = 1000/16 = 62.5; generous band, deterministic given the salt
    assert 20 <= len(light) <= 120, len(light)
    assert all(r["inv_p"] == 16.0 for r in light)


def test_unigram_entropy_closed_forms(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.registry import all_specs

    rows = [
        (1, "a a a a", 0, "s"),  # single token: entropy 0
        (2, "a b c d", 0, "s"),  # uniform over 4: ln(4)
        (3, "a a b b c c d d", 0, "s"),  # uniform over 4 with c=2: still ln(4)
    ]
    df = _docs(spark, rows)
    df.createOrReplaceTempView("_ent_docs")
    spec = all_specs()["text_unigram_entropy"]
    # run the registered fn against a temp dir? -- the kernel is inline
    # in the query fn, so recompute via the same expressions here:
    cnt = (
        df.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.sum(F.round(F.col("c") * F.log("c"), 6).cast("decimal(28,6)")).alias("s"),
    )
    ent = {
        r["doc_id"]: r["entropy"]
        for r in agg.select(
            "doc_id",
            F.round(
                F.log("n_tokens") - F.col("s").cast("double") / F.col("n_tokens"), 4
            ).alias("entropy"),
        ).collect()
    }
    assert ent[1] == round(math.log(4) - 4 * math.log(4) / 4, 4) == 0.0
    assert ent[2] == round(math.log(4), 4)
    assert abs(ent[3] - round(math.log(4), 4)) <= 1e-3  # per-term rounding slack
    assert spec.oracle is not None


def test_scan_only_operators_have_zero_shuffles(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.registry import all_specs

    specs = all_specs()
    for name in ("text_gopher_quality", "text_chunk_overlap", "sample_weighted"):
        df = specs[name].fn(spark, sf_dir)
        assert checks.shuffle_count(df) == 0, (name, checks.simple_plan(df))


def test_bigram_lm_score_ranks_gibberish_above_formulaic(spark, tmp_path):
    """In a corpus of one repeated formula plus one doc of
    never-repeated bigrams, the LM must assign the gibberish doc the
    highest mean negative log-likelihood."""
    import os

    from api_weather_kafka_clickhouse_spark.registry import all_specs

    formula = " ".join("alpha beta gamma delta" for _ in range(10))
    rows = [(i, formula, 0, "s") for i in range(10)]
    rows.append((99, " ".join(f"uniq{j} tok{j}x" for j in range(20)), 0, "s"))
    sf = str(tmp_path / "lm")
    os.makedirs(sf, exist_ok=True)
    _docs(spark, rows).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))

    out = {r["doc_id"]: r["nll"] for r in all_specs()["text_bigram_lm_score"].fn(spark, sf).collect()}
    assert max(out, key=out.get) == 99, out
    assert out[99] > out[0] + 1.0
