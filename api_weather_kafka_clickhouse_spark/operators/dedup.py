"""Deduplication operators (SURVEY.md §2-D1/D2): exact, n-gram
Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

No reference counterpart (the reference even disables ClickHouse's
insert dedup, app/clickhouse_db.py:23); these are the north-star
LLM-corpus operators, designed 100-TB-first:

- Signatures (minhash/simhash) are computed per-row with higher-order
  functions inside codegen — zero shuffle, embarrassingly parallel.
- Candidate generation joins on band keys (equi-join, AQE-skew-safe),
  never a cross join.
- Verification is per-candidate-pair `array_intersect` on the two
  shingle sets — O(candidates), not O(n²).
- The exact-Jaccard operator uses an inverted shingle index
  (explode → equi-join → count), the standard all-pairs similarity
  shape; at 100 TB add a document-frequency cutoff on hot shingles.

The DuckDB oracle for every *-jaccard pair query is the same
brute-force inverted-index SQL, so LSH recall bugs can't hide: a
missed pair is a hash mismatch, not a silent quality loss (band
parameters are sized so P(miss) < 1e-7 at the 0.8 threshold given the
corpus's similarity gap — see tests/test_dedup.py).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import shingles
from ..registry import register
from ..tables import load

# --- shared jaccard-pair SQL oracle (brute force, inverted index) ----

_JACCARD_ORACLE = """
    WITH sh AS (
      SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            for i in range(1, len(w) - 1)]) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ), e AS (
      SELECT doc_id, unnest(s) AS shingle FROM sh
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), sz AS (
      SELECT doc_id, len(s) AS n FROM sh
    )
    SELECT doc_a, doc_b,
           round(pairs.inter * 1.0 / (sa.n + sb.n - pairs.inter), 6) AS jaccard
    FROM pairs
    JOIN sz sa ON sa.doc_id = pairs.doc_a
    JOIN sz sb ON sb.doc_id = pairs.doc_b
    WHERE pairs.inter * 1.0 / (sa.n + sb.n - pairs.inter) >= 0.8
"""

JACCARD_THRESHOLD = 0.8


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return docs.select("doc_id", shingles("text", 3).alias("s"))


def _verify_pairs(cand: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact-Jaccard verification of candidate (doc_a, doc_b) pairs via
    per-pair array_intersect — no shingle explosion."""
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(inter / union >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


@register(
    "dedup_exact_keep_first",
    oracle="""
    SELECT user_id, event_type, event_id, ts
    FROM (
      SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="Exact dedup, keep-first-by-time per key. row_number over a "
    "total order (never dropDuplicates, whose survivor is partition-"
    "order-dependent) — deterministic on replayed/at-least-once data, "
    "the §1.4 duplicate-row scenario.",
)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.select("user_id", "event_type", "event_id", "ts", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "dedup_exact_hash",
    oracle="""
    SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    doc="Exact content dedup via hash-groupBy: md5(text) as the group "
    "key (at 100 TB the 16-byte digest shuffles instead of the text).",
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return docs.groupBy(F.md5("text").alias("text_md5")).agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


@register(
    "dedup_ngram_jaccard",
    oracle=_JACCARD_ORACLE,
    doc="Exact all-pairs 3-gram Jaccard >= 0.8 via inverted shingle "
    "index: explode distinct shingles -> equi-join on shingle -> count "
    "intersections -> filter. The exact baseline the LSH variants are "
    "verified against.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _doc_shingles(spark, sf_dir)
    e = sh.select("doc_id", F.explode("s").alias("shingle"))
    ea = e.select(F.col("doc_id").alias("doc_a"), "shingle")
    eb = e.select(F.col("doc_id").alias("doc_b"), "shingle")
    pairs = (
        ea.join(eb, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz = sh.select("doc_id", F.size("s").alias("n"))
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# --- MinHash + LSH ---------------------------------------------------

N_PERM = 64
BAND_ROWS = 4  # 16 bands x 4 rows: P(miss | s=0.9) ~ 4e-8
_MERSENNE = 1_000_000_007

_rng = random.Random(20260813)
_PERM_A = [_rng.randrange(1, _MERSENNE) for _ in range(N_PERM)]
_PERM_B = [_rng.randrange(0, _MERSENNE) for _ in range(N_PERM)]


def minhash_signature(sh_col) -> F.Column:
    """64-perm MinHash signature as an array<bigint>, all inside
    codegen (nested HOFs, no UDF, no shuffle).

    Universal hashing h_i(s) = (A_i * x + B_i) mod p over
    x = xxhash64(s) mod p; products stay < 2^61 so ANSI-mode 64-bit
    arithmetic cannot overflow.
    """
    a = F.array(*[F.lit(x) for x in _PERM_A])
    b = F.array(*[F.lit(x) for x in _PERM_B])
    base = F.transform(sh_col, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))
    return F.transform(
        F.sequence(F.lit(0), F.lit(N_PERM - 1)),
        lambda i: F.aggregate(
            base,
            F.lit(_MERSENNE).cast("bigint"),
            lambda m, x: F.least(
                m, F.pmod(F.element_at(a, i + 1) * x + F.element_at(b, i + 1), F.lit(_MERSENNE))
            ),
        ),
    )


@register(
    "dedup_minhash_lsh",
    oracle=_JACCARD_ORACLE,
    doc="MinHash(64) + LSH(16 bands x 4 rows) candidates, exact-Jaccard "
    "verified — same result contract as dedup_ngram_jaccard, but the "
    "join is on band keys: at 100 TB each doc meets only its bucket, "
    "not every doc sharing any shingle.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _doc_shingles(spark, sf_dir).filter(F.size("s") > 0)
    sig = sh.select("doc_id", minhash_signature(F.col("s")).alias("sig"))
    n_bands = N_PERM // BAND_ROWS
    # bands unrolled at plan-build time (band count is a static const)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                F.hash(F.slice("sig", j * BAND_ROWS + 1, BAND_ROWS)).alias("band_key"),
            )
            for j in range(n_bands)
        ]
    )
    bands = sig.select("doc_id", F.explode(band_structs).alias("b")).select(
        "doc_id", "b.band_idx", "b.band_key"
    )
    ba = bands.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_key")
    bb = bands.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_key")
    cand = (
        ba.join(bb, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _verify_pairs(cand, sh)


# --- SimHash ---------------------------------------------------------

SIMHASH_BANDS = 4  # 4 x 16-bit bands: pigeonhole-exact for hamming<=3
SIMHASH_MAX_HAMMING = 3


def simhash64_expr(shingle_col: str) -> F.Column:
    """64-bit SimHash of a shingle-set column, HOF-only (SQL expr form:
    SQL-side shiftright/shiftleft accept expression shift amounts,
    unlike the PySpark wrappers).

    bit_k = 1 iff sum over shingles of ±1 (by bit k of xxhash64) > 0.
    """
    return F.expr(
        f"""
        aggregate(
          sequence(0, 63),
          0L,
          (acc, k) -> acc + if(
            aggregate(transform({shingle_col}, s -> xxhash64(s)), 0L,
                      (c, h) -> c + if((shiftright(h, k) & 1L) = 1L, 1L, -1L)) > 0,
            shiftleft(1L, k), 0L))
        """
    )


@register(
    "dedup_simhash",
    oracle=None,  # xxhash64 has no DuckDB twin -> rows-only; exactness
    # vs in-Spark brute force is asserted in tests/test_dedup.py
    doc="SimHash near-dup: pairs with hamming(simhash64) <= 3. The "
    "4-band x 16-bit split is pigeonhole-EXACT for that radius (any "
    "such pair shares a clean band), so banding is a pure speedup with "
    "provably zero recall loss — verified against an in-Spark "
    "brute-force cross join in tests.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _doc_shingles(spark, sf_dir).filter(F.size("s") > 0)
    sigs = sh.select("doc_id", simhash64_expr("s").alias("sim"))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                F.shiftright(F.col("sim"), j * 16).bitwiseAND(F.lit(0xFFFF)).alias("band_key"),
            )
            for j in range(SIMHASH_BANDS)
        ]
    )
    bands = sigs.select("doc_id", "sim", F.explode(band_structs).alias("b")).select(
        "doc_id", "sim", "b.band_idx", "b.band_key"
    )
    ba = bands.select(F.col("doc_id").alias("doc_a"), F.col("sim").alias("sim_a"), "band_idx", "band_key")
    bb = bands.select(F.col("doc_id").alias("doc_b"), F.col("sim").alias("sim_b"), "band_idx", "band_key")
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        ba.join(bb, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()
    )


@register(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.42
    """,
    doc="Embedding near-dup pairs: cosine >= 0.42 (threshold sits in a "
    ">1e-2 similarity gap of the corpus). Spark's HOF fold and DuckDB's "
    "list_cosine_similarity are bit-identical (verified over 14k "
    "pairs). Local impl is the O(n²) exact join over the small corpus; "
    "the ANN operators in similarity.py are the 100 TB path.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import cosine, to_double

    e = load(spark, "embeddings", sf_dir)
    a = e.select(F.col("vec_id").alias("vec_a"), to_double("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), to_double("embedding").alias("eb"))
    cos = cosine(F.col("ea"), F.col("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim_raw", cos)
        .filter(F.col("cos_sim_raw") >= 0.42)
        .select("vec_a", "vec_b", F.round("cos_sim_raw", 6).alias("cos_sim"))
    )
