"""Deduplication operators (SURVEY.md §2-D1/D2): exact, n-gram
Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

No reference counterpart (the reference even disables ClickHouse's
insert dedup, app/clickhouse_db.py:23); these are the north-star
LLM-corpus operators, designed 100-TB-first:

- Shingles and signatures (minhash/simhash) are built with exploded
  rows + whole-stage-codegen expressions and map-side-combining
  aggregates (higher-order-function folds run interpreted and
  measured ~100x slower — see _doc_shingles_exploded).
- Candidate generation joins on band keys (equi-join, AQE-skew-safe),
  never a cross join.
- Verification equi-joins candidates against the exploded shingle
  table — O(candidate docs' shingles), not O(n²).
- The exact-Jaccard operator uses an inverted shingle index
  (explode → equi-join → count), the standard all-pairs similarity
  shape, with a document-frequency cutoff (SHINGLE_DF_CAP) so a viral
  boilerplate shingle cannot blow up the pair join at corpus scale.

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

from ..plans.stage import (
    drop_checkpoint_dir,
    eager_release,
    plans_are_lazy,
    stage_checkpoint,
    stage_checkpoint_with_path,
)
from ..registry import register
from ..tables import load

# --- shared jaccard-pair SQL oracle (brute force, inverted index) ----

_JACCARD_ORACLE = """
    WITH sh AS (
      SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            for i in range(1, len(w) - 1)]) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ), e0 AS (
      SELECT doc_id, unnest(s) AS shingle FROM sh
    ), hot AS (
      -- document-frequency cap, mirrored from the Spark side: the
      -- shingle universe excludes viral shingles SYMMETRICALLY, for
      -- intersections AND set sizes (no-op on this corpus)
      SELECT shingle FROM e0 GROUP BY shingle HAVING count(*) > 1000
    ), e AS (
      SELECT * FROM e0 WHERE shingle NOT IN (SELECT shingle FROM hot)
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), sz AS (
      SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id
    )
    SELECT doc_a, doc_b,
           round(pairs.inter * 1.0 / (sa.n + sb.n - pairs.inter), 6) AS jaccard
    FROM pairs
    JOIN sz sa ON sa.doc_id = pairs.doc_a
    JOIN sz sb ON sb.doc_id = pairs.doc_b
    WHERE pairs.inter * 1.0 / (sa.n + sb.n - pairs.inter) >= 0.8
"""

JACCARD_THRESHOLD = 0.8

# Document-frequency cap on the shingle universe: a shingle appearing
# in k docs contributes k² rows to the inverted-index pair join, so
# viral boilerplate shingles are removed from the universe entirely —
# SYMMETRICALLY for intersections and set sizes, in every shingle
# operator AND in the SQL oracle (which mirrors the cap), so Jaccard
# stays a true similarity over the capped universe and Spark/oracle
# parity holds on any corpus. A no-op whenever no shingle exceeds the
# cap — asserted for the testdata corpus in tests/test_dedup.py.
SHINGLE_DF_CAP = 1000  # keep in sync with the HAVING clause above


def _drop_hot_shingles(e: DataFrame, cap: int = SHINGLE_DF_CAP) -> DataFrame:
    """Remove shingles whose document frequency exceeds `cap`.

    The hot set is tiny by construction (only shingles shared by >cap
    docs), so it broadcasts and the anti-join adds no shuffle of `e`.
    """
    hot = (
        e.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > cap)
        .select("shingle")
    )
    return e.join(F.broadcast(hot), "shingle", "left_anti")


def _shingles_exploded(docs: DataFrame, cap: int | None = SHINGLE_DF_CAP) -> DataFrame:
    """(doc_id, shingle) distinct rows from a (doc_id, text, ...) frame —
    the hot-path shingle shape, with the document-frequency cap applied
    (cap=None disables it).

    posexplode + window lead + concat stays in whole-stage codegen;
    the equivalent higher-order `transform` runs interpreted and
    measured ~8 s alone at sf0.1 (~30 µs/shingle of lambda overhead).
    One shuffle on doc_id (the window), then distinct. A zero-shuffle
    alternative was A/B-measured and REJECTED: assembling trigrams
    array-side via ``arrays_zip(t, slice(t,2,..), slice(t,3,..))``
    avoids the window exchange but allocates ~4 array copies per
    document (split + two slices + the zipped struct array), and the
    operator end-to-end ran 5.1-15.7 s vs 4.0-4.7 s at sf0.1 —
    allocation pressure beat the saved exchange. Row-streaming
    through the window keeps per-row state flat.

    The shingle column is the 8-byte xxhash64 of the trigram, not the
    string: every consumer (minhash/simhash signatures, the inverted-
    index pair join, the verify join, the DF cap) only ever tests
    shingle EQUALITY, so hashing first means the distinct, the
    checkpoint files, and every downstream shuffle carry fixed 8-byte
    keys instead of ~25-byte strings. Equality-up-to-collision: with
    ~2^20 distinct shingles per corpus partition the any-collision
    probability is ~2^40/2^65 ≈ 3e-8 — far below the LSH band-miss
    rate that already bounds the operators' exactness contract.
    """
    from pyspark.sql import Window

    # Shuffle the NARROW doc rows by doc_id BEFORE the token explode
    # (round-15, guide §2.3/§2.5): the lead-window below needs doc_id
    # clustering either way, but without this the exchange sat ABOVE
    # the explode and carried one row per TOKEN (the same text bytes
    # plus ~16B/row of id+pos overhead), while the tokenize/explode
    # itself ran at the SCAN's parallelism — one task on a one-split
    # local file, one task per 128MB split at scale. Moving the
    # exchange below the explode shuffles doc-sized rows once and
    # runs explode+window+hash at cluster parallelism (never a
    # constant). The count is explicit because AQE would otherwise
    # coalesce this deliberately-small exchange back to one partition
    # and re-serialize the compute; it is size-adaptive (round-16,
    # plans/partitioning.py) so at 100 TB the per-partition input
    # stays bounded instead of growing with data-per-core.
    from ..plans.partitioning import fanout_partitions

    t = docs.repartition(fanout_partitions(docs), "doc_id").select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    t1, t2 = F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
    e = (
        t.select(
            "doc_id",
            F.concat_ws(" ", F.col("tok"), t1, t2).alias("_sh"),
            t2.alias("_t2"),
        )
        .filter(F.col("_t2").isNotNull())
        .select("doc_id", F.xxhash64("_sh").alias("shingle"))
        .distinct()
    )
    if cap is None:
        return e
    return _drop_hot_shingles(e, cap)


def _doc_shingles_exploded(
    spark: SparkSession, sf_dir: str, cap: int | None = SHINGLE_DF_CAP
) -> DataFrame:
    """`_shingles_exploded` over the full documents table."""
    return _shingles_exploded(load(spark, "documents", sf_dir), cap)


def _shingle_sizes(e: DataFrame) -> DataFrame:
    return e.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))


def _verify_pairs(
    cand: DataFrame,
    e: DataFrame,
    restrict_to_candidates: bool = False,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Exact-Jaccard verification of candidate (doc_a, doc_b) pairs:
    intersection via equi-join of the candidates against the exploded
    shingle table.

    `sizes` (doc_id, n) lets callers reuse shingle-set sizes already
    computed in another aggregate (minhash fuses them into the
    signature groupBy) instead of re-shuffling `e` a third time.

    `restrict_to_candidates` first narrows the shingle table to
    candidate docs with a broadcast semi-join, so the intersection
    joins shuffle only candidate shingles instead of the full corpus —
    the right shape when the corpus is huge relative to the candidate
    set (100 TB). It is OFF by default because A/B measurement at
    sf0.1 (5k docs, 256 candidate pairs) showed the broadcast barrier
    costs more than the avoided shuffle at local scale: verify-only
    0.8 s pipelined vs 1.9 s restricted, end-to-end median 4.7 s vs
    9.8 s. Flip it when candidate_docs << corpus_docs no longer holds
    the shuffles in memory."""
    if restrict_to_candidates:
        docs = (
            cand.select(F.col("doc_a").alias("doc_id"))
            .union(cand.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        e = e.join(F.broadcast(docs), "doc_id", "left_semi")
    ea = e.select(F.col("doc_id").alias("doc_a"), "shingle")
    eb = e.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(ea, "doc_a")
        .join(eb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if sizes is None:
        sizes = _shingle_sizes(e)
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
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
    "verified against. The shingle universe excludes hot shingles "
    "above SHINGLE_DF_CAP symmetrically (intersections and sizes; "
    "mirrored in the oracle) — a no-op on corpora without viral "
    "boilerplate, asserted in tests.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the shingle table feeds THREE plan branches (both join sides +
    # the size aggregate) — cache it once or the dominant shingling
    # stage executes three times per run; released via eager_release
    e = _doc_shingles_exploded(spark, sf_dir).persist()
    ea = e.select(F.col("doc_id").alias("doc_a"), "shingle")
    eb = e.select(F.col("doc_id").alias("doc_b"), "shingle")
    pairs = (
        ea.join(eb, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz = _shingle_sizes(e)
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    out = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )
    return eager_release(out, "jaccard_pairs", e)


CONTAINMENT_THRESHOLD = 0.9

_CONTAINMENT_ORACLE = """
    WITH sh AS (
      SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            for i in range(1, len(w) - 1)]) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ), e0 AS (
      SELECT doc_id, unnest(s) AS shingle FROM sh
    ), hot AS (
      SELECT shingle FROM e0 GROUP BY shingle HAVING count(*) > 1000
    ), e AS (
      SELECT * FROM e0 WHERE shingle NOT IN (SELECT shingle FROM hot)
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), sz AS (
      SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id
    )
    SELECT doc_a, doc_b,
           round(pairs.inter * 1.0 / least(sa.n, sb.n), 6) AS containment
    FROM pairs
    JOIN sz sa ON sa.doc_id = pairs.doc_a
    JOIN sz sb ON sb.doc_id = pairs.doc_b
    WHERE pairs.inter * 1.0 / least(sa.n, sb.n) >= 0.9
"""


@register(
    "dedup_containment",
    oracle=_CONTAINMENT_ORACLE,
    doc="Shingle-set CONTAINMENT >= 0.9 (intersection over the "
    "smaller set) — the asymmetric near-dup measure that catches a "
    "short document embedded verbatim in a longer one, which Jaccard "
    "misses because the union is dominated by the longer side "
    "(quote-farm and wrapper-page dedup). Same inverted-index "
    "equi-join shape and DF cap as dedup_ngram_jaccard; only the "
    "final similarity expression differs, so the scale story is "
    "identical: shuffles carry 8-byte shingle keys, never O(n^2).",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _doc_shingles_exploded(spark, sf_dir).persist()
    ea = e.select(F.col("doc_id").alias("doc_a"), "shingle")
    eb = e.select(F.col("doc_id").alias("doc_b"), "shingle")
    pairs = (
        ea.join(eb, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz = _shingle_sizes(e)
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    cont = F.col("inter") / F.least("na", "nb")
    out = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(cont >= CONTAINMENT_THRESHOLD)
        .select("doc_a", "doc_b", F.round(cont, 6).alias("containment"))
    )
    return eager_release(out, "containment_pairs", e)


# --- MinHash + LSH ---------------------------------------------------

N_PERM = 64
BAND_ROWS = 4  # 16 bands x 4 rows: P(miss | s=0.9) ~ 4e-8
_MERSENNE = 1_000_000_007

_rng = random.Random(20260813)
_PERM_A = [_rng.randrange(1, _MERSENNE) for _ in range(N_PERM)]
_PERM_B = [_rng.randrange(0, _MERSENNE) for _ in range(N_PERM)]


def minhash_signatures(e: DataFrame) -> DataFrame:
    """(doc_id, shingle) exploded → (doc_id, sig: array<bigint>[64]).

    Explode + groupBy with 64 codegen'd `min` aggregates — NOT a
    higher-order-function fold: Spark evaluates HOF lambdas in
    interpreted mode per element, which measured ~400 s at sf0.1;
    this whole-stage-codegen shape runs the same math in seconds.
    Map-side partial mins reduce each partition to one row per doc
    before the shuffle (~64*8 bytes per doc on the wire at any scale).

    Universal hashing h_i(s) = (A_i * x + B_i) mod p over
    x = xxhash64(s) mod p (the shingle column from _shingles_exploded
    already IS xxhash64 of the trigram, so no re-hash); products stay
    < 2^61 so ANSI-mode 64-bit arithmetic cannot overflow.

    The shingle-set size rides along as a 65th aggregate (`n`) so the
    Jaccard verify step gets its denominators from this one shuffle
    instead of a second groupBy over the shingle table.
    """
    x = F.pmod(F.col("shingle"), F.lit(_MERSENNE))
    e = e.select("doc_id", x.alias("x"))
    mins = [
        F.min(F.pmod(F.lit(_PERM_A[i]) * F.col("x") + F.lit(_PERM_B[i]), F.lit(_MERSENNE))).alias(
            f"_h{i}"
        )
        for i in range(N_PERM)
    ]
    grouped = e.groupBy("doc_id").agg(*mins, F.count(F.lit(1)).alias("n"))
    return grouped.select(
        "doc_id", F.array(*[F.col(f"_h{i}") for i in range(N_PERM)]).alias("sig"), "n"
    )


def minhash_bands(sig: DataFrame) -> DataFrame:
    """(doc_id, sig, ...) → (doc_id, band_idx, band_key): hash each
    BAND_ROWS-slice of the signature to a band key, one row per band.
    THE single banding implementation — the batch candidate join and
    the streaming dedup-ingest index both call this, so the hashing
    (not just the constants) cannot drift between them."""
    n_bands = N_PERM // BAND_ROWS
    band_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                F.hash(F.slice("sig", j * BAND_ROWS + 1, BAND_ROWS)).alias("band_key"),
            )
            for j in range(n_bands)
        ]
    )
    return sig.select("doc_id", F.explode(band_structs).alias("b")).select(
        "doc_id", "b.band_idx", "b.band_key"
    )


def _band_candidates(sig: DataFrame) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs from minhash signatures: band
    the signatures (minhash_bands), equi-join on (band_idx, band_key),
    dedup. Shared by dedup_minhash_lsh and corpus_clean_pipeline so
    band parameters can never drift between them."""
    bands = minhash_bands(sig)
    ba = bands.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_key")
    bb = bands.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_key")
    return (
        ba.join(bb, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


@register(
    "dedup_minhash_lsh",
    oracle=_JACCARD_ORACLE,
    doc="MinHash(64) + LSH(16 bands x 4 rows) candidates, exact-Jaccard "
    "verified — same result contract as dedup_ngram_jaccard, but the "
    "join is on band keys: at 100 TB each doc meets only its bucket, "
    "not every doc sharing any shingle. Recall bound: a true pair at "
    "Jaccard exactly 0.8 misses all 16 bands with p ~ (1-0.8^4)^16 ~ "
    "2e-4 (lower above the threshold), so exact-oracle parity is a "
    "property of this corpus, not of the algorithm — if a regenerated "
    "corpus ever breaks parity here, suspect band-miss at the "
    "threshold boundary before suspecting a code regression.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the shingle table feeds 3 plan branches (signatures, both sides
    # of the verify join) and the tiny signature table feeds bands AND
    # the verify denominators — persist both at memory speed, compute
    # the (small) pair result eagerly to scratch, then drop the caches
    # before returning: multi-consumer reuse without the round-2
    # operator-scope persist leak, and without writing the big shingle
    # table to disk.
    e = _doc_shingles_exploded(spark, sf_dir).persist()
    sig = minhash_signatures(e).persist()
    cand = _band_candidates(sig)
    out = _verify_pairs(cand, e, sizes=sig.select("doc_id", "n"))
    return eager_release(out, "lsh_pairs", e, sig)


# --- SimHash ---------------------------------------------------------

SIMHASH_MAX_HAMMING = 4
# 5 bands (13+13+13+13+12 = 64 bits): pigeonhole-exact for hamming<=4
# (any pair differing in <= 4 bits leaves >= 1 of 5 bands clean). The
# radius is sized to the signal: at J~0.99 the per-bit flip
# probability (~theta/pi ~ 0.045) puts E[hamming] ~ 2.9, sd ~ 1.7, so
# radius 3 sat ON the mean and coin-flipped real near-dups; radius 4
# captures ~1 sd above it. Narrower 12-13-bit band keys admit more
# false candidates than 16-bit ones — the standard radius/candidate
# trade — and every candidate still pays the exact hamming verify.
_SIMHASH_BAND_BOUNDS = ((0, 13), (13, 13), (26, 13), (39, 13), (52, 12))
SIMHASH_BANDS = len(_SIMHASH_BAND_BOUNDS)


def _simhash_band_key(lo: str, hi: str, start: int, width: int, shr) -> str:
    """Band-key bits [start, start+width) of the 64-bit signature,
    extracted from its two non-negative 32-bit halves as pure
    arithmetic (a half-crossing band combines via multiply-add, so no
    shift ever meets a sign bit on either engine). ``shr`` renders a
    right shift in the target dialect."""
    mask = (1 << width) - 1
    if start + width <= 32:
        return f"(({shr(lo, start)}) & {mask})"
    if start >= 32:
        return f"(({shr(hi, start - 32)}) & {mask})"
    lo_bits = 32 - start
    hi_bits = width - lo_bits
    return (
        f"((({shr(lo, start)}) & {(1 << lo_bits) - 1}) + "
        f"(({hi} & {(1 << hi_bits) - 1}) * {1 << lo_bits}))"
    )


def simhash_md5_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, text, ...) frame → (doc_id, sim_lo, sim_hi): a 64-bit
    SimHash carried as TWO non-negative 32-bit halves.

    bit_k = 1 iff sum over the doc's trigram shingles of ±1 (by bit k
    of the shingle's hash) > 0. The bit source is two disjoint 8-hex
    windows of ONE md5 digest per shingle — the shared cross-engine
    kernel spec (functions/hashing.py) — so DuckDB reproduces every
    signature bit-for-bit and dedup_simhash is hash-checked, not
    rows-only (round-8 upgrade; the original xxhash64 bit source had
    no DuckDB twin). Two halves instead of one packed bigint because
    bit 63 would make the value negative and signed right-shift
    semantics on negatives are exactly the kind of cross-engine edge
    the determinism rules exist to avoid; halves stay in [0, 2^32).

    Same explode + groupBy codegen shape as minhash_signatures (HOF
    folds are interpreted and ~100x slower); 64 conditional-sum
    aggregates combine map-side, then one select packs the bits.
    """
    from pyspark.sql import Window

    # pre-explode doc_id repartition: same rationale as
    # _shingles_exploded (round-15) — the window exchange moves below
    # the explode (doc rows instead of token rows on the wire) and
    # the md5 signature math runs at cluster parallelism instead of
    # the scan's split count; size-adaptive count (round-16,
    # plans/partitioning.py)
    from ..plans.partitioning import fanout_partitions

    t = docs.repartition(fanout_partitions(docs), "doc_id").select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    t1, t2 = F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
    e = (
        t.select(
            "doc_id",
            F.concat_ws(" ", F.col("tok"), t1, t2).alias("_sh"),
            t2.alias("_t2"),
        )
        .filter(F.col("_t2").isNotNull())
        # TEXT shingles here (unlike _shingles_exploded's xxhash64):
        # the md5 windows below must hash the same string both engines
        # see. The DF-cap anti-join keys on the string instead of the
        # 8-byte hash — same plan shape, slightly wider keys, only on
        # this operator's path.
        .select("doc_id", F.col("_sh").alias("shingle"))
        .distinct()
    )
    e = _drop_hot_shingles(e, SHINGLE_DF_CAP)
    digest = F.md5("shingle")
    h1 = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(digest, 9, 8), 16, 10).cast("long")
    sums = []
    for half, name in ((h1, "lo"), (h2, "hi")):
        for k in range(32):
            sums.append(
                F.sum(
                    F.when(F.shiftright(half, k).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                ).alias(f"_b_{name}{k}")
            )
    g = e.groupBy("doc_id").agg(*sums)
    zero = F.lit(0).cast("bigint")

    def _pack(name: str):
        total = zero
        for k in range(32):
            total = total + F.when(
                F.col(f"_b_{name}{k}") > 0, F.lit(1 << k).cast("bigint")
            ).otherwise(zero)
        return total

    return g.select("doc_id", _pack("lo").alias("sim_lo"), _pack("hi").alias("sim_hi"))


def _simhash_bands_cte() -> str:
    """The shared WITH...bands prefix of every simhash oracle
    (signatures + banding mirrored from the same constants), so the
    pair oracle and the occupancy oracle can never drift apart."""
    sums = []
    for half, name in (("h1", "lo"), ("h2", "hi")):
        for k in range(32):
            sums.append(
                f"sum(CASE WHEN ({half} >> {k}) & 1 = 1 THEN 1 ELSE -1 END)"
                f" AS b_{name}{k}"
            )
    packs = {
        name: " + ".join(
            f"(CASE WHEN b_{name}{k} > 0 THEN {1 << k} ELSE 0 END)" for k in range(32)
        )
        for name in ("lo", "hi")
    }
    duck_shr = lambda c, s: f"({c} >> {s})"  # noqa: E731
    band_cases = " ".join(
        f"WHEN {i} THEN {_simhash_band_key('sim_lo', 'sim_hi', st, w, duck_shr)}"
        for i, (st, w) in enumerate(_SIMHASH_BAND_BOUNDS)
    )
    band_vals = ", ".join(f"({i})" for i in range(SIMHASH_BANDS))
    return f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            for i in range(1, len(w) - 1)]) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ), e0 AS (
      SELECT doc_id, unnest(s) AS shingle FROM sh
    ), hot AS (
      SELECT shingle FROM e0 GROUP BY shingle HAVING count(*) > {SHINGLE_DF_CAP}
    ), e AS (
      SELECT * FROM e0 WHERE shingle NOT IN (SELECT shingle FROM hot)
    ), hx AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h1,
             CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS h2
      FROM e
    ), sums AS (
      SELECT doc_id, {", ".join(sums)} FROM hx GROUP BY doc_id
    ), sig AS (
      SELECT doc_id,
             CAST({packs["lo"]} AS BIGINT) AS sim_lo,
             CAST({packs["hi"]} AS BIGINT) AS sim_hi
      FROM sums
    ), bands AS (
      SELECT doc_id, sim_lo, sim_hi, band_idx,
             CASE band_idx {band_cases}
             END AS band_key
      FROM sig, (VALUES {band_vals}) t(band_idx)
    )"""


def simhash_bands(sigs: DataFrame) -> DataFrame:
    """(doc_id, sim_lo, sim_hi) -> one row per (doc_id, band_idx,
    band_key) — THE single Spark banding implementation (the pair
    join and the occupancy profile both consume it)."""
    spark_shr = lambda c, s: f"shiftright({c}, {s})"  # noqa: E731
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_idx"),
                F.expr(
                    _simhash_band_key("sim_lo", "sim_hi", st, w, spark_shr)
                ).alias("band_key"),
            )
            for i, (st, w) in enumerate(_SIMHASH_BAND_BOUNDS)
        ]
    )
    return sigs.select(
        "doc_id", "sim_lo", "sim_hi", F.explode(band_structs).alias("b")
    ).select("doc_id", "sim_lo", "sim_hi", "b.band_idx", "b.band_key")


def _simhash_oracle() -> str:
    ham = "bit_count(xor(a.sim_lo, b.sim_lo)) + bit_count(xor(a.sim_hi, b.sim_hi))"
    return f"""{_simhash_bands_cte()}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST({ham} AS BIGINT) AS hamming
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    WHERE {ham} <= {SIMHASH_MAX_HAMMING}
    """


@register(
    "dedup_simhash",
    oracle=_simhash_oracle(),
    doc="SimHash near-dup: pairs with hamming(simhash64) <= 4. The "
    "5-band split (13/13/13/13/12 bits) is pigeonhole-EXACT for that "
    "radius (any such pair shares a clean band): a pure speedup with "
    "provably zero recall loss — verified against an in-Spark "
    "brute-force cross join in tests AND hash-checked end to end: the "
    "md5-window bit source (functions/hashing.py kernel) lets DuckDB "
    "recompute every signature, band key, and hamming distance "
    "bit-for-bit (upgraded from rows-only in round 8). The signature "
    "is carried as two unsigned 32-bit halves so no shift ever "
    "touches a sign bit on either engine.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    # the signature table feeds both sides of the band self-join —
    # cache it so the 64-sum aggregate runs once; released via
    # eager_release below
    sigs = simhash_md5_signatures(docs).persist()
    bands = simhash_bands(sigs)
    ba = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sim_lo").alias("lo_a"),
        F.col("sim_hi").alias("hi_a"),
        "band_idx",
        "band_key",
    )
    bb = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sim_lo").alias("lo_b"),
        F.col("sim_hi").alias("hi_b"),
        "band_idx",
        "band_key",
    )
    hamming = F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b"))) + F.bit_count(
        F.col("hi_a").bitwiseXOR(F.col("hi_b"))
    )
    out = (
        ba.join(bb, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()
    )
    return eager_release(out, "simhash_pairs", sigs)


@register(
    "corpus_clean_pipeline",
    oracle=f"""
    WITH quality AS (
      SELECT doc_id, text, lang, n_chars,
             CAST(least(len(string_split(text, ' ')), 100) AS DOUBLE) / 100.0
             * (CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                                t -> t IN ('the','a','of','and','to','in','is','it','for','on')))
                          AS DOUBLE)
                          / len(string_split(text, ' ')) > 0.05
                     THEN 1.0 ELSE 0.5 END) AS q
      FROM documents
    ), passed AS (
      SELECT * FROM quality WHERE q >= 0.5
    ), exact_survivors AS (
      SELECT min(doc_id) AS doc_id FROM passed GROUP BY md5(text)
    ), sh AS (
      SELECT p.doc_id,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            for i in range(1, len(w) - 1)]) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM passed) p
      JOIN exact_survivors es ON es.doc_id = p.doc_id
    ), e0 AS (
      SELECT doc_id, unnest(s) AS shingle FROM sh
    ), hot AS (
      SELECT shingle FROM e0 GROUP BY shingle HAVING count(*) > 1000
    ), e AS (
      SELECT * FROM e0 WHERE shingle NOT IN (SELECT shingle FROM hot)
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), sz AS (
      SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id
    ), near_dropped AS (
      SELECT DISTINCT pairs.doc_b AS doc_id
      FROM pairs
      JOIN sz sa ON sa.doc_id = pairs.doc_a
      JOIN sz sb ON sb.doc_id = pairs.doc_b
      WHERE pairs.inter * 1.0 / (sa.n + sb.n - pairs.inter) >= {JACCARD_THRESHOLD}
    )
    SELECT p.doc_id, p.lang, p.n_chars, round(p.q, 6) AS quality
    FROM passed p
    JOIN exact_survivors es ON es.doc_id = p.doc_id
    WHERE p.doc_id NOT IN (SELECT doc_id FROM near_dropped)
    """,
    doc="The composed LLM-corpus cleaning pass a pretraining pipeline "
    "runs end-to-end: quality gate (score >= 0.5) -> exact dedup "
    "(md5 groupBy keep-min-doc_id + semi-join back, so the exchange "
    "carries 16-byte digests and ids — never full document text) -> "
    "near-dup removal (a doc is dropped when it has a >= 0.8-Jaccard "
    "twin with a smaller id — the deterministic keep-lowest rule, no "
    "transitive chasing). Every stage is the scale shape used by its "
    "standalone operator, and the fan-out stages (exact survivors; "
    "their shingle table; signatures) are memory-persisted across "
    "their consumers instead of re-derived per plan branch (best-"
    "effort caching — eviction recomputes a stage; the narrow final "
    "survivor projection is the one storage-checkpointed artifact, "
    "and every cache is dropped before the call returns). LSH recall bound: a true pair at Jaccard exactly 0.8 "
    "misses all 16 bands with p ~ (1-0.8^4)^16 ~ 2e-4, so exact-oracle "
    "parity is corpus-dependent by design — a parity break after a "
    "corpus regeneration is expected LSH recall loss at the threshold "
    "boundary, not a code regression (see tests/test_dedup.py for the "
    "band-parameter math).",
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import quality_score

    d = load(spark, "documents", sf_dir)
    passed = d.select(
        "doc_id", "text", "lang", "n_chars", quality_score("text").alias("q")
    ).filter(F.col("q") >= 0.5)
    # exact dedup: keep the smallest doc_id per content hash. groupBy
    # on the digest + semi-join back (the oracle's own shape) — NOT a
    # row_number window over md5(text), which would shuffle the full
    # corpus text; here only (digest, id) pairs cross the exchange and
    # the survivor-id side of the semi-join broadcasts under AQE.
    survivor_ids = (
        passed.groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # `exact` feeds two consumers (the shingle branch and the final
    # anti-join) — cache it so quality scoring + dedup run once;
    # released via eager_release at the end
    exact = passed.join(survivor_ids, "doc_id", "left_semi").persist()
    # near-dup removal among exact survivors only, via the LSH path
    # (4x cheaper than the inverted-index pair join at sf0.1 and the
    # only viable shape at corpus scale): minhash band candidates,
    # exact-Jaccard verified — same pairs as the exact join on this
    # corpus, as tests/test_dedup.py::test_minhash_lsh_matches_exact
    # asserts. Shingling uses the codegen posexplode+window shape
    # (the interpreted HOF measured ~2x slower at sf0.1); the shingle
    # table feeds signatures AND both sides of the verify join.
    sh = _shingles_exploded(exact).persist()
    sig = minhash_signatures(sh).persist()
    cand = _band_candidates(sig)
    dropped = (
        _verify_pairs(cand, sh, sizes=sig.select("doc_id", "n"))
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    out = exact.join(dropped, "doc_id", "left_anti").select(
        "doc_id", "lang", "n_chars", F.round("q", 6).alias("quality")
    )
    # the survivor projection is narrow (4 scalar columns, no text) —
    # the one eager scratch write is cheap; all three fan-out caches
    # (exact survivors, shingles, signatures) are dropped on return
    return eager_release(out, "clean_survivors", exact, sh, sig)


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


def _embedding_lsh_oracle() -> str:
    """Full DuckDB mirror of the SRP banding (round-7 upgrade from
    rows-only): the hyperplanes are Python literals, so the oracle
    recomputes the band keys with list_dot_product and reproduces the
    candidate set exactly — the recall<1 operating point is part of
    the CHECKED contract, not a reason to skip checking. Only SIGN
    bits enter band keys (sign flips need |dot| ~ 1e-13), and the
    verify cosine is computed from raw embeddings on both sides."""
    from .similarity import _PLANES_SQL, LSH_BANDS, N_PLANES

    bpb = N_PLANES // LSH_BANDS
    return f"""
    WITH planes(idx, plane) AS (VALUES {_PLANES_SQL}),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    bits AS (
      SELECT v.vec_id, p.idx,
             CASE WHEN list_dot_product(v.emb, p.plane) > 0 THEN 1 ELSE 0 END AS bit
      FROM v, planes p
    ),
    bands AS (
      SELECT vec_id, idx // {bpb} AS band_idx,
             CAST(sum(bit << (idx % {bpb})) AS INT) AS band_key
      FROM bits GROUP BY vec_id, idx // {bpb}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bands a JOIN bands b USING (band_idx, band_key)
      WHERE a.vec_id < b.vec_id
    )
    SELECT cand.vec_a, cand.vec_b,
           round(list_cosine_similarity(va.emb, vb.emb), 6) AS cos_sim
    FROM cand
    JOIN v va ON va.vec_id = cand.vec_a
    JOIN v vb ON vb.vec_id = cand.vec_b
    WHERE list_cosine_similarity(va.emb, vb.emb) >= 0.42
    """


@register(
    "dedup_embedding_lsh",
    oracle=_embedding_lsh_oracle(),
    doc="Embedding near-dup pairs, the 100 TB path: SRP-LSH band-key "
    "buckets (reusing similarity._band_keys' Arrow/numpy matmul) "
    "generate candidates, exact cosine >= 0.42 verifies them — every "
    "emitted pair is exact, recall is the banding operating point "
    "(~0.8 at cos 0.42, higher for closer pairs). Hash-checked since "
    "round 7 against a full DuckDB mirror of the banding (the "
    "hyperplanes are literals — see similarity._PLANES_SQL); the "
    "exact twin dedup_embedding_cosine remains the recall baseline.",
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import cosine, to_double
    from .similarity import _band_keys

    e = load(spark, "embeddings", sf_dir).select(
        "vec_id", to_double("embedding").alias("vec")
    )
    # band keys computed ONCE (one Arrow/numpy matmul pass over the
    # corpus, cached and released via eager_release below) and carried
    # WITHOUT the vector payload — the candidate join and its dedup
    # shuffle 3 ints per row instead of 8 copies of every 64-double
    # embedding; vectors re-attach to the (small) candidate pair set
    # afterwards
    bands = e.select(
        "vec_id", F.posexplode(_band_keys(F.col("vec"))).alias("band_idx", "band_key")
    ).persist()
    ba = bands.select(F.col("vec_id").alias("vec_a"), "band_idx", "band_key")
    bb = bands.select(F.col("vec_id").alias("vec_b"), "band_idx", "band_key")
    cand = (
        ba.join(bb, ["band_idx", "band_key"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    va = e.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"))
    vb = e.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"))
    cos = cosine(F.col("va"), F.col("vb"))
    out = (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= 0.42)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cos_sim"))
    )
    return eager_release(out, "emb_pairs", bands)


# --- cluster canonicalization (connected components) -----------------

CC_MAX_ITERATIONS = 50
# Truncate label lineage every k rounds: labels appears THREE times in
# each round's plan (its union branch, the edge join, and both sides
# of the pointer-doubling self-join), so the logical plan TRIPLES per
# iteration — unbounded, plan construction/analysis alone OOMs the
# driver (originally found by the union-find property test; the
# doubling branch made even a 9-round chain spend minutes in analysis
# at k=6). A storage checkpoint resets the plan to a file scan; 3^2
# plan nodes between checkpoints keeps analysis trivial, and the
# rotated label snapshots are O(V) ids — small next to the per-round
# shuffle the algorithm already pays.
CC_CHECKPOINT_EVERY = 2

# Driver-fold ceiling for the two-tier closure (see docstring below):
# pair graphs up to this edge count close with one limit-collect + a
# driver union-find; larger graphs take the distributed iteration.
CC_DRIVER_FOLD_MAX = 100_000


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    force_distributed: bool = False,
) -> DataFrame:
    """(doc_id, canonical_id) for every vertex of the pair graph,
    canonical_id = the smallest doc_id in the vertex's connected
    component — distributed min-label propagation.

    Pair-emitting dedup operators stop at edges; an actual dedup
    decision needs components: with pairs (1,2) and (2,3), doc 3 must
    map to canonical 1 even though (1,3) was never emitted (the
    keep-lowest rule of corpus_clean_pipeline chases one hop only;
    this operator closes the transitive gap the way production
    pipelines do between candidate generation and survivor choice).

    Shape per iteration: one equi-join (edges ⋈ labels on src), one
    labels self-join (pointer doubling), one map-side-combined min
    aggregate. Plain neighbor propagation converges in O(diameter)
    rounds — fine for dense boilerplate families, a cliff for
    CHAIN-shaped components (a versioned document each revision
    near-dup to the next: a 2 000-link chain would blow the iteration
    guard). The doubling term label(label(v)) forwards each vertex to
    its representative's representative, so reach doubles per round
    and convergence is O(log diameter) — the standard fix (pointer
    jumping / hash-to-min, Kiveris et al.'s star operations are the
    same idea). Labels only ever decrease (both terms yield ids from
    the vertex's own component), so sum(label) stays a monotone
    convergence metric: one scalar aggregate per round decides the
    fixpoint, no row-level old-vs-new comparison join. The sum
    accumulates in DECIMAL(38,0) — at 1e10+ vertices with large ids a
    bigint sum would overflow (throw under ANSI; silently wrap
    otherwise, where a wrap coinciding across rounds could falsely
    signal convergence). CC_MAX_ITERATIONS=50 is a runaway guard, not
    a tuning knob: with doubling it covers any graph that fits in
    storage (diameter 2^49).

    ``pairs`` is persisted while the symmetrized edge list is
    storage-checkpointed (the union embeds the pair plan TWICE — an
    unmaterialized O(n²) pair source would execute twice in that one
    write without the cache), then every iteration scans the
    checkpoint's columnar files. All caches, including each round's
    labels, are released on every exit path.

    TWO-TIER (round 14, the merge_components pattern): the iterative
    machinery above carries a FIXED control-plane cost — the edge
    checkpoint write plus >=2 iteration jobs each ending in a
    convergence collect — that dwarfs the actual work when the pair
    graph is small. Up to CC_DRIVER_FOLD_MAX edges (100k, ~1.6 MB as
    two longs each — bounded driver metadata under the same
    discipline as the convergence scalars themselves) the closure is
    ONE limit-collect plus a driver union-find with identical
    min-label semantics; past it the distributed path runs
    unchanged. The threshold variable is EDGE count, not corpus
    size: a 100 TB dedup run emits billions of pairs and takes the
    distributed path it needs, while a funnel/report query whose
    match graph is thousands of edges stops paying seconds of
    per-call scheduling overhead. The union-find property tests are
    parametrized to force BOTH tiers.

    At 100 TB: edges carry two longs per near-dup pair (no text, no
    signatures); each iteration shuffles O(E) longs. Skewed hub
    vertices are AQE's skew-join case, and the driver sees one scalar
    per round — nothing else leaves the executors.

    ``force_distributed`` (round-15): skip the tier probe and run the
    distributed path directly. For callers that ALREADY know the edge
    count is over CC_DRIVER_FOLD_MAX — merge_components' over-
    threshold branch had just collected its own identical 100k-row
    probe of the same frame, so the second probe here was a redundant
    limit-collect job on exactly the cost-sensitive large-fold path
    (round-14 ADVICE).

    Schema contract (round-15, round-14 ADVICE): BOTH tiers cast
    endpoints to bigint and return ``doc_id bigint, canonical_id
    bigint`` — previously the distributed tier preserved input types
    while the driver tier cast, so the two tiers had divergent
    schema contracts for future callers. (Every current caller
    already passes bigint ids, so the cast is a no-op on values.)
    """
    # respect a cache the CALLER owns (round-15): composed operators
    # (er_reconcile) persist their pair frames for their own fan-out;
    # blindly persisting+unpersisting here would drop the caller's
    # cache the moment the tier probe finished. Only manage the cache
    # we created.
    sl = pairs.storageLevel
    caller_cached = sl.useMemory or sl.useDisk
    if not caller_cached:
        pairs = pairs.persist()
    labels = None
    if not force_distributed:
        head = pairs.select(
            F.col(src).cast("bigint"), F.col(dst).cast("bigint")
        ).limit(CC_DRIVER_FOLD_MAX + 1).collect()
        if len(head) <= CC_DRIVER_FOLD_MAX:
            # driver tier: union-find, canonical = min id per component,
            # one row for EVERY vertex (identity rows included — callers
            # and tests rely on full vertex coverage)
            if not caller_cached:
                pairs.unpersist()
            parent: dict[int, int] = {}

            def _find(x: int) -> int:
                while parent.get(x, x) != x:
                    parent[x] = parent.get(parent[x], parent[x])
                    x = parent[x]
                return x

            for r in head:
                a, b = _find(int(r[0])), _find(int(r[1]))
                if a != b:
                    parent[max(a, b)] = min(a, b)
            verts = sorted({int(v) for r in head for v in (r[0], r[1])})
            return pairs.sparkSession.createDataFrame(
                [(v, _find(v)) for v in verts], "doc_id bigint, canonical_id bigint"
            )
    try:
        edges = pairs.select(
            F.col(src).cast("bigint").alias("e_src"),
            F.col(dst).cast("bigint").alias("e_dst"),
        ).unionByName(
            pairs.select(
                F.col(dst).cast("bigint").alias("e_src"),
                F.col(src).cast("bigint").alias("e_dst"),
            )
        )
        # path kept so the O(E) edges dir — the operator's largest
        # scratch artifact — is dropped the moment the result
        # materializes, not at process exit (round-5 review finding)
        edges_path, edges = stage_checkpoint_with_path(edges, "cc_edges")
        edges = edges.persist()
    finally:
        if not caller_cached:
            pairs.unpersist()
    try:
        labels = (
            edges.select(F.col("e_src").alias("doc_id"))
            .distinct()
            .withColumn("label", F.col("doc_id"))
            .persist()
        )
        big_sum = F.sum(F.col("label").cast("decimal(38,0)"))
        # No pre-loop sum job: on a non-empty SYMMETRIZED graph round 1
        # always lowers some label (for any edge, one endpoint is the
        # larger id and receives a smaller neighbor label), so a
        # baseline scan could never trigger an earlier exit — it was
        # one pure-overhead driver job per call. prev_sum=None compares
        # unequal to every round-1 sum; the empty graph yields
        # cur_sum=None (sum over zero rows) and converges immediately.
        prev_sum = None

        converged = False
        iter_ckpt_path: str | None = None
        for it in range(CC_MAX_ITERATIONS):
            nbr_min = edges.join(labels, edges.e_src == labels.doc_id).select(
                F.col("e_dst").alias("doc_id"), "label"
            )
            # pointer doubling: v also adopts label(label(v)) — one
            # self-join of the (persisted) labels; turns O(diameter)
            # rounds into O(log diameter) on chain-shaped components
            lab_of_lab = labels.join(
                labels.select(F.col("doc_id").alias("_l"), F.col("label").alias("_ll")),
                labels["label"] == F.col("_l"),
            ).select("doc_id", F.col("_ll").alias("label"))
            new_labels = (
                labels.unionByName(nbr_min)
                .unionByName(lab_of_lab)
                .groupBy("doc_id")
                .agg(F.min("label").alias("label"))
            )
            if (it + 1) % CC_CHECKPOINT_EVERY == 0:
                # lineage reset (see CC_CHECKPOINT_EVERY) — the write
                # is the round's evaluation; the re-read is tiny. The
                # previous iteration snapshot is dead once this one
                # materializes: rotate it off scratch now instead of
                # accumulating one O(V) snapshot per 6 rounds for the
                # life of the process.
                prev_path = iter_ckpt_path
                iter_ckpt_path, new_labels = stage_checkpoint_with_path(
                    new_labels, "cc_labels_iter"
                )
                if prev_path is not None:
                    drop_checkpoint_dir(new_labels.sparkSession, prev_path)
            new_labels = new_labels.persist()
            # one scalar to the driver per round (convergence control
            # only — label data itself never leaves the cluster)
            cur_sum = new_labels.agg(big_sum).collect()[0][0]
            labels.unpersist()
            labels = new_labels
            if cur_sum is None or (prev_sum is not None and cur_sum == prev_sum):
                converged = True
                break
            prev_sum = cur_sum
        if not converged:
            raise RuntimeError(
                f"connected_components did not converge in {CC_MAX_ITERATIONS} iterations"
            )
        out = labels.select("doc_id", F.col("label").alias("canonical_id"))
        result = eager_release(out, "cc_labels", edges, labels)
        # both inputs are dead once the result checkpoint above has
        # materialized from them: the final iteration snapshot and the
        # edge list itself (on the exception path they stay tracked in
        # _LIVE_DIRS for a later reclaim instead). In lazy_plans mode
        # eager_release returns the UNMATERIALIZED plan, whose lineage
        # still scans these very files — skip the delete there (the
        # dirs stay tracked for reclaim) or the returned frame throws
        # FileNotFoundException on first evaluation.
        if not plans_are_lazy():
            if iter_ckpt_path is not None:
                drop_checkpoint_dir(result.sparkSession, iter_ckpt_path)
            drop_checkpoint_dir(result.sparkSession, edges_path)
        return result
    except Exception:
        # eager_release handles the success path; any raise above it
        # (non-convergence, a failed mid-loop job) must not leave the
        # operator-scope caches registered — the round-2 leak class
        edges.unpersist()
        if labels is not None:
            labels.unpersist()
        raise


# Driver-fold ceiling for merge_components' contracted closure: edges
# up to this count are collected (two longs each — ~1.6 MB at the
# ceiling) and closed with a driver union-find in ONE action; above
# it the distributed connected_components path runs. Micro-batch
# folds sit orders of magnitude below this; only backfill-scale
# replays cross it.
MERGE_FOLD_DRIVER_MAX = 100_000


def merge_components(
    labels: DataFrame, pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Fold NEW near-dup pairs into an existing ``(doc_id,
    canonical_id)`` clustering without re-running connected components
    over the full corpus — the incremental maintenance step a
    continuously-ingesting pipeline needs (dedup_ingest emits pairs
    per micro-batch; re-clustering 100 TB per batch is not an option).

    Correctness contract: if ``labels`` equals
    ``connected_components(E1)`` then ``merge_components(labels, E2)``
    equals ``connected_components(E1 ∪ E2)`` for any pair sets —
    including pairs that introduce brand-new vertices (they enter as
    their own canonical before contraction). Pinned by a property test
    against full recompute on random graph splits.

    Shape at scale: CONTRACT, don't recompute. Each new-pair endpoint
    resolves to its current canonical (one equi-join against labels);
    edges that fall inside one existing component vanish; the
    surviving contracted edge set — O(new pairs), independent of
    corpus size — closes into an old-canonical → new-canonical
    mapping that broadcasts back onto labels (the mapping is small,
    so the full-label update join is broadcast-hash, no label
    shuffle). Only components actually touched by new pairs change
    labels.

    The closure itself is two-tier (round-14: the r13 verdict
    measured ~6 s/batch of FIXED control-plane cost in the
    distributed path — edge checkpoint write, >=2 pointer-doubling
    iteration jobs each with a convergence collect, result
    checkpoint — independent of match volume, paid by all four
    ingest stores). The contracted edges are O(new pairs per
    micro-batch) — bounded driver metadata under the same discipline
    as store manifests and CC convergence scalars — so up to
    MERGE_FOLD_DRIVER_MAX edges the closure is ONE limit-collect plus
    a driver union-find, and the whole fold costs one action instead
    of five-plus jobs. Past the threshold (backfill-scale folds, e.g.
    re-playing a large pairs log in one call) it falls back to the
    distributed connected_components unchanged. Both tiers satisfy
    the same contract and both are pinned by the random-split
    property test (which forces each tier explicitly).
    """
    ends = (
        pairs.select(F.col(src).alias("id"))
        .unionByName(pairs.select(F.col(dst).alias("id")))
        .distinct()
    )
    # current canonical of every endpoint; unseen vertices are their
    # own canonical (exactly how connected_components seeds labels)
    cur = ends.join(labels, ends["id"] == labels["doc_id"], "left").select(
        "id", F.coalesce("canonical_id", F.col("id")).alias("canon")
    )
    ca = cur.select(F.col("id").alias(src), F.col("canon").alias("canon_a"))
    cb = cur.select(F.col("id").alias(dst), F.col("canon").alias("canon_b"))
    contracted = (
        pairs.join(ca, src)
        .join(cb, dst)
        .filter(F.col("canon_a") != F.col("canon_b"))
        .select("canon_a", "canon_b")
        .distinct()
    )
    spark = pairs.sparkSession
    # persisted across the tier probe: the limit-collect evaluates the
    # two-join contraction plan, and on the OVER-threshold branch
    # connected_components would otherwise re-execute that exact plan
    # into its edge checkpoint — doubling the dominant cost precisely
    # when the fold is large (round-14 review). Both tiers fully
    # materialize `mapping` before the finally releases the cache
    # (the driver tier via createDataFrame; CC via its internal
    # checkpoints, whose lineage never re-reads `contracted`).
    contracted = contracted.persist()
    driver_tier = False
    try:
        head = contracted.limit(MERGE_FOLD_DRIVER_MAX + 1).collect()
        driver_tier = len(head) <= MERGE_FOLD_DRIVER_MAX
        if driver_tier:
            # driver tier: union-find over the contracted edges
            # (min-label components, identical semantics to
            # connected_components); only REMAPPED canonicals need a
            # mapping row — identity rows would ride the broadcast
            # for nothing
            parent: dict[int, int] = {}

            def _find(x: int) -> int:
                while parent.get(x, x) != x:
                    parent[x] = parent.get(parent[x], parent[x])
                    x = parent[x]
                return x

            for r in head:
                a, b = _find(int(r["canon_a"])), _find(int(r["canon_b"]))
                if a != b:
                    parent[max(a, b)] = min(a, b)
            vertices = {
                int(v) for r in head for v in (r["canon_a"], r["canon_b"])
            }
            remap = [(v, _find(v)) for v in vertices if _find(v) != v]
            mapping = spark.createDataFrame(
                remap, "old_canon bigint, new_canon bigint"
            )
        else:
            # distributed tier: CC over the contracted graph — still
            # O(new pairs) vertices/edges, never the corpus.
            # force_distributed: this branch just proved >100k edges
            # with its own limit-collect, so CC's identical internal
            # probe would be a redundant ~100k-row collect job on
            # exactly the cost-sensitive path (round-14 ADVICE).
            mapping = connected_components(
                contracted, "canon_a", "canon_b", force_distributed=True
            ).select(
                F.col("doc_id").alias("old_canon"),
                F.col("canonical_id").alias("new_canon"),
            )
    finally:
        contracted.unpersist()
    # broadcast hint SIZE-GATED to the driver tier (round-15, r14
    # verdict item 2): there the mapping is bounded by construction
    # (<= MERGE_FOLD_DRIVER_MAX remapped canonicals — driver-metadata
    # scale), so forcing the hash-join build side is always right. On
    # the distributed tier (a giant backfill fold) the mapping is
    # O(contracted vertices) and an unconditional broadcast of a
    # many-million-row mapping is a driver/executor memory hazard —
    # leave the strategy to AQE, which sees the real size at runtime.
    hinted = F.broadcast(mapping) if driver_tier else mapping
    updated = labels.join(
        hinted, labels["canonical_id"] == mapping["old_canon"], "left"
    ).select(
        "doc_id", F.coalesce("new_canon", F.col("canonical_id")).alias("canonical_id")
    )
    # endpoints not present in labels yet (new vertices) — their
    # canonical is the (possibly remapped) canon they resolved to
    fresh = (
        cur.join(labels, cur["id"] == labels["doc_id"], "left_anti")
        .join(hinted, cur["canon"] == mapping["old_canon"], "left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce("new_canon", F.col("canon")).alias("canonical_id"),
        )
    )
    return updated.unionByName(fresh)


@register(
    "dedup_cluster_canonical",
    oracle=f"""
    WITH RECURSIVE jp AS ({_JACCARD_ORACLE}
    ), edges AS (
      SELECT doc_a AS e_src, doc_b AS e_dst FROM jp
      UNION ALL
      SELECT doc_b, doc_a FROM jp
    ), reach(id, r) AS (
      SELECT e_src, e_src FROM edges
      UNION
      SELECT reach.id, e.e_dst
      FROM reach JOIN edges e ON e.e_src = reach.r
    )
    SELECT id AS doc_id, min(r) AS canonical_id
    FROM reach GROUP BY id
    """,
    doc="Near-dup clusters collapsed to canonical survivors: MinHash-"
    "LSH pairs (same candidates+verify as dedup_minhash_lsh) -> "
    "connected components -> every clustered doc mapped to its "
    "component's min doc_id. The oracle recomputes the same pair "
    "graph brute-force and closes it with a recursive-CTE transitive "
    "closure, so both the pair recall AND the transitive grouping are "
    "hash-checked.",
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _doc_shingles_exploded(spark, sf_dir).persist()
    sig = minhash_signatures(e).persist()
    try:
        cand = _band_candidates(sig)
        pairs = _verify_pairs(cand, e, sizes=sig.select("doc_id", "n")).select("doc_a", "doc_b")
        # no separate pair checkpoint: connected_components persists
        # the pair frame while it writes the (symmetrized) cc_edges
        # checkpoint — one scratch write, after which iterations scan
        # files and never re-execute the LSH candidate/verify plan
        return connected_components(pairs)
    finally:
        e.unpersist()
        sig.unpersist()


@register(
    "dedup_survivors_transitive",
    oracle=f"""
    WITH RECURSIVE jp AS ({_JACCARD_ORACLE}
    ), edges AS (
      SELECT doc_a AS e_src, doc_b AS e_dst FROM jp
      UNION ALL
      SELECT doc_b, doc_a FROM jp
    ), reach(id, r) AS (
      SELECT e_src, e_src FROM edges
      UNION
      SELECT reach.id, e.e_dst
      FROM reach JOIN edges e ON e.e_src = reach.r
    ), dropped AS (
      SELECT id FROM (SELECT id, min(r) AS c FROM reach GROUP BY id)
      WHERE id != c
    )
    SELECT doc_id, lang, n_chars FROM documents
    WHERE doc_id NOT IN (SELECT id FROM dropped)
    """,
    doc="The corpus-level transitive dedup decision: a document is "
    "dropped iff it sits in a near-dup connected component and is not "
    "the component's min doc_id — i.e. exactly one survivor per "
    "transitive cluster (the guarantee corpus_clean_pipeline's "
    "one-hop keep-lowest rule cannot give on chained duplicates). "
    "Survivors come from a left-anti join of the corpus against the "
    "(small) dropped set; AQE chooses broadcast when the dup fraction "
    "is low and falls back to shuffle when it is not — the anti-join "
    "never carries text, only ids.",
)
def dedup_survivors_transitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = dedup_cluster_canonical(spark, sf_dir)
    dropped = labels.filter(F.col("doc_id") != F.col("canonical_id")).select("doc_id")
    d = load(spark, "documents", sf_dir)
    return d.join(dropped, "doc_id", "left_anti").select("doc_id", "lang", "n_chars")


_EMB_PAIR_SQL = """
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM embeddings a
      JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])) >= 0.42
"""


@register(
    "dedup_embedding_clusters",
    oracle=f"""
    WITH RECURSIVE ep AS ({_EMB_PAIR_SQL}
    ), edges AS (
      SELECT vec_a AS e_src, vec_b AS e_dst FROM ep
      UNION ALL
      SELECT vec_b, vec_a FROM ep
    ), reach(id, r) AS (
      SELECT e_src, e_src FROM edges
      UNION
      SELECT reach.id, e.e_dst
      FROM reach JOIN edges e ON e.e_src = reach.r
    )
    SELECT id AS doc_id, min(r) AS canonical_id
    FROM reach GROUP BY id
    """,
    doc="Semantic near-dup clusters: exact-cosine pairs (>= 0.42, the "
    "oracle-checked dedup_embedding_cosine contract) closed into "
    "connected components with the same distributed min-label "
    "propagation as dedup_cluster_canonical — one operator kernel, "
    "two pair sources (text LSH / embedding cosine). The 100 TB pair "
    "source is dedup_embedding_lsh (SRP-banded); the exact O(n²) pair "
    "join here is the oracle baseline, as everywhere in this module.",
)
def dedup_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_embedding_cosine(spark, sf_dir).select("vec_a", "vec_b")
    return connected_components(pairs, src="vec_a", dst="vec_b")


def _semdedup_cell_pairs(cellsv: DataFrame) -> DataFrame:
    """All same-cell (vec_a < vec_b) pairs with cosine >= 0.42, ONE
    Arrow kernel per cell over ``(vec_id, vec double[], cell)``.

    Bit-exactness contract (the survivor set must not move): the
    kernel reproduces functions/vectors.py's higher-order fold
    EXACTLY — per pair, dot and squared norms accumulate left-to-right
    over dimensions (acc = acc + round(a_d*b_d), each product rounded
    first), then cos = dot / (sqrt(na) * sqrt(nb)). numpy's
    elementwise +, *, sqrt and / are the same correctly-rounded IEEE
    ops, and the dimension-major loop below performs them in the same
    order per pair (a plain matmul would use pairwise/SIMD summation —
    a DIFFERENT rounding order that can flip borderline pairs). The
    loop is vectorized across the pair axis, so the per-cell cost is
    d rank-1 updates of the n x n accumulator — the same O(n_cell^2 d)
    arithmetic the join shipped through interpreted HOF evaluation,
    now at numpy speed.

    Memory: the accumulator is row-blocked to ~32 MB so a hot cell
    degrades to streaming blocks, not an allocation spike; the group
    itself must fit one Arrow batch — the inherent SemDeDup cell
    bound (k grows with the corpus to hold cell sizes constant).
    A pair sharing BOTH probe cells is emitted once per cell; the
    consumer (connected_components) is duplicate-insensitive.
    """
    import numpy as np
    import pandas as pd

    def gen(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                              "vec_b": pd.Series([], dtype="int64")})
        n = len(pdf)
        if n < 2:
            return empty
        ids = pdf["vec_id"].to_numpy(dtype="int64")
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = np.stack(pdf["vec"].to_numpy()[order])  # n x d float64
        d = m.shape[1]
        nrm = np.zeros(n)
        for k in range(d):  # exact left-to-right fold of x*x
            nrm = nrm + m[:, k] * m[:, k]
        nrm = np.sqrt(nrm)
        out_a, out_b = [], []
        blk = max(1, (1 << 22) // n)  # ~32 MB of float64 accumulator
        for s in range(0, n, blk):
            t = min(n, s + blk)
            dot = np.zeros((t - s, n))
            for k in range(d):  # exact left-to-right fold of a_d*b_d
                dot = dot + np.multiply.outer(m[s:t, k], m[:, k])
            cos = dot / np.multiply.outer(nrm[s:t], nrm)
            ii, jj = np.nonzero(cos >= 0.42)
            keep = (ii + s) < jj  # id order == position order
            out_a.append(ids[ii[keep] + s])
            out_b.append(ids[jj[keep]])
        a = np.concatenate(out_a) if out_a else np.array([], dtype="int64")
        b = np.concatenate(out_b) if out_b else np.array([], dtype="int64")
        return pd.DataFrame({"vec_a": a.astype("int64"), "vec_b": b.astype("int64")})

    return cellsv.select("vec_id", "vec", "cell").groupBy("cell").applyInPandas(
        gen, "vec_a bigint, vec_b bigint"
    )


def _semdedup_i8_cell_pairs(cellsv: DataFrame, n_t2: int, d_t2: int) -> DataFrame:
    """The integer twin of _semdedup_cell_pairs over ``(vec_id,
    q int8-code array, cell)``: same-cell (va < vb) pairs passing the
    cross-multiplied cosine predicate dot > 0 AND dot^2 * d_t2 >=
    n_t2 * |a|^2 * |b|^2 — ALL integer arithmetic, so exactness needs
    no fold-order care. The gram matrix runs through float64 BLAS,
    which is exact here: every product and partial sum is an integer
    bounded by 64 * 127^2 ~ 1.03e6 << 2^53, so no rounding ever
    occurs; the predicate itself evaluates in int64 (products bounded
    by dot^2 * 2500 < 2^62 — the registered operator's documented
    bound)."""
    import numpy as np
    import pandas as pd

    def gen(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"va": pd.Series([], dtype="int64"),
                              "vb": pd.Series([], dtype="int64")})
        n = len(pdf)
        if n < 2:
            return empty
        ids = pdf["vec_id"].to_numpy(dtype="int64")
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = np.stack(pdf["q"].to_numpy()[order]).astype(np.float64)
        n2 = np.rint((m * m).sum(axis=1)).astype(np.int64)
        out_a, out_b = [], []
        blk = max(1, (1 << 22) // n)
        for s in range(0, n, blk):
            t = min(n, s + blk)
            dot = np.rint(m[s:t] @ m.T).astype(np.int64)
            pred = (dot > 0) & (
                dot * dot * np.int64(d_t2)
                >= np.int64(n_t2) * np.multiply.outer(n2[s:t], n2)
            )
            ii, jj = np.nonzero(pred)
            keep = (ii + s) < jj
            out_a.append(ids[ii[keep] + s])
            out_b.append(ids[jj[keep]])
        a = np.concatenate(out_a) if out_a else np.array([], dtype="int64")
        b = np.concatenate(out_b) if out_b else np.array([], dtype="int64")
        return pd.DataFrame({"va": a.astype("int64"), "vb": b.astype("int64")})

    return cellsv.select("vec_id", "q", "cell").groupBy("cell").applyInPandas(
        gen, "va bigint, vb bigint"
    )


SEMDEDUP_PROBES = 2  # cells per vector; r=2 measured 0.81 pair
# recall at ~4x the single-cell candidate cost on the synthetic
# corpus (r=1: 0.33 — the 0.42-cos contract pairs are only moderately
# similar, so single cells split them; production SemDeDup thresholds
# of 0.95+ co-cluster far more readily)


@register(
    "dedup_semdedup",
    oracle=None,  # k-means cells are float-iterative -> rows-only;
    # subset-of-exact + pair recall asserted in tests/test_dedup.py
    doc="SemDeDup-style semantic dedup, the 100 TB path for embedding "
    f"near-dups: k-means cells (k=8, multi-probe r={SEMDEDUP_PROBES}) restrict "
    "the pair search to same-cell candidates, exact cosine >= 0.42 "
    "verifies them, connected components pick one survivor per "
    "transitive group. Every emitted pair is exact (the cells only "
    "bound recall), so the dropped set is always a SUBSET of the "
    "exact O(n^2) operator's — semantic dedup never over-deletes. "
    "Scale shape: candidate cost is sum(n_cell^2) over r-replicated "
    "cells instead of n^2; cells come from a few map-side-combined "
    "training scans and one narrow explode (no window, no global "
    "shuffle beyond the cell equi-join), and k grows with the corpus "
    "to hold cell sizes constant.",
)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import to_double
    from .similarity import _assign_topr_udf, kmeans_fit_assign

    e = load(spark, "embeddings", sf_dir).select("vec_id", to_double("embedding").alias("vec"))
    _, centroids, _ = kmeans_fit_assign(e, iters=2)
    # multi-probe assignment: one vectorized scan -> r cells per
    # vector; the VECTOR rides the explode here (round-16): the whole
    # within-cell verify happens inside one Arrow kernel per cell, so
    # the payload crosses exactly one cell-keyed exchange (r copies)
    # and the candidate self-join + dropDuplicates + two vector-attach
    # joins + the interpreted per-pair HOF cosine all disappear from
    # the plan (guide §4.2/§8 — hand whole batches to vectorized
    # native code; r15 verdict item 3). CC treats the (rare) pair
    # re-emitted by both shared cells identically, so the survivor
    # set is unchanged — and the kernel reproduces the HOF fold
    # bit-for-bit (see _semdedup_cell_pairs).
    cellsv = e.select(
        "vec_id",
        "vec",
        F.explode(_assign_topr_udf(centroids, SEMDEDUP_PROBES)(F.col("vec"))).alias("cell"),
    )
    pairs = eager_release(_semdedup_cell_pairs(cellsv), "semdedup_pairs")
    labels = connected_components(pairs, src="vec_a", dst="vec_b")
    dropped = labels.filter(F.col("doc_id") != F.col("canonical_id")).select(
        F.col("doc_id").alias("vec_id")
    )
    return e.select("vec_id").join(dropped, "vec_id", "left_anti")


@register(
    "split_leakage_free",
    oracle=f"""
    WITH RECURSIVE jp AS ({_JACCARD_ORACLE}
    ), edges AS (
      SELECT doc_a AS e_src, doc_b AS e_dst FROM jp
      UNION ALL
      SELECT doc_b, doc_a FROM jp
    ), reach(id, r) AS (
      SELECT e_src, e_src FROM edges
      UNION
      SELECT reach.id, e.e_dst
      FROM reach JOIN edges e ON e.e_src = reach.r
    ), labels AS (
      SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id
    )
    SELECT d.doc_id, d.lang,
           COALESCE(l.canonical_id, d.doc_id) AS group_id,
           CASE WHEN substr(md5(CAST(COALESCE(l.canonical_id, d.doc_id)
                                     AS VARCHAR)), 1, 2) < 'cd'
                THEN 'train' ELSE 'holdout' END AS split
    FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
    """,
    doc="Leakage-free train/holdout split: hash the near-dup CLUSTER "
    "canonical (not the doc_id), so every member of a transitive "
    "near-dup component lands in the same split — the guard against "
    "train/eval contamination that split_train_holdout's per-doc hash "
    "cannot give (a near-copy of a holdout doc in train IS leakage). "
    "Composition: MinHash-LSH pairs -> connected components -> "
    "md5-threshold on the canonical id ('cd' = ~80% train, the "
    "split_train_holdout convention). Unclustered docs are their own "
    "canonical via a left join + coalesce; the labels side is the "
    "(small) clustered subset, so AQE broadcasts it. The oracle "
    "recomputes the pair graph brute-force, closes it with a "
    "recursive CTE, and applies the same hash rule — grouping AND "
    "assignment are hash-checked end to end.",
)
def split_leakage_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    # canonical attachment via the ONE shared helper (unlabeled docs
    # are their own canonical, small labels side broadcasts) — the
    # same lookup the streaming cluster store serves
    from ..streaming.cluster_store import canonicalize

    labels = dedup_cluster_canonical(spark, sf_dir)
    d = load(spark, "documents", sf_dir)
    labeled = canonicalize(d.select("doc_id", "lang"), labels)
    bucket = F.substring(F.md5(F.col("canonical_id").cast("string")), 1, 2)
    return labeled.select(
        "doc_id",
        "lang",
        F.col("canonical_id").alias("group_id"),
        F.when(bucket < "cd", "train").otherwise("holdout").alias("split"),
    )


@register(
    "dedup_keep_longest",
    oracle=f"""
    WITH RECURSIVE jp AS ({_JACCARD_ORACLE}
    ), edges AS (
      SELECT doc_a AS e_src, doc_b AS e_dst FROM jp
      UNION ALL
      SELECT doc_b, doc_a FROM jp
    ), reach(id, r) AS (
      SELECT e_src, e_src FROM edges
      UNION
      SELECT reach.id, e.e_dst
      FROM reach JOIN edges e ON e.e_src = reach.r
    ), labels AS (
      SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id
    ), g AS (
      SELECT d.doc_id, d.n_chars,
             COALESCE(l.canonical_id, d.doc_id) AS group_id
      FROM documents d LEFT JOIN labels l USING (doc_id)
    ), surv AS (
      SELECT group_id, doc_id AS survivor_id FROM (
        SELECT group_id, doc_id,
               row_number() OVER (
                 PARTITION BY group_id ORDER BY n_chars DESC, doc_id
               ) AS rk
        FROM g
      ) WHERE rk = 1
    )
    SELECT g.doc_id, g.group_id, s.survivor_id,
           CAST(g.doc_id = s.survivor_id AS INT) AS kept
    FROM g JOIN surv s USING (group_id)
    """,
    doc="Policy-based survivor selection — 'keep the most complete "
    "copy': within each transitive near-dup cluster the survivor is "
    "the LONGEST document (n_chars, tie -> lowest doc_id), not the "
    "lowest id. This is the curation decision real pipelines make "
    "when near-dups are truncated/extended variants of one another — "
    "min-id keeps an arbitrary copy, keep-longest keeps the superset "
    "text. Composition: MinHash-LSH pairs -> connected components -> "
    "per-group argmax window; unclustered docs survive as their own "
    "group (left join + coalesce, labels side small -> broadcast). "
    "The window partitions by group_id over only |clustered|+|docs| "
    "rows with a map-side WindowGroupLimit; no new corpus shuffle "
    "beyond the CC machinery. The oracle recomputes pairs "
    "brute-force, closes them with a recursive CTE, and applies the "
    "same argmax rule — policy AND grouping are hash-checked.",
)
def dedup_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..streaming.cluster_store import canonicalize

    labels = dedup_cluster_canonical(spark, sf_dir)
    d = load(spark, "documents", sf_dir).select("doc_id", "n_chars")
    g = canonicalize(d, labels).select(
        "doc_id", "n_chars", F.col("canonical_id").alias("group_id")
    )
    w = Window.partitionBy("group_id").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    surv = (
        g.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("group_id", F.col("doc_id").alias("survivor_id"))
    )
    return g.join(surv, "group_id").select(
        "doc_id",
        "group_id",
        "survivor_id",
        (F.col("doc_id") == F.col("survivor_id")).cast("int").alias("kept"),
    )


@register(
    "dedup_soft_weights",
    oracle=f"""
    WITH RECURSIVE jp AS ({_JACCARD_ORACLE}
    ), edges AS (
      SELECT doc_a AS e_src, doc_b AS e_dst FROM jp
      UNION ALL
      SELECT doc_b, doc_a FROM jp
    ), reach(id, r) AS (
      SELECT e_src, e_src FROM edges
      UNION
      SELECT reach.id, e.e_dst
      FROM reach JOIN edges e ON e.e_src = reach.r
    ), labels AS (
      SELECT id AS doc_id, min(r) AS c FROM reach GROUP BY id
    ), sizes AS (
      SELECT c, count(*) AS csize FROM labels GROUP BY c
    ), w AS (
      SELECT l.doc_id, s.csize FROM labels l JOIN sizes s USING (c)
    )
    SELECT d.doc_id,
           CAST(coalesce(w.csize, 1) AS BIGINT) AS cluster_size,
           round(1.0 / coalesce(w.csize, 1), 6) AS weight
    FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id
    """,
    doc="Soft dedup: instead of DROPPING near-duplicates, every "
    "document keeps a sampling weight of 1/|its transitive near-dup "
    "cluster| (singletons weigh 1.0) — duplicated mass is neutralized "
    "in expectation while rare phrasings inside a cluster stay "
    "reachable, the modern alternative to hard dedup for pretraining "
    "mixes (SoftDeDup-style). Reuses the LSH pair graph + "
    "pointer-doubling connected components of "
    "dedup_cluster_canonical; cluster sizes are one count over the "
    "|clustered docs| label table and attach to the corpus with an "
    "ids-only left join (AQE broadcasts it when the dup fraction is "
    "low). The weights plug directly into sample_weighted's "
    "Horvitz-Thompson machinery. Oracle: the same recursive-CTE "
    "closure extended with per-component counts.",
)
def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = dedup_cluster_canonical(spark, sf_dir)
    sizes = labels.groupBy("canonical_id").agg(F.count(F.lit(1)).alias("csize"))
    w = labels.join(sizes, "canonical_id").select("doc_id", "csize")
    d = load(spark, "documents", sf_dir)
    csize = F.coalesce(F.col("csize"), F.lit(1))
    return d.join(w, "doc_id", "left").select(
        "doc_id",
        csize.cast("bigint").alias("cluster_size"),
        F.round(F.lit(1.0) / csize, 6).alias("weight"),
    )


@register(
    "dedup_simhash_band_occupancy",
    oracle=f"""{_simhash_bands_cte()},
    occ AS (
      SELECT band_idx, band_key, CAST(count(*) AS BIGINT) AS bucket_size
      FROM bands GROUP BY band_idx, band_key
    )
    SELECT band_idx, bucket_size,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(count(*) * bucket_size * (bucket_size - 1) / 2 AS BIGINT)
             AS candidate_pairs
    FROM occ GROUP BY band_idx, bucket_size
    """,
    doc="LSH index observability: the bucket-size distribution per "
    "SimHash band, with the candidate-pair volume each (band, size) "
    "stratum contributes (n_buckets * size*(size-1)/2) — the capacity "
    "report that prices the band join BEFORE running it, and the "
    "metric behind the streaming ingest's hot-bucket cap "
    "(lsh_candidates.BAND_BUCKET_CAP): a corpus whose mass sits in "
    "size-1 buckets joins for free, one with a megabucket is about "
    "to go quadratic. Shares the banding implementation with "
    "dedup_simhash on BOTH engines (simhash_bands / "
    "_simhash_bands_cte — one kernel, two consumers, zero drift), so "
    "the profile describes exactly the join the dedup runs; exact "
    "integer counts end to end.",
)
def dedup_simhash_band_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    sigs = simhash_md5_signatures(docs)
    occ = (
        simhash_bands(sigs)
        .groupBy("band_idx", "band_key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("bucket_size"))
    )
    return occ.groupBy("band_idx", "bucket_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        (F.count(F.lit(1)) * F.col("bucket_size") * (F.col("bucket_size") - 1) / 2)
        .cast("bigint")
        .alias("candidate_pairs"),
    )


@register(
    "dedup_jaccard_prefix",
    oracle=_JACCARD_ORACLE,
    doc="Exact all-pairs 3-gram Jaccard >= 0.8 via PPJoin-style PREFIX "
    "FILTERING — the candidate-generation alternative to "
    "dedup_ngram_jaccard's full inverted index (same semantics, same "
    "oracle, different physical plan; equality of the two operators' "
    "outputs is pinned in tests). Each document orders its shingles "
    "by (global document frequency, shingle) ascending — rarest "
    "first — and indexes only its PREFIX of length "
    "n - ceil(t*n) + 1: any pair with Jaccard >= t shares at least "
    "ceil(t*max(na,nb)) shingles, more than either suffix holds, so "
    "the smallest-ordered common shingle provably falls in BOTH "
    "prefixes and the prefix-token equi-join loses no true pair. At "
    "t = 0.8 the prefix is ~20% of each document, so the candidate "
    "join touches ~4% of the inverted index's row pairs and — "
    "because prefixes hold the RAREST shingles — the join keys are "
    "the least skewed ones (hot boilerplate shingles sort out of "
    "every prefix, complementing the DF cap instead of relying on "
    "it). The per-document ordering is a doc-partitioned window "
    "(never a global rank: any consistent total order satisfies the "
    "lemma, so (df, shingle-hash) works distributed), the exact "
    "verify is the shared _verify_pairs equi-join, and ceil is "
    "integer arithmetic: (4n + 4) div 5.",
)
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # shingle table feeds: the DF table, per-doc sizes, the ranked
    # prefix build, and the verify join — persist once, release last
    e = _doc_shingles_exploded(spark, sf_dir).persist()
    dfreq = e.groupBy("shingle").agg(F.count(F.lit(1)).alias("dfreq"))
    sz = _shingle_sizes(e)
    w = Window.partitionBy("doc_id").orderBy("dfreq", "shingle")
    ranked = (
        e.join(dfreq, "shingle")
        .select("doc_id", "shingle", "dfreq")
        .withColumn("rk", F.row_number().over(w))
    )
    # prefix length for Jaccard threshold t = 4/5:
    # L = n - ceil(0.8 n) + 1, ceil as exact integer (4n+4) div 5
    pref = (
        ranked.join(sz, "doc_id")
        .filter(F.col("rk") <= F.col("n") - F.expr("(4 * n + 4) div 5") + 1)
        .select("doc_id", "shingle")
        .persist()
    )
    cand = (
        pref.select(F.col("doc_id").alias("doc_a"), "shingle")
        .join(pref.select(F.col("doc_id").alias("doc_b"), "shingle"), "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    out = _verify_pairs(cand, e, sizes=sz)
    return eager_release(out, "jaccard_prefix_pairs", e, pref)


# --- SemDeDup on the int8 lattice (round 11) ----------------------------
#
# dedup_semdedup (above) stays rows-only: its cells come from float
# Lloyd and its verify metric is a float cosine — neither is exactly
# reproducible by a SQL oracle. This sibling is the hash-checked
# member of the family: cells from the integer-lattice k-means
# (similarity.embedding_kmeans_int8's machinery), and the cosine
# threshold verified WITHOUT EVER DIVIDING — cos(x,y) >= t over
# integer codes is the cross-multiplied integer predicate
#   dot > 0  AND  dot^2 * D >= N * ||x||^2 * ||y||^2   (t^2 = N/D)
# so candidate generation, verification, and the transitive closure
# are all exact arithmetic both engines reproduce bit-for-bit.

SEMDEDUP_I8_T2 = (441, 2500)  # t = 0.42 -> t^2 = 441/2500 exactly


def _i8_l2_sql(a: str, b: str, dim: int) -> str:
    return (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


def _semdedup_i8_oracle() -> str:
    from .similarity import _DIM, _i8_lloyd_ctes, KMEANS_K

    n, d = SEMDEDUP_I8_T2
    dot = (
        f"list_sum(list_transform(range(1, {_DIM} + 1), "
        "i -> pa.q[i] * pb.q[i]))"
    )
    n2 = f"list_sum(list_transform(q, x -> x * x))"
    return (
        "WITH RECURSIVE "
        + ",\n    ".join(_i8_lloyd_ctes(KMEANS_K, 2))
        + f""",
    pd AS (
      SELECT p.vec_id, c.cluster,
             {_i8_l2_sql("p.q", "c.cv", _DIM)} AS dist
      FROM pts p CROSS JOIN cent1 c
    ),
    cells AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cluster) AS rn
        FROM pd)
      WHERE rn <= {SEMDEDUP_PROBES}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
      FROM cells a JOIN cells b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    ),
    norms AS (SELECT vec_id, q, {n2} AS n2 FROM pts),
    pairs AS (
      SELECT va, vb
      FROM cand
      JOIN norms pa ON pa.vec_id = va
      JOIN norms pb ON pb.vec_id = vb
      WHERE {dot} > 0
        AND ({dot}) * ({dot}) * {d} >= {n} * pa.n2 * pb.n2
    ),
    edges AS (
      SELECT va AS e_src, vb AS e_dst FROM pairs
      UNION ALL
      SELECT vb, va FROM pairs
    ),
    reach(id, r) AS (
      SELECT e_src, e_src FROM edges
      UNION
      SELECT reach.id, e.e_dst
      FROM reach JOIN edges e ON e.e_src = reach.r
    ),
    labels AS (SELECT id, min(r) AS canonical FROM reach GROUP BY id)
    SELECT p.vec_id
    FROM pts p LEFT JOIN labels l ON l.id = p.vec_id
    WHERE l.canonical IS NULL OR l.canonical = p.vec_id"""
    )


@register(
    "dedup_semdedup_int8",
    oracle=_semdedup_i8_oracle(),
    doc="SemDeDup, hash-checked end to end — the sibling "
    "dedup_semdedup (float Lloyd cells + float cosine) can only ever "
    "earn rows-only driver rows; this variant runs the SAME pipeline "
    "shape (multi-probe cells bound the pair search, a cosine "
    "threshold verifies, connected components keep the lowest id) "
    "entirely in exact integer arithmetic: int8-lattice k-means "
    f"cells (r={SEMDEDUP_PROBES} probes), and cos >= 0.42 as the "
    "cross-multiplied predicate dot^2*2500 >= 441*|x|^2*|y|^2 with "
    "dot > 0 (no division, no sqrt — products bounded by "
    "(64*127^2)^2*2500 < 2^62). The DuckDB oracle re-derives "
    "training, probing, verification, AND the transitive closure "
    "(recursive CTE, min-label = the CC operator's canonical rule). "
    "Same 100 TB shape as the float twin: sum(n_cell^2) candidate "
    "cost, ids-only on the join wire, one CC. Quantization moves "
    "the threshold by <= ~1% of cosine — acceptable for a dedup "
    "band edge and the price of a bit-for-bit-checkable pipeline.",
)
def dedup_semdedup_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import (
        _DIM,
        _assign_topr_udf,
        _i8_assign,
        _i8_codes,
        _i8_round_mean,
        KMEANS_K,
    )

    n_t2, d_t2 = SEMDEDUP_I8_T2
    e = load(spark, "embeddings", sf_dir)
    codes = _i8_codes(e)
    init = codes.orderBy("vec_id").limit(KMEANS_K).select("q").collect()
    centroids = [list(r[0]) for r in init]
    # one update (iters=2 like the float twin): assign under cent0,
    # fold the k x dim integer sums, probe with cent1
    assigned = _i8_assign(codes, centroids)
    stats = (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.col("q")[i]).alias(f"s{i}") for i in range(_DIM)],
        )
        .collect()
    )
    new_c = list(centroids)
    for r in stats:
        new_c[int(r["cluster"])] = [
            _i8_round_mean(int(r[f"s{i}"]), int(r["n"])) for i in range(_DIM)
        ]
    centroids = new_c
    # codes ride the explode (round-16, same shape as the float twin):
    # the whole within-cell verify is ONE integer Arrow kernel per
    # cell — the candidate self-join + dropDuplicates + two
    # code-attach joins + the interpreted HOF dot/norm folds drop out
    # of the plan; the oracle's DISTINCT candidate set differs from
    # the kernel's per-cell emission only by duplicates CC ignores.
    cellsv = codes.select(
        "vec_id",
        "q",
        F.explode(
            _assign_topr_udf(centroids, SEMDEDUP_PROBES)(F.col("q"))
        ).alias("cell"),
    )
    pairs = eager_release(
        _semdedup_i8_cell_pairs(cellsv, n_t2, d_t2), "semdedup_i8_pairs"
    )
    labels = connected_components(pairs, src="va", dst="vb")
    dropped = labels.filter(F.col("doc_id") != F.col("canonical_id")).select(
        F.col("doc_id").alias("vec_id")
    )
    return codes.select("vec_id").join(dropped, "vec_id", "left_anti")
