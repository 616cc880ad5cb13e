"""Bloom-filter benchmark decontamination (SURVEY.md §2-D4 scale path).

``decontaminate_ngram_overlap`` broadcasts the eval gram SET and pays a
doc_id exchange to build corpus grams via a window. This module is its
100 TB twin: the eval suite is compiled ONCE into a fixed-size Bloom
bitset (m = 2^17 bits, k = 3 md5-derived probes) and the corpus-side
test becomes a pure whole-stage-codegen scan — grams are built per row
with ``transform``/``element_at`` (no explode, no window, no join), so
the contamination flag costs ZERO shuffles at any corpus size. The
bitset is a bounded artifact of the eval suite (16 KiB here; the suite
is fixed-size no matter how big the corpus grows), so shipping it as a
broadcast literal is the same sanctioned pattern as the one-row scalar
broadcast in tf-idf.

A Bloom filter's false positives are usually the reason it can only be
tested statistically — but they are a *deterministic* function of the
hash spec, so by deriving bit positions from md5 (identical hex in
every engine) the operator stays EXACTLY oracle-checkable: DuckDB
recomputes the same positions and expresses "bit is set" as an
IN-subquery against the distinct eval positions (bit=1 iff position ∈
set — the bitset IS that set). Spark and the oracle agree bit-for-bit,
false positives included.

Reference parity: the reference engine has no decontamination surface;
this operator belongs to the LLM-training-data layer (task brief §
"training-data pipeline"), alongside ``decontaminate_ngram_overlap``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import shingles
from ..registry import register
from ..tables import load
from .text_analysis import DECONTAM_EVAL_SOURCE, DECONTAM_NGRAM, _token_ngrams

BLOOM_M = 1 << 17  # bits; 2048 64-bit words = 16 KiB
BLOOM_K = 3  # md5-derived probes per gram
_WORDS = BLOOM_M // 64


def bloom_positions(gram: Column) -> list[Column]:
    """The k bit positions of a gram: first 8 hex chars of
    md5(gram || '#' || seed) as an integer, mod m. Pure codegen; DuckDB
    computes the identical value as
    ``('0x' || substr(md5(gram || '#s'), 1, 8))::BIGINT % m``."""
    return [
        F.conv(F.substring(F.md5(F.concat(gram, F.lit(f"#{s}"))), 1, 8), 16, 10).cast("long")
        % F.lit(BLOOM_M)
        for s in range(BLOOM_K)
    ]


def build_bloom_bits(grams: DataFrame, gram_col: str = "gram") -> list[int]:
    """Compile a gram set into the bitset: ``_WORDS`` 64-bit words.

    The collect here is bounded by min(k x |grams|, m) = at most 2^17
    distinct ints — a fixed-size sketch of the (small by definition)
    eval suite, NOT corpus data; at 100 TB this number does not grow.
    """
    rows = (
        grams.select(F.explode(F.array(*bloom_positions(F.col(gram_col)))).alias("pos"))
        .distinct()
        .collect()
    )
    words = [0] * _WORDS
    for r in rows:
        pos = r["pos"]
        words[pos >> 6] |= 1 << (pos & 63)
    return words


def _bits_literal(words: list[int]) -> Column:
    # signed-long wraparound for bit 63: Spark LongType is signed
    signed = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    return F.array(*[F.lit(w).cast("long") for w in signed])


def bloom_member(gram: Column, bits: Column) -> Column:
    """True iff all k probe bits are set — standard Bloom membership,
    O(1) per gram, whole-stage codegen (element_at + getbit on the
    constant-folded literal array)."""
    checks = []
    for pos in bloom_positions(gram):
        word = F.element_at(bits, (pos / 64).cast("int") + F.lit(1))
        checks.append(F.getbit(word, pos % F.lit(64)) == F.lit(1))
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_hit_count(text: Column, bits: Column) -> Column:
    """# distinct n-grams of ``text`` that the Bloom filter admits.

    ``shingles`` builds the distinct gram array per row inside codegen
    (transform/element_at — the chunking trick), so this entire column
    is a shuffle-free scan expression: it drops onto a streaming
    DataFrame or a 100 TB batch scan identically."""
    return F.size(F.filter(shingles(text, k=DECONTAM_NGRAM), lambda g: bloom_member(g, bits))).cast(
        "long"
    )


def eval_bloom_bits(spark: SparkSession, sf_dir: str) -> list[int]:
    """Bitset of the held-out eval shard's distinct n-grams."""
    d = load(spark, "documents", sf_dir)
    eval_grams = (
        _token_ngrams(
            d.filter(F.col("source") == DECONTAM_EVAL_SOURCE).select("doc_id", "text"),
            DECONTAM_NGRAM,
        )
        .select("gram")
        .distinct()
    )
    return build_bloom_bits(eval_grams)


def decontam_keep(text: Column, bits: Column) -> Column:
    """Boolean keep flag (no Bloom-admitted gram) — composes with
    ``gopher_keep`` in front of the streaming dedup ingest."""
    return bloom_hit_count(text, bits) == F.lit(0)


def decontam_filter(docs: DataFrame, bits: list[int], text_col: str = "text") -> DataFrame:
    """Drop documents the Bloom filter flags as contaminated. Pure
    filter: streaming-safe, zero shuffle, scan speed."""
    return docs.filter(decontam_keep(F.col(text_col), _bits_literal(bits)))


_MEMBER_SQL = " AND ".join(
    f"('0x' || substr(md5(gram || '#{s}'), 1, 8))::BIGINT % {BLOOM_M}"
    " IN (SELECT pos FROM eval_pos)"
    for s in range(BLOOM_K)
)


@register(
    "decontaminate_bloom",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, lang, string_split(text, ' ') AS t FROM documents
    ), grams AS (
      SELECT doc_id, source, lang,
             unnest(list_transform(generate_series(1, len(t) - {DECONTAM_NGRAM - 1}),
                    i -> list_aggregate(t[i:i+{DECONTAM_NGRAM - 1}], 'string_agg', ' ')))
               AS gram
      FROM tok
    ), eval_pos AS (
      SELECT DISTINCT
             ('0x' || substr(md5(g.gram || '#' || s.s), 1, 8))::BIGINT % {BLOOM_M} AS pos
      FROM (SELECT DISTINCT gram FROM grams
            WHERE source = '{DECONTAM_EVAL_SOURCE}') g,
           (SELECT unnest([{", ".join(str(s) for s in range(BLOOM_K))}]) AS s) s
    )
    SELECT c.doc_id, any_value(c.lang) AS lang, any_value(c.source) AS source,
           count(DISTINCT c.gram) AS n_hit_grams
    FROM grams c
    WHERE c.source <> '{DECONTAM_EVAL_SOURCE}' AND {_MEMBER_SQL}
    GROUP BY c.doc_id
    """,
    doc="Bloom-bitset benchmark decontamination — the zero-shuffle "
    "scale twin of decontaminate_ngram_overlap: the eval suite "
    f"compiles once into a {BLOOM_M}-bit / {BLOOM_K}-probe filter "
    "(16 KiB, size-independent of the corpus) and every corpus "
    "document is flagged by a pure codegen scan expression — grams "
    "built per row with transform, membership via element_at+getbit "
    "on the constant-folded bitset. No join, no window, no exchange "
    "on the corpus side (plan-asserted in tests). Guaranteed zero "
    "false negatives vs the exact join (superset property tested); "
    "false positives are deterministic from the md5 hash spec, so "
    "the DuckDB oracle reproduces them bit-for-bit via IN-subqueries "
    "over the same positions.",
)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    bits = _bits_literal(eval_bloom_bits(spark, sf_dir))
    d = load(spark, "documents", sf_dir)
    return (
        d.filter(F.col("source") != DECONTAM_EVAL_SOURCE)
        .select(
            "doc_id",
            "lang",
            "source",
            bloom_hit_count(F.col("text"), bits).alias("n_hit_grams"),
        )
        .filter(F.col("n_hit_grams") > 0)
    )
