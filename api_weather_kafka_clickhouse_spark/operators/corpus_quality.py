"""Corpus-quality / curation operators (SURVEY.md §2-D4 extension):
Gopher-style rule filtering, sliding-window chunking, weighted
document sampling, and token-distribution entropy.

No reference counterpart — these are the standard curation steps of a
pretraining-data pipeline (quality gates -> chunking -> mixture
sampling), built 100-TB-first: every operator is a single scan with
codegen built-ins (split / higher-order filter / slice / md5), the
only shuffles are small final aggregates, and the sampling operator is
a pure per-row filter with zero shuffle at any scale.

Determinism: ratios are single IEEE divisions of exact integers
(bit-identical across engines); the entropy operator bridges the one
genuinely float-unfriendly aggregate (a sum of logs, whose value
depends on summation order) through per-term rounding + exact DECIMAL
summation so the result is combine-order independent — see
text_unigram_entropy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, stopword_hits, tokens
from ..registry import register
from ..tables import load

_SW_SQL = "(" + ", ".join(f"'{s}'" for s in STOPWORDS) + ")"

# --- Gopher-style quality rules --------------------------------------

# Thresholds follow the published Gopher rules (Rae et al. 2021,
# "Scaling Language Models", App. A1.1) with the word-count floor kept
# at 50: documents failing ANY rule are flagged keep=0. On the
# synthetic corpus the symbol/alpha rules pass trivially (no '#', no
# '...', all-alphabetic tokens) — crafted fixtures in
# tests/test_corpus_quality.py exercise their failure sides.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_RATIO = 0.8
GOPHER_MIN_STOPWORDS = 2


def _occurrences(text: F.Column, needle: str) -> F.Column:
    """# of occurrences of `needle` via length arithmetic (codegen)."""
    return (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / F.lit(
        len(needle)
    )


def _gopher_metrics(text_col: str) -> dict[str, F.Column]:
    """The rule metrics as raw column expressions — one source of
    truth for the metrics query, the keep flag, and the streaming
    filter, so the thresholds can never drift between them."""
    t = F.col(text_col)
    w = tokens(text_col)
    nw = F.size(w)
    n_sym = _occurrences(t, "#") + _occurrences(t, "...")
    n_alpha = F.size(F.filter(w, lambda tok: tok.rlike("[A-Za-z]")))
    return {
        "n_words": nw.cast("bigint"),
        "mean_word_len": F.length(F.replace(t, F.lit(" "), F.lit(""))).cast("double") / nw,
        "symbol_ratio": n_sym.cast("double") / nw,
        "alpha_ratio": n_alpha.cast("double") / nw,
        "n_stop": stopword_hits(text_col).cast("bigint"),
    }


def gopher_keep(text_col: str = "text") -> F.Column:
    """Boolean all-rules-pass column over a raw text column. Pure
    codegen — works identically on batch and STREAMING DataFrames, so
    an ingest pipeline gates quality with ``docs.filter(gopher_keep())``
    before the dedup index ever sees a row (tested in
    tests/test_dedup_ingest.py)."""
    m = _gopher_metrics(text_col)
    return (
        (m["n_words"] >= GOPHER_MIN_WORDS)
        & (m["n_words"] <= GOPHER_MAX_WORDS)
        & (m["mean_word_len"] >= GOPHER_MIN_MEAN_LEN)
        & (m["mean_word_len"] <= GOPHER_MAX_MEAN_LEN)
        & (m["symbol_ratio"] < GOPHER_MAX_SYMBOL_RATIO)
        & (m["alpha_ratio"] > GOPHER_MIN_ALPHA_RATIO)
        & (m["n_stop"] >= GOPHER_MIN_STOPWORDS)
    )


def gopher_filter(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep only documents passing every Gopher rule, all original
    columns intact — the composable quality gate for batch pipelines
    and streaming ingest alike."""
    return docs.filter(gopher_keep(text_col))


def gopher_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_words, mean_word_len, symbol_ratio, alpha_ratio,
    n_stop, keep) — the reusable kernel text_gopher_quality wraps."""
    m = _gopher_metrics(text_col)
    return docs.select(
        "doc_id",
        *[c.alias(name) for name, c in m.items()],
        gopher_keep(text_col).cast("int").alias("keep"),
    )


@register(
    "text_gopher_quality",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / len(string_split(text, ' ')) AS mean_word_len,
             CAST((length(text) - length(replace(text, '#', '')))
                  + (length(text) - length(replace(text, '...', ''))) / 3
                  AS DOUBLE)
               / len(string_split(text, ' ')) AS symbol_ratio,
             CAST(len(list_filter(string_split(text, ' '),
                                  t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
               / len(string_split(text, ' ')) AS alpha_ratio,
             CAST(len(list_filter(string_split(text, ' '),
                                  t -> t IN {_SW_SQL})) AS BIGINT) AS n_stop
      FROM documents
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mean_word_len,
           symbol_ratio, alpha_ratio, n_stop,
           CAST(n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
                AND mean_word_len >= {GOPHER_MIN_MEAN_LEN}
                AND mean_word_len <= {GOPHER_MAX_MEAN_LEN}
                AND symbol_ratio < {GOPHER_MAX_SYMBOL_RATIO}
                AND alpha_ratio > {GOPHER_MIN_ALPHA_RATIO}
                AND n_stop >= {GOPHER_MIN_STOPWORDS} AS INT) AS keep
    FROM m
    """,
    doc="Gopher-style document quality rules (word-count band, mean "
    "word length band, symbol-to-word ratio, alphabetic-word ratio, "
    "stopword floor) with per-rule metrics and an all-rules keep "
    "flag. Pure codegen scan — length arithmetic + one higher-order "
    "filter, no UDFs, no shuffle; ratios are single IEEE divisions "
    "of exact integers so both engines agree bit-for-bit.",
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_quality(load(spark, "documents", sf_dir))


# --- sliding-window chunking -----------------------------------------

CHUNK_TOKENS = 40  # window W
CHUNK_STRIDE = 30  # stride S (overlap W - S = 10 tokens)


def chunk_overlap(
    docs: DataFrame, window: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """(doc_id, chunk_idx, n_chunk_tokens, chunk_text): fixed-window
    sliding chunks, chunk i covering tokens [i*S+1, i*S+W]; the last
    chunk starts at the smallest i*S with i*S + W >= n so every token
    is covered and trailing chunks may be short. Context-window
    chunking for training/embedding pipelines; array slicing stays in
    codegen, one row per chunk, no shuffle."""
    toks = docs.select("doc_id", tokens("text").alias("t"))
    n = F.size("t")
    # 1 + ceil(max(n - W, 0) / S), in exact integer arithmetic
    nc = (
        F.lit(1) + F.floor((F.greatest(n - window, F.lit(0)) + (stride - 1)) / F.lit(stride))
    ).cast("int")
    return toks.select(
        "doc_id",
        n.alias("_n"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nc - 1),
                lambda i: F.array_join(F.slice("t", i * stride + 1, window), " "),
            )
        ).alias("chunk_idx", "chunk_text"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.least(F.lit(window), F.col("_n") - F.col("chunk_idx") * stride)
        .cast("bigint")
        .alias("n_chunk_tokens"),
        "chunk_text",
    )


@register(
    "text_chunk_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    )
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           CAST(least({CHUNK_TOKENS}, len(t) - i * {CHUNK_STRIDE}) AS BIGINT)
             AS n_chunk_tokens,
           array_to_string(t[i*{CHUNK_STRIDE}+1 : i*{CHUNK_STRIDE}+{CHUNK_TOKENS}], ' ')
             AS chunk_text
    FROM toks, UNNEST(range(
      1 + CAST(floor((greatest(len(t) - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE - 1})
                     / {CHUNK_STRIDE}.0) AS BIGINT))) AS u(i)
    """,
    doc=f"Sliding-window chunking: {CHUNK_TOKENS}-token chunks at "
    f"stride {CHUNK_STRIDE} ({CHUNK_TOKENS - CHUNK_STRIDE}-token "
    "overlap), every token covered, trailing chunk short. The "
    "context-window preparation step for training and embedding "
    "pipelines; slice/transform/posexplode codegen, zero shuffle.",
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_overlap(load(spark, "documents", sf_dir))


# --- deterministic weighted sampling ---------------------------------

WEIGHT_SCALE = 400  # p = min(1, n_chars / 400): corpus spans 48..553 chars
WSAMPLE_SALT = ":wsample"


def bernoulli_keep(p, key, salt: str):
    """THE deterministic weighted-Bernoulli membership kernel, shared
    by every sampler (length-weighted here, quality-weighted in
    quality_model): include a row with probability ``p`` by comparing
    an 8-hex-char md5 prefix of the salted key against
    printf('%08x', min(p * 2^32, 2^32 - 1)). p*2^32 multiplies an
    exact division by a power of two, so the threshold is
    bit-identical in every engine; membership is a pure string
    compare. The 0xffffffff clamp matters: p=1 would format as 9 hex
    chars ('100000000') and break the 8-char lexicographic compare —
    the clamp costs p=1 rows a deterministic 2^-32 miss chance,
    identical in both engines. Pure codegen, zero shuffle."""
    thr = F.format_string(
        "%08x", F.least(F.floor(p * F.lit(4294967296.0)), F.lit(4294967295.0)).cast("bigint")
    )
    u8 = F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8)
    return u8 < thr


def sample_weighted(docs: DataFrame, scale: int = WEIGHT_SCALE) -> DataFrame:
    """Deterministic weighted Bernoulli (Poisson) sample: include each
    document with probability p = min(1, n_chars/scale) via the shared
    ``bernoulli_keep`` kernel. Emits inv_p (the Horvitz-Thompson
    reweighting factor 1/p) so downstream statistics over the sample
    stay unbiased. Zero shuffle at any scale."""
    p = F.least(F.lit(1.0), F.col("n_chars").cast("double") / scale)
    return (
        docs.withColumn("_p", p)
        .filter(bernoulli_keep(F.col("_p"), F.col("doc_id"), WSAMPLE_SALT))
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("weight"),
            F.col("_p").alias("p"),
            (F.lit(1.0) / F.col("_p")).alias("inv_p"),
        )
    )


@register(
    "sample_weighted",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, source, n_chars,
             least(1.0, CAST(n_chars AS DOUBLE) / {WEIGHT_SCALE}) AS p
      FROM documents
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight, p, 1.0 / p AS inv_p
    FROM m
    WHERE substr(md5(CAST(doc_id AS VARCHAR) || '{WSAMPLE_SALT}'), 1, 8)
          < printf('%08x', CAST(least(floor(p * 4294967296.0), 4294967295.0) AS BIGINT))
    """,
    doc="Deterministic weighted Bernoulli sampling with "
    "Horvitz-Thompson reweighting: inclusion probability proportional "
    "to document length (capped at 1), membership decided by an md5 "
    "prefix vs a %08x-formatted threshold — reproducible across "
    "engines, reruns, and partitionings, and adding documents never "
    "flips existing membership. A pure filter: no shuffle, no state, "
    "100 TB-safe by construction.",
)
def sample_weighted_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_weighted(load(spark, "documents", sf_dir))


# --- token-distribution entropy --------------------------------------


@register(
    "text_unigram_entropy",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), cnt AS (
      SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok
    ), agg AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_distinct,
             sum(CAST(round(c * ln(c), 6) AS DECIMAL(28,6))) AS s
      FROM cnt GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_distinct,
           round(ln(n_tokens) - CAST(s AS DOUBLE) / n_tokens, 4) AS entropy
    FROM agg
    """,
    doc="Per-document unigram (token-distribution) entropy in nats — "
    "the low-entropy gate that catches keyword-stuffing / repeated-"
    "token spam that length and stopword rules miss. entropy = ln(n) "
    "- sum(c*ln(c))/n over token counts c. The log-sum is the one "
    "float-unfriendly aggregate here (its double value depends on "
    "combine order), so each term is rounded to 6 decimals and summed "
    "as exact DECIMAL — combine-order independent, engine-portable — "
    "then the final value rounds to 4. Explode + two map-side-"
    "combining aggregates; shuffles only (doc_id, token) counts.",
)
def text_unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    cnt = (
        d.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(F.round(F.col("c") * F.log("c"), 6).cast("decimal(28,6)")).alias("s"),
    )
    ent = F.round(F.log("n_tokens") - F.col("s").cast("double") / F.col("n_tokens"), 4)
    return agg.select("doc_id", "n_tokens", "n_distinct", ent.alias("entropy"))


_GOPHER_BOOL_SQL = f"""
           len(string_split(text, ' ')) >= {GOPHER_MIN_WORDS}
       AND len(string_split(text, ' ')) <= {GOPHER_MAX_WORDS}
       AND CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(string_split(text, ' ')) >= {GOPHER_MIN_MEAN_LEN}
       AND CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(string_split(text, ' ')) <= {GOPHER_MAX_MEAN_LEN}
       AND CAST((length(text) - length(replace(text, '#', '')))
                + (length(text) - length(replace(text, '...', ''))) / 3
                AS DOUBLE)
             / len(string_split(text, ' ')) < {GOPHER_MAX_SYMBOL_RATIO}
       AND CAST(len(list_filter(string_split(text, ' '),
                                t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
             / len(string_split(text, ' ')) > {GOPHER_MIN_ALPHA_RATIO}
       AND len(list_filter(string_split(text, ' '),
                           t -> t IN {_SW_SQL})) >= {GOPHER_MIN_STOPWORDS}
"""


def _curation_funnel_oracle() -> str:
    from .bloom import BLOOM_K, BLOOM_M
    from .text_analysis import DECONTAM_EVAL_SOURCE, DECONTAM_NGRAM

    member = " AND ".join(
        f"('0x' || substr(md5(gram), {1 + 8 * s}, 8))::BIGINT % {BLOOM_M}"
        " IN (SELECT pos FROM eval_pos)"
        for s in range(BLOOM_K)
    )
    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      WHERE source <> '{DECONTAM_EVAL_SOURCE}'
    ), m AS (
      SELECT doc_id, text, ({_GOPHER_BOOL_SQL}) AS g FROM corpus
    ), tok AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM m WHERE g
    ), grams AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - {DECONTAM_NGRAM - 1}),
                    i -> list_aggregate(t[i:i+{DECONTAM_NGRAM - 1}], 'string_agg', ' ')))
               AS gram
      FROM tok
    ), eval_pos AS (
      SELECT DISTINCT
             ('0x' || substr(md5(g.gram), 1 + 8 * s.s, 8))::BIGINT % {BLOOM_M} AS pos
      FROM (
        SELECT DISTINCT
               unnest(list_transform(generate_series(1, len(t) - {DECONTAM_NGRAM - 1}),
                      i -> list_aggregate(t[i:i+{DECONTAM_NGRAM - 1}], 'string_agg', ' ')))
                 AS gram
        FROM (SELECT string_split(text, ' ') AS t FROM documents
              WHERE source = '{DECONTAM_EVAL_SOURCE}')
      ) g,
      (SELECT unnest([{", ".join(str(s) for s in range(BLOOM_K))}]) AS s) s
    ), contaminated AS (
      SELECT DISTINCT doc_id FROM grams WHERE {member}
    ), clean AS (
      SELECT doc_id, text FROM m
      WHERE g AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    ), survivors AS (
      SELECT min(doc_id) AS doc_id FROM clean GROUP BY md5(text)
    )
    SELECT 'total' AS stage, 0 AS stage_idx, CAST(count(*) AS BIGINT) AS n_docs FROM corpus
    UNION ALL
    SELECT 'gopher_pass', 1, CAST(count(*) AS BIGINT) FROM m WHERE g
    UNION ALL
    SELECT 'decontam_pass', 2, CAST(count(*) AS BIGINT) FROM clean
    UNION ALL
    SELECT 'dedup_survivors', 3, CAST(count(*) AS BIGINT) FROM survivors
    """


@register(
    "curation_funnel",
    oracle=_curation_funnel_oracle(),
    doc="Stage-count funnel of the packaged curation pipeline "
    "(streaming/curation.py): corpus -> Gopher quality gate -> Bloom "
    "decontamination gate -> exact dedup survivors, one count per "
    "stage — the monitoring report an operator watches to see where "
    "documents die. Engine side: one scan computes both gate flags "
    "in codegen (the bitset membership short-circuits on the first "
    "contaminated gram) and folds the three gate counts map-side "
    "into ONE row unpivoted with stack; a second scan dedups the "
    "clean subset by md5 digest. Fully lazy — no persist (caching a "
    "100 TB flagged frame would be wrong), no driver collect. The "
    "oracle recomputes every gate from first principles — including "
    "the Bloom's deterministic false positives via the shared "
    "md5-window spec — so the whole composed pipeline is hash-checked "
    "end to end, not just its pieces.",
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .bloom import _bits_literal, decontam_keep, eval_bloom_bits
    from .text_analysis import DECONTAM_EVAL_SOURCE

    d = load(spark, "documents", sf_dir)
    corpus = d.filter(F.col("source") != DECONTAM_EVAL_SOURCE).select("doc_id", "text")
    bits = _bits_literal(eval_bloom_bits(spark, sf_dir))
    flagged = corpus.select(
        "doc_id",
        "text",
        gopher_keep("text").alias("g"),
        decontam_keep(F.col("text"), bits).alias("dk"),
    )
    # fully lazy: the three gate counts come from ONE scan (a single
    # aggregate row unpivoted with stack), the dedup count from a
    # second scan of the clean subset — no persist (caching a 100 TB
    # flagged frame would be wrong) and no driver collect
    # coalesce: SUM over zero rows is NULL, but the oracle's counts of
    # an empty corpus are 0 — an all-eval-source documents table would
    # otherwise hash-diverge ('None' vs '0')
    zero = F.lit(0).cast("bigint")
    gate_counts = flagged.agg(
        F.count(F.lit(1)).alias("total"),
        F.coalesce(F.sum(F.col("g").cast("bigint")), zero).alias("gopher_pass"),
        F.coalesce(F.sum((F.col("g") & F.col("dk")).cast("bigint")), zero).alias(
            "decontam_pass"
        ),
    ).selectExpr(
        "stack(3, 'total', 0L, total,"
        " 'gopher_pass', 1L, gopher_pass,"
        " 'decontam_pass', 2L, decontam_pass) AS (stage, stage_idx, n_docs)"
    )
    survivors = (
        flagged.filter(F.col("g") & F.col("dk"))
        .groupBy(F.md5("text"))
        .agg(F.min("doc_id"))
        .agg(
            F.lit("dedup_survivors").alias("stage"),
            F.lit(3).cast("bigint").alias("stage_idx"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
    return gate_counts.unionByName(survivors)


@register(
    "quality_tiers_decile",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), b AS (
      SELECT quantile_cont(n_tokens, 0.1) AS b1, quantile_cont(n_tokens, 0.2) AS b2,
             quantile_cont(n_tokens, 0.3) AS b3, quantile_cont(n_tokens, 0.4) AS b4,
             quantile_cont(n_tokens, 0.5) AS b5, quantile_cont(n_tokens, 0.6) AS b6,
             quantile_cont(n_tokens, 0.7) AS b7, quantile_cont(n_tokens, 0.8) AS b8,
             quantile_cont(n_tokens, 0.9) AS b9
      FROM t
    ), tiered AS (
      SELECT doc_id, source, n_tokens,
             1 + CAST(n_tokens > b1 AS INT) + CAST(n_tokens > b2 AS INT)
               + CAST(n_tokens > b3 AS INT) + CAST(n_tokens > b4 AS INT)
               + CAST(n_tokens > b5 AS INT) + CAST(n_tokens > b6 AS INT)
               + CAST(n_tokens > b7 AS INT) + CAST(n_tokens > b8 AS INT)
               + CAST(n_tokens > b9 AS INT) AS tier
      FROM t, b
    )
    SELECT tier,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM tiered GROUP BY tier
    """,
    doc="Curriculum quality tiering: bucket the corpus into deciles "
    "of a quality signal (token count here; any scored column slots "
    "in) and report per-tier volume — the table a data-mixing or "
    "curriculum-ordering step consumes. Deliberately NOT ntile(): a "
    "global ntile plans as a single-partition window (a scale-killer "
    "at 100 TB). Instead the nine decile BOUNDARIES come from one "
    "exact-percentile aggregate (nine doubles in a one-row broadcast "
    "— Spark's percentile() and DuckDB's quantile_cont share the "
    "SQL-standard interpolation formula, so the cut points are "
    "bit-identical), and each doc buckets itself with nine codegen "
    "comparisons: one scan + one tiny broadcast + one map-side "
    "combined aggregate, no global sort. Boundary ties resolve "
    "identically on both engines because the comparisons run on the "
    "same IEEE doubles.",
)
def quality_tiers_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    t = d.select("doc_id", "source", F.size(tokens("text")).alias("n_tokens"))
    b = t.agg(
        *[
            F.percentile("n_tokens", F.lit(p / 10)).alias(f"b{p}")
            for p in range(1, 10)
        ]
    )
    tier = F.lit(1)
    for p in range(1, 10):
        tier = tier + (F.col("n_tokens") > F.col(f"b{p}")).cast("int")
    return (
        t.crossJoin(F.broadcast(b))
        .select("doc_id", "source", "n_tokens", tier.alias("tier"))
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("n_tokens").cast("bigint").alias("min_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


@register(
    "dedup_rate_by_source",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
           round(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(*), 6)
             AS dup_rate
    FROM documents GROUP BY source
    """,
    doc="Corpus-health observability: per-source exact-duplicate rate "
    "(1 - distinct-digest share) — the dashboard number a curation "
    "team watches per crawl/source before deciding dedup budgets. "
    "Complements dedup_exact_hash (which RETURNS the deduped rows): "
    "this is the monitoring aggregate. One map-side-combined "
    "count-distinct over (source, md5) — digests shuffle, text never "
    "does; at 100 TB swap the exact distinct for the HLL sketch "
    "(agg_hll_sketch_merge's pattern) when per-source cardinalities "
    "stop fitting the agg hash table.",
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    uniq = F.countDistinct(F.md5("text"))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        uniq.alias("n_unique"),
        F.round(F.lit(1.0) - uniq.cast("double") / F.count(F.lit(1)), 6).alias("dup_rate"),
    )


EPOCH_SCALE = 200  # w = n_chars / 200: corpus spans ~0.24..2.8 epochs
EPOCH_SALT = ":epochs"


@register(
    "sample_epochs_materialize",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, source, CAST(n_chars AS DOUBLE) / {EPOCH_SCALE} AS w
      FROM documents
    ), c AS (
      SELECT doc_id, source, w,
             CAST(floor(w) AS BIGINT)
             + CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '{EPOCH_SALT}'), 1, 8)
                         < printf('%08x', CAST(least(floor((w - floor(w)) * 4294967296.0),
                                                     4294967295.0) AS BIGINT))
                    THEN 1 ELSE 0 END AS n_copies
      FROM m
    )
    SELECT doc_id, source, round(w, 6) AS w, n_copies,
           unnest(generate_series(1, CAST(n_copies AS INT))) AS copy_idx
    FROM c WHERE n_copies >= 1
    """,
    doc="Materialize fractional-epoch upsampling: a mixing weight "
    "w > 1 (temperature boost, quality boost) cannot be realized by "
    "keep/drop sampling — the doc must appear floor(w) times plus one "
    "more with probability frac(w), so the realized epoch count is "
    "unbiased (E[copies] = w exactly). The fractional coin is the "
    "shared deterministic bernoulli_keep kernel (md5-prefix vs "
    "%08x threshold — reproducible across engines/reruns/partition- "
    "ings), and the copies materialize via explode(sequence(1, n)) — "
    "per-row fanout bounded by w, no shuffle, no state; downstream "
    "shuffles see copy_idx so repeated copies stay distinguishable "
    "(deterministic-shuffle and packing steps need that). The "
    "keep/drop twin for w <= 1 is sample_weighted; this is the w > 1 "
    "half of realizing a sample_temperature mix.",
)
def sample_epochs_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    w = F.col("n_chars").cast("double") / EPOCH_SCALE
    frac = w - F.floor(w)
    n_copies = F.floor(w).cast("bigint") + bernoulli_keep(
        frac, F.col("doc_id"), EPOCH_SALT
    ).cast("bigint")
    c = d.select("doc_id", "source", F.round(w, 6).alias("w"), n_copies.alias("n_copies"))
    # the >= 1 filter is semantic AND load-bearing: Spark's
    # sequence(1, 0) would generate a DESCENDING [1, 0], not empty
    return c.filter(F.col("n_copies") >= 1).select(
        "doc_id",
        "source",
        "w",
        "n_copies",
        F.explode(F.sequence(F.lit(1), F.col("n_copies").cast("int"))).alias("copy_idx"),
    )


@register(
    "text_source_divergence",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
    ), obs AS (
      SELECT source, t, count(*) AS o FROM tok GROUP BY source, t
    ), ns AS (
      SELECT source, CAST(sum(o) AS BIGINT) AS n_s,
             CAST(count(*) AS BIGINT) AS n_distinct
      FROM obs GROUP BY source
    ), nt AS (
      SELECT t, CAST(sum(o) AS BIGINT) AS n_t FROM obs GROUP BY t
    ), grand AS (SELECT CAST(sum(n_t) AS BIGINT) AS n FROM nt
    ), cells AS (
      SELECT obs.source,
             round((obs.o - (CAST(ns.n_s AS DOUBLE) * nt.n_t) / grand.n)
                   * (obs.o - (CAST(ns.n_s AS DOUBLE) * nt.n_t) / grand.n)
                   / ((CAST(ns.n_s AS DOUBLE) * nt.n_t) / grand.n)
                   - (CAST(ns.n_s AS DOUBLE) * nt.n_t) / grand.n, 6) AS term
      FROM obs JOIN ns USING (source) JOIN nt USING (t), grand
    )
    SELECT c.source, ns.n_s AS n_tokens, ns.n_distinct,
           round(CAST(sum(CAST(term AS DECIMAL(28,6))) AS DOUBLE) + ns.n_s, 3)
             AS chi2
    FROM cells c JOIN ns ON c.source = ns.source
    GROUP BY c.source, ns.n_s, ns.n_distinct
    """,
    doc="Domain-shift detection: per-source chi-square divergence of "
    "the token distribution from the corpus-wide one — the monitoring "
    "stat that flags a crawl/source whose language drifted (spam "
    "influx, template change) before it pollutes a training mix. "
    "Identity used: summing (obs-exp)^2/exp over ALL tokens equals "
    "n_s + sum over PRESENT cells of ((obs-exp)^2/exp - exp), so "
    "absent cells never materialize — the cell table stays "
    "|distinct (source, token)| not |sources| x |vocab|. Rational "
    "arithmetic only (no ln — chi-square instead of KL for exactly "
    "this reason); per-cell terms rounded to 6 decimals and summed "
    "as DECIMAL (the unigram-entropy bridge) so the reduction order "
    "can never change the hash. Cost shape: two map-side-combined "
    "counts, one join shuffled on token, one tiny broadcast each for "
    "per-source totals and the grand total.",
)
def text_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    obs = (
        d.select("source", F.explode(tokens("text")).alias("t"))
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    ns = obs.groupBy("source").agg(
        F.sum("o").cast("bigint").alias("n_s"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    nt = obs.groupBy("t").agg(F.sum("o").cast("bigint").alias("n_t"))
    grand = nt.agg(F.sum("n_t").cast("bigint").alias("n"))
    exp = (F.col("n_s").cast("double") * F.col("n_t")) / F.col("n")
    diff = F.col("o") - exp
    cells = (
        obs.join(F.broadcast(ns.select("source", "n_s")), "source")
        .join(nt, "t")
        .crossJoin(F.broadcast(grand))
        .select("source", F.round(diff * diff / exp - exp, 6).alias("term"))
    )
    return (
        cells.groupBy("source")
        .agg(F.sum(F.col("term").cast("decimal(28,6)")).alias("_s"))
        .join(F.broadcast(ns), "source")
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            "n_distinct",
            F.round(F.col("_s").cast("double") + F.col("n_s"), 3).alias("chi2"),
        )
    )


# Curriculum ordering: fixed difficulty-band thresholds (tokens) and
# the hash salt that defines the within-stage permutation. The bucket
# is the hash's first hex nibble, so ordering by (bucket, hash) is
# the same total order as (hash) — which is what makes the two-level
# rank provably equal to the oracle's global row_number.
CURR_SALT = ":curr"
CURR_T0, CURR_T1 = 40, 70


@register(
    "curriculum_rank_distributed",
    oracle=f"""
    WITH k AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR) || '{CURR_SALT}') AS h,
             len(string_split(text, ' ')) AS nt
      FROM documents
    ), s AS (
      SELECT doc_id, h,
             CASE WHEN nt < {CURR_T0} THEN 0
                  WHEN nt < {CURR_T1} THEN 1 ELSE 2 END AS stage
      FROM k
    )
    SELECT doc_id, CAST(stage AS BIGINT) AS stage,
           row_number() OVER (ORDER BY stage, h, doc_id) AS global_pos
    FROM s
    """,
    doc="Global curriculum order (easy -> hard stages, deterministic "
    "hash shuffle within each stage) materialized as an explicit "
    "global_pos WITHOUT the single-partition window a global "
    "row_number plans. Two-level distributed ranking: (1) rows get a "
    "16-way bucket from the first hex nibble of their salted hash; "
    "(2) per-(stage, bucket) counts — at most 3x16 rows — take one "
    "metadata-sized cumsum to become bucket start offsets; (3) "
    "row_number runs per (stage, bucket) — 48 bounded partitions "
    "instead of 1 — and adds its bucket's offset. Because the bucket "
    "is a prefix of the hash, (stage, bucket, hash) is the same "
    "total order as (stage, hash), so the result is hash-identical "
    "to the oracle's flat row_number. This is the pattern for "
    "materializing ANY global training order at 100 TB; "
    "shuffle_deterministic is the per-shard variant that skips the "
    "offsets when positions only need to be unique within a file.",
)
def curriculum_rank_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, "documents", sf_dir)
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(CURR_SALT)))
    nt = F.size(tokens("text"))
    k = d.select(
        "doc_id",
        h.alias("h"),
        F.when(nt < CURR_T0, 0).when(nt < CURR_T1, 1).otherwise(2).alias("stage"),
    ).withColumn(
        "bucket",
        F.expr("instr('0123456789abcdef', substring(h, 1, 1))") - 1,
    )
    counts = k.groupBy("stage", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    # 48-row cumsum: bounded by stages x 16 nibbles, never by data
    woff = Window.orderBy("stage", "bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "stage", "bucket", F.coalesce(F.sum("cnt").over(woff), F.lit(0)).alias("off")
    )
    wrank = Window.partitionBy("stage", "bucket").orderBy("h", "doc_id")
    return (
        k.join(F.broadcast(offsets), ["stage", "bucket"])
        .select(
            "doc_id",
            F.col("stage").cast("bigint").alias("stage"),
            (F.col("off") + F.row_number().over(wrank)).alias("global_pos"),
        )
    )


@register(
    "quality_quantile_normalize",
    oracle="""
    SELECT doc_id, source, n_chars,
           round(percent_rank() OVER (PARTITION BY source ORDER BY n_chars), 6)
             AS pct_rank
    FROM documents
    """,
    doc="Cross-source score normalization: each document's quality "
    "signal (n_chars here; any per-doc score slots in) mapped to its "
    "within-source percentile, making scores comparable ACROSS "
    "sources before mixing — the step that stops one source's score "
    "scale from dominating a blended quality threshold. The naive "
    "percent_rank window partitioned by source sorts each source on "
    "one reducer — a scale-killer when one crawl is 10% of a 100 TB "
    "corpus. This implementation never windows over documents: it "
    "builds the per-(source, value) histogram (dimension-sized), "
    "takes ONE cumsum over that histogram, and broadcast-joins the "
    "resulting rank offsets back to the scan. Because percent_rank "
    "uses RANK (ties share), rank = 1 + count of strictly-smaller "
    "values — exactly the histogram prefix sum — so the result is "
    "hash-identical to the flat window oracle.",
)
def quality_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, "documents", sf_dir)
    hist = d.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    wsrc = Window.partitionBy("source")
    wcum = wsrc.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, -1)
    ranks = hist.select(
        "source",
        "n_chars",
        F.coalesce(F.sum("cnt").over(wcum), F.lit(0)).alias("cum_before"),
        F.sum("cnt").over(wsrc).alias("n_src"),
    )
    pr = F.when(F.col("n_src") == 1, F.lit(0.0)).otherwise(
        F.col("cum_before").cast("double") / (F.col("n_src") - 1)
    )
    return d.select("doc_id", "source", "n_chars").join(
        F.broadcast(ranks.select("source", "n_chars", F.round(pr, 6).alias("pct_rank"))),
        ["source", "n_chars"],
    ).select("doc_id", "source", "n_chars", "pct_rank")


# Winsorization bounds: clip the per-source tails at these quantiles.
WINSOR_LO, WINSOR_HI = 0.05, 0.95


@register(
    "quality_winsorize",
    oracle=f"""
    WITH q AS (
      SELECT source,
             quantile_cont(CAST(n_chars AS DOUBLE), {WINSOR_LO}) AS lo,
             quantile_cont(CAST(n_chars AS DOUBLE), {WINSOR_HI}) AS hi
      FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source, d.n_chars,
           round(q.lo, 6) AS lo, round(q.hi, 6) AS hi,
           round(least(greatest(CAST(d.n_chars AS DOUBLE), q.lo), q.hi), 6)
             AS winsorized,
           (CAST(d.n_chars AS DOUBLE) < q.lo OR CAST(d.n_chars AS DOUBLE) > q.hi)
             AS clipped
    FROM documents d JOIN q USING (source)
    """,
    doc="Per-source winsorization: clip a document feature to its "
    f"source's [p{int(WINSOR_LO * 100)}, p{int(WINSOR_HI * 100)}] "
    "band — the outlier-taming transform applied to features before "
    "they feed a quality model or a mixture weight (companion to "
    "quality_quantile_normalize, which remaps the whole distribution; "
    "winsorizing only tames the tails and keeps the interior metric "
    "linear). The quantile table is one exact percentile aggregate "
    "per source (percentile_cont semantics, the agg_percentile_exact "
    "parity), dimension-sized, so it re-attaches by BROADCAST and "
    "the clip itself is pure codegen at scan speed — the corpus is "
    "never shuffled. At 100 TB with huge groups, swap the exact "
    "percentile for approx_percentile's mergeable sketch and the "
    "plan shape is unchanged.",
)
def quality_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    v = F.col("n_chars").cast("double")
    q = d.groupBy("source").agg(
        F.percentile(v, F.lit(WINSOR_LO)).alias("lo"),
        F.percentile(v, F.lit(WINSOR_HI)).alias("hi"),
    )
    j = d.join(F.broadcast(q), "source")
    return j.select(
        "doc_id",
        "source",
        "n_chars",
        F.round("lo", 6).alias("lo"),
        F.round("hi", 6).alias("hi"),
        F.round(F.least(F.greatest(v, F.col("lo")), F.col("hi")), 6).alias("winsorized"),
        ((v < F.col("lo")) | (v > F.col("hi"))).alias("clipped"),
    )


# --- PPS systematic sampling (round 12, wave-5 queue) --------------------

PPS_K = 50  # target draws


@register(
    "sample_pps_systematic",
    oracle=f"""
    WITH w AS (
      SELECT l_partkey AS pk,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wt
      FROM lineitem GROUP BY 1
    ),
    c AS (
      SELECT pk, wt,
             CAST(sum(wt) OVER (ORDER BY pk) AS BIGINT) AS cum,
             CAST(sum(wt) OVER () AS BIGINT) AS tot
      FROM w
    ),
    r AS (
      SELECT CAST(('0x' || substr(md5('pps:427'), 1, 12)) AS BIGINT)
             % (SELECT max(tot) FROM c) + 1 AS r0
    ),
    s AS (
      SELECT pk, wt, cum, tot, r0,
             CASE WHEN cum * {PPS_K} >= r0
                  THEN (cum * {PPS_K} - r0) // tot + 1 ELSE 0 END AS sel,
             CASE WHEN (cum - wt) * {PPS_K} >= r0
                  THEN ((cum - wt) * {PPS_K} - r0) // tot + 1 ELSE 0 END
               AS sel_prev
      FROM c CROSS JOIN r
    )
    SELECT pk AS l_partkey, wt AS weight,
           CAST(sel - sel_prev AS BIGINT) AS n_hits,
           round(least(1.0, CAST({PPS_K} AS DOUBLE) * wt / tot), 6)
             AS incl_prob
    FROM s WHERE sel - sel_prev > 0
    """,
    doc=f"Probability-proportional-to-size SYSTEMATIC sampling of "
    f"{PPS_K} part draws weighted by lifetime order quantity — the "
    "one-pass fixed-size weighted design survey statisticians and "
    "data-mixture builders use when Bernoulli/Poisson sampling's "
    "random size is unacceptable (sample_weighted's HT cousin with "
    "a deterministic draw count). Fully exact: the selection grid "
    "r + j*T over cumulative weights is cross-multiplied by k (no "
    "rational step is ever materialized), the start offset r is the "
    "md5-deterministic integer in [1, T] both engines derive "
    "identically (a zero offset would draw k+1 items: grid points "
    "j=0..k all land in [0, T]), and per-item hit counts are differences of "
    "integer floor divisions of NON-NEGATIVE operands (floor == "
    "trunc, engine-agreed); oversized items legitimately draw "
    "n_hits > 1. OPERAND BOUND: cum*k <= T*k stays in BIGINT to "
    "T ~ 1.8e17 total units. Shape: one part reduce over the "
    "facts, then a part-DIMENSION cumulative window (catalog-"
    "bounded; a 100 TB deployment range-partitions the dimension "
    "and offsets r per range), output is the selected sample.",
)
def sample_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, "lineitem", sf_dir)
    w = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("wt")
    )
    cum_w = Window.orderBy("pk").rowsBetween(Window.unboundedPreceding, 0)
    c = w.select(
        "pk",
        "wt",
        F.sum("wt").over(cum_w).cast("bigint").alias("cum"),
        F.sum("wt").over(
            Window.orderBy("pk").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("bigint").alias("tot"),
    )
    # r0 in [1, tot]: a zero offset would put grid points j=0..k all
    # inside [0, T] and draw k+1 items (round-12 advice); the shifted
    # range keeps the draw count at exactly PPS_K for every offset.
    r0 = (
        F.conv(F.substring(F.md5(F.lit("pps:427")), 1, 12), 16, 10).cast("long")
        % F.col("tot")
        + F.lit(1)
    )
    s = c.select(
        "pk",
        "wt",
        "cum",
        "tot",
        r0.alias("r0"),
    )
    sel = F.when(
        F.col("cum") * PPS_K >= F.col("r0"),
        F.expr(f"(cum * {PPS_K} - r0) div tot") + 1,
    ).otherwise(F.lit(0))
    sel_prev = F.when(
        (F.col("cum") - F.col("wt")) * PPS_K >= F.col("r0"),
        F.expr(f"((cum - wt) * {PPS_K} - r0) div tot") + 1,
    ).otherwise(F.lit(0))
    out = s.select(
        F.col("pk").alias("l_partkey"),
        F.col("wt").alias("weight"),
        (sel - sel_prev).cast("bigint").alias("n_hits"),
        F.round(
            F.least(F.lit(1.0), F.lit(float(PPS_K)) * F.col("wt") / F.col("tot")),
            6,
        ).alias("incl_prob"),
    )
    return out.filter(F.col("n_hits") > 0)
