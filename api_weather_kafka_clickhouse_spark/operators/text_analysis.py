"""Text-analysis operators (SURVEY.md §2-D4): token/char stats,
quality scoring, language-ID heuristic, document fingerprinting,
n-gram frequency.

All built-in-function columns (functions/text.py) — per-row compute
inside codegen, no UDFs, so these run at parquet-scan speed on a
100 TB documents table; the only shuffles are the final small
aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import (
    STOPWORDS,
    n_tokens,
    quality_score,
    shingles,
    stopword_hits,
    tokens,
)
from ..registry import register
from ..tables import load

_SW_SQL = "(" + ", ".join(f"'{s}'" for s in STOPWORDS) + ")"


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           length(text)                 AS n_chars,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / len(string_split(text, ' ')) AS avg_token_len,
           len(list_filter(string_split(text, ' '), t -> t IN {_SW_SQL})) AS n_stopwords
    FROM documents
    """,
    doc="Per-document token statistics: counts, exact average token "
    "length (int arithmetic + one division), stopword hits via a "
    "higher-order filter.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    nt = n_tokens("text")
    return d.select(
        "doc_id",
        nt.cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        (F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double") / nt).alias(
            "avg_token_len"
        ),
        stopword_hits("text").cast("bigint").alias("n_stopwords"),
    )


@register(
    "text_quality_by_lang",
    oracle=f"""
    WITH scored AS (
      SELECT lang,
             CAST(least(len(string_split(text, ' ')), 100) AS DOUBLE) / 100.0
             * (CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                                               t -> t IN {_SW_SQL})) AS DOUBLE)
                          / len(string_split(text, ' ')) > 0.05
                     THEN 1.0 ELSE 0.5 END) AS q
      FROM documents
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_quality,
           CAST(sum(CASE WHEN q >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
    FROM scored
    GROUP BY lang
    """,
    doc="Corpus quality filter stats per language: deterministic 0..1 "
    "heuristic (length band x stopword-ratio band), aggregated with "
    "exact decimal sums. The keep/drop split is the classic LLM "
    "pretraining quality gate.",
)
def text_quality_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    q = quality_score("text")
    scored = d.select("lang", q.alias("q"))
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.col("q").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_quality"
        ),
        F.sum(F.when(F.col("q") >= 0.5, 1).otherwise(0)).alias("n_keep"),
    )


@register(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN len(list_filter(string_split(text, ' '), t -> t IN {_SW_SQL}))
                     * 1.0 / len(string_split(text, ' ')) > 0.08
                THEN 'en' ELSE 'other' END AS lid_guess
    FROM documents
    """,
    doc="Language-ID heuristic (stopword-density n-gram rule). The "
    "synthetic corpus is English-like under every label, so the value "
    "is the deterministic mechanics, not linguistic accuracy.",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    density = stopword_hits("text") * F.lit(1.0) / n_tokens("text")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(density > 0.08, "en").otherwise("other").alias("lid_guess"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           CAST(sum((t.pos) * (ascii(t.tok) * 31 + length(t.tok))) % 2147483647
                AS BIGINT) AS fingerprint
    FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ) t
    GROUP BY doc_id
    """,
    doc="Position-weighted document fingerprint: sum over tokens of "
    "pos * (ascii(first char) * 31 + len) mod 2^31-1. Commutative "
    "integer sum -> combine-order independent, exact in both engines; "
    "order-sensitive because positions are weighted.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    ex = d.select("doc_id", F.posexplode(tokens("text")).alias("pos0", "tok"))
    contrib = (F.col("pos0") + 1) * (F.ascii("tok") * 31 + F.length("tok"))
    return (
        ex.select("doc_id", contrib.alias("c"))
        .groupBy("doc_id")
        .agg((F.sum("c") % F.lit(2147483647)).alias("fingerprint"))
    )


@register(
    "text_tfidf_topk",
    oracle="""
    WITH ex AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ((SELECT count(*) FROM documents) - dfreq.df + 0.5)
                   / (dfreq.df + 0.5) AS score
      FROM tf JOIN dfreq ON tf.term = dfreq.term
    )
    SELECT doc_id, term, round(score, 6) AS tfidf, rn AS rank
    FROM (
      SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
    doc="Per-document top-3 terms by tf-idf (SURVEY §2-D4's groupBy+"
    "join shape): term counts -> document frequencies -> score join -> "
    "windowed top-k. The idf is the rational BM25-style "
    "(N - df + 0.5)/(df + 0.5) — no ln(), so the score arithmetic is "
    "single IEEE ops and bit-identical across engines (a transcendental "
    "idf could differ by an ULP and flip rankings). At 100 TB: tf and "
    "df are two map-side-combining aggregates, the score join shuffles "
    "on term, top-k is per-doc row_number — no global sort.",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..plans.stage import eager_release

    d = load(spark, "documents", sf_dir)
    ex = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    # tf feeds two plan branches (document frequencies AND the score
    # join) — cache it or the full-corpus token explode + groupBy runs
    # twice; released via eager_release
    tf = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")).persist()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", F.round("score", 6).alias("tfidf"), "rank")
    )
    return eager_release(out, "tfidf_topk", tf)


_BPE_ALPHA = "[A-Za-z]+"
_BPE_NUM = "[0-9]+"
_BPE_OTHER = "[^A-Za-z0-9 ]"
_BPE_ALL = f"{_BPE_ALPHA}|{_BPE_NUM}|{_BPE_OTHER}+"


@register(
    "text_token_regex",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPE_ALL}'))   AS n_tokens_bpe,
           len(regexp_extract_all(text, '{_BPE_ALPHA}')) AS n_alpha,
           len(regexp_extract_all(text, '{_BPE_NUM}'))   AS n_num,
           len(string_split(text, ' '))                  AS n_tokens_ws
    FROM documents
    """,
    doc="BPE-style regex token counting vs whitespace tokens: runs of "
    "letters, runs of digits, and runs of other non-space chars as "
    "separate tokens (the GPT-2 pre-tokenizer's class split, reduced "
    "to character classes that behave identically in Java regex and "
    "RE2). Pure codegen expressions — token statistics at scan speed.",
)
def text_token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_BPE_ALL), 0)).cast("bigint").alias(
            "n_tokens_bpe"
        ),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_ALPHA), 0)).cast("bigint").alias("n_alpha"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_NUM), 0)).cast("bigint").alias("n_num"),
        n_tokens("text").cast("bigint").alias("n_tokens_ws"),
    )


SEQ_TOKEN_BUDGET = 2048


@register(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
             sum(len(string_split(text, ' ')))
               OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM documents
    )
    SELECT doc_id, lang, n_tokens,
           CAST((cum - n_tokens) // {SEQ_TOKEN_BUDGET} AS BIGINT) AS seq_id,
           CAST((cum - n_tokens) % {SEQ_TOKEN_BUDGET} AS BIGINT) AS seq_offset
    FROM t
    """,
    doc="Sequence packing for training (concat-then-chunk): documents "
    "are laid head-to-tail in a deterministic order and chunked into "
    f"{SEQ_TOKEN_BUDGET}-token sequences; each doc gets its sequence "
    "id and starting offset from one running token sum. Packing is "
    "per-lang (per shard at 100 TB) so the window is partitioned — "
    "a global pack would serialize; sharded packing is what real "
    "pipelines do anyway.",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, "documents", sf_dir)
    nt = n_tokens("text").cast("bigint")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = d.select("doc_id", "lang", nt.alias("n_tokens"), F.sum(nt).over(w).alias("cum"))
    start = F.col("cum") - F.col("n_tokens")
    return t.select(
        "doc_id",
        "lang",
        "n_tokens",
        # integer `div`, not float `/` + cast: the oracle uses exact
        # integer floor division, and double arithmetic diverges once
        # a per-lang cumulative token count exceeds 2^53 — mirrors the
        # exact pmod used for seq_offset
        F.expr(f"(cum - n_tokens) div {SEQ_TOKEN_BUDGET}").cast("bigint").alias("seq_id"),
        F.pmod(start, F.lit(SEQ_TOKEN_BUDGET)).cast("bigint").alias("seq_offset"),
    )


@register(
    "split_train_holdout",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                THEN 'train' ELSE 'holdout' END AS split
    FROM documents
    """,
    doc="Deterministic train/holdout assignment — the reproducible "
    "dataset-split every training pipeline needs: hash the stable key "
    "(md5, identical hex in every engine), compare a prefix against a "
    "threshold ('cd' = 205/256 ~ 80%). No RNG, no state: any engine, "
    "any partitioning, any rerun yields the same split, and adding "
    "documents never reassigns existing ones.",
)
def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return d.select(
        "doc_id",
        "lang",
        F.when(bucket < "cd", "train").otherwise("holdout").alias("split"),
    )


@register(
    "sample_stratified",
    oracle=None,  # rows-only BY CHOICE (r7 verdict item 5 examined):
    # this entry exists to cover Spark's native sampleBy API, whose
    # per-stratum Bernoulli draw consumes the engine's own RNG stream
    # — replacing it with a salted-hash threshold (as sample_weighted
    # did) would make it a duplicate of sample_fixed_per_stratum /
    # split_train_holdout, which already gate that cross-engine
    # pattern, and would stop exercising sampleBy at all. Stratum
    # proportions + seed-determinism asserted in pytest instead.
    doc="Stratified corpus subsampling (per-language fractions via "
    "sampleBy): the standard way to rebalance a pretraining mix. "
    "Seeded Bernoulli sampling per stratum — one scan, no shuffle; "
    "deterministic for a fixed seed and partitioning but not across "
    "engines, hence rows-only for the driver. For cross-engine "
    "reproducible subsets use split_train_holdout's hash-threshold "
    "pattern instead.",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    fractions = {"en": 0.25, "zh": 0.8, "es": 0.8, "de": 0.8, "fr": 0.8}
    return d.sampleBy("lang", fractions, seed=20260813).select("doc_id", "lang", "source")


@register(
    "text_sentence_udtf",
    oracle="""
    SELECT doc_id,
           generate_subscripts(string_split(text, '. '), 1) - 1 AS pos,
           unnest(string_split(text, '. ')) AS sentence
    FROM documents
    WHERE doc_id < 50
    """,
    doc="Python UDTF surface (§2-C UDF/UDAF/UDTF): a table function "
    "splitting documents into (pos, sentence) rows via LATERAL join. "
    "Python UDTFs run row-at-a-time — this demonstrates and "
    "oracle-checks the API against the declarative twin "
    "(posexplode(split(...))), which is the production shape for this "
    "particular transform; UDTFs earn their cost only when the "
    "expansion logic can't be expressed with built-ins. Fenced to 50 "
    "docs for exactly that reason.",
)
def text_sentence_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, sentence string")
    class SplitSentences:
        def eval(self, text: str):
            for i, s in enumerate(text.split(". ")):
                yield i, s

    spark.udtf.register("split_sentences", SplitSentences)
    d = load(spark, "documents", sf_dir).filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT doc_id, s.pos, s.sentence FROM _udtf_docs, LATERAL split_sentences(text) s"
    )


@register(
    "text_bigram_topk",
    oracle="""
    SELECT bigram, count(*) AS n
    FROM (
      SELECT unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bigram
      FROM (SELECT string_split(text, ' ') AS w FROM documents)
    )
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
    doc="Global top-20 word bigrams: explode -> count -> top-k with a "
    "lexicographic tiebreak (partial aggregation map-side, then a "
    "20-row driver merge — no global sort).",
)
def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explode + window lead, not a higher-order transform: HOF lambdas
    # run interpreted (~100x slower); this stays in codegen
    from pyspark.sql import Window

    d = load(spark, "documents", sf_dir)
    t = d.select("doc_id", F.posexplode(tokens("text")).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    nxt = F.lead("tok", 1).over(w)
    return (
        t.select(F.concat_ws(" ", F.col("tok"), nxt).alias("bigram"), nxt.alias("_n"))
        .filter(F.col("_n").isNotNull())
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(20)
    )


def _token_ngrams(d: DataFrame, n: int) -> DataFrame:
    """(doc_id, gram) rows of word n-grams — codegen posexplode +
    window leads (the dedup shingle shape generalized to n); one
    shuffle on doc_id, everything else whole-stage codegen."""
    from pyspark.sql import Window

    t = d.select("doc_id", F.posexplode(tokens("text")).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", k).over(w) for k in range(1, n)]
    return (
        t.select(
            "doc_id",
            F.concat_ws(" ", F.col("tok"), *leads).alias("gram"),
            leads[-1].alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .select("doc_id", "gram")
    )


DECONTAM_NGRAM = 4
DECONTAM_EVAL_SOURCE = "src0"


@register(
    "decontaminate_ngram_overlap",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, lang, string_split(text, ' ') AS t FROM documents
    ), grams AS (
      SELECT doc_id, source, lang,
             unnest(list_transform(generate_series(1, len(t) - {DECONTAM_NGRAM - 1}),
                    i -> list_aggregate(t[i:i+{DECONTAM_NGRAM - 1}], 'string_agg', ' ')))
               AS gram
      FROM tok
    ), eval_grams AS (
      SELECT DISTINCT gram FROM grams WHERE source = '{DECONTAM_EVAL_SOURCE}'
    )
    SELECT c.doc_id, any_value(c.lang) AS lang, any_value(c.source) AS source,
           count(DISTINCT c.gram) AS n_hit_grams
    FROM grams c JOIN eval_grams e USING (gram)
    WHERE c.source <> '{DECONTAM_EVAL_SOURCE}'
    GROUP BY c.doc_id
    """,
    doc="Benchmark decontamination: corpus documents sharing any "
    f"{DECONTAM_NGRAM}-gram with the held-out eval shard "
    f"('{DECONTAM_EVAL_SOURCE}') are flagged with their distinct-hit "
    "count; the clean corpus is the left-anti join against these ids. "
    "Scale shape: eval suites are tiny relative to a 100 TB corpus, so "
    "only the eval shard is ever exploded to build the gram set, which "
    "BROADCASTS; the contamination test on the corpus side is a "
    "broadcast hash join at scan speed. The corpus pays one doc_id "
    "exchange (the gram window) plus a map-side-combined count over "
    "the tiny hit set — no corpus-size shuffle ever carries grams to "
    "a reducer. The n-gram match "
    "is the standard contamination test (exact 8-13-gram collision in "
    "published pipelines; 4 here to suit the synthetic corpus).",
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    # the source predicate splits at the DOCUMENT level, before any
    # shingling: the eval shard (tiny by definition) is the only side
    # that gets exploded to build the broadcast gram set, and the
    # corpus side is shingled exactly once — shingling everything and
    # filtering grams afterwards would run the explode+window pass
    # over the full corpus twice
    eval_grams = (
        _token_ngrams(
            d.filter(F.col("source") == DECONTAM_EVAL_SOURCE).select("doc_id", "text"),
            DECONTAM_NGRAM,
        )
        .select("gram")
        .distinct()
    )
    corpus_docs = d.filter(F.col("source") != DECONTAM_EVAL_SOURCE)
    hits = (
        _token_ngrams(corpus_docs.select("doc_id", "text"), DECONTAM_NGRAM)
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_hit_grams"))
    )
    # metadata attaches to the (small) flagged set, not to every gram
    return hits.join(corpus_docs.select("doc_id", "lang", "source"), "doc_id").select(
        "doc_id", "lang", "source", "n_hit_grams"
    )


REPETITION_NGRAM = 3


@register(
    "text_repetition_ratio",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - {REPETITION_NGRAM - 1}),
                    i -> list_aggregate(t[i:i+{REPETITION_NGRAM - 1}], 'string_agg', ' ')))
               AS gram
      FROM tok
    )
    SELECT doc_id,
           count(*) AS n_grams,
           count(DISTINCT gram) AS n_distinct,
           round(1.0 - CAST(count(DISTINCT gram) AS DOUBLE) / count(*), 6) AS dup_frac
    FROM grams
    GROUP BY doc_id
    """,
    doc="Within-document repetition ratio: fraction of duplicated "
    f"{REPETITION_NGRAM}-grams (1 - distinct/total) — the "
    "Gopher-style repetition quality filter that catches boilerplate "
    "and degenerate generations. The gram explode and the per-doc "
    "aggregate share the doc_id partitioning (window shuffle feeds "
    "the groupBy with no second exchange); fixed-size state per doc.",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    return (
        _token_ngrams(d, REPETITION_NGRAM)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_distinct("gram").alias("n_distinct"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_distinct",
            F.round(1.0 - F.col("n_distinct").cast("double") / F.col("n_grams"), 6).alias(
                "dup_frac"
            ),
        )
    )


SHUFFLE_SEED = "42"
# shard count is fixed at 16 by the first-hex-nibble split below —
# both the Spark plan and the oracle hard-code the nibble alphabet


@register(
    "shuffle_deterministic",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang,
             md5(CAST(doc_id AS VARCHAR) || ':{SHUFFLE_SEED}') AS h
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(instr('0123456789abcdef', substr(h, 1, 1)) - 1 AS BIGINT) AS shard,
           row_number() OVER (
             PARTITION BY instr('0123456789abcdef', substr(h, 1, 1))
             ORDER BY h, doc_id) AS pos
    FROM keyed
    """,
    doc="Deterministic global shuffle for training: each document's "
    "position comes from md5(doc_id || seed) — any engine, any "
    "partitioning, any rerun yields the same permutation, and the "
    "shard (first hex nibble of the hash) doubles as the output file "
    "assignment. The scale shape is exactly this plan: ONE hash-"
    "partitioned exchange on the shard, a sort within each shard "
    "(independent, parallel — never a global sort), and writers emit "
    "shard files in order. Changing the seed constant reshuffles; "
    "keeping it reproduces a published data order bit-for-bit.",
)
def shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, "documents", sf_dir)
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{SHUFFLE_SEED}")))
    keyed = d.select("doc_id", "lang", h.alias("h")).withColumn(
        "shard",
        (F.expr("instr('0123456789abcdef', substring(h, 1, 1))") - 1).cast("bigint"),
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return keyed.select(
        "doc_id", "lang", "shard", F.row_number().over(w).alias("pos")
    )


# --- PII scrubbing ---------------------------------------------------

# Patterns restricted to syntax with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): character classes, bounded
# quantifiers, alternation — no backrefs, no lookaround, no \b
# (word-boundary interacts with RE2's UTF-8 mode differently than
# Java's). Applied in this order; SSN before the generic digit runs
# an email/IP could otherwise partially consume.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PII_IPV4 = "([0-9]{1,3}[.]){3}[0-9]{1,3}"
PII_SSN = "[0-9]{3}-[0-9]{2}-[0-9]{4}"


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH s1 AS (
      SELECT doc_id, text,
             regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g') AS t1
      FROM documents
    ), s2 AS (
      SELECT *, regexp_replace(t1, '{PII_SSN}', '<SSN>', 'g') AS t2 FROM s1
    )
    SELECT doc_id,
           regexp_replace(t2, '{PII_IPV4}', '<IP>', 'g') AS text_scrubbed,
           len(regexp_extract_all(text, '{PII_EMAIL}')) AS n_emails,
           len(regexp_extract_all(t1, '{PII_SSN}')) AS n_ssns,
           len(regexp_extract_all(t2, '{PII_IPV4}')) AS n_ips
    FROM s2
    """,
    doc="PII redaction — the compliance pass every training-corpus "
    "pipeline runs before packing: emails, SSNs, and IPv4 literals "
    "replaced with typed placeholder tags, with per-doc match counts "
    "for audit. Each count is taken on the SAME intermediate its "
    "replacement ran on (emails on raw text, SSNs on the email-"
    "scrubbed text, IPs after both), so counts always equal the "
    "redactions actually performed — counting everything on the raw "
    "text would report a phantom SSN for '123-45-6789@example.com', "
    "whose digits the email pass already consumed. Pure codegen "
    "regexp_replace/regexp_count chains (no UDF), so it runs at scan "
    "speed over 100 TB; patterns are restricted to the Java-regex/RE2 "
    "common subset so the DuckDB oracle executes the IDENTICAL "
    "expressions. The synthetic corpus contains no PII (scrub is the "
    "identity there — asserted in tests), so the redaction semantics "
    "themselves are proven on crafted fixtures in "
    "tests/test_text_pii.py.",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    return scrub_pii(d)


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text_scrubbed, n_emails, n_ssns, n_ips) over any
    (doc_id, text) frame — the reusable kernel text_pii_scrub wraps.
    Counts are staged to match the chained replacements (see the
    registered operator's doc)."""
    t = F.col(text_col)
    t1 = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    t2 = F.regexp_replace(t1, PII_SSN, "<SSN>")
    return docs.select(
        "doc_id",
        F.regexp_replace(t2, PII_IPV4, "<IP>").alias("text_scrubbed"),
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count(t1, F.lit(PII_SSN)).cast("bigint").alias("n_ssns"),
        F.regexp_count(t2, F.lit(PII_IPV4)).cast("bigint").alias("n_ips"),
    )


SEG_TOKENS = 10


@register(
    "text_segment_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    segs AS (
      SELECT doc_id, CAST(i AS INT) AS seg_idx,
             array_to_string(t[i*{SEG_TOKENS}+1 : i*{SEG_TOKENS}+{SEG_TOKENS}], ' ') AS seg
      FROM toks, UNNEST(range(CAST(ceil(len(t) / {SEG_TOKENS}.0) AS BIGINT))) AS u(i)
    ),
    kept AS (
      SELECT doc_id, seg_idx, seg,
             row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
      FROM segs
    ),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             string_agg(seg, ' ' ORDER BY seg_idx) AS text_clean
      FROM kept WHERE rn = 1 GROUP BY doc_id
    ),
    tot AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs FROM segs GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_segs, COALESCE(a.n_kept, 0) AS n_kept,
           COALESCE(a.text_clean, '') AS text_clean
    FROM tot t LEFT JOIN agg a USING (doc_id)
    """,
    doc="Corpus-wide segment-level exact dedup (the RefinedWeb/C4 "
    "boilerplate-removal shape): split every document into fixed "
    f"{SEG_TOKENS}-token segments, keep only the FIRST occurrence of "
    "each distinct segment across the whole corpus (ordered by doc_id "
    "then position), and reassemble the surviving text per document. "
    "Near-identical documents therefore collapse to one full copy "
    "plus small diffs, and viral boilerplate blocks survive exactly "
    "once. All codegen built-ins: split/slice/posexplode, a "
    "row_number over segments keyed on the segment text, and a "
    "sorted-struct reassembly. At 100 TB the only shuffle partitions "
    "by segment text (bounded ~segment-length keys); no UDFs.",
)
def text_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return segment_dedup(load(spark, "documents", sf_dir))


def segment_dedup(docs: DataFrame, seg_tokens: int = SEG_TOKENS) -> DataFrame:
    """(doc_id, n_segs, n_kept, text_clean) over any (doc_id, text)
    frame — the reusable kernel text_segment_dedup wraps: corpus-wide
    keep-first dedup of fixed ``seg_tokens``-token segments."""
    from pyspark.sql import Window

    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    nseg = F.ceil(F.size("t") / F.lit(seg_tokens)).cast("int")
    segs = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nseg - 1),
                lambda i: F.array_join(F.slice("t", i * seg_tokens + 1, seg_tokens), " "),
            )
        ).alias("seg_idx", "seg"),
    )
    w = Window.partitionBy("seg").orderBy("doc_id", "seg_idx")
    kept = (
        segs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                    lambda s: s.seg,
                ),
                " ",
            ).alias("text_clean"),
        )
    )
    tot = segs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_segs"))
    return tot.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_segs",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
    )


# Per-source keep thresholds for the deterministic mixture resample:
# compare a 2-hex-char md5 prefix of the doc key against the bound
# ('g0' sorts above every hex digit => keep all; '80' = 128/256 = 50%;
# '1a' = 26/256 ~ 10%). The salt decorrelates from split_train_holdout.
MIX_SALT = ":mix"
MIX_WEIGHTS = tuple(
    (f"src{i}", "g0" if i < 5 else ("80" if i < 10 else "1a")) for i in range(20)
)


@register(
    "sample_mixture_sources",
    oracle=f"""
    WITH w(source, thr) AS (
      VALUES {", ".join(f"('{s}', '{t}')" for s, t in MIX_WEIGHTS)}
    )
    SELECT d.doc_id, d.source, d.lang
    FROM documents d JOIN w USING (source)
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || '{MIX_SALT}'), 1, 2) < w.thr
    """,
    doc="Deterministic domain-mixture resampling — the data-mixing "
    "step of a pretraining pipeline: each source domain keeps a "
    "target fraction of its documents (100% / 50% / 10% tiers here), "
    "selected by comparing an md5 prefix of the salted doc key "
    "against a per-source threshold. Same hash in every engine, so "
    "the subset is reproducible across reruns, engines, and "
    "partitionings, and adding documents never flips existing "
    "membership (split_train_holdout's pattern, per-domain weights). "
    "The weight table is a broadcast join against the fact scan — "
    "one pass, no shuffle at any scale.",
)
def sample_mixture_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    wdf = spark.createDataFrame(list(MIX_WEIGHTS), "source string, thr string")
    bucket = F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(MIX_SALT))), 1, 2)
    return (
        d.join(F.broadcast(wdf), "source")
        .filter(bucket < F.col("thr"))
        .select("doc_id", "source", "lang")
    )


STRATUM_SAMPLE_K = 10
STRATUM_SALT = ":strat"


@register(
    "sample_fixed_per_stratum",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '{STRATUM_SALT}'), doc_id
             ) AS rk
      FROM documents
    )
    WHERE rk <= {STRATUM_SAMPLE_K}
    """,
    doc="Engine-stable fixed-size sample per stratum (eval-set "
    f"construction): exactly {STRATUM_SAMPLE_K} documents per "
    "language, chosen by ranking on a salted md5 of the doc key — a "
    "deterministic uniform draw that every engine, rerun, and "
    "partitioning reproduces bit-for-bit (sample_stratified's "
    "Bernoulli twin is engine-RNG-specific and size-approximate; "
    "this is the exact-k, cross-engine shape). The rank plans as a "
    "map-side WindowGroupLimit: each task keeps its local top-k per "
    "stratum before the exchange, so the shuffle carries "
    "O(strata x k x tasks) rows, not the corpus.",
)
def sample_fixed_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, "documents", sf_dir)
    rk_key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(STRATUM_SALT)))
    w = Window.partitionBy("lang").orderBy(rk_key, "doc_id")
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= STRATUM_SAMPLE_K)
        .select("doc_id", "lang", "source")
    )


@register(
    "text_bigram_lm_score",
    oracle="""
    WITH bg AS (
      SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
                             for i in range(1, len(w))]) AS gram
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ), model AS (
      SELECT gram, count(*) AS c2 FROM bg GROUP BY gram
    ), uni AS (
      SELECT string_split(gram, ' ')[1] AS w1, count(*) AS c1
      FROM bg GROUP BY 1
    ), v AS (
      SELECT count(DISTINCT tok) AS v
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    ), terms AS (
      SELECT bg.doc_id,
             CAST(round(ln(CAST(uni.c1 + v.v AS DOUBLE) / (model.c2 + 1)), 6)
                  AS DECIMAL(28,6)) AS t
      FROM bg
      JOIN model USING (gram)
      JOIN uni ON uni.w1 = string_split(bg.gram, ' ')[1]
      CROSS JOIN v
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(CAST(sum(t) AS DOUBLE) / count(*), 4) AS nll
    FROM terms GROUP BY doc_id
    """,
    doc="Perplexity-style LM quality score computed entirely "
    "in-engine (the KenLM-filter analog): train an add-one-smoothed "
    "bigram model on the corpus itself, then score each document by "
    "its mean negative log-likelihood nll = mean(-ln p(w2|w1)) with "
    "p = (C(w1,w2)+1)/(C(w1)+V). High nll = improbable token "
    "sequences (gibberish / shuffled text); low = formulaic. All "
    "counts are exact integers; the per-bigram -ln p term is one "
    "division + one ln, rounded to 6 and summed as exact DECIMAL so "
    "the aggregate is combine-order independent (the "
    "text_unigram_entropy bridging). Scale: the bigram table feeds "
    "model counts, context counts, and the scoring join — three "
    "map-side-combined aggregates/equi-joins on gram/context keys; "
    "V is the sanctioned one-row scalar broadcast (tfidf's shape).",
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.stage import eager_release

    d = load(spark, "documents", sf_dir)
    # bigram occurrences feed THREE plan branches (model counts,
    # context counts, the scoring join) — cache once, release at end
    bg = _token_ngrams(d, 2).persist()
    model = bg.groupBy("gram").agg(F.count(F.lit(1)).alias("c2"))
    uni = (
        bg.select(F.substring_index("gram", " ", 1).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = d.select(F.explode(tokens("text")).alias("tok")).agg(
        F.count_distinct("tok").alias("v")
    )
    term = F.round(
        F.log((F.col("c1") + F.col("v")).cast("double") / (F.col("c2") + 1)), 6
    ).cast("decimal(28,6)")
    terms = (
        bg.withColumn("w1", F.substring_index("gram", " ", 1))
        .join(model, "gram")
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", term.alias("t"))
    )
    out = terms.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(F.sum("t").cast("double") / F.count(F.lit(1)), 4).alias("nll"),
    )
    return eager_release(out, "bigram_lm_score", bg)


TOPK_PER_SOURCE = 5


@register(
    "sample_topk_quality_per_source",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(least(len(string_split(text, ' ')), 100) AS DOUBLE) / 100.0
             * (CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                                               t -> t IN {_SW_SQL})) AS DOUBLE)
                          / len(string_split(text, ' ')) > 0.05
                     THEN 1.0 ELSE 0.5 END) AS q
      FROM documents
    )
    SELECT doc_id, source, round(q, 6) AS q, rk
    FROM (
      SELECT doc_id, source, q,
             row_number() OVER (PARTITION BY source
                                ORDER BY q DESC, doc_id) AS rk
      FROM scored
    ) WHERE rk <= {TOPK_PER_SOURCE}
    """,
    doc=f"Best-k-per-domain curation: the top {TOPK_PER_SOURCE} "
    "documents of every source by the deterministic quality heuristic "
    "(ties to lowest doc_id) — the 'keep the best of each domain' "
    "selection step of a pretraining mix, as one windowed rank. The "
    "plan is the map-side WindowGroupLimit shape (each task keeps k "
    "rows per group before the exchange), so at 100 TB the shuffle "
    "carries at most k x n_sources x n_tasks rows, not the corpus.",
)
def sample_topk_quality_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, "documents", sf_dir)
    q = quality_score("text")
    w = Window.partitionBy("source").orderBy(F.col("q").desc(), "doc_id")
    return (
        d.select("doc_id", "source", q.alias("q"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOPK_PER_SOURCE)
        .select("doc_id", "source", F.round("q", 6).alias("q"), "rk")
    )


K_FOLDS = 5
KFOLD_SALT = ":kfold"


@register(
    "split_kfold",
    oracle=f"""
    SELECT doc_id, lang,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{KFOLD_SALT}'), 1, 8))::BIGINT
             % {K_FOLDS} AS fold
    FROM documents
    """,
    doc=f"Deterministic {K_FOLDS}-fold assignment (cross-validation / "
    "shard routing): fold = md5-window hash of the salted doc key mod "
    "k — the same shared hash kernel as Bloom/CMS "
    "(functions/hashing.py), so every engine, rerun, and partitioning "
    "reproduces the folds bit-for-bit, and adding documents never "
    "moves existing ones between folds (split_train_holdout's "
    "stability property, k-way). Pure scan expression: zero shuffle "
    "at any scale.",
)
def split_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_window_positions

    d = load(spark, "documents", sf_dir)
    key = F.concat(F.col("doc_id").cast("string"), F.lit(KFOLD_SALT))
    return d.select(
        "doc_id", "lang", md5_window_positions(key, 1, K_FOLDS)[0].alias("fold")
    )


TEMP_ALPHA = 0.5  # w_i ∝ p_i^alpha — the multilingual-LM rebalancing
# exponent (alpha=1 keeps the natural mix, alpha->0 approaches
# uniform; T=2 i.e. alpha=1/2 is a common operating point). alpha is
# pinned to 1/2 so the kernel is sqrt — IEEE-754 requires sqrt to be
# CORRECTLY ROUNDED, so Spark (JVM) and DuckDB (libm) agree
# bit-for-bit, unlike pow() which rule 4 of the determinism
# discipline (SCALE.md) bans from checked queries. The remaining
# cross-engine risk is only the 20-term normalizer sum's fold order,
# absorbed by the final round(..., 6).


@register(
    "sample_temperature",
    oracle=f"""
    WITH s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS total FROM s),
    e AS (
      SELECT source, n_docs,
             CAST(n_docs AS DOUBLE) / total AS p,
             sqrt(CAST(n_docs AS DOUBLE) / total) AS pw
      FROM s, tot
    ),
    z AS (SELECT CAST(sum(pw) AS DOUBLE) AS zsum FROM e)
    SELECT source, n_docs,
           round(p, 6) AS p_raw,
           round(pw / zsum, 6) AS w_temp,
           round((pw / zsum) / p, 6) AS boost
    FROM e, z
    """,
    doc="Temperature-scaled source mixing weights — the standard "
    "rebalancing step of a multi-source/multilingual pretraining mix: "
    "each source's sampling weight is its corpus share raised to "
    f"alpha={TEMP_ALPHA} (sqrt: correctly rounded in IEEE, engine-"
    "agnostic) and renormalized, so rare sources are "
    "upsampled (boost > 1) and dominant ones damped. The output "
    "weight table is what sample_weighted / sample_mixture_sources "
    "consume as keep-thresholds. Cost shape: one map-side-combined "
    "count per source plus two one-row scalar broadcasts (total and "
    "normalizer) — the sanctioned tf-idf pattern; nothing scales "
    "with corpus size after the first count.",
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    s = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = s.agg(F.sum("n_docs").cast("double").alias("total"))
    e = (
        s.crossJoin(F.broadcast(tot))
        .withColumn("p", F.col("n_docs").cast("double") / F.col("total"))
        .withColumn("pw", F.sqrt(F.col("p")))  # alpha = 1/2, see TEMP_ALPHA
    )
    z = e.agg(F.sum("pw").cast("double").alias("zsum"))
    return e.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        F.round("p", 6).alias("p_raw"),
        F.round(F.col("pw") / F.col("zsum"), 6).alias("w_temp"),
        F.round((F.col("pw") / F.col("zsum")) / F.col("p"), 6).alias("boost"),
    )


VOCAB_TOP_K = 500


@register(
    "text_vocab_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ), vocab AS (
      SELECT t FROM (
        SELECT t, row_number() OVER (ORDER BY count(*) DESC, t) AS rk
        FROM tok GROUP BY t
      ) WHERE rk <= {VOCAB_TOP_K}
    ), per AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN t IN (SELECT t FROM vocab) THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_in_vocab
      FROM tok GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_in_vocab,
           round(CAST(n_in_vocab AS DOUBLE) / n_tokens, 6) AS coverage
    FROM per
    """,
    doc=f"Vocabulary coverage / OOV rate per document against the "
    f"corpus top-{VOCAB_TOP_K} token vocabulary — the tokenizer-fit "
    "diagnostic a pretraining pipeline runs before committing to a "
    "vocab. The vocabulary build is one map-side-combined token "
    "count collapsed by a TakeOrderedAndProject heap (never a global "
    "sort; the (count DESC, token) tiebreak makes the boundary "
    "deterministic), then the tiny vocab BROADCASTS back onto the "
    "exploded-token scan and coverage folds per doc in one "
    "aggregate. Nothing but the token explode touches corpus scale.",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    tok = d.select("doc_id", F.explode(tokens("text")).alias("t"))
    vocab = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "t")
        .limit(VOCAB_TOP_K)
        .select("t", F.lit(1).alias("in_vocab"))
    )
    per = (
        tok.join(F.broadcast(vocab), "t", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("in_vocab"), F.lit(0))).cast("bigint").alias("n_in_vocab"),
        )
    )
    return per.select(
        "doc_id",
        "n_tokens",
        "n_in_vocab",
        F.round(F.col("n_in_vocab").cast("double") / F.col("n_tokens"), 6).alias("coverage"),
    )


@register(
    "split_temporal_embargo",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN ts < TIMESTAMP '2024-01-22 00:00:00' THEN 'train'
                WHEN ts < TIMESTAMP '2024-01-24 00:00:00' THEN 'embargo'
                ELSE 'test' END AS split
    FROM events
    """,
    doc="Temporal train/test split with an embargo gap — the "
    "leakage-free split for time-ordered data (market bars, user "
    "events, crawl snapshots): everything before the cut trains, a "
    "fixed embargo window after the cut is EXCLUDED from both sides "
    "(rows whose features/labels straddle the boundary would leak "
    "future information into training), and the rest tests. "
    "Complements split_leakage_free (group-disjoint) and split_kfold "
    "(hash-mod-k): those protect against entity leakage, this "
    "against look-ahead. One scan, zero shuffle, a codegen CASE — "
    "embarrassingly parallel at any scale; the timestamp literals "
    "compare identically on both engines under the UTC session pin.",
)
def split_temporal_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    cut = F.lit("2024-01-22 00:00:00").cast("timestamp")
    test_from = F.lit("2024-01-24 00:00:00").cast("timestamp")
    return e.select(
        "event_id",
        "user_id",
        F.when(F.col("ts") < cut, "train")
        .when(F.col("ts") < test_from, "embargo")
        .otherwise("test")
        .alias("split"),
    )


# Token-budget mixture planning: Zipf-ish target weights derived from
# the source index (integer floor-div, exact on every engine) and a
# budget fixed at 60% of the corpus's total tokens. All planning
# arithmetic stays in bigints; each output ratio is ONE final IEEE
# division of exact integers, so the plan is bit-stable across
# engines and partitionings.
MIXPLAN_BUDGET_NUM, MIXPLAN_BUDGET_DEN = 6, 10


@register(
    "mixture_token_budget",
    oracle=f"""
    WITH s AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail,
             CAST(10000 // (CAST(substr(source, 4) AS BIGINT) + 1) AS BIGINT) AS raw
      FROM documents GROUP BY source
    ), t AS (
      SELECT CAST(sum(avail) AS BIGINT) AS tot_avail,
             CAST(sum(raw) AS BIGINT) AS sum_raw
      FROM s
    ), p AS (
      SELECT source, avail, raw, sum_raw,
             CAST(((({MIXPLAN_BUDGET_NUM} * tot_avail) // {MIXPLAN_BUDGET_DEN})
                   * raw) // sum_raw AS BIGINT) AS desired
      FROM s, t
    )
    SELECT source,
           avail AS avail_tokens,
           round(CAST(raw AS DOUBLE) / sum_raw, 6) AS weight,
           desired AS desired_tokens,
           round(least(1.0, CAST(desired AS DOUBLE) / avail), 6) AS sample_rate,
           round(CAST(desired AS DOUBLE) / avail, 6) AS epochs,
           desired > avail AS needs_upsampling
    FROM p
    """,
    doc="Data-mixing feasibility planner: given per-source target "
    "weights (Zipf-ish over the source index here; any weight table "
    "slots in) and a total token budget (60% of the corpus), compute "
    "each source's available tokens, its token allocation, the "
    "sampling rate that realizes it, and the epoch multiplier where "
    "the allocation exceeds availability (the upsampling signal a "
    "mixture trainer needs). This is the planning step that FEEDS "
    "sample_mixture_sources / sample_epochs_materialize their "
    "per-source rates. Cost shape: one map-side-combined sum per "
    "source (tiny group count), a one-row scalar reduce, one "
    "broadcast back — a single corpus scan regardless of scale. "
    "Integer floor-division end to end; each ratio is one IEEE "
    "division of exact bigints.",
)
def mixture_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    s = (
        d.groupBy("source")
        .agg(F.sum(F.size(tokens("text"))).cast("bigint").alias("avail"))
        .withColumn(
            "raw",
            F.expr("10000 div (CAST(substring(source, 4) AS BIGINT) + 1)"),
        )
    )
    t = s.agg(
        F.sum("avail").cast("bigint").alias("tot_avail"),
        F.sum("raw").cast("bigint").alias("sum_raw"),
    )
    p = s.crossJoin(F.broadcast(t)).withColumn(
        "desired",
        F.expr(
            f"((({MIXPLAN_BUDGET_NUM} * tot_avail) div {MIXPLAN_BUDGET_DEN})"
            " * raw) div sum_raw"
        ),
    )
    ratio = F.col("desired").cast("double") / F.col("avail")
    return p.select(
        "source",
        F.col("avail").alias("avail_tokens"),
        F.round(F.col("raw").cast("double") / F.col("sum_raw"), 6).alias("weight"),
        F.col("desired").alias("desired_tokens"),
        F.round(F.least(F.lit(1.0), ratio), 6).alias("sample_rate"),
        F.round(ratio, 6).alias("epochs"),
        (F.col("desired") > F.col("avail")).alias("needs_upsampling"),
    )


# Inverted-index build: tokens with document frequency below this are
# dropped (long-tail typo hapaxes), and only the first CAP postings
# materialize per token (the "head shard"); df/cf stay exact over the
# full corpus regardless of the cap.
IDX_MIN_DF, IDX_POSTINGS_CAP = 10, 8


@register(
    "text_inverted_index",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ), p AS (
      SELECT token, doc_id, count(*) AS tf
      FROM tok GROUP BY token, doc_id
    ), h AS (
      SELECT token,
             array_to_string(list_sort(list(doc_id)), ',') AS postings_head
      FROM (SELECT token, doc_id,
                   row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
            FROM p)
      WHERE rn <= {IDX_POSTINGS_CAP}
      GROUP BY token
    ), s AS (
      SELECT token, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(tf) AS BIGINT) AS cf
      FROM p GROUP BY token
    )
    SELECT s.token, df, cf, postings_head
    FROM s JOIN h ON s.token = h.token
    WHERE df >= {IDX_MIN_DF}
    """,
    doc="Inverted-index build: token -> (document frequency, "
    "collection frequency, head of the sorted posting list). The "
    "scale hazard is posting-list skew — a stopword's postings are "
    "O(corpus) — so the list head is computed with a rank-limit "
    "window (row_number <= K after a (token, doc_id) pre-aggregate), "
    "which Spark executes as WindowGroupLimit: each task keeps at "
    "most K rows of state per token and drops the rest at scan "
    "speed, never buffering a full posting list. df/cf come from the "
    "same pre-aggregate (map-side combined), so they are exact while "
    "the materialized payload stays bounded. A full-fidelity index "
    "at 100 TB shards postings by (token, doc_id range) with this "
    "identical plan per shard.",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, "documents", sf_dir)
    tok = d.select("doc_id", F.explode(tokens("text")).alias("token"))
    pairs = tok.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    w = Window.partitionBy("token").orderBy("doc_id")
    head = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IDX_POSTINGS_CAP)
        .groupBy("token")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings_head")
        )
    )
    stats = pairs.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("cf"),
    )
    return (
        stats.join(head, "token")
        .filter(F.col("df") >= IDX_MIN_DF)
        .select("token", "df", "cf", "postings_head")
    )


# Collocation mining: bigrams scored by pointwise mutual information.
PMI_MIN_SUPPORT = 5
PMI_TOP = 50


@register(
    "text_pmi_collocations",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    uni AS (SELECT unnest(t) AS tok FROM tok),
    ucnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_tok FROM uni GROUP BY tok),
    nu AS (SELECT CAST(count(*) AS BIGINT) AS n_uni FROM uni),
    bi AS (
      SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                    i -> {{'w1': t[i], 'w2': t[i+1]}}), recursive := true)
      FROM tok
    ),
    bcnt AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_ab
             FROM bi GROUP BY 1, 2 HAVING count(*) >= {PMI_MIN_SUPPORT}),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bi FROM bi)
    SELECT w1, w2, n_ab, ua.n_tok AS n_a, ub.n_tok AS n_b,
           round(ln((CAST(n_ab AS DOUBLE) / n_bi)
                 / ((CAST(ua.n_tok AS DOUBLE) / n_uni)
                    * (CAST(ub.n_tok AS DOUBLE) / n_uni))), 6) AS pmi
    FROM bcnt, nb, nu
    JOIN ucnt ua ON ua.tok = w1
    JOIN ucnt ub ON ub.tok = w2
    ORDER BY pmi DESC, w1, w2 LIMIT {PMI_TOP}
    """,
    doc="Collocation extraction by pointwise mutual information: the "
    f"top {PMI_TOP} word bigrams (support >= {PMI_MIN_SUPPORT}) whose "
    "co-occurrence most exceeds the independence expectation — the "
    "classic phrase-mining / tokenizer-merge-candidate primitive "
    "(Mikolov-style phrase detection is this with a discount). "
    "Counts are exact bigints from two map-side-combined aggregates "
    "(unigrams and adjacent pairs, both one shuffle on the token "
    "key); corpus totals are 1-row aggregates crossed in by "
    "broadcast, and the PMI log runs on an expression tree written "
    "identically in both engines (exact int-to-double casts, two "
    "divisions, one ln, round 6). The final top-K is a total order "
    "(pmi DESC, then both words) over the vocabulary-sized pair "
    "table — at 100 TB the wire after the token shuffles carries "
    "only DISTINCT unigrams/bigrams, never the corpus.",
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..plans.stage import eager_release

    d = load(spark, "documents", sf_dir)
    # persisted: the token stream feeds unigram counts, the unigram
    # total, and the bigram builder (3 consumers)
    t = d.select("doc_id", F.posexplode(tokens("text")).alias("pos", "tok")).persist()
    ucnt = t.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("n_tok"))
    nu = t.agg(F.count(F.lit(1)).cast("bigint").alias("n_uni"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = (
        t.select(F.col("tok").alias("w1"), F.lead("tok", 1).over(w).alias("w2"))
        .filter(F.col("w2").isNotNull())
        .persist()
    )
    bcnt = (
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= PMI_MIN_SUPPORT)
    )
    nb = bi.agg(F.count(F.lit(1)).cast("bigint").alias("n_bi"))
    ua = ucnt.select(F.col("tok").alias("w1"), F.col("n_tok").alias("n_a"))
    ub = ucnt.select(F.col("tok").alias("w2"), F.col("n_tok").alias("n_b"))
    pmi = F.round(
        F.log(
            (F.col("n_ab").cast("double") / F.col("n_bi"))
            / (
                (F.col("n_a").cast("double") / F.col("n_uni"))
                * (F.col("n_b").cast("double") / F.col("n_uni"))
            )
        ),
        6,
    )
    out = (
        bcnt.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nu))
        .join(F.broadcast(ua), "w1")
        .join(F.broadcast(ub), "w2")
        .select("w1", "w2", "n_ab", "n_a", "n_b", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(PMI_TOP)
    )
    return eager_release(out, "pmi_collocations", t, bi)


# One counting round of BPE tokenizer training: adjacent character
# pairs weighted by word frequency, over the DISTINCT word vocabulary.
BPE_TOP = 30
BPE_MIN_WORD_LEN = 2


@register(
    "text_bpe_merge_candidates",
    oracle=f"""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    wf AS (
      SELECT word, CAST(count(*) AS BIGINT) AS freq
      FROM w WHERE len(word) >= {BPE_MIN_WORD_LEN} GROUP BY word
    ),
    pairs AS (
      SELECT word, freq,
             unnest(list_transform(generate_series(1, len(word) - 1),
                    i -> word[i] || word[i+1])) AS pair
      FROM wf
    )
    SELECT pair, CAST(sum(freq) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_types
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT {BPE_TOP}
    """,
    doc="The counting round at the heart of BPE tokenizer training: "
    "adjacent character-pair frequencies over the corpus, aggregated "
    f"as sum(word_freq) per pair — the top pair is the next merge a "
    "BPE trainer would perform (full training iterates this; the "
    "count round is the distributed-heavy step, the merge itself is "
    "a dictionary rewrite). The key scale move: pairs are generated "
    "from the DISTINCT-WORD VOCABULARY weighted by word frequency, "
    "never from the raw token stream — the corpus pays one word-count "
    "aggregate (map-side combined), and the character-level explode "
    "touches only the vocabulary, which grows sublinearly (Heaps' "
    "law) while the corpus grows to 100 TB. Exact bigint counts, "
    "total-order top-K; n_types = pair-position slots across the "
    "vocabulary (a word containing the pair twice contributes two).",
)
def text_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    w = d.select(F.explode(tokens("text")).alias("word"))
    wf = (
        w.filter(F.length("word") >= BPE_MIN_WORD_LEN)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    pairs = wf.select(
        "freq",
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("freq").cast("bigint").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
        )
        .orderBy(F.col("n").desc(), "pair")
        .limit(BPE_TOP)
    )


# BM25 (Okapi, Lucene idf form) scoring parameters and the fixed
# keyword set the gate scores (chosen from the corpus vocabulary).
BM25_K1, BM25_B = 1.2, 0.75
BM25_TERMS = ("sort", "merge", "filter")
BM25_TOP = 20


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dlen FROM d),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(dlen) AS BIGINT) AS total_len FROM dl),
    terms(term) AS (VALUES {", ".join(f"('{t}')" for t in BM25_TERMS)}),
    tf AS (
      SELECT d.doc_id, terms.term,
             CAST(len(list_filter(d.t, x -> x = terms.term)) AS BIGINT) AS tf
      FROM d, terms
    ),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf WHERE tf > 0 GROUP BY term),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dl.dlen, df.df,
             round(
               ln((CAST(s.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * (tf.tf * {BM25_K1 + 1})
               / (tf.tf + {BM25_K1} * ({1 - BM25_B} + {BM25_B} * dl.dlen
                  / (CAST(s.total_len AS DOUBLE) / s.n_docs))), 6) AS bm25
      FROM tf JOIN dl USING (doc_id) JOIN df USING (term), stats s
      WHERE tf.tf > 0
    )
    SELECT doc_id, term, tf, dlen, df, bm25, rk AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY term ORDER BY bm25 DESC, doc_id) AS rk
      FROM scored
    ) WHERE rk <= {BM25_TOP}
    """,
    doc="Okapi BM25 retrieval scoring (Lucene idf form, k1="
    f"{BM25_K1}, b={BM25_B}): top {BM25_TOP} documents per query "
    "term, with term frequency saturation and document-length "
    "normalization — the ranking function behind every keyword "
    "search engine, and the lexical half of hybrid (BM25 + "
    "embedding) retrieval beside the sim_* family. tf/df/dlen are "
    "exact bigints (tf via a codegen higher-order filter over the "
    "token array — no explode, no shuffle for the tf pass); avgdl "
    "and idf enter one identical expression tree in both engines. "
    "The per-term top-K window runs on rows with tf > 0 only — "
    "posting-list sized, not corpus-sized. At 100 TB the term list "
    "broadcasts, tf computes at scan speed, and only postings reach "
    "the ranking exchange; df and corpus stats are 1-row/tiny "
    "broadcasts.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..plans.stage import eager_release

    d = load(spark, "documents", sf_dir)
    toks = d.select("doc_id", tokens("text").alias("t"))
    terms = F.array(*[F.lit(t) for t in BM25_TERMS])
    # one pass: doc length + per-term tf via codegen HOF filters,
    # exploded only after tf is known so zero-tf pairs can be dropped
    # before any exchange. Persisted: feeds stats, df, and scoring.
    tfd = (
        toks.select(
            "doc_id",
            F.size("t").cast("bigint").alias("dlen"),
            F.explode(
                F.transform(
                    terms,
                    lambda term: F.struct(
                        term.alias("term"),
                        F.size(F.filter(F.col("t"), lambda x: x == term))
                        .cast("bigint")
                        .alias("tf"),
                    ),
                )
            ).alias("s"),
        )
        .select("doc_id", "dlen", F.col("s.term").alias("term"), F.col("s.tf").alias("tf"))
        .persist()
    )
    stats = (
        tfd.filter(F.col("term") == BM25_TERMS[0])
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("dlen").cast("bigint").alias("total_len"),
        )
    )
    postings = tfd.filter(F.col("tf") > 0)
    df = postings.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    score = F.round(
        idf
        * (F.col("tf") * F.lit(BM25_K1 + 1))
        / (F.col("tf") + F.lit(BM25_K1) * (F.lit(1 - BM25_B) + F.lit(BM25_B) * F.col("dlen") / avgdl)),
        6,
    )
    w = Window.partitionBy("term").orderBy(F.col("bm25").desc(), "doc_id")
    out = (
        postings.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("bm25", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOP)
        .select("doc_id", "term", "tf", "dlen", "df", "bm25", "rank")
    )
    return eager_release(out, "bm25_topk", tfd)


@register(
    "text_lang_confusion",
    oracle=f"""
    WITH pred AS (
      SELECT lang AS labeled_lang,
             CASE WHEN len(list_filter(string_split(text, ' '), t -> t IN {_SW_SQL}))
                       * 1.0 / len(string_split(text, ' ')) > 0.08
                  THEN 'en' ELSE 'other' END AS lid_guess
      FROM documents
    ),
    m AS (
      SELECT labeled_lang, lid_guess, CAST(count(*) AS BIGINT) AS n
      FROM pred GROUP BY labeled_lang, lid_guess
    ),
    tot AS (
      SELECT labeled_lang, CAST(sum(n) AS BIGINT) AS n_label FROM m GROUP BY labeled_lang
    )
    SELECT m.labeled_lang, m.lid_guess, m.n, tot.n_label,
           round(CAST(m.n AS DOUBLE) / tot.n_label, 6) AS row_frac
    FROM m JOIN tot USING (labeled_lang)
    """,
    doc="Classifier-evaluation confusion matrix for the lang-ID "
    "heuristic against the labeled lang column: per (label, guess) "
    "cell counts and within-label fractions — the eval loop every "
    "curation classifier needs (text_lang_id ships predictions; this "
    "measures them; quality_classifier_score's loss curve is the "
    "trained-model analogue). Two map-side-combined aggregates; the "
    "matrix is (labels x guesses)-sized, so the fraction join is a "
    "broadcast over a handful of rows. On this synthetic corpus the "
    "matrix mostly exposes the base rates (every label is "
    "English-like); the operator's value is the deterministic "
    "evaluation mechanics.",
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    density = stopword_hits("text") * F.lit(1.0) / n_tokens("text")
    pred = d.select(
        F.col("lang").alias("labeled_lang"),
        F.when(density > 0.08, "en").otherwise("other").alias("lid_guess"),
    )
    m = pred.groupBy("labeled_lang", "lid_guess").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = m.groupBy("labeled_lang").agg(F.sum("n").cast("bigint").alias("n_label"))
    return m.join(F.broadcast(tot), "labeled_lang").select(
        "labeled_lang",
        "lid_guess",
        "n",
        "n_label",
        F.round(F.col("n").cast("double") / F.col("n_label"), 6).alias("row_frac"),
    )


# Hashing-trick featurizer: token -> bucket via the shared md5 kernel.
HASHTRICK_BUCKETS = 64


@register(
    "text_hashing_trick_features",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    b AS (
      SELECT doc_id,
             CAST(CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT)
                  % {HASHTRICK_BUCKETS} AS BIGINT) AS bucket
      FROM tok
    )
    SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS tf
    FROM b GROUP BY doc_id, bucket
    """,
    doc="Feature hashing (the hashing trick): bag-of-words folded "
    f"into {HASHTRICK_BUCKETS} buckets via the shared md5 window "
    "kernel, emitted as sparse (doc_id, bucket, tf) triples — the "
    "vocabulary-free featurizer that feeds linear quality models "
    "(quality_classifier_score trains on engineered features; this "
    "is how raw text becomes fixed-width features with NO vocabulary "
    "build, no second pass, no dictionary broadcast). Stateless "
    "per-row hashing plus one map-side-combined count keyed on "
    "(doc_id, bucket): at 100 TB there is exactly one shuffle whose "
    "width is bounded by docs x buckets, and no global state of any "
    "kind — the property that makes the hashing trick THE featurizer "
    "for streaming corpora.",
)
def text_hashing_trick_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    t = d.select("doc_id", F.explode(tokens("text")).alias("tok"))
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
        % HASHTRICK_BUCKETS
    ).cast("bigint")
    return (
        t.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )


@register(
    "decontaminate_longest_span",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ),
    g AS (
      SELECT doc_id, source, u.i AS pos,
             array_to_string(t[u.i:u.i+{DECONTAM_NGRAM - 1}], ' ') AS gram
      FROM tok, UNNEST(generate_series(1, len(t) - {DECONTAM_NGRAM - 1})) AS u(i)
    ),
    eval_grams AS (SELECT DISTINCT gram FROM g WHERE source = '{DECONTAM_EVAL_SOURCE}'),
    hits AS (
      SELECT DISTINCT c.doc_id, c.pos
      FROM g c JOIN eval_grams e USING (gram)
      WHERE c.source <> '{DECONTAM_EVAL_SOURCE}'
    ),
    isl AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM hits
    ),
    runs AS (
      SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS run_len
      FROM isl GROUP BY doc_id, grp
    )
    SELECT doc_id,
           CAST(sum(run_len) AS BIGINT) AS n_hit_positions,
           CAST(max(run_len) AS BIGINT) AS longest_run,
           CAST(max(run_len) + {DECONTAM_NGRAM - 1} AS BIGINT) AS longest_span_tokens
    FROM runs GROUP BY doc_id
    """,
    doc="Contamination SPAN measurement: for each corpus document "
    "sharing n-grams with the eval shard, the longest CONSECUTIVE "
    "run of matched gram positions (gaps-and-islands over hit "
    "positions: pos - row_number is constant within a run) and its "
    "token length — the signal that separates a verbatim copied "
    "passage from scattered coincidental n-grams, which a binary "
    "overlap count (decontaminate_ngram_overlap) cannot distinguish; "
    "published pipelines threshold on exactly this span length. "
    "Scale shape identical to the overlap twin: only the tiny eval "
    "shard's gram set broadcasts, the corpus-side gram stream is "
    "semi-joined at scan speed, and the island window runs on HIT "
    "positions only — contamination-sized, not corpus-sized.",
)
def decontaminate_longest_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, "documents", sf_dir)
    t = d.select("doc_id", "source", F.posexplode(tokens("text")).alias("pos0", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos0")
    leads = [F.lead("tok", k).over(w) for k in range(1, DECONTAM_NGRAM)]
    g = (
        t.select(
            "doc_id",
            "source",
            (F.col("pos0") + 1).alias("pos"),  # 1-based like the oracle
            F.concat_ws(" ", F.col("tok"), *leads).alias("gram"),
            leads[-1].alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .drop("_last")
    )
    eval_grams = (
        g.filter(F.col("source") == DECONTAM_EVAL_SOURCE).select("gram").distinct()
    )
    hits = (
        g.filter(F.col("source") != DECONTAM_EVAL_SOURCE)
        .join(F.broadcast(eval_grams), "gram", "left_semi")
        .select("doc_id", "pos")
        .distinct()
    )
    wi = Window.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn("grp", F.col("pos") - F.row_number().over(wi))
    runs = isl.groupBy("doc_id", "grp").agg(F.count(F.lit(1)).cast("bigint").alias("run_len"))
    return runs.groupBy("doc_id").agg(
        F.sum("run_len").cast("bigint").alias("n_hit_positions"),
        F.max("run_len").cast("bigint").alias("longest_run"),
        (F.max("run_len") + (DECONTAM_NGRAM - 1)).cast("bigint").alias("longest_span_tokens"),
    )


# Keyword-in-context window: tokens of context on each side.
KWIC_TERM = "merge"
KWIC_CTX = 3


@register(
    "text_kwic",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    hits AS (
      SELECT doc_id, t, u.i AS pos
      FROM tok, UNNEST(generate_series(1, len(t))) AS u(i)
      WHERE t[u.i] = '{KWIC_TERM}'
    )
    SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           coalesce(array_to_string(t[greatest(pos - {KWIC_CTX}, 1):pos - 1], ' '),
                    '') AS left_ctx,
           coalesce(array_to_string(t[pos + 1:least(pos + {KWIC_CTX}, len(t))], ' '),
                    '') AS right_ctx,
           array_to_string(
             t[greatest(pos - {KWIC_CTX}, 1):least(pos + {KWIC_CTX}, len(t))], ' ')
             AS snippet
    FROM hits
    """,
    doc="Keyword-in-context extraction: every occurrence of the query "
    f"term with {KWIC_CTX} tokens of context on each side — the "
    "snippet/concordance primitive a search result page (or a "
    "corpus-linguistics audit of how a term is used) renders after "
    "text_bm25_topk ranks the documents. Pure codegen: one "
    "posexplode finds occurrence positions, context windows are "
    "dynamic array slices (greatest/least clamp at the document "
    "edges — boundary occurrences emit short or empty contexts "
    "identically on both engines), no shuffle at all until the "
    "driver collects. At 100 TB this runs as a scan-speed map over "
    "the BM25 candidates only, never the corpus.",
)
def text_kwic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    t = d.select("doc_id", tokens("text").alias("t"))
    hits = (
        t.select("doc_id", "t", F.posexplode("t").alias("p0", "tok"))
        .filter(F.col("tok") == KWIC_TERM)
        .select("doc_id", "t", (F.col("p0") + 1).alias("pos"))
    )
    n = F.size("t")
    l_start = F.greatest(F.col("pos") - KWIC_CTX, F.lit(1))
    r_end = F.least(F.col("pos") + KWIC_CTX, n)
    return hits.select(
        "doc_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.array_join(F.slice("t", l_start, F.col("pos") - l_start), " ").alias("left_ctx"),
        F.array_join(F.slice("t", F.col("pos") + 1, r_end - F.col("pos")), " ").alias(
            "right_ctx"
        ),
        F.array_join(F.slice("t", l_start, r_end - l_start + 1), " ").alias("snippet"),
    )


# Autocomplete index: prefixes up to this length, top completions per
# prefix by corpus frequency.
AUTOCOMPLETE_MAX_PREFIX = 4
AUTOCOMPLETE_TOP = 3


@register(
    "text_autocomplete_index",
    oracle=f"""
    WITH names AS (
      SELECT p_name, CAST(count(*) AS BIGINT) AS freq FROM part GROUP BY p_name
    ),
    pre AS (
      SELECT substr(p_name, 1, u.i) AS prefix, p_name, freq
      FROM names, UNNEST(generate_series(1, {AUTOCOMPLETE_MAX_PREFIX})) AS u(i)
      WHERE len(p_name) >= u.i
    )
    SELECT prefix, p_name AS completion, freq, rk AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY prefix
                                   ORDER BY freq DESC, p_name) AS rk
      FROM pre
    ) WHERE rk <= {AUTOCOMPLETE_TOP}
    """,
    doc="Search-as-you-type index build: for every name prefix up to "
    f"{AUTOCOMPLETE_MAX_PREFIX} chars, the top {AUTOCOMPLETE_TOP} "
    "completions by corpus frequency — the materialized table an "
    "autocomplete service point-reads per keystroke (the batch-built "
    "sibling of the inverted index, keyed by prefix instead of "
    "token). Scale shape: frequencies come from ONE map-side-combined "
    "aggregate over the corpus; the prefix explode (a bounded x"
    f"{AUTOCOMPLETE_MAX_PREFIX} fanout) runs on the DISTINCT-name "
    "vocabulary, Heaps-law sized like the BPE counter; the per-prefix "
    "ranking is a WindowGroupLimit on vocabulary-sized data with a "
    "(freq DESC, name) total order. Serve-time layout: write "
    "partitioned/bucketed by prefix and each keystroke is one "
    "pruned point read.",
)
def text_autocomplete_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    p = load(spark, "part", sf_dir)
    names = p.groupBy("p_name").agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    pre = (
        names.select(
            "p_name",
            "freq",
            F.explode(F.sequence(F.lit(1), F.lit(AUTOCOMPLETE_MAX_PREFIX))).alias("i"),
        )
        .filter(F.length("p_name") >= F.col("i"))
        .select(F.expr("substr(p_name, 1, i)").alias("prefix"), "p_name", "freq")
    )
    w = Window.partitionBy("prefix").orderBy(F.col("freq").desc(), "p_name")
    return (
        pre.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= AUTOCOMPLETE_TOP)
        .select("prefix", F.col("p_name").alias("completion"), "freq", "rank")
    )


@register(
    "sample_balanced_downsample",
    oracle="""
    WITH sz AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
    ),
    k AS (SELECT CAST(min(n) AS BIGINT) AS k_min FROM sz),
    rk AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT rk.doc_id, rk.lang, rk.rk
    FROM rk, k WHERE rk.rk <= k.k_min
    """,
    doc="Class-balanced downsampling: every language stratum is cut "
    "to the size of the SMALLEST one (undersampling, the classic fix "
    "for class imbalance before training a classifier — here the 'en' "
    "majority shrinks ~3x to match the rarest language). Which "
    "majority-class rows survive is decided by the shared md5 "
    "deterministic coin ranked per stratum (doc_id tiebreak), so the "
    "sample is reproducible, engine-stable, and uniformly 'random' "
    "with respect to any content property — the sampler family's "
    "convention (vs sample_fixed_per_stratum, which takes a FIXED k; "
    "here k is the data-dependent min, one 1-row broadcast). At "
    "100 TB: one count pass, one per-stratum rank window (majority "
    "strata sort only within their partition), scan-speed filter.",
)
def sample_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, "documents", sf_dir)
    sz = d.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    k = sz.agg(F.min("n").cast("bigint").alias("k_min"))
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    rk = d.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
    return rk.crossJoin(F.broadcast(k)).filter(F.col("rk") <= F.col("k_min")).select(
        "doc_id", "lang", "rk"
    )


@register(
    "text_lexical_diversity",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
           round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS ttr,
           round(CAST(len(list_distinct(toks)) AS DOUBLE)
                 / sqrt(CAST(len(toks) AS DOUBLE)), 6) AS root_ttr
    FROM t
    """,
    doc="Lexical diversity per document: type-token ratio and Guiraud "
    "root-TTR (types / sqrt(tokens), the length-corrected form — raw "
    "TTR collapses as documents grow, so comparing across lengths "
    "needs the root form) — the vocabulary-richness quality feature "
    "beside entropy (distribution) and repetition-ratio (local "
    "reuse); low-diversity documents are boilerplate/spam candidates "
    "before any model runs. Pure per-row array ops in codegen "
    "(distinct within the token array, no explode, no shuffle); "
    "exact integer counts into one division and one sqrt.",
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    toks = tokens("text")
    n_tok = F.size(toks).cast("bigint")
    n_typ = F.size(F.array_distinct(toks)).cast("bigint")
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_typ.alias("n_types"),
        F.round(n_typ.cast("double") / n_tok, 6).alias("ttr"),
        F.round(n_typ.cast("double") / F.sqrt(n_tok.cast("double")), 6).alias("root_ttr"),
    )


# RAKE keyword extraction: candidate phrases are maximal runs of
# non-stopword tokens (capped at RAKE_MAX_WORDS), scored by the sum of
# word degree/frequency over the phrase's words — the classic
# unsupervised keyword extractor (Rose et al. 2010), the corpus-prep
# step that surfaces what a crawl shard is "about" before topic
# routing. Determinism: deg and freq are exact integers; each word's
# deg/freq ratio is ONE division rounded to 9 decimals and the phrase
# score sums those as DECIMAL — exact and order-free, so no float
# fold order exists (the chi-square discipline).
RAKE_MAX_WORDS = 6
RAKE_TOP = 20


@register(
    "text_keyword_rake",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    t AS (
      SELECT doc_id,
             unnest([{{'pos': i, 'tok': toks[i]}}
                     for i in range(1, len(toks) + 1)],
                    recursive := true)
      FROM w
    ),
    g AS (
      SELECT doc_id, pos, tok,
             sum(CASE WHEN tok IN {_SW_SQL} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS grp,
             (tok IN {_SW_SQL}) AS is_stop
      FROM t
    ),
    ph AS (
      SELECT doc_id, grp,
             string_agg(tok, ' ' ORDER BY pos) AS phrase,
             CAST(count(*) AS BIGINT) AS n_words
      FROM g WHERE NOT is_stop
      GROUP BY doc_id, grp
      HAVING count(*) <= {RAKE_MAX_WORDS}
    ),
    wtok AS (
      SELECT g.tok, ph.n_words
      FROM g JOIN ph ON ph.doc_id = g.doc_id AND ph.grp = g.grp
      WHERE NOT g.is_stop
    ),
    stats AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(n_words) AS BIGINT) AS deg
      FROM wtok GROUP BY tok
    ),
    pd AS (
      SELECT phrase, min(n_words) AS n_words,
             CAST(count(*) AS BIGINT) AS n_occurrences
      FROM ph GROUP BY phrase
    ),
    scored AS (
      SELECT pd.phrase, pd.n_words, pd.n_occurrences,
             CAST(sum(CAST(round(CAST(s.deg AS DOUBLE) / s.freq, 9)
                  AS DECIMAL(28,9))) AS DECIMAL(28,9)) AS score_d
      FROM pd, unnest(string_split(pd.phrase, ' ')) AS u(tok)
      JOIN stats s ON s.tok = u.tok
      GROUP BY pd.phrase, pd.n_words, pd.n_occurrences
    )
    SELECT phrase, n_words, n_occurrences,
           round(CAST(score_d AS DOUBLE), 6) AS score
    FROM scored
    ORDER BY score_d DESC, phrase
    LIMIT {RAKE_TOP}
    """,
    doc="RAKE keyword extraction over the corpus (see module constant "
    "comment): stopword-delimited candidate phrases, word co-"
    "occurrence degree/frequency scoring, corpus top-20. Cost shape: "
    "one tokenize pass with a per-document window (the gaps-and-"
    "islands phrase grouping — same kernel as sessionize), one "
    "map-side-combined word-stats aggregate over phrase tokens, and "
    "a phrase-token equi-join against the word-DIMENSION stats table "
    "to assemble scores; phrases and words are vocabulary-sized, so "
    "everything after the first pass runs on dimension tables. The "
    "length cap bounds phrase keys; scores sum as DECIMAL so no "
    "float accumulation order exists.",
)
def text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import STOPWORDS
    from ..plans.stage import eager_release

    docs = load(spark, "documents", sf_dir)
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    t = docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
    wg = Window.partitionBy("doc_id").orderBy("pos")
    g = t.select(
        "doc_id",
        "pos",
        "tok",
        F.sum(F.array_contains(sw, F.col("tok")).cast("int")).over(wg).alias("grp"),
        F.array_contains(sw, F.col("tok")).alias("is_stop"),
    ).persist()
    ph = (
        g.filter(~F.col("is_stop"))
        .groupBy("doc_id", "grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s.getField("tok"),
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
        )
        .filter(F.col("n_words") <= RAKE_MAX_WORDS)
        .persist()
    )
    wtok = (
        g.filter(~F.col("is_stop"))
        .join(ph.select("doc_id", "grp", "n_words"), ["doc_id", "grp"])
        .select("tok", "n_words")
    )
    stats = wtok.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("n_words").cast("bigint").alias("deg"),
    )
    pd_ = ph.groupBy("phrase").agg(
        F.min("n_words").alias("n_words"),
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
    )
    ratio = F.round(F.col("deg").cast("double") / F.col("freq"), 9).cast("decimal(28,9)")
    scored = (
        pd_.select("phrase", "n_words", "n_occurrences", F.explode(F.split("phrase", " ")).alias("tok"))
        .join(stats, "tok")
        .groupBy("phrase", "n_words", "n_occurrences")
        .agg(F.sum(ratio).cast("decimal(28,9)").alias("score_d"))
    )
    out = (
        scored.orderBy(F.col("score_d").desc(), "phrase")
        .limit(RAKE_TOP)
        .select(
            "phrase",
            "n_words",
            "n_occurrences",
            F.round(F.col("score_d").cast("double"), 6).alias("score"),
        )
    )
    return eager_release(out, "rake", g, ph)


# --- corpus-order n-gram novelty (round 10) ---------------------------


@register(
    "text_ngram_novelty",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            for i in range(1, len(w) - 1)]) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    e AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    f AS (
      SELECT doc_id,
             min(doc_id) OVER (PARTITION BY shingle) AS first_doc
      FROM e
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           round(CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS novelty_rate
    FROM f GROUP BY doc_id
    """,
    doc="Corpus-order n-gram novelty: for each document, the fraction "
    "of its distinct word 3-shingles whose FIRST appearance (minimum "
    "doc_id over the whole corpus) is this document — the "
    "memorization/staleness signal an LLM curation pipeline uses to "
    "downweight documents that only repeat earlier content and to "
    "spot template floods (novelty near 0 late in the crawl order). "
    "Shingling stays inside codegen (functions/text.py shingles: "
    "transform over sequence, no UDF); the first-appearance pass is "
    "ONE min-window partitioned by shingle — the same shuffle key "
    "the dedup family buckets on, so at 100 TB it co-partitions with "
    "the dedup index instead of adding a new shuffle shape. Counts "
    "are exact BIGINT; the rate is a single final division rounded "
    "to 6 dp. doc_id as the tiebreak/order is the deterministic "
    "stand-in for crawl timestamp.",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    e = d.select("doc_id", F.explode(shingles("text")).alias("shingle"))
    w = Window.partitionBy("shingle")
    f = e.select("doc_id", F.min("doc_id").over(w).alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return f.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        F.sum(novel).cast("bigint").alias("n_novel"),
        F.round(
            F.sum(novel).cast("double") / F.count(F.lit(1)), 6
        ).alias("novelty_rate"),
    )


# --- Zipf rank-frequency fit (round 10) -------------------------------

ZIPF_TOP = 100


@register(
    "text_zipf_fit",
    oracle=f"""
    WITH wf AS (
      SELECT word, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word
    ),
    top AS (
      SELECT word, freq,
             row_number() OVER (ORDER BY freq DESC, word) AS rnk
      FROM wf QUALIFY rnk <= {ZIPF_TOP}
    ),
    pts AS (
      -- DECIMAL(18,9): the squared terms then carry precision 37 /
      -- scale 18, which BOTH engines hold exactly — at (28,9) Spark's
      -- product rule overflows 38 and silently truncates the scale
      -- to 6 while DuckDB keeps 18, a 7th-decimal divergence found
      -- by the sf0.001 parity replica
      SELECT CAST(round(ln(CAST(rnk AS DOUBLE)), 9) AS DECIMAL(18,9)) AS lx,
             CAST(round(ln(CAST(freq AS DOUBLE)), 9) AS DECIMAL(18,9)) AS ly
      FROM top
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(lx) AS DECIMAL(38,9)) AS sx,
             CAST(sum(ly) AS DECIMAL(38,9)) AS sy,
             CAST(sum(lx * lx) AS DECIMAL(38,18)) AS sxx,
             CAST(sum(lx * ly) AS DECIMAL(38,18)) AS sxy
      FROM pts
    )
    SELECT n,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                 6) AS zipf_slope,
           round((CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE)
                  * ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))))
                 / n, 6) AS zipf_intercept
    FROM s
    """,
    doc="Zipf's-law fit: least-squares slope of ln(freq) on ln(rank) "
    f"over the top {ZIPF_TOP} corpus words (a healthy natural-"
    "language corpus slopes near -1; template floods and boilerplate "
    "flatten or steepen it — the corpus-health scalar next to "
    "text_lexical_diversity). The corpus pays ONE map-side-combined "
    "word count; ranking and the regression run on the top-100 "
    "table, constant-size at any corpus scale. Each ln evaluates "
    "once per POINT over an exact integer operand and is rounded to "
    "9 dp before entering the DECIMAL sufficient-statistic sums (the "
    "bm25/PMI libm rule — no float summation order), and the "
    "closed-form slope/intercept evaluate once in DOUBLE with an "
    "identical expression tree on both engines. row_number's "
    "(freq DESC, word) order is a total order, so the top set is "
    "deterministic.",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    wf = (
        d.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    w = Window.orderBy(F.col("freq").desc(), "word")
    top = wf.select("word", "freq", F.row_number().over(w).alias("rnk")).filter(
        F.col("rnk") <= ZIPF_TOP
    )
    # DECIMAL(18,9) so the cross-products stay exact: see oracle note
    pts = top.select(
        F.round(F.log(F.col("rnk").cast("double")), 9).cast("decimal(18,9)").alias("lx"),
        F.round(F.log(F.col("freq").cast("double")), 9).cast("decimal(18,9)").alias("ly"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("lx").cast("decimal(38,9)").alias("sx"),
        F.sum("ly").cast("decimal(38,9)").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).cast("decimal(38,18)").alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).cast("decimal(38,18)").alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - sx * slope) / n
    return s.select(
        "n",
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("zipf_intercept"),
    )


# --- content-defined chunking (round 10) ------------------------------

CDC_K = 8  # k-gram width fed to the boundary hash
CDC_MASK = 63  # boundary when h % 64 == 0 -> ~64-char average chunks
CDC_MOD = 2147483647


@register(
    "text_cdc_chunking",
    oracle=f"""
    WITH posu AS (
      SELECT doc_id, text, strlen(text) AS n,
             unnest(range(1, strlen(text) + 1)) AS pos
      FROM documents WHERE strlen(text) > 0
    ),
    chars AS (
      SELECT doc_id, pos, ascii(text[pos]) AS code,
             CASE WHEN pos = 1 THEN 1
                  WHEN pos <= n - {CDC_K} + 1
                       AND CAST(('0x' || substr(md5(substr(text, pos, {CDC_K})), 1, 8))
                                AS BIGINT) % {CDC_MASK + 1} = 0 THEN 1
                  ELSE 0 END AS bflag
      FROM posu
    ),
    assigned AS (
      SELECT doc_id, pos, code,
             sum(bflag) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) AS chunk_id
      FROM chars
    ),
    started AS (
      SELECT doc_id, chunk_id, pos, code,
             min(pos) OVER (PARTITION BY doc_id, chunk_id) AS start_pos
      FROM assigned
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(start_pos AS BIGINT) AS start_pos,
           CAST(count(*) AS BIGINT) AS n_chars,
           CAST(sum((pos - start_pos + 1) * code) % {CDC_MOD} AS BIGINT)
             AS chunk_hash
    FROM started
    GROUP BY doc_id, chunk_id, start_pos
    """,
    doc="Content-defined chunking (the FastCDC/rsync boundary idea): "
    f"a position starts a new chunk when the hash of its {CDC_K}-gram "
    f"is 0 mod {CDC_MASK + 1}, so chunk boundaries move WITH the "
    "content — insert one byte early in a document and every chunk "
    "after the next boundary re-aligns, which is what makes CDC the "
    "chunking layer for dedup stores and incremental LLM-corpus "
    "sync (fixed-size chunks would shift-invalidate everything "
    "downstream of an edit). Chunk identity is a position-RELATIVE "
    "weighted code sum, so identical content chunks hash identically "
    "wherever they sit. The per-char explode is the honest cost and "
    "is embarrassingly parallel (one generate + two windows keyed on "
    "doc_id — rows never leave their document's partition until the "
    "final per-chunk aggregate); the boundary hash reuses the md5 "
    "h32 kernel every fingerprint family here uses, so the oracle "
    "re-derives every boundary bit-for-bit.",
)
def text_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pre-explode doc_id repartition (round-15, guide §2.3/§2.5): the
    # cumsum window below needs doc_id clustering either way; without
    # this the exchange sat above the per-CHAR explode (one row per
    # character on the wire) and the per-position md5 probes all ran
    # at the scan's split parallelism — one task on a one-split local
    # file. Exchange doc rows, then explode+hash at cluster
    # parallelism (never a constant; explicit count so AQE cannot
    # coalesce the small doc exchange to one partition and
    # re-serialize the md5 work; size-adaptive per round-16,
    # plans/partitioning.py — the per-char explode multiplies rows,
    # so per-partition INPUT bytes must stay bounded at 100 TB).
    from ..plans.partitioning import fanout_partitions

    docs0 = load(spark, "documents", sf_dir).filter(F.length("text") > 0)
    d = docs0.repartition(fanout_partitions(docs0), "doc_id")
    chars = d.select(
        "doc_id",
        "text",
        F.length("text").alias("n"),
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("pos"),
    ).select(
        "doc_id",
        "pos",
        F.ascii(F.expr("substring(text, pos, 1)")).alias("code"),
        F.when(F.col("pos") == 1, 1)
        .when(
            (F.col("pos") <= F.col("n") - CDC_K + 1)
            & (
                F.conv(
                    F.substring(
                        F.md5(F.expr(f"substring(text, pos, {CDC_K})")), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % (CDC_MASK + 1)
                == 0
            ),
            1,
        )
        .otherwise(0)
        .alias("bflag"),
    )
    wcum = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    assigned = chars.select(
        "doc_id", "pos", "code", F.sum("bflag").over(wcum).alias("chunk_id")
    )
    # ONE aggregate instead of a min-over-(doc,chunk) window feeding a
    # groupBy (round-15, guide §2.4): start_pos = min(pos) folds into
    # the same hash aggregate, and the position-relative weighted sum
    # rewrites exactly as
    #   sum((pos - start + 1) * code) = sum(pos*code) - (start-1)*sum(code)
    # (pure bigint algebra, no overflow headroom lost: sum(pos*code)
    # <= n_chars * max_pos * 255 ~ 2.5e10 at 10k-char docs). This
    # removes a full per-character shuffle+sort — the wmin window
    # re-exchanged and re-sorted every exploded char row by
    # (doc_id, chunk_id) before the final aggregate got to shrink it.
    return (
        assigned.groupBy("doc_id", "chunk_id")
        .agg(
            F.min("pos").alias("start_pos"),
            F.count(F.lit(1)).cast("bigint").alias("n_chars"),
            F.sum(F.col("pos") * F.col("code")).alias("_spc"),
            F.sum("code").alias("_sc"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.col("start_pos").cast("bigint").alias("start_pos"),
            "n_chars",
            (
                (F.col("_spc") - (F.col("start_pos") - 1) * F.col("_sc"))
                % F.lit(CDC_MOD)
            )
            .cast("bigint")
            .alias("chunk_hash"),
        )
    )


CDC_MIN_CHUNK = 16  # ignore sub-16-char chunks in the share join
CDC_MIN_SHARED = 2  # candidate pair threshold


# --- content-defined chunking, Arrow rolling-hash kernel (round 11) ----
#
# text_cdc_chunking (above) derives every boundary with a per-position
# md5 probe — exact and oracle-friendly, but ~10^14 md5 calls plus a
# per-char window shuffle at 100 TB (the round-10 verdict's one perf
# flag). This is the production twin: the SAME chunk/identity algebra
# (pos-1-is-a-boundary, position-relative weighted code sum mod
# CDC_MOD) over a POLYNOMIAL 8-gram hash, computed as eight vectorized
# numpy ops per document inside ONE mapInPandas pass — no explode, no
# window, no shuffle until the per-chunk rows leave the kernel. The
# polynomial is still exactly SQL-expressible (sum of
# ascii*B^(7-i) mod a prime), so the driver oracle re-derives every
# boundary bit-for-bit and the kernel is hash-checked, not trusted.

CDC_B = 257  # polynomial base (> any byte value, odd)
CDC_HASH_MOD = 1_000_000_007  # prime hash modulus
_CDC_POWERS = tuple(pow(CDC_B, CDC_K - 1 - i, CDC_HASH_MOD) for i in range(CDC_K))

_CDC_SCHEMA = (
    "doc_id long, chunk_id long, start_pos long, n_chars long, chunk_hash long"
)


def _cdc_rabin_hash_sql(col: str, pos: str) -> str:
    """The 8-gram polynomial hash as ANSI SQL (DuckDB 1-based string
    indexing): sum of ascii(text[pos+i]) * B^(K-1-i) mod CDC_HASH_MOD.
    Term bound: 127 * CDC_HASH_MOD * CDC_K ~ 1e12 << 2^63."""
    terms = " + ".join(
        # ascii() is INT32 in DuckDB; promote before the ~1e9 multiply
        f"CAST(ascii({col}[{pos} + {i}]) AS BIGINT) * {p}"
        for i, p in enumerate(_CDC_POWERS)
    )
    return f"(({terms}) % {CDC_HASH_MOD})"


def _cdc_rabin_batches(it):
    """mapInPandas kernel: (doc_id, text) batches -> chunk rows.

    Per document: codes from the UTF-8 bytes (codepoint fallback for
    the non-ASCII case, where ascii() semantics are per-codepoint);
    the 8-gram hash at every start is eight shifted vector
    multiply-adds (never a per-position Python hash call); chunk
    hashes come from two prefix sums via the identity
    sum (pos-s+1)*code = (S2[e]-S2[s-1]) - (s-1)*(S1[e]-S1[s-1]),
    exact in int64 for documents up to ~3*10^8 chars (127*n^2/2 <
    2^63) — far beyond any corpus row; a longer doc would need the
    mod folded into the prefix sums, noted here, not needed."""
    import numpy as np
    import pandas as pd

    for pdf in it:
        doc_ids: list[int] = []
        cids: list[int] = []
        sts: list[int] = []
        lens: list[int] = []
        hashes: list[int] = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            n = len(text)
            if n == 0:
                continue
            raw = text.encode("utf-8")
            if len(raw) == n:
                codes = np.frombuffer(raw, np.uint8).astype(np.int64)
            else:
                codes = np.fromiter((ord(c) for c in text), np.int64, n)
            if n >= CDC_K:
                h = np.zeros(n - CDC_K + 1, dtype=np.int64)
                for i, p in enumerate(_CDC_POWERS):
                    h += codes[i : n - CDC_K + 1 + i] * p
                h %= CDC_HASH_MOD
                # 1-based boundary starts: pos 1 always; pos in
                # [2, n-K+1] where the gram hash is 0 mod the mask
                inner = np.nonzero(h[1:] % (CDC_MASK + 1) == 0)[0] + 2
            else:
                inner = np.empty(0, dtype=np.int64)
            starts = np.concatenate(([1], inner)).astype(np.int64)
            ends = np.concatenate((starts[1:] - 1, [n])).astype(np.int64)
            s1 = np.concatenate(([0], np.cumsum(codes)))
            s2 = np.concatenate(([0], np.cumsum(codes * np.arange(1, n + 1))))
            ch = (s2[ends] - s2[starts - 1]) - (starts - 1) * (
                s1[ends] - s1[starts - 1]
            )
            ch %= CDC_MOD
            k = len(starts)
            doc_ids.extend([int(doc_id)] * k)
            cids.extend(range(1, k + 1))
            sts.extend(int(x) for x in starts)
            lens.extend(int(e - s + 1) for s, e in zip(starts, ends))
            hashes.extend(int(x) for x in ch)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "chunk_id": pd.Series(cids, dtype="int64"),
                "start_pos": pd.Series(sts, dtype="int64"),
                "n_chars": pd.Series(lens, dtype="int64"),
                "chunk_hash": pd.Series(hashes, dtype="int64"),
            }
        )


def cdc_rabin_exact_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kernel's exact-SQL twin: text_cdc_chunking's explode/window
    formulation with the polynomial hash swapped in for md5. Exists
    for the kernel==SQL parity pin (tests/test_round11_ops.py) and as
    the bench contrast showing what the kernel saves; NOT registered —
    the kernel is the gate surface, DuckDB re-derives the same SQL."""
    d = load(spark, "documents", sf_dir).filter(F.length("text") > 0)
    chars = d.select(
        "doc_id",
        "text",
        F.length("text").alias("n"),
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("pos"),
    ).select(
        "doc_id",
        "pos",
        F.ascii(F.expr("substring(text, pos, 1)")).alias("code"),
        F.when(F.col("pos") == 1, 1)
        .when(
            (F.col("pos") <= F.col("n") - CDC_K + 1)
            & (
                F.expr(
                    "("
                    # ascii() is INT in Spark; the power literal alone
                    # is ~1e9, so the product must promote to BIGINT
                    + " + ".join(
                        f"CAST(ascii(substring(text, pos + {i}, 1)) AS BIGINT) * {p}"
                        for i, p in enumerate(_CDC_POWERS)
                    )
                    + f") % {CDC_HASH_MOD}"
                )
                % (CDC_MASK + 1)
                == 0
            ),
            1,
        )
        .otherwise(0)
        .alias("bflag"),
    )
    wcum = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    assigned = chars.select(
        "doc_id", "pos", "code", F.sum("bflag").over(wcum).alias("chunk_id")
    )
    wmin = Window.partitionBy("doc_id", "chunk_id")
    started = assigned.select("*", F.min("pos").over(wmin).alias("start_pos"))
    return (
        started.groupBy("doc_id", "chunk_id", "start_pos")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chars"),
            (
                F.sum((F.col("pos") - F.col("start_pos") + 1) * F.col("code"))
                % F.lit(CDC_MOD)
            )
            .cast("bigint")
            .alias("chunk_hash"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.col("start_pos").cast("bigint").alias("start_pos"),
            "n_chars",
            "chunk_hash",
        )
    )


@register(
    "text_cdc_chunking_rabin",
    oracle=f"""
    WITH posu AS (
      SELECT doc_id, text, strlen(text) AS n,
             unnest(range(1, strlen(text) + 1)) AS pos
      FROM documents WHERE strlen(text) > 0
    ),
    chars AS (
      SELECT doc_id, pos, ascii(text[pos]) AS code,
             CASE WHEN pos = 1 THEN 1
                  WHEN pos <= n - {CDC_K} + 1
                       AND {_cdc_rabin_hash_sql("text", "pos")}
                           % {CDC_MASK + 1} = 0 THEN 1
                  ELSE 0 END AS bflag
      FROM posu
    ),
    assigned AS (
      SELECT doc_id, pos, code,
             sum(bflag) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) AS chunk_id
      FROM chars
    ),
    started AS (
      SELECT doc_id, chunk_id, pos, code,
             min(pos) OVER (PARTITION BY doc_id, chunk_id) AS start_pos
      FROM assigned
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(start_pos AS BIGINT) AS start_pos,
           CAST(count(*) AS BIGINT) AS n_chars,
           CAST(sum((pos - start_pos + 1) * code) % {CDC_MOD} AS BIGINT)
             AS chunk_hash
    FROM started
    GROUP BY doc_id, chunk_id, start_pos
    """,
    doc="Content-defined chunking, production kernel (round-10 "
    "verdict item 3): text_cdc_chunking's boundary algebra over a "
    f"polynomial 8-gram hash (base {CDC_B} mod {CDC_HASH_MOD}), "
    "computed by a mapInPandas Arrow kernel — eight vectorized "
    "multiply-adds per document replace a per-position md5 probe, "
    "and the per-char explode + two window shuffles collapse into "
    "one partition-local pass that emits only per-CHUNK rows (~64x "
    "fewer than per-char). At 100 TB this is the difference between "
    "a scan-speed chunker and 10^14 hash calls through a window "
    "sort. The hash stays exactly SQL-expressible, so the DuckDB "
    "oracle re-derives every boundary and chunk identity "
    "bit-for-bit — the kernel is hash-checked, not trusted; a "
    "Spark-side exact-SQL twin (cdc_rabin_exact_sql) pins "
    "kernel==SQL in pytest at sf0.001 and sf0.01 (the "
    "fuzzy_match_damerau dual-surface pattern).",
)
def text_cdc_chunking_rabin(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir).filter(F.length("text") > 0)
    return d.select("doc_id", "text").mapInPandas(_cdc_rabin_batches, _CDC_SCHEMA)


CDC_MIN_CHUNK = 16  # ignore sub-16-char chunks in the share join
CDC_MIN_SHARED = 2  # candidate pair threshold


@register(
    "dedup_cdc_chunks",
    oracle=f"""
    WITH posu AS (
      SELECT doc_id, text, strlen(text) AS n,
             unnest(range(1, strlen(text) + 1)) AS pos
      FROM documents WHERE strlen(text) > 0
    ),
    chars AS (
      SELECT doc_id, pos, ascii(text[pos]) AS code,
             CASE WHEN pos = 1 THEN 1
                  WHEN pos <= n - {CDC_K} + 1
                       AND {_cdc_rabin_hash_sql("text", "pos")}
                           % {CDC_MASK + 1} = 0 THEN 1
                  ELSE 0 END AS bflag
      FROM posu
    ),
    assigned AS (
      SELECT doc_id, pos, code,
             sum(bflag) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) AS chunk_id
      FROM chars
    ),
    started AS (
      SELECT doc_id, chunk_id, pos, code,
             min(pos) OVER (PARTITION BY doc_id, chunk_id) AS start_pos
      FROM assigned
    ),
    chunks AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chars,
             CAST(sum((pos - start_pos + 1) * code) % {CDC_MOD} AS BIGINT)
               AS chunk_hash
      FROM started GROUP BY doc_id, chunk_id, start_pos
    ),
    keyed AS (
      SELECT DISTINCT doc_id, n_chars, chunk_hash
      FROM chunks WHERE n_chars >= {CDC_MIN_CHUNK}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM keyed a JOIN keyed b
      ON a.n_chars = b.n_chars AND a.chunk_hash = b.chunk_hash
     AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {CDC_MIN_SHARED}
    """,
    doc="CDC-chunk near-dup candidates: documents sharing >= "
    f"{CDC_MIN_SHARED} content-defined chunks (of >= {CDC_MIN_CHUNK} "
    "chars) pair up — the dedup-store identity applied to corpus "
    "dedup. Because boundaries are content-defined, a shared passage "
    "yields IDENTICAL (length, hash) chunk keys in both documents no "
    "matter where it sits, so candidate generation is ONE equi-join "
    "on the chunk key — the never-all-pairs architecture of MinHash "
    "banding with exact substring identity instead of probabilistic "
    "similarity (catches long verbatim quotes whole-doc MinHash "
    "dilutes below threshold). Round 11: the chunk stage now RIDES "
    "THE PRODUCTION KERNEL (text_cdc_chunking_rabin's mapInPandas "
    "rolling hash) instead of the per-char md5 explode — the gate "
    "row therefore checks the production composition end to end, "
    "and the oracle re-derives the polynomial boundaries in SQL. "
    "Per-doc chunk keys are DISTINCT before the join so a passage "
    "repeated within one document cannot inflate the pair count; "
    "viral boilerplate chunks would get the dedup family's "
    "document-frequency cap at real-corpus scale (noted, no-op "
    "here).",
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = text_cdc_chunking_rabin(spark, sf_dir)
    keyed = (
        chunks.filter(F.col("n_chars") >= CDC_MIN_CHUNK)
        .select("doc_id", "n_chars", "chunk_hash")
        .distinct()
    )
    a = keyed.select(F.col("doc_id").alias("doc_a"), "n_chars", "chunk_hash")
    b = keyed.select(F.col("doc_id").alias("doc_b"), "n_chars", "chunk_hash")
    return (
        a.join(b, ["n_chars", "chunk_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= CDC_MIN_SHARED)
    )


# --- BPE tokenizer application (round 11 continuation) ------------------

# Fixed, offline-trained merge vocabulary (the stats_hmm_viterbi
# convention: training happens elsewhere — text_bpe_merge_candidates IS
# that trainer's first iteration — the engine's job is applying the
# rules at corpus scale). Rules apply in priority order.
BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "r"), ("s", "t"),
    ("e", "n"), ("a", "t"),
]
# Each rule is applied as BPE_PASSES successive non-overlapping
# replaces of '|x|y|' -> '|xy|' on the '|'-delimited token string.
# One replace pass merges alternate pairs inside a same-token run
# (matches share their delimiter), so ceil(log2(run)) passes reach the
# greedy left-to-right fixed point; 4 passes cover runs up to the
# 24-char word cap. This deterministic formulation is shared by both
# engines AND the pytest reference, and coincides with textbook greedy
# BPE on every word without degenerate same-pair runs.
BPE_PASSES = 4
BPE_WORD_CAP = 24


def _bpe_fold_sql(var: str) -> str:
    s = var
    for x, y in BPE_MERGES:
        for _ in range(BPE_PASSES):
            s = f"replace({s}, '|{x}|{y}|', '|{x}{y}|')"
    return s


@register(
    "text_bpe_tokenize",
    oracle=f"""
    WITH words AS (
      SELECT d.doc_id, substr(w.w, 1, {BPE_WORD_CAP}) AS word
      FROM documents d,
           unnest(regexp_split_to_array(lower(d.text), '[^a-z]+')) AS w(w)
      WHERE len(w.w) > 0
    ),
    vocab AS (
      SELECT DISTINCT word FROM words
    ),
    enc AS (
      SELECT word,
             '|' || array_to_string([word[i] for i in
                      range(1, len(word) + 1)], '|') || '|' AS spaced
      FROM vocab
    ),
    merged AS (
      SELECT word,
             {_bpe_fold_sql("spaced")} AS s
      FROM enc
    ),
    toks AS (
      SELECT word,
             CAST(len(s) - len(replace(s, '|', '')) - 1 AS BIGINT)
               AS n_tokens,
             CAST(len(word) AS BIGINT) AS n_chars
      FROM merged
    )
    SELECT w.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(t.n_chars) AS BIGINT) AS n_chars_az,
           CAST(sum(t.n_tokens) AS BIGINT) AS n_bpe_tokens,
           round(CAST(sum(t.n_chars) AS DOUBLE) / sum(t.n_tokens), 6)
             AS chars_per_token
    FROM words w JOIN toks t ON t.word = w.word
    GROUP BY w.doc_id
    """,
    doc="BPE tokenizer APPLICATION — the missing half of the pair "
    "(text_bpe_merge_candidates learns merge rules; this applies a "
    "fixed trained vocabulary to count real subword tokens, the "
    "number that prices a training corpus far better than the "
    "whitespace counts of text_token_stats). The production shape "
    "is the point: the merge fold (12 rules x 4 delimiter-replace "
    "passes, a pure codegen string pipeline) runs on the DISTINCT "
    "word vocabulary — Zipf-bounded, thousands of rows where the "
    "corpus has billions — and token counts join back to "
    "occurrences by word, so at 100 TB the expensive part is "
    "vocabulary-dimension work plus one broadcast-joinable rollup. "
    "The replace-pass formulation is deterministic and shared by "
    "both engines and the pytest reference (see BPE_PASSES note); "
    "everything else is exact integer counts with one final "
    "display division.",
)
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    words = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"),
        )
        .filter(F.length("w") > 0)
        .select("doc_id", F.substring("w", 1, BPE_WORD_CAP).alias("word"))
    )
    vocab = words.select("word").distinct()
    spaced = F.concat(
        F.lit("|"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.col("word").substr(i, F.lit(1)),
            ),
            "|",
        ),
        F.lit("|"),
    )
    s = spaced
    for x, y in BPE_MERGES:
        for _ in range(BPE_PASSES):
            s = F.replace(s, F.lit(f"|{x}|{y}|"), F.lit(f"|{x}{y}|"))
    toks = vocab.select(
        "word",
        (F.length(s) - F.length(F.replace(s, F.lit("|"), F.lit(""))) - 1)
        .cast("bigint")
        .alias("n_tokens"),
        F.length("word").cast("bigint").alias("n_chars"),
    )
    return (
        words.join(F.broadcast(toks), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_chars").cast("bigint").alias("n_chars_az"),
            F.sum("n_tokens").cast("bigint").alias("n_bpe_tokens"),
            F.round(
                F.sum("n_chars").cast("double") / F.sum("n_tokens"), 6
            ).alias("chars_per_token"),
        )
    )


# --- URL extraction + domain rollup (round 12) --------------------------

# Shared RE2-safe pattern (no backreferences, no capture groups — both
# engines run IDENTICAL text with explicit group 0).
URL_RE = r"https?://[a-z0-9.-]+(?:/[a-z0-9._/-]*)?"


@register(
    "text_url_domains",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN
               text || ' https://host' || CAST(doc_id % 7 AS VARCHAR)
                    || '.example.com/p/' || CAST(doc_id AS VARCHAR)
             WHEN doc_id % 3 = 1 THEN
               'see http://cdn' || CAST(doc_id % 5 AS VARCHAR)
                    || '.example.org/a ' || text
                    || ' and https://host' || CAST(doc_id % 7 AS VARCHAR)
                    || '.example.com/'
             ELSE text END AS text
      FROM documents
    ),
    urls AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '{URL_RE}', 0)) AS url
      FROM planted
    ),
    parsed AS (
      SELECT doc_id, url,
             split_part(regexp_replace(url, '^https?://', ''), '/', 1)
               AS domain,
             CASE WHEN url LIKE 'https://%' THEN 1 ELSE 0 END AS is_https
      FROM urls
    )
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(sum(is_https) AS BIGINT) AS n_https,
           min(url) AS first_url
    FROM parsed GROUP BY domain
    """,
    doc="URL extraction and per-domain rollup — the link-analysis pass "
    "a crawl-curation pipeline runs to score outlink density, spot "
    "link farms, and build per-domain quality priors (domain-level "
    "filtering is how C4/RefinedWeb-style corpora cut boilerplate "
    "sites). The corpus has no URLs, so they are PLANTED "
    "deterministically from doc_id (the mm_magic_sniff discipline: "
    "the detector must find exactly what was planted, making the "
    "extraction machinery itself the thing under test). One "
    "RE2-safe regex literal — no capture groups, explicit group 0 "
    "— is shared verbatim by Spark and DuckDB, then domains split "
    "off with identical split_part calls. Shape: extraction is a "
    "stateless row-local scan (pushes through any partitioning), "
    "the rollup one map-side-combined aggregate keyed by domain — "
    "web-scale friendly since domain cardinality, not corpus size, "
    "bounds the reduce.",
)
def text_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    did = F.col("doc_id")
    planted = (
        F.when(
            did % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" https://host"),
                (did % 7).cast("string"),
                F.lit(".example.com/p/"),
                did.cast("string"),
            ),
        )
        .when(
            did % 3 == 1,
            F.concat(
                F.lit("see http://cdn"),
                (did % 5).cast("string"),
                F.lit(".example.org/a "),
                F.col("text"),
                F.lit(" and https://host"),
                (did % 7).cast("string"),
                F.lit(".example.com/"),
            ),
        )
        .otherwise(F.col("text"))
    )
    urls = d.select(
        "doc_id",
        F.explode(F.regexp_extract_all(planted, F.lit(URL_RE), 0)).alias("url"),
    )
    parsed = urls.select(
        "doc_id",
        "url",
        F.split_part(
            F.regexp_replace("url", r"^https?://", ""), F.lit("/"), F.lit(1)
        ).alias("domain"),
        F.when(F.col("url").startswith("https://"), 1).otherwise(0).alias(
            "is_https"
        ),
    )
    return parsed.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_urls"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.sum("is_https").cast("bigint").alias("n_https"),
        F.min("url").alias("first_url"),
    )


# --- vocabulary capture-recapture (round 12, wave-5 queue) ---------------


@register(
    "text_vocab_capture_recapture",
    oracle="""
    WITH tok AS (
      SELECT lang, doc_id % 2 AS half,
             unnest(string_split(text, ' ')) AS t
      FROM documents
    ),
    seen AS (
      SELECT lang, t,
             max(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS in_b
      FROM tok GROUP BY lang, t
    )
    SELECT lang,
           CAST(sum(in_a) AS BIGINT) AS n_a,
           CAST(sum(in_b) AS BIGINT) AS n_b,
           CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
           CAST(count(*) AS BIGINT) AS true_vocab,
           round((CAST(sum(in_a) AS DOUBLE) + 1)
                 * (CAST(sum(in_b) AS DOUBLE) + 1)
                 / (CAST(sum(in_a * in_b) AS DOUBLE) + 1) - 1, 6)
             AS chapman_estimate
    FROM seen GROUP BY lang
    """,
    doc="Capture-recapture (Chapman) estimation of per-language "
    "vocabulary size from two independent samples — the 'unseen "
    "species' diagnostic a tokenizer team runs to ask how much "
    "vocabulary the NEXT crawl shard will add (Good-Turing's "
    "cousin): sample A = words seen in even doc_ids, sample B = odd; "
    "N-hat = (|A|+1)(|B|+1)/(|AB|+1) - 1. The fixture conveniently "
    "contains the whole population, so true_vocab sits beside the "
    "estimate and the gate hash-checks estimator AND ground truth "
    "(all four inputs exact integer counts; the estimate is a "
    "two-operation double expression both engines evaluate "
    "identically — each intermediate is IEEE-determined from "
    "integer-valued operands). Shape: one token explode, ONE "
    "(lang, token)-keyed reduce carrying two bit flags (the A/B "
    "membership collapses to max() aggregates — no join between "
    "the samples, no distinct expansion), then a lang-dimension "
    "rollup. Vocabulary-bounded after the first reduce; at 100 TB "
    "the explode dominates and is embarrassingly parallel.",
)
def text_vocab_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    tok = d.select(
        "lang",
        (F.col("doc_id") % 2).alias("half"),
        F.explode(F.split(F.col("text"), " ")).alias("t"),
    )
    seen = tok.groupBy("lang", "t").agg(
        F.max(F.when(F.col("half") == 0, 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("half") == 1, 1).otherwise(0)).alias("in_b"),
    )
    na = F.sum("in_a").cast("bigint")
    nb = F.sum("in_b").cast("bigint")
    nm = F.sum(F.col("in_a") * F.col("in_b")).cast("bigint")
    return seen.groupBy("lang").agg(
        na.alias("n_a"),
        nb.alias("n_b"),
        nm.alias("n_both"),
        F.count(F.lit(1)).cast("bigint").alias("true_vocab"),
        F.round(
            (na.cast("double") + F.lit(1.0))
            * (nb.cast("double") + F.lit(1.0))
            / (nm.cast("double") + F.lit(1.0))
            - F.lit(1.0),
            6,
        ).alias("chapman_estimate"),
    )
