"""In-engine trained quality classifier (SURVEY.md §2-D4, learned
filter family).

The fastText-classifier analog of published LLM-corpus pipelines
without an external model dependency: distill the Gopher rule gate
into a CONTINUOUS logistic quality score by training a logistic
regression on the rule verdict, with full-batch gradient descent run
as Spark aggregates. Where the rule gate answers keep/drop, the
distilled scorer ranks borderline documents — the input quality-aware
sampling (``sample_weighted``) and curriculum ordering need.

Scale shape — identical to the Lloyd k-means trainer
(``similarity.kmeans_fit_assign``): each iteration is ONE map-side-
combined aggregate over the corpus carrying dim+2 doubles per task
(gradient vector, log-loss, count); only that vector reaches the
driver per iteration — the sanctioned CC-style convergence traffic.
Features are pure-codegen Gopher metrics, so the feature pass runs at
scan speed; the featurized frame (6 doubles + id per row) is persisted
once and the 25 iterations scan it, not the text.

Rows-only for the driver (float gradient sums are combine-order
dependent across engines); pytest pins monotone loss decrease,
rule-class separation, and crafted junk-vs-clean ordering
(tests/test_quality_model.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load
from .corpus_quality import _gopher_metrics, gopher_keep

QLR_ITERS = 25
QLR_LR = 1.0
QLR_DIM = 6  # bias + 5 gopher metrics


def quality_features(text_col: str = "text") -> Column:
    """array<double> feature vector: bias + scaled Gopher metrics.

    Scaling keeps every feature O(1) so one learning rate fits all;
    the word/stopword counts saturate so outlier documents cannot
    dominate the batch gradient."""
    m = _gopher_metrics(text_col)
    return F.array(
        F.lit(1.0),
        F.least(m["n_words"].cast("double") / 100.0, F.lit(5.0)),
        m["mean_word_len"] / 10.0,
        m["symbol_ratio"],
        m["alpha_ratio"],
        F.least(m["n_stop"].cast("double") / 10.0, F.lit(5.0)),
    )


def _margin(w: list[float]) -> Column:
    """w . x, clamped so exp/log stay finite."""
    wc = F.array(*[F.lit(float(v)) for v in w])
    dot = F.aggregate(
        F.zip_with(F.col("x"), wc, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )
    return F.greatest(F.least(dot, F.lit(30.0)), F.lit(-30.0))


def logreg_fit(
    feats: DataFrame, dim: int = QLR_DIM, iters: int = QLR_ITERS, lr: float = QLR_LR
) -> tuple[list[float], list[float]]:
    """Full-batch gradient descent on (y double, x array<double>).

    Returns (weights, per-iteration mean log-loss history). One
    aggregation job per iteration: sum((p - y) * x_i) for every i,
    the summed log-loss, and the count — dim+2 doubles to the driver."""
    w = [0.0] * dim
    hist: list[float] = []
    for _ in range(iters):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w)))
        gcols = [
            F.sum((p - F.col("y")) * F.col("x")[i]).alias(f"g{i}") for i in range(dim)
        ]
        loss = F.sum(
            -(F.col("y") * F.log(p) + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p))
        ).alias("loss")
        row = feats.agg(*gcols, loss, F.count(F.lit(1)).alias("n")).collect()[0]
        n = row["n"]
        hist.append(row["loss"] / n)
        w = [w[i] - lr * row[f"g{i}"] / n for i in range(dim)]
    return w, hist


def quality_lr_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Fit the distilled scorer on ``docs`` and return
    (doc_id, quality_prob, rule_keep) — the reusable kernel the
    registered query wraps. The returned probability is a smooth
    ranking signal; the rule verdict rides along for comparison."""
    feats = docs.select(
        "doc_id",
        gopher_keep(text_col).cast("double").alias("y"),
        quality_features(text_col).alias("x"),
    ).persist()
    try:
        w, _ = logreg_fit(feats)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w)))
        return feats.select(
            "doc_id",
            F.round(p, 6).alias("quality_prob"),
            F.col("y").cast("int").alias("rule_keep"),
        )
    finally:
        # the returned frame recomputes features from the scan after
        # release — correctness is unaffected, only the training loop
        # needed the hot copy
        feats.unpersist()


@register(
    "quality_classifier_score",
    oracle=None,  # float gradient sums are combine-order dependent ->
    # rows-only; loss/separation/ordering pinned in pytest
    doc=f"Learned quality scoring: logistic regression distilled from "
    "the Gopher rule gate, trained IN the engine by full-batch "
    f"gradient descent ({QLR_ITERS} iterations; one map-side-combined "
    "aggregate per iteration carrying gradient+loss+count, the "
    "k-means traffic pattern). Features are the pure-codegen Gopher "
    "metrics; output is a continuous quality_prob that ranks "
    "borderline documents where the binary rules cannot — the "
    "fastText-quality-classifier analog of published corpus "
    "pipelines, with no external model.",
)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_lr_score(load(spark, "documents", sf_dir))


WQ_SALT = "#qws1"
WQ_FLOOR = 0.05


def sample_by_quality(scored: DataFrame) -> DataFrame:
    """Quality-weighted Bernoulli sample over (doc_id, quality_prob)
    with Horvitz-Thompson reweighting — sample_weighted's md5-threshold
    kernel driven by the LEARNED quality score instead of a length
    proxy: high-quality docs are kept with p ~ quality_prob, junk is
    downsampled but keeps a floored trace presence (p >= 0.05) so
    inv_p stays bounded and no stratum silently disappears. Membership
    comes from corpus_quality.bernoulli_keep — ONE kernel for every
    deterministic sampler, so the 0xffffffff-clamp subtlety lives in
    one place. Pure filter, zero shuffle after the score column
    exists."""
    from .corpus_quality import bernoulli_keep

    p = F.greatest(F.col("quality_prob"), F.lit(WQ_FLOOR))
    return (
        scored.withColumn("_p", p)
        .filter(bernoulli_keep(F.col("_p"), F.col("doc_id"), WQ_SALT))
        .select(
            "doc_id",
            "quality_prob",
            F.col("_p").alias("p"),
            (F.lit(1.0) / F.col("_p")).alias("inv_p"),
        )
    )


@register(
    "sample_quality_weighted",
    oracle=None,  # the inclusion probability comes from the trained
    # scorer (rows-only like it); kernel determinism + quality
    # correlation pinned in tests/test_quality_model.py
    doc="Quality-aware corpus subsampling: the learned quality_prob "
    "drives sample_weighted's deterministic md5-threshold Bernoulli "
    "kernel, with Horvitz-Thompson inv_p so downstream statistics "
    "stay unbiased — the 'train more on better data' curation step "
    "of published pipelines, as one zero-shuffle filter over the "
    "scored corpus.",
)
def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_by_quality(quality_lr_score(load(spark, "documents", sf_dir)))
