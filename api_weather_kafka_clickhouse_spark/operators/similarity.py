"""Similarity search over embeddings (SURVEY.md §2-D3): brute-force
cosine top-k as the exact baseline, plus LSH- and IVF-bucketed
approximate variants as the 100 TB scale path.

Design for scale:
- The query set is small → broadcast it; the corpus never shuffles.
- Top-k per query via window row_number over (rounded cosine, id) —
  a per-partition heap + final merge, not a global sort.
- ANN variants prune the corpus per query (hyperplane-LSH buckets /
  IVF coarse cells) and re-rank candidates exactly. Recall is
  measured against the brute-force baseline in tests/test_similarity.py
  (driver check is rows-only — approximate by design).
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, to_double
from ..registry import register
from ..tables import load

N_QUERIES = 8  # vec_id < 8 are the query vectors
TOP_K = 5


def _corpus_and_queries(spark: SparkSession, sf_dir: str):
    e = load(spark, "embeddings", sf_dir)
    corpus = e.select(F.col("vec_id").alias("nbr_id"), to_double("embedding").alias("nbr_vec"))
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), to_double("embedding").alias("q_vec")
    )
    return corpus, queries


@register(
    "sim_topk_bruteforce",
    oracle=f"""
    SELECT query_id, nbr_id, cos_sim, rn AS rank
    FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 6) AS cos_sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                     CAST(c.embedding AS DOUBLE[])), 6) DESC,
                        c.vec_id) AS rn
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ) WHERE rn <= {TOP_K}
    """,
    doc="Exact cosine top-k per query vector: broadcast queries x full "
    "corpus scan, rank on (rounded cosine, nbr_id) so ordering is "
    "engine-independent (Spark/DuckDB cosines are bit-identical; "
    "rounding is belt-and-braces).",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, queries = _corpus_and_queries(spark, sf_dir)
    scored = (
        corpus.join(F.broadcast(queries), F.col("query_id") != F.col("nbr_id"))
        .withColumn("cos_sim", F.round(cosine(F.col("q_vec"), F.col("nbr_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "nbr_id", "cos_sim", "rank")
    )


# --- hyperplane (SRP) LSH --------------------------------------------

N_PLANES = 32
LSH_BANDS = 8  # 8 bands x 4 bits: measured ~0.75 recall at ~0.4
# candidate fraction on this near-random corpus (top-5 neighbors sit
# at cosine 0.26-0.39 — there is no planted NN structure, so this is
# the honest SRP operating point; see tests/test_similarity.py)
_rng = random.Random(427)
# deterministic pseudo-random hyperplanes, dim 64
_PLANES = [[_rng.gauss(0.0, 1.0) for _ in range(64)] for _ in range(N_PLANES)]

# The planes are plain Python literals, so the ENTIRE LSH is
# SQL-expressible: repr() round-trips each double exactly into the
# oracle, DuckDB's list_dot_product recomputes the projections, and
# the band packing mirrors the UDF bit for bit. Float caveat (why
# this is safe): numpy's BLAS matmul and DuckDB's sequential fold may
# round dot products differently in the last ulp, but only the SIGN
# enters a band key — a flip needs |dot| ~ 1e-13, vanishingly rare
# for gaussian hyperplanes; the re-rank cosine is computed from raw
# embeddings on both sides (bit-identical, proven by
# sim_topk_bruteforce's gate history).
_PLANES_SQL = ",".join(
    f"({i}, [{','.join(repr(x) for x in p)}])" for i, p in enumerate(_PLANES)
)


def _band_keys(vec) -> F.Column:
    """Array of LSH_BANDS band keys; band j packs the sign bits of 4
    hyperplane projections.

    Dense matmul is the one place a Pandas UDF beats built-ins: the
    32 higher-order-function folds run interpreted per element, while
    one Arrow batch -> numpy (n x 64) @ (64 x 32) matmul does the
    same work vectorized. Sign bits only -> no cross-engine float
    determinism concern (rows-only operator)."""
    from pyspark.sql.types import ArrayType, IntegerType

    planes_t = [list(col) for col in zip(*_PLANES)]  # 64 x 32
    bpb = N_PLANES // LSH_BANDS

    @F.pandas_udf(ArrayType(IntegerType()))
    def band_keys_udf(vecs: pd.Series) -> pd.Series:
        planes = np.array(planes_t)  # dim x n_planes
        m = np.stack(vecs.to_numpy())  # n x dim
        bits = (m @ planes) > 0  # n x n_planes
        weights = np.array([1 << k for k in range(bpb)])
        keys = [
            (bits[:, j * bpb : (j + 1) * bpb] @ weights).astype(np.int32)
            for j in range(LSH_BANDS)
        ]
        out = np.stack(keys, axis=1)  # n x LSH_BANDS
        return pd.Series(list(out))

    return band_keys_udf(vec)


@register(
    "sim_ann_lsh",
    oracle=f"""
    WITH planes(idx, plane) AS (VALUES {_PLANES_SQL}),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    bits AS (
      SELECT v.vec_id, p.idx,
             CASE WHEN list_dot_product(v.emb, p.plane) > 0 THEN 1 ELSE 0 END AS bit
      FROM v, planes p
    ),
    bands AS (
      SELECT vec_id, idx // {N_PLANES // LSH_BANDS} AS band_idx,
             CAST(sum(bit << (idx % {N_PLANES // LSH_BANDS})) AS INT) AS band_key
      FROM bits GROUP BY vec_id, idx // {N_PLANES // LSH_BANDS}
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS nbr_id
      FROM bands q JOIN bands c USING (band_idx, band_key)
      WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    scored AS (
      SELECT cand.query_id, cand.nbr_id,
             round(list_cosine_similarity(qe.emb, ce.emb), 6) AS cos_sim
      FROM cand JOIN v qe ON qe.vec_id = cand.query_id
                JOIN v ce ON ce.vec_id = cand.nbr_id
    )
    SELECT query_id, nbr_id, cos_sim, rn AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, nbr_id) AS rn
      FROM scored
    ) WHERE rn <= {TOP_K}
    """,
    doc="ANN via sign-random-projection LSH, banded like MinHash: 32 "
    "hyperplane bits -> 8 bands x 4 bits; candidate iff some band "
    "matches exactly; exact cosine re-rank of candidates. At 100 TB "
    "the corpus is written bucketed by band keys once, and each query "
    "probes only matching buckets instead of scanning the corpus. "
    "Hash-checked against a full DuckDB mirror of the LSH (the "
    "hyperplanes are literals — see _PLANES_SQL), upgraded from "
    "rows-only in round 7.",
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, queries = _corpus_and_queries(spark, sf_dir)
    # corpus band rows carry only (id, band) — not 8 copies of each
    # embedding; vectors re-attach to the small candidate set below
    cb = corpus.select(
        "nbr_id", F.posexplode(_band_keys(F.col("nbr_vec"))).alias("band_idx", "band_key")
    )
    qb = queries.select(
        "query_id", F.posexplode(_band_keys(F.col("q_vec"))).alias("band_idx", "band_key")
    )
    cand = (
        cb.join(F.broadcast(qb), ["band_idx", "band_key"])
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id")
        .dropDuplicates(["query_id", "nbr_id"])
    )
    scored = (
        cand.join(corpus, "nbr_id")
        .join(F.broadcast(queries), "query_id")
        .withColumn("cos_sim", F.round(cosine(F.col("q_vec"), F.col("nbr_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "nbr_id", "cos_sim", "rank")
    )


@register(
    "sim_ivf_label",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    cent AS (
      SELECT label, list_value({", ".join(f"m{i}" for i in range(64))}) AS centroid FROM (
        SELECT label, {", ".join(f"avg(emb[{i + 1}]) AS m{i}" for i in range(64))}
        FROM v GROUP BY label)
    ),
    qc AS (
      SELECT q.vec_id AS query_id, c.label,
             list_cosine_similarity(q.emb, c.centroid) AS cell_sim
      FROM v q, cent c WHERE q.vec_id < {N_QUERIES}
    ),
    probed AS (
      SELECT query_id, label FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cell_sim DESC, label) AS cr
        FROM qc) WHERE cr <= 5
    ),
    cand AS (
      SELECT p.query_id, c.vec_id AS nbr_id
      FROM probed p JOIN v c ON c.label = p.label
      WHERE c.vec_id <> p.query_id
    ),
    scored AS (
      SELECT cand.query_id, cand.nbr_id,
             round(list_cosine_similarity(qe.emb, ce.emb), 6) AS cos_sim
      FROM cand JOIN v qe ON qe.vec_id = cand.query_id
                JOIN v ce ON ce.vec_id = cand.nbr_id
    )
    SELECT query_id, nbr_id, cos_sim, rn AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, nbr_id) AS rn
      FROM scored
    ) WHERE rn <= {TOP_K}
    """,
    doc="IVF-style ANN: coarse cells = per-label centroids, queries "
    "probe the 5 nearest cells, exact re-rank inside probed cells. "
    "The centroid build is one groupBy over the corpus; at 100 TB "
    "cells are the partition key, so a query reads probes/n_cells of "
    "the data. (On this near-random corpus cell quantization is weak "
    "— measured recall ~0.5 at 5/10 cells; see tests.) Hash-checked "
    "against a DuckDB mirror since round 7: centroids are plain "
    "per-label averages, so the only cross-engine float risk is a "
    "probe-rank flip between two cells whose cell_sim agree to the "
    "last ulp — never observed, and the re-rank cosine is computed "
    "from raw embeddings on both sides.",
)
def sim_ivf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "embeddings", sf_dir)
    corpus = e.select(
        F.col("vec_id").alias("nbr_id"), F.col("label").alias("cell"), to_double("embedding").alias("nbr_vec")
    )
    # centroids: elementwise mean per label as 64 codegen avg
    # aggregates packed back into an array — ONE map-side-combined
    # shuffle carrying n_labels x 64 partial sums, vs. the
    # posexplode + double-groupBy shape that shuffles corpus x 64
    # exploded rows (the same fixed-width-aggregate trick as
    # minhash_signatures)
    DIM = 64
    v = to_double("embedding")
    cent = (
        e.select("label", *[v[i].alias(f"x{i}") for i in range(DIM)])
        .groupBy("label")
        .agg(*[F.avg(f"x{i}").alias(f"m{i}") for i in range(DIM)])
        .select("label", F.array(*[f"m{i}" for i in range(DIM)]).alias("centroid"))
    )
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), to_double("embedding").alias("q_vec")
    )
    qc = queries.join(F.broadcast(cent), F.lit(True)).withColumn(
        "cell_sim", cosine(F.col("q_vec"), F.col("centroid"))
    )
    w_cell = Window.partitionBy("query_id").orderBy(F.col("cell_sim").desc(), F.col("label"))
    probed = (
        qc.withColumn("cell_rank", F.row_number().over(w_cell))
        .filter(F.col("cell_rank") <= 5)
        .select("query_id", "q_vec", F.col("label").alias("cell"))
    )
    cand = corpus.join(F.broadcast(probed), "cell").filter(F.col("query_id") != F.col("nbr_id"))
    scored = cand.withColumn("cos_sim", F.round(cosine(F.col("q_vec"), F.col("nbr_vec")), 6))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "nbr_id", "cos_sim", "rank")
    )


# --- distributed Lloyd k-means ---------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 4
_DIM = 64


def _assign_udf(centroids: list[list[float]]) -> F.Column:
    """(vec double[]) -> nearest-centroid index (squared L2, ties to
    the lowest index). One Arrow batch -> numpy (n x d) @ (d x k)
    matmul per task — the same vectorized shape as _band_keys; the
    32-or-64 higher-order-fn folds this replaces run interpreted."""
    from pyspark.sql.types import IntegerType

    @F.pandas_udf(IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        c = np.array(centroids)  # k x d
        m = np.stack(vecs.to_numpy())  # n x d
        # argmin ||x - c||^2 = argmin (||c||^2 - 2 x.c); np.argmin
        # takes the first (lowest-index) minimum, so ties are
        # deterministic
        d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (m @ c.T)
        return pd.Series(np.argmin(d2, axis=1).astype(np.int32))

    return assign


def _assign_topr_udf(centroids: list[list[float]], r: int) -> F.Column:
    """(vec double[]) -> the r nearest centroid indices (squared L2,
    stable order so ties are deterministic). Same vectorized one-scan
    shape as _assign_udf; feeds multi-probe cell assignment."""
    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        c = np.array(centroids)  # k x d
        m = np.stack(vecs.to_numpy())  # n x d
        d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (m @ c.T)
        order = np.argsort(d2, axis=1, kind="stable")[:, :r].astype(np.int32)
        return pd.Series(list(order))

    return assign


def kmeans_fit_assign(
    vecs: DataFrame, k: int = KMEANS_K, iters: int = KMEANS_ITERS, dim: int = _DIM
) -> tuple[DataFrame, list[list[float]], list[float]]:
    """Distributed Lloyd iterations over an (id, vec) frame.

    Returns (assignments DataFrame (id, cluster), final centroids,
    per-iteration within-cluster SSE history). Deterministic end to
    end: initial centroids are the k lowest-id vectors, assignment
    ties break to the lowest cluster index, and empty clusters keep
    their previous centroid.

    Scale shape: each iteration is one scan of the corpus — a
    vectorized assignment UDF plus a groupBy(cluster) with dim
    codegen'd avg aggregates (map-side partial sums: k x dim doubles
    per task on the wire, the minhash_signatures trick). Only the
    k x dim centroid matrix and one SSE scalar ever reach the driver
    per iteration — the sanctioned CC-style convergence traffic, no
    .collect() of data rows. The cluster assignment is the building
    block of SemDeDup-style curation (dedup/diversify within cells)
    and of IVF index builds (sim_ivf_label probes such cells).
    """
    id_col, vec_col = vecs.columns[0], vecs.columns[1]
    v = F.col(vec_col)
    init_rows = vecs.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [list(r[0]) for r in init_rows]
    assigned = None
    sse_hist: list[float] = []
    sumsq = sum((v[i] * v[i] for i in range(dim)), F.lit(0.0))
    for _ in range(iters):
        assigned = vecs.withColumn("cluster", _assign_udf(centroids)(v))
        # ONE aggregation job per iteration: per-cluster counts,
        # per-dimension means, and the sum of squared norms — enough
        # to update centroids AND reconstruct the within-cluster SSE
        # under the just-used centroids driver-side:
        #   SSE_c = sum||x||^2 - 2 n_c c.mean_c + n_c ||c||^2
        stats = (
            assigned.select(
                "cluster",
                sumsq.alias("ss"),
                *[v[i].alias(f"x{i}") for i in range(dim)],
            )
            .groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("ss").alias("ss"),
                *[F.avg(f"x{i}").alias(f"m{i}") for i in range(dim)],
            )
            .collect()
        )
        new_c = list(centroids)  # empty clusters keep previous centroid
        sse = 0.0
        for r in stats:
            c = np.array(centroids[r["cluster"]])
            mean = np.array([r[f"m{i}"] for i in range(dim)])
            sse += r["ss"] - 2.0 * r["n"] * float(c @ mean) + r["n"] * float(c @ c)
            new_c[r["cluster"]] = list(mean)
        sse_hist.append(sse)
        centroids = new_c
    return assigned.select(id_col, "cluster"), centroids, sse_hist


IVF_PROBES = 3
IVF_TRAIN_ITERS = 2


@register(
    "sim_ivf_kmeans",
    oracle=None,  # approximate by design; recall vs brute force in tests
    doc=f"IVF ANN with a TRAINED coarse quantizer: Lloyd k-means "
    f"(k={KMEANS_K}, {IVF_TRAIN_ITERS} iterations) learns the cells "
    "instead of borrowing the label column (sim_ivf_label), queries "
    f"probe the {IVF_PROBES} nearest centroids by the same squared-L2 "
    "metric the assignment used, and candidates re-rank exactly. This "
    "is the real FAISS-style IVF build: at 100 TB the training pass "
    "is a few corpus scans (map-side-combined k x 64 partial sums), "
    "the index write is one repartition by cell, and each query then "
    "reads probes/k of the data. Trained cells track the actual "
    "density — measured recall beats the label-cell variant at equal "
    "probe budget on the synthetic corpus (see tests/test_similarity.py).",
)
def sim_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "embeddings", sf_dir)
    vecs = e.select("vec_id", to_double("embedding").alias("vec"))
    _, centroids, _ = kmeans_fit_assign(vecs, iters=IVF_TRAIN_ITERS)
    # Bin the corpus against the FINAL centroids (not the last Lloyd
    # assignment, which was made against the pre-update centroids):
    # probes rank by the same final centroids, so a probed cell is
    # exactly where near neighbors were binned.
    corpus = vecs.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("vec").alias("nbr_vec"),
        _assign_udf(centroids)(F.col("vec")).alias("cell"),
    )
    cent = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    )
    queries = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("q_vec")
    )
    # probe ranking uses the SAME metric as the Lloyd assignment
    # (squared L2), so a probed cell is exactly where near neighbors
    # were binned; k x N_QUERIES rows -> the fold stays trivial
    d2 = F.aggregate(
        F.zip_with(F.col("q_vec"), F.col("centroid"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w_cell = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("cell"))
    probed = (
        queries.crossJoin(F.broadcast(cent))
        .withColumn("d2", d2)
        .withColumn("cell_rank", F.row_number().over(w_cell))
        .filter(F.col("cell_rank") <= IVF_PROBES)
        .select("query_id", "q_vec", "cell")
    )
    cand = corpus.join(F.broadcast(probed), "cell").filter(F.col("query_id") != F.col("nbr_id"))
    scored = cand.withColumn("cos_sim", F.round(cosine(F.col("q_vec"), F.col("nbr_vec")), 6))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "nbr_id", "cos_sim", "rank")
    )


@register(
    "embedding_kmeans",
    oracle=None,  # ADJUDICATED rows-only (round 11): the centroid
    # update is a float avg whose summation order differs between
    # engines, and a last-ulp centroid wiggle can flip a boundary
    # point's argmin — no SQL twin can be exact. Verified vs a numpy
    # Lloyd reference and via monotone-SSE/determinism properties in
    # tests/test_kmeans.py; the family's hash-checked member is
    # embedding_kmeans_int8 (integer-lattice Lloyd, below).
    doc=f"Distributed Lloyd k-means (k={KMEANS_K}, {KMEANS_ITERS} "
    "iterations, deterministic lowest-id init) assigning every "
    "embedding to a cluster — the partitioning step of SemDeDup-style "
    "semantic dedup and of IVF ANN index builds. Each iteration scans "
    "the corpus once: vectorized numpy assignment UDF + one map-side-"
    "combined groupBy carrying k x 64 partial sums; only the centroid "
    "matrix returns to the driver per iteration.",
)
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "embeddings", sf_dir)
    vecs = e.select("vec_id", to_double("embedding").alias("vec"))
    assigned, _, _ = kmeans_fit_assign(vecs)
    return assigned


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
      FROM embeddings
    ), m AS (
      SELECT vec_id, vd,
             list_max(list_transform(vd, x -> abs(x))) AS mx
      FROM v
    ), s AS (
      SELECT vec_id, vd,
             CASE WHEN mx > 0 THEN 127.0 / mx END AS scale
      FROM m
    )
    SELECT vec_id,
           round(scale, 6) AS scale_q,
           array_to_string(
             list_transform(vd, x -> CAST(CAST(round(x * scale) AS INT) AS VARCHAR)),
             ',') AS codes
    FROM s
    """,
    doc="Per-vector int8 scalar quantization of the embedding column "
    "— the storage/bandwidth compression step before an ANN index or "
    "embedding export ships 100 TB of float vectors (4x smaller, "
    "dot-products reconstructable to ~1/254 relative error via the "
    "stored scale). Symmetric max-abs scheme: scale = 127/max|x|, "
    "code_i = round(x_i * scale). Pure codegen higher-order "
    "expressions, zero shuffle, zero UDF. Hash-checkable because "
    "every step is a single IEEE op from the same float32 inputs "
    "(exact cast to double, one division, one multiply, one "
    "half-away-from-zero round — Spark's and DuckDB's round tie "
    "rule agree, and ties need an exact .5 product which the "
    "division-derived scale cannot hit); codes travel as a CSV "
    "string since the driver's canonicalizer cannot hash array "
    "cells.",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "embeddings", sf_dir)
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    q = (
        e.select("vec_id", vd.alias("vd"))
        .withColumn("mx", F.array_max(F.transform(F.col("vd"), F.abs)))
        .withColumn("scale", F.when(F.col("mx") > 0, F.lit(127.0) / F.col("mx")))
    )
    code = lambda x: F.round(x * F.col("scale")).cast("int").cast("string")  # noqa: E731
    return q.select(
        "vec_id",
        F.round("scale", 6).alias("scale_q"),
        F.array_join(F.transform(F.col("vd"), code), ",").alias("codes"),
    )


# --- product quantization -------------------------------------------

# PQ layout: 64 dims -> PQ_M subspaces of PQ_SUB dims, PQ_K codes per
# subspace => 8 bytes per vector (32x smaller than float32). The
# codebooks are FIXED deterministic integers (seeded PRNG, embedded as
# literals in both engines) — this operator is the ENCODE path; a
# data-trained codebook is the embedding_kmeans family's job and is
# iterative-float by nature (rows-only). Quantizing inputs to int8
# first (scale 127 — odd, so round() can never land on an exact .5
# tie, same argument as embedding_quantize_int8) makes every distance
# an EXACT integer, so the argmin with its code-index tiebreak is
# bit-identical across engines and the whole encode is hash-checkable.
PQ_M = 8
PQ_SUB = 8
PQ_K = 16
PQ_SCALE = 127.0
_pq_rng = random.Random(1427)
_PQ_CB = [
    [[_pq_rng.randint(-64, 63) for _ in range(PQ_SUB)] for _ in range(PQ_K)]
    for _ in range(PQ_M)
]


def _pq_cb_values_sql() -> str:
    rows = ", ".join(
        f"({m}, {k}, {d}, {_PQ_CB[m][k][d]})"
        for m in range(PQ_M)
        for k in range(PQ_K)
        for d in range(PQ_SUB)
    )
    return f"cb(m, k, d, val) AS (VALUES {rows})"


@register(
    "embedding_pq_int8",
    oracle=f"""
    WITH {_pq_cb_values_sql()},
    v AS (
      SELECT vec_id,
             list_transform(
               embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {PQ_SCALE}) AS BIGINT)
             ) AS c
      FROM embeddings
    ),
    u AS (
      SELECT vec_id, g.i - 1 AS dim, c[g.i] AS q
      FROM v, generate_series(1, {PQ_M * PQ_SUB}) AS g(i)
    ),
    pd AS (
      SELECT u.vec_id, cb.m, cb.k,
             sum((u.q - cb.val) * (u.q - cb.val)) AS dist
      FROM u JOIN cb ON cb.m = u.dim // {PQ_SUB} AND cb.d = u.dim % {PQ_SUB}
      GROUP BY u.vec_id, cb.m, cb.k
    ),
    best AS (
      SELECT vec_id, m, k, dist,
             row_number() OVER (
               PARTITION BY vec_id, m ORDER BY dist, k
             ) AS rk
      FROM pd
    )
    SELECT vec_id,
           string_agg(CAST(k AS VARCHAR), ',' ORDER BY m) AS pq_codes,
           CAST(sum(dist) AS BIGINT) AS sq_err
    FROM best WHERE rk = 1
    GROUP BY vec_id
    """,
    doc="Product-quantization encode: each embedding is int8-"
    "quantized, split into 8 subspaces, and each subspace assigned "
    "its nearest of 16 fixed integer codebook entries — 8 bytes per "
    "vector, the memory layout ANN indexes (IVF-PQ) use to hold "
    "billion-vector corpora in RAM. All distances are EXACT integers "
    "(int8 inputs x integer codebooks), so the argmin (numpy's "
    "first-occurrence rule = tie to the lowest code id) hash-checks "
    "against DuckDB evaluating the same codebook literals. Spark "
    "side is an Arrow-batched mapInPandas kernel: one vectorized "
    "(n, M, K, SUB) int64 broadcast-subtract per batch — a pure "
    "per-row map with no shuffle, embarrassingly parallel at any "
    "scale. (A first cut built the 16 candidate structs per "
    "subspace as codegen expressions; the ~4000-node tree fell out "
    "of JIT'd codegen into interpreted eval at ~9 ms/row — the "
    "numpy kernel is ~1000x faster per row and is the shape that "
    "survives billions of vectors.) Rounding half-away-from-zero is "
    "applied explicitly (trunc(x + sign(x)*0.5)) so the int8 codes "
    "match Spark/DuckDB round() bit-for-bit. sq_err (the summed "
    "residual) is the reconstruction-quality monitor a pipeline "
    "tracks per batch.",
)
def embedding_pq_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "embeddings", sf_dir)
    cb = np.asarray(_PQ_CB, dtype=np.int64)  # (M, K, SUB)

    def encode(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            scaled = x * PQ_SCALE
            # round half away from zero (Spark/DuckDB round()); no
            # exact .5 products exist for float32-in x odd 127 scale,
            # but implement the rule exactly anyway.
            c = np.trunc(scaled + np.copysign(0.5, scaled)).astype(np.int64)
            sub = c.reshape(n, PQ_M, 1, PQ_SUB)
            d = sub - cb[None, :, :, :]
            dist = np.einsum("nmks,nmks->nmk", d, d)  # (n, M, K)
            k = dist.argmin(axis=2)  # first occurrence = lowest code
            err = np.take_along_axis(dist, k[:, :, None], axis=2)[:, :, 0]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "pq_codes": [",".join(map(str, row)) for row in k],
                    "sq_err": err.sum(axis=1).astype("int64"),
                }
            )

    return e.select("vec_id", "embedding").mapInPandas(
        encode, schema="vec_id bigint, pq_codes string, sq_err bigint"
    )


# Matryoshka-style truncation study: compare the exact top-1 neighbor
# under full-dimension cosine vs the first-TRUNC_DIM prefix.
TRUNC_DIM = 16
TRUNC_QUERIES = 20


@register(
    "embedding_truncate_recall",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    full_nn AS (
      SELECT query_id, nbr_id AS nbr_full, cos_sim AS cos_full FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
               round(list_cosine_similarity(q.emb, c.emb), 6) AS cos_sim,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(q.emb, c.emb), 6) DESC,
                          c.vec_id) AS rn
        FROM v q JOIN v c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {TRUNC_QUERIES}
      ) WHERE rn = 1
    ),
    tr_nn AS (
      SELECT query_id, nbr_id AS nbr_trunc, cos_sim AS cos_trunc FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
               round(list_cosine_similarity(q.emb[1:{TRUNC_DIM}],
                                            c.emb[1:{TRUNC_DIM}]), 6) AS cos_sim,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(q.emb[1:{TRUNC_DIM}],
                                                       c.emb[1:{TRUNC_DIM}]), 6) DESC,
                          c.vec_id) AS rn
        FROM v q JOIN v c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {TRUNC_QUERIES}
      ) WHERE rn = 1
    )
    SELECT f.query_id, f.nbr_full, f.cos_full, t.nbr_trunc, t.cos_trunc,
           (f.nbr_full = t.nbr_trunc) AS agree
    FROM full_nn f JOIN tr_nn t USING (query_id)
    """,
    doc="Dimension-truncation retrieval study (the Matryoshka / "
    f"short-embedding question): per query, the exact top-1 neighbor "
    f"under full 64-dim cosine vs the first-{TRUNC_DIM}-dims prefix, "
    "with an agreement flag — the measurement you run before "
    "shipping truncated embeddings to cut ANN index cost 4x. One "
    "scored pass computes both similarities (the prefix slice is "
    "free — same Arrow batch), then two argmax windows rank the "
    "per-query candidate lists on (rounded cosine, nbr_id), the "
    "engine-independent total order the sim_* family uses. On this "
    "corpus agreement is ~0 — the honest answer for isotropic random "
    "vectors, where prefix dims carry 1/4 of the energy and no "
    "planted structure survives; real embedding corpora concentrate "
    "information in early dims and score far higher. Scale shape: "
    "queries BROADCAST against the corpus scan exactly like "
    "sim_topk_bruteforce; nothing new shuffles.",
)
def embedding_truncate_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.stage import eager_release

    e = load(spark, "embeddings", sf_dir)
    corpus = e.select(F.col("vec_id").alias("nbr_id"), to_double("embedding").alias("emb"))
    q = e.filter(F.col("vec_id") < TRUNC_QUERIES).select(
        F.col("vec_id").alias("query_id"), to_double("embedding").alias("q_emb")
    )
    scored = (
        corpus.join(F.broadcast(q), F.col("query_id") != F.col("nbr_id"))
        .select(
            "query_id",
            "nbr_id",
            F.round(cosine(F.col("q_emb"), F.col("emb")), 6).alias("cos_full"),
            F.round(
                cosine(F.slice("q_emb", 1, TRUNC_DIM), F.slice("emb", 1, TRUNC_DIM)), 6
            ).alias("cos_trunc"),
        )
        .persist()
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("cos_full").desc(), F.col("nbr_id"))
    wt = Window.partitionBy("query_id").orderBy(F.col("cos_trunc").desc(), F.col("nbr_id"))
    full_nn = (
        scored.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("nbr_id").alias("nbr_full"), "cos_full")
    )
    tr_nn = (
        scored.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("nbr_id").alias("nbr_trunc"), "cos_trunc")
    )
    out = full_nn.join(tr_nn, "query_id").select(
        "query_id",
        "nbr_full",
        "cos_full",
        "nbr_trunc",
        "cos_trunc",
        (F.col("nbr_full") == F.col("nbr_trunc")).alias("agree"),
    )
    return eager_release(out, "truncate_recall", scored)


# Hybrid retrieval: Reciprocal Rank Fusion of the lexical (BM25) and
# vector (cosine) rankings. RRF_K is the standard 60.
RRF_K = 60
RRF_TERM = "merge"
RRF_QUERY_VEC = 0
RRF_TOP = 20


@register(
    "sim_hybrid_rrf",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dlen FROM d),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(dlen) AS BIGINT) AS total_len FROM dl),
    tf AS (
      SELECT d.doc_id,
             CAST(len(list_filter(d.t, x -> x = '{RRF_TERM}')) AS BIGINT) AS tf
      FROM d
    ),
    df AS (SELECT CAST(count(*) AS BIGINT) AS df FROM tf WHERE tf > 0),
    lex AS (
      SELECT doc_id, row_number() OVER (ORDER BY
               round(ln((CAST(s.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dlen
                  / (CAST(s.total_len AS DOUBLE) / s.n_docs))), 6)
               DESC, doc_id) AS rank_lex
      FROM tf JOIN dl USING (doc_id), stats s, df
      WHERE tf.tf > 0
    ),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    vec AS (
      SELECT c.vec_id AS doc_id,
             row_number() OVER (ORDER BY
               round(list_cosine_similarity(q.emb, c.emb), 6) DESC, c.vec_id)
               AS rank_vec
      FROM v q JOIN v c ON q.vec_id = {RRF_QUERY_VEC} AND c.vec_id <> {RRF_QUERY_VEC}
    ),
    fused AS (
      SELECT coalesce(l.doc_id, ve.doc_id) AS doc_id, l.rank_lex, ve.rank_vec,
             round(coalesce(1.0 / ({RRF_K} + l.rank_lex), 0.0)
                   + coalesce(1.0 / ({RRF_K} + ve.rank_vec), 0.0), 9) AS rrf
      FROM lex l FULL OUTER JOIN vec ve ON l.doc_id = ve.doc_id
    )
    SELECT doc_id, rank_lex, rank_vec, rrf, fused_rank FROM (
      SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id) AS fused_rank
      FROM fused
    ) WHERE fused_rank <= {RRF_TOP}
    """,
    doc="Hybrid retrieval by Reciprocal Rank Fusion (k="
    f"{RRF_K}): the BM25 lexical ranking for '{RRF_TERM}' and the "
    "exact-cosine vector ranking for a query embedding are fused as "
    "sum(1/(k+rank)) over a FULL OUTER join of the two lists — the "
    "production pattern for combining keyword and semantic search "
    "(text_bm25_topk and sim_topk_bruteforce are the halves; this is "
    "the fusion operator both feed, rank-based so no score "
    "calibration between the two systems is ever needed). Both input "
    "rankings order by ROUNDED scores with id tiebreaks (the sim_* "
    "determinism convention); RRF itself is integer-rank arithmetic "
    "in one identical expression tree. The fused table is "
    "candidate-list sized — at 100 TB each ranking is its family's "
    "posting/probe pipeline and the fusion is a tiny join of top-N "
    "lists.",
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import BM25_B, BM25_K1
    from ..functions.text import tokens

    d = load(spark, "documents", sf_dir)
    toks = d.select("doc_id", tokens("text").alias("t"))
    tfd = toks.select(
        "doc_id",
        F.size("t").cast("bigint").alias("dlen"),
        F.size(F.filter(F.col("t"), lambda x: x == F.lit(RRF_TERM)))
        .cast("bigint")
        .alias("tf"),
    ).persist()
    stats = tfd.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dlen").cast("bigint").alias("total_len"),
    )
    postings = tfd.filter(F.col("tf") > 0)
    dfc = postings.agg(F.count(F.lit(1)).cast("bigint").alias("df"))
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
    wl = Window.orderBy(F.col("bm25").desc(), "doc_id")
    lex = (
        postings.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(dfc))
        .withColumn("bm25", score)
        .select("doc_id", F.row_number().over(wl).alias("rank_lex"))
    )
    e = load(spark, "embeddings", sf_dir)
    corpus = e.filter(F.col("vec_id") != RRF_QUERY_VEC).select(
        F.col("vec_id").alias("doc_id"), to_double("embedding").alias("emb")
    )
    qv = e.filter(F.col("vec_id") == RRF_QUERY_VEC).select(
        to_double("embedding").alias("q_emb")
    )
    wv = Window.orderBy(F.col("cos").desc(), "doc_id")
    vec = (
        corpus.crossJoin(F.broadcast(qv))
        .withColumn("cos", F.round(cosine(F.col("q_emb"), F.col("emb")), 6))
        .select("doc_id", F.row_number().over(wv).alias("rank_vec"))
    )
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        "rank_lex",
        "rank_vec",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_lex")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_vec")), F.lit(0.0)),
            9,
        ).alias("rrf"),
    )
    wf = Window.orderBy(F.col("rrf").desc(), "doc_id")
    out = (
        fused.withColumn("fused_rank", F.row_number().over(wf))
        .filter(F.col("fused_rank") <= RRF_TOP)
        .select("doc_id", "rank_lex", "rank_vec", "rrf", "fused_rank")
    )
    from ..plans.stage import eager_release

    return eager_release(out, "hybrid_rrf", tfd)


# Pairwise-cosine geometry histogram over a deterministic id-bounded
# sample of the corpus (all pairs among the first COS_HIST_IDS ids).
COS_HIST_IDS = 100
COS_HIST_BIN = 0.05


@register(
    "embedding_cosine_histogram",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings WHERE vec_id < {COS_HIST_IDS}
    ),
    p AS (
      SELECT round(list_cosine_similarity(a.emb, b.emb), 6) AS cos
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT CAST(floor(cos / {COS_HIST_BIN}) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           round(min(cos), 6) AS lo,
           round(max(cos), 6) AS hi
    FROM p GROUP BY 1
    """,
    doc="Embedding-geometry diagnostic: the distribution of pairwise "
    f"cosines over a deterministic sample (all pairs among vec_id < "
    f"{COS_HIST_IDS}), binned at {COS_HIST_BIN} — the measurement "
    "that EXPLAINS the similarity family's recall numbers before "
    "anyone tunes an index: on this corpus the mass sits near 0 with "
    "thin tails (isotropic random vectors), which is exactly why SRP "
    "bands operate at ~0.75 recall and IVF label cells at ~0.5 — "
    "there is no cluster structure to exploit, and a real embedding "
    "corpus shows a bimodal histogram instead. The id bound makes "
    "the O(k^2) pair sample deterministic and scale-independent "
    "(same ids at every SF); cosines round before binning so the bin "
    "edge can never flip cross-engine; bins aggregate "
    "map-side-combined.",
)
def embedding_cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "embeddings", sf_dir)
    v = e.filter(F.col("vec_id") < COS_HIST_IDS).select(
        "vec_id", to_double("embedding").alias("emb")
    )
    a = v.select(F.col("vec_id").alias("ida"), F.col("emb").alias("ea"))
    b = v.select(F.col("vec_id").alias("idb"), F.col("emb").alias("eb"))
    pairs = a.join(F.broadcast(b), F.col("ida") < F.col("idb")).select(
        F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("cos")
    )
    return pairs.groupBy(
        F.floor(F.col("cos") / COS_HIST_BIN).cast("bigint").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.min("cos"), 6).alias("lo"),
        F.round(F.max("cos"), 6).alias("hi"),
    )


@register(
    "sim_recall_report",
    oracle=f"""
    WITH planes(idx, plane) AS (VALUES {_PLANES_SQL}),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    bits AS (
      SELECT v.vec_id, p.idx,
             CASE WHEN list_dot_product(v.emb, p.plane) > 0 THEN 1 ELSE 0 END AS bit
      FROM v, planes p
    ),
    bands AS (
      SELECT vec_id, idx // {N_PLANES // LSH_BANDS} AS band_idx,
             CAST(sum(bit << (idx % {N_PLANES // LSH_BANDS})) AS INT) AS band_key
      FROM bits GROUP BY vec_id, idx // {N_PLANES // LSH_BANDS}
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS nbr_id
      FROM bands q JOIN bands c USING (band_idx, band_key)
      WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    ann AS (
      SELECT query_id, nbr_id FROM (
        SELECT cand.query_id, cand.nbr_id,
               row_number() OVER (PARTITION BY cand.query_id ORDER BY
                 round(list_cosine_similarity(qe.emb, ce.emb), 6) DESC,
                 cand.nbr_id) AS rn
        FROM cand JOIN v qe ON qe.vec_id = cand.query_id
                  JOIN v ce ON ce.vec_id = cand.nbr_id
      ) WHERE rn <= {TOP_K}
    ),
    exact AS (
      SELECT query_id, nbr_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 round(list_cosine_similarity(q.emb, c.emb), 6) DESC,
                 c.vec_id) AS rn
        FROM v q JOIN v c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {N_QUERIES}
      ) WHERE rn <= {TOP_K}
    )
    SELECT e.query_id,
           CAST(count(a.nbr_id) AS BIGINT) AS n_hit,
           CAST({TOP_K} AS BIGINT) AS k,
           round(CAST(count(a.nbr_id) AS DOUBLE) / {TOP_K}, 6) AS recall_at_k
    FROM exact e LEFT JOIN ann a USING (query_id, nbr_id)
    GROUP BY e.query_id
    """,
    doc="Recall@k of the SRP-LSH index against exact brute force, per "
    "query, AS A QUERY — the evaluation every ANN deployment runs "
    "before trusting an index, promoted from a pytest bound "
    "(tests/test_similarity.py pins the corpus-level number) to a "
    "first-class, oracle-checked operator: both rankings are already "
    "SQL-mirrored (literal hyperplanes for the LSH, raw cosines for "
    "the baseline), so their INTERSECTION is hash-checkable too. "
    "Measured honestly on this isotropic corpus the per-query recall "
    "scatters around ~0.75 (embedding_cosine_histogram shows why). "
    "Composition shape: exact top-k LEFT JOIN ann top-k on (query, "
    "neighbor), hit count over k — both lists are k-row-per-query "
    "tiny; at 100 TB the expensive halves are the family's own "
    "pipelines and this report is a free join on their outputs.",
)
def sim_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    specs_ann = sim_ann_lsh(spark, sf_dir).select("query_id", "nbr_id")
    specs_exact = sim_topk_bruteforce(spark, sf_dir).select("query_id", "nbr_id")
    hit = specs_exact.join(specs_ann, ["query_id", "nbr_id"], "left_semi")
    n_hit = hit.groupBy("query_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    base = specs_exact.select("query_id").distinct()
    return (
        base.join(n_hit, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("bigint").alias("n_hit"),
            F.lit(TOP_K).cast("bigint").alias("k"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double") / TOP_K, 6
            ).alias("recall_at_k"),
        )
    )


# MMR re-ranking: greedy maximal-marginal-relevance diversification of
# the top-MMR_CAND cosine candidates, MMR_K selections per query.
# Scores are micro-quantized cosines (round(cos * 1e6) as BIGINT) and
# the objective is integer: mmr10 = 7 * rel_q - 3 * max_sim_q
# (lambda = 0.7 scaled by 10) — greedy argmax ties break on nbr_id,
# so the selection sequence is exact integer arithmetic end to end
# and hash-checks cross-engine (the agg_hll/int8 quantization-twin
# discipline applied to an ITERATIVE algorithm).
MMR_QUERIES = N_QUERIES
MMR_CAND = 30
MMR_K = 10


def _mmr_iter_ctes() -> str:
    # every all{t} is MATERIALIZED: it is referenced three times by
    # level t+1, and DuckDB's default CTE inlining would otherwise
    # expand the reference chain exponentially in MMR_K (the same
    # blowup the Spark side avoids with checkpoint rotation)
    its = []
    for t in range(2, MMR_K + 1):
        its.append(f"""
    pen{t} AS (
      SELECT c.query_id, c.nbr_id, c.rel_q, CAST(max(ps.sim_q) AS BIGINT) AS pen
      FROM cand c
      JOIN ps ON ps.query_id = c.query_id AND ps.a_id = c.nbr_id
      JOIN all{t - 1} s ON s.query_id = ps.query_id AND s.nbr_id = ps.b_id
      WHERE NOT EXISTS (SELECT 1 FROM all{t - 1} x
                        WHERE x.query_id = c.query_id AND x.nbr_id = c.nbr_id)
      GROUP BY 1, 2, 3
    ),
    sel{t} AS (
      SELECT query_id, nbr_id, rel_q, pen, {t} AS step
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY 7 * rel_q - 3 * pen DESC, nbr_id) AS rn
            FROM pen{t})
      WHERE rn = 1
    ),
    all{t} AS MATERIALIZED (SELECT * FROM all{t - 1}
               UNION ALL
               SELECT query_id, nbr_id, rel_q, pen, step FROM sel{t})""")
    return ",".join(its)


@register(
    "sim_mmr_rerank",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {MMR_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
             CAST(round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                        CAST(c.embedding AS DOUBLE[])) * 1e6) AS BIGINT) AS rel_q
      FROM q JOIN embeddings c ON c.vec_id <> q.vec_id
    ),
    cand AS MATERIALIZED (
      SELECT query_id, nbr_id, rel_q
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY rel_q DESC, nbr_id) AS rn FROM scored)
      WHERE rn <= {MMR_CAND}
    ),
    ps AS MATERIALIZED (
      SELECT a.query_id, a.nbr_id AS a_id, b.nbr_id AS b_id,
             CAST(round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                        CAST(eb.embedding AS DOUBLE[])) * 1e6) AS BIGINT) AS sim_q
      FROM cand a
      JOIN cand b ON a.query_id = b.query_id AND a.nbr_id <> b.nbr_id
      JOIN embeddings ea ON ea.vec_id = a.nbr_id
      JOIN embeddings eb ON eb.vec_id = b.nbr_id
    ),
    sel1 AS (
      SELECT query_id, nbr_id, rel_q, CAST(0 AS BIGINT) AS pen, 1 AS step
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY rel_q DESC, nbr_id) AS rn FROM cand)
      WHERE rn = 1
    ),
    all1 AS (SELECT * FROM sel1),
    {_mmr_iter_ctes()}
    SELECT query_id, CAST(step AS BIGINT) AS step, nbr_id, rel_q, pen,
           (7 * rel_q - 3 * pen) AS mmr10
    FROM all{MMR_K}
    """,
    doc=f"Maximal Marginal Relevance re-ranking: from each query's top-"
    f"{MMR_CAND} cosine candidates, greedily select {MMR_K} results "
    "maximizing 0.7*relevance - 0.3*max-similarity-to-already-chosen "
    "— the diversification pass a RAG retriever runs between ANN "
    "retrieval (sim_ann_lsh / sim_hybrid_rrf produce the candidates) "
    "and the context window, so near-duplicate passages don't crowd "
    "out coverage. Greedy MMR is inherently sequential in K, so the "
    "scalable formulation fixes K and unrolls: each step is one "
    "anti-join (drop selected), one equi-join + map-side max against "
    "the candidate-pairs table, and a per-query WindowGroupLimit "
    "argmax — all on CANDIDATE-sized data (queries x 30 rows); the "
    "corpus is touched only by the initial top-k scan. Per-step "
    "frames persist and release (the iterative-frontier rule). "
    "Quantized-integer objective => bit-stable greedy path, same "
    "K-unrolled-oracle discipline as graph_pagerank.",
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.stage import eager_release

    corpus, queries = _corpus_and_queries(spark, sf_dir)
    rel_q = F.round(cosine(F.col("q_vec"), F.col("nbr_vec")) * 1e6, 0).cast("long")
    scored = corpus.join(F.broadcast(queries), F.col("query_id") != F.col("nbr_id")).select(
        "query_id", "nbr_id", rel_q.alias("rel_q"), "nbr_vec"
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("rel_q").desc(), "nbr_id")
    cand = (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= MMR_CAND)
        .select("query_id", "nbr_id", "rel_q", "nbr_vec")
        .persist()
    )
    ca = cand.select("query_id", F.col("nbr_id").alias("a_id"), F.col("nbr_vec").alias("va"))
    cb = cand.select("query_id", F.col("nbr_id").alias("b_id"), F.col("nbr_vec").alias("vb"))
    sim_q = F.round(cosine(F.col("va"), F.col("vb")) * 1e6, 0).cast("long")
    ps = (
        ca.join(cb, "query_id")
        .filter(F.col("a_id") != F.col("b_id"))
        .select("query_id", "a_id", "b_id", sim_q.alias("sim_q"))
        .persist()
    )
    # Iterative state (query_id, nbr_id, rel_q, pen, step): pen is the
    # INCREMENTAL max-similarity-to-selected (max over a growing set
    # == fold of pairwise maxes, exact on integers; NULL until the
    # first update so negative cosines are never floored at 0), step
    # the selection round (NULL = unselected). The state is
    # checkpoint-ROTATED each round (merge_components' idiom): each
    # level is referenced twice by the next, so a lazy chain would
    # grow the logical plan exponentially in MMR_K.
    from ..plans.stage import (
        drop_checkpoint_dir,
        eager_release,
        stage_checkpoint_with_path,
    )

    state = cand.select(
        "query_id",
        "nbr_id",
        "rel_q",
        F.lit(None).cast("bigint").alias("pen"),
        F.lit(None).cast("int").alias("step"),
    )
    path, state = stage_checkpoint_with_path(state, "mmr_state")
    for t in range(1, MMR_K + 1):
        objective = (
            F.col("rel_q")
            if t == 1
            else (7 * F.col("rel_q") - 3 * F.col("pen"))
        )
        wsel = Window.partitionBy("query_id").orderBy(objective.desc(), "nbr_id")
        winner = (
            state.filter(F.col("step").isNull())
            .withColumn("rn", F.row_number().over(wsel))
            .filter(F.col("rn") == 1)
            .select("query_id", F.col("nbr_id").alias("w_nbr"))
        )
        sim_w = ps.join(
            F.broadcast(winner),
            (ps["query_id"] == winner["query_id"]) & (ps["b_id"] == F.col("w_nbr")),
        ).select(ps["query_id"], F.col("a_id").alias("nbr_id"), F.col("sim_q").alias("sim_w"))
        state = (
            state.join(F.broadcast(winner), "query_id", "left")
            .join(F.broadcast(sim_w), ["query_id", "nbr_id"], "left")
            .select(
                "query_id",
                "nbr_id",
                "rel_q",
                F.when(F.col("step").isNotNull(), F.col("pen"))
                .otherwise(F.greatest(F.col("pen"), F.col("sim_w")))
                .alias("pen"),
                F.when(F.col("step").isNotNull(), F.col("step"))
                .when(F.col("nbr_id") == F.col("w_nbr"), F.lit(t))
                .alias("step"),
            )
        )
        new_path, state = stage_checkpoint_with_path(state, f"mmr_state_{t}")
        drop_checkpoint_dir(state.sparkSession, path)
        path = new_path
    pen0 = F.coalesce(F.col("pen"), F.lit(0)).cast("bigint")
    out = state.filter(F.col("step").isNotNull()).select(
        "query_id",
        F.col("step").cast("bigint").alias("step"),
        "nbr_id",
        "rel_q",
        pen0.alias("pen"),
        (7 * F.col("rel_q") - 3 * pen0).cast("bigint").alias("mmr10"),
    )
    out = eager_release(out, "mmr_rerank", cand, ps)
    drop_checkpoint_dir(out.sparkSession, path)
    return out


# Binary quantization: the 64-dim embedding packs into two 32-bit
# sign-bit words (two BIGINTs, never one: bit 63 would overflow
# signed 64 in exact arithmetic) and similarity becomes popcount of
# XOR — 32x less data movement than float32 vectors and integer ops
# instead of dot products, the currently standard first-stage filter
# for billion-vector retrieval.
BQ_TOP_K = TOP_K


def _bq_word_spark(col: str, lo: int) -> F.Column:
    return F.expr(
        f"aggregate(sequence(0, 31), 0L, (acc, i) -> acc +"
        f" IF(element_at({col}, i + {lo} + 1) > 0, shiftleft(1L, i), 0L))"
    )


def _bq_word_sql(col: str, lo: int) -> str:
    return (
        f"list_aggregate([CASE WHEN {col}[i + {lo} + 1] > 0"
        f" THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END"
        f" for i in range(0, 32)], 'sum')"
    )


@register(
    "embedding_binary_hamming",
    oracle=f"""
    WITH bq AS (
      SELECT vec_id, embedding,
             {_bq_word_sql("embedding", 0)} AS h1,
             {_bq_word_sql("embedding", 32)} AS h2
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
             CAST(bit_count(xor(q.h1, c.h1)) + bit_count(xor(q.h2, c.h2))
               AS BIGINT) AS hamming,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                   CAST(c.embedding AS DOUBLE[])), 6) AS cos_sim
      FROM bq q JOIN bq c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
    )
    SELECT query_id, nbr_id, hamming, cos_sim, rn AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY hamming, nbr_id) AS rn FROM scored)
    WHERE rn <= {BQ_TOP_K}
    """,
    doc="Binary-quantized retrieval: sign-bit packing (see the "
    "two-word comment above) and exact Hamming top-k per query via "
    "popcount-of-XOR, with the float cosine attached for calibration "
    "— the 1-bit little sibling of embedding_quantize_int8 and the "
    "standard coarse stage before exact re-ranking. Sign bits are "
    "exact comparisons on identical floats, the packing is exact "
    "integer arithmetic, and Hamming is integer — hash-checkable "
    "with no rounding contract at all. Plan: the packing is one "
    "projection (64 -> 16 bytes per vector at rest); the query set "
    "broadcasts as in sim_topk_bruteforce (sanctioned query-dim "
    "loop); at 100 TB the packed words ALSO bucket by a word prefix "
    "for sub-linear candidate generation (the simhash band table "
    "already implements exactly that shape).",
)
def embedding_binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "embeddings", sf_dir).select(
        "vec_id",
        to_double("embedding").alias("vec"),
        _bq_word_spark("embedding", 0).alias("h1"),
        _bq_word_spark("embedding", 32).alias("h2"),
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("q_vec"),
        F.col("h1").alias("q1"),
        F.col("h2").alias("q2"),
    )
    scored = e.join(F.broadcast(q), F.col("query_id") != F.col("vec_id")).select(
        "query_id",
        F.col("vec_id").alias("nbr_id"),
        (
            F.bit_count(F.col("q1").bitwiseXOR(F.col("h1")))
            + F.bit_count(F.col("q2").bitwiseXOR(F.col("h2")))
        )
        .cast("bigint")
        .alias("hamming"),
        F.round(cosine(F.col("q_vec"), F.col("vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "nbr_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BQ_TOP_K)
        .select("query_id", "nbr_id", "hamming", "cos_sim", "rank")
    )


# Greedy k-center (farthest-point traversal) coreset: seed at vec_id
# 0, then repeatedly add the point whose distance to the selected set
# is LARGEST — the classic 2-approximation diversity sampler used to
# pick geometrically-covering training subsets (the opposite pull of
# sample_weighted's quality bias). Distance = quantized integer
# cosine distance 1e6 - round(cos * 1e6), so the greedy path is exact
# integer arithmetic like sim_mmr_rerank's.
KCENTER_K = 8


def _kcenter_iter_ctes() -> str:
    its = []
    for t in range(2, KCENTER_K + 1):
        its.append(f"""
    mind{t} AS (
      SELECT c.vec_id,
             CAST(min(1000000 - CAST(round(list_cosine_similarity(
               CAST(c.embedding AS DOUBLE[]), CAST(s.embedding AS DOUBLE[]))
               * 1e6) AS BIGINT)) AS BIGINT) AS mind_q
      FROM embeddings c
      JOIN all{t - 1} a ON a.vec_id <> c.vec_id
      JOIN embeddings s ON s.vec_id = a.vec_id
      WHERE NOT EXISTS (SELECT 1 FROM all{t - 1} x WHERE x.vec_id = c.vec_id)
      GROUP BY c.vec_id
    ),
    sel{t} AS (
      SELECT vec_id, mind_q, {t} AS step
      FROM (SELECT *, row_number() OVER (ORDER BY mind_q DESC, vec_id)
              AS rn FROM mind{t})
      WHERE rn = 1
    ),
    all{t} AS MATERIALIZED (SELECT * FROM all{t - 1}
               UNION ALL SELECT vec_id, mind_q, step FROM sel{t})""")
    return ",".join(its)


@register(
    "sample_kcenter_coreset",
    oracle=f"""
    WITH all1 AS MATERIALIZED (
      SELECT vec_id, CAST(0 AS BIGINT) AS mind_q, 1 AS step
      FROM embeddings WHERE vec_id = 0
    ),
    {_kcenter_iter_ctes()}
    SELECT CAST(step AS BIGINT) AS step, vec_id, mind_q
    FROM all{KCENTER_K}
    """,
    doc=f"Greedy k-center coreset selection, K = {KCENTER_K} (see the "
    "constant comment): each step is one broadcast of the single new "
    "center against the corpus, an exact integer distance, and an "
    "incremental MIN fold into per-point state — so K steps cost K "
    "corpus passes (the known price of farthest-point traversal; "
    "at 100 TB each pass is embarrassingly parallel and the state "
    "is one bigint per point). Per-step state checkpoint-rotates "
    "(sim_mmr_rerank's rule) and the oracle unrolls K MATERIALIZED "
    "CTE levels recomputing min-to-selected per level — same greedy "
    "path bit for bit, argmax ties on vec_id.",
)
def sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.stage import (
        drop_checkpoint_dir,
        eager_release,
        stage_checkpoint_with_path,
    )

    emb = (
        load(spark, "embeddings", sf_dir)
        .select("vec_id", to_double("embedding").alias("vec"))
        .persist()
    )
    state = emb.select(
        "vec_id",
        F.lit(None).cast("bigint").alias("mind_q"),
        F.lit(None).cast("int").alias("step"),
    )
    path, state = stage_checkpoint_with_path(state, "kcenter_state")
    for t in range(1, KCENTER_K + 1):
        if t == 1:
            winner = state.filter(F.col("vec_id") == 0).select(
                F.col("vec_id").alias("w_id")
            )
        else:
            wsel = Window.orderBy(F.col("mind_q").desc(), "vec_id")
            winner = (
                state.filter(F.col("step").isNull())
                .withColumn("rn", F.row_number().over(wsel))
                .filter(F.col("rn") == 1)
                .select(F.col("vec_id").alias("w_id"))
            )
        wvec = emb.join(
            F.broadcast(winner), emb["vec_id"] == F.col("w_id")
        ).select("w_id", F.col("vec").alias("w_vec"))
        d_q = (
            F.lit(1000000)
            - F.round(cosine(F.col("vec"), F.col("w_vec")) * 1e6, 0).cast("long")
        ).cast("bigint")
        state = (
            state.join(emb, "vec_id")
            .crossJoin(F.broadcast(wvec))
            .select(
                "vec_id",
                F.when(
                    F.col("step").isNotNull() | (F.col("vec_id") == F.col("w_id")),
                    F.col("mind_q"),
                )
                .otherwise(F.least(F.col("mind_q"), d_q))
                .alias("mind_q"),
                F.when(F.col("step").isNotNull(), F.col("step"))
                .when(F.col("vec_id") == F.col("w_id"), F.lit(t))
                .alias("step"),
            )
        )
        new_path, state = stage_checkpoint_with_path(state, f"kcenter_{t}")
        drop_checkpoint_dir(state.sparkSession, path)
        path = new_path
    out = state.filter(F.col("step").isNotNull()).select(
        F.col("step").cast("bigint").alias("step"),
        "vec_id",
        F.coalesce(F.col("mind_q"), F.lit(0)).cast("bigint").alias("mind_q"),
    )
    out = eager_release(out, "kcenter", emb)
    drop_checkpoint_dir(out.sparkSession, path)
    return out


# --- two-stage retrieval cascade (round 10) ---------------------------

CASCADE_COARSE_C = 32  # coarse hamming candidates per query
CASCADE_K = 10  # final reranked top-k


@register(
    "sim_cascade_rerank",
    oracle=f"""
    WITH bq AS (
      SELECT vec_id, embedding,
             {_bq_word_sql("embedding", 0)} AS h1,
             {_bq_word_sql("embedding", 32)} AS h2
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
             CAST(bit_count(xor(q.h1, c.h1)) + bit_count(xor(q.h2, c.h2))
               AS BIGINT) AS hamming,
             CAST(round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                   CAST(c.embedding AS DOUBLE[])) * 1e6) AS BIGINT) AS qcos
      FROM bq q JOIN bq c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
    ),
    coarse AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY hamming, nbr_id) AS coarse_rank
      FROM scored QUALIFY coarse_rank <= {CASCADE_COARSE_C}
    )
    SELECT query_id, nbr_id, hamming, coarse_rank,
           round(qcos / 1e6, 6) AS cos_sim, rn AS final_rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY qcos DESC, nbr_id) AS rn FROM coarse)
    WHERE rn <= {CASCADE_K}
    """,
    doc="Two-stage retrieval cascade — THE production ANN serving "
    "shape: a cheap coarse stage (packed sign-bit Hamming, "
    "embedding_binary_hamming's 16-byte representation) proposes "
    f"{CASCADE_COARSE_C} candidates per query, then an exact cosine "
    f"rerank keeps the top {CASCADE_K}. At 100 TB the coarse stage "
    "reads 64x less than float vectors and the expensive exact "
    "metric prices per CANDIDATE (C per query, a constant), never "
    "per corpus row — the same bound-the-verify argument as "
    "fuzzy_match_damerau's blocking. Rerank order uses the micro-"
    "quantized integer cosine (the MMR/k-center discipline) with an "
    "nbr_id total tiebreak, so both stages are exact-arithmetic "
    "deterministic; cos_sim is rendered from the SAME integer the "
    "ordering used, never a second float path. Query set broadcasts "
    "(sanctioned query-dimension loop, one entry).",
)
def sim_cascade_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "embeddings", sf_dir).select(
        "vec_id",
        to_double("embedding").alias("vec"),
        _bq_word_spark("embedding", 0).alias("h1"),
        _bq_word_spark("embedding", 32).alias("h2"),
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("q_vec"),
        F.col("h1").alias("q1"),
        F.col("h2").alias("h2q"),
    )
    # Coarse stage carries ONLY the 16-byte signatures through the
    # scoring join and the top-C window shuffle — never the float
    # vectors, and the exact cosine is NOT in this projection (round-10
    # advice: pricing it here evaluated the expensive metric for every
    # query x corpus pair, defeating the cascade's cost model).
    scored = e.drop("vec").join(
        F.broadcast(q.drop("q_vec")), F.col("query_id") != F.col("vec_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("nbr_id"),
        (
            F.bit_count(F.col("q1").bitwiseXOR(F.col("h1")))
            + F.bit_count(F.col("h2q").bitwiseXOR(F.col("h2")))
        )
        .cast("bigint")
        .alias("hamming"),
    )
    wc = Window.partitionBy("query_id").orderBy("hamming", "nbr_id")
    coarse = (
        scored.withColumn("coarse_rank", F.row_number().over(wc))
        .filter(F.col("coarse_rank") <= CASCADE_COARSE_C)
    )
    # Exact stage: join the C survivors per query back to their float
    # vectors, so the cosine runs on C x |queries| rows — a constant
    # per query — instead of the full corpus.
    exact = coarse.join(
        e.select(F.col("vec_id").alias("nbr_id"), F.col("vec").alias("n_vec")),
        "nbr_id",
    ).join(F.broadcast(q.select("query_id", "q_vec")), "query_id").withColumn(
        "qcos",
        F.round(cosine(F.col("q_vec"), F.col("n_vec")) * F.lit(1e6)).cast("bigint"),
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("qcos").desc(), "nbr_id")
    return (
        exact.withColumn("final_rank", F.row_number().over(wf))
        .filter(F.col("final_rank") <= CASCADE_K)
        .select(
            "query_id",
            "nbr_id",
            "hamming",
            "coarse_rank",
            F.round(F.col("qcos") / F.lit(1e6), 6).alias("cos_sim"),
            "final_rank",
        )
    )


# --- integer-lattice Lloyd k-means (round 11) --------------------------
#
# embedding_kmeans (above) is honest float Lloyd and stays rows-only:
# its centroid update is a float avg whose summation ORDER differs
# between Spark and any oracle engine, and a last-ulp centroid wiggle
# can flip the argmin of a boundary point — no SQL twin can be exact.
# This is the hash-checked member of the family (round-10 verdict
# item 6): quantize codes to the int8 lattice (round(x*127) — the
# embedding_quantize_int8 exactness argument), and round every
# centroid update BACK to the integer lattice, so distances,
# comparisons, and updates are all exact integer arithmetic that
# Spark, DuckDB, and the numpy reference reproduce bit-for-bit.
# K-means on quantized codes is also exactly what an IVF coarse
# quantizer over PQ/int8-compressed storage does at 100 TB — the
# variant is production-shaped, not just oracle-friendly.

KMEANS_I8_ITERS = 3
_I8_SHIFT = 127  # codes in [-127,127] shift to [0,254]: floor == trunc


def _i8_codes(e: DataFrame) -> DataFrame:
    q = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * _I8_SHIFT).cast("bigint"),
    )
    return e.select("vec_id", q.alias("q"))


def _i8_round_mean(s: int, n: int) -> int:
    """Half-away-from-zero integer mean via the shifted-non-negative
    trick: (2*(s + 127n) + n) // (2n) - 127 — truncating and flooring
    division agree on non-negatives, so Spark/DuckDB/Python concur."""
    return (2 * (s + _I8_SHIFT * n) + n) // (2 * n) - _I8_SHIFT


def _i8_assign(codes: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Nearest integer centroid, ties to the lowest cluster index, via
    the family's Arrow-vectorized assignment (_assign_udf: one
    n x d @ d x k matmul per batch). STILL exact: codes and centroids
    are integers <= 254, so ||c||^2 and every partial sum of the
    2 x*c products are integers far below 2^53 — float64 represents
    each intermediate exactly, BLAS summation order cannot matter,
    and np.argmin's first-minimum rule is array_position's tie rule.
    (A codegen k x dim literal squared-diff formulation was tried
    first and benched 5x slower than float Lloyd per iteration: 512
    expanded terms blow the JIT method budget and fall back to
    interpreted per-row eval — the Arrow matmul is the right shape,
    exactly as it is for the float variant.)"""
    return codes.withColumn(
        "cluster", _assign_udf(centroids)(F.col("q")).cast("bigint")
    )


def kmeans_int8_fit_assign(
    codes: DataFrame, k: int = KMEANS_K, iters: int = KMEANS_I8_ITERS
) -> tuple[DataFrame, list[list[int]]]:
    """Lloyd on the int8 lattice over an (id, q bigint[]) frame.

    Same scale shape as kmeans_fit_assign: each iteration is ONE
    corpus scan (codegen assignment + a map-side-combined groupBy of
    dim integer sums); only the k x dim centroid matrix reaches the
    driver per iteration. Deterministic end to end: lowest-id init,
    first-minimum argmin, half-away-from-zero lattice rounding, empty
    clusters keep their previous centroid."""
    id_col = codes.columns[0]
    init = codes.orderBy(id_col).limit(k).select("q").collect()
    centroids = [list(r[0]) for r in init]
    assigned = None
    for _ in range(iters):
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
    return assigned.select(id_col, "cluster"), centroids


def _i8_lloyd_ctes(k: int, iters: int) -> list[str]:
    """The unrolled exact-integer Lloyd as DuckDB CTE parts (shared by
    the k-means oracle and the IVF-int8 oracle): per iteration one
    cross join against the k-row centroid table (argmin via
    row_number with the cluster tiebreak), one per-dim integer-sum
    update re-rounded to the lattice, empty clusters inheriting the
    previous centroid. The final assignment CTE is a{iters}; the
    centroids that PRODUCED it are cent{iters-1}."""
    parts = [
        f"""pts AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {_I8_SHIFT}) AS BIGINT)) AS q
      FROM embeddings
    ),
    cent0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, q AS cv
      FROM pts ORDER BY vec_id LIMIT {k}
    )"""
    ]
    for t in range(1, iters + 1):
        prev = f"cent{t - 1}"
        parts.append(
            f"""a{t} AS (
      SELECT vec_id, cluster FROM (
        SELECT p.vec_id, c.cluster,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY list_sum(list_transform(range(1, {_DIM + 1}),
                          i -> (p.q[i] - c.cv[i]) * (p.q[i] - c.cv[i]))),
                          c.cluster) AS rn
        FROM pts p CROSS JOIN {prev} c)
      WHERE rn = 1
    )"""
        )
        if t == iters:
            break
        parts.append(
            f"""u{t} AS (
      SELECT a.cluster, g.i AS dim,
             sum(p.q[g.i] + {_I8_SHIFT}) AS s, count(*) AS n
      FROM a{t} a JOIN pts p USING (vec_id),
           generate_series(1, {_DIM}) AS g(i)
      GROUP BY 1, 2
    ),
    cent{t} AS (
      SELECT c.cluster,
             CASE WHEN max(u.n) IS NULL THEN c.cv
                  ELSE list((2 * u.s + u.n) // (2 * u.n) - {_I8_SHIFT}
                            ORDER BY u.dim)
             END AS cv
      FROM {prev} c LEFT JOIN u{t} u ON u.cluster = c.cluster
      GROUP BY c.cluster, c.cv
    )"""
        )
    return parts


def _i8_oracle_sql(k: int, iters: int) -> str:
    return (
        "WITH "
        + ",\n    ".join(_i8_lloyd_ctes(k, iters))
        + f"""
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM a{iters}"""
    )


@register(
    "embedding_kmeans_int8",
    oracle=_i8_oracle_sql(KMEANS_K, KMEANS_I8_ITERS),
    doc=f"Integer-lattice Lloyd k-means (k={KMEANS_K}, "
    f"{KMEANS_I8_ITERS} iterations): embedding_kmeans's shape made "
    "exact — codes quantized to the int8 lattice (round(x*127), the "
    "embedding_quantize_int8 tie-free argument), centroid updates "
    "rounded back to the lattice half-away-from-zero, so every "
    "distance, argmin, and update is integer arithmetic both engines "
    "reproduce bit-for-bit and the family finally has a hash-checked "
    "member (the float variant's avg is summation-order-sensitive "
    "and stays rows-only by adjudication at its registration). "
    "Assignment is the family's Arrow-vectorized matmul — exact "
    "here because every float64 intermediate is an integer under "
    "2^53 (see _i8_assign); the update is one "
    "map-side-combined groupBy of dim integer sums; only the k x dim "
    "centroid matrix reaches the driver per iteration. Lattice "
    "rounding can cost a point of SSE monotonicity vs float Lloyd "
    "(documented; the float twin keeps the monotone-SSE pytest) but "
    "is exactly how an IVF coarse quantizer over int8-compressed "
    "storage behaves at 100 TB.",
)
def embedding_kmeans_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "embeddings", sf_dir)
    assigned, _ = kmeans_int8_fit_assign(_i8_codes(e))
    return assigned


# --- IVF retrieval on the int8 lattice (round 11) -----------------------

IVF8_TOP_K = 10


def _i8_lloyd_fit(codes: DataFrame) -> list[list[int]]:
    """The exact-integer Lloyd training loop shared by sim_ivf_int8
    and decontaminate_embedding_near: KMEANS_I8_ITERS - 1 update
    rounds from the first-K init, so the returned centroids are the
    cent{iters-1} table that produces the oracle's a{iters}
    assignment. The only .collect()s are k x dim centroid stats —
    bounded driver metadata, the family's documented exception."""
    init = codes.orderBy("vec_id").limit(KMEANS_K).select("q").collect()
    centroids = [list(r[0]) for r in init]
    for _ in range(KMEANS_I8_ITERS - 1):
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
    return centroids



def _i8_ivf_oracle_sql(k: int, iters: int) -> str:
    t = iters - 1  # the centroids that produced the final assignment
    l2 = (
        "list_sum(list_transform(range(1, {d} + 1), "
        "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )
    return (
        "WITH "
        + ",\n    ".join(_i8_lloyd_ctes(k, iters))
        + f""",
    qs AS (
      SELECT vec_id AS query_id, q AS qv FROM pts WHERE vec_id < {N_QUERIES}
    ),
    qd AS (
      SELECT query_id, c.cluster,
             {l2.format(d=_DIM, a="qv", b="c.cv")} AS d
      FROM qs CROSS JOIN cent{t} c
    ),
    probes AS (
      SELECT query_id, cluster FROM (
        SELECT query_id, cluster,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY d, cluster) AS rn
        FROM qd)
      WHERE rn <= {IVF_PROBES}
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS nbr_id
      FROM probes p JOIN a{iters} a ON a.cluster = p.cluster
      WHERE a.vec_id <> p.query_id
    ),
    scored AS (
      SELECT c.query_id, c.nbr_id,
             {l2.format(d=_DIM, a="q2.qv", b="p2.q")} AS l2
      FROM cand c
      JOIN qs q2 ON q2.query_id = c.query_id
      JOIN pts p2 ON p2.vec_id = c.nbr_id
    )
    SELECT query_id, nbr_id, CAST(l2 AS BIGINT) AS l2,
           CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY l2, nbr_id) AS rn FROM scored)
    WHERE rn <= {IVF8_TOP_K}"""
    )


@register(
    "sim_ivf_int8",
    oracle=_i8_ivf_oracle_sql(KMEANS_K, KMEANS_I8_ITERS),
    doc=f"IVF ANN retrieval, hash-checked END TO END — the upgrade "
    "sim_ivf_kmeans (rows-only: float Lloyd) cannot have: the coarse "
    "quantizer is the integer-lattice k-means, queries probe the "
    f"{IVF_PROBES} nearest cells by the SAME exact integer squared-L2 "
    "the training assignment used (tie -> lowest cell), candidates "
    "come from ONE equi-join on the cell id, and the rerank metric "
    "is the exact integer L2 with an nbr_id total tiebreak — every "
    "number in train, probe, and rank is integer arithmetic the "
    "DuckDB oracle re-derives bit-for-bit (unrolled Lloyd CTEs + "
    "probe/rerank CTEs). Same 100 TB shape as sim_ivf_kmeans: a few "
    "training scans with k x dim partial sums, one repartition by "
    f"cell, each query reads ~{IVF_PROBES}/{KMEANS_K} of the corpus; "
    "the probe step is the family's Arrow matmul (exact on lattice "
    "inputs, _i8_assign's argument), the rerank a 64-element "
    "zip_with fold per CANDIDATE. Recall vs exhaustive integer L2 "
    "is pinned in tests/test_round11_ops.py.",
)
def sim_ivf_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "embeddings", sf_dir)
    codes = _i8_codes(e)
    centroids = _i8_lloyd_fit(codes)
    # final cells AND probes use the same centroids (cent{iters-1})
    corpus = _i8_assign(codes, centroids).select(
        F.col("vec_id").alias("nbr_id"), F.col("q").alias("nv"), "cluster"
    )
    qs = codes.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv")
    )
    probes = qs.select(
        "query_id",
        "qv",
        F.explode(_assign_topr_udf(centroids, IVF_PROBES)(F.col("qv"))).alias(
            "cluster"
        ),
    )
    cand = corpus.join(F.broadcast(probes), "cluster").filter(
        F.col("nbr_id") != F.col("query_id")
    )
    l2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("nv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy("l2", "nbr_id")
    return (
        cand.withColumn("l2", l2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= IVF8_TOP_K)
        .select(
            "query_id",
            "nbr_id",
            F.col("l2").cast("bigint").alias("l2"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


# --- IVF-PQ (IVFADC) retrieval on the int8 lattice (round 13) ------------

# ADC shortlist size: candidates surviving the PQ-approximate pass per
# query before the exact-refine stage fetches their original vectors.
IVFPQ_SHORTLIST = 32


def _ivfpq_oracle_sql() -> str:
    k, iters = KMEANS_K, KMEANS_I8_ITERS
    t = iters - 1  # the centroids that produced the final assignment
    l2 = (
        "list_sum(list_transform(range(1, {d} + 1), "
        "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )
    return (
        "WITH "
        + ",\n    ".join(_i8_lloyd_ctes(k, iters))
        + f""",
    {_pq_cb_values_sql()},
    du AS (
      SELECT vec_id, g.i - 1 AS dim, q[g.i] AS qd
      FROM pts, generate_series(1, {_DIM}) AS g(i)
    ),
    -- per (vector, subspace, codeword) exact integer distance: the
    -- ENCODE table for corpus vectors AND the ADC lookup table for
    -- query vectors are the same relation
    pdist AS (
      SELECT du.vec_id, cb.m, cb.k,
             sum((du.qd - cb.val) * (du.qd - cb.val)) AS dist
      FROM du JOIN cb ON cb.m = du.dim // {PQ_SUB} AND cb.d = du.dim % {PQ_SUB}
      GROUP BY du.vec_id, cb.m, cb.k
    ),
    enc AS (
      SELECT vec_id, m, k FROM (
        SELECT vec_id, m, k,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist, k) AS rk
        FROM pdist) WHERE rk = 1
    ),
    qs AS (
      SELECT vec_id AS query_id, q AS qv FROM pts WHERE vec_id < {N_QUERIES}
    ),
    qdist AS (
      SELECT query_id, c.cluster,
             {l2.format(d=_DIM, a="qv", b="c.cv")} AS d
      FROM qs CROSS JOIN cent{t} c
    ),
    probes AS (
      SELECT query_id, cluster FROM (
        SELECT query_id, cluster,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY d, cluster) AS rn
        FROM qdist)
      WHERE rn <= {IVF_PROBES}
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS nbr_id
      FROM probes p JOIN a{iters} a ON a.cluster = p.cluster
      WHERE a.vec_id <> p.query_id
    ),
    adc AS (
      SELECT c.query_id, c.nbr_id, CAST(sum(qt.dist) AS BIGINT) AS adc
      FROM cand c
      JOIN enc e ON e.vec_id = c.nbr_id
      JOIN pdist qt ON qt.vec_id = c.query_id
                   AND qt.m = e.m AND qt.k = e.k
      GROUP BY 1, 2
    ),
    short AS (
      SELECT query_id, nbr_id, adc FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc, nbr_id) AS rn
        FROM adc) WHERE rn <= {IVFPQ_SHORTLIST}
    ),
    rer AS (
      SELECT s.query_id, s.nbr_id, s.adc,
             {l2.format(d=_DIM, a="q2.qv", b="p2.q")} AS l2
      FROM short s
      JOIN qs q2 ON q2.query_id = s.query_id
      JOIN pts p2 ON p2.vec_id = s.nbr_id
    )
    SELECT query_id, nbr_id, adc, CAST(l2 AS BIGINT) AS l2,
           CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY l2, nbr_id) AS rn FROM rer)
    WHERE rn <= {IVF8_TOP_K}"""
    )


@register(
    "sim_ivf_pq_int8",
    oracle=_ivfpq_oracle_sql(),
    doc="IVF-PQ (IVFADC) retrieval, hash-checked END TO END — the "
    "composition the two gated pieces exist for: sim_ivf_int8's "
    "TRAINED integer-lattice coarse quantizer restricts each query "
    f"to its {IVF_PROBES} nearest cells, embedding_pq_int8's fixed "
    f"integer codebooks compress every candidate to {PQ_M} codes, "
    "and the asymmetric-distance (ADC) pass scores candidates with "
    f"{PQ_M} array lookups into the query's precomputed 128-entry "
    "subspace-distance table — never touching the original vector — "
    f"before an exact integer-L2 refine of the top {IVFPQ_SHORTLIST} "
    "fetches full vectors for the SHORTLIST ONLY (the FAISS "
    "IVFADC+refine architecture, Jégou et al.). Every number in "
    "train, encode, probe, ADC, and refine is integer arithmetic the "
    "oracle re-derives bit-for-bit (the per-(vector, subspace, code) "
    "distance relation doubles as corpus encoder and query ADC "
    "table). Driver metadata: the k x dim centroid matrix per Lloyd "
    f"round plus the {N_QUERIES} x {_DIM} query code matrix (the "
    "MaxSim precedent) from which probes and ADC tables are built. "
    "100 TB shape: PQ codes are 8 small ints per vector (32x "
    "compression — the index that fits in RAM), candidates move as "
    "(id, 8 codes), ADC is pure codegen array lookups on a broadcast "
    "per-query table, and only queries x shortlist original vectors "
    "are ever fetched. Recall@10 vs exhaustive integer L2 pinned in "
    "tests/test_round13_ops.py.",
)
def sim_ivf_pq_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "embeddings", sf_dir)
    codes = _i8_codes(e)
    centroids = _i8_lloyd_fit(codes)
    corpus = _i8_assign(codes, centroids)
    cb = np.asarray(_PQ_CB, dtype=np.int64)  # (M, K, SUB)

    def encode(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            c = np.stack(pdf["q"].to_numpy()).astype(np.int64)  # (n, DIM)
            sub = c.reshape(n, PQ_M, 1, PQ_SUB)
            d = sub - cb[None, :, :, :]
            dist = np.einsum("nmks,nmks->nmk", d, d)  # exact ints < 2^53
            kk = dist.argmin(axis=2)  # first occurrence = lowest code
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "cluster": pdf["cluster"].astype("int64"),
                    "codes": [row.tolist() for row in kk],
                }
            )

    enc = corpus.select("vec_id", "cluster", "q").mapInPandas(
        encode, schema="vec_id bigint, cluster bigint, codes array<bigint>"
    )
    # ONE bounded-metadata collect: the N_QUERIES x DIM query code
    # matrix yields probes AND the per-query ADC lookup tables in
    # exact int64 numpy (argsort stable + integer keys == the oracle's
    # ORDER BY d, cluster / dist, k tiebreaks)
    q_rows = codes.filter(F.col("vec_id") < N_QUERIES).orderBy("vec_id").collect()
    qmat = np.array([list(r["q"]) for r in q_rows], dtype=np.int64)
    qsub = qmat.reshape(len(q_rows), PQ_M, 1, PQ_SUB)
    qd = qsub - cb[None, :, :, :]
    adc_tabs = np.einsum("nmks,nmks->nmk", qd, qd)  # (Q, M, K)
    cmat = np.asarray(centroids, dtype=np.int64)
    d2 = ((qmat[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)  # (Q, k)
    probe_cells = np.argsort(d2, axis=1, kind="stable")[:, :IVF_PROBES]
    probes = spark.createDataFrame(
        [
            (int(r["vec_id"]), int(cell), [int(x) for x in adc_tabs[i].reshape(-1)])
            for i, r in enumerate(q_rows)
            for cell in probe_cells[i]
        ],
        "query_id bigint, cluster bigint, adc_flat array<bigint>",
    )
    cand = enc.join(F.broadcast(probes), "cluster").filter(
        F.col("vec_id") != F.col("query_id")
    )
    # ADC: 8 codegen array lookups per candidate — adc_flat is laid
    # out m*PQ_K + code (Spark [] indexing is 0-based; element_at is
    # the 1-based one)
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("nbr_id"),
        F.expr(
            f"aggregate(sequence(0, {PQ_M - 1}), CAST(0 AS BIGINT), "
            f"(acc, m) -> acc + adc_flat[CAST(m * {PQ_K} + codes[m] AS INT)])"
        ).alias("adc"),
    )
    w_s = Window.partitionBy("query_id").orderBy("adc", "nbr_id")
    short = (
        scored.withColumn("rn", F.row_number().over(w_s))
        .filter(F.col("rn") <= IVFPQ_SHORTLIST)
        .drop("rn")
    )
    # refine: original vectors fetched for the shortlist only
    nv = codes.select(F.col("vec_id").alias("nbr_id"), F.col("q").alias("nv"))
    qv = codes.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv")
    )
    l2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("nv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    w_r = Window.partitionBy("query_id").orderBy("l2", "nbr_id")
    return (
        short.join(nv, "nbr_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("l2", l2)
        .withColumn("rank", F.row_number().over(w_r))
        .filter(F.col("rank") <= IVF8_TOP_K)
        .select(
            "query_id",
            "nbr_id",
            F.col("adc").cast("bigint").alias("adc"),
            F.col("l2").cast("bigint").alias("l2"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


# --- NDCG retrieval evaluation (round 11 continuation) -------------------

NDCG_K = 10
# Rank discounts 1/log2(rank+1) quantized once in PYTHON to integer
# micro-units and injected as the same literal list into both engines:
# DCG becomes an exact BIGINT sum (order-invariant), so no engine ever
# evaluates log2 — the stats_fdr_bh libm discipline, made exact.
NDCG_W = [round(1_000_000 / math.log2(r + 1)) for r in range(1, NDCG_K + 1)]
NDCG_IW = [sum(NDCG_W[: r + 1]) for r in range(NDCG_K)]  # ideal cumsums


@register(
    "sim_ndcg_eval",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label FROM embeddings
    ),
    ranked AS (
      SELECT q.vec_id AS query_id, q.label AS q_label,
             c.label AS nbr_label,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(q.emb, c.emb), 6) DESC,
                        c.vec_id) AS rank
      FROM v q JOIN v c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ),
    topk AS (SELECT * FROM ranked WHERE rank <= {NDCG_K}),
    w(rank, wt) AS (VALUES {",".join(f"({r + 1}, {w})" for r, w in enumerate(NDCG_W))}),
    iw(n_rel, iwt) AS (VALUES (0, 0),{",".join(f"({r + 1}, {c})" for r, c in enumerate(NDCG_IW))}),
    per_q AS (
      SELECT t.query_id, t.q_label,
             CAST(sum(CASE WHEN t.nbr_label = t.q_label THEN w.wt ELSE 0 END)
                  AS BIGINT) AS dcg_u,
             CAST(sum(CASE WHEN t.nbr_label = t.q_label THEN 1 ELSE 0 END)
                  AS BIGINT) AS hits_topk,
             min(CASE WHEN t.nbr_label = t.q_label THEN t.rank END) AS first_hit
      FROM topk t JOIN w ON w.rank = t.rank
      GROUP BY t.query_id, t.q_label
    ),
    lab AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n_label FROM v GROUP BY label
    )
    SELECT p.query_id, p.q_label,
           CAST(l.n_label - 1 AS BIGINT) AS n_rel_total,
           p.hits_topk, p.dcg_u,
           CAST(iw.iwt AS BIGINT) AS idcg_u,
           round(CASE WHEN iw.iwt > 0
                      THEN CAST(p.dcg_u AS DOUBLE) / iw.iwt ELSE 0.0 END, 6)
             AS ndcg,
           round(CAST(p.hits_topk AS DOUBLE) / {NDCG_K}, 6) AS precision_at_k,
           round(CASE WHEN p.first_hit IS NULL THEN 0.0
                      ELSE 1.0 / p.first_hit END, 9) AS reciprocal_rank
    FROM per_q p
    JOIN lab l ON l.label = p.q_label
    JOIN iw ON iw.n_rel = least({NDCG_K}, l.n_label - 1)
    """,
    doc="Ranked-retrieval quality evaluation — NDCG@10, precision@k "
    "and reciprocal rank per query, relevance = label match (the "
    "eval harness every similarity-search deployment runs beside "
    "sim_recall_report's set-overlap recall; NDCG grades WHERE in "
    "the ranking the relevant hits landed, not just how many). The "
    "ranking is the exact brute-force cosine order (rounded, "
    "nbr_id tiebreak). Rank discounts 1/log2(r+1) are quantized "
    "once in Python to integer micro-units and injected as the SAME "
    "literal table into both engines, so DCG/IDCG are exact BIGINT "
    "sums — order-invariant, no per-row libm anywhere — and NDCG is "
    "one final rounded division. IDCG comes from the precomputed "
    "ideal-cumsum lookup at min(K, n_relevant). Queries broadcast; "
    "the corpus never shuffles; per-label totals are "
    "dimension-sized.",
)
def sim_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "embeddings", sf_dir)
    corpus = e.select(
        F.col("vec_id").alias("nbr_id"),
        to_double("embedding").alias("nbr_vec"),
        F.col("label").alias("nbr_label"),
    )
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        to_double("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    scored = corpus.join(
        F.broadcast(queries), F.col("query_id") != F.col("nbr_id")
    ).withColumn("cos_sim", F.round(cosine(F.col("q_vec"), F.col("nbr_vec")), 6))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("nbr_id"))
    topk = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= NDCG_K
    )
    rel = (F.col("nbr_label") == F.col("q_label")).cast("int")
    wts = F.array(*[F.lit(x) for x in NDCG_W])
    per_q = topk.groupBy("query_id", "q_label").agg(
        F.sum(rel.cast("bigint") * F.element_at(wts, F.col("rank")))
        .cast("bigint")
        .alias("dcg_u"),
        F.sum(rel).cast("bigint").alias("hits_topk"),
        F.min(F.when(rel == 1, F.col("rank"))).alias("first_hit"),
    )
    lab = corpus.groupBy(F.col("nbr_label").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_label")
    )
    iw = F.array(*[F.lit(x) for x in NDCG_IW])  # 1-indexed cumsums
    joined = per_q.join(
        F.broadcast(lab), per_q["q_label"] == lab["label"]
    ).withColumn("n_rel_total", (F.col("n_label") - 1).cast("bigint"))
    ideal_r = F.least(F.lit(NDCG_K), F.col("n_rel_total"))
    idcg = F.when(ideal_r >= 1, F.element_at(iw, ideal_r.cast("int"))).otherwise(
        F.lit(0)
    )
    return joined.select(
        "query_id",
        "q_label",
        "n_rel_total",
        "hits_topk",
        "dcg_u",
        idcg.cast("bigint").alias("idcg_u"),
        F.round(
            F.when(
                idcg > 0, F.col("dcg_u").cast("double") / idcg.cast("double")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("ndcg"),
        F.round(F.col("hits_topk").cast("double") / F.lit(float(NDCG_K)), 6).alias(
            "precision_at_k"
        ),
        F.round(
            F.when(F.col("first_hit").isNull(), F.lit(0.0)).otherwise(
                F.lit(1.0) / F.col("first_hit").cast("double")
            ),
            9,
        ).alias("reciprocal_rank"),
    )


# --- embedding-space quality control (round 11 continuation) ------------

# Outlier rule: squared distance to the own-label lattice centroid
# exceeding OUT_NUM/OUT_DEN x the label's (discrete lower) median.
OUT_NUM, OUT_DEN = 5, 2  # 2.5x


@register(
    "quality_embedding_outliers",
    oracle=f"""
    WITH pts AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {_I8_SHIFT}) AS BIGINT)) AS q
      FROM embeddings
    ),
    sums AS (
      SELECT label, g.i AS dim,
             CAST(sum(q[g.i] + {_I8_SHIFT}) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM pts, generate_series(1, {_DIM}) AS g(i)
      GROUP BY 1, 2
    ),
    cent AS (
      SELECT label,
             list((2 * s + n) // (2 * n) - {_I8_SHIFT} ORDER BY dim) AS cv,
             CAST(max(n) AS BIGINT) AS n_label
      FROM sums GROUP BY label
    ),
    d AS (
      SELECT p.vec_id, p.label, c.n_label,
             CAST(list_sum(list_transform(range(1, {_DIM} + 1),
                  i -> (p.q[i] - c.cv[i]) * (p.q[i] - c.cv[i])))
                  AS BIGINT) AS d2
      FROM pts p JOIN cent c ON c.label = p.label
    ),
    m AS (
      SELECT label,
             CAST(max(CASE WHEN rn = (n_label + 1) // 2 THEN d2 END)
                  AS BIGINT) AS med_d2
      FROM (SELECT *, row_number() OVER (PARTITION BY label
                                         ORDER BY d2, vec_id) AS rn
            FROM d)
      GROUP BY label
    )
    SELECT d.vec_id, d.label, d.d2, m.med_d2,
           (d.d2 * {OUT_DEN} > m.med_d2 * {OUT_NUM}) AS is_outlier
    FROM d JOIN m ON m.label = d.label
    """,
    doc="Embedding-space quality control for a labeled corpus: flag "
    "vectors whose squared distance to their OWN label's centroid "
    f"exceeds {OUT_NUM}/{OUT_DEN}x the label's median — the standard "
    "mislabeled-example / embedding-drift screen a training-data "
    "pipeline runs before fine-tuning (outliers are either label "
    "noise or distribution drift; both poison training). Exact end "
    "to end on the int8 lattice: codes are round(x*127), the "
    "per-label centroid is the half-away-from-zero integer mean "
    "(the kmeans_int8 shifted idiom), distances are integer "
    "squared-L2, the threshold is the DISCRETE lower median "
    "(an order statistic actually in the data), and the flag is a "
    "cross-multiplied integer predicate — no division, no float, "
    "no libm. Shape: one scan for the label-dimension sums "
    "(map-side combine), centroids broadcast back, one window for "
    "the per-label median over label-partitioned d2 — at 100 TB "
    "every stage shuffles label-bounded or row-local data only.",
)
def quality_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "embeddings", sf_dir)
    q = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * _I8_SHIFT).cast("bigint"),
    )
    pts = e.select("vec_id", "label", q.alias("q"))
    sums = pts.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            F.sum(F.col("q")[i] + _I8_SHIFT).cast("bigint").alias(f"s{i}")
            for i in range(_DIM)
        ],
    )

    def imean(s: F.Column, n: F.Column) -> F.Column:
        a = 2 * s + n
        return ((a - a % (2 * n)) / (2 * n)).cast("bigint") - _I8_SHIFT

    cent = sums.select(
        "label",
        F.col("n").alias("n_label"),
        F.array(*[imean(F.col(f"s{i}"), F.col("n")) for i in range(_DIM)]).alias(
            "cv"
        ),
    )
    from ..plans.stage import eager_release

    # persisted: the narrow (vec_id, label, d2) distance table feeds
    # BOTH the per-label median window and the final projection —
    # unstaged, the quantize+zip_with distance pass (and its parquet
    # scan) replays per consumer (4 scans measured in this round's
    # plan audit). 32 bytes/row, far smaller than the codes.
    d = (
        pts.join(F.broadcast(cent), "label")
        .select(
            "vec_id",
            "label",
            "n_label",
            F.aggregate(
                F.zip_with(
                    F.col("q"), F.col("cv"), lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("d2"),
        )
        .persist()
    )
    w = Window.partitionBy("label").orderBy("d2", "vec_id")
    ranked = d.withColumn("rn", F.row_number().over(w))
    med = (
        ranked.filter(
            F.col("rn") == F.floor((F.col("n_label") + 1) / 2).cast("int")
        )
        .groupBy("label")
        .agg(F.max("d2").cast("bigint").alias("med_d2"))
    )
    out = d.join(F.broadcast(med), "label").select(
        "vec_id",
        "label",
        "d2",
        "med_d2",
        (F.col("d2") * OUT_DEN > F.col("med_d2") * OUT_NUM).alias("is_outlier"),
    )
    return eager_release(out, "embedding_outliers", d)


# --- ColBERT-style MaxSim late interaction (round 12) -------------------

# The 64-d vector is treated as MAXSIM_SUBS = 8 contiguous 8-d
# sub-vectors — the stand-in for per-token embeddings (a real ColBERT
# stores one sub-vector per token; the fixed split keeps the fixture
# honest while exercising the exact same max-over-tokens plan).
MAXSIM_SUBS = 8
MAXSIM_SUBDIM = 8
MAXSIM_K = 5
MAXSIM_NQ = 16  # fixed bounded query workload, the sim_topk convention


@register(
    "sim_maxsim_late_interaction",
    oracle=f"""
    WITH codes AS (
      SELECT vec_id,
             [CAST(round(x * 127) AS BIGINT) for x in
              CAST(embedding AS DOUBLE[])] AS c
      FROM embeddings
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, d.vec_id AS nbr_id,
             list_sum([
               list_max([
                 list_sum([q.c[s * {MAXSIM_SUBDIM} + i]
                           * d.c[t * {MAXSIM_SUBDIM} + i]
                           for i in range(1, {MAXSIM_SUBDIM + 1})])
                 for t in range(0, {MAXSIM_SUBS})])
               for s in range(0, {MAXSIM_SUBS})]) AS maxsim
      FROM codes q JOIN codes d ON q.vec_id <> d.vec_id
      WHERE q.vec_id < {MAXSIM_NQ}
    )
    SELECT query_id, nbr_id, CAST(maxsim AS BIGINT) AS maxsim, rn AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY maxsim DESC, nbr_id) AS rn
          FROM pairs)
    WHERE rn <= {MAXSIM_K}
    """,
    doc="ColBERT-style late-interaction MaxSim retrieval: score(q, d) "
    "= sum over query sub-vectors of the MAX dot product against any "
    "document sub-vector — the multi-vector ranking function behind "
    "ColBERT/PLAID-class retrievers, where per-token matching beats "
    "single-vector cosine on long documents. Runs END TO END on the "
    "int8 lattice (codes = round(x*127), the "
    "embedding_quantize_int8 discipline), so every one of the 64 "
    "sub-dot-products, each max, and the final sum is exact integer "
    "arithmetic both engines reproduce bit-for-bit; ranking "
    "tie-breaks on nbr_id. Shape: the fixed "
    f"{MAXSIM_NQ}-query code matrix ships as a closure constant and "
    "ONE Arrow einsum per batch scores every (query, doc, sub, sub) "
    "interaction — the r11 kmeans lesson applied (codegen for "
    "scalar trees, Arrow for k x dim matrices: the nested-HOF "
    "formulation benched 4x slower); int64 end to end, so still "
    "exact. One corpus scan, no join, one top-k window. At "
    "100 TB the corpus side would first prune through an IVF/LSH "
    "candidate stage (sim_ivf_int8); MaxSim is the rerank law, "
    "priced per candidate, exactly as PLAID prices it.",
)
def sim_maxsim_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "embeddings", sf_dir)
    codes = _i8_codes(e)
    # bounded driver metadata: the MAXSIM_NQ x 64 query code matrix
    # (the family's documented .collect() exception)
    qrows = codes.filter(F.col("vec_id") < MAXSIM_NQ).orderBy("vec_id").collect()
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["q"] for r in qrows], dtype=np.int64).reshape(
        len(qrows), MAXSIM_SUBS, MAXSIM_SUBDIM
    )

    def score_batches(batches):
        # One einsum per Arrow batch: (Q,s,d) x (B,t,d) -> (Q,B,s,t),
        # max over t, sum over s — the r11 kmeans lesson (codegen for
        # scalar trees, Arrow for k x dim matrices: the nested-HOF
        # formulation of the same score benched 4.4 s at sf0.1, this
        # kernel 0.47 s best-of-3). EXACT: int64 throughout; |dot| <= 64*127^2.
        for pdf in batches:
            dm = np.stack(pdf["q"].map(np.asarray)).astype(np.int64)
            b = dm.shape[0]
            dsub = dm.reshape(b, MAXSIM_SUBS, MAXSIM_SUBDIM)
            inter = np.einsum("qsd,btd->qbst", qmat, dsub)
            scores = inter.max(axis=3).sum(axis=2)  # (Q, B) int64
            nbr = pdf["vec_id"].to_numpy(dtype=np.int64)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, b),
                    "nbr_id": np.tile(nbr, len(qids)),
                    "maxsim": scores.reshape(-1),
                }
            )

    pairs = codes.mapInPandas(
        score_batches, schema="query_id bigint, nbr_id bigint, maxsim bigint"
    ).filter(F.col("query_id") != F.col("nbr_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("maxsim").desc(), F.col("nbr_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= MAXSIM_K)
        .select("query_id", "nbr_id", "maxsim", "rank")
    )


# --- embedding-space decontamination (round 12) -------------------------

# Eval set = vec_id % DECON_EVAL_MOD == 0 (the held-out benchmark
# proxy); a train vector is contaminated when cosine >= 1/4 against
# ANY eval vector. Candidates come from the eval vectors' multi-probe
# IVF cells, so the search is cells-restricted like dedup_semdedup —
# approximate BY DESIGN in recall but fully deterministic, and every
# retained number is exact integer arithmetic (recall vs brute force
# pinned in tests/test_round12_ops.py).
DECON_EVAL_MOD = 20
DECON_TAU_NUM, DECON_TAU_DEN = 1, 4


def _decon_oracle_sql() -> str:
    k, iters = KMEANS_K, KMEANS_I8_ITERS
    t = iters - 1
    l2 = (
        "list_sum(list_transform(range(1, {d} + 1), "
        "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )
    dot = "list_sum(list_transform(range(1, {d} + 1), i -> {a}[i] * {b}[i]))"
    return (
        "WITH "
        + ",\n    ".join(_i8_lloyd_ctes(k, iters))
        + f""",
    norms AS (
      SELECT vec_id, q,
             {dot.format(d=_DIM, a="q", b="q")} AS nn
      FROM pts
    ),
    ev AS (
      SELECT n.vec_id AS eval_id, n.q AS evq, n.nn AS ne
      FROM norms n WHERE n.vec_id % {DECON_EVAL_MOD} = 0
    ),
    evd AS (
      SELECT eval_id, evq, ne, c.cluster,
             {l2.format(d=_DIM, a="evq", b="c.cv")} AS d
      FROM ev CROSS JOIN cent{t} c
    ),
    probes AS (
      SELECT eval_id, evq, ne, cluster FROM (
        SELECT eval_id, evq, ne, cluster,
               row_number() OVER (PARTITION BY eval_id
                                  ORDER BY d, cluster) AS rn
        FROM evd)
      WHERE rn <= {IVF_PROBES}
    ),
    tr AS (
      SELECT n.vec_id, n.q AS tv, n.nn AS nt, a.cluster
      FROM norms n JOIN a{iters} a USING (vec_id)
      WHERE n.vec_id % {DECON_EVAL_MOD} <> 0
    ),
    pairs AS (
      SELECT t2.vec_id, p.eval_id,
             {dot.format(d=_DIM, a="t2.tv", b="p.evq")} AS dp,
             t2.nt, p.ne
      FROM tr t2 JOIN probes p ON p.cluster = t2.cluster
    ),
    hits AS (
      SELECT vec_id, eval_id,
             CAST((dp * dp * 1000000) // (nt * ne) AS BIGINT)
               AS sim2_micro
      FROM pairs
      WHERE dp > 0 AND dp * dp * {DECON_TAU_DEN * DECON_TAU_DEN}
                       >= {DECON_TAU_NUM * DECON_TAU_NUM} * nt * ne
    )
    SELECT vec_id,
           CAST(count(*) AS BIGINT) AS n_eval_matches,
           CAST((min(struct_pack(a := -sim2_micro, b := eval_id))).b
                AS BIGINT) AS best_eval_id,
           CAST(max(sim2_micro) AS BIGINT) AS best_sim2_micro
    FROM hits GROUP BY vec_id"""
    )


@register(
    "decontaminate_embedding_near",
    oracle=_decon_oracle_sql(),
    doc="Embedding-space decontamination — the semantic sibling the "
    "family was missing (decontaminate_ngram_overlap catches "
    "verbatim leaks, decontaminate_bloom scales membership, "
    "decontaminate_longest_span catches partial copies; none catch "
    "a PARAPHRASED benchmark item, which is exactly what "
    "near-duplicate embedding matches find — the D4RT/semantic-"
    "decontamination argument). Every eval vector probes its "
    f"{IVF_PROBES} nearest int8-k-means cells (same trained "
    "centroids, same exact integer L2 as sim_ivf_int8), candidate "
    "train vectors come from ONE cell equi-join, and the "
    "contamination verdict cosine >= 1/4 is fully cross-multiplied "
    "on the int8 lattice (dp^2 * 16 >= nt * ne with a dp > 0 sign "
    "guard) — no float ever decides; the reported similarity is "
    "exact integer micro-cos^2 via floor division of positives. "
    "Cells-restricted recall is approximate by design "
    "(multi-probe), pinned against brute force in pytest; "
    "determinism is total, so the gate hash-checks END TO END. "
    "Shape: train scans + one repartition by cell; each eval item "
    f"touches ~{IVF_PROBES}/{KMEANS_K} of the corpus — the "
    "100 TB decontamination shape (eval sets are thousands of "
    "rows; the corpus is the big side and is never all-paired).",
)
def decontaminate_embedding_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "embeddings", sf_dir)
    codes = _i8_codes(e)
    centroids = _i8_lloyd_fit(codes)
    norm = F.aggregate(
        F.transform(F.col("q"), lambda x: x * x),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    assigned = _i8_assign(codes, centroids).withColumn("nn", norm)
    ev = assigned.filter(F.col("vec_id") % DECON_EVAL_MOD == 0).select(
        F.col("vec_id").alias("eval_id"), F.col("q").alias("evq"), F.col("nn").alias("ne")
    )
    probes = ev.select(
        "eval_id",
        "evq",
        "ne",
        F.explode(_assign_topr_udf(centroids, IVF_PROBES)(F.col("evq"))).alias(
            "cluster"
        ),
    )
    tr = assigned.filter(F.col("vec_id") % DECON_EVAL_MOD != 0).select(
        "vec_id", F.col("q").alias("tv"), F.col("nn").alias("nt"), "cluster"
    )
    dp = F.aggregate(
        F.zip_with(F.col("tv"), F.col("evq"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    pairs = tr.join(F.broadcast(probes), "cluster").select(
        "vec_id", "eval_id", dp.alias("dp"), "nt", "ne"
    )
    hits = pairs.filter(
        (F.col("dp") > 0)
        & (
            F.col("dp") * F.col("dp") * F.lit(DECON_TAU_DEN * DECON_TAU_DEN)
            >= F.lit(DECON_TAU_NUM * DECON_TAU_NUM) * F.col("nt") * F.col("ne")
        )
    ).select(
        "vec_id",
        "eval_id",
        F.expr("(dp * dp * 1000000) div (nt * ne)").alias("sim2_micro"),
    )
    return hits.groupBy("vec_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval_matches"),
        F.min(
            F.struct((-F.col("sim2_micro")).alias("a"), F.col("eval_id").alias("b"))
        )
        .getField("b")
        .cast("bigint")
        .alias("best_eval_id"),
        F.max("sim2_micro").cast("bigint").alias("best_sim2_micro"),
    )
