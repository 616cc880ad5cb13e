"""Statistical-test battery: two-sample Kolmogorov-Smirnov, robust
MAD outliers, Welch's t-test, and lag-1 autocorrelation.

These are the monitoring/validation operators a data platform runs
beside its pipelines (distribution-shift detection on ingested
corpora, robust anomaly flags on metric streams, A/B-style mean
comparison, temporal-structure checks). All four follow the repo's
exact-sufficient-statistics discipline: everything that aggregates is
exact (BIGINT / DECIMAL), and the closed-form statistic is evaluated
over the reduced rows in DOUBLE with an IDENTICAL scalar expression
tree on both engines, so the DuckDB oracle hash-checks values, not
just shapes. Where a textbook formula would interpolate (the median),
the DISCRETE lower median (an order statistic — a value actually in
the data) is used instead, because an interpolated median's last-ulp
float could differ between engines and flip a downstream filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load

# Kolmogorov critical coefficient at alpha = 0.05 (two-sided).
KS_C_ALPHA = 1.358


@register(
    "stats_ks_test",
    oracle=f"""
    WITH xs AS (SELECT DISTINCT n_chars AS x FROM documents),
    srcs AS (SELECT source, count(*) AS n1 FROM documents GROUP BY source),
    tot AS (SELECT count(*) AS big_n FROM documents),
    hist AS (
      SELECT source, n_chars AS x, count(*) AS c
      FROM documents GROUP BY source, n_chars
    ),
    gh AS (SELECT n_chars AS x, count(*) AS c FROM documents GROUP BY n_chars),
    ct AS (
      SELECT x, sum(c) OVER (
        ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS cumt FROM gh
    ),
    grid AS (SELECT s.source, s.n1, xs.x FROM srcs s CROSS JOIN xs),
    g1 AS (
      SELECT grid.source, grid.n1, grid.x, coalesce(h.c, 0) AS c
      FROM grid LEFT JOIN hist h ON h.source = grid.source AND h.x = grid.x
    ),
    c1 AS (
      SELECT source, n1, x, sum(c) OVER (
        PARTITION BY source ORDER BY x
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS cum1 FROM g1
    ),
    dn AS (
      SELECT c1.source, c1.n1, t.big_n - c1.n1 AS n2,
             abs(c1.cum1 * (t.big_n - c1.n1) - (ct.cumt - c1.cum1) * c1.n1)
               AS d_num
      FROM c1 JOIN ct ON ct.x = c1.x CROSS JOIN tot t
    ),
    m AS (
      SELECT source, n1, n2, max(d_num) AS d_num
      FROM dn GROUP BY source, n1, n2
    )
    SELECT source,
           CAST(n1 AS BIGINT) AS n1,
           CAST(n2 AS BIGINT) AS n2,
           round(CAST(d_num AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 12) AS d_stat,
           round({KS_C_ALPHA} * sqrt(CAST(n1 + n2 AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))), 12) AS ks_crit,
           (CAST(d_num AS DOUBLE)
              / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
            > {KS_C_ALPHA} * sqrt(CAST(n1 + n2 AS DOUBLE)
              / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))) AS reject_h0
    FROM m
    """,
    doc="Two-sample Kolmogorov-Smirnov test of each source's document-"
    "length distribution against the pooled rest — the distribution-"
    "shift monitor a corpus pipeline runs per ingest batch (companion "
    "to text_source_divergence's chi-square, which needs binning; KS "
    "is binning-free). The sup|F1-F2| is evaluated at every pooled "
    "distinct value with EXACT integer cumulative counts, and the "
    "max is taken over the integer cross-product |c1*n2 - c2*n1| "
    "(<= N^2, bigint-safe to N~3e9 per stratum) so no float enters "
    "until the single final division — IEEE-identical on both "
    "engines, hence hash-checkable including the alpha=0.05 "
    "reject flag. Cost shape: ONE map-side-combined count over the "
    "corpus builds the (source, value) histogram; every other input "
    "(per-value totals, per-source totals, the evaluation grid) "
    "derives from that persisted histogram, so the corpus is scanned "
    "exactly once and every window runs on HISTOGRAM-sized data — at "
    "100 TB the grid is still dimension-sized.",
)
def stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.stage import eager_release

    d = load(spark, "documents", sf_dir)
    # The single corpus pass. Histogram-sized (|sources| x |distinct
    # values|); persisted because four consumers derive from it —
    # released via eager_release below.
    hist = (
        d.groupBy("source", F.col("n_chars").alias("x"))
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    gh = hist.groupBy("x").agg(F.sum("c").alias("c"))
    # Global-ECDF window: single partition, but over the histogram
    # (|distinct x| rows), not the corpus.
    wt = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ct = gh.select("x", F.sum("c").over(wt).alias("cumt"))
    wg = Window.partitionBy()
    srcs = (
        hist.groupBy("source")
        .agg(F.sum("c").alias("n1"))
        .select("source", "n1", (F.sum("n1").over(wg) - F.col("n1")).alias("n2"))
    )
    xs = gh.select("x")
    grid = xs.crossJoin(F.broadcast(srcs))
    g1 = grid.join(F.broadcast(hist), ["source", "x"], "left").select(
        "source", "n1", "n2", "x", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    w1 = (
        Window.partitionBy("source")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c1 = g1.select("source", "n1", "n2", "x", F.sum("c").over(w1).alias("cum1"))
    dn = c1.join(F.broadcast(ct), "x").select(
        "source",
        "n1",
        "n2",
        F.abs(
            F.col("cum1") * F.col("n2") - (F.col("cumt") - F.col("cum1")) * F.col("n1")
        ).alias("d_num"),
    )
    m = dn.groupBy("source", "n1", "n2").agg(F.max("d_num").alias("d_num"))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    d_stat = F.col("d_num").cast("double") / (n1d * n2d)
    crit = F.lit(KS_C_ALPHA) * F.sqrt((F.col("n1") + F.col("n2")).cast("double") / (n1d * n2d))
    out = m.select(
        "source",
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.round(d_stat, 12).alias("d_stat"),
        F.round(crit, 12).alias("ks_crit"),
        (d_stat > crit).alias("reject_h0"),
    )
    return eager_release(out, "ks_test", hist)


# Modified-z outlier threshold: |x - med| / MAD > 3.5 / 0.6745
# (the 0.6745 is Phi^-1(0.75), scaling MAD to sigma for normal data).
# Kept as the division expression on BOTH engines so the literal can
# never be transcribed differently.
MAD_Z_NUM = 3.5
MAD_Z_DEN = 0.6745


@register(
    "events_anomaly_mad",
    oracle=f"""
    WITH r AS (
      SELECT event_id, event_type, value,
             row_number() OVER (
               PARTITION BY event_type ORDER BY value, event_id
             ) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    m AS (
      SELECT event_id, event_type, value, n,
             max(CASE WHEN rn = (n + 1) // 2 THEN value END)
               OVER (PARTITION BY event_type) AS med_raw
      FROM r
    ),
    a AS (
      SELECT event_id, event_type, value, n, med_raw,
             abs(value - med_raw) AS absdev
      FROM m
    ),
    r2 AS (
      SELECT *, row_number() OVER (
               PARTITION BY event_type ORDER BY absdev, event_id
             ) AS rn2
      FROM a
    ),
    m2 AS (
      SELECT *, max(CASE WHEN rn2 = (n + 1) // 2 THEN absdev END)
               OVER (PARTITION BY event_type) AS mad_raw
      FROM r2
    )
    SELECT event_id, event_type, value,
           round(med_raw, 6) AS med,
           round(mad_raw, 6) AS mad,
           round(absdev / mad_raw, 6) AS mad_score
    FROM m2
    WHERE mad_raw > 0
      AND absdev / mad_raw > {MAD_Z_NUM} / {MAD_Z_DEN}
    """,
    doc="Robust outlier detection via median absolute deviation — the "
    "companion of events_anomaly_zscore for heavy-tailed metrics, "
    "where the mean/stddev are themselves dragged by the outliers "
    "they should flag. Both medians are the DISCRETE lower median "
    "(the ceil(n/2)-th order statistic, tie-broken by event_id): a "
    "value actually present in the data, identical on both engines "
    "by construction — an interpolated median's last-ulp float could "
    "flip the threshold filter for a boundary row and break the "
    "hash. Cost shape: ZERO joins and ONE exchange — the median and "
    "the MAD both attach to every row via max(CASE WHEN rn = k) over "
    "the same event_type partition (a single non-null value per "
    "partition, so max() is exact selection, not float arithmetic): "
    "one hash-partition on the key, two in-partition sorts, four "
    "window passes, all on the same co-partitioned data. The exact-"
    "median form; at 100 TB with huge keys the approx-percentile "
    "sketch is the scale path, this is the exact companion the "
    "sketch is validated against.",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = e.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    # (n+1) div 2 is the discrete lower median's rank; max() over the
    # partition of the single matching row broadcasts it to every row
    # of the key without a join
    m = r.select(
        "event_id",
        "event_type",
        "value",
        "n",
        F.max(F.expr("CASE WHEN rn = (n + 1) div 2 THEN value END"))
        .over(wn)
        .alias("med_raw"),
    )
    a = m.select(
        "event_id",
        "event_type",
        "value",
        "n",
        "med_raw",
        F.abs(F.col("value") - F.col("med_raw")).alias("absdev"),
    )
    w2 = Window.partitionBy("event_type").orderBy("absdev", "event_id")
    r2 = a.withColumn("rn2", F.row_number().over(w2))
    m2 = r2.withColumn(
        "mad_raw",
        F.max(F.expr("CASE WHEN rn2 = (n + 1) div 2 THEN absdev END")).over(wn),
    )
    score = F.col("absdev") / F.col("mad_raw")
    return (
        m2.filter(
            (F.col("mad_raw") > 0) & (score > F.lit(MAD_Z_NUM) / F.lit(MAD_Z_DEN))
        )
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(F.col("med_raw"), 6).alias("med"),
            F.round(F.col("mad_raw"), 6).alias("mad"),
            F.round(score, 6).alias("mad_score"),
        )
    )


@register(
    "stats_ttest_welch",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
      FROM events
    ),
    g AS (
      SELECT event_type,
             CAST(count(*) AS DECIMAL(9,0)) AS n,
             CAST(sum(yc) AS DECIMAL(20,0)) AS s1,
             CAST(sum(CAST(yc AS DECIMAL(19,0)) * yc) AS DECIMAL(30,0)) AS s2
      FROM b GROUP BY event_type
    ),
    t AS (
      SELECT event_type, n, s1, s2,
             CAST(sum(n) OVER () AS DECIMAL(12,0)) AS tn,
             CAST(sum(s1) OVER () AS DECIMAL(24,0)) AS ts1,
             CAST(sum(s2) OVER () AS DECIMAL(34,0)) AS ts2
      FROM g
    ),
    d AS (
      SELECT event_type,
             CAST(n AS BIGINT) AS n,
             CAST(tn - n AS BIGINT) AS n_rest,
             CAST(n AS DOUBLE) AS n1,
             CAST(s1 AS DOUBLE) AS a1,
             CAST(s2 AS DOUBLE) AS q1,
             CAST(tn - n AS DOUBLE) AS n2,
             CAST(ts1 - s1 AS DOUBLE) AS a2,
             CAST(ts2 - s2 AS DOUBLE) AS q2
      FROM t
    ),
    e AS (
      SELECT event_type, n, n_rest, n1, n2,
             a1 / n1 AS m1, a2 / n2 AS m2,
             ((q1 - a1 * a1 / n1) / (n1 - 1)) / n1 AS w1,
             ((q2 - a2 * a2 / n2) / (n2 - 1)) / n2 AS w2
      FROM d
    )
    SELECT event_type, n, n_rest,
           round((m1 - m2) / sqrt(w1 + w2), 9) AS t_welch,
           round((w1 + w2) * (w1 + w2)
                 / (w1 * w1 / (n1 - 1) + w2 * w2 / (n2 - 1)), 6) AS df_welch
    FROM e
    """,
    doc="Welch's unequal-variance t-test of each group's mean metric "
    "against the pooled rest — the A/B readout. The three sufficient "
    "statistics per group (n, sum, sum-of-squares over integer "
    "cents) are EXACT decimals with precisions sized for 1e12 rows "
    "(s2 <= ~1e16 per row-pair at max |value| ~ 5e2 dollars; "
    "DECIMAL(30,0) holds 1e12 of them); the complement group's stats "
    "are derived by subtracting from totals computed as a GLOBAL "
    "WINDOW over the already-reduced per-group rows — so the whole "
    "test is ONE map-side-combined pass over the data, no second "
    "scan branch and no join for the 'rest' side (a naive "
    "cross-join-totals shape made Catalyst replan the scan). t and "
    "the Welch-Satterthwaite df are then evaluated in DOUBLE with "
    "the identical expression tree on both engines (squares written "
    "as x*x, never pow(x,2) — libm pow need not equal the exact "
    "product). t is scale-invariant so the cents bridge cancels.",
)
def stats_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir)
    b = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("yc"),
    )
    g = b.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(9,0)").alias("n"),
        F.sum("yc").cast("decimal(20,0)").alias("s1"),
        F.sum(F.col("yc").cast("decimal(19,0)") * F.col("yc"))
        .cast("decimal(30,0)")
        .alias("s2"),
    )
    wg = Window.partitionBy()
    t = g.select(
        "event_type",
        "n",
        "s1",
        "s2",
        F.sum("n").over(wg).cast("decimal(12,0)").alias("tn"),
        F.sum("s1").over(wg).cast("decimal(24,0)").alias("ts1"),
        F.sum("s2").over(wg).cast("decimal(34,0)").alias("ts2"),
    )
    d = t.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        (F.col("tn") - F.col("n")).cast("bigint").alias("n_rest"),
        F.col("n").cast("double").alias("n1"),
        F.col("s1").cast("double").alias("a1"),
        F.col("s2").cast("double").alias("q1"),
        (F.col("tn") - F.col("n")).cast("double").alias("n2"),
        (F.col("ts1") - F.col("s1")).cast("double").alias("a2"),
        (F.col("ts2") - F.col("s2")).cast("double").alias("q2"),
    )
    e = d.select(
        "event_type",
        "n",
        "n_rest",
        "n1",
        "n2",
        (F.col("a1") / F.col("n1")).alias("m1"),
        (F.col("a2") / F.col("n2")).alias("m2"),
        (
            ((F.col("q1") - F.col("a1") * F.col("a1") / F.col("n1")) / (F.col("n1") - 1))
            / F.col("n1")
        ).alias("w1"),
        (
            ((F.col("q2") - F.col("a2") * F.col("a2") / F.col("n2")) / (F.col("n2") - 1))
            / F.col("n2")
        ).alias("w2"),
    )
    return e.select(
        "event_type",
        "n",
        "n_rest",
        F.round(
            (F.col("m1") - F.col("m2")) / F.sqrt(F.col("w1") + F.col("w2")), 9
        ).alias("t_welch"),
        F.round(
            (F.col("w1") + F.col("w2"))
            * (F.col("w1") + F.col("w2"))
            / (
                F.col("w1") * F.col("w1") / (F.col("n1") - 1)
                + F.col("w2") * F.col("w2") / (F.col("n2") - 1)
            ),
            6,
        ).alias("df_welch"),
    )


@register(
    "time_autocorr_lag1",
    oracle="""
    WITH b AS (
      SELECT event_type, ts, event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
      FROM events WHERE ts IS NOT NULL
    ),
    p AS (
      SELECT event_type, yc AS x,
             lead(yc) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
             ) AS y
      FROM b
    ),
    q AS (SELECT event_type, x, y FROM p WHERE y IS NOT NULL),
    s AS (
      SELECT event_type,
             CAST(count(*) AS DECIMAL(9,0)) AS n,
             CAST(sum(x) AS DECIMAL(20,0)) AS sx,
             CAST(sum(y) AS DECIMAL(20,0)) AS sy,
             CAST(sum(CAST(x AS DECIMAL(19,0)) * y) AS DECIMAL(30,0)) AS sxy,
             CAST(sum(CAST(x AS DECIMAL(19,0)) * x) AS DECIMAL(30,0)) AS sxx,
             CAST(sum(CAST(y AS DECIMAL(19,0)) * y) AS DECIMAL(30,0)) AS syy
      FROM q GROUP BY event_type
    ),
    d AS (
      SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
             CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
             CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
             CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
      FROM s
    )
    SELECT event_type, n_pairs,
           round((nd * sxyd - sxd * syd)
                 / sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)),
                 9) AS r1
    FROM d
    WHERE (nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd) > 0
    """,
    doc="Lag-1 autocorrelation of the metric per series — 'is this "
    "signal noise or does it have memory', the first diagnostic "
    "before any forecasting model. Consecutive pairs come from ONE "
    "lead() pass per series (ordered by ts with the event_id "
    "tiebreak for same-timestamp determinism); the Pearson r over "
    "pairs is then the sufficient-statistics shape: six exact-"
    "decimal aggregates over integer cents (map-side combined), the "
    "closed form evaluated in DOUBLE with the identical expression "
    "tree on both engines, zero-variance series filtered on the "
    "EXACT-derived doubles so both engines drop the same rows. The "
    "series key here is low-cardinality, so the sort window range-"
    "partitions; at 100 TB the same operator runs per (series, "
    "time-chunk) with one boundary row handed across chunks.",
)
def time_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir).filter(F.col("ts").isNotNull())
    b = ev.select(
        "event_type",
        "ts",
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("yc"),
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    p = b.select(
        "event_type",
        F.col("yc").alias("x"),
        F.lead("yc").over(w).alias("y"),
    )
    q = p.filter(F.col("y").isNotNull())
    s = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(9,0)").alias("n"),
        F.sum("x").cast("decimal(20,0)").alias("sx"),
        F.sum("y").cast("decimal(20,0)").alias("sy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("y"))
        .cast("decimal(30,0)")
        .alias("sxy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x"))
        .cast("decimal(30,0)")
        .alias("sxx"),
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y"))
        .cast("decimal(30,0)")
        .alias("syy"),
    )
    d = s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_pairs"),
        F.col("n").cast("double").alias("nd"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sy").cast("double").alias("syd"),
        F.col("sxy").cast("double").alias("sxyd"),
        F.col("sxx").cast("double").alias("sxxd"),
        F.col("syy").cast("double").alias("syyd"),
    )
    varx = F.col("nd") * F.col("sxxd") - F.col("sxd") * F.col("sxd")
    vary = F.col("nd") * F.col("syyd") - F.col("syd") * F.col("syd")
    return (
        d.filter(varx * vary > 0)
        .select(
            "event_type",
            "n_pairs",
            F.round(
                (F.col("nd") * F.col("sxyd") - F.col("sxd") * F.col("syd"))
                / F.sqrt(varx * vary),
                9,
            ).alias("r1"),
        )
    )


# A/B experiment readout: variant by hash parity, conversion = any
# purchase within this many days of the user's first event.
AB_CONV_DAYS = 2


@register(
    "events_ab_test_lift",
    oracle=f"""
    WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id),
    conv AS (
      SELECT f.user_id,
             CASE WHEN (CAST(('0x' || substring(md5(CAST(f.user_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 2) = 0
                  THEN 'control' ELSE 'treatment' END AS variant,
             max(CASE WHEN e.event_type = 'purchase'
                       AND e.ts <= f.first_ts + INTERVAL {AB_CONV_DAYS} DAY
                      THEN 1 ELSE 0 END) AS converted
      FROM f JOIN events e ON e.user_id = f.user_id
      GROUP BY f.user_id
    ),
    agg AS (
      SELECT CAST(sum(CASE WHEN variant = 'control' THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             CAST(sum(CASE WHEN variant = 'treatment' THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             CAST(sum(CASE WHEN variant = 'control' THEN converted ELSE 0 END) AS BIGINT) AS conv_c,
             CAST(sum(CASE WHEN variant = 'treatment' THEN converted ELSE 0 END) AS BIGINT) AS conv_t
      FROM conv
    )
    SELECT n_c, n_t, conv_c, conv_t,
           round(CAST(conv_c AS DOUBLE) / n_c, 6) AS p_c,
           round(CAST(conv_t AS DOUBLE) / n_t, 6) AS p_t,
           round((CAST(conv_t AS DOUBLE) / n_t) / (CAST(conv_c AS DOUBLE) / n_c) - 1.0, 6)
             AS rel_lift,
           round(((CAST(conv_t AS DOUBLE) / n_t) - (CAST(conv_c AS DOUBLE) / n_c))
                 / sqrt((CAST(conv_c + conv_t AS DOUBLE) / (n_c + n_t))
                        * (1.0 - CAST(conv_c + conv_t AS DOUBLE) / (n_c + n_t))
                        * (1.0 / n_c + 1.0 / n_t)), 6) AS z_stat
    FROM agg
    """,
    doc="A/B experiment readout (two-proportion z-test): users split "
    "into control/treatment by md5-parity of user_id (the shared "
    "deterministic-coin kernel — in production the assignment IS a "
    "hash of (user, experiment) exactly like this), conversion = any "
    f"purchase within {AB_CONV_DAYS} days of the user's first event, "
    "output = counts, rates, relative lift, and the pooled z "
    "statistic. Completes the experimentation family beside "
    "stats_ttest_welch (means) and stats_ks_test (distributions) "
    "with the proportion test product analytics actually runs. "
    "Exact bigint counts from two user-keyed aggregates collapse to "
    "ONE row before any float op; lift and z are one identical "
    "expression tree per engine (divisions + a single sqrt). At "
    "100 TB this is two map-side-combined passes over the events "
    "scan — assignment is stateless hashing, never a lookup table.",
)
def events_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    f = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    parity = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10).cast("long")
        % 2
    )
    conv = (
        f.join(e, "user_id")
        .groupBy("user_id", "first_ts")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") <= F.col("first_ts") + F.expr(f"INTERVAL {AB_CONV_DAYS} DAYS")),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
        .select(
            F.when(parity == 0, F.lit("control")).otherwise(F.lit("treatment")).alias("variant"),
            "converted",
        )
    )
    agg = conv.agg(
        F.sum(F.when(F.col("variant") == "control", 1).otherwise(0)).cast("bigint").alias("n_c"),
        F.sum(F.when(F.col("variant") == "treatment", 1).otherwise(0)).cast("bigint").alias("n_t"),
        F.sum(F.when(F.col("variant") == "control", F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_c"),
        F.sum(F.when(F.col("variant") == "treatment", F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_t"),
    )
    p_c = F.col("conv_c").cast("double") / F.col("n_c")
    p_t = F.col("conv_t").cast("double") / F.col("n_t")
    p_pool = (F.col("conv_c") + F.col("conv_t")).cast("double") / (F.col("n_c") + F.col("n_t"))
    z = (p_t - p_c) / F.sqrt(
        p_pool * (F.lit(1.0) - p_pool) * (F.lit(1.0) / F.col("n_c") + F.lit(1.0) / F.col("n_t"))
    )
    return agg.select(
        "n_c",
        "n_t",
        "conv_c",
        "conv_t",
        F.round(p_c, 6).alias("p_c"),
        F.round(p_t, 6).alias("p_t"),
        F.round(p_t / p_c - 1.0, 6).alias("rel_lift"),
        F.round(z, 6).alias("z_stat"),
    )


# Wilson 95% score interval (z pinned; z^2 appears as a literal so
# both engines fold the same constant).
WILSON_Z = 1.96


@register(
    "events_error_rate_wilson",
    oracle=f"""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hour,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
               AS errs
      FROM events GROUP BY 1
    )
    SELECT hour, n, errs,
           round(CAST(errs AS DOUBLE) / n, 6) AS rate,
           round(((CAST(errs AS DOUBLE) / n) + {WILSON_Z}*{WILSON_Z}/(2*n)
                  - {WILSON_Z} * sqrt(((CAST(errs AS DOUBLE)/n)*(1.0 - CAST(errs AS DOUBLE)/n)
                                       + {WILSON_Z}*{WILSON_Z}/(4*n))/n))
                 / (1.0 + {WILSON_Z}*{WILSON_Z}/n), 6) + 0.0 AS wilson_lo,
           round(((CAST(errs AS DOUBLE) / n) + {WILSON_Z}*{WILSON_Z}/(2*n)
                  + {WILSON_Z} * sqrt(((CAST(errs AS DOUBLE)/n)*(1.0 - CAST(errs AS DOUBLE)/n)
                                       + {WILSON_Z}*{WILSON_Z}/(4*n))/n))
                 / (1.0 + {WILSON_Z}*{WILSON_Z}/n), 6) AS wilson_hi
    FROM h
    """,
    doc="Hourly error-rate monitoring with a Wilson 95% score "
    "interval: the ratio metric done right — at 15 events/hour a raw "
    "rate of 0.2 swings wildly, and the naive Wald interval collapses "
    "at p near 0; Wilson stays calibrated at small n, which is why "
    "SRE burn-rate alerting uses it. One map-side-combined aggregate "
    "per hour bucket, then pure per-row arithmetic (divisions + one "
    "sqrt — IEEE-exact) on the time-bounded bucket table. Counts stay "
    "exact bigints into the float stage; both engines fold the same "
    "z-constant literals.",
)
def events_error_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    h = e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("errs"),
    )
    z = F.lit(WILSON_Z)
    p = F.col("errs").cast("double") / F.col("n")
    center = p + z * z / (2 * F.col("n"))
    margin = z * F.sqrt((p * (F.lit(1.0) - p) + z * z / (4 * F.col("n"))) / F.col("n"))
    denom = F.lit(1.0) + z * z / F.col("n")
    return h.select(
        "hour",
        "n",
        "errs",
        F.round(p, 6).alias("rate"),
        # + 0.0 normalizes IEEE negative zero: at errs=0 the exact-zero
        # lower bound reaches round() as a tiny negative on one engine
        # and not the other, and '-0.0' hash-renders differently from
        # '0.0' even though they compare equal
        (F.round((center - margin) / denom, 6) + F.lit(0.0)).alias("wilson_lo"),
        F.round((center + margin) / denom, 6).alias("wilson_hi"),
    )


# Additive smoothing weight for target encoding (pseudo-observations
# of the global mean blended into each category).
TARGET_ENC_SMOOTH = 20.0


@register(
    "feature_target_encoding",
    oracle=f"""
    WITH g AS (
      SELECT CAST(count(*) AS BIGINT) AS n_all,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
               AS s_all
      FROM lineitem
    ),
    c AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s
      FROM lineitem GROUP BY 1
    )
    SELECT c.l_returnflag, c.n,
           round(CAST(c.s AS DOUBLE) / c.n, 6) AS cat_mean,
           round(CAST(g.s_all AS DOUBLE) / g.n_all, 6) AS global_mean,
           round((CAST(c.s AS DOUBLE) + {TARGET_ENC_SMOOTH}
                  * (CAST(g.s_all AS DOUBLE) / g.n_all))
                 / (c.n + {TARGET_ENC_SMOOTH}), 6) AS encoded
    FROM c, g
    """,
    doc="Smoothed target encoding (the categorical-feature transform "
    "for tree/linear models): each category's mean target blended "
    f"toward the global mean with {TARGET_ENC_SMOOTH:.0f} "
    "pseudo-observations — rare categories shrink to the prior "
    "instead of memorizing noise, the m-estimate form of the "
    "encoding. Sums accumulate in exact DECIMAL on both engines and "
    "enter ONE identical float expression; the category table is "
    "dimension-sized (the scan pays one map-side-combined aggregate), "
    "and applying the encoding downstream is a broadcast join at "
    "scan speed — the same shape quality_winsorize uses. "
    "Leakage note: production target encoding must fit on the train "
    "split only (split_train_holdout / split_kfold provide the "
    "folds); this operator is the fit step.",
)
def feature_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    g = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum(price).cast("decimal(38,2)").alias("s_all"),
    )
    c = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(price).cast("decimal(38,2)").alias("s"),
    )
    gmean = F.col("s_all").cast("double") / F.col("n_all")
    return c.crossJoin(F.broadcast(g)).select(
        "l_returnflag",
        "n",
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("cat_mean"),
        F.round(gmean, 6).alias("global_mean"),
        F.round(
            (F.col("s").cast("double") + F.lit(TARGET_ENC_SMOOTH) * gmean)
            / (F.col("n") + F.lit(TARGET_ENC_SMOOTH)),
            6,
        ).alias("encoded"),
    )


@register(
    "events_gini_concentration",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id
    ),
    rk AS (
      SELECT n, row_number() OVER (ORDER BY n, user_id) AS i FROM u
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users, CAST(sum(n) AS BIGINT) AS total
      FROM u
    )
    SELECT t.n_users, t.total,
           round(CAST(sum((2 * rk.i - t.n_users - 1) * rk.n) AS DOUBLE)
                 / (CAST(t.n_users AS DOUBLE) * t.total), 6) AS gini
    FROM rk, tot t GROUP BY t.n_users, t.total
    """,
    doc="Gini coefficient of activity concentration (how unequal is "
    "usage across users — the one-number answer to 'do 1% of users "
    "generate 90% of events', the summary statistic of the curve "
    "pareto_revenue_share tabulates). Computed by the sorted-index "
    "identity G = sum((2i-n-1)·x_i) / (n·sum x): the rank window "
    "runs over the USER-sized count table with a (count, user_id) "
    "total order, every term is an exact bigint, and one final "
    "division produces the coefficient — hash-stable by "
    "construction. At 100 TB the corpus pays one map-side-combined "
    "count per user; the single-partition rank sort is entity-sized, "
    "and for billion-user tables the same identity runs on a "
    "bucketed histogram of counts instead (the "
    "quality_quantile_normalize trick).",
)
def events_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, "events", sf_dir)
    u = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    rk = u.select("n", "user_id").withColumn(
        "i", F.row_number().over(Window.orderBy("n", "user_id"))
    )
    tot = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("n").cast("bigint").alias("total"),
    )
    return (
        rk.crossJoin(F.broadcast(tot))
        .groupBy("n_users", "total")
        .agg(
            F.round(
                F.sum((2 * F.col("i") - F.col("n_users") - 1) * F.col("n")).cast("double")
                / (F.col("n_users").cast("double") * F.col("total")),
                6,
            ).alias("gini")
        )
    )


@register(
    "time_changepoint_binary",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    k AS (
      SELECT h, n, row_number() OVER (ORDER BY h) AS i FROM b
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(n) AS BIGINT) AS s,
             CAST(sum(n * n) AS BIGINT) AS ss
      FROM k
    ),
    pre AS (
      SELECT h, i,
             CAST(sum(n) OVER w AS BIGINT) AS s_l,
             CAST(sum(n * n) OVER w AS BIGINT) AS ss_l
      FROM k
      WINDOW w AS (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    cand AS (
      SELECT pre.h, pre.i, t.m - pre.i AS n_r, pre.i AS n_l,
             (pre.ss_l - CAST(pre.s_l AS DOUBLE) * pre.s_l / pre.i)
             + ((t.ss - pre.ss_l)
                - CAST(t.s - pre.s_l AS DOUBLE) * (t.s - pre.s_l) / (t.m - pre.i))
               AS sse,
             CAST(pre.s_l AS DOUBLE) / pre.i AS mean_l,
             CAST(t.s - pre.s_l AS DOUBLE) / (t.m - pre.i) AS mean_r
      FROM pre, tot t
      WHERE pre.i < t.m
    )
    SELECT h AS split_after, n_l, n_r,
           round(mean_l, 6) AS mean_l, round(mean_r, 6) AS mean_r,
           round(sse, 6) AS sse
    FROM (
      SELECT *, row_number() OVER (ORDER BY sse, i) AS rk FROM cand
    ) WHERE rk = 1
    """,
    doc="Binary changepoint detection on the hourly event-volume "
    "series: the split minimizing total within-segment SSE — the "
    "classic 'when did the level shift' question (one round of binary "
    "segmentation; iterating on each side is the full algorithm, and "
    "the single audited round is the hash-checkable unit, the "
    "fixed-round convention of graph_walk_diffusion/LPA). Every "
    "candidate split's SSE comes from EXACT integer prefix sums "
    "(sum, sum-of-squares) via the computational identity "
    "SSE = ss - s^2/n — one window pass builds all candidates, no "
    "per-split rescan, and the only float ops are two divisions per "
    "candidate in an identical expression tree, so the argmin (with "
    "an index tiebreak) is engine-stable. Cost shape: one "
    "map-side-combined aggregate over the corpus; everything after "
    "runs on the calendar-sized bucket table.",
)
def time_changepoint_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    b = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    k = b.withColumn("i", F.row_number().over(Window.orderBy("h")))
    tot = k.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("n").cast("bigint").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("ss"),
    )
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pre = k.select(
        "h",
        "i",
        F.sum("n").over(w).cast("bigint").alias("s_l"),
        F.sum(F.col("n") * F.col("n")).over(w).cast("bigint").alias("ss_l"),
    )
    c = pre.crossJoin(F.broadcast(tot)).filter(F.col("i") < F.col("m"))
    n_l = F.col("i")
    n_r = F.col("m") - F.col("i")
    s_r = F.col("s") - F.col("s_l")
    sse = (
        F.col("ss_l") - F.col("s_l").cast("double") * F.col("s_l") / n_l
    ) + ((F.col("ss") - F.col("ss_l")) - s_r.cast("double") * s_r / n_r)
    cand = c.select(
        "h",
        "i",
        n_l.alias("n_l"),
        n_r.alias("n_r"),
        sse.alias("sse"),
        (F.col("s_l").cast("double") / n_l).alias("mean_l"),
        (s_r.cast("double") / n_r).alias("mean_r"),
    )
    wr = Window.orderBy("sse", "i")
    return (
        cand.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            F.col("h").alias("split_after"),
            "n_l",
            "n_r",
            F.round("mean_l", 6).alias("mean_l"),
            F.round("mean_r", 6).alias("mean_r"),
            F.round("sse", 6).alias("sse"),
        )
    )


# One-way ANOVA across the 7 ISO weekdays. Large-df F critical value
# at alpha = 0.05 for df1 = 6 (the weekday contrast): F(6, inf).
ANOVA_F_CRIT = 2.0986


def _anova_terms(engine: str) -> str:
    """The SSB partial Σ s_g²/n_g as SEVEN EXPLICIT fixed-order
    addends (one per ISO weekday): a SQL SUM() over the group rows
    would accumulate the seven float terms in engine-specific order
    (the forbidden float-sum), while an explicit a+b+...+g expression
    tree is IEEE-identical on both engines."""
    cols = [f"(CAST(s{d} AS DOUBLE) * s{d} / n{d})" for d in range(1, 8)]
    return " + ".join(cols)


@register(
    "stats_anova_weekday",
    oracle=f"""
    WITH b AS (
      SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    d AS (SELECT CAST(isodow(h) AS BIGINT) AS dow, n FROM b),
    p AS (
      SELECT
        {", ".join(f'''CAST(sum(CASE WHEN dow = {d} THEN 1 ELSE 0 END) AS BIGINT) AS n{d},
        CAST(sum(CASE WHEN dow = {d} THEN n ELSE 0 END) AS BIGINT) AS s{d}''' for d in range(1, 8))},
        CAST(count(*) AS BIGINT) AS big_n,
        CAST(sum(n) AS BIGINT) AS s,
        CAST(sum(n * n) AS BIGINT) AS ss
      FROM d
    )
    SELECT big_n, CAST(7 AS BIGINT) AS k,
           round(({_anova_terms('sql')}) - CAST(s AS DOUBLE) * s / big_n, 6) AS ssb,
           round((ss - CAST(s AS DOUBLE) * s / big_n)
                 - (({_anova_terms('sql')}) - CAST(s AS DOUBLE) * s / big_n), 6) AS ssw,
           round(((({_anova_terms('sql')}) - CAST(s AS DOUBLE) * s / big_n) / 6)
                 / (((ss - CAST(s AS DOUBLE) * s / big_n)
                     - (({_anova_terms('sql')}) - CAST(s AS DOUBLE) * s / big_n))
                    / (big_n - 7)), 6) AS f_stat,
           (((({_anova_terms('sql')}) - CAST(s AS DOUBLE) * s / big_n) / 6)
            / (((ss - CAST(s AS DOUBLE) * s / big_n)
                - (({_anova_terms('sql')}) - CAST(s AS DOUBLE) * s / big_n))
               / (big_n - 7)) > {ANOVA_F_CRIT}) AS reject_h0
    FROM p
    """,
    doc="One-way ANOVA: does the ISO weekday explain hourly event "
    "volume (F = between-group over within-group mean square) — "
    "completing the statistical battery beside KS (distributions), "
    "Welch (two means), chi-square (categorical), the A/B z "
    "(proportions), and Wilson (rates) with the k-group mean "
    "comparison. Float-determinism: SSB needs Σ s_g²/n_g, and a "
    "SUM() over the 7 group rows would accumulate floats in "
    "engine-specific order — instead the weekday groups PIVOT into "
    "one row via exact conditional bigint aggregates and the seven "
    "terms add in one explicit fixed-order expression tree, "
    "IEEE-identical on both engines. The corpus pays one hour-bucket "
    "aggregate; everything else is arithmetic on one row. The "
    "rejection flag uses the large-df F(6, inf) critical value at "
    "alpha = 0.05 (df2 = 713 here; exact-df critical values differ "
    "in the third decimal).",
)
def stats_anova_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.clickhouse import toDayOfWeek

    e = load(spark, "events", sf_dir)
    b = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    d = b.select(toDayOfWeek("h").cast("bigint").alias("dow"), "n")
    aggs = []
    for k in range(1, 8):
        aggs.append(
            F.sum(F.when(F.col("dow") == k, 1).otherwise(0)).cast("bigint").alias(f"n{k}")
        )
        aggs.append(
            F.sum(F.when(F.col("dow") == k, F.col("n")).otherwise(0))
            .cast("bigint")
            .alias(f"s{k}")
        )
    p = d.agg(
        *aggs,
        F.count(F.lit(1)).cast("bigint").alias("big_n"),
        F.sum("n").cast("bigint").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("ss"),
    )
    terms = None
    for k in range(1, 8):
        t = F.col(f"s{k}").cast("double") * F.col(f"s{k}") / F.col(f"n{k}")
        terms = t if terms is None else terms + t
    correction = F.col("s").cast("double") * F.col("s") / F.col("big_n")
    ssb = terms - correction
    ssw = (F.col("ss") - correction) - ssb
    f_stat = (ssb / 6) / (ssw / (F.col("big_n") - 7))
    return p.select(
        "big_n",
        F.lit(7).cast("bigint").alias("k"),
        F.round(ssb, 6).alias("ssb"),
        F.round(ssw, 6).alias("ssw"),
        F.round(f_stat, 6).alias("f_stat"),
        (f_stat > ANOVA_F_CRIT).alias("reject_h0"),
    )


# Benford first-digit expectations log10(1 + 1/d), pinned as Python
# float literals embedded IDENTICALLY in both engines' expressions
# (never recomputed via each engine's log10 — rule 4's no-libm-drift
# discipline applied to constants).
import math as _math

BENFORD_P = {d: _math.log10(1 + 1 / d) for d in range(1, 10)}


def _benford_case_sql() -> str:
    cases = " ".join(f"WHEN {d} THEN {BENFORD_P[d]!r}" for d in range(1, 10))
    return f"CAST((CASE c.digit {cases} END) AS DOUBLE)"


@register(
    "stats_benford_digits",
    oracle=f"""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders
    ),
    c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
    SELECT c.digit, c.n,
           round({_benford_case_sql()}, 6) AS benford_p,
           round(CAST(c.n AS DOUBLE) / t.total, 6) AS observed_p,
           round((CAST(c.n AS DOUBLE) - t.total * {_benford_case_sql()})
                 * (CAST(c.n AS DOUBLE) - t.total * {_benford_case_sql()})
                 / (t.total * {_benford_case_sql()}), 6) AS chi2_term
    FROM c, t
    """,
    doc="Benford's-law first-digit analysis of order amounts: observed "
    "vs expected leading-digit frequencies with per-digit chi-square "
    "contributions — the forensic-accounting screen for fabricated or "
    "constrained numbers (organic multi-scale amounts follow "
    "log10(1+1/d); this synthetic uniform-ish price column loudly "
    "does NOT, which is itself the correct reading). The expected "
    "frequencies are PYTHON-pinned float literals injected verbatim "
    "into both engines — computing log10 per engine would invite "
    "libm drift; a literal cannot drift. First digits come from "
    "integer/string ops (no float log to find the magnitude); counts "
    "are exact; each chi2 term is one identical expression on a "
    "9-row table.",
)
def stats_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    c = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    t = c.agg(F.sum("n").cast("bigint").alias("total"))
    p = F.lit(None).cast("double")
    expr = None
    for d in range(1, 10):
        branch = F.when(F.col("digit") == d, F.lit(BENFORD_P[d]))
        expr = branch if expr is None else expr.when(F.col("digit") == d, F.lit(BENFORD_P[d]))
    p = expr.cast("double")
    dev = F.col("n").cast("double") - F.col("total") * p
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            F.round(p, 6).alias("benford_p"),
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias("observed_p"),
            F.round(dev * dev / (F.col("total") * p), 6).alias("chi2_term"),
        )
    )


@register(
    "events_dispersion_index",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(n) AS BIGINT) AS total,
           round(CAST(sum(n) AS DOUBLE) / count(*), 6) AS mean_rate,
           round((CAST(sum(n * n) AS DOUBLE)
                  - CAST(sum(n) AS DOUBLE) * sum(n) / count(*))
                 / (count(*) - 1)
                 / (CAST(sum(n) AS DOUBLE) / count(*)), 6) AS dispersion
    FROM b GROUP BY event_type
    """,
    doc="Index of dispersion (variance-to-mean ratio) of hourly "
    "arrival counts per event stream: a Poisson process sits at 1.0; "
    "meaningfully above means bursty/clumped arrivals (self-exciting "
    "traffic, bot storms), below means smoothed/rate-limited — the "
    "one-number answer to 'is this stream actually Poisson', which "
    "the monitoring family's z-score thresholds quietly assume. "
    "Variance derives from exact integer sum/sum-of-squares with the "
    "computational identity (no float accumulation), sample-variance "
    "n-1 denominator, two final divisions. One corpus aggregate; the "
    "statistic reduces calendar-sized buckets per type.",
)
def events_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    b = e.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    m = F.count(F.lit(1))
    s = F.sum("n")
    ss = F.sum(F.col("n") * F.col("n"))
    mean = s.cast("double") / m
    var = (ss.cast("double") - s.cast("double") * s / m) / (m - 1)
    return b.groupBy("event_type").agg(
        m.cast("bigint").alias("n_buckets"),
        s.cast("bigint").alias("total"),
        F.round(mean, 6).alias("mean_rate"),
        F.round(var / mean, 6).alias("dispersion"),
    )


# Wilson-Hilferty chi-square critical approximation at alpha = 0.05:
# crit(df) ~ df * (1 - 2/(9 df) + z * sqrt(2/(9 df)))^3 with the
# standard-normal 95th percentile pinned as a literal (never each
# engine's quantile function). Exact to ~0.1% for df >= 3 — and the
# SAME approximation evaluates on both engines, so the reject flag
# can never disagree cross-engine even where WH differs from the
# exact quantile.
WH_Z95 = 1.6448536269514722


@register(
    "stats_chi_square",
    oracle=f"""
    WITH b AS (
      SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r_tot FROM b GROUP BY 1),
    c AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c_tot FROM b GROUP BY 1),
    t AS (SELECT CAST(sum(o) AS BIGINT) AS big_n, CAST(count(*) AS BIGINT) AS n_cells,
                 CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
                 CAST(count(DISTINCT dow) AS BIGINT) AS n_dows
          FROM b),
    cell AS (
      SELECT CAST(round(
               (b.o - CAST(r.r_tot AS DOUBLE) * c.c_tot / t.big_n)
               * (b.o - CAST(r.r_tot AS DOUBLE) * c.c_tot / t.big_n)
               / (CAST(r.r_tot AS DOUBLE) * c.c_tot / t.big_n), 6)
             AS DECIMAL(28,6)) AS term
      FROM b JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN t
    ),
    s AS (SELECT CAST(sum(term) AS DECIMAL(28,6)) AS chi2 FROM cell)
    SELECT t.big_n, t.n_types, t.n_dows,
           (t.n_types - 1) * (t.n_dows - 1) AS df,
           s.chi2,
           round(((t.n_types - 1) * (t.n_dows - 1))
                 * pow(1.0 - 2.0 / (9.0 * ((t.n_types - 1) * (t.n_dows - 1)))
                       + {WH_Z95!r} * sqrt(2.0 / (9.0 * ((t.n_types - 1) * (t.n_dows - 1)))),
                       3.0), 6) AS chi2_crit,
           (CAST(s.chi2 AS DOUBLE) >
            ((t.n_types - 1) * (t.n_dows - 1))
                 * pow(1.0 - 2.0 / (9.0 * ((t.n_types - 1) * (t.n_dows - 1)))
                       + {WH_Z95!r} * sqrt(2.0 / (9.0 * ((t.n_types - 1) * (t.n_dows - 1)))),
                       3.0)) AS reject_h0
    FROM t CROSS JOIN s
    """,
    doc="Pearson chi-square test of INDEPENDENCE on the event_type x "
    "ISO-weekday contingency table (is traffic mix stable across the "
    "week?) — the two-axis companion to text_source_divergence's "
    "one-axis goodness-of-fit. Expected counts are the marginal "
    "product r*c/N; each cell's (o-e)^2/e evaluates in DOUBLE from "
    "exact BIGINT marginals (every integer < 2^53, so the operands "
    "are exact and IEEE's correctly-rounded ops make the term "
    "bit-identical cross-engine), is rounded to 6 decimals, and the "
    "cell terms then SUM as DECIMAL — exact and order-independent, "
    "so the float-summation-order hazard never arises (the per-cell "
    "rounding is the operator's contract, like the integer-mass "
    "diffusion). The corpus pays ONE map-side-combined aggregate "
    "into the type x weekday histogram; marginals and the statistic "
    "derive from those ~35 rows. The alpha=0.05 critical value uses "
    "the Wilson-Hilferty cube approximation with a pinned z literal, "
    "evaluated identically on both engines.",
)
def stats_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.clickhouse import toDayOfWeek
    from ..plans.stage import eager_release

    e = load(spark, "events", sf_dir)
    b = (
        e.groupBy("event_type", toDayOfWeek("ts").cast("bigint").alias("dow"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
        .persist()
    )
    r = b.groupBy("event_type").agg(F.sum("o").cast("bigint").alias("r_tot"))
    c = b.groupBy("dow").agg(F.sum("o").cast("bigint").alias("c_tot"))
    t = b.agg(
        F.sum("o").cast("bigint").alias("big_n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
        F.countDistinct("dow").cast("bigint").alias("n_dows"),
    )
    exp = F.col("r_tot").cast("double") * F.col("c_tot") / F.col("big_n")
    term = (F.col("o") - exp) * (F.col("o") - exp) / exp
    cells = (
        b.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "dow")
        .crossJoin(F.broadcast(t.select("big_n")))
        .select(F.round(term, 6).cast("decimal(28,6)").alias("term"))
    )
    s = cells.agg(F.sum("term").cast("decimal(28,6)").alias("chi2"))
    df_ = (F.col("n_types") - 1) * (F.col("n_dows") - 1)
    wh = df_ * F.pow(
        F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * df_)
        + F.lit(WH_Z95) * F.sqrt(F.lit(2.0) / (F.lit(9.0) * df_)),
        F.lit(3.0),
    )
    out = t.crossJoin(F.broadcast(s)).select(
        "big_n",
        "n_types",
        "n_dows",
        df_.alias("df"),
        "chi2",
        F.round(wh, 6).alias("chi2_crit"),
        (F.col("chi2").cast("double") > wh).alias("reject_h0"),
    )
    return eager_release(out, "chi_square", b)


# Two-sided normal critical value at alpha = 0.05, pinned literal.
MW_Z_CRIT = 1.959963984540054


@register(
    "stats_mann_whitney",
    oracle=f"""
    WITH v AS (
      SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    gh AS (SELECT value, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
    ct AS (
      SELECT value, cnt,
             CAST(sum(cnt) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
               AS BIGINT) AS cum_before
      FROM gh
    ),
    tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS big_n,
             CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_t
      FROM gh
    ),
    tv AS (
      SELECT event_type, value, CAST(count(*) AS BIGINT) AS c_t
      FROM v GROUP BY 1, 2
    ),
    rk AS (
      SELECT tv.event_type,
             CAST(sum(tv.c_t * (2 * ct.cum_before + ct.cnt + 1)) AS BIGINT) AS r2,
             CAST(sum(tv.c_t) AS BIGINT) AS n1
      FROM tv JOIN ct USING (value)
      GROUP BY tv.event_type
    )
    SELECT rk.event_type, rk.n1, (tot.big_n - rk.n1) AS n2,
           (rk.r2 - rk.n1 * (rk.n1 + 1)) AS u2,
           round((rk.r2 - rk.n1 * (rk.n1 + 1) - CAST(rk.n1 AS DOUBLE) * (tot.big_n - rk.n1))
                 / (2.0 * sqrt(CAST(rk.n1 AS DOUBLE) * (tot.big_n - rk.n1) / 12.0
                    * ((tot.big_n + 1) - CAST(tot.tie_t AS DOUBLE)
                       / (CAST(tot.big_n AS DOUBLE) * (tot.big_n - 1))))), 6) AS z,
           (abs((rk.r2 - rk.n1 * (rk.n1 + 1) - CAST(rk.n1 AS DOUBLE) * (tot.big_n - rk.n1))
                 / (2.0 * sqrt(CAST(rk.n1 AS DOUBLE) * (tot.big_n - rk.n1) / 12.0
                    * ((tot.big_n + 1) - CAST(tot.tie_t AS DOUBLE)
                       / (CAST(tot.big_n AS DOUBLE) * (tot.big_n - 1))))))
            > {MW_Z_CRIT!r}) AS reject_h0
    FROM rk CROSS JOIN tot
    """,
    doc="Mann-Whitney U (Wilcoxon rank-sum) of each event type's value "
    "distribution against the pooled rest — the nonparametric "
    "two-sample location test beside Welch's t (means) and KS (full "
    "distribution): rank-based, so one whale value cannot move it. "
    "Because each type is tested against everything else, the union "
    "of the two samples is the whole corpus and ONE global rank pass "
    "suffices: a value histogram plus a histogram-sized cumulative "
    "window give tie-averaged ranks exactly (2*rank is an integer: "
    "2*cum_before + cnt + 1), the per-type rank sum R2 and tie "
    "correction sum(t^3 - t) stay exact BIGINT, and the normal-"
    "approximation z assembles from those exact integers in one "
    "identical expression tree (tie-corrected variance, two-sided "
    "alpha = 0.05 with a pinned critical literal). Corpus cost: two "
    "map-side-combined aggregates (global and per-type histograms); "
    "the window runs over distinct values, never rows.",
)
def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.stage import eager_release

    v = (
        load(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    gh = v.groupBy("value").agg(F.count(F.lit(1)).cast("bigint").alias("cnt")).persist()
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ct = gh.select(
        "value",
        "cnt",
        (F.sum("cnt").over(w) - F.col("cnt")).cast("bigint").alias("cum_before"),
    )
    tot = gh.agg(
        F.sum("cnt").cast("bigint").alias("big_n"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("bigint")
        .alias("tie_t"),
    )
    tv = v.groupBy("event_type", "value").agg(F.count(F.lit(1)).cast("bigint").alias("c_t"))
    rk = (
        tv.join(ct, "value")
        .groupBy("event_type")
        .agg(
            F.sum(F.col("c_t") * (2 * F.col("cum_before") + F.col("cnt") + 1))
            .cast("bigint")
            .alias("r2"),
            F.sum("c_t").cast("bigint").alias("n1"),
        )
    )
    n1 = F.col("n1")
    n2 = F.col("big_n") - n1
    u2 = F.col("r2") - n1 * (n1 + 1)
    num = u2 - n1.cast("double") * n2
    var = (
        n1.cast("double")
        * n2
        / F.lit(12.0)
        * (
            (F.col("big_n") + 1)
            - F.col("tie_t").cast("double") / (F.col("big_n").cast("double") * (F.col("big_n") - 1))
        )
    )
    z = num / (F.lit(2.0) * F.sqrt(var))
    out = rk.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n1",
        n2.alias("n2"),
        u2.alias("u2"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > MW_Z_CRIT).alias("reject_h0"),
    )
    return eager_release(out, "mann_whitney", gh)


# Poisson(1) CDF thresholds for the distributed bootstrap, pinned as
# literals on both engines (never recomputed via exp — the Benford
# no-libm-drift rule for constants). Weights cap at 6: P(w > 6) ~ 6e-4
# and the truncation is part of the operator's contract.
BOOT_POISSON_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
)
BOOT_B = 64  # resamples
BOOT_LO_RANK = 2  # 2.5th percentile of 64 (floor(64*0.025)=1 -> 2nd)
BOOT_HI_RANK = 63  # 97.5th percentile of 64


def _poisson_case(u_expr: str) -> str:
    whens = " ".join(
        f"WHEN {u_expr} < {c!r} THEN {k}" for k, c in enumerate(BOOT_POISSON_CDF)
    )
    return f"(CASE {whens} ELSE 6 END)"


@register(
    "stats_bootstrap_ci",
    oracle=f"""
    WITH x AS (
      SELECT event_id, CAST(round(value, 6) AS DECIMAL(18,6)) AS v
      FROM events WHERE value IS NOT NULL
    ),
    expanded AS (
      SELECT x.v,
             unnest([{{'b': g.g * 4 + j + 1,
                      'u': (CAST(('0x' || substr(md5('boot:'
                             || CAST(g.g AS VARCHAR) || ':'
                             || CAST(x.event_id AS VARCHAR)),
                             8 * j + 1, 8)) AS BIGINT) + 0.5)
                             / 4294967296.0}}
                     for j in range(0, 4)], recursive := true)
      FROM x CROSS JOIN (SELECT unnest(range(0, {BOOT_B} // 4)) AS g) g
    ),
    means AS (
      SELECT b,
             CAST(sum({_poisson_case("u")} * v) AS DOUBLE)
               / sum({_poisson_case("u")}) AS m
      FROM expanded GROUP BY b
    ),
    ranked AS (
      SELECT m, row_number() OVER (ORDER BY m, b) AS rk FROM means
    ),
    full_mean AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS mean_full
      FROM x
    )
    SELECT f.n, CAST({BOOT_B} AS BIGINT) AS n_resamples, f.mean_full,
           round((SELECT m FROM ranked WHERE rk = {BOOT_LO_RANK}), 6) AS ci_lo,
           round((SELECT m FROM ranked WHERE rk = {BOOT_HI_RANK}), 6) AS ci_hi
    FROM full_mean f
    """,
    doc=f"Bootstrap 95% confidence interval for the mean event value "
    f"via the POISSON bootstrap, {BOOT_B} resamples — the classic "
    "distributed formulation (Chamandy et al.): exact multinomial "
    "resampling needs the global row count per draw, but Poisson(1) "
    "weights are independent per (row, resample), so the whole thing "
    "is ONE stateless pass producing (b, weight*value) and a "
    "map-side-combined per-b aggregate; no row ever leaves its "
    "partition. Weights derive deterministically from md5 through "
    "the pinned Poisson CDF table (the seeded-uniform kernel of "
    "privacy_dp_counts) — and because a digest is 128 bits, each of "
    "the B/4 digests per row yields FOUR 32-bit uniforms (one per "
    "8-hex-char window), quartering the dominant hashing cost "
    "(measured 15.4 s -> 7.4 s end-to-end at sf0.1 — the remainder "
    "is the explode + weight arithmetic); values are rounded to 6 "
    "decimals and summed as DECIMAL (exact, order-free), each "
    "resample mean is one final division, and the CI bounds are "
    "order statistics of the 64 means — bit-stable end to end. The "
    f"B= {BOOT_B} expansion is the honest cost of any bootstrap; at "
    "100 TB you bootstrap the per-partition or per-day aggregates, "
    "not raw rows (same operator, coarser input).",
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.stage import eager_release

    # the B/4 md5 digests per row all evaluate ABOVE this frame; on a
    # one-split local file (one task per 128MB split at scale) that
    # hashing ran at the scan's parallelism. One narrow repartition
    # (two columns, hash-keyed so no sort-before-repartition and
    # deterministic under retries — guide §2.5) spreads the digest
    # work across cluster parallelism before the 16x replication
    # multiplies it (round-15); size-adaptive count (round-16,
    # plans/partitioning.py) keeps per-partition input bounded at
    # warehouse scale.
    from ..plans.partitioning import fanout_partitions

    x0 = (
        load(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_id", F.round("value", 6).cast("decimal(18,6)").alias("v"))
    )
    x = x0.repartition(fanout_partitions(x0), "event_id").persist()
    g = spark.range(0, BOOT_B // 4).select(F.col("id").alias("g"))
    seed = F.concat(
        F.lit("boot:"), F.col("g").cast("string"), F.lit(":"), F.col("event_id").cast("string")
    )
    # one digest per (row, digest-group); its 128 bits carve into four
    # 32-bit uniforms (8 hex chars each), so the dominant md5 cost is
    # B/4 per row, not B. "dig" is a named column so the four substr
    # reads share one hash evaluation.
    bu = []
    for j in range(4):
        h = F.conv(F.substring(F.col("dig"), 8 * j + 1, 8), 16, 10).cast("long")
        bu.append(
            F.struct(
                (F.col("g") * 4 + F.lit(j) + 1).alias("b"),
                ((h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)).alias("u"),
            )
        )
    expanded = (
        x.crossJoin(F.broadcast(g))
        .withColumn("dig", F.md5(seed))
        .select("v", F.explode(F.array(*bu)).alias("bu"))
        .select("v", F.col("bu.b").alias("b"), F.col("bu.u").alias("u"))
    )
    w = F.lit(6)
    for k in reversed(range(len(BOOT_POISSON_CDF))):
        w = F.when(F.col("u") < BOOT_POISSON_CDF[k], F.lit(k)).otherwise(w)
    means = (
        expanded.select("b", (w * F.col("v")).alias("wv"), w.alias("w"))
        .groupBy("b")
        .agg((F.sum("wv").cast("double") / F.sum("w")).alias("m"))
    )
    wr = Window.orderBy("m", "b")
    ranked = means.select("m", F.row_number().over(wr).alias("rk"))
    # BOTH order statistics from ONE pass over the ranked means
    # (round-15): the separate lo/hi legs each embedded the whole
    # md5-expansion + per-b aggregate subtree in the plan — two
    # Exchanges and two Windows over the B-replicated corpus where
    # one suffices (a conditional-max pivot over the two wanted rank
    # rows is exactly equivalent: ranks are unique by construction).
    cis = ranked.filter(F.col("rk").isin(BOOT_LO_RANK, BOOT_HI_RANK)).agg(
        F.round(F.max(F.when(F.col("rk") == BOOT_LO_RANK, F.col("m"))), 6).alias(
            "ci_lo"
        ),
        F.round(F.max(F.when(F.col("rk") == BOOT_HI_RANK, F.col("m"))), 6).alias(
            "ci_hi"
        ),
    )
    full = x.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum("v").cast("double") / F.count(F.lit(1)), 6).alias("mean_full"),
    )
    out = (
        full.select("n", F.lit(BOOT_B).cast("bigint").alias("n_resamples"), "mean_full")
        .crossJoin(F.broadcast(cis))
    )
    return eager_release(out, "bootstrap_ci", x)


# A customer whose last order is more than this many days before the
# observation horizon (the global max order date) counts as churned
# (event); everyone else is right-censored at the horizon.
KM_CHURN_DAYS = 90


@register(
    "stats_survival_km",
    oracle=f"""
    WITH life0 AS (
      SELECT o_custkey,
             date_diff('day', min(o_orderdate), max(o_orderdate)) AS dur,
             max(o_orderdate) AS last_order
      FROM orders GROUP BY o_custkey
    ),
    hz AS (SELECT max(last_order) AS horizon FROM life0),
    life AS (
      SELECT c.c_mktsegment AS segment, l.dur,
             CASE WHEN date_diff('day', l.last_order, hz.horizon)
                       > {KM_CHURN_DAYS} THEN 1 ELSE 0 END AS event
      FROM life0 l JOIN customer c ON c.c_custkey = l.o_custkey
      CROSS JOIN hz
    ),
    cell AS (
      SELECT segment, dur, CAST(sum(event) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS m
      FROM life GROUP BY 1, 2
    ),
    risk AS (
      SELECT segment, dur, d, m,
             CAST(sum(m) OVER (PARTITION BY segment) AS BIGINT)
               - CAST(coalesce(sum(m) OVER (PARTITION BY segment
                   ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
      FROM cell
    ),
    ev AS (
      SELECT segment, dur, d, n_risk,
             CASE WHEN n_risk = d THEN CAST(0 AS DECIMAL(28,9))
                  ELSE CAST(round(ln(CAST(n_risk - d AS DOUBLE) / n_risk), 9)
                       AS DECIMAL(28,9)) END AS lnf,
             CASE WHEN n_risk = d THEN 1 ELSE 0 END AS zf
      FROM risk WHERE d > 0
    ),
    curve AS (
      SELECT segment, dur, d, n_risk,
             CAST(sum(lnf) OVER (PARTITION BY segment ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DECIMAL(28,9)) AS ln_cum,
             sum(zf) OVER (PARTITION BY segment ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS z_cum
      FROM ev
    )
    SELECT segment, CAST(dur AS BIGINT) AS t_days, n_risk,
           d AS d_events,
           CASE WHEN z_cum > 0 THEN 0.0
                ELSE round(exp(CAST(ln_cum AS DOUBLE)), 6) END AS survival
    FROM curve
    """,
    doc=f"Kaplan-Meier survival curves per market segment: customer "
    "'lifetime' = days between first and last order, churn event = "
    f"last order more than {KM_CHURN_DAYS} days before the horizon, "
    "otherwise right-censored — the retention analytics beside "
    "retention_cohorts (which counts returns) and orders_cohort_ltv "
    "(which sums value): S(t) = prod over event times of "
    "(1 - d_i/n_i), the estimator that handles censoring correctly. "
    "Determinism: at-risk counts and event counts are exact integer "
    "window arithmetic over the (segment x duration) DIMENSION "
    "table; the product becomes a sum of per-step ln factors — each "
    "a single rounded libm call on identical doubles (the bm25/PMI "
    "rule), accumulated as DECIMAL so no float order exists — and "
    "one exp per emitted step; a d = n step pins survival to exact "
    "0.0 from there on (ln(0) never evaluates). Corpus cost: one "
    "per-customer aggregate, one dimension join, windows over "
    "duration-dimension rows.",
)
def stats_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.stage import eager_release

    o = load(spark, "orders", sf_dir)
    c = load(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment")
    life0 = o.groupBy("o_custkey").agg(
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("dur"),
        F.max("o_orderdate").alias("last_order"),
    ).persist()
    hz = life0.agg(F.max("last_order").alias("horizon"))
    life = (
        life0.join(c, life0["o_custkey"] == c["c_custkey"])
        .crossJoin(F.broadcast(hz))
        .select(
            F.col("c_mktsegment").alias("segment"),
            "dur",
            (F.datediff(F.col("horizon"), F.col("last_order")) > KM_CHURN_DAYS)
            .cast("int")
            .alias("event"),
        )
    )
    cell = life.groupBy("segment", "dur").agg(
        F.sum("event").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    wseg = Window.partitionBy("segment")
    wbefore = (
        Window.partitionBy("segment")
        .orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = cell.select(
        "segment",
        "dur",
        "d",
        (
            F.sum("m").over(wseg) - F.coalesce(F.sum("m").over(wbefore), F.lit(0))
        )
        .cast("bigint")
        .alias("n_risk"),
    )
    ev = risk.filter(F.col("d") > 0).select(
        "segment",
        "dur",
        "d",
        "n_risk",
        F.when(F.col("n_risk") == F.col("d"), F.lit(0).cast("decimal(28,9)"))
        .otherwise(
            F.round(
                F.log((F.col("n_risk") - F.col("d")).cast("double") / F.col("n_risk")), 9
            ).cast("decimal(28,9)")
        )
        .alias("lnf"),
        (F.col("n_risk") == F.col("d")).cast("int").alias("zf"),
    )
    wcum = (
        Window.partitionBy("segment")
        .orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = ev.select(
        "segment",
        "dur",
        "d",
        "n_risk",
        F.sum("lnf").over(wcum).cast("decimal(28,9)").alias("ln_cum"),
        F.sum("zf").over(wcum).alias("z_cum"),
    )
    out = curve.select(
        "segment",
        F.col("dur").cast("bigint").alias("t_days"),
        "n_risk",
        F.col("d").alias("d_events"),
        F.when(F.col("z_cum") > 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("ln_cum").cast("double")), 6))
        .alias("survival"),
    )
    return eager_release(out, "survival_km", life0)


@register(
    "stats_theil_sen",
    oracle="""
    WITH d AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
      FROM d
    ),
    pairs AS (
      SELECT a.event_type,
             a.t AS t1, b.t AS t2,
             CAST(b.x - a.x AS DOUBLE) / (b.t - a.t) AS slope
      FROM s a JOIN s b ON a.event_type = b.event_type AND a.t < b.t
    ),
    ranked AS (
      SELECT event_type, slope,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY slope, t1, t2) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n_pairs
      FROM pairs
    )
    SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
           round(slope, 6) AS slope_per_day
    FROM ranked
    WHERE rk = (n_pairs + 1) // 2
    """,
    doc="Theil-Sen robust trend estimator on daily event volume per "
    "stream: the (lower) MEDIAN of all pairwise slopes "
    "(x_j - x_i)/(j - i) — up to ~29% contaminated days cannot move "
    "it, unlike the least-squares slope in agg_regression_per_group. "
    "The all-pairs step is the textbook objection and the reason "
    "this is registered over the DAY dimension: the corpus pays one "
    "map-side-combined day-bucket aggregate, and the O(k^2) pair "
    "join runs on calendar-sized k (435 pairs for a 30-day window), "
    "partitioned per key — never over raw rows. Each slope is ONE "
    "exact-integer-operand IEEE division (bit-identical cross-"
    "engine), the median is an order statistic with a total "
    "(slope, t1, t2) tiebreak, and only the emitted median is "
    "rounded.",
)
def stats_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.stage import eager_release

    e = load(spark, "events", sf_dir)
    d = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    wt = Window.partitionBy("event_type").orderBy("day")
    s = d.select("event_type", "x", F.row_number().over(wt).alias("t")).persist()
    a = s.select("event_type", F.col("x").alias("x1"), F.col("t").alias("t1"))
    b = s.select("event_type", F.col("x").alias("x2"), F.col("t").alias("t2"))
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("t1") < F.col("t2"))
        .select(
            "event_type",
            "t1",
            "t2",
            ((F.col("x2") - F.col("x1")).cast("double") / (F.col("t2") - F.col("t1"))).alias(
                "slope"
            ),
        )
    )
    wr = Window.partitionBy("event_type").orderBy("slope", "t1", "t2")
    wn = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n_pairs"),
    )
    out = ranked.filter(F.col("rk") == F.expr("(n_pairs + 1) div 2")).select(
        "event_type",
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.round("slope", 6).alias("slope_per_day"),
    )
    return eager_release(out, "theil_sen", s)


@register(
    "stats_kruskal_wallis",
    oracle=f"""
    WITH v AS (
      SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    gh AS (SELECT value, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
    ct AS (
      SELECT value, cnt,
             CAST(sum(cnt) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
               AS BIGINT) AS cum_before
      FROM gh
    ),
    tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS big_n,
             CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_t
      FROM gh
    ),
    tv AS (
      SELECT event_type, value, CAST(count(*) AS BIGINT) AS c_t
      FROM v GROUP BY 1, 2
    ),
    rk AS (
      SELECT tv.event_type,
             CAST(sum(tv.c_t * (2 * ct.cum_before + ct.cnt + 1)) AS BIGINT) AS r2,
             CAST(sum(tv.c_t) AS BIGINT) AS n1
      FROM tv JOIN ct USING (value)
      GROUP BY tv.event_type
    ),
    terms AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(round(CAST(r2 AS DOUBLE) * r2 / (4.0 * n1), 6)
                  AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS s
      FROM rk
    )
    SELECT t.big_n, terms.k, (terms.k - 1) AS df,
           round((12.0 * CAST(terms.s AS DOUBLE) / (CAST(t.big_n AS DOUBLE)
                  * (t.big_n + 1)) - 3.0 * (t.big_n + 1))
                 / (1.0 - CAST(t.tie_t AS DOUBLE)
                    / (CAST(t.big_n AS DOUBLE) * t.big_n * t.big_n - t.big_n)),
                 6) AS h_stat,
           round((terms.k - 1)
                 * pow(1.0 - 2.0 / (9.0 * (terms.k - 1))
                       + {WH_Z95!r} * sqrt(2.0 / (9.0 * (terms.k - 1))), 3.0),
                 6) AS h_crit,
           ((12.0 * CAST(terms.s AS DOUBLE) / (CAST(t.big_n AS DOUBLE)
                  * (t.big_n + 1)) - 3.0 * (t.big_n + 1))
                 / (1.0 - CAST(t.tie_t AS DOUBLE)
                    / (CAST(t.big_n AS DOUBLE) * t.big_n * t.big_n - t.big_n))
            > (terms.k - 1)
                 * pow(1.0 - 2.0 / (9.0 * (terms.k - 1))
                       + {WH_Z95!r} * sqrt(2.0 / (9.0 * (terms.k - 1))), 3.0))
             AS reject_h0
    FROM tot t CROSS JOIN terms
    """,
    doc="Kruskal-Wallis H: do the k event streams draw their values "
    "from the same distribution — the k-group extension of "
    "stats_mann_whitney (nonparametric ANOVA), built on the SAME "
    "exact global 2x-rank histogram kernel: per-group doubled rank "
    "sums R2 and counts are exact BIGINT, each group's R2^2/(4n) "
    "term evaluates once in DOUBLE (operands < 2^53) and is rounded "
    "then summed as DECIMAL (group count is data-dependent, so the "
    "fixed-order trick of stats_anova_weekday does not apply — the "
    "decimal sum is the order-free alternative), and the tie-"
    "corrected H assembles in one identical expression tree. The "
    "alpha = 0.05 threshold is the Wilson-Hilferty chi-square "
    "approximation at df = k - 1 with the pinned z literal. Two "
    "map-side-combined histograms; windows over distinct values.",
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.stage import eager_release

    v = (
        load(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    gh = v.groupBy("value").agg(F.count(F.lit(1)).cast("bigint").alias("cnt")).persist()
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ct = gh.select(
        "value",
        "cnt",
        (F.sum("cnt").over(w) - F.col("cnt")).cast("bigint").alias("cum_before"),
    )
    tot = gh.agg(
        F.sum("cnt").cast("bigint").alias("big_n"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("bigint")
        .alias("tie_t"),
    )
    tv = v.groupBy("event_type", "value").agg(F.count(F.lit(1)).cast("bigint").alias("c_t"))
    rk = (
        tv.join(ct, "value")
        .groupBy("event_type")
        .agg(
            F.sum(F.col("c_t") * (2 * F.col("cum_before") + F.col("cnt") + 1))
            .cast("bigint")
            .alias("r2"),
            F.sum("c_t").cast("bigint").alias("n1"),
        )
    )
    term = F.round(
        F.col("r2").cast("double") * F.col("r2") / (F.lit(4.0) * F.col("n1")), 6
    ).cast("decimal(38,6)")
    terms = rk.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(term).cast("decimal(38,6)").alias("s"),
    )
    nb = F.col("big_n").cast("double")
    h = (
        F.lit(12.0) * F.col("s").cast("double") / (nb * (F.col("big_n") + 1))
        - F.lit(3.0) * (F.col("big_n") + 1)
    ) / (
        F.lit(1.0)
        - F.col("tie_t").cast("double") / (nb * F.col("big_n") * F.col("big_n") - F.col("big_n"))
    )
    dfk = F.col("k") - 1
    crit = dfk * F.pow(
        F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * dfk)
        + F.lit(WH_Z95) * F.sqrt(F.lit(2.0) / (F.lit(9.0) * dfk)),
        F.lit(3.0),
    )
    out = tot.crossJoin(F.broadcast(terms)).select(
        "big_n",
        "k",
        dfk.alias("df"),
        F.round(h, 6).alias("h_stat"),
        F.round(crit, 6).alias("h_crit"),
        (h > crit).alias("reject_h0"),
    )
    return eager_release(out, "kruskal_wallis", gh)


@register(
    "stats_runs_test",
    oracle=f"""
    WITH d AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    med AS (
      SELECT x AS m FROM (
        SELECT x, row_number() OVER (ORDER BY x, day) AS rk,
               count(*) OVER () AS n FROM d
      ) WHERE rk = (n + 1) // 2
    ),
    s AS (
      SELECT day, CASE WHEN x > med.m THEN 1 ELSE 0 END AS sgn
      FROM d CROSS JOIN med WHERE x <> med.m
    ),
    runs AS (
      SELECT sgn, lag(sgn) OVER (ORDER BY day) AS prev FROM s
    ),
    agg AS (
      SELECT CAST(sum(sgn) AS BIGINT) AS n1,
             CAST(sum(1 - sgn) AS BIGINT) AS n2,
             CAST(1 + sum(CASE WHEN prev IS NOT NULL AND sgn <> prev
                               THEN 1 ELSE 0 END) AS BIGINT) AS r
      FROM runs
    )
    SELECT n1, n2, r AS n_runs,
           round((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((CAST(n1 + n2 AS DOUBLE)) * (n1 + n2)
                           * (n1 + n2 - 1))), 6) AS z,
           (abs((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((CAST(n1 + n2 AS DOUBLE)) * (n1 + n2)
                           * (n1 + n2 - 1)))) > {MW_Z_CRIT!r}) AS reject_h0
    FROM agg
    """,
    doc="Wald-Wolfowitz runs test on daily event volume: is the "
    "above/below-median sign sequence random, or does it trend/"
    "oscillate (too few runs = regime persistence, too many = "
    "alternation) — the randomness check beside the lag-1 "
    "autocorrelation, sensitive to ANY serial dependence, not just "
    "linear. Sign reference is the exact lower-median day (an order "
    "statistic with a total tiebreak, the discrete-median "
    "convention); days equal to the median drop by the classical "
    "convention, symmetrically in both engines. Run and sign counts "
    "are exact integers from one day-dimension window; the normal z "
    "assembles in one identical expression tree with the pinned "
    "two-sided critical literal. One corpus aggregate; everything "
    "else is calendar-sized.",
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.stage import eager_release

    e = load(spark, "events", sf_dir)
    d = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    ).persist()
    wm = Window.orderBy("x", "day")
    wn = Window.partitionBy()
    med = (
        d.select("x", F.row_number().over(wm).alias("rk"), F.count(F.lit(1)).over(wn).alias("n"))
        .filter(F.col("rk") == F.expr("(n + 1) div 2"))
        .select(F.col("x").alias("m"))
    )
    s = (
        d.crossJoin(F.broadcast(med))
        .filter(F.col("x") != F.col("m"))
        .select("day", (F.col("x") > F.col("m")).cast("int").alias("sgn"))
    )
    wd = Window.orderBy("day")
    runs = s.select("sgn", F.lag("sgn").over(wd).alias("prev"))
    agg = runs.agg(
        F.sum("sgn").cast("bigint").alias("n1"),
        F.sum(1 - F.col("sgn")).cast("bigint").alias("n2"),
        (
            1
            + F.sum(
                F.when(F.col("prev").isNotNull() & (F.col("sgn") != F.col("prev")), 1).otherwise(
                    0
                )
            )
        )
        .cast("bigint")
        .alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    mu = F.lit(2.0) * n1 * n2 / (n1 + n2) + 1
    var = (
        F.lit(2.0)
        * n1
        * n2
        * (F.lit(2.0) * n1 * n2 - n1 - n2)
        / ((n1 + n2).cast("double") * (n1 + n2) * (n1 + n2 - 1))
    )
    z = (r - mu) / F.sqrt(var)
    out = agg.select(
        "n1",
        "n2",
        r.alias("n_runs"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > MW_Z_CRIT).alias("reject_h0"),
    )
    return eager_release(out, "runs_test", d)


@register(
    "events_markov_entropy",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    tr AS (
      SELECT event_type AS src, nxt AS dst, CAST(count(*) AS BIGINT) AS n_st
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    srcs AS (SELECT src, CAST(sum(n_st) AS BIGINT) AS n_s FROM tr GROUP BY 1),
    tot AS (SELECT CAST(sum(n_st) AS BIGINT) AS big_n FROM tr),
    terms AS (
      SELECT tr.src,
             CAST(sum(CAST(round(-ln(CAST(tr.n_st AS DOUBLE) / s.n_s), 9)
                  AS DECIMAL(28,9)) * tr.n_st) AS DECIMAL(38,9)) AS num,
             CAST(sum(tr.n_st) AS BIGINT) AS n_s
      FROM tr JOIN srcs s USING (src)
      GROUP BY tr.src
    )
    SELECT t.src AS event_type, t.n_s AS n_transitions,
           round(CAST(t.num AS DOUBLE) / t.n_s, 6) AS h_conditional,
           round(CAST(t.num AS DOUBLE) / tot.big_n, 6) AS h_contribution
    FROM terms t CROSS JOIN tot
    """,
    doc="Entropy rate of the per-user event-type Markov chain: for "
    "each source state, the conditional entropy of the next event "
    "H(next | src) = -sum p(dst|src) ln p(dst|src), plus its "
    "contribution to the chain's entropy rate under the empirical "
    "source distribution — the information-theoretic summary on top "
    "of events_path_transitions' raw matrix (low entropy = "
    "predictable journeys worth caching/prefetching; high = "
    "exploratory traffic). Transition counts are exact from one "
    "user-partitioned lead window; each -ln(p) evaluates once per "
    "(src, dst) pair over exact-integer operands, is rounded (the "
    "bm25/PMI libm rule), and accumulates as DECIMAL weighted by the "
    "exact pair count — no float summation order anywhere. Windows "
    "run per user; everything after the transition aggregate is "
    "state-dimension-sized (|types|^2 rows).",
)
def events_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.stage import eager_release

    e = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select("event_type", F.lead("event_type").over(w).alias("nxt"))
    tr = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_st"))
        .persist()
    )
    srcs = tr.groupBy("src").agg(F.sum("n_st").cast("bigint").alias("n_s"))
    tot = tr.agg(F.sum("n_st").cast("bigint").alias("big_n"))
    term = (
        F.round(-F.log(F.col("n_st").cast("double") / F.col("n_s")), 9).cast("decimal(28,9)")
        * F.col("n_st")
    )
    terms = (
        tr.join(F.broadcast(srcs), "src")
        .groupBy("src")
        .agg(
            F.sum(term).cast("decimal(38,9)").alias("num"),
            F.sum("n_st").cast("bigint").alias("n_s"),
        )
    )
    out = terms.crossJoin(F.broadcast(tot)).select(
        F.col("src").alias("event_type"),
        F.col("n_s").alias("n_transitions"),
        F.round(F.col("num").cast("double") / F.col("n_s"), 6).alias("h_conditional"),
        F.round(F.col("num").cast("double") / F.col("big_n"), 6).alias("h_contribution"),
    )
    return eager_release(out, "markov_entropy", tr)


# --- rank correlation (round 10) --------------------------------------


@register(
    "stats_spearman_corr",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag AS flag,
             CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
                  + count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1
                  AS BIGINT) AS dx,
             CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
                  + count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1
                  AS BIGINT) AS dy
      FROM lineitem
    ),
    s AS (
      SELECT flag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(dx AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sdx,
             CAST(sum(CAST(dy AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sdy,
             CAST(sum(CAST(dx AS DECIMAL(38,0)) * dx) AS DECIMAL(38,0)) AS sdxx,
             CAST(sum(CAST(dy AS DECIMAL(38,0)) * dy) AS DECIMAL(38,0)) AS sdyy,
             CAST(sum(CAST(dx AS DECIMAL(38,0)) * dy) AS DECIMAL(38,0)) AS sdxy
      FROM ranked GROUP BY flag
    )
    SELECT flag, n,
           round((n * CAST(sdxy AS DOUBLE) - CAST(sdx AS DOUBLE) * CAST(sdy AS DOUBLE))
                 / sqrt((n * CAST(sdxx AS DOUBLE) - CAST(sdx AS DOUBLE) * CAST(sdx AS DOUBLE))
                        * (n * CAST(sdyy AS DOUBLE) - CAST(sdy AS DOUBLE) * CAST(sdy AS DOUBLE))),
                 6) AS rho_spearman
    FROM s
    """,
    doc="Spearman rank correlation (tie-aware) between quantity and "
    "extended price per return flag — the distribution-free monotone-"
    "association check a validation suite runs where Pearson would be "
    "skew-dominated. Tie handling is the textbook midrank, computed "
    "WITHOUT float division: the double-rank 2*midrank = 2*rank_min "
    "+ tie_count - 1 is an exact integer (rank_max = rank_min + "
    "tie_count - 1, so rank_min + rank_max collapses to it), and "
    "Pearson on midranks equals Pearson on double-ranks by scale "
    "invariance. Sufficient statistics (n, Σdx, Σdy, Σdx², "
    "Σdy², Σdxy) aggregate as exact DECIMAL(38,0) — at 100 TB per-"
    "partition partial sums combine map-side and never lose a digit — "
    "and the closed form evaluates once per GROUP in DOUBLE with an "
    "identical expression tree on both engines (sqrt is IEEE "
    "correctly-rounded, the Mann-Whitney precedent). Two window "
    "sorts per group are the honest rank cost; at scale they are "
    "range-partitioned sorts, not driver work.",
)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    d38 = "decimal(38,0)"
    wq = Window.partitionBy("l_returnflag").orderBy(F.col("l_quantity"))
    wp = Window.partitionBy("l_returnflag").orderBy(F.col("l_extendedprice"))
    tq = Window.partitionBy("l_returnflag", "l_quantity")
    tp = Window.partitionBy("l_returnflag", "l_extendedprice")
    ranked = li.select(
        F.col("l_returnflag").alias("flag"),
        (F.rank().over(wq) * 2 + F.count(F.lit(1)).over(tq) - 1).cast("bigint").alias("dx"),
        (F.rank().over(wp) * 2 + F.count(F.lit(1)).over(tp) - 1).cast("bigint").alias("dy"),
    )
    dx, dy = F.col("dx").cast(d38), F.col("dy").cast(d38)
    s = ranked.groupBy("flag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dx).cast(d38).alias("sdx"),
        F.sum(dy).cast(d38).alias("sdy"),
        F.sum(dx * F.col("dx")).cast(d38).alias("sdxx"),
        F.sum(dy * F.col("dy")).cast(d38).alias("sdyy"),
        F.sum(dx * F.col("dy")).cast(d38).alias("sdxy"),
    )
    n = F.col("n").cast("double")
    sdx, sdy = F.col("sdx").cast("double"), F.col("sdy").cast("double")
    sdxx, sdyy, sdxy = (
        F.col("sdxx").cast("double"),
        F.col("sdyy").cast("double"),
        F.col("sdxy").cast("double"),
    )
    rho = (n * sdxy - sdx * sdy) / F.sqrt((n * sdxx - sdx * sdx) * (n * sdyy - sdy * sdy))
    return s.select("flag", "n", F.round(rho, 6).alias("rho_spearman"))


@register(
    "stats_kendall_tau",
    oracle="""
    WITH b AS (
      SELECT l_returnflag AS flag, date_trunc('month', l_shipdate) AS m,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS bx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS by
      FROM lineitem GROUP BY 1, 2
    ),
    p AS (
      SELECT i.flag,
             CAST(sum(CASE WHEN (i.bx < j.bx AND i.by < j.by)
                             OR (i.bx > j.bx AND i.by > j.by)
                      THEN 1 ELSE 0 END) AS BIGINT) AS nc,
             CAST(sum(CASE WHEN (i.bx < j.bx AND i.by > j.by)
                             OR (i.bx > j.bx AND i.by < j.by)
                      THEN 1 ELSE 0 END) AS BIGINT) AS nd,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM b i JOIN b j ON i.flag = j.flag AND i.m < j.m
      GROUP BY i.flag
    )
    SELECT flag, nc, nd, n_pairs,
           round((CAST(nc AS DOUBLE) - nd) / n_pairs, 6) AS tau_a
    FROM p
    """,
    doc="Kendall's tau-a over the monthly revenue/quantity series per "
    "return flag: concordant-minus-discordant month pairs — the "
    "trend-agreement statistic behind the Mann-Kendall trend test "
    "(pairs where both measures move the same way vs opposite). The "
    "all-pairs comparison is quadratic, so it runs on the CALENDAR-"
    "BOUNDED bucket table (stats_theil_sen's design): the corpus pays "
    "one map-side-combined monthly aggregate, and the self-join "
    "compares ~84 months x 84 per flag regardless of corpus size. "
    "Bucket sums are exact DECIMAL so every </> comparison is exact; "
    "counts are BIGINT; tau_a is a single final division rounded to "
    "6 dp. Ties in either measure count as neither concordant nor "
    "discordant (tau-a denominator = all pairs).",
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    b = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.date_trunc("month", "l_shipdate").alias("m"),
    ).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("decimal(38,2)").alias("bx"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(38,2)").alias("by"),
    )
    i = b.select(F.col("flag"), F.col("m").alias("mi"), F.col("bx").alias("bxi"), F.col("by").alias("byi"))
    j = b.select(F.col("flag"), F.col("m").alias("mj"), F.col("bx").alias("bxj"), F.col("by").alias("byj"))
    conc = (
        ((F.col("bxi") < F.col("bxj")) & (F.col("byi") < F.col("byj")))
        | ((F.col("bxi") > F.col("bxj")) & (F.col("byi") > F.col("byj")))
    ).cast("int")
    disc = (
        ((F.col("bxi") < F.col("bxj")) & (F.col("byi") > F.col("byj")))
        | ((F.col("bxi") > F.col("bxj")) & (F.col("byi") < F.col("byj")))
    ).cast("int")
    p = (
        i.join(j, (i.flag == j.flag) & (F.col("mi") < F.col("mj")))
        .drop(j.flag)
        .groupBy("flag")
        .agg(
            F.sum(conc).cast("bigint").alias("nc"),
            F.sum(disc).cast("bigint").alias("nd"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
    )
    tau = (F.col("nc").cast("double") - F.col("nd")) / F.col("n_pairs")
    return p.select("flag", "nc", "nd", "n_pairs", F.round(tau, 6).alias("tau_a"))


# --- CUSUM drift + variance homogeneity (round 10) --------------------


@register(
    "time_cusum_drift",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS x
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, day, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
             count(*) OVER (PARTITION BY event_type) AS n,
             CAST(sum(x) OVER (PARTITION BY event_type ORDER BY day
                               ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,2)) AS p,
             CAST(sum(x) OVER (PARTITION BY event_type) AS DECIMAL(38,2)) AS s
      FROM daily
    ),
    c AS (
      SELECT event_type, day, n,
             CAST(n * p - k * s AS DECIMAL(38,2)) AS c_scaled
      FROM idx
    ),
    ranked AS (
      SELECT event_type, day, n, c_scaled,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(c_scaled) DESC, day) AS r
      FROM c
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           day AS peak_day,
           round(CAST(abs(c_scaled) AS DOUBLE) / n, 6) AS cusum_peak
    FROM ranked WHERE r = 1
    """,
    doc="CUSUM drift detection over the daily metric series per event "
    "type: the classic level-shift detector (Page's cumulative sum "
    "against the series mean), reporting the peak excursion and the "
    "day it occurs — the changepoint LOCATOR beside "
    "time_changepoint_binary's split test. The textbook statistic "
    "sums (x_i - mean), but the mean is a quotient, so every term "
    "would be inexact; the scaled identity C_k = n*prefix_k - k*total "
    "= n*sum(x_i - mean) keeps EVERY intermediate an exact DECIMAL "
    "(integers times exact sums), and the single division by n "
    "happens once per group at render. Peak day ties break earliest. "
    "One map-side-combined daily aggregate, then windows over the "
    "CALENDAR-BOUNDED bucket table (the stats_kendall_tau/theil_sen "
    "design) — scan-bound at 100 TB.",
)
def time_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    daily = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(38,2)").alias("x"))
    wo = Window.partitionBy("event_type").orderBy("day")
    wp = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "day",
        F.row_number().over(wo).alias("k"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("x").over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .cast("decimal(38,2)")
        .alias("p"),
        F.sum("x").over(wp).cast("decimal(38,2)").alias("s"),
    )
    c = idx.select(
        "event_type",
        "day",
        "n",
        (F.col("n") * F.col("p") - F.col("k") * F.col("s"))
        .cast("decimal(38,2)")
        .alias("c_scaled"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("c_scaled")).desc(), F.col("day")
    )
    return (
        c.select("*", F.row_number().over(wr).alias("r"))
        .filter(F.col("r") == 1)
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_days"),
            F.col("day").alias("peak_day"),
            F.round(F.abs(F.col("c_scaled")).cast("double") / F.col("n"), 6).alias(
                "cusum_peak"
            ),
        )
    )


# Brown-Forsythe critical value at alpha=0.05 for df1=4 (k=5 event
# types), df2=inf — pinned literal (the ANOVA_F_CRIT discipline: never
# engine libm for constants).
LEVENE_F_CRIT = 2.372


@register(
    "stats_levene_bf",
    oracle=f"""
    WITH r AS (
      SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY CAST(value AS DECIMAL(18,2)), event_id
             ) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    m AS (
      SELECT event_type, v, n,
             max(CASE WHEN rn = (n + 1) // 2 THEN v END)
               OVER (PARTITION BY event_type) AS med
      FROM r
    ),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(abs(v - med)) AS DECIMAL(38,2)) AS s_g,
             CAST(sum(abs(v - med) * abs(v - med)) AS DECIMAL(38,4)) AS q_g
      FROM m GROUP BY event_type
    ),
    terms AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n_g) AS BIGINT) AS big_n,
             CAST(sum(CAST(round(CAST(s_g AS DOUBLE) * s_g / n_g, 6)
                           AS DECIMAL(28,6))) AS DECIMAL(38,6)) AS sum_t,
             CAST(sum(q_g) AS DECIMAL(38,4)) AS sum_q,
             CAST(sum(s_g) AS DECIMAL(38,2)) AS s_tot
      FROM g
    )
    SELECT k, big_n,
           round(((CAST(sum_t AS DOUBLE)
                   - CAST(s_tot AS DOUBLE) * s_tot / big_n) / (k - 1))
                 / ((CAST(sum_q AS DOUBLE) - sum_t) / (big_n - k)), 6) AS f_stat,
           (((CAST(sum_t AS DOUBLE)
              - CAST(s_tot AS DOUBLE) * s_tot / big_n) / (k - 1))
            / ((CAST(sum_q AS DOUBLE) - sum_t) / (big_n - k)))
             <= {LEVENE_F_CRIT} AS variances_homogeneous
    FROM terms
    """,
    doc="Brown-Forsythe variance-homogeneity test (Levene's test with "
    "the MEDIAN center): one-way ANOVA F over the absolute deviations "
    "|x - group median| across event types — the guard a pipeline "
    "runs BEFORE trusting stats_anova_weekday/ttest, whose pooled-"
    "variance assumptions it checks. Centers are the DISCRETE lower "
    "median (the house order-statistic rule); deviations are exact "
    "DECIMALs, so the group sufficient statistics (n_g, S_g, Q_g) "
    "aggregate exactly. The k-row reduction uses the per-cell "
    "round->DECIMAL discipline for the S_g^2/n_g terms (a raw float "
    "sum over groups would be engine-ordered), and the F statistic "
    "evaluates once in DOUBLE with an identical tree; the verdict "
    "compares against a PINNED critical literal, never engine CDFs. "
    "Two window passes per group + one aggregate — scan-bound.",
)
def stats_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    v = F.col("value").cast("decimal(18,2)")
    wr = Window.partitionBy("event_type").orderBy(v, "event_id")
    wp = Window.partitionBy("event_type")
    r = e.select("event_type", v.alias("v"), F.row_number().over(wr).alias("rn"),
                 F.count(F.lit(1)).over(wp).alias("n"))
    m = r.select(
        "event_type",
        "v",
        "n",
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("v"))
        ).over(wp).alias("med"),
    )
    dev = F.abs(F.col("v") - F.col("med"))
    g = m.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum(dev).cast("decimal(38,2)").alias("s_g"),
        F.sum(dev * dev).cast("decimal(38,4)").alias("q_g"),
    )
    t_g = F.round(F.col("s_g").cast("double") * F.col("s_g") / F.col("n_g"), 6).cast(
        "decimal(28,6)"
    )
    terms = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("big_n"),
        F.sum(t_g).cast("decimal(38,6)").alias("sum_t"),
        F.sum("q_g").cast("decimal(38,4)").alias("sum_q"),
        F.sum("s_g").cast("decimal(38,2)").alias("s_tot"),
    )
    ssb = (
        F.col("sum_t").cast("double")
        - F.col("s_tot").cast("double") * F.col("s_tot") / F.col("big_n")
    ) / (F.col("k") - 1)
    ssw = (F.col("sum_q").cast("double") - F.col("sum_t")) / (
        F.col("big_n") - F.col("k")
    )
    f_stat = ssb / ssw
    return terms.select(
        "k",
        "big_n",
        F.round(f_stat, 6).alias("f_stat"),
        (f_stat <= LEVENE_F_CRIT).alias("variances_homogeneous"),
    )


# Bot heuristics: machine-like cadence thresholds (pinned literals).
BOT_MAX_PER_HOUR = 12
BOT_ZERO_GAPS = 2


@register(
    "events_bot_detection",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             epoch_ms(ts) // 1000 AS sec,
             epoch_ms(ts) // 1000
               - lag(epoch_ms(ts) // 1000) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
      FROM events
    ),
    gaps AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(min(gap_s) AS BIGINT) AS min_gap_s,
             CAST(sum(CASE WHEN gap_s = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_gaps
      FROM seq GROUP BY user_id
    ),
    hourly AS (
      SELECT user_id, (sec - sec % 3600) // 3600 AS hb,
             CAST(count(*) AS BIGINT) AS c
      FROM seq GROUP BY 1, 2
    ),
    peak AS (
      SELECT user_id, CAST(max(c) AS BIGINT) AS max_per_hour
      FROM hourly GROUP BY user_id
    )
    SELECT g.user_id, g.n_events, g.min_gap_s, g.n_zero_gaps,
           p.max_per_hour,
           (g.n_zero_gaps >= {BOT_ZERO_GAPS}
            OR p.max_per_hour >= {BOT_MAX_PER_HOUR}) AS bot_like
    FROM gaps g JOIN peak p USING (user_id)
    """,
    doc="Bot-traffic heuristics per user: minimum inter-event gap, "
    "zero-gap (same-second) burst count, and peak events-per-hour — "
    "the cadence features an abuse/quality filter computes before "
    "training on behavioral data, with a pinned-literal decision "
    "rule (machine-like = repeated same-second firing OR an hourly "
    "rate no human sustains). One lag window per user (the "
    "events_markov_entropy ordering: ts then event_id) and two "
    "map-side-combined aggregates co-keyed on user_id, joined "
    "user-to-user — no new shuffle shape. Gap seconds and hour "
    "buckets are exact integer epoch math; NULL min_gap (single-"
    "event users) propagates honestly rather than being defaulted, "
    "and the flag's OR is NULL-safe because a 1-event user still has "
    "a max_per_hour.",
)
def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    sec = F.unix_timestamp("ts").cast("bigint")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        sec.alias("sec"),
        (sec - F.lag(sec).over(w)).alias("gap_s"),
    )
    gaps = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("gap_s").cast("bigint").alias("min_gap_s"),
        F.sum(F.when(F.col("gap_s") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero_gaps"),
    )
    hourly = seq.select(
        "user_id", ((F.col("sec") - F.col("sec") % 3600) / 3600).cast("bigint").alias("hb")
    ).groupBy("user_id", "hb").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    peak = hourly.groupBy("user_id").agg(
        F.max("c").cast("bigint").alias("max_per_hour")
    )
    return gaps.join(peak, "user_id").select(
        "user_id",
        "n_events",
        "min_gap_s",
        "n_zero_gaps",
        "max_per_hour",
        (
            (F.col("n_zero_gaps") >= BOT_ZERO_GAPS)
            | (F.col("max_per_hour") >= BOT_MAX_PER_HOUR)
        ).alias("bot_like"),
    )


# Friedman critical value: chi-square df = k-1 = 6 at alpha = 0.05
# (pinned literal, the ANOVA/Levene discipline).
FRIEDMAN_CHI2_CRIT = 12.592
FRIEDMAN_K = 7  # treatments: the seven weekdays


@register(
    "stats_friedman",
    oracle=f"""
    WITH cell AS (
      SELECT date_trunc('week', ts) AS wk,
             CAST(isodow(ts) AS BIGINT) AS dow,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS x
      FROM events GROUP BY 1, 2
    ),
    complete AS (
      SELECT wk FROM cell GROUP BY wk HAVING count(*) = {FRIEDMAN_K}
    ),
    ranked AS (
      SELECT c.wk, c.dow,
             CAST(2 * rank() OVER (PARTITION BY c.wk ORDER BY c.x)
                  + count(*) OVER (PARTITION BY c.wk, c.x) - 1
                  AS BIGINT) AS dr
      FROM cell c JOIN complete USING (wk)
    ),
    per_dow AS (
      SELECT dow, CAST(sum(dr) AS BIGINT) AS d_j FROM ranked GROUP BY dow
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(d_j * d_j) AS BIGINT) AS sum_d2
      FROM per_dow
    ),
    b AS (SELECT CAST(count(*) AS BIGINT) AS b FROM complete)
    SELECT s.k, b.b,
           round(12.0 / (b.b * s.k * (s.k + 1)) * (CAST(sum_d2 AS DOUBLE) / 4)
                 - 3.0 * b.b * (s.k + 1), 6) AS q_stat,
           (12.0 / (b.b * s.k * (s.k + 1)) * (CAST(sum_d2 AS DOUBLE) / 4)
                 - 3.0 * b.b * (s.k + 1)) > {FRIEDMAN_CHI2_CRIT} AS weekday_effect
    FROM s CROSS JOIN b
    """,
    doc="Friedman test: does weekday systematically shift the daily "
    "metric once week-to-week level differences are blocked out? "
    "Each complete ISO week is a BLOCK; the seven weekday cell sums "
    "rank WITHIN their week, and the statistic compares per-weekday "
    "rank sums — the repeated-measures complement of "
    "stats_kruskal_wallis (which pools all observations) and "
    "stats_anova_weekday (which assumes normality). Ranks use the "
    "double-rank 2*rank_min + ties - 1 encoding (stats_spearman's "
    "no-division midrank), so rank sums and their squares stay exact "
    "BIGINT; Q evaluates once in DOUBLE (the /4 de-scales the "
    "double-ranks) against a PINNED chi-square critical literal. "
    "Incomplete boundary weeks are excluded by an exact count "
    "predicate, identically on both engines. One cell aggregate, "
    "calendar-bounded windows — scan-bound at 100 TB.",
)
def stats_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.clickhouse import toDayOfWeek

    e = load(spark, "events", sf_dir)
    cell = e.groupBy(
        F.date_trunc("week", "ts").alias("wk"),
        toDayOfWeek("ts").cast("bigint").alias("dow"),
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(38,2)").alias("x"))
    wkn = Window.partitionBy("wk")
    complete = (
        cell.select("wk", F.count(F.lit(1)).over(wkn).alias("n_dow"), "dow", "x")
        .filter(F.col("n_dow") == FRIEDMAN_K)
    )
    wr = Window.partitionBy("wk").orderBy("x")
    wt = Window.partitionBy("wk", "x")
    ranked = complete.select(
        "wk",
        "dow",
        (F.rank().over(wr) * 2 + F.count(F.lit(1)).over(wt) - 1)
        .cast("bigint")
        .alias("dr"),
    )
    per_dow = ranked.groupBy("dow").agg(F.sum("dr").cast("bigint").alias("d_j"))
    s = per_dow.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("d_j") * F.col("d_j")).cast("bigint").alias("sum_d2"),
    )
    b = ranked.select("wk").distinct().agg(F.count(F.lit(1)).cast("bigint").alias("b"))
    q = (
        F.lit(12.0)
        / (F.col("b") * F.col("k") * (F.col("k") + 1))
        * (F.col("sum_d2").cast("double") / F.lit(4))
        - F.lit(3.0) * F.col("b") * (F.col("k") + 1)
    )
    return (
        s.crossJoin(F.broadcast(b))
        .select(
            "k",
            "b",
            F.round(q, 6).alias("q_stat"),
            (q > FRIEDMAN_CHI2_CRIT).alias("weekday_effect"),
        )
    )


# SRM guardrail: chi-square critical at df=1, alpha=0.001 (SRM checks
# run at strict alpha because a true mismatch invalidates the whole
# experiment; pinned literal).
SRM_CHI2_CRIT = 10.828


@register(
    "events_ab_srm_check",
    oracle=f"""
    WITH u AS (
      SELECT DISTINCT user_id FROM events
    ),
    assigned AS (
      SELECT user_id,
             CAST(('0x' || substr(md5('srm:' || CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 2 AS bucket
      FROM u
    ),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CASE WHEN bucket = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN bucket = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM assigned
    )
    SELECT n_users, n_a, n_b,
           round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / n_users, 6)
             AS chi2,
           (CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / n_users)
             > {SRM_CHI2_CRIT} AS srm_detected
    FROM c
    """,
    doc="Sample-ratio-mismatch guardrail for A/B experiments: users "
    "assign to arms by a deterministic hash (md5 mod 2 — the "
    "exact-uniforms kernel, so both engines re-derive the identical "
    "assignment), and the observed split tests against 50/50 with "
    "the df=1 chi-square, which for two equal-probability cells "
    "collapses to (n_a - n_b)^2 / n — one exact integer numerator, "
    "one final division. SRM is THE precondition check before "
    "events_ab_test_lift's effect estimates mean anything (a biased "
    "assignment pipeline invalidates them silently); alpha is strict "
    "(0.001, pinned literal) per industry practice. Assignment "
    "happens on DISTINCT users, one map-side-combined aggregate — "
    "scan-bound.",
)
def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    u = e.select("user_id").distinct()
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("srm:"), F.col("user_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    assigned = u.select((h % 2).alias("bucket"))
    c = assigned.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.when(F.col("bucket") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("bucket") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
    )
    chi2 = ((F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))).cast(
        "double"
    ) / F.col("n_users")
    return c.select(
        "n_users",
        "n_a",
        "n_b",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > SRM_CHI2_CRIT).alias("srm_detected"),
    )


# Neyman allocation: total sample budget split across strata
# proportional to N_h * S_h (pinned budget literal).
NEYMAN_TOTAL_N = 1000


@register(
    "sample_neyman_allocation",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_h,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sx,
             CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
                  AS DECIMAL(38,4)) AS sxx
      FROM events GROUP BY event_type
    ),
    w AS (
      SELECT event_type, n_h,
             n_h * sqrt((n_h * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        / (CAST(n_h AS DOUBLE) * (n_h - 1))) AS nh_sh
      FROM g
    ),
    t AS (SELECT sum(nh_sh) AS tot FROM w),
    alloc AS (
      SELECT event_type, n_h, nh_sh,
             CAST(floor({NEYMAN_TOTAL_N} * nh_sh / tot) AS BIGINT) AS base,
             {NEYMAN_TOTAL_N} * nh_sh / tot
               - floor({NEYMAN_TOTAL_N} * nh_sh / tot) AS rem
      FROM w CROSS JOIN t
    ),
    fin AS (
      SELECT event_type, n_h, nh_sh, base,
             row_number() OVER (ORDER BY rem DESC, event_type) AS rr,
             CAST({NEYMAN_TOTAL_N} - sum(base) OVER () AS BIGINT) AS deficit
      FROM alloc
    )
    SELECT event_type, n_h,
           round(nh_sh, 6) AS weight,
           CAST(base + CASE WHEN rr <= deficit THEN 1 ELSE 0 END AS BIGINT)
             AS alloc_n
    FROM fin
    """,
    doc="Neyman allocation of a fixed sample budget across strata "
    f"(n_h proportional to N_h * S_h, budget {NEYMAN_TOTAL_N}): the "
    "optimal stratified-sampling design when per-stratum variances "
    "differ — high-variance strata earn more of the budget than "
    "proportional allocation would give. Per-stratum sufficient "
    "statistics (count, sum, sum of squares) aggregate exactly in "
    "DECIMAL; S_h evaluates once per STRATUM in double (sqrt is IEEE "
    "correctly-rounded, the Mann-Whitney precedent); integer seats "
    "assign by floor + LARGEST REMAINDER with a stratum-name "
    "tiebreak, so the allocation sums to the budget exactly and "
    "deterministically on both engines. Everything after the one "
    "map-side-combined aggregate is strata-dimension-sized.",
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    v = F.col("value").cast("decimal(18,2)")
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.sum(v).cast("decimal(38,2)").alias("sx"),
        F.sum(v * v).cast("decimal(38,4)").alias("sxx"),
    )
    nh = F.col("n_h").cast("double")
    var = (F.col("n_h") * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx")) / (
        nh * (F.col("n_h") - 1)
    )
    w = g.select("event_type", "n_h", (F.col("n_h") * F.sqrt(var)).alias("nh_sh"))
    t = w.agg(F.sum("nh_sh").alias("tot"))
    share = F.lit(NEYMAN_TOTAL_N) * F.col("nh_sh") / F.col("tot")
    alloc = w.crossJoin(F.broadcast(t)).select(
        "event_type",
        "n_h",
        "nh_sh",
        F.floor(share).cast("bigint").alias("base"),
        (share - F.floor(share)).alias("rem"),
    )
    wr = Window.orderBy(F.col("rem").desc(), "event_type")
    wall = Window.partitionBy()
    fin = alloc.select(
        "event_type",
        "n_h",
        "nh_sh",
        "base",
        F.row_number().over(wr).alias("rr"),
        (F.lit(NEYMAN_TOTAL_N) - F.sum("base").over(wall)).cast("bigint").alias("deficit"),
    )
    return fin.select(
        "event_type",
        "n_h",
        F.round(F.col("nh_sh"), 6).alias("weight"),
        (F.col("base") + F.when(F.col("rr") <= F.col("deficit"), 1).otherwise(0))
        .cast("bigint")
        .alias("alloc_n"),
    )


# sequenceCount patterns over the single-letter journey alphabet
# (c=click, e=error, p=purchase, s=signup, v=view; the TYPE_BITS
# registry's initials — all five types start with distinct letters).
SEQ_COUNT_PATTERNS = (
    ("view_then_purchase", "v[^p]*p"),  # ClickHouse sequenceCount((?1).*(?2)) shape
    ("error_burst", "ee"),
    ("signup_funnel", "s[^p]*v[^p]*p"),
)


@register(
    "events_sequence_count",
    oracle=f"""
    WITH j AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS journey
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(strlen(journey) AS BIGINT) AS n_events,
           {", ".join(
               f"CAST(len(regexp_extract_all(journey, '{pat}')) AS BIGINT) AS {name}"
               for name, pat in SEQ_COUNT_PATTERNS
           )}
    FROM j
    """,
    doc="ClickHouse sequenceCount twin: per-user counts of "
    "NON-OVERLAPPING behavioral patterns, evaluated as regex matches "
    "over the journey string (each event one letter, ordered by "
    "(ts, event_id) — the markov/bot-detection ordering). The "
    "journey-string trick turns sequence analytics into vectorized "
    "string ops: v[^p]*p is sequenceCount('(?1)(?t<..)(?2)')-style "
    "view→purchase conversion, ee is the error-burst detector, and "
    "the three-step funnel composes the same way — no stateful UDF, "
    "no self-join chain. Both engines use non-overlapping "
    "left-to-right regex scan semantics (regexp_count / "
    "regexp_extract_all length), and the pattern alphabet is "
    "restricted to literal initials + negated classes so RE2 "
    "(DuckDB) and Java regex agree. Per-user strings are "
    "order-bounded; one aggregate, one projection.",
)
def events_sequence_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    seq = e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("c"))
                    )
                ),
                lambda s: s.getField("c"),
            ),
            "",
        ).alias("journey")
    )
    cols = [
        F.regexp_count("journey", F.lit(pat)).cast("bigint").alias(name)
        for name, pat in SEQ_COUNT_PATTERNS
    ]
    return seq.select(
        "user_id", F.length("journey").cast("bigint").alias("n_events"), *cols
    )


# --- Jarque-Bera normality + Benjamini-Hochberg FDR (round 11) ---------
#
# Exactness discipline: the four raw moment sums are exact DECIMAL
# (value fits (8,2); v^2 -> (17,4), v^4 -> (35,8) — every multiply
# stays under the 38-digit cap that silently truncates scale, the
# round-10 trap), so both engines hand IDENTICAL doubles to the same
# double expression text, and the only cross-engine wobble left is
# libm exp() (1 ulp), absorbed by round(p, 9) before any comparison.

_JB_DOUBLE_FRAG = """
      CAST(s1 AS DOUBLE) / n AS m1,
      CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m2
"""  # documentation only; the real fragments are built below


def _jb_exprs() -> dict[str, str]:
    """The moment->JB double math as SQL text shared VERBATIM by the
    Spark side (F.expr) and the DuckDB oracle, so both engines run
    the same IEEE ops in the same order on identical inputs."""
    m1 = "(s1 / n)"
    m2 = f"(s2 / n - {m1} * {m1})"
    m3 = f"(s3 / n - 3 * {m1} * (s2 / n) + 2 * {m1} * {m1} * {m1})"
    m4 = (
        f"(s4 / n - 4 * {m1} * (s3 / n) + 6 * {m1} * {m1} * (s2 / n)"
        f" - 3 * {m1} * {m1} * {m1} * {m1})"
    )
    skew = f"({m3} / ({m2} * sqrt({m2})))"
    kexc = f"({m4} / ({m2} * {m2}) - 3)"
    jb = f"(n / 6 * ({skew} * {skew} + {kexc} * {kexc} / 4))"
    return {"skew": skew, "kexc": kexc, "jb": jb}


_JB_SUMS_SQL = """
      SELECT {outer_keys},
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(v) AS DOUBLE) AS s1,
             CAST(sum(v * v) AS DOUBLE) AS s2,
             CAST(sum(CAST(v * v AS DECIMAL(19,4)) * v) AS DOUBLE) AS s3,
             CAST(sum(CAST(v * v AS DECIMAL(19,4))
                      * CAST(v * v AS DECIMAL(19,4))) AS DOUBLE) AS s4
      FROM (SELECT {inner_keys}, CAST(value AS DECIMAL(8,2)) AS v FROM events)
      GROUP BY {outer_keys}
"""


def _jb_sums_spark(e: DataFrame, keys: list[str]) -> DataFrame:
    v = F.col("value").cast("decimal(8,2)")
    v2 = v * v
    return e.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(v).cast("double").alias("s1"),
        F.sum(v2).cast("double").alias("s2"),
        F.sum(v2 * v).cast("double").alias("s3"),
        F.sum(v2 * v2).cast("double").alias("s4"),
    )


@register(
    "stats_jarque_bera",
    oracle=f"""
    WITH sums AS ({_JB_SUMS_SQL.format(inner_keys="event_type",
                                       outer_keys="event_type")})
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round({_jb_exprs()["skew"]}, 6) AS skew,
           round({_jb_exprs()["kexc"]}, 6) AS kurt_excess,
           round({_jb_exprs()["jb"]}, 6) AS jb_stat,
           {_jb_exprs()["jb"]} <= 5.991464547107979 AS normal_at_05
    FROM sums ORDER BY event_type
    """,
    doc="Jarque-Bera normality test per event type: skewness and "
    "excess kurtosis from the four raw moment sums (exact DECIMAL "
    "accumulation — order-free across engines and combine trees; "
    "v^4 sized to stay under the 38-digit product cap), "
    "JB = n/6 (S^2 + K^2/4), compared to the chi-square(2) 95% "
    "critical value as a literal. The double pipeline is ONE SQL "
    "text shared verbatim by both engines (F.expr on the Spark "
    "side), so every IEEE op runs in the same order — the moment "
    "battery's discipline extended to third/fourth powers. One "
    "map-side-combined groupBy at fact scale; 5 result rows.",
)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    x = _jb_exprs()
    return (
        _jb_sums_spark(e, ["event_type"])
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.expr(f"round({x['skew']}, 6)").alias("skew"),
            F.expr(f"round({x['kexc']}, 6)").alias("kurt_excess"),
            F.expr(f"round({x['jb']}, 6)").alias("jb_stat"),
            F.expr(f"{x['jb']} <= 5.991464547107979").alias("normal_at_05"),
        )
        .orderBy("event_type")
    )


FDR_Q = 0.10  # Benjamini-Hochberg target false-discovery rate


@register(
    "stats_fdr_bh",
    oracle=f"""
    WITH sums AS ({_JB_SUMS_SQL.format(
        inner_keys="event_type, weekofyear(ts) AS wk",
        outer_keys="event_type, wk")}),
    tests AS (
      SELECT event_type, wk, CAST(n AS BIGINT) AS n,
             round({_jb_exprs()["jb"]}, 6) AS jb_stat,
             round(exp(-({_jb_exprs()["jb"]}) / 2), 9) AS p_value
      FROM sums
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY p_value, event_type, wk) AS bh_rank,
             count(*) OVER () AS m
      FROM tests
    ),
    crossed AS (
      SELECT *,
             max(CASE WHEN p_value * m <= {FDR_Q} * bh_rank
                      THEN bh_rank END) OVER () AS cutoff
      FROM ranked
    )
    SELECT event_type, wk, n, jb_stat, p_value,
           CAST(bh_rank AS BIGINT) AS bh_rank,
           round({FDR_Q} * bh_rank / m, 9) AS bh_threshold,
           bh_rank <= coalesce(cutoff, 0) AS rejected
    FROM crossed
    """,
    doc="Benjamini-Hochberg FDR control over a FAMILY of hypothesis "
    "tests — the multiple-comparisons layer every per-segment "
    "metrics sweep needs (run 25 normality tests and ~1.25 will "
    "'fail' at alpha=.05; BH bounds the false-discovery RATE "
    "instead). Family: Jarque-Bera per (event_type, ISO week); "
    "p = exp(-JB/2) exact for chi-square df=2 (no CDF table "
    "needed), rounded to 9dp before ANY comparison so a 1-ulp libm "
    "exp() divergence cannot reorder ranks. BH step-up: rank by p "
    "(total tiebreak), reject ranks <= the largest i with "
    "p_i * m <= q * i — one window over the m-row test table "
    "(segment-bounded, never fact-bounded). Moment sums ride the "
    "stats_jarque_bera exact-DECIMAL discipline.",
)
def stats_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir).withColumn("wk", F.weekofyear("ts"))
    x = _jb_exprs()
    tests = _jb_sums_spark(e, ["event_type", "wk"]).select(
        "event_type",
        "wk",
        F.col("n").cast("bigint").alias("n"),
        F.expr(f"round({x['jb']}, 6)").alias("jb_stat"),
        F.expr(f"round(exp(-({x['jb']}) / 2), 9)").alias("p_value"),
    )
    wrank = Window.orderBy("p_value", "event_type", "wk")
    wall = Window.partitionBy()
    ranked = tests.select(
        "*",
        F.row_number().over(wrank).alias("bh_rank"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    crossed = ranked.withColumn(
        "cutoff",
        F.max(
            F.when(
                F.col("p_value") * F.col("m") <= FDR_Q * F.col("bh_rank"),
                F.col("bh_rank"),
            )
        ).over(wall),
    )
    return crossed.select(
        "event_type",
        "wk",
        "n",
        "jb_stat",
        "p_value",
        F.col("bh_rank").cast("bigint").alias("bh_rank"),
        F.round(F.lit(FDR_Q) * F.col("bh_rank") / F.col("m"), 9).alias("bh_threshold"),
        (F.col("bh_rank") <= F.coalesce(F.col("cutoff"), F.lit(0))).alias("rejected"),
    )


# --- Ljung-Box serial-correlation test (round 11) ----------------------

LB_LAGS = 5
LB_CHI2_5_95 = 11.070497693516351  # chi-square(5) 95% critical value


def _lb_exprs() -> dict[str, str]:
    """Closed-form Ljung-Box from exact sufficient statistics, as SQL
    text shared verbatim by both engines (the time_autocorr_lag1 /
    Jarque-Bera discipline). The mean-centered autocovariance is the
    scaled integer identity
      n^2*c_k = n^2*Sxy_k - n*S*(A_k + B_k) + (n-k)*S^2
    (A_k/B_k = sums of the first/last n-k terms), so rho_k = c_k/c_0
    divides two exactly-derived doubles and no engine ever centers a
    float series."""
    c0 = "(nd * nd * syyd - nd * sd * sd)"
    out: dict[str, str] = {}
    terms = []
    for k in range(1, LB_LAGS + 1):
        ck = (
            f"(nd * nd * sxyd{k} - nd * sd * (ad{k} + bd{k})"
            f" + (nd - {k}) * sd * sd)"
        )
        out[f"rho{k}"] = f"({ck} / {c0})"
        terms.append(f"({ck} / {c0}) * ({ck} / {c0}) / (nd - {k})")
    out["q"] = f"(nd * (nd + 2) * ({' + '.join(terms)}))"
    return out


_LB_LEAD_COLS_SQL = ",\n             ".join(
    f"lead(yc, {k}) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS y{k}"
    for k in range(1, LB_LAGS + 1)
)
_LB_AGG_SQL = ",\n             ".join(
    f"""CAST(sum(CAST(yc AS DECIMAL(19,0)) * y{k}) AS DECIMAL(30,0)) AS sxy{k},
             CAST(sum(CASE WHEN y{k} IS NOT NULL THEN yc END) AS DECIMAL(20,0)) AS a{k},
             CAST(sum(y{k}) AS DECIMAL(20,0)) AS b{k}"""
    for k in range(1, LB_LAGS + 1)
)
_LB_DOUBLES_SQL = ",\n             ".join(
    f"CAST(sxy{k} AS DOUBLE) AS sxyd{k}, CAST(a{k} AS DOUBLE) AS ad{k},"
    f" CAST(b{k} AS DOUBLE) AS bd{k}"
    for k in range(1, LB_LAGS + 1)
)


@register(
    "time_ljung_box",
    oracle=f"""
    WITH b AS (
      SELECT event_type, ts, event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
      FROM events WHERE ts IS NOT NULL
    ),
    p AS (
      SELECT event_type, yc,
             {_LB_LEAD_COLS_SQL}
      FROM b
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS DECIMAL(9,0)) AS n,
             CAST(sum(yc) AS DECIMAL(20,0)) AS sy,
             CAST(sum(CAST(yc AS DECIMAL(19,0)) * yc) AS DECIMAL(30,0)) AS syy,
             {_LB_AGG_SQL}
      FROM p GROUP BY event_type
    ),
    d AS (
      SELECT event_type, CAST(n AS BIGINT) AS n,
             CAST(n AS DOUBLE) AS nd, CAST(sy AS DOUBLE) AS sd,
             CAST(syy AS DOUBLE) AS syyd,
             {_LB_DOUBLES_SQL}
      FROM s
    )
    SELECT event_type, n,
           {", ".join(f"round({_lb_exprs()[f'rho{k}']}, 9) AS rho{k}"
                      for k in range(1, LB_LAGS + 1))},
           round({_lb_exprs()["q"]}, 6) AS q_lb,
           {_lb_exprs()["q"]} > {LB_CHI2_5_95} AS serial_corr_at_05
    FROM d
    WHERE (nd * nd * syyd - nd * sd * sd) > 0
    """,
    doc=f"Ljung-Box portmanteau test (m={LB_LAGS} lags) per series — "
    "'is the residual white noise', THE diagnostic gate after any "
    "forecast fit (time_holt_linear / forecast_backtest_naive "
    "produce the residuals this test judges). Lagged products come "
    f"from {LB_LAGS} lead() columns in ONE window pass per series "
    "(ts, event_id total order); every sufficient statistic is an "
    "exact DECIMAL integer-cents sum, and the mean-centered "
    "autocovariances use the scaled identity n^2*c_k = n^2*Sxy_k - "
    "n*S*(A_k+B_k) + (n-k)*S^2 so NOTHING centers a float series — "
    "both engines then run one shared double expression tree "
    "(Q = n(n+2) sum rho_k^2/(n-k)) on identical inputs, compared "
    "to the chi-square(m) 95% critical value as a literal. "
    "Low-cardinality series keys range-partition the window; at "
    "100 TB the same operator runs per (series, chunk) with m "
    "boundary rows handed across chunks (the autocorr_lag1 note, "
    "m-generalized).",
)
def time_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, "events", sf_dir).filter(F.col("ts").isNotNull())
    b = ev.select(
        "event_type",
        "ts",
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("yc"),
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    p = b.select(
        "event_type",
        "yc",
        *[F.lead("yc", k).over(w).alias(f"y{k}") for k in range(1, LB_LAGS + 1)],
    )
    aggs = [
        F.count(F.lit(1)).cast("decimal(9,0)").alias("n"),
        F.sum("yc").cast("decimal(20,0)").alias("sy"),
        F.sum(F.col("yc").cast("decimal(19,0)") * F.col("yc"))
        .cast("decimal(30,0)")
        .alias("syy"),
    ]
    for k in range(1, LB_LAGS + 1):
        aggs += [
            F.sum(F.col("yc").cast("decimal(19,0)") * F.col(f"y{k}"))
            .cast("decimal(30,0)")
            .alias(f"sxy{k}"),
            F.sum(F.when(F.col(f"y{k}").isNotNull(), F.col("yc")))
            .cast("decimal(20,0)")
            .alias(f"a{k}"),
            F.sum(f"y{k}").cast("decimal(20,0)").alias(f"b{k}"),
        ]
    s = p.groupBy("event_type").agg(*aggs)
    dcols = [
        F.col("event_type"),
        F.col("n").cast("bigint").alias("n"),
        F.col("n").cast("double").alias("nd"),
        F.col("sy").cast("double").alias("sd"),
        F.col("syy").cast("double").alias("syyd"),
    ]
    for k in range(1, LB_LAGS + 1):
        dcols += [
            F.col(f"sxy{k}").cast("double").alias(f"sxyd{k}"),
            F.col(f"a{k}").cast("double").alias(f"ad{k}"),
            F.col(f"b{k}").cast("double").alias(f"bd{k}"),
        ]
    d = s.select(*dcols)
    x = _lb_exprs()
    return d.filter(F.expr("(nd * nd * syyd - nd * sd * sd) > 0")).select(
        "event_type",
        "n",
        *[
            F.expr(f"round({x[f'rho{k}']}, 9)").alias(f"rho{k}")
            for k in range(1, LB_LAGS + 1)
        ],
        F.expr(f"round({x['q']}, 6)").alias("q_lb"),
        F.expr(f"{x['q']} > {LB_CHI2_5_95}").alias("serial_corr_at_05"),
    )


# --- effect size + CUPED (round 11, experimentation practice) ----------

CUPED_SPLIT = "2024-01-16 00:00:00"  # pre-period / post-period boundary


def _cohens_exprs() -> dict[str, str]:
    """Pooled-SD effect size from exact sufficient statistics, one
    SQL text for both engines (the welch/JB discipline)."""
    va = "((qa - aa * aa / na) / (na - 1))"
    vb = "((qb - ab * ab / nb) / (nb - 1))"
    pooled = f"(((na - 1) * {va} + (nb - 1) * {vb}) / (na + nb - 2))"
    d = f"((aa / na - ab / nb) / sqrt({pooled}))"
    return {
        "d": d,
        "g": f"({d} * (1 - 3 / (4 * (na + nb) - 9)))",
        "pooled": pooled,
    }


@register(
    "stats_cohens_d",
    oracle=f"""
    WITH b AS (
      SELECT event_type, user_id % 2 AS variant,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
      FROM events
    ),
    g AS (
      SELECT event_type,
             CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
                  AS DECIMAL(9,0)) AS cna,
             CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)
                  AS DECIMAL(9,0)) AS cnb,
             CAST(sum(CASE WHEN variant = 0 THEN yc ELSE 0 END)
                  AS DECIMAL(20,0)) AS csa,
             CAST(sum(CASE WHEN variant = 1 THEN yc ELSE 0 END)
                  AS DECIMAL(20,0)) AS csb,
             CAST(sum(CASE WHEN variant = 0
                           THEN CAST(yc AS DECIMAL(19,0)) * yc ELSE 0 END)
                  AS DECIMAL(30,0)) AS cqa,
             CAST(sum(CASE WHEN variant = 1
                           THEN CAST(yc AS DECIMAL(19,0)) * yc ELSE 0 END)
                  AS DECIMAL(30,0)) AS cqb
      FROM b GROUP BY event_type
    ),
    d AS (
      SELECT event_type,
             CAST(cna AS BIGINT) AS n_a, CAST(cnb AS BIGINT) AS n_b,
             CAST(cna AS DOUBLE) AS na, CAST(cnb AS DOUBLE) AS nb,
             CAST(csa AS DOUBLE) AS aa, CAST(csb AS DOUBLE) AS ab,
             CAST(cqa AS DOUBLE) AS qa, CAST(cqb AS DOUBLE) AS qb
      FROM g
    )
    SELECT event_type, n_a, n_b,
           round(aa / na - ab / nb, 6) AS mean_diff_cents,
           round(sqrt({_cohens_exprs()["pooled"]}), 6) AS pooled_sd,
           round({_cohens_exprs()["d"]}, 9) AS cohens_d,
           round({_cohens_exprs()["g"]}, 9) AS hedges_g
    FROM d
    """,
    doc="Cohen's d / Hedges' g effect size per metric — the number an "
    "A/B readout needs NEXT TO the p-value (stats_ttest_welch / "
    "events_ab_test_lift tell you 'significant'; this tells you "
    "'big enough to matter', in pooled-SD units, with the "
    "small-sample g correction). Variant = user_id parity (the "
    "events_ab_test_lift convention). Exact-DECIMAL sufficient "
    "statistics in ONE conditional-aggregation scan (no second pass "
    "per variant), then one shared double expression text for both "
    "engines. Segment-bounded output.",
)
def stats_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    yc = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    isa = F.col("user_id") % 2 == 0
    ycd = yc.cast("decimal(19,0)")
    g = e.select(F.col("event_type"), isa.alias("ia"), yc.alias("yc"), (ycd * yc).alias("yq")).groupBy(
        "event_type"
    ).agg(
        F.sum(F.when(F.col("ia"), 1).otherwise(0)).cast("decimal(9,0)").alias("cna"),
        F.sum(F.when(~F.col("ia"), 1).otherwise(0)).cast("decimal(9,0)").alias("cnb"),
        F.sum(F.when(F.col("ia"), F.col("yc")).otherwise(0)).cast("decimal(20,0)").alias("csa"),
        F.sum(F.when(~F.col("ia"), F.col("yc")).otherwise(0)).cast("decimal(20,0)").alias("csb"),
        F.sum(F.when(F.col("ia"), F.col("yq")).otherwise(0)).cast("decimal(30,0)").alias("cqa"),
        F.sum(F.when(~F.col("ia"), F.col("yq")).otherwise(0)).cast("decimal(30,0)").alias("cqb"),
    )
    d = g.select(
        "event_type",
        F.col("cna").cast("bigint").alias("n_a"),
        F.col("cnb").cast("bigint").alias("n_b"),
        F.col("cna").cast("double").alias("na"),
        F.col("cnb").cast("double").alias("nb"),
        F.col("csa").cast("double").alias("aa"),
        F.col("csb").cast("double").alias("ab"),
        F.col("cqa").cast("double").alias("qa"),
        F.col("cqb").cast("double").alias("qb"),
    )
    x = _cohens_exprs()
    return d.select(
        "event_type",
        "n_a",
        "n_b",
        F.expr("round(aa / na - ab / nb, 6)").alias("mean_diff_cents"),
        F.expr(f"round(sqrt({x['pooled']}), 6)").alias("pooled_sd"),
        F.expr(f"round({x['d']}, 9)").alias("cohens_d"),
        F.expr(f"round({x['g']}, 9)").alias("hedges_g"),
    )


def _cuped_exprs() -> dict[str, str]:
    """CUPED algebra as shared SQL text over exact per-variant and
    global sufficient statistics (n/sp/so/spp/spo/soo + tn/tsp/tso/
    tspp/tspo): theta from the GLOBAL pre/post covariance, per-variant
    post and adjusted variances expanded so no per-user second pass
    is ever needed:
      var(adj) = var(post) - 2 theta cov(pre,post) + theta^2 var(pre).
    """
    theta = "((tn * tspo - tsp * tso) / (tn * tspp - tsp * tsp))"
    mpre = "(tsp / tn)"
    mean_post = "(so / n)"
    mean_adj = f"({mean_post} - {theta} * (sp / n - {mpre}))"
    var_post = "((soo - so * so / n) / (n - 1))"
    var_pre = "((spp - sp * sp / n) / (n - 1))"
    cov = "((spo - sp * so / n) / (n - 1))"
    var_adj = (
        f"({var_post} - 2 * {theta} * {cov}"
        f" + {theta} * {theta} * {var_pre})"
    )
    return {
        "theta": theta,
        "mean_post": mean_post,
        "mean_adj": mean_adj,
        "var_post": var_post,
        "var_adj": var_adj,
        "red": f"(1 - {var_adj} / {var_post})",
    }


@register(
    "events_cuped_adjustment",
    oracle=f"""
    WITH u AS (
      SELECT user_id, user_id % 2 AS variant,
             CAST(sum(CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT}'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS pre,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT}'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS post
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT variant,
             CAST(count(*) AS DECIMAL(9,0)) AS n,
             CAST(sum(pre) AS DECIMAL(22,0)) AS sp,
             CAST(sum(post) AS DECIMAL(22,0)) AS so,
             CAST(sum(CAST(pre AS DECIMAL(19,0)) * pre) AS DECIMAL(34,0)) AS spp,
             CAST(sum(CAST(pre AS DECIMAL(19,0)) * post) AS DECIMAL(34,0)) AS spo,
             CAST(sum(CAST(post AS DECIMAL(19,0)) * post) AS DECIMAL(34,0)) AS soo
      FROM u GROUP BY variant
    ),
    t AS (
      SELECT *,
             CAST(sum(n) OVER () AS DOUBLE) AS tn,
             CAST(sum(sp) OVER () AS DOUBLE) AS tsp,
             CAST(sum(so) OVER () AS DOUBLE) AS tso,
             CAST(sum(spp) OVER () AS DOUBLE) AS tspp,
             CAST(sum(spo) OVER () AS DOUBLE) AS tspo
      FROM g
    ),
    d AS (
      SELECT CAST(variant AS BIGINT) AS variant,
             CAST(n AS BIGINT) AS n_users,
             CAST(n AS DOUBLE) AS n, CAST(sp AS DOUBLE) AS sp,
             CAST(so AS DOUBLE) AS so, CAST(spp AS DOUBLE) AS spp,
             CAST(spo AS DOUBLE) AS spo, CAST(soo AS DOUBLE) AS soo,
             tn, tsp, tso, tspp, tspo
      FROM t
    )
    SELECT variant, n_users,
           round({_cuped_exprs()["theta"]}, 9) AS theta,
           round({_cuped_exprs()["mean_post"]}, 6) AS mean_post,
           round({_cuped_exprs()["mean_adj"]}, 6) AS mean_adjusted,
           round({_cuped_exprs()["var_post"]}, 4) AS var_post,
           round({_cuped_exprs()["var_adj"]}, 4) AS var_adjusted,
           round({_cuped_exprs()["red"]}, 6) AS variance_reduction
    FROM d
    """,
    doc="CUPED variance reduction — the standard pre-experiment-"
    "covariate adjustment every mature A/B platform applies before "
    "reading a metric: theta = cov(pre, post)/var(pre) from the "
    "GLOBAL sample, adjusted metric = post - theta (pre - mean_pre), "
    "reported per variant (user_id parity) with the realized "
    "variance reduction 1 - var_adj/var_post. The identity "
    "var(adj) = var(post) - 2 theta cov + theta^2 var(pre) means "
    "everything comes from ONE per-user aggregate scan + one "
    "6-number-per-variant rollup — no per-user second pass, no "
    "re-scan with theta. Per-user pre/post sums are exact integer "
    "cents; variant/global moments are exact DECIMAL; the double "
    "algebra is one shared SQL text (the welch/JB/Ljung-Box "
    "discipline). At 100 TB: fact scan -> user rollup (map-side "
    "combined) -> 2-row output.",
)
def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100).cast("bigint")
    pre_f = F.expr(f"ts < TIMESTAMP '{CUPED_SPLIT}'")
    u = e.groupBy("user_id").agg(
        F.sum(F.when(pre_f, cents).otherwise(0)).cast("bigint").alias("pre"),
        F.sum(F.when(~pre_f, cents).otherwise(0)).cast("bigint").alias("post"),
    ).select(
        (F.col("user_id") % 2).alias("variant"), "pre", "post"
    )
    pd_, po_ = F.col("pre").cast("decimal(19,0)"), F.col("post")
    g = u.groupBy("variant").agg(
        F.count(F.lit(1)).cast("decimal(9,0)").alias("n"),
        F.sum("pre").cast("decimal(22,0)").alias("sp"),
        F.sum("post").cast("decimal(22,0)").alias("so"),
        F.sum(pd_ * F.col("pre")).cast("decimal(34,0)").alias("spp"),
        F.sum(pd_ * po_).cast("decimal(34,0)").alias("spo"),
        F.sum(po_.cast("decimal(19,0)") * po_).cast("decimal(34,0)").alias("soo"),
    )
    wall = Window.partitionBy()
    t = g.select(
        "*",
        F.sum("n").over(wall).cast("double").alias("tn"),
        F.sum("sp").over(wall).cast("double").alias("tsp"),
        F.sum("so").over(wall).cast("double").alias("tso"),
        F.sum("spp").over(wall).cast("double").alias("tspp"),
        F.sum("spo").over(wall).cast("double").alias("tspo"),
    )
    d = t.select(
        F.col("variant").cast("bigint").alias("variant"),
        F.col("n").cast("bigint").alias("n_users"),
        F.col("n").cast("double").alias("n"),
        F.col("sp").cast("double").alias("sp"),
        F.col("so").cast("double").alias("so"),
        F.col("spp").cast("double").alias("spp"),
        F.col("spo").cast("double").alias("spo"),
        F.col("soo").cast("double").alias("soo"),
        "tn", "tsp", "tso", "tspp", "tspo",
    )
    x = _cuped_exprs()
    return d.select(
        "variant",
        "n_users",
        F.expr(f"round({x['theta']}, 9)").alias("theta"),
        F.expr(f"round({x['mean_post']}, 6)").alias("mean_post"),
        F.expr(f"round({x['mean_adj']}, 6)").alias("mean_adjusted"),
        F.expr(f"round({x['var_post']}, 4)").alias("var_post"),
        F.expr(f"round({x['var_adj']}, 4)").alias("var_adjusted"),
        F.expr(f"round({x['red']}, 6)").alias("variance_reduction"),
    )


# --- A/B sample-size (power) analysis (round 11) ------------------------

POWER_Z_ALPHA = 1.9599639845400545  # two-sided alpha = 0.05
POWER_Z_BETA = 0.8416212335729143  # power = 0.80
POWER_MDE_PCT = 2  # minimum detectable effect, % of the metric mean


@register(
    "stats_power_analysis",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS DECIMAL(9,0)) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(24,2)) AS s1,
             CAST(sum(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2))) AS DECIMAL(34,4)) AS s2
      FROM events GROUP BY event_type
    ),
    d AS (
      SELECT event_type, CAST(n AS BIGINT) AS n_obs,
             CAST(n AS DOUBLE) AS n, CAST(s1 AS DOUBLE) AS s1,
             CAST(s2 AS DOUBLE) AS s2
      FROM g
    ),
    m AS (
      SELECT event_type, n_obs,
             s1 / n AS mean,
             (s2 - s1 * s1 / n) / (n - 1) AS var
      FROM d
    )
    SELECT event_type, n_obs,
           round(mean, 6) AS mean,
           round(sqrt(var), 6) AS sd,
           round(mean * {POWER_MDE_PCT} / 100.0, 6) AS mde_abs,
           CAST(ceil(2 * var
                * ({POWER_Z_ALPHA} + {POWER_Z_BETA})
                * ({POWER_Z_ALPHA} + {POWER_Z_BETA})
                / ((mean * {POWER_MDE_PCT} / 100.0)
                   * (mean * {POWER_MDE_PCT} / 100.0))) AS BIGINT)
             AS n_per_arm,
           CAST(ceil(2 * var
                * ({POWER_Z_ALPHA} + {POWER_Z_BETA})
                * ({POWER_Z_ALPHA} + {POWER_Z_BETA})
                / ((mean * {POWER_MDE_PCT} / 100.0)
                   * (mean * {POWER_MDE_PCT} / 100.0))) AS BIGINT)
             <= n_obs / 2 AS currently_powered
    FROM m
    """,
    doc=f"A/B sample-size calculator per metric — the question asked "
    "BEFORE the experiment the rest of the A/B battery reads after: "
    "n per arm = 2 sigma^2 (z_alpha/2 + z_beta)^2 / delta^2 for a "
    f"{POWER_MDE_PCT}%-of-mean minimum detectable effect at "
    "alpha=.05, power=.80 (z quantiles as literals — no CDF "
    "inversion at query time). Variance from the exact-DECIMAL "
    "moment discipline; one shared double expression; flags whether "
    "the CURRENT traffic (n/2 per arm) already powers the test. "
    "One map-side-combined groupBy; 5 result rows.",
)
def stats_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    v = F.col("value").cast("decimal(18,2)")
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(9,0)").alias("n"),
        F.sum(v).cast("decimal(24,2)").alias("s1"),
        F.sum(v * v).cast("decimal(34,4)").alias("s2"),
    )
    d = g.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_obs"),
        F.col("n").cast("double").alias("n"),
        F.col("s1").cast("double").alias("s1"),
        F.col("s2").cast("double").alias("s2"),
    )
    m = d.select(
        "event_type",
        "n_obs",
        F.expr("s1 / n").alias("mean"),
        F.expr("(s2 - s1 * s1 / n) / (n - 1)").alias("var"),
    )
    zz = f"({POWER_Z_ALPHA} + {POWER_Z_BETA}) * ({POWER_Z_ALPHA} + {POWER_Z_BETA})"
    mde = f"(mean * {POWER_MDE_PCT} / 100.0)"
    n_arm = f"CAST(ceil(2 * var * {zz} / ({mde} * {mde})) AS BIGINT)"
    return m.select(
        "event_type",
        "n_obs",
        F.expr("round(mean, 6)").alias("mean"),
        F.expr("round(sqrt(var), 6)").alias("sd"),
        F.expr(f"round({mde}, 6)").alias("mde_abs"),
        F.expr(n_arm).alias("n_per_arm"),
        F.expr(f"{n_arm} <= n_obs / 2").alias("currently_powered"),
    )


# --- permutation test (round 11 continuation) ---------------------------

# Number of label-shuffle replicates. Production permutation tests draw
# fresh random relabelings; the hash-checkable twin derives replicate r's
# assignment from md5(user:r) parity (the privacy_dp_counts seeding), so
# both engines reproduce the identical permutation family.
PERM_B = 32


@register(
    "stats_permutation_test",
    oracle=f"""
    WITH u AS (
      SELECT event_type, user_id,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc
      FROM events GROUP BY 1, 2
    ),
    reps AS (SELECT CAST(r.range AS INT) AS rep FROM range(0, {PERM_B + 1}) r),
    asg AS (
      SELECT u.event_type, u.sc, p.rep,
             CASE WHEN p.rep = 0 THEN user_id % 2
                  ELSE CAST(('0x' || substr(md5('perm:' ||
                         CAST(user_id AS VARCHAR) || ':' ||
                         CAST(p.rep AS VARCHAR)), 1, 8)) AS BIGINT) % 2
             END AS grp
      FROM u CROSS JOIN reps p
    ),
    g AS (
      SELECT event_type, rep,
             CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN grp = 0 THEN sc ELSE 0 END) AS BIGINT) AS sa,
             CAST(sum(CASE WHEN grp = 1 THEN sc ELSE 0 END) AS BIGINT) AS sb
      FROM asg GROUP BY 1, 2
    ),
    stat AS (
      SELECT event_type, rep, na + nb AS n_users,
             abs(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) AS st
      FROM g
    ),
    obs AS (SELECT event_type, n_users, st AS obs_st FROM stat WHERE rep = 0)
    SELECT o.event_type,
           CAST(o.n_users AS BIGINT) AS n_users,
           round(o.obs_st, 6) AS obs_abs_diff_cents,
           CAST(sum(CASE WHEN s.st >= o.obs_st THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ge,
           round((1.0 + sum(CASE WHEN s.st >= o.obs_st THEN 1 ELSE 0 END))
                 / {PERM_B + 1}.0, 6) AS p_value
    FROM obs o JOIN stat s ON s.event_type = o.event_type AND s.rep > 0
    GROUP BY o.event_type, o.n_users, o.obs_st
    """,
    doc="Permutation test on the per-user mean metric difference "
    "(variant = user_id parity, the A/B convention): the "
    "distribution-free alternative to stats_ttest_welch — relabel "
    f"users {PERM_B} times, recompute |mean(A) - mean(B)|, and the "
    "p-value is the add-one-smoothed fraction of relabelings at "
    "least as extreme as the observed split. Replicate assignments "
    "are md5(user:rep)-parity (the privacy_dp_counts determinism "
    "trick), so the permutation family is identical in both "
    "engines; the statistic is |sa/na - sb/nb| from exact BIGINT "
    "sufficient sums — two IEEE divisions and a subtraction, no "
    "libm, bit-reproducible everywhere. Cost shape: the user-level "
    f"reduction is ONE map-side-combined aggregate; only the (user x "
    f"type)-dimension table replicates x{PERM_B + 1}, and the "
    "replicate aggregate shuffles (type, rep)-bounded rows — at "
    "100 TB the fact scan happens once, the permutation loop never "
    "touches it.",
)
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    u = e.groupBy("event_type", "user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("sc")
    )
    reps = F.explode(F.sequence(F.lit(0), F.lit(PERM_B))).alias("rep")
    seed = F.concat(
        F.lit("perm:"),
        F.col("user_id").cast("string"),
        F.lit(":"),
        F.col("rep").cast("string"),
    )
    hash_grp = F.conv(F.substring(F.md5(seed), 1, 8), 16, 10).cast("long") % 2
    asg = u.select("event_type", "sc", "user_id", reps).select(
        "event_type",
        "sc",
        "rep",
        F.when(F.col("rep") == 0, F.col("user_id") % 2)
        .otherwise(hash_grp)
        .alias("grp"),
    )
    g = asg.groupBy("event_type", "rep").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).cast("bigint").alias("na"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).cast("bigint").alias("nb"),
        F.sum(F.when(F.col("grp") == 0, F.col("sc")).otherwise(0))
        .cast("bigint")
        .alias("sa"),
        F.sum(F.when(F.col("grp") == 1, F.col("sc")).otherwise(0))
        .cast("bigint")
        .alias("sb"),
    )
    stat = g.select(
        "event_type",
        "rep",
        (F.col("na") + F.col("nb")).alias("n_users"),
        F.abs(
            F.col("sa").cast("double") / F.col("na")
            - F.col("sb").cast("double") / F.col("nb")
        ).alias("st"),
    )
    obs = stat.filter(F.col("rep") == 0).select(
        "event_type", "n_users", F.col("st").alias("obs_st")
    )
    perms = stat.filter(F.col("rep") > 0).select("event_type", "st")
    ge = F.when(F.col("st") >= F.col("obs_st"), 1).otherwise(0)
    return (
        perms.join(F.broadcast(obs), "event_type")
        .groupBy("event_type", "n_users", "obs_st")
        .agg(
            F.sum(ge).cast("bigint").alias("n_ge"),
        )
        .select(
            "event_type",
            F.col("n_users").cast("bigint").alias("n_users"),
            F.round(F.col("obs_st"), 6).alias("obs_abs_diff_cents"),
            "n_ge",
            F.round(
                (F.lit(1.0) + F.col("n_ge")) / F.lit(float(PERM_B + 1)), 6
            ).alias("p_value"),
        )
    )


# --- HMM Viterbi decoding (round 11 continuation) -----------------------

# Fixed two-state engagement HMM (Quiet=0 / Active=1). Decoding with
# FIXED parameters is the production shape (the model is trained
# offline; the engine's job is the sequence labeling). All log-probs
# are quantized ONCE in Python to integer micro-nats, so every Viterbi
# score is an exact BIGINT sum and both engines (and the pure-Python
# reference) agree bit for bit; ties prefer the lower state index.
HMM_START = {0: 0.6, 1: 0.4}
HMM_TRANS = {(0, 0): 0.8, (0, 1): 0.2, (1, 0): 0.3, (1, 1): 0.7}
HMM_EMIT = {
    0: {"view": 0.45, "click": 0.25, "signup": 0.15, "error": 0.10,
        "purchase": 0.05},
    1: {"purchase": 0.35, "click": 0.30, "view": 0.15, "signup": 0.10,
        "error": 0.10},
}
_MU = 1_000_000
HMM_START_MU = {s: round(_math.log(p) * _MU) for s, p in HMM_START.items()}
HMM_TRANS_MU = {k: round(_math.log(p) * _MU) for k, p in HMM_TRANS.items()}
HMM_EMIT_MU = {
    s: {t: round(_math.log(p) * _MU) for t, p in d.items()}
    for s, d in HMM_EMIT.items()
}
HMM_PATH_HEAD = 16  # rendered path prefix length
# Out-of-alphabet emission penalty: log(1e-9) in micro-nats. Without
# an ELSE branch a single unknown event_type would NULL every score,
# path, and output column for that user IN BOTH ENGINES — the gate
# would still hash-match while emitting meaningless rows (round-11
# ADVICE). The penalty is state-independent, so an unknown symbol
# cannot flip the decoded state; it only (heavily) debits the score,
# and a corpus schema change shows up as a crashed score instead of a
# silent NULL.
HMM_UNKNOWN_MU = round(_math.log(1e-9) * _MU)


def _hmm_emit_case(state: int, var: str) -> str:
    whens = " ".join(
        f"WHEN '{t}' THEN ({mu})" for t, mu in sorted(HMM_EMIT_MU[state].items())
    )
    return f"CASE {var} {whens} ELSE ({HMM_UNKNOWN_MU}) END"


def _hmm_emit_col(state: int, sym) -> "F.Column":
    """Spark twin of :func:`_hmm_emit_case` — module-level so the
    unknown-symbol ELSE branch is directly unit-testable."""
    expr = None
    for t, mu in sorted(HMM_EMIT_MU[state].items()):
        expr = (
            F.when(sym == t, F.lit(mu))
            if expr is None
            else expr.when(sym == t, F.lit(mu))
        )
    return expr.otherwise(F.lit(HMM_UNKNOWN_MU)).cast("bigint")


@register(
    "stats_hmm_viterbi",
    oracle=f"""
    WITH RECURSIVE g AS (
      SELECT user_id, list(event_type ORDER BY ts, event_id) AS obs
      FROM events GROUP BY user_id
    ),
    f AS (
      SELECT user_id, obs, CAST(len(obs) AS BIGINT) AS n, 1 AS k,
             CAST({HMM_START_MU[0]} + {_hmm_emit_case(0, "obs[1]")} AS BIGINT)
               AS s0,
             CAST({HMM_START_MU[1]} + {_hmm_emit_case(1, "obs[1]")} AS BIGINT)
               AS s1,
             [0] AS p0, [1] AS p1
      FROM g
      UNION ALL
      SELECT user_id, obs, n, k + 1,
             CAST(greatest(s0 + ({HMM_TRANS_MU[(0, 0)]}),
                           s1 + ({HMM_TRANS_MU[(1, 0)]}))
                  + {_hmm_emit_case(0, "obs[k + 1]")} AS BIGINT) AS s0,
             CAST(greatest(s0 + ({HMM_TRANS_MU[(0, 1)]}),
                           s1 + ({HMM_TRANS_MU[(1, 1)]}))
                  + {_hmm_emit_case(1, "obs[k + 1]")} AS BIGINT) AS s1,
             list_append(CASE WHEN s0 + ({HMM_TRANS_MU[(0, 0)]})
                                   >= s1 + ({HMM_TRANS_MU[(1, 0)]})
                              THEN p0 ELSE p1 END, 0) AS p0,
             list_append(CASE WHEN s0 + ({HMM_TRANS_MU[(0, 1)]})
                                   >= s1 + ({HMM_TRANS_MU[(1, 1)]})
                              THEN p0 ELSE p1 END, 1) AS p1
      FROM f WHERE k < n
    ),
    last AS (
      SELECT user_id, n, s0, s1,
             CASE WHEN s1 > s0 THEN 1 ELSE 0 END AS best_state,
             CASE WHEN s1 > s0 THEN s1 ELSE s0 END AS best_score_mu,
             CASE WHEN s1 > s0 THEN p1 ELSE p0 END AS path
      FROM f WHERE k = n
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_steps,
           CAST(best_state AS BIGINT) AS best_state, best_score_mu,
           CAST(list_sum(path) AS BIGINT) AS n_active,
           CAST(coalesce(list_sum([CASE WHEN path[i + 1] <> path[i]
                          THEN 1 ELSE 0 END
                 for i in range(1, len(path))]), 0) AS BIGINT) AS n_switches,
           array_to_string(path[1:least(len(path), {HMM_PATH_HEAD})],
                           '') AS path_head
    FROM last
    """,
    doc="HMM Viterbi decoding of each user's event journey under a "
    "fixed two-state engagement model (Quiet/Active) — the "
    "sequence-labeling operator behind regime segmentation, "
    "bot-vs-human windows, and churn-phase tagging, where "
    "events_markov_entropy measures a chain and this one LABELS it "
    "with the latent state path. Decoding with fixed offline-"
    "trained parameters is the production shape. Exactness: all "
    "log-probs are quantized once in Python to integer micro-nats "
    "and injected into both engines (the sim_ndcg_eval/"
    "dominant_period discipline), so every Viterbi score is an "
    "exact BIGINT sum, argmax ties prefer state 0, and the decoded "
    "path hashes identically; an out-of-alphabet symbol takes the "
    "state-independent HMM_UNKNOWN_MU penalty (log 1e-9) in BOTH "
    "engines instead of silently NULLing the user's row, so a "
    "corpus schema change fails loudly; the two candidate paths "
    "ride the fold, so no backtracking pass is needed. Shape: ONE "
    "order-bounded groupBy builds the per-user journey, then the "
    "DP folds per user (Spark: codegen higher-order aggregate; "
    "oracle: recursive CTE) — work is O(total events x states^2) "
    "with journey-local state, no shuffle inside the recursion.",
)
def stats_hmm_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    g = e.groupBy("user_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("ts"), F.col("event_id"), F.col("event_type")
                    )
                )
            ),
            lambda s: s.getField("event_type"),
        ).alias("obs")
    )

    emit = _hmm_emit_col

    obs = F.col("obs")
    t00, t01 = HMM_TRANS_MU[(0, 0)], HMM_TRANS_MU[(0, 1)]
    t10, t11 = HMM_TRANS_MU[(1, 0)], HMM_TRANS_MU[(1, 1)]
    init = F.struct(
        (F.lit(HMM_START_MU[0]).cast("bigint") + emit(0, F.element_at(obs, 1))).alias("s0"),
        (F.lit(HMM_START_MU[1]).cast("bigint") + emit(1, F.element_at(obs, 1))).alias("s1"),
        F.array(F.lit(0)).alias("p0"),
        F.array(F.lit(1)).alias("p1"),
    )

    def step(acc: F.Column, sym: F.Column) -> F.Column:
        s0, s1 = acc.getField("s0"), acc.getField("s1")
        p0, p1 = acc.getField("p0"), acc.getField("p1")
        c00, c10 = s0 + t00, s1 + t10
        c01, c11 = s0 + t01, s1 + t11
        ns0 = F.greatest(c00, c10) + emit(0, sym)
        ns1 = F.greatest(c01, c11) + emit(1, sym)
        np0 = F.concat(F.when(c00 >= c10, p0).otherwise(p1), F.array(F.lit(0)))
        np1 = F.concat(F.when(c01 >= c11, p0).otherwise(p1), F.array(F.lit(1)))
        return F.struct(
            ns0.alias("s0"), ns1.alias("s1"), np0.alias("p0"), np1.alias("p1")
        )

    folded = g.select(
        "user_id",
        F.size(obs).cast("bigint").alias("n_steps"),
        F.aggregate(
            F.slice(obs, 2, F.greatest(F.size(obs) - 1, F.lit(0))), init, step
        ).alias("st"),
    )
    s0, s1 = F.col("st").getField("s0"), F.col("st").getField("s1")
    best1 = s1 > s0
    path = F.when(best1, F.col("st").getField("p1")).otherwise(
        F.col("st").getField("p0")
    )
    switches = F.coalesce(
        F.aggregate(
            F.zip_with(
                F.slice(path, 2, F.greatest(F.size(path) - 1, F.lit(0))),
                F.slice(path, 1, F.greatest(F.size(path) - 1, F.lit(0))),
                lambda a, b: F.when(a != b, 1).otherwise(0),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ),
        F.lit(0).cast("bigint"),
    )
    return folded.select(
        "user_id",
        "n_steps",
        F.when(best1, 1).otherwise(0).cast("bigint").alias("best_state"),
        F.when(best1, s1).otherwise(s0).alias("best_score_mu"),
        F.aggregate(
            path, F.lit(0).cast("bigint"), lambda acc, v: acc + v
        ).alias("n_active"),
        switches.alias("n_switches"),
        F.array_join(
            F.transform(
                F.slice(path, 1, F.least(F.size(path), F.lit(HMM_PATH_HEAD))),
                lambda v: v.cast("string"),
            ),
            "",
        ).alias("path_head"),
    )


# --- McNemar paired test (round 11 continuation) ------------------------

# Chi-square(1) critical value at alpha = 0.05 (the chi_square/ANOVA
# literal-critical-value convention: no engine evaluates a CDF).
MCNEMAR_SPLIT = "2024-01-16 00:00:00"
MCNEMAR_CHI2_CRIT = 3.841459
MCNEMAR_HEAVY = 7  # 'heavy purchaser' threshold (per-half purchase count)


@register(
    "stats_mcnemar",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CASE WHEN sum(CASE WHEN event_type = 'purchase'
                            AND ts < TIMESTAMP '{MCNEMAR_SPLIT}'
                           THEN 1 ELSE 0 END) >= {MCNEMAR_HEAVY}
                  THEN 1 ELSE 0 END AS before_flag,
             CASE WHEN sum(CASE WHEN event_type = 'purchase'
                            AND ts >= TIMESTAMP '{MCNEMAR_SPLIT}'
                           THEN 1 ELSE 0 END) >= {MCNEMAR_HEAVY}
                  THEN 1 ELSE 0 END AS after_flag
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CASE WHEN before_flag = 1 AND after_flag = 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
             CAST(sum(CASE WHEN before_flag = 1 AND after_flag = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_lost,
             CAST(sum(CASE WHEN before_flag = 0 AND after_flag = 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_gained,
             CAST(sum(CASE WHEN before_flag = 0 AND after_flag = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
      FROM u
    )
    SELECT n_users, n_both, n_lost, n_gained, n_neither,
           round(CAST((n_lost - n_gained) AS DOUBLE)
                 * (n_lost - n_gained) / nullif(n_lost + n_gained, 0), 9)
             AS mcnemar_chi2,
           (CAST((n_lost - n_gained) AS DOUBLE) * (n_lost - n_gained)
            > {MCNEMAR_CHI2_CRIT} * nullif(n_lost + n_gained, 0))
             AS reject_h0
    FROM s
    """,
    doc="McNemar's test for PAIRED binary outcomes: did each user's "
    "heavy-purchaser status (>= MCNEMAR_HEAVY purchases in the "
    "half) change between the two halves of the observation "
    "window? The before/after pair per user makes this "
    "the correct test where stats_chi_square's independence test "
    "would be wrong (the same users appear in both columns, so the "
    "samples aren't independent) — only the DISCORDANT pairs "
    "(lost/gained) carry information, and the statistic is "
    "(b-c)^2/(b+c) on exact integer counts against the literal "
    "chi-square(1) critical value (the ANOVA convention: no CDF is "
    "ever evaluated, and the rejection flag is cross-multiplied so "
    "even the division is display-only). One map-side-combined "
    "per-user reduce then a 2x2 fold to a single row.",
)
def stats_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    split = F.lit(MCNEMAR_SPLIT).cast("timestamp")
    is_p = F.col("event_type") == "purchase"
    u = e.groupBy("user_id").agg(
        F.when(
            F.sum(F.when(is_p & (F.col("ts") < split), 1).otherwise(0))
            >= MCNEMAR_HEAVY,
            1,
        )
        .otherwise(0)
        .alias("before_flag"),
        F.when(
            F.sum(F.when(is_p & (F.col("ts") >= split), 1).otherwise(0))
            >= MCNEMAR_HEAVY,
            1,
        )
        .otherwise(0)
        .alias("after_flag"),
    )
    bf, af = F.col("before_flag"), F.col("after_flag")
    s = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.when((bf == 1) & (af == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n_both"),
        F.sum(F.when((bf == 1) & (af == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_lost"),
        F.sum(F.when((bf == 0) & (af == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n_gained"),
        F.sum(F.when((bf == 0) & (af == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_neither"),
    )
    diff = (F.col("n_lost") - F.col("n_gained")).cast("double")
    disc = F.nullif(F.col("n_lost") + F.col("n_gained"), F.lit(0))
    return s.select(
        "n_users",
        "n_both",
        "n_lost",
        "n_gained",
        "n_neither",
        F.round(diff * diff / disc, 9).alias("mcnemar_chi2"),
        (diff * diff > F.lit(MCNEMAR_CHI2_CRIT) * disc).alias("reject_h0"),
    )


# --- Cochran-Armitage trend test (round 11 continuation) ----------------

# Chi-square(1) critical value at alpha = 0.05 as the exact rational
# 10322/2687: |10322/2687 - 3.84145882069...| < 5.6e-8, four times
# TIGHTER than the former 1e6 micro-unit literal (err 2e-7) while
# multiplying the rejection lhs by 2687 instead of 1_000_000 — 372x
# more DECIMAL(38)/HUGEINT headroom (round-11 ADVICE). Score
# centering would NOT have helped: both rejection operands
# t = N*A - X*B and varc = N*C - B^2 are algebraically invariant
# under any score shift w -> w - c, so the only lever is the
# critical-value denominator.
CA_CHI2_CRIT_NUM = 10_322
CA_CHI2_CRIT_DEN = 2_687


@register(
    "stats_cochran_armitage",
    oracle=f"""
    WITH g AS (
      SELECT CAST(isodow(ts) - 1 AS BIGINT) AS w,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT CAST(sum(n) AS HUGEINT) AS nn, CAST(sum(x) AS HUGEINT) AS xx,
             CAST(sum(w * x) AS HUGEINT) AS a,
             CAST(sum(w * n) AS HUGEINT) AS b,
             CAST(sum(w * w * n) AS HUGEINT) AS c,
             CAST(count(*) AS BIGINT) AS n_groups
      FROM g
    )
    SELECT CAST(nn AS BIGINT) AS n_events, CAST(xx AS BIGINT) AS n_success,
           n_groups,
           CAST(a AS BIGINT) AS sum_wx, CAST(b AS BIGINT) AS sum_wn,
           CAST(c AS BIGINT) AS sum_w2n,
           round(CAST((nn * a - xx * b) * (nn * a - xx * b) AS DOUBLE) * nn
                 / (CAST(xx AS DOUBLE) * (nn - xx) * (nn * c - b * b)), 9)
             AS ca_chi2,
           ((nn * a - xx * b) * (nn * a - xx * b) * nn * {CA_CHI2_CRIT_DEN}
            > {CA_CHI2_CRIT_NUM} * xx * (nn - xx) * (nn * c - b * b))
             AS reject_h0
    FROM s
    """,
    doc="Cochran-Armitage test for TREND in proportions across the "
    "ORDERED weekday groups (scores w = 0..6, Monday to Sunday): "
    "does the purchase share drift monotonically through the week? "
    "The right test where stats_chi_square's omnibus independence "
    "test wastes power — a trend alternative concentrates the "
    "statistic on one ordered degree of freedom (dose-response / "
    "funnel-depth analysis is the same shape). Statistic "
    "z^2 = (N*A - X*B)^2 * N / (X (N-X) (N*C - B^2)) from five "
    "exact integer sufficient sums (A = sum w x, B = sum w n, "
    "C = sum w^2 n) — ONE double division at the end, and the "
    "rejection flag is fully cross-multiplied against the exact "
    "rational chi-square(1) critical value 10322/2687 (HUGEINT "
    "oracle / 38-cap DECIMAL Spark, the Bollinger pattern), so no "
    "float ever decides. OPERAND BOUND (round-11 ADVICE): lhs = "
    "t^2*N*2687 with |t| <= 6*X*N stays under 1e38 to N ~ 4e6 "
    "adversarial and ~7e9 at the measured ~N^3 growth (2.5e23 at "
    "1e5 events after the 372x literal reduction); the binding "
    "term is now rhs = 10322*X(N-X)*(NC-B^2) <= 2.4e4*N^4, inside "
    "DECIMAL(38)/HUGEINT to N ~ 2.5e8 events — past that, run the "
    "test per month-partition. Centering the scores would not "
    "help: t and NC-B^2 are shift-invariant. One map-side-combined "
    "weekday aggregate then a 7-row fold.",
)
def stats_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.clickhouse import toDayOfWeek

    e = load(spark, "events", sf_dir)
    g = e.groupBy((toDayOfWeek("ts") - 1).cast("bigint").alias("w")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    s = g.agg(
        F.sum("n").cast("decimal(20,0)").alias("nn"),
        F.sum("x").cast("decimal(20,0)").alias("xx"),
        F.sum(F.col("w") * F.col("x")).cast("decimal(20,0)").alias("a"),
        F.sum(F.col("w") * F.col("n")).cast("decimal(20,0)").alias("b"),
        F.sum(F.col("w") * F.col("w") * F.col("n"))
        .cast("decimal(20,0)")
        .alias("c"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
    )
    t = F.col("nn") * F.col("a") - F.col("xx") * F.col("b")
    varc = F.col("nn") * F.col("c") - F.col("b") * F.col("b")
    chi2 = F.round(
        (t * t).cast("double")
        * F.col("nn").cast("double")
        / (
            F.col("xx").cast("double")
            * (F.col("nn") - F.col("xx")).cast("double")
            * varc.cast("double")
        ),
        9,
    )
    lhs = (t * t).cast("decimal(38,0)") * F.col("nn") * F.lit(CA_CHI2_CRIT_DEN)
    rhs = (
        F.lit(CA_CHI2_CRIT_NUM).cast("decimal(38,0)")
        * F.col("xx")
        * (F.col("nn") - F.col("xx"))
        * varc
    )
    return s.select(
        F.col("nn").cast("bigint").alias("n_events"),
        F.col("xx").cast("bigint").alias("n_success"),
        "n_groups",
        F.col("a").cast("bigint").alias("sum_wx"),
        F.col("b").cast("bigint").alias("sum_wn"),
        F.col("c").cast("bigint").alias("sum_w2n"),
        chi2.alias("ca_chi2"),
        (lhs > rhs).alias("reject_h0"),
    )


# --- SPRT sequential A/B monitor (round 12) -----------------------------

# Wald's sequential probability ratio test between H0: p = 0.10 and
# H1: p = 0.30 conversion at alpha = beta = 0.05 — wide hypotheses, the
# "did the big lift land" launch monitor. Per-event log-likelihood-
# ratio increments and the decision boundaries are quantized ONCE in
# Python to integer micro-nats (the Viterbi/NDCG discipline), so the
# whole walk is an exact BIGINT cumulative sum in both engines.
SPRT_P0, SPRT_P1 = 0.10, 0.30
SPRT_ALPHA = SPRT_BETA = 0.05
SPRT_S_MU = round(_math.log(SPRT_P1 / SPRT_P0) * _MU)  # success step
SPRT_F_MU = round(_math.log((1 - SPRT_P1) / (1 - SPRT_P0)) * _MU)
SPRT_A_MU = round(_math.log((1 - SPRT_BETA) / SPRT_ALPHA) * _MU)  # accept H1
SPRT_B_MU = round(_math.log(SPRT_BETA / (1 - SPRT_ALPHA)) * _MU)  # accept H0


@register(
    "stats_sprt_ab_monitor",
    oracle=f"""
    WITH e AS (
      SELECT CAST(('0x' || substr(md5('sprt:' || CAST(user_id AS VARCHAR)),
                   1, 8)) AS BIGINT) % 2 AS arm,
             ts, event_id,
             CASE WHEN event_type = 'purchase'
                  THEN CAST({SPRT_S_MU} AS BIGINT)
                  ELSE CAST({SPRT_F_MU} AS BIGINT) END AS inc,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS succ
      FROM events
    ),
    w AS (
      SELECT arm, succ, inc,
             row_number() OVER (PARTITION BY arm ORDER BY ts, event_id)
               AS step,
             CAST(sum(inc) OVER (PARTITION BY arm ORDER BY ts, event_id)
                  AS BIGINT) AS walk
      FROM e
    )
    SELECT arm,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(succ) AS BIGINT) AS n_success,
           CAST(max(walk) FILTER (step = (SELECT max(w2.step) FROM w w2
                                          WHERE w2.arm = w.arm))
                AS BIGINT) AS llr_final_mu,
           CAST(min(walk) AS BIGINT) AS walk_min_mu,
           CAST(max(walk) AS BIGINT) AS walk_max_mu,
           CAST(min(CASE WHEN walk >= {SPRT_A_MU} OR walk <= {SPRT_B_MU}
                         THEN step END) AS BIGINT) AS decision_step,
           CASE (min(CASE WHEN walk >= {SPRT_A_MU} OR walk <= {SPRT_B_MU}
                          THEN struct_pack(a := step, b := walk) END)).b
                  >= {SPRT_A_MU}
                WHEN TRUE THEN 'accept_h1'
                WHEN FALSE THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM w GROUP BY arm
    """,
    doc="Wald SPRT sequential A/B monitor — the always-valid "
    "alternative to events_ab_test_lift's fixed-horizon z-test: "
    "peek after EVERY event without inflating alpha, stop the "
    "moment the evidence crosses a boundary. Users hash-split into "
    "two arms (the md5 determinism pattern); each arm's event "
    "stream becomes an exact integer micro-nat log-likelihood walk "
    "(success/failure increments and both Wald boundaries "
    "ln((1-b)/a), ln(b/(1-a)) quantized once in Python and "
    "injected into both engines), and the emitted verdict is the "
    "FIRST boundary crossing, found by a deterministic "
    "struct-ordered min over flagged steps — no float ever "
    "decides. Shape: one arm-partitioned ordered window (cumsum + "
    "row_number) then a map-side-combined rollup; at 100 TB the "
    "sort is per-arm time order, exactly the order the events "
    "already arrive in from ingest, so the production form rides "
    "the existing time layout (B4/B5 sort keys) instead of "
    "reshuffling.",
)
def stats_sprt_ab_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("sprt:"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    inc = F.when(F.col("event_type") == "purchase", F.lit(SPRT_S_MU)).otherwise(
        F.lit(SPRT_F_MU)
    ).cast("long")
    succ = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    base = e.select(
        arm.alias("arm"), F.col("ts"), F.col("event_id"), inc.alias("inc"), succ.alias("succ")
    )
    w = Window.partitionBy("arm").orderBy("ts", "event_id")
    walked = base.select(
        "arm",
        "succ",
        F.row_number().over(w).alias("step"),
        F.sum("inc").over(w).cast("bigint").alias("walk"),
    )
    crossed = F.when(
        (F.col("walk") >= SPRT_A_MU) | (F.col("walk") <= SPRT_B_MU),
        F.struct(F.col("step").alias("a"), F.col("walk").alias("b")),
    )
    agg = walked.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("succ").cast("bigint").alias("n_success"),
        F.max(F.struct(F.col("step").alias("a"), F.col("walk").alias("b")))
        .getField("b")
        .alias("llr_final_mu"),
        F.min("walk").cast("bigint").alias("walk_min_mu"),
        F.max("walk").cast("bigint").alias("walk_max_mu"),
        F.min(crossed).alias("cross"),
    )
    cw = F.col("cross").getField("b")
    return agg.select(
        "arm",
        "n_events",
        "n_success",
        "llr_final_mu",
        "walk_min_mu",
        "walk_max_mu",
        F.col("cross").getField("a").cast("bigint").alias("decision_step"),
        F.when(cw >= SPRT_A_MU, F.lit("accept_h1"))
        .when(cw <= SPRT_B_MU, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    )


# --- Beta-binomial smoothed ranking (round 12, wave-5 queue) -------------

# Empirical-Bayes shrinkage: prior Beta(a, b) with a + b = BB_K
# pseudo-counts centered on the GLOBAL conversion rate (a = K*X/T), so
# a 2-of-2 user does not outrank a 190-of-1000 one. The smoothed score
# (x + a)/(n + K) = (x*T + K*X) / ((n + K) * T); T > 0 is common to
# every row, so ordering needs only num = x*T + K*X and den = n + K.
BB_K = 20
BB_TOP = 25


@register(
    "stats_beta_binomial_ranking",
    oracle=f"""
    WITH u AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT CAST(sum(n) AS BIGINT) AS tt, CAST(sum(x) AS BIGINT) AS xx
      FROM u
    ),
    s AS (
      SELECT user_id, n, x,
             round(CAST(x AS DOUBLE) / n, 9) AS raw_rate,
             round(CAST(x * tt + {BB_K} * xx AS DOUBLE)
                   / (CAST(n + {BB_K} AS DOUBLE) * tt), 9) AS smoothed,
             x * tt + {BB_K} * xx AS num, n + {BB_K} AS den
      FROM u CROSS JOIN g
    )
    SELECT user_id, n, x, raw_rate, smoothed, CAST(rn AS BIGINT) AS rank
    FROM (
      -- EXACT rational ordering: s_i > s_j <=> num_i*den_j > num_j*den_i;
      -- equivalent single-key form: order by the rational num/den via
      -- the integer pair (num*1e6) // den (floor of positives), ties
      -- broken by the exact cross-multiplication via num, then user_id
      SELECT *, row_number() OVER (
        ORDER BY (num * 1000000) // den DESC, num DESC, user_id) AS rn
      FROM s)
    WHERE rn <= {BB_TOP}
    """,
    doc="Empirical-Bayes beta-binomial ranking of users by smoothed "
    "conversion rate — the shrinkage ranking every marketplace/ads "
    "warehouse uses where raw rates would crown tiny-n flukes "
    "(same law as Laplace-smoothed CTR; the prior is "
    f"{BB_K} pseudo-events at the global rate). Ordering is EXACT: "
    "the score (x*T + K*X)/((n+K)*T) shares the positive factor T "
    "across rows, so rank orders the integer rational num/den by "
    "the key floor((num*1e6)/den) with num then user_id as "
    "tie-breaks — a DEFINED deterministic policy both engines "
    "compute in exact integer arithmetic, within 1e-6 of the pure "
    "rational order; the two DISPLAYED rates are single IEEE "
    "divisions rounded to 9dp. OPERAND BOUND: num = x*T + K*X <= "
    "(max_x + K) * T; the *1e6 rank key needs num*1e6 < 2^63, i.e. "
    "T * max_x < 9e12 — partition the ranking by month past that "
    "(the Bollinger/CA documentation pattern). Shape: one user "
    "reduce, one 1-row global broadcast, one top-K window — "
    "scan-bound at 100 TB.",
)
def stats_beta_binomial_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    g = u.agg(
        F.sum("n").cast("bigint").alias("tt"), F.sum("x").cast("bigint").alias("xx")
    )
    s = u.crossJoin(F.broadcast(g)).select(
        "user_id",
        "n",
        "x",
        F.round(F.col("x").cast("double") / F.col("n"), 9).alias("raw_rate"),
        F.round(
            (F.col("x") * F.col("tt") + F.lit(BB_K) * F.col("xx")).cast("double")
            / ((F.col("n") + F.lit(BB_K)).cast("double") * F.col("tt")),
            9,
        ).alias("smoothed"),
        (F.col("x") * F.col("tt") + F.lit(BB_K) * F.col("xx")).alias("num"),
        (F.col("n") + F.lit(BB_K)).alias("den"),
    )
    w = Window.orderBy(
        F.expr("(num * 1000000) div den").desc(), F.col("num").desc(), "user_id"
    )
    return (
        s.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= BB_TOP)
        .select("user_id", "n", "x", "raw_rate", "smoothed", "rank")
    )


# --- Wilcoxon signed-rank test (round 13) ---------------------------------

# Two-sided 95% critical value z^2 = 1.959964^2, quantized ONCE in
# Python to integer micro-units (cookbook rule): significant iff
# z^2 = 3*D^2/VAR12 > 3.841459, cross-multiplied below so no engine
# ever divides.
WSR_SPLIT_DAYS = 15
WSR_Z2_MICRO = 3_841_459
# Exact-verdict operand bound: D <= n(n+1) so 3*D^2*1e6 <= 3e6*n^4,
# which fits decimal(38,0) to n ~ 2e7 paired users per cell. Past it
# Spark's 38-cap decimal would silently NULL `significant` while the
# DuckDB oracle's HUGEINT keeps answering — so the Spark side FAILS
# LOUDLY instead (round-14 ADVICE; the t-closeness m<2 discipline).
WSR_N_MAX = 20_000_000


def _wsr_guard(n: Column) -> Column:
    """n_pairs, or a loud per-row error past the documented exact
    bound — never a silent engine divergence."""
    return (
        F.when(n <= F.lit(WSR_N_MAX), n)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("stats_wilcoxon_signed_rank: n_pairs="),
                    n.cast("string"),
                    F.lit(
                        f" exceeds the exact decimal(38,0) verdict bound"
                        f" {WSR_N_MAX}; 3*D^2*1e6 would overflow and"
                        " silently NULL `significant`"
                    ),
                )
            )
        )
        .cast("bigint")
    )


@register(
    "stats_wilcoxon_signed_rank",
    oracle=f"""
    WITH d AS (
      SELECT user_id, event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    anchor AS (SELECT min(day) AS d0 FROM d),
    h AS (
      SELECT user_id, event_type,
             CASE WHEN datediff('day', d0, day) < {WSR_SPLIT_DAYS}
                  THEN 1 ELSE 2 END AS half,
             CAST(sum(c) AS BIGINT) AS sc
      FROM d CROSS JOIN anchor GROUP BY 1, 2, 3
    ),
    p AS (
      SELECT user_id, event_type,
             max(CASE WHEN half = 2 THEN sc END)
               - max(CASE WHEN half = 1 THEN sc END) AS diff
      FROM h GROUP BY 1, 2 HAVING count(*) = 2
    ),
    nz AS (
      SELECT event_type, user_id, abs(diff) AS absd,
             (diff > 0) AS pos
      FROM p WHERE diff <> 0
    ),
    grp AS (
      SELECT event_type, absd, CAST(count(*) AS BIGINT) AS t,
             CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS t_pos
      FROM nz GROUP BY 1, 2
    ),
    rk AS (
      SELECT event_type, absd, t, t_pos,
             CAST(coalesce(sum(t) OVER (PARTITION BY event_type
                  ORDER BY absd ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) AS BIGINT) AS less
      FROM grp
    ),
    agg AS (
      SELECT event_type,
             CAST(sum(t) AS BIGINT) AS n_pairs,
             -- 2x-scaled average rank: r2 = 2*less + t + 1 (exact for
             -- ties; sums stay integers)
             CAST(sum(t_pos * (2 * less + t + 1)) AS BIGINT) AS w2_plus,
             CAST(sum((t - t_pos) * (2 * less + t + 1)) AS BIGINT)
               AS w2_minus,
             CAST(sum(t * t * t - t) AS BIGINT) AS tie_cubes
      FROM rk GROUP BY event_type
    )
    SELECT event_type, n_pairs, w2_plus, w2_minus,
           CAST(2 * w2_plus - n_pairs * (n_pairs + 1) AS BIGINT) AS d_stat,
           CAST(2 * n_pairs * (n_pairs + 1) * (2 * n_pairs + 1) - tie_cubes
                AS BIGINT) AS var12,
           round(CAST(2 * w2_plus - n_pairs * (n_pairs + 1) AS DOUBLE)
                 * sqrt(3.0 / (2 * n_pairs * (n_pairs + 1) * (2 * n_pairs + 1)
                               - tie_cubes)), 6) AS z_approx,
           -- HUGEINT oracle / 38-cap DECIMAL Spark: the t-closeness
           -- wide-verdict pattern (DuckDB decimal products ERROR past
           -- 38 digits; hugeint is 128-bit exact)
           (CAST(3 AS HUGEINT) * (2 * w2_plus - n_pairs * (n_pairs + 1))
              * (2 * w2_plus - n_pairs * (n_pairs + 1)) * 1000000
            > CAST({WSR_Z2_MICRO} AS HUGEINT)
              * (2 * n_pairs * (n_pairs + 1) * (2 * n_pairs + 1) - tie_cubes))
             AS significant
    FROM agg
    """,
    doc="Wilcoxon signed-rank test per event type: did per-user spend "
    f"SHIFT between the first {WSR_SPLIT_DAYS} days and the rest — "
    "the PAIRED nonparametric two-sample test the battery was "
    "missing (Mann-Whitney is its unpaired sibling, Friedman its "
    ">2-treatment extension; pairing on user removes between-user "
    "variance exactly like events_cuped_adjustment does "
    "parametrically). Exact end to end: signed ranks of |diff| use "
    "the 2x-SCALED average rank r2 = 2*below + t + 1 (integral even "
    "under ties — the Kruskal-Wallis/Mann-Whitney discipline), the "
    "normal-approximation variance carries the exact tie correction "
    "as VAR12 = 2n(n+1)(2n+1) - sum(t^3 - t) (x12 so it stays "
    "integral), and the 95% verdict cross-multiplies "
    "3*D^2*1e6 > z2crit_micro*VAR12 in DECIMAL(38,0) — no engine "
    "ever divides; z_approx is presentation-only (one sqrt). "
    "OPERAND BOUND: D <= n(n+1), so the lhs <= 3e6*n^4 stays inside "
    "38 digits to n ~ 2e7 paired users per cell — and the Spark side "
    "raise_error()s LOUDLY past WSR_N_MAX instead of letting the "
    "38-cap decimal silently NULL `significant` while the oracle's "
    "HUGEINT keeps answering (round-14 ADVICE). Shape: one (user, "
    "type, half) reduce touches the facts, then user-dimension "
    "pairing, one |diff|-ordered window per type over the DISTINCT "
    "magnitude table, one rollup — scan-bound at 100 TB.",
)
def stats_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    d = e.select(
        "user_id",
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    d0 = d.agg(F.min("day").alias("d0"))
    h = (
        d.crossJoin(F.broadcast(d0))  # 1-row anchor: sanctioned scalar
        .groupBy(
            "user_id",
            "event_type",
            F.when(F.datediff("day", "d0") < WSR_SPLIT_DAYS, 1)
            .otherwise(2)
            .alias("half"),
        )
        .agg(F.sum("c").cast("bigint").alias("sc"))
    )
    p = (
        h.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("nh"),
            (
                F.max(F.when(F.col("half") == 2, F.col("sc")))
                - F.max(F.when(F.col("half") == 1, F.col("sc")))
            ).alias("diff"),
        )
        .filter((F.col("nh") == 2) & (F.col("diff") != 0))
    )
    grp = p.groupBy(
        "event_type", F.abs(F.col("diff")).alias("absd")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("t"),
        F.sum((F.col("diff") > 0).cast("bigint")).cast("bigint").alias("t_pos"),
    )
    w = Window.partitionBy("event_type").orderBy("absd").rowsBetween(
        Window.unboundedPreceding, -1
    )
    rk = grp.select(
        "event_type",
        "t",
        "t_pos",
        F.coalesce(F.sum("t").over(w), F.lit(0)).cast("bigint").alias("less"),
    )
    r2 = 2 * F.col("less") + F.col("t") + 1
    agg = rk.groupBy("event_type").agg(
        F.sum("t").cast("bigint").alias("n_pairs"),
        F.sum(F.col("t_pos") * r2).cast("bigint").alias("w2_plus"),
        F.sum((F.col("t") - F.col("t_pos")) * r2).cast("bigint").alias("w2_minus"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie_cubes"),
    )
    n = F.col("n_pairs")
    # the guard threads through EVERY column the decimal overflow
    # could silently NULL, not just n_pairs: d_stat/var12 (and so
    # z_approx and the `significant` verdict) are built from the
    # guarded n, so a consumer that projects only `significant` still
    # evaluates the loud raise_error — Catalyst column pruning could
    # otherwise eliminate the guard with the n_pairs column it rode
    # on (round-14 ADVICE). Values are unchanged below the bound:
    # _wsr_guard(n) IS n there.
    gn = _wsr_guard(n)
    d_stat = 2 * F.col("w2_plus") - gn * (gn + 1)
    var12 = 2 * gn * (gn + 1) * (2 * gn + 1) - F.col("tie_cubes")
    return agg.select(
        "event_type",
        gn.alias("n_pairs"),
        "w2_plus",
        "w2_minus",
        d_stat.cast("bigint").alias("d_stat"),
        var12.cast("bigint").alias("var12"),
        F.round(
            d_stat.cast("double") * F.sqrt(F.lit(3.0) / var12.cast("double")), 6
        ).alias("z_approx"),
        (
            F.lit(3).cast("decimal(38,0)") * d_stat * d_stat * 1_000_000
            > F.lit(WSR_Z2_MICRO).cast("decimal(38,0)") * var12
        ).alias("significant"),
    )


# --- Mann-Kendall trend test (round 14) ------------------------------------

# Two-sided 95% critical value z^2 in integer micro-units — the
# WSR_Z2_MICRO constant quantized once in Python (cookbook rule);
# shared magnitude, separate name so the tests can diverge later.
MK_Z2_MICRO = 3_841_459


@register(
    "stats_mann_kendall",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT a.event_type,
             CAST(coalesce(sum(CASE WHEN b.x > a.x THEN 1
                                    WHEN b.x < a.x THEN -1
                                    ELSE 0 END), 0) AS BIGINT) AS s_stat
      FROM d a JOIN d b
        ON a.event_type = b.event_type AND a.day < b.day
      GROUP BY 1
    ),
    n AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM d GROUP BY 1
    ),
    ties AS (
      SELECT event_type,
             CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM (SELECT event_type, x, CAST(count(*) AS BIGINT) AS t
            FROM d GROUP BY 1, 2) g
      GROUP BY 1
    )
    SELECT n.event_type, n.n_days, coalesce(s.s_stat, 0) AS s_stat,
           CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - ties.tie_term
                AS BIGINT) AS var18,
           CASE WHEN n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                     = ties.tie_term THEN 0.0
                ELSE round((coalesce(s.s_stat, 0)
                            - CASE WHEN coalesce(s.s_stat, 0) > 0 THEN 1
                                   WHEN coalesce(s.s_stat, 0) < 0 THEN -1
                                   ELSE 0 END)
                           * sqrt(18.0 / (n.n_days * (n.n_days - 1)
                                          * (2 * n.n_days + 5) - ties.tie_term)),
                           6)
           END AS z_approx,
           (coalesce(s.s_stat, 0) != 0
            AND CAST(18 AS HUGEINT)
                * (abs(coalesce(s.s_stat, 0)) - 1)
                * (abs(coalesce(s.s_stat, 0)) - 1) * 1000000
              > CAST({MK_Z2_MICRO} AS HUGEINT)
                * (n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                   - ties.tie_term)) AS significant,
           CASE WHEN NOT (coalesce(s.s_stat, 0) != 0
                     AND CAST(18 AS HUGEINT)
                         * (abs(coalesce(s.s_stat, 0)) - 1)
                         * (abs(coalesce(s.s_stat, 0)) - 1) * 1000000
                       > CAST({MK_Z2_MICRO} AS HUGEINT)
                         * (n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                            - ties.tie_term)) THEN 'no_trend'
                WHEN coalesce(s.s_stat, 0) > 0 THEN 'increasing'
                ELSE 'decreasing' END AS trend
    FROM n
    JOIN ties ON ties.event_type = n.event_type
    LEFT JOIN s ON s.event_type = n.event_type
    """,
    doc="Mann-Kendall monotonic-trend test per event stream — the "
    "UNPAIRED rank-based trend detector beside "
    "stats_wilcoxon_signed_rank's paired shift test (Kendall's S over "
    "the daily series: is per-day spend drifting up or down, "
    "distribution-free). Exact end to end: S = sum over day pairs "
    "i<j of sign(x_j - x_i) (pure integers), the normal-approximation "
    "variance carries the exact tie correction x18 so it stays "
    "integral — VAR18 = n(n-1)(2n+5) - sum_t t(t-1)(2t+5) — and the "
    "95% verdict cross-multiplies the continuity-corrected statistic "
    "18*(|S|-1)^2*1e6 > z2crit_micro*VAR18 in HUGEINT/decimal(38,0): "
    "no engine ever divides; z_approx is presentation-only (one sqrt, "
    "guarded to 0.0 when VAR18=0 — an all-tied series has no trend "
    "to test and 0*inf would poison the display column). trend is "
    "the standard three-way verdict (increasing/decreasing/"
    "no_trend). Shape: ONE (type, day) reduce touches the facts; the "
    "pair stage is a deliberate CALENDAR-BOUNDED day-dimension "
    "self-join per type (the time_matrix_profile sanction argument: "
    "~30 days -> ~435 pairs per type at ANY scale factor — constant "
    "work regardless of fact volume), then two type-keyed reduces. "
    "OPERAND BOUND: |S| <= n(n-1)/2 so the lhs <= 4.5e6*n^4 — inside "
    "38 digits to n ~ 2e7 days, i.e. unreachable for calendar data. "
    "Scan-bound at 100 TB.",
)
def stats_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    d = (
        e.groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("x")
        )
    )
    a = d.select("event_type", F.col("day").alias("di"), F.col("x").alias("xi"))
    b = d.select("event_type", F.col("day").alias("dj"), F.col("x").alias("xj"))
    s = (
        a.join(b, "event_type")
        .filter(F.col("di") < F.col("dj"))
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("xj") > F.col("xi"), 1)
                    .when(F.col("xj") < F.col("xi"), -1)
                    .otherwise(0)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    n = d.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    ties = (
        d.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("bigint")
            .alias("tie_term")
        )
    )
    j = n.join(ties, "event_type").join(s, "event_type", "left")
    ss = F.coalesce(F.col("s_stat"), F.lit(0).cast("bigint"))
    nn = F.col("n_days")
    var18 = nn * (nn - 1) * (2 * nn + 5) - F.col("tie_term")
    sgn = F.when(ss > 0, 1).when(ss < 0, -1).otherwise(0)
    sig = (ss != 0) & (
        F.lit(18).cast("decimal(38,0)")
        * (F.abs(ss) - 1)
        * (F.abs(ss) - 1)
        * 1_000_000
        > F.lit(MK_Z2_MICRO).cast("decimal(38,0)") * var18
    )
    return j.select(
        "event_type",
        "n_days",
        ss.alias("s_stat"),
        var18.cast("bigint").alias("var18"),
        F.when(var18 == 0, F.lit(0.0))
        .otherwise(
            F.round(
                (ss - sgn).cast("double")
                * F.sqrt(F.lit(18.0) / var18.cast("double")),
                6,
            )
        )
        .alias("z_approx"),
        sig.alias("significant"),
        F.when(~sig, "no_trend")
        .when(ss > 0, "increasing")
        .otherwise("decreasing")
        .alias("trend"),
    )
