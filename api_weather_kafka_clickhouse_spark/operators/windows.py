"""Window-function operators: ranking, analytic (lag/lead), running
and range frames, distribution functions, sessionization.

The reference never issues a window function but its ClickHouse sort
key `ORDER BY (event_date, city_name, event_time)`
(app/clickhouse_ddl.sql:32) exists precisely to serve these patterns
downstream (SURVEY.md §2-C); here they are first-class.

Scale: a window partitioned by a key is one shuffle on that key; all
frames below are bounded or running (no whole-partition re-scans per
row). Every ORDER BY carries a unique tiebreak column so results are
total-ordered and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


@register(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_d,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    doc="Top-3 orders per customer — the canonical top-k-per-group via "
    "row_number, no global sort.",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price_d"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
                OVER (PARTITION BY l_suppkey
                      ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_qty
    FROM lineitem
    """,
    doc="Running decimal sum per supplier over ship order (the B5 "
    "sort-key pattern). Total tiebreak (shipdate, orderkey, linenumber) "
    "makes the prefix sums engine-independent.",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(12,2)"))
        .over(w)
        .cast("double")
        .alias("running_qty"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           lag(event_id)  OVER w AS prev_id,
           lead(event_id) OVER w AS next_id,
           epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lag/lead with microsecond-exact gaps (unix_micros == epoch_us, "
    "integer arithmetic — no float time math).",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.lag("event_id").over(w).alias("prev_id"),
        F.lead("event_id").over(w).alias("next_id"),
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )


@register(
    "window_rank_dense",
    oracle="""
    SELECT p_brand, p_partkey,
           rank()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
           dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense,
           ntile(4)     OVER (PARTITION BY p_brand
                              ORDER BY p_retailprice DESC, p_partkey) AS quartile
    FROM part
    """,
    doc="rank/dense_rank (tie-stable by definition) + ntile with a "
    "unique tiebreak.",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, "part", sf_dir)
    w_val = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    w_tot = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return p.select(
        "p_brand",
        "p_partkey",
        F.rank().over(w_val).alias("price_rank"),
        F.dense_rank().over(w_val).alias("price_dense"),
        F.ntile(4).over(w_tot).alias("quartile"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(sum(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS value_10m
    FROM events
    """,
    doc="Time-range frame: per-user rolling 10-minute decimal sum — the "
    "batch twin of the streaming sliding window (streaming/windows.py).",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    e.createOrReplaceTempView("_wrf_events")
    # RANGE with interval bounds is SQL-only in PySpark (rangeBetween
    # takes long offsets); identical plan either way.
    return spark.sql(
        """
        SELECT user_id, event_id,
               CAST(sum(CAST(value AS DECIMAL(18,2)))
                    OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS value_10m
        FROM _wrf_events
        """
    )


@register(
    "window_range_numeric",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                      RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS nearby_sum
    FROM orders
    """,
    doc="Numeric RANGE frame (value-based, not row-based): per "
    "customer, the sum of orders within 10000 of the current price. "
    "RANGE frames include all ties of the current value, so the frame "
    "is well-defined without a tiebreak — deterministic by "
    "construction.",
)
def window_range_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    o.createOrReplaceTempView("_wrn_orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS nearby_sum
        FROM _wrn_orders
        """
    )


@register(
    "window_distribution",
    oracle="""
    SELECT c_custkey,
           percent_rank() OVER (ORDER BY c_acctbal) AS bal_pct_rank,
           cume_dist()    OVER (ORDER BY c_acctbal) AS bal_cume
    FROM customer
    WHERE c_acctbal IS NOT NULL
    """,
    doc="Distribution functions (value-based, tie-stable), scale-safe: "
    "instead of an unpartitioned window over every row (single-task "
    "global sort at 100 TB), aggregate to per-value counts first — "
    "c_acctbal has 2 decimals over a bounded range, so the distinct-"
    "value table is bounded (~1M rows) regardless of fact size — run "
    "the ordered prefix sum over that small table, and broadcast-join "
    "the per-value ranks back. percent_rank = (#strictly-less)/(n-1); "
    "cume_dist = (#less-or-equal)/n — identical to the built-ins "
    "including tie semantics. NULL balances are excluded on both "
    "sides: engines disagree on NULL ordering (Spark NULLS FIRST asc, "
    "DuckDB NULLS LAST), so a distribution over them is not portable — "
    "and the join-back would need null-safe equality anyway.",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir).filter(F.col("c_acctbal").isNotNull())
    per_val = c.groupBy("c_acctbal").agg(F.count(F.lit(1)).alias("cnt"))
    # ordered prefix sum over the bounded distinct-value table only
    w = Window.orderBy("c_acctbal").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = per_val.agg(F.sum("cnt").alias("n_total"))
    stats = (
        per_val.withColumn("cum", F.sum("cnt").over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "c_acctbal",
            F.when(
                F.col("n_total") > 1,
                (F.col("cum") - F.col("cnt")) / (F.col("n_total") - 1),
            )
            .otherwise(F.lit(0.0))
            .alias("bal_pct_rank"),
            (F.col("cum") / F.col("n_total")).alias("bal_cume"),
        )
    )
    return c.join(F.broadcast(stats), "c_acctbal").select(
        "c_custkey", "bal_pct_rank", "bal_cume"
    )


@register(
    "sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                                ORDER BY ts, event_id))
                          > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sessions AS (
      SELECT user_id, ts, event_id, value,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_seq
      FROM gaps
    )
    SELECT user_id, session_seq,
           count(*) AS n_events,
           min(ts)  AS session_start,
           max(ts)  AS session_end,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
    FROM sessions
    GROUP BY user_id, session_seq
    """,
    doc="Sessionization (30-min inactivity gap): lag + running-sum "
    "session ids then per-session aggregates — one shuffle on user_id; "
    "the streaming twin uses session_window (streaming/windows.py).",
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    gaps = e.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0).alias("is_new"),
    )
    sessions = gaps.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
    )


MOVZ_FRAME = 10  # compare each value to its 10 preceding samples
MOVZ_MIN_N = 5  # require a populated history before judging
MOVZ_SQ_THRESHOLD = 6.25  # |z| > 2.5


@register(
    "window_moving_zscore",
    oracle=f"""
    WITH w AS (
      SELECT event_id, user_id, value,
             count(*) OVER f AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) OVER f AS DOUBLE) AS s1,
             CAST(sum(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2))) OVER f AS DOUBLE) AS s2
      FROM events
      WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {MOVZ_FRAME} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, value,
           round((value - s1 / n) * (value - s1 / n)
                 / ((s2 - s1 * s1 / n) / (n - 1)), 6) AS z2
    FROM w
    WHERE n >= {MOVZ_MIN_N}
      AND (s2 - s1 * s1 / n) / (n - 1) > 0
      AND (value - s1 / n) * (value - s1 / n)
          / ((s2 - s1 * s1 / n) / (n - 1)) > {MOVZ_SQ_THRESHOLD}
    """,
    doc="Rolling-window anomaly detection: each event judged against "
    f"its own {MOVZ_FRAME} PRECEDING samples (excluding itself) per "
    "user — the streaming-shaped twin of events_anomaly_zscore's "
    "global stats. Framed moment sums over exact decimals keep the "
    "windowed mean/variance combine-order independent; the |z| > 2.5 "
    "test uses z-squared so no sqrt enters the checked expression; "
    "frames order by (ts, event_id) for a total order. One shuffle "
    "on the key, one window pass — per-key linear at any scale, and "
    "the frame bound caps per-row state exactly like a streaming "
    "implementation would.",
)
def window_moving_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    v = F.col("value").cast("decimal(18,2)")
    f = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-MOVZ_FRAME, -1)
    )
    w = e.select(
        "event_id",
        "user_id",
        "value",
        F.count(F.lit(1)).over(f).alias("n"),
        F.sum(v).over(f).cast("double").alias("s1"),
        F.sum(v * v).over(f).cast("double").alias("s2"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    dev = F.col("value") - F.col("s1") / F.col("n")
    z2 = dev * dev / var
    return (
        w.filter((F.col("n") >= MOVZ_MIN_N) & (var > 0) & (z2 > MOVZ_SQ_THRESHOLD))
        .select("event_id", "user_id", "value", F.round(z2, 6).alias("z2"))
    )


# Centered moving-median half-width (rows each side).
MOVMED_HALF = 12


@register(
    "window_moving_median",
    oracle=f"""
    SELECT event_id, event_type, value,
           round(quantile_cont(value, 0.5) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN {MOVMED_HALF} PRECEDING AND {MOVMED_HALF} FOLLOWING
           ), 6) AS moving_med
    FROM events
    """,
    doc="Centered moving MEDIAN per event stream (25-row window): the "
    "robust-smoothing twin of window_moving_zscore — a mean-based "
    "smoother drags toward every outlier, the rolling median ignores "
    "them, which is why monitoring pipelines median-filter before "
    "thresholding. Exact percentile semantics inside a ROWS frame "
    "(Spark percentile().over == DuckDB quantile_cont OVER): both "
    "engines interpolate the same two order statistics of the same "
    "25 rows, so the result hash-checks. Ordering inside the frame "
    "is the (ts, event_id) total order. One shuffle on event_type; "
    "frame state is 25 rows regardless of corpus size — at 100 TB "
    "repartition by (event_type, coarse time bucket) to bound "
    "per-partition sort memory, the window_range_numeric note.",
)
def window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-MOVMED_HALF, MOVMED_HALF)
    )
    return e.select(
        "event_id",
        "event_type",
        "value",
        F.round(F.percentile("value", F.lit(0.5)).over(w), 6).alias("moving_med"),
    )
