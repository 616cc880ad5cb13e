"""Second coverage battery: exact percentiles/median, value window
functions, unpivot, batch event-time bucketing, round-robin partition
assignment, LIMIT/OFFSET pagination, scalar string/date battery 2.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


@register(
    "agg_median_percentile",
    oracle="""
    SELECT l_returnflag,
           median(l_quantity)                    AS qty_median,
           percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS qty_p25,
           percentile_cont(0.90) WITHIN GROUP (ORDER BY l_quantity) AS qty_p90,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact median / continuous percentiles (value-based: "
    "interpolation over sorted 2-decimal doubles is deterministic). "
    "At 100 TB prefer approx_percentile — see agg_approx_percentile.",
)
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("qty_median"),
        F.percentile("l_quantity", F.lit(0.25)).alias("qty_p25"),
        F.percentile("l_quantity", F.lit(0.90)).alias("qty_p90"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           round(percentile_cont(0.45) WITHIN GROUP (ORDER BY l_extendedprice), 6)
             AS price_p45_exact,
           round(percentile_cont(0.55) WITHIN GROUP (ORDER BY l_extendedprice), 6)
             AS price_p55_exact,
           CAST(count(*) AS BIGINT) AS n,
           TRUE AS p50_within_rank_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="approx_percentile (KLL-style sketch): the 100 TB quantile "
    "path — bounded-memory mergeable sketches instead of a sort. "
    "Upgraded rows-only → hash-checked via the bounds-oracle pattern: "
    "the sketch's answer is engine-specific, but its GUARANTEE (rank "
    "error <= n/accuracy = 0.1% at accuracy=1000) is checkable — the "
    "approximate median must lie between the exact 45th and 55th "
    "percentile values, a 50-sigma-wide corridor any correct sketch "
    "satisfies and a broken one misses. The exact corridor bounds "
    "are the oracle harness columns; production stores only the "
    "sketch.",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    approx = F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(1000))
    p45 = F.percentile("l_extendedprice", F.lit(0.45))
    p55 = F.percentile("l_extendedprice", F.lit(0.55))
    return li.groupBy("l_returnflag").agg(
        F.round(p45, 6).alias("price_p45_exact"),
        F.round(p55, 6).alias("price_p55_exact"),
        F.count(F.lit(1)).alias("n"),
        ((approx >= p45) & (approx <= p55)).alias("p50_within_rank_5pct"),
    )


@register(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND UNBOUNDED FOLLOWING) AS last_key,
           nth_value(o_orderkey, 2) OVER w AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="first/last/nth value frames (total order via the orderkey "
    "tiebreak; last_value needs the full-partition frame).",
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w_full).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


@register(
    "unpivot_measures",
    oracle="""
    SELECT o_orderkey, measure, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value_d
    FROM (
      SELECT o_orderkey,
             unnest(['totalprice', 'custkey_as_measure']) AS measure,
             unnest([o_totalprice, CAST(o_custkey AS DOUBLE)]) AS value
      FROM orders
    )
    """,
    doc="Unpivot (wide→long): stack() in Spark, parallel unnest in "
    "DuckDB — row expansion stays JVM-side.",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.expr(
            "stack(2, 'totalprice', o_totalprice, "
            "'custkey_as_measure', CAST(o_custkey AS DOUBLE)) AS (measure, value)"
        ),
    ).select(
        "o_orderkey", "measure", F.col("value").cast("decimal(18,2)").cast("double").alias("value_d")
    )


@register(
    "time_bucket_hourly",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
    doc="Batch twin of the streaming tumbling window (hourly buckets "
    "via date_trunc) — the hypertable-rollup pattern.",
)
def time_bucket_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
    )


@register(
    "funnel_stages",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'view' AND e.ts > s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT s1.user_id,
           CASE WHEN s3.user_id IS NOT NULL THEN 3
                WHEN s2.user_id IS NOT NULL THEN 2
                ELSE 1 END AS stage
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
    doc="Ordered funnel (signup -> view after signup -> purchase "
    "after that view): ONE scan of the three event types and ONE "
    "shuffle on user_id — the per-user stage logic runs on collected "
    "per-type timestamp arrays (bounded by events-per-user, the same "
    "state bound as sessionization), where array_min over a filtered "
    "array picks each stage's earliest qualifying instant. The "
    "equivalent stage-per-aggregate formulation costs three scans "
    "and three shuffles plus two joins; at 100 TB this shape moves "
    "each event exactly once.",
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir).filter(
        F.col("event_type").isin("signup", "view", "purchase")
    )
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t1"),
            F.collect_list(F.when(F.col("event_type") == "view", F.col("ts"))).alias("_views"),
            F.collect_list(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
                "_purchases"
            ),
        )
        .filter(F.col("t1").isNotNull())
    )
    t2 = F.array_min(F.filter("_views", lambda x: x > F.col("t1")))
    staged = per_user.withColumn("t2", t2).withColumn(
        "t3", F.array_min(F.filter("_purchases", lambda x: x > F.col("t2")))
    )
    return staged.select(
        "user_id",
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .otherwise(1)
        .cast("int")
        .alias("stage"),
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH cohort AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, c.cohort_day,
             date_diff('day', c.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN cohort c ON e.user_id = c.user_id
    )
    SELECT cohort_day, CAST(day_offset AS BIGINT) AS day_offset,
           count(*) AS n_users
    FROM activity
    GROUP BY cohort_day, day_offset
    """,
    doc="Cohort retention matrix: users grouped by first-seen day, "
    "counted once per (cohort, day-offset) they were active — the "
    "standard retention triangle. ONE scan and one shuffle on "
    "user_id: the per-user aggregate carries min(date) (the cohort) "
    "and the distinct active-day set (bounded by the calendar, not by "
    "event count) in the same pass; offsets explode from that set and "
    "feed the tiny cohort x offset aggregate. The join-back "
    "formulation (cohort aggregate joined to raw events + distinct) "
    "scans events twice and shuffles event-count rows — this shape "
    "moves each event once and shuffles per-user day sets.",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    per_user = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day"),
        F.collect_set(F.to_date("ts")).alias("_days"),
    )
    activity = per_user.select(
        "cohort_day",
        F.explode("_days").alias("_day"),
    ).select(
        "cohort_day",
        F.datediff(F.col("_day"), F.col("cohort_day")).cast("bigint").alias("day_offset"),
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@register(
    "time_resample_gapfill",
    oracle="""
    WITH b AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum
      FROM events GROUP BY 1, 2
    ), ext AS (
      SELECT event_type, min(bucket) AS mn, max(bucket) AS mx FROM b GROUP BY event_type
    ), spine AS (
      SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
      FROM ext
    )
    SELECT s.event_type, CAST(s.bucket AS TIMESTAMP) AS bucket,
           coalesce(b.n, 0) AS n,
           b.vsum,
           last_value(b.vsum IGNORE NULLS)
             OVER (PARTITION BY s.event_type ORDER BY s.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vsum_ffill
    FROM spine s
    LEFT JOIN b ON b.event_type = s.event_type AND b.bucket = s.bucket
    """,
    doc="Hourly resample with gap filling (the hypertable/time_bucket_"
    "gapfill pattern): per-key dense hour spine via sequence+explode, "
    "left join of the bucket aggregates, zero-fill for counts and "
    "forward-fill (last non-null) for the measure. The spine "
    "generation is per-key bounded (max-min hours), the join is an "
    "equi-join on (key, bucket), and the forward fill is one running "
    "window — all linear in spine size at 100 TB.",
)
def time_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    b = (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("vsum"),
        )
    )
    ext = b.groupBy("event_type").agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
    spine = ext.select(
        "event_type",
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias("bucket"),
    )
    joined = spine.join(b, ["event_type", "bucket"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "bucket",
        F.coalesce("n", F.lit(0)).alias("n"),
        "vsum",
        F.last("vsum", ignorenulls=True).over(w).alias("vsum_ffill"),
    )


@register(
    "time_interpolate_linear",
    oracle="""
    WITH b AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vsum
      FROM events GROUP BY 1, 2
    ), ext AS (
      SELECT event_type, min(bucket) AS mn, max(bucket) AS mx FROM b GROUP BY event_type
    ), spine AS (
      SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
      FROM ext
    ), j AS (
      SELECT s.event_type, CAST(s.bucket AS TIMESTAMP) AS bucket, b.vsum,
             coalesce(b.n, 0) AS n
      FROM spine s
      LEFT JOIN b ON b.event_type = s.event_type AND b.bucket = s.bucket
    ), w AS (
      SELECT event_type, bucket, n, vsum,
             last_value(vsum IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             first_value(vsum IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             last_value(CASE WHEN vsum IS NOT NULL THEN bucket END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             first_value(CASE WHEN vsum IS NOT NULL THEN bucket END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY bucket
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM j
    )
    SELECT event_type, bucket, n,
           round(CASE
             WHEN vsum IS NOT NULL THEN vsum
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv)
                  * (CAST(epoch(bucket)::BIGINT - epoch(pt)::BIGINT AS DOUBLE)
                     / CAST(epoch(nt)::BIGINT - epoch(pt)::BIGINT AS DOUBLE))
           END, 6) AS v_interp
    FROM w
    """,
    doc="Hourly resample with LINEAR interpolation across gaps — the "
    "time-series companion to time_resample_gapfill's forward fill: "
    "empty buckets get pv + (nv - pv) * dt_frac from the nearest "
    "non-null neighbors on each side (exact integer second "
    "arithmetic for the fraction, so Spark and the oracle compute "
    "bit-identical doubles; edges clamp to the available side). Two "
    "running windows over the spine (one per direction), same "
    "per-key linear cost as the gapfill at 100 TB.",
)
def time_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    b = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("vsum"),
    )
    ext = b.groupBy("event_type").agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
    spine = ext.select(
        "event_type",
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias("bucket"),
    )
    j = spine.join(b, ["event_type", "bucket"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    marked = F.when(F.col("vsum").isNotNull(), F.col("bucket"))
    pv = F.last("vsum", ignorenulls=True).over(wp)
    nv = F.first("vsum", ignorenulls=True).over(wn)
    pt = F.last(marked, ignorenulls=True).over(wp)
    nt = F.first(marked, ignorenulls=True).over(wn)
    frac = (F.unix_timestamp(F.col("bucket")) - F.unix_timestamp(pt)).cast("double") / (
        F.unix_timestamp(nt) - F.unix_timestamp(pt)
    ).cast("double")
    interp = (
        F.when(F.col("vsum").isNotNull(), F.col("vsum"))
        .when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .otherwise(pv + (nv - pv) * frac)
    )
    return j.select(
        "event_type",
        "bucket",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.round(interp, 6).alias("v_interp"),
    )


@register(
    "round_robin_assign",
    oracle="""
    SELECT n_name,
           ((row_number() OVER (ORDER BY n_name) - 1) % 3) + 1 AS slot
    FROM nation
    """,
    doc="Deterministic round-robin assignment (the reference's "
    "city→topic distribution, city_loader.py:26-44) over a dimension.",
)
def round_robin_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, "nation", sf_dir)
    w = Window.orderBy("n_name")
    return n.select(
        "n_name", (F.pmod(F.row_number().over(w) - 1, F.lit(3)) + 1).alias("slot")
    )


@register(
    "limit_offset_page",
    oracle="""
    SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_d
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 20
    """,
    doc="Keyset-free pagination (ORDER BY + LIMIT/OFFSET). At scale "
    "prefer keyset pagination (WHERE key > last_seen ORDER BY key).",
)
def limit_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    return (
        o.select(
            "o_orderkey", F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price_d")
        )
        .orderBy(F.col("price_d").desc(), F.col("o_orderkey"))
        .offset(20)
        .limit(10)
    )


@register(
    "scalar_strings2",
    oracle="""
    SELECT p_partkey,
           lpad(p_brand, 12, '*')        AS brand_pad,
           trim(concat(' ', p_name, ' ')) AS name_trim,
           reverse(p_brand)              AS brand_rev,
           contains(p_type, 'BRASS')     AS is_brass,
           starts_with(p_name, 'a')      AS starts_a,
           regexp_extract(p_brand, '[0-9]+', 0) AS brand_num
    FROM part
    """,
    doc="String battery 2: pad/trim/reverse/contains/prefix/regexp "
    "(conservative regex — identical semantics in Java and RE2-ish "
    "engines).",
)
def scalar_strings2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, "part", sf_dir)
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.reverse("p_brand").alias("brand_rev"),
        F.contains("p_type", F.lit("BRASS")).alias("is_brass"),
        F.startswith("p_name", F.lit("a")).alias("starts_a"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
    )


@register(
    "scalar_dates2",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3m,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           dayofweek(o_orderdate) + 1 AS dow,  -- DuckDB 0=Sun; Spark 1=Sun
           weekofyear(o_orderdate) AS iso_week,
           quarter(o_orderdate)    AS qtr
    FROM orders
    """,
    doc="Date battery 2: interval arithmetic, last_day, dow/week/"
    "quarter extraction.",
)
def scalar_dates2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTHS")).alias("plus_3m"),
        F.last_day("o_orderdate").alias("month_end"),
        F.dayofweek("o_orderdate").cast("bigint").alias("dow"),
        F.weekofyear("o_orderdate").cast("bigint").alias("iso_week"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT s_nationkey AS nationkey,
           array_to_string(list_sort(list(s_suppkey)), ',') AS supp_keys,
           count(*) AS n
    FROM supplier
    GROUP BY s_nationkey
    """,
    doc="collect_list + array_sort: deterministic array aggregation "
    "(unsorted collect_list is partition-order-dependent and never "
    "used in checked queries). The sorted array is emitted as a "
    "comma-joined string — array cells are unhashable in the driver's "
    "pandas canonicalizer.",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, "supplier", sf_dir)
    return s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("s_suppkey")), lambda x: x.cast("string")),
            ",",
        ).alias("supp_keys"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "vector_stats",
    oracle="""
    SELECT vec_id,
           len(embedding)                                   AS dim,
           round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                              x -> x * x))), 6) AS l2_norm,
           round(list_sum(CAST(embedding AS DOUBLE[]))
                 / len(embedding), 6)                       AS mean_val
    FROM embeddings
    """,
    doc="Array/vector column battery: dimension, L2 norm, mean — "
    "sequential-fold doubles are bit-identical across engines "
    "(verified for the cosine kernel), rounded as belt-and-braces.",
)
def vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import norm, to_double

    e = load(spark, "embeddings", sf_dir)
    v = to_double("embedding")
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(norm(v), 6).alias("l2_norm"),
        F.round(
            F.aggregate(v, F.lit(0.0), lambda a, x: a + x) / F.size("embedding"), 6
        ).alias("mean_val"),
    )


EWMA_ALPHA = 0.3


@register(
    "time_ewma_per_key",
    oracle=f"""
    WITH RECURSIVE seq AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), r AS (
      SELECT user_id, event_id, value, rn, value AS ewma
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.event_id, s.value, s.rn,
             {EWMA_ALPHA} * s.value + {1 - EWMA_ALPHA} * r.ewma
      FROM seq s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, event_id, value, round(ewma, 6) AS ewma
    FROM r
    """,
    doc="Exponentially weighted moving average of `value` per user "
    "over event time — the classic smoothing operator whose "
    "UNBOUNDED recurrence (y = a*x + (1-a)*y_prev) no SQL window "
    "frame can express. This is the legitimate applyInPandas case "
    "(SURVEY §2-C UDF surface): groups shuffle once on the key, the "
    "per-group scan is inherently sequential, state is one double. "
    "The Spark kernel and the oracle's recursive CTE apply the "
    "IDENTICAL fma ordering (a*x + (1-a)*prev), so doubles agree "
    "bit-for-bit before the belt-and-braces round. At 100 TB the "
    "shuffle is the only data movement; group count (keys) bounds "
    "parallelism, per-key memory is O(group), same as any "
    "sessionization.",
)
def time_ewma_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    e = load(spark, "events", sf_dir).select("user_id", "event_id", "ts", "value")

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        out = pdf["value"].to_numpy().copy()
        a, b = EWMA_ALPHA, 1 - EWMA_ALPHA
        for i in range(1, len(out)):
            # same literal expression as the oracle's recursive step
            out[i] = a * out[i] + b * out[i - 1]
        pdf = pdf.assign(ewma=out)
        return pdf[["user_id", "event_id", "value", "ewma"]]

    smoothed = e.groupBy("user_id").applyInPandas(
        ewma, schema="user_id bigint, event_id bigint, value double, ewma double"
    )
    # Final rounding on the Spark column, NOT numpy: np.round is
    # half-to-even while F.round and the DuckDB oracle are HALF_UP
    # (away from zero on ties) — a double landing on a 6th-decimal
    # midpoint would diverge (round-4 advice).
    return smoothed.withColumn("ewma", F.round(F.col("ewma"), 6))


# --------------------------------------------------------------------
# Column profiling: one declaration of the per-type min/max rendering
# rule, rendered into both dialects, so the two engines cannot drift.
# "num" renders through DECIMAL(18,2) because raw DOUBLE-to-string
# formatting differs between JVM and DuckDB; bigint/date/varchar
# casts are textually identical.
_PROFILE_COLS: tuple[tuple[str, str], ...] = (
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "date"),
    ("o_orderpriority", "str"),
)


def _profile_oracle() -> str:
    parts = []
    for name, kind in _PROFILE_COLS:
        if kind == "num":
            mn = f"CAST(CAST(min({name}) AS DECIMAL(18,2)) AS VARCHAR)"
            mx = f"CAST(CAST(max({name}) AS DECIMAL(18,2)) AS VARCHAR)"
        elif kind == "date":
            # timestamp-typed date column: render the DATE portion —
            # raw timestamp-to-string fraction trimming differs
            # between JVM and DuckDB
            mn = f"CAST(CAST(min({name}) AS DATE) AS VARCHAR)"
            mx = f"CAST(CAST(max({name}) AS DATE) AS VARCHAR)"
        else:
            mn = f"CAST(min({name}) AS VARCHAR)"
            mx = f"CAST(max({name}) AS VARCHAR)"
        parts.append(
            f"SELECT '{name}' AS col_name,"
            f" CAST(count(*) - count({name}) AS BIGINT) AS n_nulls,"
            f" CAST(count(DISTINCT {name}) AS BIGINT) AS ndv,"
            f" {mn} AS min_repr, {mx} AS max_repr FROM orders"
        )
    return " UNION ALL ".join(parts)


@register(
    "profile_table_stats",
    oracle=_profile_oracle(),
    doc="Whole-table column profiler (the ANALYZE/data-quality scan): "
    "per column, null count, exact distinct count, and min/max "
    "rendered by a per-type rule shared between engines. The Spark "
    "side is ONE scan: every column's measures run in a single agg "
    "(Catalyst plans the multi-distinct via one Expand — each input "
    "row fans to one group per distinct column, partially aggregated "
    "map-side before the shuffle, so the exchange carries per-column "
    "distinct candidates, not raw rows), and the single wide row is "
    "unpivoted to per-column rows with stack(), never a driver "
    "collect. At 100 TB the same shape holds; when exact NDV is not "
    "required, swap countDistinct for approx_count_distinct (HLL) "
    "and the Expand disappears — that variant is agg_approx_distinct. "
    "The oracle writes the same measures as per-column UNION ALL "
    "scans, which DuckDB plans its own way; results hash-identical.",
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    aggs = []
    for name, kind in _PROFILE_COLS:
        c = F.col(name)
        mn, mx = F.min(c), F.max(c)
        if kind == "num":
            mn = mn.cast("decimal(18,2)")
            mx = mx.cast("decimal(18,2)")
        elif kind == "date":
            mn = mn.cast("date")
            mx = mx.cast("date")
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"nn_{name}"),
            F.countDistinct(c).cast("bigint").alias(f"nd_{name}"),
            mn.cast("string").alias(f"mn_{name}"),
            mx.cast("string").alias(f"mx_{name}"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{n}', nn_{n}, nd_{n}, mn_{n}, mx_{n}" for n, _ in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args})"
            " AS (col_name, n_nulls, ndv, min_repr, max_repr)"
        )
    )


# M4 argmin/argmax ordinal: cents * 1e10 + event_id gives a unique
# bigint whose min/max is (value, event_id)-lexicographic, making
# min_by/arg_min tie-free on both engines. Assumes event_id < 1e10
# and value >= 0 with 2-decimal cents — both properties of the events
# schema; at larger id spaces widen the multiplier (int64 headroom:
# 9.2e18).
_M4_ORD_SPARK = "CAST(round(value * 100) AS BIGINT) * 10000000000 + event_id"
_M4_ORD_DUCK = "CAST(round(value * 100) AS BIGINT) * 10000000000 + event_id"


@register(
    "time_downsample_m4",
    oracle=f"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           min(ts) AS ts_first,
           max(ts) AS ts_last,
           CAST(min(value) AS DOUBLE) AS v_min,
           CAST(max(value) AS DOUBLE) AS v_max,
           arg_min(event_id, {_M4_ORD_DUCK}) AS id_vmin,
           arg_max(event_id, {_M4_ORD_DUCK}) AS id_vmax
    FROM events
    GROUP BY 1
    """,
    doc="M4 time-series downsampling: per hour bucket, the first/last "
    "timestamps and the min/max values plus the ids of the extreme "
    "points — the four points per pixel column that make a line "
    "chart of billions of points render error-free (Jugel et al., "
    "VLDB 2014). Pure per-bucket aggregation: one scan, map-side "
    "partial min/max/min_by combine, shuffle carries one row per "
    "(bucket x task) — the downsample every observability store "
    "needs at 100 TB. Argmin/argmax are made tie-free by ordering on "
    "a unique (cents, event_id) bigint ordinal, so both engines pick "
    "the identical representative point.",
)
def time_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    ord_col = F.expr(_M4_ORD_SPARK)
    return (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("ts").alias("ts_first"),
            F.max("ts").alias("ts_last"),
            F.min("value").cast("double").alias("v_min"),
            F.max("value").cast("double").alias("v_max"),
            F.min_by("event_id", ord_col).alias("id_vmin"),
            F.max_by("event_id", ord_col).alias("id_vmax"),
        )
    )


# Centered moving-average span for the trend line (hours each side).
SEASON_TREND_BEFORE, SEASON_TREND_AFTER = 11, 12


@register(
    "time_seasonal_decompose",
    oracle=f"""
    WITH b AS (
      SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    k AS (
      SELECT h, n,
             CAST(extract(hour FROM h) AS BIGINT) AS hod,
             CAST(epoch(h) // 3600 AS BIGINT) AS hidx
      FROM b
    ),
    season AS (
      SELECT hod, CAST(sum(n) AS DOUBLE) / count(*) AS seasonal
      FROM k GROUP BY hod
    ),
    grand AS (
      SELECT CAST(sum(n) AS DOUBLE) / count(*) AS grand_mean FROM k
    ),
    tr AS (
      SELECT h, n, hod,
             CAST(sum(n) OVER w AS DOUBLE) / count(*) OVER w AS trend
      FROM k
      WINDOW w AS (ORDER BY hidx RANGE BETWEEN {SEASON_TREND_BEFORE}
                   PRECEDING AND {SEASON_TREND_AFTER} FOLLOWING)
    )
    SELECT tr.h, tr.n, tr.hod,
           round(s.seasonal, 6) AS seasonal,
           round(tr.trend, 6) AS trend,
           round(tr.n - tr.trend - (s.seasonal - g.grand_mean), 6) AS residual
    FROM tr JOIN season s ON s.hod = tr.hod, grand g
    """,
    doc="Classical seasonal decomposition of the event stream "
    "(additive STL-lite): hourly volume = 24h centered moving-average "
    "trend + hour-of-day seasonal profile + residual — the "
    "monitoring/forecasting primitive behind 'is this hour anomalous "
    "for a 3am'. Determinism: the trend window SUMS exact bigints "
    "and divides once (window averages of doubles would accumulate "
    "in engine-specific order); the seasonal profile and grand mean "
    "are grouped exact-sum aggregates re-attached by BROADCAST (a "
    "windowed avg-per-hod would be legal SQL but engine-ordered "
    "float summation). Scale shape: everything after the first "
    "GROUP BY runs on the bucket table (one row per hour — "
    "time-bounded, not corpus-bounded); the single range window "
    "orders that tiny table, so the corpus pays exactly one "
    "map-side-combined aggregate.",
)
def time_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..plans.stage import eager_release

    e = load(spark, "events", sf_dir)
    b = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # persisted: the hour-bucket table feeds three consumers (trend
    # window, seasonal profile, grand mean) — unstaged, Catalyst
    # replans the corpus aggregate once per consumer (3 full scans)
    k = b.select(
        "h",
        "n",
        F.hour("h").cast("bigint").alias("hod"),
        F.expr("unix_timestamp(h) div 3600").cast("bigint").alias("hidx"),
    ).persist()
    season = k.groupBy("hod").agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("seasonal")
    )
    grand = k.agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("grand_mean")
    )
    w = Window.orderBy("hidx").rangeBetween(-SEASON_TREND_BEFORE, SEASON_TREND_AFTER)
    tr = k.select(
        "h",
        "n",
        "hod",
        (F.sum("n").over(w).cast("double") / F.count(F.lit(1)).over(w)).alias("trend"),
    )
    out = (
        tr.join(F.broadcast(season), "hod")
        .crossJoin(F.broadcast(grand))
        .select(
            "h",
            "n",
            "hod",
            F.round("seasonal", 6).alias("seasonal"),
            F.round("trend", 6).alias("trend"),
            F.round(
                F.col("n") - F.col("trend") - (F.col("seasonal") - F.col("grand_mean")), 6
            ).alias("residual"),
        )
    )
    return eager_release(out, "seasonal_decompose", k)


@register(
    "time_period_over_period",
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
               AS revenue,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT month, CAST(revenue AS DOUBLE) AS revenue, n_orders,
           CAST(lag(revenue) OVER (ORDER BY month) AS DOUBLE) AS prev_revenue,
           round((CAST(revenue AS DOUBLE)
                  - CAST(lag(revenue) OVER (ORDER BY month) AS DOUBLE))
                 / CAST(lag(revenue) OVER (ORDER BY month) AS DOUBLE), 6)
             AS mom_growth
    FROM m ORDER BY month
    """,
    doc="Period-over-period growth (the month-over-month KPI shape): "
    "monthly revenue with the previous month and relative delta from "
    "one lag window. Revenue accumulates in exact decimals (summation "
    "order can never flip a digit) and converts to double only at the "
    "output boundary; the growth division is one IEEE op on two "
    "already-final numbers. The lag window runs on the month table — "
    "one row per period, so the sort behind it is bounded by the "
    "calendar, not the corpus; the corpus pays exactly one "
    "map-side-combined aggregate. First period reports NULL growth "
    "on both engines.",
)
def time_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, "orders", sf_dir)
    m = o.groupBy(F.trunc("o_orderdate", "month").alias("month")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("rev_dec"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    w = Window.orderBy("month")
    prev = F.lag("rev_dec").over(w)
    return m.select(
        "month",
        F.col("rev_dec").cast("double").alias("revenue"),
        "n_orders",
        prev.cast("double").alias("prev_revenue"),
        F.round(
            (F.col("rev_dec").cast("double") - prev.cast("double")) / prev.cast("double"),
            6,
        ).alias("mom_growth"),
    ).orderBy("month")


@register(
    "time_forecast_backtest_naive",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    k AS (
      SELECT n,
             lag(n, 1)  OVER (ORDER BY h) AS f1,
             lag(n, 24) OVER (ORDER BY h) AS f24
      FROM b
    ),
    agg AS (
      SELECT
        CAST(count(f1) AS BIGINT) AS n_evals1,
        CAST(sum(CASE WHEN f1 IS NULL THEN 0 ELSE abs(n - f1) END) AS BIGINT) AS ae1,
        CAST(sum(CASE WHEN f1 IS NULL THEN 0 ELSE (n - f1) * (n - f1) END) AS BIGINT) AS se1,
        CAST(sum(CASE WHEN f1 IS NULL THEN 0 ELSE n - f1 END) AS BIGINT) AS d1,
        CAST(count(f24) AS BIGINT) AS n_evals24,
        CAST(sum(CASE WHEN f24 IS NULL THEN 0 ELSE abs(n - f24) END) AS BIGINT) AS ae24,
        CAST(sum(CASE WHEN f24 IS NULL THEN 0 ELSE (n - f24) * (n - f24) END) AS BIGINT) AS se24,
        CAST(sum(CASE WHEN f24 IS NULL THEN 0 ELSE n - f24 END) AS BIGINT) AS d24
      FROM k
    )
    SELECT n_evals1,
           round(CAST(ae1 AS DOUBLE) / n_evals1, 6) AS mae_persistence,
           round(sqrt(CAST(se1 AS DOUBLE) / n_evals1), 6) AS rmse_persistence,
           round(CAST(d1 AS DOUBLE) / n_evals1, 6) AS bias_persistence,
           n_evals24,
           round(CAST(ae24 AS DOUBLE) / n_evals24, 6) AS mae_seasonal,
           round(sqrt(CAST(se24 AS DOUBLE) / n_evals24), 6) AS rmse_seasonal,
           round(CAST(d24 AS DOUBLE) / n_evals24, 6) AS bias_seasonal
    FROM agg
    """,
    doc="Forecast backtest of the two baselines every forecasting "
    "project must beat: persistence (next hour = this hour, lag 1) "
    "and seasonal naive (next hour = same hour yesterday, lag 24), "
    "scored in-sample with MAE / RMSE / bias over the hourly volume "
    "series — the evaluation harness that turns "
    "time_seasonal_decompose's structure into a falsifiable claim "
    "(seasonal-naive beating persistence IS the evidence of daily "
    "seasonality). Every error term is an exact bigint (integer "
    "counts minus integer lags, absolute and squared sums commute), "
    "so the only float ops are three divisions and one sqrt per "
    "forecaster — IEEE-exact. One corpus aggregate; the lag windows "
    "run on the calendar-sized bucket table.",
)
def time_forecast_backtest_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, "events", sf_dir)
    b = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.orderBy("h")
    k = b.select(
        "n",
        F.lag("n", 1).over(w).alias("f1"),
        F.lag("n", 24).over(w).alias("f24"),
    )

    def err_aggs(f: str, tag: str):
        d = F.col("n") - F.col(f)
        present = F.col(f).isNotNull()
        return [
            F.count(F.col(f)).cast("bigint").alias(f"n_evals{tag}"),
            F.sum(F.when(present, F.abs(d)).otherwise(0)).cast("bigint").alias(f"ae{tag}"),
            F.sum(F.when(present, d * d).otherwise(0)).cast("bigint").alias(f"se{tag}"),
            F.sum(F.when(present, d).otherwise(0)).cast("bigint").alias(f"d{tag}"),
        ]

    agg = k.agg(*err_aggs("f1", "1"), *err_aggs("f24", "24"))
    return agg.select(
        F.col("n_evals1"),
        F.round(F.col("ae1").cast("double") / F.col("n_evals1"), 6).alias("mae_persistence"),
        F.round(F.sqrt(F.col("se1").cast("double") / F.col("n_evals1")), 6).alias(
            "rmse_persistence"
        ),
        F.round(F.col("d1").cast("double") / F.col("n_evals1"), 6).alias("bias_persistence"),
        F.col("n_evals24"),
        F.round(F.col("ae24").cast("double") / F.col("n_evals24"), 6).alias("mae_seasonal"),
        F.round(F.sqrt(F.col("se24").cast("double") / F.col("n_evals24")), 6).alias(
            "rmse_seasonal"
        ),
        F.round(F.col("d24").cast("double") / F.col("n_evals24"), 6).alias("bias_seasonal"),
    )


# Peak threshold: n must exceed 1.5x the global hourly mean, tested
# as the exact integer cross-product n*m*2 > s*3 (never a float mean).
PEAK_NUM, PEAK_DEN = 3, 2


@register(
    "time_peak_detection",
    oracle=f"""
    WITH b AS (
      SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS m, CAST(sum(n) AS BIGINT) AS s FROM b),
    k AS (
      SELECT h, n,
             lag(n)  OVER (ORDER BY h) AS n_prev,
             lead(n) OVER (ORDER BY h) AS n_next
      FROM b
    )
    SELECT k.h, k.n, k.n_prev, k.n_next,
           round(CAST(k.n * t.m AS DOUBLE) / t.s, 6) AS rel_to_mean
    FROM k, t
    WHERE k.n_prev IS NOT NULL AND k.n_next IS NOT NULL
      AND k.n > k.n_prev AND k.n > k.n_next
      AND k.n * t.m * {PEAK_DEN} > t.s * {PEAK_NUM}
    """,
    doc="Spike/peak detection on the hourly volume series: strict "
    "local maxima (greater than BOTH neighbors) that also clear "
    f"{PEAK_NUM}/{PEAK_DEN}x the global hourly mean — the alert-"
    "worthy-burst list, complementing events_anomaly_zscore "
    "(per-event outliers) and time_changepoint_binary (level "
    "shifts) with the transient-spike shape. The threshold test is "
    "the exact integer cross-product n*m*2 > s*3, so no float mean "
    "ever enters a predicate (a borderline hour can never flip "
    "between engines); the reported rel_to_mean ratio is one final "
    "display division. Lag/lead run on the calendar-sized bucket "
    "table; series edges are excluded explicitly (NULL neighbors), "
    "not silently treated as peaks.",
)
def time_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, "events", sf_dir)
    b = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    t = b.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("n").cast("bigint").alias("s"),
    )
    w = Window.orderBy("h")
    k = b.select(
        "h",
        "n",
        F.lag("n").over(w).alias("n_prev"),
        F.lead("n").over(w).alias("n_next"),
    )
    return (
        k.crossJoin(F.broadcast(t))
        .filter(
            F.col("n_prev").isNotNull()
            & F.col("n_next").isNotNull()
            & (F.col("n") > F.col("n_prev"))
            & (F.col("n") > F.col("n_next"))
            & (F.col("n") * F.col("m") * PEAK_DEN > F.col("s") * PEAK_NUM)
        )
        .select(
            "h",
            "n",
            "n_prev",
            "n_next",
            F.round((F.col("n") * F.col("m")).cast("double") / F.col("s"), 6).alias(
                "rel_to_mean"
            ),
        )
    )


# Expected range for the audited JSON metric field (the dbt-style
# accepted-range test), pinned identically in both engines.
JSON_K_LO = 0
JSON_K_HI = 100


@register(
    "quality_json_audit",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN json_valid(props) THEN 1 ELSE 0 END)
             AS BIGINT) AS n_valid_json,
           CAST(sum(CASE WHEN json_valid(props)
                         AND json_extract_string(props, '$.k') IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_has_k,
           CAST(sum(CASE WHEN TRY_CAST(json_extract_string(props, '$.k')
                              AS BIGINT) BETWEEN {JSON_K_LO} AND {JSON_K_HI - 1}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_k_in_range,
           CAST(min(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS BIGINT) AS k_min,
           CAST(max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS BIGINT) AS k_max
    FROM events GROUP BY event_type
    """,
    doc="Schema-on-read JSON validation audit over the event payloads "
    "— the dbt-style data-quality tests (parseable? required key "
    "present? value in accepted range? observed bounds) a pipeline "
    "runs per ingest batch before trusting semi-structured columns, "
    "completing events_json_extract (which assumes health) with the "
    "operator that MEASURES health. Parse-success maps to Spark's "
    "PERMISSIVE from_json yielding a non-null struct; every check is "
    "a conditional exact count inside ONE map-side-combined "
    "aggregate, so the audit costs a single scan regardless of how "
    "many rules stack on top.",
)
def quality_json_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    parsed = e.select(
        "event_type",
        "props",
        F.from_json("props", "struct<k:bigint>").alias("j"),
    )
    valid = F.col("j").isNotNull()
    k = F.col("j").getField("k")
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(valid.cast("int")).cast("bigint").alias("n_valid_json"),
        F.sum((valid & k.isNotNull()).cast("int")).cast("bigint").alias("n_has_k"),
        F.sum(k.between(JSON_K_LO, JSON_K_HI - 1).cast("int"))
        .cast("bigint")
        .alias("n_k_in_range"),
        F.min(k).cast("bigint").alias("k_min"),
        F.max(k).cast("bigint").alias("k_max"),
    )


# Holt's linear (double exponential) smoothing with alpha = beta = 0.5:
# level' = 0.5 x + 0.5 (level + trend); trend' = 0.5 (level' - level)
# + 0.5 trend. The halves are exact binary fractions, so every fold
# step is exact-IEEE add/multiply — the recurrence is bit-identical
# cross-engine with NO rounding contract needed (unlike libm-based
# smoothers). Forecast horizon pinned below.
HOLT_H = 7


@register(
    "time_holt_linear",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, CAST(x AS DOUBLE) AS x,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS step,
             count(*) OVER (PARTITION BY event_type) AS n_days
      FROM d
    ),
    fold AS (
      -- CAST matters: a bare 0.0 types as DECIMAL(2,1) and the
      -- recursion would quantize every subsequent trend to one digit
      SELECT event_type, step, n_days, x AS level,
             CAST(0.0 AS DOUBLE) AS trend
      FROM s WHERE step = 1
      UNION ALL
      SELECT s.event_type, s.step, s.n_days,
             0.5 * s.x + 0.5 * (f.level + f.trend) AS level,
             0.5 * ((0.5 * s.x + 0.5 * (f.level + f.trend)) - f.level)
               + 0.5 * f.trend AS trend
      FROM fold f JOIN s ON s.event_type = f.event_type
                        AND s.step = f.step + 1
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           round(level, 6) AS level, round(trend, 6) AS trend,
           round(level + {HOLT_H} * trend, 6) AS forecast_h{HOLT_H}
    FROM fold
    WHERE step = n_days
    """,
    doc="Holt's linear-trend exponential smoothing of daily event "
    "volume per stream (see the alpha = beta = 0.5 exactness comment) "
    "— the level+trend forecaster beside the seasonal-naive backtest "
    "and seasonal decompose; emits the final state and a "
    f"{HOLT_H}-day-ahead forecast. Smoothing is inherently a "
    "sequential fold, so the scalable formulation reduces FIRST (one "
    "map-side-combined day-bucket aggregate; the corpus is touched "
    "once) and folds the calendar-SIZED series per key: Spark folds "
    "the collected per-key day array with a higher-order aggregate "
    "(codegen, no UDF; arrays are bounded by days-per-key, the "
    "time_downsample_m4 contract), the oracle mirrors it with a "
    "recursive CTE stepping day by day — same arithmetic, same "
    "result, bit for bit.",
)
def time_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    d = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    series = d.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "x"))),
            lambda s: s.getField("x").cast("double"),
        ).alias("xs")
    )
    init = F.struct(
        F.lit(0.0).alias("level"), F.lit(0.0).alias("trend"), F.lit(False).alias("started")
    )

    def step(acc, x):
        lvl = F.lit(0.5) * x + F.lit(0.5) * (acc.getField("level") + acc.getField("trend"))
        trd = F.lit(0.5) * (lvl - acc.getField("level")) + F.lit(0.5) * acc.getField("trend")
        return F.when(
            acc.getField("started"),
            F.struct(lvl.alias("level"), trd.alias("trend"), F.lit(True).alias("started")),
        ).otherwise(
            F.struct(x.alias("level"), F.lit(0.0).alias("trend"), F.lit(True).alias("started"))
        )

    folded = series.select(
        "event_type",
        F.size("xs").cast("bigint").alias("n_days"),
        F.aggregate("xs", init, step).alias("st"),
    )
    lvl = F.col("st").getField("level")
    trd = F.col("st").getField("trend")
    return folded.select(
        "event_type",
        "n_days",
        F.round(lvl, 6).alias("level"),
        F.round(trd, 6).alias("trend"),
        F.round(lvl + F.lit(float(HOLT_H)) * trd, 6).alias(f"forecast_h{HOLT_H}"),
    )


# --- hopping (sliding) window aggregate (round 10) --------------------

HOP_SIZE_H = 4  # window length, hours
HOP_STEP_H = 1  # hop, hours


@register(
    "time_hopping_windows",
    oracle=f"""
    WITH h AS (
      SELECT ((epoch_ms(ts) // 1000) - (epoch_ms(ts) // 1000) % 3600) // 3600
               AS hb,
             user_id, CAST(value AS DECIMAL(18,2)) AS v
      FROM events
    ),
    x AS (
      SELECT hb - k AS ws_hour, user_id, v
      FROM h, (VALUES (0), (1), (2), (3)) ks(k)
    )
    SELECT CAST(ws_hour AS BIGINT) AS ws_hour,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(v) AS DOUBLE) AS sum_value
    FROM x GROUP BY ws_hour
    """,
    doc="Hopping-window aggregate (size 4h, hop 1h): every event "
    f"lands in exactly {HOP_SIZE_H} overlapping windows, produced by "
    "a constant-width explode of the window-start offsets — the "
    "BATCH twin of Structured Streaming's window(ts, '4 hours', "
    "'1 hour') groupBy, same assignment semantics (window [start, "
    "start+size) containing the event = starts hb-3..hb). The "
    "overlap factor is the SIZE/HOP constant, never data-dependent, "
    "so the 4x row amplification is a fixed cost like "
    "join_salted_skew's salt range and dies into the first map-side "
    "combine; the shuffle key is the window start. Hour buckets are "
    "exact integer epoch math ((e - e%3600)/3600 — the exact-"
    "division idiom, no float truncation); measures sum in DECIMAL "
    "and surface as DOUBLE.",
)
def time_hopping_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    epoch = F.unix_timestamp("ts").cast("bigint")
    hb = ((epoch - epoch % F.lit(3600)) / F.lit(3600)).cast("bigint")
    n_wins = HOP_SIZE_H // HOP_STEP_H
    x = e.select(
        hb.alias("hb"),
        "user_id",
        F.col("value").cast("decimal(18,2)").alias("v"),
        F.explode(F.array(*[F.lit(k) for k in range(n_wins)])).alias("k"),
    ).select((F.col("hb") - F.col("k")).cast("bigint").alias("ws_hour"), "user_id", "v")
    return x.groupBy("ws_hour").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum("v").cast("double").alias("sum_value"),
    )


# ABC thresholds: cumulative revenue share cuts at 80% / 95%; XYZ
# demand-variability cuts on the squared coefficient of variation
# (CV^2 <= 0.25 -> X, <= 1.0 -> Y, else Z) — all compared via exact
# cross-multiplication, no division.
ABC_A_PCT, ABC_B_PCT = 80, 95
XYZ_X_NUM, XYZ_X_DEN = 1, 4  # CV^2 <= 1/4
XYZ_Y_NUM, XYZ_Y_DEN = 1, 1  # CV^2 <= 1


@register(
    "part_abc_classification",
    oracle=f"""
    WITH m AS (
      SELECT l_partkey,
             date_trunc('month', l_shipdate) AS mth,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS q,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
      FROM lineitem GROUP BY 1, 2
    ),
    p AS (
      SELECT l_partkey,
             CAST(count(*) AS BIGINT) AS n_months,
             CAST(sum(rev) AS DECIMAL(38,2)) AS revenue,
             CAST(sum(q) AS DECIMAL(38,2)) AS sq,
             CAST(sum(q * q) AS DECIMAL(38,4)) AS sqq
      FROM m GROUP BY 1
    ),
    ranked AS (
      SELECT *,
             CAST(sum(revenue) OVER (ORDER BY revenue DESC, l_partkey
                                     ROWS UNBOUNDED PRECEDING)
                  AS DECIMAL(38,2)) AS cum_rev,
             CAST(sum(revenue) OVER () AS DECIMAL(38,2)) AS tot_rev
      FROM p
    )
    SELECT l_partkey, n_months,
           CAST(revenue AS DOUBLE) AS revenue,
           -- share cut compared in DOUBLE: all operands are exact
           -- decimals with < 15 significant digits, so the doubles
           -- are exact and the x100/x80 products stay under 2^53 —
           -- and DOUBLE sidesteps the engines' different
           -- decimal-times-integer widening rules
           CASE WHEN CAST(cum_rev AS DOUBLE) * 100
                     <= CAST(tot_rev AS DOUBLE) * {ABC_A_PCT} THEN 'A'
                WHEN CAST(cum_rev AS DOUBLE) * 100
                     <= CAST(tot_rev AS DOUBLE) * {ABC_B_PCT} THEN 'B'
                ELSE 'C' END AS class_abc,
           CASE WHEN n_months < 2 THEN 'Z'
                WHEN (n_months * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq)
                     * {XYZ_X_DEN} * n_months
                     <= {XYZ_X_NUM} * (n_months - 1) * (CAST(sq AS DOUBLE) * sq)
                  THEN 'X'
                WHEN (n_months * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * sq)
                     * {XYZ_Y_DEN} * n_months
                     <= {XYZ_Y_NUM} * (n_months - 1) * (CAST(sq AS DOUBLE) * sq)
                  THEN 'Y'
                ELSE 'Z' END AS class_xyz
    FROM ranked
    """,
    doc="ABC/XYZ inventory classification — the planner's standard "
    "two-axis part segmentation: A/B/C by cumulative revenue share "
    f"(top parts covering {ABC_A_PCT}% / {ABC_B_PCT}% of revenue, "
    "ranked with a partkey total tiebreak) and X/Y/Z by monthly "
    "demand variability (bands on the squared coefficient of "
    "variation). Every class boundary is an exact comparison: the "
    "share cut is cross-multiplied DECIMAL (cum*100 <= tot*80 — "
    "never a percentage division), and the CV^2 band test "
    "var/mean^2 <= k/d is rearranged to (n*Σq² − S²)·d·n <= "
    "k·(n−1)·S²·n... with both sides single IEEE products of exact "
    "DECIMAL operands — identical trees, no rounding contract. One "
    "monthly aggregate, one per-part aggregate, one window over the "
    "part dimension; scan-bound at 100 TB with the part table as "
    "the only windowed set.",
)
def part_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    m = li.groupBy(
        "l_partkey", F.date_trunc("month", "l_shipdate").alias("mth")
    ).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("decimal(38,2)").alias("q"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(38,2)").alias("rev"),
    )
    p = m.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.sum("rev").cast("decimal(38,2)").alias("revenue"),
        F.sum("q").cast("decimal(38,2)").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("decimal(38,4)").alias("sqq"),
    )
    wcum = Window.orderBy(F.col("revenue").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    ranked = p.select(
        "*",
        F.sum("revenue").over(wcum).cast("decimal(38,2)").alias("cum_rev"),
        F.sum("revenue").over(wall).cast("decimal(38,2)").alias("tot_rev"),
    )
    nm = F.col("n_months")
    var_num = nm * F.col("sqq").cast("double") - F.col("sq").cast("double") * F.col("sq")
    s2 = F.col("sq").cast("double") * F.col("sq")
    abc = (
        F.when(
            F.col("cum_rev").cast("double") * 100
            <= F.col("tot_rev").cast("double") * ABC_A_PCT,
            "A",
        )
        .when(
            F.col("cum_rev").cast("double") * 100
            <= F.col("tot_rev").cast("double") * ABC_B_PCT,
            "B",
        )
        .otherwise("C")
    )
    xyz = (
        F.when(nm < 2, "Z")
        .when(var_num * XYZ_X_DEN * nm <= F.lit(XYZ_X_NUM) * (nm - 1) * s2, "X")
        .when(var_num * XYZ_Y_DEN * nm <= F.lit(XYZ_Y_NUM) * (nm - 1) * s2, "Y")
        .otherwise("Z")
    )
    return ranked.select(
        "l_partkey",
        "n_months",
        F.col("revenue").cast("double").alias("revenue"),
        abc.alias("class_abc"),
        xyz.alias("class_xyz"),
    )


@register(
    "events_dau_mau_stickiness",
    oracle="""
    WITH d AS (
      SELECT date_trunc('month', ts) AS mth,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT date_trunc('month', ts) AS mth,
             CAST(count(DISTINCT user_id) AS BIGINT) AS mau
      FROM events GROUP BY 1
    )
    SELECT CAST(d.mth AS DATE) AS month,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(dau) AS BIGINT) AS dau_sum,
           CAST(max(mau) AS BIGINT) AS mau,
           round(CAST(sum(dau) AS DOUBLE) / count(*) / max(mau), 6)
             AS stickiness
    FROM d JOIN m ON d.mth = m.mth
    GROUP BY d.mth
    """,
    doc="DAU/MAU stickiness per month — the product-health ratio "
    "(how much of the monthly audience shows up on an average day; "
    "1.0 = everyone daily). Exact distinct counts at both grains; "
    "the ratio avg(dau)/mau is two divisions applied once per MONTH "
    "row in an identical tree. Two count-distinct aggregates sharing "
    "the user_id shuffle key plus a month-dimension join (broadcast "
    "at any scale); the monthly MAU join is the textbook case where "
    "a windowed max over the day table would be wrong (MAU is NOT "
    "the max of DAUs — it deduplicates across days).",
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    d = e.groupBy(
        F.date_trunc("month", "ts").alias("mth"),
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
    ).agg(F.countDistinct("user_id").cast("bigint").alias("dau"))
    m = e.groupBy(F.date_trunc("month", "ts").alias("mth")).agg(
        F.countDistinct("user_id").cast("bigint").alias("mau")
    )
    j = d.join(m, "mth")
    return j.groupBy("mth").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("dau").cast("bigint").alias("dau_sum"),
        F.max("mau").cast("bigint").alias("mau"),
        F.round(
            F.sum("dau").cast("double") / F.count(F.lit(1)) / F.max("mau"), 6
        ).alias("stickiness"),
    ).select(
        F.to_date("mth").alias("month"), "n_days", "dau_sum", "mau", "stickiness"
    )


@register(
    "supplier_herfindahl",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey AS nationkey, l.l_suppkey,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS r
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    )
    SELECT nationkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(CAST(sum(r) AS DECIMAL(38,2)) AS DOUBLE) AS total_rev,
           round(CAST(CAST(sum(CAST(r AS DECIMAL(19,2)) * r) AS DECIMAL(38,4)) AS DOUBLE)
                 / (CAST(CAST(sum(r) AS DECIMAL(38,2)) AS DOUBLE)
                    * CAST(CAST(sum(r) AS DECIMAL(38,2)) AS DOUBLE)), 6)
             AS hhi
    FROM rev GROUP BY nationkey
    """,
    doc="Herfindahl-Hirschman concentration index of supplier revenue "
    "per nation: sum of squared market shares, the antitrust-standard "
    "concentration scalar (1/n = perfect competition, 1.0 = "
    "monopoly) — the revenue-side sibling of "
    "events_gini_concentration. Shares are never computed: HHI = "
    "Σr_i² / (Σr)² algebraically, so per-supplier revenue aggregates "
    "exactly in DECIMAL, the squared terms stay DECIMAL too — "
    "(19,2)x(18,2) -> (38,4) — width 19 forces HUGEINT storage in "
    "DuckDB (a DECIMAL(18) square overflows its int64 lane) while "
    "staying inside the 38-digit product cap per "
    "the zipf trap in SCALE.md (a double-product sum here would be "
    "engine-order-sensitive) — and the single division happens once "
    "per NATION row. Supplier-per-nation is dimension-sized.",
)
def supplier_herfindahl(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    s = load(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nationkey"), "l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("r")
        )
    )
    return rev.groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("r").cast("decimal(38,2)").cast("double").alias("total_rev"),
        F.round(
            F.sum(F.col("r").cast("decimal(19,2)") * F.col("r"))
            .cast("decimal(38,4)")
            .cast("double")
            / (
                F.sum("r").cast("decimal(38,2)").cast("double")
                * F.sum("r").cast("decimal(38,2)").cast("double")
            ),
            6,
        ).alias("hhi"),
    )


# SMA crossover: fast window 7 days, slow window 28 days, over the
# daily revenue series (signal = fast average crossing the slow one).
SMA_FAST_D = 7
SMA_SLOW_D = 28


@register(
    "time_sma_crossover",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS x
      FROM orders GROUP BY 1
    ),
    w AS (
      SELECT day, x,
             CAST(sum(x) OVER (ORDER BY day
                               ROWS BETWEEN {SMA_FAST_D - 1} PRECEDING AND CURRENT ROW)
                  AS DECIMAL(38,2)) AS sf,
             CAST(count(*) OVER (ORDER BY day
                               ROWS BETWEEN {SMA_FAST_D - 1} PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS nf,
             CAST(sum(x) OVER (ORDER BY day
                               ROWS BETWEEN {SMA_SLOW_D - 1} PRECEDING AND CURRENT ROW)
                  AS DECIMAL(38,2)) AS ss,
             CAST(count(*) OVER (ORDER BY day
                               ROWS BETWEEN {SMA_SLOW_D - 1} PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS ns,
             row_number() OVER (ORDER BY day) AS rn
      FROM daily
    ),
    sig AS (
      SELECT day, x, sf, nf, ss, ns,
             (CAST(sf AS DECIMAL(38,2)) * ns > CAST(ss AS DECIMAL(38,2)) * nf)
               AS fast_above,
             lag((CAST(sf AS DECIMAL(38,2)) * ns > CAST(ss AS DECIMAL(38,2)) * nf))
               OVER (ORDER BY day) AS prev_above
      FROM w WHERE rn >= {SMA_SLOW_D}
    )
    SELECT day,
           round(CAST(sf AS DOUBLE) / nf, 6) AS sma_fast,
           round(CAST(ss AS DOUBLE) / ns, 6) AS sma_slow,
           CASE WHEN fast_above AND NOT prev_above THEN 'golden_cross'
                ELSE 'death_cross' END AS signal
    FROM sig
    WHERE prev_above IS NOT NULL AND fast_above <> prev_above
    """,
    doc="Moving-average crossover detection (7-day vs 28-day SMA over "
    "daily revenue): the classic trend-change signal, emitting only "
    "the crossing days. The CROSSING TEST never divides: fast > slow "
    "is cross-multiplied on exact DECIMAL window sums (sum_f * n_s > "
    "sum_s * n_f), so the signal is exact arithmetic end-to-end and "
    "the displayed SMAs are presentation-only rounded divisions. "
    "Warm-up rows (before one full slow window) are excluded by row "
    "count, not date arithmetic, so both engines cut identically. "
    "One daily aggregate then ROWS-frame windows over the calendar-"
    "bounded bucket table (the theil_sen/cusum design) — scan-bound; "
    "the single unpartitioned window is day-dimension-sized.",
)
def time_sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    daily = o.groupBy(
        F.to_date(F.date_trunc("day", "o_orderdate")).alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("x")
    )
    wf = Window.orderBy("day").rowsBetween(-(SMA_FAST_D - 1), 0)
    ws = Window.orderBy("day").rowsBetween(-(SMA_SLOW_D - 1), 0)
    wo = Window.orderBy("day")
    w = daily.select(
        "day",
        "x",
        F.sum("x").over(wf).cast("decimal(38,2)").alias("sf"),
        F.count(F.lit(1)).over(wf).cast("bigint").alias("nf"),
        F.sum("x").over(ws).cast("decimal(38,2)").alias("ss"),
        F.count(F.lit(1)).over(ws).cast("bigint").alias("ns"),
        F.row_number().over(wo).alias("rn"),
    ).filter(F.col("rn") >= SMA_SLOW_D)
    above = F.col("sf") * F.col("ns") > F.col("ss") * F.col("nf")
    sig = w.select(
        "day",
        "sf",
        "nf",
        "ss",
        "ns",
        above.alias("fast_above"),
        F.lag(above).over(Window.orderBy("day")).alias("prev_above"),
    )
    return (
        sig.filter(
            F.col("prev_above").isNotNull()
            & (F.col("fast_above") != F.col("prev_above"))
        )
        .select(
            "day",
            F.round(F.col("sf").cast("double") / F.col("nf"), 6).alias("sma_fast"),
            F.round(F.col("ss").cast("double") / F.col("ns"), 6).alias("sma_slow"),
            F.when(
                F.col("fast_above") & ~F.col("prev_above"), "golden_cross"
            )
            .otherwise("death_cross")
            .alias("signal"),
        )
    )


@register(
    "profile_partition_skew",
    oracle="""
    WITH parts AS (
      SELECT date_trunc('month', l_shipdate) AS part_month,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM lineitem GROUP BY 1
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(n_rows) AS BIGINT) AS total_rows,
             CAST(max(n_rows) AS BIGINT) AS max_rows
      FROM parts
    )
    SELECT p.part_month, p.n_rows, p.n_orders,
           round(CAST(p.n_rows AS DOUBLE) / t.total_rows, 6) AS pct_rows,
           round(CAST(p.n_rows AS DOUBLE) * t.n_parts / t.total_rows, 6)
             AS skew_ratio,
           p.n_rows = t.max_rows AS is_largest
    FROM parts p CROSS JOIN tot t
    """,
    doc="Partition-layout skew audit for the warehouse's month "
    "partitioning (sources/sink.py's scheme): per-partition row "
    "count and distinct parent-order count, each "
    "partition's share, and skew_ratio = n_rows x n_parts / total "
    "(1.0 = perfectly even; the number that predicts straggler "
    "tasks and decides salting/AQE-split before a 100 TB backfill). "
    "Shape: one map-side-combined groupBy on the partition key, "
    "then a 1-row total broadcast onto the calendar-sized partition "
    "table (the scalar-aggregate exemption) — the audit costs one "
    "scan no matter the table size, and at 100 TB it reads parquet "
    "footers' worth of work per partition, not data.",
)
def profile_partition_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.stage import stage_checkpoint

    li = load(spark, "lineitem", sf_dir)
    # staged: the calendar-sized partition profile feeds the totals
    # aggregate AND the final projection — unstaged, Catalyst expands
    # the lineage twice and the FACT TABLE scans twice (seen in this
    # round's plan audit); checkpointing ~12 rows buys one scan.
    parts = stage_checkpoint(
        li.groupBy(F.trunc("l_shipdate", "month").alias("part_month")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"),
        ),
        "partition_skew_parts",
    )
    tot = parts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("n_rows").cast("bigint").alias("total_rows"),
        F.max("n_rows").cast("bigint").alias("max_rows"),
    )
    return parts.crossJoin(F.broadcast(tot)).select(
        "part_month",
        "n_rows",
        "n_orders",
        F.round(F.col("n_rows").cast("double") / F.col("total_rows"), 6).alias(
            "pct_rows"
        ),
        F.round(
            F.col("n_rows").cast("double") * F.col("n_parts") / F.col("total_rows"),
            6,
        ).alias("skew_ratio"),
        (F.col("n_rows") == F.col("max_rows")).alias("is_largest"),
    )


# --- Holt-Winters additive seasonal smoothing (round 11) ---------------

HW_M = 7  # weekly season over the daily series
HW_H = 7  # forecast horizon


@register(
    "time_holt_winters",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, CAST(x AS DOUBLE) AS x,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS step,
             count(*) OVER (PARTITION BY event_type) AS n_days
      FROM d
    ),
    fold AS (
      SELECT event_type, step, n_days, x AS level,
             CAST(0.0 AS DOUBLE) AS trend,
             [CAST(0.0 AS DOUBLE) for j in range(1, {HW_M} + 1)] AS seas
      FROM s WHERE step = 1
      UNION ALL
      SELECT s.event_type, s.step, s.n_days,
             0.5 * (s.x - f.seas[((s.step - 1) % {HW_M}) + 1])
               + 0.5 * (f.level + f.trend) AS level,
             0.5 * ((0.5 * (s.x - f.seas[((s.step - 1) % {HW_M}) + 1])
                     + 0.5 * (f.level + f.trend)) - f.level)
               + 0.5 * f.trend AS trend,
             [CASE WHEN j = ((s.step - 1) % {HW_M}) + 1
                   THEN 0.5 * (s.x
                          - (0.5 * (s.x - f.seas[((s.step - 1) % {HW_M}) + 1])
                             + 0.5 * (f.level + f.trend)))
                        + 0.5 * f.seas[j]
                   ELSE f.seas[j] END
              for j in range(1, {HW_M} + 1)] AS seas
      FROM fold f JOIN s ON s.event_type = f.event_type
                        AND s.step = f.step + 1
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           round(level, 6) AS level, round(trend, 6) AS trend,
           array_to_string([CAST(round(seas[j], 6) AS VARCHAR)
                            for j in range(1, {HW_M} + 1)], ',') AS seasonal,
           round(level + {HW_H} * trend
                 + seas[((n_days + {HW_H} - 1) % {HW_M}) + 1], 6)
             AS forecast_h{HW_H}
    FROM fold
    WHERE step = n_days
    """,
    doc=f"Holt-Winters ADDITIVE seasonal smoothing (m={HW_M}, weekly "
    "season over the daily series) — time_holt_linear plus the "
    "seasonal state the weekday-cyclic volume actually needs; "
    "alpha = beta = gamma = 0.5, so every smoothing step is a "
    "binary-exact halving+add and both engines' folds agree bit for "
    "bit (the holt_linear exactness argument extended to the "
    "seasonal vector). Seasonal state initializes to zeros and "
    "converges within the series' ~4 weekly cycles — one uniform "
    "recurrence, no special-cased warm-up window. Same scale shape "
    "as holt_linear: reduce FIRST (one map-side-combined day-bucket "
    "aggregate), then fold the calendar-sized series per key — "
    f"Spark carries (level, trend, {HW_M}-slot seasonal array, "
    "counter) through one codegen higher-order aggregate; the "
    "oracle mirrors it with a recursive CTE rebuilding the list "
    "per step. Emits final state + the h={HW_H} forecast with the "
    "phase-matched seasonal term.",
)
def time_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    d = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    series = d.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "x"))),
            lambda s: s.getField("x").cast("double"),
        ).alias("xs")
    )
    zeros = F.array(*[F.lit(0.0) for _ in range(HW_M)])
    init = F.struct(
        F.lit(0.0).alias("level"),
        F.lit(0.0).alias("trend"),
        zeros.alias("seas"),
        F.lit(0).alias("cnt"),
    )

    def step(acc, x):
        cnt = acc.getField("cnt")
        # 1-based seasonal slot of THIS step: ((cnt+1)-1) % m + 1
        slot = (cnt % HW_M) + 1
        s_prev = F.element_at(acc.getField("seas"), slot)
        lvl = F.lit(0.5) * (x - s_prev) + F.lit(0.5) * (
            acc.getField("level") + acc.getField("trend")
        )
        trd = F.lit(0.5) * (lvl - acc.getField("level")) + F.lit(0.5) * acc.getField(
            "trend"
        )
        s_new = F.lit(0.5) * (x - lvl) + F.lit(0.5) * s_prev
        seas_upd = F.transform(
            acc.getField("seas"),
            lambda v, j: F.when(j + 1 == slot, s_new).otherwise(v),
        )
        return F.when(
            cnt == 0,
            F.struct(
                x.alias("level"),
                F.lit(0.0).alias("trend"),
                acc.getField("seas").alias("seas"),
                F.lit(1).alias("cnt"),
            ),
        ).otherwise(
            F.struct(
                lvl.alias("level"),
                trd.alias("trend"),
                seas_upd.alias("seas"),
                (cnt + 1).alias("cnt"),
            )
        )

    folded = series.select(
        "event_type",
        F.size("xs").cast("bigint").alias("n_days"),
        F.aggregate("xs", init, step).alias("st"),
    )
    lvl = F.col("st").getField("level")
    trd = F.col("st").getField("trend")
    seas = F.col("st").getField("seas")
    fc_slot = ((F.col("n_days") + HW_H - 1) % HW_M + 1).cast("int")
    return folded.select(
        "event_type",
        "n_days",
        F.round(lvl, 6).alias("level"),
        F.round(trd, 6).alias("trend"),
        F.array_join(
            F.transform(seas, lambda v: F.round(v, 6).cast("string")), ","
        ).alias("seasonal"),
        F.round(lvl + F.lit(float(HW_H)) * trd + F.element_at(seas, fc_slot), 6).alias(
            f"forecast_h{HW_H}"
        ),
    )


# --- OHLC candlestick bars (round 11 continuation) ----------------------


@register(
    "time_ohlc_bars",
    oracle="""
    WITH x AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             struct_pack(t := ts, e := event_id,
                         c := CAST(round(value * 100) AS BIGINT)) AS pt,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT event_type, day,
           CAST(count(*) AS BIGINT) AS n_ticks,
           min(pt).c AS open_c,
           CAST(max(cents) AS BIGINT) AS high_c,
           CAST(min(cents) AS BIGINT) AS low_c,
           max(pt).c AS close_c,
           CAST(sum(cents) AS BIGINT) AS gross_c,
           (max(pt).c >= min(pt).c) AS bar_up
    FROM x GROUP BY 1, 2
    """,
    doc="OHLC candlestick downsampling — the standard first/max/min/"
    "last bar aggregation every time-series store ships (ClickHouse "
    "any/max/min/anyLast over ordered buckets, TimescaleDB "
    "time_bucket + first/last): per (event_type, day) the opening "
    "and closing tick, the high/low, tick count and gross sum. "
    "Open/close are selected by lexicographic MIN/MAX over a "
    "(ts, event_id, cents) struct — the (ts, event_id) prefix is "
    "unique, so the pick is total-order deterministic in both "
    "engines with no window pass; everything is exact integer "
    "cents. ONE map-side-combined groupBy aggregate over the scan "
    "(no window, no sort): at 100 TB this is the cheapest possible "
    "shape — partial struct-min/max combine inside each input "
    "partition, only (type, day)-dimension rows ever shuffle.",
)
def time_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100).cast("bigint")
    pt = F.struct(
        F.col("ts").alias("t"), F.col("event_id").alias("e"), cents.alias("c")
    )
    g = (
        e.select(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            pt.alias("pt"),
            cents.alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ticks"),
            F.min("pt").getField("c").alias("open_c"),
            F.max("cents").cast("bigint").alias("high_c"),
            F.min("cents").cast("bigint").alias("low_c"),
            F.max("pt").getField("c").alias("close_c"),
            F.sum("cents").cast("bigint").alias("gross_c"),
        )
    )
    return g.select(
        "event_type",
        "day",
        "n_ticks",
        "open_c",
        "high_c",
        "low_c",
        "close_c",
        "gross_c",
        (F.col("close_c") >= F.col("open_c")).alias("bar_up"),
    )


# --- LTTB downsampling (round 11 continuation) --------------------------

# largestTriangleThreeBuckets output size: first + last + one pick per
# interior bucket. n <= LTTB_OUT series pass through unsampled.
LTTB_OUT = 12
LTTB_B = LTTB_OUT - 2


def _lttb_lo(k: str, n: str = "n") -> str:
    """1-based first interior step of bucket k (SQL text, k 1-based)."""
    return f"(2 + (({k} - 1) * ({n} - 2)) // {LTTB_B})"


def _lttb_hi(k: str, n: str = "n") -> str:
    return f"(1 + ({k} * ({n} - 2)) // {LTTB_B})"


@register(
    "time_lttb_downsample",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    p AS (
      SELECT event_type,
             list(struct_pack(x := CAST(rn AS BIGINT), day := day, y := y)
                  ORDER BY rn) AS pts,
             CAST(count(*) AS BIGINT) AS n
      FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                         ORDER BY day) AS rn FROM d)
      GROUP BY event_type
    ),
    f AS (
      SELECT event_type, pts, n, 0 AS k,
             CAST(1 AS BIGINT) AS ax, pts[1].y AS ay,
             CAST([] AS STRUCT(x BIGINT, day DATE, y BIGINT)[]) AS sel
      FROM p WHERE n > {LTTB_OUT}
      UNION ALL
      SELECT event_type, pts, n, kb,
             best.x AS ax, best.y AS ay,
             list_append(sel, struct_pack(x := best.x, day := best.day,
                                          y := best.y)) AS sel
      FROM (
        SELECT event_type, pts, n, kb, sel,
               list_sort([struct_pack(
                   area := abs(CAST(ax * md - sxd AS HUGEINT)
                                 * CAST(p2.y - ay AS HUGEINT)
                               - CAST(ax - p2.x AS HUGEINT)
                                 * CAST(syd - ay * md AS HUGEINT)),
                   negx := -p2.x, x := p2.x, day := p2.day, y := p2.y)
                 for p2 in pts[lo:hi]])[-1] AS best
        FROM (
          SELECT event_type, pts, n, sel, ax, ay, k + 1 AS kb,
                 {_lttb_lo("(k + 1)")} AS lo,
                 {_lttb_hi("(k + 1)")} AS hi,
                 CASE WHEN k + 1 = {LTTB_B} THEN CAST(1 AS HUGEINT)
                      ELSE CAST({_lttb_hi("(k + 2)")} - {_lttb_lo("(k + 2)")} + 1
                                AS HUGEINT) END AS md,
                 CASE WHEN k + 1 = {LTTB_B} THEN CAST(pts[n].x AS HUGEINT)
                      ELSE CAST(list_sum([p3.x for p3 in
                           pts[{_lttb_lo("(k + 2)")}:{_lttb_hi("(k + 2)")}]])
                           AS HUGEINT) END AS sxd,
                 CASE WHEN k + 1 = {LTTB_B} THEN CAST(pts[n].y AS HUGEINT)
                      ELSE CAST(list_sum([p3.y for p3 in
                           pts[{_lttb_lo("(k + 2)")}:{_lttb_hi("(k + 2)")}]])
                           AS HUGEINT) END AS syd
          FROM f WHERE k < {LTTB_B}
        )
      )
    ),
    sampled AS (
      SELECT event_type, n,
             [pts[1]] || sel || [pts[n]] AS keep
      FROM f WHERE k = {LTTB_B}
      UNION ALL
      SELECT event_type, n, pts AS keep FROM p WHERE n <= {LTTB_OUT}
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           CAST(len(keep) AS BIGINT) AS n_kept,
           array_to_string([CAST(s.x AS VARCHAR) for s in keep], ',') AS steps,
           array_to_string([CAST(s.day AS VARCHAR) for s in keep], ',') AS days,
           array_to_string([CAST(s.y AS VARCHAR) for s in keep], ',') AS cents
    FROM sampled
    """,
    doc="Largest-Triangle-Three-Buckets downsampling of the per-type "
    "daily revenue series to "
    f"{LTTB_OUT} points (ClickHouse largestTriangleThreeBuckets, the "
    "Grafana/plotting standard that preserves visual extremes where "
    "time_downsample_m4 preserves per-bucket min/max/first/last): "
    "first and last points always kept; each interior bucket "
    "contributes the point maximizing the triangle area with the "
    "PREVIOUSLY selected point and the next bucket's centroid — a "
    "left-to-right sequential recurrence. Exactness: with x = step "
    "index and y = integer cents, the area comparison is cleared of "
    "its 1/(2m) denominators — |(ax*m - sx)(py - ay) - (ax - px)"
    "(sy - ay*m)| — so selection is pure integer arithmetic "
    "(HUGEINT / bounded DECIMAL), ties broken toward the smaller "
    "step; no float ever enters. Scale shape: reduce FIRST to the "
    "calendar-bounded daily series (one map-side-combined "
    "aggregate), then ONE codegen higher-order fold per series "
    "carries (prev point, selection) through the "
    f"{LTTB_B} buckets — the holt_winters fold pattern; the oracle "
    "mirrors it with a recursive CTE. Series with n <= "
    f"{LTTB_OUT} pass through unsampled in both engines.",
)
def time_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    d = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("y"))
    series = d.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "y"))).alias("dpts")
    )
    series = series.select(
        "event_type",
        F.transform(
            F.col("dpts"),
            lambda s, i: F.struct(
                (i + 1).cast("bigint").alias("x"),
                s.getField("day").alias("day"),
                s.getField("y").alias("y"),
            ),
        ).alias("pts"),
        F.size("dpts").cast("bigint").alias("n"),
    )

    pts, n = F.col("pts"), F.col("n")
    B = F.lit(LTTB_B)

    def idiv(a: F.Column, b: F.Column) -> F.Column:
        return ((a - a % b) / b).cast("bigint")

    def lo_of(kb: F.Column) -> F.Column:
        return F.lit(2) + idiv((kb - 1) * (n - 2), B)

    def hi_of(kb: F.Column) -> F.Column:
        return F.lit(1) + idiv(kb * (n - 2), B)

    def step(acc: F.Column, k: F.Column) -> F.Column:
        ax, ay, sel = acc.getField("ax"), acc.getField("ay"), acc.getField("sel")
        lo, hi = lo_of(k), hi_of(k)
        bucket = F.slice(pts, lo.cast("int"), (hi - lo + 1).cast("int"))
        is_last = k == LTTB_B
        lo2, hi2 = lo_of(k + 1), hi_of(k + 1)
        nxt = F.slice(pts, lo2.cast("int"), (hi2 - lo2 + 1).cast("int"))
        last_pt = F.element_at(pts, -1)
        # Bounds (documented): steps < 10^5 days, per-day cents < 10^13
        # => every product stays far under the 38-digit decimal cap.
        md = (
            F.when(is_last, F.lit(1)).otherwise(F.size(nxt)).cast("decimal(6,0)")
        )
        sxd = (
            F.when(is_last, last_pt.getField("x"))
            .otherwise(
                F.aggregate(
                    nxt,
                    F.lit(0).cast("bigint"),
                    lambda a2, p3: a2 + p3.getField("x"),
                )
            )
            .cast("decimal(12,0)")
        )
        syd = (
            F.when(is_last, last_pt.getField("y"))
            .otherwise(
                F.aggregate(
                    nxt,
                    F.lit(0).cast("bigint"),
                    lambda a2, p3: a2 + p3.getField("y"),
                )
            )
            .cast("decimal(21,0)")
        )
        axd = ax.cast("decimal(6,0)")
        ayd = ay.cast("decimal(14,0)")
        t1f = (axd * md - sxd).cast("decimal(13,0)")
        b1 = (syd - ayd * md).cast("decimal(22,0)")

        def area(p2: F.Column) -> F.Column:
            ydiff = (p2.getField("y") - ay).cast("decimal(15,0)")
            xdiff = (ax - p2.getField("x")).cast("decimal(6,0)")
            return F.abs(t1f * ydiff - xdiff * b1)

        scored = F.transform(
            bucket,
            lambda p2: F.struct(
                area(p2).alias("area"),
                (-p2.getField("x")).alias("negx"),
                p2.getField("x").alias("x"),
                p2.getField("day").alias("day"),
                p2.getField("y").alias("y"),
            ),
        )
        best = F.array_max(scored)
        pick = F.struct(
            best.getField("x").alias("x"),
            best.getField("day").alias("day"),
            best.getField("y").alias("y"),
        )
        return F.struct(
            best.getField("x").alias("ax"),
            best.getField("y").alias("ay"),
            F.concat(sel, F.array(pick)).alias("sel"),
        )

    init = F.struct(
        F.lit(1).cast("bigint").alias("ax"),
        F.element_at(pts, 1).getField("y").alias("ay"),
        F.slice(pts, 1, 0).alias("sel"),
    )
    folded = F.aggregate(F.sequence(F.lit(1), F.lit(LTTB_B)), init, step)
    keep = F.when(n <= LTTB_OUT, pts).otherwise(
        F.concat(
            F.array(F.element_at(pts, 1)),
            folded.getField("sel"),
            F.array(F.element_at(pts, -1)),
        )
    )
    return series.select(
        "event_type",
        n.alias("n_days"),
        F.size(keep).cast("bigint").alias("n_kept"),
        F.array_join(
            F.transform(keep, lambda s: s.getField("x").cast("string")), ","
        ).alias("steps"),
        F.array_join(
            F.transform(keep, lambda s: s.getField("day").cast("string")), ","
        ).alias("days"),
        F.array_join(
            F.transform(keep, lambda s: s.getField("y").cast("string")), ","
        ).alias("cents"),
    )


# --- dominant-period detection (round 11 continuation) ------------------

# Candidate periods (days) for the spectral scan; 7/14 are the
# weekly-cycle candidates real traffic shows (the synthetic corpus has
# none — period 2, the Nyquist alternation of flat noise, wins there,
# which is itself the honest reading).
DFT_PERIODS = (2, 3, 4, 5, 6, 7, 8, 9, 10, 14)
# cos/sin of 2*pi*r/p quantized ONCE in Python to integer micro-units
# and injected as the same literal table into both engines (the
# sim_ndcg_eval discipline): the Goertzel-style power at period p needs
# only the per-residue-class sums, so no engine ever calls cos/sin and
# the whole spectrum is exact integer arithmetic.
DFT_COEF = [
    (p, r, round(math.cos(2 * math.pi * r / p) * 1_000_000),
     round(math.sin(2 * math.pi * r / p) * 1_000_000))
    for p in DFT_PERIODS
    for r in range(p)
]
_DFT_COEF_SQL = ",".join(f"({p},{r},{c},{s})" for p, r, c, s in DFT_COEF)


@register(
    "time_dominant_period",
    oracle=f"""
    WITH d AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
               AS t,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS sx
      FROM d
    ),
    coef(p, r, cmu, smu) AS (VALUES {_DFT_COEF_SQL}),
    res AS (
      SELECT s.event_type, c.p, c.r, max(c.cmu) AS cmu, max(c.smu) AS smu,
             CAST(sum(s.n * s.x - s.sx) AS BIGINT) AS yr,
             max(s.n) AS n
      FROM s JOIN coef c ON c.r = s.t % c.p
      GROUP BY s.event_type, c.p, c.r
    ),
    pw AS (
      SELECT event_type, p AS period, max(n) AS n_days,
             CAST(sum(cmu * yr) AS BIGINT) AS a_mu,
             CAST(sum(smu * yr) AS BIGINT) AS b_mu
      FROM res GROUP BY event_type, p
    )
    SELECT event_type, CAST(period AS BIGINT) AS period, n_days, a_mu, b_mu,
           CAST(CAST(a_mu AS DECIMAL(18,0)) * a_mu
                + CAST(b_mu AS DECIMAL(18,0)) * b_mu AS VARCHAR) AS power_str,
           CAST(row_number() OVER (
             PARTITION BY event_type
             ORDER BY CAST(a_mu AS DECIMAL(18,0)) * a_mu
                      + CAST(b_mu AS DECIMAL(18,0)) * b_mu DESC, period)
             AS BIGINT) AS power_rank
    FROM pw
    """,
    doc="Dominant-period detection over the per-type daily series — "
    "the seasonality scan behind 'is this metric weekly-cyclic?' "
    "(feeds the m choice of time_holt_winters and the window of "
    "time_seasonal_decompose). Spectral power at each candidate "
    "period via the residue-class identity: cos(2 pi t/p) depends "
    "only on t mod p, so the DFT projection collapses to "
    "sum_r coef[p,r] * S_r over the p per-residue sums — the "
    "coefficients are quantized once in Python to integer "
    "micro-units and shipped as the SAME literal table to both "
    "engines (no engine ever evaluates cos/sin), and the series is "
    "mean-centered exactly by the scaled identity y = n*x - sum(x). "
    "Everything through the power ranking is exact integer/decimal "
    "arithmetic; power itself is emitted as a STRING because a "
    "30-digit decimal must not decay to float in either engine's "
    "output path. Shape: one day-bucket reduce, one broadcast join "
    "against the 68-row coefficient table, two "
    "dimension-bounded aggregates — the fact table is scanned "
    "once.",
)
def time_dominant_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    d = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    wt = Window.partitionBy("event_type").orderBy("day")
    wa = Window.partitionBy("event_type")
    s = d.select(
        "event_type",
        "x",
        (F.row_number().over(wt) - 1).alias("t"),
        F.count(F.lit(1)).over(wa).cast("bigint").alias("n"),
        F.sum("x").over(wa).cast("bigint").alias("sx"),
    )
    coef = spark.createDataFrame(
        DFT_COEF, "p int, r int, cmu bigint, smu bigint"
    )
    res = (
        s.join(F.broadcast(coef), F.col("r") == F.col("t") % F.col("p"))
        .groupBy("event_type", "p", "r")
        .agg(
            F.max("cmu").alias("cmu"),
            F.max("smu").alias("smu"),
            F.sum(F.col("n") * F.col("x") - F.col("sx"))
            .cast("bigint")
            .alias("yr"),
            F.max("n").alias("n"),
        )
    )
    pw = res.groupBy("event_type", F.col("p").alias("period")).agg(
        F.max("n").alias("n_days"),
        F.sum(F.col("cmu") * F.col("yr")).cast("bigint").alias("a_mu"),
        F.sum(F.col("smu") * F.col("yr")).cast("bigint").alias("b_mu"),
    )
    power = F.col("a_mu").cast("decimal(18,0)") * F.col("a_mu") + F.col(
        "b_mu"
    ).cast("decimal(18,0)") * F.col("b_mu")
    wr = Window.partitionBy("event_type").orderBy(power.desc(), "period")
    return pw.select(
        "event_type",
        F.col("period").cast("bigint").alias("period"),
        "n_days",
        "a_mu",
        "b_mu",
        power.cast("string").alias("power_str"),
        F.row_number().over(wr).cast("bigint").alias("power_rank"),
    )


# --- dynamic time warping (round 11 continuation) -----------------------


@register(
    "time_dtw_distance",
    oracle="""
    WITH RECURSIVE d AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    ser AS (
      SELECT event_type, list(x ORDER BY day) AS xs,
             CAST(count(*) AS BIGINT) AS n
      FROM d GROUP BY event_type
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.xs AS xs, b.xs AS ys, a.n AS n, b.n AS m
      FROM ser a JOIN ser b ON a.event_type < b.event_type
    ),
    f AS (
      SELECT type_a, type_b, xs, ys, n, m, CAST(0 AS BIGINT) AS k,
             [abs(xs[1] - ys[1])] AS dp
      FROM pairs
      UNION ALL
      SELECT type_a, type_b, xs, ys, n, m, k + 1,
             list_append(dp,
               abs(xs[(k + 1) // m + 1] - ys[(k + 1) % m + 1])
               + CASE
                   WHEN (k + 1) // m = 0 THEN dp[k + 1]
                   WHEN (k + 1) % m = 0 THEN dp[k + 1 - m + 1]
                   ELSE least(dp[k + 1], dp[k + 1 - m + 1], dp[k + 1 - m])
                 END) AS dp
      FROM f WHERE k < n * m - 1
    )
    SELECT type_a, type_b, n AS n_a, m AS n_b,
           dp[n * m] AS dtw,
           round(CAST(dp[n * m] AS DOUBLE) / (n + m), 6) AS dtw_normalized
    FROM f WHERE k = n * m - 1
    """,
    doc="Dynamic-time-warping distance between every pair of per-type "
    "daily series — the elastic similarity measure that matches "
    "shifted/stretched shapes where a pointwise L1 would punish a "
    "one-day lag (the clustering/nearest-neighbor metric of choice "
    "for calendar series). Full O(n*m) DP with |a - b| cost on "
    "exact integer daily counts: both engines run the SAME "
    "flattened recurrence — cell k (row-major) = cost + "
    "min(left, up, diag) over the append-only DP list — Spark as "
    "one codegen higher-order fold over sequence(0, n*m-1) per "
    "pair, DuckDB as the mirroring recursive CTE; every value is "
    "BIGINT, so the distance hashes identically. Scale shape: the "
    "fact table reduces FIRST to the calendar-bounded series (one "
    "map-side-combined aggregate); the DP runs on day-dimension "
    "arrays (n*m cells per pair, pairs = type-dimension choose 2), "
    "never on fact rows — at 100 TB the DP cost is unchanged while "
    "the reduce scan parallelizes.",
)
def time_dtw_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    d = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    ser = d.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "x"))),
            lambda s: s.getField("x"),
        ).alias("xs"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    a = ser.select(
        F.col("event_type").alias("type_a"), F.col("xs").alias("xs"), F.col("n").alias("n")
    )
    b = ser.select(
        F.col("event_type").alias("type_b"), F.col("xs").alias("ys"), F.col("n").alias("m")
    )
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))

    xs, ys, n, m = F.col("xs"), F.col("ys"), F.col("n"), F.col("m")

    def cost(k: F.Column) -> F.Column:
        i, j = ((k - k % m) / m).cast("bigint"), k % m
        return F.abs(
            F.element_at(xs, (i + 1).cast("int"))
            - F.element_at(ys, (j + 1).cast("int"))
        )

    def merge(dp: F.Column, k: F.Column) -> F.Column:
        i, j = ((k - k % m) / m).cast("bigint"), k % m
        ksz = F.size(dp)  # == k (cells 0..k-1 stored at 1..k)
        left = F.element_at(dp, ksz)
        up = F.element_at(dp, (ksz - m + 1).cast("int"))
        diag = F.element_at(dp, (ksz - m).cast("int"))
        prev = (
            F.when((i == 0) & (j == 0), F.lit(0).cast("bigint"))
            .when(i == 0, left)
            .when(j == 0, up)
            .otherwise(F.least(left, up, diag))
        )
        return F.concat(dp, F.array(cost(k) + prev))

    dp = F.aggregate(
        F.sequence(F.lit(0), (n * m - 1).cast("int")),
        F.slice(F.array(F.lit(0).cast("bigint")), 1, 0),
        merge,
    )
    dtw = F.element_at(dp, (n * m).cast("int"))
    return pairs.select(
        "type_a",
        "type_b",
        n.alias("n_a"),
        m.alias("n_b"),
        dtw.alias("dtw"),
        F.round(dtw.cast("double") / (n + m).cast("double"), 6).alias(
            "dtw_normalized"
        ),
    )


# --- Bollinger-band breach detection (round 11 continuation) ------------

BOLL_W = 20  # SMA window (days, current row inclusive)
BOLL_K = 2  # band half-width in sample standard deviations


@register(
    "time_bollinger_breach",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT day, x,
             CAST(sum(x) OVER fr AS DECIMAL(25,0)) AS s,
             CAST(sum(CAST(x AS DECIMAL(18,0)) * x) OVER fr
                  AS DECIMAL(30,0)) AS q,
             CAST(count(*) OVER fr AS BIGINT) AS n
      FROM daily
      WINDOW fr AS (ORDER BY day
                    ROWS BETWEEN {BOLL_W - 1} PRECEDING AND CURRENT ROW)
    ),
    t AS (
      SELECT day, x, s, q, n,
             CAST(CAST(x AS HUGEINT) * n - CAST(s AS HUGEINT) AS HUGEINT)
               AS dev_n,
             CAST({BOLL_K * BOLL_K} AS HUGEINT) * n
               * (CAST(n AS HUGEINT) * CAST(q AS HUGEINT)
                  - CAST(s AS HUGEINT) * CAST(s AS HUGEINT))
               AS band_sq
      FROM w WHERE n = {BOLL_W}
    )
    SELECT day, x,
           round(CAST(s AS DOUBLE) / n, 6) AS sma,
           round(sqrt(CAST((n * q - s * s) AS DOUBLE) / (n * (n - 1))), 6)
             AS sigma,
           CASE WHEN dev_n > 0
                 AND dev_n * dev_n * (n - 1) > band_sq THEN 'upper'
                WHEN dev_n < 0
                 AND dev_n * dev_n * (n - 1) > band_sq THEN 'lower'
                ELSE 'inside' END AS band_position
    FROM t
    """,
    doc="Bollinger-band breach detection over the daily revenue "
    f"series (SMA{BOLL_W} +/- {BOLL_K} sample standard deviations): "
    "the volatility-normalized outlier flag traders and SRE burn-"
    "rate alerts both use — 'is today extreme RELATIVE TO its own "
    "recent volatility', where a fixed threshold would misfire "
    "across regimes; every warmed-up day is emitted with its band "
    "position so the gate exercises real values even when nothing "
    "breaches. The BREACH TEST never touches a float: "
    "|x - s/n| > k*sigma is cross-multiplied to "
    "(x*n - s)^2 * (n-1) > k^2 * n * (n*q - s^2) over exact window "
    "sums of integer cents — 38-cap DECIMAL in Spark, HUGEINT in "
    "the oracle (a DIVIDED band decays to DOUBLE in DuckDB, the "
    "round-11 review catch) — so the flagged set hashes identically; "
    "displayed sma/sigma are presentation-only rounded doubles. "
    "Warm-up rows are excluded by frame COUNT, not dates. One "
    "day-bucket reduce then ROWS-frame windows over the calendar-"
    "bounded series — scan-bound at any fact scale.",
)
def time_bollinger_breach(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    daily = e.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("x")
    )
    fr = Window.orderBy("day").rowsBetween(-(BOLL_W - 1), 0)
    w = daily.select(
        "day",
        "x",
        F.sum("x").over(fr).cast("decimal(25,0)").alias("s"),
        F.sum(F.col("x").cast("decimal(18,0)") * F.col("x"))
        .over(fr)
        .cast("decimal(30,0)")
        .alias("q"),
        F.count(F.lit(1)).over(fr).cast("bigint").alias("n"),
    ).filter(F.col("n") == BOLL_W)
    dev_n = F.col("x").cast("decimal(25,0)") * F.col("n") - F.col("s")
    # cross-multiplied by n^2 (n-1): dev^2 (n-1) > k^2 n (nq - s^2) —
    # Spark evaluates both sides in 38-cap DECIMAL (values < 10^32,
    # exact at scale 0); the oracle mirrors in HUGEINT. A divided
    # band would decay to DOUBLE in DuckDB (round-11 review finding).
    band_sq = (
        F.lit(BOLL_K * BOLL_K).cast("decimal(25,0)")
        * F.col("n")
        * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
    )
    t = w.select(
        "day",
        "x",
        "s",
        "q",
        "n",
        dev_n.alias("dev_n"),
        band_sq.alias("band_sq"),
    )
    over = (
        F.col("dev_n") * F.col("dev_n") * (F.col("n") - 1) > F.col("band_sq")
    )
    return t.select(
        "day",
        "x",
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("sma"),
        F.round(
            F.sqrt(
                (F.col("n") * F.col("q") - F.col("s") * F.col("s")).cast("double")
                / (F.col("n") * (F.col("n") - 1)).cast("double")
            ),
            6,
        ).alias("sigma"),
        F.when((F.col("dev_n") > 0) & over, "upper")
        .when((F.col("dev_n") < 0) & over, "lower")
        .otherwise("inside")
        .alias("band_position"),
    )


# --- alpha-beta (g-h) tracking filter (round 12) ------------------------

# Fixed-point g-h tracker: gains g = 1/4, h = 1/16 applied with
# TRUNCATED integer division (toward zero — `r - r % 4` keeps the
# dividend's sign in BOTH engines, unlike DuckDB's floor-dividing
# `//`), the embedded-systems fixed-point idiom. Every state value is
# an exact BIGINT in cents, so the whole trajectory hash-checks.
AB_G_DEN = 4  # level gain 1/4
AB_H_DEN = 16  # velocity gain 1/16


@register(
    "time_alpha_beta_filter",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT o_orderpriority AS pri, o_orderdate AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS z
      FROM orders GROUP BY 1, 2
    ),
    s AS (
      SELECT pri, z,
             row_number() OVER (PARTITION BY pri ORDER BY day) AS step,
             count(*) OVER (PARTITION BY pri) AS n_days
      FROM d
    ),
    fold AS (
      SELECT pri, step, n_days, z AS x, CAST(0 AS BIGINT) AS v,
             CAST(0 AS BIGINT) AS sar, CAST(0 AS BIGINT) AS mar
      FROM s WHERE step = 1
      UNION ALL
      SELECT s.pri, s.step, s.n_days,
             CAST(f.x + f.v + CAST(((s.z - f.x - f.v)
                    - (s.z - f.x - f.v) % {AB_G_DEN}) / {AB_G_DEN}
                  AS BIGINT) AS BIGINT) AS x,
             CAST(f.v + CAST(((s.z - f.x - f.v)
                    - (s.z - f.x - f.v) % {AB_H_DEN}) / {AB_H_DEN}
                  AS BIGINT) AS BIGINT) AS v,
             CAST(f.sar + abs(s.z - f.x - f.v) AS BIGINT) AS sar,
             CAST(greatest(f.mar, abs(s.z - f.x - f.v)) AS BIGINT) AS mar
      FROM fold f JOIN s ON s.pri = f.pri AND s.step = f.step + 1
    )
    SELECT pri AS o_orderpriority, CAST(n_days AS BIGINT) AS n_days,
           x AS level_cents, v AS vel_cents,
           sar AS sum_abs_resid, mar AS max_abs_resid
    FROM fold WHERE step = n_days
    """,
    doc="Alpha-beta (g-h) tracking filter over each order priority's "
    "daily revenue — the fixed-gain Kalman cousin every telemetry "
    "/ SLA tracker runs when a full Kalman's covariance updates "
    "are overkill: predict level+velocity, correct by gains g=1/4, "
    "h=1/16 of the residual. EXACT fixed-point arithmetic: state "
    "in integer cents, gains applied by truncated division "
    "(r - r % 4, keeping the dividend's sign identically in Spark "
    "and DuckDB — their % agree; a bare // would floor-diverge on "
    "negative residuals), so level, velocity, and the tracking-"
    "error summaries (sum/max |residual|) hash bit-for-bit. Shape: "
    "ONE map-side-combined day-bucket reduce touches the fact "
    "table, then the fold runs per key over the calendar-bounded "
    "series (Spark: codegen higher-order aggregate over the sorted "
    "day array, the time_holt_linear contract; oracle: recursive "
    "CTE) — O(days) state per key, scan-bound at 100 TB.",
)
def time_alpha_beta_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    d = o.groupBy(
        F.col("o_orderpriority").alias("pri"), F.col("o_orderdate").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("z")
    )
    series = d.groupBy("pri").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "z"))),
            lambda s: s.getField("z"),
        ).alias("zs")
    )
    init = F.struct(
        F.lit(0).cast("bigint").alias("x"),
        F.lit(0).cast("bigint").alias("v"),
        F.lit(0).cast("bigint").alias("sar"),
        F.lit(0).cast("bigint").alias("mar"),
        F.lit(False).alias("started"),
    )

    def trunc_div(r, den):
        return ((r - r % F.lit(den)) / F.lit(den)).cast("long")

    def step(acc, z):
        x, v = acc.getField("x"), acc.getField("v")
        r = z - x - v
        nx = (x + v + trunc_div(r, AB_G_DEN)).cast("long")
        nv = (v + trunc_div(r, AB_H_DEN)).cast("long")
        return F.when(
            acc.getField("started"),
            F.struct(
                nx.alias("x"),
                nv.alias("v"),
                (acc.getField("sar") + F.abs(r)).cast("long").alias("sar"),
                F.greatest(acc.getField("mar"), F.abs(r)).cast("long").alias("mar"),
                F.lit(True).alias("started"),
            ),
        ).otherwise(
            F.struct(
                z.cast("long").alias("x"),
                F.lit(0).cast("long").alias("v"),
                F.lit(0).cast("long").alias("sar"),
                F.lit(0).cast("long").alias("mar"),
                F.lit(True).alias("started"),
            )
        )

    folded = series.select(
        F.col("pri"),
        F.size("zs").cast("bigint").alias("n_days"),
        F.aggregate("zs", init, step).alias("st"),
    )
    return folded.select(
        F.col("pri").alias("o_orderpriority"),
        "n_days",
        F.col("st").getField("x").alias("level_cents"),
        F.col("st").getField("v").alias("vel_cents"),
        F.col("st").getField("sar").alias("sum_abs_resid"),
        F.col("st").getField("mar").alias("max_abs_resid"),
    )


# --- spectral entropy of the candidate-period spectrum (round 12) -------

# Concentration verdict: the spectrum is "peaked" when the dominant
# period holds more than CONC_NUM/CONC_DEN of total power (1/3 rather
# than 1/2 so the near-noise fixture exercises BOTH verdicts).
CONC_NUM, CONC_DEN = 1, 3


@register(
    "time_spectral_entropy",
    oracle=f"""
    WITH d AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, x,
             row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
               AS t,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS sx
      FROM d
    ),
    coef(p, r, cmu, smu) AS (VALUES {{_DFT_COEF_SQL}}),
    res AS (
      SELECT s.event_type, c.p, c.r, max(c.cmu) AS cmu, max(c.smu) AS smu,
             CAST(sum(s.n * s.x - s.sx) AS BIGINT) AS yr
      FROM s JOIN coef c ON c.r = s.t % c.p
      GROUP BY s.event_type, c.p, c.r
    ),
    pw AS (
      -- products promoted to HUGEINT BEFORE the sum: cmu*yr in BIGINT
      -- could overflow loudly here and silently (wraparound) on the
      -- Spark side (round-12 review catch)
      SELECT event_type, p AS period,
             CAST(sum(CAST(cmu AS HUGEINT) * yr)
                    * sum(CAST(cmu AS HUGEINT) * yr)
                  + sum(CAST(smu AS HUGEINT) * yr)
                    * sum(CAST(smu AS HUGEINT) * yr)
                  AS HUGEINT) AS power
      FROM res GROUP BY event_type, p
    ),
    tot AS (
      SELECT event_type, period, power,
             CAST(sum(power) OVER (PARTITION BY event_type) AS HUGEINT)
               AS total
      FROM pw
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_periods,
           CAST(max(total) AS VARCHAR) AS total_power_str,
           CAST(max(power) AS VARCHAR) AS max_power_str,
           CAST((min(struct_pack(a := -power, b := period))).b AS BIGINT)
             AS dominant_period,
           CAST(sum(CAST(CASE WHEN power = 0 THEN 0 ELSE
                  round(-(CAST(power AS DOUBLE) / CAST(total AS DOUBLE))
                        * ln(CAST(power AS DOUBLE) / CAST(total AS DOUBLE)),
                        9) END AS DECIMAL(18,9))) AS DOUBLE) AS entropy_nats,
           (max(power) * {CONC_DEN} > {CONC_NUM} * max(total))
             AS is_concentrated
    FROM tot GROUP BY event_type
    """.replace("{_DFT_COEF_SQL}", _DFT_COEF_SQL),
    doc="Spectral entropy of each stream's candidate-period power "
    "spectrum — the single-number 'is this series periodic or "
    "noisy?' gauge (low entropy = one period dominates = "
    "forecastable; high = white-noise-like), the feature a 100 TB "
    "metric warehouse computes per series to ROUTE between "
    "seasonal and naive forecasters (time_holt_winters vs "
    "time_forecast_backtest_naive). Powers come from the "
    "time_dominant_period residue-class DFT (quantized trig "
    "literals, exact HUGEINT/DECIMAL integer powers); the "
    "CONCENTRATION VERDICT (dominant period holds > 1/3 of total "
    "power) and the dominant-period argmax are decided entirely in "
    "exact integer arithmetic with struct-ordered tie-breaks. The "
    "displayed entropy uses the cookbook's sanctioned per-row "
    "ln discipline: each term is one IEEE division + ln rounded to "
    "9dp BEFORE an order-invariant DECIMAL(18,9) sum, so both "
    "engines emit the identical double. Shape: one day-bucket "
    "reduce, one broadcast coefficient join, dimension-bounded "
    "aggregates (types x 10 periods) — fact scan happens once.",
)
def time_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    d = e.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    wt = Window.partitionBy("event_type").orderBy("day")
    wa = Window.partitionBy("event_type")
    s = d.select(
        "event_type",
        "x",
        (F.row_number().over(wt) - 1).alias("t"),
        F.count(F.lit(1)).over(wa).cast("bigint").alias("n"),
        F.sum("x").over(wa).cast("bigint").alias("sx"),
    )
    coef = spark.createDataFrame(DFT_COEF, "p int, r int, cmu bigint, smu bigint")
    res = (
        s.join(F.broadcast(coef), F.col("r") == F.col("t") % F.col("p"))
        .groupBy("event_type", "p", "r")
        .agg(
            F.max("cmu").alias("cmu"),
            F.max("smu").alias("smu"),
            F.sum(F.col("n") * F.col("x") - F.col("sx"))
            .cast("bigint")
            .alias("yr"),
        )
    )
    # products promoted to DECIMAL before the sum — an int64 cmu*yr
    # sum would wrap SILENTLY in Spark while DuckDB promotes to
    # HUGEINT (round-12 review catch). OPERAND BOUND: |cmu| <= 1e6 and
    # |yr| <= N * max_daily_count, so the decimal(18,0)*bigint product
    # (cap 38) is exact to |yr| ~ 1e19 and the summed a_mu/b_mu keep
    # the squared power inside 38 digits to per-type volumes ~ 1e8
    # events/day across a 7-year calendar — far past the fixture and
    # any single-month partition.
    a_mu = F.sum(F.col("cmu").cast("decimal(18,0)") * F.col("yr"))
    b_mu = F.sum(F.col("smu").cast("decimal(18,0)") * F.col("yr"))
    pw = res.groupBy("event_type", F.col("p").alias("period")).agg(
        (
            a_mu.cast("decimal(38,0)") * a_mu
            + b_mu.cast("decimal(38,0)") * b_mu
        ).alias("power")
    )
    tot = pw.select(
        "event_type",
        "period",
        "power",
        F.sum("power").over(Window.partitionBy("event_type")).alias("total"),
    )
    p_frac = F.col("power").cast("double") / F.col("total").cast("double")
    term = F.when(F.col("power") == 0, F.lit(0.0)).otherwise(
        F.round(-p_frac * F.log(p_frac), 9)
    )
    return tot.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_periods"),
        F.max("total").cast("string").alias("total_power_str"),
        F.max("power").cast("string").alias("max_power_str"),
        F.min(F.struct((-F.col("power")).alias("a"), F.col("period").alias("b")))
        .getField("b")
        .cast("bigint")
        .alias("dominant_period"),
        F.sum(term.cast("decimal(18,9)")).cast("double").alias("entropy_nats"),
        (
            F.max("power") * F.lit(CONC_DEN)
            > F.lit(CONC_NUM).cast("decimal(38,0)") * F.max("total")
        ).alias("is_concentrated"),
    )


# --- exponentially-decayed engagement score (round 12, wave-5 queue) ------

# Per-day decay factor 7/8, quantized ONCE in Python to integer
# micro-units per integer age (the quantized-libm discipline): both
# engines join the SAME literal (age, weight) table, so every score is
# an exact BIGINT sum of cents x micro-weights.
DECAY_NUM, DECAY_DEN = 7, 8
DECAY_MAX_AGE = 63
DECAY_W = [
    (d, round((DECAY_NUM / DECAY_DEN) ** d * 1_000_000))
    for d in range(DECAY_MAX_AGE + 1)
]
_DECAY_SQL = ",".join(f"({d},{w})" for d, w in DECAY_W)


@register(
    "events_decay_weighted_score",
    oracle=f"""
    WITH d AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2
    ),
    anchor AS (SELECT max(day) AS d0 FROM d),
    decay(age, w) AS (VALUES {_DECAY_SQL}),
    scored AS (
      SELECT user_id, n, cents,
             datediff('day', day, d0) AS age
      FROM d CROSS JOIN anchor
    )
    SELECT user_id,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           -- LEFT join + weight 0: an event older than the table's
           -- horizon stops scoring but MUST keep counting in
           -- n_events/total_cents (review catch: an inner join would
           -- silently drop it from both, and even vanish users whose
           -- events are all old)
           CAST(sum(cents * coalesce(w, 0)) AS BIGINT) AS score_micro,
           round(CAST(sum(cents * coalesce(w, 0)) AS DOUBLE) / 1e6 / 100, 6)
             AS decayed_value
    FROM scored LEFT JOIN decay ON decay.age = scored.age
    GROUP BY user_id
    """,
    doc="Exponentially time-decayed engagement score per user (daily "
    "decay 7/8, ~5.4-day half-life) — the recency-weighted feature "
    "every feature store and churn model keeps warm, where "
    "yesterday's purchase outweighs last month's. Determinism: the "
    "decay curve is quantized ONCE in Python to a 64-row literal "
    "(age, micro-weight) table injected into BOTH engines (the "
    "sim_ndcg_eval / dominant-period discipline) — no engine ever "
    "evaluates pow() — and every score is an exact BIGINT sum of "
    "cents x micro-weights; the displayed dollar value is "
    "presentation-only. Events beyond the 63-day horizon score 0 "
    "via a LEFT join (never an inner join, which would silently "
    "drop them from n_events/total_cents — round-12 review catch). "
    "Shape: one (user, day) reduce over the facts, a 1-row anchor "
    "broadcast, a 64-row decay-table "
    "broadcast equi-join on age, one user rollup — scan-bound, and "
    "the incremental form (multiply yesterday's store by 7/8, add "
    "today) drops into the streaming agg stores.",
)
def events_decay_weighted_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    d = e.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )
    anchor = d.agg(F.max("day").alias("d0"))
    decay = spark.createDataFrame(DECAY_W, "age int, w bigint")
    scored = d.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        "n",
        "cents",
        F.datediff(F.col("d0"), F.col("day")).alias("age"),
    )
    j = scored.join(F.broadcast(decay), "age", "left")
    wz = F.coalesce(F.col("w"), F.lit(0).cast("bigint"))
    return j.groupBy("user_id").agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum(F.col("cents") * wz).cast("bigint").alias("score_micro"),
        F.round(
            F.sum(F.col("cents") * wz).cast("double") / 1e6 / 100, 6
        ).alias("decayed_value"),
    )


# --- maximum drawdown (round 12, wave-5 queue) ---------------------------


@register(
    "time_max_drawdown",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority AS pri, o_orderdate AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS z
      FROM orders GROUP BY 1, 2
    ),
    dd AS (
      -- drawdown of the daily revenue LEVEL (a cumulative-revenue
      -- curve over all-positive flows is monotone and never draws
      -- down): decline from the best day seen so far
      SELECT pri, day, z,
             CAST(max(z) OVER (PARTITION BY pri ORDER BY day)
                  AS BIGINT) AS peak,
             CAST(max(z) OVER (PARTITION BY pri ORDER BY day)
                  AS BIGINT) - z AS drawdown
      FROM d
    )
    SELECT pri AS o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(peak) AS BIGINT) AS peak_cents,
           CAST(max(drawdown) AS BIGINT) AS max_drawdown_cents,
           CAST((min(struct_pack(a := -drawdown, b := day))).b AS DATE)
             AS trough_day
    FROM dd GROUP BY pri
    """,
    doc="Maximum drawdown of each priority's DAILY revenue level — "
    "the largest decline from the best day seen so far, the risk "
    "metric every treasury/finance warehouse tracks and the same "
    "shape as an SLO error-budget burn monitor (a cumulative curve "
    "over all-positive flows would be monotone, so the level "
    "series is the honest domain here). Exact integers end to "
    "end: running peaks in cents over ONE key-partitioned ordered "
    "window, drawdown "
    "= peak - cum, and the trough day comes from the "
    "struct-ordered min with the day tie-break. Shape: one "
    "day-bucket reduce touches the facts, then calendar-bounded "
    "windows per key — scan-bound at 100 TB.",
)
def time_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    d = o.groupBy(
        F.col("o_orderpriority").alias("pri"), F.col("o_orderdate").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("z")
    )
    w = Window.partitionBy("pri").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    dd = d.select(
        "pri",
        "day",
        "z",
        F.max("z").over(w).cast("bigint").alias("peak"),
        (F.max("z").over(w).cast("bigint") - F.col("z")).alias("drawdown"),
    )
    return dd.groupBy(F.col("pri").alias("o_orderpriority")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.max("peak").cast("bigint").alias("peak_cents"),
        F.max("drawdown").cast("bigint").alias("max_drawdown_cents"),
        F.min(F.struct((-F.col("drawdown")).alias("a"), F.col("day").alias("b")))
        .getField("b")
        .cast("date")
        .alias("trough_day"),
    )


# --- matrix profile over the daily revenue series (round 13) -------------

# Subsequence window length (days) and the trivial-match exclusion
# zone |i - j| >= MP_W (self-overlapping windows are near-identical by
# construction; the classic profile excludes them).
MP_W = 4


@register(
    "time_matrix_profile",
    oracle=f"""
    WITH d AS (
      SELECT o_orderdate AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS z
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT day, z, row_number() OVER (ORDER BY day) AS idx,
             lead(z, 1) OVER (ORDER BY day) AS z1,
             lead(z, 2) OVER (ORDER BY day) AS z2,
             lead(z, 3) OVER (ORDER BY day) AS z3
      FROM d
    ),
    w AS (
      SELECT idx, day, [z, z1, z2, z3] AS v FROM s WHERE z3 IS NOT NULL
    ),
    p AS (
      SELECT a.idx AS ia, a.day, b.idx AS ib,
             list_sum(list_transform(range(1, {MP_W + 1}),
                      i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))) AS dist2
      FROM w a JOIN w b ON abs(a.idx - b.idx) >= {MP_W}
    ),
    prof AS (
      SELECT ia, day,
             min(struct_pack(a := dist2, b := ib)) AS nn
      FROM p GROUP BY 1, 2
    )
    SELECT ia AS idx, day,
           CAST(nn.b AS BIGINT) AS nn_idx,
           CAST(nn.a AS BIGINT) AS nn_dist,
           CAST(row_number() OVER (ORDER BY nn.a DESC, ia) AS BIGINT)
             AS discord_rank
    FROM prof
    """,
    doc=f"Matrix profile of the daily-revenue series (Yeh et al.): for "
    f"every {MP_W}-day window, the exact integer squared-L2 distance "
    "to its nearest non-overlapping neighbor window and that "
    "neighbor's index — the one structure that answers both motif "
    "discovery (smallest profile values: the most repeated revenue "
    "shapes) and discord/anomaly detection (largest: discord_rank 1 "
    "is the most anomalous window in seven years of data). "
    "Deliberately the NON-normalized integer profile: z-normalized "
    "MP needs per-window float mean/std (rows-only territory); raw "
    "cents keep every distance exact and the argmin deterministic "
    f"(struct min with the neighbor-index tiebreak). Exclusion zone "
    f"|i-j| >= {MP_W} removes trivial self-overlap matches. OPERAND "
    "BOUND: per-dim diff^2 * w stays in BIGINT to ~$150M/day in "
    "cents; larger deployments switch units to dollars. Shape: ONE "
    "day-bucket reduce touches the facts; the all-pairs stage is a "
    "deliberate CALENDAR-BOUNDED nested-loop self-join of the "
    "~2,400-row window dimension (sanctioned in test_plan_lint.py — "
    "constant work regardless of fact volume, exactly like "
    "time_dtw_distance's series pairs), then one min-struct reduce. "
    "At 100 TB only the first aggregate sees data.",
)
def time_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("z")
    )
    # single-partition ordered window: the series is calendar-bounded
    # (~2,400 rows at ANY scale factor), the documented exception to
    # the partitioned-window rule (same as the PPS cumulative window)
    w_ord = Window.orderBy("day")
    s = d.select(
        "day",
        "z",
        F.row_number().over(w_ord).alias("idx"),
        *[F.lead("z", k).over(w_ord).alias(f"z{k}") for k in range(1, MP_W)],
    )
    win = s.filter(F.col(f"z{MP_W - 1}").isNotNull()).select(
        "idx",
        "day",
        F.array(F.col("z"), *[F.col(f"z{k}") for k in range(1, MP_W)]).alias("v"),
    )
    a = win.select(F.col("idx").alias("ia"), "day", F.col("v").alias("va"))
    b = win.select(F.col("idx").alias("ib"), F.col("v").alias("vb"))
    pairs = a.join(
        F.broadcast(b), F.abs(F.col("ia") - F.col("ib")) >= MP_W
    )
    dist2 = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    prof = (
        pairs.select("ia", "day", "ib", dist2.alias("dist2"))
        .groupBy("ia", "day")
        .agg(
            F.min(
                F.struct(F.col("dist2").alias("a"), F.col("ib").alias("b"))
            ).alias("nn")
        )
    )
    w_rank = Window.orderBy(F.col("nn.a").desc(), "ia")
    return prof.select(
        F.col("ia").alias("idx"),
        "day",
        F.col("nn.b").cast("bigint").alias("nn_idx"),
        F.col("nn.a").cast("bigint").alias("nn_dist"),
        F.row_number().over(w_rank).cast("bigint").alias("discord_rank"),
    )


# --- Croston intermittent-demand smoothing (round 12, wave-5 queue) ------

# Fixed-point gain 1/4 by truncated division (the alpha-beta filter's
# engine-portable idiom). Croston updates ONLY at demand points: size
# estimate z <- z + trunc((q - z)/4); interval estimate p (in days,
# micro-scaled) <- p + trunc((gap*1e6 - p)/4).
CROSTON_DEN = 4
CROSTON_MU = 1_000_000


@register(
    "time_croston_intermittent",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT l_partkey AS pk, CAST(l_shipdate AS DATE) AS day,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    s AS (
      SELECT pk, q,
             row_number() OVER (PARTITION BY pk ORDER BY day) AS step,
             CAST(count(*) OVER (PARTITION BY pk) AS BIGINT) AS n_demands,
             CAST(datediff('day',
                  lag(day) OVER (PARTITION BY pk ORDER BY day), day)
                  AS BIGINT) AS gap
      FROM d
    ),
    fold AS (
      SELECT pk, step, n_demands, q AS z,
             CAST({CROSTON_MU} AS BIGINT) AS p,
             q AS total_q
      FROM s WHERE step = 1
      UNION ALL
      SELECT s.pk, s.step, s.n_demands,
             CAST(f.z + CAST(((s.q - f.z) - (s.q - f.z) % {CROSTON_DEN})
                             / {CROSTON_DEN} AS BIGINT) AS BIGINT) AS z,
             CAST(f.p + CAST(((s.gap * {CROSTON_MU} - f.p)
                              - (s.gap * {CROSTON_MU} - f.p)
                                % {CROSTON_DEN})
                             / {CROSTON_DEN} AS BIGINT) AS BIGINT) AS p,
             CAST(f.total_q + s.q AS BIGINT) AS total_q
      FROM fold f JOIN s ON s.pk = f.pk AND s.step = f.step + 1
    )
    SELECT pk AS l_partkey, CAST(n_demands AS BIGINT) AS n_demands,
           total_q AS total_qty, z AS size_est, p AS interval_est_mu,
           round(CAST(z AS DOUBLE) * {CROSTON_MU} / p, 6)
             AS demand_per_day
    FROM fold WHERE step = n_demands AND n_demands >= 3
    """,
    doc="Croston's method for INTERMITTENT demand — the forecaster "
    "supply chains run on slow-moving parts where ordinary "
    "exponential smoothing collapses toward zero between orders: "
    "smooth the demand SIZE and the inter-demand INTERVAL as two "
    "separate recurrences updated only at demand points; the rate "
    "forecast is their ratio. The part x ship-day grid is genuinely "
    "intermittent (each part ships a handful of days across the "
    "7-year calendar). Exactness: both recurrences use the "
    "alpha-beta filter's fixed-point idiom — gain 1/4 by truncated "
    "division (r - r % 4, dividend-signed % in both engines), "
    "intervals micro-scaled so the integer state never loses a "
    "digit; demand_per_day is ONE IEEE division at the end. Parts "
    "with < 3 demand points are excluded (no interval signal). "
    "Shape: one (part, day) reduce touches the facts, then the fold "
    "runs per part over its OWN demand points (Spark: codegen "
    "higher-order aggregate over the sorted array; oracle: "
    "recursive CTE) — O(demand points) work, part-dimension "
    "output, scan-bound at 100 TB.",
)
def time_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    d = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.col("l_shipdate").cast("date").alias("day"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("q"))
    series = d.groupBy("pk").agg(
        F.array_sort(F.collect_list(F.struct("day", "q"))).alias("pts")
    )

    def trunc_div(r, den):
        return ((r - r % F.lit(den)) / F.lit(den)).cast("long")

    init = F.struct(
        F.lit(0).cast("bigint").alias("z"),
        F.lit(CROSTON_MU).cast("bigint").alias("p"),
        F.lit(0).cast("bigint").alias("tq"),
        F.lit(None).cast("date").alias("prev"),
        F.lit(False).alias("started"),
    )

    def step(acc, pt):
        q = pt.getField("q")
        day = pt.getField("day")
        gap = F.datediff(day, acc.getField("prev")).cast("bigint")
        z, p = acc.getField("z"), acc.getField("p")
        nz = (z + trunc_div(q - z, CROSTON_DEN)).cast("long")
        np_ = (
            p + trunc_div(gap * F.lit(CROSTON_MU) - p, CROSTON_DEN)
        ).cast("long")
        return F.when(
            acc.getField("started"),
            F.struct(
                nz.alias("z"),
                np_.alias("p"),
                (acc.getField("tq") + q).cast("long").alias("tq"),
                day.alias("prev"),
                F.lit(True).alias("started"),
            ),
        ).otherwise(
            F.struct(
                q.cast("long").alias("z"),
                F.lit(CROSTON_MU).cast("long").alias("p"),
                q.cast("long").alias("tq"),
                day.alias("prev"),
                F.lit(True).alias("started"),
            )
        )

    folded = series.select(
        "pk",
        F.size("pts").cast("bigint").alias("n_demands"),
        F.aggregate("pts", init, step).alias("st"),
    ).filter(F.col("n_demands") >= 3)
    z = F.col("st").getField("z")
    p = F.col("st").getField("p")
    return folded.select(
        F.col("pk").alias("l_partkey"),
        "n_demands",
        F.col("st").getField("tq").alias("total_qty"),
        z.alias("size_est"),
        p.alias("interval_est_mu"),
        F.round(z.cast("double") * F.lit(float(CROSTON_MU)) / p, 6).alias(
            "demand_per_day"
        ),
    )
