"""Aggregation operators: groupBy/HAVING, rollup/cube/grouping sets,
multi-distinct, pivot, conditional aggregates, exact moment-based
stats, approximate distinct.

The reference's only reductions are Python counters
(app/Consumer_clickhouse.py:86-95 — SURVEY.md §2-A21); everything here
is §2-C new-query-layer capability.

Scale notes: all aggregates are hash aggregations with map-side
partial combine (Spark plans partial_agg -> shuffle keys-only ->
final_agg automatically); decimal sums keep partials exact so the
combine order never changes results. `approx_count_distinct` (HLL++)
is the 100 TB path for cardinality — fixed-size sketch per group vs an
exact-distinct shuffle of every value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import money
from ..registry import register
from ..tables import load

_DISC = 'CAST(l_discount AS DECIMAL(4,2))'
_TAX = 'CAST(l_tax AS DECIMAL(4,2))'
_PRICE = 'CAST(l_extendedprice AS DECIMAL(12,2))'
_QTY = 'CAST(l_quantity AS DECIMAL(12,2))'


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum({_QTY}) AS DOUBLE)                                 AS sum_qty,
           CAST(sum({_PRICE}) AS DOUBLE)                               AS sum_base_price,
           CAST(sum({_PRICE} * (1 - {_DISC})) AS DOUBLE)               AS sum_disc_price,
           CAST(sum({_PRICE} * (1 - {_DISC}) * (1 + {_TAX}))
                AS DOUBLE)                                             AS sum_charge,
           CAST(sum({_QTY}) AS DOUBLE) / count(*)                      AS avg_qty,
           CAST(sum({_PRICE}) AS DOUBLE) / count(*)                    AS avg_price,
           CAST(sum({_DISC}) AS DOUBLE) / count(*)                     AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: 8 aggregates over 2 grouping "
    "cols. Decimal sums -> exact partial combine; final columns cast "
    "to double (both engines) so output rendering is engine-agnostic.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir).filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(price * (1 - disc)).cast("double").alias("sum_disc_price"),
        F.sum(price * (1 - disc) * (1 + tax)).cast("double").alias("sum_charge"),
        (F.sum(qty).cast("double") / n).alias("avg_qty"),
        (F.sum(price).cast("double") / n).alias("avg_price"),
        (F.sum(disc).cast("double") / n).alias("avg_disc"),
        n.alias("count_order"),
    )


@register(
    "agg_groupby_having",
    oracle="""
    SELECT o_custkey,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING sum(CAST(o_totalprice AS DECIMAL(18,2))) > 1000000
    """,
    doc="GROUP BY + HAVING on an exact decimal sum.",
)
def agg_groupby_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(money("o_totalprice")).alias("_spend_exact"),
        )
        .filter(F.col("_spend_exact") > 1000000)
        .select(
            "o_custkey",
            "n_orders",
            F.col("_spend_exact").cast("double").alias("spend"),
        )
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT n.n_name, year(o.o_orderdate) AS yr,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP (n.n_name, year(o.o_orderdate))
    """,
    doc="ROLLUP hierarchy totals (nation -> nation/year -> grand total).",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    c = load(spark, "customer", sf_dir)
    n = load(spark, "nation", sf_dir)
    joined = o.join(F.broadcast(c.select("c_custkey", "c_nationkey")), o.o_custkey == F.col("c_custkey")).join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    )
    return joined.rollup("n_name", F.year("o_orderdate").cast("bigint").alias("yr")).agg(
        F.sum(money("o_totalprice")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over two low-cardinality dims.",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    doc="Explicit GROUPING SETS (two independent one-dim aggregates in "
    "one pass).",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "agg_distinct_multi",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Multiple COUNT(DISTINCT) in one aggregate (Spark expands to "
    "a single multi-distinct aggregate).",
)
def agg_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(count(*) AS BIGINT) AS n_rows,
           TRUE AS within_3pct
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="approx_count_distinct (HyperLogLog++): the 100 TB cardinality "
    "path — fixed-size sketches merge map-side instead of shuffling "
    "every distinct value. Upgraded rows-only → hash-checked via the "
    "bounds-oracle pattern (agg_hll_sketch_merge): the estimate is "
    "engine-specific, but 'estimate within 3% of exact' is SQL-"
    "expressible — at rsd=0.01 the flag sits >3 sigma inside the "
    "bound, so any sketch regression flips it and fails the value "
    "hash. The exact column is the oracle harness, not the "
    "production shape; a pytest additionally pins <2% error.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("bigint").alias("exact_parts"),
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", rsd=0.01)
                - F.countDistinct("l_partkey")
            )
            <= F.lit(0.03) * F.countDistinct("l_partkey")
        ).alias("within_3pct"),
    )


def hll_custs_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderstatus, approx_custs, exact_custs, n_rows) — per-status
    HLL sketch estimates, the union-merged ALL row, and the exact
    distinct counts beside them. The kernel agg_hll_sketch_merge and
    tests/test_sketches.py share; the exact column exists for the
    bound checks, not the production shape (at 100 TB you store the
    sketches and never recount)."""
    o = load(spark, "orders", sf_dir)
    per_status = o.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.countDistinct("o_custkey").alias("exact_custs"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    per_group = per_status.select(
        "o_orderstatus",
        F.hll_sketch_estimate("sk").alias("approx_custs"),
        "exact_custs",
        "n_rows",
    )
    merged_sk = per_status.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_custs"),
        F.sum("n_rows").alias("n_rows"),
    )
    exact_all = o.agg(F.countDistinct("o_custkey").alias("exact_custs"))
    merged = merged_sk.crossJoin(exact_all).select(
        F.lit("ALL").alias("o_orderstatus"), "approx_custs", "exact_custs", "n_rows"
    )
    return per_group.unionByName(merged)


@register(
    "agg_hll_sketch_merge",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
           CAST(count(*) AS BIGINT) AS n_rows,
           TRUE AS within_3pct
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'ALL' AS o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
           CAST(count(*) AS BIGINT) AS n_rows,
           TRUE AS within_3pct
    FROM orders
    """,
    doc="HLL sketches as first-class mergeable data (Datasketches "
    "hll_sketch_agg / hll_union_agg / hll_sketch_estimate): per-group "
    "sketches are built in one pass, then UNIONED into a global "
    "estimate without rescanning — the 100 TB pattern where per-"
    "shard/per-day sketches are stored once and any rollup "
    "(regional, monthly, global) is a cheap sketch merge instead of "
    "a distinct recount over raw data. Hash-checked via a bounds "
    "oracle (round-7 verdict item 5): the raw estimate is engine-"
    "specific so it cannot be hash-compared, but 'estimate within 3% "
    "of the exact distinct' IS SQL-expressible — the query emits the "
    "exact counts plus a within_3pct flag (default lgConfigK=12 has "
    "~0.8% standard error, so 3% is >3 sigma), and any sketch "
    "regression flips the flag and fails the driver's value hash. "
    "The exact-count column is the oracle harness, not the "
    "production shape — see hll_custs_estimates.",
)
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    est = hll_custs_estimates(spark, sf_dir)
    return est.select(
        "o_orderstatus",
        "exact_custs",
        "n_rows",
        (
            F.abs(F.col("approx_custs") - F.col("exact_custs"))
            <= F.lit(0.03) * F.col("exact_custs")
        ).alias("within_3pct"),
    )


@register(
    "agg_stats_moments",
    oracle="""
    SELECT event_type,
           count(*)   AS n,
           min(value) AS v_min,
           max(value) AS v_max,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS v_avg,
           (CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE)
            - CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
              * CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*))
           / (count(*) - 1) AS v_var
    FROM events
    GROUP BY event_type
    """,
    doc="min/max/avg/sample-variance from exact decimal moment sums — "
    "deterministic across engines and combine orders (Welford-free).",
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    v = F.col("value").cast("decimal(18,2)")
    n = F.count(F.lit(1))
    s1 = F.sum(v).cast("double")
    s2 = F.sum(v * v).cast("double")
    return e.groupBy("event_type").agg(
        n.alias("n"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        (s1 / n).alias("v_avg"),
        ((s2 - s1 * s1 / n) / (n - 1)).alias("v_var"),
    )


@register(
    "agg_conditional",
    oracle="""
    SELECT o_custkey,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                         THEN CAST(o_totalprice AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS urgent_spend
    FROM orders
    GROUP BY o_custkey
    """,
    doc="Conditional aggregation (CASE inside SUM) — one scan computes "
    "several filtered aggregates.",
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    zero = F.lit(0).cast("decimal(18,2)")
    return o.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", money("o_totalprice")).otherwise(zero))
        .cast("double")
        .alias("urgent_spend"),
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_O,
           CAST(sum(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Pivot on a known value list (unknown lists need a first pass "
    "to enumerate values — avoided at scale).",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    qty = F.col("l_quantity").cast("decimal(12,2)")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(qty))
    )
    return piv.select(
        "l_returnflag",
        F.col("O").cast("double").alias("qty_O"),
        F.col("F").cast("double").alias("qty_F"),
    )


@register(
    "agg_grouping_levels",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT)                       AS g_status,
           CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT)   AS gid,
           count(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="ROLLUP with GROUPING()/grouping_id(): the level indicators "
    "that distinguish a subtotal row's NULL from a real NULL key — "
    "required for unambiguous rollup consumption.",
)
def agg_grouping_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_boolean",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000)   AS all_over_1k,
           bool_or(o_totalprice > 400000)  AS any_over_400k,
           CAST(count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT)
             AS n_urgent,
           count(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Boolean aggregate battery: bool_and/bool_or (every/any) and "
    "a filtered count — one-bit partial state, ideal map-side "
    "combiners.",
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("n_urgent"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_salted_skew",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
           count(DISTINCT o_custkey) AS n_custs
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Two-phase salted aggregation over a genuinely skewed key "
    "(o_orderstatus has 3 values, one holding ~half the table): rows "
    "first aggregate by (key, salt16) so the hot key's work spreads "
    "over 16 reducers, then the per-salt partials merge by key. For "
    "plain sums Spark's map-side partial combine already defuses this "
    "skew; the pattern matters for aggregates partials can't shrink — "
    "here count(DISTINCT o_custkey), computed as the expand-then-count "
    "shape: a first aggregate on (key, custkey) — which spreads the "
    "hot key across reducers by the distinct value itself, no giant "
    "per-key array anywhere — then a count per key "
    "(approx_count_distinct is the pure-sketch alternative). Results "
    "are exactly the plain GROUP BY: decimal partials make the merge "
    "order irrelevant.",
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    salt = F.pmod(F.xxhash64("o_orderkey"), F.lit(16)).alias("salt")
    partial = (
        o.select("o_orderstatus", "o_totalprice", salt)
        .groupBy("o_orderstatus", "salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(money("o_totalprice")).alias("_spend"),
        )
    )
    sums = partial.groupBy("o_orderstatus").agg(
        F.sum("_n").alias("n"),
        F.sum("_spend").cast("double").alias("spend"),
    )
    # exact distinct without a per-key array: the (key, value) distinct
    # shuffle is spread by the value, so the hot key never serializes
    distincts = (
        o.select("o_orderstatus", "o_custkey")
        .distinct()
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_custs"))
    )
    return sums.join(distincts, "o_orderstatus").select(
        "o_orderstatus", "n", "spend", "n_custs"
    )


@register(
    "agg_corr_moments",
    oracle="""
    WITH m AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)  AS sx,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) AS sy,
             CAST(sum(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)
                      * CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) AS syy,
             CAST(sum(CAST(value AS DECIMAL(18,2))
                      * CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) AS sxy
      FROM events
      GROUP BY event_type
    )
    SELECT event_type, n,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_vk
    FROM m
    """,
    doc="Pearson correlation from exact decimal/integer moment sums "
    "(never the built-in corr: its float accumulation order is "
    "engine- and partitioning-dependent). One scan, map-side exact "
    "partials, deterministic final arithmetic.",
)
def agg_corr_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    v = F.col("value").cast("decimal(18,2)")
    k = F.from_json("props", "struct<k:bigint>").getField("k")
    base = e.select("event_type", v.alias("v"), k.alias("k"))
    n = F.count(F.lit(1))
    m = base.groupBy("event_type").agg(
        n.alias("n"),
        F.sum("v").cast("double").alias("sx"),
        F.sum("k").cast("double").alias("sy"),
        F.sum(F.col("v") * F.col("v")).cast("double").alias("sxx"),
        F.sum(F.col("k") * F.col("k")).cast("double").alias("syy"),
        F.sum(F.col("v") * F.col("k")).cast("double").alias("sxy"),
    )
    corr = (m["n"] * m["sxy"] - m["sx"] * m["sy"]) / F.sqrt(
        (m["n"] * m["sxx"] - m["sx"] * m["sx"]) * (m["n"] * m["syy"] - m["sy"] * m["sy"])
    )
    return m.select("event_type", "n", F.round(corr, 6).alias("corr_vk"))


@register(
    "skew_key_profile",
    oracle="""
    WITH c AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    )
    SELECT user_id, n,
           round(n * 1.0 / (SELECT sum(n) FROM c), 6) AS share
    FROM c
    ORDER BY n DESC, user_id
    LIMIT 20
    """,
    doc="Hot-key skew diagnosis: the heaviest 20 keys with their row "
    "share — what you run BEFORE choosing salting (agg_salted_skew) "
    "or an AQE skew-join threshold on a new 100 TB input. One "
    "map-side-combined count per key; top-k via TakeOrdered over the "
    "per-key table; the share denominator joins in as the sanctioned "
    "one-row scalar broadcast (a Window.partitionBy() total would "
    "drag every distinct key into a single task — on exactly the "
    "billions-of-keys input this operator exists to diagnose).",
)
def skew_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    c = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    total = c.agg(F.sum("n").alias("_total"))
    return (
        c.orderBy(F.col("n").desc(), "user_id")
        .limit(20)
        .crossJoin(F.broadcast(total))
        .select("user_id", "n", F.round(F.col("n") / F.col("_total"), 6).alias("share"))
    )


CMS_W = 1024  # buckets per row
CMS_D = 4  # hash rows (disjoint 8-hex windows of one md5)


def _cms_buckets(key) -> F.Column:
    """array<struct<s,bucket>> of a key's D probe cells — the shared
    md5-window hash kernel (functions/hashing.py), same spec as the
    Bloom filter's bit positions."""
    from ..functions.hashing import md5_window_positions

    positions = md5_window_positions(key.cast("string"), CMS_D, CMS_W)
    return F.array(
        *[
            F.struct(F.lit(s).alias("s"), pos.alias("bucket"))
            for s, pos in enumerate(positions)
        ]
    )


def cms_sketch(df: DataFrame, key: str) -> DataFrame:
    """(s, bucket, cnt) counter table over ``df[key]`` — one
    map-side-combined aggregate. Sketches are MERGEABLE: union two
    sketch tables and groupBy(s, bucket).sum(cnt) IS the sketch of
    the concatenated inputs (tested), which is what lets shards /
    micro-batches sketch independently and fold later."""
    return (
        df.select(F.explode(_cms_buckets(F.col(key))).alias("b"))
        .select("b.s", "b.bucket")
        .groupBy("s", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Fold independently-built sketch tables into one."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("s", "bucket").agg(F.sum("cnt").alias("cnt"))


@register(
    "agg_heavy_hitters_cms",
    oracle=f"""
    WITH keyed AS (
      SELECT user_id, md5(CAST(user_id AS VARCHAR)) AS h FROM events
    ), exploded AS (
      SELECT user_id, s.s AS s,
             ('0x' || substr(h, 1 + 8 * s.s, 8))::BIGINT % {CMS_W} AS bucket
      FROM keyed, (SELECT unnest([{", ".join(str(s) for s in range(CMS_D))}]) AS s) s
    ), sketch AS (
      SELECT s, bucket, count(*) AS cnt FROM exploded GROUP BY s, bucket
    ), truth AS (
      SELECT user_id, count(*) AS n_true FROM events GROUP BY user_id
      ORDER BY n_true DESC, user_id LIMIT 20
    ), probes AS (
      SELECT t.user_id, t.n_true, s.s AS s,
             ('0x' || substr(md5(CAST(t.user_id AS VARCHAR)), 1 + 8 * s.s, 8))::BIGINT
               % {CMS_W} AS bucket
      FROM truth t, (SELECT unnest([{", ".join(str(s) for s in range(CMS_D))}]) AS s) s
    )
    SELECT p.user_id, any_value(p.n_true) AS n_true, min(sk.cnt) AS n_est
    FROM probes p JOIN sketch sk ON sk.s = p.s AND sk.bucket = p.bucket
    GROUP BY p.user_id
    """,
    doc=f"Count-min-sketch heavy hitters, fully oracle-checked: the "
    f"sketch is a {CMS_D} x {CMS_W} counter table built as a real "
    "distributed aggregate (each row explodes to its D md5-window "
    "buckets, one map-side-combined groupBy), and each candidate "
    "key's estimate is the min over its D probe cells. Because the "
    "hash spec is md5 windows (the Bloom-filter trick), estimates — "
    "collisions included — are bit-identical in DuckDB, so a sketch "
    "that is normally only statistically testable gets a hash-checked "
    "gate row. The output pairs true counts with estimates for the "
    "top-20 keys; CMS guarantees n_est >= n_true (pinned in pytest). "
    "At 100 TB the sketch stays D x W counters regardless of key "
    "cardinality — the streaming/mergeable alternative to an exact "
    "per-key count when keys number in the billions.",
)
def agg_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    buckets = _cms_buckets(F.col("user_id"))
    sketch = cms_sketch(e, "user_id")
    truth = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_true"))
        .orderBy(F.col("n_true").desc(), "user_id")
        .limit(20)
    )
    probes = truth.select("user_id", "n_true", F.explode(buckets).alias("b")).select(
        "user_id", "n_true", "b.s", "b.bucket"
    )
    return (
        probes.join(F.broadcast(sketch), ["s", "bucket"])
        .groupBy("user_id")
        .agg(F.any_value("n_true").alias("n_true"), F.min("cnt").alias("n_est"))
    )


ZSCORE_SQ_THRESHOLD = 6.25  # |z| > 2.5


@register(
    "events_anomaly_zscore",
    oracle=f"""
    WITH s AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(sum(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - s.s1 / s.n) * (e.value - s.s1 / s.n)
                 / ((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)), 6) AS z2
    FROM events e JOIN s USING (event_type)
    WHERE s.n > 1
      AND (s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1) > 0
      AND (e.value - s.s1 / s.n) * (e.value - s.s1 / s.n)
          / ((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)) > {ZSCORE_SQ_THRESHOLD}
    """,
    doc="Per-key z-score anomaly flagging (|z| > 2.5): the monitoring "
    "query every ingestion pipeline runs over its metrics. Mean and "
    "variance come from exact decimal moment sums (one map-side-"
    "combined aggregate per key, the stats_moments convention), the "
    "tiny per-key stats table BROADCASTS back onto the event scan, "
    "and the comparison uses z-SQUARED so no sqrt enters the checked "
    "expression — every op is +,-,*,/ on exact inputs, bit-identical "
    "across engines. Two scans of events, zero corpus shuffles.",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    v = F.col("value").cast("decimal(18,2)")
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).cast("double").alias("s1"),
        F.sum(v * v).cast("double").alias("s2"),
    )
    j = e.join(F.broadcast(stats), "event_type")
    dev = F.col("value") - F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    z2 = dev * dev / var
    # n>1 / var>0 guard (mirrors window_moving_zscore): without it a
    # single-row or zero-variance key divides by zero — Spark yields
    # NULL (row dropped) but an IEEE-float engine yields NaN, which
    # DuckDB orders ABOVE the threshold, so the engines would diverge.
    return (
        j.filter((F.col("n") > 1) & (var > 0) & (z2 > ZSCORE_SQ_THRESHOLD))
        .select("event_id", "event_type", "value", F.round(z2, 6).alias("z2"))
    )


@register(
    "agg_percentile_exact",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.75), 6) AS p75,
           round(quantile_cont(value, 0.90), 6) AS p90
    FROM events
    GROUP BY event_type
    """,
    doc="Exact interpolated percentiles per key (SQL-standard "
    "percentile_cont semantics: rank (n-1)p, linear interpolation "
    "between the two nearest order statistics — the same formula in "
    "Spark's percentile() and DuckDB's quantile_cont, so the result "
    "is hash-checkable unlike the HLL/KLL sketch twins). The exact "
    "form needs the per-group values gathered (one shuffle on the "
    "group key); it is the small-group companion of "
    "agg_approx_percentile, whose fixed-size mergeable sketch is the "
    "100 TB path when groups are huge.",
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.round(F.percentile("value", F.lit(p)), 6).alias(f"p{int(p * 100)}")
            for p in (0.25, 0.50, 0.75, 0.90)
        ],
    )


@register(
    "agg_mode_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderstatus AS mode_status, n AS mode_n
    FROM (
      SELECT o_orderpriority, o_orderstatus, count(*) AS n,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY count(*) DESC, o_orderstatus
             ) AS rk
      FROM orders
      GROUP BY o_orderpriority, o_orderstatus
    ) WHERE rk = 1
    """,
    doc="Deterministic MODE per group (most frequent value, ties to "
    "the smallest value — Spark's mode() leaves ties unspecified, so "
    "the operator builds it from count + row_number instead): the "
    "two-level aggregate shape. Level 1 is a map-side-combined "
    "count over (group, value) — the only pass over the data; the "
    "argmax window then runs on the tiny aggregated table with a "
    "WindowGroupLimit. At 100 TB the wire carries one row per "
    "DISTINCT (group, value), never the corpus.",
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, "orders", sf_dir)
    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("n").desc(), "o_orderstatus")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("mode_status"),
            F.col("n").alias("mode_n"),
        )
    )


@register(
    "events_latest_per_key",
    oracle="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_type,
           value AS last_value
    FROM (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY ts DESC NULLS LAST, event_id DESC
             ) AS rk
      FROM events
    ) WHERE rk = 1
    """,
    doc="Latest state per key — CDC/upsert compaction (the "
    "ReplacingMergeTree-style 'current snapshot' every event store "
    "materializes): argmax by (ts, event_id) via a WindowGroupLimit-"
    "planned row_number, so each task keeps ONE row per key before "
    "the exchange and the shuffle carries O(keys x tasks) rows, not "
    "the event history. The event_id tiebreak makes same-timestamp "
    "deliveries deterministic across engines and reruns.",
)
def events_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, "events", sf_dir)
    # NULLS LAST pinned on both sides: engines default differently for
    # DESC null placement, and a never-stamped event must not shadow
    # real state
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc_nulls_last(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
        )
    )


@register(
    "events_path_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
             ) AS prev
      FROM events
    ), t AS (
      SELECT prev AS from_type, event_type AS to_type,
             CAST(count(*) AS BIGINT) AS n_trans
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
    ), tot AS (
      SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS n_from
      FROM t GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, t.n_trans,
           round(CAST(t.n_trans AS DOUBLE) / tot.n_from, 6) AS p
    FROM t JOIN tot USING (from_type)
    """,
    doc="Behavioral path analysis: first-order Markov transition "
    "matrix over each user's event sequence — which event follows "
    "which, with conditional probabilities. One lag window per user "
    "(shuffle on user_id, the sessionize exchange), then counts "
    "collapse to the tiny (from, to) matrix; the row-normalizer is a "
    "broadcast join against per-from totals. The (ts, event_id) "
    "ordering tiebreak makes sequences deterministic across engines.",
)
def events_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, "events", sf_dir)
    # NULLS LAST pinned on both sides (the events_latest_per_key
    # convention): Spark ASC defaults nulls FIRST, DuckDB nulls LAST —
    # a null-ts event would otherwise sequence differently per engine
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc_nulls_last(), "event_id")
    seq = e.select("user_id", "event_type", F.lag("event_type").over(w).alias("prev"))
    t = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("from_type"), F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    tot = t.groupBy("from_type").agg(F.sum("n_trans").cast("bigint").alias("n_from"))
    return t.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n_trans",
        F.round(F.col("n_trans").cast("double") / F.col("n_from"), 6).alias("p"),
    )


@register(
    "events_rolling_dau",
    oracle="""
    WITH d AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      FROM events
    ), days AS (SELECT DISTINCT day FROM d)
    SELECT days.day,
           CAST((SELECT count(DISTINCT d1.user_id) FROM d d1
                 WHERE d1.day = days.day) AS BIGINT) AS dau,
           CAST((SELECT count(DISTINCT d7.user_id) FROM d d7
                 WHERE d7.day BETWEEN days.day - 6 AND days.day) AS BIGINT) AS dau7
    FROM days
    """,
    doc="Daily active users plus the 7-day rolling distinct count — "
    "the engagement dashboard pair. Rolling DISTINCT cannot use a "
    "running-sum window (distinct does not decompose), and the naive "
    "day-range self-join is quadratic in window length x days; the "
    "scale shape used here is CONTRIBUTION EXPLODE: each (day, user) "
    "pair emits one row per window it belongs to (a fixed 7x fanout "
    "of the already-deduped day-user table, NOT of raw events), and "
    "each window day counts distinct users — linear in the data with "
    "a constant factor of the window length, map-side combined. The "
    "DuckDB oracle states the same semantics as correlated "
    "range-subqueries (fine at oracle scale, the quadratic shape the "
    "operator avoids).",
)
def events_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    d = e.select(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"), "user_id"
    ).distinct()
    dau = d.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    contrib = d.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"), "day", "user_id"
    ).select(F.date_add(F.col("day"), F.col("off")).alias("wday"), "user_id")
    dau7 = contrib.groupBy("wday").agg(F.countDistinct("user_id").alias("dau7"))
    # inner join on actual event days: window days past the last
    # event day exist only in the contribution table, not the output
    return dau.join(dau7, dau["day"] == dau7["wday"]).select("day", "dau", "dau7")


@register(
    "events_conversion_latency",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id,
             min(epoch_us(e.ts) - epoch_us(v.t_view)) AS lat_us
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.t_view
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_viewers,
           CAST(count(*) AS BIGINT) AS n_converted,
           round(CAST(count(*) AS DOUBLE)
                 / (SELECT count(*) FROM v), 6) AS conv_rate,
           round(quantile_cont(lat_us, 0.50), 6) AS p50_lat_us,
           round(quantile_cont(lat_us, 0.90), 6) AS p90_lat_us
    FROM c
    """,
    doc="Funnel time-to-convert: per user, the latency from first "
    "'view' to the first 'purchase' at-or-after it, summarized as "
    "conversion rate + exact latency percentiles — the companion "
    "metric to funnel_stages (which counts WHO converts; this "
    "measures HOW FAST). Latencies are integer microsecond "
    "differences (unix_micros / epoch_us — exact on both engines, no "
    "interval-to-double drift); the percentile is the SQL-standard "
    "interpolated form shared by Spark percentile() and DuckDB "
    "quantile_cont. Cost shape: two filtered map-side-combined "
    "min-aggregates keyed on user + one equi-join on user_id; the "
    "final summary is a one-row reduce. The min() over the "
    "conditional join is the argmin shape — no per-user event arrays "
    "anywhere.",
)
def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts") - F.unix_micros("t_view")).alias("lat_us"))
    )
    n_view = v.agg(F.count(F.lit(1)).alias("n_viewers"))
    return (
        c.agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.round(F.percentile("lat_us", F.lit(0.50)), 6).alias("p50_lat_us"),
            F.round(F.percentile("lat_us", F.lit(0.90)), 6).alias("p90_lat_us"),
        )
        .crossJoin(F.broadcast(n_view))
        .select(
            "n_viewers",
            "n_converted",
            F.round(
                F.col("n_converted").cast("double") / F.col("n_viewers"), 6
            ).alias("conv_rate"),
            "p50_lat_us",
            "p90_lat_us",
        )
    )


@register(
    "events_user_streaks",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), isl AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY day) AS INT) AS grp
      FROM d
    ), streaks AS (
      SELECT user_id, grp, count(*) AS len FROM isl GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(sum(len) AS BIGINT) AS n_active_days,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS max_streak
    FROM streaks GROUP BY user_id
    """,
    doc="Gaps-and-islands: per-user consecutive-day activity streaks "
    "(the canonical engagement/retention analytic). The island key is "
    "day minus the per-user day rank — constant within a consecutive "
    "run, distinct across gaps — so streaks fall out of two ordinary "
    "aggregates with NO self-join and NO per-user arrays. Cost shape: "
    "one dedup shuffle on (user, day), one per-user window over "
    "already-small groups (days per user, not events), two map-side "
    "combined aggregates; integers end to end, hash-exact on both "
    "engines.",
)
def events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, "events", sf_dir)
    d = e.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = d.select(
        "user_id",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("grp"),
    )
    streaks = isl.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").cast("bigint").alias("max_streak"),
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH g AS (
      SELECT l_returnflag AS flag,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS pc,
             CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT))
                  AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ), c AS (
      SELECT flag, pc, w,
             sum(w) OVER (PARTITION BY flag ORDER BY pc
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(w) OVER (PARTITION BY flag) AS tot
      FROM g
    )
    SELECT flag,
           CAST(min(pc) AS DOUBLE) / 100 AS weighted_median_price,
           CAST(min(tot) AS DOUBLE) / 100 AS total_weight
    FROM c WHERE 2 * cum >= tot GROUP BY flag
    """,
    doc="Quantity-weighted (low) median of extended price per return "
    "flag — the weighted-quantile aggregate Spark and ANSI SQL both "
    "lack as a builtin. The oracle is the textbook single-window "
    "cumulative-weight form; the Spark side computes the IDENTICAL "
    "answer with the distributed two-level algorithm: (1) weights "
    "pre-grouped to integer cents per (flag, price); (2) a $1000 "
    "price-bucket histogram whose per-flag cumsum window runs over "
    "~dozens of bucket rows, never the value domain; (3) the one "
    "median-holding bucket per flag is broadcast back and only ITS "
    "rows get the within-bucket cumsum, offset by the bucket-prefix "
    "weight. No window ever sees a partition proportional to the "
    "corpus — the single-partition-per-group window that makes the "
    "naive form a 100 TB scale-killer is replaced by two bounded "
    "ones. Integer cents end to end (decimal bridge), one final "
    "IEEE division per output column.",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, "lineitem", sf_dir)
    pc = (F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast("bigint")
    wc = (F.col("l_quantity").cast("decimal(12,2)") * 100).cast("bigint")
    g = (
        li.select(F.col("l_returnflag").alias("flag"), pc.alias("pc"), wc.alias("wc"))
        .groupBy("flag", "pc")
        .agg(F.sum("wc").alias("w"))
    )
    # level 1: $1000 buckets -> per-flag histogram (tiny), cumsum over it
    b = (
        g.withColumn("bucket", (F.col("pc") / F.lit(100000)).cast("bigint"))
        .groupBy("flag", "bucket")
        .agg(F.sum("w").alias("bw"))
    )
    wb = Window.partitionBy("flag").orderBy("bucket")
    cb = b.select(
        "flag",
        "bucket",
        "bw",
        F.sum("bw").over(wb.rowsBetween(Window.unboundedPreceding, 0)).alias("bcum"),
        F.sum("bw").over(Window.partitionBy("flag")).alias("tot"),
    )
    # the single bucket per flag where the weighted median lands, with
    # the cumulative weight of all buckets BEFORE it
    med_bucket = (
        cb.filter(2 * F.col("bcum") >= F.col("tot"))
        .groupBy("flag")
        .agg(
            F.min_by(F.struct("bucket", "bcum", "bw", "tot"), "bucket").alias("mb")
        )
        .select(
            "flag",
            F.col("mb.bucket").alias("bucket"),
            (F.col("mb.bcum") - F.col("mb.bw")).alias("prefix"),
            F.col("mb.tot").alias("tot"),
        )
    )
    # level 2: within-bucket cumsum over ONLY the median bucket's rows
    inb = g.withColumn(
        "bucket", (F.col("pc") / F.lit(100000)).cast("bigint")
    ).join(F.broadcast(med_bucket), ["flag", "bucket"])
    w2 = Window.partitionBy("flag").orderBy("pc").rowsBetween(
        Window.unboundedPreceding, 0
    )
    resolved = inb.select(
        "flag", "pc", "tot", (F.col("prefix") + F.sum("w").over(w2)).alias("cum")
    )
    return (
        resolved.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("flag")
        .agg(
            (F.min("pc").cast("double") / 100).alias("weighted_median_price"),
            (F.min("tot").cast("double") / 100).alias("total_weight"),
        )
    )


@register(
    "scd2_intervals",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
             ) AS prev
      FROM events
    ), chg AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN prev IS NULL OR prev <> event_type
                  THEN 1 ELSE 0 END AS is_chg
      FROM seq
    ), grp AS (
      SELECT user_id, event_type, ts,
             CAST(sum(is_chg) OVER (
               PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
             ) AS BIGINT) AS version
      FROM chg
    ), island AS (
      SELECT user_id, event_type AS state, version,
             min(ts) AS valid_from,
             CAST(count(*) AS BIGINT) AS n_events
      FROM grp GROUP BY user_id, event_type, version
    )
    SELECT user_id, state, version, valid_from,
           lead(valid_from) OVER (
             PARTITION BY user_id ORDER BY version
           ) AS valid_to,
           n_events
    FROM island
    """,
    doc="SCD Type-2 dimension build from a change stream: compress "
    "each user's event-type sequence into versioned validity "
    "intervals [valid_from, valid_to) with NULL valid_to marking the "
    "current row — the CDC-to-warehouse materialization every "
    "dimension pipeline needs. Gaps-and-islands via a change-flag "
    "cumsum: lag() marks state changes, a running sum numbers the "
    "islands, one aggregate collapses each island, lead() closes the "
    "interval. All three windows and the aggregate share the SAME "
    "partitioning key (user_id), so Spark plans ONE shuffle and "
    "reuses the sort — per-user partitions are bounded by per-entity "
    "history, never corpus size. (ts, event_id) total order makes "
    "same-timestamp deliveries deterministic across engines.",
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, "events", sf_dir)
    worder = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), F.col("event_id")
    )
    chg = e.select(
        "user_id",
        "event_type",
        "ts",
        F.when(
            F.lag("event_type").over(worder).isNull()
            | (F.lag("event_type").over(worder) != F.col("event_type")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_chg"),
        "event_id",
    )
    wcum = worder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grp = chg.select(
        "user_id",
        "event_type",
        "ts",
        F.sum("is_chg").over(wcum).cast("bigint").alias("version"),
    )
    island = grp.groupBy(
        "user_id", F.col("event_type").alias("state"), "version"
    ).agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    wver = Window.partitionBy("user_id").orderBy("version")
    return island.select(
        "user_id",
        "state",
        "version",
        "valid_from",
        F.lead("valid_from").over(wver).alias("valid_to"),
        "n_events",
    )


@register(
    "events_attribution_last_touch",
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, event_type, value,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_id END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS touch_event_id,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS touch_type
      FROM events
    )
    SELECT event_id AS purchase_id, user_id,
           CAST(value AS DOUBLE) AS revenue,
           touch_event_id,
           coalesce(touch_type, 'none') AS touch_type
    FROM w WHERE event_type = 'purchase'
    """,
    doc="Last-touch conversion attribution: each purchase is credited "
    "to the most recent preceding click/view by the same user — the "
    "marketing-analytics join every event warehouse runs. One "
    "last_value(IGNORE NULLS) window over (user, time) carries the "
    "latest touch forward, so attribution is a single pass with NO "
    "self-join and NO per-purchase range scan (the naive correlated "
    "'max ts < purchase ts' subquery is quadratic per user). Both "
    "touch columns share one window spec — one shuffle, one sort, "
    "partitions bounded by per-user history. (ts, event_id) total "
    "order pins same-timestamp behavior; purchases with no prior "
    "touch surface as 'none' rather than vanishing.",
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc_nulls_last(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("click", "view")
    touched = e.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.last(F.when(is_touch, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("touch_event_id"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
    )
    return touched.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("value").cast("double").alias("revenue"),
        "touch_event_id",
        F.coalesce(F.col("touch_type"), F.lit("none")).alias("touch_type"),
    )


# Regression epoch origin: 2024-01-01 UTC. Centering x keeps every
# decimal product inside tight precisions (documented per term below)
# so BOTH engines' exact decimal arithmetic stays under the 38-digit
# ceiling — uncentered epoch seconds squared would not.
REGR_X0 = 1704067200


@register(
    "agg_regression_per_group",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 1000000 - {REGR_X0} AS BIGINT) AS x,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS yc
      FROM events WHERE ts IS NOT NULL
    ), s AS (
      SELECT event_type,
             CAST(count(*) AS DECIMAL(6,0)) AS n,
             CAST(sum(x) AS DECIMAL(12,0)) AS sx,
             CAST(sum(yc) AS DECIMAL(10,0)) AS sy,
             CAST(sum(CAST(x AS DECIMAL(16,0)) * yc) AS DECIMAL(16,0)) AS sxy,
             CAST(sum(CAST(x AS DECIMAL(18,0)) * x) AS DECIMAL(18,0)) AS sxx
      FROM b GROUP BY event_type
    )
    , d AS (
      SELECT event_type, CAST(n AS BIGINT) AS n,
             CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
             CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
             CAST(sxx AS DOUBLE) AS sxxd
      FROM s
    )
    SELECT event_type, n,
           round((nd * sxyd - sxd * syd)
                 / (nd * sxxd - sxd * sxd) / 100, 12) AS slope_per_sec,
           round((syd - (nd * sxyd - sxd * syd)
                        / (nd * sxxd - sxd * sxd) * sxd)
                 / nd / 100, 9) AS intercept_at_x0
    FROM d
    """,
    doc="Per-group OLS trend (slope + intercept of value over time): "
    "the drift detector behind 'is this metric creeping up'. regr_"
    "slope exists in both engines but their float accumulation "
    "orders differ, so instead the FIVE sufficient statistics (n, "
    "Sx, Sy, Sxy, Sxx) are computed as exact decimals — x centered "
    "on a fixed epoch origin and y bridged to integer cents so every "
    "intermediate product provably fits tight decimal precisions on "
    "both engines (x <= ~2.7e6 for a month, so Sxx <= 18 digits, "
    "Sxy/Sxx stay exact) — and the closed form is "
    "evaluated over those stats in DOUBLE with the IDENTICAL scalar "
    "expression tree on both engines: IEEE arithmetic is "
    "deterministic given identical inputs and operation order; only "
    "aggregate reduction order varies, and the aggregates are exact. One map-side-combined aggregate per group; the classic "
    "'aggregate sufficient statistics, finish on the reduced row' "
    "shape that makes regression embarrassingly parallel at 100 TB.",
)
def agg_regression_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir).filter(F.col("ts").isNotNull())
    b = e.select(
        "event_type",
        (F.expr("unix_micros(ts) div 1000000") - F.lit(REGR_X0)).alias("x"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("yc"),
    )
    s = b.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(6,0)").alias("n"),
        F.sum("x").cast("decimal(12,0)").alias("sx"),
        F.sum("yc").cast("decimal(10,0)").alias("sy"),
        F.sum(F.col("x").cast("decimal(16,0)") * F.col("yc"))
        .cast("decimal(16,0)")
        .alias("sxy"),
        F.sum(F.col("x").cast("decimal(18,0)") * F.col("x"))
        .cast("decimal(18,0)")
        .alias("sxx"),
    )
    d = s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("n").cast("double").alias("nd"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sy").cast("double").alias("syd"),
        F.col("sxy").cast("double").alias("sxyd"),
        F.col("sxx").cast("double").alias("sxxd"),
    )
    slope = (F.col("nd") * F.col("sxyd") - F.col("sxd") * F.col("syd")) / (
        F.col("nd") * F.col("sxxd") - F.col("sxd") * F.col("sxd")
    )
    return d.select(
        "event_type",
        "n",
        F.round(slope / 100, 12).alias("slope_per_sec"),
        F.round(
            (F.col("syd") - slope * F.col("sxd")) / F.col("nd") / 100, 9
        ).alias("intercept_at_x0"),
    )


FUNNEL_WINDOW_HOURS = 72


@register(
    "funnel_constrained_window",
    oracle=f"""
    WITH s AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), c AS (
      SELECT e.user_id
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > s.t0
        AND e.ts <= s.t0 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
      GROUP BY e.user_id
    )
    SELECT CAST(date_trunc('day', s.t0) AS DATE) AS cohort_day,
           CAST(count(*) AS BIGINT) AS n_signups,
           CAST(count(c.user_id) AS BIGINT) AS n_converted,
           round(CAST(count(c.user_id) AS DOUBLE) / count(*), 6)
             AS conversion_rate
    FROM s LEFT JOIN c ON c.user_id = s.user_id
    GROUP BY CAST(date_trunc('day', s.t0) AS DATE)
    """,
    doc="Time-constrained funnel by cohort: of each day's first-time "
    "signups, how many purchased WITHIN 72 hours of signing up — the "
    "windowed-conversion metric product teams actually track "
    "(unconstrained funnels — funnel_stages — count conversions that "
    "took months as equal wins; latency percentiles — "
    "events_conversion_latency — measure speed but not the bounded "
    "rate). Two per-user min-aggregates (map-side combined), one "
    "user-key equi-join with the window bound as a join-side "
    "predicate — never a time-range join — then a dimension-sized "
    "cohort rollup. Exact integer counts, one IEEE division.",
)
def funnel_constrained_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    c = (
        s.join(purch, s["user_id"] == purch["p_user"])
        .filter(
            (F.col("p_ts") > F.col("t0"))
            & (
                F.col("p_ts")
                <= F.col("t0") + F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOURS")
            )
        )
        .select(F.col("user_id").alias("c_user"))
        .distinct()
    )
    return (
        s.join(c, s["user_id"] == c["c_user"], "left")
        .groupBy(F.to_date(F.date_trunc("day", F.col("t0"))).alias("cohort_day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_signups"),
            F.count("c_user").cast("bigint").alias("n_converted"),
            F.round(
                F.count("c_user").cast("double") / F.count(F.lit(1)), 6
            ).alias("conversion_rate"),
        )
    )


# sequenceMatch window: the B event must follow A within this many days.
SEQ_MATCH_DAYS = 7


@register(
    "events_sequence_match",
    oracle=f"""
    WITH s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    err AS (SELECT user_id, ts FROM events WHERE event_type = 'error'),
    pair AS (
      SELECT s.user_id, s.ts AS s_ts, min(p.ts) AS p_ts
      FROM s JOIN p ON p.user_id = s.user_id AND p.ts > s.ts
                    AND p.ts <= s.ts + INTERVAL {SEQ_MATCH_DAYS} DAY
      GROUP BY s.user_id, s.ts
    ),
    ok AS (
      SELECT pr.user_id, pr.s_ts, pr.p_ts FROM pair pr
      WHERE NOT EXISTS (SELECT 1 FROM err e WHERE e.user_id = pr.user_id
                        AND e.ts > pr.s_ts AND e.ts < pr.p_ts)
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_matches,
           min(s_ts) AS first_signup, min(p_ts) AS first_purchase
    FROM ok GROUP BY user_id
    """,
    doc="Event-sequence pattern matching (ClickHouse "
    "sequenceMatch('(?1)(?t<7d)(?2)') with a negative condition): per "
    "user, signup events followed by a purchase within "
    f"{SEQ_MATCH_DAYS} days with NO error event strictly between the "
    "two — the funnel variant where an intervening event BREAKS the "
    "match, which windowFunnel/funnel_stages cannot express. Shape: "
    "the A-B pairing is a per-user interval equi-join collapsed to "
    "the EARLIEST B per A (min-aggregate, so the join fanout never "
    "survives the stage); the no-intervening test is a LEFT ANTI "
    "join against the breaker stream, Spark's NOT EXISTS. All three "
    "legs hash-partition on user_id — one co-keyed shuffle family, "
    "no window over the raw stream. At 100 TB each leg is "
    "predicate-pruned at the scan (event_type filter) before any "
    "exchange, so the wire carries only the three matched types.",
)
def events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    s = e.filter(F.col("event_type") == "signup").select("user_id", F.col("ts").alias("s_ts"))
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    err = e.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    pair = (
        s.join(
            p,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") > F.col("s_ts"))
            & (F.col("p_ts") <= F.col("s_ts") + F.expr(f"INTERVAL {SEQ_MATCH_DAYS} DAYS")),
        )
        .groupBy("user_id", "s_ts")
        .agg(F.min("p_ts").alias("p_ts"))
    )
    ok = pair.join(
        err,
        (F.col("e_user") == F.col("user_id"))
        & (F.col("e_ts") > F.col("s_ts"))
        & (F.col("e_ts") < F.col("p_ts")),
        "left_anti",
    )
    return ok.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.min("s_ts").alias("first_signup"),
        F.min("p_ts").alias("first_purchase"),
    )


# Top user-day event paths (full ordered sequences, not pairwise
# transitions — the companion to events_path_transitions).
TOP_PATHS = 25


@register(
    "events_top_paths",
    oracle=f"""
    WITH p AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
             CAST(count(*) AS BIGINT) AS path_len
      FROM events GROUP BY user_id, date_trunc('day', ts)
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(min(path_len) AS BIGINT) AS steps
    FROM p GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT {TOP_PATHS}
    """,
    doc="Full-sequence path mining over user-day sessions: the "
    f"{TOP_PATHS} most common complete event-type journeys "
    "('view>click>purchase'), where events_path_transitions only "
    "counts pairwise hops — full paths expose drop-off points whole "
    "journeys share. The ordered concatenation is an ordered "
    "string_agg in the oracle and array_sort(collect_list(struct(ts, "
    "event_id, type))) -> transform -> array_join in Spark: the "
    "struct sort key makes the within-session order a total order "
    "(ts, then event_id), so both engines emit identical strings. "
    "ONE shuffle on (user_id, day) builds sessions — per-session "
    "state is bounded by events-per-user-day, the sessionize bound; "
    "the path-frequency aggregate then runs on one row per session "
    "and the top-K is a total order over that (small) path table.",
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    p = (
        e.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path"),
            F.count(F.lit(1)).cast("bigint").alias("path_len"),
        )
    )
    return (
        p.groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.min("path_len").cast("bigint").alias("steps"),
        )
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(TOP_PATHS)
    )


# Sketch set-algebra tolerance: the HLL union estimate must land
# within this relative error of the exact union (HLL++ at default
# rsd 0.05 has sigma ~2.3% here; 5% is a >2-sigma corridor).
HLL_SET_TOL = 0.05


@register(
    "agg_hll_set_algebra",
    oracle=f"""
    WITH t(ta, tb) AS (
      SELECT a.event_type, b.event_type
      FROM (SELECT DISTINCT event_type FROM events) a
      JOIN (SELECT DISTINCT event_type FROM events) b
        ON a.event_type < b.event_type
    ),
    u AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT t.ta AS type_a, t.tb AS type_b,
           CAST((SELECT count(*) FROM u WHERE u.event_type = t.ta) AS BIGINT) AS n_a,
           CAST((SELECT count(*) FROM u WHERE u.event_type = t.tb) AS BIGINT) AS n_b,
           CAST((SELECT count(DISTINCT user_id) FROM u
                 WHERE u.event_type IN (t.ta, t.tb)) AS BIGINT) AS n_union,
           CAST((SELECT count(*) FROM u ua JOIN u ub
                 ON ua.user_id = ub.user_id
                 AND ua.event_type = t.ta AND ub.event_type = t.tb) AS BIGINT)
             AS n_intersection,
           TRUE AS hll_union_within_tol
    FROM t
    """,
    doc="Sketch SET ALGEBRA over audience counts: for every pair of "
    "event types, the exact per-type / union / intersection distinct-"
    "user counts (inclusion-exclusion closes: n_a + n_b - n_union = "
    "n_intersection, pinned in tests) plus the bounds-oracle flag "
    "that Spark's mergeable HLL++ union estimate lands within "
    f"{HLL_SET_TOL:.0%} of the exact union — the property that makes "
    "HLL THE audience-overlap structure at 100 TB: per-segment "
    "sketches are built once, any union is a register-wise max "
    "(never a rescan), and intersections come from inclusion-"
    "exclusion on union estimates. Exact columns hash-check; the "
    "estimate itself is engine-specific, so its GUARANTEE is the "
    "oracle (the agg_approx_distinct pattern). One distinct pass "
    "over the corpus feeds everything; pairs are type-squared tiny.",
)
def agg_hll_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.stage import eager_release

    e = load(spark, "events", sf_dir)
    # persisted: the distinct (type, user) membership feeds the pair
    # expansion, the per-type counts, and (via the expansion) every
    # union/intersection — ONE distributed pass, no driver-side loop
    # over pairs (pairs are a broadcast dimension join, not jobs)
    u = e.select("event_type", "user_id").distinct().persist()
    t = u.select("event_type").distinct()
    # the |types|^2 pair grid: an inherently non-equi (a < b) join on
    # the TYPE DIMENSION (25 combos) — Catalyst folds any synthetic
    # equi-key and plans a broadcast nested loop regardless, which is
    # fine at this cardinality and sanctioned in the plan lint
    pairs = (
        t.select(F.col("event_type").alias("type_a"))
        .join(t.select(F.col("event_type").alias("type_b")))
        .filter(F.col("type_a") < F.col("type_b"))
    )
    # OR-membership as a UNION of two broadcast EQUI-joins (an OR join
    # condition plans as a nested loop; the union keeps both legs hash
    # joins). Persisted: exact counts and the HLL pass both consume it.
    m = (
        u.join(F.broadcast(pairs), F.col("event_type") == F.col("type_a"))
        .unionByName(u.join(F.broadcast(pairs), F.col("event_type") == F.col("type_b")))
        .persist()
    )
    per_user = m.groupBy("type_a", "type_b", "user_id").agg(
        F.countDistinct("event_type").alias("k")
    )
    exact = per_user.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_union"),
        F.sum(F.when(F.col("k") == 2, 1).otherwise(0)).cast("bigint").alias("n_intersection"),
    )
    hll = m.groupBy("type_a", "type_b").agg(
        F.approx_count_distinct("user_id").cast("bigint").alias("n_union_hll")
    )
    nt = u.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n_t"))
    na = nt.select(F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a"))
    nb = nt.select(F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b"))
    out = (
        exact.join(hll, ["type_a", "type_b"])
        .join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_union",
            "n_intersection",
            (
                F.abs(F.col("n_union_hll") - F.col("n_union"))
                <= HLL_SET_TOL * F.col("n_union")
            ).alias("hll_union_within_tol"),
        )
    )
    return eager_release(out, "hll_set_algebra", u, m)


# Trimmed-mean cut: drop values strictly outside the [p05, p95]
# percentile band before averaging.
TRIM_LO, TRIM_HI = 0.05, 0.95


@register(
    "agg_trimmed_mean",
    oracle=f"""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, {TRIM_LO}) AS lo,
             quantile_cont(value, {TRIM_HI}) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_all,
           CAST(sum(CASE WHEN e.value >= q.lo AND e.value <= q.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(CAST(sum(CASE WHEN e.value >= q.lo AND e.value <= q.hi
                              THEN CAST(e.value AS DECIMAL(18,2))
                              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / sum(CASE WHEN e.value >= q.lo AND e.value <= q.hi
                            THEN 1 ELSE 0 END), 6) AS trimmed_mean,
           round(CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 6) AS raw_mean
    FROM events e JOIN q USING (event_type)
    GROUP BY e.event_type
    """,
    doc="Trimmed mean per key (drop the tails outside [p"
    f"{int(TRIM_LO * 100)}, p{int(TRIM_HI * 100)}], average the "
    "interior): the robust location estimate between the mean "
    "(outlier-dragged) and the median (throws away 98% of the "
    "information) — metric pipelines report exactly this to keep one "
    "fat-fingered value from moving a KPI, beside quality_winsorize "
    "which CLIPS tails instead of dropping them. Percentile "
    "boundaries are exact interpolation (the agg_percentile_exact "
    "parity), dimension-sized, broadcast back to the scan; interior "
    "values accumulate in exact DECIMAL so the trimmed sum can never "
    "flip on order, with ONE final division. Two corpus passes "
    "(boundaries, then the gated aggregate) — at 100 TB swap pass "
    "one for approx_percentile's sketch and the shape holds.",
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    q = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(TRIM_LO)).alias("lo"),
        F.percentile("value", F.lit(TRIM_HI)).alias("hi"),
    )
    j = e.join(F.broadcast(q), "event_type")
    keep = (F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi"))
    dec = F.col("value").cast("decimal(18,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.round(
            F.sum(F.when(keep, dec).otherwise(zero)).cast("double")
            / F.sum(F.when(keep, 1).otherwise(0)),
            6,
        ).alias("trimmed_mean"),
        F.round(F.sum(dec).cast("double") / F.count(F.lit(1)), 6).alias("raw_mean"),
    )


# --- bitmap-word exact distinct (round 12) ------------------------------


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users,
           CAST(count(DISTINCT user_id // 64) AS BIGINT) AS n_words
    FROM events GROUP BY 1
    """,
    doc="Exact per-day distinct users via TWO-LEVEL BITMAP aggregation "
    "— the ClickHouse groupBitmap / roaring-bitmap shape "
    "(reference's engine ships groupBitmap for exactly this): stage "
    "1 groups by (day, user_id >> 6) and ORs the 64-bit word "
    "1 << (user_id & 63); stage 2 sums popcounts per day. The "
    "oracle is count(DISTINCT user_id) — an INDEPENDENT algorithm, "
    "so the gate proves the bitmap math, not a shared formulation. "
    "Scale shape: the shuffle carries one 8-byte word per POPULATED "
    "64-id block instead of one row per raw id (1B daily users -> "
    "16M words), map-side combine ORs words before the exchange, "
    "and both stages are plain hash aggregates — no count-distinct "
    "expansion, no sort. This is the exact-cardinality fallback "
    "when agg_approx_distinct's HLL error bound is not acceptable "
    "(billing-grade dedup counts).",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    words = e.select(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.shiftright(F.col("user_id"), 6).alias("word_idx"),
        F.expr("shiftleft(1L, cast(user_id % 64 as int))").alias("bit"),
    ).groupBy("day", "word_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.expr("bit_or(bit)").alias("word"),
    )
    return words.groupBy("day").agg(
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum(F.bit_count("word")).cast("bigint").alias("n_distinct_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
    )
