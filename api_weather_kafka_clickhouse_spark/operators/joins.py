"""Join operators: broadcast/shuffle equi-joins, semi/anti, outer,
interval (range) join, and as-of join.

The reference has no joins (SURVEY.md §2-C); its closest analogues are
the broadcast-style dict lookups (app/Producer_clickhouse.py:86-92,
app/city_loader.py:46-51), which map to the broadcast-hash joins here.

Scale strategy per join:
- dimension joins (nation/region/supplier, the routing table): always
  `F.broadcast` — no shuffle of the 100 TB fact side.
- fact-fact joins (lineitem ⋈ orders): shuffle hash/sort-merge on the
  join key; AQE handles skew splitting. At 100 TB, pre-bucketing both
  tables on orderkey removes this shuffle entirely (see plans/).
- interval/as-of joins: equi-key first (user_id), range predicate
  second, so Spark runs a per-key hash join + filter instead of a
  cartesian nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import money
from ..registry import register
from ..tables import load


@register(
    "join_flagship_revenue",
    oracle="""
    SELECT n.n_name,
           year(o.o_orderdate)  AS yr,
           month(o.o_orderdate) AS mo,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, year(o.o_orderdate), month(o.o_orderdate)
    """,
    doc="Flagship: revenue by nation x month over a 4-table join "
    "(scan -> filterless fact join -> broadcast dims -> agg). The "
    "driver's entry(spark) smoke query.",
)
def join_flagship_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    o = load(spark, "orders", sf_dir)
    c = load(spark, "customer", sf_dir)
    n = load(spark, "nation", sf_dir)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.month("o_orderdate").cast("bigint").alias("mo"),
        )
        .agg(
            F.sum(money("l_extendedprice") * (1 - F.col("l_discount").cast("decimal(4,2)")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "join_broadcast_region",
    oracle="""
    SELECT r.r_name,
           count(*) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="Two chained broadcast-hash joins against tiny dims (the "
    "reference's topic-routing lookup A10, generalized).",
)
def join_broadcast_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    n = load(spark, "nation", sf_dir)
    r = load(spark, "region", sf_dir)
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(money("c_acctbal")).cast("double").alias("acctbal_sum"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
    """,
    doc="Left-semi join (EXISTS). No fact columns survive the join, so "
    "Spark keeps only the build-side keys — minimal shuffle payload.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir).filter(F.col("o_totalprice") > 150000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join (NOT EXISTS).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey,
           count(o.o_orderkey) AS n_orders,
           CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 0)
                AS DOUBLE) AS total_spend
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    doc="Left-outer join preserving zero-order customers.",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir)
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(money("o_totalprice")), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend"),
        )
    )


@register(
    "join_null_safe",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, nullif(o_orderpriority, '1-URGENT') AS k FROM orders
    ), d AS (
      SELECT DISTINCT k FROM a
    )
    SELECT d.k, count(*) AS n
    FROM d JOIN a ON a.k IS NOT DISTINCT FROM d.k
    GROUP BY d.k
    """,
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL "
    "keys match each other instead of vanishing — the semantics "
    "needed when a nullable column is a legitimate join key.",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    a = o.select(
        "o_orderkey", F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("ak")
    )
    d = a.select(F.col("ak").alias("k")).distinct()
    return (
        d.join(a, F.col("k").eqNullSafe(F.col("ak")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT coalesce(cn.nationkey, sn.nationkey) AS nationkey,
           (cn.nationkey IS NOT NULL) AS has_customers,
           (sn.nationkey IS NOT NULL) AS has_suppliers
    FROM      (SELECT DISTINCT c_nationkey AS nationkey FROM customer) cn
    FULL JOIN (SELECT DISTINCT s_nationkey AS nationkey FROM supplier) sn
           ON cn.nationkey = sn.nationkey
    """,
    doc="Full-outer join over deduplicated keys.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = load(spark, "customer", sf_dir).select(F.col("c_nationkey").alias("cnk")).distinct()
    sn = load(spark, "supplier", sf_dir).select(F.col("s_nationkey").alias("snk")).distinct()
    return cn.join(sn, cn.cnk == sn.snk, "full").select(
        F.coalesce("cnk", "snk").alias("nationkey"),
        F.col("cnk").isNotNull().alias("has_customers"),
        F.col("snk").isNotNull().alias("has_suppliers"),
    )


@register(
    "join_interval_pairs",
    oracle="""
    SELECT a.user_id,
           a.event_id AS first_id,
           b.event_id AS next_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND b.ts >= a.ts
     AND b.ts < a.ts + INTERVAL 10 MINUTE
    """,
    doc="Interval (range) self-join: pairs of events by the same user "
    "within 10 minutes. Equi-key on user_id first so Spark executes a "
    "hash join + range filter, never a cartesian product — per-user "
    "buckets keep this linear-ish at 100 TB.",
)
def join_interval_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    a = e.select(
        F.col("user_id"),
        F.col("event_id").alias("first_id"),
        F.col("ts").alias("a_ts"),
    )
    b = e.select(
        F.col("user_id").alias("b_user_id"),
        F.col("event_id").alias("next_id"),
        F.col("ts").alias("b_ts"),
    )
    return (
        a.join(
            b,
            (a.user_id == b.b_user_id)
            & (F.col("first_id") < F.col("next_id"))
            & (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") < F.col("a_ts") + F.expr("INTERVAL 10 MINUTES")),
        )
        .select(
            "user_id",
            "first_id",
            "next_id",
            (F.unix_micros("b_ts") - F.unix_micros("a_ts")).alias("gap_us"),
        )
    )


@register(
    "join_asof",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             last_value(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_error_id,
             last_value(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_error_ts
      FROM events
      WHERE event_type IN ('purchase', 'error')
    )
    SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
           last_error_id, last_error_ts
    FROM marked
    WHERE event_type = 'purchase'
    """,
    doc="As-of join: each purchase matched to the most recent error by "
    "the same user at-or-before it. Implemented as union + running "
    "last-value window — the scalable as-of pattern (one shuffle on "
    "user_id, no per-row probes), vs. pd.merge_asof per group.",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir).filter(F.col("event_type").isin("purchase", "error"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_err = F.col("event_type") == "error"
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.last(F.when(is_err, F.col("event_id")), ignorenulls=True).over(w).alias("last_error_id"),
        F.last(F.when(is_err, F.col("ts")), ignorenulls=True).over(w).alias("last_error_ts"),
    )
    return marked.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "last_error_id",
        "last_error_ts",
    )


RANGE_WINDOW_US = 60_000_000  # |dt| <= 60 s


@register(
    "join_range_keyless",
    oracle=f"""
    SELECT a.event_id AS a_id, b.event_id AS b_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
    FROM events a JOIN events b
      ON a.event_type = 'signup' AND b.event_type = 'purchase'
     AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= {RANGE_WINDOW_US}
    """,
    doc="Range join with NO equi-key (every signup paired with every "
    "purchase within 60 s, corpus-wide): the shape that naively plans "
    "as an O(n^2) nested loop. The scale strategy is bucketization — "
    "both sides bucket by 60 s epoch windows, ONE side explodes to "
    "its 3 adjacent buckets, and the join becomes a bucket equi-join "
    "+ exact range filter. Any qualifying pair shares a bucket with "
    "one of the 3 probes, so recall is exact (and each pair matches "
    "exactly once: the non-exploded side has a single bucket). Cost "
    "is 3x the build side + per-bucket products instead of |A| x |B|; "
    "at 100 TB the bucket column is also the partition key, so the "
    "join shuffles time-locally instead of globally. Time arithmetic "
    "in exact integer microseconds on both engines.",
)
def join_range_keyless(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    us = F.unix_micros(F.col("ts"))
    a = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("a_id"), us.alias("a_us")
    )
    b = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("b_id"), us.alias("b_us")
    )
    return range_join_keyless(a, b)


def range_join_keyless(a: DataFrame, b: DataFrame, window_us: int = RANGE_WINDOW_US) -> DataFrame:
    """The bucketized kernel over (a_id, a_us) x (b_id, b_us) — called
    by the registered operator AND the boundary-semantics test, so the
    test exercises the real implementation."""
    bkt = lambda c: F.floor(c / F.lit(window_us)).cast("long")  # noqa: E731
    a_b = a.withColumn("bkt", bkt(F.col("a_us")))
    b_b = b.select(
        "b_id",
        "b_us",
        F.explode(
            F.array(bkt(F.col("b_us")) - 1, bkt(F.col("b_us")), bkt(F.col("b_us")) + 1)
        ).alias("bkt"),
    )
    return (
        a_b.join(b_b, "bkt")
        .filter(F.abs(F.col("b_us") - F.col("a_us")) <= window_us)
        .select("a_id", "b_id", (F.col("b_us") - F.col("a_us")).alias("dt_us"))
    )


BLOOM_JOIN_NATION = "NATION_3"  # has suppliers at every test SF


@register(
    "join_bloom_prefilter",
    oracle=f"""
    SELECT l.l_suppkey AS suppkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    WHERE l.l_suppkey IN (
      SELECT s.s_suppkey FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = '{BLOOM_JOIN_NATION}'
    )
    GROUP BY l.l_suppkey
    """,
    doc="Runtime-filter join (sideways information passing): the "
    "small side (suppliers of one nation) is compiled into a Bloom "
    "bitset and applied to the FACT SCAN as a whole-stage-codegen "
    "prefilter BEFORE any join, then an exact broadcast semi-join "
    "removes the Bloom's false positives. Result is bit-identical to "
    "the plain semi-join (the oracle) because the Bloom only ever "
    "over-admits. This is the 100 TB shape Spark's own "
    "spark.sql.optimizer.runtimeFilter implements for shuffle joins: "
    "with a selective dimension predicate, 99%+ of fact rows die at "
    "scan speed without being shuffled, hashed, or even having their "
    "other columns decoded. Bitset spec = the shared md5-window hash "
    "kernel (functions/hashing.py), so even the prefilter itself is "
    "engine-reproducible.",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .bloom import bloom_member, build_bloom_bits, _bits_literal

    s = load(spark, "supplier", sf_dir)
    n = load(spark, "nation", sf_dir)
    keep = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .filter(F.col("n_name") == BLOOM_JOIN_NATION)
        .select(F.col("s_suppkey").alias("keep_key"))
    )
    bits = build_bloom_bits(keep.select(F.col("keep_key").cast("string").alias("gram")))
    li = load(spark, "lineitem", sf_dir)
    prefiltered = li.filter(bloom_member(F.col("l_suppkey").cast("string"), _bits_literal(bits)))
    exact = prefiltered.join(
        F.broadcast(keep), F.col("l_suppkey") == F.col("keep_key"), "left_semi"
    )
    return (
        exact.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(money("l_extendedprice") * (1 - F.col("l_discount").cast("decimal(4,2)")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


JOIN_SALT_WAYS = 16


@register(
    "join_salted_skew",
    oracle="""
    WITH dim AS (
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_status,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS avg_price
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o.o_orderkey, o.o_orderstatus, d.n_status,
           round(CAST(o.o_totalprice AS DOUBLE) - d.avg_price, 6) AS price_delta
    FROM orders o JOIN dim d USING (o_orderstatus)
    """,
    doc="Salted skew JOIN — the join-side twin of agg_salted_skew, "
    "over the same genuinely skewed key (o_orderstatus: 3 values, one "
    "holding ~half the table). A plain shuffle join on the skew key "
    "sends half the fact table to ONE reducer; here the dim side is "
    f"replicated {JOIN_SALT_WAYS}x (one row per salt — trivially "
    "cheap, the dim is per-key aggregates) and each fact row carries "
    "salt = hash(unique key) mod ways, so the join shuffles on "
    "(key, salt) and the hot key's rows spread over "
    f"{JOIN_SALT_WAYS} reducers. Results are EXACTLY the plain join "
    "(the oracle is the unsalted SQL): salting changes partitioning, "
    "never matching. A merge hint pins the sort-merge path because "
    "at test scale the replicated dim would be broadcast — which is "
    "the RIGHT plan when the dim fits memory; manual salting is for "
    "the cases AQE's skew handling cannot reach: dims too big to "
    "broadcast, streaming state joins, or engines without runtime "
    "re-planning.",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    n = F.count(F.lit(1))
    dim = o.groupBy("o_orderstatus").agg(
        n.alias("n_status"),
        (F.sum(money("o_totalprice")).cast("double") / n).alias("avg_price"),
    )
    salts = spark.range(JOIN_SALT_WAYS).select(F.col("id").cast("int").alias("salt"))
    salted_dim = dim.crossJoin(salts)
    fact = o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.pmod(F.xxhash64("o_orderkey"), F.lit(JOIN_SALT_WAYS)).cast("int").alias("salt"),
    )
    return (
        fact.join(salted_dim.hint("merge"), ["o_orderstatus", "salt"])
        .select(
            "o_orderkey",
            "o_orderstatus",
            "n_status",
            F.round(F.col("o_totalprice").cast("double") - F.col("avg_price"), 6).alias(
                "price_delta"
            ),
        )
    )


# As-of tolerance: matches staler than this are rejected (NULLed),
# the pandas merge_asof(tolerance=...) semantics.
ASOF_TOLERANCE_MIN = 60


@register(
    "join_asof_tolerance",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             last_value(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
               OVER w AS last_error_id,
             last_value(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
               OVER w AS last_error_ts
      FROM events
      WHERE event_type IN ('purchase', 'error')
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
           CASE WHEN last_error_ts >= ts - INTERVAL {ASOF_TOLERANCE_MIN} MINUTE
                THEN last_error_id END AS error_id,
           CASE WHEN last_error_ts >= ts - INTERVAL {ASOF_TOLERANCE_MIN} MINUTE
                THEN last_error_ts END AS error_ts,
           (last_error_ts IS NOT NULL
            AND last_error_ts < ts - INTERVAL {ASOF_TOLERANCE_MIN} MINUTE)
             AS match_too_stale
    FROM marked
    WHERE event_type = 'purchase'
    """,
    doc="As-of join with a staleness tolerance (pandas "
    f"merge_asof(tolerance=...) semantics): each purchase matches the "
    f"most recent prior error by the same user ONLY if it is at most "
    f"{ASOF_TOLERANCE_MIN} minutes old — older state is stale and must "
    "NOT silently attach (feature-freshness enforcement in feature "
    "stores; join_asof keeps any-age matches). Same scalable shape as "
    "join_asof — union + one running ignore-nulls window on the "
    "user_id shuffle, no per-row probes — plus a pure-codegen "
    "tolerance gate; the rejected-match flag is kept so staleness is "
    "observable rather than silently null.",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir).filter(F.col("event_type").isin("purchase", "error"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_err = F.col("event_type") == "error"
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.last(F.when(is_err, F.col("event_id")), ignorenulls=True).over(w).alias("last_error_id"),
        F.last(F.when(is_err, F.col("ts")), ignorenulls=True).over(w).alias("last_error_ts"),
    )
    fresh = F.col("last_error_ts") >= F.col("ts") - F.expr(
        f"INTERVAL {ASOF_TOLERANCE_MIN} MINUTES"
    )
    return marked.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.when(fresh, F.col("last_error_id")).alias("error_id"),
        F.when(fresh, F.col("last_error_ts")).alias("error_ts"),
        (F.col("last_error_ts").isNotNull() & ~fresh).alias("match_too_stale"),
    )


@register(
    "join_any_left",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus,
           l.l_linenumber AS first_linenumber,
           CAST(l.l_quantity AS DOUBLE) AS first_quantity,
           (l.l_linenumber IS NULL) AS unmatched
    FROM orders o
    LEFT JOIN (
      SELECT l_orderkey, l_linenumber, l_quantity FROM (
        SELECT l_orderkey, l_linenumber, l_quantity,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_linenumber, l_quantity,
                                           l_extendedprice, l_partkey,
                                           l_suppkey) AS rk
        FROM lineitem
      ) WHERE rk = 1
    ) l ON l.l_orderkey = o.o_orderkey
    """,
    doc="ClickHouse ANY LEFT JOIN, determinized: each left row "
    "attaches AT MOST ONE right match — ClickHouse picks an arbitrary "
    "one ('any'), which can never hash-check, so this engine pins the "
    "choice to an explicit total order (lowest line number), the "
    "production-safe reading of every 'any join' migration. Shape: "
    "the right side collapses to one row per key BEFORE the join "
    "(WindowGroupLimit rn=1 on the right's own key partition — at "
    "100 TB this is a partial per-key reduction, not a post-join "
    "dedup, so join fanout never exists); the join itself is then a "
    "plain 1:1 left join. Unmatched left rows keep NULLs and an "
    "explicit flag.",
)
def join_any_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir)
    # (orderkey, linenumber) is NOT unique in this synthetic data
    # (dgen assigns line numbers randomly) — the 'any' choice needs a
    # TOTAL order, extended until a unique composite is reached
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_quantity", "l_extendedprice", "l_partkey", "l_suppkey"
    )
    first = (
        li.select(
            "l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_partkey", "l_suppkey",
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )
    return (
        o.select("o_orderkey", "o_orderstatus")
        .join(first, F.col("l_orderkey") == F.col("o_orderkey"), "left")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.col("l_linenumber").alias("first_linenumber"),
            F.col("l_quantity").cast("double").alias("first_quantity"),
            F.col("l_linenumber").isNull().alias("unmatched"),
        )
    )


# --- range join via time-axis bucketing (round 10) --------------------

# Deterministic campaign-interval dimension derived from nation keys:
# 25 intervals over the order-date range, start/length spread by
# integer arithmetic on the key (no RNG — both engines re-derive it).
CAMPAIGN_EPOCH_BASE = 9500  # days since 1970-01-01, inside o_orderdate's range
CAMPAIGN_SPREAD_D = 47
CAMPAIGN_SPAN_D = 900
CAMPAIGN_MIN_LEN_D = 5
CAMPAIGN_LEN_MOD = 11
BUCKET_D = 7  # bucket width: one week


@register(
    "join_interval_bucket",
    oracle=f"""
    WITH camp AS (
      SELECT n_nationkey AS campaign_id,
             {CAMPAIGN_EPOCH_BASE} + (n_nationkey * {CAMPAIGN_SPREAD_D})
               % {CAMPAIGN_SPAN_D} AS start_d,
             {CAMPAIGN_EPOCH_BASE} + (n_nationkey * {CAMPAIGN_SPREAD_D})
               % {CAMPAIGN_SPAN_D}
               + {CAMPAIGN_MIN_LEN_D} + n_nationkey % {CAMPAIGN_LEN_MOD} AS end_d
      FROM nation
    ),
    o AS (
      SELECT o_orderkey,
             date_diff('day', DATE '1970-01-01', o_orderdate) AS od,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders
    )
    SELECT c.campaign_id,
           CAST(c.end_d - c.start_d + 1 AS BIGINT) AS len_days,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(CAST(coalesce(sum(o.price), 0) AS DECIMAL(38,2)) AS DOUBLE)
             AS revenue
    FROM camp c LEFT JOIN o
      ON o.od BETWEEN c.start_d AND c.end_d
    GROUP BY c.campaign_id, c.end_d - c.start_d + 1
    """,
    doc="Range (interval-containment) join at scale: orders against a "
    "deterministic campaign-interval dimension, implemented by "
    "BUCKETING THE TIME AXIS — each interval explodes into the week "
    "buckets it overlaps (ceil(len/bucket)+1 rows, bounded by the "
    "interval-length cap), each order maps to exactly one bucket, "
    "and ONE equi-join on the bucket key + a residual BETWEEN filter "
    "replaces the non-equi theta join Spark would otherwise plan as "
    "broadcast-nested-loop. The replication factor is len/bucket — a "
    "DIMENSION property, never corpus-sized — which is the same "
    "bounded-amplification argument as geo's 3x3 cell expansion and "
    "time_hopping_windows' SIZE/HOP constant; at 100 TB the bucket "
    "key is also the natural time-partition pruner. LEFT semantics "
    "keep empty campaigns (anti-joined buckets) with zero counts. "
    "The oracle brute-forces the BETWEEN join; day arithmetic is "
    "exact integer epoch-days, revenue sums in DECIMAL.",
)
def join_interval_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, "nation", sf_dir)
    camp = n.select(
        F.col("n_nationkey").alias("campaign_id"),
        (
            F.lit(CAMPAIGN_EPOCH_BASE)
            + (F.col("n_nationkey") * CAMPAIGN_SPREAD_D) % CAMPAIGN_SPAN_D
        ).alias("start_d"),
        (
            F.lit(CAMPAIGN_EPOCH_BASE)
            + (F.col("n_nationkey") * CAMPAIGN_SPREAD_D) % CAMPAIGN_SPAN_D
            + CAMPAIGN_MIN_LEN_D
            + F.col("n_nationkey") % CAMPAIGN_LEN_MOD
        ).alias("end_d"),
    )
    # interval -> overlapped week buckets (sequence is inclusive and
    # integer-stepped; start_d div 7 .. end_d div 7 covers every day)
    camp_b = camp.select(
        "*",
        F.explode(
            F.sequence(
                F.expr(f"start_d div {BUCKET_D}"), F.expr(f"end_d div {BUCKET_D}")
            )
        ).alias("bucket"),
    )
    o = load(spark, "orders", sf_dir).select(
        "o_orderkey",
        F.datediff("o_orderdate", F.to_date(F.lit("1970-01-01"))).alias("od"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    ).select("*", F.expr(f"od div {BUCKET_D}").alias("bucket"))
    # LEFT semantics under bucketing: the inner bucket join + residual
    # filter computes the MATCHES; campaigns with zero in-range orders
    # re-enter via the left join back onto the dimension (filtering a
    # left join's probe side after the fact would drop them).
    agg = (
        camp_b.join(o, "bucket")
        .filter((F.col("od") >= F.col("start_d")) & (F.col("od") <= F.col("end_d")))
        .groupBy("campaign_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("price").cast("decimal(38,2)").alias("rev"),
        )
    )
    return (
        camp.join(agg, "campaign_id", "left")
        .select(
            "campaign_id",
            (F.col("end_d") - F.col("start_d") + 1).cast("bigint").alias("len_days"),
            F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias("n_orders"),
            F.coalesce(F.col("rev"), F.lit(0).cast("decimal(38,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


# --- nearest-direction as-of join (round 11 continuation) ---------------


@register(
    "join_asof_nearest",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             last_value(CASE WHEN event_type = 'error' THEN event_id END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS bwd_id,
             last_value(CASE WHEN event_type = 'error' THEN epoch_us(ts) END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS bwd_us,
             first_value(CASE WHEN event_type = 'error' THEN event_id END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS fwd_id,
             first_value(CASE WHEN event_type = 'error' THEN epoch_us(ts) END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS fwd_us
      FROM events
      WHERE event_type IN ('purchase', 'error')
    )
    SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
           CASE WHEN bwd_id IS NULL AND fwd_id IS NULL THEN NULL
                WHEN fwd_id IS NULL THEN bwd_id
                WHEN bwd_id IS NULL THEN fwd_id
                WHEN epoch_us(ts) - bwd_us <= fwd_us - epoch_us(ts)
                  THEN bwd_id ELSE fwd_id END AS nearest_error_id,
           CASE WHEN bwd_id IS NULL AND fwd_id IS NULL THEN NULL
                WHEN fwd_id IS NULL THEN 'backward'
                WHEN bwd_id IS NULL THEN 'forward'
                WHEN epoch_us(ts) - bwd_us <= fwd_us - epoch_us(ts)
                  THEN 'backward' ELSE 'forward' END AS direction,
           CAST(CASE WHEN bwd_id IS NULL AND fwd_id IS NULL THEN NULL
                WHEN fwd_id IS NULL THEN epoch_us(ts) - bwd_us
                WHEN bwd_id IS NULL THEN fwd_us - epoch_us(ts)
                ELSE least(epoch_us(ts) - bwd_us, fwd_us - epoch_us(ts))
                END AS BIGINT) AS abs_delta_us
    FROM marked
    WHERE event_type = 'purchase'
    """,
    doc="Nearest-direction as-of join: each purchase matched to the "
    "CLOSEST error by the same user in either time direction (pandas "
    "merge_asof(direction='nearest'); join_asof is backward-only, "
    "join_asof_tolerance backward-bounded). Same scalable shape as "
    "join_asof — union both streams, ONE shuffle on user_id, then a "
    "running last_value over the past and a first_value over the "
    "future in the same sort order (two frames over one window "
    "spec, no second shuffle, no per-row probe join). Distances are "
    "exact integer microseconds; the backward candidate wins exact "
    "ties. Same-timestamp errors are governed by the (ts, event_id) "
    "tuple order — the forward frame starts at CURRENT ROW, so both "
    "engines cut identically.",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir).filter(
        F.col("event_type").isin("purchase", "error")
    )
    is_err = F.col("event_type") == "error"
    err_id = F.when(is_err, F.col("event_id"))
    err_us = F.when(is_err, F.unix_micros("ts"))
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.last(err_id, ignorenulls=True).over(wb).alias("bwd_id"),
        F.last(err_us, ignorenulls=True).over(wb).alias("bwd_us"),
        F.first(err_id, ignorenulls=True).over(wf).alias("fwd_id"),
        F.first(err_us, ignorenulls=True).over(wf).alias("fwd_us"),
    )
    p_us = F.unix_micros("ts")
    d_bwd = p_us - F.col("bwd_us")
    d_fwd = F.col("fwd_us") - p_us
    both_null = F.col("bwd_id").isNull() & F.col("fwd_id").isNull()
    backward_wins = d_bwd <= d_fwd
    return marked.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.when(both_null, F.lit(None).cast("bigint"))
        .when(F.col("fwd_id").isNull(), F.col("bwd_id"))
        .when(F.col("bwd_id").isNull(), F.col("fwd_id"))
        .when(backward_wins, F.col("bwd_id"))
        .otherwise(F.col("fwd_id"))
        .alias("nearest_error_id"),
        F.when(both_null, F.lit(None).cast("string"))
        .when(F.col("fwd_id").isNull(), F.lit("backward"))
        .when(F.col("bwd_id").isNull(), F.lit("forward"))
        .when(backward_wins, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
        F.when(both_null, F.lit(None).cast("bigint"))
        .when(F.col("fwd_id").isNull(), d_bwd)
        .when(F.col("bwd_id").isNull(), d_fwd)
        .otherwise(F.least(d_bwd, d_fwd))
        .cast("bigint")
        .alias("abs_delta_us"),
    )


# --- phonetic blocking for entity resolution (round 11 continuation) ----

# Simplified-Soundex blocking key, ONE SQL text shared verbatim by both
# engines (the jarque_bera discipline). Deliberately not java/duckdb
# soundex builtins (absent/divergent): first letter preserved, vowels +
# h/w/y dropped from the tail, consonants mapped to the classic Soundex
# digit classes, first three digits zero-padded. Coarser than classic
# Soundex (no run collapsing - RE2 has no backreferences, so a shared
# regex can't express it), which for BLOCKING only trades a few extra
# candidate pairs for engine-exact reproducibility.
PHONETIC_KEY_SQL = (
    "upper(substr({w}, 1, 1)) || rpad(substr(translate(translate("
    "substr({w}, 2), 'aeiouyhw', ''), 'bfpvcgjkqszxdtlmnr', "
    "'111122222222334556'), 1, 3), 3, '0')"
)


@register(
    "er_phonetic_blocking",
    oracle=f"""
    WITH k AS (
      SELECT p_partkey, split_part(p_name, ' ', 1) AS word,
             {PHONETIC_KEY_SQL.format(w="split_part(p_name, ' ', 1)")}
               AS block_key
      FROM part
    )
    SELECT block_key,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT word) AS BIGINT) AS n_words,
           CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS candidate_pairs,
           array_to_string(list_sort(list_distinct(list(word))), ',')
             AS words
    FROM k GROUP BY block_key
    """,
    doc="Phonetic blocking for entity resolution: bucket part records "
    "by a simplified-Soundex key of the leading name word, so the "
    "expensive pairwise matcher (fuzzy_match_damerau / "
    "fuzzy_match_blocked) only runs INSIDE blocks — the classic "
    "quadratic-to-near-linear ER reduction, robust to the "
    "vowel-confusion misspellings exact-prefix blocking misses "
    "('grean'/'green' share G650). Emits per-block size, distinct-word census, the "
    "candidate-pair count the matcher would price, and the member "
    "words. The key is one shared SQL expression (translate + "
    "substr chains, no regex, no UDF) evaluated identically by "
    "both engines; one map-side-combined groupBy — blocking 100 TB "
    "costs a scan plus a block-dimension shuffle.",
)
def er_phonetic_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, "part", sf_dir)
    word = F.expr("split_part(p_name, ' ', 1)")
    key = F.expr(PHONETIC_KEY_SQL.format(w="split_part(p_name, ' ', 1)"))
    k = p.select(word.alias("word"), key.alias("block_key"))
    return k.groupBy("block_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.countDistinct("word").cast("bigint").alias("n_words"),
        # n(n-1) is even, so the subtract-mod idiom divides exactly in
        # integers — Spark's / on bigint is DOUBLE and loses exactness
        # past 2^53 (round-11 review finding)
        F.expr(
            "(count(1) * (count(1) - 1)"
            " - (count(1) * (count(1) - 1)) % 2) DIV 2"
        )
        .cast("bigint")
        .alias("candidate_pairs"),
        F.array_join(
            F.array_sort(F.array_distinct(F.collect_list("word"))), ","
        ).alias("words"),
    )
