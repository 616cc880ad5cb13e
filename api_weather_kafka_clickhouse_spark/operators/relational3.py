"""Third coverage battery: printf-style formatting, translate/locate,
null-handling functions, and an explicit (deliberate) cross join.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


@register(
    "scalar_format",
    oracle="""
    SELECT s_suppkey,
           printf('%s#%05d', s_name, s_suppkey) AS tag,
           repeat('-', 5)                        AS rule,
           left(s_name, 4)                       AS name_l4,
           right(s_name, 3)                      AS name_r3,
           instr(s_name, 'e')                    AS first_e,
           translate(s_name, 'aeiou', 'AEIOU')   AS shouty_vowels
    FROM supplier
    """,
    doc="printf/repeat/left/right/instr/translate battery (§2-E "
    "f-string templating parity, Producer:67,81).",
)
def scalar_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, "supplier", sf_dir)
    return s.select(
        "s_suppkey",
        F.format_string("%s#%05d", F.col("s_name"), F.col("s_suppkey")).alias("tag"),
        F.repeat(F.lit("-"), 5).alias("rule"),
        F.left(F.col("s_name"), F.lit(4)).alias("name_l4"),
        F.right(F.col("s_name"), F.lit(3)).alias("name_r3"),
        F.instr(F.col("s_name"), "e").cast("bigint").alias("first_e"),
        F.translate(F.col("s_name"), "aeiou", "AEIOU").alias("shouty_vowels"),
    )


@register(
    "scalar_nulls",
    oracle="""
    SELECT c_custkey,
           nullif(c_mktsegment, 'BUILDING')                    AS seg_or_null,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'N/A')   AS seg_filled,
           (nullif(c_mktsegment, 'BUILDING') IS NULL)          AS is_building,
           greatest(c_acctbal, 0.0)                            AS bal_floor0,
           least(c_acctbal, 1000.0)                            AS bal_cap1k
    FROM customer
    """,
    doc="NULL-handling battery: nullif/coalesce/is-null/greatest/"
    "least — the reference's dict.get default semantics as "
    "expressions (clickhouse_db.py:45-82).",
)
def scalar_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    seg_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg_null.alias("seg_or_null"),
        F.coalesce(seg_null, F.lit("N/A")).alias("seg_filled"),
        seg_null.isNull().alias("is_building"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_cap1k"),
    )


@register(
    "scalar_strings3",
    oracle="""
    SELECT c_custkey,
           split_part(c_name, '#', 1)                       AS name_head,
           regexp_replace(c_name, '[0-9]+', 'N', 'g')       AS name_nodigits,
           md5(c_name)                                      AS name_md5,
           sha256(c_name)                                   AS name_sha256,
           CAST(strpos(c_name, '#') AS BIGINT)              AS hash_pos
    FROM customer
    """,
    doc="String battery 3: split_part, global regexp_replace, "
    "md5/sha256 content hashing (the dedup fingerprint primitives as "
    "scalar functions), substring position.",
)
def scalar_strings3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    return c.select(
        "c_custkey",
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_head"),
        F.regexp_replace("c_name", "[0-9]+", "N").alias("name_nodigits"),
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.instr(F.col("c_name"), "#").cast("bigint").alias("hash_pos"),
    )


@register(
    "scalar_arrays_maps",
    oracle="""
    SELECT p_partkey,
           len(string_split(p_name, ' '))                              AS n_words,
           array_to_string(list_slice(string_split(p_name, ' '), 1, 3), ' ') AS first3,
           array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_words,
           list_contains(string_split(p_name, ' '), 'green')           AS has_green,
           CAST(list_position(string_split(p_name, ' '), 'green') AS BIGINT) AS pos_green,
           list_max(string_split(p_name, ' '))                         AS max_word,
           map(['brand', 'size'], [p_brand, CAST(p_size AS VARCHAR)])['brand'][1] AS brand_val
    FROM part
    """,
    doc="Array + map function battery (§2-E in-flight array/map "
    "shapes): slice/sort/contains/position/max over word arrays and a "
    "build-then-extract over a string map. All outputs scalar — the "
    "driver canonicalizer cannot hash array or map cells. "
    "Cross-engine notes: both engines are 1-based with position 0 for "
    "missing; DuckDB map extraction yields a 1-element list, "
    "unwrapped with [1].",
)
def scalar_arrays_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, "part", sf_dir)
    arr = F.split("p_name", " ")
    m = F.map_from_arrays(
        F.array(F.lit("brand"), F.lit("size")),
        F.array(F.col("p_brand"), F.col("p_size").cast("string")),
    )
    return p.select(
        "p_partkey",
        F.size(arr).cast("bigint").alias("n_words"),
        F.array_join(F.slice(arr, 1, 3), " ").alias("first3"),
        F.array_join(F.sort_array(arr), ",").alias("sorted_words"),
        F.array_contains(arr, "green").alias("has_green"),
        F.array_position(arr, "green").cast("bigint").alias("pos_green"),
        F.array_max(arr).alias("max_word"),
        F.element_at(m, "brand").alias("brand_val"),
    )


@register(
    "fuzzy_match_levenshtein",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS edit_dist
    FROM nation a
    JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE levenshtein(a.n_name, b.n_name) <= 4
    """,
    doc="Fuzzy key matching via edit distance: nation-name pairs "
    "within levenshtein 4 — the record-linkage primitive for "
    "dirty-dimension joins. All-pairs is sanctioned only on the tiny "
    "dimension; at scale, block first (length band / first-char / "
    "q-gram LSH) and verify candidates, exactly like the text dedup "
    "operators.",
)
def fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, "nation", sf_dir)
    a = n.select(F.col("n_nationkey").alias("ka"), F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_nationkey").alias("kb"), F.col("n_name").alias("name_b"))
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, F.col("ka") < F.col("kb"))
        .filter(dist <= 4)
        .select("name_a", "name_b", dist.cast("bigint").alias("edit_dist"))
    )


@register(
    "fuzzy_match_blocked",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS edit_dist
    FROM nation a
    JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE levenshtein(a.n_name, b.n_name) <= 4
    """,
    doc="The scale twin of fuzzy_match_levenshtein: block-then-verify "
    "instead of all-pairs. Edit distance >= |len(a)-len(b)|, so a "
    "pair within distance 4 has a length gap <= 4; with length bands "
    "of width 5 the pair lands in the same or an adjacent band. One "
    "side keeps its band, the other explodes to (b-1, b, b+1), the "
    "join is a band-key EQUI-join (hash, never a cartesian), and "
    "levenshtein runs only on candidates. Lossless blocking: the "
    "oracle is the all-pairs result, identical pairs by construction. "
    "At 100 TB this is the dedup exact/LSH pairing applied to record "
    "linkage: candidates ~ n x band_density instead of n^2.",
)
def fuzzy_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    MAX_DIST, BAND_W = 4, 5
    n = load(spark, "nation", sf_dir)
    band = F.floor(F.length("n_name") / BAND_W)
    a = n.select(
        F.col("n_nationkey").alias("ka"), F.col("n_name").alias("name_a"), band.alias("band")
    )
    b = n.select(
        F.col("n_nationkey").alias("kb"),
        F.col("n_name").alias("name_b"),
        F.explode(F.array(band - 1, band, band + 1)).alias("band"),
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, "band")
        .filter(F.col("ka") < F.col("kb"))
        .filter(dist <= MAX_DIST)
        .select("name_a", "name_b", dist.cast("bigint").alias("edit_dist"))
    )


@register(
    "agg_value_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lo,
           CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS hi
    FROM orders
    GROUP BY 1
    """,
    doc="Fixed-width value histogram: bucket index from one integer "
    "division — a single map-side-combined aggregate, the scalable "
    "alternative to sorting for distribution overviews.",
)
def agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    return (
        o.groupBy(F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("lo"),
            F.max(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("hi"),
        )
    )


@register(
    "agg_bitwise",
    oracle="""
    SELECT o_orderstatus,
           CAST(bit_and(o_orderkey % 256) AS BIGINT) AS keys_and,
           CAST(bit_or(o_orderkey % 256)  AS BIGINT) AS keys_or,
           CAST(bit_xor(o_orderkey % 256) AS BIGINT) AS keys_xor
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Bitwise aggregate battery (bit_and/bit_or/bit_xor): "
    "fixed-size commutative partial state — flag-mask consolidation "
    "at scan speed.",
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    k = F.pmod(F.col("o_orderkey"), F.lit(256))
    return o.groupBy("o_orderstatus").agg(
        F.bit_and(k).cast("bigint").alias("keys_and"),
        F.bit_or(k).cast("bigint").alias("keys_or"),
        F.bit_xor(k).cast("bigint").alias("keys_xor"),
    )


@register(
    "join_cross_small",
    oracle="""
    SELECT r.r_name, s.o_orderstatus, count(*) AS n_combos
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    GROUP BY r.r_name, s.o_orderstatus
    """,
    doc="Deliberate cross join of two tiny deduplicated sides — the "
    "only sanctioned cartesian shape; fact-side cartesians are "
    "asserted absent in tests/test_plans.py.",
)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, "region", sf_dir)
    s = load(spark, "orders", sf_dir).select("o_orderstatus").distinct()
    return (
        r.crossJoin(s)
        .groupBy("r_name", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_combos"))
    )


# Z-order (Morton) interleave width: 16 bits per dimension -> 32-bit
# key. The interleave is a pure-arithmetic expression generated once
# and shared verbatim-in-structure by both engines.
ZORDER_BITS = 16


def _zorder_expr(px: str, py: str, shift_fn) -> str:
    """Morton-interleave SQL: sum of masked-bit*2^k terms.

    shift_fn renders a right-shift: Spark uses shiftright(x, i),
    DuckDB the >> operator — same arithmetic, same exact bigints.
    """
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"(({shift_fn(px, i)}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({shift_fn(py, i)}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


_Z_SPARK = _zorder_expr("l_partkey", "l_suppkey", lambda c, i: f"shiftright({c}, {i})")
_Z_DUCK = _zorder_expr("l_partkey", "l_suppkey", lambda c, i: f"({c} >> {i})")


@register(
    "layout_zorder_key",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CAST({_Z_DUCK} AS BIGINT) AS zkey
    FROM lineitem
    """,
    doc="Z-order (Morton) clustering key over (partkey, suppkey): "
    "interleaves the low 16 bits of each dimension so that sorting "
    "by zkey co-locates rows close in BOTH dimensions. This is the "
    "multi-dimensional data-skipping layout move at 100 TB: write "
    "parquet sortWithinPartitions(zkey) and min/max footer stats "
    "tighten for partkey AND suppkey predicates simultaneously, "
    "where a single-column sort only ever prunes one. The key is 32 "
    "pure-arithmetic bit terms — whole-stage codegen at scan speed, "
    "zero shuffle, zero UDF — and the identical expression runs on "
    "both engines for the hash check.",
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        F.expr(_Z_SPARK).cast("bigint").alias("zkey"),
    )


@register(
    "pareto_revenue_share",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
               AS revenue
      FROM lineitem GROUP BY l_partkey
    ), ranked AS (
      SELECT l_partkey, revenue,
             sum(revenue) OVER (ORDER BY revenue DESC, l_partkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_rev,
             sum(revenue) OVER () AS total_rev,
             row_number() OVER (ORDER BY revenue DESC, l_partkey) AS rk
      FROM rev
    )
    SELECT l_partkey, CAST(revenue AS DOUBLE) AS revenue, rk,
           round(CAST(cum_rev AS DOUBLE) / CAST(total_rev AS DOUBLE), 6)
             AS cum_share
    FROM ranked
    WHERE CAST(cum_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) <= 0.5
    """,
    doc="Pareto concentration: which parts make up the top half of "
    "revenue, with each part's cumulative share — the 80/20 analysis "
    "behind assortment and hot-key decisions (the output doubles as "
    "the skew-key list a salting strategy would consume, cf. "
    "join_salted_skew). The fact scan collapses FIRST into a "
    "dimension-sized per-part aggregate (map-side combined); only "
    "that reduced table enters the ordered cumulative window. The "
    "global window IS a single-partition sort — acceptable precisely "
    "because its input is the part dimension, not the fact table; at "
    "100 TB of facts the window still sees only |parts| rows. "
    "Decimal sums end to end, (revenue, partkey) total order, one "
    "IEEE division at the edge.",
)
def pareto_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, "lineitem", sf_dir)
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("revenue")
    )
    worder = Window.orderBy(F.col("revenue").desc(), "l_partkey")
    wcum = worder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = rev.select(
        "l_partkey",
        "revenue",
        F.sum("revenue").over(wcum).alias("cum_rev"),
        F.sum("revenue").over(Window.partitionBy()).alias("total_rev"),
        F.row_number().over(worder).alias("rk"),
    )
    share = F.col("cum_rev").cast("double") / F.col("total_rev").cast("double")
    return ranked.filter(share <= 0.5).select(
        "l_partkey",
        F.col("revenue").cast("double").alias("revenue"),
        "rk",
        F.round(share, 6).alias("cum_share"),
    )


@register(
    "customer_order_gaps",
    oracle="""
    WITH seq AS (
      SELECT o_custkey,
             CAST(date_diff('day',
               lag(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS BIGINT) AS gap_days
      FROM orders
    )
    SELECT o_custkey,
           CAST(count(*) + 1 AS BIGINT) AS n_orders,
           CAST(max(gap_days) AS BIGINT) AS max_gap_days,
           round(CAST(sum(gap_days) AS DOUBLE) / count(*), 6)
             AS avg_gap_days
    FROM seq WHERE gap_days IS NOT NULL
    GROUP BY o_custkey
    """,
    doc="Inter-purchase cadence per customer (gap statistics between "
    "consecutive orders): the recency/frequency signal behind churn "
    "scoring and replenishment forecasts. One lag window per "
    "customer — partitions are per-customer order counts, bounded by "
    "entity history — then a map-side-combined aggregate on the same "
    "key, so Catalyst reuses the window's exchange for the groupBy: "
    "ONE shuffle total. Single-order customers (no gap) drop out "
    "explicitly. Integer day arithmetic; one final IEEE division.",
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).cast("bigint").alias("gap_days"),
    )
    return (
        seq.filter(F.col("gap_days").isNotNull())
        .groupBy("o_custkey")
        .agg(
            (F.count(F.lit(1)) + 1).cast("bigint").alias("n_orders"),
            F.max("gap_days").cast("bigint").alias("max_gap_days"),
            F.round(
                F.sum("gap_days").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_gap_days"),
        )
    )


# The SCD2 timeline CTE shared verbatim by join_point_in_time's
# oracle (the dimension side is exactly operators/aggregations.py::
# scd2_intervals' oracle, minus the n_events harness column).
_SCD2_CTE = """
    seq AS (
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
             min(ts) AS valid_from
      FROM grp GROUP BY user_id, event_type, version
    ), dim AS (
      SELECT user_id, state, version, valid_from,
             lead(valid_from) OVER (
               PARTITION BY user_id ORDER BY version
             ) AS valid_to
      FROM island
    )
"""


@register(
    "join_point_in_time",
    oracle=f"""
    WITH {_SCD2_CTE},
    purch AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS purchase_id, p.user_id,
           CAST(p.value AS DOUBLE) AS revenue,
           d.state AS state_at_purchase,
           d.version AS dim_version
    FROM purch p JOIN dim d
      ON d.user_id = p.user_id
     AND p.ts >= d.valid_from
     AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    """,
    doc="Point-in-time (PIT) dimension join — the feature-store "
    "operator: each fact row (purchase) joins the SCD2 dimension "
    "version that was valid AT ITS OWN TIMESTAMP, never a later one "
    "(the train-serve-skew bug PIT joins exist to prevent). The "
    "dimension here is the scd2_intervals timeline derived from the "
    "same event stream, so the composed query is self-contained and "
    "fully hash-checked. Because SCD2 intervals TILE each user's "
    "timeline, containment ([valid_from, valid_to)) matches exactly "
    "one version per fact: the join is a plain user_id equi-join "
    "whose per-user fanout is the user's version count, filtered by "
    "the containment predicate — no window over facts, no range-join "
    "explosion. Same-timestamp state flips produce zero-width "
    "intervals that correctly match nothing. At 100 TB the dimension "
    "side is the (small) interval store maintained incrementally by "
    "streaming/scd2_ingest.py, not a recompute.",
)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, "events", sf_dir)
    worder = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), F.col("event_id")
    )
    prev = F.lag("event_type").over(worder)
    grp = e.select(
        "user_id",
        "event_type",
        "ts",
        F.sum(
            F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0)
        )
        .over(worder.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("version"),
    )
    island = grp.groupBy("user_id", F.col("event_type").alias("state"), "version").agg(
        F.min("ts").alias("valid_from")
    )
    wver = Window.partitionBy("user_id").orderBy("version")
    dim = island.select(
        F.col("user_id").alias("d_user"),
        "state",
        "version",
        "valid_from",
        F.lead("valid_from").over(wver).alias("valid_to"),
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return (
        purch.join(
            dim,
            (F.col("user_id") == F.col("d_user"))
            & (F.col("ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("value").cast("double").alias("revenue"),
            F.col("state").alias("state_at_purchase"),
            F.col("version").alias("dim_version"),
        )
    )


@register(
    "window_running_distinct",
    oracle="""
    WITH firsts AS (
      SELECT user_id, ts, event_id,
             CASE WHEN row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts NULLS LAST, event_id) = 1
             THEN 1 ELSE 0 END AS is_first
      FROM events
    )
    SELECT user_id, event_id,
           CAST(sum(is_first) OVER (
             PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS distinct_types_so_far
    FROM firsts
    """,
    doc="Running COUNT(DISTINCT) per key — 'how many distinct event "
    "types has this user produced so far' at every event. SQL forbids "
    "DISTINCT inside window aggregates and the naive rewrite is a "
    "per-row set recomputation (quadratic per partition); the "
    "standard linear rewrite implemented here marks each (user, "
    "type)'s FIRST occurrence with one row_number window, then a "
    "plain running sum of the flags counts distinct-so-far exactly. "
    "Two windows, both partitioned by user-derived keys, partitions "
    "bounded by per-entity history; total order (ts, event_id) pins "
    "ties across engines.",
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, "events", sf_dir)
    wfirst = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc_nulls_last(), F.col("event_id")
    )
    firsts = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.row_number().over(wfirst) == 1, 1).otherwise(0).alias("is_first"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc_nulls_last(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return firsts.select(
        "user_id",
        "event_id",
        F.sum("is_first").over(wrun).cast("bigint").alias("distinct_types_so_far"),
    )


@register(
    "intervals_concurrency",
    oracle="""
    WITH iv AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             min(ts) AS s, max(ts) AS e
      FROM events GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)
    ), pts AS (
      SELECT s AS t, 1 AS d FROM iv
      UNION ALL
      SELECT e AS t, -1 AS d FROM iv
    ), delta AS (
      SELECT t, CAST(sum(d) AS BIGINT) AS delta FROM pts GROUP BY t
    )
    SELECT t, delta,
           CAST(sum(delta) OVER (
             ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS concurrent
    FROM delta
    """,
    doc="Sweep-line interval concurrency: how many users' daily "
    "activity spans [first event, last event) are open at every "
    "breakpoint — the concurrent-sessions/peak-load gauge every "
    "event platform reports. Interval algebra without interval "
    "joins: each span contributes +1/-1 deltas, deltas GROUP to one "
    "row per distinct timestamp (making the global cumsum's order "
    "unique, hence hash-deterministic, with half-open semantics — an "
    "end meeting a start at the same instant nets before the curve "
    "is read), and ONE running sum over the breakpoint set yields "
    "the curve. The facts collapse to dimension-sized spans (user x "
    "day) before the single-partition window — the same 'window "
    "only over the reduced set' rule as pareto_revenue_share; the "
    "naive alternative, joining every interval against every "
    "overlapping interval, is quadratic in concurrency.",
)
def intervals_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, "events", sf_dir)
    iv = e.groupBy(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    pts = iv.select(F.col("s").alias("t"), F.lit(1).alias("d")).unionByName(
        iv.select(F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    delta = pts.groupBy("t").agg(F.sum("d").cast("bigint").alias("delta"))
    wrun = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return delta.select(
        "t", "delta", F.sum("delta").over(wrun).cast("bigint").alias("concurrent")
    )


# RFM rule thresholds: fixed absolute cutoffs near the corpus medians
# (recency: ordered in the last ~20 months of the data window;
# frequency: at/above the median order count; monetary: at/above the
# median lifetime spend). Fixed rules — not data-dependent quantiles —
# keep classification a pure scan-speed expression and segments
# stable as data grows; the quantile-driven variant is
# quality_tiers_decile's broadcast-boundary pattern.
RFM_RECENT_AFTER = "2000-01-01"
RFM_FREQ_MIN = 10
RFM_MONEY_MIN = 2_500_000.0


@register(
    "customer_rfm_segments",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(38,2)) AS spend
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           last_order >= TIMESTAMP '{RFM_RECENT_AFTER} 00:00:00' AS recent,
           n_orders >= {RFM_FREQ_MIN} AS frequent,
           spend >= {RFM_MONEY_MIN} AS high_value,
           n_orders,
           CAST(spend AS DOUBLE) AS spend,
           (CASE WHEN last_order >= TIMESTAMP '{RFM_RECENT_AFTER} 00:00:00'
                 THEN 'R' ELSE '-' END)
           || (CASE WHEN n_orders >= {RFM_FREQ_MIN} THEN 'F' ELSE '-' END)
           || (CASE WHEN spend >= {RFM_MONEY_MIN} THEN 'M' ELSE '-' END)
             AS segment
    FROM per_cust
    """,
    doc="RFM segmentation (recency / frequency / monetary): every "
    "customer classified into one of 8 segments by rule thresholds — "
    "the standard CRM cut (champions = RFM, at-risk = --M, ...). One "
    "map-side-combined aggregate per customer, then pure codegen "
    "comparisons; spend accumulates in exact decimals so the "
    "threshold can never flip on summation order. Completes the "
    "customer-behavior family beside customer_order_gaps (cadence), "
    "pareto_revenue_share (concentration), and retention_cohorts.",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("spend"),
    )
    recent = F.col("last_order") >= F.lit(RFM_RECENT_AFTER).cast("timestamp")
    frequent = F.col("n_orders") >= RFM_FREQ_MIN
    high = F.col("spend") >= RFM_MONEY_MIN
    seg = F.concat(
        F.when(recent, F.lit("R")).otherwise(F.lit("-")),
        F.when(frequent, F.lit("F")).otherwise(F.lit("-")),
        F.when(high, F.lit("M")).otherwise(F.lit("-")),
    )
    return per_cust.select(
        "o_custkey",
        recent.alias("recent"),
        frequent.alias("frequent"),
        high.alias("high_value"),
        "n_orders",
        F.col("spend").cast("double").alias("spend"),
        seg.alias("segment"),
    )


# fuzzy_match_damerau: candidate block = same final word (the noun of
# the adjective-noun part vocabulary), verify threshold on the DL
# distance. Unlike the levenshtein pair, the verify metric cannot be
# a built-in (Spark has none), so it demonstrates the
# Arrow-vectorized verify-UDF slot of block-then-verify linkage.
DL_MAX_DIST = 5


def damerau_levenshtein(a: str, b: str) -> int:
    """True Damerau-Levenshtein distance (Lowrance-Wagner: adjacent
    transposition as a fourth edit, with later edits allowed between
    the transposed characters — d('CA','ABC') = 2, where the
    restricted/OSA variant gives 3). Computed over UTF-8 BYTES,
    because that is what DuckDB's damerau_levenshtein does
    (d('héllo','hello') = 2, not the codepoint answer 1) — pinned by
    property test over random strings INCLUDING non-ASCII in
    tests/test_r8b_operators.py. Note the registered query's
    companion column uses Spark's built-in levenshtein, which is
    CODEPOINT-based; the two scales agree exactly on ASCII
    vocabularies like this corpus, and the gate data is ASCII."""
    ab, bb = a.encode("utf-8"), b.encode("utf-8")
    la, lb = len(ab), len(bb)
    maxd = la + lb
    # matrix with a -1 guard row/col (offset +1 on each index)
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxd
    for i in range(la + 1):
        d[i + 1][0] = maxd
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxd
        d[1][j + 1] = j
    last_row: dict[int, int] = {}
    for i in range(1, la + 1):
        last_col = 0
        for j in range(1, lb + 1):
            k = last_row.get(bb[j - 1], 0)
            m = last_col
            if ab[i - 1] == bb[j - 1]:
                cost = 0
                last_col = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitute / match
                d[i + 1][j] + 1,  # insert
                d[i][j + 1] + 1,  # delete
                d[k][m] + (i - k - 1) + 1 + (j - m - 1),  # transpose
            )
        last_row[ab[i - 1]] = i
    return d[la + 1][lb + 1]


def dl_pandas_udf():
    """Arrow-batched Damerau-Levenshtein column UDF — built lazily
    because pandas_udf registration needs an active session (a
    module-level decorator breaks plain imports, the r13 lesson).
    ONE definition for every verify site (fuzzy_match_damerau,
    er_funnel, er_reconcile, streaming/er_ingest) so a change to the
    metric's dtype/null/batching contract lands everywhere at once
    (round-14 review consolidation)."""

    @F.pandas_udf("long")
    def dl(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [damerau_levenshtein(x, y) for x, y in zip(a, b)], dtype="int64"
        )

    return dl


@register(
    "fuzzy_match_damerau",
    oracle=f"""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    k AS (SELECT p_name, string_split(p_name, ' ')[-1] AS noun FROM names)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_lev,
           CAST(damerau_levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dl
    FROM k a JOIN k b ON a.noun = b.noun AND a.p_name < b.p_name
    WHERE damerau_levenshtein(a.p_name, b.p_name) <= {DL_MAX_DIST}
    """,
    doc="Record linkage with a transposition-aware metric: part-name "
    "pairs within true Damerau-Levenshtein distance "
    f"{DL_MAX_DIST}, blocked on the shared final word so the join is "
    "an equi-join on the block key, never a cartesian. Spark has no "
    "built-in DL, so the verify step is an Arrow-batched pandas UDF "
    "over candidate pairs only — the expensive-metric slot of "
    "block-then-verify linkage (the built-in levenshtein rides along "
    "for contrast). The name universe is DISTINCT'd first "
    "(vocabulary-sized, not corpus-sized), so candidate volume is "
    "sum over blocks of |block|^2 on a dictionary — at 100 TB the "
    "same shape holds because dirty-dimension vocabularies grow far "
    "slower than fact tables. The UDF cost is per CANDIDATE, which "
    "the block key bounds; property test pins UDF == DuckDB on "
    "random strings including transpositions.",
)
def fuzzy_match_damerau(spark: SparkSession, sf_dir: str) -> DataFrame:
    dl_udf = dl_pandas_udf()

    p = load(spark, "part", sf_dir)
    names = p.select("p_name").distinct()
    k = names.select(
        "p_name", F.element_at(F.split("p_name", " "), -1).alias("noun")
    )
    a = k.select(F.col("p_name").alias("name_a"), "noun")
    b = k.select(F.col("p_name").alias("name_b"), "noun")
    cand = a.join(b, "noun").filter(F.col("name_a") < F.col("name_b"))
    return (
        cand.withColumn("edit_dl", dl_udf("name_a", "name_b"))
        .filter(F.col("edit_dl") <= DL_MAX_DIST)
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("bigint").alias("edit_lev"),
            "edit_dl",
        )
    )


@register(
    "orders_cohort_ltv",
    oracle="""
    WITH first AS (
      SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS cohort
      FROM orders GROUP BY o_custkey
    ),
    sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
           FROM first GROUP BY cohort),
    rev AS (
      SELECT f.cohort,
             CAST((year(o.o_orderdate) - year(f.cohort)) * 12
                  + (month(o.o_orderdate) - month(f.cohort)) AS BIGINT) AS month_idx,
             CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
               AS revenue
      FROM orders o JOIN first f ON f.o_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort, month_idx, revenue,
             CAST(sum(revenue) OVER (PARTITION BY cohort ORDER BY month_idx)
                  AS DECIMAL(38,2)) AS cum_revenue
      FROM rev
    )
    SELECT c.cohort, c.month_idx, sz.cohort_size,
           CAST(c.revenue AS DOUBLE) AS revenue,
           CAST(c.cum_revenue AS DOUBLE) AS cum_revenue,
           round(CAST(c.cum_revenue AS DOUBLE) / sz.cohort_size, 6)
             AS ltv_per_customer
    FROM cum c JOIN sz USING (cohort)
    """,
    doc="Cohort lifetime-value triangle: customers grouped by "
    "first-order month, revenue laid out by months-since-acquisition, "
    "cumulated into LTV-per-customer — the money companion of "
    "retention_cohorts (which counts the same triangle; finance "
    "models payback from THIS view). Month arithmetic is exact "
    "integer (year*12+month deltas — no float date math); revenue "
    "accumulates in DECIMAL through the running window, so the "
    "cumulative column is order-free-exact, converting to double "
    "only at output. Shape: one aggregate to find cohorts, a "
    "broadcast-sized cohort table joined back to the fact scan, one "
    "(cohort, month) aggregate, then the running window over the "
    "triangle — calendar-squared rows, never the corpus.",
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..plans.stage import eager_release

    o = load(spark, "orders", sf_dir)
    # persisted: the customer-sized cohort table feeds the size
    # aggregate AND the fact join — unstaged, Catalyst re-derives it
    # from a second (third total) scan of the fact table
    first = o.groupBy("o_custkey").agg(
        F.min(F.trunc("o_orderdate", "month")).alias("cohort")
    ).persist()
    sz = first.groupBy("cohort").agg(F.count(F.lit(1)).cast("bigint").alias("cohort_size"))
    month_idx = (
        (F.year("o_orderdate") - F.year("cohort")) * 12
        + (F.month("o_orderdate") - F.month("cohort"))
    ).cast("bigint")
    rev = (
        o.join(first, "o_custkey")
        .groupBy("cohort", month_idx.alias("month_idx"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("cohort").orderBy("month_idx")
    cum = rev.withColumn("cum_revenue", F.sum("revenue").over(w).cast("decimal(38,2)"))
    out = cum.join(F.broadcast(sz), "cohort").select(
        "cohort",
        "month_idx",
        "cohort_size",
        F.col("revenue").cast("double").alias("revenue"),
        F.col("cum_revenue").cast("double").alias("cum_revenue"),
        F.round(F.col("cum_revenue").cast("double") / F.col("cohort_size"), 6).alias(
            "ltv_per_customer"
        ),
    )
    return eager_release(out, "cohort_ltv", first)


@register(
    "scalar_bits",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey << 3 AS BIGINT)      AS shl3,
           CAST(o_orderkey >> 2 AS BIGINT)      AS shr2,
           CAST(bit_count(o_orderkey) AS BIGINT) AS popcount,
           CAST(xor(o_orderkey, 255) AS BIGINT)  AS xor255,
           CAST(o_orderkey & 255 AS BIGINT)      AS and255,
           CAST(o_orderkey | 4096 AS BIGINT)     AS or4096,
           CAST(~o_orderkey AS BIGINT)           AS flipped
    FROM orders
    """,
    doc="Bit-manipulation scalar battery (§2-E: shifts, popcount, "
    "xor/and/or/not) — the per-row primitives underneath the engine's "
    "own SimHash hamming bands, Bloom probes, Morton interleaving, "
    "and PQ packing, exposed as queryable scalars. Pure codegen; "
    "exact int64 semantics agree across engines including popcount "
    "on 0 and two's-complement NOT.",
)
def scalar_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        F.shiftleft(k, 3).cast("bigint").alias("shl3"),
        F.shiftright(k, 2).cast("bigint").alias("shr2"),
        F.bit_count(k).cast("bigint").alias("popcount"),
        k.bitwiseXOR(F.lit(255)).cast("bigint").alias("xor255"),
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("and255"),
        k.bitwiseOR(F.lit(4096)).cast("bigint").alias("or4096"),
        F.bitwise_not(k).cast("bigint").alias("flipped"),
    )


# Privacy-audit thresholds: groups smaller than K are re-identifiable;
# groups with fewer than L distinct sensitive bands leak the attribute.
K_ANON, L_DIV = 10, 5


@register(
    "privacy_k_anonymity",
    oracle=f"""
    WITH g AS (
      SELECT c_mktsegment, c_nationkey,
             CAST(count(*) AS BIGINT) AS group_size,
             CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS BIGINT)
               AS l_sensitive
      FROM customer GROUP BY 1, 2
    )
    SELECT c_mktsegment, c_nationkey, group_size, l_sensitive,
           (group_size < {K_ANON}) AS violates_k,
           (l_sensitive < {L_DIV}) AS violates_l
    FROM g
    """,
    doc="Privacy audit over quasi-identifiers: k-anonymity (every "
    "(segment, nation) equivalence class must hold >= "
    f"{K_ANON} individuals — smaller groups are re-identifiable by "
    "linkage) and l-diversity (each class must span >= "
    f"{L_DIV} distinct sensitive-attribute bands — a k-anonymous "
    "group whose members all share one sensitive value still leaks "
    "it). The audit every dataset release/anonymization pipeline "
    "runs before publishing, as one map-side-combined aggregate with "
    "a distinct-count per group; at 100 TB the equivalence-class "
    "table is quasi-identifier-bounded, never row-bounded, and the "
    "remediation (generalize or suppress violating groups) is a "
    "broadcast join back against exactly this table. Exact integer "
    "counts; the sensitive attribute is banded with integer floor "
    "division, no float predicate.",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    band = F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    g = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("group_size"),
        F.countDistinct(band).cast("bigint").alias("l_sensitive"),
    )
    return g.select(
        "c_mktsegment",
        "c_nationkey",
        "group_size",
        "l_sensitive",
        (F.col("group_size") < K_ANON).alias("violates_k"),
        (F.col("l_sensitive") < L_DIV).alias("violates_l"),
    )


# Entropy l-diversity threshold ln(L_DIV): quantized ONCE in Python
# (cookbook rule) and injected as the same literal into both engines,
# compared against the identically per-class-rounded entropy.
ENTROPY_L_THRESHOLD = 1.6094  # round(ln(5), 4)
RECURSIVE_C = 1  # the strict classic (1, l)-diversity operating point


@register(
    "privacy_l_diversity",
    oracle=f"""
    WITH cells AS (
      SELECT c_mktsegment, c_nationkey,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS band,
             CAST(count(*) AS BIGINT) AS cnt
      FROM customer GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT c_mktsegment, c_nationkey, band, cnt,
             row_number() OVER (PARTITION BY c_mktsegment, c_nationkey
                                ORDER BY cnt DESC, band) AS rk
      FROM cells
    ),
    agg AS (
      SELECT c_mktsegment, c_nationkey,
             CAST(sum(cnt) AS BIGINT) AS group_size,
             CAST(count(*) AS BIGINT) AS distinct_l,
             CAST(max(cnt) AS BIGINT) AS top_freq,
             CAST(coalesce(sum(CASE WHEN rk >= {L_DIV} THEN cnt END), 0)
                  AS BIGINT) AS tail_from_l,
             sum(CAST(round(cnt * ln(cnt), 6) AS DECIMAL(28,6))) AS s
      FROM ranked GROUP BY 1, 2
    )
    SELECT c_mktsegment, c_nationkey, group_size, distinct_l, top_freq,
           tail_from_l,
           round(ln(group_size) - CAST(s AS DOUBLE) / group_size, 4)
             AS entropy_nats,
           (round(ln(group_size) - CAST(s AS DOUBLE) / group_size, 4)
            >= {ENTROPY_L_THRESHOLD}) AS meets_entropy_l,
           (top_freq < {RECURSIVE_C} * tail_from_l) AS meets_recursive_cl
    FROM agg
    """,
    doc="The two STRONG l-diversity variants (Machanavajjhala et al.) "
    "over the same (segment, nation) equivalence classes and "
    "acctbal-band sensitive attribute privacy_k_anonymity audits with "
    "plain distinct-l: ENTROPY l-diversity (class entropy >= ln(l) — "
    "a class can hold l distinct values yet still be 99% one value; "
    "entropy catches the skew distinct-count misses) and RECURSIVE "
    f"(c,l)-diversity with c={RECURSIVE_C}, l={L_DIV} (the most "
    "frequent sensitive value must be outweighed by the tail from "
    "rank l on: r1 < c*(r_l+..+r_m) — robust to both skew and rare "
    "outliers). Determinism: the recursive verdict is EXACT integers "
    "(top count vs tail sum, no division); entropy uses the "
    "text_unigram_entropy pattern — each c*ln(c) term rounded to 6dp "
    "then summed as DECIMAL (combine-order independent), final value "
    "rounded to 4dp, compared against the Python-quantized ln(l) "
    "literal injected into both engines. Shape: one (class, band) "
    "map-side-combined reduce, one class-partitioned rank window over "
    "the band-bounded cell table, one class reduce — everything after "
    "the first aggregate is quasi-identifier-bounded, never "
    "row-bounded. The release gate that decides whether a 100 TB "
    "corpus partition may ship.",
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = load(spark, "customer", sf_dir)
    cells = c.groupBy(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("band"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    w = Window.partitionBy("c_mktsegment", "c_nationkey").orderBy(
        F.col("cnt").desc(), "band"
    )
    ranked = cells.select(
        "c_mktsegment",
        "c_nationkey",
        "cnt",
        F.row_number().over(w).alias("rk"),
    )
    agg = ranked.groupBy("c_mktsegment", "c_nationkey").agg(
        F.sum("cnt").cast("bigint").alias("group_size"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_l"),
        F.max("cnt").cast("bigint").alias("top_freq"),
        F.coalesce(
            F.sum(F.when(F.col("rk") >= L_DIV, F.col("cnt"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("tail_from_l"),
        F.sum(
            F.round(F.col("cnt") * F.log("cnt"), 6).cast("decimal(28,6)")
        ).alias("s"),
    )
    entropy = F.round(
        F.log("group_size") - F.col("s").cast("double") / F.col("group_size"), 4
    )
    return agg.select(
        "c_mktsegment",
        "c_nationkey",
        "group_size",
        "distinct_l",
        "top_freq",
        "tail_from_l",
        entropy.alias("entropy_nats"),
        (entropy >= ENTROPY_L_THRESHOLD).alias("meets_entropy_l"),
        (F.col("top_freq") < RECURSIVE_C * F.col("tail_from_l")).alias(
            "meets_recursive_cl"
        ),
    )


# epsilon for the Laplace release; sensitivity of a disjoint-cell
# histogram is 1, so the noise scale b = 1/DP_EPSILON.
DP_EPSILON = 1.0


@register(
    "privacy_dp_counts",
    oracle="""
    WITH cell AS (
      SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow,
             CAST(count(*) AS BIGINT) AS true_count
      FROM events GROUP BY 1, 2
    ),
    seeded AS (
      SELECT event_type, dow, true_count,
             (CAST(('0x' || substr(md5('dp:' || event_type || ':' ||
                CAST(dow AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
               / 4294967296.0 AS u
      FROM cell
    )
    SELECT event_type, dow, true_count,
           round(-1.0 * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
                 * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS noise,
           round(true_count
                 - 1.0 * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
                   * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS noisy_count
    FROM seeded
    """,
    doc="Differentially-private histogram release: the event_type x "
    "weekday cell counts plus Laplace(1/epsilon) noise at epsilon = "
    "1.0 (disjoint cells => sensitivity 1) — the OTHER classic "
    "privacy mechanism beside privacy_k_anonymity's suppression "
    "audit. Production DP needs a fresh random draw per release; the "
    "hash-checkable twin derives the uniform deterministically from "
    "md5(cell) exactly like the simhash bit kernel: u = (h32 + 0.5) "
    "/ 2^32 is EXACTLY representable (half-integer over a power of "
    "two), 1 - 2|u - 0.5| is exact arithmetic, and the single "
    "per-cell ln is rounded to 6 decimals (the bm25/PMI libm "
    "discipline — per-row ln never enters a float SUM). true_count "
    "is emitted for the oracle check; a real release drops it and "
    "keeps only noisy_count. One map-side-combined aggregate; noise "
    "is per-CELL, so the expression work is dimension-sized.",
)
def privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.clickhouse import toDayOfWeek

    e = load(spark, "events", sf_dir)
    cell = e.groupBy(
        "event_type", toDayOfWeek("ts").cast("bigint").alias("dow")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("true_count"))
    seed = F.concat(F.lit("dp:"), F.col("event_type"), F.lit(":"), F.col("dow").cast("string"))
    h = F.conv(F.substring(F.md5(seed), 1, 8), 16, 10).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    sign = F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = F.lit(-1.0) * sign * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
    return cell.select(
        "event_type",
        "dow",
        "true_count",
        F.round(noise / F.lit(DP_EPSILON), 6).alias("noise"),
        F.round(F.col("true_count") + noise / F.lit(DP_EPSILON), 6).alias("noisy_count"),
    )


# --- pseudonymization vault join (round 11 continuation) ----------------

# Fixed salt so the surrogate keys are reproducible across engines; a
# production vault derives them with a SECRET key (HMAC) and rotates it.
PSEUDO_SALT = "vault-2024"


@register(
    "privacy_pseudonymize_join",
    oracle=f"""
    WITH vault AS (
      SELECT DISTINCT user_id,
             md5('{PSEUDO_SALT}:' || CAST(user_id AS VARCHAR)) AS pseudonym
      FROM events
    )
    SELECT v.pseudonym,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(count(DISTINCT e.event_type) AS BIGINT) AS n_types,
           CAST(min(date_trunc('day', e.ts)) AS DATE) AS first_day,
           CAST(max(date_trunc('day', e.ts)) AS DATE) AS last_day
    FROM events e JOIN vault v ON v.user_id = e.user_id
    GROUP BY v.pseudonym
    """,
    doc="Pseudonymization vault join — the third leg of the privacy "
    "battery (privacy_k_anonymity audits, privacy_dp_counts "
    "releases noisy aggregates; this one REPLACES the identifier): "
    "a per-user surrogate key from a salted digest, the raw id "
    "dropped before anything leaves the query, and downstream "
    "analytics joined and aggregated entirely by pseudonym. "
    "Referential integrity survives (same-user rows still group "
    "together; row counts and totals are preserved — the audit "
    "columns), while linkage back to user_id requires the vault "
    "table, which a production deployment derives with a SECRET "
    "HMAC key and stores under access control; the fixed salt here "
    "documents the pattern and keeps both engines reproducible. "
    "Shape: the vault is user-dimension-sized and broadcasts onto "
    "the fact scan; one map-side-combined aggregate by pseudonym — "
    "pseudonymizing 100 TB costs exactly one extra broadcast "
    "hash join over the plain per-user rollup.",
)
def privacy_pseudonymize_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    vault = e.select("user_id").distinct().select(
        "user_id",
        # full 128-bit digest: a 64-bit prefix invites birthday
        # collisions at 10^9+ users, silently merging two users'
        # aggregates (round-11 review finding)
        F.md5(
            F.concat(F.lit(f"{PSEUDO_SALT}:"), F.col("user_id").cast("string"))
        ).alias("pseudonym"),
    )
    return (
        e.join(F.broadcast(vault), "user_id")
        .groupBy("pseudonym")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("total_cents"),
            F.countDistinct("event_type").cast("bigint").alias("n_types"),
            F.to_date(F.min(F.date_trunc("day", "ts"))).alias("first_day"),
            F.to_date(F.max(F.date_trunc("day", "ts"))).alias("last_day"),
        )
    )


# --- skyline / Pareto frontier (round 11 continuation) ------------------


@register(
    "orders_skyline_pareto",
    oracle="""
    WITH pts AS (
      SELECT o_orderpriority AS grp, o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
             CAST(datediff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS BIGINT) AS day
      FROM orders
    ),
    w AS (
      SELECT *,
             max(day) OVER (
               PARTITION BY grp ORDER BY price_c
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS best_day_cheaper,
             max(day) OVER (PARTITION BY grp, price_c)
               AS best_day_same_price
      FROM pts
    )
    SELECT grp, o_orderkey, price_c, day
    FROM w
    WHERE (best_day_cheaper IS NULL OR best_day_cheaper < day)
      AND day = best_day_same_price
    """,
    doc="Skyline (Pareto-frontier) query per priority class: the "
    "orders not DOMINATED by any other — no other order is both "
    "cheaper-or-equal and more-recent-or-equal with at least one "
    "strict — the multi-criteria shortlist operator (best "
    "price/recency trade-offs) that no single ORDER BY can express. "
    "Implemented as the sort-based skyline, NOT the naive O(n^2) "
    "dominance self-join: within each class, a point survives iff "
    "(a) every STRICTLY cheaper point is strictly older — one "
    "running max(day) over a RANGE frame ending 1 PRECEDING on "
    "price, which excludes price ties exactly like the textbook "
    "strict-prefix — and (b) it carries the max day among its exact "
    "price peers (equal-price older points are dominated; exact "
    "(price, day) duplicates dominate nothing and all survive). "
    "Two window passes over one grp-partitioned sort, exact integer "
    "cents/epoch-days — O(n log n) per class at any scale, and the "
    "windows shuffle only (grp)-partitioned rows once.",
)
def orders_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load(spark, "orders", sf_dir)
    pts = o.select(
        F.col("o_orderpriority").alias("grp"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("day"),
    )
    w_cheaper = (
        Window.partitionBy("grp")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("grp", "price_c")
    wdf = pts.select(
        "*",
        F.max("day").over(w_cheaper).alias("best_day_cheaper"),
        F.max("day").over(w_same).alias("best_day_same_price"),
    )
    return wdf.filter(
        (F.col("best_day_cheaper").isNull() | (F.col("best_day_cheaper") < F.col("day")))
        & (F.col("day") == F.col("best_day_same_price"))
    ).select("grp", "o_orderkey", "price_c", "day")


# --- declarative data-quality rules (round 11 continuation) -------------


@register(
    "profile_dq_rules",
    oracle="""
    WITH r1 AS (
      SELECT 'orders.custkey_resolves' AS rule, 'referential' AS kind,
             CAST(count(*) AS BIGINT) AS n_checked,
             CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_violations
      FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    r2 AS (
      SELECT 'lineitem.orderkey_resolves', 'referential',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    r3 AS (
      SELECT 'lineitem.price_positive', 'range',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM lineitem
    ),
    r4 AS (
      SELECT 'lineitem.discount_in_unit_interval', 'range',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem
    ),
    r5 AS (
      SELECT 'orders.orderdate_in_epoch', 'range',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
                            OR o_orderdate >= TIMESTAMP '2026-01-01'
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
    ),
    r6 AS (
      SELECT 'events.props_not_null', 'completeness',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM events
    ),
    r7 AS (
      SELECT 'events.event_id_unique', 'uniqueness',
             CAST(count(*) AS BIGINT),
             CAST(count(*) - count(DISTINCT event_id) AS BIGINT)
      FROM events
    ),
    r8 AS (
      SELECT 'documents.n_chars_matches_text', 'consistency',
             CAST(count(*) AS BIGINT),
             -- length() = CHARACTER count, matching Spark F.length
             -- (strlen is byte-based and diverges on non-ASCII text;
             -- round-11 ADVICE)
             CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM documents
    ),
    allr AS (
      SELECT * FROM r1 UNION ALL SELECT * FROM r2
      UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4
      UNION ALL SELECT * FROM r5 UNION ALL SELECT * FROM r6
      UNION ALL SELECT * FROM r7 UNION ALL SELECT * FROM r8
    )
    SELECT rule, kind, n_checked, n_violations,
           (n_violations = 0) AS passed,
           round(1.0 - CAST(n_violations AS DOUBLE) / n_checked, 6)
             AS pass_rate
    FROM allr
    """,
    doc="Declarative data-quality rule audit — the Great-Expectations-"
    "style contract check a warehouse runs after every load, as one "
    "query: referential integrity (orphan orders / lineitems, via "
    "left-join null probes), range rules (positive prices, discount "
    "in [0,1], dates inside the corpus epoch), completeness (null "
    "props), uniqueness (event_id), and cross-column consistency "
    "(n_chars == length(text), character-based in BOTH engines so "
    "the contract survives a non-ASCII corpus). One row per rule "
    "with checked/"
    "violation counts, a boolean verdict, and the pass rate. All "
    "counts exact integers. Shape: each rule is one scan or one "
    "broadcast-dimension left join with a map-side-combined "
    "conditional aggregate; the union'd verdict table is "
    "rule-dimension-sized — at 100 TB the audit costs the scans, "
    "never a shuffle of fact rows, and fails loudly instead of "
    "letting a bad load poison downstream training data.",
)
def profile_dq_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    c = load(spark, "customer", sf_dir)
    li = load(spark, "lineitem", sf_dir)
    e = load(spark, "events", sf_dir)
    d = load(spark, "documents", sf_dir)

    def rule(name: str, kind: str, checked, violations) -> DataFrame:
        return checked.agg(
            F.lit(name).alias("rule"),
            F.lit(kind).alias("kind"),
            F.count(F.lit(1)).cast("bigint").alias("n_checked"),
            F.sum(F.when(violations, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violations"),
        )

    r1 = rule(
        "orders.custkey_resolves",
        "referential",
        o.join(
            F.broadcast(c.select("c_custkey")),
            o["o_custkey"] == c["c_custkey"],
            "left",
        ),
        F.col("c_custkey").isNull(),
    )
    r2 = rule(
        "lineitem.orderkey_resolves",
        "referential",
        li.join(
            o.select("o_orderkey"), li["l_orderkey"] == o["o_orderkey"], "left"
        ),
        F.col("o_orderkey").isNull(),
    )
    r3 = rule("lineitem.price_positive", "range", li, F.col("l_extendedprice") <= 0)
    r4 = rule(
        "lineitem.discount_in_unit_interval",
        "range",
        li,
        (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
    )
    r5 = rule(
        "orders.orderdate_in_epoch",
        "range",
        o,
        (F.col("o_orderdate") < F.lit("1992-01-01").cast("timestamp_ntz"))
        | (F.col("o_orderdate") >= F.lit("2026-01-01").cast("timestamp_ntz")),
    )
    r6 = rule("events.props_not_null", "completeness", e, F.col("props").isNull())
    r7 = e.agg(
        F.lit("events.event_id_unique").alias("rule"),
        F.lit("uniqueness").alias("kind"),
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        (F.count(F.lit(1)) - F.countDistinct("event_id"))
        .cast("bigint")
        .alias("n_violations"),
    )
    r8 = rule(
        "documents.n_chars_matches_text",
        "consistency",
        d,
        F.col("n_chars") != F.length("text"),
    )
    allr = r1
    for r in (r2, r3, r4, r5, r6, r7, r8):
        allr = allr.unionAll(r)
    return allr.select(
        "rule",
        "kind",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
        F.round(
            F.lit(1.0) - F.col("n_violations").cast("double") / F.col("n_checked"),
            6,
        ).alias("pass_rate"),
    )


# --- near-duplicate payment audit (round 11 continuation) ---------------

# A pair of orders is a duplicate-payment suspect when the same
# customer is billed within DUP_WINDOW_DAYS for amounts differing by
# at most DUP_TOL_PCT% of the larger (cross-multiplied:
# 100*|a-b| <= pct*max(a,b)).
DUP_WINDOW_DAYS = 14
DUP_TOL_PCT = 2


@register(
    "orders_near_duplicate_payments",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(datediff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS BIGINT) AS day
      FROM orders
    )
    SELECT a.o_custkey AS custkey,
           a.o_orderkey AS order_a, b.o_orderkey AS order_b,
           a.cents AS cents_a, b.cents AS cents_b,
           CAST(abs(a.day - b.day) AS BIGINT) AS days_apart,
           CAST(abs(a.cents - b.cents) AS BIGINT) AS cents_diff,
           (a.cents = b.cents) AS exact_amount
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND abs(a.day - b.day) <= {DUP_WINDOW_DAYS}
     AND 100 * abs(a.cents - b.cents) <= {DUP_TOL_PCT} * greatest(a.cents, b.cents)
    """,
    doc="Near-duplicate payment detection — the accounts-payable audit "
    "query (double-billing / double-submission screening): pairs of "
    "orders by the SAME customer within "
    f"{DUP_WINDOW_DAYS} days whose amounts differ by at most "
    f"{DUP_TOL_PCT}% of the larger. The tolerance is cross-multiplied "
    "on exact integer cents (100*|a-b| <= pct*max(a,b)) — no float "
    "predicate — and days "
    "are exact epoch integers. Shape: a self-join EQUI-keyed on "
    "o_custkey (the date/amount tolerances are residual predicates "
    "AFTER the hash join, never a nested loop), so pair generation "
    "is per-customer-bounded: 100x the orders is 100x the work with "
    "the same shuffle shape, and AQE splits any mega-customer "
    "partition. The skyline/fuzzy-join family's answer to 'find me "
    "suspicious pairs' on the money axis.",
)
def orders_near_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir).select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("day"),
    )
    a, b = o.alias("a"), o.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
        & (
            F.abs(F.col("a.day") - F.col("b.day")) <= DUP_WINDOW_DAYS
        )
        & (
            100 * F.abs(F.col("a.cents") - F.col("b.cents"))
            <= DUP_TOL_PCT * F.greatest(F.col("a.cents"), F.col("b.cents"))
        ),
    )
    return pairs.select(
        F.col("a.o_custkey").alias("custkey"),
        F.col("a.o_orderkey").alias("order_a"),
        F.col("b.o_orderkey").alias("order_b"),
        F.col("a.cents").alias("cents_a"),
        F.col("b.cents").alias("cents_b"),
        F.abs(F.col("a.day") - F.col("b.day")).cast("bigint").alias("days_apart"),
        F.abs(F.col("a.cents") - F.col("b.cents"))
        .cast("bigint")
        .alias("cents_diff"),
        (F.col("a.cents") == F.col("b.cents")).alias("exact_amount"),
    )


# --- supplier lead-time profile (round 11 continuation) -----------------


@register(
    "supplier_leadtime_profile",
    oracle="""
    WITH lt AS (
      SELECT l.l_suppkey AS suppkey,
             CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                           CAST(l.l_shipdate AS DATE)) AS BIGINT) AS days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    r AS (
      SELECT suppkey, days,
             row_number() OVER (PARTITION BY suppkey
                                ORDER BY days, suppkey) AS rn,
             count(*) OVER (PARTITION BY suppkey) AS n
      FROM lt
    )
    SELECT suppkey,
           CAST(max(n) AS BIGINT) AS n_shipments,
           CAST(min(days) AS BIGINT) AS min_days,
           CAST(max(CASE WHEN rn = (n + 3) // 4 THEN days END)
                AS BIGINT) AS p25_days,
           CAST(max(CASE WHEN rn = (n + 1) // 2 THEN days END)
                AS BIGINT) AS p50_days,
           CAST(max(CASE WHEN rn = (3 * n + 3) // 4 THEN days END)
                AS BIGINT) AS p75_days,
           CAST(max(days) AS BIGINT) AS max_days
    FROM r GROUP BY suppkey
    """,
    doc="Per-supplier lead-time profile: order date -> ship date in "
    "exact integer days, summarized as min / discrete lower "
    "quartiles / max — the SLA scorecard behind supplier ranking "
    "and promise-date models (q1/q21 ask who was LATE; this "
    "profiles how long everyone actually takes). Quartiles are the "
    "repo's DISCRETE lower order statistics (index ceil(q*n), "
    "values actually in the data — interpolation's last-ulp floats "
    "could flip a hash), picked by row_number in ONE "
    "supplier-partitioned sort, no percentile UDAF. Shape: one "
    "fact-fact equi-join on orderkey (the join_flagship shuffle "
    "shape; at 100 TB pre-bucketing both tables on orderkey removes "
    "it), then a supplier-partitioned window + rollup — "
    "supplier-dimension output.",
)
def supplier_leadtime_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, "lineitem", sf_dir)
    o = load(spark, "orders", sf_dir)
    lt = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("l_suppkey").alias("suppkey"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("bigint")
        .alias("days"),
    )
    w = Window.partitionBy("suppkey").orderBy("days", "suppkey")
    wc = Window.partitionBy("suppkey")
    r = lt.select(
        "suppkey",
        "days",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )

    def at(idx: F.Column) -> F.Column:
        return F.max(F.when(F.col("rn") == idx, F.col("days"))).cast("bigint")

    n = F.col("n")
    return r.groupBy("suppkey").agg(
        F.max("n").cast("bigint").alias("n_shipments"),
        F.min("days").cast("bigint").alias("min_days"),
        at(F.floor((n + 3) / 4).cast("long")).alias("p25_days"),
        at(F.floor((n + 1) / 2).cast("long")).alias("p50_days"),
        at(F.floor((3 * n + 3) / 4).cast("long")).alias("p75_days"),
        F.max("days").cast("bigint").alias("max_days"),
    )


# --- t-closeness audit (round 12) ---------------------------------------

# A group is t-close when the Earth Mover's Distance between its
# sensitive-band distribution and the GLOBAL one is <= t = 1/5 (the
# classic 0.2). Exact rational: num/den with num = sum_k |cumg_k*N -
# cumC_k*n_g| and den = (m-1)*n_g*N.
T_CLOSE_NUM, T_CLOSE_DEN = 1, 5


@register(
    "privacy_t_closeness",
    oracle=f"""
    WITH c AS (
      SELECT c_mktsegment, c_nationkey,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
      FROM customer
    ),
    bands AS (SELECT DISTINCT band FROM c),
    grps AS (
      SELECT c_mktsegment, c_nationkey,
             CAST(count(*) AS BIGINT) AS n_g
      FROM c GROUP BY 1, 2
    ),
    gtot AS (
      SELECT band,
             CAST(sum(count(*)) OVER (ORDER BY band) AS HUGEINT) AS cum_c,
             CAST((SELECT count(*) FROM c) AS HUGEINT) AS nn
      FROM c GROUP BY band
    ),
    cell AS (
      SELECT c_mktsegment, c_nationkey, band,
             CAST(count(*) AS BIGINT) AS cnt
      FROM c GROUP BY 1, 2, 3
    ),
    grid AS (
      SELECT g.c_mktsegment, g.c_nationkey, g.n_g, b.band,
             coalesce(cell.cnt, 0) AS cnt
      FROM grps g CROSS JOIN bands b
      LEFT JOIN cell ON cell.c_mktsegment = g.c_mktsegment
                    AND cell.c_nationkey = g.c_nationkey
                    AND cell.band = b.band
    ),
    cum AS (
      SELECT c_mktsegment, c_nationkey, n_g, grid.band,
             CAST(sum(cnt) OVER (PARTITION BY c_mktsegment, c_nationkey
                                 ORDER BY grid.band) AS HUGEINT) AS cum_g,
             gtot.cum_c, gtot.nn,
             CAST((SELECT count(*) FROM bands) AS BIGINT) AS m
      FROM grid JOIN gtot ON gtot.band = grid.band
    )
    SELECT c_mktsegment, c_nationkey,
           CAST(n_g AS BIGINT) AS group_size,
           CAST(max(m) AS BIGINT) AS m_bands,
           CAST(sum(abs(cum_g * nn - cum_c * n_g)) AS BIGINT) AS emd_num,
           round(CAST(sum(abs(cum_g * nn - cum_c * n_g)) AS DOUBLE)
                 / (CAST(max(m) - 1 AS DOUBLE) * n_g * max(nn)), 6) AS emd,
           (sum(abs(cum_g * nn - cum_c * n_g)) * {T_CLOSE_DEN}
            > {T_CLOSE_NUM} * (max(m) - 1) * n_g * max(nn)) AS violates_t
    FROM cum GROUP BY c_mktsegment, c_nationkey, n_g
    """,
    doc="t-closeness audit — the third rung of the release ladder "
    "after privacy_k_anonymity's k/l checks (k-anonymity stops "
    "linkage, l-diversity stops single-value leakage, t-closeness "
    "stops DISTRIBUTION leakage: a group whose balance bands skew "
    "far from the global mix still tells an attacker plenty). For "
    "each (segment, nation) class, the ordered-attribute Earth "
    "Mover's Distance between the class's sensitive-band "
    "distribution and the global one, as the EXACT rational "
    "sum_k |cumg_k*N - cumC_k*n_g| / ((m-1)*n_g*N); the verdict "
    "flag is fully cross-multiplied (HUGEINT oracle / 38-cap "
    "DECIMAL Spark), the displayed emd is presentation-only. "
    "OPERAND BOUND: each |term| <= n_g*N and the flag lhs <= "
    "5*m*N^2 — inside 38 digits to N ~ 1e16 customers. Shape: one "
    "band-count aggregate, a DIMENSION-BOUNDED grid (classes x "
    "sensitive bands, both catalog-sized — the crossJoin is "
    "broadcast and justified), one cumulative window per class, one "
    "reduce. At 100 TB the only row-bounded pass is the first "
    "aggregate; everything downstream is class-bounded.",
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir).select(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("band"),
    )
    cell = c.groupBy("c_mktsegment", "c_nationkey", "band").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    grps = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g")
    )
    from pyspark.sql import Window

    bands = c.groupBy("band").agg(F.count(F.lit(1)).cast("bigint").alias("c_band"))
    glob = bands.select(
        "band",
        F.sum("c_band").over(
            Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
        ).cast("decimal(20,0)").alias("cum_c"),
    )
    # ONE bounded-metadata collect (~12 band rows) yields both scalars
    # AND the literal cumulative table — the round-12 review catch:
    # separate c.count()/bands.count() actions each re-scanned the
    # customer table, and re-using the uncollected `glob` would have
    # recomputed it a second time inside the grid join
    band_rows = glob.collect()
    m = len(band_rows)
    # EMD normalizes by (m-1): a corpus whose sensitive attribute
    # collapses to a single band has no transport distance to measure
    # and would divide by zero (inf/NULL in the oracle) — fail loudly
    # at the collect step rather than emit a degenerate release audit.
    if m < 2:
        raise ValueError(
            "privacy_t_closeness requires >= 2 sensitive-attribute "
            f"bands; corpus collapsed to m={m} (EMD undefined)"
        )
    nn = max(int(r["cum_c"]) for r in band_rows)
    glob_lit = spark.createDataFrame(
        [(int(r["band"]), int(r["cum_c"])) for r in band_rows],
        "band bigint, cum_c_l bigint",
    ).select("band", F.col("cum_c_l").cast("decimal(20,0)").alias("cum_c"))
    grid = (
        grps.crossJoin(F.broadcast(glob_lit))  # classes x bands: dim-bounded
        .join(
            cell,
            ["c_mktsegment", "c_nationkey", "band"],
            "left",
        )
        .fillna({"cnt": 0})
    )
    w = Window.partitionBy("c_mktsegment", "c_nationkey").orderBy("band").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = grid.select(
        "c_mktsegment",
        "c_nationkey",
        "n_g",
        "cum_c",
        F.sum("cnt").over(w).cast("decimal(20,0)").alias("cum_g"),
    )
    term = F.abs(
        F.col("cum_g") * F.lit(nn).cast("decimal(20,0)")
        - F.col("cum_c") * F.col("n_g").cast("decimal(20,0)")
    )
    agg = cum.groupBy("c_mktsegment", "c_nationkey", "n_g").agg(
        F.sum(term).cast("decimal(38,0)").alias("emd_num_d")
    )
    den = F.lit(m - 1).cast("decimal(38,0)") * F.col("n_g") * F.lit(nn)
    return agg.select(
        "c_mktsegment",
        "c_nationkey",
        F.col("n_g").cast("bigint").alias("group_size"),
        F.lit(m).cast("bigint").alias("m_bands"),
        F.col("emd_num_d").cast("bigint").alias("emd_num"),
        F.round(
            F.col("emd_num_d").cast("double")
            / (F.lit(float(m - 1)) * F.col("n_g").cast("double") * F.lit(float(nn))),
            6,
        ).alias("emd"),
        (
            F.col("emd_num_d") * F.lit(T_CLOSE_DEN)
            > F.lit(T_CLOSE_NUM).cast("decimal(38,0)") * den
        ).alias("violates_t"),
    )


# --- golden-record survivorship (round 12) ------------------------------

# Entities simulate the same customer landed from ER_SOURCES upstream
# systems: entity_id = c_custkey // ER_SOURCES, each row one "source
# record". The survivorship rules are the classic MDM set.
ER_SOURCES = 3


@register(
    "er_survivorship_golden",
    oracle=f"""
    WITH src AS (
      SELECT c_custkey // {ER_SOURCES} AS entity_id, c_custkey, c_name,
             c_mktsegment, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer
    ),
    attrs AS (
      SELECT entity_id,
             CAST(count(*) AS BIGINT) AS n_sources,
             CAST(min(c_custkey) AS BIGINT) AS canonical_key,
             (min(struct_pack(a := -length(c_name), b := c_name))).b
               AS golden_name,
             (max(struct_pack(a := c_custkey, b := c_mktsegment))).b
               AS latest_segment,
             CAST(max(bal_cents) AS BIGINT) AS best_bal_cents
      FROM src GROUP BY entity_id
    ),
    nmode AS (
      SELECT entity_id,
             (min(struct_pack(a := -cnt, b := c_nationkey))).b AS modal_nation
      FROM (SELECT entity_id, c_nationkey, count(*) AS cnt
            FROM src GROUP BY 1, 2)
      GROUP BY entity_id
    )
    SELECT a.entity_id, n_sources, canonical_key, golden_name,
           latest_segment, best_bal_cents,
           CAST(modal_nation AS BIGINT) AS modal_nation
    FROM attrs a JOIN nmode USING (entity_id)
    """,
    doc="Golden-record survivorship merge — the step AFTER "
    "er_phonetic_blocking finds matches: collapse each matched "
    "entity's source records into one canonical row under the "
    "classic MDM rule set (min key as canonical id, longest name "
    "with lexicographic tie-break, segment from the latest record, "
    "most favorable balance, modal nation with min tie-break). Every rule is a deterministic struct-ordered "
    "min/max aggregate (the cookbook's arg-min/max discipline: "
    "Spark F.min(F.struct(...)) == DuckDB min(struct_pack(...)), "
    "each with a unique ordering prefix), so the golden table "
    "hashes identically — no first()/any_value() nondeterminism. "
    "Shape: two map-side-combined aggregates (attributes, nation "
    "mode) and one entity-keyed join; work is source-row-bounded "
    "in pass 1 and entity-bounded after, the exact shape that "
    "survives a 100 TB customer lake.",
)
def er_survivorship_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    src = c.select(
        (F.col("c_custkey") - F.col("c_custkey") % ER_SOURCES)
        .cast("bigint")
        .alias("ek"),  # == custkey // ER_SOURCES * ER_SOURCES (exact)
        "c_custkey",
        "c_name",
        "c_mktsegment",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
    ).withColumn("entity_id", (F.col("ek") / ER_SOURCES).cast("bigint")).drop("ek")
    attrs = src.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        F.min("c_custkey").cast("bigint").alias("canonical_key"),
        F.min(F.struct((-F.length("c_name")).alias("a"), F.col("c_name").alias("b")))
        .getField("b")
        .alias("golden_name"),
        F.max(
            F.struct(F.col("c_custkey").alias("a"), F.col("c_mktsegment").alias("b"))
        )
        .getField("b")
        .alias("latest_segment"),
        F.max("bal_cents").cast("bigint").alias("best_bal_cents"),
    )
    nmode = (
        src.groupBy("entity_id", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("entity_id")
        .agg(
            F.min(
                F.struct((-F.col("cnt")).alias("a"), F.col("c_nationkey").alias("b"))
            )
            .getField("b")
            .cast("bigint")
            .alias("modal_nation")
        )
    )
    return attrs.join(nmode, "entity_id")


# --- activity-segment migration matrix (round 12, wave-5 queue) ----------

RFM_SPLIT_DAYS = 15  # first half = days 0-14 from the corpus start


@register(
    "events_rfm_migration",
    oracle=f"""
    WITH d AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    anchor AS (SELECT min(day) AS d0 FROM d),
    halves AS (
      SELECT user_id,
             CASE WHEN datediff('day', d0, day) < {RFM_SPLIT_DAYS}
                  THEN 1 ELSE 2 END AS half,
             CAST(count(*) AS BIGINT) AS n
      FROM d CROSS JOIN anchor GROUP BY 1, 2
    ),
    seg AS (
      SELECT user_id, half,
             CASE ntile(3) OVER (PARTITION BY half ORDER BY n, user_id)
                  WHEN 1 THEN 'low' WHEN 2 THEN 'mid' ELSE 'high' END
               AS segment
      FROM halves
    ),
    m AS (
      SELECT coalesce(a.user_id, b.user_id) AS user_id,
             coalesce(a.segment, 'absent') AS seg_from,
             coalesce(b.segment, 'absent') AS seg_to
      FROM (SELECT * FROM seg WHERE half = 1) a
      FULL OUTER JOIN (SELECT * FROM seg WHERE half = 2) b
        USING (user_id)
    )
    SELECT seg_from, seg_to,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(min(user_id) AS BIGINT) AS sample_user
    FROM m GROUP BY 1, 2
    """,
    doc="Activity-segment migration matrix — the period-over-period "
    "cohort movement table (the RFM-migration / 'customer health "
    "flow' report) a growth warehouse refreshes weekly: split the "
    "corpus window at day 15, tercile each half's per-user activity "
    "into low/mid/high (ntile over the TOTAL order (n, user_id) — "
    "Spark and DuckDB share ntile's balanced-bucket definition, so "
    "the cut is deterministic), and count users per (from, to) "
    "cell, with churn-in/out captured by the full-outer 'absent' "
    "coalesce. All counts exact; sample_user is a deterministic "
    "min. Shape: one user x half reduce over the facts, one "
    "half-partitioned ntile window over the USER dimension, one "
    "user-keyed full outer join, and a 16-cell rollup — after the "
    "first reduce nothing row-bounded moves, the 100 TB shape for "
    "any period-migration report.",
)
def events_rfm_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, "events", sf_dir)
    d = e.select("user_id", F.date_trunc("day", "ts").cast("date").alias("day"))
    anchor = d.agg(F.min("day").alias("d0"))
    halves = (
        d.crossJoin(F.broadcast(anchor))
        .groupBy(
            "user_id",
            F.when(F.datediff(F.col("day"), F.col("d0")) < RFM_SPLIT_DAYS, 1)
            .otherwise(2)
            .alias("half"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.partitionBy("half").orderBy("n", "user_id")
    seg = halves.select(
        "user_id",
        "half",
        F.when(F.ntile(3).over(w) == 1, "low")
        .when(F.ntile(3).over(w) == 2, "mid")
        .otherwise("high")
        .alias("segment"),
    )
    a = seg.filter(F.col("half") == 1).select("user_id", F.col("segment").alias("s1"))
    b = seg.filter(F.col("half") == 2).select("user_id", F.col("segment").alias("s2"))
    m = a.join(b, "user_id", "full_outer").select(
        "user_id",
        F.coalesce(F.col("s1"), F.lit("absent")).alias("seg_from"),
        F.coalesce(F.col("s2"), F.lit("absent")).alias("seg_to"),
    )
    return m.groupBy("seg_from", "seg_to").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.min("user_id").cast("bigint").alias("sample_user"),
    )


# --- sorted-neighborhood ER blocking (round 12, wave-5 queue) ------------

SNM_WINDOW = 4  # each record pairs with the next 3 in sort order
SNM_BAL_CENTS = 50_000  # "close balance" verify: within $500


def _snm_oracle_sql() -> str:
    leads = "\n".join(
        f"""             lead(c_custkey, {k}) OVER win AS nbr_key_{k},
             lead(c_nationkey, {k}) OVER win AS nbr_nation_{k},
             lead(bal, {k}) OVER win AS nbr_bal_{k},"""
        for k in range(1, SNM_WINDOW)
    )
    legs = "\n      UNION ALL\n".join(
        f"""      SELECT c_custkey AS cust_a, nbr_key_{k} AS cust_b,
             {k} AS win_offset, c_nationkey, bal,
             nbr_nation_{k} AS nbr_nation, nbr_bal_{k} AS nbr_bal
      FROM w"""
        for k in range(1, SNM_WINDOW)
    )
    return f"""
    WITH s AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
             -- within-block sort key (blocked SNM: the window is
             -- PARTITIONED by segment, so blocks parallelize and the
             -- leading attribute need not ride the key)
             CAST(c_nationkey AS VARCHAR) || '|' || c_name AS sort_key
      FROM customer
    ),
    -- ONE window computes every lead (round-12 review catch: a union
    -- of separately-windowed legs re-sorts the table w-1 times)
    w AS (
      SELECT c_custkey, c_nationkey, bal,
{leads}
             sort_key
      FROM s
      WINDOW win AS (PARTITION BY c_mktsegment
                     ORDER BY sort_key, c_custkey)
    ),
    pairs AS (
{legs}
    )
    SELECT cust_a, cust_b,
           CAST(win_offset AS BIGINT) AS win_offset,
           CAST(abs(bal - nbr_bal) AS BIGINT) AS bal_diff_cents
    FROM pairs
    WHERE cust_b IS NOT NULL
      AND c_nationkey = nbr_nation
      AND abs(bal - nbr_bal) < {SNM_BAL_CENTS}
    """


@register(
    "er_sorted_neighborhood",
    oracle=_snm_oracle_sql(),
    doc="BLOCKED sorted-neighborhood ER blocking — the OTHER classic "
    "blocking method beside er_phonetic_blocking's hash-bucket "
    "keys: within each segment BLOCK, sort once on (nation | name) "
    "and compare each record only against the next "
    f"{SNM_WINDOW - 1} in sort order, so candidate generation is "
    "O(N log N + N*w) instead of O(N^2) — the method of choice "
    "when a single blocking key splits true matches across buckets "
    "but sort-adjacency keeps them close (the segment partition is "
    "the standard SNM+blocking hybrid: pure global SNM would "
    "funnel the whole sort through ONE Spark window task). The "
    "cheap verify (same nation, balances within $500 in exact "
    "cents) emits candidate pairs for the survivorship stage "
    "(er_survivorship_golden). Determinism: total per-block order "
    "(sort key, custkey). Plan shape (asserted in test_plans.py): "
    "ONE segment-partitioned Window computes ALL the leads — "
    "Catalyst collapses same-window functions, so the table sorts "
    "once per block, not once per offset (round-12 review catch: "
    "the first formulation unioned three separately-windowed legs "
    "and paid the sort three times) — then a constant-factor "
    "array-explode; no join anywhere. At 100 TB blocks "
    "parallelize across executors and each sorts locally.",
)
def er_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _snm_candidate_pairs(spark, sf_dir, carry_names=False)


def _snm_candidate_pairs(
    spark: SparkSession, sf_dir: str, carry_names: bool
) -> DataFrame:
    """Shared SNM candidate generator for er_sorted_neighborhood and
    er_funnel: (cust_a, cust_b, win_offset, bal_diff_cents), plus
    (name_a, name_b) when ``carry_names`` — the funnel's DL-verify
    stage needs both names and carrying them through the SAME single
    window beats re-joining the customer table twice afterwards."""
    from pyspark.sql import Window

    c = load(spark, "customer", sf_dir)
    s = c.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        "c_name",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal"),
        F.concat(
            F.col("c_nationkey").cast("string"), F.lit("|"), F.col("c_name")
        ).alias("sort_key"),
    )
    # ONE segment-partitioned window computes every lead — Catalyst
    # collapses same-window functions into a single Window operator, so
    # the table sorts ONCE per partition (the round-12 review catch: a
    # union of separately-windowed legs re-sorted it w-1 times, and an
    # UNPARTITIONED window funnels all rows through one task).
    win = Window.partitionBy("c_mktsegment").orderBy("sort_key", "c_custkey")
    # leads materialize in their own Project first — Spark refuses
    # window expressions inside a generator
    lead_cols = []
    for k in range(1, SNM_WINDOW):
        lead_cols += [
            F.lead("c_custkey", k).over(win).alias(f"nbr_key_{k}"),
            F.lead("c_nationkey", k).over(win).alias(f"nbr_nation_{k}"),
            F.lead("bal", k).over(win).alias(f"nbr_bal_{k}"),
        ]
        if carry_names:
            lead_cols.append(F.lead("c_name", k).over(win).alias(f"nbr_name_{k}"))
    leaded = s.select("c_custkey", "c_nationkey", "c_name", "bal", *lead_cols)
    nbrs = F.array(
        *[
            F.struct(
                F.lit(k).cast("bigint").alias("win_offset"),
                F.col(f"nbr_key_{k}").alias("cust_b"),
                F.col(f"nbr_nation_{k}").alias("nbr_nation"),
                F.col(f"nbr_bal_{k}").alias("nbr_bal"),
                (
                    F.col(f"nbr_name_{k}") if carry_names else F.lit(None).cast("string")
                ).alias("nbr_name"),
            )
            for k in range(1, SNM_WINDOW)
        ]
    )
    w = leaded.select(
        F.col("c_custkey").alias("cust_a"),
        "c_nationkey",
        "c_name",
        "bal",
        F.explode(nbrs).alias("nbr"),
    )
    out = w.filter(
        F.col("nbr.cust_b").isNotNull()
        & (F.col("c_nationkey") == F.col("nbr.nbr_nation"))
        & (F.abs(F.col("bal") - F.col("nbr.nbr_bal")) < SNM_BAL_CENTS)
    ).select(
        "cust_a",
        F.col("nbr.cust_b").alias("cust_b"),
        F.col("nbr.win_offset").alias("win_offset"),
        F.abs(F.col("bal") - F.col("nbr.nbr_bal"))
        .cast("bigint")
        .alias("bal_diff_cents"),
        F.col("c_name").alias("name_a"),
        F.col("nbr.nbr_name").alias("name_b"),
    )
    if not carry_names:
        out = out.drop("name_a", "name_b")
    return out


# --- end-to-end ER funnel (round 13) --------------------------------------

ER_FUNNEL_DL_MAX = 2  # verify: true Damerau-Levenshtein on names

# Streaming blocker's key width (nation | name[:PREFIX]) — owned here
# so the batch reconciler and streaming/er_ingest.py share ONE
# operating point (measured: 16 gives ~3.7k blocks of ~4 at sf0.1;
# 14 collapsed to 50 blocks of ~300 — see er_ingest module doc).
ER_BLOCK_PREFIX = 16


def _er_funnel_oracle() -> str:
    leads = "\n".join(
        f"""             lead(c_custkey, {k}) OVER win AS nbr_key_{k},
             lead(c_nationkey, {k}) OVER win AS nbr_nation_{k},
             lead(bal, {k}) OVER win AS nbr_bal_{k},
             lead(c_name, {k}) OVER win AS nbr_name_{k},"""
        for k in range(1, SNM_WINDOW)
    )
    legs = "\n      UNION ALL\n".join(
        f"""      SELECT c_custkey AS cust_a, nbr_key_{k} AS cust_b,
             c_nationkey, bal, c_name AS name_a,
             nbr_nation_{k} AS nbr_nation, nbr_bal_{k} AS nbr_bal,
             nbr_name_{k} AS name_b
      FROM w"""
        for k in range(1, SNM_WINDOW)
    )
    return f"""
    WITH RECURSIVE s AS (
      SELECT c_custkey, c_nationkey, c_mktsegment, c_name,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
             CAST(c_nationkey AS VARCHAR) || '|' || c_name AS sort_key
      FROM customer
    ),
    w AS (
      SELECT c_custkey, c_nationkey, c_name, bal,
{leads}
             sort_key
      FROM s
      WINDOW win AS (PARTITION BY c_mktsegment
                     ORDER BY sort_key, c_custkey)
    ),
    pairs AS (
{legs}
    ),
    cand AS (
      SELECT cust_a, cust_b, name_a, name_b
      FROM pairs
      WHERE cust_b IS NOT NULL
        AND c_nationkey = nbr_nation
        AND abs(bal - nbr_bal) < {SNM_BAL_CENTS}
    ),
    matched AS (
      SELECT cust_a, cust_b FROM cand
      WHERE damerau_levenshtein(name_a, name_b) <= {ER_FUNNEL_DL_MAX}
    ),
    edges AS (
      SELECT cust_a AS e_src, cust_b AS e_dst FROM matched
      UNION ALL
      SELECT cust_b, cust_a FROM matched
    ),
    reach(id, r) AS (
      SELECT e_src, e_src FROM edges
      UNION
      SELECT reach.id, e.e_dst FROM reach JOIN edges e ON e.e_src = reach.r
    ),
    comp AS (SELECT id, min(r) AS c FROM reach GROUP BY id)
    SELECT 'total_records' AS stage, CAST(0 AS BIGINT) AS stage_idx,
           CAST(count(*) AS BIGINT) AS n_records FROM customer
    UNION ALL
    SELECT 'snm_candidates', 1, CAST(count(*) AS BIGINT) FROM cand
    UNION ALL
    SELECT 'dl_matches', 2, CAST(count(*) AS BIGINT) FROM matched
    UNION ALL
    SELECT 'golden_records', 3,
           (SELECT CAST(count(*) AS BIGINT) FROM customer)
           - (SELECT CAST(count(*) AS BIGINT) FROM comp WHERE id != c)
    """


@register(
    "er_funnel",
    oracle=_er_funnel_oracle(),
    doc="Stage-count funnel of the packaged ENTITY-RESOLUTION pipeline "
    "— the ER twin of curation_funnel, composing the three "
    "individually-gated stages into one deployable report: customer "
    "records -> sorted-neighborhood blocking (er_sorted_neighborhood's "
    "exact candidate generator, shared helper) -> true "
    f"Damerau-Levenshtein verify on names (distance <= "
    f"{ER_FUNNEL_DL_MAX}, fuzzy_match_damerau's Arrow-batched UDF, "
    "priced per CANDIDATE only) -> transitive golden records "
    "(connected_components' pointer-doubling min-label propagation; "
    "golden = records - merged-away members). One count per stage — "
    "the monitoring view an MDM operator watches to see where records "
    "merge. The oracle recomputes every stage from first principles, "
    "closing the match graph with a recursive CTE, so the composed "
    "pipeline is hash-checked END TO END, not just its pieces. Shape: "
    "candidate legs re-scan the one segment-partitioned window "
    "(dimension-sized input, stage counts are aggregates — no persist "
    "of a corpus-sized frame); the CC stage shuffles only id pairs, "
    "O(E) longs per iteration, O(log diameter) rounds. At 100 TB the "
    "verify UDF cost is bounded by the SNM window width w-1 per "
    "record, never |block|^2.",
)
def er_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import connected_components

    dl_udf = dl_pandas_udf()

    c = load(spark, "customer", sf_dir)
    # candidate and match frames PERSISTED (round-15, the er_reconcile
    # treatment): both are candidate-pair-sized (dimension x SNM
    # window — never corpus-sized), and unpersisted the count legs
    # lazily re-ran the SNM window three times and the DL verify
    # twice (CC's probe + each leg). eager_release below materializes
    # the 4-row funnel against the hot copies and drops both caches.
    cand = _snm_candidate_pairs(spark, sf_dir, carry_names=True).persist()
    matched = (
        cand.filter(dl_udf("name_a", "name_b") <= ER_FUNNEL_DL_MAX)
        .select("cust_a", "cust_b")
        .persist()
    )
    # connected_components materializes the match graph ONCE into its
    # edge checkpoint (respecting the caller-owned cache), so the
    # labels frame below never re-executes the window+UDF plan
    labels = connected_components(matched, src="cust_a", dst="cust_b")
    zero = F.lit(0).cast("bigint")

    def leg(df: DataFrame, stage: str, idx: int, n) -> DataFrame:
        return df.agg(n.alias("n_records")).select(
            F.lit(stage).alias("stage"),
            F.lit(idx).cast("bigint").alias("stage_idx"),
            "n_records",
        )

    n_rows = F.count(F.lit(1)).cast("bigint")
    s0 = leg(c, "total_records", 0, n_rows)
    s1 = leg(cand, "snm_candidates", 1, n_rows)
    s2 = leg(matched, "dl_matches", 2, n_rows)
    # golden = total - members that merged away (non-canonical
    # vertices of the match graph); coalesce: an all-unique corpus has
    # an empty graph and SUM over zero rows is NULL, not 0
    nc = labels.agg(
        F.coalesce(
            F.sum((F.col("doc_id") != F.col("canonical_id")).cast("bigint")), zero
        ).alias("nc")
    )
    s3 = (
        c.agg(n_rows.alias("t"))
        .crossJoin(F.broadcast(nc))  # 1-row x 1-row scalar join
        .select(
            F.lit("golden_records").alias("stage"),
            F.lit(3).cast("bigint").alias("stage_idx"),
            (F.col("t") - F.col("nc")).cast("bigint").alias("n_records"),
        )
    )
    from ..plans.stage import eager_release

    out = s0.unionByName(s1).unionByName(s2).unionByName(s3)
    return eager_release(out, "er_funnel", cand, matched)


# --- DP median via the exponential mechanism (round 12, wave-5 queue) ----

DPQ_EPSILON = 0.1
DPQ_BUCKETS = 100  # candidate outputs: [10c, 10c+10) over value 0..1000


@register(
    "privacy_dp_quantiles",
    oracle=f"""
    WITH h AS (
      SELECT event_type, CAST(floor(value / 10) AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    cand AS (
      SELECT event_type, c.c,
             coalesce(sum(CASE WHEN h.b < c.c THEN cnt END), 0)
               + coalesce(sum(CASE WHEN h.b = c.c THEN cnt END), 0) / 2
               AS below_mid,
             CAST(sum(cnt) AS BIGINT) AS n
      FROM h CROSS JOIN (SELECT unnest(range(0, {DPQ_BUCKETS})) AS c) c
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT event_type, c, n,
             -abs(2 * below_mid - n) AS util,
             round(-ln(-ln((CAST(('0x' || substr(md5('dpq:' || event_type
                     || ':' || CAST(c AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
                   / 4294967296.0)), 9) AS gumbel
      FROM cand
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n_events,
           CAST((min(struct_pack(
                  a := -({DPQ_EPSILON} * 0.5 * util + gumbel),
                  b := c))).b AS BIGINT) AS dp_bucket,
           CAST((min(struct_pack(
                  a := -({DPQ_EPSILON} * 0.5 * util + gumbel),
                  b := c))).b * 10 + 5 AS BIGINT) AS dp_median_approx,
           CAST((min(struct_pack(a := -util, b := c))).b
                * 10 + 5 AS BIGINT) AS best_utility_mid
    FROM scored GROUP BY event_type
    """,
    doc="Differentially-private MEDIAN release per event stream via "
    "the EXPONENTIAL MECHANISM — the privacy family's fourth rung "
    "(privacy_dp_counts adds Laplace noise to counts; medians have "
    "unbounded sensitivity, so the right tool scores candidate "
    "outputs by utility and samples with probability exp(eps*u/2)): "
    "candidates are the 100 value buckets, utility the exact "
    "integer rank distance -|2*below_mid - n|, and the sample is "
    "drawn by the Gumbel-max trick with md5-seeded uniforms (the "
    "privacy_dp_counts determinism pattern — same seeds, same "
    "noise, same draw in both engines; the Gumbel is rounded to "
    "9dp per the cookbook's libm discipline before the "
    "struct-ordered argmax with candidate tie-break). "
    "best_utility_mid sits beside the release so the gate also "
    "checks the noiseless answer — at eps = 0.1 the fixture shows "
    "the textbook tradeoff (one stream releases the adjacent "
    "bucket at n ~ 200; all five are exact at n ~ 2000). Shape: ONE histogram reduce "
    "touches the facts, then a types x 100-candidate "
    "dimension-bounded grid — the 100 TB shape for any "
    "exponential-mechanism release (candidate sets are small by "
    "construction; the data pass is one aggregate).",
)
def privacy_dp_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    h = e.groupBy(
        "event_type", F.floor(F.col("value") / 10).cast("bigint").alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    cand_ids = spark.range(DPQ_BUCKETS).select(F.col("id").cast("bigint").alias("c"))
    cand = (
        h.crossJoin(F.broadcast(cand_ids))
        .groupBy("event_type", "c")
        .agg(
            (
                F.coalesce(
                    F.sum(F.when(F.col("b") < F.col("c"), F.col("cnt"))), F.lit(0)
                )
                + F.coalesce(
                    F.sum(F.when(F.col("b") == F.col("c"), F.col("cnt"))),
                    F.lit(0),
                )
                / 2
            ).alias("below_mid"),
            F.sum("cnt").cast("bigint").alias("n"),
        )
    )
    u01 = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("dpq:"),
                        F.col("event_type"),
                        F.lit(":"),
                        F.col("c").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    scored = cand.select(
        "event_type",
        "c",
        "n",
        (-F.abs(F.lit(2) * F.col("below_mid") - F.col("n"))).alias("util"),
        F.round(-F.log(-F.log(u01)), 9).alias("gumbel"),
    )
    key = -(F.lit(DPQ_EPSILON) * F.lit(0.5) * F.col("util") + F.col("gumbel"))
    dp_c = F.min(F.struct(key.alias("a"), F.col("c").alias("b"))).getField("b")
    best_c = F.min(
        F.struct((-F.col("util")).alias("a"), F.col("c").alias("b"))
    ).getField("b")
    return scored.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_events"),
        dp_c.cast("bigint").alias("dp_bucket"),
        (dp_c * 10 + 5).cast("bigint").alias("dp_median_approx"),
        (best_c * 10 + 5).cast("bigint").alias("best_utility_mid"),
    )


# --- XYZ demand-variability classes (round 12, wave-5 queue) -------------

# CV bands: X (steady, CV <= 1/2), Y (variable, CV <= 3/5), Z
# (erratic) — the 0.5/0.6 operating point (industry picks cuts per
# assortment; this one makes all three classes live on the fixture).
# CV^2 = (n*SS - S^2) / S^2 compares cross-multiplied: no sqrt, no
# division — X iff 4*(n*SS-S^2) <= S^2, Y iff 25*(n*SS-S^2) <= 9*S^2.
XYZ_MIN_DEMANDS = 3


@register(
    "part_xyz_variability",
    oracle=f"""
    WITH d AS (
      SELECT l_partkey AS pk, CAST(l_shipdate AS DATE) AS day,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    s AS (
      SELECT pk, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(q) AS BIGINT) AS sq,
             CAST(sum(q * q) AS BIGINT) AS ss
      FROM d GROUP BY pk
    )
    SELECT pk AS l_partkey, n AS n_demands, sq AS total_qty,
           CAST(n * ss - sq * sq AS BIGINT) AS var_num,
           round(sqrt(CAST(n * ss - sq * sq AS DOUBLE)) / sq, 6) AS cv,
           CASE WHEN 4 * (n * ss - sq * sq) <= sq * sq THEN 'X'
                WHEN 25 * (n * ss - sq * sq) <= 9 * sq * sq THEN 'Y'
                ELSE 'Z' END AS xyz_class
    FROM s WHERE n >= {XYZ_MIN_DEMANDS}
    """,
    doc="XYZ demand-variability classification per part — the second "
    "axis of the ABC/XYZ inventory matrix (part_abc_classification "
    "ranks by VALUE; this bands by forecastABILITY): X = steady "
    "(CV <= 1/2, forecast with time_holt_*), Y = variable (CV <= "
    "3/5), Z = erratic (route to time_croston_intermittent — the "
    "two operators are designed as a pair). The band decision "
    "never touches a float: CV^2 = (n*SS - S^2)/S^2 compares "
    "against (1/2)^2 and (3/5)^2 fully cross-multiplied over exact "
    "sufficient sums; the displayed cv is one sqrt+division, "
    "presentation-only. OPERAND BOUND: n*SS <= days * (sum q)^2 "
    "stays in BIGINT to ~3e9 lifetime units per part. Shape: one "
    "(part, day) reduce then one part reduce, both map-side "
    "combined — two scans collapse to one exchange; part-dimension "
    "output, scan-bound at 100 TB.",
)
def part_xyz_variability(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    d = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.col("l_shipdate").cast("date").alias("day"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("q"))
    s = d.groupBy("pk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("ss"),
    ).filter(F.col("n") >= XYZ_MIN_DEMANDS)
    var_num = F.col("n") * F.col("ss") - F.col("sq") * F.col("sq")
    return s.select(
        F.col("pk").alias("l_partkey"),
        F.col("n").alias("n_demands"),
        F.col("sq").alias("total_qty"),
        var_num.cast("bigint").alias("var_num"),
        # Display-only libm column: one sqrt + one IEEE division,
        # round(.,6) before comparison — never feeds the band decision
        # (that is the cross-multiplied CASE below), same contract as
        # time_dominant_period's power_str / sim_ndcg_eval's log2 table.
        F.round(
            F.sqrt(var_num.cast("double")) / F.col("sq").cast("double"), 6
        ).alias("cv"),
        F.when(F.lit(4) * var_num <= F.col("sq") * F.col("sq"), "X")
        .when(F.lit(25) * var_num <= F.lit(9) * F.col("sq") * F.col("sq"), "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )


# --- ER reconciliation: streaming blocker vs batch funnel (round 14) ------


def _er_reconcile_oracle() -> str:
    leads = "\n".join(
        f"""             lead(c_custkey, {k}) OVER win AS nbr_key_{k},
             lead(c_nationkey, {k}) OVER win AS nbr_nation_{k},
             lead(bal, {k}) OVER win AS nbr_bal_{k},
             lead(c_name, {k}) OVER win AS nbr_name_{k},"""
        for k in range(1, SNM_WINDOW)
    )
    legs = "\n      UNION ALL\n".join(
        f"""      SELECT c_custkey AS cust_a, nbr_key_{k} AS cust_b,
             c_nationkey, bal, c_name AS name_a,
             nbr_nation_{k} AS nbr_nation, nbr_bal_{k} AS nbr_bal,
             nbr_name_{k} AS name_b
      FROM w"""
        for k in range(1, SNM_WINDOW)
    )
    return f"""
    WITH RECURSIVE s AS (
      SELECT c_custkey, c_nationkey, c_mktsegment, c_name,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
             CAST(c_nationkey AS VARCHAR) || '|'
               || substr(c_name, 1, {ER_BLOCK_PREFIX}) AS block_key,
             CAST(c_nationkey AS VARCHAR) || '|' || c_name AS sort_key
      FROM customer
    ),
    stream_pairs AS (
      SELECT DISTINCT a.c_custkey AS pa, b.c_custkey AS pb
      FROM s a JOIN s b
        ON a.block_key = b.block_key AND a.c_custkey < b.c_custkey
      WHERE abs(a.bal - b.bal) < {SNM_BAL_CENTS}
        AND damerau_levenshtein(a.c_name, b.c_name) <= {ER_FUNNEL_DL_MAX}
    ),
    w AS (
      SELECT c_custkey, c_nationkey, c_name, bal,
{leads}
             sort_key
      FROM s
      WINDOW win AS (PARTITION BY c_mktsegment
                     ORDER BY sort_key, c_custkey)
    ),
    pairs AS (
{legs}
    ),
    batch_pairs AS (
      SELECT DISTINCT least(cust_a, cust_b) AS pa,
             greatest(cust_a, cust_b) AS pb
      FROM pairs
      WHERE cust_b IS NOT NULL
        AND c_nationkey = nbr_nation
        AND abs(bal - nbr_bal) < {SNM_BAL_CENTS}
        AND damerau_levenshtein(name_a, name_b) <= {ER_FUNNEL_DL_MAX}
    ),
    batch_only AS (
      -- anti-join, not EXCEPT: DuckDB's WITH RECURSIVE chain only
      -- admits UNION/UNION ALL set-op CTE bodies
      SELECT bp.pa, bp.pb FROM batch_pairs bp
      WHERE NOT EXISTS (SELECT 1 FROM stream_pairs sp
                        WHERE sp.pa = bp.pa AND sp.pb = bp.pb)
    ),
    union_pairs AS (
      SELECT pa, pb FROM batch_pairs
      UNION
      SELECT pa, pb FROM stream_pairs
    ),
    s_edges AS (
      SELECT pa AS e_src, pb AS e_dst FROM stream_pairs
      UNION ALL
      SELECT pb, pa FROM stream_pairs
    ),
    u_edges AS (
      SELECT pa AS e_src, pb AS e_dst FROM union_pairs
      UNION ALL
      SELECT pb, pa FROM union_pairs
    ),
    reach_s(id, r) AS (
      SELECT e_src, e_src FROM s_edges
      UNION
      SELECT reach_s.id, e.e_dst
      FROM reach_s JOIN s_edges e ON e.e_src = reach_s.r
    ),
    comp_s AS (SELECT id, min(r) AS c FROM reach_s GROUP BY id),
    reach_u(id, r) AS (
      SELECT e_src, e_src FROM u_edges
      UNION
      SELECT reach_u.id, e.e_dst
      FROM reach_u JOIN u_edges e ON e.e_src = reach_u.r
    ),
    comp_u AS (SELECT id, min(r) AS c FROM reach_u GROUP BY id)
    SELECT 'total_records' AS stage, CAST(0 AS BIGINT) AS stage_idx,
           CAST(count(*) AS BIGINT) AS n_records FROM customer
    UNION ALL
    SELECT 'stream_matches', 1, CAST(count(*) AS BIGINT) FROM stream_pairs
    UNION ALL
    SELECT 'batch_matches', 2, CAST(count(*) AS BIGINT) FROM batch_pairs
    UNION ALL
    SELECT 'batch_only_matches', 3, CAST(count(*) AS BIGINT) FROM batch_only
    UNION ALL
    SELECT 'corrected_records', 4, CAST(count(*) AS BIGINT)
    FROM customer k
    LEFT JOIN comp_s cs ON cs.id = k.c_custkey
    LEFT JOIN comp_u cu ON cu.id = k.c_custkey
    WHERE coalesce(cs.c, k.c_custkey) != coalesce(cu.c, k.c_custkey)
    UNION ALL
    SELECT 'golden_records_after', 5,
           (SELECT CAST(count(*) AS BIGINT) FROM customer)
           - (SELECT CAST(count(*) AS BIGINT) FROM comp_u WHERE id != c)
    """


@register(
    "er_reconcile",
    oracle=_er_reconcile_oracle(),
    doc="Scheduled RECONCILIATION between the streaming blocker's "
    "maintained linkage and the batch ER funnel — the operator that "
    "closes streaming/er_ingest.py's documented recall gap (an edit "
    "INSIDE the nation|name[:16] block prefix lands the record in "
    "another block, so the incremental path can never link it; the "
    "batch sweep's sort-adjacency can). Runs BOTH candidate "
    "generators over the same current corpus — the streaming "
    "blocker's equality-blocked pairs (idealized uncapped: er_ingest "
    "hub/rank caps only shave hot blocks) and er_funnel's "
    "sorted-neighborhood pass — through the shared verify (same "
    "nation, balance within $500 exact cents, true "
    f"Damerau-Levenshtein <= {ER_FUNNEL_DL_MAX}), then reports the "
    "monotone repair an MDM reconciler would apply: batch-only links "
    "are FOLDED IN (links are only ever added, never revoked — the "
    "irreversible-merge discipline of the label store), and "
    "corrected_records counts records whose golden entity changes "
    "under the union closure vs the stream-only closure. Stage "
    "funnel: total -> stream_matches -> batch_matches -> batch_only "
    "-> corrected -> golden_after; the oracle recomputes every stage "
    "from first principles with TWO recursive-CTE closures. Shape: "
    "one equality-blocked self-join (the measured prefix-16 operating "
    "point: ~3.7k blocks of ~4 at sf0.1 — never all-pairs), one "
    "segment-partitioned SNM window, DL priced per CANDIDATE, and two "
    "pointer-doubling CC runs over id-pair edges (O(E) longs, O(log "
    "diameter) rounds). At 100 TB this is the weekly batch job beside "
    "the always-on ingest — the lake is scanned twice (block + sort), "
    "everything downstream is candidate- or edge-sized. Reference "
    "contact: none (the reference has no ER; this completes the "
    "round-13 family per the round-13 verdict item 6).",
)
def er_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import connected_components

    dl_udf = dl_pandas_udf()

    c = load(spark, "customer", sf_dir)
    s = c.select(
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal"),
        F.concat(
            F.col("c_nationkey").cast("string"),
            F.lit("|"),
            F.col("c_name").substr(1, ER_BLOCK_PREFIX),
        ).alias("block_key"),
    )
    a = s.select(
        F.col("c_custkey").alias("pa"),
        F.col("c_name").alias("name_a"),
        F.col("bal").alias("bal_a"),
        "block_key",
    )
    b = s.select(
        F.col("c_custkey").alias("pb"),
        F.col("c_name").alias("name_b"),
        F.col("bal").alias("bal_b"),
        "block_key",
    )
    # both pair frames are PERSISTED (round-15, r14 verdict item 3):
    # they are id-pair-sized (dimension-bounded), and each one feeds
    # FOUR consumers — its count leg, the batch_only anti-join, the
    # union closure, and a CC call. Unpersisted, the count legs
    # lazily re-executed both candidate+DL generator plans, adding
    # roughly two dimension-sized Damerau-Levenshtein passes per run;
    # eager_release at the end materializes the 6-row funnel against
    # the hot copies and drops both caches before returning.
    stream_pairs = (
        a.join(b, "block_key")
        .filter(
            (F.col("pa") < F.col("pb"))
            & (F.abs(F.col("bal_a") - F.col("bal_b")) < SNM_BAL_CENTS)
        )
        .filter(dl_udf("name_a", "name_b") <= ER_FUNNEL_DL_MAX)
        .select("pa", "pb")
        .distinct()
        .persist()
    )
    batch_pairs = (
        _snm_candidate_pairs(spark, sf_dir, carry_names=True)
        .filter(dl_udf("name_a", "name_b") <= ER_FUNNEL_DL_MAX)
        .select(
            F.least("cust_a", "cust_b").alias("pa"),
            F.greatest("cust_a", "cust_b").alias("pb"),
        )
        .distinct()
        .persist()
    )
    batch_only = batch_pairs.join(stream_pairs, ["pa", "pb"], "left_anti")
    union_pairs = batch_pairs.unionByName(stream_pairs).distinct()
    # each CC call checkpoints its edge list internally, so the labels
    # frames below never re-execute the candidate+DL plans
    labels_s = connected_components(stream_pairs, src="pa", dst="pb").select(
        F.col("doc_id").alias("k_s"), F.col("canonical_id").alias("c_s")
    )
    labels_u = connected_components(union_pairs, src="pa", dst="pb").select(
        F.col("doc_id").alias("k_u"), F.col("canonical_id").alias("c_u")
    )
    n_rows = F.count(F.lit(1)).cast("bigint")

    def leg(df: DataFrame, stage: str, idx: int) -> DataFrame:
        return df.agg(n_rows.alias("n_records")).select(
            F.lit(stage).alias("stage"),
            F.lit(idx).cast("bigint").alias("stage_idx"),
            "n_records",
        )

    corrected = (
        c.select(F.col("c_custkey").alias("k"))
        .join(labels_s, F.col("k") == F.col("k_s"), "left")
        .join(labels_u, F.col("k") == F.col("k_u"), "left")
        .filter(
            F.coalesce(F.col("c_s"), F.col("k"))
            != F.coalesce(F.col("c_u"), F.col("k"))
        )
    )
    zero = F.lit(0).cast("bigint")
    merged_u = labels_u.agg(
        F.coalesce(
            F.sum((F.col("k_u") != F.col("c_u")).cast("bigint")), zero
        ).alias("nm")
    )
    golden_after = (
        c.agg(n_rows.alias("t"))
        .crossJoin(F.broadcast(merged_u))  # 1-row x 1-row scalar join
        .select(
            F.lit("golden_records_after").alias("stage"),
            F.lit(5).cast("bigint").alias("stage_idx"),
            (F.col("t") - F.col("nm")).cast("bigint").alias("n_records"),
        )
    )
    out = (
        leg(c, "total_records", 0)
        .unionByName(leg(stream_pairs, "stream_matches", 1))
        .unionByName(leg(batch_pairs, "batch_matches", 2))
        .unionByName(leg(batch_only, "batch_only_matches", 3))
        .unionByName(leg(corrected, "corrected_records", 4))
        .unionByName(golden_after)
    )
    from ..plans.stage import eager_release

    return eager_release(out, "er_reconcile", stream_pairs, batch_pairs)


# --- k-map release audit (round 14) ----------------------------------------

KMAP_K = 10  # population classes smaller than this are re-identifiable


@register(
    "privacy_k_map",
    oracle=f"""
    WITH pop AS (
      SELECT c_mktsegment, c_nationkey,
             CAST(count(*) AS BIGINT) AS n_population
      FROM customer GROUP BY 1, 2
    ),
    samp AS (
      SELECT c.c_mktsegment, c.c_nationkey,
             CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_sample
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
      GROUP BY 1, 2
    )
    SELECT s.c_mktsegment, s.c_nationkey, s.n_sample, p.n_population,
           (p.n_population < {KMAP_K}) AS at_risk,
           round(1.0 / p.n_population, 9) AS reident_risk
    FROM samp s
    JOIN pop p
      ON p.c_mktsegment = s.c_mktsegment AND p.c_nationkey = s.c_nationkey
    """,
    doc="k-map release audit over quasi-identifiers — the POPULATION "
    "attack model the k-anonymity family's fourth rung: "
    "privacy_k_anonymity measures class sizes INSIDE the released "
    "sample, which overstates risk when the release is a subset (a "
    "sample-unique record is safe if its QI class is common in the "
    "population the attacker actually matches against). Here the "
    "release is the FULFILLED-order cohort (customers with >= 1 "
    "status-'F' order — a proper subset: on this fixture every "
    "customer transacts, so an all-orders release would collapse "
    "sample onto population and the two models could never "
    "disagree), the population is the full customer dimension, and each "
    "released (segment, nation) class reports its sample count, its "
    "POPULATION count, the k-map violation flag (population class "
    f"< {KMAP_K} -> linkage attack re-identifies), and the "
    "per-record re-identification risk 1/N_population "
    "(presentation-only single division, round 9). Shape: two "
    "map-side-combined reduces (population classes; distinct "
    "transacting customers per class via one orders semi-reduce) and "
    "one QI-bounded class join — at 100 TB both sides of the final "
    "join are quasi-identifier-bounded (|segments| x |nations|), "
    "never row-bounded; the orders scan is the only fact pass. "
    "Reference contact: none (no privacy surface in the reference; "
    "north-star §2-D release-audit family).",
)
def privacy_k_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir)
    pop = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_population")
    )
    samp = (
        c.join(
            o.filter(F.col("o_orderstatus") == "F"),
            c["c_custkey"] == o["o_custkey"],
        )
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(F.countDistinct("c_custkey").cast("bigint").alias("n_sample"))
    )
    return samp.join(pop, ["c_mktsegment", "c_nationkey"]).select(
        "c_mktsegment",
        "c_nationkey",
        "n_sample",
        "n_population",
        (F.col("n_population") < KMAP_K).alias("at_risk"),
        F.round(F.lit(1.0) / F.col("n_population"), 9).alias("reident_risk"),
    )
