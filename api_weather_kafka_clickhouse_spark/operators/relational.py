"""Core relational operators: filter/project/sort/limit, scalar
function battery, conditionals, set ops, distinct, subqueries.

Reference parity: the reference's only hand-written relational ops are
an equality filter, a sort, and projections over the city dimension
(reference app/city_loader.py:14-29,53-57 — SURVEY.md §2-A2/A3/A5);
everything else here is the §2-C "new query layer" the reference
delegates to ClickHouse but never exercises.

Scale notes: every query below is a single scan + narrow projection —
Catalyst pushes the filters and the column pruning into the parquet
reader (verified via .explain: PushedFilters/ReadSchema), so at 100 TB
these are IO-bound scans with no shuffle except the explicit
sort/distinct ones, which AQE handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


@register(
    "filter_project",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value_d
    FROM events
    WHERE event_type = 'purchase' AND value > 100
    """,
    doc="Equality+range filter with projection and 2-decimal rounding "
    "via an exact decimal cast, rendered as double "
    "(reference filter: app/city_loader.py:14-17).",
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "events", sf_dir)
        .filter((F.col("event_type") == "purchase") & (F.col("value") > 100))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("value").cast("decimal(18,2)").cast("double").alias("value_d"),
        )
    )


@register(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_d
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Global top-k (reference sort: app/city_loader.py:29). Spark "
    "TakeOrderedAndProject: per-partition heap + driver merge — no full "
    "sort at 100 TB.",
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, "orders", sf_dir)
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price_d"),
        )
        .orderBy(F.col("price_d").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "scalar_strings",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                    AS name_upper,
           length(p_name)                   AS name_len,
           replace(p_type, ' ', '_')        AS type_snake,
           len(string_split(p_name, ' '))   AS n_words,
           substr(p_brand, 1, 5)            AS brand5,
           concat(p_brand, '#', p_type)     AS brand_type,
           ascii(p_name)                    AS first_cp
    FROM part
    """,
    doc="String function battery (§2-E: concat/format/upper/length...).",
)
def scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, "part", sf_dir)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.size(F.split("p_name", " ")).cast("bigint").alias("n_words"),
        F.substring("p_brand", 1, 5).alias("brand5"),
        F.concat("p_brand", F.lit("#"), "p_type").alias("brand_type"),
        F.ascii("p_name").cast("int").alias("first_cp"),
    )


@register(
    "scalar_dates",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                              AS yr,
           month(o_orderdate)                             AS mo,
           day(o_orderdate)                               AS dom,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
    FROM orders
    """,
    doc="Date/time battery (§2-E: today()/now()/toYYYYMM mappings — "
    "reference clickhouse_ddl.sql:7-8,31).",
)
def scalar_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since"),
    )


@register(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice)  AS BIGINT) AS price_ceil,
           abs(l_discount - 0.05)                 AS disc_dev,
           l_orderkey % 7                         AS key_mod,
           l_quantity * l_quantity                AS qty_sq,
           sqrt(l_quantity)                       AS qty_sqrt
    FROM lineitem
    """,
    doc="Math battery (§2-E casts/modulo; sqrt is IEEE-exact, "
    "transcendentals deliberately excluded — see functions.scalars).",
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.abs(F.col("l_discount") - F.lit(0.05)).alias("disc_dev"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
    )


@register(
    "conditional_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN 'finished'
                WHEN o_orderstatus = 'O' THEN 'open'
                ELSE 'partial' END                    AS status_word,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 50000  THEN 'mid'
                ELSE 'small' END                      AS size_band,
           coalesce(nullif(o_orderpriority, '1-URGENT'), 'URGENT!') AS prio
    FROM orders
    """,
    doc="CASE/COALESCE/NULLIF battery — the `dict.get(k, default)` "
    "semantics of the reference consumer (app/clickhouse_db.py:45-82) "
    "as declarative expressions.",
)
def conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_word"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("size_band"),
        F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("URGENT!")).alias(
            "prio"
        ),
    )


@register(
    "set_ops",
    oracle="""
    SELECT nationkey, 'both' AS src FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey AS nationkey FROM supplier
    )
    UNION ALL
    SELECT nationkey, 'customer_only' AS src FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT s_nationkey AS nationkey FROM supplier
    )
    """,
    doc="INTERSECT / EXCEPT / UNION ALL in one result (§2-C set ops).",
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir).select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, "supplier", sf_dir).select(F.col("s_nationkey").alias("nationkey"))
    both = c.intersect(s).withColumn("src", F.lit("both"))
    only = c.subtract(s).withColumn("src", F.lit("customer_only"))
    return both.unionAll(only)


@register(
    "distinct_projection",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    doc="DISTINCT over a narrow projection — shuffle on the two grouping "
    "cols only; column pruning keeps the 100 TB scan to 2 columns.",
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, "orders", sf_dir).select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="Schema-on-read JSON extraction + aggregate — the consumer's "
    "json.loads + dict.get path (app/Consumer_clickhouse.py:157, "
    "app/clickhouse_db.py:45-82) as from_json over a typed schema.",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    parsed = e.withColumn("k", F.from_json("props", "struct<k:bigint>").getField("k"))
    return parsed.groupBy("event_type").agg(
        F.sum("k").alias("k_sum"), F.count(F.lit(1)).alias("n")
    )


@register(
    "in_subquery",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_d
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderstatus
    """,
    doc="IN-subquery (Catalyst decorrelates to a left-semi join; the "
    "small side broadcasts).",
)
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    building = (
        load(spark, "customer", sf_dir)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    return (
        o.join(F.broadcast(building), o.o_custkey == building.c_custkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_d"),
        )
    )


@register(
    "clickhouse_dialect_battery",
    oracle="""
    SELECT (year(o_orderdate) * 100 + month(o_orderdate)) AS month,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_f,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS dist_cust,
           arg_max(o_custkey, o_orderkey) AS last_cust,
           round(quantile_cont(o_totalprice, 0.5), 6) AS med_price,
           CAST(sum(CASE WHEN o_orderstatus = 'F'
                         THEN CAST(o_totalprice AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             AS f_revenue,
           array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',')
             AS statuses
    FROM orders
    GROUP BY 1
    """,
    doc="The ClickHouse dialect layer exercised end to end "
    "(functions/clickhouse.py): a monthly rollup written ENTIRELY in "
    "the reference stack's vocabulary — toYYYYMM (its partition key, "
    "clickhouse_ddl.sql:31), countIf, uniqExact, argMax, "
    "quantileExact, sumIf, groupUniqArray/arraySort/arrayStringConcat "
    "— proving a query ported verbatim from a ClickHouse user's "
    "playbook plans as ordinary Catalyst expressions (zero UDFs) and "
    "hash-matches ANSI SQL. argMax keys on the unique o_orderkey so "
    "ties cannot occur (the layer's documented determinism caveat); "
    "sumIf accumulates in DECIMAL per the registry conventions.",
)
def clickhouse_dialect_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import clickhouse as ch

    o = load(spark, "orders", sf_dir)
    is_f = F.col("o_orderstatus") == "F"
    return o.groupBy(ch.toYYYYMM("o_orderdate").alias("month")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        ch.countIf(is_f).alias("n_f"),
        ch.uniqExact("o_custkey").alias("dist_cust"),
        ch.argMax("o_custkey", "o_orderkey").alias("last_cust"),
        F.round(ch.quantileExact(0.5, "o_totalprice"), 6).alias("med_price"),
        ch.sumIf(F.col("o_totalprice").cast("decimal(18,2)"), is_f)
        .cast("double")
        .alias("f_revenue"),
        ch.arrayStringConcat(ch.arraySort(ch.groupUniqArray("o_orderstatus")), ",").alias(
            "statuses"
        ),
    )


# Priority -> short code lookup for the dialect battery (ClickHouse
# transform() semantics: unlisted values fall to the default).
PRIO_CODES = {
    "1-URGENT": "P1",
    "2-HIGH": "P2",
    "3-MEDIUM": "P3",
    "4-NOT SPECIFIED": "P4",
    "5-LOW": "P5",
}


def _prio_case_sql() -> str:
    whens = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in PRIO_CODES.items())
    return f"CASE o_orderpriority {whens} ELSE 'PX' END"


@register(
    "clickhouse_dialect_battery2",
    oracle=f"""
    WITH g AS (
      SELECT o_custkey,
             CAST(count(*) AS BIGINT) AS n_orders,
             list_sort(list(date_diff('day', DATE '1970-01-01', o_orderdate)))
               AS days,
             list_sort(list(CAST(o_totalprice AS DECIMAL(18,2)))) AS prices,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
             list(o_orderstatus) AS statuses,
             list(CAST(quarter(o_orderdate) AS VARCHAR)) AS quarters,
             list({_prio_case_sql()}) AS prios
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, n_orders,
           CAST(list_aggregate(
             [days[i + 1] - days[i] FOR i IN range(1, len(days))], 'max')
             AS BIGINT) AS max_gap_days,
           CAST(list_aggregate(prices[1:((n_orders + 1) // 2)], 'sum')
             AS DOUBLE) AS half_spend,
           repeat('█', CAST(greatest(0, least(10,
             floor(spend / 600000.0 * 10))) AS INT)) AS spend_bar,
           array_to_string(list_transform(
             list_sort(list_transform(list_distinct(statuses),
               e -> {{'nc': -len(list_filter(statuses, x -> x = e)), 'v': e}}
             ))[1:2], s -> s.v), ',') AS top2_status,
           array_to_string(list_sort(list_distinct(quarters)), ',') AS quarters,
           array_to_string(list_sort(list_distinct(prios)), ',') AS prio_codes
    FROM g
    """,
    doc="Dialect battery 2: the round-9 vocabulary additions exercised "
    "end to end over a per-customer order-timeline rollup — "
    "arrayDifference/arrayMax (max inter-order gap in days, the "
    "runningDifference port shape), arraySlice/decimal fold (exact "
    "spend of the first half of the sorted timeline), bar() (the "
    "in-query sparkline, character-exact), transform() (the inline "
    "priority lookup table), toQuarter, and an exact array-expressed "
    "topK(2) (per-element counts via filter inside transform, sorted "
    "by (-count, value) — ClickHouse's topK is a sketch; the "
    "determinized exact form is the oracle-checkable twin, same "
    "contract as uniqExact-for-uniq). Everything is one "
    "map-side-combined groupBy producing per-customer arrays that "
    "are ORDER-BOUNDED (a customer's orders), then pure array "
    "expressions — zero UDFs, zero extra shuffles, and the collected "
    "arrays stay dimension-sized at 100 TB because the group key is "
    "the natural entity id.",
)
def clickhouse_dialect_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import clickhouse as ch

    o = load(spark, "orders", sf_dir)
    epoch_day = F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1970-01-01")))
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    g = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        ch.arraySort(ch.groupArray(epoch_day)).alias("days"),
        ch.arraySort(ch.groupArray(price_dec)).alias("prices"),
        F.sum(price_dec).cast("double").alias("spend"),
        ch.groupArray("o_orderstatus").alias("statuses"),
        ch.groupArray(ch.toQuarter("o_orderdate").cast("string")).alias("quarters"),
        ch.groupArray(
            ch.transform_lookup("o_orderpriority", PRIO_CODES, "PX")
        ).alias("prios"),
    )
    half = ch.arraySlice("prices", 1, F.expr("(n_orders + 1) div 2"))
    statuses = F.col("statuses")
    top2 = F.array_join(
        F.transform(
            F.slice(
                F.array_sort(
                    F.transform(
                        F.array_distinct(statuses),
                        lambda e: F.struct(
                            (-F.size(F.filter(statuses, lambda x: x == e))).alias("nc"),
                            e.alias("v"),
                        ),
                    )
                ),
                1,
                2,
            ),
            lambda s: s.getField("v"),
        ),
        ",",
    )
    return g.select(
        "o_custkey",
        "n_orders",
        ch.arrayMax(ch.arrayDifference("days")).cast("bigint").alias("max_gap_days"),
        F.aggregate(
            half,
            F.lit(0).cast("decimal(28,2)"),
            # re-narrow each step: decimal + widens to (29,2) and the
            # fold requires the accumulator type to be stable; (28,2)
            # never saturates on order totals (sum < 1e26)
            lambda acc, x: (acc + x).cast("decimal(28,2)"),
        )
        .cast("double")
        .alias("half_spend"),
        ch.bar("spend", 0.0, 600000.0, 10).alias("spend_bar"),
        top2.alias("top2_status"),
        ch.arrayStringConcat(ch.arraySort(ch.arrayDistinct("quarters")), ",").alias(
            "quarters"
        ),
        ch.arrayStringConcat(ch.arraySort(ch.arrayDistinct("prios")), ",").alias(
            "prio_codes"
        ),
    )


# Dialect battery 3 (round 10): event-type bit registry for the
# bitmask functions — the five known types get stable bits, unknowns
# collapse to the overflow bit (same contract as transform()'s
# default arm).
TYPE_BITS = {"click": 1, "error": 2, "purchase": 4, "signup": 8, "view": 16}
TYPE_OVERFLOW = 32


def _type_bit_case_sql() -> str:
    whens = " ".join(f"WHEN '{t}' THEN {b}" for t, b in TYPE_BITS.items())
    return f"CASE event_type {whens} ELSE {TYPE_OVERFLOW} END"


@register(
    "clickhouse_dialect_battery3",
    oracle=f"""
    WITH g AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(bit_or({_type_bit_case_sql()}) AS BIGINT) AS type_mask,
             CAST(count(DISTINCT (epoch_ms(ts) // 1000
                   - (epoch_ms(ts) // 1000) % 900) // 900) AS BIGINT) AS n_q15,
             list(event_type ORDER BY ts, event_id) AS types_all,
             CAST(sum(strlen(props)) AS BIGINT) AS props_len
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT *,
             list_transform(list_sort(list_distinct(types_all)),
               t -> CAST(len(list_filter(types_all, x -> x = t)) AS BIGINT))
               AS per_type_counts,
             list_sort(list_distinct(types_all)) AS type_names
      FROM g
    )
    SELECT user_id, n_events, type_mask,
           array_to_string([CAST(p AS VARCHAR)
                            for p in [1, 2, 4, 8, 16, 32]
                            if (type_mask & p) != 0], ',') AS types_list,
           n_q15,
           CAST(len(list_filter(types_all,
                (x, i) -> i = 1 OR x != types_all[i - 1])) AS BIGINT)
             AS compact_len,
           array_to_string(list_transform(range(1, len(type_names) + 1),
             i -> type_names[i] || ':' || CAST(per_type_counts[i] AS VARCHAR)),
             ',') AS counts_map,
           array_to_string(list_transform(range(1, len(per_type_counts) + 1),
             i -> CAST(CAST(list_sum(per_type_counts[1:i]) AS BIGINT) AS VARCHAR)),
             ',') AS cum_counts,
           CASE WHEN props_len >= 1073741824
                THEN printf('%.2f', round(CAST(props_len AS DOUBLE) / 1073741824.0, 2)) || ' GiB'
                WHEN props_len >= 1048576
                THEN printf('%.2f', round(CAST(props_len AS DOUBLE) / 1048576.0, 2)) || ' MiB'
                WHEN props_len >= 1024
                THEN printf('%.2f', round(CAST(props_len AS DOUBLE) / 1024.0, 2)) || ' KiB'
                ELSE printf('%.2f', round(CAST(props_len AS DOUBLE), 2)) || ' B'
           END AS props_readable
    FROM c
    """,
    doc="Dialect battery 3: the round-10 vocabulary over a per-user "
    "event rollup — groupBitOr over a transform()-style type-bit "
    "lookup plus bitmaskToList (the ClickHouse bitmask idiom for "
    "compact set-membership), toStartOfFifteenMinutes (exact integer "
    "bucketing, count-distinct sessions-ish), arrayCompact (run-"
    "length path compression over the ordered journey — distinct "
    "from arrayDistinct), an exact sumMap twin (type:count pairs "
    "rendered sorted — ClickHouse's map aggregate, determinized to a "
    "hashable scalar), arrayCumSum over the per-type counts, and "
    "formatReadableSize (unit by exact BIGINT threshold, one rounded "
    "division). One map-side-combined groupBy on the natural entity "
    "key; every array is ORDER-BOUNDED (a user's events); zero UDFs. "
    "The ordered journey array uses the sort_array(struct(ts, id, "
    "type)) idiom because collect_list order is partition-dependent "
    "— the same determinism rule events_markov_entropy's window "
    "relies on.",
)
def clickhouse_dialect_battery3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import clickhouse as ch

    e = load(spark, "events", sf_dir)
    bit = ch.transform_lookup("event_type", TYPE_BITS, TYPE_OVERFLOW)
    g = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        ch.groupBitOr(bit).cast("bigint").alias("type_mask"),
        F.countDistinct(ch.toStartOfFifteenMinutes("ts")).cast("bigint").alias("n_q15"),
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("seq"),
        F.sum(F.length("props")).cast("bigint").alias("props_len"),
    )
    types_all = F.transform(F.col("seq"), lambda s: s.getField("event_type"))
    withc = g.select(
        "user_id",
        "n_events",
        "type_mask",
        "n_q15",
        "props_len",
        types_all.alias("types_all"),
        F.array_sort(F.array_distinct(types_all)).alias("type_names"),
    ).select(
        "*",
        F.transform(
            F.col("type_names"),
            lambda t: F.size(F.filter(F.col("types_all"), lambda x: x == t)).cast(
                "bigint"
            ),
        ).alias("per_type_counts"),
    )
    counts_map = F.array_join(
        F.zip_with(
            F.col("type_names"),
            F.col("per_type_counts"),
            lambda t, n: F.concat(t, F.lit(":"), n.cast("string")),
        ),
        ",",
    )
    cum_counts = F.array_join(
        F.transform(ch.arrayCumSum("per_type_counts"), lambda x: x.cast("string")),
        ",",
    )
    return withc.select(
        "user_id",
        "n_events",
        "type_mask",
        ch.bitmaskToList("type_mask", 6).alias("types_list"),
        "n_q15",
        F.size(ch.arrayCompact("types_all")).cast("bigint").alias("compact_len"),
        counts_map.alias("counts_map"),
        cum_counts.alias("cum_counts"),
        ch.formatReadableSize("props_len").alias("props_readable"),
    )


# --- dialect battery 4 (round 11): behavioral aggregates ---------------

WF_WINDOW_US = 24 * 3600 * 1_000_000  # windowFunnel window, exact µs
WF_STEPS = ("view", "click", "purchase")


@register(
    "clickhouse_dialect_battery4",
    oracle=f"""
    WITH g AS (
      SELECT user_id,
             list(struct_pack(tsu := epoch_us(ts), event_id := event_id,
                              event_type := event_type,
                              cents := CAST(round(value * 100) AS BIGINT))
                  ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    ),
    arrs AS (
      SELECT user_id, seq,
             [s.tsu for s in seq if s.event_type = 'view']     AS vts,
             [s.tsu for s in seq if s.event_type = 'click']    AS cts,
             [s.tsu for s in seq if s.event_type = 'purchase'] AS pts,
             [s.cents for s in seq]                            AS cents
      FROM g
    ),
    lvl AS (
      SELECT *,
             len(vts) > 0 AS has_v,
             len(list_filter(vts, v ->
                 len(list_filter(cts, c -> c > v AND c <= v + {WF_WINDOW_US}))
                 > 0)) > 0 AS l2,
             len(list_filter(vts, v ->
                 len(list_filter(cts, c -> c > v AND c <= v + {WF_WINDOW_US}
                     AND len(list_filter(pts, p -> p > c
                             AND p <= v + {WF_WINDOW_US})) > 0)) > 0)) > 0
               AS l3
      FROM arrs
    )
    SELECT user_id,
           CAST(CAST(len(vts) > 0 AS INT) AS VARCHAR) || ','
             || CAST(CAST(len(vts) > 0 AND len(cts) > 0 AS INT) AS VARCHAR) || ','
             || CAST(CAST(len(vts) > 0 AND len(pts) > 0 AS INT) AS VARCHAR)
             AS ret_flags,
           CAST(CASE WHEN l3 THEN 3 WHEN l2 THEN 2
                     WHEN has_v THEN 1 ELSE 0 END AS BIGINT) AS funnel_24h,
           CAST(least(len(list_distinct([s.event_type for s in seq])), 3)
                AS BIGINT) AS uniq_types_upto2,
           array_to_string([CAST(list_sum(
                 cents[greatest(1, i - 2):i]) AS VARCHAR)
               for i in range(1, len(cents) + 1)], ',') AS msum3,
           seq[len(seq)].event_type AS last_type
    FROM lvl
    """,
    doc="Dialect battery 4 — ClickHouse's behavioral-aggregate "
    "vocabulary per user: retention(view, click, purchase) (flag "
    "array: first condition, then first AND each later condition), "
    "windowFunnel(24h)(ts, view, click, purchase) (deepest strictly "
    "ts-ordered chain whose every step falls within 24h of the "
    "anchoring view — nested exists over the per-user step arrays, "
    "exact integer microseconds), uniqUpTo(2) (exact distinct "
    "clamped at N+1), groupArrayMovingSum(3) over exact value cents "
    "(CSV render — sums of bounded integer slices, order fixed by "
    "(ts, event_id)), and anyLast determinized as the last element "
    "of the ordered journey. All arrays are ORDER-BOUNDED per user "
    "(battery3's rule), everything is one map-side-combined groupBy "
    "plus codegen higher-order functions — zero UDFs, zero extra "
    "shuffles; the funnel's nested exists is per-row array algebra, "
    "never a join.",
)
def clickhouse_dialect_battery4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import clickhouse as ch

    e = load(spark, "events", sf_dir)
    g = e.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.unix_micros("ts").alias("tsu"),
                    F.col("event_id"),
                    F.col("event_type"),
                    F.round(F.col("value") * 100).cast("bigint").alias("cents"),
                )
            )
        ).alias("seq"),
        ch.uniqUpTo(2, "event_type").alias("uniq_types_upto2"),
    )
    step_ts = {
        s: F.transform(
            F.filter(F.col("seq"), lambda x: x.getField("event_type") == s),
            lambda x: x.getField("tsu"),
        )
        for s in WF_STEPS
    }
    w = F.lit(WF_WINDOW_US)
    arrs = g.select(
        "user_id",
        "seq",
        "uniq_types_upto2",
        step_ts["view"].alias("vts"),
        step_ts["click"].alias("cts"),
        step_ts["purchase"].alias("pts"),
        F.transform(F.col("seq"), lambda x: x.getField("cents")).alias("cents"),
    )
    in_win = lambda anchor, t: (t > anchor) & (t <= anchor + w)  # noqa: E731
    l2 = F.exists(
        F.col("vts"),
        lambda v: F.exists(F.col("cts"), lambda c: in_win(v, c)),
    )
    l3 = F.exists(
        F.col("vts"),
        lambda v: F.exists(
            F.col("cts"),
            lambda c: in_win(v, c)
            & F.exists(
                F.col("pts"), lambda p: (p > c) & (p <= v + w)
            ),
        ),
    )
    has = lambda a: F.size(F.col(a)) > 0  # noqa: E731
    flag = lambda c: c.cast("int").cast("string")  # noqa: E731
    msum3 = F.array_join(
        F.transform(
            F.col("cents"),
            lambda x, i: F.aggregate(
                F.slice(
                    F.col("cents"),
                    F.greatest(F.lit(1), i - 1),
                    F.least(F.lit(3), i + 1),
                ),
                F.lit(0).cast("bigint"),
                lambda acc, y: acc + y,
            ).cast("string"),
        ),
        ",",
    )
    return arrs.select(
        "user_id",
        F.concat_ws(
            ",", flag(has("vts")), flag(has("vts") & has("cts")),
            flag(has("vts") & has("pts")),
        ).alias("ret_flags"),
        F.when(l3, 3).when(l2, 2).when(has("vts"), 1).otherwise(0)
        .cast("bigint")
        .alias("funnel_24h"),
        "uniq_types_upto2",
        msum3.alias("msum3"),
        F.element_at(F.col("seq"), -1).getField("event_type").alias("last_type"),
    )


# --- dialect battery 5 (round 11 continuation): array/sequence extras ---

FUNNEL_TYPES = ("view", "click", "purchase")
CORE_TYPES = ("view", "click")
RARE_TYPES = ("error", "purchase")
ENUM_UNIQ_CAP = 8  # arrayEnumerateUniq rendered for the first N steps


@register(
    "clickhouse_dialect_battery5",
    oracle=f"""
    WITH g AS (
      SELECT user_id,
             list(CAST(round(value * 100) AS BIGINT)
                  ORDER BY ts, event_id) AS cents,
             list(event_type ORDER BY ts, event_id) AS types
      FROM events GROUP BY user_id
    ),
    spend AS (
      SELECT user_id, event_type,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sp,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY sum(CAST(round(value * 100) AS BIGINT)) DESC,
                        event_type) AS rn
      FROM events GROUP BY user_id, event_type
    ),
    x AS (
      SELECT user_id, cents, types,
             list_sort(list_distinct(types)) AS dtypes
      FROM g
    )
    SELECT x.user_id,
           CAST(coalesce(list_sum([CASE WHEN cents[i + 1] > cents[i]
                          THEN cents[i + 1] - cents[i] ELSE 0 END
                 for i in range(1, len(cents))]), 0) AS BIGINT) AS delta_sum_c,
           array_to_string([CAST(len([y for y in types[1:i]
                                      if y = types[i]]) AS VARCHAR)
                            for i in range(1, least(len(types),
                                                    {ENUM_UNIQ_CAP}) + 1)],
                           ',') AS enum_uniq,
           array_to_string(list_filter(dtypes,
               t -> t IN {FUNNEL_TYPES!r}), ',') AS funnel_overlap,
           (len(list_filter({list(CORE_TYPES)!r}::VARCHAR[],
                t -> list_contains(dtypes, t))) = {len(CORE_TYPES)})
             AS has_all_core,
           (len(list_filter({list(RARE_TYPES)!r}::VARCHAR[],
                t -> list_contains(dtypes, t))) > 0) AS has_any_rare,
           s.event_type AS top_spend_type,
           s.sp AS top_spend_c
    FROM x JOIN spend s ON s.user_id = x.user_id AND s.rn = 1
    """,
    doc="Dialect battery 5 — the array/sequence vocabulary the first "
    "four batteries left uncovered: deltaSum (sum of POSITIVE "
    "adjacent deltas over the (ts, event_id)-ordered per-user cents "
    "— ClickHouse's monotonic-counter increase aggregate; exact "
    "BIGINT), arrayEnumerateUniq (1-based occurrence number of each "
    "step among its duplicates, rendered for the first "
    f"{ENUM_UNIQ_CAP} steps — bounded quadratic in the CAP, never in "
    "journey length), arrayIntersect against the funnel-step "
    "constant (sorted CSV), hasAll/hasAny membership probes, and "
    "topKWeighted(1) determinized as the (spend DESC, type ASC) "
    "argmax — ClickHouse's sketch made exact, the battery-3 topK "
    "rule. One order-bounded groupBy for the journey arrays plus "
    "one (user, type)-grained aggregate for the weighted top-1 "
    "(both shuffle on user_id — AQE coalesces the co-partitioned "
    "join); all array algebra is codegen higher-order functions, "
    "zero UDFs.",
)
def clickhouse_dialect_battery5(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100).cast("bigint")
    g = e.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.unix_micros("ts").alias("tsu"),
                    F.col("event_id").alias("eid"),
                    F.col("event_type").alias("et"),
                    cents.alias("c"),
                )
            )
        ).alias("seq")
    )
    x = g.select(
        "user_id",
        F.transform(F.col("seq"), lambda s: s.getField("c")).alias("cents"),
        F.transform(F.col("seq"), lambda s: s.getField("et")).alias("types"),
    ).select(
        "user_id",
        "cents",
        "types",
        F.array_sort(F.array_distinct("types")).alias("dtypes"),
    )
    diffs = F.transform(
        F.slice(F.col("cents"), 2, F.size("cents") - 1),
        lambda v, i: v - F.element_at(F.col("cents"), i + 1),
    )
    delta_sum = F.coalesce(
        F.aggregate(
            F.filter(diffs, lambda d: d > 0),
            F.lit(0).cast("bigint"),
            lambda acc, d: acc + d,
        ),
        F.lit(0).cast("bigint"),
    )
    head = F.slice(F.col("types"), 1, ENUM_UNIQ_CAP)
    enum_uniq = F.array_join(
        F.transform(
            head,
            lambda t, i: F.size(
                F.filter(
                    F.slice(F.col("types"), 1, i + 1), lambda y: y == t
                )
            ).cast("string"),
        ),
        ",",
    )
    funnel = F.array(*[F.lit(t) for t in FUNNEL_TYPES])
    overlap = F.array_join(
        F.filter(F.col("dtypes"), lambda t: F.array_contains(funnel, t)), ","
    )
    has_all_core = F.forall(
        F.array(*[F.lit(t) for t in CORE_TYPES]),
        lambda t: F.array_contains(F.col("dtypes"), t),
    )
    has_any_rare = F.arrays_overlap(
        F.col("dtypes"), F.array(*[F.lit(t) for t in RARE_TYPES])
    )
    spend = e.groupBy("user_id", "event_type").agg(
        F.sum(cents).cast("bigint").alias("sp")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("sp").desc(), F.col("event_type")
    )
    top = (
        spend.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("top_spend_type"),
            F.col("sp").alias("top_spend_c"),
        )
    )
    return (
        x.join(top, "user_id")
        .select(
            "user_id",
            delta_sum.alias("delta_sum_c"),
            enum_uniq.alias("enum_uniq"),
            overlap.alias("funnel_overlap"),
            has_all_core.alias("has_all_core"),
            has_any_rare.alias("has_any_rare"),
            "top_spend_type",
            "top_spend_c",
        )
    )


# --- dialect battery 6: interval analytics (round 13) --------------------


@register(
    "clickhouse_dialect_battery6",
    oracle="""
    WITH iv AS (
      -- the synthetic fixture does not enforce TPC-H's
      -- orderdate <= shipdate; an inverted span is not an interval
      SELECT l.l_suppkey AS sk, CAST(o.o_orderdate AS DATE) AS s,
             CAST(l.l_shipdate AS DATE) AS e
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE CAST(o.o_orderdate AS DATE) <= CAST(l.l_shipdate AS DATE)
    ),
    ev AS (
      SELECT sk, day, CAST(sum(d) AS BIGINT) AS net FROM (
        SELECT sk, s AS day, 1 AS d FROM iv
        UNION ALL
        SELECT sk, CAST(e + INTERVAL 1 DAY AS DATE) AS day, -1 FROM iv
      ) GROUP BY 1, 2
    ),
    run AS (
      SELECT sk, day,
             CAST(sum(net) OVER (PARTITION BY sk ORDER BY day)
                  AS BIGINT) AS cum,
             lead(day) OVER (PARTITION BY sk ORDER BY day) AS nxt
      FROM ev
    ),
    sweep AS (
      SELECT sk,
             CAST(max(cum) AS BIGINT) AS max_concurrent,
             CAST((min(struct_pack(a := -cum, b := day))).b AS DATE)
               AS peak_day,
             CAST(coalesce(sum(CASE WHEN cum > 0
                  THEN datediff('day', day, nxt) END), 0) AS BIGINT)
               AS covered_days
      FROM run GROUP BY sk
    ),
    base AS (
      SELECT sk, CAST(count(*) AS BIGINT) AS n_intervals,
             min(s) AS first_ship, max(e) AS last_receipt
      FROM iv GROUP BY sk
    )
    SELECT b.sk AS l_suppkey, b.n_intervals,
           w.max_concurrent, w.peak_day, w.covered_days,
           CAST(datediff('day', b.first_ship, b.last_receipt) + 1
                AS BIGINT) AS span_days,
           round(CAST(w.covered_days AS DOUBLE)
                 / (datediff('day', b.first_ship, b.last_receipt) + 1), 6)
             AS utilization
    FROM base b JOIN sweep w ON w.sk = b.sk
    """,
    doc="Dialect battery 6 — ClickHouse's INTERVAL-analytics "
    "vocabulary over each supplier's [orderdate, shipdate] "
    "order-fulfillment intervals (supplier_leadtime_profile's real "
    "interval, here as a SET of concurrent spans): maxIntersections "
    "(peak concurrent open orders in flight), "
    "maxIntersectionsPosition (the FIRST day "
    "that peak holds), and intervalLengthSum (union of covered "
    "days, overlaps counted once) — the warehouse-capacity / "
    "staffing question every logistics deployment asks. One "
    "EXCLUSIVE-END sweep line carries all three exactly: start "
    "events at s, end events at e+1day, so per-day net aggregation "
    "removes every intra-day ordering ambiguity (active-on-day-d = "
    "cumulative net through d), peak day is the struct-min with the "
    "day tiebreak, and coverage is the sum of event-gap lengths "
    "while the cumulative count is positive (the last event day is "
    "always net 0, so the NULL lead contributes nothing). "
    "Utilization (covered/span) is a presentation-only division of "
    "two exact BIGINTs, round(.,6). Shape: one orderkey-keyed "
    "fact-fact join (the q3 shuffle; bucketed twins kill it), then "
    "2 events per interval (16 bytes each), ONE supplier-keyed "
    "exchange, two calendar-bounded windows and two rollups — "
    "supplier-dimension output, scan-bound at 100 TB; the sweep is "
    "the textbook alternative to the quadratic interval self-join.",
)
def clickhouse_dialect_battery6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    o = load(spark, "orders", sf_dir)
    # inverted spans dropped: the synthetic fixture does not enforce
    # TPC-H's orderdate <= shipdate, and an inverted span would push
    # its -1 sweep event BEFORE its +1 (cum dips below true concurrency)
    iv = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_suppkey").alias("sk"),
        F.col("o_orderdate").cast("date").alias("s"),
        F.col("l_shipdate").cast("date").alias("e"),
    ).filter(F.col("s") <= F.col("e"))
    ev = (
        iv.select("sk", F.col("s").alias("day"), F.lit(1).alias("d"))
        .unionByName(
            iv.select("sk", F.date_add("e", 1).alias("day"), F.lit(-1).alias("d"))
        )
        .groupBy("sk", "day")
        .agg(F.sum("d").cast("bigint").alias("net"))
    )
    w_day = Window.partitionBy("sk").orderBy("day")
    run = ev.select(
        "sk",
        "day",
        F.sum("net")
        .over(w_day.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum"),
        F.lead("day").over(w_day).alias("nxt"),
    )
    sweep = run.groupBy("sk").agg(
        F.max("cum").cast("bigint").alias("max_concurrent"),
        F.min(F.struct((-F.col("cum")).alias("a"), F.col("day").alias("b")))
        .getField("b")
        .cast("date")
        .alias("peak_day"),
        F.coalesce(
            F.sum(F.when(F.col("cum") > 0, F.datediff("nxt", "day"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("covered_days"),
    )
    base = iv.groupBy("sk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.min("s").alias("first_ship"),
        F.max("e").alias("last_receipt"),
    )
    span = F.datediff("last_receipt", "first_ship") + 1
    return base.join(sweep, "sk").select(
        F.col("sk").alias("l_suppkey"),
        "n_intervals",
        "max_concurrent",
        "peak_day",
        "covered_days",
        span.cast("bigint").alias("span_days"),
        F.round(
            F.col("covered_days").cast("double") / span.cast("double"), 6
        ).alias("utilization"),
    )
