"""Classic TPC-H-shaped analytical queries over the testdata star
schema — the depth of the §2-C query layer. All follow the decimal
determinism conventions (functions/scalars.py).

Scale notes are per query; common theme: dims broadcast, facts join
on their natural keys (bucket both sides on orderkey at 100 TB to
remove the shuffle), aggregates keep map-side partials exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load

_REV = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


def _rev_col() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        1 - F.col("l_discount").cast("decimal(4,2)")
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(sum({_REV}) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: segment filter pushed to the customer scan, "
    "date filters pushed to orders/lineitem scans, top-10 via ordered "
    "limit (heap, no global sort).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1997-03-15").cast("timestamp")
    c = load(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, "orders", sf_dir).filter(F.col("o_orderdate") < cutoff)
    li = load(spark, "lineitem", sf_dir).filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev_col()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           CAST(sum({_REV}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey  = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: six-way join with a same-nation equi-"
    "constraint; region/nation/supplier broadcast, facts shuffle once "
    "on orderkey.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir)
    s = load(spark, "supplier", sf_dir)
    n = load(spark, "nation", sf_dir)
    r = load(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s.select("s_suppkey", "s_nationkey")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.select("r_regionkey")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(_rev_col()).cast("double").alias("revenue"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan-filter-aggregate; every predicate "
    "reaches the parquet reader (PushedFilters), no shuffle at all "
    "beyond the final 1-row combine.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum({_REV}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer, top-20.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    n = load(spark, "nation", sf_dir)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev_col()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
    doc="TPC-H Q12 shape: conditional counts by priority class.",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir)
    li = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pq AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               / count(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem l
    JOIN pq ON l.l_partkey = pq.l_partkey
    WHERE l.l_quantity < 0.5 * pq.avg_qty
    """,
    doc="TPC-H Q17 shape (correlated aggregate, decorrelated): "
    "lineitems below half their part's average quantity. The per-part "
    "average uses exact decimal sums so the comparison is "
    "engine-deterministic.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    pq = li.groupBy("l_partkey").agg(
        (F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    return (
        li.join(pq, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_d
    FROM orders o
    JOIN big      ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    doc="TPC-H Q18 shape: orders whose total quantity exceeds a "
    "threshold (aggregate-then-semi-join on the fact key).",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    o = load(spark, "orders", sf_dir)
    c = load(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("_q"))
        .filter(F.col("_q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c.select("c_custkey", "c_name")), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price_d"),
        )
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS -> left-semi join, counts "
    "by priority.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%' THEN {_REV}
                         ELSE CAST(0.0 AS DECIMAL(16,4)) END) AS DOUBLE) AS promo_revenue,
           CAST(sum({_REV}) AS DOUBLE) AS total_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: conditional revenue share over a broadcast "
    "part join (the percentage is derivable from the two exact sums).",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = load(spark, "part", sf_dir).select("p_partkey", "p_type")
    zero = F.lit(0.0).cast("decimal(16,4)")
    rev = _rev_col()
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(zero))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, CAST(sum({_REV}) AS DECIMAL(38,4)) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
    FROM rev r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
    doc="TPC-H Q15 shape: per-supplier revenue, scalar-subquery max "
    "filter (ties all surface — deterministic without a tiebreak).",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_rev_col()).cast("decimal(38,4)").alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("m"))
    s = load(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_rev == mx.m)
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev"))
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_size BETWEEN 16 AND 30 AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_size BETWEEN 31 AND 50 AND l.l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19 shape: disjunctive multi-range predicates across "
    "both join sides (Catalyst keeps the equi-key join and applies "
    "the OR-filter post-join).",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    p = load(spark, "part", sf_dir).select("p_partkey", "p_size")
    q, sz = F.col("l_quantity"), F.col("p_size")
    cond = (
        (sz.between(1, 15) & q.between(1, 20))
        | (sz.between(16, 30) & q.between(10, 30))
        | (sz.between(31, 50) & q.between(20, 40))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_rev_col()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / count(*) AS a
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey AS nationkey, count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
    doc="TPC-H Q22 shape: above-average balance (exact-sum scalar "
    "subquery) + anti-join on orders, grouped by nation.",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir).select("o_custkey")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias(
            "a"
        )
    )
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("a"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           year(l.l_shipdate) AS yr,
           CAST(sum({_REV}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
    doc="TPC-H Q7 shape: cross-nation trade volume — two aliases of "
    "the same broadcast dimension with an inequality between them.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    o = load(spark, "orders", sf_dir)
    c = load(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    s = load(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n = load(spark, "nation", sf_dir)
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("nk2"))
        .filter(F.col("nk1") != F.col("nk2"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").cast("bigint").alias("yr"))
        .agg(F.sum(_rev_col()).cast("double").alias("revenue"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,4)) AS value_
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(value_ AS DOUBLE) AS value_
    FROM pv
    WHERE value_ > (SELECT CAST(sum(value_) * 0.001 AS DECIMAL(38,4)) FROM pv)
    """,
    doc="TPC-H Q11 shape: per-part value filtered by a scalar-"
    "subquery fraction of the global total (two passes over one "
    "aggregate; exact decimals keep the threshold comparison "
    "engine-deterministic).",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    pv = li.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * F.col("l_quantity").cast("decimal(12,2)")
        )
        .cast("decimal(38,4)")
        .alias("value_")
    )
    # the fraction multiplies in DECIMAL on both engines: a double
    # 0.001 literal would promote the product to double and a ~1-ulp
    # error at a .00005 rounding boundary could flip the (38,4)
    # threshold vs the oracle's exact decimal arithmetic
    frac = F.expr("CAST(0.001 AS DECIMAL(4,3))")
    thr = pv.agg((F.sum("value_") * frac).cast("decimal(38,4)").alias("thr"))
    return (
        pv.join(F.broadcast(thr), pv.value_ > thr.thr)
        .select("l_partkey", F.col("value_").cast("double").alias("value_"))
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH allnations AS (
      SELECT year(o.o_orderdate) AS yr,
             CAST(sum(CASE WHEN n2.n_name = 'GERMANY' THEN {_REV}
                           ELSE CAST(0.0 AS DECIMAL(16,4)) END) AS DECIMAL(38,4)) AS nation_rev,
             CAST(sum({_REV}) AS DECIMAL(38,4)) AS total_rev
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'EUROPE'
      GROUP BY year(o.o_orderdate)
    )
    SELECT yr,
           CAST(nation_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) AS mkt_share,
           CAST(total_rev AS DOUBLE) AS total_rev
    FROM allnations
    """,
    doc="TPC-H Q8 shape: one nation's revenue share of a region's "
    "yearly volume — conditional sum over a 7-table join, share "
    "derived from two exact decimal sums by one double division.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    o = load(spark, "orders", sf_dir)
    c = load(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    s = load(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n = load(spark, "nation", sf_dir)
    r = load(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), "n_regionkey")
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation"))
    rev = _rev_col()
    zero = F.lit(0.0).cast("decimal(16,4)")
    shares = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("nk1"))
        .join(F.broadcast(r.select("r_regionkey")), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("nk2"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("yr"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "GERMANY", rev).otherwise(zero))
            .cast("decimal(38,4)")
            .alias("nation_rev"),
            F.sum(rev).cast("decimal(38,4)").alias("total_rev"),
        )
    )
    return shares.select(
        "yr",
        (F.col("nation_rev").cast("double") / F.col("total_rev").cast("double")).alias(
            "mkt_share"
        ),
        F.col("total_rev").cast("double").alias("total_rev"),
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS yr,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                    - CAST(l.l_quantity AS DECIMAL(12,2))
                      * CAST(l.l_tax AS DECIMAL(4,2)) * 100) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE '%a%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
    doc="TPC-H Q9 shape (profit by supplier nation x year): the "
    "testdata has no partsupp, so supplycost is proxied by "
    "quantity*tax*100 — the decimal expression structure (revenue "
    "minus a per-line cost term, name-filtered parts, nation/year "
    "grouping) is the Q9 plan shape.",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    s = load(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n = load(spark, "nation", sf_dir)
    o = load(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    p = load(spark, "part", sf_dir).filter(F.col("p_name").like("%a%")).select("p_partkey")
    profit = _rev_col() - F.col("l_quantity").cast("decimal(12,2)") * F.col("l_tax").cast(
        "decimal(4,2)"
    ) * 100
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("bigint").alias("yr"))
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority NOT LIKE '%URGENT%'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: order-count histogram over a filtered left "
    "join (customers with zero orders kept) — two cascaded "
    "aggregations, the second over the tiny count domain. The "
    "reference filter is on o_comment, absent from the testdata; "
    "o_orderpriority keeps the ON-clause-filter shape.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir).select("c_custkey")
    o = load(spark, "orders", sf_dir).filter(
        ~F.col("o_orderpriority").like("%URGENT%")
    ).select("o_custkey", "o_orderkey")
    counts = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counts.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(l_extendedprice AS DECIMAL(12,2))) AS supp_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT l_partkey, min(supp_cost) AS min_cost FROM cost GROUP BY l_partkey
    )
    SELECT c.l_partkey AS partkey, s.s_suppkey, s.s_name, n.n_name,
           CAST(c.supp_cost AS DOUBLE) AS supp_cost
    FROM cost c
    JOIN best b     ON c.l_partkey = b.l_partkey AND c.supp_cost = b.min_cost
    JOIN supplier s ON c.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE' AND c.l_partkey % 100 = 0
    """,
    doc="TPC-H Q2 shape (min-cost supplier per part, region-filtered): "
    "the correlated MIN subquery decorelates to an aggregate self-join "
    "on (part, min-cost); supplycost is proxied by the supplier's "
    "minimum sale price (no partsupp in the testdata). Ties surface "
    "every min-cost supplier, as in Q2.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    s = load(spark, "supplier", sf_dir).select("s_suppkey", "s_name", "s_nationkey")
    n = load(spark, "nation", sf_dir)
    r = load(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast("decimal(12,2)")).alias("supp_cost")
    )
    best = cost.groupBy("l_partkey").agg(F.min("supp_cost").alias("min_cost"))
    return (
        cost.join(
            best,
            (cost.l_partkey == best.l_partkey) & (cost.supp_cost == best.min_cost),
        )
        .drop(best.l_partkey)
        .filter(F.col("l_partkey") % 100 == 0)
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.select("r_regionkey")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("l_partkey").alias("partkey"),
            "s_suppkey",
            "s_name",
            "n_name",
            F.col("supp_cost").cast("double").alias("supp_cost"),
        )
    )


@register(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape: distinct supplier counts by part attributes "
    "with a NOT-IN anti-join exclusion (lineitem stands in for "
    "partsupp as the part-supplier link; negative-balance suppliers "
    "stand in for the comment-flagged exclusion list).",
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    p = (
        load(spark, "part", sf_dir)
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = load(spark, "supplier", sf_dir).filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_stock_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'GERMANY'
      AND EXISTS (
        SELECT 1 FROM shipped sh
        JOIN part p ON p.p_partkey = sh.l_partkey
        WHERE sh.l_suppkey = s.s_suppkey
          AND p.p_name LIKE 'a%'
          AND sh.qty > 50
      )
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q20 shape: suppliers of a nation holding excess stock "
    "of name-filtered parts — aggregate-then-EXISTS chain decorrelated "
    "to a semi-join on suppkey (lineitem shipments stand in for "
    "partsupp availability).",
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = load(spark, "part", sf_dir).filter(F.col("p_name").like("a%")).select("p_partkey")
    shipped = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty"))
        .filter(F.col("qty") > 50)
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_suppkey")
    )
    s = load(spark, "supplier", sf_dir).select("s_suppkey", "s_name", "s_nationkey")
    n = load(spark, "nation", sf_dir).filter(F.col("n_name") == "GERMANY")
    return (
        s.join(F.broadcast(n.select("n_nationkey")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(shipped, F.col("s_suppkey") == shipped.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_suppliers_kept_waiting",
    oracle="""
    SELECT s.s_suppkey, s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_suppkey, s.s_name
    """,
    doc="TPC-H Q21 shape: the hardest subquery pattern — EXISTS and "
    "NOT EXISTS self-joins on the fact with a per-row inequality. "
    "Both decorrelate to semi/anti joins on orderkey with the "
    "inequality as a post-join residual.",
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, "lineitem", sf_dir)
    o = load(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    s = load(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .drop("o_orderkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    kept = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("l2_orderkey"))
        & (F.col("l_suppkey") != F.col("l2_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("l3_orderkey"))
        & (F.col("l_suppkey") != F.col("l3_suppkey")),
        "left_anti",
    )
    return (
        kept.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
