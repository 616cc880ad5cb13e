"""Semantic tests for the ClickHouse function-name compatibility
layer (functions/clickhouse.py): each alias must reproduce the
ClickHouse semantics it names — week starts Monday, dayOfWeek is ISO,
multiIf evaluates in order, extract picks group 1, arrayEnumerate is
1-based — and the whole layer must stay UDF-free (pure Catalyst)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from api_weather_kafka_clickhouse_spark import registry
from api_weather_kafka_clickhouse_spark.functions import clickhouse as ch


def test_date_functions(spark):
    df = spark.createDataFrame(
        [Row(ts=datetime.datetime(2024, 3, 7, 15, 42, 11))]  # a Thursday
    )
    r = df.select(
        ch.toYYYYMM("ts").alias("ym"),
        ch.toYYYYMMDD("ts").alias("ymd"),
        ch.toStartOfHour("ts").alias("hour"),
        ch.toStartOfDay("ts").alias("day"),
        ch.toStartOfMonth("ts").alias("month"),
        ch.toStartOfWeek("ts").alias("week"),
        ch.toDayOfWeek("ts").alias("dow"),
        ch.toHour("ts").alias("h"),
    ).collect()[0]
    assert r.ym == 202403 and r.ymd == 20240307
    assert r.hour == datetime.datetime(2024, 3, 7, 15, 0)
    assert r.month == datetime.date(2024, 3, 1)
    assert r.week == datetime.date(2024, 3, 4)  # the Monday before
    assert r.dow == 4  # ISO: Thursday = 4
    assert r.h == 15
    # Monday maps to itself / dow 1; Sunday to dow 7
    df2 = spark.createDataFrame(
        [Row(d=datetime.date(2024, 3, 4)), Row(d=datetime.date(2024, 3, 10))]
    )
    got = {r.d: (r.w, r.dw) for r in df2.select(
        "d", ch.toStartOfWeek("d").alias("w"), ch.toDayOfWeek("d").alias("dw")
    ).collect()}
    assert got[datetime.date(2024, 3, 4)] == (datetime.date(2024, 3, 4), 1)
    assert got[datetime.date(2024, 3, 10)] == (datetime.date(2024, 3, 4), 7)


def test_date_diff_units(spark):
    df = spark.createDataFrame(
        [Row(a=datetime.date(2023, 11, 30), b=datetime.date(2024, 2, 1))]
    )
    r = df.select(
        ch.dateDiff("day", "a", "b").alias("d"),
        ch.dateDiff("month", "a", "b").alias("m"),
        ch.dateDiff("year", "a", "b").alias("y"),
    ).collect()[0]
    assert (r.d, r.m, r.y) == (63, 3, 1)
    with pytest.raises(ValueError):
        ch.dateDiff("fortnight", "a", "b")


def test_string_functions(spark):
    df = spark.createDataFrame([Row(s="a.b.c", t="  pad  ", u="price=42 eur")])
    r = df.select(
        ch.splitByChar(".", "s").alias("parts"),
        ch.trimBoth("t").alias("trimmed"),
        ch.extract("u", r"price=(\d+)").alias("grp"),
        ch.extract("u", r"\d+").alias("whole"),
        ch.startsWith("s", "a.").alias("sw"),
        ch.endsWith("s", ".c").alias("ew"),
        ch.empty("s").alias("e"),
        ch.notEmpty("s").alias("ne"),
        ch.replaceRegexpAll("s", r"\.", "/").alias("slashes"),
    ).collect()[0]
    assert r.parts == ["a", "b", "c"]
    assert r.trimmed == "pad"
    assert r.grp == "42" and r.whole == "42"
    assert r.sw and r.ew and not r.e and r.ne
    assert r.slashes == "a/b/c"


def test_array_functions(spark):
    df = spark.createDataFrame([Row(a=[3, 1, 2, 1])])
    r = df.select(
        ch.arrayMap(lambda x: x * 10, "a").alias("mapped"),
        ch.arrayFilter(lambda x: x > 1, "a").alias("filtered"),
        ch.arrayExists(lambda x: x == 3, "a").alias("has3"),
        ch.arraySum("a").alias("s"),
        ch.has("a", 2).alias("h"),
        ch.arraySort("a").alias("sorted"),
        ch.arrayDistinct("a").alias("dedup"),
        ch.arrayStringConcat(ch.arrayMap(lambda x: x.cast("string"), "a"), "-").alias("joined"),
        ch.arrayEnumerate("a").alias("idx"),
    ).collect()[0]
    assert r.mapped == [30, 10, 20, 10]
    assert r.filtered == [3, 2]
    assert r.has3 and r.h
    assert r.s == 7
    assert r.sorted == [1, 1, 2, 3]
    assert sorted(r.dedup) == [1, 2, 3]
    assert r.joined == "3-1-2-1"
    assert r.idx == [1, 2, 3, 4]  # ClickHouse is 1-based
    exploded = df.select(ch.arrayJoin_explode("a").alias("x")).collect()
    assert sorted(x.x for x in exploded) == [1, 1, 2, 3]


def test_conditionals(spark):
    df = spark.createDataFrame([Row(x=5), Row(x=15), Row(x=25)])
    r = {
        row.x: row.band
        for row in df.select(
            "x",
            ch.multiIf(
                F.col("x") < 10, "low", F.col("x") < 20, "mid", "high"
            ).alias("band"),
        ).collect()
    }
    assert r == {5: "low", 15: "mid", 25: "high"}
    with pytest.raises(ValueError):
        ch.multiIf(F.lit(True), 1)  # missing else
    df2 = spark.createDataFrame([Row(v=None), Row(v="x")], "v string")
    got = df2.select(
        ch.ifNull("v", "fallback").alias("f"), ch.nullIf("v", "x").alias("n")
    ).collect()
    assert {(g.f, g.n) for g in got} == {("fallback", None), ("x", None)}


def test_aggregates(spark):
    df = spark.createDataFrame(
        [Row(k=1, v=10, who="a"), Row(k=1, v=30, who="b"), Row(k=1, v=20, who="c")]
    )
    r = df.groupBy("k").agg(
        ch.countIf(F.col("v") > 15).alias("n_big"),
        ch.sumIf("v", F.col("v") > 15).alias("s_big"),
        ch.avgIf("v", F.col("v") > 15).alias("a_big"),
        ch.uniqExact("who").alias("u"),
        ch.argMax("who", "v").alias("am"),
        ch.argMin("who", "v").alias("an"),
        ch.quantileExact(0.5, "v").alias("med"),
        ch.arrayStringConcat(ch.arraySort(ch.groupUniqArray("who")), ",").alias("whos"),
        ch.any_("k").alias("any_k"),
    ).collect()[0]
    assert r.n_big == 2 and r.s_big == 50 and r.a_big == 25.0
    assert r.u == 3 and r.am == "b" and r.an == "a"
    assert r.med == 20.0
    assert r.whos == "a,b,c" and r.any_k == 1


def test_math_and_types(spark):
    df = spark.createDataFrame([Row(x=7, y=2.5)])
    r = df.select(
        ch.intDiv("x", 2).alias("idiv"),
        ch.modulo("x", 3).alias("mod"),
        ch.roundBankers(F.lit(2.5)).alias("rb1"),
        ch.roundBankers(F.lit(3.5)).alias("rb2"),
        ch.toInt64("y").alias("i"),
        ch.toFloat64("x").alias("f"),
        ch.toString("x").alias("s"),
        ch.JSONExtractString(F.lit('{"k": "v"}'), "k").alias("j"),
    ).collect()[0]
    assert r.idiv == 3 and r.mod == 1
    assert r.rb1 == 2.0 and r.rb2 == 4.0  # bankers: ties to even
    assert r.i == 2 and r.f == 7.0 and r.s == "7" and r.j == "v"


def test_layer_is_udf_free(spark, sf_dir):
    """The battery query built from the layer must plan as pure
    Catalyst — no Python eval nodes of any kind."""
    df = registry.all_specs()["clickhouse_dialect_battery"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "PythonUDF" not in plan


def test_avg_weighted(spark):
    df = spark.createDataFrame([Row(x=10.0, w=1), Row(x=20.0, w=3)])
    [r] = df.agg(ch.avgWeighted("x", "w").alias("aw")).collect()
    assert r.aw == pytest.approx((10 * 1 + 20 * 3) / 4)


def test_registry_catalog_surface(spark):
    from api_weather_kafka_clickhouse_spark.registry import all_specs, catalog

    df = catalog(spark)
    rows = df.collect()
    assert len(rows) == len(all_specs())
    byname = {r.name: r for r in rows}
    assert byname["q1_pricing_summary"].oracle_checked
    assert not byname["dedup_semdedup"].oracle_checked  # rows-only by design
    assert byname["join_flagship_revenue"].family == "join"
    assert all(r.doc_head for r in rows)  # every query documents itself
