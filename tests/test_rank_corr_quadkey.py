"""Math-correctness tests for the round-10 additions: Spearman
(tie-aware midranks), Kendall tau-a (concordant/discordant), the
quadkey tile pyramid, and the upgraded exact-integer pHash kernel +
planted-fixture band pairs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _spearman_reference(xs, ys):
    """Textbook tie-aware Spearman: Pearson on midranks."""

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            mr = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = mr
            i = j + 1
        return ranks

    rx, ry = midranks(xs), midranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    )
    return num / den


def test_spearman_matches_textbook_midrank_pearson(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.stats import (
        stats_spearman_corr,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    got = {r["flag"]: (r["n"], r["rho_spearman"]) for r in stats_spearman_corr(spark, sf_dir).collect()}
    li = load(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    rows = li.collect()
    by_flag: dict[str, tuple[list, list]] = {}
    for r in rows:
        xs, ys = by_flag.setdefault(r["l_returnflag"], ([], []))
        xs.append(r["l_quantity"])
        ys.append(r["l_extendedprice"])
    for flag, (xs, ys) in by_flag.items():
        n, rho = got[flag]
        assert n == len(xs)
        assert rho == pytest.approx(_spearman_reference(xs, ys), abs=2e-6)


def test_spearman_perfect_monotone_is_one(spark, sf_dir):
    # sanity anchor: quantity vs quantity would be 1; rank of price
    # against itself through the registered pipeline shape
    from api_weather_kafka_clickhouse_spark.tables import load

    li = load(spark, "lineitem", sf_dir).limit(500)
    from pyspark.sql import Window

    w = Window.orderBy("l_extendedprice")
    t = Window.partitionBy("l_extendedprice")
    d = li.select(
        (F.rank().over(w) * 2 + F.count(F.lit(1)).over(t) - 1).alias("dx")
    )
    # a variable correlated with itself via the double-rank transform
    pdf = d.toPandas()
    dx = pdf["dx"].astype("int64")
    assert _corr_of_ranks(dx, dx) == pytest.approx(1.0)


def _corr_of_ranks(dx, dy):
    # python ints (arbitrary precision): the product of the two
    # variance terms overflows int64 even at n=500
    n = int(len(dx))
    sdx, sdy = int(dx.sum()), int(dy.sum())
    sdxx = int((dx * dx).sum())
    sdyy = int((dy * dy).sum())
    sdxy = int((dx * dy).sum())
    return (n * sdxy - sdx * sdy) / math.sqrt(
        (n * sdxx - sdx * sdx) * (n * sdyy - sdy * sdy)
    )


def test_kendall_counts_match_bruteforce(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.stats import (
        stats_kendall_tau,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    got = {
        r["flag"]: (r["nc"], r["nd"], r["n_pairs"], r["tau_a"])
        for r in stats_kendall_tau(spark, sf_dir).collect()
    }
    li = load(spark, "lineitem", sf_dir)
    b = (
        li.groupBy("l_returnflag", F.date_trunc("month", "l_shipdate").alias("m"))
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("bx"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("by"),
        )
        .collect()
    )
    series: dict[str, list] = {}
    for r in b:
        series.setdefault(r["l_returnflag"], []).append((r["m"], r["bx"], r["by"]))
    import itertools

    for flag, pts in series.items():
        nc = nd = np = 0
        for (mi, xi, yi), (mj, xj, yj) in itertools.combinations(
            sorted(pts), 2
        ):
            np += 1
            if (xi < xj and yi < yj) or (xi > xj and yi > yj):
                nc += 1
            elif (xi < xj and yi > yj) or (xi > xj and yi < yj):
                nd += 1
        g_nc, g_nd, g_np, g_tau = got[flag]
        assert (g_nc, g_nd, g_np) == (nc, nd, np)
        assert g_tau == pytest.approx(round((nc - nd) / np, 6))


def test_quadkey_pyramid_parent_sums_children(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.geo import (
        geo_quadkey_rollup,
    )

    rows = geo_quadkey_rollup(spark, sf_dir).collect()
    by_level: dict[int, dict[str, int]] = {}
    for r in rows:
        by_level.setdefault(r["zoom"], {})[r["quadkey"]] = r["n_points"]
    # every quadkey is digits 0-3, length == zoom
    for z, keys in by_level.items():
        for k in keys:
            assert len(k) == z and set(k) <= set("0123")
    # pyramid invariant: a parent's count is the sum of its children
    for z in (2, 3, 4):
        for key, n in by_level[z].items():
            parent = key[:-1]
            assert parent in by_level[z - 1]
        for pkey, pn in by_level[z - 1].items():
            assert pn == sum(
                n for k, n in by_level[z].items() if k[: z - 1] == pkey
            )
    # zoom-1 total == all customers
    from api_weather_kafka_clickhouse_spark.tables import load

    total = load(spark, "customer", sf_dir).count()
    assert sum(by_level[1].values()) == total


def test_phash_band_pairs_contains_planted_copies(spark, sf_dir):
    from api_weather_kafka_clickhouse_spark.operators.multimodal import (
        PHASH_COPY_BASE,
        PHASH_COPY_MOD,
        mm_phash_band_pairs,
    )
    from api_weather_kafka_clickhouse_spark.tables import load

    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in mm_phash_band_pairs(spark, sf_dir).collect()}
    doc_ids = [
        r["doc_id"]
        for r in load(spark, "documents", sf_dir).select("doc_id").collect()
        if r["doc_id"] % PHASH_COPY_MOD == 0
    ]
    assert doc_ids, "fixture requires at least one planted copy"
    for did in doc_ids:
        assert pairs.get((did, did + PHASH_COPY_BASE)) == 0
