"""Geospatial battery: grid-cell density, radius self-join, and
radius-bounded nearest neighbor — the spatial analytics a warehouse
runs on point data (store/customer locations, sensor positions,
geo-tagged events).

The tables ship no coordinates, so each query derives a deterministic
synthetic position per customer from md5(c_custkey) — the same
cross-engine bit-derivation kernel dedup_simhash uses for its
signature bits — in integer "e4" units (1e4 units per degree):
``lat_off`` in [0, 1_800_000) and ``lon_off`` in [0, 3_600_000), i.e.
(lat + 90) * 1e4. All distance arithmetic stays in exact BIGINT
(squared euclidean in the projected plane: dlat^2 + dlon^2 <= 2.6e13,
far inside bigint), so no float enters until the final per-row
display division and every query hash-checks against DuckDB.

The scale design is the classic spatial grid join: bucket points into
cells whose side equals the search radius, expand only the LEFT side
of a candidate join into its 3x3 cell neighborhood, and equi-join on
the cell key. Any pair within radius R differs by <= R per axis, so
it lands in adjacent cells and is found exactly once — candidates are
O(n * density), never the O(n^2) all-pairs cross join, and the
shuffle key (cell) is the natural spatial partitioner at 100 TB.
Geodesic wraparound/projection is out of scope by contract: the
operators work in an already-projected plane (what a real pipeline's
projection layer produces); the oracle twins brute-force the same
semantics over all pairs, which is only feasible because the oracle
runs at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load

LAT_SPAN = 1_800_000  # (lat + 90) * 1e4  -> [0, 1_800_000)
LON_SPAN = 3_600_000  # (lon + 180) * 1e4 -> [0, 3_600_000)
RADIUS_E4 = 50_000  # search radius: 5 degrees in e4 units
RADIUS2 = RADIUS_E4 * RADIUS_E4
DENSITY_CELL_E4 = 100_000  # 10-degree density cells
DENSITY_TOP = 20

# Shared derivation CTE for the DuckDB oracles: first 8 md5 hex chars
# -> bigint, mod the axis span. Mirrors _points() expression by
# expression (md5 of 'lat:<custkey>' / 'lon:<custkey>').
_PTS_CTE = f"""
    pts AS (
      SELECT c_custkey AS point_id,
             CAST(('0x' || substr(md5('lat:' || CAST(c_custkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % {LAT_SPAN} AS lat_off,
             CAST(('0x' || substr(md5('lon:' || CAST(c_custkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % {LON_SPAN} AS lon_off
      FROM customer
    )
"""


def _h32(tag: str) -> F.Column:
    """First 32 md5 bits of '<tag><custkey>' as a non-negative long."""
    s = F.concat(F.lit(tag), F.col("c_custkey").cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic projected point per customer (see module doc)."""
    return load(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("point_id"),
        (_h32("lat:") % LAT_SPAN).alias("lat_off"),
        (_h32("lon:") % LON_SPAN).alias("lon_off"),
    )


def _with_cell(pts: DataFrame, cell: int) -> DataFrame:
    # integer division on non-negative offsets == floor: no float ever
    # enters the cell key on either engine (DuckDB mirrors with //)
    return pts.select(
        "*",
        F.expr(f"lon_off div {cell}").alias("cell_x"),
        F.expr(f"lat_off div {cell}").alias("cell_y"),
    )


@register(
    "geo_cell_density",
    oracle=f"""
    WITH {_PTS_CTE},
    cells AS (
      SELECT lon_off // {DENSITY_CELL_E4} AS cell_x,
             lat_off // {DENSITY_CELL_E4} AS cell_y,
             CAST(count(*) AS BIGINT) AS n_points,
             CAST(sum(lat_off) AS BIGINT) AS lat_sum,
             CAST(sum(lon_off) AS BIGINT) AS lon_sum
      FROM pts GROUP BY 1, 2
    )
    SELECT cell_x, cell_y, n_points,
           round(CAST(lat_sum AS DOUBLE) / (CAST(n_points AS DOUBLE) * 1e4)
                 - 90.0, 6) AS centroid_lat,
           round(CAST(lon_sum AS DOUBLE) / (CAST(n_points AS DOUBLE) * 1e4)
                 - 180.0, 6) AS centroid_lon
    FROM cells
    ORDER BY n_points DESC, cell_x, cell_y
    LIMIT {DENSITY_TOP}
    """,
    doc="Point density per 10-degree grid cell with exact-integer "
    "centroids (hotspot map / heatmap tiles / partition planning for "
    "the spatial store). Cell keys are pure integer division, counts "
    "and coordinate sums aggregate exactly in BIGINT, and the only "
    "float is the final per-cell centroid division — one "
    "map-side-combined groupBy over the points, top cells by "
    "(count, cell) with a total tiebreak. At 100 TB the cell is the "
    "partition key and the result stays grid-bounded (648 cells here) "
    "no matter the point count.",
)
def geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = (
        _with_cell(_points(spark, sf_dir), DENSITY_CELL_E4)
        .groupBy("cell_x", "cell_y")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.sum("lat_off").cast("bigint").alias("lat_sum"),
            F.sum("lon_off").cast("bigint").alias("lon_sum"),
        )
    )
    nd = F.col("n_points").cast("double")
    return (
        cells.select(
            "cell_x",
            "cell_y",
            "n_points",
            F.round(F.col("lat_sum").cast("double") / (nd * F.lit(1e4)) - F.lit(90.0), 6).alias(
                "centroid_lat"
            ),
            F.round(F.col("lon_sum").cast("double") / (nd * F.lit(1e4)) - F.lit(180.0), 6).alias(
                "centroid_lon"
            ),
        )
        .orderBy(F.col("n_points").desc(), "cell_x", "cell_y")
        .limit(DENSITY_TOP)
    )


_DIST2 = (
    "(a.lat_off - b.lat_off) * (a.lat_off - b.lat_off)"
    " + (a.lon_off - b.lon_off) * (a.lon_off - b.lon_off)"
)


@register(
    "geo_radius_join",
    oracle=f"""
    WITH {_PTS_CTE}
    SELECT a.point_id AS point_a, b.point_id AS point_b,
           CAST({_DIST2} AS BIGINT) AS dist2
    FROM pts a JOIN pts b ON a.point_id < b.point_id
    WHERE {_DIST2} <= {RADIUS2}
    """,
    doc="All point pairs within radius 5 degrees (squared-distance "
    "threshold in exact BIGINT) — the spatial self-join behind "
    "store-cannibalization, sensor-neighborhood, and geo-dedup "
    "analyses. The oracle brute-forces all n^2/2 pairs; the Spark "
    "plan never does: points bucket into radius-sized cells, the "
    "LEFT side explodes into its 3x3 cell neighborhood (a bounded "
    "9x fanout of the dimension-light point table, not a join), and "
    "candidates come from ONE shuffle equi-join on the cell key — "
    "any pair within R differs by <= R per axis, so it meets in "
    "exactly one (neighbor-cell, home-cell) combination and needs no "
    "distinct. Candidates are O(n * cell density); dense-city skew "
    "is the classic residual and is handled the same way as "
    "join_salted_skew (salt the hot cells) when a real distribution "
    "demands it.",
)
def geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.stage import eager_release

    pts = _with_cell(_points(spark, sf_dir), RADIUS_E4).persist()
    offs = F.array(F.lit(-1), F.lit(0), F.lit(1))
    left = (
        pts.select(
            F.col("point_id").alias("point_a"),
            F.col("lat_off").alias("lat_a"),
            F.col("lon_off").alias("lon_a"),
            "cell_x",
            "cell_y",
            F.explode(offs).alias("dx"),
        )
        .select("*", F.explode(offs).alias("dy"))
        .select(
            "point_a",
            "lat_a",
            "lon_a",
            (F.col("cell_x") + F.col("dx")).alias("cell_x"),
            (F.col("cell_y") + F.col("dy")).alias("cell_y"),
        )
    )
    d2 = (F.col("lat_a") - F.col("lat_off")) * (F.col("lat_a") - F.col("lat_off")) + (
        F.col("lon_a") - F.col("lon_off")
    ) * (F.col("lon_a") - F.col("lon_off"))
    out = (
        left.join(pts, ["cell_x", "cell_y"])
        .filter(F.col("point_a") < F.col("point_id"))
        .select(
            "point_a",
            F.col("point_id").alias("point_b"),
            d2.cast("bigint").alias("dist2"),
        )
        .filter(F.col("dist2") <= RADIUS2)
    )
    return eager_release(out, "geo_radius_join", pts)


@register(
    "geo_knn_grid",
    oracle=f"""
    WITH {_PTS_CTE},
    cand AS (
      SELECT a.point_id, b.point_id AS nn_id,
             CAST({_DIST2} AS BIGINT) AS dist2
      FROM pts a JOIN pts b ON a.point_id <> b.point_id
      WHERE {_DIST2} <= {RADIUS2}
    )
    SELECT point_id, nn_id, dist2
    FROM (
      SELECT point_id, nn_id, dist2,
             row_number() OVER (PARTITION BY point_id
                                ORDER BY dist2, nn_id) AS rk
      FROM cand
    ) WHERE rk = 1
    """,
    doc="Radius-bounded nearest neighbor: each point's closest other "
    "point within 5 degrees, ties broken by id (points with no "
    "neighbor in radius are absent by contract — the honest "
    "grid-join semantics; unbounded exact kNN needs expanding-ring "
    "search, which the IVF multi-probe operators already model for "
    "the embedding space). Same 3x3 grid candidate join as "
    "geo_radius_join but directed (a <> b), then a per-point argmin "
    "as a WindowGroupLimit rank over candidates — window input is "
    "candidate-sized (O(n * density)), never all-pairs. Exact BIGINT "
    "distances end to end.",
)
def geo_knn_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.stage import eager_release

    pts = _with_cell(_points(spark, sf_dir), RADIUS_E4).persist()
    offs = F.array(F.lit(-1), F.lit(0), F.lit(1))
    left = (
        pts.select(
            F.col("point_id").alias("pid"),
            F.col("lat_off").alias("lat_a"),
            F.col("lon_off").alias("lon_a"),
            "cell_x",
            "cell_y",
            F.explode(offs).alias("dx"),
        )
        .select("*", F.explode(offs).alias("dy"))
        .select(
            "pid",
            "lat_a",
            "lon_a",
            (F.col("cell_x") + F.col("dx")).alias("cell_x"),
            (F.col("cell_y") + F.col("dy")).alias("cell_y"),
        )
    )
    d2 = (F.col("lat_a") - F.col("lat_off")) * (F.col("lat_a") - F.col("lat_off")) + (
        F.col("lon_a") - F.col("lon_off")
    ) * (F.col("lon_a") - F.col("lon_off"))
    cand = (
        left.join(pts, ["cell_x", "cell_y"])
        .filter(F.col("pid") != F.col("point_id"))
        .select(
            F.col("pid").alias("point_id_out"),
            F.col("point_id").alias("nn_id"),
            d2.cast("bigint").alias("dist2"),
        )
        .filter(F.col("dist2") <= RADIUS2)
    )
    w = Window.partitionBy("point_id_out").orderBy("dist2", "nn_id")
    out = (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(F.col("point_id_out").alias("point_id"), "nn_id", "dist2")
    )
    return eager_release(out, "geo_knn_grid", pts)


DBSCAN_MINPTS = 3  # core point: >= this many OTHER points within R


@register(
    "geo_dbscan_classify",
    oracle=f"""
    WITH {_PTS_CTE},
    cand AS (
      SELECT a.point_id, b.point_id AS nbr_id
      FROM pts a JOIN pts b ON a.point_id <> b.point_id
      WHERE {_DIST2} <= {RADIUS2}
    ),
    deg AS (
      SELECT point_id, CAST(count(*) AS BIGINT) AS n_neighbors
      FROM cand GROUP BY point_id
    ),
    lab AS (
      SELECT p.point_id,
             CAST(coalesce(d.n_neighbors, 0) AS BIGINT) AS n_neighbors,
             coalesce(d.n_neighbors, 0) >= {DBSCAN_MINPTS} AS is_core
      FROM pts p LEFT JOIN deg d USING (point_id)
    )
    SELECT l.point_id, l.n_neighbors,
           CASE WHEN l.is_core THEN 'core'
                WHEN EXISTS (SELECT 1 FROM cand c JOIN lab n
                             ON n.point_id = c.nbr_id
                             WHERE c.point_id = l.point_id AND n.is_core)
                     THEN 'border'
                ELSE 'noise' END AS role
    FROM lab l
    """,
    doc="DBSCAN point classification on the projected plane: core "
    f"(>= {DBSCAN_MINPTS} neighbors within the 5-degree radius), "
    "border (non-core with a core neighbor), noise — the density "
    "labeling that full DBSCAN clusters by connecting cores (that "
    "closure is merge_components over the core-core edges; the "
    "labeling here is the distributed-cost part). Both passes run on "
    "the SAME grid-bucketed candidate pairs as geo_radius_join — "
    "built once, persisted, reused for the degree count and the "
    "border check — so the all-pairs oracle shape never executes in "
    "Spark; isolated points never enter the candidate join and "
    "rejoin as noise via the left join. Exact BIGINT distances end "
    "to end.",
)
def geo_dbscan_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.stage import eager_release

    pts = _with_cell(_points(spark, sf_dir), RADIUS_E4).persist()
    offs = F.array(F.lit(-1), F.lit(0), F.lit(1))
    left = (
        pts.select(
            F.col("point_id").alias("pid"),
            F.col("lat_off").alias("lat_a"),
            F.col("lon_off").alias("lon_a"),
            "cell_x",
            "cell_y",
            F.explode(offs).alias("dx"),
        )
        .select("*", F.explode(offs).alias("dy"))
        .select(
            "pid",
            "lat_a",
            "lon_a",
            (F.col("cell_x") + F.col("dx")).alias("cell_x"),
            (F.col("cell_y") + F.col("dy")).alias("cell_y"),
        )
    )
    d2 = (F.col("lat_a") - F.col("lat_off")) * (F.col("lat_a") - F.col("lat_off")) + (
        F.col("lon_a") - F.col("lon_off")
    ) * (F.col("lon_a") - F.col("lon_off"))
    cand = (
        left.join(pts, ["cell_x", "cell_y"])
        .filter(F.col("pid") != F.col("point_id"))
        .filter(d2 <= RADIUS2)
        .select(F.col("pid").alias("point_id"), F.col("point_id").alias("nbr_id"))
        .persist()
    )
    deg = cand.groupBy("point_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_neighbors"))
    lab = (
        pts.select("point_id")
        .join(deg, "point_id", "left")
        .select(
            "point_id",
            F.coalesce(F.col("n_neighbors"), F.lit(0)).cast("bigint").alias("n_neighbors"),
            (F.coalesce(F.col("n_neighbors"), F.lit(0)) >= DBSCAN_MINPTS).alias("is_core"),
        )
        .persist()
    )
    core_nbr = (
        cand.join(
            lab.filter(F.col("is_core")).select(F.col("point_id").alias("nbr_id")),
            "nbr_id",
            "left_semi",
        )
        .select("point_id")
        .distinct()
        .withColumn("has_core_nbr", F.lit(True))
    )
    out = (
        lab.join(core_nbr, "point_id", "left")
        .select(
            "point_id",
            "n_neighbors",
            F.when(F.col("is_core"), F.lit("core"))
            .when(F.col("has_core_nbr"), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
        )
    )
    return eager_release(out, "geo_dbscan", pts, cand, lab)


# --- quadkey tile pyramid (round 10) ----------------------------------

QUAD_MAX_ZOOM = 4  # 16 x 16 tiles at the deepest level


def _quad_digit_sql(i: int) -> str:
    """Bing-style quadkey digit i (1-based, most significant first)."""
    sh = QUAD_MAX_ZOOM - i
    return f"CAST(2 * ((tile_y >> {sh}) & 1) + ((tile_x >> {sh}) & 1) AS VARCHAR)"


@register(
    "geo_quadkey_rollup",
    oracle=f"""
    WITH pts AS (
      SELECT c_nationkey,
             CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
             CAST(('0x' || substr(md5('lat:' || CAST(c_custkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % {LAT_SPAN} AS lat_off,
             CAST(('0x' || substr(md5('lon:' || CAST(c_custkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % {LON_SPAN} AS lon_off
      FROM customer
    ),
    tiles AS (
      SELECT c_nationkey, bal,
             (lon_off * {1 << QUAD_MAX_ZOOM}) // {LON_SPAN} AS tile_x,
             (lat_off * {1 << QUAD_MAX_ZOOM}) // {LAT_SPAN} AS tile_y
      FROM pts
    ),
    keyed AS (
      SELECT c_nationkey, bal,
             {" || ".join(_quad_digit_sql(i) for i in range(1, QUAD_MAX_ZOOM + 1))} AS qk4
      FROM tiles
    ),
    pyramid AS (
      SELECT CAST(z AS BIGINT) AS zoom, substr(qk4, 1, z) AS quadkey,
             c_nationkey, bal
      FROM keyed, (VALUES (1), (2), (3), (4)) zs(z)
    )
    SELECT zoom, quadkey,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           CAST(CAST(sum(bal) AS DECIMAL(38,2)) AS DOUBLE) AS sum_bal
    FROM pyramid GROUP BY zoom, quadkey
    """,
    doc="Quadkey tile-pyramid rollup: every point maps to its zoom-4 "
    "Bing-style quadkey (interleaved x/y tile bits rendered as "
    "base-4 digits), and the pyramid aggregates at zooms 1-4 by "
    "PREFIX truncation — parent tile = child quadkey minus its last "
    "digit, the property that makes quadkeys the standard storage "
    "key for map-tile serving. The plan is one scan, a 4x zoom "
    "explode, one shuffle on (zoom, quadkey); at 100 TB the quadkey "
    "prefix is simultaneously the PARTITION key (prefix-range reads "
    "= spatial locality) and the rollup key, which is the reason to "
    "pick it over raw lat/lon cells. Tile math is exact integer "
    "(offsets scaled by 2^zoom then integer-divided by the axis "
    "span); balances aggregate in DECIMAL.",
)
def geo_quadkey_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, "customer", sf_dir)
    scale = 1 << QUAD_MAX_ZOOM
    pts = c.select(
        "c_nationkey",
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
        (_h32("lat:") % LAT_SPAN).alias("lat_off"),
        (_h32("lon:") % LON_SPAN).alias("lon_off"),
    )
    tiles = pts.select(
        "c_nationkey",
        "bal",
        F.expr(f"(lon_off * {scale}) div {LON_SPAN}").alias("tile_x"),
        F.expr(f"(lat_off * {scale}) div {LAT_SPAN}").alias("tile_y"),
    )
    digits = [
        F.expr(
            f"CAST(2 * ((tile_y >> {QUAD_MAX_ZOOM - i}) & 1) "
            f"+ ((tile_x >> {QUAD_MAX_ZOOM - i}) & 1) AS STRING)"
        )
        for i in range(1, QUAD_MAX_ZOOM + 1)
    ]
    keyed = tiles.select("c_nationkey", "bal", F.concat(*digits).alias("qk4"))
    pyramid = keyed.select(
        "c_nationkey",
        "bal",
        F.explode(F.array(*[F.lit(z) for z in range(1, QUAD_MAX_ZOOM + 1)])).alias("zoom"),
        "qk4",
    ).select(
        F.col("zoom").cast("bigint").alias("zoom"),
        F.expr("substring(qk4, 1, zoom)").alias("quadkey"),
        "c_nationkey",
        "bal",
    )
    return pyramid.groupBy("zoom", "quadkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.countDistinct("c_nationkey").cast("bigint").alias("n_nations"),
        # decimal-exact sum INTERNALLY; final column DOUBLE (oracle.py
        # house rule: DuckDB's pandas bridge floats every DECIMAL)
        F.sum("bal").cast("decimal(38,2)").cast("double").alias("sum_bal"),
    )


# --- geohash encoding (round 10) --------------------------------------

GEOHASH_CHARS = "0123456789bcdefghjkmnpqrstuvwxyz"  # the standard base32
GEOHASH_LEN = 6  # 30 bits: 15 lon + 15 lat, lon leads (even positions)
_GH_BITS = 15


def _gh_interleave_terms(lon_col: str, lat_col: str) -> str:
    """SQL expression: the 30-bit interleaved integer, MSB-first, lon
    on even bit positions (the geohash convention). Identical
    arithmetic on both engines; generated as 30 shift/mask terms."""
    terms = []
    for j in range(_GH_BITS):
        terms.append(f"((({lon_col} >> {_GH_BITS - 1 - j}) & 1) << {29 - 2 * j})")
        terms.append(f"((({lat_col} >> {_GH_BITS - 1 - j}) & 1) << {28 - 2 * j})")
    return " + ".join(terms)


def _gh_char_sql(t: int) -> str:
    return f"substr('{GEOHASH_CHARS}', CAST((ih >> {25 - 5 * t}) & 31 AS INT) + 1, 1)"


@register(
    "geo_geohash_encode",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS point_id,
             CAST(('0x' || substr(md5('lat:' || CAST(c_custkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % {LAT_SPAN} AS lat_off,
             CAST(('0x' || substr(md5('lon:' || CAST(c_custkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % {LON_SPAN} AS lon_off
      FROM customer
    ),
    q AS (
      SELECT point_id,
             (lon_off * {1 << _GH_BITS}) // {LON_SPAN} AS lon_q,
             (lat_off * {1 << _GH_BITS}) // {LAT_SPAN} AS lat_q
      FROM pts
    ),
    iv AS (
      SELECT point_id, {_gh_interleave_terms("lon_q", "lat_q")} AS ih FROM q
    )
    SELECT point_id,
           {" || ".join(_gh_char_sql(t) for t in range(GEOHASH_LEN))} AS geohash
    FROM iv
    """,
    doc="Geohash encoding (6 chars = 30 bits) of the synthetic point "
    "set: quantize each axis to 15 bits by exact integer scaling "
    "(offset * 2^15 div span — no float enters the cell id), "
    "interleave with longitude on even positions (the geohash "
    "convention), and render base-32 with the standard alphabet. "
    "Geohash prefixes nest like geo_quadkey_rollup's digits but are "
    "STRING-sortable storage keys — the common choice for "
    "Z-order-style spatial clustering of parquet files, which is why "
    "an engine needs the encoder as a first-class scalar. The whole "
    "operator is a projection (no shuffle); 30 shift/mask terms stay "
    "inside whole-stage codegen. Ranges differ from true geographic "
    "geohash only by the projected-plane contract stated in the "
    "module docstring; the bit mechanics are the real algorithm.",
)
def geo_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    q = pts.select(
        "point_id",
        F.expr(f"(lon_off * {1 << _GH_BITS}) div {LON_SPAN}").alias("lon_q"),
        F.expr(f"(lat_off * {1 << _GH_BITS}) div {LAT_SPAN}").alias("lat_q"),
    )
    iv = q.select(
        "point_id", F.expr(_gh_interleave_terms("lon_q", "lat_q")).alias("ih")
    )
    chars = [
        F.expr(
            f"substring('{GEOHASH_CHARS}', CAST((ih >> {25 - 5 * t}) & 31 AS INT) + 1, 1)"
        )
        for t in range(GEOHASH_LEN)
    ]
    return iv.select("point_id", F.concat(*chars).alias("geohash"))
