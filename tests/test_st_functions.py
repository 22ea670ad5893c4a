"""Spark `st` function tests: every native Catalyst expression is
cross-checked against the numpy kernel oracle on the same geometries
(the reference's GeoPandas-as-oracle strategy, test_convert.py:7-47,
with our numpy core standing in for GeoPandas)."""

import math

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from arctic_spark import st
from arctic_spark.geom import algos, wkt

SQUARE = "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))"
DONUT = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
LINE = "LINESTRING (0 0, 3 4, 3 8)"
MPOLY = "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))"
MPT = "MULTIPOINT (1 1, 2 2, 3 3)"
MLS = "MULTILINESTRING ((0 0, 1 0), (0 0, 0 2, 2 2))"
PT = "POINT (3 7)"

ALL = [SQUARE, DONUT, LINE, MPOLY, MPT, MLS, PT, None]


@pytest.fixture(scope="module")
def gdf(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(ALL)],
                               "id int, wkt string")
    return df.withColumn("geometry", st.from_wkt("wkt")).cache()


def _vals(df, col_expr, name="v"):
    rows = df.select("id", col_expr.alias(name)).orderBy("id").collect()
    return [r[name] for r in rows]


def test_from_wkt_roundtrip(gdf):
    out = _vals(gdf, st.to_wkt("geometry"))
    rg = wkt.parse(ALL)
    assert out == wkt.format(rg)


def test_wkb_roundtrip_spark(gdf):
    out = _vals(gdf, st.to_wkt(st.from_wkb(st.to_wkb("geometry"))))
    assert out == wkt.format(wkt.parse(ALL))


def test_area_native_vs_numpy(gdf):
    got = _vals(gdf, st.area("geometry"))
    exp = algos.area(wkt.parse(ALL))
    for g, e in zip(got, exp):
        if math.isnan(e):
            assert g is None
        else:
            assert g == pytest.approx(e)


def test_length_native_vs_numpy(gdf):
    got = _vals(gdf, st.length("geometry"))
    exp = algos.length(wkt.parse(ALL))
    for g, e in zip(got, exp):
        if math.isnan(e):
            assert g is None
        else:
            assert g == pytest.approx(e)


def test_centroid_native_vs_numpy(gdf):
    got_x = _vals(gdf, st.x(st.centroid("geometry")))
    got_y = _vals(gdf, st.y(st.centroid("geometry")))
    cx, cy = algos.centroid(wkt.parse(ALL))
    for gx, gy, ex, ey in zip(got_x, got_y, cx, cy):
        if math.isnan(ex):
            assert gx is None
        else:
            assert gx == pytest.approx(ex)
            assert gy == pytest.approx(ey)


def test_bounds_envelope(gdf):
    got = _vals(gdf, st.area(st.envelope("geometry")))
    b = algos.bounds(wkt.parse(ALL))
    for g, (x0, y0, x1, y1) in zip(got, b):
        if math.isnan(x0):
            assert g is None
        else:
            assert g == pytest.approx((x1 - x0) * (y1 - y0))
    # point envelope collapses to point
    pt_env = _vals(gdf, st.geom_type(st.envelope("geometry")))
    assert pt_env[6] == 0


def test_accessors(gdf):
    assert _vals(gdf, st.x("geometry"))[6] == 3.0
    assert _vals(gdf, st.y("geometry"))[6] == 7.0
    assert _vals(gdf, st.geom_type("geometry")) == [3, 3, 1, 6, 4, 5, 0, -1]
    names = _vals(gdf, st.geom_type_name("geometry"))
    assert names[0] == "Polygon" and names[6] == "Point" and names[7] is None
    assert _vals(gdf, st.is_empty("geometry"))[:7] == [False] * 7
    assert _vals(gdf, st.num_parts("geometry"))[:7] == [1, 1, 1, 2, 3, 2, 1]


def test_is_ring(spark):
    df = spark.createDataFrame(
        [(0, "LINESTRING (0 0, 1 0, 1 1, 0 0)"), (1, LINE), (2, PT)],
        "id int, wkt string").withColumn("geometry", st.from_wkt("wkt"))
    assert _vals(df, st.is_ring("geometry")) == [True, False, False]


def test_exterior(gdf):
    got = _vals(gdf, st.length(st.exterior("geometry")))
    assert got[0] == pytest.approx(80.0)
    assert got[1] == pytest.approx(40.0)
    assert got[2] is None  # line has no exterior


def test_affine_family(gdf):
    sq = gdf.where("id = 0")
    # translate
    t = _vals(sq, st.x(st.centroid(st.translate("geometry", 5.0, -2.0))))
    assert t[0] == pytest.approx(15.0)
    # rotate 90° about center: square maps onto itself
    r = _vals(sq, st.area(st.rotate("geometry", 90.0)))
    assert r[0] == pytest.approx(400.0)
    rc = _vals(sq, st.x(st.centroid(st.rotate("geometry", 90.0))))
    assert rc[0] == pytest.approx(10.0)
    # rotate about explicit origin (0,0): (20,0) -> (0,20)
    pt = gdf.where("id = 6")  # POINT (3 7)
    rx = _vals(pt, st.x(st.rotate("geometry", 90.0, origin=(0, 0))))
    ry = _vals(pt, st.y(st.rotate("geometry", 90.0, origin=(0, 0))))
    assert rx[0] == pytest.approx(-7.0)
    assert ry[0] == pytest.approx(3.0)
    # scale about center doubles area by 4
    s = _vals(sq, st.area(st.scale("geometry", 2.0, 2.0)))
    assert s[0] == pytest.approx(1600.0)
    sc = _vals(sq, st.x(st.centroid(st.scale("geometry", 2.0, 2.0))))
    assert sc[0] == pytest.approx(10.0)
    # skew 45° in x: area preserved for shear
    sk = _vals(sq, st.area(st.skew("geometry", 45.0)))
    assert sk[0] == pytest.approx(400.0)
    # affine_transform mirror
    m = _vals(sq, st.area(st.affine_transform("geometry",
                                              [-1.0, 0.0, 0.0, 1.0, 0.0, 0.0])))
    assert m[0] == pytest.approx(400.0)


def test_explode(spark):
    df = spark.createDataFrame([(0, MPOLY), (1, MPT), (2, PT)],
                               "id int, wkt string") \
              .withColumn("geometry", st.from_wkt("wkt")).drop("wkt")
    out = st.explode_parts(df)
    rows = out.select("id", st.to_wkt("geometry").alias("w")) \
              .orderBy("id").collect()
    assert len(rows) == 2 + 3 + 1
    assert [r.w for r in rows if r.id == 1] == [
        "POINT (1 1)", "POINT (2 2)", "POINT (3 3)"]
    a = out.where("id = 0").select(st.area("geometry").alias("a")).collect()
    assert sorted(r.a for r in a) == [4.0, 4.0]


def test_distance(spark):
    df = spark.createDataFrame([
        (0, "POINT (0 0)", "POINT (3 4)"),
        (1, SQUARE, "POINT (25 20)"),
        (2, SQUARE, "POINT (1 1)"),
    ], "id int, w1 string, w2 string") \
        .withColumn("g1", st.from_wkt("w1")).withColumn("g2", st.from_wkt("w2"))
    got = _vals(df, st.distance("g1", "g2"))
    assert got == pytest.approx([5.0, 5.0, 0.0])
    # native point fast path
    dp = _vals(df.where("id = 0"), st.distance_points("g1", "g2"))
    assert dp[0] == pytest.approx(5.0)


def test_contains_point_native(spark):
    df = spark.createDataFrame([(0, DONUT)], "id int, wkt string") \
              .withColumn("g", st.from_wkt("wkt"))
    checks = [((1.0, 1.0), True), ((3.0, 3.0), False), ((11.0, 5.0), False)]
    for (px, py), exp in checks:
        got = df.select(st.contains_point(
            "g", F.lit(px), F.lit(py)).alias("v")).collect()[0].v
        assert got == exp, (px, py)


def test_intersects_udf(spark):
    df = spark.createDataFrame([
        (0, SQUARE, "LINESTRING (-5 10, 25 10)"),
        (1, SQUARE, "POLYGON ((30 30, 40 30, 40 40, 30 40, 30 30))"),
        (2, SQUARE, "POINT (1 1)"),
    ], "id int, w1 string, w2 string") \
        .withColumn("g1", st.from_wkt("w1")).withColumn("g2", st.from_wkt("w2"))
    assert _vals(df, st.intersects("g1", "g2")) == [True, False, True]
    assert _vals(df, st.contains("g1", "g2")) == [False, False, True]


def test_convex_hull_simplify(spark):
    df = spark.createDataFrame(
        [(0, "MULTIPOINT (0 0, 4 0, 4 4, 0 4, 2 2)"),
         (1, "LINESTRING (0 0, 1 0.01, 2 0, 4 0, 8 5)")],
        "id int, wkt string").withColumn("g", st.from_wkt("wkt"))
    # NOTE: UDF-produced geometry must be materialized (withColumn) before
    # feeding a native HOF expression — Spark disallows Python UDFs inside
    # lambda functions (LAMBDA_FUNCTION_WITH_PYTHON_UDF).
    h = _vals(df.where("id=0").withColumn("h", st.convex_hull("g")),
              st.area("h"))
    assert h[0] == pytest.approx(16.0)
    s = _vals(df.where("id=1"), st.to_wkt(st.simplify("g", 0.1)))
    assert s[0] == "LINESTRING (0 0, 4 0, 8 5)"


def test_haversine_native_vs_vincenty(spark):
    # London -> Paris, roughly 343.5 km great-circle
    df = spark.createDataFrame(
        [(0, "LINESTRING (-0.1278 51.5074, 2.3522 48.8566)")],
        "id int, wkt string").withColumn("g", st.from_wkt("wkt"))
    hav = _vals(df, st.geodesic_length("g", "haversine"))[0]
    vin = _vals(df, st.geodesic_length("g", "vincenty"))[0]
    geo = _vals(df, st.geodesic_length("g", "geodesic"))[0]
    assert hav == pytest.approx(343_500, rel=0.01)
    assert vin == pytest.approx(343_900, rel=0.01)  # ellipsoidal slightly longer
    # r6: 'geodesic' is the real Karney algorithm, no longer a Vincenty
    # alias — the two independent formulations agree to sub-millimeter
    assert geo == pytest.approx(vin, abs=1e-3)
    with pytest.raises(ValueError):
        st.geodesic_length("g", "nope")


def test_total_bounds_and_cx(spark):
    from arctic_spark import GeoDataFrame
    df = spark.createDataFrame([(i, t) for i, t in enumerate(ALL[:7])],
                               "id int, wkt string") \
              .withColumn("geometry", st.from_wkt("wkt")).drop("wkt")
    g = GeoDataFrame(df)
    tb = g.total_bounds()
    assert tb == [0.0, 0.0, 20.0, 20.0]
    # F6-style bbox filter
    pts = ["POINT (0 10)", "POINT (1 1)", "POINT (10 1)", "POINT (1 -1)",
           "POINT (0 -10)", "POINT (-1 -1)", "POINT (-10 0)", "POINT (-1 1)",
           "POINT (0 10)"]
    pdf = spark.createDataFrame([(i, t) for i, t in enumerate(pts)],
                                "id int, wkt string") \
               .withColumn("geometry", st.from_wkt("wkt"))
    got = sorted(r.id for r in GeoDataFrame(pdf).cx(0, 0, 20, 20)
                 .select("id").collect())
    assert got == [0, 1, 2, 8]


def test_null_propagation(gdf):
    nulls = gdf.where("id = 7")
    assert _vals(nulls, st.area("geometry")) == [None]
    assert _vals(nulls, st.length("geometry")) == [None]
    assert _vals(nulls, st.x(st.centroid("geometry"))) == [None]
    assert _vals(nulls, st.to_wkt(st.translate("geometry", 1.0, 1.0))) == [None]
    assert _vals(nulls, st.geom_type("geometry")) == [-1]


def test_extract_unique_points_and_project_alias(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(1, "MULTIPOINT (0 0, 1 0, 1 0, 2 2)"),
         (2, "POLYGON ((0 0, 4 0, 4 4, 0 0))"),
         (3, "LINESTRING (0 0, 5 0)")],
        "id long, w string").withColumn("g", st.from_wkt("w"))
    out = {r.id: r for r in df.select(
        "id",
        F.size(st.extract_unique_points("g")["xs"]).alias("n"),
        st.geom_type_name(st.extract_unique_points("g")).alias("t"),
        st.project("g", st.point(F.lit(3.0), F.lit(1.0))).alias("d"))
        .collect()}
    assert out[1].n == 3 and out[1].t == "MultiPoint"
    assert out[2].n == 3           # closing repeat dropped
    assert out[3].d == 3.0         # GeoPandas project == line_locate_point
