"""maximum_inscribed_circle (GEOS MaximumInscribedCircle / polylabel)."""

import math

import pytest
from pyspark.sql import functions as F

from arctic_spark import st
from arctic_spark.geom import algos, wkt


def _params(wkts, tol):
    return algos.maximum_inscribed_circle_params(wkt.parse(wkts), tol)


def test_square_triangle_diamond_closed_forms():
    cx, cy, r, qx, qy = _params(
        ["POLYGON((0 0,4 0,4 4,0 4,0 0))",
         "POLYGON((0 0,6 0,0 6,0 0))",       # right triangle, inradius 6(2-sqrt(2))/2
         "POLYGON((0 4,3 0,6 4,3 8,0 4))"],  # 3-4-5 diamond: r = 2.4
        1e-9)
    assert cx[0] == pytest.approx(2, abs=1e-6)
    assert cy[0] == pytest.approx(2, abs=1e-6)
    assert r[0] == pytest.approx(2, abs=1e-6)
    # incircle of right triangle legs a=b=6, hyp=6*sqrt(2): r=(a+b-c)/2
    assert r[1] == pytest.approx((12 - 6 * math.sqrt(2)) / 2, abs=1e-6)
    assert r[2] == pytest.approx(2.4, abs=1e-6)
    assert cx[2] == pytest.approx(3, abs=1e-6)
    assert cy[2] == pytest.approx(4, abs=1e-6)
    # witness point is at distance r from the center
    d = math.hypot(qx[0] - cx[0], qy[0] - cy[0])
    assert d == pytest.approx(r[0], abs=1e-9)


def test_ridge_rectangle_capped():
    # wide rectangle: the optimal pole is a SEGMENT (ridge) — the
    # per-round cell cap must still converge to the exact inradius
    cx, cy, r, _, _ = _params(["POLYGON((0 0,20 0,20 2,0 2,0 0))"], 1e-7)
    assert r[0] == pytest.approx(1.0, abs=1e-6)
    assert cy[0] == pytest.approx(1.0, abs=1e-6)
    assert 1.0 - 1e-6 <= cx[0] <= 19.0 + 1e-6


def test_hole_and_multipolygon():
    cx, cy, r, _, _ = _params(
        ["POLYGON((0 0,10 0,10 10,0 10,0 0),(4 4,6 4,6 6,4 6,4 4))",
         "MULTIPOLYGON(((0 0,2 0,2 2,0 2,0 0)),((5 0,11 0,11 6,5 6,5 0)))"],
        1e-7)
    # square with centered hole: pole in a corner pocket, depth
    # 10-x = sqrt(2)(x-6) -> r = 4*sqrt(2)/(1+sqrt(2))
    assert r[0] == pytest.approx(4 * math.sqrt(2) / (1 + math.sqrt(2)),
                                 abs=1e-6)
    # multipolygon: the larger part wins
    assert r[1] == pytest.approx(3.0, abs=1e-6)
    assert cx[1] == pytest.approx(8.0, abs=1e-6)
    assert cy[1] == pytest.approx(3.0, abs=1e-6)


def test_non_polygon_null(spark):
    df = spark.createDataFrame([(1,)], "i long")
    g = st.point(F.lit(1.0), F.lit(2.0))
    out = df.withColumn("mic", st.maximum_inscribed_circle(g)) \
        .select(st.is_empty(F.col("mic")).alias("e"),
                st.length(F.col("mic")).alias("l")).collect()
    assert out[0]["l"] is None


def test_udf_linestring_shape(spark):
    df = spark.createDataFrame([(1,)], "i long")
    g = st.from_wkt(F.lit("POLYGON((0 0,4 0,4 4,0 4,0 0))"))
    d = df.withColumn("g", g)
    d = d.withColumn("mic", st.maximum_inscribed_circle(F.col("g"), 1e-9))
    r = d.select(
        st.geom_type_name(F.col("mic")).alias("t"),
        F.round(st.length(F.col("mic")), 6).alias("r")).collect()[0]
    assert r["t"] == "LineString"
    assert r["r"] == pytest.approx(2.0, abs=1e-6)


def test_default_tolerance_and_determinism():
    w = ["POLYGON((0 0,7 0,9 5,3 9,0 4,0 0))"] * 3
    a = _params(w, None)
    b = _params(w, None)
    for i in range(3):
        assert a[0][i] == a[0][0] and a[1][i] == a[1][0]
        assert a[2][i] == b[2][i] == a[2][0]
    assert a[2][0] > 2.0  # sane: a fat hexagon fits a big circle
