"""Karney direct problem (geom.geodesic.direct / st.project_geodesic)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from arctic_spark import st
from arctic_spark.geom import geodesic as G


def test_quarter_meridian():
    lon2, lat2, _ = G.direct([0.0], [0.0], [0.0], [10001965.72931165])
    assert lat2[0] == pytest.approx(90.0, abs=1e-6)
    assert lon2[0] == pytest.approx(0.0, abs=1e-9)


def test_equator_is_exact():
    s = 6378137.0 * math.radians(10.0)
    lon2, lat2, _ = G.direct([5.0], [0.0], [math.pi / 2], [s])
    assert lat2[0] == 0.0
    assert lon2[0] == pytest.approx(15.0, abs=1e-9)


def test_roundtrip_against_inverse():
    rng = np.random.default_rng(3)
    n = 500
    lo1 = rng.uniform(-179, 179, n)
    la1 = rng.uniform(-80, 80, n)
    az = rng.uniform(0, 2 * np.pi, n)
    d = rng.uniform(1.0, 1.9e7, n)
    lo2, la2, _ = G.direct(lo1, la1, az, d)
    s = G.inverse(lo1, la1, lo2, la2)
    assert np.abs(s - d).max() < 1e-6  # metres


def test_negative_distance_reciprocal():
    lo_f, la_f, _ = G.direct([10.0], [20.0], [0.3], [5e5])
    lo_b, la_b, _ = G.direct([10.0], [20.0], [0.3 + math.pi], [-5e5])
    assert lo_b[0] == pytest.approx(lo_f[0], abs=1e-12)
    assert la_b[0] == pytest.approx(la_f[0], abs=1e-12)


def test_matches_sphere_to_first_order():
    # a 10 km hop: ellipsoid vs sphere differ well under 100 m
    lon2, lat2, _ = G.direct([7.0], [45.0], [1.0], [1e4])
    R = 6371008.8
    d = 1e4 / R
    lat1 = math.radians(45.0)
    sl2 = (math.sin(lat1) * math.cos(d)
           + math.cos(lat1) * math.sin(d) * math.cos(1.0))
    slat = math.degrees(math.asin(sl2))
    slon = 7.0 + math.degrees(math.atan2(
        math.sin(1.0) * math.sin(d) * math.cos(lat1),
        math.cos(d) - math.sin(lat1) * sl2))
    assert abs(lat2[0] - slat) < 1e-3
    assert abs(lon2[0] - slon) < 1e-3


def test_udf_and_nulls(spark):
    df = spark.createDataFrame([(0.0, 0.0)], "lon double, lat double")
    p = st.point(F.col("lon"), F.col("lat"))
    d = df.withColumn("dest", st.project_geodesic(
        p, 10001965.72931165, 0.0))
    r = d.select(F.round(st.y(F.col("dest")), 6).alias("lat"),
                 F.round(st.x(F.col("dest")), 6).alias("lon")).collect()[0]
    assert r["lat"] == pytest.approx(90.0, abs=1e-5)
    # non-point operand -> null
    ln = st.from_wkt(F.lit("LINESTRING(0 0,1 1)"))
    d2 = df.withColumn("dest", st.project_geodesic(ln, 100.0, 0.0))
    assert d2.select(st.x(F.col("dest")).alias("x")).collect()[0]["x"] \
        is None
