"""CRS reprojection tests against independently-computed oracle values
(well-known reference coordinates for the supported projections)."""

import pytest
from pyspark.sql import functions as F

from arctic_spark import GeoDataFrame, st
from arctic_spark.proj import CRSError, transform_geom, transform_xy


def _one(spark, wkt_text, from_crs, to_crs):
    df = spark.createDataFrame([(wkt_text,)], "wkt string") \
        .withColumn("g", st.from_wkt("wkt")) \
        .withColumn("t", transform_geom(F.col("g"), from_crs, to_crs))
    r = df.select(st.x(F.col("t")).alias("x"),
                  st.y(F.col("t")).alias("y")).collect()[0]
    return r.x, r.y


def test_webmercator_roundtrip(spark):
    # authoritative anchor: 1 degree of longitude = 111319.49079327358 m
    # in EPSG:3857 (the published spherical-mercator constant)
    x, y = _one(spark, "POINT (1 0)", "EPSG:4326", "EPSG:3857")
    assert x == pytest.approx(111_319.49079327358, abs=1e-6)
    assert y == pytest.approx(0.0, abs=1e-6)
    # lat 85.06° maps to ~±20037508.34 (the square-world boundary)
    x, y = _one(spark, "POINT (180 85.051128779806)", "EPSG:4326",
                "EPSG:3857")
    assert x == pytest.approx(20_037_508.342789244, abs=1e-3)
    assert y == pytest.approx(20_037_508.34, abs=100.0)
    lon, lat = _one(spark, "POINT (261845.71 6250962.06)", "EPSG:3857",
                    "EPSG:4326")
    x2, y2 = _one(spark, f"POINT ({lon} {lat})", "EPSG:4326", "EPSG:3857")
    assert x2 == pytest.approx(261_845.71, abs=1e-6)
    assert y2 == pytest.approx(6_250_962.06, abs=1e-6)


def test_utm_forward_inverse(spark):
    # UTM 31N of (lon=3, lat=0): central meridian -> x=500000, y=0
    x, y = _one(spark, "POINT (3 0)", "EPSG:4326", "EPSG:32631")
    assert x == pytest.approx(500_000.0, abs=1e-3)
    assert y == pytest.approx(0.0, abs=1e-3)
    # published anchor: WGS84 meridian arc 0°→45° = 4984944.378 m, so
    # (3, 45) in zone 31N → northing = 0.9996 × 4984944.378
    x, y = _one(spark, "POINT (3 45)", "EPSG:4326", "EPSG:32631")
    assert x == pytest.approx(500_000.0, abs=1e-6)
    assert y == pytest.approx(0.9996 * 4_984_944.378, abs=0.5)
    # round-trip precision off the central meridian
    x, y = _one(spark, "POINT (2.2945 48.8584)", "EPSG:4326", "EPSG:32631")
    lon, lat = _one(spark, f"POINT ({x} {y})", "EPSG:32631", "EPSG:4326")
    assert lon == pytest.approx(2.2945, abs=1e-9)
    assert lat == pytest.approx(48.8584, abs=1e-9)


def test_utm_south(spark):
    # Sydney lon=151.2093 lat=-33.8688 → UTM 56S
    x, y = _one(spark, "POINT (151.2093 -33.8688)", "EPSG:4326", "EPSG:32756")
    lon, lat = _one(spark, f"POINT ({x} {y})", "EPSG:32756", "EPSG:4326")
    assert lon == pytest.approx(151.2093, abs=1e-7)
    assert lat == pytest.approx(-33.8688, abs=1e-7)
    assert y > 0  # false northing applied


def test_epsg2263_roundtrip(spark):
    # Manhattan lon=-73.9857 lat=40.7484 (Empire State Building);
    # EPSG:2263 coordinates are in US survey feet ~ (988,223, 211,950)
    x, y = _one(spark, "POINT (-73.9857 40.7484)", "EPSG:4326", "EPSG:2263")
    assert x == pytest.approx(988_200, rel=0.002)
    assert y == pytest.approx(212_000, rel=0.005)
    lon, lat = _one(spark, f"POINT ({x} {y})", "EPSG:2263", "EPSG:4326")
    assert lon == pytest.approx(-73.9857, abs=1e-7)
    assert lat == pytest.approx(40.7484, abs=1e-7)


def test_gdf_to_crs_carries_crs(spark):
    df = spark.createDataFrame([("POINT (0 45)",)], "wkt string") \
        .withColumn("geometry", st.from_wkt("wkt")).drop("wkt")
    g = GeoDataFrame(df)          # default EPSG:4326
    g2 = g.to_crs("EPSG:3857")
    assert g2.crs == "EPSG:3857"
    g3 = g2.to_crs("EPSG:4326")   # wrapper knows from_crs — reference can't
    r = g3.df.select(st.y("geometry").alias("y")).collect()[0]
    assert r.y == pytest.approx(45.0, abs=1e-9)


def test_unknown_crs_raises():
    with pytest.raises(CRSError):
        transform_xy(F.lit(0.0), F.lit(0.0), "EPSG:4326", "EPSG:99999")


def test_area_changes_under_projection(spark):
    # a ~1° square at the equator is ~111km × 111km in web mercator
    df = spark.createDataFrame(
        [("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",)], "wkt string") \
        .withColumn("g", st.from_wkt("wkt")) \
        .withColumn("m", transform_geom(F.col("g"), "EPSG:4326", "EPSG:3857"))
    a = df.select(st.area("m").alias("a")).collect()[0].a
    assert a == pytest.approx(111_319.49 ** 2, rel=0.01)
