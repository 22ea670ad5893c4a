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


def test_lambert93_center_and_roundtrip(spark):
    # Lambert-93 projection center (3°E, 46.5°N) → exactly (FE, FN)
    x, y = _one(spark, "POINT (3 46.5)", "EPSG:4326", "EPSG:2154")
    assert x == pytest.approx(700_000.0, abs=1e-6)
    assert y == pytest.approx(6_600_000.0, abs=1e-6)
    # Paris — coarse published anchor (±1 km) + exact round-trip
    x, y = _one(spark, "POINT (2.3522 48.8566)", "EPSG:4326", "EPSG:2154")
    assert x == pytest.approx(652_000, abs=2_000)
    assert y == pytest.approx(6_862_000, abs=2_000)
    lon, lat = _one(spark, f"POINT ({x} {y})", "EPSG:2154", "EPSG:4326")
    assert lon == pytest.approx(2.3522, abs=1e-9)
    assert lat == pytest.approx(48.8566, abs=1e-9)


def test_osgb_datum_shift_roundtrip(spark):
    # grid origin (49°N 2°W on OSGB36 datum) → exactly (FE, FN): inverse
    # starts from the projected origin so no datum shift is involved there
    lon, lat = _one(spark, "POINT (400000 -100000)", "EPSG:27700",
                    "EPSG:27700")
    # full WGS84 round-trip THROUGH the Helmert shift (both directions)
    x, y = _one(spark, "POINT (-0.1276 51.5074)", "EPSG:4326", "EPSG:27700")
    assert x == pytest.approx(530_000, abs=2_000)   # London ~ TQ 30 80
    assert y == pytest.approx(180_500, abs=2_000)
    # negated-parameter Helmert inverse carries an O(s^2) ~3-5 mm error
    # (20.5 ppm scale term), the standard position-vector convention
    lon, lat = _one(spark, f"POINT ({x} {y})", "EPSG:27700", "EPSG:4326")
    assert lon == pytest.approx(-0.1276, abs=1e-7)  # ~1 cm
    assert lat == pytest.approx(51.5074, abs=1e-7)


def test_laea_europe_center_and_roundtrip(spark):
    # EPSG:3035 center (10°E, 52°N) → exactly (FE, FN) = (4321000, 3210000)
    x, y = _one(spark, "POINT (10 52)", "EPSG:4326", "EPSG:3035")
    assert x == pytest.approx(4_321_000.0, abs=1e-6)
    assert y == pytest.approx(3_210_000.0, abs=1e-6)
    x, y = _one(spark, "POINT (24.9384 60.1699)", "EPSG:4326", "EPSG:3035")
    lon, lat = _one(spark, f"POINT ({x} {y})", "EPSG:3035", "EPSG:4326")
    assert lon == pytest.approx(24.9384, abs=1e-8)
    assert lat == pytest.approx(60.1699, abs=1e-8)


def test_ed50_utm_datum_shift(spark):
    # ED50/UTM31 vs WGS84/UTM31 differ by the ED50 3-param shift (~200 m
    # in western Europe); round-trip through the shift is exact
    xw, yw = _one(spark, "POINT (5 52)", "EPSG:4326", "EPSG:32631")
    xe, ye = _one(spark, "POINT (5 52)", "EPSG:4326", "EPSG:23031")
    d = ((xw - xe) ** 2 + (yw - ye) ** 2) ** 0.5
    assert 50 < d < 400
    lon, lat = _one(spark, f"POINT ({xe} {ye})", "EPSG:23031", "EPSG:4326")
    assert lon == pytest.approx(5.0, abs=1e-7)
    assert lat == pytest.approx(52.0, abs=1e-7)


def test_any_to_any_routing_matches_hub_composition(spark):
    # 3857 → 2154 directly must equal 3857 → 4326 → 2154 step-wise
    x1, y1 = _one(spark, "POINT (261845.71 6250962.06)", "EPSG:3857",
                  "EPSG:2154")
    lon, lat = _one(spark, "POINT (261845.71 6250962.06)", "EPSG:3857",
                    "EPSG:4326")
    x2, y2 = _one(spark, f"POINT ({lon} {lat})", "EPSG:4326", "EPSG:2154")
    assert x1 == pytest.approx(x2, abs=1e-9)
    assert y1 == pytest.approx(y2, abs=1e-9)


def test_state_plane_ftus(spark):
    # NAD83 / California zone 5 (EPSG:2229, US survey feet): LA city hall
    x, y = _one(spark, "POINT (-118.2437 34.0522)", "EPSG:4326", "EPSG:2229")
    assert x == pytest.approx(6_487_000, abs=10_000)  # ~6.49M ftUS
    lon, lat = _one(spark, f"POINT ({x} {y})", "EPSG:2229", "EPSG:4326")
    assert lon == pytest.approx(-118.2437, abs=1e-8)
    assert lat == pytest.approx(34.0522, abs=1e-8)


def test_etrs89_utm(spark):
    # EPSG:25832 central meridian 9°E scaling: (9, 0) → (500000, 0)
    x, y = _one(spark, "POINT (9 0)", "EPSG:4326", "EPSG:25832")
    assert x == pytest.approx(500_000.0, abs=1e-3)
    assert y == pytest.approx(0.0, abs=1e-3)


def test_area_changes_under_projection(spark):
    # a ~1° square at the equator is ~111km × 111km in web mercator
    df = spark.createDataFrame(
        [("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",)], "wkt string") \
        .withColumn("g", st.from_wkt("wkt")) \
        .withColumn("m", transform_geom(F.col("g"), "EPSG:4326", "EPSG:3857"))
    a = df.select(st.area("m").alias("a")).collect()[0].a
    assert a == pytest.approx(111_319.49 ** 2, rel=0.01)


def test_aea_snyder_control_point(spark):
    # Snyder 1987 numerical example for the ellipsoidal Albers (pp.
    # 291-294): Clarke 1866, standard parallels 29.5/45.5, origin
    # (23N, 96W); the point (35N, 75W) maps to x = 1885472.7,
    # y = 1535925.0 m. Registered here as a test-only CRS so the
    # kernel is checked against the published worked example.
    from arctic_spark import proj
    clarke = (6378206.4, 294.978698214)
    proj._EPSG_TABLE[909991] = ("aea", {
        "lat1": 29.5, "lat2": 45.5, "lat0": 23.0, "lon0": -96.0,
        "fe": 0.0, "fn": 0.0, "ellps": clarke})
    try:
        x, y = _one(spark, "POINT (-75 35)", "EPSG:4326", "EPSG:909991")
        assert x == pytest.approx(1_885_472.7, abs=0.5)
        assert y == pytest.approx(1_535_925.0, abs=0.5)
    finally:
        del proj._EPSG_TABLE[909991]


def test_conus_albers_5070(spark):
    # projection origin (96W, 23N) maps exactly to (FE, FN) = (0, 0)
    x, y = _one(spark, "POINT (-96 23)", "EPSG:4326", "EPSG:5070")
    assert x == pytest.approx(0.0, abs=1e-6)
    assert y == pytest.approx(0.0, abs=1e-6)
    # Denver, round trip to 1e-9 degrees
    x, y = _one(spark, "POINT (-104.9903 39.7392)", "EPSG:4326",
                "EPSG:5070")
    lon, lat = _one(spark, f"POINT ({x} {y})", "EPSG:5070", "EPSG:4326")
    assert lon == pytest.approx(-104.9903, abs=1e-9)
    assert lat == pytest.approx(39.7392, abs=1e-9)
    # scale along a standard parallel is 1: a 0.1-deg lon step at
    # lat1 = 29.5N projects to a chord of a * m(29.5) * dlam meters
    import math
    from arctic_spark.proj import _ell, _GRS80
    a, f, e2, e = _ell(_GRS80)
    p1 = math.radians(29.5)
    m1 = math.cos(p1) / math.sqrt(1 - e2 * math.sin(p1) ** 2)
    expect = a * m1 * math.radians(0.1)
    x1, y1 = _one(spark, "POINT (-96 29.5)", "EPSG:4326", "EPSG:5070")
    x2, y2 = _one(spark, "POINT (-95.9 29.5)", "EPSG:4326", "EPSG:5070")
    chord = math.hypot(x2 - x1, y2 - y1)
    assert chord == pytest.approx(expect, rel=1e-7)


def test_australian_albers_3577_southern_cone(spark):
    # n < 0 branch (both standard parallels in the south): origin and
    # round trip over Sydney / Perth / Darwin
    x, y = _one(spark, "POINT (132 0)", "EPSG:4326", "EPSG:3577")
    assert x == pytest.approx(0.0, abs=1e-6)
    assert y == pytest.approx(0.0, abs=1e-6)
    for lon0, lat0 in [(151.2093, -33.8688), (115.8605, -31.9505),
                       (130.8456, -12.4634)]:
        x, y = _one(spark, f"POINT ({lon0} {lat0})", "EPSG:4326",
                    "EPSG:3577")
        lon, lat = _one(spark, f"POINT ({x} {y})", "EPSG:3577",
                        "EPSG:4326")
        assert lon == pytest.approx(lon0, abs=1e-9)
        assert lat == pytest.approx(lat0, abs=1e-9)


def test_belgian_lambert72_datum_roundtrip(spark):
    # BD72 / Belgian Lambert 72: LCC 2SP with lat0 = 90 (rho0 = 0) and
    # a full 7-parameter datum shift. Round trip through the Helmert
    # chain must close to 1e-6 deg (~0.1 mm), and the datum shift must
    # actually move the result ~100 m vs a datum-less interpretation.
    x, y = _one(spark, "POINT (4.3517 50.8466)", "EPSG:4326",
                "EPSG:31370")
    # Brussels lands in the published neighborhood of the grid
    assert x == pytest.approx(148_860, abs=2_000)
    assert y == pytest.approx(170_800, abs=2_000)
    lon, lat = _one(spark, f"POINT ({x} {y})", "EPSG:31370", "EPSG:4326")
    assert lon == pytest.approx(4.3517, abs=1e-6)
    assert lat == pytest.approx(50.8466, abs=1e-6)
    # same grid WITHOUT the datum step lands ~100 m away
    from arctic_spark import proj
    nd = dict(proj._EPSG_TABLE[31370][1])
    nd.pop("datum")
    proj._EPSG_TABLE[909992] = ("lcc", nd)
    try:
        x2, y2 = _one(spark, "POINT (4.3517 50.8466)", "EPSG:4326",
                      "EPSG:909992")
        import math
        assert 30 < math.hypot(x2 - x, y2 - y) < 300
    finally:
        del proj._EPSG_TABLE[909992]


def test_geographic_datum_aliases(spark):
    # NAD83/ETRS89/GDA94 geographic CRS route through the lon/lat hub
    # (documented ~1-2 m null-transform convention): a NAD83 point
    # projects into a NAD83 State Plane zone identically to 4326 input
    x1, y1 = _one(spark, "POINT (-76.5 40.0)", "EPSG:4269", "EPSG:32118")
    x2, y2 = _one(spark, "POINT (-76.5 40.0)", "EPSG:4326", "EPSG:32118")
    assert x1 == x2 and y1 == y2
    lon, lat = _one(spark, f"POINT ({x1} {y1})", "EPSG:32118",
                    "EPSG:4269")
    assert lon == pytest.approx(-76.5, abs=1e-9)
    assert lat == pytest.approx(40.0, abs=1e-9)
