"""Karney geodesic inverse (round 6, geom/geodesic.py) against the
published test values of Karney, 'Algorithms for geodesics' (2013), the
standard WGS84 circumference constants, and Vincenty cross-validation.
method='geodesic' no longer aliases Vincenty and has no antipodal
fallback branch."""

import numpy as np
import pytest

from arctic_spark.geom.geodesic import inverse


def test_published_karney_values():
    # Karney 2013 Table 2 (short inverse): s12 = 4.944208 m
    assert inverse([0], [-30.12345], [0.00005], [-30.12344])[0] == \
        pytest.approx(4.944208, abs=1e-6)
    # Karney 2013 Table 3 (near-antipodal inverse): 19989832.827610 m
    assert inverse([0], [-30.0], [179.8], [29.9])[0] == \
        pytest.approx(19989832.827610, abs=1e-6)


def test_wgs84_circumference_constants():
    a = 6378137.0
    # quarter equator
    assert inverse([0], [0], [90], [0])[0] == \
        pytest.approx(a * np.pi / 2, abs=1e-6)
    # meridian quarter (equator to pole): 10001965.7293 m
    assert inverse([0], [0], [0], [90])[0] == \
        pytest.approx(10001965.7293, abs=1e-3)
    # exactly antipodal on the equator: the geodesic runs over the pole,
    # twice the meridian quarter
    assert inverse([0], [0], [180], [0])[0] == \
        pytest.approx(2 * 10001965.72931, abs=1e-3)


def test_matches_vincenty_away_from_antipode():
    from arctic_spark.functions.udfs import _vincenty_inverse
    rng = np.random.default_rng(11)
    n = 2000
    lon1 = rng.uniform(-180, 180, n)
    lat1 = rng.uniform(-85, 85, n)
    lon2 = rng.uniform(-180, 180, n)
    lat2 = rng.uniform(-85, 85, n)
    k = inverse(lon1, lat1, lon2, lat2)
    v = _vincenty_inverse(lon1, lat1, lon2, lat2)
    lam = np.abs((lon2 - lon1 + 180) % 360 - 180)
    anti = (lam > 178.5) & (np.abs(lat1 + lat2) < 1.5)
    assert np.abs(k - v)[~anti].max() < 1e-3   # sub-millimeter agreement


def test_antipodal_region_continuity():
    """No fallback discontinuity: distance is smooth through the
    equatorial-lune boundary λ = (1−f)·180° ≈ 179.3964°."""
    lams = np.linspace(179.0, 180.0, 101)
    d = inverse(np.zeros_like(lams), np.zeros_like(lams),
                lams, np.zeros_like(lams))
    steps = np.diff(d)
    assert (steps > 0).all()              # monotone approach
    # equatorial gradient is ≈111.3 km/deg → ≈1113 m per 0.01° step; a
    # fallback seam would jump by tens of km
    assert steps.max() < 1500
    assert d[-1] == pytest.approx(20003931.4586, abs=1e-3)


def test_degenerate_and_symmetry():
    assert inverse([10], [45], [10], [45])[0] == 0.0
    a = inverse([3], [50], [-70], [-10])[0]
    b = inverse([-70], [-10], [3], [50])[0]
    assert a == pytest.approx(b, abs=1e-6)
    # latitude-negation symmetry
    c = inverse([3], [-50], [-70], [10])[0]
    assert a == pytest.approx(c, abs=1e-6)


def test_spark_geodesic_method(spark):
    """st.geodesic_length(method='geodesic') runs Karney end-to-end,
    including an antipodal segment Vincenty cannot do."""
    from pyspark.sql import functions as F

    from arctic_spark import st
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 180.0, 0.0), (2, 0.0, 0.0, 90.0, 0.0)],
        "id int, x1 double, y1 double, x2 double, y2 double") \
        .select("id", st.make_line(F.array("x1", "x2"),
                                   F.array("y1", "y2")).alias("g"))
    rows = {r.id: r.m for r in df.select(
        "id", st.geodesic_length("g", "geodesic").alias("m")).collect()}
    assert rows[1] == pytest.approx(20003931.4586, abs=1e-3)
    assert rows[2] == pytest.approx(6378137.0 * np.pi / 2, abs=1e-5)
