"""Deterministic synthetic datasets replicating the reference's bundled
fixture shapes (FIXTURES.md F1-F7; reference datasets/__init__.py:16-42):
cities (202 points), naturalearth_cities (243 points), lowres-style
polygons (177 mixed poly/multipoly), nybb-style (5 multipolygons in a
projected CRS), the F5 spatial-join pair, and the F7 explode bench shape.

Seeded; generated as Spark DataFrames (WKT → GEOM) so tests and benches
have reference-shaped inputs without shipping binary artifacts.
"""

from __future__ import annotations

import random

from pyspark.sql import SparkSession

from . import functions as st
from .geodataframe import GeoDataFrame
from pyspark.sql import functions as F


def _points_wkt(n, seed, lon_range=(-180, 180), lat_range=(-85, 85)):
    rnd = random.Random(seed)
    return [
        f"POINT ({rnd.uniform(*lon_range):.6f} {rnd.uniform(*lat_range):.6f})"
        for _ in range(n)]


def cities(spark: SparkSession, n=202, seed=1) -> GeoDataFrame:
    """F1 shape: name + Point geometry, EPSG:4326 (202 rows like
    data/cities.arrow)."""
    rows = [(f"city_{i}", w) for i, w in enumerate(_points_wkt(n, seed))]
    df = spark.createDataFrame(rows, "name string, wkt string") \
        .select("name", st.from_wkt("wkt").alias("geometry"))
    return GeoDataFrame(df, crs="EPSG:4326")


def naturalearth_cities(spark: SparkSession, seed=2) -> GeoDataFrame:
    """F2 shape: 243 rows (reference pytest fixture row-count invariant,
    tests/unit/internals/test_geoseries.py:4-5)."""
    return cities(spark, n=243, seed=seed)


def _random_polygon(rnd, cx, cy, r, nv=8):
    import math
    pts = []
    for k in range(nv):
        ang = 2 * math.pi * k / nv
        rr = r * rnd.uniform(0.6, 1.0)
        pts.append((cx + rr * math.cos(ang), cy + rr * math.sin(ang)))
    pts.append(pts[0])
    body = ", ".join(f"{x:.6f} {y:.6f}" for x, y in pts)
    return f"(({body}))"


def lowres_countries(spark: SparkSession, n=177, seed=3) -> GeoDataFrame:
    """F3 shape: mixed Polygon/MultiPolygon with numeric + string
    attributes (177 rows like naturalearth_lowres)."""
    rnd = random.Random(seed)
    continents = ["Africa", "Asia", "Europe", "Oceania",
                  "North America", "South America"]
    rows = []
    for i in range(n):
        cx, cy = rnd.uniform(-160, 160), rnd.uniform(-70, 70)
        if i % 3 == 0:  # MultiPolygon
            body = ", ".join(
                _random_polygon(rnd, cx + dx, cy, rnd.uniform(1, 4))
                for dx in (0, 8))
            wkt = f"MULTIPOLYGON ({body})"
        else:
            wkt = "POLYGON " + _random_polygon(rnd, cx, cy, rnd.uniform(1, 6))
        rows.append((float(rnd.randrange(10**5, 10**9)),
                     continents[i % len(continents)], f"country_{i}",
                     f"C{i:03d}", float(rnd.randrange(10**3, 10**7)), wkt))
    df = spark.createDataFrame(
        rows, "pop_est double, continent string, name string, "
              "iso_a3 string, gdp_md_est double, wkt string") \
        .select("pop_est", "continent", "name", "iso_a3", "gdp_md_est",
                st.from_wkt("wkt").alias("geometry"))
    return GeoDataFrame(df, crs="EPSG:4326")


def nybb(spark: SparkSession, seed=4) -> GeoDataFrame:
    """F4 shape: 5 boroughs, MultiPolygon, projected CRS EPSG:2263."""
    rnd = random.Random(seed)
    names = ["Staten Island", "Queens", "Brooklyn", "Manhattan", "Bronx"]
    rows = []
    for i, nm in enumerate(names):
        cx = 950_000 + i * 30_000 + rnd.uniform(0, 5_000)
        cy = 150_000 + i * 25_000 + rnd.uniform(0, 5_000)
        body = ", ".join(_random_polygon(rnd, cx + dx, cy, 12_000, 10)
                         for dx in (0, 26_000))
        rows.append((i + 1, nm, f"MULTIPOLYGON ({body})"))
    df = spark.createDataFrame(rows, "BoroCode int, BoroName string, wkt string") \
        .select("BoroCode", "BoroName", st.from_wkt("wkt").alias("geometry"))
    return GeoDataFrame(df, crs="EPSG:2263")


def f5_join_fixture(spark: SparkSession):
    """The reference's Rust spatial-join test data verbatim
    (spatial_index.rs:434-456)."""
    pts = [(0.0, 10.0), (1.0, 1.0), (10.0, 1.0), (1.0, -1.0), (0.0, -10.0),
           (-1.0, -1.0), (-10.0, 0.0), (-1.0, 1.0), (0.0, 10.0)]
    points = spark.createDataFrame(
        [(float(i + 1), x, y) for i, (x, y) in enumerate(pts)],
        "point_values double, x double, y double") \
        .select("point_values", st.point(F.col("x"), F.col("y"))
                .alias("geometry"))
    polys = spark.createDataFrame(
        [("test", "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))")],
        "string_col string, wkt string") \
        .select("string_col", st.from_wkt("wkt").alias("geometry"))
    return GeoDataFrame(points), GeoDataFrame(polys)


def explode_bench(spark: SparkSession, n=45_000, seed=5) -> GeoDataFrame:
    """F7 shape: n 2-point MultiPoints (geopolars/benches/explode.rs:10-20
    uses 45k) — built natively from a range, no WKT parsing cost."""
    df = spark.range(n).select(
        F.col("id"),
        st.geom_struct(
            F.lit(4),
            F.array((F.col("id") % 360 - 180).cast("double"),
                    ((F.col("id") + 7) % 360 - 180).cast("double")),
            F.array((F.col("id") % 170 - 85).cast("double"),
                    ((F.col("id") + 3) % 170 - 85).cast("double")),
            F.array(F.lit(1), F.lit(1)),
            F.array(F.lit(1), F.lit(1))).alias("geometry"))
    return GeoDataFrame(df)


# ---------------------------------------------------------------------------
# Reference dataset-loader API parity (r10): geopolars.datasets exposes
# `available` and `get_path(name)` over bundled Arrow IPC files
# (py-geopolars/python/geopolars/datasets/__init__.py:8-42). This repo
# ships no binary artifacts, so get_path resolves the reference
# checkout's actual files when present; load_dataset falls back to the
# seeded synthetic same-shape twins above otherwise.
# ---------------------------------------------------------------------------

#: reference datasets/__init__.py:11
available = ("naturalearth_cities", "nybb", "naturalearth_lowres")

#: Directory of the reference checkout's bundled .arrow files.
#: Resolved from $ARCTIC_SPARK_REF_DATA so the shipped library carries
#: no machine-specific absolute path (ADVICE r10); the dev-box default
#: points at the local read-only reference mount used by the parity
#: fixtures.
def _ref_dataset_dir() -> str:
    import os
    return os.environ.get(
        "ARCTIC_SPARK_REF_DATA",
        "/root/reference/py-geopolars/python/geopolars/datasets")


def get_path(dataset: str) -> str:
    """Path of the named bundled dataset's .arrow file (reference
    ``datasets.get_path``, datasets/__init__.py:16-42 — same error
    message shape for unknown names). Depends on an external dataset
    mount located via ``$ARCTIC_SPARK_REF_DATA``; when the mount is
    absent use :func:`load_dataset`, which falls back to the
    deterministic synthetic twins."""
    import os
    if dataset not in available:
        raise ValueError(
            f"The dataset '{dataset}' is not available. "
            f"Available datasets are {', '.join(available)}")
    p = os.path.join(_ref_dataset_dir(), f"{dataset}.arrow")
    if os.path.exists(p):
        return p
    raise FileNotFoundError(
        f"bundled dataset file {p} not found (this repo ships no "
        "binary artifacts); use load_dataset() for the synthetic "
        "same-shape twin")


def load_dataset(spark: SparkSession, dataset: str) -> GeoDataFrame:
    """GeoDataFrame for a named dataset: the reference's ACTUAL bundled
    .arrow file via :func:`arctic_spark.io.read_ipc` when the checkout
    is present (naturalearth_cities 243 rows, nybb 5 @ EPSG:2263,
    naturalearth_lowres 177 — the reference conftest's fixture shapes),
    else the deterministic synthetic twin of the same shape."""
    try:
        path = get_path(dataset)
    except FileNotFoundError:
        gen = {"naturalearth_cities": naturalearth_cities,
               "nybb": nybb,
               "naturalearth_lowres": lowres_countries}[dataset]
        return gen(spark)
    from .io import read_ipc
    return read_ipc(spark, path)
