"""Z-order spatial clustering: key correctness vs a python Morton
reference, and write_geoparquet(spatial_sort=...) producing spatially
compact files (tight per-file bbox stats)."""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from arctic_spark import GeoDataFrame, st
from arctic_spark.io import read_geoparquet, write_geoparquet


def _morton(qx, qy):
    out = 0
    for i in range(16):
        out |= ((qy >> i) & 1) << (2 * i)
        out |= ((qx >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_reference(spark):
    rows = [(i, (i * 37) % 100 / 10.0, (i * 53) % 100 / 10.0)
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    extent = (0.0, 0.0, 10.0, 10.0)
    got = {r.id: r.z for r in df.select(
        "id", st.zorder_key("x", "y", extent).alias("z")).collect()}
    n = (1 << 16) - 1
    for i, x, y in rows:
        qx = min(max(int((x - 0.0) / 10.0 * n), 0), n)
        qy = min(max(int((y - 0.0) / 10.0 * n), 0), n)
        assert got[i] == _morton(qx, qy), (i, x, y)


def test_zorder_key_clamps_and_orders(spark):
    df = spark.createDataFrame(
        [(1, -5.0, -5.0), (2, 15.0, 15.0), (3, 0.0, 0.0)],
        "id long, x double, y double")
    ext = (0.0, 0.0, 10.0, 10.0)
    r = {x.id: x.z for x in df.select(
        "id", st.zorder_key("x", "y", ext).alias("z")).collect()}
    assert r[1] == 0               # clamped to min corner
    assert r[2] == (1 << 32) - 1   # clamped to max corner
    assert r[3] == 0


def test_spatial_sort_write_clusters_files(spark, tmp_path):
    # scattered points over a 100x100 extent
    df = (spark.range(0, 4000)
          .withColumn("x", (F.col("id") * 137 % 1000) / 10.0)
          .withColumn("y", (F.col("id") * 401 % 1000) / 10.0)
          .withColumn("geometry", st.point(F.col("x"), F.col("y")))
          .drop("x", "y"))
    gdf = GeoDataFrame(df)
    p_plain = str(tmp_path / "plain")
    p_sorted = str(tmp_path / "zsorted")
    write_geoparquet(gdf, p_plain)
    write_geoparquet(gdf, p_sorted, spatial_sort="z", sort_partitions=8)

    def file_spans(path):
        spans = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.read_metadata(f)
            lo, hi = float("inf"), float("-inf")
            nrows = 0
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                nrows += g.num_rows
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    if col.path_in_schema == "bbox_xmin" and \
                            col.statistics is not None:
                        lo = min(lo, col.statistics.min)
                        hi = max(hi, col.statistics.max)
            if nrows > 0 and lo <= hi:
                spans.append(hi - lo)
        return spans

    plain = file_spans(p_plain)
    zs = file_spans(p_sorted)
    assert plain and zs
    # round-robin layout: every file spans ~the full extent; z-sorted
    # files cover compact regions
    assert sum(zs) / len(zs) < 0.6 * sum(plain) / len(plain)

    # content unchanged
    back = read_geoparquet(spark, p_sorted)
    assert back.df.count() == 4000
    ids = sorted(r.id for r in back.df.select("id").collect())
    assert ids == list(range(4000))


def test_spatial_sort_explicit_extent_and_validation(spark, tmp_path):
    df = (spark.range(0, 100)
          .withColumn("geometry", st.point(F.col("id").cast("double"),
                                           F.lit(0.0))))
    gdf = GeoDataFrame(df)
    write_geoparquet(gdf, str(tmp_path / "e"), spatial_sort=(0, 0, 100, 1),
                     sort_partitions=2)
    assert read_geoparquet(spark, str(tmp_path / "e")).df.count() == 100
    with pytest.raises(ValueError):
        write_geoparquet(gdf, str(tmp_path / "bad"), spatial_sort="hilbert")


def test_geohash_published_values(spark):
    """st.geohash matches published geohash values (Wikipedia examples);
    decode returns the exact cell center; out-of-range clamps."""
    from pyspark.sql import functions as F
    rows = [(0, 10.40744, 57.64911, "u4pruydqqvj8"),
            (1, -5.6, 42.6, "ezs42"),
            (2, -49.265506, -25.382708, "6gkzwgjzn820"),
            (3, 180.0, 90.0, "zzzzzzzzzzzz"),
            (4, -180.0, -90.0, "000000000000")]
    df = spark.createDataFrame(rows, "id int, lon double, lat double, exp string")
    out = {r.id: r for r in df.select(
        "id", "exp",
        st.geohash(F.col("lon"), F.col("lat"), 12).alias("g12"),
        st.geohash(F.col("lon"), F.col("lat"), 5).alias("g5")).collect()}
    assert out[0].g12 == "u4pruydqqvj8"
    assert out[1].g5 == "ezs42"
    assert out[2].g12 == "6gkzwgjzn820"
    assert out[3].g12 == "zzzzzzzzzzzz" and out[4].g12 == "000000000000"
    # decode: center of the p=12 cell re-encodes to the same hash, and
    # is within the cell's span of the original point
    lon, lat = st.geohash_decode(F.col("g12"), 12)
    d = df.select("id", "lon", "lat",
                  st.geohash(F.col("lon"), F.col("lat"), 12).alias("g12")) \
        .select("id", "lon", "lat", lon.alias("dlon"), lat.alias("dlat"),
                st.geohash(lon, lat, 12).alias("re")) \
        .collect()
    for r in d:
        assert abs(r.dlon - r.lon) <= 360.0 / (1 << 30)
        assert abs(r.dlat - r.lat) <= 180.0 / (1 << 30)
    # native plan: no python workers in either direction
    plan = df.select(st.geohash(F.col("lon"), F.col("lat"), 8).alias("g")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_geom_geohash(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(1, "POLYGON ((10 50, 11 50, 11 51, 10 51, 10 50))")],
                               "id int, wkt string") \
        .withColumn("g", st.from_wkt("wkt"))
    r = df.select(st.geom_geohash("g", 6).alias("gh"),
                  st.geohash(F.lit(10.5), F.lit(50.5), 6).alias("c")).collect()[0]
    assert r.gh == r.c


def test_hex_key_nearest_center(spark):
    """hex_key assigns every point to the hexagon whose center is
    nearest (the defining property of the bin); centers round-trip; the
    plan is pure JVM."""
    import math, random
    from pyspark.sql import functions as F
    S = 2.0
    random.seed(7)
    pts = [(random.uniform(-8, 8), random.uniform(-8, 8))
           for _ in range(300)]
    pdf = spark.createDataFrame(pts, "x double, y double")
    k = st.hex_key(F.col("x"), F.col("y"), S)
    hx, hy = st.hex_center(k["q"], k["r"], S)
    got = pdf.select("x", "y", hx.alias("cx"), hy.alias("cy")).collect()
    centers = [(S * math.sqrt(3) * (q + r / 2), S * 1.5 * r)
               for q in range(-20, 21) for r in range(-20, 21)]
    for row in got:
        d_assigned = math.hypot(row.x - row.cx, row.y - row.cy)
        d_best = min(math.hypot(row.x - cx, row.y - cy)
                     for cx, cy in centers)
        assert d_assigned - d_best <= 1e-9
    plan = pdf.select(k.alias("k")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
