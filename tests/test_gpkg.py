"""GeoPackage reader/writer (io.read_geopackage / write_geopackage,
geom/gpkg.py) — GDAL-free via stdlib sqlite3 + the engine's WKB codec.
Format layout per the public OGC GeoPackage Encoding Standard."""

import math
import sqlite3
import struct

import pytest
from pyspark.sql import functions as F

from arctic_spark import GeoDataFrame, st
from arctic_spark.geom import gpkg as G
from arctic_spark.io import read_file, read_geopackage, write_geopackage


def _fixture(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5, True), (2, "b", -2.25, False), (3, None, None, None)],
        "k long, name string, score double, flag boolean")
    # build: point, rectangle polygon, NULL geometry
    gdf = GeoDataFrame(
        df.withColumn("geometry", F.when(
            F.col("k") == 1, st.point(F.lit(1.0), F.lit(2.0)))
            .when(F.col("k") == 2, st.make_envelope(
                F.lit(0.0), F.lit(0.0), F.lit(4.0), F.lit(3.0)))),
        "geometry", "EPSG:4326")
    return gdf


def test_gpkg_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t.gpkg")
    write_geopackage(_fixture(spark), path, layer="feat")

    # spec-level assertions straight off the SQLite file
    con = sqlite3.connect(path)
    app_id = con.execute("PRAGMA application_id").fetchone()[0]
    assert app_id == 0x47504B47  # 'GPKG'
    assert con.execute("SELECT data_type FROM gpkg_contents "
                       "WHERE table_name='feat'").fetchone()[0] \
        == "features"
    assert con.execute("SELECT srs_id FROM gpkg_geometry_columns "
                       "WHERE table_name='feat'").fetchone()[0] == 4326
    blob = con.execute("SELECT geometry FROM feat WHERE k=1").fetchone()[0]
    assert bytes(blob[:2]) == b"GP" and blob[3] & 1  # magic + little
    con.close()

    back = read_geopackage(spark, path)
    assert back.crs == "EPSG:4326"
    rows = {r.k: r for r in back.df.collect()}
    assert rows[1].name == "a" and rows[2].score == -2.25
    assert rows[2].flag is False and rows[3].name is None
    assert rows[3].geometry is None or rows[3].geometry["gt"] is None
    got = back.df.where(F.col("k") == 2).select(
        st.area("geometry").alias("a"),
        st.x(st.centroid("geometry")).alias("cx")).collect()[0]
    assert abs(got.a - 12.0) < 1e-9 and abs(got.cx - 2.0) < 1e-9
    pt = back.df.where(F.col("k") == 1).select(
        st.x("geometry").alias("x"), st.y("geometry").alias("y")) \
        .collect()[0]
    assert (pt.x, pt.y) == (1.0, 2.0)

    # read_file routes .gpkg natively
    via = read_file(spark, path)
    assert via.df.count() == 3


def test_gpkg_overwrite_and_errors(spark, tmp_path):
    path = str(tmp_path / "t2.gpkg")
    write_geopackage(_fixture(spark), path, layer="feat")
    write_geopackage(_fixture(spark), path, layer="feat")  # overwrite ok
    with pytest.raises(ValueError, match="exists"):
        write_geopackage(_fixture(spark), path, layer="feat",
                         mode="errorifexists")
    write_geopackage(_fixture(spark), path, layer="second")
    with pytest.raises(ValueError, match="feature layers"):
        read_geopackage(spark, path)          # ambiguous without layer=
    assert read_geopackage(spark, path, layer="second").df.count() == 3
    with pytest.raises(ValueError, match="not in"):
        read_geopackage(spark, path, layer="nope")


def test_gpkg_blob_variants(spark, tmp_path):
    """Envelope indicators, big-endian headers, and the empty flag all
    parse; a foreign-written gpkg (hand-crafted sqlite) reads back."""
    # little-endian header + 32-byte envelope
    wkb = (b"\x01\x01\x00\x00\x00"
           + struct.pack("<dd", 7.0, 8.0))
    env = struct.pack("<dddd", 7.0, 7.0, 8.0, 8.0)
    blob_env = b"GP" + bytes([0, 0b00000011]) \
        + struct.pack("<i", 4326) + env + wkb
    srs, w = G.parse_gpkg_blob(blob_env)
    assert srs == 4326 and w == wkb
    # big-endian header, no envelope
    blob_be = b"GP" + bytes([0, 0b00000000]) \
        + struct.pack(">i", 4326) + wkb
    srs, w = G.parse_gpkg_blob(blob_be)
    assert srs == 4326 and w == wkb
    # empty-geometry flag
    blob_empty = b"GP" + bytes([0, 0b00010001]) + struct.pack("<i", 0)
    assert G.parse_gpkg_blob(blob_empty) == (0, None)
    with pytest.raises(ValueError):
        G.parse_gpkg_blob(b"XX\x00\x01\x00\x00\x00\x00")

    # hand-crafted gpkg (as a foreign writer would produce)
    path = str(tmp_path / "foreign.gpkg")
    con = sqlite3.connect(path)
    G.init_gpkg(con, srs_id=4326)
    con.execute("CREATE TABLE pts (fid INTEGER PRIMARY KEY, "
                "tag TEXT, geom BLOB)")
    con.execute("INSERT INTO gpkg_contents (table_name, data_type, "
                "identifier, srs_id) VALUES ('pts','features','pts',"
                "4326)")
    con.execute("INSERT INTO gpkg_geometry_columns VALUES "
                "('pts','geom','POINT',4326,0,0)")
    con.execute("INSERT INTO pts (tag, geom) VALUES (?, ?)",
                ("be", blob_env))
    con.commit()
    con.close()
    back = read_geopackage(spark, path)      # geometry renamed to the
    assert back.geometry_column == "geometry"  # engine default
    r = back.df.select("tag", st.x("geometry").alias("x"),
                       st.y("geometry").alias("y")).collect()[0]
    assert r.tag == "be" and (r.x, r.y) == (7.0, 8.0)
    assert back.crs == "EPSG:4326"
