"""Z-preserving WKB round-trip + real z/has_z accessors (r12, VERDICT
r11 #4): ISO/EWKB Z ingests into the optional 6-field Z geometry
struct (nullable zs array) instead of lossy-dropping; the compute
kernels stay 2D (predicates planar, like the reference's); st.force_2d
is the explicit projection back to the plain struct."""

import struct

import pytest
from pyspark.sql import functions as F

from arctic_spark import GeoDataFrame, st
from arctic_spark import io as aio
from arctic_spark.geom import wkb as W


def _wkb_point_z(x, y, z):
    return b"\x01" + struct.pack("<I", 1001) + struct.pack("<ddd",
                                                           x, y, z)


def _wkb_line_z(coords):
    return (b"\x01" + struct.pack("<I", 1002)
            + struct.pack("<I", len(coords))
            + b"".join(struct.pack("<ddd", *c) for c in coords))


def _wkb_poly_z(rings):
    out = [b"\x01", struct.pack("<I", 1003), struct.pack("<I",
                                                         len(rings))]
    for r in rings:
        out.append(struct.pack("<I", len(r)))
        out.extend(struct.pack("<ddd", *c) for c in r)
    return b"".join(out)


def test_decode_z_and_roundtrip_codec():
    """Codec level: point/line/polygon WKB Z → ragged+zs → ISO WKB Z
    byte-identical."""
    ring = [(0.0, 0.0, 1.0), (4.0, 0.0, 2.0), (4.0, 4.0, 3.0),
            (0.0, 0.0, 1.0)]
    bufs = [_wkb_point_z(1.5, 2.5, 3.5),
            _wkb_line_z([(0, 0, 10.0), (1, 1, 11.0), (2, 0, 12.0)]),
            _wkb_poly_z([ring]),
            None,
            W.encode_geom(0, [7.0], [8.0], [1], [1])]   # 2D point
    rg, zs, had_z = W.decode_z(bufs)
    assert list(had_z) == [True, True, True, False, False]
    assert zs[0] == 3.5
    assert list(zs[1:4]) == [10.0, 11.0, 12.0]
    # re-encode geometry 0-2 with Z → byte-identical ISO WKB Z
    for i in range(3):
        t, xs, ys, rings, parts = rg.geom(i)
        c0, c1 = rg.coord_offsets[i], rg.coord_offsets[i + 1]
        enc = W.encode_geom_z(int(t), xs, ys, zs[c0:c1], rings, parts)
        assert enc == bufs[i], i
    # EWKB Z flag decodes identically to ISO
    ewkb = b"\x01" + struct.pack("<I", 0x80000001) \
        + struct.pack("<ddd", 1.5, 2.5, 3.5)
    rg2, zs2, hz2 = W.decode_z([ewkb])
    assert hz2[0] and zs2[0] == 3.5


def test_from_wkb_keep_z_and_accessors(spark):
    rows = [(1, _wkb_point_z(10.0, 20.0, 30.5)),
            (2, W.encode_geom(0, [7.0], [8.0], [1], [1])),   # 2D
            (3, None),
            (4, _wkb_line_z([(0, 0, 1.0), (1, 1, 2.0)]))]
    df = spark.createDataFrame(rows, "k long, wkb binary") \
        .withColumn("g", st.from_wkb("wkb", keep_z=True))
    assert [f.name for f in df.schema["g"].dataType.fields] == \
        ["gt", "xs", "ys", "rings", "parts", "zs"]
    got = {r.k: (r.z, r.h) for r in df.select(
        "k", st.z("g", carries_z=True).alias("z"),
        st.has_z("g", carries_z=True).alias("h")).collect()}
    assert got[1] == (30.5, True)
    assert got[2] == (None, False)
    assert got[3] == (None, None)
    assert got[4] == (None, True)     # z is a POINT accessor
    # 2D kernels analyze + compute against the Z struct (by-name)
    xy = df.where("k = 1").select(
        st.x("g").alias("x"), st.y("g").alias("y")).collect()[0]
    assert (xy.x, xy.y) == (10.0, 20.0)
    # default from_wkb still rejects Z; force_2d still drops it
    with pytest.raises(Exception, match="Z/M"):
        spark.createDataFrame(rows, "k long, wkb binary") \
            .select(st.from_wkb("wkb").alias("g")).collect()
    with pytest.raises(ValueError, match="mutually exclusive"):
        st.from_wkb("wkb", force_2d=True, keep_z=True)


def test_to_wkb_z_roundtrip_sql(spark):
    """Full in-engine round-trip: WKB Z → Z struct → to_wkb → ISO WKB
    Z → Z struct, values identical; 2D cells stay plain WKB."""
    rows = [(1, _wkb_point_z(1.0, 2.0, 3.0)),
            (2, _wkb_poly_z([[(0, 0, 5.0), (2, 0, 6.0), (1, 2, 7.0),
                              (0, 0, 5.0)]])),
            (3, W.encode_geom(1, [0.0, 1.0], [0.0, 1.0], [2], [1]))]
    df = spark.createDataFrame(rows, "k long, wkb binary") \
        .withColumn("g", st.from_wkb("wkb", keep_z=True)) \
        .withColumn("back", st.to_wkb(F.col("g")))
    got = {r.k: bytes(r.back) for r in df.collect()}
    assert got[1] == rows[0][1]
    assert got[2] == rows[1][1]
    assert got[3] == rows[2][1]       # 2D cell round-trips as 2D


def test_force_2d_and_point_z(spark):
    df = spark.range(3).select(
        "id",
        st.point_z(F.col("id").cast("double"),
                   F.col("id").cast("double") + 1.0,
                   F.col("id").cast("double") * 10.0).alias("g"))
    r = df.select(
        st.z("g", carries_z=True).alias("z"),
        st.has_z("g", carries_z=True).alias("h"),
        st.force_2d("g").alias("f")).collect()
    assert [x.z for x in r] == [0.0, 10.0, 20.0]
    assert all(x.h for x in r)
    flat = df.select(st.force_2d("g").alias("f"))
    assert [f.name for f in flat.schema["f"].dataType.fields] == \
        ["gt", "xs", "ys", "rings", "parts"]
    # force_2d also analyzes on plain 2D structs (no-op projection)
    two = spark.range(1).select(st.point(F.lit(1.0), F.lit(2.0))
                                .alias("g"))
    assert two.select(st.force_2d("g").alias("f")).collect()[0] \
        .f.xs == [1.0]


def test_geoparquet_z_roundtrip(spark, tmp_path):
    p = str(tmp_path / "z.parquet")
    src = spark.createDataFrame(
        [(i, float(i), float(i + 1), float(i * 100)) for i in range(5)],
        "k long, x double, y double, zv double") \
        .select("k", st.point_z(F.col("x"), F.col("y"),
                                F.col("zv")).alias("geometry"))
    aio.write_geoparquet(GeoDataFrame(src, crs="EPSG:4326"), p)
    back = aio.read_geoparquet(spark, p, keep_z=True)
    got = sorted((r.k, r.z) for r in back.df.select(
        "k", st.z("geometry", carries_z=True).alias("z")).collect())
    assert got == [(i, float(i * 100)) for i in range(5)]
    # default read drops Z into the plain 2D struct
    flat = aio.read_geoparquet(spark, p)
    assert [f.name for f in
            flat.df.schema["geometry"].dataType.fields] == \
        ["gt", "xs", "ys", "rings", "parts"]


def test_gpkg_z_roundtrip(spark, tmp_path):
    """GeoPackage 3D layers: blobs carry standard WKB Z (the engine's
    gpkg writer is 2D, so craft the 3D blobs directly);
    read_geopackage(keep_z=True) surfaces z, and the default read
    DROPS Z into the 2D struct (previously 3D layers errored —
    no force_2d reached the codec)."""
    import sqlite3
    p2 = str(tmp_path / "flat.gpkg")
    src = spark.createDataFrame(
        [(i, f"POINT ({i} {i})") for i in range(3)],
        "k long, wkt string").select(
        "k", st.from_wkt("wkt").alias("geometry"))
    aio.write_geopackage(GeoDataFrame(src, crs="EPSG:4326"), p2,
                         layer="t")
    # swap each blob payload for a 3D WKB Z point
    con = sqlite3.connect(p2)
    rows = con.execute('SELECT fid, k FROM "t"').fetchall()
    for fid, k in rows:
        blob = con.execute(
            'SELECT geometry FROM "t" WHERE fid = ?',
            (fid,)).fetchone()[0]
        hdr_len = len(blob) - 21          # GP header + 2D point WKB
        new = bytes(blob[:hdr_len]) + _wkb_point_z(
            float(k), float(k), float(k) * 7.0)
        con.execute('UPDATE "t" SET geometry = ? WHERE fid = ?',
                    (new, fid))
    con.commit()
    con.close()
    out = aio.read_geopackage(spark, p2, keep_z=True)
    got = sorted((r.k, r.z) for r in out.df.select(
        "k", st.z("geometry", carries_z=True).alias("z")).collect())
    assert got == [(0, 0.0), (1, 7.0), (2, 14.0)]
    # default read accepts and drops Z (2D struct)
    flat = aio.read_geopackage(spark, p2)
    assert [f.name for f in
            flat.df.schema["geometry"].dataType.fields][-1] == "parts"


def test_read_ipc_keep_z(spark, tmp_path):
    p = str(tmp_path / "z3.arrow")
    src = spark.range(4).select(
        "id", st.point_z(F.col("id").cast("double"),
                         F.lit(1.0),
                         F.col("id").cast("double") * 2.0)
        .alias("geometry"))
    aio.write_ipc(GeoDataFrame(src, crs="EPSG:4326"), p)
    back = aio.read_ipc(spark, p, keep_z=True)
    got = sorted((r.id, r.z) for r in back.df.select(
        "id", st.z("geometry", carries_z=True).alias("z")).collect())
    assert got == [(i, float(i * 2)) for i in range(4)]


def test_read_files_keep_z_gpkg(spark, tmp_path):
    """r12 review: the multi-file path recognizes the Z geometry
    struct (is_geom_type, not == GEOM_TYPE) so read_files(keep_z=True)
    still returns a GeoDataFrame with the geometry wrap + CRS."""
    import sqlite3
    paths = []
    for j in range(2):
        p = str(tmp_path / f"z{j}.gpkg")
        src = spark.createDataFrame(
            [(j * 10 + i, f"POINT ({i} {i})") for i in range(3)],
            "k long, wkt string").select(
            "k", st.from_wkt("wkt").alias("geometry"))
        aio.write_geopackage(GeoDataFrame(src, crs="EPSG:4326"), p,
                             layer="t")
        con = sqlite3.connect(p)
        for fid, k in con.execute('SELECT fid, k FROM "t"').fetchall():
            blob = con.execute('SELECT geometry FROM "t" WHERE fid=?',
                               (fid,)).fetchone()[0]
            new = bytes(blob[:len(blob) - 21]) + _wkb_point_z(
                float(k % 10), float(k % 10), float(k))
            con.execute('UPDATE "t" SET geometry=? WHERE fid=?',
                        (new, fid))
        con.commit()
        con.close()
        paths.append(p)
    out = aio.read_files(spark, paths, keep_z=True)
    assert isinstance(out, GeoDataFrame) and out.crs == "EPSG:4326"
    got = sorted(r.z for r in out.df.select(
        st.z("geometry", carries_z=True).alias("z")).collect())
    assert got == [0.0, 1.0, 2.0, 10.0, 11.0, 12.0]


def test_read_ipc_spill_keep_z(spark, tmp_path):
    """r12 review: keep_z survives the spill path, so the returned
    schema does not depend on which side of the threshold the file
    lands."""
    p = str(tmp_path / "zs.arrow")
    src = spark.range(6).select(
        "id", st.point_z(F.col("id").cast("double"), F.lit(0.5),
                         F.col("id").cast("double") * 3.0)
        .alias("geometry"))
    aio.write_ipc(GeoDataFrame(src, crs="EPSG:4326"), p)
    back = aio.read_ipc(spark, p, keep_z=True, spill_threshold=1)
    got = sorted((r.id, r.z) for r in back.df.select(
        "id", st.z("geometry", carries_z=True).alias("z")).collect())
    assert got == [(i, float(i * 3)) for i in range(6)]
