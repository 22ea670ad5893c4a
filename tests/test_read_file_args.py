"""read_file argument parity on the native dispatch (r12, VERDICT r11
task #2; reference py-geopolars io/file.py:16-31): layer=, list_layers,
read_geometry=False, return_fids=True, encoding=, force_2d accepted."""

import os

import pytest
from pyspark.sql import functions as F

import arctic_spark
from arctic_spark import GeoDataFrame, st
from arctic_spark import io as aio


def _gdf(spark, n=6):
    rows = [(i, f"n{i}", f"POINT ({i} {i + 0.5})") for i in range(n)]
    df = spark.createDataFrame(rows, "k long, name string, wkt string") \
        .select("k", "name", st.from_wkt("wkt").alias("geometry"))
    return GeoDataFrame(df, crs="EPSG:4326")


# ---- layer= + list_layers ------------------------------------------


def test_gpkg_multilayer_and_list_layers(spark, tmp_path):
    p = str(tmp_path / "multi.gpkg")
    # two writes with distinct layer names build a multi-layer file
    # (the writer only replaces a SAME-NAME layer)
    aio.write_geopackage(_gdf(spark, 3), p, layer="alpha")
    aio.write_geopackage(_gdf(spark, 5), p, layer="beta")
    layers = aio.list_layers(p)
    assert [n for n, _ in layers] == ["alpha", "beta"]
    assert arctic_spark.read_file(spark, p, layer="beta").df.count() == 5
    assert arctic_spark.read_file(spark, p, layer=1).df.count() == 5
    assert arctic_spark.read_file(spark, p, layer=0).df.count() == 3
    with pytest.raises(ValueError, match="not in"):
        arctic_spark.read_file(spark, p, layer="gamma")
    with pytest.raises(ValueError, match="out of range"):
        arctic_spark.read_file(spark, p, layer=7)


def test_gpx_layer_by_index_and_name(spark, tmp_path):
    p = str(tmp_path / "trace.gpx")
    gpx = ('<?xml version="1.0"?><gpx version="1.1" creator="t">'
           '<wpt lat="1.0" lon="2.0"><name>w0</name></wpt>'
           '<trk><name>t0</name><trkseg>'
           '<trkpt lat="1.0" lon="2.0"/><trkpt lat="1.1" lon="2.1"/>'
           "</trkseg></trk></gpx>")
    open(p, "w").write(gpx)
    assert [n for n, _ in aio.list_layers(p)] == [
        "waypoints", "routes", "tracks"]
    wp = arctic_spark.read_file(spark, p, layer="waypoints")
    assert wp.df.count() == 1
    wp0 = arctic_spark.read_file(spark, p, layer=0)     # index order
    assert wp0.df.count() == 1
    tracks = arctic_spark.read_file(spark, p, layer="tracks")
    assert tracks.df.count() == 1


def test_layer_rejected_on_single_layer_native_format(spark, tmp_path):
    p = str(tmp_path / "x.fgb")
    aio.write_flatgeobuf(_gdf(spark), p)
    with pytest.raises(ValueError, match="single-layer"):
        arctic_spark.read_file(spark, p, layer="whatever")


def test_list_layers_single_layer_stem(tmp_path):
    assert aio.list_layers(str(tmp_path / "roads.fgb")) == [
        ("roads", None)]


# ---- read_geometry=False -------------------------------------------


@pytest.mark.parametrize("ext,writer", [
    (".fgb", lambda g, p: aio.write_flatgeobuf(g, p)),
    (".gpkg", lambda g, p: aio.write_geopackage(g, p)),
])
def test_read_geometry_false_returns_plain_df(spark, ext, writer,
                                              tmp_path):
    p = str(tmp_path / f"x{ext}")
    writer(_gdf(spark), p)
    out = arctic_spark.read_file(spark, p, read_geometry=False)
    assert not isinstance(out, GeoDataFrame)
    assert "geometry" not in out.columns
    assert out.count() == 6
    # filters still apply before the drop (bbox needs the geometry)
    out2 = arctic_spark.read_file(spark, p, read_geometry=False,
                                  bbox=(2.5, 0.0, 4.2, 9.0))
    assert sorted(r.k for r in out2.select("k").collect()) == [3, 4]


# ---- return_fids ----------------------------------------------------


def test_return_fids_shapefile(spark, tmp_path):
    import struct
    from tests.test_io_datasets import _dbf_bytes, _shp_bytes, \
        _shp_record
    pts = [_shp_record(1, struct.pack("<dd", float(i), float(i)))
           for i in range(4)]
    (tmp_path / "t.shp").write_bytes(_shp_bytes(pts))
    (tmp_path / "t.dbf").write_bytes(_dbf_bytes(
        [("NAME", "C", 8)], [(f"p{i}",) for i in range(4)]))
    out = arctic_spark.read_file(spark, str(tmp_path / "t.shp"),
                                 return_fids=True)
    rows = out.df.orderBy("fid").collect()
    assert [r.fid for r in rows] == [0, 1, 2, 3]
    assert rows[0].NAME == "p0"


def test_return_fids_gpkg_rowid(spark, tmp_path):
    p = str(tmp_path / "f.gpkg")
    aio.write_geopackage(_gdf(spark), p)
    out = arctic_spark.read_file(spark, p, return_fids=True)
    # the gpkg writer already exposes its INTEGER PRIMARY KEY as fid —
    # no duplicate column, and it IS the rowid
    assert out.df.columns.count("fid") == 1
    assert sorted(r.fid for r in out.df.select("fid").collect()) == \
        [1, 2, 3, 4, 5, 6]


def test_return_fids_gpkg_without_fid_column(spark, tmp_path):
    """A table whose PK is not named fid gets the rowid prepended."""
    import sqlite3
    p = str(tmp_path / "g.gpkg")
    aio.write_geopackage(_gdf(spark), p, layer="t")
    con = sqlite3.connect(p)
    con.execute('ALTER TABLE "t" RENAME COLUMN fid TO oid')
    con.commit()
    con.close()
    out = arctic_spark.read_file(spark, p, return_fids=True)
    assert out.df.columns[0] == "fid"
    got = {(r.fid, r.oid) for r in out.df.select("fid", "oid").collect()}
    assert all(f == o for f, o in got) and len(got) == 6


def test_return_fids_fgb_with_and_without_bbox(spark, tmp_path):
    p = str(tmp_path / "f.fgb")
    aio.write_flatgeobuf(_gdf(spark), p)   # points at (i, i+0.5)
    out = arctic_spark.read_file(spark, p, return_fids=True)
    assert sorted(r.fid for r in out.df.select("fid").collect()) == \
        [0, 1, 2, 3, 4, 5]
    # fid ↔ attribute alignment
    m = {r.k: r.fid for r in out.df.select("k", "fid").collect()}
    full = aio.read_flatgeobuf(spark, p)
    order = [r.k for r in full.df.collect()]   # stream order
    assert [m[k] for k in order] == list(range(6))
    # under bbox selection the fids are the ORIGINAL stream positions
    sel = arctic_spark.read_file(spark, p, return_fids=True,
                                 bbox=(1.5, 0.0, 3.2, 9.0))
    got = {(r.k, r.fid) for r in sel.df.select("k", "fid").collect()}
    assert got == {(k, m[k]) for k in (2, 3)}


def test_return_fids_unsupported_format_raises(spark, tmp_path):
    p = str(tmp_path / "x.kml")
    aio.write_kml(_gdf(spark), p)
    with pytest.raises(ValueError, match="return_fids"):
        arctic_spark.read_file(spark, p, return_fids=True)


# ---- encoding= ------------------------------------------------------


def _dbf_bytes_raw(name, flen, raw_values):
    """Minimal one-C-column dbf with PRE-ENCODED byte values (the
    shared helper str()-encodes, which can't express cp1251 text)."""
    import struct
    fields = (name.encode().ljust(11, b"\x00") + b"C"
              + b"\x00" * 4 + bytes([flen, 0]) + b"\x00" * 14)
    hdr_len = 32 + len(fields) + 1
    rec_len = 1 + flen
    hdr = bytes([3, 126, 1, 1]) + struct.pack("<i", len(raw_values)) \
        + struct.pack("<HH", hdr_len, rec_len) + b"\x00" * 20
    recs = b"".join(b" " + v.ljust(flen, b" ")[:flen]
                    for v in raw_values)
    return hdr + fields + bytes([0x0D]) + recs + bytes([0x1A])


def test_shapefile_dbf_encoding(spark, tmp_path):
    import struct
    from tests.test_io_datasets import _shp_bytes, _shp_record
    pts = [_shp_record(1, struct.pack("<dd", 0.0, 0.0))]
    (tmp_path / "e.shp").write_bytes(_shp_bytes(pts))
    # cp1251 Cyrillic "Москва" — latin-1 would mojibake it
    raw = "Москва".encode("cp1251")
    (tmp_path / "e.dbf").write_bytes(_dbf_bytes_raw("NAME", 12, [raw]))
    out = arctic_spark.read_file(spark, str(tmp_path / "e.shp"),
                                 encoding="cp1251")
    assert out.df.collect()[0].NAME == "Москва"
    bad = arctic_spark.read_file(spark, str(tmp_path / "e.shp"))
    assert bad.df.collect()[0].NAME != "Москва"
    with pytest.raises(ValueError, match="encoding"):
        arctic_spark.read_file(spark, str(tmp_path / "e.shp")
                               .replace("e.shp", "x.fgb"),
                               encoding="cp1251")


def test_force_2d_accepted(spark, tmp_path):
    p = str(tmp_path / "x.fgb")
    aio.write_flatgeobuf(_gdf(spark), p)
    out = arctic_spark.read_file(spark, p, force_2d=True)
    assert out.df.count() == 6


# ---- r12 review fixes ----------------------------------------------


def test_gpkg_without_rowid_and_view_layers(spark, tmp_path):
    """Plain reads must not require rowid (WITHOUT ROWID feature
    tables stay readable); return_fids raises clearly on layers that
    have no rowids instead of crashing."""
    import sqlite3
    p = str(tmp_path / "wr.gpkg")
    aio.write_geopackage(_gdf(spark, 4), p, layer="t")
    con = sqlite3.connect(p)
    # clone t as a WITHOUT ROWID table registered as a feature layer
    con.execute('CREATE TABLE "t2" (fid INTEGER PRIMARY KEY, '
                'k INTEGER, name TEXT, geometry BLOB) WITHOUT ROWID')
    con.execute('INSERT INTO "t2" SELECT fid, k, name, geometry '
                'FROM "t"')
    for meta in ("gpkg_contents", "gpkg_geometry_columns"):
        cols = [r[1] for r in con.execute(f'PRAGMA table_info({meta})')]
        con.execute(
            f'INSERT INTO {meta} SELECT '
            + ", ".join("'t2'" if c in ("table_name", "identifier")
                        else c for c in cols)
            + f' FROM {meta} WHERE table_name = \'t\'')
    con.commit()
    con.close()
    out = aio.read_geopackage(spark, p, layer="t2")
    assert out.df.count() == 4          # readable without rowid
    with pytest.raises((Exception,),
                       match="rowid|no such column"):
        aio.read_geopackage(spark, p, layer="t2",
                            return_fids=True).df.count()


def test_gpkg_typeless_schema_stable_under_bbox(spark, tmp_path):
    """A bbox= read whose selected rows are all NULL in a declared-
    typeless column must type it like the unfiltered read (targeted
    value probe — review r12)."""
    import sqlite3
    p = str(tmp_path / "tb.gpkg")
    aio.write_geopackage(_gdf(spark, 8), p, layer="t")  # pts (i, i+.5)
    con = sqlite3.connect(p)
    con.execute('ALTER TABLE "t" ADD COLUMN extra')     # typeless
    con.execute('UPDATE "t" SET extra = 42 WHERE k >= 6')
    con.commit()
    con.close()
    full = aio.read_geopackage(spark, p)
    sel = aio.read_geopackage(spark, p, bbox=(0.0, 0.0, 3.2, 9.0))
    assert dict(full.df.dtypes)["extra"] == "bigint"
    assert dict(sel.df.dtypes)["extra"] == "bigint"
    assert sel.df.count() == 4 and \
        all(r.extra is None for r in sel.df.collect())
    # the two reads union cleanly (the r12 review failure mode)
    assert full.df.unionByName(sel.df).count() == 12


def test_probe_parsers_match_batch_fields(spark, tmp_path):
    """The header/schema-only probes return the same fields + CRS as
    the full batch parsers (read_files probe correctness)."""
    g = _gdf(spark)
    pf = str(tmp_path / "x.fgb")
    pa_ = str(tmp_path / "x.arrow")
    aio.write_flatgeobuf(g, pf)
    aio.write_ipc(g, pa_)
    for probe, full, path in [
            (aio._probe_fgb_fields, aio._parse_fgb_batch, pf),
            (aio._probe_ipc_fields, aio._parse_ipc_batch, pa_)]:
        f1, payload, c1 = probe(path)
        f2, _table, c2 = full(path)
        assert payload is None
        assert [(f.name, f.dataType) for f in f1] == \
            [(f.name, f.dataType) for f in f2]
        assert c1 == c2
