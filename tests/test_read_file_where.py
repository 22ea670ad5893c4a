"""read_file(where=...) on the native format dispatch (r10): the
reference forwards `where` SQL to GDAL (io/file.py:48-86); the native
readers honor it as a post-parse filter, applied before the column
projection and before max_features."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

import arctic_spark
from arctic_spark import GeoDataFrame, st
from arctic_spark import io as aio


def _gdf(spark):
    rows = [(i, f"n{i}", f"POINT ({i} {i + 0.5})") for i in range(6)]
    df = spark.createDataFrame(rows, "k long, name string, wkt string") \
        .select("k", "name", st.from_wkt("wkt").alias("geometry"))
    return GeoDataFrame(df, crs="EPSG:4326")


def _tmp(ext):
    return os.path.join(tempfile.gettempdir(),
                        f"arctic_where_{os.getpid()}{ext}")


@pytest.mark.parametrize("ext,writer,kcol,namecol", [
    # the geojson reader carries attributes as a JSON `properties`
    # string — the where expression digs in with get_json_object
    (".geojsonl", lambda g, p: aio.write_geojson(g, p),
     "CAST(get_json_object(properties, '$.k') AS BIGINT)", "properties"),
    (".gpkg", lambda g, p: aio.write_geopackage(g, p, layer="t"),
     "k", "name"),
    (".fgb", lambda g, p: aio.write_flatgeobuf(g, p), "k", "name"),
    (".arrow", lambda g, p: aio.write_ipc(g, p), "k", "name"),
])
def test_where_on_native_formats(spark, ext, writer, kcol, namecol):
    gdf = _gdf(spark)
    path = _tmp(ext)
    try:
        writer(gdf, path)
        out = arctic_spark.read_file(spark, path, where=f"{kcol} >= 4")
        ks = sorted(r.k for r in out.df.select(
            F.expr(kcol).cast("long").alias("k")).collect())
        assert ks == [4, 5], ext
        # where runs BEFORE max_features (filter-then-limit) and may
        # reference columns the projection drops
        out2 = arctic_spark.read_file(spark, path, where=f"{kcol} >= 2",
                                      columns=[namecol], max_features=2)
        assert out2.df.count() == 2
        assert set(out2.df.columns) == {namecol.split(".")[0], "geometry"}
    finally:
        import shutil
        if os.path.isdir(path):
            shutil.rmtree(path)        # Spark text writer emits a dir
        elif os.path.exists(path):
            os.remove(path)


def test_where_on_geoparquet_dir(spark):
    gdf = _gdf(spark)
    path = _tmp(".parquet")
    try:
        aio.write_geoparquet(gdf, path)
        out = arctic_spark.read_file(spark, path, where="k IN (1, 3)")
        ks = sorted(r.k for r in out.df.select("k").collect())
        assert ks == [1, 3]
    finally:
        import shutil
        if os.path.exists(path):
            shutil.rmtree(path)


def test_where_on_kml_string_attr(spark):
    gdf = _gdf(spark)
    path = _tmp(".kml")
    try:
        aio.write_kml(gdf, path, name_column="name")
        out = arctic_spark.read_file(spark, path,
                                     where="name LIKE 'n1%'")
        assert [r.name for r in out.df.select("name").collect()] == ["n1"]
    finally:
        if os.path.exists(path):
            os.remove(path)


def test_where_on_attribute_only_arrow(spark):
    import pyarrow as pa
    import pyarrow.ipc as ipc
    path = _tmp("_plain.arrow")
    try:
        t = pa.table({"k": list(range(10)), "v": [f"s{i}" for i in range(10)]})
        with ipc.new_file(path, t.schema) as w:
            w.write_table(t)
        out = arctic_spark.read_file(spark, path, where="k % 2 = 0",
                                     max_features=3)
        assert out.count() == 3
        assert all(r.k % 2 == 0 for r in out.collect())
    finally:
        if os.path.exists(path):
            os.remove(path)


def test_write_file_dispatch_roundtrips(spark):
    """write_file routes by extension and read_file reads every output
    back (the reference has NO write path at all — SURVEY §2.5)."""
    import shutil
    gdf = _gdf(spark)
    for ext, kw in [(".parquet", {}), (".geojsonl", {}),
                    (".gpkg", {"layer": "t"}), (".fgb", {}),
                    (".kml", {"name_column": "name"}), (".arrow", {})]:
        path = _tmp("_wf" + ext)
        try:
            aio.write_file(gdf, path, **kw)
            back = arctic_spark.read_file(spark, path)
            assert back.df.count() == 6, ext
        finally:
            if os.path.isdir(path):
                shutil.rmtree(path)
            elif os.path.exists(path):
                os.remove(path)
    with pytest.raises(ValueError, match="unsupported output"):
        aio.write_file(gdf, "/tmp/x.xyz")


def test_bbox_only_attribute_arrow_keeps_projection(spark):
    """bbox + columns/max_features on an attribute-only .arrow table:
    bbox cannot apply (no geometry) but the withheld projection and
    limit must still be re-applied (ADVICE r10)."""
    import pyarrow as pa
    import pyarrow.ipc as ipc
    path = _tmp("_plain_bbox.arrow")
    try:
        t = pa.table({"k": list(range(10)),
                      "v": [f"s{i}" for i in range(10)],
                      "w": [i * 2 for i in range(10)]})
        with ipc.new_file(path, t.schema) as w:
            w.write_table(t)
        out = arctic_spark.read_file(spark, path, bbox=(0, 0, 1, 1),
                                     columns=["k"], max_features=4)
        assert out.columns == ["k"]
        assert out.count() == 4
    finally:
        if os.path.exists(path):
            os.remove(path)


def test_skip_features_offset(spark):
    """skip_features (r11, pyogrio parity io/file.py:48-86): an offset
    after `where`, before `max_features`, on the order-stable native
    ingest."""
    gdf = _gdf(spark)
    p = _tmp("_skip.gpkg")
    try:
        aio.write_geopackage(gdf, p, layer="t")
        out = arctic_spark.read_file(spark, p, skip_features=2)
        assert [r.k for r in out.df.collect()] == [2, 3, 4, 5]
        # where -> skip -> limit composition
        out = arctic_spark.read_file(spark, p, where="k % 2 = 0",
                                     skip_features=1, max_features=1)
        assert [r.k for r in out.df.collect()] == [2]
    finally:
        os.path.exists(p) and os.remove(p)


def test_fids_gpkg_rowid(spark):
    gdf = _gdf(spark)
    p = _tmp("_fids.gpkg")
    try:
        aio.write_geopackage(gdf, p, layer="t")
        # gpkg rowids are 1-based autoincrement: rows k=0..5 -> fid 1..6
        out = arctic_spark.read_file(spark, p, fids=[5, 2])
        assert [r.k for r in out.df.collect()] == [4, 1]   # fid order
        with pytest.raises(ValueError, match="combine"):
            arctic_spark.read_file(spark, p, fids=[1], where="k > 0")
    finally:
        os.path.exists(p) and os.remove(p)


def test_fids_fgb_index(spark):
    gdf = _gdf(spark)
    p = _tmp("_fids.fgb")
    try:
        # no spatial index: preserve ingest order so fid == row index
        aio.write_flatgeobuf(gdf, p, index_node_size=0)
        out = arctic_spark.read_file(spark, p, fids=[4, 0, 2])
        assert [r.k for r in out.df.collect()] == [4, 0, 2]
        with pytest.raises(ValueError, match="combine"):
            aio.read_flatgeobuf(spark, p, bbox=(0, 0, 9, 9), fids=[1])
    finally:
        os.path.exists(p) and os.remove(p)


def test_fids_gml_id(spark):
    p = _tmp("_fids.gml")
    doc = """<?xml version="1.0"?>
<wfs:FeatureCollection xmlns:wfs="http://www.opengis.net/wfs"
    xmlns:gml="http://www.opengis.net/gml" xmlns:t="http://t">
  <gml:featureMember><t:town gml:id="t.1"><t:name>a</t:name>
    <t:geom><gml:Point><gml:pos>1 2</gml:pos></gml:Point></t:geom>
  </t:town></gml:featureMember>
  <gml:featureMember><t:town gml:id="t.2"><t:name>b</t:name>
    <t:geom><gml:Point><gml:pos>3 4</gml:pos></gml:Point></t:geom>
  </t:town></gml:featureMember>
  <gml:featureMember><t:town gml:id="t.3"><t:name>c</t:name>
    <t:geom><gml:Point><gml:pos>5 6</gml:pos></gml:Point></t:geom>
  </t:town></gml:featureMember>
</wfs:FeatureCollection>"""
    try:
        with open(p, "w") as fh:
            fh.write(doc)
        out = arctic_spark.read_file(spark, p, fids=["t.3", "t.1"])
        rows = out.df.collect()
        assert [r.gml_id for r in rows] == ["t.3", "t.1"]
    finally:
        os.path.exists(p) and os.remove(p)


def test_fids_unsupported_format_raises(spark):
    gdf = _gdf(spark)
    p = _tmp("_fids.arrow")
    try:
        aio.write_ipc(gdf, p)
        with pytest.raises(ValueError, match="fids"):
            arctic_spark.read_file(spark, p, fids=[1])
    finally:
        os.path.exists(p) and os.remove(p)


def test_fids_multi_path_and_edge_cases(spark, tmp_path):
    """Review r11: fids on multi-file input raises (it used to be
    silently dropped); empty fids returns empty; missing fids raise
    like pyogrio/GDAL."""
    import os as _os
    gdf = _gdf(spark)
    p = _os.path.join(str(tmp_path), "a.gpkg")
    aio.write_geopackage(gdf, p, layer="t")
    with pytest.raises(ValueError, match="multi-file"):
        arctic_spark.read_file(spark, str(tmp_path), fids=[2])
    assert arctic_spark.read_file(spark, p, fids=[]).df.count() == 0
    with pytest.raises(ValueError, match="not present"):
        arctic_spark.read_file(spark, p, fids=[999]).df.count()
    # list path + GDAL-only kwarg: clear error, not AttributeError
    with pytest.raises(ValueError, match="multi-file"):
        arctic_spark.read_file(spark, [p, p], layer="t")


def test_mixed_geojson_framings_raise(spark, tmp_path):
    """ADVICE r11: one JSON scan can only use one framing — a dir
    mixing FeatureCollection .geojson with line-delimited .geojsonl
    raises instead of misparsing the former under lines=True."""
    g = _gdf(spark)
    aio.write_geojson(g, str(tmp_path / "a.geojsonl"))
    (tmp_path / "b.geojson").write_text(
        '{"type": "FeatureCollection", "features": []}')
    with pytest.raises(ValueError, match="framings"):
        arctic_spark.read_file(spark, str(tmp_path))


def test_gdal_passthrough_forwards_pushdown_args(spark, monkeypatch):
    """ADVICE r11: when a passthrough kwarg (layer=) skips the native
    dispatch, the popped pushdown args (fids/skip_features/bbox/
    columns/max_features/where) must re-join the pyogrio call instead
    of being silently dropped."""
    import sys
    import types as pytypes

    import pyarrow as pa
    captured = {}

    def fake_read_arrow(path, **kw):
        captured.clear()
        captured.update(kw)
        return {"geometry_name": None, "crs": None}, pa.table({"a": [1]})

    raw = pytypes.ModuleType("pyogrio.raw")
    raw.read_arrow = fake_read_arrow
    pkg = pytypes.ModuleType("pyogrio")
    pkg.raw = raw
    monkeypatch.setitem(sys.modules, "pyogrio", pkg)
    monkeypatch.setitem(sys.modules, "pyogrio.raw", raw)

    arctic_spark.read_file(spark, "/nonexistent/x.gdb", layer="l",
                           fids=[1, 2])
    assert captured["layer"] == "l" and captured["fids"] == [1, 2]
    arctic_spark.read_file(spark, "/nonexistent/x.gdb", layer="l",
                           where="a > 0", skip_features=3,
                           max_features=5, columns=["a"],
                           bbox=(0.0, 0.0, 1.0, 1.0))
    assert captured["where"] == "a > 0"
    assert captured["skip_features"] == 3
    assert captured["max_features"] == 5
    assert captured["columns"] == ["a"]
    assert captured["bbox"] == (0.0, 0.0, 1.0, 1.0)
