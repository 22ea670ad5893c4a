"""FlatGeobuf reader/writer (io.read_flatgeobuf / write_flatgeobuf,
geom/fgb.py) — GDAL-free via the engine's own FlatBuffers wire codec
and WKB codec. Layout per the public spec (flatgeobuf.org format.md);
the reference reaches .fgb only through GDAL (io/file.py:15-119)."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from arctic_spark import GeoDataFrame, st
from arctic_spark.geom import fgb as FG
from arctic_spark.geom import wkb as W
from arctic_spark.io import read_file, read_flatgeobuf, write_flatgeobuf


# ---------------------------------------------------------------------------
# pure codec (no Spark)
# ---------------------------------------------------------------------------

def _cell_point(x, y):
    return (0, [x], [y], [1], [1])


def _cell_line(xs, ys):
    return (1, xs, ys, [len(xs)], [1])


def _cell_poly(xs, ys, rings):
    return (3, xs, ys, rings, [len(rings)])


SQ = _cell_poly([0., 4., 4., 0., 0.], [0., 0., 3., 3., 0.], [5])
# square with a 1x1 hole
HOLED = _cell_poly(
    [0., 4., 4., 0., 0., 1., 1., 2., 2., 1.],
    [0., 0., 4., 4., 0., 1., 2., 2., 1., 1.], [5, 5])
MPT = (4, [1., 2., 3.], [5., 6., 7.], [1, 1, 1], [1, 1, 1])
MLS = (5, [0., 1., 2., 5., 6.], [0., 1., 2., 5., 9.], [3, 2], [1, 1])
MPOLY = (6, [0., 1., 1., 0., 0., 10., 12., 12., 10., 10.],
         [0., 0., 1., 1., 0., 0., 0., 2., 2., 0.], [5, 5], [1, 1])


def test_fgb_magic_and_header():
    blob = FG.write_fgb("lyr", [("k", FG.CT_LONG)],
                        [(_cell_point(1.0, 2.0), [7])],
                        geometry_type=FG.GT_POINT, crs=("EPSG", 4326))
    assert blob[:7] == b"fgb\x03fgb"
    meta, feats = FG.read_fgb(blob)
    assert meta["name"] == "lyr"
    assert meta["geometry_type"] == FG.GT_POINT
    assert meta["columns"] == [("k", FG.CT_LONG)]
    assert meta["crs"] == ("EPSG", 4326)
    assert meta["features_count"] == 1
    assert len(feats) == 1
    wkb, props = feats[0]
    assert props == {"k": 7}
    # little-endian WKB point
    assert wkb[:5] == b"\x01\x01\x00\x00\x00"
    assert struct.unpack("<2d", wkb[5:21]) == (1.0, 2.0)


@pytest.mark.parametrize("cell", [
    _cell_point(3.5, -1.25), _cell_line([0., 1., 2.], [0., 1., 4.]),
    SQ, HOLED, MPT, MLS, MPOLY])
def test_fgb_geometry_roundtrip(cell):
    blob = FG.write_fgb("g", [], [(cell, [])])
    _, feats = FG.read_fgb(blob)
    wkb = feats[0][0]
    # decoding the produced WKB must reproduce the ragged cell exactly
    rg = W.decode([wkb])
    gt, xs, ys, rings, parts = rg.geom(0)
    assert gt == cell[0]
    np.testing.assert_array_equal(xs, cell[1])
    np.testing.assert_array_equal(ys, cell[2])
    np.testing.assert_array_equal(rings, cell[3])
    np.testing.assert_array_equal(parts, cell[4])
    # and match the engine's own WKB encoding byte-for-byte
    assert wkb == W.encode_geom(*cell)


def test_fgb_geometrycollection_roundtrip():
    # GC = point + linestring (typed part entries, GC_SHIFT encoding)
    from arctic_spark.geom.ragged import GC_SHIFT
    gc = (7, [9., 0., 1.], [9., 0., 1.], [1, 2],
          [0 * GC_SHIFT + 1, 1 * GC_SHIFT + 1])
    blob = FG.write_fgb("g", [], [(gc, [])])
    _, feats = FG.read_fgb(blob)
    assert feats[0][0] == W.encode_geom(*gc)


def test_fgb_property_types_and_nulls():
    cols = [("b", FG.CT_BOOL), ("i", FG.CT_INT), ("l", FG.CT_LONG),
            ("f", FG.CT_FLOAT), ("d", FG.CT_DOUBLE),
            ("s", FG.CT_STRING), ("j", FG.CT_JSON),
            ("t", FG.CT_DATETIME), ("raw", FG.CT_BINARY),
            ("u8", FG.CT_UBYTE), ("i16", FG.CT_SHORT)]
    row1 = [True, -5, 2**40, 0.5, -2.25, "héllo", '{"a":1}',
            "2026-08-15T00:00:00Z", b"\x00\xff", 200, -30000]
    row2 = [None] * len(cols)
    blob = FG.write_fgb("p", cols, [(None, row1), (None, row2)])
    _, feats = FG.read_fgb(blob)
    assert feats[0][1] == dict(zip([c for c, _ in cols], row1))
    assert feats[1][1] == {}          # nulls are simply absent
    assert feats[0][0] is None and feats[1][0] is None


def test_fgb_index_block_roundtrip():
    rows = [(_cell_point(float(i % 10), float(i // 10)), [i])
            for i in range(100)]
    blob = FG.write_fgb("idx", [("k", FG.CT_LONG)], rows,
                        geometry_type=FG.GT_POINT, index_node_size=16)
    plain = FG.write_fgb("idx", [("k", FG.CT_LONG)], rows,
                         geometry_type=FG.GT_POINT)
    # indexed file = plain + index block + the envelope the header
    # gains (4 doubles + vector/vtable overhead)
    extra = len(blob) - len(plain) - FG.packed_rtree_size(100, 16)
    assert 0 <= extra <= 64
    # full read skips the index; Hilbert re-ordering permutes rows but
    # loses nothing
    meta, feats = FG.read_fgb(blob)
    assert len(feats) == 100
    assert sorted(f[1]["k"] for f in feats) == list(range(100))


def test_fgb_bbox_search_index_vs_scan():
    rng = np.random.default_rng(11)
    pts = rng.uniform(0, 100, (400, 2))
    rows = [(_cell_point(float(x), float(y)), [i])
            for i, (x, y) in enumerate(pts)]
    idx = FG.write_fgb("p", [("k", FG.CT_LONG)], rows,
                       geometry_type=FG.GT_POINT, index_node_size=8)
    noidx = FG.write_fgb("p", [("k", FG.CT_LONG)], rows,
                         geometry_type=FG.GT_POINT)
    for bbox in [(10, 10, 30, 40), (0, 0, 100, 100), (95, 95, 99, 99),
                 (200, 200, 300, 300)]:
        want = {i for i, (x, y) in enumerate(pts)
                if bbox[0] <= x <= bbox[2] and bbox[1] <= y <= bbox[3]}
        got_idx = {f[1]["k"] for f in FG.read_fgb(idx, bbox=bbox)[1]}
        got_scan = {f[1]["k"] for f in FG.read_fgb(noidx, bbox=bbox)[1]}
        assert got_idx == want
        assert got_scan == want


def test_hilbert_curve_locality():
    # the coarse top-level grid of an order-16 Hilbert curve is itself
    # a Hilbert traversal: consecutive cells are 4-neighbors
    step = 1 << 10                       # 64x64 coarse grid
    g = np.arange(64)
    xx, yy = np.meshgrid(g, g)
    xs = (xx.ravel() * step).astype(np.uint32)
    ys = (yy.ravel() * step).astype(np.uint32)
    h = FG.hilbert_u32(xs, ys)
    assert len(np.unique(h)) == len(h)   # injective on the grid
    order = np.argsort(h)
    ox, oy = xx.ravel()[order], yy.ravel()[order]
    d = np.abs(np.diff(ox.astype(int))) + np.abs(np.diff(oy.astype(int)))
    assert (d == 1).all()                # unit steps along the curve


def test_packed_rtree_size():
    # n=100, node 16: 100 + 7 + 1 = 108 nodes * 40 bytes
    assert FG.packed_rtree_size(100, 16) == 108 * 40
    assert FG.packed_rtree_size(0, 16) == 0
    assert FG.packed_rtree_size(5, 0) == 0
    assert FG.packed_rtree_size(1, 16) == 40


def test_fgb_heterogeneous_layer_unknown_type():
    blob = FG.write_fgb("mix", [], [(SQ, []), (_cell_point(1., 1.), [])])
    meta, feats = FG.read_fgb(blob)
    assert meta["geometry_type"] == FG.GT_UNKNOWN
    assert feats[0][0] == W.encode_geom(*SQ)
    assert feats[1][0] == W.encode_geom(*_cell_point(1., 1.))


def test_fgb_bad_magic():
    with pytest.raises(FG.FgbError):
        FG.read_fgb(b"notfgb\x00\x00rest")


# ---------------------------------------------------------------------------
# Spark-level io
# ---------------------------------------------------------------------------

def _fixture(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5, True), (2, "b", -2.25, False),
         (3, None, None, None)],
        "k long, name string, score double, flag boolean")
    gdf = GeoDataFrame(
        df.withColumn("geometry", F.when(
            F.col("k") == 1, st.point(F.lit(1.0), F.lit(2.0)))
            .when(F.col("k") == 2, st.make_envelope(
                F.lit(0.0), F.lit(0.0), F.lit(4.0), F.lit(3.0)))),
        "geometry", "EPSG:4326")
    return gdf


def test_fgb_spark_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t.fgb")
    write_flatgeobuf(_fixture(spark), path, name="feat")
    back = read_flatgeobuf(spark, path)
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

    # read_file routes .fgb natively
    via = read_file(spark, path)
    assert via.df.count() == 3


def test_fgb_spark_mode_error(spark, tmp_path):
    path = str(tmp_path / "t2.fgb")
    write_flatgeobuf(_fixture(spark), path)
    with pytest.raises(ValueError):
        write_flatgeobuf(_fixture(spark), path, mode="errorifexists")
    write_flatgeobuf(_fixture(spark), path)      # overwrite ok
    assert read_flatgeobuf(spark, path).df.count() == 3
