"""GeoArrow struct-encoding interop (r10): from_arrow/to_arrow for
nested-encoded geometry columns — the reference's single-type encodings
(geoseries.py:86-107) PLUS the Multi* nestings it raises
NotImplementedError on (geoseries.py:109-138), with the reference's
mixed-type WKB fallback (geoseries.py:71-73)."""

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from arctic_spark import GeoDataFrame, st
from arctic_spark.geodataframe import from_arrow, to_arrow

WKTS = {
    "point": ["POINT (1 2)", "POINT (-3.5 4.25)"],
    "linestring": ["LINESTRING (0 0, 1 1, 2 0)",
                   "LINESTRING (5 5, 6 7)"],
    "polygon": ["POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
                "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
                "(1 1, 2 1, 2 2, 1 2, 1 1))"],
    "multipoint": ["MULTIPOINT (1 1, 2 2)", "MULTIPOINT (0 0, -1 5, 3 3)"],
    "multilinestring": ["MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))",
                        "MULTILINESTRING ((9 9, 8 8))"],
    "multipolygon": [
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
        "((5 5, 7 5, 7 7, 5 7, 5 5), "
        "(5.5 5.5, 6 5.5, 6 6, 5.5 6, 5.5 5.5)))"],
}


def _gdf_of(spark, wkts):
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(wkts)], "id long, wkt string") \
        .select("id", st.from_wkt("wkt").alias("geometry"))
    return GeoDataFrame(df, crs="EPSG:4326")


@pytest.mark.parametrize("kind", sorted(WKTS))
def test_geoarrow_roundtrip(spark, kind):
    """to_arrow(geoarrow) → from_arrow reproduces every geometry
    exactly, for ALL six single types (the reference covers three)."""
    gdf = _gdf_of(spark, WKTS[kind])
    table = to_arrow(gdf, encoding="geoarrow")
    t = table.schema.field("geometry").type
    assert not pa.types.is_binary(t)     # actually nested, not WKB
    import json
    geo = json.loads(table.schema.metadata[b"geo"])
    assert geo["columns"]["geometry"]["encoding"] == f"geoarrow.{kind}"
    # shared layouts need the declared type on the way back in
    back = from_arrow(spark, table, crs="EPSG:4326", geom_type=kind)
    got = {r.id: r.w for r in back.df.select(
        "id", st.to_wkt(F.col("geometry")).alias("w")).collect()}
    assert got == {i: w for i, w in enumerate(WKTS[kind])}


def test_geoarrow_nesting_shapes(spark):
    """Physical layouts match the reference's constructions exactly:
    point struct{x,y}, linestring one list level, polygon two,
    multipolygon three (geoseries.py:86-138)."""
    depths = {"point": 0, "linestring": 1, "polygon": 2,
              "multipoint": 1, "multilinestring": 2, "multipolygon": 3}
    for kind, d in depths.items():
        t = to_arrow(_gdf_of(spark, WKTS[kind]),
                     encoding="geoarrow").schema.field("geometry").type
        depth = 0
        while pa.types.is_list(t):
            t = t.value_type
            depth += 1
        assert depth == d, kind
        assert pa.types.is_struct(t)
        assert [t.field(i).name for i in range(t.num_fields)] == ["x", "y"]


def test_reference_style_arrays_decode(spark):
    """Decode arrays built EXACTLY the way the reference builds them
    (StructArray.from_arrays + ListArray.from_arrays with offsets,
    geoseries.py:86-107)."""
    coords = pa.StructArray.from_arrays(
        [pa.array([0.0, 1.0, 2.0, 5.0, 6.0]),
         pa.array([0.0, 1.0, 0.0, 5.0, 7.0])], ["x", "y"])
    lines = pa.ListArray.from_arrays(pa.array([0, 3, 5], pa.int32()),
                                     coords)
    gdf = from_arrow(spark, pa.table({"geometry": lines}))
    got = [r.w for r in gdf.df.select(
        st.to_wkt(F.col("geometry")).alias("w")).collect()]
    assert got == ["LINESTRING (0 0, 1 1, 2 0)", "LINESTRING (5 5, 6 7)"]
    # polygon: two list levels
    ring = pa.StructArray.from_arrays(
        [pa.array([0.0, 4.0, 4.0, 0.0, 0.0]),
         pa.array([0.0, 0.0, 4.0, 4.0, 0.0])], ["x", "y"])
    rings = pa.ListArray.from_arrays(pa.array([0, 5], pa.int32()), ring)
    polys = pa.ListArray.from_arrays(pa.array([0, 1], pa.int32()), rings)
    gdf = from_arrow(spark, pa.table({"geometry": polys}))
    got = [r.w for r in gdf.df.select(
        st.to_wkt(F.col("geometry")).alias("w")).collect()]
    assert got == ["POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"]


def test_fixed_size_list_point_variant(spark):
    """The interleaved GeoArrow Point encoding
    (fixed_size_list<double, 2>) reads too."""
    flat = pa.array([1.0, 2.0, -3.0, 4.0])
    pts = pa.FixedSizeListArray.from_arrays(flat, 2)
    gdf = from_arrow(spark, pa.table({"geometry": pts}))
    got = [r.w for r in gdf.df.select(
        st.to_wkt(F.col("geometry")).alias("w")).collect()]
    assert got == ["POINT (1 2)", "POINT (-3 4)"]


def test_mixed_types_fall_back_to_wkb(spark):
    """Mixed-type columns export as WKB — the reference's fallback
    (geoseries.py:71-73) — and still round-trip."""
    gdf = _gdf_of(spark, ["POINT (1 2)", "LINESTRING (0 0, 1 1)"])
    table = to_arrow(gdf, encoding="geoarrow")
    t = table.schema.field("geometry").type
    assert pa.types.is_binary(t) or pa.types.is_large_binary(t)
    import json
    geo = json.loads(table.schema.metadata[b"geo"])
    assert geo["columns"]["geometry"]["encoding"] == "WKB"
    back = from_arrow(spark, table)
    got = sorted(r.w for r in back.df.select(
        st.to_wkt(F.col("geometry")).alias("w")).collect())
    assert got == ["LINESTRING (0 0, 1 1)", "POINT (1 2)"]


def test_geoarrow_null_rows(spark):
    """Null geometries survive both directions in every layout class."""
    for kind in ("point", "linestring", "polygon", "multipolygon"):
        gdf = _gdf_of(spark, WKTS[kind])
        df = gdf.df.withColumn(
            "geometry",
            F.when(F.col("id") == 0, F.col("geometry")))
        table = to_arrow(GeoDataFrame(df, crs="EPSG:4326"),
                         encoding="geoarrow")
        assert table.column("geometry").null_count == 1, kind
        back = from_arrow(spark, table, geom_type=kind)
        rows = {r.id: r.w for r in back.df.select(
            "id", st.to_wkt(F.col("geometry")).alias("w")).collect()}
        assert rows[0] == WKTS[kind][0]
        assert rows[1] is None


def test_attrs_travel_with_geometry(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.5, "POINT (1 2)"), (2, "b", -1.0, "POINT (3 4)")],
        "id long, tag string, score double, wkt string") \
        .select("id", "tag", "score", st.from_wkt("wkt").alias("geometry"))
    table = to_arrow(GeoDataFrame(df, crs="EPSG:2154"))
    back = from_arrow(spark, table, crs="EPSG:2154")
    assert back.crs == "EPSG:2154"
    r = {x.id: (x.tag, x.score, x.w) for x in back.df.select(
        "id", "tag", "score",
        st.to_wkt(F.col("geometry")).alias("w")).collect()}
    assert r == {1: ("a", 2.5, "POINT (1 2)"),
                 2: ("b", -1.0, "POINT (3 4)")}


def test_extension_name_field_metadata_roundtrip(spark):
    """r11 (VERDICT r10 #7): to_arrow stamps ARROW:extension:name on
    the geometry FIELD (geoarrow.point / .multipoint / ... and
    geoarrow.wkb for the binary path); from_arrow reads the stamp so
    the shared physical layouts (MultiPoint vs LineString) round-trip
    with NO geom_type hint."""
    g = _gdf_of(spark, WKTS["multipoint"])
    t = to_arrow(g, encoding="geoarrow")
    fld = t.schema.field("geometry")
    assert fld.metadata[b"ARROW:extension:name"] == b"geoarrow.multipoint"
    # no geom_type hint: the stamp alone must disambiguate
    back = from_arrow(spark, t)
    wkts = sorted(r[0] for r in
                  back.df.select(st.to_wkt("geometry")).collect())
    assert wkts == sorted(WKTS["multipoint"])
    # wkb path stamps geoarrow.wkb
    t2 = to_arrow(g, encoding="wkb")
    assert t2.schema.field("geometry").metadata[
        b"ARROW:extension:name"] == b"geoarrow.wkb"
