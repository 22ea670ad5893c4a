"""GeoParquet round trip, dataset generators (reference fixture shapes),
wrapper behavior."""

import pytest
from pyspark.sql import functions as F

from arctic_spark import GeoDataFrame, st, version
from arctic_spark import datasets
from arctic_spark.io import read_geoparquet, write_geoparquet
from arctic_spark.joins import spatial_join


def test_version():
    assert version().count(".") == 2


def test_geoparquet_roundtrip(spark, tmp_path):
    g = datasets.cities(spark, n=25)
    path = str(tmp_path / "cities_gpq")
    write_geoparquet(g, path)
    back = read_geoparquet(spark, path)
    assert back.crs == "EPSG:4326"
    assert back.geometry_column == "geometry"
    assert back.df.count() == 25
    # bbox columns materialized for scan pruning
    assert {"bbox_xmin", "bbox_ymax"} <= set(back.df.columns)
    # geometry round-trips exactly through WKB
    a = sorted(r.w for r in g.df.select(st.to_wkt("geometry").alias("w"))
               .collect())
    b = sorted(r.w for r in back.df.select(st.to_wkt("geometry").alias("w"))
               .collect())
    assert a == b


def test_geoparquet_struct_mode(spark, tmp_path):
    g = datasets.cities(spark, n=10)
    path = str(tmp_path / "cities_struct")
    write_geoparquet(g, path, wkb=False, bbox_columns=False)
    back = read_geoparquet(spark, path)
    assert back.df.count() == 10
    assert back.df.schema["geometry"].dataType.simpleString().startswith(
        "struct<gt:int")


def test_dataset_shapes(spark):
    assert datasets.naturalearth_cities(spark).df.count() == 243  # F2
    low = datasets.lowres_countries(spark, n=30)
    types = {r.t for r in low.df.select(
        st.geom_type("geometry").alias("t")).collect()}
    assert types == {3, 6}  # mixed polygon/multipolygon (F3)
    ny = datasets.nybb(spark)
    assert ny.crs == "EPSG:2263"
    assert ny.df.count() == 5


def test_nybb_reprojection_roundtrip(spark):
    """F4 exercise: projected CRS → 4326 → back, coordinates preserved."""
    ny = datasets.nybb(spark)
    back = ny.to_crs("EPSG:4326").to_crs("EPSG:2263")
    orig = ny.df.select(st.x(st.centroid("geometry")).alias("x")).collect()
    rt = back.df.select(st.x(st.centroid("geometry")).alias("x")).collect()
    for a, b in zip(orig, rt):
        assert a.x == pytest.approx(b.x, abs=1e-4)  # sub-mm in feet


def test_f5_fixture_matches_reference(spark):
    points, polys = datasets.f5_join_fixture(spark)
    inner = spatial_join(points, polys).df
    assert inner.count() == 2
    assert set(inner.columns) == {"point_values_left", "geometry_left",
                                  "string_col_right", "geometry_right"}


def test_explode_bench_shape(spark):
    g = datasets.explode_bench(spark, n=1000)
    out = g.explode()
    assert out.df.count() == 2000
    types = out.df.select(st.geom_type("geometry").alias("t")).distinct() \
        .collect()
    assert [r.t for r in types] == [0]


def test_wrapper_delegation_and_closure(spark):
    g = datasets.cities(spark, n=30)
    # delegated DataFrame methods re-wrap
    g2 = g.limit(5)
    assert isinstance(g2, GeoDataFrame)
    assert g2.crs == g.crs
    assert g2.count() == 5
    # relational ops keep working through the wrapper (SURVEY §2.1)
    agg = g.df.groupBy().agg(F.count("*").alias("n")).collect()
    assert agg[0].n == 30


def test_with_bbox_columns(spark):
    g = datasets.cities(spark, n=10).with_bbox_columns()
    row = g.df.select("bbox_xmin", "bbox_xmax").first()
    assert row.bbox_xmin == row.bbox_xmax  # points


def test_estimate_utm_crs(spark):
    from arctic_spark import GeoDataFrame, st
    from pyspark.sql import functions as F
    df = spark.createDataFrame([("POINT (2.3 48.8)",), ("POINT (2.4 48.9)",)],
                               "wkt string") \
        .withColumn("geometry", st.from_wkt("wkt"))
    assert GeoDataFrame(df).estimate_utm_crs() == "EPSG:32631"
    south = spark.createDataFrame([("POINT (151.2 -33.8)",)], "wkt string") \
        .withColumn("geometry", st.from_wkt("wkt"))
    assert GeoDataFrame(south).estimate_utm_crs() == "EPSG:32756"
    # r12: poleward of 84N / 80S UTM is undefined — UPS instead
    for wkt, code in [("POINT (10 85.0)", "EPSG:5041"),
                      ("POINT (-120 88.5)", "EPSG:5041"),
                      ("POINT (45 -85.0)", "EPSG:5042")]:
        polar = spark.createDataFrame([(wkt,)], "wkt string") \
            .withColumn("geometry", st.from_wkt("wkt"))
        assert GeoDataFrame(polar).estimate_utm_crs() == code, wkt
    # 84N exactly is still the last UTM band (X)
    edge = spark.createDataFrame([("POINT (9 84.0)",)], "wkt string") \
        .withColumn("geometry", st.from_wkt("wkt"))
    assert GeoDataFrame(edge).estimate_utm_crs() == "EPSG:32632"


def test_from_arrow_roundtrip(spark):
    """pyarrow Table with WKB geometry -> GeoDataFrame (reference
    from_arrow parity, convert.py)."""
    import pyarrow as pa

    from arctic_spark import from_arrow, st, to_pandas_wkb
    from arctic_spark.geodataframe import GeoDataFrame
    from pyspark.sql import functions as F

    src = GeoDataFrame(
        spark.range(0, 5).withColumn(
            "geometry", st.point(F.col("id").cast("double"), F.lit(1.0))))
    pdf = to_pandas_wkb(src)
    table = pa.Table.from_pandas(pdf)
    back = from_arrow(spark, table)
    got = {r.id: (r.x, r.y) for r in back.df.select(
        "id", st.x("geometry").alias("x"), st.y("geometry").alias("y"))
        .collect()}
    assert got == {i: (float(i), 1.0) for i in range(5)}
    assert back.crs == "EPSG:4326"


def test_from_geopandas_import_gated(spark):
    import pytest as _pt

    from arctic_spark import from_geopandas
    try:
        import geopandas  # noqa: F401
        _pt.skip("geopandas unexpectedly present")
    except ImportError:
        pass
    with _pt.raises(ImportError):
        from_geopandas(spark, object())


def test_write_bucketed_join_no_shuffle(spark, tmp_path):
    """Bucketed-on-the-same-key tables join with NO Exchange in the
    plan — the co-located layout the 100 TB path depends on."""
    from arctic_spark.io import write_bucketed
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    a = spark.range(0, 1000).withColumn("va", F.col("id") * 2)
    b = spark.range(0, 1000).withColumn("vb", F.col("id") % 7)
    write_bucketed(a, "t_buck_a", "id", num_buckets=4, sort_cols="id",
                   path=str(tmp_path / "a"))
    write_bucketed(b, "t_buck_b", "id", num_buckets=4, sort_cols="id",
                   path=str(tmp_path / "b"))
    try:
        ta = spark.table("t_buck_a")
        tb = spark.table("t_buck_b")
        joined = ta.join(tb, "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
        got = (joined.where(F.col("id") == 10)
               .select("va", "vb").first())
        assert (got.va, got.vb) == (20, 3)
        # contrast: a plain parquet re-read of the same data DOES shuffle
        pa = spark.read.parquet(str(tmp_path / "a"))
        pb = spark.read.parquet(str(tmp_path / "b"))
        plan2 = (pa.join(pb, "id")._jdf.queryExecution()
                 .executedPlan().toString())
        assert "Exchange" in plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_buck_a")
        spark.sql("DROP TABLE IF EXISTS t_buck_b")


def test_geoseries_style_methods(spark):
    """GeoSeries-style sugar: geometry-transform methods chain and
    scalar methods append columns, all lazily."""
    df = (spark.createDataFrame(
        [(1, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
         (2, "POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))")],   # bowtie
        "id long, w string")
        .withColumn("geometry", st.from_wkt("w")))
    g = GeoDataFrame(df)
    # chain: make_valid -> centroid -> geom type accessor
    out = {r.id: r for r in
           g.make_valid().area().df.select("id", "area").collect()}
    assert out[1].area == pytest.approx(16.0)
    assert out[2].area == pytest.approx(8.0)     # repaired bowtie
    cent = g.centroid().geom_type_name().df.select("geom_type_name") \
        .first()[0]
    assert cent == "Point"
    buf = g.buffer(1.0).area().df.where(F.col("id") == 1) \
        .select("area").first()[0]
    assert buf > 16.0
    ln = g.boundary().length().df.where(F.col("id") == 1) \
        .select("length").first()[0]
    assert ln == pytest.approx(16.0)


def test_get_coordinates(spark):
    from arctic_spark import GeoDataFrame, st
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(1, "LINESTRING (0 0, 1 2, 3 4)"), (2, "POINT (9 9)")],
        "id long, wkt string").withColumn("geometry", st.from_wkt("wkt"))
    gdf = GeoDataFrame(df.drop("wkt"))
    out = gdf.get_coordinates(index_parts=True).orderBy("id", "coord_index")
    rows = out.collect()
    assert [(r.id, r.coord_index, r.x, r.y) for r in rows] == [
        (1, 0, 0.0, 0.0), (1, 1, 1.0, 2.0), (1, 2, 3.0, 4.0),
        (2, 0, 9.0, 9.0)]
    assert "coord_index" not in gdf.get_coordinates().columns


# -- GeoJSON source/sink ----------------------------------------------------

def test_read_geojson_feature_collection(spark, tmp_path):
    import json as _json
    from arctic_spark import read_geojson, st
    from pyspark.sql import functions as F
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "id": "a",
         "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
         "properties": {"name": "alpha", "pop": 10}},
        {"type": "Feature", "id": "b",
         "geometry": {"type": "Polygon", "coordinates":
                      [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]]},
         "properties": {"name": "beta", "pop": 20}},
    ]}
    p = tmp_path / "fc.geojson"
    p.write_text(_json.dumps(fc))
    gdf = read_geojson(spark, str(p))
    rows = {r["id"]: r for r in
            gdf.df.withColumn("gt", st.geom_type_id("geometry"))
                  .withColumn("area", st.area("geometry")).collect()}
    assert rows["a"]["gt"] == 0
    assert rows["b"]["gt"] == 3 and rows["b"]["area"] == 16.0
    # properties survive as raw JSON text
    assert _json.loads(rows["a"]["properties"])["name"] == "alpha"
    assert _json.loads(rows["b"]["properties"])["pop"] == 20


def test_geojson_lines_roundtrip(spark, tmp_path):
    import json as _json
    from arctic_spark import GeoDataFrame, read_geojson, write_geojson, st
    from pyspark.sql import functions as F
    df = spark.range(5).select(
        F.col("id"),
        st.point(F.col("id").cast("double"),
                 (F.col("id") * 2).cast("double")).alias("geometry"))
    out = str(tmp_path / "seq")
    write_geojson(GeoDataFrame(df), out)
    back = read_geojson(spark, out, lines=True)
    got = sorted((int(_json.loads(r["properties"])["id"]),
                  st_x, st_y) for r, st_x, st_y in
                 ((r, r["x"], r["y"]) for r in
                  back.df.withColumn("x", st.x("geometry"))
                         .withColumn("y", st.y("geometry")).collect()))
    assert got == [(i, float(i), float(2 * i)) for i in range(5)]


# -- Shapefile source (GDAL-free) -------------------------------------------

def _shp_record(shape_type, payload):
    import struct
    body = struct.pack("<i", shape_type) + payload
    return body


def _shp_bytes(records):
    import struct
    recs = b""
    for i, body in enumerate(records, start=1):
        recs += struct.pack(">ii", i, len(body) // 2) + body
    total_words = (100 + len(recs)) // 2
    hdr = struct.pack(">i", 9994) + b"\x00" * 20 \
        + struct.pack(">i", total_words) \
        + struct.pack("<ii", 1000, 5) + struct.pack("<8d", *([0.0] * 8))
    return hdr + recs


def _poly_payload(rings):
    import struct
    pts = [p for r in rings for p in r]
    parts, off = [], 0
    for r in rings:
        parts.append(off)
        off += len(r)
    out = struct.pack("<4d", 0, 0, 0, 0)
    out += struct.pack("<ii", len(rings), len(pts))
    out += struct.pack(f"<{len(parts)}i", *parts)
    for x, y in pts:
        out += struct.pack("<dd", x, y)
    return out


def _dbf_bytes(names_types_lens, rows):
    import struct
    fields = b""
    rec_len = 1
    for name, ftype, flen in names_types_lens:
        fields += name.encode().ljust(11, b"\x00") + ftype.encode() \
            + b"\x00" * 4 + bytes([flen, 0]) + b"\x00" * 14
        rec_len += flen
    hdr_len = 32 + len(fields) + 1
    hdr = bytes([3, 126, 1, 1]) + struct.pack("<i", len(rows)) \
        + struct.pack("<HH", hdr_len, rec_len) + b"\x00" * 20
    recs = b""
    for row in rows:
        recs += b" "
        for (name, ftype, flen), v in zip(names_types_lens, row):
            s = ("" if v is None else str(v))
            recs += (s.rjust(flen) if ftype in "NF"
                     else s.ljust(flen))[:flen].encode()
    return hdr + fields + bytes([0x0D]) + recs + bytes([0x1A])


def test_read_shapefile(spark, tmp_path):
    import struct
    from arctic_spark import read_shapefile, st
    from pyspark.sql import functions as F
    # shell CW (shapefile convention) 10x10, hole CCW 2x2 at (4,4)
    shell = [(0, 0), (0, 10), (10, 10), (10, 0), (0, 0)]
    hole = [(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)]
    point = _shp_record(1, struct.pack("<dd", 3.5, 7.25))
    holed = _shp_record(5, _poly_payload([shell, hole]))
    line = _shp_record(
        3, _poly_payload([[(0, 0), (3, 4)], [(10, 0), (10, 5)]]))
    null = _shp_record(0, b"")
    shp = _shp_bytes([point, holed, line, null])
    dbf = _dbf_bytes([("NAME", "C", 8), ("POP", "N", 10)],
                     [("pt", 42), ("donut", 7), ("ln", None), ("none", 0)])
    (tmp_path / "t.shp").write_bytes(shp)
    (tmp_path / "t.dbf").write_bytes(dbf)
    gdf = read_shapefile(spark, str(tmp_path / "t.shp"))
    rows = (gdf.df
            .withColumn("gt", st.geom_type_id("geometry"))
            .withColumn("area", st.area("geometry"))
            .withColumn("ln", st.length("geometry")).collect())
    by_name = {r["NAME"]: r for r in rows}
    assert by_name["pt"]["gt"] == 0 and by_name["pt"]["POP"] == 42.0
    assert by_name["donut"]["gt"] == 3
    assert by_name["donut"]["area"] == 96.0          # 100 - 4
    assert by_name["ln"]["gt"] == 5                  # MultiLineString
    assert by_name["ln"]["ln"] == 10.0               # 5 + 5
    assert by_name["ln"]["POP"] is None
    assert by_name["none"]["gt"] in (None, -1)       # Null shape = MISSING
    # normalized winding: exterior CCW
    assert gdf.df.select(st.is_ccw(st.exterior("geometry"))) \
        .collect()[1][0] is True


def test_dbf_deleted_record_keeps_index_alignment():
    # a deletion-flagged .dbf record must hold its slot (all-None row)
    # so attributes stay aligned to .shp geometries by index (ADVICE r6)
    from arctic_spark.geom.shp import parse_dbf
    raw = _dbf_bytes([("NAME", "C", 8), ("POP", "N", 10)],
                     [("first", 1), ("dead", 2), ("third", 3)])
    # flip record 2's deletion flag to '*' — records start after the
    # 0x0D header terminator, each 1 + 8 + 10 bytes long
    start = raw.index(b"\x0d") + 1
    rec_len = 19
    raw = bytearray(raw)
    assert raw[start + rec_len] == 0x20
    raw[start + rec_len] = 0x2A
    names, rows = parse_dbf(bytes(raw))
    assert names == ["NAME", "POP"]
    assert rows == [("first", 1.0), (None, None), ("third", 3.0)]


def test_to_geopandas_import_gated(spark):
    """to_geopandas (reference geodataframe.py:76) raises a clean
    ImportError in this geopandas-less container and names the
    dependency-free fallback; where geopandas exists the WKB round
    trip is exercised instead."""
    import pytest
    from arctic_spark import GeoDataFrame, st, to_geopandas
    from pyspark.sql import functions as F
    src = GeoDataFrame(
        spark.range(3).select(
            F.col("id"),
            st.point(F.col("id").cast("double"),
                     F.lit(1.0)).alias("geometry")))
    try:
        import geopandas  # noqa: F401
        have = True
    except ImportError:
        have = False
    if not have:
        with pytest.raises(ImportError, match="to_pandas_wkb"):
            to_geopandas(src)
    else:  # pragma: no cover - container has no geopandas
        out = to_geopandas(src)
        assert len(out) == 3 and out.geometry.iloc[1].x == 1.0


def test_kml_roundtrip(spark, tmp_path):
    """Native KML write → read round trip (reference reads KML only
    through GDAL, io/file.py:15-119): geometry, Placemark name, and
    ExtendedData attributes all survive; KML is pinned to EPSG:4326."""
    from pyspark.sql import functions as F
    from arctic_spark import GeoDataFrame, st
    from arctic_spark.io import read_kml, write_kml
    src = GeoDataFrame(spark.range(4).select(
        F.concat(F.lit("pm"), F.col("id")).alias("label"),
        F.col("id").cast("string").alias("k"),
        st.point(F.col("id").cast("double"),
                 F.col("id").cast("double") * 2 + 0.5).alias("geometry")))
    p = str(tmp_path / "t.kml")
    write_kml(src, p, name_column="label")
    back = read_kml(spark, p)
    assert back.crs == "EPSG:4326"
    rows = back.df.orderBy("name").collect()
    assert [r["name"] for r in rows] == ["pm0", "pm1", "pm2", "pm3"]
    assert [r["k"] for r in rows] == ["0", "1", "2", "3"]
    xs = back.df.select(st.x("geometry").alias("x"),
                        st.y("geometry").alias("y")).orderBy("x").collect()
    assert [(r.x, r.y) for r in xs] == [(0.0, 0.5), (1.0, 2.5),
                                        (2.0, 4.5), (3.0, 6.5)]


def test_kml_polygon_multigeometry_and_dispatch(spark, tmp_path):
    """Polygon with a hole and MultiGeometry parse through the KML
    namespace-agnostic path; read_file dispatches on .kml."""
    from arctic_spark import st
    from arctic_spark.io import read_file
    from pyspark.sql import functions as F
    kml = """<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document>
<Placemark><name>poly</name><Polygon>
 <outerBoundaryIs><LinearRing><coordinates>
  0,0 10,0 10,10 0,10 0,0</coordinates></LinearRing></outerBoundaryIs>
 <innerBoundaryIs><LinearRing><coordinates>
  2,2 4,2 4,4 2,4 2,2</coordinates></LinearRing></innerBoundaryIs>
</Polygon></Placemark>
<Placemark><name>multi</name><MultiGeometry>
 <Point><coordinates>1,1</coordinates></Point>
 <Point><coordinates>2,2</coordinates></Point>
</MultiGeometry></Placemark>
</Document></kml>"""
    p = str(tmp_path / "d.kml")
    with open(p, "w") as fh:
        fh.write(kml)
    back = read_file(spark, p)
    rows = back.df.select(
        "name",
        st.area("geometry").alias("a"),
        st.num_parts("geometry").cast("long").alias("np")) \
        .orderBy("name").collect()
    by = {r["name"]: r for r in rows}
    assert by["poly"]["a"] == 96.0          # 100 - 4 hole
    assert by["multi"]["np"] == 2


def test_gpx_layers(spark, tmp_path):
    """GPX waypoints/routes/tracks parse into the three GDAL-style
    layers with the right geometry types and attribute columns."""
    from arctic_spark import st
    from arctic_spark.io import read_gpx
    gpx = """<?xml version="1.0" encoding="UTF-8"?>
<gpx version="1.1" creator="t" xmlns="http://www.topografix.com/GPX/1/1">
 <wpt lat="51.5" lon="-0.12"><ele>11.0</ele><name>london</name>
   <time>2020-01-01T00:00:00Z</time></wpt>
 <wpt lat="48.85" lon="2.35"><name>paris</name></wpt>
 <rte><name>r1</name>
   <rtept lat="0" lon="0"/><rtept lat="1" lon="1"/>
   <rtept lat="2" lon="3"/></rte>
 <trk><name>t1</name>
  <trkseg><trkpt lat="0" lon="0"/><trkpt lat="0" lon="1"/></trkseg>
  <trkseg><trkpt lat="5" lon="5"/><trkpt lat="6" lon="5"/>
          <trkpt lat="7" lon="5"/></trkseg>
 </trk>
</gpx>"""
    p = str(tmp_path / "d.gpx")
    with open(p, "w") as fh:
        fh.write(gpx)
    w = read_gpx(spark, p, layer="waypoints")
    rows = w.df.orderBy("name").collect()
    assert [r["name"] for r in rows] == ["london", "paris"]
    assert rows[0]["ele"] == 11.0 and rows[1]["ele"] is None
    r = read_gpx(spark, p, layer="routes").df.collect()[0]
    assert r["n_points"] == 3
    t = read_gpx(spark, p, layer="tracks")
    row = t.df.select(
        "name", "n_segments",
        st.num_parts("geometry").cast("long").alias("np"),
        st.length("geometry").alias("len")).collect()[0]
    assert row["name"] == "t1" and row["n_segments"] == 2
    assert row["np"] == 2 and row["len"] == 3.0


def test_read_file_pushdown_args(spark, tmp_path):
    """read_file's scan-time pushdown surface (reference
    io/file.py:48-86 forwards these to GDAL): bbox uses the REAL
    packed-Hilbert index for .fgb and a bounds filter elsewhere;
    columns projects; max_features limits."""
    from pyspark.sql import functions as F
    from arctic_spark import GeoDataFrame, st
    from arctic_spark.io import read_file, write_flatgeobuf, write_kml
    src = GeoDataFrame(spark.range(100).select(
        F.col("id").alias("pid"),
        F.concat(F.lit("n"), F.col("id")).alias("tag"),
        st.point((F.col("id") % 10).cast("double"),
                 (F.col("id") / 10).cast("long").cast("double"))
        .alias("geometry")))
    fgb = str(tmp_path / "p.fgb")
    write_flatgeobuf(src, fgb)
    out = read_file(spark, fgb, bbox=(2.5, 2.5, 4.5, 4.5))
    assert out.df.count() == 4          # x in {3,4}, y in {3,4}
    out = read_file(spark, fgb, columns=["pid"], max_features=7)
    assert set(out.df.columns) == {"pid", "geometry"}
    assert out.df.count() == 7
    kml = str(tmp_path / "p.kml")
    write_kml(GeoDataFrame(src.df.withColumn(
        "pid", F.col("pid").cast("string"))), kml)
    out = read_file(spark, kml, bbox=(2.5, 2.5, 4.5, 4.5))
    assert out.df.count() == 4


def test_gml_reader_wfs_document(spark, tmp_path):
    """GML 3 WFS-style FeatureCollection: pos/posList/exterior parse,
    feature attributes + gml:id survive, Curve segments chain, GML2
    coordinates + outerBoundaryIs parse, swap_axes flips lat-first."""
    from arctic_spark import st
    from arctic_spark.io import read_gml, read_file
    gml = """<?xml version="1.0"?>
<wfs:FeatureCollection xmlns:wfs="http://www.opengis.net/wfs"
    xmlns:gml="http://www.opengis.net/gml" xmlns:app="http://x">
 <gml:featureMember>
  <app:City gml:id="c1"><app:name>alpha</app:name>
   <app:geom><gml:Point><gml:pos>10 20</gml:pos></gml:Point></app:geom>
  </app:City>
 </gml:featureMember>
 <gml:featureMember>
  <app:Road gml:id="r1"><app:name>beta</app:name>
   <app:geom><gml:Curve><gml:segments>
     <gml:LineStringSegment><gml:posList>0 0 1 0</gml:posList>
     </gml:LineStringSegment>
     <gml:LineStringSegment><gml:posList>1 0 1 2</gml:posList>
     </gml:LineStringSegment>
   </gml:segments></gml:Curve></app:geom>
  </app:Road>
 </gml:featureMember>
 <gml:featureMember>
  <app:Zone gml:id="z1"><app:name>gamma</app:name>
   <app:geom><gml:Polygon>
    <gml:outerBoundaryIs><gml:LinearRing>
     <gml:coordinates>0,0 4,0 4,4 0,4 0,0</gml:coordinates>
    </gml:LinearRing></gml:outerBoundaryIs>
    <gml:innerBoundaryIs><gml:LinearRing>
     <gml:coordinates>1,1 2,1 2,2 1,2 1,1</gml:coordinates>
    </gml:LinearRing></gml:innerBoundaryIs>
   </gml:Polygon></app:geom>
  </app:Zone>
 </gml:featureMember>
</wfs:FeatureCollection>"""
    p = str(tmp_path / "d.gml")
    with open(p, "w") as fh:
        fh.write(gml)
    out = read_file(spark, p)          # dispatch on .gml
    rows = {r["gml_id"]: r for r in out.df.select(
        "gml_id", "name",
        st.x(st.centroid("geometry")).alias("cx"),
        st.area("geometry").alias("a"),
        st.length("geometry").alias("ln")).collect()}
    assert rows["c1"]["name"] == "alpha" and rows["c1"]["cx"] == 10.0
    assert rows["r1"]["ln"] == 3.0     # chained segments share a vertex
    assert rows["z1"]["a"] == 15.0     # 16 - 1 hole
    sw = read_gml(spark, p, swap_axes=True)
    r = sw.df.where("gml_id = 'c1'").select(
        st.x("geometry").alias("x"), st.y("geometry").alias("y")) \
        .collect()[0]
    assert (r.x, r.y) == (20.0, 10.0)
