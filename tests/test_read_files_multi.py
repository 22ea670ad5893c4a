"""Distributed multi-file ingest (r11, VERDICT r10 #1): read_files
lists files, distributes one slice of paths per task, and runs the
existing pure-Python codecs EXECUTOR-side. Correctness contract: output
rows are identical to a loop of single-file reads unioned."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

import arctic_spark
from arctic_spark import GeoDataFrame, st
from arctic_spark import io as aio


def _mkdir():
    return tempfile.mkdtemp(prefix="arctic_multi_")


def _gdf(spark, offset, n=5, crs="EPSG:4326"):
    df = spark.range(offset, offset + n).select(
        F.col("id").cast("long").alias("k"),
        F.concat(F.lit("row"), F.col("id")).alias("tag"),
        st.make_envelope(
            F.col("id").cast("double"), F.lit(0.0),
            F.col("id").cast("double") + 1.0, F.lit(2.0)
        ).alias("geometry"))
    return GeoDataFrame(df, crs=crs)


def _collect_sorted(df):
    cols = df.columns
    return sorted(
        tuple(str(r[c]) for c in cols) for r in
        (df.df if isinstance(df, GeoDataFrame) else df).collect())


@pytest.mark.parametrize("ext,writer,reader", [
    (".gpkg", lambda g, p: aio.write_geopackage(g, p),
     lambda s, p: aio.read_geopackage(s, p)),
    (".fgb", lambda g, p: aio.write_flatgeobuf(g, p),
     lambda s, p: aio.read_flatgeobuf(s, p)),
    (".arrow", lambda g, p: aio.write_ipc(g, p),
     lambda s, p: aio.read_ipc(s, p)),
    (".kml", lambda g, p: aio.write_kml(g, p, name_column="tag"),
     lambda s, p: aio.read_kml(s, p)),
])
def test_multifile_row_identical(spark, ext, writer, reader, tmp_path):
    d = str(tmp_path)
    paths = []
    for i in range(4):
        p = os.path.join(d, f"part{i}{ext}")
        writer(_gdf(spark, i * 10), p)
        paths.append(p)
    multi = aio.read_files(spark, os.path.join(d, f"*{ext}"))
    singles = [reader(spark, p) for p in paths]
    expect = sorted(sum((_collect_sorted(s) for s in singles), []))
    got = _collect_sorted(multi)
    assert got == expect
    assert multi.df.count() == 20
    # directory form and explicit-list form agree with the glob form
    assert _collect_sorted(aio.read_files(spark, d)) == got
    assert _collect_sorted(aio.read_files(spark, paths)) == got
    # read_file routes globs to the multi path
    assert _collect_sorted(
        arctic_spark.read_file(spark, os.path.join(d, f"*{ext}"))) == got


def test_multifile_partition_distribution(spark, tmp_path):
    """One slice of paths per task: the scan parallelism scales with
    the file count (up to the requested cap), NOT driver-side."""
    d = str(tmp_path)
    for i in range(8):
        aio.write_ipc(_gdf(spark, i * 10, n=2),
                      os.path.join(d, f"f{i}.arrow"))
    out = aio.read_files(spark, d, num_partitions=8)
    assert out.df.rdd.getNumPartitions() == 8
    assert out.df.count() == 16
    # default partitioning never exceeds the file count
    out2 = aio.read_files(spark, d)
    assert 1 <= out2.df.rdd.getNumPartitions() <= 8


def test_multifile_schema_union_and_extra_column(spark, tmp_path):
    """Later files may omit probed columns (null-filled); a column
    absent from every probed file raises with schema_files advice."""
    d = str(tmp_path)
    g1 = _gdf(spark, 0)
    aio.write_geopackage(g1, os.path.join(d, "a.gpkg"))
    g2 = GeoDataFrame(_gdf(spark, 10).df.select("k", "geometry"),
                      crs="EPSG:4326")
    aio.write_geopackage(g2, os.path.join(d, "b.gpkg"))
    out = aio.read_files(spark, d)   # probe=a.gpkg (sorted first)
    rows = out.df.orderBy("k").collect()
    assert len(rows) == 10
    assert [r.tag for r in rows[:5]] == [f"row{i}" for i in range(5)]
    assert all(r.tag is None for r in rows[5:])
    # now the extra column lives in the UNPROBED file → error
    with pytest.raises(Exception, match="schema_files"):
        aio.read_files(spark, [os.path.join(d, "b.gpkg"),
                               os.path.join(d, "a.gpkg")]).df.count()
    # probing both files accepts it
    out3 = aio.read_files(spark, [os.path.join(d, "b.gpkg"),
                                  os.path.join(d, "a.gpkg")],
                          schema_files=2)
    assert out3.df.count() == 10


def test_multifile_crs_mismatch_raises(spark, tmp_path):
    d = str(tmp_path)
    aio.write_geopackage(_gdf(spark, 0), os.path.join(d, "a.gpkg"))
    aio.write_geopackage(_gdf(spark, 10, crs="EPSG:3857"),
                         os.path.join(d, "b.gpkg"))
    with pytest.raises(Exception, match="CRS"):
        aio.read_files(spark, d).df.count()
    # explicit crs= overrides the check
    assert aio.read_files(spark, d, crs="EPSG:4326").df.count() == 10


def test_multifile_mixed_format_raises(spark, tmp_path):
    d = str(tmp_path)
    aio.write_geopackage(_gdf(spark, 0), os.path.join(d, "a.gpkg"))
    aio.write_ipc(_gdf(spark, 10), os.path.join(d, "b.arrow"))
    with pytest.raises(ValueError, match="mixed formats"):
        aio.read_files(spark, d)


def test_multifile_shapefile_sidecars_skipped(spark, tmp_path):
    """A directory of shapefiles: .dbf/.shx sidecars never become
    rows; geometry + attributes round the multi path."""
    import struct
    from tests.test_io_datasets import (_dbf_bytes, _shp_bytes,
                                        _shp_record)
    d = str(tmp_path)
    for i in range(3):
        pt = _shp_record(1, struct.pack("<dd", float(i), float(i) + 1.0))
        (tmp_path / f"t{i}.shp").write_bytes(_shp_bytes([pt]))
        (tmp_path / f"t{i}.dbf").write_bytes(
            _dbf_bytes([("NAME", "C", 8)], [(f"pt{i}",)]))
    out = aio.read_files(spark, d)
    rows = out.df.orderBy("NAME").collect()
    assert [r.NAME for r in rows] == ["pt0", "pt1", "pt2"]
    assert all(r.geometry is not None for r in rows)


@pytest.mark.parametrize("fmt", ["fgb", "gpkg", "arrow"])
def test_write_files_roundtrip(spark, fmt, tmp_path):
    """Distributed multi-file sink (r11): one file per non-empty
    partition written executor-side; read_files round-trips
    row-identically and the file count tracks the partitioning."""
    d = os.path.join(str(tmp_path), f"out_{fmt}")
    g = _gdf(spark, 0, n=40)
    n_files = aio.write_files(g, d, format=fmt, num_files=4)
    assert 1 <= n_files <= 4
    assert len(os.listdir(d)) == n_files
    back = aio.read_files(spark, d)
    if fmt == "gpkg":
        # the gpkg reader surfaces the writer's autoincrement fid PK
        # (same as the single-file reader) — not part of the payload
        back = GeoDataFrame(back.df.drop("fid"), "geometry", back.crs)
    assert _collect_sorted(back) == _collect_sorted(g)
    # errorifexists honors mode
    with pytest.raises(ValueError, match="exists"):
        aio.write_files(g, d, format=fmt, mode="errorifexists")


def test_write_files_kml_named(spark, tmp_path):
    d = os.path.join(str(tmp_path), "out_kml")
    g = _gdf(spark, 100, n=12)
    n_files = aio.write_files(g, d, format="kml", num_files=3,
                              name_column="tag")
    assert len(os.listdir(d)) == n_files
    back = aio.read_files(spark, d)
    assert back.df.count() == 12
    assert sorted(r.name for r in back.df.collect()) == \
        sorted(f"row{i}" for i in range(100, 112))


def test_write_files_bad_format(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported write_files"):
        aio.write_files(_gdf(spark, 0), str(tmp_path / "x"),
                        format="shp")


def test_multifile_probe_no_crs_but_later_file_declares(spark, tmp_path,
                                                        monkeypatch):
    """ADVICE r11: when the probed file(s) carry no CRS but a later
    file declares one, stamping DEFAULT_CRS silently would be a lie —
    the task raises asking for an explicit crs=."""
    d = str(tmp_path)
    aio.write_flatgeobuf(_gdf(spark, 0), os.path.join(d, "a.fgb"))
    aio.write_flatgeobuf(_gdf(spark, 10), os.path.join(d, "b.fgb"))
    orig = aio._MULTI_BATCH_PARSERS[".fgb"]
    orig_probe = aio._MULTI_PROBE_PARSERS[".fgb"]

    def wrapped(path, **kw):
        flds, rows, crs = orig(path, **kw)
        return flds, rows, (None if path.endswith("a.fgb") else crs)

    def wrapped_probe(path, **kw):
        flds, payload, crs = orig_probe(path, **kw)
        return flds, payload, (None if path.endswith("a.fgb") else crs)

    monkeypatch.setitem(aio._MULTI_BATCH_PARSERS, ".fgb", wrapped)
    monkeypatch.setitem(aio._MULTI_PROBE_PARSERS, ".fgb", wrapped_probe)
    with pytest.raises(Exception, match="carried none"):
        aio.read_files(spark, d).df.count()
    # explicit crs= resolves it
    assert aio.read_files(spark, d, crs="EPSG:4326").df.count() == 10


def test_multifile_gpkg_typeless_column_null_head(spark, tmp_path):
    """ADVICE r11: a declared-typeless gpkg column whose first 100 rows
    (the probe window) are all NULL must still type from data — the
    probe now runs a targeted `WHERE col IS NOT NULL LIMIT 1` query
    instead of defaulting to String and failing the full parse."""
    import sqlite3
    p = os.path.join(str(tmp_path), "late.gpkg")
    aio.write_geopackage(_gdf(spark, 0, n=120), p, layer="t")
    con = sqlite3.connect(p)
    con.execute('ALTER TABLE "t" ADD COLUMN extra')      # typeless
    con.execute('UPDATE "t" SET extra = 7 WHERE rowid > 110')
    con.commit()
    con.close()
    out = aio.read_files(spark, [p])
    assert dict(out.df.dtypes)["extra"] == "bigint"
    vals = [r.extra for r in out.df.collect()]
    assert vals.count(7) == 10 and vals.count(None) == 110


# ---- r12: bbox pushdown + schema modes + Arrow exchange ------------


def _bbox_expect(gdfs, bbox):
    """Features whose bounds intersect bbox, via the reference filter."""
    xmin, ymin, xmax, ymax = bbox
    out = []
    for g in gdfs:
        d = g.df.select("k")
        kept = g.df.where(
            (st.bounds(F.col("geometry"))[0] <= xmax)
            & (st.bounds(F.col("geometry"))[2] >= xmin)
            & (st.bounds(F.col("geometry"))[1] <= ymax)
            & (st.bounds(F.col("geometry"))[3] >= ymin))
        out.extend(r.k for r in kept.select("k").collect())
    return sorted(out)


@pytest.mark.parametrize("fmt,writer", [
    (".fgb", lambda g, p: aio.write_flatgeobuf(g, p)),   # Hilbert index
    (".gpkg", lambda g, p: aio.write_geopackage(g, p)),  # no rtree → scan
    (".kml", lambda g, p: aio.write_kml(g, p)),          # post-filter
])
def test_multifile_bbox_pushdown_row_identical(spark, fmt, writer,
                                               tmp_path):
    """read_files(bbox=) returns exactly the features whose bounds
    intersect the box, regardless of whether the format prunes via an
    index (.fgb), scans the codec (.gpkg), or post-filters (.kml)."""
    d = str(tmp_path)
    gdfs = [_gdf(spark, i * 10) for i in range(3)]
    for i, g in enumerate(gdfs):
        writer(g, os.path.join(d, f"p{i}{fmt}"))
    bbox = (10.5, 0.5, 12.5, 1.5)    # inside file p1's envelopes
    out = aio.read_files(spark, d, bbox=bbox)
    got = sorted(int(float(r.k)) for r in
                 out.df.selectExpr("CAST(k AS STRING) k").collect())
    assert got == _bbox_expect(gdfs, bbox)
    assert got                       # non-degenerate: something matched
    full = aio.read_files(spark, d).df.count()
    assert len(got) < full           # non-degenerate: something pruned


def test_multifile_gpkg_rtree_index_used(spark, tmp_path):
    """When the GeoPackage carries the spec's rtree_<table>_<col>
    index, candidates come from an R-tree range query (float32-widened
    boxes) and the exact refine keeps intersects-parity."""
    import sqlite3
    p = os.path.join(str(tmp_path), "idx.gpkg")
    g = _gdf(spark, 0, n=50)
    aio.write_geopackage(g, p, layer="t")
    con = sqlite3.connect(p)
    con.execute('CREATE VIRTUAL TABLE "rtree_t_geometry" USING '
                "rtree(id, minx, maxx, miny, maxy)")
    # envelopes are [k, 0, k+1, 2]
    for k in range(50):
        con.execute('INSERT INTO "rtree_t_geometry" VALUES (?,?,?,?,?)',
                    (k + 1, float(k), float(k) + 1.0, 0.0, 2.0))
    con.commit()
    con.close()
    bbox = (20.2, 0.5, 23.8, 1.0)
    out = aio.read_files(spark, [p], bbox=bbox)
    got = sorted(r.k for r in out.df.select("k").collect())
    assert got == _bbox_expect([g], bbox) == [20, 21, 22, 23]
    # sanity: a query box hitting nothing returns zero rows
    assert aio.read_files(spark, [p],
                          bbox=(900.0, 900.0, 901.0, 901.0)).df.count() == 0


def test_multifile_schema_mode_union_null(spark, tmp_path):
    """schema_mode='union_null': a task-side file with columns absent
    from the probed schema DROPS them instead of failing the job; the
    probed columns it lacks still null-fill. schema_files='all' probes
    every file so nothing is unprobed."""
    d = str(tmp_path)
    aio.write_geopackage(
        GeoDataFrame(_gdf(spark, 0).df.select("k", "geometry"),
                     crs="EPSG:4326"), os.path.join(d, "a.gpkg"))
    aio.write_geopackage(_gdf(spark, 10), os.path.join(d, "b.gpkg"))
    # strict (default): b.gpkg's unprobed `tag` raises task-side
    with pytest.raises(Exception, match="schema_files"):
        aio.read_files(spark, d).df.count()
    # union_null: tag dropped, read succeeds
    out = aio.read_files(spark, d, schema_mode="union_null")
    # (fid is the gpkg writer's autoincrement PK, present in both files)
    assert sorted(out.df.columns) == ["fid", "geometry", "k"]
    assert out.df.count() == 10
    # schema_files='all' probes b.gpkg too → tag survives
    out2 = aio.read_files(spark, d, schema_files="all")
    assert "tag" in out2.df.columns
    rows = out2.df.orderBy("k").collect()
    assert [r.tag for r in rows[:5]] == [None] * 5
    assert [r.tag for r in rows[5:]] == [f"row{i}" for i in range(10, 15)]
    with pytest.raises(ValueError, match="schema_mode"):
        aio.read_files(spark, d, schema_mode="bogus")


def test_multifile_arrow_exchange_plan(spark, tmp_path):
    """The r12 exchange is mapInArrow (columnar batches), not a
    pickled-row RDD scan: the plan shows MapInArrow and no RDD scan
    node feeds the result."""
    d = str(tmp_path)
    for i in range(2):
        aio.write_flatgeobuf(_gdf(spark, i * 10),
                             os.path.join(d, f"x{i}.fgb"))
    out = aio.read_files(spark, d)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan
    assert out.df.count() == 10
