"""Arrow IPC (.arrow / Feather V2) ingestion (r10): the reference's only
bundled data format — its dataset loader reads .arrow files
(py-geopolars/python/geopolars/datasets/__init__.py:39-42) and its
conftest fixtures build on naturalearth_cities
(py-geopolars/tests/unit/conftest.py:7-12). Parity is checked against
the reference's ACTUAL bundled files (read-only fixtures)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

import arctic_spark
from arctic_spark import GeoDataFrame, st
from arctic_spark import io as aio

REF_DATA = "/root/reference/data/cities.arrow"
REF_DATASETS = "/root/reference/py-geopolars/python/geopolars/datasets"

needs_ref = pytest.mark.skipif(not os.path.exists(REF_DATA),
                               reason="reference repo not mounted")


@needs_ref
def test_read_reference_cities_arrow(spark):
    """The reference bench input (geopolars/benches/affine.rs:8-21):
    202 point rows, name + geometry, WGS84 from the geo metadata."""
    gdf = aio.read_ipc(spark, REF_DATA)
    assert isinstance(gdf, GeoDataFrame)
    assert gdf.crs == "EPSG:4326"
    rows = gdf.df.select(
        "name",
        st.x(F.col("geometry")).alias("x"),
        st.y(F.col("geometry")).alias("y"),
        st.geom_type_name(F.col("geometry")).alias("t")).collect()
    assert len(rows) == 202
    assert all(r.t == "Point" for r in rows)
    assert all(-180 <= r.x <= 180 and -90 <= r.y <= 90 for r in rows)
    names = {r.name for r in rows}
    assert "Vatican City" in names or len(names) > 150


@needs_ref
def test_read_reference_dataset_shapes(spark):
    """The reference's three bundled datasets keep their documented
    shapes (conftest row-count invariants; FIXTURES.md F1-F4)."""
    cities = aio.read_ipc(spark, f"{REF_DATASETS}/naturalearth_cities.arrow")
    assert cities.df.count() == 243            # conftest.py:7-12 fixture
    lowres = aio.read_ipc(spark, f"{REF_DATASETS}/naturalearth_lowres.arrow")
    assert lowres.df.count() == 177
    assert {"pop_est", "continent", "name", "iso_a3",
            "gdp_md_est"} <= set(lowres.df.columns)
    kinds = {r.t for r in lowres.df.select(
        st.geom_type_name(F.col("geometry")).alias("t")).collect()}
    assert kinds <= {"Polygon", "MultiPolygon"} and len(kinds) == 2
    nybb = aio.read_ipc(spark, f"{REF_DATASETS}/nybb.arrow")
    rows = nybb.df.select("BoroCode", "BoroName").orderBy("BoroCode") \
        .collect()
    assert [r.BoroCode for r in rows] == [1, 2, 3, 4, 5]  # uint8 widened
    assert "Manhattan" in [r.BoroName for r in rows]
    # nybb ships in the NY State Plane CRS
    assert nybb.crs == "EPSG:2263"


@needs_ref
def test_read_file_dispatch_and_pushdown_args(spark):
    gdf = arctic_spark.read_file(spark, REF_DATA, max_features=10)
    assert gdf.df.count() == 10
    gdf2 = arctic_spark.read_file(
        spark, f"{REF_DATASETS}/naturalearth_lowres.arrow",
        columns=["name", "continent"])
    assert set(gdf2.df.columns) == {"name", "continent", "geometry"}
    # bbox post-filter composes with the arrow reader
    gdf3 = arctic_spark.read_file(spark, REF_DATA,
                                  bbox=(-20, -20, 20, 20))
    n3 = gdf3.df.count()
    assert 0 < n3 < 202


def test_ipc_roundtrip(spark):
    rows = [(1, "a", "POINT (1 2)"),
            (2, "b", "LINESTRING (0 0, 3 4)"),
            (3, "c", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
            (4, "d", "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
                     "((5 5, 6 5, 6 6, 5 6, 5 5)))")]
    df = spark.createDataFrame(rows, "id long, tag string, wkt string") \
        .select("id", "tag", st.from_wkt("wkt").alias("geometry"))
    gdf = GeoDataFrame(df, crs="EPSG:2154")
    path = os.path.join(tempfile.gettempdir(),
                        f"arctic_ipc_rt_{os.getpid()}.arrow")
    try:
        aio.write_ipc(gdf, path)
        back = aio.read_ipc(spark, path)
        assert isinstance(back, GeoDataFrame)
        assert back.crs == "EPSG:2154"
        got = {r.id: (r.tag, r.w) for r in back.df.select(
            "id", "tag", st.to_wkt(F.col("geometry")).alias("w"))
            .collect()}
        want = {r[0]: (r[1], r[2]) for r in rows}
        assert got == want
    finally:
        if os.path.exists(path):
            os.remove(path)


def test_ipc_attribute_only_table(spark):
    import pyarrow as pa
    import pyarrow.ipc as ipc
    path = os.path.join(tempfile.gettempdir(),
                        f"arctic_ipc_plain_{os.getpid()}.arrow")
    try:
        t = pa.table({"k": pa.array([1, 2, 3], pa.uint32()),
                      "v": ["x", "y", "z"]})
        with ipc.new_file(path, t.schema) as w:
            w.write_table(t)
        out = aio.read_ipc(spark, path)
        assert not isinstance(out, GeoDataFrame)
        assert sorted((r.k, r.v) for r in out.collect()) == \
            [(1, "x"), (2, "y"), (3, "z")]
        assert dict(out.dtypes)["k"] == "bigint"   # uint widened
    finally:
        if os.path.exists(path):
            os.remove(path)


def test_ipc_stream_format_fallback(spark):
    import pyarrow as pa
    import pyarrow.ipc as ipc
    path = os.path.join(tempfile.gettempdir(),
                        f"arctic_ipc_stream_{os.getpid()}.arrow")
    try:
        t = pa.table({"k": [10, 20]})
        with ipc.new_stream(path, t.schema) as w:
            w.write_table(t)
        out = aio.read_ipc(spark, path)
        assert sorted(r.k for r in out.collect()) == [10, 20]
    finally:
        if os.path.exists(path):
            os.remove(path)


def test_crs_meta_parsing():
    from arctic_spark.io import _crs_from_geo_meta
    assert _crs_from_geo_meta({"crs": "EPSG:3035"}) == "EPSG:3035"
    assert _crs_from_geo_meta({}) == "EPSG:4326"
    assert _crs_from_geo_meta(
        {"crs": {"id": {"authority": "EPSG", "code": 2263}}}) == "EPSG:2263"
    wkt2 = ('PROJCRS["x",BASEGEOGCRS["y",ID["EPSG",4269]],'
            'ID["EPSG",2263]]')
    assert _crs_from_geo_meta({"crs": wkt2}) == "EPSG:2263"
    wkt1 = ('PROJCS["x",GEOGCS["y",AUTHORITY["EPSG","4269"]],'
            'AUTHORITY["EPSG","2263"]]')
    assert _crs_from_geo_meta({"crs": wkt1}) == "EPSG:2263"


def test_dataset_loader_api(spark):
    """Reference datasets API parity: available tuple, get_path error
    shape, and load_dataset row-count invariants (the reference
    conftest's fixtures, py-geopolars/tests/unit/conftest.py:7-12)."""
    from arctic_spark import datasets as ds
    assert ds.available == ("naturalearth_cities", "nybb",
                            "naturalearth_lowres")
    with pytest.raises(ValueError, match="not available"):
        ds.get_path("atlantis")
    cities = ds.load_dataset(spark, "naturalearth_cities")
    assert cities.df.count() == 243
    nyb = ds.load_dataset(spark, "nybb")
    assert nyb.df.count() == 5
    low = ds.load_dataset(spark, "naturalearth_lowres")
    assert low.df.count() == 177


@needs_ref
def test_read_file_arrow_bbox_before_limit(spark):
    """bbox filters BEFORE max_features on the .arrow dispatch, like
    every other format (review r10: the Arrow-side slice used to run
    first and could starve the bbox filter)."""
    full = arctic_spark.read_file(spark, REF_DATA,
                                  bbox=(-20, -20, 20, 20))
    n_in_box = full.df.count()
    assert n_in_box > 3
    lim = arctic_spark.read_file(spark, REF_DATA,
                                 bbox=(-20, -20, 20, 20),
                                 max_features=3)
    assert lim.df.count() == 3      # limit applies to FILTERED rows


def test_get_path_env_override(monkeypatch, tmp_path):
    """get_path resolves the reference mount via $ARCTIC_SPARK_REF_DATA
    (ADVICE r10) — no hardcoded machine path in the shipped library."""
    from arctic_spark import datasets
    monkeypatch.setenv("ARCTIC_SPARK_REF_DATA", str(tmp_path))
    with pytest.raises(FileNotFoundError):
        datasets.get_path("nybb")
    p = tmp_path / "nybb.arrow"
    p.write_bytes(b"\x00")
    assert datasets.get_path("nybb") == str(p)


def test_from_arrow_unsupported_attr_type_message(spark):
    """Unsupported Arrow attribute types in the nested-GeoArrow ingest
    raise a descriptive error instead of a deep createDataFrame type
    failure (ADVICE r10)."""
    import decimal
    import pyarrow as pa
    from pyspark.sql import functions as F
    from arctic_spark import GeoDataFrame, st
    from arctic_spark.geodataframe import from_arrow, to_arrow
    gdf = GeoDataFrame(
        spark.createDataFrame([("POINT (1 2)",), ("POINT (3 4)",)],
                              "wkt string")
        .select(st.from_wkt("wkt").alias("geometry")), crs="EPSG:4326")
    t = to_arrow(gdf, encoding="geoarrow")
    t = t.append_column("d", pa.array([decimal.Decimal("1.5"),
                                       decimal.Decimal("2.5")]))
    with pytest.raises(TypeError, match="unsupported Arrow attribute"):
        from_arrow(spark, t)


def test_read_ipc_spill_path_matches_inmemory(spark, tmp_path):
    """Above spill_threshold, read_ipc streams record batches through
    a temp parquet dataset (bounded driver memory, r11) — output rows,
    schema, CRS, projection and limit semantics all match the
    in-memory path."""
    import pyarrow as pa
    from arctic_spark import GeoDataFrame, io as aio, st
    gdf = GeoDataFrame(
        spark.range(200).select(
            F.col("id").cast("long").alias("k"),
            (F.col("id") % 7).cast("long").alias("grp"),
            st.point(F.col("id").cast("double"),
                     F.col("id").cast("double") / 2).alias("geometry")),
        crs="EPSG:3857")
    p = str(tmp_path / "big.arrow")
    aio.write_ipc(gdf, p)

    mem = aio.read_ipc(spark, p)
    spill = aio.read_ipc(spark, p, spill_threshold=1)   # force spill
    assert spill.crs == mem.crs == "EPSG:3857"
    assert spill.df.columns == mem.df.columns

    def snap(g):
        return sorted((r.k, r.grp, st_round(r.geometry)) for r in
                      g.df.collect())

    def st_round(g):
        return (g["gt"], tuple(g["xs"]), tuple(g["ys"]))

    assert snap(spill) == snap(mem)
    # projection + limit semantics
    a = aio.read_ipc(spark, p, columns=["k"], max_features=10)
    b = aio.read_ipc(spark, p, columns=["k"], max_features=10,
                     spill_threshold=1)
    assert sorted(r.k for r in a.df.collect()) == \
        sorted(r.k for r in b.df.collect())
    assert a.df.columns == b.df.columns
