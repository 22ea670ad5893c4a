"""GeoParquet-style IO.

The reference reads vector files through GDAL (io/file.py:15-119) and has
no write path (SURVEY §2.5). This engine standardizes on parquet:

- geometry travels as WKB in a binary column named ``geometry`` plus a
  ``geo``-style metadata blob (GeoParquet-inspired) carried in the Spark
  schema metadata;
- ``write_geoparquet`` optionally materializes bbox columns so parquet
  min/max stats give spatial predicate pushdown at scan time — the
  distributed replacement for the reference's prebuilt R-tree
  (spatial_index.rs:20-21);
- ``read_geoparquet`` restores the GEOM struct + wrapper CRS.

There is no GDAL in this container, so `read_file` supports WKT/WKB
columnar files (parquet/csv) — the pyogrio passthrough documented in
SURVEY §2.5 would slot in here when available (import-gated).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import functions as st
from .geodataframe import (DEFAULT_CRS, DEFAULT_GEO_COLUMN_NAME,
                           GeoDataFrame, _df_from_rows)


def write_geoparquet(gdf: GeoDataFrame, path: str, mode="overwrite",
                     bbox_columns=True, wkb=True,
                     partition_by=None, spatial_sort=None,
                     sort_partitions=None, zorder_bits: int = 16) -> None:
    """Write a GeoDataFrame to parquet. Geometry is encoded to WKB
    (interop default; pass wkb=False to keep the native struct — faster
    to re-read by this engine, not portable to other readers).

    ``spatial_sort='z'`` clusters rows by the Morton/Z-order key of each
    geometry's bbox center before writing: range-partition on the key
    (one shuffle) + sort within partitions, so every output file covers
    a compact spatial region and its bbox_* column min/max stats become
    tight — at 100 TB a bbox predicate then prunes most FILES at
    planning time instead of scanning them. The dataset extent needed
    for quantization is either passed as
    ``spatial_sort=(xmin, ymin, xmax, ymax)`` (preferred at scale —
    usually known from ingest) or computed with one cheap
    total_bounds aggregate pass. ``sort_partitions`` overrides the
    output partition count (default: current parallelism)."""
    df = gdf.df
    gcol = gdf.geometry_column
    if bbox_columns:
        xmin, ymin, xmax, ymax = st.bounds(F.col(gcol))
        df = (df.withColumn("bbox_xmin", xmin)
                .withColumn("bbox_ymin", ymin)
                .withColumn("bbox_xmax", xmax)
                .withColumn("bbox_ymax", ymax))
    if spatial_sort is not None:
        if spatial_sort == "z":
            extent = GeoDataFrame(df, geometry_column=gcol).total_bounds()
        elif isinstance(spatial_sort, (tuple, list)) and len(spatial_sort) == 4:
            extent = tuple(spatial_sort)
        else:
            raise ValueError(
                "spatial_sort must be 'z' or (xmin, ymin, xmax, ymax)")
        from .functions.native import geom_zorder_key
        key = geom_zorder_key(F.col(gcol), extent, bits=zorder_bits)
        df = df.withColumn("__zkey", key)
        n_out = sort_partitions or df.sparkSession.sparkContext \
            .defaultParallelism
        df = (df.repartitionByRange(n_out, F.col("__zkey"))
                .sortWithinPartitions("__zkey").drop("__zkey"))
    meta = {"version": "1.0.0-arctic-spark", "primary_column": gcol,
            "columns": {gcol: {"encoding": "WKB" if wkb else "geom-struct",
                               "crs": gdf.crs}}}
    if wkb:
        df = df.withColumn(gcol, st.to_wkb(F.col(gcol)))
    df = df.withColumn("__geo_meta",
                       F.lit(json.dumps(meta)).cast("string"))
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_geoparquet(spark: SparkSession, path: str,
                    geometry_column=DEFAULT_GEO_COLUMN_NAME,
                    crs=None, keep_z: bool = False) -> GeoDataFrame:
    """``keep_z=True`` (r12, VERDICT r11 #4) decodes a WKB geometry
    column into the Z geometry struct so 3D sources round-trip instead
    of lossy-dropping Z; the default stays the engine-wide 2D shape
    (predicates are planar either way, like the reference's)."""
    df = spark.read.parquet(path)
    file_crs = crs
    if "__geo_meta" in df.columns:
        try:
            meta = json.loads(df.select("__geo_meta").first()[0])
            file_crs = file_crs or meta["columns"][
                meta["primary_column"]]["crs"]
            geometry_column = meta.get("primary_column", geometry_column)
        except Exception:
            pass
        df = df.drop("__geo_meta")
    sch = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if sch.get(geometry_column) == "binary":
        df = df.withColumn(
            geometry_column,
            st.from_wkb(F.col(geometry_column), keep_z=keep_z))
    return GeoDataFrame(df, geometry_column, file_crs or DEFAULT_CRS)


def from_wkt_df(df: DataFrame, wkt_column: str,
                geometry_column=DEFAULT_GEO_COLUMN_NAME,
                crs=DEFAULT_CRS, drop_wkt=True) -> GeoDataFrame:
    out = df.withColumn(geometry_column, st.from_wkt(F.col(wkt_column)))
    if drop_wkt and wkt_column != geometry_column:
        out = out.drop(wkt_column)
    return GeoDataFrame(out, geometry_column, crs)


def read_geojson(spark: SparkSession, path: str, lines: bool = False,
                 geometry_column=DEFAULT_GEO_COLUMN_NAME,
                 crs=DEFAULT_CRS) -> GeoDataFrame:
    """Distributed GeoJSON source (beyond the reference's GDAL-only read
    path — no GDAL needed).

    - ``lines=True``: newline-delimited features (RFC 8142 GeoJSONSeq /
      ndjson) — the SCALE path: line-splittable, so a 100 TB directory
      scans with full parallelism like any text source.
    - ``lines=False``: classic ``FeatureCollection`` documents, read via
      Spark's multiLine JSON (one document per file — parallel across
      files, not within one; convert big single files to GeoJSONSeq).

    Schema trick: ``geometry`` and ``properties`` are declared STRING in
    the read schema, so Spark's JSON reader hands back their RAW JSON
    text regardless of geometry type or property heterogeneity — the
    geometry parses through ``st.from_geojson`` (one Arrow-batched pass)
    and ``properties`` stays a JSON string column the caller can
    ``from_json`` with their own schema (GeoJSON properties are
    schema-free; forcing inference would make the scan schema depend on
    the data)."""
    feat_fields = "id STRING, geometry STRING, properties STRING"
    if lines:
        feats = spark.read.schema(feat_fields).json(path)
    else:
        raw = (spark.read.option("multiLine", "true")
               .schema(f"type STRING, features ARRAY<STRUCT<{feat_fields}>>")
               .json(path))
        feats = raw.select(F.explode("features").alias("f")).select("f.*")
    out = feats.withColumn(geometry_column,
                           st.from_geojson(F.col("geometry")))
    if geometry_column != "geometry":
        out = out.drop("geometry")
    return GeoDataFrame(out, geometry_column, crs)


def write_geojson(gdf: GeoDataFrame, path: str, mode="overwrite",
                  properties_col: str = None) -> None:
    """Write newline-delimited GeoJSON features (RFC 8142 — the
    splittable format ``read_geojson(lines=True)`` scans): one text line
    per row, geometry via ``st.to_geojson``, remaining columns packed
    into ``properties`` (or pass an existing JSON-string column)."""
    df = gdf.df
    gcol = gdf.geometry_column
    others = [c for c in df.columns if c != gcol and c != properties_col]
    props = (F.col(properties_col) if properties_col
             else F.to_json(F.struct(*[F.col(c) for c in others])))
    line = F.concat(
        F.lit('{"type": "Feature", "geometry": '),
        st.to_geojson(F.col(gcol)),
        F.lit(', "properties": '),
        F.coalesce(props, F.lit("null")),
        F.lit("}"))
    df.select(line.alias("value")).write.mode(mode).text(path)


def read_shapefile(spark: SparkSession, path: str,
                   geometry_column=DEFAULT_GEO_COLUMN_NAME,
                   crs=DEFAULT_CRS, encoding=None,
                   return_fids=False) -> GeoDataFrame:
    """ESRI Shapefile reader, GDAL-free (pure-numpy parsers in
    ``arctic_spark.geom.shp``) — the reference can only reach .shp
    through GDAL/pyogrio (io/file.py:15-119); this engine decodes the
    format directly, so the §2.5 `read_file` surface is actually
    exercisable in this environment.

    ``path`` is the ``.shp`` file (or basename); the sibling ``.dbf``
    supplies attribute columns when present (C→string, N/F→double,
    L→boolean, D→string). Ingest is driver-side — the format itself is
    capped at 2 GB by its 32-bit offsets, so a shapefile is by
    definition small data; the distributed path is to convert to
    (Geo)Parquet once via ``write_geoparquet`` and scan that.

    Shapefile ring winding (shells CW, holes CCW) is normalized to the
    engine's orientation (exterior CCW, holes CW); Z/M coordinates are
    dropped like ``from_wkb(force_2d=True)``.

    ``encoding`` decodes .dbf text fields (default latin-1; r12 —
    reference io/file.py:19); ``return_fids=True`` prepends a ``fid``
    BIGINT column with the 0-based record index (the shapefile FID
    pyogrio reports, io/file.py:22).
    """
    fields, data, _ = _parse_shp_rows(path, geometry_column,
                                      encoding=encoding,
                                      return_fids=return_fids)
    df = _df_from_rows(spark, fields, data)
    return GeoDataFrame(df, geometry_column, crs)


def _parse_shp_rows(path, geometry_column=DEFAULT_GEO_COLUMN_NAME,
                    encoding=None, return_fids=False):
    """Pure shapefile parse: (fields incl geometry, rows, crs-or-None).
    Executor-safe (no SparkSession) — shared by :func:`read_shapefile`
    and the distributed multi-file path :func:`read_files` (r11)."""
    import os
    from .geom import shp as _shp
    from pyspark.sql import types as T
    from .sparktypes import GEOM_TYPE

    base = path[:-4] if path.lower().endswith(".shp") else path
    with open(base + ".shp", "rb") as f:
        geoms = _shp.parse_shp(f.read())
    names, rows = [], None
    for ext in (".dbf", ".DBF"):
        if os.path.exists(base + ext):
            with open(base + ext, "rb") as f:
                names, rows = _shp.parse_dbf(
                    f.read(), encoding=encoding or "latin-1")
            break

    def geom_cell(g):
        if g is None:
            return None
        gt, xs, ys, rings, parts = g
        return (int(gt), [float(v) for v in xs], [float(v) for v in ys],
                [int(v) for v in rings], [int(v) for v in parts])

    data = []
    for i, g in enumerate(geoms):
        attrs = tuple(rows[i]) if rows is not None and i < len(rows) \
            else tuple(None for _ in names)
        if return_fids:
            attrs = (i,) + attrs      # 0-based record index = shp FID
        data.append(attrs + (geom_cell(g),))
    fields = []
    if return_fids:
        fields.append(T.StructField("fid", T.LongType()))
    if rows is not None:
        # dbf types: probe the parsed values (parse_dbf is type-stable)
        for j, name in enumerate(names):
            sample = next((r[j] for r in rows if r[j] is not None), None)
            if isinstance(sample, float):
                fields.append(T.StructField(name, T.DoubleType()))
            elif isinstance(sample, bool):
                fields.append(T.StructField(name, T.BooleanType()))
            else:
                fields.append(T.StructField(name, T.StringType()))
    fields.append(T.StructField(geometry_column, GEOM_TYPE))
    return fields, data, None


def read_geopackage(spark: SparkSession, path: str, layer=None,
                    geometry_column=DEFAULT_GEO_COLUMN_NAME,
                    crs=None, fids=None, bbox=None,
                    return_fids=False, keep_z=False) -> GeoDataFrame:
    """OGC GeoPackage reader, GDAL-free (stdlib ``sqlite3`` + the
    package's own WKB codec; blob format per the public GeoPackage
    Encoding Standard — see ``geom/gpkg.py``). The reference reaches
    .gpkg only through GDAL/pyogrio (io/file.py:15-119).

    ``layer`` (a name, or an int index into :func:`list_layers` order —
    r12, reference io/file.py:17) defaults to the only feature layer
    (raises listing the options when several exist).
    ``return_fids=True`` prepends a ``fid`` BIGINT column carrying the
    SQLite rowid — the format's real FID (skipped when the table
    already exposes a ``fid`` column: an INTEGER PRIMARY KEY of that
    name IS the rowid). CRS comes from
    ``gpkg_spatial_ref_sys`` unless overridden. Ingest is driver-side
    like :func:`read_shapefile` — a .gpkg is one SQLite file (not
    block-splittable); the distributed path is to convert to
    (Geo)Parquet once via ``write_geoparquet`` and scan that."""
    fields, data, file_crs = _parse_gpkg_rows(path, layer=layer,
                                              geometry_column=geometry_column,
                                              fids=fids, bbox=bbox,
                                              return_fids=return_fids,
                                              keep_z=keep_z)
    df = _df_from_rows(spark, fields, data)
    return GeoDataFrame(df, geometry_column, crs or file_crs or DEFAULT_CRS)


def _gpkg_decl_type(d):
    """Declared-SQLite-type → Spark type, or None for typeless columns
    (which fall back to value probing). One helper so the probe-time
    typeless detection and the typing loop can never disagree."""
    from pyspark.sql import types as T
    if "BOOL" in d:
        return T.BooleanType()
    if "INT" in d:
        return T.LongType()
    if d in ("REAL", "DOUBLE", "FLOAT") or "REAL" in d:
        return T.DoubleType()
    if "BLOB" in d:
        return T.BinaryType()
    if "CHAR" in d or "TEXT" in d or "CLOB" in d:
        return T.StringType()
    return None


def _parse_gpkg_rows(path, layer=None,
                     geometry_column=DEFAULT_GEO_COLUMN_NAME,
                     fids=None, max_rows=None, bbox=None,
                     return_fids=False, keep_z=False):
    """Pure GeoPackage parse: (fields incl geometry, rows, crs-or-None).
    Executor-safe — shared by :func:`read_geopackage` and the
    distributed multi-file path :func:`read_files` (r11). ``fids``
    selects features by SQLite rowid (the format's real FID — what
    the reference's pyogrio passthrough matches, io/file.py:48-86),
    returned in the requested order. ``bbox`` keeps features whose
    bounds intersect the box (r12): when the GeoPackage carries the
    spec's optional ``rtree_<table>_<col>`` spatial index, candidate
    rowids come from an R-tree range query so non-matching features
    are never even fetched; the survivors (or, without an index, all
    features) are refined EXACTLY on the decoded coordinates — the
    R-tree stores float32-widened boxes, so refinement is mandatory
    for intersects-parity with the .fgb path."""
    import sqlite3
    from .geom import gpkg as _g
    from .geom import wkb as _wkb
    from .geom.ragged import MISSING
    from pyspark.sql import types as T
    from .sparktypes import GEOM_TYPE

    if fids is not None and bbox is not None:
        raise ValueError("cannot combine fids with bbox (pyogrio "
                         "raises the same)")
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        layers = _g.feature_layers(con)
        if not layers:
            raise ValueError(f"{path}: no feature layers in "
                             "gpkg_contents")
        if layer is None:
            if len(layers) > 1:
                raise ValueError(
                    f"{path} has {len(layers)} feature layers "
                    f"({[t for t, _, _ in layers]}); pass layer=")
            name, gcol, srs_id = layers[0]
        elif isinstance(layer, int):     # index into list_layers order
            if not 0 <= layer < len(layers):
                raise ValueError(
                    f"layer index {layer} out of range; {path} has "
                    f"{len(layers)} feature layers "
                    f"({[t for t, _, _ in layers]})")
            name, gcol, srs_id = layers[layer]
        else:
            match = [l for l in layers if l[0] == layer]
            if not match:
                raise ValueError(f"layer {layer!r} not in "
                                 f"{[t for t, _, _ in layers]}")
            name, gcol, srs_id = match[0]
        if fids is None:
            lim = "" if max_rows is None else f" LIMIT {int(max_rows)}"
            rtree_filter = ""
            params = ()
            if bbox is not None:
                rt = f"rtree_{name}_{gcol}"
                has_rt = con.execute(
                    "SELECT 1 FROM sqlite_master WHERE name = ?",
                    (rt,)).fetchone()
                if has_rt:
                    # R-tree range query: candidates whose stored box
                    # intersects bbox (exact refine happens below)
                    rtree_filter = (
                        f' WHERE rowid IN (SELECT id FROM "{rt}" '
                        "WHERE maxx >= ? AND minx <= ? "
                        "AND maxy >= ? AND miny <= ?)")
                    params = (float(bbox[0]), float(bbox[2]),
                              float(bbox[1]), float(bbox[3]))
            # only ask for rowid when the caller wants fids: a plain
            # SELECT * keeps WITHOUT ROWID feature tables and
            # view-backed layers readable (review r12)
            sel = "rowid, *" if return_fids else "*"
            cur = con.execute(
                f'SELECT {sel} FROM "{name}"{rtree_filter}{lim}',
                params)
            cols = [d[0] for d in cur.description]
            raw = cur.fetchall()
            fid_vals = None
            if return_fids:
                cols = cols[1:]
                fid_vals = [r[0] for r in raw]
                raw = [r[1:] for r in raw]
                if any(f is None for f in fid_vals):
                    raise ValueError(
                        f"{path}: layer {name!r} has no rowids (a "
                        "view or WITHOUT ROWID table) — return_fids "
                        "is unsupported for it")
        else:
            ids = [int(f) for f in fids]
            ph = ",".join("?" * len(ids)) or "NULL"   # IN () is a
            # sqlite syntax error; IN (NULL) matches nothing
            cur = con.execute(
                f'SELECT rowid, * FROM "{name}" '
                f"WHERE rowid IN ({ph})", ids)
            cols = [d[0] for d in cur.description][1:]
            by_id = {r[0]: r[1:] for r in cur.fetchall()}
            missing = [i for i in ids if i not in by_id]
            if missing:
                raise ValueError(
                    f"{path}: fids {missing} not present in layer "
                    f"{name!r} (pyogrio/GDAL errors on missing FIDs "
                    "too)")
            raw = [by_id[i] for i in ids]
            fid_vals = list(ids)
        gidx = cols.index(gcol)
        wkbs = [_g.parse_gpkg_blob(r[gidx]) for r in raw]
        payloads = [w[1] if w else None for w in wkbs]
        if keep_z:
            # GeoPackage blobs carry standard WKB — 3D layers round
            # Z into the Z geometry struct (r12)
            rg, zs_flat, had_z = _wkb.decode_z(payloads)
        else:
            # 3D layers drop Z on the default 2D read (same documented
            # lossy ingest as the shapefile reader; previously they
            # ERRORED because no force_2d reached the codec — r12)
            rg = _wkb.decode(payloads, force_2d=True)
        file_crs = _g.srs_string(con, srs_id)
        decl = {r[1]: (r[2] or "").upper() for r in
                con.execute(f'PRAGMA table_info("{name}")')}
        # row-subset reads (max_rows probe, bbox, fids): a declared-
        # typeless column whose SELECTED rows are all NULL would type
        # as String here while a different selection of the same file
        # value-probes it to Long/Double — fetch one non-NULL value
        # with a targeted whole-table query instead, so every read of
        # a file agrees on its schema (ADVICE r11 + review r12: the
        # first cut only covered the max_rows probe, leaving bbox=
        # reads schema-unstable). On a full scan the loop is a no-op
        # (a value would already be in `raw`).
        typeless_probe = {}
        for j, cname in enumerate(cols):
            if j == gidx or _gpkg_decl_type(decl.get(cname, "")):
                continue
            if any(r[j] is not None for r in raw):
                continue
            hit = con.execute(
                f'SELECT "{cname}" FROM "{name}" '
                f'WHERE "{cname}" IS NOT NULL LIMIT 1').fetchone()
            if hit is not None:
                typeless_probe[cname] = hit[0]
    finally:
        con.close()

    # declared SQLite type drives the Spark type (SQLite stores
    # BOOLEAN as 0/1 integers — value probing alone can't see it);
    # typeless columns fall back to value probing
    fields, bool_idx = [], set()
    for j, cname in enumerate(cols):
        if j == gidx:
            continue
        d = decl.get(cname, "")
        declared = _gpkg_decl_type(d)
        if declared is not None:
            t = declared
            if isinstance(t, T.BooleanType):
                bool_idx.add(j)
        else:
            sample = next((r[j] for r in raw if r[j] is not None), None)
            if sample is None:
                sample = typeless_probe.get(cname)
            if isinstance(sample, bool):
                t = T.BooleanType()
                bool_idx.add(j)
            elif isinstance(sample, int):
                t = T.LongType()
            elif isinstance(sample, float):
                t = T.DoubleType()
            elif isinstance(sample, (bytes, bytearray)):
                t = T.BinaryType()
            else:
                t = T.StringType()
        fields.append(T.StructField(cname, t))

    data = []
    for i, r in enumerate(raw):
        attrs = tuple(
            (bool(v) if j in bool_idx and v is not None else v)
            for j, v in enumerate(r) if j != gidx)
        g = rg.geom(i)
        if g[0] == MISSING:
            cell = None
        else:
            gt, xs, ys, rings, parts = g
            cell = (int(gt), [float(v) for v in xs],
                    [float(v) for v in ys],
                    [int(v) for v in rings], [int(v) for v in parts])
            if keep_z:
                c0, c1 = rg.coord_offsets[i], rg.coord_offsets[i + 1]
                zcell = [float(v) for v in zs_flat[c0:c1]] \
                    if had_z[i] else None
                cell = cell + (zcell,)
        data.append(attrs + (cell,))
    if return_fids and "fid" not in {c for j, c in enumerate(cols)
                                     if j != gidx}:
        # prepend the rowid as `fid` unless the table already exposes
        # one (an INTEGER PRIMARY KEY named fid IS the rowid)
        fields.insert(0, T.StructField("fid", T.LongType()))
        data = [(int(f),) + r for f, r in zip(fid_vals, data)]
    if bbox is not None:
        xmin, ymin, xmax, ymax = (float(v) for v in bbox)

        def _hit(cell):
            if cell is None or not cell[1]:
                return False
            return (min(cell[1]) <= xmax and max(cell[1]) >= xmin
                    and min(cell[2]) <= ymax and max(cell[2]) >= ymin)

        data = [r for r in data if _hit(r[-1])]
    if keep_z:
        from .sparktypes import GEOM_TYPE_Z
        fields.append(T.StructField(geometry_column, GEOM_TYPE_Z))
    else:
        fields.append(T.StructField(geometry_column, GEOM_TYPE))
    return fields, data, file_crs


def write_geopackage(gdf: GeoDataFrame, path: str, layer: str = "layer",
                     mode: str = "overwrite") -> None:
    """OGC GeoPackage writer (stdlib ``sqlite3``): creates the
    mandatory metadata tables (``gpkg_spatial_ref_sys``,
    ``gpkg_contents``, ``gpkg_geometry_columns``) and one feature
    table whose geometry column holds GeoPackageBinary blobs (GP
    header + this package's WKB encoding). Output is driver-side
    (``collect``) — SQLite is a single local file, so this is for
    BOUNDED exports (results, samples, fixtures); bulk data belongs
    in :func:`write_geoparquet`. ``mode='overwrite'`` replaces an
    existing layer of the same name; ``'errorifexists'`` raises."""
    _write_gpkg_file(path, gdf.df.schema, gdf.geometry_column,
                     gdf.crs, gdf.df.collect(), layer=layer, mode=mode)


def _write_gpkg_file(path, schema, gcol, crs, rows, layer="layer",
                     mode="overwrite"):
    """Pure GeoPackage file write from collected/partition rows —
    executor-safe; shared by :func:`write_geopackage` (driver path)
    and the distributed multi-file sink :func:`write_files` (r11)."""
    import os
    import sqlite3
    from .geom import gpkg as _g
    from .geom import wkb as _wkb
    from pyspark.sql import types as T

    crs = (crs or "").upper()
    srs_id, org = 0, "NONE"
    if ":" in crs:
        org, _, num = crs.partition(":")
        if num.isdigit():
            srs_id = int(num)

    def sql_type(f):
        if isinstance(f.dataType, (T.LongType, T.IntegerType,
                                   T.ShortType, T.ByteType)):
            return "INTEGER"
        if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            return "REAL"
        if isinstance(f.dataType, T.BooleanType):
            return "BOOLEAN"
        if isinstance(f.dataType, T.BinaryType):
            return "BLOB"
        return "TEXT"

    attrs = [f for f in schema.fields if f.name != gcol]
    con = sqlite3.connect(path)
    try:
        _g.init_gpkg(con, srs_id=srs_id, organization=org)
        exists = con.execute(
            "SELECT 1 FROM gpkg_contents WHERE table_name = ?",
            (layer,)).fetchone()
        if exists:
            if mode != "overwrite":
                raise ValueError(f"layer {layer!r} exists in {path} "
                                 "(mode='errorifexists')")
            con.execute(f'DROP TABLE IF EXISTS "{layer}"')
            con.execute("DELETE FROM gpkg_contents WHERE table_name=?",
                        (layer,))
            con.execute("DELETE FROM gpkg_geometry_columns "
                        "WHERE table_name=?", (layer,))
        col_ddl = ", ".join(
            [f'"{f.name}" {sql_type(f)}' for f in attrs]
            + [f'"{gcol}" BLOB'])
        con.execute(f'CREATE TABLE "{layer}" '
                    f"(fid INTEGER PRIMARY KEY AUTOINCREMENT, "
                    f"{col_ddl})")
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, "
            "identifier, srs_id) VALUES (?, 'features', ?, ?)",
            (layer, layer, srs_id))
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES "
            "(?, ?, 'GEOMETRY', ?, 0, 0)", (layer, gcol, srs_id))
        names = [f.name for f in attrs]
        ph = ", ".join(["?"] * (len(names) + 1))
        ins = (f'INSERT INTO "{layer}" '
               f"({', '.join(chr(34) + n + chr(34) for n in names)}"
               f"{', ' if names else ''}\"{gcol}\") VALUES ({ph})")
        for r in rows:
            g = r[gcol]
            if g is None or g["gt"] is None:
                blob = None
            else:
                wkb = _wkb.encode_geom(
                    int(g["gt"]),
                    [float(v) for v in g["xs"]],
                    [float(v) for v in g["ys"]],
                    [int(v) for v in g["rings"]],
                    [int(v) for v in g["parts"]])
                blob = _g.make_gpkg_blob(wkb, srs_id)
            con.execute(ins, tuple(r[n] for n in names) + (blob,))
        con.commit()
    finally:
        con.close()
    assert os.path.exists(path)


def read_flatgeobuf(spark: SparkSession, path: str,
                    geometry_column=DEFAULT_GEO_COLUMN_NAME,
                    crs=None, bbox=None, fids=None,
                    return_fids=False) -> GeoDataFrame:
    """FlatGeobuf reader, GDAL-free (the package's own FlatBuffers +
    WKB codecs; format per the public spec — see ``geom/fgb.py``).
    The reference reaches .fgb only through GDAL/pyogrio
    (io/file.py:15-119).

    CRS comes from the header's Crs table unless overridden.
    ``bbox=(minx, miny, maxx, maxy)`` returns only intersecting
    features — when the file carries its packed Hilbert R-tree the
    lookup traverses the index and parses only the matching feature
    records (the format's cloud-optimized read path); without an
    index it linear-scans and tests each geometry's coordinate bbox.
    Ingest is driver-side like :func:`read_shapefile`; the bulk
    distributed path is to convert to (Geo)Parquet once via
    ``write_geoparquet`` and scan that."""
    fields, data, file_crs = _parse_fgb_rows(path, bbox=bbox,
                                             geometry_column=geometry_column,
                                             fids=fids,
                                             return_fids=return_fids)
    df = _df_from_rows(spark, fields, data)
    return GeoDataFrame(df, geometry_column, crs or file_crs or DEFAULT_CRS)


def _fgb_spark_type(ct):
    """FlatGeobuf column-type id → Spark type (shared by the row and
    Arrow-batch fgb parsers so they can never disagree)."""
    from pyspark.sql import types as T
    from .geom import fgb as _f
    if ct == _f.CT_BOOL:
        return T.BooleanType()
    if ct == _f.CT_ULONG:
        # FGB ulong is a full uint64; values >= 2^63 are legal and
        # would overflow LongType at createDataFrame (ADVICE r8)
        return T.DecimalType(20, 0)
    if ct in (_f.CT_BYTE, _f.CT_UBYTE, _f.CT_SHORT, _f.CT_USHORT,
              _f.CT_INT, _f.CT_UINT, _f.CT_LONG):
        return T.LongType()
    if ct in (_f.CT_FLOAT, _f.CT_DOUBLE):
        return T.DoubleType()
    if ct == _f.CT_BINARY:
        return T.BinaryType()
    return T.StringType()


def _fgb_load(path, bbox, fids, return_fids):
    """Shared FlatGeobuf load for the row/batch parsers (review r12 —
    ONE home for the fids/bbox combination rules, fid derivation, WKB
    decode and CRS string so the two assembly paths can never
    diverge): (meta, feats, rg, fid_vals_or_None, crs_or_None)."""
    from .geom import fgb as _f
    from .geom import wkb as _wkb
    if fids is not None and bbox is not None:
        raise ValueError("cannot combine fids with bbox (pyogrio "
                         "raises the same)")
    with open(path, "rb") as fh:
        meta, feats = _f.read_fgb(fh.read(), bbox=bbox,
                                  want_fids=return_fids)
    if fids is not None:
        ids = [int(f) for f in fids]
        missing = [i for i in ids if not 0 <= i < len(feats)]
        if missing:
            raise ValueError(
                f"{path}: feature indices {missing} out of range "
                f"(file has {len(feats)} features)")
        feats = [feats[i] for i in ids]
        fid_vals = ids
    else:
        fid_vals = meta.get("fids")
    rg = _wkb.decode([w for w, _ in feats])
    file_crs = f"{meta['crs'][0]}:{meta['crs'][1]}" if meta["crs"] else None
    return meta, feats, rg, fid_vals, file_crs


def _parse_fgb_batch(path, bbox=None,
                     geometry_column=DEFAULT_GEO_COLUMN_NAME,
                     fids=None, return_fids=False):
    """Vectorized FlatGeobuf parse (r12, VERDICT r11 #1): (fields,
    pyarrow.Table with geometry as a GEOM struct, crs-or-None). Same
    feature decode (and packed-Hilbert bbox pruning) as
    :func:`_parse_fgb_rows` via the shared :func:`_fgb_load`, but
    attributes build column-wise into Arrow arrays and the geometry
    struct comes straight from the ragged numpy decode — no per-row
    tuple materialization."""
    import decimal

    import pyarrow as pa
    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import to_arrow_type

    from .geom import fgb as _f
    from .sparktypes import GEOM_TYPE

    meta, feats, rg, fid_vals, file_crs = _fgb_load(
        path, bbox, fids, return_fids)
    fields, arrays = [], []
    if return_fids and "fid" not in {n for n, _ in meta["columns"]}:
        fields.append(T.StructField("fid", T.LongType()))
        arrays.append(pa.array([int(v) for v in fid_vals],
                               type=pa.int64()))
    for n, ct in meta["columns"]:
        fld = T.StructField(n, _fgb_spark_type(ct))
        vals = [props.get(n) for _, props in feats]
        if ct == _f.CT_ULONG:
            vals = [None if v is None else decimal.Decimal(int(v))
                    for v in vals]
        fields.append(fld)
        arrays.append(pa.array(vals, type=to_arrow_type(fld.dataType)))
    fields.append(T.StructField(geometry_column, GEOM_TYPE))
    arrays.append(_ragged_to_arrow_struct(rg))
    table = pa.Table.from_arrays(arrays,
                                 names=[f.name for f in fields])
    return fields, table, file_crs


def _parse_fgb_rows(path, bbox=None,
                    geometry_column=DEFAULT_GEO_COLUMN_NAME,
                    fids=None, return_fids=False):
    """Pure FlatGeobuf parse: (fields incl geometry, rows, crs-or-None).
    Executor-safe — shared by :func:`read_flatgeobuf` and the
    distributed multi-file path :func:`read_files` (r11). ``fids``
    selects by 0-based feature index (the FGB FID: position in the
    feature stream), in the requested order; like pyogrio it cannot
    combine with ``bbox``."""
    from .geom import fgb as _f
    from .geom import wkb as _wkb
    from .geom.ragged import MISSING
    from pyspark.sql import types as T
    from .sparktypes import GEOM_TYPE

    meta, feats, rg, fid_vals, file_crs = _fgb_load(
        path, bbox, fids, return_fids)

    fields = [T.StructField(n, _fgb_spark_type(ct))
              for n, ct in meta["columns"]]
    names = [n for n, _ in meta["columns"]]
    add_fid = return_fids and "fid" not in set(names)
    if add_fid:
        fields.insert(0, T.StructField("fid", T.LongType()))
    int_cols = {n for n, ct in meta["columns"]
                if ct in (_f.CT_BYTE, _f.CT_UBYTE, _f.CT_SHORT,
                          _f.CT_USHORT, _f.CT_INT, _f.CT_UINT,
                          _f.CT_LONG)}
    ulong_cols = {n for n, ct in meta["columns"] if ct == _f.CT_ULONG}
    dbl_cols = {n for n, ct in meta["columns"]
                if ct in (_f.CT_FLOAT, _f.CT_DOUBLE)}
    data = []
    for i, (_, props) in enumerate(feats):
        attrs = []
        for n in names:
            v = props.get(n)
            if v is not None and n in int_cols:
                v = int(v)
            elif v is not None and n in ulong_cols:
                import decimal
                v = decimal.Decimal(int(v))
            elif v is not None and n in dbl_cols:
                v = float(v)
            attrs.append(v)
        g = rg.geom(i)
        if g[0] == MISSING:
            cell = None
        else:
            gt, xs, ys, rings, parts = g
            cell = (int(gt), [float(v) for v in xs],
                    [float(v) for v in ys],
                    [int(v) for v in rings], [int(v) for v in parts])
        head = (int(fid_vals[i]),) if add_fid else ()
        data.append(head + tuple(attrs) + (cell,))
    fields.append(T.StructField(geometry_column, GEOM_TYPE))
    return fields, data, file_crs


def write_flatgeobuf(gdf: GeoDataFrame, path: str, name: str = "layer",
                     mode: str = "overwrite",
                     index_node_size: int = 16) -> None:
    """FlatGeobuf writer (the package's own FlatBuffers builder —
    ``geom/fgb.py``): magic bytes, Header flatbuffer (name, geometry
    type, columns, features_count, envelope, crs), a REAL packed
    Hilbert R-tree index (features re-ordered along the Hilbert
    curve as the spec requires; ``index_node_size=0`` omits it), then
    one size-prefixed Feature flatbuffer per row. Output is
    driver-side (``collect``) — for BOUNDED exports (results,
    samples, fixtures); bulk data belongs in
    :func:`write_geoparquet`. The header geometry type is the common
    type when the layer is uniform, else Unknown with per-feature
    types."""
    import os

    if mode != "overwrite" and os.path.exists(path):
        raise ValueError(f"{path} exists (mode={mode!r})")
    _write_fgb_file(path, gdf.df.schema, gdf.geometry_column, gdf.crs,
                    gdf.df.collect(), name=name,
                    index_node_size=index_node_size)


def _write_fgb_file(path, schema, gcol, crs, rows, name="layer",
                    index_node_size=16):
    """Pure FlatGeobuf file write from collected/partition rows —
    executor-safe; shared by :func:`write_flatgeobuf` (driver path)
    and the distributed multi-file sink :func:`write_files` (r11)."""
    from .geom import fgb as _f
    from pyspark.sql import types as T

    def col_type(f):
        if isinstance(f.dataType, T.BooleanType):
            return _f.CT_BOOL
        if isinstance(f.dataType, (T.LongType, T.IntegerType,
                                   T.ShortType, T.ByteType)):
            return _f.CT_LONG
        if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            return _f.CT_DOUBLE
        if isinstance(f.dataType, T.BinaryType):
            return _f.CT_BINARY
        return _f.CT_STRING

    attrs = [f for f in schema.fields if f.name != gcol]
    columns = [(f.name, col_type(f)) for f in attrs]
    str_cols = {f.name for f in attrs
                if col_type(f) == _f.CT_STRING
                and not isinstance(f.dataType, T.StringType)}

    # ragged ids → FGB ids (point 0→1 etc); uniform layer → typed header
    fgb_rows = []
    gts = set()
    for r in rows:
        g = r[gcol]
        if g is None or g["gt"] is None:
            cell = None
        else:
            cell = (int(g["gt"]), [float(v) for v in g["xs"]],
                    [float(v) for v in g["ys"]],
                    [int(v) for v in g["rings"]],
                    [int(v) for v in g["parts"]])
            gts.add(_f._RAGGED_TO_FGB.get(int(g["gt"]), 0))
        vals = [str(r[f.name]) if f.name in str_cols
                and r[f.name] is not None else r[f.name] for f in attrs]
        fgb_rows.append((cell, vals))
    header_gt = gts.pop() if len(gts) == 1 else _f.GT_UNKNOWN

    crs = (crs or "").upper()
    crs_tuple = None
    if ":" in crs:
        org, _, num = crs.partition(":")
        if num.isdigit():
            crs_tuple = (org, int(num))
    blob = _f.write_fgb(name, columns, fgb_rows,
                        geometry_type=header_gt, crs=crs_tuple,
                        index_node_size=index_node_size)
    with open(path, "wb") as fh:
        fh.write(blob)


def _tuple_cell(g):
    """Engine geometry tuple → GEOM struct cell (or None)."""
    from .geom.ragged import MISSING
    if g is None or g[0] == MISSING:
        return None
    gt, xs, ys, rings, parts = g
    return (int(gt), [float(v) for v in xs], [float(v) for v in ys],
            [int(v) for v in rings], [int(v) for v in parts])


def read_kml(spark: SparkSession, path: str,
             geometry_column=DEFAULT_GEO_COLUMN_NAME) -> GeoDataFrame:
    """Native KML reader (stdlib XML — no GDAL; the reference reads KML
    only through GDAL, io/file.py:15-119). Emits name, description, one
    string column per ExtendedData key, and the geometry; KML is always
    EPSG:4326. Single-document parse on the driver (KML is a
    single-file container) — the scale path is convert-to-GeoParquet,
    same note as the FGB/GPKG readers."""
    fields, data, _ = _parse_kml_rows(path, geometry_column)
    df = _df_from_rows(spark, fields, data)
    return GeoDataFrame(df, geometry_column, "EPSG:4326")


def _parse_kml_rows(path, geometry_column=DEFAULT_GEO_COLUMN_NAME):
    """Pure KML parse: (fields incl geometry, rows, 'EPSG:4326').
    Executor-safe — shared by :func:`read_kml` and the distributed
    multi-file path :func:`read_files` (r11)."""
    from pyspark.sql import types as T

    from .geom import kml as _k
    from .sparktypes import GEOM_TYPE
    with open(path, "r", encoding="utf-8") as fh:
        feats = _k.parse_kml(fh.read())
    keys = []
    for f in feats:
        for k in f["data"]:
            if k not in keys:
                keys.append(k)
    fields = [T.StructField("name", T.StringType()),
              T.StructField("description", T.StringType())]
    fields += [T.StructField(k, T.StringType()) for k in keys]
    fields.append(T.StructField(geometry_column, GEOM_TYPE))
    data = [(f["name"], f["description"],
             *[f["data"].get(k) for k in keys], _tuple_cell(f["geom"]))
            for f in feats]
    return fields, data, "EPSG:4326"


def write_kml(gdf: GeoDataFrame, path: str,
              name_column: str = None, document_name: str = "layer",
              mode: str = "overwrite") -> None:
    """Native KML writer: every non-geometry column rides as an
    ExtendedData ``Data`` pair (``name_column``, when given, becomes
    the Placemark name instead). Driver-side single-file sink — the
    same bound the format imposes on any writer."""
    import os

    from .geom import kml as _k
    from .geom.ragged import RaggedGeometry  # noqa: F401

    if mode != "overwrite" and os.path.exists(path):
        raise ValueError(f"{path} exists (mode={mode!r})")
    _write_kml_file(path, gdf.df.schema, gdf.geometry_column, gdf.crs,
                    gdf.df.collect(), name_column=name_column,
                    document_name=document_name)


def _write_kml_file(path, schema, gcol, crs, rows, name_column=None,
                    document_name="layer"):
    """Pure KML file write from collected/partition rows —
    executor-safe; shared by :func:`write_kml` (driver path) and the
    distributed multi-file sink :func:`write_files` (r11)."""
    from .geom import kml as _k
    cols = [f.name for f in schema.fields if f.name != gcol]
    feats = []
    for r in rows:
        g = r[gcol]
        geom = None
        if g is not None and g["gt"] is not None:
            geom = (int(g["gt"]), list(g["xs"]), list(g["ys"]),
                    list(g["rings"]), list(g["parts"]))
        data = {c: r[c] for c in cols}
        nm = None
        if name_column is not None:
            nm = data.pop(name_column, None)
        feats.append({"name": nm, "description": None,
                      "data": data, "geom": geom})
    text = _k.dumps_kml(feats, document_name=document_name)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(text)


def read_gml(spark: SparkSession, path: str, swap_axes: bool = False,
             geometry_column=DEFAULT_GEO_COLUMN_NAME,
             crs=DEFAULT_CRS, fids=None) -> GeoDataFrame:
    """Native GML reader (stdlib XML — no GDAL; the reference reads
    GML only through GDAL, io/file.py:15-119): OGC simple-features
    geometries in GML 2 and 3 forms (pos/posList/coordinates,
    exterior/outerBoundaryIs, Curve segments, Multi* members), WFS
    feature-member structure, simple-text properties + gml:id as
    string columns. ``swap_axes=True`` flips lat-first documents (the
    GML3/EPSG:4326 axis-order trap — same contract as GDAL's invert
    switch). Driver-side single-document parse; the scale path is
    convert-to-GeoParquet."""
    fields, data, _ = _parse_gml_rows(path, swap_axes=swap_axes,
                                      geometry_column=geometry_column,
                                      fids=fids)
    df = _df_from_rows(spark, fields, data)
    return GeoDataFrame(df, geometry_column, crs)


def _parse_gml_rows(path, swap_axes=False,
                    geometry_column=DEFAULT_GEO_COLUMN_NAME,
                    fids=None):
    """Pure GML parse: (fields incl geometry, rows, crs=None).
    Executor-safe — shared by :func:`read_gml` and the distributed
    multi-file path :func:`read_files` (r11). ``fids`` selects by
    gml:id (the format's FID carrier), in the requested order."""
    from pyspark.sql import types as T

    from .geom import gml as _g
    from .sparktypes import GEOM_TYPE
    with open(path, "r", encoding="utf-8") as fh:
        feats = _g.parse_gml(fh.read(), swap_axes=swap_axes)
    if fids is not None:
        by_id = {f["gml_id"]: f for f in feats if f["gml_id"]}
        missing = [str(i) for i in fids if str(i) not in by_id]
        if missing:
            raise ValueError(f"{path}: gml:id values {missing} not "
                             "present in the document")
        feats = [by_id[str(i)] for i in fids]
    keys = []
    for f in feats:
        for k in f["data"]:
            if k not in keys:
                keys.append(k)
    fields = [T.StructField("gml_id", T.StringType())]
    fields += [T.StructField(k, T.StringType()) for k in keys]
    fields.append(T.StructField(geometry_column, GEOM_TYPE))
    data = [(f["gml_id"], *[f["data"].get(k) for k in keys],
             _tuple_cell(f["geom"])) for f in feats]
    return fields, data, None


def read_gpx(spark: SparkSession, path: str, layer: str = "tracks",
             geometry_column=DEFAULT_GEO_COLUMN_NAME) -> GeoDataFrame:
    """Native GPX reader (stdlib XML — no GDAL): ``layer`` selects
    'waypoints' (Points + name/ele/time), 'routes' (LineStrings) or
    'tracks' (MultiLineStrings), mirroring the GDAL driver's layer
    split. WGS84 by specification; driver-side single-file parse."""
    fields, data, _ = _parse_gpx_rows(path, layer=layer,
                                      geometry_column=geometry_column)
    df = _df_from_rows(spark, fields, data)
    return GeoDataFrame(df, geometry_column, "EPSG:4326")


def _parse_gpx_rows(path, layer="tracks",
                    geometry_column=DEFAULT_GEO_COLUMN_NAME):
    """Pure GPX parse: (fields incl geometry, rows, 'EPSG:4326').
    Executor-safe — shared by :func:`read_gpx` and the distributed
    multi-file path :func:`read_files` (r11)."""
    from pyspark.sql import types as T

    from .geom import gpx as _g
    from .sparktypes import GEOM_TYPE
    with open(path, "r", encoding="utf-8") as fh:
        feats = _g.parse_gpx(fh.read(), layer=layer)
    if layer == "waypoints":
        fields = [T.StructField("name", T.StringType()),
                  T.StructField("ele", T.DoubleType()),
                  T.StructField("time", T.StringType())]
        data = [(f["name"], f["ele"], f["time"], _tuple_cell(f["geom"]))
                for f in feats]
    elif layer == "routes":
        fields = [T.StructField("name", T.StringType()),
                  T.StructField("n_points", T.LongType())]
        data = [(f["name"], f["n_points"], _tuple_cell(f["geom"]))
                for f in feats]
    else:
        fields = [T.StructField("name", T.StringType()),
                  T.StructField("n_segments", T.LongType()),
                  T.StructField("n_points", T.LongType())]
        data = [(f["name"], f["n_segments"], f["n_points"],
                 _tuple_cell(f["geom"])) for f in feats]
    fields.append(T.StructField(geometry_column, GEOM_TYPE))
    return fields, data, "EPSG:4326"


def _crs_from_geo_meta(colmeta) -> str:
    """Best-effort CRS string from GeoParquet/GeoArrow 'geo' column
    metadata: PROJJSON dicts carry id.authority/code; WKT strings carry
    an EPSG AUTHORITY/ID tail; short 'EPSG:n' strings pass through."""
    crs = colmeta.get("crs")
    if crs is None:
        return DEFAULT_CRS
    if isinstance(crs, str) and crs.lstrip().startswith("+"):
        return crs                 # proj4 parameter string (r10 engine)
    if isinstance(crs, dict):  # PROJJSON
        ident = crs.get("id") or {}
        if ident.get("authority") and ident.get("code") is not None:
            return f"{ident['authority']}:{ident['code']}"
        return DEFAULT_CRS
    s = str(crs)
    if ":" in s and len(s) < 24 and "[" not in s:
        return s
    import re
    hits = re.findall(r'(?:AUTHORITY|ID)\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?', s)
    return f"EPSG:{hits[-1]}" if hits else DEFAULT_CRS


#: read_ipc files above this size spill through parquet instead of
#: materializing whole on the driver (r11, VERDICT r10 #6)
_IPC_SPILL_BYTES = 256 << 20


def _read_ipc_spill(spark, path, geometry_column, columns,
                    max_features, keep_z=False):
    """Bounded-driver-memory IPC read: stream record batches (one
    batch resident at a time) through a ParquetWriter into a temp
    dataset, then scan THAT distributed — the documented scale path
    (IPC is not row-group-splittable; parquet is). Row order, schema
    handling (geo metadata, unsigned widening, projection, limit) all
    match the in-memory path."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.ipc as ipc
    import pyarrow.parquet as pq

    def _batches(reader):
        if hasattr(reader, "num_record_batches"):    # file format
            for i in range(reader.num_record_batches):
                yield reader.get_batch(i)
        else:                                        # stream format
            for b in reader:
                yield b

    try:
        src = ipc.open_file(path)
    except pa.ArrowInvalid:
        src = ipc.open_stream(path)
    schema = src.schema
    meta = schema.metadata or {}
    geo = {}
    if b"geo" in meta:
        try:
            geo = json.loads(meta[b"geo"])
        except (ValueError, UnicodeDecodeError):
            geo = {}
    gcol = geometry_column or geo.get("primary_column") or (
        DEFAULT_GEO_COLUMN_NAME
        if DEFAULT_GEO_COLUMN_NAME in schema.names else None)
    crs = DEFAULT_CRS
    if gcol and gcol in geo.get("columns", {}):
        crs = _crs_from_geo_meta(geo["columns"][gcol])

    keep = list(schema.names)
    if columns is not None:
        keep = [c for c in keep if c in set(columns) or c == gcol]
    fields = []
    for name in keep:
        f = schema.field(name)
        t = f.type
        if pa.types.is_unsigned_integer(t):
            t = pa.int64()
        fields.append(pa.field(name, t))
    out_schema = pa.schema(fields)

    base_dir = os.environ.get("ARCTIC_SPARK_SPILL_DIR")
    d = tempfile.mkdtemp(prefix="arctic_ipc_spill_", dir=base_dir)
    # the scan is lazy, so the copy cannot be deleted eagerly; reclaim
    # it at driver exit instead of leaking one dataset-sized dir per
    # spill read (review r11). On a real cluster point
    # $ARCTIC_SPARK_SPILL_DIR at shared storage — executors must be
    # able to read the spill (same visibility contract read_files
    # documents for its input paths).
    import atexit
    import shutil
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    pq_path = os.path.join(d, "part-0.parquet")
    remaining = None if max_features is None else int(max_features)
    with pq.ParquetWriter(pq_path, out_schema) as w:
        for batch in _batches(src):
            if remaining is not None and remaining <= 0:
                break
            t = pa.Table.from_batches([batch]).select(keep) \
                .cast(out_schema)
            if remaining is not None and t.num_rows > remaining:
                t = t.slice(0, remaining)
            if remaining is not None:
                remaining -= t.num_rows
            w.write_table(t)
    df = spark.read.parquet(pq_path)
    if gcol and gcol in df.columns:
        # keep_z threads through to the distributed decode, so the
        # returned schema no longer depends on which side of the spill
        # threshold the file lands (review r12)
        df = df.withColumn(gcol, st.from_wkb(F.col(gcol),
                                             keep_z=keep_z))
        from .geodataframe import GeoDataFrame as _GDF
        return _GDF(df, gcol, crs)
    return df


def read_ipc(spark: SparkSession, path: str, geometry_column=None,
             columns=None, max_features=None, spill_threshold=None,
             keep_z=False):
    """Arrow IPC / Feather-V2 reader (``.arrow``) — the reference's ONLY
    bundled data format: its dataset loader reads .arrow files
    (py-geopolars/python/geopolars/datasets/__init__.py:39-42) and its
    benches read data/cities.arrow (geopolars/benches/affine.rs:8-21).
    Honors GeoPandas/GeoArrow ``geo`` schema metadata: primary geometry
    column, WKB encoding, CRS (PROJJSON or WKT). Unsigned Arrow integer
    columns widen to int64 (Spark has no unsigned types). Returns a
    GeoDataFrame when a geometry column is found (WKB decoded to the
    GEOM struct), else a plain DataFrame.

    ``keep_z=True`` decodes 3D WKB into the Z geometry struct (r12)
    on BOTH the in-memory and spill paths, so the returned schema
    never depends on file size.

    Driver-side single-file ingest for SMALL files; beyond
    ``spill_threshold`` bytes (default 256 MiB) the read streams
    record batches through a temp parquet dataset and scans that
    distributed instead (r11 — bounds peak driver memory to one
    record batch; IPC itself is not row-group-splittable, parquet
    is). Data at scale belongs in :func:`read_geoparquet`."""
    import os
    import pyarrow as pa
    import pyarrow.ipc as ipc
    thr = _IPC_SPILL_BYTES if spill_threshold is None \
        else int(spill_threshold)
    if os.path.getsize(path) > thr:
        return _read_ipc_spill(spark, path, geometry_column, columns,
                               max_features, keep_z=keep_z)
    try:
        with ipc.open_file(path) as r:
            table = r.read_all()
    except pa.ArrowInvalid:
        with ipc.open_stream(path) as r:   # stream-format fallback
            table = r.read_all()
    meta = table.schema.metadata or {}
    geo = {}
    if b"geo" in meta:
        try:
            geo = json.loads(meta[b"geo"])
        except (ValueError, UnicodeDecodeError):
            geo = {}
    gcol = geometry_column or geo.get("primary_column") or (
        DEFAULT_GEO_COLUMN_NAME
        if DEFAULT_GEO_COLUMN_NAME in table.column_names else None)
    crs = DEFAULT_CRS
    if gcol and gcol in geo.get("columns", {}):
        crs = _crs_from_geo_meta(geo["columns"][gcol])
    fields, widened = [], False
    for f in table.schema:
        t = f.type
        if pa.types.is_unsigned_integer(t):
            t, widened = pa.int64(), True
        fields.append(pa.field(f.name, t))
    if widened:
        table = table.cast(pa.schema(fields))
    if columns is not None:
        keep = [c for c in table.column_names
                if c in set(columns) or c == gcol]
        table = table.select(keep)
    if max_features is not None:
        table = table.slice(0, int(max_features))
    pdf = table.to_pandas()
    if gcol and gcol in pdf.columns:
        from .geodataframe import from_pandas_wkb
        return from_pandas_wkb(spark, pdf, gcol, crs, keep_z=keep_z)
    return spark.createDataFrame(pdf)


def write_ipc(gdf: GeoDataFrame, path: str) -> None:
    """Arrow IPC (Feather V2) writer: geometry encodes to a WKB binary
    column plus GeoParquet-style ``geo`` schema metadata (primary
    column, encoding, CRS) — the same layout the reference's bundled
    .arrow datasets use, so :func:`read_ipc`, GeoPandas and the
    reference's loader all round-trip it. Driver-side single file (the
    companion of :func:`read_ipc`); distributed output belongs in
    :func:`write_geoparquet`."""
    import pyarrow as pa
    import pyarrow.ipc as ipc
    from .geodataframe import to_pandas_wkb
    from .proj import crs_to_string as _crs_str
    gcol = gdf.geometry_column
    pdf = to_pandas_wkb(gdf)
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    meta = dict(table.schema.metadata or {})
    meta[b"geo"] = json.dumps(
        {"version": "1.0.0", "primary_column": gcol,
         "columns": {gcol: {"encoding": "WKB",
                            "crs": _crs_str(gdf.crs)}}}).encode()
    table = table.replace_schema_metadata(meta)
    with ipc.new_file(path, table.schema) as w:
        w.write_table(table)


def _load_ipc_table(path, geometry_column=None):
    """Shared IPC open + geo-metadata sniff: (pyarrow.Table,
    geometry-column-name-or-None, crs-or-None). Executor-safe."""
    import pyarrow as pa
    import pyarrow.ipc as ipc
    try:
        with ipc.open_file(path) as r:
            table = r.read_all()
    except pa.ArrowInvalid:
        with ipc.open_stream(path) as r:   # stream-format fallback
            table = r.read_all()
    meta = table.schema.metadata or {}
    geo = {}
    if b"geo" in meta:
        try:
            geo = json.loads(meta[b"geo"])
        except (ValueError, UnicodeDecodeError):
            geo = {}
    gcol = geometry_column or geo.get("primary_column") or (
        DEFAULT_GEO_COLUMN_NAME
        if DEFAULT_GEO_COLUMN_NAME in table.column_names else None)
    crs = None
    if gcol and gcol in geo.get("columns", {}):
        crs = _crs_from_geo_meta(geo["columns"][gcol])
    return table, gcol, crs


def _ragged_to_arrow_struct(rg):
    """RaggedGeometry → pyarrow StructArray of the GEOM struct, fully
    vectorized (r12): the flat numpy coordinate/ring/part arrays and
    their offsets ARE Arrow list layout, so the batch builds with zero
    per-row Python work; MISSING rows become null structs via the
    validity mask — identical cells to the per-row ``rg.geom(i)``
    tuples the pickled path produced."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type
    from .sparktypes import GEOM_TYPE
    pa_type = to_arrow_type(GEOM_TYPE)

    def lst(offsets, values, vt):
        return pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32), type=pa.int32()),
            pa.array(values, type=vt))

    gt = pa.array(rg.gt.astype(np.int32), type=pa.int32())
    children = [gt,
                lst(rg.coord_offsets, rg.xs, pa.float64()),
                lst(rg.coord_offsets, rg.ys, pa.float64()),
                lst(rg.ring_offsets, rg.rings, pa.int32()),
                lst(rg.part_offsets, rg.parts, pa.int32())]
    return pa.StructArray.from_arrays(
        children, fields=list(pa_type), mask=pa.array(rg.is_missing()))


def _parse_ipc_batch(path, geometry_column=None):
    """Vectorized Arrow IPC parse (r12, VERDICT r11 #1): (fields,
    pyarrow.Table with the geometry column already a GEOM struct,
    crs-or-None). Attributes stay Arrow end-to-end; the WKB column
    decodes through the numpy codec and re-emerges as a struct array
    with no per-row Python materialization."""
    from pyspark.sql import types as T
    from .geodataframe import _pa_to_spark
    from .geom import wkb as _wkb
    from .sparktypes import GEOM_TYPE
    table, gcol, crs = _load_ipc_table(path, geometry_column)
    fields = []
    for f in table.schema:
        if gcol is not None and f.name == gcol:
            continue
        fields.append(T.StructField(f.name, _pa_to_spark(f.type)))
    if gcol is not None and gcol in table.column_names:
        rg = _wkb.decode(table.column(gcol).to_pylist())
        garr = _ragged_to_arrow_struct(rg)
        table = table.drop_columns([gcol]).append_column(gcol, garr)
        fields.append(T.StructField(gcol, GEOM_TYPE))
    return fields, table, crs


def _parse_ipc_rows(path, geometry_column=None):
    """Pure Arrow IPC parse: (fields incl geometry when present, rows,
    crs-or-None). Executor-safe — the multi-file twin of
    :func:`read_ipc` (r11): WKB geometry decodes straight to GEOM
    cells (no pandas), attributes map through the same scalar type
    mapping ``from_arrow`` uses."""
    from pyspark.sql import types as T
    from .geodataframe import _pa_to_spark
    from .geom import wkb as _wkb
    from .geom.ragged import MISSING
    from .sparktypes import GEOM_TYPE
    table, gcol, crs = _load_ipc_table(path, geometry_column)
    fields, cols = [], []
    for f in table.schema:
        if gcol is not None and f.name == gcol:
            continue
        fields.append(T.StructField(f.name, _pa_to_spark(f.type)))
        cols.append(table.column(f.name).to_pylist())
    if gcol is not None and gcol in table.column_names:
        rg = _wkb.decode(table.column(gcol).to_pylist())
        cells = []
        for i in range(table.num_rows):
            g = rg.geom(i)
            if g[0] == MISSING:
                cells.append(None)
            else:
                gt, xs, ys, rings, parts = g
                cells.append((int(gt), [float(v) for v in xs],
                              [float(v) for v in ys],
                              [int(v) for v in rings],
                              [int(v) for v in parts]))
        fields.append(T.StructField(gcol, GEOM_TYPE))
        cols.append(cells)
    rows = [tuple(c[i] for c in cols) for i in range(table.num_rows)]
    return fields, rows, crs


#: normalized extension → executor-safe single-file parser (r11)
_MULTI_PARSERS = {
    ".shp": _parse_shp_rows,
    ".gpkg": _parse_gpkg_rows,
    ".fgb": _parse_fgb_rows,
    ".kml": _parse_kml_rows,
    ".gml": _parse_gml_rows,
    ".gpx": _parse_gpx_rows,
    ".arrow": _parse_ipc_rows,
}

#: normalized extension → vectorized (fields, pyarrow.Table, crs)
#: parser (r12): formats whose decode can surface Arrow columns with
#: no per-row Python materialization; read_files prefers these
_MULTI_BATCH_PARSERS = {
    ".fgb": _parse_fgb_batch,
    ".arrow": _parse_ipc_batch,
}


def _probe_fgb_fields(path, geometry_column=DEFAULT_GEO_COLUMN_NAME,
                      bbox=None, fids=None, return_fids=False):
    """Header-only FlatGeobuf schema/CRS probe: (fields, None, crs).
    read_files' driver-side probe previously decoded every feature of
    each probed file just to learn field names — with
    ``schema_files='all'`` that decoded the whole dataset twice, once
    serially on the driver (review r12). The header carries columns +
    CRS in its first bytes."""
    from pyspark.sql import types as T

    from .geom import fgb as _f
    from .sparktypes import GEOM_TYPE
    with open(path, "rb") as fh:
        head = fh.read(12)
        if len(head) == 12:
            hsize = int.from_bytes(head[8:12], "little")
            head += fh.read(hsize)
    meta, _ns, _ib, _db = _f.read_fgb_header(head)
    fields = [T.StructField(n, _fgb_spark_type(ct))
              for n, ct in meta["columns"]]
    if return_fids and "fid" not in {n for n, _ in meta["columns"]}:
        fields.insert(0, T.StructField("fid", T.LongType()))
    fields.append(T.StructField(geometry_column, GEOM_TYPE))
    crs = f"{meta['crs'][0]}:{meta['crs'][1]}" if meta["crs"] else None
    return fields, None, crs


def _probe_ipc_fields(path, geometry_column=None):
    """Schema-only Arrow IPC probe: (fields, None, crs) — reads the
    file footer/stream schema without materializing record batches
    (review r12; same field mapping as :func:`_parse_ipc_batch`)."""
    import pyarrow as pa
    import pyarrow.ipc as ipc
    from pyspark.sql import types as T

    from .geodataframe import _pa_to_spark
    from .sparktypes import GEOM_TYPE
    try:
        with ipc.open_file(path) as r:
            schema = r.schema
    except pa.ArrowInvalid:
        with ipc.open_stream(path) as r:
            schema = r.schema
    meta = schema.metadata or {}
    geo = {}
    if b"geo" in meta:
        try:
            geo = json.loads(meta[b"geo"])
        except (ValueError, UnicodeDecodeError):
            geo = {}
    gcol = geometry_column or geo.get("primary_column") or (
        DEFAULT_GEO_COLUMN_NAME
        if DEFAULT_GEO_COLUMN_NAME in schema.names else None)
    crs = None
    if gcol and gcol in geo.get("columns", {}):
        crs = _crs_from_geo_meta(geo["columns"][gcol])
    fields = []
    for f in schema:
        if gcol is not None and f.name == gcol:
            continue
        fields.append(T.StructField(f.name, _pa_to_spark(f.type)))
    if gcol is not None and gcol in schema.names:
        fields.append(T.StructField(gcol, GEOM_TYPE))
    return fields, None, crs


#: normalized extension → cheap header/schema-only probe (r12);
#: read_files' driver-side schema probe prefers these
_MULTI_PROBE_PARSERS = {
    ".fgb": _probe_fgb_fields,
    ".arrow": _probe_ipc_fields,
}

_EXT_ALIASES = {".feather": ".arrow", ".ipc": ".arrow"}

#: extensions read_file can route when a directory/glob/list matches
_KNOWN_VECTOR_EXTS = (set(_MULTI_PARSERS) | set(_EXT_ALIASES)
                      | {".geojson", ".json", ".geojsonl", ".ndjson",
                         ".geojsons", ".parquet"})


def _norm_ext(p) -> str:
    import os
    e = os.path.splitext(str(p))[1].lower()
    return _EXT_ALIASES.get(e, e)


def _expand_paths(spec):
    """Glob pattern / directory / list-of-any → sorted file list.
    Directories list one level and keep only known vector extensions
    (so sidecars like a shapefile's .dbf/.shx never become rows)."""
    import glob as _glob
    import os
    if isinstance(spec, (list, tuple)):
        out = []
        for s in spec:
            out.extend(_expand_paths(s))
        return out
    spec = str(spec)
    if os.path.isdir(spec):
        return sorted(
            os.path.join(spec, f) for f in os.listdir(spec)
            if _norm_ext(f) in _KNOWN_VECTOR_EXTS)
    if any(ch in spec for ch in "*?["):
        return sorted(_glob.glob(spec))
    return [spec]


def read_files(spark: SparkSession, paths, geometry_column=None,
               crs=None, num_partitions=None, schema_files=1,
               schema_mode="strict", bbox=None, **fmt_kwargs):
    """Distributed multi-file ingest for the GDAL-free codecs (r11,
    VERDICT r10 #1). ``paths`` is a glob pattern, a directory, a list,
    or any mix — all files must share one format (shp / gpkg / fgb /
    kml / gpx / gml / arrow-ipc). The realistic 100 TB shape for these
    formats is MANY SMALL FILES (millions of GPX traces, tiled
    FGB/GPKG chunks): file paths are distributed one-slice-per-task
    and the existing pure-Python codecs run EXECUTOR-side — they are
    dependency-free and partition-local, so the read scales with the
    cluster instead of the driver. Paths must be visible from
    executors (shared storage on a real cluster). The exchange is
    Arrow-vectorized (r12, VERDICT r11 #1): each task turns a parsed
    file into ``pyarrow.RecordBatch`` chunks and hands them to Spark
    through ``mapInArrow`` — columnar batch transfer instead of the
    per-row pickling a ``parallelize``/``createDataFrame`` RDD pays,
    so big-tile reads are no longer serialization-bound.

    Schema: the first ``schema_files`` files (an int, or ``'all'``)
    are probed driver-side and their attribute fields unioned by
    name; later files may omit probed columns (filled with null). A
    column absent from every probed file raises with advice to raise
    ``schema_files`` when ``schema_mode='strict'`` (default); with
    ``schema_mode='union_null'`` such unprobed columns are DROPPED
    (the probed schema is the contract) so one surprise file at
    position 999 999 degrades softly instead of failing the job —
    probe wider (``schema_files='all'``) when every column matters.
    CRS comes from ``crs=`` or the first probed file; a file whose
    declared CRS differs raises (task-side) unless ``crs=`` overrides.

    ``bbox=(xmin, ymin, xmax, ymax)`` (r12, VERDICT r11 #5) keeps
    features whose bounds intersect the box and is pushed down
    EXECUTOR-side where the format carries an index: ``.fgb`` prunes
    via the packed-Hilbert R-tree (only matching feature records are
    decoded), ``.gpkg`` via the optional ``rtree_<table>_<col>``
    SQLite index when present; other formats decode then filter
    per-feature before rows ever reach Spark.

    GeoJSON is deliberately absent here: newline-delimited GeoJSON is
    already line-splittable through Spark's own distributed text/JSON
    scan (:func:`read_geojson`), which also accepts globs, dirs and
    path lists natively."""
    import os
    from pyspark.sql import types as T

    files = _expand_paths(paths)
    if not files:
        raise ValueError(f"no files match {paths!r}")
    kinds = {_norm_ext(f) for f in files}
    if not kinds <= set(_MULTI_PARSERS):
        raise ValueError(
            f"unsupported extensions {sorted(kinds - set(_MULTI_PARSERS))} "
            f"for read_files; supported: {sorted(_MULTI_PARSERS)} "
            "(+ .feather/.ipc as .arrow)")
    if len(kinds) > 1:
        raise ValueError(f"mixed formats {sorted(kinds)} in one "
                         "read_files call; read each format separately")
    if schema_mode not in ("strict", "union_null"):
        raise ValueError("schema_mode must be 'strict' or 'union_null'")
    ext = kinds.pop()
    parser = _MULTI_PARSERS[ext]
    gc_kw = {} if (ext == ".arrow" and geometry_column is None) else \
        {"geometry_column": geometry_column or DEFAULT_GEO_COLUMN_NAME}

    post_bbox = None
    if bbox is not None:
        bbox = tuple(float(v) for v in bbox)
        if ext in (".fgb", ".gpkg"):
            fmt_kwargs["bbox"] = bbox   # index pushdown inside the codec
        else:
            post_bbox = bbox            # exact per-feature filter below

    # ---- driver-side probe: union schema + CRS of the first K files.
    # GeoPackage probes with a row LIMIT (schema + declared types live
    # in SQLite metadata; a handful of rows cover the typeless-column
    # value probe) so a huge first file never materializes on the
    # driver; the other formats parse the probe file fully — the same
    # cost as one single-file read (review r11)
    probe_kw = dict(fmt_kwargs)
    if ext == ".gpkg":
        probe_kw["max_rows"] = 100
        probe_kw.pop("bbox", None)   # schema probe must not depend on it
    n_probe = len(files) if schema_files == "all" \
        else max(1, int(schema_files))
    merged, types_by_name = [], {}
    crs0 = None
    probe_parser = _MULTI_PROBE_PARSERS.get(ext) \
        or _MULTI_BATCH_PARSERS.get(ext, parser)
    for p in files[:n_probe]:
        flds, _rows, fcrs = probe_parser(p, **gc_kw, **probe_kw)
        if crs0 is None and fcrs is not None:
            crs0 = str(fcrs)
        for f in flds:
            t = types_by_name.get(f.name)
            if t is None:
                types_by_name[f.name] = f.dataType
                merged.append(f)
            elif t != f.dataType:
                raise ValueError(
                    f"column {f.name!r} has conflicting types across "
                    f"files: {t} vs {f.dataType} ({p})")
    from .sparktypes import is_geom_type
    gname = next((f.name for f in merged if is_geom_type(f.dataType)),
                 None)
    if gname is not None:            # geometry stays last by convention
        merged = ([f for f in merged if f.name != gname]
                  + [f for f in merged if f.name == gname])

    names = [f.name for f in merged]
    name_set = set(names)
    check_crs = crs is None
    strict = schema_mode == "strict"
    spark_schema = T.StructType(merged)
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema
    arrow_schema = to_arrow_schema(spark_schema)
    # geometry structs arrive from the codecs as tuples — pyarrow
    # struct arrays want dicts, so remember each struct field's
    # sub-names for the zip below
    struct_subnames = {f.name: [sf.name for sf in f.dataType.fields]
                       for f in merged
                       if isinstance(f.dataType, T.StructType)}
    BATCH_ROWS = 1 << 16              # bound one RecordBatch's memory
    batch_parser = _MULTI_BATCH_PARSERS.get(ext)

    def _file_batches(p):
        if batch_parser is not None:
            flds, table, fcrs = batch_parser(p, **gc_kw, **fmt_kwargs)
            rows = None
        else:
            flds, rows, fcrs = parser(p, **gc_kw, **fmt_kwargs)
            table = None
        if check_crs and fcrs is not None:
            if crs0 is None:
                # the probed files carried no CRS (e.g. .shp with no
                # .prj) but this one declares — silently stamping
                # DEFAULT_CRS would be a lie (ADVICE r11)
                raise ValueError(
                    f"{p}: declares CRS {fcrs!r} but the probed "
                    "file(s) carried none; pass crs= explicitly")
            if str(fcrs) != crs0:
                raise ValueError(
                    f"{p}: CRS {fcrs!r} differs from the first "
                    f"file's {crs0!r}; pass crs= to override "
                    "(reprojection is to_crs's job, not the "
                    "reader's)")
        fnames = [f.name for f in flds]
        extra = [n for n in fnames if n not in name_set]
        if extra and strict:
            raise ValueError(
                f"{p}: columns {extra} absent from the probed "
                f"schema; raise schema_files= (currently probing "
                f"{n_probe} file(s)) or pass schema_mode='union_null' "
                "to drop them")
        if table is not None:
            # vectorized path: align the parsed Arrow columns to the
            # probed schema (cast where the file's physical type
            # differs, null-fill the absent ones) and re-chunk
            present = set(table.column_names)
            arrays = []
            for f, af in zip(merged, arrow_schema):
                if f.name in present:
                    arr = table.column(f.name)
                    if arr.type != af.type:
                        arr = arr.cast(af.type)
                    if isinstance(arr, pa.ChunkedArray):
                        arr = arr.combine_chunks()
                else:
                    arr = pa.nulls(table.num_rows, af.type)
                arrays.append(arr)
            aligned = pa.Table.from_arrays(arrays, schema=arrow_schema)
            yield from aligned.to_batches(max_chunksize=BATCH_ROWS)
            return
        idx = {n: i for i, n in enumerate(fnames)}
        if not isinstance(rows, list):
            rows = list(rows)
        for s in range(0, len(rows), BATCH_ROWS):
            chunk = rows[s:s + BATCH_ROWS]
            arrays = []
            for f, af in zip(merged, arrow_schema):
                j = idx.get(f.name)
                vals = ([r[j] for r in chunk] if j is not None
                        else [None] * len(chunk))
                sub = struct_subnames.get(f.name)
                if sub is not None:
                    vals = [None if v is None else dict(zip(sub, v))
                            for v in vals]
                arrays.append(pa.array(vals, type=af.type))
            yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

    def _task(batches):
        for b in batches:
            for p in b.column(0).to_pylist():
                yield from _file_batches(p)

    sc = spark.sparkContext
    nparts = int(num_partitions) if num_partitions else \
        min(len(files), max(sc.defaultParallelism, 1) * 4)
    # parallelize keeps contiguous, file-ordered path slices (a plain
    # repartition would round-robin-shuffle and lose order stability,
    # which skip_features= relies on); createDataFrame over an RDD
    # preserves its partitioning
    paths_df = spark.createDataFrame(
        sc.parallelize([(p,) for p in files], nparts), "path string")
    df = paths_df.mapInArrow(_task, spark_schema)
    if gname is None:
        if bbox is not None:
            raise ValueError("bbox= requires a geometry column")
        return df
    out = GeoDataFrame(df, gname, crs or crs0 or DEFAULT_CRS)
    if post_bbox is not None:
        out = _apply_read_filters(out, post_bbox, None, None, None, None)
    return out


def _apply_read_filters(out, bbox, where, skip_features, columns,
                        max_features):
    """The ONE post-read arg pipeline every read_file branch shares
    (review r11): bbox intersects -> where -> skip_features offset ->
    column projection -> max_features limit. Accepts a GeoDataFrame
    (geometry column always kept by the projection) or a plain
    DataFrame (attribute-only input; bbox is meaningless and must be
    passed as None)."""
    geo = isinstance(out, GeoDataFrame)
    gcol = out.geometry_column if geo else None
    df = out.df if geo else out
    if bbox is not None:
        if not geo:
            raise ValueError("bbox= requires a geometry column")
        xmin, ymin, xmax, ymax = bbox
        x0, y0, x1, y1 = st.bounds(F.col(gcol))
        df = df.where((x0 <= float(xmax)) & (float(xmin) <= x1)
                      & (y0 <= float(ymax)) & (float(ymin) <= y1))
    if where is not None:
        # filter before the projection so the predicate may reference
        # columns the caller is not keeping
        df = df.where(where)
    if skip_features is not None:
        # pyogrio parity: an offset over the order-stable native
        # ingest, after the attribute filter (r11)
        df = df.offset(int(skip_features))
    if columns is not None:
        keep = [c for c in df.columns
                if c in set(columns) or c == gcol]
        df = df.select(*keep)
    if max_features is not None:
        df = df.limit(int(max_features))
    return GeoDataFrame(df, gcol, out.crs) if geo else df


def _write_ipc_file(path, schema, gcol, crs, rows):
    """Pure Arrow-IPC (Feather V2) file write from collected/partition
    rows — executor-safe; the multi-file twin of :func:`write_ipc`
    (same layout: WKB geometry column + GeoParquet-style ``geo``
    schema metadata), used by :func:`write_files` (r11)."""
    import pyarrow as pa
    import pyarrow.ipc as ipc
    from .geom import wkb as _wkb
    from .proj import crs_to_string as _crs_str
    cols = {}
    for f in schema.fields:
        n = f.name
        if n == gcol:
            vals = []
            for r in rows:
                g = r[gcol]
                if g is None or g["gt"] is None:
                    vals.append(None)
                else:
                    vals.append(_wkb.encode_geom(
                        int(g["gt"]), [float(v) for v in g["xs"]],
                        [float(v) for v in g["ys"]],
                        [int(v) for v in g["rings"]],
                        [int(v) for v in g["parts"]]))
            cols[n] = pa.array(vals, pa.binary())
        else:
            cols[n] = pa.array([r[n] for r in rows])
    table = pa.table(cols)
    meta = dict(table.schema.metadata or {})
    meta[b"geo"] = json.dumps(
        {"version": "1.0.0", "primary_column": gcol,
         "columns": {gcol: {"encoding": "WKB",
                            "crs": _crs_str(crs)}}}).encode()
    table = table.replace_schema_metadata(meta)
    with ipc.new_file(path, table.schema) as w:
        w.write_table(table)


#: normalized extension → executor-safe per-file writer (r11)
_MULTI_FILE_WRITERS = {
    ".fgb": _write_fgb_file,
    ".kml": _write_kml_file,
    ".gpkg": _write_gpkg_file,
    ".arrow": _write_ipc_file,
}


def write_files(gdf: GeoDataFrame, directory: str, format: str = "fgb",
                mode: str = "overwrite", num_files=None,
                **fmt_kwargs) -> int:
    """Distributed multi-file vector SINK (r11) — the write mirror of
    :func:`read_files`: every partition serializes its rows with the
    pure per-file encoder EXECUTOR-side and writes ONE file
    (``part-NNNNN.<ext>``) into ``directory``, so exporting a 100 TB
    table to FlatGeobuf/GeoPackage/KML/Arrow-IPC tiles scales with the
    cluster instead of funnelling through a driver ``collect`` (the
    single-file writers' documented bound). ``directory`` must be on
    storage every executor can write (same contract as read_files'
    input paths). ``num_files`` repartitions first; empty partitions
    write no file. Returns the number of files written; GeoJSONSeq
    needs no multi-file sink (:func:`write_geojson` is already a
    distributed Spark text write). Round-trips through
    :func:`read_files` row-identically (tests)."""
    import os
    import shutil
    ext = format if str(format).startswith(".") else f".{format}"
    ext = _EXT_ALIASES.get(ext.lower(), ext.lower())
    if ext not in _MULTI_FILE_WRITERS:
        raise ValueError(
            f"unsupported write_files format {format!r}; supported: "
            f"{sorted(_MULTI_FILE_WRITERS)} (+ .feather/.ipc as "
            ".arrow); use write_geojson for distributed GeoJSONSeq "
            "and write_geoparquet for parquet")
    if os.path.exists(directory):
        if mode != "overwrite":
            raise ValueError(f"{directory} exists (mode={mode!r})")
        shutil.rmtree(directory)
    os.makedirs(directory)
    schema, gcol, crs = gdf.df.schema, gdf.geometry_column, gdf.crs
    df = gdf.df.repartition(int(num_files)) if num_files else gdf.df
    writer = _MULTI_FILE_WRITERS[ext]

    def task(idx, it):
        rows = list(it)
        if rows:
            writer(os.path.join(directory, f"part-{idx:05d}{ext}"),
                   schema, gcol, crs, rows, **fmt_kwargs)
            yield 1

    return int(df.rdd.mapPartitionsWithIndex(task).sum())


def list_layers(path: str):
    """``[(layer_name, geometry_type_name_or_None)]`` — reference
    ``pyogrio.list_layers`` parity (io/file.py:16) for the native
    formats: GeoPackage lists its ``gpkg_contents`` feature layers
    with the declared geometry type, GPX the three spec layers
    (matching the GDAL driver's split), and the single-layer formats
    report the file stem. The returned order is the ``layer=<int>``
    index order :func:`read_file`/:func:`read_geopackage` accept."""
    import os
    import sqlite3
    ext = _norm_ext(path)
    if ext == ".gpkg":
        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        try:
            rows = con.execute(
                "SELECT c.table_name, g.geometry_type_name "
                "FROM gpkg_contents c JOIN gpkg_geometry_columns g "
                "ON g.table_name = c.table_name "
                "WHERE c.data_type = 'features'").fetchall()
        finally:
            con.close()
        return [(r[0], r[1]) for r in rows]
    if ext == ".gpx":
        return [("waypoints", "Point"), ("routes", "LineString"),
                ("tracks", "MultiLineString")]
    return [(os.path.splitext(os.path.basename(path))[0], None)]


def read_file(spark: SparkSession, path: str, bbox=None, columns=None,
              max_features=None, layer=None, read_geometry=True,
              force_2d=False, return_fids=False, encoding=None,
              **pyogrio_kwargs):
    """Vector-file read (reference read_file, io/file.py:15-119).

    Natively-decoded formats need no GDAL: ``.shp`` routes to
    :func:`read_shapefile`, ``.geojson``/``.json`` to
    :func:`read_geojson` (``.geojsonl``/``.ndjson`` as line-delimited
    features), parquet to :func:`read_geoparquet`. Anything else falls
    through to the pyogrio/GDAL passthrough, import-gated (GDAL absent
    in this container).

    The reference forwards scan-time pushdown args to GDAL
    (io/file.py:48-86); the native dispatch honors the common three:
    ``bbox=(xmin, ymin, xmax, ymax)`` (a REAL packed-Hilbert-index
    pushdown for .fgb — only intersecting leaves are decoded — a
    lazy bbox-intersects filter elsewhere), ``columns`` (projection;
    Catalyst prunes the scan for parquet) and ``max_features``
    (limit) — plus ``where`` (r10): an attribute-filter SQL expression
    applied post-parse as ``df.where(...)``; the reference forwards it
    to GDAL's OGR SQL (io/file.py:48-86), and simple comparison/IN/LIKE
    predicates read identically in Spark SQL.

    r11 adds the remaining pyogrio read args (reference io/file.py:
    48-86): ``skip_features`` (offset applied after ``where``, before
    ``max_features`` — ``df.offset`` on the order-stable native
    ingest) and ``fids`` for the formats that actually carry feature
    ids — GeoPackage (SQLite rowid), FlatGeobuf (0-based feature
    index) and GML (gml:id); like pyogrio, ``fids`` cannot combine
    with where/bbox/skip_features/max_features.

    r12 closes the arg long tail (VERDICT r11 #2, reference
    io/file.py:16-31): ``layer=`` (name or :func:`list_layers` index)
    for multi-layer GeoPackage and the GPX layer split;
    ``read_geometry=False`` returns the attribute table as a plain
    DataFrame; ``return_fids=True`` prepends a ``fid`` BIGINT column
    (shp record index / gpkg rowid / fgb feature index — .gml already
    carries gml_id); ``encoding=`` decodes shapefile .dbf text;
    ``force_2d`` is accepted for parity — the engine's WKB ingest is
    2D (Z dropped) so it is currently always-on, documented. Remaining
    kwargs (sql/...) stay on the GDAL passthrough, which now receives
    every popped arg."""
    where = pyogrio_kwargs.pop("where", None)
    skip_features = pyogrio_kwargs.pop("skip_features", None)
    fids = pyogrio_kwargs.pop("fids", None)
    if fids is not None and (where is not None or bbox is not None
                             or skip_features is not None
                             or max_features is not None):
        raise ValueError("cannot combine fids with where/bbox/"
                         "skip_features/max_features (pyogrio raises "
                         "the same)")
    import os as _os
    multi = isinstance(path, (list, tuple)) or (
        isinstance(path, str)
        and (any(ch in path for ch in "*?[") or _os.path.isdir(path)))
    if multi and isinstance(path, str) and _os.path.isdir(path):
        # a Spark-written dataset DIRECTORY named like a file
        # (x.geojsonl/, x.parquet/ full of part files) reads natively
        # through the extension dispatch below, not the multi path;
        # same for a directory holding no known vector files
        if _norm_ext(path) in _KNOWN_VECTOR_EXTS or \
                not _expand_paths(path):
            multi = False
    if multi:
        if pyogrio_kwargs:
            raise ValueError(
                f"unsupported read_file arguments {sorted(pyogrio_kwargs)} "
                "with multi-file input (glob/directory/list); they are "
                "GDAL-passthrough args and only apply to a single path")
        if fids is not None:
            raise ValueError(
                "fids= is not supported with multi-file input — feature "
                "ids are per-file; read the one file that carries them")
        if return_fids:
            raise ValueError(
                "return_fids= is not supported with multi-file input — "
                "feature ids are per-file and would collide across the "
                "set")
        if layer is not None or encoding is not None:
            raise ValueError(
                "layer=/encoding= only apply to a single path, not "
                "multi-file input (glob/directory/list)")
        files = _expand_paths(path)
        kinds = {_norm_ext(f) for f in files}
        if kinds and kinds <= {".geojson", ".json", ".geojsonl",
                               ".ndjson", ".geojsons"}:
            # Spark's own JSON/text scan handles globs/dirs/lists —
            # but one scan can only use ONE framing: a mixed set of
            # FeatureCollection (.geojson) and line-delimited
            # (.geojsonl) files would misparse the former under
            # lines=True (ADVICE r11)
            lines = bool(kinds & {".geojsonl", ".ndjson", ".geojsons"})
            if lines and kinds & {".geojson", ".json"}:
                raise ValueError(
                    f"mixed GeoJSON framings {sorted(kinds)} in one "
                    "read_file call (FeatureCollection vs "
                    "newline-delimited); read the two groups "
                    "separately and union")
            out = read_geojson(spark,
                               path if isinstance(path, str) else files,
                               lines=lines)
        elif kinds == {".parquet"} and isinstance(path, str):
            out = read_geoparquet(spark, path)   # native glob/dir scan
        else:
            out = read_files(spark, path)
        res = _apply_read_filters(out, bbox, where, skip_features,
                                  columns, max_features)
        if not read_geometry and isinstance(res, GeoDataFrame):
            res = res.df.drop(res.geometry_column)
        return res
    low = path.lower()
    if not pyogrio_kwargs:
        out = None
        native = low.endswith((
            ".shp", ".gpkg", ".fgb", ".kml", ".gpx", ".gml",
            ".geojson", ".json", ".geojsonl", ".ndjson", ".geojsons",
            ".arrow", ".feather", ".ipc", ".parquet"))
        if native:
            # arg/format compatibility guards (pyogrio parity: GDAL
            # raises on args the driver cannot honor); unknown
            # extensions fall through to the passthrough, which
            # forwards everything
            if fids is not None and not low.endswith(
                    (".gpkg", ".fgb", ".gml")):
                raise ValueError(
                    "fids= is supported on the native dispatch for the "
                    "formats that carry feature ids: .gpkg (rowid), "
                    ".fgb (feature index), .gml (gml:id)")
            if layer is not None and not low.endswith(
                    (".gpkg", ".gpx")):
                raise ValueError(
                    "layer= on the native dispatch applies to "
                    "multi-layer formats: .gpkg (name or list_layers "
                    "index) and .gpx (waypoints/routes/tracks); "
                    f"{path!r} is single-layer")
            if encoding is not None and not low.endswith(".shp"):
                raise ValueError(
                    "encoding= on the native dispatch applies to "
                    "shapefile .dbf text; XML/JSON formats declare "
                    "their own encoding")
            if return_fids and not low.endswith(
                    (".shp", ".gpkg", ".fgb")):
                raise ValueError(
                    "return_fids= is supported on the native dispatch "
                    "for .shp (record index), .gpkg (rowid) and .fgb "
                    "(feature index); .gml already surfaces gml:id as "
                    "the gml_id column")
        if low.endswith(".shp"):
            out = read_shapefile(spark, path, encoding=encoding,
                                 return_fids=return_fids)
        elif low.endswith(".gpkg"):
            out = read_geopackage(spark, path, fids=fids, bbox=bbox,
                                  layer=layer, return_fids=return_fids)
            bbox = None                       # codec already applied it
        elif low.endswith(".fgb"):
            out = read_flatgeobuf(spark, path, bbox=bbox, fids=fids,
                                  return_fids=return_fids)
            bbox = None                       # index already applied it
        elif low.endswith(".kml"):
            out = read_kml(spark, path)
        elif low.endswith(".gpx"):
            gpx_layer = layer
            if isinstance(gpx_layer, int):    # list_layers index order
                names = [n for n, _ in list_layers(path)]
                if not 0 <= gpx_layer < len(names):
                    raise ValueError(
                        f"layer index {gpx_layer} out of range for "
                        f"gpx layers {names}")
                gpx_layer = names[gpx_layer]
            out = read_gpx(spark, path, layer=gpx_layer or "tracks")
        elif low.endswith(".gml"):
            out = read_gml(spark, path, fids=fids)
        elif low.endswith((".geojson", ".json")):
            out = read_geojson(spark, path)
        elif low.endswith((".geojsonl", ".ndjson", ".geojsons")):
            out = read_geojson(spark, path, lines=True)
        elif low.endswith((".arrow", ".feather", ".ipc")):
            # bbox/where must filter BEFORE the projection and any row
            # limit (the order every other format gets from the shared
            # block below), so hold columns/max_features back from the
            # Arrow-side pushdown whenever a filter is present
            filtered = (where is not None or bbox is not None
                        or skip_features is not None)
            out = read_ipc(spark, path,
                           columns=None if filtered else columns,
                           max_features=None if filtered else max_features)
            if not isinstance(out, GeoDataFrame):
                # attribute-only table: when the pushdown was withheld
                # (ADVICE r10) the shared helper re-applies
                # columns/max_features; when it was NOT withheld they
                # were already applied Arrow-side, so pass None
                return _apply_read_filters(
                    out, None, where, skip_features,
                    columns if filtered else None,
                    max_features if filtered else None)
            if not filtered:
                columns = max_features = None  # applied Arrow-side
        elif low.endswith(".parquet"):
            out = read_geoparquet(spark, path)
        if out is not None:
            res = _apply_read_filters(out, bbox, where, skip_features,
                                      columns, max_features)
            if not read_geometry and isinstance(res, GeoDataFrame):
                # pyogrio read_geometry=False: the attribute table as
                # a plain DataFrame (r12)
                res = res.df.drop(res.geometry_column)
            return res
    try:
        from pyogrio.raw import read_arrow  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "read_file requires pyogrio/GDAL which is not available in "
            "this environment; use read_geoparquet / from_wkt_df instead"
        ) from e
    # the passthrough honors every popped pushdown arg GDAL-side —
    # previously only `where` was re-added, so a call mixing e.g.
    # layer= with fids=/skip_features= silently returned the full,
    # un-offset feature set (ADVICE r11)
    for k, v in (("where", where), ("fids", fids),            # pragma: no cover
                 ("skip_features", skip_features), ("bbox", bbox),
                 ("columns", columns), ("max_features", max_features),
                 ("layer", layer), ("encoding", encoding)):
        if v is not None:                                     # pragma: no cover
            pyogrio_kwargs[k] = v
    if return_fids:                                           # pragma: no cover
        pyogrio_kwargs["return_fids"] = True
    if not read_geometry:                                     # pragma: no cover
        pyogrio_kwargs["read_geometry"] = False
    if force_2d:                                              # pragma: no cover
        pyogrio_kwargs["force_2d"] = True
    meta, table = read_arrow(path, **pyogrio_kwargs)  # pragma: no cover
    pdf = table.to_pandas()
    gcol = meta.get("geometry_name") or "wkb_geometry"
    df = spark.createDataFrame(pdf)
    if gcol in pdf.columns:
        df = df.withColumn(gcol, st.from_wkb(F.col(gcol)))
        return GeoDataFrame(df, gcol, str(meta.get("crs") or DEFAULT_CRS))
    return df


def write_file(gdf: GeoDataFrame, path: str, **kwargs) -> None:
    """Extension-dispatched vector write — the sink mirror of
    :func:`read_file` (r10). The reference has NO write path at all
    (SURVEY §2.5: `to_file` is commented out of its roadmap,
    geoseries.rst:124); this engine routes by extension:
    ``.parquet`` → :func:`write_geoparquet` (the distributed format),
    ``.geojson/.geojsonl/.ndjson`` → :func:`write_geojson`
    (newline-delimited, splittable), ``.gpkg`` →
    :func:`write_geopackage`, ``.fgb`` → :func:`write_flatgeobuf`,
    ``.kml`` → :func:`write_kml`, ``.arrow/.feather/.ipc`` →
    :func:`write_ipc`. Extra kwargs forward to the format writer."""
    low = path.lower()
    if low.endswith(".parquet"):
        return write_geoparquet(gdf, path, **kwargs)
    if low.endswith((".geojson", ".geojsonl", ".ndjson", ".geojsons")):
        return write_geojson(gdf, path, **kwargs)
    if low.endswith(".gpkg"):
        return write_geopackage(gdf, path, **kwargs)
    if low.endswith(".fgb"):
        return write_flatgeobuf(gdf, path, **kwargs)
    if low.endswith(".kml"):
        return write_kml(gdf, path, **kwargs)
    if low.endswith((".arrow", ".feather", ".ipc")):
        return write_ipc(gdf, path, **kwargs)
    raise ValueError(
        f"unsupported output extension for {path!r}; supported: "
        ".parquet .geojson(.l) .gpkg .fgb .kml .arrow/.feather/.ipc")


def write_bucketed(df: DataFrame, table: str, bucket_cols,
                   num_buckets: int = 64, sort_cols=None, path=None,
                   mode="overwrite", fmt="parquet") -> None:
    """Write a DataFrame as a bucketed (and optionally sorted) table —
    the co-located-join layout for the 100 TB path.

    Two fact tables bucketed on the same key with the same bucket count
    join WITHOUT a shuffle: Spark matches bucket files pairwise, so the
    exchange that dominates a large equi-join at scale disappears from
    the plan entirely (tests assert `Exchange` is absent). Adding
    ``sort_cols`` on the join key also removes the per-task sort of a
    sort-merge join. Bucketing must go through the table catalog
    (``saveAsTable``) — plain ``.parquet(path)`` writes cannot carry
    bucket metadata; pass ``path`` to keep the files at an external
    location while the catalog tracks the layout.
    """
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    w = (df.write.format(fmt).mode(mode)
         .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
