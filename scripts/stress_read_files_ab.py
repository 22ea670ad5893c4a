"""Big-tile multi-file ingest A/B (r12, VERDICT r11 task #1): the r11
read_files shipped parsed rows to the JVM as pickled Python tuples
(``sc.parallelize(paths).mapPartitions`` + ``createDataFrame(rdd)``) —
correct, but serialization-bound once tiles are big. r12 yields
``pyarrow.RecordBatch`` chunks per file through ``mapInArrow``. This
script generates N FlatGeobuf tiles of M rows each and interleaves the
two exchanges in ONE Spark session (the only timing protocol this box
respects — see the verify skill): warm pass each, then alternating
timed passes, min reported. Row-identity between the two paths is
asserted in-run.

Usage: python scripts/stress_read_files_ab.py [n_files] [rows_per_file] [fmt]
(fmt: fgb | arrow — arrow tiles have the cheapest parse, isolating the
exchange cost; fgb tiles measure the blended parse+exchange path)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from arctic_spark import GeoDataFrame, st  # noqa: E402
from arctic_spark import io as aio  # noqa: E402
from arctic_spark.session import get_spark  # noqa: E402


def read_files_pickled(spark, paths, num_partitions=None):
    """The r11 exchange, verbatim shape: executor-side parse, rows as
    pickled tuples through parallelize + createDataFrame(rdd). Kept
    ONLY as the A-side of this stress comparison."""
    from arctic_spark.io import (_expand_paths, _norm_ext,
                                 _MULTI_PARSERS, DEFAULT_GEO_COLUMN_NAME,
                                 DEFAULT_CRS)
    from arctic_spark.sparktypes import GEOM_TYPE

    files = _expand_paths(paths)
    ext = _norm_ext(files[0])
    parser = _MULTI_PARSERS[ext]
    gc_kw = {"geometry_column": DEFAULT_GEO_COLUMN_NAME}
    flds, _rows, crs0 = parser(files[0], **gc_kw)
    merged = list(flds)
    gname = next(f.name for f in merged if f.dataType == GEOM_TYPE)
    merged = ([f for f in merged if f.name != gname]
              + [f for f in merged if f.name == gname])
    names = [f.name for f in merged]

    def _task(path_iter):
        for p in path_iter:
            pf, rows, _ = parser(p, **gc_kw)
            fnames = [f.name for f in pf]
            if fnames == names:
                for r in rows:
                    yield tuple(r)
            else:
                idx = {n: i for i, n in enumerate(fnames)}
                for r in rows:
                    yield tuple(r[idx[n]] if n in idx else None
                                for n in names)

    sc = spark.sparkContext
    nparts = int(num_partitions) if num_partitions else \
        min(len(files), max(sc.defaultParallelism, 1) * 4)
    rdd = sc.parallelize(files, nparts).mapPartitions(_task)
    df = spark.createDataFrame(rdd, schema=T.StructType(merged))
    return GeoDataFrame(df, gname, crs0 or DEFAULT_CRS)


def materialize(gdf):
    """Full-width materialization (noop sink) — count() would prune
    the parse on the pickled path."""
    gdf.df.write.format("noop").mode("overwrite").save()


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rows_per = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    fmt = sys.argv[3] if len(sys.argv) > 3 else "fgb"
    spark = get_spark("arctic_spark-stress-readfiles-ab")
    d = tempfile.mkdtemp(prefix="arctic_ab_tiles_")
    try:
        t0 = time.perf_counter()
        n = n_files * rows_per
        df = spark.range(n).select(
            F.col("id").cast("long").alias("k"),
            F.concat(F.lit("feature-"), F.col("id")).alias("tag"),
            (F.col("id") % 1000).cast("double").alias("score"),
            st.make_envelope(
                (F.col("id") % 3600).cast("double") * 0.1 - 180.0,
                ((F.col("id") / 3600).cast("long") % 1700)
                .cast("double") * 0.1 - 85.0,
                (F.col("id") % 3600).cast("double") * 0.1 - 179.9,
                ((F.col("id") / 3600).cast("long") % 1700)
                .cast("double") * 0.1 - 84.9,
            ).alias("geometry"))
        wrote = aio.write_files(GeoDataFrame(df, crs="EPSG:4326"), d,
                                format=fmt, num_files=n_files)
        print(f"generated {wrote} {fmt} tiles x ~{rows_per:,} rows "
              f"({n:,} total) in {time.perf_counter() - t0:.1f}s",
              flush=True)

        arrow = lambda: aio.read_files(spark, d)          # noqa: E731
        pickled = lambda: read_files_pickled(spark, d)    # noqa: E731

        # row-identity first (sorted full-width hash)
        def sig(g):
            return g.df.select(
                F.expr("bit_xor(xxhash64(k, tag, score, geometry.gt))"
                       ).alias("h"),
                F.count("*").alias("n")).collect()[0]
        sa, sp = sig(arrow()), sig(pickled())
        assert (sa.h, sa.n) == (sp.h, sp.n), (sa, sp)
        print(f"row-identity OK: {sa.n:,} rows, hash {sa.h}", flush=True)

        # warm one pass each, then interleave 3 timed passes per side
        materialize(arrow())
        materialize(pickled())
        times = {"arrow": [], "pickled": []}
        for _ in range(3):
            for label, fn in (("arrow", arrow), ("pickled", pickled)):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                materialize(fn())
                times[label].append(time.perf_counter() - t0)
        shown = {k: "/".join(f"{x:.1f}" for x in v)
                 for k, v in times.items()}
        best = {k: min(v) for k, v in times.items()}
        print(f"arrow (mapInArrow)            : {shown['arrow']} s "
              f"(min {best['arrow']:.1f})", flush=True)
        print(f"pickled (parallelize+createDF): {shown['pickled']} s "
              f"(min {best['pickled']:.1f})", flush=True)
        print(f"speedup: {best['pickled'] / best['arrow']:.2f}x",
              flush=True)

        # bbox pushdown on the same tiles (VERDICT r11 #5): decoded
        # features drop via the packed-Hilbert index executor-side
        bbox = (0.0, 0.0, 4.0, 4.0)
        t0 = time.perf_counter()
        sel = aio.read_files(spark, d, bbox=bbox)
        nsel = sel.df.count()
        dt_sel = time.perf_counter() - t0
        t0 = time.perf_counter()
        post = aio.read_files(spark, d)
        gc = "geometry"
        b = st.bounds(F.col(gc))
        npost = post.df.where(
            (b[0] <= bbox[2]) & (b[2] >= bbox[0])
            & (b[1] <= bbox[3]) & (b[3] >= bbox[1])).count()
        dt_post = time.perf_counter() - t0
        assert nsel == npost, (nsel, npost)
        print(f"bbox pushdown: {nsel:,}/{sa.n:,} rows kept; "
              f"indexed read {dt_sel:.1f}s vs decode-then-filter "
              f"{dt_post:.1f}s ({dt_post / dt_sel:.2f}x)", flush=True)
    finally:
        import shutil
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
