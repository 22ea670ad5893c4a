"""Many-small-files ingest stress (r11, VERDICT r10 task #1): generate
N tiny GPX trace files (the realistic 100 TB shape for the GDAL-free
formats — millions of device traces), then time ONE read_files call
that distributes paths across tasks and runs the pure-Python GPX codec
executor-side. Row-identity vs the single-file reader is covered by
tests/test_read_files_multi.py; this measures the scheduling + parse
throughput at file counts where a driver-side loop would be the
bottleneck.

Usage: python scripts/stress_multifile.py [n_files] [pts_per_track]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from arctic_spark import io as aio  # noqa: E402
from arctic_spark.session import get_spark  # noqa: E402


def gpx_doc(i: int, pts: int) -> str:
    base_lat, base_lon = 40.0 + (i % 100) * 0.01, -74.0 + (i % 97) * 0.01
    seg = "".join(
        f'<trkpt lat="{base_lat + j * 1e-4:.6f}" '
        f'lon="{base_lon + j * 1e-4:.6f}"><ele>{j}</ele></trkpt>'
        for j in range(pts))
    return ('<?xml version="1.0"?><gpx version="1.1" creator="stress">'
            f'<trk><name>trace{i}</name><trkseg>{seg}</trkseg></trk>'
            "</gpx>")


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    pts = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    d = tempfile.mkdtemp(prefix="arctic_stress_gpx_")
    t0 = time.perf_counter()
    for i in range(n_files):
        with open(os.path.join(d, f"trace{i:06d}.gpx"), "w") as fh:
            fh.write(gpx_doc(i, pts))
    print(f"generated {n_files:,} gpx files in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    spark = get_spark("arctic_spark-stress-multifile")
    try:
        t0 = time.perf_counter()
        out = aio.read_files(spark, d)
        agg = out.df.agg(
            F.count("*").alias("rows"),
            F.sum("n_points").alias("total_points")).collect()[0]
        dt = time.perf_counter() - t0
        nparts = out.df.rdd.getNumPartitions()
        print(f"read_files {n_files:,} gpx files: {dt:.1f}s, "
              f"{agg.rows:,} rows, {agg.total_points:,} points, "
              f"{nparts} partitions, {n_files / dt:,.0f} files/s",
              flush=True)
        assert agg.rows == n_files
        assert agg.total_points == n_files * pts
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
