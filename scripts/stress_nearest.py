"""Radius-bounded nearest-join at scale (r12 slack): the dwithin /
nearest family is the last join surface without a STRESS record. N
query points probe M site points for their nearest site within a
radius — the grid band-join shape (cell equi-join + native distance
refine + per-row top-k window, ONE shuffle). Sites sit on an exact
lattice so every query point's true nearest site is closed-form, and
the whole result is verified EXACTLY in-run.

Usage: python scripts/stress_nearest.py [n_queries] [n_sites]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from arctic_spark import GeoDataFrame, nearest_join, st  # noqa: E402
from arctic_spark.session import get_spark  # noqa: E402


def main():
    n_q = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_s = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark("arctic_spark-stress-nearest")
    try:
        side = int(n_s ** 0.5)             # sites on a 10-unit lattice
        sx = (F.col("id") % side).cast("double") * 10.0
        sy = ((F.col("id") / side).cast("long") % side).cast("double") \
            * 10.0
        sites = GeoDataFrame(spark.range(side * side).select(
            F.col("id").alias("sid"),
            st.point(sx, sy).alias("geometry")))
        # query points strictly inside lattice cells, offset (dx, dy)
        # from the cell corner with dx, dy in (0.5, 4.5): the nearest
        # site is ALWAYS the cell corner itself (closed form), at
        # distance sqrt(dx^2 + dy^2) < 6.4 < the 7.0 radius
        qcx = (F.col("id") % (side - 1)).cast("double")
        qcy = ((F.col("id") / (side - 1)).cast("long")
               % (side - 1)).cast("double")
        dx = ((F.col("id") * 7 % 9).cast("double") * 0.5 + 0.5)
        dy = ((F.col("id") * 13 % 9).cast("double") * 0.5 + 0.5)
        q = spark.range(n_q).select(
            F.col("id").alias("qid"), qcx.alias("cx"), qcy.alias("cy"),
            dx.alias("dx"), dy.alias("dy"))
        queries = GeoDataFrame(q.select(
            "qid",
            st.point(F.col("cx") * 10.0 + F.col("dx"),
                     F.col("cy") * 10.0 + F.col("dy"))
            .alias("geometry")))

        out = nearest_join(queries, sites, max_distance=7.0, k=1,
                           left_key="qid")
        t0 = time.perf_counter()
        n = out.df.count()
        dt = time.perf_counter() - t0
        print(f"{n_q:,} queries x {side * side:,} sites: {n:,} "
              f"nearest pairs in {dt:.1f}s "
              f"({n_q / dt / 1e6:.2f}M queries/s)", flush=True)
        assert n == n_q, (n, n_q)

        # exactness: every query's nearest site must be its own cell
        # corner sid = cy*side + cx, at distance sqrt(dx^2+dy^2)
        t0 = time.perf_counter()
        bad = (out.df
               .join(q, F.col("qid_left") == q["qid"])
               .where((F.col("sid_right")
                       != (F.col("cy") * side + F.col("cx"))
                       .cast("long"))
                      | (F.abs(F.col("distance")
                               - F.sqrt(F.col("dx") * F.col("dx")
                                        + F.col("dy") * F.col("dy")))
                         > 1e-9))
               .count())
        dt2 = time.perf_counter() - t0
        assert bad == 0, f"{bad} wrong nearest assignments"
        print(f"exactness: all {n_q:,} nearest sites + distances "
              f"match the closed form (checked in {dt2:.1f}s)",
              flush=True)
        out.release()
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
