"""Boolean/overlay engine at scale (r12 slack): the arrangement-based
intersection kernel is the one §2.3 family without a STRESS record.
N pairs of overlapping axis squares run through the fused Arrow batch
UDF (`st.intersection` → geom/boolean.py) exactly as a distributed
overlay's refine stage would; every result area has a closed form, so
correctness is asserted EXACTLY over the whole run (BIGINT micro-unit
sum), and throughput is pairs/s on local[32].

The pair layout varies overlap fraction per row (disjoint, corner
overlap, containment) so the kernel's branch mix is realistic rather
than one-shape-hot.

Usage: python scripts/stress_boolean.py [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from arctic_spark import st  # noqa: E402
from arctic_spark.session import get_spark  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("arctic_spark-stress-boolean")
    try:
        # square A = [0,10]^2 shifted per row; square B overlaps it by
        # (dx, dy) where dx in {-12..12}: full misses, edge touches,
        # partial overlaps and containment all occur
        df = spark.range(n).select(
            "id",
            ((F.col("id") % 25).cast("double") - 12.0).alias("dx"),
            ((F.col("id") * 7 % 25).cast("double") - 12.0).alias("dy"))
        a = st.make_envelope(F.lit(0.0), F.lit(0.0), F.lit(10.0),
                             F.lit(10.0))
        b = st.make_envelope(F.col("dx"), F.col("dy"),
                             F.col("dx") + 10.0, F.col("dy") + 10.0)
        inter = df.select(
            "id", "dx", "dy",
            st.intersection(a, b).alias("g"))
        out = inter.select(
            "id", "dx", "dy",
            F.round(st.area(F.col("g")) * F.lit(1e6), 0).cast("long")
            .alias("area_u"))

        t0 = time.perf_counter()
        agg = out.agg(F.sum("area_u").alias("s"),
                      F.count("*").alias("c")).collect()[0]
        dt = time.perf_counter() - t0
        print(f"{n:,} polygon intersections in {dt:.1f}s "
              f"({n / dt / 1e3:.0f}k pairs/s)", flush=True)

        # closed form: overlap = max(0, 10-|dx|) * max(0, 10-|dy|)
        exact = df.select(
            F.round(
                F.greatest(F.lit(0.0), F.lit(10.0) - F.abs("dx"))
                * F.greatest(F.lit(0.0), F.lit(10.0) - F.abs("dy"))
                * F.lit(1e6), 0).cast("long").alias("e")) \
            .agg(F.sum("e").alias("s")).collect()[0]
        assert agg.c == n
        assert agg.s == exact.s, (agg.s, exact.s)
        print(f"exactness: closed-form area sum agrees "
              f"({agg.s:,} micro-units)", flush=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
