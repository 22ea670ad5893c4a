"""Warm A/B timer for a handful of queries in ONE Spark session.

Usage: python scripts/ab_time.py <warmups> <passes> query [query ...]

Each query: <warmups> discarded noop-sink passes, then <passes> timed
passes (fresh fn(spark, sf) + clearCache between, bench v4 style);
prints per-pass seconds and the min.  Run once on tree A, `git stash`,
run again on tree B within the same minutes (box swings 2-4x across
sessions, verify skill).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from arctic_spark.session import get_spark  # noqa: E402


def main():
    warmups, passes = int(sys.argv[1]), int(sys.argv[2])
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("arctic_spark-ab")
    qs = entrymod.queries()
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"ab:{name}")
        times = []
        for i in range(warmups + passes):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            if i >= warmups:
                times.append(dt)
        print(f"{name}: min={min(times):.3f} passes={times}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
