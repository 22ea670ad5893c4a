"""Stress A/B for the geo_ring_accessors battery (r13, VERDICT r12 #1b):
native accessor-chain battery (interpreted lambda-HOF area/length folds
+ two separate pandas-UDF stages for clip_by_rect/representative_point)
vs the fused st.ring_stats Arrow kernel (ONE exchange, numpy batch
kernels) over the same constructed holed polygons at >=10M rows.

Equality is asserted on exact micro-unit (x1e6 BIGINT) sums of every
rounded metric plus boolean counts — any per-row difference anywhere
changes a sum. Timing is the noop sink over the full per-row output
(two passes per side after a warm pass, min reported).

Usage: python scripts/stress_ring_ab.py [n_rows] [passes]
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


def _base(spark, n):
    return spark.range(1, n + 1).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") * 7919 % 1000).alias("o_custkey"))


def _params():
    w = (F.col("o_orderkey") % 3).cast("double") * 2.0 + 6.0
    u = (F.col("o_orderkey") % 3).cast("double") * 0.3
    v = (F.col("o_custkey") % 3).cast("double") * 0.3
    return w, 1.0 + u, 1.0 + v


def _poly():
    w, hx, hy = _params()
    z = F.lit(0.0)
    return st.freeze(st.geom_struct(
        F.lit(3),
        F.array(z, w, w, z, z, hx, hx, hx + 1.0, hx + 1.0, hx),
        F.array(z, z, w, w, z, hy, hy + 1.0, hy + 1.0, hy, hy),
        F.array(F.lit(5), F.lit(5)), F.array(F.lit(2))))


def _rp_inside(rx, ry):
    w, hx, hy = _params()
    return ((rx > 0) & (rx < w) & (ry > 0) & (ry < w)
            & ~((rx > hx) & (rx < hx + 1.0)
                & (ry > hy) & (ry < hy + 1.0)))


def build_native(df):
    """The gate battery exactly as geo_ring_accessors builds it."""
    poly = F.col("__poly")
    df = (df.withColumn("__poly", _poly())
            .withColumn("__ext", st.freeze(st.exterior(poly)))
            .withColumn("__ints", st.freeze(st.interiors(poly)))
            .withColumn("__rp", st.freeze(st.representative_point(poly))))
    ext, ints, rp = F.col("__ext"), F.col("__ints"), F.col("__rp")
    clip = st.clip_by_rect(poly, -0.5, -0.5, 3.0, 100.0)
    hole = F.element_at(ints, 1)
    return df.select(
        "o_orderkey",
        F.round(st.area(poly), 6).alias("full_area"),
        F.round(st.area(clip), 6).alias("clip_area"),
        F.round(st.length(ext), 6).alias("ext_len"),
        F.round(st.length(st.boundary(poly)), 6).alias("bnd_len"),
        F.size(ints).cast("long").alias("n_holes"),
        F.round(st.length(hole), 6).alias("hole_len"),
        st.is_ring(ext).alias("ext_is_ring"),
        st.is_empty(poly).alias("empty"),
        _rp_inside(st.x(rp), st.y(rp)).alias("rp_inside"))


def build_kernel(df):
    """Same ten values through the fused Arrow kernel."""
    df = (df.withColumn("__poly", _poly())
            .withColumn("__rs", st.ring_stats(F.col("__poly"),
                                              -0.5, -0.5, 3.0, 100.0)))
    rs = F.col("__rs")
    return df.select(
        "o_orderkey",
        F.round(rs["full_area"], 6).alias("full_area"),
        F.round(rs["clip_area"], 6).alias("clip_area"),
        F.round(rs["ext_len"], 6).alias("ext_len"),
        F.round(rs["bnd_len"], 6).alias("bnd_len"),
        rs["n_holes"].alias("n_holes"),
        F.round(rs["hole_len"], 6).alias("hole_len"),
        rs["ext_is_ring"].alias("ext_is_ring"),
        rs["empty"].alias("empty"),
        _rp_inside(rs["rx"], rs["ry"]).alias("rp_inside"))


def _signature(df):
    micro = [F.sum(F.round(F.col(c) * 1e6).cast("long")).alias(c)
             for c in ("full_area", "clip_area", "ext_len", "bnd_len",
                       "hole_len")]
    bools = [F.count_if(F.col(c)).alias(c)
             for c in ("ext_is_ring", "empty", "rp_inside")]
    row = df.agg(F.count("*").alias("n"), F.sum("n_holes").alias("nh"),
                 *micro, *bools).collect()[0]
    return tuple(row)


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("arctic_spark-stress-ring-ab")
    sc = spark.sparkContext
    try:
        base = _base(spark, n_rows)
        sides = {"native_battery": build_native,
                 "kernel": build_kernel}
        sigs, results = {}, {}
        for name, build in sides.items():
            sc.setJobDescription(f"ring-ab {name} signature")
            sigs[name] = _signature(build(base))
            print(f"{name} signature: {sigs[name]}", flush=True)
            times = []
            for p in range(passes + 1):
                sc.setJobDescription(f"ring-ab {name} pass {p}")
                spark.catalog.clearCache()
                df = build(base)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if p > 0:          # pass 0 = warm-up
                    times.append(dt)
                print(f"  {name} pass {p}: {dt:.1f}s", flush=True)
            results[name] = min(times)
        assert sigs["native_battery"] == sigs["kernel"], sigs
        print(f"EQUAL signatures over {n_rows:,} rows", flush=True)
        for name, t in results.items():
            print(f"{name}: {t:.1f}s ({n_rows / t / 1e6:.2f}M rows/s)",
                  flush=True)
        print(f"speedup: {results['native_battery'] / results['kernel']:.2f}x",
              flush=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
