"""flip_coordinates / angle / dump_segments / closest_point /
longest_line / max_distance (PostGIS-parity extras, round 6)."""

import math

import pytest
from pyspark.sql import functions as F

from arctic_spark import st


def test_flip_coordinates(spark):
    df = spark.createDataFrame([(1,)], "i long")
    g = st.from_wkt(F.lit("LINESTRING(1 2,3 4)"))
    d = df.withColumn("g", g)
    r = d.select(st.to_wkt(st.flip_coordinates(F.col("g")))
                 .alias("w")).collect()[0]
    assert r["w"] == "LINESTRING (2 1, 4 3)"


def test_flip_coordinates_plan_native(spark):
    df = spark.createDataFrame([(0.0, 1.0)], "x double, y double")
    out = df.select(st.x(st.flip_coordinates(
        st.point(F.col("x"), F.col("y")))).alias("v"))
    assert "Python" not in out._jdf.queryExecution().executedPlan() \
        .toString()
    assert out.collect()[0]["v"] == 1.0


def test_angle_three_point(spark):
    df = spark.createDataFrame([(1,)], "i long")
    p1 = st.point(F.lit(1.0), F.lit(0.0))
    p2 = st.point(F.lit(0.0), F.lit(0.0))
    p3 = st.point(F.lit(0.0), F.lit(1.0))
    r = df.select(
        st.angle(p1, p2, p3).alias("a"),          # cw from east to north
        st.angle(p3, p2, p1).alias("b"),
        st.angle(p1, p2, p1).alias("zero"),
        st.angle(p1, p1, p3).alias("degen_null"),
    ).collect()[0]
    # az(P2,P3)=0 (north), az(P2,P1)=pi/2 (east): a = -pi/2 -> 3pi/2
    assert r["a"] == pytest.approx(3 * math.pi / 2, abs=1e-12)
    assert r["b"] == pytest.approx(math.pi / 2, abs=1e-12)
    assert r["zero"] == pytest.approx(0.0, abs=1e-12)
    assert r["degen_null"] is None  # degenerate ray p1->p1


def test_angle_four_point(spark):
    df = spark.createDataFrame([(1,)], "i long")
    p = lambda x, y: st.point(F.lit(float(x)), F.lit(float(y)))
    r = df.select(st.angle(p(0, 0), p(1, 0), p(0, 0), p(0, 1))
                  .alias("a")).collect()[0]
    # line east vs line north: cw from az pi/2 to az 0 -> 3pi/2
    assert r["a"] == pytest.approx(3 * math.pi / 2, abs=1e-12)


def test_dump_segments(spark):
    df = spark.createDataFrame([(1,)], "i long")
    d = df.withColumn("g", st.from_wkt(
        F.lit("POLYGON((0 0,2 0,2 2,0 2,0 0),(0.5 0.5,1 0.5,1 1,0.5 0.5))")))
    segs = d.select(F.explode(st.dump_segments(F.col("g"))).alias("s"))
    rows = segs.select(st.to_wkt(F.col("s")).alias("w"),
                       F.round(st.length(F.col("s")), 6).alias("l")) \
        .collect()
    assert len(rows) == 7  # 4 shell + 3 hole segments
    assert rows[0]["w"] == "LINESTRING (0 0, 2 0)"
    total = sum(r["l"] for r in rows)
    assert total == pytest.approx(8 + 0.5 + 0.5 + math.hypot(0.5, 0.5),
                                  abs=1e-6)
    # points dump to nothing; plan stays native
    pt = df.select(F.size(st.dump_segments(
        st.point(F.lit(1.0), F.lit(2.0)))).alias("n"))
    assert "Python" not in pt._jdf.queryExecution().executedPlan() \
        .toString()
    assert pt.collect()[0]["n"] == 0


def test_closest_point_and_longest_line(spark):
    df = spark.createDataFrame([(1,)], "i long")
    d = df.withColumn("a", st.from_wkt(F.lit("POLYGON((0 0,2 0,2 2,0 2,0 0))"))) \
          .withColumn("b", st.from_wkt(F.lit("POINT(5 1)")))
    d = d.withColumn("cp", st.closest_point(F.col("a"), F.col("b"))) \
         .withColumn("ll", st.longest_line(F.col("a"), F.col("b")))
    r = d.select(st.x(F.col("cp")).alias("cx"),
                 st.y(F.col("cp")).alias("cy"),
                 F.round(st.length(F.col("ll")), 9).alias("lmax"),
                 st.max_distance(F.col("a"), F.col("b")).alias("md")) \
        .collect()[0]
    assert (r["cx"], r["cy"]) == (2.0, 1.0)
    want = max(math.hypot(5 - x, 1 - y)
               for x, y in [(0, 0), (2, 0), (2, 2), (0, 2)])
    assert r["lmax"] == pytest.approx(want, abs=1e-9)
    assert r["md"] == pytest.approx(want, abs=1e-12)


def test_max_distance_null_for_empty(spark):
    df = spark.createDataFrame([(1,)], "i long")
    a = st.point(F.lit(0.0), F.lit(0.0))
    d = df.withColumn("e", st.from_wkt(F.lit("POINT EMPTY")))
    r = d.select(st.max_distance(a, F.col("e")).alias("m")).collect()[0]
    assert r["m"] is None
