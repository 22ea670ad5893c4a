"""Batch sessionization (temporal.sessionize/session_stats) and the
ST_Project forward ops (st.project_point / st.project_spherical)."""

import math

import pytest
from pyspark.sql import functions as F

from arctic_spark import st
from arctic_spark.temporal import session_stats, sessionize


def _events(spark, rows):
    return (spark.createDataFrame(rows, "uid long, t double, eid long")
            .select("uid", F.timestamp_seconds("t").alias("ts"), "eid"))


def test_sessionize_gap_boundary(spark):
    # gap EXACTLY equal to the threshold stays in the same session
    # (matches streaming.ops.sessionize_by_gap)
    ev = _events(spark, [(1, 0.0, 1), (1, 60.0, 2), (1, 120.5, 3)])
    got = {r["eid"]: r["session_seq"]
           for r in sessionize(ev, "ts", "uid", 60.0).collect()}
    assert got == {1: 1, 2: 1, 3: 2}  # 60.5s gap > 60s -> new session


def test_sessionize_multi_entity_and_stats(spark):
    ev = _events(spark, [(1, 0.0, 1), (1, 10.0, 2), (1, 200.0, 3),
                         (2, 5.0, 4), (2, 500.0, 5), (2, 505.5, 6)])
    s = {(r["uid"], r["session_seq"]): (r["n_events"], r["duration_s"])
         for r in session_stats(ev, "ts", "uid", 60.0).collect()}
    assert s == {(1, 1): (2, 10.0), (1, 2): (1, 0.0),
                 (2, 1): (1, 0.0), (2, 2): (2, 5.5)}


def test_sessionize_session_id_unique(spark):
    ev = _events(spark, [(1, 0.0, 1), (1, 200.0, 2), (2, 0.0, 3)])
    ids = [r["session_id"]
           for r in sessionize(ev, "ts", "uid", 60.0).collect()]
    assert sorted(set(ids)) == ["1#1", "1#2", "2#1"]


def test_sessionize_no_python_in_plan(spark):
    ev = _events(spark, [(1, 0.0, 1)])
    plan = sessionize(ev, "ts", "uid", 60.0)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan  # window + lag + cumsum, all JVM


def test_project_point_round_trip(spark):
    # project(a, distance(a,b), azimuth(a,b)) == b
    df = spark.createDataFrame(
        [(0.0, 0.0, 3.0, 4.0), (1.0, -2.0, -5.0, 7.0),
         (2.0, 2.0, 2.0, -9.0)], "x1 double, y1 double, x2 double, y2 double")
    a = st.point(F.col("x1"), F.col("y1"))
    b = st.point(F.col("x2"), F.col("y2"))
    p = st.project_point(a, st.distance_points(a, b), st.azimuth(a, b))
    for r in df.select(st.x(p).alias("px"), st.y(p).alias("py"),
                       "x2", "y2").collect():
        assert r["px"] == pytest.approx(r["x2"], abs=1e-12)
        assert r["py"] == pytest.approx(r["y2"], abs=1e-12)


def test_project_point_null_for_coincident(spark):
    df = spark.createDataFrame([(1,)], "i long")
    a = st.point(F.lit(2.0), F.lit(3.0))
    r = df.select(st.project_point(a, F.lit(1.0), st.azimuth(a, a))
                  .alias("p")).collect()[0]
    assert r["p"] is None


def test_project_spherical_cardinal(spark):
    # one degree of latitude north from the equator
    df = spark.createDataFrame([(1,)], "i long")
    R = 6371008.8
    d_1deg = math.pi / 180.0 * R
    o = st.point(F.lit(10.0), F.lit(0.0))
    r = df.select(
        st.x(st.project_spherical(o, F.lit(d_1deg), F.lit(0.0))).alias("nx"),
        st.y(st.project_spherical(o, F.lit(d_1deg), F.lit(0.0))).alias("ny"),
        st.x(st.project_spherical(o, F.lit(d_1deg),
                                  F.lit(math.pi / 2))).alias("ex"),
        st.y(st.project_spherical(o, F.lit(d_1deg),
                                  F.lit(math.pi / 2))).alias("ey"),
    ).collect()[0]
    assert r["nx"] == pytest.approx(10.0, abs=1e-9)
    assert r["ny"] == pytest.approx(1.0, abs=1e-9)
    assert r["ex"] == pytest.approx(11.0, abs=1e-9)  # equator: 1 deg east
    assert r["ey"] == pytest.approx(0.0, abs=1e-9)


def test_project_spherical_lon_wrap(spark):
    # 3 degrees east from lon 178 wraps to -179
    df = spark.createDataFrame([(1,)], "i long")
    R = 6371008.8
    d = 3.0 * math.pi / 180.0 * R
    p = st.project_spherical(st.point(F.lit(178.0), F.lit(0.0)),
                             F.lit(d), F.lit(math.pi / 2))
    r = df.select(st.x(p).alias("x"), st.y(p).alias("y")).collect()[0]
    assert r["x"] == pytest.approx(-179.0, abs=1e-9)
