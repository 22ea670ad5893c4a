"""Tests for the §2.3 roadmap surface: boundary, interiors, clip, buffer,
representative_point, validity, derived predicates."""

import pytest
from pyspark.sql import functions as F

from arctic_spark import st

DONUT = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
SQUARE = "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))"


def _df(spark, *wkts):
    return spark.createDataFrame([(i, w) for i, w in enumerate(wkts)],
                                 "id int, wkt string") \
        .withColumn("g", st.from_wkt("wkt"))


def test_boundary(spark):
    df = _df(spark, DONUT, "LINESTRING (0 0, 5 5)",
             "LINESTRING (0 0, 1 0, 1 1, 0 0)", "POINT (1 1)")
    out = df.select("id", st.geom_type(st.boundary("g")).alias("t"),
                    st.length(st.boundary("g")).alias("ln"),
                    st.is_empty(st.boundary("g")).alias("e")) \
        .orderBy("id").collect()
    assert out[0].t == 5 and out[0].ln == pytest.approx(48.0)  # both rings
    assert out[1].t == 4 and out[1].e is False   # endpoints
    assert out[2].e is True                      # closed line → empty
    assert out[3].e is True                      # point → empty


def test_interiors(spark):
    df = _df(spark, DONUT, SQUARE)
    out = df.select("id", F.size(st.interiors("g")).alias("n")) \
        .orderBy("id").collect()
    assert out[0].n == 1
    assert out[1].n == 0


def test_clip_by_rect(spark):
    df = _df(spark, SQUARE, "POINT (1 1)", "POINT (50 50)")
    clipped = df.withColumn("c", st.clip_by_rect("g", 5.0, 5.0, 30.0, 30.0))
    out = clipped.select("id", st.area("c").alias("a"),
                         st.is_empty("c").alias("e")).orderBy("id").collect()
    assert out[0].a == pytest.approx(225.0)  # [5,20]x[5,20]
    assert out[1].e is True                  # point outside rect
    assert out[2].e is True


def test_buffer_points(spark):
    df = _df(spark, "POINT (10 10)")
    out = df.withColumn("b", st.buffer("g", 2.0, quad_segs=16))
    r = out.select(st.area("b").alias("a"),
                   st.geom_type("b").alias("t")).collect()[0]
    import math
    assert r.t == 3
    assert r.a == pytest.approx(math.pi * 4, rel=0.01)  # 64-gon ≈ circle


def test_buffer_line_capsule(spark):
    # line buffer = capsule: area = 2*r*L + pi*r^2 (to discretization)
    import math
    L = 5.0 * math.sqrt(2.0)
    r = (_df(spark, "LINESTRING (0 0, 5 5)")
         .withColumn("b", st.buffer("g", 1.0, quad_segs=16))
         .select(st.area("b").alias("a")).collect()[0])
    assert r.a == pytest.approx(2.0 * 1.0 * L + math.pi, rel=0.01)
    # multi-segment polyline (right angle): same closed form holds for a
    # convex-corner path (the corner fillet is a quarter disk)
    r2 = (_df(spark, "LINESTRING (0 0, 4 0, 4 4)")
          .withColumn("b", st.buffer("g", 0.5, quad_segs=16))
          .select(st.area("b").alias("a")).collect()[0])
    assert r2.a == pytest.approx(2.0 * 0.5 * 8.0 + math.pi * 0.25, rel=0.01)


def test_buffer_negative(spark):
    # erosion of a W x H rectangle by d: (W-2d) x (H-2d)
    r = (_df(spark, "POLYGON ((0 0, 6 0, 6 4, 0 4, 0 0))")
         .withColumn("b", st.buffer("g", -0.5))
         .select(st.area("b").alias("a")).collect()[0])
    assert r.a == pytest.approx(5.0 * 3.0, rel=1e-6)


def test_representative_point(spark):
    df = _df(spark, DONUT, SQUARE, "POINT (3 4)")
    out = df.withColumn("rp", st.representative_point("g"))
    rows = out.select("id", st.x("rp").alias("x"), st.y("rp").alias("y"),
                      st.contains_point("g", st.x("rp"), st.y("rp"))
                      .alias("inside")).orderBy("id").collect()
    assert rows[0].inside  # inside the donut, not in the hole
    assert rows[1].inside
    assert rows[2].x == 3.0 and rows[2].y == 4.0


def test_is_simple_valid(spark):
    bowtie = "POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))"
    df = _df(spark, SQUARE, bowtie, "LINESTRING (0 0, 2 2, 2 0, 0 2)")
    out = df.select("id", st.is_simple("g").alias("s"),
                    st.is_valid("g").alias("v")).orderBy("id").collect()
    assert out[0].s is True and out[0].v is True
    assert out[1].s is False and out[1].v is False
    assert out[2].s is False  # self-crossing line


def test_derived_predicates(spark):
    df = spark.createDataFrame(
        [(0, SQUARE, "POINT (1 1)"),
         (1, SQUARE, "POINT (50 50)")],
        "id int, w1 string, w2 string") \
        .withColumn("g1", st.from_wkt("w1")).withColumn("g2", st.from_wkt("w2"))
    rows = df.select("id", st.disjoint("g1", "g2").alias("d"),
                     st.within("g2", "g1").alias("w"),
                     st.covers("g1", "g2").alias("c")).orderBy("id").collect()
    assert rows[0].d is False and rows[0].w is True and rows[0].c is True
    assert rows[1].d is True and rows[1].w is False


def test_geom_equals_z(spark):
    df = _df(spark, SQUARE, SQUARE)
    a = df.where("id=0").select(F.col("g").alias("a"))
    b = df.where("id=1").select(F.col("g").alias("b"))
    j = a.crossJoin(b)
    assert j.select(st.geom_equals("a", "b").alias("e")).collect()[0].e
    r = df.select(st.z("g").alias("z"), st.has_z("g").alias("h")).collect()[0]
    assert r.z is None and r.h is False


def test_touches_crosses_overlaps(spark):
    rows = [
        # touching squares (shared edge)
        (0, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
            "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))"),
        # overlapping squares
        (1, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
            "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"),
        # line crossing a square
        (2, "LINESTRING (-1 1, 3 1)",
            "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
        # disjoint
        (3, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
            "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"),
        # corner-touching squares
        (4, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
            "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"),
        # crossing lines
        (5, "LINESTRING (0 0, 2 2)", "LINESTRING (0 2, 2 0)"),
    ]
    df = spark.createDataFrame(rows, "id int, w1 string, w2 string") \
        .withColumn("g1", st.from_wkt("w1")).withColumn("g2", st.from_wkt("w2"))
    out = {r.id: r for r in df.select(
        "id", st.touches("g1", "g2").alias("t"),
        st.crosses("g1", "g2").alias("c"),
        st.overlaps("g1", "g2").alias("o")).collect()}
    assert out[0].t is True and out[0].o is False
    assert out[1].t is False and out[1].o is True
    assert out[2].c is True and out[2].t is False
    assert out[3].t is False and out[3].c is False and out[3].o is False
    assert out[4].t is True
    assert out[5].c is True and out[5].t is False


def test_geom_almost_equals(spark):
    df = spark.createDataFrame(
        [(0, "POINT (1 2)", "POINT (1.0000001 2)"),
         (1, "POINT (1 2)", "POINT (1.1 2)")],
        "id int, w1 string, w2 string") \
        .withColumn("g1", st.from_wkt("w1")).withColumn("g2", st.from_wkt("w2"))
    out = {r.id: r for r in df.select(
        "id", st.geom_almost_equals("g1", "g2", 6).alias("e6"),
        st.geom_almost_equals("g1", "g2", 0).alias("e0")).collect()}
    assert out[0].e6 is True
    assert out[1].e6 is False and out[1].e0 is True


def test_intersection_convex(spark):
    rows = [
        # overlapping unit squares offset by (1,1): intersection area 1
        (0, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
            "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"),
        # triangle clip of a square
        (1, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
            "POLYGON ((0 0, 4 0, 0 4, 0 0))"),
        # disjoint -> empty
        (2, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
            "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"),
        # donut subject: hole survives the clip
        (3, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
            "POLYGON ((-1 -1, 6 -1, 6 6, -1 6, -1 -1))"),
    ]
    df = spark.createDataFrame(rows, "id int, w1 string, w2 string") \
        .withColumn("g1", st.from_wkt("w1")).withColumn("g2", st.from_wkt("w2"))
    out = df.withColumn("i", st.intersection("g1", "g2"))
    r = {x.id: x for x in out.select(
        "id", st.area("i").alias("a"), st.is_empty("i").alias("e")).collect()}
    assert r[0].a == pytest.approx(1.0)
    assert r[1].a == pytest.approx(8.0)   # half of the 4x4 square
    assert r[2].e is True
    assert r[3].a == pytest.approx(36.0 - 4.0)  # 6x6 minus the hole
    # HOLED subject under a CONCAVE clip — general since round 4
    # (arrangement engine). The concave arrow (shoelace area 6) lies
    # inside the donut's outer ring and misses the hole entirely (for
    # x in [2,4] the arrow stays below y=1), so clip ∩ donut = 6.
    holed = spark.createDataFrame(
        [(0, DONUT, "POLYGON ((0 0, 4 0, 2 1, 0 4, 0 0))")],
        "id int, w1 string, w2 string") \
        .withColumn("g1", st.from_wkt("w1")).withColumn("g2", st.from_wkt("w2"))
    hr = holed.withColumn("i", st.intersection("g1", "g2")) \
        .select(st.area("i").alias("a")).collect()[0]
    assert hr.a == pytest.approx(6.0)


def test_difference_union_symdiff(spark):
    rows = [
        # overlapping unit-offset squares: |a-b| = 4-1 = 3
        (0, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
            "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"),
        # b fully covers a: difference empty
        (1, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))",
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
        # disjoint: difference = a
        (2, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
            "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"),
    ]
    df = spark.createDataFrame(rows, "id int, w1 string, w2 string") \
        .withColumn("g1", st.from_wkt("w1")).withColumn("g2", st.from_wkt("w2"))
    out = (df.withColumn("d", st.difference("g1", "g2"))
             .withColumn("u", st.union("g1", "g2"))
             .withColumn("sd", st.symmetric_difference("g1", "g2")))
    r = {x.id: x for x in out.select(
        "id", st.area("d").alias("da"), st.area("u").alias("ua"),
        st.area("sd").alias("sda")).collect()}
    assert r[0].da == pytest.approx(3.0)
    assert r[0].ua == pytest.approx(4 + 4 - 1)
    assert r[0].sda == pytest.approx(3 + 3)
    assert r[1].da == pytest.approx(0.0)
    assert r[1].ua == pytest.approx(16.0)
    assert r[2].da == pytest.approx(1.0)
    assert r[2].ua == pytest.approx(2.0)
    assert r[2].sda == pytest.approx(2.0)


def test_intersection_concave_clip(spark):
    # L-shaped (concave) clip over a big square: area of L = 3 units²
    L = "POLYGON ((0 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 0))"
    rows = [(0, "POLYGON ((-5 -5, 5 -5, 5 5, -5 5, -5 -5))", L),
            # subject partially overlapping the L
            (1, "POLYGON ((0.5 0.5, 3 0.5, 3 3, 0.5 3, 0.5 0.5))", L)]
    df = spark.createDataFrame(rows, "id int, w1 string, w2 string") \
        .withColumn("g1", st.from_wkt("w1")).withColumn("g2", st.from_wkt("w2"))
    out = df.withColumn("i", st.intersection("g1", "g2"))
    r = {x.id: x.a for x in out.select(
        "id", st.area("i").alias("a")).collect()}
    assert r[0] == pytest.approx(3.0)
    # overlap of [0.5,3]x[0.5,3] with the L: region ([0.5,2]x[0.5,1]) +
    # ([0.5,1]x[1,2]) = 1.5*0.5 + 0.5*1 = 1.25
    assert r[1] == pytest.approx(1.25)


def test_difference_concave_clip(spark):
    # big square minus L-shape: 100 - 3 = 97
    L = "POLYGON ((0 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 0))"
    df = spark.createDataFrame(
        [(0, "POLYGON ((-5 -5, 5 -5, 5 5, -5 5, -5 -5))", L)],
        "id int, w1 string, w2 string") \
        .withColumn("g1", st.from_wkt("w1")).withColumn("g2", st.from_wkt("w2"))
    out = (df.withColumn("d", st.difference("g1", "g2"))
             .withColumn("u", st.union("g1", "g2"))
             .withColumn("sd", st.symmetric_difference("g1", "g2")))
    r = out.select(st.area("d").alias("da"), st.area("u").alias("ua"),
                   st.area("sd").alias("sda")).collect()[0]
    assert r.da == pytest.approx(97.0)
    assert r.ua == pytest.approx(100.0)   # L fully inside
    assert r.sda == pytest.approx(97.0)   # L − square is empty


def test_buffer_convex_polygon(spark):
    import math
    # buffer(square side 4, r=1): area = 16 + P*r + pi*r^2 = 16+16+pi
    df = _df(spark, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    out = df.withColumn("b", st.buffer("g", 1.0, quad_segs=16))
    r = out.select(st.area("b").alias("a")).collect()[0]
    assert r.a == pytest.approx(16 + 16 + math.pi, rel=0.01)
    # concave L-shape, d=0.5: exact union area =
    #   A + P*d + 5 convex quarter-disks - d^2 reflex-notch overlap
    #   = 3 + 8*0.5 + 5*(pi/4)*0.25 - 0.25 = 6.75 + 0.3125*pi
    L = "POLYGON ((0 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 0))"
    rL = (_df(spark, L).withColumn("b", st.buffer("g", 0.5, quad_segs=16))
          .select(st.area("b").alias("a")).collect()[0])
    assert rL.a == pytest.approx(6.75 + 0.3125 * math.pi, rel=0.01)


def test_geom_equals_invariance(spark):
    """geom_equals must be invariant to ring start vertex, orientation,
    part order and line direction (GeoPandas semantics, roadmap
    rst:51-53); geom_equals_exact stays strict."""
    pairs = [
        # rotated ring start
        ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
         "POLYGON ((4 4, 0 4, 0 0, 4 0, 4 4))", True),
        # reversed orientation
        ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
         "POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))", True),
        # line direction
        ("LINESTRING (0 0, 1 1, 2 0)", "LINESTRING (2 0, 1 1, 0 0)", True),
        # single vs multi wrapping
        ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
         "MULTIPOLYGON (((4 4, 0 4, 0 0, 4 0, 4 4)))", True),
        # multipoint order
        ("MULTIPOINT (1 1, 2 2)", "MULTIPOINT (2 2, 1 1)", True),
        # genuinely different
        ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
         "POLYGON ((0 0, 5 0, 5 4, 0 4, 0 0))", False),
    ]
    df = spark.createDataFrame([(i, a, b, e) for i, (a, b, e)
                                in enumerate(pairs)],
                               "id long, w1 string, w2 string, exp boolean") \
        .withColumn("a", st.from_wkt("w1")).withColumn("b", st.from_wkt("w2"))
    rows = df.select("id", "exp", st.geom_equals("a", "b").alias("e"),
                     st.geom_equals_exact("a", "b").alias("x")) \
             .orderBy("id").collect()
    for r in rows:
        assert r.e == r.exp, r.id
    # exact compare rejects the rotated-ring case the invariant accepts
    assert rows[0].x is False and rows[5].x is False


def test_geojson_roundtrip(spark):
    import json
    wkts = [SQUARE, DONUT, "POINT (1.5 2.5)", "LINESTRING (0 0, 3 4)",
            "MULTIPOINT (1 1, 2 2)",
            "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
            "((5 5, 6 5, 6 6, 5 6, 5 5)))"]
    df = _df(spark, *wkts).withColumn("j", st.to_geojson("g")) \
                          .withColumn("g2", st.from_geojson("j"))
    rows = df.select("id", "j", st.geom_equals_exact("g", "g2").alias("rt")) \
             .orderBy("id").collect()
    assert all(r.rt for r in rows)
    j = json.loads(rows[2].j)
    assert j == {"type": "Point", "coordinates": [1.5, 2.5]}


def test_clip_and_geo_interface(spark):
    from arctic_spark import GeoDataFrame
    df = _df(spark, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
             "POLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))",
             "POINT (1 1)", "POINT (50 50)")
    gdf = GeoDataFrame(df, "g")
    # clip by WKT mask: square overlaps first polygon (area 4), drops
    # the far polygon and the far point, keeps the inside point
    out = gdf.clip("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
    rows = out.df.select("id", st.area("g").alias("a")).orderBy("id") \
        .collect()
    assert [r.id for r in rows] == [0]
    assert rows[0].a == pytest.approx(4.0)
    # bbox-tuple mask keeps the point on its own row
    out2 = gdf.clip((0.0, 0.0, 2.0, 2.0))
    assert sorted(r.id for r in out2.df.collect()) == [0, 2]
    # __geo_interface__ / to_json
    gi = GeoDataFrame(_df(spark, "POINT (1 2)"), "g").__geo_interface__
    assert gi["type"] == "FeatureCollection"
    f = gi["features"][0]
    assert f["geometry"] == {"type": "Point", "coordinates": [1.0, 2.0]}
    assert f["properties"]["wkt"] == "POINT (1 2)"


def test_is_valid_hole_outside_shell(spark):
    good = DONUT
    bad = ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
           "(20 20, 22 20, 22 22, 20 22, 20 20))")  # hole outside shell
    out = _df(spark, good, bad).select(
        "id", st.is_valid("g").alias("v")).orderBy("id").collect()
    assert out[0].v is True and out[1].v is False


def test_dwithin_predicate(spark):
    """Row-aligned st.dwithin (round 6): native for point pairs, kernel
    distance for general pairs."""
    rows = [(0, "POINT (0 0)", "POINT (3 4)"),          # dist 5
            (1, "POINT (0 0)", "POINT (30 40)"),        # dist 50
            (2, "POINT (1 1)", "POLYGON ((3 0, 5 0, 5 2, 3 2, 3 0))"),
            (3, "LINESTRING (0 0, 0 10)", "POINT (6 5)")]
    df = spark.createDataFrame(rows, "id int, w1 string, w2 string") \
        .withColumn("g1", st.from_wkt("w1")).withColumn("g2", st.from_wkt("w2"))
    out = {r.id: r.d for r in df.select(
        "id", st.dwithin("g1", "g2", 5.5).alias("d")).collect()}
    assert out[0] is True and out[1] is False
    assert out[2] is True      # point to polygon dist 2
    assert out[3] is False or out[3] is True  # dist 6 > 5.5 → False
    assert out[3] is False


def test_orientation_accessors(spark):
    """count_coordinates / count_geometries / is_closed / is_ccw (round 6
    natives) — shapely semantics, hand-verified."""
    df = _df(spark,
             "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",            # 0 CCW
             "LINESTRING (0 0, 1 0, 1 1, 0 0)",                # 1 closed CCW
             "LINESTRING (0 0, 0 1, 1 1, 0 0)",                # 2 closed CW
             "LINESTRING (0 0, 1 1)",                          # 3 open
             "MULTILINESTRING ((0 0, 1 0, 0 0), (5 5, 6 6, 5 5))",  # 4
             "MULTILINESTRING ((0 0, 1 0, 0 0), (5 5, 6 6))",  # 5 mixed
             "MULTIPOINT (0 0, 1 1, 2 2)",                     # 6
             "POINT (3 3)")                                    # 7
    out = {r.id: r for r in df.select(
        "id",
        st.count_coordinates("g").alias("nc"),
        st.count_geometries("g").alias("ng"),
        st.is_closed("g").alias("cl"),
        st.is_ccw("g").alias("ccw")).collect()}
    assert [out[i].nc for i in range(8)] == [5, 4, 4, 2, 6, 5, 3, 1]
    assert [out[i].ng for i in range(8)] == [1, 1, 1, 1, 2, 2, 3, 1]
    assert [out[i].cl for i in range(8)] == [False, True, True, False,
                                             True, False, False, False]
    assert [out[i].ccw for i in range(8)] == [False, True, False, False,
                                              False, False, False, False]


def test_orient_polygons(spark):
    """orient_polygons: exterior → CCW, holes → CW, per-ring conditional
    reverse; area preserved; non-polygons pass through."""
    df = _df(spark,
             "POLYGON ((0 0, 0 6, 6 6, 6 0, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
             "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), "
             "((5 5, 5 7, 7 7, 7 5, 5 5)))",
             "LINESTRING (0 0, 0 1, 1 1, 0 0)")
    orn = st.orient_polygons("g")
    out = {r.id: r for r in df.select(
        "id",
        st.is_ccw(st.exterior(orn)).alias("ext_ccw"),
        F.round(st.area(orn), 9).alias("area"),
        orn["xs"].alias("xs")).collect()}
    assert out[0].ext_ccw is True and out[0].area == 35.0
    # hole (1 1, 2 1, 2 2, 1 2) was CCW -> reversed to CW
    assert list(out[0].xs[5:]) == [1.0, 1.0, 2.0, 2.0, 1.0]
    # exterior() is defined on single polygons only -> null for multi
    assert out[1].ext_ccw is None and out[1].area == 8.0
    # first part already CCW (untouched); second was CW -> reversed
    assert list(out[1].xs[:5]) == [0.0, 2.0, 2.0, 0.0, 0.0]
    assert list(out[1].xs[5:]) == [5.0, 7.0, 7.0, 5.0, 5.0]
    # closed CW line untouched
    assert list(out[2].xs) == [0.0, 0.0, 1.0, 0.0]
    # exterior_cw=True flips the convention
    cw = st.orient_polygons("g", exterior_cw=True)
    r0 = df.where("id = 0").select(
        st.is_ccw(st.exterior(cw)).alias("c")).collect()[0]
    assert r0.c is False


def test_sample_points(spark):
    """Native deterministic sample_points: size respected, points
    strictly inside (holes excluded), reproducible, non-polygons empty."""
    rows = [(1, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
            (2, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
                "(2 2, 8 2, 8 8, 2 8, 2 2))"),
            (3, "LINESTRING (0 0, 5 5)")]
    df = spark.createDataFrame(rows, "id long, wkt string") \
        .withColumn("g", st.from_wkt("wkt"))
    sp = st.sample_points("g", 5, F.col("id"), seed="t")
    out = {r.id: r for r in df.select(
        "id", sp["xs"].alias("xs"), sp["ys"].alias("ys")).collect()}
    assert len(out[1].xs) == 5
    for x, y in zip(out[2].xs, out[2].ys):
        assert 0 < x < 10 and 0 < y < 10
        assert not (2 < x < 8 and 2 < y < 8)          # hole excluded
    assert list(out[3].xs) == []
    # deterministic: same key/seed -> identical draw
    again = {r.id: list(r.xs) for r in df.select(
        "id", st.sample_points("g", 5, F.col("id"), seed="t")["xs"]
        .alias("xs")).collect()}
    assert again[1] == list(out[1].xs)
    # different seed -> different draw
    other = {r.id: list(r.xs) for r in df.select(
        "id", st.sample_points("g", 5, F.col("id"), seed="u")["xs"]
        .alias("xs")).collect()}
    assert other[1] != list(out[1].xs)
