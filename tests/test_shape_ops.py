"""Tests for the round-6 shape descriptors: hausdorff/frechet distance,
minimum rotated rectangle, minimum bounding circle, shortest_line —
closed-form oracles on constructed geometries."""

import math

import pytest
from pyspark.sql import functions as F

from arctic_spark import st


def _wkt_df(spark, pairs):
    """rows of (id, wkt_a, wkt_b) -> df with geom columns a, b."""
    df = spark.createDataFrame(pairs, "id long, wa string, wb string")
    return (df.withColumn("a", st.from_wkt("wa"))
            .withColumn("b", st.from_wkt("wb")))


def test_hausdorff_translated_rect(spark):
    # rect vs same rect translated by dx: HD = dx (attained at vertices)
    df = _wkt_df(spark, [
        (1, "POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))",
            "POLYGON ((1.5 0, 5.5 0, 5.5 2, 1.5 2, 1.5 0))"),
        (2, "LINESTRING (0 0, 10 0)", "LINESTRING (0 3, 10 3)"),
        (3, "POINT (0 0)", "MULTIPOINT (3 4, 1 1)"),
    ])
    got = {r.id: r.h for r in df.select(
        "id", st.hausdorff_distance("a", "b").alias("h")).collect()}
    assert abs(got[1] - 1.5) < 1e-12
    assert abs(got[2] - 3.0) < 1e-12
    assert abs(got[3] - 5.0) < 1e-12  # farthest of the two points


def test_frechet_parallel_lines(spark):
    df = _wkt_df(spark, [
        (1, "LINESTRING (0 0, 10 0)", "LINESTRING (0 2, 10 2)"),
        # reversed direction forces the leash across the whole span
        (2, "LINESTRING (0 0, 10 0)", "LINESTRING (10 2, 0 2)"),
    ])
    got = {r.id: r.f for r in df.select(
        "id", st.frechet_distance("a", "b").alias("f")).collect()}
    assert abs(got[1] - 2.0) < 1e-12
    assert abs(got[2] - math.hypot(10, 2)) < 1e-12


def test_minimum_rotated_rectangle_diamond(spark):
    # diamond rx=3, ry=1: MRR area = 4*rx*ry*max(rx^2,ry^2)/(rx^2+ry^2)
    df = _wkt_df(spark, [
        (1, "POLYGON ((3 0, 0 1, -3 0, 0 -1, 3 0))", "POINT (0 0)"),
        (2, "POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))", "POINT (0 0)"),
        (3, "LINESTRING (0 0, 2 2, 4 4)", "POINT (0 0)"),  # collinear
        (4, "POINT (5 5)", "POINT (0 0)"),
    ])
    out = {r.id: r for r in df.select(
        "id",
        st.area(st.minimum_rotated_rectangle("a")).alias("ar"),
        st.geom_type_name(st.minimum_rotated_rectangle("a")).alias("t"))
        .collect()}
    want = 4 * 3 * 1 * 9 / 10
    assert abs(out[1].ar - want) < 1e-9
    assert abs(out[2].ar - 8.0) < 1e-9  # axis rect is its own MRR
    assert out[3].t == "LineString"
    assert out[4].t == "Point"


def test_minimum_bounding_circle(spark):
    df = _wkt_df(spark, [
        (1, "POLYGON ((3 0, 0 1, -3 0, 0 -1, 3 0))", "POINT (0 0)"),
        (2, "POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))", "POINT (0 0)"),
        (3, "MULTIPOINT (0 0, 2 0, 1 1.7)", "POINT (0 0)"),  # acute triangle
        (4, "POINT (7 8)", "POINT (0 0)"),
    ])
    out = {r.id: r for r in df.select(
        "id", st.minimum_bounding_radius("a").alias("r"),
        st.geom_type_name(st.minimum_bounding_circle("a")).alias("t"))
        .collect()}
    assert abs(out[1].r - 3.0) < 1e-9                     # diamond: max radius
    assert abs(out[2].r - math.hypot(2, 1)) < 1e-9        # half-diagonal
    # acute triangle -> circumradius R = abc/(4K)
    a = 2.0
    b = math.hypot(1, 1.7)
    c = math.hypot(1, 1.7)
    k = 0.5 * 2.0 * 1.7
    assert abs(out[3].r - a * b * c / (4 * k)) < 1e-9
    assert out[4].r == 0.0
    assert out[4].t == "Point"
    assert out[1].t == "Polygon"
    # rendered circle is the inscribed 4*quad_segs-gon (buffer-circle
    # convention): area = 0.5*n*r^2*sin(2*pi/n)
    ar = df.where(F.col("id") == 1).select(
        st.area(st.minimum_bounding_circle("a")).alias("ar")).first().ar
    n = 32
    assert abs(ar - 0.5 * n * 9.0 * math.sin(2 * math.pi / n)) < 1e-9


def test_shortest_line_disjoint(spark):
    df = _wkt_df(spark, [
        # two rects separated by a gap of 2 in x
        (1, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
            "POLYGON ((4 0, 6 0, 6 2, 4 2, 4 0))"),
        # point to segment interior (projection, not a vertex)
        (2, "POINT (5 5)", "LINESTRING (0 0, 10 0)"),
        # intersecting -> zero-length line at a shared point
        (3, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
            "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"),
    ])
    rows = {r.id: r for r in df.select(
        "id",
        st.length(st.shortest_line("a", "b")).alias("ln"),
        st.x(st.line_interpolate_point(st.shortest_line("a", "b"), 0.0))
          .alias("x0"),
        st.y(st.line_interpolate_point(st.shortest_line("a", "b"), 1.0,
                                       normalized=True)).alias("y1"))
        .collect()}
    assert abs(rows[1].ln - 2.0) < 1e-12
    assert abs(rows[2].ln - 5.0) < 1e-12
    assert rows[3].ln == 0.0
    # gap line runs between the facing edges
    assert abs(rows[1].x0 - 2.0) < 1e-12


def test_shape_ops_null_and_empty(spark):
    df = spark.createDataFrame([(1,)], "id long") \
        .withColumn("p", st.point(F.lit(0.0), F.lit(0.0))) \
        .withColumn("n", st.from_wkt(F.lit(None).cast("string")))
    r = df.select(
        st.hausdorff_distance("p", "n").alias("h"),
        st.frechet_distance("n", "p").alias("f"),
        st.minimum_bounding_radius("n").alias("r"),
        st.shortest_line("p", "n").alias("sl")).first()
    assert r.h is None or (isinstance(r.h, float) and math.isnan(r.h))
    assert r.f is None or (isinstance(r.f, float) and math.isnan(r.f))
    assert r.sl is None or r.sl.gt is None


def test_line_merge(spark):
    df = _wkt_df(spark, [
        # two touching segments -> one chain
        (1, "MULTILINESTRING ((0 0, 1 0), (1 0, 2 0))", "POINT (0 0)"),
        # second part reversed -> still merges
        (2, "MULTILINESTRING ((0 0, 1 0), (2 0, 1 0))", "POINT (0 0)"),
        # three ends meet at (1 0): junction, nothing merges
        (3, "MULTILINESTRING ((0 0, 1 0), (1 0, 2 0), (1 0, 1 1))",
            "POINT (0 0)"),
        # disjoint parts stay apart
        (4, "MULTILINESTRING ((0 0, 1 0), (5 5, 6 5))", "POINT (0 0)"),
        (5, "LINESTRING (0 0, 3 3)", "POINT (0 0)"),
    ])
    out = {r.id: r for r in df.select(
        "id",
        st.geom_type_name(st.line_merge("a")).alias("t"),
        st.num_parts(st.line_merge("a")).alias("n"),
        st.length(st.line_merge("a")).alias("ln")).collect()}
    assert (out[1].t, out[1].n) == ("LineString", 1)
    assert abs(out[1].ln - 2.0) < 1e-12
    assert (out[2].t, out[2].n) == ("LineString", 1)
    assert out[3].t == "MultiLineString" and out[3].n == 3
    assert out[4].t == "MultiLineString" and out[4].n == 2
    assert out[5].t == "LineString"


def test_remove_repeated_points(spark):
    df = _wkt_df(spark, [
        (1, "LINESTRING (0 0, 0 0, 1 0, 1 0, 2 0)", "POINT (0 0)"),
        (2, "POLYGON ((0 0, 4 0, 4 0, 4 4, 0 4, 0 0))", "POINT (0 0)"),
        # tolerance: drop vertices closer than 0.5 to the last kept
        (3, "LINESTRING (0 0, 0.2 0, 1 0, 1.1 0, 2 0)", "POINT (0 0)"),
    ])
    got = {r.id: r for r in df.select(
        "id",
        F.size(st.remove_repeated_points("a")["xs"]).alias("nv"),
        F.size(st.remove_repeated_points("a", 0.5)["xs"]).alias("nv_tol"),
        st.area(st.remove_repeated_points("a")).alias("ar")).collect()}
    assert got[1].nv == 3
    assert got[2].nv == 5          # closed ring keeps closure
    assert abs(got[2].ar - 16.0) < 1e-12
    assert got[3].nv_tol == 3      # 0, 1, 2 survive


def test_delaunay_triangles(spark):
    df = _wkt_df(spark, [
        # unit square + center point: 4 triangles, area 1
        (1, "MULTIPOINT (0 0, 1 0, 1 1, 0 1, 0.5 0.5)", "POINT (0 0)"),
        # triangle: 1 triangle
        (2, "MULTIPOINT (0 0, 4 0, 0 3)", "POINT (0 0)"),
        # collinear -> empty
        (3, "MULTIPOINT (0 0, 1 1, 2 2)", "POINT (0 0)"),
        (4, "POINT (5 5)", "POINT (0 0)"),
    ])
    out = {r.id: r for r in df.select(
        "id",
        st.num_parts(st.delaunay_triangles("a")).alias("n"),
        st.area(st.delaunay_triangles("a")).alias("ar"),
        st.is_empty(st.delaunay_triangles("a")).alias("emp")).collect()}
    assert out[1].n == 4 and abs(out[1].ar - 1.0) < 1e-12
    assert out[2].n == 1 and abs(out[2].ar - 6.0) < 1e-12
    assert out[3].emp and out[4].emp


def test_voronoi_polygons(spark):
    df = _wkt_df(spark, [
        (1, "MULTIPOINT (0 0, 1 0, 2 0, 0 1, 1 1, 2 1, 0 2, 1 2, 2 2)",
            "POINT (0 0)"),
        (2, "POINT (3 3)", "POINT (0 0)"),
    ])
    out = {r.id: r for r in df.select(
        "id",
        st.num_parts(st.voronoi_polygons("a", extend=1.0)).alias("n"),
        st.area(st.voronoi_polygons("a", extend=1.0)).alias("ar")).collect()}
    # 3x3 grid, span 2, pad 2 -> envelope 6x6 partitioned into 9 cells
    assert out[1].n == 9
    assert abs(out[1].ar - 36.0) < 1e-9
    # single point: whole envelope (pad = extend * 1.0 fallback span)
    assert out[2].n == 1
    assert abs(out[2].ar - 4.0) < 1e-9


def test_concave_hull(spark):
    # L-shaped unit lattice (0..4 grid minus the [2,4]x[2,4] block):
    # chi-shape closed forms derived by hand (see geo_concave_hull)
    pts = [(i, j) for i in range(5) for j in range(5)
           if not (i >= 2 and j >= 2)]
    wkt = "MULTIPOINT (" + ", ".join(f"{x} {y}" for x, y in pts) + ")"
    df = (spark.createDataFrame([(1, wkt)], "id long, w string")
          .withColumn("g", st.from_wkt("w")))
    df = (df.withColumn("chi", st.concave_hull("g", max_edge_length=2.0))
          .withColumn("chi0", st.concave_hull("g", ratio=0.0))
          .withColumn("cvx", st.concave_hull("g", ratio=1.0))
          .withColumn("hull", st.convex_hull("g")))
    r = df.select(st.area("chi").alias("a2"), st.area("chi0").alias("a0"),
                  st.area("cvx").alias("ac"),
                  st.area("hull").alias("ah"),
                  st.geom_type_name("chi").alias("t")).collect()[0]
    assert r.a2 == pytest.approx(7.5)   # keeps the sqrt(2) corner diagonal
    assert r.a0 == pytest.approx(7.0)   # maximally concave: the pure L
    assert r.ac == pytest.approx(11.5)  # ratio=1 == convex hull
    assert r.ah == pytest.approx(11.5)
    assert r.t == "Polygon"

    # every input point stays inside or on the hull
    pdf = (spark.createDataFrame([(float(x), float(y)) for x, y in pts],
                                 "x double, y double")
           .withColumn("p", st.point(F.col("x"), F.col("y"))))
    hull = df.select(F.col("chi0").alias("h"))
    n_in = (pdf.crossJoin(hull)
            .where(st.intersects(F.col("h"), F.col("p"))).count())
    assert n_in == len(pts)

    # degenerate inputs: 1 point -> POINT, collinear -> extent LINESTRING
    deg = (spark.createDataFrame(
        [(1, "MULTIPOINT (5 5)"),
         (2, "MULTIPOINT (0 0, 1 1, 2 2)")], "id long, w string")
        .withColumn("g", st.from_wkt("w"))
        .withColumn("h", st.concave_hull("g", ratio=0.5)))
    out = {r.id: r for r in
           deg.select("id", st.geom_type_name("h").alias("t"),
                      st.length("h").alias("len")).collect()}
    assert out[1].t == "Point"
    assert out[2].t == "LineString"
    assert out[2].len == pytest.approx(math.sqrt(8))


def test_polygonize(spark):
    rows = [
        # open ring line -> one square face
        (1, "LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)"),
        # tic-tac-toe: 3 vertical + 3 horizontal -> 4 unit faces
        (2, "MULTILINESTRING ((0 0, 0 2), (1 0, 1 2), (2 0, 2 2),"
            " (0 0, 2 0), (0 1, 2 1), (0 2, 2 2))"),
        # square with a dangling tail: dangle trimmed, face kept
        (3, "MULTILINESTRING ((0 0, 2 0, 2 2, 0 2, 0 0), (2 2, 5 5))"),
        # nested squares -> donut + island (3 rings, 2 parts)
        (4, "MULTILINESTRING ((0 0, 6 0, 6 6, 0 6, 0 0),"
            " (2 2, 4 2, 4 4, 2 4, 2 2))"),
        # two crossing open segments -> no face
        (5, "MULTILINESTRING ((0 0, 2 2), (0 2, 2 0))"),
        # self-crossing bowtie: noded at (2,2) -> two triangle faces
        (6, "LINESTRING (0 0, 4 4, 4 0, 0 4, 0 0)"),
    ]
    df = (spark.createDataFrame(rows, "id long, w string")
          .withColumn("g", st.from_wkt("w"))
          .withColumn("p", st.polygonize("g")))
    out = {r.id: r for r in df.select(
        "id", st.geom_type_name("p").alias("t"),
        st.num_parts("p").alias("n"),
        st.area("p").alias("a"),
        st.is_empty("p").alias("e")).collect()}
    assert (out[1].t, out[1].a) == ("Polygon", pytest.approx(16.0))
    assert (out[2].n, out[2].a) == (4, pytest.approx(4.0))
    assert (out[3].t, out[3].a) == ("Polygon", pytest.approx(4.0))
    assert (out[4].n, out[4].a) == (2, pytest.approx(36.0))  # 32-donut + 4
    assert out[5].e
    assert (out[6].n, out[6].a) == (2, pytest.approx(8.0))


def test_shared_paths(spark):
    df = _wkt_df(spark, [
        # middle stretch shared, same direction
        (1, "LINESTRING (0 0, 10 0)", "LINESTRING (3 0, 7 0)"),
        # shared stretch traversed in opposite direction
        (2, "LINESTRING (0 0, 10 0)", "LINESTRING (7 0, 3 0)"),
        # two shared stretches, one each way
        (3, "LINESTRING (0 0, 10 0)",
            "MULTILINESTRING ((1 0, 3 0), (8 0, 6 0))"),
        # crossing but never collinear -> both classes empty
        (4, "LINESTRING (0 0, 10 0)", "LINESTRING (5 -1, 5 1)"),
    ])
    out = {r.id: r for r in df.select(
        "id",
        st.length(st.shared_paths("a", "b", "same")).alias("ls"),
        st.length(st.shared_paths("a", "b", "opposite")).alias("lo"),
        st.length(st.shared_paths("a", "b")).alias("lb")).collect()}
    assert (out[1].ls, out[1].lo) == (pytest.approx(4.0), 0.0)
    assert (out[2].ls, out[2].lo) == (0.0, pytest.approx(4.0))
    assert out[3].ls == pytest.approx(2.0)
    assert out[3].lo == pytest.approx(2.0)
    assert out[3].lb == pytest.approx(4.0)
    assert (out[4].ls, out[4].lo) == (0.0, 0.0)
    with pytest.raises(ValueError):
        st.shared_paths("a", "b", "sideways")


def test_snap(spark):
    df = _wkt_df(spark, [
        # perturbed square snaps back onto the integer-grid target
        (1, "POLYGON ((0.05 -0.04, 4.03 0.06, 3.96 3.97, 0.02 4.05,"
            " 0.05 -0.04))",
            "MULTIPOINT (0 0, 4 0, 4 4, 0 4)"),
        # vertex insertion: target vertex near the segment interior
        (2, "LINESTRING (0 0, 10 0)", "POINT (5 0.05)"),
        # outside tolerance: unchanged
        (3, "LINESTRING (0 0, 10 0)", "POINT (5 3)"),
    ])
    out = {r.id: r for r in df.select(
        "id",
        st.area(st.snap("a", "b", 0.1)).alias("ar"),
        F.size(st.snap("a", "b", 0.1)["xs"]).alias("nv"),
        st.length(st.snap("a", "b", 0.1)).alias("ln")).collect()}
    assert out[1].ar == pytest.approx(16.0)
    assert out[1].nv == 5
    assert out[2].nv == 3                     # (0 0, 5 0.05, 10 0)
    assert out[2].ln == pytest.approx(
        2 * math.hypot(5, 0.05))
    assert out[3].nv == 2 and out[3].ln == pytest.approx(10.0)


def test_offset_curve(spark):
    df = _wkt_df(spark, [
        # straight line: parallel copy, same length
        (1, "LINESTRING (0 0, 10 0)", "POINT (0 0)"),
        # right-angle L: left offset miters inside, right offset arcs
        (2, "LINESTRING (0 0, 4 0, 4 6)", "POINT (0 0)"),
    ])
    out = {r.id: r for r in df.select(
        "id",
        st.length(st.offset_curve("a", 0.5)).alias("lpos"),
        st.length(st.offset_curve("a", -0.5)).alias("lneg"),
        st.y(st.line_interpolate_point(st.offset_curve("a", 0.5), 0.0))
          .alias("y0")).collect()}
    assert out[1].lpos == pytest.approx(10.0)
    assert out[1].lneg == pytest.approx(10.0)
    assert out[1].y0 == pytest.approx(0.5)       # left of +x is +y
    # inner miter: (0,.5)->(3.5,.5)->(3.5,6): length 3.5 + 5.5
    assert out[2].lpos == pytest.approx(9.0)
    # outer round join: 4 + 6 + 8 chords of 2*0.5*sin(pi/32)
    assert out[2].lneg == pytest.approx(
        10.0 + 8 * 2 * 0.5 * math.sin(math.pi / 32))


def test_minimum_clearance(spark):
    """JTS MinimumClearance: rect -> min side; right triangle -> altitude
    onto the hypotenuse; holed polygon -> min(hole side, wall gap);
    point -> inf (shapely semantics)."""
    import math
    rows = [(0, "POLYGON ((0 0, 6 0, 6 4, 0 4, 0 0))"),
            (1, "POLYGON ((0 0, 4 0, 0 3, 0 0))"),
            (2, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
                "(4 4, 6 4, 6 6, 4 6, 4 4))"),
            (3, "POINT (1 1)"),
            (4, "LINESTRING (0 0, 10 0, 10 1)")]
    df = spark.createDataFrame(rows, "id int, wkt string") \
        .withColumn("g", st.from_wkt("wkt"))
    out = {r.id: r.mc for r in df.select(
        "id", st.minimum_clearance("g").alias("mc")).collect()}
    assert out[0] == pytest.approx(4.0)
    assert out[1] == pytest.approx(12.0 / 5.0)
    assert out[2] == pytest.approx(2.0)
    assert math.isinf(out[3])
    assert out[4] == pytest.approx(1.0)


def test_build_area(spark):
    """ST_BuildArea semantics: nested rings -> donut (+ filled core at
    depth 2); dangles close nothing; bowtie linework -> two triangles."""
    rows = [(0, "MULTILINESTRING ((0 0, 10 0, 10 10, 0 10, 0 0), "
                "(2 2, 8 2, 8 8, 2 8, 2 2), (4 4, 6 4, 6 6, 4 6, 4 4))"),
            (1, "LINESTRING (0 0, 5 0, 5 5, 0 5, 0 0)"),
            (2, "LINESTRING (0 0, 5 5)"),
            (3, "LINESTRING (0 0, 2 2, 2 0, 0 2, 0 0)")]
    df = spark.createDataFrame(rows, "id int, wkt string") \
        .withColumn("g", st.from_wkt("wkt")) \
        .withColumn("b", st.build_area("g"))
    out = {r.id: r for r in df.select(
        "id", F.round(st.area("b"), 9).alias("a"),
        st.num_parts("b").alias("np"),
        st.is_empty("b").alias("e")).collect()}
    assert out[0].a == 68.0 and out[0].np == 2      # donut + core
    assert out[1].a == 25.0
    assert out[2].e is True
    assert out[3].a == 2.0 and out[3].np == 2       # two triangles


def test_split(spark):
    """ops.split semantics: polygon by line (incl. donut), line by
    point, line by crossing line, no-op when the splitter misses."""
    rows = [(0, "POLYGON ((0 0, 5 0, 5 4, 0 4, 0 0))",
                "LINESTRING (3 -1, 3 5)"),
            (1, "LINESTRING (0 0, 10 0)", "POINT (4 0)"),
            (2, "LINESTRING (0 0, 10 10)", "LINESTRING (0 10, 10 0)"),
            (3, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
                "LINESTRING (10 10, 20 20)"),
            (4, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
                "(3 3, 7 3, 7 7, 3 7, 3 3))", "LINESTRING (5 -1, 5 11)")]
    df = spark.createDataFrame(rows, "id int, w1 string, w2 string") \
        .withColumn("g", st.from_wkt("w1")) \
        .withColumn("s", st.from_wkt("w2")) \
        .withColumn("out", st.split("g", "s"))
    got = {r.id: r for r in df.select(
        "id", st.num_parts("out").alias("np"),
        F.round(st.area("out"), 9).alias("a"),
        F.round(st.length("out"), 9).alias("ln")).collect()}
    assert got[0].np == 2 and got[0].a == 20.0
    assert got[1].np == 2 and got[1].ln == 10.0
    assert got[2].np == 2 and got[2].ln == pytest.approx(
        2 * (5.0 ** 2 + 5.0 ** 2) ** 0.5)
    assert got[3].np == 1 and got[3].a == 16.0     # untouched
    assert got[4].np == 2 and got[4].a == 84.0     # donut -> two C halves


# -- subdivide (PostGIS ST_Subdivide) ---------------------------------------

def test_subdivide_polygon_conserves_area(spark):
    n = 40
    pts = [(3.0 * math.cos(2 * math.pi * i / n),
            3.0 * math.sin(2 * math.pi * i / n)) for i in range(n)]
    xs = [p[0] for p in pts] + [pts[0][0]]
    ys = [p[1] for p in pts] + [pts[0][1]]
    df = spark.createDataFrame([(1, xs, ys)],
                               "id long, xs array<double>, ys array<double>")
    d = df.withColumn("geometry",
                      st.subdivide(st.make_polygon(F.col("xs"), F.col("ys")), 12))
    ex = st.explode_parts(d, "geometry")
    rows = (ex.groupBy("id")
            .agg(F.sum(st.area("geometry")).alias("tot"),
                 F.max(st.count_coordinates("geometry")).alias("mx"),
                 F.count("*").alias("n"))
            .collect())
    true_area = 0.5 * n * 9.0 * math.sin(2 * math.pi / n)
    assert abs(rows[0]["tot"] - true_area) < 1e-9
    assert rows[0]["mx"] <= 12
    assert rows[0]["n"] >= 2


def test_subdivide_small_passthrough_and_line_chunks(spark):
    df = spark.createDataFrame(
        [(1, [float(i) for i in range(50)], [0.0] * 50)],
        "id long, xs array<double>, ys array<double>")
    d = df.withColumn("geometry",
                      st.subdivide(st.make_line(F.col("xs"), F.col("ys")), 10))
    ex = st.explode_parts(d, "geometry")
    rows = (ex.groupBy("id")
            .agg(F.sum(st.length("geometry")).alias("tot"),
                 F.count("*").alias("n")).collect())
    assert abs(rows[0]["tot"] - 49.0) < 1e-12
    assert rows[0]["n"] > 1
    # below the limit: unchanged single part
    small = spark.createDataFrame(
        [(1, [0.0, 1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0, 0.0])],
        "id long, xs array<double>, ys array<double>")
    d2 = small.withColumn("geometry",
                          st.subdivide(st.make_polygon(F.col("xs"), F.col("ys")), 16))
    assert d2.select(st.num_parts("geometry")).collect()[0][0] == 1


def test_ring_stats_matches_native_battery(spark):
    """r13: the fused ring_stats Arrow kernel must reproduce the native
    accessor battery (area / clip area / exterior / boundary / hole
    lengths / is_ring / is_empty / representative_point) metric for
    metric on randomized holed polygons, including the no-hole case."""
    import random
    rnd = random.Random(13)
    rows = []
    for i in range(60):
        w = rnd.uniform(4.0, 12.0)
        if i % 4 == 0:
            wkt = (f"POLYGON ((0 0, {w} 0, {w} {w}, 0 {w}, 0 0))")
        else:
            hx, hy = rnd.uniform(0.5, 2.0), rnd.uniform(0.5, 2.0)
            s = rnd.uniform(0.5, 1.5)
            wkt = (f"POLYGON ((0 0, {w} 0, {w} {w}, 0 {w}, 0 0), "
                   f"({hx} {hy}, {hx + s} {hy}, {hx + s} {hy + s}, "
                   f"{hx} {hy + s}, {hx} {hy}))")
        rows.append((i, wkt))
    df = (spark.createDataFrame(rows, "id long, wkt string")
          .withColumn("g", st.from_wkt("wkt")))
    df = df.withColumn("__rp", st.representative_point(F.col("g"))) \
           .withColumn("clip", st.clip_by_rect(F.col("g"),
                                               -0.5, -0.5, 3.0, 100.0))
    native = df.select(
        "id",
        F.round(st.area("g"), 6).alias("full_area"),
        F.round(st.area("clip"), 6).alias("clip_area"),
        F.round(st.length(st.exterior("g")), 6).alias("ext_len"),
        F.round(st.length(st.boundary("g")), 6).alias("bnd_len"),
        F.size(st.interiors("g")).cast("long").alias("n_holes"),
        F.round(st.length(F.try_element_at(st.interiors("g"),
                                           F.lit(1))), 6)
         .alias("hole_len"),
        st.is_ring(st.exterior("g")).alias("ext_is_ring"),
        st.is_empty("g").alias("empty"),
        F.round(st.x(F.col("__rp")), 6).alias("rx"),
        F.round(st.y(F.col("__rp")), 6).alias("ry"))
    kdf = df.withColumn("__rs", st.ring_stats(F.col("g"),
                                              -0.5, -0.5, 3.0, 100.0))
    kernel = kdf.select(
        "id",
        *[F.round(F.col(f"__rs.{c}"), 6).alias(c)
          for c in ("full_area", "clip_area", "ext_len", "bnd_len")],
        F.col("__rs.n_holes").alias("n_holes"),
        F.round(F.col("__rs.hole_len"), 6).alias("hole_len"),
        F.col("__rs.ext_is_ring").alias("ext_is_ring"),
        F.col("__rs.empty").alias("empty"),
        F.round(F.col("__rs.rx"), 6).alias("rx"),
        F.round(F.col("__rs.ry"), 6).alias("ry"))
    n = {r.id: r for r in native.collect()}
    k = {r.id: r for r in kernel.collect()}
    assert len(n) == len(k) == 60
    for i in n:
        assert n[i].asDict() == k[i].asDict(), (i, n[i], k[i])
    # non-polygon rows yield all-null structs (the accessor chain
    # nulls out the same way)
    other = (spark.createDataFrame(
        [(1, "POINT (1 2)"), (2, "LINESTRING (0 0, 1 1)")],
        "id long, wkt string")
        .withColumn("g", st.from_wkt("wkt"))
        .select("id", st.ring_stats(F.col("g"),
                                    0.0, 0.0, 1.0, 1.0).alias("rs"))
        .collect())
    for r in other:
        assert r.rs.full_area is None and r.rs.n_holes is None
