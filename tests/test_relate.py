"""Exact DE-9IM touches/crosses/overlaps (geom/relate.py) against
hand-verified GEOS truth tables — including the boundary-contact edge
cases the round-5 approximations got wrong (VERDICT r5 'What's wrong'
#2: collinear partial overlap, equal-boundary nesting, endpoint
crossings)."""

from arctic_spark.geom import wkt
from arctic_spark.geom.relate import relate_tco


def _tco(w1, w2):
    r1 = wkt.parse([w1])
    r2 = wkt.parse([w2])
    return relate_tco(r1.geom(0), r2.geom(0))


SQ = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"

CASES = [
    # --- polygon × polygon -------------------------------------------------
    # edge-sharing squares: boundary contact only
    (SQ, "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))", (True, False, False)),
    # corner-touching squares
    (SQ, "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))", (True, False, False)),
    # partial overlap whose boundaries are collinear (NO strict vertex of
    # either inside the other, NO proper edge crossing — the case the
    # old approximation called 'touches')
    (SQ, "POLYGON ((1 0, 3 0, 3 2, 1 2, 1 0))", (False, False, True)),
    # equal squares: covers both ways
    (SQ, SQ, (False, False, False)),
    # strictly nested
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
     "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))", (False, False, False)),
    # nested sharing part of the boundary (covered, interiors meet)
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", SQ, (False, False, False)),
    # square exactly filling a donut's hole: interiors disjoint
    ("POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))",
     "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))", (True, False, False)),
    # square overlapping the donut ring AND its hole
    ("POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))",
     "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", (False, False, True)),
    # classic diagonal overlap
    (SQ, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", (False, False, True)),
    # disjoint
    (SQ, "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))", (False, False, False)),
    # --- line × polygon ----------------------------------------------------
    # straight through
    ("LINESTRING (-1 1, 3 1)", SQ, (False, True, False)),
    # along the bottom edge: interior of line in boundary of polygon
    ("LINESTRING (0 0, 2 0)", SQ, (True, False, False)),
    # wholly inside
    ("LINESTRING (0.5 0.5, 1.5 1.5)", SQ, (False, False, False)),
    # outside, endpoint touching the boundary
    ("LINESTRING (-1 -1, 0 1)", SQ, (True, False, False)),
    # ends strictly inside (enters through the boundary)
    ("LINESTRING (-1 1, 1 1)", SQ, (False, True, False)),
    # runs along the edge then enters the interior
    ("LINESTRING (0 0, 2 0, 1 1)", SQ, (False, False, False)),
    # --- line × line -------------------------------------------------------
    # proper crossing
    ("LINESTRING (0 0, 2 2)", "LINESTRING (0 2, 2 0)",
     (False, True, False)),
    # T: endpoint of one on the interior of the other
    ("LINESTRING (0 0, 2 0)", "LINESTRING (1 0, 1 2)",
     (True, False, False)),
    # endpoint-to-endpoint
    ("LINESTRING (0 0, 1 0)", "LINESTRING (1 0, 2 0)",
     (True, False, False)),
    # collinear partial overlap
    ("LINESTRING (0 0, 2 0)", "LINESTRING (1 0, 3 0)",
     (False, False, True)),
    # covered sub-line: a∩b == b
    ("LINESTRING (0 0, 3 0)", "LINESTRING (1 0, 2 0)",
     (False, False, False)),
    # equal lines (reversed direction)
    ("LINESTRING (0 0, 3 0)", "LINESTRING (3 0, 0 0)",
     (False, False, False)),
    # overlap AND a crossing elsewhere: dim(I∩I)=1 → overlaps, not crosses
    ("LINESTRING (0 0, 2 0, 2 2)", "LINESTRING (1 0, 3 0, 1 1, 3 1)",
     (False, False, True)),
    # multiline: crossing through an odd endpoint = boundary → touches
    ("MULTILINESTRING ((0 0, 1 0), (1 0, 1 1))", "LINESTRING (1 0, 2 0)",
     (True, False, False)),
    # --- point × * ---------------------------------------------------------
    ("POINT (1 1)", SQ, (False, False, False)),            # inside
    ("POINT (0 1)", SQ, (True, False, False)),             # on boundary
    ("POINT (5 5)", SQ, (False, False, False)),            # off
    ("POINT (1 0)", "LINESTRING (0 0, 2 0)", (False, False, False)),
    ("POINT (0 0)", "LINESTRING (0 0, 2 0)", (True, False, False)),
    ("POINT (1 1)", "POINT (1 1)", (False, False, False)),
    ("MULTIPOINT (1 1, 5 5)", SQ, (False, True, False)),   # in + out
    ("MULTIPOINT (0 1, 5 5)", SQ, (True, False, False)),   # bnd + out
    ("MULTIPOINT (1 0, 5 5)", "LINESTRING (0 0, 2 0)",
     (False, True, False)),
    ("MULTIPOINT (0 0, 1 1)", "MULTIPOINT (1 1, 2 2)",
     (False, False, True)),
    ("MULTIPOINT (0 0, 1 1)", "MULTIPOINT (1 1, 0 0)",
     (False, False, False)),                               # equal sets
    # --- empties -----------------------------------------------------------
    ("POLYGON EMPTY", SQ, (False, False, False)),
    ("POINT EMPTY", "POINT (1 1)", (False, False, False)),
]


def test_relate_truth_table():
    bad = []
    for w1, w2, want in CASES:
        got = _tco(w1, w2)
        if got != want:
            bad.append((w1, w2, want, got))
        # symmetry
        got_r = _tco(w2, w1)
        if got_r != want:
            bad.append(("SWAPPED " + w2, w1, want, got_r))
    assert not bad, bad


def test_relate_consistency_with_intersects():
    """touches/crosses/overlaps each imply intersects; touches excludes
    the other two."""
    import random

    from arctic_spark.geom import batch

    rnd = random.Random(99)
    shapes = []
    for _ in range(150):
        x = rnd.randint(-3, 3)
        y = rnd.randint(-3, 3)
        k = rnd.random()
        if k < 0.3:
            shapes.append(f"POINT ({x} {y})")
        elif k < 0.6:
            shapes.append(f"LINESTRING ({x} {y}, {x + rnd.randint(1, 3)} "
                          f"{y + rnd.randint(-2, 2)})")
        else:
            w = rnd.randint(1, 3)
            shapes.append(f"POLYGON (({x} {y}, {x + w} {y}, {x + w} {y + w},"
                          f" {x} {y + w}, {x} {y}))")
    w1 = [rnd.choice(shapes) for _ in range(300)]
    w2 = [rnd.choice(shapes) for _ in range(300)]
    r1, r2 = wkt.parse(w1), wkt.parse(w2)
    inter = batch.intersects(r1, r2)
    for i in range(len(r1)):
        t, c, o = relate_tco(r1.geom(i), r2.geom(i))
        if t or c or o:
            assert bool(inter[i]), (w1[i], w2[i])
        assert not (t and (c or o)), (w1[i], w2[i])


# ---------------------------------------------------------------------------
# full DE-9IM matrix (round 6): relate() against hand-verified GEOS
# matrices for the canonical configurations
# ---------------------------------------------------------------------------

MATRIX_CASES = [
    (SQ, SQ, "2FFF1FFF2"),                                     # equal
    (SQ, "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))", "FF2F11212"),  # edge touch
    (SQ, "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))", "FF2F01212"),  # corner
    (SQ, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", "212101212"),  # overlap
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
     "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))", "212FF1FF2"),      # contains
    ("LINESTRING (-1 1, 3 1)", SQ, "101FF0212"),               # line cross
    ("LINESTRING (0 0, 2 2)", "LINESTRING (0 2, 2 0)",
     "0F1FF0102"),                                             # X lines
    ("POINT (1 1)", SQ, "0FFFFF212"),                          # pt inside
    ("POINT (0 1)", SQ, "F0FFFF212"),                          # pt on bnd
    ("POINT (5 5)", SQ, "FF0FFF212"),                          # pt outside
    ("LINESTRING (0 0, 2 0)", "LINESTRING (1 0, 3 0)",
     "1010F0102"),                                             # line ovlp
    ("POLYGON EMPTY", SQ, "FFFFFF212"),                        # empty A
]


def test_relate_matrix_truth_table():
    from arctic_spark.geom.relate import relate_matrix
    bad = []
    for w1, w2, want in MATRIX_CASES:
        r1, r2 = wkt.parse([w1]), wkt.parse([w2])
        got = relate_matrix(r1.geom(0), r2.geom(0))
        if got != want:
            bad.append((w1, w2, want, got))
    assert not bad, bad


def test_relate_matrix_consistent_with_predicates():
    """The named predicates must agree with their DE-9IM patterns on the
    full truth-table corpus."""
    from arctic_spark.geom.relate import matches_pattern, relate_matrix
    for w1, w2, (t, c, o) in CASES:
        r1, r2 = wkt.parse([w1]), wkt.parse([w2])
        g1, g2 = r1.geom(0), r2.geom(0)
        m = relate_matrix(g1, g2)
        if len(g1[1]) == 0 or len(g2[1]) == 0:
            continue
        # touches: T*F**F** style family (FT / F**T / F***T with II=F)
        touches_m = (m[0] == "F" and (m[1] != "F" or m[3] != "F"
                                      or m[4] != "F"))
        assert touches_m == t, (w1, w2, m)
        d1 = {"F": -1}.get(m[0], m[0])
        # overlaps for same-dim 1/2: II has dim, neither covers
        # (spot-check via pattern helper on the polygon overlap case)
    assert matches_pattern("212101212", "T*T***T**")
    assert not matches_pattern("FF2F11212", "T********")


def test_spark_relate(spark):
    from pyspark.sql import functions as F

    from arctic_spark import st
    df = spark.createDataFrame(
        [(1, SQ, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"),
         (2, SQ, "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))")],
        "id int, w1 string, w2 string") \
        .withColumn("g1", st.from_wkt("w1")) \
        .withColumn("g2", st.from_wkt("w2"))
    rows = {r.id: r for r in df.select(
        "id", st.relate("g1", "g2").alias("m"),
        st.relate_pattern("g1", "g2", "T*T***T**").alias("ov")).collect()}
    assert rows[1].m == "212101212" and rows[1].ov is True
    assert rows[2].m == "FF2F11212" and rows[2].ov is False


def test_relate_predicate_consistency_random():
    """Property sweep (no Spark): on random axis-rect / segment pairs,
    the DE-9IM matrix must agree with the derived predicates —
    touches ⇒ interiors disjoint but geometries intersect; crosses/
    overlaps ⇒ interior-interior contact; the three are mutually
    exclusive; matrix[0] ('II') consistent with disjoint."""
    import random

    from arctic_spark.geom import wkt
    from arctic_spark.geom.relate import (crosses_pair, overlaps_pair,
                                          relate_matrix, touches_pair)

    random.seed(13)

    def rect(x0, y0, w, h):
        return (f"POLYGON (({x0} {y0}, {x0+w} {y0}, {x0+w} {y0+h}, "
                f"{x0} {y0+h}, {x0} {y0}))")

    def seg(x0, y0, x1, y1):
        return f"LINESTRING ({x0} {y0}, {x1} {y1})"

    pairs = []
    for _ in range(120):
        # integer grid so edge/corner contact happens often
        a = rect(random.randint(0, 4), random.randint(0, 4),
                 random.randint(1, 3), random.randint(1, 3))
        if random.random() < 0.5:
            b = rect(random.randint(0, 4), random.randint(0, 4),
                     random.randint(1, 3), random.randint(1, 3))
        else:
            b = seg(random.randint(-1, 5), random.randint(-1, 5),
                    random.randint(-1, 5), random.randint(-1, 5))
        pairs.append((a, b))
    rg_a = wkt.parse([p[0] for p in pairs])
    rg_b = wkt.parse([p[1] for p in pairs])
    for i in range(len(pairs)):
        ga, gb = rg_a.geom(i), rg_b.geom(i)
        m = relate_matrix(ga, gb)
        t = bool(touches_pair(ga, gb))
        c = bool(crosses_pair(ga, gb))
        o = bool(overlaps_pair(ga, gb))
        assert (t + c + o) <= 1, (pairs[i], m, t, c, o)
        ii = m[0] != "F"                # interior-interior contact
        if t:
            assert not ii, (pairs[i], m)
        if c or o:
            assert ii, (pairs[i], m)
        disjoint = all(m[k] == "F" for k in (0, 1, 3, 4))
        if disjoint:
            assert not (t or c or o), (pairs[i], m)
