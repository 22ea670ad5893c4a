"""GeometryCollection (gt=7, round 6): codec round-trips, mixed-dim
boolean results, and Spark-level explode/accessors (reference type id 7,
geopolars-geo/src/geoseries.rs:60-72)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from arctic_spark import st
from arctic_spark.geom import boolean, geojson, wkb, wkt
from arctic_spark.geom.ragged import (GC_SHIFT, GEOMETRYCOLLECTION,
                                      LINESTRING, POINT, POLYGON, gc_iter)

GC_WKT = ("GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 3 3), "
          "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)))")


def test_wkt_roundtrip():
    rg = wkt.parse([GC_WKT])
    assert rg.gt[0] == GEOMETRYCOLLECTION
    g = rg.geom(0)
    subs = list(gc_iter(g))
    assert [s[0] for s in subs] == [POINT, LINESTRING, POLYGON]
    assert wkt.format(rg) == [GC_WKT]


def test_wkb_roundtrip_and_retype():
    rg = wkt.parse([GC_WKT])
    bufs = wkb.encode(rg)
    back = wkb.decode(bufs)
    assert back.gt[0] == GEOMETRYCOLLECTION
    g1, g2 = rg.geom(0), back.geom(0)
    assert np.array_equal(g1[1], g2[1]) and np.array_equal(g1[4], g2[4])
    # homogeneous GC still re-types losslessly to Multi*
    homo = wkt.parse(["GEOMETRYCOLLECTION (POINT (1 1), POINT (2 2))"])
    # WKB of a homogeneous GC: encode as GC bytes by hand
    import struct
    body = b"".join(wkb.encode(wkt.parse([f"POINT ({x} {x})"]))[0]
                    for x in (1, 2))
    buf = b"\x01\x07\x00\x00\x00" + struct.pack("<I", 2) + body
    assert wkb.decode([buf]).gt[0] == 4  # MULTIPOINT
    assert homo.gt[0] == GEOMETRYCOLLECTION  # WKT path preserves GC


def test_geojson_roundtrip():
    rg = wkt.parse([GC_WKT])
    g = rg.geom(0)
    m = geojson.mapping_one(*g)
    assert m["type"] == "GeometryCollection"
    assert [c["type"] for c in m["geometries"]] == \
        ["Point", "LineString", "Polygon"]
    back = geojson.parse_mapping(m)
    assert back[0] == GEOMETRYCOLLECTION
    assert np.allclose(back[1], g[1])
    assert np.array_equal(back[4], g[4])


def _pair(w1, w2, op):
    r1, r2 = wkt.parse([w1]), wkt.parse([w2])
    return boolean.boolean_pair(r1.geom(0), r2.geom(0), op)


SQ = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"


def test_union_line_polygon_is_gc():
    out = _pair("LINESTRING (-2 1, 3 1)", SQ, "union")
    assert out[0] == GEOMETRYCOLLECTION
    subs = list(gc_iter(out))
    kinds = sorted(s[0] for s in subs)
    assert POLYGON in kinds and LINESTRING in kinds
    # outside line length: [-2,0] and [2,3] = 3
    tot = 0.0
    for s in subs:
        if s[0] == LINESTRING:
            tot += float(np.sum(np.hypot(np.diff(s[1]), np.diff(s[2]))))
    assert tot == pytest.approx(3.0)


def test_union_point_polygon_variants():
    # point inside → union is just the polygon
    out = _pair("POINT (1 1)", SQ, "union")
    assert out[0] == POLYGON
    # point outside → GC(point, polygon)
    out = _pair("POINT (5 5)", SQ, "union")
    assert out[0] == GEOMETRYCOLLECTION
    subs = [s[0] for s in gc_iter(out)]
    assert sorted(subs) == [POINT, POLYGON]


def test_intersection_grazing_line_returns_point():
    # line touches the square only at the corner (0,0)
    out = _pair("LINESTRING (-1 1, 1 -1)", SQ, "intersection")
    assert out[0] == POINT
    assert out[1][0] == pytest.approx(0.0)
    assert out[2][0] == pytest.approx(0.0)


def test_intersection_cross_plus_graze_is_gc():
    # first leg crosses the square's interior (clips to [0,2]×{1});
    # second leg lies on y = 4−x, which meets the square only at the
    # corner (2,2) — a corner graze. GEOS shape: GC(point, line).
    out = _pair("MULTILINESTRING ((-1 1, 3 1), (1 3, 3 1))",
                SQ, "intersection")
    assert out[0] == GEOMETRYCOLLECTION
    subs = list(gc_iter(out))
    kinds = [s[0] for s in subs]
    assert POINT in kinds and LINESTRING in kinds
    pt = next(s for s in subs if s[0] == POINT)
    assert pt[1][0] == pytest.approx(2.0) and pt[2][0] == pytest.approx(2.0)


def test_line_line_overlap_plus_cross_is_gc():
    # shares [1,2]x{0} with g1 AND crosses it at x=0.5 via a vertical leg
    out = _pair("LINESTRING (0 0, 3 0)",
                "MULTILINESTRING ((1 0, 2 0), (0.5 -1, 0.5 1))",
                "intersection")
    assert out[0] == GEOMETRYCOLLECTION
    subs = [s[0] for s in gc_iter(out)]
    assert POINT in subs and LINESTRING in subs


def test_gc_parts_encoding_invariant():
    rg = wkt.parse([GC_WKT])
    _, _, _, _, parts = rg.geom(0)
    assert parts.tolist() == [POINT * GC_SHIFT + 1,
                              LINESTRING * GC_SHIFT + 1,
                              POLYGON * GC_SHIFT + 1]


def test_spark_gc_explode_and_accessors(spark):
    df = spark.createDataFrame([(1, GC_WKT)], "id int, w string") \
        .select("id", st.from_wkt("w").alias("g"))
    row = df.select(st.geom_type_name("g").alias("tn"),
                    st.num_parts("g").alias("np"),
                    st.to_wkt("g").alias("wkt")).collect()[0]
    assert row.tn == "GeometryCollection"
    assert row.np == 3
    assert row.wkt == GC_WKT
    ex = st.explode_parts(df, "g")
    got = ex.select(st.geom_type_name("g").alias("t"),
                    st.area("g").alias("a")).collect()
    assert sorted(r.t for r in got) == ["LineString", "Point", "Polygon"]
    assert max(r.a for r in got) == pytest.approx(4.0)


def test_spark_union_mixed_dims_gc(spark):
    df = spark.createDataFrame([(1,)], "id int") \
        .select("id",
                st.geom_lit("LINESTRING (-2 1, 3 1)").alias("l"),
                st.geom_lit(SQ).alias("p"))
    out = df.withColumn("u", st.union("l", "p"))
    row = out.select(st.geom_type_name("u").alias("t"),
                     st.num_parts("u").alias("n")).collect()[0]
    assert row.t == "GeometryCollection"
    assert row.n == 3  # two outside line runs + the polygon


def test_gc_area_length(spark):
    """GEOS semantics: area/length of a GC sum over parts (round 6)."""
    df = spark.createDataFrame([(1, GC_WKT)], "id int, w string") \
        .select("id", st.from_wkt("w").alias("g"))
    row = df.select(F.round(st.area("g"), 9).alias("a"),
                    F.round(st.length("g"), 9).alias("l")).collect()[0]
    assert row.a == pytest.approx(4.0)      # the 2x2 polygon
    assert row.l == pytest.approx(3.0 * (2 ** 0.5) + 8.0)  # line + perimeter


def test_collection_extract(spark):
    from arctic_spark import st
    from pyspark.sql import functions as F
    rows = [
        (1, "GEOMETRYCOLLECTION (POINT (1 2), "
            "LINESTRING (0 0, 3 4), "
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1)), "
            "POINT (5 6))"),
        (2, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),   # non-GC, matches poly
        (3, "LINESTRING (0 0, 6 8)"),                  # non-GC, no match
    ]
    df = (spark.createDataFrame(rows, "id long, w string")
          .withColumn("g", st.from_wkt("w")))
    out = {r.id: r for r in df.select(
        "id",
        st.num_parts(st.collection_extract("g", "point")).alias("np"),
        st.length(st.collection_extract("g", "line")).alias("ll"),
        st.area(st.collection_extract("g", "polygon")).alias("pa"),
        st.num_parts(st.collection_extract("g", 2)).alias("npoly"),
        st.geom_type_name(st.collection_extract("g", "polygon")).alias("t"))
        .collect()}
    assert out[1].np == 2                      # two points
    assert out[1].ll == pytest.approx(5.0)
    assert out[1].pa == pytest.approx(15.0)    # holed polygon kept intact
    assert out[1].npoly == 1
    assert out[2].pa == pytest.approx(4.0)     # pass-through on match
    assert out[3].pa == 0.0                    # empty on mismatch
    assert st is not None
