"""SQL-string surface: spark.sql(...) with registered st_* functions."""

import pytest

from arctic_spark.sql import register_sql_functions


def test_sql_functions_end_to_end(spark):
    names = register_sql_functions(spark)
    assert "st_area" in names and "st_geomfromtext" in names
    spark.sql("""
        SELECT 1 AS id, 'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))' AS wkt
        UNION ALL SELECT 2, 'POINT (3 7)'
        UNION ALL SELECT 3, NULL
    """).createOrReplaceTempView("shapes")
    rows = {r.id: r for r in spark.sql("""
        SELECT id,
               st_area(st_geomfromtext(wkt)) AS area,
               st_length(st_geomfromtext(wkt)) AS len,
               st_astext(st_geomfromtext(wkt)) AS txt,
               st_x(st_geomfromtext(wkt)) AS x,
               st_geometrytype(st_geomfromtext(wkt)) AS t
        FROM shapes
    """).collect()}
    assert rows[1].area == pytest.approx(16.0)
    assert rows[1].len == pytest.approx(16.0)
    assert rows[2].x == 3.0 and rows[2].t == 0
    assert rows[1].txt.startswith("POLYGON")
    assert rows[3].area is None

    r = spark.sql("""
        SELECT st_intersects(st_geomfromtext('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'),
                             st_point(1.0D, 1.0D)) AS hit,
               st_distance(st_point(0.0D, 0.0D), st_point(3.0D, 4.0D)) AS d,
               st_area(st_buffer(st_point(0.0D, 0.0D), 2.0D)) AS ba
        """).collect()[0]
    assert r.hit is True
    assert r.d == pytest.approx(5.0)
    import math
    assert r.ba == pytest.approx(math.pi * 4, rel=0.02)


def test_sql_overlay_and_geojson(spark):
    register_sql_functions(spark)
    r = spark.sql("""
        SELECT st_area(st_intersection(
                   st_geomfromtext('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'),
                   st_geomfromtext('POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))')))
                   AS ia,
               st_area(st_difference(
                   st_geomfromtext('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'),
                   st_geomfromtext('POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))')))
                   AS da,
               st_length(st_intersection(
                   st_geomfromtext('LINESTRING (-1 1, 9 1)'),
                   st_geomfromtext('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')))
                   AS clip_len,
               st_equals(
                   st_geomfromtext('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'),
                   st_geomfromtext('POLYGON ((4 4, 0 4, 0 0, 4 0, 4 4))'))
                   AS eq,
               st_asgeojson(st_point(1.5D, 2.5D)) AS gj,
               st_astext(st_geomfromgeojson(
                   '{"type": "Point", "coordinates": [3.0, 4.0]}')) AS rt
    """).collect()[0]
    assert r.ia == pytest.approx(4.0)
    assert r.da == pytest.approx(12.0)
    assert r.clip_len == pytest.approx(4.0)
    assert r.eq is True
    import json
    assert json.loads(r.gj) == {"type": "Point", "coordinates": [1.5, 2.5]}
    assert r.rt == "POINT (3 4)"


def test_sql_shape_descriptors(spark):
    from arctic_spark.sql import register_sql_functions
    names = register_sql_functions(spark)
    assert "st_hausdorffdistance" in names
    r = spark.sql("""
        SELECT st_hausdorffdistance(
                   st_geomfromtext('LINESTRING (0 0, 10 0)'),
                   st_geomfromtext('LINESTRING (0 3, 10 3)')) AS hd,
               st_frechetdistance(
                   st_geomfromtext('LINESTRING (0 0, 10 0)'),
                   st_geomfromtext('LINESTRING (0 2, 10 2)')) AS fr,
               st_area(st_orientedenvelope(
                   st_geomfromtext('POLYGON ((3 0, 0 1, -3 0, 0 -1, 3 0))')))
                   AS mrr,
               st_minimumboundingradius(
                   st_geomfromtext('POLYGON ((3 0, 0 1, -3 0, 0 -1, 3 0))'))
                   AS mbr,
               st_length(st_shortestline(
                   st_geomfromtext('POINT (5 5)'),
                   st_geomfromtext('LINESTRING (0 0, 10 0)'))) AS sl
    """).collect()[0]
    import pytest as _pt
    assert r.hd == _pt.approx(3.0)
    assert r.fr == _pt.approx(2.0)
    assert r.mrr == _pt.approx(4 * 3 * 1 * 9 / 10)
    assert r.mbr == _pt.approx(3.0)
    assert r.sl == _pt.approx(5.0)


def test_sql_orientation_accessors(spark):
    from arctic_spark.sql import register_sql_functions
    names = register_sql_functions(spark)
    for n in ("st_npoints", "st_numgeometries", "st_isclosed",
              "st_isccw", "st_forcepolygonccw"):
        assert n in names
    r = spark.sql("""
        SELECT st_npoints(st_geomfromtext(
                   'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')) AS np,
               st_numgeometries(st_geomfromtext(
                   'MULTIPOINT (0 0, 1 1, 2 2)')) AS ng,
               st_isclosed(st_geomfromtext(
                   'LINESTRING (0 0, 1 0, 1 1, 0 0)')) AS cl,
               st_isclosed(st_geomfromtext(
                   'LINESTRING (0 0, 1 1)')) AS op,
               st_isccw(st_geomfromtext(
                   'LINESTRING (0 0, 1 0, 1 1, 0 0)')) AS ccw,
               st_isccw(st_geomfromtext(
                   'LINESTRING (0 0, 0 1, 1 1, 0 0)')) AS cw,
               st_astext(st_forcepolygonccw(st_geomfromtext(
                   'POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))'))) AS fixed
    """).collect()[0]
    assert r.np == 5 and r.ng == 3
    assert r.cl is True and r.op is False
    assert r.ccw is True and r.cw is False
    assert r.fixed == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"


def test_sql_geohash(spark):
    from arctic_spark.sql import register_sql_functions
    names = register_sql_functions(spark)
    assert "st_geohash" in names
    r = spark.sql(
        "SELECT st_geohash(-5.6D, 42.6D, 5) AS g").collect()[0]
    assert r.g == "ezs42"
