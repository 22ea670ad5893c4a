"""Spatial join tests replicating the reference's Rust test fixtures
exactly (geopolars/src/spatial_index.rs:432-556): 9 points × 1 polygon,
inner=(2,4), left=(9,4), suffixed column names."""

import pytest
from pyspark.sql import functions as F

from arctic_spark import GeoDataFrame, st
from arctic_spark.joins import dwithin_join, spatial_join

POINTS = [(0.0, 10.0), (1.0, 1.0), (10.0, 1.0), (1.0, -1.0), (0.0, -10.0),
          (-1.0, -1.0), (-10.0, 0.0), (-1.0, 1.0), (0.0, 10.0)]


@pytest.fixture(scope="module")
def points_df(spark, tmp_path_factory):
    # materialize through parquet so join-plan assertions see pure
    # FileScans (no ingest UDF in the lineage)
    rows = [(float(i + 1), x, y) for i, (x, y) in enumerate(POINTS)]
    df = spark.createDataFrame(rows, "point_values double, x double, y double") \
        .select("point_values",
                st.point(F.col("x"), F.col("y")).alias("geometry"))
    path = str(tmp_path_factory.mktemp("sj") / "points.parquet")
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


@pytest.fixture(scope="module")
def poly_df(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [("test", "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))")],
        "string_col string, wkt string") \
        .select("string_col", st.from_wkt("wkt").alias("geometry"))
    path = str(tmp_path_factory.mktemp("sj") / "polys.parquet")
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def test_inner_join_f5(points_df, poly_df):
    out = spatial_join(points_df, poly_df, how="inner").df
    assert set(out.columns) == {"point_values_left", "geometry_left",
                                "string_col_right", "geometry_right"}
    rows = out.collect()
    assert len(rows) == 2  # spatial_index.rs:457: inner → (2, 4)
    vals = sorted(r["point_values_left"] for r in rows)
    assert vals == [2.0, 3.0]  # points (1,1) and (10,1)
    assert all(r["string_col_right"] == "test" for r in rows)


def test_left_join_f5(points_df, poly_df):
    out = spatial_join(points_df, poly_df, how="left").df
    rows = out.collect()
    assert len(rows) == 9  # spatial_index.rs:478: left → (9, 4)
    matched = [r for r in rows if r["string_col_right"] is not None]
    assert sorted(r["point_values_left"] for r in matched) == [2.0, 3.0]


def test_left_join_map_column(spark, poly_df):
    """ADVICE r2: left join must work when the left side carries a
    MapType column (maps are not comparable, so a value-equality
    anti-join would throw) and duplicate-valued rows must each survive."""
    rows = [(1.0, 1.0, 1.0), (1.0, 1.0, 1.0), (20.0, 20.0, 3.0)]
    df = (spark.createDataFrame(rows, "x double, y double, v double")
          .select("v", st.point(F.col("x"), F.col("y")).alias("geometry"),
                  F.create_map(F.lit("k"), F.col("v")).alias("meta")))
    out = spatial_join(df, poly_df, how="left").df.collect()
    assert len(out) == 3  # both duplicate rows present
    matched = [r for r in out if r["string_col_right"] is not None]
    assert sorted(r["v_left"] for r in matched) == [1.0, 1.0]


def test_custom_suffixes(points_df, poly_df):
    out = spatial_join(points_df, poly_df, lsuffix="_a", rsuffix="_b").df
    assert set(out.columns) == {"point_values_a", "geometry_a",
                                "string_col_b", "geometry_b"}


def test_contains_predicate(points_df, poly_df):
    # reference maps point/polygon Contains to the same
    # polygon.contains(point) — identical result (spatial_index.rs:91-101)
    out = spatial_join(poly_df, points_df, predicate="contains").df
    assert out.count() == 2


def test_unsupported_how(points_df, poly_df):
    with pytest.raises(ValueError, match="not supported"):
        spatial_join(points_df, poly_df, how="outer")
    with pytest.raises(ValueError, match="predicate"):
        spatial_join(points_df, poly_df, predicate="equals")


def test_native_only_refine(points_df, poly_df):
    out = spatial_join(points_df, poly_df, udf_refine=False).df
    assert out.count() == 2
    # plan must not contain a Python evaluation node
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_broadcast_right(points_df, poly_df):
    out = spatial_join(points_df, poly_df, broadcast_right=True,
                       udf_refine=False)
    assert out.df.count() == 2
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_polygon_polygon_intersects(spark):
    polys1 = spark.createDataFrame(
        [(1, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
         (2, "POLYGON ((30 30, 40 30, 40 40, 30 40, 30 30))")],
        "id int, wkt string").select(
            "id", st.from_wkt("wkt").alias("geometry"))
    polys2 = spark.createDataFrame(
        [(10, "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"),
         (20, "POLYGON ((100 100, 110 100, 110 110, 100 110, 100 100))")],
        "id int, wkt string").select(
            "id", st.from_wkt("wkt").alias("geometry"))
    out = spatial_join(polys1, polys2).df
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["id_left"] == 1 and rows[0]["id_right"] == 10


def test_dwithin_join(points_df):
    other = points_df.select(F.col("point_values").alias("pv"), "geometry")
    out = dwithin_join(points_df, GeoDataFrame(other), distance=3.0,
                       points_only=True).df
    rows = out.collect()
    # pairs within 3.0: each point with itself (incl. the duplicate
    # (0,10) pair both ways), plus the cluster around (±1, ±1)
    import math
    exp = 0
    for i, (x1, y1) in enumerate(POINTS):
        for j, (x2, y2) in enumerate(POINTS):
            if math.hypot(x1 - x2, y1 - y2) <= 3.0:
                exp += 1
    assert len(rows) == exp
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan


def test_left_join_with_key_no_persist(spark, points_df, poly_df):
    """left_key path: identical results to the keyless left join, with
    NOTHING persisted (VERDICT r4 #4 — the keyless path must pin the
    id-tagged left side; a unique key removes the need)."""
    left = points_df.withColumn("pid", F.col("point_values"))
    out = spatial_join(left, poly_df, how="left", left_key="pid")
    rows = out.df.collect()
    assert len(rows) == 9
    matched = [r for r in rows if r["string_col_right"] is not None]
    assert sorted(r["point_values_left"] for r in matched) == [2.0, 3.0]
    # keyless pins left+matched; keyed pins only the matched branch
    from arctic_spark.cache import pinned
    assert len(pinned(out)) == 1
    with pytest.raises(ValueError, match="left_key"):
        spatial_join(left, poly_df, how="left", left_key="nope")


def test_release_unpersists(spark, points_df, poly_df):
    """Persisted intermediates are pinned on the result and freed by
    release() — repeated joins must not accumulate session-lifetime
    cached blocks."""
    sc = spark.sparkContext
    out = spatial_join(points_df, poly_df, how="left")
    out.df.count()
    from arctic_spark.cache import pinned
    handles = pinned(out)
    assert len(handles) == 2  # id-tagged left + matched
    assert any(h.storageLevel.useMemory or h.storageLevel.useDisk
               for h in handles)
    freed = out.release()
    assert freed == 2
    assert all(not (h.storageLevel.useMemory or h.storageLevel.useDisk)
               for h in handles)
    assert out.release() == 0  # idempotent


def test_nearest_join(spark):
    from arctic_spark.joins import nearest_join
    left = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 5.0, 5.0), (3, 100.0, 100.0)],
        "lid long, x double, y double") \
        .select("lid", st.point(F.col("x"), F.col("y")).alias("geometry"))
    right = spark.createDataFrame(
        [(10, 2.0, 1.0), (20, 6.0, 5.0), (30, 0.0, 0.0)],
        "rid long, x double, y double") \
        .select("rid", st.point(F.col("x"), F.col("y")).alias("geometry"))
    out = nearest_join(left, right, max_distance=2.0, k=1,
                       left_key="lid").df
    rows = {r.lid_left: r for r in out.collect()}
    assert set(rows) == {1, 2}  # (100,100) has nothing within 2
    assert rows[1].rid_right == 10 and rows[1].distance == 1.0
    assert rows[2].rid_right == 20 and rows[2].distance == 1.0
    # k=2 adds (0,0) at distance sqrt(2) for left point 1
    out2 = nearest_join(left, right, max_distance=2.0, k=2,
                        left_key="lid").df
    got = sorted((r.lid_left, r.rid_right, round(r.distance, 6))
                 for r in out2.collect())
    assert got == [(1, 10, 1.0), (1, 30, round(2 ** 0.5, 6)),
                   (2, 20, 1.0)]
    with pytest.raises(ValueError, match="left_key"):
        nearest_join(left, right, max_distance=2.0)


def test_convex_sat_matches_python_kernel(spark):
    """Round 6: the native convex SAT / half-plane refine must agree with
    the general vectorized Python kernel on random convex polygon pairs
    (including touch-free separations, containments and crossings)."""
    import math
    import random

    from arctic_spark.functions import native
    from arctic_spark.functions.udfs import contains as contains_udf
    from arctic_spark.functions.udfs import intersects as intersects_udf

    rnd = random.Random(7)
    rows = []
    for i in range(120):
        # random convex polygon: sorted angles on a noisy circle
        def convex(cx, cy, rbase, nv):
            angs = sorted(rnd.uniform(0, 2 * math.pi) for _ in range(nv))
            pts = [(cx + rbase * (0.6 + 0.4 * rnd.random()) * math.cos(a),
                    cy + rbase * (0.6 + 0.4 * rnd.random()) * math.sin(a))
                   for a in angs]
            # convex hull of the points guarantees convexity
            pts = sorted(set(pts))
            def half(ps):
                h = []
                for p in ps:
                    while len(h) >= 2 and (
                            (h[-1][0]-h[-2][0])*(p[1]-h[-2][1])
                            - (h[-1][1]-h[-2][1])*(p[0]-h[-2][0])) <= 0:
                        h.pop()
                    h.append(p)
                return h
            lo = half(pts); hi = half(pts[::-1])
            hull = lo[:-1] + hi[:-1]
            return hull
        a = convex(0.0, 0.0, 3.0, 8)
        b = convex(rnd.uniform(-6, 6), rnd.uniform(-6, 6),
                   rnd.uniform(0.5, 4.0), 7)
        rows.append((i, [p[0] for p in a], [p[1] for p in a],
                     [p[0] for p in b], [p[1] for p in b]))
    df = spark.createDataFrame(
        rows, "id long, ax array<double>, ay array<double>, "
              "bx array<double>, by array<double>") \
        .select("id",
                st.make_polygon(F.col("ax"), F.col("ay")).alias("ga"),
                st.make_polygon(F.col("bx"), F.col("by")).alias("gb"))
    df = df.withColumn("cvx_a", native.is_convex(F.col("ga"))) \
           .withColumn("cvx_b", native.is_convex(F.col("gb"))) \
           .withColumn("sat_i", native.convex_intersects(F.col("ga"),
                                                         F.col("gb"))) \
           .withColumn("sat_c", native.convex_contains(F.col("ga"),
                                                       F.col("gb"))) \
           .withColumn("udf_i", intersects_udf(F.col("ga"), F.col("gb"))) \
           .withColumn("udf_c", contains_udf(F.col("ga"), F.col("gb")))
    out = df.collect()
    assert all(r.cvx_a and r.cvx_b for r in out)
    mism_i = [r.id for r in out if bool(r.sat_i) != bool(r.udf_i)]
    mism_c = [r.id for r in out if bool(r.sat_c) != bool(r.udf_c)]
    assert mism_i == [], f"intersects mismatch on ids {mism_i}"
    assert mism_c == [], f"contains mismatch on ids {mism_c}"


def test_is_convex_flags(spark):
    from arctic_spark.functions import native
    df = spark.createDataFrame(
        [("sq", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", True),
         ("dia", "POLYGON ((1 0, 2 1, 1 2, 0 1, 1 0))", True),
         ("coll", "POLYGON ((0 0, 1 0, 2 0, 2 2, 0 2, 0 0))", True),
         ("ell", "POLYGON ((0 0, 4 0, 4 1, 1 1, 1 3, 0 3, 0 0))", False),
         ("line", "LINESTRING (0 0, 1 1)", False),
         ("pt", "POINT (1 1)", False)],
        "name string, wkt string, expect boolean") \
        .select("name", "expect", st.from_wkt("wkt").alias("g"))
    df = df.select("name", "expect", native.is_convex(F.col("g")).alias("got"))
    for r in df.collect():
        assert bool(r.got) == r.expect, r.name


def test_overlay_intersection_rect_grid(spark):
    """Overlay intersection of two shifted rect grids: every pairwise
    area has the closed interval-arithmetic form."""
    from arctic_spark.joins import overlay

    def rects(n, dx, dy, w, tag):
        df = (spark.range(0, n)
              .withColumn("x0", (F.col("id") % 3).cast("double") * 2.0 + dx)
              .withColumn("y0", (F.col("id") / 3).cast("int")
                          .cast("double") * 2.0 + dy))
        g = st.make_envelope(F.col("x0"), F.col("y0"),
                             F.col("x0") + w, F.col("y0") + w)
        return GeoDataFrame(
            df.select(F.col("id").alias(f"{tag}_id"), g.alias("geometry")))

    a = rects(9, 0.0, 0.0, 1.5, "a")
    b = rects(9, 0.7, 0.9, 1.5, "b")
    out = overlay(a, b, how="intersection")
    rows = out.df.select("a_id_1", "b_id_2",
                         st.area("geometry").alias("ar")).collect()
    # python oracle
    import itertools
    want = {}
    for i, j in itertools.product(range(9), range(9)):
        ax0, ay0 = (i % 3) * 2.0, (i // 3) * 2.0
        bx0, by0 = (j % 3) * 2.0 + 0.7, (j // 3) * 2.0 + 0.9
        w = min(ax0 + 1.5, bx0 + 1.5) - max(ax0, bx0)
        h = min(ay0 + 1.5, by0 + 1.5) - max(ay0, by0)
        if w > 0 and h > 0:
            want[(i, j)] = w * h
    got = {(r.a_id_1, r.b_id_2): r.ar for r in rows}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_overlay_difference(spark):
    from arctic_spark.joins import overlay
    left = GeoDataFrame(spark.createDataFrame(
        [(1,), (2,)], "lid long").withColumn(
            "geometry", st.make_envelope(
                F.lit(0.0) + (F.col("lid") - 1) * 10.0, F.lit(0.0),
                F.lit(4.0) + (F.col("lid") - 1) * 10.0, F.lit(4.0))))
    # two clips overlapping left row 1 only; row 2 untouched
    right = GeoDataFrame(spark.createDataFrame(
        [(1, 0.0, 0.0, 2.0, 2.0), (2, 2.0, 0.0, 4.0, 2.0)],
        "rid long, x0 double, y0 double, x1 double, y1 double")
        .withColumn("geometry", st.make_envelope(
            F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"))))
    out = overlay(left, right, how="difference", left_key="lid")
    got = {r.lid: r.ar for r in out.df.select(
        "lid", st.area("geometry").alias("ar")).collect()}
    # row 1: 4x4 minus the union strip 4x2 -> 8 ; row 2: untouched 16
    assert abs(got[1] - 8.0) < 1e-9
    assert abs(got[2] - 16.0) < 1e-9

    with pytest.raises(ValueError):
        overlay(left, right, how="difference")
    with pytest.raises(ValueError):
        overlay(left, right, how="union")


def test_overlay_union_identity_symdiff(spark):
    """The three composite overlay modes vs closed-form areas.

    left: lid1 = (0,0,4,4), lid2 = (10,0,14,4).
    right: rid1 = (0,0,2,2) wholly inside lid1;
           rid2 = (2,0,6,2) half in lid1, half outside.
    """
    from arctic_spark.joins import overlay
    left = GeoDataFrame(spark.createDataFrame(
        [(1,), (2,)], "lid long").withColumn(
            "geometry", st.make_envelope(
                (F.col("lid") - 1) * 10.0, F.lit(0.0),
                F.lit(4.0) + (F.col("lid") - 1) * 10.0, F.lit(4.0))))
    right = GeoDataFrame(spark.createDataFrame(
        [(1, 0.0, 0.0, 2.0, 2.0), (2, 2.0, 0.0, 6.0, 2.0)],
        "rid long, x0 double, y0 double, x1 double, y1 double")
        .select("rid", st.make_envelope(
            F.col("x0"), F.col("y0"), F.col("x1"),
            F.col("y1")).alias("geometry")))

    def rows_of(how, **kw):
        out = overlay(left, right, how=how, left_key="lid",
                      lsuffix="_1", rsuffix="_2", **kw)
        assert out.df.columns == ["lid_1", "rid_2", "geometry"]
        key = (lambda t: (t[0] if t[0] is not None else -1,
                          t[1] if t[1] is not None else -1, t[2]))
        return sorted(
            ((r.lid_1, r.rid_2, round(r.ar, 9)) for r in out.df.select(
                "lid_1", "rid_2",
                st.area("geometry").alias("ar")).collect()), key=key)

    key = (lambda t: (t[0] if t[0] is not None else -1,
                      t[1] if t[1] is not None else -1, t[2]))
    # union: 2 intersection pieces + 2 left leftovers + 1 right
    # leftover (rid1 is wholly consumed by lid1)
    assert rows_of("union", right_key="rid") == sorted([
        (1, 1, 4.0), (1, 2, 4.0),        # intersections
        (1, None, 8.0), (2, None, 16.0),  # left minus right union
        (None, 2, 4.0),                   # rid2's outside half
    ], key=key)
    # identity: union restricted to the left extent
    assert rows_of("identity") == sorted([
        (1, 1, 4.0), (1, 2, 4.0), (1, None, 8.0), (2, None, 16.0)],
        key=key)
    # symmetric difference: both leftovers, no intersection pieces
    assert rows_of("symmetric_difference", right_key="rid") == sorted([
        (1, None, 8.0), (2, None, 16.0), (None, 2, 4.0)], key=key)
    # composite modes demand their keys
    with pytest.raises(ValueError):
        overlay(left, right, how="union", left_key="lid")
    with pytest.raises(ValueError):
        overlay(left, right, how="identity")


def test_sjoin_within_predicate(spark):
    """within == contains with sides swapped; column order stays
    left-first."""
    small = GeoDataFrame(spark.createDataFrame([(1,), (2,)], "sid long")
        .withColumn("geometry", st.make_envelope(
            F.col("sid").cast("double") * 10.0, F.lit(0.0),
            F.col("sid").cast("double") * 10.0 + 1.0, F.lit(1.0))))
    big = GeoDataFrame(spark.createDataFrame([(1,)], "bid long")
        .withColumn("geometry", st.make_envelope(
            F.lit(9.0), F.lit(-1.0), F.lit(12.0), F.lit(2.0))))
    out = spatial_join(small, big, predicate="within")
    rows = out.df.collect()
    assert len(rows) == 1
    assert rows[0].sid_left == 1 and rows[0].bid_right == 1
    assert out.df.columns[0] == "sid_left"
    assert out.geometry_column == "geometry_left"
    with pytest.raises(ValueError):
        spatial_join(small, big, how="left", predicate="within")


def test_sjoin_touches_overlaps_predicates(spark):
    """DE-9IM join predicates: exact kernel refine after the grid
    prefilter."""
    a = GeoDataFrame(spark.createDataFrame(
        [(1, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
         (2, "POLYGON ((10 0, 12 0, 12 2, 10 2, 10 0))")],
        "aid long, wkt string").select(
            "aid", st.from_wkt("wkt").alias("geometry")))
    b = GeoDataFrame(spark.createDataFrame(
        # touches a1 along an edge; overlaps a2
        [(1, "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))"),
         (2, "POLYGON ((11 1, 13 1, 13 3, 11 3, 11 1))")],
        "bid long, wkt string").select(
            "bid", st.from_wkt("wkt").alias("geometry")))
    t = spatial_join(a, b, predicate="touches").df.collect()
    assert [(r.aid_left, r.bid_right) for r in t] == [(1, 1)]
    o = spatial_join(a, b, predicate="overlaps").df.collect()
    assert [(r.aid_left, r.bid_right) for r in o] == [(2, 2)]
    with pytest.raises(ValueError, match="udf_refine"):
        spatial_join(a, b, predicate="touches", udf_refine=False)


def test_sjoin_crosses_predicate(spark):
    lines = GeoDataFrame(spark.createDataFrame(
        [(1, "LINESTRING (0 0, 4 4)"), (2, "LINESTRING (10 10, 14 14)")],
        "lid long, wkt string").select(
            "lid", st.from_wkt("wkt").alias("geometry")))
    polys = GeoDataFrame(spark.createDataFrame(
        [(7, "POLYGON ((1 0, 3 0, 3 9, 1 9, 1 0))")],
        "pid long, wkt string").select(
            "pid", st.from_wkt("wkt").alias("geometry")))
    out = spatial_join(lines, polys, predicate="crosses").df.collect()
    assert [(r.lid_left, r.pid_right) for r in out] == [(1, 7)]


def _diamond_frame(spark, ids, mult, r_base):
    """Small L1-ball diamond fixture (the geo_diamond_join shape)."""
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    cx = ((F.col("id") * mult) % 2000).cast("double") / 100.0
    cy = ((F.col("id") * 40503 + 7) % 2000).cast("double") / 100.0
    r = F.lit(r_base) + (F.col("id") % 3).cast("double") * F.lit(0.6013)
    poly = st.make_polygon(F.array(cx - r, cx, cx + r, cx),
                           F.array(cy, cy - r, cy, cy + r))
    return GeoDataFrame(df.select("id", poly.alias("geometry")))


@pytest.mark.parametrize("predicate", ["intersects", "contains"])
def test_convex_refine_modes_agree(spark, predicate):
    """r13: the convex_refine="kernel" (Arrow batch) path must produce
    the exact pair set of the r6 "sat" (native HOF) path through the
    full spatial_join, for both fast predicates, on a tie-free diamond
    workload (the geo_diamond_join gate shape)."""
    left = _diamond_frame(spark, range(1, 120), 2654435761, 4.9717)
    right = _diamond_frame(spark, range(1, 40), 69069, 1.4431)

    def pairs(mode, udf_refine):
        out = spatial_join(left, right, predicate=predicate,
                           udf_refine=udf_refine, convex_refine=mode)
        return sorted((r.id_left, r.id_right) for r in out.df.collect())

    base = pairs("sat", False)
    assert len(base) > 5  # fixture actually exercises the refine
    assert pairs("kernel", False) == base
    assert pairs("auto", True) == base  # auto→kernel under udf_refine
    assert pairs("auto", False) == base  # auto→sat stays the default
    with pytest.raises(ValueError, match="convex_refine"):
        spatial_join(left, right, convex_refine="nope")


def test_dwithin_points_fast_path_matches_general(spark, points_df):
    """r13: the points_only dwithin fast path (materialized coords,
    single-cell right side, squared-distance refine) must return the
    exact pair set of the general meta-struct path."""
    other = points_df.select(F.col("point_values").alias("pv"), "geometry")
    fast = dwithin_join(points_df, GeoDataFrame(other), distance=3.0,
                        points_only=True).df
    slow = dwithin_join(points_df, GeoDataFrame(other), distance=3.0,
                        points_only=False).df
    assert sorted(fast.columns) == sorted(slow.columns)
    key = lambda r: (r["point_values_left"], r["pv_right"])
    assert sorted(map(key, fast.collect())) == \
        sorted(map(key, slow.collect()))
    # the fast path never touches a Python worker and never explodes
    # the right side
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
