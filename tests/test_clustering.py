"""Spatial clustering: cluster_within / cluster_dbscan semantics."""

import pytest
from pyspark.sql import functions as F

from arctic_spark import GeoDataFrame, cluster_dbscan, cluster_within, st


def _points(spark, pts):
    df = spark.createDataFrame([(i, float(x), float(y))
                                for i, (x, y) in enumerate(pts, start=1)],
                               "id long, x double, y double")
    return GeoDataFrame(df.select(
        "id", st.point(F.col("x"), F.col("y")).alias("geometry")))


@pytest.fixture(scope="module")
def fixture(spark):
    # chain A: ids 1-5 spaced 0.9 (single-linkage connects end-to-end
    # even though endpoints are 3.6 apart); pair B: ids 6-7 (too small
    # for DBSCAN min_points=3); singleton C: id 8
    pts = ([(i * 0.9, 0.0) for i in range(5)]          # ids 1..5
           + [(100.0, 0.0), (100.9, 0.0)]              # ids 6,7
           + [(200.0, 0.0)])                           # id 8
    return _points(spark, pts)


def test_cluster_within_single_linkage(spark, fixture):
    got = {r["id"]: r["cluster"]
           for r in cluster_within(fixture, 1.0, "id",
                                   points_only=True).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 6, 7: 6, 8: 8}


def test_cluster_within_smaller_radius_splits(spark, fixture):
    got = {r["id"]: r["cluster"]
           for r in cluster_within(fixture, 0.5, "id",
                                   points_only=True).collect()}
    # nothing is within 0.5 — everything is its own cluster
    assert got == {i: i for i in range(1, 9)}


def test_cluster_dbscan_core_border_noise(spark, fixture):
    got = {r["id"]: r["cluster"]
           for r in cluster_dbscan(fixture, 1.0, 3, "id",
                                   points_only=True).collect()}
    # chain: 2,3,4 core (self + 2 nbrs), 1 and 5 border -> attach to
    # the core component labeled min core id = 2; pair 6,7 noise
    # (counts = 2 < 3); singleton 8 noise
    assert got == {1: 2, 2: 2, 3: 2, 4: 2, 5: 2,
                   6: None, 7: None, 8: None}


def test_cluster_dbscan_min_points_2(spark, fixture):
    got = {r["id"]: r["cluster"]
           for r in cluster_dbscan(fixture, 1.0, 2, "id",
                                   points_only=True).collect()}
    # min_points=2: every point with >=1 neighbor is core
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 6, 7: 6, 8: None}


def test_cluster_dbscan_udf_path_matches_native(spark, fixture):
    native = {r["id"]: r["cluster"]
              for r in cluster_dbscan(fixture, 1.0, 3, "id",
                                      points_only=True).collect()}
    general = {r["id"]: r["cluster"]
               for r in cluster_dbscan(fixture, 1.0, 3, "id").collect()}
    assert native == general


def test_cluster_kmeans_recovers_blobs(spark):
    from arctic_spark import GeoDataFrame
    from arctic_spark.clustering import cluster_kmeans
    # 3 tight blobs far apart; ids interleaved across blobs so the
    # min-id relabel is nontrivial
    pts = []
    for i in range(12):
        blob = i % 3
        pts.append((i + 1, blob * 100.0 + (i // 3) * 0.1, blob * 50.0))
    df = spark.createDataFrame(pts, "id long, x double, y double")
    gdf = GeoDataFrame(df.select(
        "id", st.point(F.col("x"), F.col("y")).alias("geometry")))
    got = {r["id"]: r["cluster"]
           for r in cluster_kmeans(gdf, 3, "id").collect()}
    # blob 0: ids 1,4,7,10 -> label 1; blob 1: 2,5,8,11 -> 2; blob 2: 3..
    expect = {i + 1: (i % 3) + 1 for i in range(12)}
    assert got == expect


def test_cluster_kmeans_k1_and_determinism(spark):
    from arctic_spark import GeoDataFrame
    from arctic_spark.clustering import cluster_kmeans
    df = spark.createDataFrame([(i, float(i), 0.0) for i in range(1, 8)],
                               "id long, x double, y double")
    gdf = GeoDataFrame(df.select(
        "id", st.point(F.col("x"), F.col("y")).alias("geometry")))
    one = {r["id"]: r["cluster"] for r in cluster_kmeans(gdf, 1, "id").collect()}
    assert set(one.values()) == {1}
    a = sorted(cluster_kmeans(gdf, 3, "id").collect())
    b = sorted(cluster_kmeans(
        GeoDataFrame(df.repartition(5).select(
            "id", st.point(F.col("x"), F.col("y")).alias("geometry"))),
        3, "id").collect())
    assert a == b


def test_cluster_within_matches_bruteforce_random(spark):
    """Property: distributed single-linkage == driver-side union-find
    over the exact pair list, on random points."""
    import numpy as np
    rng = np.random.default_rng(33)
    n, d = 60, 1.5
    xs = rng.uniform(0, 12, n)
    ys = rng.uniform(0, 12, n)
    df = spark.createDataFrame(
        [(i + 1, float(xs[i]), float(ys[i])) for i in range(n)],
        "id long, x double, y double")
    gdf = GeoDataFrame(df.select(
        "id", st.point(F.col("x"), F.col("y")).alias("geometry")))
    got = {r["id"]: r["cluster"]
           for r in cluster_within(gdf, d, "id", points_only=True).collect()}

    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            if (xs[i] - xs[j]) ** 2 + (ys[i] - ys[j]) ** 2 <= d * d:
                parent[find(i)] = find(j)
    expect = {}
    for i in range(n):
        root = find(i)
        expect.setdefault(root, []).append(i + 1)
    labels = {m: min(ms) for ms in expect.values() for m in ms}
    assert got == labels


def test_cluster_dbscan_matches_bruteforce_random(spark):
    """Property: distributed DBSCAN == driver-side reference DBSCAN
    (core = ≥min_points within eps incl. self; border attaches to the
    min core-cluster label) on random points."""
    import numpy as np
    rng = np.random.default_rng(44)
    n, eps, mp = 70, 1.2, 4
    xs = rng.uniform(0, 10, n)
    ys = rng.uniform(0, 10, n)
    df = spark.createDataFrame(
        [(i + 1, float(xs[i]), float(ys[i])) for i in range(n)],
        "id long, x double, y double")
    gdf = GeoDataFrame(df.select(
        "id", st.point(F.col("x"), F.col("y")).alias("geometry")))
    got = {r["id"]: r["cluster"]
           for r in cluster_dbscan(gdf, eps, mp, "id",
                                   points_only=True).collect()}

    d2 = (xs[:, None] - xs[None, :]) ** 2 + (ys[:, None] - ys[None, :]) ** 2
    nbr = d2 <= eps * eps
    core = nbr.sum(axis=1) >= mp                 # includes self
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            if core[i] and core[j] and nbr[i, j]:
                parent[find(i)] = find(j)
    comp_members = {}
    for i in range(n):
        if core[i]:
            comp_members.setdefault(find(i), []).append(i + 1)
    core_label = {}
    for ms in comp_members.values():
        lab = min(ms)
        for m in ms:
            core_label[m] = lab
    expect = {}
    for i in range(n):
        if core[i]:
            expect[i + 1] = core_label[i + 1]
        else:
            labs = [core_label[j + 1] for j in range(n)
                    if core[j] and nbr[i, j] and j != i]
            expect[i + 1] = min(labs) if labs else None
    assert got == expect
