"""Distributed spatial clustering: ST_ClusterWithin / ST_ClusterDBSCAN.

PostGIS exposes both as single-node window/aggregate functions
(``ST_ClusterWithin(geom, d)``, ``ST_ClusterDBSCAN(geom, eps,
minpoints) OVER ()``); the reference engine has no clustering at all
(its surface stops at pairwise predicates, `geopolars/src/
spatial_index.rs:89-137`).  At 100 TB neither formulation survives — a
window over the whole table is a single-partition sort.  This module
re-expresses both as compositions the engine already scales:

1. **neighbor pairs** — ``dwithin_join`` of the table with itself:
   radius-sized grid cells, ONE equi-join shuffle on the cell id,
   native distance refine (zero Python for point inputs);
2. **transitive closure** — :func:`arctic_spark.llm.graph.
   connected_components`: min-label propagation + pointer jumping,
   O(log diameter) rounds of two-long-per-row shuffles;
3. DBSCAN adds two keyed aggregations (neighbor counts → core flags,
   border attachment via min-over-core-neighbors).

Cluster labels are member ids (the min id in the cluster), so labels
are deterministic and partitioning-independent — the property the
closed-form oracles check.

Semantics:

- ``cluster_within(df, distance)``: single-linkage — two geometries
  share a cluster iff connected by a chain of hops each ≤ ``distance``
  (PostGIS ST_ClusterWithin / ST_ClusterIntersecting with a buffer).
  Every row gets a cluster (singletons cluster with themselves).
- ``cluster_dbscan(df, eps, min_points)``: sklearn/PostGIS DBSCAN.
  A row is CORE iff ≥ ``min_points`` rows lie within ``eps`` of it
  (count includes itself, sklearn ``min_samples`` convention).  Core
  points within ``eps`` of each other share a cluster; non-core rows
  within ``eps`` of a core row join that core's cluster (border; ties
  across clusters break to the smallest label — PostGIS leaves this
  arbitrary, we pin it for determinism); remaining rows are noise
  (cluster NULL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .geodataframe import GeoDataFrame
from .joins import dwithin_join
from .llm.graph import connected_components


def _neighbor_pairs(gdf: GeoDataFrame, distance: float, id_col: str,
                    points_only: bool) -> DataFrame:
    """Directed neighbor pairs (src, dst), src ≠ dst, dist ≤ distance.
    Both directions are present (the self-join emits each unordered
    pair twice)."""
    from .cache import pin, pinned
    pairs = dwithin_join(gdf, gdf, distance, points_only=points_only)
    pdf = pairs.df if isinstance(pairs, GeoDataFrame) else pairs
    a, b = id_col + "_left", id_col + "_right"
    out = (pdf.select(F.col(a).cast("long").alias("src"),
                      F.col(b).cast("long").alias("dst"))
           .where(F.col("src") != F.col("dst")))
    return pin(out, *pinned(pairs))


def cluster_within(df, distance: float, id_col: str,
                   points_only: bool = False) -> DataFrame:
    """Single-linkage distance clustering (PostGIS ST_ClusterWithin).

    Returns ``(id_col, cluster)`` — one row per input row, ``cluster``
    = min id in the row's chain-connected component.  ``points_only=
    True`` asserts point geometries and keeps the whole neighbor-pair
    plan JVM-native.
    """
    gdf = df if isinstance(df, GeoDataFrame) else GeoDataFrame(df)
    ids = gdf.df.select(F.col(id_col).cast("long").alias("id")).distinct()
    edges = _neighbor_pairs(gdf, distance, id_col, points_only)
    comp = connected_components(edges, src="src", dst="dst",
                                vertices=ids, vertex_col="id")
    out = comp.select(F.col("id").alias(id_col),
                      F.col("component").alias("cluster"))
    from .cache import pin, pinned
    return pin(out, *pinned(edges))


def cluster_dbscan(df, eps: float, min_points: int, id_col: str,
                   points_only: bool = False) -> DataFrame:
    """Distributed DBSCAN (PostGIS ST_ClusterDBSCAN semantics).

    Returns ``(id_col, cluster)`` with ``cluster`` NULL for noise.
    Plan: one dwithin self-join (grid-cell equi-join + native refine),
    one groupBy(id) neighbor count, connected components over the
    core-core edges, one more keyed aggregation to attach border
    points.  Every shuffle is keyed on a single long — payload is
    independent of geometry size.
    """
    gdf = df if isinstance(df, GeoDataFrame) else GeoDataFrame(df)
    ids = gdf.df.select(F.col(id_col).cast("long").alias("id")).distinct()
    edges = _neighbor_pairs(gdf, eps, id_col, points_only)

    # The edge list feeds three consumers (counts, core-core closure,
    # border attach) — materialize it once, EAGERLY: a lazy persist
    # lets the consumers' concurrent tasks each recompute the dwithin
    # join before the cache fills (the r8 overlay lesson).
    from pyspark import StorageLevel
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()

    # core flag: neighbor count + self >= min_points
    ncount = edges.groupBy("src").agg(F.count("*").alias("nn"))
    core = (ids.join(ncount, ids["id"] == ncount["src"], "left")
            .select("id", (F.coalesce(F.col("nn"), F.lit(0)) + 1
                           >= F.lit(int(min_points))).alias("is_core")))
    core = core.persist(StorageLevel.MEMORY_AND_DISK)
    core.count()        # eager: both semi-joins of `ce` read it at once
    core_ids = core.where("is_core").select("id")

    # connected components over core-core edges only
    ce = (edges.join(core_ids.withColumnRenamed("id", "src"), "src", "semi")
          .join(core_ids.withColumnRenamed("id", "dst"), "dst", "semi"))
    comp = connected_components(ce, src="src", dst="dst",
                                vertices=core_ids, vertex_col="id")

    # border: non-core with ≥1 core neighbor → min core-cluster label
    border = (edges
              .join(comp.select(F.col("id").alias("dst"),
                                F.col("component").alias("nbr_cluster")),
                    "dst")
              .groupBy("src").agg(F.min("nbr_cluster").alias("border_cluster")))

    out = (core
           .join(comp.select("id", F.col("component").alias("core_cluster")),
                 "id", "left")
           .join(border.withColumnRenamed("src", "id"), "id", "left")
           .select(F.col("id").alias(id_col),
                   F.when(F.col("is_core"), F.col("core_cluster"))
                    .otherwise(F.col("border_cluster")).alias("cluster")))
    from .cache import pin, pinned
    return pin(out, edges, core, *pinned(edges))


def cluster_kmeans(df, k: int, id_col: str, max_iterations: int = 10,
                   tol: float = 1e-9) -> DataFrame:
    """Distributed k-means on geometry centroids (PostGIS
    ST_ClusterKMeans semantics, but deterministic).

    Init is farthest-first traversal over a bounded representative set
    (min-id point per coarse grid cell, one shuffle; ~16k² cells so ≥k
    natural clusters can't share a cell) starting from the minimum-id
    representative — fully reproducible, unlike PostGIS's random
    k-means++, and one seed lands per blob whenever cluster separation
    exceeds cluster diameter. Lloyd iterations assign natively (k
    scalar squared distances + array_min argmin with a deterministic
    index tie-break) and re-estimate centroids with one
    groupBy(cluster) mean per round; only representatives and the k
    centroid rows ever reach the driver. Returns ``(id_col, cluster)`` with ``cluster`` = min
    member id — label-stable under any partitioning.
    """
    from .functions import native as st_native
    from pyspark import StorageLevel

    gdf = df if isinstance(df, GeoDataFrame) else GeoDataFrame(df)
    g = F.col(gdf.geometry_column)
    cen = st_native.centroid(g)
    # localCheckpoint, not persist: the general-geometry centroid tree
    # (inlined twice, for x and y) is thousands of expression nodes, and
    # EVERY subsequent driver action — the bbox agg, each Lloyd round's
    # collect, the final relabel — would re-analyze it (~3-4 s of
    # serial driver time per action, ~40 s over a 10-round fit at ANY
    # data size). Truncating lineage leaves every round a 3-column
    # leaf plan; the materialized (id, x, y) projection is the same
    # working set the persist held.
    # freeze the centroid so the tree exists ONCE in the plan (x and y
    # would otherwise each inline a full copy — 2x the build and
    # analysis cost before the checkpoint cuts it)
    pts = (gdf.df.withColumn("__cen", st_native.freeze(cen))
           .select(F.col(id_col).cast("long").alias("id"),
                   st_native.x(F.col("__cen")).alias("x"),
                   st_native.y(F.col("__cen")).alias("y"))
           .localCheckpoint())

    # Deterministic farthest-first init over a BOUNDED representative
    # set: one shuffle picks the min-id point of each coarse grid cell
    # (grid fine enough that ≥k natural clusters can't share a cell:
    # ~16k cells), the representatives collect to the driver (≤~16k
    # rows regardless of data size), and farthest-first runs there in
    # numpy — 2 jobs total instead of k driver round-trips.
    import numpy as np
    k = int(k)
    bb = pts.agg(F.min("x").alias("x0"), F.max("x").alias("x1"),
                 F.min("y").alias("y0"), F.max("y").alias("y1"),
                 F.count("*").alias("n")).collect()[0]
    if not bb["n"]:
        return pts.select(F.col("id").alias(id_col),
                          F.lit(None).cast("long").alias("cluster"))
    div = max(int(np.ceil(4.0 * np.sqrt(max(k, 1)))), 1)
    cw = max((bb["x1"] - bb["x0"]) / div, 1e-300)
    ch = max((bb["y1"] - bb["y0"]) / div, 1e-300)
    cellx = F.least(F.floor((F.col("x") - bb["x0"]) / cw), F.lit(div - 1))
    celly = F.least(F.floor((F.col("y") - bb["y0"]) / ch), F.lit(div - 1))
    reps = (pts.groupBy(cellx.alias("cx"), celly.alias("cy"))
            .agg(F.min_by(F.struct("id", "x", "y"),
                          F.col("id")).alias("r"))
            .select("r.*").collect())
    reps.sort(key=lambda r: r["id"])
    rx = np.array([r["x"] for r in reps])
    ry = np.array([r["y"] for r in reps])
    k = min(k, len(reps))
    cents = [(float(rx[0]), float(ry[0]))]
    dmin = (rx - cents[0][0]) ** 2 + (ry - cents[0][1]) ** 2
    while len(cents) < k:
        j = int(np.argmax(dmin))             # ties → smallest rep index
        cents.append((float(rx[j]), float(ry[j])))
        dmin = np.minimum(dmin, (rx - rx[j]) ** 2 + (ry - ry[j]) ** 2)

    def _assign(centroids):
        # nearest-centroid index as a CONSTANT-SIZE expression: the
        # centroids ride the plan as two array LITERALS (one Literal
        # node each, any k) probed by an aggregate-HOF argmin with a
        # deterministic smallest-index tie-break. The earlier k-wide
        # form (k inlined scalar struct exprs + array_min) made every
        # downstream ACTION re-analyze an O(k) expression tree — at
        # k≈126 that was ~3-4 s of driver time per Lloyd round and per
        # consumer of the result, dominating the 1000-row data cost.
        # The HOF lambda is interpreted, not codegen'd, but n·k
        # interpreted float ops distribute across executors while the
        # analyzer cost was serial on the driver.
        cxa = F.lit([float(c[0]) for c in centroids])
        cya = F.lit([float(c[1]) for c in centroids])
        dx, dy = F.col("x"), F.col("y")
        best = F.aggregate(
            F.sequence(F.lit(1), F.lit(len(centroids))),
            F.struct(F.lit(float("inf")).alias("d"),
                     F.lit(-1).alias("i")),
            lambda acc, i: F.when(
                (F.element_at(cxa, i) - dx) * (F.element_at(cxa, i) - dx)
                + (F.element_at(cya, i) - dy) * (F.element_at(cya, i) - dy)
                < acc["d"],
                F.struct(
                    ((F.element_at(cxa, i) - dx) * (F.element_at(cxa, i) - dx)
                     + (F.element_at(cya, i) - dy) * (F.element_at(cya, i) - dy)
                     ).alias("d"),
                    (i - 1).alias("i"))).otherwise(acc))
        return best["i"]

    for _ in range(int(max_iterations)):
        means = (pts.withColumn("c", _assign(cents)).groupBy("c")
                 .agg(F.avg("x").alias("mx"), F.avg("y").alias("my"))
                 .collect())
        new = list(cents)
        for r in means:                       # empty clusters keep seeds
            new[r["c"]] = (float(r["mx"]), float(r["my"]))
        moved = max(abs(a[0] - b[0]) + abs(a[1] - b[1])
                    for a, b in zip(cents, new))
        cents = new
        if moved <= tol:
            break

    # the final assignment feeds two consumers (the min-id relabel and
    # the output join) — materialize it once AND truncate the lineage:
    # localCheckpoint leaves downstream consumers a leaf-sized logical
    # plan instead of re-optimizing the whole scan+assign tree on every
    # action (standard practice for iterative fixed points — same
    # cadence as PageRank/BPE here).
    assigned = pts.withColumn("__c", _assign(cents)).localCheckpoint()
    relabel = assigned.groupBy("__c").agg(F.min("id").alias("cluster"))
    out = (assigned.join(F.broadcast(relabel), "__c")
           .select(F.col("id").alias(id_col), "cluster"))
    from .cache import pin
    return pin(out, pts)
