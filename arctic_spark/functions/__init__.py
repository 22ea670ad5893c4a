"""`st` — the engine's geospatial column-function namespace.

Usage::

    from arctic_spark import st
    df.withColumn("a", st.area("geometry"))

Mirrors the reference's operator surface (SURVEY §2.2 inventory;
py-geopolars GeoSeries methods, geopolars-geo/src/geoseries.rs:10-181)
as ordinary PySpark column functions. Native Catalyst expressions are
used wherever the math is data-parallel; Arrow-batched pandas UDFs only
for iterative algorithms and the WKB/WKT boundary.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import native, udfs
from .native import (affine_transform, area, bbox_intersects, boundary,
                     bounds, freeze,
                     centroid, contains_point, distance_points, dump_parts,
                     geom_equals_exact, geom_lit, has_z, interiors,
                     dwithin_points, envelope, exterior, geom_struct,
                     geom_type_id, geom_type_name, is_empty, is_ring,
                     make_envelope, make_line, make_polygon, num_parts,
                     point, rotate, scale, skew, total_bounds_agg, translate,
                     x, y)
from .udfs import (buffer, clip_by_rect, contains, convex_hull, distance,
                   ring_stats, line_ref_stats,
                   geodesic_length, geom_equals, is_simple, is_valid,
                   is_valid_reason, build_area, split, subdivide,
                   relate, relate_pattern, representative_point,
                   geom_from_wkb, geom_from_wkt, geom_to_wkb, geom_to_wkt,
                   from_geojson, to_geojson,
                   difference, intersection, intersects, simplify,
                   symmetric_difference, touches, crosses, overlaps, union,
                   hausdorff_distance, frechet_distance,
                   minimum_rotated_rectangle, minimum_bounding_radius,
                   minimum_bounding_circle, minimum_clearance,
                   maximum_inscribed_circle,
                   shortest_line, closest_point, longest_line,
                   max_distance,
                   line_merge, remove_repeated_points,
                   delaunay_triangles, voronoi_polygons, concave_hull,
                   polygonize, snap, shared_paths, offset_curve,
                   make_valid, normalize, node)
from .native import collect_agg, z
from .native import force_2d, point_z  # noqa: F401  (r12 Z surface)
from .native import (line_interpolate_point, line_locate_point,  # noqa: F401
                     line_substring, azimuth, reverse, segmentize)
# PostGIS ST_Project (forward/destination point). `st.project` stays the
# GeoPandas line-referencing alias below, so the destination-point ops get
# unambiguous names.
from .native import project_spherical  # noqa: F401
from .native import project as project_point  # noqa: F401
from .native import flip_coordinates, angle, dump_segments  # noqa: F401
from .udfs import project_geodesic  # noqa: F401  (Karney direct)
from .native import geom_zorder_key, zorder_key  # noqa: F401
from .native import geohash, geohash_decode, geom_geohash  # noqa: F401
from .native import hex_key, hex_center  # noqa: F401
from .native import extract_unique_points  # noqa: F401
from .native import collection_extract  # noqa: F401
from .native import (count_coordinates, count_geometries,  # noqa: F401
                     is_ccw, is_closed, orient_polygons, sample_points)

# GeoPandas naming aliases: GeoSeries.project == line_locate_point,
# GeoSeries.interpolate == line_interpolate_point
project = line_locate_point
interpolate = line_interpolate_point

# shapely/GEOS naming alias: oriented_envelope == minimum_rotated_rectangle
oriented_envelope = minimum_rotated_rectangle

# reference naming aliases (SURVEY §2.2)
length = native.length
euclidean_length = native.length
geom_type = geom_type_id
from .udfs import from_wkb  # noqa: F401  (force_2d-capable wrapper)
to_wkb = geom_to_wkb
from_wkt = geom_from_wkt
to_wkt = geom_to_wkt
as_text = geom_to_wkt
to_json = to_geojson


def explode_parts(df, geom_col="geometry", keep_index=False):
    """Row-expanding explode of multi-part geometries (reference trait
    `explode`, geoseries.rs:50): each part becomes its own row, part order
    preserved within parent, parent order overall. Uses the native
    part-dump + Spark's own generator, so the cardinality change is
    planned by Catalyst."""
    parts = F.posexplode(dump_parts(F.col(geom_col)))
    if keep_index:
        return df.select("*", parts.alias("part_index", "__part")) \
                 .drop(geom_col).withColumnRenamed("__part", geom_col)
    return df.select("*", F.explode(dump_parts(F.col(geom_col)))
                     .alias("__part")) \
             .drop(geom_col).withColumnRenamed("__part", geom_col)


__all__ = [
    "area", "length", "euclidean_length", "geodesic_length", "centroid",
    "convex_hull", "envelope", "exterior", "explode_parts", "dump_parts",
    "num_parts", "geom_type", "geom_type_id", "geom_type_name", "is_empty",
    "is_ring", "simplify", "affine_transform", "translate", "rotate",
    "scale", "skew", "distance", "distance_points", "dwithin_points", "x",
    "y", "point", "make_line", "make_polygon", "make_envelope", "bounds",
    "total_bounds_agg", "bbox_intersects", "contains_point", "intersects",
    "contains", "from_wkb", "to_wkb", "from_wkt", "to_wkt", "as_text",
    "geom_struct", "boundary", "interiors", "z", "has_z", "geom_equals",
    "geom_equals_exact",
    "clip_by_rect", "buffer", "representative_point", "ring_stats",
    "line_ref_stats",
    "is_simple",
    "is_valid", "disjoint", "within", "covers", "collect_agg",
    "unary_union",
    "touches", "crosses", "overlaps", "geom_almost_equals", "covered_by",
    "intersection", "difference", "union", "symmetric_difference",
    "relate", "relate_pattern", "freeze", "dwithin",
    "hausdorff_distance", "frechet_distance", "minimum_rotated_rectangle",
    "minimum_bounding_radius", "minimum_bounding_circle",
    "maximum_inscribed_circle", "shortest_line",
    "zorder_key", "geom_zorder_key", "line_merge",
    "remove_repeated_points", "delaunay_triangles",
    "voronoi_polygons", "concave_hull", "polygonize", "snap",
    "shared_paths", "offset_curve", "make_valid", "normalize", "node",
    "extract_unique_points", "collection_extract", "project",
    "line_substring", "azimuth", "split", "build_area", "subdivide",
    "project_point", "project_spherical", "project_geodesic",
    "flip_coordinates", "angle",
    "dump_segments", "closest_point", "longest_line", "max_distance",
]


def unary_union(g):
    """Aggregate: dissolve a group's polygons into one merged
    (Multi)Polygon — overlaps merged, interior boundaries removed, holes
    emitted where coverage vanishes (GeoPandas ``unary_union``; reference
    roadmap geoseries.rst:104-111). One collect_list shuffle, then the
    arrangement-union kernel runs per group executor-side. For the
    collect-without-dissolve variant (any geometry type), use
    ``collect_agg``."""
    return udfs.union_collected(F.collect_list(g))


def disjoint(g1, g2):
    """NOT intersects (reference roadmap geoseries.rst:49)."""
    return ~intersects(g1, g2)


def dwithin(g1, g2, distance):
    """Row-aligned distance predicate (GeoPandas ``dwithin``): geometries
    within ``distance`` of each other. Point/point pairs stay fully
    native (interval arithmetic, no Python); general pairs use the
    whole-batch vectorized distance kernel. For the JOIN formulation
    (all pairs within a radius) use ``arctic_spark.joins.dwithin_join``."""
    from .native import _g
    a, b = _g(g1), _g(g2)
    d = F.lit(float(distance))
    both_points = (a["gt"] == 0) & (b["gt"] == 0)
    return F.when(both_points, native.dwithin_points(a, b, d)) \
            .otherwise(distance_kernel(a, b) <= d)


distance_kernel = udfs.distance


def within(g1, g2):
    """g1 within g2 == contains(g2, g1) (rst:62)."""
    return contains(g2, g1)


def covers(g1, g2):
    """Boundary-inclusive containment (rst:63) — our contains kernel is
    already boundary-inclusive (documented deviation from GEOS
    `contains`, which excludes boundary-only cases)."""
    return contains(g1, g2)


def covered_by(g1, g2):
    return contains(g2, g1)


def geom_almost_equals(g1, g2, decimal: int = 6):
    """Coordinate equality to `decimal` places (reference roadmap
    rst:52 geom_almost_equals; same structural caveat as geom_equals)."""
    from .native import _g, _valid, _let
    a, b = _g(g1), _g(g2)
    tol = 0.5 * 10.0 ** (-decimal)

    def close(u, v):
        return F.aggregate(
            F.zip_with(u, v, lambda p, q: F.when(F.abs(p - q) <= tol,
                                                 F.lit(0)).otherwise(F.lit(1))),
            F.lit(0), lambda acc, x: acc + x) == 0

    return F.when(
        a.isNotNull() & b.isNotNull() & a["gt"].isNotNull()
        & b["gt"].isNotNull(),
        (a["gt"] == b["gt"]) & (F.size(a["xs"]) == F.size(b["xs"]))
        & (a["rings"] == b["rings"]) & (a["parts"] == b["parts"])
        & close(a["xs"], b["xs"]) & close(a["ys"], b["ys"]))
