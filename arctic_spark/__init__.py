"""arctic_spark — PySpark-native geospatial + data-pipeline engine.

A from-scratch, Spark-first implementation of the capabilities of the
reference engine (GeoPolars, studied read-only at /root/reference):
geometry as a first-class nested Spark SQL struct, operators as Catalyst
higher-order-function expressions with pandas-UDF fallbacks, a
distributed filter–refine spatial join, plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing).
"""

from .geodataframe import DEFAULT_GEO_COLUMN_NAME, GeoDataFrame
from . import functions as st
from .session import get_spark

__version__ = "0.1.0"


def version() -> str:
    """Reference: version() pyfunction (py-geopolars/src/api.rs:8-11)."""
    return __version__


def __getattr__(name):
    # lazy top-level exports (avoid importing joins/temporal at package
    # import time)
    if name in ("spatial_join", "sjoin", "dwithin_join", "nearest_join",
                "sjoin_nearest", "estimate_cell_size", "overlay"):
        from . import joins
        return getattr(joins, name)
    if name in ("from_arrow", "to_arrow", "from_geopandas",
                "from_pandas_wkb", "to_pandas_wkb", "to_geopandas"):
        from . import geodataframe
        return getattr(geodataframe, name)
    if name in ("cluster_within", "cluster_dbscan", "cluster_kmeans"):
        from . import clustering
        return getattr(clustering, name)
    if name in ("sessionize", "session_stats", "make_trajectories"):
        from . import temporal
        return getattr(temporal, name)
    if name in ("salted_join", "skewed_keys", "bloom_semi_filter",
                "build_bloom", "bloom_filter_expr"):
        from . import relational
        return getattr(relational, name)
    if name == "asof_join":
        from .temporal import asof_join
        return asof_join
    if name == "range_join":
        from .temporal import range_join
        return range_join
    if name == "release":
        from .cache import release
        return release
    if name == "register_sql_functions":
        from .sql import register_sql_functions
        return register_sql_functions
    if name == "sketches":
        # NOT `from . import sketches`: _handle_fromlist asks the
        # package for the attribute first, which re-enters this
        # __getattr__ and recurses forever
        import importlib
        return importlib.import_module(".sketches", __name__)
    if name in ("hll_sketch", "hll_merge", "hll_estimate",
                "hll_estimate_by", "kmv_sketch", "kmv_merge",
                "kmv_estimate", "kmv_jaccard", "cms_sketch",
                "cms_merge", "cms_query"):
        import importlib
        return getattr(importlib.import_module(".sketches", __name__),
                       name)
    if name in ("write_bucketed", "write_geoparquet", "read_geoparquet",
                "from_wkt_df", "read_geojson", "write_geojson",
                "read_shapefile", "read_geopackage",
                "write_geopackage", "read_flatgeobuf",
                "write_flatgeobuf", "read_file",
                "read_kml", "write_kml", "read_gpx", "read_gml",
                "read_ipc", "write_ipc", "write_file", "read_files",
                "write_files", "list_layers"):
        from . import io
        return getattr(io, name)
    raise AttributeError(name)


__all__ = ["GeoDataFrame", "st", "get_spark", "version",
           "DEFAULT_GEO_COLUMN_NAME", "spatial_join", "sjoin",
           "dwithin_join", "nearest_join", "sjoin_nearest", "asof_join",
           "cluster_within", "cluster_dbscan",
           "range_join", "release", "register_sql_functions", "overlay",
           "sessionize", "session_stats", "make_trajectories",
           "salted_join", "skewed_keys", "bloom_semi_filter",
           "from_arrow", "to_arrow", "from_geopandas", "from_pandas_wkb",
           "to_pandas_wkb", "to_geopandas", "write_bucketed",
           "write_geoparquet",
           "read_geoparquet", "from_wkt_df", "read_geojson",
           "write_geojson", "read_shapefile", "read_geopackage",
           "write_geopackage", "read_flatgeobuf", "write_flatgeobuf",
           "sketches", "hll_sketch", "hll_merge", "hll_estimate",
           "hll_estimate_by", "kmv_sketch", "kmv_merge", "kmv_estimate",
           "kmv_jaccard", "cms_sketch", "cms_merge", "cms_query",
           "read_file", "read_kml", "write_kml", "read_gpx", "read_gml",
           "read_ipc", "write_ipc", "write_file", "read_files",
           "write_files", "list_layers"]
