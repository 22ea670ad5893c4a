"""Pure-numpy geometry core: ragged representation, WKB/WKT codecs,
algorithm kernels. No Spark imports here — usable standalone and inside
pandas UDF workers."""

from .ragged import (GEOMETRYCOLLECTION, LINEARRING, LINESTRING, MISSING,
                     MULTILINESTRING, MULTIPOINT, MULTIPOLYGON, POINT,
                     POLYGON, TYPE_NAMES, RaggedGeometry)

__all__ = [
    "RaggedGeometry", "TYPE_NAMES", "MISSING", "POINT", "LINESTRING",
    "LINEARRING", "POLYGON", "MULTIPOINT", "MULTILINESTRING", "MULTIPOLYGON",
    "GEOMETRYCOLLECTION",
]
