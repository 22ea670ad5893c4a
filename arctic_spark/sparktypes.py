"""Spark-side geometry type.

Geometry is a first-class nested Spark SQL struct (GeoArrow-inspired —
SURVEY §1.2 maps the reference's encodings to Spark nested types):

    GEOM: struct<gt:int, xs:array<double>, ys:array<double>,
                 rings:array<int>, parts:array<int>>

- ``gt``    pygeos-compatible type id (reference enums.py:4-15)
- ``xs/ys`` all vertices, ring-concatenated; polygon rings closed
- ``rings`` vertex count per ring (or per linestring part)
- ``parts`` ring count per part (polygon: [n_rings]; multipoint: [1,1,...])

Missing geometry = NULL struct. GeometryCollection is not representable
(kept as WKB bytes; the reference's spatial index errors on it too).

Why a struct and not WKB-in-binary: every coordinate-level operation
(area, length, centroid, affine, point-in-polygon, projection) compiles to
Catalyst higher-order-function expressions over these arrays — JVM-side,
whole-stage-codegen'd, no Python worker round-trip. WKB remains the
interop boundary (parquet exchange, reference parity) via the numpy codec
in ``arctic_spark.geom.wkb``.
"""

from __future__ import annotations

from pyspark.sql import types as T

GEOM_FIELDS = [
    T.StructField("gt", T.IntegerType()),
    T.StructField("xs", T.ArrayType(T.DoubleType())),
    T.StructField("ys", T.ArrayType(T.DoubleType())),
    T.StructField("rings", T.ArrayType(T.IntegerType())),
    T.StructField("parts", T.ArrayType(T.IntegerType())),
]

GEOM_TYPE = T.StructType(GEOM_FIELDS)

GEOM_DDL = ("struct<gt:int,xs:array<double>,ys:array<double>,"
            "rings:array<int>,parts:array<int>>")

# r12 (VERDICT r11 #4): the Z-carrying variant — one extra nullable
# ``zs`` array, ring-concatenated like xs/ys; NULL zs on a cell means
# the source geometry was 2D. The 2D kernels stay the engine's compute
# surface (predicates are planar, like the reference's); the Z struct
# exists so WKB Z survives ingest→export instead of being dropped.
# Field access by name means every 2D kernel also analyzes against the
# 6-field shape; ops that REBUILD geometry emit 2D (documented), and
# st.force_2d converts explicitly.
GEOM_FIELDS_Z = GEOM_FIELDS + [
    T.StructField("zs", T.ArrayType(T.DoubleType())),
]

GEOM_TYPE_Z = T.StructType(GEOM_FIELDS_Z)

GEOM_DDL_Z = ("struct<gt:int,xs:array<double>,ys:array<double>,"
              "rings:array<int>,parts:array<int>,zs:array<double>>")


def is_geom_type(dt: T.DataType) -> bool:
    if not isinstance(dt, T.StructType):
        return False
    names = [f.name for f in dt.fields]
    return names == ["gt", "xs", "ys", "rings", "parts"] or \
        names == ["gt", "xs", "ys", "rings", "parts", "zs"]
