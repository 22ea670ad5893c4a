"""GDAL-free OGC GeoPackage support (stdlib ``sqlite3`` + this
package's own WKB codec).

A GeoPackage is an SQLite database following the public OGC
GeoPackage Encoding Standard (https://www.geopackage.org/spec/):
feature layers are ordinary tables whose geometry column holds
*GeoPackageBinary* blobs — a small "GP" header (version, flags,
srs_id, optional envelope) followed by standard ISO WKB. The
reference engine reaches .gpkg only through GDAL/pyogrio
(io/file.py:15-119); this module decodes the format directly so the
§2.5 ``read_file`` long tail is exercisable in this container.

Only the feature-table profile is implemented (no tiles, no
extensions, no rtree use — the spatial index is an optional
extension and the distributed path is to convert to GeoParquet once
and scan that).
"""

from __future__ import annotations

import struct

MAGIC = b"GP"
_APPLICATION_ID = 0x47504B47     # 'GPKG'
_USER_VERSION = 10300            # GeoPackage 1.3.0

# envelope indicator (flags bits 1-3) → envelope byte length
_ENVELOPE_BYTES = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}


class GpkgError(ValueError):
    pass


def parse_gpkg_blob(blob):
    """GeoPackageBinary blob → (srs_id, wkb_bytes); None → None.

    Handles both header endiannesses, all envelope indicators, and
    the empty-geometry flag (bit 4 → returns ``(srs_id, None)``)."""
    if blob is None:
        return None
    b = bytes(blob)
    if len(b) < 8 or b[:2] != MAGIC:
        raise GpkgError("not a GeoPackageBinary blob (missing GP magic)")
    flags = b[3]
    if flags & 0b00100000:
        raise GpkgError("extended GeoPackageBinary (extension) "
                        "not supported")
    little = bool(flags & 0b00000001)
    env_ind = (flags >> 1) & 0b111
    if env_ind not in _ENVELOPE_BYTES:
        raise GpkgError(f"invalid envelope indicator {env_ind}")
    srs_id = struct.unpack("<i" if little else ">i", b[4:8])[0]
    off = 8 + _ENVELOPE_BYTES[env_ind]
    if flags & 0b00010000:            # empty-geometry flag
        return srs_id, None
    return srs_id, b[off:]


def make_gpkg_blob(wkb: bytes, srs_id: int = 0) -> bytes:
    """Standard WKB → GeoPackageBinary blob (little-endian header, no
    envelope — envelope is optional per spec)."""
    if wkb is None:
        return None
    return MAGIC + bytes([0, 0b00000001]) + struct.pack("<i", srs_id) \
        + bytes(wkb)


_SRS_DDL = """CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
  srs_name TEXT NOT NULL, srs_id INTEGER NOT NULL PRIMARY KEY,
  organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
  definition TEXT NOT NULL, description TEXT)"""

_CONTENTS_DDL = """CREATE TABLE IF NOT EXISTS gpkg_contents (
  table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
  identifier TEXT UNIQUE, description TEXT DEFAULT '',
  last_change DATETIME DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
  min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
  srs_id INTEGER)"""

_GEOMCOLS_DDL = """CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
  table_name TEXT NOT NULL, column_name TEXT NOT NULL,
  geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
  z TINYINT NOT NULL, m TINYINT NOT NULL,
  CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"""

# the three srs rows the spec requires every GeoPackage to carry
_DEFAULT_SRS = [
    ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
    ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
    ("WGS 84 geodetic", 4326, "EPSG", 4326,
     'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
     '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",'
     '0.0174532925199433]]', "WGS 84"),
]


def init_gpkg(con, srs_id: int = 4326, organization: str = "EPSG"):
    """Create the mandatory GeoPackage metadata tables (idempotent)."""
    con.execute(f"PRAGMA application_id = {_APPLICATION_ID}")
    con.execute(f"PRAGMA user_version = {_USER_VERSION}")
    con.execute(_SRS_DDL)
    con.execute(_CONTENTS_DDL)
    con.execute(_GEOMCOLS_DDL)
    for row in _DEFAULT_SRS:
        con.execute("INSERT OR IGNORE INTO gpkg_spatial_ref_sys "
                    "VALUES (?,?,?,?,?,?)", row)
    if srs_id not in (-1, 0, 4326):
        con.execute(
            "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES "
            "(?,?,?,?,?,?)",
            (f"{organization}:{srs_id}", srs_id, organization, srs_id,
             "undefined", None))


def feature_layers(con):
    """[(table_name, geometry_column, srs_id)] of the feature layers."""
    rows = con.execute(
        "SELECT c.table_name, g.column_name, g.srs_id "
        "FROM gpkg_contents c JOIN gpkg_geometry_columns g "
        "ON g.table_name = c.table_name "
        "WHERE c.data_type = 'features'").fetchall()
    return [(r[0], r[1], int(r[2])) for r in rows]


def srs_string(con, srs_id: int):
    """'EPSG:4326'-style CRS string for a srs_id (None if unknown)."""
    row = con.execute(
        "SELECT organization, organization_coordsys_id "
        "FROM gpkg_spatial_ref_sys WHERE srs_id = ?",
        (srs_id,)).fetchone()
    if row is None or row[0] is None or row[0].upper() == "NONE":
        return None
    return f"{row[0].upper()}:{row[1]}"
