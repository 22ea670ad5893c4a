"""Typed error surface, mirroring the reference's hierarchy
(geopolars-geo/src/error.rs:9-28 GeopolarsError::{MismatchedGeometry,
ProjCreateError, ProjError, PolarsError}; python classes
py-geopolars/src/error.rs:52-59)."""

from __future__ import annotations


class ArcticSparkError(Exception):
    """Base error for the engine."""


class MismatchedGeometryError(ArcticSparkError, ValueError):
    """Operation applied to an incompatible geometry type."""


class ComputeError(ArcticSparkError, RuntimeError):
    """Kernel-level computation failure."""


# Re-exported concrete errors (defined next to their subsystems):
from .geom.wkb import WKBError  # noqa: E402
from .proj import CRSError  # noqa: E402

__all__ = ["ArcticSparkError", "MismatchedGeometryError", "ComputeError",
           "WKBError", "CRSError"]
