"""CRS reprojection as native Catalyst expressions.

The reference reprojects through PROJ (geopolars-geo/src/ops/proj.rs:33-70:
one transformer per column, then a per-geometry decode→transform→reencode
loop). This container has no PROJ/pyproj, so the engine implements the
projection math directly as closed-form Spark SQL expressions over the
GEOM struct's coordinate arrays — the transform runs JVM-side inside
whole-stage codegen, per-coordinate, with no Python worker at all.

Expression-engineering note: Catalyst has no common-subexpression *tree*
sharing at construction time, so naive fixed-point iterations (Newton for
the inverse projections) would square the expression tree each round.
Two tools keep every tree linear:

- ``_let(e, f)`` binds ``e`` once as a lambda variable:
  ``transform(array(e), x -> f(x))[1]``;
- iterations run inside ``aggregate(sequence(1, n), x0, step)`` where the
  accumulator is a lambda variable, so each round adds O(1) nodes.

Supported CRS families (registry at the bottom):
- EPSG:4326 geographic lon/lat (the hub — src→lonlat→dst)
- EPSG:3857 / 900913 Web Mercator (spherical)
- EPSG:326xx / 327xx WGS84 UTM zones north/south (transverse Mercator,
  Krüger order-6 series, sub-mm vs PROJ)
- EPSG:269xx NAD83 UTM zones (GRS80 ≈ WGS84 well below series error)
- EPSG:2263 NAD83 / New York Long Island (ftUS) — Lambert conformal
  conic 2SP (the reference's nybb fixture CRS, FIXTURES.md F4)

Unknown codes raise ``CRSError`` eagerly on the driver, mirroring the
reference's ProjCreateError (geopolars-geo/src/error.rs:9-28).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from .functions.native import _g, _valid, geom_struct

# WGS84 / GRS80 (flattening difference < 1e-10 — treated as equal)
_A = 6378137.0
_F = 1 / 298.257223563
_E2 = _F * (2 - _F)
_E = math.sqrt(_E2)


class CRSError(ValueError):
    pass


def _let(col: Column, fn) -> Column:
    """Bind `col` once as a lambda variable (Catalyst 'let')."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def _xy(x: Column, y: Column) -> Column:
    return F.struct(x.alias("x"), y.alias("y"))


def _norm(crs) -> str:
    if isinstance(crs, int):
        return f"EPSG:{crs}"
    s = str(crs).upper().replace(" ", "")
    if s.isdigit():
        return f"EPSG:{s}"
    return s


# ---------------------------------------------------------------------------
# Web Mercator (EPSG:3857) — spherical, closed form
# ---------------------------------------------------------------------------

def _webmerc_fwd(lon, lat) -> Column:
    return _xy(F.lit(_A) * F.radians(lon),
               F.lit(_A) * F.log(F.tan(F.lit(math.pi / 4)
                                       + F.radians(lat) / 2)))


def _webmerc_inv(x, y) -> Column:
    return _xy(F.degrees(x / F.lit(_A)),
               F.degrees(F.lit(2.0) * F.atan(F.exp(y / F.lit(_A)))
                         - F.lit(math.pi / 2)))


# ---------------------------------------------------------------------------
# Transverse Mercator (UTM) — Krüger series, order 6
# ---------------------------------------------------------------------------

_N_ = _F / (2 - _F)  # third flattening
_N2, _N3, _N4, _N5, _N6 = _N_**2, _N_**3, _N_**4, _N_**5, _N_**6
_A_CAP = _A / (1 + _N_) * (1 + _N2 / 4 + _N4 / 64 + _N6 / 256)
_ALPHA = [
    _N_ / 2 - 2 * _N2 / 3 + 5 * _N3 / 16 + 41 * _N4 / 180 - 127 * _N5 / 288,
    13 * _N2 / 48 - 3 * _N3 / 5 + 557 * _N4 / 1440 + 281 * _N5 / 630,
    61 * _N3 / 240 - 103 * _N4 / 140 + 15061 * _N5 / 26880,
    49561 * _N4 / 161280 - 179 * _N5 / 168,
    34729 * _N5 / 80640,
]
_BETA = [
    _N_ / 2 - 2 * _N2 / 3 + 37 * _N3 / 96 - 1 * _N4 / 360 - 81 * _N5 / 512,
    _N2 / 48 + _N3 / 15 - 437 * _N4 / 1440 + 46 * _N5 / 105,
    17 * _N3 / 480 - 37 * _N4 / 840 - 209 * _N5 / 4480,
    4397 * _N4 / 161280 - 11 * _N5 / 504,
    4583 * _N5 / 161280,
]
_K0_UTM = 0.9996


def _atanh(x):
    return F.lit(0.5) * F.log((F.lit(1.0) + x) / (F.lit(1.0) - x))


def _tm_fwd(lon, lat, lon0, k0, fe, fn) -> Column:
    phi = F.radians(lat)
    lam = F.radians(lon) - F.lit(math.radians(lon0))
    t = F.sinh(_atanh(F.sin(phi))
               - F.lit(_E) * _atanh(F.lit(_E) * F.sin(phi)))
    # bind (t, lam) once, then (xi, eta) once
    def with_t(s):
        xi = F.atan2(s["t"], F.cos(s["lam"]))
        eta = _atanh(F.sin(s["lam"]) / F.sqrt(F.lit(1.0) + s["t"] * s["t"]))
        def with_xieta(u):
            x = u["eta"]
            y = u["xi"]
            for j, a in enumerate(_ALPHA, start=1):
                x = x + F.lit(a) * F.cos(F.lit(2.0 * j) * u["xi"]) \
                    * F.sinh(F.lit(2.0 * j) * u["eta"])
                y = y + F.lit(a) * F.sin(F.lit(2.0 * j) * u["xi"]) \
                    * F.cosh(F.lit(2.0 * j) * u["eta"])
            return _xy(F.lit(fe) + F.lit(k0 * _A_CAP) * x,
                       F.lit(fn) + F.lit(k0 * _A_CAP) * y)
        return _let(F.struct(xi.alias("xi"), eta.alias("eta")), with_xieta)
    return _let(F.struct(t.alias("t"), lam.alias("lam")), with_t)


def _tm_inv(x, y, lon0, k0, fe, fn) -> Column:
    xi = (y - F.lit(fn)) / F.lit(k0 * _A_CAP)
    eta = (x - F.lit(fe)) / F.lit(k0 * _A_CAP)

    def with_xieta(u):
        xip = u["xi"]
        etap = u["eta"]
        for j, b in enumerate(_BETA, start=1):
            xip = xip - F.lit(b) * F.sin(F.lit(2.0 * j) * u["xi"]) \
                * F.cosh(F.lit(2.0 * j) * u["eta"])
            etap = etap - F.lit(b) * F.cos(F.lit(2.0 * j) * u["xi"]) \
                * F.sinh(F.lit(2.0 * j) * u["eta"])

        def with_prime(p):
            chi = F.asin(F.sin(p["xip"]) / F.cosh(p["etap"]))

            def with_chi(c):
                # conformal → geodetic: tau/tau' Newton (Karney 2011 §3),
                # run inside aggregate so the tree stays linear
                def step(tau, _i):
                    sigma = F.sinh(F.lit(_E) * _atanh(
                        F.lit(_E) * tau / F.sqrt(F.lit(1.0) + tau * tau)))
                    taup = (tau * F.sqrt(F.lit(1.0) + sigma * sigma)
                            - sigma * F.sqrt(F.lit(1.0) + tau * tau))
                    dtau = ((F.tan(c) - taup)
                            * (F.lit(1.0) + F.lit(1 - _E2) * tau * tau)
                            / (F.lit(1 - _E2)
                               * F.sqrt((F.lit(1.0) + taup * taup)
                                        * (F.lit(1.0) + tau * tau))))
                    return tau + dtau

                tau = F.aggregate(F.sequence(F.lit(1), F.lit(5)),
                                  F.tan(c), lambda acc, i: step(acc, i))
                lon = (F.lit(float(lon0))
                       + F.degrees(F.atan2(F.sinh(p["etap"]),
                                           F.cos(p["xip"]))))
                return _xy(lon, F.degrees(F.atan(tau)))
            return _let(chi, with_chi)
        return _let(F.struct(xip.alias("xip"), etap.alias("etap")),
                    with_prime)
    return _let(F.struct(xi.alias("xi"), eta.alias("eta")), with_xieta)


# ---------------------------------------------------------------------------
# Lambert Conformal Conic (2SP) — e.g. EPSG:2263
# ---------------------------------------------------------------------------

_FT_US = 1200.0 / 3937.0  # US survey foot in meters


def _lcc_consts(p):
    def m(phi):
        return math.cos(phi) / math.sqrt(1 - _E2 * math.sin(phi) ** 2)

    def t(phi):
        return (math.tan(math.pi / 4 - phi / 2)
                / ((1 - _E * math.sin(phi))
                   / (1 + _E * math.sin(phi))) ** (_E / 2))

    p1, p2, p0 = map(math.radians, (p["lat1"], p["lat2"], p["lat0"]))
    n = ((math.log(m(p1)) - math.log(m(p2)))
         / (math.log(t(p1)) - math.log(t(p2))))
    big_f = m(p1) / (n * t(p1) ** n)
    rho0 = _A * big_f * t(p0) ** n
    return n, big_f, rho0, math.radians(p["lon0"])


def _lcc_fwd(lon, lat, p) -> Column:
    """fe/fn and output are in the CRS's native unit (p['unit'] meters per
    unit); rho math is in meters."""
    n, big_f, rho0, lam0 = _lcc_consts(p)
    unit = p["unit"]
    phi = F.radians(lat)
    tcol = (F.tan(F.lit(math.pi / 4) - phi / 2)
            / F.pow((F.lit(1.0) - F.lit(_E) * F.sin(phi))
                    / (F.lit(1.0) + F.lit(_E) * F.sin(phi)), F.lit(_E / 2)))
    rho = F.lit(_A * big_f) * F.pow(tcol, F.lit(n))
    th = F.lit(n) * (F.radians(lon) - F.lit(lam0))

    def with_rho_th(s):
        x = s["rho"] * F.sin(s["th"]) / F.lit(unit) + F.lit(p["fe"])
        y = ((F.lit(rho0) - s["rho"] * F.cos(s["th"])) / F.lit(unit)
             + F.lit(p["fn"]))
        return _xy(x, y)
    return _let(F.struct(rho.alias("rho"), th.alias("th")), with_rho_th)


def _lcc_inv(x, y, p) -> Column:
    n, big_f, rho0, lam0 = _lcc_consts(p)
    unit = p["unit"]
    xm = (x - F.lit(p["fe"])) * F.lit(unit)
    ym = (y - F.lit(p["fn"])) * F.lit(unit)

    def with_xy(s):
        rho_s = F.sqrt(s["xm"] * s["xm"]
                       + (F.lit(rho0) - s["ym"]) * (F.lit(rho0) - s["ym"]))
        rho_s = F.when(F.lit(n) < 0, -rho_s).otherwise(rho_s)
        tp = F.pow(rho_s / F.lit(_A * big_f), F.lit(1.0 / n))
        th = F.atan2(s["xm"], F.lit(rho0) - s["ym"])

        def with_tp(tpv):
            # fixed-point latitude iteration, linear tree via aggregate
            def step(phi, _i):
                return (F.lit(math.pi / 2)
                        - F.lit(2.0) * F.atan(tpv * F.pow(
                            (F.lit(1.0) - F.lit(_E) * F.sin(phi))
                            / (F.lit(1.0) + F.lit(_E) * F.sin(phi)),
                            F.lit(_E / 2))))
            phi0 = F.lit(math.pi / 2) - F.lit(2.0) * F.atan(tpv)
            phi = F.aggregate(F.sequence(F.lit(1), F.lit(6)), phi0,
                              lambda acc, i: step(acc, i))
            lon = F.degrees(th / F.lit(n) + F.lit(lam0))
            return _xy(lon, F.degrees(phi))
        return _let(tp, with_tp)
    return _let(F.struct(xm.alias("xm"), ym.alias("ym")), with_xy)


# EPSG:2263 NAD83 / New York Long Island (ftUS): Lambert CC 2SP;
# FE = 984250 ftUS (= 300000 m), FN = 0
_EPSG_2263 = {
    "lat1": 41.03333333333333, "lat2": 40.66666666666666,
    "lat0": 40.16666666666666, "lon0": -74.0,
    "fe": 984250.0, "fn": 0.0, "unit": _FT_US,
}


# ---------------------------------------------------------------------------
# registry + dispatch
# ---------------------------------------------------------------------------

def _parse_crs(crs):
    c = _norm(crs)
    if c in ("EPSG:4326", "CRS84", "OGC:CRS84", "WGS84"):
        return "lonlat", None
    if c in ("EPSG:3857", "EPSG:900913", "EPSG:3785"):
        return "webmerc", None
    if c.startswith("EPSG:"):
        try:
            code = int(c[5:])
        except ValueError:
            raise CRSError(f"bad CRS {crs!r}")
        if 32601 <= code <= 32660:
            return "utm", (6 * (code - 32600) - 183, 0.0)
        if 32701 <= code <= 32760:
            return "utm", (6 * (code - 32700) - 183, 10_000_000.0)
        if 26901 <= code <= 26923:  # NAD83 UTM north
            return "utm", (6 * (code - 26900) - 183, 0.0)
        if code == 2263:
            return "lcc", _EPSG_2263
    raise CRSError(f"unsupported CRS {crs!r}; supported: EPSG:4326, "
                   "EPSG:3857, UTM (EPSG:326xx/327xx/269xx), EPSG:2263")


def _inv_struct(kind, params, x, y) -> Column:
    """(x, y) in `kind` CRS → struct<x:lon, y:lat>."""
    if kind == "lonlat":
        return _xy(x * F.lit(1.0), y * F.lit(1.0))
    if kind == "webmerc":
        return _webmerc_inv(x, y)
    if kind == "utm":
        lon0, fn = params
        return _tm_inv(x, y, lon0, _K0_UTM, 500_000.0, fn)
    if kind == "lcc":
        return _lcc_inv(x, y, params)
    raise AssertionError(kind)


def _fwd_struct(kind, params, lon, lat) -> Column:
    if kind == "lonlat":
        return _xy(lon * F.lit(1.0), lat * F.lit(1.0))
    if kind == "webmerc":
        return _webmerc_fwd(lon, lat)
    if kind == "utm":
        lon0, fn = params
        return _tm_fwd(lon, lat, lon0, _K0_UTM, 500_000.0, fn)
    if kind == "lcc":
        return _lcc_fwd(lon, lat, params)
    raise AssertionError(kind)


def transform_xy_struct(x, y, from_crs, to_crs) -> Column:
    """struct<x,y> of the transformed coordinate pair."""
    fk, fp = _parse_crs(from_crs)
    tk, tp = _parse_crs(to_crs)
    ll = _inv_struct(fk, fp, x, y)
    return _let(ll, lambda s: _fwd_struct(tk, tp, s["x"], s["y"]))


def transform_xy(x, y, from_crs, to_crs):
    """(x', y') column pair (builds the struct once per output — prefer
    transform_xy_struct when you need both)."""
    s = transform_xy_struct(x, y, from_crs, to_crs)
    return s["x"], s["y"]


def transform_geom(g, from_crs, to_crs) -> Column:
    """Reproject every coordinate of a GEOM column — the engine's
    `to_crs` kernel (reference ops/proj.rs:46-70 semantics: point-wise,
    'no notion of projecting entire geometries', geoseries.py:228-232)."""
    g = _g(g)
    fk, fp = _parse_crs(from_crs)
    tk, tp = _parse_crs(to_crs)
    if (fk, fp) == (tk, tp):
        return g

    pts = F.zip_with(
        g["xs"], g["ys"],
        lambda px, py: _let(_inv_struct(fk, fp, px, py),
                            lambda s: _fwd_struct(tk, tp, s["x"], s["y"])))

    def with_pts(p):
        return geom_struct(g["gt"],
                           F.transform(p, lambda q: q["x"]),
                           F.transform(p, lambda q: q["y"]),
                           g["rings"], g["parts"])

    return F.when(_valid(g), _let(pts, with_pts))
