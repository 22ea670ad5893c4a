"""Karney geodesic inverse on the WGS84 ellipsoid — vectorized numpy.

Implements the inverse problem of C. F. F. Karney, "Algorithms for
geodesics", J. Geodesy 87, 43-55 (2013) — public-domain mathematics —
using the auxiliary-sphere formulation with 6th-order series for the
distance (I1: A1/C1, eqs 15-18) and longitude (I3: A3/C3, eqs 23-25)
integrals.

Root finding: after canonicalizing (β1 ≤ 0, β1 ≤ β2 ≤ −β1,
0 ≤ λ12 ≤ π — the symmetries of §4), the reduced longitude λ12(α1) is a
monotonically increasing function of the departure azimuth α1 ∈ [0, π]
(Karney §4), so the solver is a fixed-depth VECTORIZED BISECTION on α1
— unconditionally convergent (no Newton divergence, no astroid starting
guess needed), ~60 iterations of cheap ufuncs over the whole batch.
Accuracy is limited by the 6th-order series: ~1e-9 m mid-range and well
under 1e-6 m relative everywhere, matching Vincenty to sub-millimeter
where Vincenty converges and remaining correct in the near-antipodal
region where Vincenty fails.

The reference names 'geodesic' as a distinct method from 'vincenty'
(py-geopolars/src/geo.rs:61-78 via geo's Geodesic trait, which wraps
the same Karney algorithm); round 6 makes that true here as well.
"""

from __future__ import annotations

import numpy as np

_A = 6378137.0
_F = 1.0 / 298.257223563
_B = _A * (1.0 - _F)
_E2 = _F * (2.0 - _F)              # first eccentricity squared
_EP2 = _E2 / (1.0 - _E2)           # second eccentricity squared
_N = _F / (2.0 - _F)               # third flattening


def _i1_coeffs(eps):
    """A1 and C1[1..6] of the distance integral (Karney eqs 17-18)."""
    e2 = eps * eps
    a1 = (1.0 + e2 * (1.0 / 4.0 + e2 * (1.0 / 64.0 + e2 / 256.0))) \
        / (1.0 - eps)
    c1 = [
        eps * (-1.0 / 2.0 + e2 * (3.0 / 16.0 - e2 / 32.0)),
        e2 * (-1.0 / 16.0 + e2 * (1.0 / 32.0 - 9.0 * e2 / 2048.0)),
        eps * e2 * (-1.0 / 48.0 + e2 * (3.0 / 256.0)),
        e2 * e2 * (-5.0 / 512.0 + e2 * (3.0 / 512.0)),
        eps * e2 * e2 * (-7.0 / 1280.0),
        e2 * e2 * e2 * (-7.0 / 2048.0),
    ]
    return a1, c1


def _i3_coeffs(eps):
    """A3 and C3[1..5] of the longitude integral (Karney eqs 24-25),
    series in eps with coefficients polynomial in the third
    flattening n."""
    n = _N
    a3 = (1.0
          - eps * ((1.0 / 2.0 - n / 2.0)
                   + eps * ((1.0 / 4.0 + n / 8.0 - 3.0 * n * n / 8.0)
                   + eps * ((1.0 / 16.0 + 3.0 * n / 16.0 + n * n / 16.0)
                   + eps * ((3.0 / 64.0 + n / 32.0)
                   + eps * (3.0 / 128.0))))))
    c3 = [
        eps * ((1.0 / 4.0 - n / 4.0)
               + eps * ((1.0 / 8.0 - n * n / 8.0)
               + eps * ((3.0 / 64.0 + 3.0 * n / 64.0 - n * n / 64.0)
               + eps * ((5.0 / 128.0 + n / 64.0)
               + eps * (3.0 / 128.0))))),
        eps * eps * ((1.0 / 16.0 - 3.0 * n / 32.0 + n * n / 32.0)
                     + eps * ((3.0 / 64.0 - n / 32.0 - 3.0 * n * n / 64.0)
                     + eps * ((3.0 / 128.0 + n / 128.0)
                     + eps * (5.0 / 256.0)))),
        eps ** 3 * ((5.0 / 192.0 - 3.0 * n / 64.0 + 5.0 * n * n / 192.0)
                    + eps * ((3.0 / 128.0 - 5.0 * n / 192.0)
                    + eps * (7.0 / 512.0))),
        eps ** 4 * ((7.0 / 512.0 - 7.0 * n / 256.0)
                    + eps * (7.0 / 512.0)),
        eps ** 5 * (21.0 / 2560.0),
    ]
    return a3, c3


def _sin_series(sigma, coeffs):
    """Σ_l coeffs[l-1]·sin(2·l·σ) (vectorized; coeffs are arrays)."""
    out = np.zeros_like(sigma)
    for l, c in enumerate(coeffs, start=1):
        out = out + c * np.sin(2.0 * l * sigma)
    return out


def _lambda12_and_s(beta1, beta2, alpha1, want_s=False):
    """The 'hybrid' evaluation (Karney §4): given reduced latitudes and
    the departure azimuth α1, return the longitude difference λ12 (and
    the geodesic distance s12 when want_s)."""
    sb1, cb1 = np.sin(beta1), np.cos(beta1)
    sb2, cb2 = np.sin(beta2), np.cos(beta2)
    sa1, ca1 = np.sin(alpha1), np.cos(alpha1)
    sin_a0 = sa1 * cb1
    cos2_a0 = 1.0 - sin_a0 * sin_a0
    # first point's arc position from the equator node
    sigma1 = np.arctan2(sb1, cb1 * ca1)
    # forward (northbound) crossing of latitude β2: cosα2 ≥ 0
    ca2 = np.sqrt(np.maximum(ca1 * ca1 * cb1 * cb1
                             + (cb2 * cb2 - cb1 * cb1), 0.0)) \
        / np.where(cb2 > 0, cb2, 1.0)
    sigma2 = np.arctan2(sb2, cb2 * ca2)
    omega1 = np.arctan2(sin_a0 * np.sin(sigma1), np.cos(sigma1))
    omega2 = np.arctan2(sin_a0 * np.sin(sigma2), np.cos(sigma2))
    k2 = _EP2 * cos2_a0
    sq = np.sqrt(1.0 + k2)
    eps = (sq - 1.0) / (sq + 1.0)
    a3, c3 = _i3_coeffs(eps)
    i3_2 = a3 * (sigma2 + _sin_series(sigma2, c3))
    i3_1 = a3 * (sigma1 + _sin_series(sigma1, c3))
    lam12 = (omega2 - omega1) - _F * sin_a0 * (i3_2 - i3_1)
    if not want_s:
        return lam12, None
    a1, c1 = _i1_coeffs(eps)
    s12 = _B * a1 * ((sigma2 - sigma1)
                     + (_sin_series(sigma2, c1) - _sin_series(sigma1, c1)))
    return lam12, s12


def inverse(lon1, lat1, lon2, lat2, iters=64):
    """Geodesic distances in meters between lon/lat degree arrays
    (Karney inverse, WGS84). Fully vectorized; unconditionally
    convergent, including antipodal and near-antipodal pairs."""
    lon1 = np.asarray(lon1, float)
    shape = lon1.shape
    lon1 = lon1.ravel()
    lat1 = np.asarray(lat1, float).ravel()
    lon2 = np.asarray(lon2, float).ravel()
    lat2 = np.asarray(lat2, float).ravel()
    phi1 = np.radians(lat1)
    phi2 = np.radians(lat2)
    lam12 = np.radians(lon2 - lon1)
    # wrap to [-pi, pi], then use |λ| (symmetry); remember coincidence
    lam12 = np.arctan2(np.sin(lam12), np.cos(lam12))
    lam_abs = np.abs(lam12)
    beta1 = np.arctan((1.0 - _F) * np.tan(phi1))
    beta2 = np.arctan((1.0 - _F) * np.tan(phi2))
    # canonical arrangement (Karney §4): swap so |β1| ≥ |β2|, then
    # negate so β1 ≤ 0  (distance is invariant under both symmetries)
    swap = np.abs(beta1) < np.abs(beta2)
    b1 = np.where(swap, beta2, beta1)
    b2 = np.where(swap, beta1, beta2)
    flip = b1 > 0
    b1 = np.where(flip, -b1, b1)
    b2 = np.where(flip, -b2, b2)
    # exactly-equatorial pairs within the equatorial lune follow the
    # equator (s = a·λ); outside it the geodesic leaves the equator —
    # nudge β1 infinitesimally so the general solver takes over
    # (perturbation error « 1e-6 m)
    equatorial = (b1 == 0.0) & (b2 == 0.0)
    eq_short = equatorial & (lam_abs <= (1.0 - _F) * np.pi)
    b1 = np.where(equatorial & ~eq_short, -1e-12, b1)
    # bisection on α1 ∈ [0, π]: λ12(α1) is monotonically increasing
    lo = np.zeros_like(b1)
    hi = np.full_like(b1, np.pi)
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        lam_mid, _unused = _lambda12_and_s(b1, b2, mid)
        take_hi = lam_mid < lam_abs
        lo = np.where(take_hi, mid, lo)
        hi = np.where(take_hi, hi, mid)
    alpha1 = 0.5 * (lo + hi)
    _lam, s12 = _lambda12_and_s(b1, b2, alpha1, want_s=True)
    s12 = np.where(eq_short, _A * lam_abs, s12)
    coincident = (phi1 == phi2) & (lam12 == 0.0)
    s12 = np.where(coincident, 0.0, s12)
    return s12.reshape(shape)


def direct(lon1, lat1, az1, s12, iters=60):
    """Karney DIRECT problem on WGS84, vectorized: destination
    (lon2, lat2, az2) after travelling ``s12`` metres from lon/lat
    degrees on initial azimuth ``az1`` radians (clockwise from north).

    Same architecture as :func:`inverse`: the auxiliary-sphere
    formulation with the 6th-order I1/I3 series, and a fixed-depth
    VECTORIZED BISECTION in place of a series reversion — here on the
    arc position σ2, since I1(σ) is strictly increasing and
    σ2 − σ1 ≤ s/b bounds the bracket (the integrand of the distance
    integral is ≥ 1). Unconditionally convergent, no C1' reversion
    coefficients to mistype; accuracy matches the series (~1e-9 m).
    Negative distances travel the reciprocal azimuth."""
    lon1 = np.asarray(lon1, float)
    shape = lon1.shape
    lon1 = lon1.ravel()
    lat1 = np.asarray(lat1, float).ravel()
    az1 = np.asarray(az1, float).ravel()
    s12 = np.asarray(s12, float).ravel()
    neg = s12 < 0
    az1 = np.where(neg, az1 + np.pi, az1)
    s12 = np.abs(s12)

    phi1 = np.radians(lat1)
    beta1 = np.arctan((1.0 - _F) * np.tan(phi1))
    sa1, ca1 = np.sin(az1), np.cos(az1)
    sb1, cb1 = np.sin(beta1), np.cos(beta1)
    sin_a0 = sa1 * cb1
    cos2_a0 = np.maximum(1.0 - sin_a0 * sin_a0, 0.0)
    cos_a0 = np.sqrt(cos2_a0)
    sigma1 = np.arctan2(sb1, cb1 * ca1)
    omega1 = np.arctan2(sin_a0 * np.sin(sigma1), np.cos(sigma1))
    k2 = _EP2 * cos2_a0
    sq = np.sqrt(1.0 + k2)
    eps = (sq - 1.0) / (sq + 1.0)
    a1, c1 = _i1_coeffs(eps)

    target = a1 * (sigma1 + _sin_series(sigma1, c1)) + s12 / _B
    lo = sigma1.copy()
    hi = sigma1 + s12 / _B + 1e-9
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        val = a1 * (mid + _sin_series(mid, c1))
        take_hi = val < target
        lo = np.where(take_hi, mid, lo)
        hi = np.where(take_hi, hi, mid)
    sigma2 = 0.5 * (lo + hi)

    sb2 = cos_a0 * np.sin(sigma2)
    cb2 = np.hypot(sin_a0, cos_a0 * np.cos(sigma2))
    lat2 = np.degrees(np.arctan2(sb2, (1.0 - _F) * cb2))
    omega2 = np.arctan2(sin_a0 * np.sin(sigma2), np.cos(sigma2))
    a3, c3 = _i3_coeffs(eps)
    lam12 = (omega2 - omega1) - _F * sin_a0 * (
        a3 * (sigma2 + _sin_series(sigma2, c3))
        - a3 * (sigma1 + _sin_series(sigma1, c3)))
    lon2 = lon1 + np.degrees(lam12)
    lon2 = lon2 - 360.0 * np.floor((lon2 + 180.0) / 360.0)
    az2 = np.arctan2(sin_a0, cos_a0 * np.cos(sigma2))
    return (lon2.reshape(shape), lat2.reshape(shape),
            az2.reshape(shape))
