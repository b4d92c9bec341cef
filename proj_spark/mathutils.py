"""Vectorized geodetic math primitives (NumPy, float64).

Each function re-expresses, in batch form, one of the scalar helpers the
reference's projection kernels share:

    pj_enfn / pj_mlfn / pj_inv_mlfn   src/mlfn.cpp:27,44,51
    pj_tsfn                            src/tsfn.cpp:6
    pj_msfn                            src/msfn.cpp
    pj_phi2                            src/phi2.cpp:12
    pj_qsfn                            src/qsfn.cpp:8
    adjlon                             src/adjlon.cpp:7
    gatg / clens / clenS (Clenshaw)    src/projections/tmerc.cpp:265-340

The formulas are classical (Snyder 1987; König & Weise 1951;
Engsager & Poder ICC 2007); iterative inverses run a fixed iteration
count with convergence masks so whole batches vectorize.
"""

from __future__ import annotations

import numpy as np

HALFPI = np.pi / 2.0
FORTPI = np.pi / 4.0
TWOPI = 2.0 * np.pi
# max |lat| - pi/2 overshoot accepted before declaring the input invalid
EPS_LAT = 1e-12


def adjlon(lon: np.ndarray) -> np.ndarray:
    """Wrap longitudes into (-pi, pi], tolerating a tiny dateline overshoot."""
    lon = np.asarray(lon, dtype=np.float64)
    needs = np.abs(lon) >= np.pi + 1e-12
    if not needs.any():
        return lon
    shifted = lon + np.pi
    wrapped = shifted - TWOPI * np.floor(shifted / TWOPI) - np.pi
    return np.where(needs, wrapped, lon)


# --- meridional arc -----------------------------------------------------

def enfn(es: float) -> np.ndarray:
    """Series coefficients for the meridional distance (8th degree)."""
    c00, c02, c04, c06, c08 = 1.0, 0.25, 0.046875, 0.01953125, 0.01068115234375
    c22, c44 = 0.75, 0.46875
    c46, c48 = 0.01302083333333333333, 0.00712076822916666666
    c66, c68 = 0.36458333333333333333, 0.00569661458333333333
    c88 = 0.3076171875
    es2 = es * es
    es3 = es2 * es
    return np.array(
        [
            c00 - es * (c02 + es * (c04 + es * (c06 + es * c08))),
            es * (c22 - es * (c04 + es * (c06 + es * c08))),
            es2 * (c44 - es * (c46 + es * c48)),
            es3 * (c66 - es * c68),
            es3 * es * c88,
        ]
    )


def mlfn(phi: np.ndarray, sphi: np.ndarray, cphi: np.ndarray, en: np.ndarray) -> np.ndarray:
    """Meridional distance from equator to latitude phi (in a-units)."""
    cs = cphi * sphi
    s2 = sphi * sphi
    return en[0] * phi - cs * (en[1] + s2 * (en[2] + s2 * (en[3] + s2 * en[4])))


def inv_mlfn(arg: np.ndarray, es: float, en: np.ndarray) -> np.ndarray:
    """Newton inversion of mlfn; fixed 10 iterations with a freeze mask."""
    k = 1.0 / (1.0 - es)
    phi = np.array(arg, dtype=np.float64, copy=True)
    done = np.zeros(phi.shape, dtype=bool)
    for _ in range(10):
        s = np.sin(phi)
        t = 1.0 - es * s * s
        step = (mlfn(phi, s, np.cos(phi), en) - arg) * (t * np.sqrt(t)) * k
        phi = np.where(done, phi, phi - step)
        done |= np.abs(step) < 1e-11
        if done.all():
            break
    return phi


# --- conformal helpers --------------------------------------------------

def tsfn(phi: np.ndarray, sinphi: np.ndarray, e: float) -> np.ndarray:
    """exp(-isometric latitude); the conformal 'small t'."""
    esin = e * sinphi
    denom = 1.0 + esin
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.tan(0.5 * (HALFPI - phi)) / np.power((1.0 - esin) / denom, 0.5 * e)
    return np.where(denom == 0.0, np.inf, out)


def msfn(sinphi: np.ndarray, cosphi: np.ndarray, es: float) -> np.ndarray:
    """Radius of the parallel circle scaled to the ellipsoid ('small m')."""
    return cosphi / np.sqrt(1.0 - es * sinphi * sinphi)


def phi2(ts: np.ndarray, e: float) -> np.ndarray:
    """Invert tsfn: latitude from exp(-isometric lat), Snyder (7-9)..(7-11).

    Fixed-count iteration (15) with convergence masks, matching the
    reference's tolerance of 1e-10 rad.
    """
    eccnth = 0.5 * e
    phi = HALFPI - 2.0 * np.arctan(ts)
    done = np.zeros(phi.shape, dtype=bool)
    for _ in range(15):
        con = e * np.sin(phi)
        dphi = HALFPI - 2.0 * np.arctan(ts * np.power((1.0 - con) / (1.0 + con), eccnth)) - phi
        phi = np.where(done, phi, phi + dphi)
        done |= np.abs(dphi) <= 1.0e-10
        if done.all():
            break
    return phi


def qsfn(sinphi: np.ndarray, e: float, one_es: float) -> np.ndarray:
    """Authalic 'small q' (equal-area projections)."""
    if e < 1.0e-7:
        return sinphi + sinphi
    con = e * sinphi
    div1 = 1.0 - con * con
    div2 = 1.0 + con
    with np.errstate(divide="ignore", invalid="ignore"):
        out = one_es * (sinphi / div1 - (0.5 / e) * np.log((1.0 - con) / div2))
    return np.where((div1 == 0.0) | (div2 == 0.0), np.inf, out)


# --- Clenshaw summations (Poder/Engsager transverse mercator) ------------

def gatg(coeffs: np.ndarray, b: np.ndarray) -> np.ndarray:
    """b + (sum_k coeffs[k-1]·sin(2k·b)) evaluated by Clenshaw recurrence."""
    cos2b = 2.0 * np.cos(2.0 * b)
    h1 = np.full_like(b, coeffs[-1])
    h2 = np.zeros_like(b)
    for c in coeffs[-2::-1]:
        h1, h2 = -h2 + cos2b * h1 + c, h1
    return b + h1 * np.sin(2.0 * b)


def clens(coeffs: np.ndarray, arg_r: np.ndarray) -> np.ndarray:
    """Real Clenshaw: sum_k coeffs[k-1]·sin(k·arg_r) (k step 2 handled by caller)."""
    r = 2.0 * np.cos(arg_r)
    h1 = np.full_like(arg_r, coeffs[-1])
    h2 = np.zeros_like(arg_r)
    for c in coeffs[-2::-1]:
        h1, h2 = -h2 + r * h1 + c, h1
    return np.sin(arg_r) * h1


def clen_s(coeffs: np.ndarray, arg_r: np.ndarray, arg_i: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Complex Clenshaw summation; returns (Re, Im) of the trig series."""
    sin_r, cos_r = np.sin(arg_r), np.cos(arg_r)
    sinh_i, cosh_i = np.sinh(arg_i), np.cosh(arg_i)
    r = 2.0 * cos_r * cosh_i
    i = -2.0 * sin_r * sinh_i
    hr = np.full_like(arg_r, coeffs[-1])
    hi = np.zeros_like(arg_r)
    hr1 = np.zeros_like(arg_r)
    hi1 = np.zeros_like(arg_r)
    for c in coeffs[-2::-1]:
        hr2, hi2 = hr1, hi1
        hr1, hi1 = hr, hi
        hr = -hr2 + r * hr1 - i * hi1 + c
        hi = -hi2 + i * hr1 + r * hi1
    sr = sin_r * cosh_i
    ci = cos_r * sinh_i
    return sr * hr - ci * hi, sr * hi + ci * hr
