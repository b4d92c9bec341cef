"""proj_factors: per-point scale/distortion analytics (src/factors.cpp,
src/deriv.cpp) — meridional/parallel scale h/k, areal scale s, meridian
convergence, Tissot semi-axes a/b, max angular distortion omega.

Vectorized central differences with the reference's default step
h = 1e-5 rad, evaluated on the raw projection kernel (a-units), so the
factors come out dimensionless exactly as in the reference.
"""

from __future__ import annotations

import numpy as np

from proj_spark import mathutils as mu

DEFAULT_H = 1e-5


def _deriv(op, lam, phi, h):
    """4-corner derivative estimates (src/deriv.cpp)."""
    h2 = 2.0 * h
    xpp, ypp = op._fwd(lam + h, phi + h)
    xpm, ypm = op._fwd(lam + h, phi - h)
    xmm, ymm = op._fwd(lam - h, phi - h)
    xmp, ymp = op._fwd(lam - h, phi + h)
    x_l = (xpp + xpm - xmm - xmp) / (2.0 * h2)
    y_l = (ypp + ypm - ymm - ymp) / (2.0 * h2)
    x_p = (xpp - xpm - xmm + xmp) / (2.0 * h2)
    y_p = (ypp - ypm - ymm + ymp) / (2.0 * h2)
    return x_l, y_l, x_p, y_p


def factors(op, lam, phi, h: float = DEFAULT_H) -> dict:
    """Scale factors at geographic coordinates (radians).

    Returns dict of arrays: h (meridional scale), k (parallel scale),
    s (areal scale), conv (convergence, rad), a/b (Tissot axes),
    omega (max angular distortion, rad), thetap.
    """
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    h = abs(h) or DEFAULT_H
    phi = np.clip(phi, -(mu.HALFPI - h), mu.HALFPI - h)
    lam = mu.adjlon(lam - op.lam0)
    x_l, y_l, x_p, y_p = _deriv(op, lam, phi, h)
    if getattr(op, "right", "classic") != "classic":
        ra = 1.0 / op.a
        x_l, y_l, x_p, y_p = x_l * ra, y_l * ra, x_p * ra, y_p * ra
    cosphi = np.cos(phi)
    fh = np.hypot(x_p, y_p)
    fk = np.hypot(x_l, y_l) / cosphi
    if op.es != 0.0:
        t = np.sin(phi)
        t = 1.0 - op.es * t * t
        n = np.sqrt(t)
        fh = fh * t * n / op.one_es
        fk = fk * n
        r = t * t / op.one_es
    else:
        r = 1.0
    conv = -np.arctan2(x_p, y_p)
    s = (y_p * x_l - x_p * y_l) * r / cosphi
    with np.errstate(invalid="ignore", divide="ignore"):
        thetap = np.arcsin(np.clip(s / (fh * fk), -1, 1))
    t = fk * fk + fh * fh
    a = np.sqrt(np.maximum(t + 2.0 * s, 0.0))
    t = np.sqrt(np.maximum(t - 2.0 * s, 0.0))
    b = 0.5 * (a - t)
    a = 0.5 * (a + t)
    with np.errstate(invalid="ignore", divide="ignore"):
        omega = 2.0 * np.arcsin(np.clip((a - b) / (a + b), -1, 1))
    return {"h": fh, "k": fk, "s": s, "conv": conv, "a": a, "b": b,
            "omega": omega, "thetap": thetap}
