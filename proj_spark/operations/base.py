"""Operation base class: prepare/kernel/finalize batch execution.

Re-expresses the reference's fwd/inv driver loops (src/fwd.cpp:41-154,
src/inv.cpp:39-143) for whole NumPy arrays:

  forward:  lat range-check + clamp, lon wrap, lam -= lam0, wrap
            -> kernel (returns x,y in semimajor-axis units for CLASSIC ops)
            -> x = a*x + x0 ; y = a*y + y0
  inverse:  x = x - x0 ; scale by 1/a -> kernel -> lam += lam0, wrap

Invalid inputs/outputs propagate as NaN (the reference uses HUGE_VAL).
All angles radians, all lengths meters unless noted.
"""

from __future__ import annotations

import numpy as np

from proj_spark.ellipsoids import Ellipsoid, ellipsoid_from_params
from proj_spark import mathutils as mu


def _angle(params: dict, key: str, default: float = 0.0) -> float:
    """Parse an angular parameter given in degrees -> radians."""
    if key not in params:
        return default
    return math_radians(float(params[key]))


def math_radians(deg: float) -> float:
    return deg * np.pi / 180.0


class Operation:
    """A compiled coordinate operation (plan-time constants + batch kernels).

    Subclasses implement ``_fwd(lam, phi)`` / ``_inv(x, y)`` (2-D, a-units)
    or ``_fwd3d`` / ``_inv3d`` (cartesian meters), mirroring the reference's
    PJ fwd/inv function pointers (src/proj_internal.h:349-356).
    """

    #: io unit tags, mirroring enum pj_io_units (src/proj_internal.h:172)
    left = "radians"
    right = "classic"   # classic: kernel emits a-units; projected: meters

    def __init__(self, params: dict):
        self.params = params
        self.ell: Ellipsoid = ellipsoid_from_params(params)
        self.a = self.ell.a
        #: 1/a for the inverse prepare step.  Kept SEPARATE from self.a to
        #: mirror the reference exactly: operators overriding P->a in their
        #: constructor (krovak) do not refresh P->ra, which pj_init derived
        #: earlier — the published krovak test vectors depend on that quirk.
        self.ra = 1.0 / self.ell.a
        self.es = self.ell.es
        self.e = self.ell.e
        self.one_es = self.ell.one_es
        self.lam0 = _angle(params, "lon_0")
        self.phi0 = _angle(params, "lat_0")
        self.x0 = float(params.get("x_0", 0.0))
        self.y0 = float(params.get("y_0", 0.0))
        self.k0 = float(params.get("k_0", params.get("k", 1.0)))
        self.over = "over" in params
        self.setup()

    def setup(self) -> None:  # pragma: no cover - trivial default
        """Precompute plan-time constants (the PROJECTION(xxx) body)."""

    # -- kernels (override) ------------------------------------------------
    def _fwd(self, lam: np.ndarray, phi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        raise NotImplementedError

    def _inv(self, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        raise NotImplementedError

    # -- public batch API ----------------------------------------------------
    def fwd(self, lam: np.ndarray, phi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """lon/lat radians -> projected meters (NaN on invalid input)."""
        lam = np.asarray(lam, dtype=np.float64)
        phi = np.asarray(phi, dtype=np.float64)
        bad = (np.abs(phi) - mu.HALFPI > mu.EPS_LAT) | (lam > 10.0) | (lam < -10.0)
        bad |= ~np.isfinite(lam) | ~np.isfinite(phi)
        phi = np.clip(phi, -mu.HALFPI, mu.HALFPI)
        if not self.over:
            lam = mu.adjlon(lam)
        lam = lam - self.lam0
        if not self.over:
            lam = mu.adjlon(lam)
        x, y = self._fwd(np.where(bad, 0.0, lam), np.where(bad, 0.0, phi))
        if self.right == "classic":
            x = self.a * x
            y = self.a * y
        x = x + self.x0
        y = y + self.y0
        nan = np.float64(np.nan)
        return np.where(bad, nan, x), np.where(bad, nan, y)

    #: plausibility bound for projected-plane inputs to inv (meters);
    #: mirrors the reference erroring on absurd coordinates rather than
    #: returning garbage (src/inv.cpp:39-60 input checks)
    INV_RANGE_M = 1e10

    def inv(self, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """projected meters -> lon/lat radians (NaN on invalid input)."""
        x = np.asarray(x, dtype=np.float64) - self.x0
        y = np.asarray(y, dtype=np.float64) - self.y0
        bad = (~np.isfinite(x) | ~np.isfinite(y)
               | (np.abs(x) > self.INV_RANGE_M) | (np.abs(y) > self.INV_RANGE_M))
        if self.right == "classic":
            x = x * self.ra
            y = y * self.ra
        lam, phi = self._inv(np.where(bad, 0.0, x), np.where(bad, 0.0, y))
        lam = lam + self.lam0
        if not self.over:
            lam = mu.adjlon(lam)
        nan = np.float64(np.nan)
        return np.where(bad, nan, lam), np.where(bad, nan, phi)

    # degree convenience wrappers (what the gie-derived tests feed/expect)
    def fwd_deg(self, lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return self.fwd(np.radians(np.asarray(lon, dtype=np.float64)),
                        np.radians(np.asarray(lat, dtype=np.float64)))

    def inv_deg(self, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        lam, phi = self.inv(x, y)
        return np.degrees(lam), np.degrees(phi)
