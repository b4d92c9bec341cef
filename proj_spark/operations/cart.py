"""Geodetic (lam, phi, h) <-> geocentric cartesian (X, Y, Z).

Forward per Hofmann-Wellenhof & Moritz eq. 5-27; inverse per Bowring
(1976) with the polar guard of the reference (src/conversions/cart.cpp):
within ~6e-5 deg of the pole, height = |z| - geocentric radius.
Cartesian output is in meters (io units CARTESIAN -> no a-scaling).
"""

from __future__ import annotations

import numpy as np

from proj_spark import mathutils as mu
from proj_spark.operations.base import Operation


class Cart(Operation):
    proj_name = "cart"
    right = "cartesian"

    def fwd3d(self, lam, phi, z):
        """(lon rad, lat rad, ellipsoidal height m) -> (X, Y, Z) m."""
        lam = np.asarray(lam, dtype=np.float64)
        phi = np.asarray(phi, dtype=np.float64)
        z = np.zeros_like(lam) if z is None else np.asarray(z, dtype=np.float64)
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        n = self.a if self.es == 0 else self.a / np.sqrt(1.0 - self.es * sinphi * sinphi)
        x = (n + z) * cosphi * np.cos(lam)
        y = (n + z) * cosphi * np.sin(lam)
        zz = (n * (1.0 - self.es) + z) * sinphi
        return x, y, zz

    def inv3d(self, x, y, z):
        """(X, Y, Z) m -> (lon rad, lat rad, height m), Bowring method."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        z = np.asarray(z, dtype=np.float64)
        a, b = self.a, self.ell.b
        p = np.hypot(x, y)
        theta = np.arctan2(z * a, p * b)
        c = np.cos(theta)
        s = np.sin(theta)
        phi = np.arctan2(z + self.ell.e2s * b * s ** 3, p - self.es * a * c ** 3)
        # degenerate near-origin case: no unique solution, pick phi=0
        phi = np.where(np.abs(phi) > mu.HALFPI, 0.0, phi)
        lam = np.arctan2(y, x)
        sinphi = np.sin(phi)
        n = self.a if self.es == 0 else self.a / np.sqrt(1.0 - self.es * sinphi * sinphi)
        cosphi = np.cos(phi)
        # geocentric radius at phi, for the polar height fallback
        r = np.hypot(a * a * cosphi, b * b * sinphi) / np.hypot(a * cosphi, b * sinphi)
        h = np.where(np.abs(cosphi) < 1e-6, np.abs(z) - r, p / cosphi - n)
        return lam, phi, h

    # 2-D views (z=0), to keep the Operation interface uniform
    def _fwd(self, lam, phi):
        x, y, _ = self.fwd3d(lam, phi, None)
        return x, y

    def _inv(self, x, y):
        lam, phi, _ = self.inv3d(x, y, np.zeros_like(np.asarray(x, dtype=np.float64)))
        return lam, phi

    # cartesian io: fwd/inv must not scale by a or add offsets, but
    # non-metric units DO apply (src/fwd.cpp:110-118 scales cartesian
    # output by fr_meter; inv_prepare mirrors with to_meter)
    def fwd(self, lam, phi):
        x, y = self._fwd(np.asarray(lam, dtype=np.float64),
                         np.asarray(phi, dtype=np.float64))
        return x * self.fr_meter, y * self.fr_meter

    def inv(self, x, y):
        return self._inv(np.asarray(x, dtype=np.float64) * self.to_meter,
                         np.asarray(y, dtype=np.float64) * self.to_meter)

    def fwd3d_units(self, lam, phi, z):
        """fwd3d + the cartesian fr_meter finalize (the bare-op path;
        pipeline-internal callers use fwd3d, which stays metric)."""
        X, Y, Z = self.fwd3d(lam, phi, z)
        return X * self.fr_meter, Y * self.fr_meter, Z * self.fr_meter

    def inv3d_units(self, x, y, z):
        return self.inv3d(np.asarray(x, dtype=np.float64) * self.to_meter,
                          np.asarray(y, dtype=np.float64) * self.to_meter,
                          np.asarray(z, dtype=np.float64) * self.to_meter)
