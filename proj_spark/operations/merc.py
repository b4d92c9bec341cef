"""Mercator and Web Mercator (EPSG:3857 tiling CRS).

Semantics per the reference (src/projections/merc.cpp): ellipsoidal
Mercator uses the conformal tsfn; webmerc uses the *spherical* formulas
with k0=1 on the ellipsoid's semimajor axis — that approximation is the
definition of Pseudo Mercator.
"""

from __future__ import annotations

import math

import numpy as np

from proj_spark import mathutils as mu
from proj_spark.operations.base import Operation

EPS10 = 1e-10


class Merc(Operation):
    proj_name = "merc"

    def setup(self) -> None:
        if "lat_ts" in self.params:
            phits = abs(float(self.params["lat_ts"])) * np.pi / 180.0
            if phits >= mu.HALFPI:
                raise ValueError("lat_ts larger than 90")
            if self.es != 0.0:
                self.k0 = float(mu.msfn(np.sin(phits), np.cos(phits), self.es))
            else:
                self.k0 = math.cos(phits)

    def _fwd(self, lam, phi):
        at_pole = np.abs(np.abs(phi) - mu.HALFPI) <= EPS10
        x = self.k0 * lam
        if self.es != 0.0:
            with np.errstate(divide="ignore", invalid="ignore"):
                y = -self.k0 * np.log(mu.tsfn(phi, np.sin(phi), self.e))
        else:
            # log(tan(pi/4 + phi/2)); log1p near zero for precision
            y = self.k0 * np.where(
                np.abs(phi) <= np.finfo(np.float64).eps,
                np.log1p(phi),
                np.log(np.tan(mu.FORTPI + 0.5 * phi)),
            )
        nan = np.float64(np.nan)
        return np.where(at_pole, nan, x), np.where(at_pole, nan, y)

    def _inv(self, x, y):
        lam = x / self.k0
        if self.es != 0.0:
            phi = mu.phi2(np.exp(-y / self.k0), self.e)
        else:
            phi = np.arctan(np.sinh(y / self.k0))
        return lam, phi


class WebMerc(Operation):
    """+proj=webmerc: spherical Mercator on the ellipsoid's a, k0 = 1."""

    proj_name = "webmerc"

    def setup(self) -> None:
        self.k0 = 1.0

    def _fwd(self, lam, phi):
        at_pole = np.abs(np.abs(phi) - mu.HALFPI) <= EPS10
        x = lam
        # the at_pole branch masks the result; silence the pole-row
        # log/tan warnings the dead branch of np.where still evaluates
        with np.errstate(invalid="ignore", divide="ignore"):
            y = np.where(
                np.abs(phi) <= np.finfo(np.float64).eps,
                np.log1p(phi),
                np.log(np.tan(mu.FORTPI + 0.5 * phi)),
            )
        nan = np.float64(np.nan)
        return np.where(at_pole, nan, x), np.where(at_pole, nan, y)

    def _inv(self, x, y):
        return x, np.arctan(np.sinh(y))
