"""Lambert Conformal Conic (1SP / 2SP, sphere & ellipsoid).

Semantics per the reference (src/projections/lcc.cpp): secant cone
constant n from msfn/tsfn ratios; inverse latitude via phi2 iteration.
"""

from __future__ import annotations

import math

import numpy as np

from proj_spark import mathutils as mu
from proj_spark.operations.base import Operation

EPS10 = 1e-10


class LCC(Operation):
    proj_name = "lcc"

    def setup(self) -> None:
        from proj_spark.operations.base import _angle
        p = self.params
        phi1 = _angle(p, "lat_1", 0.0)
        phi2_ = _angle(p, "lat_2") if "lat_2" in p else phi1
        if "lat_2" not in p and "lat_0" not in p:
            self.phi0 = phi1
        if abs(phi1) > mu.HALFPI or abs(phi2_) > mu.HALFPI:
            raise ValueError("lat_larger_than_90")
        if abs(phi1 + phi2_) < EPS10:
            raise ValueError("conic_lat_equal")
        self.phi1, self.phi2 = phi1, phi2_

        sinphi = math.sin(phi1)
        cosphi = math.cos(phi1)
        secant = abs(phi1 - phi2_) >= EPS10
        n = sinphi
        if self.es != 0.0:
            m1 = float(mu.msfn(sinphi, cosphi, self.es))
            ml1 = float(mu.tsfn(np.float64(phi1), np.float64(sinphi), self.e))
            if ml1 == 0:
                raise ValueError("lat_1_or_2_zero_or_90")
            if secant:
                sinphi2 = math.sin(phi2_)
                m2 = float(mu.msfn(sinphi2, math.cos(phi2_), self.es))
                ml2 = float(mu.tsfn(np.float64(phi2_), np.float64(sinphi2), self.e))
                if ml2 == 0 or math.log(ml1 / ml2) == 0:
                    raise ValueError("invalid_eccentricity")
                n = math.log(m1 / m2) / math.log(ml1 / ml2)
                if n == 0:
                    raise ValueError("invalid_eccentricity")
            self.c = m1 * math.pow(ml1, -n) / n
            self.rho0 = 0.0 if abs(abs(self.phi0) - mu.HALFPI) < EPS10 else (
                self.c * math.pow(float(mu.tsfn(np.float64(self.phi0),
                                                np.float64(math.sin(self.phi0)), self.e)), n))
        else:
            if abs(cosphi) < EPS10 or abs(math.cos(phi2_)) < EPS10:
                raise ValueError("lat_1_or_2_zero_or_90")
            if secant:
                n = math.log(cosphi / math.cos(phi2_)) / math.log(
                    math.tan(mu.FORTPI + 0.5 * phi2_) / math.tan(mu.FORTPI + 0.5 * phi1))
            self.c = cosphi * math.pow(math.tan(mu.FORTPI + 0.5 * phi1), n) / n
            self.rho0 = 0.0 if abs(abs(self.phi0) - mu.HALFPI) < EPS10 else (
                self.c * math.pow(math.tan(mu.FORTPI + 0.5 * self.phi0), -n))
        self.n = n
        # EPSG 9803 (LCC 2SP Belgium): theta is reduced by a = 29.2985"
        # before computing E/N (GN7-2; the pre-1972 Belgian grids).  The
        # reference maps this method to plain lcc with a FIXME
        # (coordinateoperation_constants.hpp:568-575); the true formula
        # is this one-term rotation.
        self.theta_off = ((29.2985 / 3600.0) * math.pi / 180.0
                          if "belgium" in self.params else 0.0)

    def _fwd(self, lam, phi):
        at_pole = np.abs(np.abs(phi) - mu.HALFPI) < EPS10
        bad_pole = at_pole & (phi * self.n <= 0.0)
        if self.es != 0.0:
            rho = self.c * np.power(mu.tsfn(phi, np.sin(phi), self.e), self.n)
        else:
            rho = self.c * np.power(np.tan(mu.FORTPI + 0.5 * phi), -self.n)
        rho = np.where(at_pole, 0.0, rho)
        nlam = lam * self.n - self.theta_off
        x = self.k0 * rho * np.sin(nlam)
        y = self.k0 * (self.rho0 - rho * np.cos(nlam))
        nan = np.float64(np.nan)
        return np.where(bad_pole, nan, x), np.where(bad_pole, nan, y)

    def _inv(self, x, y):
        x = x / self.k0
        y = self.rho0 - y / self.k0
        rho = np.hypot(x, y)
        if self.n < 0.0:
            rho = -rho
            x = -x
            y = -y
        center = rho == 0.0
        safe_rho = np.where(center, 1.0, rho)
        if self.es != 0.0:
            phi = mu.phi2(np.power(safe_rho / self.c, 1.0 / self.n), self.e)
        else:
            phi = 2.0 * np.arctan(np.power(self.c / safe_rho, 1.0 / self.n)) - mu.HALFPI
        lam = (np.arctan2(x, y) + self.theta_off) / self.n
        pole = mu.HALFPI if self.n > 0.0 else -mu.HALFPI
        return np.where(center, 0.0, lam), np.where(center, pole, phi)
