"""Albers Equal Area conic (+leac variant).

Semantics per the reference (src/projections/aea.cpp:40-234): authalic
latitude via qsfn, cone constant from msfn/qsfn differences, inverse
authalic latitude via the phi1_ Newton iteration (Snyder 3-16).
"""

from __future__ import annotations

import math

import numpy as np

from proj_spark import mathutils as mu
from proj_spark.operations.base import Operation

EPS10 = 1e-10
TOL7 = 1e-7


def _inv_authalic(qs: np.ndarray, e: float, one_es: float) -> np.ndarray:
    """Latitude from authalic q ('phi1_'): fixed 15-iteration Newton."""
    phi = np.arcsin(np.clip(0.5 * qs, -1.0, 1.0))
    if e < 1.0e-7:
        return phi
    done = np.zeros(phi.shape, dtype=bool)
    for _ in range(15):
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        con = e * sinphi
        com = 1.0 - con * con
        dphi = (0.5 * com * com / cosphi) * (
            qs / one_es - sinphi / com + (0.5 / e) * np.log((1.0 - con) / (1.0 + con)))
        phi = np.where(done, phi, phi + dphi)
        done |= np.abs(dphi) <= 1.0e-10
        if done.all():
            break
    return phi


class AEA(Operation):
    proj_name = "aea"

    def _parallels(self) -> tuple[float, float]:
        phi1 = float(self.params.get("lat_1", 0.0)) * np.pi / 180.0
        phi2 = float(self.params.get("lat_2", 0.0)) * np.pi / 180.0
        return phi1, phi2

    def setup(self) -> None:
        phi1, phi2 = self._parallels()
        if abs(phi1) > mu.HALFPI or abs(phi2) > mu.HALFPI:
            raise ValueError("lat_larger_than_90")
        if abs(phi1 + phi2) < EPS10:
            raise ValueError("conic_lat_equal")
        sinphi = math.sin(phi1)
        cosphi = math.cos(phi1)
        n = sinphi
        secant = abs(phi1 - phi2) >= EPS10
        self.ellips = self.es > 0.0
        if self.ellips:
            m1 = float(mu.msfn(sinphi, cosphi, self.es))
            ml1 = float(mu.qsfn(np.float64(sinphi), self.e, self.one_es))
            if secant:
                sinphi2 = math.sin(phi2)
                m2 = float(mu.msfn(sinphi2, math.cos(phi2), self.es))
                ml2 = float(mu.qsfn(np.float64(sinphi2), self.e, self.one_es))
                if ml2 == ml1:
                    raise ValueError("conic setup failed")
                n = (m1 * m1 - m2 * m2) / (ml2 - ml1)
                if n == 0:
                    raise ValueError("invalid_eccentricity")
            self.ec = 1.0 - 0.5 * self.one_es * math.log((1.0 - self.e) / (1.0 + self.e)) / self.e
            self.c = m1 * m1 + n * ml1
            self.dd = 1.0 / n
            self.rho0 = self.dd * math.sqrt(
                self.c - n * float(mu.qsfn(np.float64(math.sin(self.phi0)), self.e, self.one_es)))
        else:
            if secant:
                n = 0.5 * (n + math.sin(phi2))
            self.n2 = n + n
            self.c = cosphi * cosphi + self.n2 * sinphi
            self.dd = 1.0 / n
            self.rho0 = self.dd * math.sqrt(self.c - self.n2 * math.sin(self.phi0))
        self.n = n

    def _fwd(self, lam, phi):
        if self.ellips:
            rho2 = self.c - self.n * mu.qsfn(np.sin(phi), self.e, self.one_es)
        else:
            rho2 = self.c - self.n2 * np.sin(phi)
        bad = rho2 < 0.0
        rho = self.dd * np.sqrt(np.where(bad, 0.0, rho2))
        nlam = lam * self.n
        x = rho * np.sin(nlam)
        y = self.rho0 - rho * np.cos(nlam)
        nan = np.float64(np.nan)
        return np.where(bad, nan, x), np.where(bad, nan, y)

    def _inv(self, x, y):
        y = self.rho0 - y
        rho = np.hypot(x, y)
        if self.n < 0.0:
            rho = -rho
            x = -x
            y = -y
        center = rho == 0.0
        v = rho * self.n  # rho/dd
        if self.ellips:
            q = (self.c - v * v) / self.n
            at_pole = np.abs(self.ec - np.abs(q)) <= TOL7
            bad = (np.abs(q) > 2.0) & ~at_pole
            phi = _inv_authalic(np.where(bad | at_pole, 0.0, q), self.e, self.one_es)
            phi = np.where(at_pole, np.where(q < 0.0, -mu.HALFPI, mu.HALFPI), phi)
            phi = np.where(bad, np.nan, phi)
        else:
            s = (self.c - v * v) / self.n2
            phi = np.where(np.abs(s) <= 1.0, np.arcsin(np.clip(s, -1, 1)),
                           np.where(s < 0.0, -mu.HALFPI, mu.HALFPI))
        lam = np.arctan2(x, y) / self.n
        pole = mu.HALFPI if self.n > 0.0 else -mu.HALFPI
        return np.where(center, 0.0, lam), np.where(center, pole, phi)


class LEAC(AEA):
    """Lambert Equal Area Conic: aea with phi2=lat_1, phi1=+-90."""

    proj_name = "leac"

    def _parallels(self) -> tuple[float, float]:
        phi2 = float(self.params.get("lat_1", 0.0)) * np.pi / 180.0
        phi1 = -mu.HALFPI if "south" in self.params else mu.HALFPI
        return phi1, phi2
