"""Azimuthal projections: stere/ups/sterea, laea, aeqd, gnom, ortho,
nsper/tpers, airy + conic eqdc.

NumPy batch re-implementations of the operators registered in the
reference's pj_list (semantics per src/projections/{stere,sterea,laea,
aeqd,gnom,ortho,nsper,airy,eqdc}.cpp); formulas are the published
Snyder/EPSG equations, vectorized with fixed-iteration masked loops for
the iterative inverses.
"""

from __future__ import annotations

import numpy as np

from proj_spark import mathutils as mu
from proj_spark.operations.base import Operation

EPS10 = 1e-10
NAN = np.float64(np.nan)

N_POLE, S_POLE, EQUIT, OBLIQ = 0, 1, 2, 3


def _mode(phi0: float) -> int:
    if abs(abs(phi0) - mu.HALFPI) < EPS10:
        return S_POLE if phi0 < 0.0 else N_POLE
    return EQUIT if abs(phi0) < EPS10 else OBLIQ


def ssfn(phi, sinphi, e):
    sinphi = sinphi * e
    return np.tan(0.5 * (mu.HALFPI + phi)) * \
        np.power((1.0 - sinphi) / (1.0 + sinphi), 0.5 * e)


class Stere(Operation):
    """Stereographic (src/projections/stere.cpp:7; Snyder 21-2..21-44)."""

    proj_name = "stere"

    def setup(self) -> None:
        self.phits = float(self.params.get("lat_ts", 90.0)) * np.pi / 180.0 \
            if "lat_ts" in self.params else mu.HALFPI
        self.mode = _mode(self.phi0)
        e = self.e
        if self.es > 0.0:
            if self.mode in (N_POLE, S_POLE):
                if abs(self.phits - mu.HALFPI) < EPS10:
                    self.akm1 = 2.0 * self.k0 / np.sqrt(
                        (1 + e) ** (1 + e) * (1 - e) ** (1 - e))
                else:
                    t = np.sin(self.phits)
                    self.akm1 = np.cos(self.phits) / mu.tsfn(
                        np.float64(self.phits), np.float64(t), e)
                    t *= e
                    self.akm1 /= np.sqrt(1.0 - t * t)
            else:
                t = np.sin(self.phi0)
                X = 2.0 * np.arctan(ssfn(np.float64(self.phi0), np.float64(t), e)) \
                    - mu.HALFPI
                t *= e
                self.akm1 = 2.0 * self.k0 * np.cos(self.phi0) / np.sqrt(1.0 - t * t)
                self.sinX1 = float(np.sin(X))
                self.cosX1 = float(np.cos(X))
        else:
            if self.mode in (N_POLE, S_POLE):
                if abs(self.phits - mu.HALFPI) >= EPS10:
                    self.akm1 = np.cos(self.phits) / np.tan(
                        0.25 * np.pi - 0.5 * self.phits)
                else:
                    self.akm1 = 2.0 * self.k0
            else:
                self.sinX1 = float(np.sin(self.phi0))
                self.cosX1 = float(np.cos(self.phi0))
                self.akm1 = 2.0 * self.k0

    def _fwd(self, lam, phi):
        coslam = np.cos(lam)
        sinlam = np.sin(lam)
        sinphi = np.sin(phi)
        if self.es > 0.0:
            e = self.e
            if self.mode in (OBLIQ, EQUIT):
                X = 2.0 * np.arctan(ssfn(phi, sinphi, e)) - mu.HALFPI
                sinX = np.sin(X)
                cosX = np.cos(X)
                sinX1 = self.sinX1 if self.mode == OBLIQ else 0.0
                cosX1 = self.cosX1 if self.mode == OBLIQ else 1.0
                A = self.akm1 / (cosX1 * (1.0 + sinX1 * sinX
                                          + cosX1 * cosX * coslam))
                y = A * (cosX1 * sinX - sinX1 * cosX * coslam)
                x = A * cosX * sinlam
            else:
                # S_POLE flips into the N_POLE formula (stere.cpp e_forward)
                if self.mode == S_POLE:
                    phi = -phi
                    coslam = -coslam
                    sinphi = -sinphi
                x = self.akm1 * mu.tsfn(phi, sinphi, self.e)
                y = -x * coslam
                x = x * sinlam
            return x, y
        # sphere
        if self.mode == EQUIT:
            cosphi = np.cos(phi)
            denom = 1.0 + cosphi * coslam
            ok = denom > EPS10
            y = np.where(ok, self.akm1 / denom, NAN)
            x = y * cosphi * sinlam
            y = y * sinphi
            return np.where(ok, x, NAN), y
        if self.mode == OBLIQ:
            cosphi = np.cos(phi)
            denom = 1.0 + self.sinX1 * sinphi + self.cosX1 * cosphi * coslam
            ok = denom > EPS10
            y = np.where(ok, self.akm1 / denom, NAN)
            x = y * cosphi * sinlam
            y = y * (self.cosX1 * sinphi - self.sinX1 * cosphi * coslam)
            return np.where(ok, x, NAN), y
        # polar sphere
        if self.mode == N_POLE:
            coslam = -coslam
            phi = -phi
        ok = np.abs(phi - mu.HALFPI) >= 1e-8
        x = self.akm1 * np.tan(0.25 * np.pi + 0.5 * phi)
        y = -x * coslam
        x = x * sinlam
        return np.where(ok, x, NAN), np.where(ok, y, NAN)

    def _inv(self, x, y):
        if self.es > 0.0:
            # faithful vectorization of stere.cpp stere_e_inverse
            e = self.e
            rho = np.hypot(x, y)
            if self.mode in (OBLIQ, EQUIT):
                sinX1 = self.sinX1 if self.mode == OBLIQ else 0.0
                cosX1 = self.cosX1 if self.mode == OBLIQ else 1.0
                t = 2.0 * np.arctan2(rho * cosX1, self.akm1)
                cosphi = np.cos(t)
                sinphi = np.sin(t)
                with np.errstate(invalid="ignore", divide="ignore"):
                    phi_l = np.where(
                        rho == 0.0,
                        np.arcsin(np.clip(cosphi * sinX1, -1, 1)),
                        np.arcsin(np.clip(
                            cosphi * sinX1 + (y * sinphi * cosX1
                                              / np.where(rho == 0, 1.0, rho)),
                            -1, 1)))
                tp = np.tan(0.5 * (mu.HALFPI + phi_l))
                xx = x * sinphi
                yy = rho * cosX1 * cosphi - y * sinX1 * sinphi
                halfpi = mu.HALFPI
                halfe = 0.5 * e
            else:
                yy = -y if self.mode == N_POLE else y
                xx = x
                tp = -rho / self.akm1
                phi_l = mu.HALFPI - 2.0 * np.arctan(tp)
                halfpi = -mu.HALFPI
                halfe = -0.5 * e
            phi = phi_l
            for _ in range(10):
                sinphi = e * np.sin(phi)
                phi = 2.0 * np.arctan(
                    tp * np.power((1.0 + sinphi) / (1.0 - sinphi), halfe)) \
                    - halfpi
            if self.mode == S_POLE:
                phi = -phi
            lam = np.where((xx == 0.0) & (yy == 0.0), 0.0, np.arctan2(xx, yy))
            return lam, phi
        # sphere
        rho = np.hypot(x, y)
        c = 2.0 * np.arctan(rho / self.akm1)
        sinc = np.sin(c)
        cosc = np.cos(c)
        if self.mode == EQUIT:
            with np.errstate(invalid="ignore", divide="ignore"):
                phi = np.where(rho <= EPS10, 0.0,
                               np.arcsin(np.clip(y * sinc / rho, -1, 1)))
                lam = np.where(rho <= EPS10, 0.0,
                               np.arctan2(x * sinc, cosc * rho))
            return lam, phi
        if self.mode == OBLIQ:
            with np.errstate(invalid="ignore", divide="ignore"):
                phi = np.where(
                    rho <= EPS10, self.phi0,
                    np.arcsin(np.clip(cosc * self.sinX1
                                      + y * sinc * self.cosX1 / rho, -1, 1)))
                lam = np.arctan2(x * sinc, (cosc - self.sinX1 * np.sin(phi))
                                 * rho / self.cosX1)
                lam = np.where(rho <= EPS10, 0.0, lam)
            return lam, phi
        if self.mode == N_POLE:
            y = -y
        with np.errstate(invalid="ignore", divide="ignore"):
            phi = np.where(rho <= EPS10, self.phi0,
                           np.arcsin(np.clip(cosc, -1, 1))
                           * np.where(self.mode == S_POLE, -1.0, 1.0))
        lam = np.arctan2(x, y)
        return lam, phi


class UPS(Stere):
    """Universal Polar Stereographic (src/projections/stere.cpp ups)."""

    proj_name = "ups"

    def __init__(self, params: dict):
        p = dict(params)
        p["lat_0"] = -90.0 if "south" in p else 90.0
        p.setdefault("k_0", 0.994)
        p.setdefault("x_0", 2000000.0)
        p.setdefault("y_0", 2000000.0)
        p.pop("lat_ts", None)
        super().__init__(p)


class ObliqueStereaGauss(Operation):
    """sterea: Oblique Stereographic Alternative — Gaussian sphere
    (src/projections/sterea.cpp; src/gauss.cpp; EPSG 9809)."""

    proj_name = "sterea"

    def setup(self) -> None:
        es = self.es
        e = self.e
        phi0 = self.phi0
        sphi = np.sin(phi0)
        cphi = np.cos(phi0)
        cphi2 = cphi * cphi
        self.rc = np.sqrt(1.0 - es) / (1.0 - es * sphi * sphi)
        self.C = np.sqrt(1.0 + es * cphi2 * cphi2 / (1.0 - es))
        self.chi0 = np.arcsin(sphi / self.C)
        self.ratexp = 0.5 * self.C * e
        srat0 = np.power((1.0 - e * sphi) / (1.0 + e * sphi), self.ratexp)
        if 0.5 * phi0 + 0.25 * np.pi < 1e-10:  # south-polar degenerate case
            self.K = 1.0 / srat0
        else:
            self.K = np.tan(0.5 * self.chi0 + 0.25 * np.pi) / (
                np.power(np.tan(0.5 * phi0 + 0.25 * np.pi), self.C) * srat0)
        self.sinc0 = float(np.sin(self.chi0))
        self.cosc0 = float(np.cos(self.chi0))
        self.R2 = 2.0 * self.rc

    def _gauss(self, lam, phi):
        sphi = self.e * np.sin(phi)
        chi = 2.0 * np.arctan(
            self.K * np.power(np.tan(0.5 * phi + 0.25 * np.pi), self.C)
            * np.power((1.0 - sphi) / (1.0 + sphi), self.ratexp)) - mu.HALFPI
        return self.C * lam, chi

    def _inv_gauss(self, slam, chi):
        lam = slam / self.C
        num = np.power(np.tan(0.5 * chi + 0.25 * np.pi) / self.K, 1.0 / self.C)
        phi = chi
        for _ in range(20):
            sphi = self.e * np.sin(phi)
            phi_new = 2.0 * np.arctan(
                num * np.power((1.0 + sphi) / (1.0 - sphi), 0.5 * self.e)) \
                - mu.HALFPI
            phi = phi_new
        return lam, phi

    def _fwd(self, lam, phi):
        lam, chi = self._gauss(lam, phi)
        sinc = np.sin(chi)
        cosc = np.cos(chi)
        cosl = np.cos(lam)
        h = 1.0 + self.sinc0 * sinc + self.cosc0 * cosc * cosl
        ok = np.abs(h) > EPS10
        A = self.k0 * self.R2 / np.where(ok, h, 1.0)
        x = A * cosc * np.sin(lam)
        y = A * (self.cosc0 * sinc - self.sinc0 * cosc * cosl)
        return np.where(ok, x, NAN), np.where(ok, y, NAN)

    def _inv(self, x, y):
        x = x / self.k0
        y = y / self.k0
        rho = np.hypot(x, y)
        with np.errstate(invalid="ignore", divide="ignore"):
            c = 2.0 * np.arctan2(rho, self.R2)
            sinc = np.sin(c)
            cosc = np.cos(c)
            chi = np.where(rho == 0.0, self.chi0,
                           np.arcsin(np.clip(cosc * self.sinc0
                                             + y * sinc * self.cosc0 / rho,
                                             -1, 1)))
            lam = np.arctan2(x * sinc, rho * self.cosc0 * cosc
                             - y * self.sinc0 * sinc)
        return self._inv_gauss(lam, chi)


class LAEA(Operation):
    """Lambert Azimuthal Equal Area (src/projections/laea.cpp:7)."""

    proj_name = "laea"

    def setup(self) -> None:
        from proj_spark.operations.simple import authset
        self.mode = _mode(self.phi0)
        if self.es > 0:
            self.qp = float(mu.qsfn(np.float64(1.0), self.e, self.one_es))
            self.apa = authset(self.es)
            self.mmf = 0.5 / (1.0 - self.es)
            self.rq = float(np.sqrt(0.5 * self.qp))
            if self.mode == EQUIT:
                self.sinb1, self.cosb1 = 0.0, 1.0
                self.dd = 1.0 / self.rq
                self.xmf = 1.0
                self.ymf = 0.5 * self.qp
            elif self.mode == OBLIQ:
                sinphi = np.sin(self.phi0)
                self.sinb1 = float(mu.qsfn(np.float64(sinphi), self.e,
                                           self.one_es) / self.qp)
                self.cosb1 = float(np.sqrt(1.0 - self.sinb1 * self.sinb1))
                self.dd = float(np.cos(self.phi0) / (
                    np.sqrt(1.0 - self.es * sinphi * sinphi)
                    * self.rq * self.cosb1))
                self.xmf = self.rq * self.dd
                self.ymf = self.rq / self.dd
            else:
                self.dd = 1.0
        else:
            if self.mode in (OBLIQ, EQUIT):
                self.sinb1 = float(np.sin(self.phi0))
                self.cosb1 = float(np.cos(self.phi0))

    def _fwd(self, lam, phi):
        sinlam = np.sin(lam)
        coslam = np.cos(lam)
        if self.es > 0:
            q = mu.qsfn(np.sin(phi), self.e, self.one_es)
            if self.mode in (OBLIQ, EQUIT):
                sinb = q / self.qp
                cosb2 = 1.0 - sinb * sinb
                cosb = np.sqrt(np.maximum(cosb2, 0.0))
                if self.mode == OBLIQ:
                    b = 1.0 + self.sinb1 * sinb + self.cosb1 * cosb * coslam
                else:
                    b = 1.0 + cosb * coslam
                ok = b > EPS10
                b = np.sqrt(2.0 / np.where(ok, b, 1.0))
                if self.mode == OBLIQ:
                    y = self.ymf * b * (self.cosb1 * sinb
                                        - self.sinb1 * cosb * coslam)
                else:
                    y = self.ymf * b * sinb
                x = self.xmf * b * cosb * sinlam
                return np.where(ok, x, NAN), np.where(ok, y, NAN)
            # polar ellipsoid
            if self.mode == N_POLE:
                ok = np.abs(mu.HALFPI + phi) >= EPS10
                b2 = self.qp - q
            else:
                ok = np.abs(phi - mu.HALFPI) >= EPS10
                b2 = self.qp + q
            b = np.sqrt(np.maximum(b2, 0.0))
            x = b * sinlam
            y = b * np.where(self.mode == N_POLE, -coslam, coslam)
            return np.where(ok, x, NAN), np.where(ok, y, NAN)
        # sphere
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        if self.mode == EQUIT:
            yk = 1.0 + cosphi * coslam
            ok = yk > EPS10
            yk = np.sqrt(2.0 / np.where(ok, yk, 1.0))
            x = yk * cosphi * sinlam
            y = yk * sinphi
            return np.where(ok, x, NAN), np.where(ok, y, NAN)
        if self.mode == OBLIQ:
            yk = 1.0 + self.sinb1 * sinphi + self.cosb1 * cosphi * coslam
            ok = yk > EPS10
            yk = np.sqrt(2.0 / np.where(ok, yk, 1.0))
            x = yk * cosphi * sinlam
            y = yk * (self.cosb1 * sinphi - self.sinb1 * cosphi * coslam)
            return np.where(ok, x, NAN), np.where(ok, y, NAN)
        if self.mode == N_POLE:
            coslam = -coslam
        ok = np.abs(phi + self.phi0) >= EPS10
        # sphere polar: N: rho = 2*sin(pi/4 - phi/2); S: 2*cos(pi/4 - phi/2)
        y = 2.0 * np.sin(0.25 * np.pi - 0.5 * phi) if self.mode == N_POLE \
            else 2.0 * np.cos(0.25 * np.pi - 0.5 * phi)
        x = y * sinlam
        y = y * coslam
        return np.where(ok, x, NAN), np.where(ok, y, NAN)

    def _inv(self, x, y):
        from proj_spark.operations.simple import authlat
        if self.es > 0:
            if self.mode in (OBLIQ, EQUIT):
                x1 = x / self.dd
                y1 = y * self.dd
                rho = np.hypot(x1, y1)
                ok = rho >= EPS10
                sCe = 2.0 * np.arcsin(np.clip(0.5 * rho / self.rq, -1, 1))
                cCe = np.cos(sCe)
                sCe_s = np.sin(sCe)
                x2 = x1 * sCe_s
                with np.errstate(invalid="ignore", divide="ignore"):
                    if self.mode == OBLIQ:
                        ab = cCe * self.sinb1 + y1 * sCe_s * self.cosb1 / rho
                        yy = rho * self.cosb1 * cCe - y1 * self.sinb1 * sCe_s
                    else:
                        ab = y1 * sCe_s / rho
                        yy = rho * cCe
                    ab = np.where(ok, ab, self.sinb1
                                  if self.mode == OBLIQ else 0.0)
                    lam = np.where(ok, np.arctan2(x2, yy), 0.0)
            else:
                sign = -1.0 if self.mode == N_POLE else 1.0
                q = x * x + y * y
                ok = q != 0.0
                ab = 1.0 - q / self.qp
                if self.mode == S_POLE:
                    ab = -ab
                lam = np.where(ok, np.arctan2(x, np.where(
                    self.mode == N_POLE, -y, y)), 0.0)
            phi = authlat(np.arcsin(np.clip(ab, -1, 1)), self.apa)
            return lam, phi
        # sphere
        rho = np.hypot(x, y)
        ok = rho <= 2.0
        sin_c = rho * 0.5
        phi_c = 2.0 * np.arcsin(np.clip(sin_c, -1, 1))
        cosc = np.cos(phi_c)
        sinc = np.sin(phi_c)
        with np.errstate(invalid="ignore", divide="ignore"):
            if self.mode == EQUIT:
                phi = np.where(rho <= EPS10, 0.0,
                               np.arcsin(np.clip(y * sinc / rho, -1, 1)))
                lam = np.arctan2(x * sinc, cosc * rho)
            elif self.mode == OBLIQ:
                phi = np.where(rho <= EPS10, self.phi0, np.arcsin(
                    np.clip(cosc * self.sinb1 + y * sinc * self.cosb1 / rho,
                            -1, 1)))
                lam = np.arctan2(x * sinc, (cosc - self.sinb1 * np.sin(phi))
                                 * rho * self.cosb1)
                lam = np.arctan2(x * sinc,
                                 rho * self.cosb1 * cosc - y * self.sinb1 * sinc)
            elif self.mode == N_POLE:
                phi = np.arcsin(np.clip(1.0 - 0.5 * rho * rho, -1, 1))
                lam = np.arctan2(x, -y)
            else:
                phi = -np.arcsin(np.clip(1.0 - 0.5 * rho * rho, -1, 1))
                lam = np.arctan2(x, y)
            lam = np.where(rho <= EPS10, 0.0, lam)
        return np.where(ok, lam, NAN), np.where(ok, phi, NAN)


class AEQD(Operation):
    """Azimuthal Equidistant (src/projections/aeqd.cpp:59).

    Sphere: closed form.  Ellipsoid: geodesic azimuth/distance via the
    Vincenty kernel (reference uses Karney's geod_inverse/direct)."""

    proj_name = "aeqd"

    def setup(self) -> None:
        self.mode = _mode(self.phi0)
        self.sinph0 = float(np.sin(self.phi0))
        self.cosph0 = float(np.cos(self.phi0))
        self.guam = "guam" in self.params and self.es > 0
        if self.es > 0:
            self.en = mu.enfn(self.es)
            if self.guam:
                self.M1 = float(mu.mlfn(np.float64(self.phi0),
                                        np.float64(self.sinph0),
                                        np.float64(self.cosph0), self.en))
            if self.mode == N_POLE:
                self.Mp = float(mu.mlfn(np.float64(mu.HALFPI), np.float64(1.0),
                                        np.float64(0.0), self.en))
            elif self.mode == S_POLE:
                self.Mp = float(mu.mlfn(np.float64(-mu.HALFPI), np.float64(-1.0),
                                        np.float64(0.0), self.en))

    def _guam_fwd(self, lam, phi):
        cosphi = np.cos(phi)
        sinphi = np.sin(phi)
        t = 1.0 / np.sqrt(1.0 - self.es * sinphi * sinphi)
        x = lam * cosphi * t
        y = mu.mlfn(phi, sinphi, cosphi, self.en) - self.M1 \
            + 0.5 * lam * lam * cosphi * sinphi * t
        return x, y

    def _guam_inv(self, x, y):
        x2 = 0.5 * x * x
        phi = np.full_like(x, self.phi0)
        t = np.zeros_like(x)
        for _ in range(3):
            t = self.e * np.sin(phi)
            t = np.sqrt(1.0 - t * t)
            phi = mu.inv_mlfn(self.M1 + y - x2 * np.tan(phi) * t,
                              self.es, self.en)
        lam = x * t / np.cos(phi)
        return lam, phi

    def _fwd(self, lam, phi):
        if self.guam:
            return self._guam_fwd(lam, phi)
        if self.es == 0.0:
            cosphi = np.cos(phi)
            sinphi = np.sin(phi)
            coslam = np.cos(lam)
            sinlam = np.sin(lam)
            if self.mode in (EQUIT, OBLIQ):
                sinb1 = self.sinph0 if self.mode == OBLIQ else 0.0
                cosb1 = self.cosph0 if self.mode == OBLIQ else 1.0
                cosc = sinb1 * sinphi + cosb1 * cosphi * coslam
                near = np.abs(np.abs(cosc) - 1.0) < 1e-14
                ok = ~near | (cosc > 0)  # antipodal point: error
                c = np.arccos(np.clip(cosc, -1.0, 1.0))
                sinc = np.sin(c)
                with np.errstate(invalid="ignore", divide="ignore"):
                    k = np.where(np.abs(sinc) > EPS10, c / sinc, 1.0)
                x = k * cosphi * sinlam
                y = k * (cosb1 * sinphi - sinb1 * cosphi * coslam)
                hard = near & (cosc > 0)
                if np.any(hard):
                    # near the center acos loses precision: delegate to the
                    # exact geodesic, as the reference does (aeqd.cpp oblcon)
                    from proj_spark.operations.karney import Geodesic
                    geod = Geodesic(self.a, self.ell.f)
                    j = np.nonzero(hard)[0]
                    s12, azi1, _ = geod.inverse(
                        np.full(j.size, self.phi0), np.zeros(j.size),
                        np.asarray(phi)[j], np.asarray(lam)[j])
                    x = np.asarray(x)
                    y = np.asarray(y)
                    x[j] = s12 * np.sin(azi1) / self.a
                    y[j] = s12 * np.cos(azi1) / self.a
                return np.where(ok, x, NAN), np.where(ok, y, NAN)
            if self.mode == N_POLE:
                phi = -phi
                coslam = -coslam
            ok = np.abs(phi - mu.HALFPI) >= EPS10
            y = mu.HALFPI + phi
            x = y * sinlam
            yy = y * coslam
            return np.where(ok, x, NAN), np.where(ok, yy, NAN)
        # ellipsoid: exact geodesic forward (Karney; aeqd.cpp e_forward)
        from proj_spark.operations.karney import Geodesic
        if self.mode in (EQUIT, OBLIQ):
            geod = Geodesic(self.a, self.ell.f)
            lat1 = np.full_like(lam, self.phi0)
            lon1 = np.zeros_like(lam)
            s12, azi1, _ = geod.inverse(lat1, lon1, phi, lam)
            ra = 1.0 / self.a
            x = s12 * np.sin(azi1) * ra
            y = s12 * np.cos(azi1) * ra
            return x, y
        # polar ellipsoid (aeqd.cpp e_forward: rho = |Mp - mlfn(phi)|)
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        coslam = np.cos(lam)
        sinlam = np.sin(lam)
        rho = np.abs(self.Mp - mu.mlfn(phi, sinphi, cosphi, self.en))
        x = rho * sinlam
        y = -rho * coslam if self.mode == N_POLE else rho * coslam
        return x, y

    def _inv(self, x, y):
        if self.guam:
            return self._guam_inv(x, y)
        if self.es == 0.0:
            rho = np.hypot(x, y)
            okr = rho <= np.pi + EPS10  # beyond the antipode: error
            c = np.minimum(rho, np.pi)
            sinc = np.sin(c)
            cosc = np.cos(c)
            if self.mode in (EQUIT, OBLIQ):
                sinb1 = self.sinph0 if self.mode == OBLIQ else 0.0
                cosb1 = self.cosph0 if self.mode == OBLIQ else 1.0
                with np.errstate(invalid="ignore", divide="ignore"):
                    phi = np.where(rho <= EPS10, self.phi0, np.arcsin(
                        np.clip(cosc * sinb1 + y * sinc * cosb1 / rho, -1, 1)))
                    lam = np.where(rho <= EPS10, 0.0, np.arctan2(
                        x * sinc, rho * cosb1 * cosc - y * sinb1 * sinc))
            else:
                phi = np.where(self.mode == N_POLE, mu.HALFPI - rho,
                               rho - mu.HALFPI)
                lam = np.arctan2(x, np.where(self.mode == N_POLE, -y, y))
            return np.where(okr, lam, NAN), np.where(okr, phi, NAN)
        # ellipsoid: exact geodesic direct (Karney; aeqd.cpp e_inverse)
        from proj_spark.operations.karney import Geodesic
        if self.mode in (EQUIT, OBLIQ):
            geod = Geodesic(self.a, self.ell.f)
            s12 = np.hypot(x, y) * self.a
            azi1 = np.arctan2(x, y)
            lon1 = np.zeros_like(x)
            lat1 = np.full_like(x, self.phi0)
            phi, lam, _ = geod.direct(lat1, lon1, azi1, s12)
            return lam, phi
        rho = np.hypot(x, y)
        arg = self.Mp - rho if self.mode == N_POLE else self.Mp + rho
        phi = mu.inv_mlfn(arg, self.es, self.en)
        lam = np.arctan2(x, -y if self.mode == N_POLE else y)
        return lam, phi


class Gnom(Operation):
    """Gnomonic, sphere (src/projections/gnom.cpp:10)."""

    proj_name = "gnom"

    def setup(self) -> None:
        self.mode = _mode(self.phi0)
        self.sinph0 = float(np.sin(self.phi0))
        self.cosph0 = float(np.cos(self.phi0))

    def _fwd(self, lam, phi):
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        coslam = np.cos(lam)
        sinlam = np.sin(lam)
        if self.mode == EQUIT:
            yk = cosphi * coslam
        elif self.mode == OBLIQ:
            yk = self.sinph0 * sinphi + self.cosph0 * cosphi * coslam
        elif self.mode == S_POLE:
            yk = -sinphi
        else:
            yk = sinphi
        ok = yk > EPS10
        yk = np.where(ok, 1.0 / np.where(ok, yk, 1.0), NAN)
        x = yk * cosphi * sinlam
        if self.mode == EQUIT:
            y = yk * sinphi
        elif self.mode == OBLIQ:
            y = yk * (self.cosph0 * sinphi - self.sinph0 * cosphi * coslam)
        elif self.mode == N_POLE:
            y = -yk * cosphi * coslam
        else:
            y = yk * cosphi * coslam
        return np.where(ok, x, NAN), np.where(ok, y, NAN)

    def _inv(self, x, y):
        rho = np.hypot(x, y)
        sinz = np.sin(np.arctan(rho))
        cosz = np.sqrt(1.0 - sinz * sinz)
        with np.errstate(invalid="ignore", divide="ignore"):
            if self.mode == EQUIT:
                phi = np.where(rho <= EPS10, 0.0,
                               np.arcsin(np.clip(y * sinz / rho, -1, 1)))
                lam = np.arctan2(x * sinz, cosz * rho)
            elif self.mode == OBLIQ:
                phi = np.where(rho <= EPS10, self.phi0, np.arcsin(np.clip(
                    cosz * self.sinph0 + y * sinz * self.cosph0 / rho, -1, 1)))
                lam = np.arctan2(x * sinz, rho * self.cosph0 * cosz
                                 - y * self.sinph0 * sinz)
            elif self.mode == N_POLE:
                phi = np.where(rho <= EPS10, self.phi0,
                               np.arcsin(np.clip(cosz, -1, 1)))
                lam = np.arctan2(x, -y)
            else:
                phi = np.where(rho <= EPS10, self.phi0,
                               -np.arcsin(np.clip(cosz, -1, 1)))
                lam = np.arctan2(x, y)
            lam = np.where(rho <= EPS10, 0.0, lam)
        return lam, phi


class Ortho(Operation):
    """Orthographic, sphere (src/projections/ortho.cpp:7)."""

    proj_name = "ortho"

    def setup(self) -> None:
        self.mode = _mode(self.phi0)
        self.sinph0 = float(np.sin(self.phi0))
        self.cosph0 = float(np.cos(self.phi0))

    def _fwd(self, lam, phi):
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        coslam = np.cos(lam)
        if self.mode == EQUIT:
            ok = cosphi * coslam >= -EPS10
            y = sinphi
        elif self.mode == OBLIQ:
            ok = (self.sinph0 * sinphi
                  + self.cosph0 * cosphi * coslam) >= -EPS10
            y = self.cosph0 * sinphi - self.sinph0 * cosphi * coslam
        else:
            if self.mode == N_POLE:
                coslam = -coslam
                ok = phi >= -EPS10
            else:
                ok = phi <= EPS10
            y = cosphi * coslam
        x = cosphi * np.sin(lam)
        return np.where(ok, x, NAN), np.where(ok, y, NAN)

    def _inv(self, x, y):
        rho = np.hypot(x, y)
        ok = rho <= 1.0 + EPS10
        sinc = np.clip(rho, 0.0, 1.0)
        cosc = np.sqrt(1.0 - sinc * sinc)
        with np.errstate(invalid="ignore", divide="ignore"):
            if self.mode == EQUIT:
                phi = np.where(rho <= EPS10, 0.0,
                               np.arcsin(np.clip(y * sinc / rho, -1, 1)))
                lam = np.arctan2(x * sinc, cosc * rho)
            elif self.mode == OBLIQ:
                phi = np.where(rho <= EPS10, self.phi0, np.arcsin(np.clip(
                    cosc * self.sinph0 + y * sinc * self.cosph0 / rho, -1, 1)))
                lam = np.arctan2(x * sinc, rho * self.cosph0 * cosc
                                 - y * self.sinph0 * sinc)
            elif self.mode == N_POLE:
                phi = np.arccos(np.clip(sinc, -1, 1))
                lam = np.arctan2(x, -y)
            else:
                phi = -np.arccos(np.clip(sinc, -1, 1))
                lam = np.arctan2(x, y)
            lam = np.where(rho <= EPS10, 0.0, lam)
        return np.where(ok, lam, NAN), np.where(ok, phi, NAN)


class Nsper(Operation):
    """Near-sided perspective, sphere (src/projections/nsper.cpp:40)."""

    proj_name = "nsper"
    tilted = False

    def setup(self) -> None:
        self.height = float(self.params["h"])
        self.mode = _mode(self.phi0)
        self.sinph0 = float(np.sin(self.phi0))
        self.cosph0 = float(np.cos(self.phi0))
        self.p = 1.0 + self.height / self.a
        self.rp = 1.0 / self.p
        self.h = 1.0 / (self.p - 1.0)
        self.pn1 = self.height / self.a
        if self.tilted:
            omega = float(self.params.get("tilt", 0.0)) * np.pi / 180.0
            gamma = float(self.params.get("azi", 0.0)) * np.pi / 180.0
            self.cg = np.cos(gamma)
            self.sg = np.sin(gamma)
            self.cw = np.cos(omega)
            self.sw = np.sin(omega)

    def _fwd(self, lam, phi):
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        coslam = np.cos(lam)
        if self.mode == EQUIT:
            yk = cosphi * coslam
        elif self.mode == OBLIQ:
            yk = self.sinph0 * sinphi + self.cosph0 * cosphi * coslam
        elif self.mode == S_POLE:
            yk = -sinphi
        else:
            yk = sinphi
        ok = yk >= self.rp - EPS10
        k = self.pn1 / (self.p - yk)
        x = k * cosphi * np.sin(lam)
        if self.mode == EQUIT:
            y = k * sinphi
        elif self.mode == OBLIQ:
            y = k * (self.cosph0 * sinphi - self.sinph0 * cosphi * coslam)
        elif self.mode == N_POLE:
            y = -k * cosphi * coslam
        else:
            y = k * cosphi * coslam
        if self.tilted:
            yt = y * self.cg + x * self.sg
            ba = 1.0 / (yt * self.sw * self.h + self.cw)
            xt = (x * self.cg - y * self.sg) * self.cw * ba
            y = yt * ba
            x = xt
        return np.where(ok, x, NAN), np.where(ok, y, NAN)

    def _inv(self, x, y):
        if self.tilted:
            yt = 1.0 / (self.pn1 - y * self.sw)
            bm = self.pn1 * x * yt
            bq = self.pn1 * y * self.cw * yt
            x = bm * self.cg + bq * self.sg
            y = bq * self.cg - bm * self.sg
        rho = np.hypot(x, y)
        disc = 1.0 - rho * rho * (self.p + 1.0) / (self.p - 1.0)
        ok = disc >= 0.0  # inside the horizon circle
        with np.errstate(invalid="ignore", divide="ignore"):
            sinz = (self.p - np.sqrt(np.where(ok, disc, 0.0))) \
                / ((self.p - 1.0) / rho + rho / (self.p - 1.0))
            sinz = np.clip(sinz, -1.0, 1.0)
            cosz = np.sqrt(1.0 - sinz * sinz)
            if self.mode == EQUIT:
                phi = np.where(rho <= EPS10, 0.0,
                               np.arcsin(np.clip(y * sinz / rho, -1, 1)))
                lam = np.arctan2(x * sinz, cosz * rho)
            elif self.mode == OBLIQ:
                phi = np.where(rho <= EPS10, self.phi0, np.arcsin(np.clip(
                    cosz * self.sinph0 + y * sinz * self.cosph0 / rho, -1, 1)))
                lam = np.arctan2(x * sinz, rho * self.cosph0 * cosz
                                 - y * self.sinph0 * sinz)
            elif self.mode == N_POLE:
                phi = np.arcsin(np.clip(cosz, -1, 1))
                lam = np.arctan2(x, -y)
            else:
                phi = -np.arcsin(np.clip(cosz, -1, 1))
                lam = np.arctan2(x, y)
            lam = np.where(rho <= EPS10, 0.0, lam)
        return np.where(ok, lam, NAN), np.where(ok, phi, NAN)


class Tpers(Nsper):
    """Tilted perspective (src/projections/nsper.cpp:41)."""

    proj_name = "tpers"
    tilted = True


class Airy(Operation):
    """Airy minimum-error azimuthal, sphere, no inverse
    (src/projections/airy.cpp:34)."""

    proj_name = "airy"

    def setup(self) -> None:
        self.mode = _mode(self.phi0)
        self.sinph0 = float(np.sin(self.phi0))
        self.cosph0 = float(np.cos(self.phi0))
        beta = 0.5 * (mu.HALFPI - float(self.params.get("lat_b", 0.0))
                      * np.pi / 180.0)
        if abs(beta) < EPS10:
            self.Cb = -0.5
        else:
            t = 1.0 / np.tan(beta)
            self.Cb = float(t * t * np.log(np.cos(beta)))
        self.no_cut = "no_cut" in self.params
        self.p_halfpi = -mu.HALFPI if self.mode == S_POLE else mu.HALFPI

    def _fwd(self, lam, phi):
        sinlam = np.sin(lam)
        coslam = np.cos(lam)
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        if self.mode in (EQUIT, OBLIQ):
            sinph0 = self.sinph0 if self.mode == OBLIQ else 0.0
            cosph0 = self.cosph0 if self.mode == OBLIQ else 1.0
            cosz = cosphi * coslam
            if self.mode == OBLIQ:
                cosz = sinph0 * sinphi + cosph0 * cosz
            s = 1.0 - cosz
            with np.errstate(invalid="ignore", divide="ignore"):
                t = 0.5 * (1.0 + cosz)
                ok = (self.no_cut | (cosz >= -EPS10)) & (t > 0.0)
                Krho = np.where(np.abs(s) > EPS10,
                                -np.log(np.where(t > 0, t, 1.0)) / s
                                - self.Cb / np.where(t > 0, t, 1.0),
                                0.5 - self.Cb)
            x = Krho * cosphi * sinlam
            if self.mode == OBLIQ:
                y = Krho * (cosph0 * sinphi - sinph0 * cosphi * coslam)
            else:
                y = Krho * sinphi
            return np.where(ok, x, NAN), np.where(ok, y, NAN)
        # polar (airy.cpp: phi' = |p_halfpi - phi| / 2)
        ph = np.abs(self.p_halfpi - phi)
        ok = self.no_cut | ((ph - EPS10) <= mu.HALFPI)
        ph = ph * 0.5
        with np.errstate(invalid="ignore", divide="ignore"):
            t = np.tan(ph)
            Krho = np.where(ph > EPS10,
                            -2.0 * (np.log(np.cos(ph)) / t + t * self.Cb), 0.0)
        x = Krho * sinlam
        y = Krho * coslam
        if self.mode == N_POLE:
            y = -y
        return np.where(ok, x, NAN), np.where(ok, y, NAN)


class Eqdc(Operation):
    """Equidistant Conic (src/projections/eqdc.cpp:23)."""

    proj_name = "eqdc"

    def setup(self) -> None:
        phi1 = float(self.params.get("lat_1", 0.0)) * np.pi / 180.0
        phi2 = float(self.params.get("lat_2", phi1 * 180.0 / np.pi)) \
            * np.pi / 180.0
        if abs(phi1 + phi2) < EPS10:
            raise ValueError("eqdc: |lat_1 + lat_2| ~ 0")
        sinphi = np.sin(phi1)
        cosphi = np.cos(phi1)
        self.n = sinphi
        secant = abs(phi1 - phi2) >= EPS10
        if self.es > 0:
            self.en = mu.enfn(self.es)
            m1 = mu.msfn(np.float64(sinphi), np.float64(cosphi), self.es)
            ml1 = mu.mlfn(np.float64(phi1), np.float64(sinphi),
                          np.float64(cosphi), self.en)
            if secant:
                sinphi2 = np.sin(phi2)
                cosphi2 = np.cos(phi2)
                self.n = float((m1 - mu.msfn(np.float64(sinphi2),
                                             np.float64(cosphi2), self.es))
                               / (mu.mlfn(np.float64(phi2), np.float64(sinphi2),
                                          np.float64(cosphi2), self.en) - ml1))
            self.c = float(ml1 + m1 / self.n)
            self.rho0 = float(self.c - mu.mlfn(
                np.float64(self.phi0), np.float64(np.sin(self.phi0)),
                np.float64(np.cos(self.phi0)), self.en))
        else:
            if secant:
                self.n = float((cosphi - np.cos(phi2)) / (phi2 - phi1))
            self.c = float(phi1 + np.cos(phi1) / self.n)
            self.rho0 = float(self.c - self.phi0)
            self.en = None

    def _fwd(self, lam, phi):
        if self.es > 0:
            rho = self.c - mu.mlfn(phi, np.sin(phi), np.cos(phi), self.en)
        else:
            rho = self.c - phi
        x = rho * np.sin(lam * self.n)
        y = self.rho0 - rho * np.cos(lam * self.n)
        return x, y

    def _inv(self, x, y):
        rho = np.hypot(x, self.rho0 - y)
        lam = np.arctan2(x, self.rho0 - y) / self.n
        sign = np.sign(self.n) if self.n != 0 else 1.0
        if self.n < 0.0:
            rho = -rho
            lam = np.arctan2(-x, y - self.rho0) / self.n
        if self.es > 0:
            phi = mu.inv_mlfn(self.c - rho, self.es, self.en)
        else:
            phi = self.c - rho
        return lam, phi


REGISTRY = {
    "stere": Stere,
    "ups": UPS,
    "sterea": ObliqueStereaGauss,
    "laea": LAEA,
    "aeqd": AEQD,
    "gnom": Gnom,
    "ortho": Ortho,
    "nsper": Nsper,
    "tpers": Tpers,
    "airy": Airy,
    "eqdc": Eqdc,
}
