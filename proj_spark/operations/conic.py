"""Conic + classic ellipsoidal operators: cass, bonne, somerc, gstmerc,
poly, ocea, tpeqd, the simple-conics family (euler/murd1-3/pconic/
tissot/vitk1), ccon, lcca, vandg2-4, oea, gins8.

NumPy batch re-expressions of the reference operators in
src/projections/{cass,bonne,somerc,gstmerc,poly,ocea,tpeqd,sconics,
ccon,lcca,vandg2,vandg4,oea,gins8}.cpp.
"""

from __future__ import annotations

import numpy as np

from proj_spark import mathutils as mu
from proj_spark.operations.base import Operation
from proj_spark.operations.pseudocyl import _SphOp, aasin, asqrt

NAN = np.float64(np.nan)
FORTPI = np.pi / 4
D2R = np.pi / 180.0
TWO_D_PI = 2.0 / np.pi


class Cass(Operation):
    """Cassini-Soldner, sphere + ellipsoid (cass.cpp)."""

    proj_name = "cass"

    def setup(self) -> None:
        # EPSG 9833 (Hyperbolic Cassini-Soldner, Vanua Levu): subtract
        # N^3/(6 rho nu) from the northing (GN7-2); not in the
        # reference's 6.x cass.cpp (the method is catalog-only there)
        self.hyperbolic = "hyperbolic" in self.params
        if self.es != 0.0:
            self.en = mu.enfn(self.es)
            self.m0 = float(mu.mlfn(np.float64(self.phi0),
                                    np.float64(np.sin(self.phi0)),
                                    np.float64(np.cos(self.phi0)), self.en))

    def _fwd(self, lam, phi):
        if self.es == 0.0:
            x = np.arcsin(np.clip(np.cos(phi) * np.sin(lam), -1, 1))
            y = np.arctan2(np.tan(phi), np.cos(lam)) - self.phi0
            return x, y
        n = np.sin(phi)
        c = np.cos(phi)
        y = mu.mlfn(phi, n, c, self.en)
        n = 1.0 / np.sqrt(1.0 - self.es * n * n)
        tn = np.tan(phi)
        t = tn * tn
        a1 = lam * c
        c = c * self.es * c / (1 - self.es)
        a2 = a1 * a1
        x = n * a1 * (1.0 - a2 * t * (1.0 / 6 - (8.0 - t + 8.0 * c)
                                      * a2 / 120.0))
        y = y - self.m0 + n * tn * a2 * (0.5 + (5.0 - t + 6.0 * c)
                                         * a2 / 24.0)
        if self.hyperbolic:
            y = y - y ** 3 / (6.0 * self._rho_nu(phi))
        return x, y

    def _rho_nu(self, phi):
        """rho*nu in a-units^2 at latitude phi (the 9833 correction
        denominator)."""
        s2 = np.sin(phi) ** 2
        return (1.0 - self.es) / (1.0 - self.es * s2) ** 2

    def _inv(self, x, y):
        if self.es == 0.0:
            dd = y + self.phi0
            phi = np.arcsin(np.clip(np.sin(dd) * np.cos(x), -1, 1))
            lam = np.arctan2(np.tan(x), np.cos(dd))
            return lam, phi
        if self.hyperbolic:
            # invert y_h = y - y^3/(6 rho nu): fixed-point from y_h (the
            # correction is ~1e-5 relative at Vanua Levu scale)
            yc = y
            for _ in range(3):
                ph = mu.inv_mlfn(self.m0 + yc, self.es, self.en)
                yc = y + yc ** 3 / (6.0 * self._rho_nu(ph))
            y = yc
        ph1 = mu.inv_mlfn(self.m0 + y, self.es, self.en)
        tn = np.tan(ph1)
        t = tn * tn
        n = np.sin(ph1)
        r = 1.0 / (1.0 - self.es * n * n)
        n = np.sqrt(r)
        r = r * (1.0 - self.es) * n
        dd = x / n
        d2 = dd * dd
        phi = ph1 - (n * tn / r) * d2 * (0.5 - (1.0 + 3.0 * t) * d2 / 24.0)
        lam = dd * (1.0 + t * d2 * (-1.0 / 3 + (1.0 + 3.0 * t) * d2
                                    / 15.0)) / np.cos(ph1)
        return lam, phi


class Bonne(Operation):
    """Bonne, sphere + ellipsoid (bonne.cpp)."""

    proj_name = "bonne"
    EPS10 = 1e-10

    def setup(self) -> None:
        self.phi1 = float(self.params["lat_1"]) * D2R
        if abs(self.phi1) < self.EPS10:
            raise ValueError("bonne: lat_1 is zero")
        if self.es != 0.0:
            self.en = mu.enfn(self.es)
            s1 = np.sin(self.phi1)
            c1 = np.cos(self.phi1)
            self.m1 = float(mu.mlfn(np.float64(self.phi1), np.float64(s1),
                                    np.float64(c1), self.en))
            self.am1 = float(c1 / (np.sqrt(1.0 - self.es * s1 * s1) * s1))
        else:
            if abs(self.phi1) + self.EPS10 >= mu.HALFPI:
                self.cphi1 = 0.0
            else:
                self.cphi1 = 1.0 / np.tan(self.phi1)

    def _fwd(self, lam, phi):
        if self.es != 0.0:
            E = np.sin(phi)
            c = np.cos(phi)
            rh = self.am1 + self.m1 - mu.mlfn(phi, E, c, self.en)
            ok = np.abs(rh) > self.EPS10
            with np.errstate(invalid="ignore", divide="ignore"):
                E = c * lam / (rh * np.sqrt(1.0 - self.es * E * E))
            x = np.where(ok, rh * np.sin(E), 0.0)
            y = np.where(ok, self.am1 - rh * np.cos(E), 0.0)
            return x, y
        rh = self.cphi1 + self.phi1 - phi
        ok = np.abs(rh) > self.EPS10
        with np.errstate(invalid="ignore", divide="ignore"):
            E = lam * np.cos(phi) / rh
        x = np.where(ok, rh * np.sin(E), 0.0)
        y = np.where(ok, self.cphi1 - rh * np.cos(E), 0.0)
        return x, y

    def _inv(self, x, y):
        if self.es != 0.0:
            yy = self.am1 - y
            rh = np.hypot(x, yy)
            phi = mu.inv_mlfn(self.am1 + self.m1 - rh, self.es, self.en)
            s = np.abs(phi)
            with np.errstate(invalid="ignore", divide="ignore"):
                sp = np.sin(phi)
                lam = np.where(
                    s < mu.HALFPI,
                    rh * np.arctan2(x, yy) * np.sqrt(1.0 - self.es * sp * sp)
                    / np.cos(phi),
                    np.where(np.abs(s - mu.HALFPI) <= self.EPS10, 0.0, NAN))
            return lam, phi
        yy = self.cphi1 - y
        rh = np.hypot(x, yy)
        phi = self.cphi1 + self.phi1 - rh
        ok = np.abs(phi) <= mu.HALFPI
        with np.errstate(invalid="ignore", divide="ignore"):
            lam = np.where(np.abs(np.abs(phi) - mu.HALFPI) <= self.EPS10, 0.0,
                           rh * np.arctan2(x, yy) / np.cos(phi))
        return np.where(ok, lam, NAN), np.where(ok, phi, NAN)


class Somerc(Operation):
    """Swiss Oblique Mercator (somerc.cpp)."""

    proj_name = "somerc"

    def setup(self) -> None:
        e = self.e
        self.hlf_e = 0.5 * e
        cp = np.cos(self.phi0) ** 2
        self.c = np.sqrt(1 + self.es * cp * cp / self.one_es)
        sp = np.sin(self.phi0)
        self.sinp0 = sp / self.c
        phip0 = np.arcsin(self.sinp0)
        self.cosp0 = np.cos(phip0)
        sp = sp * e
        self.K = np.log(np.tan(FORTPI + 0.5 * phip0)) - self.c * (
            np.log(np.tan(FORTPI + 0.5 * self.phi0)) - self.hlf_e *
            np.log((1.0 + sp) / (1.0 - sp)))
        self.kR = self.k0 * np.sqrt(self.one_es) / (1.0 - sp * sp)

    def _fwd(self, lam, phi):
        sp = self.e * np.sin(phi)
        phip = 2.0 * np.arctan(np.exp(self.c * (
            np.log(np.tan(FORTPI + 0.5 * phi))
            - self.hlf_e * np.log((1.0 + sp) / (1.0 - sp))) + self.K)) \
            - mu.HALFPI
        lamp = self.c * lam
        cp = np.cos(phip)
        phipp = aasin(self.cosp0 * np.sin(phip)
                      - self.sinp0 * cp * np.cos(lamp))
        lampp = aasin(cp * np.sin(lamp) / np.cos(phipp))
        x = self.kR * lampp
        y = self.kR * np.log(np.tan(FORTPI + 0.5 * phipp))
        return x, y

    def _inv(self, x, y):
        phipp = 2.0 * (np.arctan(np.exp(y / self.kR)) - FORTPI)
        lampp = x / self.kR
        cp = np.cos(phipp)
        phip = aasin(self.cosp0 * np.sin(phipp)
                     + self.sinp0 * cp * np.cos(lampp))
        lamp = aasin(cp * np.sin(lampp) / np.cos(phip))
        con = (self.K - np.log(np.tan(FORTPI + 0.5 * phip))) / self.c
        for _ in range(6):
            esp = self.e * np.sin(phip)
            delp = (con + np.log(np.tan(FORTPI + 0.5 * phip)) - self.hlf_e *
                    np.log((1.0 + esp) / (1.0 - esp))) * \
                (1.0 - esp * esp) * np.cos(phip) / self.one_es
            phip = phip - delp
        return lamp / self.c, phip


class Gstmerc(Operation):
    """Gauss-Schreiber Transverse Mercator (gstmerc.cpp).

    Note: kernel emits a-units scaled by ra (matches reference's *P->ra)."""

    proj_name = "gstmerc"

    def setup(self) -> None:
        phi0 = self.phi0
        self.n1 = np.sqrt(1.0 + self.es * np.cos(phi0) ** 4 / (1.0 - self.es))
        self.phic = np.arcsin(np.sin(phi0) / self.n1)
        self.c = (np.log(mu.tsfn(np.float64(-self.phic), np.float64(0.0), 0.0))
                  - self.n1 * np.log(mu.tsfn(np.float64(-phi0),
                                             np.float64(-np.sin(phi0)),
                                             self.e)))
        self.n2 = (self.k0 * self.a * np.sqrt(1.0 - self.es)
                   / (1.0 - self.es * np.sin(phi0) ** 2))
        self.XS = 0.0
        self.YS = -self.n2 * self.phic

    def _fwd(self, lam, phi):
        L = self.n1 * lam
        Ls = self.c + self.n1 * np.log(mu.tsfn(-phi, -np.sin(phi), self.e))
        sinLs1 = np.sin(L) / np.cosh(Ls)
        Ls1 = np.log(mu.tsfn(-np.arcsin(sinLs1), np.zeros_like(L), 0.0))
        x = (self.XS + self.n2 * Ls1) / self.a
        y = (self.YS + self.n2 * np.arctan(np.sinh(Ls) / np.cos(L))) / self.a
        return x, y

    def _inv(self, x, y):
        xs = x * self.a - self.XS
        ys = y * self.a - self.YS
        L = np.arctan(np.sinh(xs / self.n2) / np.cos(ys / self.n2))
        sinC = np.sin(ys / self.n2) / np.cosh(xs / self.n2)
        LC = np.log(mu.tsfn(-np.arcsin(sinC), np.zeros_like(x), 0.0))
        lam = L / self.n1
        phi = -mu.phi2(np.exp((LC - self.c) / self.n1), self.e)
        return lam, phi


class Poly(Operation):
    """(American) Polyconic, sphere + ellipsoid (poly.cpp)."""

    proj_name = "poly"
    TOL = 1e-10

    def setup(self) -> None:
        if self.es != 0.0:
            self.en = mu.enfn(self.es)
            self.ml0 = float(mu.mlfn(np.float64(self.phi0),
                                     np.float64(np.sin(self.phi0)),
                                     np.float64(np.cos(self.phi0)), self.en))
        else:
            self.ml0 = -self.phi0

    def _fwd(self, lam, phi):
        eq = np.abs(phi) <= self.TOL
        with np.errstate(invalid="ignore", divide="ignore"):
            if self.es != 0.0:
                sp = np.sin(phi)
                cp = np.cos(phi)
                ms = np.where(np.abs(cp) > self.TOL,
                              mu.msfn(sp, cp, self.es) / sp, 0.0)
                E = lam * sp
                x = ms * np.sin(E)
                y = (mu.mlfn(phi, sp, cp, self.en) - self.ml0) \
                    + ms * (1.0 - np.cos(E))
                return np.where(eq, lam, x), np.where(eq, -self.ml0, y)
            cot = 1.0 / np.tan(phi)
            E = lam * np.sin(phi)
            x = np.sin(E) * cot
            y = phi - self.phi0 + cot * (1.0 - np.cos(E))
            return np.where(eq, lam, x), np.where(eq, self.ml0, y)

    def _inv(self, x, y):
        with np.errstate(invalid="ignore", divide="ignore"):
            if self.es != 0.0:
                yy = y + self.ml0
                eq = np.abs(yy) <= self.TOL
                r = yy * yy + x * x
                phi = np.array(yy, copy=True)
                for _ in range(20):
                    sp = np.sin(phi)
                    cp = np.cos(phi)
                    mlp = np.sqrt(1.0 - self.es * sp * sp)
                    c = sp * mlp / cp
                    ml = mu.mlfn(phi, sp, cp, self.en)
                    mlb = ml * ml + r
                    mlp2 = self.one_es / (mlp * mlp * mlp)
                    s2ph = sp * cp
                    dphi = (ml + ml + c * mlb - 2.0 * yy * (c * ml + 1.0)) / (
                        self.es * s2ph * (mlb - 2.0 * yy * ml) / c
                        + 2.0 * (yy - ml) * (c * mlp2 - 1.0 / s2ph)
                        - mlp2 - mlp2)
                    phi = phi + dphi
                c = np.sin(phi)
                lam = np.arcsin(np.clip(
                    x * np.tan(phi) * np.sqrt(1.0 - self.es * c * c),
                    -1, 1)) / np.sin(phi)
                return np.where(eq, x, lam), np.where(eq, 0.0, phi)
            yy = self.phi0 + y
            eq = np.abs(yy) <= self.TOL
            B = x * x + yy * yy
            phi = np.array(yy, copy=True)
            for _ in range(12):
                tp = np.tan(phi)
                dphi = (yy * (phi * tp + 1.0) - phi
                        - 0.5 * (phi * phi + B) * tp) / ((phi - yy) / tp - 1.0)
                phi = phi - dphi
            lam = np.arcsin(np.clip(x * np.tan(phi), -1, 1)) / np.sin(phi)
            return np.where(eq, x, lam), np.where(eq, 0.0, phi)


class Ocea(_SphOp):
    """Oblique cylindrical equal area (ocea.cpp)."""

    proj_name = "ocea"

    def _setup(self) -> None:
        self.rok = 1.0 / self.k0
        self.rtk = self.k0
        if "alpha" in self.params:
            alpha = np.pi + float(self.params["alpha"]) * D2R
            lonz = float(self.params.get("lonc", 0.0)) * D2R
            lam_p = np.arctan2(-np.cos(alpha),
                               -np.sin(self.phi0) * np.sin(alpha)) + lonz
            phi_p = np.arcsin(np.cos(self.phi0) * np.sin(alpha))
        else:
            phi_1 = float(self.params.get("lat_1", 0.0)) * D2R
            phi_2 = float(self.params.get("lat_2", 0.0)) * D2R
            lam_1 = float(self.params.get("lon_1", 0.0)) * D2R
            lam_2 = float(self.params.get("lon_2", 0.0)) * D2R
            lam_p = np.arctan2(
                np.cos(phi_1) * np.sin(phi_2) * np.cos(lam_1)
                - np.sin(phi_1) * np.cos(phi_2) * np.cos(lam_2),
                np.sin(phi_1) * np.cos(phi_2) * np.sin(lam_2)
                - np.cos(phi_1) * np.sin(phi_2) * np.sin(lam_1))
            if lam_1 == -mu.HALFPI:
                lam_p = -lam_p
            clm = np.cos(lam_p - lam_1)
            tp1 = np.tan(phi_1)
            if tp1 == 0.0:
                phi_p = -mu.HALFPI if clm >= 0.0 else mu.HALFPI
            else:
                phi_p = np.arctan(-clm / tp1)
        self.lam0 = float(lam_p + mu.HALFPI)
        self.cosphi = float(np.cos(phi_p))
        self.sinphi = float(np.sin(phi_p))

    def _fwd(self, lam, phi):
        s = np.sin(lam)
        t = np.cos(lam)
        x = np.arctan((np.tan(phi) * self.cosphi + self.sinphi * s) / t)
        x = np.where(t < 0.0, x + np.pi, x)
        x = x * self.rtk
        y = self.rok * (self.sinphi * np.sin(phi)
                        - self.cosphi * np.cos(phi) * s)
        return x, y

    def _inv(self, x, y):
        yy = y / self.rok
        xx = x / self.rtk
        t = np.sqrt(np.maximum(1.0 - yy * yy, 0.0))
        s = np.sin(xx)
        phi = np.arcsin(np.clip(yy * self.sinphi + t * self.cosphi * s, -1, 1))
        lam = np.arctan2(t * self.sinphi * s - yy * self.cosphi,
                         t * np.cos(xx))
        return lam, phi


class Tpeqd(_SphOp):
    """Two-point equidistant (tpeqd.cpp)."""

    proj_name = "tpeqd"

    def _setup(self) -> None:
        phi_1 = float(self.params.get("lat_1", 0.0)) * D2R
        lam_1 = float(self.params.get("lon_1", 0.0)) * D2R
        phi_2 = float(self.params.get("lat_2", 0.0)) * D2R
        lam_2 = float(self.params.get("lon_2", 0.0)) * D2R
        if phi_1 == phi_2 and lam_1 == lam_2:
            raise ValueError("tpeqd: control points coincide")
        self.lam0 = float(mu.adjlon(np.float64(0.5 * (lam_1 + lam_2))))
        dlam2 = float(mu.adjlon(np.float64(lam_2 - lam_1)))
        self.cp1 = np.cos(phi_1)
        self.cp2 = np.cos(phi_2)
        self.sp1 = np.sin(phi_1)
        self.sp2 = np.sin(phi_2)
        self.cs = self.cp1 * self.sp2
        self.sc = self.sp1 * self.cp2
        self.ccs = self.cp1 * self.cp2 * np.sin(dlam2)
        z02 = np.arccos(np.clip(self.sp1 * self.sp2
                                + self.cp1 * self.cp2 * np.cos(dlam2), -1, 1))
        if z02 == 0.0:
            raise ValueError("tpeqd: degenerate control points")
        self.hz0 = 0.5 * z02
        A12 = np.arctan2(self.cp2 * np.sin(dlam2),
                         self.cp1 * self.sp2
                         - self.sp1 * self.cp2 * np.cos(dlam2))
        pp = np.arcsin(np.clip(self.cp1 * np.sin(A12), -1, 1))
        self.ca = np.cos(pp)
        self.sa = np.sin(pp)
        self.lp = float(mu.adjlon(np.float64(
            np.arctan2(self.cp1 * np.cos(A12), self.sp1) - self.hz0)))
        self.dlam2 = dlam2 * 0.5
        self.lamc = mu.HALFPI - np.arctan2(np.sin(A12) * self.sp1,
                                           np.cos(A12)) - self.dlam2
        self.thz0 = np.tan(self.hz0)
        self.rhshz0 = 0.5 / np.sin(self.hz0)
        self.r2z0 = 0.5 / z02
        self.z02 = z02 * z02

    def _fwd(self, lam, phi):
        sp = np.sin(phi)
        cp = np.cos(phi)
        dl1 = lam + self.dlam2
        dl2 = lam - self.dlam2
        z1 = np.arccos(np.clip(self.sp1 * sp + self.cp1 * cp * np.cos(dl1),
                               -1, 1))
        z2 = np.arccos(np.clip(self.sp2 * sp + self.cp2 * cp * np.cos(dl2),
                               -1, 1))
        z1 = z1 * z1
        z2 = z2 * z2
        t = z1 - z2
        x = self.r2z0 * t
        t = self.z02 - t
        y = self.r2z0 * asqrt(4.0 * self.z02 * z2 - t * t)
        neg = (self.ccs * sp - cp * (self.cs * np.sin(dl1)
                                     - self.sc * np.sin(dl2))) < 0.0
        return x, np.where(neg, -y, y)

    def _inv(self, x, y):
        cz1 = np.cos(np.hypot(y, x + self.hz0))
        cz2 = np.cos(np.hypot(y, x - self.hz0))
        s = cz1 + cz2
        d = cz1 - cz2
        lam = -np.arctan2(d, s * self.thz0)
        phi = np.arccos(np.clip(np.hypot(self.thz0 * s, d) * self.rhshz0,
                                -1, 1))
        phi = np.where(y < 0.0, -phi, phi)
        sp = np.sin(phi)
        cp = np.cos(phi)
        lam = lam - self.lp
        s = np.cos(lam)
        phi2 = aasin(self.sa * sp + self.ca * cp * s)
        lam = np.arctan2(cp * np.sin(lam),
                         self.sa * cp * s - self.ca * sp) + self.lamc
        return lam, phi2


class Sconics(_SphOp):
    """Simple conics family (sconics.cpp)."""

    proj_name = "euler"
    TYPE = "euler"

    def _setup(self) -> None:
        p1 = float(self.params["lat_1"]) * D2R
        p2 = float(self.params["lat_2"]) * D2R
        del_ = 0.5 * (p2 - p1)
        self.sig = 0.5 * (p2 + p1)
        if abs(del_) < 1e-10 or abs(self.sig) < 1e-10:
            raise ValueError("sconics: invalid lat_1/lat_2")
        t = self.TYPE
        self.c1 = self.c2 = 0.0
        if t == "tissot":
            self.n = np.sin(self.sig)
            cs = np.cos(del_)
            self.rho_c = self.n / cs + cs / self.n
            self.rho_0 = np.sqrt((self.rho_c - 2 * np.sin(self.phi0)) / self.n)
        elif t == "murd1":
            self.rho_c = np.sin(del_) / (del_ * np.tan(self.sig)) + self.sig
            self.rho_0 = self.rho_c - self.phi0
            self.n = np.sin(self.sig)
        elif t == "murd2":
            cs = np.sqrt(np.cos(del_))
            self.rho_c = cs / np.tan(self.sig)
            self.rho_0 = self.rho_c + np.tan(self.sig - self.phi0)
            self.n = np.sin(self.sig) * cs
        elif t == "murd3":
            self.rho_c = del_ / (np.tan(self.sig) * np.tan(del_)) + self.sig
            self.rho_0 = self.rho_c - self.phi0
            self.n = (np.sin(self.sig) * np.sin(del_) * np.tan(del_)
                      / (del_ * del_))
        elif t == "euler":
            self.n = np.sin(self.sig) * np.sin(del_) / del_
            del_ = del_ * 0.5
            self.rho_c = del_ / (np.tan(del_) * np.tan(self.sig)) + self.sig
            self.rho_0 = self.rho_c - self.phi0
        elif t == "pconic":
            self.n = np.sin(self.sig)
            self.c2 = np.cos(del_)
            self.c1 = 1.0 / np.tan(self.sig)
            dd = self.phi0 - self.sig
            if abs(dd) - 1e-10 >= mu.HALFPI:
                raise ValueError("pconic: lat_0 half pi from mean")
            self.rho_0 = self.c2 * (self.c1 - np.tan(dd))
            self.rho_c = 0.0
        elif t == "vitk1":
            cs = np.tan(del_)
            self.n = cs * np.sin(self.sig) / del_
            self.rho_c = del_ / (cs * np.tan(self.sig)) + self.sig
            self.rho_0 = self.rho_c - self.phi0

    def _fwd(self, lam, phi):
        if self.TYPE == "murd2":
            rho = self.rho_c + np.tan(self.sig - phi)
        elif self.TYPE == "pconic":
            rho = self.c2 * (self.c1 - np.tan(phi - self.sig))
        else:
            rho = self.rho_c - phi
        lamn = lam * self.n
        return rho * np.sin(lamn), self.rho_0 - rho * np.cos(lamn)

    def _inv(self, x, y):
        yy = self.rho_0 - y
        rho = np.hypot(x, yy)
        if self.n < 0.0:
            rho = -rho
            x = -x
            yy = -yy
        lam = np.arctan2(x, yy) / self.n
        if self.TYPE == "pconic":
            phi = np.arctan(self.c1 - rho / self.c2) + self.sig
        elif self.TYPE == "murd2":
            phi = self.sig - np.arctan(rho - self.rho_c)
        else:
            phi = self.rho_c - rho
        return lam, phi


def _sconic(name):
    return type("Sconic_" + name, (Sconics,),
                {"proj_name": name, "TYPE": name})


Euler = _sconic("euler")
Murd1 = _sconic("murd1")
Murd2 = _sconic("murd2")
Murd3 = _sconic("murd3")
Pconic = _sconic("pconic")
Tissot = _sconic("tissot")
Vitk1 = _sconic("vitk1")


class Ccon(_SphOp):
    """Central conic (ccon.cpp)."""

    proj_name = "ccon"

    def _setup(self) -> None:
        self.phi1 = float(self.params["lat_1"]) * D2R
        if abs(self.phi1) < 1e-10:
            raise ValueError("ccon: lat_1 is zero")
        self.sinphi1 = np.sin(self.phi1)
        self.ctgphi1 = np.cos(self.phi1) / self.sinphi1

    def _fwd(self, lam, phi):
        r = self.ctgphi1 - np.tan(phi - self.phi1)
        ln = lam * self.sinphi1
        return r * np.sin(ln), self.ctgphi1 - r * np.cos(ln)

    def _inv(self, x, y):
        yy = self.ctgphi1 - y
        phi = self.phi1 - np.arctan(np.hypot(x, yy) - self.ctgphi1)
        lam = np.arctan2(x, yy) / self.sinphi1
        return lam, phi


class Lcca(Operation):
    """Lambert Conformal Conic Alternative (lcca.cpp)."""

    proj_name = "lcca"

    def setup(self) -> None:
        if self.phi0 == 0.0:
            raise ValueError("lcca: lat_0 is zero")
        self.en = mu.enfn(self.es)
        self.l = np.sin(self.phi0)
        self.M0 = float(mu.mlfn(np.float64(self.phi0), np.float64(self.l),
                                np.float64(np.cos(self.phi0)), self.en))
        s2p0 = self.l * self.l
        R0 = 1.0 / (1.0 - self.es * s2p0)
        N0 = np.sqrt(R0)
        R0 = R0 * self.one_es * N0
        self.r0 = N0 / np.tan(self.phi0)
        self.C = 1.0 / (6.0 * R0 * N0)

    def _fS(self, S):
        return S * (1.0 + S * S * self.C)

    def _fSp(self, S):
        return 1.0 + 3.0 * S * S * self.C

    def _fwd(self, lam, phi):
        S = mu.mlfn(phi, np.sin(phi), np.cos(phi), self.en) - self.M0
        r = self.r0 - self._fS(S)
        ln = lam * self.l
        x = self.k0 * r * np.sin(ln)
        y = self.k0 * (self.r0 - r * np.cos(ln))
        return x, y

    def _inv(self, x, y):
        x = x / self.k0
        y = y / self.k0
        theta = np.arctan2(x, self.r0 - y)
        dr = y - x * np.tan(0.5 * theta)
        lam = theta / self.l
        S = np.array(dr, copy=True)
        for _ in range(10):
            S = S - (self._fS(S) - dr) / self._fSp(S)
        phi = mu.inv_mlfn(S + self.M0, self.es, self.en)
        return lam, phi


class VanDG2(_SphOp):
    """van der Grinten II/III; no inverse (vandg2.cpp)."""

    proj_name = "vandg2"
    vdg3 = False

    def _fwd(self, lam, phi):
        TOL = 1e-10
        bt = np.abs(TWO_D_PI * phi)
        ct = asqrt(1.0 - bt * bt)
        with np.errstate(invalid="ignore", divide="ignore"):
            at = 0.5 * np.abs(np.pi / lam - lam / np.pi)
            if self.vdg3:
                x1 = bt / (1.0 + ct)
                xg = np.pi * (np.sqrt(at * at + 1.0 - x1 * x1) - at)
                yg = np.pi * x1
            else:
                x1 = (ct * np.sqrt(1.0 + at * at) - at * ct * ct) \
                    / (1.0 + at * at * bt * bt)
                xg = np.pi * x1
                yg = np.pi * np.sqrt(np.maximum(
                    1.0 - x1 * (x1 + 2.0 * at) + TOL, 0.0))
        xg = np.where(lam < 0.0, -xg, xg)
        yg = np.where(phi < 0.0, -yg, yg)
        center = np.abs(lam) < TOL
        y0 = np.pi * np.where(phi < 0.0, -bt, bt) / (1.0 + ct)
        return np.where(center, 0.0, xg), np.where(center, y0, yg)


class VanDG3(VanDG2):
    proj_name = "vandg3"
    vdg3 = True


class VanDG4(_SphOp):
    """van der Grinten IV; no inverse (vandg4.cpp)."""

    proj_name = "vandg4"

    def _fwd(self, lam, phi):
        TOL = 1e-10
        with np.errstate(invalid="ignore", divide="ignore"):
            bt = np.abs(TWO_D_PI * phi)
            bt2 = bt * bt
            ct = 0.5 * (bt * (8.0 - bt * (2.0 + bt2)) - 5.0) \
                / (bt2 * (bt - 1.0))
            ct2 = ct * ct
            dt = TWO_D_PI * lam
            dt = dt + 1.0 / dt
            dt = np.sqrt(np.maximum(dt * dt - 4.0, 0.0))
            dt = np.where((np.abs(lam) - mu.HALFPI) < 0.0, -dt, dt)
            dt2 = dt * dt
            x1 = (bt + ct) ** 2
            t = bt + 3.0 * ct
            ft = x1 * (bt2 + ct2 * dt2 - 1.0) + (1.0 - bt2) * (
                bt2 * (t * t + 4.0 * ct2) + ct2 * (12.0 * bt * ct
                                                   + 4.0 * ct2))
            x1v = (dt * (x1 + ct2 - 1.0) + 2.0 * np.sqrt(np.maximum(ft, 0.0))) \
                / (4.0 * x1 + dt2)
            xg = mu.HALFPI * x1v
            yg = mu.HALFPI * np.sqrt(np.maximum(
                1.0 + dt * np.abs(x1v) - x1v * x1v, 0.0))
        xg = np.where(lam < 0.0, -xg, xg)
        yg = np.where(phi < 0.0, -yg, yg)
        eq = np.abs(phi) < TOL
        mid = (np.abs(lam) < TOL) | (np.abs(np.abs(phi) - mu.HALFPI) < TOL)
        x = np.where(eq, lam, np.where(mid, 0.0, xg))
        y = np.where(eq, 0.0, np.where(mid, phi, yg))
        return x, y


class Oea(_SphOp):
    """Oblated equal area (oea.cpp)."""

    proj_name = "oea"

    def _setup(self) -> None:
        self.n = float(self.params["n"])
        self.m = float(self.params["m"])
        if self.n <= 0.0 or self.m <= 0.0:
            raise ValueError("oea: m/n must be positive")
        self.theta = float(self.params.get("theta", 0.0)) * D2R
        self.sp0 = np.sin(self.phi0)
        self.cp0 = np.cos(self.phi0)
        self.rn = 1.0 / self.n
        self.rm = 1.0 / self.m
        self.two_r_n = 2.0 * self.rn
        self.two_r_m = 2.0 * self.rm
        self.hm = 0.5 * self.m
        self.hn = 0.5 * self.n

    def _fwd(self, lam, phi):
        cp = np.cos(phi)
        sp = np.sin(phi)
        cl = np.cos(lam)
        Az = np.arctan2(cp * np.sin(lam),
                        self.cp0 * sp - self.sp0 * cp * cl) + self.theta
        shz = np.sin(0.5 * np.arccos(np.clip(
            self.sp0 * sp + self.cp0 * cp * cl, -1, 1)))
        M = aasin(shz * np.sin(Az))
        N = aasin(shz * np.cos(Az) * np.cos(M) / np.cos(M * self.two_r_m))
        y = self.n * np.sin(N * self.two_r_n)
        x = self.m * np.sin(M * self.two_r_m) * np.cos(N) \
            / np.cos(N * self.two_r_n)
        return x, y

    def _inv(self, x, y):
        N = self.hn * aasin(y * self.rn)
        M = self.hm * aasin(x * self.rm * np.cos(N * self.two_r_n)
                            / np.cos(N))
        xp = 2.0 * np.sin(M)
        yp = 2.0 * np.sin(N) * np.cos(M * self.two_r_m) / np.cos(M)
        Az = np.arctan2(xp, yp) - self.theta
        cAz = np.cos(Az)
        z = 2.0 * aasin(0.5 * np.hypot(xp, yp))
        sz = np.sin(z)
        cz = np.cos(z)
        phi = aasin(self.sp0 * cz + self.cp0 * sz * cAz)
        lam = np.arctan2(sz * np.sin(Az), self.cp0 * cz - self.sp0 * sz * cAz)
        return lam, phi


class Gins8(_SphOp):
    """Ginsburg VIII; no inverse (gins8.cpp)."""

    proj_name = "gins8"

    def _fwd(self, lam, phi):
        t = phi * phi
        y = phi * (1.0 + t / 12.0)
        x = lam * (1.0 - 0.162388 * t)
        t = lam * lam
        x = x * (0.87 - 0.000952426 * t * t)
        return x, y


REGISTRY = {
    c.proj_name: c for c in (
        Cass, Bonne, Somerc, Gstmerc, Poly, Ocea, Tpeqd,
        Euler, Murd1, Murd2, Murd3, Pconic, Tissot, Vitk1, Ccon, Lcca,
        VanDG2, VanDG3, VanDG4, Oea, Gins8,
    )
}
