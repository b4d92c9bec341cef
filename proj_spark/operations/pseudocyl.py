"""Pseudocylindrical projections (sinusoidal/Mollweide/Eckert/Putnins/
Urmayev/Wagner/McBryde-Thomas/... families).

NumPy batch re-expressions of the reference operators in
src/projections/{gn_sinu,moll,eck1..eck6,sts,putp*,urm5,urmfps,wag2,
wag3,wink1,wink2,crast,collg,boggs,denoy,fahey,fouc_s,hatano,loxim,
mbt_fps,mbtfpp,mbtfpq,nell,nell_h}.cpp.  All iterative solvers run as
fixed-count vectorized Newton loops with the reference's pole fallbacks
applied by mask.  Most of these operators force a sphere (P->es = 0).
"""

from __future__ import annotations

import numpy as np

from proj_spark import mathutils as mu
from proj_spark.operations.base import Operation

NAN = np.float64(np.nan)
FORTPI = np.pi / 4


def aasin(v):
    """Clamped arcsine (reference src/aasincos.cpp)."""
    bad = np.abs(v) > 1.00000000000001
    return np.where(bad, NAN, np.arcsin(np.clip(v, -1.0, 1.0)))


def asqrt(v):
    return np.sqrt(np.maximum(v, 0.0))


class _SphOp(Operation):
    """Base for sphere-forced operators (the reference sets P->es = 0)."""

    def setup(self) -> None:
        self.es = 0.0
        self.e = 0.0
        self.one_es = 1.0
        self._setup()

    def _setup(self) -> None:
        pass


# ---------------------------------------------------------------------------
# sinusoidal family (gn_sinu.cpp): x = C_x lam (m + cos th), y = C_y th
# ---------------------------------------------------------------------------

class GnSinu(_SphOp):
    proj_name = "gn_sinu"
    _m: float | None = None
    _n: float | None = None

    def _setup(self) -> None:
        if self._m is None:
            self.m = float(self.params["m"])
            self.n = float(self.params["n"])
        else:
            self.m, self.n = self._m, self._n
        self.C_y = np.sqrt((self.m + 1.0) / self.n)
        self.C_x = self.C_y / (self.m + 1.0)

    def _fwd(self, lam, phi):
        if self.m == 0.0:
            th = aasin(self.n * np.sin(phi)) if self.n != 1.0 else phi
        else:
            k = self.n * np.sin(phi)
            th = np.array(phi, copy=True)
            for _ in range(8):
                th = th - (self.m * th + np.sin(th) - k) / (self.m + np.cos(th))
        x = self.C_x * lam * (self.m + np.cos(th))
        y = self.C_y * th
        return x, y

    def _inv(self, x, y):
        yy = y / self.C_y
        if self.m != 0.0:
            phi = aasin((self.m * yy + np.sin(yy)) / self.n)
        else:
            phi = aasin(np.sin(yy) / self.n) if self.n != 1.0 else yy
        lam = x / (self.C_x * (self.m + np.cos(yy)))
        return lam, phi


class Sinu(GnSinu):
    """Sinusoidal; ellipsoidal form uses the meridional arc (gn_sinu.cpp)."""

    proj_name = "sinu"
    _m, _n = 0.0, 1.0

    def _setup(self) -> None:
        self.ell_es = self.ell.es
        if self.ell_es != 0.0:
            self.es = self.ell_es
            self.e = self.ell.e
            self.one_es = self.ell.one_es
            self.en = mu.enfn(self.es)
        else:
            GnSinu._setup(self)

    def setup(self) -> None:
        # keep the ellipsoid if one was given (unlike the pure-sphere ops)
        self._setup()

    def _fwd(self, lam, phi):
        if self.es == 0.0:
            return GnSinu._fwd(self, lam, phi)
        s = np.sin(phi)
        c = np.cos(phi)
        y = mu.mlfn(phi, s, c, self.en)
        x = lam * c / np.sqrt(1.0 - self.es * s * s)
        return x, y

    def _inv(self, x, y):
        if self.es == 0.0:
            return GnSinu._inv(self, x, y)
        phi = mu.inv_mlfn(y, self.es, self.en)
        s = np.abs(phi)
        with np.errstate(invalid="ignore", divide="ignore"):
            lam = np.where(
                s < mu.HALFPI,
                x * np.sqrt(1.0 - self.es * np.sin(phi) ** 2) / np.cos(phi),
                np.where(s - 1e-10 < mu.HALFPI, 0.0, NAN))
        return lam, phi


class Eck6(GnSinu):
    proj_name = "eck6"
    _m, _n = 1.0, 2.570796326794896619231321691


class Mbtfps(GnSinu):
    proj_name = "mbtfps"
    _m, _n = 0.5, 1.785398163397448309615660845


# ---------------------------------------------------------------------------
# Mollweide family (moll.cpp)
# ---------------------------------------------------------------------------

class Moll(_SphOp):
    proj_name = "moll"
    _p = np.pi / 2

    def _setup(self) -> None:
        p = self._p
        p2 = p + p
        sp = np.sin(p)
        r = np.sqrt(2 * np.pi * sp / (p2 + np.sin(p2)))
        self.C_x = 2.0 * r / np.pi
        self.C_y = r / sp
        self.C_p = p2 + np.sin(p2)

    def _fwd(self, lam, phi):
        k = self.C_p * np.sin(phi)
        th = np.array(phi, copy=True)
        V = np.ones_like(th)
        for _ in range(10):
            V = (th + np.sin(th) - k) / (1.0 + np.cos(th))
            th = th - V
        bad = np.abs(V) >= 1e-7
        th = np.where(bad, np.where(phi < 0, -mu.HALFPI, mu.HALFPI), th * 0.5)
        x = self.C_x * lam * np.cos(th)
        y = self.C_y * np.sin(th)
        return x, y

    def _inv(self, x, y):
        th = aasin(y / self.C_y)
        with np.errstate(invalid="ignore", divide="ignore"):
            lam = x / (self.C_x * np.cos(th))
        th = th + th
        phi = aasin((th + np.sin(th)) / self.C_p)
        ok = np.abs(lam) < np.pi
        return np.where(ok, lam, NAN), np.where(ok, phi, NAN)


class Wag4(Moll):
    proj_name = "wag4"
    _p = np.pi / 3


class Wag5(Moll):
    proj_name = "wag5"

    def _setup(self) -> None:
        self.C_x = 0.90977
        self.C_y = 1.65014
        self.C_p = 3.00896


# ---------------------------------------------------------------------------
# Eckert I/II/III-family/IV/V (eck1..eck5.cpp)
# ---------------------------------------------------------------------------

class Eck1(_SphOp):
    proj_name = "eck1"
    FC = 0.92131773192356127802
    RP = 0.31830988618379067154

    def _fwd(self, lam, phi):
        x = self.FC * lam * (1.0 - self.RP * np.abs(phi))
        return x, self.FC * phi

    def _inv(self, x, y):
        phi = y / self.FC
        lam = x / (self.FC * (1.0 - self.RP * np.abs(phi)))
        return lam, phi


class Eck2(_SphOp):
    proj_name = "eck2"
    FXC = 0.46065886596178063902
    FYC = 1.44720250911653531871

    def _fwd(self, lam, phi):
        s = np.sqrt(4.0 - 3.0 * np.sin(np.abs(phi)))
        x = self.FXC * lam * s
        y = self.FYC * (2.0 - s)
        return x, np.where(phi < 0, -y, y)

    def _inv(self, x, y):
        t = 2.0 - np.abs(y) / self.FYC
        lam = x / (self.FXC * t)
        phi = (4.0 - t * t) / 3.0
        ok = np.abs(phi) <= 1.0000001
        phi = np.where(np.abs(phi) >= 1.0,
                       np.where(phi < 0, -mu.HALFPI, mu.HALFPI),
                       np.arcsin(np.clip(phi, -1, 1)))
        phi = np.where(y < 0, -phi, phi)
        return np.where(ok, lam, NAN), np.where(ok, phi, NAN)


class Eck3(_SphOp):
    """x = C_x lam (A + sqrt(1 - B phi^2)), y = C_y phi (eck3.cpp)."""

    proj_name = "eck3"
    C_x, C_y = 0.42223820031577120149, 0.84447640063154240298
    A, B = 1.0, 0.4052847345693510857755

    def _fwd(self, lam, phi):
        y = self.C_y * phi
        x = self.C_x * lam * (self.A + asqrt(1.0 - self.B * phi * phi))
        return x, y

    def _inv(self, x, y):
        phi = y / self.C_y
        den = self.C_x * (self.A + asqrt(1.0 - self.B * phi * phi))
        with np.errstate(invalid="ignore", divide="ignore"):
            lam = np.where(den == 0.0, NAN, x / np.where(den == 0, 1.0, den))
        return lam, phi


class Kav7(Eck3):
    proj_name = "kav7"
    C_x, C_y = 0.8660254037844, 1.0
    A, B = 0.0, 0.30396355092701331433


class Wag6(Eck3):
    proj_name = "wag6"
    C_x = C_y = 0.94745
    A, B = 0.0, 0.30396355092701331433


class Putp1(Eck3):
    proj_name = "putp1"
    C_x, C_y = 1.89490, 0.94745
    A, B = -0.5, 0.30396355092701331433


class Eck4(_SphOp):
    proj_name = "eck4"
    C_x = 0.42223820031577120149
    C_y = 1.32650042817700232218
    RC_y = 0.75386330736002178205
    C_p = 3.57079632679489661922
    RC_p = 0.28004957675577868795

    def _fwd(self, lam, phi):
        p = self.C_p * np.sin(phi)
        V = phi * phi
        th = phi * (0.895168 + V * (0.0218849 + V * 0.00826809))
        dV = np.ones_like(th)
        for _ in range(6):
            c = np.cos(th)
            s = np.sin(th)
            dV = (th + s * (c + 2.0) - p) / (1.0 + c * (c + 2.0) - s * s)
            th = th - dV
        bad = np.abs(dV) >= 1e-7
        x = np.where(bad, self.C_x * lam,
                     self.C_x * lam * (1.0 + np.cos(th)))
        y = np.where(bad, np.where(th < 0, -self.C_y, self.C_y),
                     self.C_y * np.sin(th))
        return x, y

    def _inv(self, x, y):
        th = aasin(y * self.RC_y)
        c = np.cos(th)
        lam = x / (self.C_x * (1.0 + c))
        phi = aasin((th + np.sin(th) * (c + 2.0)) * self.RC_p)
        return lam, phi


class Eck5(_SphOp):
    proj_name = "eck5"
    XF, RXF = 0.44101277172455148219, 2.26750802723822639137
    YF, RYF = 0.88202554344910296438, 1.13375401361911319568

    def _fwd(self, lam, phi):
        return self.XF * (1.0 + np.cos(phi)) * lam, self.YF * phi

    def _inv(self, x, y):
        phi = self.RYF * y
        lam = self.RXF * x / (1.0 + np.cos(phi))
        return lam, phi


# ---------------------------------------------------------------------------
# Putnins P2..P6, Urmayev, Wagner, misc small sphere ops
# ---------------------------------------------------------------------------

class Putp2(_SphOp):
    proj_name = "putp2"
    C_x, C_y, C_p = 1.89490, 1.71848, 0.6141848493043784

    def _fwd(self, lam, phi):
        p = self.C_p * np.sin(phi)
        s = phi * phi
        th = phi * (0.615709 + s * (0.00909953 + s * 0.0046292))
        V = np.ones_like(th)
        for _ in range(10):
            c = np.cos(th)
            s = np.sin(th)
            V = (th + s * (c - 1.0) - p) / (1.0 + c * (c - 1.0) - s * s)
            th = th - V
        pole = np.pi / 3
        th = np.where(np.abs(V) >= 1e-10,
                      np.where(th < 0, -pole, pole), th)
        return self.C_x * lam * (np.cos(th) - 0.5), self.C_y * np.sin(th)

    def _inv(self, x, y):
        th = aasin(y / self.C_y)
        c = np.cos(th)
        lam = x / (self.C_x * (c - 0.5))
        phi = aasin((th + np.sin(th) * (c - 1.0)) / self.C_p)
        return lam, phi


class Putp3(_SphOp):
    proj_name = "putp3"
    C = 0.79788456
    A = 4.0 * 0.1013211836

    def _fwd(self, lam, phi):
        return self.C * lam * (1.0 - self.A * phi * phi), self.C * phi

    def _inv(self, x, y):
        phi = y / self.C
        lam = x / (self.C * (1.0 - self.A * phi * phi))
        return lam, phi


class Putp3p(Putp3):
    proj_name = "putp3p"
    A = 2.0 * 0.1013211836


class Putp4p(_SphOp):
    proj_name = "putp4p"
    C_x, C_y = 0.874038744, 3.883251825

    def _fwd(self, lam, phi):
        th = aasin(0.883883476 * np.sin(phi))
        x = self.C_x * lam * np.cos(th)
        th = th / 3.0
        x = x / np.cos(th)
        y = self.C_y * np.sin(th)
        return x, y

    def _inv(self, x, y):
        th = aasin(y / self.C_y)
        lam = x * np.cos(th) / self.C_x
        th = th * 3.0
        lam = lam / np.cos(th)
        phi = aasin(1.13137085 * np.sin(th))
        return lam, phi


class Weren(Putp4p):
    proj_name = "weren"
    C_x, C_y = 1.0, 4.442882938


class Putp5(_SphOp):
    proj_name = "putp5"
    C, D = 1.01346, 1.2158542
    A, B = 2.0, 1.0

    def _fwd(self, lam, phi):
        x = self.C * lam * (self.A - self.B * np.sqrt(1.0 + self.D * phi * phi))
        return x, self.C * phi

    def _inv(self, x, y):
        phi = y / self.C
        lam = x / (self.C * (self.A - self.B * np.sqrt(1.0 + self.D * phi * phi)))
        return lam, phi


class Putp5p(Putp5):
    proj_name = "putp5p"
    A, B = 1.5, 0.5


class Putp6(_SphOp):
    proj_name = "putp6"
    C_x, C_y = 1.01346, 0.91910
    A, B, D = 4.0, 2.1471437182129378784, 2.0

    def _fwd(self, lam, phi):
        p = self.B * np.sin(phi)
        th = phi * 1.10265779
        V = np.ones_like(th)
        for _ in range(10):
            r = np.sqrt(1.0 + th * th)
            V = ((self.A - r) * th - np.log(th + r) - p) / (self.A - 2.0 * r)
            th = th - V
        pole = 1.732050807568877
        th = np.where(np.abs(V) >= 1e-10, np.where(p < 0, -pole, pole), th)
        x = self.C_x * lam * (self.D - np.sqrt(1.0 + th * th))
        return x, self.C_y * th

    def _inv(self, x, y):
        th = y / self.C_y
        r = np.sqrt(1.0 + th * th)
        lam = x / (self.C_x * (self.D - r))
        phi = aasin(((self.A - r) * th - np.log(th + r)) / self.B)
        return lam, phi


class Putp6p(Putp6):
    proj_name = "putp6p"
    C_x, C_y = 0.44329, 0.80404
    A, B, D = 6.0, 5.61125, 3.0


class Urmfps(_SphOp):
    proj_name = "urmfps"
    C_x, Cy = 0.8773826753, 1.139753528477
    _n: float | None = None

    def _setup(self) -> None:
        self.n = float(self.params["n"]) if self._n is None else self._n
        if not 0.0 < self.n <= 1.0:
            raise ValueError("urmfps: n not in (0,1]")
        self.C_y = self.Cy / self.n

    def _fwd(self, lam, phi):
        th = aasin(self.n * np.sin(phi))
        return self.C_x * lam * np.cos(th), self.C_y * th

    def _inv(self, x, y):
        yy = y / self.C_y
        phi = aasin(np.sin(yy) / self.n)
        lam = x / (self.C_x * np.cos(yy))
        return lam, phi


class Wag1(Urmfps):
    proj_name = "wag1"
    _n = 0.8660254037844386467637231707


class Urm5(_SphOp):
    proj_name = "urm5"

    def _setup(self) -> None:
        self.n = float(self.params["n"])
        if not 0.0 < self.n <= 1.0:
            raise ValueError("urm5: n not in (0,1]")
        self.q3 = float(self.params.get("q", 0.0)) / 3.0
        alpha = float(self.params.get("alpha", 0.0)) * np.pi / 180.0
        t = self.n * np.sin(alpha)
        self.m = np.cos(alpha) / np.sqrt(1.0 - t * t)
        self.rmn = 1.0 / (self.m * self.n)

    def _fwd(self, lam, phi):
        th = aasin(self.n * np.sin(phi))
        x = self.m * lam * np.cos(th)
        t2 = th * th
        y = th * (1.0 + t2 * self.q3) * self.rmn
        return x, y

    def _inv(self, x, y):
        raise NotImplementedError("urm5 has no inverse (reference: inv=nullptr)")


class Wag2(_SphOp):
    proj_name = "wag2"
    C_x, C_y = 0.92483, 1.38725
    C_p1, C_p2 = 0.88022, 0.88550

    def _fwd(self, lam, phi):
        th = aasin(self.C_p1 * np.sin(self.C_p2 * phi))
        return self.C_x * lam * np.cos(th), self.C_y * th

    def _inv(self, x, y):
        th = y / self.C_y
        lam = x / (self.C_x * np.cos(th))
        phi = aasin(np.sin(th) / self.C_p1) / self.C_p2
        return lam, phi


class Wag3(_SphOp):
    proj_name = "wag3"

    def _setup(self) -> None:
        ts = float(self.params.get("lat_ts", 0.0)) * np.pi / 180.0
        self.C_x = np.cos(ts) / np.cos(2.0 * ts / 3.0)

    def _fwd(self, lam, phi):
        return self.C_x * lam * np.cos(2.0 / 3.0 * phi), phi

    def _inv(self, x, y):
        return x / (self.C_x * np.cos(2.0 / 3.0 * y)), y


class Wink1(_SphOp):
    proj_name = "wink1"

    def _setup(self) -> None:
        self.cosphi1 = np.cos(float(self.params.get("lat_ts", 0.0))
                              * np.pi / 180.0)

    def _fwd(self, lam, phi):
        return 0.5 * lam * (self.cosphi1 + np.cos(phi)), phi

    def _inv(self, x, y):
        return x / (0.5 * (self.cosphi1 + np.cos(y))), y


class Wink2(_SphOp):
    proj_name = "wink2"

    def _setup(self) -> None:
        self.cosphi1 = np.cos(float(self.params.get("lat_1", 0.0))
                              * np.pi / 180.0)

    def _fwd(self, lam, phi):
        y0 = phi * 2.0 / np.pi
        k = np.pi * np.sin(phi)
        th = phi * 1.8
        V = np.ones_like(th)
        for _ in range(10):
            V = (th + np.sin(th) - k) / (1.0 + np.cos(th))
            th = th - V
        th = np.where(np.abs(V) >= 1e-7,
                      np.where(th < 0, -mu.HALFPI, mu.HALFPI), th * 0.5)
        x = 0.5 * lam * (np.cos(th) + self.cosphi1)
        y = FORTPI * (np.sin(th) + y0)
        return x, y


class Crast(_SphOp):
    proj_name = "crast"
    XM, RXM = 0.97720502380583984317, 1.02332670794648848847
    YM, RYM = 3.06998012383946546542, 0.32573500793527994772

    def _fwd(self, lam, phi):
        p3 = phi / 3.0
        return self.XM * lam * (2.0 * np.cos(p3 + p3) - 1.0), \
            self.YM * np.sin(p3)

    def _inv(self, x, y):
        phi = 3.0 * np.arcsin(np.clip(y * self.RYM, -1, 1))
        lam = x * self.RXM / (2.0 * np.cos((phi + phi) / 3.0) - 1.0)
        return lam, phi


class Collg(_SphOp):
    proj_name = "collg"
    FXC, FYC = 1.12837916709551257390, 1.77245385090551602729

    def _fwd(self, lam, phi):
        s = asqrt(1.0 - np.sin(phi))
        return self.FXC * lam * s, self.FYC * (1.0 - s)

    def _inv(self, x, y):
        t = y / self.FYC - 1.0
        p = 1.0 - t * t
        ok = np.abs(p) <= 1.0000001
        phi = np.where(np.abs(p) < 1.0, np.arcsin(np.clip(p, -1, 1)),
                       np.where(p < 0, -mu.HALFPI, mu.HALFPI))
        s = 1.0 - np.sin(phi)
        with np.errstate(invalid="ignore", divide="ignore"):
            lam = np.where(s <= 0.0, 0.0, x / (self.FXC * asqrt(s)))
        return np.where(ok, lam, NAN), np.where(ok, phi, NAN)


class Boggs(_SphOp):
    """Boggs Eumorphic; no inverse (boggs.cpp)."""

    proj_name = "boggs"
    FXC, FXC2, FYC = 2.00276, 1.11072, 0.49931

    def _fwd(self, lam, phi):
        theta = np.array(phi, copy=True)
        c = np.sin(theta) * np.pi
        for _ in range(20):
            theta = theta - (theta + np.sin(theta) - c) / (1.0 + np.cos(theta))
        theta = theta * 0.5
        at_pole = np.abs(np.abs(phi) - mu.HALFPI) < 1e-7
        with np.errstate(invalid="ignore", divide="ignore"):
            x = np.where(at_pole, 0.0,
                         self.FXC * lam / (1.0 / np.cos(phi)
                                           + self.FXC2 / np.cos(theta)))
        y = self.FYC * (phi + np.sqrt(2.0) * np.sin(theta))
        return x, y


class Denoy(_SphOp):
    """Denoyer semi-elliptical; no inverse (denoy.cpp)."""

    proj_name = "denoy"

    def _fwd(self, lam, phi):
        al = np.abs(lam)
        x = lam * np.cos(
            (0.95 + al * (-1.0 / 12 + al * al * (1.0 / 600)))
            * (phi * (0.9 + 0.03 * phi ** 4)))
        return x, phi


class Fahey(_SphOp):
    proj_name = "fahey"

    def _fwd(self, lam, phi):
        t = np.tan(0.5 * phi)
        y = 1.819152 * t
        x = 0.819152 * lam * asqrt(1.0 - t * t)
        return x, y

    def _inv(self, x, y):
        t = y / 1.819152
        phi = 2.0 * np.arctan(t)
        t = 1.0 - t * t
        with np.errstate(invalid="ignore", divide="ignore"):
            lam = np.where(np.abs(t) < 1e-6, 0.0,
                           x / (0.819152 * np.sqrt(np.abs(t))))
        return lam, phi


class FoucS(_SphOp):
    proj_name = "fouc_s"

    def _setup(self) -> None:
        self.n = float(self.params.get("n", 0.0))
        if not 0.0 <= self.n <= 1.0:
            raise ValueError("fouc_s: n not in [0,1]")
        self.n1 = 1.0 - self.n

    def _fwd(self, lam, phi):
        t = np.cos(phi)
        x = lam * t / (self.n + self.n1 * t)
        y = self.n * phi + self.n1 * np.sin(phi)
        return x, y

    def _inv(self, x, y):
        if self.n != 0.0:
            phi = np.array(y, copy=True)
            V = np.ones_like(phi)
            for _ in range(10):
                V = (self.n * phi + self.n1 * np.sin(phi) - y) \
                    / (self.n + self.n1 * np.cos(phi))
                phi = phi - V
            phi = np.where(np.abs(V) >= 1e-7,
                           np.where(y < 0, -mu.HALFPI, mu.HALFPI), phi)
        else:
            phi = aasin(y)
        V = np.cos(phi)
        lam = x * (self.n + self.n1 * V) / V
        return lam, phi


class Sts(_SphOp):
    """Foucaut/Kavraisky V/quartic-authalic/McBryde-Thomas sine family."""

    proj_name = "kav5"
    _p, _q, _tan = 1.50488, 1.35439, False

    def _setup(self) -> None:
        self.C_x = self._q / self._p
        self.C_y = self._p
        self.C_p = 1.0 / self._q

    def _fwd(self, lam, phi):
        x = self.C_x * lam * np.cos(phi)
        th = phi * self.C_p
        c = np.cos(th)
        if self._tan:
            x = x * c * c
            y = self.C_y * np.tan(th)
        else:
            x = x / c
            y = self.C_y * np.sin(th)
        return x, y

    def _inv(self, x, y):
        yy = y / self.C_y
        th = np.arctan(yy) if self._tan else aasin(yy)
        c = np.cos(th)
        phi = th / self.C_p
        lam = x / (self.C_x * np.cos(phi))
        lam = lam / (c * c) if self._tan else lam * c
        return lam, phi


class Fouc(Sts):
    proj_name = "fouc"
    _p, _q, _tan = 2.0, 2.0, True


class QuaAut(Sts):
    proj_name = "qua_aut"
    _p, _q, _tan = 2.0, 2.0, False


class MbtS(Sts):
    proj_name = "mbt_s"
    _p, _q, _tan = 1.48875, 1.36509, False


class Hatano(_SphOp):
    proj_name = "hatano"
    CN, CS = 2.67595, 2.43763
    RCN, RCS = 0.37369906014686373063, 0.41023453108141924738
    FYCN, FYCS = 1.75859, 1.93052
    RYCN, RYCS = 0.56863737426006061674, 0.51799515156538134803
    FXC, RXC = 0.85, 1.17647058823529411764

    def _fwd(self, lam, phi):
        c = np.sin(phi) * np.where(phi < 0, self.CS, self.CN)
        th = np.array(phi, copy=True)
        for _ in range(20):
            th = th - (th + np.sin(th) - c) / (1.0 + np.cos(th))
        th = th * 0.5
        x = self.FXC * lam * np.cos(th)
        y = np.sin(th) * np.where(th < 0, self.FYCS, self.FYCN)
        return x, y

    def _inv(self, x, y):
        th = y * np.where(y < 0, self.RYCS, self.RYCN)
        ok = np.abs(th) <= 1.000001
        th = np.where(np.abs(th) > 1.0,
                      np.where(th > 0, mu.HALFPI, -mu.HALFPI),
                      np.arcsin(np.clip(th, -1, 1)))
        lam = self.RXC * x / np.cos(th)
        th = th + th
        phi = (th + np.sin(th)) * np.where(y < 0, self.RCS, self.RCN)
        ok &= np.abs(phi) <= 1.000001
        phi = np.where(np.abs(phi) > 1.0,
                       np.where(phi > 0, mu.HALFPI, -mu.HALFPI),
                       np.arcsin(np.clip(phi, -1, 1)))
        return np.where(ok, lam, NAN), np.where(ok, phi, NAN)


class Loxim(_SphOp):
    proj_name = "loxim"
    EPS = 1e-8

    def _setup(self) -> None:
        self.phi1 = float(self.params.get("lat_1", 40.0)) * np.pi / 180.0
        self.cosphi1 = np.cos(self.phi1)
        if self.cosphi1 < self.EPS:
            raise ValueError("loxim: |lat_1| ~ 90")
        self.tanphi1 = np.tan(FORTPI + 0.5 * self.phi1)

    def _fwd(self, lam, phi):
        dy = phi - self.phi1
        t = FORTPI + 0.5 * phi
        deg_t = (np.abs(t) < self.EPS) | (np.abs(np.abs(t) - mu.HALFPI) < self.EPS)
        with np.errstate(invalid="ignore", divide="ignore"):
            x_gen = lam * dy / np.log(np.tan(np.where(deg_t, FORTPI, t))
                                      / self.tanphi1)
        x = np.where(np.abs(dy) < self.EPS, lam * self.cosphi1,
                     np.where(deg_t, 0.0, x_gen))
        return x, dy

    def _inv(self, x, y):
        phi = y + self.phi1
        t = FORTPI + 0.5 * phi
        deg_t = (np.abs(t) < self.EPS) | (np.abs(np.abs(t) - mu.HALFPI) < self.EPS)
        with np.errstate(invalid="ignore", divide="ignore"):
            lam_gen = x * np.log(np.tan(np.where(deg_t, FORTPI, t))
                                 / self.tanphi1) / np.where(y == 0, 1.0, y)
        lam = np.where(np.abs(y) < self.EPS, x / self.cosphi1,
                       np.where(deg_t, 0.0, lam_gen))
        return lam, phi


class MbtFps(_SphOp):
    proj_name = "mbt_fps"
    C1, C2, C3 = 0.45503, 1.36509, 1.41546
    C_x, C_y = 0.22248, 1.44492

    def _fwd(self, lam, phi):
        k = self.C3 * np.sin(phi)
        th = np.array(phi, copy=True)
        for _ in range(10):
            t = th / self.C2
            th = th - (self.C1 * np.sin(t) + np.sin(th) - k) \
                / (np.cos(t) / 3.0 + np.cos(th))
        t = th / self.C2
        x = self.C_x * lam * (1.0 + 3.0 * np.cos(th) / np.cos(t))
        y = self.C_y * np.sin(t)
        return x, y

    def _inv(self, x, y):
        t = aasin(y / self.C_y)
        phi = self.C2 * t
        lam = x / (self.C_x * (1.0 + 3.0 * np.cos(phi) / np.cos(t)))
        phi = aasin((self.C1 * np.sin(t) + np.sin(phi)) / self.C3)
        return lam, phi


class Mbtfpp(_SphOp):
    proj_name = "mbtfpp"
    CS = 0.95257934441568037152
    FXC, FYC = 0.92582009977255146156, 3.40168025708304504493

    def _fwd(self, lam, phi):
        th = np.arcsin(np.clip(self.CS * np.sin(phi), -1, 1))
        x = self.FXC * lam * (2.0 * np.cos(2.0 / 3.0 * th) - 1.0)
        y = self.FYC * np.sin(th / 3.0)
        return x, y

    def _inv(self, x, y):
        phi = y / self.FYC
        ok = np.abs(phi) <= 1.0000001
        phi = np.where(np.abs(phi) >= 1.0,
                       np.where(phi < 0, -mu.HALFPI, mu.HALFPI),
                       np.arcsin(np.clip(phi, -1, 1)))
        phi = phi * 3.0
        lam = x / (self.FXC * (2.0 * np.cos(2.0 / 3.0 * phi) - 1.0))
        s = np.sin(phi) / self.CS
        ok &= np.abs(s) <= 1.0000001
        phi = np.where(np.abs(s) >= 1.0,
                       np.where(s < 0, -mu.HALFPI, mu.HALFPI),
                       np.arcsin(np.clip(s, -1, 1)))
        return np.where(ok, lam, NAN), np.where(ok, phi, NAN)


class Mbtfpq(_SphOp):
    proj_name = "mbtfpq"
    C, RC = 1.70710678118654752440, 0.58578643762690495119
    FYC, RYC = 1.87475828462269495505, 0.53340209679417701685
    FXC, RXC = 0.31245971410378249250, 3.20041258076506210122

    def _fwd(self, lam, phi):
        c = self.C * np.sin(phi)
        th = np.array(phi, copy=True)
        for _ in range(20):
            th = th - (np.sin(0.5 * th) + np.sin(th) - c) \
                / (0.5 * np.cos(0.5 * th) + np.cos(th))
        x = self.FXC * lam * (1.0 + 2.0 * np.cos(th) / np.cos(0.5 * th))
        y = self.FYC * np.sin(0.5 * th)
        return x, y

    def _inv(self, x, y):
        t = self.RYC * y
        ok = np.abs(t) <= 1.000001
        big = np.abs(t) > 1.0
        tt = np.where(big, np.where(t < 0, -1.0, 1.0), t)
        phi = np.where(big, np.where(t < 0, -np.pi, np.pi),
                       2.0 * np.arcsin(np.clip(t, -1, 1)))
        lam = self.RXC * x / (1.0 + 2.0 * np.cos(phi) / np.cos(0.5 * phi))
        phi = self.RC * (tt + np.sin(phi))
        ok &= np.abs(phi) <= 1.000001
        phi = np.where(np.abs(phi) > 1.0,
                       np.where(phi < 0, -mu.HALFPI, mu.HALFPI),
                       np.arcsin(np.clip(phi, -1, 1)))
        return np.where(ok, lam, NAN), np.where(ok, phi, NAN)


class Nell(_SphOp):
    proj_name = "nell"

    def _fwd(self, lam, phi):
        k = 2.0 * np.sin(phi)
        V = phi * phi
        th = phi * (1.00371 + V * (-0.0935382 + V * -0.011412))
        for _ in range(10):
            th = th - (th + np.sin(th) - k) / (1.0 + np.cos(th))
        return 0.5 * lam * (1.0 + np.cos(th)), th

    def _inv(self, x, y):
        lam = 2.0 * x / (1.0 + np.cos(y))
        phi = aasin(0.5 * (y + np.sin(y)))
        return lam, phi


class NellH(_SphOp):
    proj_name = "nell_h"

    def _fwd(self, lam, phi):
        return 0.5 * lam * (1.0 + np.cos(phi)), \
            2.0 * (phi - np.tan(0.5 * phi))

    def _inv(self, x, y):
        p = 0.5 * y
        phi = np.zeros_like(y)
        V = np.ones_like(y)
        for _ in range(9):
            c = np.cos(0.5 * phi)
            V = (phi - np.tan(phi / 2) - p) / (1.0 - 0.5 / (c * c))
            phi = phi - V
        bad = np.abs(V) >= 1e-7
        phi = np.where(bad, np.where(p < 0, -mu.HALFPI, mu.HALFPI), phi)
        lam = np.where(bad, 2.0 * x, 2.0 * x / (1.0 + np.cos(phi)))
        return lam, phi


REGISTRY = {
    c.proj_name: c for c in (
        Sinu, GnSinu, Eck6, Mbtfps, Moll, Wag4, Wag5,
        Eck1, Eck2, Eck3, Kav7, Wag6, Putp1, Eck4, Eck5,
        Putp2, Putp3, Putp3p, Putp4p, Weren, Putp5, Putp5p, Putp6, Putp6p,
        Urmfps, Wag1, Urm5, Wag2, Wag3, Wink1, Wink2,
        Crast, Collg, Boggs, Denoy, Fahey, FoucS, Sts, Fouc, QuaAut, MbtS,
        Hatano, Loxim, MbtFps, Mbtfpp, Mbtfpq, Nell, NellH,
    )
}
