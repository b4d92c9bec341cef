"""Miscellaneous world/cylindrical projections.

NumPy batch re-expressions of the reference operators in
src/projections/{cc,tcc,tcea,tobmerc,natearth,natearth2,eqearth,goode,
robin,hammer,august,nicol,wag7,lagrng,larr,lask,bacon,comill,patterson,
times,vandg,aitoff}.cpp.  Sphere-forced unless noted; eqearth supports
the ellipsoid via the authalic latitude.
"""

from __future__ import annotations

import numpy as np

from proj_spark import mathutils as mu
from proj_spark.operations.base import Operation
from proj_spark.operations.pseudocyl import _SphOp, aasin, asqrt

NAN = np.float64(np.nan)
FORTPI = np.pi / 4
D2R = np.pi / 180.0


class CC(_SphOp):
    """Central cylindrical (cc.cpp)."""

    proj_name = "cc"

    def _fwd(self, lam, phi):
        ok = np.abs(np.abs(phi) - mu.HALFPI) > 1e-10
        return np.where(ok, lam, NAN), np.where(ok, np.tan(phi), NAN)

    def _inv(self, x, y):
        return x, np.arctan(y)


class TCC(_SphOp):
    """Transverse central cylindrical; no inverse (tcc.cpp)."""

    proj_name = "tcc"

    def _fwd(self, lam, phi):
        b = np.cos(phi) * np.sin(lam)
        bt = 1.0 - b * b
        ok = bt >= 1e-10
        x = b / np.sqrt(np.where(ok, bt, 1.0))
        y = np.arctan2(np.tan(phi), np.cos(lam))
        return np.where(ok, x, NAN), np.where(ok, y, NAN)


class TCEA(_SphOp):
    """Transverse cylindrical equal-area (tcea.cpp)."""

    proj_name = "tcea"

    def _fwd(self, lam, phi):
        x = np.cos(phi) * np.sin(lam) / self.k0
        y = self.k0 * (np.arctan2(np.tan(phi), np.cos(lam)) - self.phi0)
        return x, y

    def _inv(self, x, y):
        yy = y / self.k0 + self.phi0
        xx = x * self.k0
        t = np.sqrt(np.maximum(1.0 - xx * xx, 0.0))
        phi = np.arcsin(np.clip(t * np.sin(yy), -1, 1))
        lam = np.arctan2(xx, t * np.cos(yy))
        return lam, phi


class Tobmerc(_SphOp):
    """Tobler-Mercator (tobmerc.cpp)."""

    proj_name = "tobmerc"

    def _fwd(self, lam, phi):
        ok = np.abs(np.abs(phi) - mu.HALFPI) > 1e-10
        cosphi = np.cos(phi)
        x = self.k0 * lam * cosphi * cosphi
        with np.errstate(invalid="ignore", divide="ignore"):
            logt = np.where(np.abs(phi) <= np.finfo(float).eps,
                            np.log1p(phi),
                            np.log(np.tan(FORTPI + 0.5 * np.where(ok, phi, 0.0))))
        y = self.k0 * logt
        return np.where(ok, x, NAN), np.where(ok, y, NAN)

    def _inv(self, x, y):
        phi = np.arctan(np.sinh(y / self.k0))
        cosphi = np.cos(phi)
        lam = x / self.k0 / (cosphi * cosphi)
        return lam, phi


class NatEarth(_SphOp):
    """Natural Earth (natearth.cpp; polynomial by Savric et al.)."""

    proj_name = "natearth"
    A = (0.8707, -0.131979, -0.013791, 0.003971, -0.001529)
    B = (1.007226, 0.015085, -0.044475, 0.028874, -0.005916)
    MAX_Y = 0.8707 * 0.52 * np.pi

    def _x_factor(self, p2):
        A = self.A
        p4 = p2 * p2
        return A[0] + p2 * (A[1] + p2 * (A[2] + p4 * p2 * (A[3] + p2 * A[4])))

    def _y_poly(self, phi):
        B = self.B
        p2 = phi * phi
        p4 = p2 * p2
        return phi * (B[0] + p2 * (B[1] + p4 * (B[2] + B[3] * p2 + B[4] * p4)))

    def _y_der(self, p2):
        B = self.B
        p4 = p2 * p2
        return (B[0] + p2 * (3 * B[1] + p4 * (7 * B[2] + 9 * B[3] * p2
                                              + 11 * B[4] * p4)))

    def _fwd(self, lam, phi):
        return lam * self._x_factor(phi * phi), self._y_poly(phi)

    def _inv(self, x, y):
        yc = np.clip(y, -self.MAX_Y, self.MAX_Y)
        yt = yc.copy() if hasattr(yc, "copy") else yc
        target = yc
        for _ in range(20):
            yt = yt - (self._y_poly(yt) - target) / self._y_der(yt * yt)
        lam = x / self._x_factor(yt * yt)
        return lam, yt


class NatEarth2(NatEarth):
    """Natural Earth II (natearth2.cpp)."""

    proj_name = "natearth2"
    A = (0.84719, -0.13063, -0.04515, 0.05494, -0.02326, 0.00331)
    B = (1.01183, -0.02625, 0.01926, -0.00396)
    MAX_Y = 0.84719 * 0.535117535153096 * np.pi

    def _x_factor(self, p2):
        A = self.A
        p4 = p2 * p2
        p6 = p2 * p4
        return A[0] + A[1] * p2 + p6 * p6 * (A[2] + A[3] * p2 + A[4] * p4
                                             + A[5] * p6)

    def _y_poly(self, phi):
        B = self.B
        p2 = phi * phi
        p4 = p2 * p2
        return phi * (B[0] + p4 * p4 * (B[1] + B[2] * p2 + B[3] * p4))

    def _y_der(self, p2):
        B = self.B
        p4 = p2 * p2
        return B[0] + p4 * p4 * (9 * B[1] + 11 * B[2] * p2 + 13 * B[3] * p4)


class EqEarth(Operation):
    """Equal Earth (eqearth.cpp; Savric/Patterson/Jenny 2018)."""

    proj_name = "eqearth"
    A1, A2, A3, A4 = 1.340264, -0.081106, 0.000893, 0.003796
    M = np.sqrt(3.0) / 2.0
    MAX_Y = 1.3173627591574

    def setup(self) -> None:
        from proj_spark.operations.simple import authset
        self.rqda = 1.0
        if self.es != 0.0:
            self.apa = authset(self.es)
            self.qp = float(mu.qsfn(np.float64(1.0), self.e, self.one_es))
            self.rqda = float(np.sqrt(0.5 * self.qp))

    def _psi_der(self, psi2, psi6):
        return (self.A1 + 3 * self.A2 * psi2
                + psi6 * (7 * self.A3 + 9 * self.A4 * psi2))

    def _fwd(self, lam, phi):
        sbeta = np.sin(phi)
        if self.es != 0.0:
            sbeta = mu.qsfn(sbeta, self.e, self.one_es) / self.qp
            sbeta = np.clip(sbeta, -1.0, 1.0)
        psi = np.arcsin(self.M * sbeta)
        psi2 = psi * psi
        psi6 = psi2 * psi2 * psi2
        x = lam * np.cos(psi) / (self.M * self._psi_der(psi2, psi6))
        y = psi * (self.A1 + self.A2 * psi2 + psi6 * (self.A3 + self.A4 * psi2))
        return x * self.rqda, y * self.rqda

    def _inv(self, x, y):
        from proj_spark.operations.simple import authlat
        x = x / self.rqda
        y = y / self.rqda
        # values at/beyond the valid edge ARE the pole: remember them so
        # phi snaps to exactly +-90 after the Newton solve (the
        # reference's truncated MAX_Y literal otherwise leaves a
        # sqrt-amplified ~1e-7 rad deficit at the pole)
        hi = y >= self.MAX_Y
        lo = y <= -self.MAX_Y
        y = np.clip(y, -self.MAX_Y, self.MAX_Y)
        yc = np.array(y, copy=True)
        for _ in range(12):
            y2 = yc * yc
            y6 = y2 * y2 * y2
            f = yc * (self.A1 + self.A2 * y2
                      + y6 * (self.A3 + self.A4 * y2)) - y
            yc = yc - f / self._psi_der(y2, y6)
        y2 = yc * yc
        y6 = y2 * y2 * y2
        lam = self.M * x * self._psi_der(y2, y6) / np.cos(yc)
        phi = np.arcsin(np.clip(np.sin(yc) / self.M, -1, 1))
        if self.es != 0.0:
            phi = authlat(phi, self.apa)
        phi = np.where(hi, mu.HALFPI, np.where(lo, -mu.HALFPI, phi))
        return lam, phi


class Goode(_SphOp):
    """Goode Homolosine: sinusoidal belt + Mollweide caps (goode.cpp)."""

    proj_name = "goode"
    Y_COR = 0.05280
    PHI_LIM = 0.71093078197902358062

    def _setup(self) -> None:
        from proj_spark.operations.pseudocyl import Moll, Sinu
        self._sinu = Sinu({"proj": "sinu", "R": 1.0})
        self._moll = Moll({"proj": "moll", "R": 1.0})

    def _fwd(self, lam, phi):
        sx, sy = self._sinu._fwd(lam, phi)
        mx, my = self._moll._fwd(lam, phi)
        my = my - np.where(phi >= 0.0, self.Y_COR, -self.Y_COR)
        belt = np.abs(phi) <= self.PHI_LIM
        return np.where(belt, sx, mx), np.where(belt, sy, my)

    def _inv(self, x, y):
        belt = np.abs(y) <= self.PHI_LIM
        slam, sphi = self._sinu._inv(x, y)
        ym = y + np.where(y >= 0.0, self.Y_COR, -self.Y_COR)
        mlam, mphi = self._moll._inv(x, ym)
        return np.where(belt, slam, mlam), np.where(belt, sphi, mphi)


class Robin(_SphOp):
    """Robinson (robin.cpp; per-5-degree cubic coefficient tables)."""

    proj_name = "robin"
    FXC, FYC = 0.8487, 1.3523
    C1 = 11.45915590261646417544
    RC1 = 0.08726646259971647884
    NODES = 18
    X = np.array([
        [1.0, 2.2199e-17, -7.15515e-05, 3.1103e-06],
        [0.9986, -0.000482243, -2.4897e-05, -1.3309e-06],
        [0.9954, -0.00083103, -4.48605e-05, -9.86701e-07],
        [0.99, -0.00135364, -5.9661e-05, 3.6777e-06],
        [0.9822, -0.00167442, -4.49547e-06, -5.72411e-06],
        [0.973, -0.00214868, -9.03571e-05, 1.8736e-08],
        [0.96, -0.00305085, -9.00761e-05, 1.64917e-06],
        [0.9427, -0.00382792, -6.53386e-05, -2.6154e-06],
        [0.9216, -0.00467746, -0.00010457, 4.81243e-06],
        [0.8962, -0.00536223, -3.23831e-05, -5.43432e-06],
        [0.8679, -0.00609363, -0.000113898, 3.32484e-06],
        [0.835, -0.00698325, -6.40253e-05, 9.34959e-07],
        [0.7986, -0.00755338, -5.00009e-05, 9.35324e-07],
        [0.7597, -0.00798324, -3.5971e-05, -2.27626e-06],
        [0.7186, -0.00851367, -7.01149e-05, -8.6303e-06],
        [0.6732, -0.00986209, -0.000199569, 1.91974e-05],
        [0.6213, -0.010418, 8.83923e-05, 6.24051e-06],
        [0.5722, -0.00906601, 0.000182, 6.24051e-06],
        [0.5322, -0.00677797, 0.000275608, 6.24051e-06],
    ], dtype=np.float32).astype(np.float64)
    Y = np.array([
        [-5.20417e-18, 0.0124, 1.21431e-18, -8.45284e-11],
        [0.062, 0.0124, -1.26793e-09, 4.22642e-10],
        [0.124, 0.0124, 5.07171e-09, -1.60604e-09],
        [0.186, 0.0123999, -1.90189e-08, 6.00152e-09],
        [0.248, 0.0124002, 7.10039e-08, -2.24e-08],
        [0.31, 0.0123992, -2.64997e-07, 8.35986e-08],
        [0.372, 0.0124029, 9.88983e-07, -3.11994e-07],
        [0.434, 0.0123893, -3.69093e-06, -4.35621e-07],
        [0.4958, 0.0123198, -1.02252e-05, -3.45523e-07],
        [0.5571, 0.0121916, -1.54081e-05, -5.82288e-07],
        [0.6176, 0.0119938, -2.41424e-05, -5.25327e-07],
        [0.6769, 0.011713, -3.20223e-05, -5.16405e-07],
        [0.7346, 0.0113541, -3.97684e-05, -6.09052e-07],
        [0.7903, 0.0109107, -4.89042e-05, -1.04739e-06],
        [0.8435, 0.0103431, -6.4615e-05, -1.40374e-09],
        [0.8936, 0.00969686, -6.4636e-05, -8.547e-06],
        [0.9394, 0.00840947, -0.000192841, -4.2106e-06],
        [0.9761, 0.00616527, -0.000256, -4.2106e-06],
        [1.0, 0.00328947, -0.000319159, -4.2106e-06],
    ], dtype=np.float32).astype(np.float64)

    @staticmethod
    def _V(C, z):
        return C[:, 0] + z * (C[:, 1] + z * (C[:, 2] + z * C[:, 3]))

    @staticmethod
    def _DV(C, z):
        return C[:, 1] + 2 * z * C[:, 2] + z * z * 3.0 * C[:, 3]

    def _fwd(self, lam, phi):
        dphi = np.abs(phi)
        i = np.floor(dphi * self.C1).astype(np.int64)
        i = np.minimum(i, self.NODES)
        z = (dphi - self.RC1 * i) / D2R
        Xi = self.X[i]
        Yi = self.Y[i]
        x = self._V(Xi, z) * self.FXC * lam
        y = self._V(Yi, z) * self.FYC
        return x, np.where(phi < 0.0, -y, y)

    def _inv(self, x, y):
        lam = x / self.FXC
        p = np.abs(y / self.FYC)
        pole = p >= 1.0
        ok = p <= 1.000001
        # table index via searchsorted on the Y c0 knots
        knots = self.Y[:, 0]
        i = np.clip(np.searchsorted(knots, np.clip(p, 0, 1), side="right") - 1,
                    0, self.NODES - 1)
        Ti = self.Y[i]
        t = 5.0 * (p - Ti[:, 0]) / (self.Y[np.minimum(i + 1, self.NODES), 0]
                                    - Ti[:, 0])
        for _ in range(25):
            t = t - (self._V(Ti, t) - p) / self._DV(Ti, t)
        phi = (5.0 * i + t) * D2R
        lam_gen = lam / self._V(self.X[i], t)
        phi = np.where(pole, mu.HALFPI, phi)
        lam_out = np.where(pole, lam / self.X[self.NODES, 0], lam_gen)
        phi = np.where(y < 0.0, -phi, phi)
        return np.where(ok, lam_out, NAN), np.where(ok, phi, NAN)


class Hammer(_SphOp):
    proj_name = "hammer"

    def _setup(self) -> None:
        self.w = abs(float(self.params.get("W", 0.5)))
        if self.w <= 0:
            raise ValueError("hammer: W <= 0")
        m = abs(float(self.params.get("M", 1.0)))
        if m <= 0:
            raise ValueError("hammer: M <= 0")
        self.rm = 1.0 / m
        self.m = m / self.w

    def _fwd(self, lam, phi):
        cosphi = np.cos(phi)
        lam = lam * self.w
        denom = 1.0 + cosphi * np.cos(lam)
        ok = denom != 0.0
        d = np.sqrt(2.0 / np.where(ok, denom, 1.0))
        x = self.m * d * cosphi * np.sin(lam)
        y = self.rm * d * np.sin(phi)
        return np.where(ok, x, NAN), np.where(ok, y, NAN)

    def _inv(self, x, y):
        z = asqrt(1.0 - 0.25 * self.w * self.w * x * x - 0.25 * y * y)
        ok = np.abs(2.0 * z * z - 1.0) >= 1e-10
        lam = np.arctan2(self.w * x * z, 2.0 * z * z - 1.0) / self.w
        phi = aasin(z * y)
        return np.where(ok, lam, NAN), np.where(ok, phi, NAN)


class August(_SphOp):
    """August Epicycloidal; no inverse (august.cpp)."""

    proj_name = "august"

    def _fwd(self, lam, phi):
        t = np.tan(0.5 * phi)
        c1 = np.sqrt(1.0 - t * t)
        hl = lam * 0.5
        c = 1.0 + c1 * np.cos(hl)
        x1 = np.sin(hl) * c1 / c
        y1 = t / c
        x12 = x1 * x1
        y12 = y1 * y1
        x = 4.0 / 3.0 * x1 * (3.0 + x12 - 3.0 * y12)
        y = 4.0 / 3.0 * y1 * (3.0 + 3.0 * x12 - y12)
        return x, y


class Nicol(_SphOp):
    """Nicolosi Globular; no inverse (nicol.cpp)."""

    proj_name = "nicol"

    def _fwd(self, lam, phi):
        EPS = 1e-10
        with np.errstate(invalid="ignore", divide="ignore"):
            tb = mu.HALFPI / lam - lam / mu.HALFPI
            c = phi / mu.HALFPI
            sp = np.sin(phi)
            d = (1.0 - c * c) / (sp - c)
            r2 = (tb / d) ** 2
            m = (tb * sp / d - 0.5 * tb) / (1.0 + r2)
            n = (sp / r2 + 0.5 * d) / (1.0 + 1.0 / r2)
            xg = np.sqrt(m * m + np.cos(phi) ** 2 / (1.0 + r2))
            xg = mu.HALFPI * (m + np.where(lam < 0, -xg, xg))
            yg = np.sqrt(n * n - (sp * sp / r2 + d * sp - 1.0)
                         / (1.0 + 1.0 / r2))
            yg = mu.HALFPI * (n + np.where(phi < 0, yg, -yg))
        x = np.where(np.abs(lam) < EPS, 0.0,
                     np.where(np.abs(phi) < EPS, lam,
                              np.where(np.abs(np.abs(lam) - mu.HALFPI) < EPS,
                                       lam * np.cos(phi),
                                       np.where(np.abs(np.abs(phi) - mu.HALFPI)
                                                < EPS, 0.0, xg))))
        y = np.where(np.abs(lam) < EPS, phi,
                     np.where(np.abs(phi) < EPS, 0.0,
                              np.where(np.abs(np.abs(lam) - mu.HALFPI) < EPS,
                                       mu.HALFPI * np.sin(phi),
                                       np.where(np.abs(np.abs(phi) - mu.HALFPI)
                                                < EPS, phi, yg))))
        return x, y


class Wag7(_SphOp):
    """Wagner VII; no inverse (wag7.cpp)."""

    proj_name = "wag7"

    def _fwd(self, lam, phi):
        s = 0.90630778703664996 * np.sin(phi)
        theta = np.arcsin(np.clip(s, -1, 1))
        ct = np.cos(theta)
        lam3 = lam / 3.0
        D = 1.0 / np.sqrt(0.5 * (1.0 + ct * np.cos(lam3)))
        x = 2.66723 * ct * np.sin(lam3) * D
        y = s * 1.24104 * D
        return x, y


class Lagrng(_SphOp):
    proj_name = "lagrng"
    TOL = 1e-10

    def _setup(self) -> None:
        self.w = float(self.params.get("W", 2.0))
        if self.w <= 0:
            raise ValueError("lagrng: W <= 0")
        self.hw = 0.5 * self.w
        self.rw = 1.0 / self.w
        self.hrw = 0.5 * self.rw
        sin_phi1 = np.sin(float(self.params.get("lat_1", 0.0)) * D2R)
        if abs(abs(sin_phi1) - 1.0) < self.TOL:
            raise ValueError("lagrng: |lat_1| ~ 90")
        self.a1 = ((1.0 - sin_phi1) / (1.0 + sin_phi1)) ** self.hrw
        self.a2 = self.a1 * self.a1

    def _fwd(self, lam, phi):
        sp = np.sin(phi)
        pole = np.abs(np.abs(sp) - 1.0) < self.TOL
        with np.errstate(invalid="ignore", divide="ignore"):
            v = self.a1 * np.power((1.0 + sp) / np.where(pole, 1.0, 1.0 - sp),
                                   self.hrw)
            lamw = lam * self.rw
            c = 0.5 * (v + 1.0 / v) + np.cos(lamw)
            ok = pole | (c >= self.TOL)
            x = np.where(pole, 0.0, 2.0 * np.sin(lamw) / c)
            y = np.where(pole, np.where(phi < 0, -2.0, 2.0), (v - 1.0 / v) / c)
        return np.where(ok, x, NAN), np.where(ok, y, NAN)

    def _inv(self, x, y):
        pole = np.abs(np.abs(y) - 2.0) < self.TOL
        x2 = x * x
        y2p = 2.0 + y
        y2m = 2.0 - y
        c = y2p * y2m - x2
        ok = pole | (np.abs(c) >= self.TOL)
        with np.errstate(invalid="ignore", divide="ignore"):
            phi = 2.0 * np.arctan(np.power(
                (y2p * y2p + x2) / (self.a2 * (y2m * y2m + x2)), self.hw)) \
                - mu.HALFPI
            lam = self.w * np.arctan2(4.0 * x, c)
        phi = np.where(pole, np.where(y < 0, -mu.HALFPI, mu.HALFPI), phi)
        lam = np.where(pole, 0.0, lam)
        return np.where(ok, lam, NAN), np.where(ok, phi, NAN)


class Larr(_SphOp):
    """Larrivee; no inverse (larr.cpp)."""

    proj_name = "larr"

    def _fwd(self, lam, phi):
        x = 0.5 * lam * (1.0 + np.sqrt(np.cos(phi)))
        y = phi / (np.cos(0.5 * phi) * np.cos(lam / 6.0))
        return x, y


class Lask(_SphOp):
    """Laskowski; no inverse (lask.cpp)."""

    proj_name = "lask"

    def _fwd(self, lam, phi):
        l2 = lam * lam
        p2 = phi * phi
        x = lam * (0.975534 + p2 * (-0.119161 + l2 * -0.0143059
                                    + p2 * -0.0547009))
        y = phi * (1.00384 + l2 * (0.0802894 + p2 * -0.02855
                                   + l2 * 0.000199025)
                   + p2 * (0.0998909 + p2 * -0.0491032))
        return x, y


class Bacon(_SphOp):
    """Bacon/Apian/Ortelius globulars; no inverse (bacon.cpp)."""

    proj_name = "bacon"
    HLFPI2 = 2.46740110027233965467
    bacn, ortl = True, False

    def _fwd(self, lam, phi):
        EPS = 1e-10
        y = mu.HALFPI * np.sin(phi) if self.bacn else phi
        ax = np.abs(lam)
        with np.errstate(invalid="ignore", divide="ignore"):
            f = 0.5 * (self.HLFPI2 / ax + ax)
            xg = ax - f + np.sqrt(np.maximum(f * f - y * y, 0.0))
            if self.ortl:
                xo = np.sqrt(self.HLFPI2 - phi * phi + EPS) + ax - mu.HALFPI
                xg = np.where(ax >= mu.HALFPI, xo, xg)
        x = np.where(ax >= EPS, np.where(lam < 0.0, -xg, xg), 0.0)
        return x, y


class Apian(Bacon):
    proj_name = "apian"
    bacn, ortl = False, False


class Ortel(Bacon):
    proj_name = "ortel"
    bacn, ortl = False, True


class Comill(_SphOp):
    """Compact Miller (comill.cpp)."""

    proj_name = "comill"
    K1, K2, K3 = 0.9902, 0.1604, -0.03054
    MAX_Y = 0.6000207669862655 * np.pi

    def _fwd(self, lam, phi):
        p2 = phi * phi
        return lam, phi * (self.K1 + p2 * (self.K2 + self.K3 * p2))

    def _inv(self, x, y):
        yc = np.clip(y, -self.MAX_Y, self.MAX_Y)
        target = yc
        for _ in range(20):
            y2 = yc * yc
            f = yc * (self.K1 + y2 * (self.K2 + self.K3 * y2)) - target
            fder = self.K1 + y2 * (3 * self.K2 + 5 * self.K3 * y2)
            yc = yc - f / fder
        return x, yc


class Patterson(_SphOp):
    """Patterson cylindrical (patterson.cpp)."""

    proj_name = "patterson"
    K1, K2, K3, K4 = 1.0148, 0.23185, -0.14499, 0.02406
    MAX_Y = 1.790857183

    def _fwd(self, lam, phi):
        p2 = phi * phi
        return lam, phi * (self.K1 + p2 * p2 * (self.K2
                                                + p2 * (self.K3
                                                        + self.K4 * p2)))

    def _inv(self, x, y):
        yc = np.clip(y, -self.MAX_Y, self.MAX_Y)
        target = yc
        for _ in range(25):
            y2 = yc * yc
            f = yc * (self.K1 + y2 * y2 * (self.K2 + y2 * (self.K3
                                                           + self.K4 * y2))) \
                - target
            fder = self.K1 + y2 * y2 * (5 * self.K2 + y2 * (7 * self.K3
                                                            + 9 * self.K4 * y2))
            yc = yc - f / fder
        return x, yc


class Times(_SphOp):
    """Times Atlas (times.cpp)."""

    proj_name = "times"

    def _fwd(self, lam, phi):
        T = np.tan(phi / 2.0)
        S = np.sin(FORTPI * T)
        return lam * (0.74482 - 0.34588 * S * S), 1.70711 * T

    def _inv(self, x, y):
        T = y / 1.70711
        S = np.sin(FORTPI * T)
        return x / (0.74482 - 0.34588 * S * S), 2.0 * np.arctan(T)


class VanDG(_SphOp):
    """van der Grinten I (vandg.cpp)."""

    proj_name = "vandg"
    TOL = 1e-10
    PISQ = 9.86960440108935861869
    TPISQ = 19.73920880217871723738
    HPISQ = 4.93480220054467930934

    def _fwd(self, lam, phi):
        TOL = self.TOL
        p2 = np.abs(phi / mu.HALFPI)
        ok = (p2 - TOL) <= 1.0
        p2 = np.minimum(p2, 1.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            al = 0.5 * np.abs(np.pi / lam - lam / np.pi)
            al2 = al * al
            g = asqrt(1.0 - p2 * p2)
            g = g / (p2 + g - 1.0)
            g2 = g * g
            pp = g * (2.0 / p2 - 1.0)
            pp = pp * pp
            xt = g - pp
            gg = pp + al2
            xg = np.pi * (al * xt + asqrt(al2 * xt * xt - gg * (g2 - pp))) / gg
            xg = np.where(lam < 0.0, -xg, xg)
            yy = np.abs(xg / np.pi)
            yy = 1.0 - yy * (yy + 2.0 * al)
            oky = yy >= -TOL
            yg = asqrt(np.maximum(yy, 0.0)) * np.where(phi < 0.0, -np.pi, np.pi)
        edge = np.abs(phi) <= TOL
        mid = (np.abs(lam) <= TOL) | (np.abs(p2 - 1.0) < TOL)
        ymid = np.pi * np.tan(0.5 * np.arcsin(np.clip(p2, -1, 1)))
        ymid = np.where(phi < 0.0, -ymid, ymid)
        x = np.where(edge, lam, np.where(mid, 0.0, xg))
        y = np.where(edge, 0.0, np.where(mid, ymid, yg))
        ok = ok & (edge | mid | oky)
        return np.where(ok, x, NAN), np.where(ok, y, NAN)

    def _inv(self, x, y):
        TOL = self.TOL
        THIRD = 1.0 / 3.0
        x2 = x * x
        ay = np.abs(y)
        y2 = y * y
        r = x2 + y2
        r2 = r * r
        with np.errstate(invalid="ignore", divide="ignore"):
            c1 = -np.pi * ay * (r + self.PISQ)
            c3 = r2 + 2 * np.pi * (ay * r + np.pi * (y2 + np.pi *
                                                     (ay + mu.HALFPI)))
            c2 = c1 + self.PISQ * (r - 3.0 * y2)
            c0 = np.pi * ay
            c2 = c2 / c3
            al = c1 / c3 - THIRD * c2 * c2
            m = 2.0 * np.sqrt(np.maximum(-THIRD * al, 0.0))
            d = (2.0 / 27.0) * c2 * c2 * c2 + (c0 * c0 - THIRD * c2 * c1) / c3
            d = 3.0 * d / (al * m)
            t = np.abs(d)
            ok = (t - TOL) <= 1.0
            dd = np.where(t > 1.0, np.where(d > 0.0, 0.0, np.pi),
                          np.arccos(np.clip(d, -1, 1)))
            phi = np.pi * (m * np.cos(dd * THIRD + 4.18879020478639098458)
                           - THIRD * c2)
            phi = np.where(y < 0.0, -phi, phi)
            tt = r2 + self.TPISQ * (x2 - y2 + self.HPISQ)
            lam = np.where(np.abs(x) <= TOL, 0.0,
                           0.5 * (r - self.PISQ
                                  + np.where(tt <= 0, 0.0, np.sqrt(
                                      np.abs(tt)))) / x)
            # equatorial strip: |y| ~ 0
            teq = x2 * x2 + self.TPISQ * (x2 + self.HPISQ)
            lam_eq = np.where(np.abs(x) <= TOL, 0.0,
                              0.5 * (x2 - self.PISQ + np.sqrt(teq)) / x)
        eq = ay < TOL
        phi = np.where(eq, 0.0, phi)
        lam = np.where(eq, lam_eq, lam)
        ok = eq | ok
        return np.where(ok, lam, NAN), np.where(ok, phi, NAN)


class Aitoff(_SphOp):
    """Aitoff / Winkel Tripel, inverse by 2-D Newton (aitoff.cpp)."""

    proj_name = "aitoff"
    winkel = False

    def _setup(self) -> None:
        if self.winkel:
            if "lat_1" in self.params:
                self.cosphi1 = float(np.cos(float(self.params["lat_1"]) * D2R))
                if self.cosphi1 == 0.0:
                    raise ValueError("wintri: |lat_1| = 90")
            else:
                self.cosphi1 = 0.636619772367581343  # acos(2/pi)

    def _fwd(self, lam, phi):
        c = 0.5 * lam
        d = np.arccos(np.clip(np.cos(phi) * np.cos(c), -1, 1))
        with np.errstate(invalid="ignore", divide="ignore"):
            rsd = np.where(d != 0.0, 1.0 / np.sin(d), 0.0)
        x = np.where(d != 0.0, 2.0 * d * np.cos(phi) * np.sin(c) * rsd, 0.0)
        y = np.where(d != 0.0, d * np.sin(phi) * rsd, 0.0)
        if self.winkel:
            x = (x + lam * self.cosphi1) * 0.5
            y = (y + phi) * 0.5
        return x, y

    def _inv(self, x, y):
        EPS = 1e-12
        origin = (np.abs(x) < EPS) & (np.abs(y) < EPS)
        phi = np.array(y, copy=True, dtype=np.float64)
        lam = np.array(x, copy=True, dtype=np.float64)
        for _ in range(30):
            sl = np.sin(lam * 0.5)
            cl = np.cos(lam * 0.5)
            sp = np.sin(phi)
            cp = np.cos(phi)
            D = cp * cl
            C = 1.0 - D * D
            with np.errstate(invalid="ignore", divide="ignore"):
                Dv = np.arccos(np.clip(D, -1, 1)) / np.power(
                    np.maximum(C, 1e-300), 1.5)
                f1 = 2.0 * Dv * C * cp * sl
                f2 = Dv * C * sp
                f1p = 2.0 * (sl * cl * sp * cp / C - Dv * sp * sl)
                f1l = cp * cp * sl * sl / C + Dv * cp * cl * sp * sp
                f2p = sp * sp * cl / C + Dv * sl * sl * cp
                f2l = 0.5 * (sp * cp * sl / C - Dv * sp * cp * cp * sl * cl)
                if self.winkel:
                    f1 = 0.5 * (f1 + lam * self.cosphi1)
                    f2 = 0.5 * (f2 + phi)
                    f1p = f1p * 0.5
                    f1l = 0.5 * (f1l + self.cosphi1)
                    f2p = 0.5 * (f2p + 1.0)
                    f2l = f2l * 0.5
                f1 = f1 - x
                f2 = f2 - y
                det = f1p * f2l - f2p * f1l
                dl = (f2 * f1p - f1 * f2p) / det
                dp = (f1 * f2l - f2 * f1l) / det
                dl = np.remainder(dl + np.pi, 2 * np.pi) - np.pi
            phi = phi - dp
            lam = lam - dl
        phi = np.where(phi > mu.HALFPI, phi - 2.0 * (phi - mu.HALFPI), phi)
        phi = np.where(phi < -mu.HALFPI, phi - 2.0 * (phi + mu.HALFPI), phi)
        if not self.winkel:
            lam = np.where(np.abs(np.abs(phi) - mu.HALFPI) < EPS, 0.0, lam)
        lam = np.where(origin, 0.0, lam)
        phi = np.where(origin, 0.0, phi)
        return lam, phi


class Wintri(Aitoff):
    proj_name = "wintri"
    winkel = True


REGISTRY = {
    c.proj_name: c for c in (
        CC, TCC, TCEA, Tobmerc, NatEarth, NatEarth2, EqEarth, Goode, Robin,
        Hammer, August, Nicol, Wag7, Lagrng, Larr, Lask,
        Bacon, Apian, Ortel, Comill, Patterson, Times, VanDG, Aitoff, Wintri,
    )
}


class ObTran(Operation):
    """General oblique transformation: rotate the sphere so a chosen
    pole/equator becomes the frame of a child projection
    (ob_tran.cpp:18; operator composition).

    The child kernel is invoked RAW (no child prepare/finalize), exactly
    as the reference calls Q->link->fwd directly."""

    proj_name = "ob_tran"
    TOL = 1e-10

    def setup(self) -> None:
        from proj_spark.projstring import _registry
        p = self.params
        o_proj = p.get("o_proj")
        if not o_proj or o_proj == "ob_tran":
            raise ValueError("ob_tran: +o_proj missing or recursive")
        child_params = {k: v for k, v in p.items() if k != "proj"}
        child_params["proj"] = o_proj
        reg = _registry()
        if o_proj not in reg:
            raise NotImplementedError(f"ob_tran: child {o_proj!r} missing")
        self.link = reg[o_proj](child_params)
        if "o_alpha" in p:
            lamc = float(p.get("o_lon_c", 0.0)) * D2R
            phic = float(p.get("o_lat_c", 0.0)) * D2R
            alpha = float(p["o_alpha"]) * D2R
            if abs(abs(phic) - mu.HALFPI) <= self.TOL:
                raise ValueError("ob_tran: |o_lat_c| = 90")
            self.lamp = lamc + np.arctan2(-np.cos(alpha),
                                          -np.sin(alpha) * np.sin(phic))
            phip = np.arcsin(np.cos(phic) * np.sin(alpha))
        elif "o_lat_p" in p:
            self.lamp = float(p.get("o_lon_p", 0.0)) * D2R
            phip = float(p["o_lat_p"]) * D2R
        else:
            lam1 = float(p.get("o_lon_1", 0.0)) * D2R
            phi1 = float(p.get("o_lat_1", 0.0)) * D2R
            lam2 = float(p.get("o_lon_2", 0.0)) * D2R
            phi2 = float(p.get("o_lat_2", 0.0)) * D2R
            con = abs(phi1)
            if (abs(phi1 - phi2) <= self.TOL or con <= self.TOL
                    or abs(con - mu.HALFPI) <= self.TOL
                    or abs(abs(phi2) - mu.HALFPI) <= self.TOL):
                raise ValueError("ob_tran: invalid o_lat_1/o_lat_2")
            self.lamp = np.arctan2(
                np.cos(phi1) * np.sin(phi2) * np.cos(lam1)
                - np.sin(phi1) * np.cos(phi2) * np.cos(lam2),
                np.sin(phi1) * np.cos(phi2) * np.sin(lam2)
                - np.cos(phi1) * np.sin(phi2) * np.sin(lam1))
            phip = np.arctan(-np.cos(self.lamp - lam1) / np.tan(phi1))
        self.oblique = abs(phip) > self.TOL
        self.cphip = np.cos(phip)
        self.sphip = np.sin(phip)
        # latlong child: angular output, no a-scaling (reference sets
        # P->right = WHATEVER)
        if getattr(self.link, "right", "classic") == "radians" \
                or getattr(self.link, "proj_name", "") in (
                    "latlong", "longlat", "latlon", "lonlat"):
            self.right = "projected"

    def _fwd(self, lam, phi):
        coslam = np.cos(lam)
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        if self.oblique:
            lam2 = mu.adjlon(np.arctan2(
                cosphi * np.sin(lam),
                self.sphip * cosphi * coslam + self.cphip * sinphi)
                + self.lamp)
            phi2 = aasin(self.sphip * sinphi
                         - self.cphip * cosphi * coslam)
        else:
            lam2 = mu.adjlon(np.arctan2(cosphi * np.sin(lam), sinphi)
                             + self.lamp)
            phi2 = aasin(-cosphi * coslam)
        return self.link._fwd(lam2, phi2)

    def _inv(self, x, y):
        lam, phi = self.link._inv(x, y)
        lam = lam - self.lamp
        coslam = np.cos(lam)
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        if self.oblique:
            phi2 = aasin(self.sphip * sinphi + self.cphip * cosphi * coslam)
            lam2 = np.arctan2(cosphi * np.sin(lam),
                              self.sphip * cosphi * coslam
                              - self.cphip * sinphi)
        else:
            phi2 = aasin(cosphi * coslam)
            lam2 = np.arctan2(cosphi * np.sin(lam), -sinphi)
        return lam2, phi2


REGISTRY["ob_tran"] = ObTran
