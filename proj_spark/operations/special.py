"""National-grid / special-purpose operators: krovak, omerc, labrd,
rouss, rpoly, calcofi, nzmg.

NumPy batch re-expressions of src/projections/{krovak,omerc,labrd,rouss,
rpoly,calcofi,nzmg}.cpp; meridional-distance helpers re-express
src/proj_mdist.cpp.
"""

from __future__ import annotations

import numpy as np

from proj_spark import mathutils as mu
from proj_spark.operations.base import Operation
from proj_spark.operations.pseudocyl import _SphOp, aasin

NAN = np.float64(np.nan)
FORTPI = np.pi / 4
D2R = np.pi / 180.0


# ---------------------------------------------------------------------------
# proj_mdist.cpp: exact meridional distance via hypergeometric series
# ---------------------------------------------------------------------------

def mdist_ini(es: float):
    """Coefficients for the exact meridional-distance series."""
    E = [1.0]
    ens = es
    numf = twon1 = denfi = 1.0
    denf = 1.0
    twon = 4.0
    Es = 1.0
    El = 1.0
    for _ in range(1, 20):
        numf *= twon1 * twon1
        den = twon * denf * denf * twon1
        T = numf / den
        E.append(T * ens)
        Es -= E[-1]
        ens *= es
        twon *= 4.0
        denfi += 1.0
        denf *= denfi
        twon1 += 2.0
        if Es == El:
            break
        El = Es
    # reference: b[0] = 1 - Es; then per j: running Es -= E[j], scaled by
    # the prefix factorial ratios (proj_mdist.cpp:43-55)
    n = len(E)
    b = [1.0 - Es]
    Es_run = b[0]
    numf = denf = 1.0
    numfi, denfi = 2.0, 3.0
    for j in range(1, n):
        Es_run -= E[j]
        numf *= numfi
        denf *= denfi
        b.append(Es_run * numf / denf)
        numfi += 2.0
        denfi += 2.0
    return Es, np.array(b)


def _mdist_coeffs(es: float):
    Es, b = mdist_ini(es)
    return {"es": es, "E": Es, "b": b}


def mdist(phi, sphi, cphi, C):
    sc = sphi * cphi
    sphi2 = sphi * sphi
    D = phi * C["E"] - C["es"] * sc / np.sqrt(1.0 - C["es"] * sphi2)
    b = C["b"]
    s = np.zeros_like(np.asarray(phi, dtype=np.float64)) + b[-1]
    for i in range(len(b) - 2, -1, -1):
        s = b[i] + sphi2 * s
    return D + sc * s


def inv_mdist(dist, C):
    k = 1.0 / (1.0 - C["es"])
    phi = np.array(dist, dtype=np.float64, copy=True)
    for _ in range(20):
        s = np.sin(phi)
        t = 1.0 - C["es"] * s * s
        phi = phi - (mdist(phi, s, np.cos(phi), C) - dist) * (t * np.sqrt(t)) * k
    return phi


# ---------------------------------------------------------------------------
# complex polynomial helpers (src/zpoly1.cpp semantics)
# ---------------------------------------------------------------------------

def zpoly1(z, C):
    """z * sum(C[i] z^i) — the reference's pj_zpoly1 (no constant term)."""
    a = np.zeros_like(z) + C[-1]
    for c in C[-2::-1]:
        a = a * z + c
    return a * z


def zpolyd1(z, C):
    """(z*P(z), d/dz[z*P(z)]) — the reference's pj_zpolyd1."""
    a = np.zeros_like(z) + C[-1]
    b = np.zeros_like(z)
    for c in C[-2::-1]:
        b = b * z + a
        a = a * z + c
    return a * z, a + z * b


class Krovak(Operation):
    """Krovak, S-JTSK (krovak.cpp); Bessel ellipsoid is forced."""

    proj_name = "krovak"
    S0 = 1.37008346281555
    UQ = 1.04216856380474

    def setup(self) -> None:
        self.a = 6377397.155
        self.es = 0.006674372230614
        self.e = np.sqrt(self.es)
        self.one_es = 1.0 - self.es
        if "lat_0" not in self.params:
            self.phi0 = 0.863937979737193
        if "lon_0" not in self.params:
            self.lam0 = 0.7417649320975901 - 0.308341501185665
        if "k" not in self.params and "k_0" not in self.params:
            self.k0 = 0.9999
        self.czech = 1.0 if "czech" in self.params else -1.0
        es, e, phi0 = self.es, self.e, self.phi0
        self.alpha = np.sqrt(1.0 + es * np.cos(phi0) ** 4 / (1.0 - es))
        u0 = np.arcsin(np.sin(phi0) / self.alpha)
        g = ((1.0 + e * np.sin(phi0)) / (1.0 - e * np.sin(phi0))) \
            ** (self.alpha * e / 2.0)
        self.kk = np.tan(u0 / 2.0 + FORTPI) \
            / np.tan(phi0 / 2.0 + FORTPI) ** self.alpha * g
        n0 = np.sqrt(1.0 - es) / (1.0 - es * np.sin(phi0) ** 2)
        self.n = np.sin(self.S0)
        self.rho0 = self.k0 * n0 / np.tan(self.S0)
        self.ad = mu.HALFPI - self.UQ

    def _fwd(self, lam, phi):
        e = self.e
        gfi = ((1.0 + e * np.sin(phi)) / (1.0 - e * np.sin(phi))) \
            ** (self.alpha * e / 2.0)
        u = 2.0 * (np.arctan(self.kk * np.tan(phi / 2.0 + FORTPI) ** self.alpha
                             / gfi) - FORTPI)
        deltav = -lam * self.alpha
        s = np.arcsin(np.clip(np.cos(self.ad) * np.sin(u)
                              + np.sin(self.ad) * np.cos(u) * np.cos(deltav),
                              -1, 1))
        cos_s = np.cos(s)
        ok = cos_s >= 1e-12
        d = np.arcsin(np.clip(np.cos(u) * np.sin(deltav)
                              / np.where(ok, cos_s, 1.0), -1, 1))
        eps = self.n * d
        rho = self.rho0 * np.tan(self.S0 / 2.0 + FORTPI) ** self.n \
            / np.tan(s / 2.0 + FORTPI) ** self.n
        x = rho * np.sin(eps) * self.czech
        y = rho * np.cos(eps) * self.czech
        return np.where(ok, x, 0.0), np.where(ok, y, 0.0)

    def _inv(self, x, y):
        e = self.e
        xx = y * self.czech
        yy = x * self.czech
        rho = np.hypot(xx, yy)
        eps = np.arctan2(yy, xx)
        d = eps / np.sin(self.S0)
        with np.errstate(invalid="ignore", divide="ignore"):
            s = np.where(rho == 0.0, mu.HALFPI,
                         2.0 * (np.arctan((self.rho0 / np.where(
                             rho == 0, 1.0, rho)) ** (1.0 / self.n)
                             * np.tan(self.S0 / 2.0 + FORTPI)) - FORTPI))
        u = np.arcsin(np.clip(np.cos(self.ad) * np.sin(s)
                              - np.sin(self.ad) * np.cos(s) * np.cos(d),
                              -1, 1))
        deltav = np.arcsin(np.clip(np.cos(s) * np.sin(d) / np.cos(u), -1, 1))
        lam = -deltav / self.alpha
        fi1 = np.array(u, copy=True)
        phi = fi1
        for _ in range(20):
            phi = 2.0 * (np.arctan(
                self.kk ** (-1.0 / self.alpha)
                * np.tan(u / 2.0 + FORTPI) ** (1.0 / self.alpha)
                * ((1.0 + e * np.sin(fi1)) / (1.0 - e * np.sin(fi1)))
                ** (e / 2.0)) - FORTPI)
            fi1 = phi
        return lam, phi


class Omerc(Operation):
    """Oblique Mercator, Hotine (omerc.cpp)."""

    proj_name = "omerc"
    TOL = 1e-7
    EPS = 1e-10

    def setup(self) -> None:
        p = self.params
        self.no_rot = "no_rot" in p
        alp = "alpha" in p
        gam = "gamma" in p
        from proj_spark.operations.base import _angle
        alpha_c = _angle(p, "alpha", 0.0)
        gamma = _angle(p, "gamma", 0.0)
        no_off = ("no_off" in p) or ("no_uoff" in p)
        com = np.sqrt(self.one_es)
        if abs(self.phi0) > self.EPS:
            sinph0 = np.sin(self.phi0)
            cosph0 = np.cos(self.phi0)
            con = 1.0 - self.es * sinph0 * sinph0
            B = cosph0 * cosph0
            self.B = np.sqrt(1.0 + self.es * B * B / self.one_es)
            self.A = self.B * self.k0 * com / con
            D = self.B * com / (cosph0 * np.sqrt(con))
            F = D * D - 1.0
            if F <= 0.0:
                F = 0.0
            else:
                F = np.sqrt(F)
                if self.phi0 < 0.0:
                    F = -F
            F = F + D
            self.E = F * mu.tsfn(np.float64(self.phi0), np.float64(sinph0),
                                 self.e) ** self.B
        else:
            self.B = 1.0 / com
            self.A = self.k0
            self.E = D = F = 1.0
        if alp or gam:
            lamc = _angle(p, "lonc", 0.0)
            if alp:
                gamma0 = np.arcsin(np.sin(alpha_c) / D)
                if not gam:
                    gamma = alpha_c
            else:
                gamma0 = gamma
                alpha_c = np.arcsin(D * np.sin(gamma0))
            self.lam0 = lamc - np.arcsin(np.clip(
                0.5 * (F - 1.0 / F) * np.tan(gamma0), -1, 1)) / self.B
        else:
            lam1 = _angle(p, "lon_1", 0.0)
            phi1 = _angle(p, "lat_1", 0.0)
            lam2 = _angle(p, "lon_2", 0.0)
            phi2 = _angle(p, "lat_2", 0.0)
            H = mu.tsfn(np.float64(phi1), np.float64(np.sin(phi1)),
                        self.e) ** self.B
            L = mu.tsfn(np.float64(phi2), np.float64(np.sin(phi2)),
                        self.e) ** self.B
            F = self.E / H
            pp = (L - H) / (L + H)
            J = self.E * self.E
            J = (J - L * H) / (J + L * H)
            con = lam1 - lam2
            if con < -np.pi:
                lam2 -= 2 * np.pi
            elif con > np.pi:
                lam2 += 2 * np.pi
            self.lam0 = float(mu.adjlon(np.float64(
                0.5 * (lam1 + lam2) - np.arctan(
                    J * np.tan(0.5 * self.B * (lam1 - lam2)) / pp) / self.B)))
            gamma0 = np.arctan(2.0 * np.sin(self.B * float(mu.adjlon(
                np.float64(lam1 - self.lam0)))) / (F - 1.0 / F))
            gamma = alpha_c = np.arcsin(D * np.sin(gamma0))
        self.singam = np.sin(gamma0)
        self.cosgam = np.cos(gamma0)
        self.sinrot = np.sin(gamma)
        self.cosrot = np.cos(gamma)
        self.rB = 1.0 / self.B
        self.ArB = self.A * self.rB
        self.BrA = 1.0 / self.ArB
        if no_off:
            self.u_0 = 0.0
        else:
            self.u_0 = abs(self.ArB * np.arctan(
                np.sqrt(max(D * D - 1.0, 0.0)) / np.cos(alpha_c)))
            if self.phi0 < 0.0:
                self.u_0 = -self.u_0
        F2 = 0.5 * gamma0
        self.v_pole_n = self.ArB * np.log(np.tan(FORTPI - F2))
        self.v_pole_s = self.ArB * np.log(np.tan(FORTPI + F2))

    def _fwd(self, lam, phi):
        polar = np.abs(np.abs(phi) - mu.HALFPI) <= self.EPS
        with np.errstate(invalid="ignore", divide="ignore"):
            W = self.E / mu.tsfn(phi, np.sin(phi), self.e) ** self.B
            temp = 1.0 / W
            S = 0.5 * (W - temp)
            T = 0.5 * (W + temp)
            V = np.sin(self.B * lam)
            U = (S * self.singam - V * self.cosgam) / T
            ok = polar | (np.abs(np.abs(U) - 1.0) >= self.EPS)
            v = 0.5 * self.ArB * np.log((1.0 - U) / (1.0 + U))
            ct = np.cos(self.B * lam)
            u = np.where(np.abs(ct) < self.TOL, self.A * lam,
                         self.ArB * np.arctan2(
                             S * self.cosgam + V * self.singam, ct))
        v = np.where(polar, np.where(phi > 0, self.v_pole_n, self.v_pole_s), v)
        u = np.where(polar, self.ArB * phi, u)
        if self.no_rot:
            return np.where(ok, u, NAN), np.where(ok, v, NAN)
        u = u - self.u_0
        x = v * self.cosrot + u * self.sinrot
        y = u * self.cosrot - v * self.sinrot
        return np.where(ok, x, NAN), np.where(ok, y, NAN)

    def _inv(self, x, y):
        if self.no_rot:
            v, u = y, x
        else:
            v = x * self.cosrot - y * self.sinrot
            u = y * self.cosrot + x * self.sinrot + self.u_0
        Qp = np.exp(-self.BrA * v)
        Sp = 0.5 * (Qp - 1.0 / Qp)
        Tp = 0.5 * (Qp + 1.0 / Qp)
        Vp = np.sin(self.BrA * u)
        Up = (Vp * self.cosgam + Sp * self.singam) / Tp
        pole = np.abs(np.abs(Up) - 1.0) < self.EPS
        with np.errstate(invalid="ignore", divide="ignore"):
            t = self.E / np.sqrt((1.0 + Up) / (1.0 - Up))
            phi = mu.phi2(t ** (1.0 / self.B), self.e)
            lam = -self.rB * np.arctan2(
                Sp * self.cosgam - Vp * self.singam, np.cos(self.BrA * u))
        phi = np.where(pole, np.where(Up < 0, -mu.HALFPI, mu.HALFPI), phi)
        lam = np.where(pole, 0.0, lam)
        return lam, phi


class Labrd(Operation):
    """Laborde (Madagascar) (labrd.cpp)."""

    proj_name = "labrd"

    def setup(self) -> None:
        if self.phi0 == 0.0:
            raise ValueError("labrd: lat_0 is zero")
        Az = float(self.params.get("azi", 0.0)) * D2R
        sinp = np.sin(self.phi0)
        t = 1.0 - self.es * sinp * sinp
        N = 1.0 / np.sqrt(t)
        R = self.one_es * N / t
        self.kRg = self.k0 * np.sqrt(N * R)
        self.p0s = np.arctan(np.sqrt(R / N) * np.tan(self.phi0))
        self.A = sinp / np.sin(self.p0s)
        t = self.e * sinp
        self.C = (0.5 * self.e * self.A * np.log((1.0 + t) / (1.0 - t))
                  - self.A * np.log(np.tan(FORTPI + 0.5 * self.phi0))
                  + np.log(np.tan(FORTPI + 0.5 * self.p0s)))
        t = Az + Az
        self.Cb = 1.0 / (12.0 * self.kRg * self.kRg)
        self.Ca = (1.0 - np.cos(t)) * self.Cb
        self.Cb = self.Cb * np.sin(t)
        self.Cc = 3.0 * (self.Ca * self.Ca - self.Cb * self.Cb)
        self.Cd = 6.0 * self.Ca * self.Cb

    def _fwd(self, lam, phi):
        V1 = self.A * np.log(np.tan(FORTPI + 0.5 * phi))
        t = self.e * np.sin(phi)
        V2 = 0.5 * self.e * self.A * np.log((1.0 + t) / (1.0 - t))
        ps = 2.0 * (np.arctan(np.exp(V1 - V2 + self.C)) - FORTPI)
        I1 = ps - self.p0s
        cosps = np.cos(ps)
        cosps2 = cosps * cosps
        sinps = np.sin(ps)
        sinps2 = sinps * sinps
        I4 = self.A * cosps
        I2 = 0.5 * self.A * I4 * sinps
        I3 = I2 * self.A * self.A * (5.0 * cosps2 - sinps2) / 12.0
        I6 = I4 * self.A * self.A
        I5 = I6 * (cosps2 - sinps2) / 6.0
        I6 = I6 * self.A * self.A * (
            5.0 * cosps2 * cosps2 + sinps2 * (sinps2 - 18.0 * cosps2)) / 120.0
        t = lam * lam
        x = self.kRg * lam * (I4 + t * (I5 + t * I6))
        y = self.kRg * (I1 + t * (I2 + t * I3))
        x2 = x * x
        y2 = y * y
        V1 = 3.0 * x * y2 - x * x2
        V2 = y * y2 - 3.0 * x2 * y
        x = x + self.Ca * V1 + self.Cb * V2
        y = y + self.Ca * V2 - self.Cb * V1
        return x, y

    def _inv(self, x, y):
        x2 = x * x
        y2 = y * y
        V1 = 3.0 * x * y2 - x * x2
        V2 = y * y2 - 3.0 * x2 * y
        V3 = x * (5.0 * y2 * y2 + x2 * (-10.0 * y2 + x2))
        V4 = y * (5.0 * x2 * x2 + y2 * (-10.0 * x2 + y2))
        x = x - self.Ca * V1 - self.Cb * V2 + self.Cc * V3 + self.Cd * V4
        y = y + self.Cb * V1 - self.Ca * V2 - self.Cd * V3 + self.Cc * V4
        ps = self.p0s + y / self.kRg
        pe = ps + self.phi0 - self.p0s
        for _ in range(20):
            V1 = self.A * np.log(np.tan(FORTPI + 0.5 * pe))
            tpe = self.e * np.sin(pe)
            V2 = 0.5 * self.e * self.A * np.log((1.0 + tpe) / (1.0 - tpe))
            t = ps - 2.0 * (np.arctan(np.exp(V1 - V2 + self.C)) - FORTPI)
            pe = pe + t
        t = self.e * np.sin(pe)
        t = 1.0 - t * t
        Re = self.one_es / (t * np.sqrt(t))
        t = np.tan(ps)
        t2 = t * t
        s = self.kRg * self.kRg
        d = Re * self.k0 * self.kRg
        I7 = t / (2.0 * d)
        I8 = t * (5.0 + 3.0 * t2) / (24.0 * d * s)
        d = np.cos(ps) * self.kRg * self.A
        I9 = 1.0 / d
        d = d * s
        I10 = (1.0 + 2.0 * t2) / (6.0 * d)
        I11 = (5.0 + t2 * (28.0 + 24.0 * t2)) / (120.0 * d * s)
        x2 = x * x
        phi = pe + x2 * (-I7 + I8 * x2)
        lam = x * (I9 + x2 * (-I10 + x2 * I11))
        return lam, phi


class Rouss(Operation):
    """Roussilhe stereographic (rouss.cpp)."""

    proj_name = "rouss"

    def setup(self) -> None:
        self.md = _mdist_coeffs(self.es)
        sp = np.sin(self.phi0)
        self.s0 = float(mdist(np.float64(self.phi0), np.float64(sp),
                              np.float64(np.cos(self.phi0)), self.md))
        es2 = self.es * sp * sp
        t = 1.0 - es2
        N0 = 1.0 / np.sqrt(t)
        R_R0_2 = t * t / self.one_es
        R_R0_4 = R_R0_2 * R_R0_2
        t = np.tan(self.phi0)
        t2 = t * t
        self.A1 = self.C1 = R_R0_2 / 4.0
        self.A2 = self.C2 = R_R0_2 * (2 * t2 - 1.0 - 2.0 * es2) / 12.0
        self.A3 = R_R0_2 * t * (1.0 + 4.0 * t2) / (12.0 * N0)
        self.A4 = R_R0_4 / 24.0
        self.A5 = R_R0_4 * (-1.0 + t2 * (11.0 + 12.0 * t2)) / 24.0
        self.A6 = R_R0_4 * (-2.0 + t2 * (11.0 - 2.0 * t2)) / 240.0
        self.B1 = t / (2.0 * N0)
        self.B2 = R_R0_2 / 12.0
        self.B3 = R_R0_2 * (1.0 + 2.0 * t2 - 2.0 * es2) / 4.0
        self.B4 = R_R0_2 * t * (2.0 - t2) / (24.0 * N0)
        self.B5 = R_R0_2 * t * (5.0 + 4.0 * t2) / (8.0 * N0)
        self.B6 = R_R0_4 * (-2.0 + t2 * (-5.0 + 6.0 * t2)) / 48.0
        self.B7 = R_R0_4 * (5.0 + t2 * (19.0 + 12.0 * t2)) / 24.0
        self.B8 = R_R0_4 / 120.0
        self.C3 = R_R0_2 * t * (1.0 + t2) / (3.0 * N0)
        self.C4 = R_R0_4 * (-3.0 + t2 * (34.0 + 22.0 * t2)) / 240.0
        self.C5 = R_R0_4 * (4.0 + t2 * (13.0 + 12.0 * t2)) / 24.0
        self.C6 = R_R0_4 / 16.0
        self.C7 = R_R0_4 * t * (11.0 + t2 * (33.0 + t2 * 16.0)) / (48.0 * N0)
        self.C8 = R_R0_4 * t * (1.0 + t2 * 4.0) / (36.0 * N0)
        self.D1 = t / (2.0 * N0)
        self.D2 = R_R0_2 / 12.0
        self.D3 = R_R0_2 * (2 * t2 + 1.0 - 2.0 * es2) / 4.0
        self.D4 = R_R0_2 * t * (1.0 + t2) / (8.0 * N0)
        self.D5 = R_R0_2 * t * (1.0 + t2 * 2.0) / (4.0 * N0)
        self.D6 = R_R0_4 * (1.0 + t2 * (6.0 + t2 * 6.0)) / 16.0
        self.D7 = R_R0_4 * t2 * (3.0 + t2 * 4.0) / 8.0
        self.D8 = R_R0_4 / 80.0
        self.D9 = R_R0_4 * t * (-21.0 + t2 * (178.0 - t2 * 26.0)) / 720.0
        self.D10 = R_R0_4 * t * (29.0 + t2 * (86.0 + t2 * 48.0)) / (96.0 * N0)
        self.D11 = R_R0_4 * t * (37.0 + t2 * 44.0) / (96.0 * N0)

    def _fwd(self, lam, phi):
        cp = np.cos(phi)
        sp = np.sin(phi)
        s = mdist(phi, sp, cp, self.md) - self.s0
        s2 = s * s
        al = lam * cp / np.sqrt(1.0 - self.es * sp * sp)
        al2 = al * al
        x = self.k0 * al * (1.0 + s2 * (self.A1 + s2 * self.A4)
                            - al2 * (self.A2 + s * self.A3 + s2 * self.A5
                                     + al2 * self.A6))
        y = self.k0 * (al2 * (self.B1 + al2 * self.B4)
                       + s * (1.0 + al2 * (self.B3 - al2 * self.B6)
                              + s2 * (self.B2 + s2 * self.B8)
                              + s * al2 * (self.B5 + s * self.B7)))
        return x, y

    def _inv(self, x, y):
        x = x / self.k0
        y = y / self.k0
        x2 = x * x
        y2 = y * y
        al = x * (1.0 - self.C1 * y2
                  + x2 * (self.C2 + self.C3 * y - self.C4 * x2
                          + self.C5 * y2 - self.C7 * x2 * y)
                  + y2 * (self.C6 * y2 - self.C8 * x2 * y))
        s = self.s0 + y * (1.0 + y2 * (-self.D2 + self.D8 * y2)) + \
            x2 * (-self.D1 + y * (-self.D3 + y * (-self.D5 + y * (
                -self.D7 + y * self.D11)))
                + x2 * (self.D4 + y * (self.D6 + y * self.D10)
                        - x2 * self.D9))
        phi = inv_mdist(s, self.md)
        sp = np.sin(phi)
        lam = al * np.sqrt(1.0 - self.es * sp * sp) / np.cos(phi)
        return lam, phi


class Rpoly(_SphOp):
    """Rectangular polyconic; no inverse (rpoly.cpp)."""

    proj_name = "rpoly"
    EPS = 1e-9

    def _setup(self) -> None:
        self.phi1 = abs(float(self.params.get("lat_ts", 0.0)) * D2R)
        self.mode = self.phi1 > self.EPS
        if self.mode:
            self.fxb = 0.5 * np.sin(self.phi1)
            self.fxa = 0.5 / self.fxb

    def _fwd(self, lam, phi):
        if self.mode:
            fa0 = np.tan(lam * self.fxb) * self.fxa
        else:
            fa0 = 0.5 * lam
        eq = np.abs(phi) < self.EPS
        with np.errstate(invalid="ignore", divide="ignore"):
            cot = 1.0 / np.tan(phi)
            fa = 2.0 * np.arctan(fa0 * np.sin(phi))
            x = np.sin(fa) * cot
            y = phi - self.phi0 + (1.0 - np.cos(fa)) * cot
        return np.where(eq, fa0 + fa0, x), np.where(eq, -self.phi0, y)


class Calcofi(Operation):
    """CalCOFI line/station pseudo-projection (calcofi.cpp)."""

    proj_name = "calcofi"
    LINE_TO_RAD = 0.0034906585039886592
    STATION_TO_RAD = 0.0011635528346628863
    PT_O_LINE = 80.0
    PT_O_STATION = 60.0
    PT_O_LAMBDA = -2.1144663887911301
    PT_O_PHI = 0.59602993955606354
    ROT = 0.52359877559829882
    R2D = 180.0 / np.pi

    def setup(self) -> None:
        # outputs are line/station numbers: defeat the a-scaling and
        # offsets (reference sets a=1, ra=1, x0=y0=0, over=1)
        self.a = 1.0
        self.ra = 1.0
        self.lam0 = 0.0
        self.x0 = 0.0
        self.y0 = 0.0
        self.over = True

    def _merc_y(self, phi):
        if self.es != 0.0:
            return -np.log(mu.tsfn(phi, np.sin(phi), self.e))
        return np.log(np.tan(FORTPI + 0.5 * phi))

    def _inv_merc(self, y):
        if self.es != 0.0:
            return mu.phi2(np.exp(-y), self.e)
        return mu.HALFPI - 2.0 * np.arctan(np.exp(-y))

    def _fwd(self, lam, phi):
        ok = np.abs(np.abs(phi) - mu.HALFPI) > 1e-10
        ym = self._merc_y(np.where(ok, phi, 0.0))
        oy = self._merc_y(np.float64(self.PT_O_PHI))
        l1 = (ym - oy) * np.tan(self.ROT)
        l2 = -lam - l1 + self.PT_O_LAMBDA
        ry = l2 * np.cos(self.ROT) * np.sin(self.ROT) + ym
        ry = self._inv_merc(ry)
        x = self.PT_O_LINE - self.R2D * (ry - self.PT_O_PHI) * 5.0 \
            / np.cos(self.ROT)
        y = self.PT_O_STATION + self.R2D * (ry - phi) * 15.0 \
            / np.sin(self.ROT)
        return np.where(ok, x, NAN), np.where(ok, y, NAN)

    def _inv(self, x, y):
        ry = self.PT_O_PHI - self.LINE_TO_RAD * (x - self.PT_O_LINE) \
            * np.cos(self.ROT)
        phi = ry - self.STATION_TO_RAD * (y - self.PT_O_STATION) \
            * np.sin(self.ROT)
        oym = self._merc_y(np.float64(self.PT_O_PHI))
        rym = self._merc_y(ry)
        xym = self._merc_y(phi)
        l1 = (xym - oym) * np.tan(self.ROT)
        l2 = (rym - xym) / (np.cos(self.ROT) * np.sin(self.ROT))
        lam = self.PT_O_LAMBDA - (l1 + l2)
        return lam, phi


class NZMG(Operation):
    """New Zealand Map Grid: 6th-order complex series (nzmg.cpp)."""

    proj_name = "nzmg"
    RAD_TO_SEC5 = 2.062648062470963551564733573
    SEC5_TO_RAD = 0.4848136811095359935899141023
    BF = [complex(0.7557853228, 0.0),
          complex(0.249204646, 0.003371507),
          complex(-0.001541739, 0.041058560),
          complex(-0.10162907, 0.01727609),
          complex(-0.26623489, -0.36249218),
          complex(-0.6870983, -1.1651967)]
    TPHI = [1.5627014243, 0.5185406398, -0.03333098, -0.1052906, -0.0368594,
            0.007317, 0.01220, 0.00394, -0.0013]
    TPSI = [0.6399175073, -0.1358797613, 0.063294409, -0.02526853, 0.0117879,
            -0.0055161, 0.0026906, -0.001333, 0.00067, -0.00034]

    def setup(self) -> None:
        self.a = 6378388.0
        self.ra = 1.0 / self.a
        self.lam0 = 173.0 * D2R
        self.phi0 = -41.0 * D2R
        self.x0 = 2510000.0
        self.y0 = 6023150.0
        # zpoly1 coefficients are ordered c[0] + c[1] z + ...; the
        # reference stores bf[0] as the LOWEST degree (pj_zpoly1 walks
        # from the top index down) — order matches list order here.

    def _fwd(self, lam, phi):
        dphi = (phi - self.phi0) * self.RAD_TO_SEC5
        pr = np.zeros_like(dphi) + self.TPSI[-1]
        for c in self.TPSI[-2::-1]:
            pr = c + dphi * pr
        pr = pr * dphi
        z = pr + 1j * lam
        w = zpoly1(z, self.BF)
        return w.imag, w.real

    def _inv(self, x, y):
        p = y + 1j * x
        for _ in range(20):
            f, fp = zpolyd1(p, self.BF)
            f = f - (y + 1j * x)
            with np.errstate(invalid="ignore", divide="ignore"):
                p = p - f / fp
        lam = p.imag
        pr = p.real
        phi = np.zeros_like(pr) + self.TPHI[-1]
        for c in self.TPHI[-2::-1]:
            phi = c + pr * phi
        phi = self.phi0 + pr * phi * self.SEC5_TO_RAD
        return lam, phi


REGISTRY = {
    c.proj_name: c for c in (
        Krovak, Omerc, Labrd, Rouss, Rpoly, Calcofi, NZMG,
    )
}


class ModSter(Operation):
    """Modified stereographic base: conformal-sphere stereographic fed
    through a complex polynomial (mod_ster.cpp)."""

    proj_name = "mil_os"
    N = 2
    AB: list = [complex(0.924500, 0.0), 0j, complex(0.019430, 0.0)]
    AB_SPH: list | None = None
    LAM0_DEG, PHI0_DEG = 20.0, 18.0
    FORCE_SPHERE = True          # P->es = 0 (mil_os / lee_os)
    FIX_A = None                 # gs48/alsk/gs50 fix the datum

    def setup(self) -> None:
        if self.FORCE_SPHERE:
            self.es = 0.0
            self.e = 0.0
            self.one_es = 1.0
        if "lon_0" not in self.params:
            self.lam0 = self.LAM0_DEG * D2R
        if "lat_0" not in self.params:
            self.phi0 = self.PHI0_DEG * D2R
        self.zc = list(self.AB)
        if self.FIX_A is not None:
            if self.es != 0.0:
                self.a = self.FIX_A[0]
                self.es = self.FIX_A[1]
                self.e = np.sqrt(self.es)
                self.one_es = 1.0 - self.es
            else:
                self.a = self.FIX_A[2]
                self.zc = list(self.AB_SPH)
        if self.es != 0.0:
            esphi = self.e * np.sin(self.phi0)
            chio = 2.0 * np.arctan(
                np.tan((mu.HALFPI + self.phi0) * 0.5)
                * ((1.0 - esphi) / (1.0 + esphi)) ** (self.e * 0.5)) \
                - mu.HALFPI
        else:
            chio = self.phi0
        self.schio = np.sin(chio)
        self.cchio = np.cos(chio)

    def _fwd(self, lam, phi):
        sinlon = np.sin(lam)
        coslon = np.cos(lam)
        if self.es != 0.0:
            esphi = self.e * np.sin(phi)
            chi = 2.0 * np.arctan(
                np.tan((mu.HALFPI + phi) * 0.5)
                * ((1.0 - esphi) / (1.0 + esphi)) ** (self.e * 0.5)) \
                - mu.HALFPI
        else:
            chi = phi
        schi = np.sin(chi)
        cchi = np.cos(chi)
        denom = 1.0 + self.schio * schi + self.cchio * cchi * coslon
        ok = denom != 0.0
        s = 2.0 / np.where(ok, denom, 1.0)
        z = (s * cchi * sinlon) + 1j * (
            s * (self.cchio * schi - self.schio * cchi * coslon))
        w = zpoly1(z, self.zc)
        return np.where(ok, w.real, NAN), np.where(ok, w.imag, NAN)

    def _inv(self, x, y):
        z0 = x + 1j * y
        p = np.array(z0, copy=True)
        for _ in range(20):
            f, fp = zpolyd1(p, self.zc)
            with np.errstate(invalid="ignore", divide="ignore"):
                p = p - (f - z0) / fp
        rh = np.abs(p)
        z = 2.0 * np.arctan(0.5 * rh)
        sinz = np.sin(z)
        cosz = np.cos(z)
        origin = rh <= 1e-12
        with np.errstate(invalid="ignore", divide="ignore"):
            chi = aasin(cosz * self.schio
                        + p.imag * sinz * self.cchio / np.where(origin, 1, rh))
            phi = np.array(chi, copy=True)
            if self.es != 0.0:
                for _ in range(20):
                    esphi = self.e * np.sin(phi)
                    phi = 2.0 * np.arctan(
                        np.tan((mu.HALFPI + chi) * 0.5)
                        * ((1.0 + esphi) / (1.0 - esphi)) ** (self.e * 0.5)) \
                        - mu.HALFPI
            lam = np.arctan2(p.real * sinz,
                             rh * self.cchio * cosz
                             - p.imag * self.schio * sinz)
        lam = np.where(origin, 0.0, lam)
        phi = np.where(origin, self.phi0, phi)
        return lam, phi


class MilOS(ModSter):
    proj_name = "mil_os"


class LeeOS(ModSter):
    proj_name = "lee_os"
    N = 2
    AB = [complex(0.721316, 0.0), 0j, complex(-0.0088162, -0.00617325)]
    LAM0_DEG, PHI0_DEG = -165.0, -10.0


class GS48(ModSter):
    proj_name = "gs48"
    AB = [complex(0.98879, 0.0), 0j, complex(-0.050909, 0.0), 0j,
          complex(0.075528, 0.0)]
    LAM0_DEG, PHI0_DEG = -96.0, 39.0

    def setup(self) -> None:
        super().setup()
        self.a = 6370997.0

    # gs48 forces sphere AND a=6370997 but leaves ra (reference quirk)


class Alsk(ModSter):
    proj_name = "alsk"
    FORCE_SPHERE = False
    FIX_A = (6378206.4, 0.00676866, 6370997.0)
    AB = [complex(0.9945303, 0.0), complex(0.0052083, -0.0027404),
          complex(0.0072721, 0.0048181), complex(-0.0151089, -0.1932526),
          complex(0.0642675, -0.1381226), complex(0.3582802, -0.2884586)]
    AB_SPH = [complex(0.9972523, 0.0), complex(0.0052513, -0.0041175),
              complex(0.0074606, 0.0048125), complex(-0.0153783, -0.1968253),
              complex(0.0636871, -0.1408027), complex(0.3660976, -0.2937382)]
    LAM0_DEG, PHI0_DEG = -152.0, 64.0


class GS50(ModSter):
    proj_name = "gs50"
    FORCE_SPHERE = False
    FIX_A = (6378206.4, 0.00676866, 6370997.0)
    AB = [complex(0.9827497, 0.0), complex(0.0210669, 0.0053804),
          complex(-0.1031415, -0.0571664), complex(-0.0323337, -0.0322847),
          complex(0.0502303, 0.1211983), complex(0.0251805, 0.0895678),
          complex(-0.0012315, -0.1416121), complex(0.0072202, -0.1317091),
          complex(-0.0194029, 0.0759677), complex(-0.0210072, 0.0834037)]
    AB_SPH = [complex(0.9842990, 0.0), complex(0.0211642, 0.0037608),
              complex(-0.1036018, -0.0575102), complex(-0.0329095, -0.0320119),
              complex(0.0499471, 0.1223335), complex(0.0260460, 0.0899805),
              complex(0.0007388, -0.1435792), complex(0.0075848, -0.1334108),
              complex(-0.0216473, 0.0776645), complex(-0.0225161, 0.0853673)]
    LAM0_DEG, PHI0_DEG = -120.0, 45.0


class Geos(Operation):
    """Geostationary satellite view (geos.cpp)."""

    proj_name = "geos"

    def setup(self) -> None:
        self.h = float(self.params["h"])
        sweep = self.params.get("sweep")
        if sweep not in (None, "x", "y"):
            raise ValueError("geos: invalid sweep axis")
        self.flip_axis = sweep == "x"
        self.radius_g_1 = self.h / self.a
        if self.radius_g_1 <= 0 or self.radius_g_1 > 1e10:
            raise ValueError("geos: invalid h")
        self.radius_g = 1.0 + self.radius_g_1
        self.C = self.radius_g * self.radius_g - 1.0
        if self.es != 0.0:
            self.radius_p = np.sqrt(self.one_es)
            self.radius_p2 = self.one_es
            self.radius_p_inv2 = 1.0 / self.one_es
        else:
            self.radius_p = self.radius_p2 = self.radius_p_inv2 = 1.0

    def _fwd(self, lam, phi):
        if self.es != 0.0:
            phi = np.arctan(self.radius_p2 * np.tan(phi))
            r = self.radius_p / np.hypot(self.radius_p * np.cos(phi),
                                         np.sin(phi))
        else:
            r = 1.0
        Vx = r * np.cos(lam) * np.cos(phi)
        Vy = r * np.sin(lam) * np.cos(phi)
        Vz = r * np.sin(phi)
        ok = ((self.radius_g - Vx) * Vx - Vy * Vy
              - Vz * Vz * self.radius_p_inv2) >= 0.0
        tmp = self.radius_g - Vx
        if self.flip_axis:
            x = self.radius_g_1 * np.arctan(Vy / np.hypot(Vz, tmp))
            y = self.radius_g_1 * np.arctan(Vz / tmp)
        else:
            x = self.radius_g_1 * np.arctan(Vy / tmp)
            y = self.radius_g_1 * np.arctan(Vz / np.hypot(Vy, tmp))
        return np.where(ok, x, NAN), np.where(ok, y, NAN)

    def _inv(self, x, y):
        Vx = -1.0
        if self.flip_axis:
            Vz = np.tan(y / self.radius_g_1)
            Vy = np.tan(x / self.radius_g_1) * np.hypot(1.0, Vz)
        else:
            Vy = np.tan(x / self.radius_g_1)
            Vz = np.tan(y / self.radius_g_1) * np.hypot(1.0, Vy)
        if self.es != 0.0:
            av = Vz / self.radius_p
            a_ = Vy * Vy + av * av + Vx * Vx
        else:
            a_ = Vy * Vy + Vz * Vz + Vx * Vx
        b = 2.0 * self.radius_g * Vx
        det = b * b - 4.0 * a_ * self.C
        ok = det >= 0.0
        with np.errstate(invalid="ignore", divide="ignore"):
            k = (-b - np.sqrt(np.where(ok, det, 0.0))) / (2.0 * a_)
            Vx2 = self.radius_g + k * Vx
            Vy2 = Vy * k
            Vz2 = Vz * k
            lam = np.arctan2(Vy2, Vx2)
            phi = np.arctan(Vz2 * np.cos(lam) / Vx2)
            if self.es != 0.0:
                phi = np.arctan(self.radius_p_inv2 * np.tan(phi))
        return np.where(ok, lam, NAN), np.where(ok, phi, NAN)


class Bipc(_SphOp):
    """Bipolar conic of western hemisphere (bipc.cpp)."""

    proj_name = "bipc"
    lamB = -0.34894976726250681539
    n = 0.63055844881274687180
    F = 1.89724742567461030582
    Azab = 0.81650043674686363166
    Azba = 1.82261843856185925133
    T = 1.27246578267089012270
    rhoc = 1.20709121521568721927
    cAzc = 0.69691523038678375519
    sAzc = 0.71715351331143607555
    C45 = 0.70710678118654752469
    S45 = 0.70710678118654752410
    C20 = 0.93969262078590838411
    S20 = -0.34202014332566873287
    R110 = 1.91986217719376253360
    R104 = 1.81514242207410275904

    def _setup(self) -> None:
        self.noskew = "ns" in self.params

    def _fwd(self, lam, phi):
        cphi = np.cos(phi)
        sphi = np.sin(phi)
        sdlam = self.lamB - lam
        cdlam = np.cos(sdlam)
        sdlam = np.sin(sdlam)
        polar = np.abs(np.abs(phi) - mu.HALFPI) < 1e-10
        with np.errstate(invalid="ignore", divide="ignore"):
            tphi = np.where(polar, np.inf, sphi / cphi)
            Az = np.where(polar, np.where(phi < 0.0, np.pi, 0.0),
                          np.arctan2(sdlam, self.C45 * (tphi - cdlam)))
        tag = Az > self.Azba
        # B-hemisphere (tag): recompute with the second pole
        sdlam_b = lam + self.R110
        cdlam_b = np.cos(sdlam_b)
        sdlam_b = np.sin(sdlam_b)
        zb = self.S20 * sphi + self.C20 * cphi * cdlam_b
        ok = np.abs(zb) <= 1.000000001
        zb = np.arccos(np.clip(zb, -1.0, 1.0))
        with np.errstate(invalid="ignore", divide="ignore"):
            Az_b = np.where(np.isinf(tphi), Az, np.arctan2(
                sdlam_b, self.C20 * tphi - self.S20 * cdlam_b))
        za = self.S45 * (sphi + cphi * cdlam)
        ok &= np.abs(za) <= 1.000000001
        za = np.arccos(np.clip(za, -1.0, 1.0))
        z = np.where(tag, zb, za)
        Az = np.where(tag, Az_b, Az)
        Av = np.where(tag, self.Azab, self.Azba)
        y0 = np.where(tag, self.rhoc, -self.rhoc)
        t = np.tan(0.5 * z) ** self.n
        r = self.F * t
        al = 0.5 * (self.R104 - z)
        ok &= al >= 0.0
        al = (t + np.maximum(al, 0.0) ** self.n) / self.T
        ok &= np.abs(al) <= 1.000000001
        al = np.arccos(np.clip(al, -1.0, 1.0))
        t = self.n * (Av - Az)
        with np.errstate(invalid="ignore", divide="ignore"):
            r = np.where(np.abs(t) < al,
                         r / np.cos(al + np.where(tag, t, -t)), r)
        x = r * np.sin(t)
        y = y0 + np.where(tag, -r, r) * np.cos(t)
        if self.noskew:
            xs = -x * self.cAzc - y * self.sAzc
            y = -y * self.cAzc + x * self.sAzc
            x = xs
        return np.where(ok, x, NAN), np.where(ok, y, NAN)

    def _inv(self, x, y):
        if self.noskew:
            xs = -x * self.cAzc + y * self.sAzc
            y = -y * self.cAzc - x * self.sAzc
            x = xs
        neg = x < 0.0
        yy = np.where(neg, self.rhoc - y, y + self.rhoc)
        s = np.where(neg, self.S20, self.S45)
        c = np.where(neg, self.C20, self.C45)
        Av = np.where(neg, self.Azab, self.Azba)
        r = np.hypot(x, yy)
        rp = r.copy()
        Az = np.arctan2(x, yy)
        fAz = np.abs(Az)
        z = np.zeros_like(r)
        for _ in range(10):
            z = 2.0 * np.arctan((r / self.F) ** (1.0 / self.n))
            al = np.arccos(np.clip(
                (np.tan(0.5 * z) ** self.n
                 + np.tan(0.5 * (self.R104 - z)) ** self.n) / self.T, -1, 1))
            r = np.where(fAz < al,
                         rp * np.cos(al + np.where(neg, Az, -Az)), r)
        Az = Av - Az / self.n
        phi = np.arcsin(np.clip(s * np.cos(z) + c * np.sin(z) * np.cos(Az),
                                -1, 1))
        lam = np.arctan2(np.sin(Az), c / np.tan(z) - s * np.cos(Az))
        lam = np.where(neg, lam - self.R110, self.lamB - lam)
        return lam, phi


REGISTRY.update({c.proj_name: c for c in (
    MilOS, LeeOS, GS48, Alsk, GS50, Geos, Bipc,
)})


class ImwP(Operation):
    """International Map of the World Polyconic (imw_p.cpp)."""

    proj_name = "imw_p"
    NONE_IS_ZERO, PHI_1_IS_ZERO, PHI_2_IS_ZERO = 0, 1, -1

    def _xy(self, phi):
        sp = np.sin(phi)
        R = 1.0 / (np.tan(phi) * np.sqrt(1.0 - self.es * sp * sp))
        F = self.lam_1 * sp
        return R * np.sin(F), R * (1 - np.cos(F)), sp, R

    def setup(self) -> None:
        self.en = mu.enfn(self.es)
        phi_1 = float(self.params["lat_1"]) * D2R
        phi_2 = float(self.params["lat_2"]) * D2R
        if phi_2 < phi_1:
            phi_1, phi_2 = phi_2, phi_1
        self.phi_1, self.phi_2 = phi_1, phi_2
        if "lon_1" in self.params:
            self.lam_1 = float(self.params["lon_1"]) * D2R
        else:
            sig = abs(0.5 * (phi_2 + phi_1)) / D2R
            self.lam_1 = (2.0 if sig <= 60 else (4.0 if sig <= 76 else 8.0)) \
                * D2R
        self.mode = self.NONE_IS_ZERO
        if phi_1 != 0.0:
            x1, y1, self.sphi_1, self.R_1 = self._xy(np.float64(phi_1))
        else:
            self.mode = self.PHI_1_IS_ZERO
            y1 = 0.0
            x1 = self.lam_1
            self.sphi_1 = 0.0
            self.R_1 = 0.0
        if phi_2 != 0.0:
            x2, T2, self.sphi_2, self.R_2 = self._xy(np.float64(phi_2))
        else:
            self.mode = self.PHI_2_IS_ZERO
            T2 = 0.0
            x2 = self.lam_1
            self.sphi_2 = 0.0
            self.R_2 = 0.0
        m1 = mu.mlfn(np.float64(phi_1), np.float64(np.sin(phi_1)),
                     np.float64(np.cos(phi_1)), self.en)
        m2 = mu.mlfn(np.float64(phi_2), np.float64(np.sin(phi_2)),
                     np.float64(np.cos(phi_2)), self.en)
        t = m2 - m1
        s = x2 - x1
        y2 = np.sqrt(t * t - s * s) + y1
        self.C2 = float(y2 - T2)
        t = 1.0 / t
        self.P = float((m2 * y1 - m1 * y2) * t)
        self.Q = float((y2 - y1) * t)
        self.Pp = float((m2 * x1 - m1 * x2) * t)
        self.Qp = float((x2 - x1) * t)

    def _loc_for(self, lam, phi):
        eq = phi == 0.0
        with np.errstate(invalid="ignore", divide="ignore"):
            sp = np.sin(phi)
            m = mu.mlfn(phi, sp, np.cos(phi), self.en)
            xa = self.Pp + self.Qp * m
            ya = self.P + self.Q * m
            R = 1.0 / (np.tan(phi) * np.sqrt(1.0 - self.es * sp * sp))
            C = np.sqrt(np.maximum(R * R - xa * xa, 0.0))
            C = np.where(phi < 0.0, -C, C) + ya - R
            if self.mode == self.PHI_2_IS_ZERO:
                xb = lam
                yb = np.full_like(lam, self.C2)
            else:
                t = lam * self.sphi_2
                xb = self.R_2 * np.sin(t)
                yb = self.C2 + self.R_2 * (1.0 - np.cos(t))
            if self.mode == self.PHI_1_IS_ZERO:
                xc = lam
                yc = np.zeros_like(lam)
            else:
                t = lam * self.sphi_1
                xc = self.R_1 * np.sin(t)
                yc = self.R_1 * (1.0 - np.cos(t))
            D = (xb - xc) / (yb - yc)
            B = xc + D * (C + R - yc)
            x = D * np.sqrt(np.maximum(R * R * (1 + D * D) - B * B, 0.0))
            x = np.where(phi > 0.0, -x, x)
            x = (B + x) / (1.0 + D * D)
            y = np.sqrt(np.maximum(R * R - x * x, 0.0))
            y = np.where(phi > 0.0, -y, y) + C + R
        x = np.where(eq, lam, x)
        y = np.where(eq, 0.0, y)
        yc = np.where(eq, 0.0, yc)
        return x, y, yc

    def _fwd(self, lam, phi):
        x, y, _ = self._loc_for(lam, phi)
        return x, y

    def _inv(self, x, y):
        TOL = 1e-10
        phi = np.full(np.shape(x), self.phi_2, dtype=np.float64)
        lam = x / np.cos(phi)
        for _ in range(100):
            tx, ty, yc = self._loc_for(lam, phi)
            with np.errstate(invalid="ignore", divide="ignore"):
                denom = ty - yc
                upd = (denom != 0) | (np.abs(ty - y) > TOL)
                phi_new = ((phi - self.phi_1) * (y - yc)
                           / np.where(denom == 0, 1.0, denom)) + self.phi_1
                phi = np.where(upd & (denom != 0), phi_new, phi)
                lam = np.where((tx != 0) & (np.abs(tx - x) > TOL),
                               lam * x / np.where(tx == 0, 1.0, tx), lam)
        return lam, phi


class SOMBase(Operation):
    """Space Oblique Mercator core (lsat.cpp / misrsom.cpp)."""

    proj_name = "lsat"
    TOL = 1e-7

    def _seraz0(self, lam_deg, mult):
        lam = lam_deg * D2R
        sd = np.sin(lam)
        sdsq = sd * sd
        s = self.p22 * self.sa * np.cos(lam) * np.sqrt(
            (1.0 + self.t * sdsq)
            / ((1.0 + self.w * sdsq) * (1.0 + self.q * sdsq)))
        d1 = 1.0 + self.q * sdsq
        h = np.sqrt((1.0 + self.q * sdsq) / (1.0 + self.w * sdsq)) * (
            (1.0 + self.w * sdsq) / (d1 * d1) - self.p22 * self.ca)
        sq = np.sqrt(self.xj * self.xj + s * s)
        fc = mult * (h * self.xj - s * s) / sq
        self.b += fc
        self.a2 += fc * np.cos(lam + lam)
        self.a4 += fc * np.cos(lam * 4.0)
        fc = mult * s * (h + self.xj) / sq
        self.c1 += fc * np.cos(lam)
        self.c3 += fc * np.cos(lam * 3.0)

    def _som_setup(self, alf, p22_min):
        self.p22 = p22_min / 1440.0
        self.sa = np.sin(alf)
        self.ca = np.cos(alf)
        if abs(self.ca) < 1e-9:
            self.ca = 1e-9
        rone_es = 1.0 / self.one_es
        esc = self.es * self.ca * self.ca
        ess = self.es * self.sa * self.sa
        self.w = ((1.0 - esc) * rone_es) ** 2 - 1.0
        self.q = ess * rone_es
        self.t = ess * (2.0 - self.es) * rone_es * rone_es
        self.u = esc * rone_es
        self.xj = self.one_es ** 3
        self.a2 = self.a4 = self.b = self.c1 = self.c3 = 0.0
        self._seraz0(0.0, 1.0)
        lam = 9.0
        while lam <= 81.0001:
            self._seraz0(lam, 4.0)
            lam += 18.0
        lam = 18.0
        while lam <= 72.0001:
            self._seraz0(lam, 2.0)
            lam += 18.0
        self._seraz0(90.0, 1.0)
        self.a2 /= 30.0
        self.a4 /= 60.0
        self.b /= 30.0
        self.c1 /= 15.0
        self.c3 /= 45.0

    def _fwd(self, lam, phi):
        TOL = self.TOL
        phi = np.clip(phi, -mu.HALFPI, mu.HALFPI)
        lampp = np.where(phi >= 0.0, mu.HALFPI, np.pi + mu.HALFPI)
        tanphi = np.tan(phi)
        lamdp = np.zeros_like(lam)
        lamt = np.zeros_like(lam)
        ok = np.ones(np.shape(lam), dtype=bool)
        settled = np.zeros(np.shape(lam), dtype=bool)
        for _ in range(3):
            sav = lampp.copy()
            lamtp = lam + self.p22 * lampp
            cl = np.cos(lamtp)
            fac = np.where(cl < 0, lampp + np.sin(lampp) * mu.HALFPI,
                           lampp - np.sin(lampp) * mu.HALFPI)
            conv = np.zeros(np.shape(lam), dtype=bool)
            for _ in range(51):
                lamt_i = lam + self.p22 * sav
                c = np.cos(lamt_i)
                lamt_i = np.where(np.abs(c) < TOL, lamt_i - TOL, lamt_i)
                c = np.cos(lamt_i)
                with np.errstate(invalid="ignore", divide="ignore"):
                    xlam = (self.one_es * tanphi * self.sa
                            + np.sin(lamt_i) * self.ca) / c
                nlamdp = np.arctan(xlam) + fac
                conv |= np.abs(np.abs(sav) - np.abs(nlamdp)) < TOL
                sav = np.where(conv, sav, nlamdp)
                upd = ~settled
                lamdp = np.where(upd, nlamdp, lamdp)
                lamt = np.where(upd, lamt_i, lamt)
            inside = (lamdp > self.rlm) & (lamdp < self.rlm2)
            settled |= conv & inside
            settled |= ~conv  # iteration failure: keep latest, mark NaN
            ok &= conv | settled
            lampp = np.where(~settled & (lamdp <= self.rlm),
                             2 * np.pi + mu.HALFPI,
                             np.where(~settled & (lamdp >= self.rlm2),
                                      mu.HALFPI, lampp))
            settled |= inside
        sp = np.sin(phi)
        with np.errstate(invalid="ignore", divide="ignore"):
            phidp = aasin((self.one_es * self.ca * sp
                           - self.sa * np.cos(phi) * np.sin(lamt))
                          / np.sqrt(1.0 - self.es * sp * sp))
            tanph = np.log(np.tan(FORTPI + 0.5 * phidp))
            sd = np.sin(lamdp)
            sdsq = sd * sd
            s = self.p22 * self.sa * np.cos(lamdp) * np.sqrt(
                (1.0 + self.t * sdsq)
                / ((1.0 + self.w * sdsq) * (1.0 + self.q * sdsq)))
            d = np.sqrt(self.xj * self.xj + s * s)
            x = (self.b * lamdp + self.a2 * np.sin(2.0 * lamdp)
                 + self.a4 * np.sin(lamdp * 4.0) - tanph * s / d)
            y = (self.c1 * sd + self.c3 * np.sin(lamdp * 3.0)
                 + tanph * self.xj / d)
        return x, y

    def _inv(self, x, y):
        TOL = self.TOL
        rone_es = 1.0 / self.one_es
        lamdp = x / self.b
        s = np.zeros_like(x)
        frozen = np.zeros(np.shape(x), dtype=bool)
        for _ in range(50):
            sav = lamdp
            sd = np.sin(lamdp)
            sdsq = sd * sd
            s_new = self.p22 * self.sa * np.cos(lamdp) * np.sqrt(
                (1.0 + self.t * sdsq)
                / ((1.0 + self.w * sdsq) * (1.0 + self.q * sdsq)))
            s = np.where(frozen, s, s_new)
            nlamdp = (x + y * s / self.xj - self.a2 * np.sin(2.0 * lamdp)
                      - self.a4 * np.sin(lamdp * 4.0)
                      - s / self.xj * (self.c1 * np.sin(lamdp)
                                       + self.c3 * np.sin(lamdp * 3.0))) \
                / self.b
            lamdp = np.where(frozen, lamdp, nlamdp)
            # reference stops iterating at |delta| < 1e-7 — match exactly
            frozen |= np.abs(lamdp - sav) < TOL
        sl = np.sin(lamdp)
        # far-out-of-domain y overflows the exp; inf -> arctan clamps to
        # pi/2, same as the reference's double overflow path, so silence
        # the warning (consistent with the invalid/divide guards below)
        with np.errstate(over="ignore"):
            fac = np.exp(np.sqrt(1.0 + s * s / (self.xj * self.xj))
                         * (y - self.c1 * sl - self.c3 * np.sin(lamdp * 3.0)))
        phidp = 2.0 * (np.arctan(fac) - FORTPI)
        dd = sl * sl
        lamdp = np.where(np.abs(np.cos(lamdp)) < TOL, lamdp - TOL, lamdp)
        spp = np.sin(phidp)
        sppsq = spp * spp
        denom = 1.0 - sppsq * (1.0 + self.u)
        with np.errstate(invalid="ignore", divide="ignore"):
            lamt = np.arctan(
                ((1.0 - sppsq * rone_es) * np.tan(lamdp) * self.ca
                 - spp * self.sa * np.sqrt(np.maximum(
                     (1.0 + self.q * dd) * (1.0 - sppsq) - sppsq * self.u,
                     0.0)) / np.cos(lamdp)) / denom)
        sl_sign = np.where(lamt >= 0.0, 1.0, -1.0)
        scl = np.where(np.cos(lamdp) >= 0.0, 1.0, -1.0)
        lamt = lamt - mu.HALFPI * (1.0 - scl) * sl_sign
        lam = lamt - self.p22 * lamdp
        if abs(self.sa) < TOL:
            phi = aasin(spp / np.sqrt(self.one_es * self.one_es
                                      + self.es * sppsq))
        else:
            phi = np.arctan((np.tan(lamdp) * np.cos(lamt)
                             - self.ca * np.sin(lamt))
                            / (self.one_es * self.sa))
        return lam, phi


class Lsat(SOMBase):
    """Landsat Space Oblique Mercator (lsat.cpp)."""

    proj_name = "lsat"

    def setup(self) -> None:
        land = int(self.params["lsat"])
        if not 1 <= land <= 5:
            raise ValueError("lsat: lsat not in 1..5")
        path = int(self.params["path"])
        if not 1 <= path <= (251 if land <= 3 else 233):
            raise ValueError("lsat: path out of range")
        if land <= 3:
            self.lam0 = 128.87 * D2R - 2 * np.pi / 251.0 * path
            p22 = 103.2669323
            alf = 99.092 * D2R
        else:
            self.lam0 = 129.3 * D2R - 2 * np.pi / 233.0 * path
            p22 = 98.8841202
            alf = 98.2 * D2R
        self.rlm = np.pi * (1.0 / 248.0 + 0.5161290322580645)
        self.rlm2 = self.rlm + 2 * np.pi
        self._som_setup(alf, p22)


class Misrsom(SOMBase):
    """MISR Space Oblique Mercator (misrsom.cpp)."""

    proj_name = "misrsom"

    def setup(self) -> None:
        path = int(self.params["path"])
        if not 1 <= path <= 233:
            raise ValueError("misrsom: path out of range")
        self.lam0 = 129.3056 * D2R - 2 * np.pi / 233.0 * path
        self.rlm = 0.0
        self.rlm2 = self.rlm + 2 * np.pi
        self._som_setup(98.30382 * D2R, 98.88)


REGISTRY.update({c.proj_name: c for c in (ImwP, Lsat, Misrsom)})


class Bertin1953(_SphOp):
    """Bertin 1953 oblique world projection; no inverse
    (bertin1953.cpp, formula by Philippe Riviere)."""

    proj_name = "bertin1953"

    def _setup(self) -> None:
        self.phi0 = -42.0 * D2R
        self.lam0 = 0.0
        self.cdp = np.cos(self.phi0)
        self.sdp = np.sin(self.phi0)

    def _fwd(self, lam, phi):
        fu, k, w = 1.4, 12.0, 1.68
        lam = lam + (-16.5 * D2R)
        cosphi = np.cos(phi)
        x = np.cos(lam) * cosphi
        y = np.sin(lam) * cosphi
        z = np.sin(phi)
        z0 = z * self.cdp + x * self.sdp
        lam = np.arctan2(y, x * self.cdp - z * self.sdp)
        phi = np.arcsin(np.clip(z0, -1, 1))
        lam = mu.adjlon(lam)
        d = (lam - phi + 1.6) * (lam + phi + fu) / 8.0
        hit = lam + phi < -fu
        lam = np.where(hit, lam + d, lam)
        phi = np.where(hit, phi - 0.8 * d * np.sin(phi + np.pi / 2.0), phi)
        cosphi = np.cos(phi)
        d = np.sqrt(2.0 / (1.0 + cosphi * np.cos(lam / 2.0)))
        xo = w * d * cosphi * np.sin(lam / 2.0)
        yo = d * np.sin(phi)
        d = (1.0 - np.cos(lam * phi)) / k
        xo = np.where(yo < 0.0, xo * (1.0 + d), xo)
        yo = np.where(yo > 0.0, yo * (1.0 + d / 1.5 * xo * xo), yo)
        return xo, yo


def _geod2geoc(a, es, phi, lam, h):
    s = np.sin(phi)
    n = a / np.sqrt(1.0 - es * s * s)
    x = (n + h) * np.cos(phi) * np.cos(lam)
    y = (n + h) * np.cos(phi) * np.sin(lam)
    z = (n * (1.0 - es) + h) * s
    return x, y, z


def _geoc2geod(a, es, x, y, z):
    if es == 0.0:
        # sphere: exact closed form
        r = np.sqrt(x * x + y * y + z * z)
        phi = np.arcsin(np.clip(z / r, -1, 1))
        lam = np.arctan2(y, x)
        return phi, lam, r - a
    b = a * np.sqrt(1.0 - es)
    e2s = es / (1.0 - es)
    p = np.hypot(x, y)
    theta = np.arctan2(z * a, p * b)
    st, ct = np.sin(theta), np.cos(theta)
    phi = np.arctan2(z + e2s * b * st ** 3, p - es * a * ct ** 3)
    lam = np.arctan2(y, x)
    s = np.sin(phi)
    n = a / np.sqrt(1.0 - es * s * s)
    c = np.cos(phi)
    h = np.where(np.abs(c) < 1e-6, np.abs(z) - b, p / c - n)
    return phi, lam, h


class SCH(Operation):
    """Spherical Cross-track Height (sch.cpp; SAR ground coordinates).

    fwd3d: (lam, phi, h) radians/m -> (s, c, h) meters along/cross the
    peg-point heading on the local sphere of curvature."""

    proj_name = "sch"
    left = "radians"
    right = "cartesian"   # kernel emits meters; no extra a-scaling

    def setup(self) -> None:
        p = self.params
        for key in ("plat_0", "plon_0", "phdg_0"):
            if key not in p:
                raise ValueError(f"sch: missing +{key}")
        self.plat = float(p["plat_0"]) * D2R
        self.plon = float(p["plon_0"]) * D2R
        self.phdg = float(p["phdg_0"]) * D2R
        self.h0 = float(p.get("h_0", 0.0))
        clt, slt = np.cos(self.plat), np.sin(self.plat)
        clo, slo = np.cos(self.plon), np.sin(self.plon)
        temp = np.sqrt(1.0 - self.es * slt * slt)
        reast = self.a / temp
        rnorth = self.a * (1.0 - self.es) / temp ** 3
        chdg, shdg = np.cos(self.phdg), np.sin(self.phdg)
        self.rcurv = self.h0 + (reast * rnorth) / (
            reast * chdg * chdg + rnorth * shdg * shdg)
        self.M = np.array([
            [clt * clo, -shdg * slo - slt * clo * chdg,
             slo * chdg - slt * clo * shdg],
            [clt * slo, clo * shdg - slt * slo * chdg,
             -clo * chdg - slt * slo * shdg],
            [slt, clt * chdg, clt * shdg],
        ])
        px, py, pz = _geod2geoc(self.a, self.es,
                                np.float64(self.plat), np.float64(self.plon),
                                np.float64(self.h0))
        self.off = np.array([px - self.rcurv * clt * clo,
                             py - self.rcurv * clt * slo,
                             pz - self.rcurv * slt])

    def fwd3d(self, lam, phi, h):
        h = np.zeros_like(np.asarray(lam, dtype=np.float64)) if h is None \
            else np.asarray(h, dtype=np.float64)
        x, y, z = _geod2geoc(self.a, self.es, phi, lam, h)
        t = np.stack([x - self.off[0], y - self.off[1], z - self.off[2]])
        p = np.einsum("ji,j...->i...", self.M, t)   # M^T @ t
        lat_s, lon_s, h_s = _geoc2geod(self.rcurv, 0.0, p[0], p[1], p[2])
        return lon_s * self.rcurv, lat_s * self.rcurv, h_s

    def inv3d(self, s, c, h):
        lat_s = np.asarray(c, dtype=np.float64) / self.rcurv
        lon_s = np.asarray(s, dtype=np.float64) / self.rcurv
        x, y, z = _geod2geoc(self.rcurv, 0.0, lat_s, lon_s,
                             np.asarray(h, dtype=np.float64))
        t = np.stack([x, y, z])
        p = np.einsum("ij,j...->i...", self.M, t)   # M @ t
        p = p + self.off[:, None] if p.ndim > 1 else p + self.off
        phi, lam, hh = _geoc2geod(self.a, self.es, p[0], p[1], p[2])
        return lam, phi, hh

    # 2-D views for the uniform interface
    def _fwd(self, lam, phi):
        x, y, _ = self.fwd3d(lam, phi, None)
        return x / self.a, y / self.a  # classic a-units for base finalize

    def _inv(self, x, y):
        lam, phi, _ = self.inv3d(x * self.a, y * self.a,
                                 np.zeros_like(np.asarray(x)))
        return lam, phi


REGISTRY.update({"bertin1953": Bertin1953, "sch": SCH})
