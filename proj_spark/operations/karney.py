"""Karney geodesics, order-6 series, fully vectorized in NumPy.

Re-expresses the reference's embedded geodesic library (Karney's
algorithms; src/geodesic.c — geod_inverse :1166, geod_direct :777,
series coefficients :1609-1830) as batch NumPy: every scalar branch of
the C control flow becomes a boolean mask, the Newton solve for the
inverse problem runs on the shrinking set of unconverged rows, and the
bracketing/bisection fallback is carried per-row.  Algorithms follow
C. F. F. Karney, "Algorithms for geodesics", J. Geodesy 87, 43-55
(2013) — public domain mathematics.

API (all angles RADIANS; azimuths clockwise from north):
    Geodesic(a, f).inverse(lat1, lon1, lat2, lon2) -> (s12, azi1, azi2)
    Geodesic(a, f).direct (lat1, lon1, azi1, s12)  -> (lat2, lon2, azi2)

Accuracy: round-off limited (~15 nm on WGS84), matching the reference's
gie aeqd vectors at their 0.01-0.1 mm tolerances.
"""

from __future__ import annotations

import numpy as np

HALFPI = np.pi / 2
DBL_EPS = np.finfo(np.float64).eps
TINY = np.sqrt(np.finfo(np.float64).tiny)
TOL0 = DBL_EPS
TOL1 = 200 * TOL0
TOL2 = np.sqrt(TOL0)
TOLB = TOL0 * TOL2
XTHRESH = 1000 * TOL2
MAXIT1 = 20
MAXIT2 = MAXIT1 + 53 + 10

NA3, NC3 = 6, 6

_A3_COEFF = [(-3, 128), (-2, -3, 64), (-1, -3, -1, 16), (3, -1, -2, 8),
             (1, -1, 2), (1, 1)]
_C3_COEFF = [
    (3, 128), (2, 5, 128), (-1, 3, 3, 64), (-1, 0, 1, 8), (-1, 1, 4),
    (5, 256), (1, 3, 128), (-3, -2, 3, 64), (1, -3, 2, 32),
    (7, 512), (-10, 9, 384), (5, -9, 5, 192),
    (7, 512), (-14, 7, 512),
    (21, 2560),
]
_C1_COEFF = [(-1, 6, -16, 32), (-9, 64, -128, 2048), (9, -16, 768),
             (3, -5, 512), (-7, 1280), (-7, 2048)]
_C1P_COEFF = [(205, -432, 768, 1536), (4005, -4736, 3840, 12288),
              (-225, 116, 384), (-7173, 2695, 7680), (3467, 7680),
              (38081, 61440)]
_C2_COEFF = [(1, 2, 16, 32), (35, 64, 384, 2048), (15, 80, 768),
             (7, 35, 512), (63, 1280), (77, 2048)]
NC4 = 6
_C4_COEFF = [
    (97, 15015), (1088, 156, 45045), (-224, -4784, 1573, 45045),
    (-10656, 14144, -4576, -858, 45045),
    (64, 624, -4576, 6864, -3003, 15015),
    (100, 208, 572, 3432, -12012, 30030, 45045),
    (1, 9009), (-2944, 468, 135135), (5792, 1040, -1287, 135135),
    (5952, -11648, 9152, -2574, 135135),
    (-64, -624, 4576, -6864, 3003, 135135),
    (8, 10725), (1856, -936, 225225), (-8448, 4992, -1144, 225225),
    (-1440, 4160, -4576, 1716, 225225),
    (-136, 63063), (1024, -208, 105105), (3584, -3328, 1144, 315315),
    (-128, 135135), (-2560, 832, 405405),
    (128, 99099),
]


def _polyval(coeffs, x):
    y = np.zeros_like(x) + coeffs[0] if not np.isscalar(x) else coeffs[0]
    for c in coeffs[1:]:
        y = y * x + c
    return y


def _norm2(s, c):
    r = np.hypot(s, c)
    return s / r, c / r


def _adjlon(x):
    w = np.remainder(x + np.pi, 2 * np.pi) - np.pi
    return np.where(w == -np.pi, np.pi, w)


def _anground(x):
    """The reference's AngRound (geodesic.c): quantize angles smaller
    than 1/16 rad onto the 1/16-grid's representable neighbors, which
    snaps subnormal/denormal inputs to exactly 0 — required so the
    equatorial/meridional special-case detection (== 0 tests) fires for
    values that would otherwise underflow downstream."""
    z = 1.0 / 16.0
    y = np.abs(x)
    y = np.where(y < z, z - (z - y), y)
    return np.where(x < 0, -y, np.where(x == 0, x, y))


def _a1m1(eps):
    eps2 = eps * eps
    t = _polyval((1.0 / 256, 1.0 / 64, 1.0 / 4, 0.0), eps2)
    return (t + eps) / (1 - eps)


def _a2m1(eps):
    eps2 = eps * eps
    t = _polyval((-11.0 / 256, -28.0 / 256, -192.0 / 256, 0.0), eps2)
    return (t - eps) / (1 + eps)


def _even_coeffs(table, eps):
    """C1/C1p/C2-style coefficient arrays: c[l] for l=1..6 (index 0 unused)."""
    eps2 = eps * eps
    d = np.array(eps, copy=True)
    out = [None]
    for row in table:
        poly, denom = row[:-1], row[-1]
        out.append(d * _polyval([p / denom for p in poly], eps2))
        d = d * eps
    return out


def _sincos_series(sinp: bool, sinx, cosx, c):
    """Clenshaw sum of c[l]*sin(2l x) (sinp) or c[l]*cos((2l+1)x)."""
    n = len(c) - (1 if sinp else 0)
    k = n + (1 if sinp else 0)
    ar = 2 * (cosx - sinx) * (cosx + sinx)
    zero = np.zeros_like(np.asarray(sinx, dtype=np.float64))
    y0 = (c[k - 1] + zero) if (n & 1) else zero
    y1 = zero
    if n & 1:
        k -= 1
    m = n // 2
    for _ in range(m):
        y1 = ar * y0 - y1 + c[k - 1]
        y0 = ar * y1 - y0 + c[k - 2]
        k -= 2
    return 2 * sinx * cosx * y0 if sinp else cosx * (y0 - y1)


def _astroid(x, y):
    """Positive root k of k^4 + 2k^3 - (x^2+y^2-1)k^2 - 2y^2 k - y^2 = 0."""
    p = x * x
    q = y * y
    r = (p + q - 1) / 6
    easy = (q == 0) & (r <= 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        S = p * q / 4
        r2 = r * r
        r3 = r * r2
        disc = S * (S + 2 * r3)
        u = np.array(r, copy=True)
        pos = disc >= 0
        T3 = S + r3
        T3 = T3 + np.where(T3 < 0, -np.sqrt(np.abs(disc)),
                           np.sqrt(np.abs(disc)))
        T = np.cbrt(T3)
        u_pos = r + T + np.where(T != 0, r2 / np.where(T != 0, T, 1.0), 0.0)
        ang = np.arctan2(np.sqrt(np.abs(-disc)), -(S + r3))
        u_neg = r + 2 * r * np.cos(ang / 3)
        u = np.where(pos, u_pos, u_neg)
        v = np.sqrt(u * u + q)
        uv = np.where(u < 0, q / (v - u), u + v)
        w = (uv - q) / (2 * v)
        k = uv / (np.sqrt(uv + w * w) + w)
    return np.where(easy, 0.0, k)


class Geodesic:
    def __init__(self, a: float, f: float):
        if f < 0:
            raise NotImplementedError("prolate ellipsoids not supported")
        self.a = a
        self.f = f
        self.f1 = 1.0 - f
        self.e2 = f * (2.0 - f)
        self.ep2 = self.e2 / (self.f1 * self.f1)
        self.n = f / (2.0 - f)
        self.b = a * self.f1
        self.etol2 = 0.1 * TOL2 / np.sqrt(
            max(0.001, abs(f)) * min(1.0, 1.0 - f / 2) / 2)
        n = self.n
        self.A3x = []
        o = 0
        for j in range(NA3 - 1, -1, -1):
            row = _A3_COEFF[NA3 - 1 - j]
            poly, denom = row[:-1], row[-1]
            self.A3x.append(_polyval([p / denom for p in poly], n))
        self.C3x = []
        for row in _C3_COEFF:
            poly, denom = row[:-1], row[-1]
            self.C3x.append(_polyval([p / denom for p in poly], n))
        self.C4x = []
        for row in _C4_COEFF:
            poly, denom = row[:-1], row[-1]
            self.C4x.append(_polyval([p / denom for p in poly], n))
        if self.e2 > 0:
            self.c2 = (a * a + self.b * self.b
                       * np.arctanh(np.sqrt(self.e2)) / np.sqrt(self.e2)) / 2
        else:
            self.c2 = a * a

    # -- coefficient evaluation -------------------------------------------

    def _A3f(self, eps):
        return _polyval(self.A3x, eps)

    def _C3f(self, eps):
        out = [None]
        o = 0
        mult = np.array(eps, copy=True)
        for lvl in range(1, NC3):
            m = NC3 - lvl - 1
            out.append(mult * _polyval(self.C3x[o:o + m + 1], eps))
            o += m + 1
            mult = mult * eps
        return out

    def _C4f(self, eps):
        out = []
        o = 0
        mult = 1.0
        for lvl in range(NC4):
            m = NC4 - lvl - 1
            out.append(mult * _polyval(self.C4x[o:o + m + 1], eps))
            o += m + 1
            mult = mult * eps
        return out

    # -- Lengths (reduced-length / distance integrals) ---------------------

    def _lengths(self, eps, sig12, ssig1, csig1, dn1, ssig2, csig2, dn2,
                 cbet1, cbet2, want_m12=True):
        A1 = _a1m1(eps)
        Ca = _even_coeffs(_C1_COEFF, eps)
        A2 = _a2m1(eps)
        Cb = _even_coeffs(_C2_COEFF, eps)
        m0 = A1 - A2
        A2p = 1 + A2
        A1p = 1 + A1
        B1 = (_sincos_series(True, ssig2, csig2, Ca)
              - _sincos_series(True, ssig1, csig1, Ca))
        s12b = A1p * (sig12 + B1)
        B2 = (_sincos_series(True, ssig2, csig2, Cb)
              - _sincos_series(True, ssig1, csig1, Cb))
        J12 = m0 * sig12 + (A1p * B1 - A2p * B2)
        m12b = (dn2 * (csig1 * ssig2) - dn1 * (ssig1 * csig2)
                - csig1 * csig2 * J12)
        return s12b, m12b, m0

    # -- Lambda12 (the Newton residual) ------------------------------------

    def _lambda12(self, sbet1, cbet1, dn1, sbet2, cbet2, dn2, salp1, calp1,
                  slam120, clam120, diffp):
        calp1 = np.where((sbet1 == 0) & (calp1 == 0), -TINY, calp1)
        salp0 = salp1 * cbet1
        calp0 = np.hypot(calp1, salp1 * sbet1)
        ssig1 = sbet1
        somg1 = salp0 * sbet1
        csig1 = comg1 = calp1 * cbet1
        ssig1, csig1 = _norm2(ssig1, csig1)
        salp2 = np.where(cbet2 != cbet1, salp0 / cbet2, salp1)
        calp2_gen = np.sqrt(np.maximum(
            (calp1 * cbet1) ** 2
            + np.where(cbet1 < -sbet1,
                       (cbet2 - cbet1) * (cbet1 + cbet2),
                       (sbet1 - sbet2) * (sbet1 + sbet2)), 0.0)) / cbet2
        calp2 = np.where((cbet2 != cbet1) | (np.abs(sbet2) != -sbet1),
                         calp2_gen, np.abs(calp1))
        ssig2 = sbet2
        somg2 = salp0 * sbet2
        csig2 = comg2 = calp2 * cbet2
        ssig2, csig2 = _norm2(ssig2, csig2)
        # "+ 0.0" normalizes a -0.0 numerator to +0.0 (C fmax does this;
        # np.maximum keeps the negative zero, and atan2(-0, -x) = -pi
        # would flip the arc's sign)
        sig12 = np.arctan2(np.maximum(0.0, csig1 * ssig2 - ssig1 * csig2) + 0.0,
                           csig1 * csig2 + ssig1 * ssig2)
        somg12 = np.maximum(0.0, comg1 * somg2 - somg1 * comg2) + 0.0
        comg12 = comg1 * comg2 + somg1 * somg2
        eta = np.arctan2(somg12 * clam120 - comg12 * slam120,
                         comg12 * clam120 + somg12 * slam120)
        k2 = calp0 * calp0 * self.ep2
        eps = k2 / (2 * (1 + np.sqrt(1 + k2)) + k2)
        C3a = self._C3f(eps)
        B312 = (_sincos_series(True, ssig2, csig2, C3a)
                - _sincos_series(True, ssig1, csig1, C3a))
        domg12 = -self.f * self._A3f(eps) * salp0 * (sig12 + B312)
        lam12 = eta + domg12
        dlam12 = None
        if diffp:
            with np.errstate(invalid="ignore", divide="ignore"):
                _, m12b, _ = self._lengths(eps, sig12, ssig1, csig1, dn1,
                                           ssig2, csig2, dn2, cbet1, cbet2)
                dlam12 = m12b * self.f1 / (calp2 * cbet2)
                dlam12 = np.where(calp2 == 0,
                                  -2 * self.f1 * dn1 / sbet1, dlam12)
        return (lam12, salp2, calp2, sig12, ssig1, csig1, ssig2, csig2,
                eps, domg12, dlam12)

    # -- InverseStart -------------------------------------------------------

    def _inverse_start(self, sbet1, cbet1, dn1, sbet2, cbet2, dn2,
                       lam12, slam12, clam12):
        g = self
        sig12 = np.full_like(lam12, -1.0)
        sbet12 = sbet2 * cbet1 - cbet2 * sbet1
        cbet12 = cbet2 * cbet1 + sbet2 * sbet1
        sbet12a = sbet2 * cbet1 + cbet2 * sbet1
        shortline = (cbet12 >= 0) & (sbet12 < 0.5) & (cbet2 * lam12 < 0.5)
        sbetm2 = (sbet1 + sbet2) ** 2
        sbetm2 = sbetm2 / (sbetm2 + (cbet1 + cbet2) ** 2)
        dnm = np.sqrt(1 + g.ep2 * sbetm2)
        omg12 = lam12 / (g.f1 * dnm)
        somg12 = np.where(shortline, np.sin(omg12), slam12)
        comg12 = np.where(shortline, np.cos(omg12), clam12)

        salp1 = cbet2 * somg12
        with np.errstate(invalid="ignore", divide="ignore"):
            calp1 = np.where(
                comg12 >= 0,
                sbet12 + cbet2 * sbet1 * somg12 ** 2 / (1 + comg12),
                sbet12a - cbet2 * sbet1 * somg12 ** 2 / (1 - comg12))
        ssig12 = np.hypot(salp1, calp1)
        csig12 = sbet1 * sbet2 + cbet1 * cbet2 * comg12

        really_short = shortline & (ssig12 < g.etol2)
        salp2 = cbet1 * somg12
        with np.errstate(invalid="ignore", divide="ignore"):
            calp2 = sbet12 - cbet1 * sbet2 * np.where(
                comg12 >= 0, somg12 ** 2 / (1 + comg12), 1 - comg12)
        salp2, calp2 = _norm2(np.where(really_short, salp2, 1.0),
                              np.where(really_short, calp2, 0.0))
        sig12 = np.where(really_short, np.arctan2(ssig12, csig12), sig12)

        astro = (~really_short & ~(abs(g.n) > 0.1) & (csig12 < 0)
                 & (ssig12 < 6 * abs(g.n) * np.pi * cbet1 ** 2))
        if np.any(astro):
            lam12x = np.arctan2(-slam12, -clam12)
            k2 = sbet1 ** 2 * g.ep2
            eps = k2 / (2 * (1 + np.sqrt(1 + k2)) + k2)
            lamscale = g.f * cbet1 * self._A3f(eps) * np.pi
            betscale = lamscale * cbet1
            with np.errstate(invalid="ignore", divide="ignore"):
                x = lam12x / lamscale
                y = sbet12a / betscale
                strip = (y > -TOL1) & (x > -1 - XTHRESH)
                salp1_s = np.minimum(1.0, -x)
                calp1_s = -np.sqrt(np.maximum(0.0, 1 - salp1_s ** 2))
                k = _astroid(x, y)
                omg12a = lamscale * (-x * k / (1 + k))
                somg12a = np.sin(omg12a)
                comg12a = -np.cos(omg12a)
                salp1_a = cbet2 * somg12a
                calp1_a = sbet12a - cbet2 * sbet1 * somg12a ** 2 / (1 - comg12a)
            salp1 = np.where(astro, np.where(strip, salp1_s, salp1_a), salp1)
            calp1 = np.where(astro, np.where(strip, calp1_s, calp1_a), calp1)

        bad = ~(salp1 > 0)
        salp1 = np.where(bad, 1.0, salp1)
        calp1 = np.where(bad, 0.0, calp1)
        salp1, calp1 = _norm2(salp1, calp1)
        return sig12, salp1, calp1, salp2, calp2, dnm

    # -- inverse ------------------------------------------------------------

    def inverse(self, lat1, lon1, lat2, lon2, want_area: bool = False):
        """(rad, rad, rad, rad) -> (s12 m, azi1 rad, azi2 rad[, S12 m^2]).

        S12 is the signed area between the geodesic and the equator
        (geod_geninverse's GEOD_AREA output), used by polygon_area."""
        g = self
        lat1 = np.asarray(lat1, dtype=np.float64)
        lon1 = np.asarray(lon1, dtype=np.float64)
        lat2 = np.asarray(lat2, dtype=np.float64)
        lon2 = np.asarray(lon2, dtype=np.float64)
        shape = np.broadcast(lat1, lon1, lat2, lon2).shape
        lat1, lon1, lat2, lon2 = np.broadcast_arrays(lat1, lon1, lat2, lon2)
        lat1 = _anground(lat1.astype(np.float64).ravel())
        lat2 = _anground(lat2.astype(np.float64).ravel())
        lon12 = _anground(_adjlon(lon2 - lon1).ravel())

        lonsign = np.where(lon12 >= 0, 1.0, -1.0)
        lam12 = lon12 * lonsign
        # snap exactly-antipodal / exactly-meridional longitudes
        slam12 = np.sin(lam12)
        slam12 = np.where(np.pi - lam12 < 1e-14, 0.0, slam12)
        clam12 = np.where(np.pi - lam12 < 1e-14, -1.0, np.cos(lam12))
        swapp = np.where(np.abs(lat1) < np.abs(lat2), -1.0, 1.0)
        sw = swapp < 0
        lat1_, lat2_ = lat1.copy(), lat2.copy()
        lat1 = np.where(sw, lat2_, lat1_)
        lat2 = np.where(sw, lat1_, lat2_)
        lonsign = np.where(sw, -lonsign, lonsign)
        latsign = np.where(lat1 < 0, 1.0, -1.0)
        lat1 = lat1 * latsign
        lat2 = lat2 * latsign

        sbet1 = g.f1 * np.sin(lat1)
        cbet1 = np.cos(lat1)
        sbet1, cbet1 = _norm2(sbet1, cbet1)
        cbet1 = np.maximum(TINY, cbet1)
        sbet2 = g.f1 * np.sin(lat2)
        cbet2 = np.cos(lat2)
        sbet2, cbet2 = _norm2(sbet2, cbet2)
        cbet2 = np.maximum(TINY, cbet2)
        # enforce symmetry when |bet2| == -bet1
        c1 = cbet1 < -sbet1
        sbet2 = np.where(c1 & (cbet2 == cbet1),
                         np.where(sbet2 < 0, sbet1, -sbet1), sbet2)
        cbet2 = np.where(~c1 & (np.abs(sbet2) == -sbet1), cbet1, cbet2)
        dn1 = np.sqrt(1 + g.ep2 * sbet1 ** 2)
        dn2 = np.sqrt(1 + g.ep2 * sbet2 ** 2)

        n = lat1.size
        s12 = np.zeros(n)
        salp1 = np.zeros(n)
        calp1 = np.zeros(n)
        salp2 = np.zeros(n)
        calp2 = np.zeros(n)

        meridian = (lat1 <= -HALFPI + 1e-15) | (slam12 == 0)
        # --- meridian branch
        if np.any(meridian):
            mcalp1, msalp1 = clam12, slam12
            mcalp2 = np.ones(n)
            msalp2 = np.zeros(n)
            ssig1 = sbet1
            csig1 = mcalp1 * cbet1
            ssig2 = sbet2
            csig2 = mcalp2 * cbet2
            msig12 = np.arctan2(
                np.maximum(0.0, csig1 * ssig2 - ssig1 * csig2) + 0.0,
                csig1 * csig2 + ssig1 * ssig2)
            s12b, m12b, _ = self._lengths(
                np.full(n, g.n), msig12, ssig1, csig1, dn1,
                ssig2, csig2, dn2, cbet1, cbet2)
            ok_m = (msig12 < 1) | (m12b >= 0)
            tiny_m = msig12 < 3 * TINY
            msig12 = np.where(tiny_m, 0.0, msig12)
            ms12x = np.where(tiny_m, 0.0, s12b) * g.b
            use_m = meridian & ok_m
            s12 = np.where(use_m, ms12x, s12)
            salp1 = np.where(use_m, msalp1, salp1)
            calp1 = np.where(use_m, mcalp1, calp1)
            salp2 = np.where(use_m, msalp2, salp2)
            calp2 = np.where(use_m, mcalp2, calp2)
            meridian = use_m

        # --- equatorial branch
        lon12s = np.pi - lam12
        equato = (~meridian & (sbet1 == 0)
                  & ((g.f <= 0) | (lon12s >= g.f * np.pi)))
        if np.any(equato):
            s12 = np.where(equato, g.a * lam12, s12)
            salp1 = np.where(equato, 1.0, salp1)
            calp1 = np.where(equato, 0.0, calp1)
            salp2 = np.where(equato, 1.0, salp2)
            calp2 = np.where(equato, 0.0, calp2)

        # --- general branch (Newton)
        somg12 = np.zeros(n)
        comg12 = np.ones(n)
        if np.any(equato):
            omg12e = lam12 / g.f1
            somg12 = np.where(equato, np.sin(omg12e), somg12)
            comg12 = np.where(equato, np.cos(omg12e), comg12)
        general = ~meridian & ~equato
        if np.any(general):
            idx = np.nonzero(general)[0]
            res = self._inverse_general(
                sbet1[idx], cbet1[idx], dn1[idx], sbet2[idx], cbet2[idx],
                dn2[idx], lam12[idx], slam12[idx], clam12[idx])
            (s12[idx], salp1[idx], calp1[idx], salp2[idx], calp2[idx],
             somg12[idx], comg12[idx]) = res

        if want_area:
            S12 = self._area_S12(sbet1, cbet1, sbet2, cbet2, salp1, calp1,
                                 salp2, calp2, somg12, comg12, meridian)
            S12 = S12 * swapp * lonsign * latsign

        # undo canonicalization
        sw = swapp < 0
        s1, c1_ = salp1.copy(), calp1.copy()
        s2, c2_ = salp2.copy(), calp2.copy()
        salp1 = np.where(sw, s2, s1)
        salp2 = np.where(sw, s1, s2)
        calp1 = np.where(sw, c2_, c1_)
        calp2 = np.where(sw, c1_, c2_)
        salp1 = salp1 * swapp * lonsign
        calp1 = calp1 * swapp * latsign
        salp2 = salp2 * swapp * lonsign
        calp2 = calp2 * swapp * latsign
        azi1 = np.arctan2(salp1, calp1)
        azi2 = np.arctan2(salp2, calp2)
        if want_area:
            return (s12.reshape(shape), azi1.reshape(shape),
                    azi2.reshape(shape), S12.reshape(shape))
        return s12.reshape(shape), azi1.reshape(shape), azi2.reshape(shape)

    def _area_S12(self, sbet1, cbet1, sbet2, cbet2, salp1, calp1,
                  salp2, calp2, somg12, comg12, meridian):
        """Signed geodesic-to-equator area (geod_geninverse_int AREA
        block, canonical coordinates)."""
        g = self
        salp0 = salp1 * cbet1
        calp0 = np.hypot(calp1, salp1 * sbet1)
        nondeg = (calp0 != 0.0) & (salp0 != 0.0)
        ssig1 = sbet1
        csig1 = calp1 * cbet1
        ssig2 = sbet2
        csig2 = calp2 * cbet2
        ssig1, csig1 = _norm2(np.where(nondeg, ssig1, 0.0),
                              np.where(nondeg, csig1, 1.0))
        ssig2, csig2 = _norm2(np.where(nondeg, ssig2, 0.0),
                              np.where(nondeg, csig2, 1.0))
        k2 = calp0 * calp0 * g.ep2
        eps = k2 / (2 * (1 + np.sqrt(1 + k2)) + k2)
        A4 = g.a * g.a * calp0 * salp0 * g.e2
        C4a = self._C4f(eps)
        B41 = _sincos_series(False, ssig1, csig1, C4a)
        B42 = _sincos_series(False, ssig2, csig2, C4a)
        S12 = np.where(nondeg, A4 * (B42 - B41), 0.0)
        # the spherical-excess term alp12
        easy = (~meridian & (comg12 > -0.7071) & (sbet2 - sbet1 < 1.75))
        with np.errstate(invalid="ignore", divide="ignore"):
            domg12 = 1 + comg12
            dbet1 = 1 + cbet1
            dbet2 = 1 + cbet2
            alp12_easy = 2 * np.arctan2(
                somg12 * (sbet1 * dbet2 + sbet2 * dbet1),
                domg12 * (sbet1 * sbet2 + dbet1 * dbet2))
        salp12 = salp2 * calp1 - calp2 * salp1
        calp12 = calp2 * calp1 + salp2 * salp1
        deg = (salp12 == 0.0) & (calp12 < 0.0)
        salp12 = np.where(deg, TINY * calp1, salp12)
        calp12 = np.where(deg, -1.0, calp12)
        alp12 = np.where(easy, alp12_easy, np.arctan2(salp12, calp12))
        return S12 + g.c2 * alp12

    @staticmethod
    def _transit(lon1, lon2):
        """+-1 when the edge crosses the prime meridian (transit())."""
        lon1 = _adjlon(lon1)
        lon2 = _adjlon(lon2)
        lon12 = _adjlon(lon2 - lon1)
        return np.where((lon1 <= 0) & (lon2 > 0) & (lon12 > 0), 1,
                        np.where((lon2 <= 0) & (lon1 > 0) & (lon12 < 0),
                                 -1, 0))

    def polygon_area(self, lats, lons):
        """(perimeter m, area m^2) of a polygon given vertex arrays in
        radians (unclosed; counter-clockwise positive), per the
        reference's geod_polygonarea accumulation + areareduceA."""
        lats = np.asarray(lats, dtype=np.float64).ravel()
        lons = np.asarray(lons, dtype=np.float64).ravel()
        lat2 = np.roll(lats, -1)
        lon2 = np.roll(lons, -1)
        s12, _, _, S12 = self.inverse(lats, lons, lat2, lon2, want_area=True)
        import math

        perimeter = float(np.sum(s12))
        area = float(np.sum(S12))
        crossings = int(np.sum(self._transit(lons, lon2)))
        area0 = 4 * np.pi * self.c2
        # areareduceA: IEEE remainder, pole-crossing half-sphere fixup,
        # clockwise -> counter-clockwise, reduce into (-area0/2, area0/2]
        area = math.remainder(area, area0)
        if crossings % 2:
            area += (1.0 if area < 0 else -1.0) * area0 / 2
        area = -area
        if area > area0 / 2:
            area -= area0
        elif area <= -area0 / 2:
            area += area0
        return perimeter, area

    def _eps_meridian(self):
        k2 = self.ep2  # calp0 = 1 on a meridian
        return k2 / (2 * (1 + np.sqrt(1 + k2)) + k2)

    def _inverse_general(self, sbet1, cbet1, dn1, sbet2, cbet2, dn2,
                         lam12, slam12, clam12):
        g = self
        n = sbet1.size
        sig12, salp1, calp1, salp2_s, calp2_s, dnm = self._inverse_start(
            sbet1, cbet1, dn1, sbet2, cbet2, dn2, lam12, slam12, clam12)
        short = sig12 >= 0
        s12 = np.zeros(n)
        salp2 = np.zeros(n)
        calp2 = np.zeros(n)
        omg12 = lam12 / (g.f1 * dnm)
        somg12 = np.where(short, np.sin(omg12), 0.0)
        comg12 = np.where(short, np.cos(omg12), 1.0)
        if np.any(short):
            s12 = np.where(short, sig12 * g.b * dnm, s12)
            salp2 = np.where(short, salp2_s, salp2)
            calp2 = np.where(short, calp2_s, calp2)

        newt = ~short
        if np.any(newt):
            j = np.nonzero(newt)[0]
            (ns12, nsalp1, ncalp1, nsalp2, ncalp2, ndomg12) = self._newton(
                sbet1[j], cbet1[j], dn1[j], sbet2[j], cbet2[j], dn2[j],
                lam12[j], slam12[j], clam12[j], salp1[j], calp1[j])
            s12[j] = ns12
            salp1[j] = nsalp1
            calp1[j] = ncalp1
            salp2[j] = nsalp2
            calp2[j] = ncalp2
            # omg12 = lam12 - domg12
            sd, cd = np.sin(ndomg12), np.cos(ndomg12)
            somg12[j] = slam12[j] * cd - clam12[j] * sd
            comg12[j] = clam12[j] * cd + slam12[j] * sd
        return s12, salp1, calp1, salp2, calp2, somg12, comg12

    def _newton(self, sbet1, cbet1, dn1, sbet2, cbet2, dn2,
                lam12, slam12, clam12, salp1, calp1):
        g = self
        n = sbet1.size
        salp1a = np.full(n, TINY)
        calp1a = np.ones(n)
        salp1b = np.full(n, TINY)
        calp1b = np.full(n, -1.0)
        tripn = np.zeros(n, dtype=bool)
        tripb = np.zeros(n, dtype=bool)
        done = np.zeros(n, dtype=bool)
        # frozen state at convergence
        F = {k: np.zeros(n) for k in
             ("sig12", "ssig1", "csig1", "ssig2", "csig2", "eps",
              "salp2", "calp2", "domg12")}
        for it in range(MAXIT2):
            act = np.nonzero(~done)[0]
            if act.size == 0:
                break
            diffp = it < MAXIT1
            (v, a_salp2, a_calp2, a_sig12, a_ssig1, a_csig1, a_ssig2,
             a_csig2, a_eps, a_domg, dv) = self._lambda12(
                sbet1[act], cbet1[act], dn1[act], sbet2[act], cbet2[act],
                dn2[act], salp1[act], calp1[act], slam12[act], clam12[act],
                diffp)
            for key, val in (("sig12", a_sig12), ("ssig1", a_ssig1),
                             ("csig1", a_csig1), ("ssig2", a_ssig2),
                             ("csig2", a_csig2), ("eps", a_eps),
                             ("salp2", a_salp2), ("calp2", a_calp2),
                             ("domg12", a_domg)):
                F[key][act] = val
            brk = tripb[act] | ~(np.abs(v) >= np.where(tripn[act], 8, 1) * TOL0)
            done[act[brk]] = True
            live = act[~brk]
            if live.size == 0:
                continue
            vl = v[~brk]
            with np.errstate(invalid="ignore", divide="ignore"):
                upd_b = (vl > 0) & ((it > MAXIT1)
                                    | (calp1[live] / salp1[live]
                                       > calp1b[live] / salp1b[live]))
                upd_a = (vl < 0) & ((it > MAXIT1)
                                    | (calp1[live] / salp1[live]
                                       < calp1a[live] / salp1a[live]))
            salp1b[live] = np.where(upd_b, salp1[live], salp1b[live])
            calp1b[live] = np.where(upd_b, calp1[live], calp1b[live])
            salp1a[live] = np.where(upd_a, salp1[live], salp1a[live])
            calp1a[live] = np.where(upd_a, calp1[live], calp1a[live])
            if diffp:
                dvl = dv[~brk]
                with np.errstate(invalid="ignore", divide="ignore"):
                    dalp1 = -vl / dvl
                sd, cd = np.sin(dalp1), np.cos(dalp1)
                nsalp1 = salp1[live] * cd + calp1[live] * sd
                newton_ok = (dvl > 0) & (nsalp1 > 0) & (np.abs(dalp1) < np.pi)
            else:
                newton_ok = np.zeros(live.size, dtype=bool)
                sd = cd = nsalp1 = np.zeros(live.size)
            ncalp1 = calp1[live] * cd - salp1[live] * sd
            ns, nc = _norm2(np.where(newton_ok, nsalp1, 1.0),
                            np.where(newton_ok, ncalp1, 0.0))
            # bisection fallback values
            bs, bc = _norm2((salp1a[live] + salp1b[live]) / 2,
                            (calp1a[live] + calp1b[live]) / 2)
            salp1[live] = np.where(newton_ok, ns, bs)
            calp1[live] = np.where(newton_ok, nc, bc)
            tripn[live] = np.where(newton_ok, np.abs(vl) <= 16 * TOL0, False)
            tripb[live] = np.where(
                newton_ok, tripb[live],
                (np.abs(salp1a[live] - salp1[live])
                 + (calp1a[live] - calp1[live]) < TOLB)
                | (np.abs(salp1[live] - salp1b[live])
                   + (calp1[live] - calp1b[live]) < TOLB))
        s12b, _, _ = self._lengths(F["eps"], F["sig12"], F["ssig1"],
                                   F["csig1"], dn1, F["ssig2"], F["csig2"],
                                   dn2, cbet1, cbet2)
        return s12b * g.b, salp1, calp1, F["salp2"], F["calp2"], F["domg12"]

    # -- direct -------------------------------------------------------------

    def direct(self, lat1, lon1, azi1, s12):
        """(rad, rad, rad, m) -> (lat2 rad, lon2 rad, azi2 rad)."""
        g = self
        lat1 = np.asarray(lat1, dtype=np.float64)
        lon1 = np.asarray(lon1, dtype=np.float64)
        azi1 = np.asarray(azi1, dtype=np.float64)
        s12 = np.asarray(s12, dtype=np.float64)
        shape = np.broadcast(lat1, lon1, azi1, s12).shape
        lat1, lon1, azi1, s12 = [x.astype(np.float64).ravel()
                                 for x in np.broadcast_arrays(
                                     lat1, lon1, azi1, s12)]
        salp1, calp1 = np.sin(azi1), np.cos(azi1)
        sbet1 = g.f1 * np.sin(lat1)
        cbet1 = np.cos(lat1)
        sbet1, cbet1 = _norm2(sbet1, cbet1)
        cbet1 = np.maximum(TINY, cbet1)
        dn1 = np.sqrt(1 + g.ep2 * sbet1 ** 2)
        salp0 = salp1 * cbet1
        calp0 = np.hypot(calp1, salp1 * sbet1)
        ssig1 = sbet1
        somg1 = salp0 * sbet1
        csig1 = comg1 = np.where((sbet1 != 0) | (calp1 != 0),
                                 cbet1 * calp1, 1.0)
        ssig1, csig1 = _norm2(ssig1, csig1)
        k2 = calp0 ** 2 * g.ep2
        eps = k2 / (2 * (1 + np.sqrt(1 + k2)) + k2)
        A1m1 = _a1m1(eps)
        C1a = _even_coeffs(_C1_COEFF, eps)
        B11 = _sincos_series(True, ssig1, csig1, C1a)
        s, c = np.sin(B11), np.cos(B11)
        stau1 = ssig1 * c + csig1 * s
        ctau1 = csig1 * c - ssig1 * s
        C1pa = _even_coeffs(_C1P_COEFF, eps)
        C3a = self._C3f(eps)
        A3c = -g.f * salp0 * self._A3f(eps)
        B31 = _sincos_series(True, ssig1, csig1, C3a)

        tau12 = s12 / (g.b * (1 + A1m1))
        st, ct = np.sin(tau12), np.cos(tau12)
        B12 = -_sincos_series(True, stau1 * ct + ctau1 * st,
                              ctau1 * ct - stau1 * st, C1pa)
        sig12 = tau12 - (B12 - B11)
        ssig12, csig12 = np.sin(sig12), np.cos(sig12)
        if abs(g.f) > 0.01:
            ssig2 = ssig1 * csig12 + csig1 * ssig12
            csig2 = csig1 * csig12 - ssig1 * ssig12
            B12n = _sincos_series(True, ssig2, csig2, C1a)
            serr = (1 + A1m1) * (sig12 + (B12n - B11)) - s12 / g.b
            sig12 = sig12 - serr / np.sqrt(1 + k2 * ssig2 ** 2)
            ssig12, csig12 = np.sin(sig12), np.cos(sig12)
        ssig2 = ssig1 * csig12 + csig1 * ssig12
        csig2 = csig1 * csig12 - ssig1 * ssig12
        sbet2 = calp0 * ssig2
        cbet2 = np.hypot(salp0, calp0 * csig2)
        deg = cbet2 == 0
        cbet2 = np.where(deg, TINY, cbet2)
        csig2 = np.where(deg, TINY, csig2)
        salp2 = salp0
        calp2 = calp0 * csig2
        somg2 = salp0 * ssig2
        comg2 = csig2
        omg12 = np.arctan2(somg2 * comg1 - comg2 * somg1,
                           comg2 * comg1 + somg2 * somg1)
        lam12 = omg12 + A3c * (
            sig12 + (_sincos_series(True, ssig2, csig2, C3a) - B31))
        lat2 = np.arctan2(sbet2, g.f1 * cbet2)
        lon2 = _adjlon(lon1 + lam12)
        azi2 = np.arctan2(salp2, calp2)
        return lat2.reshape(shape), lon2.reshape(shape), azi2.reshape(shape)
