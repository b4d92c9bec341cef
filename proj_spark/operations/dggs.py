"""DGGS-ancestor + composite projections: qsc (S2's cube geometry),
healpix/rhealpix (equal-area DGGS base), igh (interrupted Goode),
chamb (three-point trimetric).

NumPy batch re-expressions of src/projections/{qsc,healpix,igh,
chamb}.cpp; every per-region branch of the C code becomes a boolean
mask.  These kernels directly inform the engine's cell encoder
(SURVEY.md section 2.A.4, DGGS-relevant operators).
"""

from __future__ import annotations

import numpy as np

from proj_spark import mathutils as mu
from proj_spark.operations.base import Operation
from proj_spark.operations.pseudocyl import _SphOp, aasin

NAN = np.float64(np.nan)
FORTPI = np.pi / 4
HALFPI = np.pi / 2
D2R = np.pi / 180.0


class QSC(Operation):
    """Quadrilateralized Spherical Cube (qsc.cpp; [LK12])."""

    proj_name = "qsc"
    FRONT, RIGHT, BACK, LEFT, TOP, BOTTOM = range(6)

    def setup(self) -> None:
        if self.phi0 >= HALFPI - FORTPI / 2.0:
            self.face = self.TOP
        elif self.phi0 <= -(HALFPI - FORTPI / 2.0):
            self.face = self.BOTTOM
        elif abs(self.lam0) <= FORTPI:
            self.face = self.FRONT
        elif abs(self.lam0) <= HALFPI + FORTPI:
            self.face = self.RIGHT if self.lam0 > 0.0 else self.LEFT
        else:
            self.face = self.BACK
        if self.es != 0.0:
            self.b = self.a * np.sqrt(1.0 - self.es)
            self.one_minus_f = 1.0 - (self.a - self.b) / self.a
            self.one_minus_f_squared = self.one_minus_f ** 2

    @staticmethod
    def _shift_lon(lon, offset):
        slon = lon + offset
        slon = np.where(slon < -np.pi, slon + 2 * np.pi, slon)
        slon = np.where(slon > np.pi, slon - 2 * np.pi, slon)
        return slon

    def _fwd(self, lam, phi):
        if self.es != 0.0:
            lat = np.arctan(self.one_minus_f_squared * np.tan(phi))
        else:
            lat = phi
        lon = lam
        if self.face == self.TOP:
            pphi = HALFPI - lat
            a0 = (lon >= FORTPI) & (lon <= HALFPI + FORTPI)
            a1 = (lon > HALFPI + FORTPI) | (lon <= -(HALFPI + FORTPI))
            a2 = (lon > -(HALFPI + FORTPI)) & (lon <= -FORTPI)
            theta = np.where(a0, lon - HALFPI,
                             np.where(a1, np.where(lon > 0.0, lon - np.pi,
                                                   lon + np.pi),
                                      np.where(a2, lon + HALFPI, lon)))
            area = np.where(a0, 0, np.where(a1, 1, np.where(a2, 2, 3)))
        elif self.face == self.BOTTOM:
            pphi = HALFPI + lat
            a0 = (lon >= FORTPI) & (lon <= HALFPI + FORTPI)
            a1 = (lon < FORTPI) & (lon >= -FORTPI)
            a2 = (lon < -FORTPI) & (lon >= -(HALFPI + FORTPI))
            theta = np.where(a0, -lon + HALFPI,
                             np.where(a1, -lon,
                                      np.where(a2, -lon - HALFPI,
                                               np.where(lon > 0.0,
                                                        -lon + np.pi,
                                                        -lon - np.pi))))
            area = np.where(a0, 0, np.where(a1, 1, np.where(a2, 2, 3)))
        else:
            if self.face == self.RIGHT:
                lon = self._shift_lon(lon, +HALFPI)
            elif self.face == self.BACK:
                lon = self._shift_lon(lon, +np.pi)
            elif self.face == self.LEFT:
                lon = self._shift_lon(lon, -HALFPI)
            sinlat = np.sin(lat)
            coslat = np.cos(lat)
            sinlon = np.sin(lon)
            coslon = np.cos(lon)
            q = coslat * coslon
            r = coslat * sinlon
            s = sinlat
            if self.face == self.FRONT:
                pphi = np.arccos(np.clip(q, -1, 1))
                yy, xx = s, r
            elif self.face == self.RIGHT:
                pphi = np.arccos(np.clip(r, -1, 1))
                yy, xx = s, -q
            elif self.face == self.BACK:
                pphi = np.arccos(np.clip(-q, -1, 1))
                yy, xx = s, -r
            else:
                pphi = np.arccos(np.clip(-r, -1, 1))
                yy, xx = s, q
            theta = np.arctan2(yy, xx)
            a1 = (theta > FORTPI) & (theta <= HALFPI + FORTPI)
            a2 = (theta > HALFPI + FORTPI) | (theta <= -(HALFPI + FORTPI))
            a3 = ~a1 & ~a2 & (np.abs(theta) > FORTPI)
            area = np.where(a1, 1, np.where(a2, 2, np.where(a3, 3, 0)))
            theta = np.where(a1, theta - HALFPI, theta)
            theta = np.where(a2, np.where(theta >= 0.0, theta - np.pi,
                                          theta + np.pi), theta)
            theta = np.where(a3, theta + HALFPI, theta)
            small = pphi < 1e-10
            theta = np.where(small, 0.0, theta)
            area = np.where(small, 0, area)
        with np.errstate(invalid="ignore", divide="ignore"):
            mu_ = np.arctan((12.0 / np.pi) * (
                theta + np.arccos(np.clip(np.sin(theta) * np.cos(FORTPI),
                                          -1, 1)) - HALFPI))
            t = np.sqrt(np.maximum(
                (1.0 - np.cos(pphi))
                / (np.cos(mu_) ** 2)
                / (1.0 - np.cos(np.arctan(1.0 / np.cos(theta)))), 0.0))
        mu_ = mu_ + np.where(area == 1, HALFPI,
                             np.where(area == 2, np.pi,
                                      np.where(area == 3, 1.5 * np.pi, 0.0)))
        return t * np.cos(mu_), t * np.sin(mu_)

    def _inv(self, x, y):
        nu = np.arctan(np.hypot(x, y))
        mu_ = np.arctan2(y, x)
        a0 = (x >= 0.0) & (x >= np.abs(y))
        a1 = ~a0 & (y >= 0.0) & (y >= np.abs(x))
        a2 = ~a0 & ~a1 & (x < 0.0) & (-x >= np.abs(y))
        area = np.where(a0, 0, np.where(a1, 1, np.where(a2, 2, 3)))
        mu_ = np.where(a1, mu_ - HALFPI, mu_)
        mu_ = np.where(a2, np.where(mu_ < 0.0, mu_ + np.pi, mu_ - np.pi), mu_)
        mu_ = np.where(area == 3, mu_ + HALFPI, mu_)
        with np.errstate(invalid="ignore", divide="ignore"):
            t = (np.pi / 12.0) * np.tan(mu_)
            tantheta = np.sin(t) / (np.cos(t) - 1.0 / np.sqrt(2.0))
            theta = np.arctan(tantheta)
            cosmu = np.cos(mu_)
            tannu = np.tan(nu)
            cosphi = 1.0 - cosmu * cosmu * tannu * tannu * (
                1.0 - np.cos(np.arctan(1.0 / np.cos(theta))))
        cosphi = np.clip(cosphi, -1.0, 1.0)
        if self.face in (self.TOP, self.BOTTOM):
            pphi = np.arccos(cosphi)
            if self.face == self.TOP:
                phi = HALFPI - pphi
                lam = np.where(area == 0, theta + HALFPI,
                               np.where(area == 1,
                                        np.where(theta < 0.0, theta + np.pi,
                                                 theta - np.pi),
                                        np.where(area == 2, theta - HALFPI,
                                                 theta)))
            else:
                phi = pphi - HALFPI
                lam = np.where(area == 0, -theta + HALFPI,
                               np.where(area == 1, -theta,
                                        np.where(area == 2, -theta - HALFPI,
                                                 np.where(theta < 0.0,
                                                          -theta - np.pi,
                                                          -theta + np.pi))))
        else:
            q = cosphi
            t = q * q
            s = np.where(t >= 1.0, 0.0,
                         np.sqrt(np.maximum(1.0 - t, 0.0)) * np.sin(theta))
            t = t + s * s
            r = np.where(t >= 1.0, 0.0, np.sqrt(np.maximum(1.0 - t, 0.0)))
            # rotate into area
            r1 = np.where(area == 1, -s, np.where(area == 2, -r,
                                                  np.where(area == 3, s, r)))
            s1 = np.where(area == 1, r, np.where(area == 2, -s,
                                                 np.where(area == 3, -r, s)))
            r, s = r1, s1
            # rotate into the cube face
            if self.face == self.RIGHT:
                q, r = -r, q
            elif self.face == self.BACK:
                q, r = -q, -r
            elif self.face == self.LEFT:
                q, r = r, -q
            phi = np.arccos(np.clip(-s, -1, 1)) - HALFPI
            lam = np.arctan2(r, q)
            if self.face == self.RIGHT:
                lam = self._shift_lon(lam, -HALFPI)
            elif self.face == self.BACK:
                lam = self._shift_lon(lam, -np.pi)
            elif self.face == self.LEFT:
                lam = self._shift_lon(lam, +HALFPI)
        if self.es != 0.0:
            neg = phi < 0.0
            tanphi = np.tan(phi)
            xa = self.b / np.sqrt(tanphi * tanphi + self.one_minus_f_squared)
            phi = np.arctan(np.sqrt(np.maximum(
                self.a * self.a - xa * xa, 0.0)) / (self.one_minus_f * xa))
            phi = np.where(neg, -phi, phi)
        return lam, phi


def _healpix_sphere_fwd(lam, phi):
    phi0 = np.arcsin(2.0 / 3.0)
    eq = np.abs(phi) <= phi0
    x_eq = lam
    y_eq = 3 * np.pi / 8 * np.sin(phi)
    sigma = np.sqrt(np.maximum(3 * (1 - np.abs(np.sin(phi))), 0.0))
    cn = np.minimum(np.floor(2 * lam / np.pi + 2), 3.0)
    lamc = -3 * FORTPI + HALFPI * cn
    x_po = lamc + (lam - lamc) * sigma
    y_po = np.sign(phi) * FORTPI * (2 - sigma)
    return np.where(eq, x_eq, x_po), np.where(eq, y_eq, y_po)


def _healpix_sphere_inv(x, y):
    eq = np.abs(y) <= FORTPI
    polar = (~eq) & (np.abs(y) < HALFPI)
    with np.errstate(invalid="ignore", divide="ignore"):
        lam_eq = x
        phi_eq = np.arcsin(np.clip(8 * y / (3 * np.pi), -1, 1))
        cn = np.minimum(np.floor(2 * x / np.pi + 2), 3.0)
        xc = -3 * FORTPI + HALFPI * cn
        tau = 2.0 - 4 * np.abs(y) / np.pi
        lam_po = xc + (x - xc) / np.where(tau == 0.0, 1.0, tau)
        phi_po = np.sign(y) * np.arcsin(np.clip(1.0 - tau ** 2 / 3.0, -1, 1))
    lam = np.where(eq, lam_eq, np.where(polar, lam_po, -np.pi))
    phi = np.where(eq, phi_eq, np.where(polar, phi_po,
                                        np.sign(y) * HALFPI))
    return lam, phi


# the healpix/rhealpix image polygons (in_image; healpix.cpp:88-130)
_EPSH = 1e-15
_HP_VERTS = np.array([
    (-np.pi - _EPSH, FORTPI), (-3 * FORTPI, HALFPI + _EPSH),
    (-HALFPI, FORTPI + _EPSH), (-FORTPI, HALFPI + _EPSH),
    (0.0, FORTPI + _EPSH), (FORTPI, HALFPI + _EPSH),
    (HALFPI, FORTPI + _EPSH), (3 * FORTPI, HALFPI + _EPSH),
    (np.pi + _EPSH, FORTPI), (np.pi + _EPSH, -FORTPI),
    (3 * FORTPI, -HALFPI - _EPSH), (HALFPI, -FORTPI - _EPSH),
    (FORTPI, -HALFPI - _EPSH), (0.0, -FORTPI - _EPSH),
    (-FORTPI, -HALFPI - _EPSH), (-HALFPI, -FORTPI - _EPSH),
    (-3 * FORTPI, -HALFPI - _EPSH), (-np.pi - _EPSH, -FORTPI),
    (-np.pi - _EPSH, FORTPI)])


def _pnpoly(verts, x, y):
    """Vectorized pnpoly (healpix.cpp:53-85) incl. on-vertex acceptance."""
    inside = np.zeros(np.shape(x), dtype=bool)
    onvert = np.zeros(np.shape(x), dtype=bool)
    for vx, vy in verts:
        onvert |= (x == vx) & (y == vy)
    p1 = verts[0]
    n = len(verts)
    for i in range(1, n):
        p2 = verts[i % n]
        if p1[1] != p2[1]:
            cond = ((y > min(p1[1], p2[1])) & (y <= max(p1[1], p2[1]))
                    & (x <= max(p1[0], p2[0])))
            with np.errstate(invalid="ignore", divide="ignore"):
                xint = (y - p1[1]) * (p2[0] - p1[0]) / (p2[1] - p1[1]) + p1[0]
            inside ^= cond & ((p1[0] == p2[0]) | (x <= xint))
        p1 = p2
    return inside | onvert


def _rhp_verts(ns, ss):
    e = _EPSH
    return np.array([
        (-np.pi - e, FORTPI + e),
        (-np.pi + ns * HALFPI - e, FORTPI + e),
        (-np.pi + ns * HALFPI - e, 3 * FORTPI + e),
        (-np.pi + (ns + 1.0) * HALFPI + e, 3 * FORTPI + e),
        (-np.pi + (ns + 1.0) * HALFPI + e, FORTPI + e),
        (np.pi + e, FORTPI + e),
        (np.pi + e, -FORTPI - e),
        (-np.pi + (ss + 1.0) * HALFPI + e, -FORTPI - e),
        (-np.pi + (ss + 1.0) * HALFPI + e, -3 * FORTPI - e),
        (-np.pi + ss * HALFPI - e, -3 * FORTPI - e),
        (-np.pi + ss * HALFPI - e, -FORTPI - e),
        (-np.pi - e, -FORTPI - e)])


_ROT = {0: np.array([[1, 0], [0, 1]]), 1: np.array([[0, -1], [1, 0]]),
        2: np.array([[-1, 0], [0, -1]]), 3: np.array([[0, 1], [-1, 0]]),
        -1: np.array([[0, 1], [-1, 0]]), -2: np.array([[-1, 0], [0, -1]]),
        -3: np.array([[0, -1], [1, 0]])}


class Healpix(Operation):
    """HEALPix (healpix.cpp); ellipsoid via authalic latitude."""

    proj_name = "healpix"

    def setup(self) -> None:
        from proj_spark.operations.simple import authset
        self.rot_xy = float(self.params.get("rot_xy", 0.0)) * D2R
        if self.es != 0.0:
            self.apa = authset(self.es)
            self.qp = float(mu.qsfn(np.float64(1.0), self.e, self.one_es))
            self.a = self.a * np.sqrt(0.5 * self.qp)
            self.ra = 1.0 / self.a

    def _auth_fwd(self, phi):
        q = mu.qsfn(np.sin(phi), self.e, self.one_es)
        return np.arcsin(np.clip(q / self.qp, -1, 1))

    def _auth_inv(self, phi):
        from proj_spark.operations.simple import authlat
        return authlat(phi, self.apa)

    def _rot(self, x, y, angle):
        return (x * np.cos(angle) - y * np.sin(angle),
                y * np.cos(angle) + x * np.sin(angle))

    def _fwd(self, lam, phi):
        if self.es != 0.0:
            phi = self._auth_fwd(phi)
        x, y = _healpix_sphere_fwd(lam, phi)
        return self._rot(x, y, -self.rot_xy)

    def _inv(self, x, y):
        x, y = self._rot(x, y, self.rot_xy)
        ok = _pnpoly(_HP_VERTS, x, y)
        lam, phi = _healpix_sphere_inv(x, y)
        if self.es != 0.0:
            phi = self._auth_inv(phi)
        return np.where(ok, lam, NAN), np.where(ok, phi, NAN)


class RHealpix(Healpix):
    """rHEALPix: HEALPix with polar caps folded onto squares."""

    proj_name = "rhealpix"

    def setup(self) -> None:
        super().setup()
        self.north_square = int(self.params.get("north_square", 0))
        self.south_square = int(self.params.get("south_square", 0))
        if not 0 <= self.north_square <= 3 or not 0 <= self.south_square <= 3:
            raise ValueError("rhealpix: squares must be in 0..3")

    def _combine_caps(self, x, y, inverse: bool):
        """Vectorized combine_caps (healpix.cpp:296-345)."""
        ns, ss = self.north_square, self.south_square
        north = y > FORTPI
        south = y < -FORTPI
        EPS = _EPSH
        if not inverse:
            cn = np.where(x < -HALFPI, 0,
                          np.where(x < 0, 1, np.where(x < HALFPI, 2, 3)))
            cx = np.where(cn == 0, -3 * FORTPI,
                          np.where(cn == 1, -FORTPI,
                                   np.where(cn == 2, FORTPI, 3 * FORTPI)))
            cy = np.where(north, HALFPI, -HALFPI)
            pole = np.where(north, ns, ss)
            ridx = np.where(north, (cn - pole) % 4, (-(cn - pole)) % 4)
            # rot index semantics: negative deltas map to transposed rots,
            # and (d % 4) on the signed delta reproduces get_rotate_index
            a0 = -3 * FORTPI + pole * HALFPI
        else:
            xs = np.where(north, x - ns * HALFPI, x - ss * HALFPI)
            cx = np.where(north, -3 * FORTPI + ns * HALFPI,
                          -3 * FORTPI + ss * HALFPI)
            cy = np.where(north, HALFPI, -HALFPI)
            cn_n = np.where(
                (y >= -xs - FORTPI - EPS) & (y < xs + 5 * FORTPI - EPS),
                (ns + 1) % 4,
                np.where((y > -xs - FORTPI + EPS) & (y >= xs + 5 * FORTPI - EPS),
                         (ns + 2) % 4,
                         np.where((y <= -xs - FORTPI + EPS)
                                  & (y > xs + 5 * FORTPI + EPS),
                                  (ns + 3) % 4, ns)))
            cn_s = np.where(
                (y <= xs + FORTPI + EPS) & (y > -xs - 5 * FORTPI + EPS),
                (ss + 1) % 4,
                np.where((y < xs + FORTPI - EPS) & (y <= -xs - 5 * FORTPI + EPS),
                         (ss + 2) % 4,
                         np.where((y >= xs + FORTPI - EPS)
                                  & (y < -xs - 5 * FORTPI - EPS),
                                  (ss + 3) % 4, ss)))
            cn = np.where(north, cn_n, cn_s)
            pole = np.where(north, ns, ss)
            ridx = np.where(north, (-(cn - pole)) % 4, (cn - pole) % 4)
            a0 = -3 * FORTPI + cn * HALFPI
        vx = x - cx
        vy = y - cy
        outx = np.array(x, dtype=np.float64, copy=True)
        outy = np.array(y, dtype=np.float64, copy=True)
        polar = north | south
        for r in range(4):
            m = polar & (ridx == r)
            if not np.any(m):
                continue
            R = _ROT[r]
            rx = R[0, 0] * vx + R[0, 1] * vy
            ry = R[1, 0] * vx + R[1, 1] * vy
            outx = np.where(m, rx + a0, outx)
            outy = np.where(m, ry + np.where(north, HALFPI, -HALFPI), outy)
        return outx, outy

    def _fwd(self, lam, phi):
        if self.es != 0.0:
            phi = self._auth_fwd(phi)
        x, y = _healpix_sphere_fwd(lam, phi)
        return self._combine_caps(x, y, inverse=False)

    def _inv(self, x, y):
        ok = _pnpoly(_rhp_verts(self.north_square, self.south_square), x, y)
        x2, y2 = self._combine_caps(x, y, inverse=True)
        lam, phi = _healpix_sphere_inv(x2, y2)
        if self.es != 0.0:
            phi = self._auth_inv(phi)
        return np.where(ok, lam, NAN), np.where(ok, phi, NAN)


class IGH(_SphOp):
    """Interrupted Goode Homolosine — 12-lobe composite (igh.cpp)."""

    proj_name = "igh"
    PHI_J = (40 + 44 / 60.0 + 11.8 / 3600.0) * D2R

    def _setup(self) -> None:
        from proj_spark.operations.pseudocyl import Moll, Sinu
        d = lambda v: v * D2R
        self._sinu = Sinu({"proj": "sinu", "R": 1.0})
        self._moll = Moll({"proj": "moll", "R": 1.0})
        # y offset so sinusoidal and mollweide meet at PHI_J
        x1, y1 = self._moll._fwd(np.float64(0.0), np.float64(self.PHI_J))
        x3, y3 = self._sinu._fwd(np.float64(0.0), np.float64(self.PHI_J))
        self.dy0 = float(y3 - y1)
        # zone table: (is_moll, lam0_deg, x0, y0)
        self.zones = [
            (True, -100.0, -d(100), self.dy0),   # 1
            (True, 30.0, d(30), self.dy0),       # 2
            (False, -100.0, -d(100), 0.0),       # 3
            (False, 30.0, d(30), 0.0),           # 4
            (False, -160.0, -d(160), 0.0),       # 5
            (False, -60.0, -d(60), 0.0),         # 6
            (False, 20.0, d(20), 0.0),           # 7
            (False, 140.0, d(140), 0.0),         # 8
            (True, -160.0, -d(160), -self.dy0),  # 9
            (True, -60.0, -d(60), -self.dy0),    # 10
            (True, 20.0, d(20), -self.dy0),      # 11
            (True, 140.0, d(140), -self.dy0),    # 12
        ]

    def _zone_of(self, lam, phi):
        d = lambda v: v * D2R
        z = np.empty(np.shape(lam), dtype=np.int64)
        north_cap = phi >= self.PHI_J
        north = (phi >= 0) & ~north_cap
        south = (phi >= -self.PHI_J) & (phi < 0)
        z[...] = np.where(lam <= -d(100), 9,
                          np.where(lam <= -d(20), 10,
                                   np.where(lam <= d(80), 11, 12)))
        z = np.where(south, np.where(lam <= -d(100), 5,
                                     np.where(lam <= -d(20), 6,
                                              np.where(lam <= d(80), 7, 8))),
                     z)
        z = np.where(north, np.where(lam <= -d(40), 3, 4), z)
        z = np.where(north_cap, np.where(lam <= -d(40), 1, 2), z)
        return z

    def _fwd(self, lam, phi):
        z = self._zone_of(lam, phi)
        x = np.full(np.shape(lam), np.nan)
        y = np.full(np.shape(lam), np.nan)
        for zi in range(1, 13):
            m = z == zi
            if not np.any(m):
                continue
            is_moll, lam0d, x0, y0 = self.zones[zi - 1]
            op = self._moll if is_moll else self._sinu
            lz = mu.adjlon(lam - lam0d * D2R)
            fx, fy = op._fwd(np.where(m, lz, 0.0), np.where(m, phi, 0.0))
            x = np.where(m, fx + x0, x)
            y = np.where(m, fy + y0, y)
        return x, y

    def _inv(self, x, y):
        d = lambda v: v * D2R
        y90 = self.dy0 + float(np.sqrt(2.0))
        z = np.where((y > y90 + 1e-10) | (y < -y90 + 1e-10), 0, 0)
        zi = np.where(y >= self.PHI_J, np.where(x <= -d(40), 1, 2),
                      np.where(y >= 0, np.where(x <= -d(40), 3, 4),
                               np.where(y >= -self.PHI_J,
                                        np.where(x <= -d(100), 5,
                                                 np.where(x <= -d(20), 6,
                                                          np.where(x <= d(80),
                                                                   7, 8))),
                                        np.where(x <= -d(100), 9,
                                                 np.where(x <= -d(20), 10,
                                                          np.where(x <= d(80),
                                                                   11, 12))))))
        zi = np.where((y > y90 + 1e-10) | (y < -y90 - 1e-10), 0, zi)
        lam = np.full(np.shape(x), np.nan)
        phi = np.full(np.shape(x), np.nan)
        for zn in range(1, 13):
            m = zi == zn
            if not np.any(m):
                continue
            is_moll, lam0d, x0, y0 = self.zones[zn - 1]
            op = self._moll if is_moll else self._sinu
            il, ip = op._inv(np.where(m, x - x0, 0.0), np.where(m, y - y0, 0.0))
            lam = np.where(m, il + lam0d * D2R, lam)
            phi = np.where(m, ip, phi)
        return lam, phi


class Chamb(_SphOp):
    """Chamberlin Trimetric; no inverse (chamb.cpp)."""

    proj_name = "chamb"

    @staticmethod
    def _vect(dphi, c1, s1, c2, s2, dlam):
        cdl = np.cos(dlam)
        big = (np.abs(dphi) > 1.0) | (np.abs(dlam) > 1.0)
        r_big = np.arccos(np.clip(s1 * s2 + c1 * c2 * cdl, -1, 1))
        dp = np.sin(0.5 * dphi)
        dl = np.sin(0.5 * dlam)
        r_small = 2.0 * np.arcsin(np.clip(
            np.sqrt(dp * dp + c1 * c2 * dl * dl), -1, 1))
        r = np.where(big, r_big, r_small)
        Az = np.where(np.abs(r) > 1e-9,
                      np.arctan2(c2 * np.sin(dlam), c1 * s2 - s1 * c2 * cdl),
                      0.0)
        r = np.where(np.abs(r) > 1e-9, r, 0.0)
        return r, Az

    @staticmethod
    def _lc(b, c, a):
        return np.arccos(np.clip(0.5 * (b * b + c * c - a * a) / (b * c),
                                 -1, 1))

    def _setup(self) -> None:
        self.cp = []
        for i in range(3):
            phi = float(self.params.get(f"lat_{i + 1}", 0.0)) * D2R
            lam = float(self.params.get(f"lon_{i + 1}", 0.0)) * D2R
            lam = float(mu.adjlon(np.float64(lam - self.lam0)))
            self.cp.append({"phi": phi, "lam": lam,
                            "cosphi": np.cos(phi), "sinphi": np.sin(phi)})
        for i in range(3):
            j = 0 if i == 2 else i + 1
            r, Az = self._vect(
                np.float64(self.cp[j]["phi"] - self.cp[i]["phi"]),
                self.cp[i]["cosphi"], self.cp[i]["sinphi"],
                self.cp[j]["cosphi"], self.cp[j]["sinphi"],
                np.float64(self.cp[j]["lam"] - self.cp[i]["lam"]))
            self.cp[i]["vr"] = float(r)
            self.cp[i]["vAz"] = float(Az)
        self.beta_0 = float(self._lc(self.cp[0]["vr"], self.cp[2]["vr"],
                                     self.cp[1]["vr"]))
        self.beta_1 = float(self._lc(self.cp[0]["vr"], self.cp[1]["vr"],
                                     self.cp[2]["vr"]))
        self.beta_2 = np.pi - self.beta_0
        py = self.cp[2]["vr"] * np.sin(self.beta_0)
        self.cp[0]["py"] = self.cp[1]["py"] = py
        self.p_y = 2.0 * py
        self.cp[2]["py"] = 0.0
        self.cp[1]["px"] = 0.5 * self.cp[0]["vr"]
        self.cp[0]["px"] = -self.cp[1]["px"]
        self.p_x = self.cp[2]["px"] = \
            self.cp[0]["px"] + self.cp[2]["vr"] * np.cos(self.beta_0)

    def _fwd(self, lam, phi):
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        v = []
        at_cp = np.zeros(np.shape(lam), dtype=np.int64) - 1
        for i in range(3):
            r, Az = self._vect(phi - self.cp[i]["phi"], self.cp[i]["cosphi"],
                               self.cp[i]["sinphi"], cosphi, sinphi,
                               lam - self.cp[i]["lam"])
            at_cp = np.where((r == 0.0) & (at_cp < 0), i, at_cp)
            Az = mu.adjlon(Az - self.cp[i]["vAz"])
            v.append((r, Az))
        x = np.full(np.shape(lam), self.p_x)
        y = np.full(np.shape(lam), self.p_y)
        for i in range(3):
            j = 0 if i == 2 else i + 1
            a = self._lc(self.cp[i]["vr"], v[i][0], v[j][0])
            a = np.where(v[i][1] < 0.0, -a, a)
            if i == 0:
                x = x + v[i][0] * np.cos(a)
                y = y - v[i][0] * np.sin(a)
            elif i == 1:
                a = self.beta_1 - a
                x = x - v[i][0] * np.cos(a)
                y = y - v[i][0] * np.sin(a)
            else:
                a = self.beta_2 - a
                x = x + v[i][0] * np.cos(a)
                y = y + v[i][0] * np.sin(a)
        x = x / 3.0
        y = y / 3.0
        for i in range(3):
            x = np.where(at_cp == i, self.cp[i]["px"], x)
            y = np.where(at_cp == i, self.cp[i]["py"], y)
        return x, y


REGISTRY = {
    c.proj_name: c for c in (QSC, Healpix, RHealpix, IGH, Chamb)
}


class ISEA(_SphOp):
    """Icosahedral Snyder Equal Area (isea.cpp) — the DGGS ancestor of
    H3-style hexagonal cell grids.  `+mode=plane` (the default) is fully
    vectorized; the DGGS addressing modes (di/dd/hex) run a per-point
    fallback loop (they emit integer cell addresses, not coordinates).
    No inverse in the reference."""

    proj_name = "isea"
    DEG36 = 0.62831853071795864768
    DEG72 = 1.25663706143591729537
    DEG108 = 1.88495559215387594306
    DEG120 = 2.09439510239319549229
    DEG144 = 2.51327412287183459075
    ISEA_SCALE = 0.8301572857837594396028083
    V_LAT = 0.46364760899944494524
    E_RAD = 0.91843818702186776133
    F_RAD = 0.18871053072122403508
    TABLE_G = 0.6615845383
    TABLE_H = 0.1909830056
    STD_LAT = 1.01722196792335072101
    STD_LON = 0.19634954084936207740
    RPRIME = 0.91038328153090290025
    # snyder icosahedron constants (degrees)
    C_G, C_BIGG, C_THETA = 37.37736814, 36.0, 30.0

    def _setup(self) -> None:
        p = self.params
        self.o_lat, self.o_lon, self.o_az = self.STD_LAT, self.STD_LON, 0.0
        orient = p.get("orient")
        if orient == "pole":
            self.o_lat, self.o_lon = HALFPI, 0.0
        elif orient not in (None, "isea", True):
            raise ValueError("isea: invalid orient")
        if "azi" in p:
            self.o_az = float(p["azi"]) * D2R
        if "lon_0" in p:
            self.o_lon = float(p["lon_0"]) * D2R
        if "lat_0" in p:
            self.o_lat = float(p["lat_0"]) * D2R
        mode = p.get("mode", "plane")
        if mode not in ("plane", "di", "dd", "hex", True):
            raise ValueError("isea: invalid mode")
        self.mode = "plane" if mode is True else mode
        self.radius = self.ISEA_SCALE if "rescale" in p else 1.0
        self.resolution = int(p.get("resolution", 4))
        self.aperture = int(p.get("aperture", 3))
        # triangle table: centers + azimuth adjustment per triangle 1..20
        V = self.V_LAT
        verts = [(0.0, HALFPI), (np.pi, V), (-self.DEG108, V),
                 (-self.DEG36, V), (self.DEG36, V), (self.DEG108, V),
                 (-self.DEG144, -V), (-self.DEG72, -V), (0.0, -V),
                 (self.DEG72, -V), (self.DEG144, -V), (0.0, -HALFPI)]
        tri_v1 = [0, 0, 0, 0, 0, 0, 6, 7, 8, 9, 10, 2, 3, 4, 5, 1,
                  11, 11, 11, 11, 11]
        E, F = self.E_RAD, self.F_RAD
        cen = [(0.0, 0.0),
               (-self.DEG144, E), (-self.DEG72, E), (0.0, E),
               (self.DEG72, E), (self.DEG144, E),
               (-self.DEG144, F), (-self.DEG72, F), (0.0, F),
               (self.DEG72, F), (self.DEG144, F),
               (-self.DEG108, -F), (-self.DEG36, -F), (self.DEG36, -F),
               (self.DEG108, -F), (np.pi, -F),
               (-self.DEG108, -E), (-self.DEG36, -E), (self.DEG36, -E),
               (self.DEG108, -E), (np.pi, -E)]
        self.centers = cen
        self.az_adj = [0.0]
        for i in range(1, 21):
            vlon, vlat = verts[tri_v1[i]]
            clon, clat = cen[i]
            self.az_adj.append(float(np.arctan2(
                np.cos(vlat) * np.sin(vlon - clon),
                np.cos(clat) * np.sin(vlat)
                - np.sin(clat) * np.cos(vlat) * np.cos(vlon - clon))))

    def _tri_center_xy(self, tri: int):
        t = (tri - 1) % 20
        cx = self.TABLE_G * ((t % 5) - 2) * 2.0
        if t > 9:
            cx += self.TABLE_G
        cy = (5.0, 1.0, -1.0, -5.0)[t // 5] * self.TABLE_H
        return cx * self.RPRIME, cy * self.RPRIME

    def _ctran(self, lam, phi):
        """isea_ctran: rotate so (o_lat, o_lon) becomes the north pole."""
        alpha = self.o_lat
        beta = self.o_lon + np.pi
        cos_p = np.cos(phi)
        sin_a = np.sin(alpha)
        dl = lam - beta
        sin_phip = sin_a * np.sin(phi) - np.cos(alpha) * cos_p * np.cos(dl)
        lp_b = np.arctan2(cos_p * np.sin(dl),
                          sin_a * cos_p * np.cos(dl)
                          + np.cos(alpha) * np.sin(phi))
        lambdap = lp_b + beta
        lambdap = np.remainder(lambdap + np.pi, 2 * np.pi) - np.pi
        phip = np.arcsin(np.clip(sin_phip, -1, 1))
        lambdap = lambdap - (np.pi - self.o_az + self.o_lon) + np.pi
        lambdap = np.remainder(lambdap + np.pi, 2 * np.pi) - np.pi
        return lambdap, phip

    def _snyder_fwd(self, lon, lat):
        """Vectorized isea_snyder_forward: per-point triangle + (x, y)."""
        theta = self.C_THETA * D2R
        g = self.C_G * D2R
        G = self.C_BIGG * D2R
        cot_theta = 1.0 / np.tan(theta)
        tan_g = np.tan(g)
        tri = np.zeros(np.shape(lon), dtype=np.int64)
        x = np.full(np.shape(lon), np.nan)
        y = np.full(np.shape(lon), np.nan)
        done = np.zeros(np.shape(lon), dtype=bool)
        for i in range(1, 21):
            clon, clat = self.centers[i]
            z = np.arccos(np.clip(
                np.sin(clat) * np.sin(lat)
                + np.cos(clat) * np.cos(lat) * np.cos(lon - clon), -1, 1))
            cand = ~done & (z <= g + 5e-6)
            if not np.any(cand):
                continue
            Az = np.arctan2(
                np.cos(lat) * np.sin(lon - clon),
                np.cos(clat) * np.sin(lat)
                - np.sin(clat) * np.cos(lat) * np.cos(lon - clon))
            Az = Az - self.az_adj[i]
            Az = np.where(Az < 0.0, Az + 2 * np.pi, Az)
            mult = np.floor(Az / self.DEG120)
            mult = np.where(Az - mult * self.DEG120 > self.DEG120
                            + np.finfo(float).eps, mult + 1, mult)
            Az = Az - mult * self.DEG120
            with np.errstate(invalid="ignore", divide="ignore"):
                q = np.arctan2(tan_g, np.cos(Az) + np.sin(Az) * cot_theta)
            cand &= z <= q + 5e-6
            if not np.any(cand):
                continue
            H = np.arccos(np.clip(np.sin(Az) * np.sin(G) * np.cos(g)
                                  - np.cos(Az) * np.cos(G), -1, 1))
            Ag = Az + G + H - np.pi
            Azprime = np.arctan2(
                2.0 * Ag,
                self.RPRIME ** 2 * tan_g * tan_g - 2.0 * Ag * cot_theta)
            dprime = self.RPRIME * tan_g / (np.cos(Azprime)
                                            + np.sin(Azprime) * cot_theta)
            with np.errstate(invalid="ignore", divide="ignore"):
                f = dprime / (2.0 * self.RPRIME * np.sin(q / 2.0))
            rho = 2.0 * self.RPRIME * f * np.sin(z / 2.0)
            Azprime = Azprime + self.DEG120 * mult
            x = np.where(cand, rho * np.sin(Azprime), x)
            y = np.where(cand, rho * np.cos(Azprime), y)
            tri = np.where(cand, i, tri)
            done |= cand
        return tri, x, y

    def _fwd(self, lam, phi):
        lam = np.asarray(lam, dtype=np.float64)
        phi = np.asarray(phi, dtype=np.float64)
        lonp, latp = self._ctran(lam, phi)
        tri, x, y = self._snyder_fwd(lonp, latp)
        x = x * self.radius
        y = y * self.radius
        if self.mode == "plane":
            down = ((tri - 1) // 5) % 2 == 1
            x2 = np.where(down, -x, x)
            y2 = np.where(down, -y, y)
            tcx = np.zeros(np.shape(lam))
            tcy = np.zeros(np.shape(lam))
            for i in range(1, 21):
                cx, cy = self._tri_center_xy(i)
                tcx = np.where(tri == i, cx * self.radius, tcx)
                tcy = np.where(tri == i, cy * self.radius, tcy)
            return x2 + tcx, y2 + tcy
        # DGGS addressing modes: integer cell addresses; bounded-resolution
        # guard mirrors the reference's overflow aborts
        if self.aperture > 0 and self.aperture ** (self.resolution / 2.0) \
                > 2 ** 31 / 16:
            return np.full(np.shape(lam), NAN), np.full(np.shape(lam), NAN)
        xs = x / self.radius * self.ISEA_SCALE + 0.5
        ys = y / self.radius * self.ISEA_SCALE + 2.0 * 0.14433756729740644112
        out_x = np.full(np.shape(lam), np.nan)
        out_y = np.full(np.shape(lam), np.nan)
        flat_tri = np.atleast_1d(tri)
        flat_x = np.atleast_1d(xs)
        flat_y = np.atleast_1d(ys)
        ox = np.atleast_1d(out_x)
        oy = np.atleast_1d(out_y)
        for k in range(flat_tri.size):
            try:
                res = self._address(int(flat_tri[k]), float(flat_x[k]),
                                    float(flat_y[k]))
            except OverflowError:
                res = None
            if res is not None:
                ox[k], oy[k] = res
        return ox.reshape(np.shape(lam)), oy.reshape(np.shape(lam))

    # -- scalar DGGS addressing fallback (isea_ptdd/dddi/hex) -------------

    def _rotate(self, x, y, degrees):
        rad = -degrees * np.pi / 180.0
        return (x * np.cos(rad) + y * np.sin(rad),
                -x * np.sin(rad) + y * np.cos(rad))

    def _hexbin2(self, width, x, y):
        x = x / np.cos(30 * np.pi / 180.0)
        y = y - x / 2.0
        x /= width
        y /= width
        z = -x - y
        rx, ry, rz = np.floor(x + 0.5), np.floor(y + 0.5), np.floor(z + 0.5)
        ix, iy, iz = int(rx), int(ry), int(rz)
        if abs(ix + iy) > 2 ** 31 - 1 or abs(ix + iy + iz) > 2 ** 31 - 1:
            raise OverflowError("hexbin2 integer overflow")
        s = ix + iy + iz
        if s:
            dx, dy, dz = abs(rx - x), abs(ry - y), abs(rz - z)
            if dx >= dy and dx >= dz:
                ix -= s
            elif dy >= dx and dy >= dz:
                iy -= s
            else:
                iz -= s
        # hex_xy
        if ix >= 0:
            hy = -iy - (ix + 1) // 2
        else:
            hy = -iy - ix // 2
        return ix, hy

    def _dddi_ap3odd(self, quad, x, y):
        """isea_dddi_ap3odd: aperture-3 odd-resolution addressing."""
        sidelength = (2.0 ** self.resolution + 1.0) / 2.0
        hexwidth = np.cos(np.pi / 6.0) / sidelength
        maxcoord = round(sidelength * 2.0)
        hx, hy = self._hexbin2(hexwidth, x, y)
        # hex_iso
        if hx >= 0:
            hy = -hy - (hx + 1) // 2
        else:
            hy = -hy - hx // 2
        hz = -hx - hy
        d = hx - hz
        i = hx + hy + hy
        if quad <= 5:
            if d == 0 and i == maxcoord:
                quad, d, i = 0, 0, 0
            elif i == maxcoord:
                quad = 1 if quad + 1 == 6 else quad + 1
                i = maxcoord - d
                d = 0
            elif d == maxcoord:
                quad += 5
                d = 0
        else:
            if i == 0 and d == maxcoord:
                quad, d, i = 11, 0, 0
            elif d == maxcoord:
                quad = 6 if quad + 1 == 11 else quad + 1
                d = maxcoord - i
                i = 0
            elif i == maxcoord:
                quad = (quad - 4) % 5
                i = 0
        if self.mode == "di":
            return d, i
        if not (-(2 ** 31) / 16 <= d <= (2 ** 31 - 1) / 16):
            return None
        return d * 16 + quad, i

    def _address(self, tri, x, y):
        if tri == 0:
            return None
        downtri = ((tri - 1) // 5) % 2 == 1
        quad = ((tri - 1) % 5) + ((tri - 1) // 10) * 5 + 1
        x, y = self._rotate(x, y, 240.0 if downtri else 60.0)
        if downtri:
            x += 0.5
            y += 0.86602540378443864672
        if self.mode == "dd":
            return x, y
        if self.aperture == 3 and self.resolution % 2 != 0:
            return self._dddi_ap3odd(quad, x, y)
        # dddi (aperture even-resolution form)
        sidelength = round(self.aperture ** (self.resolution / 2.0))
        if sidelength == 0:
            return None
        hexwidth = 1.0 / sidelength
        vx, vy = self._rotate(x, y, -30.0)
        hx, hy = self._hexbin2(hexwidth, vx, vy)
        # hex_iso
        if hx >= 0:
            hy = -hy - (hx + 1) // 2
        else:
            hy = -hy - hx // 2
        hz = -hx - hy
        if quad <= 5:
            if hx == 0 and hz == -sidelength:
                quad, hx, hy, hz = 0, 0, 0, 0
            elif hz == -sidelength:
                quad = 1 if quad + 1 == 6 else quad + 1
                hy = sidelength - hx
                hz = hx - sidelength
                hx = 0
            elif hx == sidelength:
                quad += 5
                hy = -hz
                hx = 0
        else:
            if hz == 0 and hx == sidelength:
                quad, hx, hy, hz = 11, 0, 0, 0
            elif hx == sidelength:
                quad = 6 if quad + 1 == 11 else quad + 1
                hx = hy + sidelength
                hy = 0
                hz = -hx
            elif hy == -sidelength:
                quad -= 4
                hy = 0
                hz = -hx
        d, i = hx, -hz
        if self.mode == "di":
            return d, i
        # hex: pack quad into low bits; reference aborts when the shifted
        # address exceeds int range (isea.cpp isea_hex "Invalid shift")
        if not (-(2 ** 31) / 16 <= d <= (2 ** 31 - 1) / 16):
            return None
        return d * 16 + quad, i


REGISTRY["isea"] = ISEA
