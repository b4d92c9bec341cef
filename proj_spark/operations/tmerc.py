"""Transverse Mercator family: tmerc (Evenden/Snyder series), etmerc
(Poder/Engsager 6th-order Gauss/Clenshaw), and UTM zoning.

Semantics match src/projections/tmerc.cpp (reference, studied for behavior):
the "approx" engine is the classical Snyder series with pj_mlfn meridional
arc; the "exact" engine maps geodetic->Gaussian latitude, then to the
complex plane via asinh(tan), then applies a 6th-order complex Clenshaw
series (Engsager & Poder, ICC 2007; König & Weise 1951).  UTM is etmerc
with zone-derived lam0, k0=0.9996, x0=500000, y0=0|1e7 (south)
(reference: src/projections/tmerc.cpp:541-589).
"""

from __future__ import annotations

import math

import numpy as np

from proj_spark import mathutils as mu
from proj_spark.operations.base import Operation

# Snyder series constants (1/1, 1/2, 1/6, 1/12, 1/20, 1/30, 1/42, 1/56)
FC1 = 1.0
FC2 = 0.5
FC3 = 1.0 / 6.0
FC4 = 1.0 / 12.0
FC5 = 0.05
FC6 = 1.0 / 30.0
FC7 = 1.0 / 42.0
FC8 = 1.0 / 56.0

# |scaled easting| bound: 150 degrees from the central meridian
ETMERC_E_LIMIT = 2.623395162778


def _third_flattening(es: float) -> float:
    f = es / (1.0 + math.sqrt(1.0 - es))
    return f / (2.0 - f)


def etmerc_coefficients(es: float) -> dict[str, np.ndarray | float]:
    """6th-order series coefficients in the third flattening n.

    Polynomials from Engsager & Poder (ICC 2007) / König & Weise (1951):
    cgb: Gaussian->geodetic lat, cbg: geodetic->Gaussian lat,
    utg: normalized TM -> spherical N,E, gtu: spherical -> TM,
    qn: normalized meridional quadrant scale.
    """
    n = _third_flattening(es)
    cgb = np.empty(6)
    cbg = np.empty(6)
    utg = np.empty(6)
    gtu = np.empty(6)

    cgb[0] = n * (2 + n * (-2 / 3.0 + n * (-2 + n * (116 / 45.0 + n * (26 / 45.0 + n * (-2854 / 675.0))))))
    cbg[0] = n * (-2 + n * (2 / 3.0 + n * (4 / 3.0 + n * (-82 / 45.0 + n * (32 / 45.0 + n * (4642 / 4725.0))))))
    p = n * n
    cgb[1] = p * (7 / 3.0 + n * (-8 / 5.0 + n * (-227 / 45.0 + n * (2704 / 315.0 + n * (2323 / 945.0)))))
    cbg[1] = p * (5 / 3.0 + n * (-16 / 15.0 + n * (-13 / 9.0 + n * (904 / 315.0 + n * (-1522 / 945.0)))))
    p *= n
    cgb[2] = p * (56 / 15.0 + n * (-136 / 35.0 + n * (-1262 / 105.0 + n * (73814 / 2835.0))))
    cbg[2] = p * (-26 / 15.0 + n * (34 / 21.0 + n * (8 / 5.0 + n * (-12686 / 2835.0))))
    p *= n
    cgb[3] = p * (4279 / 630.0 + n * (-332 / 35.0 + n * (-399572 / 14175.0)))
    cbg[3] = p * (1237 / 630.0 + n * (-12 / 5.0 + n * (-24832 / 14175.0)))
    p *= n
    cgb[4] = p * (4174 / 315.0 + n * (-144838 / 6237.0))
    cbg[4] = p * (-734 / 315.0 + n * (109598 / 31185.0))
    p *= n
    cgb[5] = p * (601676 / 22275.0)
    cbg[5] = p * (444337 / 155925.0)

    p = n * n
    qn = 1.0 / (1 + n) * (1 + p * (1 / 4.0 + p * (1 / 64.0 + p / 256.0)))

    utg[0] = n * (-0.5 + n * (2 / 3.0 + n * (-37 / 96.0 + n * (1 / 360.0 + n * (81 / 512.0 + n * (-96199 / 604800.0))))))
    gtu[0] = n * (0.5 + n * (-2 / 3.0 + n * (5 / 16.0 + n * (41 / 180.0 + n * (-127 / 288.0 + n * (7891 / 37800.0))))))
    utg[1] = p * (-1 / 48.0 + n * (-1 / 15.0 + n * (437 / 1440.0 + n * (-46 / 105.0 + n * (1118711 / 3870720.0)))))
    gtu[1] = p * (13 / 48.0 + n * (-3 / 5.0 + n * (557 / 1440.0 + n * (281 / 630.0 + n * (-1983433 / 1935360.0)))))
    p *= n
    utg[2] = p * (-17 / 480.0 + n * (37 / 840.0 + n * (209 / 4480.0 + n * (-5569 / 90720.0))))
    gtu[2] = p * (61 / 240.0 + n * (-103 / 140.0 + n * (15061 / 26880.0 + n * (167603 / 181440.0))))
    p *= n
    utg[3] = p * (-4397 / 161280.0 + n * (11 / 504.0 + n * (830251 / 7257600.0)))
    gtu[3] = p * (49561 / 161280.0 + n * (-179 / 168.0 + n * (6601661 / 7257600.0)))
    p *= n
    utg[4] = p * (-4583 / 161280.0 + n * (108847 / 3991680.0))
    gtu[4] = p * (34729 / 80640.0 + n * (-3418889 / 1995840.0))
    p *= n
    utg[5] = p * (-20648693 / 638668800.0)
    gtu[5] = p * (212378941 / 319334400.0)

    return {"cgb": cgb, "cbg": cbg, "utg": utg, "gtu": gtu, "qn": qn}


class TMercExact(Operation):
    """etmerc: Poder/Engsager 'exact' transverse Mercator (ellipsoid only)."""

    proj_name = "etmerc"

    def setup(self) -> None:
        if self.es <= 0:
            raise ValueError("etmerc requires an ellipsoid (+ellps / +a +rf)")
        c = etmerc_coefficients(self.es)
        self.cgb: np.ndarray = c["cgb"]
        self.cbg: np.ndarray = c["cbg"]
        self.utg: np.ndarray = c["utg"]
        self.gtu: np.ndarray = c["gtu"]
        self.qn: float = self.k0 * c["qn"]
        # origin northing offset: -Qn * (gaussian(phi0) + series)
        z = mu.gatg(self.cbg, np.float64(self.phi0))
        self.zb: float = float(-self.qn * (z + mu.clens(self.gtu, 2.0 * z)))

    def _fwd(self, lam, phi):
        cn = mu.gatg(self.cbg, phi)
        sin_cn, cos_cn = np.sin(cn), np.cos(cn)
        sin_ce, cos_ce = np.sin(lam), np.cos(lam)
        cn = np.arctan2(sin_cn, cos_ce * cos_cn)
        ce = np.arctan2(sin_ce * cos_cn, np.hypot(sin_cn, cos_cn * cos_ce))
        ce = np.arcsinh(np.tan(ce))
        dcn, dce = mu.clen_s(self.gtu, 2.0 * cn, 2.0 * ce)
        cn = cn + dcn
        ce = ce + dce
        ok = np.abs(ce) <= ETMERC_E_LIMIT
        nan = np.float64(np.nan)
        x = np.where(ok, self.qn * ce, nan)
        y = np.where(ok, self.qn * cn + self.zb, nan)
        return x, y

    def _inv(self, x, y):
        cn = (y - self.zb) / self.qn
        ce = x / self.qn
        ok = np.abs(ce) <= ETMERC_E_LIMIT
        dcn, dce = mu.clen_s(self.utg, 2.0 * cn, 2.0 * ce)
        cn = cn + dcn
        ce = np.arctan(np.sinh(ce + dce))
        sin_cn, cos_cn = np.sin(cn), np.cos(cn)
        sin_ce, cos_ce = np.sin(ce), np.cos(ce)
        lam = np.arctan2(sin_ce, cos_ce * cos_cn)
        phi_sph = np.arctan2(sin_cn * cos_ce, np.hypot(sin_ce, cos_ce * cos_cn))
        phi = mu.gatg(self.cgb, phi_sph)
        nan = np.float64(np.nan)
        return np.where(ok, lam, nan), np.where(ok, phi, nan)


class TMercApprox(Operation):
    """tmerc +approx: Evenden/Snyder series transverse Mercator."""

    proj_name = "tmerc_approx"

    def setup(self) -> None:
        if self.es != 0.0:
            self.en = mu.enfn(self.es)
            self.ml0 = float(mu.mlfn(np.float64(self.phi0), np.sin(np.float64(self.phi0)),
                                     np.cos(np.float64(self.phi0)), self.en))
            self.esp = self.es / (1.0 - self.es)
        else:
            self.esp = self.k0
            self.ml0 = 0.5 * self.esp

    def _fwd(self, lam, phi):
        if self.es == 0.0:
            return self._fwd_sphere(lam, phi)
        bad = (lam < -mu.HALFPI) | (lam > mu.HALFPI)
        sinphi, cosphi = np.sin(phi), np.cos(phi)
        t = np.where(np.abs(cosphi) > 1e-10, sinphi / cosphi, 0.0)
        t = t * t
        al = cosphi * lam
        als = al * al
        al = al / np.sqrt(1.0 - self.es * sinphi * sinphi)
        n = self.esp * cosphi * cosphi
        x = self.k0 * al * (FC1 + FC3 * als * (1.0 - t + n +
            FC5 * als * (5.0 + t * (t - 18.0) + n * (14.0 - 58.0 * t) +
            FC7 * als * (61.0 + t * (t * (179.0 - t) - 479.0)))))
        y = self.k0 * (mu.mlfn(phi, sinphi, cosphi, self.en) - self.ml0 +
            sinphi * al * lam * FC2 * (1.0 +
            FC4 * als * (5.0 - t + n * (9.0 + 4.0 * n) +
            FC6 * als * (61.0 + t * (t - 58.0) + n * (270.0 - 330.0 * t) +
            FC8 * als * (1385.0 + t * (t * (543.0 - t) - 3111.0))))))
        nan = np.float64(np.nan)
        return np.where(bad, nan, x), np.where(bad, nan, y)

    def _fwd_sphere(self, lam, phi):
        cosphi = np.cos(lam * 0 + phi)
        b = cosphi * np.sin(lam)
        bad = (lam < -mu.HALFPI) | (lam > mu.HALFPI) | (np.abs(np.abs(b) - 1.0) <= 1e-10)
        x = self.ml0 * np.log((1.0 + b) / (1.0 - b))
        yy = cosphi * np.cos(lam) / np.sqrt(1.0 - b * b)
        ab = np.abs(yy)
        y = np.where(ab >= 1.0, np.where(ab - 1.0 > 1e-10, np.nan, 0.0), np.arccos(np.clip(yy, -1, 1)))
        y = np.where(phi < 0.0, -y, y)
        y = self.esp * (y - self.phi0)
        nan = np.float64(np.nan)
        return np.where(bad, nan, x), np.where(bad, nan, y)

    def _inv(self, x, y):
        if self.es == 0.0:
            return self._inv_sphere(x, y)
        phi = mu.inv_mlfn(self.ml0 + y / self.k0, self.es, self.en)
        at_pole = np.abs(phi) >= mu.HALFPI
        sinphi, cosphi = np.sin(phi), np.cos(phi)
        t = np.where(np.abs(cosphi) > 1e-10, sinphi / cosphi, 0.0)
        n = self.esp * cosphi * cosphi
        con = 1.0 - self.es * sinphi * sinphi
        d = x * np.sqrt(con) / self.k0
        con_t = con * t
        t = t * t
        ds = d * d
        phi_out = phi - (con_t * ds / (1.0 - self.es)) * FC2 * (1.0 -
            ds * FC4 * (5.0 + t * (3.0 - 9.0 * n) + n * (1.0 - 4.0 * n) -
            ds * FC6 * (61.0 + t * (90.0 - 252.0 * n + 45.0 * t) + 46.0 * n -
            ds * FC8 * (1385.0 + t * (3633.0 + t * (4095.0 + 1575.0 * t))))))
        with np.errstate(divide="ignore", invalid="ignore"):
            lam_out = d * (FC1 - ds * FC3 * (1.0 + 2.0 * t + n -
                ds * FC5 * (5.0 + t * (28.0 + 24.0 * t + 8.0 * n) + 6.0 * n -
                ds * FC7 * (61.0 + t * (662.0 + t * (1320.0 + 720.0 * t)))))) / cosphi
        phi_pole = np.where(y < 0.0, -mu.HALFPI, mu.HALFPI)
        return np.where(at_pole, 0.0, lam_out), np.where(at_pole, phi_pole, phi_out)

    def _inv_sphere(self, x, y):
        h = np.exp(x / self.esp)
        g = 0.5 * (h - 1.0 / h)
        h2 = np.cos(self.phi0 + y / self.esp)
        phi = np.arcsin(np.sqrt(np.clip((1.0 - h2 * h2) / (1.0 + g * g), 0.0, 1.0)))
        phi = np.where((y < 0.0) & (-phi + self.phi0 < 0.0), -phi, phi)
        lam = np.where((g != 0.0) | (h2 != 0.0), np.arctan2(g, h2), 0.0)
        return lam, phi


class TMerc(Operation):
    """+proj=tmerc: dispatch to exact engine unless +approx or sphere
    (reference: src/projections/tmerc.cpp:509-527)."""

    proj_name = "tmerc"

    def __new__(cls, params: dict):
        from proj_spark.ellipsoids import ellipsoid_from_params
        ell = ellipsoid_from_params(params)
        if "approx" in params or ell.es <= 0:
            return TMercApprox(params)
        return TMercExact(params)


def utm_params(params: dict) -> dict:
    """Resolve UTM zone parameters (src/projections/tmerc.cpp:541-589)."""
    p = dict(params)
    if "zone" in p:
        zone = int(p["zone"])
        if not 1 <= zone <= 60:
            raise ValueError(f"invalid UTM zone {zone}")
        zone -= 1
    else:
        lam0 = float(p.get("lon_0", 0.0)) * np.pi / 180.0
        zone = int(np.floor((float(mu.adjlon(np.float64(lam0))) + np.pi) * 30.0 / np.pi))
        zone = min(max(zone, 0), 59)
    p["lon_0"] = (zone + 0.5) * 6.0 - 180.0
    p["lat_0"] = 0.0
    p["k_0"] = 0.9996
    p["x_0"] = 500000.0
    p["y_0"] = 10000000.0 if "south" in p else 0.0
    p.pop("k", None)
    return p


class UTM(Operation):
    """+proj=utm: etmerc (or Snyder series with +approx) with zone logic."""

    proj_name = "utm"

    def __new__(cls, params: dict):
        p = utm_params(params)
        if "approx" in p:
            return TMercApprox(p)
        return TMercExact(p)


def utm_zone_from_lonlat(lon_deg: np.ndarray, lat_deg: np.ndarray) -> np.ndarray:
    """Standard UTM zone number from longitude (1..60); vectorized."""
    z = np.floor((np.asarray(lon_deg) + 180.0) / 6.0).astype(np.int64) + 1
    return np.clip(z, 1, 60)


class UTMBatch:
    """All-zones UTM forward in ONE vectorized pass.

    The etmerc coefficients (src/projections/tmerc.cpp:432-487) depend
    only on the ellipsoid; a UTM zone changes nothing but lam0 (and the
    constant k0/x0/y0 — src/projections/tmerc.cpp:541-589).  So a batch
    that mixes all 60 zones — the normal case for an arbitrary-partition
    pages table — projects in a single kernel call with a per-row lam0,
    instead of 60 masked sub-batches whose small sizes would throw away
    NumPy's vectorization.  Results are bit-identical to the per-zone
    `+proj=utm +zone=N` operations (same formulas, same order).
    """

    def __init__(self, params: dict | None = None):
        p = dict(params or {})
        p.setdefault("ellps", "GRS80")
        self.south = "south" in p
        p.pop("south", None)
        p.update({"lon_0": 0.0, "lat_0": 0.0, "k_0": 0.9996,
                  "x_0": 0.0, "y_0": 0.0})
        self.op = TMercExact(p)
        self.x0 = 500000.0
        self.y0 = 10000000.0 if self.south else 0.0

    def fwd_deg(self, lon_deg: np.ndarray, lat_deg: np.ndarray):
        """(lon, lat) degrees -> (zone, easting, northing)."""
        lon_deg = np.asarray(lon_deg, dtype=np.float64)
        lat_deg = np.asarray(lat_deg, dtype=np.float64)
        lam = np.radians(lon_deg)
        phi = np.radians(lat_deg)
        zone = utm_zone_from_lonlat(lon_deg, lat_deg)
        lam0 = ((zone - 1) + 0.5) * 6.0 - 180.0
        lam0 = lam0 * np.pi / 180.0
        # prepare semantics of Operation.fwd (src/fwd.cpp:41-102)
        bad = (np.abs(phi) - mu.HALFPI > mu.EPS_LAT) | (lam > 10.0) | (lam < -10.0)
        bad |= ~np.isfinite(lam) | ~np.isfinite(phi)
        phi = np.clip(phi, -mu.HALFPI, mu.HALFPI)
        lam = mu.adjlon(mu.adjlon(lam) - lam0)
        x, y = self.op._fwd(np.where(bad, 0.0, lam), np.where(bad, 0.0, phi))
        x = self.op.a * x + self.x0
        y = self.op.a * y + self.y0
        nan = np.float64(np.nan)
        return zone, np.where(bad, nan, x), np.where(bad, nan, y)
