"""Infrastructure operations and simple (mostly cylindrical) projections.

Semantics per the reference:
  latlong/noop      src/projections/latlong.cpp, src/conversions/noop.cpp
  geoc              geographic <-> geocentric latitude (src/conversions/geoc.cpp)
  axisswap          src/conversions/axisswap.cpp
  unitconvert       src/conversions/unitconvert.cpp (linear units)
  affine/geogoffset src/transformations/affine.cpp
  eqc               src/projections/eqc.cpp   x = cos(lat_ts)·lam, y = phi-phi0
  gall              src/projections/gall.cpp  x = lam/sqrt2, y = (1+1/sqrt2)tan(phi/2)
  mill              src/projections/mill.cpp  y = 1.25·log(tan(pi/4+0.4phi))
  cea               src/projections/cea.cpp   authalic equal-area cylinder
"""

from __future__ import annotations

import math

import numpy as np

from proj_spark import mathutils as mu
from proj_spark.operations.base import Operation


def authset(es: float) -> np.ndarray:
    """Series for latitude from authalic latitude (Snyder 3-18)."""
    p00, p01, p02 = 1 / 3.0, 31 / 180.0, 517 / 5040.0
    p10, p11 = 23 / 360.0, 251 / 3780.0
    p20 = 761 / 45360.0
    es2 = es * es
    es3 = es2 * es
    return np.array([
        es * p00 + es2 * p01 + es3 * p02,
        es2 * p10 + es3 * p11,
        es3 * p20,
    ])


def authlat(beta: np.ndarray, apa: np.ndarray) -> np.ndarray:
    t = beta + beta
    return beta + apa[0] * np.sin(t) + apa[1] * np.sin(t + t) + apa[2] * np.sin(t + t + t)


class LatLong(Operation):
    """Geodetic identity CRS tag; kernel is a no-op in radians.

    Routed through the base prepare/finalize machinery so cs2cs-style
    modifiers (+towgs84/+datum/+pm/+axis/+lon_wrap/+geoc) apply exactly
    as in the reference (src/fwd.cpp:41-102 with RADIANS output units)."""

    proj_name = "latlong"
    right = "radians"

    def _fwd(self, lam, phi):
        return (np.asarray(lam, dtype=np.float64),
                np.asarray(phi, dtype=np.float64))

    def _inv(self, x, y):
        return (np.asarray(x, dtype=np.float64),
                np.asarray(y, dtype=np.float64))


class Noop(Operation):
    """True identity (PJ_IO_UNITS_WHATEVER): touches nothing."""

    proj_name = "noop"
    right = "radians"

    def fwd(self, lam, phi):
        return np.asarray(lam, dtype=np.float64), np.asarray(phi, dtype=np.float64)

    def inv(self, x, y):
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)

    _fwd = fwd
    _inv = inv


class GeocentricLat(Operation):
    """Geographic <-> geocentric latitude: phi' = atan((1-es)·tan(phi))."""

    proj_name = "geoc"
    right = "radians"

    def fwd(self, lam, phi):
        phi = np.asarray(phi, dtype=np.float64)
        return np.asarray(lam, dtype=np.float64), np.arctan(self.one_es * np.tan(phi))

    def inv(self, x, y):
        y = np.asarray(y, dtype=np.float64)
        return np.asarray(x, dtype=np.float64), np.arctan(np.tan(y) / self.one_es)


class Eqc(Operation):
    proj_name = "eqc"

    def setup(self) -> None:
        self.rc = math.cos(float(self.params.get("lat_ts", 0.0)) * np.pi / 180.0)
        if self.rc <= 0.0:
            raise ValueError("lat_ts larger than 90")
        self.es = 0.0

    def _fwd(self, lam, phi):
        return self.rc * lam, phi - self.phi0

    def _inv(self, x, y):
        return x / self.rc, y + self.phi0


class Gall(Operation):
    proj_name = "gall"
    XF = 0.70710678118654752440
    YF = 1.70710678118654752440

    def setup(self) -> None:
        self.es = 0.0

    def _fwd(self, lam, phi):
        return self.XF * lam, self.YF * np.tan(0.5 * phi)

    def _inv(self, x, y):
        return x / self.XF, 2.0 * np.arctan(y / self.YF)


class Mill(Operation):
    proj_name = "mill"

    def setup(self) -> None:
        self.es = 0.0

    def _fwd(self, lam, phi):
        return lam, np.log(np.tan(mu.FORTPI + phi * 0.4)) * 1.25

    def _inv(self, x, y):
        return x, 2.5 * (np.arctan(np.exp(0.8 * y)) - mu.FORTPI)


class Cea(Operation):
    proj_name = "cea"

    def setup(self) -> None:
        t = 0.0
        if "lat_ts" in self.params:
            t = float(self.params["lat_ts"]) * np.pi / 180.0
            self.k0 = math.cos(t)
            if self.k0 < 0.0:
                raise ValueError("lat_ts larger than 90")
        if self.es != 0.0:
            st = math.sin(t)
            self.k0 /= math.sqrt(1.0 - self.es * st * st)
            self.apa = authset(self.es)
            self.qp = float(mu.qsfn(np.float64(1.0), self.e, self.one_es))

    def _fwd(self, lam, phi):
        x = self.k0 * lam
        if self.es != 0.0:
            y = 0.5 * mu.qsfn(np.sin(phi), self.e, self.one_es) / self.k0
        else:
            y = np.sin(phi) / self.k0
        return x, y

    def _inv(self, x, y):
        if self.es != 0.0:
            phi = authlat(np.arcsin(np.clip(2.0 * y * self.k0 / self.qp, -1.0, 1.0)), self.apa)
        else:
            yy = y * self.k0
            t = np.abs(yy)
            phi = np.where(t >= 1.0,
                           np.where(yy < 0.0, -mu.HALFPI, mu.HALFPI),
                           np.arcsin(np.clip(yy, -1.0, 1.0)))
            phi = np.where(t - 1e-10 > 1.0, np.nan, phi)
        return x / self.k0, phi


class GeogOffset(Operation):
    """Constant angular/vertical offsets +dlon +dlat +dh (radians io;
    src/transformations/geogoffset.cpp offsets all three axes)."""

    proj_name = "geogoffset"
    right = "radians"

    def setup(self) -> None:
        sec2rad = np.pi / 180.0 / 3600.0
        self.dlon = float(self.params.get("dlon", 0.0)) * sec2rad
        self.dlat = float(self.params.get("dlat", 0.0)) * sec2rad
        self.dh = float(self.params.get("dh", 0.0))

    def fwd(self, lam, phi):
        return (np.asarray(lam, dtype=np.float64) + self.dlon,
                np.asarray(phi, dtype=np.float64) + self.dlat)

    def inv(self, x, y):
        return (np.asarray(x, dtype=np.float64) - self.dlon,
                np.asarray(y, dtype=np.float64) - self.dlat)

    def fwd3d(self, lam, phi, z):
        x, y = self.fwd(lam, phi)
        z = np.zeros_like(x) if z is None else np.asarray(z, dtype=np.float64)
        return x, y, z + self.dh

    def inv3d(self, x, y, z):
        lam, phi = self.inv(x, y)
        z = (np.zeros_like(lam) if z is None
             else np.asarray(z, dtype=np.float64))
        return lam, phi, z - self.dh


class Affine(Operation):
    """Full 4-D affine (src/transformations/affine.cpp): 3x3 matrix +
    offsets on (x,y,z) and toff/tscale on t; a singular matrix or
    tscale=0 leaves the op forward-only (reference nulls P->inv*)."""

    proj_name = "affine"
    # the reference applies affine to whatever coordinates flow through
    # (angular, projected or cartesian alike — PJ_IO_UNITS_WHATEVER)
    left = right = "whatever"

    def setup(self) -> None:
        g = self.params.get
        self.off = np.array([float(g("xoff", 0.0)), float(g("yoff", 0.0)),
                             float(g("zoff", 0.0))])
        self.toff = float(g("toff", 0.0))
        self.tscale = float(g("tscale", 1.0))
        self.S = np.array([
            [float(g("s11", 1.0)), float(g("s12", 0.0)),
             float(g("s13", 0.0))],
            [float(g("s21", 0.0)), float(g("s22", 1.0)),
             float(g("s23", 0.0))],
            [float(g("s31", 0.0)), float(g("s32", 0.0)),
             float(g("s33", 1.0))],
        ])
        # adjugate/determinant inverse, exactly as computeReverseParameters
        a, b, c = self.S[0]
        d, e, f = self.S[1]
        gg, h, i = self.S[2]
        det = a * (e * i - f * h) + b * (-(d * i - f * gg)) \
            + c * (d * h - e * gg)
        if det == 0.0 or self.tscale == 0.0:
            self.Sinv = None
        else:
            self.Sinv = np.array([
                [e * i - f * h, -(b * i - c * h), b * f - c * e],
                [-(d * i - f * gg), a * i - c * gg, -(a * f - c * d)],
                [d * h - e * gg, -(a * h - b * gg), a * e - b * d],
            ]) / det

    def fwd4d(self, x, y, z=None, t=None):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        z = np.zeros_like(x) if z is None else np.asarray(z, dtype=np.float64)
        t = np.zeros_like(x) if t is None else np.asarray(t, dtype=np.float64)
        S = self.S
        ox = self.off[0] + S[0, 0] * x + S[0, 1] * y + S[0, 2] * z
        oy = self.off[1] + S[1, 0] * x + S[1, 1] * y + S[1, 2] * z
        oz = self.off[2] + S[2, 0] * x + S[2, 1] * y + S[2, 2] * z
        return ox, oy, oz, self.toff + self.tscale * t

    def inv4d(self, x, y, z=None, t=None):
        if self.Sinv is None:
            raise ValueError("affine: matrix non invertible")
        x = np.asarray(x, dtype=np.float64) - self.off[0]
        y = np.asarray(y, dtype=np.float64) - self.off[1]
        z = (np.zeros_like(x) if z is None
             else np.asarray(z, dtype=np.float64)) - self.off[2]
        t = np.zeros_like(x) if t is None else np.asarray(t, dtype=np.float64)
        R = self.Sinv
        ox = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z
        oy = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z
        oz = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z
        return ox, oy, oz, (t - self.toff) / self.tscale

    def fwd(self, x, y):
        ox, oy, _, _ = self.fwd4d(x, y)
        return ox, oy

    def inv(self, x, y):
        ox, oy, _, _ = self.inv4d(x, y)
        return ox, oy


#: linear units table (subset of the reference's pj_units, src/units.cpp:14-38)
UNITS_TO_METER: dict[str, float] = {
    "km": 1000.0,
    "m": 1.0,
    "dm": 0.1,
    "cm": 0.01,
    "mm": 0.001,
    "kmi": 1852.0,
    "in": 0.0254,
    "ft": 0.3048,
    "yd": 0.9144,
    "mi": 1609.344,
    "fath": 1.8288,
    "ch": 20.1168,
    "link": 0.201168,
    "us-in": 1.0 / 39.37,
    "us-ft": 0.304800609601219,
    "us-yd": 0.914401828803658,
    "us-ch": 20.11684023368047,
    "us-mi": 1609.347218694437,
    "ind-yd": 0.91439523,
    "ind-ft": 0.30479841,
    "ind-ch": 20.11669506,
}


#: angular units (src/units.cpp pj_angular_units[])
ANGULAR_TO_RAD: dict[str, float] = {
    "rad": 1.0,
    "deg": 0.017453292519943296,
    "grad": 0.015707963267948967,
}


class UnitConvert(Operation):
    """Linear/angular/vertical/time unit conversion (+xy_in/+xy_out,
    +z_in/+z_out, +t_in/+t_out — src/conversions/unitconvert.cpp).

    Unit resolution per the reference: named linear unit, named angular
    unit, or a bare numeric factor (zero/infinite factors rejected);
    mixing a linear with an angular unit on one axis pair is an error.
    I/O unit tags become RADIANS only when the respective unit IS the
    radian (unitconvert.cpp:480-495), 'whatever' otherwise."""

    proj_name = "unitconvert"
    left = right = "whatever"

    @staticmethod
    def _factor(v) -> tuple[float, int]:
        """-> (conversion factor, is_linear: 1/0/-1 unknown)."""
        import math as _math
        if isinstance(v, str) and v in UNITS_TO_METER:
            return UNITS_TO_METER[v], 1
        if isinstance(v, str) and v in ANGULAR_TO_RAD:
            return ANGULAR_TO_RAD[v], 0
        f = float(v)
        if f == 0.0 or not _math.isfinite(f) or 1.0 / f == 0.0:
            raise ValueError(f"unitconvert: unknown/degenerate unit {v!r}")
        return f, -1

    def setup(self) -> None:
        fi, li = self._factor(self.params.get("xy_in", "m"))
        fo, lo = self._factor(self.params.get("xy_out", "m"))
        if li >= 0 and lo >= 0 and li != lo:
            raise ValueError("unitconvert: mixing linear and angular units")
        self.f = fi / fo
        zfi, zli = self._factor(self.params.get("z_in", "m"))
        zfo, zlo = self._factor(self.params.get("z_out", "m"))
        if zli >= 0 and zlo >= 0 and zli != zlo:
            raise ValueError("unitconvert: mixing linear and angular units")
        self.fz = zfi / zfo
        # radian-in/out flips the io unit tags (unitconvert.cpp:480-495)
        self.left = ("radians" if self.params.get("xy_in") == "rad"
                     else "whatever")
        self.right = ("radians" if self.params.get("xy_out") == "rad"
                      else "whatever")

    def fwd(self, x, y):
        return np.asarray(x, dtype=np.float64) * self.f, np.asarray(y, dtype=np.float64) * self.f

    def inv(self, x, y):
        return np.asarray(x, dtype=np.float64) / self.f, np.asarray(y, dtype=np.float64) / self.f

    # 3D/4D: vertical (+z_in/+z_out) and time (+t_in/+t_out) units
    # (src/conversions/unitconvert.cpp:102-273)
    def fwd3d(self, x, y, z):
        ox, oy = self.fwd(x, y)
        z = np.zeros_like(ox) if z is None else np.asarray(z, dtype=np.float64)
        return ox, oy, z * self.fz

    def inv3d(self, x, y, z):
        ox, oy = self.inv(x, y)
        z = np.zeros_like(ox) if z is None else np.asarray(z, dtype=np.float64)
        return ox, oy, z / self.fz

    def _time(self, t, inverse: bool):
        t_in = self.params.get("t_in")
        t_out = self.params.get("t_out")
        if t is None or (t_in is None and t_out is None):
            return t
        a = str(t_in or t_out)
        b = str(t_out or t_in)
        if inverse:
            a, b = b, a
        return convert_time(t, a, b)

    def fwd4d(self, x, y, z, t):
        ox, oy, oz = self.fwd3d(x, y, z)
        return ox, oy, oz, self._time(t, False)

    def inv4d(self, x, y, z, t):
        ox, oy, oz = self.inv3d(x, y, z)
        return ox, oy, oz, self._time(t, True)


class AxisSwap(Operation):
    """Reorder / sign-flip 2-4 axes: +order=2,1 / +order=-1,2 /
    +order=1,2,4,3 ... (src/conversions/axisswap.cpp:63); axes beyond
    the listed ones pass through in place."""

    proj_name = "axisswap"
    left = right = "whatever"

    #: +axis= chars -> signed 1-based order token (axisswap.cpp also
    #: accepts the cs2cs-style axis spec as its own parameter)
    _AXIS_TOK = {"e": "1", "w": "-1", "n": "2", "s": "-2",
                 "u": "3", "d": "-3"}

    def setup(self) -> None:
        if "order" in self.params and "axis" in self.params:
            raise ValueError("axisswap: give +order OR +axis, not both")
        if "order" not in self.params and "axis" not in self.params:
            raise ValueError("axisswap: +order or +axis required")
        if "angularunits" in self.params:
            self.left = self.right = "radians"
        if "axis" in self.params:
            spec = str(self.params["axis"])
            order = ",".join(self._AXIS_TOK[ch] for ch in spec)
            self.axes = None   # axis= is OUR parameter, not a modifier
        else:
            order = str(self.params.get("order", "1,2"))
        toks = [t.strip() for t in order.split(",")]
        if not 2 <= len(toks) <= 4:
            raise ValueError(f"axisswap: order needs 2-4 axes, got {order!r}")
        self.idx = [abs(int(t)) - 1 for t in toks]
        if sorted(self.idx) != list(range(len(toks))):
            raise ValueError(f"axisswap: order must list each axis once "
                             f"({order!r})")
        self.sgn = [-1.0 if t.startswith("-") else 1.0 for t in toks]

    def fwd(self, x, y):
        if any(j >= 2 for j in self.idx[:2]):
            raise NotImplementedError("axisswap touching z/t needs fwd4d")
        cols = [np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)]
        return self.sgn[0] * cols[self.idx[0]], self.sgn[1] * cols[self.idx[1]]

    def inv(self, x, y):
        if any(j >= 2 for j in self.idx[:2]):
            raise NotImplementedError("axisswap touching z/t needs inv4d")
        ins = [np.asarray(x, dtype=np.float64) * self.sgn[0],
               np.asarray(y, dtype=np.float64) * self.sgn[1]]
        out = [None, None]
        out[self.idx[0]] = ins[0]
        out[self.idx[1]] = ins[1]
        return out[0], out[1]

    def fwd4d(self, x, y, z, t):
        c = [np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64),
             np.zeros_like(np.asarray(x, dtype=np.float64)) if z is None
             else np.asarray(z, dtype=np.float64),
             np.zeros_like(np.asarray(x, dtype=np.float64)) if t is None
             else np.asarray(t, dtype=np.float64)]
        out = list(c)
        for i, (j, s) in enumerate(zip(self.idx, self.sgn)):
            out[i] = s * c[j]
        return tuple(out)

    def inv4d(self, x, y, z, t):
        c = [np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64),
             np.zeros_like(np.asarray(x, dtype=np.float64)) if z is None
             else np.asarray(z, dtype=np.float64),
             np.zeros_like(np.asarray(x, dtype=np.float64)) if t is None
             else np.asarray(t, dtype=np.float64)]
        out = list(c)
        for i, (j, s) in enumerate(zip(self.idx, self.sgn)):
            out[j] = s * c[i]
        return tuple(out)


# ---------------------------------------------------------------------------
# time-unit conversions (src/conversions/unitconvert.cpp:102-260)
# ---------------------------------------------------------------------------

def _leaps_through(year):
    """Number of leap years in [1, year]."""
    y = np.asarray(year, dtype=np.int64)
    return y // 4 - y // 100 + y // 400


def _is_leap(year):
    y = np.asarray(year, dtype=np.int64)
    return ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)


def _days_in_year(year):
    return np.where(_is_leap(year), 366, 365)


_CUMDAYS = np.array([0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334])


def decimalyear_to_mjd(dy):
    """Decimal year -> modified julian date (reference :159-183)."""
    dy = np.asarray(dy, dtype=np.float64)
    year = np.floor(dy).astype(np.int64)
    frac = dy - year
    mjd = (year - 1859) * 365.0 + 14 + 31
    mjd = mjd + frac * _days_in_year(year)
    mjd = mjd + (_leaps_through(year - 1) - _leaps_through(1858))
    return np.where((dy < -10000) | (dy > 10000), 0.0, mjd)


def mjd_to_decimalyear(mjd):
    """Modified julian date -> decimal year (reference :186-205)."""
    mjd = np.asarray(mjd, dtype=np.float64)
    year = (1859 + (mjd - 45.0) / 365.2425).astype(np.int64)
    for _ in range(3):  # settle the year boundary
        start = ((year - 1859) * 365.0 + 45
                 + (_leaps_through(year - 1) - _leaps_through(1858)))
        year = np.where(mjd < start, year - 1, year)
        end = ((year - 1858) * 365.0 + 45
               + (_leaps_through(year) - _leaps_through(1858)))
        year = np.where(mjd >= end, year + 1, year)
    start = ((year - 1859) * 365.0 + 45
             + (_leaps_through(year - 1) - _leaps_through(1858)))
    return year + (mjd - start) / _days_in_year(year)


def gps_week_to_mjd(w):
    return 44244.0 + np.asarray(w, dtype=np.float64) * 7.0


def mjd_to_gps_week(mjd):
    return (np.asarray(mjd, dtype=np.float64) - 44244.0) / 7.0


def yyyymmdd_to_mjd(v):
    v = np.asarray(v, dtype=np.float64)
    year = np.floor(v / 10000).astype(np.int64)
    month = np.floor((v - year * 10000) / 100).astype(np.int64)
    day = np.floor(v - year * 10000 - month * 100).astype(np.int64)
    m = np.clip(month, 1, 12)
    doy = _CUMDAYS[m - 1] + np.where(_is_leap(year) & (m > 2), 1, 0) + day
    total = doy + (year - 1859) * 365.0 \
        + (_leaps_through(year - 1) - _leaps_through(1858))
    return total + 13 + 31


def mjd_to_yyyymmdd(mjd):
    mjd = np.asarray(mjd, dtype=np.float64)
    dy = mjd_to_decimalyear(mjd)
    year = np.floor(dy).astype(np.int64)
    start = ((year - 1859) * 365.0 + 45
             + (_leaps_through(year - 1) - _leaps_through(1858)))
    doy = np.floor(mjd - start).astype(np.int64)  # 0-based day of year
    leap_adj = np.where(_is_leap(year), 1, 0)
    cum = np.concatenate([_CUMDAYS, [365]])
    month = np.zeros_like(year)
    day = np.zeros_like(year)
    for mo in range(1, 13):
        lo = _CUMDAYS[mo - 1] + (leap_adj if mo > 2 else 0)
        hi = (cum[mo] + (leap_adj if mo >= 2 else 0))
        sel = (doy >= lo) & (doy < hi)
        month = np.where(sel, mo, month)
        day = np.where(sel, doy - lo + 1, day)
    return year * 10000.0 + month * 100.0 + day


TIME_UNITS = {
    "mjd": (lambda t: np.asarray(t, dtype=np.float64),
            lambda t: np.asarray(t, dtype=np.float64)),
    "decimalyear": (decimalyear_to_mjd, mjd_to_decimalyear),
    "gps_week": (gps_week_to_mjd, mjd_to_gps_week),
    "yyyymmdd": (yyyymmdd_to_mjd, mjd_to_yyyymmdd),
}


def convert_time(t, t_in: str, t_out: str):
    """Convert a time column between the reference's time units."""
    if t_in not in TIME_UNITS or t_out not in TIME_UNITS:
        raise ValueError(f"unknown time unit: {t_in!r} / {t_out!r}")
    to_mjd, _ = TIME_UNITS[t_in]
    _, from_mjd = TIME_UNITS[t_out]
    return from_mjd(to_mjd(t))
