"""cs2cs-emulation modifiers: +towgs84 / +datum / +pm / +units / +to_meter /
+axis / +lon_wrap / +geoc attachment for any operation.

Mirrors the reference's cs2cs_emulation_setup (src/4D_api.cpp:560-696) and
the prepare/finalize hooks that consume the resulting sub-operations
(src/fwd.cpp:41-154, src/inv.cpp:39-143):

  forward  (angular in):  geoc -> wrap -> [datum chain INTO the local
           frame: cart_wgs84 fwd -> helmert inv -> cart inv] ->
           lam -= pm + lam0 -> kernel -> finalize (unit scale, axis)
  inverse:  axis -> de-scale/de-offset -> kernel -> lam += pm + lam0 ->
           [datum chain TO WGS84: cart fwd -> helmert fwd ->
           cart_wgs84 inv] -> geoc

The tables below vendor the reference's public datum and prime-meridian
registries (src/datums.cpp:41-76) and its DMS notation (src/dmstor.cpp).
"""

from __future__ import annotations

import re

import numpy as np

#: src/datums.cpp:41 pj_datums[] — datum id -> (definition, ellps)
PJ_DATUMS: dict[str, tuple[str, str]] = {
    "WGS84": ("towgs84=0,0,0", "WGS84"),
    "GGRS87": ("towgs84=-199.87,74.79,246.62", "GRS80"),
    "NAD83": ("towgs84=0,0,0", "GRS80"),
    "NAD27": ("nadgrids=@conus,@alaska,@ntv2_0.gsb,@ntv1_can.dat", "clrk66"),
    "potsdam": ("nadgrids=@BETA2007.gsb", "bessel"),
    "carthage": ("towgs84=-263.0,6.0,431.0", "clrk80ign"),
    "hermannskogel": ("towgs84=577.326,90.129,463.919,5.137,1.474,5.297,2.4232",
                      "bessel"),
    "ire65": ("towgs84=482.530,-130.596,564.557,-1.042,-0.214,-0.631,8.15",
              "mod_airy"),
    "nzgd49": ("towgs84=59.47,-5.04,187.44,0.47,-0.1,1.024,-4.5993", "intl"),
    "OSGB36": ("towgs84=446.448,-125.157,542.060,0.1502,0.2470,0.8421,-20.4894",
               "airy"),
}

#: src/datums.cpp:76 pj_prime_meridians[] — name -> DMS definition
PRIME_MERIDIANS: dict[str, str] = {
    "greenwich": "0dE",
    "lisbon": "9d07'54.862\"W",
    "paris": "2d20'14.025\"E",
    "bogota": "74d04'51.3\"W",
    "madrid": "3d41'16.58\"W",
    "rome": "12d27'8.4\"E",
    "bern": "7d26'22.5\"E",
    "jakarta": "106d48'27.79\"E",
    "ferro": "17d40'W",
    "brussels": "4d22'4.71\"E",
    "stockholm": "18d3'29.8\"E",
    "athens": "23d42'58.815\"E",
    "oslo": "10d43'22.5\"E",
    "copenhagen": "12d34'40.35\"E",
}

_DMS_FIELD = re.compile(r"(\d+(?:\.\d*)?)([d'\"]?)")

#: unit suffix -> degrees factor, and which unit an unsuffixed NEXT
#: field means (proj_dmstor's positional fallback: 17d40 = 17deg 40min)
_DMS_FACTOR = {"d": 1.0, "'": 1.0 / 60.0, '"': 1.0 / 3600.0}
_DMS_NEXT = {"d": "'", "'": '"', '"': None}


def dms_to_deg(s: str) -> float:
    """Parse PROJ DMS notation ('2d20'14.025\"E', '17d40'W',
    '-36d52'11.6315', '-3.5') to decimal degrees — the engine analogue
    of proj_dmstor (src/dmstor.cpp): numeric fields carry their unit
    suffix, an unsuffixed field takes the next-finer unit than the one
    before it (so a bare trailing number after ' is seconds)."""
    try:
        return float(s)
    except ValueError:
        pass
    t = s.strip()
    neg = False
    if t[:1] in "+-":
        neg = t[0] == "-"
        t = t[1:]
    hemi = ""
    if t[-1:] in "NSEWnsew":
        hemi = t[-1]
        t = t[:-1].rstrip()
    pos = 0
    val = 0.0
    next_unit: str | None = "d"
    seen = False
    while pos < len(t):
        m = _DMS_FIELD.match(t, pos)
        if m is None:
            raise ValueError(f"unparseable angle {s!r}")
        num, suf = m.groups()
        unit = suf or next_unit
        if unit is None:
            raise ValueError(f"unparseable angle {s!r}")
        val += float(num) * _DMS_FACTOR[unit]
        next_unit = _DMS_NEXT[unit]
        pos = m.end()
        seen = True
    if not seen:
        raise ValueError(f"unparseable angle {s!r}")
    if neg:
        val = -val
    if hemi.upper() in ("W", "S"):
        val = -val
    return val


def parse_pm(value) -> float:
    """+pm= value (named meridian or angle) -> radians east of Greenwich."""
    s = str(value)
    if s in PRIME_MERIDIANS:
        s = PRIME_MERIDIANS[s]
    return np.radians(dms_to_deg(s))


def parse_to_meter(value) -> float:
    """+to_meter= value; supports the reference's '1/x' ratio notation."""
    s = str(value)
    if "/" in s:
        num, den = s.split("/", 1)
        return float(num) / float(den)
    return float(s)


AXIS_COMP = {"e": (0, 1.0), "w": (0, -1.0), "n": (1, 1.0), "s": (1, -1.0),
             "u": (2, 1.0), "d": (2, -1.0)}


def parse_axis(spec: str) -> list[tuple[int, float]]:
    """+axis=neu -> [(component, sign), ...]; validated like the reference
    (each of e/w, n/s, u/d axes exactly once)."""
    if len(spec) != 3:
        raise ValueError(f"+axis={spec!r}: need exactly 3 characters")
    out = []
    seen = set()
    for ch in spec:
        if ch not in AXIS_COMP:
            raise ValueError(f"+axis={spec!r}: unknown axis {ch!r}")
        comp, sign = AXIS_COMP[ch]
        if comp in seen:
            raise ValueError(f"+axis={spec!r}: duplicated axis")
        seen.add(comp)
        out.append((comp, sign))
    return out


def axis_fwd(axes, x, y, z):
    """Apply +axis output ordering to an (x, y, z) triple (fwd finalize)."""
    comps = [x, y, z]
    return tuple(sign * comps[comp] for comp, sign in axes)


def axis_inv(axes, x, y, z):
    """Undo +axis ordering on input (inv prepare)."""
    given = [x, y, z]
    comps = [None, None, None]
    for i, (comp, sign) in enumerate(axes):
        comps[comp] = sign * given[i]
    return tuple(comps)


def parse_towgs84(value) -> list[float]:
    vals = [float(v) for v in str(value).split(",")]
    if len(vals) == 3:
        vals = vals + [0.0, 0.0, 0.0, 0.0]
    if len(vals) != 7:
        raise ValueError(f"+towgs84 needs 3 or 7 values, got {len(vals)}")
    return vals


class DatumChain:
    """The cs2cs datum emulation chain: cart(local) / helmert / cart(WGS84).

    Built exactly as the reference does (src/4D_api.cpp:629-693): a
    position-vector exact-rotation Helmert from the +towgs84 values, plus
    geodetic<->cartesian hops on the operation's ORIGINAL ellipsoid and on
    WGS84.  A null shift (towgs84=0,0,0) still changes ellipsoid when the
    operation's ellipsoid is not WGS84 (do_cart path, src/4D_api.cpp:638-645).
    """

    def __init__(self, a_orig: float, es_orig: float,
                 towgs84: list[float] | None, approx: bool = False):
        from proj_spark.operations.cart import Cart
        from proj_spark.operations.helmert import Helmert
        null_shift = towgs84 is None or all(v == 0.0 for v in towgs84)
        wgs84_ellps = (abs(a_orig - 6378137.0) < 1e-8
                       and abs(es_orig - 0.0066943799901413) < 1e-15)
        self.active = not (null_shift and wgs84_ellps)
        if not self.active:
            return
        self.cart = Cart({"a": repr(a_orig), "es": repr(es_orig)})
        self.cart_wgs84 = Cart({"ellps": "WGS84"})
        self.helmert = None
        if towgs84 is not None and not all(v == 0.0 for v in towgs84):
            x, y, z, rx, ry, rz, s = towgs84
            # +towgs84 cs2cs emulation runs `proj=helmert exact`
            # (src/4D_api.cpp:653); catalog/database-derived operations
            # run helmert WITHOUT exact (the approximate small-angle
            # matrix) — tv_out.dist's MGI segment is printf-sensitive
            # to the second-order difference (~4 mm at 5" rotations)
            hp = {"x": x, "y": y, "z": z, "rx": rx, "ry": ry, "rz": rz,
                  "s": s, "convention": "position_vector"}
            if not approx:
                hp["exact"] = True
            self.helmert = Helmert(hp)

    def wgs84_to_local(self, lam, phi, z):
        """fwd_prepare chain (src/fwd.cpp:76-81)."""
        X, Y, Z = self.cart_wgs84.fwd3d(lam, phi, z)
        if self.helmert is not None:
            X, Y, Z = self.helmert.inv(X, Y, Z)
        return self.cart.inv3d(X, Y, Z)

    def local_to_wgs84(self, lam, phi, z):
        """inv_finalize chain (src/inv.cpp:116-121)."""
        X, Y, Z = self.cart.fwd3d(lam, phi, z)
        if self.helmert is not None:
            X, Y, Z = self.helmert.fwd(X, Y, Z)
        return self.cart_wgs84.inv3d(X, Y, Z)


# ---------------------------------------------------------------------------
# DMS output (rtodms port)
# ---------------------------------------------------------------------------

def rtodms(r: float, pos: str, neg: str, fract: int = 3,
           con_w: bool = False) -> str:
    """Radians -> the reference's DMS ascii form (src/rtodms.cpp):
    DDdMM'SS.SSS"H with zero seconds/minutes fields dropped from the
    right and trailing zeros trimmed off the seconds fraction — the
    exact cs2cs default output the test/cli golden files record.
    `fract` is the seconds precision (set_rtodms; cs2cs -w); `con_w`
    selects the constant-width form (-W: zero-padded fields, no
    trimming)."""
    import math as _m
    res = 10.0 ** fract
    conv = 180.0 * 3600.0 * res / _m.pi
    if r < 0:
        r = -r
        sign = neg
    else:
        sign = pos
    r = _m.floor(r * conv + 0.5)
    sec = _m.fmod(r / res, 60.0)
    r = _m.floor(r / (res * 60.0))
    mnt = int(_m.fmod(r, 60.0))
    deg = int(_m.floor(r / 60.0))
    if con_w:
        width = fract + 2 + (1 if fract else 0)
        return f"{deg}d{mnt:02d}'{sec:0{width}.{fract}f}\"{sign}"
    if sec != 0.0:
        s = f"{sec:.{fract}f}".rstrip("0").rstrip(".")
        return f"{deg}d{mnt}'{s}\"{sign}"
    if mnt:
        return f"{deg}d{mnt}'{sign}"
    return f"{deg}d{sign}"
