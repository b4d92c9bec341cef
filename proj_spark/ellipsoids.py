"""Ellipsoid registry and derived-constant computation.

Mirrors the semantics of the reference's ellipsoid table and setup
(`src/ellps.cpp:9`, `pj_calc_ellipsoid_params` called from
`src/init.cpp:681`): given (a, rf|b|es|f), precompute every derived
constant the projection kernels need.  All values are public geodetic
constants (EPSG / Snyder).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


# name -> (a, shape_key, shape_value)   shape_key in {"rf", "b", "es"}
# Public ellipsoid constants, same set as the reference's pj_ellps table
# (src/ellps.cpp:9) — these are standard EPSG values.
ELLIPSOIDS: dict[str, tuple[float, str, float]] = {
    "GRS80": (6378137.0, "rf", 298.257222101),
    "WGS84": (6378137.0, "rf", 298.257223563),
    "WGS72": (6378135.0, "rf", 298.26),
    "WGS66": (6378145.0, "rf", 298.25),
    "WGS60": (6378165.0, "rf", 298.3),
    "intl": (6378388.0, "rf", 297.0),
    "bessel": (6377397.155, "rf", 299.1528128),
    "clrk66": (6378206.4, "b", 6356583.8),
    "clrk80": (6378249.145, "rf", 293.465006),
    "clrk80ign": (6378249.2, "rf", 293.4660212936269),
    "airy": (6377563.396, "rf", 299.3249646),
    "mod_airy": (6377340.189, "b", 6356034.446),
    "krass": (6378245.0, "rf", 298.3),
    "evrst30": (6377276.345, "rf", 300.8017),
    "aust_SA": (6378160.0, "rf", 298.25),
    "GRS67": (6378160.0, "rf", 298.247167427),
    "helmert": (6378200.0, "rf", 298.3),
    "hough": (6378270.0, "rf", 297.0),
    "fschr60": (6378166.0, "rf", 298.3),
    "sphere": (6370997.0, "b", 6370997.0),
}


@dataclass(frozen=True)
class Ellipsoid:
    """Immutable ellipsoid with every derived constant precomputed once
    (plan-time), exactly as the reference does at operator setup.
    """

    a: float
    es: float
    name: str = "custom"
    # derived, filled in __post_init__
    e: float = field(init=False)
    b: float = field(init=False)
    f: float = field(init=False)
    n: float = field(init=False)
    one_es: float = field(init=False)
    rone_es: float = field(init=False)
    ra: float = field(init=False)
    e2s: float = field(init=False)

    def __post_init__(self) -> None:
        one_es = 1.0 - self.es
        b = self.a * math.sqrt(one_es)
        f = 1.0 - math.sqrt(one_es)
        object.__setattr__(self, "e", math.sqrt(self.es))
        object.__setattr__(self, "b", b)
        object.__setattr__(self, "f", f)
        object.__setattr__(self, "n", f / (2.0 - f) if f != 0 else 0.0)
        object.__setattr__(self, "one_es", one_es)
        object.__setattr__(self, "rone_es", 1.0 / one_es)
        object.__setattr__(self, "ra", 1.0 / self.a)
        # second eccentricity squared: es / (1 - es)
        object.__setattr__(self, "e2s", self.es / one_es)

    @property
    def is_sphere(self) -> bool:
        return self.es == 0.0


def _from_a_rf(a: float, rf: float, name: str) -> Ellipsoid:
    f = 1.0 / rf
    es = 2.0 * f - f * f
    return Ellipsoid(a=a, es=es, name=name)


def _from_a_b(a: float, b: float, name: str) -> Ellipsoid:
    es = 1.0 - (b * b) / (a * a)
    return Ellipsoid(a=a, es=es, name=name)


def get_ellipsoid(name: str) -> Ellipsoid:
    a, key, val = ELLIPSOIDS[name]
    if key == "rf":
        return _from_a_rf(a, val, name)
    if key == "b":
        return _from_a_b(a, val, name)
    return Ellipsoid(a=a, es=val, name=name)


def ellipsoid_from_params(params: dict) -> Ellipsoid:
    """Resolve the ellipsoid from proj-string params, mirroring the full
    resolution order of the reference's pj_ellipsoid (src/ell_set.cpp):

      1. +ellps name sets base size+shape (unknown name -> error);
      2. size: +R (forces a sphere) else +a override;
      3. shape override in the reference's check order
         rf > f > es > e > b, with its validation rules (rf != 0,
         f < 1, 0 <= es < 1, 0 <= e < 1, b > 0);
      4. spherification flags R_A / R_V / R_a / R_g / R_h /
         R_lat_a=phi / R_lat_g=phi (src/ell_set.cpp:325-420);
      5. default GRS80 when nothing is given.
    """
    a = None
    es = 0.0
    name = "custom"
    if "ellps" in params:
        ell = get_ellipsoid(str(params["ellps"]))   # KeyError if unknown
        a, es, name = ell.a, ell.es, ell.name
    elif "datum" in params and params["datum"] == "WGS84":
        ell = get_ellipsoid("WGS84")
        a, es, name = ell.a, ell.es, ell.name

    # size (ellps_size: R wins over a; value must be finite positive)
    is_sphere_forced = False
    if "R" in params:
        a = float(params["R"])
        es = 0.0
        is_sphere_forced = True
        name = "sphere"
    elif "a" in params:
        a = float(params["a"])
    if a is not None and (not math.isfinite(a) or a <= 0):
        raise ValueError("major axis not given or invalid")

    # shape (ellps_shape check order), unless R forced a sphere
    if not is_sphere_forced:
        shape_key = next((k for k in ("rf", "f", "es", "e", "b")
                          if k in params), None)
        if shape_key is None:
            if a is None:
                ell = get_ellipsoid("GRS80")   # reference default
                a, es, name = ell.a, ell.es, ell.name
        else:
            if a is None:
                raise ValueError("major axis not given")
            v = float(params[shape_key])
            if not math.isfinite(v):
                raise ValueError("invalid ellipsoid shape argument")
            if shape_key == "rf":
                if v == 0:
                    raise ValueError("reverse flattening is zero")
                f = 1.0 / v
                es = 2 * f - f * f
            elif shape_key == "f":
                if v >= 1.0:
                    raise ValueError("invalid flattening")
                es = 2 * v - v * v
            elif shape_key == "es":
                if v >= 1.0:
                    raise ValueError("invalid eccentricity")
                es = v
            elif shape_key == "e":
                if v < 0 or v >= 1.0:
                    raise ValueError("invalid eccentricity")
                es = v * v
            else:  # b
                if v <= 0:
                    raise ValueError("invalid semiminor axis")
                f = (a - v) / a
                es = 2 * f - f * f
            if es < 0:
                raise ValueError("es less than zero")
            name = "custom"
    elif a is None:
        ell = get_ellipsoid("GRS80")
        a, es, name = ell.a, ell.es, ell.name

    # spherification (ellps_spherification)
    spher = next((k for k in ("R_A", "R_V", "R_a", "R_g", "R_h",
                              "R_lat_a", "R_lat_g") if k in params), None)
    if spher is not None and not is_sphere_forced:
        SIXTH, RA4, RA6 = 1 / 6.0, 17 / 360.0, 67 / 3024.0
        RV4, RV6 = 5 / 72.0, 55 / 1296.0
        b = a * math.sqrt(max(1.0 - es, 0.0))
        if spher == "R_A":
            a *= 1.0 - es * (SIXTH + es * (RA4 + es * RA6))
        elif spher == "R_V":
            a *= 1.0 - es * (SIXTH + es * (RV4 + es * RV6))
        elif spher == "R_a":
            a = (a + b) / 2.0
        elif spher == "R_g":
            a = math.sqrt(a * b)
        elif spher == "R_h":
            if a + b == 0:
                raise ValueError("tolerance condition")
            a = (2.0 * a * b) / (a + b)
        else:
            phi = math.radians(float(params[spher]))
            if abs(phi) > math.pi / 2 + 1e-15:
                raise ValueError("reference latitude larger than 90")
            t = 1.0 - es * math.sin(phi) ** 2
            if t == 0.0:
                raise ValueError("invalid eccentricity")
            if spher == "R_lat_a":
                a *= (1.0 - es + t) / (2.0 * t * math.sqrt(t))
            else:
                a *= math.sqrt(1.0 - es) / t
        if not math.isfinite(a) or a <= 0:
            raise ValueError("major axis not given or invalid")
        es = 0.0
        name = "sphere"
    return Ellipsoid(a=a, es=es, name=name)
