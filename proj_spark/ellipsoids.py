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
    """Resolve ellipsoid from proj-string params, mirroring the resolution
    order of the reference's pj_ellipsoid (src/ell_set.cpp:24):
    +ellps name, or explicit +a with +b/+rf/+f/+es, or +R (sphere),
    defaulting to GRS80 when nothing is given.
    """
    if "R" in params:
        r = float(params["R"])
        return Ellipsoid(a=r, es=0.0, name="sphere")
    if "a" in params:
        a = float(params["a"])
        if "b" in params:
            return _from_a_b(a, float(params["b"]), "custom")
        if "rf" in params:
            return _from_a_rf(a, float(params["rf"]), "custom")
        if "f" in params:
            f = float(params["f"])
            return Ellipsoid(a=a, es=2 * f - f * f, name="custom")
        if "es" in params:
            return Ellipsoid(a=a, es=float(params["es"]), name="custom")
        return Ellipsoid(a=a, es=0.0, name="sphere")
    if "ellps" in params:
        return get_ellipsoid(str(params["ellps"]))
    if "datum" in params and params["datum"] == "WGS84":
        return get_ellipsoid("WGS84")
    # reference default ellipsoid is GRS80 (src/ell_set.cpp)
    return get_ellipsoid("GRS80")
