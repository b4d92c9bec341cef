"""+proj string parsing, operator registry, and pipeline composition.

Mirrors the reference's plan construction path (src/init.cpp:535-693,
src/pipeline.cpp): tokenize '+key=value' pairs, locate the constructor in
the registry, let the constructor precompute its plan-time constants.
A pipeline composes +step sub-operations; forward runs steps 1..n,
inverse runs n..1 each inverted (src/pipeline.cpp:166-192).
"""

from __future__ import annotations

import numpy as np


def parse_projstring(s: str) -> dict:
    """'+proj=utm +zone=32 +south' -> {'proj': 'utm', 'zone': '32', 'south': True}."""
    params: dict = {}
    for tok in s.split():
        tok = tok.lstrip("+")
        if not tok:
            continue
        if "=" in tok:
            k, v = tok.split("=", 1)
            params[k] = v
        else:
            params[tok] = True
    return params


def _registry() -> dict:
    from proj_spark.operations.tmerc import TMerc, TMercExact, UTM
    from proj_spark.operations.merc import Merc, WebMerc
    from proj_spark.operations.lcc import LCC
    from proj_spark.operations.aea import AEA, LEAC
    from proj_spark.operations.cart import Cart
    from proj_spark.operations.helmert import Helmert
    from proj_spark.operations.simple import (
        LatLong, Eqc, Cea, Gall, Mill,
        GeocentricLat, Affine, GeogOffset, UnitConvert, AxisSwap, Noop,
    )

    reg = {
        "tmerc": TMerc,
        "etmerc": TMercExact,
        "utm": UTM,
        "merc": Merc,
        "webmerc": WebMerc,
        "lcc": LCC,
        "aea": AEA,
        "leac": LEAC,
        "cart": Cart,
        "helmert": Helmert,
        "latlong": LatLong, "longlat": LatLong, "latlon": LatLong, "lonlat": LatLong,
        "eqc": Eqc, "cea": Cea, "gall": Gall, "mill": Mill,
        "geoc": GeocentricLat, "affine": Affine, "geogoffset": GeogOffset,
        "unitconvert": UnitConvert, "axisswap": AxisSwap, "noop": Noop,
    }
    import importlib
    for modname in ("azimuthal", "pseudocyl", "conic", "misc", "special",
                    "dggs", "datum"):
        try:
            mod = importlib.import_module(f"proj_spark.operations.{modname}")
        except ImportError:
            continue
        reg.update(getattr(mod, "REGISTRY", {}))
    return reg


def create(definition: str):
    """Compile a proj-string into an executable Operation or Pipeline."""
    params = parse_projstring(definition)
    # the *first* +proj= names the operation (later ones belong to +steps)
    name = None
    for tok in definition.split():
        tok = tok.lstrip("+")
        if tok.startswith("proj="):
            name = tok.split("=", 1)[1]
            break
    if name is None:
        raise ValueError(f"no +proj= in {definition!r}")
    params["proj"] = name
    if name == "pipeline":
        return Pipeline.from_string(definition)
    reg = _registry()
    if name not in reg:
        raise NotImplementedError(f"operation {name!r} not implemented")
    return reg[name](params)


class Pipeline:
    """Composition of +step operations; fwd applies steps left-to-right."""

    def __init__(self, steps: list, inverted: list[bool]):
        self.steps = steps
        self.inverted = inverted

    @classmethod
    def from_string(cls, definition: str) -> "Pipeline":
        # split on '+step'; the leading segment holds global params
        segments = definition.replace("step", "\x00step").split("\x00")
        global_params = parse_projstring(segments[0].replace("+proj=pipeline", ""))
        global_params.pop("proj", None)
        steps, inverted = [], []
        for seg in segments[1:]:
            seg = seg.strip()
            if seg.startswith("step"):
                seg = seg[4:]
            p = parse_projstring(seg)
            inv = bool(p.pop("inv", False))
            merged = {**global_params, **p}
            name = merged.get("proj")
            if name == "pipeline":
                raise ValueError("nested pipelines are not allowed")
            reg = _registry()
            steps.append(reg[name](merged))
            inverted.append(inv)
        return cls(steps, inverted)

    def fwd(self, lam, phi):
        x, y = np.asarray(lam, dtype=np.float64), np.asarray(phi, dtype=np.float64)
        for op, inv in zip(self.steps, self.inverted):
            x, y = (op.inv(x, y) if inv else op.fwd(x, y))
        return x, y

    def inv(self, x, y):
        x, y = np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
        for op, inv in zip(reversed(self.steps), reversed(self.inverted)):
            x, y = (op.fwd(x, y) if inv else op.inv(x, y))
        return x, y

    def fwd_deg(self, lon, lat):
        return self.fwd(np.radians(np.asarray(lon, dtype=np.float64)),
                        np.radians(np.asarray(lat, dtype=np.float64)))

    def inv_deg(self, x, y):
        lam, phi = self.inv(x, y)
        return np.degrees(lam), np.degrees(phi)
