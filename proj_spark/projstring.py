"""+proj string parsing, operator registry, and pipeline composition.

Mirrors the reference's plan construction path (src/init.cpp:535-693,
src/pipeline.cpp): tokenize '+key=value' pairs, locate the constructor in
the registry, let the constructor precompute its plan-time constants.
A pipeline composes +step sub-operations; forward runs steps 1..n,
inverse runs n..1 each inverted (src/pipeline.cpp:166-192).
"""

from __future__ import annotations

import numpy as np


def _tokenize_projstring(s: str) -> list[str]:
    """Whitespace split honoring double-quoted segments with "" as an
    escaped quote — the reference's pj_trim_argc/argv quoting
    (src/utils.cpp; test/cli/testdatumfile passes
    +nadgrids="./dir with "" space/myconus")."""
    if '"' not in s:
        return s.split()
    toks, cur, inq = [], [], False
    i = 0
    while i < len(s):
        c = s[i]
        if c == '"':
            if inq and i + 1 < len(s) and s[i + 1] == '"':
                cur.append('"')
                i += 2
                continue
            inq = not inq
            i += 1
            continue
        if c.isspace() and not inq:
            if cur:
                toks.append("".join(cur))
                cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    if cur:
        toks.append("".join(cur))
    return toks


def parse_projstring(s: str) -> dict:
    """'+proj=utm +zone=32 +south' -> {'proj': 'utm', 'zone': '32', 'south': True}."""
    params: dict = {}
    for tok in _tokenize_projstring(s):
        tok = tok.lstrip("+")
        if not tok:
            continue
        if "=" in tok:
            k, v = tok.split("=", 1)
            # the reference's pj_param scans the parameter list from the
            # start, so the FIRST occurrence of a duplicated key wins
            # (4D-API_cs2cs-style.gie:372 depends on this)
            params.setdefault(k, v)
        else:
            params.setdefault(tok, True)
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
        "geocent": Cart,
        "helmert": Helmert,
        "latlong": LatLong, "longlat": LatLong, "latlon": LatLong, "lonlat": LatLong,
        "eqc": Eqc, "cea": Cea, "gall": Gall, "mill": Mill,
        "geoc": GeocentricLat, "affine": Affine, "geogoffset": GeogOffset,
        "unitconvert": UnitConvert, "axisswap": AxisSwap, "noop": Noop,
    }
    import importlib
    for modname in ("azimuthal", "pseudocyl", "conic", "misc", "special",
                    "dggs", "datum", "extensions"):
        try:
            mod = importlib.import_module(f"proj_spark.operations.{modname}")
        except ImportError:
            continue
        reg.update(getattr(mod, "REGISTRY", {}))
    return reg


def _load_init_file_entry(fname: str, code: str) -> dict:
    """Classic proj init-file entry (src/init.cpp pj_init_ctx file
    scan): entries start at '<code>' and end at '<>'; tokens are
    proj params without the '+' prefix.  The files themselves are the
    reference's public data files (data/nad27, nad83, GL27, world),
    vendored under proj_spark/data/init/."""
    import importlib.resources
    try:
        text = (importlib.resources.files("proj_spark.data")
                .joinpath("init").joinpath(fname).read_text())
    except (FileNotFoundError, ModuleNotFoundError):
        raise NotImplementedError(
            f"+init file {fname!r} not vendored (have: nad27, nad83, "
            f"GL27, world, epsg)")
    tag = f"<{code}>"
    collecting = False
    toks: list[str] = []
    for line in text.splitlines():
        line = line.split("#", 1)[0]
        if not collecting:
            i = line.find(tag)
            if i < 0:
                continue
            collecting = True
            line = line[i + len(tag):]
        end = line.find("<>")
        if end >= 0:
            toks += line[:end].split()
            return parse_projstring(
                " ".join("+" + t if not t.startswith("+") else t
                         for t in toks))
        toks += line.split()
    raise NotImplementedError(f"init entry {fname}:{code} not found")


def _expand_init(params: dict) -> dict:
    """+init=FILE:CODE expansion (src/init.cpp:599-612 under proj4 init
    rules): the init definition's params, overridden by explicit ones.
    FILE 'epsg' resolves through the vendored EPSG catalog; other names
    read the vendored classic init files (nad27/nad83/GL27/world)."""
    init = params.pop("init", None)
    if init is None:
        return params
    s = str(init)
    fname, _, code = s.partition(":")
    # tolerate full paths ('.../data/nad27:5001' as the reference CLI
    # scripts pass them): only the basename names the vendored file
    import os as _os
    fname = _os.path.basename(fname)
    if not code or fname.lower() == "epsg":
        from proj_spark import epsg
        base = parse_projstring(epsg.resolve(code or s))
    elif fname.upper() in ("IGNF", "ESRI"):
        # PROJ 6 routes +init=AUTH:CODE through the database before
        # falling back to legacy files (src/init.cpp:599 pj_init_ctx ->
        # createFromUserInput): IGNF/ESRI resolve via the vendored
        # authority catalog (test/cli/testIGNF exercises this path)
        from proj_spark import epsg
        base = parse_projstring(epsg.resolve(f"{fname.upper()}:{code}"))
    else:
        base = _load_init_file_entry(fname, code)
    base.update(params)
    return base


def create(definition: str):
    """Compile a proj-string (or 'EPSG:nnnn' code) into an executable
    Operation or Pipeline."""
    if definition.strip().upper().startswith(("EPSG:", "ESRI:", "IGNF:",
                                              "URN:")):
        from proj_spark import epsg
        definition = epsg.resolve(definition.strip())
    elif not definition.lstrip().startswith("+"):
        # WKT1/WKT2/PROJJSON input (createFromUserInput dispatch,
        # src/iso19111/io.cpp:5611): lower to a proj-string first
        head = definition.strip()[:12].upper()
        if head.startswith(("{", "PROJCS", "GEOGCS", "PROJCRS", "GEOGCRS",
                            "GEODCRS", "PROJECTEDCRS", "COMPOUNDCRS",
                            "COMPD_CS", "BOUNDCRS", "VERTCRS", "VERT_CS")):
            from proj_spark import wkt
            definition = wkt.from_user_input(definition)
    params = parse_projstring(definition)
    # the *first* +proj= names the operation (later ones belong to +steps)
    name = None
    for tok in definition.split():
        tok = tok.lstrip("+")
        if tok.startswith("proj="):
            name = tok.split("=", 1)[1]
            break
    if name is None and "init" in params:
        params = _expand_init(params)
        name = params.get("proj")
    if name is None:
        raise ValueError(f"no +proj= in {definition!r}")
    params["proj"] = name
    if name == "pipeline":
        return Pipeline.from_string(definition)
    reg = _registry()
    if name not in reg:
        raise NotImplementedError(f"operation {name!r} not implemented")
    return reg[name](params)


#: io-unit families for pipeline compatibility checking: 'classic' ops
#: emit meters after the base finalize, so they join 'projected'
_LINEAR = {"classic", "projected"}


def _check_units(steps: list, inverted: list[bool]) -> None:
    """Adjacent pipeline steps must agree on io units — the reference
    rejects e.g. merc->merc at construction (pipeline setup units
    bookkeeping, src/pipeline.cpp:409-410; gie
    pjd_err_malformed_pipeline cases in 4D-API_cs2cs-style.gie:276-284).
    'whatever'-tagged ops (axisswap, unitconvert) pass anything through.
    """
    def fam(u: str) -> str:
        return "linear" if u in _LINEAR else u

    prev_out = None
    for op, inv in zip(steps, inverted):
        if isinstance(op, _PushPop):
            continue
        left = getattr(op, "left", "radians")
        right = getattr(op, "right", "classic")
        step_in = right if inv else left
        step_out = left if inv else right
        if (prev_out is not None and "whatever" not in (prev_out, step_in)
                and fam(prev_out) != fam(step_in)):
            raise ValueError(
                f"malformed pipeline: step '{getattr(op, 'proj_name', '?')}'"
                f" expects {step_in} input but the previous step emits "
                f"{prev_out}")
        if step_out != "whatever":
            prev_out = step_out
        # 'whatever' output leaves prev_out unchanged (transparent step)


class _PushPop:
    """Marker step for the pipeline's coordinate-slot stacks
    (src/pipeline.cpp:600-649): +proj=push/pop +v_1..+v_4."""

    def __init__(self, kind: str, params: dict):
        self.kind = kind
        self.slots = [i for i in (1, 2, 3, 4) if f"v_{i}" in params]


class Pipeline:
    """Composition of +step operations; fwd applies steps left-to-right.

    Carries (x, y, z, t) through every step, preferring each operator's
    highest available arity (fwd4d > fwd3d > fwd), mirroring the
    reference's pj_fwd4d kernel dispatch (src/fwd.cpp:234-260).  push/
    pop steps save/restore coordinate slots across steps using the four
    pipeline-owned stacks."""

    def __init__(self, steps: list, inverted: list[bool],
                 omits: list[tuple[bool, bool]] | None = None):
        self.steps = steps
        self.inverted = inverted
        self.omits = omits or [(False, False)] * len(steps)

    @classmethod
    def from_string(cls, definition: str) -> "Pipeline":
        # split on '+step'; the leading segment holds global params
        segments = definition.replace("step", "\x00step").split("\x00")
        global_params = parse_projstring(segments[0].replace("+proj=pipeline", ""))
        global_params.pop("proj", None)
        steps, inverted, omits = [], [], []
        for seg in segments[1:]:
            seg = seg.strip()
            if seg.startswith("step"):
                seg = seg[4:]
            p = parse_projstring(seg)
            inv = bool(p.pop("inv", False))
            # +omit_fwd / +omit_inv: skip the step in that PIPELINE
            # direction (src/pipeline.cpp:119-123,170,204)
            omit = (bool(p.pop("omit_fwd", False)),
                    bool(p.pop("omit_inv", False)))
            merged = {**global_params, **p}
            if "init" in merged:
                merged = _expand_init(merged)
            name = merged.get("proj")
            if name == "pipeline":
                raise ValueError("nested pipelines are not allowed")
            if name in ("push", "pop"):
                steps.append(_PushPop(name, merged))
                inverted.append(inv)
                omits.append(omit)
                continue
            reg = _registry()
            steps.append(reg[name](merged))
            inverted.append(inv)
            omits.append(omit)
        _check_units(steps, inverted)
        return cls(steps, inverted, omits)

    @staticmethod
    def _apply_step(op, inverse: bool, c: list):
        x, y, z, t = c
        f4 = getattr(op, "inv4d" if inverse else "fwd4d", None)
        if f4 is not None:
            out = f4(x, y, z, t)
            return [out[0], out[1], out[2], out[3] if len(out) > 3 else t]
        f3 = getattr(op, "inv3d" if inverse else "fwd3d", None)
        if f3 is not None:
            try:
                ox, oy, oz = f3(x, y, z)
                return [ox, oy, oz, t]
            except NotImplementedError:
                pass
        f2 = op.inv if inverse else op.fwd
        try:
            # cartesian-space ops (helmert) take 3 positional args
            ox, oy, oz = f2(x, y, z)
            return [ox, oy, oz, t]
        except TypeError:
            ox, oy = f2(x, y)
            return [ox, oy, z, t]

    def _run(self, x, y, z, t, inverse: bool):
        c = [np.asarray(x, dtype=np.float64),
             np.asarray(y, dtype=np.float64),
             np.zeros_like(np.asarray(x, dtype=np.float64)) if z is None
             else np.asarray(z, dtype=np.float64),
             np.zeros_like(np.asarray(x, dtype=np.float64)) if t is None
             else np.asarray(t, dtype=np.float64)]
        stacks = {1: [], 2: [], 3: [], 4: []}
        order = (zip(reversed(self.steps), reversed(self.inverted),
                     reversed(self.omits))
                 if inverse else zip(self.steps, self.inverted, self.omits))
        for op, inv, (omit_fwd, omit_inv) in order:
            if omit_inv if inverse else omit_fwd:
                continue
            if isinstance(op, _PushPop):
                # in the reverse pass a push acts as a pop and vice versa
                kind = op.kind
                if inverse:
                    kind = "pop" if kind == "push" else "push"
                for slot in op.slots:
                    if kind == "push":
                        stacks[slot].append(np.array(c[slot - 1], copy=True))
                    elif stacks[slot]:
                        c[slot - 1] = stacks[slot].pop()
                continue
            c = self._apply_step(op, inv != inverse, c)
        return c

    def fwd(self, lam, phi):
        c = self._run(lam, phi, None, None, inverse=False)
        return c[0], c[1]

    def inv(self, x, y):
        c = self._run(x, y, None, None, inverse=True)
        return c[0], c[1]

    def fwd4d(self, lam, phi, z=None, t=None):
        return tuple(self._run(lam, phi, z, t, inverse=False))

    def inv4d(self, x, y, z=None, t=None):
        return tuple(self._run(x, y, z, t, inverse=True))

    def fwd_deg(self, lon, lat):
        return self.fwd(np.radians(np.asarray(lon, dtype=np.float64)),
                        np.radians(np.asarray(lat, dtype=np.float64)))

    def inv_deg(self, x, y):
        lam, phi = self.inv(x, y)
        return np.degrees(lam), np.degrees(phi)
