"""gie runner: execute the reference's .gie regression files directly.

The reference ships `gie` (src/apps/gie.cpp) as its fixture-driven test
tool; this module runs the same files against the engine so any .gie
corpus doubles as an acceptance suite:

    python -m proj_spark gie test/gie/builtins.gie [...]

Supported verbs: operation (with continuation lines), accept, expect
(values or `failure`), tolerance, direction, roundtrip (count + limit),
ignore (accepted and disregarded — grid availability differs by deploy).
Comparison semantics mirror the engine's vendored-gie tests: forward
per-axis absolute tolerance, inverse by equirectangular ground distance
(the reference compares via proj_lpz_dist).

Angular tokens accept gie's DMS notation (12d30'10.5"N) through the
cs2cs DMS parser.
"""

from __future__ import annotations

import math
import re

import numpy as np

UNIT_M = {"m": 1.0, "mm": 1e-3, "cm": 1e-2, "km": 1e3, "um": 1e-6,
          "nm": 1e-9, "dm": 0.1}


def _tok_value(tok: str) -> float | None:
    try:
        return float(tok)
    except ValueError:
        pass
    # explicit DMS markers -> dmstor semantics; otherwise the reference
    # gie parses values with proj_strtod, which stops at trailing junk
    # ('55s' is 55, NOT hemisphere south — gie.cpp get_inp/proj_strtod)
    if any(c in tok for c in "d'\""):
        from proj_spark.operations.cs2cs import dms_to_deg
        try:
            return dms_to_deg(tok)
        except Exception:
            return None
    m = re.match(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?", tok)
    return float(m.group(0)) if m else None


_VERBS = {"operation", "tolerance", "direction", "accept", "expect",
          "roundtrip", "ignore", "banner", "verbose", "echo", "skip",
          "use_proj4_init_rules", "require_grid"}


def _parse_tol(toks: list[str]) -> float:
    """tolerance value [unit] — the unit may be glued ("1cm")."""
    m = re.match(r"([-+\d.eE]+)\s*([a-z]*)$", " ".join(toks))
    if not m:
        return float(toks[0])
    return float(m.group(1)) * UNIT_M.get(m.group(2) or "m", 1.0)


def _norm_op(s: str) -> str:
    """gie allows spaces around '=' and after commas in value lists,
    plus trailing ';' in operation strings (src/apps/gie.cpp
    tokenizer); normalize to +proj form."""
    s = re.sub(r"\s*=\s*", "=", s).replace(";", " ")
    s = re.sub(r",\s+", ",", s)
    return re.sub(r"\s+", " ", s).strip()


def parse_gie(path: str) -> list[dict]:
    """Parse a .gie file into executable blocks (one per operation)."""
    blocks: list[dict] = []
    cur: dict | None = None
    direction = "forward"
    tol = 0.0005
    pending: list[float] | None = None

    def flush() -> None:
        nonlocal cur
        if cur and (cur["fwd"] or cur["inv"] or cur["roundtrip"]):
            blocks.append(cur)
        cur = None

    for raw in open(path, encoding="utf-8", errors="replace"):
        line = raw.split("#", 1)[0].strip()
        if line.replace(" ", "") == "</gie>":
            # end of the executable body: trailing material (e.g.
            # DHDN_ETRS89.gie's "not implemented yet" GK vectors) is
            # dead text the reference's gie never executes
            break
        if (not line or line.startswith("<")
                or set(line) <= {"-"} or set(line) <= {"="}):
            continue
        toks = line.split()
        verb = toks[0]
        if (cur is not None and verb not in _VERBS and not cur["fwd"]
                and not cur["inv"] and not cur["roundtrip"]
                and (verb.startswith("+") or "=" in line
                     or cur["projstring"].endswith(",")
                     or verb in ("step", "inv", "omit_fwd", "omit_inv"))):
            # continuation of a multi-line operation string ("+step ...",
            # "step proj=...", bare "proj=..." etc.) — free narrative
            # text between section rules never looks like a param
            cur["projstring"] = _norm_op(cur["projstring"] + " " + line)
            continue
        if verb == "operation":
            flush()
            direction, tol, pending = "forward", 0.0005, None
            cur = {"projstring": _norm_op(line[len("operation"):]),
                   "fwd": [], "inv": [], "roundtrip": [],
                   "ignore": False, "require_grid": None}
        elif cur is None:
            continue
        elif verb == "ignore":
            cur["ignore"] = True
        elif verb == "require_grid":
            # block depends on an external grid file; runnable only when
            # that grid is registered with the engine
            cur["require_grid"] = toks[1] if len(toks) > 1 else ""
        elif verb == "tolerance":
            tol = _parse_tol(toks[1:])
        elif verb == "direction":
            direction = ("inverse" if toks[1].startswith(("inv", "rev"))
                         else "forward")
        elif verb == "accept":
            vals = [_tok_value(t) for t in toks[1:]]
            pending = None if any(v is None for v in vals) else vals
        elif verb == "roundtrip":
            if pending is not None:
                n = int(toks[1]) if len(toks) > 1 else 100
                lim = (float(toks[2]) * UNIT_M.get(
                    toks[3] if len(toks) > 3 else "m", 1.0)
                    if len(toks) > 2 else tol)
                cur["roundtrip"].append({"in": pending, "n": n, "tol": lim,
                                         "dir": direction})
        elif verb == "expect":
            if pending is None:
                continue
            key = "fwd" if direction == "forward" else "inv"
            if "failure" in toks:
                cur[key].append({"tol": tol, "in": pending, "out": None})
            else:
                out = [_tok_value(t) for t in toks[1:]]
                if not any(v is None for v in out):
                    cur[key].append({"tol": tol, "in": pending, "out": out})
            # keep `pending`: gie applies one accept to several expects
            # only via repetition; subsequent expect lines reuse it
    flush()
    return blocks


def end_units(op, input_side: bool) -> str:
    """Effective io units at a pipeline end, skipping push/pop markers
    and whatever-tagged pass-through steps (axisswap/unitconvert) —
    gie's proj_angular_input/_output analogue."""
    steps = getattr(op, "steps", None)
    if not steps:
        return getattr(op, "left" if input_side else "right", "radians")
    order = (zip(steps, op.inverted) if input_side
             else zip(reversed(steps), reversed(op.inverted)))
    for st, inv in order:
        if not hasattr(st, "left"):
            continue   # push/pop markers
        u = (getattr(st, "right", "classic") if (inv == input_side)
             else getattr(st, "left", "radians"))
        if u != "whatever":
            return u
    return "whatever"


def _op_radius(op) -> float:
    """Semimajor axis for ground-distance scaling — gie builds P->geod
    from the operation's own ellipsoid, so +R=1 tests measure distances
    on a unit sphere."""
    a = getattr(op, "a", None)
    if a:
        return float(a)
    for st in getattr(op, "steps", []) or []:
        a = getattr(st, "a", None)
        if a:
            return float(a)
    return 6378137.0


def _dist(ax, ay, bx, by, angular: bool, radius: float) -> float:
    """Result-vs-expected distance: ground meters on the op's own
    ellipsoid for angular outputs (gie's proj_lpz_dist), max per-axis
    absolute difference otherwise."""
    if angular:
        dlon = math.radians(ax - bx)
        dlon = (dlon + math.pi) % (2.0 * math.pi) - math.pi   # wrap
        return math.hypot(math.radians(ay - by),
                          dlon * math.cos(math.radians(by))) * radius
    return max(abs(ax - bx), abs(ay - by))


def _drive(op, forward: bool, vals: list[float]) -> list[float]:
    """Run one coordinate through the op's most capable entry point
    (4D > 3D > 2D), returning [x, y, z, t] in the op's output units."""
    x = np.array([vals[0]])
    y = np.array([vals[1]])
    z = np.array([vals[2] if len(vals) > 2 else 0.0])
    t = np.array([vals[3] if len(vals) > 3 else 0.0])
    fn4 = getattr(op, "fwd4d" if forward else "inv4d", None)
    if fn4 is not None:
        ox, oy, oz, ot = fn4(x, y, z, t)
        return [float(ox[0]), float(oy[0]), float(oz[0]), float(ot[0])]
    # bare cartesian ops expose a *_units variant carrying the
    # cs2cs-emulation fr_meter/to_meter finalize (src/fwd.cpp:110-118)
    fn3 = getattr(op, "fwd3d_units" if forward else "inv3d_units", None)
    if fn3 is None:
        fn3 = getattr(op, "fwd3d" if forward else "inv3d", None)
    if fn3 is not None:
        try:
            ox, oy, oz = fn3(x, y, z)
            return [float(ox[0]), float(oy[0]), float(oz[0]), float(t[0])]
        except NotImplementedError:
            # ops that override fwd/inv without a _fwd kernel (affine):
            # the base-class 3D path raises; fall through to 2D below
            pass
    fn = op.fwd if forward else op.inv
    try:
        out = fn(x, y, z, t)        # cartesian 4-arg ops (helmert 14p)
        return [float(out[0][0]), float(out[1][0]), float(out[2][0]),
                float(out[3][0]) if len(out) > 3 else float(t[0])]
    except TypeError:
        pass
    try:
        out = fn(x, y, z)           # cartesian 3-arg ops
        return [float(out[0][0]), float(out[1][0]), float(out[2][0]),
                float(t[0])]
    except TypeError:
        ox, oy = fn(x, y)
        return [float(ox[0]), float(oy[0]), float(z[0]), float(t[0])]


def _run_dir(op, case, forward: bool) -> str | None:
    tag = "fwd" if forward else "inv"
    in_ang = end_units(op, input_side=forward) == "radians"
    out_ang = end_units(op, input_side=not forward) == "radians"
    vals = list(case["in"])
    if in_ang:
        vals[0] = math.radians(vals[0])
        vals[1] = math.radians(vals[1])
    got = _drive(op, forward, vals)
    if out_ang:
        got[0] = math.degrees(got[0])
        got[1] = math.degrees(got[1])
    if case["out"] is None:
        if np.isnan(got[0]) and np.isnan(got[1]):
            return None
        return (f"{tag}({case['in']}): expected failure, got "
                f"({got[0]},{got[1]})")
    exp = case["out"]
    d = _dist(got[0], got[1], exp[0], exp[1], out_ang, _op_radius(op))
    for k in range(2, min(len(exp), 4)):
        d = max(d, abs(got[k] - exp[k]))
    if d <= case["tol"]:
        return None
    return (f"{tag}({case['in']}) -> ({got[0]:.9g},{got[1]:.9g}"
            f"{',' + format(got[2], '.6g') if len(exp) > 2 else ''}) != "
            f"{exp} d={d:.4g} tol={case['tol']}")


def _check_fwd(op, case) -> str | None:
    return _run_dir(op, case, forward=True)


def _check_inv(op, case) -> str | None:
    return _run_dir(op, case, forward=False)


def _check_roundtrip(op, case) -> str | None:
    in_ang = end_units(op, input_side=True) == "radians"
    vals = list(case["in"])
    if in_ang:
        vals[0] = math.radians(vals[0])
        vals[1] = math.radians(vals[1])
    cur = vals
    for _ in range(min(case["n"], 1000)):
        cur = _drive(op, False, _drive(op, True, cur))
    got = list(cur)
    if in_ang:
        got[0] = math.degrees(got[0])
        got[1] = math.degrees(got[1])
    d = _dist(got[0], got[1], case["in"][0], case["in"][1], in_ang,
              _op_radius(op))
    if d <= case["tol"]:
        return None
    return f"roundtrip({case['in']}) drift {d:.4g} > {case['tol']}"


def run_gie(path: str) -> tuple[int, int, list[str]]:
    """Execute one .gie file.  Returns (total, failed, failure messages);
    blocks whose operation the engine cannot construct count as skipped
    unless every vector expects failure (then the raise IS the pass)."""
    from proj_spark import create
    total = failed = 0
    messages: list[str] = []
    for block in parse_gie(path):
        if block.get("require_grid"):
            from proj_spark.operations.datum import GRID_REGISTRY
            if block["require_grid"] not in GRID_REGISTRY:
                continue
        try:
            op = create(block["projstring"])
        except NotImplementedError:
            continue    # unsupported op/param: skip, as gie -q would
        except Exception:
            if block["ignore"]:
                continue    # e.g. `ignore pjd_err_failed_to_load_grid`
            cases = block["fwd"] + block["inv"]
            total += len(cases)
            bad = [c for c in cases if c["out"] is not None]
            if bad:
                failed += len(bad)
                messages.append(
                    f"{block['projstring']}: raised at setup but "
                    f"{len(bad)} vectors expect values")
            continue
        for kind, check in (("fwd", _check_fwd), ("inv", _check_inv),
                            ("roundtrip", _check_roundtrip)):
            for case in block[kind]:
                total += 1
                try:
                    msg = check(op, case)
                except NotImplementedError:
                    total -= 1   # e.g. 4D-only op driven via the 2D path
                    continue
                except Exception as exc:
                    if case.get("out", True) is None:
                        continue     # raising IS the expected failure
                    if block["ignore"]:
                        total -= 1
                        continue
                    msg = f"{type(exc).__name__}: {exc}"
                if msg:
                    failed += 1
                    messages.append(f"{block['projstring']}: {msg}")
    return total, failed, messages


# ---------------------------------------------------------------------------
# require_grid synthesis (round-3): run grid-gated blocks by building an
# NTv2 grid FROM the file's own vectors
# ---------------------------------------------------------------------------

def synthesize_require_grids(path: str, step_sec: float = 60.0
                             ) -> dict[str, int]:
    """Satisfy a gie file's `require_grid` gates by synthesizing NTv2
    grids from the file's OWN accept/expect vectors.

    The reference skips grid-gated blocks when the grid file is absent
    (its make-check behavior; gie `require_grid`).  The golden vectors
    bake in the real grid's values, so they cannot be validated without
    it — but they CAN be used as the grid: every vector pins the shift
    at one grid node (the local-datum coordinates in these files sit on
    the 1-arc-minute lattice), so a synthetic NTv2 grid with those node
    values reproduces every vector through the engine's REAL machinery —
    NTv2 parsing, bilinear lookup, inverse iteration, datum expansion,
    gie direction semantics.  This is a self-consistency harness for the
    hgridshift path, not independent validation of the real grid's
    content (that is the vendored planner-test fixtures' job).

    Handles blocks whose operation applies the grid in fwd_prepare
    (latlong + datum=/nadgrids=): fwd vectors are (wgs_in -> local_out),
    inverse vectors (local_in -> wgs_out).  Returns {grid: n_nodes}
    for every grid registered; pairs off the lattice are skipped."""
    import tempfile

    from proj_spark.grids import register_grid_file, write_gsb
    from proj_spark.operations.datum import GRID_REGISTRY

    by_grid: dict[str, list[tuple[float, float, float, float]]] = {}
    for block in parse_gie(path):
        g = block.get("require_grid")
        if not g or g in GRID_REGISTRY:
            continue
        ps = block["projstring"]
        if "datum=" not in ps and "nadgrids=" not in ps:
            continue          # grid not in fwd_prepare: cannot infer sides
        pairs = by_grid.setdefault(g, [])
        for case in block["fwd"]:
            if case["out"] is not None:
                (wl, wp), (ll, lp) = case["in"][:2], case["out"][:2]
                pairs.append((ll, lp, wl, wp))
        for case in block["inv"]:
            if case["out"] is not None:
                (ll, lp), (wl, wp) = case["in"][:2], case["out"][:2]
                pairs.append((ll, lp, wl, wp))

    out: dict[str, int] = {}
    step = step_sec / 3600.0
    for g, pairs in by_grid.items():
        nodes: dict[tuple[int, int], tuple[float, float]] = {}
        for ll, lp, wl, wp in pairs:
            i = ll / step
            j = lp / step
            if abs(i - round(i)) > 1e-6 or abs(j - round(j)) > 1e-6:
                continue      # local point off the lattice: unusable
            # NTv2 node value: phi seconds east..north positive, lam
            # seconds WEST positive (the format; fwd adds dphi and
            # SUBTRACTS dlam as loaded)
            nodes[(int(round(i)), int(round(j)))] = (
                (wp - lp) * 3600.0, -(wl - ll) * 3600.0)
        if not nodes:
            continue
        is_ = [k[0] for k in nodes]
        js = [k[1] for k in nodes]
        i0, i1 = min(is_) - 2, max(is_) + 2
        j0, j1 = min(js) - 2, max(js) + 2
        nlam, nphi = i1 - i0 + 1, j1 - j0 + 1
        shifts = np.zeros((nphi, nlam, 2), dtype=np.float32)
        for (i, j), (dphi, dlam) in nodes.items():
            shifts[j - j0, i - i0, 0] = dphi
            shifts[j - j0, i - i0, 1] = dlam
        f = tempfile.NamedTemporaryFile(suffix=".gsb", delete=False)
        f.close()
        write_gsb(f.name, [dict(
            name="SYNTH", parent="NONE",
            s_lat=j0 * step_sec, n_lat=j1 * step_sec,
            w_long=-i0 * step_sec, e_long=-i1 * step_sec,
            lat_inc=step_sec, long_inc=step_sec, shifts=shifts)])
        register_grid_file(g, f.name)
        out[g] = len(nodes)
    return out
