"""Vendor the reference's small per-operation gie corpora that need 3D/4D
coordinate semantics — axisswap.gie, unitconvert.gie, ellipsoid.gie,
GDA.gie — into tests/gie4d_vendored.json.

Pure test DATA (accept/expect tuples).  Handles multi-line operation
strings in gie's free format (continuation lines are any line whose
first token is not a verb), per-block tolerance/direction, roundtrip,
construction-failure blocks (expect failure with no pending accept) and
input-failure vectors (expect failure after accept).

Usage: python tools/vendor_gie4d.py
"""

from __future__ import annotations

import json
import os

GIE_DIR = "/root/reference/test/gie"
FILES = ["axisswap.gie", "unitconvert.gie", "ellipsoid.gie", "GDA.gie"]
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "gie4d_vendored.json")

VERBS = {"operation", "tolerance", "accept", "expect", "direction",
         "roundtrip", "ignore", "require_grid", "use_proj4_init_rules",
         "echo", "skip", "verbose"}

UNIT_M = {"km": 1000.0, "m": 1.0, "dm": 0.1, "cm": 0.01, "mm": 0.001,
          "um": 1e-6, "nm": 1e-9}


def _num(tok: str) -> float:
    """gie coordinate token -> float.  proj_dmstor stops at the first
    unrecognized character, so '55s' reads as 55 (ellipsoid.gie:47)."""
    try:
        return float(tok)
    except ValueError:
        import re
        m = re.match(r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?", tok)
        if not m:
            raise
        return float(m.group(0))


def parse_file(path: str) -> list[dict]:
    blocks: list[dict] = []
    cur: dict | None = None
    tol = 0.0005
    direction = "forward"
    pending: list[float] | None = None
    in_op = False

    def flush():
        nonlocal cur, direction, pending
        if cur and (cur["fwd"] or cur["inv"] or cur["roundtrips"]
                    or cur["setup_fails"]):
            blocks.append(cur)
        cur = None
        direction = "forward"
        pending = None

    for raw in open(path, encoding="utf-8", errors="replace"):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue   # blank lines do NOT end a multi-line operation
        if line.startswith("<") or set(line) <= {"-", "="}:
            in_op = False
            continue
        toks = line.split()
        verb = toks[0]
        if in_op and verb not in VERBS:
            cur["projstring"] += " " + line
            continue
        in_op = False
        if verb == "operation":
            flush()
            cur = {"file": os.path.basename(path),
                   "projstring": line[len("operation"):].strip(),
                   "fwd": [], "inv": [], "roundtrips": [],
                   "setup_fails": False, "requires_grid": False}
            tol = 0.0005
            in_op = True
        elif cur is None:
            continue
        elif verb == "tolerance":
            tol = float(toks[1]) * UNIT_M.get(toks[2] if len(toks) > 2
                                              else "m", 1.0)
        elif verb == "direction":
            direction = toks[1]
        elif verb == "require_grid":
            cur["requires_grid"] = True
        elif verb == "accept":
            pending = [_num(v) for v in toks[1:]]
        elif verb == "expect":
            if toks[1] == "failure":
                if pending is None:
                    cur["setup_fails"] = True
                else:
                    tgt = cur["fwd"] if direction == "forward" else cur["inv"]
                    tgt.append({"in": pending, "out": None, "tol": tol})
                pending = None
                continue
            if pending is not None:
                tgt = cur["fwd"] if direction == "forward" else cur["inv"]
                tgt.append({"in": pending,
                            "out": [_num(v) for v in toks[1:]], "tol": tol})
            pending = None
        elif verb == "roundtrip" and pending is not None:
            cur["roundtrips"].append({"in": pending, "n": int(toks[1]),
                                      "tol": tol, "dir": direction})
    flush()
    import re as _re
    for b in blocks:
        # gie free format: 'key = value' and ';' separators
        # (pj_create_internal accepts them; the engine parser is strict)
        b["projstring"] = _re.sub(r"\s*=\s*", "=",
                                  b["projstring"].replace(";", " "))
    return blocks


def main() -> None:
    out = []
    for f in FILES:
        out.extend(parse_file(os.path.join(GIE_DIR, f)))
    nv = sum(len(b["fwd"]) + len(b["inv"]) for b in out)
    nf = sum(1 for b in out if b["setup_fails"])
    with open(OUT, "w") as fh:
        json.dump({"blocks": out}, fh, indent=0)
    print(f"vendored {len(out)} blocks, {nv} vectors, {nf} setup-failure "
          f"blocks -> {OUT}")


if __name__ == "__main__":
    main()
