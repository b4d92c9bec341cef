"""Vendor the GIGS conformance vectors (test/gigs/*.gie, skipping the
reference's own .gie.failing files) into tests/gigs_vendored.json.

Pure test DATA (accept/expect coordinate pairs from the published GIGS
series), cited to the reference corpus.  Verbs handled: operation
(multi-line +step continuation), tolerance, accept/expect pairs, and
accept+roundtrip cases (fwd∘inv N times must return to the input).

Usage: python tools/vendor_gigs.py
"""

from __future__ import annotations

import glob
import json
import os

GIGS = "/root/reference/test/gigs"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "gigs_vendored.json")

UNIT_M = {"km": 1000.0, "m": 1.0, "dm": 0.1, "cm": 0.01, "mm": 0.001,
          "um": 1e-6, "nm": 1e-9}


def parse_file(path: str) -> list[dict]:
    blocks: list[dict] = []
    cur: dict | None = None
    tol = 0.0005
    pending: list[float] | None = None
    in_op = False

    def flush():
        nonlocal cur
        if cur and (cur["vectors"] or cur["roundtrips"]):
            blocks.append(cur)
        cur = None

    for raw in open(path, encoding="utf-8", errors="replace"):
        line = raw.split("#", 1)[0].strip()
        if not line or line.startswith("<") or set(line) <= {"-", "="}:
            in_op = in_op and False
            continue
        toks = line.split()
        verb = toks[0]
        if in_op and (verb.startswith("+") or verb == "step"):
            cur["projstring"] += " " + line
            continue
        in_op = False
        if verb == "operation":
            flush()
            cur = {"file": os.path.basename(path),
                   "projstring": line[len("operation"):].strip(),
                   "vectors": [], "roundtrips": []}
            tol = 0.0005
            pending = None
            in_op = True
        elif verb == "tolerance":
            tol = float(toks[1]) * UNIT_M.get(toks[2] if len(toks) > 2
                                              else "m", 1.0)
        elif verb == "accept":
            pending = [float(v) for v in toks[1:]]
        elif verb == "expect" and cur is not None:
            if toks[1] == "failure":
                pending = None
                continue
            if pending is not None:
                cur["vectors"].append({"in": pending,
                                       "out": [float(v) for v in toks[1:]],
                                       "tol": tol})
            pending = None
        elif verb == "roundtrip" and cur is not None and pending is not None:
            cur["roundtrips"].append({"in": pending, "n": int(toks[1]),
                                      "tol": tol})
    flush()
    return blocks


#: .gie.failing files the ENGINE fully passes (round-4 triage, see
#: COVERAGE.md "GIGS .failing triage"): promoted into the vendored
#: suite even though the reference keeps them failing
PROMOTED_FAILING = ["5101.4-jhs.gie.failing"]


def main() -> None:
    out = []
    files = sorted(glob.glob(os.path.join(GIGS, "*.gie")))
    files += [os.path.join(GIGS, f) for f in PROMOTED_FAILING]
    for path in files:
        out.extend(parse_file(path))
    nvec = sum(len(b["vectors"]) for b in out)
    nrt = sum(len(b["roundtrips"]) for b in out)
    with open(OUT, "w") as f:
        json.dump({"blocks": out}, f, indent=0)
    print(f"vendored {len(out)} blocks, {nvec} accept/expect vectors, "
          f"{nrt} roundtrips -> {OUT}")


if __name__ == "__main__":
    main()
