"""Vendor gie golden vectors from the reference test corpus into JSON.

Parses the `operation / tolerance / direction / accept / expect` DSL of
test/gie/builtins.gie (interpreter: reference src/apps/gie.cpp) and
writes tests/gie_vendored.json — pure test DATA (input/expected vector
pairs), cited to the reference corpus; no reference code involved.

Usage: python tools/vendor_gie.py [op ...]   (default: all operations)
"""

from __future__ import annotations

import json
import os
import re
import sys

GIE = "/root/reference/test/gie/builtins.gie"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "gie_vendored.json")

UNIT_M = {"km": 1000.0, "m": 1.0, "dm": 0.1, "cm": 0.01, "mm": 0.001,
          "um": 1e-6, "nm": 1e-9}


def parse(path: str, only: set[str] | None) -> list[dict]:
    blocks: list[dict] = []
    cur: dict | None = None
    direction = "forward"
    tol = 0.0005
    pending_accept: list[float] | None = None

    def flush() -> None:
        nonlocal cur
        if cur and (cur["fwd"] or cur["inv"]):
            blocks.append(cur)
        cur = None

    for raw in open(path, encoding="utf-8", errors="replace"):
        line = raw.split("#", 1)[0].strip()
        if not line or line.startswith("<") or set(line) == {"-"} or set(line) == {"="}:
            continue
        toks = line.split()
        verb = toks[0]
        if verb.startswith("+") and cur is not None and not cur["fwd"] \
                and not cur["inv"]:
            # continuation line of a multi-line operation string
            cur["projstring"] = cur["projstring"] + " " + line
            continue
        if verb == "operation":
            flush()
            projstring = line[len("operation"):].strip()
            m = re.search(r"\+proj=(\S+)", projstring)
            name = m.group(1) if m else ""
            direction, tol, pending_accept = "forward", 0.0005, None
            if only and name not in only:
                cur = None
                continue
            cur = {"proj": name, "projstring": re.sub(r"\s+", " ", projstring),
                   "fwd": [], "inv": []}
        elif cur is None:
            continue
        elif verb == "tolerance":
            val = float(toks[1])
            unit = toks[2] if len(toks) > 2 else "m"
            tol = val * UNIT_M.get(unit, 1.0)
        elif verb == "direction":
            direction = "inverse" if toks[1].startswith("inv") else "forward"
        elif verb == "accept":
            try:
                pending_accept = [float(t) for t in toks[1:]]
            except ValueError:
                pending_accept = None
        elif verb == "expect":
            if pending_accept is None:
                continue
            if "failure" in toks or "errno" in line:
                # error-path expectation: record as NaN-expected case
                key = "fwd" if direction == "forward" else "inv"
                cur[key].append({"tol": tol, "in": pending_accept, "out": None})
                pending_accept = None
                continue
            try:
                out = [float(t) for t in toks[1:]]
            except ValueError:
                pending_accept = None
                continue
            key = "fwd" if direction == "forward" else "inv"
            cur[key].append({"tol": tol, "in": pending_accept, "out": out})
            pending_accept = None
        elif verb == "roundtrip":
            pending_accept = None
    flush()
    return blocks


def main() -> None:
    only = set(sys.argv[1:]) or None
    blocks = parse(GIE, only)
    names = sorted({b["proj"] for b in blocks})
    n_vec = sum(len(b["fwd"]) + len(b["inv"]) for b in blocks)
    with open(OUT, "w") as f:
        json.dump({"source": "reference test/gie/builtins.gie (PROJ 6.3.0)",
                   "blocks": blocks}, f, indent=1)
    print(f"vendored {len(blocks)} operation blocks, {n_vec} vectors, "
          f"{len(names)} distinct ops -> {OUT}")
    print(" ".join(names))


if __name__ == "__main__":
    main()
