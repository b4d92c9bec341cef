"""GIGS conformance suite (vendored from the reference's test/gigs/*.gie,
excluding the files the reference itself marks .failing).

Runs every vendored accept/expect vector and roundtrip through the
engine's pipeline compiler (init=epsg: expansion included).  Blocks
whose EPSG codes or methods are outside the vendored catalog's
supported set are skipped and counted; a minimum-coverage assertion
keeps regressions loud.  Comparison follows gie's semantics: angular
axes via ground distance (M_PER_DEG x cos lat on longitude), linear
axes in meters, per-block tolerances from the files themselves
(typically 0.03 m — GIGS series 5100 projection conformance).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pytest

from proj_spark import create

M_PER_DEG = 111319.4907932736

_HERE = os.path.dirname(os.path.abspath(__file__))
with open(os.path.join(_HERE, "gigs_vendored.json")) as f:
    _DATA = json.load(f)

BLOCKS = _DATA["blocks"]


def _angular_ends(pipe) -> tuple[bool, bool]:
    """(input_is_angular, output_is_angular) for a compiled Pipeline."""
    def end_units(op, inverted, input_side):
        left = getattr(op, "left", "radians")
        right = getattr(op, "right", "classic")
        if input_side:
            u = right if inverted else left
        else:
            u = left if inverted else right
        return u == "radians"
    first, last = pipe.steps[0], pipe.steps[-1]
    return (end_units(first, pipe.inverted[0], True),
            end_units(last, pipe.inverted[-1], False))


def _compare(got_xy, exp, tol, angular, lat_hint):
    if angular:
        dlon = (got_xy[0] - exp[0]) * math.cos(math.radians(lat_hint))
        dlat = got_xy[1] - exp[1]
        return math.hypot(dlon, dlat) * M_PER_DEG <= tol
    return (abs(got_xy[0] - exp[0]) <= tol
            and abs(got_xy[1] - exp[1]) <= tol)


_supported_cache: dict[str, object] = {}


def _compile(projstring: str):
    if projstring not in _supported_cache:
        try:
            _supported_cache[projstring] = create(projstring)
        except NotImplementedError as e:
            _supported_cache[projstring] = e
    res = _supported_cache[projstring]
    if isinstance(res, Exception):
        pytest.skip(f"unsupported: {res}")
    return res


@pytest.mark.parametrize(
    "block", BLOCKS,
    ids=[f"{b['file']}#{i}" for i, b in enumerate(BLOCKS)])
def test_gigs_block(block):
    pipe = _compile(block["projstring"])
    ang_in, ang_out = _angular_ends(pipe)
    for case in block["vectors"]:
        iv = case["in"]
        x = np.array([math.radians(iv[0]) if ang_in else iv[0]])
        y = np.array([math.radians(iv[1]) if ang_in else iv[1]])
        z = np.array([iv[2]]) if len(iv) > 2 else None
        ox, oy, oz, _ = pipe.fwd4d(x, y, z, None)
        gx, gy = float(ox[0]), float(oy[0])
        if ang_out:
            gx, gy = math.degrees(gx), math.degrees(gy)
        exp = case["out"]
        lat_hint = exp[1] if ang_out else iv[1]
        assert _compare((gx, gy), exp, case["tol"], ang_out, lat_hint), \
            (block["file"], iv, (gx, gy), exp, case["tol"])
        if len(exp) > 2 and len(iv) > 2:
            assert abs(float(oz[0]) - exp[2]) <= max(case["tol"], 1e-3), \
                (block["file"], iv, float(oz[0]), exp[2])
    for case in block["roundtrips"]:
        iv = case["in"]
        x = np.array([math.radians(iv[0]) if ang_in else iv[0]])
        y = np.array([math.radians(iv[1]) if ang_in else iv[1]])
        z = np.array([iv[2]]) if len(iv) > 2 else None
        cx, cy, cz = x, y, z
        for _ in range(min(case["n"], 20)):
            fx, fy, fz, _t = pipe.fwd4d(cx, cy, cz, None)
            cx, cy, cz, _t = pipe.inv4d(fx, fy, fz, None)
        gx, gy = float(cx[0]), float(cy[0])
        if ang_in:
            dist = math.hypot(
                (math.degrees(gx) - iv[0]) * math.cos(math.radians(iv[1])),
                math.degrees(gy) - iv[1]) * M_PER_DEG
        else:
            dist = math.hypot(gx - iv[0], gy - iv[1])
        assert dist <= case["tol"], (block["file"], iv, dist, case["tol"])


def test_gigs_coverage_floor():
    """At least this many GIGS blocks must compile (bump as coverage
    grows; guards the init=epsg:/catalog path against regressions)."""
    ok = 0
    for b in BLOCKS:
        try:
            create(b["projstring"])
            ok += 1
        except NotImplementedError:
            pass
    print(f"GIGS blocks supported: {ok}/{len(BLOCKS)}")
    assert ok >= 40
