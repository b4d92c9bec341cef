"""Distributed EXACT convex hulls per group (monotone chain, integer
µdeg coordinates).

Scale shape: extreme points of a set are extreme in any subset, so
  hull(S) = hull( ∪ hull(S_i) )  for any partition {S_i} —
the hull is a distributive aggregate.  Stage 1 computes a local hull
per (group, salt) slice inside applyInPandas (each slice reduces to
its few extreme vertices); stage 2 merges the survivors per group.
At 10^12 points the big side is touched exactly once, map-side-ish
(one shuffle to co-locate slices, one tiny shuffle of hull vertices).

All decisions are strict integer cross products (extreme vertices
only — collinear edge points are NOT hull vertices), so the vertex
set and the shoelace area are engine-independent exact integers; the
DuckDB oracle re-derives them with a recursive-CTE quickhull, a
DIFFERENT algorithm whose area accumulation (sum of inserted-triangle
cross products) equals the shoelace sum identically.

Area bound: coords are µdeg (|x| <= 1.8e8), so 2A <= (3.6e8)^2 ~
1.3e17 < 2^63; the per-vertex shoelace terms are summed with Python
ints (exact, no intermediate overflow) and emitted as int64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chain_hull(xy: np.ndarray) -> np.ndarray:
    """Convex hull (extreme vertices only) of int64 (n,2) points via
    Andrew's monotone chain; returns CCW-ordered vertices starting at
    the lexicographic minimum.  Handles 0/1/2-point and collinear
    degenerate inputs."""
    pts = np.unique(xy, axis=0)          # sorts lexicographically
    if len(pts) <= 2:
        return pts
    P = [tuple(int(v) for v in p) for p in pts]

    def build(seq):
        out: list[tuple[int, int]] = []
        for p in seq:
            while len(out) >= 2:
                ox, oy = out[-2]
                ax, ay = out[-1]
                # strict right/straight turn -> pop (keeps extremes only)
                if (ax - ox) * (p[1] - oy) - (ay - oy) * (p[0] - ox) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = build(P)
    upper = build(reversed(P))
    hull = lower[:-1] + upper[:-1]
    return np.array(hull, dtype=np.int64)


def shoelace2(hull: np.ndarray) -> int:
    """Exact 2x polygon area of CCW hull vertices (Python-int sum)."""
    if len(hull) < 3:
        return 0
    tot = 0
    m = len(hull)
    for i in range(m):
        x1, y1 = int(hull[i][0]), int(hull[i][1])
        x2, y2 = int(hull[(i + 1) % m][0]), int(hull[(i + 1) % m][1])
        tot += x1 * y2 - x2 * y1
    return tot


def diameter2(hull: np.ndarray) -> int:
    """Exact max squared point-pair distance over hull vertices (the
    set diameter lies between hull vertices).  Brute over the few
    vertices with Python ints — O(h^2) on h ~ tens, exact."""
    if len(hull) < 2:
        return 0
    pts = [(int(p[0]), int(p[1])) for p in hull]
    best = 0
    for i in range(len(pts)):
        x1, y1 = pts[i]
        for x2, y2 in pts[i + 1:]:
            d = (x2 - x1) ** 2 + (y2 - y1) ** 2
            if d > best:
                best = d
    return best


def hull_stats(pts: DataFrame, grp_cols: list[str], x: str = "x",
               y: str = "y", salt: int = 8,
               with_diameter: bool = False) -> DataFrame:
    """Per-group (n_hull, area2[, diam2]) over exact integer coords.

    Two-level distributive plan (see module docstring); `salt` bounds
    stage-1 group width — any deterministic split is correct, the
    result is partitioning-independent.  The diameter is exact too:
    the farthest pair of a set are both extreme points, so it is
    computable from the merged hull's vertices alone.
    """
    schema_pts = (", ".join(f"{c} {t}" for c, t in
                            zip(grp_cols, _grp_types(pts, grp_cols)))
                  + f", {x} long, {y} long")

    def local(pdf: pd.DataFrame) -> pd.DataFrame:
        h = chain_hull(pdf[[x, y]].to_numpy(dtype=np.int64))
        res = pd.DataFrame({x: h[:, 0], y: h[:, 1]}) if len(h) else \
            pd.DataFrame({x: [], y: []}, dtype=np.int64)
        for c in grp_cols:
            res[c] = pdf[c].iloc[0]
        return res[grp_cols + [x, y]]

    extra = ["diam2"] if with_diameter else []

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        h = chain_hull(pdf[[x, y]].to_numpy(dtype=np.int64))
        res = pd.DataFrame({"n_hull": [len(h)],
                            "area2": [shoelace2(h)]})
        if with_diameter:
            res["diam2"] = [diameter2(h)]
        for c in grp_cols:
            res[c] = pdf[c].iloc[0]
        return res[grp_cols + ["n_hull", "area2"] + extra]

    salted = pts.withColumn(
        "_salt", F.pmod(F.col(x) + F.col(y), F.lit(salt)))
    locals_ = (salted.groupBy(*grp_cols, "_salt")
               .applyInPandas(local, schema_pts))
    schema_out = (", ".join(f"{c} {t}" for c, t in
                            zip(grp_cols, _grp_types(pts, grp_cols)))
                  + ", n_hull long, area2 long"
                  + (", diam2 long" if with_diameter else ""))
    return locals_.groupBy(*grp_cols).applyInPandas(final, schema_out)


def _grp_types(df: DataFrame, cols: list[str]) -> list[str]:
    m = dict(df.dtypes)
    return [m[c] for c in cols]
