"""Trajectory simplification: Douglas-Peucker with an EXACT integer
area criterion (Ramer 1972 / Douglas & Peucker 1973).

Classic DP recurses on the point of maximum perpendicular distance
from the chord.  Perpendicular distance needs a division by the chord
length — a float whose 1-ulp drift between engines could flip the
`> tol` recursion decision and change the whole kept set.  This
implementation uses the TRIANGLE-AREA criterion instead: deviation =
|cross((B-A), (P-A))| on micro-degree integer coordinates, an exact
int64 in every engine (|coords| <= 3.6e8 µdeg keeps the cross product
under 2.6e17 << 2^63).  Area = distance × chord length, so it is the
same test modulo a per-chord scale — the standard trick for robust
geometric predicates (Shewchuk-style exactness without the adaptive
float machinery) — and it degrades gracefully on zero-length chords
(area 0, no division blowup).  Ties split at the LOWEST sequence
number, so the recursion tree — and therefore the kept set — is
uniquely defined and a recursive-CTE oracle reproduces it exactly.

Spark plan: one shuffle on the trajectory key (domain), then
`applyInPandas` runs the stack-based DP per path with the deviation
row computed as a vectorized NumPy cross product per interval — no
per-point Python.  DP is inherently sequential per path (each split
depends on the previous argmax), so a pandas-grouped kernel is the
honest distributed shape: paths are independent, the parallelism unit
is the path, and at 10^12 pages / 10^8 domains there are vastly more
groups than cores.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _out_schema(key_col: str) -> str:
    return f"{key_col} string, n_pts long, n_kept long, kept_seq_sum long"


def dp_keep_mask(xs: np.ndarray, ys: np.ndarray, tol_area: int) -> np.ndarray:
    """Boolean keep-mask for one path (int64 µdeg coords, seq-sorted)."""
    n = xs.shape[0]
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        ax, ay = xs[lo], ys[lo]
        bx, by = xs[hi], ys[hi]
        dev = np.abs((bx - ax) * (ys[lo + 1:hi] - ay)
                     - (by - ay) * (xs[lo + 1:hi] - ax))
        m = int(dev.argmax())  # argmax -> FIRST max: ties at lowest seq
        if dev[m] > tol_area:
            mi = lo + 1 + m
            keep[mi] = True
            stack.append((lo, mi))
            stack.append((mi, hi))
    return keep


def simplify_stats(pts: DataFrame, tol_area: int,
                   key_col: str = "domain") -> DataFrame:
    """Per-trajectory DP stats: (key, n_pts, n_kept, kept_seq_sum,
    kept_frac).  `pts` needs (key, seq, lat, lon); coordinates are
    quantized to exact micro-degree BIGINTs (the synthesis emits
    round-6 values, so the quantization is lossless)."""
    q = (pts.select(
        F.col(key_col),
        F.col("seq").cast("long").alias("seq"),
        F.round(F.col("lon") * 1e6, 0).cast("long").alias("x"),
        F.round(F.col("lat") * 1e6, 0).cast("long").alias("y")))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        xs = pdf["x"].to_numpy(np.int64)
        ys = pdf["y"].to_numpy(np.int64)
        keep = dp_keep_mask(xs, ys, tol_area)
        n, k = len(keep), int(keep.sum())
        return pd.DataFrame({
            key_col: [pdf[key_col].iloc[0]],
            "n_pts": [n], "n_kept": [k],
            "kept_seq_sum": [int(pdf["seq"].to_numpy(np.int64)[keep].sum())]})

    out = q.groupBy(key_col).applyInPandas(run, _out_schema(key_col))
    # kept_frac is rounded ENGINE-side (HALF_UP, matching the oracle's
    # ROUND) — Python's banker's round() would flip exact-half values
    # like 1/128 = 0.0078125 against a SQL oracle
    return out.withColumn(
        "kept_frac",
        F.round(F.col("n_kept").cast("double") / F.col("n_pts"), 6))
