"""Sequence-alignment kernels: DTW and discrete Fréchet distance.

Two classic order-aware sequence comparisons that SQL windows cannot
express (the DP recurrence couples both axes) and that web-curation
pipelines use on top of the corpus' *aggregated* relations:

- DTW (dynamic time warping, Sakoe & Chiba 1978) between per-class
  time series (e.g. daily event-count curves): dp(i,j) = c(i,j) +
  min(dp(i-1,j), dp(i,j-1), dp(i-1,j-1)) with integer costs
  c = |a_i - b_j| — the whole table is exact BIGINT.
- Discrete Fréchet (Eiter & Mannila 1994) between coordinate paths
  (e.g. per-domain crawl trajectories): dp(i,j) = max(c(i,j),
  min(dp(i-1,j), dp(i,j-1), dp(i-1,j-1))) with c the squared
  micro-degree separation — dp only PICKS among exact integers, so the
  result is engine-independent bit-for-bit.

Execution contract (the 100 TB shape): the corpus collapses to a small
aligned-array relation first (one shuffle: the per-class/per-domain
aggregation); pairs of arrays then flow through ONE Arrow-batched
pandas UDF whose inner loop is over ANTI-DIAGONALS (2L-1 NumPy steps,
each vectorized across every pair in the batch and every cell on the
diagonal) — never over rows or cells in Python.  P pairs x L^2 cells
cost O(P * L^2) vectorized int64 ops; L is capped by contract
(path/series caps), so adding pairs only widens the batch.

The DuckDB oracle replays the identical DP as a recursive
message-passing CTE: each step-s cell emits its value to its (i+1, j)
and (i, j+1) successors (carrying the diagonal value one hop through
the horizontal neighbor), and step s+1 cells reduce their inbox with
MIN — the same three-way recurrence, bit-exact (see
__spark_entry__._sql_dtw_days / _sql_frechet_paths).

Reference analogue: the reference has no sequence layer; this extends
the footprint-similarity roster (hausdorff_pairs is the orderless
twin: max-min over the SAME squared-µdeg costs without the monotone
coupling constraint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

#: +inf sentinel for "neighbor outside the DP table"; costs are
#: non-negative and true dp values are far below 2^61, so SENT always
#: loses the MIN against any reachable neighbor and never overflows
#: the one addition a DTW cell performs on it (garbage cells beyond a
#: pair's true (la, lb) extent only feed further-out garbage cells).
SENT = np.int64(1) << np.int64(61)


def _pad_lists(col: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Stack a Series of variable-length int lists into a zero-padded
    (P, Lmax) int64 matrix + a (P,) length vector."""
    lens = np.fromiter((len(v) for v in col), dtype=np.int64,
                       count=len(col))
    width = int(lens.max()) if len(lens) else 0
    out = np.zeros((len(col), max(width, 1)), dtype=np.int64)
    for r, v in enumerate(col):          # P rows (pairs), not corpus rows
        out[r, :len(v)] = np.asarray(v, dtype=np.int64)
    return out, lens


def dp_batch(cost: np.ndarray, la: np.ndarray, lb: np.ndarray,
             kind: str) -> np.ndarray:
    """Run the three-way DP over a (P, A, B) int64 cost tensor.

    kind='dtw':     dp = c + min(up, left, diag)
    kind='frechet': dp = max(c, min(up, left, diag))

    Returns dp at (la-1, lb-1) per pair (int64).  The sweep is over
    anti-diagonals s = i + j; every step updates all cells of the
    diagonal for all pairs in one vectorized assignment.
    """
    P, A, B = cost.shape
    pad = np.full((P, A + 1, B + 1), SENT, dtype=np.int64)
    # seed so that dp(0,0) reduces to c(0,0): the diagonal "neighbor"
    # of the origin is 0 for DTW (c + 0) and -1 for Fréchet
    # (max(c, -1) = c, costs being >= 0)
    pad[:, 0, 0] = 0 if kind == "dtw" else -1
    for s in range(A + B - 1):
        i0, i1 = max(0, s - B + 1), min(A - 1, s)
        ii = np.arange(i0, i1 + 1)
        jj = s - ii
        up = pad[:, ii, jj + 1]          # dp(i-1, j)
        left = pad[:, ii + 1, jj]        # dp(i, j-1)
        diag = pad[:, ii, jj]            # dp(i-1, j-1)
        m = np.minimum(np.minimum(up, left), diag)
        c = cost[:, ii, jj]
        pad[:, ii + 1, jj + 1] = c + m if kind == "dtw" \
            else np.maximum(c, m)
    return pad[np.arange(P), la, lb]


@F.pandas_udf(LongType())
def dtw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """DTW between two integer series (array<long> columns)."""
    if len(a) == 0:
        return pd.Series([], dtype="int64")
    av, la = _pad_lists(a)
    bv, lb = _pad_lists(b)
    cost = np.abs(av[:, :, None] - bv[:, None, :])
    return pd.Series(dp_batch(cost, la, lb, "dtw"))


@F.pandas_udf(LongType())
def frechet2_udf(ax: pd.Series, ay: pd.Series,
                 bx: pd.Series, by: pd.Series) -> pd.Series:
    """Squared discrete Fréchet distance between two 2-D integer paths
    given as parallel coordinate arrays (µdeg ints)."""
    if len(ax) == 0:
        return pd.Series([], dtype="int64")
    axv, la = _pad_lists(ax)
    ayv, _ = _pad_lists(ay)
    bxv, lb = _pad_lists(bx)
    byv, _ = _pad_lists(by)
    dx = axv[:, :, None] - bxv[:, None, :]
    dy = ayv[:, :, None] - byv[:, None, :]
    cost = dx * dx + dy * dy
    return pd.Series(dp_batch(cost, la, lb, "frechet"))
