"""Adaptive quadtree tiling: the variable-resolution tile CUT.

Map/tile serving (and spatially-partitioned storage layouts) want each
serving tile to hold at most ~CAP features: dense cities split to deep
zooms, open ocean stays coarse.  Given the per-level counts from
`pyramid.tile_pyramid`, the cut selects, for every non-empty region,
the single SHALLOWEST tile whose count fits the cap:

    selected(z, x, y)  <=>  n(z,x,y) <= cap
                            AND (z == z_min OR n(parent) > cap)
    overflow(z_max,x,y) <=> n > cap          (cannot split further)

Because n(parent) >= n(child) (counts are sums up the tree), the two
rules partition the non-empty z_max leaves exactly once:  walking up
from any leaf, counts are nondecreasing, so there is exactly one level
where the count first fits under the cap (or none — overflow).  The
invariant  sum(n over cut) == total points  is asserted by the unit
tests and makes the whole structure self-checking.

Plan: the pyramid is one shuffle of the points plus a geometric tail of
tile-row aggs (see pyramid.py); the cut adds ONE self-join of the
pyramid against its own parent level — tile rows only, never points,
and the parent side is the same pre-aggregated relation (AQE broadcasts
it at serving scale).  At 100 TB the cut costs ~nothing beyond the
pyramid build it would share with the serving layer anyway.

Reference analogue: PROJ's multi-resolution subgrid hierarchy
(apply_gridshift.cpp:182+) chooses the finest grid containing a point;
the cut materializes the converse — the coarsest tile satisfying a
density bound — bottom-up as data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def adaptive_cut(pyr: DataFrame, z_min: int, z_max: int,
                 cap: int) -> DataFrame:
    """pyramid rows (zoom, tile_x, tile_y, n) -> the cut
    (zoom, tile_x, tile_y, n_pages, overflow)."""
    c = pyr.alias("c")
    p = (pyr.where(F.col("n") > cap)  # only over-cap parents can gate
         .select(F.col("zoom").alias("pz"), F.col("tile_x").alias("px"),
                 F.col("tile_y").alias("py"))
         .alias("p"))
    joined = c.join(
        p,
        (F.col("p.pz") == F.col("c.zoom") - 1)
        & (F.col("p.px") == F.shiftright(F.col("c.tile_x"), 1))
        & (F.col("p.py") == F.shiftright(F.col("c.tile_y"), 1)),
        "left")
    sel = (
        ((F.col("c.n") <= cap)
         & ((F.col("c.zoom") == z_min) | F.col("p.pz").isNotNull()))
        | ((F.col("c.zoom") == z_max) & (F.col("c.n") > cap)))
    return (joined.where(sel)
            .select(F.col("c.zoom").cast("int").alias("zoom"),
                    F.col("c.tile_x").alias("tile_x"),
                    F.col("c.tile_y").alias("tile_y"),
                    F.col("c.n").cast("long").alias("n_pages"),
                    (F.col("c.n") > cap).alias("overflow")))
