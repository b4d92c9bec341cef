"""Vector-vector overlay: rectangle intersection join (PBSM).

The engine's point↔polygon join (spatial/pip.py) covers point-in-poly;
this module adds the extent↔extent class — "which admin fragments /
raster footprints / viewport extents intersect?" — using the classic
Partition-Based Spatial-Merge join (Patel & DeWitt, SIGMOD'96):

  1. bin every rectangle to the fixed-size grid cells its bbox covers
     (cell size >= max rectangle extent, so each rect covers <= 4
     cells — a bounded explode, no skewed fan-out);
  2. equi-join on the cell id (hash shuffle co-partitions both sides;
     dense urban cells are exactly what AQE skew-join splits);
  3. exact bbox-overlap post-filter;
  4. de-duplicate pairs WITHOUT a distinct shuffle: a pair is reported
     only by the unique cell containing its intersection's min corner
     (the "reference point" rule) — pure expressions, so the dedup is
     free and the join output is exact.

All arithmetic is FLOOR/LEAST/GREATEST over doubles with identical
expression trees in the DuckDB twin — bit-exact parity, no rounding.

Reference analogue: grid bbox containment dispatch in
src/apply_gridshift.cpp:182+ (which subgrid covers a point) — here
generalised to extent×extent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cells_1d(lo, hi, cell_deg: float):
    return F.sequence(F.floor(lo / F.lit(cell_deg)),
                      F.floor(hi / F.lit(cell_deg)))


def rect_self_join(rects: DataFrame, cell_deg: float) -> DataFrame:
    """All intersecting pairs (id_a < id_b) of `rects`.

    rects: (id long, xmin, xmax, ymin, ymax double).  `cell_deg` must be
    >= the largest rectangle extent on either axis (callers assert);
    each rect then covers at most 2x2 grid cells.
    Returns (id_a, id_b, ix_area) with the exact intersection area.
    """
    binned = (rects
              .withColumn("gx", F.explode(_cells_1d(F.col("xmin"),
                                                    F.col("xmax"), cell_deg)))
              .withColumn("gy", F.explode(_cells_1d(F.col("ymin"),
                                                    F.col("ymax"), cell_deg))))
    a = binned.select(*[F.col(c).alias(f"a_{c}") for c in
                        ("id", "xmin", "xmax", "ymin", "ymax")], "gx", "gy")
    b = binned.select(*[F.col(c).alias(f"b_{c}") for c in
                        ("id", "xmin", "xmax", "ymin", "ymax")], "gx", "gy")
    ixmin = F.greatest("a_xmin", "b_xmin")
    iymin = F.greatest("a_ymin", "b_ymin")
    ixmax = F.least("a_xmax", "b_xmax")
    iymax = F.least("a_ymax", "b_ymax")
    return (a.join(b, ["gx", "gy"])
            .where((F.col("a_id") < F.col("b_id"))
                   & (ixmin < ixmax) & (iymin < iymax)
                   # reference-point rule: only the cell holding the
                   # intersection's min corner reports the pair
                   & (F.col("gx") == F.floor(ixmin / F.lit(cell_deg)))
                   & (F.col("gy") == F.floor(iymin / F.lit(cell_deg))))
            .select(F.col("a_id").alias("id_a"), F.col("b_id").alias("id_b"),
                    ((ixmax - ixmin) * (iymax - iymin)).alias("ix_area")))


def rect_self_join_sql(rects_rel: str, cell_deg: float) -> str:
    """DuckDB twin of `rect_self_join` — direct theta join (the oracle
    is deliberately a DIFFERENT algorithm: no grid, no dedup rule), so
    agreement validates the PBSM binning + reference-point logic."""
    c = repr(float(cell_deg))
    _ = c  # the oracle needs no grid; kept for signature symmetry
    return f"""SELECT a.id AS id_a, b.id AS id_b,
       (LEAST(a.xmax, b.xmax) - GREATEST(a.xmin, b.xmin))
       * (LEAST(a.ymax, b.ymax) - GREATEST(a.ymin, b.ymin)) AS ix_area
FROM {rects_rel} a JOIN {rects_rel} b
  ON a.id < b.id
 AND GREATEST(a.xmin, b.xmin) < LEAST(a.xmax, b.xmax)
 AND GREATEST(a.ymin, b.ymin) < LEAST(a.ymax, b.ymax)"""
