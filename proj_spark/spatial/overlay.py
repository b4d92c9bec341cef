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


# ---------------------------------------------------------------------------
# segment-intersection self-join (line-line overlay)
# ---------------------------------------------------------------------------

def _d_sql(p: str, q: str) -> str:
    """Orientation cross product of segment p1->p2 vs point q1 — exact
    BIGINT arithmetic over micro-degree coordinates (|coord| <= 1.8e8,
    so products stay < 2^63; signs are compared, never multiplied)."""
    return (f"(({p}_x2 - {p}_x1) * ({q}_y - {p}_y1) "
            f"- ({p}_y2 - {p}_y1) * ({q}_x - {p}_x1))")


def seg_intersect_pred_sql(a: str = "a", b: str = "b") -> str:
    """Proper-intersection predicate for segments a/b with columns
    {x1,y1,x2,y2} (µdeg BIGINT), prefixed `a_`/`b_` — shared verbatim
    by Spark and DuckDB; pure integer arithmetic, engine-exact."""
    d1 = _d_sql(a, f"{b}1").replace(f"{b}1_x", f"{b}_x1").replace(
        f"{b}1_y", f"{b}_y1")
    d2 = _d_sql(a, f"{b}2").replace(f"{b}2_x", f"{b}_x2").replace(
        f"{b}2_y", f"{b}_y2")
    d3 = _d_sql(b, f"{a}1").replace(f"{a}1_x", f"{a}_x1").replace(
        f"{a}1_y", f"{a}_y1")
    d4 = _d_sql(b, f"{a}2").replace(f"{a}2_x", f"{a}_x2").replace(
        f"{a}2_y", f"{a}_y2")
    side = lambda u, v: (f"(({u} > 0 AND {v} < 0) OR ({u} < 0 AND {v} > 0))")
    return f"({side(d1, d2)} AND {side(d3, d4)})"


def seg_self_join(segs: DataFrame, cell_udeg: float) -> DataFrame:
    """All PROPERLY intersecting cross-group segment pairs (id_a < id_b).

    segs: (id long, grp string, x1, y1, x2, y2 bigint µdeg); callers
    must pre-filter to |x2-x1|, |y2-y1| <= cell_udeg so each segment's
    bbox covers at most 2x2 grid cells (bounded explode).  Same PBSM
    shape as rect_self_join: bin to cells, equi-join on the cell,
    exact integer orientation test, reference-point dedup (only the
    cell holding the bbox-intersection min corner reports the pair) —
    no distinct shuffle, no UDF, arbitrarily skewed urban cells split
    by AQE.  Touching/collinear contacts (a zero cross product) are
    NOT intersections — exact-integer semantics, no float epsilon.
    """
    L = float(cell_udeg)
    xmin, xmax = F.least("x1", "x2"), F.greatest("x1", "x2")
    ymin, ymax = F.least("y1", "y2"), F.greatest("y1", "y2")
    binned = (segs
              .withColumn("bxmin", xmin).withColumn("bxmax", xmax)
              .withColumn("bymin", ymin).withColumn("bymax", ymax)
              .withColumn("gx", F.explode(F.sequence(
                  F.floor(F.col("bxmin") / F.lit(L)),
                  F.floor(F.col("bxmax") / F.lit(L)))))
              .withColumn("gy", F.explode(F.sequence(
                  F.floor(F.col("bymin") / F.lit(L)),
                  F.floor(F.col("bymax") / F.lit(L))))))
    cols = ("id", "grp", "x1", "y1", "x2", "y2",
            "bxmin", "bxmax", "bymin", "bymax")
    a = binned.select(*[F.col(c).alias(f"a_{c}") for c in cols], "gx", "gy")
    b = binned.select(*[F.col(c).alias(f"b_{c}") for c in cols], "gx", "gy")
    rx = F.greatest("a_bxmin", "b_bxmin")
    ry = F.greatest("a_bymin", "b_bymin")
    return (a.join(b, ["gx", "gy"])
            .where((F.col("a_id") < F.col("b_id"))
                   & (F.col("a_grp") != F.col("b_grp"))
                   & (F.greatest("a_bxmin", "b_bxmin")
                      <= F.least("a_bxmax", "b_bxmax"))
                   & (F.greatest("a_bymin", "b_bymin")
                      <= F.least("a_bymax", "b_bymax"))
                   & (F.col("gx") == F.floor(rx / F.lit(L)))
                   & (F.col("gy") == F.floor(ry / F.lit(L)))
                   & F.expr(seg_intersect_pred_sql()))
            .select(F.col("a_id").alias("id_a"),
                    F.col("b_id").alias("id_b"),
                    F.col("a_grp").alias("grp_a"),
                    F.col("b_grp").alias("grp_b")))


def seg_self_join_sql(segs_rel: str) -> str:
    """DuckDB twin: the UNPRUNED theta join with the same integer
    predicate — deliberately a different algorithm (no grid, no dedup
    rule), so agreement proves the binning + reference-point logic."""
    pred = seg_intersect_pred_sql()
    on = (pred
          .replace("a_x1", "a.x1").replace("a_y1", "a.y1")
          .replace("a_x2", "a.x2").replace("a_y2", "a.y2")
          .replace("b_x1", "b.x1").replace("b_y1", "b.y1")
          .replace("b_x2", "b.x2").replace("b_y2", "b.y2"))
    return f"""SELECT a.id AS id_a, b.id AS id_b,
       a.grp AS grp_a, b.grp AS grp_b
FROM {segs_rel} a JOIN {segs_rel} b
  ON a.id < b.id AND a.grp != b.grp AND {on}"""
