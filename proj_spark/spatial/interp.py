"""Inverse-distance-weighted (IDW) spatial interpolation at query
points (Shepard 1968), the classic raster-from-points estimator.

    est(q) = sum_i w_i * v_i / sum_i w_i,   w_i = 1 / d(q, p_i)^2

over the data points within ``radius_m`` of each query.

Engine formulation — integer-quantized weights.  Distances are
quantized to whole meters (clamped below at ``min_dist_m``, the
standard IDW regularization at the sample points themselves) and the
reciprocal-square weight is computed with INTEGER division:

    d_m = max(round(d), min_dist_m)          exact BIGINT
    w   = W_SCALE div (d_m * d_m)            exact BIGINT

so the per-query accumulators sum(w) and sum(w * v) are exact integer
sums — order-independent, reproducible bit-for-bit by any engine (the
repo's oracle-parity rule) — and only the final division touches
doubles.  Quantization error is ~1/d relative, far below the estimator
noise at kilometer scales.

Scale shape (same cover proof as spatial/knn.radius_join): the query
side is small by contract, so each query explodes to its zoom-``z``
cell's Chebyshev ring-1 (9 cells) and is BROADCAST against the data's
cell key — zero shuffles of the big side.  Web-mercator cells are
locally square with ground size 2*pi*R*cos(lat)/2^z, so ring-1 covers
every point within ``radius_m`` provided radius <= 0.9x the cell size
at the data's highest |latitude|; a violating (radius, z) raises
up front instead of silently under-weighting.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import cells
from .knn import EARTH_R, haversine_expr

W_SCALE = 10_000_000_000  # 1e10: w in [1, 1e8] for d_m in [10 m, 100 km]


def idw_interp(queries: DataFrame, data: DataFrame, radius_m: float,
               z: int, value: Column,
               query_id: str = "query_id",
               q_lon: str = "lon", q_lat: str = "lat",
               d_lon: str = "lon", d_lat: str = "lat",
               max_abs_lat: float = 85.06,
               min_dist_m: int = 10) -> DataFrame:
    """IDW estimate of ``value`` at each query point from the data
    points within ``radius_m``: (query_id, n_pts, sum_w, sum_wv, idw).

    n_pts/sum_w/sum_wv are exact integers; idw is their double ratio
    rounded to 6 dp.  Queries with no in-radius point keep a row with
    n_pts = 0 and NULL idw (left join), so coverage gaps are visible.
    """
    min_dim = (2.0 * math.pi * EARTH_R
               * math.cos(math.radians(min(abs(max_abs_lat), 85.06)))
               / (1 << z))
    if radius_m > 0.9 * min_dim:
        raise ValueError(
            f"radius {radius_m} m exceeds 0.9x the zoom-{z} cell size "
            f"({min_dim:.0f} m) at |lat|={max_abs_lat:.2f}; ring-1 cover "
            f"would be incomplete — lower z or the radius")

    d = data.select(
        value.cast("long").alias("_v"),
        F.col(d_lon).alias("_dlon"), F.col(d_lat).alias("_dlat"),
        cells.cell_id(F.col(d_lon), F.col(d_lat), z).alias("_cell"))
    q = queries.select(
        F.col(query_id), F.col(q_lon).alias("_qlon"),
        F.col(q_lat).alias("_qlat"),
        F.explode(cells.neighbor_cells(
            cells.cell_id(F.col(q_lon), F.col(q_lat), z), 1)).alias("_cell"))

    dist = haversine_expr(F.col("_qlon"), F.col("_qlat"),
                          F.col("_dlon"), F.col("_dlat"))
    d_m = F.greatest(F.round(dist, 0).cast("long"),
                     F.lit(int(min_dist_m)).cast("long"))
    # floor(double-division) == exact integer division over the ENTIRE
    # d_m domain [min_dist_m, radius] — proven exhaustively in
    # tests/test_spatial_analytics.py (so the SQL oracle can spell the
    # identical float expression and stay bit-equal)
    w = F.floor(F.lit(float(W_SCALE)) / (d_m * d_m)).cast("long")
    hits = (F.broadcast(q).join(d, "_cell")
            .where(dist <= F.lit(float(radius_m)))
            .select(query_id, w.alias("_w"), F.col("_v")))
    agg = (hits.groupBy(query_id)
           .agg(F.count("*").alias("n_pts"),
                F.sum("_w").alias("sum_w"),
                F.sum(F.col("_w") * F.col("_v")).alias("sum_wv")))
    base = queries.select(query_id)
    # agg has at most one row per query — broadcast it so the coverage
    # left-join never plans a sort-merge exchange
    out = base.join(F.broadcast(agg), query_id, "left")
    return out.select(
        query_id,
        F.coalesce(F.col("n_pts"), F.lit(0)).alias("n_pts"),
        F.coalesce(F.col("sum_w"), F.lit(0)).alias("sum_w"),
        F.coalesce(F.col("sum_wv"), F.lit(0)).alias("sum_wv"),
        F.when(F.col("sum_w") > 0,
               F.round(F.col("sum_wv").cast("double") / F.col("sum_w"), 6))
         .alias("idw"))
