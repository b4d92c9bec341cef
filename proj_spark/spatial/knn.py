"""kNN via cell-ring expansion + exact geodesic re-rank.

For each query point: join candidate data points sharing a cell within
Chebyshev ring r of the query cell, compute exact distance, keep top-k by
window.  Queries that found < k candidates expand to a wider ring
(driver-side loop, few iterations).  At scale the data side is hash-
partitioned by cell once; the (small) query side is broadcast each round.

Distance column: haversine by default (closed-form, expressible in ANSI
SQL for oracles); `distance="vincenty"` swaps in the ellipsoidal UDF for
exact re-ranking.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import DoubleType
from pyspark.sql.window import Window

from proj_spark.spatial import cells

EARTH_R = 6371008.8  # IUGG mean radius


def haversine_expr(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in meters, pure SQL (codegen-friendly)."""
    p1 = F.radians(lat1)
    p2 = F.radians(lat2)
    dphi = p2 - p1
    dlam = F.radians(lon2) - F.radians(lon1)
    h = (F.sin(dphi / 2) ** 2 + F.cos(p1) * F.cos(p2) * F.sin(dlam / 2) ** 2)
    return F.lit(2.0 * EARTH_R) * F.asin(F.sqrt(h))


def haversine_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """Same formula as haversine_expr in ANSI SQL (DuckDB oracle parity)."""
    return (
        f"2.0 * {EARTH_R} * ASIN(SQRT("
        f"POWER(SIN((RADIANS({lat2}) - RADIANS({lat1}))/2), 2) + "
        f"COS(RADIANS({lat1})) * COS(RADIANS({lat2})) * "
        f"POWER(SIN((RADIANS({lon2}) - RADIANS({lon1}))/2), 2)))"
    )


@pandas_udf(DoubleType())
def vincenty_dist_udf(lon1: pd.Series, lat1: pd.Series,
                      lon2: pd.Series, lat2: pd.Series) -> pd.Series:
    from proj_spark.operations.geodesic import vincenty_inverse
    s12, _, _ = vincenty_inverse(
        np.radians(lon1.to_numpy(np.float64)), np.radians(lat1.to_numpy(np.float64)),
        np.radians(lon2.to_numpy(np.float64)), np.radians(lat2.to_numpy(np.float64)))
    return pd.Series(s12)


def knn_join(queries: DataFrame, data: DataFrame, k: int, z: int = 9,
             query_id: str = "query_id", data_id: str = "data_id",
             q_lon: str = "lon", q_lat: str = "lat",
             d_lon: str = "lon", d_lat: str = "lat",
             distance: str = "haversine", max_ring: int = 16) -> DataFrame:
    """k nearest data points per query point.

    Returns (query_id, data_id, dist_m, rank).  Deterministic tie-break on
    (dist_m, data_id).  The ring starts at 1 and doubles until every query
    has k neighbors or max_ring is hit (a ring that spans the whole grid
    degenerates to the brute-force join, so termination is guaranteed).
    """
    d = data.select(
        F.col(data_id), F.col(d_lon).alias("_dlon"), F.col(d_lat).alias("_dlat"),
        cells.cell_id(F.col(d_lon), F.col(d_lat), z).alias("_dcell"))
    d = d.repartition(F.col("_dcell")).cache()

    q_all = queries.select(
        F.col(query_id), F.col(q_lon).alias("_qlon"), F.col(q_lat).alias("_qlat"),
        cells.cell_id(F.col(q_lon), F.col(q_lat), z).alias("_qcell"))

    def dist_col():
        if distance == "vincenty":
            return vincenty_dist_udf(F.col("_qlon"), F.col("_qlat"),
                                     F.col("_dlon"), F.col("_dlat"))
        return haversine_expr(F.col("_qlon"), F.col("_qlat"),
                              F.col("_dlon"), F.col("_dlat"))

    pending = q_all
    results = None
    ring = 1
    while ring <= max_ring:
        cand_cells = pending.withColumn(
            "_cell", F.explode(cells.neighbor_cells(F.col("_qcell"), ring)))
        cand = F.broadcast(cand_cells).join(d, F.col("_cell") == F.col("_dcell"), "inner")
        w = Window.partitionBy(query_id).orderBy(F.col("dist_m"), F.col(data_id))
        topk = (cand.withColumn("dist_m", dist_col())
                    .withColumn("rank", F.row_number().over(w))
                    .where(F.col("rank") <= k))
        # a query is complete when it has k neighbors AND its k-th distance
        # fits inside the guaranteed-covered radius of the current ring
        # (ring * cell_height); cell height at zoom z >= 40075km/2^z * cos(85°)
        # -- conservatively use the worst-case shrink at high latitude via
        # the query latitude itself.
        cell_w_m = 2 * math.pi * EARTH_R / (1 << z)
        counts = (topk.groupBy(query_id)
                  .agg(F.count("*").alias("_n"), F.max("dist_m").alias("_dmax"),
                       F.max(F.abs(F.col("_qlat"))).alias("_alat")))
        safe_r = F.lit(ring * cell_w_m) * F.cos(F.radians(F.col("_alat")))
        done_ids = counts.where((F.col("_n") >= k) & (F.col("_dmax") <= safe_r)) \
                         .select(query_id)
        got = topk.join(F.broadcast(done_ids), query_id, "inner") \
                  .select(query_id, data_id, "dist_m", "rank")
        results = got if results is None else results.unionByName(got)
        pending = pending.join(F.broadcast(done_ids), query_id, "left_anti")
        if pending.isEmpty():
            break
        ring *= 2
    else:
        # exhausted rings: brute-force the stragglers (tiny by now)
        cand = F.broadcast(pending).crossJoin(d)
        w = Window.partitionBy(query_id).orderBy(F.col("dist_m"), F.col(data_id))
        got = (cand.withColumn("dist_m", dist_col())
                   .withColumn("rank", F.row_number().over(w))
                   .where(F.col("rank") <= k)
                   .select(query_id, data_id, "dist_m", "rank"))
        results = got if results is None else results.unionByName(got)
    return results
