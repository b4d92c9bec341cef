"""Great-circle corridor join: points within D km of a multi-segment
route (flight path, pipeline, shipping lane), with per-segment top-k.

The spherical geometry is the vector formulation of cross-track /
along-track distance (Bowring's chord method degenerates near the
endpoints; the plane-side tests don't):

    A, B     unit vectors of the segment endpoints
    n = A×B  the great-circle normal (|n| = sin of the segment length)
    P        unit vector of the query point

    P is "beside" the segment  <=>  P·(n×A) >= 0  AND  P·(B×n) >= 0
      (between the two planes through the poles of n and each endpoint)
    beside:   dist = R * asin(|P·n| / |n|)      (cross-track)
    outside:  dist = min(gc(P,A), gc(P,B))      (endpoint caps)

Everything that depends only on the ROUTE — n, n×A, B×n, |n|, the
lat/lon pruning box — is computed driver-side in plain Python floats
and shipped as literal columns of a tiny broadcast relation; the
per-point work is three dot products, one asin, and two haversines,
all pure codegen'd SQL.  The join is a broadcast NLJ against the
|route| segment rows gated by the bounding box (cheap comparisons
reject the globe before any trig runs), so the points relation never
shuffles: at 10^12 pages the whole candidate stage is map-side.

The pruning box is exact, not heuristic: the arc's latitude extremes
use Clairaut's relation (a great circle's vertex can poke ~degrees
above both endpoints — e.g. the NYC->London arc crests near 52.3°N),
padded by D converted at the worst-case latitude.  Completeness is
*verified*, not assumed: the DuckDB oracle runs the unpruned theta
join, so a box that dropped a true corridor point fails the value
check.

The distance formula is ONE shared SQL string evaluated by both
engines (Spark via F.expr, DuckDB verbatim), so parenthesization —
and therefore float rounding — is identical by construction.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .knn import EARTH_R, haversine_sql


def _unit(lon: float, lat: float) -> tuple[float, float, float]:
    lam, phi = math.radians(lon), math.radians(lat)
    return (math.cos(phi) * math.cos(lam),
            math.cos(phi) * math.sin(lam),
            math.sin(phi))


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _norm(a):
    return math.sqrt(_dot(a, a))


SEG_SCHEMA = ("seg_id int, alon double, alat double, blon double, "
              "blat double, nx double, ny double, nz double, "
              "nlen double, nax double, nay double, naz double, "
              "bnx double, bny double, bnz double, lat_lo double, "
              "lat_hi double, lon_lo double, lon_hi double, "
              "seg_m double, cum_m double")

SEG_COLS = [c.split()[0] for c in SEG_SCHEMA.split(", ")]


def segment_specs(waypoints: list[tuple[float, float]],
                  d_km: float) -> list[tuple]:
    """Precompute per-segment constants + the exact pruning box.

    `waypoints` are (lon, lat) degrees; segments must not cross the
    antimeridian or a pole (asserted).
    """
    out = []
    cum_m = 0.0
    for s, (wa, wb) in enumerate(zip(waypoints, waypoints[1:])):
        assert abs(wa[0] - wb[0]) < 180.0, "segment crosses antimeridian"
        a3, b3 = _unit(*wa), _unit(*wb)
        n = _cross(a3, b3)
        nlen = _norm(n)
        assert nlen > 1e-12, "degenerate segment"
        na = _cross(n, a3)
        bn = _cross(b3, n)
        # latitude extremes of the ARC: endpoints, plus the Clairaut
        # vertex (northern/southernmost circle point) when it falls
        # between the endpoint planes
        lats = [wa[1], wb[1]]
        nhat = tuple(c / nlen for c in n)
        for sign in (1.0, -1.0):
            # vertex = unit projection of ±ẑ onto the circle's plane
            v = (-sign * nhat[2] * nhat[0],
                 -sign * nhat[2] * nhat[1],
                 sign * (1.0 - nhat[2] * nhat[2]))
            vn = _norm(v)
            if vn < 1e-12:
                continue  # circle through the poles; endpoints suffice
            v = tuple(c / vn for c in v)
            if _dot(v, na) >= 0.0 and _dot(v, bn) >= 0.0:
                lats.append(math.degrees(math.asin(max(-1.0, min(1.0, v[2])))))
        # longitudes are monotonic along an arc that stays off the
        # poles and spans < 180 deg, so endpoint lons bound the arc
        km_per_deg = math.pi * EARTH_R / 180.0 / 1000.0  # great-circle
        pad_lat = d_km / km_per_deg * 1.05
        lat_lo = max(-90.0, min(lats) - pad_lat)
        lat_hi = min(90.0, max(lats) + pad_lat)
        phi_max = min(89.0, max(abs(lat_lo), abs(lat_hi)))
        pad_lon = d_km / (km_per_deg * math.cos(math.radians(phi_max))) * 1.05
        lon_lo = min(wa[0], wb[0]) - pad_lon
        lon_hi = max(wa[0], wb[0]) + pad_lon
        # geodesic (spherical) segment length + route chainage at its
        # start — plain driver floats shipped as literals, so both
        # engines see byte-identical constants
        seg_m = EARTH_R * math.atan2(nlen, _dot(a3, b3))
        out.append((s, wa[0], wa[1], wb[0], wb[1],
                    n[0], n[1], n[2], nlen,
                    na[0], na[1], na[2], bn[0], bn[1], bn[2],
                    lat_lo, lat_hi, lon_lo, lon_hi, seg_m, cum_m))
        cum_m += seg_m
    return out


def dist_sql(lon: str = "lon", lat: str = "lat") -> str:
    """Point-to-segment great-circle distance (meters) as ONE SQL
    string shared verbatim by Spark (F.expr) and DuckDB — identical
    parse tree, identical float rounding."""
    px = f"(COS(RADIANS({lat})) * COS(RADIANS({lon})))"
    py = f"(COS(RADIANS({lat})) * SIN(RADIANS({lon})))"
    pz = f"(SIN(RADIANS({lat})))"
    dotn = f"({px} * nx + {py} * ny + {pz} * nz)"
    s1 = f"({px} * nax + {py} * nay + {pz} * naz)"
    s2 = f"({px} * bnx + {py} * bny + {pz} * bnz)"
    beside = f"{EARTH_R!r} * ASIN(LEAST(ABS({dotn}) / nlen, 1.0))"
    caps = (f"LEAST({haversine_sql(lon, lat, 'alon', 'alat')}, "
            f"{haversine_sql(lon, lat, 'blon', 'blat')})")
    return (f"CASE WHEN {s1} >= 0 AND {s2} >= 0 THEN {beside} "
            f"ELSE {caps} END")


def corridor_topk(pts: DataFrame, waypoints: list[tuple[float, float]],
                  d_km: float, k: int,
                  lon_col: str = "lon", lat_col: str = "lat",
                  key_col: str = "url") -> DataFrame:
    """Top-k nearest points per route segment among points within d_km
    of that segment: (seg_id, rnk, key, dist_km rounded to 1 m).

    Ranking sorts by the ROUNDED distance (1 m) with the key as
    tie-break, so a 1-ulp libm divergence between engines cannot swap
    neighbors."""
    spark = SparkSession.getActiveSession()
    segs = spark.createDataFrame(segment_specs(waypoints, d_km),
                                 SEG_SCHEMA)
    bbox = ((F.col(lat_col) >= F.col("lat_lo"))
            & (F.col(lat_col) <= F.col("lat_hi"))
            & (F.col(lon_col) >= F.col("lon_lo"))
            & (F.col(lon_col) <= F.col("lon_hi")))
    d = F.expr(dist_sql(lon_col, lat_col))
    cand = (pts.join(F.broadcast(segs), bbox)
            .withColumn("dist_m", d)
            .where(F.col("dist_m") <= d_km * 1000.0)
            .select("seg_id", key_col,
                    F.round(F.col("dist_m") / 1000.0, 3).alias("dist_km")))
    w = Window.partitionBy("seg_id").orderBy("dist_km", key_col)
    return (cand.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select(F.col("seg_id").cast("int").alias("seg_id"),
                    F.col("rnk").cast("int").alias("rnk"),
                    F.col(key_col), "dist_km"))


def chain_sql(lon: str = "lon", lat: str = "lat") -> str:
    """Route chainage (meters from the route start) of a point's match
    on the segment, as ONE SQL string shared verbatim by Spark and
    DuckDB.  Beside the segment, the along-track angle from endpoint A
    is atan2(P·(n̂×A), P·Â) — n×A is perpendicular to A in the circle's
    plane pointing toward B with |n×A| = |n|; in the endpoint caps the
    match clamps to the segment start (chainage cum_m) or end
    (cum_m + seg_m)."""
    px = f"(COS(RADIANS({lat})) * COS(RADIANS({lon})))"
    py = f"(COS(RADIANS({lat})) * SIN(RADIANS({lon})))"
    pz = f"(SIN(RADIANS({lat})))"
    s1 = f"({px} * nax + {py} * nay + {pz} * naz)"
    s2 = f"({px} * bnx + {py} * bny + {pz} * bnz)"
    pa = (f"({px} * (COS(RADIANS(alat)) * COS(RADIANS(alon))) "
          f"+ {py} * (COS(RADIANS(alat)) * SIN(RADIANS(alon))) "
          f"+ {pz} * (SIN(RADIANS(alat))))")
    along = f"{EARTH_R!r} * ATAN2({s1} / nlen, {pa})"
    hav_a = haversine_sql(lon, lat, "alon", "alat")
    hav_b = haversine_sql(lon, lat, "blon", "blat")
    return (f"CASE WHEN {s1} >= 0 AND {s2} >= 0 THEN cum_m + {along} "
            f"WHEN {hav_a} <= {hav_b} THEN cum_m "
            f"ELSE cum_m + seg_m END")


def map_match(pts: DataFrame, waypoints: list[tuple[float, float]],
              d_km: float, lon_col: str = "lon", lat_col: str = "lat",
              key_col: str = "url") -> DataFrame:
    """Map matching: snap every point within d_km of the route to its
    NEAREST segment, with the cross-track distance and the chainage
    (km along the route) of the matched position — the GPS-trace /
    asset-to-route assignment primitive.

    Plan shape (and why it holds at 10^12 points): the segment
    relation is tiny and broadcast, candidates are gated by each
    segment's exact pruning box before any trig runs, so the points
    relation is scanned once map-side; the only exchange is the
    per-point argmin window over the ~|route-local| candidate subset.
    Ties (a point equidistant from the two segments sharing a
    waypoint) are exact equalities in both engines — the cap distance
    to the shared waypoint is the same literal expression — and break
    deterministically by seg_id.
    """
    spark = SparkSession.getActiveSession()
    segs = spark.createDataFrame(segment_specs(waypoints, d_km),
                                 SEG_SCHEMA)
    bbox = ((F.col(lat_col) >= F.col("lat_lo"))
            & (F.col(lat_col) <= F.col("lat_hi"))
            & (F.col(lon_col) >= F.col("lon_lo"))
            & (F.col(lon_col) <= F.col("lon_hi")))
    d = F.expr(dist_sql(lon_col, lat_col))
    ch = F.expr(chain_sql(lon_col, lat_col))
    cand = (pts.join(F.broadcast(segs), bbox)
            .withColumn("dist_m", d)
            .where(F.col("dist_m") <= d_km * 1000.0)
            .select(key_col, "seg_id",
                    F.round(F.col("dist_m") / 1000.0, 3).alias("dist_km"),
                    F.round(ch / 1000.0, 3).alias("chain_km")))
    w = Window.partitionBy(key_col).orderBy("dist_km", "seg_id")
    return (cand.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") == 1)
            .select(F.col(key_col),
                    F.col("seg_id").cast("int").alias("seg_id"),
                    "dist_km", "chain_km"))


def segments_values_sql(waypoints: list[tuple[float, float]],
                        d_km: float) -> str:
    """The same segment constants as a DuckDB VALUES relation."""
    rows = ", ".join(
        "(" + ", ".join(repr(v) for v in row) + ")"
        for row in segment_specs(waypoints, d_km))
    return f"(VALUES {rows}) AS segs({', '.join(SEG_COLS)})"
