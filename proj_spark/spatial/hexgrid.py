"""Hexagonal cell binning (H3-style axial grid) as pure Spark expressions.

The north rule names "urban H3 hexes" as the dense-cell skew driver; this
module provides the hexagonal analogue of the quad cells in
`proj_spark.spatial.cells`: a pointy-top hexagon grid on the plate-carree
plane (lon/lat degrees), addressed by axial coordinates (q, r) exactly as
H3 addresses its hexagons on each icosahedron face (reference analogue:
the isea operator's hex face geometry, src/projections/isea.cpp).

Design constraints (same as cells.py):
  - pure SQL expressions, no UDFs, whole-stage codegen end-to-end;
  - an exact DuckDB SQL twin for every expression so oracle value checks
    can be bit-identical.  Rounding is therefore written as
    FLOOR(v + 0.5) in BOTH engines (Spark ROUND(double) is HALF_UP via
    BigDecimal, DuckDB rounds half away from zero — floor(+0.5) sidesteps
    the divergence), and every float constant is the same decimal literal
    so both engines parse the identical IEEE-754 double.

Axial coordinates for a pointy-top hexagon of circumradius `size`
(Red Blob Games' canonical formulation):

    qf = (SQRT3_3 * x - THIRD * y) / size
    rf = (TWO_THIRDS * y) / size

followed by cube rounding (x=qf, z=rf, y=-x-z; round each; fix the one
with the largest rounding error so x+y+z == 0 is restored).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Same decimal literals on both sides -> identical doubles.
SQRT3_3 = "0.5773502691896258"      # sqrt(3)/3
THIRD = "0.3333333333333333"        # 1/3
TWO_THIRDS = "0.6666666666666666"   # 2/3


def _rnd(c: Column) -> Column:
    return F.floor(c + F.lit(0.5))


def hex_qr(lon: Column, lat: Column, size: float) -> tuple[Column, Column]:
    """Axial (q, r) hex cell ids for a point, as two LongType columns.

    `size` is the hexagon circumradius in degrees; repr(size) is used as
    the literal so the SQL twin sees the same double.
    """
    s = F.lit(float(size))
    qf = (F.lit(float(SQRT3_3)) * lon - F.lit(float(THIRD)) * lat) / s
    rf = (F.lit(float(TWO_THIRDS)) * lat) / s
    # cube round: x = qf, z = rf, y = -qf - rf
    yf = -qf - rf
    rx, ry, rz = _rnd(qf), _rnd(yf), _rnd(rf)
    dx = F.abs(rx.cast("double") - qf)
    dy = F.abs(ry.cast("double") - yf)
    dz = F.abs(rz.cast("double") - rf)
    q = F.when((dx > dy) & (dx > dz), -ry - rz).otherwise(rx)
    r = F.when(~((dx > dy) & (dx > dz)) & ~(dy > dz), -rx - ry).otherwise(rz)
    return q.cast("long"), r.cast("long")


def hex_qr_sql(lon_expr: str, lat_expr: str, size: float) -> tuple[str, str]:
    """DuckDB twin of `hex_qr` — identical literals, identical op order.

    Returns (q_sql, r_sql); both reference `{lon_expr}`/`{lat_expr}`
    inline, so wrap them in a CTE if they are expensive.
    """
    s = repr(float(size))
    qf = f"(({SQRT3_3} * {lon_expr} - {THIRD} * {lat_expr}) / {s})"
    rf = f"(({TWO_THIRDS} * {lat_expr}) / {s})"
    yf = f"(-{qf} - {rf})"
    rx = f"FLOOR({qf} + 0.5)"
    ry = f"FLOOR({yf} + 0.5)"
    rz = f"FLOOR({rf} + 0.5)"
    dx = f"ABS({rx} - {qf})"
    dy = f"ABS({ry} - {yf})"
    dz = f"ABS({rz} - {rf})"
    big_dx = f"({dx} > {dy} AND {dx} > {dz})"
    q = f"CAST(CASE WHEN {big_dx} THEN -{ry} - {rz} ELSE {rx} END AS BIGINT)"
    r = (f"CAST(CASE WHEN NOT {big_dx} AND NOT ({dy} > {dz}) "
         f"THEN -{rx} - {ry} ELSE {rz} END AS BIGINT)")
    return q, r


def hex_center(q: Column, r: Column, size: float) -> tuple[Column, Column]:
    """Inverse: axial cell -> center (lon, lat) in degrees."""
    s = F.lit(float(size))
    sqrt3 = F.lit(1.7320508075688772)
    lon = s * (sqrt3 * q.cast("double") + sqrt3 / F.lit(2.0) * r.cast("double"))
    lat = s * (F.lit(1.5) * r.cast("double"))
    return lon, lat


# Axial neighbor offsets of a pointy-top hexagon (ring 1).
NEIGHBOR_OFFSETS = ((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))
