"""Hilbert-curve spatial keys: the locality-optimal data layout.

Z-order (spatial/zorder.py) is cheap to compute but has long "seams":
consecutive keys can jump across half the map, so a bbox decomposes
into many scattered key ranges.  The Hilbert curve visits every grid
cell with unit steps — adjacent keys are ALWAYS adjacent cells — which
is why modern table formats cluster by Hilbert rather than Morton when
range-query locality matters (fewer, longer runs of relevant files ->
fewer row groups touched per bbox at 100 TB).  This module provides
the key as pure integer arithmetic evaluated identically by Spark and
DuckDB, so layout decisions are engine-independent and value-exact
oracles are possible.

The encoding is the classic per-bit state walk (public-domain
convert-xy-to-d formulation): at each scale s = 2^k the quadrant pair
(rx, ry) contributes s^2 * ((3*rx) XOR ry) to the index and the frame
rotates/reflects for the next level.  Two engine-portability tricks:

  - (3*rx) XOR ry  ==  3*rx + ry*(1 - 2*rx)   for rx, ry in {0,1}
    (pure arithmetic: Spark spells xor `^` but DuckDB's `^` is POWER);
  - bit tests are `x % 2s >= s`, not `&`, for the same reason.

The per-level chain is emitted as successive narrow projections (a CTE
chain in SQL, chained .select()s in Spark).  Spark's optimizer keeps
the levels as one codegen'd stage without inlining the (duplicated,
non-cheap) level expressions into each other
(spark.sql.optimizer.collapseProjectAlwaysInline=false is the
default), so expression size stays linear in `bits`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MAX_BITS = 16


def _quant_sql(val: str, lo: float, span: float, n: int) -> str:
    return (f"LEAST(GREATEST(CAST(FLOOR((({val}) - {lo!r}) / {span!r} "
            f"* {n}.0) AS BIGINT), 0), {n - 1})")


def level_exprs(bits: int) -> list[list[str]]:
    """The per-level projection chain as engine-neutral SQL snippets.

    Returns a list of projections; each projection is a list of
    `expr AS name` strings referring only to columns of the previous
    projection (`hx`, `hy`, `hd`, plus pass-through `*`).  Levels run
    from the top bit down, two projections per level (rx/ry, then the
    rotate+accumulate), mirroring the scalar walk bit-for-bit.
    """
    if not 1 <= bits <= MAX_BITS:
        raise ValueError(f"bits must be in [1, {MAX_BITS}]")
    n = 1 << bits
    steps: list[list[str]] = []
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        steps.append([
            f"CASE WHEN hx % {2 * s} >= {s} THEN 1 ELSE 0 END AS rx",
            f"CASE WHEN hy % {2 * s} >= {s} THEN 1 ELSE 0 END AS ry",
        ])
        steps.append([
            (f"hd + CAST({s * s} AS BIGINT) * (3 * rx + ry * (1 - 2 * rx)) "
             f"AS hd"),
            (f"CASE WHEN ry = 1 THEN hx WHEN rx = 1 THEN {n - 1} - hy "
             f"ELSE hy END AS hx"),
            (f"CASE WHEN ry = 1 THEN hy WHEN rx = 1 THEN {n - 1} - hx "
             f"ELSE hx END AS hy"),
        ])
    return steps


def hilbert_df(df: DataFrame, lon_col: str = "lon", lat_col: str = "lat",
               bits: int = 8, out: str = "hkey") -> DataFrame:
    """Attach the Hilbert key of (lon, lat) on the 2^bits grid as
    column ``out``: quantization + the per-level chain, all pure SQL
    expressions (no UDF, map-side only)."""
    n = 1 << bits
    keep = df.columns
    cur = df.selectExpr(
        "*",
        _quant_sql(lon_col, -180.0, 360.0, n) + " AS hx",
        _quant_sql(lat_col, -90.0, 180.0, n) + " AS hy",
        "CAST(0 AS BIGINT) AS hd",
    )
    for proj in level_exprs(bits):
        carry = [c for c in cur.columns
                 if c not in ("rx", "ry")
                 and not any(e.endswith(f"AS {c}") for e in proj)]
        cur = cur.selectExpr(*carry, *proj)
    return cur.selectExpr(*keep, f"hd AS {out}")


def hilbert_cte_sql(source: str, lon_col: str = "lon",
                    lat_col: str = "lat", bits: int = 8,
                    out: str = "hkey") -> str:
    """DuckDB rendering of :func:`hilbert_df`: a chain of CTEs over
    ``source`` (a table/CTE name), ending in CTE ``hilbert`` exposing
    source columns + ``out``.  Identical integer arithmetic — exact."""
    n = 1 << bits
    parts = [f"h0 AS (SELECT *, {_quant_sql(lon_col, -180.0, 360.0, n)} AS hx, "
             f"{_quant_sql(lat_col, -90.0, 180.0, n)} AS hy, "
             f"CAST(0 AS BIGINT) AS hd FROM {source})"]
    prev = "h0"
    for i, proj in enumerate(level_exprs(bits), start=1):
        assigned = [e.rsplit(" AS ", 1)[1] for e in proj]
        carry = "*" if assigned == ["rx", "ry"] else \
            f"* EXCLUDE ({', '.join(['rx', 'ry'] + assigned)})"
        parts.append(
            f"h{i} AS (SELECT {carry}, {', '.join(proj)} FROM {prev})")
        prev = f"h{i}"
    parts.append(f"hilbert AS (SELECT * EXCLUDE (hx, hy, hd), hd AS {out} "
                 f"FROM {prev})")
    return ",\n".join(parts)


def hilbert_d_int(lon: float, lat: float, bits: int = 8) -> int:
    """Driver-side scalar twin (same arithmetic) — the test oracle."""
    n = 1 << bits
    x = min(max(int((lon - -180.0) / 360.0 * n), 0), n - 1)
    y = min(max(int((lat - -90.0) / 180.0 * n), 0), n - 1)
    d = 0
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        rx = 1 if x % (2 * s) >= s else 0
        ry = 1 if y % (2 * s) >= s else 0
        d += s * s * (3 * rx + ry * (1 - 2 * rx))
        if ry == 0:
            if rx == 1:
                x, y = (n - 1) - y, (n - 1) - x
            else:
                x, y = y, x
    return d


def hilbert_d2xy_int(d: int, bits: int = 8) -> tuple[int, int]:
    """Inverse walk (grid cell of a key) — used by tests to prove the
    unit-step locality property that justifies the layout."""
    n = 1 << bits
    x = y = 0
    t = d
    s = 1
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x, y = (s - 1) - y, (s - 1) - x
            else:
                x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y
