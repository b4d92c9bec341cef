"""Hilbert-curve key: exactness, locality, and plan shape."""

from __future__ import annotations

import contextlib
import io
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from proj_spark.spatial.hilbert import (hilbert_cte_sql, hilbert_d2xy_int,
                                        hilbert_d_int, hilbert_df)
from proj_spark.spatial.zorder import zorder_key_int


def test_scalar_bijection_and_unit_steps():
    """d2xy is a bijection onto the grid and consecutive keys are
    ALWAYS 4-neighbors — the locality property Z-order lacks."""
    bits, n = 5, 32
    seen = set()
    prev = None
    for d in range(n * n):
        x, y = hilbert_d2xy_int(d, bits)
        assert (x, y) not in seen
        seen.add((x, y))
        if prev is not None:
            assert abs(x - prev[0]) + abs(y - prev[1]) == 1
        prev = (x, y)
        lon = -180 + (x + 0.5) * 360.0 / n
        lat = -90 + (y + 0.5) * 180.0 / n
        assert hilbert_d_int(lon, lat, bits) == d


def test_fewer_bbox_runs_than_morton():
    """For a square window, the number of contiguous key runs (≈ files
    touched in a clustered layout) is smaller under Hilbert than under
    Morton — the reason to pay the extra encode arithmetic."""
    bits = 8
    cells = [(x, y) for x in range(40, 72) for y in range(100, 132)]

    def runs(keys: list[int]) -> int:
        ks = sorted(keys)
        return 1 + sum(1 for a, b in zip(ks, ks[1:]) if b != a + 1)

    def center(x, y):
        n = 1 << bits
        return (-180 + (x + 0.5) * 360.0 / n, -90 + (y + 0.5) * 180.0 / n)

    h_runs = runs([hilbert_d_int(*center(x, y), bits) for x, y in cells])
    m_runs = runs([zorder_key_int(*center(x, y), bits) for x, y in cells])
    assert h_runs < m_runs


def test_duckdb_spark_scalar_agree(spark):
    random.seed(3)
    pts = [(f"u{i}", random.uniform(-180, 180), random.uniform(-90, 90))
           for i in range(500)]
    # near-boundary values exercise the quantization clamps
    pts += [("e1", -180.0, -90.0), ("e2", 180.0, 90.0), ("e3", 0.0, 0.0)]
    for bits in (8, 16):
        df = spark.createDataFrame(pts, "url string, lon double, lat double")
        got = {r.url: r.hkey for r in hilbert_df(df, bits=bits).collect()}
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE p AS SELECT * FROM (VALUES %s) t(url, lon, lat)"
            % ", ".join(f"('{u}', CAST({lo!r} AS DOUBLE), "
                        f"CAST({la!r} AS DOUBLE))" for u, lo, la in pts))
        duck = dict(con.execute(
            f"WITH {hilbert_cte_sql('p', bits=bits)} "
            f"SELECT url, hkey FROM hilbert").fetchall())
        for u, lo, la in pts:
            want = hilbert_d_int(lo, la, bits)
            assert got[u] == want == duck[u], (u, bits)


def test_hilbert_plan_single_codegen_stage(spark):
    """The whole per-level chain stays ONE map-side codegen stage —
    no Exchange, no UDF eval nodes."""
    df = spark.range(0, 64).select(
        (F.col("id") * 1.7 - 50).alias("lon"),
        (F.col("id") * 0.9 - 28).alias("lat"))
    out = hilbert_df(df, bits=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
    stages = {ln.split("*(")[1].split(")")[0]
              for ln in plan.splitlines() if "*(" in ln}
    assert stages == {"1"}


def test_bits_validation():
    from proj_spark.spatial.hilbert import level_exprs
    with pytest.raises(ValueError):
        level_exprs(0)
    with pytest.raises(ValueError):
        level_exprs(17)
