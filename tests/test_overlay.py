"""Tests for proj_spark.spatial.overlay (PBSM rectangle join)."""
import duckdb
from pyspark.sql import functions as F  # noqa: F401

from proj_spark.spatial.overlay import rect_self_join, rect_self_join_sql


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, xmin double, xmax double, ymin double, ymax double")


def test_rect_join_basic_touching_excluded(spark):
    rows = [
        (0, 0.0, 1.0, 0.0, 1.0),
        (1, 0.5, 1.5, 0.5, 1.5),   # overlaps 0 with area 0.25
        (2, 1.0, 2.0, 0.0, 1.0),   # touches 0 along an edge -> excluded
        (3, 5.0, 6.0, 5.0, 6.0),   # disjoint
    ]
    got = {(r.id_a, r.id_b): r.ix_area
           for r in rect_self_join(_df(spark, rows), 2.0).collect()}
    assert got == {(0, 1): 0.25, (1, 2): 0.25}


def test_rect_join_pair_spanning_cells_reported_once(spark):
    """Both rects straddle the cell boundary at x=2.0; the pair is seen
    in several grid cells but the reference-point rule reports exactly
    one copy."""
    rows = [(0, 1.2, 2.4, 1.5, 2.6), (1, 1.0, 2.2, 1.9, 3.0)]
    out = rect_self_join(_df(spark, rows), 2.0).collect()
    assert len(out) == 1
    area = (2.2 - 1.2) * (2.6 - 1.9)
    assert out[0].id_a == 0 and abs(out[0].ix_area - area) < 1e-12


def test_rect_join_matches_theta_oracle(spark):
    """120 deterministic pseudo-random rects (some negative coords, some
    on exact cell boundaries): PBSM output == DuckDB theta join."""
    rows = []
    for i in range(120):
        h = (i * 2654435761) % 2147483648
        cx = (h % 15) - 7.0
        cy = ((h // 41) % 9) - 4.0
        rx = 0.25 + (h % 4) * 0.25   # up to 1.0 half-width -> extent 2.0
        ry = 0.25 + (h % 3) * 0.25
        rows.append((i, cx - rx, cx + rx, cy - ry, cy + ry))
    got = sorted((r.id_a, r.id_b, r.ix_area)
                 for r in rect_self_join(_df(spark, rows), 2.0).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE rects (id BIGINT, xmin DOUBLE, xmax DOUBLE,"
                " ymin DOUBLE, ymax DOUBLE)")
    con.executemany("INSERT INTO rects VALUES (?, ?, ?, ?, ?)", rows)
    want = sorted(tuple(r) for r in
                  con.execute(rect_self_join_sql("rects", 2.0)).fetchall())
    assert len(want) > 100
    assert got == want
