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


def test_seg_self_join_known_cases(spark):
    from proj_spark.spatial.overlay import seg_self_join
    # X-cross; endpoint touch (not proper); collinear overlap (not
    # proper); cross sitting ON a 10-unit cell boundary (dedup rule);
    # same-group cross (excluded)
    rows = [
        (1, "p", 0, 0, 8, 8), (2, "q", 0, 8, 8, 0),          # cross
        (3, "r", 8, 8, 16, 8),                               # touch w/ 1
        (4, "s", 2, 2, 6, 6),                                # collinear w/ 1
        (5, "t", 9, 0, 9, 40), (6, "u", 5, 20, 15, 20),      # boundary cross
        (7, "q", 0, 4, 8, 12),                               # crosses 1, grp q
        (8, "q", 4, 0, 12, 8),
    ]
    segs = spark.createDataFrame(
        rows, "id long, grp string, x1 long, y1 long, x2 long, y2 long")
    got = sorted((r.id_a, r.id_b)
                 for r in seg_self_join(segs, 10.0).collect())
    # brute force with the same predicate semantics
    import itertools

    def d(ax1, ay1, ax2, ay2, px, py):
        return (ax2 - ax1) * (py - ay1) - (ay2 - ay1) * (px - ax1)

    def proper(a, b):
        d1 = d(a[2], a[3], a[4], a[5], b[2], b[3])
        d2 = d(a[2], a[3], a[4], a[5], b[4], b[5])
        d3 = d(b[2], b[3], b[4], b[5], a[2], a[3])
        d4 = d(b[2], b[3], b[4], b[5], a[4], a[5])
        return ((d1 > 0) != (d2 > 0) and d1 != 0 and d2 != 0
                and (d3 > 0) != (d4 > 0) and d3 != 0 and d4 != 0)

    want = sorted((a[0], b[0]) for a, b in itertools.combinations(rows, 2)
                  if a[1] != b[1] and proper(a, b))
    assert got == want
    assert (1, 2) in got and (5, 6) in got
    assert all(p != (1, 7) for p in got) or (1, 7) not in want


def test_seg_self_join_no_duplicate_reports(spark):
    """Segments spanning several cells must report each pair ONCE."""
    from proj_spark.spatial.overlay import seg_self_join
    segs = spark.createDataFrame(
        [(1, "a", 0, 1, 39, 2), (2, "b", 20, -10, 21, 30)],
        "id long, grp string, x1 long, y1 long, x2 long, y2 long")
    got = seg_self_join(segs, 10.0).collect()
    assert len(got) == 1 and (got[0].id_a, got[0].id_b) == (1, 2)
