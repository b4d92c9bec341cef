"""Convex hull: kernel exactness, distributivity, degenerate inputs."""

from __future__ import annotations

import random

import numpy as np

from proj_spark.spatial.hull import chain_hull, hull_stats, shoelace2


def test_known_shapes():
    # unit square + interior + edge-midpoint points: 4 vertices, 2A = 2*4
    sq = [(0, 0), (2, 0), (2, 2), (0, 2), (1, 1), (1, 0), (2, 1)]
    h = chain_hull(np.array(sq, dtype=np.int64))
    assert len(h) == 4
    assert shoelace2(h) == 8
    # triangle with collinear edge point
    tri = [(0, 0), (4, 0), (2, 2), (2, 0)]
    h = chain_hull(np.array(tri, dtype=np.int64))
    assert len(h) == 3 and shoelace2(h) == 8


def test_degenerates():
    assert len(chain_hull(np.zeros((0, 2), dtype=np.int64))) == 0
    assert len(chain_hull(np.array([[5, 5]], dtype=np.int64))) == 1
    h = chain_hull(np.array([[0, 0], [3, 3], [1, 1], [2, 2]],
                            dtype=np.int64))
    assert len(h) == 2 and shoelace2(h) == 0
    # duplicates collapse
    h = chain_hull(np.array([[1, 1], [1, 1]], dtype=np.int64))
    assert len(h) == 1


def test_hull_contains_all_points_and_is_minimal():
    rng = random.Random(9)
    pts = [(rng.randint(-100, 100), rng.randint(-100, 100))
           for _ in range(300)]
    h = chain_hull(np.array(pts, dtype=np.int64))
    hv = [tuple(int(v) for v in p) for p in h]
    m = len(hv)
    assert m >= 3

    def cross(o, a, b):
        return ((a[0] - o[0]) * (b[1] - o[1])
                - (a[1] - o[1]) * (b[0] - o[0]))

    # CCW convex: every consecutive triple turns strictly left
    for i in range(m):
        assert cross(hv[i], hv[(i + 1) % m], hv[(i + 2) % m]) > 0
    # containment: every input point is on/inside every edge half-plane
    for p in pts:
        for i in range(m):
            assert cross(hv[i], hv[(i + 1) % m], p) >= 0
    # minimality: every hull vertex is an input point and extreme
    # (removing it shrinks the area)
    full = shoelace2(h)
    for i in range(m):
        rest = np.array(hv[:i] + hv[i + 1:], dtype=np.int64)
        assert shoelace2(chain_hull(rest)) < full or m <= 3


def test_distributive_salted_equals_direct(spark):
    rng = random.Random(4)
    rows = []
    for g in range(6):
        for _ in range(250):
            rows.append((g, rng.randint(-10 ** 8, 10 ** 8),
                         rng.randint(-10 ** 8, 10 ** 8)))
    rows += [(7, 1, 1), (8, 0, 0), (8, 9, 9), (8, 4, 4)]
    df = spark.createDataFrame(rows, "g int, x long, y long")
    got = {r.g: (r.n_hull, r.area2)
           for r in hull_stats(df, ["g"], salt=16).collect()}
    from collections import defaultdict
    by = defaultdict(list)
    for g, x, y in rows:
        by[g].append((x, y))
    for g, ps in by.items():
        h = chain_hull(np.array(ps, dtype=np.int64))
        assert got[g] == (len(h), shoelace2(h)), g
    assert got[7] == (1, 0) and got[8] == (2, 0)


def test_diameter2_exact():
    from proj_spark.spatial.hull import diameter2
    import numpy as np
    h = chain_hull(np.array([[0, 0], [10, 0], [10, 7], [0, 7], [5, 3]],
                            dtype=np.int64))
    assert diameter2(h) == 10 * 10 + 7 * 7
    assert diameter2(np.array([[3, 3]], dtype=np.int64)) == 0
    assert diameter2(np.zeros((0, 2), dtype=np.int64)) == 0
