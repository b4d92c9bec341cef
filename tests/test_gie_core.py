"""gie-derived golden-vector tests for the core projection kernels.

Vectors vendored from the reference test corpus (test/gie/builtins.gie,
test/gie/more_builtins.gie, test/gigs/5101.1-jhs.gie); tolerance semantics
follow src/apps/gie.cpp:502-515 (per-axis distance, default 0.5 mm).
Angular outputs are compared in degrees with the tolerance converted at
~111319.49 m/deg (conservative near the equatorial test points).
"""

from __future__ import annotations

import numpy as np
import pytest

from proj_spark import create

M_PER_DEG = 111319.4907932736  # pi/180 * 6378137

# (projstring, direction, tol_m, inputs, expected)
CASES = [
    # --- UTM (builtins.gie:5643-5676) ---
    ("+proj=utm +ellps=GRS80 +zone=30", "fwd", 1e-4,
     [(2, 1), (2, -1), (-2, 1), (-2, -1)],
     [(1057002.405491298, 110955.141175949),
      (1057002.405491298, -110955.141175949),
      (611263.812278905, 110547.105696804),
      (611263.812278905, -110547.105696804)]),
    ("+proj=utm +ellps=GRS80 +zone=30", "inv", 1e-4,
     [(200, 100), (200, -100), (-200, 100), (-200, -100)],
     [(-7.486952083, 0.000901940),
      (-7.486952083, -0.000901940),
      (-7.490535682, 0.000901935),
      (-7.490535682, -0.000901935)]),
    ("+proj=utm +zone=32", "fwd", 1e-6,
     [(12, 56)],
     [(687071.43910944, 6210141.32674801)]),
    ("+proj=utm +zone=32 +approx", "fwd", 1e-6,
     [(12, 56)],
     [(687071.43911000, 6210141.32675053)]),
    # --- TM GIGS 5101.1 (test/gigs/5101.1-jhs.gie:12-60) ---
    ("+proj=etmerc +lat_0=49 +lon_0=-2 +k_0=0.9996012717 +x_0=400000 "
     "+y_0=-100000 +ellps=WGS84", "fwd", 0.03,
     [(3, 80), (2.9999999, 60), (3, 49), (3.0000001, 40), (3, 20), (3, 0),
      (3, -20), (3, -40), (3, -60), (3, -80), (-2, 80)],
     [(496813.178, 3358297.326), (678711.584, 1134498.83),
      (765648.501, -87944.74), (826893.845, -1087710.121),
      (923539.353, -3308151.625), (957087.829, -5527462.686),
      (923539.353, -7746773.748), (826893.845, -9967215.251),
      (678711.584, -12189424.202), (496813.178, -14413222.698),
      (400000.0, 3354134.429)]),
    # --- LCC (builtins.gie:2709-2760) ---
    ("+proj=lcc +ellps=GRS80 +lat_1=0.5 +lat_2=2", "fwd", 1e-4,
     [(2, 1), (2, -1), (-2, 1), (-2, -1)],
     [(222588.439735968, 110660.533870800),
      (222756.879700279, -110532.797660827),
      (-222588.439735968, 110660.533870800),
      (-222756.879700279, -110532.797660827)]),
    ("+proj=lcc +ellps=GRS80 +lat_1=0.5 +lat_2=2", "inv", 1e-4,
     [(200, 100), (200, -100)],
     [(0.001796359, 0.000904232),
      (0.001796358, -0.000904233)]),
    ("+proj=lcc +ellps=GRS80 +lat_1=0.5 +lat_2=2 +k_0=1.0000382", "fwd", 1e-4,
     [(2, 1), (2, -1)],
     [(222596.942614366, 110664.761103214),
      (222765.389013083, -110537.020013748)]),
    # --- Mercator (builtins.gie:3221-3260) ---
    ("+proj=merc +ellps=GRS80", "fwd", 1e-4,
     [(2, 1), (2, -1), (-2, 1)],
     [(222638.981586547, 110579.965218250),
      (222638.981586547, -110579.965218249),
      (-222638.981586547, 110579.965218250)]),
    ("+proj=merc +ellps=GRS80", "inv", 1e-4,
     [(200, 100), (200, -100)],
     [(0.001796631, 0.000904369),
      (0.001796631, -0.000904369)]),
    ("+proj=merc +R=6400000", "fwd", 1e-4,
     [(2, 1), (2, -1)],
     [(223402.144255274, 111706.743574944),
      (223402.144255274, -111706.743574944)]),
    ("+proj=merc +R=6400000", "inv", 1e-4,
     [(200, 100)],
     [(0.001790493, 0.000895247)]),
    # --- AEA (builtins.gie:22-68) ---
    ("+proj=aea +ellps=GRS80 +lat_1=0 +lat_2=2", "fwd", 1e-4,
     [(2, 1), (2, -1), (-2, 1), (-2, -1)],
     [(222571.608757106, 110653.326743030),
      (222706.306508391, -110484.267144400),
      (-222571.608757106, 110653.326743030),
      (-222706.306508391, -110484.267144400)]),
    ("+proj=aea +ellps=GRS80 +lat_1=0 +lat_2=2", "inv", 1e-4,
     [(200, 100), (200, -100)],
     [(0.001796631, 0.000904369),
      (0.001796630, -0.000904370)]),
    ("+proj=aea +R=6400000 +lat_1=0 +lat_2=2", "fwd", 1e-4,
     [(2, 1), (2, -1)],
     [(223334.085170885, 111780.431884472),
      (223470.154991687, -111610.339430990)]),
]


@pytest.mark.parametrize("projstring,direction,tol,inputs,expected",
                         CASES, ids=[f"{c[0]}|{c[1]}" for c in CASES])
def test_gie_vectors(projstring, direction, tol, inputs, expected):
    op = create(projstring)
    a = np.array([p[0] for p in inputs], dtype=np.float64)
    b = np.array([p[1] for p in inputs], dtype=np.float64)
    ea = np.array([p[0] for p in expected], dtype=np.float64)
    eb = np.array([p[1] for p in expected], dtype=np.float64)
    if direction == "fwd":
        xa, xb = op.fwd_deg(a, b)
        assert np.all(np.abs(xa - ea) <= tol), f"x off by {np.max(np.abs(xa - ea))}"
        assert np.all(np.abs(xb - eb) <= tol), f"y off by {np.max(np.abs(xb - eb))}"
    else:
        xa, xb = op.inv_deg(a, b)
        tol_deg = tol / M_PER_DEG
        assert np.all(np.abs(xa - ea) <= tol_deg), f"lon off by {np.max(np.abs(xa - ea))}"
        assert np.all(np.abs(xb - eb) <= tol_deg), f"lat off by {np.max(np.abs(xb - eb))}"


def test_cart_fwd():
    """geodetic->cartesian (more_builtins.gie:801-830), tol 1e-6 m."""
    op = create("+proj=cart +ellps=GRS80")
    lon = np.radians(np.array([0.0, 0.0, 90.0]))
    lat = np.radians(np.array([0.0, 90.0, 0.0]))
    z = np.array([0.0, 0.0, 0.0])
    x, y, zz = op.fwd3d(lon, lat, z)
    exp = np.array([
        [6378137.0, 0.0, 0.0],
        [0.0, 0.0, 6356752.314140347],
        [0.0, 6378137.0, 0.0],
    ])
    got = np.stack([x, y, zz], axis=1)
    assert np.all(np.abs(got - exp) < 1e-6)
    # and the origin roundtrip: (0,0,-6378137) -> (0,0,0) cartesian origin
    lam, phi, h = op.inv3d(np.array([0.0]), np.array([0.0]), np.array([0.0]))
    assert abs(h[0] + 6378137.0) < 1e-6


def test_cart_roundtrip():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-np.pi, np.pi, 1000)
    lat = rng.uniform(-np.pi / 2 * 0.9999, np.pi / 2 * 0.9999, 1000)
    h = rng.uniform(-5000, 30000, 1000)
    op = create("+proj=cart +ellps=WGS84")
    x, y, z = op.fwd3d(lon, lat, h)
    lon2, lat2, h2 = op.inv3d(x, y, z)
    assert np.max(np.abs(lon2 - lon)) < 1e-12
    assert np.max(np.abs(lat2 - lat)) < 1e-11
    # Bowring's single-shot inverse: height error grows with |h|; mm is fine
    assert np.max(np.abs(h2 - h)) < 1e-3


def test_helmert_7param():
    """ITRF2008->ETRS89-ish 7-param (more_builtins.gie:350-358), tol 1 um."""
    from proj_spark.operations.helmert import Helmert
    h = Helmert({"x": "0.67678", "y": "0.65495", "z": "-0.52827",
                 "rx": "-0.022742", "ry": "0.012667", "rz": "0.022704",
                 "s": "-0.01070", "convention": "coordinate_frame"})
    x, y, z = h.fwd(np.array([3565285.0]), np.array([855949.0]), np.array([5201383.0]))
    assert abs(x[0] - 3565285.41342351) < 1e-6
    assert abs(y[0] - 855948.67986759) < 1e-6
    assert abs(z[0] - 5201382.72939791) < 1e-6
    # roundtrip: the small-angle matrix transpose is only an approximate
    # inverse (same as the reference's rev3d) — micron-level drift is expected
    x2, y2, z2 = h.inv(x, y, z)
    assert abs(x2[0] - 3565285.0) < 1e-6


def test_helmert_14param_kinematic():
    """ITRF2000->ITRF93 14-param @2017/@2018 (more_builtins.gie:381-391)."""
    from proj_spark.operations.helmert import Helmert
    h = Helmert({
        "x": "0.0127", "y": "0.0065", "z": "-0.0209", "s": "0.00195",
        "rx": "-0.00039", "ry": "0.00080", "rz": "-0.00114",
        "dx": "-0.0029", "dy": "-0.0002", "dz": "-0.0006", "ds": "0.00001",
        "drx": "-0.00011", "dry": "-0.00019", "drz": "0.00007",
        "t_epoch": "1988.0", "convention": "position_vector"})
    x, y, z = h.fwd(np.array([3370658.378, 3370658.378]),
                    np.array([711877.314, 711877.314]),
                    np.array([5349787.086, 5349787.086]),
                    t=np.array([2017.0, 2018.0]))
    exp = np.array([
        [3370658.18890, 711877.42370, 5349787.12430],
        [3370658.18087, 711877.42750, 5349787.12648],
    ])
    got = np.stack([x, y, z], axis=1)
    assert np.max(np.abs(got - exp)) < 3e-5


def test_helmert_4param():
    """4-param 2-D similarity (more_builtins.gie), tol 1 mm."""
    from proj_spark.operations.helmert import Helmert
    h = Helmert({"x": "-9597.3572", "y": ".6112",
                 "s": "0.304794780637", "theta": "-1.244048"})
    x, y, _ = h.fwd(np.array([2546506.957]), np.array([542256.609]), np.array([0.0]))
    assert abs(x[0] - 766563.675) < 1e-3
    assert abs(y[0] - 165282.277) < 1e-3


def test_roundtrips():
    """fwd(inv(x)) drift for every registered core op (proj_roundtrip
    semantics, src/4D_api.cpp:147-177)."""
    rng = np.random.default_rng(7)
    lon = rng.uniform(-3, 3, 500)
    lat = rng.uniform(-60, 60, 500)
    for ps in [
        "+proj=utm +zone=31 +ellps=GRS80",
        "+proj=tmerc +ellps=WGS84 +lon_0=1",
        "+proj=tmerc +approx +ellps=WGS84 +lon_0=1",
        "+proj=merc +ellps=GRS80",
        "+proj=webmerc +ellps=WGS84",
        "+proj=lcc +ellps=GRS80 +lat_1=0.5 +lat_2=2",
        "+proj=aea +ellps=GRS80 +lat_1=0 +lat_2=2",
        "+proj=eqc +R=6371000",
        "+proj=gall +R=6371000",
        "+proj=mill +R=6371000",
        "+proj=cea +ellps=GRS80 +lat_ts=30",
    ]:
        op = create(ps)
        x, y = op.fwd_deg(lon, lat)
        lon2, lat2 = op.inv_deg(x, y)
        # 1e-7 deg ~ 1 cm; series-based inverses (authalic lat) truncate at
        # ~2e-9 rad just like the reference — gie vectors carry precision
        assert np.max(np.abs(lon2 - lon)) < 1e-7, ps
        assert np.max(np.abs(lat2 - lat)) < 1e-7, ps


def test_error_paths():
    with pytest.raises(ValueError):
        create("+proj=aea +ellps=GRS80 +lat_1=900")
    with pytest.raises(ValueError):
        create("+proj=aea +R=6400000 +lat_1=1 +lat_2=-1")
    # out-of-range latitude -> NaN, mirroring fwd_prepare (src/fwd.cpp:54-58)
    op = create("+proj=merc +ellps=GRS80")
    x, y = op.fwd_deg(np.array([0.0]), np.array([91.0]))
    assert np.isnan(x[0]) and np.isnan(y[0])
