"""EPSG extension methods (operations/extensions.py): the GN7-2 worked
examples where published, structural/mirror properties elsewhere.

These methods exist in the reference's EPSG catalog but NOT in its
pj_list registry — its pipeline generator cannot instantiate them (see
the plain-lcc FIXME for 9803 in
include/proj/internal/coordinateoperation_constants.hpp:568-575).
"""

from __future__ import annotations

import numpy as np

from proj_spark import create
from proj_spark.factory import crs_definition


def test_mod_krovak_worked_example():
    """EPSG GN7-2 Krovak Modified example (S-JTSK/05): the same test
    point as the classic Krovak example, corrections dX~-0.077 m,
    dY~+0.088 m, FE=FN=5000000."""
    op = create("+proj=mod_krovak +czech +ellps=bessel +lat_0=49.5 "
                "+lon_0=24.8333333333333333 +alpha=30.28813972222222 "
                "+lat_ts=78.5 +k=0.9999 +x_0=5000000 +y_0=5000000")
    lon = 16 + 50 / 60 + 59.1790 / 3600
    lat = 50 + 12 / 60 + 32.4416 / 3600
    x, y = op.fwd_deg(np.array([lon]), np.array([lat]))
    assert abs(x[0] - 5568990.91) < 0.02   # westing
    assert abs(y[0] - 6050538.71) < 0.02   # southing
    lo, la = op.inv_deg(x, y)
    assert abs(lo[0] - lon) < 1e-9 and abs(la[0] - lat) < 1e-9


def test_mod_krovak_north_orientated_mirror():
    """1043 is the negative mirror of 1042 about the false origin."""
    s = create(crs_definition(5224))   # south/west +czech
    n = create(crs_definition(5225))   # east/north
    lon, lat = np.array([16.8]), np.array([50.2])
    xs, ys = s.fwd_deg(lon, lat)
    xn, yn = n.fwd_deg(lon, lat)
    assert abs((xs[0] - 5e6) + (xn[0] - 5e6)) < 1e-6
    assert abs((ys[0] - 5e6) + (yn[0] - 5e6)) < 1e-6


def test_colombia_urban_worked_example():
    """EPSG GN7-2 Colombia Urban example (Bogota urban grid,
    EPSG:6247): phi=4d48'N, lam=74d15'W -> E=80859.033, N=122543.174."""
    op = create(crs_definition(6247))
    lon, lat = -(74 + 15 / 60.0), 4.8
    x, y = op.fwd_deg(np.array([lon]), np.array([lat]))
    assert abs(x[0] - 80859.033) < 0.01
    assert abs(y[0] - 122543.174) < 0.01
    lo, la = op.inv_deg(x, y)
    assert abs(lo[0] - lon) < 1e-9 and abs(la[0] - lat) < 1e-9


def test_hyperbolic_cassini_worked_example():
    """EPSG GN7-2 Hyperbolic Cassini-Soldner example (Vanua Levu grid,
    EPSG:3139, chains/links CS): phi=16d50'29.2435\"S,
    lam=179d59'39.6115\"E -> E=1601528.90, N=1336966.01 links."""
    op = create(crs_definition(3139))
    lon = 179 + 59 / 60 + 39.6115 / 3600
    lat = -(16 + 50 / 60 + 29.2435 / 3600)
    x, y = op.fwd_deg(np.array([lon]), np.array([lat]))
    assert abs(x[0] - 1601528.90) < 0.05
    assert abs(y[0] - 1336966.01) < 0.05
    lo, la = op.inv_deg(x, y)
    assert abs(lo[0] - lon) < 1e-9 and abs(la[0] - lat) < 1e-9
    # the hyperbolic term is active: plain cassini differs in northing
    plain = create(crs_definition(3139).replace(" +hyperbolic", ""))
    _, yp = plain.fwd_deg(np.array([lon]), np.array([lat]))
    assert abs(yp[0] - y[0]) > 0.2


def test_lcc_belgium_absorbed_rotation():
    """EPSG:31300 (2SP Belgium, the true 29.2985\" formula) must agree
    with EPSG:31370 (the standard-2SP re-parameterization that absorbed
    the rotation into lon_0/FE/FN) to within the published rounding."""
    b = create(crs_definition(31300))
    s = create(crs_definition(31370))
    lon = np.array([4.35, 5.8, 2.55])
    lat = np.array([50.8, 50.2, 51.2])
    xb, yb = b.fwd_deg(lon, lat)
    xs, ys = s.fwd_deg(lon, lat)
    assert np.abs(xb - xs).max() < 0.05
    assert np.abs(yb - ys).max() < 0.05
    lo, la = b.inv_deg(xb, yb)
    assert np.abs(lo - lon).max() < 1e-8 and np.abs(la - lat).max() < 1e-8


def test_tm_zoned_matches_utm():
    """EPSG:32600/32700: easting carries the zone prefix; the TM part is
    bit-identical to the engine's per-zone utm operation."""
    tz = create(crs_definition(32600))
    x, y = tz.fwd_deg(np.array([11.0, -122.4]), np.array([56.0, 37.8]))
    for i, (lon, lat, zone) in enumerate([(11.0, 56.0, 32),
                                          (-122.4, 37.8, 10)]):
        u = create(f"+proj=utm +zone={zone} +ellps=WGS84")
        xu, yu = u.fwd_deg(np.array([lon]), np.array([lat]))
        assert x[i] == zone * 1e6 + xu[0]
        assert y[i] == yu[0]
    lo, la = tz.inv_deg(x, y)
    assert np.abs(lo - np.array([11.0, -122.4])).max() < 1e-12
    assert np.abs(la - np.array([56.0, 37.8])).max() < 1e-12
    # southern-hemisphere variant adds the 10^7 false northing
    ts = create(crs_definition(32700))
    x2, y2 = ts.fwd_deg(np.array([11.0]), np.array([-56.0]))
    assert x2[0] == x[0]
    assert abs((1e7 - y2[0]) - y[0]) < 1e-6


def test_topocentric():
    """EPSG:5819 (geographic origin) and 5820 (geocentric origin):
    origin maps to (0,0,0); a point straight up maps to (0,0,h); the
    local frame is right-handed east/north/up."""
    from proj_spark.operations.extensions import Topocentric
    tp = create(crs_definition(5819))
    u, v = tp.fwd_deg(np.array([5.0]), np.array([55.0]))
    assert abs(u[0]) < 1e-9 and abs(v[0]) < 1e-9
    U, V, W = tp.fwd3d(np.radians(np.array([5.0])),
                       np.radians(np.array([55.0])), np.array([123.0]))
    assert abs(U[0]) < 1e-9 and abs(V[0]) < 1e-9 and abs(W[0] - 123.0) < 1e-9
    # north displacement -> +V, east displacement -> +U
    u2, v2 = tp.fwd_deg(np.array([5.0, 5.01]), np.array([55.01, 55.0]))
    assert v2[0] > 1000 and abs(u2[0]) < 1e-6
    assert u2[1] > 600 and abs(v2[1]) < 1.0   # slight curvature in V
    lo, la = tp.inv_deg(u2, v2)
    assert np.abs(lo - np.array([5.0, 5.01])).max() < 1e-10
    assert np.abs(la - np.array([55.01, 55.0])).max() < 1e-10
    # 5820: the geocentric origin resolves to the same rotation frame
    tg = create(crs_definition(5820))
    assert isinstance(tg, Topocentric)
    u3, v3 = tg.fwd_deg(np.array([2.12955]), np.array([53.80939444]))
    lo, la = tg.inv_deg(u3, v3)
    assert abs(lo[0] - 2.12955) < 1e-10 and abs(la[0] - 53.80939444) < 1e-10


def test_tunisia_mining_grid():
    """EPSG:22300: linear grads<->km grid on Carthage (Paris meridian).
    The false origin (270, 360) km sits at 36.5964g N, 7.83445g east of
    Paris; 1 km north = 0.010015g, 1 km east = 0.012185g."""
    op = create(crs_definition(22300))
    paris = 2.5969213 * 0.9   # Paris meridian, degrees east of Greenwich
    lon0 = 7.83445 * 0.9 + paris
    lat0 = 36.5964 * 0.9
    x, y = op.fwd_deg(np.array([lon0]), np.array([lat0]))
    assert abs(x[0] - 270.0) < 1e-6 and abs(y[0] - 360.0) < 1e-6
    # one grad east/north moves 1/0.012185 resp. 1/0.010015 km
    x2, y2 = op.fwd_deg(np.array([lon0 + 0.9]), np.array([lat0 + 0.9]))
    assert abs((x2[0] - 270.0) - 1.0 / 0.012185) < 1e-6
    assert abs((y2[0] - 360.0) - 1.0 / 0.010015) < 1e-6
    lo, la = op.inv_deg(x2, y2)
    assert abs(lo[0] - (lon0 + 0.9)) < 1e-10
    assert abs(la[0] - (lat0 + 0.9)) < 1e-10
