"""Karney geodesic suite: inverse/direct consistency + polygon areas.

Golden values vendored from the reference's geodesic self-tests
(src/tests/geodtest.cpp Planimeter0/Planimeter5), at the same
tolerances the reference asserts."""

from __future__ import annotations

import numpy as np
import pytest

from proj_spark.operations.karney import Geodesic

D2R = np.pi / 180.0
WGS84 = Geodesic(6378137.0, 1 / 298.257223563)


PLANIMETER_CASES = [
    # (vertices (lat, lon) deg, perimeter m, area m^2) — geodtest.cpp:809-845
    ([(89, 0), (89, 90), (89, 180), (89, 270)], 631819.8745, 24952305678.0),
    ([(-89, 0), (-89, 90), (-89, 180), (-89, 270)],
     631819.8745, -24952305678.0),
    ([(0, -1), (-1, 0), (0, 1), (1, 0)], 627598.2731, 24619419146.0),
    ([(90, 0), (0, 0), (0, 90)], 30022685, 63758202715511.0),
    ([(89, 0.1), (89, 90.1), (89, -179.9)], 539297.0, 12476152838.5),
]


@pytest.mark.parametrize("pts,exp_p,exp_a", PLANIMETER_CASES)
def test_polygon_area(pts, exp_p, exp_a):
    lats = np.array([p[0] for p in pts]) * D2R
    lons = np.array([p[1] for p in pts]) * D2R
    P, A = WGS84.polygon_area(lats, lons)
    assert abs(P - exp_p) < 1.0
    assert abs(A - exp_a) < 1.0


def test_inverse_direct_roundtrip_bulk():
    rng = np.random.default_rng(11)
    lat1 = rng.uniform(-89, 89, 5000) * D2R
    lon1 = rng.uniform(-180, 180, 5000) * D2R
    lat2 = rng.uniform(-89, 89, 5000) * D2R
    lon2 = rng.uniform(-180, 180, 5000) * D2R
    s12, azi1, _ = WGS84.inverse(lat1, lon1, lat2, lon2)
    glat2, glon2, _ = WGS84.direct(lat1, lon1, azi1, s12)
    dlat = np.abs(glat2 - lat2)
    dlon = np.abs(np.remainder(glon2 - lon2 + np.pi, 2 * np.pi) - np.pi)
    err_m = np.hypot(dlat, dlon * np.cos(lat2)) * 6.4e6
    assert err_m.max() < 1e-6  # micrometer-level closure


def test_quarter_meridian():
    g = Geodesic(6378137.0, 1 / 298.257222101)  # GRS80
    s, _, _ = g.inverse(np.array([0.0]), np.array([0.0]),
                        np.array([np.pi / 2]), np.array([0.0]))
    assert abs(s[0] - 10001965.7293) < 1e-3


def test_area_antisymmetry():
    lats = np.array([10.0, 40.0, 30.0]) * D2R
    lons = np.array([10.0, 20.0, 50.0]) * D2R
    _, A = WGS84.polygon_area(lats, lons)
    _, Ar = WGS84.polygon_area(lats[::-1], lons[::-1])
    assert abs(A + Ar) < 1.0


def test_waypoints_along_geodesic():
    # positions at fractional distances lie on the geodesic (distance sums)
    lat1, lon1 = 40.6 * D2R, -73.8 * D2R
    lat2, lon2 = 51.6 * D2R, -0.5 * D2R
    s12, azi1, _ = WGS84.inverse(np.array([lat1]), np.array([lon1]),
                                 np.array([lat2]), np.array([lon2]))
    fracs = np.linspace(0.0, 1.0, 11)
    wl, wo, _ = WGS84.direct(np.full(11, lat1), np.full(11, lon1),
                             np.full(11, azi1[0]), fracs * s12[0])
    assert abs(wl[-1] - lat2) < 1e-12
    assert abs(wo[-1] - lon2) < 1e-12
    # successive waypoint separations sum back to s12
    seg, _, _ = WGS84.inverse(wl[:-1], wo[:-1], wl[1:], wo[1:])
    assert abs(seg.sum() - s12[0]) < 1e-6


def test_sphere_reduces_to_great_circle():
    """With f=0 the Karney inverse must agree with the closed-form
    great circle (the basis of the geod_pairs driver oracle)."""
    g = Geodesic(6370997.0, 0.0)
    rng = np.random.default_rng(7)
    lat1 = rng.uniform(-80, 80, 500)
    lon1 = rng.uniform(-179, 179, 500)
    # nearby pairs (the driver query regime) plus mid-range offsets
    lat2 = np.clip(lat1 + rng.uniform(-10, 10, 500), -89, 89)
    lon2 = lon1 + rng.uniform(-10, 10, 500)
    s12, azi1, azi2 = g.inverse(np.radians(lat1), np.radians(lon1),
                                np.radians(lat2), np.radians(lon2))
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dl = np.radians(lon2) - np.radians(lon1)
    num = np.cos(p1) * np.sin(p2) - np.sin(p1) * np.cos(p2) * np.cos(dl)
    sig = np.arctan2(np.hypot(np.cos(p2) * np.sin(dl), num),
                     np.sin(p1) * np.sin(p2)
                     + np.cos(p1) * np.cos(p2) * np.cos(dl))
    assert np.allclose(s12, 6370997.0 * sig, atol=1e-6)
    a1 = np.arctan2(np.cos(p2) * np.sin(dl), num)
    a2 = np.arctan2(np.cos(p1) * np.sin(dl),
                    -(np.sin(p1) * np.cos(p2))
                    + np.cos(p1) * np.sin(p2) * np.cos(dl))
    assert np.allclose(np.degrees(azi1), np.degrees(a1), atol=1e-9)
    assert np.allclose(np.degrees(azi2), np.degrees(a2), atol=1e-9)


def test_sphere_cardinal_azimuths():
    """Due-east along the equator and due-south on a meridian: azimuth
    sign/branch conventions the driver oracle depends on."""
    g = Geodesic(6370997.0, 0.0)
    s, a1, a2 = g.inverse(np.radians([0.0, 10.0]), np.radians([0.0, 20.0]),
                          np.radians([0.0, -10.0]), np.radians([10.0, 20.0]))
    assert abs(np.degrees(a1[0]) - 90.0) < 1e-12      # east
    assert abs(np.degrees(a2[0]) - 90.0) < 1e-12
    assert abs(abs(np.degrees(a1[1])) - 180.0) < 1e-12  # south (+/-180)
    assert abs(s[0] - 6370997.0 * np.radians(10.0)) < 1e-6
    assert abs(s[1] - 6370997.0 * np.radians(20.0)) < 1e-6


def test_edge_area_sum_equals_polygon_area():
    """The geod_area query's distributed reduction — sum per-edge S12
    over the closed ring, then negate — must equal polygon_area()'s
    areareduceA result for non-pole-enclosing rings (net prime-meridian
    transits even, |area| << area0/2), on sphere and ellipsoid."""
    for a, f in ((6370997.0, 0.0), (6378137.0, 1 / 298.257223563)):
        g = Geodesic(a, f)
        for lons, lats in [
            ([-1.40625, 0.0, 0.0, -1.40625], [40.0, 40.0, 41.0, 41.0]),
            ([178.6, 180.0, 180.0, 178.6], [-85.0, -85.0, -84.3, -84.3]),
            ([-0.7, 0.7, 0.7, -0.7], [-0.5, -0.5, 0.5, 0.5]),  # equator + pm
        ]:
            lam = np.radians(lons)
            phi = np.radians(lats)
            per, area = g.polygon_area(phi, lam)
            s12, _, _, S12 = g.inverse(phi, lam, np.roll(phi, -1),
                                       np.roll(lam, -1), want_area=True)
            assert abs(-np.sum(S12) - area) <= 1e-6 * abs(area)
            assert abs(np.sum(s12) - per) <= 1e-9 * per
