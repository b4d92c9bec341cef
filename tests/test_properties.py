"""Property-based roundtrip tests (hypothesis): fwd -> inv recovers the
input for every invertible projection family, on conservative in-domain
points.  The reference has no randomized testing (SURVEY.md §5); this
guards the vectorized branches (masks, clamps, iteration fallbacks)
against inputs the golden vectors never touch."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from proj_spark import create

# (projstring, lon range, lat range, tolerance meters)
ROUNDTRIP_OPS = [
    ("+proj=utm +zone=32 +ellps=GRS80", (3, 15), (-80, 84), 1e-5),
    ("+proj=lcc +ellps=GRS80 +lat_1=33 +lat_2=45 +lat_0=40", (-40, 40),
     (5, 70), 1e-5),  # pj_phi2 fixed-point inverse
    ("+proj=merc +ellps=WGS84", (-179, 179), (-85, 85), 1e-5),
    ("+proj=stere +ellps=GRS80 +lat_0=90 +lat_ts=70", (-179, 179), (30, 89),
     1e-5),
    ("+proj=laea +ellps=GRS80 +lat_0=45 +lon_0=10", (-60, 80), (-20, 85),
     5e-3),  # authalic-latitude series truncation (same in the reference)
    ("+proj=aeqd +R=6371000 +lat_0=20 +lon_0=100", (30, 170), (-50, 80),
     1e-5),
    ("+proj=moll +R=6371000", (-170, 170), (-85, 85), 1e-2),
    ("+proj=robin +R=6371000", (-170, 170), (-85, 85), 0.5),
    ("+proj=eck4 +R=6371000", (-170, 170), (-85, 85), 1e-2),
    ("+proj=sinu +ellps=GRS80", (-170, 170), (-85, 85), 1e-5),
    ("+proj=cass +ellps=GRS80 +lat_0=30", (-3, 3), (10, 50), 0.1),  # the reference's own 3-term inverse series truncation (src/projections/cass.cpp:59-77) reaches ~5.1 cm at lam=3deg, lat=29deg
    ("+proj=somerc +ellps=bessel +lat_0=46.95 +lon_0=7.44", (2, 12), (43, 50),
     1e-6),
    ("+proj=krovak +ellps=bessel", (13, 23), (47, 52), 1e-5),
    ("+proj=qsc +ellps=WGS84", (-40, 40), (-40, 40), 5e-2),  # sqrt-of-eps cancellation near the face center (~cm, as in the reference)
    ("+proj=healpix +R=6371000", (-170, 170), (-85, 85), 1e-5),
    ("+proj=eqearth +ellps=WGS84", (-170, 170), (-85, 85), 5e-3),
    # EPSG extension methods (operations/extensions.py)
    ("+proj=col_urban +ellps=GRS80 +lat_0=4.68 +lon_0=-74.15 +h_0=2550",
     (-76, -72), (2, 7), 1e-4),
    ("+proj=mod_krovak +czech +ellps=bessel", (13, 23), (47, 52), 1e-4),
    ("+proj=tm_zoned +ellps=WGS84 +lon_init=-180 +zone_width=6 +k_0=0.9996 "
     "+x_0=500000", (-179, 179), (-80, 84), 1e-5),
    ("+proj=cass +hyperbolic +ellps=intl +lat_0=-16.25 +lon_0=179.33",
     (177, 179.9), (-19, -14), 0.1),
    ("+proj=tunisia_mining +a=6378249.2 +rf=293.466 +lat_0=32.93696 "
     "+lon_0=7.051005 +x_0=270000 +y_0=360000", (6, 12), (30, 38), 1e-6),
]

M_PER_DEG = 111319.49


@pytest.mark.parametrize("projstring,lon_r,lat_r,tol",
                         ROUNDTRIP_OPS,
                         ids=[o[0].split()[0] for o in ROUNDTRIP_OPS])
@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_roundtrip_property(projstring, lon_r, lat_r, tol, data):
    op = create(projstring)
    lon = data.draw(st.floats(*lon_r, allow_nan=False))
    lat = data.draw(st.floats(*lat_r, allow_nan=False))
    x, y = op.fwd_deg(np.array([lon]), np.array([lat]))
    assert np.isfinite(x[0]) and np.isfinite(y[0]), (lon, lat)
    lon2, lat2 = op.inv_deg(x, y)
    dlon = abs(lon2[0] - lon) * np.cos(np.radians(lat)) * M_PER_DEG
    dlat = abs(lat2[0] - lat) * M_PER_DEG
    assert dlon < tol and dlat < tol, (lon, lat, dlon, dlat)


@settings(max_examples=60, deadline=None)
@given(lat1=st.floats(-89, 89), lon1=st.floats(-180, 180),
       lat2=st.floats(-89, 89), lon2=st.floats(-180, 180))
def test_geodesic_inverse_direct_property(lat1, lon1, lat2, lon2):
    from proj_spark.operations.karney import Geodesic
    g = Geodesic(6378137.0, 1 / 298.257223563)
    d2r = np.pi / 180
    s12, azi1, _ = g.inverse(np.array([lat1 * d2r]), np.array([lon1 * d2r]),
                             np.array([lat2 * d2r]), np.array([lon2 * d2r]))
    glat, glon, _ = g.direct(np.array([lat1 * d2r]), np.array([lon1 * d2r]),
                             azi1, s12)
    dlat = abs(glat[0] - lat2 * d2r)
    dlon = abs(np.remainder(glon[0] - lon2 * d2r + np.pi, 2 * np.pi) - np.pi)
    assert np.hypot(dlat, dlon * np.cos(lat2 * d2r)) * 6.4e6 < 1e-6


@given(lon=st.floats(-179.9, 179.9), lat=st.floats(-80, 80))
@settings(max_examples=200, deadline=None)
def test_factors_lcc_matches_closed_form(lon, lat):
    """proj_factors (central differences) vs the closed-form LCC scale
    k = n*rho/m across the whole driver-query domain — guards the
    stencil against branch/clamp mistakes the 6-point unit test misses."""
    from proj_spark import mathutils as mu
    from proj_spark.operations.factors import factors
    op = create("+proj=lcc +lat_1=33 +lat_2=45 +ellps=GRS80")
    lam = np.radians(np.array([lon]))
    phi = np.radians(np.array([lat]))
    f = factors(op, lam, phi)
    rho = op.c * np.power(mu.tsfn(phi, np.sin(phi), op.e), op.n)
    m = mu.msfn(np.sin(phi), np.cos(phi), op.es)
    k = float((op.n * rho / m)[0])
    assert abs(f["k"][0] - k) < 1e-6 * max(1.0, k)
    assert abs(f["h"][0] - k) < 1e-6 * max(1.0, k)
    assert abs(f["conv"][0] - float(lam[0]) * op.n) < 1e-9


@given(lat1=st.floats(-85, 85), lon1=st.floats(-179, 179),
       dlat=st.floats(-5, 5), dlon=st.floats(-5, 5))
@settings(max_examples=200, deadline=None)
def test_sphere_geodesic_matches_great_circle(lat1, lon1, dlat, dlon):
    """Karney f=0 vs closed-form great circle on arbitrary nearby pairs
    (the geod_pairs oracle identity, fuzzed)."""
    from proj_spark.operations.karney import Geodesic
    g = Geodesic(6370997.0, 0.0)
    lat2 = min(max(lat1 + dlat, -89.0), 89.0)
    lon2 = lon1 + dlon
    if lat1 == lat2 and lon1 == lon2:
        return
    s12, _, _ = g.inverse(np.radians([lat1]), np.radians([lon1]),
                          np.radians([lat2]), np.radians([lon2]))
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dl = np.radians(lon2) - np.radians(lon1)
    num = np.cos(p1) * np.sin(p2) - np.sin(p1) * np.cos(p2) * np.cos(dl)
    sig = np.arctan2(np.hypot(np.cos(p2) * np.sin(dl), num),
                     np.sin(p1) * np.sin(p2)
                     + np.cos(p1) * np.cos(p2) * np.cos(dl))
    assert abs(float(s12[0]) - 6370997.0 * float(sig)) < 1e-6
