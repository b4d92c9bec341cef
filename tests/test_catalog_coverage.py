"""Catalog-wide coverage: the vendored EPSG registry must keep resolving
and compiling, and a deterministic sample must round-trip.

Floors (bump as coverage grows):
  - ALL active projected CRSs create() successfully (methods outside the
    reference's own registry — Colombia Urban, Krovak Modified, TM
    Zoned, topocentric, Tunisia Mining, LCC Belgium, Hyperbolic Cassini
    — are implemented from EPSG GN7-2 in operations/extensions.py);
  - a deterministic every-31st sample round-trips fwd/inv near each
    CRS's natural origin to < 1e-6 deg.
"""

from __future__ import annotations

import re

import numpy as np
import pytest

from proj_spark import create
from proj_spark.factory import catalog, crs_definition


def _active_codes(authority: str | None = None):
    """Non-deprecated projected CRS keys — EPSG (bare numeric keys,
    sorted numerically) by default, or one namespaced authority."""
    cat = catalog()
    if authority:
        return sorted(c for c, p in cat["projected_crs"].items()
                      if c.startswith(authority + ":")
                      and not p["deprecated"])
    return [c for c, p in sorted(
        ((c, p) for c, p in cat["projected_crs"].items() if ":" not in c),
        key=lambda kv: int(kv[0])) if not p["deprecated"]]


def test_catalog_create_floor():
    ok = 0
    total = 0
    for code in _active_codes():
        total += 1
        try:
            create(crs_definition(code))
            ok += 1
        except (NotImplementedError, ValueError, KeyError):
            pass
    print(f"catalog create coverage: {ok}/{total}")
    assert ok == total, f"{ok}/{total}"


def _origin_of(definition: str) -> tuple[float, float]:
    m = re.search(r"\+lon_0=([-\d.eE+]+)", definition)
    lon0 = float(m.group(1)) if m else 0.0
    m = re.search(r"\+lonc=([-\d.eE+]+)", definition)
    if m:
        lon0 = float(m.group(1))
    m = re.search(r"\+lat_0=([-\d.eE+]+)", definition)
    lat0 = float(m.group(1)) if m else 0.0
    m = re.search(r"\+lat_1=([-\d.eE+]+)", definition)
    if m and abs(lat0) < 1e-9:
        lat0 = float(m.group(1))
    if abs(lat0) < 1:
        lat0 = 15.0
    return lon0, max(min(lat0, 84.0), -84.0)


def test_catalog_sample_roundtrips():
    codes = _active_codes()[::31]
    tried = passed = 0
    bad = []
    for code in codes:
        try:
            d = crs_definition(code)
            op = create(d)
        except (NotImplementedError, ValueError, KeyError):
            continue
        lon0, lat0 = _origin_of(d)
        lon = lon0 + 0.4
        lat = lat0 - 0.4
        # stay inside [-180, 180] so the wrap does not confuse the compare
        if abs(lon) > 179.0:
            lon = 178.6 if lon > 0 else -178.6
        tried += 1
        try:
            x, y = op.fwd_deg(np.array([lon]), np.array([lat]))
            if not (np.isfinite(x[0]) and np.isfinite(y[0])):
                bad.append((code, "nan fwd"))
                continue
            lo, la = op.inv_deg(x, y)
            if abs(lo[0] - lon) < 1e-6 and abs(la[0] - lat) < 1e-6:
                passed += 1
            else:
                bad.append((code, (float(lo[0]), float(la[0]), lon, lat)))
        except NotImplementedError:
            tried -= 1   # no inverse for this projection family
        except Exception as exc:
            bad.append((code, f"{type(exc).__name__}: {exc}"))
    print(f"catalog sample roundtrips: {passed}/{tried}; problems: {bad[:5]}")
    # allow a small tail of series-truncation edge cases far from the
    # projection's validity domain
    assert tried >= 120
    assert passed >= tried - 3, bad[:10]


def test_polar_stereographic_variant_c():
    """EPSG 9830's defining property: the false origin lies at the
    standard parallel / central meridian intersection (Terre Adelie)."""
    import numpy as np
    op = create(crs_definition(2985))
    x, y = op.fwd_deg(np.array([140.0]), np.array([-67.0]))
    assert abs(x[0] - 300000.0) < 1e-6 and abs(y[0] - 200000.0) < 1e-6


def test_esri_authority_create_floor():
    """ESRI registry (vendored from the reference's data/sql/esri.sql):
    >= 98% of active ESRI projected CRSs compile; the remainder are the
    novelty projections (Fuller, Berghaus star, cube, ...) refused
    loudly."""
    codes = _active_codes("ESRI")
    assert len(codes) > 1000
    ok = 0
    for code in codes:
        try:
            create(crs_definition(code))
            ok += 1
        except NotImplementedError:
            pass
    assert ok / len(codes) >= 0.98, f"{ok}/{len(codes)}"


def test_ignf_authority_create_floor():
    """IGNF registry (data/sql/ignf.sql): every active projected CRS
    compiles — including the Gauss-Schreiber TM (gstmerc) and
    PROJ-method (mill) conversions."""
    codes = _active_codes("IGNF")
    assert len(codes) > 250
    for code in codes:
        create(crs_definition(code))
