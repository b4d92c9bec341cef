"""WKT2 / PROJJSON export round-trips: every emitted document re-parses
through the engine's own reader into an operation whose forward results
match the original (io.cpp WKTFormatter/JSONFormatter analogue)."""

from __future__ import annotations

import numpy as np
import pytest

from proj_spark import create
from proj_spark.wkt import from_user_input
from proj_spark.wkt_export import to_projjson_str, to_wkt2

DEFS = [
    "+proj=utm +zone=32 +ellps=GRS80",
    "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 "
    "+y_0=-100000 +ellps=airy",
    "+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 +x_0=700000 "
    "+y_0=6600000 +ellps=GRS80",
    "+proj=lcc +lat_1=18 +lat_0=18 +lon_0=-77 +k_0=1 +x_0=250000 "
    "+y_0=150000 +ellps=clrk66",
    "+proj=merc +lat_ts=30 +ellps=WGS84",
    "+proj=merc +k=0.9993 +ellps=WGS84",
    "+proj=webmerc +ellps=WGS84",
    "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 "
    "+ellps=WGS84",
    "+proj=stere +lat_0=-90 +k=0.994 +lon_0=0 +x_0=2000000 +y_0=2000000 "
    "+ellps=WGS84",
    "+proj=sterea +lat_0=52.1561605555556 +lon_0=5.38763888888889 "
    "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel",
    "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +ellps=GRS80",
    "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80",
    "+proj=cass +lat_0=10.4416666666667 +lon_0=-61.3333333333333 "
    "+x_0=86501.46 +y_0=65379.13 +a=6378293.645208759 +rf=294.26",
    "+proj=eqearth +ellps=WGS84",
    "+proj=col_urban +lat_0=4.68048611111111 +lon_0=-74.1465916666667 "
    "+x_0=92334.879 +y_0=109320.965 +h_0=2550 +ellps=GRS80",
    "+proj=longlat +ellps=bessel",
    "+proj=longlat +ellps=bessel +pm=ferro",
    # non-metric CS units must survive the round-trip
    "+proj=utm +zone=32 +ellps=GRS80 +units=us-ft",
    "+proj=cass +lat_0=-16.25 +lon_0=179.33333333 +x_0=251727.9155424 "
    "+y_0=334519.953768 +a=6378306.3696 +b=6356571.996 "
    "+to_meter=0.201168",
]

PTS = (np.array([-77.0, 3.1, 12.5, 16.9]),
       np.array([18.5, 46.0, 52.2, 50.1]))


@pytest.mark.parametrize("definition", DEFS)
def test_wkt2_roundtrip(definition):
    orig = create(definition)
    wkt = to_wkt2(definition)
    back = create(from_user_input(wkt))
    x0, y0 = orig.fwd_deg(*PTS)
    x1, y1 = back.fwd_deg(*PTS)
    np.testing.assert_allclose(x1, x0, rtol=0, atol=1e-6)
    np.testing.assert_allclose(y1, y0, rtol=0, atol=1e-6)


@pytest.mark.parametrize("definition", DEFS)
def test_projjson_roundtrip(definition):
    orig = create(definition)
    js = to_projjson_str(definition)
    back = create(from_user_input(js))
    x0, y0 = orig.fwd_deg(*PTS)
    x1, y1 = back.fwd_deg(*PTS)
    np.testing.assert_allclose(x1, x0, rtol=0, atol=1e-6)
    np.testing.assert_allclose(y1, y0, rtol=0, atol=1e-6)


def test_projinfo_wkt2_output(capsys):
    from proj_spark.__main__ import main
    assert main(["projinfo", "-o", "wkt2", "EPSG:32632"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("PROJCRS[")
    assert 'METHOD["Transverse Mercator",ID["EPSG",9807]]' in out
    assert main(["projinfo", "-o", "projjson", "EPSG:32632"]) == 0
    out = capsys.readouterr().out
    assert '"type": "ProjectedCRS"' in out


ESRI_DEFS = [d for d in DEFS if not d.startswith((
    "+proj=stere ", "+proj=eqearth", "+proj=col_urban"))]


@pytest.mark.parametrize("definition", ESRI_DEFS)
def test_wkt1_esri_roundtrip(definition):
    from proj_spark.wkt_export import to_wkt1_esri
    orig = create(definition)
    wkt = to_wkt1_esri(definition)
    assert wkt.startswith(("PROJCS[", "GEOGCS["))
    back = create(from_user_input(wkt))
    x0, y0 = orig.fwd_deg(*PTS)
    x1, y1 = back.fwd_deg(*PTS)
    np.testing.assert_allclose(x1, x0, rtol=0, atol=1e-6)
    np.testing.assert_allclose(y1, y0, rtol=0, atol=1e-6)


def test_esri_registry_text_definition_matches_epsg_twin():
    """ESRI:102100 is vendored as an ESRI WKT1 text definition; lowering
    it must agree with its EPSG twin 3857 (the reference supersession
    registry maps them, data/sql/esri.sql)."""
    a = create("ESRI:102100")
    b = create("EPSG:3857")
    lon = np.array([2.0, -74.0, 151.2])
    lat = np.array([49.0, 40.7, -33.9])
    xa, ya = a.fwd_deg(lon, lat)
    xb, yb = b.fwd_deg(lon, lat)
    np.testing.assert_allclose(xa, xb, rtol=0, atol=1e-6)
    np.testing.assert_allclose(ya, yb, rtol=0, atol=1e-6)


def test_ignf_lamb93_matches_epsg_2154():
    a = create("IGNF:LAMB93")
    b = create("EPSG:2154")
    lon = np.array([3.0, 2.35, 5.4, -1.55])
    lat = np.array([46.5, 48.85, 43.3, 47.22])
    xa, ya = a.fwd_deg(lon, lat)
    xb, yb = b.fwd_deg(lon, lat)
    # IGNF lists the standard parallels in the opposite order from the
    # legacy EPSG:2154 definition; LCC is symmetric in them but the
    # evaluation order leaves ~2e-11 relative floating-point noise
    np.testing.assert_allclose(xa, xb, rtol=1e-9)
    np.testing.assert_allclose(ya, yb, rtol=1e-9)


def test_urn_and_case_insensitive_authorities():
    import proj_spark.epsg as epsg
    assert "utm" in epsg.resolve("urn:ogc:def:crs:EPSG::32632")
    assert epsg.resolve("ignf:LAMB93") == epsg.resolve("IGNF:LAMB93")
    with pytest.raises(NotImplementedError):
        epsg.resolve("NOAUTH:12345")
