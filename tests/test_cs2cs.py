"""cs2cs-emulation modifiers: vendored vectors from the reference's
test/gie/4D-API_cs2cs-style.gie plus unit tests for +pm / +units /
+to_meter / +axis / +lon_wrap / +datum / +geoc handling.

Reference semantics: src/4D_api.cpp:560-696 (cs2cs_emulation_setup),
src/fwd.cpp:41-154, src/inv.cpp:39-143.  Grid-backed blocks (nadgrids/
geoidgrids with unavailable files) are expected to raise — mirroring the
gie runs' `ignore pjd_err_failed_to_load_grid`.
"""

from __future__ import annotations

import numpy as np
import pytest

from proj_spark import create

D2R = np.pi / 180.0


def deg3d(op, lon, lat, h):
    lam, phi, z = op.fwd3d(np.array([lon * D2R]), np.array([lat * D2R]),
                           np.array([float(h)]))
    return np.degrees(lam)[0], np.degrees(phi)[0], z[0]


def test_towgs84_ed50_etrs89():
    # 4D-API_cs2cs-style.gie:41-53 (KMStrans2 ED50->ETRS89), tolerance 25 mm
    op = create("+proj=latlong +ellps=intl "
                "+towgs84=-081.07030,-089.36030,-115.75260,"
                "000.48488,000.02436,000.41321,-0.540645")
    lon, lat, h = deg3d(op, 16.82, 55.17, 61.0)
    m_per_deg = 111319.49
    assert abs(lon - 16.8210462130) * m_per_deg * np.cos(55.17 * D2R) < 0.025
    assert abs(lat - 55.1705688946) * m_per_deg < 0.025
    assert abs(h - 29.0317) < 0.025


def test_towgs84_somerc():
    # 4D-API_cs2cs-style.gie:170-177 (github user c0nk), tolerance 20 cm
    op = create("+proj=somerc +lat_0=46.95240555555556 "
                "+lon_0=7.439583333333333 +k_0=1 +x_0=2600000 +y_0=1200000 "
                "+ellps=bessel +towgs84=674.374,15.056,405.346")
    x, y = op.fwd_deg(np.array([7.438632495]), np.array([46.951082877]))
    assert abs(x[0] - 2600000.0) < 0.2 and abs(y[0] - 1200000.0) < 0.2


def test_datum_pipeline_ggrs87():
    # 4D-API_cs2cs-style.gie:252-259 (+datum in pipelines, #872), 20 cm
    p = create("+proj=pipeline +step +proj=longlat +datum=GGRS87 +inv "
               "+step +proj=longlat +datum=WGS84")
    lam, phi, z, _ = p.fwd4d(np.array([23.7275 * D2R]),
                             np.array([37.9838 * D2R]), np.array([0.0]), None)
    assert abs(np.degrees(lam)[0] - 23.729194873180) * 111319.49 < 0.2
    assert abs(np.degrees(phi)[0] - 37.986398897578) * 111319.49 < 0.2
    assert abs(z[0] - 31.289740102) < 0.2


def test_null_towgs84_still_changes_ellipsoid():
    # 4D-API_cs2cs-style.gie:262-272: +towgs84=0,0,0 still implies cart hop
    p = create("+proj=pipeline "
               "+step +proj=utm +zone=11 +ellps=clrk66 +towgs84=0,0,0 +inv "
               "+step +proj=utm +zone=11 +datum=WGS84")
    x, y, z, _ = p.fwd4d(np.array([440720.0]), np.array([3751320.0]),
                         np.array([0.0]), None)
    assert abs(x[0] - 440719.958709357) < 0.2
    assert abs(y[0] - 3751294.2109841) < 0.2
    assert abs(z[0] - -4.44340920541435) < 0.2


def test_unitconvert_pipeline_km():
    # 4D-API_cs2cs-style.gie:286-291
    p = create("+proj=pipeline +step +proj=merc +ellps=WGS84 "
               "+step +proj=unitconvert +xy_in=m +xy_out=km")
    x, y = p.fwd(np.array([12.0 * D2R]), np.array([56.0 * D2R]))
    assert abs(x[0] - 1335.8339) < 1e-3 and abs(y[0] - 7522.963) < 1e-2


def test_units_on_projection():
    base = create("+proj=merc +ellps=WGS84")
    km = create("+proj=merc +ellps=WGS84 +units=km")
    usft = create("+proj=merc +ellps=WGS84 +units=us-ft")
    lon, lat = np.array([12.0]), np.array([56.0])
    xm, ym = base.fwd_deg(lon, lat)
    xk, yk = km.fwd_deg(lon, lat)
    xf, yf = usft.fwd_deg(lon, lat)
    assert np.allclose([xk[0], yk[0]], [xm[0] / 1000, ym[0] / 1000])
    assert np.allclose([xf[0], yf[0]],
                       [xm[0] / 0.304800609601219, ym[0] / 0.304800609601219])
    # false eastings scale too (reference: fr_meter * (x + x0))
    k0 = create("+proj=merc +ellps=WGS84 +x_0=500000 +units=km")
    xk0, _ = k0.fwd_deg(lon, lat)
    assert np.isclose(xk0[0], (xm[0] + 500000) / 1000)
    # roundtrip through the same units
    lo, la = usft.inv_deg(xf, yf)
    assert abs(lo[0] - 12.0) < 1e-9 and abs(la[0] - 56.0) < 1e-9


def test_to_meter_ratio_notation():
    op = create("+proj=merc +ellps=WGS84 +to_meter=1/3.28083333333333")
    base = create("+proj=merc +ellps=WGS84")
    x, y = op.fwd_deg(np.array([2.0]), np.array([10.0]))
    xm, ym = base.fwd_deg(np.array([2.0]), np.array([10.0]))
    assert np.isclose(x[0], xm[0] * 3.28083333333333)


def test_prime_meridian():
    paris = 2 + 20 / 60 + 14.025 / 3600
    op = create("+proj=latlong +ellps=GRS80 +pm=paris")
    lam, phi = op.fwd_deg(np.array([2.5]), np.array([48.0]))
    assert abs(np.degrees(lam)[0] - (2.5 - paris)) < 1e-12
    # numeric +pm, and inverse adds it back
    op2 = create("+proj=merc +ellps=WGS84 +pm=7.5")
    x, y = op2.fwd_deg(np.array([10.0]), np.array([0.0]))
    xb, _ = create("+proj=merc +ellps=WGS84").fwd_deg(np.array([2.5]),
                                                      np.array([0.0]))
    assert np.isclose(x[0], xb[0])
    lo, la = op2.inv_deg(x, y)
    assert abs(lo[0] - 10.0) < 1e-9


@pytest.mark.parametrize("spec", ["neu", "wsu", "enu", "seu", "ned"])
def test_axis_roundtrip(spec):
    op = create(f"+proj=merc +ellps=WGS84 +axis={spec}")
    lon, lat = np.array([12.0, -33.0]), np.array([56.0, -7.0])
    x, y, z = op.fwd3d(lon * D2R, lat * D2R, np.array([10.0, -5.0]))
    lam, phi, z2 = op.inv3d(x, y, z)
    assert np.allclose(np.degrees(lam), lon, atol=1e-9)
    assert np.allclose(np.degrees(phi), lat, atol=1e-9)
    assert np.allclose(z2, [10.0, -5.0], atol=1e-9)


def test_axis_neu_values():
    swapped = create("+proj=merc +ellps=WGS84 +axis=neu")
    plain = create("+proj=merc +ellps=WGS84")
    x, y = swapped.fwd_deg(np.array([12.0]), np.array([56.0]))
    xe, yn = plain.fwd_deg(np.array([12.0]), np.array([56.0]))
    assert x[0] == yn[0] and y[0] == xe[0]


def test_axis_rejects_bad_spec():
    with pytest.raises(ValueError):
        create("+proj=merc +ellps=WGS84 +axis=nne")
    with pytest.raises(ValueError):
        create("+proj=merc +ellps=WGS84 +axis=enq")


def test_lon_wrap():
    op = create("+proj=latlong +ellps=GRS80 +lon_wrap=180")
    lam, phi = op.fwd_deg(np.array([-170.0]), np.array([10.0]))
    assert abs(np.degrees(lam)[0] - 190.0) < 1e-12


def test_geoc_modifier():
    op = create("+proj=latlong +ellps=GRS80 +geoc")
    lam, phi, _ = op.fwd3d(np.array([10.0 * D2R]), np.array([45.0 * D2R]),
                           None)
    # input geocentric latitude 45 -> geographic is LARGER on an ellipsoid
    assert np.degrees(phi)[0] > 45.0
    lam2, phi2, _ = op.inv3d(lam, phi, None)
    assert abs(np.degrees(phi2)[0] - 45.0) < 1e-12


def test_datum_expansion_and_grid_rejection():
    op = create("+proj=longlat +datum=GGRS87")
    assert op.datum_chain is not None
    # +datum=NAD27's grid list is all-@-optional (reference '@' grid
    # semantics, src/grids.cpp): with no grid files present it degrades
    # to a pure ellipsoid change instead of erroring
    nad27 = create("+proj=longlat +datum=NAD27")
    assert nad27.hgridshifts == []
    with pytest.raises(NotImplementedError):
        # a NON-optional missing grid still refuses loudly
        create("+proj=longlat +ellps=clrk66 +nadgrids=conus")
    with pytest.raises(NotImplementedError):
        create("+proj=longlat +ellps=GRS80 +nadgrids=nzgd2kgrid0005.gsb")
    with pytest.raises(NotImplementedError):
        create("+proj=merc +ellps=GRS80 +geoidgrids=egm96_15.gtx")
    with pytest.raises(NotImplementedError):
        create("+proj=merc +ellps=WGS84 +units=smoots")


def test_dms_parsing():
    from proj_spark.operations.cs2cs import dms_to_deg
    assert abs(dms_to_deg("2d20'14.025\"E") - 2.3372291666667) < 1e-10
    assert dms_to_deg("17d40'W") == -(17 + 40 / 60)
    assert dms_to_deg("-3.5") == -3.5
    assert dms_to_deg("9d07'54.862\"W") == -(9 + 7 / 60 + 54.862 / 3600)
    with pytest.raises(ValueError):
        dms_to_deg("not-an-angle")


def test_malformed_pipeline_rejected():
    # 4D-API_cs2cs-style.gie:276-284: unit-incompatible step sequences
    # must fail at construction (pjd_err_malformed_pipeline)
    with pytest.raises(ValueError):
        create("+proj=pipeline +step +proj=merc +step +proj=merc")
    with pytest.raises(ValueError):
        create("+proj=pipeline +step +proj=latlong +step +proj=merc "
               "+step +proj=helmert +x=200 +y=100")
    # ...while the unitconvert-terminated pipeline stays valid (:286-291)
    p = create("+proj=pipeline +step +proj=merc +ellps=WGS84 "
               "+step +proj=unitconvert +xy_in=m +xy_out=km")
    x, y = p.fwd(np.array([np.radians(12.0)]), np.array([np.radians(56.0)]))
    assert abs(x[0] - 1335.8339) < 1e-3


def test_dms_positional_fields():
    """proj_dmstor positional-fallback semantics: an unsuffixed field
    takes the next-finer unit than the one before it."""
    from proj_spark.operations.cs2cs import dms_to_deg
    assert dms_to_deg("30d30") == 30.5                  # bare minutes
    assert abs(dms_to_deg("-36d52'11.6315")
               + (36 + 52 / 60 + 11.6315 / 3600)) < 1e-12   # bare seconds
    assert dms_to_deg("55d00'00.000") == 55.0
    assert dms_to_deg("12d30'10.5\"N") == 12 + 30 / 60 + 10.5 / 3600
    with pytest.raises(ValueError):
        dms_to_deg("12x34")
