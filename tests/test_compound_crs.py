"""Compound / vertical / bound CRS end-to-end (round-2 verdict item #3).

The reference models CompoundCRS/VerticalCRS/BoundCRS as first-class
objects (src/iso19111/crs.cpp; data/sql/compound_crs.sql,
vertical_crs.sql) and lowers +geoidgrids into a vgridshift step
(src/4D_api.cpp:560-696).  The engine lowers the same WKT2/WKT1 nodes
to proj-strings executing through the existing datum chain + GTX
loader; the synthetic-geoid test asserts BIT-FOR-BIT equality against
the hand-built cart -> helmert -> cart -> vgridshift pipeline.
"""

from __future__ import annotations

import numpy as np
import pytest

from proj_spark import create
from proj_spark.wkt import from_user_input

TW = "598.1,73.7,418.2,0.202,0.045,-2.455,6.7"
TW7 = [float(v) for v in TW.split(",")]


@pytest.fixture()
def syngeoid(tmp_path):
    """Deterministic synthetic geoid over Europe, registered as
    syn_geoid.gtx."""
    from proj_spark.grids import register_grid_file, write_gtx
    from proj_spark.operations import datum as datum_mod
    yy, xx = np.mgrid[0:21, 0:31]
    und = 40.0 + 5.0 * np.sin(yy * 0.3) + 3.0 * np.cos(xx * 0.2)
    p = tmp_path / "syn_geoid.gtx"
    write_gtx(str(p), 40.0, -5.0, 0.5, 0.5, und)
    register_grid_file("syn_geoid.gtx", str(p))
    yield "syn_geoid.gtx"
    datum_mod.GRID_REGISTRY.pop("syn_geoid.gtx", None)


COMPOUND_WKT2 = """COMPOUNDCRS["DHDN + synthetic geoid",
  GEOGCRS["DHDN",DATUM["Deutsches Hauptdreiecksnetz",
    ELLIPSOID["Bessel 1841",6377397.155,299.1528128,
              LENGTHUNIT["metre",1]],
    TOWGS84[{tw}]],
    CS[ellipsoidal,2],
    AXIS["geodetic latitude (Lat)",north],
    AXIS["geodetic longitude (Lon)",east],
    ANGLEUNIT["degree",0.0174532925199433]],
  VERTCRS["synthetic height",VDATUM["synthetic geoid"],
    CS[vertical,1],AXIS["gravity-related height (H)",up],
    LENGTHUNIT["metre",1],GEOIDMODEL["syn_geoid.gtx"]]]""".format(tw=TW)


def test_compound_lowering(syngeoid):
    s = from_user_input(COMPOUND_WKT2)
    assert "+proj=longlat" in s
    assert "+towgs84=" + TW in s.replace(" +geoidgrids", ",geoid") or \
        "+towgs84=" in s
    assert "+geoidgrids=syn_geoid.gtx" in s


def test_compound_equals_handbuilt_pipeline_bitwise(syngeoid):
    """The compound transform must equal the hand-built
    cart(WGS84) -> helmert^-1 -> cart^-1(bessel) -> vgridshift pipeline
    BIT-FOR-BIT (identical kernels, identical order)."""
    comp = create(from_user_input(COMPOUND_WKT2))
    pipe = create(
        "+proj=pipeline "
        "+step +proj=cart +ellps=WGS84 "
        f"+step +inv +proj=helmert +x={TW7[0]} +y={TW7[1]} +z={TW7[2]} "
        f"+rx={TW7[3]} +ry={TW7[4]} +rz={TW7[5]} +s={TW7[6]} "
        "+convention=position_vector +exact "
        "+step +inv +proj=cart +ellps=bessel "
        "+step +proj=vgridshift +grids=syn_geoid.gtx")
    lam = np.radians(np.array([6.0, 9.5, 2.2, 7.77]))
    phi = np.radians(np.array([47.5, 48.9, 44.4, 49.01]))
    z = np.array([100.0, 0.0, -30.0, 512.25])
    cx, cy, cz = comp.fwd3d(lam, phi, z)
    px, py, pz, _ = pipe.fwd4d(lam, phi, z)
    assert np.array_equal(cx, px)
    assert np.array_equal(cy, py)
    assert np.array_equal(cz, pz)
    assert not np.any(np.isnan(cz))
    # and the inverse closes
    bx, by, bz = comp.inv3d(cx, cy, cz)
    assert np.allclose(bx, lam, atol=1e-12)
    assert np.allclose(by, phi, atol=1e-12)
    assert np.allclose(bz, z, atol=1e-6)


def test_boundcrs_roundtrip(syngeoid):
    """to_wkt2 of a towgs84+geoidgrids definition emits
    BOUNDCRS[COMPOUNDCRS[...]] that re-parses to the same semantics."""
    from proj_spark.wkt_export import to_wkt2
    d = ("+proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=3500000 +y_0=0 "
         f"+ellps=bessel +towgs84={TW} +geoidgrids=syn_geoid.gtx")
    w = to_wkt2(d, "GK3h")
    assert w.startswith("BOUNDCRS[")
    assert "COMPOUNDCRS[" in w and 'GEOIDMODEL["syn_geoid.gtx"]' in w
    a = create(d)
    b = create(from_user_input(w))
    lam = np.radians(np.array([8.4, 9.9]))
    phi = np.radians(np.array([48.7, 51.3]))
    z = np.array([240.0, 88.0])
    ax, ay, az = a.fwd3d(lam, phi, z)
    bx, by, bz = b.fwd3d(lam, phi, z)
    np.testing.assert_allclose(bx, ax, rtol=0, atol=1e-6)
    np.testing.assert_allclose(by, ay, rtol=0, atol=1e-6)
    np.testing.assert_allclose(bz, az, rtol=0, atol=1e-6)


def test_wkt1_compd_cs_parse():
    """WKT1 COMPD_CS: horizontal + VERT_CS (no grid info in WKT1 —
    heights pass through with the vertical unit honored)."""
    w = ('COMPD_CS["OSGB + ODN",PROJCS["OSGB 1936",'
         'GEOGCS["OSGB 1936",DATUM["OSGB_1936",'
         'SPHEROID["Airy 1830",6377563.396,299.3249646],'
         'TOWGS84[446.448,-125.157,542.06,0.15,0.247,0.842,-20.489]],'
         'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
         'PROJECTION["Transverse_Mercator"],'
         'PARAMETER["latitude_of_origin",49],'
         'PARAMETER["central_meridian",-2],'
         'PARAMETER["scale_factor",0.9996012717],'
         'PARAMETER["false_easting",400000],'
         'PARAMETER["false_northing",-100000],UNIT["metre",1]],'
         'VERT_CS["ODN height",VERT_DATUM["Ordnance Datum Newlyn",2005],'
         'UNIT["metre",1],AXIS["Up",UP]]]')
    s = from_user_input(w)
    assert s.startswith("+proj=tmerc")
    assert "+towgs84=" in s
    # numeric check on the projection geometry alone (the datum hop
    # shifts WGS84 input before projecting, so strip it here)
    bare = " ".join(t for t in s.split() if not t.startswith("+towgs84"))
    op = create(bare)
    x, y = op.fwd_deg(np.array([-2.0]), np.array([49.0]))
    assert abs(x[0] - 400000.0) < 1e-6 and abs(y[0] + 100000.0) < 1e-6
    create(s)  # the datum-qualified form compiles too


def test_vertical_only_crs_refused():
    with pytest.raises(NotImplementedError, match="vertical-only"):
        from_user_input('VERTCRS["h",VDATUM["x"],CS[vertical,1],'
                        'AXIS["up",up],LENGTHUNIT["metre",1]]')


def test_epsg_compound_code_lowers_horizontal(syngeoid):
    """EPSG:3903 (ETRS89 / TM35FIN + N2000 height): the compound code
    lowers to its horizontal definition; without a registered geoid
    grid heights pass through (documented degradation)."""
    from proj_spark.factory import crs_definition
    s = crs_definition(3903)
    assert "+proj=utm" in s or "+proj=tmerc" in s
    assert "+geoidgrids" not in s
    create(s)


def test_epsg_compound_code_attaches_registered_grid(tmp_path):
    """When the vertical CRS's geoid grid IS registered, the compound
    code gains +geoidgrids (EPSG:9707 = WGS84 + EGM96 height via
    us_nga_egm96_15.tif in grid_transformation)."""
    from proj_spark.factory import catalog, crs_definition, normalize_code
    from proj_spark.grids import register_grid_file, write_gtx
    from proj_spark.operations import datum as datum_mod
    cat = catalog()
    # find a compound whose vertical CRS has a grid_transformation row
    target = None
    for code, comp in cat["compound_crs"].items():
        if comp["deprecated"] or ":" in code:
            continue
        for g in cat["grid_transformation"].values():
            if g["deprecated"] or not g["grid"]:
                continue
            if comp["vert"] in (g["src"], g["dst"]):
                target = (code, comp, g["grid"])
                break
        if target:
            break
    assert target, "no compound CRS with a grid transformation found"
    code, comp, grid = target
    und = np.full((3, 3), 17.0)
    p = tmp_path / "t.gtx"
    write_gtx(str(p), -90.0, -180.0, 90.0, 180.0, und)
    register_grid_file(grid, str(p))
    try:
        s = crs_definition(code)
        assert f"+geoidgrids={grid}" in s
        create(s)
    finally:
        datum_mod.GRID_REGISTRY.pop(grid, None)
