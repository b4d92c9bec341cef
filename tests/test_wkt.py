"""WKT1 / WKT2 / PROJJSON input lowering (proj_spark.wkt).

Each format must produce an operation numerically identical to the
equivalent proj-string/EPSG definition; unsupported methods and
parameters must raise, never guess.
"""

from __future__ import annotations

import numpy as np
import pytest

from proj_spark import create
from proj_spark.wkt import from_user_input, parse_wkt

WKT1_UTM32 = '''PROJCS["WGS 84 / UTM zone 32N",
    GEOGCS["WGS 84",
        DATUM["WGS_1984",
            SPHEROID["WGS 84",6378137,298.257223563],
            TOWGS84[0,0,0,0,0,0,0]],
        PRIMEM["Greenwich",0],
        UNIT["degree",0.0174532925199433]],
    PROJECTION["Transverse_Mercator"],
    PARAMETER["latitude_of_origin",0],
    PARAMETER["central_meridian",9],
    PARAMETER["scale_factor",0.9996],
    PARAMETER["false_easting",500000],
    PARAMETER["false_northing",0],
    UNIT["metre",1],
    AXIS["Easting",EAST],
    AXIS["Northing",NORTH]]'''

WKT2_UTM32 = '''PROJCRS["WGS 84 / UTM zone 32N",
    BASEGEOGCRS["WGS 84",
        DATUM["World Geodetic System 1984",
            ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],
        PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]]],
    CONVERSION["UTM zone 32N",
        METHOD["Transverse Mercator",ID["EPSG",9807]],
        PARAMETER["Latitude of natural origin",0,
            ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8801]],
        PARAMETER["Longitude of natural origin",9,
            ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8802]],
        PARAMETER["Scale factor at natural origin",0.9996,
            SCALEUNIT["unity",1],ID["EPSG",8805]],
        PARAMETER["False easting",500000,LENGTHUNIT["metre",1],
            ID["EPSG",8806]],
        PARAMETER["False northing",0,LENGTHUNIT["metre",1],
            ID["EPSG",8807]]],
    CS[Cartesian,2],
    AXIS["(E)",east,ORDER[1],LENGTHUNIT["metre",1]],
    AXIS["(N)",north,ORDER[2],LENGTHUNIT["metre",1]]]'''

PROJJSON_UTM32 = '''{"type":"ProjectedCRS","name":"WGS 84 / UTM zone 32N",
"base_crs":{"type":"GeographicCRS","datum":{"type":"GeodeticReferenceFrame",
"name":"WGS84","ellipsoid":{"name":"WGS 84","semi_major_axis":6378137,
"inverse_flattening":298.257223563}}},
"conversion":{"name":"UTM zone 32N","method":{"name":"Transverse Mercator",
"id":{"authority":"EPSG","code":9807}},
"parameters":[
 {"name":"Latitude of natural origin","value":0,
  "id":{"authority":"EPSG","code":8801}},
 {"name":"Longitude of natural origin","value":9,
  "id":{"authority":"EPSG","code":8802}},
 {"name":"Scale factor at natural origin","value":0.9996,
  "id":{"authority":"EPSG","code":8805}},
 {"name":"False easting","value":500000,
  "id":{"authority":"EPSG","code":8806}},
 {"name":"False northing","value":0,
  "id":{"authority":"EPSG","code":8807}}]}}'''


@pytest.mark.parametrize("definition",
                         [WKT1_UTM32, WKT2_UTM32, PROJJSON_UTM32],
                         ids=["wkt1", "wkt2", "projjson"])
def test_utm32_all_formats(definition):
    op = create(definition)
    ref = create("EPSG:32632")
    x, y = op.fwd_deg(np.array([12.0]), np.array([56.0]))
    rx, ry = ref.fwd_deg(np.array([12.0]), np.array([56.0]))
    assert abs(x[0] - rx[0]) < 1e-6 and abs(y[0] - ry[0]) < 1e-6


def test_wkt1_osgb_with_towgs84():
    wkt = '''PROJCS["OSGB 1936 / British National Grid",
        GEOGCS["OSGB 1936",
            DATUM["OSGB_1936",
                SPHEROID["Airy 1830",6377563.396,299.3249646],
                TOWGS84[446.448,-125.157,542.06,0.15,0.247,0.842,-20.489]],
            PRIMEM["Greenwich",0],
            UNIT["degree",0.0174532925199433]],
        PROJECTION["Transverse_Mercator"],
        PARAMETER["latitude_of_origin",49],
        PARAMETER["central_meridian",-2],
        PARAMETER["scale_factor",0.9996012717],
        PARAMETER["false_easting",400000],
        PARAMETER["false_northing",-100000],
        UNIT["metre",1]]'''
    op = create(wkt)
    ref = create("EPSG:27700")
    lon, lat = np.array([-0.0015]), np.array([51.4778])
    x, y = op.fwd_deg(lon, lat)
    rx, ry = ref.fwd_deg(lon, lat)
    assert abs(x[0] - rx[0]) < 1e-6 and abs(y[0] - ry[0]) < 1e-6
    # the towgs84 chain must be active (datum-shifted vs plain airy)
    assert op.datum_chain is not None


def test_wkt1_lambert93_2sp():
    wkt = '''PROJCS["RGF93 / Lambert-93",
        GEOGCS["RGF93",
            DATUM["Reseau_Geodesique_Francais_1993",
                SPHEROID["GRS 1980",6378137,298.257222101],
                TOWGS84[0,0,0,0,0,0,0]],
            PRIMEM["Greenwich",0],
            UNIT["degree",0.0174532925199433]],
        PROJECTION["Lambert_Conformal_Conic_2SP"],
        PARAMETER["latitude_of_false_origin",46.5],
        PARAMETER["longitude_of_false_origin",3],
        PARAMETER["standard_parallel_1",49],
        PARAMETER["standard_parallel_2",44],
        PARAMETER["easting_at_false_origin",700000],
        PARAMETER["northing_at_false_origin",6600000],
        UNIT["metre",1]]'''
    op = create(wkt)
    ref = create("EPSG:2154")
    lon, lat = np.array([2.3522]), np.array([48.8566])
    x, y = op.fwd_deg(lon, lat)
    rx, ry = ref.fwd_deg(lon, lat)
    assert abs(x[0] - rx[0]) < 1e-6 and abs(y[0] - ry[0]) < 1e-6


def test_wkt1_polar_stereographic_variant_b():
    wkt = '''PROJCS["NSIDC Sea Ice Polar Stereographic North",
        GEOGCS["WGS 84",
            DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],
            PRIMEM["Greenwich",0],
            UNIT["degree",0.0174532925199433]],
        PROJECTION["Polar_Stereographic"],
        PARAMETER["latitude_of_standard_parallel",70],
        PARAMETER["longitude_of_origin",-45],
        PARAMETER["false_easting",0],
        PARAMETER["false_northing",0],
        UNIT["metre",1]]'''
    op = create(wkt)
    ref = create("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 "
                 "+ellps=WGS84 +units=m")
    lon, lat = np.array([-30.0]), np.array([75.0])
    x, y = op.fwd_deg(lon, lat)
    rx, ry = ref.fwd_deg(lon, lat)
    assert abs(x[0] - rx[0]) < 1e-6 and abs(y[0] - ry[0]) < 1e-6


def test_wkt1_unit_feet():
    # projected CRS in US survey feet: outputs must scale (fr_meter path)
    wkt = '''PROJCS["ft-grid",
        GEOGCS["WGS 84",
            DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],
            PRIMEM["Greenwich",0],
            UNIT["degree",0.0174532925199433]],
        PROJECTION["Transverse_Mercator"],
        PARAMETER["latitude_of_origin",0],
        PARAMETER["central_meridian",9],
        PARAMETER["scale_factor",0.9996],
        PARAMETER["false_easting",1640416.666666667],
        PARAMETER["false_northing",0],
        UNIT["US survey foot",0.3048006096012192]]'''
    op = create(wkt)
    m = create("EPSG:32632")
    x, y = op.fwd_deg(np.array([12.0]), np.array([56.0]))
    xm, ym = m.fwd_deg(np.array([12.0]), np.array([56.0]))
    # false easting 1640416.667 usft ~ 500000 m
    assert abs(x[0] * 0.3048006096012192 - xm[0]) < 0.02
    assert abs(y[0] * 0.3048006096012192 - ym[0]) < 1e-6


def test_geogcs_and_prime_meridian():
    s = from_user_input(
        'GEOGCS["NTF (Paris)",DATUM["Nouvelle_Triangulation_Francaise_Paris",'
        'SPHEROID["Clarke 1880 (IGN)",6378249.2,293.4660212936269]],'
        'PRIMEM["Paris",2.33722917],UNIT["grad",0.01570796326794897]]')
    assert "+proj=longlat" in s and "+pm=2.33722917" in s


def test_unknown_method_raises():
    wkt = '''PROJCS["x",GEOGCS["WGS 84",DATUM["WGS_1984",
        SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],
        UNIT["degree",0.0174532925199433]],
        PROJECTION["Made_Up_Projection"],UNIT["metre",1]]'''
    with pytest.raises(NotImplementedError):
        create(wkt)


def test_unknown_parameter_raises():
    wkt = WKT1_UTM32.replace('PARAMETER["scale_factor"',
                             'PARAMETER["mystery_knob"')
    with pytest.raises(NotImplementedError):
        create(wkt)


def test_node_parser_structure():
    n = parse_wkt('A["s1",1.5,B["s2",2],C[3,"s3"]]')
    assert n.name == "A"
    assert n.strings() == ["s1"]
    assert n.numbers() == [1.5]
    assert n.child("B").numbers() == [2.0]
    assert n.child("C").strings() == ["s3"]
