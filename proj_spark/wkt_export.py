"""WKT2 / PROJJSON export — the output half of the reference's io layer
(src/iso19111/io.cpp WKTFormatter/JSONFormatter; projinfo -o wkt2/
projjson).  Covers the projection methods users exchange CRS text for;
exporting an op outside the table raises NotImplementedError rather
than emitting something another tool would misread.

Round-trip guarantee (tested): every emitted document re-parses through
proj_spark.wkt.from_user_input into an operation whose forward results
match the original bit-for-bit — method/parameter names are chosen from
the same METHODS/PARAMS tables the parser consumes.

Datum shifts (+towgs84) export as a WKT2 BoundCRS wrapper (abridged
transformation to WGS 84) and +geoidgrids as a CompoundCRS with a
GEOIDMODEL-bearing VertCRS — both re-parse through proj_spark.wkt into
the same proj-string semantics (see tests/test_compound_crs.py).
"""

from __future__ import annotations

import json
import math

from proj_spark.ellipsoids import ellipsoid_from_params
from proj_spark.projstring import parse_projstring

#: proj name -> (EPSG method name, EPSG method code,
#:               [(proj key, EPSG parameter name, code, kind)])
#: kind: "ang" (degree), "len" (metre), "scale" (unity)
_NAT = [("lat_0", "Latitude of natural origin", "8801", "ang"),
        ("lon_0", "Longitude of natural origin", "8802", "ang"),
        ("k_0", "Scale factor at natural origin", "8805", "scale"),
        ("x_0", "False easting", "8806", "len"),
        ("y_0", "False northing", "8807", "len")]
#: methods whose EPSG definition has no scale factor (merc B, webmerc)
_NAT_NO_K = [p for p in _NAT if p[0] != "k_0"]
_FALSE_ORIGIN = [("lat_0", "Latitude of false origin", "8821", "ang"),
                 ("lon_0", "Longitude of false origin", "8822", "ang"),
                 ("lat_1", "Latitude of 1st standard parallel", "8823", "ang"),
                 ("lat_2", "Latitude of 2nd standard parallel", "8824", "ang"),
                 ("x_0", "Easting at false origin", "8826", "len"),
                 ("y_0", "Northing at false origin", "8827", "len")]

METHOD_EXPORT: dict[str, tuple[str, str, list]] = {
    "tmerc": ("Transverse Mercator", "9807", _NAT),
    "etmerc": ("Transverse Mercator", "9807", _NAT),
    "merc": ("Mercator (variant A)", "9804", _NAT),
    "webmerc": ("Popular Visualisation Pseudo Mercator", "1024",
                _NAT_NO_K),
    "laea": ("Lambert Azimuthal Equal Area", "9820", _NAT),
    "aeqd": ("Modified Azimuthal Equidistant", "9832", _NAT),
    "sterea": ("Oblique Stereographic", "9809", _NAT),
    "cass": ("Cassini-Soldner", "9806", _NAT),
    "poly": ("American Polyconic", "9818", _NAT),
    "nzmg": ("New Zealand Map Grid", "9811", _NAT),
    "eqearth": ("Equal Earth", "1078", _NAT),
    "col_urban": ("Colombia Urban", "1052",
                  _NAT + [("h_0", "Projection plane origin height",
                           "1039", "len")]),
    "aea": ("Albers Equal Area", "9822", _FALSE_ORIGIN),
    "krovak": ("Krovak", "9819",
               [("lat_0", "Latitude of projection centre", "8811", "ang"),
                ("lon_0", "Longitude of origin", "8833", "ang"),
                ("alpha", "Co-latitude of cone axis", "1036", "ang"),
                ("lat_ts", "Latitude of pseudo standard parallel",
                 "8818", "ang"),
                ("k_0", "Scale factor on pseudo standard parallel",
                 "8819", "scale"),
                ("x_0", "False easting", "8806", "len"),
                ("y_0", "False northing", "8807", "len")]),
}


def _method_for(params: dict) -> tuple[str, str, list]:
    proj = params["proj"]
    if proj == "utm":
        from proj_spark.operations.tmerc import utm_params
        return METHOD_EXPORT["tmerc"], utm_params(dict(params))
    if proj == "lcc":
        if "lat_2" in params:
            return ("Lambert Conic Conformal (2SP)", "9802",
                    _FALSE_ORIGIN), params
        return ("Lambert Conic Conformal (1SP)", "9801",
                [("lat_1", "Latitude of natural origin", "8801", "ang")]
                + _NAT[1:]), params
    if proj == "merc" and "lat_ts" in params:
        return ("Mercator (variant B)", "9805",
                [("lat_ts", "Latitude of 1st standard parallel",
                  "8823", "ang")] + _NAT_NO_K[1:]), params
    if proj == "stere":
        lat0 = float(params.get("lat_0", 0.0))
        if abs(lat0) == 90.0 and "lat_ts" in params:
            return ("Polar Stereographic (variant B)", "9829",
                    [("lat_ts", "Latitude of standard parallel",
                      "8832", "ang"),
                     ("lon_0", "Longitude of origin", "8833", "ang"),
                     ("x_0", "False easting", "8806", "len"),
                     ("y_0", "False northing", "8807", "len")]), params
        if abs(lat0) == 90.0:
            return ("Polar Stereographic (variant A)", "9810",
                    _NAT), params
    if proj in METHOD_EXPORT:
        return METHOD_EXPORT[proj], params
    raise NotImplementedError(
        f"WKT export for +proj={proj} not supported")


def _pval(params: dict, key: str) -> float:
    if key in ("k_0",):
        return float(params.get("k_0", params.get("k", 1.0)))
    v = params.get(key, 0.0)
    try:
        return float(v)
    except (TypeError, ValueError):
        from proj_spark.operations.cs2cs import dms_to_deg
        return dms_to_deg(str(v))


def _parse(definition: str) -> dict:
    if definition.strip().upper().startswith("EPSG:"):
        from proj_spark import epsg
        definition = epsg.resolve(definition.strip())
    return parse_projstring(definition)


def _num(v: float) -> str:
    return repr(float(v))


def _cs_to_meter(params: dict) -> float:
    """Resolve the CS linear unit like the engine does at op setup:
    +to_meter wins, else a named +units, else metre."""
    if "to_meter" in params:
        from proj_spark.operations.cs2cs import parse_to_meter
        return parse_to_meter(params["to_meter"])
    if "units" in params:
        from proj_spark.operations.simple import UNITS_TO_METER
        name = str(params["units"])
        if name not in UNITS_TO_METER:
            raise NotImplementedError(f"unknown unit {name!r}")
        return UNITS_TO_METER[name]
    return 1.0


_WGS84_GEOGCRS = ('GEOGCRS["WGS 84",DATUM["World Geodetic System 1984",'
                  'ELLIPSOID["WGS 84",6378137.0,298.257223563,'
                  'LENGTHUNIT["metre",1]]],CS[ellipsoidal,2],'
                  'AXIS["geodetic latitude (Lat)",north],'
                  'AXIS["geodetic longitude (Lon)",east],'
                  'ANGLEUNIT["degree",0.0174532925199433],'
                  'ID["EPSG",4326]]')

#: towgs84 slot -> (WKT2 parameter name, EPSG code, unit wkt)
_ABRIDGED_EXPORT = [
    ("X-axis translation", "8605"), ("Y-axis translation", "8606"),
    ("Z-axis translation", "8607"), ("X-axis rotation", "8608"),
    ("Y-axis rotation", "8609"), ("Z-axis rotation", "8610"),
    ("Scale difference", "8611"),
]


def to_wkt2(definition: str, name: str = "unknown") -> str:
    """proj-string (or authority code) -> WKT2:2019 text.

    +towgs84 exports as a BOUNDCRS wrapper (abridged transformation to
    WGS 84), +geoidgrids as a COMPOUNDCRS with a GEOIDMODEL-bearing
    VERTCRS — both re-parse through proj_spark.wkt.from_user_input to
    the same proj-string semantics (reference: WKTFormatter BoundCRS /
    CompoundCRS export, src/iso19111/io.cpp)."""
    params = _parse(definition)
    towgs84 = params.pop("towgs84", None)
    geoid = params.pop("geoidgrids", None)
    core = _to_wkt2_core(params, name)
    if geoid is not None:
        vert = (f'VERTCRS["{name} height",VDATUM["unknown"],'
                f'CS[vertical,1],'
                f'AXIS["gravity-related height (H)",up],'
                f'LENGTHUNIT["metre",1],GEOIDMODEL["{geoid}"]]')
        core = f'COMPOUNDCRS["{name}",{core},{vert}]'
    if towgs84 is not None:
        from proj_spark.operations.cs2cs import parse_towgs84
        tw = parse_towgs84(towgs84)
        plist = []
        for slot, (pname, pcode) in enumerate(_ABRIDGED_EXPORT):
            v = tw[slot]
            if slot >= 3 and tw[3:] == [0.0] * 4:
                break               # pure 3-param form
            if slot == 6:
                v = 1.0 + v * 1e-6  # abridged scale = (1 + ds_ppm*1e-6)
            plist.append(f'PARAMETER["{pname}",{_num(v)},'
                         f'ID["EPSG",{pcode}]]')
        tr = (f'ABRIDGEDTRANSFORMATION["Transformation to WGS84",'
              f'METHOD["Position Vector transformation"],'
              + ",".join(plist) + "]")
        core = (f'BOUNDCRS[SOURCECRS[{core}],'
                f'TARGETCRS[{_WGS84_GEOGCRS}],{tr}]')
    return core


def _to_wkt2_core(params: dict, name: str) -> str:
    ell = ellipsoid_from_params(params)
    rf = 0.0 if ell.f == 0.0 else 1.0 / ell.f
    ell_wkt = (f'ELLIPSOID["{ell.name or "unknown"}",{_num(ell.a)},'
               f'{_num(rf)},LENGTHUNIT["metre",1]]')
    pm = ""
    if "pm" in params:
        from proj_spark.operations.cs2cs import parse_pm
        pm_deg = math.degrees(parse_pm(params["pm"]))
        pm = (f',PRIMEM["unknown",{_num(pm_deg)},'
              f'ANGLEUNIT["degree",0.0174532925199433]]')
    geog = (f'BASEGEOGCRS["{name}",DATUM["unknown",{ell_wkt}]{pm},'
            f'ANGLEUNIT["degree",0.0174532925199433]]')
    if params["proj"] in ("longlat", "latlong", "latlon", "lonlat"):
        return (f'GEOGCRS["{name}",DATUM["unknown",{ell_wkt}]{pm},'
                f'CS[ellipsoidal,2],'
                f'AXIS["geodetic latitude (Lat)",north],'
                f'AXIS["geodetic longitude (Lon)",east],'
                f'ANGLEUNIT["degree",0.0174532925199433]]')
    (mname, mcode, ptable), params = _method_for(params)
    plist = []
    for key, pname, pcode, kind in ptable:
        v = _pval(params, key)
        unit = {"ang": 'ANGLEUNIT["degree",0.0174532925199433]',
                "len": 'LENGTHUNIT["metre",1]',
                "scale": 'SCALEUNIT["unity",1]'}[kind]
        plist.append(f'PARAMETER["{pname}",{_num(v)},{unit},'
                     f'ID["EPSG",{pcode}]]')
    conv = (f'CONVERSION["unknown",METHOD["{mname}",ID["EPSG",{mcode}]],'
            + ",".join(plist) + "]")
    to_meter = _cs_to_meter(params)
    unit_name = "metre" if to_meter == 1.0 else "unknown"
    return (f'PROJCRS["{name}",{geog},{conv},CS[Cartesian,2],'
            f'AXIS["(E)",east],AXIS["(N)",north],'
            f'LENGTHUNIT["{unit_name}",{_num(to_meter)}]]')


#: EPSG parameter name -> ESRI WKT1 PARAMETER spelling (both directions
#: are understood by proj_spark.wkt PARAMS, so the round-trip is closed)
_ESRI_PARAM = {
    "Latitude of natural origin": "Latitude_Of_Origin",
    "Longitude of natural origin": "Central_Meridian",
    "Scale factor at natural origin": "Scale_Factor",
    "False easting": "False_Easting",
    "False northing": "False_Northing",
    "Latitude of false origin": "Latitude_Of_Origin",
    "Longitude of false origin": "Central_Meridian",
    "Latitude of 1st standard parallel": "Standard_Parallel_1",
    "Latitude of 2nd standard parallel": "Standard_Parallel_2",
    "Easting at false origin": "False_Easting",
    "Northing at false origin": "False_Northing",
    "Projection plane origin height": "Height",
}

#: proj name -> ESRI PROJECTION name (subset with exact ESRI analogues)
_ESRI_PROJECTION = {
    "tmerc": "Transverse_Mercator", "etmerc": "Transverse_Mercator",
    "lcc": "Lambert_Conformal_Conic",
    "merc": "Mercator",
    "webmerc": "Mercator_Auxiliary_Sphere",
    "laea": "Lambert_Azimuthal_Equal_Area",
    "aeqd": "Azimuthal_Equidistant",
    "sterea": "Double_Stereographic",
    "cass": "Cassini_Soldner",
    "poly": "Polyconic",
    "aea": "Albers",
}


def to_wkt1_esri(definition: str, name: str = "unknown") -> str:
    """proj-string (or authority code) -> ESRI WKT1 text (the dialect of
    data/sql/esri.sql text definitions; reference exporter analogue:
    src/iso19111/io.cpp WKTFormatter Convention::WKT1_ESRI).  Emitted
    documents re-parse through proj_spark.wkt.from_user_input into an
    operation whose forward results match within 1e-6 m (tested — the
    same round-trip contract as to_wkt2; the sub-µm residue is the
    1/f -> rf decimal representation)."""
    params = _parse(definition)
    ell = ellipsoid_from_params(params)
    rf = 0.0 if ell.f == 0.0 else 1.0 / ell.f
    ell_name = (ell.name or "unknown").replace(" ", "_")
    pm_deg = 0.0
    if "pm" in params:
        from proj_spark.operations.cs2cs import parse_pm
        pm_deg = math.degrees(parse_pm(params["pm"]))
    geogcs = (f'GEOGCS["GCS_{name}",DATUM["D_{name}",'
              f'SPHEROID["{ell_name}",{_num(ell.a)},{_num(rf)}]],'
              f'PRIMEM["Greenwich",{_num(pm_deg)}],'
              f'UNIT["Degree",0.0174532925199433]]')
    if params["proj"] in ("longlat", "latlong", "latlon", "lonlat"):
        return geogcs
    (mname, mcode, ptable), params = _method_for(params)
    proj = params["proj"] if params["proj"] != "utm" else "tmerc"
    esri_proj = _ESRI_PROJECTION.get(proj)
    if esri_proj is None:
        raise NotImplementedError(
            f"ESRI WKT1 export for +proj={proj} not supported")
    to_meter_cs = _cs_to_meter(params)
    plist = []
    for key, pname, pcode, kind in ptable:
        ename = _ESRI_PARAM.get(pname)
        if ename is None:
            raise NotImplementedError(
                f"ESRI WKT1 export: parameter {pname!r} has no ESRI name")
        v = _pval(params, key)
        if kind == "len":
            # WKT1 expresses lengths in the PROJCS UNIT (the parser
            # multiplies back by the unit factor); proj +x_0/+y_0 are
            # always metres
            v = v / to_meter_cs
        plist.append(f'PARAMETER["{ename}",{_num(v)}]')
    if proj == "webmerc":
        plist.append('PARAMETER["Auxiliary_Sphere_Type",0.0]')
    unit = ('UNIT["Meter",1.0]' if to_meter_cs == 1.0
            else f'UNIT["unknown",{_num(to_meter_cs)}]')
    return (f'PROJCS["{name}",{geogcs},PROJECTION["{esri_proj}"],'
            + ",".join(plist) + f",{unit}]")


def to_projjson(definition: str, name: str = "unknown") -> dict:
    """proj-string (or EPSG:code) -> PROJJSON dict."""
    params = _parse(definition)
    ell = ellipsoid_from_params(params)
    ell_obj: dict = {"name": ell.name or "unknown",
                     "semi_major_axis": ell.a}
    if ell.f == 0.0:
        ell_obj["semi_minor_axis"] = ell.b
    else:
        ell_obj["inverse_flattening"] = 1.0 / ell.f
    datum: dict = {"type": "GeodeticReferenceFrame", "name": "unknown",
                   "ellipsoid": ell_obj}
    if "pm" in params:
        from proj_spark.operations.cs2cs import parse_pm
        datum["prime_meridian"] = {
            "name": "unknown",
            "longitude": math.degrees(parse_pm(params["pm"]))}
    geog = {"type": "GeographicCRS", "name": name, "datum": datum}
    if params["proj"] in ("longlat", "latlong", "latlon", "lonlat"):
        return geog
    (mname, mcode, ptable), params = _method_for(params)
    to_meter = _cs_to_meter(params)
    cs_unit: str | dict = "metre" if to_meter == 1.0 else {
        "type": "LinearUnit", "name": "unknown",
        "conversion_factor": to_meter}
    parameters = []
    for key, pname, pcode, kind in ptable:
        unit = {"ang": "degree", "len": "metre", "scale": "unity"}[kind]
        parameters.append({"name": pname, "value": _pval(params, key),
                           "unit": unit,
                           "id": {"authority": "EPSG",
                                  "code": int(pcode)}})
    return {
        "type": "ProjectedCRS",
        "name": name,
        "base_crs": geog,
        "conversion": {
            "name": "unknown",
            "method": {"name": mname,
                       "id": {"authority": "EPSG", "code": int(mcode)}},
            "parameters": parameters,
        },
        "coordinate_system": {
            "subtype": "Cartesian",
            "axis": [
                {"name": "Easting", "abbreviation": "E",
                 "direction": "east", "unit": cs_unit},
                {"name": "Northing", "abbreviation": "N",
                 "direction": "north", "unit": cs_unit},
            ],
        },
    }


def to_projjson_str(definition: str, name: str = "unknown") -> str:
    return json.dumps(to_projjson(definition, name), indent=2)
