"""WKT1 / WKT2 / PROJJSON input: lower CRS text to a proj-string.

The reference parses WKT with a hand-written recursive-descent node
parser (`WKTParser`, src/iso19111/io.cpp:6086) and PROJJSON with a JSON
walker (io.cpp:8937 region), then exports the CRS to a proj-string for
execution (src/iso19111/c_api.cpp:172-203 — the logical plan is
serialized and re-parsed into the physical plan).  This module does the
same lowering directly: parse the node tree, identify the projection
method (by WKT1 PROJECTION name, WKT2 METHOD name, or EPSG method code),
map the parameters (EPSG parameter codes/names -> proj keys), resolve
ellipsoid/datum/prime-meridian/unit, and emit the proj-string that
`create()` compiles.

Method and parameter identifiers are public EPSG registry data (the
same codes the reference ships in its coordinateoperation constants).
Unsupported methods raise NotImplementedError — never a silent guess.
"""

from __future__ import annotations

import json
import re


# ---------------------------------------------------------------------------
# WKT node parser (shared by WKT1 and WKT2 — same bracket grammar)
# ---------------------------------------------------------------------------

class Node:
    __slots__ = ("name", "values")

    def __init__(self, name: str, values: list):
        self.name = name
        self.values = values

    def children(self, name: str) -> list["Node"]:
        u = name.upper()
        return [v for v in self.values
                if isinstance(v, Node) and v.name.upper() == u]

    def child(self, *names: str) -> "Node | None":
        for n in names:
            c = self.children(n)
            if c:
                return c[0]
        return None

    def strings(self) -> list[str]:
        return [v for v in self.values if isinstance(v, str)]

    def numbers(self) -> list[float]:
        return [v for v in self.values if isinstance(v, float)]


_TOKEN = re.compile(r'"((?:[^"]|"")*)"|([A-Za-z_][A-Za-z0-9_]*)'
                    r'|([-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?)|([\[\](),])')


def parse_wkt(text: str) -> Node:
    """Bracketed WKT node tree -> Node (WKT1 and WKT2 share the shape)."""
    pos = 0
    n = len(text)

    def tokens():
        nonlocal pos
        while pos < n:
            m = _TOKEN.match(text, pos)
            if m is None:
                if text[pos].isspace():
                    pos += 1
                    continue
                raise ValueError(f"WKT parse error at {pos}: {text[pos:pos+20]!r}")
            pos = m.end()
            if m.group(1) is not None:
                yield ("str", m.group(1).replace('""', '"'))
            elif m.group(2) is not None:
                yield ("kw", m.group(2))
            elif m.group(3) is not None:
                yield ("num", float(m.group(3)))
            else:
                yield ("punc", m.group(4))

    it = tokens()

    def _parse_body(name: str, it) -> Node:
        values: list = []
        while True:
            tok = next(it, None)
            if tok is None:
                raise ValueError("unterminated WKT node")
            kind, val = tok
            if kind == "punc" and val in "])":
                return Node(name, values)
            if kind == "punc" and val == ",":
                continue
            if kind == "kw":
                nxt = next(it, None)
                if nxt is not None and nxt[0] == "punc" and nxt[1] in "[(":
                    values.append(_parse_body(val, it))
                else:
                    values.append(val)
                    if nxt is not None:
                        kind2, val2 = nxt
                        if kind2 == "punc" and val2 in "])":
                            return Node(name, values)
                        if not (kind2 == "punc" and val2 == ","):
                            values.append(val2)
            else:
                values.append(val)

    first = next(it)
    if first[0] != "kw":
        raise ValueError("WKT must start with a keyword")
    opening = next(it, None)
    if opening is None or opening[0] != "punc" or opening[1] not in "[(":
        raise ValueError("expected '[' after the root keyword")
    return _parse_body(first[1], it)


# ---------------------------------------------------------------------------
# method + parameter identification (public EPSG codes/names)
# ---------------------------------------------------------------------------

#: (wkt1 PROJECTION name | wkt2 METHOD name | EPSG method code) -> proj name
METHODS: dict[str, str] = {
    "transverse_mercator": "tmerc", "transverse mercator": "tmerc",
    "9807": "tmerc",
    "mercator_1sp": "merc", "mercator (variant a)": "merc", "9804": "merc",
    "mercator_2sp": "merc", "mercator (variant b)": "merc", "9805": "merc",
    "popular visualisation pseudo mercator": "webmerc", "1024": "webmerc",
    "mercator_auxiliary_sphere": "webmerc",
    "lambert_conformal_conic_1sp": "lcc",
    "lambert conic conformal (1sp)": "lcc", "9801": "lcc",
    "lambert_conformal_conic_2sp": "lcc",
    "lambert conic conformal (2sp)": "lcc", "9802": "lcc",
    "albers_conic_equal_area": "aea", "albers equal area": "aea",
    "9822": "aea",
    "lambert_azimuthal_equal_area": "laea",
    "lambert azimuthal equal area": "laea", "9820": "laea",
    "azimuthal_equidistant": "aeqd", "modified azimuthal equidistant": "aeqd",
    "9832": "aeqd",
    "polar_stereographic": "stere", "polar stereographic (variant a)": "stere",
    "9810": "stere", "polar stereographic (variant b)": "stere",
    "9829": "stere", "polar stereographic (variant c)": "stere",
    "9830": "stere",
    "oblique_stereographic": "sterea", "oblique stereographic": "sterea",
    "9809": "sterea",
    "stereographic": "stere",
    "cassini_soldner": "cass", "cassini-soldner": "cass", "9806": "cass",
    "equirectangular": "eqc", "equidistant cylindrical": "eqc", "1028": "eqc",
    "equidistant cylindrical (spherical)": "eqc", "1029": "eqc",
    "hotine_oblique_mercator": "omerc",
    "hotine oblique mercator (variant a)": "omerc", "9812": "omerc",
    "hotine_oblique_mercator_azimuth_center": "omerc",
    "hotine oblique mercator (variant b)": "omerc", "9815": "omerc",
    "swiss_oblique_cylindrical": "somerc", "9814": "somerc",
    "krovak": "krovak", "9819": "krovak",
    "sinusoidal": "sinu", "mollweide": "moll", "robinson": "robin",
    "cylindrical_equal_area": "cea",
    "lambert cylindrical equal area": "cea", "9835": "cea",
    "gnomonic": "gnom", "orthographic": "ortho", "9840": "ortho",
    "new_zealand_map_grid": "nzmg", "new zealand map grid": "nzmg",
    "9811": "nzmg",
    "polyconic": "poly", "american polyconic": "poly", "9818": "poly",
    "equal earth": "eqearth", "1078": "eqearth",
    "lambert azimuthal equal area (spherical)": "laea", "1027": "laea",
    "bonne": "bonne", "9827": "bonne",
    "bonne (south orientated)": "bonne", "9828": "bonne",
    "guam projection": "aeqd", "9831": "aeqd",
    "lambert_conformal_conic_1sp_near": "lcca",
    "lambert conic near-conformal": "lcca", "9817": "lcca",
    "laborde_oblique_mercator": "labrd",
    "laborde oblique mercator": "labrd", "9813": "labrd",
    "9834": "cea",   # Lambert Cylindrical Equal Area (Spherical)
    # EPSG methods beyond the reference's registry (operations/extensions.py)
    "colombia urban": "col_urban", "1052": "col_urban",
    "krovak modified": "mod_krovak", "1042": "mod_krovak",
    "krovak modified (north orientated)": "mod_krovak", "1043": "mod_krovak",
    "transverse mercator zoned grid system": "tm_zoned", "9824": "tm_zoned",
    "geographic/topocentric conversions": "topocentric", "9837": "topocentric",
    "geocentric/topocentric conversions": "topocentric", "9836": "topocentric",
    "tunisia mining grid": "tunisia_mining", "9816": "tunisia_mining",
    "lambert conic conformal (2sp belgium)": "lcc",
    "lambert_conformal_conic_2sp_belgium": "lcc", "9803": "lcc",
    "hyperbolic cassini-soldner": "cass", "9833": "cass",
    # ESRI WKT1 spellings (data/sql/esri.sql text definitions; the
    # reference maps them in src/iso19111/io.cpp ESRI tables)
    "lambert_conformal_conic": "lcc",       # ESRI uses one name for 1/2SP
    "double_stereographic": "sterea",
    "mercator": "merc",
    "gauss_kruger": "tmerc",
    "albers": "aea",
    "cassini": "cass",
    "equidistant_cylindrical": "eqc", "plate_carree": "eqc",
    "equidistant_conic": "eqdc",
    "equal_earth": "eqearth",
    "miller_cylindrical": "mill",
    "eckert_i": "eck1", "eckert_ii": "eck2", "eckert_iii": "eck3",
    "eckert_iv": "eck4", "eckert_v": "eck5", "eckert_vi": "eck6",
    "gall_stereographic": "gall",
    "times": "times",
    "winkel_i": "wink1", "winkel_ii": "wink2", "winkel_tripel": "wintri",
    "van_der_grinten_i": "vandg",
    "natural_earth": "natearth", "natural_earth_ii": "natearth2",
    "compact_miller": "comill", "patterson": "patterson",
    "hammer_aitoff": "hammer", "aitoff": "aitoff",
    "loximuthal": "loxim",
    "craster_parabolic": "crast",
    "flat_polar_quartic": "mbtfpq",
    "quartic_authalic": "qua_aut",
    "behrmann": "cea",
    "wagner_iv": "wag4", "wagner_v": "wag5", "wagner_vii": "wag7",
    "goode_homolosine": "goode",
    "transverse_mercator_complex": "etmerc",   # ESRI's exact-TM spelling
    "stereographic_north_pole": "stere", "stereographic_south_pole": "stere",
    "vertical_near_side_perspective": "nsper",
    "two_point_equidistant": "tpeqd",
    "rectified_skew_orthomorphic_natural_origin": "omerc",
    "hotine_oblique_mercator_two_point_natural_origin": "omerc",
    "gauss schreiber transverse mercator": "gstmerc",   # IGNF (PROJ gstm)
    "gstm": "gstmerc", "mill": "mill",                  # IGNF PROJ-method codes
}

#: WKT1 method-specific parameter respellings applied BEFORE the global
#: PARAMS table (ESRI dialect quirks where the same parameter name means
#: a different proj key per projection)
_METHOD_PARAM_REMAP: dict[str, dict[str, str | None]] = {
    "equidistant_cylindrical": {"standard_parallel_1": "lat_ts"},
    "behrmann": {"standard_parallel_1": "lat_ts"},
    "stereographic_north_pole": {"standard_parallel_1": "lat_ts"},
    "stereographic_south_pole": {"standard_parallel_1": "lat_ts"},
    "loximuthal": {"central_parallel": "lat_1"},
    "vertical_near_side_perspective": {"height": "h"},
    "two_point_equidistant": {
        "latitude_of_1st_point": "lat_1",
        "longitude_of_1st_point": "lon_1",
        "latitude_of_2nd_point": "lat_2",
        "longitude_of_2nd_point": "lon_2"},
    "rectified_skew_orthomorphic_natural_origin": {
        "xy_plane_rotation": "gamma"},
    "hotine_oblique_mercator_two_point_natural_origin": {
        "latitude_of_1st_point": "lat_1",
        "longitude_of_1st_point": "lon_1",
        "latitude_of_2nd_point": "lat_2",
        "longitude_of_2nd_point": "lon_2"},
    "goode_homolosine": {"option": None},   # 0/1 handled below, 2 refused
}

#: (wkt1 PARAMETER name | wkt2 name | EPSG parameter code) -> proj key
PARAMS: dict[str, str] = {
    "latitude_of_origin": "lat_0", "latitude of natural origin": "lat_0",
    "8801": "lat_0",
    "central_meridian": "lon_0", "longitude of natural origin": "lon_0",
    "8802": "lon_0",
    "scale_factor": "k", "scale factor at natural origin": "k",
    "8805": "k",
    "false_easting": "x_0", "false easting": "x_0", "8806": "x_0",
    "false_northing": "y_0", "false northing": "y_0", "8807": "y_0",
    "standard_parallel_1": "lat_1",
    "latitude of 1st standard parallel": "lat_1", "8823": "lat_1",
    "standard_parallel_2": "lat_2",
    "latitude of 2nd standard parallel": "lat_2", "8824": "lat_2",
    "latitude_of_false_origin": "lat_0",
    "latitude of false origin": "lat_0", "8821": "lat_0",
    "longitude_of_false_origin": "lon_0",
    "longitude of false origin": "lon_0", "8822": "lon_0",
    "easting_at_false_origin": "x_0", "easting at false origin": "x_0",
    "8826": "x_0",
    "northing_at_false_origin": "y_0", "northing at false origin": "y_0",
    "8827": "y_0",
    "latitude_of_standard_parallel": "lat_ts",
    "latitude of standard parallel": "lat_ts", "8832": "lat_ts",
    "longitude_of_origin": "lon_0", "longitude of origin": "lon_0",
    "8833": "lon_0",
    "latitude_of_center": "lat_0",
    "latitude of projection centre": "lat_0", "8811": "lat_0",
    "longitude_of_center": "lonc",
    "longitude of projection centre": "lonc", "8812": "lonc",
    "azimuth": "alpha", "azimuth of initial line": "alpha", "8813": "alpha",
    "rectified_grid_angle": "gamma",
    "angle from rectified to skew grid": "gamma", "8814": "gamma",
    "scale_factor_on_initial_line": "k",
    "scale factor on initial line": "k", "8815": "k",
    "easting_at_projection_centre": "x_0",
    "easting at projection centre": "x_0", "8816": "x_0",
    "northing_at_projection_centre": "y_0",
    "northing at projection centre": "y_0", "8817": "y_0",
    "pseudo_standard_parallel_1": "lat_ts",  # krovak
    "latitude of pseudo standard parallel": "lat_ts", "8818": "lat_ts",
    "co-latitude of cone axis": "alpha", "1036": "alpha",
    "colatitude_of_cone_axis": "alpha",
    "scale_factor_pseudo_standard_parallel": "k",
    "scale factor on pseudo standard parallel": "k", "8819": "k",
    # extension-method parameters
    "projection plane origin height": "h_0", "1039": "h_0",
    "initial longitude": "lon_init", "8830": "lon_init",
    "zone width": "zone_width", "8831": "zone_width",
    "latitude of topocentric origin": "lat_0", "8834": "lat_0",
    "longitude of topocentric origin": "lon_0", "8835": "lon_0",
    "ellipsoidal height of topocentric origin": "h_0", "8836": "h_0",
    "geocentric x of topocentric origin": "X_0", "8837": "X_0",
    "geocentric y of topocentric origin": "Y_0", "8838": "Y_0",
    "geocentric z of topocentric origin": "Z_0", "8839": "Z_0",
}


def _norm(s: str) -> str:
    return s.strip().lower()


# ---------------------------------------------------------------------------
# WKT1 / WKT2 lowering
# ---------------------------------------------------------------------------

def _ellps_params(a: float, rf: float) -> str:
    if rf == 0.0:
        return f"+a={a!r} +b={a!r}"
    return f"+a={a!r} +rf={rf!r}"


def _lower_geog(node: Node) -> list[str]:
    """GEOGCS (WKT1) or GEOGCRS/BASEGEOGCRS (WKT2) -> ellipsoid/datum/pm
    fragments."""
    parts: list[str] = []
    datum = node.child("DATUM", "TRF", "GEODETICDATUM")
    if datum is not None:
        sph = datum.child("SPHEROID", "ELLIPSOID")
        if sph is not None:
            nums = sph.numbers()
            if len(nums) >= 2:
                parts.append(_ellps_params(nums[0], nums[1]))
        tw = datum.child("TOWGS84")
        if tw is not None:
            vals = ",".join(repr(v) for v in tw.numbers())
            parts.append(f"+towgs84={vals}")
    pm = node.child("PRIMEM")
    if pm is not None:
        nums = pm.numbers()
        if nums and nums[0] != 0.0:
            parts.append(f"+pm={nums[0]!r}")
    return parts


def _param_unit_factors(node: Node) -> tuple[float, float]:
    """(angular factor -> degrees, linear factor -> meters) for WKT1
    PROJCS parameters, from the GEOGCS and PROJCS UNIT nodes."""
    ang = 1.0
    lin = 1.0
    geog = node.child("GEOGCS")
    if geog is not None:
        u = geog.child("UNIT")
        if u is not None and u.numbers():
            # UNIT factor is radians-per-unit; degrees = value*f/(pi/180)
            import math
            ang = u.numbers()[0] / (math.pi / 180.0)
    u = node.child("UNIT")
    if u is not None and u.numbers():
        lin = u.numbers()[0]
    return ang, lin


_ANGULAR_KEYS = {"lat_0", "lon_0", "lat_1", "lat_2", "lat_ts", "lonc",
                 "alpha", "gamma", "lon_1", "lon_2"}


def _lower_projcs(node: Node) -> str:
    """WKT1 PROJCS -> proj-string."""
    projection = node.child("PROJECTION")
    if projection is None:
        raise ValueError("PROJCS without PROJECTION")
    meth = _norm(projection.strings()[0])
    if meth not in METHODS:
        raise NotImplementedError(f"projection method {meth!r} not supported")
    proj = METHODS[meth]
    ang, lin = _param_unit_factors(node)
    parts = [f"+proj={proj}"]
    geog = node.child("GEOGCS")
    if geog is not None:
        parts += _lower_geog(geog)
    remap = _METHOD_PARAM_REMAP.get(meth, {})
    for p in node.children("PARAMETER"):
        names = p.strings()
        nums = p.numbers()
        if not names or not nums:
            continue
        pname = _norm(names[0])
        if pname == "auxiliary_sphere_type":
            # ESRI Mercator_Auxiliary_Sphere: type 0 (sphere of the
            # semi-major axis) IS webmerc; other types are distinct
            # authalic/rectifying spheres we refuse loudly
            if nums[0] != 0.0:
                raise NotImplementedError(
                    f"Auxiliary_Sphere_Type {nums[0]} not supported")
            continue
        if pname in remap:
            key = remap[pname]
            if key is None:
                if meth == "goode_homolosine" and nums[0] == 1.0:
                    # ESRI Option 1 = land-interrupted Goode (proj igh)
                    parts[0] = "+proj=igh"
                    proj = "igh"
                elif nums[0] != 0.0:
                    raise NotImplementedError(
                        f"parameter {names[0]!r}={nums[0]} not supported")
                continue
        else:
            key = PARAMS.get(pname)
        if key is None:
            raise NotImplementedError(f"parameter {names[0]!r} not supported")
        if key in _ANGULAR_KEYS:
            val = nums[0] * ang
        elif key in ("x_0", "y_0"):
            val = nums[0] * lin   # false origins are lengths
        else:
            val = nums[0]         # scale factors are unitless
        parts.append(f"+{key}={val!r}")
    if lin != 1.0:
        parts.append(f"+to_meter={lin!r}")
    s_all = " ".join(parts)
    if meth == "stereographic_north_pole" and "+lat_0=" not in s_all:
        parts.append("+lat_0=90.0")
    elif meth == "stereographic_south_pole" and "+lat_0=" not in s_all:
        parts.append("+lat_0=-90.0")
    elif meth == "behrmann" and "+lat_ts=" not in s_all:
        parts.append("+lat_ts=30.0")       # Behrmann IS cea at 30 deg
    elif meth in ("rectified_skew_orthomorphic_natural_origin",
                  "hotine_oblique_mercator_two_point_natural_origin"):
        parts.append("+no_uoff")           # natural-origin = variant A
    return _post_process(proj, parts)


def _lower_wkt2_projcrs(node: Node) -> str:
    base = node.child("BASEGEOGCRS", "BASEGEODCRS")
    conv = node.child("CONVERSION")
    if base is None or conv is None:
        raise ValueError("PROJCRS needs BASEGEOGCRS and CONVERSION")
    method = conv.child("METHOD")
    if method is None:
        raise ValueError("CONVERSION without METHOD")
    key = None
    mid = method.child("ID")
    if mid is not None:
        nums = mid.numbers()
        if nums:
            key = str(int(nums[0]))
    if key is None or key not in METHODS:
        key = _norm(method.strings()[0])
    if key not in METHODS:
        raise NotImplementedError(f"method {method.strings()[0]!r} not supported")
    proj = METHODS[key]
    parts = [f"+proj={proj}"]
    parts += _lower_geog(base)
    for p in conv.children("PARAMETER"):
        names = p.strings()
        nums = p.numbers()
        if not names or not nums:
            continue
        pid = p.child("ID")
        pkey = None
        if pid is not None and pid.numbers():
            pkey = PARAMS.get(str(int(pid.numbers()[0])))
        if pkey is None:
            pkey = PARAMS.get(_norm(names[0]))
        if pkey is None:
            raise NotImplementedError(f"parameter {names[0]!r} not supported")
        val = nums[0]
        unit = p.child("LENGTHUNIT", "ANGLEUNIT", "SCALEUNIT", "UNIT")
        if unit is not None and unit.numbers():
            f = unit.numbers()[0]
            if pkey in _ANGULAR_KEYS:
                import math
                val = val * f / (math.pi / 180.0)
            elif pkey in ("x_0", "y_0"):
                val = val * f
        parts.append(f"+{pkey}={val!r}")
    # CS-level LENGTHUNIT (a direct PROJCRS child in WKT2) -> +to_meter
    cs_unit = node.child("LENGTHUNIT")
    if cs_unit is not None and cs_unit.numbers():
        f = cs_unit.numbers()[0]
        if f != 1.0:
            parts.append(f"+to_meter={f!r}")
    return _post_process(proj, parts)


def _post_process(proj: str, parts: list[str]) -> str:
    s = " ".join(parts)
    # LCC 1SP: the latitude of natural origin IS the standard parallel
    # (factory does the same for EPSG 9801/9826)
    if proj == "lcc" and "+lat_1=" not in s and "+lat_0=" in s:
        m = re.search(r"\+lat_0=([-\d.eE+]+)", s)
        s += f" +lat_1={m.group(1)}"
    # Mercator variant B / CEA: the standard parallel is proj's +lat_ts
    if proj in ("merc", "cea") and "+lat_ts=" not in s and "+lat_1=" in s:
        s = s.replace("+lat_1=", "+lat_ts=")
    if proj == "stere":
        # Polar Stereographic variant B carries lat_ts but no lat_0: the
        # pole is implied by the hemisphere of the standard parallel
        if "+lat_0=" not in s and "+lat_ts=" in s:
            m = re.search(r"\+lat_ts=([-\d.eE+]+)", s)
            pole = 90.0 if float(m.group(1)) >= 0 else -90.0
            s += f" +lat_0={pole!r}"
    return s


def _lower_geogcs(node: Node) -> str:
    parts = ["+proj=longlat"] + _lower_geog(node)
    return " ".join(parts)


# ---------------------------------------------------------------------------
# compound / vertical / bound CRS (reference: src/iso19111/io.cpp
# COMPOUNDCRS/VERTCRS/BOUNDCRS node handlers at io.cpp:6086+ region;
# +geoidgrids lowering analogue src/4D_api.cpp:560-696)
# ---------------------------------------------------------------------------

def _lower_vertcrs_parts(node: Node) -> list[str]:
    """VERTCRS (WKT2) / VERT_CS (WKT1) -> proj fragments.

    GEOIDMODEL names the geoid grid (looked up in the engine's grid
    registry at create() time -> +geoidgrids=); a non-metre CS unit
    becomes +vto_meter.  A vertical CRS without a geoid model
    contributes only its unit — ellipsoidal-height passthrough, the
    same as the reference's proj4-string export of compound CRSs whose
    geoid grid is unresolvable."""
    parts: list[str] = []
    gm = node.child("GEOIDMODEL")
    if gm is not None and gm.strings():
        parts.append(f"+geoidgrids={gm.strings()[0]}")
    unit = node.child("LENGTHUNIT", "UNIT")
    if unit is not None and unit.numbers() and unit.numbers()[0] != 1.0:
        parts.append(f"+vto_meter={unit.numbers()[0]!r}")
    return parts


def _lower_compound(node: Node) -> str:
    """COMPOUNDCRS (WKT2) / COMPD_CS (WKT1): horizontal component
    lowered as usual, vertical component appended as fragments."""
    horiz = node.child("PROJCRS", "PROJECTEDCRS", "PROJCS")
    geog = node.child("GEOGCRS", "GEOGRAPHICCRS", "GEODCRS", "GEOGCS")
    vert = node.child("VERTCRS", "VERTICALCRS", "VERT_CS")
    if horiz is not None:
        base = (_lower_projcs(horiz) if horiz.name.upper() == "PROJCS"
                else _lower_wkt2_projcrs(horiz))
    elif geog is not None:
        base = _lower_geogcs(geog)
    else:
        raise ValueError("compound CRS without a horizontal component")
    if vert is None:
        raise ValueError("compound CRS without a vertical component")
    return " ".join([base] + _lower_vertcrs_parts(vert))


#: ABRIDGEDTRANSFORMATION parameter names/codes -> towgs84 slot
_ABRIDGED_SLOTS = {
    "x-axis translation": 0, "8605": 0,
    "y-axis translation": 1, "8606": 1,
    "z-axis translation": 2, "8607": 2,
    "x-axis rotation": 3, "8608": 3,
    "y-axis rotation": 4, "8609": 4,
    "z-axis rotation": 5, "8610": 5,
    "scale difference": 6, "8611": 6,
}


def _lower_boundcrs(node: Node) -> str:
    """BOUNDCRS: the source CRS with the abridged WGS84 transformation
    lowered to +towgs84 (rotations in arc-seconds, position-vector —
    the WKT2 ABRIDGEDTRANSFORMATION convention; scale difference is
    stored as 1+ds in abridged form, converted back to ppm) and/or
    +geoidgrids from a PARAMETERFILE."""
    src = node.child("SOURCECRS")
    if src is None:
        raise ValueError("BOUNDCRS without SOURCECRS")
    inner = None
    for v in src.values:
        if isinstance(v, Node):
            inner = v
            break
    if inner is None:
        raise ValueError("SOURCECRS without a CRS node")
    name = inner.name.upper()
    if name in ("PROJCRS", "PROJECTEDCRS"):
        base = _lower_wkt2_projcrs(inner)
    elif name == "PROJCS":
        base = _lower_projcs(inner)
    elif name in ("GEOGCRS", "GEOGRAPHICCRS", "GEODCRS", "GEOGCS"):
        base = _lower_geogcs(inner)
    elif name in ("COMPOUNDCRS", "COMPD_CS"):
        base = _lower_compound(inner)
    else:
        raise NotImplementedError(f"BOUNDCRS source {inner.name!r}")
    extra: list[str] = []
    tr = node.child("ABRIDGEDTRANSFORMATION")
    if tr is not None:
        tw = [0.0] * 7
        has = False
        for p in tr.children("PARAMETER"):
            names, nums = p.strings(), p.numbers()
            if not names or not nums:
                continue
            pid = p.child("ID")
            key = None
            if pid is not None and pid.numbers():
                key = str(int(pid.numbers()[0]))
            slot = _ABRIDGED_SLOTS.get(key or "",
                                       _ABRIDGED_SLOTS.get(_norm(names[0])))
            if slot is None:
                raise NotImplementedError(
                    f"abridged parameter {names[0]!r} not supported")
            v = nums[0]
            if slot == 6:
                # abridged form stores the scale as (1 + ds); ds in ppm
                v = (v - 1.0) * 1e6 if abs(v - 1.0) < 0.5 else v
            tw[slot] = v
            has = True
        for pf in tr.children("PARAMETERFILE"):
            ss = pf.strings()
            if len(ss) >= 2 and "geoid" in _norm(ss[0]):
                extra.append(f"+geoidgrids={ss[1]}")
        if has:
            if "+towgs84=" in base:
                raise ValueError("BOUNDCRS over a CRS that already "
                                 "carries +towgs84")
            extra.insert(0, "+towgs84=" + ",".join(repr(v) for v in tw))
    return " ".join([base] + extra)


# ---------------------------------------------------------------------------
# PROJJSON
# ---------------------------------------------------------------------------

def _projjson_geog_parts(obj: dict) -> list[str]:
    parts = []
    datum = obj.get("datum") or obj.get("datum_ensemble") or {}
    ell = datum.get("ellipsoid") or {}
    if "semi_major_axis" in ell:
        a = float(ell["semi_major_axis"])
        if "inverse_flattening" in ell:
            parts.append(_ellps_params(a, float(ell["inverse_flattening"])))
        elif "semi_minor_axis" in ell:
            b = float(ell["semi_minor_axis"])
            parts.append(f"+a={a!r} +b={b!r}")
        else:
            parts.append(_ellps_params(a, 0.0))
    pm = datum.get("prime_meridian") or {}
    if pm.get("longitude"):
        parts.append(f"+pm={float(pm['longitude'])!r}")
    return parts


def from_projjson(obj: dict | str) -> str:
    if isinstance(obj, str):
        obj = json.loads(obj)
    t = obj.get("type")
    if t == "GeographicCRS":
        return " ".join(["+proj=longlat"] + _projjson_geog_parts(obj))
    if t != "ProjectedCRS":
        raise NotImplementedError(f"PROJJSON type {t!r} not supported")
    base = obj.get("base_crs") or {}
    conv = obj.get("conversion") or {}
    method = conv.get("method") or {}
    key = None
    mid = (method.get("id") or {})
    if mid.get("code") is not None:
        key = str(mid["code"])
    if key is None or key not in METHODS:
        key = _norm(method.get("name", ""))
    if key not in METHODS:
        raise NotImplementedError(f"method {method.get('name')!r} not supported")
    proj = METHODS[key]
    parts = [f"+proj={proj}"] + _projjson_geog_parts(base)
    for p in conv.get("parameters", []):
        pkey = None
        pid = (p.get("id") or {})
        if pid.get("code") is not None:
            pkey = PARAMS.get(str(pid["code"]))
        if pkey is None:
            pkey = PARAMS.get(_norm(p.get("name", "")))
        if pkey is None:
            raise NotImplementedError(f"parameter {p.get('name')!r} not supported")
        parts.append(f"+{pkey}={float(p['value'])!r}")
    # CS axis unit: a unit object with a conversion_factor becomes
    # +to_meter (string units other than metre are not resolvable here)
    cs = obj.get("coordinate_system") or {}
    for ax in cs.get("axis", [])[:1]:
        u = ax.get("unit")
        if isinstance(u, dict) and u.get("conversion_factor") not in (None, 1,
                                                                      1.0):
            parts.append(f"+to_meter={float(u['conversion_factor'])!r}")
    return _post_process(proj, parts)


# ---------------------------------------------------------------------------
# user-input dispatch (createFromUserInput, io.cpp:5611)
# ---------------------------------------------------------------------------

def from_user_input(text: str) -> str:
    """WKT1/WKT2/PROJJSON text -> proj-string (proj-strings and EPSG
    codes pass through untouched)."""
    s = text.strip()
    if s.startswith("{"):
        return from_projjson(s)
    head = s.split("[", 1)[0].strip().upper()
    if head in ("PROJCS",):
        return _lower_projcs(parse_wkt(s))
    if head in ("GEOGCS",):
        return _lower_geogcs(parse_wkt(s))
    if head in ("PROJCRS", "PROJECTEDCRS"):
        return _lower_wkt2_projcrs(parse_wkt(s))
    if head in ("GEOGCRS", "GEOGRAPHICCRS", "GEODCRS"):
        return " ".join(["+proj=longlat"] + _lower_geog(parse_wkt(s)))
    if head in ("COMPOUNDCRS", "COMPD_CS"):
        return _lower_compound(parse_wkt(s))
    if head in ("BOUNDCRS",):
        return _lower_boundcrs(parse_wkt(s))
    if head in ("VERTCRS", "VERTICALCRS", "VERT_CS"):
        raise NotImplementedError(
            "vertical-only CRS has no horizontal component to execute; "
            "use it inside a COMPOUNDCRS")
    return s
