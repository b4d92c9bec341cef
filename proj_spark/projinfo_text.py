"""projinfo text output: the reference app's display formats, emitted
from the vendored catalog.

Ports the formatting layer of src/apps/projinfo.cpp + the WKT/PROJJSON
formatters it drives (src/iso19111/io.cpp WKTFormatter — 4-space
indentation, node/inline argument rules, axis sub-indent under CS[...];
datum.cpp / crs.cpp _exportToWKT content decisions: which nodes carry
ID[...], morphNameToESRI for WKT1 datum names, SCOPE["unknown"] in this
vintage).  Golden: test/cli/testprojinfo_out.dist.

Only the catalog-backed object kinds the engine models are emitted
(geographic 2D/3D and projected CRSs); everything else raises
NotImplementedError so the CLI can fall back to the engine's own
summary output.
"""

from __future__ import annotations

import json
import math


# ---------------------------------------------------------------------------
# number + name helpers
# ---------------------------------------------------------------------------

def _g(v) -> str:
    """The reference's double formatting (%.15g with integer collapse)."""
    if v is None:
        return "0"
    if isinstance(v, int) or float(v).is_integer():
        return str(int(v))
    return f"{float(v):.15g}"


def morph_name_to_esri(name: str) -> str:
    """WKTFormatter::morphNameToESRI (io.cpp:768-800): non-alphanumeric
    runs become one underscore, trimmed at both ends."""
    for suffix in ("(m)", "(ftUS)", "(E-N)", "(N-E)"):
        if name.endswith(suffix):
            return morph_name_to_esri(name[:-len(suffix)]) + suffix
    out = []
    pend = False
    for ch in name:
        if ch.isalnum() or ch in "+-":
            if pend and out:
                out.append("_")
            pend = False
            out.append(ch)
        else:
            pend = True
    return "".join(out)


# ---------------------------------------------------------------------------
# WKT node tree + formatter
# ---------------------------------------------------------------------------

class N:
    """One WKT node: keyword + ordered args (atoms or nodes)."""

    __slots__ = ("kw", "args", "extra_indent")

    def __init__(self, kw: str, *args, extra_indent: int = 0):
        self.kw = kw
        self.args = [a for a in args if a is not None]
        self.extra_indent = extra_indent


class Q(str):
    """Quoted string atom."""


class Raw(str):
    """Unquoted atom emitted verbatim (enum keywords like `east`)."""


def _fmt_atom(a) -> str:
    if isinstance(a, Q):
        return '"' + str(a).replace('"', '""') + '"'
    if isinstance(a, Raw):
        return str(a)
    if isinstance(a, (int, float)):
        return _g(a)
    return str(a)


def format_wkt(node: N, indent: int = 0) -> str:
    """The WKTFormatter pretty printer: node arguments open on a new
    line at indent+1 (4 spaces per level, plus any extra_indent the
    node carries — AXIS under CS[...] prints one level deeper)."""
    out = [node.kw, "["]
    first = True
    for a in node.args:
        if isinstance(a, N):
            lvl = indent + 1 + a.extra_indent
            sep = "" if first else ","
            out.append(sep + "\n" + "    " * lvl)
            out.append(format_wkt(a, lvl))
        else:
            out.append(("" if first else ",") + _fmt_atom(a))
        first = False
    out.append("]")
    return "".join(out)


# ---------------------------------------------------------------------------
# catalog-driven CRS description
# ---------------------------------------------------------------------------

def _cat():
    from proj_spark.factory import catalog
    return catalog()


def _unit_wkt_name(uom: str, cat) -> str:
    # 9122 "degree (supplier to define representation)" exports as
    # plain "degree" (the reference maps it to 9102 for WKT output)
    if uom == "9122":
        return "degree"
    return cat["units"][uom][0]


def _unit_conv(uom: str, cat) -> float:
    if uom in ("9102", "9122"):
        # exported angular conversion factor is the canonical pi/180
        # double (the catalog stores EPSG's sexagesimal-derived value)
        return math.pi / 180.0
    return cat["units"][uom][2]


def _unit_node(uom: str, cat, with_id: bool = False) -> N:
    kind = cat["units"][uom][1]
    kw = {"angle": "ANGLEUNIT", "length": "LENGTHUNIT",
          "scale": "SCALEUNIT"}[kind]
    args = [Q(_unit_wkt_name(uom, cat)), _unit_conv(uom, cat)]
    if with_id:
        args.append(N("ID", Q("EPSG"), int("9102" if uom == "9122" else uom)))
    return N(kw, *args)


class CrsDescription:
    """Everything the projinfo formats need about one catalog CRS."""

    def __init__(self, code: str):
        cat = _cat()
        self.cat = cat
        self.code = str(code)
        self.kind = None
        self.proj = None
        if self.code in cat["geodetic_crs"]:
            self.kind = "geographic"
            self.row = cat["geodetic_crs"][self.code]
            if str(self.row["type"]) == "geocentric":
                raise NotImplementedError("geocentric projinfo display")
            self.geod_code = self.code
        elif self.code in cat["projected_crs"]:
            self.kind = "projected"
            self.row = cat["projected_crs"][self.code]
            self.proj = self.row
            self.geod_code = str(self.row["base"])
        else:
            raise NotImplementedError(f"projinfo display for {code!r}")
        self.name = str(self.row["name"])
        self.deprecated = bool(self.row.get("deprecated"))
        geod = cat["geodetic_crs"][self.geod_code]
        self.geod = geod
        self.datum = cat["geodetic_datum"][str(geod["datum"])]
        self.ell = cat["ellipsoid"][str(self.datum["ellipsoid"])]
        self.pm = cat["prime_meridian"][str(self.datum["pm"])]
        self.axes = sorted(cat["axis"].get(str(self.row["cs"]), []),
                           key=lambda a: a[0])
        area = str(self.row.get("area"))
        self.area_name = cat.get("area_name", {}).get(area)
        self.bbox = cat["area"].get(area)       # (w, s, e, n)
        self.three_d = str(geod["type"]) == "geographic 3D"

    # -- WKT2 --------------------------------------------------------------
    def _ellipsoid_node(self, unit_ids: bool = False) -> N:
        rf = self.ell["rf"]
        if rf is None:
            a, b = float(self.ell["a"]), float(self.ell["b"])
            rf = 0.0 if b == a else a / (a - b)
        return N("ELLIPSOID", Q(self.ell["name"]), float(self.ell["a"]),
                 float(rf),
                 _unit_node("9001", self.cat, with_id=unit_ids))

    def _datum_node(self) -> N:
        return N("DATUM", Q(self.datum["name"]), self._ellipsoid_node())

    def _primem_node(self) -> N:
        lon = float(self.pm["lon"])
        uom = str(self.pm["uom"])
        if uom == "9110":          # sexagesimal DMS -> degrees
            lon = _sexagesimal_to_deg(lon)
        return N("PRIMEM", Q(self.pm["name"]), lon,
                 _unit_node("9102", self.cat))

    def _axis_nodes(self, cs_uom: str) -> list[N]:
        out = []
        for order, orient, uom, aname, abbrev in self.axes:
            label = aname[0].lower() + aname[1:]
            if abbrev:
                label += f" ({abbrev})"
            out.append(N("AXIS", Q(label), Raw(orient),
                         N("ORDER", int(order)),
                         _unit_node(uom or cs_uom, self.cat),
                         extra_indent=1))
        return out

    def _usage_nodes(self, v2019: bool) -> list[N]:
        if self.bbox is None or self.area_name is None:
            return []
        w, s, e, n = self.bbox
        bbox = N("BBOX", _num(s), _num(w), _num(n), _num(e))
        if v2019:
            return [N("USAGE", N("SCOPE", Q("unknown")),
                      N("AREA", Q(self.area_name)), bbox)]
        return [N("AREA", Q(self.area_name)), bbox]

    def _conversion_node(self) -> N:
        cat = self.cat
        conv = cat["conversion"][str(self.proj["conversion"])]
        args = [Q(conv["name"]),
                N("METHOD", Q(conv["method_name"]),
                  N("ID", Q("EPSG"), int(conv["method"])))]
        for pcode, value, uom in conv["params"]:
            pname = _PARAM_NAMES.get(str(pcode))
            if pname is None:
                raise NotImplementedError(f"parameter {pcode} name")
            v = float(value)
            if str(uom) == "9110":
                v = _sexagesimal_to_deg(v)
                uom = "9102"
            args.append(N("PARAMETER", Q(pname), v,
                          _unit_node(str(uom), cat),
                          N("ID", Q("EPSG"), int(pcode))))
        return N("CONVERSION", *args)

    def _base_geog_node(self, v2019: bool) -> N:
        kw = "BASEGEOGCRS" if v2019 else "BASEGEODCRS"
        return N(kw, Q(self.geod["name"]), N(
            "DATUM", Q(self.datum["name"]), self._ellipsoid_node()),
            self._primem_node(),
            N("ID", Q("EPSG"), int(self.geod_code)))

    def wkt2_promoted_3d(self) -> str:
        """The --3d display of a projected CRS (crs.cpp promoteTo3D):
        BASEGEOGCRS swaps to the 3D sibling's ID, the conversion keeps
        its ID, the CS becomes PROJ's Cartesian ENh (abbreviation-only
        E/N axis labels, units carrying their EPSG IDs), and the
        promoted object has neither USAGE nor a root ID."""
        if self.kind != "projected":
            raise NotImplementedError("--3d display for this CRS kind")
        cat = self.cat
        geod3d = None
        for c2, r2 in cat["geodetic_crs"].items():
            if (":" not in c2 and str(r2["type"]) == "geographic 3D"
                    and r2["datum"] == self.geod["datum"]
                    and not r2["deprecated"]):
                geod3d = c2
                break
        base = N("BASEGEOGCRS", Q(self.geod["name"]), N(
            "DATUM", Q(self.datum["name"]), self._ellipsoid_node()),
            self._primem_node(),
            N("ID", Q("EPSG"), int(geod3d or self.geod_code)))
        conv = self._conversion_node()
        conv.args.append(N("ID", Q("EPSG"),
                           int(self.proj["conversion"])))
        unit = N("LENGTHUNIT", Q("metre"), 1,
                 N("ID", Q("EPSG"), 9001))

        def axis(label, orient, order):
            return N("AXIS", Q(label), Raw(orient), N("ORDER", order),
                     N("LENGTHUNIT", Q("metre"), 1,
                       N("ID", Q("EPSG"), 9001)), extra_indent=1)

        args = [Q(self.name), base, conv, N("CS", Raw("Cartesian"), 3),
                axis("(E)", "east", 1), axis("(N)", "north", 2),
                axis("ellipsoidal height (h)", "up", 3)]
        return format_wkt(N("PROJCRS", *args))

    def geog_node(self, v2019: bool = True, usage: bool = True) -> N:
        """The GEOGCRS node (reusable nested inside SOURCECRS/TARGETCRS,
        where the reference omits the USAGE block but keeps the ID)."""
        kw = "GEOGCRS" if v2019 else "GEODCRS"
        ndim = 3 if self.three_d else 2
        args = [Q(self.name), self._datum_node(), self._primem_node(),
                N("CS", Raw("ellipsoidal"), ndim)]
        args += self._axis_nodes("9102")
        if usage:
            args += self._usage_nodes(v2019)
        args.append(N("ID", Q("EPSG"), int(self.code)))
        return N(kw, *args)

    def wkt2(self, v2019: bool = True) -> str:
        cat = self.cat
        if self.kind == "geographic":
            return format_wkt(self.geog_node(v2019))
        args = [Q(self.name), self._base_geog_node(v2019),
                self._conversion_node(),
                N("CS", Raw("Cartesian"), len(self.axes) or 2)]
        args += self._axis_nodes("9001")
        args += self._usage_nodes(v2019)
        args.append(N("ID", Q("EPSG"), int(self.code)))
        return format_wkt(N("PROJCRS", *args))

    # -- WKT1:GDAL ---------------------------------------------------------
    def wkt1_gdal(self) -> str:
        cat = self.cat
        dname = morph_name_to_esri(self.datum["name"])
        if dname == "World_Geodetic_System_1984":
            dname = "WGS_1984"
        ell_uom = "9122" if str(self.axes[0][2]) == "9122" else \
            str(self.axes[0][2]) if self.kind == "geographic" else "9122"
        geog = N(
            "GEOGCS", Q(self.geod["name"]),
            N("DATUM", Q(dname),
              N("SPHEROID", Q(self.ell["name"]), float(self.ell["a"]),
                float(self.ell["rf"] if self.ell["rf"] is not None else 0),
                N("AUTHORITY", Q("EPSG"),
                  Q(str(self.datum["ellipsoid"])))),
              N("AUTHORITY", Q("EPSG"), Q(str(self.geod["datum"])))),
            N("PRIMEM", Q(self.pm["name"]),
              _pm_lon_deg(self.pm), N("AUTHORITY", Q("EPSG"),
                                      Q(str(self.datum["pm"])))),
            N("UNIT", Q("degree"), math.pi / 180.0,
              N("AUTHORITY", Q("EPSG"), Q("9122"))),
            N("AUTHORITY", Q("EPSG"), Q(str(self.geod_code)))
            if self.kind == "geographic" else None,
        )
        if self.kind == "geographic":
            return format_wkt(geog)
        raise NotImplementedError("WKT1:GDAL projected display")

    # -- WKT1:ESRI ---------------------------------------------------------
    def wkt1_esri(self) -> str:
        """Single-line ESRI dialect (datum.cpp/crs.cpp ESRI naming:
        WGS 84 special cases, else morphNameToESRI with GCS_/D_
        prefixes; ESRI prints the semi-major with a trailing .0)."""
        if self.kind != "geographic":
            raise NotImplementedError("WKT1:ESRI projected display")
        gname = ("GCS_WGS_1984" if self.name == "WGS 84"
                 else "GCS_" + morph_name_to_esri(self.name))
        dname = ("D_WGS_1984"
                 if self.datum["name"] == "World Geodetic System 1984"
                 else "D_" + morph_name_to_esri(self.datum["name"]))
        ename = ("WGS_1984" if self.ell["name"] == "WGS 84"
                 else morph_name_to_esri(self.ell["name"]))
        rf = self.ell["rf"]
        return (f'GEOGCS["{gname}",DATUM["{dname}",'
                f'SPHEROID["{ename}",{float(self.ell["a"])!r},'
                f'{_g(rf)}]],PRIMEM["{self.pm["name"]}",'
                f'{_pm_lon_deg(self.pm)!r}],'
                f'UNIT["Degree",0.0174532925199433]]')

    # -- PROJJSON ----------------------------------------------------------
    def projjson(self) -> str:
        if self.kind != "geographic":
            raise NotImplementedError("PROJJSON projected display")
        rf = self.ell["rf"]
        axes = []
        for order, orient, uom, aname, abbrev in self.axes:
            axes.append({"name": aname, "abbreviation": abbrev,
                         "direction": orient,
                         "unit": _unit_wkt_name(uom, self.cat)})
        obj = {
            "$schema": "https://proj.org/schemas/v0.2/projjson.schema.json",
            "type": "GeographicCRS",
            "name": self.name,
            "datum": {
                "type": "GeodeticReferenceFrame",
                "name": self.datum["name"],
                "ellipsoid": {
                    "name": self.ell["name"],
                    "semi_major_axis": _jnum(self.ell["a"]),
                    "inverse_flattening": _jnum(rf),
                },
            },
            "coordinate_system": {"subtype": "ellipsoidal", "axis": axes},
        }
        if self.area_name:
            w, s, e, n = self.bbox
            obj["area"] = self.area_name
            obj["bbox"] = {"south_latitude": _jnum(s),
                           "west_longitude": _jnum(w),
                           "north_latitude": _jnum(n),
                           "east_longitude": _jnum(e)}
        obj["id"] = {"authority": "EPSG", "code": int(self.code)}
        return json.dumps(obj, indent=2, ensure_ascii=False)


def _num(v):
    """BBOX numbers print integers bare (%.15g)."""
    return float(v)


def _jnum(v):
    f = float(v)
    return int(f) if f.is_integer() else f


def _sexagesimal_to_deg(v: float) -> float:
    """EPSG unit 9110 DDD.MMSSsss -> decimal degrees."""
    sign = -1.0 if v < 0 else 1.0
    v = abs(v)
    d = math.floor(v)
    m = math.floor((v - d) * 100 + 1e-9)
    s = (v - d - m / 100.0) * 10000.0
    return sign * (d + m / 60.0 + s / 3600.0)


def _pm_lon_deg(pm: dict) -> float:
    lon = float(pm["lon"])
    if str(pm["uom"]) == "9110":
        return _sexagesimal_to_deg(lon)
    return lon


# ---------------------------------------------------------------------------
# candidate-operation summary listing (projinfo -s/-t --summary)
# ---------------------------------------------------------------------------

#: transformation methods the reference can instantiate (createOperations
#: marks others non-PROJ-exportable; they sort below the ballpark —
#: testprojinfo's NADCON5 and time-specific Helmert rows)
_EXPORTABLE_METHODS = {
    "9603", "9604", "9605", "9606", "9607", "9618", "9619", "9636",
    "1031", "1032", "1033", "1053", "1054", "1055", "1056", "1057",
    "1058", "1061", "1062", "1063",
    # grid methods (NADCON5's 1074/1075 and the time-specific helmert
    # 1065/1066 are NOT instantiable in the reference: sorted last)
    "9613", "9614", "9615", "9616", "9617",
}


class _OpEntry:
    __slots__ = ("marker", "code", "name", "acc", "area_code",
                 "ballpark", "exportable", "area_deg2", "composed",
                 "grid", "grids_available", "row", "is_grid", "reversed")

    def __init__(self, marker, code, name, acc, area_code, cat,
                 ballpark=False, exportable=True, composed=False,
                 grid=None, row=None, is_grid=False, reversed_=False):
        self.composed = composed
        self.grid = grid
        self.grids_available = True
        self.row = row
        self.is_grid = is_grid
        self.reversed = reversed_
        self.marker = marker
        self.code = code
        self.name = name
        self.acc = acc
        self.area_code = area_code
        self.ballpark = ballpark
        self.exportable = exportable
        bbox = cat["area"].get(str(area_code)) if area_code else None
        if bbox is None:
            bbox = (-180.0, -90.0, 180.0, 90.0)
        w, s, e, n = bbox
        if w > e:
            e += 360.0               # antimeridian-crossing extents
        # getPseudoArea (coordinateoperation.cpp:551-571): cos-weighted
        self.area_deg2 = (e - w) * (math.sin(math.radians(n))
                                    - math.sin(math.radians(s)))

    def grids_known(self) -> bool:
        """gridsKnown: a grid with a grid_alternatives row (package
        known to the database); no-grid ops are trivially known."""
        if self.grid is None:
            return True
        return self.grid in _cat().get("grid_alternatives", {})

    def sort_key(self):
        """SortFunction::operator() fields relevant to summary rows."""
        return (int(not self.exportable),
                int(self.ballpark),
                int(not self.grids_available),
                int(not self.grids_known()),
                int(self.acc is None or self.acc < 0),
                -self.area_deg2,
                self.acc if self.acc is not None and self.acc >= 0
                else float("inf"),
                len(self.name), self.name)

    def line(self, cat) -> str:
        if self.code is None:
            ident = "unknown id"
        else:
            ident = f"{self.marker}:{self.code}"
        if self.acc is None or self.acc < 0:
            acc = "unknown accuracy"
        elif self.composed:
            # concatenated ops re-derive accuracy as a double and print
            # it trimmed ('1 m'); direct ops keep the DB text ('1.0 m')
            acc = f"{_g(self.acc)} m"
        else:
            acc = f"{self.acc!r} m"
        area = (cat.get("area_name", {}).get(str(self.area_code), "World")
                if self.area_code else "World")
        out = f"{ident}, {self.name}, {acc}, {area}"
        if self.ballpark:
            out += ", has ballpark transformation"
        return out


def _crs_kind(cat, code: str) -> str:
    return str(cat["geodetic_crs"][str(code)]["type"])


def _fold_3d_to_2d(cat, code: str) -> str:
    """A geographic 3D CRS matches the catalog operations registered on
    its geographic 2D datum sibling (the reference promotes/demotes
    between them transparently in createOperations)."""
    row = cat["geodetic_crs"].get(str(code))
    if row is None or str(row["type"]) != "geographic 3D":
        return str(code)
    for c2, r2 in cat["geodetic_crs"].items():
        if (":" not in c2 and str(r2["type"]) == "geographic 2D"
                and r2["datum"] == row["datum"] and not r2["deprecated"]):
            return c2
    return str(code)


def pair_ops(src_code: str, dst_code: str) -> list[_OpEntry]:
    """Direct catalog operations between two CRSs plus the ballpark,
    for the projinfo summary (createOperations' same-pair enumeration;
    pivoted/concatenated geodetic paths are not modelled here).  A
    PROJECTED end folds to its base with the conversion composed into
    the operation name ('Inverse of 3-degree Gauss-Kruger zone 3 + ...')
    and the id collapsing to 'unknown id'."""
    cat = _cat()
    s, d = str(src_code), str(dst_code)
    prefix = suffix = ""
    if s in cat["projected_crs"]:
        row = cat["projected_crs"][s]
        conv = cat["conversion"][str(row["conversion"])]
        prefix = f"Inverse of {conv['name']} + "
        s = str(row["base"])
    if "+" in d:
        # compound target 'horiz+vert': when the horizontal part is the
        # source's own datum, the operation IS the vertical leg (and
        # the compound keeps its ballpark vertical candidate)
        horiz, _, vert = d.partition("+")
        gcat = cat["geodetic_crs"]
        if (horiz in gcat and s in gcat
                and gcat[horiz]["datum"] == gcat[s]["datum"]):
            return _vertical_ops(cat, s, vert, prefix, compound=True)
        raise NotImplementedError("compound target with datum change")
    if d in cat.get("vertical_crs", {}):
        return _vertical_ops(cat, s, d, prefix, compound=False)
    if s in cat.get("compound_crs", {}):
        # compound source -> its horizontal's 3D sibling: the inverse
        # of the vertical leg, anonymized like any compound sub-op
        comp = cat["compound_crs"][s]
        gcat = cat["geodetic_crs"]
        horiz = _fold_3d_to_2d(cat, str(comp["horiz"]))
        d2 = _fold_3d_to_2d(cat, d)
        if (horiz in gcat and d2 in gcat
                and gcat[horiz]["datum"] == gcat[d2]["datum"]):
            return _vertical_ops(cat, horiz, str(comp["vert"]), prefix,
                                 reverse=True, hide_code=True)
        raise NotImplementedError("compound source with datum change")
    if s in cat.get("vertical_crs", {}):
        # vertical source -> geographic target: inverse vertical ops
        d2 = _fold_3d_to_2d(cat, d)
        if d2 in cat["geodetic_crs"]:
            return _vertical_ops(cat, d2, s, prefix, reverse=True)
        raise NotImplementedError("vertical source to non-geographic")
    if d in cat["projected_crs"]:
        row = cat["projected_crs"][d]
        conv = cat["conversion"][str(row["conversion"])]
        suffix = f" + {conv['name']}"
        d = str(row["base"])
    s, d = _fold_3d_to_2d(cat, s), _fold_3d_to_2d(cat, d)
    out = []
    for table, is_grid in (("helmert", False), ("grid_transformation",
                                                True)):
        for code, h in cat[table].items():
            if (":" in code and not code.startswith("PROJ:")) \
                    or h.get("deprecated"):
                continue
            fwd = h["src"] == s and h["dst"] == d
            rev = h["src"] == d and h["dst"] == s
            if not (fwd or rev):
                continue
            # discardSuperseded: drop when the replacement op exists
            # and is not deprecated (factory.cpp:3573-3680)
            repl = cat.get("supersession", {}).get(code)
            if repl is not None:
                r_row = (cat["helmert"].get(repl)
                         or cat["grid_transformation"].get(repl))
                if r_row is not None and not r_row.get("deprecated"):
                    continue
            auth, _, bare = code.rpartition(":")
            marker = auth or "EPSG"
            name = h["name"]
            exportable = str(h["method"]) in _EXPORTABLE_METHODS
            if is_grid and cat.get("grid_alternatives", {}).get(h["grid"]):
                marker = f"DERIVED_FROM({marker})"
            if rev:
                marker = f"INVERSE({marker})"
                name = f"Inverse of {name}"
            op_code = bare or code
            name = prefix + name + suffix
            composed = bool(prefix or suffix)
            if composed:
                op_code = None        # composed op: 'unknown id'
            out.append(_OpEntry(marker, op_code, name, h["acc"], h["area"],
                                cat, exportable=exportable,
                                composed=composed,
                                grid=h.get("grid") if is_grid else None,
                                row=h, is_grid=is_grid, reversed_=rev))
    if not any(not op.ballpark for op in out):
        out += _pivot_ops(cat, s, d, prefix, suffix)
    sname = cat["geodetic_crs"][s]["name"]
    dname = cat["geodetic_crs"][d]["name"]
    geocentric = _crs_kind(cat, s) == "geocentric"
    bp_name = (f"Ballpark geocentric translation from {sname} to {dname}"
               if geocentric else
               f"Ballpark geographic offset from {sname} to {dname}")
    out.append(_OpEntry("", None, prefix + bp_name + suffix, None, None,
                        cat, ballpark=True))
    return out


def _vertical_ops(cat, s, d, prefix, compound=False, reverse=False,
                  hide_code=False):
    """Candidates to a VERTICAL target: the geoid-model grid
    transformations from the source datum's 3D sibling to the vertical
    CRS, plus the ballpark vertical transformation (testprojinfo's
    'AHD height' / EPSG:4326+3855 segments)."""
    gc = cat["geodetic_crs"]
    sd = str(gc[s]["datum"])
    out = []
    sup = cat.get("supersession", {})
    for code, h in cat["grid_transformation"].items():
        if h.get("deprecated"):
            continue
        if ":" in code and not code.startswith("PROJ:"):
            continue
        if str(h["dst"]) == str(d):
            entry_g2v = True          # registered geog -> vertical
            geog_end = str(h["src"])
        elif str(h["src"]) == str(d):
            entry_g2v = False         # registered vertical -> geog
            geog_end = str(h["dst"])
        else:
            continue
        src_row = gc.get(geog_end)
        if src_row is None or str(src_row["datum"]) != sd:
            continue
        repl = sup.get(code)
        if repl is not None:
            r_row = cat["grid_transformation"].get(repl)
            if r_row is not None and not r_row.get("deprecated"):
                continue
        auth, _, bare = code.rpartition(":")
        marker = auth or "EPSG"
        alt_name = cat.get("grid_alternatives", {}).get(h["grid"])
        if alt_name and alt_name != h["grid"]:
            # a derived op only when the substitution CHANGES the file
            marker = f"DERIVED_FROM({marker})"
        name = str(h["name"])
        # invert when the registry direction opposes the requested one
        inv = entry_g2v if reverse else not entry_g2v
        if inv:
            marker = f"INVERSE({marker})"
            name = f"Inverse of {name}"
        name = prefix + name
        op = _OpEntry(marker, bare or code, name, h["acc"], h["area"],
                      cat, composed=bool(prefix), grid=h["grid"], row=h,
                      is_grid=True, reversed_=inv)
        if prefix or hide_code:
            op.code = None
        out.append(op)
    if compound:
        # only the compound form carries the ballpark vertical
        # candidate (pure geog->vertical pairs list real ops only)
        vname = cat["vertical_crs"][str(d)]["name"]
        sname = gc[s]["name"]
        bp = (f"Inverse of Transformation from {vname} to {sname} "
              f"(ballpark vertical transformation, without ellipsoid "
              f"height to vertical height correction)")
        op = _OpEntry("", None, prefix + bp, None, None, cat,
                      ballpark=True, composed=bool(prefix))
        op.grids_available = True
        out.append(op)
    return out


def _pivot_ops(cat, s, d, prefix, suffix):
    """One-pivot concatenated candidates when no direct operation
    exists (IntermediateCRSUse::IF_NO_DIRECT_TRANSFORMATION,
    coordinateoperation.cpp createIntermediateCoordinateOperations):
    chains A(src->P) + B(P->d) with geog2D<->geocentric conversion
    steps spelled into the name like the reference's concatenation,
    accuracy summed, extent intersected (testprojinfo's GDA94/AGD66 ->
    'WGS 84 (G1762)' segments)."""
    gc = cat["geodetic_crs"]

    def datum_of(code):
        row = gc.get(str(code))
        return str(row["datum"]) if row else None

    def geocentric(code):
        return str(gc.get(str(code), {}).get("type", "")) == "geocentric"

    def geog2d_name(datum):
        for c2, r2 in gc.items():
            if (":" not in c2 and r2["datum"] == datum
                    and str(r2["type"]) == "geographic 2D"
                    and not r2["deprecated"]):
                return str(r2["name"])
        return "unknown"

    sd, dd = datum_of(s), datum_of(d)
    sup = cat.get("supersession", {})
    from_s: dict = {}
    to_d: dict = {}
    for table in ("helmert", "grid_transformation"):
        for code, h in cat[table].items():
            if h.get("deprecated"):
                continue
            if ":" in code and not code.startswith("PROJ:"):
                continue
            repl = sup.get(code)
            if repl is not None:
                r_row = (cat["helmert"].get(repl)
                         or cat["grid_transformation"].get(repl))
                if r_row is not None and not r_row.get("deprecated"):
                    continue
            hs, hd = datum_of(h["src"]), datum_of(h["dst"])
            if hs is None or hd is None:
                continue
            is_grid = table == "grid_transformation"
            geoc = geocentric(h["src"])
            if hs == sd and hd not in (sd, dd):
                from_s.setdefault(hd, []).append((h, False, is_grid, geoc))
            elif hd == sd and hs not in (sd, dd):
                from_s.setdefault(hs, []).append((h, True, is_grid, geoc))
            if hd == dd and hs not in (sd, dd):
                to_d.setdefault(hs, []).append((h, False, is_grid, geoc))
            elif hs == dd and hd not in (sd, dd):
                to_d.setdefault(hd, []).append((h, True, is_grid, geoc))
    s_name = str(gc[s]["name"])
    d_name = str(gc[d]["name"])
    out = []
    for piv in sorted(set(from_s) & set(to_d)):
        p_name = geog2d_name(piv)
        for ha, ra, ga, geoa in from_s[piv]:
            for hb, rb, gb, geob in to_d[piv]:
                parts = []
                if geoa:
                    parts.append(f"Conversion from {s_name} (geog2D) to "
                                 f"{s_name} (geocentric)")
                parts.append(("Inverse of " if ra else "") + str(ha["name"]))
                if geoa != geob:
                    if geob:
                        parts.append(f"Conversion from {p_name} (geog2D) "
                                     f"to {p_name} (geocentric)")
                    else:
                        parts.append(f"Conversion from {p_name} "
                                     f"(geocentric) to {p_name} (geog2D)")
                parts.append(("Inverse of " if rb else "") + str(hb["name"]))
                if geob:
                    parts.append(f"Conversion from {d_name} (geocentric) "
                                 f"to {d_name} (geog2D)")
                name = prefix + " + ".join(parts) + suffix
                acc_a, acc_b = ha["acc"], hb["acc"]
                acc = (None if acc_a is None or acc_b is None
                       or acc_a < 0 or acc_b < 0 else acc_a + acc_b)
                area_code = _intersect_area_code(cat, ha["area"],
                                                 hb["area"])
                grid = (ha.get("grid") if ga else None) or \
                    (hb.get("grid") if gb else None)
                op = _OpEntry("", None, name, acc, area_code, cat,
                              composed=True, grid=grid)
                out.append(op)
    return out


def _intersect_area_code(cat, a_code, b_code):
    """The concatenated op's extent: the intersection of the component
    extents — when one bbox contains the other, the contained one's
    AREA CODE (and thus its name) is the result, like the reference's
    Extent::intersection keeping the description."""
    a = cat["area"].get(str(a_code))
    b = cat["area"].get(str(b_code))
    if a is None:
        return b_code
    if b is None:
        return a_code
    if _bbox_contains(tuple(a), tuple(b)):
        return b_code
    if _bbox_contains(tuple(b), tuple(a)):
        return a_code
    return a_code        # proper intersection: keep A's (not in goldens)


def _clip_area(op: _OpEntry, aoi: tuple, cat) -> None:
    """Replace the op's pseudo-area by extent INTERSECT aoi (the
    reference computes area_ on the clipped extent,
    coordinateoperation.cpp:11131-11148); antimeridian-crossing boxes
    keep their unclipped area (none of the golden's clips cross)."""
    bbox = cat["area"].get(str(op.area_code)) if op.area_code else None
    if bbox is None:
        bbox = (-180.0, -90.0, 180.0, 90.0)
    w, s, e, n = bbox
    w0, s0, e0, n0 = aoi
    if w > e or w0 > e0:
        return
    w, s = max(w, w0), max(s, s0)
    e, n = min(e, e0), min(n, n0)
    if e <= w or n <= s:
        op.area_deg2 = 0.0
        return
    op.area_deg2 = (e - w) * (math.sin(math.radians(n))
                              - math.sin(math.radians(s)))


def _lon_pieces(w, e):
    """Longitude interval(s) on [-180, 180]; crossing boxes split."""
    if w <= e:
        return [(w, e)]
    return [(w, 180.0), (-180.0, e)]


def _bbox_contains(outer, inner) -> bool:
    """GeographicBoundingBox::contains (metadata.cpp:254-300): OUTER
    must contain INNER, with the reference's antimeridian branches."""
    w, s, e, n = outer
    ow, os_, oe, on = inner
    if not (s <= os_ and n >= on):
        return False
    if w == -180.0 and e == 180.0:
        return True
    if ow == -180.0 and oe == 180.0:
        return False
    if w < e:
        return ow < oe and w <= ow and e >= oe
    if ow < oe:
        return ow >= w or oe <= e
    return w <= ow and e >= oe


def _bbox_intersects(a, b) -> bool:
    aw, as_, ae, an = a
    bw, bs, be, bn = b
    if an < bs or as_ > bn:
        return False
    return any(not (pe < qw or pw > qe)
               for pw, pe in _lon_pieces(aw, ae)
               for qw, qe in _lon_pieces(bw, be))


def _op_bbox(op, cat):
    bbox = cat["area"].get(str(op.area_code)) if op.area_code else None
    return tuple(bbox) if bbox else (-180.0, -90.0, 180.0, 90.0)


def _aoi_filter(ops, aoi, cat, spatial_test: str):
    """FilterResults' extent criterion (coordinateoperation.cpp:
    11042-11066): keep an op iff its extent CONTAINS the area of
    interest (strict containment default) or intersects it; a real op
    whose extent contains the AOI makes the ballpark uninteresting."""
    kept = []
    has_containing_real = False
    for op in ops:
        bbox = _op_bbox(op, cat)
        if op.ballpark:
            # the ballpark's extent IS the area of interest
            bbox = aoi
        contains = _bbox_contains(bbox, aoi)
        if contains and not op.ballpark:
            has_containing_real = True
        if spatial_test == "intersects":
            ok = _bbox_intersects(bbox, aoi)
        else:
            ok = contains
        if ok:
            kept.append(op)
    if has_containing_real:
        # the ballpark VERTICAL candidate survives (isApprox, not
        # isNullTransformation — the reference only prunes the
        # geographic/geocentric null offsets this way)
        kept = [op for op in kept
                if not op.ballpark or "ballpark vertical" in op.name]
    return kept


def _implicit_aoi(cat, src_code: str, dst_code: str):
    """projinfo's default area of interest: the intersection of the two
    CRS extents (used for the contains filter AND area sorting)."""
    boxes = []
    for code in (src_code, dst_code):
        c = str(code)
        if "+" in c:
            c = c.partition("+")[2]     # compound: the vertical leg
        comp = cat.get("compound_crs", {}).get(c)
        if comp is not None:
            c = str(comp["vert"])       # compound extent ~ vertical leg
        row = (cat["geodetic_crs"].get(c) or cat["projected_crs"].get(c)
               or cat.get("vertical_crs", {}).get(c))
        bbox = cat["area"].get(str(row.get("area"))) if row else None
        if bbox:
            boxes.append(bbox)
    if not boxes:
        return None
    # normalize antimeridian-crossing boxes into [w, e+360] space
    crossing = any(b[0] > b[2] for b in boxes)
    norm = [(b[0], b[2] + 360.0 if b[0] > b[2] else b[2], b[1], b[3])
            for b in boxes]
    w = max(b[0] for b in norm)
    e = min(b[1] for b in norm)
    s = max(b[2] for b in norm)
    n = min(b[3] for b in norm)
    if e <= w or n <= s:
        return None
    if crossing and e > 180.0:
        e -= 360.0                  # back to a crossing (w > e) box
    return (w, s, e, n)


def filtered_ops(src_code: str, dst_code: str,
                 aoi: tuple | None = None,
                 spatial_test: str = "contains",
                 grid_check: str = "sort"):
    """(sorted ops, optional note line) under the reference's filter
    semantics: explicit AOI or the implicit CRS-extent intersection;
    under the DEFAULT grid check, operations whose grid files are not
    registered drop out of the result (the intersects-note re-run
    counts them regardless — the plain NAD27->NAD83 golden records
    'found: 1' with a note of 10), and the ballpark survives as the
    last resort when everything real is filtered away."""
    cat = _cat()
    all_ops = pair_ops(src_code, dst_code)
    note = None
    aoi_eff = aoi if aoi is not None else _implicit_aoi(cat, src_code,
                                                        dst_code)
    ops = list(all_ops)
    if aoi_eff is not None:
        kept = _aoi_filter(ops, aoi_eff, cat, spatial_test)
        if spatial_test != "intersects":
            more = _aoi_filter(all_ops, aoi_eff, cat, "intersects")
            if len(more) > len(kept):
                note = (f"Note: using '--spatial-test intersects' would "
                        f"bring more results ({len(more)})")
        ops = kept
        for op in ops:
            _clip_area(op, aoi_eff, cat)
    # default grid check: unavailable grids demote in the sort
    # (USE_FOR_SORTING; --grid-check none forces them available)
    from proj_spark.operations.datum import GRID_REGISTRY
    alt = cat.get("grid_alternatives", {})
    for op in ops:
        op.grids_available = (grid_check == "none" or op.grid is None
                              or alt.get(op.grid, op.grid)
                              in GRID_REGISTRY)
    ops.sort(key=lambda o: o.sort_key())
    # removeUninterestingOps (coordinateoperation.cpp:11265-11380):
    # after sorting, a consecutive op with worse/unknown accuracy over
    # the SAME extent adds nothing when the kept one needs no grids
    # (drops 'GDA94 to WGS 84 (1) + glue, 5 m' behind the 0.21 m chain)
    pruned = []
    last = None
    for op in ops:
        if last is not None and not op.ballpark:
            same_extent = str(op.area_code) == str(last.area_code)
            worse = (last.acc is not None and last.acc >= 0
                     and (op.acc is None or op.acc < 0
                          or op.acc > last.acc))
            if worse and same_extent and last.grid is None:
                continue
        pruned.append(op)
        last = op
    ops = pruned
    return ops, note


def summary_listing(src_code: str, dst_code: str,
                    aoi: tuple | None = None,
                    spatial_test: str = "contains",
                    grid_check: str = "sort") -> list[str]:
    cat = _cat()
    ops, note = filtered_ops(src_code, dst_code, aoi, spatial_test,
                             grid_check)
    out = [f"Candidate operations found: {len(ops)}"]
    if note:
        out.append(note)
    out += [op.line(cat) for op in ops]
    return out


#: grid_alternatives format -> WKT2 method name for substituted ops
_ALT_FORMAT_METHOD = {"NTv1": "NTv1", "NTv2": "NTv2",
                      "CTable2": "CTABLE2", "GTX": "GTX"}


def _ballpark_op_node(cat, src, dst, name) -> N:
    return N(
        "COORDINATEOPERATION", Q(name),
        N("SOURCECRS", src.geog_node(usage=False)),
        N("TARGETCRS", dst.geog_node(usage=False)),
        N("METHOD", Q("Geographic2D offsets"),
          N("ID", Q("EPSG"), 9619)),
        N("PARAMETER", Q("Latitude offset"), 0,
          _unit_node("9102", cat), N("ID", Q("EPSG"), 8601)),
        N("PARAMETER", Q("Longitude offset"), 0,
          _unit_node("9102", cat), N("ID", Q("EPSG"), 8602)),
        N("USAGE", N("SCOPE", Q("unknown")), N("AREA", Q("World")),
          N("BBOX", -90.0, -180.0, 90.0, 180.0)))


def _grid_op_block(cat, op, src, dst):
    """(proj_string, wkt) for one grid-transformation candidate —
    grid-alternative substitution changes the file AND the method (the
    DERIVED_FROM ops, which also lose VERSION/REMARK like the
    reference's createSimilarPropertiesTransformation)."""
    h = op.row
    alt = cat.get("grid_alternatives", {})
    fmt = cat.get("grid_alternatives_format", {})
    derived = bool(alt.get(h["grid"]))
    method_name = str(h["method_name"])
    files = [(h["p_name"], h["grid"])]
    if h.get("grid2"):
        files.append((h["p2_name"], h["grid2"]))
    if derived:
        method_name = _ALT_FORMAT_METHOD.get(fmt.get(h["grid"], ""),
                                             method_name)
        # substitution collapses to ONE PROJ-named file under the
        # NTv1/NTv2-style parameter name
        files = [("Latitude and longitude difference file",
                  alt[h["grid"]])]
    if op.exportable:
        proj = ("+proj=pipeline +step +proj=axisswap +order=2,1 "
                "+step +proj=unitconvert +xy_in=deg +xy_out=rad "
                f"+step {'+inv ' if op.reversed else ''}"
                f"+proj=hgridshift +grids={files[0][1]} "
                "+step +proj=unitconvert +xy_in=rad +xy_out=deg "
                "+step +proj=axisswap +order=2,1")
    else:
        proj = ""
    args = [Q(h["name"])]
    if not derived and h.get("version") and h["version"] != "-":
        args.append(N("VERSION", Q(h["version"])))
    args += [N("SOURCECRS", src.geog_node(usage=False)),
             N("TARGETCRS", dst.geog_node(usage=False))]
    method = N("METHOD", Q(method_name))
    if method_name == str(h["method_name"]):
        method.args.append(N("ID", Q("EPSG"), int(h["method"])))
    args.append(method)
    for pname, fname in files:
        args.append(N("PARAMETERFILE", Q(pname), Q(fname)))
    if h["acc"] is not None and h["acc"] >= 0:
        args.append(N("OPERATIONACCURACY", Raw(repr(h["acc"]))))
    bbox = cat["area"].get(str(h["area"]))
    aname = cat.get("area_name", {}).get(str(h["area"]), "unknown")
    w, s_, e, n = bbox
    args.append(N("USAGE", N("SCOPE", Q(h.get("scope") or "unknown")),
                  N("AREA", Q(aname)), N("BBOX", _num(s_), _num(w),
                                         _num(n), _num(e))))
    args.append(N("ID", Q(op.marker), int(op.code)))
    if not derived and h.get("remark"):
        args.append(N("REMARK", Q(h["remark"])))
    return proj, format_wkt(N("COORDINATEOPERATION", *args))


def _vertcrs_node(cat, code: str) -> N:
    """VERTCRS WKT2 node (crs.cpp VerticalCRS::_exportToWKT)."""
    row = cat["vertical_crs"][str(code)]
    vd = cat.get("vertical_datum", {}).get(str(row["datum"]), {})
    axes = sorted(cat["axis"].get(str(row.get("cs")), []),
                  key=lambda a: a[0])
    args = [Q(row["name"]), N("VDATUM", Q(vd.get("name", "unknown"))),
            N("CS", Raw("vertical"), 1)]
    for order, orient, uom, aname, abbrev in axes:
        label = aname[0].lower() + aname[1:]
        if abbrev:
            label += f" ({abbrev})"
        args.append(N("AXIS", Q(label), Raw(orient),
                      _unit_node(uom or "9001", cat), extra_indent=1))
    args.append(N("ID", Q("EPSG"), int(code)))
    return N("VERTCRS", *args)


def _id_node(marker: str, code) -> N:
    """ID[...] with numeric EPSG codes bare and authority string codes
    quoted (ID[\"PROJ\",\"EPSG_5613_TO_EPSG_4977\"])."""
    if code is not None and str(code).isdigit():
        return N("ID", Q(marker), int(code))
    return N("ID", Q(marker), Q(str(code)))


def _vertical_op_wkt(cat, op, src_code: str, dst_code: str) -> str:
    """COORDINATEOPERATION WKT2 for a vertical <-> geographic operation
    (the RH2000 -> SWEREF99 golden): VERTCRS on the vertical end, the
    3D GEOGCRS on the other, custom PROJ method IDs quoted."""
    h = op.row

    def crs_node(code):
        c = str(code)
        if c in cat.get("vertical_crs", {}):
            return _vertcrs_node(cat, c)
        return CrsDescription(c).geog_node(usage=False)

    args = [Q(op.name),
            N("SOURCECRS", crs_node(src_code)),
            N("TARGETCRS", crs_node(dst_code))]
    method = N("METHOD", Q(h["method_name"]))
    if str(h["method"]).isdigit():
        method.args.append(N("ID", Q("EPSG"), int(h["method"])))
    else:
        method.args.append(N("ID", Q("PROJ"), Q(str(h["method"]))))
    args.append(method)
    args.append(N("PARAMETERFILE", Q(h["p_name"]), Q(h["grid"])))
    if h["acc"] is not None and (not isinstance(h["acc"], (int, float))
                                 or h["acc"] >= 0):
        if isinstance(h["acc"], (int, float)):
            args.append(N("OPERATIONACCURACY", Raw(repr(h["acc"]))))
    bbox = cat["area"].get(str(h["area"]))
    aname = cat.get("area_name", {}).get(str(h["area"]), "unknown")
    w, s_, e, n = bbox
    args.append(N("USAGE", N("SCOPE", Q(h.get("scope") or "unknown")),
                  N("AREA", Q(aname)),
                  N("BBOX", _num(s_), _num(w), _num(n), _num(e))))
    args.append(_id_node(op.marker, op.code))
    return format_wkt(N("COORDINATEOPERATION", *args))


def _vgridshift_pipeline(cat, op, wrapped: bool) -> str:
    """The vertical operation's PROJ string: net direction = op
    reversal XOR the grid alternative's inverse_direction flag (the
    GTX derived from a source with the opposite sign convention);
    compound sources wrap with the horizontal axis normalization, a
    bare forward vgridshift needs no pipeline at all."""
    alt = cat.get("grid_alternatives", {})
    grid = alt.get(op.grid, op.grid)
    inv = bool(op.reversed) != bool(
        cat.get("grid_alternatives_inverse", {}).get(op.grid, 0))
    core = ("+inv " if inv else "") + \
        f"+proj=vgridshift +grids={grid} +multiplier=1"
    if wrapped:
        return ("+proj=pipeline +step +proj=axisswap +order=2,1 "
                "+step +proj=unitconvert +xy_in=deg +xy_out=rad "
                f"+step {core} "
                "+step +proj=unitconvert +xy_in=rad +xy_out=deg "
                "+step +proj=axisswap +order=2,1")
    if inv:
        return "+proj=pipeline +step " + core
    return core


def full_listing(src_code: str, dst_code: str,
                 aoi: tuple | None = None,
                 spatial_test: str = "contains",
                 grid_check: str = "sort",
                 fmt: str | None = None) -> str:
    """The non-summary pair listing (testprojinfo's NAD27 -> NAD83
    runs): per-candidate 'Operation n°N' blocks with the op's PROJ
    pipeline (empty for non-instantiable methods) and its
    COORDINATEOPERATION WKT2."""
    cat = _cat()
    ops, note = filtered_ops(src_code, dst_code, aoi, spatial_test,
                             grid_check)
    vert_dst = (str(dst_code) in cat.get("vertical_crs", {})
                or "+" in str(dst_code))
    vert_src = str(src_code) in cat.get("vertical_crs", {})
    comp_src = str(src_code) in cat.get("compound_crs", {})
    vertical = vert_dst or vert_src or comp_src
    if vertical:
        src = dst = None
    else:
        src = CrsDescription(_fold_3d_to_2d(cat, str(src_code)))
        dst = CrsDescription(_fold_3d_to_2d(cat, str(dst_code)))
        if src.kind != "geographic" or dst.kind != "geographic":
            raise NotImplementedError("full listing for this CRS kind")
    lines = [f"Candidate operations found: {len(ops)}"]
    if note:
        lines.append(note)
    alt = cat.get("grid_alternatives", {})
    for i, op in enumerate(ops):
        wkt = None
        if vertical:
            if op.ballpark or op.row is None:
                raise NotImplementedError("vertical ballpark block")
            proj = _vgridshift_pipeline(cat, op, wrapped=comp_src)
            if fmt is None:
                wkt = _vertical_op_wkt(cat, op, src_code, dst_code)
        elif op.ballpark:
            proj = "+proj=noop"
            wkt = format_wkt(_ballpark_op_node(cat, src, dst, op.name))
        elif op.is_grid and op.row is not None:
            proj, wkt = _grid_op_block(cat, op, src, dst)
        else:
            raise NotImplementedError("full listing for helmert/"
                                      "composed candidates")
        lines += ["-------------------------------------",
                  f"Operation n°{i + 1}:", "", op.line(cat), "",
                  "PROJ string:"]
        # a non-instantiable method prints no PROJ line at all
        if proj:
            lines.append(proj)
        if fmt is None and wkt is not None:
            lines += ["", "WKT2:2019 string:", wkt]
        if i + 1 < len(ops):
            lines.append("")
    return "\n".join(lines)


def conversion_pair_listing(src_code: str, dst_code: str) -> str:
    """projinfo -s <geogCRS> -t <projCRS of that base> (non-summary):
    the single candidate is the projection conversion itself —
    'Operation n°1' with its PROJ pipeline and CONVERSION WKT2
    (testprojinfo's EPSG:4326 -> EPSG:32631 segment)."""
    cat = _cat()
    s, d = str(src_code), str(dst_code)
    if d not in cat["projected_crs"] or s not in cat["geodetic_crs"]:
        raise NotImplementedError("conversion pair listing")
    proj = cat["projected_crs"][d]
    if _fold_3d_to_2d(cat, str(proj["base"])) != _fold_3d_to_2d(cat, s):
        raise NotImplementedError("not a base/projected pair")
    conv = cat["conversion"][str(proj["conversion"])]
    d_desc = CrsDescription(d)
    # summary line: conversions have accuracy 0 m and their own extent
    area = cat.get("area_name", {}).get(str(conv.get("area")), "unknown")
    lines = ["Candidate operations found: 1",
             "-------------------------------------",
             "Operation n°1:", "",
             f"EPSG:{proj['conversion']}, {conv['name']}, 0 m, {area}", "",
             "PROJ string:", _conversion_pipeline(cat, s, d), "",
             "WKT2:2019 string:"]
    node = d_desc._conversion_node()
    node.args.append(N("ID", Q("EPSG"), int(proj["conversion"])))
    lines.append(format_wkt(node))
    return "\n".join(lines)


def _conversion_pipeline(cat, src_code: str, dst_code: str) -> str:
    """The conversion's PROJ pipeline: axis normalization + unit
    conversion from the (lat-first, degree) geographic base, then the
    projection's own proj string (projinfo's operation export)."""
    from proj_spark import epsg
    steps = ["+proj=pipeline"]
    axes = cat["axis"].get(str(cat["geodetic_crs"][str(src_code)]["cs"]),
                           [])
    axes = sorted(axes, key=lambda a: a[0])
    if axes and str(axes[0][1]) == "north":
        steps.append("+step +proj=axisswap +order=2,1")
    steps.append("+step +proj=unitconvert +xy_in=deg +xy_out=rad")
    s = epsg.resolve(f"EPSG:{dst_code}")
    params = {}
    for t in s.split():
        t = t.lstrip("+")
        k, _, v = t.partition("=")
        params[k] = v if v else None
    body = _proj4_from_params(params)
    body = body.replace(" +units=m", "").replace(" +no_defs +type=crs", "")
    # a pipeline step is a bare operation: the datum id becomes its
    # ellipsoid and any towgs84 is the planner's business, not the step's
    body = body.replace("+datum=WGS84", "+ellps=WGS84")
    if "+towgs84=" in body:
        body = " ".join(p for p in body.split()
                        if not p.startswith("+towgs84="))
    steps.append("+step " + body)
    return " ".join(steps)


def resolve_area_arg(arg: str):
    """--area handling: AUTH:CODE or a name (sub)string.  Returns
    (bbox, None) on success or (None, error_lines) mirroring the
    reference's messages."""
    cat = _cat()
    if ":" in arg:
        auth, _, code = arg.partition(":")
        bbox = cat["area"].get(code) if auth == "EPSG" else None
        if bbox is None:
            return None, ["Area of use retrieval failed: area not found"]
        return tuple(bbox), None
    names = cat.get("area_name", {})
    matches = [(c, n) for c, n in names.items()
               if c.isdigit() and arg in str(n)]
    exact = [(c, n) for c, n in matches if str(n) == arg]
    if exact:
        return tuple(cat["area"][exact[0][0]]), None
    if not matches:
        return None, ["No area of use matching provided name"]
    if len(matches) > 1:
        out = ["Several candidates area of use matching provided name :"]
        for c, n in sorted(matches, key=lambda kv: int(kv[0])):
            out.append(f"  EPSG:{c} : {n}")
        return None, out
    return tuple(cat["area"][matches[0][0]]), None


#: EPSG parameter code -> WKT2 parameter name (the handful the
#: conversion table uses; reference parameter names from the method
#: definitions in data/sql/coordinate_operation.sql)
_PARAM_NAMES = {
    "8801": "Latitude of natural origin",
    "8802": "Longitude of natural origin",
    "8805": "Scale factor at natural origin",
    "8806": "False easting",
    "8807": "False northing",
    "8811": "Latitude of projection centre",
    "8812": "Longitude of projection centre",
    "8813": "Azimuth of initial line",
    "8814": "Angle from Rectified to Skew Grid",
    "8815": "Scale factor on initial line",
    "8816": "Easting at projection centre",
    "8817": "Northing at projection centre",
    "8821": "Latitude of false origin",
    "8822": "Longitude of false origin",
    "8823": "Latitude of 1st standard parallel",
    "8824": "Latitude of 2nd standard parallel",
    "8826": "Easting at false origin",
    "8827": "Northing at false origin",
    "8831": "Longitude of origin",
    "8832": "Latitude of standard parallel",
    "8833": "Longitude of natural origin",
}


# ---------------------------------------------------------------------------
# the PROJ.4 string block
# ---------------------------------------------------------------------------

def proj4_string(code: str) -> str:
    """The projinfo 'PROJ.4 string:' line: the engine's proj-string
    lowering plus the reference's +no_defs +type=crs trailer, with
    +datum/+ellps recovery and UTM collapse like io.cpp's
    exportToPROJString CRS path."""
    from proj_spark import epsg
    from proj_spark.operations import cs2cs
    s = epsg.resolve(f"EPSG:{code}" if str(code).isdigit() else code)
    toks = s.split()
    params = {}
    order = []
    for t in toks:
        t = t.lstrip("+")
        if "=" in t:
            k, v = t.split("=", 1)
        else:
            k, v = t, None
        params[k] = v
        order.append(k)
    out = _proj4_from_params(params)
    return out


def _proj4_from_params(params: dict) -> str:
    def close(x, y, tol=1e-9):
        try:
            return abs(float(x) - float(y)) <= tol
        except (TypeError, ValueError):
            return False

    # ellps recovery from a/rf (the common golden ellipsoids)
    a, rf, b = params.get("a"), params.get("rf"), params.get("b")
    ell = params.get("ellps")
    if ell is None and a is not None:
        for (ea, erf), name in _ELLPS_RECOVER.items():
            if close(a, ea) and (erf is None or
                                 (rf is not None and close(rf, erf))):
                ell = name
                break
    proj = params.get("proj")
    lat_0 = params.get("lat_0", 0.0)
    k = params.get("k", params.get("k_0", 1.0))
    x_0 = params.get("x_0", 0.0)
    y_0 = params.get("y_0", 0.0)
    lon_0 = float(params.get("lon_0", 0.0) or 0.0)
    utm_zone = params.get("zone")
    if (proj == "tmerc" and close(lat_0, 0) and close(k, 0.9996)
            and close(x_0, 500000) and close(y_0, 0)
            and "pm" not in params):
        z = (lon_0 + 183.0) / 6.0
        if abs(z - round(z)) < 1e-9 and 1 <= round(z) <= 60:
            utm_zone = int(round(z))
    parts = []
    if proj in ("longlat", "latlong"):
        parts.append("+proj=longlat")
    elif proj == "utm" or utm_zone is not None:
        parts.append(f"+proj=utm +zone={int(float(utm_zone))}")
        if params.get("south") is not None:
            parts.append("+south")
    elif proj == "tmerc":
        parts.append(f"+proj=tmerc +lat_0={_g(float(lat_0))} "
                     f"+lon_0={_g(lon_0)} +k={_g(float(k))} "
                     f"+x_0={_g(float(x_0))} +y_0={_g(float(y_0))}")
    else:
        raise NotImplementedError(f"PROJ.4 display for +proj={proj}")
    if ell == "WGS84" and proj in ("longlat", "latlong") \
            and "pm" not in params:
        parts.append("+datum=WGS84")
    elif ell == "WGS84" and params.get("datum") == "WGS84":
        parts.append("+datum=WGS84")
    elif params.get("datum") == "WGS84" and "pm" not in params:
        parts.append("+datum=WGS84")
    elif ell is not None:
        parts.append(f"+ellps={ell}")
    elif a is not None:
        parts.append(f"+a={a}" + (f" +rf={rf}" if rf else "")
                     + (f" +b={b}" if b else ""))
    tw = params.get("towgs84")
    if tw:
        vals = [v.strip() for v in str(tw).split(",")]
        if len(vals) == 3:
            vals += ["0", "0", "0", "0"]
        parts.append("+towgs84=" + ",".join(_g(float(v)) for v in vals))
    if "pm" in params:
        pmv = params["pm"]
        name = next((n for v, n in _PM_NAMES if close(pmv, v)), None)
        parts.append(f"+pm={name if name else _g(float(pmv))}")
    if proj not in ("longlat", "latlong"):
        parts.append("+units=m")
    parts.append("+no_defs +type=crs")
    return " ".join(parts)


_ELLPS_RECOVER = {("6378137.0", "298.257223563"): "WGS84",
                  ("6378137.0", "298.257222101"): "GRS80",
                  ("6378388.0", "297.0"): "intl",
                  ("6377397.155", "299.1528128"): "bessel",
                  ("6378206.4", None): "clrk66",
                  ("6378249.2", None): "clrk80ign"}

#: prime meridian greenwich longitudes (degrees) -> proj pm name
_PM_NAMES = [(12.452333333333332, "rome"), (2.337229166666667, "paris"),
             (2.337229169999998, "paris")]


# ---------------------------------------------------------------------------
# raw WKT1 input display (the testprojinfo "non compliant WKT1" segment)
# ---------------------------------------------------------------------------

_WKT1_MEMBER = __import__("re").compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _wkt_error_text(text: str, n: int, msg: str) -> str:
    """pj_wkt_error's caret-context formatting (src/wkt_parser.cpp:
    35-60): 40 chars either side of the last-success position `n`,
    newline handling included, caret under position n."""
    start_i = max(0, n - 40)
    ctxt: list[str] = []
    i = start_i
    while i < n + 40 and i < len(text):
        ch = text[i]
        if ch in "\r\n":
            if i > n:
                break
            ctxt = []
            start_i = i + 1
        else:
            ctxt.append(ch)
        i += 1
    return ("Parsing error : " + msg + ". Error occurred around:\n"
            + "".join(ctxt) + "\n" + " " * (n - start_i) + "^")


def wkt1_strict_error(text: str) -> str | None:
    """Engine twin of pj_wkt1_parse for the member-ORDER productions of
    the strict WKT1 grammar's geographic_cs (src/wkt1_grammar.y:160-162:
    GEOGCS[name, DATUM, PRIMEM, UNIT, ...]).  Reports the first
    out-of-order member keyword the way bison does ('syntax error,
    unexpected X, expecting Y') with the wkt_parser.cpp caret context;
    returns None when the checked productions hold (other WKT1 error
    classes are outside this lint's scope)."""
    head = _WKT1_MEMBER.match(text.lstrip())
    if head is None or head.group(0).upper() != "GEOGCS":
        return None
    # top-level members: keywords at bracket depth 1
    depth = 0
    members: list[tuple[str, int]] = []
    i = 0
    while i < len(text):
        ch = text[i]
        if ch == '"':                      # skip quoted strings
            j = text.find('"', i + 1)
            i = len(text) if j < 0 else j + 1
            continue
        if ch in "[(":
            depth += 1
        elif ch in "])":
            depth -= 1
        elif depth == 1 and (ch.isalpha() or ch == "_"):
            m = _WKT1_MEMBER.match(text, i)
            members.append((m.group(0).upper(), i))
            i = m.end()
            continue
        i += 1
    expected = ["DATUM", "PRIMEM", "UNIT"]
    for want, (got, pos) in zip(expected, members):
        if got != want:
            return _wkt_error_text(
                text, pos,
                f"syntax error, unexpected {got}, expecting {want}")
        if got == "UNIT":
            break
    return None


#: canonical datum name -> classic proj +datum= shorthand
#: (the PROJ-string exporter's datum recognition, datum.cpp aliases)
_PROJ_DATUM_NAMES = {
    "World Geodetic System 1984": "WGS84",
    "North American Datum 1983": "NAD83",
    "North American Datum 1927": "NAD27",
    "Deutsches Hauptdreiecksnetz": "potsdam",
}


def wkt1_geogcs_display(text: str) -> str:
    """projinfo display for a raw WKT1 GEOGCS definition (projinfo.cpp
    main: WKTParser with warnings, then the default PROJ.4 + WKT2:2019
    output).  Mirrors io.cpp parse behaviors: missing PRIMEM defaults
    to Greenwich WITH a recoverable warning (io.cpp:2640-2647) and the
    EPSG:8901 identifier; a 'WGS_1984' datum name canonicalizes to the
    EPSG 6326 name without acquiring identifiers (io.cpp:2000-2002);
    WKT1 implicit CS yields lon-first lowercase 'longitude'/'latitude'
    axes; the strict-grammar lint result is appended to the warning
    list (createFromWKT, io.cpp:6085-6096).  Since the parsed object
    carries no top-level ID, database-backed inner objects keep their
    IDs (metre 9001, Greenwich 8901) — the WKTFormatter rule the
    catalog-code displays invert."""
    from proj_spark.wkt import parse_wkt
    root = parse_wkt(text)
    if root.name.upper() != "GEOGCS":
        raise NotImplementedError("WKT1 display: GEOGCS only")
    if root.child("AXIS") is not None:
        raise NotImplementedError("WKT1 display: explicit AXIS nodes")
    names = root.strings()
    datum_node = root.child("DATUM")
    unit_node = root.child("UNIT")
    if not names or datum_node is None or unit_node is None:
        raise NotImplementedError("WKT1 display: incomplete GEOGCS")
    name = names[0]
    warnings: list[str] = []

    datum_name = (datum_node.strings() or ["unknown"])[0]
    if datum_name == "WGS_1984":
        datum_name = "World Geodetic System 1984"
    sph = datum_node.child("SPHEROID", "ELLIPSOID")
    if sph is None or len(sph.numbers()) < 2:
        raise NotImplementedError("WKT1 display: SPHEROID")
    ell_name = (sph.strings() or ["unknown"])[0]
    a, rf = sph.numbers()[0], sph.numbers()[1]

    primem = root.child("PRIMEM")
    if primem is None:
        warnings.append("GEOGCS should have a PRIMEM node")
        pm_name, pm_lon, pm_id = "Greenwich", 0.0, 8901
    else:
        pm_name = (primem.strings() or ["Greenwich"])[0]
        pm_lon = (primem.numbers() or [0.0])[0]
        pm_id = None

    u_name = (unit_node.strings() or ["degree"])[0]
    u_conv = (unit_node.numbers() or [math.pi / 180.0])[0]

    err = wkt1_strict_error(text)
    if err is not None:
        warnings.append(err)

    def angleunit():
        return N("ANGLEUNIT", Q(u_name), u_conv)

    pm_args = [Q(pm_name), _num(pm_lon), angleunit()]
    if pm_id is not None:
        pm_args.append(N("ID", Q("EPSG"), pm_id))
    tree = N(
        "GEOGCRS", Q(name),
        N("DATUM", Q(datum_name),
          N("ELLIPSOID", Q(ell_name), a, rf,
            N("LENGTHUNIT", Q("metre"), 1,
              N("ID", Q("EPSG"), 9001)))),
        N("PRIMEM", *pm_args),
        N("CS", Raw("ellipsoidal"), 2),
        N("AXIS", Q("longitude"), Raw("east"), N("ORDER", 1),
          angleunit(), extra_indent=1),
        N("AXIS", Q("latitude"), Raw("north"), N("ORDER", 2),
          angleunit(), extra_indent=1))

    datum_short = _PROJ_DATUM_NAMES.get(datum_name)
    if datum_short is not None and pm_lon == 0.0:
        proj = f"+proj=longlat +datum={datum_short} +no_defs +type=crs"
    else:
        from proj_spark.ellipsoids import ELLIPSOIDS
        ellps = None
        for ename, (ea, kind, ev) in ELLIPSOIDS.items():
            if kind == "rf" and abs(ea - a) < 1e-6 and abs(ev - rf) < 1e-9:
                ellps = ename
                break
        spec = (f"+ellps={ellps}" if ellps
                else f"+a={_g(a)} +rf={_g(rf)}")
        proj = f"+proj=longlat {spec} +no_defs +type=crs"

    out = [f"Warning: {w}" for w in warnings]
    out.append("PROJ.4 string:\n" + proj
               + "\n\nWKT2:2019 string:\n" + format_wkt(tree))
    return "\n".join(out)
