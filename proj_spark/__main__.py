"""Command-line entry points mirroring the reference's CLI apps:

    python -m proj_spark proj <+proj-string|EPSG:code|WKT>   [< coords]
    python -m proj_spark cs2cs <src> <dst>                   [< coords]
    python -m proj_spark cct <+proj-string>                  [< 4D coords]
    python -m proj_spark projinfo <definition>
    python -m proj_spark geod <+ellps=...> [-I]              [< coords]
    python -m proj_spark gie <file.gie> [...]

`proj` reads "lon lat [z [t]]" lines from stdin (degrees for angular
input, like src/apps/proj.cpp) and prints projected coordinates; `-I`
inverts.  `cs2cs` transforms between two CRSs through the planner
(src/apps/cs2cs.cpp analogue).  `projinfo` prints the resolved
proj-string, ellipsoid, and — for CRS pairs via `projinfo src dst` —
the ranked candidate operations (src/apps/projinfo.cpp analogue).

Batch semantics: stdin is consumed in chunks and processed through the
same vectorized NumPy kernels the Spark UDFs use, so the CLI is also a
convenient single-node smoke harness for the kernels.
"""

from __future__ import annotations

import sys

import numpy as np


def _read_coords(stream):
    rows = []
    for line in stream:
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        rows.append([float(v) for v in line.split()[:4]])
    n = max((len(r) for r in rows), default=2)
    arr = np.full((len(rows), 4), np.nan)
    for i, r in enumerate(rows):
        arr[i, :len(r)] = r
    return arr, n


def _fmt(vals, ncols):
    out = []
    for row in zip(*vals):
        out.append("\t".join(f"{v:.10g}" for v in row[:ncols]))
    return "\n".join(out)


_COORD_TOKEN = __import__("re").compile(r"\s*(\S+)")


def _consume_coord(line: str, pos: int) -> tuple[float, int]:
    """Parse one coordinate token (decimal or PROJ DMS) starting at
    `pos`; returns (degrees-or-value, end position) — the engine
    analogue of proj_dmstor's pointer-advancing parse."""
    from proj_spark.operations.cs2cs import dms_to_deg
    m = _COORD_TOKEN.match(line, pos)
    if m is None:
        raise ValueError("no coordinate")
    return dms_to_deg(m.group(1)), m.end()


def cmd_proj(args) -> int:
    """Filter like the reference's proj app (src/apps/proj.cpp): reads
    'lon lat [trailing text]' lines (DMS accepted), projects, prints.
    Flags: -I inverse, -E echo the consumed input before the output,
    -f <fmt> printf-style output format (default %.10g), -r reverse
    input order (lat lon first).  Trailing text after the two parsed
    coordinates is passed through verbatim, as the reference does —
    the CLI golden diffs (test/cli/pj_out27.dist) depend on it."""
    from proj_spark import create
    inverse = echo = revin = False
    oform = "%.10g"
    rest: list[str] = []
    it = iter(args)
    for a in it:
        if a == "-I":
            inverse = True
        elif a == "-E":
            echo = True
        elif a == "-r":
            revin = True
        elif a == "-f":
            oform = next(it, oform)
        else:
            rest.append(a)
    op = create(" ".join(rest))
    # The reference's proj app builds its operator through the legacy
    # pj_init path (src/apps/proj.cpp:506 proj.fwd = pj_fwd), which
    # never runs cs2cs_emulation_setup — so +towgs84/+datum/+nadgrids/
    # +geoidgrids modifiers are NOT applied by proj (pure projection);
    # pj_out83.dist's values depend on this (the GRS80 null-towgs84
    # cart hop would shift the last printed digit)
    if hasattr(op, "datum_chain"):
        op.datum_chain = None
        op.hgridshifts = []
        op.vgridshifts = []
    out_lines = []
    for line in sys.stdin:
        line = line.rstrip("\n")
        stripped = line.split("#", 1)[0].strip()
        if not stripped:
            continue
        try:
            a, p1 = _consume_coord(line, 0)
            b, p2 = _consume_coord(line, p1)
        except ValueError:
            out_lines.append("*\t*")
            continue
        if revin:
            a, b = b, a
        remainder = line[p2:]
        prefix = (line[:p2] + "\t") if echo else ""
        va = np.array([a])
        vb = np.array([b])
        if inverse:
            lam, phi = op.inv(va, vb)
            ox, oy = np.degrees(lam), np.degrees(phi)
        else:
            ox, oy = op.fwd(np.radians(va), np.radians(vb))
        out_lines.append(prefix + (oform % ox[0]) + "\t"
                         + (oform % oy[0]) + remainder)
    if out_lines:
        print("\n".join(out_lines))
    return 0


_NUM_TOKEN = __import__("re").compile(
    r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?")


def cmd_cs2cs(args) -> int:
    """Filter like the reference's cs2cs (src/apps/cs2cs.cpp): reads
    'c1 c2 [z [t]] [trailing]' lines (DMS accepted for geographic
    input), transforms src -> dst, prints.  Flags: -E echo the consumed
    input, -f <fmt> printf output format, -r/-s reverse in/out order.
    Source/destination split at '+to' (or exactly two bare arguments).
    Default output for a geographic destination is the reference's DMS
    form (rtodms, zero fields trimmed) — the format the test/cli golden
    files record; failed points print the reference's '*\\t*'."""
    from proj_spark import crs_to_crs
    from proj_spark.operations.cs2cs import dms_to_deg, rtodms
    echo = revin = revout = inverse = False
    oform = None
    dms_fract, dms_conw = 3, False
    rest: list[str] = []
    it = iter(args)
    for a in it:
        if a == "-E":
            echo = True
        elif a == "-r":
            revin = True
        elif a == "-s":
            revout = True
        elif a == "-I":
            inverse = True
        elif a == "-f":
            oform = next(it, None)
        elif a == "-d":
            # decimal output with N digits (cs2cs.cpp:489-494)
            oform = f"%.{int(next(it, '2'))}f"
        elif len(a) == 3 and a[:2] in ("-w", "-W") and a[2].isdigit():
            # DMS seconds precision (set_rtodms; -W = constant width)
            dms_fract, dms_conw = int(a[2]), a[1] == "W"
        else:
            rest.append(a)
    src_code = dst_code = False
    if "+to" in rest:
        i = rest.index("+to")
        src = " ".join(rest[:i])
        dst = " ".join(rest[i + 1:])
    elif rest and rest[0].startswith("+"):
        # proj-string source with no +to: the destination defaults to
        # geographic on the SAME datum/ellipsoid (classic cs2cs)
        src = " ".join(rest)
        from proj_spark.projstring import parse_projstring
        keep = ("ellps", "a", "b", "rf", "es", "f", "R", "datum",
                "towgs84", "nadgrids", "geoidgrids", "pm")
        p = parse_projstring(src)
        dst = " ".join(["+proj=latlong"]
                       + [f"+{k}" if p[k] is True else f"+{k}={p[k]}"
                          for k in keep if k in p])
    else:
        src, dst = rest[0], " ".join(rest[1:])
    if inverse:
        src, dst = dst, src    # -I swaps the transform direction
    t = crs_to_crs(src, dst)

    def _angular(leg) -> bool:
        if leg.is_geographic:
            return True
        p = leg.params
        return (p.get("proj") == "ob_tran"
                and str(p.get("o_proj", "")) in ("latlong", "longlat",
                                                 "latlon", "lonlat"))

    src_ang = _angular(t.src)
    dst_ang = _angular(t.dst)
    # authority-resolved GEOGRAPHIC CRSs are lat-first (EPSG CS
    # 6422/6423); the reference honors that axis order on both io
    # sides (cs2cs.cpp isLatFirst) — proj-strings stay lon-first
    src_latfirst = t.src.axis_lat_first and src_ang
    dst_latfirst = t.dst.axis_lat_first and dst_ang
    if oform is None and (not dst_ang
                          or "geoidgrids" in t.dst.params):
        # the reference's default: %.2f for any non-"pure geographic"
        # destination — a +geoidgrids leg instantiates as a COMPOUND
        # CRS, so destIsGeog is false and output is decimal degrees
        # (cs2cs.cpp:646-647 + instantiate_crs type check;
        # td_out.dist's "WGS84 -> WGS84+EGM96" records 2.00 49.00)
        oform = "%.2f"
    out_lines: list[str] = []
    for line in sys.stdin:
        line = line.rstrip("\n")
        if not line.strip():
            continue
        if line.lstrip().startswith("#"):
            out_lines.append(line)    # tag lines echo verbatim
            continue
        try:
            a, p1 = _consume_coord(line, 0)
            b, p2 = _consume_coord(line, p1)
        except ValueError:
            out_lines.append("*\t*")
            continue
        if revin != src_latfirst:      # -r XOR lat-first axis order
            a, b = b, a
        # optional z: a numeric token right after the two coords
        m = _NUM_TOKEN.match(line[p2:].lstrip())
        if m:
            z = float(m.group(0))
            stripped = len(line[p2:]) - len(line[p2:].lstrip())
            p3 = p2 + stripped + m.end()
        else:
            z = 0.0
            p3 = p2
        remainder = line[p3:]
        prefix = (line[:p3] + "\t") if echo else ""
        # optional t: peeked but NOT consumed — the reference reads it
        # for the transform and forwards it verbatim from the input
        # (cs2cs.cpp "possible t component ... rewind" hack)
        mt = _NUM_TOKEN.match(remainder.lstrip())
        vt = np.array([float(mt.group(0))]) if mt else None
        va, vb = np.array([a]), np.array([b])
        vz = np.array([z])
        if src_ang:
            va, vb = np.radians(va), np.radians(vb)
        ox, oy, oz = t.fwd4d(va, vb, vz, vt)
        bad = not (np.isfinite(ox[0]) and np.isfinite(oy[0]))
        # proj_trans poisons the WHOLE coordinate on error: z prints as
        # printf(oform, HUGE_VAL) = "inf" (tv_out.dist records this)
        zfmt = ("inf" if bad
                else (oform % oz[0]) if oform else f"{oz[0]:.3f}")
        if bad:
            out_lines.append(prefix + "*\t* " + zfmt + remainder)
            continue
        latfirst = revout != dst_latfirst
        u, v = (oy[0], ox[0]) if latfirst else (ox[0], oy[0])
        if dst_ang and oform is None:
            if latfirst:
                body = (rtodms(u, "N", "S", dms_fract, dms_conw) + "\t"
                        + rtodms(v, "E", "W", dms_fract, dms_conw))
            else:
                body = (rtodms(u, "E", "W", dms_fract, dms_conw) + "\t"
                        + rtodms(v, "N", "S", dms_fract, dms_conw))
        else:
            if dst_ang:
                u, v = np.degrees(u), np.degrees(v)
            fmt = oform or "%.10g"
            body = (fmt % u) + "\t" + (fmt % v)
        out_lines.append(prefix + body + " " + zfmt + remainder)
    if out_lines:
        print("\n".join(out_lines))
    return 0


def _end_units(op, input_side: bool) -> str:
    """Effective io units at a pipeline end (shared with the gie
    runner's proj_angular_input/_output analogue)."""
    from proj_spark.gie import end_units
    return end_units(op, input_side)


def cmd_cct(args) -> int:
    """4D filter like the reference's cct (src/apps/cct.cpp): reads
    "x y [z [t]]" lines, applies the operation's highest arity, prints
    all four columns in the reference's fixed-width format
    (%14.<da>f for angular output, %13.<dd>f otherwise, t %12.4f;
    defaults da=10 dd=4, -d N sets both — testcct_out.dist is the
    golden).  A missing t column prints 'inf' (HUGE_VAL), as the
    reference does."""
    from proj_spark import create
    inverse = "-I" in args
    args = [a for a in args if a != "-I"]
    dec_ang, dec_dist = 10, 4
    if "-d" in args:
        i = args.index("-d")
        dec_ang = dec_dist = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    op = create(" ".join(args))
    arr, ncols = _read_coords(sys.stdin)
    if not len(arr):
        return 0
    x, y = arr[:, 0].copy(), arr[:, 1].copy()
    z = np.where(np.isnan(arr[:, 2]), 0.0, arr[:, 2])
    t_missing = np.isnan(arr[:, 3])
    t = np.where(t_missing, 0.0, arr[:, 3])
    if _end_units(op, input_side=not inverse) == "radians":
        x, y = np.radians(x), np.radians(y)
    f4 = getattr(op, "inv4d" if inverse else "fwd4d", None)
    if f4 is not None:
        ox, oy, oz, ot = f4(x, y, z, t)
    else:
        ox, oy = (op.inv if inverse else op.fwd)(x, y)
        oz, ot = z, t
    angular_out = _end_units(op, input_side=inverse) == "radians"
    if angular_out:
        ox, oy = np.degrees(ox), np.degrees(oy)
    ot = np.where(t_missing, np.inf, ot)
    lines = []
    for u, v, w, tt in zip(ox, oy, oz, ot):
        if angular_out:
            lines.append(f"{u:14.{dec_ang}f}  {v:14.{dec_ang}f}  "
                         f"{w:12.{dec_dist}f}  {tt:12.4f}")
        else:
            lines.append(f"{u:13.{dec_dist}f}  {v:13.{dec_dist}f}  "
                         f"{w:12.{dec_dist}f}  {tt:12.4f}")
    print("\n".join(lines))
    return 0


def _projinfo_crs_display(definition: str, fmt: str | None) -> str:
    """The reference projinfo's CRS display (projinfo.cpp outputObject):
    'PROJ.4 string:' + WKT2:2019 by default, or the -o format(s); ALL
    chains every format with blank-line separators.  Raises
    NotImplementedError for object kinds the text layer doesn't model
    (the caller falls back to the engine's own summary)."""
    from proj_spark.projinfo_text import CrsDescription, proj4_string
    code = definition.strip()
    if code.upper().startswith("GEOGCS") and fmt is None:
        # raw WKT1 input: warnings (strict-grammar lint + recoverable
        # parse notes) then the default PROJ.4 + WKT2:2019 display
        from proj_spark.projinfo_text import wkt1_geogcs_display
        return wkt1_geogcs_display(definition)
    if code.upper().startswith("EPSG:"):
        code = code.split(":", 1)[1]
    if not code.isdigit():
        raise NotImplementedError("projinfo display needs a catalog code")
    d = CrsDescription(code)
    head = ""
    if d.deprecated:
        head = "Warning: object is deprecated\n"
        alt = d.cat.get("deprecation", {}).get(str(code))
        if alt:
            head += f"Alternative non-deprecated CRS:\n  EPSG:{alt}\n"
        head += "\n"
    blocks = {
        "PROJ": lambda: "PROJ.4 string:\n" + proj4_string(code),
        "WKT2_2019": lambda: "WKT2:2019 string:\n" + d.wkt2(True),
        "WKT2_2015": lambda: "WKT2:2015 string:\n" + d.wkt2(False),
        "WKT1_GDAL": lambda: "WKT1:GDAL string:\n" + d.wkt1_gdal(),
        "WKT1_ESRI": lambda: "WKT1:ESRI string:\n" + d.wkt1_esri(),
        "PROJJSON": lambda: "PROJJSON:\n" + d.projjson(),
    }
    if fmt is None:
        return head + blocks["PROJ"]() + "\n\n" + blocks["WKT2_2019"]()
    if fmt == "ALL":
        # -o ALL chains the formats; the golden separates PROJ/WKT2
        # blocks with one blank line and the WKT1:ESRI / PROJJSON
        # blocks with two (projinfo.cpp outputObject newline pattern)
        return (head
                + "\n\n".join(blocks[k]() for k in (
                    "PROJ", "WKT2_2015", "WKT2_2019", "WKT1_GDAL"))
                + "\n\n\n" + blocks["WKT1_ESRI"]()
                + "\n\n\n" + blocks["PROJJSON"]())
    if fmt in blocks:
        return head + blocks[fmt]()
    raise NotImplementedError(f"projinfo -o {fmt}")


def _projinfo_pair_summary(args) -> str:
    """-s/-t --summary candidate listing (projinfo.cpp outputOperations
    summary path); NotImplementedError falls back to the legacy view."""
    from proj_spark.projinfo_text import resolve_area_arg, summary_listing
    opts = {"-s": None, "-t": None}
    aoi = None
    spatial = "contains"
    grid_check = "sort"
    out_fmt = None
    quiet = False
    i = 0
    summary = False

    def val(i, a):
        # a trailing flag without its value must not crash the CLI
        # (projinfo.cpp exits with a usage error); NotImplementedError
        # routes to the engine's fallback/usage path
        if i + 1 >= len(args):
            raise NotImplementedError(f"projinfo flag {a} missing value")
        return args[i + 1]

    while i < len(args):
        a = args[i]
        if a in ("-s", "-t"):
            opts[a] = val(i, a)
            i += 2
        elif a == "-q":
            quiet = True
            i += 1
        elif a == "--summary":
            summary = True
            i += 1
        elif a == "--spatial-test":
            spatial = val(i, a)
            i += 2
        elif a == "--grid-check":
            grid_check = val(i, a)
            i += 2
        elif a == "-o":
            fmt = val(i, a)
            if fmt != "PROJ":
                raise NotImplementedError(f"pair display -o {fmt}")
            out_fmt = fmt
            i += 2
        elif a == "--3d":
            i += 1                  # summary output is promotion-neutral
        elif a == "--bbox":
            w, s, e, n = (float(v) for v in val(i, a).split(","))
            aoi = (w, s, e, n)
            i += 2
        elif a == "--area":
            bbox, err = resolve_area_arg(val(i, a))
            if err is not None:
                return "\n".join(err)
            aoi = bbox
            i += 2
        else:
            raise NotImplementedError(f"projinfo flag {a}")
    if opts["-s"] is None or opts["-t"] is None:
        raise NotImplementedError("projinfo pair display needs -s/-t")
    src_str = opts["-s"].strip().strip('"')
    tgt_str = opts["-t"].strip().strip('"').upper()
    if (quiet and out_fmt == "PROJ" and src_str.startswith("+")
            and "geoidgrids=" in src_str
            and tgt_str in ("EPSG:4326", "EPSG:4979", "4326", "4979")):
        # BoundCRS proj-string source with a geoid model -> plain
        # geographic target: -q prints the first candidate's pipeline
        # (the testprojinfo @foo.gtx segment; the optional grid rides
        # the pipeline whether or not its file exists)
        from proj_spark.projstring import parse_projstring
        p = parse_projstring(src_str)
        grids = str(p["geoidgrids"])
        return ("+proj=pipeline "
                "+step +proj=unitconvert +xy_in=deg +xy_out=rad "
                f"+step +proj=vgridshift +grids={grids} +multiplier=1 "
                "+step +proj=unitconvert +xy_in=rad +xy_out=deg "
                "+step +proj=axisswap +order=2,1")

    def code_of(v):
        v = v.strip().strip('"')
        if v.upper().startswith("EPSG:"):
            v = v.split(":", 1)[1]
        if v.isdigit() or ("+" in v and
                           all(p.isdigit() for p in v.split("+"))):
            return v
        from proj_spark import factory
        from proj_spark.factory import catalog
        c = factory.find_crs_by_name(v)
        if c is not None:
            return str(c)
        for code, row in catalog().get("vertical_crs", {}).items():
            if (":" not in code and str(row["name"]) == v
                    and not row["deprecated"]):
                return code
        raise NotImplementedError(f"projinfo CRS name {v!r}")

    s, d = code_of(opts["-s"]), code_of(opts["-t"])
    if summary:
        return "\n".join(summary_listing(s, d, aoi=aoi,
                                         spatial_test=spatial,
                                         grid_check=grid_check))
    from proj_spark.projinfo_text import (conversion_pair_listing,
                                          full_listing)
    try:
        if out_fmt is None:
            return conversion_pair_listing(s, d)
        raise NotImplementedError("-o PROJ pair: full listing")
    except NotImplementedError:
        return full_listing(s, d, aoi=aoi, spatial_test=spatial,
                            grid_check=grid_check, fmt=out_fmt)


def cmd_projinfo(args) -> int:
    from proj_spark import create, epsg
    # reference-format display paths (testprojinfo golden); unsupported
    # inputs fall through to the engine's own summary output below
    try:
        if "-s" in args and "-t" in args:
            print(_projinfo_pair_summary(args))
            return 0
    except NotImplementedError:
        pass
    if "-s" in args or "-t" in args:
        # -s/-t inputs the pair path could not handle (unsupported
        # combination or a trailing flag with no value): usage error,
        # never a traceback (projinfo.cpp exits with usage)
        print("projinfo: unsupported -s/-t invocation "
              "(missing value or unsupported option combination)")
        return 2
    try:
        if "-o" in args:
            i = args.index("-o")
            fmt = args[i + 1] if i + 1 < len(args) else ""
            rest = [a for j, a in enumerate(args) if j not in (i, i + 1)]
            if len(rest) == 1 and fmt in ("PROJ", "WKT2_2019", "WKT2_2015",
                                          "WKT1_GDAL", "WKT1_ESRI",
                                          "PROJJSON", "ALL"):
                print(_projinfo_crs_display(rest[0], fmt))
                return 0
        elif len(args) == 1:
            print(_projinfo_crs_display(args[0], None))
            return 0
        elif len(args) == 2 and "--3d" in args:
            from proj_spark.projinfo_text import (CrsDescription,
                                                  proj4_string)
            code = [a for a in args if a != "--3d"][0]
            if code.upper().startswith("EPSG:"):
                code = code.split(":", 1)[1]
            d = CrsDescription(code)
            print("PROJ.4 string:\n" + proj4_string(code)
                  + "\n\nWKT2:2019 string:\n" + d.wkt2_promoted_3d())
            return 0
    except NotImplementedError:
        pass
    if "-o" in args:
        i = args.index("-o")
        if i + 1 >= len(args):
            print("projinfo -o needs a format: wkt2 | projjson")
            return 2
        fmt = args[i + 1].lower()
        rest = args[:i] + args[i + 2:]
        definition = " ".join(rest)
        from proj_spark import wkt_export
        if fmt == "wkt2":
            print(wkt_export.to_wkt2(definition))
        elif fmt == "projjson":
            print(wkt_export.to_projjson_str(definition))
        else:
            print(f"unknown output format {fmt!r}; expected wkt2 | projjson")
            return 2
        return 0
    if len(args) >= 2 and not args[1].startswith("-"):
        from proj_spark.planner import crs_to_crs
        t = crs_to_crs(args[0], args[1])
        print(f"Candidate operations ({args[0]} -> {args[1]}):")
        for i, c in enumerate(t.candidates):
            acc = f"{c.accuracy} m" if c.accuracy >= 0 else "unknown"
            print(f"  {i + 1}. {c.name}  [accuracy: {acc}, "
                  f"extent: {c.extent}]")
        return 0
    definition = " ".join(args)
    if definition.strip().upper().startswith("EPSG:"):
        resolved = epsg.resolve(definition.strip())
        print(f"proj-string: {resolved}")
    else:
        resolved = definition
    op = create(definition)
    ell = getattr(op, "ell", None)
    if ell is not None:
        print(f"operation:   {getattr(op, 'proj_name', type(op).__name__)}")
        print(f"ellipsoid:   {ell.name} a={ell.a!r} es={ell.es!r}")
    else:
        print(f"operation:   pipeline ({len(op.steps)} steps)")
    return 0


def cmd_geod(args) -> int:
    """Geodesic filter like the reference's geod (src/apps/geod.cpp):
    direct mode reads "lat1 lon1 azi1 s12" lines and prints
    "lat2 lon2 azi2(back)"; -I (inverse) reads "lat1 lon1 lat2 lon2"
    and prints "azi1 azi2 s12".  Ellipsoid from +ellps/+a/+rf/+f."""
    from proj_spark.ellipsoids import ellipsoid_from_params
    from proj_spark.operations.karney import Geodesic
    from proj_spark.projstring import parse_projstring
    inverse = "-I" in args
    args = [a for a in args if a != "-I"]
    params = parse_projstring(" ".join(args)) if args else {}
    params.setdefault("ellps", "WGS84")
    ell = ellipsoid_from_params(params)
    g = Geodesic(ell.a, ell.f)
    arr, ncols = _read_coords(sys.stdin)
    if not len(arr):
        return 0
    r = np.radians

    def back(azi2_deg):
        # both geod modes print the BACK azimuth at the destination
        # (src/apps/geod_interface.cpp:20,32)
        return np.where(azi2_deg >= 0.0, azi2_deg - 180.0, azi2_deg + 180.0)

    if inverse:
        s12, azi1, azi2 = g.inverse(r(arr[:, 0]), r(arr[:, 1]),
                                    r(arr[:, 2]), r(arr[:, 3]))[:3]
        print(_fmt((np.degrees(azi1), back(np.degrees(azi2)), s12), 3))
    else:
        lat2, lon2, azi2 = g.direct(r(arr[:, 0]), r(arr[:, 1]),
                                    r(arr[:, 2]), arr[:, 3])[:3]
        print(_fmt((np.degrees(lat2), np.degrees(lon2),
                    back(np.degrees(azi2))), 3))
    return 0


def cmd_gie(args) -> int:
    """Run .gie regression files against the engine (gie analogue).
    Grid-gated blocks (require_grid) whose grid file is absent are
    satisfied by synthesizing an NTv2 grid from the file's own vectors
    (pass --no-synth-grids to skip them like the reference does)."""
    from proj_spark.gie import run_gie, synthesize_require_grids
    synth = "--no-synth-grids" not in args
    args = [a for a in args if a != "--no-synth-grids"]
    if not args:
        print("usage: python -m proj_spark gie [--no-synth-grids] "
              "<file.gie> [...]")
        return 2
    grand_total = grand_failed = 0
    for path in args:
        if synth:
            made = synthesize_require_grids(path)
            for g, n in made.items():
                print(f"{path}: synthesized {g} from {n} vector nodes "
                      f"(self-consistency grid; see gie.py)")
        total, failed, messages = run_gie(path)
        grand_total += total
        grand_failed += failed
        status = "ok" if failed == 0 else "FAILED"
        print(f"{path}: {total - failed}/{total} {status}")
        for m in messages[:20]:
            print(f"  {m}")
        if len(messages) > 20:
            print(f"  ... {len(messages) - 20} more")
    print(f"total: {grand_total - grand_failed}/{grand_total} "
          f"{'ok' if grand_failed == 0 else 'FAILED'}")
    return 0 if grand_failed == 0 else 1


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__)
        return 2
    cmd, rest = argv[0], argv[1:]
    if cmd == "proj":
        return cmd_proj(rest)
    if cmd == "cs2cs":
        return cmd_cs2cs(rest)
    if cmd == "cct":
        return cmd_cct(rest)
    if cmd == "projinfo":
        return cmd_projinfo(rest)
    if cmd == "geod":
        return cmd_geod(rest)
    if cmd == "gie":
        return cmd_gie(rest)
    print(f"unknown command {cmd!r}; expected "
          "proj | cs2cs | cct | projinfo | geod | gie")
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
