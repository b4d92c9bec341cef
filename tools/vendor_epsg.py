"""Vendor the public EPSG registry tables from the reference's SQL
catalog (/root/reference/data/sql/*.sql — the same data the reference
compiles into proj.db, src/iso19111/factory.cpp) into a compact gzip
JSON the engine loads at runtime: proj_spark/data/epsg_catalog.json.gz.

Pure DATA vendoring (EPSG registry content, public under the IOGP
terms); no reference code involved.  Tables kept:

  ellipsoid, prime_meridian, unit_of_measure, geodetic_datum,
  geodetic_crs, conversion (method + parameters), projected_crs,
  helmert_transformation (for the planner's candidate registry),
  extent (area bboxes).

Usage: python tools/vendor_epsg.py
"""

from __future__ import annotations

import gzip
import json
import os
import re

SQL_DIR = "/root/reference/data/sql"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "proj_spark", "data", "epsg_catalog.json.gz")

_INSERT = re.compile(r"INSERT INTO \"(\w+)\" VALUES\((.*)\);\s*$", re.S)


def parse_values(s: str) -> list:
    """Tokenize a SQL VALUES(...) payload: quoted strings ('' escape),
    numbers, NULL."""
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c in ", \n\t":
            i += 1
            continue
        if c == "'":
            j = i + 1
            buf = []
            while j < n:
                if s[j] == "'":
                    if j + 1 < n and s[j + 1] == "'":
                        buf.append("'")
                        j += 2
                        continue
                    break
                buf.append(s[j])
                j += 1
            out.append("".join(buf))
            i = j + 1
        else:
            j = i
            while j < n and s[j] not in ",)":
                j += 1
            tok = s[i:j].strip()
            if tok.upper() == "NULL":
                out.append(None)
            else:
                try:
                    out.append(float(tok) if ("." in tok or "e" in tok.lower())
                               else int(tok))
                except ValueError:
                    out.append(tok)
            i = j + 1
    return out


def rows(fname: str):
    path = os.path.join(SQL_DIR, fname)
    buf = ""
    for line in open(path, encoding="utf-8", errors="replace"):
        if not buf and not line.lstrip().startswith("INSERT"):
            continue   # comments/blank lines must not pollute the buffer
        buf += line
        if line.rstrip().endswith(");"):
            m = _INSERT.match(buf.strip())
            buf = ""
            if m:
                yield parse_values(m.group(2))


_INSERT_ANY = re.compile(r'INSERT INTO "?(\w+)"? VALUES\((.*)\);\s*$', re.S)


def rows_with_table(fname: str, strip_comments: bool = False):
    """Like rows() but yields (table_name, values) — the ESRI/IGNF files
    interleave many tables in one file.  strip_comments removes inline
    `--` SQL comments first (the hand-written custom files annotate
    INSIDE multi-line VALUES lists)."""
    path = os.path.join(SQL_DIR, fname)
    if strip_comments:
        text = re.sub(r"--[^\n]*", "", open(path, encoding="utf-8",
                                            errors="replace").read())
        lines = [ln + "\n" for ln in text.splitlines()]
        return _rows_with_table_lines(lines)
    return _rows_with_table_lines(open(path, encoding="utf-8",
                                       errors="replace"))


def _rows_with_table_lines(lines):
    buf = ""
    for line in lines:
        if not buf and not line.lstrip().startswith("INSERT"):
            continue
        buf += line
        if line.rstrip().endswith(");"):
            m = _INSERT_ANY.match(buf.strip())
            buf = ""
            if m:
                yield m.group(1), parse_values(m.group(2))


def ref(auth, code) -> str:
    """Catalog key for an (authority, code) pair: EPSG keys stay bare
    (backward compatible), other authorities are namespaced AUTH:CODE."""
    if auth is None or str(auth).upper() == "EPSG":
        return str(code)
    return f"{str(auth).upper()}:{code}"


def main() -> None:
    cat: dict = {}

    # unit_of_measure: code -> (name, type, factor)
    units = {}
    for r in rows("unit_of_measure.sql"):
        units[str(r[1])] = [r[2], r[3], r[4]]
    cat["units"] = units

    ell = {}
    for r in rows("ellipsoid.sql"):
        # auth, code, name, _, body_auth, body, a, uom_auth, uom, rf, b, depr
        ell[str(r[1])] = {"name": r[2], "a": r[6], "uom": str(r[8]),
                          "rf": r[9], "b": r[10]}
    cat["ellipsoid"] = ell

    pm = {}
    for r in rows("prime_meridian.sql"):
        # auth, code, name, longitude, uom_auth, uom, depr
        pm[str(r[1])] = {"name": r[2], "lon": r[3], "uom": str(r[5])}
    cat["prime_meridian"] = pm

    datum = {}
    for r in rows("geodetic_datum.sql"):
        # auth, code, name, _, _, ell_auth, ell, pm_auth, pm, area.., depr
        datum[str(r[1])] = {"name": r[2], "ellipsoid": str(r[6]),
                            "pm": str(r[8])}
    cat["geodetic_datum"] = datum

    geod = {}
    for r in rows("geodetic_crs.sql"):
        # auth, code, name, _, _, type, cs_auth, cs, datum_auth, datum,
        # area_auth, area, text_def, depr
        geod[str(r[1])] = {"name": r[2], "type": r[5], "datum": str(r[9]),
                           "cs": str(r[7]), "area": str(r[11]),
                           "deprecated": r[-1]}
    cat["geodetic_crs"] = geod

    conv = {}
    for r in rows("conversion.sql"):
        # auth, code, name, _, _, area_auth, area, method_auth, method,
        # method_name, then 7x (param_auth, code, name, value, uom_auth, uom),
        # depr
        params = []
        base = 10
        for k in range(7):
            off = base + k * 6
            if off + 5 >= len(r) or r[off + 1] is None:
                continue
            params.append([str(r[off + 1]), r[off + 3], str(r[off + 5])])
        conv[str(r[1])] = {"name": r[2], "method": str(r[8]),
                           "method_name": r[9], "params": params,
                           "area": str(r[6])}
    cat["conversion"] = conv

    proj = {}
    for r in rows("projected_crs.sql"):
        # auth, code, name, _, _, cs_auth, cs, geod_auth, geod,
        # conv_auth, conv, area_auth, area, (text_def,) depr
        proj[str(r[1])] = {"name": r[2], "cs": str(r[6]), "base": str(r[8]),
                           "conversion": str(r[10]), "area": str(r[12]),
                           "deprecated": r[-1]}
    cat["projected_crs"] = proj

    # coordinate_system axis orientation matters for e.g. south-oriented
    # TM (axis order/direction); keep the axis table compactly
    axes: dict[str, list] = {}
    for r in rows("axis.sql"):
        # auth, code, name, abbrev, orientation(4), cs_auth, cs(6),
        # order(7), uom_auth, uom(9)
        axes.setdefault(str(r[6]), []).append(
            [r[7], r[4], str(r[9]) if len(r) > 9 and r[9] else None,
             r[2], r[3]])        # + name, abbreviation (projinfo WKT2)
    cat["axis"] = axes

    helm = {}
    custom_helmert = [r for t, r in
                      rows_with_table("customizations.sql", strip_comments=True)
                      if t == "helmert_transformation"]
    for r in list(rows("helmert_transformation.sql")) + custom_helmert:
        # hand-maintained PROJ-authority glue ops (WGS 84 realizations,
        # customizations.sql) key under their authority namespace
        # auth, code(1), name(2), desc, scope, method_auth, method(6),
        # method_name(7), src_auth, src(9), dst_auth, dst(11), area_auth,
        # area(13), accuracy(14), tx(15), ty, tz(17), t_uom_auth,
        # t_uom(19), rx(20), ry, rz(22), r_uom_auth, r_uom(24), s(25),
        # s_uom_auth, s_uom(27), ..., deprecated(last)
        code = str(r[1]) if str(r[0]) == "EPSG" else f"{r[0]}:{r[1]}"
        entry = {
            "name": r[2], "method": str(r[6]), "src": str(r[9]),
            "dst": str(r[11]), "area": str(r[13]), "acc": r[14],
            "tx": r[15], "ty": r[16], "tz": r[17], "t_uom": str(r[19]),
            "rx": r[20], "ry": r[21], "rz": r[22],
            "r_uom": str(r[24]) if r[24] is not None else None,
            "s": r[25], "s_uom": str(r[27]) if r[27] is not None else None,
            "deprecated": r[-1],
        }
        # kinematic (time-dependent) parameter block: rates + epoch
        # (proj_db_table_defs.sql:794-809); present only when non-NULL
        if len(r) > 41 and r[28] is not None:
            entry.update({
                "dtx": r[28], "dty": r[29], "dtz": r[30],
                "dt_uom": str(r[32]) if r[32] is not None else None,
                "drx": r[33], "dry": r[34], "drz": r[35],
                "dr_uom": str(r[37]) if r[37] is not None else None,
                "ds": r[38],
                "ds_uom": str(r[40]) if r[40] is not None else None,
                "epoch": r[41],
            })
        helm[code] = entry
    cat["helmert"] = helm

    grids = {}
    for r in rows("grid_transformation.sql"):
        # auth, code(1), name(2), desc, scope, method_auth, method(6),
        # method_name(7), src_auth, src(9), dst_auth, dst(11), area_auth,
        # area(13), accuracy(14), param_auth, param_code(16), param_name,
        # grid_file(18), ..., deprecated(last)
        grids[str(r[1])] = {
            "name": r[2], "method": str(r[6]), "method_name": r[7],
            "src": str(r[9]), "dst": str(r[11]), "area": str(r[13]),
            "acc": r[14], "grid": r[18], "deprecated": r[-1],
            # projinfo full-listing fields: scope/remark/version and the
            # grid parameter name(s) (second file for NADCON .las/.los)
            "scope": r[4], "remark": r[3], "version": r[-2],
            "p_name": r[17],
            "p2_name": r[21] if len(r) > 22 and r[21] else None,
            "grid2": r[22] if len(r) > 22 and r[22] else None,
        }
    # PROJ's own hand-maintained entries (grid_transformation_custom.sql:
    # BWTA2017/SeTa2016-style grids + their PROJ-authority areas)
    for table, r in rows_with_table("grid_transformation_custom.sql", strip_comments=True):
        if table == "grid_transformation":
            key = str(r[1]) if str(r[0]) == "EPSG" else f"{r[0]}:{r[1]}"
            grids[key] = {
                "name": r[2], "method": str(r[6]), "method_name": r[7],
                "src": str(r[9]), "dst": str(r[11]),
                "area": (str(r[13]) if str(r[12]) == "EPSG"
                         else f"{r[12]}:{r[13]}"),
                "acc": r[14], "grid": r[18], "deprecated": r[-1],
                "scope": r[4], "remark": r[3], "version": r[-2],
                "p_name": r[17],
                "p2_name": r[21] if len(r) > 22 and r[21] else None,
                "grid2": r[22] if len(r) > 22 and r[22] else None,
            }
    cat["grid_transformation"] = grids

    area = {}
    area_name = {}
    for r in rows("area.sql"):
        # auth, code, name, description, south, north, west, east, depr
        area[str(r[1])] = [r[6], r[4], r[7], r[5]]   # (w, s, e, n)
        area_name[str(r[1])] = r[2]                  # projinfo AREA[...]
    for table, r in rows_with_table("grid_transformation_custom.sql", strip_comments=True):
        if table == "area":
            key = str(r[1]) if str(r[0]) == "EPSG" else f"{r[0]}:{r[1]}"
            area[key] = [r[6], r[4], r[7], r[5]]
            area_name[key] = r[2]
    cat["area"] = area
    cat["area_name"] = area_name

    # deprecation replacements (projinfo "Alternative non-deprecated
    # CRS" display; reference data/sql/deprecation.sql)
    depr = {}
    for r in rows("deprecation.sql"):
        # table, auth, old_code, auth, new_code, source_auth
        depr[str(r[2])] = str(r[4])
    cat["deprecation"] = depr

    # operation supersession (discardSuperseded in createOperations;
    # reference data/sql/supersession.sql)
    sup = {}
    for r in rows("supersession.sql"):
        # table, auth, superseded, table, auth, replacement, source
        sup[str(r[2])] = str(r[5])
    cat["supersession"] = sup

    # hand-maintained accuracy overrides (data/sql/customizations.sql:
    # NTv1-class grids downgraded below their NTv2 replacements)
    for code in ("1312", "1462"):
        if code in grids:
            grids[code]["acc"] = 2.0

    # EPSG grid name -> PROJ grid name (grid_alternatives[-generated]
    # .sql; drives projinfo's DERIVED_FROM(EPSG) markers and the
    # engine's grid-file name resolution)
    alt = {}
    alt_fmt = {}
    alt_inv = {}
    for fname in ("grid_alternatives.sql", "grid_alternatives_generated.sql"):
        text = open(os.path.join(SQL_DIR, fname)).read()
        # strip line comments so VALUES args tokenize cleanly
        text = re.sub(r"--[^\n]*", "", text)
        for stmt in text.split("INSERT INTO"):
            if not stmt.lstrip().startswith("grid_alternatives"):
                continue
            m = re.search(r"VALUES\s*\((.*?)\);", stmt, re.S)
            if not m:
                continue
            toks = re.findall(r"'([^']*)'|(\b\d+\b)", m.group(1))
            vals = [a if a else b for a, b in toks]
            if len(vals) >= 5:
                alt[vals[0]] = vals[1]
                alt_fmt[vals[0]] = vals[2]
                alt_inv[vals[0]] = int(vals[4])
    cat["grid_alternatives"] = alt
    cat["grid_alternatives_format"] = alt_fmt
    cat["grid_alternatives_inverse"] = alt_inv

    # vertical + compound CRS (reference data/sql/vertical_crs.sql,
    # compound_crs.sql; modelled as CompoundCRS/VerticalCRS in
    # src/iso19111/crs.cpp)
    vert = {}
    for r in rows("vertical_crs.sql"):
        # auth, code, name, _, _, cs_auth, cs, datum_auth, datum,
        # area_auth, area, depr
        vert[str(r[1])] = {"name": r[2], "datum": str(r[8]),
                           "cs": str(r[6]), "area": str(r[10]),
                           "deprecated": r[-1]}
    cat["vertical_crs"] = vert

    vdatum = {}
    for r in rows("vertical_datum.sql"):
        # auth, code, name, _, _, area_auth, area, publication, depr
        vdatum[str(r[1])] = {"name": r[2]}
    cat["vertical_datum"] = vdatum

    comp = {}
    for r in rows("compound_crs.sql"):
        # auth, code, name, _, _, horiz_auth, horiz, vert_auth, vert,
        # area_auth, area, depr
        comp[str(r[1])] = {"name": r[2], "horiz": str(r[6]),
                           "vert": str(r[8]), "deprecated": r[-1]}
    cat["compound_crs"] = comp

    # -----------------------------------------------------------------
    # non-EPSG authorities: ESRI + IGNF registries (the reference ships
    # them in data/sql/esri.sql and ignf.sql and enforces their presence
    # at data/sql/commit.sql:96-111).  Same table shapes; keys become
    # AUTH:CODE via ref() and cross-authority references are resolved
    # with the same helper, so EPSG-referenced objects stay bare keys.
    # -----------------------------------------------------------------
    aliases: dict[str, str] = {}
    for fname in ("esri.sql", "ignf.sql", "alias_name.sql"):
        for table, r in rows_with_table(fname):
            if table == "alias_name":
                # table_name, auth, code, alt_name, source
                aliases.setdefault(f"{r[0]}|{str(r[3]).lower()}",
                                   ref(r[1], r[2]))
            elif table == "ellipsoid":
                ell[ref(r[0], r[1])] = {
                    "name": r[2], "a": r[6], "uom": str(r[8]),
                    "rf": r[9] if r[9] not in (0, 0.0) else None,
                    "b": r[10]}
            elif table == "prime_meridian":
                pm[ref(r[0], r[1])] = {"name": r[2], "lon": r[3],
                                       "uom": str(r[5])}
            elif table == "geodetic_datum":
                datum[ref(r[0], r[1])] = {"name": r[2],
                                          "ellipsoid": ref(r[5], r[6]),
                                          "pm": ref(r[7], r[8])}
            elif table == "geodetic_crs":
                geod[ref(r[0], r[1])] = {
                    "name": r[2], "type": r[5], "datum": ref(r[8], r[9]),
                    "deprecated": r[-1]}
            elif table == "conversion":
                params = []
                for k in range(7):
                    off = 10 + k * 6
                    if off + 5 >= len(r) or r[off + 1] is None:
                        continue
                    params.append([str(r[off + 1]), r[off + 3],
                                   str(r[off + 5])])
                conv[ref(r[0], r[1])] = {
                    "name": r[2], "method": str(r[8]),
                    "method_name": r[9], "params": params}
            elif table == "projected_crs":
                entry = {"name": r[2], "deprecated": r[-1]}
                if r[6] is None and isinstance(r[13], str):
                    # ESRI text-definition form: lower the vendored
                    # WKT1 at resolve time (proj_spark.wkt)
                    entry["wkt"] = r[13]
                else:
                    entry.update({"cs": ref(r[5], r[6]),
                                  "base": ref(r[7], r[8]),
                                  "conversion": ref(r[9], r[10])})
                proj[ref(r[0], r[1])] = entry
            elif table == "helmert_transformation":
                helm[ref(r[0], r[1])] = {
                    "name": r[2], "method": str(r[6]),
                    "src": ref(r[8], r[9]), "dst": ref(r[10], r[11]),
                    "area": ref(r[12], r[13]), "acc": r[14],
                    "tx": r[15], "ty": r[16], "tz": r[17],
                    "t_uom": str(r[19]),
                    "rx": r[20], "ry": r[21], "rz": r[22],
                    "r_uom": str(r[24]) if r[24] is not None else None,
                    "s": r[25],
                    "s_uom": str(r[27]) if r[27] is not None else None,
                    "deprecated": r[-1]}
            elif table == "area":
                area[ref(r[0], r[1])] = [r[6], r[4], r[7], r[5]]
            elif table == "vertical_crs":
                vert[ref(r[0], r[1])] = {"name": r[2],
                                         "datum": ref(r[7], r[8]),
                                         "deprecated": r[-1]}
            elif table == "compound_crs":
                comp[ref(r[0], r[1])] = {"name": r[2],
                                         "horiz": ref(r[5], r[6]),
                                         "vert": ref(r[7], r[8]),
                                         "deprecated": r[-1]}
    cat["alias"] = aliases

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    blob = json.dumps(cat, separators=(",", ":")).encode()
    with gzip.open(OUT, "wb", compresslevel=9) as f:
        f.write(blob)
    print(f"wrote {OUT}: {len(blob)/1e6:.1f} MB raw, "
          f"{os.path.getsize(OUT)/1e6:.1f} MB gz; "
          f"{len(proj)} projected, {len(geod)} geodetic, "
          f"{len(conv)} conversions, {len(helm)} helmert ops")


if __name__ == "__main__":
    main()
