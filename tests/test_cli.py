"""The proj/cs2cs/projinfo command-line entry points (python -m proj_spark),
mirroring the reference's CLI apps (src/apps/{proj,cs2cs,projinfo}.cpp)."""

from __future__ import annotations

import subprocess
import sys


def run(args, stdin=""):
    p = subprocess.run([sys.executable, "-m", "proj_spark"] + args,
                       input=stdin, capture_output=True, text=True,
                       cwd="/root/repo")
    assert p.returncode == 0, p.stderr
    return p.stdout.strip()


def test_proj_forward_inverse():
    out = run(["proj", "+proj=utm", "+zone=32", "+ellps=GRS80"], "12 56\n")
    x, y = [float(v) for v in out.split()]
    assert abs(x - 687071.4391) < 1e-3 and abs(y - 6210141.3267) < 1e-3
    back = run(["proj", "-I", "+proj=utm", "+zone=32", "+ellps=GRS80"],
               f"{x} {y}\n")
    lon, lat = [float(v) for v in back.split()]
    assert abs(lon - 12) < 1e-8 and abs(lat - 56) < 1e-8


def test_cs2cs_dhdn():
    # -f forces decimal output; authority-code geographic CRSs are
    # LAT-FIRST on both io sides (cs2cs.cpp isLatFirst) and the
    # reference-faithful default output is the rtodms DMS form
    out = run(["cs2cs", "-f", "%.9f", "EPSG:4314", "EPSG:4258"],
              "53.5 7.483333333333\n")
    lat, lon = [float(v) for v in out.split()[:2]]
    assert abs(lon - 7.482506) < 3e-5 and abs(lat - 53.498461) < 3e-5


def test_cs2cs_dms_default_output():
    out = run(["cs2cs", "+proj=latlong", "+ellps=bessel", "+towgs84=5,0,0",
               "+to", "+proj=latlong", "+ellps=bessel", "+towgs84=1,0,0",
               "-E"], "79d00'00.000\"W 45d00'00.000\"N 0.0\n")
    # tv_out.dist line: 78d59'59.821"W  44d59'59.983"N 0.000
    assert out.endswith("78d59'59.821\"W\t44d59'59.983\"N 0.000"), out


def test_cs2cs_raw_to_raw_is_ballpark_noop():
    out = run(["cs2cs", "+proj=latlong", "+ellps=clrk66",
               "+to", "+proj=latlong", "+ellps=bessel", "-E"],
              "79d58'00.000\"W 37d02'00.000\"N 0.0\n")
    assert out.endswith("79d58'W\t37d2'N 0.000"), out


def test_projinfo_code_and_pair():
    out = run(["projinfo", "EPSG:32632"])
    assert "+proj=utm" in out or "tmerc" in out
    out = run(["projinfo", "EPSG:4230", "EPSG:4258"])
    assert "Candidate operations" in out and "North Sea" in out


def test_cct_pipeline_stack():
    # the gie pipeline-stack case: push/pop restores v_1 exactly
    # (4D-API_cs2cs-style.gie:296-302)
    out = run(["cct", "+proj=pipeline", "+step", "+proj=push", "+v_1",
               "+step", "+proj=utm", "+zone=32",
               "+step", "+proj=utm", "+zone=33", "+inv",
               "+step", "+proj=pop", "+v_1"], "12 56 0 2020\n")
    vals = [float(v) for v in out.split()]
    assert abs(vals[0] - 12) < 1e-9 and abs(vals[1] - 56) < 1e-9
    assert vals[3] == 2020


def test_cct_forward_and_inverse():
    out = run(["cct", "+proj=utm", "+zone=32", "+ellps=GRS80"],
              "12 56 0 2018\n")
    x, y, z, t = [float(v) for v in out.split()]
    assert abs(x - 687071.4391) < 1e-3 and t == 2018
    back = run(["cct", "-I", "+proj=utm", "+zone=32", "+ellps=GRS80"],
               f"{x} {y} 0 2018\n")
    lon, lat = [float(v) for v in back.split()[:2]]
    assert abs(lon - 12) < 1e-8 and abs(lat - 56) < 1e-8


def test_projinfo_trailing_flag_does_not_crash():
    # advisor r4: 'projinfo -s X -t' (missing value) must not traceback;
    # the parser raises NotImplementedError and the fallback/usage
    # path handles it
    p = __import__("subprocess").run(
        [sys.executable, "-m", "proj_spark", "projinfo",
         "-s", "EPSG:4326", "-t"],
        capture_output=True, text=True, cwd="/root/repo")
    assert "IndexError" not in p.stderr and "Traceback" not in p.stderr


def test_projinfo_geoidgrids_canned_pipeline_gated_on_target():
    # advisor r4: the -q -o PROJ geoidgrids shortcut is only correct for
    # a plain EPSG:4326/4979 target; any other target must NOT get the
    # canned 4-step pipeline
    src = ("+proj=longlat +datum=WGS84 +geoidgrids=@foo.gtx "
           "+type=crs")
    ok = run(["projinfo", "-q", "-o", "PROJ", "-s", src,
              "-t", "EPSG:4326"])
    assert "+proj=vgridshift +grids=@foo.gtx" in ok
    p = __import__("subprocess").run(
        [sys.executable, "-m", "proj_spark", "projinfo", "-q", "-o",
         "PROJ", "-s", src, "-t", "EPSG:32632"],
        capture_output=True, text=True, cwd="/root/repo")
    assert "+step +proj=axisswap +order=2,1" not in p.stdout
