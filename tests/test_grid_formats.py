"""Round-trip tests for the NTv1 / CTABLE2 grid file formats added in
round 4 (readers/writers in proj_spark.grids; format layouts from the
reference's gridinfo.cpp:654-738 and nad_init.cpp:149-240)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from proj_spark.grids import (load_ctable2, load_ntv1, null_grid,
                              write_ctable2, write_ntv1)

D2R = math.pi / 180.0
SEC2RAD = D2R / 3600.0


def test_ntv1_roundtrip(tmp_path):
    nphi, nlam = 4, 5
    rng = np.random.RandomState(7)
    shifts = rng.uniform(-3.0, 3.0, size=(nphi, nlam, 2))
    p = str(tmp_path / "grid.dat")
    write_ntv1(p, s_lat=44.0, n_lat=47.0, w_long=120.0, e_long=116.0,
               lat_inc=1.0, long_inc=1.0, shifts=shifts)
    g = load_ntv1(p)
    assert g.cvs.shape == (nphi, nlam, 2)
    assert g.ll == pytest.approx((-120.0 * D2R, 44.0 * D2R))
    assert g.del_ == pytest.approx((1.0 * D2R, 1.0 * D2R))
    # channel mapping: file (dphi_sec, dlam_sec) W->E columns ->
    # cvs[...,0]=dlam_rad float32, cvs[...,1]=dphi_rad float32
    want_lam = (shifts[:, :, 1] * SEC2RAD).astype(np.float32)
    want_phi = (shifts[:, :, 0] * SEC2RAD).astype(np.float32)
    np.testing.assert_array_equal(g.cvs[:, :, 0], want_lam)
    np.testing.assert_array_equal(g.cvs[:, :, 1], want_phi)


def test_ctable2_roundtrip(tmp_path):
    nphi, nlam = 3, 6
    rng = np.random.RandomState(11)
    cvs = (rng.uniform(-2e-5, 2e-5, size=(nphi, nlam, 2))
           .astype(np.float32).astype(np.float64))
    p = str(tmp_path / "grid.ct2")
    write_ctable2(p, "roundtrip test", (-0.1, 0.7), (0.01, 0.02), cvs)
    g = load_ctable2(p)
    assert g.ll == pytest.approx((-0.1, 0.7))
    assert g.del_ == pytest.approx((0.01, 0.02))
    np.testing.assert_array_equal(g.cvs, cvs)


def test_register_grid_file_sniffs_format(tmp_path):
    from proj_spark.operations.datum import GRID_REGISTRY
    p1 = str(tmp_path / "noext_ctable2")    # 'conus' has no extension
    write_ctable2(p1, "sniff", (0.0, 0.0), (0.01, 0.01),
                  np.zeros((3, 3, 2)))
    p2 = str(tmp_path / "grid.dat")
    write_ntv1(p2, s_lat=0.0, n_lat=2.0, w_long=2.0, e_long=0.0,
               lat_inc=1.0, long_inc=1.0, shifts=np.zeros((3, 3, 2)))
    from proj_spark.grids import register_grid_file
    saved = dict(GRID_REGISTRY)
    try:
        register_grid_file("_sniff_ct2", p1)
        register_grid_file("_sniff_ntv1", p2)
        assert GRID_REGISTRY["_sniff_ct2"].cvs.shape == (3, 3, 2)
        assert GRID_REGISTRY["_sniff_ntv1"].cvs.shape == (3, 3, 2)
    finally:
        GRID_REGISTRY.clear()
        GRID_REGISTRY.update(saved)


def test_null_grid_is_world_zero():
    g = null_grid()
    assert g.ll == (-math.pi, -math.pi / 2.0)
    assert not g.cvs.any()


def test_register_grid_file_gtx_not_missniffed(tmp_path):
    # advisor r4: an extensionless-magic match must use the reference's
    # magic strings (gridinfo.cpp:917-927), not just the int at bytes
    # 8:12 — this GTX's xorigin starts with BE int 11 (the old NTv2
    # trigger) and must still load as GTX
    import struct
    from proj_spark.operations.datum import GRID_REGISTRY
    from proj_spark.grids import register_grid_file
    x = struct.unpack(">d", b"\x00\x00\x00\x0b\x00\x00\x00\x00")[0]
    p = str(tmp_path / "adversarial.gtx")
    vals = np.arange(6, dtype=np.float64).reshape(2, 3)
    with open(p, "wb") as f:
        f.write(struct.pack(">4d", 10.0, x, 1.0, 1.0))
        f.write(struct.pack(">2i", 2, 3))
        f.write(vals.astype(">f4").tobytes())
    saved = dict(GRID_REGISTRY)
    try:
        register_grid_file("_sniff_gtx", p)
        g = GRID_REGISTRY["_sniff_gtx"]
        assert g.cvs.shape == (2, 3)
        np.testing.assert_array_equal(g.cvs, vals)
    finally:
        GRID_REGISTRY.clear()
        GRID_REGISTRY.update(saved)
