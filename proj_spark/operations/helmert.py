"""Helmert similarity transforms: 3/4/7-parameter and 14-parameter
kinematic, both rotation conventions, small-angle or exact matrices.

Semantics per the reference (src/transformations/helmert.cpp:58-753):
  - translations in meters, rotations in arc-seconds, scale in ppm
  - coordinate_frame convention builds R directly; position_vector is
    its transpose
  - kinematic (14-param): every parameter is propagated linearly to the
    observation epoch t before the matrix is built
  - 4-param (+theta): 2-D rotation/scale where scale is a direct factor

Vectorization strategy: the rotation matrix depends only on t, so a batch
is processed per *distinct epoch* (np.unique over t), each group as one
3x3 matmul over the stacked coordinate arrays.
"""

from __future__ import annotations

import math

import numpy as np

ARCSEC_TO_RAD = math.pi / 180.0 / 3600.0


def _rot_matrix(rx: float, ry: float, rz: float, exact: bool, position_vector: bool) -> np.ndarray:
    """3x3 rotation matrix (coordinate-frame convention; transpose for PV)."""
    if exact:
        cf, sf = math.cos(rx), math.sin(rx)
        ct, st = math.cos(ry), math.sin(ry)
        cp, sp = math.cos(rz), math.sin(rz)
        r = np.array([
            [ct * cp, cf * sp + sf * st * cp, sf * sp - cf * st * cp],
            [-ct * sp, cf * cp - sf * st * sp, sf * cp + cf * st * sp],
            [st, -sf * ct, cf * ct],
        ])
    else:
        r = np.array([
            [1.0, rz, -ry],
            [-rz, 1.0, rx],
            [ry, -rx, 1.0],
        ])
    if position_vector:
        r = r.T
    return r


class Helmert:
    """Batch Helmert transform over xyz(t) arrays (meters / decimal years)."""

    proj_name = "helmert"
    left = right = "cartesian"

    def __init__(self, params: dict):
        self.params = params
        p = params
        self.x = float(p.get("x", 0.0))
        self.y = float(p.get("y", 0.0))
        self.z = float(p.get("z", 0.0))
        self.rx = float(p.get("rx", 0.0)) * ARCSEC_TO_RAD
        self.ry = float(p.get("ry", 0.0)) * ARCSEC_TO_RAD
        self.rz = float(p.get("rz", 0.0)) * ARCSEC_TO_RAD
        self.s = float(p.get("s", 0.0))          # ppm (3-D) or factor (4-param)
        self.dx = float(p.get("dx", 0.0))
        self.dy = float(p.get("dy", 0.0))
        self.dz = float(p.get("dz", 0.0))
        self.drx = float(p.get("drx", 0.0)) * ARCSEC_TO_RAD
        self.dry = float(p.get("dry", 0.0)) * ARCSEC_TO_RAD
        self.drz = float(p.get("drz", 0.0)) * ARCSEC_TO_RAD
        self.ds = float(p.get("ds", 0.0))
        self.t_epoch = float(p.get("t_epoch", 0.0))
        self.theta = float(p.get("theta", 0.0)) * ARCSEC_TO_RAD
        self.dtheta = float(p.get("dtheta", 0.0)) * ARCSEC_TO_RAD
        self.fourparam = "theta" in p
        if self.fourparam and "s" not in p:
            self.s = 1.0
        self.exact = "exact" in p
        conv = p.get("convention")
        if self.fourparam:
            self.position_vector = True  # irrelevant for 2-D form
        else:
            self.no_rotation = (
                self.rx == 0 and self.ry == 0 and self.rz == 0 and self.s == 0
                and self.drx == 0 and self.dry == 0 and self.drz == 0)
            if not self.no_rotation:
                if conv not in ("position_vector", "coordinate_frame"):
                    raise ValueError("helmert: missing/invalid 'convention'")
            self.position_vector = conv == "position_vector"
        self.kinematic = any(v != 0.0 for v in (
            self.dx, self.dy, self.dz, self.drx, self.dry, self.drz, self.ds, self.dtheta))

    def _params_at(self, t: float) -> tuple[np.ndarray, np.ndarray, float]:
        dt = t - self.t_epoch
        trans = np.array([self.x + self.dx * dt, self.y + self.dy * dt, self.z + self.dz * dt])
        r = _rot_matrix(self.rx + self.drx * dt, self.ry + self.dry * dt,
                        self.rz + self.drz * dt, self.exact, self.position_vector)
        scale = 1.0 + (self.s + self.ds * dt) * 1e-6
        return trans, r, scale

    def fwd(self, x, y, z, t=None):
        return self._apply(x, y, z, t, inverse=False)

    def inv(self, x, y, z, t=None):
        return self._apply(x, y, z, t, inverse=True)

    def _apply(self, x, y, z, t, inverse: bool):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        z = np.asarray(z, dtype=np.float64)
        if self.fourparam:
            return self._apply_4param(x, y, z, t, inverse)
        if not self.kinematic or t is None:
            epochs = np.array([self.t_epoch])
            groups = [np.arange(x.shape[0] if x.ndim else 1)]
        else:
            t = np.asarray(t, dtype=np.float64)
            epochs, idx = np.unique(t, return_inverse=True)
            groups = [np.nonzero(idx == i)[0] for i in range(len(epochs))]
        ox = np.empty_like(x)
        oy = np.empty_like(y)
        oz = np.empty_like(z)
        for epoch, g in zip(epochs, groups):
            trans, r, scale = self._params_at(float(epoch))
            v = np.stack([x[g], y[g], z[g]])
            if getattr(self, "no_rotation", False):
                out = v - trans[:, None] if inverse else v + trans[:, None]
            elif inverse:
                out = r.T @ ((v - trans[:, None]) / scale)
            else:
                out = scale * (r @ v) + trans[:, None]
            ox[g], oy[g], oz[g] = out[0], out[1], out[2]
        return ox, oy, oz

    def _apply_4param(self, x, y, z, t, inverse: bool):
        """2-D rotation/scale shift.  Kinematic semantics per the
        reference (src/transformations/helmert.cpp:107-161 propagates
        theta and scale to the observation epoch; the 2-D kernel at
        :323-360 then uses the PROPAGATED theta/scale but the BASE
        translation xyz_0 — translation rates never enter the 4-param
        path).  theta/scale are elementwise in t, so the whole batch is
        one vectorized pass — no per-epoch grouping needed."""
        theta, scale = self.theta, self.s
        if t is not None and self.kinematic:
            dt = np.asarray(t, dtype=np.float64) - self.t_epoch
            theta = self.theta + self.dtheta * dt
            scale = self.s + self.ds * dt
        if inverse:
            cr = np.cos(theta) / scale
            sr = np.sin(theta) / scale
            xx = x - self.x
            yy = y - self.y
            return xx * cr - yy * sr, xx * sr + yy * cr, z
        cr = np.cos(theta) * scale
        sr = np.sin(theta) * scale
        return cr * x + sr * y + self.x, -sr * x + cr * y + self.y, z
