"""Operation base class: prepare/kernel/finalize batch execution.

Re-expresses the reference's fwd/inv driver loops (src/fwd.cpp:41-154,
src/inv.cpp:39-143) for whole NumPy arrays:

  forward:  lat range-check + clamp, lon wrap, lam -= lam0, wrap
            -> kernel (returns x,y in semimajor-axis units for CLASSIC ops)
            -> x = a*x + x0 ; y = a*y + y0
  inverse:  x = x - x0 ; scale by 1/a -> kernel -> lam += lam0, wrap

Invalid inputs/outputs propagate as NaN (the reference uses HUGE_VAL).
All angles radians, all lengths meters unless noted.
"""

from __future__ import annotations

import numpy as np

from proj_spark.ellipsoids import Ellipsoid, ellipsoid_from_params
from proj_spark import mathutils as mu


def _angle(params: dict, key: str, default: float = 0.0) -> float:
    """Parse an angular parameter -> radians: plain degrees or the
    reference's DMS notation (44d11'N etc., src/dmstor.cpp)."""
    if key not in params:
        return default
    try:
        return math_radians(float(params[key]))
    except (TypeError, ValueError):
        from proj_spark.operations.cs2cs import dms_to_deg
        return math_radians(dms_to_deg(str(params[key])))


def math_radians(deg: float) -> float:
    return deg * np.pi / 180.0


class Operation:
    """A compiled coordinate operation (plan-time constants + batch kernels).

    Subclasses implement ``_fwd(lam, phi)`` / ``_inv(x, y)`` (2-D, a-units)
    or ``_fwd3d`` / ``_inv3d`` (cartesian meters), mirroring the reference's
    PJ fwd/inv function pointers (src/proj_internal.h:349-356).
    """

    #: io unit tags, mirroring enum pj_io_units (src/proj_internal.h:172)
    left = "radians"
    right = "classic"   # classic: kernel emits a-units; projected: meters
    proj_name = "?"

    #: params whose values the reference reads with pj_param 'r'/'d'
    #: (dmstor-parsed) — DMS strings like '20n'/'60W'/"53d18'56.9537"
    #: normalize to decimal degrees ONCE here so every kernel's plain
    #: float() sees a number (src/pj_param.cpp 'r' case -> dmstor)
    _DMS_PARAM_KEYS = frozenset((
        "lat_0", "lon_0", "lat_1", "lat_2", "lat_3", "lat_ts", "lat_b",
        "lonc", "alpha", "gamma", "azi", "theta", "lon_1", "lon_2",
        "o_lat_p", "o_lon_p", "o_lat_c", "o_lon_c", "o_alpha",
        "o_lat_1", "o_lon_1", "o_lat_2", "o_lon_2", "tilt", "plat_0",
        "plon_0", "lat_4", "lsat_lat", "lon_wrap"))

    def __init__(self, params: dict):
        from proj_spark.operations import cs2cs
        params = self._expand_datum(dict(params))
        for _k in (self._DMS_PARAM_KEYS & params.keys()):
            _v = params[_k]
            if isinstance(_v, str):
                try:
                    float(_v)
                except ValueError:
                    params[_k] = repr(cs2cs.dms_to_deg(_v))
        self.params = params
        self.ell: Ellipsoid = ellipsoid_from_params(params)
        self.a = self.ell.a
        #: 1/a for the inverse prepare step.  Kept SEPARATE from self.a to
        #: mirror the reference exactly: operators overriding P->a in their
        #: constructor (krovak) do not refresh P->ra, which pj_init derived
        #: earlier — the published krovak test vectors depend on that quirk.
        self.ra = 1.0 / self.ell.a
        self.es = self.ell.es
        self.e = self.ell.e
        self.one_es = self.ell.one_es
        self.lam0 = _angle(params, "lon_0")
        self.phi0 = _angle(params, "lat_0")
        self.x0 = float(params.get("x_0", 0.0))
        self.y0 = float(params.get("y_0", 0.0))
        self.z0 = float(params.get("z_0", 0.0))
        self.k0 = float(params.get("k_0", params.get("k", 1.0)))
        self.over = "over" in params
        # -- cs2cs-emulation modifiers (src/fwd.cpp:74-151, 4D_api.cpp:560) --
        self.from_greenwich = (cs2cs.parse_pm(params["pm"])
                               if "pm" in params else 0.0)
        self.to_meter = (cs2cs.parse_to_meter(params["to_meter"])
                         if "to_meter" in params
                         else self._unit_factor(params.get("units")))
        self.fr_meter = 1.0 / self.to_meter
        self.vto_meter = (cs2cs.parse_to_meter(params["vto_meter"])
                          if "vto_meter" in params
                          else self._unit_factor(params.get("vunits"))
                          if "vunits" in params else self.to_meter)
        self.vfr_meter = 1.0 / self.vto_meter
        self.geoc = "geoc" in params and self.proj_name != "geoc"
        self.axes = cs2cs.parse_axis(str(params["axis"])) \
            if params.get("axis") not in (None, "enu") else None
        if "lon_wrap" in params:
            self.is_long_wrap_set = True
            self.long_wrap_center = np.radians(
                cs2cs.dms_to_deg(str(params["lon_wrap"])))
        else:
            self.is_long_wrap_set = False
            self.long_wrap_center = 0.0
        self.hgridshifts: list = []
        self.vgridshifts: list = []
        for grid_kind in ("nadgrids", "geoidgrids"):
            if grid_kind in params:
                self._require_grids(grid_kind, params[grid_kind])
        self.datum_chain = None
        if "towgs84" in params and self.proj_name not in ("helmert",):
            tw = cs2cs.parse_towgs84(params["towgs84"])
            chain = cs2cs.DatumChain(self.ell.a, self.ell.es, tw)
            self.datum_chain = chain if chain.active else None
        self.setup()

    # datum-id expansion (src/datum_set.cpp, table src/datums.cpp:41)
    @staticmethod
    def _expand_datum(params: dict) -> dict:
        from proj_spark.operations import cs2cs
        name = params.get("datum")
        if not name or not isinstance(name, str):
            return params
        if name not in cs2cs.PJ_DATUMS:
            raise NotImplementedError(f"+datum={name!r} not in the datum table")
        definition, ellps = cs2cs.PJ_DATUMS[name]
        params.setdefault("ellps", ellps)
        k, v = definition.split("=", 1)
        params.setdefault(k, v)
        return params

    @staticmethod
    def _unit_factor(units) -> float:
        if units is None:
            return 1.0
        from proj_spark.operations.simple import UNITS_TO_METER
        if str(units) not in UNITS_TO_METER:
            raise NotImplementedError(f"unknown unit {units!r}")
        return UNITS_TO_METER[str(units)]

    def _require_grids(self, kind: str, names) -> None:
        """+nadgrids/+geoidgrids: attach grid sub-operations when every
        named grid is registered; raise (never silently ignore) otherwise —
        the reference's gie runs likewise skip these blocks when the grid
        file cannot be loaded (ignore pjd_err_failed_to_load_grid)."""
        from proj_spark.operations import datum as datum_mod
        if kind == "nadgrids":
            # ONE list-aware hgridshift over the whole comma chain:
            # per-point dispatch follows find_ctable over the ordered
            # table sequence (apply_gridshift.cpp), so later grids
            # catch points the earlier ones miss ('ntv2_0.gsb,
            # ntv1_can.dat,conus' in test/cli/testntv2)
            op = datum_mod.build_nadgrids_op(
                str(names), self.params.get("ellps", "GRS80"))
            self.hgridshifts = [op] if op is not None else []
            return
        shifts = []
        for nm in str(names).split(","):
            optional = nm.startswith("@")
            nm = nm.lstrip("@")
            try:
                shifts.append(datum_mod.REGISTRY["vgridshift"](
                    {"grids": nm,
                     "ellps": self.params.get("ellps", "GRS80")}))
            except (KeyError, ValueError, NotImplementedError) as exc:
                if optional:
                    continue
                raise NotImplementedError(
                    f"+{kind}={names}: grid {nm!r} not registered "
                    f"(pjd_err_failed_to_load_grid)") from exc
        self.vgridshifts = shifts

    def setup(self) -> None:  # pragma: no cover - trivial default
        """Precompute plan-time constants (the PROJECTION(xxx) body)."""

    # -- kernels (override) ------------------------------------------------
    def _fwd(self, lam: np.ndarray, phi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        raise NotImplementedError

    def _inv(self, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        raise NotImplementedError

    # -- public batch API ----------------------------------------------------
    def fwd(self, lam: np.ndarray, phi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """lon/lat radians -> projected meters (NaN on invalid input)."""
        x, y, _ = self._run_fwd(lam, phi, None)
        return x, y

    def fwd3d(self, lam, phi, z):
        """3-D forward: the 2-D kernel with z carried through the
        prepare/finalize semantics (vto_meter/z_0 scaling, datum chain,
        axis swap) — the default pj_fwd3d dispatch (src/fwd.cpp:179-188)."""
        return self._run_fwd(lam, phi,
                             np.zeros_like(np.asarray(lam, dtype=np.float64))
                             if z is None else np.asarray(z, dtype=np.float64))

    def _run_fwd(self, lam, phi, z):
        lam = np.asarray(lam, dtype=np.float64)
        phi = np.asarray(phi, dtype=np.float64)
        bad = (np.abs(phi) - mu.HALFPI > mu.EPS_LAT) | (lam > 10.0) | (lam < -10.0)
        bad |= ~np.isfinite(lam) | ~np.isfinite(phi)
        phi = np.clip(phi, -mu.HALFPI, mu.HALFPI)
        # fwd_prepare (src/fwd.cpp:41-102)
        if self.geoc:
            phi = np.arctan(np.tan(phi) / self.one_es)
        if not self.over:
            lam = mu.adjlon(lam)
        if self.hgridshifts:
            lam, phi, z2 = self.hgridshifts[0].inv3d(
                lam, phi, np.zeros_like(lam) if z is None else z)
            z = None if z is None else z2
        elif self.datum_chain is not None:
            lam, phi, z2 = self.datum_chain.wgs84_to_local(
                lam, phi, np.zeros_like(lam) if z is None else z)
            z = None if z is None else z2
        if self.vgridshifts and z is not None:
            lam, phi, z = self.vgridshifts[0].fwd3d(lam, phi, z)
        lam = (lam - self.from_greenwich) - self.lam0
        if not self.over:
            lam = mu.adjlon(lam)
        x, y = self._fwd(np.where(bad, 0.0, lam), np.where(bad, 0.0, phi))
        # fwd_finalize (src/fwd.cpp:105-154)
        if self.right == "radians":
            if z is not None:
                z = self.vfr_meter * (z + self.z0)
            if self.is_long_wrap_set:
                x = self.long_wrap_center + mu.adjlon(x - self.long_wrap_center)
        else:
            if self.right == "classic":
                x = self.a * x
                y = self.a * y
            x = self.fr_meter * (x + self.x0)
            y = self.fr_meter * (y + self.y0)
            if z is not None:
                z = self.vfr_meter * (z + self.z0)
        nan = np.float64(np.nan)
        x = np.where(bad, nan, x)
        y = np.where(bad, nan, y)
        if z is None:
            z = np.zeros_like(x)
        else:
            z = np.where(bad, nan, z)
        if self.axes is not None:
            from proj_spark.operations import cs2cs
            x, y, z = cs2cs.axis_fwd(self.axes, x, y, z)
        return x, y, z

    #: plausibility bound for projected-plane inputs to inv (meters);
    #: mirrors the reference erroring on absurd coordinates rather than
    #: returning garbage (src/inv.cpp:39-60 input checks)
    INV_RANGE_M = 1e10

    def inv(self, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """projected meters -> lon/lat radians (NaN on invalid input)."""
        lam, phi, _ = self._run_inv(x, y, None)
        return lam, phi

    def inv3d(self, x, y, z):
        """3-D inverse (mirror of fwd3d; src/inv.cpp:39-143)."""
        return self._run_inv(x, y,
                             np.zeros_like(np.asarray(x, dtype=np.float64))
                             if z is None else np.asarray(z, dtype=np.float64))

    def _run_inv(self, x, y, z):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        if self.axes is not None:
            from proj_spark.operations import cs2cs
            x, y, z_in = cs2cs.axis_inv(
                self.axes, x, y, np.zeros_like(x) if z is None else z)
            z = None if z is None else z_in
        # inv_prepare (src/inv.cpp:39-91)
        if self.right == "radians":
            bad = ~np.isfinite(x) | ~np.isfinite(y)
            if z is not None:
                z = self.vto_meter * z - self.z0
        else:
            x = self.to_meter * x - self.x0
            y = self.to_meter * y - self.y0
            if z is not None:
                z = self.vto_meter * z - self.z0
            bad = (~np.isfinite(x) | ~np.isfinite(y)
                   | (np.abs(x) > self.INV_RANGE_M)
                   | (np.abs(y) > self.INV_RANGE_M))
            if self.right == "classic":
                x = x * self.ra
                y = y * self.ra
        lam, phi = self._inv(np.where(bad, 0.0, x), np.where(bad, 0.0, y))
        # inv_finalize (src/inv.cpp:95-143)
        lam = lam + self.from_greenwich + self.lam0
        if not self.over:
            lam = mu.adjlon(lam)
        if self.vgridshifts and z is not None:
            lam, phi, z = self.vgridshifts[0].inv3d(lam, phi, z)
        if self.hgridshifts:
            lam, phi, z2 = self.hgridshifts[0].fwd3d(
                lam, phi, np.zeros_like(lam) if z is None else z)
            z = None if z is None else z2
        elif self.datum_chain is not None:
            lam, phi, z2 = self.datum_chain.local_to_wgs84(
                lam, phi, np.zeros_like(lam) if z is None else z)
            z = None if z is None else z2
        if self.geoc:
            phi = np.arctan(self.one_es * np.tan(phi))
        nan = np.float64(np.nan)
        lam = np.where(bad, nan, lam)
        phi = np.where(bad, nan, phi)
        z = np.zeros_like(lam) if z is None else np.where(bad, nan, z)
        return lam, phi, z

    # degree convenience wrappers (what the gie-derived tests feed/expect)
    def fwd_deg(self, lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return self.fwd(np.radians(np.asarray(lon, dtype=np.float64)),
                        np.radians(np.asarray(lat, dtype=np.float64)))

    def inv_deg(self, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        lam, phi = self.inv(x, y)
        return np.degrees(lam), np.degrees(phi)
