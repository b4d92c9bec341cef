"""CRS->CRS planner: ranking (SortFunction port), AoI filtering
(FilterResults port), per-point bbox dispatch with retry, and the
vendored DHDN->ETRS89 multi-candidate vectors.

Vectors: test/gie/DHDN_ETRS89.gie — the 7-parameter Helmert block
(towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7) agrees with the
grid-derived golden coordinates at the 3 m level (the gie file's own
tolerance); the grid block requires BETA2007.gsb and is skipped, exactly
as the reference's gie run skips it when the grid is absent.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from proj_spark.planner import (Candidate, CRSTransform, crs_to_crs,
                                filter_results, sort_key)

M_PER_DEG = 111319.49

# (dhdn_lon, dhdn_lat, etrs89_lon, etrs89_lat) — DHDN_ETRS89.gie:14-76
DHDN_VECTORS = [
    (7.483333333333, 53.500000000000, 7.482506019176, 53.498461143331),
    (10.333333333333, 48.833333333333, 10.332117283303, 48.832327188640),
    (8.000000000000, 50.083333333333, 7.999097344043, 50.082172046476),
    (10.016666666667, 51.033333333333, 10.015460839103, 51.032075951188),
    (10.466666666667, 54.333333333333, 10.465373788153, 54.331696254077),
    (10.750000000000, 53.583333333333, 10.748659705929, 53.581781243436),
    (10.016666666667, 53.500000000000, 10.015444367463, 53.498457503620),
    (11.000000000000, 53.466666666667, 10.998619309575, 53.465127257963),
    (13.466666666667, 53.766666666667, 13.464877774631, 53.765109112396),
    (10.983333333333, 52.766666666667, 10.981965431979, 52.765211787713),
    (13.000000000000, 51.783333333333, 12.998336654827, 51.782006921265),
    (10.466666666667, 52.500000000000, 10.465380298337, 52.498573633365),
    (10.550000000000, 51.466666666667, 10.548711467380, 51.465361979987),
    (10.450000000000, 50.583333333333, 10.448735275612, 50.582129474187),
    (10.416666666667, 49.666666666667, 10.415423634267, 49.665566047661),
    (10.550000000000, 47.750000000000, 10.548775945187, 47.749120260296),
    (13.450000000000, 50.666666666667, 13.448283429558, 50.665476385913),
    (13.550000000000, 51.333333333333, 13.548264242652, 51.332063317958),
    (13.566666666667, 52.050000000000, 13.564906713066, 52.048646469731),
    (13.433333333333, 53.166666666667, 13.431569610583, 53.165185284138),
    (13.466666666667, 52.483333333333, 13.464913254978, 52.481930297429),
    (13.133333333333, 49.066666666667, 13.131706947050, 49.065661709281),
    (8.666666666667, 53.116666666667, 8.665654272188, 53.115169791635),
    (12.950000000000, 47.650000000000, 12.948437185277, 47.649155713893),
    (8.500000000000, 54.716666666667, 8.499027339833, 54.714992333813),
    (7.483333333333, 51.983333333333, 7.482494584516, 51.981965147975),
    (7.516666666667, 51.016666666667, 7.515823996992, 51.015402184493),
    (7.466666666667, 50.500000000000, 7.465834308888, 50.498791390585),
    (7.533333333333, 49.333333333333, 7.532503616986, 49.332250779407),
    (7.250000000000, 49.333333333333, 7.249209260581, 49.332249456364),
    (7.533333333333, 47.666666666667, 7.532530252396, 47.665765608135),
]


def test_dhdn_etrs89_vendored_vectors():
    t = crs_to_crs("EPSG:4314", "EPSG:4258")
    # with BETA2007.gsb absent the ranked list is [helmert, ballpark]
    assert t.candidates[0].name.startswith("DHDN to ETRS89 (2)")
    lons = np.array([v[0] for v in DHDN_VECTORS])
    lats = np.array([v[1] for v in DHDN_VECTORS])
    olon, olat = t.fwd_deg(lons, lats)
    for i, (_, _, elon, elat) in enumerate(DHDN_VECTORS):
        dist = math.hypot((olat[i] - elat),
                          (olon[i] - elon) * math.cos(math.radians(elat)))
        assert dist * M_PER_DEG < 3.0, (i, dist * M_PER_DEG)
    # forward gie direction: ETRS89 -> DHDN (DHDN_ETRS89.gie:90-91)
    blon, blat = t.inv(np.radians(np.array([7.482506019176])),
                       np.radians(np.array([53.498461143331])))
    assert math.hypot(
        np.degrees(blat)[0] - 53.5,
        (np.degrees(blon)[0] - 7.483333333333)
        * math.cos(math.radians(53.5))) * M_PER_DEG < 3.0


def test_projected_to_projected_roundtrip():
    t = crs_to_crs("EPSG:31467", "EPSG:25832")  # DHDN GK3 -> ETRS89 UTM32
    x = np.array([3500000.0, 3565000.0])
    y = np.array([5600000.0, 5935000.0])
    ox, oy, oz = t.fwd3d(x, y)
    assert np.isfinite(ox).all()
    # UTM32 eastings for zone-9 GK lie east of the 500 km false easting
    assert (ox > 400000).all() and (ox < 900000).all()
    bx, by, _ = t.inv3d(ox, oy, oz)
    assert np.allclose(bx, x, atol=1e-6) and np.allclose(by, y, atol=1e-6)


# ---------------------------------------------------------------------------
# SortFunction port
# ---------------------------------------------------------------------------

def _cand(**kw):
    base = dict(name="op", pipeline=None)
    base.update(kw)
    return Candidate(**base)


def test_sort_order_matches_reference_rules():
    # non-approx before approx
    a, b = _cand(name="a", is_approx=False), _cand(name="b", is_approx=True)
    assert sort_key(a) < sort_key(b)
    # non-null before null
    a, b = _cand(name="a", is_null=False), _cand(name="b", is_null=True)
    assert sort_key(a) < sort_key(b)
    # grids available before not
    a = _cand(name="a", grids_available=True)
    b = _cand(name="b", grids_available=False)
    assert sort_key(a) < sort_key(b)
    # known accuracy before unknown
    a, b = _cand(name="a", accuracy=5.0), _cand(name="b", accuracy=-1.0)
    assert sort_key(a) < sort_key(b)
    # both unknown accuracy: prefer grids
    a = _cand(name="a", accuracy=-1.0, has_grids=True)
    b = _cand(name="b", accuracy=-1.0, has_grids=False)
    assert sort_key(a) < sort_key(b)
    # larger area BEFORE better accuracy (the reference's ordering)
    a = _cand(name="a", accuracy=10.0, extent=(-16, 25, 48, 84))
    b = _cand(name="b", accuracy=1.0, extent=(-1, 56, 11, 62))
    assert sort_key(a) < sort_key(b)
    # same area: better accuracy first
    a = _cand(name="a", accuracy=1.0, extent=(0, 0, 10, 10))
    b = _cand(name="b", accuracy=2.0, extent=(0, 0, 10, 10))
    assert sort_key(a) < sort_key(b)
    # same known accuracy: gridless preferred
    a = _cand(name="a", accuracy=1.0, has_grids=False)
    b = _cand(name="b", accuracy=1.0, has_grids=True)
    assert sort_key(a) < sort_key(b)
    # fewer steps, then shorter name, then name
    a, b = _cand(name="a", step_count=1), _cand(name="b", step_count=3)
    assert sort_key(a) < sort_key(b)
    a, b = _cand(name="ab"), _cand(name="abc")
    assert sort_key(a) < sort_key(b)
    a, b = _cand(name="abc"), _cand(name="abd")
    assert sort_key(a) < sort_key(b)


def test_filter_results_area_of_interest():
    inside = _cand(name="in", extent=(0, 0, 10, 10), accuracy=1.0)
    outside = _cand(name="out", extent=(50, 50, 60, 60), accuracy=1.0)
    noext = _cand(name="noext", accuracy=1.0)
    res = filter_results([inside, outside, noext], area=(2, 2, 8, 8))
    assert [c.name for c in res] == ["in"]
    # accuracy filter
    res = filter_results([inside, outside, noext], area=None,
                         desired_accuracy=0.5)
    assert res == []
    # no candidate has an extent -> retain all
    res = filter_results([noext], area=(2, 2, 8, 8))
    assert [c.name for c in res] == ["noext"]


# ---------------------------------------------------------------------------
# per-point dispatch
# ---------------------------------------------------------------------------

def test_dispatch_prefers_best_accuracy_in_bbox():
    t = crs_to_crs("EPSG:4230", "EPSG:4258")
    lon = np.radians(np.array([3.0, -4.0, 15.0, -100.0]))
    lat = np.radians(np.array([58.0, 40.0, 50.0, 40.0]))
    names = [t.candidates[i].name for i in t._dispatch(lon, lat, False)]
    assert names[0].startswith("ED50 to WGS 84 (23)")   # North Sea, acc 1
    assert names[1].startswith("ED50 to WGS 84 (9)")    # Iberia, acc 5
    assert names[2].startswith("ED50 to WGS 84 (1)")    # mean, acc 10
    # outside every declared extent: only the extent-less ballpark matches
    # (numerically identical to the mean op, since EPSG:4230's own towgs84
    # carries the same mean parameters)
    assert names[3].startswith("Transformation from")


def test_dispatch_retry_on_failure():
    """A candidate returning NaN for some points must be excluded for
    those points and the transform re-dispatched (proj_trans retry,
    src/4D_api.cpp:195-274)."""
    t = crs_to_crs("EPSG:4230", "EPSG:4258")

    class Failing:
        def fwd3d(self, x, y, z, t=None):
            n = np.full_like(np.asarray(x, dtype=np.float64), np.nan)
            return n, n, n
        inv3d = fwd3d

    fail = Candidate(name="AAA failing op", pipeline=Failing(), accuracy=0.1,
                     extent=(-180.0, -90.0, 180.0, 90.0))
    t.candidates.insert(0, fail)
    lon, lat = np.radians(np.array([3.0])), np.radians(np.array([58.0]))
    ox, oy, _ = t.fwd3d(lon, lat)
    # retry lands on the North Sea op and produces a finite result
    assert np.isfinite(ox).all()
    assert abs(np.degrees(ox)[0] - 2.99845) < 1e-3


def test_planner_in_spark_udf(spark):
    """The planner must close over into an executor-side pandas UDF."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import DoubleType, StructField, StructType

    t = crs_to_crs("EPSG:4230", "EPSG:4258")
    schema = StructType([StructField("lon", DoubleType()),
                         StructField("lat", DoubleType())])

    def _to_etrs(lon, lat):
        olon, olat = t.fwd_deg(lon.to_numpy(np.float64),
                               lat.to_numpy(np.float64))
        return pd.DataFrame({"lon": olon, "lat": olat})

    to_etrs = pandas_udf(_to_etrs, schema)

    df = spark.createDataFrame(
        [(3.0, 58.0), (-4.0, 40.0), (15.0, 50.0)], ["lon", "lat"])
    rows = (df.withColumn("o", to_etrs(F.col("lon"), F.col("lat")))
            .select("o.lon", "o.lat").collect())
    assert all(np.isfinite(r["lon"]) and np.isfinite(r["lat"]) for r in rows)
    assert abs(rows[0]["lon"] - 2.99845) < 1e-3


def test_planner_accepts_wkt_legs():
    """crs_to_crs legs accept WKT text like proj strings / EPSG codes."""
    wkt = ('PROJCS["OSGB 1936 / British National Grid",'
           'GEOGCS["OSGB 1936",DATUM["OSGB_1936",'
           'SPHEROID["Airy 1830",6377563.396,299.3249646],'
           'TOWGS84[446.448,-125.157,542.06,0.15,0.247,0.842,-20.489]],'
           'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
           'PROJECTION["Transverse_Mercator"],'
           'PARAMETER["latitude_of_origin",49],'
           'PARAMETER["central_meridian",-2],'
           'PARAMETER["scale_factor",0.9996012717],'
           'PARAMETER["false_easting",400000],'
           'PARAMETER["false_northing",-100000],UNIT["metre",1]]')
    t = crs_to_crs(wkt, "EPSG:4326")
    lon, lat, _ = t.fwd3d(np.array([400000.0]), np.array([-100000.0]))
    assert abs(np.degrees(lon)[0] + 2) < 0.01
    assert abs(np.degrees(lat)[0] - 49) < 0.01


def test_catalog_candidates_enumeration():
    """Pairs without curated entries enumerate real EPSG transformations
    from the vendored catalog (helmert table + area extents)."""
    from proj_spark.planner import catalog_candidates
    ops = catalog_candidates(4312, 4326)   # MGI (Austria) -> WGS84
    assert len(ops) >= 2
    names = [o.name for o in ops]
    assert any("MGI" in n for n in names)
    assert all(o.extent is not None for o in ops)
    assert all(o.kind == "towgs84" for o in ops)
    # reversed direction negates parameters
    rev = catalog_candidates(4326, 4312)
    assert any("(reversed)" in o.name for o in rev)


def test_catalog_pair_end_to_end():
    t = crs_to_crs("EPSG:4312", "EPSG:4326")
    assert any("MGI" in c.name for c in t.candidates)
    lon = np.radians(np.array([15.0]))
    lat = np.radians(np.array([47.5]))
    ox, oy, _ = t.fwd3d(lon, lat)
    # MGI -> WGS84 shifts roughly -100 m in longitude in Austria
    assert 14.9985 < np.degrees(ox)[0] < 14.9995
    bx, by, _ = t.inv3d(ox, oy, None)
    assert abs(np.degrees(bx)[0] - 15.0) < 1e-7
    assert abs(np.degrees(by)[0] - 47.5) < 1e-7


def test_catalog_projected_leg_resolution():
    """Projected catalog codes resolve to their base geographic CRS for
    the datum-pair lookup."""
    t = crs_to_crs("EPSG:28406", "EPSG:32636")  # Pulkovo GK6 -> UTM36N
    assert any("Pulkovo" in c.name for c in t.candidates)
    x, y, _ = t.fwd3d(np.array([6500000.0]), np.array([6000000.0]))
    assert np.isfinite(x[0]) and 400000 < x[0] < 600000


def test_null_towgs84_wgs84_source_is_identity_chain():
    """EPSG ETRS89<->WGS84 is a towgs84=0,0,0 KnownOp on a WGS84-shaped
    ellipsoid: the datum chain deactivates itself and the planner must
    not touch it (regression: AttributeError 'DatumChain' has no 'cart')."""
    t = crs_to_crs("EPSG:4326", "EPSG:25832")
    x, y, _ = t.fwd3d(np.radians([12.0]), np.radians([56.0]), np.array([0.0]))
    assert abs(x[0] - 687071.439) < 1e-2
    assert abs(y[0] - 6210141.327) < 1e-2
    back = crs_to_crs("EPSG:25832", "EPSG:4326")
    lam, phi, _ = back.fwd3d(x, y, np.array([0.0]))
    assert abs(np.degrees(lam)[0] - 12.0) < 1e-9
    assert abs(np.degrees(phi)[0] - 56.0) < 1e-9
