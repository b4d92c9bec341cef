"""SQL function surface (spark/sqlfuncs.py): spark.sql parity with the
library API."""

import numpy as np
import pytest

from proj_spark.spark.sqlfuncs import register_sql_functions


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    names = register_sql_functions(spark)
    assert set(names) == {"proj_fwd", "proj_inv", "crs_transform",
                          "geod_inverse", "geod_direct"}
    yield


def test_proj_fwd_matches_library(spark):
    row = spark.sql(
        "SELECT proj_fwd('+proj=utm +zone=32 +ellps=GRS80', 12.0D, 56.0D) AS p"
    ).collect()[0]["p"]
    assert row["x"] == pytest.approx(687071.4391, abs=1e-3)
    assert row["y"] == pytest.approx(6210141.3267, abs=1e-3)


def test_proj_inv_roundtrip(spark):
    row = spark.sql("""
        SELECT proj_inv('+proj=utm +zone=32 +ellps=GRS80', p.x, p.y) AS q
        FROM (SELECT proj_fwd('+proj=utm +zone=32 +ellps=GRS80',
                              12.0D, 56.0D) AS p)
    """).collect()[0]["q"]
    assert row["lon"] == pytest.approx(12.0, abs=1e-9)
    assert row["lat"] == pytest.approx(56.0, abs=1e-9)


def test_proj_fwd_over_table_mixed_definitions(spark):
    df = spark.createDataFrame(
        [("+proj=utm +zone=32 +ellps=GRS80", 12.0, 56.0),
         ("+proj=webmerc +ellps=WGS84", 2.0, 0.0)],
        "defn string, lon double, lat double")
    df.createOrReplaceTempView("pts_sqlfuncs")
    rows = spark.sql(
        "SELECT proj_fwd(defn, lon, lat).x AS x FROM pts_sqlfuncs ORDER BY x"
    ).collect()
    assert rows[0]["x"] == pytest.approx(222638.98159, abs=1e-4)
    assert rows[1]["x"] == pytest.approx(687071.4391, abs=1e-3)


def test_crs_transform_epsg(spark):
    row = spark.sql(
        "SELECT crs_transform('EPSG:4326', 'EPSG:32632', 12.0D, 56.0D) AS p"
    ).collect()[0]["p"]
    # WGS84 vs GRS80 ellipsoids differ by <0.1 mm here
    assert row["x"] == pytest.approx(687071.4391, abs=1e-2)
    assert row["y"] == pytest.approx(6210141.3267, abs=1e-2)


def test_geod_inverse_equator(spark):
    # one degree of longitude along the WGS84 equator
    row = spark.sql(
        "SELECT geod_inverse('WGS84', 0.0D, 0.0D, 0.0D, 1.0D) AS g"
    ).collect()[0]["g"]
    assert row["s12"] == pytest.approx(111319.4907932736, abs=1e-6)
    assert row["azi1"] == pytest.approx(90.0, abs=1e-9)


def test_geod_direct_inverse_consistency(spark):
    rows = spark.sql("""
        SELECT d.lat2, d.lon2,
               geod_inverse('GRS80', 40.6D, -73.8D, d.lat2, d.lon2).s12 AS back
        FROM (SELECT geod_direct('GRS80', 40.6D, -73.8D, 53.47D,
                                 5850000.0D) AS d)
    """).collect()
    assert rows[0]["back"] == pytest.approx(5850000.0, abs=1e-6)


def test_out_of_range_is_nan_not_error(spark):
    row = spark.sql(
        "SELECT proj_fwd('+proj=merc +ellps=WGS84', 0.0D, 90.0D) AS p"
    ).collect()[0]["p"]
    assert row["y"] is None or not np.isfinite(row["y"])


def test_null_definition_yields_null_not_error(spark):
    """Standard SQL null-in null-out: a NULL definition/ellps/CRS in any
    registered function must produce NULL output rows, not fail the
    task (and must not poison the non-null rows in the same batch)."""
    rows = spark.sql("""
        SELECT proj_fwd(defn, lon, lat) AS p,
               crs_transform(src, 'EPSG:32632', lon, lat) AS t,
               geod_inverse(ellps, lat, lon, 0.0D, 0.0D) AS g
        FROM VALUES
          ('+proj=utm +zone=32 +ellps=GRS80', 'EPSG:4326',
           'GRS80', 12.0D, 56.0D),
          (NULL, NULL, NULL, 12.0D, 56.0D)
        AS t(defn, src, ellps, lon, lat)
        ORDER BY defn NULLS LAST
    """).collect()
    ok, nul = rows[0], rows[1]
    assert ok["p"]["x"] == pytest.approx(687071.4391, abs=1e-3)
    assert ok["t"]["x"] == pytest.approx(687071.4391, abs=1e-3)
    assert ok["g"]["s12"] > 0
    assert nul["p"]["x"] is None and nul["p"]["y"] is None
    assert nul["t"]["x"] is None
    assert nul["g"]["s12"] is None
