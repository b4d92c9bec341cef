"""Event-time operators: as-of join, sessionization, canonical micros."""

import duckdb
import pytest
from pyspark.sql import functions as F

from proj_spark import temporal

SF_DIR = "/root/testdata/sf0.001"


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, tm long, event_id long, kind string")


def _final_plan(df) -> str:
    # keep only the AQE final-plan section so node counts aren't doubled
    return (df._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])


# ---------------------------------------------------------------------------
# asof_join semantics


def test_asof_strict_picks_latest_earlier(spark):
    left = _events(spark, [(1, 100, 10, "p"), (1, 50, 11, "p")])
    right = _events(spark, [(1, 40, 20, "c"), (1, 99, 21, "c"), (1, 100, 22, "c")])
    out = {r["event_id"]: r["asof"]
           for r in temporal.asof_join(left, right, on="user_id", ts="tm",
                                       tiebreak="event_id").collect()}
    # tm=100 purchase sees the tm=99 click, NOT the equal-time tm=100 one
    assert out[10]["event_id"] == 21
    assert out[11]["event_id"] == 20


def test_asof_inclusive_admits_equal_time(spark):
    left = _events(spark, [(1, 100, 10, "p")])
    right = _events(spark, [(1, 100, 22, "c")])
    strict = temporal.asof_join(left, right, on="user_id", ts="tm",
                                tiebreak="event_id").collect()[0]["asof"]
    incl = temporal.asof_join(left, right, on="user_id", ts="tm",
                              tiebreak="event_id", strict=False).collect()[0]["asof"]
    assert strict is None
    assert incl["event_id"] == 22


def test_asof_tiebreak_greatest_wins_and_no_match_is_null(spark):
    left = _events(spark, [(1, 100, 10, "p"), (2, 100, 12, "p")])
    right = _events(spark, [(1, 90, 20, "c"), (1, 90, 25, "c")])
    out = {r["event_id"]: r["asof"]
           for r in temporal.asof_join(left, right, on="user_id", ts="tm",
                                       tiebreak="event_id").collect()}
    assert out[10]["event_id"] == 25  # equal tm -> greatest tiebreak
    assert out[12] is None            # user 2 has no clicks at all


def test_asof_keys_do_not_leak_across_users(spark):
    left = _events(spark, [(1, 100, 10, "p")])
    right = _events(spark, [(2, 99, 20, "c")])
    row = temporal.asof_join(left, right, on="user_id", ts="tm",
                             tiebreak="event_id").collect()[0]
    assert row["asof"] is None


def test_asof_plan_single_exchange(spark):
    left = _events(spark, [(1, 100, 10, "p")])
    right = _events(spark, [(1, 90, 20, "c")])
    j = temporal.asof_join(left, right, on="user_id", ts="tm",
                           tiebreak="event_id")
    j.collect()
    plan = _final_plan(j)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


# ---------------------------------------------------------------------------
# sessionize semantics


def test_sessionize_gap_boundary_inclusive(spark):
    # gaps of exactly `gap` stay in-session; gap+1 breaks
    df = _events(spark, [(1, 0, 1, "e"), (1, 10, 2, "e"), (1, 21, 3, "e"),
                         (1, 31, 4, "e")])
    out = {r["event_id"]: r["session_seq"]
           for r in temporal.sessionize(df, key="user_id", ts="tm", gap=10,
                                        tiebreak="event_id").collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 2}


def test_sessionize_per_key_and_plan(spark):
    df = _events(spark, [(1, 0, 1, "e"), (2, 0, 2, "e"), (2, 100, 3, "e")])
    sess = temporal.sessionize(df, key="user_id", ts="tm", gap=10,
                               tiebreak="event_id")
    out = {r["event_id"]: r["session_seq"] for r in sess.collect()}
    assert out == {1: 1, 2: 1, 3: 2}
    plan = _final_plan(sess)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Sort ") == 1, plan


# ---------------------------------------------------------------------------
# canonical event-time micros


def test_epoch_micros_ntz_matches_stored_value_any_timezone(spark):
    ntz = spark.sql(
        "SELECT TIMESTAMP_NTZ'2024-01-05 12:34:56.789012' AS ts "
        "UNION ALL SELECT TIMESTAMP_NTZ'1969-12-31 23:59:59.000001'")
    assert ntz.schema["ts"].dataType.typeName() == "timestamp_ntz"
    expect = {1704458096789012, -999999}
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Australia/Lord_Howe"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = {r[0] for r in
                   ntz.select(temporal.epoch_micros(ntz, "ts")).collect()}
            assert got == expect, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_epoch_micros_matches_duckdb_on_events(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = sorted(r[0] for r in ev.select(
        temporal.epoch_micros(ev, "ts")).collect())
    want = sorted(r[0] for r in duckdb.sql(
        f"SELECT epoch_us(ts) FROM '{SF_DIR}/events.parquet'").fetchall())
    assert got == want


def test_epoch_micros_ltz_vs_ntz_read_agree(spark):
    prev = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    path = f"{SF_DIR}/events.parquet"
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        ntz = spark.read.parquet(path)
        assert ntz.schema["ts"].dataType.typeName() == "timestamp_ntz"
        a = sorted(r[0] for r in ntz.select(
            temporal.epoch_micros(ntz, "ts")).collect())
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        ltz = spark.read.parquet(path)
        assert ltz.schema["ts"].dataType.typeName() == "timestamp"
        b = sorted(r[0] for r in ltz.select(
            temporal.epoch_micros(ltz, "ts")).collect())
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", prev)
    assert a == b


# ---------------------------------------------------------------------------
# radius_join (spatial range join; lives here with the other pair-ops tests)


def test_radius_join_exact_pairs_and_validation(spark):
    from proj_spark.spatial.knn import EARTH_R, radius_join
    import math
    # four points near lat 50: A-B ~724 m apart, C ~ 7 km away, D remote
    rows = [("a", 10.0, 50.0), ("b", 10.01, 50.001), ("c", 10.1, 50.05),
            ("d", 20.0, 55.0)]
    pts = spark.createDataFrame(rows, "url string, lon double, lat double")
    got = {(r["id_a"], r["id_b"]): r["dist_m"]
           for r in radius_join(pts, 1000.0, z=13).collect()}
    assert set(got) == {("a", "b")}
    # exact haversine cross-check
    p1, p2 = math.radians(50.0), math.radians(50.001)
    dl = math.radians(0.01)
    h = (math.sin((p2 - p1) / 2) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2)
    want = 2 * EARTH_R * math.asin(math.sqrt(h))
    assert abs(got[("a", "b")] - want) < 1e-6
    # an uncoverable (radius, z) must refuse, not under-report
    import pytest as _pytest
    with _pytest.raises(ValueError, match="ring-1 cover"):
        radius_join(pts, 5000.0, z=13)


def test_radius_join_infers_max_lat_from_data(spark):
    from proj_spark.spatial.knn import radius_join
    # equatorial data: z13 cells are ~4.9 km, so 3 km is coverable ONLY
    # because max|lat| is inferred low; the same call would raise at 61N
    rows = [("a", 0.0, 0.0), ("b", 0.02, 0.01)]
    pts = spark.createDataFrame(rows, "url string, lon double, lat double")
    out = radius_join(pts, 3000.0, z=13).collect()
    assert len(out) == 1 and out[0]["id_a"] == "a"


def test_interval_join_exact_pairs(spark):
    from proj_spark.temporal import interval_join
    import itertools
    # crafted intervals incl.: touching (no overlap, half-open), nested,
    # cell-boundary straddlers (cell = 100)
    a_rows = [(1, 0, 50), (2, 95, 140), (3, 200, 300), (4, 399, 400)]
    b_rows = [(10, 40, 100), (11, 100, 120), (12, 300, 310),
              (13, 350, 450), (14, 0, 1)]
    a = spark.createDataFrame(a_rows, "a_id long, a_s long, a_e long")
    b = spark.createDataFrame(b_rows, "b_id long, b_s long, b_e long")
    got = sorted((r.event_id if hasattr(r, "event_id") else r.a_id,
                  r.b_id, r.ovl_us)
                 for r in interval_join(a, b, 100).collect())
    want = sorted((ai, bi, min(ae, be) - max(as_, bs))
                  for (ai, as_, ae), (bi, bs, be)
                  in itertools.product(a_rows, b_rows)
                  if as_ < be and bs < ae)
    assert got == want
    # the touching pairs (a3 ends at 300 where b12 starts; a1/b11) absent
    assert all(p[2] > 0 for p in got)


def test_interval_join_no_duplicates_across_cells(spark):
    from proj_spark.temporal import interval_join
    # both intervals straddle the same two cells -> pair must appear once
    a = spark.createDataFrame([(1, 90, 190)], "a_id long, a_s long, a_e long")
    b = spark.createDataFrame([(2, 95, 195)], "b_id long, b_s long, b_e long")
    got = interval_join(a, b, 100).collect()
    assert len(got) == 1 and got[0].ovl_us == 95
