"""Unit tests for the great-circle corridor join."""

import math

import pytest
from pyspark.sql import functions as F

from proj_spark.spatial import corridor
from proj_spark.spatial.knn import EARTH_R


def gc_m(lon1, lat1, lon2, lat2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dl = math.radians(lon2 - lon1)
    h = (math.sin((p2 - p1) / 2) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2)
    return 2 * EARTH_R * math.asin(math.sqrt(h))


def test_segment_specs_vertex_above_endpoints():
    # NYC -> London: the arc crests well above both endpoint latitudes
    specs = corridor.segment_specs([(-74.0, 40.7), (-0.1, 51.5)], 100.0)
    (_, _, _, _, _, *rest) = specs[0]
    lat_hi = specs[0][16]
    assert lat_hi > 52.0 + 0.9  # vertex ~52.3N plus ~0.95 deg pad


def test_corridor_distances_match_scalar(spark):
    # equator segment (0,0)->(10,0): cross-track distance of (5, 1)
    # is exactly 1 degree of arc; (12, 0) is past B -> endpoint cap
    pts = spark.createDataFrame(
        [("a", 5.0, 1.0), ("b", 12.0, 0.0), ("c", 5.0, 0.0)],
        "url string, lon double, lat double")
    out = {r.url: r for r in corridor.corridor_topk(
        pts, [(0.0, 0.0), (10.0, 0.0)], 500.0, 10).collect()}
    deg_km = math.pi * EARTH_R / 180.0 / 1000.0
    assert out["a"].dist_km == pytest.approx(deg_km, abs=1e-3)
    assert out["b"].dist_km == pytest.approx(2 * deg_km, abs=1e-3)
    assert out["c"].dist_km == 0.0
    assert out["c"].rnk == 1


def test_corridor_excludes_far_points(spark):
    pts = spark.createDataFrame(
        [("near", 5.0, 0.5), ("far", 5.0, 20.0)],
        "url string, lon double, lat double")
    rows = corridor.corridor_topk(
        pts, [(0.0, 0.0), (10.0, 0.0)], 100.0, 10).collect()
    assert [r.url for r in rows] == ["near"]


def test_pruning_box_complete_vs_unpruned(spark):
    """The bbox gate must drop nothing: compare against a full cross
    join with the same exact distance."""
    from proj_spark.pages import synth_points
    pts = synth_points(spark, 5000).select("url", "lon", "lat")
    wps = [(-74.0, 40.7), (-0.1, 51.5), (37.6, 55.8)]
    pruned = corridor.corridor_topk(pts, wps, 300.0, 50)
    segs = spark.createDataFrame(corridor.segment_specs(wps, 300.0),
                                 corridor.SEG_SCHEMA)
    full = (pts.crossJoin(F.broadcast(segs))
            .withColumn("dist_m", F.expr(corridor.dist_sql()))
            .where(F.col("dist_m") <= 300.0 * 1000.0)
            .groupBy("seg_id").agg(F.count("*").alias("n")))
    full_n = {r.seg_id: r.n for r in full.collect()}
    got = pruned.groupBy("seg_id").agg(F.count("*").alias("n")).collect()
    for r in got:
        assert r.n == min(50, full_n[r.seg_id])


def test_map_match_chainage_scalar(spark):
    # two equator segments (0,0)->(10,0)->(20,0).  (5,1) matches seg 0
    # at chainage 5 deg of arc; (15,-1) matches seg 1 at 15 deg; (21,0)
    # is past the route end -> clamps to full route length (20 deg);
    # (-1,0) is before the start -> clamps to 0.
    pts = spark.createDataFrame(
        [("a", 5.0, 1.0), ("b", 15.0, -1.0), ("c", 21.0, 0.0),
         ("d", -1.0, 0.0)],
        "url string, lon double, lat double")
    out = {r.url: r for r in corridor.map_match(
        pts, [(0.0, 0.0), (10.0, 0.0), (20.0, 0.0)], 500.0).collect()}
    deg_km = math.pi * EARTH_R / 180.0 / 1000.0
    assert out["a"].seg_id == 0
    assert out["a"].chain_km == pytest.approx(5 * deg_km, abs=1e-2)
    assert out["b"].seg_id == 1
    assert out["b"].chain_km == pytest.approx(15 * deg_km, abs=1e-2)
    assert out["c"].chain_km == pytest.approx(20 * deg_km, abs=1e-2)
    assert out["d"].chain_km == 0.0


def test_map_match_one_row_per_point_and_argmin(spark):
    # a point beside the junction of two segments must appear ONCE,
    # matched to the lower seg_id on the exact tie
    pts = spark.createDataFrame(
        [("j", 10.0, 0.5), ("k", 3.0, -0.2)],
        "url string, lon double, lat double")
    rows = corridor.map_match(
        pts, [(0.0, 0.0), (10.0, 0.0), (20.0, 0.0)], 500.0).collect()
    by_url = {}
    for r in rows:
        assert r.url not in by_url
        by_url[r.url] = r
    assert by_url["j"].seg_id == 0  # tie at the shared waypoint
    assert by_url["k"].seg_id == 0


def test_map_match_plan_broadcast_no_preshuffle(spark):
    # the points relation must reach the candidate join without an
    # Exchange; the only exchange is the per-point argmin window
    import contextlib
    import io
    pts = spark.range(0, 100).select(
        F.col("id").cast("string").alias("url"),
        (F.col("id") * 0.05).alias("lon"),
        F.lit(0.1).alias("lat"))
    df = corridor.map_match(pts, [(0.0, 0.0), (10.0, 0.0)], 300.0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # In the formatted TREE (root-first; details follow after a blank
    # line as "(N) NodeName" blocks), every line after the join line is
    # inside the join's subtrees.  A "Exchange (N)" tree node there
    # would be a pre-join shuffle of the points relation; the argmin
    # window's own exchange sits above the join and is expected.
    import re
    tree = plan.split("\n\n")[0].splitlines()
    join_at = next(i for i, ln in enumerate(tree) if "Join" in ln)
    below = tree[join_at + 1:]
    assert below, plan  # the scan children must be in the tree
    assert not any(re.search(r"\bExchange \(\d+\)", ln) for ln in below), \
        plan
