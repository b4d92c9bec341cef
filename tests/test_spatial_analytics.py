"""Spatial analytics layer: tile pyramid, Moran's I, IDW interpolation,
per-tile top-k serving, curation funnel."""

from __future__ import annotations

import contextlib
import io

import numpy as np
import pytest
from pyspark.sql import functions as F

from proj_spark.pages import synth_points
from proj_spark.spatial import cells, interp, pyramid
from proj_spark.spatial import stats as spatial_stats

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as e
    return e


@pytest.fixture(scope="module")
def pts(spark):
    return synth_points(spark, 3000).persist()


# --- tile pyramid ---------------------------------------------------------

def test_pyramid_levels_match_direct_encoding(spark, pts):
    """Every rolled-up level equals the direct per-zoom groupBy — the
    floor-composition hierarchy property, checked on data."""
    pyr = {(r.zoom, r.tile_x, r.tile_y): r.n
           for r in pyramid.tile_pyramid(pts, 6, 3).collect()}
    for z in range(3, 7):
        direct = {(z, r.tx, r.ty): r.n for r in
                  pts.select(cells.tile_x(F.col("lon"), z).alias("tx"),
                             cells.tile_y(F.col("lat"), z).alias("ty"))
                  .groupBy("tx", "ty").agg(F.count("*").alias("n")).collect()}
        got = {k: v for k, v in pyr.items() if k[0] == z}
        assert got == direct, f"level {z} diverges from direct encoding"


def test_pyramid_parent_is_sum_of_children(spark, pts):
    rows = pyramid.tile_pyramid(pts, 6, 5).collect()
    fine = [(r.tile_x, r.tile_y, r.n) for r in rows if r.zoom == 6]
    coarse = {(r.tile_x, r.tile_y): r.n for r in rows if r.zoom == 5}
    acc: dict[tuple[int, int], int] = {}
    for x, y, n in fine:
        acc[(x >> 1, y >> 1)] = acc.get((x >> 1, y >> 1), 0) + n
    assert acc == coarse


def test_pyramid_scans_base_once(spark, entry):
    """Each pyramid level is materialized once: the union branches read
    InMemoryTableScans and the raw points relation appears exactly once
    in the plan (inside the base level's cached subtree) — without the
    persists every branch re-derives its ancestor chain from the source
    (measured: 6 full scans for z9..z4)."""
    df = entry.q_tile_pyramid(spark, SF)
    try:
        s = plan_of(df)
        assert "InMemoryTableScan" in s
        import re
        assert len(re.findall(r"\(\d+\) (?:Scan parquet|Range)\b", s)) == 1
    finally:
        spark.catalog.clearCache()


def test_pyramid_validates_range(spark, pts):
    with pytest.raises(ValueError):
        pyramid.tile_pyramid(pts, 3, 5)   # z_min > z_max
    with pytest.raises(ValueError):
        pyramid.tile_pyramid(pts, 40, 2)  # z_max beyond MAX_Z


# --- Moran's I ------------------------------------------------------------

def _counts_df(spark, rows):
    return spark.createDataFrame(rows, "tx long, ty long, x long")


def test_morans_two_cell_hand_case(spark):
    """(0,0)=1, (1,0)=3: N=2, W=2, T=4, S_sq=10, S_i=8, S_pairs=6,
    I = (2/2) * (6 - 2*8 + 2*4) / (10 - 2*4) = -1 (hand computed)."""
    r = spatial_stats.morans_i(
        _counts_df(spark, [(0, 0, 1), (1, 0, 3)])).collect()[0]
    assert (r.n_cells, r.w_pairs, r.t_sum, r.s_sq, r.s_i, r.s_pairs) == \
        (2, 2, 4, 10, 8, 6)
    assert r.morans_i == -1.0


def test_morans_checkerboard_is_minus_one(spark):
    """2x2 checkerboard 1/9: perfect negative autocorrelation."""
    r = spatial_stats.morans_i(_counts_df(
        spark, [(0, 0, 1), (1, 0, 9), (0, 1, 9), (1, 1, 1)])).collect()[0]
    assert r.w_pairs == 8
    assert r.morans_i == -1.0


def test_morans_isolated_cells_null(spark):
    """No adjacent occupied cells -> W=0 -> NULL (not a crash)."""
    r = spatial_stats.morans_i(_counts_df(
        spark, [(0, 0, 5), (7, 7, 2)])).collect()[0]
    assert r.w_pairs == 0 and r.morans_i is None


def test_morans_constant_field_null(spark):
    """Zero variance -> NULL rather than 0/0."""
    r = spatial_stats.morans_i(_counts_df(
        spark, [(0, 0, 4), (1, 0, 4), (0, 1, 4)])).collect()[0]
    assert r.morans_i is None


def test_morans_positive_on_clustered_pages(spark, pts):
    """City-clustered synthesis -> positive spatial autocorrelation."""
    r = spatial_stats.morans_i(spatial_stats.cell_counts(pts, 5)).collect()[0]
    assert r.morans_i is not None and r.morans_i > 0.05


# --- IDW interpolation ----------------------------------------------------

def test_idw_floor_division_exact_over_domain():
    """floor(1e10 / d^2) in float64 == exact integer division for EVERY
    quantized distance in [10 m, 100 km] — the proof that lets the SQL
    oracle spell the identical float expression."""
    d = np.arange(10, 100001, dtype=np.int64)
    b = d * d
    q_float = np.floor(np.float64(interp.W_SCALE) / b.astype(np.float64))
    assert np.array_equal(q_float.astype(np.int64), interp.W_SCALE // b)


def test_idw_rejects_uncoverable_radius(spark):
    q = spark.createDataFrame([(0, 0.0, 0.0)], "query_id long, lon double, lat double")
    with pytest.raises(ValueError, match="ring-1 cover"):
        interp.idw_interp(q, q, radius_m=500_000.0, z=8,
                          value=F.lit(1), max_abs_lat=61.0)


def test_idw_matches_bruteforce(spark, pts):
    """Cell-ring IDW == direct numpy IDW with the same quantization."""
    from proj_spark.spatial.knn import EARTH_R
    qrows = [(0, -74.0, 40.7), (1, 2.35, 48.86)]
    q = spark.createDataFrame(qrows, "query_id long, lon double, lat double")
    data = pts.withColumn("val", (F.col("url").substr(-1, 1).cast("long")))
    got = {r.query_id: r for r in
           interp.idw_interp(q, data, 50_000.0, 8, F.col("val"),
                             max_abs_lat=61.0).collect()}
    pdf = data.select("lon", "lat", "val").toPandas()
    for qid, qlon, qlat in qrows:
        p1, p2 = np.radians(qlat), np.radians(pdf["lat"].to_numpy())
        dlam = np.radians(pdf["lon"].to_numpy()) - np.radians(qlon)
        h = (np.sin((p2 - p1) / 2) ** 2
             + np.cos(p1) * np.cos(p2) * np.sin(dlam / 2) ** 2)
        d = 2.0 * EARTH_R * np.arcsin(np.sqrt(h))
        sel = d <= 50_000.0
        d_m = np.maximum(np.floor(d[sel] + 0.5).astype(np.int64), 10)
        w = interp.W_SCALE // (d_m * d_m)
        v = pdf["val"].to_numpy()[sel]
        r = got[qid]
        assert r.n_pts == int(sel.sum())
        assert r.sum_w == int(w.sum())
        assert r.sum_wv == int((w * v).sum())
        if w.sum() > 0:
            assert r.idw == pytest.approx(
                round(float(w @ v) / float(w.sum()), 6), abs=1e-9)


def test_idw_no_coverage_yields_null(spark):
    q = spark.createDataFrame([(0, -40.0, -45.0)],
                              "query_id long, lon double, lat double")
    data = spark.createDataFrame([(10.0, 10.0, 5)],
                                 "lon double, lat double, val long")
    r = interp.idw_interp(q, data, 50_000.0, 8, F.col("val"),
                          max_abs_lat=61.0).collect()[0]
    assert r.n_pts == 0 and r.sum_w == 0 and r.idw is None


def test_idw_broadcasts_query_side(spark, entry):
    """The big points side must never shuffle: broadcast ring join only."""
    s = plan_of(entry.q_idw_interp(spark, SF))
    assert "BroadcastHashJoin" in s
    assert "SortMergeJoin" not in s


# --- viewport top-k -------------------------------------------------------

def test_viewport_topk_partial_topk_plan(spark, entry):
    """row_number <= k must compile to WindowGroupLimit with a partial
    (pre-shuffle) pass, so dense tiles ship <= k rows per map task."""
    s = plan_of(entry.q_viewport_topk(spark, SF))
    assert s.count("WindowGroupLimit") >= 2


def test_viewport_topk_semantics(spark, entry):
    rows = entry.q_viewport_topk(spark, SF).collect()
    per_tile: dict[tuple[int, int], list] = {}
    for r in rows:
        per_tile.setdefault((r.tile_x, r.tile_y), []).append(r)
    import hashlib
    for tile, rs in per_tile.items():
        assert len(rs) <= 3
        assert sorted(r.rank for r in rs) == list(range(1, len(rs) + 1))
        ordered = sorted(rs, key=lambda r: r.rank)
        md5s = [hashlib.md5(r.url.encode()).hexdigest() for r in ordered]
        assert md5s == sorted(md5s)


# --- curation funnel ------------------------------------------------------

def test_curation_funnel_monotone_and_consistent(spark, entry):
    out = entry.q_curation_funnel(spark, "/root/testdata/sf0.01").collect()
    assert out, "funnel must produce per-source rows"
    for r in out:
        assert r.n_total >= r.n_quality >= r.n_lang >= r.n_kept >= 0
    # independent check of one stage: total quality-kept count
    docs = entry._docs(spark, "/root/testdata/sf0.01")
    from proj_spark.text import analysis
    n_q = docs.where(analysis.quality_score(F.col("text")) >= 0.5).count()
    assert sum(r.n_quality for r in out) == n_q


# --- domain drift ---------------------------------------------------------

def test_domain_drift_single_exchange(spark, entry):
    """The lag window and the per-domain agg share ONE hash exchange on
    (domain) — the sessionize plan shape."""
    import re
    s = plan_of(entry.q_domain_drift(spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange\b", s)) == 1
    assert "hashpartitioning(domain" in s


def test_domain_drift_semantics(spark):
    """Hand-built two-domain path: step accounting and jump detection."""
    import __spark_entry__ as entry
    from proj_spark.spatial.knn import haversine_expr
    rows = [("a", 1, 0.0, 0.0), ("a", 2, 0.0, 1.0), ("a", 3, 60.0, 1.0),
            ("b", 1, 10.0, 10.0)]
    df = spark.createDataFrame(rows, "domain string, seq long, lat double, lon double")
    from pyspark.sql.window import Window
    w = Window.partitionBy("domain").orderBy("seq")
    t = (df.withColumn("plat", F.lag("lat").over(w))
         .withColumn("plon", F.lag("lon").over(w))
         .withColumn("step", haversine_expr(F.col("plon"), F.col("plat"),
                                            F.col("lon"), F.col("lat"))))
    agg = (t.groupBy("domain").agg(
        F.count("*").alias("n_pages"),
        F.count("step").alias("n_steps"),
        F.count_if(F.col("step") > F.lit(entry.DRIFT_JUMP_M)).alias("n_jumps"),
        F.sum(F.round(F.col("step"), 0).cast("long")).alias("sum_step_m"),
        F.round(F.max("step"), 0).cast("long").alias("max_step_m")))
    out = {r.domain: r for r in agg.collect()}
    # domain a: steps ~111 km (1 deg lon at equator) and ~6672 km (60 deg
    # lat) -> one >5000 km jump; domain b: single page, no steps
    assert out["a"].n_pages == 3 and out["a"].n_steps == 2
    assert out["a"].n_jumps == 1
    assert out["a"].max_step_m == pytest.approx(6672_000, rel=0.01)
    assert out["a"].sum_step_m - out["a"].max_step_m == \
        pytest.approx(111_195, rel=0.01)
    assert out["b"].n_steps == 0 and out["b"].sum_step_m is None \
        and out["b"].max_step_m is None


def test_kernel_smooth_single_cell_scatter(spark):
    """One cell of 4 pages scatters the 3x3 binomial kernel: center
    16, edges 8, corners 4; n_pages only at the center."""
    sm = {(r.tx, r.ty): r for r in spatial_stats.kernel_smooth(
        _counts_df(spark, [(5, 5, 4)]), z=4).collect()}
    assert len(sm) == 9
    assert sm[(5, 5)].density == 16 and sm[(5, 5)].n_pages == 4
    assert sm[(4, 5)].density == 8 and sm[(4, 5)].n_pages == 0
    assert sm[(4, 4)].density == 4


def test_kernel_smooth_drops_out_of_lattice(spark):
    """A corner cell only scatters onto in-lattice targets (no wrap)."""
    sm = spatial_stats.kernel_smooth(
        _counts_df(spark, [(0, 0, 1)]), z=3).collect()
    assert {(r.tx, r.ty) for r in sm} == {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_kernel_smooth_is_join_free(spark):
    plan = spatial_stats.kernel_smooth(
        _counts_df(spark, [(0, 0, 1)]), z=3)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_getis_hand_case(spark):
    """Row (0,0)=1,(1,0)=3,(2,0)=2: n=3, xb=2, S=sqrt(2/3).
    Ends: k=2, varterm=1 -> gi=(w_sum-4)/S; middle: k=n=3 -> NULL."""
    rows = {(r.tx, r.ty): r for r in spatial_stats.getis_gi(
        _counts_df(spark, [(0, 0, 1), (1, 0, 3), (2, 0, 2)])).collect()}
    import math
    s = math.sqrt(14 / 3 - 4.0)
    assert rows[(0, 0)].w_sum == 4 and rows[(0, 0)].k == 2
    assert rows[(0, 0)].gi_star == 0.0
    assert rows[(1, 0)].k == 3 and rows[(1, 0)].gi_star is None
    assert rows[(2, 0)].gi_star == pytest.approx((5 - 4) / s, abs=1e-6)


def test_getis_hot_cell_positive_cold_negative(spark):
    """A dense blob's center scores high positive; a far sparse cell
    in a sparse neighborhood scores negative."""
    blob = [(10 + dx, 10 + dy, 50) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    cold = [(30, 30, 1), (31, 30, 1)]
    rows = {(r.tx, r.ty): r for r in spatial_stats.getis_gi(
        _counts_df(spark, blob + cold)).collect()}
    assert rows[(10, 10)].gi_star > 1.0
    assert rows[(30, 30)].gi_star < 0.0


def test_dense_clusters_l_shape_and_singleton(spark, monkeypatch):
    """An L-shaped blob of dense tiles is ONE cluster with the right
    bbox; an isolated dense tile is a singleton; sparse tiles drop."""
    import __spark_entry__ as entry

    counts = _counts_df(spark, [
        # L-shape: (10,10),(11,10),(11,11) all dense
        (10, 10, 9), (11, 10, 7), (11, 11, 6),
        # diagonal-only contact is NOT rook-adjacent -> separate
        (12, 12, 8),
        # sparse tile below threshold
        (20, 20, 2),
    ])
    monkeypatch.setattr(entry, "_points", lambda *_: None)
    from proj_spark.spatial import stats as spatial_stats
    monkeypatch.setattr(spatial_stats, "cell_counts",
                        lambda *_, **__: counts)
    out = {r.comp_id: r for r in
           entry.q_dense_clusters(spark, "ignored").collect()}
    side = 1 << entry.DENSE_Z
    l_id = 10 * side + 10
    assert out[l_id].n_cells == 3 and out[l_id].n_pages == 22
    assert (out[l_id].tx_min, out[l_id].tx_max,
            out[l_id].ty_min, out[l_id].ty_max) == (10, 11, 10, 11)
    assert out[12 * side + 12].n_cells == 1
    assert 20 * side + 20 not in out


def test_hex_qr_roundtrip_and_neighbors(spark):
    """Cell centers map back to their own cell; ring-1 neighbor centers
    map to distinct adjacent cells; jittered points stay in the cell of
    the nearest center (hexagon containment, sampled)."""
    from proj_spark.spatial import hexgrid
    size = 0.75
    base = [(q, r) for q in range(-5, 6) for r in range(-4, 5)]
    df = spark.createDataFrame(base, "q long, r long")
    lon, lat = hexgrid.hex_center(F.col("q"), F.col("r"), size)
    q2, r2 = hexgrid.hex_qr(lon, lat, size)
    bad = df.select(
        "q", "r", q2.alias("q2"), r2.alias("r2")).where(
        (F.col("q") != F.col("q2")) | (F.col("r") != F.col("r2")))
    assert bad.count() == 0
    # jitter by < inradius (sqrt(3)/2 * size * 0.9) stays inside
    import math
    inr = math.sqrt(3) / 2 * size * 0.9
    jit = df.select(
        "q", "r",
        (lon + F.lit(inr) * F.cos(F.col("q") * 1.7)).alias("jlon"),
        (lat + F.lit(0.0)).alias("jlat"))
    # jlon moved along the flat side direction; use a safe radial jitter
    jq, jr = hexgrid.hex_qr(
        F.col("jlon") * 0 + F.col("jlon"), F.col("jlat"), size)
    same = jit.select("q", "r", jq.alias("q2"), jr.alias("r2")).where(
        (F.col("q") == F.col("q2")) & (F.col("r") == F.col("r2")))
    assert same.count() == len(base)


def test_hex_qr_sql_twin_matches_spark(spark):
    """The DuckDB SQL twin assigns every page point to the same hex cell
    as the Spark expressions (bit-exact grid assignment)."""
    import duckdb

    from proj_spark.spatial import hexgrid
    size = 0.75
    pts = [(round(-179.9 + i * 7.13, 6), round(-59.9 + (i * 3.7) % 120, 6))
           for i in range(400)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    q, r = hexgrid.hex_qr(F.col("lon"), F.col("lat"), size)
    got = sorted((row.lon, row.q, row.r) for row in
                 df.select("lon", q.alias("q"), r.alias("r")).collect())
    qs, rs = hexgrid.hex_qr_sql("lon", "lat", size)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pts)
    want = sorted(tuple(x) for x in con.execute(
        f"SELECT lon, {qs} AS q, {rs} AS r FROM t").fetchall())
    assert got == want


def test_gearys_c_known_lattice(spark):
    from proj_spark.spatial.stats import gearys_c
    # 2x2 checkerboard 1/5: perfectly dispersed -> C well above 1
    counts = spark.createDataFrame(
        [(0, 0, 1), (1, 0, 5), (0, 1, 5), (1, 1, 1)],
        "tx long, ty long, x long")
    r = gearys_c(counts).collect()[0]
    # n=4, W=8 directed pairs, every neighbor diff = ±4 -> s_diff2=128
    assert r.n_cells == 4 and r.w_pairs == 8 and r.s_diff2 == 128
    # x̄=3, den = 72 - 36 = 16? s_sq=52, den = 52 - 4*9 = 16
    # C = (3/16) * 128 / 16 = 1.5
    assert r.gearys_c == 1.5


def test_gearys_c_uniform_is_degenerate(spark):
    from proj_spark.spatial.stats import gearys_c
    counts = spark.createDataFrame(
        [(0, 0, 7), (1, 0, 7)], "tx long, ty long, x long")
    r = gearys_c(counts).collect()[0]
    assert r.gearys_c is None  # zero variance -> NULL, not a crash


def test_knox_pairs_cross_cell_cover(spark, monkeypatch, tmp_path):
    """A pair straddling cell borders in x, y, AND t at once must be
    found exactly once by the 3x3x3 neighbor join."""
    import __spark_entry__ as entry
    rows = [
        # pids 1 s apart across a time-bucket border; coords across
        # both spatial cell borders, within the box on both axes
        ("https://site1.example/page/899", -100.0, 10.0, 0.15, 0.15),
        ("https://site2.example/page/900", -100.0, 10.0, -0.04, -0.04),
        # a third point far away: no pair
        ("https://site3.example/page/901", 100.0, -10.0, 0.0, 0.0),
    ]
    pts = spark.createDataFrame(
        [(u, "d", "en", cy + jy, cx + jx)
         for (u, cx, cy, jx, jy) in rows],
        "url string, domain string, lang string, lat double, lon double")
    monkeypatch.setattr(entry, "_points", lambda s, d: pts)
    got = entry.q_knox_pairs(spark, "unused").collect()
    assert len(got) == 1
    r = got[0]
    assert (r.pid_a, r.pid_b, r.dt_s) == (899, 900, 1)
