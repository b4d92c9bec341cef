"""Semantic invariants for the session-12 queries: OLAP cube, KMV
sketch, Mann-Kendall trend, and the TPC-H-style relational pair.

The value-level gate is tools/selfcheck.py (DuckDB oracles); these
tests pin the algebraic properties a matching oracle could not check —
cube additivity, sketch error bounds, trend-statistic range, and
group-sum == table-total identities."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def cube_rows(spark):
    return entry.q_tile_cube(spark, SF_DIR).collect()


def test_tile_cube_additivity(cube_rows):
    total = [r for r in cube_rows if r.gid == 3]
    assert len(total) == 1
    per_tile = [r for r in cube_rows if r.gid == 1]       # tile only
    per_lang = [r for r in cube_rows if r.gid == 2]       # lang only
    fine = [r for r in cube_rows if r.gid == 0]
    assert sum(r.n_pages for r in per_tile) == total[0].n_pages
    assert sum(r.n_pages for r in per_lang) == total[0].n_pages
    assert sum(r.n_pages for r in fine) == total[0].n_pages
    # sentinel encoding: rolled-up keys use -1 / 'ALL', never NULL
    assert all(r.tile == -1 for r in per_lang + total)
    assert all(r.lang == "ALL" for r in per_tile + total)
    assert all(r.tile != -1 and r.lang != "ALL" for r in fine)


def test_tile_cube_distinct_not_additive_but_bounded(cube_rows):
    # distinct counts roll up by <= (union bound), never by sum
    total = next(r for r in cube_rows if r.gid == 3)
    for r in cube_rows:
        assert r.n_domains <= total.n_domains
        assert r.n_domains <= r.n_pages


def test_kmv_estimate_quality(spark):
    rows = entry.q_kmv_distinct(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r.k_used < entry.KMV_K:
            # exact path: k_used == number of distinct hashes, which can
            # only fall below n_exact via a hash collision
            assert r.est == r.k_used
            assert r.n_exact - r.est <= 2
        else:
            # Beyer et al. estimator: stderr ~ n/sqrt(K-2); allow 4 sigma
            sigma = r.n_exact / (entry.KMV_K - 2) ** 0.5
            assert abs(r.est - r.n_exact) <= 4 * sigma + 2, r


def test_kmv_kth_hash_is_monotone_witness(spark):
    # h_k of a full sketch must exceed h_k of any denser cell's... not
    # comparable cell-to-cell; instead pin the invariant k_used <= K and
    # h_k within the hash codomain.
    rows = entry.q_kmv_distinct(spark, SF_DIR).collect()
    for r in rows:
        assert 1 <= r.k_used <= entry.KMV_K
        assert 0 <= r.h_k < entry.KMV_RANGE


def test_hotspot_trend_range_and_consistency(spark):
    rows = entry.q_hotspot_trend(spark, SF_DIR).collect()
    assert rows
    max_s = entry.MK_BUCKETS * (entry.MK_BUCKETS - 1) // 2
    for r in rows:
        assert -max_s <= r.s_stat <= max_s
        if r.s_stat >= entry.MK_THRESH:
            assert r.trend == "rising"
        elif r.s_stat <= -entry.MK_THRESH:
            assert r.trend == "falling"
        else:
            assert r.trend == "flat"
    # every geotagged page lands in exactly one tile
    n_pts = entry._points(spark, SF_DIR).count()
    assert sum(r.n_total for r in rows) == n_pts


def test_pricing_summary_totals(spark):
    rows = entry.q_pricing_summary(spark, SF_DIR).collect()
    con = duckdb.connect()
    tot = con.execute(
        f"""SELECT COUNT(*),
                   CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT)
            FROM '{SF_DIR}/lineitem.parquet'
            WHERE epoch_us(l_shipdate) < {entry._Q1_CUTOFF_US}""").fetchone()
    assert sum(r.count_order for r in rows) == tot[0]
    assert sum(r.sum_qty for r in rows) == tot[1]
    for r in rows:
        # exact-rational average identity
        assert r.avg_qty_milli == (r.sum_qty * 1000) // r.count_order
        assert r.sum_disc_c2 <= r.sum_base_c * 100
        assert r.sum_charge_c4 >= r.sum_disc_c2 * 100


def test_nation_revenue_nations_are_asian(spark):
    rows = entry.q_nation_revenue(spark, SF_DIR).collect()
    assert rows
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    region = spark.read.parquet(f"{SF_DIR}/region.parquet")
    asia = {r.n_name for r in
            nation.join(region,
                        nation.n_regionkey == region.r_regionkey)
            .where(F.col("r_name") == "ASIA").collect()}
    for r in rows:
        assert r.nation in asia
        assert r.revenue_c2 > 0
        assert r.n_items > 0
