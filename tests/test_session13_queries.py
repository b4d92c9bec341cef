"""Semantic invariants for the session-13 queries: weighted shortest
paths, the empirical semivariogram, and the edit-distance similarity
join.

The value-level gate is tools/selfcheck.py (DuckDB oracles); these
tests pin what a matching oracle cannot: known-answer correctness of
the weighted_hops kernel on a hand-built graph, the variogram's
internal identities, and COMPLETENESS of the SymSpell candidate
generation against a brute-force cross join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from proj_spark.graph import weighted_hops

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# weighted_hops kernel: known-answer graph
# ---------------------------------------------------------------------------

def test_weighted_hops_known_graph(spark):
    # 0 -(1)-> 1 -(1)-> 2 -(1)-> 3   and a shortcut 0 -(10)-> 3
    # plus 3 -(1)-> 4 reachable only through the chain (4 hops) or
    # shortcut (2 hops).
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 3, 10), (3, 4, 1)],
        "src long, dst long, w long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist for r in
           weighted_hops(edges, seeds, rounds=4).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}
    # bounded at 2 edges: node 3 only via the weight-10 shortcut
    # (the cheap 3-edge chain is over the bound), and node 4 via the
    # shortcut + one edge (2 edges, cost 11)
    got2 = {r.node: r.dist for r in
            weighted_hops(edges, seeds, rounds=2).collect()}
    assert got2 == {0: 0, 1: 1, 2: 2, 3: 10, 4: 11}


def test_weighted_hops_parallel_edges_take_min(spark):
    edges = spark.createDataFrame(
        [(0, 1, 7), (0, 1, 3), (0, 1, 5)], "src long, dst long, w long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist for r in
           weighted_hops(edges, seeds, rounds=1).collect()}
    assert got == {0: 0, 1: 3}


def test_shortest_paths_seed_and_bound_invariants(spark):
    rows = entry.q_shortest_paths(spark, SF_DIR).collect()
    assert rows
    dist = {r.domain: r.dist for r in rows}
    # every seed labeled 0; non-seeds strictly positive
    for node, d in dist.items():
        if node % entry.BFS_SEED_MOD == 0:
            assert d == 0
        else:
            assert 1 <= d <= entry.SP_ROUNDS * entry.SP_WMOD


def test_shortest_paths_dominated_by_hop_count(spark):
    # weighted dist <= SP_WMOD * hop count and >= hop count (weights
    # are in [1, SP_WMOD]); domain_hops computes the unweighted hops
    # over the SAME edge relation and seed set.
    hops = {r.domain: r.hops
            for r in entry.q_domain_hops(spark, SF_DIR).collect()}
    wd = {r.domain: r.dist
          for r in entry.q_shortest_paths(spark, SF_DIR).collect()}
    # domain_hops may use a different round bound; compare where both
    # labeled and hops within the shortest_paths bound
    for node, h in hops.items():
        if node in wd and h <= entry.SP_ROUNDS:
            assert wd[node] <= h * entry.SP_WMOD
            assert wd[node] >= h


# ---------------------------------------------------------------------------
# semivariogram
# ---------------------------------------------------------------------------

def test_semivariogram_identities(spark):
    rows = entry.q_semivariogram(spark, SF_DIR).collect()
    assert rows
    lags = sorted(r.lag_udeg for r in rows)
    assert set(lags) <= set(entry.SEMIVAR_LAGS)
    for r in rows:
        assert r.n_pairs > 0
        # gamma is exactly the rounded ratio of the integer statistics
        assert r.gamma == pytest.approx(
            round(r.sum_sqdiff / (2.0 * r.n_pairs), 6))


def test_semivariogram_rises_with_lag(spark):
    # the field is a smooth lattice gradient (steps every
    # SEMIVAR_ZCELL=50k udeg), so squared differences grow with
    # separation on average.  The two sub-cell lags (25k, 50k) can
    # reorder under sampling noise at sf0.001 — both sit below one
    # lattice step — so assert only the robust property: the widest
    # ring (spanning multiple lattice steps) is strictly rougher than
    # each sub-cell ring.
    rows = {r.lag_udeg: r.gamma
            for r in entry.q_semivariogram(spark, SF_DIR).collect()}
    assert entry.SEMIVAR_LAGS[-1] in rows
    top = rows[entry.SEMIVAR_LAGS[-1]]
    for l in entry.SEMIVAR_LAGS[:-1]:
        if l in rows:
            assert top > rows[l]


# ---------------------------------------------------------------------------
# url_edit_pairs: SymSpell completeness vs brute force
# ---------------------------------------------------------------------------

def test_url_edit_pairs_complete_vs_bruteforce(spark):
    got = {(r.id_a, r.id_b)
           for r in entry.q_url_edit_pairs(spark, SF_DIR).collect()}
    pts = entry._points(spark, SF_DIR)
    seq = F.regexp_extract("url", r"/page/(\d+)$", 1).cast("long")
    u = pts.select(seq.alias("pid"), F.expr("substring(url, 9)").alias("s"))
    a = u.select(F.col("pid").alias("id_a"), F.col("s").alias("s_a"))
    b = u.select(F.col("pid").alias("id_b"), F.col("s").alias("s_b"))
    brute = (a.crossJoin(b)
             .where((F.col("id_a") < F.col("id_b"))
                    & (F.levenshtein("s_a", "s_b") <= 1)))
    want = {(r.id_a, r.id_b) for r in brute.collect()}
    # the df-cap can only REMOVE candidates whose every shared signature
    # is ubiquitous; at sf0.001 no signature exceeds the cap, so the
    # SymSpell join must be exactly complete.
    assert got == want
