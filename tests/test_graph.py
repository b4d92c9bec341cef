"""Tests for proj_spark.graph (quantized PageRank)."""
import duckdb
import pytest
from pyspark.sql import functions as F

from proj_spark.graph import PR_INIT, pagerank, pagerank_sql


def _edges(spark, triples):
    return spark.createDataFrame(triples, "src long, dst long, w long")


def _nodes(spark, n):
    return spark.range(n).select(F.col("id").alias("node"))


def test_pagerank_cycle_symmetric(spark):
    """A 3-cycle is vertex-transitive: all scores equal, mass conserved
    to within the integer-division truncation per node per round."""
    pr = pagerank(_edges(spark, [(0, 1, 1), (1, 2, 1), (2, 0, 1)]),
                  _nodes(spark, 3), iters=4)
    scores = {r.node: r.score for r in pr.collect()}
    assert len(set(scores.values())) == 1
    assert abs(scores[0] - PR_INIT) <= 4  # truncation only


def test_pagerank_star_center_dominates(spark):
    """Leaves 1..4 all link to 0; 0 links back to 1.  Node 0 ends far
    above the teleport base, node 1 above leaves 2..4."""
    edges = [(i, 0, 1) for i in range(1, 5)] + [(0, 1, 1)]
    pr = pagerank(_edges(spark, edges), _nodes(spark, 5), iters=5)
    s = {r.node: r.score for r in pr.collect()}
    assert s[0] > 2 * PR_INIT
    assert s[1] > s[2] == s[3] == s[4]


def test_pagerank_dangling_mass_drops(spark):
    """0 -> 1 with 1 dangling: total mass strictly shrinks (no
    redistribution), and node 1 still receives 0's contribution."""
    pr = pagerank(_edges(spark, [(0, 1, 1)]), _nodes(spark, 2), iters=3)
    s = {r.node: r.score for r in pr.collect()}
    assert s[0] + s[1] < 2 * PR_INIT
    assert s[1] > s[0]


@pytest.mark.parametrize("iters", [1, 5])
def test_pagerank_matches_sql_twin(spark, iters):
    """Spark pagerank == DuckDB pagerank_sql to the last micro-unit on
    a deterministic pseudo-random weighted multigraph."""
    n = 40
    triples = []
    for i in range(400):
        h = (i * 2654435761) % 2147483648
        s, d, w = h % n, (h // 7) % n, 1 + h % 3
        if s != d:
            triples.append((s, d, w))
    agg = {}
    for s, d, w in triples:
        agg[(s, d)] = agg.get((s, d), 0) + w
    triples = [(s, d, w) for (s, d), w in sorted(agg.items())]
    got = {r.node: r.score for r in
           pagerank(_edges(spark, triples), _nodes(spark, n),
                    iters=iters).collect()}
    vals = ", ".join(f"({s}, {d}, {w})" for s, d, w in triples)
    sql = pagerank_sql(
        f"e(src, dst, w) AS (SELECT * FROM (VALUES {vals}))",
        f"nodes AS (SELECT range AS node FROM range(0, {n}))",
        iters=iters)
    want = dict(duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_bfs_hops_small_graph(spark):
    from proj_spark.graph import bfs_hops
    # 0->1->2->3->4 chain, plus island 9; direction matters (5->0 does
    # not make 5 reachable)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (5, 0), (2, 1)],
        "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.hops for r in bfs_hops(edges, seeds, 3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # 4 beyond depth, 5/9 unreachable


def test_bfs_hops_early_stop_and_min(spark):
    from proj_spark.graph import bfs_hops
    # two paths to node 3: length 1 and length 2 -> hops must be 1
    edges = spark.createDataFrame(
        [(0, 3), (0, 1), (1, 3)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.hops for r in bfs_hops(edges, seeds, 10).collect()}
    assert got == {0: 0, 1: 1, 3: 1}


def test_triangle_counts_known(spark):
    from proj_spark.graph import triangle_counts
    # K4 on {0,1,2,3}: each node is in C(3,2)=3 triangles; plus a
    # pendant edge (3,4) and a disconnected edge (7,8): no triangles.
    # Edge list includes duplicates, reversals, and a self-loop.
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
         (3, 4), (7, 8), (5, 5), (2, 3)],
        "src long, dst long")
    got = {r.node: r.n_tri for r in triangle_counts(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_star_has_none(spark):
    from proj_spark.graph import triangle_counts
    edges = spark.createDataFrame([(0, i) for i in range(1, 30)],
                                  "src long, dst long")
    assert triangle_counts(edges).count() == 0


def test_triangle_counts_doulion_sampling(spark):
    from proj_spark.graph import triangle_counts
    import itertools, random
    rng = random.Random(3)
    nodes = list(range(24))
    edges = [(a, b) for a, b in itertools.combinations(nodes, 2)
             if rng.random() < 0.5]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_tri
           for r in triangle_counts(df, sample_mod=3).collect()}
    kept = {(a, b) for a, b in edges if (a * 1000003 + b) % 3 == 0}
    want = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= kept:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    assert got == want


def test_betweenness_bounded_rejects_depth_lt_2(spark):
    """depth < 2 has no interior level for the backward pass; the
    public API must fail loudly, not with IndexError (round-2 advice)."""
    import pytest as _pytest

    from proj_spark.graph import betweenness_bounded
    e = spark.createDataFrame([(1, 2)], "u long, v long")
    s = spark.createDataFrame([(1,)], "s long")
    with _pytest.raises(ValueError, match="depth >= 2"):
        betweenness_bounded(e, s, depth=1)
