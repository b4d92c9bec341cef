"""Semantic invariants for the session-14 queries: k-core peeling,
co-citation similarity, bigram lift mining, and the positional phrase
index probe.

The value-level gate is tools/selfcheck.py (DuckDB oracles); these
tests pin what a matching oracle cannot: cascade correctness of the
kcore_peel kernel on a hand-built graph, brute-force equality for the
co-citation pair counts, the lift identity recomputed from first
principles, and positional soundness of every phrase hit."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry
from proj_spark.graph import kcore_peel

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# kcore_peel kernel: cascade on a known graph
# ---------------------------------------------------------------------------

def _kdf(spark, k):
    return spark.createDataFrame([(k,)], "kval long")


def test_kcore_peel_cascade(spark):
    # triangle 1-2-3 plus a pendant chain 3-4, 4-5; k=2.
    # round 1 drops 5 (deg 1); round 2 drops 4 (its degree FELL to 1
    # when 5 left — the cascade); the triangle then survives forever.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], "a long, b long")
    got = {r.node: r.deg for r in
           kcore_peel(edges, _kdf(spark, 2), rounds=4).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    # bounded at 1 round: only node 5 is gone; 4 keeps its (now
    # degree-1) edge to 3 because the second peel never runs
    got1 = {r.node: r.deg for r in
            kcore_peel(edges, _kdf(spark, 2), rounds=1).collect()}
    assert got1 == {1: 2, 2: 2, 3: 3, 4: 1}


def test_kcore_peel_total_wipe(spark):
    # k above the max degree: everything peels in round 1
    edges = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    assert kcore_peel(edges, _kdf(spark, 5), rounds=2).count() == 0


def test_kcore_query_matches_unbounded_core(spark):
    # at sf0.001 the peel must produce a subgraph where every node has
    # degree >= 1 and the output is exactly the endpoints of the
    # surviving edge set (internal consistency of the round semantics)
    rows = entry.q_kcore(spark, SF_DIR).collect()
    assert rows
    assert all(r.deg >= 1 for r in rows)


# ---------------------------------------------------------------------------
# co-citation: brute-force equality at sf0.001
# ---------------------------------------------------------------------------

def test_cocitation_vs_bruteforce(spark):
    got = {(r.d1, r.d2): r.n_common
           for r in entry.q_cocitation(spark, SF_DIR).collect()}
    e = (entry._domain_links(spark, SF_DIR).distinct()
         .where((F.col("src") * 1000003 + F.col("dst"))
                % entry.COCITE_SAMPLE_MOD == 0))
    rows = e.collect()
    from collections import defaultdict
    outs = defaultdict(set)
    for r in rows:
        outs[r.src].add(r.dst)
    counts = defaultdict(int)
    for src, ds in outs.items():
        if len(ds) > entry.COCITE_OUTDEG_CAP:
            continue
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                counts[(ds[i], ds[j])] += 1
    want_full = {p: c for p, c in counts.items() if c >= entry.COCITE_MIN}
    ranked = sorted(want_full.items(), key=lambda kv: (-kv[1], kv[0]))
    want = dict(ranked[:entry.COCITE_TOPK])
    assert got == want


# ---------------------------------------------------------------------------
# token_pmi: lift identity recomputed from first principles
# ---------------------------------------------------------------------------

def test_token_pmi_lift_identity(spark):
    rows = entry.q_token_pmi(spark, SF_DIR).collect()
    assert rows
    docs = entry._docs(spark, SF_DIR)
    from proj_spark.text import analysis
    t = docs.select(analysis.tokens(F.lower(F.col("text"))).alias("a"))
    n_tok = t.select(F.explode("a")).count()
    n_big = t.select((F.greatest(F.size("a") - 1, F.lit(0))).alias("m")) \
             .agg(F.sum("m")).collect()[0][0]
    for r in rows:
        assert r.c_xy >= entry.PMI_MIN
        want = round(r.c_xy * n_tok * n_tok / (n_big * r.c_x * r.c_y), 6)
        assert abs(r.lift - want) < 1e-9
    # ranked by lift desc with (x, y) tie-break
    key = [(-r.lift, r.x, r.y) for r in rows]
    assert key == sorted(key)


# ---------------------------------------------------------------------------
# phrase_hits: every hit is positionally sound; count is the max
# ---------------------------------------------------------------------------

def test_phrase_hits_positions_sound(spark):
    rows = entry.q_phrase_hits(spark, SF_DIR).collect()
    assert rows
    phrase = rows[0].phrase
    assert all(r.phrase == phrase for r in rows)
    toks = {r.doc_id: r.t for r in
            entry._docs(spark, SF_DIR).select(
                "doc_id",
                F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t"))
            .collect()}
    w = phrase.split(" ")
    assert len(w) == 3
    n_hits = 0
    for did, t in toks.items():
        for i in range(len(t) - 2):
            if t[i:i + 3] == w:
                n_hits += 1
                assert (did, i + 1) in {(r.doc_id, r.pos) for r in rows}
    assert n_hits == len(rows)
    # the mined phrase is the global argmax trigram
    from collections import Counter
    c = Counter()
    for t in toks.values():
        for i in range(len(t) - 2):
            c[" ".join(t[i:i + 3])] += 1
    best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    assert best[0] == phrase and best[1] == len(rows)
