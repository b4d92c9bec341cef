"""First-principles checks for the session-15 queries: BM25 scores
recomputed with collections.Counter, HITS iterates replayed as dense
matrix products, the RA link-prediction scores brute-forced from the
sampled edge set, and stay-point segments re-derived by a sequential
scan.

The value-level cross-engine gate is tools/selfcheck.py (DuckDB
oracles); these tests prove the *semantics* against an independent
non-SQL, non-Spark computation."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# bm25_topk: exact rational BM25 recomputed in pure Python
# ---------------------------------------------------------------------------

def test_bm25_matches_pure_python(spark):
    docs = {r.doc_id: r.text for r in
            entry._docs(spark, SF_DIR).collect()}
    toks = {d: [t for t in txt.strip().lower().split() if t]
            for d, txt in docs.items()}
    tf = {d: Counter(a) for d, a in toks.items()}
    dl = {d: len(a) for d, a in toks.items()}
    nn, s = len(docs), sum(dl.values())
    df = Counter()
    for d, c in tf.items():
        for t in c:
            df[t] += 1
    q = sorted((t for t in df if len(t) >= entry.BM25_MINLEN),
               key=lambda t: (-df[t], t))[:entry.BM25_QK]
    exp = {}
    for d in docs:
        sc, nt = 0, 0
        for t in q:
            if tf[d][t] == 0:
                continue
            nt += 1
            idf = (1_000_000 * (2 * nn - 2 * df[t] + 1)) // (2 * df[t] + 1)
            tfp = (1_000_000 * 6 * tf[d][t] * s) // (
                2 * tf[d][t] * s + s + 3 * dl[d] * nn)
            sc += (idf * tfp) // 1_000_000
        if nt:
            exp[d] = (nt, sc)
    want = sorted(exp.items(), key=lambda kv: (-kv[1][1], kv[0]))
    want = [(d, nt, sc) for d, (nt, sc) in want][:entry.BM25_TOPK]
    got = [(r.doc_id, r.n_terms, r.score_micro) for r in
           entry.q_bm25_topk(spark, SF_DIR).collect()]
    assert got == want


def test_bm25_tf_saturation_monotone():
    # the rational tf term 6*tf*S/(2*tf*S + S + 3*dl*N) must increase
    # in tf and approach (k1+1)=3 -- the BM25 saturation shape
    s, dl, nn = 100_000, 200, 500
    vals = [(1_000_000 * 6 * tf * s) // (2 * tf * s + s + 3 * dl * nn)
            for tf in range(1, 50)]
    assert all(b > a for a, b in zip(vals, vals[1:]))
    assert vals[-1] < 3_000_000


# ---------------------------------------------------------------------------
# hits_scores: dense-matrix replay of the four sweeps
# ---------------------------------------------------------------------------

def test_hits_matches_matrix_replay(spark):
    edges = [(r.src, r.dst) for r in
             entry._domain_links(spark, SF_DIR).distinct().collect()]
    n = entry.N_DOMAINS
    A = np.zeros((n, n), dtype=object)  # python ints: no overflow ever
    for s, d in edges:
        A[s, d] = 1
    h1 = A.sum(axis=1)              # out-degree
    a2 = A.T @ h1
    h3 = A @ a2
    a4 = A.T @ h3
    rows = [(dom, int(a4[dom]), int(h3[dom])) for dom in range(n)
            if a4[dom] > 0 or h3[dom] > 0]
    rows.sort(key=lambda r: (-r[1], r[0]))
    want = rows[:entry.HITS_TOPK]
    got = [(r.domain, r.auth, r.hub) for r in
           entry.q_hits_scores(spark, SF_DIR).collect()]
    assert got == want


# ---------------------------------------------------------------------------
# link_pred: brute-force RA index over the sampled undirected graph
# ---------------------------------------------------------------------------

def test_link_pred_matches_brute_force(spark):
    und = {(r.a, r.b) for r in
           entry._domain_links(spark, SF_DIR)
           .selectExpr("least(src, dst) a", "greatest(src, dst) b")
           .distinct().collect()
           if (r.a * 1000003 + r.b) % entry.LP_SAMPLE_MOD == 0}
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    deg = {z: len(v) for z, v in nbrs.items()}
    scores = defaultdict(lambda: [0, 0])  # (x,y) -> [n_common, ra]
    for z, v in nbrs.items():
        if deg[z] > entry.LP_DEG_CAP:
            continue
        sv = sorted(v)
        for i, x in enumerate(sv):
            for y in sv[i + 1:]:
                e = scores[(x, y)]
                e[0] += 1
                e[1] += 1_000_000 // deg[z]
    cand = [(x, y, c, ra) for (x, y), (c, ra) in scores.items()
            if (x, y) not in und and c >= entry.LP_MIN_COMMON]
    cand.sort(key=lambda r: (-r[3], -r[2], r[0], r[1]))
    want = cand[:entry.LP_TOPK]
    got = [(r.x, r.y, r.n_common, r.ra_micro) for r in
           entry.q_link_pred(spark, SF_DIR).collect()]
    assert got == want
    assert len(got) > 0  # non-degenerate at sf0.001


# ---------------------------------------------------------------------------
# stay_points: sequential-scan replay of the segmentation
# ---------------------------------------------------------------------------

def test_stay_points_matches_sequential_scan(spark):
    import pyspark.sql.functions as F
    pts = (entry._points(spark, SF_DIR)
           .select("domain",
                   F.regexp_extract("url", r"/page/(\d+)$", 1)
                   .cast("long").alias("seq"),
                   (F.round(F.col("lon") * 1e6, 0).cast("long")
                    + F.lit(180_000_000)).alias("x"),
                   (F.round(F.col("lat") * 1e6, 0).cast("long")
                    + F.lit(90_000_000)).alias("y"))
           .collect())
    by_dom = defaultdict(list)
    for r in pts:
        by_dom[r.domain].append((r.seq, r.x, r.y))
    want = set()
    for dom, rows in by_dom.items():
        rows.sort()
        segid, seg = 0, [rows[0]]
        def emit(segid, seg):
            if len(seg) >= entry.SP_MIN_PTS:
                n = len(seg)
                sx = sum(p[1] for p in seg)
                sy = sum(p[2] for p in seg)
                want.add((dom, segid, n, seg[0][0], seg[-1][0],
                          sx // n - 180_000_000, sy // n - 90_000_000))
        for prev, cur in zip(rows, rows[1:]):
            if max(abs(cur[1] - prev[1]), abs(cur[2] - prev[2])) \
                    > entry.SP_JUMP_UDEG:
                emit(segid, seg)
                segid += 1
                seg = [cur]
            else:
                seg.append(cur)
        emit(segid, seg)
    got = {(r.domain, r.seg, r.n_pts, r.seq_start, r.seq_end,
            r.cx_udeg, r.cy_udeg) for r in
           entry.q_stay_points(spark, SF_DIR).collect()}
    assert got == want
    assert len(got) > 0  # non-degenerate at sf0.001
