"""First-principles checks for the session-28 layer: chi-square
independence cells vs a Counter replay, HHI/CR concentration vs exact
share arithmetic, and raster morphology vs a set-based replay at
sf0.001 — plus hand cases for erosion/dilation semantics."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

import __spark_entry__ as entry
from __spark_entry__ import CONC_TOPK, MORPH_Z

SF_DIR = "/root/testdata/sf0.001"


def test_chi2_indep_replay(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["lang", "source"])
    o = Counter(zip(docs.lang, docs.source))
    nl = Counter()
    ns = Counter()
    for (lg, sr), c in o.items():
        nl[lg] += c
        ns[sr] += c
    nn = sum(o.values())
    want = {}
    for lg in nl:
        for sr in ns:
            c = o.get((lg, sr), 0)
            z = nn * c - nl[lg] * ns[sr]
            want[(lg, sr)] = (c, z,
                              (z * z * 1000) // (nn * nl[lg] * ns[sr]))
    got = {(r.lang, r.source): (r.n_ls, r.z, r.term_q)
           for r in entry.q_chi2_indep(spark, SF_DIR).collect()}
    assert got == want
    # the margins of z cancel: sum of z over a row of the table is 0
    by_lang = Counter()
    for (lg, _), (_, z, _) in want.items():
        by_lang[lg] += z
    assert all(v == 0 for v in by_lang.values())


def test_concentration_replay(spark):
    pts = entry._points(spark, SF_DIR).collect()
    c = Counter(int(r.domain) for r in pts)
    n = sum(c.values())
    sumsq = sum(v * v for v in c.values())
    top = sum(v for v, _ in sorted(((v, d) for d, v in c.items()),
                                   key=lambda t: (-t[0], t[1]))[:CONC_TOPK])
    r = entry.q_concentration(spark, SF_DIR).collect()[0]
    assert (r.n_pages, r.n_domains, r.sumsq) == (n, len(c), sumsq)
    assert r.hhi_q == (sumsq * 1_000_000) // (n * n)
    assert getattr(r, f"cr{CONC_TOPK}_q") == (top * 1_000_000) // n
    # HHI bounds: 1e6/n_domains <= hhi <= 1e6
    assert 1_000_000 // len(c) <= r.hhi_q <= 1_000_000


def _tile(lon, lat, z):
    n = 1 << z
    x = min(max(int(math.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
    phi = math.radians(lat)
    asinh_tan = math.log(math.tan(phi) + 1.0 / math.cos(phi))
    y = min(max(int(math.floor((1.0 - asinh_tan / math.pi) / 2.0 * n)),
                0), n - 1)
    return x, y


def test_raster_morph_replay(spark):
    pts = entry._points(spark, SF_DIR).collect()
    n = 1 << MORPH_Z
    base = {_tile(r.lon, r.lat, MORPH_Z) for r in pts}
    dil = {(x + dx, y + dy) for x, y in base
           for dx in (-1, 0, 1) for dy in (-1, 0, 1)
           if 0 <= x + dx < n and 0 <= y + dy < n}
    ero = {(x, y) for x, y in base
           if all((x + dx, y + dy) in base
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                  if (dx, dy) != (0, 0))}
    def summ(s):
        # empty SUM is NULL in both engines, not 0
        return (len(s),
                sum(x for x, _ in s) if s else None,
                sum(y for _, y in s) if s else None)

    want = {"base": summ(base), "dilate": summ(dil), "erode": summ(ero)}
    got = {r.op: (r.n_cells, r.x_sum, r.y_sum)
           for r in entry.q_raster_morph(spark, SF_DIR).collect()}
    assert got == want
    # set algebra: erode <= base <= dilate
    assert got["erode"][0] <= got["base"][0] <= got["dilate"][0]
    assert ero <= base <= dil


def test_poisson_bootstrap_replay(spark):
    """Deterministic Poisson-weight replay + CI sanity: the replicate
    means must bracket the full-sample mean."""
    from __spark_entry__ import BOOT_B, BOOT_CDF, _BOOT_MIX

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    want = {}
    for b in range(BOOT_B):
        n_eff = s = 0
        for d, ln in zip(docs.doc_id, docs.n_chars):
            u = ((int(d) * BOOT_B + b) * _BOOT_MIX) % 2147483648 % 1000000
            w = 5
            for i, c in enumerate(BOOT_CDF):
                if u < c:
                    w = i
                    break
            n_eff += w
            s += w * int(ln)
        want[b] = (n_eff, s, (s * 1_000_000) // n_eff if n_eff else None)
    got = {r.b: (r.n_eff, r.sum_len, r.mean_q)
           for r in entry.q_poisson_bootstrap(spark, SF_DIR).collect()}
    assert got == want
    # CI sanity: the replicate spread brackets the plain mean
    true_mean = int(docs.n_chars.sum()) * 1_000_000 // len(docs)
    means = sorted(m for _, _, m in want.values() if m is not None)
    assert means[0] <= true_mean <= means[-1]
    # weights average ~1: effective sizes cluster around n
    n = len(docs)
    assert 0.7 * n < sum(ne for ne, _, _ in want.values()) / BOOT_B < 1.3 * n


def test_exact_quantiles_replay(spark):
    """Sorted-list replay: the bucket-refinement answer must equal the
    brute-force 'smallest v with cum >= ceil(q*n/100)' over the fully
    sorted value list."""
    import math as _math

    from __spark_entry__ import EQ_BUCKETS, EQ_SPECS

    ev = entry._events_micros(spark, SF_DIR).collect()
    cents = sorted(int(r.cents) for r in ev)
    n = len(cents)
    lo, hi = cents[0], cents[-1]
    width = (hi - lo) // EQ_BUCKETS + 1
    got = {r.q: (r.r, r.bucket, r.bucket_n, r.v_cents)
           for r in entry.q_exact_quantiles(spark, SF_DIR).collect()}
    assert set(got) == {q for q, _ in EQ_SPECS}
    from collections import Counter
    bn = Counter((c - lo) // width for c in cents)
    for q, _ in EQ_SPECS:
        r = _math.ceil(n * q / 100)
        v = cents[r - 1]
        b = (v - lo) // width
        assert got[q] == (r, b, bn[b], v), q
    # refinement really prunes: each target bucket is far smaller than n
    for q, (_, _, bucket_n, _) in got.items():
        assert bucket_n < n


def test_mmr_rerank_replay(spark):
    """Greedy MMR replay with the engines' own fold order (sequential
    left-fold dot products, then one 1e-8 quantization) — the selected
    sequence and integer scores must match exactly; diversity property:
    MMR never picks a candidate identical to an already-picked one
    while a distinct candidate remains."""
    from __spark_entry__ import MMR_CAND, MMR_K

    emb = {int(r.vec_id): [float(v) for v in r.embedding]
           for r in spark.read.parquet(
               f"{SF_DIR}/embeddings.parquet").collect()}

    def dot(u, v):
        acc = 0.0
        for x, y in zip(u, v):
            acc = acc + x * y
        return acc

    def cos_n(u, v):
        c = dot(u, v) / (math.sqrt(dot(u, u)) * math.sqrt(dot(v, v)))
        s = c * 1e8
        return int(math.floor(abs(s) + 0.5)) * (1 if s >= 0 else -1)

    q = emb[0]
    rel = {i: cos_n(v, q) for i, v in emb.items() if i != 0}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:MMR_CAND]
    sim = {(a, b): cos_n(emb[a], emb[b])
           for a in cand for b in cand if a != b}
    sel = []
    want = []
    for r in range(1, MMR_K + 1):
        best = None
        for c in cand:
            if c in [s for s, _ in sel]:
                continue
            ms = max((sim[(c, s)] for s, _ in sel), default=0)
            score = rel[c] - ms
            key = (-score, c)
            if best is None or key < best[0]:
                best = (key, c, score)
        sel.append((best[1], best[2]))
        want.append((r, best[1], rel[best[1]], best[2]))
    got = sorted((r.round, r.vec_id, r.rel_n, r.mmr_n)
                 for r in entry.q_mmr_rerank(spark, SF_DIR).collect())
    assert got == sorted(want)
    # scores are non-increasing in relevance-only terms after round 1?
    # no — but every round's winner must beat the runner-up's replayed
    # score by construction; assert all picks distinct
    assert len({v for _, v, _, _ in want}) == MMR_K


def _tiles_langs(spark):
    from __spark_entry__ import DIV_Z
    pts = entry._points(spark, SF_DIR).collect()
    out = Counter()
    for r in pts:
        out[(*_tile(r.lon, r.lat, DIV_Z), r.lang)] += 1
    return out


def test_tile_diversity_replay(spark):
    from __spark_entry__ import DIV_MIN_N

    tl = _tiles_langs(spark)
    per_tile = {}
    for (x, y, lg), c in tl.items():
        n, rich, pairs = per_tile.get((x, y), (0, 0, 0))
        per_tile[(x, y)] = (n + c, rich + 1, pairs + c * (c - 1))
    want = {k: (n, rich, (pairs * 1_000_000) // (n * (n - 1)))
            for k, (n, rich, pairs) in per_tile.items()
            if n >= DIV_MIN_N}
    got = {(r.tx, r.ty): (r.n, r.richness, r.simpson_q)
           for r in entry.q_tile_diversity(spark, SF_DIR).collect()}
    assert got == want
    # bounds: a monolingual tile hits exactly the all-same-pairs ratio
    for (n, rich, s) in want.values():
        assert s <= 1_000_000
        if rich == 1:
            assert s == 1_000_000


def test_location_quotient_replay(spark):
    from __spark_entry__ import LQ_MIN_N

    tl = _tiles_langs(spark)
    nt = Counter()
    nl = Counter()
    for (x, y, lg), c in tl.items():
        nt[(x, y)] += c
        nl[lg] += c
    nn = sum(tl.values())
    want = {}
    for (x, y, lg), c in tl.items():
        if nt[(x, y)] >= LQ_MIN_N:
            want[(x, y, lg)] = (c, nt[(x, y)], nl[lg],
                                (c * nn * 1_000_000)
                                // (nt[(x, y)] * nl[lg]))
    got = {(r.tx, r.ty, r.lang): (r.c_tl, r.n_t, r.c_l, r.lq_q)
           for r in entry.q_location_quotient(spark, SF_DIR).collect()}
    assert got == want
    # mass balance: sum_l c_l * LQ(t,l) = N * 1e6 exactly without
    # flooring (sum_l global_share(l) * LQ = 1); each floored term
    # loses < c_l units, so the defect is in [0, sum c_l) < N * #langs
    by_tile = Counter()
    for (x, y, lg), (c, n_t, c_l, lq) in want.items():
        by_tile[(x, y)] += c_l * lq
    langs = {lg for (_, _, lg) in want}
    for k, s in by_tile.items():
        assert 0 <= nn * 1_000_000 - s < nn * len(langs)


def test_k_anonymity_replay(spark):
    from __spark_entry__ import KANON_K, KANON_LEN_BUCKET, LDIV_L

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["source", "n_chars", "lang"])
    cls = Counter()
    langs = {}
    for s, n, lg in zip(docs.source, docs.n_chars, docs.lang):
        k = (s, int(n) // KANON_LEN_BUCKET)
        cls[k] += 1
        langs.setdefault(k, set()).add(lg)
    want = {k: (c, len(langs[k]), c < KANON_K, len(langs[k]) < LDIV_L)
            for k, c in cls.items()}
    got = {(r.source, r.len_b): (r.class_n, r.l_div, r.k_risky, r.l_risky)
           for r in entry.q_k_anonymity(spark, SF_DIR).collect()}
    assert got == want
    # the audit partitions the corpus: class sizes sum to the corpus
    assert sum(c for c, _, _, _ in want.values()) == len(docs)
    # l-diversity can never exceed class size
    assert all(l <= c for c, l, _, _ in want.values())


def test_trimmed_mean_replay(spark):
    from __spark_entry__ import TRIM_PCT

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["source", "n_chars"])
    want = {}
    for src in sorted(set(docs.source)):
        vs = sorted(int(v) for v in docs[docs.source == src].n_chars)
        n = len(vs)
        lo = (n * TRIM_PCT) // 100
        kept = vs[lo:n - lo]
        want[src] = (n, lo, len(kept), sum(kept),
                     (sum(kept) * 1_000_000) // len(kept))
    got = {r.source: (r.n, r.lo, r.tn, r.tsum, r.tmean_q)
           for r in entry.q_trimmed_mean(spark, SF_DIR).collect()}
    assert got == want
    # robustness: the trimmed mean sits within the kept range
    for src, (n, lo, tn, tsum, tm) in want.items():
        vs = sorted(int(v) for v in docs[docs.source == src].n_chars)
        assert vs[lo] * 1_000_000 <= tm <= vs[n - lo - 1] * 1_000_000


def test_did_replay(spark):
    from __spark_entry__ import DID_CTRL, DID_TREAT

    ev = entry._events_micros(spark, SF_DIR).collect()
    xs = [int(r.tm) // 3_600_000_000 for r in ev]
    cut = min(xs) + (max(xs) - min(xs)) // 2
    cells = {}
    for r in ev:
        if r.event_type not in (DID_TREAT, DID_CTRL):
            continue
        key = (r.event_type == DID_TREAT,
               int(r.tm) // 3_600_000_000 >= cut)
        n, s = cells.get(key, (0, 0))
        cells[key] = (n + 1, s + int(r.cents))

    def m(t, l):
        n, s = cells[(t, l)]
        return (s * 1_000_000) // n if s >= 0 else -((-s * 1_000_000) // n)

    r = entry.q_did(spark, SF_DIR).collect()[0]
    assert (r.m_t1, r.m_t2, r.m_c1, r.m_c2) == (
        m(True, False), m(True, True), m(False, False), m(False, True))
    assert r.did_q == (r.m_t2 - r.m_t1) - (r.m_c2 - r.m_c1)
    assert r.n_t == cells[(True, False)][0] + cells[(True, True)][0]


def test_entropy_rate_replay(spark):
    from collections import defaultdict

    from __spark_entry__ import MS_INIT, MS_ROUNDS

    ev = sorted(((int(r.user_id), int(r.tm), int(r.event_id),
                  r.event_type)
                 for r in entry._events_micros(spark, SF_DIR).collect()))
    by_user = defaultdict(list)
    for u, tm, eid, t in ev:
        by_user[u].append((tm, eid, t))
    mat = Counter()
    for rows in by_user.values():
        rows.sort()
        for r1, r2 in zip(rows, rows[1:]):
            mat[(r1[2], r2[2])] += 1
    rt = Counter()
    for (f, _), n in mat.items():
        rt[f] += n
    types = sorted(rt)
    pi = {t: MS_INIT for t in types}
    for _ in range(MS_ROUNDS):
        nxt = Counter()
        for (f, t), n in mat.items():
            nxt[t] += (pi[f] * n) // rt[f]
        pi = {t: nxt.get(t, 0) for t in types}
    want = {}
    for f in types:
        h = sum((n * int(round(math.log(rt[f] / n) * 1e6))) // rt[f]
                for (ff, _), n in mat.items() if ff == f)
        want[f] = (rt[f], pi[f], h, (pi[f] * h) // MS_INIT)
    got = {r.event_type: (r.row_total, r.pi_q, r.h_f_q, r.wh_q)
           for r in entry.q_entropy_rate(spark, SF_DIR).collect()}
    assert got == want
    # per-state entropy bounded by ln(#successors)
    for f in types:
        n_succ = sum(1 for (ff, _) in mat if ff == f)
        assert 0 <= want[f][2] <= int(math.log(n_succ) * 1e6) + n_succ
