"""First-principles checks for the session-21 layer: graph quality
metrics (modularity / clustering coefficient / assortativity), corpus
statistics (Heaps' law, Chao1 richness, Kendall tau-b) and the TPC-H
Q4/Q14 relational analogues — pure-Python replays at sf0.001, hand
cases with closed-form answers, and plan audits."""

from __future__ import annotations

import contextlib
import io
import math
from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import functions as F

import __spark_entry__ as entry
from __spark_entry__ import (HEAPS_B, KT_XW, KT_YW, LPA_ROUNDS,
                             TRI_SAMPLE_MOD, _Q4_HI_US, _Q4_LATE_US,
                             _Q4_LO_US, _Q14_HI_US, _Q14_LO_US,
                             _domain_links, _lpa_und)

SF_DIR = "/root/testdata/sf0.001"
DOCS = "/root/testdata/sf0.001/documents.parquet"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _rhalf(v: float) -> int:
    """round-half-away-from-zero, the ROUND(x, 0) both engines use."""
    return int(v + 0.5) if v >= 0 else -int(-v + 0.5)


def _qln(x: int) -> int:
    return _rhalf(math.log(x) * 1e6)


# ---------------------------------------------------------------------------
# modularity
# ---------------------------------------------------------------------------

def test_modularity_two_triangles_hand_case(spark):
    """Two triangles joined by one bridge edge, partitioned into the
    two triangles: m=7, e_c=3, d_c=7 for both communities, so each
    q_num = 4*7*3 - 49 = 35 and Q_c = 35/196 = 0.178571."""
    from proj_spark.graph import modularity
    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    und = spark.createDataFrame(edges, ["a", "b"])
    lab = spark.createDataFrame(
        [(i, 0 if i < 3 else 3) for i in range(6)], ["u", "lab"])
    rows = {r["community"]: r for r in modularity(und, lab).collect()}
    assert set(rows) == {0, 3}
    for c in (0, 3):
        r = rows[c]
        assert r["n_nodes"] == 3 and r["e_in"] == 3
        assert r["d_tot"] == 7 and r["m_e"] == 7
        assert r["q_num"] == 35
        assert r["q_part"] == round(35 / 196, 6)


def _py_lpa(edges: list[tuple[int, int]], rounds: int) -> dict[int, int]:
    """Synchronous label propagation, most-frequent-neighbor label with
    min tie-break — the reproducible variant q_label_prop implements."""
    adj = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    lab = {u: u for u in adj}
    for _ in range(rounds):
        nxt = {}
        for u, nbrs in adj.items():
            cnt = Counter(lab[v] for v in nbrs)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[u] = best[0]
        lab = nxt
    return lab


def test_modularity_replay_sf0001(spark):
    """Replay LPA + exact modularity in pure Python from the collected
    sampled edge set; every per-community row must match exactly."""
    edges = [(r["a"], r["b"]) for r in _lpa_und(spark, SF_DIR).collect()]
    lab = _py_lpa(edges, LPA_ROUNDS)
    m = len(edges)
    deg: Counter = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    e_in: Counter = Counter()
    for a, b in edges:
        if lab[a] == lab[b]:
            e_in[lab[a]] += 1
    d_tot, n_nodes = Counter(), Counter()
    for u, c in lab.items():
        d_tot[c] += deg[u]
        n_nodes[c] += 1
    got = {r["community"]: r
           for r in entry.q_modularity(spark, SF_DIR).collect()}
    assert set(got) == set(n_nodes)
    for c, r in got.items():
        qn = 4 * m * e_in[c] - d_tot[c] * d_tot[c]
        assert r["m_e"] == m and r["n_nodes"] == n_nodes[c]
        assert r["e_in"] == e_in[c] and r["d_tot"] == d_tot[c]
        assert r["q_num"] == qn
        assert r["q_part"] == round(qn / (4.0 * m * m), 6)
    # the partition found by 2-round LPA on a near-complete sampled
    # graph has SOME defined total modularity; just pin the identity
    total = sum(r["q_num"] for r in got.values()) / (4.0 * m * m)
    assert -1.0 <= total <= 1.0


# ---------------------------------------------------------------------------
# clustering coefficient
# ---------------------------------------------------------------------------

def test_clustering_coef_replay_sf0001(spark):
    """Adjacency-set triangle recount per node + exact div arithmetic."""
    links = _domain_links(spark, SF_DIR)
    und = {(r["a"], r["b"]) for r in
           (links.select(F.least("src", "dst").alias("a"),
                         F.greatest("src", "dst").alias("b"))
            .where(F.col("a") != F.col("b")).distinct()
            .where((F.col("a") * 1000003 + F.col("b"))
                   % TRI_SAMPLE_MOD == 0)).collect()}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    got = {r["domain"]: r
           for r in entry.q_clustering_coef(spark, SF_DIR).collect()}
    exp_nodes = {u for u in adj if len(adj[u]) >= 2}
    assert set(got) == exp_nodes
    for u in exp_nodes:
        nbrs = sorted(adj[u])
        tri = sum(1 for i, x in enumerate(nbrs) for y in nbrs[i + 1:]
                  if y in adj[x])
        d = len(nbrs)
        r = got[u]
        assert r["deg"] == d and r["n_tri"] == tri
        assert r["lcc_micro"] == (2 * tri * 1_000_000) // (d * (d - 1))


# ---------------------------------------------------------------------------
# assortativity
# ---------------------------------------------------------------------------

def test_assortativity_replay_sf0001(spark):
    edges = {(r["a"], r["b"]) for r in
             (_domain_links(spark, SF_DIR)
              .select(F.least("src", "dst").alias("a"),
                      F.greatest("src", "dst").alias("b"))
              .where(F.col("a") != F.col("b")).distinct()).collect()}
    deg: Counter = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    inc = [(deg[a], deg[b]) for a, b in edges]
    inc += [(y, x) for x, y in inc]
    n = len(inc)
    sx = sum(x for x, _ in inc)
    sy = sum(y for _, y in inc)
    sxx = sum(x * x for x, _ in inc)
    syy = sum(y * y for _, y in inc)
    sxy = sum(x * y for x, y in inc)
    row = entry.q_assortativity(spark, SF_DIR).collect()[0]
    assert (row["n_inc"], row["s_x"], row["s_y"]) == (n, sx, sy)
    assert (row["s_xx"], row["s_yy"], row["s_xy"]) == (sxx, syy, sxy)
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    assert row["r"] == round((n * sxy - sx * sy) / math.sqrt(vx * vy), 6)
    assert row["s_x"] == row["s_y"] and row["s_xx"] == row["s_yy"]


# ---------------------------------------------------------------------------
# Heaps' law
# ---------------------------------------------------------------------------

def test_heaps_fit_replay_sf0001(spark):
    W = entry.NGRAM_W
    pdf = pd.read_parquet(DOCS, columns=["doc_id", "text"])
    tot: Counter = Counter()
    first_b: dict[str, int] = {}
    for did, text in sorted(zip(pdf["doc_id"], pdf["text"])):
        b = int(did) // HEAPS_B
        for i in range(max(len(text) - (W - 1), 0)):
            t = text[i:i + W]
            tot[b] += 1
            if t not in first_b or first_b[t] > b:
                first_b[t] = b
    new: Counter = Counter(first_b.values())
    cum_t, cum_v, uv = 0, 0, []
    for b in sorted(tot):
        cum_t += tot[b]
        cum_v += new[b]
        uv.append((_qln(cum_t), _qln(cum_v)))
    n = len(uv)
    su = sum(u for u, _ in uv)
    sv = sum(v for _, v in uv)
    suuq = sum((u * u) // 1_000_000 for u, _ in uv)
    suvq = sum((u * v) // 1_000_000 for u, v in uv)
    row = entry.q_heaps_fit(spark, SF_DIR).collect()[0]
    assert (row["n_pts"], row["su"], row["sv"]) == (n, su, sv)
    assert (row["suuq"], row["suvq"]) == (suuq, suvq)
    m = (n * (suvq * 1e6) - su * sv) / (n * (suuq * 1e6) - su * su)
    assert row["slope"] == round(m, 6)
    # Heaps exponent of a natural-ish corpus: sublinear growth
    assert 0.0 < row["slope"] < 1.0


# ---------------------------------------------------------------------------
# vocabulary richness
# ---------------------------------------------------------------------------

def test_vocab_richness_replay_sf0001(spark):
    pdf = pd.read_parquet(DOCS, columns=["text"])
    cnt: Counter = Counter()
    for text in pdf["text"]:
        cnt.update(text.split())
    v, n = len(cnt), sum(cnt.values())
    f1 = sum(1 for c in cnt.values() if c == 1)
    f2 = sum(1 for c in cnt.values() if c == 2)
    row = entry.q_vocab_richness(spark, SF_DIR).collect()[0]
    assert (row["v_types"], row["n_tokens"]) == (v, n)
    assert (row["f1"], row["f2"]) == (f1, f2)
    assert row["chao1_micro"] == v * 1_000_000 + \
        (f1 * (f1 - 1) * 1_000_000) // (2 * (f2 + 1))
    assert row["gt_unseen_micro"] == (f1 * 1_000_000) // n
    # Chao1 is a lower-bound richness estimate: >= observed V
    assert row["chao1_micro"] >= v * 1_000_000


def test_vocab_richness_plan_no_python(spark):
    plan = _plan_of(entry.q_vocab_richness(spark, SF_DIR))
    assert "EvalPython" not in plan


# ---------------------------------------------------------------------------
# Kendall tau-b
# ---------------------------------------------------------------------------

def test_kendall_tau_replay_sf0001(spark):
    pdf = pd.read_parquet(DOCS, columns=["text"])
    pts = [(len(t.split()) // KT_XW, len(t) // KT_YW) for t in pdf["text"]]
    n = len(pts)
    nc = nd = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx * dy > 0:
                nc += 1
            elif dx * dy < 0:
                nd += 1
    tx = sum(t * (t - 1) // 2
             for t in Counter(x for x, _ in pts).values())
    ty = sum(t * (t - 1) // 2
             for t in Counter(y for _, y in pts).values())
    row = entry.q_kendall_tau(spark, SF_DIR).collect()[0]
    assert (row["n_docs"], row["nc"], row["nd"]) == (n, nc, nd)
    assert (row["t_x"], row["t_y"]) == (tx, ty)
    n0 = n * (n - 1) // 2
    assert row["tau_b"] == round((nc - nd)
                                 / math.sqrt((n0 - tx) * (n0 - ty)), 6)
    # token count and char count of the same text correlate positively
    assert row["tau_b"] > 0.5


# ---------------------------------------------------------------------------
# TPC-H Q4 / Q14 analogues
# ---------------------------------------------------------------------------

def _us(ts) -> int:
    return pd.Timestamp(ts).value // 1000


def test_order_priority_replay_sf0001(spark):
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    ship = defaultdict(list)
    for k, d in zip(li["l_orderkey"], li["l_shipdate"]):
        ship[int(k)].append(_us(d))
    exp: Counter = Counter()
    for _, o in orders.iterrows():
        ous = _us(o["o_orderdate"])
        if not (_Q4_LO_US <= ous < _Q4_HI_US):
            continue
        if any(s >= ous + _Q4_LATE_US for s in ship.get(int(o["o_orderkey"]), [])):
            exp[o["o_orderpriority"]] += 1
    got = {r["o_orderpriority"]: r["n_orders"]
           for r in entry.q_order_priority(spark, SF_DIR).collect()}
    assert got == dict(exp)
    assert sum(got.values()) > 0


def test_promo_share_replay_sf0001(spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_DIR}/part.parquet",
                           columns=["p_partkey", "p_type"])
    ptype = dict(zip(part["p_partkey"], part["p_type"]))
    promo = total = 0
    for _, r in li.iterrows():
        us = _us(r["l_shipdate"])
        if not (_Q14_LO_US <= us < _Q14_HI_US):
            continue
        rev = _rhalf(r["l_extendedprice"] * 100) \
            * (100 - _rhalf(r["l_discount"] * 100))
        total += rev
        if ptype[r["l_partkey"]] == "PROMO":
            promo += rev
    row = entry.q_promo_share(spark, SF_DIR).collect()[0]
    assert (row["promo_c2"], row["total_c2"]) == (promo, total)
    assert row["promo_pct"] == round(100.0 * promo / total, 6)


def test_promo_share_plan_broadcast_no_shuffle_of_fact(spark):
    """The part dimension broadcasts; the lineitem side reaches the
    join without an Exchange (map-side-only until the single-row agg)."""
    plan = _plan_of(entry.q_promo_share(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# CUSUM / Fano over the event stream
# ---------------------------------------------------------------------------

def _hourly_counts():
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts"])
    return Counter(_us(t) // 3_600_000_000 for t in ev["ts"])


def test_cusum_hours_replay_sf0001(spark):
    hours = _hourly_counts()
    xs = sorted(hours)
    n, s = len(xs), sum(hours.values())
    best = None
    p = 0
    for i, x in enumerate(xs, start=1):
        p += hours[x]
        d = n * p - i * s
        key = (-abs(d), x)
        if best is None or key < best[0]:
            best = (key, x, i, d)
    row = entry.q_cusum_hours(spark, SF_DIR).collect()[0]
    assert (row["n_hours"], row["s_tot"]) == (n, s)
    assert (row["cp_hour"], row["cp_rank"], row["d_stat"]) == best[1:]
    assert row["kappa"] == round(abs(best[3]) / (n * s), 6)


def test_fano_hours_replay_sf0001(spark):
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["ts", "event_type"])
    cell: Counter = Counter(
        (t, _us(ts) // 3_600_000_000)
        for t, ts in zip(ev["event_type"], ev["ts"]))
    xs = [x for _, x in cell]
    q = max(xs) - min(xs) + 1
    rows = {r["event_type"]: r
            for r in entry.q_fano_hours(spark, SF_DIR).collect()}
    types = {t for t, _ in cell}
    assert set(rows) == types
    for t in types:
        cs = [c for (tt, _), c in cell.items() if tt == t]
        n, sxx = sum(cs), sum(c * c for c in cs)
        r = rows[t]
        assert (r["n_events"], r["q_hours"], r["s_xx"]) == (n, q, sxx)
        assert r["vmr_num"] == q * sxx - n * n
        assert r["vmr"] == round((q * sxx - n * n) / (q * n), 6)


# ---------------------------------------------------------------------------
# rich club
# ---------------------------------------------------------------------------

def test_rich_club_replay_sf0001(spark):
    edges = {(r["a"], r["b"]) for r in
             (_domain_links(spark, SF_DIR)
              .select(F.least("src", "dst").alias("a"),
                      F.greatest("src", "dst").alias("b"))
              .where(F.col("a") != F.col("b")).distinct()).collect()}
    deg: Counter = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    got = {r["k"]: r for r in entry.q_rich_club(spark, SF_DIR).collect()}
    for k in entry.RICH_KS:
        nodes = {u for u, d in deg.items() if d > k}
        if len(nodes) < 2:
            assert k not in got
            continue
        e = sum(1 for a, b in edges if a in nodes and b in nodes)
        r = got[k]
        assert (r["n_nodes"], r["n_edges"]) == (len(nodes), e)
        assert r["phi_micro"] == (2 * e * 1_000_000) \
            // (len(nodes) * (len(nodes) - 1))


# ---------------------------------------------------------------------------
# bigram entropy
# ---------------------------------------------------------------------------

def test_bigram_entropy_replay_sf0001(spark):
    pdf = pd.read_parquet(DOCS, columns=["text"])
    cb: Counter = Counter()
    cw: Counter = Counter()
    for text in pdf["text"]:
        toks = text.split()
        for w1, w2 in zip(toks, toks[1:]):
            cb[(w1, w2)] += 1
            cw[w1] += 1
    n = sum(cb.values())
    s_cond = sum(c * _rhalf(math.log(cw[w1] / c) * 1e6)
                 for (w1, _), c in cb.items())
    n_ctx = sum(cw.values())
    s_uni = sum(c * _rhalf(math.log(n_ctx / c) * 1e6)
                for c in cw.values())
    row = entry.q_bigram_entropy(spark, SF_DIR).collect()[0]
    assert (row["n_bigrams"], row["v_bigrams"]) == (n, len(cb))
    assert row["v_contexts"] == len(cw)
    assert (row["s_cond_q"], row["s_uni_q"]) == (s_cond, s_uni)
    assert row["h_cond"] == round(s_cond / n / 1e6, 6)
    assert row["h_uni"] == round(s_uni / n / 1e6, 6)
    assert 0.0 <= row["h_cond"] and row["h_uni"] > 0.0


# ---------------------------------------------------------------------------
# TPC-H Q16 / Q18 analogues
# ---------------------------------------------------------------------------

def test_supplier_variety_replay_sf0001(spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])
    sup = pd.read_parquet(f"{SF_DIR}/supplier.parquet",
                          columns=["s_suppkey", "s_acctbal"])
    part = pd.read_parquet(f"{SF_DIR}/part.parquet",
                           columns=["p_partkey", "p_brand", "p_size"])
    bad = {int(k) for k, b in zip(sup["s_suppkey"], sup["s_acctbal"])
           if b < 0}
    pdim = {int(k): (b, int(s)) for k, b, s in
            zip(part["p_partkey"], part["p_brand"], part["p_size"])}
    combos = defaultdict(set)
    for pk, sk in set(zip(li["l_partkey"], li["l_suppkey"])):
        if int(sk) not in bad:
            combos[pdim[int(pk)]].add(int(sk))
    got = {(r["p_brand"], r["p_size"]): r["n_suppliers"]
           for r in entry.q_supplier_variety(spark, SF_DIR).collect()}
    assert got == {k: len(v) for k, v in combos.items()}


def test_big_orders_replay_sf0001(spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    qty: Counter = Counter()
    items: Counter = Counter()
    for k, q in zip(li["l_orderkey"], li["l_quantity"]):
        qty[int(k)] += _rhalf(q * 100)
        items[int(k)] += 1
    exp = {k for k, v in qty.items() if v >= entry._Q18_QTY_C}
    odim = {int(r["o_orderkey"]): (int(r["o_custkey"]),
                                   _us(r["o_orderdate"]))
            for _, r in orders.iterrows()}
    got = {r["o_orderkey"]: r
           for r in entry.q_big_orders(spark, SF_DIR).collect()}
    assert set(got) == exp
    for k in exp:
        r = got[k]
        assert (r["qty_c"], r["n_items"]) == (qty[k], items[k])
        assert (r["o_custkey"], r["o_date_us"]) == odim[k]


def test_big_orders_plan_broadcast(spark):
    plan = _plan_of(entry.q_big_orders(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
