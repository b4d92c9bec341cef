"""First-principles checks for the session-24 layer: the anti-diagonal
DP kernel (DTW + discrete Fréchet) against brute-force recursion and
pure-Python replays at sf0.001, HyperANF register rounds replayed with
dict merges, and the dyadic-EWMA burst screen replayed from hourly
counts."""

from __future__ import annotations

import math
from collections import defaultdict
from functools import lru_cache

import numpy as np
import pandas as pd

import __spark_entry__ as entry
from __spark_entry__ import (ANF_M, ANF_NUMQ, ANF_RHO_MAX, ANF_ROUNDS,
                             ANF_SEED, EWMA_BURST_Q, EWMA_K, FR_DOM_HI,
                             FR_DOM_LO, FR_LEN, N_DOMAINS)
from proj_spark.seqalign import dp_batch

SF_DIR = "/root/testdata/sf0.001"

_M31, _K1, _K2 = 2_147_483_648, 2_654_435_761, 40_503


def _hash31_py(x: int) -> int:
    h = (x % _M31) * _K1 % _M31
    h ^= h >> 16
    h = h * _K2 % _M31
    h ^= h >> 16
    return h * _K1 % _M31


# ---------------------------------------------------------------------------
# kernel vs brute-force recursion
# ---------------------------------------------------------------------------

def _brute(cost, kind):
    la, lb = cost.shape

    @lru_cache(maxsize=None)
    def dp(i, j):
        c = int(cost[i][j])
        if i == 0 and j == 0:
            return c
        cands = []
        if i > 0:
            cands.append(dp(i - 1, j))
        if j > 0:
            cands.append(dp(i, j - 1))
        if i > 0 and j > 0:
            cands.append(dp(i - 1, j - 1))
        m = min(cands)
        return c + m if kind == "dtw" else max(c, m)

    return dp(la - 1, lb - 1)


def test_dp_batch_matches_bruteforce():
    rng = np.random.default_rng(7)
    for kind in ("dtw", "frechet"):
        # variable lengths in one batch, padded cost cells are garbage
        lens = [(1, 1), (1, 7), (5, 3), (8, 8), (6, 2)]
        A = max(a for a, _ in lens)
        B = max(b for _, b in lens)
        cost = rng.integers(0, 10 ** 6, size=(len(lens), A, B))
        la = np.array([a for a, _ in lens])
        lb = np.array([b for _, b in lens])
        got = dp_batch(cost.astype(np.int64), la, lb, kind)
        for p, (a, b) in enumerate(lens):
            assert got[p] == _brute(cost[p, :a, :b], kind), (kind, p)


def test_dp_hand_cases():
    # DTW of identical series is 0; Fréchet of identical paths is 0
    c = np.zeros((1, 3, 3), dtype=np.int64)
    for k in ("dtw", "frechet"):
        assert dp_batch(c, np.array([3]), np.array([3]), k)[0] == 0
    # classic 1-D DTW hand case: a=[1,3,2], b=[2,2,4] -> 4
    a, b = np.array([1, 3, 2]), np.array([2, 2, 4])
    cost = np.abs(a[:, None] - b[None, :])[None, :, :].astype(np.int64)
    assert dp_batch(cost, np.array([3]), np.array([3]), "dtw")[0] == 4
    # Fréchet must walk monotonically: paths x=[0,10,0] vs x=[0,10,0]
    # reversed give max-step 10 even though point sets are equal
    ax = np.array([0, 10, 0])
    bx = np.array([10, 0, 10])
    cost = ((ax[:, None] - bx[None, :]) ** 2)[None, :, :].astype(np.int64)
    assert dp_batch(cost, np.array([3]), np.array([3]), "frechet")[0] == 100


# ---------------------------------------------------------------------------
# dtw_days
# ---------------------------------------------------------------------------

def test_dtw_days_replay(spark):
    ev = entry._events_micros(spark, SF_DIR).collect()
    cnt = defaultdict(int)
    for r in ev:
        cnt[(r.event_type, r.tm // 86_400_000_000)] += 1
    days = sorted({d for _, d in cnt})
    types = sorted({t for t, _ in cnt})
    ser = {t: [cnt.get((t, d), 0) for d in days] for t in types}
    got = {(r.type_a, r.type_b): (r.n_days, r.dtw)
           for r in entry.q_dtw_days(spark, SF_DIR).collect()}
    assert len(got) == len(types) * (len(types) - 1) // 2
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            a, b = ser[ta], ser[tb]
            cost = np.abs(np.array(a)[:, None]
                          - np.array(b)[None, :]).astype(np.int64)
            want = _brute(cost, "dtw")
            assert got[(ta, tb)] == (len(days), want), (ta, tb)


# ---------------------------------------------------------------------------
# frechet_paths
# ---------------------------------------------------------------------------

def _paths(spark):
    pts = entry._points(spark, SF_DIR).collect()
    rows = []
    for r in pts:
        dom = int(r.domain)
        if FR_DOM_LO <= dom <= FR_DOM_HI:
            pid = int(r.url.rsplit("/", 1)[1])
            rows.append((dom, pid, round(r.lon * 1e6), round(r.lat * 1e6)))
    by = defaultdict(list)
    for dom, pid, x, y in sorted(rows):
        if len(by[dom]) < FR_LEN:
            by[dom].append((x, y))
    return by


def test_frechet_paths_replay(spark):
    by = _paths(spark)
    doms = sorted(by)
    got = {(r.dom_a, r.dom_b): (r.len_a, r.len_b, r.frechet_udeg)
           for r in entry.q_frechet_paths(spark, SF_DIR).collect()}
    assert len(got) == len(doms) * (len(doms) - 1) // 2
    for i, da in enumerate(doms):
        for db in doms[i + 1:]:
            pa, pb = by[da], by[db]
            cost = np.array([[(ax - bx) ** 2 + (ay - by_) ** 2
                              for bx, by_ in pb] for ax, ay in pa],
                            dtype=np.int64)
            want = _brute(cost, "frechet")
            la, lb, f = got[(da, db)]
            assert (la, lb) == (len(pa), len(pb))
            assert f == round(math.sqrt(want), 3), (da, db)


def test_frechet_dominates_directed_hausdorff(spark):
    """F(A,B) >= max-min in either direction (the coupling constraint
    can only increase the max step)."""
    by = _paths(spark)
    doms = sorted(by)
    got = {(r.dom_a, r.dom_b): r.frechet_udeg
           for r in entry.q_frechet_paths(spark, SF_DIR).collect()}
    for i, da in enumerate(doms):
        for db in doms[i + 1:]:
            h2 = 0
            for pa, pb in ((by[da], by[db]), (by[db], by[da])):
                for ax, ay in pa:
                    h2 = max(h2, min((ax - bx) ** 2 + (ay - by_) ** 2
                                     for bx, by_ in pb))
            assert got[(da, db)] >= round(math.sqrt(h2), 3) - 1e-9


# ---------------------------------------------------------------------------
# hyperanf
# ---------------------------------------------------------------------------

def test_hyperanf_replay(spark):
    pts = entry._points(spark, SF_DIR).collect()
    edges = set()
    for r in pts:
        src = int(r.domain)
        pid = int(r.url.rsplit("/", 1)[1])
        h = pid * 2654435761 % 2147483648
        for dst in ((h // 131) % N_DOMAINS, (h // 17) % N_DOMAINS):
            if dst != src:
                edges.add((src, dst))
    regs = {}
    for v in range(N_DOMAINS):
        h = _hash31_py(v + ANF_SEED)
        regs[v] = {h % ANF_M: ANF_RHO_MAX if h // ANF_M == 0
                   else ANF_RHO_MAX - (h // ANF_M).bit_length()}

    def summarize(rd):
        reg_rows = sum(len(m) for m in regs.values())
        sum_rho = sum(sum(m.values()) for m in regs.values())
        nf = 0
        for m in regs.values():
            s = sum(1 << (ANF_RHO_MAX - rho) for rho in m.values()) \
                + (ANF_M - len(m)) * (1 << ANF_RHO_MAX)
            nf += math.floor(float(ANF_NUMQ) / float(s))
        return (rd, reg_rows, sum_rho, nf)

    want = [summarize(0)]
    for rd in range(1, ANF_ROUNDS + 1):
        new = {v: dict(regs[v]) for v in range(N_DOMAINS)}
        # propagate along edges: node v absorbs registers of its
        # out-neighbors (see q_hyperanf: src absorbs dst's registers)
        for s, d in edges:
            for b, rho in regs[d].items():
                if new[s].get(b, -1) < rho:
                    new[s][b] = rho
        regs = new
        want.append(summarize(rd))
    got = sorted((r.round, r.reg_rows, r.sum_rho, r.nf_milli)
                 for r in entry.q_hyperanf(spark, SF_DIR).collect())
    assert got == want


def test_hyperanf_monotone(spark):
    rows = sorted(entry.q_hyperanf(spark, SF_DIR).collect(),
                  key=lambda r: r.round)
    assert len(rows) == ANF_ROUNDS + 1
    for a, b in zip(rows, rows[1:]):
        # register mass and the neighborhood estimate only grow
        assert b.reg_rows >= a.reg_rows
        assert b.sum_rho >= a.sum_rho
        assert b.nf_milli >= a.nf_milli


# ---------------------------------------------------------------------------
# ewma_hours
# ---------------------------------------------------------------------------

def test_ewma_hours_replay(spark):
    ev = entry._events_micros(spark, SF_DIR).collect()
    cnt = defaultdict(int)
    for r in ev:
        cnt[r.tm // 3_600_000_000] += 1
    lo, hi = min(cnt), max(cnt)
    wsum = (1 << EWMA_K) - 1
    want = {}
    for x in sorted(cnt):
        if not (lo + EWMA_K <= x <= hi):
            continue
        num = sum(cnt.get(x - k, 0) << (EWMA_K - k)
                  for k in range(1, EWMA_K + 1))
        ratio = (cnt[x] * wsum * 1_000_000) // num if num > 0 else None
        want[x] = (cnt[x], num, ratio,
                   num > 0 and ratio >= EWMA_BURST_Q)
    got = {r.x: (r.y, r.num, r.ratio_q, r.burst)
           for r in entry.q_ewma_hours(spark, SF_DIR).collect()}
    assert got == want
    assert len(got) > 0
