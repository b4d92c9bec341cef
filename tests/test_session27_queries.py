"""First-principles checks for the session-27 layer: multi-touch
attribution replayed per conversion in pure Python, permutation-
entropy ordinal patterns vs a brute-force rank replay, and the
variance-time Hurst fit vs a numpy-free block-sum replay at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import __spark_entry__ as entry
from __spark_entry__ import ATTR_CONV, ATTR_WINDOW_US, HURST_SCALES

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return [(int(r.user_id), int(r.tm), int(r.event_id), r.event_type)
            for r in entry._events_micros(spark, SF_DIR).collect()]


# ---------------------------------------------------------------------------
# attribution
# ---------------------------------------------------------------------------

def test_attribution_replay(spark):
    ev = _events(spark)
    by_user = defaultdict(list)
    for u, tm, eid, t in ev:
        by_user[u].append((tm, eid, t))
    first = Counter()
    last = Counter()
    lin_credit = Counter()
    lin_convs = defaultdict(set)
    n_first = Counter()
    n_last = Counter()
    for u, rows in by_user.items():
        convs = [(tm, eid) for tm, eid, t in rows if t == ATTR_CONV]
        touches = sorted((tm, eid, t) for tm, eid, t in rows
                         if t != ATTR_CONV)
        for tc, cid in convs:
            win = [(tm, eid, t) for tm, eid, t in touches
                   if tc - ATTR_WINDOW_US <= tm < tc]
            if not win:
                continue
            n = len(win)
            f_t = win[0][2]
            l_t = win[-1][2]
            first[f_t] += 1_000_000
            n_first[f_t] += 1
            last[l_t] += 1_000_000
            n_last[l_t] += 1
            for _, _, t in win:
                lin_credit[t] += 1_000_000 // n
                lin_convs[t].add(cid)
    want = set()
    for ch, c in first.items():
        want.add(("first", ch, n_first[ch], c))
    for ch, c in last.items():
        want.add(("last", ch, n_last[ch], c))
    for ch, c in lin_credit.items():
        want.add(("linear", ch, len(lin_convs[ch]), c))
    got = {(r.model, r.channel, r.n_conv, r.credit_q)
           for r in entry.q_attribution(spark, SF_DIR).collect()}
    assert got == want
    # conservation: each model distributes ~1e6 per touched conversion
    touched = sum(n_first.values())
    assert sum(first.values()) == touched * 1_000_000
    assert sum(last.values()) == touched * 1_000_000
    assert 0 <= touched * 1_000_000 - sum(lin_credit.values()) \
        < touched * 1_000  # floor undershoot < n_touches per conv


# ---------------------------------------------------------------------------
# perm_entropy
# ---------------------------------------------------------------------------

def test_perm_entropy_replay(spark):
    ev = _events(spark)
    c = Counter(tm // 3_600_000_000 for _, tm, _, _ in ev)
    x_min, x_max = min(c), max(c)
    pat = Counter()
    for t in range(x_min, x_max - 1):
        y = [c.get(t, 0), c.get(t + 1, 0), c.get(t + 2, 0)]
        ranks = [sum(1 for j in range(3) if y[j] < y[i])
                 + sum(1 for j in range(i) if y[j] == y[i])
                 for i in range(3)]
        pat[ranks[0] * 9 + ranks[1] * 3 + ranks[2]] += 1
    nn = sum(pat.values())
    want = {}
    for p, n in pat.items():
        lq = int(round(math.log(nn / n) * 1e6))
        want[p] = (n, (n * 1_000_000) // nn, lq, n * lq)
    got = {r.pattern: (r.n, r.p_q, r.lq, r.term_q)
           for r in entry.q_perm_entropy(spark, SF_DIR).collect()}
    assert got == want
    # ranks are a permutation -> codes live in the 6 valid slots
    valid = {0 * 9 + 1 * 3 + 2, 0 * 9 + 2 * 3 + 1, 1 * 9 + 0 * 3 + 2,
             2 * 9 + 0 * 3 + 1, 1 * 9 + 2 * 3 + 0, 2 * 9 + 1 * 3 + 0}
    assert set(got) <= valid


# ---------------------------------------------------------------------------
# hurst_var
# ---------------------------------------------------------------------------

def test_hurst_var_replay(spark):
    ev = _events(spark)
    c = Counter(tm // 3_600_000_000 for _, tm, _, _ in ev)
    x_min, x_max = min(c), max(c)
    spine = [c.get(t, 0) for t in range(x_min, x_max + 1)]
    uv = []
    for m in HURST_SCALES:
        kb = len(spine) // m
        ys = [sum(spine[i * m:(i + 1) * m]) for i in range(kb)]
        varnum = kb * sum(y * y for y in ys) - sum(ys) ** 2
        if varnum > 0:
            v_q = (varnum * 1000) // (kb * kb)
            uv.append((int(round(math.log(m) * 1e6)),
                       int(round(math.log(v_q / 1e3) * 1e6))))
    n = len(uv)
    su = sum(u for u, _ in uv)
    sv = sum(v for _, v in uv)
    suuq = sum((u * u) // 1_000_000 for u, _ in uv)
    suvq = sum((u * v) // 1_000_000 for u, v in uv)
    slope = round((n * (suvq * 1e6) - su * sv)
                  / (n * (suuq * 1e6) - su * su), 6)
    r = entry.q_hurst_var(spark, SF_DIR).collect()[0]
    assert (r.n_pts, r.su, r.sv, r.suuq, r.suvq) == (n, su, sv, suuq, suvq)
    assert r.slope == slope
    assert r.hurst == round(r.slope / 2.0, 6)
    # block-sum variance must grow with scale for a non-degenerate
    # series -> slope positive, H in (0, 1.5) loosely
    assert 0.0 < r.hurst < 1.5
