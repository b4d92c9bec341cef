"""First-principles checks for the session-17 queries: the trailing
24h range frame replayed with a two-pointer scan, and the Markov
transition matrix recounted from sorted per-user sequences."""

from __future__ import annotations

from collections import Counter, defaultdict

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return entry._events_micros(spark, SF_DIR).collect()


def test_rolling_stats_matches_two_pointer(spark):
    ev = _events(spark)
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.tm, r.event_id, r.cents))
    want = {}
    for rows in by_user.values():
        rows.sort()
        lo = 0
        n, s = 0, 0
        for hi, (tm, eid, cents) in enumerate(rows):
            n += 1
            s += cents
            while rows[lo][0] < tm - entry.ROLL_WIN_US:
                n -= 1
                s -= rows[lo][2]
                lo += 1
            # RANGE frame includes PEERS at the same tm beyond hi
            j, pn, ps = hi + 1, 0, 0
            while j < len(rows) and rows[j][0] == tm:
                pn += 1
                ps += rows[j][2]
                j += 1
            want[eid] = (n + pn, s + ps)
    got = {r.event_id: (r.n_24h, r.cents_24h) for r in
           entry.q_rolling_stats(spark, SF_DIR).collect()}
    assert got == want
    assert max(v[0] for v in got.values()) > 1  # frames really extend


def test_event_transitions_matches_replay(spark):
    ev = _events(spark)
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.tm, r.event_id, r.event_type))
    cnt = Counter()
    for rows in by_user.values():
        rows.sort()
        for a, b in zip(rows, rows[1:]):
            cnt[(a[2], b[2])] += 1
    row_tot = Counter()
    for (f, _), c in cnt.items():
        row_tot[f] += c
    want = {(f, t): (c, (1_000_000 * c) // row_tot[f])
            for (f, t), c in cnt.items()}
    got = {(r.from_type, r.to_type): (r.n, r.p_micro) for r in
           entry.q_event_transitions(spark, SF_DIR).collect()}
    assert got == want
    # each row of the transition matrix sums to ~1e6 (floor rounding)
    sums = Counter()
    for (f, _), (_, p) in got.items():
        sums[f] += p
    assert all(1_000_000 - 5 <= s <= 1_000_000 for s in sums.values())
