"""First-principles checks for the session-16 queries: funnel stages
replayed by a per-user sequential scan, retention cohorts recounted
with dict/sets, label propagation replayed with Counters on both a
hand-built graph and the sf0.001 graph, MAD medians recomputed from
sorted lists."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return entry._events_micros(spark, SF_DIR).collect()


def test_funnel_matches_sequential_replay(spark):
    ev = _events(spark)
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.tm, r.event_type))
    n = [0, 0, 0]
    delay = [0, 0, 0]
    for rows in by_user.values():
        rows.sort()
        t = None
        stage = 0
        for tm, et in rows:
            if stage < 3 and et == entry.FUNNEL_STAGES[stage] and (
                    t is None or tm > t):
                n[stage] += 1
                if stage > 0:
                    delay[stage] += tm - t
                t = tm
                stage += 1
    got = {r.stage: (r.n_users, r.sum_delay_us) for r in
           entry.q_funnel_conv(spark, SF_DIR).collect()}
    assert got == {1: (n[0], 0), 2: (n[1], delay[1]), 3: (n[2], delay[2])}
    assert n[0] >= n[1] >= n[2] > 0  # a real funnel at sf0.001


def test_funnel_strictly_sequential(spark):
    # the conditional-min chain must equal the greedy first-match scan
    # (asserted above); also pin that stage counts are monotone by
    # construction: stage k+1 joins INTO stage k's survivors.
    out = {r.stage: r.n_users for r in
           entry.q_funnel_conv(spark, SF_DIR).collect()}
    assert out[1] >= out[2] >= out[3]


def test_retention_matches_replay(spark):
    ev = _events(spark)
    days = defaultdict(set)   # user -> set of active days
    for r in ev:
        days[r.user_id].add(r.tm // entry.DAY_US)
    want = Counter()
    for u, ds in days.items():
        c = min(ds)
        for d in ds:
            want[(c, d - c)] += 1
    got = {(r.cohort_day, r.offset): r.n_users for r in
           entry.q_retention_cohorts(spark, SF_DIR).collect()}
    assert got == dict(want)
    assert all(o >= 0 for _, o in got)


def _lpa_replay(edges, rounds):
    nbrs = defaultdict(list)
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    lab = {u: u for u in nbrs}
    for _ in range(rounds):
        nxt = {}
        for u, vs in nbrs.items():
            c = Counter(lab[v] for v in vs)
            top = max(c.values())
            nxt[u] = min(l for l, k in c.items() if k == top)
        lab = nxt
    return Counter(lab.values())


def test_label_prop_hand_graph(spark):
    # two triangles joined by one bridge edge: LPA with min tie-break
    # collapses each triangle to its smallest id within 2 rounds
    edges = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    want = _lpa_replay(edges, entry.LPA_ROUNDS)
    # replay through the same Spark machinery the query uses
    und = spark.createDataFrame(edges, "a long, b long")
    sym = (und.selectExpr("a as u", "b as v")
           .union(und.selectExpr("b as u", "a as v")))
    lab = sym.select("u").distinct().selectExpr("u", "u as lab")
    from pyspark.sql.window import Window
    for _ in range(entry.LPA_ROUNDS):
        cnt = (sym.join(lab.selectExpr("u as v", "lab"), "v")
               .groupBy("u", "lab").agg(F.count("*").alias("c")))
        w = Window.partitionBy("u").orderBy(F.col("c").desc(), "lab")
        lab = (cnt.withColumn("rn", F.row_number().over(w))
               .where("rn = 1").select("u", "lab"))
    got = Counter({r.lab: r.c for r in
                   lab.groupBy("lab").agg(F.count("*").alias("c"))
                   .collect()})
    assert got == want


def test_label_prop_matches_replay(spark):
    edges = [(r.a, r.b) for r in
             entry._domain_links(spark, SF_DIR)
             .selectExpr("least(src, dst) a", "greatest(src, dst) b")
             .distinct().collect()
             if (r.a * 1000003 + r.b) % entry.LPA_SAMPLE_MOD == 0]
    want = dict(_lpa_replay(edges, entry.LPA_ROUNDS))
    got = {r.community: r.n_nodes for r in
           entry.q_label_prop(spark, SF_DIR).collect()}
    assert got == want


def _lower_median(xs):
    s = sorted(xs)
    return s[(len(s) + 1) // 2 - 1]


def test_mad_outliers_matches_replay(spark):
    ev = _events(spark)
    by_type = defaultdict(list)
    for r in ev:
        by_type[r.event_type].append(r.cents)
    want = {}
    for et, xs in by_type.items():
        med = _lower_median(xs)
        devs = [abs(x - med) for x in xs]
        mad = _lower_median(devs)
        want[et] = (len(xs), med, mad,
                    sum(1 for d in devs if d > entry.MAD_K * mad))
    got = {r.event_type: (r.n, r.med_cents, r.mad_cents, r.n_outliers)
           for r in entry.q_mad_outliers(spark, SF_DIR).collect()}
    assert got == want
    assert all(v[3] < v[0] for v in got.values())
