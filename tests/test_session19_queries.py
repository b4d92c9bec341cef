"""First-principles checks for the session-19 point-pattern layer:
standard deviational ellipse, bounded-radius NN distance (nn_dist),
and the Clark-Evans / G-function summary — hand cases plus pure-Python
replays at sf0.001."""

from __future__ import annotations

import contextlib
import io
import math

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from proj_spark.pages import synth_points
from proj_spark.spatial.knn import knn_self_join, nn_dist
from proj_spark.spatial.stats import (_RAD2DEG, _SDE_USHIFT, _SDE_VSHIFT,
                                      std_ellipse)

SF_DIR = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _udeg(v: float) -> int:
    # Spark ROUND(x, 0) is HALF_UP (away from zero)
    return int(v * 1e6 + 0.5) if v >= 0 else -int(-v * 1e6 + 0.5)


def _replay_ellipse(rows):
    """Pure-Python replay of std_ellipse's exact-integer statistics."""
    by_dom: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        by_dom.setdefault(r.domain, []).append(
            (_udeg(r.lon) + 180_000_000, _udeg(r.lat) + 90_000_000))
    out = {}
    for dom, pts in by_dom.items():
        n = len(pts)
        cx, cy = sum(x for x, _ in pts) // n, sum(y for _, y in pts) // n
        su = sv = suuq = svvq = suvq = 0
        for x, y in pts:
            u, v = x - cx + _SDE_USHIFT, y - cy + _SDE_VSHIFT
            su += u
            sv += v
            suuq += (u * u) // 1_000_000
            svvq += (v * v) // 1_000_000
            suvq += (u * v) // 1_000_000
        nd = float(n)
        mu, mv = su / nd, sv / nd
        cxx = suuq / nd * 1e6 - mu * mu
        cyy = svvq / nd * 1e6 - mv * mv
        cxy = suvq / nd * 1e6 - mu * mv
        disc = math.sqrt((cxx - cyy) * (cxx - cyy) + 4.0 * cxy * cxy)
        out[dom] = dict(
            n_pages=n, cx_udeg=cx - 180_000_000, cy_udeg=cy - 90_000_000,
            suuq=suuq, svvq=svvq, suvq=suvq,
            theta_deg=math.atan2(2.0 * cxy, cxx - cyy) / 2.0 * _RAD2DEG,
            sig_maj=math.sqrt(max((cxx + cyy + disc) / 2.0, 0.0)),
            sig_min=math.sqrt(max((cxx + cyy - disc) / 2.0, 0.0)))
    return out


def test_std_ellipse_replay_sf0001(spark):
    pts = entry._points(spark, SF_DIR)
    want = _replay_ellipse(pts.collect())
    got = entry.q_std_ellipse(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        w = want[r.domain]
        assert (r.n_pages, r.cx_udeg, r.cy_udeg) == (
            w["n_pages"], w["cx_udeg"], w["cy_udeg"])
        assert (r.suuq, r.svvq, r.suvq) == (w["suuq"], w["svvq"], w["suvq"])
        # doubles: same parenthesization, compare to one rounding step
        assert r.theta_deg == pytest.approx(w["theta_deg"], abs=2e-4)
        assert r.sig_maj_udeg == pytest.approx(w["sig_maj"], abs=0.02)
        assert r.sig_min_udeg == pytest.approx(w["sig_min"], abs=0.02)


def _ellipse_of(spark, coords):
    df = spark.createDataFrame([("d", lo, la) for lo, la in coords],
                               "domain string, lon double, lat double")
    return std_ellipse(df).collect()[0]


def test_std_ellipse_ns_line(spark):
    r = _ellipse_of(spark, [(10.0, la / 10.0) for la in range(11)])
    # scatter is purely north-south: major axis along v => theta = +/-90
    assert abs(abs(r.theta_deg) - 90.0) < 1e-3
    assert r.sig_min_udeg < 1.0
    assert r.sig_maj_udeg > 100_000  # ~0.316 deg std in udeg


def test_std_ellipse_ew_line(spark):
    r = _ellipse_of(spark, [(lo / 10.0, -5.0) for lo in range(11)])
    assert abs(r.theta_deg) < 1e-3
    assert r.sig_min_udeg < 1.0


def test_std_ellipse_symmetric_cross(spark):
    cross = [(1.0, 0.0), (-1.0, 0.0), (0.0, 1.0), (0.0, -1.0)]
    r = _ellipse_of(spark, [(50.0 + u, 20.0 + v) for u, v in cross])
    # cxx == cyy, cxy == 0 -> degenerate (circular) ellipse
    assert r.sig_maj_udeg == pytest.approx(r.sig_min_udeg, abs=0.05)


def test_std_ellipse_two_shuffles_only(spark):
    pts = synth_points(spark, 1000)
    plan = _plan_of(std_ellipse(pts))
    shuffles = [ln for ln in plan.splitlines()
                if ln.strip().startswith("(") and ln.strip().endswith(") Exchange")]
    assert len(shuffles) <= 2  # centroid agg + moment agg
    assert "BroadcastHashJoin" in plan


def test_nn_dist_matches_knn_k1(spark):
    pts = synth_points(spark, 2000).persist()
    try:
        nn = {r.url: r.nn_m for r in
              nn_dist(pts, z=10, ring=1, id_col="url").collect()}
        k1 = knn_self_join(pts, k=1, z=10, ring=1, id_col="url").collect()
        assert set(nn) == {r.url for r in k1}
        for r in k1:
            assert nn[r.url] == pytest.approx(r.dist_m, rel=1e-12)
    finally:
        pts.unpersist()


def test_nn_dist_plan_has_no_window(spark):
    pts = synth_points(spark, 500)
    plan = _plan_of(nn_dist(pts, z=10, ring=1, id_col="url"))
    assert "Window" not in plan
    assert "HashAggregate" in plan  # partial+final MIN


def test_nn_dist_isolated_point_absent(spark):
    df = spark.createDataFrame(
        [("a", 0.0, 0.0), ("b", 0.01, 0.0), ("c", 90.0, 45.0)],
        "url string, lon double, lat double")
    rows = nn_dist(df, z=10, ring=1, id_col="url").collect()
    assert {r.url for r in rows} == {"a", "b"}
    d = {r.url: r.nn_m for r in rows}
    assert d["a"] == pytest.approx(d["b"], rel=1e-12)
    # 0.01 deg of arc on the R=6371008.8 sphere
    assert d["a"] == pytest.approx(1111.95, rel=1e-3)


def test_clark_evans_replay_sf0001(spark):
    pts = entry._points(spark, SF_DIR)
    nn = nn_dist(pts, z=entry.KNNJ_Z, ring=1, id_col="url").collect()
    mm = [int(r.nn_m * 1000 + 0.5) for r in nn]
    b1, b2, b3 = entry.CE_BINS_MM
    n_pts = pts.count()
    row = entry.q_clark_evans(spark, SF_DIR).collect()[0]
    assert row.n_pts == n_pts
    assert row.n_nn == len(mm)
    assert row.sum_mm == sum(mm)
    assert row.n_le_100m == sum(1 for v in mm if v <= b1)
    assert row.n_le_1km == sum(1 for v in mm if v <= b2)
    assert row.n_le_5km == sum(1 for v in mm if v <= b3)
    mean_m = (sum(mm) / len(mm)) / 1000.0
    re_m = 0.5 * math.sqrt(entry.CE_AREA_M2 / n_pts)
    assert row.mean_nn_m == pytest.approx(mean_m, abs=2e-6)
    assert row.r_index == pytest.approx(mean_m / re_m, abs=2e-6)
    # the synthetic corpus is city-clustered: strongly aggregated
    assert row.r_index < 1.0


def _udeg_xy(r):
    return _udeg(r.lon), _udeg(r.lat)


def test_cross_k_replay_sf0001(spark):
    rows = entry._points(spark, SF_DIR).collect()
    pts = [(_udeg_xy(r), r.lang) for r in rows]
    n_tot = len(pts)
    nl: dict[str, int] = {}
    for _, lang in pts:
        nl[lang] = nl.get(lang, 0) + 1
    per: dict[tuple[int, str, str], int] = {}
    all_s: dict[int, int] = {}
    S = entry.RIPLEY_SCALES[-1]
    for i in range(n_tot):
        (xi, yi), li = pts[i]
        for j in range(i + 1, n_tot):
            (xj, yj), lj = pts[j]
            d = max(abs(xi - xj), abs(yi - yj))
            if d > S:
                continue
            la, lb = min(li, lj), max(li, lj)
            for s in entry.RIPLEY_SCALES:
                if d <= s:
                    per[(s, la, lb)] = per.get((s, la, lb), 0) + 1
                    all_s[s] = all_s.get(s, 0) + 1
    got = entry.q_cross_k(spark, SF_DIR).collect()
    seen = set()
    for r in got:
        key = (r.scale_udeg, r.lang_a, r.lang_b)
        assert r.lang_a < r.lang_b
        assert r.n_cross == per[key]
        assert r.n_pairs_all == all_s[r.scale_udeg]
        assert (r.n_a, r.n_b, r.n_total) == (nl[r.lang_a], nl[r.lang_b], n_tot)
        want_cq = (r.n_cross * (float(n_tot) * (n_tot - 1.0))) / (
            r.n_pairs_all * (2.0 * r.n_a * r.n_b))
        assert r.cq == pytest.approx(want_cq, abs=2e-6)
        seen.add(key)
    # every cross-language key the replay found must be present
    assert seen == {k for k in per if k[1] != k[2]}


def test_cross_k_hand_case(spark):
    # two tight clusters: en+de co-located, fr far away alone =>
    # (de,en) colocates (cq > 1); (en,fr)/(de,fr) have no cross pairs
    data = ([("a%d" % i, "en", 10.0 + i * 1e-4, 50.0) for i in range(5)]
            + [("b%d" % i, "de", 10.0 + i * 1e-4, 50.001) for i in range(5)]
            + [("c%d" % i, "fr", 120.0 + i * 1e-4, -30.0) for i in range(5)])
    df = spark.createDataFrame(data, "url string, lang string, lon double, lat double")
    import __spark_entry__ as e
    import unittest.mock as mock
    pts = df.withColumn("url", F.concat(F.lit("https://x/page/"),
                                        F.monotonically_increasing_id()))
    with mock.patch.object(e, "_points", lambda spark, sf_dir: pts):
        out = {(r.scale_udeg, r.lang_a, r.lang_b): r
               for r in e.q_cross_k(spark, "ignored").collect()}
    big = e.RIPLEY_SCALES[-1]
    r = out[(big, "de", "en")]
    assert r.n_cross == 25  # every de-en pair is within 100k udeg
    assert r.cq > 1.0
    assert (big, "en", "fr") not in out  # no cross pairs at any scale


def test_kulldorff_hand_case(spark):
    from proj_spark.spatial.stats import kulldorff_scan
    # two far-apart cells: all 10 cases sit in cell A (n=20), cell B is
    # case-free baseline (n=80).  Only A-centered zones can qualify.
    counts = spark.createDataFrame(
        [(10, 10, 20, 10), (40, 40, 80, 0)],
        "tx long, ty long, n long, c long")
    rows = kulldorff_scan(counts, top_k=5, max_r=2).collect()
    assert rows, "the case-concentrated cell must qualify"
    top = rows[0]
    assert (top.cx, top.cy) == (10, 10)
    assert (top.n_zone, top.c_zone, top.n_tot, top.c_tot) == (20, 10, 100, 10)
    assert top.excess == 10 * 100 - 10 * 20  # c*N - C*n = 800
    # c_zone == c_tot -> single-term LLR = c * ln(c/E), E = C*n/N = 2
    want = 10 * math.log(10 / 2.0)
    assert top.llr == pytest.approx(want, abs=2e-4)
    # every returned zone must center on an occupied cell
    assert {(r.cx, r.cy) for r in rows} <= {(10, 10), (40, 40)}


def test_lang_scan_replay_sf0001(spark):
    from proj_spark.spatial.knn import _tile_x, _tile_y
    rows = entry._points(spark, SF_DIR).collect()
    cl: dict[tuple[int, int], list[int]] = {}
    for r in rows:
        k = (_tile_x(r.lon, entry.SCAN_Z), _tile_y(r.lat, entry.SCAN_Z))
        v = cl.setdefault(k, [0, 0])
        v[0] += 1
        v[1] += int(r.lang == entry.SCAN_LANG)
    n_tot = sum(v[0] for v in cl.values())
    c_tot = sum(v[1] for v in cl.values())
    zones = {}
    for (tx, ty) in cl:  # occupied centers only
        for rr in range(3):
            nz = cz = 0
            for (bx, by), (bn, bc) in cl.items():
                if max(abs(bx - tx), abs(by - ty)) <= rr:
                    nz += bn
                    cz += bc
            if cz * n_tot > c_tot * nz and nz < n_tot:
                zones[(tx, ty, rr)] = (nz, cz, cz * n_tot - c_tot * nz)
    want = sorted(zones.items(), key=lambda kv: (-kv[1][2],) + kv[0])
    want = want[:entry.SCAN_TOPK]
    got = entry.q_lang_scan(spark, SF_DIR).collect()
    assert [(r.cx, r.cy, r.r) for r in got] == [k for k, _ in want]
    for r, (k, (nz, cz, ex)) in zip(got, want):
        assert (r.n_zone, r.c_zone, r.excess) == (nz, cz, ex)
        e = (c_tot * float(nz)) / n_tot
        t1 = cz * math.log(cz / e)
        llr = t1 if cz == c_tot else t1 + (c_tot - cz) * math.log(
            (c_tot - cz) / (c_tot - e))
        assert r.llr == pytest.approx(llr, abs=2e-4)


def test_quadrat_replay_sf0001(spark):
    from proj_spark.spatial.knn import _tile_x, _tile_y
    rows = entry._points(spark, SF_DIR).collect()
    counts: dict[tuple[int, int], int] = {}
    for r in rows:
        k = (_tile_x(r.lon, entry.QUADRAT_Z), _tile_y(r.lat, entry.QUADRAT_Z))
        counts[k] = counts.get(k, 0) + 1
    q = 1 << (2 * entry.QUADRAT_Z)
    n = sum(counts.values())
    ssq = sum(v * v for v in counts.values())
    got = entry.q_quadrat(spark, SF_DIR).collect()[0]
    assert (got.n_quadrats, got.n_occupied, got.n_pts, got.sum_sq) == (
        q, len(counts), n, ssq)
    assert got.chi2_num == q * ssq - n * n
    chi2 = (q * ssq - n * n) / float(n)
    assert got.chi2 == pytest.approx(chi2, abs=2e-6)
    assert got.vmr == pytest.approx(chi2 / (q - 1), abs=2e-6)
    # city-clustered corpus: far from CSR
    assert got.vmr > 10.0


def test_city_decay_consistency(spark):
    # buckets must partition each city's pages and match reverse_geocode
    decay = entry.q_city_decay(spark, SF_DIR).collect()
    rg = {r.city_id: r.n_pages
          for r in entry.q_reverse_geocode(spark, SF_DIR).collect()}
    per_city: dict[int, int] = {}
    for r in decay:
        assert 0 <= r.bucket <= len(entry.DECAY_BINS_M)
        per_city[r.city_id] = per_city.get(r.city_id, 0) + r.n_pages
    assert per_city == rg
    # ~70% of pages are city-clustered with ~1 deg jitter (~110 km),
    # so the <=200 km annuli hold the majority of the corpus
    inner = sum(r.n_pages for r in decay if r.bucket <= 7)
    total = sum(r.n_pages for r in decay)
    assert total == 6000
    assert inner > total * 0.5


def test_source_mix_replay_sf0001(spark):
    docs = entry._docs(spark, SF_DIR).collect()
    per: dict[str, int] = {}
    for d in docs:
        per[d.source] = per.get(d.source, 0) + 1
    sq = {s: int(math.sqrt(float(n)) * 1e6 + 0.5) for s, n in per.items()}
    s_tot = sum(sq.values())
    got = entry.q_source_mix(spark, SF_DIR).collect()
    assert {r.source for r in got} == set(per)
    for r in got:
        assert r.n_docs == per[r.source]
        assert r.s_q == sq[r.source]
        assert r.s_tot == s_tot
        assert r.w == pytest.approx(sq[r.source] / s_tot, abs=2e-9)
        assert r.epoch_docs == (entry.MIX_BUDGET * sq[r.source]) // s_tot
    # allocation never exceeds the budget (floor division)
    assert sum(r.epoch_docs for r in got) <= entry.MIX_BUDGET
    # sqrt temperature flattens: every weight strictly between the
    # proportional share and the uniform share ordering-wise
    tot_docs = sum(per.values())
    for r in got:
        prop = per[r.source] / tot_docs
        if prop < 1.0 / len(per):
            assert r.w > prop * 0.999  # upweighted tail
        elif prop > 1.0 / len(per):
            assert r.w < prop * 1.001  # downweighted head


def test_seq_pack_replay_sf0001(spark):
    rows = entry._docs(spark, SF_DIR).collect()
    per: dict[str, list] = {}
    for d in rows:
        per.setdefault(d.source, []).append((d.doc_id, len(d.text.split())))
    L = entry.SEQ_LEN
    got = {r.source: r for r in entry.q_seq_pack(spark, SF_DIR).collect()}
    assert set(got) == set(per)
    for s, docs in per.items():
        docs.sort()
        cum = 0
        nb = ne = 0
        for _, tok in docs:
            start, cum = cum, cum + tok
            if tok == 0:
                ne += 1
            elif start // L != (cum - 1) // L:
                nb += 1
        r = got[s]
        assert (r.n_docs, r.n_tokens, r.n_empty, r.n_boundary) == (
            len(docs), cum, ne, nb)
        nw = (cum + L - 1) // L
        assert r.n_windows == nw
        assert r.fill_ratio == pytest.approx(cum / (L * float(nw)), abs=2e-6)


def test_domain_entropy_replay_sf0001(spark):
    from proj_spark.spatial.knn import _tile_x, _tile_y
    rows = entry._points(spark, SF_DIR).collect()
    per: dict[str, dict[tuple[int, int], int]] = {}
    for r in rows:
        k = (_tile_x(r.lon, entry.ENTROPY_Z), _tile_y(r.lat, entry.ENTROPY_Z))
        per.setdefault(r.domain, {})
        per[r.domain][k] = per[r.domain].get(k, 0) + 1
    got = entry.q_domain_entropy(spark, SF_DIR).collect()
    assert len(got) == len(per)
    for r in got:
        cellmap = per[r.domain]
        n = sum(cellmap.values())
        s_eq = sum(int(c * math.log(c) * 1e6 + 0.5) for c in cellmap.values())
        assert (r.n_cells, r.n_pages, r.s_eq) == (len(cellmap), n, s_eq)
        want = math.log(float(n)) - (s_eq / 1e6) / n
        assert r.entropy_nats == pytest.approx(want, abs=2e-6)
        # bounds: 0 <= H <= ln(n_cells) (+ quantization slack)
        assert -1e-6 <= r.entropy_nats <= math.log(r.n_cells) + 1e-4
    # single-cell domains must be exactly zero entropy
    for r in got:
        if r.n_cells == 1:
            assert r.entropy_nats == 0.0


def test_tile_gini_replay_sf0001(spark):
    from proj_spark.spatial.knn import _tile_x, _tile_y
    rows = entry._points(spark, SF_DIR).collect()
    counts: dict[tuple[int, int], int] = {}
    for r in rows:
        k = (_tile_x(r.lon, entry.GINI_Z), _tile_y(r.lat, entry.GINI_Z))
        counts[k] = counts.get(k, 0) + 1
    xs = sorted((x, tx, ty) for (tx, ty), x in counts.items())
    n = len(xs)
    tot = sum(x for x, _, _ in xs)
    s_ix = sum((i + 1) * x for i, (x, _, _) in enumerate(xs))
    got = entry.q_tile_gini(spark, SF_DIR).collect()[0]
    assert (got.n_cells, got.n_pages, got.s_ix) == (n, tot, s_ix)
    assert got.gini_num == 2 * s_ix - (n + 1) * tot
    assert got.gini == pytest.approx(got.gini_num / (n * float(tot)), abs=2e-6)
    # a city-clustered corpus is highly unequal across tiles
    assert got.gini > 0.5


def _fit_replay(uv):
    n = len(uv)
    su = sum(u for u, _ in uv)
    sv = sum(v for _, v in uv)
    suuq = sum((u * u) // 1_000_000 for u, _ in uv)
    suvq = sum((u * v) // 1_000_000 for u, v in uv)
    num = n * (float(suvq) * 1e6) - float(su) * float(sv)
    den = n * (float(suuq) * 1e6) - float(su) * float(su)
    m = num / den
    b = (sv - m * su) / n / 1e6
    return n, su, sv, suuq, suvq, m, b


def _qlog(x: float) -> int:
    return int(math.log(x) * 1e6 + 0.5)


def test_zipf_fit_replay_sf0001(spark):
    docs = entry._docs(spark, SF_DIR).collect()
    counts: dict[str, int] = {}
    for d in docs:
        for t in d.text.split():
            counts[t] = counts.get(t, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:entry.ZIPF_K]
    uv = [(_qlog(i + 1), _qlog(c)) for i, (_, c) in enumerate(top)]
    n, su, sv, suuq, suvq, m, b = _fit_replay(uv)
    got = entry.q_zipf_fit(spark, SF_DIR).collect()[0]
    assert (got.n_pts, got.su, got.sv, got.suuq, got.suvq) == (
        n, su, sv, suuq, suvq)
    assert got.slope == pytest.approx(m, abs=2e-6)
    assert got.intercept == pytest.approx(b, abs=2e-6)
    # the synthetic token distribution is flatter than natural text
    # but still strictly decreasing in rank
    assert got.slope < -0.05


def test_degree_fit_replay_sf0001(spark):
    edges = {(r.src, r.dst) for r in
             entry._domain_links(spark, SF_DIR).collect()}
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    dist: dict[int, int] = {}
    for d in deg.values():
        dist[d] = dist.get(d, 0) + 1
    uv = [(_qlog(d), _qlog(nd)) for d, nd in dist.items()]
    n, su, sv, suuq, suvq, m, b = _fit_replay(uv)
    got = entry.q_degree_fit(spark, SF_DIR).collect()[0]
    assert (got.n_pts, got.su, got.sv, got.suuq, got.suvq) == (
        n, su, sv, suuq, suvq)
    assert (got.n_nodes, got.n_edges) == (len(deg), sum(deg.values()))
    assert got.slope == pytest.approx(m, abs=2e-6)
    assert got.intercept == pytest.approx(b, abs=2e-6)
