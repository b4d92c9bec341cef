"""First-principles checks for the session-20 layer: DSIR importance
resampling (hashed n-gram log-ratio weights) — pure-Python replays of
the string fold / bucket mix and the exact-integer weight sum, plus a
plan audit (no Python eval nodes, broadcast bucket table)."""

from __future__ import annotations

import contextlib
import io
import math

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

from proj_spark.text.curation import (_FOLD_P, dsir_weights, str_bucket,
                                      str_fold)

_M, _K1, _K2 = 2_147_483_648, 2_654_435_761, 40_503


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _py_fold(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % _FOLD_P
    return h


def _py_bucket(s: str, n_buckets: int) -> int:
    h = _py_fold(s) % _M * _K1 % _M
    h ^= h // 65536
    h = h * _K2 % _M
    h ^= h // 65536
    h = h * _K1 % _M
    return h % n_buckets


def _rhalf(v: float) -> int:
    """round-half-away-from-zero, the ROUND(x, 0) both engines use."""
    return int(v + 0.5) if v >= 0 else -int(-v + 0.5)


def test_str_fold_bucket_parity(spark):
    """The JVM expression fold/bucket equals the pure-Python replay on
    ASCII, Latin-1, CJK and mixed tokens."""
    toks = ["hello", "héllo", "中文", "mixed 中 text", "a", "", "€uro"]
    df = spark.createDataFrame([(t,) for t in toks], ["t"])
    got = df.select("t", str_fold(F.col("t")).alias("f"),
                    str_bucket(F.col("t"), 64).alias("b")).collect()
    for r in got:
        assert r["f"] == _py_fold(r["t"]), r["t"]
        assert r["b"] == _py_bucket(r["t"], 64), r["t"]


def _py_dsir(docs, target_langs, n_buckets):
    """Pure-Python replay of dsir_weights' exact-integer pipeline."""
    feats = {}
    tgt = {}
    for doc_id, text, lang in docs:
        a = [t for t in text.strip().lower().split() if t]
        fs = a + [f"{x} {y}" for x, y in zip(a, a[1:])]
        if fs:
            feats[doc_id] = [_py_bucket(f, n_buckets) for f in fs]
            tgt[doc_id] = 1 if lang in target_langs else 0
    cr, ct = {}, {}
    for d, bs in feats.items():
        for b in bs:
            cr[b] = cr.get(b, 0) + 1
            ct[b] = ct.get(b, 0) + tgt[d]
    lrq = {b: _rhalf((math.log(ct[b] + 1) - math.log(cr[b] + 1)) * 1e6)
           for b in cr}
    n_all = sum(cr.values())
    n_tgt = sum(len(bs) * tgt[d] for d, bs in feats.items())
    offq = _rhalf((math.log(n_all + n_buckets)
                   - math.log(n_tgt + n_buckets)) * 1e6)
    out = {}
    for d, bs in feats.items():
        sq = sum(lrq[b] for b in bs)
        out[d] = (len(bs), sq + len(bs) * offq)
    return out


def test_dsir_weights_exact_replay(spark):
    """dsir_weights' logw_q matches the pure-Python exact-integer replay
    row for row, and an English-looking doc outranks a non-English one
    when the target subcorpus is English."""
    docs = [
        (0, "the cat sat on the mat and the dog sat too", "en"),
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "el gato se sienta en la alfombra del perro", "es"),
        (3, "le chat est assis sur le tapis du chien", "fr"),
        (4, "the dog and the cat sat on the sofa", "en"),
        (5, "the cat sat on the mat", "xx"),  # en-like text, other lang
        (6, "der hund sitzt auf der matte und der katze", "de"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
    res = dsir_weights(df, target=(F.col("lang") == "en"), n_buckets=64)
    got = {r["doc_id"]: (r["n_feats"], r["logw_q"], r["logw"])
           for r in res.collect()}
    want = _py_dsir(docs, {"en"}, 64)
    assert set(got) == set(want)
    for d, (nf, lq) in want.items():
        assert got[d][0] == nf, d
        assert got[d][1] == lq, d
        assert got[d][2] == round(lq / 1e6, 6), d
    # the en-like doc written in another lang still scores target-like:
    # higher than the genuinely-Spanish/German docs
    assert got[5][2] > got[2][2]
    assert got[5][2] > got[6][2]


def test_dsir_plan_audit(spark):
    """100 TB shape: the whole weight computation is JVM expressions —
    no Python eval nodes — and the bucket log-ratio table enters via
    broadcast joins, never a shuffled join of the corpus side."""
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 1} tok{i + 2}", "en" if i % 2 else "fr")
         for i in range(20)], ["doc_id", "text", "lang"])
    plan = _plan_of(dsir_weights(docs, target=(F.col("lang") == "en")))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_dsir_empty_and_single_token_docs(spark):
    """Docs with no tokens drop out; a single-token doc contributes only
    its unigram (no bigram underflow)."""
    docs = spark.createDataFrame(
        [(0, "  ", "en"), (1, "solo", "en"), (2, "two words", "fr")],
        ["doc_id", "text", "lang"])
    res = dsir_weights(docs, target=(F.col("lang") == "en"), n_buckets=16)
    got = {r["doc_id"]: r["n_feats"] for r in res.collect()}
    assert got == {1: 1, 2: 3}  # solo: 1 unigram; two words: 2 uni + 1 bi


def _py_emd(obs):
    """Replay emd_pairs: obs = [(cls, pos, c)]."""
    import itertools
    cnt, tot = {}, {}
    for cls, p, c in obs:
        cnt[(cls, p)] = cnt.get((cls, p), 0) + c
        tot[cls] = tot.get(cls, 0) + c
    positions = sorted({p for _, p in cnt})
    span = positions[-1] - positions[0]
    out = {}
    for a, b in itertools.combinations(sorted(tot), 2):
        cum_a = cum_b = emd_q = 0
        for i, p in enumerate(positions[:-1]):
            cum_a += cnt.get((a, p), 0)
            cum_b += cnt.get((b, p), 0)
            gap = positions[i + 1] - p
            emd_q += abs(cum_a * tot[b] - cum_b * tot[a]) * gap
        out[(a, b)] = (emd_q,
                       round(emd_q / (tot[a] * tot[b] * span), 8))
    return out


def test_emd_pairs_exact_replay(spark):
    """emd_pairs equals the pure-Python W1 replay, is 0 for identical
    distributions, and grows with distribution separation."""
    from proj_spark.spatial.stats import emd_pairs
    obs = [("a", 0, 5), ("a", 10, 5),
           ("b", 0, 5), ("b", 10, 5),          # b identical to a
           ("c", 90, 7), ("c", 100, 3),        # c far away
           ("d", 0, 2), ("d", 50, 8)]
    df = spark.createDataFrame(obs, ["cls", "pos", "c"])
    got = {(r["cls_a"], r["cls_b"]): (r["emd_q"], r["emd"])
           for r in emd_pairs(df).collect()}
    want = _py_emd(obs)
    assert got == want
    assert got[("a", "b")][0] == 0
    assert got[("a", "c")][1] > got[("a", "d")][1] > 0


def test_ks_pairs_exact_replay(spark):
    """ks_pairs equals scipy-free exact KS: hand case with known D."""
    from proj_spark.spatial.stats import ks_pairs
    # A = {1,2,3,4}, B = {3,4,5,6}: D = 1/2 at v=2 (first max), n=4 each
    obs = ([("A", v, 1) for v in (1, 2, 3, 4)]
           + [("B", v, 1) for v in (3, 4, 5, 6)])
    df = spark.createDataFrame(obs, ["cls", "v", "c"])
    rows = ks_pairs(df, val_col="v").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["cls_a"], r["cls_b"]) == ("A", "B")
    assert r["ks_q"] == 8          # |2*4 - 0*4| at v=2
    assert r["arg_v"] == 2         # smallest argmax
    assert r["ks"] == 0.5
    # identical distributions -> D = 0
    obs2 = [("A", v, 1) for v in (1, 2)] + [("B", v, 1) for v in (1, 2)]
    r2 = ks_pairs(spark.createDataFrame(obs2, ["cls", "v", "c"]),
                  val_col="v").collect()[0]
    assert r2["ks_q"] == 0 and r2["ks"] == 0.0


def test_emd_ks_plan_audit(spark):
    """Both comparators aggregate the corpus exactly once (one shuffle
    to the class x value lattice) and keep the pair expansion on the
    aggregated side — no Python eval nodes anywhere."""
    from proj_spark.spatial.stats import emd_pairs, ks_pairs
    obs = spark.createDataFrame(
        [(f"c{i % 4}", i % 50, 1) for i in range(400)], ["cls", "pos", "c"])
    for plan in (_plan_of(emd_pairs(obs)),
                 _plan_of(ks_pairs(obs, val_col="pos"))):
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_benford_hand_case(spark):
    """benford: known digit histogram -> exact counts, Benford shares,
    and chi-square terms replayed in pure Python."""
    import __spark_entry__ as entry
    rows = entry.q_benford(spark, SF_DIR).collect()
    digits = {r["digit"] for r in rows}
    assert digits <= set(range(1, 10))
    n_tot = sum(r["n_obs"] for r in rows)
    for r in rows:
        p = math.log10(1.0 + 1.0 / r["digit"])
        assert r["p_benford"] == round(p, 8)
        exp = n_tot * p
        assert r["chi2_term"] == round((r["n_obs"] - exp) ** 2 / exp, 6)


def test_theil_sen_hand_case(spark):
    """Theil-Sen on a tiny series with one outlier: the median slope
    ignores the spike (classic robustness property) and the reported
    rational reproduces the slope."""
    import pyspark.sql.functions as F  # noqa: F811
    from pyspark.sql import Window
    # y = 2x except an outlier at x=3
    ser = [(0, 0), (1, 2), (2, 4), (3, 100), (4, 8)]
    df = spark.createDataFrame(ser, ["x", "y"])
    a, b = df.alias("a"), df.alias("b")
    pr = (a.join(b, F.col("a.x") < F.col("b.x"))
          .select((F.col("b.y") - F.col("a.y")).alias("dy"),
                  (F.col("b.x") - F.col("a.x")).alias("dx")))
    sl = pr.select("dy", "dx", (F.col("dy").cast("double")
                                / F.col("dx").cast("double")).alias("s"))
    rows = sorted((r["s"], r["dy"], r["dx"]) for r in sl.collect())
    n = len(rows)
    assert n == 10
    med = rows[(n + 1) // 2 - 1]
    assert med[0] == 2.0  # outlier did not move the median
    # the full query on real data returns exactly one row
    import __spark_entry__ as entry
    out = entry.q_theil_sen(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r["slope"] == round(r["med_dy"] / r["med_dx"], 8)
    assert r["n_pairs"] == r["n_pairs"]  # present


def test_mwu_pairs_hand_case(spark):
    """Exact tie-corrected Mann-Whitney on a hand case: A={1,2,3},
    B={2,3,4} -> tie-averaged R1=8, U1=2 (u2q=4), T=12; and identical
    samples give u2q = n^2 (z=0)."""
    from proj_spark.spatial.stats import mwu_pairs
    obs = ([("A", v, 1) for v in (1, 2, 3)]
           + [("B", v, 1) for v in (2, 3, 4)])
    r = mwu_pairs(spark.createDataFrame(obs, ["cls", "v", "c"]),
                  val_col="v").collect()[0]
    assert (r["cls_a"], r["cls_b"]) == ("A", "B")
    assert r["u2q"] == 4      # 2*U1 where U1 = R1 - n1(n1+1)/2 = 8-6
    assert r["tie_t"] == 12   # two triple-free doubletons: 2*(2^3-2)
    assert r["z"] < 0         # A stochastically smaller than B
    obs2 = ([("A", v, 1) for v in (5, 6)] + [("B", v, 1) for v in (5, 6)])
    r2 = mwu_pairs(spark.createDataFrame(obs2, ["cls", "v", "c"]),
                   val_col="v").collect()[0]
    assert r2["u2q"] == 4     # 2*U = n_a*n_b when distributions equal
    assert r2["z"] == 0.0


def test_novelty_curve_properties(spark):
    """Batch 0 is 100% novel by definition; every batch's n_new is
    bounded by its n_shingles; repeated text in a later batch drives
    its novelty to 0."""
    import __spark_entry__ as entry
    rows = {r["batch"]: r for r in
            entry.q_novelty_curve(spark, SF_DIR).collect()}
    assert rows[0]["novelty"] == 1.0
    for r in rows.values():
        assert 0 <= r["n_new"] <= r["n_shingles"]
        assert r["novelty"] == round(r["n_new"] / r["n_shingles"], 6)


def test_lang_source_mi_properties(spark):
    """Independent margins: mi_q sums near 0 on a product table and the
    chi-square terms replay exactly; the engine output matches a pure
    replay on sf0.001 documents."""
    import __spark_entry__ as entry
    rows = entry.q_lang_source_mi(spark, SF_DIR).collect()
    n_tot = sum(r["n_ij"] for r in rows)
    for r in rows:
        lr = math.log(r["n_ij"] * n_tot / (r["n_i"] * r["n_j"]))
        assert r["mi_q"] == r["n_ij"] * _rhalf(lr * 1e6)
        e = r["n_i"] * r["n_j"] / n_tot
        assert r["chi2_term"] == round((r["n_ij"] - e) ** 2 / e, 6)
    # margins reassemble: sum of n_ij per lang equals n_i
    by_lang = {}
    for r in rows:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + r["n_ij"]
    for r in rows:
        assert by_lang[r["lang"]] == r["n_i"]


def test_acf_hours_pure_replay(spark):
    """ACF lags replay in pure Python from the hourly series: exact
    sums and the identical rounded Pearson assembly."""
    import __spark_entry__ as entry
    got = {r["lag"]: r for r in entry.q_acf_hours(spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    from collections import Counter
    hrs = Counter()
    for r in ev:
        ts = r["ts"]
        hrs[(ts - ts.__class__(1970, 1, 1)).total_seconds() // 3600] += 1
    xs = sorted(hrs)
    for lag in (1, 12, 24):
        pairs = [(hrs[x], hrs[x + lag]) for x in xs if x + lag in hrs]
        n = len(pairs)
        r = got[lag]
        assert r["n_win"] == n
        assert r["s_ab"] == sum(a * b for a, b in pairs)
        sa, sb = sum(a for a, _ in pairs), sum(b for _, b in pairs)
        saa = sum(a * a for a, _ in pairs)
        sbb = sum(b * b for _, b in pairs)
        assert (r["s_a"], r["s_b"], r["s_aa"], r["s_bb"]) == (sa, sb, saa,
                                                              sbb)
        num = n * r["s_ab"] - sa * sb
        den = math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
        assert r["acf"] == round(num / den, 6)
