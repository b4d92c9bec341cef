"""Sketch tests: deterministic HLL and Count-Min against pure-Python
references, plus accuracy/merge/overcount guarantees; dup_spans window
coverage semantics on hand-built corpora."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from proj_spark import sketches as sk

_M31, _K1, _K2 = 2_147_483_648, 2_654_435_761, 40_503


def _hash31_py(x: int) -> int:
    h = (x % _M31) * _K1 % _M31
    h ^= h >> 16
    h = h * _K2 % _M31
    h ^= h >> 16
    return h * _K1 % _M31


def _hll_py(ids):
    regs = {}
    for x in ids:
        h = _hash31_py(x)
        b, w = h % sk.HLL_M, h // sk.HLL_M
        rho = sk.HLL_RHO_MAX if w == 0 else sk.HLL_RHO_MAX - w.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    s = sum(2 ** (sk.HLL_RHO_MAX - m) for m in regs.values())
    s += (sk.HLL_M - len(regs)) * 2 ** sk.HLL_RHO_MAX
    est = sk.HLL_ALPHA * sk.HLL_M * sk.HLL_M * 2 ** sk.HLL_RHO_MAX / s
    return s, est


def test_hll_registers_match_python(spark):
    ids = [i * 37 for i in range(500)]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    from proj_spark.text.curation import hash31
    h = hash31(F.col("id"))
    got = (df.groupBy(sk.hll_bucket(h).alias("b"))
           .agg(F.max(sk.hll_rho(h)).alias("mr"),
                F.count("*").alias("np")))
    s_row = got.agg(sk.hll_stat(F.col("mr"), F.count("*")).alias("s")).first()
    s_want, est_want = _hll_py(ids)
    assert s_row["s"] == s_want
    est_got = (spark.createDataFrame([(s_row['s'],)], "s long")
               .select(sk.hll_estimate(F.col("s")).alias("e")).first()["e"])
    assert est_got == pytest.approx(est_want, rel=1e-12)


@pytest.mark.parametrize("n_true", [100, 1000, 20000])
def test_hll_accuracy(n_true):
    # standard error for m=256 is ~1.04/16 = 6.5%; allow 4 sigma.  Below
    # 2.5m the raw estimator biases high and the consumer applies the
    # linear-counting correction from the reported n_zero (the query
    # exposes both est and n_zero for exactly this reason).
    import math
    s, est = _hll_py(range(n_true))
    if est <= 2.5 * sk.HLL_M:
        regs = set()
        for x in range(n_true):
            regs.add(_hash31_py(x) % sk.HLL_M)
        v = sk.HLL_M - len(regs)
        if v > 0:
            est = sk.HLL_M * math.log(sk.HLL_M / v)
    assert abs(est - n_true) / n_true < 0.26


def test_hll_merge_exact():
    # max-merge of two halves' registers == whole-stream registers:
    # the sketch is order/partition independent (map-side combinable)
    a, b = list(range(0, 3000, 2)), list(range(1, 3000, 2))
    s_whole, _ = _hll_py(a + b)

    def regs(ids):
        r = {}
        for x in ids:
            h = _hash31_py(x)
            bk, w = h % sk.HLL_M, h // sk.HLL_M
            rho = sk.HLL_RHO_MAX if w == 0 else sk.HLL_RHO_MAX - w.bit_length()
            r[bk] = max(r.get(bk, 0), rho)
        return r
    ra, rb = regs(a), regs(b)
    merged = {k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)}
    s_merged = sum(2 ** (sk.HLL_RHO_MAX - m) for m in merged.values()) \
        + (sk.HLL_M - len(merged)) * 2 ** sk.HLL_RHO_MAX
    assert s_merged == s_whole


def _tid48_py(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:12], 16)


def test_token_id48_matches_python(spark):
    toks = ["data", "query", "zzz", "ünïcode"]
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    got = {r["token"]: r["tid"] for r in
           df.select("token", sk.token_id48(F.col("token")).alias("tid"))
             .collect()}
    assert got == {t: _tid48_py(t) for t in toks}


def test_cm_overcount_guarantee(spark):
    # CM point estimate is always >= the true count
    import collections
    words = [f"w{i % 50}" for i in range(5000)] + ["rare"] * 3
    true = collections.Counter(words)
    counters = collections.Counter()
    for t, n in true.items():
        tid = _tid48_py(t)
        for r in range(sk.CM_D):
            col = _hash31_py(tid + sk.CM_SEEDS[r]) % sk.CM_W
            counters[(r, col)] += n
    for t, n in true.items():
        tid = _tid48_py(t)
        est = min(counters[(r, _hash31_py(tid + sk.CM_SEEDS[r]) % sk.CM_W)]
                  for r in range(sk.CM_D))
        assert est >= n
    # spark cm_col parity
    df = spark.createDataFrame([(t,) for t in true], "token string")
    cols = df.select(
        "token", *[sk.cm_col(sk.token_id48(F.col("token")), r).alias(f"c{r}")
                   for r in range(sk.CM_D)])
    for row in cols.collect():
        tid = _tid48_py(row["token"])
        for r in range(sk.CM_D):
            assert row[f"c{r}"] == _hash31_py(tid + sk.CM_SEEDS[r]) % sk.CM_W


# ---------------------------------------------------------------------------
# dup_spans semantics
# ---------------------------------------------------------------------------

def test_dup_spans_shared_passage(spark, monkeypatch, tmp_path):
    import __spark_entry__ as em
    passage = " ".join(f"p{i}" for i in range(10))  # 10 shared tokens
    docs = spark.createDataFrame(
        [(0, passage + " tail0 only zero", "en", "s", 1),
         (1, "head1 first " + passage, "en", "s", 1),
         (2, "totally different words here and no dups at all x y z", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long")
    monkeypatch.setattr(em, "_docs", lambda _s, _d: docs)
    out = {r["doc_id"]: r for r in em.q_dup_spans(spark, "ignored").collect()}
    # 10-token passage with k=8 -> 3 duplicated windows covering all 10
    assert out[0]["n_dup_win"] == 3 and out[0]["n_cov"] == 10
    assert out[1]["n_dup_win"] == 3 and out[1]["n_cov"] == 10
    assert out[2]["n_dup_win"] == 0 and out[2]["n_cov"] == 0
    assert out[2]["dup_ratio"] == 0.0
    assert out[0]["dup_ratio"] == pytest.approx(10 / 13, abs=1e-6)
