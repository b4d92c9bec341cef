"""First-principles checks for the session-22d layer: the hourly STL
decomposition and tokenizer fertility — pure-Python replays at sf0.001
plus decomposition identities."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd

import __spark_entry__ as entry
from __spark_entry__ import STL_SHIFT
from proj_spark.text import analysis

SF_DIR = "/root/testdata/sf0.001"


def _tbl(name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/{name}.parquet")


def _py_stl():
    ev = _tbl("events")
    us = ev.ts.astype("datetime64[ns]").astype("int64") // 1000
    hours = (us // 3_600_000_000).astype(int)
    cnt = Counter(hours)
    mn, mx = min(cnt), max(cnt)
    ys = {x: cnt.get(x, 0) for x in range(mn, mx + 1)}
    xs = sorted(ys)
    d: dict[int, list[int]] = {}
    for i, x in enumerate(xs):
        if i < 11 or i > len(xs) - 13:
            continue
        t24 = sum(ys[xs[j]] for j in range(i - 11, i + 13))
        d.setdefault(x % 24, []).append(24 * ys[x] - t24)
    out = {}
    for h, vals in d.items():
        n_h = len(vals)
        s_num = sum(vals)
        s_floor = (s_num + n_h * STL_SHIFT) // n_h - STL_SHIFT
        rss = sum((v - s_floor) ** 2 for v in vals)
        out[h] = (n_h, s_num, s_floor, rss)
    return out


def test_stl_hours_replay(spark):
    exp = _py_stl()
    got = {r.h: (r.n_h, r.s_num, r.s_floor, r.rss24)
           for r in entry.queries()["stl_hours"](spark, SF_DIR)
           .toPandas().itertuples()}
    assert got == exp


def test_stl_decomposition_identities(spark):
    """Sum over hours-of-day of seasonal numerators equals the sum of
    all detrended values (additivity), and every seasonal floor-mean
    brackets the exact rational mean from below."""
    rows = entry.queries()["stl_hours"](spark, SF_DIR).collect()
    assert len(rows) == 24
    for r in rows:
        assert r.s_floor * r.n_h <= r.s_num < (r.s_floor + 1) * r.n_h
        assert r.rss24 >= 0


def test_tok_fertility_replay(spark):
    docs = _tbl("documents")
    pat = re.compile(analysis.BPE_PATTERN)
    agg: dict[str, list[int]] = {}
    for r in docs.itertuples():
        ws = len([t for t in r.text.strip().lower().split() if t])
        bpe = len(pat.findall(r.text.lower()))
        a = agg.setdefault(r.lang, [0, 0, 0])
        a[0] += 1
        a[1] += ws
        a[2] += bpe
    exp = {lang: (a[0], a[1], a[2], (1_000_000 * a[2]) // a[1])
           for lang, a in agg.items()}
    got = {r.lang: (r.n_docs, r.ws_tokens, r.bpe_units,
                    r.fertility_micro)
           for r in entry.queries()["tok_fertility"](spark, SF_DIR)
           .toPandas().itertuples()}
    assert got == exp


def test_tok_fertility_at_least_one(spark):
    """BPE pretokenization never merges across whitespace, so units
    are at least as numerous as whitespace tokens: fertility >= 1."""
    out = entry.queries()["tok_fertility"](spark, SF_DIR).toPandas()
    assert (out.fertility_micro >= 1_000_000).all()
