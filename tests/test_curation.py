"""Curation-layer tests: deterministic sampling, keep-longest dedup
selection, CCNet popularity buckets, distinctive terms, URL
canonicalization — each against an independent pure-Python oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proj_spark.text import curation
from proj_spark.text.urlnorm import canonical_url, canonical_url_sql

_M, _K1, _K2 = 2_147_483_648, 2_654_435_761, 40_503


def _hash31_py(x: int) -> int:
    h = (x % _M) * _K1 % _M
    h ^= h >> 16
    h = h * _K2 % _M
    h ^= h >> 16
    return h * _K1 % _M


# ---------------------------------------------------------------------------
# hash31 / sampling
# ---------------------------------------------------------------------------

def test_hash31_matches_python_reference(spark):
    ids = list(range(200)) + [10**9, 10**12, 10**15, 2**62]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = [r["h"] for r in
           df.select(curation.hash31(F.col("id")).alias("h"))
             .orderBy("id").collect()]
    want = [_hash31_py(i) for i in sorted(ids)]
    assert got == want


def test_hash31_sql_twin_matches(spark):
    import duckdb
    ids = list(range(100)) + [10**12 + 7]
    con = duckdb.connect()
    expr = curation.hash31_sql("i")
    got = con.execute(
        f"SELECT {expr} AS h FROM (SELECT unnest({ids}) AS i) ORDER BY i"
    ).fetchall()
    assert [g[0] for g in got] == [_hash31_py(i) for i in sorted(ids)]


def test_sample_key_distribution_and_determinism(spark):
    df = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
    keys = df.select(curation.sample_key(F.col("doc_id")).alias("k"))
    frac = keys.where(F.col("k") < 1000).count() / 20000
    assert 0.08 < frac < 0.12  # ~10% at rate 1000/10000
    # repartitioning does not change the kept set (unlike df.sample)
    a = sorted(r["doc_id"] for r in df.where(
        curation.sample_key(F.col("doc_id")) < 500).collect())
    b = sorted(r["doc_id"] for r in df.repartition(13).where(
        curation.sample_key(F.col("doc_id")) < 500).collect())
    assert a == b


def test_stratified_sample_rates(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(10000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = curation.stratified_sample(df, "lang", "doc_id",
                                      {"en": 1000}, default_rate=5000)
    per = {r["lang"]: r["n"] for r in
           kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 350 < per["en"] < 650        # ~10% of 5000
    assert 2200 < per["de"] < 2800      # ~50% of 5000
    # exact membership oracle
    want_en = {i for i in range(0, 10000, 2) if _hash31_py(i) % 10000 < 1000}
    got_en = {r["doc_id"] for r in kept.where(F.col("lang") == "en").collect()}
    assert got_en == want_en


# ---------------------------------------------------------------------------
# keep_longest
# ---------------------------------------------------------------------------

def test_keep_longest_policy(spark):
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c d e"), (2, "a b c d e"), (3, "x")],
        "doc_id long, text string")
    comp = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3)], "doc_id long, comp_id long")
    out = {r["comp_id"]: (r["keep_id"], r["keep_tokens"], r["comp_size"])
           for r in curation.keep_longest(docs, comp).collect()}
    # 1 and 2 tie on 5 tokens -> smaller doc_id wins
    assert out[0] == (1, 5, 3)
    assert out[3] == (3, 1, 1)


# ---------------------------------------------------------------------------
# popularity / buckets
# ---------------------------------------------------------------------------

def test_doc_popularity_exact(spark):
    docs = spark.createDataFrame(
        [(0, "a a b", "en"), (1, "b c", "en"), (2, "c c c", "de")],
        "doc_id long, text string, lang string")
    pop = {r["doc_id"]: (r["pop_sum"], r["n_tokens"])
           for r in curation.doc_popularity(docs).collect()}
    # counts: a=2, b=2, c=4
    assert pop[0] == (2 + 2 + 2, 3)
    assert pop[1] == (2 + 4, 2)
    assert pop[2] == (12, 3)


def test_ccnet_buckets_match_ntile(spark):
    # 10 docs with strictly decreasing popularity -> ntile(3) = 4/3/3
    rows = [(i, " ".join(["w"] * (10 - i) + [f"u{i}"]), "en")
            for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    b = curation.ccnet_buckets(docs)
    sizes = {r["bucket"]: r["n"] for r in
             b.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    assert sizes == {1: 4, 2: 3, 3: 3}
    # bucket 1 holds the highest-popularity docs (most 'w' repeats)
    top = {r["doc_id"] for r in b.where(F.col("bucket") == 1).collect()}
    assert top == {0, 1, 2, 3}


# ---------------------------------------------------------------------------
# distinctive terms
# ---------------------------------------------------------------------------

def test_distinctive_terms_rational_tfidf(spark):
    docs = spark.createDataFrame(
        [(0, "aa aa common", "en"), (1, "bb common", "de"),
         (2, "common common", "de")],
        "doc_id long, text string, lang string")
    out = curation.distinctive_terms(docs, top_k=2)
    en = {(r["token"]): (r["tf"], r["df"], r["score"], r["rank"])
          for r in out.where(F.col("lang") == "en").collect()}
    # aa: tf=2 df=1 -> 2_000_000 ; common: tf=1 df=3 -> 333_333
    assert en["aa"] == (2, 1, 2_000_000, 1)
    assert en["common"] == (1, 3, 333_333, 2)


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

CANON_CASES = [
    ("https://site1.example/page/9", "https://site1.example/page/9"),
    ("http://www.Site1.EXAMPLE/page/9", "https://site1.example/page/9"),
    ("HTTPS://SITE1.EXAMPLE/page/9", "https://site1.example/page/9"),
    ("https://site1.example/page/9/", "https://site1.example/page/9"),
    ("https://site1.example/page/9?utm_source=x&utm_medium=y",
     "https://site1.example/page/9"),
    ("https://site1.example/page/9?ref=rss#frag",
     "https://site1.example/page/9"),
    ("https://site1.example/page/9?keep=1&utm_source=x",
     "https://site1.example/page/9?keep=1"),
    ("https://site1.example/page/9?utm_source=x&keep=1",
     "https://site1.example/page/9?keep=1"),
    ("https://site1.example/", "https://site1.example/"),  # root slash kept
]


def test_canonical_url_rules(spark):
    df = spark.createDataFrame([(u,) for u, _ in CANON_CASES], "url string")
    got = [r["c"] for r in
           df.select(canonical_url(F.col("url")).alias("c"),
                     "url").orderBy("url").collect()]
    want = [w for _, w in sorted(CANON_CASES)]
    assert got == want


def test_canonical_url_sql_twin(spark):
    import duckdb
    con = duckdb.connect()
    for raw, want in CANON_CASES:
        got = con.execute(
            f"SELECT {canonical_url_sql('url')} "
            f"FROM (SELECT ? AS url)", [raw]).fetchone()[0]
        assert got == want, raw


def test_token_quantiles_definition(spark, monkeypatch):
    import __spark_entry__ as em
    # lengths 1..10 for en: p50 -> smallest v with cum >= 5 -> 5;
    # p90 -> 9; p99 -> ceil(9.9)=10
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * i), "en", "s", 1) for i in range(1, 11)],
        "doc_id long, text string, lang string, source string, n_chars long")
    monkeypatch.setattr(em, "_docs", lambda _s, _d: docs)
    row = em.q_token_quantiles(spark, "ignored").collect()[0]
    assert (row["n_docs"], row["p50"], row["p90"], row["p99"]) == (10, 5, 9, 10)


def test_pareto_skyline_semantics(spark):
    from proj_spark.text.curation import pareto_skyline
    rows = [
        ("en", 1, 10, 5), ("en", 2, 10, 5),   # duplicate frontier pts
        ("en", 3, 10, 4),                     # dominated by 1/2
        ("en", 4, 12, 3),                     # frontier (longest)
        ("en", 5, 8, 9),                      # frontier (richest)
        ("en", 6, 8, 9), ("en", 7, 7, 9),     # 6 dup-survives, 7 dominated
        ("de", 8, 1, 1),                      # other group untouched
    ]
    df = spark.createDataFrame(
        rows, "lang string, doc_id long, n_tokens long, n_uniq long")
    got = sorted(r.doc_id for r in pareto_skyline(
        df, "lang", "doc_id", "n_tokens", "n_uniq").collect())
    # brute-force dominance
    want = sorted(
        i for (g, i, a, b) in rows
        if not any(og == g and oa >= a and ob >= b and (oa > a or ob > b)
                   for (og, oi, oa, ob) in rows))
    assert got == want == [1, 2, 4, 5, 6, 8]
