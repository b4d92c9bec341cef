"""Bloom-filter decontamination kernel tests."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from proj_spark.text.bloom import (BLOOM_K, BLOOM_M, GRAM_WIDTH,
                                   _doc_gram_hashes, bloom_stats,
                                   build_bloom_bits, gram_positions,
                                   positions_sql)


def test_positions_match_sql_twin():
    rng = np.random.default_rng(5)
    hv = rng.integers(0, (1 << 61) - 1, size=500, dtype=np.int64)
    got = gram_positions(hv)
    con = duckdb.connect()
    con.execute("CREATE TABLE h AS SELECT * FROM (VALUES %s) t(hv)"
                % ", ".join(f"({int(v)}::BIGINT)" for v in hv))
    sql = positions_sql("hv", "i.i")
    rows = con.execute(
        f"SELECT hv, i.i, {sql} FROM h CROSS JOIN "
        f"(SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS i) i"
    ).fetchall()
    want = {(int(h), int(i)): int(p) for h, i, p in rows}
    for r, h in enumerate(hv):
        for i in range(BLOOM_K):
            assert got[r, i] == want[(int(h), i)]


def test_bench_doc_fully_flagged(spark):
    """Every gram of a doc that IS in the benchmark must hit (no false
    negatives — the Bloom guarantee)."""
    text = "the quick brown fox jumps over the lazy dog " * 8
    bench = spark.createDataFrame([(1, text)], "doc_id long, text string")
    words = build_bloom_bits(bench)
    out = bloom_stats(bench, words).collect()
    assert len(out) == 1
    assert out[0].n_hits == out[0].n_grams > 0
    assert out[0].hit_frac == 1.0


def test_clean_doc_fp_rate_is_low(spark):
    """A disjoint doc sees only false positives, and far below 10%
    at these m/k parameters and densities."""
    rng = np.random.default_rng(11)
    bench_text = " ".join(str(rng.integers(10 ** 9)) for _ in range(400))
    clean_text = " ".join(str(rng.integers(10 ** 9) + 10 ** 10)
                          for _ in range(400))
    bench = spark.createDataFrame([(1, bench_text)],
                                  "doc_id long, text string")
    clean = spark.createDataFrame([(2, clean_text)],
                                  "doc_id long, text string")
    words = build_bloom_bits(bench)
    out = bloom_stats(clean, words).collect()[0]
    assert out.n_grams > 1000
    assert out.n_hits / out.n_grams < 0.10


def test_short_docs_dropped(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "x" * (GRAM_WIDTH + 3))],
        "doc_id long, text string")
    words = np.zeros(BLOOM_M // 64, dtype=np.uint64)
    got = bloom_stats(docs, words).collect()
    assert [r.doc_id for r in got] == [2]
    assert got[0].n_grams == 1  # "xxx...x" has ONE distinct gram


def test_gram_hashes_deterministic():
    a = _doc_gram_hashes(pd.Series(["hello world " * 10]))
    b = _doc_gram_hashes(pd.Series(["hello world " * 10]))
    assert np.array_equal(a[0], b[0]) and len(a[0]) > 0
