"""Chunk-level dedup + repetition stats (proj_spark/text/repetition.py)."""

import pytest
from pyspark.sql import functions as F

from proj_spark.text.repetition import (chunk_dedup_stats, repetition_stats,
                                        token_chunks)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_chunks_segmentation(spark):
    # 10 tokens at width 4 -> chunks of 4, 4, 2
    docs = _docs(spark, [(1, " ".join(f"t{i}" for i in range(10)))])
    ch = token_chunks(docs, width=4).orderBy("pos").collect()
    assert [(r.pos, r.ctok) for r in ch] == [(0, 4), (1, 4), (2, 2)]
    assert ch[0].chunk == "t0 t1 t2 t3"
    assert ch[2].chunk == "t8 t9"


def test_token_chunks_single_and_empty(spark):
    docs = _docs(spark, [(1, "only"), (2, "   ")])
    ch = token_chunks(docs, width=4).collect()
    # empty doc yields no chunks; 1-token doc yields one short chunk
    assert len(ch) == 1
    assert (ch[0].doc_id, ch[0].pos, ch[0].chunk, ch[0].ctok) == \
        (1, 0, "only", 1)


def test_chunk_dedup_keeps_first_occurrence(spark):
    # doc 1 and doc 2 share an identical 4-token chunk; doc 1 wins
    shared = "a b c d"
    docs = _docs(spark, [(1, shared + " e f g h"),
                         (2, shared + " x y z w"),
                         (3, "p q r s")])
    out = {r.doc_id: r for r in
           chunk_dedup_stats(docs, width=4).collect()}
    assert out[1].n_removed == 0 and out[1].kept_frac == 1.0
    assert out[2].n_removed == 1 and out[2].kept_tok == 4
    assert out[2].kept_frac == pytest.approx(0.5)
    assert out[3].n_removed == 0


def test_chunk_dedup_duplicate_within_one_doc(spark):
    # the same chunk twice INSIDE one doc: second instance removed
    docs = _docs(spark, [(7, "a b c d a b c d")])
    r = chunk_dedup_stats(docs, width=4).collect()[0]
    assert r.n_chunks == 2 and r.n_removed == 1
    assert r.kept_tok == 4 and r.n_tokens == 8


def test_repetition_stats_values(spark):
    # "x x x x" -> 1 distinct token, top bigram "x x" count 3 of 3
    long_distinct = " ".join(f"w{i}" for i in range(20))
    docs = _docs(spark, [(1, "x x x x"), (2, long_distinct)])
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}
    r1 = out[1]
    assert (r1.n_tokens, r1.n_distinct) == (4, 1)
    assert r1.dup_tok_frac == pytest.approx(0.75)
    assert (r1.n_bigrams, r1.top_bigram_n) == (3, 3)
    assert r1.top_bigram_share == pytest.approx(1.0)
    assert r1.rep_flagged
    r2 = out[2]
    assert r2.dup_tok_frac == 0.0
    assert r2.top_bigram_share == pytest.approx(1 / 19, abs=1e-6)
    assert not r2.rep_flagged


def test_repetition_plan_is_shuffle_lean(spark):
    # the per-row stats must not add a join: exactly the two hash aggs
    docs = _docs(spark, [(1, "a b a b")])
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
