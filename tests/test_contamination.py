"""Unit tests: decontamination, bigram-LM scoring, PII redaction, and
the adaptive quadtree cut."""

import pytest
from pyspark.sql import functions as F

from proj_spark.text import contamination, pii


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 0: benchmark (id % 10 == 7 convention NOT used here; tests
        #    pass an explicit predicate)
        (7, "a b c d e f g h i j k l m n o p"),
        # 12: shares the leading 13-gram window with 7 (contaminated)
        (12, "a b c d e f g h i j k l m XX YY ZZ"),
        # 3: disjoint vocabulary (clean)
        (3, "q r s t u v w x y z q r s t u v"),
        # 27: second benchmark doc, short (< 13 tokens -> no n-grams)
        (27, "one two three"),
        # 5: exact copy of 7 (fully contaminated)
        (5, "a b c d e f g h i j k l m n o p"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_flags_overlap(docs):
    out = contamination.contamination_stats(
        docs, lambda i: i % 10 == 7, n=13).collect()
    by_id = {r.doc_id: r for r in out}
    # benchmark docs themselves never appear
    assert 7 not in by_id and 27 not in by_id
    # the clean doc never appears
    assert 3 not in by_id
    # the exact copy matches every one of its n-grams
    assert by_id[5].n_hits == by_id[5].n_ngrams
    assert by_id[5].hit_frac == 1.0
    # the partial overlap matches exactly the one shared 13-gram window
    assert by_id[12].n_hits == 1
    assert 0 < by_id[12].hit_frac < 1


def test_ngrams_short_docs_empty(spark):
    d = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert contamination.token_ngrams_hashed(d, 13).count() == 0


def test_bigram_lm_scores_exact(spark):
    # corpus: 'a b' x2, 'a c' x1 -> P(b|a)=2/3, P(c|a)=1/3
    d = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string")
    out = {r.doc_id: r for r in
           contamination.bigram_lm_scores(d).collect()}
    assert out[1].sum_micro == (1_000_000 * 2) // 3 == 666666
    assert out[3].sum_micro == 1_000_000 // 3 == 333333
    assert out[1].n_bigrams == 1
    assert out[1].avg_micro == 666666.0


def test_bigram_lm_micro_bounds(docs):
    # every conditional probability is in (0, 1]: micro in (0, 1e6]
    bg = contamination.bigram_instances(docs)
    cb = bg.groupBy("bg").agg(F.count("*").alias("cb"))
    cw = bg.groupBy("w1").agg(F.count("*").alias("cw"))
    micro = (bg.join(cb, "bg").join(cw, "w1")
             .select(F.expr("(1000000 * cb) div cw").alias("m")))
    mm = micro.agg(F.min("m").alias("lo"), F.max("m").alias("hi")).first()
    assert 0 < mm.lo and mm.hi <= 1_000_000


def test_pii_redaction_bytes(spark):
    d = spark.createDataFrame(
        [(1, "mail bob.smith+x@Example-Host.co.uk now"),
         (2, "call +1-555-0199 or ping 10.0.42.255 ok"),
         (3, "version 1.2.3.4444 is not an ip"),   # 4-digit octet: \b blocks
         (4, "no pii here")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in d.select(
        "doc_id",
        pii.pii_counts(F.col("text"))[0].alias("ne"),
        pii.pii_counts(F.col("text"))[1].alias("np"),
        pii.pii_counts(F.col("text"))[2].alias("ni"),
        pii.redact(F.col("text")).alias("red")).collect()}
    assert (out[1].ne, out[1].np, out[1].ni) == (1, 0, 0)
    assert out[1].red == "mail <EMAIL> now"
    assert (out[2].ne, out[2].np, out[2].ni) == (0, 1, 1)
    assert out[2].red == "call <PHONE> or ping <IP> ok"
    # 1.2.3.4444: the last octet is 4 digits -> the {1,3} match ends
    # mid-number, \b fails, no IPv4 hit anywhere in the string
    assert out[3].ni == 0
    assert out[3].red == "version 1.2.3.4444 is not an ip"
    assert out[4].red == "no pii here"


def test_adaptive_cut_partitions_exactly_once(spark):
    from proj_spark.spatial import adaptive, pyramid
    from proj_spark.pages import synth_points
    pts = synth_points(spark, 20_000)
    z_min, z_max, cap = 4, 9, 64
    pyr = pyramid.tile_pyramid(pts, z_max, z_min)
    cut = adaptive.adaptive_cut(pyr, z_min, z_max, cap).collect()
    # invariant: the cut covers every point exactly once
    assert sum(r.n_pages for r in cut) == pts.count()
    # structure: non-overflow tiles fit the cap; overflow only at z_max
    for r in cut:
        if r.overflow:
            assert r.zoom == z_max and r.n_pages > cap
        else:
            assert r.n_pages <= cap
    # no selected tile is the ancestor of another selected tile
    sel = {(r.zoom, r.tile_x, r.tile_y) for r in cut}
    for z, x, y in sel:
        zz, xx, yy = z, x, y
        while zz > z_min:
            zz, xx, yy = zz - 1, xx >> 1, yy >> 1
            assert (zz, xx, yy) not in sel
