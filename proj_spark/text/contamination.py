"""Benchmark decontamination and bigram-LM quality scoring.

Two standard LLM training-data curation steps re-expressed as Spark
plans over the `documents` table:

- `contamination_stats`: GPT-3-style benchmark decontamination (Brown
  et al. 2020 NeurIPS, appendix C; also PaLM / Llama data cards).  A
  training document is contaminated when it shares an exact token
  13-gram with a held-out benchmark document.  The distributed plan is
  the bucketed one: explode each side's DISTINCT n-gram keys, broadcast
  the benchmark side (benchmarks are small by definition — MMLU-sized,
  not corpus-sized), inner-join, per-doc hash agg.  The corpus side is
  touched by exactly one wide stage (the per-doc agg); the join itself
  is map-side.  N-grams shuffle/join as xxhash64 int64 keys, not
  13-token strings (the ngram_pairs lesson: 8-byte fixed-width keys cut
  shuffle volume ~4x; a 64-bit collision among ~docs*100 n-grams is
  ~1e-10 at sf0.1 and would surface as a visible oracle mismatch).

- `bigram_lm_scores`: CCNet-style LM quality filter (Wenzek et al.
  2020 §4.3) with the corpus's own bigram model standing in for the
  external KenLM: score every document by its mean bigram conditional
  probability P(w2|w1) = c(w1 w2) / c(w1 ·).  Probabilities are
  integer-quantized to micro-units via EXACT integer division
  (1e6*c_bg div c_w1) — the PageRank/IDW method — so the per-doc sums
  are exact BIGINTs and the oracle matches bit-for-bit with no float
  accumulation order to worry about.  Plan: one explode, two hash aggs
  (bigram counts, left-context counts), two joins back.  The bigram
  join keys on xxhash64 and shuffles (the count table is vocab^2 — at
  web scale that is NOT broadcastable); the context join is on single
  tokens (vocab-bounded, AQE broadcasts it when small).

Both emit integers and ratios of integers only, so the DuckDB oracles
reproduce every value exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from proj_spark.text.analysis import tokens

CONTAM_N = 13  # GPT-3 uses 13-gram overlap for decontamination


def token_ngrams_hashed(docs: DataFrame, n: int,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(id, ng) — each document's DISTINCT token n-grams as xxhash64
    int64 keys.  Documents shorter than n tokens contribute nothing.

    The n-gram materialization is a per-row expression (no shuffle):
    slice+join over the token array, hashed immediately so only 8-byte
    keys ever leave the row.
    """
    expr = (
        f"CASE WHEN size(toks) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size(toks) - {n - 1}), "
        f"i -> xxhash64(array_join(slice(toks, i, {n}), ' ')))) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END")
    return (docs
            .select(F.col(id_col), tokens(F.col(text_col)).alias("toks"))
            .select(F.col(id_col), F.explode(F.expr(expr)).alias("ng")))


def contamination_stats(docs: DataFrame, is_bench,
                        n: int = CONTAM_N,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Per-TRAINING-document benchmark-overlap stats.

    `is_bench` is a Callable[[Column], Column]: a boolean predicate on
    the document id marking the benchmark subset (id arithmetic, so
    Catalyst pushes it to the scan — the benchmark branch reads only
    benchmark rows, never the corpus).  Returns only contaminated docs
    (n_hits >= 1): (doc_id, n_ngrams, n_hits, hit_frac) where n_ngrams
    counts the doc's distinct n-grams and n_hits how many of them
    appear anywhere in the benchmark set.
    """
    ng = token_ngrams_hashed(docs.select(id_col, text_col), n,
                             text_col=text_col, id_col=id_col)
    idc = F.col(id_col)
    bench_ng = ng.where(is_bench(idc)).select("ng").distinct()
    train_ng = ng.where(~is_bench(idc))
    sizes = train_ng.groupBy(id_col).agg(F.count("*").alias("n_ngrams"))
    hits = (train_ng.join(F.broadcast(bench_ng), "ng")
            .groupBy(id_col).agg(F.count("*").alias("n_hits")))
    return (sizes.join(hits, id_col)
            .select(idc.cast("long").alias(id_col),
                    F.col("n_ngrams").cast("long").alias("n_ngrams"),
                    F.col("n_hits").cast("long").alias("n_hits"),
                    F.round(F.col("n_hits").cast("double")
                            / F.col("n_ngrams"), 6).alias("hit_frac")))


def bigram_instances(docs: DataFrame,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(id, w1, bg) — every bigram INSTANCE (not distinct) with its
    left context token; bg is the xxhash64 of 'w1 w2'."""
    # zip_with over two slices (the repetition.py pattern): O(tokens),
    # no per-index re-slicing of the whole array.
    expr = (
        "CASE WHEN size(toks) >= 2 THEN "
        "zip_with(slice(toks, 1, size(toks) - 1), "
        "         slice(toks, 2, size(toks) - 1), "
        "         (a, b) -> struct(a AS w1, "
        "                          xxhash64(concat(a, ' ', b)) AS bg)) "
        "ELSE CAST(array() AS ARRAY<STRUCT<w1: STRING, bg: BIGINT>>) END")
    return (docs
            .select(F.col(id_col), tokens(F.col(text_col)).alias("toks"))
            .select(F.col(id_col), F.explode(F.expr(expr)).alias("b"))
            .select(F.col(id_col), F.col("b.w1").alias("w1"),
                    F.col("b.bg").alias("bg")))


def bigram_lm_scores(docs: DataFrame,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document mean bigram conditional probability, micro-quantized.

    micro(w1 w2) = (1_000_000 * c(w1 w2)) div c(w1 ·)  — exact BIGINT.
    Returns (doc_id, n_bigrams, sum_micro, avg_micro) with
    avg_micro = round(sum_micro / n_bigrams, 4).
    """
    bg = bigram_instances(docs, text_col=text_col, id_col=id_col)
    # the corpus LM: bigram counts (vocab^2 — shuffle join at scale)
    # and left-context counts (vocab — AQE broadcasts when small)
    cb = bg.groupBy("bg").agg(F.count("*").alias("cb"))
    cw = bg.groupBy("w1").agg(F.count("*").alias("cw"))
    scored = (bg.join(cb, "bg").join(cw, "w1")
              .select(F.col(id_col),
                      F.expr("(1000000 * cb) div cw").alias("micro")))
    return (scored.groupBy(id_col)
            .agg(F.count("*").alias("n_bigrams"),
                 F.sum("micro").alias("sum_micro"))
            .select(F.col(id_col).cast("long").alias(id_col),
                    F.col("n_bigrams").cast("long").alias("n_bigrams"),
                    F.col("sum_micro").cast("long").alias("sum_micro"),
                    F.round(F.col("sum_micro").cast("double")
                            / F.col("n_bigrams"), 4).alias("avg_micro")))
