"""Corpus repetition operators: chunk-level (paragraph-style) dedup and
per-document repetition statistics.

These are the CCNet / Gopher curation steps (Wenzek et al. 2020, "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data";
Rae et al. 2021 Gopher §A.1.1 repetition filters) re-expressed as Spark
plans:

- `chunk_dedup_stats`: corpus-wide duplicate-chunk removal.  Documents
  are segmented into fixed-width token chunks (the positional stand-in
  for paragraphs/lines); a chunk instance is REMOVED when it is not the
  corpus-wide first occurrence ordered by (doc_id, pos).  The dataflow
  is the scalable one: explode chunks, shuffle ONCE on the 64-bit chunk
  key to pick the keeper, shuffle-join instances against keepers on the
  same key (Catalyst plans both sides into one exchange layout), then a
  per-document hash agg.  No windows over corpus-wide partitions, no
  driver state — at 10^12 docs every stage is a plain hash shuffle.
- `repetition_stats`: per-document duplicate-token and top-bigram
  shares.  Distinct-token counts are per-row expressions (no shuffle);
  bigram top-counts use explode -> two-level hash agg where the doc's
  scalar stats ride along as grouping keys (functionally dependent on
  doc_id, so they add no cardinality and save a join).

Both emit only integers plus ratios of those integers, so a SQL oracle
reproduces every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from proj_spark.text.analysis import tokens

CHUNK_WIDTH = 8


def token_chunks(docs: DataFrame, width: int = CHUNK_WIDTH,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Segment each document into fixed-width token chunks.

    Returns one row per chunk instance: (doc_id, pos, chunk, ctok) where
    `pos` is the 0-based chunk ordinal and `ctok` the token count of the
    chunk (the final chunk may be short).  Purely per-row expressions —
    the explode multiplies rows but never shuffles.
    """
    t = docs.select(F.col(id_col).alias("doc_id"),
                    tokens(F.col(text_col)).alias("toks"))
    idx = F.sequence(F.lit(0),
                     ((F.size("toks") - F.lit(1)) / width).cast("long"))
    chunk_structs = F.transform(
        idx,
        lambda i: F.struct(
            F.array_join(F.slice(F.col("toks"), i * width + 1, width),
                         " ").alias("chunk"),
            F.least(F.lit(width),
                    F.size("toks") - i * width).cast("int").alias("ctok")))
    empty = F.array().cast("array<struct<chunk:string,ctok:int>>")
    ch = t.select(
        "doc_id",
        F.posexplode(F.when(F.size("toks") > 0, chunk_structs)
                     .otherwise(empty)).alias("pos", "c"))
    return ch.select("doc_id", "pos", F.col("c.chunk").alias("chunk"),
                     F.col("c.ctok").alias("ctok"))


def chunk_dedup_stats(docs: DataFrame, width: int = CHUNK_WIDTH,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide duplicate-chunk removal stats per document.

    A chunk instance is kept iff it is the first occurrence of its text
    corpus-wide, ordered by (doc_id, pos) — CCNet's "drop duplicated
    paragraphs, keep one copy" rule.  Output per doc: n_chunks,
    n_removed, n_tokens, kept_tok, kept_frac.

    Scale notes: instances shuffle on xxhash64(chunk) (8-byte keys, not
    the chunk strings; a 64-bit collision merges two chunk families and
    is the standard accepted risk — switch to two independent 64-bit
    hashes for >10^9 distinct chunks).  The keeper aggregate and the
    instance join share one key layout, then one final shuffle on
    doc_id.
    """
    ch = token_chunks(docs, width, text_col, id_col)
    keyed = ch.withColumn("k", F.xxhash64("chunk")).drop("chunk")
    keepers = keyed.groupBy("k").agg(
        F.min(F.struct("doc_id", "pos")).alias("keep"))
    marked = keyed.join(keepers, "k").withColumn(
        "removed",
        (F.col("doc_id") != F.col("keep.doc_id"))
        | (F.col("pos") != F.col("keep.pos")))
    out = marked.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("removed"), 1).otherwise(0)).alias("n_removed"),
        F.sum("ctok").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("removed"), 0).otherwise(F.col("ctok")))
        .cast("long").alias("kept_tok"))
    return out.withColumn(
        "kept_frac",
        F.round(F.col("kept_tok") / F.col("n_tokens"), 6))


# Gopher-style repetition thresholds (Rae et al. 2021, table A1 spirit —
# calibrated to whole-token bigrams rather than character n-grams)
TOP_BIGRAM_MAX_SHARE = 0.18
DUP_TOKEN_MAX_FRAC = 0.30


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document repetition metrics + Gopher-style repetition flag.

    Columns: doc_id, n_tokens, n_distinct, dup_tok_frac, n_bigrams,
    top_bigram_n, top_bigram_share, rep_flagged.
    """
    t = docs.select(F.col(id_col).alias("doc_id"),
                    tokens(F.col(text_col)).alias("toks"))
    t = t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
        F.expr(
            # Bigrams shuffle as xxhash64 int64 keys, not strings (the
            # ngram_pairs trick): counts are identical absent a 64-bit
            # collision (~1e-12/doc), which would surface as a visible
            # oracle mismatch; the DuckDB twin keeps literal strings.
            # zip_with over two slices, NOT transform-with-indexing:
            # CollapseProject inlines `toks` into every lambda element
            # access, so `i -> f(toks[i-1], toks[i])` re-tokenizes the
            # document per ELEMENT (O(tokens^2), measured 20x slower);
            # zip_with binds the element variables directly and
            # references `toks` only a constant number of times.
            "CASE WHEN size(toks) >= 2 THEN zip_with("
            "slice(toks, 1, size(toks) - 1), "
            "slice(toks, 2, size(toks) - 1), "
            "(a, b) -> xxhash64(a, b)) "
            "ELSE array() END").alias("bigrams"))
    bg = t.select("doc_id", "n_tokens", "n_distinct",
                  F.explode("bigrams").alias("bigram"))
    counts = bg.groupBy("doc_id", "n_tokens", "n_distinct", "bigram").agg(
        F.count("*").alias("bn"))
    agg = counts.groupBy("doc_id", "n_tokens", "n_distinct").agg(
        F.sum("bn").cast("long").alias("n_bigrams"),
        F.max("bn").alias("top_bigram_n"))
    dup_frac = F.round(
        (F.col("n_tokens") - F.col("n_distinct")) / F.col("n_tokens"), 6)
    share = F.round(F.col("top_bigram_n") / F.col("n_bigrams"), 6)
    return (agg
            .withColumn("dup_tok_frac", dup_frac)
            .withColumn("top_bigram_share", share)
            .withColumn(
                "rep_flagged",
                (F.col("top_bigram_share") > TOP_BIGRAM_MAX_SHARE)
                | (F.col("dup_tok_frac") > DUP_TOKEN_MAX_FRAC))
            .select("doc_id", "n_tokens", "n_distinct", "dup_tok_frac",
                    "n_bigrams", "top_bigram_n", "top_bigram_share",
                    "rep_flagged"))
