"""Corpus-curation operators for training-data pipelines.

Deterministic stratified sampling, dedup-group representative selection,
CCNet-style popularity bucketing (Wenzek et al., "CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data", LREC 2020) and
rational tf-idf distinctive-term ranking — all pure DataFrame
expressions (no UDFs), all with exact-integer arithmetic so a DuckDB
oracle can replay them bit-for-bit.

Scale notes (10^12 docs):
  - the sampler is a map-only filter (zero shuffles);
  - popularity is one token shuffle + one broadcast join back (the
    vocabulary aggregate is tiny relative to the corpus);
  - bucket thresholds are two distributed TakeOrdered top-k jobs, not a
    single-partition global window — ntile() without PARTITION BY would
    funnel the corpus through one task;
  - distinctive terms shuffle on token (bounded vocabulary) and window
    only within (lang,) partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 2^31 modulus keeps every intermediate product below 2^63 even under
# ANSI mode (no silent-wrap dependence): (2^31-1) * 2654435761 < 2^63.
_M = 2_147_483_648
_K1 = 2_654_435_761  # Knuth multiplicative constants
_K2 = 40_503


def hash31(col: F.Column) -> F.Column:
    """Deterministic 31-bit integer mix of a non-negative long column.

    Two multiply-xor-shift rounds entirely in [0, 2^63) so it is exact
    (and identical) in Spark longs, DuckDB BIGINTs, and ANSI mode.  The
    xor/shift is expressed with integer division so both dialects agree
    without unsigned-shift builtins.
    """
    h = F.pmod(F.pmod(col.cast("long"), F.lit(_M)) * F.lit(_K1), F.lit(_M))
    h = h.bitwiseXOR(F.floor(h / F.lit(65536)).cast("long"))
    h = F.pmod(h * F.lit(_K2), F.lit(_M))
    h = h.bitwiseXOR(F.floor(h / F.lit(65536)).cast("long"))
    return F.pmod(h * F.lit(_K1), F.lit(_M))


def hash31_sql(expr: str) -> str:
    """DuckDB twin of :func:`hash31` (same ops, same parenthesization)."""
    h = f"((({expr}) % {_M}) * {_K1}) % {_M}"
    h = f"xor({h}, ({h}) // 65536)"
    h = f"(({h}) * {_K2}) % {_M}"
    h = f"xor({h}, ({h}) // 65536)"
    return f"(({h}) * {_K1}) % {_M}"


def sample_key(col: F.Column, denom: int = 10_000) -> F.Column:
    """Uniform-ish sampling key in [0, denom) from a long id column.

    Keep a row iff ``sample_key(id) < rate``; the decision is a pure
    per-row expression (map-only, no shuffle, reproducible across runs,
    cluster sizes, and engines — unlike ``df.sample`` whose output
    depends on partitioning).
    """
    return F.pmod(hash31(col), F.lit(denom))


def sample_key_sql(expr: str, denom: int = 10_000) -> str:
    return f"({hash31_sql(expr)}) % {denom}"


def stratified_sample(df: DataFrame, strata_col: str, id_col: str,
                      rates: dict[str, int], default_rate: int,
                      denom: int = 10_000) -> DataFrame:
    """Deterministic per-stratum downsampling.

    ``rates`` maps stratum value -> kept fraction in basis points of
    ``denom``.  Returns ``df`` filtered to the kept rows plus a
    ``_rate`` column.  One CASE + one hash per row; zero shuffles.
    """
    rate = F.lit(default_rate)
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(rate)
    return (df.withColumn("_rate", rate)
              .where(sample_key(F.col(id_col)) < F.col("_rate")))


def keep_longest(docs: DataFrame, comp: DataFrame,
                 id_col: str = "doc_id") -> DataFrame:
    """Pick one representative per dedup component: the doc with the most
    tokens, ties broken by the smallest id (exact-integer policy — no
    float quality scores whose ulp drift could flip an argmax).

    `comp` is the (id, comp_id) assignment from
    :func:`proj_spark.text.components.dedup_assign`.  One hash
    aggregation on comp_id.
    """
    from proj_spark.text.analysis import tokens

    n_tok = F.size(tokens(F.col("text"))).cast("long")
    scored = (docs.select(F.col(id_col).cast("long").alias(id_col),
                          n_tok.alias("n_tokens"))
              .join(comp.select(F.col(id_col).cast("long").alias(id_col),
                                F.col("comp_id").cast("long").alias("comp_id")),
                    id_col))
    return (scored.groupBy("comp_id")
            .agg(F.count("*").alias("comp_size"),
                 F.max_by(id_col, F.struct(F.col("n_tokens"),
                                           -F.col(id_col))).alias("keep_id"),
                 F.max(F.struct(F.col("n_tokens"), -F.col(id_col)))
                  .getField("n_tokens").alias("keep_tokens")))


def doc_popularity(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document unigram popularity: mean corpus frequency of the
    document's tokens (CCNet's LM-perplexity proxy, kept exact-rational:
    ``pop = sum(corpus_count(tok)) / n_tokens`` — both operands exact
    BIGINTs, one IEEE division, so the double is bit-identical in any
    engine).  Low popularity ~ rare/tail text, high ~ head boilerplate.

    Two aggregations: token counts (shuffle on token, bounded by the
    vocabulary) broadcast back onto the exploded tokens, then a per-doc
    rollup.  No global sort, no window.
    """
    from proj_spark.text.analysis import tokens

    toks = docs.select(F.col(id_col).cast("long").alias(id_col), "lang",
                       F.explode(tokens(F.lower(F.col("text")))).alias("token"))
    vocab = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    return (toks.join(F.broadcast(vocab), "token")
            .groupBy(id_col, "lang")
            .agg(F.sum("cnt").alias("pop_sum"),
                 F.count("*").alias("n_tokens"))
            .withColumn("pop", F.col("pop_sum").cast("double")
                        / F.col("n_tokens")))


def _kth_threshold(pop: DataFrame, k: int) -> tuple:
    """The k-th row of `pop` under (pop DESC, doc_id ASC) — found with a
    distributed TakeOrdered top-k (orderBy().limit() never funnels the
    relation through one partition) + a min-of-struct over the prefix."""
    row = (pop.orderBy(F.col("pop").desc(), F.col("doc_id"))
           .limit(k)
           .agg(F.max(F.struct((-F.col("pop")).alias("neg"),
                               F.col("doc_id").alias("d"))).alias("s"))
           .collect()[0]["s"])
    return (-row["neg"], row["d"])


def ccnet_buckets(docs: DataFrame) -> DataFrame:
    """CCNet head/middle/tail terciles over doc popularity.

    Buckets are NTILE(3)-compatible (first ``n % 3`` buckets one row
    larger) but computed with two TakeOrdered threshold probes + a
    map-side CASE instead of a global single-partition window, so the
    plan scales: threshold discovery is O(n log k) distributed, the
    bucketing pass is shuffle-free.
    """
    pop = doc_popularity(docs)
    n = pop.count()
    k1 = n // 3 + (1 if n % 3 >= 1 else 0)
    k2 = k1 + n // 3 + (1 if n % 3 >= 2 else 0)
    p1, d1 = _kth_threshold(pop, k1)
    p2, d2 = _kth_threshold(pop, k2)
    after = lambda p, d: (F.col("pop") < F.lit(p)) | \
        ((F.col("pop") == F.lit(p)) & (F.col("doc_id") > F.lit(d)))
    bucket = (F.when(after(p2, d2), F.lit(3))
              .when(after(p1, d1), F.lit(2)).otherwise(F.lit(1)))
    return pop.withColumn("bucket", bucket.cast("long"))


def distinctive_terms(docs: DataFrame, top_k: int = 10) -> DataFrame:
    """Top-k distinctive terms per language by rational tf-idf.

    score = (tf * 1_000_000) div df  — term frequency within the
    language scaled against corpus-wide document frequency, kept as an
    exact BIGINT integer division (the classic log-idf variant would
    hinge argmax ordering on libm ulps; the rational score ranks the
    same way for fixed tf as idf is monotone in 1/df).

    Shuffles once on token (vocabulary-bounded), windows within lang.
    """
    from proj_spark.text.analysis import tokens

    toks = docs.select(F.col("doc_id").cast("long").alias("doc_id"), "lang",
                       F.explode(tokens(F.lower(F.col("text")))).alias("token"))
    tf = toks.groupBy("lang", "token").agg(F.count("*").alias("tf"))
    df_ = (toks.groupBy("token")
           .agg(F.count_distinct("doc_id").alias("df")))
    scored = (tf.join(F.broadcast(df_), "token")
              .withColumn("score", F.expr("tf * 1000000L div df")))
    w = Window.partitionBy("lang").orderBy(F.col("score").desc(), "token")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= top_k)
            .select("lang", "token", F.col("tf").cast("long").alias("tf"),
                    F.col("df").cast("long").alias("df"),
                    F.col("score").cast("long").alias("score"),
                    F.col("rank").cast("long").alias("rank")))


def pareto_skyline(df: DataFrame, grp: str, id_col: str,
                   m1: str, m2: str) -> DataFrame:
    """2-D Pareto skyline per group: rows not STRICTLY dominated on the
    (maximize m1, maximize m2) plane — the data-selection frontier
    ("no other doc is at least as long AND at least as high-quality,
    better in one").  Exact integer semantics; duplicate (m1, m2)
    points dominate nothing and all survive.

    Scale shape: a naive skyline windows over the whole group (one
    giant partition per group — unusable at 10^12 rows).  Instead the
    frontier is computed on the (group, m1) PRE-AGGREGATE — max(m2)
    per distinct m1, a relation bounded by the metric's cardinality,
    not the corpus — with one running-max window over that tiny
    relation, then a broadcast join back.  The corpus side is touched
    by exactly one partial-agg shuffle on (group, m1).

    Keep rule: a row survives iff its m2 equals its (group, m1) max
    AND beats max(m2) over all STRICTLY larger m1 (NULL-safe at the
    longest m1).
    """
    mx = df.groupBy(grp, m1).agg(F.max(m2).alias("_mq"))
    w = (Window.partitionBy(grp).orderBy(F.col(m1).desc())
         .rowsBetween(Window.unboundedPreceding, -1))
    mx = mx.withColumn("_A", F.max("_mq").over(w))
    keep = ((F.col(m2) == F.col("_mq"))
            & (F.col("_A").isNull() | (F.col(m2) > F.col("_A"))))
    return (df.join(F.broadcast(mx), [grp, m1])
            .where(keep)
            .select(grp, id_col, m1, m2))
