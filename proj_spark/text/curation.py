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


# --- DSIR: Data Selection via Importance Resampling (Xie et al. 2023) ---

_FOLD_P = 1_000_003  # polynomial string-fold modulus (31-base Horner)


def str_fold(col: F.Column) -> F.Column:
    """Deterministic polynomial fold of a string's Unicode code points:
    ``h = (h * 31 + codepoint) mod 1_000_003`` — Horner's rule as a pure
    JVM expression (``transform`` + ``aggregate``), no UDF.  ``ascii()``
    returns the full code point in both Spark and DuckDB (verified for
    Latin-1, CJK and currency symbols), so :func:`str_fold_sql` is
    bit-identical on any UTF-8 token."""
    return F.aggregate(
        F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda a, b: F.pmod(a * F.lit(31) + b, F.lit(_FOLD_P)))


def str_fold_sql(expr: str) -> str:
    """DuckDB twin of :func:`str_fold` (same fold, same modulus)."""
    return (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(regexp_split_to_array({expr}, ''), "
            f"c -> CAST(ascii(c) AS BIGINT))), "
            f"(a, b) -> (a * 31 + b) % {_FOLD_P})")


def str_bucket(col: F.Column, n_buckets: int) -> F.Column:
    """Hashed-feature bucket in ``[0, n_buckets)``: polynomial fold of
    the string, then the :func:`hash31` integer mix (the fold alone is
    too linear for power-of-two bucket counts)."""
    return F.pmod(hash31(str_fold(col)), F.lit(n_buckets))


def str_bucket_sql(expr: str, n_buckets: int) -> str:
    return f"({hash31_sql(str_fold_sql(expr))}) % {n_buckets}"


def dsir_weights(docs: DataFrame, target: F.Column, n_buckets: int = 256,
                 text_col: str = "text", id_col: str = "doc_id",
                 quant: float = 1e6) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for Language
    Models via Importance Resampling", NeurIPS 2023): score every raw
    document by how target-like its hashed n-gram bag is,

        log w(d) = sum_b c_db * [ln p_tgt(b) - ln p_raw(b)]

    over unigram+bigram features hashed into ``n_buckets`` buckets, with
    add-1 smoothing.  ``target`` is a boolean Column marking the target
    subcorpus (rows also remain part of raw, as in the paper's
    raw-vs-target formulation).

    Exactness: each bucket's log-ratio is quantized ONCE to an integer
    (``round(lr * quant)``, a single transcendental over exact BIGINT
    counts — identical in any engine), so the per-document sum
    ``logw_q = sum(c_db * lr_q) + n_d * off_q`` is exact 64-bit integer
    arithmetic: no float-summation-order dependence anywhere, and the
    selection cut (top-k by ``logw_q``) is engine-independent.

    Scale (10^12 docs): tokenize/hash are codegen'd expressions; the
    doc-bucket aggregate is one map-side-combinable shuffle on
    (doc, bucket); the bucket table is ``n_buckets`` rows — broadcast;
    the final per-doc sum reuses the same (doc, bucket) partitioning.
    Nothing driver-side, no UDF.

    Returns (doc_id, n_feats, logw_q, logw) — one row per document with
    at least one token.
    """
    a = F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                 lambda t: t != "")
    base = docs.select(F.col(id_col).cast("long").alias("_id"),
                       target.cast("long").alias("_tgt"),
                       a.alias("_a"))
    feats = F.concat(
        F.col("_a"),
        F.when(F.size("_a") >= 2, F.expr(
            "transform(sequence(0, size(_a) - 2), "
            "i -> concat(_a[i], ' ', _a[i + 1]))"))
        .otherwise(F.expr("CAST(array() AS ARRAY<STRING>)")))
    bk = (base.select("_id", "_tgt", F.explode(feats).alias("_f"))
          .select("_id", "_tgt", str_bucket(F.col("_f"), n_buckets)
                  .alias("_b")))
    db = bk.groupBy("_id", "_b").agg(F.count("*").alias("_c"))
    bs = bk.groupBy("_b").agg(F.count("*").alias("_cr"),
                              F.sum("_tgt").alias("_ct"))
    lr = bs.select("_b", F.round(
        (F.log((F.col("_ct") + 1).cast("double"))
         - F.log((F.col("_cr") + 1).cast("double"))) * F.lit(quant), 0)
        .cast("long").alias("_lrq"))
    tot = bk.agg(F.round(
        (F.log((F.count("*") + n_buckets).cast("double"))
         - F.log((F.sum("_tgt") + n_buckets).cast("double")))
        * F.lit(quant), 0).cast("long").alias("_offq"))
    agg = (db.join(F.broadcast(lr), "_b")
           .groupBy("_id")
           .agg(F.sum("_c").cast("long").alias("n_feats"),
                F.sum(F.col("_c") * F.col("_lrq")).cast("long")
                .alias("_sq")))
    return (agg.crossJoin(F.broadcast(tot))
            .select(F.col("_id").alias("doc_id"), "n_feats",
                    (F.col("_sq") + F.col("n_feats") * F.col("_offq"))
                    .alias("logw_q"))
            .withColumn("logw", F.round(F.col("logw_q") / F.lit(quant), 6)))
