"""Skew handling for dense keys: deterministic salting + two-phase
aggregation.

The pages workload is Zipf-skewed twice over: popular domains and urban
cells concentrate a large share of rows on a few keys.  A plain
`groupBy(key).agg(...)` then routes each hot key to one reducer.  The
standard fix (SURVEY.md 2.B "skew handling"):

  phase 1: group by (key, salt) where salt = pmod(xxhash64(row-id), k)
           — hot keys fan out over k reducers, partial results are tiny
  phase 2: group by key over the k partials

Salting is DETERMINISTIC (hash of a stable row id, never rand()) so
checkpoint/lineage fingerprints and resume stay idempotent.  AQE's
skew-join splitting handles *join* skew at runtime; explicit salting is
still needed for aggregation skew, which AQE does not rebalance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(stable_id: Column, k: int) -> Column:
    """Deterministic salt in [0, k) from a stable row identifier."""
    return F.pmod(F.xxhash64(stable_id), F.lit(k))


def salted_count(df: DataFrame, key_cols: list[str], stable_id: str,
                 k: int = 16, count_name: str = "n") -> DataFrame:
    """Two-phase count per key, skew-immune and bit-identical to the
    naive groupBy().count()."""
    salted = df.withColumn("_salt", salt_col(F.col(stable_id), k))
    partial = (salted.groupBy(*key_cols, "_salt")
               .agg(F.count("*").alias("_pn")))
    return (partial.groupBy(*key_cols)
            .agg(F.sum("_pn").alias(count_name)))


def salted_distinct_count(df: DataFrame, key_cols: list[str], value_col: str,
                          k: int = 16,
                          count_name: str = "n_distinct") -> DataFrame:
    """Two-phase exact COUNT(DISTINCT value) per key.

    Salting by the VALUE keeps each distinct value in exactly one salt
    bucket, so per-bucket distinct counts add up exactly."""
    salted = df.withColumn("_salt", salt_col(F.col(value_col), k))
    partial = (salted.groupBy(*key_cols, "_salt")
               .agg(F.countDistinct(value_col).alias("_pn")))
    return (partial.groupBy(*key_cols)
            .agg(F.sum("_pn").alias(count_name)))


def salted_topk(df: DataFrame, key_cols: list[str], stable_id: str,
                order_cols: list[Column], k: int,
                salt_k: int = 16) -> DataFrame:
    """Two-phase per-key top-k, skew-immune and row-identical to the
    naive `row_number().over(partitionBy(key).orderBy(...)) <= k` as
    long as `order_cols` is a TOTAL order (include a unique tiebreaker).

    phase 1: top-k within (key, salt) — the hot key's rows sort in
             salt_k bounded tasks instead of one;
    phase 2: top-k of the <= salt_k*k survivors per key (tiny).

    Spark's own WindowGroupLimit pushdown already bounds the plain
    rank<=k filter form; this helper is the explicit fallback for
    rankings the pushdown cannot cover (see tools/stress_skew.py for
    the measured comparison)."""
    from pyspark.sql import Window
    salted = df.withColumn("_salt", salt_col(F.col(stable_id), salt_k))
    w1 = Window.partitionBy(*key_cols, "_salt").orderBy(*order_cols)
    cand = (salted.withColumn("_r1", F.row_number().over(w1))
            .where(F.col("_r1") <= k).drop("_r1", "_salt"))
    w2 = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (cand.withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= k))
