"""Bucketed (co-located) joins: pay the shuffle once at write time,
never again at read time.

At 100 TB the recurring joins of the pages workload — pages x domain
stats on `domain`, pages x admin cover on `cell`, fact x dimension on
any stable key — each cost a full hash exchange of the big side *every
run*.  Bucketing amortizes that: `bucketBy(n, key)` hash-partitions the
rows into n files-per-partition at write time and records the layout in
the catalog; a later join of two tables bucketed by the same key into
the same bucket count is planned WITHOUT any Exchange (and, if the
writes were `sortBy`-ed, without a Sort).  This is Spark's native
analogue of the reference's precomputed-grid dispatch — do the
expensive organization once, then every query is a lookup
(src/apply_gridshift.cpp:182+ subgrid trees play the same role for
grid files).

Mechanics worth knowing at scale (and asserted by tests/test_bucketing.py):

  - Bucket count is part of the layout contract: both sides must hash
    into the SAME modulus (or a multiple, with
    spark.sql.bucketing.coalesceBucketsInJoin.enabled) for the
    co-located plan to fire.
  - The hash is Spark's Murmur3 (`F.hash`), not hive's — mixing
    writers breaks co-location silently; stick to one engine's layout.
  - One bucket != one file: each *task* writes one file per bucket it
    sees, so repartition by the bucket column first to keep file counts
    O(buckets), not O(tasks x buckets).
  - AQE cannot re-split a skewed bucket (the layout pins it); choose
    the bucket key like a shuffle key — high cardinality, low skew
    (url/domain-hash yes, country-code no).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   num_buckets: int, sort_cols: list[str] | None = None,
                   path: str | None = None) -> None:
    """Persist ``df`` as a parquet table bucketed by ``bucket_col``.

    ``path`` makes it an external table (data lives there; only the
    layout metadata enters the catalog).  Repartitions by the bucket
    column first so each bucket is written by one task — O(buckets)
    files instead of O(tasks x buckets).
    """
    w = (df.repartition(num_buckets, bucket_col)
           .write.format("parquet").mode("overwrite")
           .bucketBy(num_buckets, bucket_col))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str | list[str], how: str = "inner") -> DataFrame:
    """Join two tables previously written with :func:`write_bucketed`
    on their bucket key.  With matching bucket counts the physical plan
    is a SortMergeJoin with NO Exchange on either side — verify with
    ``df.explain('formatted')`` (tests/test_bucketing.py locks it)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
