"""Bucketed co-located joins: the write-once-shuffle-never layout.

Locks the two properties the 100 TB design buys with bucketing:
  1. a join of two same-key same-count bucketed tables plans with ZERO
     Exchange nodes (the shuffle was paid at write time), and
  2. the co-located join returns exactly the same rows as the plain
     shuffled join of the same inputs.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from proj_spark.plans.bucketing import bucketed_join, write_bucketed


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def pages_and_stats(spark):
    pages = spark.range(0, 400).select(
        F.concat(F.lit("d"), (F.col("id") % 37).cast("string")).alias("domain"),
        F.concat(F.lit("https://u/"), F.col("id").cast("string")).alias("url"),
        (F.col("id") * 7 % 100).cast("double").alias("score"),
    )
    stats = spark.range(0, 37).select(
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("domain"),
        (F.col("id") % 5).alias("tier"),
    )
    return pages, stats


def test_bucketed_join_no_exchange(spark, pages_and_stats, tmp_path):
    pages, stats = pages_and_stats
    write_bucketed(pages, "b_pages", "domain", 4, sort_cols=["domain"],
                   path=str(tmp_path / "pages"))
    write_bucketed(stats, "b_stats", "domain", 4, sort_cols=["domain"],
                   path=str(tmp_path / "stats"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_pages", "b_stats", "domain")
        plan = plan_of(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan

        # identical rows to the plain shuffled join of the same inputs
        plain = pages.join(stats, "domain").select("domain", "url", "tier")
        got = sorted(map(tuple, joined.select("domain", "url", "tier").collect()))
        want = sorted(map(tuple, plain.collect()))
        assert got == want and len(got) == 400

        # control: the SAME join without the bucketed layout must shuffle —
        # proves the assertion above is detecting bucketing, not AQE luck
        ctrl = plan_of(pages.join(stats, "domain"))
        assert "Exchange" in ctrl
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_pages")
        spark.sql("DROP TABLE IF EXISTS b_stats")


def test_bucketed_file_layout(spark, pages_and_stats, tmp_path):
    """One task per bucket: file count stays O(buckets), not O(tasks)."""
    pages, _ = pages_and_stats
    write_bucketed(pages, "b_layout", "domain", 4, path=str(tmp_path / "p"))
    try:
        files = [p for p in (tmp_path / "p").iterdir()
                 if p.name.endswith(".parquet")]
        assert len(files) == 4
    finally:
        spark.sql("DROP TABLE IF EXISTS b_layout")
