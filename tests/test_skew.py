"""Skew-handling helpers (spatial/skew.py): the salted two-phase
aggregations and top-k must be row-identical to their naive forms on a
deliberately hot-keyed input (tools/stress_skew.py measures the task
balance at 6M rows; these tests pin the exactness contract)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _hot_df(spark, n=5000):
    # one key owns ~30% of rows; the rest spread over ~200 keys
    df = spark.range(n).withColumnRenamed("id", "i")
    key = F.when(F.col("i") % 3 == 0, F.lit("hot")).otherwise(
        F.concat(F.lit("k"), F.pmod(F.xxhash64("i"), F.lit(200))
                 .cast("string")))
    return df.select(
        "i", key.alias("key"),
        F.pmod(F.xxhash64("i", F.lit(7)), F.lit(997)).alias("v"),
        F.concat(F.lit("u"), (F.col("i") % 400).cast("string"))
        .alias("dupval"))


def test_salted_count_matches_naive(spark):
    from proj_spark.spatial.skew import salted_count
    df = _hot_df(spark)
    naive = {(r["key"],): r["n"] for r in
             df.groupBy("key").agg(F.count("*").alias("n")).collect()}
    salted = {(r["key"],): r["n"] for r in
              salted_count(df, ["key"], "i", k=8).collect()}
    assert naive == salted


def test_salted_distinct_count_matches_naive(spark):
    from proj_spark.spatial.skew import salted_distinct_count
    df = _hot_df(spark)
    naive = {r["key"]: r["nd"] for r in
             df.groupBy("key")
             .agg(F.countDistinct("dupval").alias("nd")).collect()}
    salted = {r["key"]: r["nd"] for r in
              salted_distinct_count(df, ["key"], "dupval", k=8,
                                    count_name="nd").collect()}
    assert naive == salted


def test_salted_topk_matches_naive_window(spark):
    from proj_spark.spatial.skew import salted_topk
    df = _hot_df(spark)
    w = Window.partitionBy("key").orderBy(F.desc("v"), "i")
    naive = sorted(
        (r["key"], r["i"], r["r"]) for r in
        df.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= 3).collect())
    salted = sorted(
        (r["key"], r["i"], r["rank"]) for r in
        salted_topk(df, ["key"], "i", [F.desc("v"), F.asc("i")],
                    3, salt_k=8).collect())
    assert naive == salted
