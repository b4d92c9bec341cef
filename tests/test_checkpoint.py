"""Checkpoint/lineage layer: partition-level idempotent resume."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from proj_spark.plans import CheckpointedStage


@pytest.fixture()
def ckpt_dir(tmp_path):
    return str(tmp_path / "stage1")


def make_input(spark, shift=0):
    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.pmod(F.col("id"), F.lit(8))).alias("zone"),
        (F.col("id") * 31 + F.lit(shift)).alias("payload"))
    return df


def test_initial_run_writes_all(spark, ckpt_dir):
    st = CheckpointedStage(ckpt_dir, "zone")
    m = st.run(make_input(spark))
    assert m["written"] == 8 and m["skipped"] == 0
    got = st.read(spark)
    assert got.count() == 1000
    # partition pruning works on the checkpointed table
    assert got.where(F.col("zone") == 3).count() == 125


def test_rerun_is_noop(spark, ckpt_dir):
    st = CheckpointedStage(ckpt_dir, "zone")
    st.run(make_input(spark))
    m2 = st.run(make_input(spark))
    assert m2["written"] == 0 and m2["skipped"] == 8
    assert st.read(spark).count() == 1000


def test_changed_partition_rewritten(spark, ckpt_dir):
    st = CheckpointedStage(ckpt_dir, "zone")
    st.run(make_input(spark))
    # change payloads only where zone == 5
    changed = make_input(spark).withColumn(
        "payload",
        F.when(F.col("zone") == 5, F.col("payload") + 1).otherwise(F.col("payload")))
    m = st.run(changed)
    assert m["written"] == 1 and m["skipped"] == 7
    got = st.read(spark)
    assert got.count() == 1000
    assert (got.where(F.col("zone") == 5).agg(F.sum("payload")).first()[0]
            == changed.where(F.col("zone") == 5).agg(F.sum("payload")).first()[0])


def test_crash_recovery_missing_partition(spark, ckpt_dir):
    st = CheckpointedStage(ckpt_dir, "zone")
    st.run(make_input(spark))
    # simulate a crash that lost one partition's data files
    shutil.rmtree(os.path.join(ckpt_dir, "data", "zone=2"))
    m = st.run(make_input(spark))
    assert m["written"] == 1 and m["skipped"] == 7
    assert st.read(spark).count() == 1000


def test_lineage_history(spark, ckpt_dir):
    st = CheckpointedStage(ckpt_dir, "zone")
    st.run(make_input(spark))
    st.run(make_input(spark, shift=1))  # all partitions change
    hist = st.metrics(spark)
    assert hist.select("commit").distinct().count() == 2
    latest = st.latest_lineage(spark)
    assert latest.count() == 8
    assert latest.agg(F.sum("rows")).first()[0] == 1000
