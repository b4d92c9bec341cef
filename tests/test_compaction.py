"""Compaction: row-exact rewrite, bin-packed file counts, idempotence,
per-partition isolation, oversized-file passthrough."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from proj_spark.plans.compaction import (compact, pack_files,
                                         _partition_dirs, _data_files,
                                         read_back)


def _littered(spark, path, parts=3, files_per_part=12, rows=600):
    (spark.range(rows)
     .select((F.col("id") % parts).alias("p"), F.col("id").alias("v"),
             F.sha2(F.col("id").cast("string"), 256).alias("pad"))
     .repartition(files_per_part)
     .write.partitionBy("p").mode("overwrite").parquet(path))


def test_pack_files_first_fit():
    assert pack_files([10, 10, 10], 100) == 1
    assert pack_files([60, 60, 60], 100) == 3   # none pair under 100
    assert pack_files([60, 40, 40, 60], 100) == 2
    assert pack_files([250], 100) == 1          # oversized: own bin
    assert pack_files([], 100) == 1


def test_compact_rows_exact_and_fewer_files(spark, tmp_path):
    root = str(tmp_path / "ds")
    _littered(spark, root)
    before = sorted((r.p, r.v, r.pad)
                    for r in read_back(spark, root).collect())
    n_files_before = sum(len(_data_files(d))
                         for d in _partition_dirs(root))
    stats = compact(spark, root, target_bytes=512 * 1024 * 1024)
    after = sorted((r.p, r.v, r.pad)
                   for r in read_back(spark, root).collect())
    assert after == before
    assert all(s["rewritten"] for s in stats)
    n_files_after = sum(len(_data_files(d))
                        for d in _partition_dirs(root))
    assert n_files_after == len(stats) == 3     # one file per partition
    assert n_files_before == 36


def test_compact_idempotent(spark, tmp_path):
    root = str(tmp_path / "ds2")
    _littered(spark, root)
    compact(spark, root, target_bytes=512 * 1024 * 1024)
    stats2 = compact(spark, root, target_bytes=512 * 1024 * 1024)
    assert all(not s["rewritten"] for s in stats2)
    assert all(s["files_before"] == s["files_after"] for s in stats2)


def test_compact_respects_partition_boundaries(spark, tmp_path):
    root = str(tmp_path / "ds3")
    _littered(spark, root, parts=4)
    compact(spark, root, target_bytes=512 * 1024 * 1024)
    # every partition directory still exists with its own file(s)
    parts = _partition_dirs(root)
    assert sorted(os.path.basename(p) for p in parts) == \
        ["p=0", "p=1", "p=2", "p=3"]
    # and partition pruning still works after the rewrite
    n = read_back(spark, root).where("p = 2").count()
    assert n == 150


def test_compact_small_target_packs_not_one(spark, tmp_path):
    root = str(tmp_path / "ds4")
    _littered(spark, root, parts=1, files_per_part=10, rows=2000)
    files = _data_files(_partition_dirs(root)[0])
    one = files[0][1]
    # target fits ~3 files per bin -> ceil-ish packing, more than 1 file
    stats = compact(spark, root, target_bytes=3 * one + one // 2)
    assert stats[0]["rewritten"]
    assert 2 <= stats[0]["files_after"] < 10
    assert read_back(spark, root).count() == 2000


def test_compact_unpartitioned_layout(spark, tmp_path):
    root = str(tmp_path / "ds5")
    (spark.range(500).select("id")
     .repartition(8).write.mode("overwrite").parquet(root))
    stats = compact(spark, root, target_bytes=512 * 1024 * 1024)
    assert len(stats) == 1 and stats[0]["rewritten"]
    assert sorted(r.id for r in spark.read.parquet(root).collect()) \
        == list(range(500))
