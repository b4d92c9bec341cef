"""Small-file compaction for partitioned parquet datasets.

At 10^12 rows the ingest layer (streaming micro-batches, per-executor
writers, checkpoint resumes) inevitably litters partitions with files
far below the scan-efficient size; every downstream query then pays
per-file open/footer costs and the scheduler drowns in splits.  The
reference engine never faces this (it is a single-process library);
this is the table-maintenance half of running the SAME workload on a
cluster — the analogue of Iceberg's rewrite_data_files / Delta's
OPTIMIZE, implemented directly over a parquet directory layout.

Design:
  - per PARTITION (never across partitions — partition pruning must
    keep working), files are bin-packed by size into groups of at most
    `target_bytes`; a partition whose layout is already no worse than
    the packed layout is SKIPPED (idempotence: a second compact run is
    a no-op).
  - each rewritten partition is read file-list-explicitly, coalesced
    to the packed group count, written to a shadow directory, then
    swapped in atomically-per-partition (rename of the partition dir);
    a crash between swap steps leaves every partition either old or
    new, never mixed — the same per-partition atomicity contract as
    CheckpointedStage's dynamic-partition overwrite.
  - coalesce (narrow) not repartition: compaction must MERGE files
    without paying a shuffle of the partition's data.  The tradeoff
    (coalesced tasks read multiple files each) is exactly the point.

Local filesystem paths are manipulated with os/shutil; on HDFS/S3 the
same moves map to FileSystem.rename / S3 multi-part copy — the swap
step is the only storage-API-specific code.

No reference-file analogue (table maintenance is outside PROJ's
scope); the partition-directory walk mirrors the layout conventions of
plans/checkpoint.py.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def _data_files(d: str) -> list[tuple[str, int]]:
    out = []
    for fn in os.listdir(d):
        p = os.path.join(d, fn)
        if os.path.isfile(p) and fn.endswith(".parquet") \
                and not fn.startswith((".", "_")):
            out.append((p, os.path.getsize(p)))
    return sorted(out)


def _partition_dirs(root: str) -> list[str]:
    """Leaf directories holding data files: the dataset root itself for
    unpartitioned layouts, else every key=value(/key=value...) leaf."""
    leaves = []
    for cur, dirs, _files in os.walk(root):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        if not dirs and _data_files(cur):
            leaves.append(cur)
    if not leaves and _data_files(root):
        leaves = [root]
    return sorted(leaves)


def pack_files(sizes: list[int], target_bytes: int) -> int:
    """First-fit-decreasing bin count for `sizes` under `target_bytes`.
    A file larger than the target gets its own bin (it is left as one
    output file — compaction never splits)."""
    bins: list[int] = []
    for s in sorted(sizes, reverse=True):
        for i, b in enumerate(bins):
            if b + s <= target_bytes:
                bins[i] = b + s
                break
        else:
            bins.append(s)
    return max(1, len(bins))


def compact(spark: SparkSession, root: str,
            target_bytes: int = 128 * 1024 * 1024) -> list[dict]:
    """Compact every partition of the parquet dataset at `root` whose
    file count exceeds its bin-packed minimum.  Returns one stats dict
    per partition: {partition, files_before, files_after, bytes,
    rewritten}.  Running it again is a no-op (files_after == packed
    minimum already)."""
    stats = []
    for pdir in _partition_dirs(root):
        files = _data_files(pdir)
        sizes = [s for _, s in files]
        n_target = pack_files(sizes, target_bytes)
        rel = os.path.relpath(pdir, root)
        ent = {"partition": rel if rel != "." else "",
               "files_before": len(files),
               "bytes": sum(sizes), "rewritten": False}
        if len(files) <= n_target:
            ent["files_after"] = len(files)
            stats.append(ent)
            continue
        shadow = pdir + f"._compact_{uuid.uuid4().hex[:8]}"
        (spark.read.parquet(*[p for p, _ in files])
         .coalesce(n_target)
         .write.mode("overwrite").parquet(shadow))
        # atomic-per-partition swap: old dir moves aside, shadow moves
        # in, old dir is dropped only after the swap succeeded
        old = pdir + "._compact_old"
        os.rename(pdir, old)
        os.rename(shadow, pdir)
        shutil.rmtree(old)
        ent["files_after"] = len(_data_files(pdir))
        ent["rewritten"] = True
        stats.append(ent)
    return stats


def read_back(spark: SparkSession, root: str) -> DataFrame:
    """Read the dataset with partition discovery (basePath pinned), for
    equality checks around a compaction."""
    return spark.read.option("basePath", root).parquet(root)
