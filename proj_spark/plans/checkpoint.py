"""Checkpointed stages: idempotent per-partition writes + lineage/metrics.

North-rule requirement: every long-running stage of the engine must be
resumable from checkpoint, with per-partition lineage records and
metrics, so that a re-submitted job redoes only the partitions whose
inputs changed (or whose outputs are missing) and nothing else.

Design (Iceberg-style over plain parquet so it runs in this sandbox;
swap the table format for Iceberg `overwrite-by-partition` on a real
cluster — the protocol is identical):

  <root>/data/<part_col>=<value>/...parquet     stage output, partitioned
  <root>/lineage/commit=<seq>/...parquet        per-partition lineage log

A lineage record is (partition value, input_fingerprint, row_count,
wall-time, commit seq).  The input fingerprint is an order-independent
content hash of the *input* rows for that partition:
    xor(xxhash64(struct(input columns)))  +  count
computed in the same Spark pass that stages the data — one extra
aggregate, no second scan.

`run()` protocol:
  1. compute per-partition fingerprints of the input;
  2. diff against the latest committed lineage (and against the actual
     presence of the partition directory — a crash between data write
     and lineage commit, or a manually deleted partition, both resolve
     to "rewrite");
  3. rewrite ONLY the stale partitions via dynamic partition overwrite
     (partition-level idempotence: re-running with the same input is a
     no-op; re-running after a crash completes the missing partitions);
  4. append the new lineage records as the next commit.

The reference has no notion of this (single-process library); the
analogue is the deterministic plan-time setup (src/init.cpp) that makes
re-running a pipeline reproducible — determinism is what makes
partition-level resume sound here too.
"""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class CheckpointedStage:
    """A named, partition-checkpointed materialization of a DataFrame.

    Parameters
    ----------
    path : checkpoint root directory (local/posix here; any Hadoop FS URI
        on a cluster).
    partition_col : column whose values define the resume granularity —
        use a coarse deterministic key (cell prefix, UTM zone, date) so
        partition counts stay in the 10^2..10^4 range at 100 TB.
    """

    def __init__(self, path: str, partition_col: str):
        self.path = path
        self.partition_col = partition_col
        self.data_path = os.path.join(path, "data")
        self.lineage_path = os.path.join(path, "lineage")

    # -- lineage bookkeeping ------------------------------------------------

    def _commits(self) -> list[int]:
        return sorted(
            int(os.path.basename(p).split("=")[1])
            for p in glob.glob(os.path.join(self.lineage_path, "commit=*")))

    def latest_lineage(self, spark: SparkSession) -> DataFrame | None:
        """Latest committed lineage record per partition (or None)."""
        if not self._commits():
            return None
        df = spark.read.option("basePath", self.lineage_path).parquet(
            os.path.join(self.lineage_path, "commit=*"))
        w = F.max("commit").over(Window.partitionBy("part"))
        return df.withColumn("_mx", w).where(F.col("commit") == F.col("_mx")).drop("_mx")

    # Spark/Hive write null partition values under this directory name;
    # using the same sentinel as the fingerprint key keeps null-keyed rows
    # in the stale-diff protocol instead of silently dropping them.
    NULL_PART = "__HIVE_DEFAULT_PARTITION__"

    def _fingerprints(self, df: DataFrame) -> DataFrame:
        cols = [c for c in df.columns]
        h = F.xxhash64(F.struct(*[F.col(c) for c in cols]))
        key = F.coalesce(F.col(self.partition_col).cast("string"),
                         F.lit(self.NULL_PART))
        return (df.groupBy(key.alias("part"))
                .agg(F.bit_xor(h).alias("fp"), F.count("*").alias("rows")))

    def _existing_partitions(self) -> set[str]:
        from urllib.parse import unquote
        out = set()
        for p in glob.glob(os.path.join(self.data_path, f"{self.partition_col}=*")):
            # Hive escapes special chars in directory names as %XX — unescape
            # so values like "a b/c" compare equal to the fingerprint key
            out.add(unquote(os.path.basename(p).split("=", 1)[1]))
        return out

    # -- the stage protocol -------------------------------------------------

    def run(self, df: DataFrame, force: bool = False) -> dict:
        """Materialize `df` under the checkpoint, rewriting only stale
        partitions.  Returns metrics: {written, skipped, rows_written,
        commit, sec}."""
        spark = df.sparkSession
        t0 = time.time()
        fps = {r["part"]: (r["fp"], r["rows"])
               for r in self._fingerprints(df).collect()}
        prev = self.latest_lineage(spark)
        prev_fp = {}
        if prev is not None and not force:
            prev_fp = {r["part"]: (r["fp"], r["rows"]) for r in prev.collect()}
        on_disk = self._existing_partitions()

        stale = [p for p, v in fps.items()
                 if force or prev_fp.get(p) != v or p not in on_disk]
        skipped = len(fps) - len(stale)
        rows_written = 0
        if stale:
            part_col = F.col(self.partition_col).cast("string")
            non_null = [p for p in stale if p != self.NULL_PART]
            cond = part_col.isin(non_null) if non_null else F.lit(False)
            if self.NULL_PART in stale:
                # isin() never matches NULL — select null-keyed rows explicitly
                cond = cond | F.col(self.partition_col).isNull()
            sub = df.where(cond)
            rows_written = sum(v[1] for p, v in fps.items() if p in set(stale))
            (sub.write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy(self.partition_col)
             .parquet(self.data_path))
        commit = (self._commits()[-1] + 1) if self._commits() else 0
        lineage_rows = [(p, int(v[0]), int(v[1])) for p, v in fps.items()]
        (spark.createDataFrame(lineage_rows, "part string, fp long, rows long")
         .withColumn("wall_sec", F.lit(round(time.time() - t0, 3)))
         .coalesce(1)
         .write.mode("overwrite")
         .parquet(os.path.join(self.lineage_path, f"commit={commit}")))
        return {"written": len(stale), "skipped": skipped,
                "rows_written": rows_written, "commit": commit,
                "sec": round(time.time() - t0, 3)}

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("basePath", self.data_path).parquet(self.data_path)

    def metrics(self, spark: SparkSession) -> DataFrame:
        """Full lineage/metrics history (one row per partition per commit)."""
        return spark.read.option("basePath", self.lineage_path).parquet(
            os.path.join(self.lineage_path, "commit=*"))
