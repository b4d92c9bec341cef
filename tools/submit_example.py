"""Example spark-submit job: whole-planet UTM projection + tile rollup.

    python tools/make_pyfiles.py
    spark-submit --master <cluster> --py-files proj_spark.zip \
        tools/submit_example.py <pages_parquet_dir> <output_dir>

Shows the deployment shape: the package ships as a zip, operators are
constructed on the driver, their plan-time constants travel inside the
UDF closures, and the output lands as a partition-checkpointed table
with per-partition lineage (resumable with the same command).
"""

from __future__ import annotations

import os
import sys

# running directly (python tools/submit_example.py) instead of through
# spark-submit --py-files: put the repo root on the path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(pages_dir: str, out_dir: str) -> None:
    spark = (SparkSession.builder.appName("spark-geo-utm-tiles")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    from proj_spark.pages import extract_geotags
    from proj_spark.plans import CheckpointedStage
    from proj_spark.spark.udf import utm_fwd_udf
    from proj_spark.spatial import cells

    pages = spark.read.parquet(pages_dir)
    pts = extract_geotags(pages).where(F.col("lat").isNotNull())
    u = utm_fwd_udf()
    prj = (pts.withColumn("_u", u(F.col("lon"), F.col("lat")))
           .select("url",
                   F.col("_u.zone").alias("zone"),
                   F.col("_u.x").alias("easting"),
                   F.col("_u.y").alias("northing"),
                   cells.cell_id(F.col("lon"), F.col("lat"), 12)
                   .alias("cell12")))
    stage = CheckpointedStage(out_dir, "zone")
    metrics = stage.run(prj)
    print("stage metrics:", metrics)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
