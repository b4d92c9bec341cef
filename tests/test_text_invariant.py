"""The north-rule per-row invariant: extracted `text` stays byte-identical
per url through every engine stage (BASELINE.json input_hint).

Checks the invariant END-TO-END, not just by code inspection: the
per-url md5 of `text` must be identical (a) after geotag extraction,
(b) after the projection kernel + spatial join pipeline, and (c) after a
checkpoint write/read cycle — the three places a careless re-encode or
lossy write could corrupt bytes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proj_spark.pages import extract_geotags, pages_table


@pytest.fixture(scope="module")
def pages(spark):
    return pages_table(spark, 6000, 100)


def _digests(df):
    return {r["url"]: r["d"] for r in
            df.select("url", F.md5(F.col("text")).alias("d")).collect()}


def test_text_unchanged_by_extraction(spark, pages):
    base = _digests(pages)
    after = _digests(extract_geotags(pages))
    assert after == base


def test_text_unchanged_through_projection_pipeline(spark, pages):
    from proj_spark.spark.udf import utm_fwd_udf
    pts = extract_geotags(pages).where(F.col("lat").isNotNull())
    base = _digests(pts)
    u = utm_fwd_udf()
    projected = (pts.withColumn("_u", u(F.col("lon"), F.col("lat")))
                 .withColumn("zone", F.col("_u.zone"))
                 .drop("_u"))
    assert _digests(projected) == base


def test_text_unchanged_through_checkpoint(spark, pages, tmp_path):
    from proj_spark.plans.checkpoint import CheckpointedStage
    pts = (extract_geotags(pages).where(F.col("lat").isNotNull())
           .withColumn("part", F.pmod(F.xxhash64("url"), F.lit(4)))
           .select("url", "text", "part"))
    base = _digests(pts)
    stage = CheckpointedStage(str(tmp_path / "ckpt"), "part")
    stage.run(pts)
    assert _digests(stage.read(spark)) == base
