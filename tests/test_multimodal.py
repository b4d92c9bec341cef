"""Multimodal plumbing: binary media columns + mapInPandas decode/
feature stages (codec stubbed deterministically; Spark-side machinery
real)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from proj_spark.text import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synth_media(spark, 60).cache()


def _names_types(schema):
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


def test_media_schema(media):
    assert _names_types(media.schema) == _names_types(mm.MEDIA_SCHEMA)
    kinds = {r["meta"]["kind"] for r in media.select("meta").collect()}
    assert kinds == {"image", "audio", "video"}


def test_media_features_end_to_end(spark, media):
    feats = mm.media_features(media)
    assert _names_types(feats.schema) == _names_types(mm.FEATURE_SCHEMA)
    rows = feats.collect()
    assert len(rows) == 60
    for r in rows:
        assert len(r["feature"]) == mm.N_FEATURES
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
        assert r["n_bytes"] == 96  # 3 md5 hex digests


def test_media_features_deterministic(spark, media):
    a = {r["media_id"]: r["feature"]
         for r in mm.media_features(media).collect()}
    b = {r["media_id"]: r["feature"]
         for r in mm.media_features(mm.synth_media(spark, 60)).collect()}
    assert a == b


def test_strict_mode_requires_real_codec(spark, media):
    feats = mm.media_features(media, strict=True)
    with pytest.raises(Exception) as exc:
        feats.collect()
    assert "no decoder registered" in str(exc.value)


def test_register_decoder_overrides_stub(spark, media):
    def loud(data, meta):
        return np.ones(64)

    mm.register_decoder("image", loud)
    try:
        feats = mm.media_features(media).where(F.col("kind") == "image")
        for r in feats.collect():
            assert all(abs(v - 1.0) < 1e-6 for v in r["feature"])
    finally:
        mm._DECODERS.pop("image", None)


def test_resize_and_frame_sampling_helpers():
    img = np.arange(64, dtype=np.float64)
    small = mm.image_resize_batch(img, 8, 8, 4, 4)
    assert small.shape == (16,)
    assert small[0] == img[0]
    vid = np.arange(4 * 6, dtype=np.float64)
    sampled = mm.video_sample_frames(vid, 3, 2, 4, every=2)
    assert sampled.shape == (12,)
    assert np.array_equal(sampled[:6], vid[:6])
    assert np.array_equal(sampled[6:], vid[12:18])


def test_ann_pairs_recall_vs_exact(spark):
    """sign-LSH all-pairs neighbors recover the genuinely-similar exact
    pairs (LSH guarantees scale with cosine: distant "nearest" neighbors
    of isotropic vectors are not recoverable by any locality hash, so
    recall is measured on pairs above a similarity floor)."""
    import __spark_entry__ as entry
    sf = "/root/testdata/sf0.01"
    exact_rows = entry.q_embed_allpairs(spark, sf).collect()
    approx = {(r["vec_id"], r["nbr_id"])
              for r in entry.q_ann_pairs(spark, sf).collect()}
    near = {(r["vec_id"], r["nbr_id"]) for r in exact_rows
            if r["cosine"] >= 0.4}
    assert len(near) >= 20
    recall_near = len(near & approx) / len(near)
    assert recall_near > 0.8, recall_near
    # overall top-k recall is necessarily lower but should be non-trivial
    allp = {(r["vec_id"], r["nbr_id"]) for r in exact_rows}
    assert len(allp & approx) / len(allp) > 0.25
