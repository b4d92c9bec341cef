"""Multimodal columns: images/audio/video as opaque binary + typed
metadata, with Arrow-batched decode / feature-extract / resize /
frame-sample plumbing.

The media itself is an opaque `binary` column next to a typed metadata
struct — the same pattern as the pages table's `html`.  All Spark-side
plumbing here is real and tested: schemas, `mapInPandas` batch
iteration, deterministic partitioning, and the UDF signatures a real
decoder would slot into.  The codec call itself is STUBBED behind
`register_decoder` (PIL/ffmpeg/soundfile are not available in this
environment); the default "deterministic fake" decoder hashes the bytes
into a reproducible pixel/sample array so every downstream stage —
resize, frame sampling, feature extraction, embedding — runs end-to-end
deterministically and is testable.

Scale design: decode is the most expensive map-side stage at 100 TB, so
it runs inside `mapInPandas` (one python call per Arrow batch, media
bytes never leave the executor), after a `repartition` on a
deterministic key when downstream stages need co-location.  Decoded
features are small fixed-width arrays; raw media is dropped as early as
Catalyst allows (select pruning).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, FloatType,
                               IntegerType, LongType, StringType, StructField,
                               StructType)

#: media metadata struct: one row per asset, media kind + container info
MEDIA_META_SCHEMA = StructType([
    StructField("kind", StringType()),        # image | audio | video
    StructField("format", StringType()),      # jpeg | png | wav | mp4 | ...
    StructField("width", IntegerType()),      # images/video
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),   # video
    StructField("sample_rate", IntegerType()),  # audio
    StructField("duration_ms", LongType()),
])

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("url", StringType()),
    StructField("bytes", BinaryType()),
    StructField("meta", MEDIA_META_SCHEMA),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("feature", ArrayType(FloatType())),
])


class DecodeNotAvailable(NotImplementedError):
    """Raised by the stub when a REAL codec is requested but absent."""


#: decoder registry: kind -> (bytes, meta_row) -> np.ndarray
#: a real deployment registers e.g. PIL.Image.open / soundfile.read here
_DECODERS: dict[str, Callable] = {}


def register_decoder(kind: str, fn: Callable) -> None:
    _DECODERS[kind] = fn


def _fake_decode(data: bytes, meta) -> np.ndarray:
    """Deterministic stand-in decoder: expands the byte stream into a
    reproducible float array shaped by the metadata.  NOT a real codec —
    it exists so the batch plumbing is fully exercisable here."""
    raw = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
    if meta["kind"] == "image":
        n = int(meta["width"]) * int(meta["height"])
    elif meta["kind"] == "audio":
        n = max(1, int(meta["sample_rate"]) * int(meta["duration_ms"]) // 1000)
    else:  # video: one luma plane per frame
        n = int(meta["width"]) * int(meta["height"]) * int(meta["n_frames"])
    reps = int(np.ceil(n / max(len(raw), 1)))
    return np.tile(raw, reps)[:n] / 255.0


def decode(kind: str, data: bytes, meta, strict: bool = False,
           decoders: dict | None = None) -> np.ndarray:
    table = _DECODERS if decoders is None else decoders
    if kind in table:
        return table[kind](data, meta)
    if strict:
        raise DecodeNotAvailable(
            f"no decoder registered for {kind!r}; install a codec and call "
            "register_decoder")
    return _fake_decode(data, meta)


# ---------------------------------------------------------------------------
# feature extraction stages (mapInPandas)
# ---------------------------------------------------------------------------

N_FEATURES = 16


def _extract_features(samples: np.ndarray, k: int = N_FEATURES) -> np.ndarray:
    """Fixed-width feature vector from a decoded sample array:
    k equal-width bin means (a deterministic, codec-agnostic pooling)."""
    if samples.size == 0:
        return np.zeros(k, dtype=np.float32)
    bins = np.array_split(samples, k)
    return np.array([b.mean() if b.size else 0.0 for b in bins],
                    dtype=np.float32)


def media_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """media table -> (media_id, kind, n_bytes, feature[16]).

    One `mapInPandas` pass: decode + pool per Arrow batch; the binary
    column never crosses a shuffle.

    The decoder registry is SNAPSHOTTED into the UDF closure here: in a
    distributed run the executor python workers never see driver-side
    mutations of module globals, so registration must travel with the
    task closure."""
    decoders = dict(_DECODERS)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            # zip over raw columns, not iterrows: no per-row pandas Series
            # construction in the per-asset decode loop
            for raw, meta in zip(pdf["bytes"].to_numpy(), pdf["meta"].to_numpy()):
                arr = decode(meta["kind"], raw, meta, strict=strict,
                             decoders=decoders)
                feats.append(_extract_features(arr))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": [m["kind"] for m in pdf["meta"]],
                "n_bytes": [len(b) for b in pdf["bytes"]],
                "feature": [list(map(float, f)) for f in feats],
            })

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def image_resize_batch(pixels: np.ndarray, w: int, h: int,
                       out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of a flat luma plane (decode-side helper;
    runs on decoded arrays inside the same mapInPandas pass)."""
    img = pixels.reshape(h, w)
    yi = (np.arange(out_h) * h // out_h)
    xi = (np.arange(out_w) * w // out_w)
    return img[np.ix_(yi, xi)].ravel()


def video_sample_frames(samples: np.ndarray, w: int, h: int, n_frames: int,
                        every: int = 2) -> np.ndarray:
    """Frame sampling: keep every `every`-th luma plane."""
    frames = samples.reshape(n_frames, h * w)
    return frames[::every].ravel()


# ---------------------------------------------------------------------------
# deterministic synthetic media table (tests / fixtures)
# ---------------------------------------------------------------------------

def synth_media(spark, n_rows: int) -> DataFrame:
    """Deterministic media table: kind/format cycle per row, payload
    bytes derived from md5 chains of the url (no RNG)."""
    df = spark.range(0, n_rows).withColumnRenamed("id", "i")
    i = F.col("i")
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"),
                                F.lit("video")),
                        F.pmod(i, F.lit(3)).cast("int") + 1)
    fmt = F.element_at(F.array(F.lit("jpeg"), F.lit("wav"), F.lit("mp4")),
                       F.pmod(i, F.lit(3)).cast("int") + 1)
    url = F.concat(F.lit("https://media.example/"), i.cast("string"))
    payload = F.encode(F.concat(F.md5(url), F.md5(F.concat(url, F.lit("#"))),
                                F.md5(F.concat(url, F.lit("##")))), "UTF-8")
    meta = F.struct(
        kind.alias("kind"), fmt.alias("format"),
        (F.pmod(i, F.lit(5)).cast("int") * 4 + 8).alias("width"),
        (F.pmod(i, F.lit(3)).cast("int") * 4 + 8).alias("height"),
        (F.pmod(i, F.lit(4)).cast("int") + 2).alias("n_frames"),
        F.lit(8000).alias("sample_rate"),
        (F.pmod(i, F.lit(900)).cast("long") + 100).alias("duration_ms"),
    )
    return df.select(i.alias("media_id"), url.alias("url"),
                     payload.alias("bytes"), meta.alias("meta"))
