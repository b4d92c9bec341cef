"""Deduplication operators over a documents table.

Exact dedup is a hash group-by (map-side partial agg, one shuffle on the
digest — at 100 TB this is the cheapest possible plan).  Near-dup comes
in three flavors:

  - MinHash + LSH banding: shingle -> k minhashes -> b bands; candidate
    pairs share a band bucket (equi-join on (band, bucket_hash)), then
    exact Jaccard verifies.  The band join is the standard way to turn
    an O(n^2) similarity search into a shuffle on bucket keys.
  - SimHash: 64-bit sign fingerprint of token hashes; near-dups differ
    in few bits.  Banded into 4x16-bit keys for the same LSH trick.
  - n-gram Jaccard: exact verification kernel (used standalone for small
    candidate sets, or as the verify stage after LSH).

All hashing uses explicit integer arithmetic (closed-form, engine-
independent) — no reliance on Spark's or DuckDB's internal hash().
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType

MERSENNE61 = (1 << 61) - 1


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per identical text (md5 digest group-by)."""
    return (docs
            .groupBy(F.md5(F.col(text_col)).alias("text_md5"))
            .agg(F.min(F.col(id_col)).alias("keep_id"),
                 F.count("*").alias("dup_count")))


def _shingle_hashes(texts: pd.Series, width: int) -> list[np.ndarray]:
    """Per doc: array of rolling polynomial hashes of char shingles.

    h(s) = sum(byte_i * 131^i) mod 2^61-1 — explicit math, reproducible
    anywhere (vectorized across each doc's shingles via stride tricks).
    """
    out = []
    pows = np.array([pow(131, i, MERSENNE61) for i in range(width)], dtype=np.object_)
    for t in texts:
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        if len(b) < width:
            out.append(np.zeros(0, dtype=np.int64))
            continue
        windows = np.lib.stride_tricks.sliding_window_view(b, width).astype(np.object_)
        h = (windows * pows).sum(axis=1) % MERSENNE61
        out.append(np.unique(h.astype(np.int64)))
    return out


def minhash_udf(num_hashes: int = 64, shingle: int = 5):
    """pandas UDF: text -> array<long> of minhash signatures.

    Hash family: h_j(x) = (a_j x + b_j) mod M61 with fixed odd constants
    derived from j (deterministic, no RNG).
    """
    a = np.array([(2 * j + 1) * 2654435761 % MERSENNE61 for j in range(num_hashes)],
                 dtype=np.object_)
    b = np.array([(j * 40503 + 2654435769) % MERSENNE61 for j in range(num_hashes)],
                 dtype=np.object_)

    @pandas_udf(ArrayType(LongType()))
    def _f(text: pd.Series) -> pd.Series:
        sh = _shingle_hashes(text, shingle)
        sigs = []
        for h in sh:
            if len(h) == 0:
                sigs.append([0] * num_hashes)
                continue
            hh = h.astype(np.object_)
            m = ((hh[None, :] * a[:, None] + b[:, None]) % MERSENNE61).min(axis=1)
            sigs.append([int(v) for v in m])
        return pd.Series(sigs)

    return _f


def minhash_lsh_candidates(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 64,
                           bands: int = 16, shingle: int = 5) -> DataFrame:
    """Candidate near-dup pairs via banded minhash (id_a < id_b)."""
    rows_per_band = num_hashes // bands
    mh = minhash_udf(num_hashes, shingle)
    sig = docs.select(F.col(id_col), mh(F.col(text_col)).alias("sig"))
    banded = sig.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(F.lit(bi).alias("band"),
                     F.hash(F.slice("sig", bi * rows_per_band + 1, rows_per_band)).alias("bucket"))
            for bi in range(bands)
        ])).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (left.join(right, [F.col(f"l.band") == F.col("r.band"),
                               F.col("l.bucket") == F.col("r.bucket"),
                               F.col(f"l.{id_col}") < F.col(f"r.{id_col}")])
             .select(F.col(f"l.{id_col}").alias("id_a"),
                     F.col(f"r.{id_col}").alias("id_b"))
             .distinct())
    return pairs


def ngram_jaccard_udf(shingle: int = 5):
    """pandas UDF over (text_a, text_b) -> exact shingle-set Jaccard."""

    @pandas_udf(DoubleType())
    def _f(ta: pd.Series, tb: pd.Series) -> pd.Series:
        ha = _shingle_hashes(ta, shingle)
        hb = _shingle_hashes(tb, shingle)
        out = np.zeros(len(ta))
        for i, (x, y) in enumerate(zip(ha, hb)):
            if len(x) == 0 and len(y) == 0:
                out[i] = 1.0
                continue
            inter = np.intersect1d(x, y, assume_unique=True).size
            union = len(x) + len(y) - inter
            out[i] = inter / union if union else 0.0
        return pd.Series(out)

    return _f


def simhash_udf(shingle: int = 3):
    """pandas UDF: text -> 64-bit simhash (as long)."""

    @pandas_udf(LongType())
    def _f(text: pd.Series) -> pd.Series:
        sh = _shingle_hashes(text, shingle)
        out = np.zeros(len(text), dtype=np.int64)
        for i, h in enumerate(sh):
            if len(h) == 0:
                continue
            # spread the 61-bit shingle hash to 64 bits via splitmix-style mix
            v = h.astype(np.uint64)
            v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            v = v ^ (v >> np.uint64(31))
            bits = ((v[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
            vote = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            sig = np.uint64(0)
            for bit in np.nonzero(vote > 0)[0]:
                sig |= np.uint64(1) << np.uint64(bit)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    return _f


def simhash_near_dups(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by simhash: band 64 bits into 4x16 keys, join, verify
    Hamming distance <= max_hamming (pigeonhole: any pair within 3 bits
    shares at least one exact 16-bit band)."""
    sh = simhash_udf()
    sig = docs.select(F.col(id_col), sh(F.col(text_col)).alias("sim"))
    bands = sig.select(
        id_col, "sim",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftrightunsigned(F.col("sim"), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("key"))
            for i in range(4)
        ])).alias("bk")).select(id_col, "sim", "bk.band", "bk.key")
    l, r = bands.alias("l"), bands.alias("r")
    pairs = (l.join(r, [F.col("l.band") == F.col("r.band"),
                        F.col("l.key") == F.col("r.key"),
                        F.col(f"l.{id_col}") < F.col(f"r.{id_col}")])
             .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"),
                     F.col("l.sim").alias("sim_a"), F.col("r.sim").alias("sim_b"))
             .distinct())
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return pairs.withColumn("hamming", hamming).where(F.col("hamming") <= max_hamming) \
                .select("id_a", "id_b", "hamming")
