"""Bloom-filter decontamination: the broadcast-bitset anti-join.

q_decontaminate joins corpus n-grams against the benchmark set
relationally — exact, but at 10^12 documents the benchmark side of
that join is rebuilt and shuffled against every run.  The production
shape is this one: hash the (small, fixed-size) benchmark into a
Bloom bitset ONCE, broadcast the bitset (a few KB–MB regardless of
corpus size), and probe it inside the corpus's one wide Arrow stage —
zero shuffles, zero joins on the 100 TB side.  False positives are a
deterministic function of the bitset parameters, so "flag rate ~
eps + true rate" is a budgeted, tunable property (m/k below give
eps ~ 1.2% at the test densities), and the ORACLE reproduces the
exact same bit collisions — the check is value-exact including FPs.

Unit: distinct char-32-gram rolling hashes (the same Mersenne-61
polynomial kernel as minhash/simhash, dedup._batch_shingles — one
vectorized pass over the concatenated batch).  Positions use
Kirsch-Mitzenmacher double hashing h1 + i*h2, all closed-form integer
arithmetic reproducible in DuckDB (no engine hash()).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import MERSENNE61, _batch_shingles

BLOOM_M = 1 << 17        # bits in the filter (16 KiB)
BLOOM_K = 4              # probes per key
H2_SHIFT = 20            # h2 draws from bits the h1 modulus ignores
GRAM_WIDTH = 32          # char-32-grams


def gram_positions(hv: np.ndarray, m: int = BLOOM_M,
                   k: int = BLOOM_K) -> np.ndarray:
    """(n, k) bit positions of each M61 gram hash: p_i = (h1 + i*h2)
    mod m with h1 = hv mod m, h2 = 1 + (hv >> H2_SHIFT) mod (m-1)
    (h2 > 0 so the k probes never collapse onto one bit)."""
    h = hv.astype(np.int64)          # hv < 2^61: lossless
    h1 = h % m
    h2 = 1 + (h >> H2_SHIFT) % (m - 1)
    return (h1[:, None] + np.arange(k, dtype=np.int64)[None, :]
            * h2[:, None]) % m


def _doc_gram_hashes(texts: pd.Series,
                     width: int = GRAM_WIDTH) -> list[np.ndarray]:
    hashes, starts = _batch_shingles(texts, width)
    return [np.unique(hashes[starts[i]:starts[i + 1]])
            for i in range(len(texts))]


def build_bloom_bits(bench: DataFrame, text_col: str = "text",
                     width: int = GRAM_WIDTH, m: int = BLOOM_M,
                     k: int = BLOOM_K) -> np.ndarray:
    """Distributed build: hash the benchmark docs' grams executor-side,
    collect only the DISTINCT BIT POSITIONS (<= m of them, independent
    of benchmark size), set bits driver-side.  Returns uint64 words."""
    @F.pandas_udf("array<long>")
    def positions(texts: pd.Series) -> pd.Series:
        out = []
        for g in _doc_gram_hashes(texts, width):
            out.append(np.unique(gram_positions(g.astype(np.int64),
                                                m, k).ravel())
                       if len(g) else np.zeros(0, dtype=np.int64))
        return pd.Series(out)

    pos_df = (bench.select(F.explode(positions(F.col(text_col)))
                           .alias("bp")).distinct())
    p = np.array([r.bp for r in pos_df.collect()], dtype=np.int64)
    words = np.zeros(m // 64, dtype=np.uint64)
    if len(p):
        np.bitwise_or.at(words, p >> 6,
                         np.uint64(1) << (p & 63).astype(np.uint64))
    return words


def bloom_stats(docs: DataFrame, words: np.ndarray,
                id_col: str = "doc_id", text_col: str = "text",
                width: int = GRAM_WIDTH, m: int = BLOOM_M,
                k: int = BLOOM_K) -> DataFrame:
    """Per-document contamination stats by probing the broadcast
    bitset inside ONE map-side Arrow stage: (doc_id, n_grams, n_hits,
    hit_frac).  Docs with no full-width gram are dropped (as in the
    relational variant)."""
    bits = words.copy()          # captured in the closure -> broadcast

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            grams = _doc_gram_hashes(pdf[text_col], width)
            n = np.array([len(g) for g in grams], dtype=np.int64)
            hits = np.zeros(len(grams), dtype=np.int64)
            nz = [i for i, g in enumerate(grams) if len(g)]
            if nz:
                allg = np.concatenate([grams[i] for i in nz])
                p = gram_positions(allg, m, k)
                member = ((bits[p >> 6] >> (p & 63).astype(np.uint64))
                          & np.uint64(1)).astype(bool).all(axis=1)
                bounds = np.cumsum([len(grams[i]) for i in nz])[:-1]
                for i, seg in zip(nz, np.split(member, bounds)):
                    hits[i] = int(seg.sum())
            out = pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_grams": n,
                "n_hits": hits,
            })
            out = out[out.n_grams > 0]
            # HALF-AWAY rounding (floor(v*1e6 + 0.5) for v >= 0) to
            # match DuckDB ROUND and Spark F.round — pandas .round()
            # is half-to-even and diverges on exact 6-dp ties
            # (e.g. 1/128 -> 0.007812 vs 0.007813)
            v = out.n_hits / out.n_grams
            out["hit_frac"] = np.floor(v * 1e6 + 0.5) / 1e6
            yield out

    return docs.select(id_col, text_col).mapInPandas(
        probe, "doc_id long, n_grams long, n_hits long, hit_frac double")


def gram_hash_sql(text: str = "text", pos: str = "p",
                  width: int = GRAM_WIDTH) -> str:
    """DuckDB: the M61 polynomial hash of the width-char window at
    1-based position ``pos`` — identical arithmetic to
    dedup._batch_shingles (byte_i * 131^i summed mod 2^61-1)."""
    terms = " + ".join(
        f"CAST(ascii(substr({text}, {pos} + {i}, 1)) AS HUGEINT) "
        f"* {pow(131, i, MERSENNE61)}"
        for i in range(width))
    return f"CAST(({terms}) % {MERSENNE61} AS BIGINT)"


def positions_sql(hv: str = "hv", i: str = "i", m: int = BLOOM_M) -> str:
    """DuckDB: bit position i of gram hash hv (same double hashing)."""
    return (f"(({hv}) % {m} + ({i}) * "
            f"(1 + (({hv}) // {1 << H2_SHIFT}) % {m - 1})) % {m}")
