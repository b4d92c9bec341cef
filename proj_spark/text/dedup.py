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

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (ArrayType, DoubleType, LongType, StructField,
                               StructType)

MERSENNE61 = (1 << 61) - 1

# ---------------------------------------------------------------------------
# Vectorized mod-(2^61-1) arithmetic in pure uint64 (no object dtype, no
# per-document Python loops): the whole Arrow batch is one NumPy pass.
# ---------------------------------------------------------------------------

_M61 = np.uint64(MERSENNE61)
_MASK31 = np.uint64((1 << 31) - 1)
_MASK30 = np.uint64((1 << 30) - 1)
# (256, 8) lookup: _BIT_TABLE[byte, bit] = (byte >> bit) & 1 — simhash voting
_BIT_TABLE = ((np.arange(256)[:, None] >> np.arange(8)[None, :]) & 1).astype(np.int32)


def _fold61(x: np.ndarray) -> np.ndarray:
    """Partial reduction mod 2^61-1 of uint64 values: result < 2^61-1.

    Uses the Mersenne identity 2^61 === 1: fold the top bits down, then a
    single conditional subtract (input < 2^64 -> folded < 2^61 + 7)."""
    x = (x & _M61) + (x >> np.uint64(61))
    return np.where(x >= _M61, x - _M61, x)


def _modmul61(a, x: np.ndarray) -> np.ndarray:
    """(a * x) mod 2^61-1 for a scalar-or-array and uint64 array, both < 2^61.

    31/30-bit split keeps every intermediate product inside uint64:
      a*x = a_hi*x_hi*2^62 + (a_hi*x_lo + a_lo*x_hi)*2^31 + a_lo*x_lo
    with 2^62 === 2 and mid*2^31 folded via mid = m_hi*2^30 + m_lo so
    mid*2^31 === m_hi + m_lo*2^31 (mod 2^61-1)."""
    a = np.uint64(a) if np.isscalar(a) or np.ndim(a) == 0 else a
    a_hi, a_lo = a >> np.uint64(31), a & _MASK31
    x_hi, x_lo = x >> np.uint64(31), x & _MASK31
    t1 = _fold61(a_hi * x_hi * np.uint64(2))
    mid = a_hi * x_lo + a_lo * x_hi
    t2 = _fold61((mid >> np.uint64(30)) + ((mid & _MASK30) << np.uint64(31)))
    t3 = _fold61(a_lo * x_lo)
    return _fold61(t1 + t2 + t3)


@lru_cache(maxsize=8)
def _byte_pow_table(width: int) -> np.ndarray:
    """(width, 256) uint64 table: table[i, byte] = byte * 131^i mod 2^61-1.

    Exact (computed with Python ints), so the batched rolling hash equals
    the original object-dtype sum(byte_i * 131^i) % M61 bit-for-bit."""
    t = np.empty((width, 256), dtype=np.uint64)
    for i in range(width):
        p = pow(131, i, MERSENNE61)
        for byte in range(256):
            t[i, byte] = (byte * p) % MERSENNE61
    return t


def _batch_shingles(texts: pd.Series, width: int) -> tuple[np.ndarray, np.ndarray]:
    """All documents' rolling shingle hashes in one vectorized pass.

    Returns (hashes, starts): `hashes` is a uint64 array of every window's
    h(s) = sum(byte_i * 131^i) mod 2^61-1, grouped by document in order;
    `starts` (len n_docs+1) gives each document's [starts[d], starts[d+1])
    slice.  Documents shorter than `width` contribute zero windows.
    """
    enc = [t.encode("utf-8") for t in texts]
    lens = np.array([len(e) for e in enc], dtype=np.int64)
    nwin = np.maximum(lens - width + 1, 0)
    starts = np.concatenate([[0], np.cumsum(nwin)])
    total = int(starts[-1])
    if total == 0:
        return np.zeros(0, dtype=np.uint64), starts
    big = np.frombuffer(b"".join(enc), dtype=np.uint8)
    byte_starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
    nz = nwin > 0
    # hash EVERY window position of the concatenation with contiguous
    # slices (sequential reads beat per-window gathers), then select the
    # in-document positions with one final gather; the few cross-document
    # windows computed in between are discarded.
    npos = len(big) - width + 1
    table = _byte_pow_table(width)
    # in-place accumulation with a reused workspace (fresh allocations per
    # pass cost more in page faults than the arithmetic itself); the
    # canonical mod-subtract is deferred to one final pass — the invariant
    # acc < 2^61+1 after each fold keeps every sum below 2^62.
    acc = np.zeros(npos, dtype=np.uint64)
    tmp = np.empty(npos, dtype=np.uint64)
    for i in range(width):
        np.add(acc, table[i][big[i:i + npos]], out=acc)
        np.right_shift(acc, np.uint64(61), out=tmp)
        acc &= _M61
        acc += tmp
    np.subtract(acc, _M61, out=acc, where=acc >= _M61)
    # absolute byte offset of every valid window start: grouped arange
    pos = (np.repeat(byte_starts[nz], nwin[nz])
           + (np.arange(total) - np.repeat(starts[:-1][nz], nwin[nz])))
    return acc[pos], starts


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per identical text (md5 digest group-by)."""
    return (docs
            .groupBy(F.md5(F.col(text_col)).alias("text_md5"))
            .agg(F.min(F.col(id_col)).alias("keep_id"),
                 F.count("*").alias("dup_count")))


def _shingle_hashes(texts: pd.Series, width: int) -> list[np.ndarray]:
    """Per doc: sorted array of UNIQUE rolling polynomial shingle hashes.

    h(s) = sum(byte_i * 131^i) mod 2^61-1 — explicit math, reproducible
    anywhere.  Batched: one vectorized uint64 pass over the concatenated
    documents (_batch_shingles), then a per-doc unique slice.
    """
    H, starts = _batch_shingles(texts, width)
    return [np.unique(H[starts[d]:starts[d + 1]].astype(np.int64))
            for d in range(len(texts))]


@lru_cache(maxsize=8)
def _affine_consts(num_hashes: int):
    """Fixed odd affine constants of the minhash family h_j(x) =
    (a_j x + b_j) mod M61, plus 31-bit splits (a_hi2 = 2*a_hi folds the
    2^62 === 2 Mersenne identity into the constant)."""
    a = np.array([(2 * j + 1) * 2654435761 % MERSENNE61 for j in range(num_hashes)],
                 dtype=np.uint64)
    b = np.array([(j * 40503 + 2654435769) % MERSENNE61 for j in range(num_hashes)],
                 dtype=np.uint64)
    return a >> np.uint64(31), (a >> np.uint64(31)) * np.uint64(2), a & _MASK31, b


def _minhash_matrix(H: np.ndarray, starts: np.ndarray, n: int,
                    num_hashes: int) -> np.ndarray:
    """(n, num_hashes) int64 minhash signatures from the concatenated
    window hashes.  One vectorized uint64 pass per hash function over
    the whole Arrow batch; per-document minima via segmented
    np.minimum.reduceat (duplicate shingles cannot change a min, so no
    per-doc unique pass is needed)."""
    a_hi, a_hi2, a_lo, b = _affine_consts(num_hashes)
    out = np.zeros((n, num_hashes), dtype=np.int64)
    nwin = np.diff(starts)
    if H.size:
        # doc-aligned chunks keep all per-j temporaries cache-resident
        doc_nz = np.flatnonzero(nwin)
        c0 = 0
        while c0 < len(doc_nz):
            c1 = int(np.searchsorted(
                starts[doc_nz], starts[doc_nz[c0]] + (1 << 18), "left"))
            c1 = max(c1, c0 + 1)
            docs_c = doc_nz[c0:c1]
            lo, hi = starts[docs_c[0]], starts[docs_c[-1] + 1]
            Hc = H[lo:hi]
            idx = starts[docs_c] - lo
            # hoisted 31-bit split of the shingle hashes
            x_hi = Hc >> np.uint64(31)
            x_lo = Hc & _MASK31
            w1 = np.empty(len(Hc), dtype=np.uint64)
            w2 = np.empty(len(Hc), dtype=np.uint64)
            for j in range(num_hashes):
                # fused (a*x + b) mod 2^61-1 with reused workspaces:
                # all partial terms < 2^63, one final fold suffices
                # (see the _modmul61 derivation)
                np.multiply(x_lo, a_hi[j], out=w1)
                np.multiply(x_hi, a_lo[j], out=w2)
                w1 += w2                       # mid = a_hi*x_lo + a_lo*x_hi
                np.right_shift(w1, np.uint64(30), out=w2)   # m_hi
                w1 &= _MASK30
                w1 <<= np.uint64(31)           # m_lo * 2^31
                w1 += w2
                np.multiply(x_hi, a_hi2[j], out=w2)
                w1 += w2                       # + a_hi*x_hi*2 (2^62 === 2)
                np.multiply(x_lo, a_lo[j], out=w2)
                w1 += w2                       # + a_lo*x_lo
                w1 += b[j]
                np.right_shift(w1, np.uint64(61), out=w2)
                w1 &= _M61
                w1 += w2                       # fold 2^61 === 1
                np.subtract(w1, _M61, out=w1, where=w1 >= _M61)
                out[docs_c, j] = np.minimum.reduceat(w1, idx).astype(np.int64)
            c0 = c1
    return out


def minhash_udf(num_hashes: int = 64, shingle: int = 5):
    """pandas UDF: text -> array<long> of minhash signatures (one
    _batch_shingles pass + the shared _minhash_matrix kernel)."""

    @pandas_udf(ArrayType(LongType()))
    def _f(text: pd.Series) -> pd.Series:
        H, starts = _batch_shingles(text, shingle)
        return pd.Series(list(_minhash_matrix(H, starts, len(text), num_hashes)))

    return _f


def minhash_sig_set_udf(num_hashes: int = 64, shingle: int = 5):
    """pandas UDF: text -> struct(sig: array<long>, sh: array<long>).

    ONE text scan yields both the minhash signature (for LSH banding)
    and the sorted-unique shingle set (for the exact-Jaccard verify) —
    the shingle windows are hashed once (_batch_shingles) and consumed
    twice.  This halves the Python stages of a near-dup pipeline and,
    paired with a JVM-side array_intersect verify, removes the need to
    collect per-document sets to the driver (the O(corpus)-driver-memory
    anti-pattern) — every stage stays distributed."""
    fields = StructType([StructField("sig", ArrayType(LongType())),
                         StructField("sh", ArrayType(LongType()))])

    @pandas_udf(fields)
    def _f(text: pd.Series) -> pd.DataFrame:
        H, starts = _batch_shingles(text, shingle)
        sig = _minhash_matrix(H, starts, len(text), num_hashes)
        sets = [np.unique(H[starts[d]:starts[d + 1]].astype(np.int64))
                for d in range(len(text))]
        return pd.DataFrame({"sig": list(sig), "sh": sets})

    return _f


M31 = (1 << 31) - 1


def band_bucket_expr(sig_col: str, band: int, rows_per_band: int) -> Column:
    """Band bucket as EXPLICIT integer arithmetic (fold of the band's
    minhashes mod 2^31-1) — engine-independent, so a DuckDB oracle can
    reproduce the bucketing exactly (Spark's F.hash cannot be)."""
    acc = F.lit(0).cast("long")
    for r in range(rows_per_band):
        v = F.element_at(F.col(sig_col), band * rows_per_band + r + 1)
        acc = (acc * F.lit(131) + F.pmod(v, F.lit(M31))) % F.lit(M31)
    return acc


def banded_signatures(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 64,
                      bands: int = 16, shingle: int = 5,
                      bucket: str = "m31") -> DataFrame:
    """(id, band, bucket) rows: one per document per LSH band — the
    relation both the batch candidate join and the streaming registry
    key on."""
    rows_per_band = num_hashes // bands
    mh = minhash_udf(num_hashes, shingle)
    sig = docs.select(F.col(id_col), mh(F.col(text_col)).alias("sig"))
    if bucket == "m31":
        buckets = [F.struct(F.lit(bi).alias("band"),
                            band_bucket_expr("sig", bi, rows_per_band)
                            .alias("bucket"))
                   for bi in range(bands)]
    else:
        buckets = [F.struct(
            F.lit(bi).alias("band"),
            F.hash(F.slice("sig", bi * rows_per_band + 1, rows_per_band))
            .alias("bucket")) for bi in range(bands)]
    return sig.select(
        F.col(id_col),
        F.explode(F.array(*buckets)).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def minhash_lsh_candidates(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 64,
                           bands: int = 16, shingle: int = 5,
                           bucket: str = "m31") -> DataFrame:
    """Candidate near-dup pairs via banded minhash (id_a < id_b).

    bucket="m31" (default) uses the oracle-reproducible arithmetic
    banding; bucket="spark_hash" keeps the engine-internal F.hash over
    the band slice (slightly cheaper, not SQL-portable)."""
    banded = banded_signatures(docs, text_col, id_col, num_hashes, bands,
                               shingle, bucket)
    # the band join broadcasts one side, so pair generation + the partial
    # distinct run in the PROBE side's partitioning — repartition it, or a
    # single-file source serializes the whole O(sum bucket^2) pair blowup
    # into one task (measured: 7x wall on a 1-file parquet corpus)
    left = banded.repartition(F.col(id_col)).alias("l")
    right = banded.alias("r")
    pairs = (left.join(right, [F.col(f"l.band") == F.col("r.band"),
                               F.col("l.bucket") == F.col("r.bucket"),
                               F.col(f"l.{id_col}") < F.col(f"r.{id_col}")])
             .select(F.col(f"l.{id_col}").alias("id_a"),
                     F.col(f"r.{id_col}").alias("id_b"))
             .distinct())
    return pairs


def ngram_jaccard_udf(shingle: int = 5):
    """pandas UDF over (text_a, text_b) -> exact shingle-set Jaccard.

    Shingle hashing is one vectorized batch pass per side; only the
    per-pair set intersection (the verify stage over an already-LSH-pruned
    candidate set, tiny by construction) remains a loop.
    """

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


def shingle_set_udf(shingle: int = 5):
    """pandas UDF: text -> array<long> of sorted unique shingle hashes
    (one distributed batch pass; feeds the pair-verify stage so each
    document is hashed exactly once, not once per candidate pair)."""

    @pandas_udf(ArrayType(LongType()))
    def _f(text: pd.Series) -> pd.Series:
        return pd.Series(_shingle_hashes(text, shingle))

    return _f


def ngram_jaccard_pairs_udf(doc_sets):
    """pandas UDF over (id_a, id_b) -> exact Jaccard via a broadcast
    id -> sorted-unique-hash-array dictionary.

    The dictionary is the *small side* of the verify (a few MB per 10^4
    documents — same contract as a broadcast join side); pairs then
    carry only two ids across Arrow instead of two ~KB arrays, which is
    the difference between MBs and GBs of transfer at 10^6 candidates.
    Pass a ``SparkContext.broadcast`` of the dict (preferred: shipped to
    each executor once, not re-pickled into every task binary) or a
    plain dict.  For corpora whose dictionary exceeds broadcast size,
    shard the candidate pairs by id range and broadcast per-shard
    dictionaries.  Batch intersection is one vectorized sort pass.
    """
    is_bc = hasattr(doc_sets, "value")

    @pandas_udf(DoubleType())
    def _f(ida: pd.Series, idb: pd.Series) -> pd.Series:
        n = len(ida)
        if n == 0:
            return pd.Series(np.zeros(0))
        d = doc_sets.value if is_bc else doc_sets
        A = [d[i] for i in ida.to_numpy()]
        B = [d[i] for i in idb.to_numpy()]
        return pd.Series(_batch_set_intersection_jaccard(A, B))

    # The UDF is pure, but Catalyst pushes deterministic filters through
    # Distinct — which would run the (expensive) verify on every
    # PRE-distinct banded pair (~10x the work on bucket-skewed corpora).
    # Marking it non-deterministic pins the verify above the dedup.
    return _f.asNondeterministic()


_SET_SENTINEL = np.int64(1) << np.int64(62)   # > any mod-2^61-1 hash


def _batch_set_intersection_jaccard(A: list, B: list,
                                    chunk: int = 1024) -> np.ndarray:
    """Exact Jaccard for a batch of (sorted-unique array) pairs.

    Pads each pair's two sets into one (chunk, la_max+lb_max) block,
    row-sorts (a single-key axis-1 sort — measured ~4x cheaper than a
    global (hash, pair) lexsort), and counts adjacent duplicates: every
    common value appears exactly twice, every sentinel run contributes
    pad_count-1, nothing else repeats.

    Processed in cache-sized chunks: a monolithic (n, 2L) matrix at
    Arrow-batch n (~30k rows x ~600 cols = 150 MB) thrashes DRAM when
    32 executor workers sort concurrently (measured 7x slowdown vs the
    same kernel single-process); ~1k-row blocks stay cache-resident."""
    n = len(A)
    out = np.empty(n, dtype=np.float64)
    for c0 in range(0, n, chunk):
        c1 = min(c0 + chunk, n)
        Ac, Bc = A[c0:c1], B[c0:c1]
        m = c1 - c0
        la = np.array([len(a) for a in Ac], dtype=np.int64)
        lb = np.array([len(b) for b in Bc], dtype=np.int64)
        L = int(max(int(la.max()), int(lb.max()), 1))
        mat = np.full((m, 2 * L), _SET_SENTINEL, dtype=np.int64)
        rows = np.repeat(np.arange(m), la)
        cols = np.arange(int(la.sum())) - np.repeat(np.cumsum(la) - la, la)
        if len(rows):
            mat[rows, cols] = np.concatenate(Ac)
        rows = np.repeat(np.arange(m), lb)
        cols = L + (np.arange(int(lb.sum()))
                    - np.repeat(np.cumsum(lb) - lb, lb))
        if len(rows):
            mat[rows, cols] = np.concatenate(Bc)
        mat.sort(axis=1)
        dup = (mat[:, 1:] == mat[:, :-1]).sum(axis=1)
        pads = 2 * L - la - lb
        inter = dup - np.maximum(pads - 1, 0)
        union = la + lb - inter
        out[c0:c1] = np.where(union > 0, inter / np.maximum(union, 1),
                              np.where(la + lb == 0, 1.0, 0.0))
    return out


def ngram_jaccard_arrays_udf():
    """pandas UDF over two sorted-unique hash arrays -> exact Jaccard.

    The LSH verify stage at scale: candidate pairs are broadcast-joined
    to the per-document set table (array column), and each Arrow batch
    of pairs is intersected in ONE vectorized lexsort pass — no per-pair
    Python set work, no re-hashing of text per pair.
    """

    @pandas_udf(DoubleType())
    def _f(sa: pd.Series, sb: pd.Series) -> pd.Series:
        n = len(sa)
        if n == 0:
            return pd.Series(np.zeros(0))
        A = [np.asarray(a, dtype=np.int64) for a in sa]
        B = [np.asarray(b, dtype=np.int64) for b in sb]
        la = np.array([len(a) for a in A], dtype=np.int64)
        lb = np.array([len(b) for b in B], dtype=np.int64)
        pidx = np.concatenate([np.repeat(np.arange(n), la),
                               np.repeat(np.arange(n), lb)])
        h = (np.concatenate(A + B) if (la.sum() + lb.sum())
             else np.zeros(0, dtype=np.int64))
        order = np.lexsort((h, pidx))
        hs, ps = h[order], pidx[order]
        dup = (hs[1:] == hs[:-1]) & (ps[1:] == ps[:-1])
        inter = np.bincount(ps[1:][dup], minlength=n)
        union = la + lb - inter
        out = np.where(union > 0, inter / np.maximum(union, 1),
                       np.where(la + lb == 0, 1.0, 0.0))
        return pd.Series(out)

    return _f


def simhash_udf(shingle: int = 3):
    """pandas UDF: text -> 64-bit simhash (as long).

    Fully vectorized over the Arrow batch: one lexsort deduplicates
    shingles per document, then 64 segmented np.add.reduceat passes (one
    per output bit) accumulate the votes — no per-document Python loop
    and no 64-wide bit matrix (memory stays O(batch windows)).
    """

    @pandas_udf(LongType())
    def _f(text: pd.Series) -> pd.Series:
        H, starts = _batch_shingles(text, shingle)
        n = len(text)
        out = np.zeros(n, dtype=np.int64)
        if H.size == 0:
            return pd.Series(out)
        doc = np.repeat(np.arange(n), np.diff(starts))
        order = np.lexsort((H, doc))
        Hs, ds = H[order], doc[order]
        keep = np.ones(len(Hs), dtype=bool)
        keep[1:] = (Hs[1:] != Hs[:-1]) | (ds[1:] != ds[:-1])
        Hu, du = Hs[keep], ds[keep]  # per-doc unique shingles, doc-grouped
        # spread the 61-bit shingle hash to 64 bits via splitmix-style mix
        v = (Hu ^ (Hu >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        v = v ^ (v >> np.uint64(31))
        seg = np.flatnonzero(np.concatenate([[True], du[1:] != du[:-1]]))
        seg_docs = du[seg]
        seg_sizes = np.diff(np.concatenate([seg, [len(du)]])).astype(np.uint64)
        sig = np.zeros(len(seg), dtype=np.uint64)
        one = np.uint64(1)
        for bit in range(64):
            # 1-D segmented reduceat is near-memcpy speed (a 2-D/axis
            # variant measured ~50x slower — keep this a per-bit loop)
            ones = np.add.reduceat((v >> np.uint64(bit)) & one, seg)
            # vote = sum(2*bit - 1) > 0  <=>  2*ones > segment size
            sig |= (ones * np.uint64(2) > seg_sizes).astype(np.uint64) << np.uint64(bit)
        out[seg_docs] = sig.view(np.int64)
        return pd.Series(out)

    return _f


#: 6-way bit-block split of the 64-bit simhash for the block-permutation
#: candidate scheme (Manku/Jain/Sarma, "Detecting near-duplicates for web
#: crawling", WWW 2007 §3): any pair within Hamming distance 3 leaves at
#: least 3 of the 6 blocks intact, so keying C(6,3)=20 tables on block
#: TRIPLES (~32-bit keys) finds every such pair exactly — same recall
#: guarantee as the 4x16 banding, but the far-more-selective keys bound
#: hot-bucket blowup on bit-concentrated corpora.
_SIM_BLOCKS = [(0, 11), (11, 11), (22, 11), (33, 11), (44, 10), (54, 10)]


def _sim_block_tables(sim_col: str):
    """The 20 (table, key) structs of the block-triple scheme; key packs
    three blocks into <= 33 bits (11-bit lanes), well inside a long."""
    from itertools import combinations
    blocks = [F.shiftrightunsigned(F.col(sim_col), lo)
              .bitwiseAND(F.lit((1 << width) - 1))
              for lo, width in _SIM_BLOCKS]
    out = []
    for t, (i, j, k) in enumerate(combinations(range(6), 3)):
        key = (F.shiftleft(blocks[i], 22)
               .bitwiseOR(F.shiftleft(blocks[j], 11))
               .bitwiseOR(blocks[k]))
        out.append(F.struct(F.lit(t).alias("band"), key.alias("key")))
    return out


def simhash_near_dups(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", max_hamming: int = 3,
                      scheme: str = "bands") -> DataFrame:
    """Near-dup pairs by simhash; the exact Hamming verify makes the
    OUTPUT independent of the candidate scheme, which only has to
    guarantee recall at max_hamming <= 3:

    - scheme='bands': 4x16-bit bands (pigeonhole: <=3 flipped bits
      leave one band intact).  Right default at modest corpus sizes.
    - scheme='blocks': the WWW'07 block-permutation index — C(6,3)=20
      tables keyed on ~32-bit block triples (<=3 flipped bits hit <=3
      of 6 blocks, so one all-intact triple always matches).  The
      density-matched choice at scale: on a bit-concentrated corpus the
      16-bit band keys saturate (measured on the 50k-doc synthetic sf1
      corpus: 68M band pairs, hottest 16-bit key shared by 7.0k docs;
      block triples cut that to 5.9M / 765 — 11.5x — with identical
      verified output, and selectivity grows with key width, not n).
    """
    sh = simhash_udf()
    sig = docs.select(F.col(id_col), sh(F.col(text_col)).alias("sim"))
    if scheme == "blocks":
        keys = _sim_block_tables("sim")
    else:
        keys = [F.struct(F.lit(i).alias("band"),
                         F.shiftrightunsigned(F.col("sim"), 16 * i)
                         .bitwiseAND(F.lit(0xFFFF)).alias("key"))
                for i in range(4)]
    bands = sig.select(
        id_col, "sim",
        F.explode(F.array(*keys)).alias("bk")
    ).select(id_col, "sim", "bk.band", "bk.key")
    # repartition the probe side (see minhash_lsh_candidates: a broadcast
    # band join otherwise inherits a 1-file source's single partition)
    l, r = bands.repartition(F.col(id_col)).alias("l"), bands.alias("r")
    pairs = (l.join(r, [F.col("l.band") == F.col("r.band"),
                        F.col("l.key") == F.col("r.key"),
                        F.col(f"l.{id_col}") < F.col(f"r.{id_col}")])
             .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"),
                     F.col("l.sim").alias("sim_a"), F.col("r.sim").alias("sim_b"))
             .distinct())
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return pairs.withColumn("hamming", hamming).where(F.col("hamming") <= max_hamming) \
                .select("id_a", "id_b", "hamming")
