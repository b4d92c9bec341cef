"""Deterministic mergeable sketches as pure DataFrame expressions.

At 100 TB the alternative to a full shuffle-on-key distinct or count is
a fixed-size mergeable summary that partial-aggregates map-side.  Spark
ships HLL++ (approx_count_distinct) but its register layout is engine-
private — an oracle cannot replay it.  These sketches use the engine's
own 31-bit mix (proj_spark.text.curation.hash31), so a DuckDB twin
reproduces every register bit-for-bit, and the estimates are exact-
rational arithmetic over exact-integer sufficient statistics (one final
IEEE division — bit-identical in any engine).

HyperLogLog (Flajolet et al. 2007), p=8:
  bucket = h & 255, w = h >> 8 (23 payload bits),
  rho(w) = 24 - bitlength(w)  (w = 0 -> 24).
  Register M_j = max rho.  Sufficient statistic kept exact:
      S = sum_j 2^(24 - M_j)   (BIGINT; empty register contributes 2^24)
  estimate = alpha_256 * 256^2 * 2^24 / S.

Count-Min (Cormode & Muthukrishnan 2005), d x w counters of exact
BIGINT counts; point estimate = min_r counter[r][h_r(x)].  Counters are
plain integer sums, so the sketch is exactly mergeable under any
partial-agg reorder.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from proj_spark.text.curation import hash31, hash31_sql

HLL_P = 8
HLL_M = 1 << HLL_P          # 256 registers
HLL_WBITS = 31 - HLL_P      # 23 payload bits
HLL_RHO_MAX = HLL_WBITS + 1
# alpha_m for m >= 128 (Flajolet et al. 2007, fig. 3)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)

CM_D = 4
CM_W = 1024
CM_SEEDS = [1_000_003, 2_000_029, 3_000_073, 4_000_037]


def hll_bucket(h: Column) -> Column:
    return F.pmod(h, F.lit(HLL_M))


def hll_rho(h: Column) -> Column:
    """rho of the 23-bit payload: 24 - bitlength(w); bin() has no
    leading zeros in either engine, so bitlength == length(bin(w))."""
    w = F.floor(h / F.lit(HLL_M)).cast("long")
    return F.when(w == 0, F.lit(HLL_RHO_MAX)) \
            .otherwise(F.lit(HLL_RHO_MAX) - F.length(F.bin(w))).cast("long")


def hll_bucket_sql(h: str) -> str:
    return f"(({h}) % {HLL_M})"


def hll_rho_sql(h: str) -> str:
    w = f"(({h}) // {HLL_M})"
    return (f"(CASE WHEN {w} = 0 THEN {HLL_RHO_MAX} "
            f"ELSE {HLL_RHO_MAX} - length(bin({w})) END)")


def hll_stat(max_rho: Column, n_present: Column) -> Column:
    """Exact-integer sufficient statistic S from a per-group aggregate of
    (register -> max rho): present registers contribute 2^(24-M_j),
    absent ones 2^24 each."""
    present = F.sum(F.pow(F.lit(2.0), F.lit(HLL_RHO_MAX) - max_rho)
                    .cast("long"))
    return present + (F.lit(HLL_M) - n_present) * F.lit(1 << HLL_RHO_MAX)


def hll_estimate(s: Column) -> Column:
    """One float division over the exact statistic (raw HLL estimate; the
    small-range linear-counting correction needs ln(), whose last-ulp
    differs across libms — callers that want it should apply it to the
    reported n_zero downstream)."""
    num = F.lit(HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_RHO_MAX))
    return num / s.cast("double")


def hll_estimate_sql(s: str) -> str:
    num = repr(HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_RHO_MAX))
    return f"({num} / CAST({s} AS DOUBLE))"


def cm_col(token_id: Column, r: int) -> Column:
    """Counter column of hash row r for a 63-bit token id."""
    return F.pmod(hash31(token_id + F.lit(CM_SEEDS[r])), F.lit(CM_W))


def cm_col_sql(token_id: str, r: int) -> str:
    return f"({hash31_sql(f'({token_id}) + {CM_SEEDS[r]}')}) % {CM_W}"


def token_id48(token: Column) -> Column:
    """48-bit integer id of a string token: first 12 hex chars of its
    md5 — identical in Spark (conv) and DuckDB ('0x' cast), collision
    probability ~n^2/2^49 (negligible for vocabulary-scale n)."""
    return F.conv(F.substring(F.md5(token), 1, 12), 16, 10).cast("long")


def token_id48_sql(token: str) -> str:
    return f"CAST('0x' || substr(md5({token}), 1, 12) AS BIGINT)"
