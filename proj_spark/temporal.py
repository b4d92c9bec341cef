"""Event-time relational operators: as-of join and sessionization.

The reference engine is purely coordinate-wise, but its 4D data model
carries time as a first-class axis (``PJ_COORD.xyzt.t``, reference
src/proj.h:multiple; kinematic datum shifts interpolate along it,
src/transformations/helmert.cpp 14-parameter path), and the north-rule
pages/events tables need the standard event-stream operators a log
pipeline runs before any spatial work: "join each fact to the latest
earlier dimension state" (as-of) and "split a user's stream on idle
gaps" (sessionization).

Both are implemented shuffle-minimally:

* ``asof_join`` uses the merge formulation — union the two streams with
  a side tag, hash-shuffle ONCE on the key, and take a running
  ``last(right_row)`` over the event-time order.  No range join, no
  per-left-row probe: at 100 TB this is a single exchange of
  left+right, and Spark's WindowExec streams each key group without
  materializing pairs.  (A naive ``left.join(right, key).where(rt <
  lt)`` + per-left top-1 shuffles the same data AND builds the full
  intermediate pair relation, which is quadratic per hot key.)
* ``sessionize`` is the gaps-and-islands window: a lag-diff break flag
  and its running sum, two window expressions over the SAME
  (partition, order) spec, so Catalyst plans one exchange + one sort.

Timestamps never enter either operator: callers pass an integer
event-time column (microseconds since epoch — see ``epoch_micros``),
which makes results independent of ``spark.sql.session.timeZone`` and
of whether parquet timestamps were read as LTZ or NTZ (the
events_hourly round-1 lesson).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def epoch_micros(df: DataFrame, ts_col: str) -> Column:
    """Stored-parquet microseconds-since-epoch of ``ts_col``, identical
    under ANY session timezone and under both timestamp read modes.

    * LTZ reading (``spark.sql.parquet.inferTimestampNTZ.enabled=false``):
      ``unix_micros`` returns the stored micros unchanged — it never
      consults the session timezone.
    * NTZ reading: the wall-clock fields ARE the stored value rendered
      as UTC, so the micros are rebuilt arithmetically from the fields
      (``unix_date``/``hour``/``minute`` + fractional ``date_part('SECOND')``),
      which is timezone-free by construction.  (Routing NTZ through a
      cast to TIMESTAMP would re-interpret the wall clock in the session
      zone and is not even monotonic across a DST fall-back.)
    """
    c = F.col(ts_col)
    if df.schema[ts_col].dataType.typeName() == "timestamp_ntz":
        whole_min = (F.unix_date(F.to_date(c)) * F.lit(86400)
                     + F.hour(c) * F.lit(3600)
                     + F.minute(c) * F.lit(60)).cast("long")
        # extract(SECOND) keeps the fractional part (DECIMAL(8,6)) — exact
        sec_us = F.round(F.date_part(F.lit("SECOND"), c) * F.lit(1_000_000), 0)
        return (whole_min * F.lit(1_000_000) + sec_us.cast("long"))
    return F.unix_micros(c)


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              ts: str = "tm", tiebreak: str | None = None,
              strict: bool = True, asof_col: str = "asof") -> DataFrame:
    """Left as-of join: every ``left`` row, plus (as a struct column
    ``asof_col``) the ``right`` row with the greatest event time not
    after the left row's — strictly before it when ``strict`` (the
    "state as of just before the fact" reading), at-or-before otherwise.
    Rows with no earlier match get a NULL struct.

    ``ts`` must name an integer/long event-time column present in BOTH
    inputs (build it with :func:`epoch_micros`).  ``tiebreak`` names a
    right-side column that makes right rows totally ordered within
    (key, ts) — the greatest tiebreak wins — so the result is
    deterministic even under event-time collisions.

    Plan shape: tag + unionByName + ONE hash exchange on ``on`` + one
    sort + a running ``last(_rrow, ignorenulls=True)``; the left/right
    relative tag order at equal ts encodes strict vs inclusive.  Null
    join keys follow window semantics (nulls group together) rather
    than SQL equi-join semantics; filter them upstream if they must
    not match.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lpay = [c for c in left.columns]
    rpay = [c for c in right.columns]
    rrow_t = right.select(F.struct(*rpay).alias("_rrow")).schema["_rrow"].dataType
    lrow_t = left.select(F.struct(*lpay).alias("_lrow")).schema["_lrow"].dataType
    # strict: left sorts BEFORE right at equal ts, so an equal-ts right row
    # is not yet visible to the running last(); inclusive: right first.
    ltag, rtag = (0, 1) if strict else (1, 0)
    lside = left.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)],
        F.col(ts).cast("long").alias("_t"),
        F.lit(ltag).alias("_tag"),
        F.lit(None).cast("long").alias("_tb"),
        F.struct(*lpay).alias("_lrow"),
        F.lit(None).cast(rrow_t).alias("_rrow"))
    rside = right.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)],
        F.col(ts).cast("long").alias("_t"),
        F.lit(rtag).alias("_tag"),
        (F.col(tiebreak).cast("long") if tiebreak is not None
         else F.lit(0).cast("long")).alias("_tb"),
        F.lit(None).cast(lrow_t).alias("_lrow"),
        F.struct(*rpay).alias("_rrow"))
    u = lside.unionByName(rside)
    w = (Window.partitionBy(*[f"_k{i}" for i in range(len(keys))])
         .orderBy("_t", "_tag", "_tb")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = u.withColumn("_m", F.last("_rrow", ignorenulls=True).over(w))
    return (matched.where(F.col("_tag") == ltag)
            .select(F.col("_lrow.*"), F.col("_m").alias(asof_col)))


def sessionize(df: DataFrame, key: str | list[str], ts: str,
               gap: int, tiebreak: str | None = None,
               session_col: str = "session_seq") -> DataFrame:
    """Gaps-and-islands sessionization: adds ``session_col``, a 1-based
    per-key session index that increments whenever the event-time gap to
    the previous event of the same key EXCEEDS ``gap`` (same units as
    ``ts``; a gap of exactly ``gap`` stays in-session).

    Single exchange + single sort: the lag-based break flag and its
    running sum share one (partition, order) window spec.  ``tiebreak``
    totally orders same-timestamp events so the running sum is
    deterministic.
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    brk = F.when(F.lag(ts).over(w).isNull()
                 | (F.col(ts) - F.lag(ts).over(w) > F.lit(gap)), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # the break flag must be a materialized column — Spark rejects a window
    # expression nested inside another window's aggregate — but both specs
    # share (partition, order), so still one exchange + one sort.
    return (df.withColumn("_brk", brk)
            .withColumn(session_col, F.sum("_brk").over(run).cast("long"))
            .drop("_brk"))


def interval_join(a: DataFrame, b: DataFrame, cell_us: int,
                  a_id: str = "a_id", b_id: str = "b_id") -> DataFrame:
    """Overlap join of two half-open µs-integer interval relations —
    the time-range join Spark has no native operator for.

    a: (a_id long, a_s long, a_e long), b: (b_id long, b_s long,
    b_e long), both with s < e and e - s <= cell_us (callers size the
    cell to the max interval length; longer spans should be SPLIT into
    cell-sized pieces upstream, not joined with bigger cells).

    1-D PBSM: each interval covers <= 2 time cells (bounded explode),
    equi-join on the cell co-partitions both sides, the exact overlap
    predicate `a_s < b_e AND b_s < a_e` filters, and the pair is
    reported only by the cell containing max(a_s, b_s) (reference-point
    rule) — exact integer semantics, no distinct shuffle, arbitrarily
    hot hours split by AQE.  Returns (a_id, b_id, ovl_us).
    """
    C = int(cell_us)

    def binned(df: DataFrame, pid: str, s: str, e: str,
               out_id: str) -> DataFrame:
        return df.select(
            F.col(pid).alias(out_id), F.col(s), F.col(e),
            F.explode(F.sequence(
                F.floor(F.col(s) / F.lit(C)),
                F.floor((F.col(e) - 1) / F.lit(C)))).alias("tcell"))

    aa = binned(a, a_id, "a_s", "a_e", a_id)
    bb = binned(b, b_id, "b_s", "b_e", b_id)
    ref = F.greatest("a_s", "b_s")
    return (aa.join(bb, "tcell")
            .where((F.col("a_s") < F.col("b_e"))
                   & (F.col("b_s") < F.col("a_e"))
                   & (F.col("tcell") == F.floor(ref / F.lit(C))))
            .select(a_id, b_id,
                    (F.least("a_e", "b_e")
                     - F.greatest("a_s", "b_s")).alias("ovl_us")))
