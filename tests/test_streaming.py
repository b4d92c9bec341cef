"""Structured Streaming jobs: stream result == batch result on the same
files, plus stateful operator semantics across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proj_spark.pages import pages_table
from proj_spark.streaming import (stream_domain_running_counts,
                                  stream_events_hourly, stream_tile_density)
from proj_spark.streaming.jobs import run_to_memory

EVENTS_SRC = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def pages_dir(spark):
    pages_table(spark, 6000)  # materialize the sf0.001 pages cache
    import os
    root = os.environ.get("PROJ_SPARK_CACHE",
                          "/root/repo/.cache")
    return os.path.join(root, "pages_v2_6000_1000")


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # the file stream source needs a DIRECTORY of files
    import shutil
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(EVENTS_SRC, d / "part-000.parquet")
    return str(d)


def test_stream_events_hourly_matches_batch(spark, events_dir):
    run_to_memory(stream_events_hourly(spark, events_dir), "ev_hourly")
    got = {(r["hour_start"], r["event_type"]): r["n_events"]
           for r in spark.table("ev_hourly").collect()}
    batch = (spark.read.parquet(EVENTS_SRC)
             .withColumn("ts", F.col("ts").cast("timestamp"))
             .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count("*").alias("n"))
             .select(F.col("w.start").alias("h"), "event_type", "n"))
    want = {(r["h"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want


def test_stream_tile_density_matches_batch(spark, pages_dir):
    run_to_memory(stream_tile_density(spark, pages_dir, z=6), "tiles")
    got = {(r["tile_x"], r["tile_y"]): r["n_pages"]
           for r in spark.table("tiles").collect()}
    from proj_spark.pages import extract_geotags
    from proj_spark.spatial import cells
    pts = extract_geotags(spark.read.parquet(pages_dir))
    batch = (pts.select(cells.tile_x(F.col("lon"), 6).alias("x"),
                        cells.tile_y(F.col("lat"), 6).alias("y"))
             .groupBy("x", "y").count())
    want = {(r["x"], r["y"]): r["count"] for r in batch.collect()}
    assert got == want


def test_stream_exact_dedup(spark, tmp_path):
    """First occurrence of each digest is kept, later duplicates are
    suppressed across micro-batches; the kept set equals the batch
    min_by(url) dedup on the same files."""
    from proj_spark.streaming.jobs import stream_exact_dedup
    texts = ["alpha body", "beta body", "gamma body"]
    rows1 = [(f"https://a.example/p{i}", texts[i % 2]) for i in range(4)]
    rows2 = [(f"https://b.example/p{i}", texts[i % 3]) for i in range(6)]
    d = tmp_path / "pages"
    (spark.createDataFrame(rows1, ["url", "text"]).coalesce(1)
     .write.parquet(str(d / "f0")))
    (spark.createDataFrame(rows2, ["url", "text"]).coalesce(1)
     .write.parquet(str(d / "f1")))
    import glob
    import os
    import shutil
    import time
    for i, f in enumerate(sorted(glob.glob(str(d / "f*" / "part-*.parquet")))):
        dst = d / f"part-{i:03d}.parquet"
        shutil.copy(f, dst)
        # the file stream source orders micro-batches by modification
        # time; identical mtimes would make batch order nondeterministic
        t = time.time() - 100 + i * 10
        os.utime(dst, (t, t))
    shutil.rmtree(d / "f0")
    shutil.rmtree(d / "f1")
    run_to_memory(stream_exact_dedup(spark, str(d)), "dedup", mode="append")
    got = {r["digest"]: r["url"] for r in spark.table("dedup").collect()}
    batch = (spark.read.parquet(str(d))
             .select("url", F.md5("text").alias("digest"))
             .groupBy("digest").agg(F.min("url").alias("url")))
    want = {r["digest"]: r["url"] for r in batch.collect()}
    assert got == want
    assert len(got) == 3          # three distinct texts survive
    # each kept url comes from the earliest file containing that digest:
    # texts 0/1 first appear in file 0 (a.example), text 2 only in file 1
    by_file = sorted(got.values())
    assert sum(u.startswith("https://a.example/") for u in by_file) == 2
    assert sum(u.startswith("https://b.example/") for u in by_file) == 1


def test_stream_exact_dedup_ttl(spark, tmp_path):
    """Bounded-state mode: after the TTL a digest's tombstone expires,
    so a later duplicate is treated as first-seen again (re-emitted) —
    the registry stays O(digests per TTL window) at corpus scale."""
    import time

    from proj_spark.streaming.jobs import stream_exact_dedup
    d = tmp_path / "pages"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    d.mkdir()

    def add_file(i, url):
        (spark.createDataFrame([(url, "same text")], ["url", "text"])
         .coalesce(1).write.parquet(str(d / f"f{i}")))
        import glob
        import shutil
        src = glob.glob(str(d / f"f{i}" / "part-*.parquet"))[0]
        shutil.copy(src, d / f"part-{i:03d}.parquet")
        shutil.rmtree(d / f"f{i}")

    def run_once():
        q = (stream_exact_dedup(spark, str(d), state_ttl_ms=500)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt).outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination()

    add_file(0, "https://a.example/p0")
    run_once()
    assert spark.read.parquet(out).count() == 1
    time.sleep(1.5)                     # let the 500 ms TTL lapse
    add_file(1, "https://b.example/p0")  # same text -> same digest
    run_once()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2               # duplicate re-emitted after TTL
    assert {r["url"] for r in rows} == {"https://a.example/p0",
                                        "https://b.example/p0"}
    assert len({r["digest"] for r in rows}) == 1


def test_stream_minhash_neardup(spark, tmp_path):
    """LSH band-bucket registry: with id-ordered ingestion the distinct
    flagged doc set equals the id_b side of the batch candidate join on
    the same files, and every streamed (rep, doc) pair is a batch pair."""
    from proj_spark.streaming.jobs import stream_minhash_neardup
    from proj_spark.text.dedup import minhash_lsh_candidates

    base = ("the quick brown fox jumps over the lazy dog while the "
            "cat watches from the warm windowsill in the afternoon sun")
    texts = {
        "d00": base,
        "d01": base,                                   # exact dup of d00
        "d02": base.replace("afternoon", "morning"),   # near-dup variant
        "d03": "completely different text about spark structured "
               "streaming state stores and shuffle partitioning at scale",
        "d04": base,                                   # later exact dup
        "d05": base.replace("lazy dog", "sleepy dog"),
        "d06": "another unrelated document mentioning geodesic problems "
               "and transverse mercator series expansions entirely",
    }
    files = [["d00", "d01", "d02"], ["d03", "d04"], ["d05", "d06"]]
    d = tmp_path / "docs"
    import glob
    import os
    import shutil
    import time
    for i, ids in enumerate(files):
        rows = [(i_, texts[i_]) for i_ in ids]
        (spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1)
         .write.parquet(str(d / f"f{i}")))
        src = glob.glob(str(d / f"f{i}" / "part-*.parquet"))[0]
        dst = d / f"part-{i:03d}.parquet"
        shutil.copy(src, dst)
        t = time.time() - 100 + i * 10
        os.utime(dst, (t, t))
        shutil.rmtree(d / f"f{i}")
    run_to_memory(stream_minhash_neardup(spark, str(d)), "neardup",
                  mode="append")
    got = spark.table("neardup").collect()
    batch_pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(
        spark.read.parquet(str(d))).collect()}
    # every streamed (rep, doc) candidate is a batch candidate pair
    assert {(r["rep_id"], r["doc_id"]) for r in got} <= batch_pairs
    # flagged set == batch id_b side (docs sharing a bucket w/ smaller id)
    assert ({r["doc_id"] for r in got}
            == {b for _, b in batch_pairs})
    # the exact duplicates are certainly flagged against the first copy
    assert ("d00", "d01") in {(r["rep_id"], r["doc_id"]) for r in got}
    assert ("d00", "d04") in {(r["rep_id"], r["doc_id"]) for r in got}


def test_stateful_running_counts(spark, pages_dir):
    import glob
    n_files = len(glob.glob(f"{pages_dir}/part-*.parquet"))
    assert n_files > 1  # multiple micro-batches
    run_to_memory(stream_domain_running_counts(spark, pages_dir), "run_counts",
                  mode="update")
    # final state per domain: take the row with the max batches_seen
    rows = spark.table("run_counts").collect()
    finals = {}
    for r in rows:
        cur = finals.get(r["domain"])
        if cur is None or r["batches_seen"] > cur["batches_seen"]:
            finals[r["domain"]] = r
    batch = (spark.read.parquet(pages_dir)
             .select(F.regexp_extract("url", r"site(\d+)\.", 1)
                     .alias("domain"))
             .groupBy("domain").count())
    want = {r["domain"]: r["count"] for r in batch.collect()}
    got = {d: r["total_pages"] for d, r in finals.items()}
    assert got == want
    # at least one hot domain spans several micro-batches
    assert max(r["batches_seen"] for r in finals.values()) > 1


def test_stream_simhash_neardup(spark, tmp_path):
    """Simhash band registry: flagged set == docs sharing a 16-bit band
    key with a smaller id (computed directly from the batch signatures),
    and the carried signatures allow the exact Hamming verify."""
    from proj_spark.streaming.jobs import stream_simhash_neardup
    from proj_spark.text.dedup import simhash_udf

    base = ("spark structured streaming keeps one state row per key and "
            "shards the store across executors for incremental pipelines")
    texts = {
        "d00": base,
        "d01": base,                                  # exact dup
        "d02": base.replace("incremental", "stately"),
        "d03": "unrelated geodesy content about ellipsoidal latitude "
               "series and conformal sphere approximations in projections",
        "d04": base,
    }
    files = [["d00", "d01"], ["d02", "d03"], ["d04"]]
    d = tmp_path / "docs"
    import glob
    import os
    import shutil
    import time
    for i, ids in enumerate(files):
        (spark.createDataFrame([(x, texts[x]) for x in ids],
                               ["doc_id", "text"]).coalesce(1)
         .write.parquet(str(d / f"f{i}")))
        src = glob.glob(str(d / f"f{i}" / "part-*.parquet"))[0]
        dst = d / f"part-{i:03d}.parquet"
        shutil.copy(src, dst)
        t = time.time() - 100 + i * 10
        os.utime(dst, (t, t))
        shutil.rmtree(d / f"f{i}")
    run_to_memory(stream_simhash_neardup(spark, str(d)), "sh_neardup",
                  mode="append")
    got = spark.table("sh_neardup").collect()
    # batch signatures -> expected flagged set via the same 4x16 banding
    sig = {r["doc_id"]: r["sim"] for r in
           spark.read.parquet(str(d))
           .select("doc_id", simhash_udf()(F.col("text")).alias("sim"))
           .collect()}
    buckets = {}
    for did in sorted(sig):
        for band in range(4):
            key = (band, (sig[did] >> (16 * band)) & 0xFFFF)
            buckets.setdefault(key, []).append(did)
    want_flagged = {ids[j] for ids in buckets.values()
                    for j in range(1, len(ids))}
    assert {r["doc_id"] for r in got} == want_flagged
    # signatures carried in the output match the batch UDF's
    for r in got:
        assert r["sim"] == sig[r["doc_id"]]
        assert r["rep_sim"] == sig[r["rep_id"]]
    # the exact duplicates verify at Hamming 0 against the first copy
    dups = {(r["rep_id"], r["doc_id"]) for r in got
            if bin(r["sim"] ^ r["rep_sim"]).count("1") <= 3}
    assert ("d00", "d01") in dups and ("d00", "d04") in dups


def test_stream_minhash_neardup_numeric_ids(spark, tmp_path):
    """Numeric doc_ids keep NUMERIC order (rep is the numerically
    smallest id, matching the batch join's id_a < id_b), and a
    re-delivered id never emits a self-pair."""
    from proj_spark.streaming.jobs import stream_minhash_neardup

    text = ("identical body text shared by every document so all band "
            "buckets collide across the whole stream deterministically")
    files = [[2, 10], [2, 30]]          # 10 > 2 numerically, '10' < '2' lex
    d = tmp_path / "docs"
    import glob
    import os
    import shutil
    import time
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType())])
    for i, ids in enumerate(files):
        (spark.createDataFrame([(x, text) for x in ids], schema).coalesce(1)
         .write.parquet(str(d / f"f{i}")))
        src = glob.glob(str(d / f"f{i}" / "part-*.parquet"))[0]
        dst = d / f"part-{i:03d}.parquet"
        shutil.copy(src, dst)
        t = time.time() - 100 + i * 10
        os.utime(dst, (t, t))
        shutil.rmtree(d / f"f{i}")
    run_to_memory(stream_minhash_neardup(spark, str(d)), "nd_num",
                  mode="append")
    got = spark.table("nd_num").collect()
    pairs = {(r["rep_id"], r["doc_id"]) for r in got}
    # numeric order: 2 is the representative, 10 the flagged duplicate
    assert pairs == {(2, 10), (2, 30)}
    # the re-delivered id 2 (file 2) produced no self-pair
    assert all(r["rep_id"] != r["doc_id"] for r in got)


def test_stream_minhash_neardup_ttl(spark, tmp_path):
    """Bounded-registry mode: after the TTL a bucket's representative
    expires, so a later arrival re-registers instead of being flagged —
    the bucket state covers a bounded logical window."""
    import glob
    import shutil
    import time

    from proj_spark.streaming.jobs import stream_minhash_neardup
    text = ("a body of text long enough to produce stable minhash "
            "signatures across every band of the streaming registry")
    d = tmp_path / "docs"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    d.mkdir()

    def add_file(i, doc_ids):
        (spark.createDataFrame([(x, text) for x in doc_ids],
                               ["doc_id", "text"])
         .coalesce(1).write.parquet(str(d / f"f{i}")))
        src = glob.glob(str(d / f"f{i}" / "part-*.parquet"))[0]
        shutil.copy(src, d / f"part-{i:03d}.parquet")
        shutil.rmtree(d / f"f{i}")

    def run_once():
        q = (stream_minhash_neardup(spark, str(d), state_ttl_ms=500)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt).outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination()

    add_file(0, ["a0"])
    run_once()                          # a0 registers every bucket
    import os
    n0 = (spark.read.parquet(out).count()
          if os.path.exists(out) and glob.glob(out + "/*.parquet") else 0)
    assert n0 == 0                      # sole doc: nothing flagged
    time.sleep(1.5)                     # anchors lapse
    # b0 + c0 share one micro-batch: the stale a0 anchor is replaced by
    # b0 (min of the batch), and c0 is flagged against the NEW anchor —
    # never against the expired a0
    add_file(1, ["b0", "c0"])
    run_once()
    rows = spark.read.parquet(out).collect()
    assert rows and all(r["rep_id"] == "b0" and r["doc_id"] == "c0"
                        for r in rows)


def test_stream_sessionize_matches_batch_and_islands(spark, events_dir):
    """Three formulations of the same sessions agree: streaming
    session_window (update mode, one availableNow batch), batch
    session_window, and the batch gaps-and-islands temporal.sessionize —
    start equals the session's first event, session_window's end is
    last event + gap."""
    from proj_spark import temporal
    from proj_spark.streaming import stream_sessionize

    gap_us = 6 * 3600 * 1_000_000
    # streaming session windows are append-only: a session emits when the
    # watermark passes its end.  A far-future sentinel event in a SECOND
    # micro-batch (maxFilesPerTrigger=1) pushes the watermark beyond every
    # real session, so all of them finalize; the sentinel's own open
    # session is the only row withheld.
    import shutil
    import tempfile
    d = tempfile.mkdtemp(prefix="sess_stream_")
    shutil.copy(EVENTS_SRC, f"{d}/part-000.parquet")
    (spark.range(1)
     .select(F.lit(-1).cast("long").alias("event_id"),
             F.to_timestamp(F.lit("2100-01-01 00:00:00")).alias("ts"),
             F.lit(-1).cast("long").alias("user_id"),
             F.lit("sentinel").alias("event_type"),
             F.lit(0.0).alias("value"), F.lit("{}").alias("props"))
     .coalesce(1).write.mode("overwrite").parquet(f"{d}/zz-sentinel"))
    import glob
    sent = glob.glob(f"{d}/zz-sentinel/part-*.parquet")[0]
    shutil.move(sent, f"{d}/part-001.parquet")
    shutil.rmtree(f"{d}/zz-sentinel")

    run_to_memory(stream_sessionize(spark, d, gap="6 hours",
                                    watermark="0 seconds",
                                    max_files_per_trigger=1),
                  "sess", mode="append")
    got = {(r["user_id"], r["ss"], r["se"]): (r["n_events"], r["sum_cents"])
           for r in spark.table("sess").where("user_id >= 0").select(
               "user_id",
               F.unix_micros("session_start").alias("ss"),
               F.unix_micros("session_end").alias("se"),
               "n_events", "sum_cents").collect()}

    ev = (spark.read.parquet(events_dir)
          .withColumn("ts", F.col("ts").cast("timestamp")))
    batch = (ev.groupBy("user_id", F.session_window("ts", "6 hours").alias("w"))
             .agg(F.count("*").alias("n"),
                  F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("c")))
    want = {(r["user_id"], r["ss"], r["se"]): (r["n"], r["c"])
            for r in batch.select(
                "user_id", F.unix_micros("w.start").alias("ss"),
                F.unix_micros("w.end").alias("se"), "n", "c").collect()}
    assert got == want

    isl = temporal.sessionize(
        ev.select("user_id", "event_id",
                  F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
                  temporal.epoch_micros(ev, "ts").alias("tm")),
        key="user_id", ts="tm", gap=gap_us, tiebreak="event_id")
    isl_rows = (isl.groupBy("user_id", "session_seq")
                .agg(F.count("*").alias("n"), F.min("tm").alias("start_us"),
                     F.max("tm").alias("end_us"),
                     F.sum("cents").alias("c")).collect())
    want2 = {(r["user_id"], r["start_us"], r["end_us"] + gap_us): (r["n"], r["c"])
             for r in isl_rows}
    assert got == want2


def test_stream_asof_enrich_matches_batch(spark, tmp_path):
    """Streaming as-of enrichment over event-time-ordered micro-batches
    (three time-split files, one per trigger) equals the batch as-of
    join on the same events — including facts whose matching click
    arrived in an earlier batch and facts with no earlier click."""
    import __spark_entry__ as entry
    from proj_spark.streaming import stream_asof_enrich

    from proj_spark import temporal
    ev = spark.read.parquet(EVENTS_SRC)
    ev = ev.withColumn("_tm", temporal.epoch_micros(ev, "ts"))
    splits = (ev.selectExpr(
        "percentile(_tm, array(double(1.0/3), double(2.0/3))) p")
        .collect()[0]["p"])
    d = tmp_path / "ev"
    conds = [f"_tm <= {int(splits[0])}",
             f"_tm > {int(splits[0])} AND _tm <= {int(splits[1])}",
             f"_tm > {int(splits[1])}"]
    import glob
    import shutil
    for i, c in enumerate(conds):
        ev.where(c).drop("_tm").coalesce(1).write.parquet(str(d / f"tmp{i}"))
        part = glob.glob(str(d / f"tmp{i}" / "part-*.parquet"))[0]
        shutil.move(part, str(d / f"part-{i:03d}.parquet"))
        shutil.rmtree(str(d / f"tmp{i}"))
        import os
        import time
        t = time.time() - 100 + i * 10   # deterministic micro-batch order
        os.utime(str(d / f"part-{i:03d}.parquet"), (t, t))

    run_to_memory(stream_asof_enrich(spark, str(d)), "asof_s", mode="append")
    got = {r["event_id"]: (r["click_event_id"], r["gap_us"], r["cents"])
           for r in spark.table("asof_s").collect()}
    want = {r["event_id"]: (r["click_event_id"], r["gap_us"], r["cents"])
            for r in entry.q_asof_join(spark, "/root/testdata/sf0.001").collect()}
    assert got == want
    assert any(v[0] is None for v in want.values())  # no-match facts exist


def test_stream_tile_pyramid_matches_batch(spark, pages_dir):
    """Streaming explode-then-aggregate pyramid == batch chained-
    aggregation pyramid (two formulations of the same hierarchy)."""
    from proj_spark.spatial import pyramid
    from proj_spark.streaming import stream_tile_pyramid

    run_to_memory(stream_tile_pyramid(spark, pages_dir, z_max=7, z_min=4),
                  "pyr")
    got = {(r["zoom"], r["tile_x"], r["tile_y"]): r["n"]
           for r in spark.table("pyr").collect()}
    from proj_spark.pages import extract_geotags
    pts = (extract_geotags(spark.read.parquet(pages_dir))
           .where(F.col("lat").isNotNull()))
    try:
        want = {(r["zoom"], r["tile_x"], r["tile_y"]): r["n"]
                for r in pyramid.tile_pyramid(pts, 7, 4).collect()}
    finally:
        spark.catalog.clearCache()
    assert got == want


def test_stream_hll_tiles_matches_batch(spark, pages_dir):
    """The streaming HLL's exact-integer statistic equals the batch
    register build on the same files, register-for-register (take the
    LAST update per cell — 'update' mode re-emits on every batch)."""
    from proj_spark import sketches as sk
    from proj_spark.streaming.jobs import stream_hll_tiles
    from proj_spark.text.curation import hash31
    from proj_spark.pages import extract_geotags
    from proj_spark.spatial import cells as _cells

    run_to_memory(stream_hll_tiles(spark, pages_dir, z=5,
                                   max_files_per_trigger=1),
                  "hll_stream", mode="update")
    rows = spark.sql(
        "SELECT cell, s, n_zero FROM ("
        "  SELECT *, ROW_NUMBER() OVER (PARTITION BY cell ORDER BY "
        "         monotonically_increasing_id() DESC) rn FROM hll_stream"
        ") WHERE rn = 1").collect()
    got = {r["cell"]: (r["s"], r["n_zero"]) for r in rows}

    pts = extract_geotags(spark.read.parquet(pages_dir)).where(
        F.col("lat").isNotNull())
    h = hash31(F.regexp_extract("url", r"site(\d+)\.", 1).cast("long"))
    base = pts.select(
        _cells.cell_id(F.col("lon"), F.col("lat"), 5).alias("cell"),
        h.alias("h"))
    reg = (base.groupBy("cell", sk.hll_bucket(F.col("h")).alias("b"))
           .agg(F.max(sk.hll_rho(F.col("h"))).alias("mr")))
    batch = (reg.groupBy("cell")
             .agg(sk.hll_stat(F.col("mr"), F.count("*")).alias("s"),
                  (F.lit(sk.HLL_M) - F.count("*")).alias("n_zero")))
    want = {r["cell"]: (r["s"], r["n_zero"]) for r in batch.collect()}
    assert got == want


def test_stream_corridor_matches_batch(spark, pages_dir):
    from proj_spark.pages import extract_geotags
    from proj_spark.spatial import corridor
    from proj_spark.streaming.jobs import stream_corridor_counts

    wps = [(-74.0, 40.7), (-0.1, 51.5), (2.35, 48.86)]
    run_to_memory(stream_corridor_counts(spark, pages_dir, wps, 150.0),
                  "corr")
    got = {r["seg_id"]: (r["n_pages"], r["min_km"])
           for r in spark.table("corr").collect()}
    pts = extract_geotags(spark.read.parquet(pages_dir)) \
        .where(F.col("lat").isNotNull())
    segs = spark.createDataFrame(corridor.segment_specs(wps, 150.0),
                                 corridor.SEG_SCHEMA)
    batch = (pts.crossJoin(F.broadcast(segs))
             .withColumn("dist_m", F.expr(corridor.dist_sql()))
             .where(F.col("dist_m") <= 150.0 * 1000.0)
             .groupBy("seg_id")
             .agg(F.count("*").alias("n"),
                  F.round(F.min("dist_m") / 1000.0, 3).alias("m")))
    want = {r["seg_id"]: (r["n"], r["m"]) for r in batch.collect()}
    assert got == want and got


def test_stream_interval_join_matches_batch(spark, events_dir):
    """Stream-static range join == the batch 1-D PBSM interval join on
    the same files (append mode, stateless)."""
    import __spark_entry__ as entry
    from proj_spark.streaming.jobs import (_streaming_reader,
                                           stream_interval_join)
    from proj_spark.temporal import interval_join

    wins = entry._ij_windows(spark).withColumnRenamed("b_id", "win_id")
    ev_stream = _streaming_reader(spark, events_dir)
    intervals = (entry._event_intervals(ev_stream)
                 .withColumnRenamed("a_id", "event_id"))
    run_to_memory(stream_interval_join(intervals, wins),
                  "ij_stream", mode="append")
    got = sorted((r["event_id"], r["win_id"], r["ovl_us"])
                 for r in spark.table("ij_stream").collect())

    a = entry._event_intervals(spark.read.parquet(events_dir))
    b = entry._ij_windows(spark)
    want = sorted((r["a_id"], r["b_id"], r["ovl_us"])
                  for r in interval_join(a, b, entry.IJ_CELL_US).collect())
    assert got == want and len(got) > 50


# ---------------------------------------------------------------------------
# streaming funnel: per-user state machine == batch conditional-min chain
# ---------------------------------------------------------------------------

def test_stream_funnel_matches_batch(spark, tmp_path):
    """Split the event log into three TIME-ORDERED files and replay one
    file per micro-batch: the stateful greedy scan must reproduce the
    batch q_funnel_conv per-stage user counts and exact delay sums
    (in-order arrival makes greedy == conditional-min provably)."""
    import __spark_entry__ as entry
    from proj_spark.streaming.jobs import stream_funnel, run_to_memory

    ev = spark.read.parquet(EVENTS_SRC).orderBy("ts").collect()
    d = tmp_path / "funnel_stream"
    d.mkdir()
    k = len(ev) // 3
    for i, chunk in enumerate([ev[:k], ev[k:2 * k], ev[2 * k:]]):
        spark.createDataFrame(chunk, spark.read.parquet(EVENTS_SRC).schema) \
            .coalesce(1).write.parquet(str(d / f"b{i}"))
        import shutil, glob
        part = glob.glob(str(d / f"b{i}" / "part-*.parquet"))[0]
        shutil.move(part, str(d / f"part-{i:03d}.parquet"))
        shutil.rmtree(str(d / f"b{i}"))

    run_to_memory(stream_funnel(spark, str(d), max_files_per_trigger=1),
                  "funnel_stream_out", mode="append")
    got_rows = spark.table("funnel_stream_out").collect()
    got = {}
    for s in (1, 2, 3):
        rows = [r for r in got_rows if r.stage == s]
        got[s] = (len(rows), sum(r.delay_us for r in rows))
    want = {r.stage: (r.n_users, r.sum_delay_us) for r in
            entry.q_funnel_conv(spark, "/root/testdata/sf0.001").collect()}
    assert got == want
    assert got[1][0] > 0
    # every user advances monotonically: at most one row per (user, stage)
    seen = [(r.user_id, r.stage) for r in got_rows]
    assert len(seen) == len(set(seen))


def test_stream_big_orders_matches_batch(spark, tmp_path):
    """Split lineitem into three SHIP-TIME-ORDERED files and replay one
    per micro-batch: the threshold detector must fire for exactly the
    batch q_big_orders order set, and each emitted row must equal the
    pure-Python prefix replay (first prefix of the (tm, linenumber)
    order reaching the threshold)."""
    import glob
    import shutil
    from collections import defaultdict

    import __spark_entry__ as entry
    from proj_spark.streaming.jobs import stream_big_orders

    src = "/root/testdata/sf0.001/lineitem.parquet"
    li = spark.read.parquet(src).orderBy("l_shipdate", "l_orderkey",
                                         "l_linenumber").collect()
    d = tmp_path / "bigord_stream"
    d.mkdir()
    k = len(li) // 3
    for i, chunk in enumerate([li[:k], li[k:2 * k], li[2 * k:]]):
        spark.createDataFrame(chunk, spark.read.parquet(src).schema) \
            .coalesce(1).write.parquet(str(d / f"b{i}"))
        part = glob.glob(str(d / f"b{i}" / "part-*.parquet"))[0]
        shutil.move(part, str(d / f"part-{i:03d}.parquet"))
        shutil.rmtree(str(d / f"b{i}"))

    run_to_memory(stream_big_orders(spark, str(d), max_files_per_trigger=1),
                  "bigord_stream_out", mode="append")
    got = {r.l_orderkey: r for r in spark.table("bigord_stream_out").collect()}

    # exactly one emission per qualifying order, same set as the batch
    want_keys = {r["o_orderkey"] for r in
                 entry.q_big_orders(spark, "/root/testdata/sf0.001").collect()}
    assert set(got) == want_keys and len(want_keys) > 0

    # replay the crossing prefix in pure Python
    import pandas as pd
    pdf = pd.read_parquet(src, columns=["l_orderkey", "l_linenumber",
                                        "l_quantity", "l_shipdate"])
    per = defaultdict(list)
    for _, r in pdf.iterrows():
        tm = pd.Timestamp(r["l_shipdate"]).value // 1000
        per[int(r["l_orderkey"])].append(
            (tm, int(r["l_linenumber"]),
             int(r["l_quantity"] * 100 + 0.5)))
    for okey, rows in per.items():
        qty = items = 0
        fire = None
        for tm, _, q in sorted(rows):
            qty += q
            items += 1
            if fire is None and qty >= 30_000:
                fire = (qty, items, tm)
        if fire is None:
            assert okey not in got
        else:
            r = got[okey]
            assert (r.qty_c, r.n_items, r.tm) == fire


def test_stream_cusum_matches_replay(spark, tmp_path):
    """Split events into three TIME-ORDERED files, one per micro-batch
    (the middle file splits hours across batch boundaries): the alarm
    sequence must equal the pure-Python Page-CUSUM replay over the
    whole table, proving the pending-hour state carries correctly."""
    import glob
    import shutil
    from collections import Counter, defaultdict

    import pandas as pd

    from proj_spark.streaming.jobs import stream_cusum

    K, THR = 1, 3
    src = "/root/testdata/sf0.001/events.parquet"
    ev = spark.read.parquet(src).orderBy("ts", "event_id").collect()
    d = tmp_path / "cusum_stream"
    d.mkdir()
    k = len(ev) // 3
    for i, chunk in enumerate([ev[:k], ev[k:2 * k], ev[2 * k:]]):
        spark.createDataFrame(chunk, spark.read.parquet(src).schema) \
            .coalesce(1).write.parquet(str(d / f"b{i}"))
        part = glob.glob(str(d / f"b{i}" / "part-*.parquet"))[0]
        shutil.move(part, str(d / f"part-{i:03d}.parquet"))
        shutil.rmtree(str(d / f"b{i}"))

    run_to_memory(stream_cusum(spark, str(d), k=K, thr=THR,
                               max_files_per_trigger=1),
                  "cusum_stream_out", mode="append")
    got = defaultdict(list)
    for r in spark.table("cusum_stream_out").collect():
        got[r.event_type].append((r.hr, r.y, r.g))
    for v in got.values():
        v.sort()

    # pure-Python replay with identical finalize-pending semantics
    pdf = pd.read_parquet(src, columns=["event_type", "ts"])
    per_hr = defaultdict(Counter)
    for et, ts in zip(pdf["event_type"], pdf["ts"]):
        per_hr[et][pd.Timestamp(ts).value // 1000 // 3_600_000_000] += 1
    exp = defaultdict(list)
    for et, cnt in per_hr.items():
        hours = sorted(cnt)
        g = 0
        # the LAST hour stays pending (never finalized), as in the stream
        for h, nxt in zip(hours, hours[1:]):
            for hh in range(h, nxt):
                g = max(0, g + ((cnt[h] if hh == h else 0) - K))
                if g >= THR:
                    exp[et].append((hh, cnt[h] if hh == h else 0, g))
                    g = 0
    assert sum(len(v) for v in exp.values()) > 0
    assert {k: sorted(v) for k, v in exp.items()} == dict(got)


def test_stream_ewma_burst_matches_batch(spark, tmp_path):
    """Split events into three TIME-ORDERED files, one per micro-batch:
    the emitted (x, y, num, ratio_q, burst) rows must equal the batch
    q_ewma_hours output for every hour except the trailing one (which
    stays pending in stream state, never finalized)."""
    import glob
    import shutil

    import __spark_entry__ as entry
    from proj_spark.streaming.jobs import stream_ewma_burst

    src = "/root/testdata/sf0.001/events.parquet"
    ev = spark.read.parquet(src).orderBy("ts", "event_id").collect()
    d = tmp_path / "ewma_stream"
    d.mkdir()
    k = len(ev) // 3
    for i, chunk in enumerate([ev[:k], ev[k:2 * k], ev[2 * k:]]):
        spark.createDataFrame(chunk, spark.read.parquet(src).schema) \
            .coalesce(1).write.parquet(str(d / f"b{i}"))
        part = glob.glob(str(d / f"b{i}" / "part-*.parquet"))[0]
        shutil.move(part, str(d / f"part-{i:03d}.parquet"))
        shutil.rmtree(str(d / f"b{i}"))

    run_to_memory(stream_ewma_burst(spark, str(d),
                                    k_window=entry.EWMA_K,
                                    burst_q=entry.EWMA_BURST_Q,
                                    max_files_per_trigger=1),
                  "ewma_stream_out", mode="append")
    got = sorted((r.x, r.y, r.num, r.ratio_q, r.burst)
                 for r in spark.table("ewma_stream_out").collect())

    batch = entry.q_ewma_hours(spark, "/root/testdata/sf0.001")
    rows = sorted((r.x, r.y, r.num, r.ratio_q, r.burst)
                  for r in batch.collect())
    x_max = max(r[0] for r in rows)
    want = [r for r in rows if r[0] < x_max]
    assert len(got) > 0
    assert got == want


def test_stream_ewma_burst_window_gap(spark, tmp_path):
    """A gap longer than the K-hour window empties the EWMA baseline:
    the first observed hour after the gap has num == 0, which the batch
    q_ewma_hours drops via its inner join onto the nonzero-baseline
    relation — the stream must drop it too (round-2 advice: it emitted
    a y>0/num=0/ratio NULL row)."""
    import pandas as pd

    import __spark_entry__ as entry
    from proj_spark.streaming.jobs import stream_ewma_burst

    K = entry.EWMA_K
    base = pd.Timestamp("2024-01-01T00:00:00")
    hours = list(range(0, K + 8)) + [K + 8 + K + 7, K + 8 + K + 8,
                                     K + 8 + K + 9]
    rows = []
    eid = 0
    for h in hours:
        for _ in range(3 + h % 4):
            rows.append((eid, base + pd.Timedelta(hours=h, minutes=7),
                         eid % 11, "click", 1.0, "{}"))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value", "props"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    d = tmp_path / "gap_sf"
    d.mkdir()
    evdir = d / "events.parquet"
    evdir.mkdir()
    k = len(pdf) // 2
    pdf.iloc[:k].to_parquet(evdir / "part-000.parquet", index=False)
    pdf.iloc[k:].to_parquet(evdir / "part-001.parquet", index=False)

    run_to_memory(stream_ewma_burst(spark, str(evdir), k_window=K,
                                    burst_q=entry.EWMA_BURST_Q,
                                    max_files_per_trigger=1),
                  "ewma_gap_out", mode="append")
    got = sorted((r.x, r.y, r.num, r.ratio_q, r.burst)
                 for r in spark.table("ewma_gap_out").collect())
    batch = sorted((r.x, r.y, r.num, r.ratio_q, r.burst)
                   for r in entry.q_ewma_hours(spark, str(d)).collect())
    x_max = max(r[0] for r in batch) if batch else None
    want = [r for r in batch if r[0] < x_max]
    # the post-gap hour is in neither relation; pre-gap bursts are in both
    assert len(want) > 0
    assert got == want
