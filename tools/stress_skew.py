"""Hot-key skew stress for the salted two-phase paths (round-5 verdict
item 2; north-rule "skew handled with salted repartitioning and AQE
skew-join hints").

Synthesizes a deliberately pathological 6M-row pages table:

  - ONE domain ("hot.example") owns 10% of the corpus (600k pages);
    the rest spread over ~100k domains (~54 pages each) --> the hot
    key is ~11,000x the median.
  - ONE z12 cell (a 0.088-degree "urban" square) holds 10% of the
    points; the rest are uniform over a 60x60-degree region
    (~4 points per z12 cell) --> the hot cell is ~150,000x the median.

and measures, for each mechanism, wall time plus the MAX vs MEDIAN
reduce-task duration of the heaviest stage (Spark UI REST taskSummary),
comparing the skew-naive plan against the engine's mitigation:

  agg        groupBy(domain).count + countDistinct(url), naive vs
             spatial/skew.py salted_count / salted_distinct_count
             (results asserted identical).
  cell       z12 cell density rollup over the hot cell (map-side
             partial aggregation is the mitigation; the table PROVES
             the reduce input is bounded by cell cardinality).
  topk       top-2 pages per domain: row_number window + rank<=2
             filter (Spark's WindowGroupLimit partial pushdown is the
             mitigation) vs the salted two-phase top-k
             (spatial/skew.py salted_topk; results identical).
  join       pages JOIN per-domain features (100k rows, broadcast
             disabled) on the hot key: sort-merge with AQE skewJoin
             OFF vs ON vs the explicit salt-exploded join
             (results asserted identical).

The reference analogue is the dense-subgrid recursion of
/root/reference/src/apply_gridshift.cpp:182+ (dense areas get their own
finer partitions); here density is rebalanced across reducers instead.

Usage: python tools/stress_skew.py [--rows N]
Prints one markdown table (for BASELINE.md) + one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

HOT_DOMAIN = "hot.example"
Z = 12


def build_pages(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic pathological pages table (no rand(): everything
    derives from the row id, so reruns are bit-identical)."""
    df = spark.range(n).withColumnRenamed("id", "i")
    h = F.xxhash64(F.col("i"))
    hot = (F.col("i") % 10) == 0                     # exact 10%
    domain = F.when(hot, F.lit(HOT_DOMAIN)).otherwise(
        F.concat(F.lit("d"), F.pmod(h, F.lit(100000)).cast("string"),
                 F.lit(".example")))
    # uniform over a 60x60 deg region; hot rows into one 0.088-deg cell
    u1 = (F.pmod(h, F.lit(1 << 20)) / float(1 << 20))
    u2 = (F.pmod(F.xxhash64(F.col("i"), F.lit(1)), F.lit(1 << 20))
          / float(1 << 20))
    lon = F.when(hot, 16.30 + 0.08 * u1).otherwise(-30.0 + 60.0 * u1)
    lat = F.when(hot, 48.16 + 0.08 * u2).otherwise(-30.0 + 60.0 * u2)
    return df.select(
        F.col("i"),
        F.concat(F.lit("https://"), domain, F.lit("/p"),
                 F.col("i").cast("string")).alias("url"),
        domain.alias("domain"), lon.alias("lon"), lat.alias("lat"))


# ---------------------------------------------------------------------------
# task-duration probing (Spark UI REST)
# ---------------------------------------------------------------------------

def _rest(spark: SparkSession, path: str):
    base = spark.sparkContext.uiWebUrl
    if not base:
        return None
    try:
        with urllib.request.urlopen(f"{base}/api/v1{path}", timeout=10) as r:
            return json.load(r)
    except Exception:
        return None


def heaviest_stage_tasks(spark: SparkSession, since_stage: int):
    """(max_task_sec, median_task_sec, n_tasks, stage_id) of the stage
    with the largest max task duration among stages >= since_stage."""
    app = spark.sparkContext.applicationId
    stages = _rest(spark, f"/applications/{app}/stages?status=complete")
    if not stages:
        return None
    best = None
    for st in stages:
        sid = st["stageId"]
        if sid < since_stage:
            continue
        q = _rest(spark, f"/applications/{app}/stages/{sid}/"
                         f"{st['attemptId']}/taskSummary"
                         f"?quantiles=0.0,0.5,1.0")
        if not q:
            continue
        dur = q.get("duration") or q.get("executorRunTime")
        if not dur:
            continue
        mx, med = dur[2] / 1000.0, dur[1] / 1000.0
        if best is None or mx > best[0]:
            best = (mx, med, st.get("numCompleteTasks", 0), sid)
    return best


def run_case(spark: SparkSession, label: str, thunk, results: list):
    next_stage = 0
    app = spark.sparkContext.applicationId
    stages = _rest(spark, f"/applications/{app}/stages") or []
    if stages:
        next_stage = max(s["stageId"] for s in stages) + 1
    t0 = time.time()
    out = thunk()
    wall = time.time() - t0
    tasks = heaviest_stage_tasks(spark, next_stage)
    row = {"case": label, "wall_s": round(wall, 2),
           "max_task_s": round(tasks[0], 2) if tasks else None,
           "med_task_s": round(tasks[1], 3) if tasks else None,
           "skew_ratio": (round(tasks[0] / max(tasks[1], 1e-3), 1)
                          if tasks else None)}
    results.append(row)
    print(f"  {label:34s} wall {row['wall_s']:7.2f}s  "
          f"max-task {row['max_task_s']}s  med {row['med_task_s']}s  "
          f"ratio {row['skew_ratio']}", flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=6_000_000)
    args = ap.parse_args()

    spark = (SparkSession.builder.master("local[32]")
             .appName("stress_skew")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "true")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from proj_spark.spatial.cells import tile_x, tile_y
    from proj_spark.spatial.skew import (salted_count,
                                         salted_distinct_count,
                                         salted_topk)

    pages = build_pages(spark, args.rows).persist()
    n = pages.count()
    hot_n = pages.where(F.col("domain") == HOT_DOMAIN).count()
    print(f"rows={n:,}  hot-domain rows={hot_n:,} "
          f"({100.0 * hot_n / n:.1f}%)", flush=True)
    results: list[dict] = []

    # -- agg: count + exact distinct per domain -------------------------
    naive = run_case(
        spark, "agg naive groupBy",
        lambda: (pages.groupBy("domain")
                 .agg(F.count("*").alias("n"),
                      F.countDistinct("url").alias("nd"))
                 .orderBy(F.desc("n"), "domain").limit(5).collect()), results)
    salted = run_case(
        spark, "agg salted two-phase",
        lambda: (salted_count(pages, ["domain"], "i", k=16)
                 .join(salted_distinct_count(pages, ["domain"], "url",
                                             k=16, count_name="nd"),
                       "domain")
                 .orderBy(F.desc("n"), "domain").limit(5).collect()), results)
    assert sorted((r["domain"], r["n"], r["nd"]) for r in naive) == \
        sorted((r["domain"], r["n"], r["nd"]) for r in salted)

    # -- cell: z12 density rollup over the hot cell ---------------------
    cells = pages.select(tile_x(F.col("lon"), Z).alias("cell_x"),
                         tile_y(F.col("lat"), Z).alias("cell_y"))
    run_case(
        spark, "cell z12 rollup (partial agg)",
        lambda: (cells.groupBy("cell_x", "cell_y")
                 .agg(F.count("*").alias("n"))
                 .orderBy(F.desc("n")).limit(3).collect()), results)

    # -- topk: top-2 per domain -----------------------------------------
    w = Window.partitionBy("domain").orderBy(F.desc("lat"), "url")
    # pathological baseline: a window WITHOUT a rank filter gets no
    # WindowGroupLimit pushdown — the hot domain's 600k rows sort in
    # ONE task (this is what unmitigated skew looks like)
    run_case(
        spark, "topk window NO pushdown (patho)",
        lambda: (pages.withColumn("r", F.row_number().over(w))
                 .agg(F.sum("r")).collect()), results)
    t_win = run_case(
        spark, "topk window rank<=2 (group-limit)",
        lambda: (pages.withColumn("r", F.row_number().over(w))
                 .where(F.col("r") <= 2)
                 .agg(F.count("*"), F.sum(F.crc32(F.col("url"))))
                 .collect()), results)
    t_salt = run_case(
        spark, "topk salted two-phase",
        lambda: (salted_topk(pages, ["domain"], "i",
                             [F.desc("lat"), F.asc("url")], 2, salt_k=16)
                 .agg(F.count("*"), F.sum(F.crc32(F.col("url"))))
                 .collect()), results)
    assert [tuple(r) for r in t_win] == [tuple(r) for r in t_salt]

    # -- join: pages x domain features on the hot key -------------------
    feats = (pages.select("domain").distinct()
             .withColumn("score", F.pmod(F.xxhash64("domain"),
                                         F.lit(1000)))
             .persist())
    feats.count()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    def join_agg(p, f, on):
        return (p.join(f, on)
                .agg(F.count("*").alias("n"),
                     F.sum("score").alias("s")).collect())

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    j_off = run_case(spark, "join SMJ, AQE skewJoin OFF",
                     lambda: join_agg(pages, feats, "domain"), results)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    j_on = run_case(spark, "join SMJ, AQE skewJoin ON",
                    lambda: join_agg(pages, feats, "domain"), results)

    k = 16
    feats_x = feats.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
    pages_s = pages.withColumn("_salt",
                               F.pmod(F.xxhash64("i"), F.lit(k)))
    j_salt = run_case(
        spark, "join salt-exploded dim (k=16)",
        lambda: join_agg(pages_s, feats_x, ["domain", "_salt"]), results)
    assert [tuple(r) for r in j_off] == [tuple(r) for r in j_on] \
        == [tuple(r) for r in j_salt]

    # -- report ---------------------------------------------------------
    print("\n| case | wall s | max task s | median task s | max/med |")
    print("|---|---|---|---|---|")
    for r in results:
        print(f"| {r['case']} | {r['wall_s']} | {r['max_task_s']} "
              f"| {r['med_task_s']} | {r['skew_ratio']} |")
    print(json.dumps({"metric": "skew_stress", "rows": n,
                      "hot_fraction": round(hot_n / n, 3),
                      "cases": results}))
    spark.stop()


if __name__ == "__main__":
    main()
