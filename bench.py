"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Set SPARK_GRAFT_SCALING=1 to additionally run the throughput-scaling probe
(same job at local[8] vs local[32]; the sandbox proxy for N vs 4N
executors per BASELINE.json) — results land under "scaling".
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from proj_spark.spark.session import get_spark  # noqa: E402

# headline set: the geo spine (synthesis -> extraction -> kernel -> join ->
# agg) plus the scalable text/dedup/similarity ops
HEADLINE = [
    "tile_density", "cell_rollup", "pip_admin", "knn", "utm_zones",
    "webmerc_bbox", "utm_project", "doc_stats", "exact_dedup",
    "token_topk", "ngram_pairs", "embed_topk", "events_hourly",
]


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        out[name] = round(time.time() - t0, 3)
        assert n >= 0
    return out


def scaling_probe(sf_dir: str, n_pages: int) -> dict:
    """Same tile-density job at two parallelism levels -> scaling eff.

    Efficiency = (rows/sec at 32 cores) / (4 x rows/sec at 8 cores);
    the north rule asks >= 0.8 between N and 4N executors.
    """
    results = {}
    for cores in (8, 32):
        spark = get_spark(f"bench-scaling-{cores}", master=f"local[{cores}]",
                          shuffle_partitions=max(cores, 8))
        # warm the JVM/Arrow path once
        entrymod.q_utm_zones(spark, sf_dir).count()
        t0 = time.time()
        entrymod.q_tile_density(spark, sf_dir).count()
        entrymod.q_pip_admin(spark, sf_dir).count()
        dt = time.time() - t0
        results[f"local[{cores}]"] = {
            "sec": round(dt, 3),
            "rows_per_sec": round(2 * n_pages / dt, 1),
        }
        spark.stop()
    eff = (results["local[32]"]["rows_per_sec"]
           / (4 * results["local[8]"]["rows_per_sec"]))
    results["scaling_efficiency_8_to_32"] = round(eff, 3)
    return results


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    spark = get_spark("bench")
    t0 = time.time()
    queries = run_queries(spark, sf_dir)
    total = round(time.time() - t0, 3)
    spark.stop()
    payload = {
        "metric": "headline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
    }
    if os.environ.get("SPARK_GRAFT_SCALING"):
        payload["scaling"] = scaling_probe(sf_dir, entrymod._n_pages(sf_dir))
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
