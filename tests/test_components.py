"""Connected-components dedup grouping (text/components.py)."""

import pytest
from pyspark.sql import functions as F

from proj_spark.text.components import (_cc_with_rounds, connected_components,
                                        dedup_assign)


def _edges(spark, pairs):
    return spark.createDataFrame([(int(a), int(b)) for a, b in pairs],
                                 "src long, dst long")


def _labels(df):
    return {r["id"]: r["comp"] for r in df.collect()}


def test_two_cliques_and_bridge(spark):
    # {0,1,2} clique, {10,11} pair, bridge 2-10 merges them; {20,21} apart
    e = _edges(spark, [(0, 1), (1, 2), (0, 2), (10, 11), (2, 10), (20, 21)])
    lab = _labels(connected_components(e))
    assert {k: v for k, v in lab.items()} == {
        0: 0, 1: 0, 2: 0, 10: 0, 11: 0, 20: 20, 21: 20}


def test_duplicate_and_self_edges_tolerated(spark):
    e = _edges(spark, [(1, 2), (2, 1), (1, 2), (3, 3), (3, 4)])
    lab = _labels(connected_components(e))
    assert lab == {1: 1, 2: 1, 3: 3, 4: 3}


def test_chain_converges_logarithmically(spark):
    # adversarial diameter: a 256-node path; pointer jumping must beat
    # the O(diameter) bound of plain label propagation by a wide margin
    n = 256
    e = _edges(spark, [(i, i + 1) for i in range(n - 1)])
    lab_df, rounds = _cc_with_rounds(e, "src", "dst", max_rounds=64)
    lab = _labels(lab_df)
    assert all(lab[i] == 0 for i in range(n))
    assert rounds <= 12, f"chain took {rounds} rounds (expected O(log n))"


def test_empty_edges(spark):
    e = _edges(spark, [])
    assert connected_components(e).count() == 0


def test_dedup_assign_singletons_and_sizes(spark):
    nodes = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    e = _edges(spark, [(1, 3), (3, 5), (6, 7)])
    out = {r["doc_id"]: (r["comp_id"], r["comp_size"], r["is_keep"])
           for r in dedup_assign(nodes, e).collect()}
    assert out == {
        0: (0, 1, True), 1: (1, 3, True), 2: (2, 1, True), 3: (1, 3, False),
        4: (4, 1, True), 5: (1, 3, False), 6: (6, 2, True), 7: (6, 2, False)}


def test_keep_exactly_one_per_group(spark):
    nodes = spark.createDataFrame([(i,) for i in range(30)], "doc_id long")
    e = _edges(spark, [(i, i + 10) for i in range(10)]
               + [(i, i + 20) for i in range(5)])
    out = dedup_assign(nodes, e)
    per_comp = (out.groupBy("comp_id")
                .agg(F.sum(F.col("is_keep").cast("int")).alias("keeps"))
                .collect())
    assert all(r["keeps"] == 1 for r in per_comp)
    assert out.count() == 30
