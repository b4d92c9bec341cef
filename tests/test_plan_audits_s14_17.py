"""Plan audits for the session 14-17 queries: assert the physical
plan shapes the docstrings claim (broadcasts where promised, no
unexpected shuffles, TakeOrdered instead of global sorts)."""

from __future__ import annotations

import contextlib
import io
import re

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _tree(plan: str) -> list[str]:
    return plan.split("\n\n")[0].splitlines()


def test_bm25_plan_broadcast_query_and_topk(spark):
    plan = _plan(entry.q_bm25_topk(spark, SF_DIR))
    # mined query terms + corpus totals reach the scoring join as
    # broadcasts; the final top-k is a TakeOrdered, not a global sort
    assert "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_cocitation_plan_broadcast_cap_and_topk(spark):
    plan = _plan(entry.q_cocitation(spark, SF_DIR))
    assert "BroadcastExchange" in plan      # out-degree cap relation
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_link_pred_plan_broadcast_joins_topk(spark):
    plan = _plan(entry.q_link_pred(spark, SF_DIR))
    assert "BroadcastExchange" in plan      # deg cap + anti join
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_kcore_plan_all_joins_broadcast(spark):
    # every per-round semi join must be broadcast — the live edge
    # relation is never sort-merge-joined, so the only exchanges are
    # the degree aggregations
    df = entry.q_kcore(spark, SF_DIR)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2 * entry.KCORE_ROUNDS, plan


def test_phrase_hits_plan_broadcast_probe(spark):
    plan = _plan(entry.q_phrase_hits(spark, SF_DIR))
    # the mined top-1 phrase probes the postings as a broadcast —
    # the postings relation itself is never shuffled on the phrase
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_rolling_stats_plan_single_exchange(spark):
    # ONE shuffle on user_id feeds the range frame; no other exchange
    df = entry.q_rolling_stats(spark, SF_DIR)
    tree = _tree(_plan(df))
    n_ex = sum(1 for ln in tree if re.search(r"\bExchange \(\d+\)", ln))
    assert n_ex == 1, "\n".join(tree)


def test_stay_points_plan_single_exchange(spark):
    # both windows (LAG + running sum) and the segment agg share the
    # one shuffle on domain — the agg is partial (map-side combined)
    # on the window output, so no second exchange appears
    df = entry.q_stay_points(spark, SF_DIR)
    tree = _tree(_plan(df))
    n_ex = sum(1 for ln in tree if re.search(r"\bExchange \(\d+\)", ln))
    assert n_ex <= 2, "\n".join(tree)
    # and the two window functions share one Sort
    n_sort = sum(1 for ln in tree if re.search(r"\bSort \(\d+\)", ln))
    assert n_sort <= 1, "\n".join(tree)
