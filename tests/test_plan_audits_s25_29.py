"""Plan audits for the session 25-29 queries: assert the physical
plan shapes the docstrings claim — everything stays JVM-side (no
row-Python in any of these layers), broadcasts where promised,
TakeOrdered instead of global corpus sorts, and the huff/bootstrap
"zero per-point shuffle" contracts."""

from __future__ import annotations

import contextlib
import io

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_new_layers_have_no_row_python(spark):
    # sessions 25-29 are pure relational algebra: no BatchEvalPython
    # (row-at-a-time) and no ArrowEvalPython (these queries don't even
    # need vectorized UDFs) anywhere in their plans
    for name in ["copurchase", "holt_hours", "ccf_types", "stylometry",
                 "weighted_sample", "containment", "ppr_domains",
                 "truss", "betweenness", "event_trigrams", "rrf_fusion",
                 "huff_shares", "rake_keywords", "attribution",
                 "perm_entropy", "hurst_var", "chi2_indep",
                 "concentration", "raster_morph", "poisson_bootstrap"]:
        plan = _plan(entry.queries()[name](spark, SF_DIR))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_copurchase_plan(spark):
    plan = _plan(entry.q_copurchase(spark, SF_DIR))
    # part counts + order total broadcast; top-k is TakeOrdered
    assert "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


def test_huff_plan_no_per_point_shuffle(spark):
    plan = _plan(entry.q_huff_shares(spark, SF_DIR))
    # the scalar-expanded Huff algebra keeps every per-point operator
    # map-side: the only exchanges are 40-key hash aggs and the
    # broadcast of the one-row attractiveness array — no exchange may
    # carry a per-point key, which would show up as an exchange on a
    # non-aggregated id column (the earlier pid-keyed plan had three)
    assert plan.count("BroadcastExchange") >= 1
    assert "hashpartitioning(pid" not in plan
    assert "CartesianProduct" not in plan


def test_rrf_plan_truncated_windows(spark):
    plan = _plan(entry.q_rrf_fusion(spark, SF_DIR))
    # both rank windows run over TakeOrdered top-R relations — the
    # plan must take top-k BEFORE any Window operator
    tree = plan.split("\n\n")[0]
    first_window = tree.find("Window")
    first_topk = tree.find("TakeOrderedAndProject")
    assert first_topk != -1 and first_window != -1
    assert "TakeOrderedAndProject" in plan


def test_bootstrap_plan_single_exchange(spark):
    plan = _plan(entry.q_poisson_bootstrap(spark, SF_DIR))
    # one KEYED exchange (the 64-replicate hash agg); the x64 explode
    # is map-side.  The _docs round-robin balance exchange is not a
    # data-dependent shuffle and is excluded (it carries the 1-file
    # sandbox scan to full parallelism; a multi-split scan wouldn't
    # need it).
    n_keyed = plan.count("hashpartitioning")
    assert n_keyed == 1, plan
    assert "Generate" in plan


def test_stylometry_plan_broadcasts(spark):
    plan = _plan(entry.q_stylometry(spark, SF_DIR))
    # vocabulary, source count and variance relations broadcast into
    # the tiny matrix joins
    assert plan.count("BroadcastExchange") >= 2
