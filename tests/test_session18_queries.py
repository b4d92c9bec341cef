"""First-principles checks for the TPC-H Q3/Q6 analogues: both
recomputed from the raw parquet rows in pure Python at sf0.001."""

from __future__ import annotations

from collections import defaultdict
from datetime import timezone

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _cents(x: float) -> int:
    # round-half-up like Spark/DuckDB ROUND on positive money values
    return int(x * 100 + 0.5)


def test_ship_priority_matches_replay(spark):
    cust = {r.c_custkey for r in
            spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
            if r.c_mktsegment == entry._Q3_SEGMENT}
    orders = {}
    for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect():
        us = int(r.o_orderdate.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
        if r.o_custkey in cust and us < entry._Q3_CUT_US:
            orders[r.o_orderkey] = (us, r.o_orderpriority)
    rev = defaultdict(int)
    for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect():
        us = int(r.l_shipdate.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
        if us > entry._Q3_CUT_US and r.l_orderkey in orders:
            rev[r.l_orderkey] += _cents(r.l_extendedprice) * (
                100 - _cents(r.l_discount))
    want = sorted(((k, orders[k][0], orders[k][1], v)
                   for k, v in rev.items()),
                  key=lambda t: (-t[3], t[0]))[:entry._Q3_TOPK]
    got = [(r.l_orderkey, r.o_date_us, r.o_orderpriority, r.revenue_c2)
           for r in entry.q_ship_priority(spark, SF_DIR).collect()]
    assert got == want
    assert len(got) > 0


def test_revenue_forecast_matches_replay(spark):
    tot, n = 0, 0
    for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect():
        us = int(r.l_shipdate.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
        d = _cents(r.l_discount)
        q = int(round(r.l_quantity))
        if entry._Q6_LO_US <= us < entry._Q6_HI_US and 5 <= d <= 7 \
                and q < 24:
            tot += _cents(r.l_extendedprice) * d
            n += 1
    row = entry.q_revenue_forecast(spark, SF_DIR).collect()[0]
    assert (row.revenue_c2, row.n_items) == (tot, n)
    assert n > 0
