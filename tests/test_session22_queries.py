"""First-principles checks for the session-22 relational spine
(TPC-H Q7/Q8/Q9/Q10/Q12/Q13/Q15/Q17/Q19/Q21/Q22 analogues): pure-pandas
replays at sf0.001, exactness/semantics properties, and plan audits."""

from __future__ import annotations

import contextlib
import datetime
import io

import pandas as pd
from pyspark.sql import functions as F

import __spark_entry__ as entry
from __spark_entry__ import (_Q7_HI_US, _Q7_LO_US, _Q7_NAT_A, _Q7_NAT_B,
                             _Q8_NATION, _Q8_REGION, _Q8_TYPE, _Q9_COST_PCT,
                             _Q9_NAME_PAT, _Q10_HI_US, _Q10_LO_US, _Q10_TOPK,
                             _Q12_HI_US, _Q12_LO_US, _Q13_EXCL, _Q15_HI_US,
                             _Q15_LO_US, _Q17_BRAND, _Q19_BUNDLES,
                             _Q22_CUT_US, _DAY_US_SPINE, _YB_US)

SF_DIR = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _rhalf(v: float) -> int:
    return int(v + 0.5) if v >= 0 else -int(-v + 0.5)


def _cents(v: float) -> int:
    return _rhalf(v * 100)


def _us(s: pd.Series) -> pd.Series:
    return s.astype("datetime64[ns]").astype("int64") // 1000


def _year(us: int) -> int:
    return 1995 + sum(1 for _, b in _YB_US if us >= b)


def _tbl(name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/{name}.parquet")


def _rev_c2_row(price: float, disc: float) -> int:
    return _cents(price) * (100 - _cents(disc))


def _collect(spark, name: str) -> pd.DataFrame:
    return entry.queries()[name](spark, SF_DIR).toPandas()


# ---------------------------------------------------------------------------
# year extraction
# ---------------------------------------------------------------------------

def test_year_boundaries_match_utc_calendar():
    """The boundary-comparison year equals the UTC calendar year for
    every stored date in the corpus (orders + lineitem)."""
    for t, c in [("orders", "o_orderdate"), ("lineitem", "l_shipdate")]:
        df = _tbl(t)
        for usv in _us(df[c]).tolist()[::7]:
            dt = datetime.datetime.fromtimestamp(
                usv / 1e6, tz=datetime.timezone.utc)
            assert _year(usv) == dt.year


# ---------------------------------------------------------------------------
# Q7 volume_shipping
# ---------------------------------------------------------------------------

def test_volume_shipping_replay(spark):
    li, o = _tbl("lineitem"), _tbl("orders")
    cust, sup, nat = _tbl("customer"), _tbl("supplier"), _tbl("nation")
    nname = dict(zip(nat.n_nationkey, nat.n_name))
    cnat = dict(zip(cust.c_custkey, cust.c_nationkey))
    snat = dict(zip(sup.s_suppkey, sup.s_nationkey))
    ocust = dict(zip(o.o_orderkey, o.o_custkey))
    ship = _us(li.l_shipdate)
    exp: dict[tuple, list[int]] = {}
    for i in range(len(li)):
        usv = int(ship.iloc[i])
        if not (_Q7_LO_US <= usv < _Q7_HI_US):
            continue
        sn = nname[snat[int(li.l_suppkey.iloc[i])]]
        cn = nname[cnat[ocust[int(li.l_orderkey.iloc[i])]]]
        if {sn, cn} != {_Q7_NAT_A, _Q7_NAT_B}:
            continue
        k = (sn, cn, _year(usv))
        r = _rev_c2_row(float(li.l_extendedprice.iloc[i]),
                        float(li.l_discount.iloc[i]))
        e = exp.setdefault(k, [0, 0])
        e[0] += r
        e[1] += 1
    got = _collect(spark, "volume_shipping")
    gm = {(r.supp_nation, r.cust_nation, r.l_year):
          (r.revenue_c2, r.n_items) for r in got.itertuples()}
    assert gm == {k: (v[0], v[1]) for k, v in exp.items()}
    # both directions exist and no same-nation flows leak through
    assert all(a != b for a, b, _ in gm)


# ---------------------------------------------------------------------------
# Q8 market_share
# ---------------------------------------------------------------------------

def test_market_share_replay(spark):
    li, o, part = _tbl("lineitem"), _tbl("orders"), _tbl("part")
    cust, sup, nat = _tbl("customer"), _tbl("supplier"), _tbl("nation")
    reg = _tbl("region")
    rkey = dict(zip(reg.r_name, reg.r_regionkey))
    asia = set(nat[nat.n_regionkey == rkey[_Q8_REGION]].n_nationkey)
    asia_cust = set(cust[cust.c_nationkey.isin(asia)].c_custkey)
    nname = dict(zip(nat.n_nationkey, nat.n_name))
    snat = dict(zip(sup.s_suppkey, sup.s_nationkey))
    econ = set(part[part.p_type == _Q8_TYPE].p_partkey)
    ocust = dict(zip(o.o_orderkey, o.o_custkey))
    oyear = dict(zip(o.o_orderkey, _us(o.o_orderdate).map(_year)))
    exp: dict[int, list[int]] = {}
    for i in range(len(li)):
        ok = int(li.l_orderkey.iloc[i])
        if ocust[ok] not in asia_cust:
            continue
        if int(li.l_partkey.iloc[i]) not in econ:
            continue
        r = _rev_c2_row(float(li.l_extendedprice.iloc[i]),
                        float(li.l_discount.iloc[i]))
        e = exp.setdefault(int(oyear[ok]), [0, 0])
        e[1] += r
        if nname[snat[int(li.l_suppkey.iloc[i])]] == _Q8_NATION:
            e[0] += r
    got = _collect(spark, "market_share")
    gm = {r.o_year: (r.nat_c2, r.tot_c2, r.mkt_share)
          for r in got.itertuples()}
    assert set(gm) == set(exp)
    for y, (n, t) in exp.items():
        assert gm[y][0] == n and gm[y][1] == t
        assert gm[y][2] == round(n / t, 6)


# ---------------------------------------------------------------------------
# Q9 product_profit
# ---------------------------------------------------------------------------

def test_product_profit_replay(spark):
    li, o, part = _tbl("lineitem"), _tbl("orders"), _tbl("part")
    sup, nat = _tbl("supplier"), _tbl("nation")
    pat = _Q9_NAME_PAT.strip("%")
    rods = {int(r.p_partkey): _cents(float(r.p_retailprice))
            for r in part.itertuples() if pat in r.p_name}
    nname = dict(zip(nat.n_nationkey, nat.n_name))
    snat = dict(zip(sup.s_suppkey, sup.s_nationkey))
    oyear = dict(zip(o.o_orderkey, _us(o.o_orderdate).map(_year)))
    exp: dict[tuple, list[int]] = {}
    for i in range(len(li)):
        pk = int(li.l_partkey.iloc[i])
        if pk not in rods:
            continue
        qty = _rhalf(float(li.l_quantity.iloc[i]))
        profit = (_rev_c2_row(float(li.l_extendedprice.iloc[i]),
                              float(li.l_discount.iloc[i]))
                  - qty * rods[pk] * _Q9_COST_PCT)
        k = (nname[snat[int(li.l_suppkey.iloc[i])]],
             int(oyear[int(li.l_orderkey.iloc[i])]))
        e = exp.setdefault(k, [0, 0])
        e[0] += profit
        e[1] += 1
    got = _collect(spark, "product_profit")
    gm = {(r.supp_nation, r.o_year): (r.profit_c2, r.n_items)
          for r in got.itertuples()}
    assert gm == {k: (v[0], v[1]) for k, v in exp.items()}


# ---------------------------------------------------------------------------
# Q10 returned_items
# ---------------------------------------------------------------------------

def test_returned_items_replay(spark):
    li, o = _tbl("lineitem"), _tbl("orders")
    cust, nat = _tbl("customer"), _tbl("nation")
    ous = _us(o.o_orderdate)
    q = o[(ous >= _Q10_LO_US) & (ous < _Q10_HI_US)]
    ocust = dict(zip(q.o_orderkey, q.o_custkey))
    rev: dict[int, int] = {}
    for i in range(len(li)):
        if li.l_returnflag.iloc[i] != "R":
            continue
        ok = int(li.l_orderkey.iloc[i])
        if ok not in ocust:
            continue
        ck = int(ocust[ok])
        rev[ck] = rev.get(ck, 0) + _rev_c2_row(
            float(li.l_extendedprice.iloc[i]),
            float(li.l_discount.iloc[i]))
    top = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))[:_Q10_TOPK]
    nname = dict(zip(nat.n_nationkey, nat.n_name))
    crow = {int(r.c_custkey): r for r in cust.itertuples()}
    got = _collect(spark, "returned_items")
    assert len(got) == len(top)
    gm = {r.c_custkey: r for r in got.itertuples()}
    for ck, rv in top:
        g = gm[ck]
        assert g.revenue_c2 == rv
        assert g.c_name == crow[ck].c_name
        assert g.bal_c == _cents(float(crow[ck].c_acctbal))
        assert g.nation == nname[crow[ck].c_nationkey]


# ---------------------------------------------------------------------------
# Q12 ship_modes
# ---------------------------------------------------------------------------

def test_ship_modes_replay(spark):
    li, o = _tbl("lineitem"), _tbl("orders")
    odate = dict(zip(o.o_orderkey, _us(o.o_orderdate)))
    oprio = dict(zip(o.o_orderkey, o.o_orderpriority))
    ship = _us(li.l_shipdate)
    exp = {m: [0, 0] for m in ("FAST", "REG", "SLOW")}
    for i in range(len(li)):
        usv = int(ship.iloc[i])
        if not (_Q12_LO_US <= usv < _Q12_HI_US):
            continue
        ok = int(li.l_orderkey.iloc[i])
        lag = usv - int(odate[ok])
        mode = ("FAST" if lag < 30 * _DAY_US_SPINE
                else "REG" if lag < 90 * _DAY_US_SPINE else "SLOW")
        hi = oprio[ok] in ("1-URGENT", "2-HIGH")
        exp[mode][0 if hi else 1] += 1
    exp = {m: v for m, v in exp.items() if v != [0, 0]}
    got = _collect(spark, "ship_modes")
    gm = {r.ship_mode: (r.n_high, r.n_low) for r in got.itertuples()}
    assert gm == {m: (v[0], v[1]) for m, v in exp.items()}


# ---------------------------------------------------------------------------
# Q13 cust_orders_dist
# ---------------------------------------------------------------------------

def test_cust_orders_dist_replay(spark):
    o, cust = _tbl("orders"), _tbl("customer")
    q = o[o.o_orderpriority != _Q13_EXCL]
    cnt = q.groupby("o_custkey").size().to_dict()
    ks = [int(cnt.get(ck, 0)) for ck in cust.c_custkey]
    exp: dict[int, int] = {}
    for k in ks:
        exp[k] = exp.get(k, 0) + 1
    got = _collect(spark, "cust_orders_dist")
    gm = {r.c_count: r.custdist for r in got.itertuples()}
    assert gm == exp
    # the distribution covers every customer exactly once
    assert sum(gm.values()) == len(cust)


# ---------------------------------------------------------------------------
# Q15 top_supplier
# ---------------------------------------------------------------------------

def test_top_supplier_replay(spark):
    li, sup = _tbl("lineitem"), _tbl("supplier")
    ship = _us(li.l_shipdate)
    rev: dict[int, int] = {}
    for i in range(len(li)):
        usv = int(ship.iloc[i])
        if not (_Q15_LO_US <= usv < _Q15_HI_US):
            continue
        sk = int(li.l_suppkey.iloc[i])
        rev[sk] = rev.get(sk, 0) + _rev_c2_row(
            float(li.l_extendedprice.iloc[i]),
            float(li.l_discount.iloc[i]))
    mx = max(rev.values())
    winners = {sk for sk, v in rev.items() if v == mx}
    sname = dict(zip(sup.s_suppkey, sup.s_name))
    got = _collect(spark, "top_supplier")
    assert set(got.s_suppkey) == winners
    for r in got.itertuples():
        assert r.total_c2 == mx and r.s_name == sname[r.s_suppkey]


# ---------------------------------------------------------------------------
# Q17 small_qty
# ---------------------------------------------------------------------------

def test_small_qty_replay(spark):
    li, part = _tbl("lineitem"), _tbl("part")
    brand = set(part[part.p_brand == _Q17_BRAND].p_partkey)
    lines = [(int(r.l_partkey), _rhalf(float(r.l_quantity)),
              _cents(float(r.l_extendedprice)))
             for r in li.itertuples() if int(r.l_partkey) in brand]
    sq: dict[int, int] = {}
    nq: dict[int, int] = {}
    for pk, q, _ in lines:
        sq[pk] = sq.get(pk, 0) + q
        nq[pk] = nq.get(pk, 0) + 1
    rev = n = 0
    for pk, q, pc in lines:
        if 5 * q * nq[pk] < sq[pk]:
            rev += pc
            n += 1
    got = _collect(spark, "small_qty")
    assert len(got) == 1
    r = got.iloc[0]
    assert r.revenue_c == rev and r.n_lines == n
    assert r.avg_yearly == round(rev / 700.0, 6)


# ---------------------------------------------------------------------------
# Q19 disc_revenue
# ---------------------------------------------------------------------------

def test_disc_revenue_replay(spark):
    li, part = _tbl("lineitem"), _tbl("part")
    pinfo = {int(r.p_partkey): (r.p_brand, int(r.p_size))
             for r in part.itertuples()}
    exp = {}
    for r in li.itertuples():
        brand, size = pinfo[int(r.l_partkey)]
        qty = _rhalf(float(r.l_quantity))
        for i, (b, sl, sh, ql, qh) in enumerate(_Q19_BUNDLES, 1):
            if brand == b and sl <= size <= sh and ql <= qty <= qh:
                e = exp.setdefault(i, [0, 0])
                e[0] += _rev_c2_row(float(r.l_extendedprice),
                                    float(r.l_discount))
                e[1] += 1
                break
    got = _collect(spark, "disc_revenue")
    gm = {r.bundle: (r.revenue_c2, r.n_lines) for r in got.itertuples()}
    assert gm == {k: (v[0], v[1]) for k, v in exp.items()}


def test_disc_revenue_bundles_disjoint():
    brands = [b for b, *_ in _Q19_BUNDLES]
    assert len(brands) == len(set(brands))


# ---------------------------------------------------------------------------
# Q21 late_suppliers
# ---------------------------------------------------------------------------

def test_late_suppliers_replay(spark):
    li, o, sup = _tbl("lineitem"), _tbl("orders"), _tbl("supplier")
    fstat = set(o[o.o_orderstatus == "F"].o_orderkey)
    ship = _us(li.l_shipdate)
    by_order: dict[int, list[tuple[int, int]]] = {}
    for i in range(len(li)):
        by_order.setdefault(int(li.l_orderkey.iloc[i]), []).append(
            (int(li.l_suppkey.iloc[i]), int(ship.iloc[i])))
    exp: dict[int, int] = {}
    for ok, rows in by_order.items():
        if ok not in fstat:
            continue
        for sk, t in rows:
            others = [(s2, t2) for s2, t2 in rows if s2 != sk]
            if not others:          # EXISTS another supplier
                continue
            if any(t2 >= t for _, t2 in others):   # NOT EXISTS late peer
                continue
            exp[sk] = exp.get(sk, 0) + 1
    sname = dict(zip(sup.s_suppkey, sup.s_name))
    got = _collect(spark, "late_suppliers")
    gm = {r.s_suppkey: r.numwait for r in got.itertuples()}
    assert gm == exp
    for r in got.itertuples():
        assert r.s_name == sname[r.s_suppkey]


def test_late_suppliers_hand_case(spark):
    """Order F1: supplier 1 ships last strictly -> one wait for s1.
    Order F2: tie at the max between s1 and s2 -> nobody qualifies.
    Order F3: single-supplier -> EXISTS fails, nobody qualifies."""
    rows = [(1, 1, 100), (1, 2, 50), (1, 2, 60),
            (2, 1, 100), (2, 2, 100),
            (3, 1, 100), (3, 1, 200)]
    by_order: dict[int, list[tuple[int, int]]] = {}
    for ok, sk, t in rows:
        by_order.setdefault(ok, []).append((sk, t))
    waits: dict[int, int] = {}
    for ok, rr in by_order.items():
        for sk, t in rr:
            others = [(s2, t2) for s2, t2 in rr if s2 != sk]
            if others and not any(t2 >= t for _, t2 in others):
                waits[sk] = waits.get(sk, 0) + 1
    assert waits == {1: 1}


# ---------------------------------------------------------------------------
# Q22 idle_customers
# ---------------------------------------------------------------------------

def test_idle_customers_replay(spark):
    cust, o, nat = _tbl("customer"), _tbl("orders"), _tbl("nation")
    bal = {int(r.c_custkey): _cents(float(r.c_acctbal))
           for r in cust.itertuples()}
    s_pos = sum(v for v in bal.values() if v > 0)
    n_pos = sum(1 for v in bal.values() if v > 0)
    ous = _us(o.o_orderdate)
    recent = set(o[ous >= _Q22_CUT_US].o_custkey.astype(int))
    cnat = dict(zip(cust.c_custkey, cust.c_nationkey))
    nname = dict(zip(nat.n_nationkey, nat.n_name))
    exp: dict[str, list[int]] = {}
    for ck, v in bal.items():
        if v * n_pos > s_pos and ck not in recent:
            e = exp.setdefault(nname[cnat[ck]], [0, 0])
            e[0] += 1
            e[1] += v
    got = _collect(spark, "idle_customers")
    gm = {r.nation: (r.n_cust, r.bal_c_sum) for r in got.itertuples()}
    assert gm == {k: (v[0], v[1]) for k, v in exp.items()}


# ---------------------------------------------------------------------------
# plan audits
# ---------------------------------------------------------------------------

def test_disc_revenue_plan_no_fact_shuffle(spark):
    """Q19 is one broadcast join + map-side filters: the fact table
    must not sort-merge or exchange before the (tiny) final agg."""
    plan = _plan_of(entry.queries()["disc_revenue"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_small_qty_plan_broadcasts(spark):
    plan = _plan_of(entry.queries()["small_qty"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_returned_items_customer_never_shuffles(spark):
    """The top-20 survivors broadcast back into customer, so customer
    appears only on the streamed side of a broadcast join."""
    plan = _plan_of(entry.queries()["returned_items"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
