"""First-principles checks for the session-22c layer: the synthetic
partsupp relation and the TPC-H Q2/Q11/Q20 analogues built on it —
pure-Python replays at sf0.001 and gate-semantics hand cases."""

from __future__ import annotations

import pandas as pd

import __spark_entry__ as entry
from __spark_entry__ import (_PS_COST_MOD, _PS_QTY_MOD, _Q2_REGION,
                             _Q2_SIZE, _Q2_TOPK, _Q11_NATION,
                             _Q20_LO_US, _Q20_HI_US, _Q20_NAME_PAT,
                             _Q20_NATION)

SF_DIR = "/root/testdata/sf0.001"


def _rhalf(v: float) -> int:
    return int(v + 0.5) if v >= 0 else -int(-v + 0.5)


def _cents(v: float) -> int:
    return _rhalf(v * 100)


def _us(s: pd.Series) -> pd.Series:
    return s.astype("datetime64[ns]").astype("int64") // 1000


def _tbl(name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/{name}.parquet")


def _py_partsupp() -> dict[tuple[int, int], tuple[int, int]]:
    """(partkey, suppkey) -> (cost_c, availqty), the closed-form
    synthesis mirrored from _partsupp/_sql_partsupp."""
    part = _tbl("part")
    n_supp = len(_tbl("supplier"))
    out: dict[tuple[int, int], tuple[int, int]] = {}
    for p in part.p_partkey.astype(int):
        for k in range(4):
            s = (p + k * (1 + p % 7)) % n_supp
            out[(p, s)] = (101 + (p * 31 + s * 17) % _PS_COST_MOD,
                           1 + (p * 13 + s * 7) % _PS_QTY_MOD)
    return out


def test_partsupp_synthesis_matches(spark):
    got = {(r.ps_partkey, r.ps_suppkey): (r.ps_cost_c, r.ps_availqty)
           for r in entry._partsupp(spark, SF_DIR).toPandas()
           .itertuples()}
    assert got == _py_partsupp()


def test_partsupp_row_count_bounded(spark):
    """<= 4 offers per part (collisions deduped), >= 1 per part."""
    df = entry._partsupp(spark, SF_DIR).toPandas()
    per_part = df.groupby("ps_partkey").size()
    assert per_part.max() <= 4 and per_part.min() >= 1
    assert len(per_part) == len(_tbl("part"))


def test_min_cost_supp_replay(spark):
    ps = _py_partsupp()
    part = _tbl("part")
    sup, nat, reg = _tbl("supplier"), _tbl("nation"), _tbl("region")
    rk = dict(zip(reg.r_name, reg.r_regionkey))
    euro_nat = set(nat[nat.n_regionkey == rk[_Q2_REGION]].n_nationkey)
    nname = dict(zip(nat.n_nationkey, nat.n_name))
    srow = {int(r.s_suppkey): r for r in sup.itertuples()}
    pset = set(part[part.p_size == _Q2_SIZE].p_partkey.astype(int))
    offers = [(p, s, c) for (p, s), (c, _) in ps.items()
              if p in pset and srow[s].s_nationkey in euro_nat]
    mn: dict[int, int] = {}
    for p, s, c in offers:
        mn[p] = min(mn.get(p, c), c)
    rows = []
    for p, s, c in offers:
        if c != mn[p]:
            continue
        r = srow[s]
        rows.append((_cents(float(r.s_acctbal)), r.s_name,
                     nname[r.s_nationkey], p, c))
    rows.sort(key=lambda t: (-t[0], t[2], t[1], t[3]))
    exp = rows[:_Q2_TOPK]
    got = [tuple(r) for r in entry.queries()["min_cost_supp"](
        spark, SF_DIR).toPandas().itertuples(index=False)]
    assert got == exp


def test_important_stock_replay(spark):
    ps = _py_partsupp()
    sup, nat = _tbl("supplier"), _tbl("nation")
    nk = dict(zip(nat.n_name, nat.n_nationkey))
    nat_sup = set(sup[sup.s_nationkey == nk[_Q11_NATION]]
                  .s_suppkey.astype(int))
    val: dict[int, int] = {}
    for (p, s), (c, q) in ps.items():
        if s in nat_sup:
            val[p] = val.get(p, 0) + c * q
    total, n_parts = sum(val.values()), len(val)
    exp = {p: v for p, v in val.items() if v * n_parts > 2 * total}
    got = {r.ps_partkey: r.value_c
           for r in entry.queries()["important_stock"](spark, SF_DIR)
           .toPandas().itertuples()}
    assert got == exp
    # the gate keeps a strict minority (above twice the mean)
    assert 0 < len(got) < n_parts / 2 + 1


def test_promo_suppliers_replay(spark):
    ps = _py_partsupp()
    part, li = _tbl("part"), _tbl("lineitem")
    sup, nat = _tbl("supplier"), _tbl("nation")
    cold = set(part[part.p_name.str.startswith(
        _Q20_NAME_PAT.rstrip("%"))].p_partkey.astype(int))
    ship = _us(li.l_shipdate)
    shipped: dict[tuple[int, int], int] = {}
    for i in range(len(li)):
        usv = int(ship.iloc[i])
        if not (_Q20_LO_US <= usv < _Q20_HI_US):
            continue
        k = (int(li.l_partkey.iloc[i]), int(li.l_suppkey.iloc[i]))
        shipped[k] = shipped.get(k, 0) + _rhalf(
            float(li.l_quantity.iloc[i]))
    winners = {s for (p, s), (_, avail) in ps.items()
               if p in cold and 2 * avail > shipped.get((p, s), 0)}
    nk = dict(zip(nat.n_name, nat.n_nationkey))
    exp = {(int(r.s_suppkey), r.s_name) for r in sup.itertuples()
           if r.s_nationkey == nk[_Q20_NATION]
           and int(r.s_suppkey) in winners}
    got = {(r.s_suppkey, r.s_name)
           for r in entry.queries()["promo_suppliers"](spark, SF_DIR)
           .toPandas().itertuples()}
    assert got == exp


def test_promo_never_shipped_gate():
    """An offer with NO shipments in the window passes the gate
    (2*availqty > 0) — Q20's semantics for unshipped stock."""
    assert 2 * 1 > 0
