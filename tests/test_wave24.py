"""Semantic checks for the r7 agreement/concentration wave: each
statistic recomputed from collected rows with plain Python/numpy
(no scipy/statsmodels), independent of both the Spark plan and the
DuckDB oracle."""

from __future__ import annotations

import math

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def test_mcnemar_matches_python(spark, sf_dir):
    row = REGISTRY["q_mcnemar"].builder(spark, sf_dir).collect()[0]
    ev = load(spark, sf_dir, "events").select("user_id", "event_type").collect()
    users = {}
    for r in ev:
        x, y = users.get(r.user_id, (0, 0))
        users[r.user_id] = (
            x or r.event_type == "click",
            y or r.event_type == "purchase",
        )
    b = sum(1 for x, y in users.values() if x and not y)
    c = sum(1 for x, y in users.values() if y and not x)
    assert row.n_users == len(users)
    assert (row.n10, row.n01) == (b, c)
    if b + c > 0:
        ref = (abs(b - c) - 1.0) ** 2 / (b + c)
        assert abs(row.chi2_mcnemar - ref) < 1e-5


def test_cohen_kappa_matches_python(spark, sf_dir):
    row = REGISTRY["q_cohen_kappa"].builder(spark, sf_dir).collect()[0]
    orders = load(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderpriority"
    ).collect()
    cells = {(1, 1): 0, (1, 0): 0, (0, 1): 0, (0, 0): 0}
    for r in orders:
        a = int(r.o_totalprice >= 150000)
        b = int(r.o_orderpriority in ("1-URGENT", "2-HIGH"))
        cells[(a, b)] += 1
    n = len(orders)
    n11, n10 = cells[(1, 1)], cells[(1, 0)]
    n01, n00 = cells[(0, 1)], cells[(0, 0)]
    assert (row.n, row.n11, row.n10, row.n01, row.n00) == (n, n11, n10, n01, n00)
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
    ref = (po - pe) / (1 - pe)
    assert abs(row.kappa - ref) < 1e-5
    assert -1.0 <= row.kappa <= 1.0


def test_fleiss_kappa_matches_python(spark, sf_dir):
    row = REGISTRY["q_fleiss_kappa"].builder(spark, sf_dir).collect()[0]
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag"
    ).collect()
    per_order = {}
    for r in li:
        per_order.setdefault(r.l_orderkey, []).append(r.l_returnflag)
    items = {k: v for k, v in per_order.items() if len(v) == 4}
    n_items, m = len(items), 4
    assert row.n_items == n_items
    cats = sorted({f for v in items.values() for f in v})
    s2 = 0
    col = dict.fromkeys(cats, 0)
    for votes in items.values():
        for cat in cats:
            nij = votes.count(cat)
            s2 += nij * nij
            col[cat] += nij
    ss = sum(v * v for v in col.values())
    assert (row.s2, row.ss) == (s2, ss)
    pbar = (s2 - n_items * m) / (n_items * m * (m - 1))
    pe = ss / (n_items * m) ** 2
    ref = (pbar - pe) / (1 - pe)
    assert abs(row.kappa_fleiss - ref) < 1e-5


def test_lorenz_gini_matches_python(spark, sf_dir):
    row = REGISTRY["q_lorenz_gini"].builder(spark, sf_dir).collect()[0]
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    spend = {}
    for r in orders:
        spend[r.o_custkey] = spend.get(r.o_custkey, 0) + round(
            r.o_totalprice * 100
        )
    xs = sorted(spend.values())
    n, st = len(xs), sum(xs)
    assert (row.n_customers, row.total_cents) == (n, st)
    sw = sum((i + 1) * x for i, x in enumerate(xs))
    ref = (2 * sw - (n + 1) * st) / (n * st)
    assert abs(row.gini - ref) < 1e-5
    assert 0.0 <= row.gini < 1.0
    t20 = sum(x for i, x in enumerate(xs) if (i + 1) * 5 > 4 * n)
    assert abs(row.share_top20 - t20 / st) < 1e-5
    # top-quintile share must dominate the uniform 20%
    assert row.share_top20 >= 0.2


def test_herfindahl_matches_python(spark, sf_dir):
    rows = REGISTRY["q_herfindahl"].builder(spark, sf_dir).collect()
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    ).collect()
    sup = {
        r.s_suppkey: r.s_nationkey
        for r in load(spark, sf_dir, "supplier").collect()
    }
    nat = {
        r.n_nationkey: r.n_name
        for r in load(spark, sf_dir, "nation").collect()
    }
    rev = {}
    for r in li:
        key = (sup[r.l_suppkey], r.l_suppkey)
        rev[key] = rev.get(key, 0) + round(r.l_extendedprice * 100)
    by_nation = {}
    for (nk, sk), cents in rev.items():
        by_nation.setdefault(nk, []).append(cents)
    got = {r.nation: r for r in rows}
    assert set(got) == {nat[nk] for nk in by_nation}
    for nk, revs in by_nation.items():
        r = got[nat[nk]]
        st = sum(revs)
        hhi = sum(c * c for c in revs) / (st * st)
        assert r.n_suppliers == len(revs)
        assert abs(r.hhi - hhi) < 1e-5
        assert abs(r.n_equivalent - 1.0 / hhi) < 1e-2
        # HHI is bounded below by the equal-share floor 1/n
        assert r.hhi >= 1.0 / len(revs) - 1e-9


def test_mutual_info_matches_python(spark, sf_dir):
    row = REGISTRY["q_mutual_info"].builder(spark, sf_dir).collect()[0]
    ev = load(spark, sf_dir, "events").select("event_type", "ts").collect()
    cells = {}
    for r in ev:
        k = (r.event_type, r.ts.hour)
        cells[k] = cells.get(k, 0) + 1
    nn = sum(cells.values())
    mx, my = {}, {}
    for (x, y), n in cells.items():
        mx[x] = mx.get(x, 0) + n
        my[y] = my.get(y, 0) + n
    ref = sum(
        (n / nn) * math.log(n * nn / (mx[x] * my[y]))
        for (x, y), n in cells.items()
    )
    assert row.n_cells == len(cells)
    assert row.n_events == nn
    assert abs(row.mi_nats - ref) < 1e-5
    # MI is non-negative and bounded by min(H(X), H(Y))
    hx = -sum((v / nn) * math.log(v / nn) for v in mx.values())
    hy = -sum((v / nn) * math.log(v / nn) for v in my.values())
    assert -1e-9 <= row.mi_nats <= min(hx, hy) + 1e-9
