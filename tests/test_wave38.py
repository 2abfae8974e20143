"""Semantic checks for the r7 Zipf-fit / interval-sweep wave, each
against a plain-Python recomputation."""

from __future__ import annotations

import datetime
import math

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def test_zipf_fit_matches_python(spark, sf_dir):
    row = REGISTRY["q_zipf_fit"].builder(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    docs = load(spark, sf_dir, "documents").select("text").collect()
    freq = {}
    for d in docs:
        for t in d.text.split(" "):
            freq[t] = freq.get(t, 0) + 1
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    xs = [math.log(i) for i in range(1, len(top) + 1)]
    ys = [math.log(n) for _, n in top]
    k = len(top)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    intercept = (sy - slope * sx) / k
    r2 = (k * sxy - sx * sy) ** 2 / ((k * sxx - sx * sx) * (k * syy - sy * sy))
    assert r.k == k
    assert abs(r.zipf_slope - slope) < 1e-4
    assert abs(r.log_c - intercept) < 1e-4
    assert abs(r.r2 - r2) < 1e-4
    # a frequency-ranked vocabulary always slopes downward
    assert r.zipf_slope < 0
    assert 0.0 <= r.r2 <= 1.0


def test_interval_sweep_matches_python(spark, sf_dir):
    rows = REGISTRY["q_interval_sweep"].builder(spark, sf_dir).collect()
    orders = {o.o_orderkey: o.o_orderdate for o in
              load(spark, sf_dir, "orders")
              .select("o_orderkey", "o_orderdate").collect()}
    close = {}
    for li in load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).collect():
        c = close.get(li.l_orderkey)
        close[li.l_orderkey] = li.l_shipdate if c is None else max(
            c, li.l_shipdate
        )
    deltas = {}
    for k, od in orders.items():
        if k not in close:
            continue
        deltas[od] = deltas.get(od, 0) + 1
        nxt = close[k] + datetime.timedelta(days=1)
        deltas[nxt] = deltas.get(nxt, 0) - 1
    cum = 0
    swept = []
    for d in sorted(deltas):
        cum += deltas[d]
        swept.append((d, cum))
    top5 = sorted(swept, key=lambda dv: (-dv[1], dv[0]))[:5]
    assert len(rows) == 5
    for r, (d, v) in zip(rows, top5):
        assert (r.peak_day, r.open_orders) == (d, v)
    assert rows[0].open_orders >= rows[-1].open_orders > 0
