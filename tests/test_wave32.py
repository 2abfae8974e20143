"""Semantic checks for the r7 data-quality / bitmap / seasonality wave,
each against a plain-Python recomputation."""

from __future__ import annotations

import datetime

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def test_fd_discovery_matches_python(spark, sf_dir):
    rows = {r.fd: r for r in
            REGISTRY["q_fd_discovery"].builder(spark, sf_dir).collect()}
    from flink_rc_spark.operators.dataquality import _FD_CANDIDATES

    assert len(rows) == len(_FD_CANDIDATES)
    for table, lhs, rhs in _FD_CANDIDATES:
        data = load(spark, sf_dir, table).select(lhs, rhs).collect()
        per = {}
        for d in data:
            per.setdefault(d[0], set()).add(d[1])
        r = rows[f"{table}.{lhs}->{rhs}"]
        viol = sum(1 for v in per.values() if len(v) > 1)
        assert r.n_groups == len(per)
        assert r.violating_groups == viol
        assert r.max_rhs_per_lhs == max(len(v) for v in per.values())
        assert r.holds == (viol == 0)
    # the declared true keys / hierarchy edges must hold; the
    # plausible-but-false candidates must be refuted on this data
    assert rows["orders.o_orderkey->o_custkey"].holds
    assert rows["nation.n_nationkey->n_regionkey"].holds
    assert not rows["documents.source->lang"].holds


def test_fk_integrity_matches_python(spark, sf_dir):
    rows = {r.edge: r for r in
            REGISTRY["q_fk_integrity"].builder(spark, sf_dir).collect()}
    from flink_rc_spark.operators.dataquality import _FK_EDGES

    assert len(rows) == len(_FK_EDGES)
    for label, child, ckey, parent, pkey in _FK_EDGES:
        ck = [r[0] for r in
              load(spark, sf_dir, child).select(ckey).collect()]
        pk = {r[0] for r in
              load(spark, sf_dir, parent).select(pkey).collect()}
        per = {}
        for k in ck:
            per[k] = per.get(k, 0) + 1
        orphans = {k: n for k, n in per.items() if k not in pk}
        r = rows[label]
        assert r.child_rows == len(ck)
        assert r.distinct_keys == len(per)
        assert r.orphan_keys == len(orphans)
        assert r.orphan_rows == sum(orphans.values())
        # the generated schema is referentially consistent
        assert r.orphan_keys == 0


def test_bitmap_distinct_matches_python(spark, sf_dir):
    rows = {r.event_type: r for r in
            REGISTRY["q_bitmap_distinct"].builder(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events").select(
        "event_type", "user_id"
    ).collect()
    per = {}
    for e in ev:
        if e.user_id >= 1:
            per.setdefault(e.event_type, set()).add(e.user_id)
    assert set(rows) == set(per)
    for t, users in per.items():
        r = rows[t]
        assert r.distinct_users == len(users)
        assert r.n_buckets == len({(u - 1) // 32768 for u in users})


def test_seasonality_strength_matches_python(spark, sf_dir):
    rows = {r.event_type: r for r in
            REGISTRY["q_seasonality_strength"].builder(spark, sf_dir)
            .collect()}
    ev = load(spark, sf_dir, "events").select("event_type", "ts").collect()
    daily = {}
    for e in ev:
        daily[(e.event_type, e.ts.date())] = daily.get(
            (e.event_type, e.ts.date()), 0
        ) + 1
    monday = datetime.date(1970, 1, 5)
    per = {}
    for (t, d), x in daily.items():
        per.setdefault(t, []).append(((d - monday).days % 7, x))
    assert set(rows) == set(per)
    for t, wx in per.items():
        n = len(wx)
        s = sum(x for _, x in wx)
        q = sum(x * x for _, x in wx)
        g = {}
        for wd, x in wx:
            cnt, tot = g.get(wd, (0, 0))
            g[wd] = (cnt + 1, tot + x)
        term = sum((sg * sg) // ng for ng, sg in g.values())
        r = rows[t]
        assert r.n_days == n
        assert r.ssb_scaled == n * term - s * s
        assert r.sst_scaled == n * q - s * s
        if r.sst_scaled > 0:
            eta = (n * term - s * s) / (n * q - s * s)
            assert abs(r.strength - eta) < 1e-6
            # eta^2 within [~0, 1] (floor quantization can nudge the
            # numerator a hair below 0 on a flat series)
            assert -1e-3 <= r.strength <= 1.0 + 1e-9
