"""Semantic checks for the r7 growth-analytics wave (decay score,
new-vs-returning, stickiness), each against a plain-Python
recomputation."""

from __future__ import annotations

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def test_decay_score_matches_python(spark, sf_dir):
    rows = {r.user_id: r for r in
            REGISTRY["q_decay_score"].builder(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "value"
    ).collect()
    t_ref = max(e.ts for e in ev).date()
    per = {}
    for e in ev:
        weeks = (t_ref - e.ts.date()).days // 7
        c = round(e.value * 100)
        term = c * (1 << (30 - weeks)) if weeks <= 30 else 0
        n, s = per.get(e.user_id, (0, 0))
        per[e.user_id] = (n + 1, s + term)
    assert set(rows) == set(per)
    for u, (n, s) in per.items():
        r = rows[u]
        assert (r.n_events, r.score_scaled) == (n, s)
        assert abs(r.decay_score - s / (1 << 30)) < 1e-6
    # a user's most recent event alone guarantees a positive score
    assert all(r.score_scaled > 0 for r in rows.values())


def test_new_vs_returning_matches_python(spark, sf_dir):
    import datetime

    epoch = datetime.date(1970, 1, 1)
    rows = {r.day_epoch: r for r in
            REGISTRY["q_new_vs_returning"].builder(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events").select("user_id", "ts").collect()
    pairs = {(e.user_id, e.ts.date()) for e in ev}
    first = {}
    for u, d in pairs:
        first[u] = min(first.get(u, d), d)
    daily = {}
    for u, d in pairs:
        dau, new, ret = daily.get(d, (0, 0, 0))
        daily[d] = (
            dau + 1,
            new + (1 if d == first[u] else 0),
            ret + (1 if d > first[u] else 0),
        )
    expect = {(d - epoch).days: v for d, v in daily.items() if v[0] >= 5}
    assert set(rows) == set(expect)
    for d, (dau, new, ret) in expect.items():
        r = rows[d]
        assert (r.dau, r.new_users, r.returning_users) == (dau, new, ret)
        assert r.new_users + r.returning_users == r.dau


def test_stickiness_matches_python(spark, sf_dir):
    import datetime

    epoch = datetime.date(1970, 1, 1)
    rows = {r.month_epoch: r for r in
            REGISTRY["q_stickiness"].builder(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events").select("user_id", "ts").collect()
    triples = {
        (e.user_id, e.ts.date(), e.ts.date().replace(day=1)) for e in ev
    }
    months = {}
    for u, d, m in triples:
        days, users = months.setdefault(m, (dict(), set()))
        days[d] = days.get(d, 0) + 1
        users.add(u)
    months = {(m - epoch).days: v for m, v in months.items()}
    assert set(rows) == set(months)
    for m, (days, users) in months.items():
        r = rows[m]
        dau_sum = sum(days.values())
        assert (r.active_days, r.dau_sum, r.mau) == (
            len(days), dau_sum, len(users)
        )
        assert r.stickiness_micro == (dau_sum * 1000000) // (
            len(days) * len(users)
        )
        # DAU/MAU is a ratio in (0, 1]
        assert 0 < r.stickiness_micro <= 1000000
