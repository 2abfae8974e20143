"""Semantic checks for the r7 time-series wave: Holt smoothing vs a
pure-Python recursion, lagged cross-correlation vs numpy, and the
max-dense_rank windowed distinct count vs a direct recomputation."""

from __future__ import annotations

import datetime

import numpy as np
import pytest

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def _daily(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    ).collect()
    out = {}
    for r in ev:
        d = (r.ts.date() - datetime.date(1970, 1, 1)).days
        key = (r.event_type, d)
        out[key] = out.get(key, 0) + round(r.value * 100)
    return out


def test_ts_holt_matches_python_recursion(spark, sf_dir):
    rows = REGISTRY["q_ts_holt"].builder(spark, sf_dir).collect()
    daily = _daily(spark, sf_dir)
    types = sorted({k[0] for k in daily})
    got = {r.event_type: r for r in rows}
    for t in types:
        xs = [
            float(daily[(t, d)])
            for d in sorted(d for tt, d in daily if tt == t)
        ]
        if len(xs) < 2:
            assert t not in got
            continue
        l, b = xs[0], xs[1] - xs[0]
        for x in xs[1:]:
            l_new = 0.5 * ((x + l) + b)
            b = 0.5 * (l_new - l) + 0.5 * b
            l = l_new
        r = got[t]
        assert r.n_days == len(xs)
        assert abs(r.level_c - l) < 1e-4 + 1e-9 * abs(l)
        assert abs(r.trend_c - b) < 1e-4 + 1e-9 * abs(b)
        assert abs(r.fcst7_c - (l + 7 * b)) < 1e-3


def test_ts_cross_corr_matches_numpy(spark, sf_dir):
    rows = REGISTRY["q_ts_cross_corr"].builder(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events").select("event_type", "ts").collect()
    days = {}
    for r in ev:
        d = (r.ts.date() - datetime.date(1970, 1, 1)).days
        x, y = days.get(d, (0, 0))
        days[d] = (
            x + (r.event_type == "click"),
            y + (r.event_type == "purchase"),
        )
    ds = sorted(days)
    x = np.array([days[d][0] for d in ds], dtype=np.float64)
    y = np.array([days[d][1] for d in ds], dtype=np.float64)
    got = {r.lg: r for r in rows}
    for lag in range(8):
        a, b = x[: len(x) - lag], y[lag:]
        assert got[lag].n == len(a)
        if len(a) > 1 and a.std() > 0 and b.std() > 0:
            r_ref = np.corrcoef(a, b)[0, 1]
            assert abs(got[lag].r_xy - r_ref) < 1e-5, (lag, got[lag].r_xy, r_ref)


def test_win_count_distinct_matches_groupby(spark, sf_dir):
    rows = REGISTRY["q_win_count_distinct"].builder(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    ).collect()
    per_user = {}
    for r in ev:
        per_user.setdefault(r.user_id, set()).add(r.event_type)
    probes = sorted(r.event_id for r in ev if r.event_id % 97 == 0)
    assert [r.event_id for r in rows] == probes
    for r in rows:
        assert r.n_types_user == len(per_user[r.user_id])
