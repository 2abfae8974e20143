"""Semantic checks for the r7 elastic-distance/rolling-regression
wave: DTW against a plain-Python DP over the same integer share
series, and the rolling slope against numpy lstsq per frame."""

from __future__ import annotations

import datetime

import numpy as np
import pytest

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def _daily_cents(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    daily = {}
    for r in ev:
        d = (r.ts.date() - datetime.date(1970, 1, 1)).days
        k = (r.event_type, d)
        daily[k] = daily.get(k, 0) + round(r.value * 100)
    return daily


def _dtw(xs, ys):
    inf = float("inf")
    n, m = len(xs), len(ys)
    dp = [[inf] * (m + 1) for _ in range(n + 1)]
    dp[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i][j] = abs(xs[i - 1] - ys[j - 1]) + min(
                dp[i - 1][j], dp[i - 1][j - 1], dp[i][j - 1]
            )
    return dp[n][m]


def test_ts_dtw_matches_python_dp(spark, sf_dir):
    rows = REGISTRY["q_ts_dtw"].builder(spark, sf_dir).collect()
    daily = _daily_cents(spark, sf_dir)
    days = sorted({d for _, d in daily})
    spine = list(range(days[0], days[-1] + 1))
    types = sorted({t for t, _ in daily})
    series = {}
    for t in types:
        cents = [daily.get((t, d), 0) for d in spine]
        total = sum(cents)
        if total > 0:
            series[t] = [c * 1000000 // total for c in cents]
    got = {(r.type_a, r.type_b): r for r in rows}
    expect_pairs = {
        (a, b) for a in series for b in series if a < b
    }
    assert set(got) == expect_pairs
    for (a, b), r in got.items():
        assert r.n_days == len(spine)
        assert r.dtw_micro == _dtw(series[a], series[b]), (a, b)
    # identity sanity: DTW of a series with itself is 0
    t0 = types[0]
    assert _dtw(series[t0], series[t0]) == 0


def test_win_regr_slope_matches_numpy(spark, sf_dir):
    rows = REGISTRY["q_win_regr_slope"].builder(spark, sf_dir).collect()
    daily = _daily_cents(spark, sf_dir)
    per_type = {}
    for (t, d), c in sorted(daily.items()):
        per_type.setdefault(t, []).append((d, c))
    got = {(r.event_type, r.d): r for r in rows}
    assert len(rows) == sum(len(v) for v in per_type.values())
    for t, seq in per_type.items():
        for i, (d, c) in enumerate(seq):
            frame = seq[max(0, i - 6) : i + 1]
            r = got[(t, d)]
            assert r.cents == c and r.n_days == len(frame)
            xs = np.array([x for x, _ in frame], dtype=np.float64)
            ys = np.array([y for _, y in frame], dtype=np.float64)
            if len(frame) >= 2 and xs.std() > 0:
                slope = np.polyfit(xs, ys, 1)[0]
                assert abs(r.slope_7d - slope) < max(1e-4, 1e-9 * abs(slope))
            else:
                assert r.slope_7d is None
