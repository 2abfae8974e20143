"""Semantic checks for the r7 IQR / argmax / power-analysis wave,
each against a plain-Python recomputation."""

from __future__ import annotations

import math

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def _cents_by_type(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("event_type", "value").collect()
    per = {}
    for e in ev:
        per.setdefault(e.event_type, []).append(round(e.value * 100))
    return per


def test_iqr_outliers_matches_python(spark, sf_dir):
    rows = {r.event_type: r for r in
            REGISTRY["q_iqr_outliers"].builder(spark, sf_dir).collect()}
    per = _cents_by_type(spark, sf_dir)
    assert set(rows) == set(per)
    for t, vs in per.items():
        n = len(vs)
        svs = sorted(vs)
        # lower-quartile threshold pick: min v with 4*cum >= k*tot
        q1 = svs[math.ceil(n / 4) - 1]
        q3 = svs[math.ceil(3 * n / 4) - 1]
        iqr = q3 - q1
        lo = sum(1 for v in vs if 2 * v < 2 * q1 - 3 * iqr)
        hi = sum(1 for v in vs if 2 * v > 2 * q3 + 3 * iqr)
        r = rows[t]
        assert (r.n, r.q1_cents, r.q3_cents, r.iqr_cents) == (n, q1, q3, iqr)
        assert (r.lo_outliers, r.hi_outliers) == (lo, hi)
        assert abs(r.outlier_rate - (lo + hi) / n) < 1e-6


def test_agg_argmax_matches_python(spark, sf_dir):
    rows = {r.event_type: r for r in
            REGISTRY["q_agg_argmax"].builder(spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    ).collect()
    per = {}
    for e in ev:
        per.setdefault(e.event_type, []).append(
            (round(e.value * 100), e.event_id)
        )
    assert set(rows) == set(per)
    for t, pairs in per.items():
        top = max(pairs)
        bot = min(pairs)
        r = rows[t]
        assert (r.top_cents, r.top_event_id) == top
        assert (r.bottom_cents, r.bottom_event_id) == bot


def test_power_analysis_matches_python(spark, sf_dir):
    row = REGISTRY["q_power_analysis"].builder(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    ev = load(spark, sf_dir, "events").select("event_type").collect()
    n = len(ev)
    pur = sum(1 for e in ev if e.event_type == "purchase")
    assert (r.n_events, r.purchases) == (n, pur)
    p1 = pur / n
    p2 = 1.1 * p1
    req = math.ceil(
        (1.959964 + 0.841621) ** 2
        * (p1 * (1 - p1) + p2 * (1 - p2))
        / (p2 - p1) ** 2
    )
    assert abs(r.baseline_rate - p1) < 1e-6
    assert abs(r.target_rate - p2) < 1e-6
    # ceil on a float within 1 ulp of the engine's double can disagree
    # by one; the engines themselves are pinned to EACH OTHER by the
    # shared expression — this is only a sanity envelope
    assert abs(r.required_n_per_arm - req) <= 1
    # a 10% relative lift on a ~20% baseline needs thousands per arm
    assert r.required_n_per_arm > 100
