"""Semantic checks for the wave-15 keys: Kaplan-Meier survival and
k-core decomposition.
"""

from __future__ import annotations

import math

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def test_km_matches_textbook(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_rc_spark.sources.tables import load

    rows = sorted(
        REGISTRY["q_survival_km"].builder(spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert rows
    # rebuild subject durations and run the textbook estimator
    ev = load(spark, sf_dir, "events")
    subj = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p"),
        F.min("ts").alias("f"),
        F.max("ts").alias("l"),
    ).collect()
    durs = []
    for s in subj:
        if s.p is not None:
            durs.append(((s.p.date() - s.f.date()).days, 1))
        else:
            durs.append(((s.l.date() - s.f.date()).days, 0))
    n = len(durs)
    s_hat = 1.0
    by_t = {}
    for t, e in durs:
        by_t.setdefault(t, [0, 0])
        by_t[t][0] += 1
        by_t[t][1] += e
    prev_s = 1.0
    for r in rows:
        cnt, d = by_t[r.day]
        n_risk = sum(c for t, (c, _) in by_t.items() if t >= r.day)
        assert r.n_risk == n_risk and r.n_events == d
        assert r.censored == cnt - d
    # survival curve is non-increasing in [0, 1]
    ss = [r.s_hat for r in rows]
    assert all(0.0 <= s <= 1.0 for s in ss)
    assert all(a >= b - 1e-9 for a, b in zip(ss, ss[1:]))
    # quantized product matches the float product to ~1e-4
    s_float = 1.0
    for r in rows:
        s_float *= 1 - r.n_events / r.n_risk
        assert math.isclose(r.s_hat, s_float, abs_tol=2e-4), r.day


def test_kcore_is_fixed_point(spark, sf_dir):
    from flink_rc_spark.operators.graph import _KCORE_K

    rows = REGISTRY["q_graph_kcore"].builder(spark, sf_dir).collect()
    assert rows
    # converged: every survivor's degree within the core is >= k
    for r in rows:
        assert r.core_deg >= _KCORE_K
    # and survivors' degrees only count edges among survivors, so the
    # total degree is even (each surviving edge counted twice)
    assert sum(r.core_deg for r in rows) % 2 == 0
