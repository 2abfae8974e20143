"""Semantic checks for the r7 fairness / experiment-trust wave, each
against a plain-Python recomputation."""

from __future__ import annotations

import hashlib

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def _scored(spark, sf_dir):
    seg = {r.c_custkey: r.c_mktsegment for r in
           load(spark, sf_dir, "customer")
           .select("c_custkey", "c_mktsegment").collect()}
    out = []
    for o in load(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderpriority"
    ).collect():
        out.append(
            (
                seg[o.o_custkey],
                1 if round(o.o_totalprice * 100) > 15000000 else 0,
                1 if o.o_orderpriority == "1-URGENT" else 0,
            )
        )
    return out


def test_disparate_impact_matches_python(spark, sf_dir):
    rows = {r.grp: r for r in
            REGISTRY["q_disparate_impact"].builder(spark, sf_dir).collect()}
    per = {}
    for grp, sel, _ in _scored(spark, sf_dir):
        n, s = per.get(grp, (0, 0))
        per[grp] = (n + 1, s + sel)
    assert set(rows) == set(per)
    ref_grp = min(per, key=lambda g: (-per[g][1] / per[g][0], g))
    rn, rs = per[ref_grp]
    for grp, (n, s) in per.items():
        r = rows[grp]
        assert (r.n, r.selected) == (n, s)
        assert abs(r.sel_rate - s / n) < 1e-6
        assert abs(r.impact_ratio - (s / n) / (rs / rn)) < 1e-6
        assert r.fails_80pct_rule == (s * rn * 5 < rs * n * 4)
    assert rows[ref_grp].impact_ratio == 1.0
    assert not rows[ref_grp].fails_80pct_rule


def test_fairness_gaps_matches_python(spark, sf_dir):
    rows = {r.grp: r for r in
            REGISTRY["q_fairness_gaps"].builder(spark, sf_dir).collect()}
    per = {}
    for grp, pred, label in _scored(spark, sf_dir):
        tp, fn, fp, tn = per.get(grp, (0, 0, 0, 0))
        per[grp] = (
            tp + (label and pred),
            fn + (label and not pred),
            fp + (pred and not label),
            tn + (not pred and not label),
        )
    assert set(rows) == set(per)
    for grp, (tp, fn, fp, tn) in per.items():
        r = rows[grp]
        assert (r.tp, r.fn, r.fp, r.tn) == (tp, fn, fp, tn)
        assert abs(r.tpr - tp / (tp + fn)) < 1e-6
        assert abs(r.fpr - fp / (fp + tn)) < 1e-6


def test_ab_srm_matches_python(spark, sf_dir):
    row = REGISTRY["q_ab_srm"].builder(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    users = {e.user_id for e in
             load(spark, sf_dir, "events").select("user_id").collect()}
    n_a = sum(
        1 for u in users
        if int(hashlib.md5(f"u{u}".encode()).hexdigest()[0], 16) % 2 == 0
    )
    n_b = len(users) - n_a
    assert (r.n_a, r.n_b) == (n_a, n_b)
    chi2 = (n_a - n_b) ** 2 / (n_a + n_b)
    assert abs(r.srm_chi2 - chi2) < 1e-6
    assert r.srm_detected == (
        (n_a - n_b) ** 2 * 1000000 > 3841459 * (n_a + n_b)
    )
    # a healthy md5 assignment must NOT trip SRM on this data
    assert not r.srm_detected
