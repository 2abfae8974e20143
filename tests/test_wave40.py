"""Semantic checks for the r7 Wilcoxon / audience-overlap wave, each
against a plain-Python recomputation."""

from __future__ import annotations

import math

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def test_wilcoxon_signed_matches_python(spark, sf_dir):
    row = REGISTRY["q_wilcoxon_signed"].builder(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    ).collect()
    per = {}
    for e in ev:
        if e.event_type in ("click", "view"):
            x, y, nc, nv = per.get(e.user_id, (0, 0, 0, 0))
            c = round(e.value * 100)
            if e.event_type == "click":
                per[e.user_id] = (x + c, y, nc + 1, nv)
            else:
                per[e.user_id] = (x, y + c, nc, nv + 1)
    diffs = [
        x - y for x, y, nc, nv in per.values()
        if nc > 0 and nv > 0 and x != y
    ]
    n = len(diffs)
    # doubled midranks over |d| groups
    groups = {}
    for d in diffs:
        t, pos = groups.get(abs(d), (0, 0))
        groups[abs(d)] = (t + 1, pos + (1 if d > 0 else 0))
    before = 0
    wplus_x2 = 0
    tie3 = 0
    for ad in sorted(groups):
        t, pos = groups[ad]
        wplus_x2 += pos * (2 * before + t + 1)
        tie3 += t * t * t - t
        before += t
    num = wplus_x2 - n * (n + 1) // 2
    var2 = n * (n + 1) * (2 * n + 1) // 6 - tie3 // 12
    z = num / math.sqrt(var2)
    assert (r.n, r.wplus_x2, r.num, r.var2) == (n, wplus_x2, num, var2)
    assert abs(r.z - z) < 1e-6
    assert r.reject_symmetry == (z * z > 3.841459)


def test_audience_overlap_matches_python(spark, sf_dir):
    rows = {(r.type_a, r.type_b): r for r in
            REGISTRY["q_audience_overlap"].builder(spark, sf_dir)
            .collect()}
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type"
    ).collect()
    members = {}
    for e in ev:
        members.setdefault(e.event_type, set()).add(e.user_id)
    types = sorted(members)
    expect = {}
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            inter = len(members[a] & members[b])
            if inter:
                expect[(a, b)] = inter
    assert set(rows) == set(expect)
    for (a, b), inter in expect.items():
        r = rows[(a, b)]
        assert (r.n_a, r.n_b, r.n_inter) == (
            len(members[a]), len(members[b]), inter
        )
        jac = inter / (len(members[a]) + len(members[b]) - inter)
        assert abs(r.jaccard - jac) < 1e-6
        assert 0 < r.jaccard <= 1
