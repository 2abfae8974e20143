"""Semantic checks for the r7 latency-percentile / modularity wave,
each against a plain-Python recomputation."""

from __future__ import annotations

import math

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def _pct_pick(sorted_vals, num, den):
    """min v with den*cum >= num*tot over a sorted multiset."""
    tot = len(sorted_vals)
    cum = 0
    for v in sorted_vals:
        cum += 1
        if den * cum >= num * tot:
            return v
    return None


def test_time_to_convert_matches_python(spark, sf_dir):
    row = REGISTRY["q_time_to_convert"].builder(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    views, purchases = {}, {}
    for e in ev:
        if e.event_type == "view":
            views[e.user_id] = min(views.get(e.user_id, e.ts), e.ts)
        elif e.event_type == "purchase":
            purchases.setdefault(e.user_id, []).append(e.ts)
    gaps = []
    for u, tv in views.items():
        after = [t for t in purchases.get(u, []) if t > tv]
        if after:
            gaps.append(
                round((min(after) - tv).total_seconds() * 1_000_000)
            )
    gaps.sort()
    assert r.n_converted == len(gaps) > 0
    assert r.p50_us == _pct_pick(gaps, 1, 2)
    assert r.p90_us == _pct_pick(gaps, 9, 10)
    assert r.mean_us_floor == sum(gaps) // len(gaps)
    assert r.p50_us <= r.p90_us


def test_event_interarrival_matches_python(spark, sf_dir):
    rows = {r.event_type: r for r in
            REGISTRY["q_event_interarrival"].builder(spark, sf_dir)
            .collect()}
    ev = load(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id"
    ).collect()
    per = {}
    for e in ev:
        per.setdefault(e.event_type, []).append((e.ts, e.event_id))
    assert set(rows) == set(per)
    for t, seq in per.items():
        seq.sort()
        gaps = sorted(
            round((b[0] - a[0]).total_seconds() * 1_000_000)
            for a, b in zip(seq, seq[1:])
        )
        r = rows[t]
        assert r.n_gaps == len(gaps)
        assert r.p50_us == _pct_pick(gaps, 1, 2)
        assert r.p90_us == _pct_pick(gaps, 9, 10)
        assert r.p99_us == _pct_pick(gaps, 99, 100)
        assert r.p50_us <= r.p90_us <= r.p99_us


def test_graph_modularity_matches_components(spark, sf_dir):
    """Recompute Q in python from the SAME pair list and the declared
    component assignment — and check the healthy-graph invariant."""
    row = REGISTRY["q_graph_modularity"].builder(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    comp = {c.doc_id: c.component for c in
            REGISTRY["q_dedup_components"].builder(spark, sf_dir).collect()}
    from flink_rc_spark.llm.dedup import minhash_candidate_pairs

    docs = load(spark, sf_dir, "documents")
    pairs = [(p.doc_a, p.doc_b) for p in
             minhash_candidate_pairs(docs).collect()]
    m = len(pairs)
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    dc = {}
    for v, c in comp.items():
        dc[c] = dc.get(c, 0) + deg.get(v, 0)
    sum_dcsq = sum(d * d for d in dc.values())
    assert r.n_vertices == len(comp)
    assert r.n_components == len(dc)
    assert r.n_edges == m
    assert r.sum_dcsq == sum_dcsq
    q = (4 * m * m - sum_dcsq) / (4 * m * m)
    assert abs(r.modularity - q) < 1e-6
    # every edge is intra-component, so Q = 1 - sum d_c^2/(4 m^2) is in
    # (0, 1) unless the graph collapsed into one hairball component
    assert 0.0 < r.modularity < 1.0
