"""Semantic checks for the r7 weighted-percentile / ordinal-effect /
profiling wave, each against a plain-Python recomputation."""

from __future__ import annotations

import math

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def test_weighted_median_matches_python(spark, sf_dir):
    rows = REGISTRY["q_weighted_median"].builder(spark, sf_dir).collect()
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect()
    per = {}
    for r in li:
        per.setdefault(r.l_returnflag, []).append(
            (round(r.l_extendedprice * 100), int(r.l_quantity))
        )
    got = {r.flag: r for r in rows}
    assert set(got) == set(per)
    for flag, vw in per.items():
        vw.sort()
        tot = sum(w for _, w in vw)
        r = got[flag]
        assert r.n_rows == len(vw) and r.total_weight == tot

        def wq(num, den):
            cum = 0
            for v, w in vw:
                cum += w
                if den * cum >= num * tot:
                    return v
            raise AssertionError

        assert r.wp25_cents == wq(1, 4)
        assert r.wmedian_cents == wq(1, 2)
        assert r.wp75_cents == wq(3, 4)
        assert r.wp25_cents <= r.wmedian_cents <= r.wp75_cents


def test_cliffs_delta_matches_python(spark, sf_dir):
    row = REGISTRY["q_cliffs_delta"].builder(spark, sf_dir).collect()[0]
    ev = load(spark, sf_dir, "events").select("event_type", "value").collect()
    xs = [round(r.value * 100) for r in ev if r.event_type == "purchase"]
    ys = [round(r.value * 100) for r in ev if r.event_type == "click"]
    # O(n log n) dominance via sorted ys and bisect
    import bisect

    ys_sorted = sorted(ys)
    gt = sum(bisect.bisect_left(ys_sorted, x) for x in xs)
    ge = sum(bisect.bisect_right(ys_sorted, x) for x in xs)
    eq = ge - gt
    lt = len(xs) * len(ys) - ge
    assert (row.n1, row.n2) == (len(xs), len(ys))
    assert (row.n_gt, row.n_lt, row.n_eq) == (gt, lt, eq)
    ref = (gt - lt) / (len(xs) * len(ys))
    assert abs(row.delta - ref) < 1e-5
    assert -1.0 <= row.delta <= 1.0


def test_profile_entropy_matches_python(spark, sf_dir):
    rows = REGISTRY["q_profile_entropy"].builder(spark, sf_dir).collect()
    specs = {
        "events.event_type": ("events", "event_type"),
        "documents.lang": ("documents", "lang"),
        "documents.source": ("documents", "source"),
        "orders.o_orderpriority": ("orders", "o_orderpriority"),
        "lineitem.l_returnflag": ("lineitem", "l_returnflag"),
    }
    got = {r.col_name: r for r in rows}
    assert set(got) == set(specs)
    for label, (table, col) in specs.items():
        vals = [
            str(getattr(r, col))
            for r in load(spark, sf_dir, table).select(col).collect()
        ]
        counts = {}
        for v in vals:
            counts[v] = counts.get(v, 0) + 1
        n = len(vals)
        r = got[label]
        assert r.n_rows == n and r.n_distinct == len(counts)
        assert abs(r.top_share - max(counts.values()) / n) < 1e-6
        ent = -sum((c / n) * math.log(c / n) for c in counts.values())
        assert abs(r.entropy_nats - ent) < 1e-5
        # entropy bounded by ln(k)
        assert -1e-9 <= r.entropy_nats <= math.log(len(counts)) + 1e-9


def test_hll_merge_equals_direct_and_per_source(spark, sf_dir):
    """Mergeability: the register-max merged row must equal the direct
    global build EXACTLY (lossless HLL union), and each per-source
    estimate must track its true per-source distinct count within the
    p=8 error envelope."""
    rows = REGISTRY["q_sketch_hll_merge"].builder(spark, sf_dir).collect()
    direct = REGISTRY["q_sketch_hll"].builder(spark, sf_dir).collect()[0]
    merged = [r for r in rows if r.scope == "zz_merged"]
    assert len(merged) == 1
    m = merged[0]
    assert (m.empty_buckets, m.register_sum, m.scaled_power_sum) == (
        direct.empty_buckets,
        direct.register_sum,
        direct.scaled_power_sum,
    )
    assert m.hll_estimate == direct.hll_estimate
    docs = load(spark, sf_dir, "documents").select("source", "text").collect()
    per_src = {}
    for r in docs:
        per_src.setdefault(r.source, set()).update(r.text.split(" "))
    got = {r.scope: r for r in rows if r.scope != "zz_merged"}
    assert set(got) == {f"source:{s}" for s in per_src}
    m_buckets = 256
    for s, toks in per_src.items():
        r = got[f"source:{s}"]
        est = r.hll_estimate
        # the standard small-range (linear counting) correction the
        # consumer applies from the emitted empty_buckets column —
        # raw HLL overestimates when most registers are empty
        if est <= 2.5 * m_buckets and r.empty_buckets > 0:
            est = m_buckets * math.log(m_buckets / r.empty_buckets)
        true = len(toks)
        # ~6.5% rsd at p=8; allow 4 sigma + small-count slack
        assert abs(est - true) <= max(0.3 * true, 25), (s, est, true)
