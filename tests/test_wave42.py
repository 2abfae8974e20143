"""Semantic checks for the r7 elbow / peak-detection wave, each
against a plain-Python recomputation."""

from __future__ import annotations

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def test_elbow_point_matches_python(spark, sf_dir):
    row = REGISTRY["q_elbow_point"].builder(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    per = {}
    for o in orders:
        per[o.o_custkey] = per.get(o.o_custkey, 0) + round(
            o.o_totalprice * 100
        )
    ranked = sorted(per.items(), key=lambda kv: (-kv[1], kv[0]))
    n = len(ranked)
    total = sum(per.values())
    best = None
    cum = 0
    for i, (_, c) in enumerate(ranked, start=1):
        cum += c
        dev = cum * n - i * total
        if best is None or dev > best[0]:
            best = (dev, i, cum)
    dev, i, cum = best
    assert (r.elbow_rank, r.cum_cents, r.n_customers, r.total_cents,
            r.dev_scaled) == (i, cum, n, total, dev)
    assert abs(r.cum_share - cum / total) < 1e-6
    # the elbow of a concave concentration curve sits in the head:
    # cumulative share strictly above rank share
    assert r.cum_share > r.rank_share


def test_peak_detection_matches_python(spark, sf_dir):
    rows = {(r.event_type, r.day_epoch): r.peak_count for r in
            REGISTRY["q_peak_detection"].builder(spark, sf_dir).collect()}
    import datetime

    epoch = datetime.date(1970, 1, 1)
    ev = load(spark, sf_dir, "events").select("event_type", "ts").collect()
    daily = {}
    for e in ev:
        k = (e.event_type, (e.ts.date() - epoch).days)
        daily[k] = daily.get(k, 0) + 1
    per = {}
    for (t, d), x in daily.items():
        per.setdefault(t, []).append((d, x))
    expect = {}
    for t, seq in per.items():
        seq.sort()
        for j in range(3, len(seq) - 3):
            d, x = seq[j]
            around = [seq[j + k][1] for k in range(-3, 4) if k != 0]
            if all(x > v for v in around):
                expect[(t, d)] = x
    assert rows == expect
    assert expect  # the series genuinely has interior peaks
