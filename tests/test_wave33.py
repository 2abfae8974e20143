"""Semantic checks for the r7 streaming-anomaly / coverage / R-S wave,
each against a plain-Python recomputation."""

from __future__ import annotations

import math

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def _user_series(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    ).collect()
    per = {}
    for e in ev:
        per.setdefault(e.user_id, []).append(
            (e.ts, e.event_id, round(e.value * 100))
        )
    for u in per:
        per[u].sort()
    return per


def test_stream_anomaly_matches_python(spark, sf_dir):
    rows = REGISTRY["q_stream_anomaly"].builder(spark, sf_dir).collect()
    per = _user_series(spark, sf_dir)
    expect = []
    for u, seq in sorted(per.items()):
        n = s = q = 0
        for _, eid, c in seq:
            if n >= 5:
                den = n * q - s * s
                num = c * n - s
                if den > 0 and num * num > 9 * den:
                    expect.append((u, eid, c, n, num / math.sqrt(den)))
            n, s, q = n + 1, s + c, q + c * c
    assert len(rows) == len(expect) > 0
    for r, (u, eid, c, np_, z) in zip(rows, expect):
        assert (r.user_id, r.event_id, r.cents, r.n_prior) == (u, eid, c, np_)
        assert abs(r.z - z) < 1e-9
        assert abs(r.z) > 3.0


def test_stream_anomaly_slicing_invariant(spark, sf_dir):
    """The state fold is an ordered prefix fold of exact integers, so
    a 4-batch replay must emit the identical alert set."""
    from flink_rc_spark.streaming.replay import events_stream, run_to_memory
    from flink_rc_spark.streaming.stateful import stream_anomaly
    from flink_rc_spark.util import ensure_package_shipped

    ensure_package_shipped(spark)
    one = {
        (r.user_id, r.event_id, r.cents, r.n_prior, r.z)
        for r in REGISTRY["q_stream_anomaly"].builder(spark, sf_dir).collect()
    }
    stats: dict = {}
    s = events_stream(spark, sf_dir, n_splits=4)
    out = run_to_memory(stream_anomaly(s), output_mode="append", stats=stats)
    assert stats["num_batches"] >= 3, f"replay was not incremental: {stats}"
    sliced = {
        (r.user_id, r.event_id, r.cents, r.n_prior, r.z)
        for r in out.collect()
    }
    assert sliced == one


def test_ngram_coverage_matches_python(spark, sf_dir):
    import hashlib

    rows = {r.lang: r for r in
            REGISTRY["q_ngram_coverage"].builder(spark, sf_dir).collect()}
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    train_g = set()
    heldout = {}
    for d in docs:
        v = int(hashlib.md5(str(d.doc_id).encode()).hexdigest()[:2], 16)
        toks = d.text.split(" ")
        grams = [
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ]
        if v < 205:
            train_g.update(grams)
        else:
            heldout.setdefault(d.lang, []).extend(grams)
    assert set(rows) == set(heldout)
    for lang, grams in heldout.items():
        covered = sum(1 for g in grams if g in train_g)
        r = rows[lang]
        assert r.heldout_grams == len(grams)
        assert r.covered_grams == covered
        assert abs(r.coverage - covered / len(grams)) < 1e-6


def test_rescaled_range_matches_python(spark, sf_dir):
    rows = {r.user_id: r for r in
            REGISTRY["q_rescaled_range"].builder(spark, sf_dir).collect()}
    per = _user_series(spark, sf_dir)
    checked = 0
    for u, seq in per.items():
        xs = [c for _, _, c in seq]
        n = len(xs)
        s = sum(xs)
        q = sum(c * c for c in xs)
        if n < 16 or n * q - s * s <= 0:
            assert u not in rows
            continue
        p = 0
        zs = []
        for t, c in enumerate(xs, start=1):
            p += c
            zs.append(n * p - t * s)
        r = rows[u]
        assert r.n == n
        assert r.range_scaled == max(zs) - min(zs)
        assert r.var_scaled == n * q - s * s
        rs = (max(zs) - min(zs)) / (n * math.sqrt(n * q - s * s))
        assert abs(r.rs_stat - rs) < 1e-6
        # a series with any variation has strictly positive range
        assert r.range_scaled > 0
        checked += 1
    assert checked == len(rows) > 0
