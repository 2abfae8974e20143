"""Semantic checks for the r7 streaming first-touch wave."""

from __future__ import annotations

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries
from flink_rc_spark.sources.tables import load


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def test_stream_first_touch_matches_python_and_slicing(spark, sf_dir):
    rows = [(r.user_id, r.event_id, r.ts, r.event_type) for r in
            REGISTRY["q_stream_first_touch"].builder(spark, sf_dir)
            .collect()]
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    ).collect()
    first = {}
    for e in ev:
        k = (e.ts, e.event_id)
        if e.user_id not in first or k < (first[e.user_id].ts,
                                          first[e.user_id].event_id):
            first[e.user_id] = e
    expect = [
        (e.user_id, e.event_id, e.ts, e.event_type)
        for e in sorted(first.values(), key=lambda e: e.user_id)
    ]
    assert rows == expect
    # exactly one first touch per user
    assert len({u for u, _, _, _ in rows}) == len(rows)

    from flink_rc_spark.streaming.replay import events_stream, run_to_memory
    from flink_rc_spark.streaming.stateful import stream_first_touch
    from flink_rc_spark.util import ensure_package_shipped

    ensure_package_shipped(spark)
    stats: dict = {}
    s = events_stream(spark, sf_dir, n_splits=4)
    out = run_to_memory(stream_first_touch(s), output_mode="append",
                        stats=stats)
    assert stats["num_batches"] >= 3, f"replay was not incremental: {stats}"
    sliced = sorted(
        (r.user_id, r.event_id, r.ts, r.event_type) for r in out.collect()
    )
    assert sliced == sorted(expect)
