"""Semantic checks for the wave-11 keys: sequence mining, cohort LTV,
video shot segmentation, image statistics.
"""

from __future__ import annotations

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def test_seq_mining_brute(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_rc_spark.sources.tables import load

    rows = REGISTRY["q_seq_mining"].builder(spark, sf_dir).collect()
    assert rows
    ev = load(spark, sf_dir, "events")
    firsts = {}
    for r in ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("ft")
    ).collect():
        firsts.setdefault(r.user_id, {})[r.event_type] = r.ft
    for r in rows[:5]:
        brute = sum(
            1
            for ft in firsts.values()
            if r.t1 in ft and r.t2 in ft and r.t3 in ft
            and ft[r.t1] < ft[r.t2] < ft[r.t3]
        )
        assert brute == r.n_users, (r.t1, r.t2, r.t3)
        assert len({r.t1, r.t2, r.t3}) == 3  # strict order => distinct


def test_cohort_ltv_monotone(spark, sf_dir):
    rows = REGISTRY["q_cohort_ltv"].builder(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r.cohort_week].append(r)
        assert r.ltv_micro == r.cum_cents * 10000 // r.n_users
    for ws in by_cohort.values():
        ws.sort(key=lambda r: r.week_offset)
        cums = [r.cum_cents for r in ws]
        assert cums == sorted(cums)  # cumulative revenue never decreases


def test_video_shots_partition_frames(spark, sf_dir):
    from collections import defaultdict

    from flink_rc_spark.llm.video import _N_FRAMES

    rows = REGISTRY["q_video_shots"].builder(spark, sf_dir).collect()
    per_doc = defaultdict(list)
    for r in rows:
        per_doc[r.doc_id].append(r)
    for doc, shots in per_doc.items():
        shots.sort(key=lambda r: r.shot_start)
        assert shots[0].shot_start == 0
        assert sum(s.n_frames for s in shots) == _N_FRAMES
        for a, b in zip(shots, shots[1:]):
            assert b.shot_start == a.shot_start + a.n_frames  # contiguous
    # the threshold must actually split some clips and keep others whole
    n_shots = {doc: len(s) for doc, s in per_doc.items()}
    assert max(n_shots.values()) > 1
    assert min(n_shots.values()) >= 1


def test_image_stats_identities(spark, sf_dir):
    from flink_rc_spark.llm.multimodal import _IMG_N, _IMG_VAR_TH

    rows = REGISTRY["q_image_stats"].builder(spark, sf_dir).collect()
    assert rows
    flags = 0
    for r in rows:
        assert r.var_num == _IMG_N * r.gray_sq_sum - r.gray_sum * r.gray_sum
        assert r.var_num >= 0
        assert 0 <= r.gray_min <= r.gray_max <= 255
        assert (r.low_contrast == 1) == (
            r.var_num < _IMG_VAR_TH * _IMG_N * _IMG_N
        )
        flags += r.low_contrast
    # the threshold splits the population (both classes present)
    assert 0 < flags < len(rows)
