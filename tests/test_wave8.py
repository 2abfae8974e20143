"""Semantic checks for the wave-8 keys: exact 2-pass quantiles,
calibration bins, zone-map pruning, audio fingerprint matching, and
the LSH recall/precision audit. Engine parity is covered by
tests/test_correctness.py; these pin the algorithms themselves.
"""

from __future__ import annotations

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def test_quantile_2pass_equals_brute(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_rc_spark.sources.tables import load

    out = {
        r.p: (r.rnk, r.q_value_c)
        for r in REGISTRY["q_quantile_2pass"].builder(spark, sf_dir).collect()
    }
    vals = sorted(
        r.c
        for r in load(spark, sf_dir, "lineitem")
        .select(
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("c")
        )
        .collect()
    )
    n = len(vals)
    for p in (25, 50, 75, 99):
        rnk = (p * n + 99) // 100
        assert out[p] == (rnk, vals[rnk - 1]), p


def test_calibration_bins_equal_depth_and_monotone_scores(spark, sf_dir):
    rows = sorted(
        REGISTRY["q_calibration_bins"].builder(spark, sf_dir).collect(),
        key=lambda r: r.bin,
    )
    assert [r.bin for r in rows] == list(range(1, 11))
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1  # NTILE equal-depth
    means = [r.mean_score_micro for r in rows]
    assert means == sorted(means)  # bins ordered by score by construction
    for r in rows:
        assert 0 <= r.pos_rate_micro <= 1_000_000


def test_zonemap_date_layout_skips_more(spark, sf_dir):
    rows = {
        r.layout: r
        for r in REGISTRY["q_zonemap_prune"].builder(spark, sf_dir).collect()
    }
    nat, wk = rows["ingest_order"], rows["date_partitioned"]
    assert nat.rows_total == wk.rows_total  # same data, two layouts
    # partitioning on the filter column must dominate ingest order
    assert wk.skip_ratio_micro > nat.skip_ratio_micro
    for r in rows.values():
        assert 0 <= r.files_skipped <= r.n_files
        assert 0 <= r.rows_skipped <= r.rows_total


def test_audio_fingerprint_kernel_known_clip(spark):
    # doc_ids congruent mod 256 have identical samples -> identical
    # fingerprints -> they must match with n_shared = their fp count
    import pandas as pd

    from flink_rc_spark.llm.audio import (
        _FP_MAX_DT,
        _N_SAMPLES,
        _VAD_FRAME,
        _fingerprint_batches,
    )
    from flink_rc_spark.llm.audio import encode_wav  # type: ignore[attr-defined]

    import numpy as np

    def synth(doc_id):
        return encode_wav(
            np.array(
                [(doc_id * 7 + i * 13) % 256 for i in range(_N_SAMPLES)],
                dtype=np.int16,
            )
        )

    pdf = pd.DataFrame(
        {"doc_id": [5, 261], "payload": [synth(5), synth(261)]}
    )
    out = pd.concat(list(_fingerprint_batches(iter([pdf]))))
    fps5 = set(out[out.doc_id == 5].fp)
    fps261 = set(out[out.doc_id == 261].fp)
    assert fps5 == fps261 and len(fps5) > 0
    # dt is encoded in the low 3 bits and bounded
    assert all(1 <= (fp % 8) <= _FP_MAX_DT for fp in fps5)


def test_lsh_eval_confusion_identity(spark, sf_dir):
    row = REGISTRY["q_lsh_eval"].builder(spark, sf_dir).collect()[0]
    assert row.tp + row.fp == row.n_cand
    assert row.tp + row.fn == row.n_truth
    assert row.tp >= 0 and row.fp >= 0 and row.fn >= 0
    if row.n_cand:
        assert row.precision_micro == row.tp * 1_000_000 // row.n_cand
    if row.n_truth:
        assert row.recall_micro == row.tp * 1_000_000 // row.n_truth
    # 4x2 banding at tau=0.4 should be recall-leaning on this corpus
    assert row.recall_micro is None or row.recall_micro >= 500_000
