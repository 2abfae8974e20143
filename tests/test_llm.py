"""LLM-data wave tests beyond the generic oracle parity in
test_correctness.py: semantic properties of dedup / similarity /
text operators that a value-hash alone doesn't witness.
"""

from __future__ import annotations

import pytest

from flink_rc_spark.registry import REGISTRY, load_all

load_all()


def _run(spark, sf_dir, key):
    return REGISTRY[key].builder(spark, sf_dir)


def test_lang_id_scores_nonnegative(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_lang_id").collect()
    assert len(rows) > 0
    for r in rows:
        assert r.pred_lang in ("en", "es", "de", "fr")
        assert min(r.s_en, r.s_es, r.s_de, r.s_fr) >= 0


def test_quality_score_gate_consistent(spark, sf_dir):
    for r in _run(spark, sf_dir, "q_quality_score").collect():
        assert r.keep in (0, 1)
        expected = 1 if (r.n_tok >= 20 and r.stop_ratio < 0.5) else 0
        # stop_ratio is rounded to 4dp; only assert when not borderline
        if abs(r.stop_ratio - 0.5) > 1e-3:
            assert r.keep == expected, r


def test_fingerprint_min_le_max(spark, sf_dir):
    for r in _run(spark, sf_dir, "q_fingerprint").collect():
        assert r.min_shingle <= r.max_shingle
        assert len(r.full_hash) == 32
