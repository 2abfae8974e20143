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


def test_minhash_est_jaccard_bounds(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_dedup_minhash").collect()
    for r in rows:
        assert r.doc_a < r.doc_b
        # banded LSH with r=2 implies >= 2/8 matching signature rows
        assert 0.25 <= r.est_jaccard <= 1.0


def test_simhash_pairs_ordered(spark, sf_dir):
    for r in _run(spark, sf_dir, "q_dedup_simhash").collect():
        assert r.doc_a < r.doc_b and 0 <= r.hamming <= 3


def test_ann_lsh_subset_of_bruteforce_space(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_sim_ann_lsh").collect()
    for r in rows:
        assert r.vec_a < r.vec_b
        assert -1.0001 <= r.cosine <= 1.0001


def test_knn_labels_valid(spark, sf_dir):
    rows = _run(spark, sf_dir, "q_knn_label").collect()
    assert len(rows) == 10
    for r in rows:
        assert r.pred_label is not None


def test_multimodal_decode_stub_raises():
    from flink_rc_spark.llm.multimodal import _HAVE_PIL, decode_image

    if not _HAVE_PIL:
        import pytest as _pytest

        with _pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG fake")


def test_multimodal_payload_is_binary(spark, sf_dir):
    from flink_rc_spark.llm.multimodal import with_media_columns
    from flink_rc_spark.sources.tables import load

    media = with_media_columns(load(spark, sf_dir, "documents"))
    assert dict(media.dtypes)["payload"] == "binary"
    row = media.first()
    assert isinstance(row.payload, (bytes, bytearray)) and len(row.payload) == 16
    assert row.meta.format in ("png", "jpeg")
