"""Semantic checks for the wave-16 keys: NDCG@10 and the
k-anonymity / l-diversity audit.
"""

from __future__ import annotations

import math

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def test_ndcg_brute_one_source(spark, sf_dir):
    from flink_rc_spark.operators.stattests import _NDCG_DISC
    from flink_rc_spark.sources.tables import load

    # the literal table must match 1e6/log2(r+1) exactly (floor)
    for r, d in enumerate(_NDCG_DISC, start=1):
        assert d == int(1e6 / math.log2(r + 1))
    rows = {
        r.source: r
        for r in REGISTRY["q_eval_ndcg"].builder(spark, sf_dir).collect()
    }
    docs = load(spark, sf_dir, "documents").collect()
    by_src = {}
    for d in docs:
        by_src.setdefault(d.source, []).append(d)
    for src, ds in list(by_src.items())[:5]:
        ds.sort(key=lambda d: (-d.n_chars, d.doc_id))
        rels = [2 if d.lang == "en" else 0 for d in ds]
        dcg = sum(rel * _NDCG_DISC[i] for i, rel in enumerate(rels[:10]))
        n_pos = sum(1 for r in rels if r)
        idcg = sum(2 * _NDCG_DISC[i] for i in range(min(10, n_pos)))
        row = rows[src]
        assert row.dcg_micro == dcg, src
        assert row.idcg_micro == idcg, src
        if idcg:
            assert row.ndcg_micro == dcg * 1_000_000 // idcg
            assert 0 <= row.ndcg_micro <= 1_000_000
        else:
            assert row.ndcg_micro is None


def test_kanon_audit_identities(spark, sf_dir):
    from flink_rc_spark.sources.tables import load

    row = REGISTRY["q_privacy_kanon"].builder(spark, sf_dir).collect()[0]
    n_cust = load(spark, sf_dir, "customer").count()
    assert row.min_class_size >= 1
    assert row.classes_below_2 <= row.classes_below_5 <= row.n_classes
    assert row.rows_at_risk_2 <= row.rows_at_risk_5 <= n_cust
    assert 1 <= row.min_l_diversity <= 5  # at most 5 priorities
    # risk rows for k=2 are exactly the singleton classes
    assert row.rows_at_risk_2 == row.classes_below_2


def test_psi_components_sane(spark, sf_dir):
    import math

    rows = sorted(
        REGISTRY["q_psi_drift"].builder(spark, sf_dir).collect(),
        key=lambda r: r.bin,
    )
    assert [r.bin for r in rows] == list(range(1, 11))
    n_pre = sum(r.cnt_pre for r in rows)
    n_post = sum(r.cnt_post for r in rows)
    psi = 0.0
    for r in rows:
        dd = (r.cnt_pre / n_pre - r.cnt_post / n_post) * 1e6
        assert abs(r.dist_diff_micro - math.floor(dd)) <= 1
        if r.ln_ratio_micro is not None:
            lr = math.log(
                (r.cnt_pre / n_pre) / (r.cnt_post / n_post)
            ) * 1e6
            assert abs(r.ln_ratio_micro - round(lr)) <= 1
            # same-sign factors -> non-negative contribution
            assert r.dist_diff_micro * r.ln_ratio_micro >= -2_000_000
            psi += (dd / 1e6) * (lr / 1e6)
    # pre deciles are ~equal-mass: each pre bin holds ~10% of pre rows
    for r in rows:
        assert abs(r.cnt_pre - n_pre / 10) <= n_pre / 10 * 0.2 + 2
    assert psi >= 0
