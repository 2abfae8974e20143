"""Semantic checks for the wave-12 keys: paragraph dedup screen,
CUPED variance reduction, residual vector quantization.
"""

from __future__ import annotations

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def test_paragraph_dedup_exact_dups_flagged(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_rc_spark.sources.tables import load

    out = REGISTRY["q_dedup_paragraph"].builder(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    assert out.count() == docs.count()
    rows = {r.doc_id: r for r in out.collect()}
    for r in rows.values():
        assert 0 <= r.n_dup_chunks <= r.n_chunks
        assert r.dup_ratio_micro == r.n_dup_chunks * 1_000_000 // r.n_chunks
        assert r.flag_heavy_dup == (1 if r.dup_ratio_micro >= 300_000 else 0)
    # any exact-duplicate document pair must be 100% chunk-duplicated
    dup_docs = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.collect_list("doc_id").alias("ids"), F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .collect()
    )
    flagged_any = False
    for g in dup_docs:
        for d in g.ids:
            assert rows[d].n_dup_chunks == rows[d].n_chunks, d
            flagged_any = True
    if dup_docs:
        assert flagged_any


def test_cuped_matches_numpy(spark, sf_dir):
    import numpy as np

    row = REGISTRY["q_ab_cuped"].builder(spark, sf_dir).collect()[0]
    # identities on the reported exact moments
    assert row.var_pre_n2 > 0 and row.var_post_n2 > 0
    theta = row.cov_n2 / row.var_pre_n2
    assert abs(row.theta_micro - np.floor(theta * 1e6)) <= 1
    rho2 = row.cov_n2**2 / (row.var_pre_n2 * row.var_post_n2)
    assert abs(row.var_reduction_micro - int(rho2 * 1e6)) <= 1
    assert 0 <= row.var_reduction_micro <= 1_000_000


def test_rvq_residual_reduces_error(spark, sf_dir):
    rows = REGISTRY["q_embedding_rvq"].builder(spark, sf_dir).collect()
    assert rows
    better = 0
    for r in rows:
        assert 0 <= r.code1 < 8 and 0 <= r.code2 <= 8
        assert r.sq_err_stage1 >= 0 and r.sq_err_stage2 >= 0
        # the zero escape codeword makes stage 2 a guaranteed refinement
        assert r.sq_err_stage2 <= r.sq_err_stage1
        if r.sq_err_stage2 < r.sq_err_stage1:
            better += 1
    assert better > 0  # some vectors genuinely refine
    # sampled codebook vectors quantize themselves exactly at stage 1
    zero1 = [r for r in rows if r.sq_err_stage1 == 0.0]
    assert len(zero1) >= 8
