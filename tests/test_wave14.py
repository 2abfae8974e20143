"""Semantic checks for the wave-14 keys: prefix-filter exact
set-similarity join (completeness vs the unfiltered enumeration) and
MaxSim late-interaction retrieval.
"""

from __future__ import annotations

import pytest

from flink_rc_spark.registry import REGISTRY, get_queries


@pytest.fixture(scope="module", autouse=True)
def _load():
    get_queries()


def test_setsim_complete_vs_unfiltered(spark, sf_dir):
    # the prefix filter must lose NOTHING: compare against the full
    # shared-shingle inverted-index enumeration at the same threshold
    from pyspark.sql import functions as F

    from flink_rc_spark.llm.dedup import _SHINGLES_SPARK
    from flink_rc_spark.sources.tables import load

    got = {
        (r.doc_a, r.doc_b): (r.n_inter, r.n_union)
        for r in REGISTRY["q_join_setsim"].builder(spark, sf_dir).collect()
    }
    docs = load(spark, sf_dir, "documents")
    sh = (
        docs.select("doc_id", F.split("text", " ").alias("t"))
        .filter(F.size("t") >= 3)
        .select("doc_id", F.expr(_SHINGLES_SPARK).alias("s"))
    )
    inv = sh.select("doc_id", F.explode("s").alias("g"))
    cand = (
        inv.alias("a")
        .join(inv.alias("b"), F.col("a.g") == F.col("b.g"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("xa"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("xb"))
    inter = F.size(F.array_intersect("xa", "xb")).cast("long")
    union_ = F.size("xa") + F.size("xb") - inter
    truth = {
        (r.doc_a, r.doc_b): (r.i, r.u)
        for r in cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.lit(5) * inter >= F.lit(2) * union_)
        .select("doc_a", "doc_b", inter.alias("i"), union_.alias("u"))
        .collect()
    }
    assert got == truth  # identical pairs AND identical exact counts


def test_maxsim_brute_one_query(spark, sf_dir):
    import numpy as np

    from flink_rc_spark.sources.tables import load

    rows = REGISTRY["q_sim_maxsim"].builder(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert len(by_q) == 5
    emb = {
        r.vec_id: np.round(np.array(r.embedding, dtype=np.float64) * 1e6)
        .astype(np.int64)
        for r in load(spark, sf_dir, "embeddings").collect()
    }

    def maxsim(qm, dm):
        score = 0
        for tq in range(4):
            qv = qm[tq * 16 : (tq + 1) * 16]
            score += max(
                int(qv @ dm[td * 16 : (td + 1) * 16]) for td in range(4)
            )
        return score

    qid, ranked = next(iter(by_q.items()))
    ranked.sort(key=lambda r: r.rank)
    qm = emb[qid]
    brute = sorted(
        ((maxsim(qm, dm), -d) for d, dm in emb.items() if d != qid),
        reverse=True,
    )[:10]
    expect = [(-negd, s) for s, negd in brute]
    assert [(r.vec_id, r.score) for r in ranked] == expect
    # scores are non-increasing within each query
    for rs in by_q.values():
        rs.sort(key=lambda r: r.rank)
        ss = [r.score for r in rs]
        assert ss == sorted(ss, reverse=True)
