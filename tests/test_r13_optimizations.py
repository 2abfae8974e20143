"""Focused tests for the r13 optimization-round internals.

Each r13 rewrite keeps the declared results bit-identical; these tests
pin the mechanisms against the pre-r13 spellings they replaced:

- the simhash signature kernel must equal the 60-column JVM bit-vote
  aggregate it replaced, doc for doc;
- (the r13 setsim verify kernel and the pair-count kernel were both
  tried, measured SLOWER at the larger SF, and reverted — see the
  docstrings at q_join_setsim and pair_support_salted;)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_simhash_signature_kernel_equals_jvm(spark):
    """The Arrow bit-vote kernel == the flat 60-column JVM aggregate
    it replaced (the pre-r13 spelling, reconstructed here)."""
    from flink_rc_spark.llm.pairkern import (
        SIMHASH_SIG_SCHEMA,
        make_simhash_signature_kernel,
    )
    from flink_rc_spark.sources.tables import load

    docs = load(spark, SF_DIR, "documents").filter(F.col("doc_id") < 1200)
    toks = docs.select(
        "doc_id",
        F.explode(F.expr("array_distinct(split(text, ' '))")).alias("tok"),
    )
    hashed = toks.select("doc_id", F.md5("tok").alias("x"))
    # pre-r13 spelling: 60 per-bit vote columns -> groupBy sums -> sign
    vote_cols = [
        F.expr(
            f"(CAST(floor((instr('0123456789abcdef',"
            f" substr(x, {p // 4 + 1}, 1)) - 1)"
            f" / {2 ** (p % 4)}) AS INT) % 2) * 2 - 1"
        ).alias(f"v{p}")
        for p in range(60)
    ]
    agg = hashed.select("doc_id", *vote_cols).groupBy("doc_id").agg(
        *[F.sum(f"v{p}").alias(f"s{p}") for p in range(60)]
    )
    simhash_expr = " + ".join(
        f"(CASE WHEN s{p} >= 0 THEN 1 ELSE 0 END) * {2 ** p}"
        for p in range(60)
    )
    ref = {
        (r.doc_id, r.simhash)
        for r in agg.select(
            "doc_id", F.expr(simhash_expr).cast("bigint").alias("simhash")
        ).collect()
    }
    got = {
        (r.doc_id, r.simhash)
        for r in hashed.select(
            "doc_id", F.substring("x", 1, 15).alias("x")
        )
        .mapInPandas(make_simhash_signature_kernel(60), SIMHASH_SIG_SCHEMA)
        .collect()
    }
    assert got == ref


def test_components_driver_union_equals_fixpoint(spark, monkeypatch):
    """The bounded collect-and-solve component path == the distributed
    min-label fixpoint it short-circuits (forced by the gate), row for
    row including singletons, sizes, and canonical flags."""
    from flink_rc_spark.llm import dedup as _d
    from flink_rc_spark.sources.tables import load

    docs = load(spark, SF_DIR, "documents").filter(F.col("doc_id") < 1500)
    pairs = (
        _d.minhash_candidate_pairs(docs)
        .select("doc_a", "doc_b")
        .transform(_d.checkpoint, eager=True)
    )
    got = {
        tuple(r)
        for r in _d.dedup_components_from_pairs(docs, pairs).collect()
    }
    monkeypatch.setattr(_d, "_COMPONENTS_DRIVER_MAX_EDGES", -1)
    ref = {
        tuple(r)
        for r in _d.dedup_components_from_pairs(docs, pairs).collect()
    }
    assert got == ref and len(got) == docs.count()


import pytest


@pytest.mark.parametrize(
    "key,module,gate",
    [
        ("q_graph_pagerank", "flink_rc_spark.llm.dedup",
         "_COMPONENTS_DRIVER_MAX_EDGES"),
        ("q_graph_kcore", "flink_rc_spark.operators.graph",
         "_DRIVER_MAX_EDGES"),
    ],
)
def test_graph_driver_solver_equals_distributed(
    spark, monkeypatch, key, module, gate
):
    """Each bounded-subgraph driver solver == the distributed fixpoint
    it short-circuits (forced by zeroing the gate), row for row."""
    import importlib

    from flink_rc_spark.registry import REGISTRY, load_all

    load_all()
    got = {tuple(r) for r in REGISTRY[key].builder(spark, SF_DIR).collect()}
    monkeypatch.setattr(importlib.import_module(module), gate, -1)
    ref = {tuple(r) for r in REGISTRY[key].builder(spark, SF_DIR).collect()}
    assert got == ref and len(got) > 0
