"""Focused tests for the r13 optimization-round internals.

Each r13 rewrite keeps the declared results bit-identical; these tests
pin the mechanisms against the pre-r13 spellings they replaced:

- the simhash signature kernel must equal the 60-column JVM bit-vote
  aggregate it replaced, doc for doc;
- the setsim verify kernel must equal the SQL
  array_intersect/threshold/floor-div spelling, pair for pair;
- (the r13 pair-count kernel for pair_support_salted was tried,
  measured SLOWER at sf0.1, and reverted — see the helper's docstring;
  its row-identity coverage lives in tests/test_scale_guards.py.)
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


def test_setsim_verify_kernel_equals_sql(spark):
    """The sorted-intersect verify kernel == the SQL spelling
    (array_intersect size, union, threshold filter, floor-div), on
    pairs engineered to sit on and around the 5|∩| >= 2|∪| boundary."""
    from flink_rc_spark.llm.pairkern import (
        SETSIM_VERIFY_SCHEMA,
        make_setsim_verify_kernel,
    )

    rows = []
    for i in range(200):
        # deterministic, varied overlap; arrays sorted unique
        ta = sorted({(i * 7 + j * 3) % 97 + 1 for j in range(5 + i % 13)})
        tb = sorted({(i * 5 + j * 4) % 89 + 1 for j in range(3 + i % 17)})
        rows.append((2 * i, 2 * i + 1, ta, len(ta), tb, len(tb)))
    # edge cases: identical sets, disjoint sets, exact-threshold pair
    rows.append((1000, 1001, [1, 2, 3], 3, [1, 2, 3], 3))
    rows.append((1002, 1003, [1, 2], 2, [8, 9], 2))
    rows.append((1004, 1005, [1, 2, 3, 4], 4, [3, 4, 5, 6], 4))  # J=1/3
    rows.append((1006, 1007, [1, 2, 3], 3, [2, 3, 4], 3))  # J=0.5 pass
    df = spark.createDataFrame(
        rows,
        "doc_a long, doc_b long, ta array<long>, sa long,"
        " tb array<long>, sb long",
    )
    ref = {
        (r.doc_a, r.doc_b, r.n_inter, r.n_union, r.jaccard_micro)
        for r in df.withColumn(
            "n_inter", F.size(F.array_intersect("ta", "tb")).cast("long")
        )
        .withColumn("n_union", F.col("sa") + F.col("sb") - F.col("n_inter"))
        .filter(F.lit(5) * F.col("n_inter") >= F.lit(2) * F.col("n_union"))
        .selectExpr(
            "doc_a",
            "doc_b",
            "n_inter",
            "n_union",
            "(n_inter * 1000000) div n_union AS jaccard_micro",
        )
        .collect()
    }
    got = {
        (r.doc_a, r.doc_b, r.n_inter, r.n_union, r.jaccard_micro)
        for r in df.mapInPandas(
            make_setsim_verify_kernel(5, 2, 1_000_000), SETSIM_VERIFY_SCHEMA
        ).collect()
    }
    assert got == ref
    assert any(r[4] == 500_000 for r in got)  # the J=0.5 pair survived


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
