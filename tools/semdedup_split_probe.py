"""Split-probe the two unexplained sf1 heavies from the r9 verdict —
q_dedup_semdedup (13.5 s sf1, 3.5x at 10x) and q_dedup_semantic
(11.4 s, 5.8x) — with the q_dedup_simhash output-vs-compute method
(BASELINE.md r8 pattern): time each pipeline stage separately and
count its rows, so the wall is attributed to candidate volume vs
kernel compute vs output size instead of guessed.

Stages:
  semdedup: S1 = k-means fit+assign (Lloyd rounds, broadcast model)
            S2 = in-cluster pair join + cosine kernel (count)
            S3 = full query (nbr window + left join + sort, count)
  semantic: S1 = LSH bucket assignment (count)
            S2 = bucket-collision join + exact cosine >= 0.30 (count)
            S3 = full query (+ shingle verify joins, count)

Usage:
    python tools/semdedup_split_probe.py [sf_dir ...]
defaults to /root/testdata/sf0.1 and /root/repo/.localdata/sf1.
Each stage is timed as min-of-2 after one warm-up of the smallest
stage, mirroring bench.py's noise discipline.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def _min2(fn):
    """fn builds and returns the stage DataFrame. Timing is the NOOP
    SINK over the full column set, never .count(): Catalyst prunes
    projections a count does not need, so count()-timing silently
    skips the kernels under test — the r10 probe timed semdedup's
    "full key" at 6.8 s that way while the noop wall was ~26 s (r11
    finding, the playbook's count()-profiling trap)."""
    df1, df2 = fn(), fn()
    n1, n2 = df1.count(), df2.count()
    # cross-run determinism check (r11 advice): the two independently
    # built frames must agree before their walls are compared
    assert n1 == n2, f"nondeterministic stage: {n1} != {n2} rows"
    t1, t2 = _noop(df1), _noop(df2)
    return n1, min(t1, t2)


def probe(spark, sf_dir: str) -> list[tuple]:
    from pyspark.sql import functions as F

    from flink_rc_spark.llm.cluster import kmeans_assign
    from flink_rc_spark.llm.dedup import (
        _SEMDEDUP_TAU,
        _semdedup_k,
        q_dedup_semantic,
        q_dedup_semdedup,
    )
    from flink_rc_spark.llm.similarity import (
        _DOT_SPARK,
        _lsh_bit_spark,
        _vectors,
    )
    from flink_rc_spark.sources.tables import load

    rows: list[tuple] = []

    # ---------------- semdedup ----------------
    n = load(spark, sf_dir, "embeddings").count()
    k = _semdedup_k(n)

    def s1():
        return kmeans_assign(spark, sf_dir, k=k)

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"),
    )
    nv = emb.withColumn(
        "nrm",
        F.expr(
            "sqrt(aggregate(transform(e, x -> x*x), 0d, (acc, x) -> acc + x))"
        ),
    )

    def s2():
        asg = kmeans_assign(spark, sf_dir, k=k).select("vec_id", "c_id")
        mem = asg.join(nv, "vec_id")
        a = mem.select(
            F.col("vec_id").alias("vec_a"), "c_id",
            F.col("e").alias("ea"), F.col("nrm").alias("na"),
        )
        b = mem.select(
            F.col("vec_id").alias("vec_b"), "c_id",
            F.col("e").alias("eb"), F.col("nrm").alias("nb"),
        )
        dot = F.expr(
            "aggregate(zip_with(ea, eb, (x, y) -> x * y), 0d,"
            " (acc, x) -> acc + x)"
        )
        return (
            a.join(b, "c_id")
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select((dot / (F.col("na") * F.col("nb"))).alias("cosv"))
            .filter(F.col("cosv") >= _SEMDEDUP_TAU)
        )

    def s3():
        return q_dedup_semdedup(spark, sf_dir)

    for name, fn in [("semdedup.S1_kmeans", s1),
                     ("semdedup.S2_pairs", s2),
                     ("semdedup.S3_full", s3)]:
        cnt, sec = _min2(fn)
        rows.append((sf_dir, name, cnt, sec))

    # ---------------- semantic ----------------
    nvec = _vectors(spark, sf_dir)
    bucket_expr = " + ".join(
        f"({_lsh_bit_spark(j)}) * {2 ** j}" for j in range(8)
    )
    h = nvec.withColumn("bucket", F.expr(bucket_expr).cast("bigint"))

    def t1():
        return h

    def t2():
        a = h.select(
            F.col("vec_id").alias("doc_a"), F.col("e").alias("ea"),
            F.col("nrm").alias("na"), "bucket",
        )
        b = h.select(
            F.col("vec_id").alias("doc_b"), F.col("e").alias("eb"),
            F.col("nrm").alias("nb"), F.col("bucket").alias("bucket_b"),
        )
        cos = F.expr(_DOT_SPARK) / (F.col("na") * F.col("nb"))
        return (
            a.join(
                b,
                (F.col("bucket") == F.col("bucket_b"))
                & (F.col("doc_a") < F.col("doc_b")),
            )
            .select(cos.alias("cos"))
            .filter(F.col("cos") >= 0.30)
        )

    def t2_pairs():
        a = h.select(F.col("vec_id").alias("doc_a"), "bucket")
        b = h.select(
            F.col("vec_id").alias("doc_b"),
            F.col("bucket").alias("bucket_b"),
        )
        return a.join(
            b,
            (F.col("bucket") == F.col("bucket_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )

    def t3():
        return q_dedup_semantic(spark, sf_dir)

    for name, fn in [("semantic.S1_bucket", t1),
                     ("semantic.S2a_collisions", t2_pairs),
                     ("semantic.S2_close", t2),
                     ("semantic.S3_full", t3)]:
        cnt, sec = _min2(fn)
        rows.append((sf_dir, name, cnt, sec))
    return rows


def main() -> None:
    from flink_rc_spark.session import get_spark

    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/root/repo/.localdata/sf1",
    ]
    spark = get_spark(app="semdedup_split_probe")
    all_rows: list[tuple] = []
    for d in dirs:
        all_rows += probe(spark, d)
    print(f"\n{'sf_dir':<32} {'stage':<26} {'rows':>12} {'sec':>8}")
    for d, name, cnt, sec in all_rows:
        print(f"{os.path.basename(d.rstrip('/')):<32} {name:<26}"
              f" {cnt:>12} {sec:>8.2f}")


if __name__ == "__main__":
    main()
