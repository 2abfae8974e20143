"""TPC-H-wave scale probe: 10x facts (lineitem+orders), fixed dims.

Validates empirically that the analytic-query plans scale like their
shapes promise: facts are replicated with DISJOINT order keys (replica
r offsets every l_orderkey/o_orderkey by r*10^9) while customer/
supplier/part/nation/region stay fixed — the realistic warehouse
growth shape (facts grow, dimensions don't). Orders keep their
original custkeys so join hit-rates are preserved; per-replica
orderdates are untouched so date predicates select the same fraction.

Expected: near-linear time in fact volume for the scan/agg-bound
queries (Q3/Q5/Q6/Q9/Q10), and linear with a mild constant for Q18
(its HAVING pre-aggregate shuffles the fact once more). Output rows
scale ~1x for the dim-grouped aggregates (same group keys) and ~10x
for the per-order outputs.

Usage: python tools/scale_probe_tpch.py [replicas]
Results are recorded in BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_rc_spark.registry import REGISTRY, load_all  # noqa: E402
from flink_rc_spark.session import get_spark  # noqa: E402
from flink_rc_spark.sources.tables import TABLES, load  # noqa: E402

PROBE_KEYS = [
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q9",
    "q_tpch_q10",
    "q_tpch_q12",
    "q_tpch_q13",
    "q_tpch_q15",
    "q_tpch_q17",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_tpch_q22",
    # r6 wave (lineitem/orders-driven; q_basket_pairs is deliberately
    # NOT probed this way — 10x parts per unchanged customer key grows
    # in-basket pairs ~100x by design, measuring the documented skew
    # knob rather than plan scaling)
    "q_snapshot_diff",
    "q_corr_matrix",
    "q_zorder_layout",
    "q_ivm_delta",
]

_OFFSET = 1_000_000_000


def synthesize(spark, src_dir: str, out_dir: str, replicas: int) -> None:
    li = load(spark, src_dir, "lineitem")
    li_parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(r * _OFFSET))
        for r in range(replicas)
    ]
    big_li = li_parts[0]
    for p in li_parts[1:]:
        big_li = big_li.unionByName(p)
    big_li.coalesce(16).write.mode("overwrite").parquet(f"{out_dir}/_lineitem")

    orders = load(spark, src_dir, "orders")
    o_parts = [
        orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(r * _OFFSET))
        for r in range(replicas)
    ]
    big_o = o_parts[0]
    for p in o_parts[1:]:
        big_o = big_o.unionByName(p)
    big_o.coalesce(8).write.mode("overwrite").parquet(f"{out_dir}/_orders")

    os.symlink(f"{out_dir}/_lineitem", f"{out_dir}/lineitem.parquet")
    os.symlink(f"{out_dir}/_orders", f"{out_dir}/orders.parquet")
    for t in TABLES:
        if t not in ("lineitem", "orders"):
            os.symlink(
                f"{src_dir.rstrip('/')}/{t}.parquet", f"{out_dir}/{t}.parquet"
            )


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    spark = get_spark("tpch_scale_probe")
    out_dir = tempfile.mkdtemp(prefix="tpch_scale10_")
    synthesize(spark, src, out_dir, replicas)

    def run(key: str, sf_dir: str) -> tuple[float, int]:
        t0 = time.perf_counter()
        n = REGISTRY[key].builder(spark, sf_dir).count()
        return time.perf_counter() - t0, n

    for key in PROBE_KEYS:
        run(key, src)  # warm
        base_t, base_n = run(key, src)
        big_t, big_n = run(key, out_dir)
        print(
            f"{key:12s} 1x: {base_t:6.2f}s {base_n:>9d} rows   "
            f"{replicas}x: {big_t:6.2f}s {big_n:>9d} rows   "
            f"time x{big_t / base_t:4.1f}  rows x{big_n / max(base_n, 1):4.1f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
