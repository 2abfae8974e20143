"""Hierarchy-rollup scale probe: one 10x-deeper-and-wider tree.

q_hierarchy_rollup's scaling claim is that pointer doubling closes a
depth-d tree in ceil(log2 d) rounds, so 10x more nodes (depth +~3.3
in a heap-shaped tree) must cost ~10x the closure rows but only ONE
extra join round. The probe synthesizes a CONTIGUOUS 10x customer key
range (replica r maps key k to r*n + k) so all replicas fuse into a
single big heap tree — offsetting into disjoint key spaces (the other
probes' trick) would shatter the hierarchy into forests of depth 1
and measure nothing.

Usage: python tools/scale_probe_graph.py [replicas]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.compute as pc  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from flink_rc_spark.registry import REGISTRY, load_all  # noqa: E402
from flink_rc_spark.session import get_spark  # noqa: E402

PROBE_KEYS = ["q_hierarchy_rollup"]


def synthesize(src_dir: str, out_dir: str, replicas: int) -> None:
    tbl = pq.read_table(f"{src_dir}/customer.parquet")
    n = tbl.num_rows
    parts = []
    for r in range(replicas):
        parts.append(
            tbl.set_column(
                tbl.schema.get_field_index("c_custkey"),
                "c_custkey",
                pc.add(tbl.column("c_custkey"), r * n),
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/customer.parquet")


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    spark = get_spark("graph_scale_probe")
    out_dir = tempfile.mkdtemp(prefix="graph_scale10_")
    synthesize(src, out_dir, replicas)

    def run(key: str, sf_dir: str) -> tuple[float, int]:
        t0 = time.perf_counter()
        n = REGISTRY[key].builder(spark, sf_dir).count()
        return time.perf_counter() - t0, n

    for key in PROBE_KEYS:
        run(key, src)  # warm
        base_t, base_n = run(key, src)
        big_t, big_n = run(key, out_dir)
        print(
            f"{key:28s} 1x: {base_t:6.2f}s {base_n:>9d} rows   "
            f"{replicas}x: {big_t:6.2f}s {big_n:>9d} rows   "
            f"time x{big_t / base_t:4.1f}  rows x{big_n / max(base_n, 1):4.1f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
