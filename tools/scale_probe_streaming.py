"""Streaming scale probe: 10x events replay through the declared
Structured Streaming queries.

Synthesis keeps the EVENT-TIME RANGE fixed and multiplies the event
rate (each replica r offsets event_id/user_id into its own key space
but keeps ts) — i.e. 10x throughput, the realistic scale-up for a
stream. State sizes then grow with keys x windows exactly as the 100
TB model predicts: tumbling-window state rows x10 (more keys), dedup
state x10, stream-stream join state x10.

Usage: python tools/scale_probe_streaming.py [replicas]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402
import pyarrow.compute as pc  # noqa: E402
import pyarrow as pa  # noqa: E402

from flink_rc_spark.registry import REGISTRY, load_all  # noqa: E402
from flink_rc_spark.session import get_spark  # noqa: E402

PROBE_KEYS = [
    "q_stream_tumbling",
    "q_stream_session",
    "q_stream_dedup",
    "q_stream_stateful_counter",
    "q_stream_stream_join",
    # r7 wave: the stateful top-k board, plus the three batch
    # event-analytics keys (they read only events.parquet, so the same
    # 10x synthesis exercises them)
    "q_stream_topk",
    "q_markov_transitions",
    "q_ab_ztest",
    "q_changepoint_cusum",
]


def synthesize(src_dir: str, out_dir: str, replicas: int) -> None:
    tbl = pq.read_table(f"{src_dir}/events.parquet")
    parts = []
    for r in range(replicas):
        off = r * 10_000_000
        parts.append(
            tbl.set_column(
                tbl.schema.get_field_index("event_id"),
                "event_id",
                pc.add(tbl.column("event_id"), off),
            ).set_column(
                tbl.schema.get_field_index("user_id"),
                "user_id",
                pc.add(tbl.column("user_id"), off),
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/events.parquet")


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    spark = get_spark("streaming_scale_probe")
    out_dir = tempfile.mkdtemp(prefix="events_scale10_")
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
