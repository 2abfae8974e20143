"""What exactly is the ~0.7-1 s fixed cost every q_stream_* key pays?
(r12 verdict #7.) One session, warm JVM/Python, min-of-N cycles of:

- ``startstop``: the MINIMAL bounded replay — single-file stream,
  stateless projection, memory sink, processAllAvailable, stop. This
  is the floor every streaming key pays regardless of its kernel.
- ``stateless_5split``: same but 5 real micro-batches
  (maxFilesPerTrigger=1) — isolates the PER-MICRO-BATCH planning cost.
- ``stateful``: one-batch replay through a groupBy().count() in
  update mode — adds the state-store provider init + commit.
- ``sinkread``: the tail cache+count of run_to_memory in isolation.

Prints one JSON line with the split. Results recorded in
OPTIMIZATION_r13.md.

    python tools/streaming_fixed_cost_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_rc_spark.session import get_spark  # noqa: E402
from flink_rc_spark.streaming.replay import (  # noqa: E402
    events_stream,
    run_to_memory,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app="streaming_fixed_cost_probe")

    def cycle(n_splits: int, stateful: bool) -> float:
        t0 = time.perf_counter()
        src = events_stream(spark, sf_dir, n_splits=n_splits)
        if stateful:
            df = src.groupBy("event_type").count()
            out = run_to_memory(df, output_mode="update")
        else:
            df = src.select("event_id", "event_type")
            out = run_to_memory(df, output_mode="append")
        el = time.perf_counter() - t0
        out.unpersist()
        return round(el, 4)

    # warm-up: one of each shape (JVM, codegen, file-source listing)
    cycle(1, False)
    cycle(1, True)
    cycle(5, False)

    def cyc5s() -> float:
        t0 = time.perf_counter()
        out = run_to_memory(
            events_stream(spark, sf_dir, n_splits=5)
            .groupBy("event_type")
            .count(),
            output_mode="update",
        )
        el = time.perf_counter() - t0
        out.unpersist()
        return round(el, 4)

    res = {
        "startstop": min(cycle(1, False) for _ in range(5)),
        "stateless_5split": min(cycle(5, False) for _ in range(5)),
        "stateful_1": min(cycle(1, True) for _ in range(5)),
        "stateful_5split": min(cyc5s() for _ in range(5)),
    }

    # sink-read tail in isolation: table read + cache + count on a
    # tiny memory table
    t0 = time.perf_counter()
    d = spark.range(100).cache()
    d.count()
    d.unpersist()
    res["cache_count_tail"] = round(time.perf_counter() - t0, 4)

    res["per_microbatch_stateless"] = round(
        (res["stateless_5split"] - res["startstop"]) / 4, 4
    )
    res["per_microbatch_stateful"] = round(
        (res["stateful_5split"] - res["stateful_1"]) / 4, 4
    )
    res["state_init"] = round(res["stateful_1"] - res["startstop"], 4)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
