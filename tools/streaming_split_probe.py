"""Split the stateful-streaming replay family's wall into REPLAY
machinery vs STATE-API overhead vs KERNEL compute — VERDICT r8 item 5.

The sf1 sweep put the applyInPandasWithState replay family at
12-19 s/key (3-6x the sf0.1 wall), the biggest remaining absolute
block. Before touching the (correct) kernels, this probe separates
the three costs every key pays:

- stage "replay": the bounded micro-batch replay through a STATELESS
  projection + selective filter to the memory sink — streaming source
  listing/scan + micro-batch execution + sink, no state store, no
  Python;
- stage "state_api": the same replay through
  ``groupBy(<key>).applyInPandasWithState`` with a NULL kernel that
  consumes the Arrow batches and emits nothing — adds the state-store
  exchange, per-group state round-trip, and Arrow/Python transfer,
  still no kernel math;
- stage "full": the shipped query (kernel included).

full - state_api ~= kernel compute; state_api - replay ~= state
API + exchange overhead; replay = fixed machinery. The state_api
stage runs at the harness's state_partitions=8 AND at 32 so the
"raise state partitions at scale" knob is measured, not guessed.

    python tools/streaming_split_probe.py [sf_dir ...]

Prints ONE JSON line per sf_dir (min-of-2 walls, seconds). Results
recorded in BASELINE.md ("stateful replay family split").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from flink_rc_spark.registry import REGISTRY, load_all  # noqa: E402
from flink_rc_spark.session import get_spark  # noqa: E402

FAMILY = [
    "q_stream_stateful_counter",
    "q_stream_ewma",
    "q_stream_funnel",
    "q_stream_esn",
    "q_stream_anomaly",
]

NULL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)
NULL_STATE_SCHEMA = T.StructType([T.StructField("n", T.LongType())])


def _null_kernel(key, pdf_iter, state):
    """Consumes every Arrow batch (forcing the full transfer the real
    kernels pay) and keeps one counter in state; emits nothing."""
    n = state.get[0] if state.exists else 0
    for pdf in pdf_iter:
        n += len(pdf)
    state.update((n,))
    return iter(
        [
            pd.DataFrame(
                {
                    "k": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        ]
    )


def _wall(run) -> float:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        t = time.perf_counter() - t0
        best = t if best is None else min(best, t)
    return round(best, 3)


def probe(spark, sf_dir: str) -> dict:
    from flink_rc_spark.streaming.replay import events_stream, run_to_memory
    from flink_rc_spark.streaming.stateful import ensure_package_shipped

    ensure_package_shipped(spark)

    def replay_only() -> None:
        s = events_stream(spark, sf_dir).select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        # selective filter so the memory sink holds ~0.1% of rows; the
        # SOURCE still scans everything through the micro-batch engine
        run_to_memory(
            s.filter(F.col("event_id") % 1024 == 0), output_mode="append"
        ).unpersist()

    def state_api(group_col: str, parts: int) -> None:
        s = events_stream(spark, sf_dir).select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        out = s.groupBy(group_col).applyInPandasWithState(
            _null_kernel,
            outputStructType=NULL_OUT_SCHEMA,
            stateStructType=NULL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
        run_to_memory(
            out, output_mode="append", state_partitions=parts
        ).unpersist()

    res: dict = {"sf_dir": sf_dir}
    res["replay_sec"] = _wall(replay_only)
    res["state_api_user_p8_sec"] = _wall(lambda: state_api("user_id", 8))
    res["state_api_user_p32_sec"] = _wall(lambda: state_api("user_id", 32))
    res["state_api_type_p8_sec"] = _wall(lambda: state_api("event_type", 8))
    for k in FAMILY:
        b = REGISTRY[k].builder
        res[k + "_sec"] = _wall(lambda b=b: b(spark, sf_dir).unpersist())
        spark.catalog.clearCache()
    return res


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".localdata",
            "sf1",
        ),
    ]
    load_all()
    for k in FAMILY:
        assert k in REGISTRY, k
    spark = get_spark(app="streaming_split_probe")
    for d in dirs:
        print(json.dumps(probe(spark, d)))
    spark.stop()


if __name__ == "__main__":
    main()
