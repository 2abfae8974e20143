"""Custom stateful streaming operator (SURVEY.md §2.3
q_stream_stateful_counter) — the reference's operator-state pattern
(R4 reservoir state / R6 online model state) expressed relationally:
a per-user running count/sum held in the streaming state store via
``applyInPandasWithState``, surviving across micro-batches.

Exactness: the running sum accumulates in integer *cents* inside the
state (events.value is 2-decimal), so the emitted double equals the
batch oracle's decimal-window cumulative sum bit-for-bit — no float
drift however many micro-batches the stream is split into.

100 TB story: state is partitioned by user_id in the state store
(RocksDB in production), sized O(distinct keys); the same operator
carries the ESN reservoir vector or SGD weights as state — see
flink_rc_spark/rc for the batch twins.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_rc_spark.registry import register
from flink_rc_spark.streaming.replay import events_stream, run_to_memory
from flink_rc_spark.util import ensure_package_shipped

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("running_n", T.LongType()),
        T.StructField("running_sum", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def _counter(key, pdf_iter, state):
    import numpy as np

    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdf_iter:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        # vectorized exact cumulative state: np.round and Python round
        # are both round-half-even, and the accumulation is integer
        # cents, so this is bit-identical to the per-row loop it
        # replaced (which was the steepest operator in the 10x
        # streaming probe — rows-bound Python).
        vals = np.round(pdf["value"].to_numpy() * 100).astype(np.int64)
        cum = cents + np.cumsum(vals)
        nn = n + np.arange(1, len(vals) + 1, dtype=np.int64)
        if len(vals):
            n = int(nn[-1])
            cents = int(cum[-1])
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "running_n": nn,
                "running_sum": cum / 100.0,
            }
        )
    state.update((n, cents))


@register(
    "q_stream_stateful_counter",
    oracle="""
        SELECT user_id, event_id,
               COUNT(*) OVER w AS running_n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                   AS running_sum
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_stream_stateful_counter(spark, sf_dir):
    """Running per-user count/sum with model-in-state semantics."""
    ensure_package_shipped(spark)
    s = events_stream(spark, sf_dir)
    out = s.groupBy("user_id").applyInPandasWithState(
        _counter,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    return run_to_memory(out, output_mode="append")
