"""Quantify q_attribution_markov's stage split at a given SF dir —
VERDICT r8 item 2 (the q_dedup_simhash probe pattern).

The r8 sf1 sweep put q_attribution_markov at 36.5 s (6.5x its sf0.1
wall) with no evidence of where the wall goes. The r9 rework collapsed
the plan to exactly two stages, which this probe times separately:

- stage "rollup": `_mkv_transition_counts(...).collect()` — the ONE
  user-window pass over events (row_number + lead + running
  prior-purchase count in a single exchange) plus the transition
  explode/count. This is the only part that touches data.
- stage "full": the shipped builder end-to-end through the noop sink —
  rollup + the driver-side exact-integer value iteration (≤ ~180
  quantized probabilities, 12 rounds) + the 4-row result frame.

full - rollup ~= the model-math + result-frame overhead; if rollup
dominates (expected), the wall is the inherent cost of one window
over 10x events on fixed cores — the same verdict as the streaming
replay family — and the old 36.5 s gap was the ELIMINATED second
window + broadcast join + 12 distributed round cascades.

    python tools/markov_split_probe.py [sf_dir ...]

Prints ONE JSON line per sf_dir (min-of-2 walls, seconds). Results
recorded in BASELINE.md ("q_attribution_markov stage split").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_rc_spark.registry import REGISTRY, load_all  # noqa: E402
from flink_rc_spark.session import get_spark  # noqa: E402


def _wall(run) -> float:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        t = time.perf_counter() - t0
        best = t if best is None else min(best, t)
    return round(best, 3)


def probe(spark, sf_dir: str) -> dict:
    from flink_rc_spark.operators.analytics import _mkv_transition_counts

    rollup = _wall(
        lambda: _mkv_transition_counts(spark, sf_dir).collect()
    )
    full = _wall(
        lambda: REGISTRY["q_attribution_markov"]
        .builder(spark, sf_dir)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return {
        "sf_dir": sf_dir,
        "rollup_sec": rollup,
        "full_sec": full,
        "model_tail_sec": round(max(0.0, full - rollup), 3),
    }


def main() -> None:
    load_all()
    spark = get_spark(app="markov_split_probe")
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    for d in dirs:
        print(json.dumps(probe(spark, d)))
    spark.stop()


if __name__ == "__main__":
    main()
