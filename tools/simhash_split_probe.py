"""Quantify q_dedup_simhash's OUTPUT-vs-COMPUTE wall split at a given
SF dir — VERDICT r7 item 7.

The sf1 sweep showed q_dedup_simhash at ~5x the sf0.1 wall for 10x
data while its PAIR OUTPUT grew ~18x; before touching the (sound,
pigeonhole-lossless) banded plan, this probe separates the two costs:

- stage "signature": the 60-bit vote aggregation only (count folded —
  no pair work at all);
- stage "pairs_compute": the FULL banded-join + Hamming verify +
  distinct plan, but reduced to COUNT(*) so the multi-million-row
  pair set is computed yet never materialized to the sink;
- stage "pairs_full": the shipped query through the noop sink (what
  the bench sweep times).

pairs_full - pairs_compute ~= the pure output-materialization cost;
pairs_compute - signature ~= the candidate/verify compute. If output
dominates, the 5x is the answer GROWING (healthy); only a
compute-dominated split would justify widening the bands.

    python tools/simhash_split_probe.py [sf_dir ...]

Prints ONE JSON line per sf_dir (min-of-2 walls, seconds). Results
recorded in BASELINE.md ("q_dedup_simhash output-vs-compute split").
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
    from pyspark.sql import functions as F

    from flink_rc_spark.llm.dedup import q_dedup_simhash
    from flink_rc_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()

    # signature-only twin: same vote/aggregate subtree the query
    # builds, folded to one row (mirrors dedup.py's flattened votes)
    toks = docs.select(
        "doc_id",
        F.explode(F.expr("array_distinct(split(text, ' '))")).alias("tok"),
    )
    hashed = toks.select("doc_id", F.md5("tok").alias("x"))
    vote_cols = [
        F.expr(
            f"(CAST(floor((instr('0123456789abcdef', substr(x, {p // 4 + 1}, 1)) - 1)"
            f" / {2 ** (p % 4)}) AS INT) % 2) * 2 - 1"
        ).alias(f"v{p}")
        for p in range(60)
    ]
    agg = (
        hashed.select("doc_id", *vote_cols)
        .groupBy("doc_id")
        .agg(*[F.sum(f"v{p}").alias(f"s{p}") for p in range(60)])
    )
    sig_wall = _wall(
        lambda: agg.groupBy().count().write.format("noop")
        .mode("overwrite").save()
    )

    full_df = q_dedup_simhash(spark, sf_dir)
    compute_wall = _wall(
        lambda: full_df.groupBy().count().write.format("noop")
        .mode("overwrite").save()
    )
    full_wall = _wall(
        lambda: full_df.write.format("noop").mode("overwrite").save()
    )
    n_pairs = full_df.count()

    return {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_pairs": n_pairs,
        "signature_sec": sig_wall,
        "pairs_compute_sec": compute_wall,
        "pairs_full_sec": full_wall,
        "output_share": round(
            max(0.0, full_wall - compute_wall) / full_wall, 3
        ),
    }


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
    assert "q_dedup_simhash" in REGISTRY
    spark = get_spark(app="simhash_split_probe")
    for d in dirs:
        print(json.dumps(probe(spark, d)))
    spark.stop()


if __name__ == "__main__":
    main()
