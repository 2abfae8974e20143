"""Scale-probe q_dedup_semantic's corpus-scaled LSH blocking (r11
verdict #1 done-criterion): measure the candidate stage at 1x and 10x
the corpus WITH THE PLANE FORMULA ACTIVE, plus the fixed-8-plane
counterfactual at 10x, so the sub-linear claim is a measurement.

Synthesis: 10 replica blocks of the base embeddings, each DECORRELATED
from the others (per-replica cyclic dimension shift + deterministic
md5-parity sign flips — norm-preserving, so each block keeps the base
corpus's internal near-dup structure while cross-block cosines are
noise). This is the opposite choice from tools/scale_probe_llm.py's
near-dup replicas, deliberately: near-dup replicas multiply TRUE pair
volume ~replicas^2 and would measure output explosion; decorrelated
blocks keep true-pair volume ~linear, so the wall isolates how the
BLOCKING scales — exactly what the plane formula governs.

Expected shape: with planes = clamp(floor(log2(n/64)), 8, 24) the
bucket count grows with n, occupancy holds ~64, and the 10x wall is
~linear; pinned at 8 planes the same data packs 10x occupancy into 256
buckets and pair work grows ~quadratically in the block scale.

Usage:
    python tools/semantic_scale_probe.py [base_sf_dir] [replicas]
defaults: /root/repo/.localdata/sf1, 10. Prints ONE JSON line;
recorded in BASELINE.md.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_rc_spark.llm.dedup import (  # noqa: E402
    _semantic_planes,
    semantic_candidates,
)
from flink_rc_spark.session import get_spark  # noqa: E402
from flink_rc_spark.sources.tables import load  # noqa: E402

DIM = 64


def _signs(r: int) -> list[int]:
    """Deterministic +-1 per (replica, dim) from md5 parity."""
    return [
        1 - 2 * (int(hashlib.md5(f"sp{r}_{i}".encode()).hexdigest(), 16) % 2)
        for i in range(DIM)
    ]


def synthesize(spark, src_dir: str, out_dir: str, replicas: int) -> None:
    emb = load(spark, src_dir, "embeddings")
    parts = []
    for r in range(replicas):
        shift = r % DIM
        sign_arr = "array({})".format(
            ", ".join(str(s) for s in _signs(r))
        )
        # cyclic shift then per-dim sign flip: norm-preserving, block
        # structure intact, cross-block cosines decorrelated
        shifted = (
            f"concat(slice(embedding, {shift + 1}, {DIM - shift}),"
            f" slice(embedding, 1, {shift}))"
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"),
                F.expr(
                    f"zip_with({shifted}, {sign_arr},"
                    " (x, s) -> CAST(x * s AS FLOAT))"
                ).alias("embedding"),
                "label",
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.coalesce(4).write.mode("overwrite").parquet(f"{out_dir}/_embeddings")
    os.symlink(f"{out_dir}/_embeddings", f"{out_dir}/embeddings.parquet")


def _noop_wall(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def measure(spark, sf_dir: str, planes: int | None) -> dict:
    n = load(spark, sf_dir, "embeddings").count()
    eff_planes = planes if planes is not None else _semantic_planes(n)
    df1 = semantic_candidates(spark, sf_dir, planes=planes)
    df2 = semantic_candidates(spark, sf_dir, planes=planes)
    rows1, rows2 = df1.count(), df2.count()
    assert rows1 == rows2, f"nondeterministic stage: {rows1} != {rows2}"
    wall = min(_noop_wall(df1), _noop_wall(df2))
    return {
        "n_vectors": n,
        "planes": eff_planes,
        "pairs": rows1,
        "wall_sec": round(wall, 2),
    }


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", "sf1",
    )
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("semantic_scale_probe")
    out_dir = tempfile.mkdtemp(prefix="semantic_scale_")
    synthesize(spark, base, out_dir, replicas)
    measure(spark, base, None)  # warm the session once
    r_base = measure(spark, base, None)
    r_big = measure(spark, out_dir, None)
    r_big_fixed8 = measure(spark, out_dir, 8)
    out = {
        "base": r_base,
        "big_formula": r_big,
        "big_fixed8": r_big_fixed8,
        "replicas": replicas,
        "time_ratio_formula": round(
            r_big["wall_sec"] / max(r_base["wall_sec"], 1e-9), 2
        ),
        "time_ratio_fixed8": round(
            r_big_fixed8["wall_sec"] / max(r_base["wall_sec"], 1e-9), 2
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
