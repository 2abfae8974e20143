"""ANN recall audit at an arbitrary SF dir (VERDICT r6 item 4): the
recall numbers the small-sf tests assert, re-measured on demand against
a larger corpus (sf1's decorrelated vectors), recorded in BASELINE.md.

    python tools/ann_recall_audit.py [sf_dir]     # default .localdata/sf1

Prints ONE JSON line: banded-LSH recall@50 at (4,16) and (8,16), IVF
recall@50 at n_probe 1/2/4, composed IVF-PQ end recall@5, and the
Matryoshka funnel recall@5 — each vs exact brute force (the O(n^2)
ground truth runs here only; it is the measurement harness, not a
shipped plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from flink_rc_spark.registry import REGISTRY, load_all  # noqa: E402
from flink_rc_spark.session import get_spark  # noqa: E402


def _embeddings(spark, sf_dir):
    rows = spark.read.parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet").collect()
    return {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}


def ivf_pq_recall5(spark, sf_dir, emb) -> float:
    rows = REGISTRY["q_ivf_pq_search"].builder(spark, sf_dir).collect()
    ids = sorted(emb)
    X = np.stack([emb[i] for i in ids])
    recalls = []
    for q in range(10):
        d = ((X - emb[q]) ** 2).sum(axis=1)
        d[ids.index(q)] = np.inf
        order = np.lexsort((np.array(ids), d))
        true5 = {ids[j] for j in order[:5]}
        got5 = {r.cand_id for r in rows if r.vec_id == q}
        recalls.append(len(true5 & got5) / 5)
    return sum(recalls) / len(recalls)


def matryoshka_recall5(spark, sf_dir, emb) -> float:
    rows = REGISTRY["q_sim_matryoshka"].builder(spark, sf_dir).collect()
    unit = {k: v / np.linalg.norm(v) for k, v in emb.items()}
    ids = sorted(unit)
    recalls = []
    for q in range(10):
        sims = {c: float(unit[q] @ unit[c]) for c in ids if c != q}
        true5 = {c for c, _ in sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]}
        got5 = {r.cand_id for r in rows if r.vec_id == q}
        recalls.append(len(true5 & got5) / 5)
    return sum(recalls) / len(recalls)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", "sf1",
    )
    load_all()
    spark = get_spark(app="ann_recall_audit")
    from flink_rc_spark.llm.similarity import ann_recall, ivf_recall

    t0 = time.time()
    emb = _embeddings(spark, sf_dir)
    from flink_rc_spark.llm.similarity import brute_topk

    # ONE brute ground-truth pass (O(n^2)) shared by all five configs
    gt = {(r.vec_a, r.vec_b) for r in brute_topk(spark, sf_dir, 50).collect()}
    out = {
        "sf_dir": sf_dir,
        "n_vectors": len(emb),
        "ann_recall50_p4b16": round(ann_recall(spark, sf_dir, 50, 4, 16, gt=gt), 4),
        "ann_recall50_p8b16": round(ann_recall(spark, sf_dir, 50, 8, 16, gt=gt), 4),
        "ivf_recall50_probe1": round(ivf_recall(spark, sf_dir, 50, 16, 1, gt=gt), 4),
        "ivf_recall50_probe2": round(ivf_recall(spark, sf_dir, 50, 16, 2, gt=gt), 4),
        "ivf_recall50_probe4": round(ivf_recall(spark, sf_dir, 50, 16, 4, gt=gt), 4),
        "ivf_pq_recall5": round(ivf_pq_recall5(spark, sf_dir, emb), 4),
        "matryoshka_recall5": round(matryoshka_recall5(spark, sf_dir, emb), 4),
        "wall_sec": round(time.time() - t0, 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
