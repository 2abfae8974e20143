"""Synthesize a CLUSTERED (non-uniform) embedding corpus at sf1 scale
for the ANN recall audit — VERDICT r7 item 8.

The shipped test vectors (and make_sf1.py's rotated replicas) are
near-uniform on the sphere, which flatters hash-bucket ANN: every LSH
band / IVF cell fills evenly. Real embedding corpora are CLUSTERED —
topical blobs of very different sizes — and that is exactly where
bucketed indexes fail (a probe list that covers a uniform corpus
misses a dominant blob's far side). This generator produces the
adversarial-but-realistic shape:

- 25 Gaussian clusters in 64-d; cluster SIZES follow a Zipf-like
  s_k ∝ 1/k curve (largest blob ~5.3k of 20k vectors, smallest ~209)
  — the long-tail topic distribution of a web corpus;
- cluster centers ~ N(0, I) scaled to unit norm x 1.0, intra-cluster
  noise sigma=0.35 — blobs overlap a little but stay separable
  (silhouette-positive), matching sentence-embedding geometry;
- deterministic numpy PCG64 seed, so the corpus (and the audit
  numbers recorded in BASELINE.md) reproduce bit-for-bit;
- schema identical to the shipped embeddings table
  (vec_id BIGINT, embedding FLOAT[], label INT = cluster id), one
  parquet file at .localdata/clustered_sf1/embeddings.parquet.

Usage:

    python tools/make_clustered_vectors.py
    python tools/ann_recall_audit.py /root/repo/.localdata/clustered_sf1

Results recorded in BASELINE.md ("ANN recall on clustered vectors").
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_VECTORS = 20_000
DIM = 64
N_CLUSTERS = 25
SIGMA = 0.35
SEED = 20260815

DST = os.environ.get(
    "SPARK_GRAFT_CLUSTERED_DST",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata",
        "clustered_sf1",
    ),
)


def cluster_sizes(n: int, k: int) -> list[int]:
    """Zipf-like sizes s_i ∝ 1/(i+1), exactly summing to n."""
    w = np.array([1.0 / (i + 1) for i in range(k)])
    raw = (w / w.sum()) * n
    sizes = np.floor(raw).astype(int)
    sizes[0] += n - sizes.sum()  # exact total
    return sizes.tolist()


def main() -> None:
    rng = np.random.default_rng(SEED)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    sizes = cluster_sizes(N_VECTORS, N_CLUSTERS)
    vecs = np.empty((N_VECTORS, DIM), dtype=np.float32)
    labels = np.empty(N_VECTORS, dtype=np.int32)
    pos = 0
    for k, s in enumerate(sizes):
        pts = centers[k] + SIGMA * rng.standard_normal((s, DIM))
        vecs[pos : pos + s] = pts.astype(np.float32)
        labels[pos : pos + s] = k
        pos += s

    # shuffle so vec_id carries no cluster information (queries 0..9
    # in the audit then hit a size-weighted mix of blobs)
    perm = rng.permutation(N_VECTORS)
    vecs, labels = vecs[perm], labels[perm]

    os.makedirs(DST, exist_ok=True)
    table = pa.table(
        {
            "vec_id": pa.array(range(N_VECTORS), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    out = os.path.join(DST, "embeddings.parquet")
    pq.write_table(table, out)
    print(
        f"wrote {N_VECTORS} x {DIM} clustered vectors "
        f"({N_CLUSTERS} Zipf blobs, sizes {sizes[:3]}...{sizes[-1]}) "
        f"-> {out}"
    )


if __name__ == "__main__":
    sys.exit(main())
