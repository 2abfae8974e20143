"""LLM-wave scale probe: 10x documents/embeddings, same declared plans.

Validates empirically that the bucketed dedup/ANN designs scale like
their plan shapes promise before anyone claims 100 TB readiness:

- documents x10: each replica r prefixes every TOKEN with ``r{r}_`` so
  replicas share no shingles across replica blocks — the dup-cluster
  structure is preserved PER BLOCK and output volume scales ~10x (a
  naive copy would square the dup clusters and measure output
  explosion, not engine throughput).
- embeddings x10: replica vectors are scaled by (1 + r/1000), keeping
  each replica a near-neighbor of its original (cosine ~= 1) — the
  realistic hard case for ANN bucket occupancy (real corpora are full
  of near-dups).

Writes the synthesized tables to a temp dir shaped like an sf dir and
runs the REGISTERED builders against it, so what is timed is exactly
the declared plans. Results are recorded in BASELINE.md.

Usage: python tools/scale_probe_llm.py [replicas]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_rc_spark.registry import REGISTRY, load_all  # noqa: E402
from flink_rc_spark.session import get_spark  # noqa: E402
from flink_rc_spark.sources.tables import load  # noqa: E402

PROBE_KEYS = [
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_components",
    "q_dedup_simhash",
    "q_dedup_ngram_jaccard",
    "q_sim_ann_lsh",
    "q_contamination",
    "q_chunk_split",
    "q_vocab_topk",
    "q_text_normalize",
    # r5 wave
    "q_sketch_bloom",
    "q_tfidf_topk",
    "q_inverted_index",
    "q_embedding_pq",
    "q_sim_pq_topk",
    "q_graph_triangles",
    "q_bpe_merges",
    "q_curation_pipeline",
    # r6 wave
    "q_graph_pagerank",
    "q_bpe_encode",
    "q_sample_weighted",
    # r7 wave
    "q_graph_bfs",
    "q_cooccur_pmi",
    "q_dsir_weights",
    "q_winsorize",
    "q_kmeans",
    "q_graph_sssp",
]


def synthesize(spark, src_dir: str, out_dir: str, replicas: int) -> None:
    docs = load(spark, src_dir, "documents")
    parts = []
    for r in range(replicas):
        part = docs.select(
            (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
            F.concat_ws(
                " ",
                F.expr(f"transform(split(text, ' '), x -> concat('r{r}_', x))"),
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        parts.append(part)
    big_docs = parts[0]
    for p in parts[1:]:
        big_docs = big_docs.unionByName(p)
    big_docs.coalesce(8).write.mode("overwrite").parquet(f"{out_dir}/_documents")

    emb = load(spark, src_dir, "embeddings")
    eparts = []
    for r in range(replicas):
        eparts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"),
                F.expr(
                    f"transform(embedding, x -> CAST(x * (1.0 + {r} / 1000.0) AS FLOAT))"
                ).alias("embedding"),
                "label",
            )
        )
    big_emb = eparts[0]
    for p in eparts[1:]:
        big_emb = big_emb.unionByName(p)
    big_emb.coalesce(4).write.mode("overwrite").parquet(f"{out_dir}/_embeddings")

    # the loaders expect <table>.parquet paths; spark wrote directories,
    # which spark.read handles — link them under the expected names
    os.symlink(f"{out_dir}/_documents", f"{out_dir}/documents.parquet")
    os.symlink(f"{out_dir}/_embeddings", f"{out_dir}/embeddings.parquet")


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    spark = get_spark("llm_scale_probe")
    out_dir = tempfile.mkdtemp(prefix="llm_scale10_")
    synthesize(spark, src, out_dir, replicas)

    def run(key: str, sf_dir: str) -> tuple[float, int]:
        t0 = time.perf_counter()
        n = REGISTRY[key].builder(spark, sf_dir).count()
        return time.perf_counter() - t0, n

    for key in PROBE_KEYS:
        run(key, src)  # warm
        base_t, base_n = run(key, src)
        big_t, big_n = run(key, out_dir)
        print(
            f"{key:24s} 1x: {base_t:6.2f}s {base_n:>9d} rows   "
            f"{replicas}x: {big_t:6.2f}s {big_n:>9d} rows   "
            f"time x{big_t / base_t:4.1f}  rows x{big_n / max(base_n, 1):4.1f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
