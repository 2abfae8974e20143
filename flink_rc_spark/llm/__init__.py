"""LLM-training-data pipeline operators (SURVEY.md §2.4 + BASELINE.json
north star): text analysis, deduplication (exact → MinHash/SimHash/
Jaccard → embedding near-dup), similarity search (brute-force + LSH
ANN), UDF surface, and multimodal binary-column plumbing.

Importing this package registers every q_* key with the central
registry (flink_rc_spark.registry).
"""

from flink_rc_spark.llm import (  # noqa: F401
    audio,
    bpe,
    cluster,
    curation,
    dedup,
    multimodal,
    profile,
    sampling,
    similarity,
    text,
    udfs,
    video,
)
