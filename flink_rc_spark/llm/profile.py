"""Corpus profiling & preparation operators (LLM-data wave, r2
additions): text normalization, vocabulary building, deterministic
train/val/test split assignment, and document-length histograms.

All four are the everyday first-pass jobs of a pretraining-data
pipeline; each is pure JVM built-ins with an exact DuckDB oracle
(regexes restricted to constructs with identical Java/RE2 semantics,
counts are integers, no float drift anywhere).

Scale: every query here is map + one hash aggregate on a small key
space (norm-hash dedup being the exception: its key count is the
distinct-document count, same as q_dedup_exact). Partial aggregation
keeps shuffles tiny; nothing leaves the JVM.

Reference parity: none — the reference is numeric-vector-only
(SURVEY.md §1.1); driver-north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_rc_spark.registry import register
from flink_rc_spark.sources.tables import load

# md5-derived uniform byte in [0,255] over the doc_id — the same
# deterministic-hash idiom as llm/sampling.py, reused for split
# assignment so splits are stable under any partitioning / re-ingest.
_SPLITV_SPARK = (
    "(instr('0123456789abcdef', substr(md5(cast(doc_id AS STRING)), 1, 1)) - 1) * 16"
    " + instr('0123456789abcdef', substr(md5(cast(doc_id AS STRING)), 2, 1)) - 1"
)
_SPLITV_DUCK = (
    "(strpos('0123456789abcdef', substr(md5(cast(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(md5(cast(doc_id AS VARCHAR)), 2, 1)) - 1"
)


@register(
    "q_text_normalize",
    oracle="""
    WITH norm AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm_text
        FROM documents
    )
    SELECT doc_id,
           md5(norm_text) AS norm_hash,
           CAST(len(norm_text) AS BIGINT) AS n_chars_norm,
           CAST(CASE WHEN len(norm_text) > 0 THEN
                len(string_split(norm_text, ' ')) ELSE 0 END AS BIGINT)
               AS n_tok_norm
    FROM norm
    ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization: lowercase, strip non-alphanumerics,
    collapse whitespace, trim — then fingerprint the normal form.

    The norm-hash is what a normalization-aware dedup keys on (catches
    case/punctuation-only duplicates that q_dedup_exact misses). Both
    regexes use constructs with identical Java/RE2 semantics; DuckDB
    needs the 'g' flag for replace-all, Spark replaces all by default.
    Scale: per-row map, no shuffle until the consumer aggregates.
    """
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return (
        docs.select("doc_id", norm.alias("norm_text"))
        .select(
            "doc_id",
            F.md5("norm_text").alias("norm_hash"),
            F.length("norm_text").cast("bigint").alias("n_chars_norm"),
            F.when(F.length("norm_text") > 0, F.size(F.split("norm_text", " ")))
            .otherwise(0)
            .cast("bigint")
            .alias("n_tok_norm"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_vocab_topk",
    oracle="""
    SELECT tok, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 50
    """,
    tags=("llm", "text"),
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-50 vocabulary by token frequency (tie-broken by token
    text so the cut is deterministic cross-engine).

    Scale: explode -> partial count per partition -> shuffle only
    (distinct-token, partial-count) pairs -> TakeOrdered(50). The
    shuffle carries the vocabulary, not the corpus; at 100 TB this is
    the standard first step of tokenizer training and stays agg-bound.
    """
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(50)
    )


@register(
    "q_split_assign",
    oracle=f"""
    WITH assigned AS (
        SELECT doc_id, n_chars,
               CASE WHEN ({_SPLITV_DUCK}) < 205 THEN 'train'
                    WHEN ({_SPLITV_DUCK}) < 230 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split,
           COUNT(*) AS n_docs,
           SUM(n_chars) AS total_chars,
           MIN(doc_id) AS first_doc
    FROM assigned
    GROUP BY split
    ORDER BY split
    """,
    tags=("llm", "sampling"),
)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test assignment by hashed
    doc_id (thresholds 205/25/26 out of 256) — stable under
    re-partitioning AND re-ingestion, unlike positional splits (the
    reference's R9 index-threshold split breaks when the corpus grows;
    this does not). Output: per-split doc/char totals.
    """
    docs = load(spark, sf_dir, "documents")
    v = F.expr(_SPLITV_SPARK)
    split = (
        F.when(v < 205, "train").when(v < 230, "val").otherwise("test")
    ).alias("split")
    return (
        docs.select(split, "doc_id", "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("split")
    )


@register(
    "q_doc_len_hist",
    oracle="""
    SELECT CAST(n_chars // 200 * 200 AS BIGINT) AS bin_start,
           COUNT(*) AS n_docs,
           SUM(len(string_split(text, ' '))) AS total_tokens
    FROM documents
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("llm", "text"),
)
def q_doc_len_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram (200-char bins) with per-bin token
    totals — the length-distribution profile used to pick truncation /
    packing parameters. Integer floor-div binning is identical in both
    engines. Scale: map + hash agg on a handful of bins.
    """
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            (F.floor(F.col("n_chars") / 200) * 200).cast("bigint").alias("bin_start"),
            F.size(F.split("text", " ")).alias("n_tok"),
        )
        .groupBy("bin_start")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("total_tokens"))
        .orderBy("bin_start")
    )
