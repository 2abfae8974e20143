"""Distributed k-means clustering (Lloyd's algorithm), hash-verified.

Iterative ML on DataFrames, the clustering sibling of the PageRank
fixpoint (llm/dedup.py q_graph_pagerank): a fixed number of Lloyd
rounds over the embeddings table, each round = one broadcast of the
k-row centroid table + one argmin ranking + one element-wise
re-center aggregate — never a driver-side loop over vectors, never an
all-pairs stage.

INTEGER FIXED-POINT protocol (what makes an iterative float algorithm
hash-verifiable against an independent engine): embeddings live in
(−0.5, 0.5), so m_i = round((x_i + 2)·10⁶) maps every coordinate to a
POSITIVE bigint exactly reproducible in both engines (the double
(x+2)·10⁶ is the same IEEE value bit-for-bit from the same float32
input). Distances are exact integer sums of squares (≤ 64·10¹² —
well inside bigint), argmin ties break on centroid id, and the
re-centered mean is quantized back to the integer grid with
round-half-up spelled as (2·Σ + n) DIV (2n) — positive operands, so
Spark's truncating DIV and DuckDB's flooring // agree. After the
quantization, EVERY intermediate in both engines is an identical
integer, so three rounds later the cluster sizes, members, and
distances still hash-match exactly. (The same trick at 10⁻⁶
resolution is how the PageRank key makes 5 damped rounds exact; the
DSIR key applies it to log-ratios.)

100 TB story: the model state (k×64 ints) is broadcast — vectors
never shuffle for assignment (the BroadcastNestedLoopJoin against the
8-row centroid table is the intended plan, same class as q_knn_label's
broadcast probes); the re-center is an (c_id, dim) hash aggregate with
map-side combine, shuffle volume k·64 rows per round. Rounds are a
fixed small constant (Lloyd converges fast; production pipelines run
bounded rounds on a sample anyway — see similarity.ivf_fit_centroids
for the sample-fit variant this key generalizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_rc_spark.registry import register
from flink_rc_spark.sources.tables import load

K = 8
ROUNDS = 3  # assignment rounds; centroids update between them
DIM = 64

_QUANT_SPARK = (
    "transform(embedding, x -> CAST(ROUND((CAST(x AS DOUBLE) + 2.0D) * 1000000)"
    " AS BIGINT))"
)
_QUANT_DUCK = (
    "list_transform(embedding, x -> CAST(ROUND((CAST(x AS DOUBLE) + 2.0)"
    " * 1000000) AS BIGINT))"
)

_DIST_SPARK = (
    "aggregate(zip_with(m, cm, (a, b) -> (a - b) * (a - b)),"
    " 0L, (acc, x) -> acc + x)"
)
_DIST_DUCK = (
    f"list_sum(list_transform(range(1, {DIM + 1}),"
    " i -> (m[i] - cm[i]) * (m[i] - cm[i])))"
)


def kmeans_cte(k_sql: str | None = None) -> str:
    """Unrolled 3-round Lloyd as DuckDB CTE text (generated, not
    hand-kept: the round body is identical text per round). Ends with
    `assign{ROUNDS}` = (vec_id, m, c_id, dist) — the final cluster
    assignment. Shared by q_kmeans' oracle and the SemDeDup key.

    ``k_sql``: None keeps the fixed k={K} literal (q_kmeans' declared
    contract); otherwise a scalar SQL expression over `embeddings`
    computing k — the SemDeDup key passes a COUNT(*)-based formula so
    the cluster count scales with the corpus (both engines evaluate
    the same formula, so the oracle stays exact)."""
    if k_sql is None:
        seed = f"""
    cent0 AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS c_id,
               m AS cm
        FROM (SELECT vec_id, m FROM vec ORDER BY vec_id LIMIT {K})
    )"""
    else:
        seed = f"""
    kparam AS (SELECT {k_sql} AS kk FROM embeddings),
    cent0 AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS c_id,
               m AS cm
        FROM vec QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id)
                 <= (SELECT kk FROM kparam)
    )"""
    parts = [
        f"""
    vec AS (SELECT vec_id, {_QUANT_DUCK} AS m FROM embeddings),{seed}"""
    ]
    for r in range(1, ROUNDS + 1):
        prev = f"cent{r - 1}"
        parts.append(f"""
    assign{r} AS (
        SELECT vec_id, m, c_id, {_DIST_DUCK} AS dist
        FROM vec CROSS JOIN {prev}
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY {_DIST_DUCK}, c_id) = 1
    )""")
        if r < ROUNDS:
            parts.append(f"""
    stats{r} AS (
        SELECT c_id, i,
               (2 * SUM(m[i]) + COUNT(*)) // (2 * COUNT(*)) AS cv
        FROM assign{r}, range(1, {DIM + 1}) r(i)
        GROUP BY c_id, i
    ),
    newc{r} AS (
        SELECT c_id, list(cv ORDER BY i) AS cm FROM stats{r} GROUP BY c_id
    ),
    cent{r} AS (
        SELECT p.c_id, COALESCE(n.cm, p.cm) AS cm
        FROM cent{r - 1} p LEFT JOIN newc{r} n USING (c_id)
    )""")
    return ",".join(parts)


def _duck_oracle() -> str:
    return f"""WITH {kmeans_cte()}
    SELECT c_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MIN(vec_id) AS min_vec_id,
           CAST(SUM(dist) AS BIGINT) AS total_dist
    FROM assign{ROUNDS}
    GROUP BY c_id
    ORDER BY c_id"""


def _assign(vec: DataFrame, cent: DataFrame) -> DataFrame:
    """One Lloyd assignment: broadcast the k-row centroid table, exact
    integer distance, argmin with (dist, c_id) tie-break."""
    j = vec.crossJoin(F.broadcast(cent))
    j = j.withColumn("dist", F.expr(_DIST_SPARK))
    w = Window.partitionBy("vec_id").orderBy("dist", "c_id")
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "m", "c_id", "dist")
    )


def _recenter(assign: DataFrame, cent: DataFrame) -> DataFrame:
    """Element-wise integer-grid mean per cluster: explode dims, hash
    aggregate on (c_id, dim), re-assemble the sorted array; empty
    clusters keep their previous centroid (LEFT JOIN + COALESCE)."""
    dims = assign.select(
        "c_id", F.posexplode("m").alias("i", "v")
    )
    # exact round-half-up without float division: (2*s + n) DIV (2*n)
    stats = dims.groupBy("c_id", "i").agg(
        F.expr("(2 * SUM(v) + COUNT(*)) DIV (2 * COUNT(*))").alias("cv")
    )
    newc = stats.groupBy("c_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("i", "cv"))), lambda s: s["cv"]
        ).alias("cm_new")
    )
    return (
        cent.join(newc, "c_id", "left")
        .select("c_id", F.coalesce("cm_new", "cm").alias("cm"))
    )


def kmeans_assign(
    spark: SparkSession, sf_dir: str, k: int | None = None
) -> DataFrame:
    """The final Lloyd assignment (vec_id, m, c_id, dist) — the Spark
    twin of kmeans_cte()'s assign{ROUNDS}. Shared by q_kmeans (fixed
    k={K}) and the SemDeDup key (corpus-scaled k). ``k=None`` keeps
    the fixed default."""
    emb = load(spark, sf_dir, "embeddings")
    vec = emb.select("vec_id", F.expr(_QUANT_SPARK).alias("m")).localCheckpoint(
        eager=True
    )  # scanned once, probed every round
    w0 = Window.orderBy("vec_id")
    cent = (
        vec.orderBy("vec_id")
        .limit(K if k is None else k)
        .select(
            (F.row_number().over(w0) - 1).cast("bigint").alias("c_id"),
            F.col("m").alias("cm"),
        )
    )
    assign = None
    for r in range(1, ROUNDS + 1):
        assign = _assign(vec, cent)
        if r < ROUNDS:
            cent = _recenter(assign, cent).localCheckpoint(eager=True)
    return assign


@register(
    "q_kmeans",
    oracle=_duck_oracle(),
    tags=("llm", "ml", "iterative", "agg"),
)
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (k=8, 3 Lloyd rounds, deterministic
    lowest-vec_id seeding) over the embeddings table, INTEGER
    FIXED-POINT so every round hash-matches the unrolled SQL oracle:
    per-cluster member count, smallest member id, and the exact total
    within-cluster squared distance. See the module docstring for the
    quantization protocol and the 100 TB plan shape.
    """
    return (
        kmeans_assign(spark, sf_dir).groupBy("c_id")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.min("vec_id").alias("min_vec_id"),
            F.sum("dist").cast("bigint").alias("total_dist"),
        )
        .orderBy("c_id")
    )
