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

from flink_rc_spark.plans.inspect import checkpoint
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
# The SAME integer distance as 64 FLAT squared-difference terms
# (int64 addition is exact/associative, so values are bit-identical
# either way). The r10 claim that this form beat the HOF on the fit
# was a count()-probe artifact: r11 noop-sink A/Bs measured the
# 64-term tree EQUAL at sf1 (10.5 vs 10.3 s fit) and 1.5-5x SLOWER
# everywhere else (q_kmeans 3.1 vs 2.0 s sf0.1, q_sample_coreset 5.4
# vs 3.8, q_ivf_pq_search 3.4 vs 2.3, semdedup pairs 18 vs 3.3 s at
# sf1) — a 64-term tree blows the whole-stage-codegen budget of its
# enclosing stage, and an INTERPRETED flat tree (per-node dispatch)
# is slower than the interpreted HOF fold. 16-term trees (PQ subdims,
# matryoshka prefix) stay under the budget and DO win — see
# similarity.py. Kept for the probe tools; no production consumer.
_DIST_SPARK_FLAT = " + ".join(
    f"(m[{i}] - cm[{i}]) * (m[{i}] - cm[{i}])" for i in range(DIM)
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
    """One Lloyd assignment, Arrow-vectorized: the k-row centroid
    table (k <= 64 by contract) is collected to the driver and
    shipped as a numpy closure constant; each vector batch computes
    exact int64 distances to ALL centroids with one matmul and takes
    the (dist, c_id)-lexicographic argmin.

    Exactness: |m-c|^2 = |m|^2 + |c|^2 - 2<m,c> term-by-term in
    int64 — quantized coords are <= ~2.6e6 (the +2.0 offset grid), so
    every intermediate is <= 64 * (2.6e6)^2 ~ 4.3e14 << 2^63; integer
    arithmetic is associative, so the expanded form equals the SQL
    fold bit-for-bit. Tie-break: centroid rows are sorted by c_id and
    np.argmin returns the FIRST minimum — exactly the oracle's
    ``ROW_NUMBER() OVER (ORDER BY dist, c_id) = 1``.

    Why not pure SQL: the k x dim per-row argmin is the one kernel
    the built-in surface cannot express efficiently — the broadcast
    crossJoin + HOF fold evaluates interpreted (~47 ns/element,
    3.9 s per round over 20k x 64 at sf1) and the 64-term flat unroll
    interprets even slower once it blows the stage's codegen budget
    (BASELINE.md r11). One vectorized matmul per Arrow batch is the
    shape Spark MLlib itself uses for k-means assignment.

    100 TB: vectors NEVER shuffle — the model rides to every
    partition as a k x dim closure constant (32 KB at the k=64
    contract cap) and each task streams its Arrow batches through
    one BLAS call; collecting the k-row centroid table is the same
    per-round driver round-trip the re-center update already makes.
    The collect also CUTS the plan lineage each round, so round r's
    plan never re-chains rounds 1..r-1."""
    import numpy as np
    import pandas as pd

    rows = cent.orderBy("c_id").collect()
    cids = np.array([r["c_id"] for r in rows], dtype=np.int64)
    cm = np.array([list(r["cm"]) for r in rows], dtype=np.int64)
    c2 = (cm * cm).sum(axis=1)

    def assign_batches(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.array([np.asarray(v) for v in pdf["m"]], dtype=np.int64)
            d = (m * m).sum(axis=1)[:, None] + c2[None, :] - 2 * (m @ cm.T)
            j = d.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "m": pdf["m"],
                    "c_id": cids[j],
                    "dist": d[np.arange(len(j)), j],
                }
            )

    return vec.mapInPandas(
        assign_batches,
        schema="vec_id bigint, m array<bigint>, c_id bigint, dist bigint",
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


def kmeans_rounds(
    spark: SparkSession, sf_dir: str, k: int | None = None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(vec, cent_final, assign): the quantized vectors, the centroid
    table the LAST assignment round used (cent{ROUNDS-1} in the
    oracle CTE), and the final assignment. Shared by kmeans_assign and
    the silhouette key (which needs per-vector distances to EVERY
    final centroid, not just the argmin)."""
    emb = load(spark, sf_dir, "embeddings")
    vec = emb.select("vec_id", F.expr(_QUANT_SPARK).alias("m")).transform(checkpoint, 
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
            cent = _recenter(assign, cent).transform(checkpoint, eager=True)
    # The final assignment is consumed more than once downstream
    # (semdedup's in-cluster SELF-join reads it on both sides; the
    # silhouette key probes it against every centroid). The old
    # window-argmin ended in an exchange those consumers could reuse;
    # the projection argmin has no exchange, so materialize it ONCE
    # here (lazy: persisted by the first job that touches it).
    return vec, cent, assign.transform(checkpoint, eager=False)


def kmeans_assign(
    spark: SparkSession, sf_dir: str, k: int | None = None
) -> DataFrame:
    """The final Lloyd assignment (vec_id, m, c_id, dist) — the Spark
    twin of kmeans_cte()'s assign{ROUNDS}. Shared by q_kmeans (fixed
    k={K}) and the SemDeDup key (corpus-scaled k). ``k=None`` keeps
    the fixed default."""
    return kmeans_rounds(spark, sf_dir, k)[2]


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


# ---------------------------------------------------------------------------
# q_embed_pca — first principal component by power iteration, hash-exact
# ---------------------------------------------------------------------------

PIT_ROUNDS = 12
_PIT_TARGET = 1 << 20  # rescale matvec results to ~2^20 between rounds


def _pca_rounds_cte() -> str:
    """Unrolled power iteration as DuckDB CTE text (generated — the
    round body is identical per round). Each round is one matvec over
    the 64x64 integer Gram plus an EXACT-FLOOR rescale: v' =
    floor(w / gg) with gg = max|w| // 2^20 + 1, spelled with the
    positive-offset trick (w + (ma // gg + 1) * gg) // gg -
    (ma // gg + 1) so the only divisions have positive numerators —
    where DuckDB's flooring // and Spark's truncating DIV (and
    Python's //) all agree. Every CTE is MATERIALIZED: DuckDB inlines
    plain CTEs, and 12 rounds each referencing gq + the previous v
    would otherwise expand the Gram subtree ~3^12 times (observed:
    fd exhaustion from re-opened parquet scans). Expects gq(d, e, g)
    and v0(d, v)."""
    parts = []
    for k in range(1, PIT_ROUNDS + 1):
        parts.append(f"""
    w{k} AS MATERIALIZED (
        SELECT gq.d, CAST(SUM(gq.g * v.v) AS BIGINT) AS w
        FROM gq JOIN v{k - 1} v ON gq.e = v.d GROUP BY gq.d
    ),
    m{k} AS MATERIALIZED (
        SELECT MAX(ABS(w)) AS ma,
               MAX(ABS(w)) // {_PIT_TARGET} + 1 AS gg
        FROM w{k}
    ),
    v{k} AS MATERIALIZED (
        SELECT d, (w + (ma // gg + 1) * gg) // gg - (ma // gg + 1) AS v
        FROM w{k}, m{k}
    )""")
    return ",".join(parts)


@register(
    "q_embed_pca",
    oracle=f"""
    WITH vec AS MATERIALIZED (SELECT vec_id, {_QUANT_DUCK} AS m FROM embeddings),
    nn AS (SELECT COUNT(*) AS n FROM vec),
    sums AS (SELECT r.i AS i, CAST(SUM(m[r.i]) AS BIGINT) AS s
             FROM vec CROSS JOIN range(1, {DIM + 1}) r(i) GROUP BY r.i),
    mu AS (SELECT i, s // (SELECT n FROM nn) AS mu FROM sums),
    cent AS MATERIALIZED (
        SELECT vec_id, r.i AS i, m[r.i] - mu.mu AS c
        FROM vec CROSS JOIN range(1, {DIM + 1}) r(i)
        JOIN mu ON mu.i = r.i
    ),
    gram AS MATERIALIZED (
        SELECT a.i AS d, b.i AS e, CAST(SUM(a.c * b.c) AS BIGINT) AS g
        FROM cent a JOIN cent b USING (vec_id) GROUP BY a.i, b.i
    ),
    gm AS (
        SELECT MAX(ABS(g)) AS ma,
               MAX(ABS(g)) // {_PIT_TARGET} + 1 AS gg
        FROM gram
    ),
    gq AS MATERIALIZED (
        SELECT d, e, (g + (ma // gg + 1) * gg) // gg - (ma // gg + 1) AS g
        FROM gram, gm
    ),
    v0 AS (SELECT r.i AS d, CAST(1 AS BIGINT) AS v
           FROM range(1, {DIM + 1}) r(i)),
    {_pca_rounds_cte()},
    nrm AS (SELECT SQRT(CAST(SUM(v * v) AS DOUBLE)) AS nv
            FROM v{PIT_ROUNDS})
    SELECT d AS dim, v AS v_fixed,
           CAST(v AS DOUBLE) / (SELECT nv FROM nrm) AS loading
    FROM v{PIT_ROUNDS}
    ORDER BY d
    """,
    tags=("llm", "ml", "linalg"),
)
def q_embed_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST PRINCIPAL COMPONENT of the embedding corpus — the
    dimensionality diagnostic (dominant direction + its loadings)
    every embedding pipeline runs before whitening, Matryoshka
    truncation, or drift monitoring.

    ARCHITECTURE — Gram-block + driver solve (the rc/readout.py R5
    pattern): the data-sized work is the 64x64 covariance Gram,
    computed distributed as an exploded outer-product aggregate
    (map-side combine caps shuffle volume at 4096 rows per task,
    independent of corpus size); the model-sized work — 12 rounds of
    power iteration on the 4096-entry Gram — runs on the driver, the
    same split FAISS uses for codebook fits. At 100 TB only the Gram
    agg grows; the driver never sees a vector. (A production variant
    computes per-partition numpy Grams via mapInPandas — fewer rows
    exploded; the relational spelling here is what the cross-engine
    hash can pin.)

    INTEGER FIXED-POINT, end-to-end exact: quantized coords (the
    q_kmeans grid), floor-mean centering mu = S DIV n (positive
    operands), integer Gram, then every power-iteration round rescales
    by gg = max|w| // 2^20 + 1 using exact floor division spelled with
    the positive-offset trick — DuckDB //, Spark DIV, and Python //
    all compute the identical integer, so after 12 rounds the
    eigenvector estimate (and its sign) is bit-identical in all three.
    The ONLY floats are the final sqrt + division, both correctly
    rounded IEEE on identical integer inputs. Top-eigenvalue gap on
    near-uniform synthetic data is small, so 12 rounds pin a
    DETERMINISTIC estimate rather than a converged one — the contract
    is the algorithm, hash-checked; convergence quality is asserted
    separately in tests (Rayleigh quotient must dominate the average
    eigenvalue).
    """
    emb = load(spark, sf_dir, "embeddings")
    vec = emb.select("vec_id", F.expr(_QUANT_SPARK).alias("m"))
    exploded = vec.select("vec_id", F.posexplode("m").alias("i0", "md"))
    mu_arr = (
        exploded.groupBy("i0")
        .agg(F.expr("SUM(md) DIV COUNT(*)").alias("mu"))
        .groupBy()
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("i0", "mu"))),
                lambda s: s["mu"],
            ).alias("mu_arr")
        )
    )
    centered = vec.crossJoin(F.broadcast(mu_arr)).select(
        F.expr("zip_with(m, mu_arr, (a, b) -> a - b)").alias("c")
    )
    pairs = centered.select(
        F.posexplode("c").alias("d0", "cd"), "c"
    ).select("d0", "cd", F.posexplode("c").alias("e0", "ce"))
    gram_rows = (
        pairs.groupBy("d0", "e0")
        .agg(F.sum(F.col("cd") * F.col("ce")).alias("g"))
        .collect()
    )
    # model-sized driver solve: exact Python ints mirror the bigint ops
    gram = {(r["d0"], r["e0"]): int(r["g"]) for r in gram_rows}
    ma = max(abs(g) for g in gram.values())
    gg = ma // _PIT_TARGET + 1
    gq = [
        [gram[(d, e)] // gg for e in range(DIM)] for d in range(DIM)
    ]
    v = [1] * DIM
    for _ in range(PIT_ROUNDS):
        w = [sum(gq[d][e] * v[e] for e in range(DIM)) for d in range(DIM)]
        wa = max(abs(x) for x in w)
        wg = wa // _PIT_TARGET + 1
        v = [x // wg for x in w]
    import math

    nv = math.sqrt(float(sum(x * x for x in v)))
    out = [(d + 1, v[d], float(v[d]) / nv) for d in range(DIM)]
    schema = "dim BIGINT, v_fixed BIGINT, loading DOUBLE"
    return spark.createDataFrame(out, schema).orderBy("dim")


@register(
    "q_embed_drift",
    oracle=f"""
    WITH vec AS MATERIALIZED (
        SELECT vec_id % 2 AS half, {_QUANT_DUCK} AS m FROM embeddings
    ),
    dims AS (
        SELECT half, r.i AS dim,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(m[r.i]) AS BIGINT) AS s,
               CAST(SUM(m[r.i] * m[r.i]) AS BIGINT) AS qq
        FROM vec CROSS JOIN range(1, {DIM + 1}) r(i)
        GROUP BY half, r.i
    ),
    sides AS (
        SELECT a.dim,
               a.s // a.n AS mean_a, b.s // b.n AS mean_b,
               a.n AS n_a, b.n AS n_b,
               CAST(a.n AS HUGEINT) * a.qq - CAST(a.s AS HUGEINT) * a.s
                 AS va_n2,
               CAST(b.n AS HUGEINT) * b.qq - CAST(b.s AS HUGEINT) * b.s
                 AS vb_n2
        FROM dims a JOIN dims b USING (dim)
        WHERE a.half = 0 AND b.half = 1
    )
    SELECT dim, mean_a, mean_b,
           mean_b - mean_a AS delta,
           CAST(ABS(mean_b - mean_a) AS DOUBLE)
             / SQRT((CAST(va_n2 AS DOUBLE) / n_a / n_a
                     + CAST(vb_n2 AS DOUBLE) / n_b / n_b) / 2 + 1.0)
             AS drift_z
    FROM sides
    ORDER BY dim
    """,
    tags=("llm", "ml", "monitoring"),
)
def q_embed_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING DRIFT MONITOR — per-dimension mean shift between two
    corpus snapshots (halves by vec_id parity here; in production,
    yesterday's batch vs today's): the check that catches a retrained
    or misconfigured encoder before it poisons dedup thresholds and
    ANN indexes downstream.

    Integer core per the registry policy: fixed-point coords (the
    q_kmeans grid), floor means s DIV n, and the variance NUMERATOR
    kept exact as n*SUM(q^2) - s^2 (no division). The only floats are
    the final standardized drift score — |delta| over the pooled
    per-dim std (+1 variance floor so an all-constant dim yields 0,
    not a div-by-zero) — identical single-expression arithmetic in
    both engines.

    100 TB: one hash agg keyed (half, dim) — 128 output rows
    regardless of corpus size, map-side combined; the join of the two
    halves is dim-keyed over 64 rows. Monitoring cost is one scan.
    """
    emb = load(spark, sf_dir, "embeddings")
    dims = (
        emb.select(
            (F.col("vec_id") % 2).alias("half"),
            F.posexplode(F.expr(_QUANT_SPARK)).alias("i0", "q"),
        )
        .groupBy("half", (F.col("i0") + 1).alias("dim"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("q").cast("bigint").alias("s"),
            F.sum(F.col("q") * F.col("q")).cast("bigint").alias("qq"),
        )
    )
    a = dims.filter(F.col("half") == 0).alias("a")
    b = dims.filter(F.col("half") == 1).alias("b")
    sides = a.join(b, F.col("a.dim") == F.col("b.dim")).select(
        F.col("a.dim").alias("dim"),
        F.expr("a.s DIV a.n").alias("mean_a"),
        F.expr("b.s DIV b.n").alias("mean_b"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        # DECIMAL(38,0) routing: n·Σq² and s² pass 9.2e18 once the
        # per-half row count reaches ~1e4 (q ≤ 2.5e6 on the +2-offset
        # grid) — the sf1 full-sweep caught the BIGINT overflow here
        F.expr(
            "CAST(a.n AS DECIMAL(20,0)) * a.qq"
            " - CAST(a.s AS DECIMAL(20,0)) * a.s"
        ).alias("va_n2"),
        F.expr(
            "CAST(b.n AS DECIMAL(20,0)) * b.qq"
            " - CAST(b.s AS DECIMAL(20,0)) * b.s"
        ).alias("vb_n2"),
    )
    delta = F.col("mean_b") - F.col("mean_a")
    drift = F.abs(delta).cast("double") / F.sqrt(
        (
            F.col("va_n2").cast("double") / F.col("n_a") / F.col("n_a")
            + F.col("vb_n2").cast("double") / F.col("n_b") / F.col("n_b")
        )
        / 2
        + 1.0
    )
    return sides.select(
        "dim",
        "mean_a",
        "mean_b",
        delta.alias("delta"),
        drift.alias("drift_z"),
    ).orderBy("dim")


# ---------------------------------------------------------------------------
# q_silhouette — simplified (centroid-based) silhouette per cluster
# ---------------------------------------------------------------------------

# s_micro = floor(1e6 * (b - a) / b) on exact integer squared
# distances (a = own-centroid, b = nearest-other; b >= a by argmin, so
# s in [0, 1e6)); 1e6*(b-a) tops BIGINT (dist <= 64e12), so the floor
# runs in DECIMAL via the mod-subtract identity (the q_kruskal_wallis
# precedent).
_SIL_MICRO = """
    CASE WHEN b > 0 THEN
        CAST(CAST((CAST(CAST(1000000 AS DECIMAL(19,0)) * (b - a)
                        AS DECIMAL(38,0))
                   - CAST(CAST(1000000 AS DECIMAL(19,0)) * (b - a)
                          AS DECIMAL(38,0)) % b) / b
             AS DECIMAL(38,0)) AS BIGINT)
    ELSE CAST(0 AS BIGINT) END
"""


def _silhouette_oracle() -> str:
    return f"""WITH {kmeans_cte()},
    alld AS (
        SELECT vec_id, c_id, {_DIST_DUCK} AS dist
        FROM vec CROSS JOIN cent{ROUNDS - 1}
    ),
    ranked AS (
        SELECT vec_id, c_id, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, c_id) AS rk
        FROM alld
    ),
    ab AS (
        SELECT r1.vec_id, r1.c_id AS own, r1.dist AS a, r2.dist AS b
        FROM ranked r1 JOIN ranked r2
          ON r1.vec_id = r2.vec_id AND r1.rk = 1 AND r2.rk = 2
    ),
    sm AS (SELECT own, {_SIL_MICRO} AS s_micro FROM ab)
    SELECT own AS c_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           ROUND(CAST(SUM(s_micro) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
               AS avg_silhouette
    FROM sm GROUP BY own ORDER BY c_id"""


@register(
    "q_silhouette",
    tags=("llm", "cluster", "ml"),
)
def q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette of the q_kmeans
    clustering: per vector, a = squared distance to its own (final)
    centroid, b = squared distance to the nearest OTHER centroid,
    s = (b - a)/b; reported as the per-cluster mean — the
    cluster-quality readout ML platforms print next to inertia
    (sklearn's silhouette on the centroid approximation; exact
    pairwise silhouette is O(n^2) and is precisely what a 100 TB
    deployment replaces with this form).

    Exactness: distances are the integer fixed-point grid of q_kmeans
    (hash-verified); s is micro-quantized by exact DECIMAL floor
    division, so the per-cluster mean is a ratio of exact integers.

    100 TB: ONE broadcast of the k-row centroid table against the
    vector scan (the q_kmeans assignment shape — vectors never
    shuffle), per-vector top-2 via a k-element in-row sort, then a
    k-row hash aggregate.
    """
    import numpy as np
    import pandas as pd

    vec, cent, _ = kmeans_rounds(spark, sf_dir)
    # Arrow-vectorized per-vector top-2 over the (tiny, collected)
    # centroid table — the _assign shape; the crossJoin + interpreted
    # HOF dist + collect_list sort it replaces was the key's dominant
    # cost. np.lexsort((c_id, dist)) reproduces the SQL
    # sort_array(struct(dist, c_id)) lexicographic tie-break exactly;
    # int64 expansion is exact at the grid's magnitudes (see _assign).
    rows = cent.orderBy("c_id").collect()
    cids = np.array([r["c_id"] for r in rows], dtype=np.int64)
    cm = np.array([list(r["cm"]) for r in rows], dtype=np.int64)
    c2 = (cm * cm).sum(axis=1)

    def top2_batches(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.array([np.asarray(v) for v in pdf["m"]], dtype=np.int64)
            d = (m * m).sum(axis=1)[:, None] + c2[None, :] - 2 * (m @ cm.T)
            # two smallest (dist, c_id) per row, exact lexicographic
            ordk = np.argsort(d, axis=1, kind="stable")  # ties -> lower idx = lower c_id
            i0, i1 = ordk[:, 0], ordk[:, 1]
            r_idx = np.arange(len(m))
            yield pd.DataFrame(
                {
                    "own": cids[i0],
                    "a": d[r_idx, i0],
                    "b": d[r_idx, i1],
                }
            )

    ab = vec.mapInPandas(
        top2_batches, schema="own bigint, a bigint, b bigint"
    )
    sm = ab.select("own", F.expr(_SIL_MICRO).alias("s_micro"))
    return (
        sm.groupBy("own")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.expr(
                "ROUND(CAST(SUM(s_micro) AS DOUBLE) / COUNT(*) / 1000000.0, 6)"
            ).alias("avg_silhouette"),
        )
        .select(F.col("own").alias("c_id"), "n_members", "avg_silhouette")
        .orderBy("c_id")
    )


from flink_rc_spark.registry import REGISTRY as _REG  # noqa: E402

_REG["q_silhouette"].oracle = _silhouette_oracle()
