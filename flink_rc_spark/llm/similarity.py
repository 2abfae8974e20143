"""Similarity search over the embeddings table (SURVEY.md §2.4).

Three operators: brute-force cosine top-k (the correctness baseline),
random-hyperplane LSH ANN (the 100 TB scale path), and k-NN label
prediction (the consumer of either candidate generator).

Cross-engine float determinism: embeddings are cast float -> double,
then every dot product / norm folds sequentially in index order
(Spark `aggregate` left fold == DuckDB `list_reduce` with a plain-sum
lambda), so both engines produce bit-identical doubles; ranking and
thresholding therefore agree exactly and ROUND(x, 4) is hash-stable.

LSH hyperplanes are derived from md5 — w[j][i] =
instr(hexdigits, first_hex_char(md5(j || '_' || i))) - 8.5 — i.e. a
deterministic pseudo-random value in [-7.5, 7.5] computable identically
in Spark and DuckDB with no external randomness and no literal blobs.

Reference parity: the reference's only vector math is the reservoir
matvec (SURVEY.md §2.1 R4); similarity search is beyond-reference
surface mandated by BASELINE.json.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_rc_spark.plans.inspect import checkpoint
from flink_rc_spark.registry import register
from flink_rc_spark.sources.tables import load

_DIM = 64
_N_PLANES = 8

# Kernel-spelling policy (r11, measured — BASELINE.md r11 section):
# the r10 blanket unroll of all vector kernels into flat arithmetic
# was built on a count()-probe artifact and regressed every consumer
# it touched with a 64-TERM tree. The r11 noop-sink A/Bs
# (tools/kernel_ab_probe.py + per-stage probes) show a clean
# tree-size threshold:
#
#  - 64-term flat trees LOSE everywhere (q_sim_cosine_topk 2.5 vs
#    1.7 s, semdedup pairs 18 vs 3.3 s sf1, q_ivf_pq_search 3.4 vs
#    2.3 s, Lloyd fit equal at sf1 / slower at sf0.1): the giant
#    generated method blows the enclosing stage's whole-stage-codegen
#    budget, and an INTERPRETED 64-node flat tree (per-node dispatch)
#    is slower than the interpreted HOF fold — plus each build pays
#    the big tree's Catalyst/Janino cost.
#  - 16-term flat trees WIN (PQ subspace ADC, matryoshka prefix:
#    q_sim_pq_topk 2.0 flat vs 3.0 HOF): small enough to codegen.
#
# So: _DOT_SPARK/_NORM_SPARK (the HOF fold) is THE full-dim kernel
# for every consumer; only the 16-term subspace kernels below are
# flat. Values are bit-identical either way: both fold in index
# order left-associatively, and the HOF's leading `0d +` is
# IEEE-exact (0.0 + x == x), so the repo's sequential-fold double
# policy — what the DuckDB oracles' list_reduce mirrors — is
# unchanged by the choice. The _FLAT forms are kept for the probe
# tools (no production consumer).
_DOT_FLAT = " + ".join(f"(ea[{i}] * eb[{i}])" for i in range(_DIM))
_NORM_FLAT = (
    "sqrt(" + " + ".join(f"(e[{i}] * e[{i}])" for i in range(_DIM)) + ")"
)
_DOT_HOF = "aggregate(zip_with(ea, eb, (x, y) -> x * y), 0d, (acc, x) -> acc + x)"
_NORM_HOF = "sqrt(aggregate(transform(e, x -> x*x), 0d, (acc, x) -> acc + x))"
_DOT_SPARK = _DOT_HOF
_NORM_SPARK = _NORM_HOF

_DOT_DUCK = (
    f"list_reduce(list_transform(range(1, {_DIM + 1}),"
    " i -> a.e[i] * b.e[i]), (acc, x) -> acc + x)"
)
_NORM_DUCK = "sqrt(list_reduce(list_transform(e, x -> x*x), (acc, x) -> acc + x))"

# Sign bit of <w_j, e> for md5-derived hyperplane j, where
# w[j][i] = hexval(md5(j||'_'||i)[0]) - 8.5 (an exact half in
# [-7.5, 7.5]). The oracle derives the weights in SQL; the Spark side
# inlines the identical values as literals (hashlib.md5 == SQL md5),
# turning 8 x 64 per-row md5 calls into a constant-folded codegen'd
# dot product — 11.5 s -> ~1 s at sf0.1. The +-chain is
# left-associative, matching DuckDB's sequential list_reduce fold, so
# doubles stay bit-identical.
_LSH_BIT_DUCK = (
    f"CASE WHEN list_reduce(list_transform(range(1, {_DIM + 1}), i ->"
    " (strpos('0123456789abcdef',"
    " substr(md5(CAST(j AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 1)) - 8.5)"
    " * e[i]), (acc, x) -> acc + x) >= 0 THEN 1 ELSE 0 END"
)


def _plane_weight(j: int, i: int) -> float:
    # strpos/instr are 1-based: hex value v maps to position v+1,
    # so the SQL's (strpos - 8.5) equals (v + 1) - 8.5 = v - 7.5.
    import hashlib

    return int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[0], 16) - 7.5


def _lsh_bit_spark(j: int) -> str:
    dot = " + ".join(
        f"({_plane_weight(j, i)}) * element_at(e, {i})" for i in range(1, _DIM + 1)
    )
    return f"CASE WHEN {dot} >= 0 THEN 1 ELSE 0 END"


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings with double-cast vector and precomputed norm."""
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"),
    ).withColumn("nrm", F.expr(_NORM_SPARK))


@register(
    "q_sim_cosine_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings WHERE vec_id < 200),
    n AS (SELECT vec_id, e, {_NORM_DUCK} AS nrm FROM v)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({_DOT_DUCK} / (a.nrm * b.nrm), 4) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    ORDER BY {_DOT_DUCK} / (a.nrm * b.nrm) DESC, vec_a, vec_b
    LIMIT 20
    """,
    tags=("llm", "similarity"),
)
def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-20 pairs within the vec_id < 200 block.

    The exactness baseline for ANN. Ranking happens on the raw
    (bit-identical) double; only the output column is rounded, so the
    top-k cut and tie order agree across engines. Scale: O(n^2) is the
    verify/baseline path only — q_sim_ann_lsh is the scale path; on a
    cluster the pair join is a block-nested product per id-range
    bucket, so work shards cleanly.
    """
    n = _vectors(spark, sf_dir).filter(F.col("vec_id") < 200)
    a = n.select(
        F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"), F.col("nrm").alias("na")
    )
    b = n.select(
        F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"), F.col("nrm").alias("nb")
    )
    cos = F.expr(_DOT_SPARK) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("_raw"))
        .orderBy(F.desc("_raw"), "vec_a", "vec_b")
        .limit(20)
        .select("vec_a", "vec_b", F.round("_raw", 4).alias("cosine"))
    )


@register(
    "q_sim_ann_lsh",
    oracle=f"""
    WITH v AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    n AS (SELECT vec_id, e, {_NORM_DUCK} AS nrm FROM v),
    h AS (SELECT vec_id, e, nrm,
                 CAST(list_sum(list_transform(range(0, {_N_PLANES}), j ->
                      ({_LSH_BIT_DUCK}) * CAST(power(2, j) AS BIGINT)))
                      AS BIGINT) AS bucket
          FROM n)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket,
           ROUND({_DOT_DUCK} / (a.nrm * b.nrm), 4) AS cosine
    FROM h a JOIN h b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ORDER BY {_DOT_DUCK} / (a.nrm * b.nrm) DESC, vec_a, vec_b
    LIMIT 50
    """,
    tags=("llm", "similarity"),
)
def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors via random-hyperplane (SimHash)
    LSH: 8 md5-derived hyperplanes -> 256 buckets; candidate pairs are
    generated only inside a bucket, then exact cosine ranks the top 50.

    This is the 100 TB path: the bucket id is a per-row map, and the
    only shuffle is an equi-join on the bucket key — candidate count
    scales with bucket occupancy (~n^2/2^planes per bucket), never
    global n^2. The fixed 8-plane/256-bucket fan-out here is the
    oracle-checked demo config; the tunable scale path is
    `ann_candidate_pairs` / `ann_topk` below (AND-OR banding: raise
    planes_per_band with n to bound bucket occupancy, raise n_bands to
    recover recall — recall measured, not guessed, by `ann_recall`,
    asserted in tests/test_llm.py). An IVF variant would replace the
    hyperplanes with k-means centroids but keep this exact plan shape
    (cluster-id equi-join).
    """
    n = _vectors(spark, sf_dir)
    bucket_expr = " + ".join(
        f"({_lsh_bit_spark(j)}) * {2 ** j}" for j in range(_N_PLANES)
    )
    h = n.withColumn("bucket", F.expr(bucket_expr).cast("bigint"))
    a = h.select(
        F.col("vec_id").alias("vec_a"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
        "bucket",
    )
    b = h.select(
        F.col("vec_id").alias("vec_b"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
        F.col("bucket").alias("bucket_b"),
    )
    cos = F.expr(_DOT_SPARK) / (F.col("na") * F.col("nb"))
    return (
        a.join(
            b,
            (F.col("bucket") == F.col("bucket_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b", "bucket", cos.alias("_raw"))
        .orderBy(F.desc("_raw"), "vec_a", "vec_b")
        .limit(50)
        .select("vec_a", "vec_b", "bucket", F.round("_raw", 4).alias("cosine"))
    )


def ivf_fit_centroids(
    spark: SparkSession,
    sf_dir: str,
    k: int = 16,
    sample_rows: int = 2048,
    iters: int = 10,
    seed: int = 7,
) -> np.ndarray:
    """IVF coarse quantizer: k-means centroids fit on a bounded sample.

    Planning-time step (same class as approxQuantile in
    prefix_agg_salted): the sample is capped at `sample_rows` so the
    driver-side numpy Lloyd iterations cost O(sample x k x dim)
    regardless of table size — at 100 TB you fit on a 100k-row sample
    and broadcast the centroids, exactly as FAISS trains IVF on a
    sample. Deterministic: fixed seed, fixed iteration count,
    deterministic sample (lowest vec_ids).
    """
    pdf = (
        _vectors(spark, sf_dir)
        .orderBy("vec_id")
        .limit(sample_rows)
        .select("e")
        .toPandas()
    )
    if len(pdf) == 0:
        raise ValueError("ivf_fit_centroids: vector table is empty — nothing to fit")
    x = np.vstack(pdf["e"].to_numpy())  # (n, 64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)  # cosine => unit sphere
    rng = np.random.default_rng(seed)
    # tiny tables: can't seed more centroids than distinct sample rows
    k = min(k, len(x))
    cent = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(iters):
        sims = x @ cent.T  # cosine against unit centroids
        assign = sims.argmax(axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / (np.linalg.norm(m) or 1.0)
    return cent


def _ivf_assign_udf(centroids: np.ndarray, n_probe: int):
    """pandas UDF: vector -> array of the `n_probe` nearest centroid
    ids (by cosine). The centroid matrix is closure-captured — tiny,
    shipped once per executor like a broadcast."""
    from pyspark.sql.pandas.functions import pandas_udf

    cent = centroids.copy()

    @pandas_udf("array<int>")
    def assign(e: pd.Series) -> pd.Series:
        mat = np.vstack(e.to_numpy())
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ cent.T  # (n, k)
        order = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    return assign


def ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 50,
    n_clusters: int = 16,
    n_probe: int = 2,
) -> DataFrame:
    """IVF approximate top-k cosine pairs — the k-means twin of the
    hyperplane path, same plan shape (cluster-id equi-join):

    1. fit centroids on a sample (ivf_fit_centroids, planning time);
    2. each row explodes into its `n_probe` nearest cluster ids
       (multi-probe recovers recall at cluster boundaries);
    3. candidates = equi-join on cluster id (slim id rows, no vector
       payload), exact cosine re-scores the survivors.

    Per-cluster occupancy is ~n/k so in-cluster pairs are
    O(n^2 * n_probe^2 / k); scale k with n to bound it — measured
    recall asserted in tests/test_llm.py alongside the LSH path.
    """
    cent = ivf_fit_centroids(spark, sf_dir, k=n_clusters)
    assign = _ivf_assign_udf(cent, n_probe)
    n = _vectors(spark, sf_dir)
    slim = n.select("vec_id", F.explode(assign(F.col("e"))).alias("cl"))
    a = slim.select(F.col("vec_id").alias("vec_a"), "cl")
    b = slim.select(F.col("vec_id").alias("vec_b"), "cl")
    cand = (
        a.join(b, "cl")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    av = n.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"),
                  F.col("nrm").alias("na"))
    bv = n.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"),
                  F.col("nrm").alias("nb"))
    cos = F.expr(_DOT_SPARK) / (F.col("na") * F.col("nb"))
    return (
        cand.join(av, "vec_a")
        .join(bv, "vec_b")
        .select("vec_a", "vec_b", cos.alias("_raw"))
        .orderBy(F.desc("_raw"), "vec_a", "vec_b")
        .limit(k)
        .select("vec_a", "vec_b", F.round("_raw", 4).alias("cosine"))
    )


def ivf_recall(
    spark: SparkSession,
    sf_dir: str,
    k: int = 50,
    n_clusters: int = 16,
    n_probe: int = 2,
    gt: set | None = None,
) -> float:
    """recall@k of IVF ANN vs brute-force ground truth (pass ``gt``
    to reuse one brute pass across configs — the audit-tool path)."""
    if gt is None:
        gt = {(r.vec_a, r.vec_b) for r in brute_topk(spark, sf_dir, k).collect()}
    got = {
        (r.vec_a, r.vec_b)
        for r in ivf_topk(spark, sf_dir, k, n_clusters, n_probe).collect()
    }
    return len(gt & got) / len(gt)


def _band_buckets_udf(planes_per_band: int, n_bands: int):
    """Vectorized (Arrow/numpy) per-row band-bucket codes.

    Returns a pandas UDF mapping the double vector column to an
    array<bigint> of length n_bands (bucket code per band). Planes are
    numbered globally (band * planes_per_band + j), all md5-derived as
    in `_plane_weight`, so any (planes_per_band, n_bands) config is
    deterministic and engine-independent.

    Why not flat codegen like q_sim_ann_lsh: a banded config is
    planes_per_band * n_bands hyperplanes; beyond ~48 planes the
    literal sum exceeds the JVM's 64 KB method limit, janino fails,
    and Spark falls back to INTERPRETED projection — the known 23x
    cliff. One numpy matmul per Arrow batch ((rows, 64) @ (64, P))
    stays vectorized at any plane count, which is exactly the
    sanctioned use of the pandas-UDF slow path.
    """
    from pyspark.sql.pandas.functions import pandas_udf

    total = planes_per_band * n_bands
    w = np.array(
        [[_plane_weight(g, i) for i in range(1, _DIM + 1)] for g in range(total)]
    )  # (P, 64)
    powers = (2 ** np.arange(planes_per_band)).astype(np.int64)

    @pandas_udf("array<bigint>")
    def band_codes(e: pd.Series) -> pd.Series:
        mat = np.vstack(e.to_numpy())  # (n, 64)
        # Sequential left fold over the dimension index, NOT a matmul:
        # acc_{g} = ((0 + w_g1*e_1) + w_g2*e_2) + ... reproduces DuckDB's
        # list_reduce fold bit-exactly (IEEE addition is deterministic
        # given order; BLAS matmul order is unspecified and a near-zero
        # dot could sign-flip vs the SQL fold). This is what makes
        # q_dedup_embedding_full exact-oracle-able. Cost: 64 vectorized
        # (rows x planes) fused adds per Arrow batch — still no Python
        # per-row loop, but ~64x the memory traffic of one BLAS GEMM.
        # A deployment WITHOUT a cross-engine-hash requirement should
        # flip this loop back to `acc = mat @ w.T`: same buckets except
        # for dots within float-ulp of the 0 boundary, at GEMM speed.
        acc = np.zeros((mat.shape[0], total))
        for i in range(_DIM):
            acc += mat[:, i, None] * w[None, :, i]
        bits = (acc >= 0).astype(np.int64)  # (n, P)
        codes = np.stack(
            [
                bits[:, b * planes_per_band : (b + 1) * planes_per_band] @ powers
                for b in range(n_bands)
            ],
            axis=1,
        )  # (n, n_bands)
        return pd.Series(list(codes))

    return band_codes


def ann_candidate_pairs(
    spark: SparkSession,
    sf_dir: str,
    planes_per_band: int = 4,
    n_bands: int = 16,
) -> DataFrame:
    """AND-OR banded LSH candidate generation (the tunable 100 TB path).

    AND within a band: a pair collides only if all `planes_per_band`
    sign bits agree — more planes => smaller buckets => fewer, better
    candidates (bounds the per-bucket quadratic blowup as n grows).
    OR across bands: a pair is a candidate if it collides in ANY band —
    more bands => higher recall. Tune (planes_per_band, n_bands) so
    per-bucket occupancy stays O(n / 2^planes) while recall meets
    target; measure with `ann_recall` below, never guess.

    Plan shape: explode each row into n_bands slim (band, bucket,
    vec_id) tuples — no vectors carried — equi-join on (band, bucket),
    then distinct id pairs. One shuffle on the band-bucket key; the
    vector payload is re-attached only for surviving candidates (see
    ann_topk), so shuffle bytes scale with ids, not 64-double arrays.

    Data realism note (measured, see tests/test_llm.py): the synthetic
    embeddings are near-uniform — the global top-50 pairs sit at cosine
    0.43-0.51 (~64 deg), where per-plane sign agreement is only ~0.65.
    That is the worst case for hyperplane LSH, so the defaults here are
    few-planes/many-bands (4x16). On a real near-dup corpus (cosine
    >= 0.9, agreement >= 0.9/plane) the same machinery runs 8+ planes
    per band for ~2^8 x more pruning at equal recall.
    """
    n = _vectors(spark, sf_dir)
    codes = _band_buckets_udf(planes_per_band, n_bands)
    slim = n.select(
        "vec_id", F.posexplode(codes(F.col("e"))).alias("band", "bkt")
    )
    a = slim.select(F.col("vec_id").alias("vec_a"), "band", "bkt")
    b = slim.select(F.col("vec_id").alias("vec_b"), "band", "bkt")
    return (
        a.join(b, ["band", "bkt"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )


def ann_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 50,
    planes_per_band: int = 4,
    n_bands: int = 16,
) -> DataFrame:
    """Banded-LSH approximate top-k cosine pairs: candidates from
    ann_candidate_pairs, exact cosine re-scoring on the survivors."""
    cand = ann_candidate_pairs(spark, sf_dir, planes_per_band, n_bands)
    n = _vectors(spark, sf_dir)
    a = n.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"),
                 F.col("nrm").alias("na"))
    b = n.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"),
                 F.col("nrm").alias("nb"))
    cos = F.expr(_DOT_SPARK) / (F.col("na") * F.col("nb"))
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .select("vec_a", "vec_b", cos.alias("_raw"))
        .orderBy(F.desc("_raw"), "vec_a", "vec_b")
        .limit(k)
        .select("vec_a", "vec_b", F.round("_raw", 4).alias("cosine"))
    )


def brute_topk(spark: SparkSession, sf_dir: str, k: int = 50) -> DataFrame:
    """Exact top-k cosine pairs over the FULL table — ground truth for
    recall measurement (O(n^2); measurement harness only). The probe
    side is repartitioned to the session parallelism: the nested-loop
    stream side otherwise inherits the parquet read's handful of
    partitions and serializes the O(n^2) pass (measured 4 tasks on 32
    cores at sf1)."""
    n = _vectors(spark, sf_dir)
    a = n.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"),
        F.col("nrm").alias("na"))
    b = n.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"),
                 F.col("nrm").alias("nb"))
    cos = F.expr(_DOT_SPARK) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("_raw"))
        .orderBy(F.desc("_raw"), "vec_a", "vec_b")
        .limit(k)
        .select("vec_a", "vec_b", F.round("_raw", 4).alias("cosine"))
    )


def ann_recall(
    spark: SparkSession,
    sf_dir: str,
    k: int = 50,
    planes_per_band: int = 4,
    n_bands: int = 16,
    gt: set | None = None,
) -> float:
    """recall@k of banded-LSH ANN vs brute-force ground truth (pass
    ``gt`` to reuse one brute pass across configs)."""
    if gt is None:
        gt = {(r.vec_a, r.vec_b) for r in brute_topk(spark, sf_dir, k).collect()}
    got = {
        (r.vec_a, r.vec_b)
        for r in ann_topk(spark, sf_dir, k, planes_per_band, n_bands).collect()
    }
    return len(gt & got) / len(gt)


def bucket_occupancy(
    spark: SparkSession,
    sf_dir: str,
    planes_per_band: int = 4,
    n_bands: int = 16,
) -> dict:
    """Occupancy stats for the band buckets — the quantity that decides
    whether in-bucket pair generation stays sub-quadratic. Returns
    {n_rows, n_buckets, max, p99ish, mean} over non-empty buckets."""
    n = _vectors(spark, sf_dir)
    codes = _band_buckets_udf(planes_per_band, n_bands)
    occ = (
        n.select("vec_id", F.posexplode(codes(F.col("e"))).alias("band", "bkt"))
        .groupBy("band", "bkt")
        .agg(F.count("*").alias("c"))
    )
    row = occ.agg(
        F.sum("c").alias("rows"),
        F.count("*").alias("buckets"),
        F.max("c").alias("mx"),
        F.expr("percentile_approx(c, 0.99)").alias("p99"),
        F.avg("c").alias("mean"),
    ).first()
    return {
        "n_rows": row["rows"],
        "n_buckets": row["buckets"],
        "max": row["mx"],
        "p99": row["p99"],
        "mean": float(row["mean"]),
    }


_BANDED_PPB = 8    # planes per band (AND) — precise buckets, n/2^8 occupancy
_BANDED_NB = 16    # bands (OR)
_BANDED_TAU = 0.35

# DuckDB twin of _band_buckets_udf's 8x16 banded LSH + bucket-anchor
# canonicalization: the 128 global hyperplanes are md5-derived exactly
# as _plane_weight, materialized ONCE as 64-element weight lists, and
# each per-(row, plane) dot is a sequential list_reduce left fold —
# bit-identical to the UDF's sequential accumulation, so the sign
# bits, band buckets, per-bucket anchors, and the >= tau verify all
# agree exactly.
_BANDED_ORACLE = f"""
    WITH v AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    n AS (SELECT vec_id, e, {_NORM_DUCK} AS nrm FROM v),
    w AS (
        SELECT g,
               list(strpos('0123456789abcdef',
                     substr(md5(CAST(g AS VARCHAR) || '_' || CAST(i AS VARCHAR)),
                            1, 1)) - 8.5 ORDER BY i) AS wv
        FROM range(0, {_BANDED_PPB * _BANDED_NB}) t1(g),
             range(1, {_DIM + 1}) t2(i)
        GROUP BY g
    ),
    bits AS (
        SELECT n.vec_id, w.g,
               CASE WHEN list_reduce(
                        list_transform(range(1, {_DIM + 1}),
                                       i -> w.wv[i] * n.e[i]),
                        (acc, x) -> acc + x) >= 0
                    THEN 1 ELSE 0 END AS bit
        FROM n, w
    ),
    slim AS (
        SELECT vec_id,
               CAST(g // {_BANDED_PPB} AS INT) AS band,
               CAST(SUM(bit * CAST(power(2, g % {_BANDED_PPB}) AS BIGINT))
                    AS BIGINT) AS bkt
        FROM bits GROUP BY vec_id, g // {_BANDED_PPB}
    ),
    anch AS (
        SELECT band, bkt, MIN(vec_id) AS vec_a FROM slim GROUP BY band, bkt
    ),
    cand AS (
        SELECT DISTINCT s.vec_id AS vec_b, a.vec_a
        FROM slim s JOIN anch a ON s.band = a.band AND s.bkt = a.bkt
        WHERE s.vec_id > a.vec_a
    ),
    ver AS (
        SELECT c.vec_b, c.vec_a, {_DOT_DUCK} / (a.nrm * b.nrm) AS cos
        FROM cand c
        JOIN n a ON a.vec_id = c.vec_a
        JOIN n b ON b.vec_id = c.vec_b
        WHERE {_DOT_DUCK} / (a.nrm * b.nrm) >= {_BANDED_TAU}
    )
    SELECT vec_b AS vec_id, vec_a AS dup_of, ROUND(cos, 4) AS cosine
    FROM (SELECT vec_b, vec_a, cos,
                 ROW_NUMBER() OVER (PARTITION BY vec_b ORDER BY vec_a) AS rn
          FROM ver)
    WHERE rn = 1
    ORDER BY vec_id
    """


def embedding_canonical_dedup(
    n: DataFrame,
    planes_per_band: int = _BANDED_PPB,
    n_bands: int = _BANDED_NB,
    tau: float = _BANDED_TAU,
) -> DataFrame:
    """Bucket-anchor canonical near-dup assignment over a prepared
    (vec_id, e, nrm) frame — the OUTPUT-BOUNDED kernel behind
    q_dedup_embedding_full (and the planted-duplicate recall test).

    Per (band, bucket) the ANCHOR is the bucket's min vec_id (one
    map-side-combinable hash agg — no window over bucket members, so
    no single-task hot bucket at scale); candidates are
    (member, anchor) with member > anchor — at most n_bands per
    vector, O(n·bands) TOTAL regardless of duplication skew, which is
    what removes the r6 pair-emission quadratic (28x at 10x data).
    Survivors of the exact cosine >= tau verify collapse to one row
    per duplicate vector: dup_of = the smallest verified anchor.
    """
    codes = _band_buckets_udf(planes_per_band, n_bands)
    slim = n.select(
        "vec_id", F.posexplode(codes(F.col("e"))).alias("band", "bkt")
    )
    anch = slim.groupBy("band", "bkt").agg(F.min("vec_id").alias("vec_a"))
    cand = (
        slim.join(anch, ["band", "bkt"])
        .filter(F.col("vec_id") > F.col("vec_a"))
        .select(F.col("vec_id").alias("vec_b"), "vec_a")
        .distinct()
    )
    a = n.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"),
                 F.col("nrm").alias("na"))
    b = n.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"),
                 F.col("nrm").alias("nb"))
    cos = F.expr(_DOT_SPARK) / (F.col("na") * F.col("nb"))
    ver = (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .select("vec_b", "vec_a", cos.alias("_raw"))
        .filter(F.col("_raw") >= tau)
    )
    w = Window.partitionBy("vec_b").orderBy("vec_a")
    return (
        ver.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("vec_b").alias("vec_id"),
            F.col("vec_a").alias("dup_of"),
            F.round("_raw", 4).alias("cosine"),
        )
        .orderBy("vec_id")
    )


@register("q_dedup_embedding_full", oracle=_BANDED_ORACLE, tags=("llm", "dedup"))
def q_dedup_embedding_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-TABLE embedding near-dup CANONICALIZATION (cosine >= 0.35):
    8x16 banded-LSH buckets, per-bucket min-id anchor, exact cosine
    verify member-vs-anchor, one (vec_id, dup_of, cosine) row per
    duplicate vector — the bounded-output production shape (r7 rework
    of the r5 all-pairs emission, which measured 28x wall at 10x data
    because pair volume inside duplicate clusters grows
    quadratically; any all-qualifying-pairs contract is Omega(output)
    and at a 100 TB duplicated crawl that job never finishes).

    Candidate volume is <= n_bands per vector BY CONSTRUCTION
    (member pairs only with its bucket's anchor), so candidates,
    verify work, and output are all O(n·bands) no matter how heavy
    the duplication — the quadratic is gone structurally, not tuned
    away. Anchors come from one map-side-combinable MIN agg (no
    window over bucket members -> no hot-bucket straggler task).

    Exact-oracled end-to-end: band-bucket codes are md5-deterministic
    (_plane_weight) and every dot is a sequential left fold on BOTH
    sides (pandas UDF accumulates dimension-by-dimension; the oracle
    uses list_reduce over once-materialized weight lists), so buckets,
    anchors, the verified set, and the min-anchor choice hash-match
    DuckDB exactly.

    Recall contract (measured, not assumed): on planted duplicate
    clusters — the workload this key exists for — a copy collides
    with its source in >=1 of 16 bands w.p. ~1 and the 8-plane
    buckets are precise enough that the anchor is a genuine
    cluster-mate: planted-copy recall = 1.0
    (tests/test_llm.py::test_dedup_embedding_full_planted_recall).
    On the synthetic near-uniform corpus at tau = 0.35 the
    brute-force threshold graph is a dense random graph (~40% of
    vectors have SOME qualifying partner); a bounded-output canonical
    pass intentionally does not enumerate that graph — pairs-recall
    against it is the r5 contract this key no longer makes (the
    block-scoped exact q_dedup_embedding remains the pair-emission
    baseline; q_dedup_semdedup is the cluster-scoped alternative).
    """
    return embedding_canonical_dedup(_vectors(spark, sf_dir))


@register(
    "q_knn_label",
    oracle=f"""
    WITH v AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    n AS (SELECT vec_id, label, e, {_NORM_DUCK} AS nrm FROM v),
    scored AS (
        SELECT a.vec_id AS qid, a.label AS true_label,
               b.vec_id AS cid, b.label AS clabel,
               {_DOT_DUCK} / (a.nrm * b.nrm) AS cos,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY {_DOT_DUCK} / (a.nrm * b.nrm) DESC, b.vec_id) AS rn
        FROM n a JOIN n b ON b.vec_id >= 10
        WHERE a.vec_id < 10
    ),
    votes AS (
        SELECT qid, true_label, clabel, COUNT(*) AS cnt
        FROM scored WHERE rn <= 5
        GROUP BY qid, true_label, clabel
    ),
    ranked AS (
        SELECT qid, true_label, clabel AS pred_label,
               ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY cnt DESC, clabel) AS vr
        FROM votes
    )
    SELECT qid AS vec_id, true_label, pred_label
    FROM ranked WHERE vr = 1
    ORDER BY vec_id
    """,
    tags=("llm", "similarity"),
)
def q_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN (k=5) majority-label prediction for query vectors
    vec_id < 10 against the rest of the table.

    Neighbors rank on the raw bit-identical cosine with vec_id
    tiebreak; majority vote tiebreaks on (count desc, label). Scale:
    the query side is tiny -> broadcast it; per-candidate work is one
    fused dot product, the top-k is a per-query window (partial
    top-k per partition under AQE), and the vote is a k-row agg.
    """
    n = _vectors(spark, sf_dir)
    q = n.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    c = n.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("clabel"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    cos = (F.expr(_DOT_SPARK) / (F.col("na") * F.col("nb"))).alias("cos")
    scored = F.broadcast(q).join(c).select("qid", "true_label", "cid", "clabel", cos)
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), "cid")
    top = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    votes = top.groupBy("qid", "true_label", "clabel").agg(F.count("*").alias("cnt"))
    vw = Window.partitionBy("qid").orderBy(F.desc("cnt"), "clabel")
    return (
        votes.withColumn("vr", F.row_number().over(vw))
        .filter(F.col("vr") == 1)
        .select(
            F.col("qid").alias("vec_id"),
            "true_label",
            F.col("clabel").alias("pred_label"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# q_embedding_pq — product quantization with an EXACT oracle
# ---------------------------------------------------------------------------

_PQ_SUBS = 8          # subspaces (64 dims / 8 per subspace)
_PQ_SUBDIM = _DIM // _PQ_SUBS
_PQ_K = 16            # centroids per subspace (4-bit codes)

# squared L2 distance between a vector's subspace slice and a centroid's,
# UNROLLED into {_PQ_SUBDIM} flat terms — SMALL trees like this stay
# inside the stage's codegen budget and genuinely win (r11 A/B:
# q_sim_pq_topk 2.0 s flat vs 3.0 s HOF, q_embedding_pq 1.1 vs 1.9;
# the 64-term full-dim trees are the ones that lose — see the kernel
# note at the top). Same index order + left associativity, so the
# value is bit-identical to the sequential fold the DuckDB oracle
# mirrors; the (a-b) term is spelled twice because DuckDB lambdas
# have no LET and ** / ^ power operators differ between engines
_PQ_DIST_SPARK = " + ".join(
    f"((element_at(e, s * {_PQ_SUBDIM} + {i})"
    f" - element_at(ce, s * {_PQ_SUBDIM} + {i}))"
    f" * (element_at(e, s * {_PQ_SUBDIM} + {i})"
    f" - element_at(ce, s * {_PQ_SUBDIM} + {i})))"
    for i in range(1, _PQ_SUBDIM + 1)
)
_PQ_DIST_DUCK = (
    f"list_reduce(list_transform(range(1, {_PQ_SUBDIM + 1}), i ->"
    f" (p.e[p.s * {_PQ_SUBDIM} + i] - c.ce[p.s * {_PQ_SUBDIM} + i])"
    f" * (p.e[p.s * {_PQ_SUBDIM} + i] - c.ce[p.s * {_PQ_SUBDIM} + i])),"
    " (acc, x) -> acc + x)"
)


@register(
    "q_embedding_pq",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    vs AS (
        SELECT vec_id, e, CAST(s AS INT) AS s
        FROM v, range({_PQ_SUBS}) r(s)
    ),
    ranked AS (
        SELECT s, vec_id, e,
               ROW_NUMBER() OVER (
                   PARTITION BY s
                   ORDER BY md5(CAST(s AS VARCHAR) || '#' || CAST(vec_id AS VARCHAR)),
                            vec_id
               ) AS rnk
        FROM vs
    ),
    cents AS (
        SELECT s, CAST(rnk - 1 AS INT) AS code, e AS ce
        FROM ranked WHERE rnk <= {_PQ_K}
    ),
    dists AS (
        SELECT p.vec_id, p.s, c.code, {_PQ_DIST_DUCK} AS d
        FROM vs p JOIN cents c ON c.s = p.s
    )
    SELECT vec_id, s AS subspace, code, ROUND(d, 4) AS sq_dist
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY vec_id, s ORDER BY d, code
        ) AS rn
        FROM dists
    )
    WHERE rn = 1
    ORDER BY vec_id, subspace
    """,
    tags=("llm", "similarity", "ann"),
)
def q_embedding_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: each 64-dim vector compresses to 8
    4-bit codes — the nearest of 16 per-subspace centroids for each
    8-dim slice. The IVF-PQ pair is how billion-vector ANN indexes
    (FAISS-style) fit in memory: IVF (ivf_fit/ivf_topk above) prunes
    the search space, PQ shrinks the residual distance table ~64x.

    The "training" is deterministic sampling: subspace s's 16
    centroids are the vectors ranked first by md5(s#vec_id) — a
    reproducible stand-in for k-means (the IVF twin shows the
    sample-fit k-means path) that keeps the whole operator
    exact-oracle-checkable. Assignment is a broadcast join of the
    128-row codebook against (vector × subspace) rows; the argmin is
    a bounded 16-candidate window with code-ordered tie-break; the
    distance fold is sequential in both engines, so even the double
    sq_dist hash-matches post-round.

    100 TB: codebook is O(K × dim) regardless of corpus size —
    broadcast; assignment is an embarrassingly parallel map (no
    shuffle beyond the argmin window's (vec, subspace) partitioning,
    which AQE plans as a local window after the broadcast join since
    the input is already vec-partitioned).
    """
    assigned = _pq_assign(spark, sf_dir)
    return assigned.select(
        "vec_id",
        F.col("s").alias("subspace"),
        "code",
        F.round("d", 4).alias("sq_dist"),
    ).orderBy("vec_id", "subspace")


# ---------------------------------------------------------------------------
# q_ivf_pq_search — IVF probe -> PQ ADC re-rank, the composed
# billion-vector ANN shape (FAISS IVFADC), with an EXACT oracle
# ---------------------------------------------------------------------------

_IVF_K = 8         # coarse cells
_IVF_PROBE = 4     # cells probed per query
_IVF_ROUNDS = 2    # Lloyd rounds fitting the coarse quantizer
_IVFPQ_REFINE = 150   # FLOOR of the exact-refine shortlist
_IVFPQ_REFINE_DIV = 20  # shortlist scales as max(floor, n_vectors/20):
# ADC rank noise with 16-centroid subquantizers spreads proportionally
# to the candidate count, so a CONSTANT shortlist decays with corpus
# growth (measured at sf1: 150 -> recall@5 0.32, n/20=1000 -> 0.60+;
# tools/ann_recall_audit.py) while a constant FRACTION holds it.
_IVFPQ_TOPK = 5    # results per query

# md5-ranked seeding expression (a deterministic pseudo-random sample,
# identical text in both engines)
_IVF_SEED_DUCK = "md5('ivf#' || CAST(vec_id AS VARCHAR))"


def _ivf_coarse_cte() -> str:
    """Unrolled fitted coarse quantizer as DuckDB CTE text: integer
    fixed-point Lloyd (the q_kmeans protocol — see llm/cluster.py's
    module docstring for why every intermediate is an identical
    integer in both engines), seeded from an md5-ranked sample,
    ending in `home` (every vector's nearest fitted cell) and
    `probes` (each query's {_IVF_PROBE} nearest cells)."""
    from flink_rc_spark.llm.cluster import _DIST_DUCK as _IDIST_DUCK
    from flink_rc_spark.llm.cluster import _QUANT_DUCK

    parts = [
        f"""
    vq AS (SELECT vec_id, {_QUANT_DUCK} AS m FROM embeddings),
    icent0 AS (
        SELECT CAST(ROW_NUMBER() OVER (
                   ORDER BY {_IVF_SEED_DUCK}, vec_id) - 1 AS BIGINT) AS c_id,
               m AS cm
        FROM vq QUALIFY ROW_NUMBER() OVER (
                   ORDER BY {_IVF_SEED_DUCK}, vec_id) <= {_IVF_K}
    )"""
    ]
    for r in range(1, _IVF_ROUNDS + 1):
        parts.append(f"""
    iasg{r} AS (
        SELECT vec_id, m, c_id
        FROM vq CROSS JOIN icent{r - 1}
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY {_IDIST_DUCK}, c_id) = 1
    ),
    istats{r} AS (
        SELECT c_id, i,
               (2 * SUM(m[i]) + COUNT(*)) // (2 * COUNT(*)) AS cv
        FROM iasg{r}, range(1, {_DIM + 1}) r(i)
        GROUP BY c_id, i
    ),
    inewc{r} AS (
        SELECT c_id, list(cv ORDER BY i) AS cm FROM istats{r} GROUP BY c_id
    ),
    icent{r} AS (
        SELECT p.c_id, COALESCE(n.cm, p.cm) AS cm
        FROM icent{r - 1} p LEFT JOIN inewc{r} n USING (c_id)
    )""")
    parts.append(f"""
    home AS (
        SELECT vec_id, CAST(c_id AS INT) AS cell
        FROM vq CROSS JOIN icent{_IVF_ROUNDS}
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY {_IDIST_DUCK}, c_id) = 1
    ),
    probes AS (
        SELECT vec_id AS qid, CAST(c_id AS INT) AS cell
        FROM vq CROSS JOIN icent{_IVF_ROUNDS}
        WHERE vec_id < 10
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY {_IDIST_DUCK}, c_id) <= {_IVF_PROBE}
    )""")
    return ",".join(parts)


# fitted-PQ integer subspace distance (columns ms = vector slice,
# cs = centroid slice, both on the 1e6 fixed-point grid) — exact
# bigint sum of squares, order-independent, so no fold policy needed;
# unrolled flat for whole-stage codegen (the HOF fold is interpreted)
_PQI_DIST_SPARK = " + ".join(
    f"((ms[{i}] - cs[{i}]) * (ms[{i}] - cs[{i}]))"
    for i in range(_PQ_SUBDIM)
)
_PQI_DIST_DUCK = (
    f"list_sum(list_transform(range(1, {_PQ_SUBDIM + 1}),"
    " i -> (ms[i] - cs[i]) * (ms[i] - cs[i])))"
)


def _pq_fit_cte() -> str:
    """Unrolled FITTED product-quantizer as DuckDB CTE text: per
    subspace, {_PQ_K} centroids fit with {_IVF_ROUNDS} integer
    fixed-point Lloyd rounds (md5-ranked per-subspace seeds), ending
    in `codes` (every vector's per-subspace code) and `adc` (each
    query's integer distance table to every fitted centroid). All
    distances live on the 1e6 fixed-point grid, so assignment,
    ADC sums, and ties are exact bigints in both engines."""
    parts = [
        f"""
    sub AS (
        SELECT vec_id, CAST(s AS INT) AS s,
               m[s * {_PQ_SUBDIM} + 1 : s * {_PQ_SUBDIM} + {_PQ_SUBDIM}] AS ms
        FROM vq, range({_PQ_SUBS}) r(s)
    ),
    pcent0 AS (
        SELECT s, CAST(ROW_NUMBER() OVER (
                   PARTITION BY s
                   ORDER BY md5('pq#' || CAST(s AS VARCHAR) || '#'
                                      || CAST(vec_id AS VARCHAR)), vec_id
               ) - 1 AS INT) AS code,
               ms AS cs
        FROM sub QUALIFY ROW_NUMBER() OVER (
                   PARTITION BY s
                   ORDER BY md5('pq#' || CAST(s AS VARCHAR) || '#'
                                      || CAST(vec_id AS VARCHAR)), vec_id
               ) <= {_PQ_K}
    )"""
    ]
    for r in range(1, _IVF_ROUNDS + 1):
        parts.append(f"""
    pasg{r} AS (
        SELECT vec_id, s, ms, code
        FROM sub JOIN pcent{r - 1} USING (s)
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                   ORDER BY {_PQI_DIST_DUCK}, code) = 1
    ),
    pstats{r} AS (
        SELECT s, code, i,
               (2 * SUM(ms[i]) + COUNT(*)) // (2 * COUNT(*)) AS cv
        FROM pasg{r}, range(1, {_PQ_SUBDIM + 1}) r(i)
        GROUP BY s, code, i
    ),
    pnewc{r} AS (
        SELECT s, code, list(cv ORDER BY i) AS cs
        FROM pstats{r} GROUP BY s, code
    ),
    pcent{r} AS (
        SELECT p.s, p.code, COALESCE(n.cs, p.cs) AS cs
        FROM pcent{r - 1} p
        LEFT JOIN pnewc{r} n ON n.s = p.s AND n.code = p.code
    )""")
    parts.append(f"""
    codes AS (
        SELECT vec_id, s, code
        FROM sub JOIN pcent{_IVF_ROUNDS} USING (s)
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                   ORDER BY {_PQI_DIST_DUCK}, code) = 1
    ),
    adc AS (
        SELECT vec_id AS qid, s, code, {_PQI_DIST_DUCK} AS d
        FROM sub JOIN pcent{_IVF_ROUNDS} USING (s)
        WHERE vec_id < 10
    )""")
    return ",".join(parts)

# Fitted IVF centroids + PQ codebook memoized per (sf_dir,
# embeddings.parquet mtime) — the q_bpe_merges cache precedent
# (llm/bpe.py): the Lloyd fits are INDEX-BUILD work a production
# system runs once per corpus version, not per query, so re-fitting
# inside every invocation (as r6 did) double-charged every search
# ~2 s of amortizable cost. Values are plain Python rows (8 + 128 of
# them — k-row model collects, driver-safe); the mtime key
# invalidates on data regeneration.
_IVFPQ_FIT_CACHE: dict[tuple[str, float], tuple[list, list]] = {}


def _ivf_pq_fit(spark: SparkSession, sf_dir: str) -> tuple[list, list]:
    """Fit (and memoize) the coarse quantizer and PQ codebook:
    _IVF_ROUNDS integer fixed-point Lloyd rounds each (the q_kmeans
    protocol, llm/cluster.py) from md5-ranked seed samples. Returns
    (cent_rows, pcent_rows): [(c_id, cm)], [(s, code, cs)] on the 1e6
    integer grid — every intermediate is an identical bigint in both
    engines, so cached rows are exactly what a re-fit would produce."""
    import os

    from flink_rc_spark.llm.cluster import (
        _QUANT_SPARK,
        _assign,
        _recenter,
    )

    path = os.path.join(sf_dir, "embeddings.parquet")
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = 0.0
    key = (sf_dir.rstrip("/"), mtime)
    if key in _IVFPQ_FIT_CACHE:
        return _IVFPQ_FIT_CACHE[key]

    # coarse quantizer: md5-ranked sample seeds (limit-first
    # TakeOrdered pulls the _IVF_K rows; the cell-id ranking window
    # then runs over only those K rows), then _IVF_ROUNDS rounds —
    # scanned-once vec is checkpointed and probed every round, the
    # k-row centroid table broadcasts
    vec = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_QUANT_SPARK).alias("m")
    ).transform(checkpoint, eager=True)
    smp = F.md5(F.concat(F.lit("ivf#"), F.col("vec_id").cast("string")))
    w_seed = Window.orderBy(smp, "vec_id")
    cent = (
        vec.orderBy(smp, "vec_id")
        .limit(_IVF_K)
        .withColumn("rnk", F.row_number().over(w_seed))
        .select(
            (F.col("rnk") - 1).cast("bigint").alias("c_id"),
            F.col("m").alias("cm"),
        )
    )
    for _ in range(_IVF_ROUNDS):
        asg = _assign(vec, cent)
        cent = _recenter(asg, cent).transform(checkpoint, eager=True)

    # product quantizer: per-subspace integer fixed-point Lloyd (same
    # rounds / seeding style as the coarse fit)
    sub = vec.crossJoin(
        F.broadcast(
            spark.range(_PQ_SUBS).select(F.col("id").cast("int").alias("s"))
        )
    ).select(
        "vec_id",
        "s",
        F.expr(f"slice(m, s * {_PQ_SUBDIM} + 1, {_PQ_SUBDIM})").alias("ms"),
    ).transform(checkpoint, eager=True)  # probed every fit round
    pseed = F.md5(
        F.concat(
            F.lit("pq#"),
            F.col("s").cast("string"),
            F.lit("#"),
            F.col("vec_id").cast("string"),
        )
    )
    w_pseed = Window.partitionBy("s").orderBy(pseed, "vec_id")
    pcent = (
        sub.withColumn("rnk", F.row_number().over(w_pseed))
        .filter(F.col("rnk") <= _PQ_K)
        .select(
            "s",
            (F.col("rnk") - 1).cast("int").alias("code"),
            F.col("ms").alias("cs"),
        )
    )
    w_pasg = Window.partitionBy("vec_id", "s").orderBy("d", "code")
    for _ in range(_IVF_ROUNDS):
        pasg = (
            sub.join(F.broadcast(pcent), "s")
            .withColumn("d", F.expr(_PQI_DIST_SPARK))
            .withColumn("rn", F.row_number().over(w_pasg))
            .filter(F.col("rn") == 1)
            .select("vec_id", "s", "ms", "code")
        )
        pstats = pasg.select(
            "s", "code", F.posexplode("ms").alias("i", "ve")
        ).groupBy("s", "code", "i").agg(
            F.expr("(2 * SUM(ve) + COUNT(*)) DIV (2 * COUNT(*))").alias("cv")
        )
        pnewc = pstats.groupBy("s", "code").agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("i", "cv"))),
                lambda x: x["cv"],
            ).alias("cs_new")
        )
        pcent = (
            pcent.join(pnewc, ["s", "code"], "left")
            .select("s", "code", F.coalesce("cs_new", "cs").alias("cs"))
            .transform(checkpoint, eager=True)
        )
    cent_rows = [
        (int(r["c_id"]), [int(x) for x in r["cm"]]) for r in cent.collect()
    ]
    pcent_rows = [
        (int(r["s"]), int(r["code"]), [int(x) for x in r["cs"]])
        for r in pcent.collect()
    ]
    _IVFPQ_FIT_CACHE[key] = (cent_rows, pcent_rows)
    return cent_rows, pcent_rows


# full-vector squared L2 between aliased columns e and ce, as the
# engine-parity sequential left fold. HOF spelling: the r11 noop A/B
# measured the 64-term flat unroll SLOWER on q_ivf_pq_search at both
# SFs (3.4 vs 2.3 s sf0.1) — 64-term trees overflow the enclosing
# stage's codegen budget and interpret worse than the HOF fold
# (16-term trees like _PQ_DIST_* are under it and stay flat).
_L2_FULL_SPARK = (
    f"aggregate(transform(sequence(1, {_DIM}), i ->"
    " (element_at(e, i) - element_at(ce, i))"
    " * (element_at(e, i) - element_at(ce, i))),"
    " 0d, (acc, x) -> acc + x)"
)
_L2_FULL_DUCK = (
    f"list_reduce(list_transform(range(1, {_DIM + 1}), i ->"
    " (v.e[i] - c.ce[i]) * (v.e[i] - c.ce[i])),"
    " (acc, x) -> acc + x)"
)


@register(
    "q_ivf_pq_search",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    -- FITTED coarse quantizer: {_IVF_K} centroids, {_IVF_ROUNDS}
    -- integer fixed-point Lloyd rounds from an md5-ranked seed sample
    -- (the q_kmeans protocol), ending in home + probes cells
    {_ivf_coarse_cte()},
    -- FITTED product quantizer: {_PQ_K} centroids x {_PQ_SUBS}
    -- subspaces, {_IVF_ROUNDS} integer fixed-point Lloyd rounds on
    -- the 1e6 grid, ending in codes + the per-query integer ADC table
    {_pq_fit_cte()},
    -- candidates: vectors homed in a probed cell (self excluded),
    -- scored by the sum of per-subspace ADC lookups over the
    -- candidate's codes — exact bigint sums, no fold policy needed
    scored AS (
        SELECT pr.qid, h.vec_id AS cand_id,
               CAST(SUM(a.d) AS BIGINT) AS dist
        FROM probes pr
        JOIN home h ON h.cell = pr.cell AND h.vec_id <> pr.qid
        JOIN codes k ON k.vec_id = h.vec_id
        JOIN adc a ON a.qid = pr.qid AND a.s = k.s AND a.code = k.code
        GROUP BY pr.qid, h.vec_id
    ),
    -- refine: the ADC top-{_IVFPQ_REFINE} shortlist re-ranked by the
    -- EXACT full-vector distance (the FAISS IVFPQR pattern — raw
    -- vectors touched only for the shortlist)
    shortlist AS (
        SELECT qid, cand_id, dist AS adc_dist,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY dist, cand_id) AS arn
        FROM scored QUALIFY arn <= GREATEST({_IVFPQ_REFINE},
            (SELECT COUNT(*) FROM embeddings) // {_IVFPQ_REFINE_DIV})
    ),
    refined AS (
        SELECT s.qid, s.cand_id, s.adc_dist, {_L2_FULL_DUCK} AS exact_d
        FROM shortlist s
        JOIN v ON v.vec_id = s.qid
        JOIN (SELECT vec_id, e AS ce FROM v) c ON c.vec_id = s.cand_id
    )
    SELECT qid AS vec_id, CAST(rn AS INT) AS rank, cand_id,
           ROUND(exact_d, 4) AS l2_dist, CAST(adc_dist AS BIGINT) AS adc_dist
    FROM (
        SELECT qid, cand_id, exact_d, adc_dist,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY exact_d, cand_id) AS rn
        FROM refined
    ) WHERE rn <= {_IVFPQ_TOPK}
    ORDER BY vec_id, rank
    """,
    tags=("llm", "similarity", "ann"),
)
def q_ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF x PQ composed ANN search (the FAISS IVFPQR shape): a coarse
    inverted-file quantizer prunes the corpus to the query's 4 nearest
    of 8 cells, asymmetric-distance (ADC) scoring ranks the survivors
    from their 8x4-bit PQ codes, and the corpus-scaled ADC
    shortlist (max(150, n/20) rows) is re-ranked by the exact
    full-vector distance — per-query work drops
    from O(n * dim) to O(n_probe/k_cells * n * subspaces) table
    lookups plus the shortlist's exact distances, which is how billion-vector
    indexes answer queries without touching raw vectors except for the
    final refine.

    BOTH quantizers are FITTED (r6 rework; r5 shipped md5-sample
    stand-ins with recall@5 0.24-0.46): the coarse quantizer and the
    per-subspace PQ codebook each run _IVF_ROUNDS integer fixed-point
    Lloyd rounds (the q_kmeans protocol, llm/cluster.py) from
    md5-ranked seed samples. Fitted cells balance occupancy and
    capture ~0.70-0.74 of true neighbors at 4/8 probes; the trained
    corpus-scaled integer-ADC shortlist (max(150, n/20), exact-
    refined) keeps most of that — measured end recall@5 0.60-0.70
    at sf0.01-sf0.1 and 0.60 at sf1 (20k decorrelated vectors;
    tools/ann_recall_audit.py — a CONSTANT 150 decayed to 0.32 there) (tests/test_llm.py::test_ivf_pq_recall,
    bound 0.5), on near-uniform vectors that are the documented ANN
    worst case.

    Exactly oracled end-to-end: both fits are integer fixed-point
    (every Lloyd intermediate is an identical bigint in both
    engines), code assignment and the ADC table live on the same
    integer grid so the ADC sum is an exact bigint (order-free — no
    fold policy needed), the final refine's double distance is a
    sequential left fold, and every argmin/top-k tiebreaks on the
    id — so the candidate sets, scores, and final ranking are
    bit-identical in DuckDB.

    The fit is INDEX-BUILD work and amortizes like one: r7 moved both
    Lloyd fits behind the mtime-keyed _IVFPQ_FIT_CACHE (the
    q_bpe_merges precedent), so repeated searches pay only the query
    path — recall is unchanged by construction (the cached rows ARE
    the fit's exact integer output).

    100 TB: the coarse fit is q_kmeans' plan (k x dim integer state
    broadcast per round, re-center is a map-side-combined hash agg);
    fitted centroids and PQ codebook are O(k x dim) broadcasts;
    home-cell assignment and code assignment are embarrassingly
    parallel maps done ONCE at index-build; a query touches only the
    probed cells' posting lists (here a cell equi-join), and the ADC
    lookup table is 128 floats per query. Recall vs brute force is
    measured, not assumed — tests/test_llm.py::test_ivf_pq_recall.
    """
    from pyspark.sql import Window

    from flink_rc_spark.llm.cluster import (
        _DIST_SPARK as _IDIST_SPARK,  # HOF fold: 64-term flat loses (r11 A/B)
        _QUANT_SPARK,
    )

    v = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"),
    )
    # fitted quantizers from the mtime-keyed index-build cache — the
    # search below is the per-query work; the fit amortizes across
    # invocations exactly as a deployed index does
    cent_rows, pcent_rows = _ivf_pq_fit(spark, sf_dir)
    cent = spark.createDataFrame(cent_rows, "c_id bigint, cm array<bigint>")
    pcent = spark.createDataFrame(pcent_rows, "s int, code int, cs array<bigint>")
    vec = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_QUANT_SPARK).alias("m")
    )
    dist_to_cell = vec.crossJoin(F.broadcast(cent)).withColumn(
        "d", F.expr(_IDIST_SPARK)
    )
    w_vec = Window.partitionBy("vec_id").orderBy("d", "c_id")
    cell = F.col("c_id").cast("int").alias("cell")
    home = (
        dist_to_cell.withColumn("rn", F.row_number().over(w_vec))
        .filter(F.col("rn") == 1)
        .select("vec_id", cell)
    )
    probes = (
        dist_to_cell.filter(F.col("vec_id") < 10)
        .withColumn("rn", F.row_number().over(w_vec))
        .filter(F.col("rn") <= _IVF_PROBE)
        .select(F.col("vec_id").alias("qid"), cell)
    )
    # code assignment + per-query ADC table against the CACHED fitted
    # codebook; every distance, assignment, and ADC sum is an exact
    # bigint on the 1e6 grid
    sub = vec.crossJoin(
        F.broadcast(
            spark.range(_PQ_SUBS).select(F.col("id").cast("int").alias("s"))
        )
    ).select(
        "vec_id",
        "s",
        F.expr(f"slice(m, s * {_PQ_SUBDIM} + 1, {_PQ_SUBDIM})").alias("ms"),
    )
    w_pasg = Window.partitionBy("vec_id", "s").orderBy("d", "code")
    fitted = sub.join(F.broadcast(pcent), "s").withColumn(
        "d", F.expr(_PQI_DIST_SPARK)
    )
    codes = (
        fitted.withColumn("rn", F.row_number().over(w_pasg))
        .filter(F.col("rn") == 1)
        .select("vec_id", "s", "code")
    )
    adc = fitted.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), "s", "code", "d"
    )
    scored = (
        probes.join(home, "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .join(codes, "vec_id")
        .join(adc, ["qid", "s", "code"])
        .groupBy("qid", F.col("vec_id").alias("cand_id"))
        .agg(F.sum("d").cast("long").alias("dist"))
    )
    w_adc = Window.partitionBy("qid").orderBy("dist", "cand_id")
    # corpus-scaled exact-refine shortlist (see _IVFPQ_REFINE_DIV):
    # the count is a parquet-metadata read, and both engines compute
    # the identical integer
    n_vec = load(spark, sf_dir, "embeddings").count()
    refine = max(_IVFPQ_REFINE, n_vec // _IVFPQ_REFINE_DIV)
    shortlist = (
        scored.withColumn("arn", F.row_number().over(w_adc))
        .filter(F.col("arn") <= refine)
        .select("qid", "cand_id", F.col("dist").alias("adc_dist"))
    )
    qe = v.select(F.col("vec_id").alias("qid"), "e")
    ce = v.select(F.col("vec_id").alias("cand_id"), F.col("e").alias("ce"))
    refined = (
        shortlist.join(qe, "qid")
        .join(ce, "cand_id")
        .withColumn("exact_d", F.expr(_L2_FULL_SPARK))
    )
    w_top = Window.partitionBy("qid").orderBy("exact_d", "cand_id")
    return (
        refined.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= _IVFPQ_TOPK)
        .select(
            F.col("qid").alias("vec_id"),
            F.col("rn").cast("int").alias("rank"),
            "cand_id",
            F.round("exact_d", 4).alias("l2_dist"),
            F.col("adc_dist").cast("long").alias("adc_dist"),
        )
        .orderBy("vec_id", "rank")
    )


def _pq_codebook(spark: SparkSession, sf_dir: str):
    """(vs, cents): the per-(vector, subspace) rows and the 128-row
    deterministic codebook (subspace s's 16 centroids = the vectors
    ranked first by md5(s#vec_id))."""
    from pyspark.sql import Window

    v = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"),
    )
    subs = F.array(*[F.lit(s) for s in range(_PQ_SUBS)])
    vs = v.select("vec_id", "e", F.explode(subs).alias("s"))
    w_rank = Window.partitionBy("s").orderBy(
        F.md5(F.concat_ws("#", F.col("s").cast("string"), F.col("vec_id").cast("string"))),
        "vec_id",
    )
    cents = (
        vs.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= _PQ_K)
        .select("s", (F.col("rnk") - 1).cast("int").alias("code"), F.col("e").alias("ce"))
    )
    return vs, cents


def _pq_assign(spark: SparkSession, sf_dir: str):
    """Per-(vector, subspace) nearest-centroid assignment:
    (vec_id, s, code, d) with code-ordered argmin tie-break."""
    from pyspark.sql import Window

    vs, cents = _pq_codebook(spark, sf_dir)
    dists = vs.join(F.broadcast(cents), "s").withColumn(
        "d", F.expr(_PQ_DIST_SPARK)
    )
    w_min = Window.partitionBy("vec_id", "s").orderBy("d", "code")
    return (
        dists.withColumn("rn", F.row_number().over(w_min))
        .filter(F.col("rn") == 1)
        .select("vec_id", "s", "code", "d")
    )


_PQ_QDIST_DUCK = _PQ_DIST_DUCK.replace("p.e[", "q.e[").replace("p.s ", "c.s ")


@register(
    "q_sim_pq_topk",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    vs AS (
        SELECT vec_id, e, CAST(s AS INT) AS s
        FROM v, range({_PQ_SUBS}) r(s)
    ),
    ranked AS (
        SELECT s, vec_id, e,
               ROW_NUMBER() OVER (
                   PARTITION BY s
                   ORDER BY md5(CAST(s AS VARCHAR) || '#' || CAST(vec_id AS VARCHAR)),
                            vec_id
               ) AS rnk
        FROM vs
    ),
    cents AS (
        SELECT s, CAST(rnk - 1 AS INT) AS code, e AS ce
        FROM ranked WHERE rnk <= {_PQ_K}
    ),
    dists AS (
        SELECT p.vec_id, p.s, c.code, {_PQ_DIST_DUCK} AS d
        FROM vs p JOIN cents c ON c.s = p.s
    ),
    codes AS (
        SELECT vec_id, s, code FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id, s ORDER BY d, code) AS rn
            FROM dists
        ) WHERE rn = 1
    ),
    vcodes AS (
        SELECT vec_id, list(code ORDER BY s) AS codes
        FROM codes GROUP BY vec_id
    ),
    queries AS (SELECT vec_id AS qid, e FROM v WHERE vec_id < 10),
    qd AS (
        SELECT q.qid, c.s, c.code, {_PQ_QDIST_DUCK} AS dq
        FROM queries q CROSS JOIN cents c
    ),
    qflat AS (
        SELECT qid, list(dq ORDER BY s, code) AS flat
        FROM qd GROUP BY qid
    ),
    adc AS (
        SELECT q.qid, vc.vec_id,
               list_reduce(
                   list_transform(range(0, {_PQ_SUBS}),
                       s -> q.flat[s * {_PQ_K} + vc.codes[s + 1] + 1]),
                   (acc, x) -> acc + x) AS adc_d
        FROM vcodes vc CROSS JOIN qflat q
    )
    SELECT qid, vec_id, ROUND(adc_d, 4) AS adc
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY qid ORDER BY adc_d, vec_id) AS rn
        FROM adc
    )
    WHERE rn <= 10
    ORDER BY qid, adc_d, vec_id
    """,
    tags=("llm", "similarity", "ann"),
)
def q_sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-10 search — the query-side
    half of an IVF-PQ index: each query precomputes its 8×16 distance
    table against the codebook ONCE (1,280 doubles), and every
    database vector is then scored by EIGHT table lookups on its
    4-bit codes instead of a 64-dim float computation. That lookup
    asymmetry is why PQ search scales: per-vector work is O(subspaces),
    independent of dimension.

    Everything stays deterministic (md5-sampled codebook, sequential
    per-subspace distance folds, fold-ordered ADC sum s=0..7), so even
    this approximate search carries an EXACT oracle; recall vs the
    true L2 top-10 is measured separately in tests — approximation
    quality and implementation correctness are separate claims.

    100 TB: the per-query distance table is broadcast (10 queries ×
    128 cells); the codes table is the only fact-sized input (8 codes
    per vector); scoring is an embarrassingly parallel map + bounded
    per-query top-k window.
    """
    from pyspark.sql import Window

    vs, cents = _pq_codebook(spark, sf_dir)
    codes = _pq_assign(spark, sf_dir)
    vcodes = codes.groupBy("vec_id").agg(
        F.expr("transform(sort_array(collect_list(struct(s, code))), x -> x.code)")
        .alias("codes")
    )
    queries = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("qid"),
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"),
        )
    )
    qd = queries.crossJoin(F.broadcast(cents)).withColumn(
        "dq", F.expr(_PQ_DIST_SPARK.replace("element_at(e,", "element_at(e,"))
    )
    qflat = qd.groupBy("qid").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(s, code, dq))), x -> x.dq)"
        ).alias("flat")
    )
    adc = vcodes.crossJoin(F.broadcast(qflat)).withColumn(
        "adc_d",
        F.expr(
            f"aggregate(sequence(0, {_PQ_SUBS - 1}), 0d, (acc, s) ->"
            f" acc + element_at(flat, s * {_PQ_K} + element_at(codes, s + 1) + 1))"
        ),
    )
    w = Window.partitionBy("qid").orderBy("adc_d", "vec_id")
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("qid", "vec_id", F.round("adc_d", 4).alias("adc"))
        .orderBy("qid", "adc_d", "vec_id")
    )


@register(
    "q_sim_ann_filtered",
    oracle=f"""
    WITH v AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    n AS (SELECT vec_id, label, e, {_NORM_DUCK} AS nrm FROM v),
    bits AS (SELECT vec_id, label, e, nrm,
                    list_transform(range(0, {_N_PLANES}),
                                   j -> {_LSH_BIT_DUCK}) AS b
             FROM n),
    bands AS (SELECT vec_id, label, e, nrm, bd AS band_id,
                     b[2 * bd + 1] * 2 + b[2 * bd + 2] AS code
              FROM bits, range({_N_PLANES // 2}) r(bd)),
    cand AS (
        SELECT DISTINCT a.vec_id AS qid, a.label AS qlabel,
               b.vec_id AS vec_id
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id
         AND a.code = b.code
         AND a.label = b.label
         AND a.vec_id <> b.vec_id
        WHERE a.vec_id < 10
    ),
    scored AS (
        SELECT c.qid, c.qlabel, c.vec_id,
               {_DOT_DUCK} / (a.nrm * b.nrm) AS cos
        FROM cand c
        JOIN n a ON a.vec_id = c.qid
        JOIN n b ON b.vec_id = c.vec_id
    )
    SELECT qid, qlabel, vec_id, ROUND(cos, 4) AS cosine
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
        FROM scored
    )
    WHERE rn <= 5
    ORDER BY qid, cos DESC, vec_id
    """,
    tags=("llm", "similarity", "ann"),
)
def q_sim_ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATTRIBUTE-FILTERED vector search — "nearest neighbors within a
    category": top-5 same-label neighbors per query via banded LSH
    (4 bands × 2 hyperplanes, OR semantics) with the label pushed INTO
    the band join key. Filtered search is the production ANN case
    engines get wrong by post-filtering (top-k then filter loses
    recall when the filter is selective); filtering inside candidate
    generation searches the constrained space directly — fan-out
    shrinks by label selectivity, recall doesn't.

    Same md5-derived hyperplanes as q_sim_ann_lsh, so the whole
    filtered search stays exact-oracle-checkable; candidates are
    distinct-deduped across bands and ranked by the raw bit-identical
    cosine.
    """
    n = _vectors(spark, sf_dir)
    bit_cols = [
        F.expr(_lsh_bit_spark(j)).alias(f"bit{j}") for j in range(_N_PLANES)
    ]
    h = n.select("vec_id", "label", "e", "nrm", *bit_cols)
    band_entries = F.array(
        *[
            F.struct(
                F.lit(bd).alias("band_id"),
                (F.col(f"bit{2 * bd}") * 2 + F.col(f"bit{2 * bd + 1}")).alias(
                    "code"
                ),
            )
            for bd in range(_N_PLANES // 2)
        ]
    )
    bands = h.select(
        "vec_id", "label", F.explode(band_entries).alias("bc")
    ).select("vec_id", "label", "bc.band_id", "bc.code")
    a = bands.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        "band_id",
        "code",
    )
    b = bands.select(
        F.col("vec_id").alias("vec_id"),
        F.col("label").alias("blabel"),
        F.col("band_id").alias("band_b"),
        F.col("code").alias("code_b"),
    )
    cand = (
        a.join(
            b,
            (F.col("band_id") == F.col("band_b"))
            & (F.col("code") == F.col("code_b"))
            & (F.col("qlabel") == F.col("blabel"))
            & (F.col("qid") != F.col("vec_id")),
        )
        .select("qid", "qlabel", "vec_id")
        .distinct()
    )
    qv = n.select(
        F.col("vec_id").alias("qid"), F.col("e").alias("ea"), F.col("nrm").alias("na")
    )
    bv = n.select(
        F.col("vec_id").alias("vec_id"), F.col("e").alias("eb"), F.col("nrm").alias("nb")
    )
    cos = F.expr(_DOT_SPARK) / (F.col("na") * F.col("nb"))
    scored = cand.join(qv, "qid").join(bv, "vec_id").select(
        "qid", "qlabel", "vec_id", cos.alias("cos")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", "qlabel", "vec_id", F.round("cos", 4).alias("cosine"))
        .orderBy("qid", F.desc("cos"), "vec_id")
    )


# ---------------------------------------------------------------------------
# q_sim_matryoshka — prefix-dimension coarse filter + full-dim refine
# ---------------------------------------------------------------------------

_MAT_PREFIX = 32     # dims of the coarse pass (Matryoshka prefix)
_MAT_SHORTLIST = 50  # FLOOR of the exact-refine shortlist
_MAT_SHORTLIST_DIV = 50  # shortlist scales as max(floor, n/50):
# on UNTRAINED (synthetic) embeddings the prefix is only weakly
# correlated with the full cosine, so a constant shortlist decays
# with corpus size (measured at sf1: prefix-16 + 50 -> recall@5 0.12;
# prefix-32 + n/50=400 -> 0.82 — tools/ann_recall_audit.py). Real
# matryoshka-trained embeddings front-load information and need a
# smaller prefix/shortlist; the floor covers that case.
_MAT_TOPK = 5

_MAT_PDOT_SPARK = " + ".join(
    f"(element_at(ea, {i}) * element_at(eb, {i}))"
    for i in range(1, _MAT_PREFIX + 1)
)
_MAT_PNORM_SPARK = (
    "sqrt("
    + " + ".join(
        f"(element_at(e, {i}) * element_at(e, {i}))"
        for i in range(1, _MAT_PREFIX + 1)
    )
    + ")"
)
_MAT_PDOT_DUCK = (
    f"list_reduce(list_transform(range(1, {_MAT_PREFIX + 1}),"
    " i -> a.e[i] * b.e[i]), (acc, x) -> acc + x)"
)
_MAT_PNORM_DUCK = (
    f"sqrt(list_reduce(list_transform(range(1, {_MAT_PREFIX + 1}),"
    " i -> e[i] * e[i]), (acc, x) -> acc + x))"
)


@register(
    "q_sim_matryoshka",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, e, {_NORM_DUCK} AS nrm, {_MAT_PNORM_DUCK} AS pnrm
        FROM v
    ),
    shortlist AS (
        SELECT qid, cand_id, pcos FROM (
            SELECT a.vec_id AS qid, b.vec_id AS cand_id,
                   {_MAT_PDOT_DUCK} / (a.pnrm * b.pnrm) AS pcos,
                   ROW_NUMBER() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY {_MAT_PDOT_DUCK} / (a.pnrm * b.pnrm) DESC,
                                b.vec_id
                   ) AS prn
            FROM n a JOIN n b ON a.vec_id < 10 AND b.vec_id <> a.vec_id
        ) WHERE prn <= GREATEST({_MAT_SHORTLIST},
            (SELECT COUNT(*) FROM embeddings) // {_MAT_SHORTLIST_DIV})
    ),
    refined AS (
        SELECT s.qid, s.cand_id, s.pcos,
               list_reduce(list_transform(range(1, {_DIM + 1}),
                   i -> a.e[i] * b.e[i]), (acc, x) -> acc + x)
                   / (a.nrm * b.nrm) AS cos
        FROM shortlist s
        JOIN n a ON a.vec_id = s.qid
        JOIN n b ON b.vec_id = s.cand_id
    )
    SELECT qid AS vec_id, CAST(rn AS INT) AS rank, cand_id,
           ROUND(cos, 4) AS cosine, ROUND(pcos, 4) AS prefix_cosine
    FROM (
        SELECT qid, cand_id, cos, pcos,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cos DESC, cand_id) AS rn
        FROM refined
    ) WHERE rn <= {_MAT_TOPK}
    ORDER BY vec_id, rank
    """,
    tags=("llm", "similarity", "ann"),
)
def q_sim_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATRYOSHKA prefix-dimension retrieval (Kusupati et al. 2022,
    arXiv:2205.13147): embeddings trained with matryoshka losses pack
    coarse semantics into their leading dims, so retrieval runs a
    CHEAP first pass on only the first 16 of 64 dims (4x less
    compute and — on a columnar store with dim-sliced columns — 4x
    less I/O), keeps the top-50 by prefix cosine, and re-ranks just
    those with the full-dimension exact cosine. Per query: top-5 by
    full cosine, with the
    prefix cosine alongside to expose the funnel's honesty.

    Exactness: prefix dot/norm and full dot/norm are all sequential
    index-order folds (the repo float policy), both rankings tiebreak
    on the candidate id, so shortlist membership and final ranks
    hash-match DuckDB exactly.

    100 TB: the coarse pass is a linear scan of a 4x narrower column
    against a broadcast 10-row query set (q_knn_label's probe shape)
    with a per-query top-k — TakeOrdered-style partial top-k per
    partition, no global sort; the expensive full-width vectors are
    touched only for the 10 x max(50, n/50) shortlist rows. Composes with any
    coarse index upstream (IVF cells or LSH bands over the PREFIX
    dims) — the prefix pass here is the honest brute-force baseline
    of that family.
    """
    v = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"),
    )
    # corpus-scaled shortlist (see _MAT_SHORTLIST_DIV): metadata-cheap
    # count, identical integer in both engines
    mat_shortlist = max(
        _MAT_SHORTLIST,
        load(spark, sf_dir, "embeddings").count() // _MAT_SHORTLIST_DIV,
    )
    n = v.select(
        "vec_id",
        "e",
        F.expr(_NORM_SPARK).alias("nrm"),
        F.expr(_MAT_PNORM_SPARK).alias("pnrm"),
    )
    q = n.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
        F.col("pnrm").alias("pna"),
    )
    c = n.select(
        F.col("vec_id").alias("cand_id"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
        F.col("pnrm").alias("pnb"),
    )
    pcos = F.expr(_MAT_PDOT_SPARK) / (F.col("pna") * F.col("pnb"))
    w_pre = Window.partitionBy("qid").orderBy(F.desc("pcos"), "cand_id")
    shortlist = (
        F.broadcast(q)
        .join(c, F.col("cand_id") != F.col("qid"))
        .select("qid", "cand_id", "ea", "na", "eb", "nb", pcos.alias("pcos"))
        .withColumn("prn", F.row_number().over(w_pre))
        .filter(F.col("prn") <= mat_shortlist)
    )
    cos = F.expr(_DOT_SPARK) / (F.col("na") * F.col("nb"))
    w_top = Window.partitionBy("qid").orderBy(F.desc("cos"), "cand_id")
    return (
        shortlist.select("qid", "cand_id", "pcos", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= _MAT_TOPK)
        .select(
            F.col("qid").alias("vec_id"),
            F.col("rn").cast("int").alias("rank"),
            "cand_id",
            F.round("cos", 4).alias("cosine"),
            F.round("pcos", 4).alias("prefix_cosine"),
        )
        .orderBy("vec_id", "rank")
    )


# ---------------------------------------------------------------------------
# q_embedding_rvq — two-stage RESIDUAL vector quantization
# ---------------------------------------------------------------------------

_RVQ_K = 8  # centroids per stage (3-bit codes)

_RVQ_D1_SPARK = (
    f"aggregate(transform(sequence(1, {_DIM}), i ->"
    " (element_at(e, i) - element_at(ce, i))"
    " * (element_at(e, i) - element_at(ce, i))),"
    " 0d, (acc, x) -> acc + x)"
)
_RVQ_D2_SPARK = (
    f"aggregate(transform(sequence(1, {_DIM}), i ->"
    " (element_at(r, i) - element_at(cr, i))"
    " * (element_at(r, i) - element_at(cr, i))),"
    " 0d, (acc, x) -> acc + x)"
)


@register(
    "q_embedding_rvq",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    r1 AS (
        SELECT vec_id, e,
               ROW_NUMBER() OVER (
                   ORDER BY md5('rvq1#' || CAST(vec_id AS VARCHAR)), vec_id
               ) AS rnk
        FROM v
    ),
    c1 AS (SELECT CAST(rnk - 1 AS INT) AS code1, e AS ce
           FROM r1 WHERE rnk <= {_RVQ_K}),
    a1 AS (
        SELECT vec_id, code1, d1, r FROM (
            SELECT p.vec_id, c.code1,
                   list_reduce(list_transform(range(1, {_DIM + 1}), i ->
                       (p.e[i] - c.ce[i]) * (p.e[i] - c.ce[i])),
                       (acc, x) -> acc + x) AS d1,
                   list_transform(range(1, {_DIM + 1}), i ->
                       p.e[i] - c.ce[i]) AS r,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.vec_id
                       ORDER BY list_reduce(list_transform(range(1, {_DIM + 1}), i ->
                           (p.e[i] - c.ce[i]) * (p.e[i] - c.ce[i])),
                           (acc, x) -> acc + x), c.code1) AS rn
            FROM v p CROSS JOIN c1 c
        ) WHERE rn = 1
    ),
    r2 AS (
        SELECT vec_id,
               ROW_NUMBER() OVER (
                   ORDER BY md5('rvq2#' || CAST(vec_id AS VARCHAR)), vec_id
               ) AS rnk
        FROM v
    ),
    c2 AS (
        SELECT CAST(r2.rnk - 1 AS INT) AS code2, a1.r AS cr
        FROM r2 JOIN a1 ON r2.vec_id = a1.vec_id
        WHERE r2.rnk <= {_RVQ_K}
        UNION ALL
        SELECT {_RVQ_K} AS code2,
               list_transform(range(1, {_DIM + 1}), i -> CAST(0 AS DOUBLE))
    ),
    a2 AS (
        SELECT vec_id, code1, d1, code2, d2 FROM (
            SELECT a.vec_id, a.code1, a.d1, c.code2,
                   list_reduce(list_transform(range(1, {_DIM + 1}), i ->
                       (a.r[i] - c.cr[i]) * (a.r[i] - c.cr[i])),
                       (acc, x) -> acc + x) AS d2,
                   ROW_NUMBER() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY list_reduce(list_transform(range(1, {_DIM + 1}), i ->
                           (a.r[i] - c.cr[i]) * (a.r[i] - c.cr[i])),
                           (acc, x) -> acc + x), c.code2) AS rn
            FROM a1 a CROSS JOIN c2 c
        ) WHERE rn = 1
    )
    SELECT vec_id, code1, code2,
           ROUND(d1, 4) AS sq_err_stage1,
           ROUND(d2, 4) AS sq_err_stage2
    FROM a2
    ORDER BY vec_id
    """,
    tags=("llm", "similarity", "ann"),
)
def q_embedding_rvq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESIDUAL vector quantization (the RVQ scheme modern neural
    codecs and ANN indexes stack: quantize, subtract, quantize the
    residual): stage 1 assigns each 64-dim vector to the nearest of 8
    md5-ranked-sample centroids; stage 2 quantizes the RESIDUAL
    against a codebook built from the stage-1 residuals of a second
    md5-ranked sample PLUS the ZERO escape codeword (code 8 — with
    unfitted sample codebooks a random high-dim residual direction
    usually hurts, so the escape word is what makes stage 2 a
    guaranteed refinement; a fitted RVQ gets the same property from
    mean-centering). Reported per vector: both codes and the
    stage-wise squared errors — stage 2 NEVER increases error
    (tested exactly: the zero word reproduces stage 1's fold
    bit-for-bit).

    Determinism: codebooks are md5-rank samples (the q_embedding_pq
    seeding contract); every distance is the identical sequential
    left fold in both engines (Spark `aggregate` ≡ DuckDB
    `list_reduce`), residual arrays subtract element-wise exactly,
    and argmin ties break on the code — ROUND(·, 4) on bit-identical
    doubles is stable.

    Plan: codebooks are 8 broadcast rows each; both assignment stages
    are embarrassingly parallel maps (broadcast join + per-vector
    argmin window on the vec partition); no shuffle of the vector
    table. At 100 TB the codebooks would be Lloyd-fitted
    (q_kmeans/IVF integer protocol) with the same assignment plan.
    """
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"),
    )
    r1 = v.withColumn(
        "rnk",
        F.row_number().over(
            Window.orderBy(
                F.md5(F.concat(F.lit("rvq1#"), F.col("vec_id").cast("string"))),
                "vec_id",
            )
        ),
    )
    c1 = r1.filter(F.col("rnk") <= _RVQ_K).select(
        (F.col("rnk") - 1).cast("int").alias("code1"), F.col("e").alias("ce")
    )
    w1 = Window.partitionBy("vec_id").orderBy("d1", "code1")
    a1 = (
        v.crossJoin(F.broadcast(c1))
        .withColumn("d1", F.expr(_RVQ_D1_SPARK))
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "code1",
            "d1",
            F.expr(
                f"transform(sequence(1, {_DIM}), i ->"
                " element_at(e, i) - element_at(ce, i))"
            ).alias("r"),
        )
    )
    r2 = v.select(
        "vec_id",
        F.row_number()
        .over(
            Window.orderBy(
                F.md5(F.concat(F.lit("rvq2#"), F.col("vec_id").cast("string"))),
                "vec_id",
            )
        )
        .alias("rnk"),
    )
    c2 = (
        r2.filter(F.col("rnk") <= _RVQ_K)
        .join(a1.select("vec_id", "r"), "vec_id")
        .select(
            (F.col("rnk") - 1).cast("int").alias("code2"),
            F.col("r").alias("cr"),
        )
        .unionByName(
            v.limit(1).select(
                F.lit(_RVQ_K).cast("int").alias("code2"),
                F.expr(f"array_repeat(CAST(0 AS DOUBLE), {_DIM})").alias("cr"),
            )
        )
    )
    w2 = Window.partitionBy("vec_id").orderBy("d2", "code2")
    return (
        a1.crossJoin(F.broadcast(c2))
        .withColumn("d2", F.expr(_RVQ_D2_SPARK))
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "code1",
            "code2",
            F.round("d1", 4).alias("sq_err_stage1"),
            F.round("d2", 4).alias("sq_err_stage2"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# q_sim_maxsim — ColBERT-style late-interaction (MaxSim) retrieval
# ---------------------------------------------------------------------------

_MS_TOKS = 4      # token vectors per doc (64 dims -> 4 x 16)
_MS_SUBDIM = 16
_MS_NQ = 5        # md5-ranked query docs
_MS_TOPK = 10

_MS_QUANT_SPARK = (
    "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000)"
    " AS BIGINT))"
)
_MS_QUANT_DUCK = (
    "list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000)"
    " AS BIGINT))"
)


def _ms_dot(tq: int, td: int, qcol: str, dcol: str, duck: bool) -> str:
    if duck:
        return (
            f"list_sum(list_transform(range(1, {_MS_SUBDIM + 1}), i ->"
            f" {qcol}[{tq * _MS_SUBDIM} + i] * {dcol}[{td * _MS_SUBDIM} + i]))"
        )
    return (
        f"aggregate(sequence(1, {_MS_SUBDIM}), 0L, (acc, i) -> acc +"
        f" element_at({qcol}, {tq * _MS_SUBDIM} + i)"
        f" * element_at({dcol}, {td * _MS_SUBDIM} + i))"
    )


def _ms_score(qcol: str, dcol: str, duck: bool) -> str:
    """MaxSim: Σ over query tokens of max over doc tokens of the
    integer dot product — generated as 16 dots / 4 GREATESTs / 1 sum."""
    terms = []
    for tq in range(_MS_TOKS):
        dots = ", ".join(
            _ms_dot(tq, td, qcol, dcol, duck) for td in range(_MS_TOKS)
        )
        terms.append(f"GREATEST({dots})")
    return "(" + " + ".join(terms) + ")"


@register(
    "q_sim_maxsim",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, {_MS_QUANT_DUCK} AS m FROM embeddings
    ),
    q AS (
        SELECT vec_id AS q_id, m AS qm FROM (
            SELECT vec_id, m,
                   ROW_NUMBER() OVER (
                       ORDER BY md5('maxsim#' || CAST(vec_id AS VARCHAR)),
                                vec_id) AS rn
            FROM v
        ) WHERE rn <= {_MS_NQ}
    ),
    scored AS (
        SELECT q.q_id, d.vec_id,
               CAST({_ms_score("q.qm", "d.m", True)} AS BIGINT) AS score
        FROM q CROSS JOIN v d
        WHERE d.vec_id <> q.q_id
    )
    SELECT q_id, vec_id, score, CAST(rn AS BIGINT) AS rank
    FROM (
        SELECT q_id, vec_id, score,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY score DESC, vec_id) AS rn
        FROM scored
    )
    WHERE rn <= {_MS_TOPK}
    ORDER BY q_id, rank
    """,
    tags=("llm", "similarity", "ann"),
)
def q_sim_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATE-INTERACTION retrieval (ColBERT's MaxSim, Khattab &
    Zaharia 2020): each embedding splits into {_MS_TOKS} token
    vectors of {_MS_SUBDIM} dims, and a document's score for a query
    is Σ over QUERY tokens of the max dot product against any DOC
    token — the multi-vector scoring that beats single-vector cosine
    on fine-grained matches. Top-{_MS_TOPK} per query, 5 md5-ranked
    query docs.

    Integer-exact: coordinates quantize to the signed 1e-6 grid
    (|x| < 0.5 ⇒ |m| ≤ 5·10⁵; a 16-dim dot ≤ 4·10¹² — BIGINT-safe),
    so every dot, max, and sum is an identical integer in both
    engines; ranking ties break on vec_id. The 16 dots / 4 maxes per
    pair are GENERATED codegen expressions (no UDF, no Python).

    Plan: the 5-query frame broadcasts against the vector scan (the
    q_knn_label probe shape); per-query top-k is a window over each
    query's partition. At 100 TB the same scoring rides an IVF/PQ
    shortlist (q_ivf_pq_search) instead of the full scan — MaxSim is
    the RE-RANK stage in production late-interaction stacks.
    """
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.expr(_MS_QUANT_SPARK).alias("m"))
    q = (
        v.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(
                    F.md5(
                        F.concat(
                            F.lit("maxsim#"), F.col("vec_id").cast("string")
                        )
                    ),
                    "vec_id",
                )
            ),
        )
        .filter(F.col("rn") <= _MS_NQ)
        .select(F.col("vec_id").alias("q_id"), F.col("m").alias("qm"))
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.expr(_ms_score("qm", "m", False)).cast("long").alias("score"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _MS_TOPK)
        .select("q_id", "vec_id", "score", "rank")
        .orderBy("q_id", "rank")
    )
