"""Linear readout fitting — the reference's ``lm`` module.

Reference parity (SURVEY.md §2.1 R5/R7, expected at
lm/LinearRegressionPrimitive.java [K:high; recall]): solve the readout
weights α from (features, target) pairs by Moore-Penrose pseudoinverse
with optional Tikhonov/ridge regularization, then predict ŷ = α·f.
The reference collects training pairs to the client JVM and solves
with ojAlgo — i.e. the fit itself was always single-node.

Spark-first re-expression, two paths:

1. ``fit_readout_distributed`` (the 100 TB path): accumulate the
   normal equations Aᵀ A (k×k) and Aᵀ y (k) with a partial-aggregating
   ``mapInPandas`` over the distributed features — each partition emits
   one k×(k+1) block, the driver sums blocks and solves the k×k system
   (k = n_u+n_x+1, small). Training data never concentrates anywhere;
   the shuffle-free reduce is O(partitions · k²).
2. ``fit_readout_collect``: mirrors the reference's client-side solve
   (collect + numpy lstsq/ridge) — fine for small training sets,
   kept for parity with the reference's experiment shape.

Both give the same α (ridge λ > 0 ⇒ unique solution; λ = 0 falls back
to lstsq on the Gram system).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _solve(ata: np.ndarray, aty: np.ndarray, ridge: float) -> np.ndarray:
    k = ata.shape[0]
    if ridge > 0:
        return np.linalg.solve(ata + ridge * np.eye(k), aty)
    return np.linalg.lstsq(ata, aty, rcond=None)[0]


def fit_readout_distributed(
    df: DataFrame,
    features_col: str = "features",
    target_col: str = "target",
    ridge: float = 1e-6,
    add_bias: bool = True,
) -> np.ndarray:
    """Normal-equation fit via per-partition Gram blocks (scales to any
    row count; k×k stays driver-side)."""
    from flink_rc_spark.util import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    k_probe = len(df.select(features_col).first()[0]) + (1 if add_bias else 0)
    block_schema = T.StructType(
        [T.StructField("block", T.ArrayType(T.DoubleType()), False)]
    )

    def gram_blocks(batches):
        import pandas as pd

        ata = np.zeros((k_probe, k_probe))
        aty = np.zeros(k_probe)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.stack(pdf[features_col].to_numpy())
            if add_bias:
                a = np.hstack([a, np.ones((a.shape[0], 1))])
            y = pdf[target_col].to_numpy(dtype=float)
            ata += a.T @ a
            aty += a.T @ y
            seen = True
        if seen:
            yield pd.DataFrame(
                {"block": [np.hstack([ata, aty[:, None]]).ravel().tolist()]}
            )

    blocks = df.select(features_col, target_col).mapInPandas(
        gram_blocks, schema=block_schema
    )
    total = np.zeros(k_probe * (k_probe + 1))
    for row in blocks.collect():  # one small row per partition
        total += np.asarray(row["block"])
    m = total.reshape(k_probe, k_probe + 1)
    return _solve(m[:, :-1], m[:, -1], ridge)


def fit_readout_collect(
    df: DataFrame,
    features_col: str = "features",
    target_col: str = "target",
    ridge: float = 1e-6,
    add_bias: bool = True,
) -> np.ndarray:
    """Client-side fit (the reference's own shape): collect training
    pairs, pseudoinverse/ridge in numpy."""
    rows = df.select(features_col, target_col).collect()
    a = np.array([r[0] for r in rows], dtype=float)
    if add_bias:
        a = np.hstack([a, np.ones((a.shape[0], 1))])
    y = np.array([r[1] for r in rows], dtype=float)
    return _solve(a.T @ a, a.T @ y, ridge)


def predict(
    df: DataFrame,
    alpha: np.ndarray,
    features_col: str = "features",
    out_col: str = "y_hat",
    add_bias: bool = True,
) -> DataFrame:
    """ŷ = α · [f; 1] as a JVM-side expression: the dot product unrolls
    to ``aggregate(zip_with(...))`` over the array column — no Python in
    the hot path (reference R7's predict map)."""
    alpha = np.asarray(alpha, dtype=float)
    feats = alpha[:-1] if add_bias else alpha
    bias = float(alpha[-1]) if add_bias else 0.0
    alpha_col = F.array(*[F.lit(float(v)) for v in feats])
    dot = F.aggregate(
        F.zip_with(F.col(features_col), alpha_col, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return df.withColumn(out_col, dot + F.lit(bias))


def mse(df: DataFrame, y_col: str, yhat_col: str) -> float:
    """Mean squared error (reference R10)."""
    row = df.agg(
        F.avg(F.pow(F.col(y_col) - F.col(yhat_col), F.lit(2))).alias("mse")
    ).first()
    return float(row["mse"])
