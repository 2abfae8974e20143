"""Online (streaming-style) linear readout — the reference's
``lm/LinearRegression.java`` (SURVEY.md §2.1 R6 [K:high; recall]).

The reference trains the readout continuously with gradient descent
over a Flink ``IterativeStream`` — a cyclic dataflow edge feeding the
updated weight vector back into the operator. Spark's DAGs are
acyclic, so the loop is re-architected as *model-in-state*: the weight
vector lives in per-key state and is updated record-by-record inside a
grouped sequential scan (batch: ``applyInPandas`` per series ordered
by seq; streaming: the same update inside
``transformWithStateInPandas``, flink_rc_spark/streaming/stateful.py).
The update sequence — and therefore the learned weights — matches the
reference's semantics; only the mechanism is Spark-idiomatic.

SGD update per record (learning rate η, prediction before update):
    ŷ(t) = α(t-1) · [f(t); 1]
    α(t) = α(t-1) + η · (y(t) − ŷ(t)) · [f(t); 1]
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def online_sgd(
    df: DataFrame,
    key_col: str = "series_id",
    seq_col: str = "seq",
    features_col: str = "features",
    target_col: str = "target",
    lr: float = 0.01,
    normalize: bool = True,
) -> DataFrame:
    """Per-key sequential SGD; emits (key, seq, y, y_hat, weight_norm)
    so both the prediction stream and model evolution are observable.

    ``normalize`` scales the gradient by the feature norm (normalized
    LMS) for stability across feature magnitudes.
    """
    from flink_rc_spark.util import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    out_schema = T.StructType(
        [
            df.schema[key_col],
            df.schema[seq_col],
            T.StructField("y", T.DoubleType()),
            T.StructField("y_hat", T.DoubleType()),
            T.StructField("weight_norm", T.DoubleType()),
        ]
    )

    def scan(pdf):
        import pandas as pd

        pdf = pdf.sort_values(seq_col, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        first = np.asarray(pdf[features_col].iloc[0], dtype=float)
        k = len(first) + 1
        w = np.zeros(k)
        y_hat = np.empty(n)
        w_norm = np.empty(n)
        ys = pdf[target_col].to_numpy(dtype=float)
        for i in range(n):
            f = np.concatenate([np.asarray(pdf[features_col].iloc[i], float), [1.0]])
            pred = w @ f
            err = ys[i] - pred
            step = lr * err
            if normalize:
                step /= 1.0 + f @ f
            w = w + step * f
            y_hat[i] = pred
            w_norm[i] = float(np.linalg.norm(w))
        return pd.DataFrame(
            {
                key_col: pdf[key_col],
                seq_col: pdf[seq_col],
                "y": ys,
                "y_hat": y_hat,
                "weight_norm": w_norm,
            }
        )

    return df.groupBy(key_col).applyInPandas(scan, schema=out_schema)
