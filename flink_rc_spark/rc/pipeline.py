"""End-to-end RC pipeline template — the reference's
``higher_level_examples`` surface (SURVEY.md §2.1 R14 [K:med; recall]:
HigherLevelExampleBatch / …Streaming…, parameterized by input file,
N_u, N_x, regularization, spectral radius, topology, scaling,
steps-ahead, train size).

One call wires the full experiment: indexed series → reservoir scan →
k-step-ahead target (lead) → washout → train/test split by seq
threshold (reference R9) → readout fit (distributed normal equations)
→ predict → MSE, and returns both the prediction DataFrame and the
metric summary. Every stage is the Spark-first operator defined
elsewhere in this package; this module only composes them.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_rc_spark.rc.readout import fit_readout_distributed, predict
from flink_rc_spark.rc.reservoir import ReservoirConfig, run_reservoir, washout


@dataclass
class ESNPipeline:
    cfg: ReservoirConfig = field(default_factory=ReservoirConfig)
    steps_ahead: int = 1
    washout_steps: int = 100
    train_frac: float = 0.7
    ridge: float = 1e-6

    def run(
        self,
        df: DataFrame,
        series_col: str = "series_id",
        seq_col: str = "seq",
        value_col: str = "value",
    ) -> tuple[DataFrame, dict]:
        """Returns (test predictions DataFrame, metrics dict with
        train/test/naive-persistence MSE)."""
        w = Window.partitionBy(series_col).orderBy(seq_col)
        labeled = (
            df.withColumn("target", F.lead(value_col, self.steps_ahead).over(w))
            .withColumn("naive_pred", F.col(value_col))
            .filter(F.col("target").isNotNull())
        )

        # `labeled` comes straight off the series-partitioned lead
        # window, so its exchange+sort already provides the kernel
        # layout (assume_layout contract, run_reservoir docstring)
        states = run_reservoir(
            labeled,
            self.cfg,
            series_col=series_col,
            seq_col=seq_col,
            input_cols=[value_col],
            keep_cols=["target", "naive_pred"],
            assume_layout=True,
        )
        states = washout(states, seq_col=seq_col, n=self.washout_steps)
        # The experiment consumes `states` ~6 times (split point, fit,
        # counts, three MSEs); without a persist every consumer re-runs
        # the reservoir scan subtree — measured 21 s -> 6 s at the
        # bench size. Persisted only for the duration of the metric
        # computation; the returned prediction frame is materialized
        # (tiny: test rows x (features, preds)) before release.
        states = states.persist()
        try:
            max_seq = states.agg(F.max(seq_col)).first()[0]
            split = int(max_seq * self.train_frac)
            train = states.filter(F.col(seq_col) < split)
            test = states.filter(F.col(seq_col) >= split)

            alpha = fit_readout_distributed(
                train, features_col="features", target_col="target", ridge=self.ridge
            )
            train_pred = predict(train, alpha)
            test_pred = predict(test, alpha).persist()

            # Two metric actions instead of five: each side's count +
            # MSE(s) fold into ONE aggregate over the persisted states
            # (a 1-series experiment pays per-action job overhead, so
            # action count — not data volume — dominates its bench
            # time; naive_pred rides through predict's projection).
            sq = lambda a, b: F.avg(F.pow(F.col(a) - F.col(b), F.lit(2)))  # noqa: E731
            tr = train_pred.agg(
                F.count("*").alias("n"), sq("target", "y_hat").alias("m")
            ).first()
            te = test_pred.agg(
                F.count("*").alias("n"),
                sq("target", "y_hat").alias("m"),
                sq("target", "naive_pred").alias("nm"),
            ).first()
            metrics = {
                "n_train": int(tr["n"]),
                "n_test": int(te["n"]),
                "alpha_norm": float(np.linalg.norm(alpha)),
                "train_mse": float(tr["m"]),
                "test_mse": float(te["m"]),
                "naive_mse": float(te["nm"]),
            }
        finally:
            states.unpersist()
        return test_pred, metrics
