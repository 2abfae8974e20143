"""Declared RC queries (SURVEY.md §2.4): the reference's ESN pipeline
surfaced through the driver contract. Non-SQL-expressible (stateful
recurrence / iterative fit) → rows-only driver checks; quantitative
golden/property checks live in tests/test_rc.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_rc_spark.registry import register
from flink_rc_spark.rc.fixtures import mackey_glass, series_df
from flink_rc_spark.rc.online import online_sgd
from flink_rc_spark.rc.pipeline import ESNPipeline
from flink_rc_spark.rc.reservoir import ReservoirConfig, run_reservoir
from flink_rc_spark.sources import load


@register("q_esn_reservoir", oracle=None)
def q_esn_reservoir(spark, sf_dir):
    """Reservoir state trajectory over events.value (reference R4):
    each user's event stream is one series; states evolve by
    x(t)=tanh(W_in·u+W·x(t−1)), emitted as [u; x] features.
    Parallel across users, sequential (like the reference) within."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    series = e.select(
        F.col("user_id").alias("series_id"),
        (F.row_number().over(w) - 1).cast("long").alias("seq"),
        F.col("value"),
    )
    cfg = ReservoirConfig(n_u=1, n_x=16, topology="cycle_jumps", seed=42)
    # seq was just assigned by the user_id-partitioned window, so the
    # exchange+sort it planned already provides the kernel's layout —
    # assume_layout reuses it instead of shuffling the events again
    states = run_reservoir(series, cfg, assume_layout=True)
    return states.select(
        "series_id",
        "seq",
        F.round(F.element_at("features", 1), 6).alias("u0"),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.slice("features", 2, cfg.n_x),
                    F.lit(0.0),
                    lambda acc, v: acc + v * v,
                )
            ),
            6,
        ).alias("state_norm"),
    )


@register("q_esn_fit_predict", oracle=None)
def q_esn_fit_predict(spark, sf_dir):
    """Full ESN experiment on deterministic Mackey-Glass (reference
    R4+R5+R7+R9+R10): reservoir → ridge readout (distributed normal
    equations) → 1-step-ahead prediction; emits a one-row metric
    summary. tests/test_rc.py asserts test_mse < naive_mse."""
    mg = series_df(spark, mackey_glass(4000))
    pipe = ESNPipeline(
        cfg=ReservoirConfig(n_u=1, n_x=100, spectral_radius=0.9, seed=42),
        steps_ahead=1,
        washout_steps=100,
        train_frac=0.7,
        ridge=1e-6,
    )
    _, metrics = pipe.run(mg)
    return spark.createDataFrame(
        [
            (
                int(metrics["n_train"]),
                int(metrics["n_test"]),
                float(metrics["train_mse"]),
                float(metrics["test_mse"]),
                float(metrics["naive_mse"]),
                bool(metrics["test_mse"] < metrics["naive_mse"]),
            )
        ],
        "n_train long, n_test long, train_mse double, test_mse double, naive_mse double, beats_naive boolean",
    )


@register("q_lr_online", oracle=None)
def q_lr_online(spark, sf_dir):
    """Per-user online SGD readout (reference R6's IterativeStream,
    re-architected as model-in-state): predict next event value from
    the current one, updating weights record-by-record in seq order."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    series = (
        e.select(
            F.col("user_id").alias("series_id"),
            (F.row_number().over(w) - 1).cast("long").alias("seq"),
            F.array(F.col("value")).alias("features"),
            F.lead("value", 1).over(w).alias("target"),
        )
        .filter(F.col("target").isNotNull())
    )
    # same layout-reuse as q_esn_reservoir: the lead/row_number window
    # already partitioned and ordered by user
    out = online_sgd(series, lr=0.05, assume_layout=True)
    return out.select(
        "series_id",
        "seq",
        F.round("y", 6).alias("y"),
        F.round("y_hat", 6).alias("y_hat"),
        F.round("weight_norm", 6).alias("weight_norm"),
    )
