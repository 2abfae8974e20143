"""Local mirror of the driver's t2 correctness gate.

Runs a declared query's Spark builder and its DuckDB oracle on the same
sf dir and compares: row count, column set, and order-insensitive
values (exact — no tolerance — because the driver hashes values; the
engine's decimal-exact aggregation policy is what makes this possible
for doubles).
"""

from __future__ import annotations

import decimal

import duckdb
import numpy as np
import pandas as pd

from flink_rc_spark.sources.tables import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            pdf[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(s):
            pdf[c] = s.astype("bool") if not s.isna().any() else s.astype("object")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64")
        elif s.dtype == object:
            pdf[c] = s.map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return pdf


def _sortable(pdf: pd.DataFrame) -> pd.DataFrame:
    if len(pdf.columns) == 0 or len(pdf) == 0:
        return pdf
    return pdf.sort_values(
        by=list(pdf.columns), kind="mergesort", na_position="last"
    ).reset_index(drop=True)


def _assert_no_raw_decimal(pdf: pd.DataFrame, key: str, side: str) -> None:
    """Output-boundary policy gate (functions/exact.py): raw DECIMAL
    output columns stringify differently across clients
    (Decimal('37.00') vs 37.0) and fail the driver's hash even when
    values compare equal — the r1 q_cast red row. Fail loudly here so
    the local harness mirrors the driver, not a weaker value-compare."""
    for c in pdf.columns:
        s = pdf[c]
        if s.dtype == object and s.map(lambda v: isinstance(v, decimal.Decimal)).any():
            raise AssertionError(
                f"{key}.{c} ({side}): raw DECIMAL output column violates the "
                "output-boundary policy — cast to DOUBLE or VARCHAR in both "
                "the Spark builder and the oracle SQL"
            )


def _repr_class(s: pd.Series) -> str:
    """Collapse a dtype to the equivalence class the driver's stringified
    value-hash distinguishes: int widths stringify identically (int32 5 ==
    int64 5 == "5"), but int-vs-float differs ("3544" vs "3544.0") and
    float32-vs-float64 can differ on non-representable values."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if s.dtype == np.float32:
        return "float32"
    if pd.api.types.is_float_dtype(s):
        return "float64"
    return "object"


def _assert_repr_strict(
    spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, key: str
) -> None:
    """Driver-hash predictor gate (the r2 q_doc_len_hist red): the driver
    stringifies RAW toPandas()/df() values before hashing, so an int64
    Spark column vs a float64 oracle column (DuckDB SUM(int) -> HUGEINT
    -> float64) hash-mismatches even when every value compares equal.
    Fail here, BEFORE the numeric compare papers over it — this makes the
    local mirror exactly as strict as the driver. Fix pattern: CAST(SUM(..)
    AS BIGINT) in the oracle, or cast the Spark side to match."""
    for c in sorted(set(spark_pdf.columns) & set(duck_pdf.columns)):
        ca, cb = _repr_class(spark_pdf[c]), _repr_class(duck_pdf[c])
        if ca != cb:
            raise AssertionError(
                f"{key}.{c}: representation mismatch spark={spark_pdf[c].dtype}"
                f" ({ca}) vs duck={duck_pdf[c].dtype} ({cb}) — the driver's "
                "stringified hash WILL differ even if values are equal; align "
                "the output types (e.g. CAST(SUM(..) AS BIGINT) in the oracle)"
            )


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, key: str) -> None:
    _assert_no_raw_decimal(spark_pdf, key, "spark")
    _assert_no_raw_decimal(duck_pdf, key, "duck")
    _assert_repr_strict(spark_pdf, duck_pdf, key)
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{key}: column mismatch spark={list(a.columns)} duck={list(b.columns)}"
    )
    assert len(a) == len(b), f"{key}: row count spark={len(a)} duck={len(b)}"
    a, b = _sortable(a), _sortable(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            ok = ((av.isna() & bv.isna()) | (av == bv)).all()
            if not ok:
                diff = (av - bv).abs().max()
                raise AssertionError(
                    f"{key}.{c}: float values differ (max abs diff {diff}); "
                    f"spark head={av.head(5).tolist()} duck head={bv.head(5).tolist()}"
                )
        else:
            mism = ~((av.isna() & bv.isna()) | (av == bv))
            if mism.any():
                i = int(np.argmax(mism.values))
                raise AssertionError(
                    f"{key}.{c}: value mismatch at sorted row {i}: "
                    f"spark={av.iloc[i]!r} duck={bv.iloc[i]!r} "
                    f"(dtypes {av.dtype}/{bv.dtype}, {int(mism.sum())} rows differ)"
                )


def run_parity(spark, con, sf_dir: str, key: str, builder, oracle: str) -> None:
    spark_pdf = builder(spark, sf_dir).toPandas()
    duck_pdf = con.execute(oracle).df()
    compare_frames(spark_pdf, duck_pdf, key)
