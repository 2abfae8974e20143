"""Central declared-query registry.

Every operator the engine claims is registered here as a
``QuerySpec``: a builder ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) the equivalent DuckDB oracle SQL. The driver contract
(``__spark_entry__.py``) simply re-exports this registry; the local
parity harness (``tests/parity.py``) runs the same comparison the
driver runs (row count + schema + order-insensitive value hash).

Float-determinism policy (SURVEY.md §4.2): aggregate doubles through
DECIMAL so both engines compute the *exact* same value regardless of
summation order, then cast the final result to DOUBLE. Queries that
cannot be made exact (stddev/corr, cosine) round to a fixed number of
decimals identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    builder: Builder
    oracle: Optional[str]  # DuckDB SQL, or None => driver does rows-only check
    doc: str = ""          # semantics + 100TB-scale strategy
    tags: tuple = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str] = None, tags: tuple = (), doc: str = ""):
    """Decorator: declare a query. ``oracle=None`` means rows-only check."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query key {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            builder=fn,
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            tags=tuple(tags),
        )
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import flink_rc_spark.operators  # noqa: F401
    import flink_rc_spark.functions  # noqa: F401
    import flink_rc_spark.streaming  # noqa: F401
    import flink_rc_spark.rc  # noqa: F401
    import flink_rc_spark.llm  # noqa: F401
    import flink_rc_spark.sources.pyds  # noqa: F401


def get_queries() -> dict[str, Builder]:
    load_all()
    return {k: v.builder for k, v in sorted(REGISTRY.items())}


def get_oracles() -> dict[str, str]:
    load_all()
    return {k: v.oracle for k, v in sorted(REGISTRY.items()) if v.oracle is not None}
