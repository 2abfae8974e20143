"""Runtime utilities."""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Callable, Iterable, Iterator

from pyspark.sql import SparkSession


def scan_sorted_groups(
    batches: Iterable,
    key_col: str,
    scan_group: Callable,
    out_rows_per_batch: int = 65536,
) -> Iterator:
    """Stream a key-contiguous partition through a per-group kernel with
    memory bounded by max(one group, one Arrow batch) — NOT the whole
    partition.

    Contract: the partition's Arrow batches arrive sorted by ``key_col``
    (``repartition(key).sortWithinPartitions(key, ...)``), so each
    group is contiguous. We buffer only the trailing (possibly
    incomplete) group across batch boundaries, flush every completed
    group through ``scan_group``, and coalesce outputs into
    ``out_rows_per_batch``-row Arrow batches (yielding one tiny frame
    per group would fragment the downstream scan).

    At 100 TB this is the difference between "partition must fit in
    worker memory" and "largest single series must fit" — a 100×-skewed
    key no longer OOMs the worker holding its partition's other keys.
    """
    import pandas as pd

    tail: pd.DataFrame | None = None  # trailing incomplete group
    out_buf: list = []
    out_rows = 0

    def flush_out():
        nonlocal out_buf, out_rows
        if out_buf:
            yield pd.concat(out_buf, ignore_index=True) if len(out_buf) > 1 else out_buf[0]
            out_buf, out_rows = [], 0

    for pdf in batches:
        if not len(pdf):
            continue
        whole = pdf if tail is None else pd.concat([tail, pdf], ignore_index=True)
        last_key = whole[key_col].iloc[-1]
        done_mask = whole[key_col].to_numpy() != last_key
        if done_mask.any():
            done = whole[done_mask]
            for _, g in done.groupby(key_col, sort=False):
                out = scan_group(g)
                out_buf.append(out)
                out_rows += len(out)
                if out_rows >= out_rows_per_batch:
                    yield from flush_out()
            tail = whole[~done_mask].reset_index(drop=True)
        else:
            tail = whole
    if tail is not None and len(tail):
        out = scan_group(tail)
        out_buf.append(out)
    yield from flush_out()

import threading as _threading

_FIXTURE_DIRS: dict[str, str] = {}
# Created eagerly at import: lazy creation was itself a race (two
# threads could each mint a distinct lock and double-build the same
# fixture, leaking one of the two dirs) and a Lock costs nothing.
_FIXTURE_LOCK = _threading.Lock()
_FIXTURE_ATEXIT = False


def cached_fixture_dir(namespace: str, key: str, build: Callable[[str], None]) -> str:
    """Thread-safe, process-lifetime cache of built fixture temp dirs.

    ``build(dir)`` runs at most once per (namespace, key); the dir is
    removed at interpreter exit (a long-lived driver must not leak one
    mkdtemp per sf_dir). Builders that raise leave no cache entry, so
    a retry rebuilds cleanly.
    """
    global _FIXTURE_ATEXIT

    cache_key = f"{namespace}::{key}"
    with _FIXTURE_LOCK:
        if cache_key in _FIXTURE_DIRS:
            return _FIXTURE_DIRS[cache_key]
        if not _FIXTURE_ATEXIT:
            import atexit

            def _cleanup():
                for d in _FIXTURE_DIRS.values():
                    shutil.rmtree(d, ignore_errors=True)
                _FIXTURE_DIRS.clear()

            atexit.register(_cleanup)
            _FIXTURE_ATEXIT = True
        d = tempfile.mkdtemp(prefix=f"flink_rc_spark_{namespace}_")
        try:
            build(d)
        except BaseException:
            shutil.rmtree(d, ignore_errors=True)
            raise
        _FIXTURE_DIRS[cache_key] = d
        return d


_SHIPPED: set[str] = set()


def ensure_package_shipped(spark: SparkSession) -> None:
    """Make ``flink_rc_spark`` importable on executor Python workers.

    Pandas-UDF closures (applyInPandas / mapInPandas) reference
    functions in this package by module path; workers only inherit the
    driver's *cwd* on sys.path, so any caller running from another
    directory would hit ModuleNotFoundError mid-task. Shipping the
    package as a zip via ``sc.addPyFile`` makes the plan portable —
    locally and, unchanged, on a real cluster (where executors share
    nothing with the driver's filesystem layout).
    """
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    import flink_rc_spark

    pkg_dir = os.path.dirname(os.path.abspath(flink_rc_spark.__file__))
    base = os.path.join(
        tempfile.gettempdir(), f"flink_rc_spark_pkg_{os.getpid()}_{app_id}"
    )
    zpath = shutil.make_archive(
        base, "zip", root_dir=os.path.dirname(pkg_dir), base_dir="flink_rc_spark"
    )
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(app_id)
