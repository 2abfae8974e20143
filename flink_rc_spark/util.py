"""Runtime utilities."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

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
