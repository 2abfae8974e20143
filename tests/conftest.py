from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # SPARK_GRAFT_VANILLA=1 runs the whole suite under a bare session
    # (no UTC/Arrow/AQE configs) to mirror the driver, which supplies
    # its OWN session — catches session-sensitive queries (the r1
    # q_cast class) that a tuned session would mask.
    if os.environ.get("SPARK_GRAFT_VANILLA"):
        from pyspark.sql import SparkSession

        s = (
            SparkSession.builder.master("local[*]")
            .appName("flink_rc_spark_tests_vanilla")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        s.sparkContext.setLogLevel("WARN")
    else:
        from flink_rc_spark.session import get_spark

        s = get_spark(app="flink_rc_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    from tests.parity import duck_connect

    con = duck_connect(sf_dir)
    yield con
    con.close()
