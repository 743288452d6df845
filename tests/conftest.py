from __future__ import annotations

import os

import pytest

# 16 executor threads: the suite is dominated by JVM job wait (r8
# measured 31 min wall / 1.5 min Python CPU on local[4]); plan-shape
# assertions are core-count-independent (file splits are governed by
# maxPartitionBytes/openCost, Exchange counts by the plan).
os.environ.setdefault("SPARK_GRAFT_CPUS", "16")


@pytest.fixture(scope="session")
def spark():
    from virapipe_spark.session import session

    spark = session(
        app_name="virapipe_spark_tests",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "6g"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
