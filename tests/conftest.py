from __future__ import annotations

import os

import pytest

from large_csv_etl_spark.session import get_spark

# Override with SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to rerun the
# whole suite at the driver's correctness scale.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MID = "/root/testdata/sf0.01"
# The bench-scale fixture (bench.py's default $SPARK_GRAFT_SF_DIR): tests
# that pin sketch bounds at the scale the driver actually benches read it
# from here rather than hardcoding the path (ADVICE r9 #5).
SF_DIR_BENCH = "/root/testdata/sf0.1"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            # static conf — must be set at session build, not after
            "spark.sql.warehouse.dir": str(
                tmp_path_factory.mktemp("spark-warehouse")
            ),
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
