from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from iceberg_v2_to_v3_upgrade_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running property/model suites"
    )


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("spark_warehouse")
    derby = tmp_path_factory.mktemp("derby")
    spark = get_spark(
        app_name="tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": "10MB",
            "spark.sql.warehouse.dir": str(wh),
            "spark.driver.extraJavaOptions": f"-Dderby.system.home={derby}",
        },
    )
    yield spark
