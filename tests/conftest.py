"""Shared Spark session for the test suite.

Session-scoped (JVM startup is ~10 s); local[4] with 4 shuffle
partitions is plenty for correctness tests — bench.py owns perf runs.
"""

from __future__ import annotations

import os

import pytest

from qms_datawarehouse_spark.session import get_spark

SF_DIR = os.environ.get("QMS_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("QMS_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("qms-tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture()
def warehouse(spark, tmp_path):
    from qms_datawarehouse_spark.warehouse import ParquetWarehouse

    return ParquetWarehouse(spark, str(tmp_path / "wh"))
