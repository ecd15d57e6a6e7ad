import os

import pytest

from varpulis_spark.engine import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("varpulis_spark_tests", cores=4)
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
