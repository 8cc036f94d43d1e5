import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_SMALL", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def spark():
    from impractical_impala_spark.session import get_spark

    # Small core count for tiny test data: per-task overhead dominates.
    spark = get_spark("iis-tests", cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")))
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_oracle():
    return SF_ORACLE
