import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uts_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # small local session for tests: 4 threads keeps startup + shuffle cheap
    s = get_spark("uts-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
