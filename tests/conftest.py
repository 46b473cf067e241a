import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from interop_datalake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    master = os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[8]")
    parts = int(os.environ.get("SPARK_GRAFT_TEST_PARTITIONS", "8"))
    s = get_spark(master=master, app_name="tests", shuffle_partitions=parts)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
