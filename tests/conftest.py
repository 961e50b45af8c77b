import os

import pytest


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from closure_html_spark.spark.session import get_spark
    s = get_spark(app="chs-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
