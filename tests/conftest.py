import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # smaller session for tests


@pytest.fixture(scope="session")
def spark():
    from spatialdata_spark.session import get_spark

    s = get_spark("spatialdata-spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
