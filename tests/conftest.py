import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    from catme_etl_j_spark.session import get_spark

    return get_spark("pytest")


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
