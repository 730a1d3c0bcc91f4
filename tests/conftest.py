import os
import sys

import pytest
from hypothesis import settings as hyp_settings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# reproducible CI: identical examples every run (no new random failures
# between the driver's verify runs)
hyp_settings.register_profile("ci", derandomize=True)
hyp_settings.load_profile("ci")

from kmtricks_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=8, app="kmtricks_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).cache()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
