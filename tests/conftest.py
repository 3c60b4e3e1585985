import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dipper_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session("dipper-tests", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
                      shuffle_partitions=8)
    yield s
    s.stop()
