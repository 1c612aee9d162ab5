from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_SMOKE = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "posix_only: exercises POSIX commit-lock internals; skipped under "
        "the object-store commit backend parametrization",
    )


@pytest.fixture(scope="session")
def spark():
    from xml_to_parquet_spark.session import get_spark

    # small core count for test latency; shuffle partitions kept low so tiny
    # test jobs don't schedule hundreds of empty tasks
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "4")
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
