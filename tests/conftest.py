from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from flyq_spark.session import get_spark

    s = get_spark("flyq_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def engine(spark, tmp_path):
    from flyq_spark.engine import FlyQEngine

    return FlyQEngine(spark, str(tmp_path))


def make_messages(n, key=None, value_size=None, ts0=1_700_000_000_000):
    """Reference-test-style batch (tests/watermark_apis.rs:26-41 etc.)."""
    out = []
    for i in range(n):
        value = (b"\x00" * value_size) if value_size else f"Message {i}".encode()
        out.append({"key": key, "value": value, "timestamp": ts0 + i})
    return out
