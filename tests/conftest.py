from __future__ import annotations

import pytest

from lsh_apg_spark.session import get_spark


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: subprocess-level end-to-end launches")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lsh_apg_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
