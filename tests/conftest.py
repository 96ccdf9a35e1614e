"""Shared Spark session for tests — small local session for tiny graphs."""

from __future__ import annotations

import pytest

from olive_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="olive_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            # tiny data: minimize per-job latency (AQE re-planning adds
            # measurable fixed cost per stage on micro-graphs; it IS on
            # in the production session defaults)
            "spark.sql.adaptive.enabled": "false",
            "spark.driver.memory": "4g",
        },
    )
    yield s
