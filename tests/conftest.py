"""Shared Spark fixture for the test suite — one local session, small
parallelism so the suite stays fast (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from flink_sql_ai_meetingcoach_azure_spark import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        master="local[4]",
        extra_conf={"spark.sql.shuffle.partitions": "4"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
