from __future__ import annotations

import os

import pytest

SF_TEST_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMOKE_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from ex_aws_firehose_spark.session import get_spark

    # Modest parallelism for tests: tiny data, many queries.
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark(app_name="ex-aws-firehose-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_TEST_DIR


@pytest.fixture(scope="session")
def smoke_dir():
    return SF_SMOKE_DIR
