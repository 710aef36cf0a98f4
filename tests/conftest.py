from __future__ import annotations

import tempfile

import pytest

from pg2any_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # warehouse dir outside the repo: bucketed-table tests saveAsTable
    s = get_spark(
        app_name="pg2any_spark-tests",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="pg2any-warehouse-")
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
