from __future__ import annotations

import os

import pytest

from mongodb_cdc_spark.registry import load_all_operators
from mongodb_cdc_spark.session import get_spark
from mongodb_cdc_spark.testing import duckdb_connect

# sf0.001 keeps the suite fast; set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
# for a pre-driver full-parity run at the driver's scale.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="mongodb-cdc-spark-tests",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
    )
    load_all_operators()
    yield s


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb_connect(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
