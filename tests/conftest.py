from __future__ import annotations

import pytest

from wrds2pg_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="wrds2pg_spark_tests",
        shuffle_partitions=8,
        driver_memory="8g",
    )
    yield spark
