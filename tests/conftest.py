from __future__ import annotations

import pytest

from graph_database_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("gds-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def toy(spark):
    from graph_database_spark.sources.toy import toy_dataset
    return toy_dataset(spark)
