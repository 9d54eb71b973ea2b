import pytest

from dug_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dug_spark_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
