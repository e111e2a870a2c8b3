import pytest

from seriesly_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("seriesly-spark-tests", cpus=4, shuffle_partitions=4)
    yield s
