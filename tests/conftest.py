import os

import pytest

from seriesly_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # Env knobs for partition-sensitivity shake-outs: results must be
    # invariant to cores and shuffle-partition count (hash-based
    # sampling, window determinism, decimal-exact sums). CI default
    # stays 4/4.
    cpus = int(os.environ.get("SPARK_TEST_CPUS", "4"))
    sp = int(os.environ.get("SPARK_TEST_SHUFFLE_PARTITIONS", str(cpus)))
    s = get_spark("seriesly-spark-tests", cpus=cpus, shuffle_partitions=sp)
    yield s
