import pytest

from arctic_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("arctic_spark-tests", master="local[4]",
                  shuffle_partitions=4)
    yield s
    s.stop()
