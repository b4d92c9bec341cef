import pytest


@pytest.fixture(scope="session")
def spark():
    from proj_spark.spark.session import get_spark
    s = get_spark(app="proj_spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
