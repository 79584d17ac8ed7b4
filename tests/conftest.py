import pytest


@pytest.fixture(scope="session")
def spark():
    from img_spark.plans.session import get_spark

    s = get_spark(app="img-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
