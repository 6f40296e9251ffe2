import pytest


@pytest.fixture(scope="session")
def spark():
    from tdengine_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=4)
    yield s
