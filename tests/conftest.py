import pytest


@pytest.fixture(scope="session")
def spark():
    from aezspark.session import get_spark

    s = get_spark("aezspark-tests", master="local[8]")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fx_dir():
    from aezspark.fixtures.generate import ensure_fixtures

    return ensure_fixtures()


@pytest.fixture(scope="session")
def world(spark, fx_dir):
    from aezspark.pipelines import World

    return World(spark, fx_dir)
