import pytest

from pyramidscheme_jl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="pytest", master="local[4]", shuffle_partitions=8)
    yield s
