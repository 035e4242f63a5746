import pytest

from french_admin_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=4, shuffle_partitions=4)
    yield s


@pytest.fixture()
def tmp_root(tmp_path):
    return str(tmp_path)
