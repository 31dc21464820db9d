from __future__ import annotations

import pytest

from phabricator_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return "/root/testdata/sf0.001"
