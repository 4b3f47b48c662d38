from __future__ import annotations

import pytest

from firebird_mapreduce_spark.session import get_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    session = get_session("firebird-mapreduce-spark-tests")
    yield session
    session.stop()
