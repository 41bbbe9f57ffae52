from __future__ import annotations

import pytest

from minerva_etl_46_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="minerva-tests", cpus=8, shuffle_partitions=8, driver_memory="8g"
    )
    yield s
    s.stop()
