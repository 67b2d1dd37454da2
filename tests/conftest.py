from __future__ import annotations

import pytest

from stream_cdc_gps_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # Modest parallelism for the tiny test corpus: less scheduler overhead
    # than local[32], still exercises multi-partition shuffles.
    s = get_spark(
        app_name="tests",
        master="local[4]",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    yield s
