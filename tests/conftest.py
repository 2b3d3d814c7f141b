from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from vlm_ocr_pipeline_spark.plans.session import get_spark

    s = get_spark(app="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
