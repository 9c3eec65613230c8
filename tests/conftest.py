from __future__ import annotations

import pytest

from ner4cti_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ner4cti_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
