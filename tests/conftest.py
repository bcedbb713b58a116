from __future__ import annotations

import pytest

from marc_data_migration_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", parallelism=4, shuffle_partitions=4)
    yield s
