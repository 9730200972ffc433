from __future__ import annotations

import pytest

from gentropy_spark.session import get_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="gentropy_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(autouse=True, scope="module")
def _release_tracked_caches():
    """Unpersist operator-tracked intermediates between test modules so
    a long pytest session cannot accumulate storage memory (ADVICE r2:
    release_caches was defined but never invoked in teardown)."""
    yield
    from gentropy_spark.session import release_caches

    release_caches()
