from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from real_time_ai_enhanced_crowd_surveillance_with__big_data_analytics_spark import (  # noqa: E402
    get_spark,
)

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
