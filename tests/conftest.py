from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from olist_data_warehouse_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    # Fresh warehouse dir per test session: the default ./spark-warehouse
    # outlives the (in-memory) catalog, and a leftover table directory
    # makes saveAsTable fail with LOCATION_ALREADY_EXISTS.
    wh = str(tmp_path_factory.mktemp("spark-warehouse"))
    s = get_spark(
        "olist_dw_tests", cpus=8,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
