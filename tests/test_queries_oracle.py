"""Differential test: every registered query vs its DuckDB oracle.

This is a local replica of the driver's correctness gate (t2), run at
sf0.001 so it's fast enough for the inner loop. A query that passes
here should hash-match in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import pytest

from olist_data_warehouse_spark.plans.queries import REGISTRY
from tests.oracle_check import compare_query

ALL = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, sf_dir, name):
    ok, detail = compare_query(spark, sf_dir, name)
    assert ok, f"{name}: {detail}"
