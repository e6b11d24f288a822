"""Every oracle's result schema must be portable to the driver's hasher.

The driver compares Spark and DuckDB results by hashing canonicalized
cells, which breaks in two known ways:

- DuckDB silently promotes SUM(BIGINT) → HUGEINT (int128); Spark has no
  int128, so the hash differs even when every value matches
  (CORRECTNESS_r01: dedup_simhash had 0/5000 differing rows yet
  hash_match=false).
- Nested cells (LIST/STRUCT/MAP) are unhashable in the driver's pandas
  canonicalizer (multi_extract_features crashed it with array<double>).

This test DESCRIBEs every registered oracle against the real testdata
views and rejects both classes before the driver ever sees them.
"""

from __future__ import annotations

import pytest

from olist_data_warehouse_spark.plans.queries import REGISTRY
from tests.oracle_check import duckdb_conn

# int128s Spark cannot mirror (DECIMAL is banned separately below)
_BANNED_SUBSTR = ("HUGEINT", "INT128")
# nested types the driver's canonicalizer can't sort/hash
_BANNED_PREFIX = ("STRUCT", "MAP", "UNION")

WITH_ORACLE = sorted(n for n, rq in REGISTRY.items() if rq.oracle is not None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_output_types_portable(sf_dir, name):
    con = duckdb_conn(sf_dir)
    try:
        rows = con.execute("DESCRIBE " + REGISTRY[name].oracle).fetchall()
    finally:
        con.close()
    assert rows, f"{name}: DESCRIBE returned no columns"
    for col, typ, *_ in rows:
        u = typ.upper()
        assert not any(b in u for b in _BANNED_SUBSTR), (
            f"{name}.{col} is {typ}: DuckDB int128 never hash-matches Spark "
            f"— CAST the outer aggregate to BIGINT in the oracle SQL"
        )
        assert not u.endswith("[]") and not u.startswith(_BANNED_PREFIX), (
            f"{name}.{col} is {typ}: nested cells break the driver's "
            f"canonicalizer — explode/serialize to scalar columns"
        )
        assert not u.startswith("DECIMAL"), (
            f"{name}.{col} is {typ}: DuckDB's pandas conversion degrades "
            f"every DECIMAL to float64 while Spark hands the driver "
            f"decimal.Decimal objects, so the hash can NEVER match even on "
            f"identical values (w2_running_total was red for two rounds on "
            f"exactly this). Accumulate in integer cents (BIGINT) or emit "
            f"DOUBLE instead."
        )


def test_money_columns_are_two_decimal_contract(spark):
    """Every integer-cents oracle (w2, w6, a13, a14, dq, ...) assumes
    money-like columns carry <= 2 decimals, so round(x*100) never lands
    on an exact .5 — the one case where Spark (HALF_UP) and DuckDB
    (half away from zero vs half even) could disagree. Pin the data
    contract: if a future testdata generation adds precision, this
    fails loudly instead of a hash mismatch appearing downstream."""
    from pyspark.sql import functions as F

    from olist_data_warehouse_spark.sources.readers import load_testdata

    sf = "/root/testdata/sf0.001"
    checks = {
        "events": ["value"],
        "lineitem": ["l_extendedprice", "l_discount", "l_tax", "l_quantity"],
        "orders": ["o_totalprice"],
    }
    for table, cols in checks.items():
        df = load_testdata(spark, sf, (table,))[table]
        for c in cols:
            off = df.filter(
                F.abs(F.col(c) * 100 - F.round(F.col(c) * 100, 0)) > 1e-6
            ).count()
            assert off == 0, (
                f"{table}.{c} has values with >2 decimals ({off} rows) — "
                f"integer-cents oracles are no longer exact"
            )
