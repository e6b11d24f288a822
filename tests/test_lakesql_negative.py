"""Negative-grammar battery for the lakesql dispatcher (r12 verdict
#3): every statement route gets fed syntax it does NOT support and
must reject loudly with a targeted message — a silent misparse can
never ship. Companion mask-mutation guards pin that the rejects scan
the MASK, so keywords inside string literals never trip them (a
mutation that breaks one _mask rule fails these).

Rejects for routes not covered here live in test_lakesql.py:
MERGE cross-named/non-equi ON keys, INSERT unknown columns / count
mismatch, VACUUM leftover clause / retention floor, RESTORE grammar,
OPTIMIZE non-stats WHERE, ALTER duplicate/unknown columns, CREATE
option conflicts, REPLACE WHERE with column list / OVERWRITE.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_data_warehouse_spark.sources import lakebatch, lakesql
from olist_data_warehouse_spark.sources.lakehouse import LakeTable


@pytest.fixture()
def t(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = LakeTable.create(orders.limit(200), str(tmp_path / "neg"))
    lakebatch.register_table(spark, "neg_t", t.path)
    return t


# ------------------------------------------------- nested subqueries

def test_delete_rejects_subquery_in_where(spark, t):
    with pytest.raises(ValueError, match="subqueries.*DELETE WHERE"):
        lakesql.sql(
            spark,
            "DELETE FROM neg_t WHERE o_custkey IN "
            "(SELECT o_custkey FROM neg_t WHERE o_totalprice > 1)",
        )


def test_update_rejects_scalar_subquery_in_set(spark, t):
    with pytest.raises(ValueError, match="subqueries.*UPDATE SET"):
        lakesql.sql(
            spark,
            "UPDATE neg_t SET o_totalprice = "
            "(SELECT MAX(o_totalprice) FROM neg_t)",
        )


def test_update_rejects_correlated_where(spark, t):
    with pytest.raises(ValueError, match="subqueries.*UPDATE WHERE"):
        lakesql.sql(
            spark,
            "UPDATE neg_t SET o_totalprice = 0 WHERE EXISTS "
            "(SELECT 1 FROM neg_t i WHERE i.o_orderkey = "
            "neg_t.o_orderkey)",
        )


def test_merge_rejects_subquery_in_when_clause(spark, t):
    spark.range(3).toDF("o_orderkey").createOrReplaceTempView(
        "neg_src"
    )
    with pytest.raises(ValueError, match="subqueries.*MERGE WHEN"):
        lakesql.sql(
            spark,
            "MERGE INTO neg_t USING neg_src AS s "
            "ON neg_t.o_orderkey = s.o_orderkey "
            "WHEN MATCHED AND neg_t.o_totalprice > "
            "(SELECT AVG(o_totalprice) FROM neg_t) THEN DELETE",
        )


def test_insert_rejects_subquery_in_values(spark, t):
    with pytest.raises(ValueError, match="subqueries.*VALUES"):
        lakesql.sql(
            spark,
            "INSERT INTO neg_t (o_orderkey) VALUES "
            "((SELECT MAX(o_orderkey) + 1 FROM neg_t))",
        )


def test_replace_where_rejects_subquery_predicate(spark, t):
    with pytest.raises(ValueError, match="subqueries.*REPLACE WHERE"):
        lakesql.sql(
            spark,
            "INSERT INTO neg_t REPLACE WHERE o_orderkey IN "
            "(SELECT o_orderkey FROM neg_t) SELECT * FROM neg_t",
        )


# ------------------------------- mask-mutation guards (literals with
# keywords must NOT trip the rejects — these fail if a _mask rule or
# a reject scans raw text instead of the mask)

def test_literal_select_does_not_trip_subquery_reject(spark, t):
    r = lakesql.sql(
        spark,
        "UPDATE neg_t SET o_orderpriority = 'SELECT FROM WHERE' "
        "WHERE o_orderkey = 1",
    )
    assert r["rows_updated"] <= 1
    got = (
        t.read(spark)
        .where(F.col("o_orderkey") == 1)
        .select("o_orderpriority")
        .collect()
    )
    assert all(x["o_orderpriority"] == "SELECT FROM WHERE" for x in got)


def test_literal_select_in_delete_where_is_fine(spark, t):
    before = t.read(spark).count()
    r = lakesql.sql(
        spark,
        "DELETE FROM neg_t WHERE o_orderpriority = "
        "'(SELECT nope AND 1 = 1)'",
    )
    assert r["rows_deleted"] == 0
    assert t.read(spark).count() == before


# --------------------------------------- per-route grammar rejects

def test_merge_rejects_join_in_using(spark, t):
    """Multi-table USING (a JOIN b) must be parenthesized as a
    subquery; the bare form is outside the grammar."""
    with pytest.raises(ValueError, match="cannot parse table"):
        lakesql.sql(
            spark,
            "MERGE INTO neg_t USING a JOIN b ON a.k = b.k "
            "ON neg_t.o_orderkey = a.k WHEN MATCHED THEN DELETE",
        )


def test_merge_rejects_missing_using(spark, t):
    with pytest.raises(ValueError, match="USING"):
        lakesql.sql(
            spark,
            "MERGE INTO neg_t ON 1 = 1 WHEN MATCHED THEN DELETE",
        )


def test_merge_rejects_unparseable_when_kind(spark, t):
    spark.range(3).toDF("o_orderkey").createOrReplaceTempView(
        "neg_src2"
    )
    with pytest.raises(
        ValueError, match="must be UPDATE SET or DELETE"
    ):
        lakesql.sql(
            spark,
            "MERGE INTO neg_t USING neg_src2 AS s "
            "ON neg_t.o_orderkey = s.o_orderkey "
            "WHEN MATCHED THEN UPSERT",
        )


def test_describe_history_rejects_trailing_garbage(spark, t):
    with pytest.raises(
        ValueError, match="cannot parse DESCRIBE HISTORY"
    ):
        lakesql.sql(spark, "DESCRIBE HISTORY neg_t SINCE YESTERDAY")


def test_copy_into_rejects_bad_grammar(spark, t):
    with pytest.raises(ValueError, match="cannot parse COPY INTO"):
        lakesql.sql(
            spark, "COPY INTO neg_t FROM '/x' PATTERN = '*.csv'"
        )


def test_update_rejects_unparseable_set(spark, t):
    with pytest.raises(ValueError, match="cannot parse SET"):
        lakesql.sql(spark, "UPDATE neg_t SET 42")


def test_optimize_rejects_bad_zorder(spark, t):
    with pytest.raises(ValueError, match="ZORDER"):
        lakesql.sql(spark, "OPTIMIZE neg_t ZORDER BY o_orderkey")
