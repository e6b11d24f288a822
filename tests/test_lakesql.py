"""SQL-text DML dispatcher (r11 verdict item #2): MERGE INTO /
DELETE FROM / UPDATE statements over register_table lake views route
to the LakeTable engines — plus the engine extensions that make the
SQL surface honest (per-clause SET maps, column-list INSERT)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_data_warehouse_spark.sources import lakebatch, lakesql
from olist_data_warehouse_spark.sources.lakehouse import LakeTable


@pytest.fixture()
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def _make(spark, orders, tmp_path, name, df=None, **create_kw):
    t = LakeTable.create(
        (df if df is not None else orders).repartition(4),
        str(tmp_path / name),
        **create_kw,
    )
    lakebatch.register_table(spark, name, t.path)
    return t


def _rows(df):
    return sorted(
        tuple(r) for r in df.select(*sorted(df.columns)).collect()
    )


# ---------------------------------------------------------------- DELETE

def test_sql_delete_with_alias_and_prune(spark, orders, tmp_path):
    t = LakeTable.create(
        orders.repartitionByRange(6, "o_totalprice"),
        str(tmp_path / "del"),
    )
    lakebatch.register_table(spark, "del_t", t.path)
    r = lakesql.sql(
        spark,
        "DELETE FROM del_t AS o WHERE o.o_totalprice > 400000.0;",
    )
    assert r["rows_deleted"] > 0
    want = _rows(
        orders.where(
            F.col("o_totalprice").isNull()
            | (F.col("o_totalprice") <= 400000.0)
        )
    )
    assert _rows(t.read(spark)) == want
    # range clustering + auto-derived prune: some files untouched
    assert r["files_kept"] > 0


def test_sql_delete_no_where_empties_table(spark, orders, tmp_path):
    t = _make(spark, orders, tmp_path, "del_all")
    lakesql.sql(spark, "DELETE FROM del_all")
    assert t.read(spark).count() == 0


# ---------------------------------------------------------------- UPDATE

def test_sql_update(spark, orders, tmp_path):
    t = _make(spark, orders, tmp_path, "upd_t")
    r = lakesql.sql(
        spark,
        "UPDATE upd_t SET o_orderpriority = upper(o_orderpriority), "
        "o_totalprice = o_totalprice + 1.0 "
        "WHERE o_orderstatus = 'F'",
    )
    assert r["rows_updated"] > 0
    isf = F.col("o_orderstatus") == "F"
    want = _rows(
        orders.withColumn(
            "o_orderpriority",
            F.when(isf, F.upper("o_orderpriority")).otherwise(
                F.col("o_orderpriority")
            ),
        ).withColumn(
            "o_totalprice",
            F.when(isf, F.col("o_totalprice") + 1.0).otherwise(
                F.col("o_totalprice")
            ),
        )
    )
    assert _rows(t.read(spark)) == want


def test_sql_update_string_literal_with_keyword(spark, orders, tmp_path):
    """'WHERE'/'SET' inside string literals must not split parsing."""
    t = _make(spark, orders, tmp_path, "upd_lit")
    lakesql.sql(
        spark,
        "UPDATE upd_lit SET o_orderpriority = ' WHERE SET , ''x'' ' "
        "WHERE o_orderkey = 1",
    )
    got = t.read(spark).where(F.col("o_orderkey") == 1).collect()
    assert all(r["o_orderpriority"] == " WHERE SET , 'x' " for r in got)


# ----------------------------------------------------------------- MERGE

def test_sql_merge_full_grammar(spark, orders, tmp_path):
    """One statement: conditional DELETE, chained partial-SET UPDATE,
    conditional column-list INSERT, by-source UPDATE SET."""
    target = orders.where(F.col("o_orderkey") % 4 != 0)
    t = _make(spark, orders, tmp_path, "mg_t", df=target)
    src = (
        orders.where(F.col("o_orderkey") % 2 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 0.5)
        .withColumn("o_orderstatus", F.lit("XX"))
    )
    src.createOrReplaceTempView("mg_src")
    r = lakesql.sql(
        spark,
        """
        MERGE INTO mg_t AS t
        USING mg_src AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND t.o_totalprice > 300000.0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET
             o_totalprice = s.o_totalprice,
             o_orderpriority = '5-SQLSET'
        WHEN NOT MATCHED AND s.o_totalprice < 100000.0 THEN INSERT *
        WHEN NOT MATCHED BY SOURCE AND t.o_orderstatus = 'F'
             THEN UPDATE SET o_orderpriority = '0-MERGED'
        """,
    )
    assert r["rows_matched"] > 0

    # expected: dataframe-level expansion of the same clauses
    tgt, s = target.alias("t"), src.alias("s")
    j = tgt.join(s, F.col("t.o_orderkey") == F.col("s.o_orderkey"))
    kept_updated = j.where(
        ~F.coalesce(F.col("t.o_totalprice") > 300000.0, F.lit(False))
    ).select(
        "t.o_orderkey",
        "t.o_custkey",
        "t.o_orderstatus",  # NOT assigned: keeps target ('XX' would
        # mean a wrong full-row replace)
        F.col("s.o_totalprice").alias("o_totalprice"),
        "t.o_orderdate",
        F.lit("5-SQLSET").alias("o_orderpriority"),
    )
    by_src = tgt.join(s, ["o_orderkey"], "left_anti").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        F.when(F.col("o_orderstatus") == "F", "0-MERGED")
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    )
    inserted = (
        s.join(tgt, ["o_orderkey"], "left_anti")
        .where(F.col("o_totalprice") < 100000.0)
        .select(*target.columns)
    )
    want = _rows(kept_updated.unionByName(by_src).unionByName(inserted))
    assert _rows(t.read(spark)) == want


def test_sql_merge_insert_column_list(spark, orders, tmp_path):
    """INSERT (cols) VALUES (exprs): omitted columns land NULL,
    expressions evaluate over the source row."""
    target = orders.where(F.col("o_orderkey") % 3 == 0)
    t = _make(spark, orders, tmp_path, "mg_ins", df=target)
    orders.createOrReplaceTempView("mg_ins_src")
    lakesql.sql(
        spark,
        """
        MERGE INTO mg_ins USING mg_ins_src AS s
        ON mg_ins.o_orderkey = s.o_orderkey
        WHEN NOT MATCHED THEN INSERT
             (o_orderkey, o_totalprice, o_orderpriority)
             VALUES (s.o_orderkey, s.o_totalprice * 2.0, 'NEW')
        """,
    )
    got = t.read(spark)
    new = got.where(F.col("o_orderkey") % 3 != 0)
    assert new.where(F.col("o_custkey").isNotNull()).count() == 0
    assert new.where(F.col("o_orderpriority") != "NEW").count() == 0
    want_price = _rows(
        orders.where(F.col("o_orderkey") % 3 != 0).select(
            "o_orderkey", (F.col("o_totalprice") * 2.0).alias("p")
        )
    )
    assert _rows(new.select("o_orderkey", "o_totalprice")) == want_price
    # matched rows untouched (no WHEN MATCHED clause)
    assert _rows(got.where(F.col("o_orderkey") % 3 == 0)) == _rows(target)


def test_sql_merge_using_subquery(spark, orders, tmp_path):
    t = _make(spark, orders, tmp_path, "mg_sub",
              df=orders.where(F.col("o_orderkey") % 2 == 0))
    orders.createOrReplaceTempView("mg_sub_src")
    lakesql.sql(
        spark,
        """
        MERGE INTO mg_sub t
        USING (SELECT * FROM mg_sub_src WHERE o_orderkey % 2 = 1) s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """,
    )
    assert _rows(t.read(spark)) == _rows(orders)


def test_sql_merge_set_star_full_row(spark, orders, tmp_path):
    t = _make(spark, orders, tmp_path, "mg_star")
    src = orders.withColumn("o_totalprice", F.col("o_totalprice") + 7.0)
    src.createOrReplaceTempView("mg_star_src")
    lakesql.sql(
        spark,
        "MERGE INTO mg_star t USING mg_star_src s "
        "ON t.o_orderkey = s.o_orderkey "
        "WHEN MATCHED THEN UPDATE SET *",
    )
    assert _rows(t.read(spark)) == _rows(src)


# ---------------------------------------------------------------- errors

def test_sql_unregistered_table_raises(spark):
    with pytest.raises(ValueError, match="not a registered lake"):
        lakesql.sql(spark, "DELETE FROM nope WHERE 1 = 1")


def test_sql_snapshot_view_is_not_dml_target(spark, orders, tmp_path):
    t = LakeTable.create(orders, str(tmp_path / "snap"))
    lakebatch.register_table(spark, "snap_v0", t.path, version=0)
    with pytest.raises(ValueError, match="not a registered lake"):
        lakesql.sql(spark, "DELETE FROM snap_v0")


def test_sql_merge_rejects_cross_named_keys(spark, orders, tmp_path):
    _make(spark, orders, tmp_path, "mg_bad")
    orders.createOrReplaceTempView("mg_bad_src")
    with pytest.raises(ValueError, match="share a column name"):
        lakesql.sql(
            spark,
            "MERGE INTO mg_bad t USING mg_bad_src s "
            "ON t.o_orderkey = s.o_custkey "
            "WHEN MATCHED THEN DELETE",
        )


def test_sql_merge_rejects_non_equi_on(spark, orders, tmp_path):
    _make(spark, orders, tmp_path, "mg_bad2")
    orders.createOrReplaceTempView("mg_bad2_src")
    with pytest.raises(ValueError, match="conjunction"):
        lakesql.sql(
            spark,
            "MERGE INTO mg_bad2 t USING mg_bad2_src s "
            "ON t.o_orderkey > s.o_orderkey "
            "WHEN MATCHED THEN DELETE",
        )


def test_sql_select_falls_through(spark, orders, tmp_path):
    t = _make(spark, orders, tmp_path, "ro_t")
    del t
    got = lakesql.sql(
        spark, "SELECT count(*) AS n FROM ro_t"
    ).first()["n"]
    assert got == orders.count()


# --------------------------------------------- engine-level extensions

def test_engine_partial_set_keeps_unassigned(spark, orders, tmp_path):
    t = LakeTable.create(orders, str(tmp_path / "eng_set"))
    src = orders.withColumn("o_custkey", F.lit(-1).cast("long"))
    r = t.merge_into(
        spark,
        src,
        ["o_orderkey"],
        matched_clauses=[
            ("update", None, {"o_totalprice": "t.o_totalprice + s.o_totalprice"})
        ],
        when_not_matched="keep",
    )
    assert r["rows_matched_changed"] == orders.count()
    got = t.read(spark)
    # o_custkey unassigned: must keep target, never take -1
    assert got.where(F.col("o_custkey") == -1).count() == 0
    want = _rows(
        orders.withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    assert _rows(got) == want


def test_engine_set_map_rejects_unknown_and_type_drift(
    spark, orders, tmp_path
):
    t = LakeTable.create(orders, str(tmp_path / "eng_bad"))
    with pytest.raises(ValueError, match="unknown columns"):
        t.merge_into(
            spark, orders, ["o_orderkey"],
            matched_clauses=[("update", None, {"nope": "1"})],
        )
    with pytest.raises(ValueError):
        t.merge_into(
            spark, orders, ["o_orderkey"],
            matched_clauses=[
                ("update", None, {"o_totalprice": "'not a number'"})
            ],
        )


def test_engine_set_map_only_on_update(spark, orders, tmp_path):
    t = LakeTable.create(orders, str(tmp_path / "eng_bad2"))
    with pytest.raises(ValueError, match="update"):
        t.merge_into(
            spark, orders, ["o_orderkey"],
            matched_clauses=[("delete", None, {"o_totalprice": "1.0"})],
        )


# ------------------------------------------------- maintenance surface

def test_sql_insert_into_select(spark, orders, tmp_path):
    half = orders.where(F.col("o_orderkey") % 2 == 0)
    t = _make(spark, orders, tmp_path, "ins_sel", df=half)
    orders.where(F.col("o_orderkey") % 2 != 0).createOrReplaceTempView(
        "ins_sel_src"
    )
    r = lakesql.sql(
        spark, "INSERT INTO ins_sel SELECT * FROM ins_sel_src"
    )
    assert r["version"] == 1
    assert _rows(t.read(spark)) == _rows(orders)


def test_sql_insert_overwrite(spark, orders, tmp_path):
    t = _make(spark, orders, tmp_path, "ins_ovw")
    orders.limit(7).createOrReplaceTempView("ins_ovw_src")
    lakesql.sql(
        spark, "INSERT OVERWRITE ins_ovw SELECT * FROM ins_ovw_src"
    )
    assert t.read(spark).count() == 7


def test_sql_insert_values_with_column_list(spark, orders, tmp_path):
    t = _make(spark, orders, tmp_path, "ins_val", df=orders.limit(0))
    r = lakesql.sql(
        spark,
        "INSERT INTO ins_val (o_orderkey, o_orderpriority) "
        "VALUES (CAST(1 AS BIGINT), 'A'), (CAST(2 AS BIGINT), 'B')",
    )
    assert r["version"] == 1
    got = t.read(spark)
    assert got.count() == 2
    # omitted columns landed NULL
    assert got.where(F.col("o_custkey").isNotNull()).count() == 0
    assert sorted(
        (r2["o_orderkey"], r2["o_orderpriority"])
        for r2 in got.collect()
    ) == [(1, "A"), (2, "B")]


def test_sql_insert_non_lake_falls_through(spark, orders, tmp_path):
    """INSERT into a non-lake target goes to spark.sql (catalog
    tables support it natively)."""
    spark.sql("DROP TABLE IF EXISTS ins_cat")
    orders.limit(0).write.saveAsTable("ins_cat")
    lakesql.sql(
        spark,
        "INSERT INTO ins_cat SELECT * FROM ins_cat",  # no-op insert
    )
    assert spark.table("ins_cat").count() == 0
    spark.sql("DROP TABLE IF EXISTS ins_cat")


def test_sql_vacuum_grammar(spark, orders, tmp_path):
    t = _make(spark, orders, tmp_path, "vac_t")
    t.overwrite(orders.limit(5))
    with pytest.raises(ValueError, match="safety floor"):
        lakesql.sql(spark, "VACUUM vac_t RETAIN 0 HOURS")
    would = lakesql.sql(spark, "VACUUM vac_t RETAIN 0 HOURS DRY RUN FORCE")
    assert would
    import os as _os
    assert all(
        _os.path.exists(_os.path.join(t.path, p)) for p in would
    ), "DRY RUN must not delete"
    removed = lakesql.sql(spark, "VACUUM vac_t RETAIN 0 HOURS FORCE")
    assert sorted(removed) == sorted(would)
    with pytest.raises(ValueError, match="cannot parse VACUUM clause"):
        lakesql.sql(spark, "VACUUM vac_t BANANAS")


def test_sql_restore_version(spark, orders, tmp_path):
    t = _make(spark, orders, tmp_path, "res_t")
    t.overwrite(orders.limit(5))
    r = lakesql.sql(spark, "RESTORE TABLE res_t TO VERSION AS OF 0")
    assert r["version"] == 2
    assert _rows(t.read(spark)) == _rows(orders)


def test_sql_optimize_zorder(spark, orders, tmp_path):
    t = _make(spark, orders, tmp_path, "opt_t")
    res = lakesql.sql(
        spark,
        "OPTIMIZE opt_t ZORDER BY (o_orderkey, o_totalprice)",
    )
    assert res["version"] >= 1
    assert _rows(t.read(spark)) == _rows(orders)
    with pytest.raises(ValueError, match="stats predicates"):
        lakesql.sql(
            spark, "OPTIMIZE opt_t WHERE o_orderstatus = 'F'"
        )


def test_sql_describe_history(spark, orders, tmp_path):
    t = _make(spark, orders, tmp_path, "hist_t")
    t.append(orders.limit(3))
    t.overwrite(orders.limit(5))
    df = lakesql.sql(spark, "DESCRIBE HISTORY hist_t LIMIT 2")
    rows = df.orderBy("version").collect()
    assert [r["version"] for r in rows] == [1, 2]
    assert rows[1]["op"] == "overwrite"
    full = lakesql.sql(spark, "DESCRIBE HISTORY hist_t")
    assert full.count() == 3
