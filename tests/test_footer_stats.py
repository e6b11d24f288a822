"""Footer-derived write stats must reproduce the stats-scan exactly.

r13 optimization: ``LakeTable._stage_files`` reads per-file stats from
the parquet footers the staging write produced instead of re-scanning
the staged data with a second Spark job. These tests pin the
equivalence on the awkward cases (long strings, NULL-only columns,
NaN doubles, naive + instant timestamps, dates, booleans, Hive
partition values incl. the null partition) by computing the manifest
BOTH ways over identical data and diffing it, and pin that the footer
path actually fires (no silent always-fallback)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from olist_data_warehouse_spark.sources import lakehouse
from olist_data_warehouse_spark.sources.lakehouse import LakeTable


def _tricky_frame(spark):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("long_s", T.StringType()),
            T.StructField("all_null", T.StringType()),
            T.StructField("f", T.DoubleType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("d", T.DateType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("tsn", T.TimestampNTZType()),
            T.StructField("p", T.StringType()),
        ]
    )
    rows = [
        (
            1,
            "alpha",
            "x" * 500,
            None,
            float("nan"),
            True,
            datetime.date(2024, 1, 2),
            datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
            datetime.datetime(2024, 1, 2, 3, 4, 5, 654321),
            "F",
        ),
        (
            2,
            "omega",
            "y" * 500,
            None,
            1.5,
            False,
            datetime.date(2024, 6, 30),
            datetime.datetime(2024, 6, 30, 23, 59, 59),
            datetime.datetime(2024, 6, 30, 23, 59, 58),
            "O",
        ),
        (3, None, "m", None, None, None, None, None, None, None),
    ]
    return spark.createDataFrame(rows, schema)


def _metas_both_ways(monkeypatch, df, path, **kwargs):
    t = LakeTable.create(df, path, **kwargs)
    footer = t._state()["files"]
    monkeypatch.setattr(lakehouse, "_footer_metas", lambda *a, **k: None)
    t2 = LakeTable.create(df, path + "_scan", **kwargs)
    scan = t2._state()["files"]
    return footer, scan


def _stats_by_rows(files):
    """Stats keyed by (rows, frozenset of stat items) — file NAMES
    differ between the two writes, content must not."""
    out = []
    for meta in sorted(files.values(), key=lambda m: m["path"]):
        out.append((meta["rows"], meta["stats"], meta.get("partition")))
    return sorted(out, key=lambda x: (x[0], str(x[1])))


def test_footer_stats_match_scan_unpartitioned(spark, tmp_path, monkeypatch):
    df = _tricky_frame(spark).coalesce(1)
    footer, scan = _metas_both_ways(
        monkeypatch, df, str(tmp_path / "t")
    )
    f, s = _stats_by_rows(footer), _stats_by_rows(scan)
    # NaN != NaN, so compare through repr (json serializes both as NaN)
    assert repr(f) == repr(s)
    # and the footer path actually carried full-length string stats
    (_, stats, _) = f[0]
    assert len(stats["long_s"]["max"]) == 500
    assert stats["all_null"] == {"min": None, "max": None, "nulls": 3}


def test_footer_stats_match_scan_partitioned(spark, tmp_path, monkeypatch):
    df = _tricky_frame(spark).coalesce(1)
    footer, scan = _metas_both_ways(
        monkeypatch, df, str(tmp_path / "p"), partition_by=["p"]
    )
    f, s = _stats_by_rows(footer), _stats_by_rows(scan)
    assert repr(f) == repr(s)
    parts = {str(p) for (_, _, p) in f}
    assert parts == {"{'p': 'F'}", "{'p': 'O'}", "{'p': None}"}


def test_footer_path_fires(spark, tmp_path, monkeypatch):
    """The optimization must actually be in use on a plain frame — a
    regression to permanent fallback would silently reinstate the
    second data pass."""
    called = {}
    real = lakehouse._footer_metas

    def spy(*a, **k):
        r = real(*a, **k)
        called["returned_none"] = r is None
        return r

    monkeypatch.setattr(lakehouse, "_footer_metas", spy)
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    LakeTable.create(df, str(tmp_path / "fires"))
    assert called == {"returned_none": False}


def test_footer_nan_multigroup_merge():
    """_footer_lt must treat NaN as largest regardless of argument
    order (Python min/max with NaN are order-dependent)."""
    nan = float("nan")
    assert lakehouse._footer_lt(1.5, nan)
    assert not lakehouse._footer_lt(nan, 1.5)
    assert not lakehouse._footer_lt(nan, nan)


def test_partition_value_parse_roundtrip():
    p = lakehouse._parse_partition_value
    assert p("42", "bigint") == 42
    assert p("x y", "string") == "x y"
    assert p("true", "boolean") is True
    assert p("2024-01-02", "date") == datetime.date(2024, 1, 2)
    with pytest.raises(ValueError):
        p("maybe", "boolean")
