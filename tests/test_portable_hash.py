"""Property test: the portable 32-bit hash family is bit-identical
between Spark and DuckDB on arbitrary unicode input.

Every sampling membership, split assignment, LSH bucket, Bloom bit, and
sketch register in the engine derives from ``portable_hash32`` (md5 of
the UTF-8 bytes, first 8 hex digits as an integer). If the two engines
ever disagreed on any input — encoding, NULs, astral-plane codepoints —
whole oracle families would silently diverge, so the invariant gets an
adversarial property test rather than a handful of fixtures.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from olist_data_warehouse_spark.operators.textops import portable_hash32

# Full unicode minus surrogates (not encodable to UTF-8 — both engines
# would reject them at ingestion, so they can't reach the hash).
_TEXT = st.text(
    alphabet=st.characters(
        min_codepoint=0, max_codepoint=0x10FFFF, exclude_categories=("Cs",)
    ),
    max_size=200,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_TEXT, min_size=1, max_size=24, unique=True))
def test_portable_hash_identical_across_engines(spark, strings):
    sdf = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {
        r.s: r.h
        for r in sdf.select(
            "s", portable_hash32(F.col("s")).alias("h")
        ).collect()
    }
    con = duckdb.connect()
    try:
        for s in strings:
            want = con.execute(
                "SELECT ('0x' || substr(md5(?), 1, 8))::BIGINT", [s]
            ).fetchone()[0]
            assert got[s] == want, f"hash diverged on {s!r}"
    finally:
        con.close()


def test_portable_hash_known_adversarial_fixtures(spark):
    """Deterministic complement to the property test: the cases that
    would break a naive implementation (empty string, NUL/control
    bytes, multi-byte UTF-8, 10k-char payloads)."""
    cases = [
        "", "a", "hello world", "naïve café", "日本語テキスト",
        "🎉emoji🎉", "tab\tnewline\n", 'quote\'dq"', "nul\x01ctl",
        "x" * 10_000, "ünïcödé mix 混合 ñ", "\\backslash\\", "%percent%",
    ]
    sdf = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {
        r.s: r.h
        for r in sdf.select(
            "s", portable_hash32(F.col("s")).alias("h")
        ).collect()
    }
    con = duckdb.connect()
    try:
        for c in cases:
            want = con.execute(
                "SELECT ('0x' || substr(md5(?), 1, 8))::BIGINT", [c]
            ).fetchone()[0]
            assert got[c] == want, f"hash diverged on {c!r}"
    finally:
        con.close()
