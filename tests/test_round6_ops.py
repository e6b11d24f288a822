"""Round-6 operator gates.

a13_approx_percentile_cert pins a CERTIFICATE (the GK sketch's
rank-error contract holds), not the approx values themselves — so its
oracle is a constant-verdict pin and the real checking power lives
here: the bracket predicate must accept exactly the guarantee window
(negative controls), and the end-to-end entry must certify on real
data while agreeing with the exact a13 groups.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from olist_data_warehouse_spark.plans.queries import (
    REGISTRY,
    _rank_in_bound,
)

SF = "/root/testdata/sf0.001"


def _bound(spark, lt, le, num, den, n, slack):
    df = spark.range(1).select(
        _rank_in_bound(
            F.lit(lt), F.lit(le), num, den, F.lit(n), F.lit(slack)
        ).alias("ok")
    )
    return df.collect()[0]["ok"]


def test_rank_in_bound_accepts_exact_and_slack_window(spark):
    # n=100, median target rank 50. A value occupying exactly rank 50
    # (49 strictly below, 50 at-or-below) passes with zero-slack...
    assert _bound(spark, 49, 50, 1, 2, 100, 0) == 1
    # ...and a value 1 rank off passes only once slack covers it.
    assert _bound(spark, 50, 51, 1, 2, 100, 0) == 0
    assert _bound(spark, 50, 51, 1, 2, 100, 1) == 1
    assert _bound(spark, 47, 48, 1, 2, 100, 1) == 0
    assert _bound(spark, 47, 48, 1, 2, 100, 2) == 1


def test_rank_in_bound_rejects_gross_violation(spark):
    # A "median" that is really the p10 value: lt=9, le=10 vs target 50
    # must fail even with the registered slack (n div 10000 + 1 = 1).
    assert _bound(spark, 9, 10, 1, 2, 100, 1) == 0
    # Same on the p90 side: a p50 value offered as p90 (target rank
    # 9*100/10 = 90).
    assert _bound(spark, 49, 50, 9, 10, 100, 1) == 0


def test_rank_in_bound_handles_heavy_ties(spark):
    # A point mass: every row the same value (lt=0, le=n) brackets any
    # quantile — the wide [lt+1, le] interval is the correct answer,
    # not a false reject.
    assert _bound(spark, 0, 100, 1, 2, 100, 0) == 1
    assert _bound(spark, 0, 100, 9, 10, 100, 0) == 1


def test_cert_entry_certifies_on_testdata(spark):
    got = (
        REGISTRY["a13_approx_percentile_cert"].fn(spark, SF).collect()
    )
    assert len(got) == 3  # A / N / R return flags
    for r in got:
        assert r["med_in_bound"] == 1, r
        assert r["p90_in_bound"] == 1, r
        assert r["n"] > 0
    # Group counts agree with the exact-percentile twin's.
    exact = {
        r["l_returnflag"]: r["n"]
        for r in REGISTRY["a13_median_percentile"].fn(spark, SF).collect()
    }
    assert {r["l_returnflag"]: r["n"] for r in got} == exact


# ---------------------------------------------------------------------------
# Empty-input contracts (tools/empty_input_sweep.py found these in r6):
# a 0-row corpus must yield typed empty results from the seeded ANN
# family, and a 0-row staging day must build an empty (readable)
# warehouse — never a plan-build crash.
# ---------------------------------------------------------------------------


def _empty_embeddings(spark):
    return spark.createDataFrame(
        [], "vec_id bigint, embedding array<float>"
    )


def test_seeded_ann_family_empty_corpus_yields_typed_empty(spark):
    from olist_data_warehouse_spark.operators import similarity as sim

    e = _empty_embeddings(spark)
    a = sim.ivf_assign(e)
    assert a.collect() == []
    assert a.schema.simpleString() == (
        "struct<vec_id:bigint,centroid_id:bigint,cos_sim:double>"
    )
    p = sim.ivf_probe_assign(e, probes=2)
    assert p.collect() == []
    assert [f.name for f in p.schema] == ["vec_id", "centroid_id"]
    t = sim.ivf_topk(e, [0, 1], k=3)
    assert t.collect() == []
    assert [f.name for f in t.schema] == [
        "query_id", "neighbor_id", "rank", "cos_sim",
    ]
    d = sim.pq_adc_topk(e, [0, 1], k=3)
    assert d.collect() == []
    assert [f.name for f in d.schema] == [
        "query_id", "neighbor_id", "rank", "adc_dist",
    ]


def test_warehouse_build_from_empty_staging_is_readable(spark, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from olist_data_warehouse_spark.plans.queries import (
        REGISTRY,
        warehouse_tables,
    )

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path / "sf_empty")
    os.makedirs(dst)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        schema = pq.read_schema(os.path.join(src, f"{t}.parquet"))
        pq.write_table(
            pa.Table.from_arrays(
                [pa.array([], type=f.type) for f in schema], schema=schema
            ),
            os.path.join(dst, f"{t}.parquet"),
        )
    wt = warehouse_tables(spark, dst, groups=("sales",))
    # The 0-row partitioned fact write leaves no data files; the
    # explicit-schema readback must still give an empty, correctly-
    # typed fact (not UNABLE_TO_INFER_SCHEMA).
    assert wt["sales_fact"].count() == 0
    assert "date_key" in wt["sales_fact"].columns
    # And the DW query on top of it runs to an empty result.
    assert REGISTRY["q1_top_units_dw"].fn(spark, dst).collect() == []


def test_null_fuzz_representatives_match_oracle(spark, tmp_path):
    """In-suite hook for the round-6 null-injection battery: a fuzzed
    copy (~10% of non-key cells nulled, same parquet for both engines)
    must keep Spark == DuckDB on one representative of each pinned
    convention — window null ordering (w4), surrogate keys (f7),
    exhaustive IVM splits, snapshot membership/IS DISTINCT FROM,
    null-propagating band digests (minhash), as-of struct carry, and
    the multimodal invalid-row contract. The full 212-entry sweep is
    tools/null_fuzz_sweep.py; this keeps the conventions locked in the
    default suite.
    """
    import sys

    sys.path.insert(
        0, str(__import__("pathlib").Path(__file__).parents[1] / "tools")
    )
    from null_fuzz_sweep import make_fuzzed_sf

    from tests.oracle_check import compare_query

    dst = str(tmp_path / "sf_fuzz")
    __import__("os").makedirs(dst)
    make_fuzzed_sf(dst, 10)
    for name in (
        "w4_ntile_quartiles",
        "f7_surrogate_keys",
        "ivm_agg_merge",
        "dq_snapshot_diff",
        "dedup_minhash_lsh",
        "tj_asof_purchase_click",
        "multi_decode_meta",
    ):
        ok, detail = compare_query(spark, dst, name)
        assert ok, f"{name}: {detail}"


def test_portable_lower_matches_duckdb_on_divergent_codepoints(spark):
    """The pinned lowercase divergences (İ expansion + the contextual
    final-sigma rule) must produce DuckDB's exact bytes; ASCII and
    already-lowercase input pass through untouched. The eight
    KNOWN_LOWER_DIVERGENT capitals are asserted as exactly the
    documented residual divergence — nothing more."""
    import duckdb

    from olist_data_warehouse_spark.operators.textops import (
        KNOWN_LOWER_DIVERGENT,
        portable_lower,
    )

    cases = [
        "İstanbul İİ",          # U+0130 expands on the JVM
        "ΣΟΦΟΣ",                # word-final sigma context
        "σοφός ΚΑΙ ς",          # pre-existing final sigma survives
        "ΣΣ Σ word ΑΣ.",        # sigma before punctuation
        "café 🌍 ẞ straße",     # agreeing multibyte passes through
        "plain ASCII Text",
    ]
    divergent = [f"x{c}y" for c in KNOWN_LOWER_DIVERGENT]
    df = spark.createDataFrame(
        [(c,) for c in cases + divergent], "t string"
    )
    got = {
        r["t"]: r["pl"]
        for r in df.select("t", portable_lower("t").alias("pl")).collect()
    }
    con = duckdb.connect()
    for c in cases:
        expect = con.execute("SELECT lower(?)", [c]).fetchone()[0]
        assert got[c] == expect, (c, got[c], expect)
    # The residual divergence is EXACTLY the 8 documented capitals:
    # the JVM lowers them, utf8proc keeps them uppercase.
    for c, raw in zip(divergent, KNOWN_LOWER_DIVERGENT):
        dk = con.execute("SELECT lower(?)", [c]).fetchone()[0]
        assert dk == c  # DuckDB: unchanged
        assert got[c] == f"x{raw.lower()}y"  # Spark: lowered


def test_unicode_fuzz_representatives_match_oracle(spark, tmp_path):
    """In-suite hook for the Unicode battery: a multibyte-adorned copy
    must keep Spark == DuckDB on the operators that diverged before
    portable_lower — exact fingerprints, minhash signatures, and
    token-rank text analytics. Full sweep: tools/unicode_fuzz_sweep.py."""
    import sys

    sys.path.insert(
        0, str(__import__("pathlib").Path(__file__).parents[1] / "tools")
    )
    from unicode_fuzz_sweep import make_fuzzed_sf as make_uni

    from tests.oracle_check import compare_query

    dst = str(tmp_path / "sf_uni")
    __import__("os").makedirs(dst)
    make_uni(dst)
    for name in ("dedup_exact", "dedup_minhash_signatures",
                 "text_keywords_topk", "text_token_stats"):
        ok, detail = compare_query(spark, dst, name)
        assert ok, f"{name}: {detail}"
