"""Behavioral tests for the retrieval / analytics / DQ operators added
in round 5: inverted index, BM25 top-k, fuzzy record linkage, OHLC
bars, and exact-integer z-score outliers.

Each registry entry is already hash-checked against its DuckDB oracle
by test_queries_oracle.py; these tests pin the SEMANTICS independently
(brute-force recomputation on the same data, plus crafted edge cases
the small corpus may not exercise — ties, constant groups, planted
outliers)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from olist_data_warehouse_spark.operators import textops
from olist_data_warehouse_spark.plans.queries import REGISTRY, _t

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# text_inverted_index
# ---------------------------------------------------------------------------


def test_inverted_index_df_matches_bruteforce(spark):
    idx = REGISTRY["text_inverted_index"].fn(spark, SF)
    sample = {
        r["term"]: (r["df"], r["posting_list"])
        for r in idx.filter(
            F.col("term").isin("spark", "merge", "window")
        ).collect()
    }
    docs = _t(spark, SF, "documents")["documents"]
    toks = docs.select(
        "doc_id", textops.tokens("text").alias("toks")
    ).cache()
    for term, (df, postings) in sample.items():
        expect = sorted(
            r["doc_id"]
            for r in toks.filter(
                F.array_contains("toks", term)
            ).collect()
        )
        assert df == len(expect), term
        assert postings == ",".join(str(d) for d in expect), term
    assert sample, "sample terms missing from the corpus index"


def test_inverted_index_postings_sorted_and_consistent(spark):
    rows = REGISTRY["text_inverted_index"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r["posting_list"].split(",")]
        assert ids == sorted(ids), r["term"]
        assert len(ids) == len(set(ids)), r["term"]
        assert r["df"] == len(ids) >= 2, r["term"]
        assert r["term"] not in textops.STOPWORDS


# ---------------------------------------------------------------------------
# text_bm25_topk
# ---------------------------------------------------------------------------


def test_bm25_topk_scores_ordered_and_docs_contain_terms(spark):
    from olist_data_warehouse_spark.plans.llm.text import _BM25_TERMS

    rows = REGISTRY["text_bm25_topk"].fn(spark, SF).collect()
    assert 0 < len(rows) <= 10
    scores = [r["score_micro"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    assert all(1 <= r["n_terms_hit"] <= len(_BM25_TERMS) for r in rows)
    docs = _t(spark, SF, "documents")["documents"]
    hit_ids = [r["doc_id"] for r in rows]
    checked = docs.filter(F.col("doc_id").isin(hit_ids)).select(
        "doc_id", textops.tokens("text").alias("toks")
    )
    for r in checked.collect():
        assert any(t in r["toks"] for t in _BM25_TERMS), r["doc_id"]


def test_bm25_integer_formula_matches_float_reference(spark):
    """The cleared-fraction integer score must track the float BM25
    within quantization error (1 micro-unit per division floor)."""
    import math

    from olist_data_warehouse_spark.plans.llm.text import _BM25_TERMS

    docs = _t(spark, SF, "documents")["documents"]
    toks = [
        (r["doc_id"], r["toks"])
        for r in docs.select(
            "doc_id", textops.tokens("text").alias("toks")
        ).collect()
    ]
    n_docs = len(toks)
    sum_dl = sum(len(t) for _, t in toks)
    df = {
        term: sum(1 for _, t in toks if term in t) for term in _BM25_TERMS
    }
    k1, b = 1.2, 0.75
    expect = {}
    for doc_id, t in toks:
        s = 0.0
        for term in _BM25_TERMS:
            tf = t.count(term)
            if tf == 0:
                continue
            idf = math.log(
                (2 * n_docs + 2) / (2 * df[term] + 1)
            )
            dl_norm = len(t) * n_docs / sum_dl
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl_norm))
        if s > 0:
            expect[doc_id] = s
    got = {
        r["doc_id"]: r["score_micro"] / 1e6
        for r in REGISTRY["text_bm25_topk"].fn(spark, SF).collect()
    }
    assert got
    for doc_id, s_int in got.items():
        # floors: one per idf (1e-6) + one per term division + the
        # dl_norm inner floor — bounded well under 1e-2 in score units
        assert abs(s_int - expect[doc_id]) < 1e-2, doc_id


# ---------------------------------------------------------------------------
# link_fuzzy_parts
# ---------------------------------------------------------------------------


def test_fuzzy_linkage_pairs_share_block_and_distance_correct(spark):
    rows = REGISTRY["link_fuzzy_parts"].fn(spark, SF).collect()
    assert rows, "expected at least one near-identical part-name pair"
    import difflib

    def lev(a: str, b: str) -> int:
        # O(len^2) reference implementation
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[-1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert r["name_a"].split(" ")[1] == r["name_b"].split(" ")[1]
        assert r["edit_dist"] == lev(r["name_a"], r["name_b"]) <= 4
    del difflib


def test_fuzzy_linkage_blocking_excludes_cross_noun_pairs(spark):
    """A pair with different nouns never surfaces, even at distance 0
    on the color token — blocking is the candidate-generation contract
    (recall beyond the block is explicitly out of scope)."""
    rows = REGISTRY["link_fuzzy_parts"].fn(spark, SF).collect()
    for r in rows:
        na, nb = r["name_a"].split(" ")[1], r["name_b"].split(" ")[1]
        assert na == nb


def test_fuzzy_linkage_fallback_tier_matches_oracle(spark, tmp_path):
    """The r14 tiered shortcut (exact-duplicate pairs fill k => skip
    the blocked enumeration) must leave the FALLBACK tier intact and
    oracle-identical. The testdata SFs all satisfy tier 0, so this
    builds a part table where exact duplicates are scarce (< k pairs)
    and near-duplicates dominate, and runs the full oracle comparison
    over it."""
    from tests.oracle_check import compare_query

    # 2 exact-duplicate pairs (< 15), many near pairs within edit 4,
    # spread over two noun blocks, plus cross-block decoys.
    names = (
        ["alpha bolt mk1", "alpha bolt mk2", "alphq bolt mk1"]
        + [f"beta bolt v{i}" for i in range(6)]
        + ["gamma ring xx", "gamma ring xy", "gamma ring xx"]
        + ["delta ring zz", "delta ring zz"]
        + [f"unrelated widget {i}{i}{i}{i}" for i in range(4)]
    )
    _write_part_file(tmp_path, names)
    ok, detail = compare_query(spark, str(tmp_path), "link_fuzzy_parts")
    assert ok, detail


def _write_part_file(tmp_path, names):
    """One single-file part.parquet (like the testdata layout — the
    DuckDB oracle view reads the exact path, not a directory)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(
                    range(1, len(names) + 1), pa.int64()
                ),
                "p_name": pa.array(names, pa.string()),
            }
        ),
        str(tmp_path / "part.parquet"),
    )


def test_fuzzy_linkage_tier0_matches_oracle_on_synthetic(spark, tmp_path):
    """Tier 0 on a crafted table (>= 15 exact-duplicate pairs, PLUS
    near pairs that must lose to them): full oracle comparison."""
    from tests.oracle_check import compare_query

    names = ["hot bolt"] * 8 + ["red ring"] * 6 + [
        "hot bolz",  # d=1 from hot bolt, must not displace d=0 pairs
        "red rink",
    ]
    _write_part_file(tmp_path, names)
    ok, detail = compare_query(spark, str(tmp_path), "link_fuzzy_parts")
    assert ok, detail


# ---------------------------------------------------------------------------
# ts_ohlc_bars
# ---------------------------------------------------------------------------


def test_ohlc_bars_match_bruteforce_on_one_bucket(spark):
    bars = REGISTRY["ts_ohlc_bars"].fn(spark, SF)
    total = bars.agg(F.sum("n_events")).collect()[0][0]
    e = _t(spark, SF, "events")["events"]
    assert total == e.count()
    # pick the densest bar and recompute it row-by-row
    top = bars.orderBy(F.desc("n_events")).first()
    rows = (
        e.withColumn(
            "bucket", F.expr("unix_micros(ts) div 900000000")
        )
        .filter(
            (F.col("event_type") == top["event_type"])
            & (F.col("bucket") == top["bucket"])
        )
        .orderBy("ts", "event_id")
        .collect()
    )
    vals = [r["value"] for r in rows]
    assert top["n_events"] == len(vals)
    assert top["open"] == vals[0]
    assert top["close"] == vals[-1]
    assert top["high"] == max(vals)
    assert top["low"] == min(vals)


def test_ohlc_tie_on_timestamp_breaks_by_event_id(spark, tmp_path):
    """Two events on the same timestamp: open/close pick by event_id —
    the deterministic tie contract (row_number over (ts, event_id))."""
    sf = str(tmp_path / "sf")
    ev = spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=ts,
                user_id=1,
                event_type="view",
                value=float(v),
                props=None,
            )
            for i, ts, v in [
                (2, "2024-01-01 00:00:01", 20.0),
                (1, "2024-01-01 00:00:01", 10.0),
                (3, "2024-01-01 00:00:02", 30.0),
                (4, "2024-01-01 00:00:02", 5.0),
            ]
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    import os

    os.makedirs(sf, exist_ok=True)
    ev.coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))
    bar = REGISTRY["ts_ohlc_bars"].fn(spark, sf).collect()
    assert len(bar) == 1
    b = bar[0]
    assert b["open"] == 10.0  # event_id 1 beats 2 on the tied second
    # ts=2 rows: event_id 4 is last -> close = 5.0
    assert b["close"] == 5.0
    assert b["high"] == 30.0 and b["low"] == 5.0 and b["n_events"] == 4


# ---------------------------------------------------------------------------
# dq_zscore_outliers
# ---------------------------------------------------------------------------


def test_zscore_outliers_match_exact_python_ints(spark):
    o = _t(spark, SF, "orders")["orders"]
    groups: dict[str, list[int]] = {}
    for r in o.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
    ).collect():
        groups.setdefault(r["o_orderpriority"], []).append(r["c"])
    got = {
        r["o_orderpriority"]: (r["n"], r["n_out_2s"], r["n_out_3s"])
        for r in REGISTRY["dq_zscore_outliers"].fn(spark, SF).collect()
    }
    assert set(got) == set(groups)
    for prio, cs in groups.items():
        n, s, q = len(cs), sum(cs), sum(c * c for c in cs)
        nvar = n * q - s * s
        n2 = sum(
            1
            for c in cs
            if (n * c - s) > 0 and (n * c - s) ** 2 > 4 * nvar
        )
        n3 = sum(
            1
            for c in cs
            if (n * c - s) > 0 and (n * c - s) ** 2 > 9 * nvar
        )
        assert got[prio] == (n, n2, n3), prio


def test_zscore_constant_group_flags_nothing(spark, tmp_path):
    """All-identical values: variance 0, every deviation 0 — the
    degenerate case must yield zero outliers, not divide-by-zero or
    flag-everything."""
    import os

    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    rows = [
        Row(
            o_orderkey=i,
            o_custkey=1,
            o_orderstatus="F",
            o_totalprice=100.0,
            o_orderdate="2024-01-01 00:00:00",
            o_orderpriority="1-URGENT",
        )
        for i in range(1, 9)
    ] + [
        # second group: 49 identical + one planted 100x spike. The
        # inlier count matters: a single point's z-score is bounded by
        # (n-1)/sqrt(n), so with few rows even an extreme spike cannot
        # exceed 3 sigma; at n=50 the spike sits at z ~= 7.
        Row(
            o_orderkey=100 + i,
            o_custkey=1,
            o_orderstatus="F",
            o_totalprice=100.0 if i < 50 else 10000.0,
            o_orderdate="2024-01-01 00:00:00",
            o_orderpriority="2-HIGH",
        )
        for i in range(1, 51)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    df.coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))
    got = {
        r["o_orderpriority"]: r
        for r in REGISTRY["dq_zscore_outliers"].fn(spark, sf).collect()
    }
    assert got["1-URGENT"]["n_out_2s"] == 0
    assert got["1-URGENT"]["n_out_3s"] == 0
    assert got["1-URGENT"]["first_out_3s_key"] is None
    assert got["2-HIGH"]["n_out_2s"] == 1
    assert got["2-HIGH"]["n_out_3s"] == 1
    assert got["2-HIGH"]["first_out_3s_key"] == 150


def test_zscore_no_decimal_in_output(spark):
    """Intermediates ride DECIMAL(38,0); the OUTPUT schema must stay
    within the oracle type guard's allowed set."""
    df = REGISTRY["dq_zscore_outliers"].fn(spark, SF)
    for f in df.schema.fields:
        assert "decimal" not in f.dataType.simpleString(), f.name
