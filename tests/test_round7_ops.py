"""Round-7 fixes: NULL-band posture of the concentration entries, the
banded KS-drift CDF, and the limit-bounded Zipf top-k.

The r6 null_fuzz_sweep could not produce a customer whose EVERY order
has a NULL price at sf0.001 (the deterministic mask never aligns), so
the ADVICE r6 medium — NULL SUM(cents) bands silently dropped by the
banded rank's offset join while the oracle ranks them NULLS LAST — had
no failing witness in the suite. These tests build that witness
directly: a doctored orders table where one customer is entirely
unpriced, compared cross-engine through the same compare_query path
the driver uses.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.oracle_check import compare_query

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def all_null_price_dir(tmp_path_factory):
    """sf0.001 orders with ONE customer's every order unpriced."""
    d = tmp_path_factory.mktemp("nullprice")
    con = duckdb.connect()
    src = os.path.join(SF, "orders.parquet")
    k = con.execute(
        f"SELECT min(o_custkey) FROM read_parquet('{src}')"
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN o_custkey = {k} THEN NULL
                 ELSE o_totalprice END AS o_totalprice)
          FROM read_parquet('{src}')
        ) TO '{d}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.parametrize(
    "name", ["a29_gini_concentration", "a31_lorenz_deciles"]
)
def test_concentration_survives_all_null_price_customer(
    spark, all_null_price_dir, name
):
    """ADVICE r6 witness: the all-null-price customer must neither be
    silently dropped by the banded rank (Spark) nor ranked NULLS LAST
    (oracle) — both engines now exclude unobserved revenue, so the
    cross-engine compare is exact on the doctored table."""
    ok, detail = compare_query(spark, all_null_price_dir, name)
    assert ok, f"{name}: {detail}"


def test_gini_counts_only_observed_customers(spark, all_null_price_dir):
    """The doctored customer has no observed revenue: n_customers must
    be exactly one less than on the pristine table."""
    from olist_data_warehouse_spark.plans.queries import REGISTRY

    fn = REGISTRY["a29_gini_concentration"].fn
    clean = fn(spark, SF).collect()[0]["n_customers"]
    dirty = fn(spark, all_null_price_dir).collect()[0]["n_customers"]
    assert dirty == clean - 1


def test_ks_drift_cdf_windows_are_banded(spark):
    """VERDICT r6 #1: dq_ks_drift's cumulative CDFs must run within
    _band partitions — no windowspecdefinition over the raw value
    domain without the band key (the offset prefix over the band table
    and the 1-row reduce are the only unpartitioned survivors)."""
    import io
    from contextlib import redirect_stdout

    from olist_data_warehouse_spark.plans.queries import REGISTRY

    df = REGISTRY["dq_ks_drift"].fn(spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(True)
    for line in buf.getvalue().splitlines():
        if "windowspecdefinition" in line and "c#" in line:
            assert "_band" in line, f"unbanded value-domain window: {line}"


def test_zipf_rank_window_is_limit_bounded(spark):
    """VERDICT r6 #2: the Zipf rank window must sit ABOVE the top-1000
    limit (TakeOrderedAndProject / GlobalLimit), never over the whole
    vocabulary: the optimized plan's window input chain must contain
    the limit before the vocabulary aggregate."""
    from olist_data_warehouse_spark.plans.queries import REGISTRY

    df = REGISTRY["text_zipf_fit"].fn(spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    win = next(
        i for i, ln in enumerate(lines) if "row_number" in ln.lower()
    )
    below = "\n".join(lines[win:])
    assert "Limit" in below or "limit" in below, (
        "rank window has no limit beneath it:\n" + plan
    )


def test_containment_catches_what_jaccard_misses(spark):
    """A short doc embedded verbatim in a long one: containment ≈ 1,
    Jaccard ≈ |A|/|B| — the measure distinction the containment pass
    exists for."""
    from pyspark.sql import Row

    from olist_data_warehouse_spark.operators import dedup

    small = "alpha beta gamma delta epsilon zeta eta theta"
    big = small + " " + " ".join(f"w{i} x{i} y{i}" for i in range(40))
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=small), Row(doc_id=2, text=big),
         Row(doc_id=3, text="totally unrelated words here only")]
    )
    cont = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in dedup.containment_pairs(docs, k=3, threshold=0.6).collect()
    }
    assert (1, 2) in cont and cont[(1, 2)] >= 0.9
    jac = dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.6).collect()
    assert not [r for r in jac if (r["doc_a"], r["doc_b"]) == (1, 2)], (
        "Jaccard should NOT flag the embedded pair at the same threshold"
    )
    # unrelated doc pairs with nobody
    assert not [p for p in cont if 3 in p]


def test_containment_registry_entry_surfaces_every_seeded_crop(spark):
    """Each seeded half-doc crop must pair with its source doc."""
    from olist_data_warehouse_spark.plans.queries import REGISTRY

    rows = REGISTRY["dedup_containment"].fn(spark, SF).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    found = {a for a, b in pairs if b == a + 2000000}
    # docs with enough text to shingle (tiny docs can fall below the
    # 3-token shingle floor and legitimately self-pair differently)
    assert len(found) >= 30, f"only {len(found)} crops surfaced"


def test_containment_estimate_exact_on_identical_docs(spark):
    """A duplicated doc agrees on all 16 signature components and has
    equal set sizes, so the integer-rational estimate must be exactly
    1.0: 1e6 * 16(a+a) / ((16+16)*a) = 1_000_000 ppm."""
    from pyspark.sql import Row

    from olist_data_warehouse_spark.plans.queries import REGISTRY, _t

    # registry entry runs on the documents table; instead exercise the
    # formula through the entry on testdata and pin the duplicate pair
    # seeded by the corpus itself if present, else check monotonicity:
    # every candidate pair's estimate is within (0, 1e6].
    rows = REGISTRY["dedup_containment_est"].fn(spark, SF).collect()
    assert rows, "LSH candidates expected on the test corpus"
    for r in rows:
        assert 0 <= r["est_containment_ppm"] <= 1_000_000
        assert 0 <= r["n_agree"] <= 16
        if r["n_agree"] == 16 and r["size_a"] == r["size_b"]:
            assert r["est_containment_ppm"] == 1_000_000
