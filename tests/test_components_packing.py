"""Connected components (duplicate clusters) and sequence packing.

Components: min-label fixpoint must equal true transitive closure on
chains, cliques, and disjoint unions — including chains longer than one
propagation hop. Packing: the chunk layout must be a partition of the
token stream (spans tile every chunk exactly), invariant to input
partitioning, and each doc's spans must sum to its token count.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_data_warehouse_spark.operators import components, packing


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")


def test_cc_chain_closes_transitively(spark):
    # 0-1-2-3-4-5: a 6-node path — needs multiple propagation rounds.
    e = _edges(spark, [(i, i + 1) for i in range(5)])
    got = {
        (r.node, r.component)
        for r in components.connected_components(e).collect()
    }
    assert got == {(i, 0) for i in range(6)}


def test_cc_disjoint_clusters_and_sizes(spark):
    # {1,2,3} triangle, {10,11} pair, {20,21,22} chain.
    e = _edges(
        spark, [(1, 2), (2, 3), (1, 3), (10, 11), (20, 21), (21, 22)]
    )
    rows = components.duplicate_clusters(e).collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component_id, set()).add(r.doc_id)
        assert r.is_canonical == (r.doc_id == r.component_id)
    assert by_comp == {1: {1, 2, 3}, 10: {10, 11}, 20: {20, 21, 22}}
    sizes = {r.component_id: r.n_members for r in rows}
    assert sizes == {1: 3, 10: 2, 20: 3}


def test_cc_partitioning_invariant(spark):
    e = _edges(spark, [(i, i + 1) for i in range(0, 40, 2)] + [(0, 38)])
    a = sorted(map(tuple, components.connected_components(e).collect()))
    b = sorted(
        map(
            tuple,
            components.connected_components(
                e.repartition(7, "doc_b")
            ).collect(),
        )
    )
    assert a == b


@pytest.fixture(scope="module")
def token_docs(spark):
    # Doc i has (i % 7) * 3 + 1 tokens; 200 docs → multi-chunk stream.
    rows = [(i, (i % 7) * 3 + 1) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id bigint, n bigint")


def test_pack_spans_partition_the_stream(spark, token_docs):
    ctx = 64
    out = packing.concat_chunks(
        token_docs, "doc_id", F.col("n"), ctx=ctx, n_buckets=8
    ).collect()
    total = sum(r.n for r in token_docs.collect())
    # Spans tile the stream: per-chunk sums are ctx except the tail.
    per_chunk = {}
    for r in out:
        per_chunk[r.chunk_id] = per_chunk.get(r.chunk_id, 0) + r.span_len
    n_chunks = (total + ctx - 1) // ctx
    assert set(per_chunk) == set(range(n_chunks))
    for cid, tok in per_chunk.items():
        assert tok == (ctx if cid < n_chunks - 1 else total - ctx * (n_chunks - 1))
    # Per-doc spans sum to the doc's token count; intervals are coherent.
    per_doc = {}
    for r in out:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.span_len
        assert r.tok_end - r.tok_start > 0
    n_by_id = {r.doc_id: r.n for r in token_docs.collect()}
    assert per_doc == n_by_id


def test_pack_partitioning_invariant_and_zero_drop(spark):
    rows = [(1, 10), (2, 0), (3, 5), (4, 2048), (5, 4097)]
    d = spark.createDataFrame(rows, "doc_id bigint, n bigint")
    a = sorted(
        map(
            tuple,
            packing.concat_chunks(d, "doc_id", F.col("n"), ctx=2048).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            packing.concat_chunks(
                d.repartition(3).sortWithinPartitions(F.desc("doc_id")),
                "doc_id",
                F.col("n"),
                ctx=2048,
            ).collect(),
        )
    )
    assert a == b
    ids = {t[0] for t in a}
    assert 2 not in ids  # zero-token doc occupies no chunk
    # doc 5 (4097 tokens) must span at least 3 chunks.
    assert sum(1 for t in a if t[0] == 5) >= 3


def test_pack_rejects_bad_ctx(spark, token_docs):
    with pytest.raises(ValueError):
        packing.concat_chunks(token_docs, "doc_id", F.col("n"), ctx=0)


def test_sliding_windows_cover_and_truncate(spark):
    rows = [(1, 1), (2, 128), (3, 129), (4, 256), (5, 300), (6, 0)]
    d = spark.createDataFrame(rows, "doc_id bigint, n bigint")
    out = packing.sliding_windows(d, "doc_id", F.col("n"), win=256, stride=128)
    got = {r.doc_id: [] for r in out.collect()}
    for r in out.collect():
        got[r.doc_id].append((r.win_idx, r.tok_start, r.tok_end, r.win_len))
        assert r.tok_end <= dict(rows)[r.doc_id]
        assert r.win_len == r.tok_end - r.tok_start
    assert 6 not in got  # zero-token doc yields nothing
    assert len(got[1]) == 1 and got[1][0] == (0, 0, 1, 1)
    assert len(got[2]) == 1  # n == stride: second window would be empty
    assert len(got[3]) == 2  # one token past the stride boundary
    assert len(got[5]) == 3  # starts at 0, 128, 256
    # Every token position of doc 5 is covered by some window.
    covered = set()
    for _, s, e, _ in got[5]:
        covered |= set(range(s, e))
    assert covered == set(range(300))


def test_sliding_windows_rejects_bad_params(spark):
    d = spark.createDataFrame([(1, 10)], "doc_id bigint, n bigint")
    import pytest as _pt

    with _pt.raises(ValueError):
        packing.sliding_windows(d, "doc_id", F.col("n"), win=0)
    with _pt.raises(ValueError):
        packing.sliding_windows(d, "doc_id", F.col("n"), stride=0)


def test_banded_global_rank_equals_naive_window(spark):
    """The range-banded two-pass rank must be byte-identical to the
    single-partition ROW_NUMBER it replaces, for any band width —
    including widths that put everything in one band (degenerate but
    legal) and negative-banded descending orders."""
    from pyspark.sql.window import Window

    rows = [(i, (i * 37) % 13, (i * 17) % 7) for i in range(200)]
    d = spark.createDataFrame(rows, "id bigint, k bigint, t bigint")

    naive_asc = d.select(
        "id",
        F.row_number()
        .over(Window.orderBy(F.asc("k"), F.asc("id")))
        .alias("rk"),
    )
    for width in (1, 4, 1000):
        got = packing.banded_global_rank(
            d,
            band=F.expr(f"k div {width}"),
            order_by=[F.asc("k"), F.asc("id")],
        ).select("id", "rk")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, naive_asc.collect())
        ), f"width={width}"

    naive_desc = d.select(
        "id",
        F.row_number()
        .over(Window.orderBy(F.desc("k"), F.asc("id")))
        .alias("rk"),
    )
    got = packing.banded_global_rank(
        d,
        band=F.expr("-(k div 4)"),
        order_by=[F.desc("k"), F.asc("id")],
    ).select("id", "rk")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, naive_desc.collect())
    )


def test_banded_rank_consumers_have_no_scan_scale_global_window(spark):
    """pack_balanced_shards / a29 / a31 must window only WITHIN a band
    partition: every windowspecdefinition that sees scan-scale rows
    carries the _band key, and the only unpartitioned windows left are
    the O(bands) offset prefix and 1-row reduces."""
    import io
    from contextlib import redirect_stdout

    from olist_data_warehouse_spark.plans.queries import REGISTRY

    for name in (
        "pack_balanced_shards",
        "a29_gini_concentration",
        "a31_lorenz_deciles",
    ):
        df = REGISTRY[name].fn(spark, "/root/testdata/sf0.001")
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(True)
        plan = buf.getvalue()
        for line in plan.splitlines():
            if "windowspecdefinition" in line and "row_number" in line:
                assert "_band" in line, f"{name}: unbanded rank window"


def test_banded_rank_null_band_raises_by_default(spark):
    """ADVICE r6: a NULL band must never silently drop rows through the
    offset equi-join — the default contract is a loud runtime error."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    d = spark.createDataFrame(
        [(1, 5), (2, None), (3, 1)], "id bigint, k bigint"
    )
    ranked = packing.banded_global_rank(
        d, band=F.expr("k div 4"), order_by=[F.asc("k"), F.asc("id")]
    )
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)):
        ranked.collect()


def test_banded_rank_null_band_sentinel_routing(spark):
    """nulls='first'/'last' routes NULL-key rows to a sentinel band that
    matches the pinned null position of the order_by — equal to the
    naive window with the same asc_nulls_* pin, no row lost."""
    from pyspark.sql.window import Window

    rows = [(1, 5), (2, None), (3, 1), (4, None), (5, 9)]
    d = spark.createDataFrame(rows, "id bigint, k bigint")
    for nulls, key in (
        ("first", F.asc_nulls_first("k")),
        ("last", F.asc_nulls_last("k")),
    ):
        naive = d.select(
            "id",
            F.row_number()
            .over(Window.orderBy(key, F.asc("id")))
            .alias("rk"),
        )
        got = packing.banded_global_rank(
            d,
            band=F.expr("k div 4"),
            order_by=[key, F.asc("id")],
            nulls=nulls,
        ).select("id", "rk")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, naive.collect())
        ), nulls


def test_banded_running_sum_equals_naive_window(spark):
    """Two-pass banded running sums must match the single-partition
    cumulative window for several band widths and multiple columns."""
    from pyspark.sql.window import Window

    rows = [(i, (i * 37) % 13, i % 5, (i * 7) % 11) for i in range(200)]
    d = spark.createDataFrame(rows, "id bigint, k bigint, a bigint, b bigint")
    wc = Window.orderBy(F.asc("k"), F.asc("id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    naive = d.select(
        "id",
        F.sum("a").over(wc).alias("ca"),
        F.sum("b").over(wc).alias("cb"),
    )
    for width in (1, 4, 1000):
        got = packing.banded_running_sum(
            d,
            band=F.expr(f"k div {width}"),
            order_by=[F.asc("k"), F.asc("id")],
            sums={"ca": "a", "cb": "b"},
        ).select("id", "ca", "cb")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, naive.collect())
        ), f"width={width}"


def test_range_global_rank_matches_naive_incl_point_mass(spark):
    """The distribution-adaptive rank must equal the naive global
    ROW_NUMBER on skewed, uniform, and POINT-MASS (every row the same
    leading key) distributions — the case banded ranking cannot fuse —
    and stay invariant to input partitioning."""
    from pyspark.sql.window import Window

    cases = {
        "uniform": [(i, (i * 37) % 13) for i in range(500)],
        "point_mass": [(i, 7) for i in range(500)],
        "two_spikes": [(i, 3 if i % 2 else 4) for i in range(500)],
    }
    for label, rows in cases.items():
        d = spark.createDataFrame(rows, "id bigint, k bigint").repartition(7)
        naive = d.select(
            "id",
            F.row_number()
            .over(Window.orderBy(F.asc("k"), F.asc("id")))
            .alias("rk"),
        )
        got = packing.range_global_rank(
            d, order_by=[F.asc("k"), F.asc("id")], num_partitions=8
        ).select("id", "rk")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, naive.collect())
        ), label


def test_range_global_rank_spreads_point_mass_partitions(spark):
    """On a point-mass key the range layout must actually SPREAD rows
    across partitions (the whole reason it exists): no partition holds
    more than ~2x the even share."""
    d = spark.createDataFrame(
        [(i, 7) for i in range(800)], "id bigint, k bigint"
    ).repartition(5)
    laid = (
        d.repartitionByRange(8, F.asc("k"), F.asc("id"))
        .sortWithinPartitions(F.asc("k"), F.asc("id"))
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
    )
    sizes = [r["count"] for r in laid.collect()]
    assert len(sizes) > 1, "point-mass collapsed to one partition"
    assert max(sizes) <= 2 * (800 // len(sizes) + 1)
