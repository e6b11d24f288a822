"""Partitioned NSW graph ANN (operators/graphann.py): determinism
across partition layouts, search quality vs exact within one cell,
degenerate inputs, self-exclusion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_data_warehouse_spark.operators import graphann, similarity


@pytest.fixture()
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_nsw_single_cell_matches_exact_topk(spark, emb):
    """With one cell and a beam wider than the corpus, NSW search is
    exhaustive — its neighbor set must equal brute force exactly."""
    sub = emb.filter(F.col("vec_id") < 80)
    got = graphann.nsw_topk(
        sub, [0, 1], k=5, n_cells=1, probes=1, m_links=8, ef=200
    ).select("query_id", "neighbor_id", "rank")
    want = similarity.brute_force_topk(sub, [0, 1], k=5).select(
        "query_id", "neighbor_id", "rank"
    )
    assert _rows(got) == _rows(want)


def test_nsw_deterministic_across_partitionings(spark, emb):
    a = graphann.nsw_topk(emb.repartition(13), [0, 1, 2], k=8)
    b = graphann.nsw_topk(emb.coalesce(1), [0, 1, 2], k=8)
    assert _rows(a) == _rows(b)


def test_nsw_excludes_query_itself(spark, emb):
    got = graphann.nsw_topk(emb, [3], k=10)
    assert all(r["neighbor_id"] != 3 for r in got.collect())
    assert got.count() == 10


def test_nsw_empty_corpus(spark, emb):
    empty = emb.limit(0)
    got = graphann.nsw_topk(empty, [0, 1], k=5)
    assert got.count() == 0
    assert got.columns == ["query_id", "neighbor_id", "rank", "cos_sim"]


def test_nsw_recall_vs_cell_truth_is_high(spark, emb):
    """Graph search over probed cells must recover >=90% of the exact
    within-cell top-k (the registry cert's contract, pinned here at
    unit scale too)."""
    qids = [0, 1, 2, 3, 4]
    k = 10
    got = graphann.nsw_topk(emb, qids, k=k, n_cells=8, probes=2)
    q = emb.filter(F.col("vec_id").isin(qids))
    q_cells = similarity.ivf_probe_assign(emb, 8, probes=2, subject=q)
    corpus = emb.join(
        similarity.ivf_assign(emb, 8).select("vec_id", "centroid_id"),
        "vec_id",
    )
    probed = q_cells.select(
        F.col("vec_id").alias("query_id"), "centroid_id"
    )
    pairs = (
        corpus.join(probed, "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(
            q.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("q_emb"),
            ),
            "query_id",
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            similarity.cosine(
                F.col("q_emb"), F.col("embedding")
            ).alias("cs"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cs").alias("cs"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cs"), F.asc("neighbor_id")
    )
    truth = pairs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    hits = truth.join(
        got.select("query_id", "neighbor_id", F.lit(1).alias("hit")),
        ["query_id", "neighbor_id"],
        "left",
    )
    per_q = hits.groupBy("query_id").agg(
        (F.sum(F.coalesce(F.col("hit"), F.lit(0)))
         / F.count(F.lit(1))).alias("recall")
    ).collect()
    assert per_q and all(r["recall"] >= 0.9 for r in per_q), per_q
