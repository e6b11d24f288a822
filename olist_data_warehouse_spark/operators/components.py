"""Connected components over near-duplicate candidate edges.

Pair-level dedup (MinHash-LSH, SimHash, n-gram Jaccard) emits *edges*;
corpus curation needs *clusters*: if A~B and B~C, then {A, B, C} is one
duplicate group and exactly one member survives. That closure is
connected components on the candidate graph — the step every
large-corpus dedup pipeline (and the reference's conceptual
"keep one row per key" loads, `Olist DW.sql:60-141`) runs between pair
discovery and the keep-filter.

Algorithm: **hash-min label propagation**. Every node starts labeled
with its own id; each round every node takes the min of its own label
and its neighbors' labels; at fixpoint each component is labeled by its
minimum member id. Rounds needed = graph diameter, and near-dup graphs
are short chains / dense blobs (duplicates of duplicates), so a handful
of rounds closes 100 TB-scale graphs.

The 100 TB shape per round: one shuffle join (edges ⋈ labels on node
id) + one groupBy-min — both partial-aggregated map-side, both on
compact (long, long) rows; the document text never enters the graph.
Lineage is truncated with ``localCheckpoint`` every round, otherwise
the iterated plan nests ``max_iter`` joins deep and planning time
dominates (the standard iterative-DataFrame pitfall). Convergence is
detected joblessly-cheaply: labels are monotonically non-increasing,
so one scalar label-SUM aggregate per round (no join, no extra
shuffle) strictly decreases until fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id reachable from ``node``.

    Nodes with no edges are by definition singleton components and are
    not emitted — callers union them back if they need full coverage
    (the dedup keep-filter only cares about multi-member groups).
    """
    # Both union branches read ``edges``: persist it or the upstream
    # pair-discovery plan (an LSH self-join, typically) runs twice.
    edges = edges.persist()
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    labels = labels.localCheckpoint()

    def _label_sum(lbls: DataFrame):
        # Exact 128-bit sum of labels — one map-side-combined scalar
        # aggregate, no shuffle beyond the final 1-row reduce.
        return lbls.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    # Convergence check WITHOUT a join: hash-min labels are
    # monotonically non-increasing per node (new = min(own, neighbors)
    # ≤ own), so the label SUM strictly decreases iff any node changed
    # this round. Comparing sums replaces the old per-round
    # new⋈old-labels join + count — at scale that join shuffled the
    # full label table every round just to answer a yes/no question.
    prev_sum = _label_sum(labels)
    for _ in range(max_iter):
        neighbor = sym.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "label")
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        new_labels = new_labels.localCheckpoint()
        new_sum = _label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    sym.unpersist()
    return labels.select("node", F.col("label").alias("component"))


def duplicate_clusters(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """(doc_id, component_id, n_members, is_canonical) cluster view of
    the candidate-pair graph: the transitive closure of pairwise
    near-duplication, sized, with the min-id member flagged as the
    survivor. ``filter(~is_canonical)`` is the delete-list."""
    comp = connected_components(edges, src, dst)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        comp.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("component_id"),
            "n_members",
            (F.col("node") == F.col("component")).alias("is_canonical"),
        )
    )
