"""Graph ANN: partitioned navigable-small-world (NSW) search.

The graph family the similarity surface was missing (r12 verdict,
"what's missing" #3): IVF / PQ / LSH are the partitioning-friendly
ANN choices at 100 TB, and graph search is the genuine alternative —
higher recall per candidate visited, at the price of a build step and
graph state. This module composes the two the way a distributed
system has to:

- **Coarse partitioning = IVF cells** (deterministic seed centroids,
  :func:`..similarity.ivf_assign`): a graph never spans cells, so
  construction is embarrassingly parallel, each cell's graph lives
  with its data, and a cell rebuilds alone when its vectors change.
  At 100 TB the cell is the unit of build, storage, and search
  fan-out — exactly the IVF scale story, with a graph inside each
  bucket instead of a flat list.
- **Per-cell NSW built AND searched in one Arrow-batched
  ``applyInPandas`` kernel** (numpy float64). Construction inserts
  vectors in vec_id order; each new node links bidirectionally to its
  M nearest already-inserted nodes, found by the SAME best-first beam
  search used at query time (ef_construction beam) — O(n·ef·M) per
  cell, the NSW construction from the paper, not an O(n²) toy.
  Search runs a best-first beam (ef) from the cell's first-inserted
  node. Every ordering is tie-broken (cos_sim desc, vec_id asc), so
  same cell contents => same graph => same results on ANY partition
  layout or executor count.
- **Queries broadcast to their ``probes`` nearest cells** (the IVF
  multi-probe recall lever); the global answer is a tiny
  (queries × probes × k)-row window re-rank.

HNSW proper adds a layer hierarchy for sub-linear entry into very
large graphs; at cell granularity (cells sized ~10^5-10^6 vectors by
choosing n_cells) the flat NSW beam is the same search contract with
less state — the hierarchy is an intra-kernel refinement if cells
grow, not a different distribution story.

Determinism contract: cell membership (deterministic centroids),
insertion order (vec_id asc), neighbor selection and beam ordering
((cos_sim, -vec_id) max-first), and float64 numpy arithmetic are all
partition-invariant, so the operator is re-runnable — the property
every oracle-gated operator in this engine holds. The graph SEARCH
itself is not SQL-expressible; the registry pairs it with an
in-engine certification against the exact within-probed-cells truth
(see plans/llm/sim.py:sim_nsw_recall_cert).

Public designs reimplemented from the papers: Malkov & Yashunin 2016
(NSW/HNSW), Jégou 2011 (IVF coarse quantization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from olist_data_warehouse_spark.operators import similarity

NSW_SCHEMA = "query_id long, neighbor_id long, cos_sim double"


def _nsw_kernel(m_links: int, ef: int, k: int):
    """Per-cell build+search kernel factory (closure over the knobs:
    applyInPandas takes a plain function)."""

    def kernel(pdf):
        import numpy as np
        import pandas as pd

        corpus = pdf[pdf["role"] == "c"].sort_values("vec_id")
        queries = pdf[pdf["role"] == "q"].sort_values("vec_id")
        if len(corpus) == 0 or len(queries) == 0:
            return pd.DataFrame(
                {"query_id": pd.Series(dtype="int64"),
                 "neighbor_id": pd.Series(dtype="int64"),
                 "cos_sim": pd.Series(dtype="float64")}
            )
        ids = corpus["vec_id"].to_numpy()
        X = np.array(list(corpus["embedding"]), dtype=np.float64)
        nrm = np.sqrt((X * X).sum(axis=1))
        nrm[nrm == 0.0] = 1.0
        Xn = X / nrm[:, None]

        def beam_search(qv, n_nodes, adj, width):
            """Best-first beam over the first ``n_nodes`` nodes.
            Returns [(sim, node)] best-first, len<=width. Entry is
            node 0 (first inserted). Similarities compute lazily per
            VISITED node — the beam touches O(ef·M) nodes, so build
            stays O(n·ef·M) dot products, not O(n²). Deterministic:
            candidates and results order by (-sim, node)."""
            import heapq

            sim_cache: dict[int, float] = {}

            def sim(node):
                s = sim_cache.get(node)
                if s is None:
                    s = float(Xn[node] @ qv)
                    sim_cache[node] = s
                return s

            visited = {0}
            # heaps: candidates max-first via (-sim, node); results
            # min-first via (sim, -node) so the worst pops first
            s0 = sim(0)
            cand = [(-s0, 0)]
            res = [(s0, 0)]
            while cand:
                c_negsim, c_node = heapq.heappop(cand)
                worst = res[0][0]
                if len(res) >= width and -c_negsim < worst:
                    break
                for nb in adj[c_node]:
                    if nb in visited:
                        continue
                    visited.add(nb)
                    s = sim(nb)
                    if len(res) < width or s > res[0][0]:
                        heapq.heappush(cand, (-s, nb))
                        heapq.heappush(res, (s, -nb))
                        if len(res) > width:
                            heapq.heappop(res)
            return sorted(((s, -negid) for s, negid in res),
                          key=lambda t: (-t[0], t[1]))

        # --- build: insert in vec_id order, link to M nearest found
        # by the construction beam over the graph so far
        n = len(ids)
        adj: list[list[int]] = [[] for _ in range(n)]
        for i in range(1, n):
            near = beam_search(Xn[i], i, adj, max(ef, m_links))
            for _s, j in near[:m_links]:
                adj[i].append(j)
                adj[j].append(i)

        # --- search
        out_q, out_n, out_s = [], [], []
        qids = queries["vec_id"].to_numpy()
        Q = np.array(list(queries["embedding"]), dtype=np.float64)
        qnrm = np.sqrt((Q * Q).sum(axis=1))
        qnrm[qnrm == 0.0] = 1.0
        Qn = Q / qnrm[:, None]
        for qi in range(len(qids)):
            near = beam_search(Qn[qi], n, adj, max(ef, k + 1))
            taken = 0
            for s, j in near:
                if ids[j] == qids[qi]:
                    continue  # a query is not its own neighbor
                out_q.append(qids[qi])
                out_n.append(ids[j])
                out_s.append(round(float(s), 4))
                taken += 1
                if taken >= k:
                    break
        return pd.DataFrame(
            {"query_id": np.array(out_q, dtype=np.int64),
             "neighbor_id": np.array(out_n, dtype=np.int64),
             "cos_sim": np.array(out_s, dtype=np.float64)}
        )

    return kernel


def nsw_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 8,
    probes: int = 2,
    m_links: int = 8,
    ef: int = 32,
) -> DataFrame:
    """Partitioned NSW top-k: (query_id, neighbor_id, rank, cos_sim).

    Scale shape: one shuffle co-locating each cell's corpus rows with
    the (tiny) query rows probing it; the kernel builds the cell
    graph and answers its queries in one pass; the global re-rank
    window runs over queries*probes*k rows — driver never holds data,
    only the C×dim centroids inside ivf_assign/ivf_probe_assign.
    """
    corpus_cells = similarity.ivf_assign(embeddings, n_cells).select(
        "vec_id", "centroid_id"
    )
    corpus = (
        embeddings.join(corpus_cells, "vec_id")
        .select("centroid_id", "vec_id", "embedding",
                F.lit("c").alias("role"))
    )
    queries = embeddings.filter(F.col("vec_id").isin(query_ids))
    q_cells = similarity.ivf_probe_assign(
        embeddings, n_cells, probes=probes, subject=queries
    )
    q_rows = (
        queries.join(q_cells, "vec_id")
        .select("centroid_id", "vec_id", "embedding",
                F.lit("q").alias("role"))
    )
    cand = (
        corpus.unionByName(q_rows)
        .groupBy("centroid_id")
        .applyInPandas(_nsw_kernel(m_links, ef, k), schema=NSW_SCHEMA)
    )
    # a neighbor reachable via two probed cells appears twice —
    # collapse before ranking
    cand = cand.groupBy("query_id", "neighbor_id").agg(
        F.max("cos_sim").alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
