"""Similarity search over embedding columns (array<float>).

Two tiers, as a real vector pipeline runs them:

- **Brute-force cosine top-k** — exact baseline. The query set is tiny
  (broadcast); the corpus streams through one narrow stage computing
  dot products with `zip_with`/`aggregate` (JVM-side, codegen — no
  Python in the loop) followed by a per-query top-k window. Cost is
  one pass over the corpus per batch of queries; no shuffle of the
  embedding column beyond the final (query, k) rows.
- **IVF (inverted-file) cosine** — the scale path: assign every vector
  to its nearest of C centroids (one broadcast pass), then search only
  the probe's centroid bucket. At 100 TB the assignment becomes the
  partitioning key (write bucketed-by-centroid parquet), so a query
  touches ~1/C of the data. Centroids here are seeded deterministically
  (first C vec_ids) so the oracle can reproduce assignment exactly;
  production would run k-means++ refinement on a sample.
"""

from __future__ import annotations

import math
from functools import lru_cache

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]·b[i] with double accumulation, left-to-right (matches
    DuckDB's list evaluation order for reproducible floats)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, rank, cos_sim rounded to 4). The
    query side is filtered from the corpus itself and broadcast.
    """
    queries = (
        embeddings.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            l2_norm(F.col("embedding")).alias("_q_nrm"),
        )
    )
    corpus = embeddings.select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("_nrm")
    )
    pairs = corpus.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    # dot / (q_norm * corpus_norm) — cosine() with both norms hoisted
    # out of the per-pair loop (computed once per vector, not per pair).
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("_q_nrm") * F.col("_nrm")),
            4,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cos ≥ thr).

    Brute-force all-pairs at test scale (the exact verify stage); the
    discovery stage at 100 TB is LSH bucketing (random-hyperplane
    signs) or :func:`ivf_assign` buckets — same pair-emission shape,
    restricted to same-bucket candidates.
    """
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("emb_a"), F.col("emb_b")), 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def semdedup(
    embeddings: DataFrame,
    n_centroids: int = 16,
    threshold: float = 0.32,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — the public
    semantic-dedup recipe): cluster the embeddings, then compare pairs
    only WITHIN each cluster — k·O((N/k)²) intra-cluster cosines
    instead of the O(N²) all-pairs, the move that made embedding dedup
    tractable on LAION/C4-scale corpora. Clustering here is the
    deterministic :func:`ivf_assign` (first-``n_centroids`` seed
    vectors as literal centroids — same argmax-in-scan shape, nothing
    shuffles for assignment); at 100 TB ``n_centroids`` grows with the
    corpus (k ≈ N / target_cluster_size) so per-cluster pairwise work
    stays bounded, exactly the paper's k=50k-for-600M setting.

    Returns the SURVIVORS (vec_id, centroid_id): a vector is removed
    iff some SMALLER-id vector in its cluster reaches ``threshold``
    cosine — the keep-lowest-id convention of the exact-dedup family
    (the paper keeps one exemplar per duplicate group; lowest-id is
    the deterministic, cross-engine-expressible choice). NULL vec_ids
    are excluded up front (they can never key a pair). Plan shape:
    one assignment scan, one per-cluster equi self-join on
    centroid_id (hash join, never a cartesian), one broadcast-size
    distinct of removed ids, one anti-join. The assignment is
    consumed three times (both self-join sides and the anti-join
    left), so it rides the bounded dedup cache — without it Catalyst
    inlines the C-centroid argmax into every consumer."""
    from olist_data_warehouse_spark.operators.dedup import _bounded_persist

    assigned = _bounded_persist(
        "semdedup_assign",
        ivf_assign(embeddings, n_centroids)
        .where(F.col("vec_id").isNotNull())
        .select("vec_id", "centroid_id"),
    )
    # norms hoisted to ONCE PER VECTOR (the brute_force_topk trick):
    # cosine(a, b) recomputes both norms per PAIR — O(pairs·dim) extra
    # work the per-row form avoids
    vecs = assigned.join(
        embeddings.select("vec_id", "embedding"), "vec_id"
    ).withColumn("_nrm", l2_norm(F.col("embedding")))
    a = vecs.select(
        F.col("vec_id").alias("vec_a"),
        F.col("centroid_id").alias("cid"),
        F.col("embedding").alias("emb_a"),
        F.col("_nrm").alias("nrm_a"),
    )
    b = vecs.select(
        F.col("vec_id").alias("vec_b"),
        F.col("centroid_id").alias("cid"),
        F.col("embedding").alias("emb_b"),
        F.col("_nrm").alias("nrm_b"),
    )
    cos = F.round(
        dot(F.col("emb_a"), F.col("emb_b"))
        / (F.col("nrm_a") * F.col("nrm_b")),
        4,
    )
    dup_ids = (
        a.join(b, "cid")
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(cos >= threshold)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    return assigned.join(dup_ids, "vec_id", "left_anti")


def cosine_pandas_udf(dim: int):
    """Arrow-batched Pandas-UDF cosine — the §2.10 'slow path done
    right' demonstration: used only when an expression can't stay in
    Catalyst (here it can — see :func:`cosine` — so this exists as the
    measured alternative and for kernels that genuinely need NumPy).
    Batched vectorized math, one JVM↔Python crossing per Arrow batch.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _cos(a, b):
        # float64 up-cast: Arrow delivers array<float> as float32 and
        # float32 accumulation drifts ~1e-7 — match the engine's
        # double-precision convention.
        am = np.stack(a.to_numpy()).astype(np.float64)
        bm = np.stack(b.to_numpy()).astype(np.float64)
        num = (am * bm).sum(axis=1)
        den = np.sqrt((am * am).sum(axis=1)) * np.sqrt((bm * bm).sum(axis=1))
        return pd.Series(num / den)

    # Explicit SCALAR eval type: type hints can't resolve locally
    # imported pandas in the UDF signature.
    return pandas_udf(_cos, "double", PandasUDFType.SCALAR)


# Random-hyperplane LSH: deterministic pseudo-random plane weights from
# a Knuth multiplicative hash of (plane, component), so the DuckDB
# oracle reproduces the exact same planes (and hence identical double
# arithmetic → identical sign bits).
LSH_N_PLANES = 8
LSH_MULT = 2654435761
LSH_MOD = 2147483648


def _plane_weight(p: int, j: Column) -> Column:
    """Weight of hyperplane ``p`` at component ``j``, in [-0.5, 0.5)."""
    return (
        (F.lit(p * 1024) + j) * F.lit(LSH_MULT) % F.lit(LSH_MOD)
    ) / F.lit(float(LSH_MOD)) - F.lit(0.5)


def _plane_weights(p: int, dim: int) -> list[float]:
    """Literal plane weights — the exact doubles the expression form
    computes (integer hash < 2^31 divided by 2^31, minus 0.5: every
    step exact in binary), precomputed once in Python instead of per
    element per row on the executors."""
    return [
        ((p * 1024 + j) * LSH_MULT % LSH_MOD) / float(LSH_MOD) - 0.5
        for j in range(dim)
    ]


_DIM_CACHE: dict[int, int | None] = {}


def _emb_dim(embeddings: DataFrame) -> int | None:
    """Embedding dimensionality from one row (None on empty input) —
    the one tiny job that lets every plane become a literal array.
    Memoized by the plan's semantic hash: bench/driver loops rebuild
    the same scan per invocation and the probe job (~0.15 s) would
    otherwise run every time."""
    try:
        key = embeddings.semanticHash()
    except Exception:
        key = None
    if key is not None and key in _DIM_CACHE:
        return _DIM_CACHE[key]
    row = embeddings.select(F.size("embedding").alias("d")).head(1)
    dim = row[0]["d"] if row else None
    if key is not None and dim is not None:
        _DIM_CACHE[key] = dim
    return dim


def _plane_dot(emb: Column, p: int, dim: int | None = None) -> Column:
    """dot(emb, plane_p) with left-to-right double accumulation. With
    ``dim`` known the plane is a literal array (zip_with against
    constants); without it the weights are computed per element in the
    expression — same values either way."""
    if dim is None:
        def weighted(x, j):
            return x.cast("double") * _plane_weight(p, j)

        return F.aggregate(
            F.transform(emb, weighted), F.lit(0.0), lambda acc, x: acc + x
        )
    w = _array_literal(_plane_weights(p, dim))
    return F.aggregate(
        F.zip_with(emb, w, lambda x, wv: x.cast("double") * wv),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def lsh_bucket(
    emb: Column, n_planes: int = LSH_N_PLANES, dim: int | None = None
) -> Column:
    """Random-hyperplane signature, bit-packed into a bucket id.

    Bit p = sign(dot(emb, plane_p)); two vectors collide in a bucket
    with probability (1 - θ/π)^n_planes — the SimHash geometry applied
    to real-valued embeddings. At 100 TB the bucket id is the partition
    key: write the corpus bucketed by it and a query probes one bucket
    (multi-probe = flip low-confidence bits). Pure Catalyst expressions;
    one corpus pass, no shuffle, no UDF.
    """
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        dot_p = _plane_dot(emb, p, dim)
        bucket = bucket + (dot_p >= 0).cast("long") * F.lit(1 << p)
    return bucket


def lsh_assign(embeddings: DataFrame, n_planes: int = LSH_N_PLANES) -> DataFrame:
    """(vec_id, bucket) assignment under random-hyperplane LSH."""
    return embeddings.select(
        "vec_id",
        lsh_bucket(
            F.col("embedding"), n_planes, dim=_emb_dim(embeddings)
        ).alias("bucket"),
    )


def lsh_probe_buckets(
    emb: Column, n_planes: int, probes: int, dim: int | None = None
) -> Column:
    """Multi-probe bucket set: the base bucket plus the buckets reached
    by flipping the (probes-1) LOWEST-CONFIDENCE bits — the planes whose
    |dot| is smallest, i.e. where the vector sits closest to the
    boundary and a true neighbor most plausibly landed on the other
    side. Returns array<long> of ``probes`` distinct bucket ids.

    This is standard multi-probe LSH: recall grows with probes while
    the corpus stays single-bucketed — only the (tiny) query side fans
    out, so the join cost scales with probes × bucket size, never with
    corpus².
    """
    dots = [_plane_dot(emb, p, dim) for p in range(n_planes)]
    base = F.lit(0).cast("long")
    for p in range(n_planes):
        base = base + (dots[p] >= 0).cast("long") * F.lit(1 << p)
    if probes <= 1:
        return F.array(base)
    # planes ranked by |dot| ascending; ties broken by plane index so
    # the oracle can reproduce the exact probe set
    ranked = F.transform(
        F.array_sort(
            F.array(*[
                F.struct(F.abs(dots[p]).alias("a"), F.lit(p).alias("p"))
                for p in range(n_planes)
            ])
        ),
        lambda s: s["p"],
    )
    flips = F.slice(ranked, 1, probes - 1)
    return F.concat(
        F.array(base),
        F.transform(
            # 2^p is exact in a double for p < 53, so the cast is safe
            flips,
            lambda p: base.bitwiseXOR(
                F.pow(F.lit(2.0), p.cast("double")).cast("long")
            ),
        ),
    )


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = LSH_N_PLANES,
    probes: int = 1,
) -> DataFrame:
    """Approximate top-k restricted to the query's LSH bucket(s).

    Same candidate-generation shape as :func:`ivf_topk` with the
    hyperplane bucket as the join key. ``probes > 1`` widens the search
    to the buckets behind the query's lowest-confidence bits
    (:func:`lsh_probe_buckets`) — recall rises, the corpus side stays
    single-bucketed, and only the broadcast query side fans out.
    """
    dim = _emb_dim(embeddings)
    corpus = embeddings.select(
        "vec_id",
        "embedding",
        l2_norm(F.col("embedding")).alias("_nrm"),
        lsh_bucket(F.col("embedding"), n_planes, dim).alias("bucket"),
    )
    queries = (
        embeddings.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            l2_norm(F.col("embedding")).alias("_q_nrm"),
            F.explode(
                lsh_probe_buckets(F.col("embedding"), n_planes, probes, dim)
            ).alias("bucket"),
        )
    )
    pairs = corpus.join(
        F.broadcast(queries),
        (F.col("vec_id") != F.col("query_id"))
        & (corpus.bucket == queries.bucket),
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("_q_nrm") * F.col("_nrm")),
            4,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


@lru_cache(maxsize=32)
def _planes_literal(n_planes: int, dim: int) -> Column:
    """The n_planes×dim hyperplane matrix as ONE JVM-parsed SQL array
    literal, memoized. Not n_planes×dim ``F.lit()`` calls: at 64 planes
    × dim 64 the per-literal py4j round-trips cost ~2.2 s of driver
    time PER INVOCATION (more than the query's executor time); the
    parsed string builds in ~0.03 s and the parse itself is paid once
    per process thanks to the memo (the Column is an unresolved,
    session-independent expression tree — safe to reuse across plans).
    Weights are exact binary fractions (k/2^31 − 0.5), repr() round-
    trips doubles exactly, and SQL parse is correctly rounded, so the
    values — and every sign bit downstream — are bit-identical to the
    F.lit form and the DuckDB oracle."""
    return F.expr(
        "array("
        + ",".join(
            "array("
            + ",".join(repr(float(w)) + "D" for w in _plane_weights(p, dim))
            + ")"
            for p in range(n_planes)
        )
        + ")"
    )


def lsh_band_bucket_table(
    embeddings: DataFrame,
    n_bands: int = 4,
    planes_per_band: int = 4,
) -> DataFrame:
    """(vec_id, band, bucket): per-band bucket ids. Band b packs the
    signs of planes [b·r, b·r+r) — the OR-amplification construction:
    two vectors are candidates if ANY band bucket matches, so recall for
    genuinely-close pairs is 1-(1-p^r)^B instead of p^(B·r).

    Expression-shape note (hard-won): the B·r plane dots are computed
    as ONE nested lambda over a 2-D literal plane matrix and
    materialized as their own projection (``sig`` column) *below* the
    explode. Packing everything into a single column expression makes
    the optimizer's extract-value simplification re-inline the whole
    signature once per band (B× the dots); unrolling every plane into
    its own fold expression blows the tree up so far that analysis
    itself hangs at 64 planes. The two-projection form keeps the
    signature evaluated exactly once per row and the tree codegen-
    small — measured 0.4 s vs 116 s for the fused form at sf0.1.
    Arithmetic is the same left-to-right double fold per plane either
    way, so sign bits — and the DuckDB oracle — are unchanged.
    """
    dim = _emb_dim(embeddings)
    n_planes = n_bands * planes_per_band
    if dim is None:
        return embeddings.select("vec_id").limit(0).select(
            "vec_id",
            F.lit(0).alias("band"),
            F.lit(0).cast("long").alias("bucket"),
        )
    planes = _planes_literal(n_planes, dim)
    sig = F.transform(
        planes,
        lambda pl: F.aggregate(
            F.zip_with(
                F.col("embedding"), pl, lambda x, w: x.cast("double") * w
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        >= 0,
    )
    powers = F.array(*[
        F.lit(1 << j).cast("long") for j in range(planes_per_band)
    ])
    bucket_arr = F.array(*[
        F.aggregate(
            F.zip_with(
                F.slice(F.col("sig"), b * planes_per_band + 1, planes_per_band),
                powers,
                lambda bit, w: F.when(bit, w).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        for b in range(n_bands)
    ])
    return (
        embeddings.select("vec_id", sig.alias("sig"))
        .select("vec_id", F.posexplode(bucket_arr).alias("band", "bucket"))
    )


def lsh_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    n_bands: int = 4,
    planes_per_band: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Bucketed embedding near-dup detection — the 100 TB composition:
    banded-LSH discovery (equi-join on (band, bucket)) followed by the
    exact-cosine verify on candidates only. Same output contract as
    :func:`cosine_near_dup_pairs` (vec_a < vec_b, cos_sim ≥ threshold,
    rounded 4) minus pairs the bands never co-bucket.

    Plan shape: the band join shuffles only ids plus each vector's ≤B
    kept (band, bucket) structs — embeddings never move until the
    verify stage, which joins the candidate set back to the corpus by
    key. Candidate dedup is MAP-SIDE (first-shared-band filter), not a
    DISTINCT exchange over the band-multiplied join output; the
    hot-bucket fuse is a broadcast anti-join (the hot set is bounded by
    N/cap rows). Every join is an equi hash join; nothing plans as a
    nested loop, unlike the all-pairs form.

    Scale knobs: candidate volume per band is Σ_buckets C(size, 2), so
    ``planes_per_band`` must grow with corpus size to keep buckets
    bounded (recall is then recovered by adding bands).
    ``max_bucket_size`` is the skew fuse — a degenerate region of
    embedding space (all-zero vectors, cluster collapse) otherwise
    hot-spots one bucket into a quadratic join, exactly like a
    stop-shingle in n-gram dedup; buckets above the cap are dropped
    from discovery before the self-join, in engine and oracle alike.
    """
    # Persist: the bucket table is read by the size-cap aggregate and
    # the kept-rows anti-join — without a materialization point Catalyst
    # inlines the B·r-plane signature expression into every consumer
    # and the dots run multiple times (measured: dominates the op).
    buckets = lsh_band_bucket_table(
        embeddings, n_bands, planes_per_band
    ).persist()
    if max_bucket_size is not None:
        # Skew fuse as a BROADCAST anti-join: the hot set is bounded by
        # N / max_bucket_size entries regardless of the bucket-id space,
        # so it always fits in a broadcast — unlike its complement (the
        # "small" set), whose size grows with distinct buckets and which
        # an inner join would have to shuffle at high plane counts.
        hot = (
            buckets.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_bs"))
            .filter(F.col("_bs") > max_bucket_size)
            .select("band", "bucket")
        )
        kept = buckets.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
    else:
        kept = buckets
    # Per-vector POSITIONAL kept-bucket array (barr[i] = band-i bucket,
    # NULL if capped away), carried through the self-join so duplicate
    # candidates are eliminated MAP-SIDE: a pair that co-buckets in k
    # bands appears k times after the equi-join, and keeping only the
    # row where `band` equals the FIRST band whose buckets match yields
    # each pair exactly once — no post-join DISTINCT. That trades one
    # exchange of the band-multiplied candidate output for one exchange
    # of N rows of (vec_id, B longs) here, a strict win whenever
    # near-dups co-bucket in several bands (the design intent of
    # OR-amplification). The positional form matters: a single length-B
    # zip_with + array_position is ~B comparisons per joined row, vs
    # B×B for a struct-set membership test (A/B-measured 2.6× faster
    # end-to-end at sf0.1).
    kb = (
        kept.groupBy("vec_id")
        .agg(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda i: F.try_element_at(
                    F.map_from_entries(
                        F.sort_array(F.collect_list(F.struct("band", "bucket")))
                    ),
                    i,
                ),
            ).alias("barr")
        )
        .persist()
    )
    a = kb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("barr").alias("barr_a"),
        F.posexplode("barr").alias("band", "bucket"),
    ).filter(F.col("bucket").isNotNull())
    b = kb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("barr").alias("barr_b"),
        F.posexplode("barr").alias("band", "bucket"),
    ).filter(F.col("bucket").isNotNull())
    # 1-based index of the first band where both kept buckets match —
    # pure Catalyst, no shuffle; the joined band itself guarantees a hit
    first_shared = (
        F.array_position(
            F.zip_with(
                F.col("barr_a"),
                F.col("barr_b"),
                lambda x, y: x.isNotNull() & x.eqNullSafe(y),
            ),
            F.lit(True),
        )
        - 1
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(
            (F.col("vec_a") < F.col("vec_b")) & (F.col("band") == first_shared)
        )
        .select("vec_a", "vec_b")
    )
    # Norms are computed ONCE per vector here, not once per candidate
    # pair — the verify stage then runs a single array traversal (the
    # dot) per pair instead of three. Same arithmetic in the same order
    # as cosine(), so the rounded values are bit-identical to the
    # all-pairs baseline and the oracle.
    normed = embeddings.select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("nrm")
    )
    ea = normed.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    eb = normed.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(
                dot(F.col("emb_a"), F.col("emb_b"))
                / (F.col("nrm_a") * F.col("nrm_b")),
                4,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _seed_centroids(
    embeddings: DataFrame, n_centroids: int
) -> list[tuple[int, list[float]]]:
    """Collect the deterministic seed centroids (first ``n_centroids``
    vec_ids) to the driver. Centroids are *model parameters*, not data
    — C×dim floats, the same thing MLlib's k-means ships to executors —
    so collecting them is the scale-correct move: scoring then compiles
    to a narrow per-row expression with zero joins and zero shuffles
    over the corpus."""
    rows = (
        embeddings.filter(F.col("vec_id") < n_centroids)
        .select("vec_id", "embedding")
        .collect()
    )
    return sorted((r.vec_id, [float(x) for x in r.embedding]) for r in rows)


def _py_l2_norm(xs: list[float]) -> float:
    """Python twin of :func:`l2_norm`: left-to-right double sum of
    squares then IEEE sqrt — the identical 64-bit result, computed once
    at plan-build time instead of per row."""
    import math

    acc = 0.0
    for x in xs:
        acc += x * x
    return math.sqrt(acc)


def _array_literal(values: list[float]) -> Column:
    """A double-array literal as ONE JVM-parsed expression instead of
    len(values) ``F.lit()`` py4j round-trips — the same build-time
    lever as :func:`_planes_literal` (at C=8×dim=64 the per-literal
    calls cost ~0.3 s of driver time per plan build). repr() round-
    trips doubles exactly and SQL parse is correctly rounded, so the
    values are bit-identical to the F.lit form."""
    return F.expr(
        "array(" + ",".join(repr(float(v)) + "D" for v in values) + ")"
    )


def _centroid_scores(
    emb: Column, nrm: Column, cents: list[tuple[int, list[float]]]
) -> Column:
    """array<struct<cos_sim,centroid_id>> scoring ``emb`` against every
    literal centroid — same arithmetic/order as :func:`cosine` against
    a float32-sourced column (dot / (norm_row * norm_centroid), row
    norm first), so values match the crossJoin form and the oracle
    bit-for-bit. ``nrm`` is the row's precomputed :func:`l2_norm`;
    centroid norms are plan-time literals."""
    return F.array(*[
        F.struct(
            F.round(
                dot(emb, _array_literal(c_emb))
                / (nrm * F.lit(_py_l2_norm(c_emb))),
                4,
            ).alias("cos_sim"),
            F.lit(cid).cast("long").alias("centroid_id"),
        )
        for cid, c_emb in cents
    ])


def ivf_assign(embeddings: DataFrame, n_centroids: int = 8) -> DataFrame:
    """Assign each vector to its nearest (max-cosine) seed centroid.

    Deterministic seeding: centroids are the first ``n_centroids``
    vec_ids. Returns (vec_id, centroid_id, cos_sim rounded 4).

    Scale shape: centroids are literals in a narrow projection — the
    argmax runs inside the corpus scan; no crossJoin row inflation, no
    window shuffle, nothing moves. Tie-break (equal cos_sim → lowest
    centroid_id) is encoded by maximizing struct(cos_sim, -centroid_id).
    """
    cents = _seed_centroids(embeddings, n_centroids)
    if not cents:
        # No seed rows (empty or id-shifted corpus): a zero-entry
        # centroid literal would type as VOID and fail at plan build —
        # return the typed empty result instead (the
        # lsh_band_bucket_table empty-input contract).
        return embeddings.select("vec_id").limit(0).select(
            "vec_id",
            F.lit(0).cast("long").alias("centroid_id"),
            F.lit(0.0).alias("cos_sim"),
        )
    normed = embeddings.select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("_nrm")
    )
    scores = _centroid_scores(F.col("embedding"), F.col("_nrm"), cents)
    best = F.array_max(
        F.transform(
            scores,
            lambda s: F.struct(
                s["cos_sim"].alias("cos_sim"),
                (-s["centroid_id"]).alias("neg_id"),
            ),
        )
    )
    return normed.select(
        "vec_id",
        (-best["neg_id"]).alias("centroid_id"),
        best["cos_sim"].alias("cos_sim"),
    )


def ivf_probe_assign(
    embeddings: DataFrame,
    n_centroids: int = 8,
    probes: int = 1,
    subject: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, centroid_id) for each vector's ``probes`` nearest
    centroids (rank 1 = the IVF assignment). Multi-probe widens a
    query to its runner-up centroids — the standard recall lever: a
    true neighbor near a Voronoi boundary sits in a bucket whose
    centroid is the query's 2nd/3rd nearest. ``subject`` restricts
    which vectors get assigned (centroids always come from the full
    ``embeddings`` seed rows).

    Same narrow literal-centroid shape as :func:`ivf_assign`: the
    top-``probes`` centroids come from array_sort over the per-row
    score array (desc cos_sim, asc centroid_id) — no join, no window.
    """
    cents = _seed_centroids(embeddings, n_centroids)
    base = subject if subject is not None else embeddings
    if not cents:
        # same empty-input contract as ivf_assign
        return base.select("vec_id").limit(0).select(
            "vec_id", F.lit(0).cast("long").alias("centroid_id")
        )
    normed = base.select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("_nrm")
    )
    scores = _centroid_scores(F.col("embedding"), F.col("_nrm"), cents)
    ranked = F.array_sort(
        F.transform(
            scores,
            lambda s: F.struct(
                (-s["cos_sim"]).alias("neg_cos"),
                s["centroid_id"].alias("centroid_id"),
            ),
        )
    )
    return normed.select(
        "vec_id",
        F.explode(
            F.transform(
                F.slice(ranked, 1, probes), lambda s: s["centroid_id"]
            )
        ).alias("centroid_id"),
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 8,
    probes: int = 1,
) -> DataFrame:
    """Approximate top-k: search within the query's ``probes`` nearest
    centroid buckets (1 = plain IVF). The corpus stays single-bucketed;
    only the broadcast query side fans out, so cost scales with
    probes × bucket size. Returns the same shape as
    :func:`brute_force_topk`.
    """
    cents = _seed_centroids(embeddings, n_centroids)
    if not cents:
        # same empty-input contract as ivf_assign
        return embeddings.select("vec_id").limit(0).select(
            F.col("vec_id").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            F.lit(0).alias("rank"),
            F.lit(0.0).alias("cos_sim"),
        )
    normed = embeddings.select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("_nrm")
    )
    scores = _centroid_scores(F.col("embedding"), F.col("_nrm"), cents)
    best = F.array_max(
        F.transform(
            scores,
            lambda s: F.struct(
                s["cos_sim"].alias("cos_sim"),
                (-s["centroid_id"]).alias("neg_id"),
            ),
        )
    )
    # Corpus assignment is a narrow literal-centroid expression — the
    # centroid id materializes inside the scan, no join, no shuffle.
    # The norm rides along so the verify divides by it instead of
    # re-traversing the embedding per candidate pair.
    corpus = normed.select(
        "vec_id", "embedding", "_nrm", (-best["neg_id"]).alias("centroid_id")
    )
    ranked = F.array_sort(
        F.transform(
            scores,
            lambda s: F.struct(
                (-s["cos_sim"]).alias("neg_cos"),
                s["centroid_id"].alias("centroid_id"),
            ),
        )
    )
    queries = normed.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("_nrm").alias("_q_nrm"),
        F.explode(
            F.transform(F.slice(ranked, 1, probes), lambda s: s["centroid_id"])
        ).alias("centroid_id"),
    )
    pairs = corpus.join(
        F.broadcast(queries),
        (F.col("vec_id") != F.col("query_id"))
        & (corpus.centroid_id == queries.centroid_id),
    )
    # dot / (q_norm * corpus_norm): identical expression order to
    # cosine(q_emb, embedding), norms just precomputed.
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("_q_nrm") * F.col("_nrm")),
            4,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


# ---------------------------------------------------------------------------
# K-means centroid refinement (the IVF production path)
# ---------------------------------------------------------------------------

KM_SCALE = 1_000_000  # fixed-point quantization: 1e-6 resolution


def _quantize(emb: Column) -> Column:
    """array<float> → array<bigint> at 1e-6 resolution. Quantizing
    makes every centroid sum an exact integer — partial aggregation
    order stops mattering, so the result is identical on any partition
    layout AND any engine (float sums are neither)."""
    return F.transform(
        emb, lambda x: F.round(x.cast("double") * KM_SCALE).cast("long")
    )


def _dequant(q: Column) -> Column:
    return F.transform(q, lambda v: v / F.lit(float(KM_SCALE)))


def _sq_dist(a: Column, b: Column) -> Column:
    """Σ (a[i]-b[i])² with left-to-right double accumulation (matches
    DuckDB's list_reduce order for reproducible floats)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_refine(
    embeddings: DataFrame, n_centroids: int = 8, iters: int = 2
) -> DataFrame:
    """Lloyd's k-means on quantized vectors: ``iters`` rounds of
    assign-to-nearest + recompute-centroid, from the same
    deterministic seeds as :func:`ivf_assign`. Returns the final
    assignment (vec_id, centroid_id, sq_dist rounded 4).

    Scale shape per iteration: assignment is one broadcast of C
    centroid rows against a streaming corpus pass (argmin via
    row_number over C candidates); the update is posexplode →
    groupBy (centroid, dim) — a bounded partial aggregate of exact
    BIGINT sums (≤ C·dim rows survive per partition), reassembled into
    C arrays. Nothing collects beyond the C×dim centroid table. An
    empty cluster drops out (standard Lloyd behavior), kept identical
    in the oracle.
    """
    q = embeddings.select(
        "vec_id", _quantize(F.col("embedding")).alias("qe")
    ).localCheckpoint()

    centroids = q.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), _dequant("qe").alias("c_emb")
    )

    assign = None
    for _ in range(iters):
        scored = q.crossJoin(F.broadcast(centroids)).select(
            "vec_id", "qe", "centroid_id",
            _sq_dist(_dequant("qe"), F.col("c_emb")).alias("sq_dist"),
        )
        # argmin as min_by aggregate (partial-agg map-side, no sort) —
        # same tie-break as the old ORDER BY (sq_dist, centroid_id)
        assign = (
            scored.groupBy("vec_id")
            .agg(
                F.min_by(
                    F.struct("qe", "centroid_id", "sq_dist"),
                    F.struct("sq_dist", "centroid_id"),
                ).alias("_w")
            )
            .select(
                "vec_id",
                F.col("_w.qe").alias("qe"),
                F.col("_w.centroid_id").alias("centroid_id"),
                F.col("_w.sq_dist").alias("sq_dist"),
            )
        )
        # centroid update: exact integer per-dimension sums
        sums = (
            assign.select(
                "centroid_id", F.posexplode("qe").alias("d", "v")
            )
            .groupBy("centroid_id", "d")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        )
        centroids = (
            sums.withColumn("val", F.col("s") / F.col("n") / KM_SCALE)
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "val"))),
                    lambda s: s["val"],
                ).alias("c_emb")
            )
        )

    return assign.select(
        "vec_id", "centroid_id", F.round("sq_dist", 4).alias("sq_dist")
    )


def knn_label_vote(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    label_col: str = "label",
) -> DataFrame:
    """kNN classification by majority vote: for each query vector, the
    modal label of its k nearest (cosine) corpus neighbors, ties to the
    smallest label — the label-propagation / auto-labeling primitive
    (predict a quality tier or topic for unlabeled items from labeled
    neighbors).

    Returns (query_id, knn_label, votes). Composes the exact top-k
    scorer with a key-join back to the label table: the scored top-k
    is tiny (|queries|·k rows), so the label join and the vote count
    are driver-free small-data stages; only the corpus scan is big,
    and it is the same single broadcast-join scan as
    :func:`brute_force_topk`. Swap that stage for the IVF/LSH variants
    when the corpus outgrows brute force.
    """
    topk = brute_force_topk(embeddings, query_ids, k=k)
    labels = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col(label_col)
    )
    votes = (
        topk.join(labels, "neighbor_id")
        # An UNLABELED neighbor casts no vote: without this filter a
        # NULL "label" forms a votable group whose rank position then
        # depends on the engine's null sort default (null_fuzz_sweep).
        .filter(F.col(label_col).isNotNull())
        .groupBy("query_id", label_col)
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.asc(label_col)
    )
    return (
        votes.withColumn("_vr", F.row_number().over(w))
        .filter(F.col("_vr") == 1)
        .select(
            "query_id",
            F.col(label_col).alias("knn_label"),
            "votes",
        )
    )


def quantize_embeddings(
    embeddings: DataFrame, bits: int = 8
) -> DataFrame:
    """Scalar (symmetric max-abs) quantization of the embedding column:
    per-vector scale = max|x| / qmax, components → round(x/scale) in
    [-qmax, qmax]. At 100 TB this is the storage/bandwidth lever for
    vector corpora — int8 cuts the column 4× vs float32 and the
    candidate-scoring dot becomes pure integer arithmetic (exact,
    engine-portable), with the float re-rank reserved for the few
    surviving candidates. Returns (vec_id, qvec array<int>, qscale).
    Zero vectors quantize to all-zero with qscale NULL.
    """
    qmax = (1 << (bits - 1)) - 1
    maxabs = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = F.when(maxabs > 0, maxabs / F.lit(float(qmax)))
    return embeddings.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.when(
                scale.isNull(), F.lit(0)
            ).otherwise(
                F.round(x.cast("double") / scale, 0).cast("int")
            ),
        ).alias("qvec"),
        scale.alias("qscale"),
    )


def quantized_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Top-k by INTEGER quantized dot product — the cheap first-pass
    ranker over int8 vectors. The dot is a BIGINT (exact on any
    engine); ordering by (qdot·scales) ≈ cosine numerator, and since
    per-query ranking shares the query scale, ordering by
    qdot·neighbor_scale alone is equivalent. Same broadcast-query /
    one-corpus-pass shape as :func:`brute_force_topk`; swap-in
    candidate generator for it when vectors live quantized on disk.
    Returns (query_id, neighbor_id, rank, qdot).
    """
    q = quantize_embeddings(embeddings)
    queries = (
        q.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("qvec").alias("q_qvec"),
        )
    )
    pairs = q.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    )
    qdot = F.aggregate(
        F.zip_with(
            F.col("q_qvec"), F.col("qvec"),
            lambda a, b: a.cast("long") * b.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # neighbor scale breaks the pure-integer ordering tie toward the
    # genuinely longer vector; qdot stays the exact integer output.
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        qdot.alias("qdot"),
        (qdot.cast("double") * F.col("qscale")).alias("_mag"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_mag"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "qdot")
    )


def write_ivf_layout(
    embeddings: DataFrame,
    table: str,
    n_centroids: int = 8,
) -> None:
    """Materialize the IVF index AS the storage layout: embeddings
    written bucketed by their centroid assignment, one bucket per
    centroid. This is the "assignment becomes the partitioning key"
    step of the scale path — a probe then reads 1/C of the files
    instead of scanning the corpus (see :func:`ivf_probe`), and a
    bucketed centroid-keyed join needs no exchange. Rebuild cadence is
    a layout decision (centroids drift slowly; re-cluster offline like
    any OPTIMIZE job)."""
    assigned = ivf_assign(embeddings, n_centroids).select(
        "vec_id", "centroid_id"
    )
    (
        assigned.join(embeddings, "vec_id")
        .write.mode("overwrite")
        .bucketBy(n_centroids, "centroid_id")
        .saveAsTable(table)
    )


def ivf_probe(spark, table: str, centroid_id: int) -> DataFrame:
    """Read ONE centroid bucket of a :func:`write_ivf_layout` table.

    Sets ``spark.sql.sources.bucketing.autoBucketedScan.enabled=false``
    on the session and leaves it set (same caller-visible-conf posture
    as the streaming reader): with auto bucketed scan ON, Spark
    rewrites a bucketed scan that feeds no join/agg into a plain scan
    and silently LOSES filter-based bucket pruning — the plan then
    reads all C buckets. With it off, the probe plans
    ``SelectedBucketsCount: 1 out of C`` (pinned in tests): file
    listing and IO touch 1/C of the corpus, which is the entire point
    of the IVF layout."""
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    return spark.table(table).filter(
        F.col("centroid_id") == int(centroid_id)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric distance computation (ADC)
# ---------------------------------------------------------------------------


def pq_codebooks(
    embeddings: DataFrame, n_subspaces: int = 4, n_codes: int = 8
) -> list[list[tuple[int, list[float]]]]:
    """Per-subspace PQ codebooks from the deterministic seed rows (the
    first ``n_codes`` vec_ids, split into ``n_subspaces`` equal
    slices). Codebooks are *model parameters* like IVF centroids and
    LSH planes — M×K×(dim/M) floats collected once to the driver and
    compiled into the scan expression; production swaps in per-subspace
    k-means without changing any plan shape."""
    seeds = _seed_centroids(embeddings, n_codes)
    if not seeds:
        # empty corpus (or no vec_id < n_codes): no codebooks — callers
        # return empty results, matching lsh_band_bucket_table's
        # empty-input contract
        return []
    dim = len(seeds[0][1])
    sub = dim // n_subspaces
    return [
        [
            (idx, vec[m * sub : (m + 1) * sub])
            for idx, (_vid, vec) in enumerate(seeds)
        ]
        for m in range(n_subspaces)
    ]


def _sub_slice(emb: Column, m: int, sub: int) -> Column:
    """Double-cast slice of subspace m (1-based slice, same as SQL)."""
    return F.transform(
        F.slice(emb, m * sub + 1, sub), lambda x: x.cast("double")
    )


def _sub_dist_array(emb: Column, m: int, sub: int, book) -> Column:
    """array<double> of the rounded-6 squared L2 distances from
    subspace m of ``emb`` to EVERY code word, as ONE ``transform`` over
    a JVM-parsed literal array of (w, ww) codeword structs. The
    arithmetic per element is the algebraic form ||x||² − 2·x·w + ||w||²
    with the same left-to-right fold as :func:`dot` (mirrored literally
    in the oracle SQL); rounding to 1e-6 absorbs engine ulp differences
    before any argmin. One transform instead of K separate per-codeword
    expression subtrees is the PLAN-BUILD lever: the PQ plans need M*K
    codeword distances on the corpus side plus M*K per-query LUT
    entries, and constructing ~2*M*K zip_with/aggregate subtrees
    through py4j cost ~2.3 s of driver time PER INVOCATION (3× the
    executor time on the 2k-row test corpus). Values are bit-identical:
    repr() round-trips the doubles exactly and the fold order is
    unchanged."""
    s = _sub_slice(emb, m, sub)
    xx = F.aggregate(
        F.zip_with(s, s, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    entries = []
    for _idx, w in book:
        ww = 0.0
        for v in w:
            if not math.isfinite(float(v)):
                # repr() of nan/inf ('nanD'/'infD') is unparseable SQL;
                # fail at build time with the cause, not a parse error.
                raise ValueError(
                    f"codebook word {_idx} has non-finite component "
                    f"{v!r}; PQ codebooks must be finite"
                )
            ww += float(v) * float(v)
        entries.append(
            "named_struct('w',array("
            + ",".join(repr(float(v)) + "D" for v in w)
            + "),'ww'," + repr(ww) + "D)"
        )
    mat = F.expr("array(" + ",".join(entries) + ")")
    return F.transform(
        mat,
        lambda b: F.round(
            xx
            - 2.0
            * F.aggregate(
                F.zip_with(s, b["w"], lambda x, wv: x * wv),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            + b["ww"],
            6,
        ),
    )


def _pq_code_cols(emb, books, sub: int) -> list[Column]:
    """One argmin column per subspace (rounded-6 distance, code-id
    tie-break) — the SINGLE encoding definition shared by pq_encode,
    pq_encode_raw, and ivfpq_topk so a tie-break or rounding change
    can never fork engine/oracle parity between entries. The argmin
    runs over :func:`_sub_dist_array` with the transform's element
    index as the code id (same (d, c) struct-min tie-break as the
    original per-codeword form)."""
    cols = []
    for m, book in enumerate(books):
        darr = _sub_dist_array(emb, m, sub, book)
        entries = F.transform(
            darr,
            lambda d, i: F.struct(
                d.alias("d"), i.cast("int").alias("c")
            ),
        )
        cols.append(F.array_min(entries)["c"])
    return cols


def pq_encode(
    embeddings: DataFrame, n_subspaces: int = 4, n_codes: int = 8
) -> DataFrame:
    """(vec_id, pq_code): each vector compressed to M code indices —
    dim×4 bytes → M bytes, the memory lever that lets a vector corpus
    live RAM-resident at 100 TB scale (int8 scalar quantization's 4×
    is the gentle sibling; PQ at M=4,K=8 here is 64×). Encoding is a
    pure per-row scan expression (argmin over K literal code words per
    subspace) — zero joins, zero shuffles, the same narrow shape as
    ivf_assign. pq_code serializes as a CSV string (the portable array
    encoding used by the histogram/posting entries)."""
    return pq_encode_raw(embeddings, n_subspaces, n_codes).select(
        "vec_id",
        F.array_join(
            F.transform(F.col("pq_codes"), lambda c: c.cast("string")), ","
        ).alias("pq_code"),
    )


def pq_adc_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_subspaces: int = 4,
    n_codes: int = 8,
) -> DataFrame:
    """Top-k by ASYMMETRIC distance: the query stays full-precision,
    corpus vectors are replaced by their PQ codes, and the distance is
    Σ_m d(q_m, codeword(x, m)) — the standard ADC retrieval kernel.
    The per-(query, subspace) distances to all K code words form a
    lookup array; scoring a corpus row is then M array lookups by its
    stored code, NOT a dim-length dot — the property that makes PQ
    search memory-bandwidth-, not FLOP-, bound at scale. Here the
    lookup tables ride the broadcast query rows and the corpus side
    touches only (vec_id, M small ints).

    Returns (query_id, neighbor_id, rank, adc_dist) — rank by
    (adc_dist asc, neighbor_id) for a deterministic k-boundary."""
    books = pq_codebooks(embeddings, n_subspaces, n_codes)
    dim = _emb_dim(embeddings)
    if not books or dim is None:
        # same empty-input contract as pq_encode_raw / ivfpq_topk
        return embeddings.select("vec_id").limit(0).select(
            F.col("vec_id").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            F.lit(0).alias("rank"),
            F.lit(0.0).alias("adc_dist"),
        )
    sub = dim // n_subspaces

    coded = pq_encode_raw(embeddings, n_subspaces, n_codes)
    # The LUT (per subspace, the K rounded-6 distances from the query's
    # sub-vector to every code word) is MATERIALIZED on the broadcast
    # side, under the BroadcastExchange: it is computed once per QUERY
    # row, never per corpus row. Folding the _sub_dist_array expression into
    # the join projection instead (the original formulation) recomputes
    # all M*K sub-dots for every (corpus, query) pair — 8*dim mults per
    # corpus row, WORSE than a brute-force dot; this way the corpus
    # side pays exactly the M array lookups ADC promises.
    lut = F.array(*[
        _sub_dist_array(F.col("q_emb"), m, sub, book)
        for m, book in enumerate(books)
    ])
    queries = (
        embeddings.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
        )
        .select("query_id", lut.alias("lut"))
    )
    pairs = coded.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    )
    parts = [
        F.element_at(
            F.col("lut").getItem(m), F.col("pq_codes").getItem(m) + 1
        )
        for m in range(len(books))
    ]
    adc = parts[0]
    for p in parts[1:]:
        adc = adc + p
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(adc, 4).alias("adc_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )


def pq_encode_raw(
    embeddings: DataFrame, n_subspaces: int = 4, n_codes: int = 8
) -> DataFrame:
    """(vec_id, pq_codes array<int>) — :func:`pq_encode` before the
    portable CSV serialization, for plan composition (ADC joins on the
    int array, the registry entry hashes the string form)."""
    books = pq_codebooks(embeddings, n_subspaces, n_codes)
    dim = _emb_dim(embeddings)
    if not books or dim is None:
        return embeddings.select("vec_id").limit(0).select(
            "vec_id", F.array().cast("array<int>").alias("pq_codes")
        )
    sub = dim // n_subspaces
    codes = _pq_code_cols(F.col("embedding"), books, sub)
    return embeddings.select("vec_id", F.array(*codes).alias("pq_codes"))


def ivfpq_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    shortlist: int = 20,
    n_centroids: int = 8,
    n_subspaces: int = 4,
    n_codes: int = 8,
) -> DataFrame:
    """IVF-PQ retrieval — the billion-scale production pipeline as one
    composed plan: (1) COARSE filter to the query's IVF bucket (~1/C
    of the corpus), (2) ADC scan over PQ codes inside the bucket (M
    lookup-table reads per row, memory-bandwidth-bound), (3) exact
    full-precision cosine RE-RANK of the top-``shortlist`` survivors.
    The corpus-side projection computes centroid id AND PQ codes in a
    single narrow scan (both are literal-parameter argmin/argmax
    expressions) — zero corpus joins before the broadcast query join.

    At 100 TB stages (1) and (2) read the bucketed layout
    (write_ivf_layout) with codes stored columnar beside ids, and only
    stage (3) touches the full-precision vectors — for ``shortlist``
    rows per query, an id-keyed point lookup. Returns
    (query_id, neighbor_id, rank, cos_sim) — exact cosine of the
    ADC-shortlisted candidates, rank by (cos desc, id).
    """
    cents = _seed_centroids(embeddings, n_centroids)
    books = pq_codebooks(embeddings, n_subspaces, n_codes)
    dim = _emb_dim(embeddings)
    if not books or not cents or dim is None:
        return embeddings.select(
            F.col("vec_id").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            F.lit(0).alias("rank"),
            F.lit(0.0).alias("cos_sim"),
        ).limit(0)
    sub = dim // n_subspaces

    normed = embeddings.select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("_nrm")
    )
    scores = _centroid_scores(F.col("embedding"), F.col("_nrm"), cents)
    best = F.array_max(
        F.transform(
            scores,
            lambda s: F.struct(
                s["cos_sim"].alias("cos_sim"),
                (-s["centroid_id"]).alias("neg_id"),
            ),
        )
    )
    code_cols = _pq_code_cols(F.col("embedding"), books, sub)
    corpus = normed.select(
        "vec_id",
        "embedding",
        "_nrm",
        (-best["neg_id"]).alias("centroid_id"),
        F.array(*code_cols).alias("pq_codes"),
    )
    # As in pq_adc_topk: the per-query ADC lookup table materializes on
    # the broadcast side (once per query row), so the bucket scan pays
    # M array lookups per row, never the M*K sub-dot recomputation.
    q_lut = F.array(*[
        _sub_dist_array(F.col("q_emb"), m, sub, book)
        for m, book in enumerate(books)
    ])
    queries = (
        corpus.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("_nrm").alias("_q_nrm"),
            F.col("centroid_id").alias("q_centroid"),
        )
        .select(
            "query_id", "q_emb", "_q_nrm", "q_centroid",
            q_lut.alias("lut"),
        )
    )
    pairs = corpus.join(
        F.broadcast(queries),
        (F.col("vec_id") != F.col("query_id"))
        & (F.col("centroid_id") == F.col("q_centroid")),
    )
    parts = [
        F.element_at(
            F.col("lut").getItem(m), F.col("pq_codes").getItem(m) + 1
        )
        for m in range(len(books))
    ]
    adc = parts[0]
    for p in parts[1:]:
        adc = adc + p
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(adc, 4).alias("adc_dist"),
        "embedding",
        "_nrm",
        "q_emb",
        "_q_nrm",
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    short = scored.withColumn("srn", F.row_number().over(w_adc)).filter(
        F.col("srn") <= shortlist
    )
    rer = short.select(
        "query_id",
        "neighbor_id",
        F.round(
            dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("_q_nrm") * F.col("_nrm")),
            4,
        ).alias("cos_sim"),
    )
    w_cos = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(w_cos))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


#: Persisted handles of the most recent :func:`mmr_rerank` call; the
#: next call unpersists them, bounding cache residency to one rerank.
_MMR_CACHES: list[DataFrame] = []


def mmr_rerank(
    embeddings: DataFrame,
    query_ids: list[int],
    shortlist: int = 10,
    k: int = 3,
) -> DataFrame:
    """Maximal-marginal-relevance diversified re-rank: greedily pick
    ``k`` results from each query's exact-cosine ``shortlist`` so that
    each pick balances relevance against similarity to what is already
    selected — the standard diversification pass for retrieval results
    and for picking *diverse* exemplars when curating training data
    (near-identical top hits waste the selection budget).

    The greedy recurrence is unrolled into k dataframe rounds (the
    graph_pagerank_items pattern — fixed iteration count keeps it
    oracle-expressible): round 1 takes max relevance; round i joins the
    remaining candidates to the i-1 selected rows' pairwise similarity
    and takes argmax of (rel - max_sim_selected). With lambda = 0.5 the
    textbook score 0.5*rel - 0.5*maxsim is a positive scaling of
    (rel - maxsim), so the UNSCALED difference is used: rel and sim are
    both rounded-4 doubles, their difference is an exact multiple of
    1e-4, and round(.,4) of it is engine-stable — halving first could
    land on .00005 rounding boundaries where representation decides.

    Per-query work is shortlist² pairwise sims (a bounded self-join of
    the candidate table with itself on query_id); the corpus is touched
    once, by the shortlist scorer. Ties break to the smaller id.
    Returns (query_id, pos, doc_id, mmr_score)."""
    shortlisted = brute_force_topk(
        embeddings, query_ids, k=shortlist
    ).select(
        "query_id",
        F.col("neighbor_id").alias("cand_id"),
        F.col("cos_sim").alias("rel"),
    )
    emb = embeddings.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb")
    )
    # Bounded cache scope (ADVICE r6): the shortlist caches must
    # outlive this call (the result is returned unevaluated), but they
    # must not ACCUMULATE across calls — each call releases the
    # previous call's handles, so at most one rerank's caches are ever
    # resident no matter how many times it runs in a session.
    while _MMR_CACHES:
        _MMR_CACHES.pop().unpersist(blocking=False)
    ce = shortlisted.join(emb, "cand_id").persist()
    _MMR_CACHES.append(ce)
    # Every downstream reference goes through the persisted `ce` (the
    # round-1 pick and each round's `rem` included), so the corpus-
    # scale shortlist scorer materializes exactly once; reusing the
    # raw `shortlisted` here would re-embed the corpus scan k+1 times
    # in the unrolled DAG.
    cand = ce.select("query_id", "cand_id", "rel")
    a = ce.select(
        "query_id", F.col("cand_id").alias("ca"), F.col("c_emb").alias("ea")
    )
    b = ce.select(
        "query_id", F.col("cand_id").alias("cb"), F.col("c_emb").alias("eb")
    )
    sims = (
        a.join(b, "query_id")
        .filter(F.col("ca") != F.col("cb"))
        .select(
            "query_id",
            "ca",
            "cb",
            F.round(cosine(F.col("ea"), F.col("eb")), 4).alias("sim"),
        )
        .persist()
    )
    _MMR_CACHES.append(sims)
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("cand_id")
    )
    selected = (
        cand.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.lit(1).alias("pos"),
            F.col("cand_id").alias("doc_id"),
            F.col("rel").alias("mmr_score"),
        )
    )
    out = [selected]
    for pos in range(2, k + 1):
        sel_ids = (
            selected.groupBy("query_id")
            .agg(F.collect_set("doc_id").alias("sel"))
        )
        rem = (
            cand.join(F.broadcast(sel_ids), "query_id")
            .filter(~F.array_contains(F.col("sel"), F.col("cand_id")))
            .select("query_id", "cand_id", "rel", "sel")
        )
        pen = (
            rem.alias("r")
            .join(
                sims.alias("s"),
                (F.col("r.query_id") == F.col("s.query_id"))
                & (F.col("r.cand_id") == F.col("s.ca"))
                & F.array_contains(F.col("r.sel"), F.col("s.cb")),
            )
            .select(
                F.col("r.query_id").alias("query_id"),
                F.col("r.cand_id").alias("cand_id"),
                F.col("r.rel").alias("rel"),
                F.col("s.sim").alias("sim"),
            )
            .groupBy("query_id", "cand_id", "rel")
            .agg(F.max("sim").alias("maxsim"))
        )
        wp = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("cand_id")
        )
        pick = (
            pen.select(
                "query_id",
                "cand_id",
                F.round(F.col("rel") - F.col("maxsim"), 4).alias("score"),
            )
            .withColumn("rn", F.row_number().over(wp))
            .filter(F.col("rn") == 1)
            .select(
                "query_id",
                F.lit(pos).alias("pos"),
                F.col("cand_id").alias("doc_id"),
                F.col("score").alias("mmr_score"),
            )
        )
        out.append(pick)
        selected = out[0]
        for p in out[1:]:
            selected = selected.unionByName(p)
    result = out[0]
    for p in out[1:]:
        result = result.unionByName(p)
    return result.select("query_id", "pos", "doc_id", "mmr_score")


def pq_train_residual_codebooks(
    embeddings: DataFrame,
    n_subspaces: int = 4,
    n_codes: int = 8,
    n_centroids: int = 8,
    iters: int = 2,
) -> tuple[list[list[tuple[int, list[float]]]], DataFrame]:
    """TRAINED product-quantization codebooks over coarse-quantizer
    RESIDUALS — the full IVF-PQ training recipe of Jegou, Douze &
    Schmid, "Product Quantization for Nearest Neighbor Search" (TPAMI
    2011), upgrading :func:`pq_codebooks`'s seeded words to Lloyd-
    trained ones:

    1. assign each vector to its nearest seed centroid with EXACT
       integer squared distance on 1e-6 fixed-point vectors (the
       :func:`kmeans_refine` trick — bit-reproducible on any engine);
    2. residual r = x - centroid(x), an exact BIGINT array;
    3. per subspace, ``iters`` Lloyd rounds over the residual slices
       (broadcast of M*K codewords against one corpus pass; update is
       a bounded (M*K*sub) exact-integer partial aggregate);
    4. final encode against the trained books.

    Returns ``(books, encoded)``: books in the
    :func:`pq_codebooks` shape (drop-in for the ADC scans), and the
    encoding (vec_id, centroid_id, code_0..code_{M-1}).

    Scale shape: every corpus pass is a narrow scan + broadcast of
    model parameters; nothing wider than (M*K*sub) integer sums ever
    aggregates; the corpus is never self-joined. Residual training is
    what makes PQ distortion small *within* an IVF bucket — at 100 TB
    this is the difference between a shortlist that needs 20 rerank
    candidates and one that needs 200.
    """
    dim = _emb_dim(embeddings)
    if dim is None:
        empty = embeddings.sparkSession.createDataFrame(
            [],
            "vec_id long, centroid_id long, "
            + ", ".join(f"code_{m} int" for m in range(n_subspaces)),
        )
        return [], empty
    sub = dim // n_subspaces
    q = embeddings.select(
        "vec_id", _quantize(F.col("embedding")).alias("qe")
    ).localCheckpoint()

    cents = q.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("qe").alias("qc")
    )
    int_sqd = F.aggregate(
        F.zip_with(F.col("qe"), F.col("qc"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # argmin as a min_by AGGREGATE, not a row_number window: the hash
    # aggregate partially combines map-side (C candidate rows per
    # vector collapse before any exchange) and needs no sort — the
    # window form shuffled AND sorted all N·C rows per pass
    # (optimization guide §2.3/§2.4). Tie-break identical to the old
    # ORDER BY (sqd, centroid_id): struct comparison is lexicographic.
    asg = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("sqd", int_sqd)
        .groupBy("vec_id")
        .agg(
            F.min_by(
                F.struct("centroid_id", "qe", "qc"),
                F.struct("sqd", "centroid_id"),
            ).alias("_w")
        )
        .select(
            "vec_id",
            F.col("_w.centroid_id").alias("centroid_id"),
            F.zip_with(
                F.col("_w.qe"), F.col("_w.qc"), lambda a, b: a - b
            ).alias("r"),
        )
    )
    slices = asg.select(
        "vec_id",
        "centroid_id",
        F.posexplode(
            F.array(*[
                F.slice(F.col("r"), m * sub + 1, sub)
                for m in range(n_subspaces)
            ])
        ).alias("m", "rs"),
    ).localCheckpoint()

    # Codebook seeds come from the vectors AFTER the IVF seeds: the
    # first n_centroids vec_ids ARE the coarse centroids, so their
    # residuals are exactly zero — seeding from them would hand Lloyd
    # K identical all-zero words and collapse every subspace to one
    # code on the first assignment.
    books_df = slices.filter(
        (F.col("vec_id") >= n_centroids)
        & (F.col("vec_id") < n_centroids + n_codes)
    ).select(
        "m",
        (F.col("vec_id") - n_centroids).cast("int").alias("code"),
        F.transform(
            F.col("rs"), lambda v: v / F.lit(float(KM_SCALE))
        ).alias("cw"),
    )
    dbl_dist = F.aggregate(
        F.zip_with(
            F.transform(F.col("rs"), lambda v: v / F.lit(float(KM_SCALE))),
            F.col("cw"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    def _assign(books):
        # same argmin-as-aggregate shape as the coarse assign above:
        # K codeword candidates per (vector, subspace) collapse
        # map-side; tie-break (dist, code) matches the old window
        return (
            slices.join(F.broadcast(books), "m")
            .withColumn("dist", dbl_dist)
            .groupBy("vec_id", "m")
            .agg(
                F.min_by(
                    F.struct("code", "rs", "centroid_id"),
                    F.struct("dist", "code"),
                ).alias("_w")
            )
            .select(
                "vec_id",
                F.col("_w.centroid_id").alias("centroid_id"),
                "m",
                F.col("_w.rs").alias("rs"),
                F.col("_w.code").alias("code"),
            )
        )

    for _ in range(iters):
        a = _assign(books_df)
        sums = (
            a.select("m", "code", F.posexplode("rs").alias("d", "v"))
            .groupBy("m", "code", "d")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        books_df = (
            sums.withColumn(
                "val", F.col("s") / F.col("n") / F.lit(float(KM_SCALE))
            )
            .groupBy("m", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "val"))),
                    lambda s: s["val"],
                ).alias("cw")
            )
        )

    # Materialize the trained words ONCE and rebuild them as a literal
    # table for the final encode: otherwise every execution of
    # `encoded` (bench reps, the driver's collect) replays the whole
    # iterative training lineage — `iters` window+aggregate rounds —
    # instead of one slices ⋈ 32-row join. The words are model
    # parameters (M*K*sub doubles); collecting them is the same
    # scale-correct move as the IVF centroids.
    books_rows = books_df.collect()
    by_m: dict[int, list[tuple[int, list[float]]]] = {}
    for r in books_rows:
        by_m.setdefault(r["m"], []).append(
            (r["code"], [float(x) for x in r["cw"]])
        )
    books = [
        sorted(by_m.get(m, [])) for m in range(n_subspaces)
    ]
    spark = embeddings.sparkSession
    books_lit = spark.createDataFrame(
        [
            (int(r["m"]), int(r["code"]), [float(x) for x in r["cw"]])
            for r in books_rows
        ],
        "m int, code int, cw array<double>",
    )
    final = _assign(books_lit)
    encoded = final.groupBy("vec_id", "centroid_id").agg(
        *[
            F.max(F.when(F.col("m") == m, F.col("code"))).alias(f"code_{m}")
            for m in range(n_subspaces)
        ]
    )
    return books, encoded
