#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints the compact driver contract as the LAST line of stdout, alone:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-run raw timings and medians (the noise-adjudication detail that in
round 4 overgrew the driver's tail capture when inlined into the contract
line) go to BENCH_DETAIL.json next to this script instead.

The reference's benchmark is its three paired OLTP-vs-DW top-5 queries
measured with SET STATISTICS IO/TIME (`Olist DW.sql:211-279`); ours is
the same query set (both forms) plus the incremental-delta plan, wall-
clock per query with a no-op sink write as the action (all columns
computed, nothing persisted, no driver transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from olist_data_warehouse_spark.plans.queries import REGISTRY  # noqa: E402
from olist_data_warehouse_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    # the reference's own benchmark set (paired OLTP vs DW forms) + E3
    "q1_top_units_oltp",
    "q1_top_units_dw",
    "q2_top_revenue_oltp",
    "q2_top_revenue_dw",
    "q3_conversion_oltp",
    "q3_conversion_dw",
    "j7_incremental_delta",
    "j7_merge_upsert",
    # TPC-H Q3-shape shipping-priority probe (segment-pruned broadcast
    # + two pushed date filters), added round 5
    "q4_shipping_priority",
    # extended LLM-pipeline headliners
    "dedup_minhash_lsh",
    "dedup_cc_groups",
    "pack_concat_chunks",
    "dedup_embedding_lsh",
    "sim_ivf_topk_mp",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_hamming",
    "pipe_corpus_curation",
    "decon_ngram_overlap",
    "text_pii_redact",
    "samp_domain_mixture",
    "sim_bruteforce_topk",
    "stream_sessionize",
    "stream_purchase_click_join",
    "text_rolling_fingerprint",
    "text_word_count",
    "a13_median_percentile",
    "multi_decode_meta",
    # round-5 additions: span dedup, bigram heavy hitters, IVM merge,
    # reconciliation audit (all lightweight; keeps the driver's per-
    # round perf record covering the new families)
    "dedup_span_chunks",
    "text_bigram_topk",
    "ivm_agg_merge",
    "j9_reconcile_orders_lines",
    "dedup_cdc_chunks",
    "funnel_steps",
    # retrieval + analytics + DQ additions (inverted index, BM25,
    # blocked fuzzy linkage, OHLC bars, exact z-score outliers)
    "text_inverted_index",
    "text_bm25_topk",
    "link_fuzzy_parts",
    "ts_ohlc_bars",
    "dq_zscore_outliers",
    # temporal joins, sketches, sampling (operator families beyond the
    # reference; each is the family's heaviest representative)
    "tj_asof_purchase_click",
    "tj_range_error_clicks",
    "sk_hll_distinct_users",
    "sk_hist_quantiles",
    "samp_hash_split",
    "scd2_supplier_merge",
    # leakage-safe split: MinHash-LSH edges -> connected components ->
    # cluster-keyed hash split, the heaviest sampling-family composition
    "samp_cluster_split",
    # iterative family: integer-exact damped power iteration over the
    # item co-occurrence graph
    "graph_pagerank_items",
    # PQ/ADC: code-book retrieval, the memory-bound ANN representative
    "sim_pq_adc_topk",
    # late round-5 families: bounded-degree triangle counting, the
    # sweep-line peak-concurrency aggregation, and PMI collocations
    # (two vocabulary-bounded aggregates + word joins)
    "graph_triangles",
    "ts_max_concurrency",
    "text_collocation_pmi",
    # flagship composition (curation -> split -> packed windows) and
    # the diversified-retrieval representative
    "pipe_pretrain_layout",
    "sim_mmr_rerank",
    # discovery-vs-truth evaluation: the heaviest two dedup plans
    # composed through a full-outer classify
    "dedup_pipeline_eval",
    # round-6: the banded-rank swaps — LPT shard dealing and the
    # exact-rational Gini, both now ranking via the two-pass
    # range-banded ROW_NUMBER (no single-partition window)
    "pack_balanced_shards",
    "a29_gini_concentration",
    # round-6: the certified approx-percentile swap, benched NEXT TO
    # the exact a13 so the sketch-vs-exact tradeoff is a recorded
    # number, not a docstring claim
    "a13_approx_percentile_cert",
    # round-7: the near-superset containment pass, benched next to
    # dedup_ngram_jaccard — same _shingle_pair_stats core plus the
    # crop-seeded corpus, so the shared-verifier cost is a recorded
    # number
    "dedup_containment",
    # round-8: the lakehouse family's two heaviest end-to-end shapes —
    # file-granular DELETE (create + stats-pruned delete + readback)
    # and the append-only change feed driving an incremental aggregate
    # merge. Both time the full durable round-trip, not just a scan.
    "lake_delete_where",
    "lake_change_feed",
    # round-8: DSIR importance resampling — the sampling family's
    # token-level representative (bucket-model fit + corpus scoring)
    "samp_dsir_importance",
    # round-9: metadata-only partition retirement (times the full
    # create-partitioned + drop + readback round-trip — the manifest
    # edit itself is O(matched files)) and the trained-residual-PQ
    # pipeline (coarse assign + 2 Lloyd rounds + encode), the
    # retrieval stack's training-cost representative
    "lake_partition_drop",
    "sim_pq_trained_encode",
    # round-10: the storage layer's two new surfaces — partitioned
    # shallow clone (zero-copy fork + metadata drop + mixed-root
    # readback) and the batch CDF read (full-log row-delta replay
    # folded back to the final table). Both time the full durable
    # round-trip.
    "lake_clone_partitioned",
    "lake_batch_cdf",
    # round-10: SemDeDup — cluster-then-intra-cluster-cosine semantic
    # dedup (the embedding family's discovery-cost representative)
    "dedup_semdedup",
    # round-10 (second half): the DML mode matrix and schema DDL — dv
    # delete (zero-rewrite, both commits), UPDATE composing rewrite +
    # dv modes, the constraint lifecycle (refused add + refused append
    # + clean append), zero-rewrite DV MERGE, metadata-only column
    # mapping (rename + drop + dv delete pruned via the renamed name),
    # and benchmark decontamination (broadcast shingle-hash semi join).
    # Each times the full durable round-trip including its in-entry
    # audits.
    "lake_delete_dv",
    "lake_update_where",
    "lake_constraint_gate",
    "lake_merge_dv",
    "lake_column_mapping",
    "dedup_decontaminate",
    # round-10: generated columns — compute-at-create + omitted-append
    # compute + refused wrong-value batch, the write-contract
    # representative
    "lake_generated_cols",
    # round-11: the full MERGE clause grammar in one statement
    # (conditional matched delete + gated insert + by-source update),
    # the native writer on partitioned and governed tables, and the
    # native streaming sink (full drain round-trip timed)
    "lake_merge_clauses",
    "lake_write_partitioned",
    "lake_write_governed",
    "lake_stream_sink",
    # round-12: the SQL-text surface's cost representatives — the full
    # MERGE clause grammar as ONE statement through the dispatcher
    # (parse + clause compile + the same one-join-pass engine; its
    # delta vs lake_merge_clauses IS the dispatcher overhead), and the
    # DDL lifecycle (CREATE/INSERT SELECT/ADD COLUMNS/UPDATE backfill/
    # RENAME/CONSTRAINT/TBLPROPERTIES + binding refreshes, timed as
    # the full durable round-trip)
    "lake_sql_merge",
    "lake_sql_ddl",
    # round-13: streaming-native multimodal decode through the
    # exactly-once lake sink (readStream -> mapInPandas -> sink), and
    # the graph-ANN search representative (partitioned NSW)
    "lake_stream_decode",
    "sim_nsw_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    spark = get_spark("olist_dw_bench")

    # Warm the JVM/session on the smallest data so per-query numbers
    # measure the plan, not session startup.
    REGISTRY["t3_limit"].fn(spark, sf_dir).collect()
    # Build + materialize the warehouse untimed, exactly as the
    # reference runs its DW build script (`Olist DW.sql:39-186`) before
    # the STATISTICS TIME-measured benchmark SELECTs (`:211-279`). The
    # DW-form queries then measure query-on-warehouse, not the build.
    from olist_data_warehouse_spark.plans.queries import warehouse_tables

    warehouse_tables(spark, sf_dir, groups=("sales", "events"))["sales_fact"].count()

    # Best-of-N per query: the VM is shared, and single-shot timings
    # showed multi-second noise unrelated to the plan. The minimum is
    # the standard low-noise estimator of actual plan cost (the
    # reference's STATISTICS TIME benchmark is likewise run repeatedly
    # and read by eye).
    #
    # Repetitions run ROUND-ROBIN across queries, not back-to-back: a
    # contention burst on this shared VM lasts on the order of a minute,
    # so back-to-back repetitions put all N runs of whichever query it
    # lands on inside the burst and best-of-N cannot reject it (round 3
    # manufactured phantom 23x "regressions" exactly this way). Spreading
    # a query's runs ~a full sweep apart means a burst poisons at most
    # one run of each affected query, and the min recovers. Raw per-run
    # times are published so a regression can be told from noise without
    # a re-run: real regressions move every run, noise spikes a few.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    bench_names = [n for n in BENCH_QUERIES if n in REGISTRY]
    # Subset knob for the contract-line regression test (and quick
    # local iteration): first N bench queries only.
    limit = os.environ.get("SPARK_GRAFT_BENCH_LIMIT")
    if limit:
        bench_names = bench_names[: int(limit)]

    # One untimed warm-up sweep over the full query set: round 4's first
    # timed sweep was uniformly cold (shuffle-file and code caches empty,
    # e.g. dedup_embedding_lsh ran [10.5, 11.0, 4.3]), which left the
    # published medians 2-3x above steady state on the heavy queries. The
    # warm-up pays that cost once, outside the measurement.
    for name in bench_names:
        df = REGISTRY[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

    raw: dict[str, list[float]] = {n: [] for n in bench_names}
    for _ in range(runs):
        # Settle the JVM between sweeps: ~80 queries of plan/temp
        # debris otherwise lands GC pauses inside later queries'
        # timed windows (r12's multi_decode_meta raw hit 11.3s in a
        # sweep, then measured at its r11 record in isolation —
        # BENCH_DRIFT.md r13).
        spark.sparkContext._jvm.System.gc()
        for name in bench_names:
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf_dir)
            # One execution through the no-op sink: every output column
            # is computed and serialized but nothing is written. count()
            # would let Catalyst prune the projections being measured
            # (a per-row fingerprint column, say, costs 0 under count).
            df.write.format("noop").mode("overwrite").save()
            raw[name].append(round(time.perf_counter() - t0, 3))

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    timings = {n: min(ts) for n, ts in raw.items()}
    medians = {n: round(_median(ts), 3) for n, ts in raw.items()}

    total = round(sum(timings.values()), 3)

    # Self-adjudication vs prior rounds (r8 verdict #5): rounds 6-8
    # each re-derived "is 1.07x a regression or load noise?" by hand
    # from raw arrays. Publish the comparison IN the artifact: for each
    # committed BENCH_r*.json, the ratio of this run's common-query sum
    # to that round's. "Best prior round" is the ADVERSE pick — the
    # round this run looks slowest against (max ratio), i.e. the
    # fastest prior record on the shared queries — so a ratio near 1.0
    # means no regression against ANY prior record, not just a
    # flattering one. The same-commit spread that separates regression
    # from machine-load noise lives in BENCH_DETAIL.json's raw arrays.
    here = os.path.dirname(os.path.abspath(__file__))
    vs_best = None
    for fname in sorted(os.listdir(here)):
        if not (fname.startswith("BENCH_r") and fname.endswith(".json")):
            continue
        try:
            with open(os.path.join(here, fname)) as f:
                prior = json.load(f)
            parsed = prior.get("parsed")
            if not parsed:
                # driver records sometimes carry parsed=null with only
                # the LAST 2000 chars of stdout in 'tail' (r9 verdict
                # nit: those rounds were silently skipped here). The
                # line's head is gone, but name->seconds pairs survive
                # in the window: recover every '"name": 1.234' pair and
                # drop the record/meta keys (integers — n/rc/cpus/
                # common_queries — don't match; 'value'/'sf'/'ratio'
                # are dropped by name). A pair cut by the window edge
                # doesn't match the regex and is skipped. (r10 verdict
                # nit #2: the old balanced-brace recovery needed the
                # '"queries_min"' LABEL inside the window; r10's was
                # not, so the round was silently skipped.)
                import re

                t = str(prior.get("tail", ""))
                pairs = re.findall(
                    r'"([A-Za-z0-9_]+)": ?(-?[0-9]+\.[0-9]+)', t
                )
                parsed = {
                    "queries": {
                        k: float(v)
                        for k, v in pairs
                        if k not in ("value", "sf", "ratio")
                    }
                }
            pq = parsed.get("queries") or {}
        except Exception:
            continue
        common = [n for n in timings if n in pq]
        psum = sum(pq[n] for n in common)
        # a common set covering under half the current bench measures
        # a stale subset (the oldest, cheapest queries), not the
        # workload. Records that SELF-REPORT a headline prefix
        # (queries_total >= their map, emitted from r11 on) may
        # legitimately be smaller than the full current set — for
        # those the basis is the smaller side; anything else (old
        # full-map records, tail recoveries) keeps the strict
        # current-set basis, so a 22-query r01 record can never
        # become the adverse pick against an 80-query workload.
        declares_prefix = (
            int(parsed.get("queries_total") or 0) >= len(pq) > 0
        )
        basis = (
            min(len(timings), len(pq))
            if declares_prefix
            else len(timings)
        )
        if (
            len(common) < max(5, basis // 2)
            or psum <= 0
            or prior.get("sf", sf) != sf
        ):
            continue
        ratio = round(sum(timings[n] for n in common) / psum, 3)
        if vs_best is None or ratio > vs_best["ratio"]:
            vs_best = {"round": fname[len("BENCH_"):-len(".json")],
                       "ratio": ratio, "common_queries": len(common)}

    # Noise-adjudication detail goes to a side file, NOT the contract
    # line: in round 4 the inlined raw arrays grew the single JSON line
    # past the driver's tail-capture window and the headline number was
    # lost (BENCH_r04.json parsed:null). The driver reads stdout's tail;
    # humans read the detail file.
    # Only a FULL run (no query-subset knob, full sf0.1 default) may
    # overwrite the detail file: in round 6 a 1-run 3-query sf0.001
    # smoke clobbered the real per-run arrays and the on-disk spread
    # evidence regressed (VERDICT r6). Partial runs keep their detail
    # on stdout only.
    full_run = (
        not limit
        and os.path.basename(os.path.normpath(sf_dir)) == "sf0.1"
        and runs >= 3
    )
    if full_run:
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH_DETAIL.json",
        )
        with open(detail_path, "w") as f:
            json.dump(
                {
                    "queries_min": timings,
                    "queries_median": medians,
                    "queries_raw": raw,
                    "runs": runs,
                    "sf": sf,
                },
                f,
                indent=1,
            )

    spark.stop()
    # Contract line last, alone, after spark.stop() so no late JVM logs
    # can interleave after it.
    #
    # The line must fit ENTIRELY inside the driver's 2000-char stdout
    # tail window or the record lands parsed=null (r9/r10: the full
    # per-query map PLUS a duplicated queries_min alias grew the line
    # to ~4.4k and its head fell out of the window). The map is now a
    # HEADLINE PREFIX of the bench order (the reference's own q1-q4
    # benchmark pairs lead that order) that keeps the line under a
    # 1900-char budget; the full best-of-N map, medians, and raw runs
    # live in BENCH_DETAIL.json, and 'value' stays the total over ALL
    # benched queries.
    contract = {
        "metric": "olist_dw_spark_bench_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "vs_best_round": vs_best,
        "queries_total": len(timings),
        "queries_all_in": "BENCH_DETAIL.json",
        "queries": {},
    }
    for name in bench_names:
        trial = {**contract, "queries": {**contract["queries"],
                                         name: timings[name]}}
        if len(json.dumps(trial, separators=(",", ":"))) > 1900:
            break
        contract = trial
    print(json.dumps(contract, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
