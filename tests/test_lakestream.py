"""Streaming source over the lake commit log (sources/lakestream.py):
offset = version, partitions = added files, Arrow executor reads,
checkpoint resume, schema evolution, rewrite semantics, and the full
lake -> lake streaming loop against the exactly-once sink."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from olist_data_warehouse_spark.sources import lakestream
from olist_data_warehouse_spark.sources.lakehouse import LakeTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") * 1.5).alias("v"),
    )


@pytest.fixture()
def registered(spark):
    lakestream.register(spark)
    return spark


def _run_available_now(spark, src_path, name, ckpt, **opts):
    """Drain the stream into a driver-side row list via foreachBatch
    (the memory sink cannot recover from a checkpoint, and checkpoint
    resume is exactly what these tests exercise)."""
    rows: list = []
    reader = spark.readStream.format("lakestream").option("path", src_path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.foreachBatch(
            lambda bdf, bid: rows.extend(bdf.collect())
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return rows


def test_stream_reads_all_appends(registered, tmp_path):
    spark = registered
    t = LakeTable.create(_df(spark, 0, 20).repartition(2),
                         str(tmp_path / "src"))
    t.append(_df(spark, 20, 30))
    rows = _run_available_now(spark, t.path, "ls_all", str(tmp_path / "c1"))
    assert len(rows) == 30
    ks = [r["k"] for r in rows]
    assert (min(ks), max(ks)) == (0, 29)


def test_checkpoint_resume_reads_only_new_commits(registered, tmp_path):
    spark = registered
    t = LakeTable.create(_df(spark, 0, 10), str(tmp_path / "src"))
    ckpt = str(tmp_path / "ck")
    rows = _run_available_now(spark, t.path, "ls_r1", ckpt)
    assert len(rows) == 10
    t.append(_df(spark, 10, 14))
    t.append(_df(spark, 14, 18))
    rows = _run_available_now(spark, t.path, "ls_r2", ckpt)
    # a resumed checkpoint receives ONLY the delta
    assert {r["k"] for r in rows} == set(range(10, 18))
    # nothing new -> empty batch, no duplicates
    rows = _run_available_now(spark, t.path, "ls_r3", ckpt)
    assert rows == []


def test_starting_version_skips_history(registered, tmp_path):
    spark = registered
    t = LakeTable.create(_df(spark, 0, 10), str(tmp_path / "src"))
    v1 = t.append(_df(spark, 10, 20))
    t.append(_df(spark, 20, 25))
    rows = _run_available_now(
        spark, t.path, "ls_sv", str(tmp_path / "c"),
        starting_version=str(v1),
    )
    assert {r["k"] for r in rows} == set(range(20, 25))


def test_schema_evolution_mid_stream_backfills_nulls(registered, tmp_path):
    spark = registered
    t = LakeTable.create(_df(spark, 0, 5), str(tmp_path / "src"))
    t.append(
        _df(spark, 5, 8).withColumn("tag", F.lit("new")),
        merge_schema=True,
    )
    rows = _run_available_now(spark, t.path, "ls_ev", str(tmp_path / "c"))
    assert set(rows[0].asDict()) == {"k", "g", "v", "tag"}
    assert sum(1 for r in rows if r["tag"] is None) == 5
    assert sum(1 for r in rows if r["tag"] == "new") == 3


def test_rewriting_commit_fails_stream_by_default(registered, tmp_path):
    spark = registered
    t = LakeTable.create(_df(spark, 0, 10), str(tmp_path / "src"))
    t.delete_where(spark, F.col("k") < 2)
    q = (
        spark.readStream.format("lakestream").option("path", t.path)
        .load()
        .writeStream.format("memory").queryName("ls_fail")
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="rewrites rows"):
        q.awaitTermination(180)


def test_skip_rewrites_streams_appends_around_churn(registered, tmp_path):
    spark = registered
    t = LakeTable.create(_df(spark, 0, 10), str(tmp_path / "src"))
    t.delete_where(spark, F.col("k") < 2)   # skipped (rewrite)
    t.append(_df(spark, 10, 15))            # streamed
    t.compact(spark, target_file_bytes=1 << 30)  # skipped (rewrite)
    t.append(_df(spark, 15, 18))            # streamed
    rows = _run_available_now(
        spark, t.path, "ls_skip", str(tmp_path / "c"),
        skip_rewrites="true",
    )
    # at-least-once-minus-deletes: the create batch plus both appends;
    # the delete's survivor rewrite and the compact copies never stream
    assert {r["k"] for r in rows} == set(range(0, 18))


def test_lake_to_lake_streaming_loop(registered, tmp_path):
    """The full loop: lakestream SOURCE -> transformation -> exactly-
    once lake SINK. Restarting the query moves only the new commits."""
    spark = registered
    src = LakeTable.create(_df(spark, 0, 20), str(tmp_path / "a"))
    dst = LakeTable.create(
        _df(spark, 0, 0).withColumn("v2", F.col("v") * 2),
        str(tmp_path / "b"),
    )
    ckpt = str(tmp_path / "ck")

    def run():
        q = (
            spark.readStream.format("lakestream")
            .option("path", src.path).load()
            .withColumn("v2", F.col("v") * 2)
            .writeStream.foreachBatch(dst.streaming_sink("loop"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    assert dst.read(spark).count() == 20
    src.append(_df(spark, 20, 26))
    run()
    got = dst.read(spark)
    assert got.count() == 26
    assert got.where(F.col("v2") != F.col("v") * 2).count() == 0
    # exactly-once held across the restart: no duplicated keys
    assert got.select("k").distinct().count() == 26


def test_long_log_schema_resolution_uses_checkpoint(registered, tmp_path):
    """Schema lookup stops at the newest checkpoint instead of walking
    the whole log: evolve early, then append past CHECKPOINT_EVERY
    commits whose log entries carry no schema action."""
    from olist_data_warehouse_spark.sources.lakehouse import (
        CHECKPOINT_EVERY,
    )

    spark = registered
    t = LakeTable.create(_df(spark, 0, 5), str(tmp_path / "src"))
    t.append(
        _df(spark, 5, 8).withColumn("tag", F.lit("x")), merge_schema=True
    )
    for i in range(CHECKPOINT_EVERY + 2):
        t.append(_df(spark, 10 + i, 11 + i).withColumn(
            "tag", F.lit("y")
        ), merge_schema=True)
    rows = _run_available_now(spark, t.path, "ls_long", str(tmp_path / "c"))
    assert len(rows) == 5 + 3 + CHECKPOINT_EVERY + 2
    assert set(rows[0].asDict()) == {"k", "g", "v", "tag"}


def test_missing_table_and_path_errors(registered, tmp_path):
    spark = registered
    with pytest.raises(Exception, match="no lake table"):
        spark.readStream.format("lakestream").option(
            "path", str(tmp_path / "nope")
        ).load()
    with pytest.raises(Exception, match="requires .option"):
        spark.readStream.format("lakestream").load()


# -- rate limiting (max_files_per_batch / max_bytes_per_batch) ---------


def _drain_bounded(spark, src_path, ckpt, expect_rows, **opts):
    """Run a processingTime (default-trigger) rate-limited stream until
    ``expect_rows`` rows have arrived, collecting (batch_id, rows) per
    non-empty micro-batch; returns the batch list.

    The wait condition reads the query's PROGRESS events (emitted only
    after a batch fully commits to the checkpoint), not the sink list:
    stopping the instant rows land in foreachBatch races the offset
    commit, and a later restart then legitimately REPLAYS the in-flight
    batch (at-least-once delivery; the lake sink dedups, this list
    sink doesn't) — a prior flake, not a source bug."""
    import time as _time

    batches: list[tuple[int, list]] = []

    def sink(bdf, bid):
        got = bdf.collect()
        if got:
            batches.append((bid, got))

    reader = spark.readStream.format("lakestream").option("path", src_path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        deadline = _time.time() + 180
        while _time.time() < deadline:
            committed = sum(
                (p.get("numInputRows") or 0) for p in q.recentProgress
            )
            if committed >= expect_rows:
                break
            _time.sleep(0.3)
    finally:
        q.stop()
        q.awaitTermination(60)
    return batches


def test_rate_limit_bounds_each_batch_over_backlog(registered, tmp_path):
    """A pre-existing 10-commit backlog drains in >= 3 bounded
    micro-batches through one checkpoint, with exact final parity —
    never as one unbounded batch (the Delta maxFilesPerTrigger shape)."""
    spark = registered
    t = LakeTable.create(_df(spark, 0, 2).coalesce(1), str(tmp_path / "s"))
    for i in range(1, 10):
        t.append(_df(spark, 2 * i, 2 * i + 2).coalesce(1))  # 1 file each
    batches = _drain_bounded(
        spark, t.path, str(tmp_path / "c"), expect_rows=20,
        max_files_per_batch="3",
    )
    rows = [r for _, rs in batches for r in rs]
    assert {r["k"] for r in rows} == set(range(20))  # parity, no dup/loss
    assert len(batches) >= 3                          # bounded catch-up
    # 3 files x 2 rows: no batch ever exceeds the admission budget
    assert max(len(rs) for _, rs in batches) <= 6


def test_rate_limit_max_bytes_bounds_batches(registered, tmp_path):
    spark = registered
    t = LakeTable.create(_df(spark, 0, 2).coalesce(1), str(tmp_path / "s"))
    for i in range(1, 6):
        t.append(_df(spark, 2 * i, 2 * i + 2).coalesce(1))
    one_file_bytes = max(
        m["bytes"] for m in t._state()["files"].values()
    )
    batches = _drain_bounded(
        spark, t.path, str(tmp_path / "c"), expect_rows=12,
        max_bytes_per_batch=str(one_file_bytes),  # ~1 file per batch
    )
    rows = [r for _, rs in batches for r in rs]
    assert {r["k"] for r in rows} == set(range(12))
    assert len(batches) >= 4
    assert max(len(rs) for _, rs in batches) <= 2


def test_rate_limit_cold_restart_probes_then_bounds(registered, tmp_path):
    """A NEW query over an existing checkpoint (fresh source process =
    no in-memory anchor) must not replay the backlog as one batch: the
    probe handshake recovers the consumed point from the offset log,
    then every batch is budget-bounded."""
    spark = registered
    t = LakeTable.create(_df(spark, 0, 2).coalesce(1), str(tmp_path / "s"))
    ckpt = str(tmp_path / "c")
    b1 = _drain_bounded(
        spark, t.path, ckpt, expect_rows=2, max_files_per_batch="2"
    )
    assert {r["k"] for _, rs in b1 for r in rs} == {0, 1}
    # 8-commit backlog lands while the consumer is down
    for i in range(1, 9):
        t.append(_df(spark, 2 * i, 2 * i + 2).coalesce(1))
    b2 = _drain_bounded(
        spark, t.path, ckpt, expect_rows=16, max_files_per_batch="2"
    )
    rows = [r for _, rs in b2 for r in rs]
    assert {r["k"] for r in rows} == set(range(2, 18))  # delta only, exact
    assert len(b2) >= 4                                 # bounded catch-up
    assert max(len(rs) for _, rs in b2) <= 4            # 2 files x 2 rows
    # the cold start left its durable probe resolution behind
    probes = os.listdir(os.path.join(t.path, "_probes"))
    assert probes


def _drain_writer(spark, src_path, ckpt, rows, **opts):
    """A fully-configured DataStreamWriter (no trigger) collecting into
    ``rows`` — what lakestream.drain() takes."""
    reader = spark.readStream.format("lakestream").option("path", src_path)
    for k, v in opts.items():
        reader = reader.option(k, v)
    return (
        reader.load()
        .writeStream.foreachBatch(lambda bdf, bid: rows.extend(bdf.collect()))
        .option("checkpointLocation", ckpt)
    )


def test_drain_runs_rate_limited_backlog_to_completion(registered,
                                                       tmp_path):
    """r9 verdict item #1: the one-command drain. availableNow + limit
    silently processes one budget; lakestream.drain() must reach FULL
    parity on a 10-commit backlog in >= 3 bounded micro-batches,
    without the caller knowing the expected row count."""
    spark = registered
    t = LakeTable.create(_df(spark, 0, 2).coalesce(1), str(tmp_path / "s"))
    for i in range(1, 10):
        t.append(_df(spark, 2 * i, 2 * i + 2).coalesce(1))  # 1 file each
    rows: list = []
    res = lakestream.drain(
        _drain_writer(spark, t.path, str(tmp_path / "c"), rows,
                      max_files_per_batch="3"),
        t.path,
    )
    assert {r["k"] for r in rows} == set(range(20))  # parity, no dup/loss
    assert res["target_version"] == 9
    assert res["rows"] == 20
    assert res["batches"] >= 3, f"not budget-paced: {res}"


def test_drain_cold_restart_handles_probe_round(registered, tmp_path):
    """drain() across a checkpoint restart: the second call starts
    anchorless (probe handshake), must count the probe's consumed
    point correctly, and still drains the delta to parity — including
    the degenerate third call with an EMPTY backlog, which must
    terminate promptly with zero moved batches."""
    spark = registered
    t = LakeTable.create(_df(spark, 0, 2).coalesce(1), str(tmp_path / "s"))
    ckpt = str(tmp_path / "c")
    rows: list = []
    lakestream.drain(
        _drain_writer(spark, t.path, ckpt, rows, max_files_per_batch="2"),
        t.path,
    )
    assert {r["k"] for r in rows} == {0, 1}
    # 8-commit backlog lands while the consumer is down
    for i in range(1, 9):
        t.append(_df(spark, 2 * i, 2 * i + 2).coalesce(1))
    rows2: list = []
    res2 = lakestream.drain(
        _drain_writer(spark, t.path, ckpt, rows2, max_files_per_batch="2"),
        t.path,
    )
    assert {r["k"] for r in rows2} == set(range(2, 18))  # delta only
    assert res2["batches"] >= 4                          # bounded catch-up
    # empty backlog: drain returns promptly (probe round moves nothing)
    rows3: list = []
    res3 = lakestream.drain(
        _drain_writer(spark, t.path, ckpt, rows3, max_files_per_batch="2"),
        t.path,
        timeout=120,
    )
    assert rows3 == [] and res3["batches"] == 0


def test_drain_cdf_mode_folds_to_final_table(registered, tmp_path):
    """drain() composes with mode='cdf': a rate-limited full-log delta
    replay drains to completion, and folding the landed deltas
    (inserts minus deletes) reproduces the final table exactly."""
    spark = registered
    t = LakeTable.create(_df(spark, 0, 10).coalesce(1),
                         str(tmp_path / "s"), cdf=True)
    t.delete_where(spark, F.col("k") < 3)
    for i in range(1, 4):
        t.append(_df(spark, 10 * i, 10 * i + 10).coalesce(1))
    rows: list = []
    lakestream.drain(
        _drain_writer(spark, t.path, str(tmp_path / "c"), rows,
                      max_files_per_batch="2", mode="cdf"),
        t.path,
    )
    from collections import Counter

    net = Counter()
    for r in rows:
        net[r["k"]] += 1 if r["_change_type"] == "insert" else -1
    folded = {k for k, n in net.items() if n > 0}
    assert all(n in (0, 1) for n in net.values())
    final = {r["k"] for r in t.read(spark).select("k").collect()}
    assert folded == final


def test_drain_surfaces_query_failure(registered, tmp_path):
    """A failing drained query must raise out of drain(), never hang
    until timeout: the strict append feed refuses a rewriting commit
    at planning time."""
    spark = registered
    t = LakeTable.create(_df(spark, 0, 10).coalesce(1),
                         str(tmp_path / "s"))
    t.delete_where(spark, F.col("k") < 3)  # rewriting commit, no cdf
    rows: list = []
    with pytest.raises(Exception, match="rewrites rows"):
        lakestream.drain(
            _drain_writer(spark, t.path, str(tmp_path / "c"), rows,
                          max_files_per_batch="2"),
            t.path,
            timeout=120,
        )


def test_drain_probe_dir_keeps_table_readonly(registered, tmp_path):
    """r9 ADVICE: probe records default under the table, but
    .option('probe_dir', scratch) must keep a cold-restart drain off
    the table directory entirely — read-only mounts stay readable."""
    spark = registered
    t = LakeTable.create(_df(spark, 0, 2).coalesce(1), str(tmp_path / "s"))
    ckpt = str(tmp_path / "c")
    scratch = str(tmp_path / "probe_scratch")
    rows: list = []
    lakestream.drain(
        _drain_writer(spark, t.path, ckpt, rows,
                      max_files_per_batch="2", probe_dir=scratch),
        t.path,
        probe_dir=scratch,
    )
    for i in range(1, 4):
        t.append(_df(spark, 2 * i, 2 * i + 2).coalesce(1))
    rows2: list = []
    lakestream.drain(
        _drain_writer(spark, t.path, ckpt, rows2,
                      max_files_per_batch="2", probe_dir=scratch),
        t.path,
        probe_dir=scratch,
    )
    assert {r["k"] for r in rows2} == set(range(2, 8))
    # the cold restart probed into SCRATCH, never into the table dir
    assert not os.path.exists(os.path.join(t.path, "_probes"))
    assert os.listdir(scratch)


def test_probe_records_swept_by_retention(registered, tmp_path):
    """r9 ADVICE: _probes/ must not accumulate forever — records older
    than PROBE_RETENTION_SECONDS are swept both by _record_probe
    (opportunistic) and by the table's vacuum."""
    import time as _time

    spark = registered
    t = LakeTable.create(_df(spark, 0, 2).coalesce(1), str(tmp_path / "s"))
    probes = os.path.join(t.path, "_probes")
    os.makedirs(probes)
    stale = os.path.join(probes, "old-nonce.json")
    with open(stale, "w") as f:
        f.write('{"version": 0}')
    old = _time.time() - lakestream.PROBE_RETENTION_SECONDS - 10
    os.utime(stale, (old, old))
    # opportunistic sweep on a new record
    rd = lakestream.LakeStreamReader({"path": t.path})
    rd._record_probe("fresh-nonce", 0)
    assert not os.path.exists(stale)
    assert os.path.exists(os.path.join(probes, "fresh-nonce.json"))
    # vacuum sweeps too (fresh record survives: inside retention)
    with open(stale, "w") as f:
        f.write('{"version": 0}')
    os.utime(stale, (old, old))
    removed = t.vacuum(keep_versions=1, retention_seconds=0, force=True)
    assert os.path.join("_probes", "old-nonce.json") in removed
    assert os.path.exists(os.path.join(probes, "fresh-nonce.json"))


def test_mid_stream_evolution_keeps_query_schema(registered, tmp_path):
    """ADVICE r8: a merge_schema append landing WHILE a query runs must
    not change (or fail) the running query's shape — files are projected
    to the analysis-time schema; the new column appears only after a
    RESTART re-resolves the table schema (the Delta contract)."""
    import time as _time

    spark = registered
    t = LakeTable.create(_df(spark, 0, 5), str(tmp_path / "s"))
    ckpt = str(tmp_path / "c")
    batches: list[list] = []

    def sink(bdf, bid):
        got = bdf.collect()
        if got:
            batches.append(got)

    q = (
        spark.readStream.format("lakestream").option("path", t.path)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        # generous, SEPARATE deadlines: under a fully-loaded test box
        # the continuous-trigger micro-batches can starve for minutes,
        # and a shared budget let the second wait inherit an
        # already-spent clock (the one flaky test in the suite)
        deadline = _time.time() + 240
        while _time.time() < deadline and sum(map(len, batches)) < 5:
            _time.sleep(0.3)
        # evolution lands MID-STREAM, while the query is running
        t.append(
            _df(spark, 5, 8).withColumn("tag", F.lit("new")),
            merge_schema=True,
        )
        deadline = _time.time() + 240
        while _time.time() < deadline and sum(map(len, batches)) < 8:
            _time.sleep(0.3)
    finally:
        q.stop()
        q.awaitTermination(60)
    assert sum(map(len, batches)) == 8
    # every batch kept the analysis-time shape: no tag column, no error
    for got in batches:
        assert set(got[0].asDict()) == {"k", "g", "v"}
    # a restarted query re-resolves: the evolved column appears
    t.append(_df(spark, 8, 10).withColumn("tag", F.lit("new2")),
             merge_schema=True)
    rows = _run_available_now(spark, t.path, "ls_ev2", ckpt)
    assert {r["k"] for r in rows} == {8, 9}
    assert set(rows[0].asDict()) == {"k", "g", "v", "tag"}


# -- cdf mode: row-level delta stream ----------------------------------


def test_cdf_mode_streams_row_deltas_through_churn(registered, tmp_path):
    """mode=cdf replays delete/merge commits as signed row deltas (the
    append feed would refuse them): folding the streamed deltas equals
    the table's final state exactly."""
    spark = registered
    t = LakeTable.create(_df(spark, 0, 20), str(tmp_path / "s"), cdf=True)
    t.append(_df(spark, 20, 30))
    t.delete_where(spark, F.col("k") < 5)
    src = _df(spark, 25, 35).withColumn("v", F.lit(-1.0))
    t.merge_into(spark, src, keys=["k"])
    t.compact(spark, target_file_bytes=1 << 30)  # invisible to the feed
    rows = _run_available_now(
        spark, t.path, "cdf1", str(tmp_path / "c"), mode="cdf"
    )
    assert set(rows[0].asDict()) == {
        "k", "g", "v", "_change_type", "_commit_version"
    }
    from collections import Counter

    folded = Counter()
    for r in rows:
        sign = 1 if r["_change_type"] == "insert" else -1
        folded[(r["k"], r["v"])] += sign
    survivors = {kv for kv, n in folded.items() if n > 0}
    assert all(n in (0, 1) for n in folded.values())
    truth = {(r["k"], r["v"]) for r in t.read(spark).collect()}
    assert survivors == truth
    # checkpoint resume: further churn streams only the delta
    t.delete_where(spark, F.col("k") >= 30)
    more = _run_available_now(
        spark, t.path, "cdf2", str(tmp_path / "c"), mode="cdf"
    )
    assert {r["_change_type"] for r in more} == {"delete"}
    assert {r["k"] for r in more} == set(range(30, 35))


def test_cdf_mode_requires_cdf_table(registered, tmp_path):
    spark = registered
    t = LakeTable.create(_df(spark, 0, 10), str(tmp_path / "s"))  # no cdf
    t.delete_where(spark, F.col("k") < 2)
    q = (
        spark.readStream.format("lakestream")
        .option("path", t.path).option("mode", "cdf")
        .load()
        .writeStream.format("memory").queryName("cdf_fail")
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="cdf=True"):
        q.awaitTermination(180)


def test_cdf_mode_partitioned_drop_streams_deletes(registered, tmp_path):
    """drop_partitions' remove-side slices carry bare paths; the reader
    recovers partition values from the Hive directory segments."""
    spark = registered
    t = LakeTable.create(
        _df(spark, 0, 20),
        str(tmp_path / "s"),
        cdf=True,
        partition_by=["g"],
    )
    t.drop_partitions({"g": "2"})
    rows = _run_available_now(
        spark, t.path, "cdfp", str(tmp_path / "c"), mode="cdf"
    )
    dels = [r for r in rows if r["_change_type"] == "delete"]
    assert dels and all(r["g"] == "2" for r in dels)
    assert {r["k"] for r in dels} == {2, 6, 10, 14, 18}
    ins = [r for r in rows if r["_change_type"] == "insert"]
    assert len(ins) == 20  # the create, partition values filled


def test_cdf_mode_respects_rate_limit(registered, tmp_path):
    spark = registered
    t = LakeTable.create(
        _df(spark, 0, 2).coalesce(1), str(tmp_path / "s"), cdf=True
    )
    for i in range(1, 6):
        t.append(_df(spark, 2 * i, 2 * i + 2).coalesce(1))
    t.delete_where(spark, F.col("k") == 0)
    batches = _drain_bounded(
        spark, t.path, str(tmp_path / "c"), expect_rows=13,
        mode="cdf", max_files_per_batch="2",
    )
    rows = [r for _, rs in batches for r in rs]
    assert len(rows) == 13  # 12 inserts + 1 delete pre-image
    assert len(batches) >= 3
    assert max(len(rs) for _, rs in batches) <= 4


def test_starting_timestamp_serves_at_or_after(registered, tmp_path):
    spark = registered
    t = LakeTable.create(_df(spark, 0, 10), str(tmp_path / "src"))
    v1 = t.append(_df(spark, 10, 20))
    t.append(_df(spark, 20, 25))
    # strictly between v1 and v2: only v2's rows
    mid = (t._commit_ts(v1) + t._commit_ts(v1 + 1)) / 2
    rows = _run_available_now(
        spark, t.path, "ls_st_mid", str(tmp_path / "c1"),
        starting_timestamp=repr(mid),
    )
    assert {r["k"] for r in rows} == set(range(20, 25))
    # exactly AT v1's stamp: v1 is SERVED (at-or-after contract)
    rows = _run_available_now(
        spark, t.path, "ls_st_at", str(tmp_path / "c2"),
        starting_timestamp=repr(t._commit_ts(v1)),
    )
    assert {r["k"] for r in rows} == set(range(10, 25))
    # predating the table: everything
    rows = _run_available_now(
        spark, t.path, "ls_st_pre", str(tmp_path / "c3"),
        starting_timestamp=repr(t._commit_ts(0) - 100.0),
    )
    assert {r["k"] for r in rows} == set(range(25))
    # after the newest commit: nothing yet (future commits only)
    rows = _run_available_now(
        spark, t.path, "ls_st_post", str(tmp_path / "c4"),
        starting_timestamp=repr(t._commit_ts(t.version()) + 100.0),
    )
    assert rows == []


def test_starting_timestamp_exclusive_with_version(registered, tmp_path):
    spark = registered
    t = LakeTable.create(_df(spark, 0, 5), str(tmp_path / "src"))
    # the reader constructor validates, so the error surfaces at
    # schema resolution (load), before any query starts
    with pytest.raises(Exception, match="mutually exclusive"):
        (
            spark.readStream.format("lakestream")
            .option("path", t.path)
            .option("starting_version", "0")
            .option("starting_timestamp", "123.0")
            .load()
        )
