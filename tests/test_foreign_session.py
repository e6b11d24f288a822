"""Full-registry oracle replica under a FOREIGN session.

The driver does not use our session factory: it builds its own
SparkSession with its own (unknown) confs and the machine's timezone.
Every registered query must therefore self-heal — load_testdata pins
UTC and the nanos conf at read time, the streaming reader pins its own
timezone — rather than rely on anything tests/conftest.py happens to
set.

This test replicates that posture exactly, in a subprocess so the
session-scoped pytest SparkSession can't bleed confs into it: a bare
``SparkSession.builder`` (no engine confs beyond master/memory) under
``TZ=America/New_York`` (harsher than the driver's likely UTC host),
running EVERY registry entry against its DuckDB oracle at sf0.01 — the
driver's actual gate scale.

Marked slow (~5-10 min): run with ``pytest -m slow``.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import sys
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("foreign_session_replica")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from olist_data_warehouse_spark.plans.queries import REGISTRY
from tests.oracle_check import compare_query

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
names = sys.argv[2].split(",") if len(sys.argv) > 2 else list(REGISTRY)
bad = []
for name in names:
    try:
        ok, detail = compare_query(spark, sf, name)
    except Exception as exc:  # noqa: BLE001 - report, don't mask siblings
        ok, detail = False, f"raised {type(exc).__name__}: {exc}"
    if not ok:
        bad.append((name, detail))
        print(f"FAIL {name}: {detail}", flush=True)
print(f"done: {len(names) - len(bad)}/{len(names)} ok", flush=True)
sys.exit(1 if bad else 0)
"""

# The conf-sensitive sentinels: one entry per way a foreign session's
# confs can corrupt results — raw-timestamp scans and arithmetic
# (session timezone), the streaming reader's own pin, date-key
# round-trips, money (cents-contract), windows over event time, the
# multimodal Arrow path, and a literal-heavy LSH plan. If a session
# conf regresses, at least one of these goes red.
SMOKE_ENTRIES = [
    "p6_range_timestamp",
    "f1_f2_date_key_roundtrip",
    "f3_datediff_hours",
    "stream_tumbling_counts",
    "stream_purchase_click_join",
    "w6_rolling_1h",
    "q2_top_revenue_dw",
    "w2_running_total",
    "multi_decode_meta",
    "dedup_embedding_lsh",
    # round-5 timestamp-heavy additions: epoch-micros sessionization,
    # hourly spine arithmetic, and hour-truncated attribution output —
    # each formats or buckets event time and would skew first under a
    # non-UTC session conf regression.
    "path_top_trigrams",
    "ts_interpolate_hourly",
    "attrib_multi_model",
    # sweep-line peak concurrency emits a raw first_peak_ts TIMESTAMP
    # and does interval arithmetic on event time — the newest entry in
    # the timestamp-output class.
    "ts_max_concurrency",
    # nearest-direction as-of emits matched_ts TIMESTAMPs chosen by
    # epoch-gap comparison — both carries must agree under any session
    # timezone.
    "tj_asof_nearest",
    # r8: the lake streaming loop is the newest conf-sensitive stack —
    # a real Structured Streaming query through the Python DataSource
    # (Arrow timestamp transfer on executors) into the exactly-once
    # sink, with event-time cents derivation at the end.
    "lake_stream_pipeline",
    # r9: the CDF stream moves event TIMESTAMPs through Arrow executor
    # reads (including delete pre-images) and folds signed aggregates;
    # the partition drop round-trips partition values through the Hive
    # directory encoding under a foreign locale/timezone.
    "lake_stream_cdf",
    "lake_partition_drop",
]


def _run_replica(sf: str, names: list[str] | None, timeout: int):
    env = dict(os.environ)
    env["TZ"] = "America/New_York"
    # Scrub knobs our own tooling might have exported so the subprocess
    # session is genuinely foreign.
    for k in list(env):
        if k.startswith("SPARK_GRAFT_"):
            env.pop(k)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    argv = [sys.executable, "-c", _SCRIPT, sf]
    if names is not None:
        argv.append(",".join(names))
    return subprocess.run(
        argv, cwd=repo, env=env, capture_output=True, text=True,
        timeout=timeout,
    )


def test_foreign_session_smoke():
    """Fast (~1 min) foreign-session gate in the DEFAULT suite: the
    ten most conf-sensitive entries at sf0.001 under a bare non-UTC
    subprocess session — catches session-conf drift before the driver
    does, without the full replica's 5-10 min cost."""
    proc = _run_replica("/root/testdata/sf0.001", SMOKE_ENTRIES, 600)
    tail = "\n".join(proc.stdout.splitlines()[-15:])
    assert proc.returncode == 0, (
        f"foreign-session smoke failed:\n{tail}\n{proc.stderr[-2000:]}"
    )


@pytest.mark.slow
def test_full_registry_under_foreign_non_utc_session():
    proc = _run_replica("/root/testdata/sf0.01", None, 1800)
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, (
        f"foreign-session replica failed:\n{tail}\n{proc.stderr[-2000:]}"
    )
