"""Isolated per-query timing: min-of-N through the noop sink.

Usage:
    python tools/qtime.py name [name ...]

Env: SPARK_GRAFT_SF_DIR (default sf0.1), QTIME_RUNS (default 5).
Same methodology as bench.py (warm-up sweep, noop sink, perf_counter)
but for a handful of queries in a fresh process — the isolated
measurement BENCH_DRIFT.md's adjudication rule asks for.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from olist_data_warehouse_spark.plans.queries import REGISTRY  # noqa: E402
from olist_data_warehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("QTIME_RUNS", "5"))
    spark = get_spark("qtime")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        print(f"QTIME {name} min={min(ts)} raw={ts}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
