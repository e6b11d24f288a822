"""Deletion-vector read paths, measured (r11 verdict optional #7):
the Spark-side ANTI-JOIN (`LakeTable.read` / `_scan_live`) vs the
executor-side ARROW MASK (`spark.read.format('lake')` — each task
reads its file's dv indexes and drops rows as a numpy boolean mask
before projection, `lakestream.read_file_slice`).

Both are live read paths today: the table API anti-joins (one join
against the sidecar parquet, AQE broadcasts a small dv side), the
batch/stream DataSources mask natively. This tool builds a dv-laden
table at $SPARK_GRAFT_SF_DIR (default sf0.1 orders), sweeps deletion
densities, and times both paths min-of-N through the noop sink —
the measured basis for the crossover claim in SCALING.md.

    python tools/dv_read_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from olist_data_warehouse_spark.session import get_spark  # noqa: E402
from olist_data_warehouse_spark.sources import lakebatch  # noqa: E402
from olist_data_warehouse_spark.sources.lakehouse import (  # noqa: E402
    LakeTable,
)

DENSITIES = (0.001, 0.01, 0.1, 0.3)
RUNS = 3


def _time(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("dv_read_bench")
    lakebatch.register(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    root = tempfile.mkdtemp(prefix="dv-read-bench-")
    out = []
    try:
        for dens in DENSITIES:
            path = os.path.join(root, f"d{dens}")
            t = LakeTable.create(orders.repartition(8), path)
            mod = max(2, round(1 / dens))
            r = t.delete_where(
                spark, F.col("o_orderkey") % mod == 0, mode="dv"
            )
            anti = min(
                _time(t.read(spark)) for _ in range(RUNS)
            )
            mask = min(
                _time(
                    spark.read.format("lake").option("path", path).load()
                )
                for _ in range(RUNS)
            )
            out.append(
                {
                    "density": dens,
                    "rows": n,
                    "deleted": r["rows_deleted"],
                    "anti_join_s": round(anti, 3),
                    "arrow_mask_s": round(mask, 3),
                    "mask_speedup": round(anti / mask, 2),
                }
            )
            print(json.dumps(out[-1]))
        print(json.dumps({"sf_dir": sf_dir, "results": out}))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
