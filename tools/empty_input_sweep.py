"""Degenerate-input robustness sweep: every registry entry against
0-row (default) or first-k-row tables.

A 100 TB pipeline sees degenerate inputs constantly — a fresh
partition, a filtered-to-nothing day, a cold-start table, a group of
size 1. Every registered plan should either return an empty (or
correctly-degenerate) result or fail with one of its own documented
ValueError guards — never an opaque runtime crash. This sweep
materializes a schema-identical k-row copy of every testdata table
(k=0 by default; preserving the events nanos-timestamp quirk by
copying the arrow schema byte-for-byte; k>0 slices the first k rows so
values stay realistic) and runs the full registry against it. Usage:

    python tools/empty_input_sweep.py [k_rows] [name_substring ...]

Prints one line per entry (rows / guard / CRASH) and exits 1 on any
CRASH.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import SparkSession

from olist_data_warehouse_spark.plans.queries import REGISTRY

SF_SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def make_sliced_sf(dst: str, k: int) -> None:
    for t in TABLES:
        src = os.path.join(SF_SRC, f"{t}.parquet")
        if k <= 0:
            schema = pq.read_schema(src)
            out = pa.Table.from_arrays(
                [pa.array([], type=f.type) for f in schema], schema=schema
            )
        else:
            out = pq.read_table(src).slice(0, k)
        pq.write_table(out, os.path.join(dst, f"{t}.parquet"))


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    dst = tempfile.mkdtemp(prefix=f"sf_deg{k}_")
    make_sliced_sf(dst, k)
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .appName("empty-input-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    crashes, guards = [], []
    # optional name filter: positional args after k are substrings —
    # run only matching entries (new-entry battery without a full sweep)
    pats = sys.argv[2:]
    names = sorted(
        n for n in REGISTRY
        if not pats or any(p in n for p in pats)
    )
    t0 = time.time()
    for i, name in enumerate(names, 1):
        t = time.time()
        try:
            n = len(REGISTRY[name].fn(spark, dst).collect())
            status = f"{n} rows"
        except ValueError as e:
            # An explicit guard raising its documented error is a
            # designed outcome, not a robustness failure.
            guards.append((name, str(e)[:100]))
            status = f"guard: {str(e)[:60]}"
        except Exception as e:  # noqa: BLE001 - classify and continue
            crashes.append((name, f"{type(e).__name__}: {str(e)[:200]}"))
            status = f"CRASH {type(e).__name__}"
        print(
            f"[{i:3d}/{len(names)}] {name:40s} {time.time() - t:5.1f}s "
            f" {status}",
            flush=True,
        )
    print(
        f"\nEMPTY-INPUT SWEEP: {len(names) - len(crashes)}/{len(names)} "
        f"clean ({len(guards)} guard-raises) in {time.time() - t0:.0f}s"
    )
    for name, msg in guards:
        print(f"  guard {name}: {msg}")
    for name, msg in crashes:
        print(f"  CRASH {name}: {msg}")
    return 1 if crashes else 0


if __name__ == "__main__":
    sys.exit(main())
