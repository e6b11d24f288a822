"""Empty-input robustness sweep: every registry entry against 0-row
tables.

A 100 TB pipeline sees empty inputs constantly — a fresh partition, a
filtered-to-nothing day, a cold-start table. Every registered plan
should either return an empty (or correctly-degenerate) result or fail
with one of its own documented ValueError guards — never an opaque
runtime crash. This sweep materializes a schema-identical 0-row copy
of every testdata table (preserving the events nanos-timestamp quirk
by copying the arrow schema byte-for-byte) and runs the full registry
against it. Usage:

    python tools/empty_input_sweep.py

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


def make_empty_sf(dst: str) -> None:
    for t in TABLES:
        src = os.path.join(SF_SRC, f"{t}.parquet")
        schema = pq.read_schema(src)
        pq.write_table(
            pa.Table.from_arrays(
                [pa.array([], type=f.type) for f in schema], schema=schema
            ),
            os.path.join(dst, f"{t}.parquet"),
        )


def main() -> int:
    dst = tempfile.mkdtemp(prefix="sf0_empty_")
    make_empty_sf(dst)
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .appName("empty-input-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    crashes, guards = [], []
    names = sorted(REGISTRY)
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
