"""sf1-class scale-out probe: low/high-core ratios on real-sized data.

The sf0.1 bench cannot demonstrate scale-out — at that size nearly
every query is task-overhead-bound and the 8-core suite total beats
the 32-core one (r13 verdict item 6), so per-query scaling ratios are
uninterpretable. This tool builds a 10x-replicated "sf1-class" input
from ``$SPARK_GRAFT_SF_DIR`` (deterministic id-shifted copies — a
measurement input, never a bench/oracle input: bench.py and the
oracle always read the driver's own parquet) and times a configurable
entry list at two core counts in SEPARATE processes (the master is
``local[$SPARK_GRAFT_CPUS]``, fixed per process), reporting
t(low)/t(high) per entry. A ratio near cores_high/cores_low means the
operator genuinely scales out; ~1.0 means it is serial or
overhead-bound even at this size.

Usage:
    python tools/scale_probe.py build            # materialize the 10x input
    python tools/scale_probe.py run [name ...]   # time entries at both core counts
    python tools/scale_probe.py one <cpus> <out.json> [name ...]  # internal

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SCALE_PROBE_DIR (default
/tmp/odw-scale-probe), SCALE_PROBE_CPUS="32,8", SCALE_PROBE_RUNS=2.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROBE_DIR = os.environ.get("SCALE_PROBE_DIR", "/tmp/odw-scale-probe")
REPLICAS = 10

# id columns to shift per replica so replicated rows stay key-unique
# (FK columns shift with their parents so joins keep their fan-out)
_SHIFTS = {
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
    "events": {"event_id": 100_000_000, "user_id": 10_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {"l_orderkey": 100_000_000, "l_partkey": 10_000_000,
                 "l_suppkey": 1_000_000},
    "part": {"p_partkey": 10_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "customer": {"c_custkey": 10_000_000},
}
_VERBATIM = ("nation", "region")

# default probe set: the most expensive bench entries whose inputs the
# replication grows (pure derived-table entries like the lake DDL
# shapes track their source table sizes automatically)
DEFAULT_ENTRIES = [
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_pipeline_eval",
    "dedup_semdedup",
    "link_fuzzy_parts",
    "sim_pq_trained_encode",
    "lake_batch_cdf",
    "lake_delete_where",
    "samp_cluster_split",
    "text_collocation_pmi",
]


def build() -> None:
    from pyspark.sql import functions as F

    from olist_data_warehouse_spark.session import get_spark

    spark = get_spark("scale-probe-build")
    os.makedirs(PROBE_DIR, exist_ok=True)
    for name, shifts in _SHIFTS.items():
        src = os.path.join(SF_DIR, f"{name}.parquet")
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        parts = []
        for r in range(REPLICAS):
            p = df
            for col, step in shifts.items():
                if col in p.columns:
                    p = p.withColumn(
                        col, (F.col(col) + F.lit(r * step)).cast(
                            dict(df.dtypes)[col]
                        )
                    )
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        dst = os.path.join(PROBE_DIR, f"{name}.parquet")
        out.coalesce(8).write.mode("overwrite").parquet(dst)
        print(f"built {dst}", flush=True)
    import shutil

    for name in _VERBATIM:
        src = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(src):
            dst = os.path.join(PROBE_DIR, f"{name}.parquet")
            if os.path.isdir(src):
                shutil.rmtree(dst, ignore_errors=True)
                shutil.copytree(src, dst)
            else:
                shutil.copyfile(src, dst)
            print(f"copied {dst}", flush=True)
    spark.stop()


def one(cpus: str, out_path: str, names: list[str]) -> None:
    """Time ``names`` at SPARK_GRAFT_CPUS=cpus over the probe input
    (single process — the master core count is fixed at session
    build)."""
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    from olist_data_warehouse_spark.plans.queries import REGISTRY
    from olist_data_warehouse_spark.session import get_spark

    runs = int(os.environ.get("SCALE_PROBE_RUNS", "2"))
    spark = get_spark(f"scale-probe-{cpus}")
    times: dict[str, float] = {}
    for name in names:
        df = REGISTRY[name].fn(spark, PROBE_DIR)
        df.write.format("noop").mode("overwrite").save()  # warm
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, PROBE_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        print(f"  [{cpus} cpus] {name}: {times[name]}s", flush=True)
    spark.stop()
    with open(out_path, "w") as f:
        json.dump(times, f)


def run(names: list[str]) -> None:
    cpus_pair = os.environ.get("SCALE_PROBE_CPUS", "32,8").split(",")
    high, low = cpus_pair[0], cpus_pair[1]
    here = os.path.dirname(os.path.abspath(__file__))
    results = {}
    for cpus in (high, low):
        out = os.path.join(PROBE_DIR, f"times_c{cpus}.json")
        subprocess.run(
            [sys.executable, os.path.join(here, "scale_probe.py"),
             "one", cpus, out, *names],
            check=True,
        )
        with open(out) as f:
            results[cpus] = json.load(f)
    print(f"\nscale-out ratios t(c{low})/t(c{high}) over {PROBE_DIR} "
          f"(~10x {SF_DIR}):")
    for name in names:
        th, tl = results[high].get(name), results[low].get(name)
        if th and tl:
            print(f"  {name}: c{high}={th}s c{low}={tl}s "
                  f"ratio={tl / th:.2f}")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    if cmd == "build":
        build()
    elif cmd == "one":
        one(sys.argv[2], sys.argv[3], sys.argv[4:] or DEFAULT_ENTRIES)
    else:
        names = sys.argv[2:] if cmd == "run" else sys.argv[1:]
        run(names or DEFAULT_ENTRIES)
