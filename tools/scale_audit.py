"""Scaling-ratio audit: execute EVERY registry entry at two scale
factors and compare wall times.

The oracle sweep proves correctness at sf0.01; the bench times 57
headliners at sf0.1. This closes the gap between them: every entry
runs (collect, no oracle) at both scales, and the ratio
t(sf0.1)/t(sf0.01) is reported. Data grows 10x between the two, so a
ratio well above ~10 on a non-trivial baseline marks an operator whose
cost curve is bending — the local, measurable proxy for the 100 TB
cliff question. Usage:

    python tools/scale_audit.py [ratio_flag_threshold] [name_substring ...]

Prints one line per entry sorted by ratio, a flagged summary, and exits
1 if any entry with t(sf0.01) >= 0.5s exceeds the threshold (tiny
baselines are all fixed overhead and ratio-meaningless).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from olist_data_warehouse_spark.plans.queries import REGISTRY

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"
MIN_BASE_S = 0.5

# Documented superlinear entries: intrinsically quadratic ON THIS
# SYNTHETIC DATA, with the reason and the at-scale posture recorded in
# the entry's own docstring. Reported, but not a failure.
EXPECTED_SUPERLINEAR = {
    "sim_tfidf_cosine": (
        "closed ~31-term synthetic vocabulary makes every doc pair "
        "share terms, so the posting-join pair aggregation is ~C(N,2) "
        "dense; open vocabularies bound it by df (see entry doc)"
    ),
}


def run_all(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    times: dict[str, float] = {}
    pats = sys.argv[2:]
    names = sorted(
        n for n in REGISTRY
        if not pats or any(p in n for p in pats)
    )
    # Untimed warm-up pass so each timed run measures the plan, not
    # cold shuffle-file/codegen caches (the bench.py discipline).
    for name in names:
        try:
            REGISTRY[name].fn(spark, sf_dir).collect()
        except Exception:
            pass
    for i, name in enumerate(names, 1):
        t = time.time()
        try:
            REGISTRY[name].fn(spark, sf_dir).collect()
            times[name] = time.time() - t
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"ERROR {name} at {sf_dir}: {type(e).__name__}: {e}")
            times[name] = float("nan")
        print(
            f"[{i:3d}/{len(names)}] {name:40s} {times[name]:6.2f}s",
            flush=True,
        )
    return times


def main() -> int:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 12.0
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .appName("scale-audit")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    print(f"== {SF_SMALL} ==")
    t_small = run_all(spark, SF_SMALL)
    print(f"== {SF_BIG} ==")
    t_big = run_all(spark, SF_BIG)

    rows = []
    for name in sorted(REGISTRY):
        a, b = t_small.get(name), t_big.get(name)
        if a and b and a == a and b == b:
            rows.append((b / a, a, b, name))
    rows.sort(reverse=True)
    print(f"\n{'ratio':>7} {'sf0.01':>8} {'sf0.1':>8}  entry")
    for r, a, b, name in rows:
        print(f"{r:7.1f} {a:8.2f} {b:8.2f}  {name}")

    flagged = [
        (r, a, b, n) for r, a, b, n in rows if r > threshold and a >= MIN_BASE_S
    ]
    new = [f for f in flagged if f[3] not in EXPECTED_SUPERLINEAR]
    print(
        f"\nAUDIT {len(rows)} entries; flagged (ratio > {threshold}, "
        f"base >= {MIN_BASE_S}s): {len(flagged)} "
        f"({len(flagged) - len(new)} documented)"
    )
    for r, a, b, name in flagged:
        tag = "known" if name in EXPECTED_SUPERLINEAR else "FLAG"
        print(f"  {tag} {name}: {a:.2f}s -> {b:.2f}s ({r:.1f}x)")
        if name in EXPECTED_SUPERLINEAR:
            print(f"        {EXPECTED_SUPERLINEAR[name]}")
    return 1 if new else 0


if __name__ == "__main__":
    sys.exit(main())
