"""Dump `.explain("formatted")` for bench queries to plans/<tag>/.

Usage:
    python tools/explain_dump.py <tag> [name ...]

Writes plans/<tag>/<query>_<suffix>.txt for each bench query (or the
given names), where suffix comes from $EXPLAIN_SUFFIX (default
"before"). Explaining never executes the query, so this is cheap and
safe to run alongside other work; the warehouse build is triggered
untimed exactly as bench.py does so DW-form plans resolve.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from olist_data_warehouse_spark.plans.queries import REGISTRY  # noqa: E402
from olist_data_warehouse_spark.session import get_spark  # noqa: E402


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    names = sys.argv[2:]
    suffix = os.environ.get("EXPLAIN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    if not names:
        import bench

        names = [n for n in bench.BENCH_QUERIES if n in REGISTRY]

    spark = get_spark("explain-dump")
    fails = []
    import contextlib
    import io

    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            fails.append(name)
            print(f"FAIL {name}: {exc}")
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"ok   {name} -> {path}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
