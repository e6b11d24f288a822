"""The driver reads bench.py's LAST stdout line as its machine-readable
result (round 4 lost the headline number when detail arrays overgrew
the line). Pin the contract: last line parses alone, carries the
required keys, and partial runs leave BENCH_DETAIL.json untouched
(round 6's detail evidence was clobbered by a 3-query smoke —
VERDICT r6; only the full sf0.1 3-run bench may overwrite it)."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_contract_line_is_last_and_parseable():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    detail_path = os.path.join(repo, "BENCH_DETAIL.json")
    before = (
        open(detail_path).read() if os.path.exists(detail_path) else None
    )
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_BENCH_RUNS"] = "1"
    env["SPARK_GRAFT_BENCH_LIMIT"] = "3"
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    contract = json.loads(lines[-1])  # last non-empty line, alone
    assert contract["metric"] == "olist_dw_spark_bench_total"
    assert contract["unit"] == "sec"
    assert isinstance(contract["value"], (int, float))
    assert contract["sf"] == 0.001
    assert len(contract["queries"]) == 3
    assert contract["queries_total"] == 3
    # the whole line must sit inside the driver's 2000-char stdout
    # tail window or the record lands parsed=null (r9/r10): the
    # contract builder enforces a 1900-char budget by construction
    assert len(lines[-1]) <= 1900
    # raw arrays must NOT be inline (that's what overflowed the
    # driver's tail capture in round 4) — they go to the detail file,
    # and a SUBSET smoke like this one must not clobber that file.
    assert "queries_raw" not in contract
    after = (
        open(detail_path).read() if os.path.exists(detail_path) else None
    )
    assert after == before, "partial bench run overwrote BENCH_DETAIL.json"
