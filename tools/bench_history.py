"""Per-query bench series across every BENCH_r*.json, centrally
recovered (r11 verdict item #6).

The driver's bench records are inconsistent artifacts: most carry a
``parsed`` object with the per-query min-of-3 map, but r04/r09/r10
have ``parsed: null`` and only the LAST 2000 characters of stdout in
``tail`` — the last three verdicts each regex-recovered those by hand
to adjudicate ``vs_best_round`` drift. This tool does that recovery
ONCE, centrally (the same `"name": 1.234` pair scan ``bench.py``
uses for its self-adjudication), and prints the table every drift
discussion rebuilds:

    python tools/bench_history.py            # per-round summary table
    python tools/bench_history.py q1_top_units_dw dedup_exact
                                              # per-query time series

Columns: queries recovered, the sum of per-query seconds over the
queries shared with the PREVIOUS round and with the BEST round
(smallest common-sum — the adverse pick, same convention as
bench.py's ``vs_best_round``), and the GEOMEAN per-query ratio vs
each (robust to one heavy query dominating the sum). Tail-recovered
rounds are marked ``~`` — their maps are partial (only pairs inside
the 2000-char window survive), so their ratios are indicative, not
adjudicable.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_META_KEYS = ("value", "sf", "ratio")


def load_round(path: str) -> dict | None:
    """{'round', 'queries': {name: sec}, 'recovered': bool, 'sf'} for
    one BENCH_r*.json, or None if nothing per-query survives."""
    try:
        with open(path) as f:
            rec = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    name = os.path.basename(path)[len("BENCH_"):-len(".json")]
    parsed = rec.get("parsed")
    recovered = False
    if parsed:
        q = dict(parsed.get("queries") or parsed.get("queries_min") or {})
    else:
        # parsed=null: recover '"name": 1.234' pairs from the tail
        # window; integer meta (n/rc/cpus/common_queries) can't match
        # the float regex, named meta keys are dropped, and a pair cut
        # by the window edge simply doesn't match
        recovered = True
        pairs = re.findall(
            r'"([A-Za-z0-9_]+)": ?(-?[0-9]+\.[0-9]+)',
            str(rec.get("tail", "")),
        )
        q = {k: float(v) for k, v in pairs if k not in _META_KEYS}
    if not q:
        return None
    return {
        "round": name,
        "queries": q,
        "recovered": recovered,
        "sf": rec.get("sf"),
    }


def load_all(root: str = HERE) -> list[dict]:
    out = []
    for fname in sorted(os.listdir(root)):
        if fname.startswith("BENCH_r") and fname.endswith(".json"):
            r = load_round(os.path.join(root, fname))
            if r is not None:
                out.append(r)
    return out


def geomean_ratio(cur: dict, prior: dict) -> tuple[float, int] | None:
    """(geomean of cur/prior per shared query, #shared), or None."""
    common = [
        n for n in cur if n in prior and cur[n] > 0 and prior[n] > 0
    ]
    if len(common) < 5:
        return None
    g = math.exp(
        sum(math.log(cur[n] / prior[n]) for n in common) / len(common)
    )
    return g, len(common)


def summary_table(rounds: list[dict]) -> str:
    lines = [
        f"{'round':<6} {'nq':>4} {'sum_s':>8} "
        f"{'vs_prev':>8} {'vs_best':>8} {'best':>5} {'common':>6}"
    ]
    for i, r in enumerate(rounds):
        q = r["queries"]
        vs_prev = "-"
        if i > 0:
            g = geomean_ratio(q, rounds[i - 1]["queries"])
            if g:
                vs_prev = f"{g[0]:.3f}"
        best_name, best_g, best_n = "-", None, 0
        for p in rounds[:i]:
            g = geomean_ratio(q, p["queries"])
            # same basis guard as bench.py's vs_best_round: a prior
            # record sharing under half the current workload measures
            # a stale cheap subset, not the workload — never let a
            # 22-query r01 record be the adverse pick against 60+
            if g is None or g[1] < max(5, len(q) // 2):
                continue
            if best_g is None or g[0] > best_g:
                best_g, best_name, best_n = g[0], p["round"], g[1]
        mark = "~" if r["recovered"] else " "
        lines.append(
            f"{r['round']:<5}{mark} {len(q):>4} "
            f"{sum(q.values()):>8.1f} {vs_prev:>8} "
            f"{(f'{best_g:.3f}' if best_g else '-'):>8} "
            f"{best_name:>5} {best_n:>6}"
        )
    lines.append(
        "~ = tail-recovered (partial map; indicative, not adjudicable)."
        " vs_best is the ADVERSE geomean (worst vs any prior round)."
    )
    return "\n".join(lines)


def series_table(rounds: list[dict], names: list[str]) -> str:
    lines = [
        "query".ljust(28)
        + " ".join(f"{r['round']:>7}" for r in rounds)
    ]
    for n in names:
        cells = [
            f"{r['queries'][n]:>7.3f}" if n in r["queries"] else f"{'-':>7}"
            for r in rounds
        ]
        lines.append(n.ljust(28) + " ".join(cells))
    return "\n".join(lines)


def main(argv: list[str]) -> int:
    rounds = load_all()
    if not rounds:
        print("no BENCH_r*.json records found", file=sys.stderr)
        return 1
    if argv:
        print(series_table(rounds, argv))
    else:
        print(summary_table(rounds))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
