"""One-shot mechanical splitter for plans/llm_queries.py (r12 verdict
optional #7): moves the 166 registered entries into per-family modules
under plans/llm/ while preserving EXACT registration order via a
canonical-order restore in the aggregator.

Invariants enforced by the round's closing checks (not this script):
zero diff in ordered_registry() names, full oracle sweep green.

Family mapping (prefix -> module): dedup/decon -> dedup; sim -> sim;
text/link/path -> text; samp/pack/pipe/corpus -> samp; multi -> multi;
sk/bloom -> sketch; everything else -> analytics.

Support blocks (helpers/constants) go to the single family that
references them (fixpoint over helper-to-helper references); blocks
referenced by 2+ families go to llm/common.py.
"""

from __future__ import annotations

import ast
import os
import re

SRC = "olist_data_warehouse_spark/plans/llm_queries.py"
OUT_DIR = "olist_data_warehouse_spark/plans/llm"

FAMILIES = ["dedup", "sim", "text", "samp", "multi", "sketch",
            "analytics"]


def fam_of(name: str) -> str:
    p = name.split("_")[0]
    if p in ("dedup", "decon"):
        return "dedup"
    if p == "sim":
        return "sim"
    if p in ("text", "link", "path"):
        return "text"
    if p in ("samp", "pack", "pipe", "corpus"):
        return "samp"
    if p == "multi":
        return "multi"
    if p in ("sk", "bloom"):
        return "sketch"
    return "analytics"


def main() -> None:
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    def seg(node) -> str:
        first = (min(d.lineno for d in node.decorator_list)
                 if getattr(node, "decorator_list", None) else node.lineno)
        return "".join(lines[first - 1:node.end_lineno])

    doc = None
    imports: list[str] = []
    blocks: list[dict] = []  # {kind, names, family?, src, entry?}
    canon: list[str] = []

    for i, node in enumerate(tree.body):
        if i == 0 and isinstance(node, ast.Expr) and isinstance(
            node.value, ast.Constant
        ):
            doc = ast.get_source_segment(src, node)
            continue
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            imports.append(seg(node))
            continue
        if isinstance(node, ast.FunctionDef) and node.decorator_list:
            # find the register("name") argument
            entry = None
            for d in node.decorator_list:
                if (isinstance(d, ast.Call)
                        and getattr(d.func, "id", "") == "register"
                        and d.args
                        and isinstance(d.args[0], ast.Constant)):
                    entry = d.args[0].value
            if entry is None:
                raise SystemExit(
                    f"decorated non-entry function {node.name}"
                )
            canon.append(entry)
            blocks.append({
                "kind": "entry", "names": {node.name, entry},
                "family": fam_of(entry), "src": seg(node),
            })
            continue
        # support block: helper def / constant(s) / anything else
        names: set[str] = set()
        if isinstance(node, ast.FunctionDef):
            names.add(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        names.add(n.id)
        elif isinstance(node, ast.AnnAssign) and isinstance(
            node.target, ast.Name
        ):
            names.add(node.target.id)
        blocks.append({"kind": "support", "names": names,
                       "family": None, "src": seg(node)})

    # assign support blocks to families by reference fixpoint
    changed = True
    while changed:
        changed = False
        for b in blocks:
            if b["kind"] != "support" or b["family"] is not None:
                continue
            refs: set[str] = set()
            for other in blocks:
                if other is b or other["family"] is None:
                    continue
                if any(
                    re.search(rf"\b{re.escape(n)}\b", other["src"])
                    for n in b["names"] if n
                ):
                    refs.add(other["family"])
            if len(refs) == 1:
                b["family"] = refs.pop()
                changed = True
    for b in blocks:
        if b["kind"] == "support" and b["family"] is None:
            b["family"] = "common"

    # a support block referenced by a COMMON block must itself be
    # common (common.py cannot import from family modules — they
    # import from it)
    changed = True
    while changed:
        changed = False
        for b in blocks:
            if b["kind"] != "support" or b["family"] == "common":
                continue
            for other in blocks:
                if other["family"] == "common" and any(
                    re.search(rf"\b{re.escape(n)}\b", other["src"])
                    for n in b["names"] if n
                ):
                    b["family"] = "common"
                    changed = True
                    break

    header = "".join(imports)
    common_names = sorted(
        n for b in blocks if b["family"] == "common" for n in b["names"]
        if n
    )
    common_import = (
        "from olist_data_warehouse_spark.plans.llm.common import (  "
        "# noqa: F401\n"
        + "".join(f"    {n},\n" for n in common_names)
        + ")\n"
        if common_names else ""
    )

    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, "__init__.py"), "w") as f:
        f.write(
            '"""Per-family LLM-pipeline query modules (split from the '
            'former\nmonolithic plans/llm_queries.py; that module '
            'remains the aggregator\nand registration-order '
            'keeper)."""\n'
        )

    if common_names:
        with open(os.path.join(OUT_DIR, "common.py"), "w") as f:
            f.write(
                '"""Shared helpers/constants used by 2+ LLM query '
                'families."""\n\n'
            )
            f.write(header + "\n")
            for b in blocks:
                if b["family"] == "common":
                    f.write("\n" + b["src"].rstrip() + "\n")

    fam_doc = {
        "dedup": "Dedup and decontamination query entries.",
        "sim": "Similarity-search and ANN query entries.",
        "text": "Text-analysis, linkage and path query entries.",
        "samp": "Sampling, packing and corpus-pipeline query entries.",
        "multi": "Multimodal (binary payload) query entries.",
        "sketch": "Sketch and bloom-filter query entries.",
        "analytics": "Extended relational/window/time-series/quality "
                     "query entries.",
    }
    for fam in FAMILIES:
        fam_blocks = [b for b in blocks if b["family"] == fam]
        if not fam_blocks:
            continue
        with open(os.path.join(OUT_DIR, f"{fam}.py"), "w") as f:
            f.write(f'"""{fam_doc[fam]}\n\nSplit from llm_queries.py; '
                    'see that module for the shared\nportability '
                    'invariants and the canonical registration '
                    'order."""\n\n')
            f.write(header)
            f.write(common_import)
            for b in fam_blocks:
                f.write("\n\n" + b["src"].rstrip() + "\n")

    with open(SRC, "w") as f:
        f.write(doc)
        f.write("\n\n")
        f.write(
            "from olist_data_warehouse_spark.plans.queries import "
            "REGISTRY\n\n"
            "# Import order is arbitrary here; _CANONICAL_ORDER "
            "restores the\n# historical registration order below, so "
            "ordered_registry() is\n# byte-stable across the split.\n"
        )
        for fam in FAMILIES:
            if any(b["family"] == fam for b in blocks):
                f.write(
                    f"from olist_data_warehouse_spark.plans.llm import "
                    f"{fam}  # noqa: F401,E501\n"
                )
        f.write(
            "\n# compat re-exports for external importers\n"
            "from olist_data_warehouse_spark.plans.llm.text import "
            "_BM25_TERMS  # noqa: F401,E402\n"
        )
        f.write("\n_CANONICAL_ORDER = [\n")
        for n in canon:
            f.write(f'    "{n}",\n')
        f.write("]\n\n")
        f.write(
            "_moved = {\n"
            "    n: dict.pop(REGISTRY, n)\n"
            "    for n in _CANONICAL_ORDER\n"
            "    if dict.__contains__(REGISTRY, n)\n"
            "}\n"
            "for _n, _rq in _moved.items():\n"
            "    dict.__setitem__(REGISTRY, _n, _rq)\n"
            "del _moved\n"
        )
    print(f"entries: {len(canon)}; families: "
          f"{ {f: sum(1 for b in blocks if b['family']==f and b['kind']=='entry') for f in FAMILIES} }; "
          f"common blocks: {sum(1 for b in blocks if b['family']=='common')}")


if __name__ == "__main__":
    main()
