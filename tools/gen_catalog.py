"""Generate CATALOG.md — one line per registry query, from the registry
itself (name, tags, oracle status, first docstring sentence), so the
catalog can never drift from the code. Re-run after adding queries:

    python tools/gen_catalog.py
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lake_medallion_architecture_project_spark.plans.registry import REGISTRY  # noqa: E402
import data_lake_medallion_architecture_project_spark.plans  # noqa: E402,F401


def first_sentence(doc: str) -> str:
    text = " ".join((doc or "").split())
    m = re.match(r"(.+?[.!?])(\s|$)", text)
    s = m.group(1) if m else text[:160]
    return s if len(s) <= 180 else s[:177] + "..."


def main() -> None:
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CATALOG.md"
    )
    n_oracled = sum(1 for q in REGISTRY.values() if q.oracle)
    lines = [
        "# Query catalog (generated — do not edit; `python tools/gen_catalog.py`)",
        "",
        f"{len(REGISTRY)} registry queries, {n_oracled} with a DuckDB oracle "
        "(the rest are rows-only by design). Each is a `queries()` entry in "
        "`__spark_entry__.py`; correctness gate: `tools/check_oracle.py`.",
        "",
        "| query | tags | oracle | what |",
        "|---|---|---|---|",
    ]
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        lines.append(
            f"| `{name}` | {', '.join(q.tags) or '-'} | "
            f"{'hash' if q.oracle else 'rows-only'} | {first_sentence(q.doc)} |"
        )
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}: {len(REGISTRY)} queries, {n_oracled} oracled")


if __name__ == "__main__":
    main()
