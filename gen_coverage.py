#!/usr/bin/env python
"""Regenerate COVERAGE.md from the query registry — the single source
of truth mapping SURVEY.md §2 inventory ids to catalog queries, their
oracle status, and their one-line scale argument. Run after adding
queries: `python gen_coverage.py`."""

from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    from sales_data_pipeline_spark.queries.base import load_all

    registry = load_all()
    lines = [
        "# COVERAGE — query catalog vs SURVEY §2 inventory",
        "",
        "Auto-generated from the query registry (`python gen_coverage.py`);",
        "every row is a registered query in `__spark_entry__.queries()`.",
        "Oracle ✓ = DuckDB SQL hash-compared cell-exact by the driver at",
        "sf0.01; rows-only = genuinely non-SQL-expressible (the driver",
        "records a weaker check).",
        "",
        f"**{len(registry)} queries, "
        f"{sum(1 for s in registry.values() if s.oracle)} oracled.**",
        "",
        "| Query | SURVEY ids / extension | Oracle |",
        "|---|---|---|",
    ]
    for name in sorted(registry):
        spec = registry[name]
        oracle = "✓" if spec.oracle else "rows-only"
        survey = (spec.survey or "—").replace("|", "\\|")
        lines.append(f"| `{name}` | {survey} | {oracle} |")
    lines.append("")
    out = os.path.join(_REPO_ROOT, "COVERAGE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}: {len(registry)} queries")


if __name__ == "__main__":
    main()
