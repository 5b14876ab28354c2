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
    # Standing compensation note (round-10 verdict ask #7): the
    # rows-only queries are engine-internal (HLL register layouts /
    # eigensolvers / zlib — no DuckDB twin exists), and each carries
    # dedicated LOCAL pins holding it to a semantic bar the driver's
    # weaker rows-only check can't; permanently rows-only by design.
    rows_only_pins = {
        "approx_distinct_users": (
            "HLL++ estimate within 5-sigma of the exact distinct "
            "computed alongside — tests/test_llm_operators.py::"
            "test_approx_distinct_within_hll_error_bounds, re-run at "
            "sf1 in tests/test_multiscale_pins.py"
        ),
        "incremental_distinct_sketch": (
            "per-batch sketches merged == global sketch + error bound "
            "— tests/test_pipeline_operators.py::"
            "test_merged_sketches_match_global_and_bound_error, re-run "
            "at sf1 in tests/test_multiscale_pins.py"
        ),
        "embedding_pca_project": (
            "loadings match numpy.linalg.eigh and projected variance "
            "descends across components — tests/test_llm_operators.py, "
            "re-run at sf1 in tests/test_multiscale_pins.py"
        ),
        "text_compression_ratio": (
            "per-document output equals direct zlib level-6 calls — "
            "tests/test_llm_operators.py::"
            "test_compression_ratio_matches_zlib, re-run at sf1 in "
            "tests/test_multiscale_pins.py"
        ),
    }
    missing = {
        n for n, s in registry.items() if not s.oracle
    } - set(rows_only_pins)
    lines += [
        "",
        "## Rows-only queries: compensating local pins",
        "",
        "These have no SQL-expressible twin, so the driver records a",
        "weaker rows-only check — compensated by dedicated local tests",
        "(every pin also re-runs at sf1 via tools/scale_data.py):",
        "",
    ]
    for n in sorted(rows_only_pins):
        if n in registry:
            lines.append(f"- `{n}` — {rows_only_pins[n]}")
    if missing:
        lines.append(
            f"- **UNPINNED rows-only queries: {sorted(missing)} — "
            "add a pin or an oracle.**"
        )
    lines.append("")
    out = os.path.join(_REPO_ROOT, "COVERAGE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}: {len(registry)} queries")


if __name__ == "__main__":
    main()
