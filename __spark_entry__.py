"""Driver contract for the spark-graft builder (PySpark target).

Delegates to the query catalog in ``sales_data_pipeline_spark.queries``:
every registered query ships a Spark implementation and (where SQL can
express it) a DuckDB oracle. See sales_data_pipeline_spark/queries/*.py
for the SURVEY.md §2 coverage map.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Queries from SURVEY.md §2 / the LLM-data extension surface that should
# reach the front of the driver's correctness window first when still
# unchecked (flagship operators + freshly rewritten plans).
_PRIORITY = [
    "scd2_merge_history",
    "silver_customer_transform",
    "silver_sales_transform",
    "silver_product_transform",
    "silver_store_transform",
    "watermark_incremental_filter",
    "watermark_incremental_scan",
    "monthly_customer_totals",
    "star_join_enriched",
    "scan_filter_project",
    "kpi_dashboard",
    "sales_team_mart",
    "quality_suite_checks",
    "value_repair_flags",
    "pattern_filter",
    "isin_filter",
    "join_string_normalized",
    "running_total_window",
    "ordered_history",
    "topk_customers",
    "union_assembly",
    "schema_evolution_union",
    "set_ops_customers",
    "string_functions_showcase",
    "math_functions_showcase",
    "knn_brute_force",
    "knn_lsh_bucket",
    "ivf_centroid_assign",
    "knn_ivf_probe",
    "hybrid_search_rrf",
    "ntile_customer_quartiles",
    "revenue_pareto_curve",
]


def _driver_checked() -> set[str]:
    """Names that already have a driver-side CORRECTNESS row (any round).

    The external driver checks the first N names in the dict ``queries()``
    returns, so we rotate still-unchecked queries to the front each round.
    Derived from the CORRECTNESS_r*.json files the driver itself writes —
    self-maintaining, no manual bookkeeping.
    """
    checked: set[str] = set()
    for path in glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                checked.update(json.load(f).keys())
        except (OSError, ValueError):
            continue
    return checked


def _rotated(names: list[str]) -> list[str]:
    """Priority-unchecked first, then other unchecked (sorted), then checked."""
    checked = _driver_checked()
    in_catalog = set(names)
    head = [n for n in _PRIORITY if n in in_catalog and n not in checked]
    seen = set(head)
    mid = [n for n in sorted(names) if n not in checked and n not in seen]
    tail = [n for n in sorted(names) if n in checked]
    return head + mid + tail


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: star join orders ->
    customer -> nation -> region with broadcast dims + grouped revenue
    (SURVEY §2 J2/A5, dashboard revenue-by-dimension workload)."""
    from sales_data_pipeline_spark.queries.base import load_all

    registry = load_all()
    return registry["revenue_by_nation"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM-data
    extensions). Each callable takes (spark, sf_dir) and returns a DF."""
    from sales_data_pipeline_spark.queries.base import load_all

    registry = load_all()
    return {name: registry[name].fn for name in _rotated(list(registry))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys without SQL-expressible
    semantics are omitted (driver records a rows-only check)."""
    from sales_data_pipeline_spark.queries.base import load_all

    registry = load_all()
    return {
        name: registry[name].oracle
        for name in _rotated(list(registry))
        if registry[name].oracle is not None
    }
