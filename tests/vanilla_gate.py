"""Driver-faithful correctness gate: the full oracle compare under a
VANILLA SparkSession (no engine confs), exactly as the external driver
invokes ``__spark_entry__``. Catches queries that silently depend on
``build_session`` settings (UTC zone, AQE, broadcast threshold, legacy
parquet confs) — those must self-configure via ``queries/base.table``.

Run:  PYTHONPATH=. python tests/vanilla_gate.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession

from tests.oracle_harness import (
    CompareResult,
    duckdb_connection,
    run_query_check,
)


def main(sf_dir: str) -> int:
    from sales_data_pipeline_spark.queries.base import load_all

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connection(sf_dir)
    registry = load_all()
    failures = 0
    for name, spec in sorted(registry.items()):
        try:
            res = run_query_check(spark, con, sf_dir, spec)
        except Exception as exc:  # noqa: BLE001
            res = CompareResult(name, False, f"EXCEPTION: {exc}")
        print(("OK   " if res.ok else "FAIL ") + name + "  " + res.detail[:300])
        failures += 0 if res.ok else 1
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    raise SystemExit(main(sf))
