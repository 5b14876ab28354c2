"""CLI entry point: ``python -m sales_data_pipeline_spark run ...``.

Replaces the reference's ``python -m src.main.main`` script
(/root/reference/src/main/main.py — a 600-line monolith with
hard-coded paths): config comes from the layered loader (deep-merge +
env overlay + ``${VAR}``), the staged runner executes
bronze -> silver(+SCD2) -> gold with one action per layer, and the
post-hoc gold audit mirrors the Airflow DAG checks
(airflow/dags/sales_pipeline_dag.py:36-81).

Usage:
    python -m sales_data_pipeline_spark run \
        --config config.yaml [--env prod] \
        --sales s.csv --customer c.csv --product p.csv --store st.csv \
        --output-root /lake --as-of 2024-06-01 [--mode incremental] \
        [--watermark-dir /lake/_state] [--audit]

Prints one JSON object of pipeline metrics to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
from dataclasses import asdict


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sales_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    run = sub.add_parser("run", help="run the batch pipeline")
    run.add_argument("--config", help="base config YAML/JSON (optional)")
    run.add_argument("--env", help="environment overlay name")
    run.add_argument("--sales", required=True)
    run.add_argument("--customer", required=True)
    run.add_argument("--product", required=True)
    run.add_argument("--store", required=True)
    run.add_argument("--output-root", required=True)
    run.add_argument("--as-of", required=True, help="YYYY-MM-DD")
    run.add_argument(
        "--mode", choices=["full_refresh", "incremental"], default=None
    )
    run.add_argument("--watermark-dir")
    run.add_argument(
        "--audit", action="store_true",
        help="post-hoc gold audit after the run",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    from sales_data_pipeline_spark import config as cfgmod
    from sales_data_pipeline_spark.plans.runner import (
        PipelineConfig,
        run_pipeline,
    )
    from sales_data_pipeline_spark.session import build_session

    file_cfg: dict = {}
    extra_conf: dict[str, str] = {}
    if args.config:
        file_cfg = cfgmod.load_config(args.config, env_name=args.env)
        extra_conf = cfgmod.spark_conf_from(file_cfg)

    pipe_section = file_cfg.get("pipeline", {})
    dq = pipe_section.get("data_quality", {})
    cfg = PipelineConfig(
        input_paths={
            "sales": args.sales,
            "customer": args.customer,
            "product": args.product,
            "store": args.store,
        },
        output_root=args.output_root,
        as_of_date=args.as_of,
        mode=args.mode or pipe_section.get("mode", "full_refresh"),
        watermark_dir=args.watermark_dir,
        quality_suites=file_cfg.get("quality_suites", {}),
        max_rejection_pct=float(dq.get("max_rejection_percentage", 10.0)),
        min_gold_join_percentage=float(
            dq.get("min_gold_join_percentage", 70.0)
        ),
    )

    from pyspark.sql import SparkSession

    # build_session is getOrCreate: only stop a session this process
    # created (embedding callers — tests, notebooks — keep theirs)
    owns_session = SparkSession.getActiveSession() is None
    spark = build_session("sales-pipeline", extra_conf=extra_conf)
    try:
        metrics = run_pipeline(spark, cfg)
        out = asdict(metrics)
        if args.audit:
            from sales_data_pipeline_spark.plans.audit import (
                audit_gold_outputs,
            )

            audit = audit_gold_outputs(spark, cfg.output_root)
            out["audit"] = asdict(audit)
            out["audit"]["passed"] = audit.passed
        print(json.dumps(out, default=str))
        return 0
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
