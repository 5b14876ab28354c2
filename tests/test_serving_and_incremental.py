"""Serving-layer queries over a real pipeline run + incremental
(watermark-gated) pipeline mode."""

from __future__ import annotations

import csv
import os

from sales_data_pipeline_spark.plans import serving
from sales_data_pipeline_spark.plans.runner import PipelineConfig, run_pipeline
from tests.test_pipeline_runner import _fixtures


def _cfg(tmp_path, **kw):
    root = str(tmp_path / "in")
    _fixtures(root)
    return PipelineConfig(
        input_paths={
            "sales": f"{root}/sales.csv",
            "customer": f"{root}/customer.csv",
            "product": f"{root}/product.csv",
            "store": f"{root}/store.csv",
        },
        output_root=str(tmp_path / "lake"),
        as_of_date="2024-06-01",
        **kw,
    )


def test_serving_surface(spark, tmp_path):
    cfg = _cfg(tmp_path)
    run_pipeline(spark, cfg)
    serving.register_gold_views(spark, f"{cfg.output_root}/gold")

    kpi = serving.kpis(spark).first()
    assert kpi.total_orders == 3
    assert kpi.total_revenue == 39.0  # 10 + 5 + 24
    assert kpi.unique_customers == 2

    by_cat = {r.category: r.revenue for r in serving.revenue_by(spark, "category").collect()}
    assert by_cat == {"tools": 39.0}

    filtered = serving.kpis(spark, states=["ldn"]).first()
    assert filtered.total_orders == 2  # ada's two widget orders

    top = serving.top_customers(spark, n=1).collect()
    assert top[0].customer_id == 2  # bob spent 24 > ada's 15


def test_incremental_watermark_mode(spark, tmp_path):
    wm_dir = str(tmp_path / "wm")
    cfg = _cfg(tmp_path, mode="incremental", watermark_dir=wm_dir)
    m1 = run_pipeline(spark, cfg)
    assert m1.silver_counts["sales"] == 3

    # watermark persisted at max processed sales_date
    import json

    with open(os.path.join(wm_dir, "sales_watermark.json")) as f:
        wm = json.load(f)
    assert wm["last_processed_timestamp"].startswith("2024-03-03")

    # second run: append one newer and one older (pre-watermark) row.
    # The 5-minute late-data buffer re-reads rows at the boundary, so
    # the 2024-03-03 row reprocesses alongside the new 2024-04-01 row;
    # the 2024-01-15 row stays behind the watermark.
    sales_csv = cfg.input_paths["sales"]
    with open(sales_csv, "a", newline="") as f:
        w = csv.writer(f)
        w.writerow([1, 10, "Widget", "2024-04-01", 100, 6.0, 1, 6.0])
        w.writerow([2, 10, "Widget", "2024-01-15", 100, 9.0, 1, 9.0])
    m2 = run_pipeline(spark, cfg)
    assert m2.bronze_counts["sales"].get("VALID", 0) == 2
    assert m2.silver_counts["sales"] == 2
    with open(os.path.join(wm_dir, "sales_watermark.json")) as f:
        wm2 = json.load(f)
    assert wm2["last_processed_timestamp"].startswith("2024-04-01")
