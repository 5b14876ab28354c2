"""Pins for the pipeline_end_to_end bench composite: the driver-table ->
reference-CSV derivation must feed plans/runner cleanly, rejection
reasons must actually fire (the dirt injection is the point), and the
gold layer must materialize with a healthy join rate."""

from __future__ import annotations

import os

from sales_data_pipeline_spark.plans import bench_pipeline

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")


def test_composite_end_to_end(spark, tmp_path):
    inputs = bench_pipeline.prepare_fixtures(
        spark, SF_DIR, root=str(tmp_path / "fixtures")
    )
    assert set(inputs) == {"sales", "customer", "product", "store"}

    m = bench_pipeline.run_composite(spark, inputs)

    # bronze: dirt injection must produce every FIXTURES.md §1 reason
    sales_summary = m.bronze_counts["sales"]
    assert sales_summary.get("VALID", 0) > 0
    for reason in (
        "NULL_CUSTOMER_ID",
        "NULL_STORE_ID",
        "NULL_SALES_DATE",
        "INVALID_PRICE",
        "INVALID_QUANTITY",
    ):
        assert sales_summary.get(reason, 0) > 0, (reason, sales_summary)
    # ~7% dirt: rejection stays under the 10% warn threshold
    total = sum(sales_summary.values())
    rejected = total - sales_summary["VALID"]
    assert rejected / total < 0.10
    assert "bronze_sales_rejection_pct" not in m.quality

    # silver + SCD2 + gold all materialized
    assert m.silver_counts["sales"] > 0
    assert m.silver_counts["customer_scd"] > 0
    assert m.gold_counts["sales_enriched"] > 0
    assert m.gold_counts["customer_metrics"] > 0
    # gold star-join rate clears the 70% gate (only the ~10% of
    # customers gated on invalid_email drop fact rows)
    assert "gold_join_pct" not in m.quality


def test_fixture_cache_marker(spark, tmp_path):
    root = str(tmp_path / "fx")
    p1 = bench_pipeline.prepare_fixtures(spark, SF_DIR, root=root)
    marker = os.path.join(root, "_READY")
    assert os.path.exists(marker)
    stamp = os.path.getmtime(os.path.join(root, "_READY"))
    p2 = bench_pipeline.prepare_fixtures(spark, SF_DIR, root=root)
    assert p1 == p2
    assert os.path.getmtime(marker) == stamp  # no regeneration


def test_incremental_composite_processes_delta_only(spark, tmp_path):
    """pipeline_incremental: watermark-seeded run admits only the
    post-watermark sales slice (a daily-batch analog), still produces a
    valid bronze/silver/gold chain, and processes strictly fewer fact
    rows than full refresh."""
    inputs = bench_pipeline.prepare_fixtures(
        spark, SF_DIR, root=str(tmp_path / "fixtures")
    )
    full = bench_pipeline.run_composite(spark, inputs)
    incr = bench_pipeline.run_incremental(spark, inputs)

    full_total = sum(full.bronze_counts["sales"].values())
    incr_total = sum(incr.bronze_counts["sales"].values())
    assert 0 < incr_total < full_total
    # dims are NOT delta-filtered (only the sales fact has a watermark)
    assert (
        sum(incr.bronze_counts["customer"].values())
        == sum(full.bronze_counts["customer"].values())
    )
    assert incr.gold_counts["sales_enriched"] > 0


def test_derivation_code_change_invalidates_cache_tag(monkeypatch):
    """Round-5 advisor: a path-only cache key served stale fixtures
    after derivation-code edits. The tag must move with this module's
    source."""
    tag1 = bench_pipeline._derivation_fingerprint()
    monkeypatch.setattr(
        bench_pipeline.inspect,
        "getsource",
        lambda m: "def _sales_source(): pass  # edited",
    )
    assert bench_pipeline._derivation_fingerprint() != tag1
