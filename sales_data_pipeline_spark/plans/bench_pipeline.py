"""Bench composite: the reference's ACTUAL SLA workload, end-to-end.

The reference's published envelope is "~400 k fact rows through
bronze -> silver (+SCD2) -> gold inside a 30-minute SLA"
(/root/reference/src/main/main.py:27-601 orchestration; BASELINE.md).
bench.py's per-stage rows (scd2_merge_history, gold_customer_metrics,
silver_customer_transform) time the stages in isolation; this module
times the WHOLE runner — CSV ingest, rejection split, bronze writes,
silver transforms, SCD2 merge, gold star join + metrics, all sinks —
as one `pipeline_end_to_end` number.

Fixture derivation (UNTIMED, cached per sf_dir under /tmp): the driver
parquet tables are re-shaped into the reference's four CSV sources with
deterministic ~7% dirt injection (null customer/store/date, negative
price, zero quantity — FIXTURES.md §1's five rejection reasons), so the
timed run exercises the same validation/rejection surface the reference
does, at the bench's data scale (sf0.1 lineitem ~600 k rows > the
reference's 400 k/day envelope).
"""

from __future__ import annotations

import hashlib
import inspect
import os
import re
import shutil
import sys
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_spark.plans.runner import (
    PipelineConfig,
    PipelineMetrics,
    run_pipeline,
)

_ENTITIES = ("sales", "customer", "product", "store")


def _dirt(col_expr, seed: str):
    """Deterministic per-row dirt selector in [0, 100)."""
    return F.pmod(F.xxhash64(col_expr, F.lit(seed)), F.lit(100))


def _sales_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # fact ⋈ fact: force sort-merge. The engine session's 100 MB
    # autoBroadcast threshold sizes the PRUNED orders scan (3 of 9
    # columns), which stays under 100 MB compressed well past sf10
    # while the decoded 15 M-row hash table is multi-GB — at sf10 the
    # auto-chosen broadcast OOMs the build side. Orders grows with the
    # fact volume, so no broadcast is correct at every scale.
    j = li.join(o.hint("shuffle_merge"), li.l_orderkey == o.o_orderkey)
    d = _dirt(F.concat_ws("-", "l_orderkey", "l_linenumber"), "sales")
    price = F.round(F.col("l_extendedprice") / F.col("l_quantity"), 2)
    return j.select(
        F.when(d < 2, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .cast("int")
        .alias("customer_id"),
        F.when((d >= 2) & (d < 4), F.lit(None))
        .otherwise(F.pmod("l_suppkey", F.lit(97)) + 1)
        .cast("int")
        .alias("store_id"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("product_name"),
        F.when((d >= 4) & (d < 5), F.lit(None))
        .otherwise(F.to_date("o_orderdate"))
        .alias("sales_date"),
        F.when((d >= 2) & (d < 4), F.lit(None))
        .otherwise(F.pmod("l_suppkey", F.lit(499)) + 1)
        .cast("int")
        .alias("sales_person_id"),
        F.when((d >= 5) & (d < 6), -price).otherwise(price).alias("price"),
        F.when((d >= 6) & (d < 7), F.lit(0))
        .otherwise(F.col("l_quantity"))
        .cast("int")
        .alias("quantity"),
        (price * F.col("l_quantity")).alias("total_cost"),
    )


def _customer_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    return c.select(
        k.cast("int").alias("customer_id"),
        F.concat(F.lit("fn"), k).alias("first_name"),
        F.concat(F.lit("ln"), k).alias("last_name"),
        # ~10% invalid emails: silver's contains("@") gate drops them,
        # exercising the gold join-rate check like the reference corpus
        F.when(F.pmod(k, F.lit(10)) == 0, F.lit("invalid_email"))
        .otherwise(F.concat(F.lit("c"), k, F.lit("@example.com")))
        .alias("email"),
        (F.lit(5_000_000_000) + k).cast("string").alias("phone_number"),
        F.to_date(F.lit("1980-01-15")).alias("date_of_birth"),
        F.element_at(
            F.array(F.lit("M"), F.lit("F"), F.lit("O")),
            (F.pmod(k, F.lit(3)) + 1).cast("int"),
        ).alias("gender"),
        F.col("c_name").alias("address"),
        F.concat(F.lit("city"), F.col("c_nationkey")).alias("city"),
        F.concat(F.lit("st"), F.col("c_nationkey")).alias("state"),
        F.lpad(F.pmod(k, F.lit(900_000)).cast("string"), 6, "0").alias(
            "pincode"
        ),
        F.to_date(F.lit("2024-01-01")).alias("created_date"),
        F.to_date(F.lit("2024-02-01")).alias("updated_date"),
    )


def _product_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    return p.select(
        F.col("p_partkey").cast("int").alias("product_id"),
        F.concat(F.lit("p"), F.col("p_partkey")).alias("product_name"),
        F.col("p_type").alias("category"),
        F.col("p_brand").alias("brand"),
        F.col("p_retailprice").alias("current_price"),
        F.round(F.col("p_retailprice") * 0.9, 2).alias("old_price"),
        F.to_date(F.lit("2024-01-01")).alias("created_date"),
        F.to_date(F.lit("2024-02-01")).alias("updated_date"),
        F.lit(None).cast("date").alias("expiry_date"),
        F.lit(True).alias("is_active"),
    )


def _store_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sales.store_id = (l_suppkey % 97) + 1, so 97 stores covers every
    # non-null fact row
    s = spark.range(1, 98)
    return s.select(
        F.col("id").cast("int").alias("store_id"),
        F.concat(F.lit("store"), F.col("id")).alias("store_name"),
        F.concat(F.lit("addr"), F.col("id")).alias("address"),
        F.concat(F.lit("city"), F.pmod("id", F.lit(25))).alias("city"),
        F.concat(F.lit("st"), F.pmod("id", F.lit(25))).alias("state"),
        F.lpad((F.col("id") * 101).cast("string"), 6, "0").alias("pincode"),
        F.concat(F.lit("mgr"), F.col("id")).alias("store_manager_name"),
        F.to_date(F.lit("2020-01-01")).alias("store_opening_date"),
        F.lit(None).cast("date").alias("store_closing_date"),
        F.lit("good").alias("reviews"),
    )


_SOURCES = {
    "sales": _sales_source,
    "customer": _customer_source,
    "product": _product_source,
    "store": _store_source,
}


def _derivation_fingerprint() -> str:
    """Short hash of THIS module's source: folded into the fixture
    cache tag so an edit to the dirt-injection / source-derivation code
    invalidates the cache instead of silently serving stale CSVs (the
    round-5 advisor flagged the path-only key as exactly the staleness
    class the repo fights elsewhere)."""
    src = inspect.getsource(sys.modules[__name__])
    return hashlib.sha256(src.encode("utf-8")).hexdigest()[:12]


def prepare_fixtures(
    spark: SparkSession, sf_dir: str, root: str | None = None
) -> dict[str, str]:
    """Materialize the four reference-shaped CSV sources (cached: a
    _READY marker skips regeneration — the derivation is deterministic
    per (sf_dir, derivation-code) pair). Returns the runner's
    input_paths."""
    if root is None:
        tag = re.sub(r"[^A-Za-z0-9.]+", "_", sf_dir.strip("/"))
        root = os.path.join(
            tempfile.gettempdir(),
            "spark_graft_pipeline_fixtures",
            f"{tag}-{_derivation_fingerprint()}",
        )
    marker = os.path.join(root, "_READY")
    paths = {e: os.path.join(root, f"{e}.csv") for e in _ENTITIES}
    if not os.path.exists(marker):
        for entity, build in _SOURCES.items():
            build(spark, sf_dir).write.mode("overwrite").option(
                "header", "true"
            ).csv(paths[entity])
        with open(marker, "w") as f:
            f.write("ok\n")
    return paths


def run_composite(
    spark: SparkSession, input_paths: dict[str, str]
) -> PipelineMetrics:
    """One full_refresh bronze->silver->SCD2->gold run into a FRESH
    output dir (removed afterwards) — the timed unit for the
    pipeline_end_to_end bench row."""
    out = tempfile.mkdtemp(prefix="spark_graft_pipeline_out_")
    try:
        cfg = PipelineConfig(
            input_paths=dict(input_paths),
            output_root=out,
            as_of_date="2024-06-01",
            mode="full_refresh",
        )
        return run_pipeline(spark, cfg)
    finally:
        shutil.rmtree(out, ignore_errors=True)


# The reference's DAILY operating mode is incremental (watermark read
# -> filtered delta batch -> watermark update), not full refresh; the
# delta admitted by this seed is the last ~3 months of the TPC-H
# sales_date range (o_orderdate ends 1998-08-02) — a realistic
# daily-batch fraction of the corpus.
INCREMENTAL_SEED_WATERMARK = "1998-05-01 00:00:00"


def run_incremental(
    spark: SparkSession, input_paths: dict[str, str]
) -> PipelineMetrics:
    """One INCREMENTAL bronze->silver->SCD2->gold run: the watermark
    store is pre-seeded so the sales read is delta-filtered, and the
    run finishes with the watermark update (I1-I3) — the timed unit
    for the pipeline_incremental bench row. Fresh output + watermark
    dirs per call (removed afterwards) so repeat timings are
    identical work."""
    from sales_data_pipeline_spark.incremental.watermark import (
        WatermarkManager,
    )

    out = tempfile.mkdtemp(prefix="spark_graft_pipeline_incr_out_")
    wm_dir = tempfile.mkdtemp(prefix="spark_graft_pipeline_wm_")
    try:
        WatermarkManager(
            "sales", f"{wm_dir}/sales_watermark.json"
        ).update_watermark(INCREMENTAL_SEED_WATERMARK)
        cfg = PipelineConfig(
            input_paths=dict(input_paths),
            output_root=out,
            as_of_date="2024-06-01",
            mode="incremental",
            watermark_dir=wm_dir,
        )
        return run_pipeline(spark, cfg)
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(wm_dir, ignore_errors=True)
