"""Serving layer: the dashboard query surface (reference §3.3).

The reference's Streamlit dashboard bypasses Spark (boto3 + pandas,
/root/reference/dashboard.py:84-281); here the same workload is served
by the engine itself: gold tables registered as temp views, each
dashboard panel a parameterized Spark SQL query. Storage stays the
interface (any BI tool can read the same parquet), but the queries are
engine-side so filters push down and only aggregates leave the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GOLD_VIEW = "gold_sales_enriched"
METRICS_VIEW = "gold_customer_metrics"


def register_gold_views(spark: SparkSession, gold_root: str) -> None:
    spark.read.parquet(f"{gold_root}/sales_enriched").createOrReplaceTempView(
        GOLD_VIEW
    )
    spark.read.parquet(f"{gold_root}/customer_metrics").createOrReplaceTempView(
        METRICS_VIEW
    )


def _filtered(
    spark: SparkSession,
    states: list[str] | None = None,
    categories: list[str] | None = None,
    brands: list[str] | None = None,
) -> DataFrame:
    """Multiselect filter pushdown (dashboard.py:161-183): empty
    selection = no filter, else IN-list — both prune partitions/row
    groups at the scan."""
    df = spark.table(GOLD_VIEW)
    if states:
        df = df.filter(F.col("customer_state").isin(*states))
    if categories:
        df = df.filter(F.col("category").isin(*categories))
    if brands:
        df = df.filter(F.col("brand").isin(*brands))
    return df


def kpis(spark: SparkSession, **filters) -> DataFrame:
    """Headline KPI row (dashboard.py:131-136): revenue, orders,
    customers, avg order value — one aggregation pass."""
    return _filtered(spark, **filters).agg(
        F.sum("total_cost").alias("total_revenue"),
        F.count("*").alias("total_orders"),
        F.countDistinct("customer_id").alias("unique_customers"),
        F.avg("total_cost").alias("avg_order_value"),
    )


def revenue_by(spark: SparkSession, dim: str, **filters) -> DataFrame:
    """Revenue grouped by any gold dimension (product_name, category,
    store_name, brand, customer_state — dashboard.py:192-281)."""
    return (
        _filtered(spark, **filters)
        .groupBy(dim)
        .agg(F.sum("total_cost").alias("revenue"))
        .orderBy(F.desc("revenue"), F.col(dim))
    )


def top_customers(spark: SparkSession, n: int = 10) -> DataFrame:
    """Top-n by lifetime spend (dashboard.py:222-227) — served from the
    precomputed metrics table, not a fact rescan."""
    m = spark.table(METRICS_VIEW)
    return m.orderBy(F.desc("total_spent"), F.col("customer_id")).limit(n)
