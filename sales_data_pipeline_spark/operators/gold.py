"""Gold layer: denormalized fact + customer metrics + legacy marts.

Reference: /root/reference/src/main/gold/sales_gold.py,
customer_metrics_gold.py, and the legacy mart jobs under
src/main/transformations/jobs/ (SURVEY §2.3-2.5, §3.2).

Scale posture: dimension joins use the size-gated broadcast
(scale.gated_broadcast — fact never shuffles for the star join while a
dim is provably small on disk; at scales where customer/product grow
past the cap the hint disappears and Catalyst/AQE degrades the join to
sort-merge instead of OOMing on a forced broadcast); the metrics
aggregate is one shuffle on customer_id with map-side partial
aggregation; marts reuse the same grouped shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sales_data_pipeline_spark.scale import gated_broadcast
from sales_data_pipeline_spark.schemas import (
    GOLD_CUSTOMER_METRICS_COLUMNS,
    GOLD_SALES_ENRICHED_COLUMNS,
)


def build_sales_enriched(
    sales_df: DataFrame,
    customer_df: DataFrame,
    product_df: DataFrame,
    store_df: DataFrame,
) -> DataFrame:
    """Star join fact -> 3 dims + fixed projection (sales_gold.py:6-67)."""
    s = sales_df.alias("s")
    c = gated_broadcast(customer_df).alias("c")
    p = gated_broadcast(product_df).alias("p")
    st = gated_broadcast(store_df).alias("st")
    enriched = (
        s.join(c, F.col("s.customer_id") == F.col("c.customer_id"), "inner")
        .join(p, F.col("s.product_id") == F.col("p.product_id"), "inner")
        .join(st, F.col("s.store_id") == F.col("st.store_id"), "inner")
    )
    gold = enriched.select(
        F.col("s.sales_date"),
        F.col("s.sales_year"),
        F.col("s.sales_month"),
        F.col("s.customer_id"),
        F.concat_ws(" ", F.col("c.first_name"), F.col("c.last_name")).alias(
            "customer_name"
        ),
        F.col("c.city").alias("customer_city"),
        F.col("c.state").alias("customer_state"),
        F.col("s.product_id"),
        F.col("p.product_name"),
        F.col("p.category"),
        F.col("p.brand"),
        F.col("s.store_id"),
        F.col("st.store_name"),
        F.col("st.city").alias("store_city"),
        F.col("st.state").alias("store_state"),
        F.col("s.quantity"),
        F.col("s.price"),
        F.col("s.total_cost"),
    )
    assert gold.columns == GOLD_SALES_ENRICHED_COLUMNS
    return gold


def build_customer_metrics(
    gold_sales_df: DataFrame, customer_df: DataFrame
) -> DataFrame:
    """Per-customer behavioral metrics + dim join
    (customer_metrics_gold.py:12-66).

    Money aggregates accumulate CENTS-INTEGERS (floor(x*100+0.5) per
    row, exact int64 sum, divide once) instead of the reference's
    float SUM/AVG: a float sum's low bits depend on partial-aggregation
    order, which on a cluster changes run to run (and diverged from the
    oracle by one cent at the 10x scale point). Integer accumulation
    makes the metric deterministic at any scale/partitioning; values
    differ from the reference's by at most the float error it already
    carried (< a cent)."""
    cents = F.floor(F.col("total_cost") * 100 + F.lit(0.5)).cast("long")
    agg = gold_sales_df.groupBy("customer_id").agg(
        F.count("*").alias("total_orders"),
        F.sum("quantity").alias("total_quantity"),
        (F.sum(cents) / 100.0).alias("total_spent"),
        (F.sum(cents) / 100.0 / F.count("*")).alias("avg_order_value"),
        F.min("sales_date").alias("first_purchase_date"),
        F.max("sales_date").alias("last_purchase_date"),
    )
    return (
        agg.join(gated_broadcast(customer_df), on="customer_id", how="inner")
        .select(*GOLD_CUSTOMER_METRICS_COLUMNS)
    )


def build_customer_mart(gold_sales_df: DataFrame, customer_df: DataFrame) -> DataFrame:
    """Legacy customers_data_mart: per-(customer, month) totals
    (jobs/customer_mart_sql_tranform_write.py:10-19).

    The reference computes a whole-partition window sum then DISTINCT —
    semantically a groupBy, which is what we run (one shuffle instead of
    window-sort + distinct's second shuffle). full_name uses concat
    (NULL-propagating), unlike gold's concat_ws — preserved.
    """
    enriched = gold_sales_df.join(
        gated_broadcast(
            customer_df.select(
                "customer_id", "first_name", "last_name", "address", "phone_number"
            )
        ),
        on="customer_id",
        how="inner",
    )
    return (
        enriched.withColumn(
            "sales_date_month", F.substring(F.col("sales_date").cast("string"), 1, 7)
        )
        .groupBy(
            "customer_id",
            F.concat(F.col("first_name"), F.lit(" "), F.col("last_name")).alias(
                "full_name"
            ),
            "address",
            "phone_number",
            "sales_date_month",
        )
        .agg(
            (F.sum(
                F.floor(F.col("total_cost") * 100 + F.lit(0.5)).cast("long")
            ) / 100.0).alias("total_sales")
        )
    )


def build_sales_team_mart(
    sales_df: DataFrame,
    sales_team_df: DataFrame,
    incentive_rate: float = 0.01,
) -> DataFrame:
    """The declared-but-unimplemented sales_team_data_mart
    (resources/sql_scripts/table_scripts.sql:152-160): per-salesperson
    monthly totals + derived incentive. Shape follows the customers
    mart; incentive = rate * monthly total (capability implied by the
    reference's DDL `incentive` column; SURVEY §3.2).
    """
    monthly = (
        sales_df.withColumn(
            "sales_month", F.substring(F.col("sales_date").cast("string"), 1, 7)
        )
        .groupBy("sales_person_id", "sales_month")
        # cents-integer accumulation (see build_customer_metrics): the
        # float sum's partial-agg order drifted the 4th incentive
        # decimal vs the oracle at the 10x scale point
        .agg(
            (F.sum(
                F.floor(F.col("total_cost") * 100 + F.lit(0.5)).cast("long")
            ) / 100.0).alias("total_sales")
        )
        .withColumn("incentive", F.col("total_sales") * F.lit(incentive_rate))
    )
    team = gated_broadcast(
        sales_team_df.select(
            F.col("id").alias("sales_person_id"),
            F.concat_ws(" ", F.col("first_name"), F.col("last_name")).alias(
                "full_name"
            ),
        )
    )
    return monthly.join(team, on="sales_person_id", how="inner").select(
        "sales_person_id", "full_name", "sales_month", "total_sales", "incentive"
    )


def enrich_with_sales_team(
    sales_df: DataFrame,
    customer_df: DataFrame,
    store_df: DataFrame,
    sales_team_df: DataFrame,
) -> DataFrame:
    """Legacy 3-way enrichment join (jobs/dimension_tables_join.py:16-53):
    fact -> customer (customer_id) -> store (store.id==store_id) ->
    sales_team (st.id==sales_person_id), with sales-person columns
    renamed. All dims broadcast."""
    joined = (
        sales_df.alias("s")
        .join(gated_broadcast(customer_df).alias("c"), on="customer_id", how="inner")
        .join(
            gated_broadcast(store_df).alias("store"),
            F.col("store.store_id") == F.col("s.store_id"),
            "inner",
        )
        .join(
            gated_broadcast(sales_team_df).alias("st"),
            F.col("st.id") == F.col("s.sales_person_id"),
            "inner",
        )
    )
    return joined.select(
        F.col("s.*"),
        F.col("c.first_name").alias("customer_first_name"),
        F.col("c.last_name").alias("customer_last_name"),
        F.col("store.store_name"),
        F.col("st.first_name").alias("sales_person_first_name"),
        F.col("st.last_name").alias("sales_person_last_name"),
        F.col("st.address").alias("sales_person_address"),
        F.col("st.pincode").alias("sales_person_pincode"),
    )


def merge_customer_metrics(old: DataFrame, delta: DataFrame) -> DataFrame:
    """Incrementally maintain a per-customer metrics table: merge a
    pre-aggregated delta batch into the existing metrics WITHOUT
    re-reading history — the materialized-view maintenance pattern that
    replaces a full gold rebuild at 100 TB (only the delta is scanned;
    the merge is one full-outer join of two aggregate-sized tables).

    Both inputs carry the same schema: a key column plus mergeable
    accumulators — ``n_orders`` (count), ``total_cents`` (exact scaled
    integer sum — floats would drift under re-aggregation), and
    ``first_order`` / ``last_order`` date bounds. Associativity of the
    accumulators makes the merge exact: merging any partition of the
    history yields bit-identical results to one global aggregate
    (oracle-verified by ``incremental_metrics_merge``).

    Extends the reference's full-refresh-only gold build
    (/root/reference/src/main/gold/customer_metrics_gold.py:26-37),
    whose incremental mode re-aggregates everything each run.
    """
    o, d = old.alias("o"), delta.alias("d")
    key = F.coalesce(F.col("o.custkey"), F.col("d.custkey"))
    zero = F.lit(0).cast("bigint")
    return o.join(d, F.col("o.custkey") == F.col("d.custkey"), "full_outer").select(
        key.alias("custkey"),
        (
            F.coalesce(F.col("o.n_orders"), zero)
            + F.coalesce(F.col("d.n_orders"), zero)
        ).alias("n_orders"),
        (
            F.coalesce(F.col("o.total_cents"), zero)
            + F.coalesce(F.col("d.total_cents"), zero)
        ).alias("total_cents"),
        F.least(F.col("o.first_order"), F.col("d.first_order")).alias(
            "first_order"
        ),
        F.greatest(F.col("o.last_order"), F.col("d.last_order")).alias(
            "last_order"
        ),
    )


def aggregate_order_metrics(orders: DataFrame) -> DataFrame:
    """One batch's worth of mergeable per-customer accumulators (the
    map side of merge_customer_metrics)."""
    return orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count("*").alias("n_orders"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("total_cents"),
        F.min(F.to_date("o_orderdate")).alias("first_order"),
        F.max(F.to_date("o_orderdate")).alias("last_order"),
    )
