"""Time-series catalog queries: as-of join, range join, range-frame
windows, ntile — operators beyond the reference surface that a
time-aware analytics engine needs (operators/timeseries.py).

DuckDB expresses as-of/range joins natively (ASOF JOIN, inequality
join), which makes it a strong oracle for our composed-from-builtins
Spark formulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sales_data_pipeline_spark.operators import timeseries
from sales_data_pipeline_spark.queries.base import query, table

SEVEN_DAYS_US = 7 * 86400 * 1_000_000


@query(
    "asof_join_purchase_view",
    oracle="""
        SELECT l.event_id, l.user_id, l.ts, l.value,
               r.ts AS asof_ts, r.value AS asof_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    survey="timeseries-ext: as-of join (operators/timeseries.py)",
    doc="Each purchase attaches the user's most recent prior-or-equal "
    "view. Spark side is the union+window formulation (ONE shuffle, no "
    "join, no candidate pairs); oracle is DuckDB's native ASOF JOIN.",
    tags=("timeseries",),
)
def asof_join_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    out = timeseries.asof_join(
        purchases, views, on="user_id", value_cols=["value"]
    )
    return out.select(
        "event_id", "user_id", "ts", "value", "asof_ts", "asof_value"
    )


@query(
    "range_join_error_clicks",
    oracle="""
        SELECT l.user_id, l.ts,
               CAST(count(r.ts) AS BIGINT) AS n_in_range
        FROM (SELECT * FROM events WHERE event_type = 'error') l
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
          ON l.user_id = r.user_id
          AND epoch_us(r.ts) > epoch_us(l.ts) - 3600000000
          AND epoch_us(r.ts) <= epoch_us(l.ts)
        GROUP BY 1, 2
    """,
    survey="timeseries-ext: range join (operators/timeseries.py)",
    doc="Clicks within the hour before each error, per user. Spark side "
    "bucketizes into 1h epoch bands and equi-joins on (user, band) — "
    "bounded 2-bucket fan-out instead of an inequality join.",
    tags=("timeseries",),
)
def range_join_error_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    return timeseries.range_join_count(
        errors, clicks, on="user_id", lookback_seconds=3600
    )


@query(
    "rolling_7d_user_value",
    oracle="""
        SELECT event_id, user_id, ts,
               SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW
               ) / 100.0 AS rolling_value
        FROM events
    """,
    survey="timeseries-ext: range-frame window (SURVEY §2.5 gap)",
    doc="7-day trailing per-user value sum via a RANGE frame over "
    "microsecond event time. Cents-integer accumulation inside the "
    "frame keeps the windowed sum exact on both engines.",
    tags=("timeseries",),
)
def rolling_7d_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-SEVEN_DAYS_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).over(w)
            / 100.0
        ).alias("rolling_value"),
    )


@query(
    "ntile_customer_quartiles",
    oracle="""
        SELECT c_custkey,
               CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey)
                 AS INTEGER) AS quartile
        FROM customer
    """,
    survey="timeseries-ext: ntile ranking (SURVEY §2.5 gap)",
    doc="Balance quartiles with a total-order tiebreak (ntile over a "
    "non-unique key is partition-order nondeterminism otherwise).",
    tags=("timeseries",),
)
def ntile_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    w = W.orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    return c.select("c_custkey", F.ntile(4).over(w).alias("quartile"))
