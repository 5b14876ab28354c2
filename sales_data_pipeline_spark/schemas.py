"""Explicit schemas — the engine's type contracts.

The reference reads every CSV with ``inferSchema=true``
(/root/reference/src/main/read/read_csv.py:28-33), which makes types
data-dependent (SURVEY §7.4 risk 4: ``pincode`` can flip int/string).
This engine locks every entity to an explicit ``StructType`` derived
from the reference's DDL (/root/reference/resources/sql_scripts/
table_scripts.sql) and its silver "schema lock" selects.

Also documents the driver testdata (TPC-H-ish) table schemas so query
code can reference column sets without re-reading parquet footers.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference source entities (FIXTURES.md §1-5). pincode/phone stay string
# per DDL (table_scripts.sql:16-17).
# ---------------------------------------------------------------------------

SALES_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.IntegerType(), True),
        T.StructField("store_id", T.IntegerType(), True),
        T.StructField("product_name", T.StringType(), True),
        T.StructField("sales_date", T.DateType(), True),
        T.StructField("sales_person_id", T.IntegerType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("total_cost", T.DoubleType(), True),
    ]
)

CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.IntegerType(), True),
        T.StructField("first_name", T.StringType(), True),
        T.StructField("last_name", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("phone_number", T.StringType(), True),
        T.StructField("date_of_birth", T.DateType(), True),
        T.StructField("gender", T.StringType(), True),
        T.StructField("address", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("state", T.StringType(), True),
        T.StructField("pincode", T.StringType(), True),
        T.StructField("created_date", T.DateType(), True),
        T.StructField("updated_date", T.DateType(), True),
    ]
)

PRODUCT_SCHEMA = T.StructType(
    [
        T.StructField("product_id", T.IntegerType(), True),
        T.StructField("product_name", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("brand", T.StringType(), True),
        T.StructField("current_price", T.DoubleType(), True),
        T.StructField("old_price", T.DoubleType(), True),
        T.StructField("created_date", T.DateType(), True),
        T.StructField("updated_date", T.DateType(), True),
        T.StructField("expiry_date", T.DateType(), True),
        T.StructField("is_active", T.BooleanType(), True),
    ]
)

STORE_SCHEMA = T.StructType(
    [
        T.StructField("store_id", T.IntegerType(), True),
        T.StructField("store_name", T.StringType(), True),
        T.StructField("address", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("state", T.StringType(), True),
        T.StructField("pincode", T.StringType(), True),
        T.StructField("store_manager_name", T.StringType(), True),
        T.StructField("store_opening_date", T.DateType(), True),
        T.StructField("store_closing_date", T.DateType(), True),
        T.StructField("reviews", T.StringType(), True),
    ]
)

SALES_TEAM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), True),
        T.StructField("first_name", T.StringType(), True),
        T.StructField("last_name", T.StringType(), True),
        T.StructField("manager_id", T.IntegerType(), True),
        T.StructField("is_manager", T.StringType(), True),
        T.StructField("address", T.StringType(), True),
        T.StructField("pincode", T.StringType(), True),
        T.StructField("joining_date", T.DateType(), True),
    ]
)

SOURCE_SCHEMAS = {
    "sales": SALES_SCHEMA,
    "customer": CUSTOMER_SCHEMA,
    "product": PRODUCT_SCHEMA,
    "store": STORE_SCHEMA,
    "sales_team": SALES_TEAM_SCHEMA,
}

# ---------------------------------------------------------------------------
# Layer contracts (FIXTURES.md §6) — the frozen output column lists each
# transform must end with (reference "schema lock" pattern, SURVEY §1.3).
# ---------------------------------------------------------------------------

SILVER_SALES_COLUMNS = [
    "customer_id",
    "product_id",
    "store_id",
    "sales_person_id",
    "sales_date",
    "sales_year",
    "sales_month",
    "quantity",
    "price",
    "total_cost",
]

SCD2_TRACKED_COLUMNS = [
    # /root/reference/src/main/transformations/scd_customer_transform.py:32-41
    "first_name",
    "last_name",
    "email",
    "phone_number",
    "city",
    "state",
    "address",
    "pincode",
]

SILVER_CUSTOMER_COLUMNS = [
    "customer_id",
    "first_name",
    "last_name",
    "email",
    "phone_number",
    "date_of_birth",
    "gender",
    "address",
    "city",
    "state",
    "pincode",
]

SCD2_COLUMNS = SILVER_CUSTOMER_COLUMNS + [
    "valid_from",
    "valid_to",
    "is_current",
    "row_hash",
]

SILVER_PRODUCT_COLUMNS = [
    # product_transform.py:82-94 keeps ingestion_date in the silver contract
    "product_id",
    "product_name",
    "category",
    "brand",
    "current_price",
    "old_price",
    "created_date",
    "updated_date",
    "expiry_date",
    "is_active",
    "ingestion_date",
]

SILVER_STORE_COLUMNS = [
    "store_id",
    "store_name",
    "address",
    "city",
    "state",
    "pincode",
    "store_manager_name",
    "store_opening_date",
    "store_closing_date",
    "is_active",
]

GOLD_SALES_ENRICHED_COLUMNS = [
    "sales_date",
    "sales_year",
    "sales_month",
    "customer_id",
    "customer_name",
    "customer_city",
    "customer_state",
    "product_id",
    "product_name",
    "category",
    "brand",
    "store_id",
    "store_name",
    "store_city",
    "store_state",
    "quantity",
    "price",
    "total_cost",
]

GOLD_CUSTOMER_METRICS_COLUMNS = [
    "customer_id",
    "first_name",
    "last_name",
    "city",
    "state",
    "total_orders",
    "total_quantity",
    "total_spent",
    "avg_order_value",
    "first_purchase_date",
    "last_purchase_date",
]

# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md) — names only; parquet self-describes.
# ---------------------------------------------------------------------------

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
