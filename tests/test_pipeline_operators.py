"""Unit tests for the medallion pipeline operators (bronze split, silver
transforms, SCD2 merge, gold builds, quality compiler, watermark state).

Fixture rows mirror the reference's synthetic dirty-data generators
(/root/reference/src/test/generate_*.py — nulls, negatives, duplicate
ids, clamp violations) so the semantics covered here are the ones the
reference exercises in production.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sales_data_pipeline_spark.operators import bronze, gold, scd2, silver
from sales_data_pipeline_spark.quality import compiler
from sales_data_pipeline_spark.schemas import (
    CUSTOMER_SCHEMA,
    GOLD_SALES_ENRICHED_COLUMNS,
    PRODUCT_SCHEMA,
    SALES_SCHEMA,
    SILVER_CUSTOMER_COLUMNS,
    SILVER_PRODUCT_COLUMNS,
    SILVER_SALES_COLUMNS,
    SILVER_STORE_COLUMNS,
    STORE_SCHEMA,
)

AS_OF = dt.date(2024, 6, 1)
D = dt.date


def _sales_rows():
    # (customer_id, store_id, product_name, sales_date, sales_person_id,
    #  price, quantity, total_cost)
    return [
        (1, 10, "Widget", D(2024, 3, 1), 100, 5.0, 2, 10.0),  # valid
        (None, 10, "Widget", D(2024, 3, 1), 100, 5.0, 2, 10.0),  # null cust
        (2, None, "Widget", D(2024, 3, 2), 100, 5.0, 2, 10.0),  # null store
        (3, 11, "Gadget", None, 101, 5.0, 2, 10.0),  # null date
        (4, 11, "Gadget", D(2024, 3, 3), 101, -1.0, 2, -2.0),  # bad price
        (5, 11, "Gadget", D(2024, 3, 4), 101, 5.0, 0, 0.0),  # bad qty
        # fails BOTH customer and price rules -> first label wins
        (None, 12, "Widget", D(2024, 3, 5), 102, -9.0, 1, -9.0),
    ]


class TestBronzeSplit:
    def test_split_counts_and_first_match_wins(self, spark):
        df = bronze.stamp_ingestion(
            spark.createDataFrame(_sales_rows(), SALES_SCHEMA), AS_OF
        )
        valid, rejected = bronze.split_valid_rejected(
            df, bronze.sales_validity_rules()
        )
        assert valid.count() == 1
        rej = {
            (r["customer_id"], r["store_id"]): r[bronze.REJECTION_REASON]
            for r in rejected.collect()
        }
        assert len(rej) == 6
        assert rej[(None, 10)] == "NULL_CUSTOMER_ID"
        assert rej[(2, None)] == "NULL_STORE_ID"
        assert rej[(3, 11)] == "NULL_SALES_DATE"
        assert rej[(4, 11)] == "INVALID_PRICE"
        assert rej[(5, 11)] == "INVALID_QUANTITY"
        # multi-failure row: ordered chain gives the FIRST failing label
        assert rej[(None, 12)] == "NULL_CUSTOMER_ID"

    def test_ingestion_date_stamped(self, spark):
        df = bronze.stamp_ingestion(
            spark.createDataFrame(_sales_rows()[:1], SALES_SCHEMA), AS_OF
        )
        assert df.select(bronze.INGESTION_DATE).first()[0] == AS_OF

    def test_rejection_summary_one_pass(self, spark):
        df = spark.createDataFrame(_sales_rows(), SALES_SCHEMA)
        summary = {
            r["reason"]: r["n"]
            for r in bronze.rejection_summary(
                df, bronze.sales_validity_rules()
            ).collect()
        }
        assert summary["VALID"] == 1
        assert summary["NULL_CUSTOMER_ID"] == 2
        assert sum(summary.values()) == len(_sales_rows())


class TestSilverTransforms:
    def test_sales_join_derive_gate(self, spark):
        sales = spark.createDataFrame(
            [
                (1, 10, "  WIDGET ", D(2024, 3, 1), 100, "5.5", "2", None),
                (2, 10, "unknown product", D(2024, 3, 1), 100, "5.5", "2", None),
                (3, 10, "widget", D(2024, 3, 2), 100, "-4", "2", None),
            ],
            "customer_id int, store_id int, product_name string, "
            "sales_date date, sales_person_id int, price string, "
            "quantity string, total_cost double",
        )
        products = spark.createDataFrame(
            [(7, "Widget ")],
            "product_id int, product_name string",
        )
        out = silver.transform_sales(sales, products)
        rows = out.collect()
        assert out.columns == SILVER_SALES_COLUMNS
        assert len(rows) == 1  # unmatched name drops; negative price gated
        r = rows[0]
        assert (r.product_id, r.total_cost, r.sales_year, r.sales_month) == (
            7,
            11.0,
            2024,
            3,
        )

    def test_customer_clean_gate_dedup(self, spark):
        base = dict(
            first_name=" Ada ",
            last_name="LOVELACE",
            date_of_birth=D(1990, 1, 1),
            gender="F",
            address="1 Row St",
            city="London",
            state="LDN",
            pincode="123456",
            created_date=D(2024, 1, 10),
        )
        rows = [
            # two versions of id=1: later updated_date must win
            Row(
                customer_id=1,
                email="A@x.com",
                phone_number="(555) 123-4567x",
                updated_date=D(2024, 2, 1),
                ingestion_date=D(2024, 2, 1),
                **base,
            ),
            Row(
                customer_id=1,
                email="new@x.com",
                phone_number="555",
                updated_date=D(2024, 3, 1),
                ingestion_date=D(2024, 3, 1),
                **base,
            ),
            # updated < created: clamped to created
            Row(
                customer_id=2,
                email="b@x.com",
                phone_number="5551234567",
                updated_date=D(2023, 12, 1),
                ingestion_date=D(2024, 1, 1),
                **base,
            ),
            # bad email (no @): gated out
            Row(
                customer_id=3,
                email="no-at-sign",
                phone_number=None,
                updated_date=D(2024, 2, 1),
                ingestion_date=D(2024, 2, 1),
                **base,
            ),
            # null id: gated out
            Row(
                customer_id=None,
                email="d@x.com",
                phone_number=None,
                updated_date=D(2024, 2, 1),
                ingestion_date=D(2024, 2, 1),
                **base,
            ),
        ]
        df = spark.createDataFrame(rows)
        out = silver.transform_customer(df, AS_OF)
        assert out.columns == SILVER_CUSTOMER_COLUMNS
        got = {r.customer_id: r for r in out.collect()}
        assert set(got) == {1, 2}
        # keep-latest by updated_date; normalization applied
        assert got[1].email == "new@x.com"
        assert got[1].first_name == "ada"
        # short phone -> NULL; long phone digits-only
        assert got[1].phone_number is None
        assert got[2].phone_number == "5551234567"

    def test_product_repair_dedup_is_active(self, spark):
        rows = [
            # dup id=1: later updated_date wins; old_price<0 nulled
            (1, "Widget", "cat", "b", 10.0, -5.0, D(2024, 1, 1), D(2024, 2, 1), None, True, D(2024, 2, 1)),
            (1, "Widget", "cat", "b", 12.0, 11.0, D(2024, 1, 1), D(2024, 3, 1), None, True, D(2024, 3, 1)),
            # expired before as_of: is_active re-derived False
            (2, "Old", "cat", "b", 9.0, 9.0, D(2024, 1, 1), D(2024, 1, 2), D(2024, 5, 1), True, D(2024, 1, 2)),
            # non-positive price: dropped
            (3, "Free", "cat", "b", 0.0, None, D(2024, 1, 1), D(2024, 1, 1), None, True, D(2024, 1, 1)),
            # expiry < created: dropped
            (4, "Bad", "cat", "b", 5.0, None, D(2024, 2, 1), D(2024, 2, 1), D(2024, 1, 1), True, D(2024, 2, 1)),
        ]
        schema = PRODUCT_SCHEMA.add("ingestion_date", "date")
        out = silver.transform_product(
            spark.createDataFrame(rows, schema), AS_OF
        )
        assert out.columns == SILVER_PRODUCT_COLUMNS
        got = {r.product_id: r for r in out.collect()}
        assert set(got) == {1, 2}
        assert got[1].current_price == 12.0
        # old_price == current_price would be nulled; 11.0 kept
        assert got[1].old_price == 11.0
        assert got[2].is_active is False

    def test_store_clean_gate_dedup(self, spark):
        rows = [
            # closing < opening: closing nulled -> active
            (1, "S1", "a", "c", "s", "1", "m", D(2020, 1, 1), D(2019, 1, 1), "r", D(2024, 1, 1)),
            # closed before as_of -> inactive
            (2, "S2", "a", "c", "s", "1", "m", D(2020, 1, 1), D(2024, 1, 1), "r", D(2024, 1, 1)),
            # opens after as_of: gated out
            (3, "S3", "a", "c", "s", "1", "m", D(2030, 1, 1), None, "r", D(2024, 1, 1)),
            # dup id=2, later ingestion wins
            (2, "S2-new", "a", "c", "s", "1", "m", D(2020, 1, 1), None, "r", D(2024, 2, 1)),
        ]
        schema = STORE_SCHEMA.add("ingestion_date", "date")
        out = silver.transform_store(spark.createDataFrame(rows, schema), AS_OF)
        assert out.columns == SILVER_STORE_COLUMNS
        got = {r.store_id: r for r in out.collect()}
        assert set(got) == {1, 2}
        assert got[1].store_closing_date is None
        assert got[1].is_active is True
        assert got[2].store_name == "s2-new"
        assert got[2].is_active is True


def _cust(spark, rows):
    cols = (
        "customer_id int, first_name string, last_name string, "
        "email string, phone_number string, city string, state string, "
        "address string, pincode string"
    )
    return spark.createDataFrame(rows, cols)


class TestScd2:
    def test_first_run_then_change_new_delete(self, spark):
        day1 = _cust(
            spark,
            [
                (1, "a", "x", "a@x", "1", "c", "s", "ad", "p"),
                (2, "b", "y", "b@x", "2", "c", "s", "ad", "p"),
                (3, "c", "z", "c@x", "3", "c", "s", "ad", "p"),
            ],
        )
        hist1 = scd2.apply_scd_type2(
            day1.limit(0), day1, "2024-01-01", tracked_cols=scd2_tracked()
        )
        assert hist1.count() == 3
        assert hist1.filter(F.col("is_current")).count() == 3

        # day 2: id=1 changed email, id=4 new, id=3 deleted (absent)
        day2 = _cust(
            spark,
            [
                (1, "a", "x", "A-NEW@x", "1", "c", "s", "ad", "p"),
                (2, "b", "y", "b@x", "2", "c", "s", "ad", "p"),
                (4, "d", "w", "d@x", "4", "c", "s", "ad", "p"),
            ],
        )
        hist2 = scd2.apply_scd_type2(
            hist1, day2, "2024-02-01", tracked_cols=scd2_tracked()
        )
        rows = hist2.collect()
        assert len(rows) == 5  # 3 originals + 1 new version + 1 new key
        by_key = {}
        for r in rows:
            by_key.setdefault(r.customer_id, []).append(r)
        # changed key: old closed with valid_to, new current
        v1 = sorted(by_key[1], key=lambda r: (r.valid_from, r.is_current))
        assert [r.is_current for r in v1] == [False, True]
        assert v1[0].valid_to == D(2024, 2, 1)
        assert v1[1].valid_to is None
        assert v1[1].email == "A-NEW@x"
        # unchanged key: untouched single current row
        assert [r.is_current for r in by_key[2]] == [True]
        assert by_key[2][0].valid_to is None
        # deleted key: passes through untouched
        assert [r.is_current for r in by_key[3]] == [True]
        # new key: one current row stamped with day-2 valid_from
        assert by_key[4][0].valid_from == D(2024, 2, 1)
        assert by_key[4][0].is_current is True

    def test_null_collapse_hash_contract(self, spark):
        # concat_ws skips NULLs: ('a', NULL, 'b') hashes like ('a','b')
        a = _cust(spark, [(1, "a", None, "b", None, None, None, None, None)])
        b = _cust(spark, [(1, "a", "b", None, None, None, None, None, None)])
        ha = a.select(scd2.row_hash(scd2_tracked()).alias("h")).first()[0]
        hb = b.select(scd2.row_hash(scd2_tracked()).alias("h")).first()[0]
        assert ha == hb

    def test_no_change_noop(self, spark):
        day = _cust(spark, [(1, "a", "x", "a@x", "1", "c", "s", "ad", "p")])
        hist1 = scd2.apply_scd_type2(
            day.limit(0), day, "2024-01-01", tracked_cols=scd2_tracked()
        )
        hist2 = scd2.apply_scd_type2(
            hist1, day, "2024-02-01", tracked_cols=scd2_tracked()
        )
        r = hist2.collect()
        assert len(r) == 1
        assert r[0].is_current is True
        assert r[0].valid_from == D(2024, 1, 1)


def scd2_tracked():
    return [
        "first_name",
        "last_name",
        "email",
        "phone_number",
        "city",
        "state",
        "address",
        "pincode",
    ]


class TestGold:
    def _frames(self, spark):
        sales = spark.createDataFrame(
            [
                (1, 7, 10, 100, D(2024, 3, 1), 2024, 3, 2, 5.0, 10.0),
                (1, 7, 10, 100, D(2024, 4, 2), 2024, 4, 1, 5.0, 5.0),
                (2, 7, 10, 101, D(2024, 3, 5), 2024, 3, 3, 5.0, 15.0),
            ],
            "customer_id int, product_id int, store_id int, "
            "sales_person_id int, sales_date date, sales_year int, "
            "sales_month int, quantity int, price double, total_cost double",
        )
        customers = spark.createDataFrame(
            [
                (1, "ada", "lovelace", "a@x", "1", "london", "ldn", "addr", "1"),
                (2, "bob", "byte", "b@x", "2", "paris", "par", "addr", "2"),
            ],
            "customer_id int, first_name string, last_name string, "
            "email string, phone_number string, city string, state string, "
            "address string, pincode string",
        )
        products = spark.createDataFrame(
            [(7, "widget", "tools", "acme")],
            "product_id int, product_name string, category string, brand string",
        )
        stores = spark.createDataFrame(
            [(10, "s1", "rome", "rm")],
            "store_id int, store_name string, city string, state string",
        )
        return sales, customers, products, stores

    def test_star_join_contract(self, spark):
        sales, customers, products, stores = self._frames(spark)
        out = gold.build_sales_enriched(sales, customers, products, stores)
        assert out.columns == GOLD_SALES_ENRICHED_COLUMNS
        rows = out.collect()
        assert len(rows) == 3
        r = [x for x in rows if x.customer_id == 1][0]
        assert r.customer_name == "ada lovelace"
        assert r.store_state == "rm"

    def test_customer_metrics(self, spark):
        sales, customers, products, stores = self._frames(spark)
        enriched = gold.build_sales_enriched(sales, customers, products, stores)
        m = {
            r.customer_id: r
            for r in gold.build_customer_metrics(enriched, customers).collect()
        }
        assert m[1].total_orders == 2
        assert m[1].total_spent == 15.0
        assert m[1].avg_order_value == 7.5
        assert m[1].first_purchase_date == D(2024, 3, 1)
        assert m[1].last_purchase_date == D(2024, 4, 2)
        assert m[2].total_orders == 1

    def test_customer_mart_monthly(self, spark):
        sales, customers, _, _ = self._frames(spark)
        mart = gold.build_customer_mart(
            sales.withColumnRenamed("x", "x"), customers
        )
        got = {
            (r.customer_id, r.sales_date_month): r.total_sales
            for r in mart.collect()
        }
        assert got[(1, "2024-03")] == 10.0
        assert got[(1, "2024-04")] == 5.0
        assert got[(2, "2024-03")] == 15.0

    def test_sales_team_mart_incentive(self, spark):
        sales, *_ = self._frames(spark)
        team = spark.createDataFrame(
            [(100, "sal", "es"), (101, "per", "son")],
            "id int, first_name string, last_name string",
        )
        mart = {
            (r.sales_person_id, r.sales_month): r
            for r in gold.build_sales_team_mart(sales, team).collect()
        }
        assert mart[(100, "2024-03")].total_sales == 10.0
        assert mart[(100, "2024-03")].incentive == pytest.approx(0.1)
        assert mart[(100, "2024-03")].full_name == "sal es"


class TestQualityCompiler:
    SUITE = {
        "expectation_suite_name": "t",
        "expectations": [
            {
                "expectation_type": "expect_table_columns_to_match_set",
                "kwargs": {"column_set": ["id", "price", "email"]},
            },
            {
                "expectation_type": "expect_column_values_to_not_be_null",
                "kwargs": {"column": "id"},
            },
            {
                "expectation_type": "expect_column_values_to_be_between",
                "kwargs": {"column": "price", "min_value": 0, "max_value": 100},
            },
            {
                "expectation_type": "expect_column_values_to_match_regex",
                "kwargs": {"column": "email", "regex": "^[^@]+@[^@]+$"},
            },
            {
                "expectation_type": "expect_column_values_to_be_unique",
                "kwargs": {"column": "id"},
            },
        ],
    }

    def _df(self, spark):
        return spark.createDataFrame(
            [
                (1, 5.0, "a@x.com"),
                (1, 200.0, "bad"),  # dup id, out-of-range, bad email
                (None, None, "b@y.com"),  # null id; null price NOT a violation
            ],
            "id int, price double, email string",
        )

    def test_run_suite(self, spark):
        report = compiler.run_suite(self._df(spark), self.SUITE)
        by = {(r.rule, r.column): r for r in report.results}
        assert not report.passed
        assert by[("expect_table_columns_to_match_set", None)].passed
        assert by[("expect_column_values_to_not_be_null", "id")].violations == 1
        assert by[("expect_column_values_to_be_between", "price")].violations == 1
        assert by[("expect_column_values_to_match_regex", "email")].violations == 1
        assert by[("expect_column_values_to_be_unique", "id")].violations == 1

    def test_all_pass(self, spark):
        df = spark.createDataFrame(
            [(1, 5.0, "a@x.com"), (2, 9.0, "b@y.com")],
            "id int, price double, email string",
        )
        assert compiler.run_suite(df, self.SUITE).passed

    def test_violation_summary_df(self, spark):
        out = compiler.violation_summary_df(self._df(spark), self.SUITE)
        got = {(r.rule, r.column_name): r.violations for r in out.collect()}
        assert got[("expect_column_values_to_not_be_null", "id")] == 1
        assert len(got) == 3  # row-level rules only


class TestWatermark:
    def _mgr(self, tmp_path, **kw):
        from sales_data_pipeline_spark.incremental.watermark import (
            WatermarkManager,
        )

        kw.setdefault("now_fn", lambda: dt.datetime(2024, 6, 1, 12, 0, 0))
        return WatermarkManager(
            "sales",
            str(tmp_path / "wm.json"),
            backup_path=str(tmp_path / "wm_backup.json"),
            **kw,
        )

    def test_initial_lookback(self, tmp_path):
        m = self._mgr(tmp_path, initial_lookback_days=30)
        assert m.get_watermark() == "2024-05-02 00:00:00"

    def test_update_then_read_with_buffer(self, tmp_path):
        m = self._mgr(tmp_path, buffer_minutes=5)
        assert m.update_watermark("2024-06-01 10:00:00", {"rows": 42})
        assert m.get_watermark() == "2024-06-01 10:00:00"
        assert m.get_filter_condition() == "created_date > '2024-06-01 09:55:00'"

    def test_buffer_crosses_day_boundary(self, tmp_path):
        m = self._mgr(tmp_path, buffer_minutes=10)
        m.update_watermark("2024-06-01 00:04:00")
        assert m.buffered_watermark() == "2024-05-31 23:54:00"

    def test_backup_fallback(self, tmp_path):
        import os

        m = self._mgr(tmp_path)
        m.update_watermark("2024-06-01 10:00:00")
        os.unlink(m.primary_path)
        assert m.get_watermark() == "2024-06-01 10:00:00"  # from backup

    def test_filter_column_pushes_down(self, spark, tmp_path):
        m = self._mgr(tmp_path, timestamp_column="ts")
        m.update_watermark("2024-01-02 00:00:00")
        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1),), (dt.datetime(2024, 1, 3),)], "ts timestamp"
        )
        assert df.filter(m.get_filter_column()).count() == 1


class TestIncrementalMetricsMerge:
    """merge_customer_metrics must be exactly lossless under ANY
    partition of the history — associativity is what lets daily delta
    batches chain for years without drift."""

    def test_three_way_chain_equals_global(self, spark):
        from pyspark.sql import functions as F

        from sales_data_pipeline_spark.operators import gold

        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        full = gold.aggregate_order_metrics(o)
        parts = [
            o.filter(F.col("o_orderdate") < "1996-06-01"),
            o.filter(
                (F.col("o_orderdate") >= "1996-06-01")
                & (F.col("o_orderdate") < "1999-01-01")
            ),
            o.filter(F.col("o_orderdate") >= "1999-01-01"),
        ]
        merged = gold.aggregate_order_metrics(parts[0])
        for p in parts[1:]:
            merged = gold.merge_customer_metrics(
                merged, gold.aggregate_order_metrics(p)
            )
        assert merged.exceptAll(full).count() == 0
        assert full.exceptAll(merged).count() == 0

    def test_empty_delta_is_identity(self, spark):
        from pyspark.sql import functions as F

        from sales_data_pipeline_spark.operators import gold

        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        full = gold.aggregate_order_metrics(o)
        empty = gold.aggregate_order_metrics(o.filter(F.lit(False)))
        merged = gold.merge_customer_metrics(full, empty)
        assert merged.exceptAll(full).count() == 0
        assert full.exceptAll(merged).count() == 0


class TestDistinctSketchMerge:
    def test_merged_sketches_match_global_and_bound_error(self, spark):
        from sales_data_pipeline_spark.queries.base import load_all

        rows = (
            load_all()["incremental_distinct_sketch"]
            .fn(spark, "/root/testdata/sf0.001")
            .collect()
        )
        assert rows
        for r in rows:
            # union of per-batch sketches must equal the one-pass sketch
            assert r.merge_consistent, r
            # HLL (lgConfigK=12) relative error is ~1.6%; allow 5%
            assert abs(r.n_sketch - r.n_exact) <= max(2, 0.05 * r.n_exact), r

    def test_union_associative_across_groupings(self, spark):
        """Sketch union must be grouping-invariant: batching the same
        stream two unrelated ways (time split vs user-id parity, i.e.
        different batch counts AND different element placement) and
        merging must yield the identical estimate — the property that
        lets per-partition sketches at 100 TB merge in any tree shape
        the scheduler picks."""
        from pyspark.sql import functions as F

        from sales_data_pipeline_spark.queries.base import events_table

        e = events_table(spark, "/root/testdata/sf0.001").select(
            "event_type", "user_id", "ts"
        )

        def merged_estimate(batch_col):
            return {
                r.event_type: r.n
                for r in (
                    e.withColumn("b", batch_col)
                    .groupBy("event_type", "b")
                    .agg(F.hll_sketch_agg("user_id").alias("sk"))
                    .groupBy("event_type")
                    .agg(
                        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n")
                    )
                    .collect()
                )
            }

        by_time = merged_estimate((F.col("ts") >= "2024-01-15").cast("int"))
        by_user = merged_estimate(F.pmod(F.col("user_id"), F.lit(5)))
        assert by_time == by_user
