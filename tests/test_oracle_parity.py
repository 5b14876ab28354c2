"""Replicates the driver's correctness gate: every catalog query vs its
DuckDB oracle on the sf0.001 testdata (fast; sf0.01 runs in CI-ish mode
when SPARK_GRAFT_PARITY_SF is set)."""

from __future__ import annotations

import os

import pytest

from tests.oracle_harness import duckdb_connection, run_query_check

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def con():
    c = duckdb_connection(SF_DIR)
    yield c
    c.close()


def _registry():
    from sales_data_pipeline_spark.queries.base import load_all

    return load_all()


@pytest.mark.parametrize("name", sorted(_registry()))
def test_query_matches_oracle(spark, con, name):
    spec = _registry()[name]
    res = run_query_check(spark, con, SF_DIR, spec)
    assert res.ok, f"{name}: {res.detail}"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
