"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from sales_data_pipeline_spark.session import build_session

    s = build_session("pytest")
    yield s
