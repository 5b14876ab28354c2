"""Bronze layer: ingestion stamping + validity split with first-match-wins
rejection reasons.

Reference semantics (/root/reference/src/main/main.py):
 - every entity gets ``ingestion_date`` stamped at ingest (main.py:101),
 - a conjunctive validity predicate decides valid vs rejected
   (main.py:103-115),
 - rejected rows carry a ``rejection_reason`` from an ORDERED
   when-chain — a row failing several rules gets the FIRST failing
   rule's label ("Order matters", main.py:117-125),
 - the two outputs are written separately (main.py:127-132).

Engine differences (semantics preserved, execution improved):
 - the reason column is computed ONCE and both outputs filter on it;
   the reference evaluates ``filter(cond)`` and ``filter(~cond)``
   independently, re-running the whole predicate tree,
 - ``as_of_date`` replaces ``current_date()`` for reproducibility
   (SURVEY §7.4 risk 2),
 - at scale the split is shuffle-free: one scan, narrow filters.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REJECTION_REASON = "rejection_reason"
INGESTION_DATE = "ingestion_date"


@dataclass(frozen=True)
class ValidityRule:
    """One ordered validity rule: ``predicate`` is True for VALID rows;
    rows failing it (and no earlier rule) are labeled ``reason``."""

    reason: str
    predicate: Column


def sales_validity_rules() -> list[ValidityRule]:
    """The reference's sales rule chain (main.py:103-125), in order."""
    return [
        ValidityRule("NULL_CUSTOMER_ID", F.col("customer_id").isNotNull()),
        ValidityRule("NULL_STORE_ID", F.col("store_id").isNotNull()),
        ValidityRule("NULL_SALES_DATE", F.col("sales_date").isNotNull()),
        ValidityRule(
            "INVALID_PRICE",
            F.col("price").isNotNull() & (F.col("price") > 0),
        ),
        ValidityRule(
            "INVALID_QUANTITY",
            F.col("quantity").isNotNull() & (F.col("quantity") > 0),
        ),
    ]


def stamp_ingestion(df: DataFrame, as_of_date: dt.date | str) -> DataFrame:
    """withColumn(ingestion_date) — parameterized, not current_date()."""
    return df.withColumn(INGESTION_DATE, F.lit(str(as_of_date)).cast("date"))


def with_rejection_reason(df: DataFrame, rules: list[ValidityRule]) -> DataFrame:
    """Add the first-match-wins rejection_reason column (NULL = valid)."""
    if not rules:
        return df.withColumn(REJECTION_REASON, F.lit(None).cast("string"))
    reason: Column | None = None
    for rule in rules:
        clause = F.when(~rule.predicate, F.lit(rule.reason))
        reason = clause if reason is None else reason.when(
            ~rule.predicate, F.lit(rule.reason)
        )
    # mypy-style note: `reason` is a CaseWhen builder; otherwise(NULL) ends it
    return df.withColumn(REJECTION_REASON, reason.otherwise(F.lit(None)))


def split_valid_rejected(
    df: DataFrame, rules: list[ValidityRule]
) -> tuple[DataFrame, DataFrame]:
    """One-pass valid/rejected split.

    Returns (valid, rejected): valid drops the reason column; rejected
    keeps it. Caller may ``.persist()`` the tagged frame when both sides
    are consumed by actions (the reference recomputes instead,
    main.py:127-132).
    """
    tagged = with_rejection_reason(df, rules)
    valid = tagged.filter(F.col(REJECTION_REASON).isNull()).drop(REJECTION_REASON)
    rejected = tagged.filter(F.col(REJECTION_REASON).isNotNull())
    return valid, rejected


def rejection_summary(df: DataFrame, rules: list[ValidityRule]) -> DataFrame:
    """Per-reason counts in one aggregation (the reference derives drop
    percentages from repeated count() actions, main.py:379-404)."""
    tagged = with_rejection_reason(df, rules)
    return (
        tagged.groupBy(
            F.coalesce(F.col(REJECTION_REASON), F.lit("VALID")).alias("reason")
        )
        .agg(F.count("*").alias("n"))
    )
