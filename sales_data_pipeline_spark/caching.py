"""Scoped persist registry — precise lifecycle for within-query caches.

Any layer (operators, queries) that persists an intermediate consumed
more than once registers it here; long-lived loops (bench, oracle
harness, tests) call release_persisted() right after materializing a
result, and every catalog query entry releases before running, so a
session that runs the catalog repeatedly never accumulates cached
vocab/signature tables. Lives outside the query layer so operators can
use it without importing queries.base (layering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPED_PERSISTS: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() an intermediate and register it for release_persisted().
    Use for aggregates consumed by multiple joins (a unigram vocabulary
    broadcast twice, LSH candidate/signature tables) where recomputation
    would re-run a full corpus scan per consumer."""
    _SCOPED_PERSISTS.append(df.persist())
    return df


def release_persisted() -> None:
    """Unpersist every scoped_persist() intermediate."""
    while _SCOPED_PERSISTS:
        df = _SCOPED_PERSISTS.pop()
        try:
            df.unpersist()
        except Exception:
            pass
