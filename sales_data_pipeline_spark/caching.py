"""Scoped persist registry — precise lifecycle for within-query caches.

Any layer (operators, queries) that persists an intermediate consumed
more than once registers it here; long-lived loops (bench, oracle
harness, tests) call release_persisted() right after materializing a
result, and every catalog query entry releases before running, so a
session that runs the catalog repeatedly never accumulates cached
vocab/signature tables. Lives outside the query layer so operators can
use it without importing queries.base (layering).

Contract (load-bearing for the persists, not for correctness): build a
query's DataFrame, run its action, THEN build the next query — all on
one thread. Entering query B before collecting query A unpersists A's
scoped intermediates early; results stay correct (Spark recomputes) but
the persist's purpose (e.g. not re-running the unigram corpus scan per
broadcast consumer) is defeated. The registry is keyed per THREAD
(``threading.local``) so concurrent query threads cannot race on, or
release, each other's persists — the build-then-collect rule is only
per-thread.

Cross-thread reclamation (round-5 advisor): a driver that BUILDS on
thread A but RELEASES on thread B would leave A's persists registered
forever under pure thread-locals. Every registered persist is therefore
also tracked in a lock-guarded process-wide set; ``sweep_persisted()``
(called by the catalog's ``entered`` wrapper alongside clearCache)
unpersists every outstanding registration regardless of origin thread,
so stragglers are reclaimed deterministically instead of relying on the
catch-all clearCache.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCAL = threading.local()

# Process-wide mirror of every live registration (id -> DataFrame):
# the cross-thread fallback swept by sweep_persisted().
_GLOBAL_LOCK = threading.Lock()
_GLOBAL: dict[int, DataFrame] = {}


def _registry() -> list[DataFrame]:
    reg = getattr(_LOCAL, "persists", None)
    if reg is None:
        reg = []
        _LOCAL.persists = reg
    return reg


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() an intermediate and register it for release_persisted().
    Use for aggregates consumed by multiple joins (a unigram vocabulary
    broadcast twice, LSH candidate/signature tables) where recomputation
    would re-run a full corpus scan per consumer."""
    _registry().append(df.persist())
    with _GLOBAL_LOCK:
        _GLOBAL[id(df)] = df
    return df


def _unpersist(df: DataFrame) -> None:
    try:
        df.unpersist()
    except Exception:
        pass


def release_persisted() -> None:
    """Unpersist every scoped_persist() intermediate registered by THIS
    thread (other threads' persists are untouched)."""
    reg = _registry()
    while reg:
        df = reg.pop()
        with _GLOBAL_LOCK:
            _GLOBAL.pop(id(df), None)
        _unpersist(df)


def sweep_persisted() -> None:
    """Unpersist ALL outstanding registrations, whatever thread made
    them — the deterministic cross-thread fallback for drivers that
    build and release on different threads. Thread-local lists keep
    their (now unpersisted) entries; a later release_persisted() on the
    origin thread is a harmless no-op unpersist."""
    with _GLOBAL_LOCK:
        pending = list(_GLOBAL.values())
        _GLOBAL.clear()
    for df in pending:
        _unpersist(df)
