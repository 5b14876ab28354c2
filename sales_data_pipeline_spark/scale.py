"""Plan-build-time scale gates — broadcast on disk-measured proof.

The engine's rule for every explicit ``F.broadcast`` of a relation that
GROWS with the data (SF-scaling dimensions like customer/part/supplier,
corpus-derived maps like per-doc lengths or open-vocabulary term
counts): the hint must be *earned* by evidence, not assumed. A forced
broadcast of a scaling relation is a guaranteed OOM at some scale — at
the 100 TB design point a TPC-H customer dim is terabytes — while an
unhinted join degrades gracefully: Catalyst's file-source estimates are
accurate and AQE re-checks measured sizes at runtime, so the same query
plans a broadcast-hash join while the dim is genuinely small and a
spilling sort-merge join once it is not.

``gated_broadcast`` reads the actual on-disk footprint of the files
behind the relation (``df.inputFiles()`` — for a derived frame this is
the union of all source files in its lineage, an upper bound, which is
the safe direction) and attaches the broadcast hint only under a cap.
Unknown footprint (non-file source, remote URI) counts as huge.

This generalizes the dedup gram-map gate (operators/dedup.py
``gram_map_build``, which keeps a *merge* else-arm because its build
sides are cached aggregates whose stats Catalyst UNDERestimates — there
even the unhinted plan picks a fatal broadcast). Here the else-arm is
deliberately unhinted: raw-scan lineages have trustworthy stats, and
uncached aggregate builds inherit conservative (over-) estimates, so
Catalyst's own choice is already scale-safe once the hint is removed.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Cap for plain-row relations (dims, per-doc/per-term maps): parquet ->
# in-memory row expansion for ordinary columnar rows is ~2-4x, so 64 MB
# on disk bounds the broadcast relation near ~200 MB. Measured healthy
# at the sf10 spot-check (customer = 24 MB, documents = 60 MB — the
# forced-broadcast plans of all gated sites completed there); the gate
# exists for the scales beyond any local test, where the hint must
# disappear. Corpus-scaling maps with ~50x expansion (gram/shingle
# sets) do NOT use this cap — see dedup.GRAM_MAP_BROADCAST_CAP.
DIM_BROADCAST_CAP = 64 << 20


def source_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of the local file-source inputs behind df,
    or None when that is unknowable (non-file source, remote URI,
    unreadable path) — callers must treat None as 'assume huge'."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            return None
        try:
            total += os.path.getsize(parsed.path)
        except OSError:
            return None
    return total


def source_is_small(df: DataFrame, cap: int) -> bool:
    """True only when df's file-source footprint is PROVABLY at or
    under cap — unknowable sizes count as huge."""
    size = source_bytes(df)
    return size is not None and size <= cap


def gated_broadcast(
    df: DataFrame,
    cap: int | None = None,
    corpus: DataFrame | None = None,
    cached: bool = False,
) -> DataFrame:
    """``F.broadcast(df)`` iff the file footprint behind ``corpus``
    (default: df's own lineage) is provably <= cap (default
    DIM_BROADCAST_CAP, read at call time so tests and the broadcast
    audit can force the gate shut); else df UNHINTED, so Catalyst/AQE
    picks the join strategy from its own estimates and the plan
    degrades to sort-merge at scale instead of OOMing.

    ``cached=True`` is REQUIRED for persisted builds (scoped_persist):
    an InMemoryRelation's pre-materialization stats UNDERestimate (the
    dedup gram-map OOM class), so the unhinted else-arm could still
    pick a fatal broadcast — those sites get an explicit merge hint
    instead, which spills and is memory-bounded at any size."""
    probe = corpus if corpus is not None else df
    limit = DIM_BROADCAST_CAP if cap is None else cap
    if source_is_small(probe, limit):
        return F.broadcast(df)
    return df.hint("merge") if cached else df


def spread_small_scan(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-spread a scan-rooted frame across the cluster ONLY when its
    physical plan has fewer partitions than the default parallelism.

    The failure this gates (round-7 find, measured): a small-SF corpus
    is ONE parquet file, so the scan stage has ONE partition and every
    CPU-heavy per-row projection rooted on it — shingling, minhash
    folds, tokenizing explodes — runs single-threaded no matter how
    many cores exist (dedup_incremental_batch spent 3.5 s of its 6.6 s
    in one such stage; token_bigram_pmi 3.1 s of 3.9 s). A blanket
    ``repartition`` fixes the bench but is a catastrophic full-corpus
    shuffle at 100 TB, where scans already arrive in thousands of
    splits — so the spread is GATED on the observed partition count and
    becomes a no-op exactly when the data is big enough not to need it.

    PRECONDITION: call this on SCAN-ROOTED frames only (scan + narrow
    projections/filters/unions, no shuffle upstream). The partition
    probe (``df.rdd.getNumPartitions()``) plans such a frame without
    launching a job — but under AQE, ``.rdd`` on a plan that CONTAINS a
    shuffle materializes the intermediate query stages (runs real
    jobs), so wrapping a post-shuffle frame would silently execute it
    here. All current call sites are corpus/scan builders; keep it
    that way. Keys make the placement deterministic (hash of the id),
    not round-robin."""
    sess = df.sparkSession
    n = sess.sparkContext.defaultParallelism
    try:
        parts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if parts >= min(n, 8):
        return df
    return df.repartition(n, *[F.col(k) for k in keys]) if keys else (
        df.repartition(n)
    )
