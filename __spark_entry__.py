"""Driver contract for the spark-graft builder (PySpark target).

Delegates to the query catalog in ``sales_data_pipeline_spark.queries``:
every registered query ships a Spark implementation and (where SQL can
express it) a DuckDB oracle. See sales_data_pipeline_spark/queries/*.py
for the SURVEY.md §2 coverage map.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Manual FORCE-RECHECK list (fronted even when green). EMPTY for round
# 6: every round-5 entry got a fresh green row, and the two levers that
# used to need manual entries are now automatic — (a) fingerprints
# include per-module hashes of referenced operator/functions/streaming
# modules, so operator-level rewrites self-front; (b) the green tail
# ages oldest-driver-row-first, so stale-but-unchanged rows re-certify
# organically. Keep this list as the escape hatch for changes neither
# mechanism can see (e.g. testdata regeneration, driver-side compare
# changes).
_PRIORITY: list[str] = [
    # Round-8: the similarity.py-touched family (module hash changed
    # when the hierarchical scaled-k path landed). Their stamps drop
    # with the edit, but their driver rows are YOUNG (r7), so the
    # oldest-row-first stale front would queue them behind the
    # never-stamped tail — front them explicitly so every
    # round-touched query is re-certified in its own round.
    "semantic_dedup_semdedup",
    "knn_brute_force",
    "knn_lsh_bucket",
    "knn_ivf_probe",
    "ivf_centroid_assign",
    "embedding_cosine_histogram",
    "embedding_norm_stats",
    "embedding_pca_project",
    "doc_fingerprints",
    "incremental_metrics_merge",
    # Round-8 aging straggler: the one r3-latest-row query the 38
    # aging slots left behind (judge ask: post-r8, nothing older
    # than r4).
    "prefix_duplicate_groups",
]


def _latest_rows() -> dict[str, tuple[dict, int]]:
    """name -> (latest CORRECTNESS row, round number it landed in).

    Sorted by the NUMERIC round, not the filename: lexicographic order
    breaks at round 100 (CORRECTNESS_r100 < CORRECTNESS_r99) and would
    let a stale row override the true latest.
    """

    def _round_num(path: str) -> int:
        m = re.search(r"_r(\d+)", os.path.basename(path))
        return int(m.group(1)) if m else -1

    latest: dict[str, tuple[dict, int]] = {}
    for path in sorted(
        glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")),
        key=_round_num,
    ):
        rnd = _round_num(path)
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            latest[name] = (row, rnd)
    return latest


def _row_rounds() -> dict[str, int]:
    """name -> round of its latest driver row (green-tail aging: the
    rotation re-fronts the OLDEST-certified greens first so every row
    is eventually re-freshened against current code)."""
    return {name: rnd for name, (_row, rnd) in _latest_rows().items()}


def _driver_rows() -> tuple[set[str], set[str]]:
    """(green, failed) per the LATEST driver CORRECTNESS row of each name.

    The external driver checks the first N names in the dict ``queries()``
    returns, so we rotate still-unchecked queries to the front each round.
    Derived from the CORRECTNESS_r*.json files the driver itself writes —
    self-maintaining, no manual bookkeeping.

    A row is green when no boolean check is False (``no_oracle`` rows-only
    checks count as green — the judge sees which). A name whose *latest*
    row failed goes back to the front of the window so fixes get
    re-verified instead of rotting behind the "already checked" set.
    """
    green: set[str] = set()
    failed: set[str] = set()
    for name, (row, _rnd) in _latest_rows().items():
        checks = (
            row.get("rows_match"),
            row.get("schema_match"),
            row.get("hash_match"),
        )
        if any(c is False for c in checks) or row.get("err") not in (
            None,
            "no_oracle",
        ):
            failed.add(name)
        else:
            green.add(name)
    return green, failed


def _rotated(
    registry: dict,
    checked_fps: dict[str, str] | None = None,
    committed_window: list[str] | None = None,
):
    """Driver-window ordering: latest-failed first, then the COMMITTED
    WINDOW from CHECKED_FINGERPRINTS.json verbatim (the exact head
    ``tools/fingerprints.py record`` computed and stamped — fronting it
    keeps the driver's actual window equal to the stamped set), then
    _PRIORITY (force-recheck — even green rows, see the list's
    comment), then UNCHECKED names (never had a driver row — a newly
    added query must be certified the round it lands, not starve
    behind re-certifications; round 7's base.py tracking made the
    whole catalog fingerprint-stale at once, which would otherwise
    push new queries past the window), then FINGERPRINT-STALE green
    names (code, oracle, or a referenced operator module changed since
    the row that certified them) — OLDEST-driver-row first, so a
    shared-module edit that fronts many queries at once degrades into
    the aging order instead of an alphabetical head — then fresh green
    last, also OLDEST-driver-row first, so each round organically
    re-certifies the stalest greens.

    ``registry`` maps name -> QuerySpec (fingerprints need the fn +
    oracle, not just the name). ``checked_fps`` / ``committed_window``
    override the committed CHECKED_FINGERPRINTS.json (tests /
    tools/fingerprints.py's window simulation — record() passes
    ``committed_window=[]`` to compute a fresh window)."""
    from sales_data_pipeline_spark import fingerprints as fp

    green, failed = _driver_rows()
    if committed_window is None:
        # An explicit checked_fps override (tests, record()'s window
        # simulation) implies the repo file's window is irrelevant too.
        committed_window = (
            fp.load_window(_REPO_ROOT) if checked_fps is None else []
        )
    if checked_fps is None:
        checked_fps = fp.load_checked(_REPO_ROOT)
    stale = fp.stale_names(registry, checked_fps)
    rounds = _row_rounds()
    names = list(registry)
    in_catalog = set(names)
    head: list[str] = []
    seen: set[str] = set()

    def _extend(cands) -> None:
        # incremental seen-update: duplicates INSIDE one source list
        # (e.g. a hand-edited CHECKED_FINGERPRINTS window or _PRIORITY)
        # must not enter the head twice (round-6 advisor)
        for n in cands:
            if n in in_catalog and n not in seen:
                head.append(n)
                seen.add(n)

    _extend(sorted(failed))
    _extend(committed_window)
    _extend(_PRIORITY)
    _extend(sorted(n for n in names if n not in green))
    _extend(
        sorted(
            (n for n in names if n in green and n in stale),
            key=lambda n: (rounds.get(n, -1), n),
        )
    )
    tail = sorted(
        (n for n in names if n in green and n not in seen),
        key=lambda n: (rounds.get(n, -1), n),
    )
    return head + tail


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: star join orders ->
    customer -> nation -> region with broadcast dims + grouped revenue
    (SURVEY §2 J2/A5, dashboard revenue-by-dimension workload)."""
    from sales_data_pipeline_spark.queries.base import load_all

    registry = load_all()
    return registry["revenue_by_nation"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM-data
    extensions). Each callable takes (spark, sf_dir) and returns a DF."""
    from sales_data_pipeline_spark.queries.base import load_all

    registry = load_all()
    return {name: registry[name].fn for name in _rotated(registry)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys without SQL-expressible
    semantics are omitted (driver records a rows-only check)."""
    from sales_data_pipeline_spark.queries.base import load_all

    registry = load_all()
    return {
        name: registry[name].oracle
        for name in _rotated(registry)
        if registry[name].oracle is not None
    }
