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

# Round-5 rotation plan (FORCE-RECHECK semantics: these names are
# fronted even when their latest driver row is green — the round-4
# verdict flagged exactly this set as "rewritten after the row landed",
# so the green certifies stale code). Ordered: the one never-checked
# query first, then the six post-row rewrites riskiest-first, then the
# lower-risk touched-operator family (scoped-persist refactor touched
# the dedup/SCD2 operators, whose query-fn fingerprints can't see it).
# Going forward the fingerprint mechanism (CHECKED_FINGERPRINTS.json +
# tools/fingerprints.py) re-fronts query-fn/oracle rewrites
# automatically; _PRIORITY remains the manual lever for operator-level
# changes like this round's.
_PRIORITY = [
    "text_compression_ratio",  # only never-checked name: closes 200/200
    # post-row rewrites (r4) — fresh rows certify the CURRENT code
    "multimodal_feature_extract",  # rows-only row predates hash oracle
    "dedup_keep_best",  # sign-safe argmax + NULL-text exclusion
    "fuzzy_prefix_linkage",  # composite (prefix, len-band) blocking
    "large_volume_orders",  # Q18 single-scan rewrite
    "dominant_volume_suppliers",  # Q20 single-scan rewrite
    "join_fanout_audit",  # full-outer one-pass rewrite
    # touched-operator family (scoped-persist refactor, r4+r5 threading)
    "scd2_merge_history",
    "dedup_minhash_lsh",
    "dedup_exact",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_incremental_batch",
    # r5 code touch: NULL-text filter landed in the query fn itself
    # (fingerprint also fronts it; listed for deterministic order)
    "token_bigram_pmi",  # scoped-persist consumer, r5 thread-local move
]


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
    latest: dict[str, dict] = {}

    def _round_num(path: str) -> int:
        m = re.search(r"_r(\d+)", os.path.basename(path))
        return int(m.group(1)) if m else -1

    # Sort by the NUMERIC round, not the filename: lexicographic order
    # breaks at round 100 (CORRECTNESS_r100 < CORRECTNESS_r99) and would
    # let a stale row override the true latest.
    for path in sorted(
        glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")),
        key=_round_num,
    ):
        try:
            with open(path) as f:
                latest.update(json.load(f))
        except (OSError, ValueError):
            continue
    green: set[str] = set()
    failed: set[str] = set()
    for name, row in latest.items():
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


def _rotated(registry: dict, checked_fps: dict[str, str] | None = None):
    """Driver-window ordering: latest-failed first, then _PRIORITY
    (force-recheck — even green rows, see the list's comment), then
    FINGERPRINT-STALE green names (code or oracle changed since the
    row that certified them), then unchecked (sorted), then fresh
    green last.

    ``registry`` maps name -> QuerySpec (fingerprints need the fn +
    oracle, not just the name). ``checked_fps`` overrides the committed
    CHECKED_FINGERPRINTS.json (tests / tools/fingerprints.py's window
    simulation)."""
    from sales_data_pipeline_spark import fingerprints as fp

    green, failed = _driver_rows()
    if checked_fps is None:
        checked_fps = fp.load_checked(_REPO_ROOT)
    stale = fp.stale_names(registry, checked_fps)
    names = list(registry)
    in_catalog = set(names)
    head = [n for n in sorted(failed) if n in in_catalog]
    seen = set(head)
    head += [n for n in _PRIORITY if n in in_catalog and n not in seen]
    seen = set(head)
    head += [n for n in sorted(names) if n in green and n in stale
             and n not in seen]
    seen = set(head)
    mid = [n for n in sorted(names) if n not in green and n not in seen]
    tail = [n for n in sorted(names) if n in green and n not in seen]
    return head + mid + tail


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
