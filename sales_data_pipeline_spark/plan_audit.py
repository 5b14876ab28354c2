"""Broadcast-audit plan walkers — the 100x OOM-class invariant.

Shared by ``tools/broadcast_audit.py`` (the CLI that writes
BROADCAST_AUDIT.json, including the physical census at the sf10 paths)
and ``tests/test_plan_shapes.py`` (which enforces the cheap invariant on
every pytest run: with every size gate forced shut, no query's
optimized plan may carry a ``strategy=broadcast`` hint whose hinted
subtree is an unbounded scaling relation — i.e., no bare ``F.broadcast``
of something that grows with the data).

See ``scale.gated_broadcast`` for the rule being enforced and SCALE.md
round-6 for the measurements behind it.
"""

from __future__ import annotations

import re

SCALING_TABLES = (
    "lineitem", "orders", "events", "documents", "embeddings",
    "customer", "supplier", "part",
)
FIXED_TABLES = ("region", "nation")

# leaf-relation column prefixes -> table (logical leaves don't render
# their file paths, but they keep the source schema)
_COL_TABLE = {
    "l_": "lineitem", "o_": "orders", "c_": "customer",
    "s_": "supplier", "p_": "part", "n_": "nation", "r_": "region",
    "doc_id": "documents", "vec_id": "embeddings",
    "event_id": "events", "sale_id": "sales",
}

BOUNDING_PHYS = ("TakeOrderedAndProject", "CollectLimit", "GlobalLimit",
                 "LocalLimit")
AGGS_PHYS = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
STAGES = ("BroadcastQueryStage", "ShuffleQueryStage",
          "TableCacheQueryStage")

TABLE_RE = re.compile(
    r"/(" + "|".join(SCALING_TABLES + FIXED_TABLES) + r")\.parquet"
)

# Reviewed hint-audit findings: hinted broadcasts whose boundedness
# comes from a domain fact the plan cannot express — a grouping key
# with a FIXED domain (enum column, embedding dimension index) or a
# cardinality set by the CLUSTER (per-shuffle-partition offsets from
# operators/distributed.ordered_scan), not by the data. Each entry is
# (query, table): reason; anything NOT listed fails the audit, so a new
# ungated F.broadcast in one of these queries still trips.
REVIEWED_HINTS: dict[tuple[str, str], str] = {
    ("char_coverage_curve", "documents"):
        "ordered_scan per-shuffle-partition offsets: rows = partition "
        "count (cluster-bounded), not corpus size",
    ("ntile_customer_quartiles", "customer"):
        "ordered_scan per-shuffle-partition offsets (cluster-bounded)",
    ("revenue_pareto_curve", "orders"):
        "ordered_scan per-shuffle-partition offsets (cluster-bounded)",
    ("join_string_normalized", "customer"):
        "per-mktsegment aggregate: 5-value TPC-H enum domain",
    ("median_imputation_events", "events"):
        "per-event_type percentile: fixed event-type enum",
    ("winsorize_event_values", "events"):
        "per-event_type percentile bounds: fixed event-type enum",
    ("zscore_outlier_counts", "events"):
        "per-event_type moments: fixed event-type enum",
    ("source_top_tokens", "documents"):
        "per-source totals: fixed source enum",
    ("source_kl_divergence", "documents"):
        "per-source distributions: fixed source enum",
    ("mixture_resample_plan", "documents"):
        "per-source budgets: fixed source enum",
    ("embedding_int8_quant_error", "embeddings"):
        "per-dimension min/max: rows = embedding width (fixed 32)",
    ("dsir_importance_weights", "documents"):
        "per-bucket log-ratio table: rows = hash-bucket modulus "
        "(fixed 256), independent of corpus size",
    ("embedding_outlier_scores", "embeddings"):
        "per-(label, dim) moments: rows = label enum x embedding "
        "width (fixed 64), independent of corpus size",
}


# ---------- physical walk (executed plans) ----------

def phys_kids(node):
    nm = node.nodeName()
    if nm.startswith("AdaptiveSparkPlan"):
        return [node.initialPlan()]
    if nm.startswith(STAGES):
        return [node.plan()]
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def phys_walk(node):
    yield node
    for k in phys_kids(node):
        yield from phys_walk(k)


def classify_build(
    node, bounded: bool, keyed: bool, out: list, cached: bool = False
) -> None:
    """Physical DFS from a BroadcastExchange: record, for every
    scaling-table scan reached, whether the path crossed a bounding
    node, only a keyed aggregate, and/or an InMemory (cached) relation
    — cached+keyed builds are the stats-lie class whose broadcasts must
    come from a size gate, never an estimate."""
    nm = node.nodeName()
    if nm.startswith(AGGS_PHYS):
        try:
            if node.groupingExpressions().isEmpty():
                bounded = True
            else:
                keyed = True
        except Exception:
            keyed = True
    elif nm.startswith(BOUNDING_PHYS):
        bounded = True
    elif nm.startswith(("FileScan", "Scan", "BatchScan", "InMemory")):
        if nm.startswith("InMemory"):
            cached = True
        hit = set(TABLE_RE.findall(node.toString())) & set(SCALING_TABLES)
        if hit:
            out.append((sorted(hit), bounded, keyed, cached))
    for k in phys_kids(node):
        classify_build(k, bounded, keyed, out, cached)


# ---------- logical walk (optimized plans, hint audit) ----------

def _lkids(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _leaf_tables(node) -> set[str]:
    """Tables under a LOGICAL node, identified by leaf output columns."""
    tables: set[str] = set()
    stack = [node]
    while stack:
        n = stack.pop()
        kids = _lkids(n)
        if not kids:
            try:
                out = n.output()
                cols = [out.apply(i).name() for i in range(out.size())]
            except Exception:
                cols = []
            for c in cols:
                for pref, tab in _COL_TABLE.items():
                    if c == pref or c.startswith(pref):
                        tables.add(tab)
                        break
        stack.extend(kids)
    return tables


def _hinted_unbounded(node, bounded: bool, out: set) -> None:
    """Logical DFS: collect scaling leaf tables reachable without
    crossing a bounding node (global Aggregate or Limit)."""
    nm = node.nodeName()
    if nm.startswith("Aggregate"):
        try:
            if node.groupingExpressions().isEmpty():
                bounded = True
        except Exception:
            pass
    elif nm.startswith(("GlobalLimit", "LocalLimit")):
        bounded = True
    kids = _lkids(node)
    if not kids and not bounded:
        out |= _leaf_tables(node) & set(SCALING_TABLES)
    for k in kids:
        _hinted_unbounded(k, bounded, out)


def hint_findings(root) -> list[dict]:
    """Broadcast-hinted joins in an optimized LOGICAL plan whose hinted
    side reaches an unbounded scaling leaf."""
    found = []
    stack = [root]
    while stack:
        n = stack.pop()
        if n.nodeName().startswith("Join"):
            for side, attr in (("left", "leftHint"), ("right", "rightHint")):
                try:
                    hint = getattr(n.hint(), attr)().toString()
                except Exception:
                    hint = ""
                if "BROADCAST" not in hint.upper():
                    continue
                child = n.children().apply(0 if side == "left" else 1)
                bad: set = set()
                _hinted_unbounded(child, False, bad)
                if bad:
                    found.append({"side": side, "tables": sorted(bad)})
        stack.extend(_lkids(n))
    return found


def forced_hint_audit(spark, registry, sf_dir):
    """Run the gates-shut hint audit over a query registry; returns
    (forced, reviewed) finding lists. Caller must pass a registry of
    non-streaming specs."""
    from sales_data_pipeline_spark import scale
    from sales_data_pipeline_spark.operators import dedup
    from sales_data_pipeline_spark.queries.base import release_persisted

    saved = (scale.DIM_BROADCAST_CAP, dedup.GRAM_MAP_BROADCAST_CAP)
    scale.DIM_BROADCAST_CAP = 0
    dedup.GRAM_MAP_BROADCAST_CAP = 0
    forced, reviewed = [], []
    try:
        for name, spec in sorted(registry.items()):
            root = spec.fn(spark, sf_dir)._jdf.queryExecution().optimizedPlan()
            for f in hint_findings(root):
                reasons = [REVIEWED_HINTS.get((name, t)) for t in f["tables"]]
                if all(reasons):
                    reviewed.append({"query": name, **f, "reasons": reasons})
                else:
                    forced.append({"query": name, **f})
            release_persisted()
            spark.catalog.clearCache()
    finally:
        scale.DIM_BROADCAST_CAP, dedup.GRAM_MAP_BROADCAST_CAP = saved
    return forced, reviewed
