#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints per-query detail followed by ONE
SHORT final JSON summary line.

Output contract (round-5 fix): the external driver captures the TAIL of
stdout, and round 3/4 proved a single line carrying 60+ float timings
outgrows that window (BENCH_r04.json landed `parsed: null`). So the
detail dict goes on its own EARLIER line and the LAST line is a compact
summary (metric/value/unit/sf/n_queries — well under any plausible
capture window), guaranteed to parse even if the detail line is cut.

Each query is forced end-to-end with the noop sink (full compute, no
driver-side result transfer — we measure the engine, not toPandas).

--full times the ENTIRE query catalog (one warm + one measured pass)
instead of the headline list and writes the per-query detail to
--out (default BENCH_FULL.json): the per-round regression surface for
SCALE.md's full-catalog table.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

HEADLINE = [
    "star_join_enriched",
    "revenue_by_nation",
    "agg_customer_metrics",
    "monthly_customer_totals",
    "topk_customers",
    "dedup_keep_latest",
    "running_total_window",
    "rejection_split_case_when",
    "countdistinct_by_type",
    "tumbling_window_agg",
    "scan_filter_project",
    "derived_cast_projection",
    # pipeline composites
    "scd2_merge_history",
    "gold_customer_metrics",
    "silver_customer_transform",
    # decision-support shapes (big shuffle join / disjunctive pushdown /
    # decorrelated EXISTS / broadcast-dim profit rollup)
    "nation_pair_volume",
    "disjunctive_brand_revenue",
    "waiting_orders_suppliers",
    "product_profit_by_nation",
    # LLM-data extensions
    "benchmark_contamination",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "knn_brute_force",
    "knn_lsh_bucket",
    "text_token_stats",
    "session_window_agg",
    # incremental maintenance + corpus curation breadth
    "incremental_metrics_merge",
    "tfidf_top_terms",
    # corpus prep + interval analytics
    "doc_chunk_overlap",
    "pii_redaction",
    "concurrent_events_daily_peak",
    # Arrow/pandas codec boundary
    "multimodal_audio_energy",
    # retrieval stack
    "bm25_search",
    "hybrid_search_rrf",
    # round-2 additions: corpus curation + exact-moments statistics +
    # distributed PCA + multi-batch streaming upsert
    "cross_doc_ngram_repetition",
    "gopher_quality_filter",
    "source_corpus_stats",
    "stats_price_quantity_moments",
    "embedding_dim_variance",
    "embedding_pca_project",
    "streaming_foreach_batch_upsert",
    # round-2 late additions: LM scoring, domain shift, retrieval,
    # downsampling, capping, VAD segmentation
    "unigram_logprob_scores",
    "source_kl_divergence",
    "phrase_search_positional",
    "knn_batch_lsh_join",
    "ohlc_bars_6h",
    "winsorize_event_values",
    "audio_silence_segments",
    # window/state regression sentinels (round-2): distributed rank /
    # prefix sum, gap-fill LOCF, stateful throttle, SCD1 merge
    "revenue_pareto_curve",
    "ntile_customer_quartiles",
    "locf_forward_fill",
    "throttle_events_24h",
    "scd1_upsert_merge",
    # round-3 additions: newest corpus/token families perf-tracked
    "token_bigram_pmi",
    "source_top_tokens",
    "chunk_dedup_exact",
    "prefix_duplicate_groups",
    "event_transition_matrix",
    "pii_encrypt_roundtrip",
    "dedup_keep_best",
    "fuzzy_prefix_linkage",
    # round-4 additions: last unbenched heavyweight families — cohort
    # retention (two-shuffle), 7-day sliding distinct (range-frame
    # window over events), and VARIANT/JSON aggregation
    "retention_cohorts",
    "rolling_7d_distinct_users",
    "variant_json_agg",
    # round-4 single-fact-scan rewrites (Q17/Q18/Q20 shapes) — benched
    # so any regression of the one-scan plans is visible
    "small_quantity_revenue",
    "large_volume_orders",
    "dominant_volume_suppliers",
    # round-6: deletion-neighborhood rewrite (29s -> 2.7s; the full-
    # catalog sweep's one INVESTIGATE) — benched so the fixed shape
    # can't silently regress to the theta-join
    "fuzzy_name_match",
]


def run_names(spark, registry, names, sf_dir) -> dict[str, float]:
    """Two passes: the first warms JVM JIT / codegen caches / parquet
    footers, the second is the measurement — round-over-round deltas
    on plan-pinned queries were dominated by single-run noise before
    (round-2 star_join_enriched 3.21->4.41s with an identical plan).
    Keep the reported number the min of the two runs: both are full
    end-to-end executions, and min is the standard noise floor."""
    from sales_data_pipeline_spark.queries.base import release_persisted

    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in names:
            spec = registry.get(name)
            if spec is None:
                continue
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            elapsed = round(time.perf_counter() - t0, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
            # queries that persist() intermediates would otherwise leak
            # cache across measurements; drop it so every query is timed
            # against a cold store (release first = precise unpersist of
            # scoped intermediates, clearCache = catch-all)
            release_persisted()
            spark.catalog.clearCache()
    return timings


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--full",
        action="store_true",
        help="time the entire query catalog instead of HEADLINE",
    )
    ap.add_argument(
        "--out",
        default=os.path.join(_REPO_ROOT, "BENCH_FULL.json"),
        help="detail artifact path for --full",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from sales_data_pipeline_spark.queries.base import load_all
    from sales_data_pipeline_spark.session import build_session

    registry = load_all()
    spark = build_session("bench")

    # JVM + parquet-footer warmup so q1 doesn't pay session startup.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).count()

    names = sorted(registry) if args.full else HEADLINE
    timings = run_names(spark, registry, names, sf_dir)

    # round-5/6: the reference's actual SLA workloads as composite rows
    # (CSV ingest -> bronze rejection split -> silver -> SCD2 -> gold,
    # via plans/runner) — full_refresh AND the daily incremental mode
    # (watermark-seeded delta batch). Reported SEPARATELY from the
    # headline sum so `headline_queries_total` stays definitionally
    # stable round-over-round (round-5 advisor: folding the composite
    # into `timings` inflated the total and n_queries). Fixture
    # derivation is cached and untimed; each timed run is a full
    # fresh-output execution.
    from sales_data_pipeline_spark.plans import bench_pipeline

    inputs = bench_pipeline.prepare_fixtures(spark, sf_dir)
    composites: dict[str, float] = {}
    for cname, runner in (
        ("pipeline_end_to_end", bench_pipeline.run_composite),
        ("pipeline_incremental", bench_pipeline.run_incremental),
    ):
        for _pass in range(2):
            t0 = time.perf_counter()
            runner(spark, inputs)
            elapsed = round(time.perf_counter() - t0, 3)
            if cname not in composites or elapsed < composites[cname]:
                composites[cname] = elapsed
            spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    metric = "full_catalog_total" if args.full else "headline_queries_total"

    if args.full:
        with open(args.out, "w") as f:
            json.dump(
                {"metric": metric, "value": total, "unit": "sec",
                 "sf": sf, "queries": timings, "composites": composites},
                f, indent=1, sort_keys=True,
            )
            f.write("\n")
    # Per-query detail on its OWN line (may exceed the driver's tail
    # window; that only ever cuts this line)...
    print(json.dumps({"detail": metric, "sf": sf, "queries": timings}))
    # ...and the guaranteed-parse summary as the FINAL line.
    print(
        json.dumps(
            {
                "metric": metric,
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "composites": composites,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
