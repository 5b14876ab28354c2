"""Results must not depend on physical partitioning: the same logical
plan re-planned with a different shuffle-partition count (what AQE and
cluster sizing do at 100 TB) has to produce identical rows. Queries
whose operators involve windows, hash self-joins, iterative label
propagation, or salting are the ones that would drift if any step
leaked partition order into results."""

from __future__ import annotations

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

QUERIES = [
    "dedup_keep_latest",       # row_number window with tiebreakers
    "dedup_minhash_lsh",       # band self-join + persist + verify
    "dedup_cluster_assign",    # iterative connected components
    "salted_skew_agg",         # two-phase salted aggregation
    "concurrent_events_daily_peak",  # running-sum sweep with ties
    "scd2_merge_history",      # multi-branch merge over persists
    "topk_per_group",          # per-group top-k ordering
    # round-2: exact-moments statistics, surprisal sums, throttle fold,
    # hash-threshold resampling — each claims bit-identical results
    # under any partitioning; hold them to it
    "stats_price_quantity_moments",
    "embedding_dim_variance",
    "unigram_logprob_scores",
    "mixture_resample_plan",
    "throttle_events_24h",
    "cross_doc_ngram_repetition",
    "ohlc_bars_6h",            # min_by/max_by composite-key selection
    "knn_batch_lsh_join",      # bucket join + per-query ranking
    "winsorize_event_values",  # percentile boundaries + clipped sums
    # round-3 rewrites: bucketed two-level top-k, grouping-sets dual
    # aggregation, persisted-aggregate broadcasts
    "source_top_tokens",
    "token_bigram_pmi",
    "pii_encrypt_roundtrip",   # fixed-IV cipher must be partition-pure
    # round-4 rewrites: sign-safe struct-max argmax, banded composite
    # block join with probe-side explode
    "dedup_keep_best",
    "fuzzy_prefix_linkage",
    # round-4 single-scan rewrites: partitioned-window thresholds,
    # two-level aggregates, full-outer audit folds
    "waiting_orders_suppliers",
    "small_quantity_revenue",
    "large_volume_orders",
    "dominant_volume_suppliers",
    "referential_integrity_audit",
    "join_fanout_audit",
]


def run_sorted(spark, name: str) -> pd.DataFrame:
    from sales_data_pipeline_spark.queries.base import load_all

    df = load_all()[name].fn(spark, SF_DIR).toPandas()
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_to_shuffle_partitions(spark, name):
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        a = run_sorted(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        b = run_sorted(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


# AQE rewrites physical plans at runtime (coalescing, broadcast
# promotion, skew splits); none of that may change RESULTS. Spot-check
# the shapes most exposed to physical replanning: shuffle joins, salted
# two-phase aggs, windows over aggregates, and the round-4 single-scan
# rewrites whose AQE-promoted broadcasts are load-bearing.
AQE_QUERIES = [
    "salted_skew_join",
    "scd2_merge_history",
    "dedup_minhash_lsh",
    "waiting_orders_suppliers",
    "large_volume_orders",
    "dominant_volume_suppliers",
    "token_bigram_pmi",
    "ohlc_bars_6h",
]


@pytest.mark.parametrize("name", AQE_QUERIES)
def test_result_invariant_to_aqe(spark, name):
    saved = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        a = run_sorted(spark, name)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        b = run_sorted(spark, name)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
