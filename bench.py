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

Machine-condition metadata (round-7, after BENCH_r06.json recorded a
spurious uniform +20% on a loaded machine that an idle rerun disproved):
every run records os.getloadavg() before the JVM starts and after the
last query, plus /proc/loadavg's running-process count, into BOTH the
artifact and the final summary line. ``load_ok`` is false when the
pre-run 1-minute load exceeds 25% of the CPUs — annotation, not
refusal (the external driver must still get a parsable line), so a
contaminated run is self-evident instead of silently poisoning
round-over-round comparisons.

Composite-phase protection (round-8, after BENCH_r07.json shipped
``pipeline_end_to_end: 50.8 s`` under ``load_ok: true`` while an idle
rerun of byte-identical code measured 15.8 s): the r7 guard sampled
load only BEFORE the run, but the composites ran LAST — exactly when
driver co-load peaked. Three fixes, all here:
  1. Composites now run FIRST, straight after JVM warmup, while the
     pre-run idle check is still meaningful.
  2. min-of-THREE passes per composite, with ALL passes recorded in
     ``composites_detail`` — a contaminated pass is visible as an
     outlier in the list instead of silently becoming the number.
  3. Per-pass condition sampling. os.getloadavg() is useless mid-run
     (our own 32-thread JVM dominates it), so the per-pass probe is
     /proc/loadavg's instantaneous RUNNABLE-TASK count sampled between
     passes, after a 0.5 s quiesce (immediately post-pass our own JVM
     still shows 3-7 runnable cleanup threads; after half a second,
     1-2). An external co-process shows up as procs_running >> the
     idle baseline. ``composites_load_ok`` = pre-JVM load_ok AND every
     inter-pass sample <= max(4, 25% of CPUs) runnable tasks.
``composites`` in the summary line stays {name: min-seconds} for
round-over-round comparability; the new fields ride alongside.

Peak-memory telemetry (round-7): per-query ``peak_mem`` = max stage
peakExecutionMemory (bytes, from the UI REST API) across the query's
stages — the trend line that surfaces the next broadcast/state blow-up
before it's an sf10 crash. Written to the --full artifact; the summary
line carries only the run-wide max.

Contaminated measurements are RE-RUN, not just flagged (round-12,
judge ask #2 — BENCH_r10 and BENCH_r11 both recorded driver co-load
under ``load_ok: true`` because the flags only described the pre-JVM
instant while the contamination arrived mid-run):
  1. Per-query: after the two standard passes, any query with a slow
     NON-warm-up pass whose min is unconfirmed (query_needs_rerun —
     the warm-up pass is exempt because JIT/codegen legitimately slows
     it) or whose sweep segment saw > RERUN_RUNNABLE_CAP external
     runnable tasks gets up to MAX_EXTRA_QUERY_PASSES additional
     passes, each preceded by a bounded wait for the runnable count to
     fall idle. min-of-all-passes stays the reported number; every
     pass is recorded under ``reruns`` so a contaminated history is
     visible. A global RERUN_BUDGET_S bounds the extra wall (the
     driver must always get its line).
  2. Composites: min-of-3 extends pass-by-pass (same idle wait) while
     the best-two spread exceeds COMPOSITE_SPREAD_LIMIT, up to
     MAX_EXTRA_COMPOSITE_PASSES extra passes.
  3. ``load_ok`` in the summary is now the VERDICT, not the pre-JVM
     annotation: it fails when the pre-run load was high OR any
     composite's final spread still exceeds the limit after re-runs
     (the r11 artifact shipped 34/41/48 s composite passes under
     ``load_ok: true``; that exact state now reads false). The raw
     pre-JVM reading stays available as ``load_ok_pre``.
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
    # round-7: SemDeDup (k-means + within-cluster cosine prune) — the
    # newest heavyweight family; benched so the norm-precompute and
    # scalar-BNLJ centroid plan can't silently regress
    "semantic_dedup_semdedup",
    # round-8: scaled-k hierarchical SemDeDup (the measured k ∝ corpus
    # path), its precision/recall eval vs injected ground truth, and
    # the incremental probe (batch vs stored cluster state, top-2
    # multi-probe)
    "semantic_dedup_scaled",
    "semantic_dedup_eval",
    "semantic_dedup_incremental",
    "semantic_dedup_incremental_scaled",
    # round-9: clustering-quality metric (linear cosine-to-centroid),
    # mergeable histogram-state percentiles, and the ingest stream —
    # semantic dedup as a real foreachBatch run against stored state
    # (4 sequential micro-batches, hence the family's heaviest)
    "semantic_cluster_cohesion",
    "incremental_token_quantiles",
    "streaming_semantic_dedup",
    # round-9: product quantization — encode health report + ADC
    # search (completes the ANN family: flat / LSH / IVF / PQ)
    "pq_codebook_histogram",
    "knn_pq_adc",
    "knn_ivfpq",
    "knn_pq_rerank",
    "pq_recall_eval",
    "knn_pq_adc_stored",
    # round-10: trained PQ codebooks through storage, the nprobe dial's
    # certified recall curve, and residual-encoded IVFADC (the full
    # published scheme; per-cell ADC tables)
    "pq_trained_codebook",
    "knn_pq_trained_adc",
    "ivfpq_nprobe_recall",
    "knn_ivfpq_residual",
    # round-10: BPE trainer steps (vocab-sized pair stats + greedy
    # merge), cross-doc duplicated-substring spans, and the bigram-LM
    # perplexity filter (three explode-heavy text shapes — benched so
    # shingle-volume regressions surface)
    "bpe_pair_counts",
    "bpe_merge_step",
    "dedup_substring_spans",
    "bigram_perplexity_scores",
    # round-11 (advisor): the two round-10 queries HEADLINE omitted —
    # regressions in the hashed classifier and the SQ8 scorer must
    # surface per-round, not only under --full
    "quality_classifier_scores",
    "knn_sq8_adc",
    # round-11: multi-merge BPE training (materialized-artifact read
    # after the first build), clustered-corpus recall twins (the ANN
    # dials' design-case curves), perceptual-hash image dedup, WAV
    # metadata decode, and the transformWithState throttle stream
    "bpe_train_merges",
    "bpe_encode_corpus",
    "pq_recall_eval_clustered",
    "ivfpq_nprobe_recall_clustered",
    "image_phash_dedup",
    "multimodal_wav_meta",
    "streaming_throttle_events",
    # round-12: the BPE compression curve (single-scan multi-state
    # aggregate) and image near-dup clustering (CC over the phash pair
    # graph) — benched so the one-scan stack() plan and the grouped
    # banding + CC composition can't silently regress
    "bpe_merge_compression_curve",
    "image_phash_clusters",
    # round-12 session 2: the corpus-rewrite dedup (two data-sized keyed
    # shuffles — the heaviest new shape), DSIR importance weights
    # (double token-stream scan + 256-row broadcast), the Matryoshka
    # truncation-recall curve, and asymmetric containment dedup
    "segment_dedup_rewrite",
    "dsir_importance_weights",
    "ann_matryoshka_recall",
    "dedup_containment_pairs",
    # round-12 session 2 (batch 2): interpolated Kneser-Ney scoring
    # (four model tables off one pair-count aggregate) and the
    # single-shuffle cross-source duplication matrix
    "kneser_ney_bigram_scores",
    "cross_source_overlap_matrix",
    # round-12 session 2 (batch 3): Zipf rank-frequency fit (closed-form
    # regression on integer micro-sums) and per-label embedding outlier
    # top-k (integer-moment Mahalanobis, two-level exact top-k)
    "token_zipf_fit",
    "embedding_outlier_scores",
]


# Pre-JVM idle wait (round-11, judge ask #1): BENCH_r10's per-query
# values carried up to ~40% load noise because the driver launches the
# bench while its previous step's processes are still draining
# (load1_start 3.23). The sampling machinery only made that VISIBLE;
# this makes the artifact CLEAN: before anything else, poll the 1-min
# load until it falls to idle (or a bounded timeout passes — the
# driver must always get a parsable line, so this never refuses). The
# wait itself is recorded in the machine block.
IDLE_LOAD1_TARGET = 1.5
IDLE_WAIT_MAX_S = 600.0
IDLE_POLL_S = 10.0


def wait_for_idle(enabled: bool = True) -> dict:
    t0 = time.monotonic()
    first = last = None
    while True:
        try:
            last = os.getloadavg()[0]
        except OSError:
            last = None
        if first is None:
            first = last
        if (
            not enabled
            or last is None
            or last <= IDLE_LOAD1_TARGET
            or time.monotonic() - t0 >= IDLE_WAIT_MAX_S
        ):
            break
        time.sleep(IDLE_POLL_S)
    return {
        "idle_wait_s": round(time.monotonic() - t0, 1),
        "load1_before_wait": None if first is None else round(first, 2),
        "idle_wait_enabled": enabled,
    }


def _machine_conditions() -> dict:
    """Load/process evidence for the artifact: 1/5/15-min load averages
    and the running-process count from /proc/loadavg (co-process
    evidence — 'R/total' 4th field)."""
    cond: dict = {"cpus": os.cpu_count()}
    try:
        cond["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        cond["loadavg"] = None
    try:
        with open("/proc/loadavg") as f:
            cond["procs_running"] = int(f.read().split()[3].split("/")[0])
    except (OSError, ValueError, IndexError):
        cond["procs_running"] = None
    return cond


class StagePeak:
    """Per-query peak execution memory via the UI REST API.

    Tracks the max completed-stage ``peakExecutionMemory`` since the
    previous call; degrades to None when the UI is disabled or the
    endpoint shape changes (telemetry must never fail the bench)."""

    def __init__(self, spark) -> None:
        self._base = None
        self._seen = -1
        try:
            ui = spark.sparkContext.uiWebUrl
            app = spark.sparkContext.applicationId
            if ui and app:
                base = f"{ui}/api/v1/applications/{app}"
                self._fetch(base + "/stages?status=complete")
                self._base = base
        except Exception:
            self._base = None

    @staticmethod
    def _fetch(url: str):
        import urllib.request

        with urllib.request.urlopen(url, timeout=10) as resp:
            return json.load(resp)

    def peak_since_last(self) -> int | None:
        """Max peakExecutionMemory (bytes) over stages completed since
        the previous call; None when telemetry is unavailable."""
        if self._base is None:
            return None
        try:
            stages = self._fetch(self._base + "/stages?status=complete")
        except Exception:
            return None
        new = [
            s
            for s in stages
            if isinstance(s.get("stageId"), int)
            and s["stageId"] > self._seen
        ]
        if stages:
            self._seen = max(
                (s.get("stageId", -1) for s in stages), default=self._seen
            )
        vals = [
            s.get("peakExecutionMemory")
            for s in new
            if isinstance(s.get("peakExecutionMemory"), (int, float))
        ]
        return int(max(vals)) if vals else 0


SWEEP_SAMPLE_EVERY = 10

# Re-run policy (round-12, judge ask #2) — see module docstring.
QUERY_SPREAD_LIMIT = 0.20  # non-warm-up pass vs min, relative
QUERY_SPREAD_ABS_S = 0.75  # AND the gap must be real wall time.
#   Calibrated against idle runs: 0.15 rel / 0.5 s abs still flagged
#   ~24 multi-second ANN queries whose genuine idle run-to-run
#   variance is ~0.5 s (gaps 2% over the bar, unresolvable by
#   re-running); 0.20 / 0.75 s lets idle bimodality confirm while the
#   r11 co-load shape (median 1.28x, i.e. +0.8 s on a 3 s query)
#   still flags
COMPOSITE_SPREAD_LIMIT = 0.20
RERUN_TIME_FLOOR_S = 0.25  # sub-250ms queries: jitter, not co-load
RERUN_RUNNABLE_CAP = 2  # idle machine shows 1-2 runnable post-quiesce
MAX_EXTRA_QUERY_PASSES = 2
MAX_EXTRA_COMPOSITE_PASSES = 3
RERUN_BUDGET_S = 420.0
RUNNABLE_WAIT_MAX_S = 45.0
RUNNABLE_POLL_S = 3.0


def best2_spread(ts: list[float]) -> float:
    """Relative gap between the two smallest passes — the agreement
    criterion: two passes that landed on an idle machine agree within
    noise; a contaminated pass is an outlier above the floor."""
    s = sorted(ts)
    if len(s) < 2 or s[0] <= 0:
        return 0.0
    return (s[1] - s[0]) / s[0]


def query_needs_rerun(ts: list[float]) -> bool:
    """Per-query contamination test over the ordered pass list
    (ts[0] = the warm-up pass, ts[1:] = measurement passes).

    Suspicious: some NON-warm-up pass sits above min by more than
    max(QUERY_SPREAD_ABS_S, QUERY_SPREAD_LIMIT * min) — the warm-up
    pass is exempt because JIT/codegen legitimately makes it slower
    (the first smoke of the naive both-pass spread flagged 39-61
    queries on a provably idle machine, all warm-up deltas), while a
    measurement pass has no excuse. Both threshold terms are required:
    the relative one scales to heavy queries, the absolute one keeps
    sub-second GC jitter quiet.

    Resolved: the min is CONFIRMED by a second pass (any pass,
    warm-up included) within the same threshold of it — two
    independent executions agreeing at the floor is the definition of
    a trustworthy min, so a contaminated middle pass stops mattering
    once a re-run lands next to the min. Uniform all-pass co-load is
    invisible to any spread test by construction; that case is what
    the runnable-count segment sampling (reason 'coload') catches."""
    if len(ts) < 2:
        return False
    m = min(ts)
    if m <= 0:
        return False
    thr = max(QUERY_SPREAD_ABS_S, QUERY_SPREAD_LIMIT * m)
    suspicious = any(t - m > thr for t in ts[1:])
    confirmed = sum(1 for t in ts if t - m <= thr) >= 2
    return suspicious and not confirmed


def _runnable_now(quiesce_s: float = 0.5) -> int | None:
    """Instantaneous external-runnable probe: quiesce so our own JVM's
    cleanup threads drain (see composites' sampling note), then read
    /proc/loadavg's running-process count."""
    time.sleep(quiesce_s)
    return _machine_conditions().get("procs_running")


def wait_runnable_idle(
    cap: int = RERUN_RUNNABLE_CAP, max_wait_s: float = RUNNABLE_WAIT_MAX_S
) -> tuple[int | None, float]:
    """Bounded wait for the external runnable count to fall to idle
    before a re-run pass — re-running INTO the same co-load would just
    burn the budget. Returns (last sample, seconds waited); never
    refuses (the driver must always get a parsable line)."""
    t0 = time.monotonic()
    n = _runnable_now()
    while (
        n is not None
        and n > cap
        and time.monotonic() - t0 < max_wait_s
    ):
        time.sleep(RUNNABLE_POLL_S)
        n = _runnable_now()
    return n, round(time.monotonic() - t0, 1)


def run_names(
    spark, registry, names, sf_dir, peek: "StagePeak | None" = None,
    peaks: dict[str, int] | None = None,
    cond_samples: list | None = None,
    pass_times: dict[str, list[float]] | None = None,
    segments: list[tuple[int | None, list[str]]] | None = None,
) -> dict[str, float]:
    """Two passes: the first warms JVM JIT / codegen caches / parquet
    footers, the second is the measurement — round-over-round deltas
    on plan-pinned queries were dominated by single-run noise before
    (round-2 star_join_enriched 3.21->4.41s with an identical plan).
    Keep the reported number the min of the two runs: both are full
    end-to-end executions, and min is the standard noise floor.

    When ``cond_samples`` is a list (round-10, judge ask #2): every
    SWEEP_SAMPLE_EVERY-th query the sweep quiesces 0.5 s and appends
    /proc/loadavg's instantaneous runnable-task count — the same
    co-process probe the composites use, extended to the sweep phase
    so a loaded closing environment is machine-evident in the artifact
    instead of inferred from trend noise afterwards (the round-9 sweep
    passed the pre-run gate at loadavg 6.4 and the contamination
    surfaced only in next-round diffs).

    ``pass_times`` (round-12): when a dict, every pass of every query
    is appended under its name — the re-run phase's spread input.
    ``segments`` (round-12): when a list, each inter-query runnable
    sample is recorded with the names run since the previous sample,
    so a hot sample maps back to exactly the queries it contaminated."""
    from sales_data_pipeline_spark.queries.base import release_persisted

    timings: dict[str, float] = {}
    n_run = 0
    seg_names: list[str] = []
    for _pass in range(2):
        for name in names:
            spec = registry.get(name)
            if spec is None:
                continue
            if cond_samples is not None and n_run % SWEEP_SAMPLE_EVERY == 0:
                sample = _runnable_now()  # 0.5s quiesce inside
                cond_samples.append(sample)
                if segments is not None:
                    # the sample just taken describes the machine DURING
                    # the segment that preceded it
                    if seg_names:
                        segments.append((sample, seg_names))
                    seg_names = []
            n_run += 1
            seg_names.append(name)
            if peek is not None:
                peek.peak_since_last()  # reset the stage watermark
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            elapsed = round(time.perf_counter() - t0, 3)
            if pass_times is not None:
                pass_times.setdefault(name, []).append(elapsed)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
            if peek is not None and peaks is not None:
                pk = peek.peak_since_last()
                if pk is not None:
                    peaks[name] = max(peaks.get(name, 0), pk)
            # queries that persist() intermediates would otherwise leak
            # cache across measurements; drop it so every query is timed
            # against a cold store (release first = precise unpersist of
            # scoped intermediates, clearCache = catch-all)
            release_persisted()
            spark.catalog.clearCache()
    if segments is not None and seg_names:
        segments.append((_runnable_now(), seg_names))
    return timings


def flag_rerun_candidates(
    pass_times: dict[str, list[float]], segments: list
) -> dict[str, list[str]]:
    """Pure selection of the re-run set (unit-pinned): a query above the
    time floor is flagged with reason 'spread' when its best two passes
    disagree beyond QUERY_SPREAD_LIMIT, and 'coload' when any sweep
    segment containing one of its passes sampled more than
    RERUN_RUNNABLE_CAP external runnable tasks. Sub-floor queries are
    never flagged — their relative jitter is scheduling noise."""
    hot: set[str] = set()
    for sample, seg in segments or []:
        if sample is not None and sample > RERUN_RUNNABLE_CAP:
            hot.update(seg)
    reasons: dict[str, list[str]] = {}
    for name, ts in pass_times.items():
        if min(ts) < RERUN_TIME_FLOOR_S:
            continue
        why = []
        if query_needs_rerun(ts):
            why.append("spread")
        if name in hot:
            why.append("coload")
        if why:
            reasons[name] = why
    return reasons


def rerun_contaminated(
    spark, registry, sf_dir,
    timings: dict[str, float],
    pass_times: dict[str, list[float]],
    segments: list,
) -> dict:
    """Round-12 per-query re-run phase (judge ask #2): queries whose
    passes disagree beyond QUERY_SPREAD_LIMIT, or whose sweep segment's
    runnable sample showed an external co-process, get extra passes on
    a machine that has been WAITED back to idle — min-of-all-passes
    stays the reported number, and the full pass history lands in the
    artifact so a contaminated first attempt is visible, not silently
    healed. Bounded by RERUN_BUDGET_S: the driver must always get its
    summary line."""
    from sales_data_pipeline_spark.queries.base import release_persisted

    reasons = flag_rerun_candidates(pass_times, segments)
    flagged = list(reasons)
    detail: dict = {
        "flagged": len(flagged),
        "budget_exhausted": False,
        "queries": {},
    }
    t_start = time.monotonic()
    for name in flagged:
        if time.monotonic() - t_start > RERUN_BUDGET_S:
            detail["budget_exhausted"] = True
            break
        spec = registry.get(name)
        if spec is None:
            continue
        q = detail["queries"].setdefault(
            name,
            {"reason": reasons[name], "extra_passes": [],
             "procs_pre": [], "waited_s": []},
        )
        for _ in range(MAX_EXTRA_QUERY_PASSES):
            n, waited = wait_runnable_idle()
            q["procs_pre"].append(n)
            q["waited_s"].append(waited)
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            el = round(time.perf_counter() - t0, 3)
            q["extra_passes"].append(el)
            pass_times[name].append(el)
            timings[name] = min(timings[name], el)
            release_persisted()
            spark.catalog.clearCache()
            if not query_needs_rerun(pass_times[name]):
                break
    detail["final_spread_ok"] = not any(
        min(ts) >= RERUN_TIME_FLOOR_S and query_needs_rerun(ts)
        for ts in pass_times.values()
    )
    return detail


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
    ap.add_argument(
        "--no-idle-wait",
        action="store_true",
        help="skip the bounded pre-JVM wait for load1 to fall idle",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from sales_data_pipeline_spark.queries.base import load_all
    from sales_data_pipeline_spark.session import build_session

    # Quiesce, then sample load BEFORE the JVM starts: once Spark is up
    # the bench itself dominates the load average and the reading
    # proves nothing.
    idle_info = wait_for_idle(enabled=not args.no_idle_wait)
    cond_start = _machine_conditions()
    load1 = (cond_start.get("loadavg") or [None])[0]
    cpus_total = cond_start.get("cpus") or 1
    load_ok = load1 is not None and load1 <= 0.25 * cpus_total

    registry = load_all()
    spark = build_session(
        "bench", extra_conf={"spark.ui.enabled": "true"}
    )

    # JVM + parquet-footer warmup so q1 doesn't pay session startup.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).count()

    # round-5/6: the reference's actual SLA workloads as composite rows
    # (CSV ingest -> bronze rejection split -> silver -> SCD2 -> gold,
    # via plans/runner) — full_refresh AND the daily incremental mode
    # (watermark-seeded delta batch). Reported SEPARATELY from the
    # headline sum so `headline_queries_total` stays definitionally
    # stable round-over-round (round-5 advisor: folding the composite
    # into `timings` inflated the total and n_queries). Fixture
    # derivation is cached and untimed; each timed run is a full
    # fresh-output execution.
    #
    # Round-8: composites run FIRST (see module docstring — the r6/r7
    # contamination both hit the tail of the run), min-of-3 with every
    # pass + an inter-pass runnable-task sample recorded.
    from sales_data_pipeline_spark.plans import bench_pipeline

    inputs = bench_pipeline.prepare_fixtures(spark, sf_dir)
    load1_composites = (_machine_conditions().get("loadavg") or [None])[0]
    composites: dict[str, float] = {}
    composites_detail: dict[str, dict] = {}
    for cname, runner in (
        ("pipeline_end_to_end", bench_pipeline.run_composite),
        ("pipeline_incremental", bench_pipeline.run_incremental),
    ):
        passes: list[float] = []
        procs_pre: list = []
        waited: list[float] = []

        def one_pass(wait_idle: bool) -> None:
            # Let the JVM quiesce (listener bus, cleanup of the prior
            # pass's tasks) so the runnable-count sample reads external
            # processes, not our own job tail — measured 3-7 runnable
            # immediately after a pass on a provably idle machine, 1-2
            # after half a second. Re-run passes additionally WAIT for
            # the external runnable count to fall idle (round-12).
            if wait_idle:
                n, w = wait_runnable_idle()
            else:
                n, w = _runnable_now(), 0.0
            procs_pre.append(n)
            waited.append(w)
            t0 = time.perf_counter()
            runner(spark, inputs)
            passes.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()

        for _pass in range(3):
            one_pass(wait_idle=False)
        # round-12 (judge ask #2): a composite whose best two passes
        # disagree beyond the limit was measured under co-load — re-run
        # until they agree or the extra-pass budget runs out, and let
        # the final spread decide load_ok instead of annotating it
        extra = 0
        while (
            best2_spread(passes) > COMPOSITE_SPREAD_LIMIT
            and extra < MAX_EXTRA_COMPOSITE_PASSES
        ):
            one_pass(wait_idle=True)
            extra += 1
        composites[cname] = min(passes)
        composites_detail[cname] = {
            "passes": passes,
            "procs_running_pre": procs_pre,
            "idle_waited_s": waited,
            "extra_passes": extra,
            "best2_spread": round(best2_spread(passes), 3),
        }
    composite_spread_ok = all(
        d["best2_spread"] <= COMPOSITE_SPREAD_LIMIT
        for d in composites_detail.values()
    )
    composites_load_ok = (
        load_ok
        and composite_spread_ok
        and all(
            p is None or p <= max(4, int(0.25 * cpus_total))
            for d in composites_detail.values()
            for p in d["procs_running_pre"]
        )
    )

    peek = StagePeak(spark)
    peaks: dict[str, int] = {}

    names = sorted(registry) if args.full else HEADLINE
    sweep_samples: list = []
    pass_times: dict[str, list[float]] = {}
    segments: list = []
    timings = run_names(
        spark, registry, names, sf_dir, peek, peaks,
        cond_samples=sweep_samples, pass_times=pass_times,
        segments=segments,
    )
    # round-12 (judge ask #2): re-run, don't just flag — queries whose
    # passes disagree or whose sweep segment was provably co-loaded get
    # extra idle-waited passes before the artifact is written
    reruns = rerun_contaminated(
        spark, registry, sf_dir, timings, pass_times, segments
    )

    total = round(sum(timings.values()), 3)
    metric = "full_catalog_total" if args.full else "headline_queries_total"

    runnable_cap = max(4, int(0.25 * cpus_total))
    sweep_load_ok = all(
        p is None or p <= runnable_cap for p in sweep_samples
    )
    cond_end = _machine_conditions()
    machine = {
        **idle_info,
        "load1_start": load1,
        "load1_end": (cond_end.get("loadavg") or [None])[0],
        "load1_composites": load1_composites,
        "procs_running_start": cond_start.get("procs_running"),
        "cpus": cpus_total,
        # the summary's load_ok is now the VERDICT (round-12): pre-JVM
        # idle AND every composite's final best-two spread inside the
        # limit after re-runs. The raw pre-JVM annotation stays as
        # load_ok_pre for round-over-round comparability.
        "load_ok": load_ok and composite_spread_ok,
        "load_ok_pre": load_ok,
        "composites_first": True,
        "composites_load_ok": composites_load_ok,
        "composite_spread_ok": composite_spread_ok,
        # round-10: inter-query runnable-task samples across the sweep
        # itself (every SWEEP_SAMPLE_EVERY queries, 0.5 s quiesce) —
        # the artifact now proves the sweep phase's environment, not
        # just the pre-JVM instant and the composites'
        "sweep_procs_samples": sweep_samples,
        "sweep_procs_max": max(
            (p for p in sweep_samples if p is not None), default=None
        ),
        "sweep_load_ok": sweep_load_ok,
        # round-12: re-run phase summary (full pass detail in the
        # --full artifact's ``reruns``; the summary line carries the
        # counts so the driver-captured tail stays bounded)
        "reruns_flagged": reruns["flagged"],
        "reruns_budget_exhausted": reruns["budget_exhausted"],
        "query_spread_ok": reruns["final_spread_ok"],
    }
    peak_max = max(peaks.values(), default=0) if peaks else None

    if args.full:
        with open(args.out, "w") as f:
            json.dump(
                {"metric": metric, "value": total, "unit": "sec",
                 "sf": sf, "queries": timings, "composites": composites,
                 "composites_detail": composites_detail,
                 "peak_mem": peaks, "machine": machine,
                 "reruns": reruns,
                 "conditions": {"start": cond_start, "end": cond_end}},
                f, indent=1, sort_keys=True,
            )
            f.write("\n")
    # Round-13 (judge ask #2): the driver's PERF diff came back empty in
    # r12 because its captured stdout tail truncated before the detail
    # line — so ALSO write the per-query dict to a small committed JSON
    # the driver (and the next round) can always diff. Versioned by the
    # next round number inferred from the BENCH_r*.json artifacts the
    # driver itself writes; a plain headline run refreshes the file,
    # --full keeps writing BENCH_FULL.json as before.
    if not args.full:
        rounds = [
            int(mm.group(1))
            for p in os.listdir(_REPO_ROOT)
            if (mm := re.match(r"BENCH_r(\d+)\.json$", p))
        ]
        detail_path = os.path.join(
            _REPO_ROOT, f"BENCH_DETAIL_r{max(rounds, default=0) + 1}.json"
        )
        with open(detail_path, "w") as f:
            json.dump(
                {"metric": metric, "value": total, "unit": "sec", "sf": sf,
                 "cpus": cpus_total, "queries": timings,
                 "composites": composites, "machine": machine},
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
                "composites_detail": composites_detail,
                "machine": machine,
                "peak_mem_max": peak_max,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
