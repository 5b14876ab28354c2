"""Round-4 fix pins: sign-safe keep-best tie order for snowflake-scale
doc ids, composite (prefix, length-band) blocking in the fuzzy linkage,
and scoped-persist release hygiene.

Each test builds a tiny documents.parquet in tmp_path and runs the
REGISTERED query function (same code path as the driver), choosing
doc_ids indivisible by 10 and 7 so the corpus-injection unions in
``_docs_corpus`` add no extra rows.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sales_data_pipeline_spark.queries.base import (
    load_all,
    release_persisted,
)

TRILLION = 10**12

# Same resolution as tests/test_oracle_parity.py — overridable, not a
# machine-specific literal.
SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")


def _write_docs(spark, tmp_path, rows):
    """rows: list[(doc_id, text)] -> sf_dir containing documents.parquet."""
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "test", len(t) if t else 0) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{sf_dir}/documents.parquet"
    )
    return sf_dir


def _pick_ids(start, n):
    """n ids >= start with id % 10 != 0 and id % 7 != 0 (no injection)."""
    out = []
    i = start
    while len(out) < n:
        if i % 10 != 0 and i % 7 != 0:
            out.append(i)
        i += 1
    return out


class TestKeepBestSnowflakeIds:
    def test_tie_breaks_to_min_id_beyond_1e12(self, spark, tmp_path):
        # Two exact copies with snowflake-scale ids: the keeper must be
        # the LOWEST id, with no magic-constant cliff at 10^12.
        a, b, c = _pick_ids(5 * TRILLION, 3)
        rows = [
            (a, "hello world common text"),
            (b, "hello world common text"),
            # richer copy, same canonical fingerprint (punctuation only)
            (c, "hello , world . common ! text"),
        ]
        sf_dir = _write_docs(spark, tmp_path, rows)
        fn = load_all()["dedup_keep_best"].fn
        got = {r["fp"]: r.asDict() for r in fn(spark, sf_dir).collect()}
        assert len(got) == 1
        (row,) = got.values()
        assert row["n_docs"] == 3
        # the punctuated copy has 7 whitespace tokens vs 4 -> richest
        assert row["keep_id"] == c
        assert row["kept_tokens"] == 7

    def test_equal_tokens_lowest_id_wins(self, spark, tmp_path):
        ids = _pick_ids(9 * TRILLION, 2)
        rows = [(i, "alpha beta gamma") for i in ids]
        sf_dir = _write_docs(spark, tmp_path, rows)
        fn = load_all()["dedup_keep_best"].fn
        (row,) = fn(spark, sf_dir).collect()
        assert row["keep_id"] == min(ids)

    def test_null_text_excluded_both_sides(self, spark, tmp_path):
        # NULL-text docs are outside content canonicalization: they must
        # not form a group (Spark previously grouped them; DuckDB's
        # composite-key arg_max returned NULL -> driver divergence).
        ids = _pick_ids(TRILLION, 4)
        rows = [(ids[0], None), (ids[1], None), (ids[2], "x y"), (ids[3], "x y")]
        sf_dir = _write_docs(spark, tmp_path, rows)
        fn = load_all()["dedup_keep_best"].fn
        out = fn(spark, sf_dir).collect()
        assert len(out) == 1  # only the x-y group; no NULL group
        assert out[0]["keep_id"] == ids[2]


class TestFuzzyLinkageCompositeBlocking:
    PREFIX = "TEMPLATE-OPENING"  # exactly 16 chars -> one prefix block

    def test_recall_within_band_tolerance(self, spark, tmp_path):
        # lengths differ by <= 7 chars -> guaranteed compared and linked
        ids = _pick_ids(1000, 2)
        t1 = self.PREFIX + " tail"
        t2 = self.PREFIX + " tailXY"  # prefix-40 edit distance 2
        sf_dir = _write_docs(spark, tmp_path, [(ids[0], t1), (ids[1], t2)])
        fn = load_all()["fuzzy_prefix_linkage"].fn
        out = fn(spark, sf_dir).collect()
        assert [(r["id_a"], r["id_b"]) for r in out] == [(ids[0], ids[1])]

    def test_distant_lengths_outside_blocking_policy(self, spark, tmp_path):
        # IDENTICAL first 40 chars (edit distance 0 — the verify filter
        # alone would keep the pair) but trimmed lengths 2+ bands apart:
        # only the composite block key can exclude it. This is the pin
        # that fails if banding is dropped from the equi-join.
        ids = _pick_ids(2000, 2)
        base40 = (self.PREFIX + " " + "x" * 23)  # exactly 40 chars
        assert len(base40) == 40
        t1 = base40  # len 40 -> band 5
        t2 = base40 + "x" * 40  # len 80 -> band 10, same 40-char prefix
        sf_dir = _write_docs(spark, tmp_path, [(ids[0], t1), (ids[1], t2)])
        fn = load_all()["fuzzy_prefix_linkage"].fn
        assert fn(spark, sf_dir).count() == 0

    def test_adjacent_band_pair_found_via_probe(self, spark, tmp_path):
        # identical 40-char prefix, lengths ONE band apart (40 -> band 5,
        # 48 -> band 6): found only because the probe side emits
        # bands -1/0/+1 — this pin fails if the neighbor-band explode is
        # removed (equal-band-only join would miss it).
        ids = _pick_ids(4000, 2)
        base40 = (self.PREFIX + " " + "x" * 23)
        t1 = base40  # len 40, band 5
        t2 = base40 + "x" * 8  # len 48, band 6
        sf_dir = _write_docs(spark, tmp_path, [(ids[0], t1), (ids[1], t2)])
        fn = load_all()["fuzzy_prefix_linkage"].fn
        out = fn(spark, sf_dir).collect()
        assert [(r["id_a"], r["id_b"], r["edit_dist"]) for r in out] == [
            (ids[0], ids[1], 0)
        ]

    def test_hot_template_splits_across_bands(self, spark, tmp_path):
        # a corpus-wide shared opening with spread lengths: the composite
        # key must appear in the equi-join (band is part of the shuffle
        # key, so no single hot reducer holds the whole template block)
        ids = _pick_ids(3000, 24)
        rows = [
            (i, self.PREFIX + " body " + "w" * (8 * k))
            for k, i in enumerate(ids)
        ]
        sf_dir = _write_docs(spark, tmp_path, rows)
        fn = load_all()["fuzzy_prefix_linkage"].fn
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # band must be an equi-join KEY (inside the join's key list),
        # not merely a post-join filter: the physical join line renders
        # as `...Join [blk#N, band#M], [blk#P, band#Q], Inner, ...`
        import re

        join_keys = re.search(r"Join \[([^\]]*)\], \[([^\]]*)\]", plan)
        assert join_keys, plan[:400]
        assert "band" in join_keys.group(1) and "band" in join_keys.group(2)
        assert "blk" in join_keys.group(1) and "blk" in join_keys.group(2)
        # per-(blk, band) build-side occupancy is bounded: 24 docs spread
        # over >= 20 bands -> worst block holds a handful, not all 24
        occ = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(
                F.substring(F.trim("text"), 1, 16).alias("blk"),
                F.floor(F.length(F.trim("text")) / 8).alias("band"),
            )
            .groupBy("blk", "band")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert occ <= 2


def test_scoped_persists_released_after_action(spark):
    # token_bigram_pmi scoped-persists its unigram vocabulary; after the
    # consuming action + release_persisted() the query must leave ZERO
    # net cached RDDs behind (long-lived sessions run the catalog
    # repeatedly). Delta-based: the session is shared across the test
    # run and other suites may hold localCheckpoint RDDs clearCache
    # cannot drop — those are not this query's leakage.
    spark.catalog.clearCache()
    release_persisted()
    baseline = spark.sparkContext._jsc.getPersistentRDDs().size()
    fn = load_all()["token_bigram_pmi"].fn
    out = fn(spark, SF_DIR)
    assert out.count() >= 0  # materialize (populates the persisted vocab)
    release_persisted()
    spark.catalog.clearCache()
    n_cached = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert n_cached <= baseline, (
        f"{n_cached - baseline} cached RDDs linger after release"
    )


def test_sweep_reclaims_cross_thread_persists(spark):
    """Round-5 advisor: a persist registered on thread A could never be
    released by release_persisted() on thread B (thread-local registry).
    sweep_persisted() is the process-wide fallback."""
    import threading

    from sales_data_pipeline_spark.caching import (
        release_persisted as rel,
        sweep_persisted,
    )

    spark.catalog.clearCache()
    rel()
    sweep_persisted()
    baseline = spark.sparkContext._jsc.getPersistentRDDs().size()

    def build_on_other_thread():
        from sales_data_pipeline_spark.caching import scoped_persist

        df = scoped_persist(spark.range(1000))
        df.count()  # materialize the cache

    t = threading.Thread(target=build_on_other_thread)
    t.start()
    t.join()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() > baseline
    rel()  # this thread's registry is empty: must NOT reclaim it...
    assert spark.sparkContext._jsc.getPersistentRDDs().size() > baseline
    sweep_persisted()  # ...the global sweep must
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == baseline
