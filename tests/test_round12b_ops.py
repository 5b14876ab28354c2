"""Round-12 session-2 pins: the four new training-data-pipeline queries.

 - segment_dedup_rewrite: the injected exact-copy docs must rewrite to
   EMPTY (every segment already seen at a smaller (doc_id, seg_idx)),
   the originals must survive intact, and kept-segment totals must
   equal the distinct-segment count corpus-wide;
 - dsir_importance_weights: target-domain docs must score higher than
   raw docs on average (the defining property of an importance weight),
   and weights must be finite;
 - ann_matryoshka_recall: the full-width rung is exact by construction
   (recall 1.0), every rung reports, overlaps stay in [0, 10];
 - dedup_containment_pairs / containment_pairs: the injected pad
   near-dups are full-containment pairs (containment 1.0) at unequal
   set sizes — the asymmetric case Jaccard under-scores — and every
   containment exceeds the pair's Jaccard by definition.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _registry():
    from sales_data_pipeline_spark.queries.base import load_all

    return load_all()


@pytest.fixture(scope="module")
def seg_rows(spark):
    rows = _registry()["segment_dedup_rewrite"].fn(spark, SF_DIR).collect()
    return {r["doc_id"]: r for r in rows}


class TestSegmentDedupRewrite:
    def test_exact_copies_rewrite_to_empty(self, seg_rows):
        # _docs_corpus injects doc_id+100000 as byte-identical copies of
        # doc_id%10==0 originals; the original holds the smaller doc_id,
        # so every segment of the copy is a corpus-level duplicate.
        copies = [r for d, r in seg_rows.items() if 100000 <= d < 200000]
        assert copies, "injected exact copies missing from corpus"
        for r in copies:
            assert r["n_kept"] == 0, r
            assert r["n_words_kept"] == 0, r
            assert r["rebuilt_hash"] is None, r

    def test_first_occurrence_survives_whole(self, seg_rows):
        import duckdb

        # originals that collide with nothing EARLIER keep everything;
        # verify per-doc segment counts against a direct recount of one
        # untouched original (doc_id 0 is the globally first doc).
        r0 = seg_rows[0]
        n_words = duckdb.sql(
            f"SELECT len(regexp_split_to_array(trim(text), '\\s+')) "
            f"FROM '{SF_DIR}/documents.parquet' WHERE doc_id = 0"
        ).fetchone()[0]
        assert r0["n_words_kept"] == n_words
        assert r0["n_kept"] == r0["n_segments"]
        assert r0["rebuilt_hash"] is not None

    def test_kept_equals_distinct_segments(self, spark, seg_rows):
        # exactly one instance of every distinct segment hash survives
        from pyspark.sql import functions as F

        from sales_data_pipeline_spark.queries import llm

        c = llm._docs_corpus(spark, SF_DIR)
        w = F.split(F.trim(F.col("text")), r"\s+")
        seg = c.select(
            "doc_id",
            w.alias("w"),
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size(w), F.lit(1)),
                    F.lit(llm.SEG_WORDS),
                )
            ).alias("start"),
        ).select(
            F.md5(
                F.array_join(
                    F.slice(F.col("w"), F.col("start"), llm.SEG_WORDS), " "
                )
            ).alias("h")
        )
        n_distinct = seg.select("h").distinct().count()
        assert sum(r["n_kept"] for r in seg_rows.values()) == n_distinct


class TestDsirImportanceWeights:
    def test_target_scores_above_raw(self, spark):
        rows = (
            _registry()["dsir_importance_weights"].fn(spark, SF_DIR).collect()
        )
        tgt = [r["logw_per_token"] for r in rows if r["is_target"]]
        raw = [r["logw_per_token"] for r in rows if not r["is_target"]]
        assert tgt and raw
        # the importance weight's defining property: documents FROM the
        # target domain score higher under log p_tgt/p_raw on average
        assert sum(tgt) / len(tgt) > sum(raw) / len(raw)
        for r in rows:
            assert r["n_tokens"] > 0
            assert abs(r["logw_sum"]) < 1e6  # finite, sane magnitude


class TestMatryoshkaRecall:
    def test_rungs_and_full_width_exact(self, spark):
        rows = _registry()["ann_matryoshka_recall"].fn(spark, SF_DIR).collect()
        by_dim = {r["trunc_dim"]: r for r in rows}
        from sales_data_pipeline_spark.queries.llm import _MRL_DIMS

        assert set(by_dim) == set(_MRL_DIMS)
        assert by_dim[64]["n_overlap"] == 10
        assert by_dim[64]["recall_at_10"] == 1.0
        for r in rows:
            assert 0 <= r["n_overlap"] <= 10
            assert r["recall_at_10"] == r["n_overlap"] / 10.0


class TestContainmentPairs:
    @pytest.fixture(scope="class")
    def pairs(self, spark):
        df = _registry()["dedup_containment_pairs"].fn(spark, SF_DIR)
        return df.collect()

    def test_injected_pad_dups_fully_contained(self, pairs):
        # (d, d+200000) injected near-dups: the original's shingle set
        # is a subset of the padded copy's, so containment is exactly 1
        # at UNEQUAL sizes — the asymmetric signature.
        full = [
            r
            for r in pairs
            if r["id_b"] == r["id_a"] + 200000
            and r["containment"] == 1.0
            and r["size_a"] != r["size_b"]
        ]
        assert full, "injected containment pairs not detected"

    def test_containment_dominates_jaccard(self, pairs):
        # |A∩B|/min >= |A∩B|/|A∪B| always; with unequal sizes, strictly
        for r in pairs:
            inter_over_min = r["containment"]
            assert inter_over_min >= 0.8
            assert r["size_a"] > 0 and r["size_b"] > 0

    def test_operator_matches_definition(self, spark):
        # tiny direct fixture: B = A's text + extra tail => containment
        # 1.0 regardless of the tail length; an unrelated doc pairs with
        # nothing above threshold.
        from sales_data_pipeline_spark.operators import dedup

        a = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [
            (1, a),
            (2, a + " iota kappa lamda mu nu xi omicron pi rho sigma"),
            (3, "one two three four five six seven eight nine ten"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = dedup.containment_pairs(df, min_containment=0.9).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["id_a"], r["id_b"]) == (1, 2)
        assert r["containment"] == 1.0
        assert r["size_a"] < r["size_b"]


class TestKneserNey:
    def test_same_bigram_stream_as_addk_baseline(self, spark):
        # identical extraction => identical per-doc bigram counts; only
        # the smoothing differs between the two LM scorers
        kn = {
            r["doc_id"]: r
            for r in _registry()["kneser_ney_bigram_scores"]
            .fn(spark, SF_DIR)
            .collect()
        }
        addk = {
            r["doc_id"]: r["n_bigrams"]
            for r in _registry()["bigram_perplexity_scores"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(kn) == set(addk)
        for d, r in kn.items():
            assert r["n_bigrams"] == addk[d]
            # interpolated KN assigns every seen bigram P in (0, 1]
            assert 0.0 <= r["kn_bits_per_token"] < 64

    def test_discount_reserves_probability_mass(self):
        import duckdb

        # model-level invariant: for every context a, the sum of
        # interpolated-KN P(b|a) over SEEN continuations is <= 1
        # (strictly < 1 whenever the discount withheld mass that the
        # continuation distribution spreads over unseen words too)
        top = duckdb.sql(
            f"""
            WITH ws AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
              FROM '{SF_DIR}/documents.parquet'
            ),
            bg AS (
              SELECT w[i] AS a, w[i+1] AS b
              FROM ws CROSS JOIN LATERAL unnest(
                generate_series(1, greatest(len(w) - 1, 0))) t(i)
            ),
            bgc AS (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY a, b),
            ctx AS (SELECT a, SUM(c_ab) AS c_a, count(*) AS n1a
                    FROM bgc GROUP BY a),
            cont AS (SELECT b, count(*) AS n1b FROM bgc GROUP BY b),
            tt AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM bgc)
            SELECT a, SUM(
              GREATEST(CAST(c_ab AS DOUBLE) - 0.75, 0.0) / c_a
              + (0.75 * n1a / c_a) * (n1b / t)) AS mass
            FROM bgc JOIN ctx USING (a) JOIN cont USING (b) CROSS JOIN tt
            GROUP BY a ORDER BY mass DESC LIMIT 5
            """
        ).fetchall()
        assert top
        for _, mass in top:
            assert mass <= 1.0 + 1e-9


class TestCrossSourceOverlap:
    def test_matrix_shape_and_normalizers(self, spark):
        import duckdb

        rows = (
            _registry()["cross_source_overlap_matrix"]
            .fn(spark, SF_DIR)
            .collect()
        )
        n_src = duckdb.sql(
            f"SELECT count(DISTINCT source) "
            f"FROM '{SF_DIR}/documents.parquet'"
        ).fetchone()[0]
        assert 0 < len(rows) <= n_src * (n_src - 1) // 2
        for r in rows:
            assert r["src_a"] < r["src_b"]
            assert 0 < r["shared_shingles"] <= min(r["n_a"], r["n_b"])
            assert 0.0 < r["overlap"] <= 1.0


class TestZipfFit:
    def test_fit_is_sane_and_negative(self, spark):
        rows = _registry()["token_zipf_fit"].fn(spark, SF_DIR).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["n_top"] > 0
        # rank-frequency over the vocabulary head must slope DOWN; r2
        # stays a bounded diagnostic (the synthetic corpus's near-
        # uniform ~31-word vocabulary is deliberately NOT Zipfian, so
        # the fit quality itself is data, not an invariant)
        assert r["zipf_slope"] < 0
        assert 0.0 <= r["r2"] <= 1.0

    def test_intercept_predicts_head_frequency(self, spark):
        import duckdb
        import math

        r = _registry()["token_zipf_fit"].fn(spark, SF_DIR).collect()[0]
        top_cnt = duckdb.sql(
            f"""SELECT count(*) AS c FROM (
                  SELECT unnest(regexp_split_to_array(trim(text), '\\s+'))
                    AS w FROM '{SF_DIR}/documents.parquet')
                GROUP BY w ORDER BY c DESC LIMIT 1"""
        ).fetchone()[0]
        # at rank 1, ln(rank)=0 => prediction = intercept; fitted over
        # a Zipf-ish head it lands within an order of magnitude
        assert abs(r["zipf_intercept"] - math.log(top_cnt)) < 2.5


class TestEmbeddingOutliers:
    def test_topk_shape_and_rank_order(self, spark):
        rows = (
            _registry()["embedding_outlier_scores"].fn(spark, SF_DIR).collect()
        )
        by_label: dict[int, list] = {}
        for r in rows:
            by_label.setdefault(r["label"], []).append(r)
        assert by_label
        for label, rs in by_label.items():
            rs.sort(key=lambda r: r["rnk"])
            assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
            assert len(rs) <= 10
            scores = [r["outlier_score"] for r in rs]
            assert scores == sorted(scores, reverse=True)
            assert all(s >= 0 for s in scores)

    def test_injected_outlier_surfaces(self, spark):
        # shift one vector far outside its label cloud: it must become
        # that label's rank-1 outlier
        from pyspark.sql import functions as F

        from sales_data_pipeline_spark.queries.base import load_all

        e = (
            load_all()["embedding_outlier_scores"]
            .fn(spark, SF_DIR)
            .sparkSession.read.parquet(f"{SF_DIR}/embeddings.parquet")
        )
        spiked = e.withColumn(
            "embedding",
            F.when(
                F.col("vec_id") == 0,
                F.transform("embedding", lambda v: v + F.lit(30.0)),
            ).otherwise(F.col("embedding")),
        )
        spiked.createOrReplaceTempView("_spiked")
        lbl0 = e.filter(F.col("vec_id") == 0).collect()[0]["label"]
        # rebuild the operator inline on the spiked frame
        import types

        from sales_data_pipeline_spark.queries import llm

        spark2 = spiked.sparkSession
        orig_table = llm.table
        try:
            llm.table = lambda s, d, n: (
                spiked if n == "embeddings" else orig_table(s, d, n)
            )
            out = llm.embedding_outlier_scores(spark2, SF_DIR).collect()
        finally:
            llm.table = orig_table
        top = [r for r in out if r["label"] == lbl0 and r["rnk"] == 1]
        assert top and top[0]["vec_id"] == 0
