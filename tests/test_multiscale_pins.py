"""Second-scale pins for the four rows-only (non-SQL-expressible)
queries — round-6 verdict #6.

`approx_distinct_users`, `incremental_distinct_sketch`,
`embedding_pca_project` and `text_compression_ratio` have no DuckDB
oracle (HLL register layouts / eigensolvers / zlib are engine-specific),
so the driver records only a rows-only check for them. Their unit pins
ran at sf0.001/0.01 only; these tests re-run the SAME semantic
assertions at sf1 (10x the bench scale, materialized by
tools/scale_data.py into /tmp/sf1) so the weakest-checked queries get
the multi-scale treatment the hash-exact catalog already has.

The sf1 directory is a generated artifact, not committed testdata —
tests skip cleanly when it is absent (regenerate with
``PYTHONPATH=. python tools/scale_data.py``).
"""

from __future__ import annotations

import os

import pytest

SF1 = "/tmp/sf1"

needs_sf1 = pytest.mark.skipif(
    not os.path.isdir(SF1),
    reason="sf1 dataset not materialized (tools/scale_data.py)",
)


def _sfs(small: str):
    return [small, pytest.param(SF1, marks=needs_sf1)]


class TestApproxDistinctMultiScale:
    @pytest.mark.parametrize("sf_dir", _sfs("/root/testdata/sf0.01"))
    def test_within_hll_error_bounds(self, spark, sf_dir):
        """HLL++ estimate within 5%% of the exact distinct it is
        computed alongside (rsd=0.01 -> ±5%% at 5 sigma; deterministic
        inputs, never flakes). At sf1 the per-type cardinalities are
        ~10x sf0.1's — the registers are exercised well past the
        sparse-encoding regime."""
        from sales_data_pipeline_spark.queries.base import load_all

        rows = load_all()["approx_distinct_users"].fn(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.exact_users > 0
            rel = abs(r.approx_users - r.exact_users) / r.exact_users
            assert rel <= 0.05, (sf_dir, r.event_type, r.approx_users,
                                 r.exact_users)


class TestDistinctSketchMultiScale:
    @pytest.mark.parametrize("sf_dir", _sfs("/root/testdata/sf0.001"))
    def test_merged_sketches_match_global_and_bound_error(
        self, spark, sf_dir
    ):
        from sales_data_pipeline_spark.queries.base import load_all

        rows = (
            load_all()["incremental_distinct_sketch"]
            .fn(spark, sf_dir)
            .collect()
        )
        assert rows
        for r in rows:
            # merged-vs-onepass within the sketch error envelope (the
            # sf1 run of this pin falsified the old EXACT-equality
            # claim: HIP vs composite estimators diverge ~1 rsd once
            # the sketch leaves the sparse regime)
            assert r.merge_consistent, (sf_dir, r)
            assert abs(r.n_sketch - r.n_exact) <= max(
                2, 0.05 * r.n_exact
            ), (sf_dir, r)
            assert abs(r.n_merged - r.n_exact) <= max(
                2, 0.05 * r.n_exact
            ), (sf_dir, r)


class TestPCAMultiScale:
    @pytest.mark.parametrize("sf_dir", _sfs("/root/testdata/sf0.001"))
    def test_loadings_match_numpy_eigh(self, spark, sf_dir):
        """The distributed PCA fit must span the same principal
        subspace numpy finds on the collected covariance — at sf1 that
        is 20k x 64 vectors, enough rows that any partial-aggregation
        drift in the covariance sums would show."""
        import numpy as np

        from sales_data_pipeline_spark.operators import similarity
        from sales_data_pipeline_spark.queries.base import table

        e = table(spark, sf_dir, "embeddings")
        loadings = similarity.pca_loadings(e, "embedding", k=4)

        x = np.array(
            [r.embedding for r in e.select("embedding").collect()],
            dtype=np.float64,
        )
        cov = np.cov(x, rowvar=False, bias=False)
        vals, vecs = np.linalg.eigh(cov)
        order = np.argsort(vals)[::-1][:4]
        for c, got in enumerate(loadings):
            ref = vecs[:, order[c]]
            pivot = max(range(len(ref)), key=lambda i: (abs(ref[i]), -i))
            if ref[pivot] < 0:
                ref = -ref
            assert np.allclose(
                np.array(got), ref, atol=1e-6
            ), (sf_dir, f"pc{c + 1}")

    @pytest.mark.parametrize("sf_dir", _sfs("/root/testdata/sf0.001"))
    def test_projection_variance_descends(self, spark, sf_dir):
        from sales_data_pipeline_spark.queries.base import load_all

        pdf = (
            load_all()["embedding_pca_project"].fn(spark, sf_dir).toPandas()
        )
        variances = [pdf[f"pc{i}"].var() for i in range(1, 5)]
        assert variances == sorted(variances, reverse=True), sf_dir
        assert len(pdf) == pdf["vec_id"].nunique()


class TestCompressionRatioMultiScale:
    @pytest.mark.parametrize("sf_dir", _sfs("/root/testdata/sf0.001"))
    def test_matches_zlib(self, spark, sf_dir):
        """mapInPandas compression scores equal direct zlib calls
        (level 6, utf-8). At sf0.001 every document is checked; at sf1
        the query still runs over ALL 50k docs, and a deterministic
        doc_id %% 97 == 0 subset (~500 docs spanning every replica) is
        re-compressed driver-side for equality."""
        import zlib

        from pyspark.sql import functions as F

        from sales_data_pipeline_spark.queries.base import load_all, table

        out = load_all()["text_compression_ratio"].fn(spark, sf_dir)
        full_check = sf_dir.endswith("sf0.001")
        if not full_check:
            out = out.filter(F.col("doc_id") % 97 == 0)
        got = {
            r.doc_id: (r.raw_len, r.compressed_len, r.ratio)
            for r in out.collect()
        }
        docs = table(spark, sf_dir, "documents").select("doc_id", "text")
        if not full_check:
            docs = docs.filter(F.col("doc_id") % 97 == 0)
        rows = docs.collect()
        assert len(got) == len(rows) > 0
        for r in rows:
            raw = r.text.encode("utf-8")
            comp = len(zlib.compress(raw, 6))
            assert got[r.doc_id] == (
                len(raw), comp, comp / len(raw)
            ), (sf_dir, r.doc_id)
