"""Product quantization (operators/similarity.py pq_* family).

The certifiable core is literal codebooks + exact argmin + Python-side
LUT: both engines consume the same doubles, so the catalog queries
certify cell-exact against DuckDB. These tests pin the properties the
oracle can't see: codeword distinctness (the modulus-17 guarantee),
code-domain bounds, err_micro's definition as the min-distance sum,
ADC's score being a faithful LUT lookup of the codes, and the
compression arithmetic the 100 TB story rests on.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sales_data_pipeline_spark.operators import similarity

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")


def _py_dists(vec: list[float], j: int) -> list[float]:
    sub = vec[
        j * similarity.PQ_SUBDIM : (j + 1) * similarity.PQ_SUBDIM
    ]
    out = []
    for i in range(similarity.PQ_KSUB):
        c = similarity.pq_codeword(j, i)
        d = 0.0
        for a, b in zip(sub, c):
            d = d + (float(a) - b) * (float(a) - b)
        out.append(d)
    return out


class TestCodebook:
    def test_codewords_distinct_within_subspace(self):
        """Modulus 17 > ksub must make all 16 codewords of a subspace
        distinct — an aliased pair would split argmin mass on exact
        ties and make code histograms misleading."""
        for j in range(similarity.PQ_M):
            words = [
                tuple(similarity.pq_codeword(j, i))
                for i in range(similarity.PQ_KSUB)
            ]
            assert len(set(words)) == similarity.PQ_KSUB

    def test_compression_geometry(self):
        """4 sub-codebooks x 16 codewords = 4-bit codes; the subspaces
        tile DIM exactly (a remainder would silently drop trailing
        components from every distance)."""
        assert similarity.PQ_M * similarity.PQ_SUBDIM == similarity.DIM
        assert similarity.PQ_KSUB <= 256  # fits one byte per code


class TestEncode:
    def test_codes_match_python_argmin(self, spark):
        """pq_encode's codes and err_micro must equal a plain-Python
        recomputation (first-match argmin, left-fold sums) on a sample
        of real vectors — the engine-agnostic definition."""
        e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        rows = similarity.pq_encode(e).join(
            e, "vec_id"
        ).orderBy("vec_id").limit(25).collect()
        assert rows
        for r in rows:
            vec = list(r["embedding"])
            err = 0.0
            for j in range(similarity.PQ_M):
                d = _py_dists(vec, j)
                mn = min(d)
                assert r[f"code_{j}"] == d.index(mn)
                err = err + mn
            import math

            assert r["err_micro"] == math.floor(err * 1_000_000 + 0.5)

    def test_code_domain(self, spark):
        e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        enc = similarity.pq_encode(e)
        conds = [
            (F.col(f"code_{j}") < 0)
            | (F.col(f"code_{j}") >= similarity.PQ_KSUB)
            for j in range(similarity.PQ_M)
        ]
        bad = conds[0]
        for c in conds[1:]:
            bad = bad | c
        assert enc.filter(bad).count() == 0
        assert enc.filter(F.col("err_micro") < 0).count() == 0


class TestADC:
    def test_adc_is_lut_lookup_of_codes(self, spark):
        """For every top-10 row, adc_dist must equal the rounded LUT
        sum of that row's own codes — ADC is exactly 'score the codes',
        nothing data-dependent beyond the argmin."""
        q = similarity.query_vector()
        lut = similarity.pq_lut(q)
        e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        top = similarity.pq_adc_topk(e, q, k=10)
        joined = top.join(similarity.pq_encode(e), "vec_id").collect()
        assert len(joined) == 10
        import math

        for r in joined:
            s = 0.0
            for j in range(similarity.PQ_M):
                s = s + lut[j][r[f"code_{j}"]]
            assert r["adc_dist"] == math.floor(s * 1e6 + 0.5) / 1e6

    def test_ivfpq_is_adc_restricted_to_probed_cell(self, spark):
        """ivfpq_topk must equal pq_adc_topk run over exactly the
        query's IVF cell — the composition adds pruning, never changes
        scoring."""
        q = similarity.query_vector()
        e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        probe = similarity.ivf_probe_centroid(q)
        cell = e.filter(similarity.ivf_assign(F.col("embedding")) == probe)
        expect = [
            tuple(r) for r in similarity.pq_adc_topk(cell, q, k=10).collect()
        ]
        got = [
            tuple(r) for r in similarity.ivfpq_topk(e, q, k=10).collect()
        ]
        assert got == expect
        assert 0 < len(got) <= 10

    def test_rerank_recall_curve_is_monotone_to_ten(self, spark):
        """The serving dial's contract: rerank recall@10 must be
        non-decreasing in shortlist size and reach 10/10 once the
        shortlist covers the corpus — if growing the candidate set
        ever LOST a true neighbor, the two-stage composition would be
        re-ranking something other than the shortlist."""
        from sales_data_pipeline_spark.queries.llm import pq_recall_eval

        rows = sorted(
            (r["shortlist"], r["rerank_hits_at_10"])
            for r in pq_recall_eval(spark, SF_DIR).collect()
        )
        hits = [h for _, h in rows]
        assert hits == sorted(hits)
        assert all(0 <= h <= 10 for h in hits)
        # sf0.001 corpus is ~200 vectors: the 800 shortlist is the
        # whole corpus, so the exact top-10 must fully survive
        assert hits[-1] == 10

    def test_rerank_equals_exact_when_shortlist_covers_corpus(
        self, spark
    ):
        """shortlist >= corpus makes the two-stage path degenerate to
        brute force exactly — the zero-quantization-loss endpoint of
        the dial."""
        q = similarity.query_vector()
        e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        n = e.count()
        exact = [
            tuple(r)
            for r in similarity.brute_force_topk(e, q, k=10).collect()
        ]
        rr = [
            tuple(r)
            for r in similarity.pq_rerank_topk(
                e, q, k=10, shortlist=n
            ).collect()
        ]
        assert rr == exact

    def test_stored_codes_equal_inline_adc(self, spark, tmp_path):
        """ADC over a stored code table must be row-identical to ADC
        over the raw vectors — the property that lets the same oracle
        certify both and makes the 2-byte serving read safe."""
        q = similarity.query_vector()
        e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        path = str(tmp_path / "codes")
        similarity.pq_encode(e).write.parquet(path)
        codes = spark.read.parquet(path)
        inline = [
            tuple(r) for r in similarity.pq_adc_topk(e, q, k=10).collect()
        ]
        stored = [
            tuple(r)
            for r in similarity.pq_adc_topk_codes(codes, q, k=10).collect()
        ]
        assert stored == inline

    def test_topk_total_order(self, spark):
        """Rounded score + id tie-break: the top-10 is sorted, unique,
        and stable across runs."""
        q = similarity.query_vector()
        e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        a = similarity.pq_adc_topk(e, q, k=10).collect()
        b = similarity.pq_adc_topk(e, q, k=10).collect()
        assert a == b
        keys = [(r["adc_dist"], r["vec_id"]) for r in a]
        assert keys == sorted(keys)
        assert len({r["vec_id"] for r in a}) == len(a)
