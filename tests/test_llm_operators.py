"""Unit tests for the LLM-data extension operators: text functions,
dedup strategies, similarity search, multimodal plumbing."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from sales_data_pipeline_spark.functions import text as tx
from sales_data_pipeline_spark.operators import dedup, multimodal, similarity


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestTextFunctions:
    def test_token_counts(self, spark):
        df = _docs(spark, [(1, "  the quick brown fox  "), (2, "a b c42 d!")])
        r = {
            x.doc_id: x
            for x in df.select(
                "doc_id",
                tx.token_count_ws(F.col("text")).alias("ws"),
                tx.token_count_bpe(F.col("text")).alias("bpe"),
            ).collect()
        }
        assert r[1].ws == 4
        assert r[1].bpe == 4
        # 'c42' -> 'c' + '42'; '!' is its own token
        assert r[2].bpe == 6

    def test_stopword_and_quality(self, spark):
        df = _docs(spark, [(1, "the cat and the dog")])
        row = df.select(
            tx.stopword_ratio(F.col("text")).alias("sr"),
            tx.quality_score(F.col("text")).alias("q"),
        ).first()
        assert row.sr == pytest.approx(3 / 5)
        # 0.6*0.5 + (5/100)*0.3 + 1.0*0.2
        assert row.q == pytest.approx(0.6 * 0.5 + 0.05 * 0.3 + 0.2)

    def test_lang_id(self, spark):
        df = _docs(
            spark,
            [
                (1, "the cat and dog"),  # en markers
                (2, "el la los"),  # es markers
                (3, "xyz qqq"),  # none -> und
            ],
        )
        r = {
            x.doc_id: x.lang
            for x in df.select(
                "doc_id", tx.lang_id(F.col("text")).alias("lang")
            ).collect()
        }
        assert r[1] == "en"
        assert r[2] == "es"
        assert r[3] == "und"

    def test_fingerprints_normalize(self, spark):
        df = _docs(spark, [(1, "Hello   World"), (2, "hello world")])
        r = df.select(
            tx.content_hash(F.col("text")).alias("h"),
            tx.rolling_fingerprint(F.col("text")).alias("fp"),
        ).collect()
        assert r[0].h == r[1].h  # case/whitespace-insensitive
        assert r[0].fp == r[1].fp
        assert r[0].h == hashlib.md5(b"hello world").hexdigest()


class TestDedup:
    CORPUS = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
        (3, "alpha beta gamma delta epsilon zeta eta theta"),  # near dup
        (4, "completely different words entirely unrelated text"),
    ]

    def test_exact_duplicates(self, spark):
        out = dedup.exact_duplicates(_docs(spark, self.CORPUS))
        groups = {r.keep_id: r.n_docs for r in out.collect()}
        assert groups[1] == 2  # docs 1,2 collapse
        assert groups[3] == 1
        assert groups[4] == 1

    def test_minhash_lsh_finds_near_dups(self, spark):
        pairs = dedup.minhash_lsh_pairs(
            _docs(spark, self.CORPUS), k=8, bands=4, min_jaccard=0.5
        ).collect()
        found = {(r.id_a, r.id_b): r.jaccard for r in pairs}
        assert found[(1, 2)] == 1.0
        assert (1, 3) in found
        # word-3-gram shingles: doc1 has 4, doc3 has 6, all of doc1's
        # shingles appear in doc3 -> 4/6
        assert found[(1, 3)] == pytest.approx(4 / 6)
        assert all(p[0] != 4 and p[1] != 4 for p in found)

    def test_contamination_ratios(self, spark):
        # doc 3 contains every 3-gram of benchmark doc 1; doc 4 shares none
        bench = _docs(spark, self.CORPUS[:1])
        train = _docs(spark, self.CORPUS[2:])
        out = {
            r.id: (r.n_grams, r.n_hit, r.ratio)
            for r in dedup.contamination_ratios(train, bench).collect()
        }
        assert out[3] == (6, 4, pytest.approx(4 / 6))
        assert out[4] == (4, 0, 0.0)

    def test_simhash_similarity_structure(self, spark):
        out = {
            r.doc_id: r.sh
            for r in _docs(spark, self.CORPUS)
            .select("doc_id", dedup.simhash16(F.col("text")).alias("sh"))
            .collect()
        }
        assert out[1] == out[2]  # identical text -> identical signature
        assert 0 <= out[1] < 2**16
        ham_near = bin(out[1] ^ out[3]).count("1")
        ham_far = bin(out[1] ^ out[4]).count("1")
        assert ham_near <= ham_far  # near-dup at least as close

    def test_simhash_rows_matches_column_form_incl_null_text(self, spark):
        # simhash16_rows must be a drop-in for simhash16: same signature
        # per doc AND same cardinality — a NULL-text doc keeps its row
        # (signature 0 on both paths) instead of vanishing in explode
        rows = self.CORPUS + [(9, None)]
        df = _docs(spark, rows)
        col_form = {
            r.doc_id: r.sh
            for r in df.select(
                "doc_id", dedup.simhash16(F.col("text")).alias("sh")
            ).collect()
        }
        row_form = {
            r.id: r.sig for r in dedup.simhash16_rows(df).collect()
        }
        assert row_form == col_form
        assert row_form[9] == 0

    def test_ngram_jaccard_blocked(self, spark):
        corpus = _docs(spark, self.CORPUS)
        pairs = dedup.ngram_jaccard_pairs(
            corpus,
            n=3,
            min_jaccard=0.3,
            block=dedup.minhash_block_map(corpus, "doc_id", "text", 3),
        ).collect()
        found = {(r.id_a, r.id_b) for r in pairs}
        # expected candidates derived with the same blocking mechanism
        # in plain python (2 bands of 32-bit md5 chunk mins)
        expect = self._expected_block_pairs()
        assert (1, 2) in found
        assert found == {p for p in expect if self._jaccard(*p) >= 0.3}

    def _shingles(self, text):
        w = text.split()
        n = max(len(w) - 2, 1)
        return {" ".join(w[i : i + 3]) for i in range(n)}

    def _jaccard(self, a, b):
        sa, sb = (
            self._shingles(dict(self.CORPUS)[a]),
            self._shingles(dict(self.CORPUS)[b]),
        )
        return len(sa & sb) / len(sa | sb)

    def _expected_block_pairs(self):
        blocks = {}
        for doc_id, text in self.CORPUS:
            hs = [hashlib.md5(s.encode()).hexdigest() for s in self._shingles(text)]
            for key in (
                "0:" + min(h[0:8] for h in hs),
                "1:" + min(h[8:16] for h in hs),
            ):
                blocks.setdefault(key, set()).add(doc_id)
        pairs = set()
        for members in blocks.values():
            for x in members:
                for y in members:
                    if x < y:
                        pairs.add((x, y))
        return pairs


class TestSimilarity:
    def _emb(self, spark):
        rows = [
            (1, [1.0] + [0.0] * 63),
            (2, [0.0, 1.0] + [0.0] * 62),
            (3, [1.0] + [0.0] * 63),  # dup of 1
            (4, [0.5] * 64),
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_cosine_math(self, spark):
        df = self._emb(spark)
        a = [1.0] + [0.0] * 63
        out = {
            r.vec_id: r.cos_sim
            for r in similarity.brute_force_topk(df, a, k=4).collect()
        }
        assert out[1] == pytest.approx(1.0)
        assert out[3] == pytest.approx(1.0)
        assert out[2] == pytest.approx(0.0)
        assert out[4] == pytest.approx(0.5 / (0.5 * 8), abs=1e-6)

    def test_topk_deterministic_order(self, spark):
        df = self._emb(spark)
        top = similarity.brute_force_topk(df, [1.0] + [0.0] * 63, k=2).collect()
        assert [r.vec_id for r in top] == [1, 3]  # tie broken by id

    def test_near_dup_blocked_finds_copies(self, spark):
        pairs = similarity.embedding_near_dup_pairs(
            self._emb(spark), min_cosine=0.99, blocked=True
        ).collect()
        assert {(r.id_a, r.id_b) for r in pairs} == {(1, 3)}

    def test_lsh_bucket_consistency(self, spark):
        """Driver-side bucket formula must match the Column formula."""
        df = self._emb(spark)
        q = [1.0] + [0.0] * 63
        spark_buckets = {
            r.vec_id: r.b
            for r in df.select(
                "vec_id", similarity.lsh_bucket(F.col("embedding")).alias("b")
            ).collect()
        }
        assert spark_buckets[1] == similarity.lsh_bucket_of(q)
        assert spark_buckets[3] == spark_buckets[1]


class TestMultimodal:
    def test_decode_meta_fake(self, spark):
        df = _docs(spark, [(1, "abc"), (2, "x" * 600)])
        out = {
            r.doc_id: r
            for r in multimodal.decode_media_meta(
                multimodal.attach_binary(df), decoder="fake"
            ).collect()
        }
        assert out[1].n_bytes == 3
        assert out[1].width == 64 + 3
        assert out[1].height == 64 + 21
        assert out[2].width == 64 + 600 % 512
        assert out[1].content_hash == hashlib.md5(b"abc").hexdigest()

    def test_real_image_decoder_probed(self, spark):
        """decoder='real' is capability-probed: with PIL installed it
        decodes genuine image bytes; without it, a clear
        NotImplementedError — green either way."""
        if multimodal._have_pil():
            import io

            from PIL import Image

            buf = io.BytesIO()
            Image.new("RGB", (17, 9)).save(buf, format="PNG")
            df = spark.createDataFrame(
                [(1, buf.getvalue())], "doc_id long, media_bytes binary"
            )
            (row,) = multimodal.decode_media_meta(
                df, decoder="real"
            ).collect()
            assert (row.width, row.height) == (17, 9)
        else:
            df = multimodal.attach_binary(_docs(spark, [(1, "abc")]))
            with pytest.raises(Exception) as exc_info:
                multimodal.decode_media_meta(df, decoder="real").collect()
            assert "NotImplementedError" in str(
                exc_info.value
            ) or "not installed" in str(exc_info.value)

    def test_real_wav_decoder_works_everywhere(self, spark):
        """Audio decoder='real' parses actual RIFF/WAV headers via the
        stdlib wave module — a real-codec path with no capability gap."""
        import io
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(b"\x00\x01" * 2 * 123)  # 123 stereo frames
        df = spark.createDataFrame(
            [(7, buf.getvalue())], "doc_id long, media_bytes binary"
        )
        (row,) = multimodal.decode_audio_meta(df, decoder="real").collect()
        assert row.n_channels == 2
        assert row.sample_rate == 16000
        assert row.n_frames == 123
        assert row.sample_width == 2

    def test_frame_sampling(self, spark):
        df = multimodal.attach_binary(_docs(spark, [(1, "x" * 200)]))
        frames = multimodal.sample_frames(df, every_n_bytes=97).collect()
        assert [(r.frame_no, r.byte_offset) for r in frames] == [
            (0, 0),
            (1, 97),
            (2, 194),
        ]

    def test_batch_shape_preserved(self, spark):
        """mapInPandas must emit one row per input row across partitions."""
        df = multimodal.attach_binary(
            _docs(spark, [(i, f"text number {i}") for i in range(100)])
        ).repartition(8)
        out = multimodal.decode_media_meta(df, decoder="fake")
        assert out.count() == 100
        assert out.select("doc_id").distinct().count() == 100


def test_det_math_cross_engine():
    """similarity.lsh_bucket_of must agree with plain-python dot signs."""
    q = similarity.query_vector()
    b = similarity.lsh_bucket_of(q)
    expect = 0
    for i in range(similarity.N_PLANES):
        d = sum(
            x * p for x, p in zip(q, [float(v) for v in similarity.hyperplane(i)])
        )
        if d > 0:
            expect |= 1 << i
    assert b == expect
    assert math.isfinite(sum(q))


def test_cluster_components_transitive(spark):
    """Chain a-b-c, triangle d-e-f (plus redundant edge), isolated pair
    g-h: every node gets the min id of its component even when the two
    endpoints never shared a pair (transitivity)."""
    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3),              # chain: {1,2,3} -> 1
            (10, 11), (11, 12), (10, 12),  # triangle -> 10
            (20, 21),                    # pair -> 20
        ],
        "id_a long, id_b long",
    )
    out = {
        r["id"]: r["cluster_id"]
        for r in dedup.cluster_components(pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_multimodal_resize_and_features(spark):
    """Resize keeps w*h/64 bytes (min 1); features are 8 chunk means of
    the payload bytes, finite and order-stable."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a" * 100), (2, "xy"), (3, "")], "doc_id long, text string"
    )
    wb = multimodal.attach_binary(df, "text", "media_bytes")
    rs = {
        r["doc_id"]: r
        for r in multimodal.resize_media(wb, 16, 16, resizer="fake").collect()
    }
    assert rs[1]["n_bytes"] == 4      # 16*16/64
    assert rs[2]["n_bytes"] == 2      # shorter than target -> all bytes
    assert rs[3]["n_bytes"] == 0      # empty payload slices to empty
    assert rs[1]["width"] == 16 and rs[1]["height"] == 16

    ft = {
        r["doc_id"]: r["features"]
        for r in multimodal.extract_features(wb).collect()
    }
    assert len(ft[1]) == multimodal.N_FEATURES
    assert all(v == float(ord("a")) for v in ft[1])
    assert ft[3] == [0.0] * multimodal.N_FEATURES


def test_approx_distinct_within_hll_error_bounds(spark):
    """approx_distinct_users has no DuckDB oracle (HLL register layouts
    are engine-specific) — this pins its accuracy instead: the HLL++
    estimate must sit within 5 standard deviations of the exact
    distinct it is computed alongside (rsd=0.01 -> ±5% at 5 sigma;
    P(outside) < 1e-6, and the inputs are deterministic so this never
    flakes)."""
    from sales_data_pipeline_spark.queries.base import load_all

    rows = (
        load_all()["approx_distinct_users"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()
    )
    assert rows  # one row per event_type
    for r in rows:
        assert r.exact_users > 0
        rel_err = abs(r.approx_users - r.exact_users) / r.exact_users
        assert rel_err <= 0.05, (r.event_type, r.approx_users, r.exact_users)


class TestPCA:
    def test_loadings_match_numpy_eigh(self, spark):
        """Spark's distributed PCA fit must span the same principal
        subspace numpy finds on the collected covariance: compare each
        sign-normalized loading vector to numpy's (eigh returns
        ascending order; take the top-4 descending), allowing only
        float tolerance."""
        import numpy as np

        from sales_data_pipeline_spark.operators import similarity
        from sales_data_pipeline_spark.queries.base import table

        e = table(spark, "/root/testdata/sf0.001", "embeddings")
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
            assert np.allclose(np.array(got), ref, atol=1e-6), f"pc{c+1}"

    def test_projection_variance_descends(self, spark):
        from sales_data_pipeline_spark.queries.base import load_all

        pdf = (
            load_all()["embedding_pca_project"]
            .fn(spark, "/root/testdata/sf0.001")
            .toPandas()
        )
        variances = [pdf[f"pc{i}"].var() for i in range(1, 5)]
        assert variances == sorted(variances, reverse=True)
        assert len(pdf) == pdf["vec_id"].nunique()


def test_compression_ratio_matches_zlib(spark):
    """The mapInPandas compression scorer must equal direct zlib calls
    on the same documents (level 6, utf-8)."""
    import zlib

    from sales_data_pipeline_spark.queries.base import load_all, table

    sf = "/root/testdata/sf0.001"
    got = {
        r.doc_id: (r.raw_len, r.compressed_len, r.ratio)
        for r in load_all()["text_compression_ratio"].fn(spark, sf).collect()
    }
    docs = table(spark, sf, "documents").select("doc_id", "text").collect()
    assert len(got) == len(docs) > 0
    for r in docs:
        raw = r.text.encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        assert got[r.doc_id] == (len(raw), comp, comp / len(raw))


class TestSemDeDup:
    """semantic_dedup_semdedup (round 7): one-Lloyd-iteration k-means +
    within-cluster cosine pruning. Oracle parity is the driver's job;
    these pin the SEMANTICS."""

    def _run(self, spark, sf="/root/testdata/sf0.001"):
        from sales_data_pipeline_spark.queries.base import load_all

        return load_all()["semantic_dedup_semdedup"].fn(spark, sf).collect()

    def test_injected_exact_duplicates_flagged(self, spark):
        """The corpus injects an exact copy of every vec_id%10 vector at
        +100000: identical embeddings land in the same cluster with
        cosine 1.0, so every injected copy must flag is_dup with
        best_sim 1.0 — and its (lower-id) original must survive."""
        rows = {r.vec_id: r for r in self._run(spark)}
        originals = [i for i in rows if i < 100000 and i % 10 == 0]
        assert originals
        for i in originals:
            dup = rows[i + 100000]
            assert dup.is_dup and dup.best_sim == 1.0, dup
            assert not rows[i].is_dup or rows[i].best_sim < 1.0 or (
                # an original may itself be flagged only via some OTHER
                # lower-id near-dup, never by its own copy (copy id is
                # higher)
                rows[i].vec_id > min(originals)
            )

    def test_cluster_count_and_coverage(self, spark):
        rows = self._run(spark)
        clusters = {r.cluster for r in rows}
        assert clusters <= set(range(8))
        # Forgy init: every cluster contains at least its seed, and one
        # Lloyd step cannot empty a cluster below 1 member in this
        # corpus; at minimum several clusters must be in use
        assert len(clusters) >= 2
        # one row per corpus vector
        from sales_data_pipeline_spark.queries.base import table
        from pyspark.sql import functions as F

        e = table(spark, "/root/testdata/sf0.001", "embeddings")
        n = e.count() + e.filter(F.col("vec_id") % 10 == 0).count()
        assert len(rows) == n

    def test_non_duplicates_unflagged(self, spark):
        """Random 64-dim embeddings are near-orthogonal: no organic pair
        should reach cosine 0.96, so the ONLY is_dup rows are the
        injected copies."""
        rows = self._run(spark)
        flagged = {r.vec_id for r in rows if r.is_dup}
        assert flagged == {
            r.vec_id for r in rows
            if r.vec_id >= 100000 and (r.vec_id - 100000) % 10 == 0
        }


class TestClusterCohesion:
    """Round-9 semantic_cluster_cohesion: linear cosine-to-centroid
    quality metric over the k-means assignment (oracle-certified; these
    pin the semantics the hash can't show)."""

    def _run(self, spark):
        from sales_data_pipeline_spark.queries.base import load_all

        reg = load_all()
        return reg["semantic_cluster_cohesion"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()

    def test_covers_corpus_and_bounds(self, spark):
        from pyspark.sql import functions as F

        from sales_data_pipeline_spark.queries.base import table

        rows = self._run(spark)
        e = table(spark, "/root/testdata/sf0.001", "embeddings")
        n = e.count() + e.filter(F.col("vec_id") % 10 == 0).count()
        assert sum(r.n_vectors for r in rows) == n
        for r in rows:
            # cosine is in [-1, 1]; the mean sits between min and 1
            assert -1.0 <= r.min_cohesion <= r.mean_cohesion <= 1.0

    def test_clusters_cohere_better_than_random(self, spark):
        """Vectors are nearer their own centroid than a random 64-dim
        direction would be: mean cohesion must be clearly positive in
        every cluster (near-orthogonal corpus baseline ~0)."""
        rows = self._run(spark)
        assert rows and all(r.mean_cohesion > 0.05 for r in rows)


class TestIncrementalTokenQuantiles:
    """Round-9 mergeable histogram-state percentiles: the sketch must
    track the exact sorted percentiles within one 32-token bin."""

    def test_within_one_bin_of_exact(self, spark):
        from pyspark.sql import functions as F

        from sales_data_pipeline_spark.queries.base import load_all, table

        reg = load_all()
        row = reg["incremental_token_quantiles"].fn(
            spark, "/root/testdata/sf0.01"
        ).collect()[0]
        toks = sorted(
            table(spark, "/root/testdata/sf0.01", "documents")
            .select(
                F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n")
            )
            .rdd.map(lambda r: r.n)
            .collect()
        )
        n = len(toks)
        assert row.n_docs == n
        for q, est in (
            (0.5, row.p50_est),
            (0.9, row.p90_est),
            (0.99, row.p99_est),
        ):
            exact = toks[min(n - 1, max(0, math.ceil(q * n) - 1))]
            assert abs(est - exact) <= 32, (q, est, exact)

    def test_state_is_mergeable(self, spark):
        """Doubling the shard count must not change the merged result —
        the additive-state property that lets per-batch histograms
        union at 100 TB."""
        from sales_data_pipeline_spark.queries.base import load_all

        reg = load_all()
        spec = reg["incremental_token_quantiles"]
        base = spec.fn(spark, "/root/testdata/sf0.01").collect()[0]
        import duckdb

        con = duckdb.connect()
        try:
            con.execute(
                "CREATE VIEW documents AS SELECT * FROM "
                "'/root/testdata/sf0.01/documents.parquet'"
            )
            resharded = spec.oracle.replace("doc_id % 8", "doc_id % 16")
            alt = con.execute(resharded).fetchone()
        finally:
            con.close()
        assert (base.p50_est, base.p90_est, base.p99_est) == (
            alt[2], alt[3], alt[4],
        )
