"""Property-based tests (hypothesis): SCD2 merge invariants over
generated change batches, and the cross-engine deterministic-rounding
contract validated directly against DuckDB."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sales_data_pipeline_spark.operators import scd2

KEYS = st.integers(min_value=1, max_value=6)
VALS = st.sampled_from(["a", "b", "c"])


def _batch_strategy():
    # dict key -> tracked value: one row per key in a batch
    return st.dictionaries(KEYS, VALS, min_size=1, max_size=6)


TRACKED = ["email"]


def _df(spark, batch: dict[int, str]):
    rows = [(k, v) for k, v in sorted(batch.items())]
    return spark.createDataFrame(rows, "customer_id int, email string")


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(b1=_batch_strategy(), b2=_batch_strategy())
def test_scd2_invariants(spark, b1, b2):
    d1 = _df(spark, b1)
    hist1 = scd2.apply_scd_type2(
        d1.limit(0), d1, "2024-01-01", tracked_cols=TRACKED
    )
    hist2 = scd2.apply_scd_type2(
        hist1, _df(spark, b2), "2024-02-01", tracked_cols=TRACKED
    )
    rows = hist2.collect()

    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.customer_id, []).append(r)

    all_keys = set(b1) | set(b2)
    assert set(by_key) == all_keys
    for k, versions in by_key.items():
        current = [r for r in versions if r.is_current]
        # exactly one current version per key, no open-ended closed rows
        assert len(current) == 1
        for r in versions:
            assert (r.valid_to is None) == bool(r.is_current)
        changed = k in b1 and k in b2 and b1[k] != b2[k]
        expected_versions = 2 if changed else 1
        assert len(versions) == expected_versions
        # current value is the latest batch's value (or carried forward
        # for keys absent from batch 2 — "deleted" keys pass through)
        assert current[0].email == b2.get(k, b1.get(k))


@settings(max_examples=100, deadline=None)
@given(
    x=st.floats(
        min_value=-1e9,
        max_value=1e9,
        allow_nan=False,
        allow_infinity=False,
    ),
    n=st.integers(min_value=0, max_value=4),
)
def test_det_round_matches_duckdb(x, n):
    """FLOOR(x*10^n + 0.5)/10^n must be bit-identical in Python and
    DuckDB — the whole determinism contract rests on this."""
    s = 10**n
    py = math.floor(x * s + 0.5) / float(s)
    (dk,) = duckdb.sql(
        f"SELECT FLOOR(CAST({x!r} AS DOUBLE) * {s} + 0.5) / {s}.0"
    ).fetchone()
    assert py == dk or (math.isnan(py) and math.isnan(dk))


@settings(max_examples=50, deadline=None)
@given(
    xs=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=20,
    )
)
def test_det_sum_matches_duckdb(xs):
    """Integer-scaled sums are order-independent and exact."""
    py = sum(math.floor(x * 100 + 0.5) for x in xs) / 100.0
    vals = ", ".join(f"({x!r})" for x in xs)
    (dk,) = duckdb.sql(
        "SELECT SUM(CAST(FLOOR(CAST(x AS DOUBLE) * 100 + 0.5) AS BIGINT)) / 100.0 "
        f"FROM (VALUES {vals}) t(x)"
    ).fetchone()
    assert py == dk


def test_scd2_tie_free_ordering(spark):
    """Window-free sanity: merging identical batches twice never
    inflates history (idempotence on unchanged data)."""
    d = spark.createDataFrame([(1, "a"), (2, "b")], "customer_id int, email string")
    h1 = scd2.apply_scd_type2(d.limit(0), d, "2024-01-01", tracked_cols=TRACKED)
    h2 = scd2.apply_scd_type2(h1, d, "2024-02-01", tracked_cols=TRACKED)
    h3 = scd2.apply_scd_type2(h2, d, "2024-03-01", tracked_cols=TRACKED)
    assert h3.count() == 2
    assert h3.filter(F.col("is_current")).count() == 2


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=25,
    )
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cluster_components_matches_union_find(spark, edges):
    """Distributed label propagation == classic union-find on random
    graphs (same node set, same min-id-per-component labels)."""
    from sales_data_pipeline_spark.operators import dedup

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    expected = {x: find(x) for x in parent}

    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in dedup.cluster_components(pairs, max_iter=40).collect()
    }
    assert got == expected


WORD = st.text(alphabet="abcx", min_size=1, max_size=4)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(WORD, min_size=1, max_size=12), min_size=1, max_size=5
    )
)
def test_shingle_rows_matches_python_reference(spark, docs):
    """The arrays_zip projection form of shingle_rows must emit exactly
    the word-3-gram MULTISET the definition implies: one gram per start
    position 0..max(len-3, 0), short docs clamped to a single
    (possibly <3-word) gram — the same contract the old lead()-window
    implementation had."""
    from sales_data_pipeline_spark.operators import dedup

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = sorted(
        (r.id, r.sh)
        for r in dedup.shingle_rows(df, "doc_id", "text", 3).collect()
    )
    expect = []
    for i, ws in enumerate(docs):
        for pos in range(max(len(ws) - 3, 0) + 1):
            expect.append((i, " ".join(ws[pos : pos + 3])))
    assert got == sorted(expect)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_zorder_key_matches_python_interleave(spark, pairs):
    """The codegen Morton key must equal the reference bit-interleave
    (a in odd positions, b in even), and ordering by it must group
    spatial neighbors the way the reference curve does."""
    from pyspark.sql import functions as F

    from sales_data_pipeline_spark.operators.distributed import zorder_key

    df = spark.createDataFrame(pairs, "a int, b int")
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }

    def ref(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    for a, b in pairs:
        assert got[(a, b)] == ref(a, b), (a, b)


def test_normalize_to_bits_nulls_and_clamps(spark):
    """NULL inputs land in bucket 0 by documented choice (they used to
    silently take the TOP bucket because least() skips nulls), and
    values outside [lo, hi] clamp to the edge buckets instead of going
    negative / past the top."""
    from pyspark.sql import functions as F

    from sales_data_pipeline_spark.operators.distributed import (
        normalize_to_bits,
    )

    df = spark.createDataFrame(
        [(0.0,), (50.0,), (100.0,), (-10.0,), (500.0,), (None,)],
        "v double",
    )
    out = [
        r.b
        for r in df.select(
            normalize_to_bits(
                F.col("v"), F.lit(0.0), F.lit(100.0), bits=8
            ).alias("b")
        ).collect()
    ]
    assert out[0] == 0
    assert out[1] == 128
    assert out[2] == 255  # hi clamps into the top bucket
    assert out[3] == 0  # below-lo clamps to 0, never negative
    assert out[4] == 255
    assert out[5] == 0  # NULL -> bucket 0, not top
    assert all(0 <= b <= 255 for b in out)


SAFE_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # no surrogates
    min_size=0,
    max_size=120,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(SAFE_TEXT, min_size=1, max_size=16))
def test_crypto_roundtrip_arbitrary_unicode(spark, texts):
    """encrypt_col -> decrypt_col is the identity for ANY unicode
    payload — including inputs the reference's char-count pad would
    crash on (our path is a strict superset) and payloads long enough
    to cross the 76-char base64 MIME-chunk boundary."""
    from sales_data_pipeline_spark.functions import crypto

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, pt string"
    )
    enc = crypto.encrypt_col(
        F.col("pt"), "prop-key", "0123456789abcdef", "prop-salt"
    )
    out = df.select(
        "i",
        "pt",
        crypto.decrypt_col(
            enc, "prop-key", "0123456789abcdef", "prop-salt"
        ).alias("back"),
        enc.alias("ct"),
    ).collect()
    for r in out:
        assert r.back == r.pt
        assert "\r" not in r.ct and "\n" not in r.ct  # unchunked format


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.text(alphabet="abcdefg", min_size=1, max_size=5),
        min_size=4,
        max_size=10,
    ),
    extra=st.lists(
        st.text(alphabet="hijklmn", min_size=1, max_size=5),
        min_size=4,
        max_size=10,
    ),
)
def test_minhash_lsh_finds_exact_duplicates(spark, words, extra):
    """LSH recall floor: EXACT duplicates have identical signatures,
    hence identical band keys in every band — minhash_lsh_pairs must
    always emit the pair with jaccard 1.0, for any document content.
    (A deterministic guarantee, unlike near-dup recall which is
    probabilistic by design.)"""
    from sales_data_pipeline_spark.operators import dedup

    t1, t2 = " ".join(words), " ".join(extra)
    df = spark.createDataFrame(
        [(1, t1), (2, t1), (3, t2)], "doc_id long, text string"
    )
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.minhash_lsh_pairs(df).collect()
    }
    assert pairs.get((1, 2)) == 1.0


# ---------------------------------------------------------------------------
# Round 11: multi-merge BPE training vs a direct greedy reference —
# extends the round-10 single-step pin (tests/test_round10_ops.py
# TestBpeMergeProperty) to the full N-iteration trainer.
# ---------------------------------------------------------------------------


def _ref_bpe_train(words: list[str], n: int) -> list[tuple]:
    """Direct reference BPE trainer: symbol-LIST state, overlapping
    pair counts, argmax by (-count, a, b), greedy left-to-right apply —
    the semantics bpe_train_merges encodes via the wrapped-separator
    string replace."""
    vocab: dict[str, int] = {}
    for w in words:
        vocab[w] = vocab.get(w, 0) + 1
    state: dict[tuple, int] = {tuple(w): wf for w, wf in vocab.items()}
    merges: list[tuple] = []
    for k in range(1, n + 1):
        pairs: dict[tuple, int] = {}
        for syms, wf in state.items():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] = pairs.get((x, y), 0) + wf
        if not pairs:
            break
        (a, b), pc = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((k, a, b, pc))
        new_state: dict[tuple, int] = {}
        for syms, wf in state.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_state[t] = new_state.get(t, 0) + wf
        state = new_state
    return merges


def _wrapped_replace_merge(syms: list[str], a: str, b: str) -> list[str]:
    """The engine's encoding: symbols as a separator-wrapped string,
    merge = one leftmost-non-overlapping str.replace (Python's replace
    has the same scan semantics as Spark's and DuckDB's)."""
    sep = "\x1f"
    rep = "".join(sep + s + sep for s in syms)
    rep = rep.replace(sep + a + sep + sep + b + sep, sep + a + b + sep)
    body = rep[1:-1]
    return body.split(sep + sep) if body else []


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=4), min_size=1,
        max_size=8,
    ),
    st.text(alphabet="ab", min_size=1, max_size=3),
    st.text(alphabet="ab", min_size=1, max_size=3),
)
def test_wrapped_replace_is_greedy_merge(syms, a, b):
    """Pure-encoding property (no engine): the wrapped-string replace
    must equal the direct greedy left-to-right symbol merge for ANY
    symbol sequence and pair — including runs ('aaa' with pair (a,a)
    merges every other position) and symbols that are substrings or
    concatenations of each other (where an unwrapped replace would
    corrupt boundaries)."""
    direct: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            direct.append(a + b)
            i += 2
        else:
            direct.append(syms[i])
            i += 1
    assert _wrapped_replace_merge(syms, a, b) == direct


def test_bpe_train_merges_matches_reference_on_fixture(spark):
    """End-to-end semantic pin on the real sf0.001 corpus: the
    registered query's full merge table equals the direct reference
    trainer run over the same whitespace-token stream."""
    import re

    from sales_data_pipeline_spark.queries.base import load_all

    sf = "/root/testdata/sf0.001"
    res = load_all()["bpe_train_merges"].fn(spark, sf).collect()
    got = sorted(
        (r.merge_rank, r.a, r.b, r.pair_count) for r in res
    )
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("text")
    words: list[str] = []
    for row in docs.collect():
        words.extend(re.split(r"\s+", row["text"].strip()))
    assert got == _ref_bpe_train(words, 8)
    assert len(got) == 8


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6),
        min_size=1,
        max_size=6,
    ).filter(lambda ws: any(len(w) >= 2 for w in ws))
)
def test_bpe_train_merges_matches_reference_generated(
    spark, tmp_path, words
):
    """The full trainer against the direct reference on generated
    corpora (runs, overlaps, repeated words). Each example gets a
    content-keyed sf_dir so workdir.materialized cannot replay a
    previous example's merge table."""
    import hashlib
    import shutil

    key = hashlib.md5(" ".join(words).encode()).hexdigest()[:12]
    d = tmp_path / f"bpe_{key}"
    d.mkdir(parents=True, exist_ok=True)
    df = spark.createDataFrame(
        [(1, " ".join(words), "en", "crafted", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    try:
        from sales_data_pipeline_spark.queries.base import load_all

        res = load_all()["bpe_train_merges"].fn(spark, str(d)).collect()
        got = sorted(
            (r.merge_rank, r.a, r.b, r.pair_count) for r in res
        )
        assert got == _ref_bpe_train(words, 8)
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(
            f"/tmp/spark_graft_mat/bpe_merges8_bpe_{key}",
            ignore_errors=True,
        )


def _ref_bpe_encode(words: list[str], merges: list[tuple]) -> int:
    """Direct reference encode: apply the merge list in rank order to
    each word (greedy left-to-right per merge), return total tokens."""
    total = 0
    for w in words:
        syms = list(w)
        for _k, a, b, _pc in merges:
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        total += len(syms)
    return total


def test_bpe_encode_matches_reference_on_fixture(spark):
    """Train+encode end-to-end semantic pin: the per-source token
    totals equal the direct reference (reference trainer's merges
    applied word-by-word, greedy per rank)."""
    import re

    from pyspark.sql import functions as F

    from sales_data_pipeline_spark.queries.base import load_all

    sf = "/root/testdata/sf0.001"
    res = {
        r["source"]: (r["n_words"], r["n_tokens"], r["n_chars"])
        for r in load_all()["bpe_encode_corpus"].fn(spark, sf).collect()
    }
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "source", "text"
    )
    all_words: list[str] = []
    per_source: dict[str, list[str]] = {}
    for row in docs.collect():
        ws = [w for w in re.split(r"\s+", row["text"].strip()) if w]
        all_words.extend(ws)
        per_source.setdefault(row["source"], []).extend(ws)
    merges = _ref_bpe_train(all_words, 8)
    assert set(res) == set(per_source)
    for src, ws in per_source.items():
        n_words, n_tokens, n_chars = res[src]
        assert n_words == len(ws)
        assert n_chars == sum(len(w) for w in ws)
        assert n_tokens == _ref_bpe_encode(ws, merges), src
        # merges strictly shrink the token stream on this corpus
        assert n_tokens < n_chars
