"""Deduplication operators for LLM-corpus curation, Spark-first.

Five strategies, all expressed with built-in / higher-order functions so
the per-document work stays JVM-side and codegen'd; the only shuffles
are the unavoidable group-by-fingerprint / bucket-self-join:

 - exact:   groupBy(md5(normalized text))                — 1 shuffle
 - minhash: word-set minhash signatures -> banded LSH buckets ->
            candidate pairs -> exact-Jaccard verify      — shuffle on
            band keys only; candidate pairs ≪ n²
 - simhash: 16-bit sign-of-sum signature per doc         — no shuffle
 - ngram:   Jaccard over word sets for candidate pairs   — narrow
 - embedding: cosine near-dup (see operators/similarity) — blocked

Scale posture (100 TB): every strategy avoids n² work — LSH bands turn
near-dup detection into an equi-join on band keys, which AQE handles
like any other skewed join (salt the band key if a bucket explodes).
Signatures are tiny (k * 32 hex chars) so the band-key shuffle moves
orders of magnitude less data than the corpus itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sales_data_pipeline_spark.functions.text import content_hash, words


def word_set(text: Column) -> Column:
    """Distinct whitespace tokens (the shingle set for unigram
    minhash/Jaccard)."""
    return F.array_distinct(words(text))


def minhash_hex(word: Column, seed: int) -> Column:
    """One minhash family member: md5 of seed-prefixed word; min over a
    set of these hex strings is a uniform min-hash (string order on hex
    = numeric order on the 128-bit value)."""
    return F.md5(F.concat(F.lit(f"{seed}|"), word))


def _minhash_lambda(seed: int):
    # closure factory, NOT a default-arg lambda: pyspark's transform()
    # reads lambda arity, and a second (defaulted) parameter would be
    # bound to the array index
    return lambda w: minhash_hex(w, seed)


def minhash_signature(text: Column, k: int = 8) -> Column:
    """Array of k minhash values over the document's word set."""
    ws = word_set(text)
    return F.array(
        *[F.array_min(F.transform(ws, _minhash_lambda(s))) for s in range(k)]
    )


def band_keys(sig: Column, bands: int, rows: int) -> Column:
    """LSH banding: hash each band of ``rows`` consecutive signature
    entries; docs sharing ANY band key are candidate pairs."""
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(str(b)),
                    *[F.element_at(sig, b * rows + r + 1) for r in range(rows)],
                )
            )
            for b in range(bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter / union


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup groups: fingerprint -> (canonical keep id, dup count).
    One hash-aggregate shuffle; at scale this is the cheapest pass and
    runs first to shrink the corpus for the fuzzy passes."""
    return (
        df.select(
            F.col(id_col), content_hash(F.col(text_col)).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_docs"),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    min_jaccard: float = 0.6,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, verified with exact Jaccard.

    shingle -> k minhashes -> ``bands`` bands of k/bands rows ->
    explode band keys -> self-equi-join on band key -> distinct pairs
    -> exact Jaccard >= min_jaccard. Returns (id_a, id_b, jaccard)
    with id_a < id_b.
    """
    rows = k // bands
    sigs = df.select(
        F.col(id_col).alias("id"),
        word_set(F.col(text_col)).alias("ws"),
        minhash_signature(F.col(text_col), k).alias("sig"),
    ).select(
        "id", "ws", F.explode(band_keys(F.col("sig"), bands, rows)).alias("band")
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.ws").alias("ws_a"),
            F.col("b.ws").alias("ws_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.withColumn("jaccard", jaccard(F.col("ws_a"), F.col("ws_b")))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def _nibble(hex_char: Column) -> Column:
    """Hex digit -> 0..15 (F.conv is JVM-side)."""
    return F.conv(hex_char, 16, 10).cast("int")


def simhash16(text: Column) -> Column:
    """16-bit SimHash over the word multiset: bit j of the signature is
    the sign of sum over words of (2*bit_j(md5(word)) - 1). Computed
    entirely with array higher-order functions — per-row, no shuffle."""
    ws = words(text)
    hashes = F.transform(ws, lambda w: F.md5(w))
    bit_sums = []

    def _contrib(ci: int, sh: int):
        return lambda h: (
            F.shiftright(_nibble(F.substring(h, ci, 1)), sh) % 2
        ) * 2 - 1

    for j in range(16):
        char_idx = j // 4 + 1  # 1-based hex char within md5
        shift = 3 - (j % 4)
        contrib = F.transform(hashes, _contrib(char_idx, shift))
        bit_sums.append(
            F.aggregate(contrib, F.lit(0), lambda acc, x: acc + x)
        )
    out: Column = F.lit(0).cast("long")
    for j, s in enumerate(bit_sums):
        out = out + F.when(s >= 0, F.lit(1 << (15 - j)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_jaccard: float = 0.5,
    block_col: Column | None = None,
) -> DataFrame:
    """Word n-gram Jaccard near-dup pairs within blocks.

    Blocks bound the pair space (default: the doc's rolling fingerprint
    prefix would be a typical block); callers pass any equi-join-able
    blocking column. Within a block the join is a fine-grained
    cross-product — keep blocks small.
    """
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(words(F.col(text_col))) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(words(F.col(text_col)), i, n)),
        )
    )
    base = df.select(
        F.col(id_col).alias("id"),
        grams.alias("grams"),
        (block_col if block_col is not None else F.lit(1)).alias("block"),
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, (F.col("a.block") == F.col("b.block")) & (F.col("a.id") < F.col("b.id")))
        .withColumn("jaccard", jaccard(F.col("a.grams"), F.col("b.grams")))
        .filter(F.col("jaccard") >= min_jaccard)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            "jaccard",
        )
    )
