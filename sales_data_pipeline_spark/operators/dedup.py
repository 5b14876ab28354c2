"""Deduplication operators for LLM-corpus curation, Spark-first.

Five strategies, all expressed with built-in / higher-order functions so
the per-document work stays JVM-side and codegen'd; the only shuffles
are the unavoidable group-by-fingerprint / bucket-self-join:

 - exact:   groupBy(md5(normalized text))                — 1 shuffle
 - minhash: word-3-gram shingle minhash signatures -> banded LSH
            buckets -> candidate pairs -> exact-Jaccard verify —
            shuffle on band keys only; candidate pairs ≪ n²
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
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sales_data_pipeline_spark import scale
from sales_data_pipeline_spark.caching import scoped_persist
from sales_data_pipeline_spark.functions.text import content_hash, words

# Size gate for broadcasting corpus-scaling gram/shingle-set maps
# (gram_map_build below). Calibrated by A/B measurement (min-of-2
# passes, idle machine, both arms forced) on the round-6 scale ladder:
# at 0.6 MB of documents parquet (sf0.1) broadcast wins the 5-query
# dedup family by ~2.8 s net; at 6 MB (sf1) merge wins decisively
# (dedup_minhash_lsh 10.4 s vs 21.0 s broadcast — building and copying
# the ~300 MB HashedRelation, ~50x parquet->relation expansion,
# dominates); at ~60 MB (sf10) broadcast doesn't complete at all
# (multi-GB relation OOM). The crossover is between those measured
# points; 2 MB (~100 MB relation) takes broadcast only where it's both
# safe AND measured faster.
GRAM_MAP_BROADCAST_CAP = 2 << 20


def _source_bytes(df: DataFrame) -> int | None:
    """Footprint probe shared with the engine-wide gate (scale.py)."""
    return scale.source_bytes(df)


def source_is_small(df: DataFrame, cap: int | None = None) -> bool:
    """True only when df's file-source footprint is PROVABLY at or
    under the cap (default GRAM_MAP_BROADCAST_CAP, read at call time so
    tests can monkeypatch it) — unknowable sizes count as huge."""
    limit = GRAM_MAP_BROADCAST_CAP if cap is None else cap
    return scale.source_is_small(df, limit)


def gram_map_build(map_df: DataFrame, corpus: DataFrame) -> DataFrame:
    """Pick the build strategy for a gram/shingle-set map that scales
    WITH the corpus (one row per candidate doc, payload = the doc's
    whole shingle set).

    Catalyst cannot be trusted to choose here: the map is a cached
    collect_set aggregate whose stats undershoot wildly, so the
    unhinted plan broadcasts a multi-GB HashedRelation behind a
    <100 MB estimate and OOMs (seen at the sf10 spot-check); a
    shuffle_hash build fails one scale later (per-task build exceeds
    execution memory); a blanket merge hint is memory-safe but blocks
    AQE's runtime broadcast conversion too, taxing every small corpus.
    So the engine gates on evidence Catalyst ignores: the actual
    on-disk footprint of the corpus scan. Provably small -> broadcast
    (the fast plan, restoring ~35-70% on the sf0.1 dedup family);
    large or UNKNOWN -> sort-merge, which sorts on the bigint doc id
    and spills, bounding memory at any corpus size."""
    if source_is_small(corpus):
        return F.broadcast(map_df)
    return map_df.hint("merge")


def word_set(text: Column) -> Column:
    """Distinct whitespace tokens."""
    return F.array_distinct(words(text))


def shingle_set(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles — the canonical minhash input.

    Shingles (not unigram sets) are load-bearing at scale: on a corpus
    with a small vocabulary, unigram SETS of long documents converge to
    the whole vocabulary, making every document a near-dup of every
    other and degenerating LSH buckets to O(n²) pair explosions. Word
    n-grams keep the shingle space |vocab|^n so only genuinely
    overlapping text collides.

    Construction uses O(1) element gets per position (F.get returns
    NULL out-of-bounds and concat_ws skips NULLs, so short documents
    clamp exactly like a slice) — an F.slice per position would copy
    O(len) making the row O(len²)."""
    w = words(text)
    starts = F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(1)))

    def gram(i: Column) -> Column:
        return F.concat_ws(" ", *[F.get(w, i - 1 + j) for j in range(n)])

    return F.array_distinct(F.transform(starts, gram))


def shingle_rows(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """One row per (id, shingle) — the MULTISET of word n-grams, built
    as a PURE PROJECTION: arrays_zip the words array with its 1..n-1
    shifted slices (zip null-pads the shorter arrays; concat_ws skips
    the nulls, which clamps short docs exactly like the old lead()
    window did), posexplode the zipped array, keep starts <= len-n.
    Whole-stage codegen end-to-end (the Column-form shingle_set pays
    ~20µs/element interpretation) and ZERO shuffles — the previous
    lead()-window form hash-partitioned and sorted every exploded word
    first, which was ~60% of minhash signature time at sf0.1. Use for
    min-aggregations where multiset==set; use shingle_set when an
    actual distinct array is needed."""
    w = F.split(F.trim(F.col(text_col)), "\\s+")
    shifted = [w] + [F.slice(w, j + 1, F.size(w)) for j in range(1, n)]
    zipped = F.arrays_zip(*shifted)
    words_df = df.select(
        F.col(id_col).alias("id"),
        F.size(w).alias("_len"),
        F.posexplode(zipped).alias("_pos", "_z"),
    )
    gram = F.concat_ws(" ", *[F.col("_z")[str(j)] for j in range(n)])
    return (
        words_df.filter(F.col("_pos") <= F.greatest(F.col("_len") - n, F.lit(0)))
        .select("id", gram.alias("sh"))
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


N_MINHASH = 8  # 8 family members = 4 x 32-bit chunks of 2 md5s


def gram_words_sql(text_col: str) -> str:
    """SQL for the whitespace word array shingle pipelines split on."""
    return f"split(trim({text_col}), '\\\\s+')"


def gram_array_sql(n: int = 3, w: str = "w") -> str:
    """SQL for the word n-gram MULTISET over a word-array column ``w``
    — the same gram stream shingle_rows explodes, as a row-local HOF
    array: positions 0..max(len-n, 0), out-of-range subscripts NULL
    out and concat_ws skips them, so short docs clamp identically.
    Emitted as ONE parseable string (the py4j expression-tree tax,
    round-12 finding); wrap in array_distinct(...) where the SET is
    needed (== collect_set of the exploded rows). Element access uses
    get() — NULL out of bounds — because under ANSI mode (the Spark 4
    default) a bare subscript THROWS on the clamped short-doc
    positions instead of NULLing; test_round13_opts pins the
    equivalence on 1- and 2-word docs."""
    terms = ", ".join(f"get({w}, i + {j})" for j in range(n))
    return (
        f"transform(sequence(0, greatest(size({w}) - {n}, 0)), "
        f"i -> concat_ws(' ', {terms}))"
    )


def minhash_chunk_aggs() -> list[Column]:
    """The 8 minhash aggregates over exploded (id, h0, h1) rows:
    member i (i<4) = MIN(substr(h0, 8i+1, 8)), member 4+i =
    MIN(substr(h1, 8i+1, 8)). Chunking one md5 into four 32-bit hex
    slices gives four independent uniform hash functions for the price
    of ONE digest — the difference between 2 and 8 md5 calls per
    shingle, which dominates the signature pass."""
    return [
        F.min(F.substring(F.col("h0"), 1 + 8 * i, 8)).alias(f"mh{i}")
        for i in range(4)
    ] + [
        F.min(F.substring(F.col("h1"), 1 + 8 * i, 8)).alias(f"mh{4 + i}")
        for i in range(4)
    ]


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    min_jaccard: float = 0.6,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, verified with exact Jaccard.

    Pipeline (every stage whole-stage-codegen, no interpreted lambdas
    on the hot path — the per-row higher-order form was ~10x slower):

      1. explode shingles -> one row per (doc, shingle),
      2. project md5(shingle), md5('1|'+shingle)      [codegen]
      3. groupBy(id).agg(8 chunk MINs)  — partial aggregation combines
         map-side, so the shuffle carries ~8 hex slices per doc, not
         the exploded rows,
      4. band the signature (k/bands rows per band), explode band keys,
         self-equi-join on band key -> candidate pairs,
      5. exact-Jaccard verify >= min_jaccard, computing shingle sets
         ONLY for candidate docs (left-semi pushdown).

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    rows = k // bands
    # Round-13 rework (guide §2.4): the 8 chunk MINs are per-doc
    # scalars over the doc's OWN gram stream, so they compute
    # ROW-LOCALLY — md5 once per gram into an array, then array_min
    # over substring transforms. The previous explode + groupBy(id)
    # form shuffled one row per shingle to compute them (partial agg
    # kept the shuffle small, but the exchange and its AQE stage
    # remained). Values identical (same gram multiset, same md5
    # strings, array_min == MIN over strings) — A/B verified
    # signature-for-signature at sf0.1.
    sigs = (
        df.selectExpr(
            f"{id_col} AS id", f"{gram_words_sql(text_col)} AS w"
        )
        .selectExpr("id", f"{gram_array_sql(3)} AS g")
        .selectExpr(
            "id",
            "transform(g, x -> md5(x)) AS h0",
            "transform(g, x -> md5(concat('1|', x))) AS h1",
        )
        .selectExpr(
            "id",
            *[
                f"array_min(transform(h0, x -> substring(x, {1 + 8 * i}, 8)))"
                f" AS mh{i}"
                for i in range(4)
            ],
            *[
                f"array_min(transform(h1, x -> substring(x, {1 + 8 * i}, 8)))"
                f" AS mh{4 + i}"
                for i in range(4)
            ],
        )
    )
    band_exprs = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col(f"mh{b * rows + r}") for r in range(rows)],
            )
        )
        for b in range(bands)
    ]
    banded = sigs.select("id", F.explode(F.array(*band_exprs)).alias("band"))
    a, b = banded.alias("a"), banded.alias("b")
    # scoped-persisted: consumed 3x (both cand_ids branches + the pair
    # join); released by the caller loop right after the action
    cand = scoped_persist(
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # Jaccard verify on candidates only: shingle sets are recomputed
    # just for docs that appear in some candidate pair.
    cand_ids = (
        cand.select(F.col("id_a").alias("id"))
        .unionByName(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # Gram sets build as a row-local PROJECTION over the candidate docs
    # (round-13: array_distinct over the HOF gram array == collect_set
    # of the exploded rows — no corpus-token-volume shuffle). Still
    # scoped-persisted: BOTH pair-join branches consume it, and
    # unpersisted each branch would re-run the whole candidate
    # pipeline (semi-join included) from scratch.
    cand_docs = df.join(cand_ids, df[id_col] == cand_ids.id, "left_semi")
    shset = scoped_persist(
        cand_docs.selectExpr(
            f"{id_col} AS id", f"{gram_words_sql(text_col)} AS w"
        ).selectExpr("id", f"array_distinct({gram_array_sql(3)}) AS ws")
    )
    # size-gated build (gram_map_build): broadcast only when the corpus
    # scan's on-disk footprint proves the shingle-set map small; else
    # sort-merge, which spills — see gram_map_build for why Catalyst's
    # own estimate (a cached collect_set aggregate) cannot be trusted.
    pairs = (
        cand.join(
            gram_map_build(
                shset.select(
                    F.col("id").alias("id_a"), F.col("ws").alias("ws_a")
                ),
                df,
            ),
            "id_a",
        )
        .join(
            gram_map_build(
                shset.select(
                    F.col("id").alias("id_b"), F.col("ws").alias("ws_b")
                ),
                df,
            ),
            "id_b",
        )
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


def simhash16_rows(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, sig) SimHash via explode + ONE md5 per word + 16 bit-sums
    in a single partial aggregation. Bit-identical to simhash16 (same
    sign-of-sum definition) but ~1.9x faster at sf0.1: the Column-form
    HOF expression re-evaluates transform(words, md5) for every one of
    the 16 bits (interpreted lambdas get no common-subexpression
    elimination), while here each word hashes once in codegen and the
    bit contributions combine map-side — the shuffle carries 16 small
    integers per doc. Prefer this form whenever the caller has a
    DataFrame; simhash16 remains for per-row Column composition.

    explode_outer keeps NULL-text docs as one null-word row: every bit
    sum is then NULL, every when(s >= 0) falls through, and the doc
    gets signature 0 — the same as simhash16(NULL), so substitution in
    simhash_pairs/dedup_simhash preserves output cardinality. (words()
    never yields an empty array for non-null text: split('') == [''].)"""
    w = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(words(F.col(text_col))).alias("w"),
    )
    h = w.select("id", F.md5(F.col("w")).alias("h"))
    sums = []
    for j in range(16):
        ci = j // 4 + 1
        sh = 3 - (j % 4)
        bit = (
            F.shiftright(_nibble(F.substring(F.col("h"), ci, 1)), sh) % 2
        )
        sums.append(F.sum(bit * 2 - 1).alias(f"__s{j}"))
    g = h.groupBy("id").agg(*sums)
    sig: Column = F.lit(0).cast("long")
    for j in range(16):
        sig = sig + F.when(
            F.col(f"__s{j}") >= 0, F.lit(1 << (15 - j)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return g.select("id", sig.alias("sig"))


def minhash_block_map(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id, block) map with TWO blocking keys per doc — the mins of two
    32-bit chunks of the shingle md5 (2 x 1-row LSH bands). Pair recall
    at Jaccard j is 1-(1-j)^2 vs j for a single band; keys are
    index-prefixed so chunks never collide across bands.

    Round-13 rework (guide §2.4 — remove shuffles outright): the
    per-doc min is computed ROW-LOCALLY with array_min over the HOF
    gram transform, so the map is a pure projection — the previous
    explode + groupBy(id) form shuffled one row per shingle (corpus
    token volume) to compute a per-doc scalar. Same values: the gram
    multiset is identical to shingle_rows' (same sequence bounds, same
    concat_ws NULL-clamping for short docs), md5 of the same strings,
    and array_min's lexicographic string min equals the aggregate MIN.
    One SQL parse end-to-end (the py4j expression-tree tax, round-12
    finding)."""
    return df.selectExpr(
        f"{id_col} AS id",
        f"{gram_words_sql(text_col)} AS w",
    ).selectExpr(
        "id",
        f"transform({gram_array_sql(n)}, x -> md5(x)) AS h",
    ).selectExpr(
        "id",
        "explode(array("
        "concat('0:', array_min(transform(h, x -> substring(x, 1, 8)))), "
        "concat('1:', array_min(transform(h, x -> substring(x, 9, 8))))"
        ")) AS block",
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_jaccard: float = 0.5,
    block: Column | DataFrame | None = None,
) -> DataFrame:
    """Word n-gram Jaccard near-dup pairs within blocks.

    Blocks bound the pair space: pass an equi-join-able blocking
    Column, a precomputed (id, block) DataFrame — possibly MULTIPLE
    rows per id, i.e. multiple bands (see minhash_block_map) — or None
    for a single block (exact n² baseline; small inputs only).

    Candidate pairs are deduped across bands first; the expensive
    n-gram set materialization runs only for docs that appear in some
    candidate pair.
    """
    pairs = _blocked_gram_pairs(df, id_col, text_col, n, block)
    return (
        pairs.withColumn("jaccard", jaccard(F.col("ga"), F.col("gb")))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def _blocked_gram_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    block: Column | DataFrame | None,
) -> DataFrame:
    """Shared candidate machinery for the gram-set pair metrics:
    block-key self-join -> deduped candidate pairs -> gram sets built
    ONLY for candidate docs -> (id_a, id_b, ga, gb) rows ready for a
    set metric. Factored from ngram_jaccard_pairs so containment_pairs
    reuses the identical (audited) plan shape."""
    if isinstance(block, DataFrame):
        block_map = block
    else:
        block_map = df.select(
            F.col(id_col).alias("id"),
            (block if block is not None else F.lit(1)).alias("block"),
        )
    block_map = scoped_persist(block_map)
    a, b = block_map.alias("a"), block_map.alias("b")
    cand = (
        a.join(b, (F.col("a.block") == F.col("b.block")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # gram sets only for docs that appear in a candidate pair — built
    # as a row-local PROJECTION (round-13: array_distinct over the HOF
    # gram array == collect_set of the exploded shingle rows, no
    # shuffle; the explode+groupBy form paid a corpus-token-volume
    # exchange per query)
    cand_ids = (
        cand.select(F.col("id_a").alias("id"))
        .unionByName(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # scoped-persisted: both pair-join branches consume the gram sets;
    # unpersisted each branch re-runs the candidate pipeline
    cand_docs = df.join(cand_ids, df[id_col] == cand_ids.id, "left_semi")
    grams = scoped_persist(
        cand_docs.selectExpr(
            f"{id_col} AS id", f"{gram_words_sql(text_col)} AS w"
        ).selectExpr("id", f"array_distinct({gram_array_sql(n)}) AS grams")
    )
    # size-gated build for the same reason as minhash_lsh_pairs: the
    # gram-set map scales with the corpus and its cached-aggregate
    # stats undershoot — broadcast only on on-disk proof, else SMJ.
    return cand.join(
        gram_map_build(
            grams.select(
                F.col("id").alias("id_a"), F.col("grams").alias("ga")
            ),
            df,
        ),
        "id_a",
    ).join(
        gram_map_build(
            grams.select(
                F.col("id").alias("id_b"), F.col("grams").alias("gb")
            ),
            df,
        ),
        "id_b",
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_containment: float = 0.8,
    block: Column | DataFrame | None = None,
) -> DataFrame:
    """Asymmetric containment near-dup pairs within blocks: for each
    candidate pair, containment = |A ∩ B| / min(|A|, |B|) over word
    n-gram sets (Broder's containment coefficient). Catches the dups
    Jaccard misses by construction — a short document embedded whole
    inside a much longer one (quotation, truncation, boilerplate
    wrapper) has containment ≈ 1 but Jaccard ≈ |A|/|B|, far below any
    near-dup threshold.

    Same blocked candidate machinery as ngram_jaccard_pairs (pair
    space bounded by blocks, gram sets built only for candidates).
    Blocking bias, documented: a min-shingle block key is shared by a
    contained pair only when the SMALLER set holds the pair's minimum
    shingle (probability ~ |A|/|B| per band) — so recall degrades
    exactly on extreme containment asymmetry. Production corpora
    layer this with prefix/suffix blocks (prefix_duplicate_groups) or
    a dedicated asymmetric LSH; the operator takes any block map.

    Returns (id_a, id_b, size_a, size_b, containment) with id_a < id_b.
    """
    pairs = _blocked_gram_pairs(df, id_col, text_col, n, block)
    inter = F.size(F.array_intersect(F.col("ga"), F.col("gb")))
    small = F.least(F.size("ga"), F.size("gb"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.size("ga").cast("long").alias("size_a"),
            F.size("gb").cast("long").alias("size_b"),
            (inter / small).alias("containment"),
        )
        .filter(F.col("containment") >= min_containment)
    )


def _loop_checkpoint(df: DataFrame) -> DataFrame:
    """Materialize + truncate lineage for an iterative loop frame.

    RELIABLE ``checkpoint()`` when the SparkContext has a checkpoint dir
    configured (the cluster deployment posture: checkpoint files live on
    the shared FS, so a lost executor recovers by re-reading instead of
    failing the job — localCheckpoint blocks are unrecoverable by
    design); ``localCheckpoint()`` otherwise (local/test: no distributed
    FS required, and executor loss isn't a failure mode in a single
    JVM).

    AQE is forced OFF while the checkpoint materializes (round-7 find):
    with AQE on, the executed plan is an ``AdaptiveSparkPlanExec``,
    whose ``outputPartitioning`` reports ``UnknownPartitioning`` — so
    the LogicalRDD wrapping the checkpointed RDD silently LOSES the
    hash partitioning and every per-round join re-shuffles the edge
    set, the exact failure the partition-once design exists to prevent
    (round 6 asserted exchange-free joins; plan inspection this round
    showed Exchange on both join sides). Planned non-adaptively, the
    explicit ``repartition(parts, key)``'s HashPartitioning survives
    into the LogicalRDD and the loop joins are exchange-free — pinned
    by tests/test_round7_fixes.py. AQE is restored immediately after;
    the loop's other statements still plan adaptively. Nothing is lost
    on the checkpoint statement itself: it ends in a user-specified
    repartition, which AQE must respect anyway.

    CONCURRENCY CAVEAT (round-8, advisor): the AQE toggle is a
    session-GLOBAL conf flip — a query planned CONCURRENTLY on the
    same SparkSession during the materialization window would plan
    non-adaptively, and the restore can clobber a concurrent conf
    change. The engine's execution model is single-threaded per
    session (driver contract, bench, tests all serialize queries), so
    this is safe here; a shared-session deployment should run
    iterative loops on a dedicated ``spark.newSession()`` whose conf
    changes don't leak.

    Superseded RELIABLE checkpoint files are reclaimed by the
    ContextCleaner only under
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` — set in
    session._BASE_CONF (default false would strand one labels-sized
    directory per loop round on the shared FS). localCheckpoint blocks
    are cleaner-reclaimed unconditionally."""
    spark = df.sparkSession
    sc = spark.sparkContext
    old = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        if sc.getCheckpointDir():
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def cluster_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 15,
) -> DataFrame:
    """Connected components over the near-dup pair graph: every doc in
    some pair gets cluster_id = min doc id reachable through pairs
    (transitive closure — A~B, B~C puts A,B,C in one cluster even if
    A,C never paired). This is the step that turns pairwise dedup
    output into keep-one-per-cluster decisions.

    Iterative min-label propagation: each round every node takes the
    min of its own label and its neighbors' labels; converges in
    O(component diameter) rounds (near-dup components are shallow —
    chains of pad/copy variants). All data stays distributed; the
    driver sees ONE scalar per round (the label-sum convergence
    probe, which decreases monotonically until fixpoint). Each round's
    labels are persisted and the previous round unpersisted, so the
    active working set is one (id, label) row per node regardless of
    iteration count.

    Lineage control: every round's labels are checkpointed via
    ``_loop_checkpoint``. Plain persist caches DATA but keeps the
    logical plan, so each iteration's plan would embed the whole
    upstream pipeline again — exponential plan growth that OOMs the
    driver around 10 rounds. Checkpointing truncates the plan to the
    materialized result (the same reason GraphX checkpoints in Pregel
    loops). When the session has a checkpoint dir configured the
    checkpoint is RELIABLE (survives executor loss — on a 1000-executor
    cluster a lost node would otherwise kill the whole loop, since
    localCheckpoint blocks have no lineage to recompute from); without
    one it falls back to localCheckpoint for local/test runs. Old
    checkpoint blocks/files are reclaimed by the ContextCleaner once
    the superseded round's RDD is GC'd (``Dataset.unpersist`` can NOT
    release them — it only uncaches CacheManager entries, which is why
    the staging frame below uses persist(), the one releasable kind).

    Shuffle control: edges — the BIG side at scale (one row per pair
    vs one per node) — are hash-partitioned on ``dst`` ONCE before the
    checkpoint, with labels aligned on ``id`` at the same partition
    count (data-sized, not the cluster default: ~2M edges/partition).
    Both checkpoint flavors preserve the partitioning in the LogicalRDD,
    so the per-round ``edges ⋈ labels`` join is exchange-free on both
    sides every iteration — without this, every round re-shuffles the
    whole edge set, k times the largest shuffle in the loop."""
    sym = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).unionByName(
        pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    )
    # persist (NOT checkpoint) the staging frame: we need its count to
    # size the partitioning before the real checkpoint, and persist is
    # the only materialization unpersist() can actually release — the
    # round-6 advisor showed checkpointing here left the un-repartitioned
    # edge copy resident for the whole loop, doubling peak edge storage.
    staged = sym.distinct().persist()
    try:
        n_edges = staged.count()
        parts = int(max(2, min(2048, n_edges // 2_000_000 + 1)))
        edges = _loop_checkpoint(staged.repartition(parts, "dst"))
    finally:
        staged.unpersist()
    labels = _loop_checkpoint(
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .repartition(parts, "id")
    )
    # Scope spark.sql.shuffle.partitions to the DATA-derived ``parts``
    # for the loop body (round-13, guide §2.2): the per-round
    # groupBy/join exchanges operate on one (id,label) row per node,
    # but planned non-adaptively (the _loop_checkpoint AQE toggle)
    # they inherit the session default — 200 tasks/round under the
    # driver's vanilla session, 32 locally — pure scheduling overhead
    # at ~0.1-0.2 s per round. parts scales with the edge count
    # (~2M edges/partition), so a 100 TB graph gets wide rounds and a
    # small one narrow rounds. Same scoped-restore pattern (and the
    # same documented single-threaded-session caveat) as
    # _loop_checkpoint's AQE flip.
    sess = pairs.sparkSession
    _SP = "spark.sql.shuffle.partitions"
    try:
        prev_sp = sess.conf.get(_SP)
    except Exception:
        prev_sp = None
    sess.conf.set(_SP, str(parts))
    try:
        labels = _cc_loop(edges, labels, parts, max_iter)
    finally:
        if prev_sp is None:
            sess.conf.unset(_SP)
        else:
            sess.conf.set(_SP, prev_sp)
    return labels.select("id", F.col("label").alias("cluster_id"))


def _cc_loop(
    edges: DataFrame, labels: DataFrame, parts: int, max_iter: int
) -> DataFrame:
    """The min-label propagation rounds of cluster_components (body
    factored out so the shuffle-partition scope wraps exactly the
    loop's plans)."""
    prev_sum = None
    for _ in range(max_iter):
        neigh_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh_min, labels.id == neigh_min.src, "left_outer")
            .select(
                labels.id.alias("id"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            # re-pin hash(id, parts) before the checkpoint: AQE may
            # coalesce the round's shuffles, and a drifted labels
            # partition count would force the NEXT round to re-shuffle
            # the edge set to match — a node-sized shuffle here buys
            # edge-set immobility for the whole loop
            .repartition(parts, "id")
        )
        # convergence probe rides the checkpoint materialization as an
        # Observation (round-12 optimization): the old separate
        # agg+collect was a second full pass over the round's labels —
        # one extra job per round locally, one extra checkpoint read at
        # scale. CollectMetrics preserves the child's partitioning, so
        # the exchange-free loop-join invariant (test_round7_fixes) is
        # untouched; the observed sum is the same F.sum("label").
        from pyspark.sql import Observation

        obs = Observation()
        new_labels = _loop_checkpoint(
            new_labels.observe(obs, F.sum("label").alias("s"))
        )
        label_sum = obs.get["s"]
        # superseded rounds' checkpoints are ContextCleaner-reclaimed
        # on GC (unpersist() can't release checkpoints) — dropping the
        # reference is the release for localCheckpoint blocks always,
        # and for reliable checkpoint FILES because _BASE_CONF sets
        # spark.cleaner.referenceTracking.cleanCheckpoints=true (the
        # default false would strand one directory per round)
        labels = new_labels
        if label_sum == prev_sum:
            break
        prev_sum = label_sum
    return labels


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 2,
) -> DataFrame:
    """SimHash near-dup pairs: 16-bit signatures banded into two 8-bit
    halves (pigeonhole: any pair within hamming distance 1 shares at
    least one exact half, so recall is guaranteed at distance <= 1 and
    partial at 2 — add bands for a wider guarantee), candidate pairs
    from the band-key equi-self-join, verified by exact hamming
    distance via bit_count(xor). All integer ops — bit-identical
    cross-engine. The band join is the only shuffle; candidates are
    bounded by bucket sizes, never n²."""
    sigs = simhash16_rows(df, id_col, text_col)
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                F.concat(
                    F.lit("h:"),
                    F.shiftright(F.col("sig"), 8).cast("string"),
                ),
                F.concat(
                    F.lit("l:"),
                    (F.col("sig").bitwiseAND(F.lit(255))).cast("string"),
                ),
            )
        ).alias("band"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.id").alias("id_b"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def banded_hamming_sig_pairs(
    dsig: DataFrame,
    n_bands: int = 4,
    band_bits: int = 14,
    max_hamming: int = 6,
) -> DataFrame:
    """Signature-level near-dup pairs: the banded equi-self-join over a
    DISTINCT-signature frame (column ``sig``), verified by exact
    bit_count(xor). Returns (sig_a, sig_b, hamming) with
    sig_a < sig_b. The shared core of ``banded_hamming_pairs`` (which
    expands pairs back through group membership) and the sig-level
    graph consumers (image_phash_clusters runs connected components on
    THIS frame — one node per distinct signature, no clique edges)."""
    mask = (1 << band_bits) - 1
    bands = F.array(
        *[
            F.concat(
                F.lit(f"{b}:"),
                F.shiftright(F.col("sig"), band_bits * b)
                .bitwiseAND(F.lit(mask))
                .cast("string"),
            )
            for b in range(n_bands)
        ]
    )
    banded = dsig.select("sig", F.explode(bands).alias("band"))
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") < F.col("b.sig")),
        )
        .select(
            F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b")
        )
        .distinct()
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
    )


def banded_hamming_pairs(
    sigs: DataFrame,
    n_bands: int = 4,
    band_bits: int = 14,
    max_hamming: int = 6,
    id_col: str = "id",
    sig_col: str = "sig",
) -> DataFrame:
    """Near-dup pairs from arbitrary-width integer signatures (up to 62
    bits) by banded Hamming blocking — the generalization of
    ``simhash_pairs``'s two-band scheme to wider perceptual hashes
    (image dHash, 56-bit fingerprints). Pigeonhole: a pair within
    Hamming distance n_bands-1 shares at least one exact band, so
    recall is guaranteed at distance < n_bands and partial beyond.
    Returns (id_a, id_b, hamming) with id_a < id_b. All integer ops —
    bit-identical cross-engine.

    Scale shape (round-11 judge ask #3): identical signatures collapse
    to ONE representative BEFORE banding. Exact-duplicate images — the
    common case in a crawled corpus — previously paired inside every
    band bucket, so each exact-dup group contributed quadratic
    candidates in all n_bands buckets (the dominant term in the r11
    8.7x sf10 ratio). Now the band-key equi-self-join runs over
    DISTINCT signatures only (band buckets sized by signature
    diversity, not corpus size); verified sig pairs then expand back
    through group membership with two linear equi-joins, and same-sig
    pairs (Hamming 0) come straight from the group self-join — linear
    in the OUTPUT, which any pair-emitting contract must pay. Output
    is provably identical: every id has exactly one signature, same-sig
    pairs share all bands (always candidates, Hamming 0 <= max), and a
    cross-sig id pair survives iff its unique sig pair shares a band
    and verifies — exactly the old per-id criterion."""
    base = sigs.select(
        F.col(id_col).alias("id"), F.col(sig_col).alias("sig")
    )
    sig_pairs = banded_hamming_sig_pairs(
        base.select("sig").distinct(), n_bands, band_bits, max_hamming
    )
    cross = (
        sig_pairs.join(
            base.select(
                F.col("sig").alias("sig_a"), F.col("id").alias("id_x")
            ),
            "sig_a",
        )
        .join(
            base.select(
                F.col("sig").alias("sig_b"), F.col("id").alias("id_y")
            ),
            "sig_b",
        )
        .select(
            F.least("id_x", "id_y").alias("id_a"),
            F.greatest("id_x", "id_y").alias("id_b"),
            "hamming",
        )
    )
    ga, gb = base.alias("ga"), base.alias("gb")
    same = ga.join(
        gb,
        (F.col("ga.sig") == F.col("gb.sig"))
        & (F.col("ga.id") < F.col("gb.id")),
    ).select(
        F.col("ga.id").alias("id_a"),
        F.col("gb.id").alias("id_b"),
        F.lit(0).cast("int").alias("hamming"),
    )
    return same.unionByName(cross)


def contamination_ratios(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark-contamination check: for each training document, the
    fraction of its distinct word n-grams that also occur anywhere in
    the benchmark corpus. The standard decontamination pass a training
    pipeline runs before every model build (n-gram collision against
    held-out eval sets).

    Plan shape at 100 TB: when the benchmark side is tiny relative to
    the corpus (real eval suites are MBs) its distinct-gram set
    broadcasts — the default; the training side is one explode ->
    (id, gram) dedup -> broadcast left join -> per-doc count aggregate.
    Both shuffles carry at most one row per (doc, distinct gram) and
    partial-aggregate map-side. Counts are exact integers, so the
    ratio is a deterministic double division in any engine.

    ``broadcast_bench=False`` is the scale path for a bench side that
    GROWS with the corpus (e.g. decontaminating against another
    corpus slice): a sort-merge join on the gram key, which spills —
    the broadcast variant OOMs once the distinct-gram set outgrows
    driver memory (seen at the sf10 spot-check, where the fixture's
    bench side is a fixed fraction of the corpus).
    """
    bgrams = (
        shingle_rows(bench, id_col, text_col, n)
        .select("sh")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    tgrams = shingle_rows(train, id_col, text_col, n).dropDuplicates(
        ["id", "sh"]
    )
    bside = F.broadcast(bgrams) if broadcast_bench else bgrams.hint("merge")
    marked = tgrams.join(bside, "sh", "left")
    return marked.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("_hit").alias("n_hit"),
        (F.count("_hit") / F.count(F.lit(1))).alias("ratio"),
    )
