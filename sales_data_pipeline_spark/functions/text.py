"""Text-analysis column functions for LLM-data pipelines.

All pure Spark built-ins / higher-order functions — JVM-side, whole-stage
codegen friendly, zero Python UDFs — so they scale linearly with the
corpus: each function is a narrow per-row expression (no shuffle), and
filters on their outputs push down like any other predicate.

Capability extension beyond the reference surface (BASELINE.json north
star): language-ID heuristic, quality scoring, token counting,
document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Default stopword list (subset present in typical corpora; callers can
# pass their own).
STOPWORDS = ["the", "and", "of", "to", "in", "is", "a"]

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space
# symbol — the standard byte-pair pre-split shape (public GPT-2-style
# regex simplified to ASCII).
BPE_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

# Language marker words for the n-gram(word) heuristic. Ordered dict ->
# first-match-wins on score ties (deterministic argmax).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "is", "of"],
    "es": ["el", "la", "los", "que"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "les", "des", "est"],
    "zh": ["de", "shi", "le", "zai"],
}


def words(text: Column) -> Column:
    """Whitespace tokenization (trim first; '' -> ['''] guarded by
    callers on n_words>0)."""
    return F.split(F.trim(text), "\\s+")


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish regex token count over lowercased text."""
    return F.regexp_count(F.lower(text), F.lit(BPE_TOKEN_RE))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    sw = stopwords or STOPWORDS
    w = words(text)
    hits = F.size(F.filter(w, lambda x: x.isin(*sw)))
    return hits / F.size(w)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are neither alphanumeric nor space."""
    return (
        F.length(F.regexp_replace(F.lower(text), "[a-z0-9\\s]", ""))
        / F.length(text)
    )


def avg_word_length(text: Column) -> Column:
    return (
        F.length(F.regexp_replace(text, "\\s", "")) / F.size(words(text))
    )


def quality_score(text: Column, stopwords: list[str] | None = None) -> Column:
    """Composite heuristic quality score in [0,1]: rewards stopword
    density (natural-language-ness), reasonable length, low punctuation
    noise. Weights follow common LLM-corpus filters (C4-style)."""
    return (
        stopword_ratio(text, stopwords) * 0.5
        + F.least(token_count_ws(text) / 100.0, F.lit(1.0)) * 0.3
        + (1.0 - punct_ratio(text)) * 0.2
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-word hit counts (word-boundary regex)."""
    return {
        lang: F.regexp_count(
            F.lower(text), F.lit("\\b(" + "|".join(markers) + ")\\b")
        )
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of marker counts, first-match-wins
    on ties in LANG_MARKERS order; 'und' when no marker hits."""
    scores = lang_scores(text)
    top = F.greatest(*scores.values())
    expr = F.when(top == 0, F.lit("und"))
    for lang, score in scores.items():
        expr = expr.when(score == top, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def normalized(text: Column) -> Column:
    """Canonical form for hashing: lowercase, collapsed whitespace."""
    return F.regexp_replace(F.lower(F.trim(text)), "\\s+", " ")


def content_hash(text: Column) -> Column:
    """Exact-duplicate fingerprint: md5 of the normalized text."""
    return F.md5(normalized(text))


def rolling_fingerprint(text: Column, gram: int = 8) -> Column:
    """Winnowing-style rolling fingerprint: the minimum md5 over all
    character ``gram``-grams of the normalized text. Robust to
    reordering at the suffix (any shared window yields a candidate
    match), cheap (one pass, no shuffle)."""
    norm = normalized(text)
    n = F.greatest(F.length(norm) - (gram - 1), F.lit(1))
    starts = F.sequence(F.lit(1), n)
    return F.array_min(
        F.transform(starts, lambda i: F.md5(norm.substr(i, F.lit(gram))))
    )


def rolling_fingerprint_df(
    df, id_col: str = "doc_id", text_col: str = "text", gram: int = 8
):
    """DataFrame form of rolling_fingerprint for corpus-scale use:
    explode gram positions -> codegen md5 projection -> partial-agg MIN
    per doc. Same values as the Column form, but every stage is
    whole-stage-codegen instead of an interpreted per-row lambda (~10x
    on wide documents), and the shuffle carries one 32-hex min per
    partition per doc."""
    norm = normalized(F.col(text_col))
    pos = df.select(
        F.col(id_col).alias("id"),
        norm.alias("norm"),
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.length(norm) - (gram - 1), F.lit(1))
            )
        ).alias("i"),
    )
    return (
        pos.select(
            "id",
            F.md5(F.col("norm").substr(F.col("i"), F.lit(gram))).alias("g"),
        )
        .groupBy("id")
        .agg(F.min("g").alias("rolling_fp"))
    )
