"""Text-analysis operators for training-data pipelines.

Language-ID (marker-word scoring), quality scoring (length / punctuation /
stopword ratios), token counting (whitespace + word-regex), and document
fingerprinting — all pure Catalyst column expressions, designed to run as
a single projection pass over a 100 TB text corpus (no shuffle, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker words per language for the n-gram/stopword heuristic; checked in
# precedence order on score ties.
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "and", "of"]),
    ("de", ["der", "die", "und", "nicht"]),
    ("fr", ["le", "la", "et", "les"]),
    ("es", ["el", "los", "y", "que"]),
    ("zh", ["的", "了", "是"]),
]

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is"]


def tokens(text: Column) -> Column:
    return F.split(F.lower(text), " ")


def marker_score(toks: Column, markers: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(markers)))


def lang_id(text: Column) -> Column:
    """Predicted language = argmax marker-hit count, ties broken by the
    LANG_MARKERS precedence order (en first)."""
    toks = tokens(text)
    scores = [(lang, marker_score(toks, m)) for lang, m in LANG_MARKERS]
    best_lang = F.lit(scores[0][0])
    best_score = scores[0][1]
    for lang, score in scores[1:]:
        better = score > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return best_lang


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish subword proxy: count of matches of ``[a-z]+|[0-9]+|[^a-z0-9 ]``
    over lowered text (approximates pre-tokenizer units)."""
    return F.size(
        F.regexp_extract_all(F.lower(text), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
    )


def stopword_ratio(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))) / F.size(toks)


def punct_ratio(text: Column) -> Column:
    return (
        F.length(F.regexp_replace(text, r"[^.,;:!?]", "")) / F.length(text)
    )


def mean_token_len(toks: Column) -> Column:
    return F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    ) / F.size(toks)


def quality_bucket(score: Column) -> Column:
    """Reference-style case_when banding (mirrors the HAB bloom levels)."""
    return (
        F.when(score >= 0.5, "high")
        .when(score >= 0.25, "medium")
        .otherwise("low")
    )
