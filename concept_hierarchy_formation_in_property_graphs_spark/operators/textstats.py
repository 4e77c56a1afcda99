"""Text analysis over the ``documents`` table.

Language-ID (stopword-ratio heuristic), quality scoring, token counting and
content fingerprinting — all built-in SQL expressions (codegen'd, no UDFs),
each reproducible verbatim in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "by", "at", "this", "that",
)


def _tokens(col):
    return F.split(col, " ")


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, avg_token_len4)."""
    t = _tokens(F.col(text_col))
    return docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        F.round(
            (F.length(F.col(text_col)) - F.size(t) + 1) / F.size(t), 4
        ).alias("avg_token_len4"),
    )


def stopword_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_stop, stop_ratio4) — stopword density."""
    t = _tokens(F.col(text_col))
    stops = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stops, x)))
    return docs.select(
        "doc_id",
        n_stop.alias("n_stop"),
        F.round(n_stop / F.size(t), 4).alias("stop_ratio4"),
    )


def language_id(docs: DataFrame, text_col: str = "text",
                threshold: float = 0.05) -> DataFrame:
    """(doc_id, lang_pred) — 'en' if stopword density >= threshold."""
    t = _tokens(F.col(text_col))
    stops = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    ratio = F.size(F.filter(t, lambda x: F.array_contains(stops, x))) / F.size(t)
    return docs.select(
        "doc_id",
        F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("other")).alias("lang_pred"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, quality4) — composite in [0,1]:
    0.4·length_score + 0.3·lexical_diversity + 0.3·stopword_presence."""
    t = _tokens(F.col(text_col))
    n = F.size(t)
    stops = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    stop_ratio = F.size(F.filter(t, lambda x: F.array_contains(stops, x))) / n
    length_score = F.least(n / F.lit(100.0), F.lit(1.0))
    diversity = F.size(F.array_distinct(t)) / n
    stop_score = F.least(stop_ratio / F.lit(0.1), F.lit(1.0))
    return docs.select(
        "doc_id",
        F.round(0.4 * length_score + 0.3 * diversity + 0.3 * stop_score, 4).alias("quality4"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint) — md5 over the sorted distinct token set
    (order-insensitive content fingerprint)."""
    t = _tokens(F.col(text_col))
    return docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(t)))).alias("fingerprint"),
    )
