"""S2 — trie/gazetteer mention detection + relation-pattern matching.

Vectorized pandas/Arrow path (``mapInPandas``): the gazetteer is broadcast
once per executor as a compiled leftmost-longest regex (the regex engine's
alternation over length-sorted literals IS a trie walk in C — no per-row
Python beyond the batch loop). Output is long-form mention-pair rows; the
relational rest of the pipeline (linking, dedup, graph build) stays in
Catalyst.

This is the graft of the reference's record→typed-edges emission
(`src/main/cypher/load_yelp.cql:1-111`) onto free text: pattern predicates
between adjacent mentions produce (subj_surface, pred, obj_surface).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

# module-level per-executor cache: gazetteer fingerprint -> compiled regex
_REGEX_CACHE: dict[int, re.Pattern] = {}


def compile_surface_regex(surfaces: tuple[str, ...]) -> re.Pattern:
    key = hash(surfaces)
    pat = _REGEX_CACHE.get(key)
    if pat is None:
        alts = sorted(surfaces, key=len, reverse=True)
        body = "|".join(re.escape(s) for s in alts)
        pat = re.compile(r"(?<!\w)(?:" + body + r")(?!\w)")
        _REGEX_CACHE[key] = pat
    return pat


MENTION_PAIR_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("subj_surface", StringType()),
        StructField("pred", StringType()),
        StructField("obj_surface", StringType()),
    ]
)


def extract_mention_pairs_py(
    url: str,
    text: str | None,
    pattern: re.Pattern,
    phrase_to_pred: dict[str, str],
) -> list[tuple[str, str, str, str]]:
    """Pure-Python core, shared with the pytest oracle.

    Sentence = one line of extracted text. Adjacent gazetteer mentions whose
    connecting text (minus trailing punctuation) is a known relation phrase
    form a triple.
    """
    out: list[tuple[str, str, str, str]] = []
    if not text:
        return out
    for line in text.split("\n"):
        matches = list(pattern.finditer(line))
        for a, b in zip(matches, matches[1:]):
            mid = line[a.end() : b.start()].strip().strip(",;:").strip()
            pred = phrase_to_pred.get(mid)
            if pred is not None:
                out.append((url, a.group(0), pred, b.group(0)))
    return out


def extract_mention_pairs(
    pages_with_text: DataFrame,
    surfaces: tuple[str, ...],
    phrase_to_pred: dict[str, str],
) -> DataFrame:
    """Distributed mention-pair extraction.

    Input needs (url, text). Only those two columns cross the Arrow
    boundary (column pruning — check ReadSchema in .explain()).
    """
    surfaces = tuple(surfaces)
    phrases = dict(phrase_to_pred)
    src = pages_with_text.select("url", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pattern = compile_surface_regex(surfaces)
        for pdf in batches:
            rows: list[tuple[str, str, str, str]] = []
            for url, text in zip(pdf["url"], pdf["text"]):
                rows.extend(extract_mention_pairs_py(url, text, pattern, phrases))
            yield pd.DataFrame(
                rows, columns=["url", "subj_surface", "pred", "obj_surface"]
            )

    return src.mapInPandas(run, schema=MENTION_PAIR_SCHEMA)
