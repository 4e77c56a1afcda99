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

# module-level per-executor cache: gazetteer fingerprint -> compiled matcher
_REGEX_CACHE: dict[int, re.Pattern] = {}
_TRIE_CACHE: dict[int, "SurfaceMatcher"] = {}


def compile_surface_regex(surfaces: tuple[str, ...]) -> re.Pattern:
    """Reference matcher: one alternation, longest-first (leftmost-longest).

    O(positions × alternatives) in CPython's backtracking engine — kept as
    the semantics oracle; the hot path is :class:`SurfaceMatcher` below
    (tests assert span-for-span equivalence)."""
    key = hash(surfaces)
    pat = _REGEX_CACHE.get(key)
    if pat is None:
        alts = sorted(surfaces, key=len, reverse=True)
        body = "|".join(re.escape(s) for s in alts)
        pat = re.compile(r"(?<!\w)(?:" + body + r")(?!\w)")
        _REGEX_CACHE[key] = pat
    return pat


_WORD_START_RE = re.compile(r"(?<!\w)\w+")
_WORD_CHAR_RE = re.compile(r"\w")


class SurfaceMatcher:
    """Gazetteer matcher with regex-identical semantics, trie-style cost.

    Candidate start positions are word starts (a (?<!\\w) boundary can only
    precede one); each position does ONE dict probe on its leading word,
    then verifies the few same-first-word surfaces longest-first with a
    string-slice compare + trailing (?!\\w) boundary check. Matches are
    non-overlapping leftmost-longest — exactly finditer over the sorted
    alternation, at O(words + verified candidates) instead of
    O(chars × |gazetteer|).
    """

    def __init__(self, surfaces: tuple[str, ...]):
        self.by_first: dict[str, list[str]] = {}
        for s in surfaces:
            m = _WORD_START_RE.search(s)
            key = m.group(0) if m else s
            self.by_first.setdefault(key, []).append(s)
        for key, lst in self.by_first.items():
            lst.sort(key=len, reverse=True)

    def finditer(self, line: str):
        n = len(line)
        last_end = 0
        for m in _WORD_START_RE.finditer(line):
            pos = m.start()
            if pos < last_end:
                continue
            candidates = self.by_first.get(m.group(0))
            if not candidates:
                continue
            for s in candidates:
                end = pos + len(s)
                if end <= n and line.startswith(s, pos) and (
                    end == n or not _WORD_CHAR_RE.match(line[end])
                ):
                    yield pos, end, s
                    last_end = end
                    break


def compile_surface_matcher(surfaces: tuple[str, ...]) -> SurfaceMatcher:
    key = hash(surfaces)
    mt = _TRIE_CACHE.get(key)
    if mt is None:
        mt = SurfaceMatcher(surfaces)
        _TRIE_CACHE[key] = mt
    return mt


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
    pattern: "re.Pattern | SurfaceMatcher",
    phrase_to_pred: dict[str, str],
) -> list[tuple[str, str, str, str]]:
    """Pure-Python core, shared with the pytest oracle.

    Sentence = one line of extracted text. Adjacent gazetteer mentions whose
    connecting text (minus trailing punctuation) is a known relation phrase
    form a triple. Accepts the regex oracle or the fast SurfaceMatcher —
    identical spans either way (tests/test_mentions.py asserts it).
    """
    out: list[tuple[str, str, str, str]] = []
    if not text:
        return out
    is_re = isinstance(pattern, re.Pattern)
    for line in text.split("\n"):
        if is_re:
            matches = [(m.start(), m.end(), m.group(0)) for m in pattern.finditer(line)]
        else:
            matches = list(pattern.finditer(line))
        for a, b in zip(matches, matches[1:]):
            mid = line[a[1] : b[0]].strip().strip(",;:").strip()
            pred = phrase_to_pred.get(mid)
            if pred is not None:
                out.append((url, a[2], pred, b[2]))
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
        pattern = compile_surface_matcher(surfaces)
        for pdf in batches:
            rows: list[tuple[str, str, str, str]] = []
            for url, text in zip(pdf["url"], pdf["text"]):
                rows.extend(extract_mention_pairs_py(url, text, pattern, phrases))
            yield pd.DataFrame(
                rows, columns=["url", "subj_surface", "pred", "obj_surface"]
            )

    return src.mapInPandas(run, schema=MENTION_PAIR_SCHEMA)
