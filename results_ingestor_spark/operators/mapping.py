"""Fuzzy header mapping + mapping application — ingestor_precinct.py:125-164.

``suggest_mapping`` is a pure driver-side metadata function (it sees
column *names*, never data — no Spark job).  The reference uses
fuzzywuzzy's WRatio with a >60 threshold and a ``candidate``→``choice``
fallback (ingestor_precinct.py:126-129); ``wratio`` below is a
dependency-free reimplementation of that published algorithm
(difflib-backed, as fuzzywuzzy runs without python-Levenshtein):
full-process normalization, plain ratio, and the partial / token-sort /
token-set family combined under WRatio's length-ratio weighting rules.

``apply_mapping`` is the data path (ingestor_precinct.py:155-164):
constant-fill unmatched targets (literal date parse for election_date),
project to mapped columns, rename to canonical names.  All narrow
plan nodes — constant folding and column pruning are Catalyst's.
"""

from __future__ import annotations

import difflib
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MATCH_THRESHOLD = 60  # ingestor_precinct.py:129

# \W == [^a-zA-Z0-9_]: underscores survive normalization, matching the
# tokenization the reference's scorer applies to header names.
_NON_WORD = re.compile(r"\W+")


def _full_process(s: str) -> str:
    return _NON_WORD.sub(" ", s).lower().strip()


def _intr(x: float) -> int:
    return int(round(x))


def _ratio(a: str, b: str) -> int:
    if not a and not b:
        return 100
    return _intr(100 * difflib.SequenceMatcher(None, a, b).ratio())


def _partial_ratio(a: str, b: str) -> int:
    """Best ratio of the shorter string vs any same-length alignment of
    the longer, anchored at difflib's matching blocks."""
    shorter, longer = (a, b) if len(a) <= len(b) else (b, a)
    if not shorter:
        return 100 if not longer else 0
    blocks = difflib.SequenceMatcher(None, shorter, longer).get_matching_blocks()
    best = 0.0
    for block in blocks:
        start = max(block[1] - block[0], 0)
        window = longer[start:start + len(shorter)]
        r = difflib.SequenceMatcher(None, shorter, window).ratio()
        if r > 0.995:
            return 100
        best = max(best, r)
    return _intr(100 * best)


def _sorted_tokens(s: str) -> str:
    return " ".join(sorted(s.split())).strip()


def _token_sort(a: str, b: str, partial: bool) -> int:
    f = _partial_ratio if partial else _ratio
    return f(_sorted_tokens(a), _sorted_tokens(b))


def _token_set(a: str, b: str, partial: bool) -> int:
    ta, tb = set(a.split()), set(b.split())
    sect = " ".join(sorted(ta & tb)).strip()
    comb_a = (sect + " " + " ".join(sorted(ta - tb))).strip()
    comb_b = (sect + " " + " ".join(sorted(tb - ta))).strip()
    f = _partial_ratio if partial else _ratio
    return max(f(sect, comb_a), f(sect, comb_b), f(comb_a, comb_b))


def wratio(s1: str, s2: str) -> int:
    """fuzzywuzzy WRatio, reimplemented from the published algorithm.

    base ratio; if the length ratio >= 1.5 switch to partial variants
    scaled by .9 (.6 when one side is >8x longer), token variants scaled
    by a further .95; return the max, rounded.
    """
    p1, p2 = _full_process(s1), _full_process(s2)
    if not p1 or not p2:
        return 0
    base = _ratio(p1, p2)
    len_ratio = max(len(p1), len(p2)) / min(len(p1), len(p2))
    if len_ratio < 1.5:
        tsor = _token_sort(p1, p2, partial=False) * 0.95
        tser = _token_set(p1, p2, partial=False) * 0.95
        return _intr(max(base, tsor, tser))
    partial_scale = 0.6 if len_ratio > 8 else 0.9
    partial = _partial_ratio(p1, p2) * partial_scale
    ptsor = _token_sort(p1, p2, partial=True) * 0.95 * partial_scale
    ptser = _token_set(p1, p2, partial=True) * 0.95 * partial_scale
    return _intr(max(base, partial, ptsor, ptser))


def _score(target: str, candidate: str) -> int:
    return wratio(target, candidate)


def extract_one(target: str, candidates: list[str]) -> tuple[str, int] | None:
    """Best (candidate, score) — fuzzywuzzy.process.extractOne shape."""
    if not candidates:
        return None
    best = max(candidates, key=lambda c: (_score(target, c), c))
    return best, _score(target, best)


def suggest_mapping(headers: list[str], schema_cols: list[str]) -> dict[str, str]:
    """{source header → canonical column} for every canonical column whose
    best match clears the threshold.  Implements the ``candidate``→
    ``choice`` retry of ingestor_precinct.py:127-128.

    The reference surfaces one suggestion per canonical column and lets a
    human resolve collisions (two canonicals claiming the same header);
    headless, we resolve greedily by score so each header maps to the
    canonical column it matches best.
    """
    proposals: list[tuple[int, str, str]] = []  # (score, source, canonical)
    for canonical in schema_cols:
        m = extract_one(canonical, headers)
        if canonical == "candidate" and (m is None or m[1] < MATCH_THRESHOLD):
            m = extract_one("choice", headers)
        if m and m[1] > MATCH_THRESHOLD:
            proposals.append((m[1], m[0], canonical))
    mapping: dict[str, str] = {}
    taken: set[str] = set()
    for score, source, canonical in sorted(proposals, key=lambda p: -p[0]):
        if source not in mapping and canonical not in taken:
            mapping[source] = canonical
            taken.add(canonical)
    return mapping


def apply_mapping(df: DataFrame, mapping: dict[str, str],
                  date_format: str | None = None) -> DataFrame:
    """Apply a {source → canonical} map (ingestor_precinct.py:155-164).

    A ``source`` key that is not a real column is a constant assigned to
    all rows; a constant mapped to ``election_date`` is parsed as a date
    (pd.to_datetime parity — ``F.to_date`` handles ISO, ``date_format``
    overrides for forms like ``11/06/2012``; pd.to_datetime infers
    month-first for that shape, so default to ``M/d/yyyy`` when slashed).
    """
    for source, canonical in mapping.items():
        if source not in df.columns:
            if canonical == "election_date":
                fmt = date_format or ("M/d/yyyy" if "/" in source else None)
                lit = (F.to_date(F.lit(source), fmt) if fmt
                       else F.to_date(F.lit(source)))
                df = df.withColumn(source, lit)
            else:
                df = df.withColumn(source, F.lit(source))
    df = df.select(*mapping.keys())
    return df.withColumnsRenamed(mapping)
