"""Fuzzy header mapping + mapping application — ingestor_precinct.py:125-164.

``suggest_mapping`` is a pure driver-side metadata function (it sees
column *names*, never data — no Spark job).  The reference uses
fuzzywuzzy's WRatio with a >60 threshold and a ``candidate``→``choice``
fallback (ingestor_precinct.py:126-129); we reproduce the scoring shape
with a dependency-free scorer (difflib ratio over normalized names,
boosted for token containment).  Parity standard per SURVEY §7: a
reasonable mapping on the fixture headers — the reference step is a
human-confirmed *suggestion*, not a deterministic transform.

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


def _norm(s: str) -> str:
    return re.sub(r"[^a-z0-9 ]", " ", s.lower().replace("_", " ")).strip()


def _score(target: str, candidate: str) -> int:
    """0-100 similarity, shaped like fuzzywuzzy's WRatio: full-string
    ratio, with a floor of 90 when one normalized name's tokens are a
    subset of the other's (WRatio's partial/token heuristics)."""
    a, b = _norm(target), _norm(candidate)
    if not a or not b:
        return 0
    ratio = int(round(100 * difflib.SequenceMatcher(None, a, b).ratio()))
    ta, tb = set(a.split()), set(b.split())
    if ta and tb and (ta <= tb or tb <= ta):
        ratio = max(ratio, 90)
    return ratio


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
