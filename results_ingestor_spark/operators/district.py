"""District extraction — parity with ingestor_precinct.py:165-183.

The reference applies three regex passes *sequentially on the mutating
frame*; each pass, for rows whose ``contest_name`` contains the pattern
(case-insensitive, unanchored):

    dis = contest_name.upper().rsplit('DISTRICT', n=1)   # literal, LAST occurrence
    contest_name = dis[0]      # uppercased + truncated, keeps trailing space
    district     = dis[1]      # keeps leading space (e.g. ' 12')

Non-matching rows keep their original case/value.  A row rewritten by an
earlier pass is re-examined by later passes against its NEW contest_name.

Spark realization: one ``select`` per pass updating both columns
atomically from the OLD values (SURVEY §2.2.1).  The literal
last-occurrence rsplit becomes greedy ``regexp_extract('^(.*)DISTRICT(.*)$')``
on the uppercased name — greedy ``.*`` pins the split to the last
occurrence, exactly like pandas' rsplit(n=1).

Everything is built-in expressions inside whole-stage codegen — a narrow
map stage with no shuffle, so it scales linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The three patterns in reference order (ingestor_precinct.py:167,173,179).
# (?i) reproduces pandas' case=False; patterns are unanchored contains.
DISTRICT_PATTERNS = (
    r"(?i)DISTRICT \d",                      # number
    r"(?i)DISTRICT [a-z]\b",                 # single letter (ci → A-Z too)
    r"(?i)DISTRICT (IX|I?V|V?I{1,3})\b",     # roman numeral 1-9
)

def _apply_pass(df: DataFrame, pattern: str) -> DataFrame:
    # literal last-occurrence split via substring arithmetic — a plain
    # string search instead of a greedy `^(.*)DISTRICT(.*)$` regex whose
    # backtracking dominates this map stage's cost.  substring_index(-1)
    # = text after the LAST occurrence (pandas rsplit(n=1) parity).
    #
    # Built as ONE selectExpr call: a Column-tree version of this pass
    # costs ~40 py4j round-trips per pass at plan-build time (~90 ms x 3
    # passes per ingest build, measured round 4); a string projection is
    # a single round-trip with all parsing JVM-side.  Identical plan out.
    lit_pat = pattern.replace("\\", "\\\\").replace("'", "\\'")
    matched = f"contest_name RLIKE '{lit_pat}'"
    right = "substring_index(upper(contest_name), 'DISTRICT', -1)"
    left = ("substring(upper(contest_name), 1, "
            "length(upper(contest_name)) "
            f"- length({right}) - 8)")
    out = []
    for c in df.columns:
        if c == "contest_name":
            out.append(f"CASE WHEN {matched} THEN {left} "
                       f"ELSE contest_name END AS contest_name")
        elif c == "district":
            out.append(f"CASE WHEN {matched} THEN {right} "
                       f"ELSE district END AS district")
        else:
            out.append(f"`{c}`")
    return df.selectExpr(*out)


def has_any_district(df: DataFrame) -> bool:
    """The reference's trigger predicate (ingestor_precinct.py:165):
    extraction runs only if ``district`` is absent or all-falsy (pandas
    ``.any()`` counts NaN and '' as falsy)."""
    if "district" not in df.columns:
        return False
    nonfalsy = df.where(F.col("district").isNotNull()
                        & (F.col("district") != "")).limit(1)
    return len(nonfalsy.take(1)) > 0


def extract_district(df: DataFrame, force: bool = False) -> DataFrame:
    """Run the three-pass extraction when the trigger predicate fires.

    ``force=True`` skips the (eager) trigger check — used when the caller
    already knows the district column is empty, keeping the plan fully lazy.
    """
    if not force and has_any_district(df):
        return df
    if "district" not in df.columns:
        df = df.withColumn("district", F.lit(None).cast("string"))
    for pattern in DISTRICT_PATTERNS:
        df = _apply_pass(df, pattern)
    return df
